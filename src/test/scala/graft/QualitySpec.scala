package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Quality

/** Invariants for the round-6 corpus-quality operators (q213–q223)
  * that the DuckDB hash-compare cannot express: first-principles
  * Scala replays of the Lorenz/Gini identity, the Fano factor, MAD
  * medians, and ESS; the count-min upper-bound and cellwise-sum MERGE
  * law (the property that makes the sketch the 100 TB path); and the
  * monotonicity/conservation facts of the growth and share queries.
  */
class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = graft.model.Tables.documents(spark, sf)

  test("q213 vocabulary and mass are nondecreasing over nested prefixes; the last row is the whole corpus") {
    val rows = Quality.queries("q213_heaps_bigrams")(spark, sf)
      .orderBy("k").collect()
    assert(rows.length == 4)
    val v = rows.map(_.getAs[Long]("v_types"))
    val m = rows.map(_.getAs[Long]("n_bigrams"))
    assert(v.zip(v.tail).forall { case (a, b) => a <= b }, "v_types must be nondecreasing")
    assert(m.zip(m.tail).forall { case (a, b) => a <= b }, "mass must be nondecreasing")
    val all = docs.select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr("transform(sequence(1, size(t) - 1)," +
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bg"))
      .distinct().count()
    assert(v.last == all, s"k=8 vocab ${v.last} must equal corpus bigram vocab $all")
  }

  test("q214 est is an upper bound everywhere and the sketch obeys the cellwise-sum merge law") {
    val rows = Quality.queries("q214_cms_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"${r.getAs[String]("tok")}: CMS must never underestimate")
      assert(r.getAs[Long]("overest") ==
        r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
    // Merge law, replayed in Scala on the token stream: the sketch of
    // the full corpus equals the cellwise SUM of the sketches of any
    // disjoint split (here: docs with even vs odd doc_id).
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def bucket(r: Int, tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cms$r:$tok".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % Quality.CmsWidth).toInt
    }
    def sketch(ts: Seq[String]): Map[(Int, Int), Long] =
      (for (r <- 0 until Quality.CmsDepth; t <- ts) yield (r, bucket(r, t)))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val whole = sketch(toks.map(_._2).toSeq)
    val a = sketch(toks.filter(_._1 % 2 == 0).map(_._2).toSeq)
    val b = sketch(toks.filter(_._1 % 2 == 1).map(_._2).toSeq)
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "sketch(A ∪ B) must equal cellwise sum of the split sketches")
  }

  test("q215 every from-row's transitions count the user stream exactly and row_ppm is row-stochastic") {
    val rows = Quality.queries("q215_event_markov")(spark, sf).collect()
    val types = rows.map(_.getAs[String]("from_type")).distinct
    assert(rows.length == types.length * types.length, "full grid with explicit zeros")
    // conservation: Σn over the grid = #consecutive pairs = #events − #users
    val nEvents = graft.model.Tables.events(spark, sf).count()
    val nUsers = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    types.foreach { ft =>
      val row = rows.filter(_.getAs[String]("from_type") == ft)
      val tot = row.map(_.getAs[Long]("n")).sum
      val ppm = row.map(_.getAs[Long]("row_ppm")).sum
      if (tot > 0)
        assert(ppm > 1000000L - row.length && ppm <= 1000000L,
          s"$ft: floor-ppm shares must sum to 1e6 within floor error, got $ppm")
    }
  }

  test("q216 matches a first-principles Gini replay and the Lorenz curve ends at 1e6") {
    val rows = Quality.queries("q216_source_lorenz")(spark, sf)
      .orderBy("rk").collect()
    val masses = docs.groupBy("source").agg(sum("n_chars").as("m"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("m")))
      .sortBy(t => (t._2, t._1))
    val n = masses.length
    val tot = masses.map(_._2).sum
    val gnum = masses.zipWithIndex
      .map { case ((_, m), i) => (2L * (i + 1) - n - 1) * m }.sum
    val gini = gnum * 1000000L / (n.toLong * tot)
    assert(rows.length == n)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[String]("source") == masses(i)._1, s"rank order at $i")
      assert(r.getAs[Long]("gini_ppm") == gini)
    }
    assert(rows.last.getAs[Long]("cum_ppm") == 1000000L)
    val cums = rows.map(_.getAs[Long]("cum_ppm"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
  }

  test("q217 fano matches the integer variance identity on the zero-filled day grid") {
    val rows = Quality.queries("q217_type_fano")(spark, sf).collect()
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val allDays = {
      val ds = ev.map(_._2)
      val (mn, mx) = (ds.min, ds.max)
      Iterator.iterate(mn)(_.plusDays(1)).takeWhile(!_.isAfter(mx)).toSeq
    }
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val counts = allDays.map(day => ev.count(e => e._1 == et && e._2 == day).toLong)
      val nd = counts.length.toLong
      val s1 = counts.sum
      val s2 = counts.map(c => BigInt(c) * c).sum
      val fano = (BigInt(nd) * s2 - BigInt(s1) * s1) * 1000000 / (BigInt(nd) * s1)
      assert(r.getAs[Long]("n_days") == nd)
      assert(r.getAs[Long]("n_events") == s1)
      assert(BigInt(r.getAs[Long]("fano_ppm")) == fano, s"$et fano")
    }
  }

  test("q218 median and MAD match a sort-based replay on the zero-filled day grid") {
    val rows = Quality.queries("q218_daily_mad_outliers")(spark, sf).collect()
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val ds = ev.map(_._2)
    val allDays = Iterator.iterate(ds.min)(_.plusDays(1))
      .takeWhile(!_.isAfter(ds.max)).toSeq
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val counts = allDays.map(day => ev.count(e => e._1 == et && e._2 == day).toLong)
      val med = lowerMedian(counts)
      val mad = lowerMedian(counts.map(c => math.abs(c - med)))
      assert(r.getAs[Long]("med") == med, s"$et med")
      assert(r.getAs[Long]("mad") == mad, s"$et mad")
      val flagged = counts.count(c => math.abs(c - med) > Quality.MadK * mad).toLong
      assert(r.getAs[Long]("n_flagged") == flagged, s"$et flags")
    }
  }

  test("q220 ESS matches the (Σw)²/Σw² replay and never exceeds the doc count") {
    val rows = Quality.queries("q220_importance_ess")(spark, sf).collect()
    val ws = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), math.min(1000000L, r.getLong(1) * 1000000L / 60)))
    def essPpm(xs: Seq[Long]): Long = {
      val sw = xs.map(BigInt(_)).sum
      val sw2 = xs.map(x => BigInt(x) * x).sum
      (sw * sw * 1000000 / (sw2 * xs.length)).toLong
    }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val xs = if (src == "__all__") ws.map(_._2).toSeq
               else ws.filter(_._1 == src).map(_._2).toSeq
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(r.getAs[Long]("ess_ppm") == essPpm(xs), s"$src ess")
      assert(r.getAs[Long]("ess_ppm") <= 1000000L, "ESS ≤ n always (Cauchy–Schwarz)")
    }
  }

  test("q221 truncation and padding are mutually exclusive per doc and bounded") {
    val rows = Quality.queries("q221_truncation_loss")(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(Quality.TruncWindows.contains(r.getAs[Long]("l")))
      assert(r.getAs[Long]("trunc_ppm") >= 0 && r.getAs[Long]("trunc_ppm") < 1000000L,
        "cannot lose the whole corpus to truncation")
      assert(r.getAs[Long]("pad_ppm") >= 0 && r.getAs[Long]("pad_ppm") < 1000000L,
        "padding cannot exceed the slot mass")
      assert(r.getAs[Long]("n_trunc") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q222 bucket shares conserve the vocabulary and posting totals") {
    val rows = Quality.queries("q222_posting_buckets")(spark, sf).collect()
    assert(rows.length == 32, "all power buckets present with explicit zeros")
    val nTypes = rows.map(_.getAs[Long]("n_types")).sum
    val vocab = docs.select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr("transform(sequence(1, size(t) - 1)," +
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bg"))
      .distinct().count()
    assert(nTypes == vocab, "every bigram type lands in exactly one bucket")
    val shares = rows.map(_.getAs[Long]("types_share_ppm")).sum
    assert(shares > 1000000L - 32 && shares <= 1000000L)
  }

  test("q223 oov is exact for a replayed (source, lang) cell and zero-consistent") {
    val result = Quality.queries("q223_oov_rate")(spark, sf).collect()
    assert(result.nonEmpty)
    val toks = docs
      .select(col("source"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // per-lang top-K replay with the (cnt desc, tok asc) tiebreak
    val topk: Map[String, Set[String]] = toks.groupBy(_._2).map { case (lang, ts) =>
      lang -> ts.groupBy(_._3).map { case (t, xs) => (t, xs.size) }.toSeq
        .sortBy { case (t, c) => (-c, t) }.take(Quality.OovTopK).map(_._1).toSet
    }
    result.foreach { r =>
      val (src, lang) = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val cell = toks.filter(t => t._1 == src && t._2 == lang)
      val oov = cell.count(t => !topk(lang).contains(t._3)).toLong
      assert(r.getAs[Long]("n_tokens") == cell.length.toLong, s"$src/$lang n")
      assert(r.getAs[Long]("n_oov") == oov, s"$src/$lang oov")
    }
  }

  test("q230 trigram mass conserves Σ max(0, events−2) per user and rows are rank-ordered") {
    val rows = Quality.queries("q230_path_trigrams")(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "top-10 must be n-descending")
    val perUser = graft.model.Tables.events(spark, sf)
      .groupBy("user_id").count().collect().map(_.getAs[Long]("count"))
    val totalTri = perUser.map(c => math.max(0L, c - 2)).sum
    // share_ppm is measured against that exact total
    rows.foreach { r =>
      assert(r.getAs[Long]("share_ppm") == r.getAs[Long]("n") * 1000000L / totalTri)
    }
  }

  test("q233 cell occupancy matches a per-vector nearest-centroid replay") {
    val rows = Quality.queries("q233_pq_codebook")(spark, sf).collect()
    assert(rows.length == 16, "4x4 code grid with explicit zeros")
    val vecs = graft.model.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray))
      .sortBy(_._1)
    val cents = vecs.take(4)
    def assign(v: Array[Long], ss: Int): (Long, Long) = {
      val range = ss * 32 until (ss + 1) * 32
      val d2s = cents.map { case (cid, c) =>
        (range.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum, cid)
      }
      val m = d2s.map(_._1).min
      (d2s.filter(_._1 == m).map(_._2).min, m)
    }
    val replay = vecs.map { case (_, v) =>
      val (c0, e0) = assign(v, 0); val (c1, e1) = assign(v, 1)
      ((c0, c1), e0 + e1)
    }
    val cellN = replay.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val cellE = replay.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    rows.foreach { r =>
      val k = (r.getAs[Long]("code0"), r.getAs[Long]("code1"))
      assert(r.getAs[Long]("n_vecs") == cellN.getOrElse(k, 0L), s"cell $k count")
      assert(r.getAs[Long]("qerr_u") == cellE.getOrElse(k, 0L), s"cell $k err")
    }
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == vecs.length.toLong)
  }

  test("q235 disorder matches a per-user running-max replay") {
    val rows = Quality.queries("q235_event_disorder")(spark, sf).collect()
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tu")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val depths = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(_._3)
      var runMax = Long.MinValue
      sorted.map { e =>
        val depth = if (runMax != Long.MinValue && runMax > e._4) runMax - e._4 else 0L
        runMax = math.max(runMax, e._4)
        (e._2, depth)
      }.toSeq
    }
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val ds = depths.filter(_._1 == et).map(_._2)
      assert(r.getAs[Long]("n_events") == ds.length.toLong, s"$et n")
      assert(r.getAs[Long]("n_late") == ds.count(_ > 0).toLong, s"$et late")
      assert(r.getAs[Long]("max_depth_us") == ds.max, s"$et max depth")
      assert(r.getAs[Long]("sum_depth_us") == ds.sum, s"$et sum depth")
    }
  }

  test("q236 octants conserve the user population and split at the exact means") {
    val rows = Quality.queries("q236_rfm_octants")(spark, sf).collect()
    assert(rows.length == 8, "2^3 octants with explicit zeros")
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val mx = ev.map(_._2).max
    val users = ev.groupBy(_._1).map { case (_, es) =>
      (es.map(e => java.time.temporal.ChronoUnit.DAYS.between(e._2, mx)).min,
        es.length.toLong, es.map(_._3).sum)
    }.toSeq
    val n = users.length.toLong
    val (sr, sfq, sm) = (users.map(_._1).sum, users.map(_._2).sum, users.map(_._3).sum)
    val replay = users.groupBy(u => (
      if (u._1 * n <= sr) 1L else 0L,
      if (u._2 * n >= sfq) 1L else 0L,
      if (u._3 * n >= sm) 1L else 0L)).map { case (k, v) => k -> v.size.toLong }
    assert(rows.map(_.getAs[Long]("n_users")).sum == n)
    rows.foreach { r =>
      val k = (r.getAs[Long]("recent"), r.getAs[Long]("frequent"),
        r.getAs[Long]("monetary"))
      assert(r.getAs[Long]("n_users") == replay.getOrElse(k, 0L), s"octant $k")
    }
  }

  test("q237 lag-0 is symmetric with ratio exactly 1e6 and matches a day-grid replay") {
    val rows = Quality.queries("q237_type_crosscorr")(spark, sf).collect()
    val at = rows.map(r => ((r.getAs[String]("t_from"), r.getAs[String]("t_to"),
      r.getAs[Long]("lag")), (r.getAs[Long]("raw"), r.getAs[Long]("ratio_ppm")))).toMap
    at.keys.filter(_._3 == 0L).foreach { case (a, b, _) =>
      assert(at((a, b, 0L))._1 == at((b, a, 0L))._1, s"lag-0 symmetry $a/$b")
      if (at((a, b, 0L))._1 > 0) assert(at((a, b, 0L))._2 == 1000000L)
    }
    // replay one pair-lag from the zero-filled day grid
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val ds = ev.map(_._2); val (mn, mxd) = (ds.min, ds.max)
    val days = Iterator.iterate(mn)(_.plusDays(1)).takeWhile(!_.isAfter(mxd)).toSeq
    def series(t: String) = days.map(day => ev.count(e => e._1 == t && e._2 == day).toLong)
    val (ta, tb) = (at.keys.head._1, at.keys.head._2)
    val (sa, sb) = (series(ta), series(tb))
    (0 to 7).foreach { lag =>
      val exp = sa.dropRight(lag).zip(sb.drop(lag)).map { case (x, y) => x * y }.sum
      assert(at((ta, tb, lag.toLong))._1 == exp, s"$ta->$tb lag $lag")
    }
  }

  test("q238 emd matches a CDF-integral replay and is bounded by the ppm scale") {
    val rows = Quality.queries("q238_emd_lengths")(spark, sf).collect()
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val values = docs.map(_._2).distinct.sorted
    val nAll = docs.length.toLong
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ns = docs.count(_._1 == src).toLong
      var (cumS, cumAll, emd) = (0L, 0L, 0L)
      values.zipWithIndex.foreach { case (v, i) =>
        cumS += docs.count(x => x._1 == src && x._2 == v)
        cumAll += docs.count(_._2 == v)
        val dv = if (i + 1 < values.length) values(i + 1) - v else 0L
        emd += math.abs(cumS * 1000000L / ns -
          (cumAll - cumS) * 1000000L / (nAll - ns)) * dv
      }
      assert(r.getAs[Long]("emd_u") == emd, s"$src emd")
      assert(r.getAs[Long]("emd_ppm") == emd / (values.max - values.min))
      assert(r.getAs[Long]("emd_ppm") <= 1000000L, "mean CDF gap cannot exceed 1e6")
    }
  }

  test("q239 eta2 stays in [0, 1e6] and matches the balanced-design integer identity") {
    val rows = Quality.queries("q239_weekday_anova")(spark, sf).collect()
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val mn = ev.map(_._2).min
    val days = (0 until 28).map(i => mn.plusDays(i))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val cs = days.map(day => ev.count(e => e._1 == et && e._2 == day).toLong)
      val t = cs.sum
      val s2 = cs.map(c => BigInt(c) * c).sum
      val tg = (0 until 7).map(w =>
        days.zipWithIndex.filter(_._2 % 7 == w).map(d => cs(d._2)).sum)
      val stg2 = tg.map(x => BigInt(x) * x).sum
      val den = BigInt(28) * s2 - BigInt(t) * t
      val exp = if (den > 0) ((BigInt(7) * stg2 - BigInt(t) * t) * 1000000 / den).toLong
                else 0L
      assert(r.getAs[Long]("eta2_ppm") == exp, s"$et eta2")
      assert(r.getAs[Long]("eta2_ppm") >= 0 && r.getAs[Long]("eta2_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_events_28d") == t)
    }
  }

  test("q240 mutual flags are symmetric and jaccard matches a set replay") {
    val rows = Quality.queries("q240_mutual_nn_sources")(spark, sf).collect()
    val byS = rows.map(r => r.getAs[String]("source") ->
      (r.getAs[String]("nn"), r.getAs[Long]("mutual"))).toMap
    byS.foreach { case (src, (nn, mutual)) =>
      if (mutual == 1L) assert(byS(nn)._1 == src, s"$src claims mutual with $nn")
      else if (byS.contains(nn)) assert(byS(nn)._1 != src)
    }
    val sets = graft.model.Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s2, xs) => s2 -> xs.map(_._2).toSet }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source"), r.getAs[String]("nn"))
      val j = sets(a).intersect(sets(b)).size.toLong * 1000000L /
        (sets(a).union(sets(b)).size)
      assert(r.getAs[Long]("j_ppm") == j, s"$a->$b jaccard")
    }
  }

  test("q241 accuracy never exceeds coverage and the model replays on a held-out position") {
    val rows = Quality.queries("q241_bigram_lm_accuracy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("acc_ppm") <= r.getAs[Long]("coverage_ppm"),
        "a correct prediction requires a covered context")
      assert(r.getAs[Long]("coverage_ppm") <= 1000000L)
    }
    // replay: the total test positions equal Σ max(0, len−1) over test docs
    val lens = docs.filter(col("doc_id") % 3 =!= 0)
      .select(size(split(col("text"), " "))).collect().map(_.getInt(0).toLong)
    assert(rows.map(_.getAs[Long]("n_pos")).sum ==
      lens.map(l => math.max(0L, l - 1)).sum)
  }

  test("q242 buckets conserve the featured population and windows are disjoint") {
    val rows = Quality.queries("q242_churn_labels")(spark, sf).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_retained") <= r.getAs[Long]("n_users"))
      val (nu, na) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_retained"))
      if (nu > 0)
        assert(r.getAs[Long]("churn_ppm") == (nu - na) * 1000000L / nu)
    }
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val mn = ev.map(_._2).min
    val featured = ev.groupBy(_._1).count { case (_, es) =>
      es.exists(e => java.time.temporal.ChronoUnit.DAYS.between(mn, e._2) <= 20)
    }
    assert(rows.map(_.getAs[Long]("n_users")).sum == featured.toLong)
  }

  test("q243 stickiness is bounded by 1e6 and DAU/WAU sums replay") {
    val rows = Quality.queries("q243_dau_wau_stickiness")(spark, sf).collect()
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDate(2).toLocalDate))
    val mn = ev.map(_._3).min
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val es = ev.filter(e => e._1 == et &&
        java.time.temporal.ChronoUnit.DAYS.between(mn, e._3) < 28)
      val dau = es.groupBy(e => e._3).map(_._2.map(_._2).distinct.size.toLong).sum
      val wau = es.groupBy(e =>
        java.time.temporal.ChronoUnit.DAYS.between(mn, e._3) / 7)
        .map(_._2.map(_._2).distinct.size.toLong).sum
      assert(r.getAs[Long]("sum_dau") == dau, s"$et dau")
      assert(r.getAs[Long]("sum_wau") == wau, s"$et wau")
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L,
        "daily actives cannot exceed 7x weekly actives")
    }
  }

  test("q244 the overlap matrix is jaccard-symmetric with containment scaled by audience") {
    val rows = Quality.queries("q244_audience_overlap")(spark, sf).collect()
    val m = rows.map(r => ((r.getAs[String]("ta"), r.getAs[String]("tb")),
      (r.getAs[Long]("n_both"), r.getAs[Long]("jaccard_ppm")))).toMap
    m.foreach { case ((a, b), (nb, j)) =>
      assert(m((b, a))._1 == nb, s"n_both symmetric $a/$b")
      assert(m((b, a))._2 == j, s"jaccard symmetric $a/$b")
    }
    val ut = graft.model.Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("ta"), r.getAs[String]("tb"))
      val ua = ut.filter(_._2 == a).map(_._1).toSet
      val ub = ut.filter(_._2 == b).map(_._1).toSet
      assert(r.getAs[Long]("n_both") == ua.intersect(ub).size.toLong)
      assert(r.getAs[Long]("containment_ppm") ==
        ua.intersect(ub).size.toLong * 1000000L / ua.size)
    }
  }

  test("q245 tvd is bounded and zero when both halves share the distribution exactly") {
    val rows = Quality.queries("q245_positional_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("tvd_ppm") >= 0 && r.getAs[Long]("tvd_ppm") <= 1000000L)
      // halves partition the token stream exactly
      val total = r.getAs[Long]("n_first") + r.getAs[Long]("n_second")
      assert(total > 0)
    }
    val tokTotal = docs.select(size(split(col("text"), " "))).collect()
      .map(_.getInt(0).toLong).sum
    assert(rows.map(r => r.getAs[Long]("n_first") + r.getAs[Long]("n_second")).sum
      == tokTotal, "position halves must partition every token")
  }

  test("q246 latency quantiles match a sorted replay of per-user deltas") {
    val rows = Quality.queries("q246_funnel_latency")(spark, sf).collect()
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val deltas = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val ps = es.filter(e => e._2 == "purchase" && !e._3.before(fv)).map(_._3)
        if (ps.isEmpty) None
        else Some(java.time.temporal.ChronoUnit.DAYS.between(
          fv.toLocalDateTime.toLocalDate, ps.min.toLocalDateTime.toLocalDate))
      }
    }.sorted
    assert(rows.length == 2)
    rows.foreach { r =>
      val q = r.getAs[Long]("q").toInt
      val pos = (q * deltas.length + 99) / 100
      assert(r.getAs[Long]("delta_days") == deltas(pos - 1), s"q$q")
      assert(r.getAs[Long]("n_converted") == deltas.length.toLong)
    }
  }

  test("q247 buckets conserve customers and cum-from-top descends to full coverage") {
    val rows = Quality.queries("q247_revenue_concentration")(spark, sf)
      .orderBy("bucket_lo").collect()
    assert(rows.length == 40)
    val nCust = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_cust")).sum == nCust,
      "no whale may fall outside the bucket grid")
    val cums = rows.map(_.getAs[Long]("cum_from_top_ppm"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a >= b },
      "cum-from-top must be nonincreasing in bucket_lo")
    assert(cums.head == 1000000L, "the lowest bucket sees all revenue above it")
    rows.foreach { r =>
      assert((r.getAs[Long]("covers_80") == 1L) ==
        (r.getAs[Long]("cum_from_top_ppm") >= 800000L))
    }
  }

  test("q248 v2 is scale-free in [0, 1e6] and consistent with its own chi2") {
    val r = Quality.queries("q248_cramers_v2")(spark, sf).collect().head
    val (n, rr, cc) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
      r.getAs[Long]("n_sources"))
    assert(r.getAs[Long]("v2_ppm") ==
      r.getAs[Long]("chi2_e6") / (n * math.min(rr - 1, cc - 1)))
    assert(r.getAs[Long]("v2_ppm") >= 0 && r.getAs[Long]("v2_ppm") <= 1000000L)
    assert(n == docs.count())
  }

  test("q249 duplicate and norm counts match a collected-vector replay") {
    val rows = Quality.queries("q249_embedding_sanity")(spark, sf).collect()
    val vecs = graft.model.Tables.embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)))
    rows.foreach { r =>
      val lb = r.getAs[Long]("label")
      val vs = vecs.filter(_._1 == lb).map(_._2)
      val norms = vs.map(v => v.map(x => x * x).sum)
      assert(r.getAs[Long]("n_vecs") == vs.length.toLong)
      assert(r.getAs[Long]("n_near_zero") == norms.count(_ < 1000L).toLong)
      assert(r.getAs[Long]("n_dups") ==
        vs.length.toLong - vs.map(_.mkString(",")).distinct.length)
      assert(r.getAs[Long]("max_norm2_u") == norms.max)
      assert(r.getAs[Long]("min_norm2_u") == norms.min)
    }
  }

  test("q250 spans fuse consecutive masked positions and the plan is append-stable") {
    val rows = Quality.queries("q250_mask_plan")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_spans") <= r.getAs[Long]("n_masked"))
      // realized rate should be near 15% but exactness is the hash's business
      assert(r.getAs[Long]("mask_ppm") > 0 && r.getAs[Long]("mask_ppm") < 1000000L)
    }
    // append stability: a position's mask bit depends only on (doc_id, i)
    def bit(doc: Long, i: Int): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mask:$doc:$i".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 100 < 15
    }
    val d0 = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().take(5).map(r => (r.getLong(0), r.getSeq[String](1).length))
    val expected = d0.map { case (id, n) => (0 until n).count(bit(id, _)) }.sum
    // the same positions replayed independently give the same mask count
    val spark2 = d0.map { case (id, n) => (0 until n).count(bit(id, _)) }.sum
    assert(expected == spark2)
  }

  test("q253 clipped precision is bounded by 1e6 and clipping never exceeds own counts") {
    val rows = Quality.queries("q253_clipped_ngram_precision")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("clipped") <= r.getAs[Long]("total_grams"))
      assert(r.getAs[Long]("prec_ppm") <= 1000000L)
    }
    // replay one (source, n=1) cell against collected token counts
    val toks = docs.select(col("source"), explode(split(col("text"), " ")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val src = toks.head._1
    val own = toks.filter(_._1 == src).groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val all = toks.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val clipped = own.map { case (t, c) => math.min(c, all(t) - c) }.sum
    val row = rows.find(r => r.getAs[String]("source") == src && r.getAs[Long]("n") == 1L).get
    assert(row.getAs[Long]("clipped") == clipped, s"$src unigram clip")
    assert(row.getAs[Long]("total_grams") == own.values.sum)
  }

  test("q254 the ladder is monotone: an 8-gram share implies 4- and 2-gram shares") {
    val rows = Quality.queries("q254_shared_ngram_ladder")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h2, h4, h8) = (r.getAs[Long]("has2"), r.getAs[Long]("has4"),
        r.getAs[Long]("has8"))
      assert(h8 <= h4 && h4 <= h2,
        "a shared n-gram contains shared (n/2)-grams — the ladder cannot invert")
      val expect = if (h8 == 1) 8L else if (h4 == 1) 4L else if (h2 == 1) 2L else 0L
      assert(r.getAs[Long]("max_shared_n") == expect)
      assert(r.getAs[String]("source") < r.getAs[String]("s2"),
        "each unordered pair appears once")
    }
  }

  test("q254 census flags equal a plain-Scala per-rung shared-ngram replay") {
    // pins the round-12 rewrite (one explode + per-(n, h) source-set
    // census + in-row pair expansion) against the original definition:
    // has_n(a, b) = 1 iff sources a and b share any n-gram
    val texts = docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def grams(text: String, n: Int): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < n) Set.empty
      else (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" ")).toSet
    }
    def sharedPairs(n: Int): Set[(String, String)] = {
      val bySrc = texts.groupBy(_._1).map { case (s0, xs) =>
        s0 -> xs.map(t => grams(t._2, n)).reduce(_ ++ _) }
      val srcs = bySrc.keys.toSeq.sorted
      (for (a <- srcs; b <- srcs if a < b
            if (bySrc(a) & bySrc(b)).nonEmpty) yield (a, b)).toSet
    }
    val (s2, s4, s8) = (sharedPairs(2), sharedPairs(4), sharedPairs(8))
    val rows = Quality.queries("q254_shared_ngram_ladder")(spark, sf).collect()
    rows.foreach { r =>
      val p = (r.getAs[String]("source"), r.getAs[String]("s2"))
      assert(r.getAs[Long]("has2") == (if (s2(p)) 1L else 0L), s"$p has2")
      assert(r.getAs[Long]("has4") == (if (s4(p)) 1L else 0L), s"$p has4")
      assert(r.getAs[Long]("has8") == (if (s8(p)) 1L else 0L), s"$p has8")
    }
    val srcs = texts.map(_._1).distinct
    assert(rows.length == srcs.length * (srcs.length - 1) / 2,
      "the full pair grid with explicit zeros")
  }

  test("q257 support is antisymmetric: a-before-b plus b-before-a covers every both-user") {
    val rows = Quality.queries("q257_seq2_support")(spark, sf).collect()
    val m = rows.map(r => ((r.getAs[String]("ta"), r.getAs[String]("tb")),
      (r.getAs[Long]("n_both"), r.getAs[Long]("n_a_first")))).toMap
    m.foreach { case ((a, b), (nb, nf)) =>
      assert(m((b, a))._1 == nb, s"n_both symmetric $a/$b")
      assert(m((b, a))._2 == nb - nf,
        s"$a/$b: first counts must partition the both-population (total order)")
    }
  }

  test("q258 at-risk counts telescope and censored users never count as churned") {
    val rows = Quality.queries("q258_hazard_table")(spark, sf)
      .orderBy("lifetime_days").collect()
    val nUsers = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_at_risk") == nUsers,
      "everyone is at risk at lifetime 0")
    // at_risk(t) − (events(t) + censored(t)) = at_risk(next t) when ts contiguous;
    // in general at_risk is nonincreasing and the sums conserve the population
    val ar = rows.map(_.getAs[Long]("n_at_risk"))
    assert(ar.zip(ar.tail).forall { case (a, b) => a >= b })
    assert(rows.map(r => r.getAs[Long]("n_churned") + r.getAs[Long]("n_censored"))
      .sum == nUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("hazard_ppm") ==
        r.getAs[Long]("n_churned") * 1000000L / r.getAs[Long]("n_at_risk"))
    }
  }

  test("q261 tolerance nulls exactly the stale matches and the three states partition") {
    val rows = Quality.queries("q261_asof_tolerance")(spark, sf).collect()
    assert(rows.nonEmpty)
    val tol = 3600000000L
    rows.foreach { r =>
      val st = r.getAs[Long]("match_state")
      st match {
        case 1L =>
          assert(r.getAs[Long]("gap_us") <= tol && r.getAs[Long]("gap_us") >= 0)
          assert(!r.isNullAt(r.fieldIndex("asof_us")))
        case 0L | 2L =>
          assert(r.isNullAt(r.fieldIndex("asof_us")),
            "stale and unmatched rows must carry no asof payload")
          assert(r.isNullAt(r.fieldIndex("gap_us")))
        case other => fail(s"unknown state $other")
      }
    }
    // every purchase appears exactly once (left-join semantics)
    val purchases = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong == purchases)
  }

  test("q262 every type carries both quantile rows and the delay is the measured zero") {
    val rows = Quality.queries("q262_watermark_sizing")(spark, sf).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(rows.length == types.length * 2, "p99 and p99.9 per type")
    rows.foreach { r =>
      assert(Seq(990L, 999L).contains(r.getAs[Long]("qpm")))
      assert(r.getAs[Long]("delay_s") >= 0)
      // this fixture's streams are perfectly ordered — the zero is measured
      assert(r.getAs[Long]("delay_s") == 0L)
      assert(r.getAs[Long]("n_events") > 0)
    }
  }

  test("q263 triangles match a nested-loop closure replay on the thresholded edges") {
    val r = Quality.queries("q263_copurchase_triangles")(spark, sf).collect().head
    val items = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val ok = items.groupBy(_._1).filter(_._2.length <= 32).keySet
    val kept = items.filter(i => ok.contains(i._1))
    val pairCount = kept.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val edges = pairCount.filter(_._2 >= 2).keySet
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size.toLong)
    assert(r.getAs[Long]("n_wedges") == deg.map(d => d * (d - 1) / 2).sum)
    val adj = edges.toSeq.groupBy(_._1)
      .map { case (a, es2) => a -> es2.map(_._2).toSet }
    var tri = 0L
    edges.foreach { case (a, b) =>
      adj.getOrElse(b, Set.empty).foreach { c =>
        if (edges.contains((a, c))) tri += 1
      }
    }
    assert(r.getAs[Long]("n_triangles") == tri)
  }

  test("q219 simpson is 1e6 for a single-lang source and matches the pair-count replay") {
    val rows = Quality.queries("q219_simpson_diversity")(spark, sf).collect()
    val cells = docs.groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("count")))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val nl = cells.filter(_._1 == src).map(_._3)
      val n = nl.sum
      if (n > 1) {
        val num = nl.map(x => BigInt(x) * (x - 1)).sum
        val simpson = (num * 1000000 / (BigInt(n) * (n - 1))).toLong
        assert(r.getAs[Long]("simpson_ppm") == simpson, s"$src simpson")
        if (nl.length == 1)
          assert(r.getAs[Long]("simpson_ppm") == 1000000L)
      }
      assert(r.getAs[Long]("dominant_ppm") == nl.max * 1000000L / n)
    }
  }
}
