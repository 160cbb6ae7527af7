package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Evaluation

/** Invariants for the round-6 evaluation operators (q203–q212) that the
  * DuckDB hash-compare cannot express: a pairwise first-principles
  * replay of the Mann–Whitney U (so the grid algebra is pinned by
  * something other than the two engines agreeing), the power-iteration
  * matrix identity, PR-curve monotonicity, calibration conservation,
  * kappa range, and shard conservation.
  */
class EvaluationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q203 u2 matches a pairwise first-principles replay and auc stays in [0, 1e6]") {
    val rows = Evaluation.queries("q203_mannwhitney_u")(spark, sf).collect()
    val lens = graft.model.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = lens.filter(_._1 == src).map(_._2)
      val rest = lens.filter(_._1 != src).map(_._2)
      // 2U = #(x > y)·2 + #(x = y) over all (mine, rest) pairs
      val u2 = (for (x <- mine; y <- rest) yield {
        if (x > y) 2L else if (x == y) 1L else 0L
      }).sum
      assert(r.getAs[Long]("u2") == u2, s"$src: u2 ${r.getAs[Long]("u2")} vs replay $u2")
      assert(r.getAs[Long]("eu2") == mine.length.toLong * rest.length)
      val auc = r.getAs[Long]("auc_ppm")
      assert(auc >= 0L && auc <= 1000000L)
    }
  }

  test("q204 v1 matches the AᵀA·1 identity on collected quantized vectors") {
    val rows = Evaluation.queries("q204_power_iteration")(spark, sf).collect()
    val vecs = graft.model.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray)
    val dims = vecs.head.length
    val expected = Array.tabulate(dims) { d =>
      vecs.map(q => q(d) * q.sum).sum
    }
    assert(rows.length == dims)
    rows.foreach { r =>
      val d = r.getAs[Long]("dim").toInt
      assert(r.getAs[Long]("v1") == expected(d), s"dim $d")
      assert(r.getAs[Long]("n_vecs") == vecs.length.toLong)
    }
    val maxAbs = expected.map(math.abs).max
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("norm_ppm")) <= 1000000L)
      if (math.abs(r.getAs[Long]("v1")) == maxAbs)
        assert(math.abs(r.getAs[Long]("norm_ppm")) == 1000000L)
    }
  }

  test("q205 sweep: tp/recall monotone along descending thresholds, totals conserve") {
    val rows = Evaluation.queries("q205_pr_sweep")(spark, sf).collect()
    val p = rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fn")
    var prevTp = -1L
    rows.foreach { r =>  // collect() preserves the orderBy(thr desc)
      val tp = r.getAs[Long]("tp")
      assert(tp >= prevTp, "tp must be nondecreasing as the threshold drops")
      assert(tp + r.getAs[Long]("fn") == p, "tp + fn must equal the positive total")
      assert(r.getAs[Long]("prec_ppm") >= 0L && r.getAs[Long]("prec_ppm") <= 1000000L)
      prevTp = tp
    }
    // the loosest threshold admits everything: tp = P, recall = 1
    assert(rows.last.getAs[Long]("tp") == p)
    assert(rows.last.getAs[Long]("rec_ppm") == 1000000L)
    val n = graft.model.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_at")).sum == n)
  }

  test("q206 bins conserve the corpus and rates stay in [0, 1e6]") {
    val rows = Evaluation.queries("q206_calibration_bins")(spark, sf).collect()
    assert(rows.length <= 10)
    val n = graft.model.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    rows.foreach { r =>
      assert(r.getAs[Long]("gold_ppm") >= 0L && r.getAs[Long]("gold_ppm") <= 1000000L)
      assert(r.getAs[Long]("mean_score_ppm") >= 0L && r.getAs[Long]("mean_score_ppm") <= 1000000L)
      assert(r.getAs[Long]("ece_contrib") == r.getAs[Long]("n_docs") * r.getAs[Long]("gap_ppm"))
    }
  }

  test("q207 kappa is one row, po/pe in range, kappa <= 1 and consistent with po vs pe") {
    val rows = Evaluation.queries("q207_cohens_kappa")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (po, pe) = (r.getAs[Long]("po_ppm"), r.getAs[Long]("pe_ppm"))
    assert(po >= 0L && po <= 1000000L)
    assert(pe >= 0L && pe <= 1000000L)
    val kappa = r.getAs[Double]("kappa")
    assert(kappa <= 1.0 + 1e-12)
    assert((kappa >= 0) == (po >= pe), "kappa sign must follow po vs pe")
    assert(r.getAs[Long]("agree") <= r.getAs[Long]("n_total"))
  }

  test("q206 bins equal a plain-Scala trigram-profile replay (pins the in-row overlap form)") {
    // replays the ORIGINAL detector definition — per-doc DISTINCT-trigram
    // overlap with the top-50 en-sample profile — so the round-12 in-row
    // instr() membership form is pinned against the exploded semantics,
    // not just against DuckDB agreeing.
    val texts = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def tris(t: String): Seq[String] =
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val profCnt = texts.filter(t => t._2 == "en" && t._1 % 3 == 0)
      .flatMap(t => tris(t._3))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val prof = profCnt.toSeq.sortBy { case (tri, c) => (-c, tri) }
      .take(50).map(_._1).toSet
    val scored = texts.map { t =>
      val ov = (tris(t._3).toSet & prof).size.toLong
      (ov * 1000000L / 50L, if (t._2 == "en") 1L else 0L)
    }
    val bins = scored.groupBy { case (s, _) => math.min(9L, s / 100000L) }
    val rows = Evaluation.queries("q206_calibration_bins")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = bins(r.getAs[Long]("bin"))
      val n = b.size.toLong
      assert(r.getAs[Long]("n_docs") == n, s"bin ${r.getAs[Long]("bin")} n")
      assert(r.getAs[Long]("mean_score_ppm") == b.map(_._1).sum / n)
      assert(r.getAs[Long]("gold_ppm") == b.map(_._2).sum * 1000000L / n)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == texts.length.toLong)
  }

  test("q208 error legs are nonnegative and pair counts stay below the day count") {
    Evaluation.queries("q208_seasonal_error")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("err7") >= 0L && r.getAs[Long]("err1") >= 0L)
      assert(r.getAs[Long]("pairs7") < r.getAs[Long]("n_days"))
      assert(r.getAs[Long]("pairs1") < r.getAs[Long]("n_days"))
    }
  }

  private def md5Hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** JVM replay of Dedup's engine-neutral MinHash family. */
  private def slotSig(shingles: Set[String]): Array[Long] = {
    val P = 2147483647L
    val hms = shingles.map(sh => java.lang.Long.parseLong(md5Hex(sh).take(8), 16) % P)
    Array.tabulate(16)(i => hms.map(hm => (7919L * (i + 1) * hm + 104729L * i) % P).min)
  }

  private def sourceShingles(src: String, docs: Array[(String, String)]): Set[String] =
    docs.filter(_._1 == src).flatMap { case (_, text) =>
      val t = text.split(" ", -1)
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    }.toSet

  test("q210 slot matches replay the JVM hash family, and the sketch obeys the merge law") {
    val rows = Evaluation.queries("q210_source_sketch_jaccard")(spark, sf).collect()
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val texts = docs.map(t => (t._1, t._2))
    val sources = docs.map(_._1).distinct.sorted
    val sigs = sources.map(s0 => s0 -> slotSig(sourceShingles(s0, texts))).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val eq = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      assert(r.getAs[Long]("n_slots_eq") == eq, s"($a,$b) slots")
      assert(r.getAs[Long]("est_ppm") == eq * 62500L)
      // exact leg replay
      val (sa, sb) = (sourceShingles(a, texts), sourceShingles(b, texts))
      val common = (sa & sb).size.toLong
      val expJac = if (common == 0) 0L
        else common * 1000000L / (sa.size + sb.size - common)
      assert(r.getAs[Long]("jac_ppm") == expJac, s"($a,$b) jac")
    }
    // merge law: sketch over a union = slot-wise min of the halves
    sources.take(3).foreach { s0 =>
      val (evens, odds) = docs.filter(_._1 == s0).partition(_._3 % 2 == 0)
      val shE = sourceShingles(s0, evens.map(t => (t._1, t._2)))
      val shO = sourceShingles(s0, odds.map(t => (t._1, t._2)))
      if (shE.nonEmpty && shO.nonEmpty) {
        val merged = slotSig(shE).zip(slotSig(shO)).map { case (x, y) => math.min(x, y) }
        assert(merged.sameElements(slotSig(shE ++ shO)), s"merge law fails for $s0")
      }
    }
  }

  test("q211 coverage is monotone in k and n_types = min(k, |vocab|)") {
    val rows = Evaluation.queries("q211_coverage_curve")(spark, sf).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(10L, 100L, 1000L))
    val vocab = graft.model.Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS tok").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_types") == math.min(r.getAs[Long]("k"), vocab))
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("total_tokens"))
    }
    val covs = rows.map(_.getAs[Long]("cov_ppm"))
    assert(covs.sameElements(covs.sorted), "coverage must be nondecreasing in k")
  }

  test("q212 pack files conserve per-source mass and file ids are the contiguous prefix") {
    val rows = Evaluation.queries("q212_pack_planner")(spark, sf).collect()
    val perSource = graft.model.Tables.documents(spark, sf)
      .groupBy("source").sum("n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, fs) =>
      assert(fs.map(_.getAs[Long]("bytes")).sum == perSource(src), s"$src mass")
      val ids = fs.map(_.getAs[Long]("file_id")).sorted
      assert(ids.sameElements(ids.indices.map(_.toLong)), s"$src file ids not contiguous")
      fs.foreach { f =>
        assert(f.getAs[Long]("fill_ppm") ==
          f.getAs[Long]("bytes") * 1000000L / Evaluation.PackTarget)
      }
    }
  }

  test("q209 shards conserve docs and chars; skew is vs the char total") {
    val rows = Evaluation.queries("q209_shard_manifest")(spark, sf).collect()
    assert(rows.length <= Evaluation.Shards)
    val docs = graft.model.Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val tChars = rows.map(_.getAs[Long]("sum_chars")).sum
    rows.foreach { r =>
      val expected = math.abs(r.getAs[Long]("sum_chars") * Evaluation.Shards - tChars) * 1000000L / tChars
      assert(r.getAs[Long]("skew_ppm") == expected)
    }
  }
}
