package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.ops.Stewardship

/** Round-7 stewardship batch (q343–q349): every law below is either a
  * full brute-force Scala mirror of the operator on the sf0.001 corpus
  * (the strongest check we can run without DuckDB) or a detector-arm
  * proof on injected violations.
  */
class StewardshipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q343 int8 quantization matches a Scala brute-force mirror per dim") {
    val vs = Tables.embeddings(spark, sf)
      .select(expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .collect().map(_.getSeq[Double](0))
    val nd = vs.head.length
    val amax = (0 until nd).map(j => vs.map(v => math.abs(v(j))).max)
    val rows = run("q343_int8_quant").collect()
    assert(rows.length == nd)
    rows.foreach { r =>
      val j = r.getAs[Long]("dim").toInt
      val qs = vs.map { v =>
        if (amax(j) == 0) 0L
        else math.floor(v(j) * 127 / amax(j) + 0.5).toLong
      }
      assert(qs.forall(q => math.abs(q) <= 127), s"dim $j: |q| must be <= 127")
      assert(r.getAs[Long]("sum_abs_q") == qs.map(math.abs).sum, s"dim $j sum_abs_q")
      assert(r.getAs[Long]("n_saturated") == qs.count(q => math.abs(q) == 127))
      assert(r.getAs[Long]("absmax_u") == math.floor(amax(j) * 1000000 + 0.5).toLong)
      assert(r.getAs[Long]("util_ppm") <= 1000000L)
    }
  }

  test("q344 medians and MAD match exact rank selection over the daily grid") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
    val rows = run("q344_mad_anomalies").collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val g = daily.filter(_._1 == t)
      def medianBy(vals: Seq[(Long, String)]): Long = {
        val sorted = vals.sortBy(identity)
        sorted(((sorted.length + 1) / 2) - 1)._1
      }
      val med = medianBy(g.map(x => (x._3, x._2)).toSeq)
      val devs = g.map(x => (math.abs(x._3 - med), x._2)).toSeq
      val mad = medianBy(devs)
      assert(r.getAs[Long]("n_days") == g.length)
      assert(r.getAs[Long]("med") == med, s"$t median")
      assert(r.getAs[Long]("mad") == mad, s"$t MAD")
      assert(r.getAs[Long]("n_anomalies") == devs.count(_._1 > Stewardship.MadK * mad))
      assert(r.getAs[Long]("max_dev") == devs.map(_._1).max)
    }
  }

  test("q345 all six checks pass on the pristine corpus") {
    val rows = run("q345_expectations").collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(r.getAs[Boolean]("pass"),
      s"${r.getString(0)} should pass on pristine data, got ${r.getAs[Long]("n_violations")}"))
  }

  test("q345 every detector arm fires on injected violations") {
    val ts = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    val bad = java.sql.Timestamp.valueOf("1985-01-01 00:00:00")
    val inj = Seq(
      (1L, Some(10L), "O", 100.0, ts, "2-HIGH"),          // clean
      (2L, Some(11L), "O", -5.0, ts, "2-HIGH"),           // c1
      (3L, Some(12L), "X", 100.0, ts, "2-HIGH"),          // c2
      (4L, Some(13L), "O", 100.0, ts, "9-BOGUS"),         // c3
      (5L, None: Option[Long], "O", 100.0, ts, "2-HIGH"), // c4
      (6L, Some(14L), "O", 100.0, bad, "2-HIGH"),         // c5
      (6L, Some(15L), "O", 100.0, ts, "2-HIGH"))          // c6 dup key
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = Stewardship.expectationReport(inj).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(got == Map(
      "c1_totalprice_positive" -> 1L, "c2_status_domain" -> 1L,
      "c3_priority_domain" -> 1L, "c4_custkey_not_null" -> 1L,
      "c5_orderdate_bounds" -> 1L, "c6_orderkey_unique" -> 1L))
  }

  test("q346 chunk geometry matches a per-doc Scala mirror") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cl = Stewardship.ChunkLen.toInt
    val st = Stewardship.ChunkStride.toInt
    case class Agg(chunks: Long = 0, chars: Long = 0, span: Long = 0,
                   bounds: Long = 0, broken: Long = 0)
    val mirror = docs.groupBy(_._1).map { case (src, ds) =>
      var a = Agg()
      ds.foreach { case (_, text) =>
        val nc = text.length
        val n = 1 + (math.max(nc - cl, 0) + st - 1) / st
        a = a.copy(chunks = a.chunks + n, chars = a.chars + nc)
        for (i <- 0 until n) {
          a = a.copy(span = a.span + math.min(cl, nc - i * st))
          if (i > 0) {
            val brk = text.charAt(i * st - 1) != ' ' && text.charAt(i * st) != ' '
            a = a.copy(bounds = a.bounds + 1, broken = a.broken + (if (brk) 1 else 0))
          }
        }
      }
      src -> a
    }
    run("q346_chunking_audit").collect().foreach { r =>
      val a = mirror(r.getString(0))
      assert(r.getAs[Long]("n_chunks") == a.chunks)
      assert(r.getAs[Long]("n_chars") == a.chars)
      assert(r.getAs[Long]("span_chars") == a.span)
      assert(r.getAs[Long]("n_boundaries") == a.bounds)
      assert(r.getAs[Long]("broken") == a.broken)
      assert(r.getAs[Long]("span_chars") >= r.getAs[Long]("n_chars"),
        "overlap cannot be negative")
    }
  }

  test("q347 island histogram matches a Scala sweep-line mirror") {
    val cov = Stewardship.CoverUs
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perUser = ev.groupBy(_._1).map { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      var islands = List.empty[(Long, Long)] // (start, end)
      for ((_, _, us) <- sorted) {
        val en = us + cov
        islands match {
          case (s0, e0) :: rest if us <= e0 =>
            islands = (s0, math.max(e0, en)) :: rest
          case _ => islands = (us, en) :: islands
        }
      }
      (islands.length.toLong, islands.map(i => i._2 - i._1).sum,
        islands.map(i => i._2 - i._1).max)
    }.toSeq
    val hist = perUser.groupBy(_._1).map { case (k, us) =>
      k -> (us.length.toLong, us.map(_._2).sum / 1000000L, us.map(_._3).max / 1000000L)
    }
    val got = run("q347_interval_coverage").collect()
      .map(r => r.getAs[Long]("n_islands") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("covered_s"),
          r.getAs[Long]("max_island_s"))).toMap
    assert(got.keySet == hist.keySet)
    hist.foreach { case (k, (nu, cs, mx)) =>
      assert(got(k)._1 == nu, s"islands=$k n_users")
      assert(got(k)._2 == cs, s"islands=$k covered_s")
      assert(got(k)._3 == mx, s"islands=$k max_island_s")
    }
  }

  test("q348 Theil-Sen median slope matches a Scala brute-force mirror") {
    val months = Tables.orders(spark, sf)
      .select(((year(col("o_orderdate")) - 1990) * 12 +
        month(col("o_orderdate"))).as("t"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("t").agg(sum(col("c")).as("rc"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val slopes = for {
      (t1, r1) <- months; (t2, r2) <- months if t1 < t2
    } yield {
      val num = r2 - r1; val den = t2 - t1
      val su = if (num >= 0) num * 1000000L / den else -((-num) * 1000000L / den)
      (su, num, den, t1, t2)
    }
    val sorted = slopes.sortBy(identity)
    val medianRow = sorted(((sorted.length + 1) / 2) - 1)
    val r = run("q348_theil_sen").collect()(0)
    assert(r.getAs[Long]("n_months") == months.length)
    assert(r.getAs[Long]("n_pairs") == slopes.length)
    assert(r.getAs[Long]("ts_slope_u") == medianRow._1)
    assert(r.getAs[Long]("min_slope_u") == sorted.head._1)
    assert(r.getAs[Long]("max_slope_u") == sorted.last._1)
  }

  test("q349 Benford grid laws: constants sum to 1e6, counts conserve, zeros explicit") {
    assert(Stewardship.BenfordPpm.sum == 1000000L)
    val rows = run("q349_benford").collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "every positive-cents order carries exactly one first digit")
    rows.foreach { r =>
      assert(r.getAs[Long]("chi2_scaled") >= 0)
      assert(r.getAs[Long]("abs_delta_ppm") ==
        math.abs(r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm")))
    }
  }

  test("q350 cascade closure laws: FK containment, zero orphans, determinism") {
    val rows = run("q350_deletion_cascade").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    // a transitive closure leaves no orphans, and the cascade fans OUT
    rows.values.foreach(r => assert(r.getAs[Long]("n_orphans") == 0L))
    assert(rows("customer").getAs[Long]("n_delete") > 0, "5% cohort is non-empty")
    assert(rows("orders").getAs[Long]("n_delete") >=
      0L.max(rows("customer").getAs[Long]("n_delete") - rows("customer").getAs[Long]("n_rows")))
    // rerun is bit-identical (hash acceptance, no rand())
    val again = run("q350_deletion_cascade").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_delete"))).toMap
    rows.foreach { case (t, r) => assert(again(t) == r.getAs[Long]("n_delete")) }
  }

  test("q351 skyline matches the brute-force dominance definition") {
    val parts = Tables.part(spark, sf)
      .select(col("p_size").cast("long"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bestBySize = parts.groupBy(_._1).map { case (sz, ps) =>
      sz -> ps.map(_._2).min }
    val rows = run("q351_pareto_frontier").collect()
    rows.foreach { r =>
      val sz = r.getAs[Long]("p_size"); val bp = r.getAs[Long]("best_price_c")
      assert(bp == bestBySize(sz))
      val dominated = bestBySize.exists { case (s2, p2) => s2 > sz && p2 <= bp }
      assert(r.getAs[Boolean]("on_frontier") == !dominated, s"size $sz")
    }
    // along the frontier, a LARGER size must cost strictly MORE — were it
    // as cheap, it would dominate the smaller point off the frontier
    val frontier = rows.filter(_.getAs[Boolean]("on_frontier"))
      .map(r => (r.getAs[Long]("p_size"), r.getAs[Long]("best_price_c")))
      .sortBy(_._1)
    frontier.sliding(2).foreach {
      case Array((_, p1), (_, p2)) =>
        assert(p2 > p1, "frontier prices must strictly increase with size")
      case _ =>
    }
  }

  test("q352 drawdown matches a Scala running-peak mirror") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    run("q352_drawdown").collect().foreach { r =>
      val t = r.getString(0)
      val series = daily.filter(_._1 == t).sortBy(_._2)
      var peak = 0L; var maxDd = 0L; var under = 0L; var ddDay = ""
      series.foreach { case (_, day, n) =>
        peak = math.max(peak, n)
        val dd = peak - n
        if (dd > 0) under += 1
        if (dd > maxDd) { maxDd = dd; ddDay = day }
        else if (maxDd == 0 && ddDay.isEmpty) ddDay = day // dd=0 tie: first day
      }
      assert(r.getAs[Long]("n_days") == series.length)
      assert(r.getAs[Long]("peak_max") == peak)
      assert(r.getAs[Long]("max_drawdown") == maxDd, s"$t max_drawdown")
      assert(r.getAs[Long]("days_underwater") == under, s"$t days_underwater")
      assert(r.getAs[java.sql.Date]("max_dd_day").toString == ddDay, s"$t max_dd_day")
    }
  }

  test("q353 boundaries cover their target ranks exactly and are monotone") {
    val n = Tables.documents(spark, sf).count()
    val lens = Tables.documents(spark, sf).select(col("n_chars"))
      .collect().map(_.getLong(0)).sorted
    val rows = run("q353_range_splits").collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == (1L to 7L))
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val rk = r.getAs[Long]("target_rank")
      assert(rk == k * n / 8)
      // the boundary IS the value at the target rank in the sorted corpus
      assert(r.getAs[Long]("boundary_n_chars") == lens((rk - 1).toInt),
        s"k=$k boundary must equal the rank-$rk value")
      assert(r.getAs[Long]("cum_le_boundary") >= rk)
      assert(r.getAs[Long]("overshoot_ppm") >= 0)
    }
    val bs = rows.map(_.getAs[Long]("boundary_n_chars"))
    bs.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
  }

  test("q355 JL ratios are valid and the projection is sign-matrix exact") {
    val r = run("q355_jl_projection").collect()(0)
    assert(r.getAs[Long]("n_pairs") > 0)
    assert(r.getAs[Long]("min_ratio_u") >= 0)
    assert(r.getAs[Long]("min_ratio_u") <= r.getAs[Long]("mean_ratio_u"))
    assert(r.getAs[Long]("mean_ratio_u") <= r.getAs[Long]("max_ratio_u"))
    assert(r.getAs[Long]("n_within_10pct") <= r.getAs[Long]("n_pairs"))
    // the estimator is UNBIASED (E[d16²/16] = d64² for ±1 rows), so the
    // mean ratio must sit near 10⁶ even though per-pair spread at k=16
    // is wide (Var ≈ 2/k → ~35% std — "most pairs within 10%" would be
    // a WRONG law at this k). A sign-matrix bug (e.g. all-same-sign
    // rows degenerating to rank 1) pushes the mean far from 10⁶.
    val mean = r.getAs[Long]("mean_ratio_u")
    assert(mean > 500000L && mean < 2000000L,
      s"mean ratio $mean not near 1e6 - projection matrix broken?")
  }

  test("q356 farthest-point traversal matches a Scala maximin mirror") {
    val vs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(CAST(embedding AS ARRAY<DOUBLE>)," +
        " x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var sel = List(vs.minBy(_._1))
    var expected = List((1L, sel.head._1, 0L))
    for (k <- 2 to 4) {
      val cand = vs.filterNot(v => sel.exists(_._1 == v._1))
        .map(v => (v, sel.map(s => d2(v._2, s._2)).min))
      val (best, mind) = cand.maxBy { case ((id, _), m) => (m, -id) }
      sel = sel :+ best
      expected = expected :+ ((k.toLong, best._1, mind))
    }
    val got = run("q356_farthest_points").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("mindist_sq"))).toList
    assert(got == expected)
  }

  test("q357 SRM arms partition the users and chi2 is consistent") {
    val rows = run("q357_srm_check").collect()
    val all = rows.filter(_.getString(0) == "__all__").head
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(all.getAs[Long]("n_a") + all.getAs[Long]("n_b") == users)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(r.getAs[Long]("delta_ppm") == math.abs(a - b) * 1000000L / (a + b))
      assert(r.getAs[Long]("chi2_scaled") == (a - b) * (a - b) * 1000000L / (a + b))
    }
  }

  test("q358 peak window matches a Scala sliding-sum mirror") {
    val buckets = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 300000000").as("b"))
      .groupBy("event_type", "b").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    run("q358_peak_window").collect().foreach { r =>
      val t = r.getString(0)
      val g = buckets.filter(_._1 == t).map(x => (x._2, x._3)).sortBy(_._1)
      val wins = g.map { case (b, _) =>
        (b, g.filter(x => x._1 >= b - 11 && x._1 <= b).map(_._2).sum) }
      val peak = wins.map(_._2).max
      val pb = wins.filter(_._2 == peak).map(_._1).min
      assert(r.getAs[Long]("n_buckets") == g.length)
      assert(r.getAs[Long]("total_events") == g.map(_._2).sum)
      assert(r.getAs[Long]("peak_events") == peak, s"$t peak")
      assert(r.getAs[Long]("peak_window_start_us") == (pb - 11) * 300000000L)
    }
  }

  test("q359 percentiles are actual observed latencies at the right ranks") {
    val lat = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    run("q359_sla_latency").collect().foreach { r =>
      val p = r.getString(0)
      val sorted = lat.filter(_._1 == p).map(_._2).sorted
      val n = sorted.length
      assert(r.getAs[Long]("n_lines") == n)
      def atRank(k: Int): Long = sorted(((n * k + 99) / 100 - 1).toInt)
      assert(r.getAs[Long]("p50_days") == atRank(50), s"$p p50")
      assert(r.getAs[Long]("p90_days") == atRank(90), s"$p p90")
      assert(r.getAs[Long]("p99_days") == atRank(99), s"$p p99")
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p90_days"))
      assert(r.getAs[Long]("p90_days") <= r.getAs[Long]("p99_days"))
    }
  }

  test("q360 q-errors are >= 1e6 and actuals match direct join counts") {
    val rows = run("q360_cardinality_qerror").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_error_ppm") >= 1000000L,
        "q-error is max/min, so always >= 1")
      assert(r.getAs[Long]("est_rows") > 0 && r.getAs[Long]("actual_rows") > 0)
    }
    val actNC = Tables.nation(spark, sf).join(Tables.customer(spark, sf),
      col("n_nationkey") === col("c_nationkey")).count()
    assert(rows.find(_.getString(0) == "s1_nation_customer").get
      .getAs[Long]("actual_rows") == actNC)
  }

  test("q361 zone-map laws: clustering dominates, scans cover matches") {
    val rows = run("q361_zonemap_skip").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("files_total") == 32 ||
        r.getAs[Long]("files_total") > 0)
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"),
        "a zone map never skips a file containing a match (no false skips)")
    }
    // at equal thresholds the value-clustered layout never scans MORE
    val byT = rows.groupBy(_.getAs[Long]("t"))
    byT.foreach { case (t, rs) =>
      val a = rs.find(_.getString(0) == "a_insertion_order").get
      val b = rs.find(_.getString(0) == "b_value_clustered").get
      assert(b.getAs[Long]("rows_scanned") <= a.getAs[Long]("rows_scanned"),
        s"t=$t clustering must not scan more")
    }
  }

  test("q362 sigma census conserves vectors and matches a Scala mirror") {
    val vs = Tables.embeddings(spark, sf)
      .select(expr("transform(CAST(embedding AS ARRAY<DOUBLE>)," +
        " x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))"))
      .collect().map(_.getSeq[Long](0))
    val nd = vs.head.length
    val n = vs.length.toLong
    val stats = (0 until nd).map { j =>
      val col = vs.map(_(j))
      (col.sum, col.map(q => q * q).sum)
    }
    val expected = vs.map { v =>
      (0 until nd).count { j =>
        val (sq, sqq) = stats(j)
        val devN = BigInt(v(j) * n - sq)
        devN * devN > 4 * (BigInt(n) * sqq - BigInt(sq) * sq)
      }.toLong
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = run("q362_sigma_dims").collect()
      .map(r => r.getAs[Long]("n_outlier_dims") -> r.getAs[Long]("n_vectors"))
      .toMap
    assert(got == expected)
  }

  test("q363 aHash clusters conserve images and find genuine duplicates") {
    val rows = run("q363_phash_dedup").collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_images")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_images"))
      assert(r.getAs[Long]("dup_images") ==
        r.getAs[Long]("n_images") - r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("max_cluster") >= 1)
    }
    // the pattern repeats with doc_id period 256 within a (w, h) class,
    // so at >> 256·20 docs duplicates MUST exist
    if (total > 6000) assert(rows.map(_.getAs[Long]("dup_images")).sum > 0)
  }

  test("q364 CUSUM matches the sequential max(0, S+z) recursion exactly") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    run("q364_cusum").collect().foreach { r =>
      val t = r.getString(0)
      val series = daily.filter(_._1 == t).sortBy(_._2)
      val dd = series.length.toLong
      val tt = series.map(_._3).sum
      var s = 0L; var mx = 0L; var alarms = 0L; var firstDay: Option[String] = None
      series.foreach { case (_, day, n) =>
        s = math.max(0L, s + n * dd - tt) // the textbook recursion
        mx = math.max(mx, s)
        if (s > 4 * tt) { alarms += 1; if (firstDay.isEmpty) firstDay = Some(day) }
      }
      assert(r.getAs[Long]("n_days") == dd)
      assert(r.getAs[Long]("max_cusum") == mx,
        s"$t closed form P - runmin(P) must equal the recursion")
      assert(r.getAs[Long]("n_alarm_days") == alarms)
      val gotDay = Option(r.getAs[java.sql.Date]("first_alarm_day")).map(_.toString)
      assert(gotDay == firstDay, s"$t first alarm day")
    }
  }

  test("q365 readability stats match per-doc Scala regex counts") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val mirror = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ((
        ds.map(d => "[.!?]+".r.findAllIn(d._2).length.toLong).sum,
        ds.map(d => d._2.trim.split(" +").length.toLong).sum,
        ds.map(d => "[aeiouAEIOU]+".r.findAllIn(d._2).length.toLong).sum))
    }
    run("q365_readability").collect().foreach { r =>
      val (sents, words, vg) = mirror(r.getString(0))
      assert(r.getAs[Long]("sentences") == sents)
      assert(r.getAs[Long]("words") == words)
      assert(r.getAs[Long]("vowel_groups") == vg)
      assert(r.getAs[Long]("vgroups_per_word_ppm") == vg * 1000000L / math.max(words, 1L))
    }
  }

  test("q366 conformal intervals achieve the marginal coverage guarantee") {
    val rows = run("q366_conformal").collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0)
      assert(r.getAs[Long]("qhat_u") >= 0)
      // split-conformal marginal validity: coverage ≈ 90%; allow
      // finite-sample + exchangeability slack on the hash split
      val cov = r.getAs[Long]("coverage_ppm")
      assert(cov >= 820000L, s"$t coverage $cov below the conformal bound")
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_test"))
    }
  }

  test("q367 RRF laws: anchor tops its own cosine list, scores are exact") {
    val rows = run("q367_rrf_fusion").collect()
    assert(rows.length == 10)
    val anchorId = Tables.embeddings(spark, sf)
      .agg(min(col("vec_id"))).collect()(0).getLong(0)
    val anchorRow = rows.find(_.getAs[Long]("vec_id") == anchorId)
    assert(anchorRow.isDefined, "self-retrieval: the anchor must be fused in")
    assert(anchorRow.get.getAs[Long]("rank_cos") == 1L)
    assert(anchorRow.get.getAs[Long]("rank_l2") == 1L,
      "anchor has dot=|a|^2 max-cos AND l2=0 min")
    rows.foreach { r =>
      val (ra, rb) = (r.getAs[Long]("rank_cos"), r.getAs[Long]("rank_l2"))
      assert(ra >= 1 && ra <= 33 && rb >= 1 && rb <= 33)
      assert(r.getAs[Long]("rrf_score") ==
        1000000000L / (60 + ra) + 1000000000L / (60 + rb))
    }
    // output is sorted by fused score
    val scores = rows.map(_.getAs[Long]("rrf_score"))
    scores.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("q368 trimmed mean matches a Scala mirror and bounds the raw mean tails") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    run("q368_trimmed_mean").collect().foreach { r =>
      val p = r.getString(0)
      val sorted = orders.filter(_._1 == p).sortBy(x => (x._3, x._2)).map(_._3)
      val n = sorted.length
      val lo = (n + 19) / 20
      val hi = (19 * n) / 20
      val mid = sorted.slice(lo, hi) // ranks lo+1..hi (1-indexed)
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Long]("n_kept") == mid.length)
      assert(r.getAs[Long]("mean_cents") == sorted.sum / n)
      assert(r.getAs[Long]("trimmed_mean_cents") == mid.sum / mid.length)
      // the trimmed mean must lie within the kept range
      assert(r.getAs[Long]("trimmed_mean_cents") >= mid.min &&
        r.getAs[Long]("trimmed_mean_cents") <= mid.max)
    }
  }

  test("q369 holding times conserve transitions and match a Scala mirror") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val mirror = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      sorted.sliding(2).collect {
        case Array(a, b) => ((a._3, b._3), b._4 - a._4)
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._2).sum / vs.length, vs.map(_._2).max,
        vs.count(_._2 == 0L).toLong)
    }
    val rows = run("q369_holding_times").collect()
    // conservation: Σ transitions = Σ_users (events_u − 1)
    val users = ev.groupBy(_._1).map(_._2.length.toLong)
    assert(rows.map(_.getAs[Long]("n_transitions")).sum ==
      users.map(_ - 1).sum)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (n, mean, mx, inst) = mirror(k)
      assert(r.getAs[Long]("n_transitions") == n, s"$k count")
      assert(r.getAs[Long]("mean_dwell_us") == mean, s"$k mean")
      assert(r.getAs[Long]("max_dwell_us") == mx, s"$k max")
      assert(r.getAs[Long]("n_instant") == inst, s"$k instant")
    }
  }

  test("q370 KS statistic matches a brute-force empirical-CDF mirror") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    run("q370_ks_statistic").collect().foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (xa, xb) = (bySrc(sa), bySrc(sb))
      val vals = (xa ++ xb).distinct
      val dnum = vals.map { v =>
        math.abs(xa.count(_ <= v).toLong * xb.length -
          xb.count(_ <= v).toLong * xa.length)
      }.max
      assert(r.getAs[Long]("n_a") == xa.length && r.getAs[Long]("n_b") == xb.length)
      assert(r.getAs[Long]("d_scaled") == dnum, s"($sa,$sb) KS numerator")
      assert(r.getAs[Long]("ks_ppm") ==
        dnum * 1000000L / (xa.length.toLong * xb.length))
    }
  }

  test("q371 Mann-Whitney 2U matches brute-force pair counting; delta in [-1,1]") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    run("q371_mannwhitney").collect().foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (xa, xb) = (bySrc(sa), bySrc(sb))
      val u2 = (for (x <- xa; y <- xb) yield {
        if (x > y) 2L else if (x == y) 1L else 0L
      }).sum
      assert(r.getAs[Long]("u2_a") == u2, s"($sa,$sb) 2U")
      val d = r.getAs[Long]("cliffs_delta_ppm")
      assert(d >= -1000000L && d <= 1000000L)
    }
  }

  test("q372 Kruskal-Wallis doubled rank sums match brute-force midranks and conserve N(N+1)") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = docs.map(_._2)
    val n = all.length.toLong
    def rank2(v: Long): Long = 2L * all.count(_ < v) + all.count(_ == v) + 1
    val rows = run("q372_kruskal_wallis").collect()
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src).map(_._2)
      assert(r.getAs[Long]("n_docs") == mine.length)
      val r2 = mine.map(rank2).sum
      assert(r.getAs[Long]("rank2_sum") == r2, s"$src rank2_sum")
      assert(r.getAs[Long]("mean_rank_milli") == r2 * 1000 / (2L * mine.length))
      assert(r.getAs[Long]("delta_milli") ==
        r2 * 1000 / (2L * mine.length) - (n + 1) * 500)
    }
    assert(rows.map(_.getAs[Long]("rank2_sum")).sum == n * (n + 1),
      "doubled rank sums must conserve N(N+1)")
  }

  test("q373 Mann-Kendall S, tie-corrected var18 and tau match brute force") {
    val utc = java.time.ZoneOffset.UTC
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toInstant.atZone(utc).toLocalDate))
      .groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }
      .toSeq
    run("q373_mann_kendall").collect().foreach { r =>
      val t = r.getString(0)
      val series = daily.filter(_._1 == t).sortBy(_._2.toEpochDay)
        .map(_._3)
      val nDays = series.length.toLong
      val s = (for (i <- series.indices; j <- i + 1 until series.length)
        yield java.lang.Long.signum(series(j) - series(i)).toLong).sum
      val tiesum = series.groupBy(identity).values
        .map(g => { val tt = g.length.toLong; tt * (tt - 1) * (2 * tt + 5) })
        .sum
      assert(r.getAs[Long]("n_days") == nDays, s"$t n_days")
      assert(r.getAs[Long]("s_stat") == s, s"$t s_stat")
      assert(r.getAs[Long]("var18_num") ==
        nDays * (nDays - 1) * (2 * nDays + 5) - tiesum, s"$t var18")
      val denom = nDays * (nDays - 1)
      val tau = if (s >= 0) s * 2000000L / denom else -((-s) * 2000000L / denom)
      assert(r.getAs[Long]("tau_ppm") == tau, s"$t tau_ppm")
    }
  }

  // Scala mirror of the classic top-down Hilbert xy2d (the exact
  // algorithm hilbertSql folds at runtime).
  private def hilbertXy2d(x0: Long, y0: Long): Long = {
    var (x, y, dd) = (x0, y0, 0L)
    var i = 7
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      dd += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 255 - x; y = 255 - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    dd
  }

  test("q374 Hilbert index: bijective, unit-step adjacent, and the SQL fold matches the mirror") {
    // Law 1-2 on the Scala mirror over the FULL 256x256 domain: only a
    // true Hilbert curve visits every cell once moving one cell per step.
    val pos = new Array[Int](65536)
    java.util.Arrays.fill(pos, -1)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = hilbertXy2d(x, y).toInt
      assert(pos(d) == -1, s"collision at d=$d")
      pos(d) = x * 256 + y
    }
    for (d <- 0 until 65535) {
      val (x1, y1) = (pos(d) / 256, pos(d) % 256)
      val (x2, y2) = (pos(d + 1) / 256, pos(d + 1) % 256)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step at d=$d")
    }
    // Law 3: the runtime aggregate() fold computes the same index for
    // every cell of the domain.
    val got = spark.range(65536)
      .selectExpr("id div 256 AS x", "id % 256 AS y")
      .selectExpr("x", "y", s"${Stewardship.hilbertSql("x", "y")} AS h")
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("h") ==
        hilbertXy2d(r.getAs[Long]("x"), r.getAs[Long]("y")))
    }
  }

  test("q374 layout audit: conserved row totals, no false skips, bounded file count") {
    val rows = run("q374_hilbert_layout").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("a_hilbert", "b_zorder", "c_row_order"))
    val totals = rows.map(_.getAs[Long]("rows_total")).distinct
    assert(totals.length == 1, "every layout must file every row")
    rows.foreach { r =>
      assert(r.getAs[Long]("files_total") <= 2048L)
      assert(r.getAs[Long]("files_box") <= r.getAs[Long]("files_total"))
      // zone maps may over-read but never false-skip
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"))
    }
  }

  test("q375 Wasserstein-1 matches a brute-force sorted-merge mirror") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    run("q375_wasserstein").collect().foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (xa, xb) = (bySrc(sa), bySrc(sb))
      val vals = (xa ++ xb).distinct.sorted
      // sum over grid cells of |Fa·nb − Fb·na| · gap-to-next-value
      val wnum = vals.zip(vals.tail).map { case (v, nxt) =>
        math.abs(xa.count(_ <= v).toLong * xb.length -
          xb.count(_ <= v).toLong * xa.length) * (nxt - v)
      }.sum
      assert(r.getAs[Long]("n_a") == xa.length && r.getAs[Long]("n_b") == xb.length)
      assert(r.getAs[Long]("w1_scaled") == wnum, s"($sa,$sb) W1 numerator")
      assert(r.getAs[Long]("w1_milli") ==
        wnum * 1000L / (xa.length.toLong * xb.length))
    }
  }

  test("q376 Cramer-von Mises matches brute force and is KS-bounded") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val ks = run("q370_ks_statistic").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("d_scaled"))
      .toMap
    run("q376_cramer_von_mises").collect().foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (xa, xb) = (bySrc(sa), bySrc(sb))
      val pooled = xa ++ xb
      val num = pooled.distinct.map { v =>
        val d = BigInt(xa.count(_ <= v).toLong * xb.length -
          xb.count(_ <= v).toLong * xa.length)
        BigInt(pooled.count(_ == v)) * d * d
      }.sum
      val n = BigInt(pooled.length)
      val expect = num * 1000000 /
        (n * n * BigInt(xa.length.toLong * xb.length))
      assert(BigInt(r.getAs[Long]("cvm_ppm")) == expect, s"($sa,$sb) cvm_ppm")
      // ω² at each point is ≤ the KS sup-norm gap squared
      val dks = BigInt(ks((sa, sb)))
      assert(num <= n * dks * dks, s"($sa,$sb) CvM must be KS-bounded")
    }
  }

  test("q377 Kendall co-movement matches brute force; self-law tau(x,x)=1") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1).map { case (k, v) =>
      k -> v.map(x => x._2 -> x._3).toMap
    }
    run("q377_kendall_comove").collect().foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (ma, mb) = (byType(ta), byType(tb))
      val days = ma.keySet.intersect(mb.keySet).toSeq.sorted
      var (conc, disc) = (0L, 0L)
      for (i <- days.indices; j <- i + 1 until days.length) {
        val s = math.signum(ma(days(j)) - ma(days(i))) *
          math.signum(mb(days(j)) - mb(days(i)))
        if (s > 0) conc += 1 else if (s < 0) disc += 1
      }
      assert(r.getAs[Long]("n_days") == days.length)
      assert(r.getAs[Long]("concordant") == conc, s"($ta,$tb) concordant")
      assert(r.getAs[Long]("discordant") == disc, s"($ta,$tb) discordant")
      val n = days.length.toLong
      val t = r.getAs[Long]("tau_ppm")
      assert(t >= -1000000L && t <= 1000000L)
      if (conc - disc >= 0)
        assert(t == (conc - disc) * 2000000L / math.max(n * (n - 1), 1L))
    }
  }

  test("q378 runs test matches a brute-force day-ordered mirror") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1)
    run("q378_runs_test").collect().foreach { r =>
      val et = r.getString(0)
      val series = byType(et).sortBy(_._2).map(_._3)
      val sorted = series.sorted
      val med = sorted((series.length + 1) / 2 - 1) // lower median, 1-based ceil rank
      val bits = series.map(x => if (x > med) 1 else 0)
      val runs = 1 + bits.zip(bits.tail).count { case (a, b) => a != b }
      val n1 = bits.count(_ == 1).toLong
      val n = series.length.toLong
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("n_above") == n1, s"$et n_above")
      assert(r.getAs[Long]("runs") == runs, s"$et runs")
      assert(r.getAs[Long]("e_runs_milli") == (n + 2 * n1 * (n - n1)) * 1000 / n)
      assert(r.getAs[Long]("var_num") ==
        2 * n1 * (n - n1) * (2 * n1 * (n - n1) - n))
    }
  }

  test("q379 Fano sufficient stats match brute force; Poisson-ish data stays near 1e6") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val byType = daily.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    run("q379_fano_burstiness").collect().foreach { r =>
      val et = r.getString(0)
      val xs = byType(et)
      val (n, sx, sxx) = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("sum_n") == sx, s"$et sum_n")
      assert(r.getAs[Long]("sum_sq") == sxx, s"$et sum_sq")
      val varNum = n * sxx - sx * sx
      assert(varNum >= 0, "Cauchy-Schwarz")
      assert(r.getAs[Long]("var_num") == varNum)
      assert(r.getAs[Long]("fano_ppm") == varNum * 1000000L / ((n - 1) * sx))
    }
  }

  test("q380 energy distance matches a brute-force CDF-integral mirror; D*W1 bound holds") {
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    run("q380_energy_distance").collect().foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (xs, ys) = (bySource(sa), bySource(sb))
      val (na, nb) = (xs.length.toLong, ys.length.toLong)
      val grid = (xs ++ ys ++ bySource.values.flatten).distinct.sorted
      var (e, w1) = (BigInt(0), BigInt(0))
      var dmax = 0L
      grid.zip(grid.tail).foreach { case (v, nxt) =>
        val fa = xs.count(_ <= v).toLong
        val fb = ys.count(_ <= v).toLong
        val diff = fa * nb - fb * na
        dmax = math.max(dmax, math.abs(diff))
        e += BigInt(diff) * diff * (nxt - v)
        w1 += BigInt(math.abs(diff)) * (nxt - v)
      }
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
      val denom = BigInt(na) * na * nb * nb
      assert(BigInt(r.getAs[Long]("int_sq_ppm")) == e * 1000000 / denom,
        s"($sa,$sb) int_sq_ppm")
      assert(BigInt(r.getAs[Long]("energy_ppm")) == e * 2000000 / denom)
      // |dF| <= D everywhere => integral of dF^2 <= D * integral of |dF|
      assert(e <= BigInt(dmax) * w1, s"($sa,$sb) D*W1 bound")
    }
  }

  test("q381 turning points match a brute-force day-ordered mirror") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1)
    run("q381_turning_points").collect().foreach { r =>
      val et = r.getString(0)
      val xs = byType(et).sortBy(_._2).map(_._3)
      val peaks = (1 until xs.length - 1)
        .count(i => xs(i) > xs(i - 1) && xs(i) > xs(i + 1)).toLong
      val troughs = (1 until xs.length - 1)
        .count(i => xs(i) < xs(i - 1) && xs(i) < xs(i + 1)).toLong
      val n = xs.length.toLong
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("n_peaks") == peaks, s"$et peaks")
      assert(r.getAs[Long]("n_troughs") == troughs, s"$et troughs")
      assert(r.getAs[Long]("n_turning") == peaks + troughs)
      assert(r.getAs[Long]("n_turning") <= math.max(n - 2, 0))
      assert(r.getAs[Long]("e_tp_milli") ==
        (if (n >= 3) 2000 * (n - 2) / 3 else 0L))
      assert(r.getAs[Long]("var90_num") == (if (n >= 3) 16 * n - 29 else 0L))
    }
  }

  test("q382 Blomqvist beta quadrants match a brute-force median-split mirror") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1).map { case (k, v) =>
      k -> v.map(x => x._2 -> x._3).toMap
    }
    run("q382_blomqvist_beta").collect().foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (ma0, mb0) = (byType(ta), byType(tb))
      val days = ma0.keySet.intersect(mb0.keySet).toSeq.sorted
      val nd = days.length
      val k = (nd + 1) / 2
      val medA = days.map(d => (ma0(d), d)).sorted.apply(k - 1)._1
      val medB = days.map(d => (mb0(d), d)).sorted.apply(k - 1)._1
      val pp = days.count(d => ma0(d) > medA && mb0(d) > medB).toLong
      val mm = days.count(d => ma0(d) < medA && mb0(d) < medB).toLong
      val pm = days.count(d => ma0(d) > medA && mb0(d) < medB).toLong
      val mp = days.count(d => ma0(d) < medA && mb0(d) > medB).toLong
      assert(r.getAs[Long]("n_days") == nd.toLong)
      assert(r.getAs[Long]("n_pp") == pp, s"($ta,$tb) n_pp")
      assert(r.getAs[Long]("n_mm") == mm)
      assert(r.getAs[Long]("n_pm") == pm)
      assert(r.getAs[Long]("n_mp") == mp)
      assert(r.getAs[Long]("n_ties") == nd - pp - mm - pm - mp)
      val (num, den) = (pp + mm - pm - mp, math.max(pp + mm + pm + mp, 1L))
      val want = if (num >= 0) num * 1000000L / den else -((-num) * 1000000L / den)
      assert(r.getAs[Long]("beta_ppm") == want, s"($ta,$tb) beta")
      assert(math.abs(r.getAs[Long]("beta_ppm")) <= 1000000L)
    }
  }

  test("q383 record days match brute force; harmonic expectation is the exact DIV sum") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1)
    run("q383_record_days").collect().foreach { r =>
      val et = r.getString(0)
      val xs = byType(et).sortBy(_._2).map(_._3)
      var (hi, lo) = (0L, 0L)
      xs.indices.foreach { i =>
        if (i == 0 || xs(i) > xs.take(i).max) hi += 1
        if (i == 0 || xs(i) < xs.take(i).min) lo += 1
      }
      val n = xs.length.toLong
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("n_record_high") == hi, s"$et highs")
      assert(r.getAs[Long]("n_record_low") == lo, s"$et lows")
      assert(r.getAs[Long]("expected_ppm") ==
        (1L to n).map(1000000L / _).sum, s"$et harmonic")
    }
  }

  test("q384 Bowley quartiles are exact ceil-rank selections and the skew is bounded") {
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    run("q384_bowley_skew").collect().foreach { r =>
      val src = r.getString(0)
      val xs = bySource(src)
      val n = xs.length.toLong
      def at(k: Long) = xs((k - 1).toInt)
      val (q1, q2, q3) = (at((n + 3) / 4), at((n + 1) / 2), at((3 * n + 3) / 4))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("q1") == q1, s"$src q1")
      assert(r.getAs[Long]("q2") == q2, s"$src q2")
      assert(r.getAs[Long]("q3") == q3, s"$src q3")
      assert(r.getAs[Long]("iqr") == q3 - q1)
      val num = q3 + q1 - 2 * q2
      val den = math.max(q3 - q1, 1L)
      val want = if (num >= 0) num * 1000L / den else -((-num) * 1000L / den)
      assert(r.getAs[Long]("bowley_milli") == want, s"$src bowley")
      assert(math.abs(r.getAs[Long]("bowley_milli")) <= 1000L)
    }
  }

  test("q385 lag slopes match a zero-filled brute-force mirror; lag-0 self-law") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val rows = run("q385_lag_slope").collect()
    assert(rows.map(_.getString(0)).distinct.length * 4 == rows.length,
      "four lags per type")
    rows.foreach { r =>
      val et = r.getString(0)
      val k = r.getAs[Long]("lag_days").toInt
      val m0 = byType(et).map(x => x._2 -> x._3).toMap
      val (d0, d1) = (m0.keys.min, m0.keys.max)
      val series = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => m0.getOrElse(d, 0L)).toVector
      val pairs = series.dropRight(k).zip(series.drop(k))
      val m = pairs.length.toLong
      val sx = pairs.map(_._1).sum
      val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val cov = m * sxy - BigInt(sx) * sy
      val vn = m * sxx - BigInt(sx) * sx
      assert(r.getAs[Long]("n_pairs") == m, s"$et k=$k n_pairs")
      assert(BigInt(r.getAs[Long]("cov_num")) == cov, s"$et k=$k cov")
      assert(BigInt(r.getAs[Long]("var_num")) == vn)
      val den = vn.max(BigInt(1))
      val want = if (cov >= 0) cov * 1000000 / den else -((-cov) * 1000000 / den)
      assert(BigInt(r.getAs[Long]("slope_ppm")) == want, s"$et k=$k slope")
    }
  }

  test("q386 exact quantiles match sorted ranks and the GK bound certifies") {
    val xs = Tables.documents(spark, sf)
      .select(col("n_chars")).collect().map(_.getLong(0)).sorted
    val n = xs.length.toLong
    val rows = run("q386_gk_percentile_audit").collect()
    assert(rows.map(_.getAs[Long]("percentile_pct")).toSeq ==
      Seq(25L, 50L, 75L, 90L, 99L))
    rows.foreach { r =>
      val p = r.getAs[Long]("percentile_pct")
      val k = (p * n + 99) / 100
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("exact_q") == xs((k - 1).toInt), s"p=$p exact_q")
      assert(r.getAs[Long]("rank_err_bound") == n / 1000 + 2)
      assert(r.getAs[Boolean]("within_bound"), s"p=$p GK bound violated")
    }
  }

  test("q387 Wilcoxon signed-rank matches a brute-force midrank mirror") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1).map { case (k, v) =>
      k -> v.map(x => x._2 -> x._3).toMap
    }
    run("q387_wilcoxon_signed").collect().foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val days = byType(ta).keySet.intersect(byType(tb).keySet).toSeq.sorted
      val dd = days.map(d => byType(ta)(d) - byType(tb)(d))
      val nz = dd.filterNot(_ == 0L)
      // doubled midrank of |d| = 2*(count strictly smaller) + (count tied) + 1
      def mr2(a: Long) = 2 * nz.count(x => math.abs(x) < math.abs(a)) +
        nz.count(x => math.abs(x) == math.abs(a)) + 1
      val w2 = nz.filter(_ > 0).map(a => mr2(a).toLong).sum
      val nn = nz.length.toLong
      val ties3 = nz.groupBy(math.abs).values
        .map(g => { val t = g.length.toLong; t * t * t - t }).sum
      assert(r.getAs[Long]("n_nonzero") == nn)
      assert(r.getAs[Long]("n_zero") == dd.count(_ == 0L).toLong)
      assert(r.getAs[Long]("n_pos") == nz.count(_ > 0).toLong)
      assert(r.getAs[Long]("n_neg") == nz.count(_ < 0).toLong)
      assert(r.getAs[Long]("w_plus_x2") == w2, s"($ta,$tb) w_plus_x2")
      assert(r.getAs[Long]("e_w_x2") == nn * (nn + 1) / 2)
      assert(r.getAs[Long]("var48_num") ==
        2 * nn * (nn + 1) * (2 * nn + 1) - ties3, s"($ta,$tb) var48")
      // W+ doubled is bounded by the full rank sum doubled = n(n+1)
      assert(w2 >= 0 && w2 <= nn * (nn + 1))
    }
  }

  test("q388 Mood scale statistic matches a brute-force pooled-midrank mirror") {
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    run("q388_mood_scale").collect().foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (xs, ys) = (bySource(sa), bySource(sb))
      val pooled = xs ++ ys
      val bigN = pooled.length.toLong
      def mr2(v: Long) = 2 * pooled.count(_ < v) + pooled.count(_ == v) + 1
      def m4(zs: Seq[Long]) = zs.map { v =>
        val dev = mr2(v) - (bigN + 1); BigInt(dev) * dev
      }.sum
      val (ma, mb) = (m4(xs), m4(ys))
      assert(r.getAs[Long]("n_a") == xs.length.toLong)
      assert(BigInt(r.getAs[Long]("m4_a")) == ma, s"($sa,$sb) m4_a")
      assert(BigInt(r.getAs[Long]("m4_b")) == mb, s"($sa,$sb) m4_b")
      val den = (BigInt(xs.length) * (bigN * bigN - 1)).max(BigInt(1))
      assert(BigInt(r.getAs[Long]("scale_a_ppm")) == ma * 3000000 / den)
    }
  }

  test("q389 Mood median split matches brute force and conserves the corpus") {
    val all = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pooled = all.map(_._2).sorted
    val med = pooled(((pooled.length + 1) / 2) - 1)
    val rows = run("q389_mood_median").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == all.length.toLong)
    val aTot = all.count(_._2 > med).toLong
    rows.foreach { r =>
      val src = r.getString(0)
      val xs = all.filter(_._1 == src).map(_._2)
      val (ab, at) = (xs.count(_ > med).toLong, xs.count(_ == med).toLong)
      assert(r.getAs[Long]("n_above") == ab, s"$src above")
      assert(r.getAs[Long]("n_at") == at)
      assert(r.getAs[Long]("n_below") == xs.length - ab - at)
      assert(r.getAs[Long]("expected_above_milli") ==
        xs.length.toLong * aTot * 1000 / all.length)
      val dev = BigInt(ab * all.length - xs.length * aTot)
      assert(BigInt(r.getAs[Long]("chi2_above_ppm")) ==
        dev * dev * 1000000 /
          (BigInt(xs.length) * aTot * all.length).max(BigInt(1)))
    }
  }

  test("q390 L-moments match a brute-force sorted mirror; tau3 is bounded") {
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    run("q390_l_moments").collect().foreach { r =>
      val src = r.getString(0)
      val xs = bySource(src)
      val n = xs.length.toLong
      val s0 = xs.map(BigInt(_)).sum
      val s1 = xs.zipWithIndex.map { case (x, i) => BigInt(i) * x }.sum
      val s2 = xs.zipWithIndex.map { case (x, i) =>
        BigInt(i) * (i - 1) * x
      }.sum
      val l2s = 2 * s1 - (n - 1) * s0
      val l3s = 6 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0
      assert(r.getAs[Long]("n_docs") == n)
      assert(BigInt(r.getAs[Long]("l1_milli")) == s0 * 1000 / n)
      assert(BigInt(r.getAs[Long]("l2_scaled")) == l2s, s"$src l2")
      assert(BigInt(r.getAs[Long]("l3_scaled")) == l3s, s"$src l3")
      assert(l2s >= 0, "lambda2 is non-negative")
      assert(BigInt(r.getAs[Long]("lcv_ppm")) ==
        l2s * 1000000 / ((n - 1) * s0).max(BigInt(1)))
      val den = (l2s * (n - 2)).max(BigInt(1))
      val want = if (l3s >= 0) l3s * 1000 / den else -((-l3s) * 1000 / den)
      assert(BigInt(r.getAs[Long]("t3_milli")) == want, s"$src t3")
      assert(math.abs(r.getAs[Long]("t3_milli")) <= 1000L, "|tau3| < 1 law")
    }
  }

  test("q391 ROUGE-1 anchor overlaps match a brute-force clipped-multiset mirror") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bySource = docs.groupBy(_._2)
    def bag(t: String) = t.split(" ", -1).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    run("q391_rouge1_anchors").collect().foreach { r =>
      val src = r.getString(0)
      val ds = bySource(src).sortBy(_._1)
      val anchor = ds(r.getAs[Long]("anchor_rank").toInt - 1)
      assert(r.getAs[Long]("anchor_doc_id") == anchor._1, s"$src anchor id")
      val aBag = bag(anchor._3)
      val others = ds.filterNot(_._1 == anchor._1)
      val sumOv = others.map { d =>
        bag(d._3).map { case (t, c) => math.min(c, aBag.getOrElse(t, 0L)) }.sum
      }.sum
      val sumLen = others.map(_._3.split(" ", -1).length.toLong).sum
      val aLen = anchor._3.split(" ", -1).length.toLong
      assert(r.getAs[Long]("anchor_len") == aLen)
      assert(r.getAs[Long]("n_docs") == others.length.toLong)
      assert(r.getAs[Long]("sum_overlap") == sumOv, s"$src overlap")
      assert(r.getAs[Long]("sum_doc_len") == sumLen)
      assert(r.getAs[Long]("prec_ppm") ==
        sumOv * 1000000L / math.max(sumLen, 1L))
      assert(r.getAs[Long]("recall_ppm") ==
        sumOv * 1000000L / math.max(others.length * aLen, 1L))
      assert(r.getAs[Long]("prec_ppm") <= 1000000L, "clip caps precision at 1")
    }
  }

  test("q392-q394 privacy triad matches a brute-force class mirror") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " + 100000) DIV 100000").as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // q392: l-diversity over (nation, segment) classes
    val byQi = rows.groupBy(x => (x._1, x._2))
    val ls = byQi.map { case (_, v) => (v.map(_._3).distinct.length.toLong,
      v.length.toLong, v.groupBy(_._3).values.map(_.length.toLong).max) }
    val got392 = run("q392_l_diversity").collect()
    assert(got392.map(_.getAs[Long]("n_classes")).sum == byQi.size.toLong)
    assert(got392.map(_.getAs[Long]("n_customers")).sum == rows.length.toLong)
    got392.foreach { r =>
      assert(r.getAs[Long]("min_l") == ls.map(_._1).min)
      assert(r.getAs[Long]("n_below_l3") ==
        ls.filter(_._1 < 3).map(_._2).sum)
      assert(r.getAs[Long]("n_rec22_fail") ==
        ls.count { case (_, k, r1) => r1 > 2 * (k - r1) }.toLong)
    }
    // q393: t-closeness TVD per class
    val gb = rows.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    val bigN = rows.length.toLong
    run("q393_t_closeness").collect().foreach { r =>
      val key = (r.getAs[Long]("c_nationkey"), r.getString(1))
      val cl = byQi(key)
      val k = cl.length.toLong
      val tvd = gb.map { case (band, g) =>
        math.abs(cl.count(_._3 == band) * bigN - g * k)
      }.sum
      assert(r.getAs[Long]("n_customers") == k)
      assert(r.getAs[Long]("tvd_scaled") == tvd, s"$key tvd")
      assert(r.getAs[Long]("tvd_milli") == tvd * 1000 / (2 * k * bigN))
      assert(r.getAs[Long]("tvd_milli") <= 1000L, "TVD <= 1 law")
    }
    // q394: the generalization ladder is monotone in both directions
    val lad = run("q394_generalization_ladder").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_classes"),
        r.getAs[Long]("min_k"), r.getAs[Long]("n_suppressed_k5"))).toMap
    assert(lad("l0_nation_segment_band")._1 ==
      rows.groupBy(x => (x._1, x._2, x._3)).size.toLong)
    assert(lad("l1_nation_segment")._1 == byQi.size.toLong)
    assert(lad("l2_nation")._1 == rows.map(_._1).distinct.length.toLong)
    assert(lad("l3_top") == ((1L, bigN, 0L)))
    val order = Seq("l0_nation_segment_band", "l1_nation_segment",
      "l2_nation", "l3_top").map(lad)
    assert(order.map(_._1) == order.map(_._1).sorted.reverse,
      "utility (class count) falls as attributes generalize away")
    assert(order.map(_._2) == order.map(_._2).sorted,
      "privacy floor (min_k) rises as attributes generalize away")
    assert(order.map(_._3) == order.map(_._3).sorted.reverse,
      "suppression cost falls as attributes generalize away")
  }

  test("q401 overlap depth matches a brute-force zone mirror and obeys its bounds") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long"),
        (col("user_id") % 256))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mi = ev.map(_._1).max
    def mirror(keyOf: ((Long, Long, Long)) => Long) = {
      val zones = ev.groupBy(e => e._1 * 32 / (mi + 1))
        .values.toSeq.map(es => (es.map(keyOf).min, es.map(keyOf).max))
      val vals = ev.map(keyOf).distinct
      val deps = vals.map(v => zones.count(z => v >= z._1 && v <= z._2).toLong)
      (zones.length.toLong, vals.length.toLong, deps.sum, deps.max)
    }
    val rows = run("q401_overlap_depth").collect()
      .map(r => r.getString(0) -> r).toMap
    Seq("a_event_day" -> mirror(_._2), "b_user_bucket" -> mirror(_._3))
      .foreach { case (k, (nf, nv, sdep, maxd)) =>
        val r = rows(k)
        assert(r.getAs[Long]("n_files") == nf, s"$k files")
        assert(r.getAs[Long]("n_values") == nv)
        assert(r.getAs[Long]("avg_depth_milli") == sdep * 1000 / nv, s"$k avg")
        assert(r.getAs[Long]("max_depth") == maxd)
        assert(r.getAs[Long]("avg_depth_milli") >= 1000L &&
          r.getAs[Long]("max_depth") <= nf, s"$k depth bounds")
      }
  }

  test("q402 Neyman allocation matches an isqrt mirror and conserves the budget") {
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val nsBy = bySource.map { case (src, xs) =>
      val v = xs.map(_._2)
      val (n, sx, sxx) = (v.length.toLong, v.sum, v.map(x => x * x).sum)
      src -> (n, n * sxx - sx * sx)
    }
    val tns = nsBy.values.map(v => math.sqrt(v._2.toDouble).toLong).sum
    val nn = nsBy.values.map(_._1).sum
    val rows = run("q402_neyman_allocation").collect()
    rows.foreach { r =>
      val src = r.getString(0)
      val (n, vn) = nsBy(src)
      val ns = math.sqrt(vn.toDouble).toLong
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("var_num") == vn, s"$src var_num")
      assert(r.getAs[Long]("n_times_sd") == ns, s"$src isqrt")
      assert(r.getAs[Long]("neyman_ppm") == ns * 1000000 / math.max(tns, 1L))
      assert(r.getAs[Long]("proportional_ppm") == n * 1000000 / nn)
    }
    assert(rows.map(_.getAs[Long]("n_alloc_of_1000")).sum <= 1000L,
      "floored allocations never exceed the budget")
  }

  test("q403 trigram motifs match a per-user walk mirror and conserve walks") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val walks = ev.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).map(t => (t(0), t(1), t(2)))
    }.toSeq
    val counts = walks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tt = walks.length.toLong
    val rows = run("q403_trigram_motifs").collect()
    assert(rows.map(_.getAs[Long]("n_walks")).sum == tt, "walk conservation")
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1), r.getString(2))
      assert(counts(key) == r.getAs[Long]("n_walks"), s"$key count")
      assert(r.getAs[Long]("share_ppm") == counts(key) * 1000000 / tt)
    }
    assert(rows.length == counts.size)
  }

  test("q404 weekly lag percentiles are exact rank selections; p50<=p90<=p95") {
    val lags = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("odate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(expr("datediff(ship, DATE '1970-01-05') div 7"),
        datediff(col("ship"), col("odate")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWk = lags.groupBy(_._1).map { case (w, v) => w -> v.map(_._2).sorted }
    val rows = run("q404_lag_percentiles").collect()
    assert(rows.length == byWk.size)
    rows.foreach { r =>
      val wk = r.getAs[Long]("week")
      val xs = byWk(wk)
      val n = xs.length.toLong
      def at(k: Long) = xs((k - 1).toInt)
      assert(r.getAs[Long]("n_lines") == n)
      assert(r.getAs[Long]("p50_days") == at((n + 1) / 2), s"wk $wk p50")
      assert(r.getAs[Long]("p90_days") == at((9 * n + 9) / 10), s"wk $wk p90")
      assert(r.getAs[Long]("p95_days") == at((19 * n + 19) / 20), s"wk $wk p95")
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p90_days") &&
        r.getAs[Long]("p90_days") <= r.getAs[Long]("p95_days"))
    }
  }

  test("q405 backlog matches a cumulative mirror and drains to zero") {
    val opened = Tables.orders(spark, sf)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long"))
      .collect().map(_.getLong(0))
    val closed = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(max(to_date(col("l_shipdate"))).as("c"))
      .select((year(col("c")) * 12 + month(col("c")) - 1).cast("long"))
      .collect().map(_.getLong(0))
    val rows = run("q405_order_backlog").collect()
    var (cumO, cumC) = (0L, 0L)
    rows.sortBy(_.getAs[Long]("month_idx")).foreach { r =>
      val m = r.getAs[Long]("month_idx")
      assert(r.getAs[Long]("n_opened") == opened.count(_ == m).toLong)
      assert(r.getAs[Long]("n_closed") == closed.count(_ == m).toLong)
      cumO += r.getAs[Long]("n_opened"); cumC += r.getAs[Long]("n_closed")
      assert(r.getAs[Long]("backlog") == cumO - cumC, s"month $m backlog")
      assert(r.getAs[Long]("backlog") >= 0, "an order never closes before opening")
    }
    // every order eventually ships (each order has lineitems), so the
    // final month's backlog is the orders with no lines, if any
    assert(rows.maxBy(_.getAs[Long]("month_idx")).getAs[Long]("backlog") ==
      opened.length - closed.length)
  }

  test("q406 lead-lag best matches a zero-filled argmax mirror") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val byType = daily.groupBy(_._1).map { case (t, v) =>
      val m = v.map(x => x._2 -> x._3).toMap
      val (d0, d1) = (m.keys.min, m.keys.max)
      t -> Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(dd => dd -> m.getOrElse(dd, 0L)).toMap
    }
    run("q406_leadlag_best").collect().foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (ga, gb) = (byType(ta), byType(tb))
      val cand = (-3 to 3).flatMap { k =>
        val pairs = ga.toSeq.flatMap { case (dd, xa) =>
          gb.get(dd.plusDays(k)).map(xb => (xa, xb))
        }
        if (pairs.isEmpty) None
        else {
          val m = pairs.length.toLong
          val sx = pairs.map(p => BigInt(p._1)).sum
          val sy = pairs.map(p => BigInt(p._2)).sum
          val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
          Some((k, m, m * sxy - sx * sy))
        }
      }
      val best = cand.minBy { case (k, _, cov) => (-cov.abs, k) }
      assert(r.getAs[Long]("best_lag_days") == best._1.toLong, s"($ta,$tb) lag")
      assert(r.getAs[Long]("n_pairs") == best._2)
      assert(BigInt(r.getAs[Long]("cov_num")) == best._3, s"($ta,$tb) cov")
      assert(BigInt(r.getAs[Long]("abs_cov")) == best._3.abs)
    }
  }

  test("q407 rendezvous routing: zero-move law for old shards, conservation") {
    val rows = run("q407_rendezvous_routing").collect()
    assert(rows.length == 9)
    val n = rows.map(_.getAs[Long]("n_at_9_shards")).sum
    assert(rows.map(_.getAs[Long]("n_at_8_shards")).sum == n,
      "both layouts route every document")
    rows.foreach { r =>
      val shard = r.getAs[Long]("shard")
      if (shard < 8)
        assert(r.getAs[Long]("moved_in") == 0L,
          s"rendezvous: old shard $shard must gain nothing")
      else {
        assert(r.getAs[Long]("n_at_8_shards") == 0L)
        assert(r.getAs[Long]("moved_in") == r.getAs[Long]("n_at_9_shards"),
          "every doc on the new shard moved there")
      }
      // each old shard keeps at least half its docs on a 9-way split
      if (shard < 8)
        assert(r.getAs[Long]("n_at_9_shards") * 2 >=
          r.getAs[Long]("n_at_8_shards"), s"shard $shard drained too far")
    }
    // the remap fraction is ~1/9 of the corpus (binomial tolerance: 3x)
    val moved = rows.map(_.getAs[Long]("moved_in")).sum
    assert(moved > 0 && moved * 3 <= n, s"moved $moved of $n")
  }

  test("q408 erasure impact matches direct cohort counts per table") {
    val rows = run("q408_erasure_impact").collect()
      .map(r => r.getString(0) -> r).toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val ords = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val doomedOrders = ords.filter(_._2 % 23 == 0).map(_._1).toSet
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).collect().map(_.getLong(0))
    val ev = Tables.events(spark, sf)
      .select(col("user_id")).collect().map(_.getLong(0))
    def check(nm: String, total: Long, del: Long) = {
      val r = rows(nm)
      assert(r.getAs[Long]("n_rows_total") == total, s"$nm total")
      assert(r.getAs[Long]("n_rows_deleted") == del, s"$nm deleted")
      assert(r.getAs[Long]("share_ppm") == del * 1000000 / total)
    }
    check("a_customer", cust.length.toLong, cust.count(_ % 23 == 0).toLong)
    check("b_orders", ords.length.toLong, doomedOrders.size.toLong)
    check("c_events", ev.length.toLong, ev.count(_ % 23 == 0).toLong)
    check("d_lineitem", li.length.toLong,
      li.count(doomedOrders.contains).toLong)
  }

  test("q409 postings census conserves terms and postings across buckets") {
    val dfs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).distinct
        .map(t => (t, r.getLong(0))))
      .groupBy(_._1).map { case (_, v) => v.length.toLong }
    val rows = run("q409_postings_census").collect()
    assert(rows.map(_.getAs[Long]("n_terms")).sum == dfs.size.toLong,
      "term conservation")
    assert(rows.map(_.getAs[Long]("n_postings")).sum == dfs.sum,
      "posting conservation")
    rows.foreach { r =>
      val lo = r.getAs[Long]("df_bucket_lo")
      val inB = dfs.filter(d => d >= lo && d < 2 * lo)
      assert(r.getAs[Long]("n_terms") == inB.size.toLong, s"bucket $lo terms")
      assert(r.getAs[Long]("n_postings") == inB.sum, s"bucket $lo postings")
    }
  }

  test("q410 trend screen agrees with q373's statistics and its own flags") {
    val mk = run("q373_mann_kendall").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("s_stat"),
        r.getAs[Long]("var18_num"))).toMap
    run("q410_trend_screen").collect().foreach { r =>
      val et = r.getString(0)
      val (s, v18) = mk(et)
      assert(r.getAs[Long]("s_stat") == s, s"$et s")
      assert(r.getAs[Long]("var18_num") == v18)
      assert(r.getAs[Long]("z2_milli") ==
        18 * s * s * 1000 / math.max(v18, 1L))
      assert(r.getAs[Boolean]("sig_2sigma") == (18 * s * s > 4 * v18), s"$et 2s")
      assert(r.getAs[Boolean]("sig_3sigma") == (18 * s * s > 9 * v18))
      // 3-sigma implies 2-sigma
      assert(!r.getAs[Boolean]("sig_3sigma") || r.getAs[Boolean]("sig_2sigma"))
    }
  }

  test("q411 time-split KS matches a brute-force two-half CDF mirror") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        (to_date(col("ts")) <= lit("2024-01-15")).as("first"),
        expr("CAST(floor(value) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    val byType = ev.groupBy(_._1)
    run("q411_timesplit_ks").collect().foreach { r =>
      val et = r.getString(0)
      val (as0, bs0) = byType(et).partition(_._2)
      val (as1, bs1) = (as0.map(_._3), bs0.map(_._3))
      val (na, nb) = (as1.length.toLong, bs1.length.toLong)
      val grid = (as1 ++ bs1).distinct
      val d = grid.map { v =>
        math.abs(as1.count(_ <= v) * nb - bs1.count(_ <= v) * na)
      }.max
      assert(r.getAs[Long]("n_first") == na && r.getAs[Long]("n_second") == nb)
      assert(r.getAs[Long]("d_scaled") == d, s"$et d_scaled")
      assert(r.getAs[Long]("ks_ppm") == d * 1000000 / math.max(na * nb, 1L))
      assert(r.getAs[Long]("ks_ppm") <= 1000000L, "D <= 1 law")
    }
  }

  test("q412 median CI matches sorted-rank selection and brackets the median") {
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    run("q412_median_ci").collect().foreach { r =>
      val src = r.getString(0)
      val xs = bySource(src)
      val n = xs.length.toLong
      val k = (n + 1) / 2
      val rad = math.sqrt(n.toDouble).toLong
      def at(j: Long) = xs((j - 1).toInt)
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("median_chars") == at(k), s"$src median")
      assert(r.getAs[Long]("ci_lo") == at(math.max(k - rad, 1L)), s"$src lo")
      assert(r.getAs[Long]("ci_hi") == at(math.min(k + rad, n)), s"$src hi")
      assert(r.getAs[Long]("ci_lo") <= r.getAs[Long]("median_chars") &&
        r.getAs[Long]("median_chars") <= r.getAs[Long]("ci_hi"))
      assert(r.getAs[Long]("ci_width") ==
        r.getAs[Long]("ci_hi") - r.getAs[Long]("ci_lo"))
    }
  }

  test("q413 encoding advisor matches an adjacent-id walk mirror") {
    val rows0 = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = rows0.map(x => x._1 -> x).toMap
    val pairs = rows0.flatMap(a => byId.get(a._1 + 1).map(b => (a, b)))
    val out = run("q413_encoding_advisor").collect()
      .map(r => r.getString(0) -> r).toMap
    def check(nm: String, vOf: ((Long, String, String)) => String) = {
      val r = out(nm)
      val chg = pairs.count(p => vOf(p._1) != vOf(p._2)).toLong
      assert(r.getAs[Long]("n_rows") == rows0.length.toLong)
      assert(r.getAs[Long]("n_distinct") ==
        rows0.map(vOf).distinct.length.toLong, s"$nm distinct")
      assert(r.getAs[Long]("n_adjacent_pairs") == pairs.length.toLong)
      assert(r.getAs[Long]("n_change_points") == chg, s"$nm changes")
      assert(r.getAs[Long]("rle_ratio_ppm") ==
        (chg + 1) * 1000000 / rows0.length)
    }
    check("a_source", _._2)
    check("b_lang", _._3)
  }

  test("q414 Kendall W matches a brute-force midrank mirror; rank sums conserve") {
    val g = Tables.events(spark, sf)
      .select(expr("(datediff(to_date(ts), DATE '1970-01-01') + 4) % 7"),
        col("event_type"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val judges = g.keys.map(_._1).toSeq.distinct
    val items = g.keys.map(_._2).toSeq.distinct
    val (m, k) = (judges.length.toLong, items.length.toLong)
    def r2(wd: Int, et: String) = {
      // DENSE grid: every judge ranks all k items; a type with zero
      // events that weekday ranks with count 0 (ties among the zeros)
      val mine = g.getOrElse((wd, et), 0L)
      val all = items.map(i => g.getOrElse((wd, i), 0L))
      2 * all.count(_ < mine) + all.count(_ == mine) + 1
    }
    val rsum2 = items.map(et => et ->
      judges.map(wd => r2(wd, et).toLong).sum).toMap
    val s4 = rsum2.values.map(r => (r - m * (k + 1)) * (r - m * (k + 1))).sum
    val tsum = judges.flatMap { wd =>
      items.map(i => g.getOrElse((wd, i), 0L))
        .groupBy(identity).values.map(t => {
          val tt = t.length.toLong; tt * tt * tt - tt
        })
    }.sum
    val rows = run("q414_kendall_w").collect()
    // per-judge doubled rank sums conserve to k(k+1) when all items fire
    rows.foreach { r =>
      val et = r.getString(0)
      assert(r.getAs[Long]("rank_sum_x2") == rsum2(et), s"$et rank sum")
      assert(r.getAs[Long]("m_judges") == m && r.getAs[Long]("k_items") == k)
      assert(r.getAs[Long]("s4_num") == s4)
      assert(r.getAs[Long]("tie_sum") == tsum)
      assert(r.getAs[Long]("w_ppm") ==
        12 * s4 * 1000000 / (4 * (m * m * (k * k * k - k) - m * tsum)))
      assert(r.getAs[Long]("w_ppm") <= 1000000L, "W <= 1 law")
    }
  }

  test("q415 winsorized mean matches a sorted-clamp mirror and tempers the tails") {
    val byPrio = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sorted }
    run("q415_winsorized_mean").collect().foreach { r =>
      val prio = r.getString(0)
      val xs = byPrio(prio)
      val n = xs.length.toLong
      val gg = n / 20
      val (lo, hi) = (xs(gg.toInt), xs((n - gg - 1).toInt))
      val wsum = xs.map(x => math.max(lo, math.min(hi, x))).sum
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Long]("g_clamped") == gg)
      assert(r.getAs[Long]("lo_clamp_cents") == lo, s"$prio lo")
      assert(r.getAs[Long]("hi_clamp_cents") == hi, s"$prio hi")
      assert(r.getAs[Long]("mean_cents") == xs.sum / n)
      assert(r.getAs[Long]("winsorized_mean_cents") == wsum / n, s"$prio wmean")
      assert(r.getAs[Long]("clamp_delta_cents") ==
        math.abs(xs.sum / n - wsum / n))
    }
  }

  test("q354 k-anonymity bands conserve customers and min_k is the true minimum") {
    val classes = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " + 100000) DIV 100000").as("b"))
      .groupBy("c_nationkey", "c_mktsegment", "b").count()
      .collect().map(_.getAs[Long]("count"))
    val rows = run("q354_k_anonymity").collect()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == classes.sum)
    assert(rows.map(_.getAs[Long]("n_classes")).sum == classes.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_k") == classes.min)
      assert(r.getAs[Long]("n_below_k5") == classes.filter(_ < 5).sum)
    }
  }
}
