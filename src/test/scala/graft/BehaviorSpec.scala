package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q71 funnel stages are monotone and ordering-constrained") {
    val r = SparkEntry.queries("q71_event_funnel")(spark, sf).collect()(0)
    val (users, viewed, clicked, purchased) =
      (r.getAs[Long]("n_users"), r.getAs[Long]("n_viewed"),
       r.getAs[Long]("n_clicked"), r.getAs[Long]("n_purchased"))
    assert(users >= viewed && viewed >= clicked && clicked >= purchased,
      s"funnel must narrow: $users/$viewed/$clicked/$purchased")
    assert(viewed > 0, "corpus should contain views")
    // The ordered funnel can never count MORE conversions than the
    // order-free upper bound (a user having all three event types).
    val ev = graft.model.Tables.events(spark, sf)
    val unordered = ev.filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy("user_id")
      .agg(countDistinct(col("event_type")).as("k"))
      .filter(col("k") === 3).count()
    assert(purchased <= unordered,
      s"ordered conversions $purchased exceed order-free bound $unordered")
  }

  test("q72 cohort day-zero activity equals cohort size") {
    val rows = SparkEntry.queries("q72_cohort_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    val dayZero = rows.filter(_.getAs[Long]("day_offset") == 0L)
    assert(dayZero.nonEmpty, "every cohort is active on its first day")
    dayZero.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"),
        s"cohort ${r.getAs[Long]("cohort")}: day-0 active != size")
      assert(r.getAs[Long]("retention_ppm") == 1000000L)
    }
    rows.foreach(r => assert(r.getAs[Long]("retention_ppm") <= 1000000L))
  }

  test("q73 vocabulary counts nest: hapax <= types <= tokens") {
    val rows = SparkEntry.queries("q73_vocab_growth")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, typ, hap) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"))
      assert(hap <= typ && typ <= tok, s"$hap <= $typ <= $tok violated")
      assert(r.getAs[Long]("ttr_ppm") <= 1000000L)
    }
  }

  test("q74 containment pairs respect the intersection bound and threshold") {
    val rows = SparkEntry.queries("q74_containment")(spark, sf).collect()
    assert(rows.nonEmpty, "corpus plants containment pairs")
    rows.foreach { r =>
      val (common, na, nb) = (r.getAs[Long]("common"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"))
      assert(common <= math.min(na, nb), "intersection exceeds a set size")
      assert(common * 2 >= math.min(na, nb), "below declared threshold")
      assert(r.getAs[Long]("cont_a_ppm") <= 1000000L)
      assert(r.getAs[Long]("cont_b_ppm") <= 1000000L)
    }
  }

  test("q76 split-leakage verdicts are consistent with split counts") {
    val rows = SparkEntry.queries("q76_split_leakage")(spark, sf).collect()
    assert(rows.nonEmpty, "corpus plants near-dup clusters")
    val splits = Set("train", "val", "test")
    rows.foreach { r =>
      val (members, nSplits) =
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_splits"))
      assert(members >= 2, "clusters come from edges, so >= 2 members")
      assert(nSplits >= 1 && nSplits <= math.min(members, 3L))
      assert(r.getAs[Boolean]("leaky") == (nSplits > 1))
      assert(splits.contains(r.getAs[String]("first_split")))
      assert(splits.contains(r.getAs[String]("cluster_split")))
    }
  }

  test("q77 rarity ratios bounded and df floor respected") {
    val rows = SparkEntry.queries("q77_rarity_score")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, sumDf, rare) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("sum_df"), r.getAs[Long]("n_rare"))
      assert(sumDf >= tok, "every token has df >= 1")
      assert(rare <= tok)
      assert(r.getAs[Long]("commonness_ppm") <= 1000000L)
      assert(r.getAs[Long]("rare_ppm") <= 1000000L)
    }
  }

  test("q78 RFM segments partition the purchasing users") {
    val rows = SparkEntry.queries("q78_rfm_segments")(spark, sf).collect()
    assert(rows.nonEmpty)
    val rSegs = Set("active", "warm", "cold")
    val fSegs = Set("power", "regular", "one_time")
    rows.foreach { r =>
      assert(rSegs.contains(r.getAs[String]("r_seg")))
      assert(fSegs.contains(r.getAs[String]("f_seg")))
      assert(r.getAs[Long]("n_purchases") >= r.getAs[Long]("n_users"))
    }
    val totalUsers = rows.map(_.getAs[Long]("n_users")).sum
    val expected = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(totalUsers == expected, "segments must partition purchasers")
  }

  test("q79 source-overlap Jaccard respects set-size bounds") {
    val rows = SparkEntry.queries("q79_source_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (common, na, nb) = (r.getAs[Long]("common"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"))
      assert(common <= math.min(na, nb))
      assert(r.getAs[Long]("jac_ppm") <= 1000000L)
    }
    // pairs are strictly upper-triangular: no self-pairs, no duplicates
    val keys = rows.map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")))
    assert(keys.forall { case (a, b) => a < b })
    assert(keys.distinct.length == keys.length)
  }

  test("q80 burst verdict matches the integer ratio rule") {
    val rows = SparkEntry.queries("q80_burst_detect")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, trail) = (r.getAs[Long]("cnt"), r.getAs[Long]("trail_sum"))
      assert(trail > 0, "a full 7-active-day trail implies positive counts")
      assert(r.getAs[Boolean]("burst") == (cnt * 7 > trail * 2))
      assert(r.getAs[Long]("ratio_ppm") == cnt * 7000000L / trail)
    }
  }

  test("q81 compaction keeps exactly one live record per key") {
    val rows = SparkEntry.queries("q81_changelog_compact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_live") <= r.getAs[Long]("n_log"))
      assert(r.getAs[Long]("compaction_ppm") <= 1000000L)
    }
    val live = rows.map(_.getAs[Long]("n_live")).sum
    val expected = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(live == expected, "one live record per user after compaction")
  }

  test("q82 lateness columns nest and the jitter produces real disorder") {
    val rows = SparkEntry.queries("q82_lateness_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, late, b1m, b1h) = (r.getAs[Long]("n_events"),
        r.getAs[Long]("n_late"), r.getAs[Long]("n_beyond_1min"),
        r.getAs[Long]("n_beyond_1h"))
      assert(b1h <= b1m && b1m <= late && late <= n)
      if (late > 0) assert(r.getAs[Long]("max_late_us") > 0)
      assert(r.getAs[Long]("sum_late_us") >= r.getAs[Long]("max_late_us"))
    }
    assert(rows.map(_.getAs[Long]("n_late")).sum > 0,
      "the deterministic arrival jitter must yield late events")
  }

  test("q83 Lloyd step conserves members and bounds the diagnostics") {
    val rows = SparkEntry.queries("q83_kmeans_step")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 1)
      assert(r.getAs[Double]("new_norm") >= 0.0)
      val shift = r.getAs[Double]("shift_cos")
      assert(shift >= -1.000001 && shift <= 1.000001)
    }
    // every vector lands in exactly one cell: cell member counts sum to
    // the corpus size
    val total = rows.map(_.getAs[Long]("n_members")).sum
    val expected = graft.model.Tables.embeddings(spark, sf).count()
    assert(total == expected, s"members $total != corpus $expected")
  }

  test("q84 importance sample tracks the score-mass target") {
    val rows = SparkEntry.queries("q84_importance_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_accepted") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("accept_ppm") <= 1000000L)
      assert(r.getAs[Long]("target_ppm") <= 1000000L)
    }
    // the hash-thresholded acceptance rate must track the mean score
    // (binomial noise at sf0.001's ~200 docs stays well inside 20 pp)
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val acc = rows.map(_.getAs[Long]("n_accepted")).sum
    val target = rows.map(_.getAs[Long]("sum_score")).sum / 1000000L
    assert(math.abs(acc - target) <= n / 5,
      s"accepted $acc should track score mass $target of $n docs")
  }

  test("q85 hard negatives oppose labels and bound the margin") {
    val rows = SparkEntry.queries("q85_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hard_neg_id") != r.getAs[Long]("q_id"))
      assert(r.getAs[Long]("hard_pos_id") != r.getAs[Long]("q_id"))
      val (nc, pc) = (r.getAs[Double]("neg_cos"), r.getAs[Double]("pos_cos"))
      assert(nc >= -1.000001 && nc <= 1.000001)
      assert(pc >= -1.000001 && pc <= 1.000001)
      assert(math.abs(r.getAs[Double]("margin") - (pc - nc)) < 2e-6)
    }
  }

  test("q75 winsorized mean sits inside the clamp bounds") {
    val rows = SparkEntry.queries("q75_winsorized_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      assert(lo <= hi, s"p05 bound $lo above p95 bound $hi")
      val meanPpm = r.getAs[Long]("wins_mean_ppm")
      assert(meanPpm >= lo * 1000000L - 1000000L && meanPpm <= hi * 1000000L,
        s"winsorized mean $meanPpm outside [$lo, $hi] scaled bounds")
      val clamped = r.getAs[Long]("n_clamped_lo") + r.getAs[Long]("n_clamped_hi")
      assert(clamped < r.getAs[Long]("n_docs"),
        "clamping must not touch every row")
    }
  }

  test("q86 sessions partition the events and respect the gap") {
    val sessions = SparkEntry.queries("q86_sessionize")(spark, sf).collect()
    val total = graft.model.Tables.events(spark, sf).count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === total,
      "every event must land in exactly one session")
    val gap = 43200000000L
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (u, ss) =>
      val ordered = ss.sortBy(_.getAs[Long]("session_seq"))
      ordered.foreach { r =>
        assert(r.getAs[Long]("duration_us") >= 0L)
        assert(r.getAs[Long]("n_events") >= 1L)
      }
      // consecutive sessions of one user are separated by MORE than the
      // gap (otherwise they would have merged)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > gap,
            s"user $u sessions closer than the gap")
        case _ =>
      }
    }
  }

  test("q87 SCD2 intervals chain half-open per user") {
    val rows = SparkEntry.queries("q87_scd2_intervals")(spark, sf).collect()
    val total = graft.model.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === total)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("run_seq"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") === b.getAs[Long]("valid_from_us"),
            s"user $u interval chain broken")
          assert(a.getAs[String]("event_type") !== b.getAs[String]("event_type"),
            s"user $u adjacent runs share a type (should have merged)")
        case _ =>
      }
      assert(ordered.last.getAs[Long]("valid_to_us") === -1L,
        s"user $u last run must be open-ended")
    }
  }

  test("q88 concurrency sweep is consistent with the session set") {
    val days = SparkEntry.queries("q88_concurrency_sweep")(spark, sf).collect()
    val nSessions = SparkEntry.queries("q86_sessionize")(spark, sf).count()
    assert(days.map(_.getAs[Long]("n_starts")).sum === nSessions,
      "every session must start on exactly one day")
    days.foreach { r =>
      // end-of-day state is one of the running values observed within
      // the day, so it can never exceed the day's peak
      assert(r.getAs[Long]("eod_open") <= r.getAs[Long]("peak_concurrent"),
        s"day ${r.getAs[Long]("day")} eod above peak")
      assert(r.getAs[Long]("peak_concurrent") >= 0L)
    }
    assert(days.last.getAs[Long]("eod_open") === 0L,
      "after the horizon every session has closed")
  }

  test("q93 overlap pairs respect cohort membership and interval bounds") {
    val rows = SparkEntry.queries("q93_session_overlap")(spark, sf).collect()
    assert(rows.nonEmpty, "cohorts should co-occur at least once")
    rows.foreach { r =>
      assert(r.getAs[Long]("user_a") % 10 === 0L)
      assert(r.getAs[Long]("user_b") % 10 === 5L)
      assert(r.getAs[Long]("n_overlaps") >= 1L)
      assert(r.getAs[Long]("sum_overlap_us") >= 0L)
    }
  }

  test("q89 skew audit invariants") {
    val r = SparkEntry.queries("q89_skew_audit")(spark, sf).collect()(0)
    val (keys, total, maxC, top10) =
      (r.getAs[Long]("n_keys"), r.getAs[Long]("total_rows"),
       r.getAs[Long]("max_cnt"), r.getAs[Long]("top10_cnt"))
    assert(maxC <= top10 && top10 <= total)
    assert(maxC * keys >= total, "max must be at least the mean")
    assert(r.getAs[Long]("max_avg_ratio_ppm") >= 1000000L,
      "max is >= the floored average, so the floor-ppm ratio is >= 1e6")
    assert(r.getAs[Long]("top10_share_ppm") <= 1000000L)
  }

  test("q132 asof join: left-preserving, at-or-before, and maximal match") {
    val rows = SparkEntry.queries("q132_asof_join")(spark, sf).collect()
    val ev = graft.model.Tables.events(spark, sf)
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong == nPurch,
      "ASOF LEFT must preserve every left row exactly once")
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getAs[Long]("asof_us") <= r.getAs[Long]("purchase_us"),
        "matched view must be at-or-before the purchase")
      assert(r.getAs[Long]("gap_us") ==
        r.getAs[Long]("purchase_us") - r.getAs[Long]("asof_us"))
    }
    // maximality: per user, recompute the latest view ≤ each purchase
    // from the raw fixture and demand exactly that timestamp
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted }
    rows.foreach { r =>
      val best = views.getOrElse(r.getAs[Long]("user_id"), Array.empty[Long])
        .filter(_ <= r.getAs[Long]("purchase_us")).lastOption
      val got = if (r.isNullAt(3)) None else Some(r.getAs[Long]("asof_us"))
      assert(got == best,
        s"purchase ${r.getAs[Long]("event_id")}: asof=$got, expected $best")
    }
  }

  test("q134 OLS slope lies within q125's pairwise-slope envelope") {
    // the least-squares slope is a (xi−xj)²-weighted mean of pairwise
    // slopes, so it must fall inside [min_slope, max_slope] of the
    // SAME series — a cross-estimator consistency check that also
    // pins the two queries to one dailyCounts definition.
    val ols = SparkEntry.queries("q134_ols_trend")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val ts = SparkEntry.queries("q125_theil_sen")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ols.keySet == ts.keySet, "both estimators cover the same series")
    ols.foreach { case (tpe, r) =>
      assert(r.getAs[Long]("den") > 0, s"$tpe: degenerate x variance")
      val slope = r.getAs[Long]("slope_ppm") / 1e6
      val (lo, hi) = (ts(tpe).getAs[Double]("min_slope"),
        ts(tpe).getAs[Double]("max_slope"))
      assert(slope >= lo - 1e-6 && slope <= hi + 1e-6,
        s"$tpe: OLS slope $slope outside pairwise envelope [$lo, $hi]")
    }
  }
}
