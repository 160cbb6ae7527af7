package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the q96–q107 batch (PII scrub, BPE encode,
  * declarative range join, basket mining, robust outliers, path mining,
  * confusion matrix, FK audit, curriculum buckets, snapshot-at-T,
  * effective tokens, table profile). Each test asserts the operator's
  * semantic contract on sf0.001 — the oracle hash-compare at the driver
  * covers value parity; these pin the invariants a refactor must keep.
  */
class LateOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q96 PII counts match planted ground truth and redaction is total") {
    val rows = SparkEntry.queries("q96_pii_redact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // Planted classes fire exactly on their doc_id residues.
      assert(r.getAs[Long]("n_email") == (if (id % 7 == 0) 1L else 0L),
        s"doc $id email count")
      assert(r.getAs[Long]("n_phone") == (if (id % 11 == 0) 1L else 0L),
        s"doc $id phone count")
      assert(r.getAs[Long]("n_id") == (if (id % 13 == 0) 1L else 0L),
        s"doc $id id count")
      assert(r.getAs[Long]("n_pii") ==
        r.getAs[Long]("n_email") + r.getAs[Long]("n_phone") + r.getAs[Long]("n_id"))
      // Redacted text retains no matchable PII shape.
      val red = r.getAs[String]("redacted")
      TextAnalysisPatterns.all.foreach { p =>
        assert(!p.matcher(red).find(), s"doc $id: residual PII in '$red'")
      }
    }
  }

  test("q97 BPE encoding never grows a document and ppm is bounded") {
    val rows = SparkEntry.queries("q97_bpe_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (before, after) =
        (r.getAs[Long]("n_sym_before"), r.getAs[Long]("n_sym_after"))
      assert(after <= before, "a merge can only shrink the symbol stream")
      // k merges remove at most k symbols per word occurrence pair; the
      // stream can never shrink below half (every merge fuses exactly 2).
      assert(after * 2 >= before, "BPE with pair merges halves at most")
      assert(r.getAs[Long]("compression_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_words") > 0)
    }
  }

  test("q98 declarative range join respects the interval bounds") {
    val rows = SparkEntry.queries("q98_rangejoin_declarative")(spark, sf).collect()
    assert(rows.nonEmpty, "intervals should catch shipped lineitems")
    val iv = graft.model.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 300 === 0)
      .select(col("o_orderkey").as("iv_id"),
        expr("unix_date(CAST(o_orderdate AS DATE))").cast("long").as("s"))
      .withColumn("e", col("s") + 21)
      .collect().map(r => r.getAs[Long]("iv_id") ->
        (r.getAs[Long]("s"), r.getAs[Long]("e"))).toMap
    rows.foreach { r =>
      val (s, e) = iv(r.getAs[Long]("iv_id"))
      assert(r.getAs[Long]("min_day") >= s && r.getAs[Long]("max_day") <= e,
        s"points outside [${s},${e}] for iv ${r.getAs[Long]("iv_id")}")
      assert(r.getAs[Long]("n_pts") > 0)
    }
  }

  test("q99 basket pairs are ordered, bounded by item supports") {
    val rows = SparkEntry.queries("q99_basket_pairs")(spark, sf).collect()
    assert(rows.nonEmpty, "orders share parts")
    rows.foreach { r =>
      assert(r.getAs[Long]("p_a") < r.getAs[Long]("p_b"), "canonical pair order")
      val s = r.getAs[Long]("support")
      assert(s <= math.min(r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b")),
        "pair support exceeds an item support")
      assert(r.getAs[Long]("conf_a_ppm") <= 1000000L)
      assert(r.getAs[Long]("supp_ppm") <= 1000000L)
    }
    val sup = rows.map(_.getAs[Long]("support"))
    assert(sup.sameElements(sup.sortBy(-_)), "top-k must be support-descending")
  }

  test("q100 Tukey fences bracket the quartiles and outliers are counted once") {
    val rows = SparkEntry.queries("q100_length_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, q1, q3, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("q1"),
        r.getAs[Double]("q3"), r.getAs[Double]("hi"))
      assert(lo <= q1 && q1 <= q3 && q3 <= hi, s"fence order $lo/$q1/$q3/$hi")
      assert(r.getAs[Long]("n_out_lo") + r.getAs[Long]("n_out_hi") <=
        r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("out_ppm") <= 1000000L)
    }
  }

  test("q101 event paths are 3-step and counts are descending") {
    val rows = SparkEntry.queries("q101_event_paths")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[String]("path").split(">").length == 3, "3-event path"))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sortBy(-_)), "top-k must be count-descending")
    // Total triple count over all paths is bounded by the corpus triple count.
    val ev = graft.model.Tables.events(spark, sf)
    val bound = ev.groupBy("user_id").count()
      .agg(sum(greatest(col("count") - 2, lit(0L)))).collect()(0).getLong(0)
    assert(ns.sum <= bound, s"paths ${ns.sum} exceed triple bound $bound")
  }

  test("q102 confusion rows are complete and ppm shares sum to ~1e6 per lang") {
    val rows = SparkEntry.queries("q102_langid_confusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[String]("lang") == r.getAs[String]("pred_lang")))
      assert(r.getAs[Long]("row_ppm") <= 1000000L)
    }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val ppm = rs.map(_.getAs[Long]("row_ppm")).sum
      // floor-ppm loses < 1 ppm per cell
      assert(ppm <= 1000000L && ppm > 1000000L - rs.length,
        s"$lang row shares sum to $ppm")
    }
  }

  test("q103 FK audit counts nest and cover the declared relations") {
    val rows = SparkEntry.queries("q103_fk_audit")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan") <= r.getAs[Long]("n_child"))
      assert(r.getAs[Long]("n_childless") <= r.getAs[Long]("n_parent"))
      assert(r.getAs[Long]("orphan_ppm") <= 1000000L)
    }
  }

  test("q104 curriculum buckets are contiguous, ordered, and exhaustive per lang") {
    val rows = SparkEntry.queries("q104_curriculum_buckets")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byBucket = rs.sortBy(_.getAs[Long]("bucket"))
      assert(byBucket.map(_.getAs[Long]("bucket")).toSeq ==
        (1L to byBucket.length.toLong), s"$lang buckets not 1..k")
      byBucket.foreach(r =>
        assert(r.getAs[Long]("min_score") <= r.getAs[Long]("max_score")))
      byBucket.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("max_score") <= b.getAs[Long]("min_score"),
            s"$lang: bucket score ranges out of order")
        case _ =>
      }
      // NTILE(5) spreads docs within ±1 of each other.
      val sizes = byBucket.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$lang ntile balance: ${sizes.toSeq}")
    }
  }

  test("q105 snapshot state is the pre-T prefix per user") {
    val rows = SparkEntry.queries("q105_snapshot_at")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val Array(mn, mx) = ev.agg(min("us"), max("us")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val tMid = (mn + mx) / 2
    rows.foreach { r =>
      assert(r.getAs[Long]("last_us") <= tMid, "state from after the snapshot")
      assert(r.getAs[Long]("n_before") >= 1L)
    }
    // Exactly the users with >= 1 pre-T event appear.
    val expected = ev.filter(col("us") <= tMid)
      .select("user_id").distinct().count()
    assert(rows.length == expected, s"${rows.length} users vs $expected pre-T")
  }

  test("q106 effective tokens never exceed raw and survivors keep everything") {
    val rows = SparkEntry.queries("q106_effective_tokens")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("eff_tokens") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("eff_ppm") <= 1000000L)
      // No dups at all would make eff == raw; with dups eff must drop.
      if (r.getAs[Long]("n_dup_docs") == 0L)
        assert(r.getAs[Long]("eff_tokens") == r.getAs[Long]("n_tokens"))
      else
        assert(r.getAs[Long]("eff_tokens") < r.getAs[Long]("n_tokens"))
    }
  }

  test("q108 water level fills the budget within floor loss and caps monotonically") {
    val rows = SparkEntry.queries("q108_token_budget")(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val cap = rows.head.getAs[Long]("cap")
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(budget == total / 2, "budget is half the corpus")
    rows.foreach { r =>
      val (t, a) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("allocated"))
      assert(a == math.min(t, cap), "allocation is exactly min(t, cap)")
      assert(r.getAs[Long]("alloc_ppm") <= 1000000L)
    }
    val spent = rows.map(_.getAs[Long]("allocated")).sum
    assert(spent <= budget, s"over budget: $spent > $budget")
    // Water-filling wastes less than one token per source (integer floor).
    assert(budget - spent < rows.length.toLong,
      s"under-filled by ${budget - spent} with ${rows.length} sources")
  }

  test("q109 bigram lift respects support bounds and ranking order") {
    val rows = SparkEntry.queries("q109_bigram_lift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xy, x, y) = (r.getAs[Long]("n_xy"), r.getAs[Long]("n_x"), r.getAs[Long]("n_y"))
      assert(xy >= 5, "min-support filter")
      assert(xy <= math.min(x, y), "pair count exceeds a unigram count")
      assert(r.getAs[Long]("lift_ppm") >= 0)
    }
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.sameElements(lifts.sortBy(-_)), "top-k must be lift-descending")
  }

  test("q110 spectrum bands partition the shingle types and mass adds up") {
    val rows = SparkEntry.queries("q110_freq_spectrum")(spark, sf).collect()
    assert(rows.length >= 2, "spectrum should have multiple bands")
    rows.foreach { r =>
      val f = r.getAs[Long]("f_bucket")
      assert(f >= 1 && f <= 11)
      if (f <= 10)
        assert(r.getAs[Long]("n_tokens") == f * r.getAs[Long]("n_types"),
          s"band $f: occurrences must be f x types")
      else
        assert(r.getAs[Long]("n_tokens") > 10 * r.getAs[Long]("n_types"))
    }
    val typePpm = rows.map(_.getAs[Long]("type_ppm")).sum
    assert(typePpm <= 1000000L && typePpm > 1000000L - rows.length,
      s"type shares sum to $typePpm")
  }

  test("q111 rule counts nest and the corpus is fully attributed") {
    val rows = SparkEntry.queries("q111_quality_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      Seq("n_len", "n_wordlen", "n_rep", "n_stop").foreach(c =>
        assert(r.getAs[Long](c) <= n, s"$c exceeds n_docs"))
      val ruleMin = Seq("n_len", "n_wordlen", "n_rep", "n_stop")
        .map(r.getAs[Long](_)).min
      assert(r.getAs[Long]("n_all") <= ruleMin, "conjunction above a conjunct")
      assert(r.getAs[Long]("pass_ppm") <= 1000000L)
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val allPass = rows.map(_.getAs[Long]("n_all")).sum
    assert(total == graft.model.Tables.documents(spark, sf).count(),
      "every document is audited")
    assert(allPass > 0 && allPass < total, "rules must discriminate")
  }

  test("q112 moments cover every dimension with consistent bounds") {
    val rows = SparkEntry.queries("q112_embedding_moments")(spark, sf).collect()
    assert(rows.length == 64, "one row per embedding dimension")
    assert(rows.map(_.getAs[Long]("dim")).toSeq == (0L until 64L))
    val n = graft.model.Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == n)
      assert(r.getAs[Long]("min_q6") <= r.getAs[Long]("max_q6"))
      val mean = r.getAs[Double]("mean")
      assert(mean * 1000000 >= r.getAs[Long]("min_q6") - 1 &&
        mean * 1000000 <= r.getAs[Long]("max_q6") + 1,
        "mean outside [min, max]")
      assert(r.getAs[Double]("var_m2") >= 0.0, "variance numerator is a square sum")
    }
  }

  test("q113 KS distance is a bounded ppm and zero-drift needs identical ECDFs") {
    val rows = SparkEntry.queries("q113_ks_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.model.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("ks_ppm") >= 0 && r.getAs[Long]("ks_ppm") <= 1000000L)
      assert(r.getAs[Long]("at_bin") >= 0)
    }
    assert(rows.exists(_.getAs[Long]("ks_ppm") > 0),
      "at least one source should deviate from the pooled ECDF")
  }

  test("q114 transition rows normalize to ~1e6 per from-state") {
    val rows = SparkEntry.queries("q114_markov_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val ppm = rs.map(_.getAs[Long]("row_ppm")).sum
      assert(ppm <= 1000000L && ppm > 1000000L - rs.length,
        s"$ft row shares sum to $ppm")
    }
    // Total transitions = events minus one per active user.
    val ev = graft.model.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("q115 triangle census satisfies the wedge bound") {
    val r = SparkEntry.queries("q115_dup_triangles")(spark, sf).collect()(0)
    val (nodes, edges, wedges, tris) = (r.getAs[Long]("n_nodes"),
      r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"))
    assert(nodes >= 2 && edges >= 1, "near-dup graph should be non-empty")
    assert(edges <= nodes * (nodes - 1) / 2)
    assert(3 * tris <= wedges, "each triangle closes exactly 3 wedges")
    assert(r.getAs[Long]("closure_ppm") <= 1000000L)
  }

  test("q116 fused picks rank by RRF and ranks stay within the candidate set") {
    val rows = SparkEntry.queries("q116_rrf_fusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    val candPerLang = graft.model.Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0).groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length.toLong), s"$lang fused ranks not 1..k")
      val rrfs = byRank.map(_.getAs[Long]("rrf"))
      assert(rrfs.sameElements(rrfs.sortBy(-_)), s"$lang not RRF-descending")
      byRank.foreach { r =>
        assert(r.getAs[Long]("r1") >= 1 && r.getAs[Long]("r1") <= candPerLang(lang))
        assert(r.getAs[Long]("r2") >= 1 && r.getAs[Long]("r2") <= candPerLang(lang))
        // floor(1e6/(60+r)) per signal, so the fused score is bounded by
        // twice the best single-signal score
        assert(r.getAs[Long]("rrf") <= 2 * (1000000L / 61L))
      }
    }
  }

  test("q117 Gini impurity is bounded by the label-count maximum") {
    val rows = SparkEntry.queries("q117_cell_label_gini")(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (n, k, g) = (r.getAs[Long]("n_members"), r.getAs[Long]("n_labels"),
        r.getAs[Long]("gini_ppm"))
      total += n
      assert(k >= 1 && k <= 10, "labels are 0..9")
      assert(g >= 0 && g <= 1000000L)
      if (k == 1) assert(g <= rows.length, s"pure cell must have ~zero Gini, got $g")
      // Gini of k classes is at most 1 - 1/k (+ floor slack from ppm shares).
      assert(g <= 1000000L - 1000000L / k + 2 * k,
        s"cell ${r.getAs[Long]("cell")}: gini $g above the $k-class bound")
    }
    assert(total == graft.model.Tables.embeddings(spark, sf).count(),
      "every vector lands in exactly one cell")
  }

  test("q136 cluster-aware split is total and matches an independent recomputation") {
    // the documented rule, recomputed test-side from first principles
    // (JVM MessageDigest, not Spark SQL): split = hash("split:"+label)
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      val b = java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) % 10
      if (b <= 7) "train" else if (b == 8) "val" else "test"
    }
    val labels = graft.ops.Dedup.connectedComponents(
      graft.ops.Dedup.dupEdges(spark, sf)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(labels.nonEmpty, "corpus plants dup clusters")
    val docs = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong)
    // full per-doc assignment: cluster = label (members) or own id
    val assigned = docs.map { case (id, nt) =>
      val cluster = labels.getOrElse(id, id)
      (splitOf(cluster), cluster, nt)
    }
    val expect = assigned.groupBy(_._1).map { case (s, rs) =>
      s -> ((rs.length.toLong, rs.map(_._2).distinct.length.toLong,
        rs.map(_._3).sum))
    }
    val got = SparkEntry.queries("q136_cluster_split")(spark, sf).collect()
      .map(r => r.getAs[String]("split") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters"),
          r.getAs[Long]("n_tokens")))).toMap
    assert(got == expect, s"rollup mismatch:\n got=$got\n exp=$expect")
    assert(got.values.map(_._1).sum == docs.length.toLong,
      "every document must receive exactly one split")
  }

  test("q137 BM25 rankings are dense, monotone, and score-consistent") {
    val rows = SparkEntry.queries("q137_bm25_retrieval")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byTerm = rows.groupBy(_.getAs[String]("tok"))
    assert(byTerm.size == 3, "exactly three self-derived query terms")
    byTerm.foreach { case (tok, rs) =>
      val ranked = rs.sortBy(_.getAs[Long]("rk"))
      assert(ranked.map(_.getAs[Long]("rk")).toSeq ==
        (1L to ranked.length).toSeq, s"$tok: ranks must be dense from 1")
      val scores = ranked.map(_.getAs[Long]("score_micro")).toSeq
      assert(scores == scores.sorted.reverse,
        s"$tok: scores must be non-increasing down the ranking")
      rs.foreach { r =>
        assert(r.getAs[Long]("score_micro") > 0)
        assert(r.getAs[Long]("tf") <= r.getAs[Long]("dl"),
          "a term cannot occur more often than the doc has tokens")
      }
    }
  }

  test("q138 aggregate-state merge is associative across finer splits") {
    // the 2-way parity split is the declared query; a 3-way (mod 3)
    // split re-merged must give the identical rollup — associativity
    // is what lets a real pipeline merge base+batch+batch without
    // caring how history was partitioned
    import graft.model.Tables
    def partial(m: Int, r: Int) = Tables.documents(spark, sf)
      .filter(col("doc_id") % m === r)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"),
        min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"),
        collect_set(col("lang")).as("langs"))
    def merge(parts: Seq[org.apache.spark.sql.DataFrame]) =
      parts.reduce(_ unionByName _)
        .groupBy("source")
        .agg(sum(col("n")).cast("long").as("n_docs"),
          sum(col("sc")).cast("long").as("sum_chars"),
          min(col("mn")).cast("long").as("min_chars"),
          max(col("mx")).cast("long").as("max_chars"),
          size(array_distinct(flatten(collect_list(col("langs")))))
            .cast("long").as("n_langs"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
    val threeWay = merge((0 until 3).map(partial(3, _)))
    val declared = SparkEntry.queries("q138_incremental_agg")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"),
         r.getAs[Long]("min_chars"), r.getAs[Long]("max_chars"),
         r.getAs[Long]("n_langs"))).toMap
    assert(threeWay == declared,
      "3-way split merge must equal the declared 2-way merge")
  }

  test("q139 MERGE equals an independent full-changelog recompute; tombstones delete") {
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    // JVM-side recompute: latest event per user, error = deleted
    val expect = ev.groupBy(_._1).flatMap { case (u, es) =>
      val last = es.maxBy(e => (e._5, e._2))
      if (last._3 == "error") None
      else Some(u -> ((last._2, last._5, last._4)))
    }.toMap
    val got = SparkEntry.queries("q139_merge_upsert")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("last_event_id"), r.getAs[Long]("last_us"),
          r.getAs[Double]("last_value")))).toMap
    assert(got == expect, "merged state must equal the full rebuild")
    val allUsers = ev.map(_._1).distinct.length
    assert(got.size < allUsers,
      "fixture plants error tombstones — some user must be deleted")
  }

  test("q118 prefix filter is COMPLETE: equals the exhaustive pairwise join") {
    val got = SparkEntry.queries("q118_prefix_filter_join")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("common"), r.getAs[Long]("jac_ppm"))).toSet
    assert(got.nonEmpty, "corpus plants near-dup pairs")
    // Brute force over every document pair — the oracle the filter must
    // never lose a pair against (prefix-filter completeness theorem).
    val sets = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .withColumn("sh", array_distinct(
        graft.ops.TextAnalysis.shingleExpr("t", 3)))
      .select("doc_id", "sh").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[String](1).toSet).sortBy(_._1)
    val brute = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (ida, sa) = sets(i); (idb, sb) = sets(j)
      common = (sa & sb).size
      if 7L * common >= 3L * (sa.size + sb.size)
    } yield (ida, idb, common.toLong,
      common.toLong * 1000000L / (sa.size + sb.size - common))).toSet
    assert(got == brute,
      s"filtered join diverges from exhaustive: missing ${brute -- got}, extra ${got -- brute}")
  }

  test("q119 life table: at-risk decrements by exactly the ended count") {
    val rows = SparkEntry.queries("q119_hazard_table")(spark, sf).collect()
      .sortBy(_.getAs[Long]("hour_offset"))
    assert(rows.nonEmpty)
    val users = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_end")).sum == users,
      "every user ends at exactly one offset")
    assert(rows.head.getAs[Long]("n_at_risk") == users,
      "the first offset has the full population at risk")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_end") <= r.getAs[Long]("n_at_risk"))
      assert(r.getAs[Long]("hazard_ppm") <= 1000000L)
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        // Risk set shrinks by exactly those who ended at or after a's
        // offset but before b's (only a's row in this table).
        assert(b.getAs[Long]("n_at_risk") ==
          a.getAs[Long]("n_at_risk") - a.getAs[Long]("n_end"),
          s"at-risk chain broken at offset ${b.getAs[Long]("hour_offset")}")
      case _ =>
    }
    assert(rows.last.getAs[Long]("n_at_risk") == rows.last.getAs[Long]("n_end"),
      "the final risk set all ends at the maximum lifetime")
  }

  test("q120 conversion latency is ordered and consistent with the q71 funnel") {
    val r = SparkEntry.queries("q120_conversion_latency")(spark, sf).collect()(0)
    val funnel = SparkEntry.queries("q71_event_funnel")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_converted") == funnel.getAs[Long]("n_purchased"),
      "latency rows are exactly the funnel's converters")
    val (mn, mean, mx) = (r.getAs[Long]("min_us"), r.getAs[Long]("mean_us"),
      r.getAs[Long]("max_us"))
    assert(mn >= 0, "a purchase can never precede the first view")
    assert(mn <= mean && mean <= mx)
    assert(r.getAs[Double]("p50_s") * 1e6 >= mn - 1 &&
      r.getAs[Double]("p50_s") * 1e6 <= mx + 1)
    assert(r.getAs[Double]("p50_s") <= r.getAs[Double]("p90_s"))
    assert(r.getAs[Long]("n_converted") * mean <=
      funnel.getAs[Long]("sum_convert_us"),
      "floor-mean times count cannot exceed the exact sum")
  }

  test("q121 salted join is result-identical to the plain join") {
    val got = SparkEntry.queries("q121_salted_join")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_users"), r.getAs[Long]("sum_upc"),
        r.getAs[Long]("n_no_purchase"))).toSet
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
    val profile = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("upc"))
    val plain = ev.join(profile, Seq("user_id"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("user_id")).cast("long").as("n_users"),
        sum(coalesce(col("upc"), lit(0L))).cast("long").as("sum_upc"),
        count(when(col("upc").isNull, 1)).cast("long").as("n_no_purchase"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_users"), r.getAs[Long]("sum_upc"),
        r.getAs[Long]("n_no_purchase"))).toSet
    assert(got == plain, "salting must be result-invisible")
  }

  test("q122 attribution partitions every purchase and shares close") {
    val rows = SparkEntry.queries("q122_last_touch")(spark, sf).collect()
    assert(rows.nonEmpty)
    val purchases = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases,
      "every purchase is attributed exactly once")
    val ppm = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(ppm <= 1000000L && ppm > 1000000L - rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_purchases"))
      assert(r.getAs[String]("attributed") != "purchase",
        "a purchase can never be its own touch")
    }
  }

  test("q123 novelty is total for the first bucket's first doc and declines overall") {
    val rows = SparkEntry.queries("q123_novelty_curve")(spark, sf).collect()
      .sortBy(_.getAs[Long]("ingest_bucket"))
    assert(rows.length >= 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("novelty_ppm") <= 1000000L)
    }
    // The earliest bucket contains the corpus's very first document,
    // whose shingles are all novel by construction — so it must have
    // strictly positive novelty; and the overall trend must not rise
    // monotonically (later ingestion repeats earlier content).
    assert(rows.head.getAs[Long]("n_novel") > 0)
    assert(rows.last.getAs[Long]("novelty_ppm") <=
      rows.head.getAs[Long]("novelty_ppm"),
      "novelty should not grow from first to last bucket")
  }

  test("q124 grouping sets produce exactly the three declared levels") {
    val rows = SparkEntry.queries("q124_grouping_sets")(spark, sf).collect()
    val total = graft.model.Tables.orders(spark, sf).count()
    val byGrp = rows.groupBy(_.getAs[Long]("grp_id"))
    assert(byGrp.keySet == Set(0L, 1L, 3L),
      "detail, status-subtotal, and grand-total levels only (no cube extras)")
    // Each level partitions the full order population.
    byGrp.values.foreach(rs =>
      assert(rs.map(_.getAs[Long]("n_orders")).sum == total))
    val grand = byGrp(3L)
    assert(grand.length == 1 &&
      grand.head.getAs[String]("status") == "ALL" &&
      grand.head.getAs[String]("priority") == "ALL")
    byGrp(1L).foreach(r => assert(r.getAs[String]("priority") == "ALL" &&
      r.getAs[String]("status") != "ALL"))
  }

  test("q125 Theil-Sen slope lies within the slope envelope and pairs count right") {
    val rows = SparkEntry.queries("q125_theil_sen")(spark, sf).collect()
    assert(rows.nonEmpty)
    val days = graft.model.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)").as("day"))
      .distinct().groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val n = days(et)
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2,
        s"$et: pair count must be C(activeDays, 2)")
      val (lo, med, hi) = (r.getAs[Double]("min_slope"),
        r.getAs[Double]("ts_slope"), r.getAs[Double]("max_slope"))
      assert(lo <= med && med <= hi, s"$et: median outside envelope")
    }
  }

  test("q126 trade rows pair the two declared blocs in both directions") {
    val rows = SparkEntry.queries("q126_nation_trade")(spark, sf).collect()
    assert(rows.nonEmpty, "the bloc pair should trade")
    rows.foreach { r =>
      val pair = Set(r.getAs[String]("cust_bloc"), r.getAs[String]("supp_bloc"))
      assert(pair == Set("BLOC_1", "BLOC_2"),
        "only the declared bidirectional pair appears")
      assert(r.getAs[Long]("n_items") > 0)
      assert(r.getAs[Double]("revenue") > 0.0)
    }
    // Full ordering: (cust, supp, year) strictly increasing.
    val keys = rows.map(r => (r.getAs[String]("cust_bloc"),
      r.getAs[String]("supp_bloc"), r.getAs[Long]("l_year")))
    assert(keys.toSeq == keys.toSeq.sorted)
  }

  test("q127 important stock clears the scale-free threshold and is sorted") {
    val rows = SparkEntry.queries("q127_important_stock")(spark, sf).collect()
    assert(rows.nonEmpty, "the 1.3x-mean threshold must select parts")
    val total = rows.head.getAs[Double]("total_value")
    val vals = rows.map(_.getAs[Double]("stock_value"))
    assert(vals.sameElements(vals.sortBy(-_)), "top-k must be value-descending")
    rows.foreach(r => assert(r.getAs[Double]("total_value") == total))
    // Every selected part genuinely exceeds 1.3x the mean share.
    val nParts = graft.model.Tables.lineitem(spark, sf)
      .select("l_partkey").distinct().count()
    vals.foreach(v => assert(v * nParts * 10 > total * 13,
      s"$v does not clear 1.3x mean of ${total / nParts}"))
  }

  test("q128 MAD is bounded by the max deviation and sigma scales it") {
    val rows = SparkEntry.queries("q128_mad_scale")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mad, sigma, maxDev) = (r.getAs[Double]("mad"),
        r.getAs[Double]("mad_sigma"), r.getAs[Double]("max_dev"))
      assert(mad >= 0 && mad <= maxDev, "MAD is a median of deviations")
      assert(math.abs(sigma - mad * 1.4826) < 1e-3,
        "sigma is the consistency-scaled MAD")
      assert(r.getAs[Double]("median_chars") > 0)
      // At least half the documents lie within one MAD of the median
      // (by definition of the median of deviations).
      val lang = r.getAs[String]("lang")
      val docs = graft.model.Tables.documents(spark, sf)
        .filter(col("lang") === lang)
      val within = docs.filter(
        abs(col("n_chars") - r.getAs[Double]("median_chars")) <= mad).count()
      assert(within * 2 >= r.getAs[Long]("n_docs"),
        s"$lang: only $within of ${r.getAs[Long]("n_docs")} within one MAD")
    }
  }

  test("q129 time-weighted average lies inside the value range per user") {
    val rows = SparkEntry.queries("q129_time_weighted_avg")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bounds = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") % 7 === 0)
      .groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Long]("n"))).toMap
    rows.foreach { r =>
      val (lo, hi, n) = bounds(r.getAs[Long]("user_id"))
      val twa = r.getAs[Double]("twa_value")
      // A weighted mean of held values cannot leave the value envelope
      // (0.01 slack: source values are 2-decimal, twa rounds to 6).
      assert(twa >= lo - 0.01 && twa <= hi + 0.01,
        s"user ${r.getAs[Long]("user_id")}: twa $twa outside [$lo, $hi]")
      assert(r.getAs[Long]("n_holds") == n - 1,
        "every event except the last opens one hold")
      assert(r.getAs[Long]("held_us") > 0)
    }
  }

  test("q130 scorecard ratios are bounded and cover every source") {
    val rows = SparkEntry.queries("q130_source_scorecard")(spark, sf).collect()
    val sources = graft.model.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == sources, "one scorecard row per source")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("mean_chars") > 0)
      assert(r.getAs[Long]("boiler_ppm") <= 1000000L)
      assert(r.getAs[Long]("stop_ppm") <= 1000000L)
    }
  }

  test("q140 blocked SNM is COMPLETE within blocks: equals the brute-force window pairing") {
    // JVM recompute of the operator's contract: per 4-char-prefix
    // block, sort by (40-char sig, doc_id), pair every row with its ≤w
    // successors. The distributed block-bucket join must produce
    // EXACTLY this set — no pair lost at a windowBucket boundary, none
    // duplicated by the two-bucket probe.
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val w = graft.ops.Dedup.SnmWindow
    val expect = docs.toSeq.map { case (id, t) => (id, t.take(40), t.take(4)) }
      .groupBy(_._3).values.flatMap { block =>
        val sorted = block.sortBy { case (id, sig, _) => (sig, id) }
        sorted.zipWithIndex.flatMap { case ((ida, siga, _), i) =>
          sorted.slice(i + 1, i + 1 + w).zipWithIndex.map {
            case ((idb, sigb, _), j) =>
              (ida, idb, (j + 1).toLong, if (siga == sigb) 1L else 0L)
          }
        }
      }.toSet
    val got = SparkEntry.queries("q140_snm_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("gap"), r.getAs[Long]("same_sig"))).toSet
    assert(got == expect, s"SNM pairs drifted: ${(got diff expect).take(3)} " +
      s"extra, ${(expect diff got).take(3)} missing")
    graft.ops.Caches.clear()
  }

  test("q141 zone maps: both layouts cover all rows; z-order prunes the user dimension") {
    val rows: Map[String, (Long, Long, Long, Long)] =
      SparkEntry.queries("q141_zorder_zonemap")(spark, sf).collect()
        .map(r => r.getAs[String]("layout") ->
          ((r.getAs[Long]("n_files"), r.getAs[Long]("n_rows"),
            r.getAs[Long]("files_user_query"), r.getAs[Long]("files_day_query"))))
        .toMap
    val total = graft.model.Tables.events(spark, sf).count()
    val (zf, zr, zu, zd) = rows("zorder")
    val (bf, br, bu, bd) = rows("by_day")
    assert(zr == total && br == total, "every row lands in exactly one file")
    // a day-sorted layout stores user 7 in (almost) every file — its
    // zone maps cannot prune the user query; z-order interleaving must
    assert(bu == bf, "by_day layout: user query reads every file")
    assert(zu < zf, "zorder layout: user zone maps must prune some files")
    assert(zd < zf, "zorder layout: day zone maps must prune some files")
    assert(bd <= 2, "by_day layout: day query reads only day-19740 files")
    assert(bu > 0 && zu > 0 && zd > 0, "probes must hit real data")
    graft.ops.Caches.clear()
  }

  test("q142 CI bounds are the exact 2nd/31st order statistics of the replicate means") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)
    }
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val ests = (0 until 32).map { b =>
        val ws = ds.map { case (_, id, x) => (1 + h32(s"$id:$b") % 3, x) }
        (ws.map { case (wt, x) => wt * x }.sum * 1000 / ws.map(_._1).sum, b)
      }.sorted
      src -> ((ests(1)._1, ests(30)._1))
    }
    val got = SparkEntry.queries("q142_bootstrap_ci")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("lo_milli"), r.getAs[Long]("hi_milli")))).toMap
    assert(got == expect, "CI bounds must equal the JVM-exact order statistics")
    got.values.foreach { case (lo, hi) => assert(lo <= hi) }
  }

  test("q143 EWMA flags equal the exact integer recursion replayed on the JVM") {
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (et, ds) =>
      val sorted = ds.sortBy(_._2)
      var ewma = -1L
      sorted.map { case (_, day, c) =>
        val flag = if (ewma >= 0 && c * 1000 > 2 * ewma) 1L else 0L
        val above = if (ewma >= 0 && c * 1000 > ewma) 1L else 0L
        ewma = if (ewma < 0) c * 1000 else (c * 1000 + ewma) / 2
        (et, day, c, ewma, flag, above)
      }
    }.toSet
    val got = SparkEntry.queries("q143_ewma_anomaly")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("c"), r.getAs[Long]("ewma_milli"),
        r.getAs[Long]("anomaly"), r.getAs[Long]("above_level"))).toSet
    assert(got == expect, "EWMA sequence must match the JVM replay exactly")
    assert(got.exists(_._5 == 1L) || got.size < 40,
      "a month of bursty synthetic traffic should flag at least one anomaly " +
        "(vacuous only if the series is very short)")
    // above_level fires on roughly half the rows at ANY SF — the oracle
    // hash-compare therefore exercises BOTH branches of the comparison
    // even on smooth fixtures where the 2x anomaly never triggers.
    assert(got.exists(_._6 == 1L) && got.exists(_._6 == 0L),
      "above_level must take both values so the compare pins the > branch")
  }

  test("q144 Spearman matches an exact JVM replay and rho is bounded") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3).split(" ", -1).length.toLong))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val ra = ds.sortBy(d => (d._3, d._2)).zipWithIndex
        .map { case (d, i) => d._2 -> (i + 1).toLong }.toMap
      val rb = ds.sortBy(d => (d._4, d._2)).zipWithIndex
        .map { case (d, i) => d._2 -> (i + 1).toLong }.toMap
      val s2 = ds.map(d => { val df = ra(d._2) - rb(d._2); df * df }).sum
      (src, ds.length.toLong, s2)
    }.toSet
    val got = SparkEntry.queries("q144_spearman")(spark, sf).collect()
    assert(got.map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("sum_d2"))).toSet == expect,
      "rank-distance sums must match the JVM replay")
    got.foreach { r =>
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 && rho <= 1.0, s"rho out of range: $rho")
    }
    // chars and whitespace tokens are strongly monotone-associated on
    // this corpus — the op must detect it, not return noise
    assert(got.forall(_.getAs[Double]("rho") > 0.5))
  }

  test("q145 Benford digits partition the orders and deviations are consistent") {
    val rows = SparkEntry.queries("q145_benford")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L),
      "exactly digits 1..9, ordered")
    val total = graft.model.Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= 1).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "every order lands in exactly one leading-digit bucket")
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum > 999990L && shareSum <= 1000000L,
      s"floor-ppm shares must sum to ~1e6, got $shareSum")
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ==
        math.abs(r.getAs[Long]("share_ppm") - r.getAs[Long]("benford_ppm")))
    }
  }

  test("q146 CUSUM equals the exact integer recursion replayed on the JVM") {
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (et, ds) =>
      val sorted = ds.sortBy(_._2)
      val mean = sorted.map(_._3).sum * 1000 / sorted.length
      var up = 0L; var dn = 0L
      sorted.map { case (_, day, c) =>
        up = math.max(0L, up + c * 1000 - mean)
        dn = math.max(0L, dn + mean - c * 1000)
        val flag = if (up > 4 * mean || dn > 4 * mean) 1L else 0L
        (et, day, c, up, dn, flag)
      }
    }.toSet
    val got = SparkEntry.queries("q146_cusum")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("c"), r.getAs[Long]("cusum_up_milli"),
        r.getAs[Long]("cusum_dn_milli"), r.getAs[Long]("flag"))).toSet
    assert(got == expect, "CUSUM sequence must match the JVM replay exactly")
    // the max(0,·) clamp must be exercised from BOTH sides at the spec
    // SF, so the oracle hash pins the clamp as well as the sums
    assert(got.exists(_._4 > 0L) && got.exists(_._4 == 0L),
      "upward CUSUM must take both zero and positive values")
    assert(got.exists(_._5 > 0L) && got.exists(_._5 == 0L),
      "downward CUSUM must take both zero and positive values")
  }

  test("q147 skip-gram pairs equal a brute-force window-2 replay") {
    val texts = graft.model.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val toks = texts.map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val nTotal = uni.values.sum
    val pairCnt = toks.flatMap { t =>
      def canon(a: String, b: String) = if (a <= b) (a, b) else (b, a)
      t.indices.dropRight(1).flatMap { i =>
        val g1 = Seq(canon(t(i), t(i + 1)))
        val g2 = if (i + 2 < t.length) Seq(canon(t(i), t(i + 2))) else Nil
        g1 ++ g2
      }
    }.groupBy(identity).map { case (p, o) => p -> o.length.toLong }
      .filter(_._2 >= 5L)
    val expect = pairCnt.map { case ((w1, w2), nxy) =>
      val nx = uni(w1); val ny = uni(w2)
      val q6 = nxy * 1000000L / nx
      val lift = q6 * (nTotal / ny) + q6 * (nTotal % ny) / ny
      (w1, w2, nxy, nx, ny, lift)
    }.toSeq.sortBy { case (w1, w2, _, _, _, l) => (-l, w1, w2) }.take(20)
    val got = SparkEntry.queries("q147_skipgram_lift")(spark, sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n_xy"), r.getAs[Long]("n_x"), r.getAs[Long]("n_y"),
        r.getAs[Long]("lift_ppm"))).toSeq
    assert(got == expect, s"top-20 skip-gram lift drifted; got ${got.take(3)} " +
      s"expected ${expect.take(3)}")
    graft.ops.Caches.clear()
  }

  test("q148 FD audit: key FDs hold, non-key FDs are violated, counts nest") {
    val rows = SparkEntry.queries("q148_fd_audit")(spark, sf).collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    assert(rows.keySet == Set("orderkey->status", "custkey->priority",
      "custkey->segment", "orderkey->returnflag"))
    // primary keys functionally determine every other column of their row
    assert(rows("orderkey->status").getAs[Boolean]("holds"))
    assert(rows("custkey->segment").getAs[Boolean]("holds"))
    assert(rows("orderkey->status").getAs[Long]("max_rhs") == 1L)
    // a repeat customer orders at several priorities on this corpus
    assert(!rows("custkey->priority").getAs[Boolean]("holds"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("max_rhs") >= 1L)
      assert(r.getAs[Boolean]("holds") == (r.getAs[Long]("n_violating") == 0L))
    }
    // group counts match the key cardinalities they claim to audit
    val nOrders = graft.model.Tables.orders(spark, sf)
      .select("o_orderkey").distinct.count()
    assert(rows("orderkey->status").getAs[Long]("n_groups") == nOrders)
  }

  test("q149 l-diversity: l bounded by nation count, orders conserved") {
    val rows = SparkEntry.queries("q149_l_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nNations = graft.model.Tables.customer(spark, sf)
      .select("c_nationkey").distinct.count()
    rows.foreach { r =>
      val l = r.getAs[Long]("l")
      assert(l >= 1L && l <= nNations, s"l=$l outside [1, $nNations]")
      assert(r.getAs[Boolean]("at_risk") == (l < 3L))
      // a group with l distinct sensitive values has >= l members
      assert(r.getAs[Long]("n_orders") >= l * r.getAs[Long]("n_groups"))
    }
    val totalOrders = graft.model.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == totalOrders,
      "every order lands in exactly one QID group")
  }

  test("q150 ACF matches a JVM replay and is 1.0 on a self-paired lag") {
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val expect = byType.toSeq.flatMap { case (et, ds) =>
      val m = ds.map(d => d._2 -> d._3).toMap
      (1L to 3L).flatMap { k =>
        val pairs = m.toSeq.flatMap { case (day, x) =>
          m.get(day + k).map(y => (x, y)) }
        if (pairs.isEmpty) None else {
          val n = pairs.length.toLong
          val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sxx = pairs.map(p => p._1 * p._1).sum
          val syy = pairs.map(p => p._2 * p._2).sum
          Some((et, k, n, n * sxy - sx * sy, n * sxx - sx * sx,
            n * syy - sy * sy))
        }
      }
    }.toSet
    val got = SparkEntry.queries("q150_acf_lags")(spark, sf).collect()
    assert(got.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag"),
      r.getAs[Long]("n_pairs"), r.getAs[Long]("num"), r.getAs[Long]("den_x"),
      r.getAs[Long]("den_y"))).toSet == expect,
      "ACF sufficient statistics must match the JVM replay")
    got.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("acf"))) {
        val a = r.getAs[Double]("acf")
        assert(a >= -1.0 && a <= 1.0, s"ACF out of [-1,1]: $a")
      }
    }
  }

  test("q151 LISTAGG is sorted, complete, and partition-order-independent") {
    val rows = SparkEntry.queries("q151_listagg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getAs[String]("priorities").split("\\|").toSeq
      assert(parts == parts.sorted, "list must be data-ordered, not shuffle-ordered")
      assert(parts.distinct.size == parts.size, "list elements are distinct")
      assert(parts.size.toLong == r.getAs[Long]("n_priorities"))
    }
    val totalOrders = graft.model.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == totalOrders)
    // determinism across a different physical layout: repartitioned input
    // must produce the identical aggregation
    val again = SparkEntry.queries("q151_listagg")(spark, sf).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("q152 k-core trace shrinks monotonically and round 0 matches the dup graph") {
    val rows = SparkEntry.queries("q152_kcore")(spark, sf).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.map(_.getAs[Long]("round")).toSeq == Seq(0L, 1L, 2L, 3L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_nodes") <= a.getAs[Long]("n_nodes"),
        "peeling can only remove nodes")
      assert(b.getAs[Long]("n_edges") <= a.getAs[Long]("n_edges"),
        "peeling can only remove edges")
    }
    // round 0 is the raw dup graph — must agree with dupEdges directly
    // (q115's census moved to the dedup-grade jac ≥ 0.6 edge set in
    // round 8, so it is no longer the 0.3-graph witness)
    val e0 = graft.ops.Dedup.dupEdges(spark, sf)
    assert(rows(0).getAs[Long]("n_edges") == e0.count())
    val n0 = e0.select(col("doc_a").as("n"))
      .unionByName(e0.select(col("doc_b").as("n"))).distinct().count()
    assert(rows(0).getAs[Long]("n_nodes") == n0)
    // every survivor of a 2-core peel has degree >= 2, so e >= n
    rows.drop(1).foreach { r =>
      assert(r.getAs[Long]("n_edges") >= r.getAs[Long]("n_nodes"),
        "a 2-core cannot have fewer edges than nodes")
    }
    graft.ops.Caches.clear()
  }

  test("q153 AND search: every hit contains all three query terms") {
    val rows = SparkEntry.queries("q153_bool_search")(spark, sf).collect()
    assert(rows.nonEmpty, "mid-frequency terms must co-occur somewhere")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_terms") == 3L)
      assert(r.getAs[Long]("sum_tf") >= 3L, "each term appears at least once")
      assert(r.getAs[Long]("dl") >= r.getAs[Long]("sum_tf"),
        "doc length bounds the matched-term occurrences")
    }
    val ids = rows.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == ids.sorted && ids.distinct.size == ids.size)
  }

  test("q154 position attribution conserves per-user credit") {
    val rows = SparkEntry.queries("q154_position_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    // total credit across types ~= 10^6 per converting user (floor-div
    // loses < (n-2) ppm per user, never gains)
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val expect = byUser.toSeq.flatMap { case (_, es) =>
      val fp = es.filter(_._3 == "purchase").map(_._4).sorted.headOption
      fp.toSeq.flatMap { f =>
        val touches = es.filter(e => e._3 != "purchase" && e._4 < f)
          .sortBy(e => (e._4, e._2))
        val n = touches.length
        touches.zipWithIndex.map { case (e, i) =>
          val credit =
            if (n == 1) 1000000L
            else if (n == 2) 500000L
            else if (i == 0 || i == n - 1) 400000L
            else 200000L / (n - 2)
          (e._3, credit)
        }
      }
    }
    val expAgg = expect.groupBy(_._1).map { case (t, cs) =>
      t -> (cs.length.toLong, cs.map(_._2).sum) }
    val gotAgg = rows.map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("n_touches"), r.getAs[Long]("credit_ppm"))).toMap
    assert(gotAgg == expAgg, s"credit drifted: got $gotAgg expected $expAgg")
    val perUserTotal = expect.map(_._2).sum
    val users = byUser.count { case (_, es) =>
      val fp = es.filter(_._3 == "purchase").map(_._4).sorted.headOption
      fp.exists(f => es.exists(e => e._3 != "purchase" && e._4 < f))
    }
    assert(perUserTotal <= 1000000L * users &&
      perUserTotal > 1000000L * users - 1000L * users,
      "floor-ppm credit must conserve to within the documented remainder")
  }

  test("q155 heavy orders all clear the threshold and join consistently") {
    val rows = SparkEntry.queries("q155_big_orders")(spark, sf).collect()
    assert(rows.nonEmpty, "sf0.001 contains orders above 300 quantity")
    rows.foreach(r => assert(r.getAs[Double]("sum_qty") > 300.0))
    val prices = rows.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices == prices.sorted.reverse, "descending price order")
    // cross-check one row against a direct recomputation
    val k = rows(0).getAs[Long]("o_orderkey")
    val qty = graft.model.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === k)
      .agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    assert(math.abs(qty - rows(0).getAs[Double]("sum_qty")) < 1e-9)
  }

  test("q156 calibration: estimator is slot-bounded and pair count matches q26") {
    val rows = SparkEntry.queries("q156_minhash_calibration")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      // est is a mean of 16 indicator slots: ppm multiples of 62500
      assert(r.getAs[Long]("sum_est_ppm") % 62500L == 0L)
      assert(r.getAs[Long]("sum_est_ppm") <= 1000000L * n)
      assert(r.getAs[Long]("sum_exact_ppm") <= 1000000L * n)
      assert(r.getAs[Long]("err_decile") >= 0L && r.getAs[Long]("err_decile") <= 10L)
    }
    // the histogram partitions exactly the verified candidate set q26 reads
    val nPairs = graft.ops.Dedup.minhashVerifiedPairs(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nPairs,
      "every verified candidate pair lands in exactly one error decile")
    // a sketch that works concentrates mass at low error
    val low = rows.filter(_.getAs[Long]("err_decile") <= 2L)
      .map(_.getAs[Long]("n_pairs")).sum
    assert(low * 2 >= nPairs, s"low-error mass $low of $nPairs")
    graft.ops.Caches.clear()
  }

  test("q157 weighted sample replays exactly and tracks weight order") {
    val rows = SparkEntry.queries("q157_weighted_sample")(spark, sf).collect()
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val wmax = docs.map(_._3).max
    def h32(sx: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val kept = ds.filter(d => h32(s"wsamp:${d._2}") % 1000000L <
        d._3 * 1000000L / wmax)
      (src, ds.length.toLong, kept.length.toLong, kept.map(_._3).sum,
        ds.map(_._3).sum)
    }.toSet
    val got = rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_kept"), r.getAs[Long]("kept_chars"),
      r.getAs[Long]("total_chars"))).toSet
    assert(got == expect, "keep decisions must replay bit-for-bit on the JVM")
    // the sample is weight-proportional in aggregate: kept docs are
    // longer on average than the population
    val (k, kc) = (rows.map(_.getAs[Long]("n_kept")).sum,
      rows.map(_.getAs[Long]("kept_chars")).sum)
    val (n, tc) = (rows.map(_.getAs[Long]("n_docs")).sum,
      rows.map(_.getAs[Long]("total_chars")).sum)
    assert(k > 0 && kc * n > tc * k,
      "weighted sampling must skew the sample toward long documents")
  }

  test("q158 histogram is dense: every (type, bin) cell present, shares sum") {
    val rows = SparkEntry.queries("q158_dense_histogram")(spark, sf).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(rows.length == types.length * 10, "10 bins per type, zeros included")
    types.foreach { t =>
      val bins = rows.filter(_.getAs[String]("event_type") == t)
      assert(bins.map(_.getAs[Long]("bin")).sorted.toSeq == (0L to 9L))
      val share = bins.map(_.getAs[Long]("share_ppm")).sum
      assert(share > 999990L && share <= 1000000L, s"$t shares sum $share")
    }
    val total = graft.model.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.exists(_.getAs[Long]("n") == 0L) ||
      rows.forall(_.getAs[Long]("n") > 0L))
  }

  test("q159 interarrival buckets are log2-consistent and count conserving") {
    val rows = SparkEntry.queries("q159_interarrival")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (lo, hi) = (r.getAs[Long]("min_gap_us"), r.getAs[Long]("max_gap_us"))
      assert(lo <= hi)
      if (b == 0L) assert(lo == 0L && hi == 0L)
      else {
        // bucket = bitlength: 2^(b-1) <= gap < 2^b
        assert(lo >= (1L << (b - 1).toInt) && hi < (1L << b.toInt),
          s"bucket $b gap range [$lo,$hi] outside [2^${b - 1}, 2^$b)")
      }
    }
    // gaps = events - one first-event per (user, type) group
    val ev = graft.model.Tables.events(spark, sf)
    val nEvents = ev.count()
    val nGroups = ev.select("user_id", "event_type").distinct.count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == nEvents - nGroups)
  }

  test("q160 dispositions partition the corpus; precedence holds") {
    val rows = SparkEntry.queries("q160_drop_reasons")(spark, sf).collect()
    val total = graft.model.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "every document gets exactly one disposition")
    val reasons = rows.map(_.getAs[String]("reason")).toSet
    assert(reasons.subsetOf(Set("exact_dup", "near_dup", "boilerplate", "kept")))
    assert(reasons.contains("kept"), "something must survive")
    val share = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(share > 999990L && share <= 1000000L)
    // near-dup drops = non-survivor CC members MINUS those already
    // claimed by exact_dup (precedence): bounded by total cluster mass
    val labels = graft.ops.Dedup.connectedComponents(
      graft.ops.Dedup.dupEdges(spark, sf)).collect()
    val nonSurvivors = labels.count(r => r.getLong(1) != r.getLong(0))
    val nearRow = rows.find(_.getAs[String]("reason") == "near_dup")
    assert(nearRow.forall(_.getAs[Long]("n_docs") <= nonSurvivors))
  }

  test("q161 decayed popularity is bounded by raw and at least newest day") {
    val rows = SparkEntry.queries("q161_decayed_popularity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, dec, latest) = (r.getAs[Long]("raw_total"),
        r.getAs[Long]("decayed_score"), r.getAs[Long]("latest_day_count"))
      assert(dec <= raw, "halving can only shrink mass")
      assert(dec >= latest, "the age-0 day contributes undecayed")
      // geometric bound: sum of c>>k <= latest + sum over older days of
      // half their raw mass is loose but direction-checks the decay
      assert(dec <= latest + (raw - latest), "sanity")
    }
  }

  test("q162 diff classes reconcile with the modular construction rules") {
    val rows = SparkEntry.queries("q162_table_diff")(spark, sf).collect()
      .map(r => r.getAs[String]("klass") -> r).toMap
    val orders = graft.model.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    val added = orders.count(_ % 83 == 0)
    val deleted = orders.count(_ % 89 == 0)
    val modified = orders.count(k => k % 97 == 0 && k % 89 != 0)
    assert(rows("added").getAs[Long]("n_rows") == added)
    assert(rows("deleted").getAs[Long]("n_rows") == deleted)
    assert(rows("modified").getAs[Long]("n_rows") == modified)
    assert(rows("unchanged").getAs[Long]("n_rows") ==
      orders.length - deleted - modified)
    assert(rows("added").getAs[Long]("min_key") >= 1000000000L)
  }

  test("q163 DAU <= WAU and stickiness is a valid ppm ratio") {
    val rows = SparkEntry.queries("q163_rolling_active")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") >= 1L)
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"),
        "the trailing window contains the day itself")
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
    }
    // spot-check one day against a direct recomputation
    val du = graft.model.Tables.events(spark, sf)
      .select(col("user_id"),
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val someDay = rows(rows.length / 2).getAs[Long]("day")
    val expWau = du.filter(p => p._2 >= someDay - 6 && p._2 <= someDay)
      .map(_._1).distinct.length.toLong
    assert(rows.find(_.getAs[Long]("day") == someDay).get
      .getAs[Long]("wau") == expWau)
  }

  test("q164 weekday profile conserves volume and centers lift at 1e6") {
    val rows = SparkEntry.queries("q164_dow_seasonality")(spark, sf).collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getAs[String]("event_type")).distinct
    types.foreach { t =>
      val tr = rows.filter(_.getAs[String]("event_type") == t)
      assert(tr.map(_.getAs[Long]("dow")).forall(d => d >= 0 && d <= 6))
      val share = tr.map(_.getAs[Long]("share_ppm")).sum
      assert(share > 999990L && share <= 1000000L, s"$t shares $share")
      // rate lift is a ratio around 1e6: every type has some day at or
      // above its own average rate
      assert(tr.map(_.getAs[Long]("rate_lift_ppm")).max >= 1000000L - 7L)
    }
    val total = graft.model.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("q165 exact pairs equal the true self-join size; hh beats uniform") {
    val r = SparkEntry.queries("q165_join_cardinality")(spark, sf).collect()(0)
    val li = graft.model.Tables.lineitem(spark, sf)
    val trueSize = li.select(col("l_suppkey").as("k"))
      .join(li.select(col("l_suppkey").as("k")), "k").count()
    assert(r.getAs[Long]("exact_pairs") == trueSize,
      "sum of c^2 must equal the materialized self-join size")
    assert(r.getAs[Long]("hh_err_ppm") <= r.getAs[Long]("uniform_err_ppm"),
      "correcting the top-10 keys can only improve the estimate")
    assert(r.getAs[Long]("uniform_est") <= r.getAs[Long]("exact_pairs"),
      "Cauchy-Schwarz: the uniform estimate lower-bounds sum c^2")
  }

  test("q166 Lorenz curve is monotone with revenue ahead of customers") {
    val rows = SparkEntry.queries("q166_revenue_concentration")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // rows ordered richest bucket first: cumulative shares must grow
    val revs = rows.map(_.getAs[Long]("cum_rev_ppm"))
    val custs = rows.map(_.getAs[Long]("cum_cust_ppm"))
    assert(revs.toSeq == revs.sorted.toSeq, "cumulative revenue monotone")
    assert(custs.toSeq == custs.sorted.toSeq, "cumulative customers monotone")
    assert(revs.last == 1000000L && custs.last == 1000000L,
      "full cumulative covers everything")
    // concentration: at every point the richest-first revenue share is
    // at least the customer share (Lorenz dominance)
    rows.foreach { r =>
      assert(r.getAs[Long]("cum_rev_ppm") >= r.getAs[Long]("cum_cust_ppm") - 1L)
    }
    val totalCust = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct.count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == totalCust)
  }

  test("q107 profile covers every orders column with nested counts") {
    val rows = SparkEntry.queries("q107_table_profile")(spark, sf).collect()
    val cols = graft.model.Tables.orders(spark, sf).schema.fieldNames.toSet
    assert(rows.map(_.getAs[String]("column_name")).toSet == cols)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(r.getAs[Long]("n_null") <= n)
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[Long]("n_distinct") + r.getAs[Long]("n_null") > 0)
    }
  }

  test("q173 chi-square cells: expected mass matches observed mass per row") {
    val rows = SparkEntry.queries("q173_chi2_independence")(spark, sf).collect()
    assert(rows.nonEmpty)
    // Σ obs over a type's row equals its row total, and the micro-scaled
    // expected counts reassemble to ≈ the same mass (floor-div slack ≤
    // one unit per cell).
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, cells) =>
      val obs = cells.map(_.getAs[Long]("obs")).sum
      val exp = cells.map(_.getAs[Long]("exp_scaled")).sum
      assert(math.abs(exp - obs * 1000000L) <= cells.length * 1000000L,
        s"expected mass $exp drifted from observed ${obs * 1000000L}")
      cells.foreach(c => assert(c.getAs[Long]("contrib_e6") >= 0L))
    }
  }

  test("q175 islands partition active days; streak bounds hold") {
    val rows = SparkEntry.queries("q175_streaks")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ni, mx, act) = (r.getAs[Long]("n_islands"),
        r.getAs[Long]("max_streak"), r.getAs[Long]("n_active_days"))
      assert(ni >= 1 && mx >= 1 && act >= ni)
      assert(mx <= act && act <= ni * mx,
        s"islands($ni) × max($mx) must bound active($act)")
    }
  }

  test("q177 A/B arms partition the user base; z2 consistent with rates") {
    val r = SparkEntry.queries("q177_ab_test")(spark, sf).collect()(0)
    val nUsers = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct.count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nUsers)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    // equal rates ⇒ z² = 0; the readout may be null only on a
    // degenerate arm (all or none converted overall)
    val z2 = Option(r.getAs[Long]("z2_milli"))
    val degenerate = r.getAs[Long]("conv_a") + r.getAs[Long]("conv_b") == 0 ||
      r.getAs[Long]("conv_a") + r.getAs[Long]("conv_b") == nUsers
    if (!degenerate) assert(z2.exists(_ >= 0L))
  }

  test("q174 TVD is a bounded metric, zero only for the corpus itself") {
    val rows = SparkEntry.queries("q174_source_divergence")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tvd = r.getAs[Long]("tvd_ppm")
      assert(tvd >= 0L && tvd <= 1000000L, s"TVD ppm $tvd out of [0, 1e6]")
      assert(r.getAs[Long]("n_types_seen") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("q178 linkage scores: monotone comparator hierarchy, pairs conserved") {
    val rows = SparkEntry.queries("q178_linkage_scores")(spark, sf).collect()
    assert(rows.nonEmpty)
    val allowed = Set(0L, 4L, 8L, 12L, 16L, 20L, 24L, 28L)
    rows.foreach { r =>
      assert(allowed.contains(r.getAs[Long]("score")),
        s"score ${r.getAs[Long]("score")} outside the additive-weight lattice")
      assert(r.getAs[Long]("n_pairs") >= r.getAs[Long]("n_left_docs") ||
        r.getAs[Long]("n_left_docs") >= 1)
      assert(r.getAs[Long]("witness_a") < r.getAs[Long]("witness_b"))
    }
    // total pairs must equal the blocked-pair count (no pair dropped or
    // double-counted by the scoring)
    val side = graft.model.Tables.documents(spark, sf)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val expected = side.select(sum(expr("n * (n - 1) / 2")).cast("long"))
      .collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == expected)
  }

  test("q179 weighted quantiles are ordered and within the price domain") {
    val rows = SparkEntry.queries("q179_weighted_quantiles")(spark, sf).collect()
    assert(rows.length == 3) // A, N, R return flags
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Long]("p25_cents"),
        r.getAs[Long]("p50_cents"), r.getAs[Long]("p75_cents"))
      assert(p25 <= p50 && p50 <= p75, s"quantiles out of order: $p25 $p50 $p75")
      assert(p25 > 0 && r.getAs[Long]("total_weight") > 0)
    }
    // replay the median definition for one flag on the driver
    val li = graft.model.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "A")
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("pc"),
        expr("CAST(l_quantity AS BIGINT)").as("w")).collect()
    val total = li.map(_.getAs[Long]("w")).sum
    val sorted = li.groupBy(_.getAs[Long]("pc")).view
      .mapValues(_.map(_.getAs[Long]("w")).sum).toSeq.sortBy(_._1)
    var cum = 0L
    val median = sorted.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
    assert(rows.find(_.getAs[String]("flag") == "A").get
      .getAs[Long]("p50_cents") == median)
  }

  test("q180 IVF recall: bounded per query, perfect when cell holds top-3") {
    val rows = SparkEntry.queries("q180_ann_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hit")
      assert(hits >= 0L && hits <= 3L)
      assert(r.getAs[Long]("recall_ppm") == hits * 1000000L / 3L)
    }
    // the audit's reason to exist: it must report full recall for at
    // least SOME query (same-cell neighbors dominate in clustered data)
    assert(rows.exists(_.getAs[Long]("n_hit") > 0L),
      "every query lost every neighbor — cell assignment is broken")
  }

  test("q176 phrase hits: every returned doc really contains the bigram") {
    val rows = SparkEntry.queries("q176_phrase_search")(spark, sf).collect()
    assert(rows.nonEmpty)
    val phrase = rows(0).getAs[String]("phrase")
    val Array(w1, w2) = phrase.split(" ", 2)
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val docs = graft.model.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").collect()
    docs.foreach { d =>
      val toks = d.getAs[String]("text").split(" ")
      val hits = toks.sliding(2).count(p => p.length == 2 &&
        p(0) == w1 && p(1) == w2)
      val claimed = rows.find(_.getAs[Long]("doc_id") == d.getAs[Long]("doc_id"))
        .get.getAs[Long]("n_hits")
      assert(hits.toLong == claimed,
        s"doc ${d.getAs[Long]("doc_id")}: replay $hits != claimed $claimed")
    }
  }
}

/** Compiled PII patterns shared by LateOpsSpec — kept out of the main jar
  * (test-only); mirrors [[graft.ops.TextAnalysis.PiiClasses]]. */
object TextAnalysisPatterns {
  val all: Seq[java.util.regex.Pattern] =
    graft.ops.TextAnalysis.PiiClasses.map(c => java.util.regex.Pattern.compile(c._2))
}
