package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Behavior, Corpus, Dedup, Graph, Lakehouse, Multimodal, Similarity, TextAnalysis}

/** Invariants + injected-detector proofs for q317–q322.
  *
  * The DuckDB hash-compare proves Spark and DuckDB agree; these specs
  * prove the operators DETECT what they claim to detect. The shipped
  * corpus has no cross-source mirrors and no exclusive-token spam, so
  * (per the repo's q310 convention) each detector is additionally run on
  * a written fixture that injects the condition, and must fire.
  */
class AuditOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(rows: Seq[Row]): String = {
    val dir = Files.createTempDirectory("graft-audit-docs").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def doc(id: Long, text: String, lang: String, source: String) =
    Row(id, text, lang, source, text.length.toLong)

  // ---- q317 SemDeDup -------------------------------------------------

  test("q317 conserves vectors per cell and never prunes more than n_vecs - 1") {
    val rows = Similarity.queries("q317_semdedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_pruned") ==
        r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("n_kept") >= 1,
        "the keep-min survivor convention always keeps a representative")
    }
  }

  test("q317 prunes an injected exact-duplicate vector (and keeps the smaller id)") {
    val dir = Files.createTempDirectory("graft-audit-vecs").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    // vec 0 is the (only) centroid (vec_id % 50 == 0); 1 and 2 are exact
    // duplicates of each other → cosine 1 ≥ SemTau → 2 is pruned; 3 is
    // near-orthogonal and must survive.
    val v = Seq(
      Row(0L, Array(1.0f, 0.0f, 0.0f), 0),
      Row(1L, Array(0.6f, 0.8f, 0.0f), 0),
      Row(2L, Array(0.6f, 0.8f, 0.0f), 0),
      Row(3L, Array(0.0f, 0.1f, -0.9f), 0))
    spark.createDataFrame(spark.sparkContext.parallelize(v, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.queries("q317_semdedup")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum == 4)
    assert(out.map(_.getAs[Long]("n_pruned")).sum >= 1,
      "an exact duplicate pair must prune its larger vec_id")
    assert(out.map(_.getAs[Long]("n_kept")).sum <= 3)
  }

  // ---- q318 keyness --------------------------------------------------

  test("q318 emits ranks 1..k per source with non-negative chi2") {
    val rows = TextAnalysis.queries("q318_keyness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
    }
    rows.foreach(r => assert(r.getAs[Long]("chi2_e6") >= 0))
  }

  test("q318 ranks an injected source-exclusive token #1 for that source") {
    val common = "alpha beta gamma delta epsilon"
    val dir = writeDocs(
      (1L to 6L).map(i => doc(i, s"$common zebraword", "en", "spamSrc")) ++
      (7L to 30L).map(i => doc(i, common, "en", "cleanSrc")))
    val out = TextAnalysis.queries("q318_keyness")(spark, dir).collect()
    val top = out.filter(r => r.getAs[String]("source") == "spamSrc" &&
      r.getAs[Long]("rank") == 1L)
    assert(top.length == 1 && top.head.getAs[String]("tok") == "zebraword",
      s"exclusive token must be the #1 key term; got ${top.toSeq}")
    assert(top.head.getAs[Long]("tf_rest") == 0L)
  }

  // ---- q319 MMR ------------------------------------------------------

  test("q319 picks 5 distinct vectors with non-increasing greedy scores") {
    val rows = Similarity.queries("q319_mmr_select")(spark, sf)
      .orderBy("step").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    assert(rows.head.getAs[Long]("maxsim_u") == 0L)
    // Non-increasing from step 2 on: every candidate's maxsim only grows
    // as S grows, so the attainable max score shrinks. Step 1 is outside
    // the law — its score is pure relevance, and a NEGATIVE maxsim at
    // step 2 (anti-correlated pick) can legitimately beat it.
    val scores = rows.map(_.getAs[Long]("score_u")).drop(1)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"greedy MMR scores must be non-increasing from step 2: ${scores.toSeq}")
  }

  // ---- q320 temporal holdout ----------------------------------------

  test("q320 masses add up and the both-sides user count is bounded") {
    val rows = Behavior.queries("q320_holdout_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val evTotal = graft.model.Tables.events(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n_train") + r.getAs[Long]("n_test")).sum
      == evTotal)
    rows.foreach { r =>
      assert(r.getAs[Long]("u_both") <=
        math.min(r.getAs[Long]("u_train"), r.getAs[Long]("u_test")))
    }
  }

  test("q320 detects an injected boundary-crossing user and clears a clean split") {
    val dir = Files.createTempDirectory("graft-audit-ev").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def t(sec: Long) = java.time.LocalDateTime.ofEpochSecond(
      1700000000L + sec, 0, java.time.ZoneOffset.UTC)
    // range [0, 100] s → cut at 80 s. User 1 appears both sides of the
    // cut ("leaky"); users 2/3 are train-only / test-only ("clean").
    val rows = Seq(
      Row(1L, t(0L), 1L, "leaky", 0.0, ""), Row(2L, t(90L), 1L, "leaky", 0.0, ""),
      Row(3L, t(10L), 2L, "clean", 0.0, ""), Row(4L, t(95L), 3L, "clean", 0.0, ""),
      Row(5L, t(100L), 9L, "clean", 0.0, ""))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Behavior.queries("q320_holdout_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("leaky").getAs[Long]("u_both") == 1L)
    assert(out("leaky").getAs[Long]("overlap_ppm") == 1000000L)
    assert(out("clean").getAs[Long]("u_both") == 0L)
  }

  // ---- q321 HHI ------------------------------------------------------

  test("q321 HHI sits between top-share-squared and monopoly; single source = 1e6") {
    val rows = Corpus.queries("q321_hhi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hhi = r.getAs[Long]("hhi_docs_ppm")
      val top = r.getAs[Long]("top_share_ppm")
      assert(hhi <= 1000000L && hhi >= top * top / 1000000L)
    }
    val dir = writeDocs(Seq(
      doc(1, "aa bb", "mono", "onlySrc"), doc(2, "cc dd", "mono", "onlySrc")))
    val out = Corpus.queries("q321_hhi")(spark, dir).collect()
    assert(out.length == 1 && out.head.getAs[Long]("hhi_docs_ppm") == 1000000L)
    assert(out.head.getAs[Long]("n_sources") == 1L)
  }

  // ---- q322 cross-source overlap ------------------------------------

  test("q322 emits explicit zero rows and counts injected cross-source mirrors") {
    val real = Dedup.queries("q322_source_overlap")(spark, sf).collect()
    val nSources = graft.model.Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(real.length == nSources * (nSources - 1) / 2,
      "every unordered source pair must be an explicit row")
    // Injected: A and B share two exact texts; C shares nothing.
    val dir = writeDocs(Seq(
      doc(1, "mirrored one", "en", "A"), doc(2, "mirrored two", "en", "A"),
      doc(3, "only in a", "en", "A"),
      doc(4, "mirrored one", "en", "B"), doc(5, "mirrored two", "en", "B"),
      doc(6, "fresh text", "en", "C")))
    val out = Dedup.queries("q322_source_overlap")(spark, dir).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r).toMap
    assert(out(("A", "B")).getAs[Long]("shared_fps") == 2L)
    // |A ∪ B| = 3 + 2 − 2 = 3 distinct contents → Jaccard 2/3
    assert(out(("A", "B")).getAs[Long]("jaccard_ppm") == 666666L)
    assert(out(("A", "C")).getAs[Long]("shared_fps") == 0L)
    assert(out(("B", "C")).getAs[Long]("shared_fps") == 0L)
  }

  // ---- q323 DSIR proxy ----------------------------------------------

  test("q323 selects the target domain's own docs under an injected vocabulary split") {
    // Target = lexicographically first source ("aaTarget"). Its docs use
    // a disjoint vocabulary, so every target doc scores positive and
    // every other doc negative under the inner-product rule.
    val dir = writeDocs(
      (1L to 10L).map(i => doc(i, "quark gluon boson lepton", "en", "aaTarget")) ++
      (11L to 30L).map(i => doc(i, "apple banana cherry date", "en", "zzOther")))
    val out = Corpus.queries("q323_dsir_proxy")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("aaTarget").getAs[Long]("selected_ppm") == 1000000L)
    assert(out("zzOther").getAs[Long]("n_selected") == 0L)
    assert(out("aaTarget").getAs[Long]("score_sum") > 0L)
    assert(out("zzOther").getAs[Long]("score_sum") < 0L)
  }

  // ---- q324 FD audit -------------------------------------------------

  test("q324 key controls hold and denormalization traps are violated") {
    val rows = Lakehouse.queries("q324_fd_audit")(spark, sf).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("lhs")) -> r).toMap
    assert(rows(("nation", "n_nationkey")).getAs[Boolean]("holds"),
      "a key column must determine every other column")
    assert(rows(("part", "p_partkey")).getAs[Boolean]("holds"))
    assert(!rows(("lineitem", "l_partkey")).getAs[Boolean]("holds"),
      "a part ships from many suppliers — the trap must be flagged")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("viol_groups") <= r.getAs[Long]("n_groups"))
    }
  }

  // ---- q325 span overlap ---------------------------------------------

  test("q325 containment dominates jaccard and shared is bounded by the smaller side") {
    val rows = TextAnalysis.queries("q325_span_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sh = r.getAs[Long]("shared_fps")
      assert(sh <= math.min(r.getAs[Long]("ndv_a"), r.getAs[Long]("ndv_b")))
      assert(r.getAs[Long]("containment_ppm") >= r.getAs[Long]("jaccard_ppm"))
    }
  }

  // ---- q326 negative sampling ---------------------------------------

  test("q326 shares sum to ~1e6 and damping releases mass from the head token") {
    val rows = Corpus.queries("q326_negative_sampling")(spark, sf).collect()
    assert(rows.nonEmpty)
    val sSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(sSum <= 1000000L && sSum >= 1000000L - rows.length,
      s"floor-ppm shares must sum to 1e6 minus at most one ulp per row, got $sSum")
    val head = rows.maxBy(r => (r.getAs[Long]("tf"), r.getAs[String]("tok")))
    assert(head.getAs[Long]("delta_ppm") <= 0L,
      "the highest-frequency token must not GAIN mass under ^(3/4) damping")
  }

  // ---- q327 max-len sweep --------------------------------------------

  test("q327 token masses are conserved and monotone in max_len") {
    val rows = Corpus.queries("q327_maxlen_sweep")(spark, sf)
      .orderBy("max_len").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_tokens") + r.getAs[Long]("trunc_tokens") ==
        r.getAs[Long]("n_tokens"), "truncation must conserve tokens")
      assert(r.getAs[Long]("kept_tokens") + r.getAs[Long]("pad_tokens") ==
        r.getAs[Long]("n_docs") * r.getAs[Long]("max_len"),
        "padding must fill every doc to max_len exactly")
      assert(r.getAs[Long]("util_ppm") <= 1000000L)
    }
    val kept = rows.map(_.getAs[Long]("kept_tokens"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b })
    val trunc = rows.map(_.getAs[Long]("trunc_docs"))
    assert(trunc.zip(trunc.tail).forall { case (a, b) => a >= b })
  }

  // ---- q328 attribution models --------------------------------------

  test("q328 first/last credits both sum to the converting-user count; linear conserves up to per-user floors") {
    val rows = Behavior.queries("q328_attribution_models")(spark, sf).collect()
    assert(rows.nonEmpty)
    val f = rows.map(_.getAs[Long]("first_touch")).sum
    val l = rows.map(_.getAs[Long]("last_touch")).sum
    assert(f == l, "every attributed user has exactly one first and one last touch")
    val lin = rows.map(_.getAs[Long]("linear_u")).sum
    assert(lin <= f * 1000000L && lin >= f * 1000000L - f * rows.length,
      "per-user linear credit floors lose at most |channels| µ-units per user")
  }

  // ---- q329 dedup drift ----------------------------------------------

  test("q329 never grows a source and conserves the survivor total") {
    val rows = Dedup.queries("q329_dedup_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_after") <= r.getAs[Long]("docs_before"))
    }
    val distinctContents = graft.model.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text"))).distinct().count()
    assert(rows.map(_.getAs[Long]("docs_after")).sum == distinctContents,
      "survivors must partition the distinct-content set")
  }

  // ---- q330 contamination ladder ------------------------------------

  test("q330 flagged mass is monotone non-increasing in shingle width") {
    val rows = Corpus.queries("q330_contamination_ladder")(spark, sf)
      .orderBy("n").collect()
    assert(rows.length == 4)
    val fl = rows.map(_.getAs[Long]("n_flagged"))
    assert(fl.zip(fl.tail).forall { case (a, b) => a >= b },
      s"an n-shingle hit implies an (n-1)-shingle hit: ${fl.toSeq}")
  }

  // ---- q331 repeat factors -------------------------------------------

  test("q331 targets sum to the 4x budget up to per-source floors") {
    val rows = Corpus.queries("q331_repeat_factors")(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = 4L * rows.map(_.getAs[Long]("n_tokens")).sum
    val t = rows.map(_.getAs[Long]("target_tokens")).sum
    assert(t <= budget && t >= budget - rows.length,
      s"floor-division loses at most one token per source: $t vs $budget")
  }

  // ---- q332 threshold retention --------------------------------------

  test("q332 pair and prune counts are monotone non-increasing in tau") {
    val rows = Dedup.queries("q332_threshold_retention")(spark, sf)
      .orderBy("tau_pct").collect()
    assert(rows.length == 7)
    val p = rows.map(_.getAs[Long]("n_pairs"))
    assert(p.zip(p.tail).forall { case (a, b) => a >= b })
    val pr = rows.map(_.getAs[Long]("n_pruned"))
    assert(pr.zip(pr.tail).forall { case (a, b) => a >= b })
  }

  // ---- q333 BMP histogram --------------------------------------------

  test("q333 every channel of a source carries the same pixel mass") {
    val rows = Multimodal.queries("q333_bmp_histogram")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrcCh = rows.groupBy(r =>
      (r.getAs[String]("source"), r.getAs[String]("channel")))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_px")).sum }
    bySrcCh.groupBy(_._1._1).foreach { case (_, chans) =>
      assert(chans.values.toSet.size == 1,
        "r/g/b histograms of one source must each sum to its pixel count")
    }
  }

  // ---- q334 matryoshka ------------------------------------------------

  test("q334 distortion shrinks and recall grows as kept dimensions double") {
    val rows = Similarity.queries("q334_matryoshka")(spark, sf)
      .orderBy("k").collect()
    assert(rows.length == 3)
    val dist = rows.map(_.getAs[Long]("mean_dist_u"))
    assert(dist.zip(dist.tail).forall { case (a, b) => a >= b },
      s"mean cosine distortion must not grow with more dimensions: ${dist.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("max_dist_u") >= r.getAs[Long]("mean_dist_u"))
      assert(r.getAs[Long]("nn_preserved") <= r.getAs[Long]("n_queries"))
    }
  }

  // ---- q335 HITS ------------------------------------------------------

  test("q335 second-iteration authority dominates first and the list is ranked") {
    val rows = Graph.queries("q335_hits")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("auth2") >= r.getAs[Long]("auth1"),
        "every hub score is >= 1, so the 3-path count dominates the buyer count")
    }
    val a2 = rows.map(_.getAs[Long]("auth2"))
    assert(a2.zip(a2.tail).forall { case (a, b) => a >= b })
  }

  // ---- q336 LSH multi-probe -------------------------------------------

  test("q336 multi-probe dominates single-probe in both recall and cost") {
    val rows = Similarity.queries("q336_lsh_multiprobe")(spark, sf).collect()
      .map(r => r.getAs[String]("mode") -> r).toMap
    assert(rows.keySet == Set("single", "multi"))
    assert(rows("multi").getAs[Long]("recall_ppm") >=
      rows("single").getAs[Long]("recall_ppm"),
      "probing a superset of buckets cannot lose candidates")
    assert(rows("multi").getAs[Long]("n_candidates") >=
      rows("single").getAs[Long]("n_candidates"))
    rows.values.foreach(r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_exact")))
  }

  // ---- q337 IVM delta -------------------------------------------------

  test("q337 delta merge reproduces the full recompute on every group") {
    val rows = Lakehouse.queries("q337_ivm_delta")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("consistent"),
        s"IVM law violated for ${r.getAs[String]("prio")}")
      assert(r.getAs[Long]("merged_cnt") == r.getAs[Long]("full_cnt"))
      assert(r.getAs[Long]("merged_rev_c") == r.getAs[Long]("full_rev_c"))
    }
  }

  // ---- q338 bloom sweep -----------------------------------------------

  test("q338 false-positive rate falls as the filter widens") {
    val rows = Corpus.queries("q338_bloom_sweep")(spark, sf)
      .orderBy("m").collect()
    assert(rows.length == 3)
    val fpr = rows.map(_.getAs[Long]("fpr_ppm"))
    assert(fpr.zip(fpr.tail).forall { case (a, b) => a >= b },
      s"a wider filter cannot have a higher FP rate on the same keys: ${fpr.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("bits_set") <=
        math.min(2 * r.getAs[Long]("n_build"), r.getAs[Long]("m")))
    }
  }

  // ---- q339 gzip quality ----------------------------------------------

  test("q339 is deterministic and flags repetitive text as more compressible") {
    val a = graft.ops.Curation.queries("q339_gzip_quality")(spark, sf).collect()
    val b = graft.ops.Curation.queries("q339_gzip_quality")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "deflate at a pinned level must be run-to-run deterministic")
    a.foreach(r => assert(r.getAs[Long]("deflate_bytes") > 0))
    // law: heavy repetition compresses far below varied prose
    val dir = writeDocs(Seq(
      doc(1, "spam spam spam spam spam spam spam spam spam spam spam spam " * 8,
        "en", "looped"),
      doc(2, "the quick brown fox jumps over a lazy dog while seven wizards " +
        "brew unique potions under amber skies every dusk", "en", "prose")))
    val out = graft.ops.Curation.queries("q339_gzip_quality")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("looped").getAs[Long]("ratio_ppm") <
      out("prose").getAs[Long]("ratio_ppm") / 2,
      "looped boilerplate must compress far harder than varied prose")
    assert(out("looped").getAs[Long]("n_suspicious") == 1L)
    assert(out("prose").getAs[Long]("n_suspicious") == 0L)
  }

  // ---- q340 NFC audit -------------------------------------------------

  test("q340 detects injected decomposed text and clears composed text") {
    // "cafe" + COMBINING ACUTE (decomposed) vs precomposed U+00E9
    val decomposed = "cafe\u0301 royale"
    val composed = "caf\u00e9 royale"
    val dir = writeDocs(Seq(
      doc(1, decomposed, "fr", "dirty"), doc(2, composed, "fr", "clean"),
      doc(3, "plain ascii", "en", "clean")))
    val out = graft.ops.Curation.queries("q340_nfc_audit")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("dirty").getAs[Long]("docs_changed") == 1L)
    assert(out("dirty").getAs[Long]("chars_delta") == 1L,
      "NFC composes e + combining acute into one char")
    assert(out("clean").getAs[Long]("docs_changed") == 0L)
  }

  /** Shared brute-force q³ grid for the q395-q397 label-geometry mirrors. */
  private lazy val labVecs: Array[(Long, Long, Array[Long])] =
    graft.model.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label",
        "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          r.getSeq[Double](2).map(x => math.floor(x * 1000 + 0.5).toLong)
            .toArray)
      }

  test("q395 Fisher separability matches a brute-force centroid-algebra mirror") {
    val byLab = labVecs.groupBy(_._2)
    def sj(l: Long) = {
      val vs = byLab(l).map(_._3)
      (0 until vs.head.length).map(j => vs.map(_(j)).sum).toArray
    }
    def w(l: Long) = {
      val vs = byLab(l).map(_._3)
      val n = vs.length.toLong
      val ssq = vs.map(v => v.map(x => BigInt(x) * x).sum).sum
      val s2 = sj(l).map(x => BigInt(x) * x).sum
      n * ssq - s2
    }
    Similarity.queries("q395_fisher_separability")(spark, sf)
      .collect().foreach { r =>
        val (la, lb) = (r.getLong(0), r.getLong(1))
        val (na, nb) = (byLab(la).length.toLong, byLab(lb).length.toLong)
        val (sa, sb) = (sj(la), sj(lb))
        val d2num = sa.indices.map { j =>
          val t = BigInt(sa(j) * nb - sb(j) * na); t * t
        }.sum
        val (wa, wb) = (w(la), w(lb))
        assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
        assert(BigInt(r.getAs[Long]("d2_milli")) ==
          d2num * 1000 / (BigInt(na) * na * nb * nb), s"($la,$lb) d2")
        assert(BigInt(r.getAs[Long]("w2_a_milli")) == wa * 1000 / (na * na))
        assert(BigInt(r.getAs[Long]("fisher_ppm")) ==
          d2num * 1000000 / (BigInt(nb) * nb * wa + BigInt(na) * na * wb)
            .max(BigInt(1)), s"($la,$lb) fisher")
        assert(wa >= 0 && wb >= 0, "within-SS is non-negative")
      }
  }

  test("q396 silhouette matches a brute-force a/b mirror and is bounded") {
    val byId = labVecs.map(v => v._1 -> v).toMap
    Similarity.queries("q396_silhouette")(spark, sf)
      .collect().foreach { r =>
        val qid = r.getAs[Long]("q_id")
        val (_, qlab, qv) = byId(qid)
        def d2(a: Array[Long], b: Array[Long]) =
          a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
        val others = labVecs.filterNot(_._1 == qid)
        val byLab = others.groupBy(_._2)
          .map { case (l, vs) =>
            l -> (vs.map(v => d2(qv, v._3)).sum, vs.length.toLong)
          }
        val (sa, ma) = byLab(qlab)
        val bl = byLab.filterNot(_._1 == qlab)
          .minBy { case (l, (sd, m)) => (sd / m, l) }
        val (blab, (sb, mb)) = bl
        assert(r.getAs[Long]("label") == qlab)
        assert(r.getAs[Long]("b_label") == blab, s"q$qid b_label")
        assert(r.getAs[Long]("n_same") == ma)
        assert(r.getAs[Long]("a_mean_e0") == sa / ma)
        assert(r.getAs[Long]("b_mean_e0") == sb / mb)
        val (x, y) = (BigInt(sb) * ma, BigInt(sa) * mb)
        val den = x.max(y).max(BigInt(1))
        val want = if (x >= y) (x - y) * 1000000 / den
                   else -((y - x) * 1000000 / den)
        assert(BigInt(r.getAs[Long]("s_ppm")) == want, s"q$qid s_ppm")
        assert(math.abs(r.getAs[Long]("s_ppm")) <= 1000000L,
          "|s| <= 1 silhouette law")
      }
  }

  test("q397 per-dim eta2 matches brute force and obeys 0 <= eta2 <= 1") {
    val rows = Similarity.queries("q397_dim_eta2")(spark, sf).collect()
    assert(rows.length == labVecs.head._3.length)
    rows.foreach { r =>
      val j = r.getAs[Long]("dim").toInt
      val xs = labVecs.map(v => (v._2, v._3(j)))
      val n = xs.length.toLong
      val s = xs.map(_._2).sum
      val ssq = xs.map(x => x._2 * x._2).sum
      val sg2e6 = xs.groupBy(_._1).values.map { g =>
        val sg = g.map(_._2).sum
        BigInt(sg) * sg * 1000000 / g.length
      }.sum
      val corr = BigInt(s) * s * 1000000 / n
      val ssb = (sg2e6 - corr).max(BigInt(0))
      val sst = BigInt(ssq) * 1000000 - corr
      assert(r.getAs[Long]("n_vecs") == n)
      assert(r.getAs[Long]("sum_q3") == s)
      assert(BigInt(r.getAs[Long]("ssb_e6")) == ssb, s"dim $j ssb")
      assert(BigInt(r.getAs[Long]("sst_e6")) == sst, s"dim $j sst")
      assert(BigInt(r.getAs[Long]("eta2_ppm")) ==
        ssb * 1000000 / sst.max(BigInt(1)))
      assert(r.getAs[Long]("eta2_ppm") <= 1000000L + 10L,
        "eta2 <= 1 up to floor slack")
    }
  }

  test("q422 repeat rate replays a plain-Scala trigram collision count") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.filter(_._2.length >= 3).groupBy(_._1)
    val rows = TextAnalysis.queries("q422_char_repeat_rate")(spark, sf)
      .collect()
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val src = r.getString(0)
      val tris = bySrc(src).flatMap { case (_, t) =>
        (0 to t.length - 3).map(i => t.substring(i, i + 3)) }
      val counts = tris.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val coll = counts.map(c => c * (c - 1)).sum
      assert(r.getAs[Long]("n_trigrams") == n, s"$src n")
      assert(r.getAs[Long]("n_distinct") == counts.size.toLong, s"$src ndv")
      assert(r.getAs[Long]("collisions") == coll, s"$src coll")
      assert(r.getAs[Long]("repeat_ppm") ==
        (BigInt(coll) * 1000000 / (BigInt(n) * (n - 1))).toLong, s"$src ppm")
      assert(r.getAs[Long]("repeat_ppm") <= 1000000L, "collision prob <= 1")
    }
    // detector leg (the q310 convention): an injected template-spam
    // source must out-repeat every organic source
    val spam = (0L until 20L).map(i =>
      Row(9000L + i, "ab" * 50, "en", "spam_src", 100L))
    val dir = writeDocs(docs.zipWithIndex.map { case ((s0, t), i) =>
      Row(i.toLong, t, "en", s0, t.length.toLong) } ++ spam)
    val fired = TextAnalysis.queries("q422_char_repeat_rate")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("repeat_ppm")).toMap
    assert(fired("spam_src") > fired.filterNot(_._1 == "spam_src").values.max,
      "template spam must dominate the repeat-rate league")
  }
}
