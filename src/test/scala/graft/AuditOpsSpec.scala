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

  test("q330 flagged counts equal a plain-Scala bench-overlap replay") {
    // pins the round-12 semi-join shape (no corpus-wide doc-level
    // distinct) against the definition: n_flagged(n) = #train docs
    // sharing any n-shingle with the %23 benchmark sample
    val texts = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(text: String, n: Int): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < n) Set.empty
      else (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" ")).toSet
    }
    val rows = Corpus.queries("q330_contamination_ladder")(spark, sf)
      .orderBy("n").collect()
    (3 to 6).zip(rows).foreach { case (n, r) =>
      val bench = texts.filter(_._1 % 23 == 0)
        .map(t => grams(t._2, n)).foldLeft(Set.empty[String])(_ ++ _)
      val flagged = texts.filter(_._1 % 23 != 0)
        .count(t => (grams(t._2, n) & bench).nonEmpty)
      assert(r.getAs[Long]("n") == n.toLong)
      assert(r.getAs[Long]("n_flagged") == flagged.toLong, s"n=$n flagged")
      assert(r.getAs[Long]("n_train") == texts.count(_._1 % 23 != 0).toLong)
    }
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

  // ---- q423 HLL pairwise merge ---------------------------------------

  test("q423 union/intersection replay a plain-Scala register merge and exact set algebra") {
    import java.security.MessageDigest
    def md5Hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), md5Hex(r.getString(1))))
    val hashSets = docs.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.map(_._2).toSet }
    // registers: h = first 15 hex chars (60 bits), bucket = h%64, v = h/64
    def registers(hs: Set[String]): Map[Long, Long] =
      hs.map { hh =>
        val h = java.lang.Long.parseLong(hh.take(15), 16)
        val v = h / 64
        (h % 64, if (v == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(v)))
      }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    def estimate(reg: Map[Long, Long]): Long = {
      val two62 = BigInt(1) << 62
      val sOcc = reg.values.map(r => BigInt(1) << (62 - r).toInt).sum
      val denom = (sOcc + BigInt(64 - reg.size) * two62) * 1000000
      (BigInt(709341L) * 4096 * two62 / denom).toLong
    }
    val rows = graft.ops.Pipeline.queries("q423_hll_pair_union")(spark, sf)
      .collect()
    val srcs = hashSets.keys.toSeq.sorted
    assert(rows.length == srcs.combinations(2).size, "one row per pair")
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "ordered pair")
      val (ha, hb) = (hashSets(a), hashSets(b))
      assert(r.getAs[Long]("union_exact") == (ha union hb).size.toLong)
      assert(r.getAs[Long]("inter_exact") == (ha intersect hb).size.toLong)
      val merged = (registers(ha).toSeq ++ registers(hb).toSeq)
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(r.getAs[Long]("union_est") == estimate(merged), s"$a/$b est")
      // inclusion-exclusion identity over the three estimates
      assert(r.getAs[Long]("inter_est") ==
        estimate(registers(ha)) + estimate(registers(hb)) - estimate(merged))
    }
  }

  // ---- q424 LSH band-plan S-curve ------------------------------------

  test("q424 nested plans are monotone and the production plan collides by construction") {
    val rows = Dedup.queries("q424_lsh_band_plan")(spark, sf).collect()
    val byPlan = rows.groupBy(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")))
    assert(byPlan.keySet == Set((16L, 1L), (8L, 2L), (4L, 4L), (2L, 8L)))
    // candidates come from the (4,4) production banding, so every pair
    // collides under (4,4) — and, by band nesting, under (8,2)/(16,1)
    for (plan <- Seq((16L, 1L), (8L, 2L), (4L, 4L)); r <- byPlan(plan))
      assert(r.getAs[Long]("n_collide") == r.getAs[Long]("n_pairs"),
        s"$plan must saturate on its own candidates")
    // per decile, collision count is monotone non-increasing in r
    val chain = Seq((16L, 1L), (8L, 2L), (4L, 4L), (2L, 8L))
    val deciles = rows.map(_.getAs[Long]("decile")).distinct
    for (d <- deciles) {
      val counts = chain.map(p => byPlan(p)
        .find(_.getAs[Long]("decile") == d)
        .map(_.getAs[Long]("n_collide")).getOrElse(0L))
      assert(counts == counts.sorted.reverse,
        s"decile $d: nesting chain must be non-increasing ($counts)")
    }
    // expected S-curve is monotone non-decreasing in similarity per plan
    byPlan.values.foreach { rs =>
      val exp = rs.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("expected_ppm"))
      assert(exp.zip(exp.tail).forall { case (x, y) => x <= y },
        "S-curve monotone in s")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("expected_ppm") <= 1000000L)
      assert(r.getAs[Long]("measured_ppm") <= 1000000L)
    }
  }

  // ---- q425 DP sensitivity pre-flight --------------------------------

  test("q425 replays a plain-Scala sensitivity census over (type, day, user)") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(unix_micros(ts) div 86400000000 AS BIGINT) AS day",
        "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = graft.ops.Stewardship.queries("q425_dp_sensitivity")(spark, sf)
      .collect()
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet == byType.keySet)
    rows.foreach { r =>
      val t = r.getString(0)
      val cells = byType(t).groupBy(e => (e._2, e._3)).map(_._2.length.toLong)
      val users = byType(t).groupBy(_._3).map { case (_, es) =>
        val perCell = es.groupBy(_._2).map(_._2.length.toLong)
        (perCell.max, perCell.sum, perCell.size.toLong)
      }
      val dayCells = byType(t).groupBy(_._2).map(_._2.length.toLong)
      assert(r.getAs[Long]("n_users") == users.size.toLong)
      assert(r.getAs[Long]("delta_inf") == users.map(_._1).max)
      assert(r.getAs[Long]("delta_l1") == users.map(_._2).max)
      assert(r.getAs[Long]("delta_l0") == users.map(_._3).max)
      assert(r.getAs[Long]("n_cells") == dayCells.size.toLong)
      assert(r.getAs[Long]("total_events") == dayCells.sum)
      assert(r.getAs[Long]("min_cell") == dayCells.min)
      // ordering laws the release planner relies on
      assert(r.getAs[Long]("delta_inf") <= r.getAs[Long]("delta_l1"))
      assert(r.getAs[Long]("delta_l0") <= r.getAs[Long]("n_cells"))
      assert(r.getAs[Long]("rel_err_eps2_ppm") <= r.getAs[Long]("rel_err_eps1_ppm"))
      assert(r.getAs[Long]("rel_err_eps1_ppm") <=
        r.getAs[Long]("worst_rel_err_eps1_ppm"))
      val meanCell = r.getAs[Long]("total_events") / r.getAs[Long]("n_cells")
      assert(r.getAs[Long]("mean_cell") == meanCell)
      assert(r.getAs[Long]("rel_err_eps1_ppm") ==
        r.getAs[Long]("delta_l1") * 1000000L / meanCell)
    }
  }

  // ---- q426 content-defined chunking ---------------------------------

  test("q426 replays a plain-Scala CDC chunker and detects injected block spam") {
    import java.security.MessageDigest
    def md5Hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def hash32(s: String): Long =
      java.lang.Long.parseLong(md5Hex(s).take(8), 16)
    def chunksOf(text: String): Seq[String] = {
      val cuts = (8 until text.length)
        .filter(i => hash32(text.substring(i - 8, i)) % 64 == 0)
      val bnds = 0 +: cuts :+ text.length
      bnds.zip(bnds.tail).map { case (a, b) => text.substring(a, b) }
    }
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.length >= 8)
    val rows = Dedup.queries("q426_cdc_chunks")(spark, sf).collect()
    val bySrc = docs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet == bySrc.keySet)
    rows.foreach { r =>
      val src = r.getString(0)
      val chunks = bySrc(src).flatMap(d => chunksOf(d._2))
      assert(r.getAs[Long]("n_chunks") == chunks.length.toLong, s"$src n")
      assert(r.getAs[Long]("total_chars") ==
        bySrc(src).map(_._2.length.toLong).sum, s"$src conservation")
      val uniq = chunks.groupBy(identity).keys.toSeq
      assert(r.getAs[Long]("ndv_chunks") == uniq.size.toLong, s"$src ndv")
      assert(r.getAs[Long]("unique_chars") ==
        uniq.map(_.length.toLong).sum, s"$src uniq chars")
      assert(r.getAs[Long]("unique_chars") <= r.getAs[Long]("total_chars"))
    }
    // detector leg: a source of one block repeated 30× must dedup far
    // below any organic source
    val block = docs.head._2.take(120)
    val spam = (0L until 30L).map(i =>
      Row(9100L + i, block, "en", "block_spam", block.length.toLong))
    val dir = writeDocs(docs.zipWithIndex.map { case ((s0, t), i) =>
      Row(i.toLong, t, "en", s0, t.length.toLong) } ++ spam)
    val fired = Dedup.queries("q426_cdc_chunks")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("dedup_ratio_ppm")).toMap
    assert(fired("block_spam") < fired.filterNot(_._1 == "block_spam").values.min,
      "repeated-block source must show the lowest unique-byte ratio")
  }

  test("q426 boundary kernel equals the declarative md5-window filter") {
    // The CdcBoundaries expression (round 11) must reproduce, bit for
    // bit, the declarative form the oracle replays — including the
    // non-ASCII path (8-CHAR windows over multi-byte UTF-8) and the
    // degenerate lengths the sequence()/filter() corners produce.
    import org.apache.spark.sql.functions._
    val declarative =
      """concat(array(0),
        |  filter(sequence(8, length(text)),
        |    i -> i < length(text) AND
        |      CAST(conv(substring(md5(substring(text, i - 7, 8)), 1, 8),
        |           16, 10) AS BIGINT) % 64 = 0),
        |  array(length(text)))""".stripMargin
    val corpus = graft.model.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val synth = Seq(
      "12345678", "123456789", "ab",
      "héllo wörld — çédille über ñandú, 測試文字列と仮名カナ交じり text",
      "ασκήσεις ελληνικά κείμενο με αρκετό μήκος ώστε να κόβεται κάπου",
      ("mixedascii åäö " * 40),
      ("x" * 300))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((corpus ++ synth).zipWithIndex.map {
        case (t, i) => Row(i.toLong, t) }, 4),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
      .filter(length(col("text")) >= 8)
    val cmp = df.select(
        expr(declarative).as("want"),
        graft.functions.CdcChunking.cdc_boundaries(col("text")).as("got"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"boundary mismatch: ${r.getSeq[Int](0)} vs ${r.getSeq[Int](1)}")
    }
  }

  // ---- q427 association rules ----------------------------------------

  test("q427 rule algebra: paired directions, symmetric lift, conviction bounds") {
    val rows = Behavior.queries("q427_assoc_rules")(spark, sf).collect()
    assert(rows.length % 2 == 0, "both directions of every pair")
    val byPair = rows.groupBy(r => {
      val (a, b) = (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))
      (math.min(a, b), math.max(a, b))
    })
    byPair.values.foreach { dir2 =>
      assert(dir2.length == 2, "exactly two directed rules per pair")
      assert(dir2.map(_.getAs[Long]("lift_ppm")).distinct.length == 1,
        "lift is direction-symmetric")
      assert(dir2.map(_.getAs[Long]("support")).distinct.length == 1)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("conf_ppm") <= 1000000L)
      val conv = r.getAs[Long]("conviction_ppm")
      assert(conv == -1L || conv >= 0L)
      // conviction > 1 iff lift > 1 (both say "better than chance"),
      // up to floor slack on either side of the 1.0 boundary
      if (conv > 1001000L) assert(r.getAs[Long]("lift_ppm") >= 999000L,
        s"conviction ${conv} with lift ${r.getAs[Long]("lift_ppm")}")
    }
  }

  // ---- q428 seed BFS -------------------------------------------------

  test("q428 replays a plain-Scala BFS over the basket graph") {
    val li = graft.model.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).filter(_._2.length <= 32)
    val pairCounts = byOrder.values.toSeq.flatMap { its =>
      val ps = its.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.length >= 2).keys.toSeq
    val adj = (pairCounts ++ pairCounts.map(_.swap))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val brand1 = graft.model.Tables.part(spark, sf)
      .filter("p_brand = 'Brand#1'").select("p_partkey").collect()
      .map(_.getLong(0)).toSet
    val h0 = adj.keySet intersect brand1
    var seen = h0
    var frontier = h0
    val hops = scala.collection.mutable.Map(0 -> h0)
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj(_)) -- seen
      hops(h) = next; seen ++= next; frontier = next
    }
    val rows = graft.ops.Graph.queries("q428_seed_bfs")(spark, sf).collect()
      .map(r => r.getAs[Long]("hop") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("sum_deg"))).toMap
    for (h <- 0 to 3; if hops(h).nonEmpty) {
      assert(rows(h.toLong)._1 == hops(h).size.toLong, s"hop $h count")
      assert(rows(h.toLong)._2 == hops(h).toSeq.map(v => adj(v).size.toLong).sum,
        s"hop $h degree mass")
    }
    val unreached = adj.keySet -- seen
    if (unreached.nonEmpty)
      assert(rows(-1L)._1 == unreached.size.toLong, "unreached census")
    assert(rows.values.map(_._1).sum == adj.size.toLong,
      "hops partition the vertex set")
  }

  // ---- q429 join-strategy advisor ------------------------------------

  test("q429 replays Spark's pinned JoinSelection rules over exact counts") {
    val tables = Map(
      "lineitem" -> graft.model.Tables.lineitem(spark, sf).count(),
      "orders" -> graft.model.Tables.orders(spark, sf).count(),
      "customer" -> graft.model.Tables.customer(spark, sf).count(),
      "part" -> graft.model.Tables.part(spark, sf).count(),
      "supplier" -> graft.model.Tables.supplier(spark, sf).count(),
      "nation" -> graft.model.Tables.nation(spark, sf).count(),
      "region" -> graft.model.Tables.region(spark, sf).count())
    val edges = Map(
      "lineitem_orders" -> ("lineitem", "orders"),
      "lineitem_part" -> ("lineitem", "part"),
      "lineitem_supplier" -> ("lineitem", "supplier"),
      "orders_customer" -> ("orders", "customer"),
      "customer_nation" -> ("customer", "nation"),
      "supplier_nation" -> ("supplier", "nation"),
      "nation_region" -> ("nation", "region"))
    val rows = Lakehouse.queries("q429_join_strategy")(spark, sf).collect()
    assert(rows.length == edges.size)
    rows.foreach { r =>
      val (ta, tb) = edges(r.getString(0))
      val build = math.min(tables(ta), tables(tb))
      val probe = math.max(tables(ta), tables(tb))
      assert(r.getAs[Long]("n_build") == build)
      assert(r.getAs[Long]("n_probe") == probe)
      val (bb, pb) = (build * 64, probe * 64)
      val strat = if (bb <= 10485760L) "broadcast"
        else if (bb * 3 <= pb) "shuffle_hash" else "sort_merge"
      assert(r.getAs[String]("strategy") == strat, r.getString(0))
      val net = if (bb <= 10485760L) bb * 32 else bb + pb
      assert(r.getAs[Long]("est_network_bytes") == net)
    }
  }

  // ---- q430 Otsu threshold census ------------------------------------

  test("q430 replays the Otsu argmax from first-principles pattern pixels") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def otsu(id: Long): (Long, Long, Long) = { // (t, fg, npx)
      val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
      val lums = for (y <- 0 until h; x <- 0 until w) yield {
        val base = id * 31 + x * 7 + y * 13
        (2 * (base % 256) + 5 * ((base + 41) % 256) + ((base + 82) % 256)) / 8
      }
      val n = lums.length; val s = lums.sum
      val maxL = lums.max
      var bestF = -1L; var bestT = maxL
      lums.distinct.sorted.foreach { t =>
        if (t < maxL) {
          val c0 = lums.count(_ <= t).toLong
          val s0 = lums.filter(_ <= t).sum
          val num = s0 * n - s * c0
          val f = num * num * 1000000L / (c0 * (n - c0))
          if (f > bestF) { bestF = f; bestT = t }
        }
      }
      (bestT, lums.count(_ > bestT).toLong, n.toLong)
    }
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val os = ds.map(d => otsu(d._1))
      src -> ((os.length.toLong, os.map(_._1).sum, os.map(_._1).min,
        os.map(_._1).max, os.map(_._2).sum, os.map(_._3).sum))
    }
    val rows = Multimodal.queries("q430_otsu_threshold")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val (ni, sumT, minT, maxT, fg, npx) = expected(r.getString(0))
      assert(r.getAs[Long]("n_images") == ni)
      assert(r.getAs[Long]("sum_t") == sumT, s"${r.getString(0)} sum_t")
      assert(r.getAs[Long]("min_t") == minT)
      assert(r.getAs[Long]("max_t") == maxT)
      assert(r.getAs[Long]("fg_px") == fg)
      assert(r.getAs[Long]("n_px") == npx)
      // a threshold must actually separate: foreground is a strict,
      // nonempty subset unless the image is flat
      assert(fg < npx)
    }
  }

  // ---- q431 design effect --------------------------------------------

  test("q431 Neyman <= proportional <= SRS ordering and a BigInt replay") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = docs.groupBy(_._1).map { case (_, xs) =>
      val nh = BigInt(xs.length); val sx = BigInt(xs.map(_._2).sum)
      val sxx = xs.map(x => BigInt(x._2) * x._2).sum
      val varNum = nh * sxx - sx * sx
      (nh, sx, sxx, varNum / nh,
        BigInt(math.sqrt(varNum.toDouble).toLong))
    }
    val n = strata.map(_._1).sum; val s = strata.map(_._2).sum
    val ss = strata.map(_._3).sum
    val vProp = strata.map(_._4).sum
    val sumNs = strata.map(_._5).sum
    val vSrs = (n * ss - s * s) / n
    val vNey = sumNs * sumNs / n
    val row = graft.ops.Stewardship.queries("q431_design_effect")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_strata") == strata.size.toLong)
    assert(row.getAs[Long]("n_total") == n.toLong)
    assert(row.getAs[Long]("v_srs_num") == vSrs.toLong)
    assert(row.getAs[Long]("v_prop_num") == vProp.toLong)
    assert(row.getAs[Long]("v_ney_num") == vNey.toLong)
    assert(row.getAs[Long]("deff_prop_ppm") == (vProp * 1000000 / vSrs).toLong)
    assert(row.getAs[Long]("deff_ney_ppm") == (vNey * 1000000 / vSrs).toLong)
    // the textbook ordering, with floor slack for the isqrt/DIV steps
    assert(row.getAs[Long]("deff_ney_ppm") <=
      row.getAs[Long]("deff_prop_ppm") + 1000L)
    assert(row.getAs[Long]("deff_prop_ppm") <= 1000000L + 1000L)
  }

  // ---- q432 sort-order interference ----------------------------------

  test("q432 diagonal layouts skip most files; matches are layout-invariant") {
    val rows = graft.ops.Stewardship.queries("q432_sort_advisor")(spark, sf)
      .collect()
    assert(rows.length == 9)
    val byCell = rows.map(r => (r.getAs[String]("layout_key"),
      r.getAs[String]("filter_col")) -> r).toMap
    // the matching-row count depends only on the filter, never the layout
    for (f <- Seq("day", "part", "supp")) {
      val ms = Seq("day", "part", "supp")
        .map(l => byCell((l, f)).getAs[Long]("rows_matching"))
      assert(ms.distinct.length == 1, s"filter $f matches differ by layout")
    }
    rows.foreach { r =>
      // files_total = non-empty value buckets: min(32, ndv-ish) — at
      // sf0.001 the 10 suppliers fill only 10 buckets
      assert(r.getAs[Long]("files_total") >= 1L &&
        r.getAs[Long]("files_total") <= 32L)
      assert(r.getAs[Long]("files_skipped") <= r.getAs[Long]("files_total"))
      assert(r.getAs[Long]("rows_matching") <= r.getAs[Long]("rows_scanned"),
        "zone maps never skip a matching row")
    }
    // clustering on the filter column must dominate every other layout:
    // the [40%, 60%) band leaves ~60% of the value-proportional files
    // entirely outside the probe
    for (f <- Seq("day", "part", "supp")) {
      val cell = byCell((f, f))
      val (diag, tot) = (cell.getAs[Long]("files_skipped"),
        cell.getAs[Long]("files_total"))
      assert(diag * 10 >= tot * 6,
        s"$f diagonal should skip >= 60% of $tot files ($diag)")
      for (l <- Seq("day", "part", "supp") if l != f)
        assert(byCell((l, f)).getAs[Long]("files_skipped") <= diag,
          s"layout $l cannot out-skip clustering on $f itself")
    }
  }

  // ---- q433 selectivity audit ----------------------------------------

  test("q433 replays the uniformity estimates and exact counts") {
    val o = graft.model.Tables.orders(spark, sf)
      .selectExpr("o_orderpriority", "o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents",
        "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS BIGINT) AS day")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = o.length.toLong
    val (loC, hiC) = (o.map(_._3).min, o.map(_._3).max)
    val (loD, hiD) = (o.map(_._4).min, o.map(_._4).max)
    val (tC, tD) = (loC + (hiC - loC + 1) / 4, loD + (hiD - loD + 1) / 4)
    val k0 = o.map(_._2).min
    val expected = Map(
      "p1_eq_low_ndv" -> (n / o.map(_._1).distinct.length,
        o.count(_._1 == "1-URGENT").toLong),
      "p2_eq_high_ndv" -> (n / o.map(_._2).distinct.length,
        o.count(_._2 == k0).toLong),
      "p3_range_price" -> (n * (tC - loC) / (hiC - loC + 1),
        o.count(_._3 < tC).toLong),
      "p4_range_date" -> (n * (tD - loD) / (hiD - loD + 1),
        o.count(_._4 < tD).toLong))
    val rows = graft.ops.Stewardship.queries("q433_selectivity_audit")(spark, sf)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (est, act) = expected(r.getAs[String]("predicate"))
      assert(r.getAs[Long]("est_rows") == est, r.getAs[String]("predicate"))
      assert(r.getAs[Long]("actual_rows") == act, r.getAs[String]("predicate"))
      assert(r.getAs[Long]("q_error_ppm") ==
        math.max(est, act) * 1000000L / math.max(math.min(est, act), 1L))
      assert(r.getAs[Long]("q_error_ppm") >= 1000000L, "q-error >= 1")
    }
  }

  // ---- q434 bot regularity -------------------------------------------

  test("q434 ranks an injected metronome user first with cv2 = 0") {
    val dir = Files.createTempDirectory("graft-audit-bot").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def t(sec: Long) = java.time.LocalDateTime.ofEpochSecond(
      1700000000L + sec, 0, java.time.ZoneOffset.UTC)
    // user 77: a perfect 60 s metronome (12 events → 11 equal gaps);
    // users 1-4: irregular humans (hash-spread gaps, >= 9 events each)
    val bot = (0 until 12).map(i => Row(1000L + i, t(60L * i), 77L, "tick", 0.0, ""))
    val humans = for (u <- 1 to 4; i <- 0 until 10) yield
      Row(u * 100L + i, t((u * 9901L + i * i * 37L + i * 13L) % 86400L),
        u.toLong, "act", 0.0, "")
    spark.createDataFrame(
      spark.sparkContext.parallelize(bot ++ humans, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.ops.Behavior.queries("q434_bot_regularity")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.getAs[Long]("user_id") == 77L, "metronome must rank first")
    assert(first.getAs[Long]("n_gaps") == 11L)
    assert(first.getAs[Long]("cv2_ppm") == 0L, "perfect clock has zero CV")
    assert(first.getAs[Boolean]("is_bot"))
    assert(first.getAs[Long]("mean_gap_us") == 60000000L)
    rows.tail.foreach { r =>
      assert(r.getAs[Long]("cv2_ppm") >= first.getAs[Long]("cv2_ppm"),
        "league sorted ascending")
      if (r.getAs[Long]("cv2_ppm") >= 10000L)
        assert(!r.getAs[Boolean]("is_bot"))
    }
  }

  // ---- q435 vacuum retention -----------------------------------------

  test("q435 reclaim is monotone non-increasing in retention and replays exactly") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxUs = ev.map(_._2).max
    val rows = Lakehouse.queries("q435_vacuum_retention")(spark, sf).collect()
      .sortBy(_.getAs[Long]("retention_days"))
    assert(rows.map(_.getAs[Long]("retention_days")).toSeq == Seq(1L, 7L, 30L))
    val byUser = ev.groupBy(_._1).values.map(_.sortBy(e => (e._2, e._3)))
    def deletable(r: Long): Long = byUser.map { es =>
      es.zip(es.tail).count { case (_, nxt) =>
        nxt._2 <= maxUs - r * 86400000000L }.toLong
    }.sum
    rows.foreach { row =>
      val r = row.getAs[Long]("retention_days")
      assert(row.getAs[Long]("n_versions") == ev.length.toLong)
      assert(row.getAs[Long]("n_deletable") == deletable(r), s"R=$r")
      assert(row.getAs[Long]("n_retained") ==
        ev.length.toLong - row.getAs[Long]("n_deletable"))
      assert(row.getAs[Long]("reclaim_bytes") ==
        row.getAs[Long]("n_deletable") * 64L)
    }
    val del = rows.map(_.getAs[Long]("n_deletable"))
    assert(del.zip(del.tail).forall { case (a, b) => a >= b },
      "longer retention never reclaims more")
  }

  // ---- q436 histogram selectivity ------------------------------------

  test("q436 replays all three histogram estimates; b001 equals q433's uniform leg") {
    val cents = graft.model.Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(_.getLong(0))
    val (lo, hi, n) = (cents.min, cents.max, cents.length.toLong)
    val t = lo + (hi - lo + 1) / 4
    val actual = cents.count(_ < t).toLong
    def est(bins: Int): Long = cents.groupBy(c => (c - lo) * bins / (hi - lo + 1))
      .values.map { bs =>
        val (mn, mx, cnt) = (bs.min, bs.max, bs.length.toLong)
        if (mx < t) cnt else if (mn >= t) 0L
        else cnt * (t - mn) / (mx - mn + 1)
      }.sum
    val rows = graft.ops.Stewardship
      .queries("q436_histogram_selectivity")(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("b001_bins", "b016_bins", "b256_bins"))
    for ((m, b) <- Seq(("b001_bins", 1), ("b016_bins", 16), ("b256_bins", 256))) {
      assert(rows(m).getAs[Long]("est_rows") == est(b), m)
      assert(rows(m).getAs[Long]("actual_rows") == actual)
      // estimation error is bounded by the straddling bin's population
      val straddle = cents.groupBy(c => (c - lo) * b / (hi - lo + 1)).values
        .filter(bs => bs.min < t && bs.max >= t)
        .map(_.length.toLong).sum
      assert(math.abs(rows(m).getAs[Long]("est_rows") - actual) <= straddle + 1,
        s"$m error exceeds the boundary-bin bound")
    }
    // the single-bin method IS q433's p3 uniform estimate — one definition
    val p3 = graft.ops.Stewardship.queries("q433_selectivity_audit")(spark, sf)
      .collect().find(_.getAs[String]("predicate") == "p3_range_price").get
    assert(rows("b001_bins").getAs[Long]("est_rows") ==
      p3.getAs[Long]("est_rows"))
  }

  // ---- q437 storage tiers --------------------------------------------

  test("q437 partitions the part catalog and recent reads land only in hot") {
    val rows = Lakehouse.queries("q437_storage_tiers")(spark, sf).collect()
      .map(r => r.getAs[String]("tier") -> r).toMap
    val li = graft.model.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey",
        "CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000 AS BIGINT) AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDay = li.map(_._2).max
    val perPart = li.groupBy(_._1).map { case (p, ds) =>
      (p, ds.map(_._2).max, ds.count(_._2 > maxDay - 90).toLong, ds.length.toLong)
    }
    assert(rows.values.map(_.getAs[Long]("n_parts")).sum == perPart.size.toLong)
    assert(rows.values.map(_.getAs[Long]("n_lines")).sum == li.length.toLong)
    def tierOf(lastDay: Long) =
      if (maxDay - lastDay <= 90) "a_hot"
      else if (maxDay - lastDay <= 365) "b_warm" else "c_cold"
    val expTiers = perPart.groupBy(p => tierOf(p._2))
    expTiers.foreach { case (tier, ps) =>
      assert(rows(tier).getAs[Long]("n_parts") == ps.size.toLong, tier)
      assert(rows(tier).getAs[Long]("recent_lines") == ps.map(_._3).sum, tier)
      assert(rows(tier).getAs[Long]("est_bytes") ==
        ps.map(_._4).sum * 64L, tier)
    }
    // safety law: anything read in the last 90 days is, by construction, hot
    rows.filterKeys(_ != "a_hot").values.foreach { r =>
      assert(r.getAs[Long]("recent_lines") == 0L,
        "cold/warm tiers must receive zero recent reads")
    }
  }

  // ---- q438 buffer sizing --------------------------------------------

  test("q438 batch census: conservation, ceil counts, nested max spans") {
    val rows = graft.ops.FlowQueries.queries("q438_buffer_sizing")(spark, sf)
      .collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("buf_size"))
      assert(sorted.map(_.getAs[Long]("buf_size")).toSeq ==
        Seq(100L, 1000L, 10000L))
      val recs = sorted.map(_.getAs[Long]("n_records"))
      assert(recs.distinct.length == 1, s"$t record conservation")
      sorted.foreach { r =>
        val (n, b) = (r.getAs[Long]("n_records"), r.getAs[Long]("buf_size"))
        assert(r.getAs[Long]("n_batches") == (n + b - 1) / b,
          s"$t ceil(n/B) batches")
      }
      // buffer sizes nest (100 | 1000 | 10000): every small batch is
      // contained in a big one, so the max span can only grow
      val spans = sorted.map(_.getAs[Long]("max_span_us"))
      assert(spans.zip(spans.tail).forall { case (a, b) => a <= b },
        s"$t max span must be monotone in buffer size")
    }
  }

  // ---- q439 WAV headroom ---------------------------------------------

  test("q439 replays the PCM pattern's peak/energy/clip census") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def clip(id: Long): (Long, Long, Long, Long) = {
      val n = (16 + id % 16).toInt
      val vs = (0 until n).map(k => ((id * 31 + k.toLong * 7919) % 65536) - 32768)
      (n.toLong, vs.map(math.abs).max, vs.map(v => v * v).sum,
        vs.count(v => math.abs(v) >= 32767).toLong)
    }
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val cs = ds.map(d => clip(d._1))
      src -> ((cs.length.toLong, cs.map(_._1).sum, cs.map(_._2).max,
        cs.map(_._3).sum, cs.map(_._4).sum))
    }
    val rows = Multimodal.queries("q439_wav_headroom")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val (nc, ns, pk, en, cl) = expected(r.getString(0))
      assert(r.getAs[Long]("n_clips") == nc)
      assert(r.getAs[Long]("n_samples") == ns)
      assert(r.getAs[Long]("peak") == pk, s"${r.getString(0)} peak")
      assert(r.getAs[Long]("sum_energy") == en, s"${r.getString(0)} energy")
      assert(r.getAs[Long]("n_clipped") == cl)
      assert(r.getAs[Long]("peak") <= 32768L)
    }
  }

  // ---- q440 session gap sweep ----------------------------------------

  test("q440 sessions and singletons are monotone non-increasing in the gap") {
    val rows = graft.ops.FlowQueries.queries("q440_session_gap_sweep")(spark, sf)
      .collect().sortBy(_.getAs[Long]("gap_seconds"))
    assert(rows.map(_.getAs[Long]("gap_seconds")).toSeq ==
      Seq(300L, 1800L, 7200L))
    assert(rows.map(_.getAs[Long]("n_events")).distinct.length == 1,
      "event conservation across gaps")
    val sess = rows.map(_.getAs[Long]("n_sessions"))
    assert(sess.zip(sess.tail).forall { case (a, b) => a >= b },
      "larger gap can only merge sessions")
    val single = rows.map(_.getAs[Long]("n_singletons"))
    assert(single.zip(single.tail).forall { case (a, b) => a >= b },
      "a singleton at a large gap is a singleton at every smaller gap")
    // replay the 1800 s row against a plain-Scala sessionizer
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bySess = ev.groupBy(_._1).values.flatMap { es =>
      val s0 = es.sortBy(e => (e._2, e._3))
      s0.zipWithIndex.foldLeft(List.empty[List[Long]]) {
        case (acc, ((_, us, _), i)) =>
          if (i == 0 || us - s0(i - 1)._2 > 1800000000L) List(us) :: acc
          else (us :: acc.head) :: acc.tail
      }
    }
    val mid = rows(1)
    assert(mid.getAs[Long]("n_sessions") == bySess.size.toLong)
    assert(mid.getAs[Long]("n_singletons") ==
      bySess.count(_.length == 1).toLong)
  }

  // ---- q441 join-order DP ----------------------------------------------

  test("q441 replays the Selinger audit's measured intermediates and ranks") {
    val rows = graft.ops.Stewardship.queries("q441_join_order_dp")(spark, sf)
      .collect()
    val byPlan = rows.map(r => r.getAs[String]("plan") -> r).toMap
    assert(byPlan.keySet == Set("plan_a_co_then_l", "plan_b_ol_then_c",
      "plan_c_cxl_then_o"))
    val cks = graft.model.Tables.customer(spark, sf)
      .filter("c_mktsegment = 'BUILDING'")
      .selectExpr("CAST(c_custkey AS BIGINT)").collect()
      .map(_.getLong(0)).toSet
    val ords = graft.model.Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderkey AS BIGINT)", "CAST(o_custkey AS BIGINT)",
        "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (lo, hi) = (ords.map(_._3).min, ords.map(_._3).max)
    val o = ords.filter(_._3 < lo + (hi - lo + 1) / 2)
    val okCount = graft.model.Tables.lineitem(spark, sf)
      .filter("l_returnflag = 'R'").selectExpr("CAST(l_orderkey AS BIGINT)")
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nl = okCount.values.sum
    val actA = o.count(t => cks(t._2)).toLong
    val actB = o.map(t => okCount.getOrElse(t._1, 0L)).sum
    val actF = o.filter(t => cks(t._2)).map(t => okCount.getOrElse(t._1, 0L)).sum
    assert(byPlan("plan_a_co_then_l").getAs[Long]("act_inter_rows") == actA)
    assert(byPlan("plan_b_ol_then_c").getAs[Long]("act_inter_rows") == actB)
    assert(byPlan("plan_c_cxl_then_o").getAs[Long]("act_inter_rows") ==
      cks.size.toLong * nl)
    rows.foreach { r =>
      assert(r.getAs[Long]("act_final_rows") == actF)
      assert(r.getAs[Long]("est_cost") ==
        r.getAs[Long]("est_inter_rows") + r.getAs[Long]("est_final_rows"))
      assert(r.getAs[Long]("act_cost") ==
        r.getAs[Long]("act_inter_rows") + r.getAs[Long]("act_final_rows"))
    }
    assert(rows.map(_.getAs[Long]("est_rank")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("act_rank")).sorted.toSeq == Seq(1L, 2L, 3L))
    // the cartesian-first order must price (and measure) worst
    assert(byPlan("plan_c_cxl_then_o").getAs[Long]("est_rank") == 3L)
    assert(byPlan("plan_c_cxl_then_o").getAs[Long]("act_rank") == 3L)
  }

  // ---- q442 eager pre-aggregation ---------------------------------------

  test("q442 rewrite preserves the aggregate and shrinks the shuffle") {
    val rows = graft.ops.Stewardship.queries("q442_eager_preagg")(spark, sf)
      .collect().sortBy(_.getAs[String]("strategy"))
    assert(rows.length == 2)
    val (naive, eager) = (rows(0), rows(1))
    assert(naive.getAs[String]("strategy") == "s1_join_then_agg")
    // the rewrite's correctness law: identical result both ways
    assert(naive.getAs[Long]("n_groups") == eager.getAs[Long]("n_groups"))
    assert(naive.getAs[Long]("total_cents") == eager.getAs[Long]("total_cents"))
    assert(eager.getAs[Long]("rows_shuffled") <=
      naive.getAs[Long]("rows_shuffled"))
    assert(naive.getAs[Long]("reduction_ppm") == 1000000L)
    assert(eager.getAs[Long]("reduction_ppm") <= 1000000L)
    // RI makes the rollup total the plain lineitem sum — replay it
    val total = graft.model.Tables.lineitem(spark, sf)
      .selectExpr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(_.getLong(0)).sum
    assert(naive.getAs[Long]("total_cents") == total)
  }

  // ---- q443 delta-of-delta encoding --------------------------------------

  test("q443 replays the Gorilla bit census per event type") {
    val rows = graft.ops.Stewardship.queries("q443_delta_encoding")(spark, sf)
      .collect()
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS us",
        "CAST(event_id AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (t, es) =>
      val us = es.sortBy(e => (e._2, e._3)).map(_._2)
      val dds = us.indices.map(i =>
        if (i == 0) None else Some(us(i) - us(i - 1)))
      val dods = us.indices.map(i =>
        if (i < 2) None else Some(dds(i).get - dds(i - 1).get))
      val bits = dods.map {
        case None => 64L
        case Some(0L) => 1L
        case Some(x) if x >= -63 && x <= 64 => 9L
        case Some(x) if x >= -255 && x <= 256 => 12L
        case Some(x) if x >= -2047 && x <= 2048 => 16L
        case _ => 36L
      }
      t -> bits
    }
    assert(rows.map(_.getString(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val bits = expected(r.getString(0))
      assert(r.getAs[Long]("n_points") == bits.length.toLong)
      assert(r.getAs[Long]("bits_total") == bits.sum)
      assert(r.getAs[Long]("n_raw") == bits.count(_ == 64L).toLong)
      assert(r.getAs[Long]("n_zero") == bits.count(_ == 1L).toLong)
      // bucket conservation + the exact weighted-bits identity
      assert(r.getAs[Long]("n_points") == r.getAs[Long]("n_raw") +
        r.getAs[Long]("n_zero") + r.getAs[Long]("n_b9") +
        r.getAs[Long]("n_b12") + r.getAs[Long]("n_b16") +
        r.getAs[Long]("n_b36"))
      assert(r.getAs[Long]("bits_total") == 64L * r.getAs[Long]("n_raw") +
        r.getAs[Long]("n_zero") + 9L * r.getAs[Long]("n_b9") +
        12L * r.getAs[Long]("n_b12") + 16L * r.getAs[Long]("n_b16") +
        36L * r.getAs[Long]("n_b36"))
      assert(r.getAs[Long]("raw_bits") == 64L * r.getAs[Long]("n_points"))
    }
  }

  // ---- q444 MOR vs COW ---------------------------------------------------

  test("q444 replays both strategies' write/read accounting") {
    val rows = graft.ops.Lakehouse.queries("q444_mor_vs_cow")(spark, sf)
      .collect().sortBy(_.getAs[String]("strategy"))
    assert(rows.length == 2)
    val (cow, mor) = (rows(0), rows(1))
    assert(cow.getAs[String]("strategy") == "s1_copy_on_write")
    // both strategies are audited at the same (bucket, epoch) points
    assert(cow.getAs[Long]("read_points") == mor.getAs[Long]("read_points"))
    assert(cow.getAs[Long]("read_files_total") == cow.getAs[Long]("read_points"))
    assert(mor.getAs[Long]("read_files_total") >= mor.getAs[Long]("read_points"))
    assert(mor.getAs[Long]("write_amp_ppm") == 1000000L)
    // plain-Scala replay over the collected stream
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id % 32 AS b", "user_id",
        "CAST(unix_micros(ts) div 86400000000 AS BIGINT) AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val width = ev.groupBy(_._1).map { case (b, es) =>
      b -> es.map(_._2).distinct.length.toLong
    }
    val daily = ev.groupBy(e => (e._1, e._3)).map { case (k, es) =>
      k -> es.length.toLong
    }
    val upserts = daily.values.sum
    val cowRows = daily.keys.toSeq.map { case (b, _) => width(b) }.sum
    val points = daily.keys.toSeq.map { case (b, day) => (b, day / 7) }.toSet
    val morFiles = points.size.toLong +
      daily.keys.size.toLong // 1 base per point + 1 delta per touched day
    assert(mor.getAs[Long]("write_bytes") == upserts * 64)
    assert(cow.getAs[Long]("write_bytes") == cowRows * 64)
    assert(cow.getAs[Long]("write_amp_ppm") == cowRows * 1000000L / upserts)
    assert(cow.getAs[Long]("read_points") == points.size.toLong)
    assert(mor.getAs[Long]("read_files_total") == morFiles)
  }

  // ---- q445 star components ----------------------------------------------

  test("q445 star CC agrees label-for-label with label propagation") {
    val star = Dedup.starComponents(Dedup.dupEdges(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.connectedComponents(Dedup.dupEdges(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop, "the two CC algorithms must agree exactly")
    val hist = Dedup.queries("q445_star_components")(spark, sf).collect()
    assert(hist.map(r =>
      r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")).sum ==
      star.size.toLong, "histogram mass must equal labeled nodes")
    assert(hist.map(_.getAs[Long]("n_docs")).sum == star.size.toLong)
    // every cluster label is its own minimum member
    star.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
  }

  test("q445 star CC labels a planted chain and a planted clique correctly") {
    import spark.implicits._
    // a 60-node path (diameter stress) plus a 10-node clique, disjoint
    val chain = (0L until 59L).map(i => (i, i + 1))
    val clique = for (a <- 100L to 109L; b <- (a + 1) to 109L) yield (a, b)
    val edges = (chain ++ clique).toDF("doc_a", "doc_b")
    val labels = Dedup.starComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 59L).foreach(n => assert(labels(n) == 0L))
    (100L to 109L).foreach(n => assert(labels(n) == 100L))
  }

  // ---- q446 shuffle sizing -------------------------------------------------

  test("q446 replays the shuffle statistics and its sizing laws hold") {
    val rows = graft.ops.Stewardship.queries("q446_shuffle_sizing")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[String]("shuffle")).toSeq ==
      Seq("s1_events_by_user", "s2_lineitem_by_orderkey",
        "s3_orders_by_custkey"))
    def replay(df: org.apache.spark.sql.DataFrame, key: String) = {
      val counts = df.selectExpr(s"CAST($key AS BIGINT)").collect()
        .map(_.getLong(0)).groupBy(identity).map(_._2.length.toLong)
      (counts.sum, counts.size.toLong, counts.max)
    }
    val expected = Seq(
      replay(graft.model.Tables.events(spark, sf), "user_id"),
      replay(graft.model.Tables.lineitem(spark, sf), "l_orderkey"),
      replay(graft.model.Tables.orders(spark, sf), "o_custkey"))
    rows.zip(expected).foreach { case (r, (n, k, mx)) =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_keys") == k)
      val w = r.getAs[Long]("total_bytes") / n
      assert(r.getAs[Long]("max_key_bytes") == mx * w)
      assert(r.getAs[Long]("parts_128mb") == (n * w + 134217727) / 134217728)
      assert(r.getAs[Long]("parts_32mb") >= r.getAs[Long]("parts_128mb"))
      assert(r.getAs[Long]("skew_ratio_ppm") >=
        r.getAs[Long]("max_key_share_ppm"))
    }
  }

  // ---- q447 OCC conflicts ---------------------------------------------------

  test("q447 replays the two-writer conflict census") {
    val rows = graft.ops.Stewardship.queries("q447_occ_conflicts")(spark, sf)
      .collect()
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(unix_micros(ts) div 3600000000 AS BIGINT) AS hr",
        "event_id % 2 AS w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cells = ev.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      k -> ((es.length.toLong, es.map(_._3).distinct.length))
    }
    val expected = cells.groupBy { case ((_, hr), _) => hr % 24 }
      .map { case (h, cs) =>
        h -> ((cs.size.toLong, cs.values.map(_._1).sum,
          cs.values.count(_._2 > 1).toLong))
      }
    assert(rows.map(_.getAs[Long]("hour_of_day")).toSet == expected.keySet)
    rows.foreach { r =>
      val (nc, ne, conf) = expected(r.getAs[Long]("hour_of_day"))
      assert(r.getAs[Long]("n_cells") == nc)
      assert(r.getAs[Long]("n_events") == ne)
      assert(r.getAs[Long]("n_conflicts") == conf)
      assert(r.getAs[Long]("conflict_ppm") == conf * 1000000L / nc)
    }
  }

  // ---- q448 A/B power planner ---------------------------------------------

  test("q448 sample sizes follow the rule of 16 and shrink with the MDE") {
    val rows = graft.ops.Stewardship.queries("q448_ab_power_planner")(spark, sf)
      .collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("mde_ppm"))
      assert(sorted.map(_.getAs[Long]("mde_ppm")).toSeq ==
        Seq(10000L, 20000L, 50000L))
      // one baseline per type; n shrinks as the detectable effect grows
      assert(sorted.map(_.getAs[Long]("base_rate_ppm")).distinct.length == 1)
      val ns = sorted.map(_.getAs[Long]("n_per_arm"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
      sorted.foreach { r =>
        val (p, m) = (r.getAs[Long]("base_rate_ppm"), r.getAs[Long]("mde_ppm"))
        assert(r.getAs[Long]("n_per_arm") ==
          16L * p * (1000000L - p) / (m * m))
        assert(r.getAs[Boolean]("feasible") ==
          (r.getAs[Long]("n_per_arm") * 2 <= r.getAs[Long]("n_users")))
      }
    }
  }

  // ---- q449 retry storm ------------------------------------------------------

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def writeEvents(rows: Seq[Row]): String = {
    val dir = Files.createTempDirectory("graft-audit-events").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q449 fires on planted redeliveries and stays quiet otherwise") {
    def ev(id: Long, ms: Long, u: Long, t: String, v: Double) =
      Row(id, new java.sql.Timestamp(ms), u, t, v, "{}")
    val t0 = 1700000000000L
    val dir = writeEvents(Seq(
      // user 1: identical (click, 1.0) 10 s apart -> 1 redelivery
      ev(1, t0, 1L, "click", 1.0), ev(2, t0 + 10000, 1L, "click", 1.0),
      // then 300 s later -> outside the window, NOT a redelivery
      ev(3, t0 + 310000, 1L, "click", 1.0),
      // user 2: 59 s apart -> redelivery; next 61 s after that -> not
      ev(4, t0, 2L, "click", 2.0), ev(5, t0 + 59000, 2L, "click", 2.0),
      ev(6, t0 + 120000, 2L, "click", 2.0),
      // same instant, different VALUE -> different payload, never a dup
      ev(7, t0, 3L, "view", 5.0), ev(8, t0 + 1000, 3L, "view", 6.0)))
    val out = graft.ops.Stewardship.queries("q449_retry_storm")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("click").getAs[Long]("n_events") == 6L)
    assert(out("click").getAs[Long]("n_redelivered") == 2L)
    assert(out("click").getAs[Long]("n_affected_users") == 2L)
    assert(out("click").getAs[Long]("redelivery_ppm") == 333333L)
    assert(out("view").getAs[Long]("n_redelivered") == 0L)
    assert(out("view").getAs[Long]("n_affected_users") == 0L)
  }

  test("q449 replays the corpus census in plain Scala") {
    val rows = graft.ops.Stewardship.queries("q449_retry_storm")(spark, sf)
      .collect()
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "value", "unix_micros(ts) AS us",
        "CAST(event_id AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    val expected = ev.groupBy(_._2).map { case (t, es) =>
      val dups = es.groupBy(e => (e._1, e._3)).toSeq.flatMap { case (_, ps) =>
        val us = ps.sortBy(p => (p._4, p._5))
        us.zip(us.tail).filter { case (a, b) => b._4 - a._4 <= 60000000L }
          .map(_._2)
      }
      t -> ((es.length.toLong, dups.length.toLong,
        dups.map(_._1).distinct.length.toLong))
    }
    rows.foreach { r =>
      val (n, nd, nu) = expected(r.getString(0))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("n_redelivered") == nd)
      assert(r.getAs[Long]("n_affected_users") == nu)
    }
  }

  // ---- q450 tokenizer fertility ---------------------------------------------

  test("q450 replays the per-language BPE fertility census") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // induce the same top-8 merges over the pooled corpus
    val pairs = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, _, text) =>
      text.split(" ", -1).filter(_.length >= 2).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          pairs(p) = pairs.getOrElse(p, 0L) + 1L
        }
      }
    }
    val merges = pairs.toSeq.sortBy { case (p, c) => (-c, p) }.take(8).map(_._1)
    val S = "\u001f"
    def encTokens(w: String): Long = {
      var s = w.flatMap(c => s"$S$c$S")
      merges.foreach { m =>
        s = s.replace(s"$S${m(0)}$S$S${m(1)}$S", s"$S$m$S")
      }
      (s.length - s.replace(S, "").length).toLong / 2
    }
    val expected = docs.filter(_._1 % 7 == 0).groupBy(_._2)
      .map { case (lang, ds) =>
        val ws = ds.flatMap(_._3.split(" ", -1))
        lang -> ((ws.length.toLong, ws.map(_.length.toLong).sum,
          ws.map(encTokens).sum))
      }
    val rows = graft.ops.Corpus.queries("q450_tokenizer_fertility")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val (nw, nc, nt) = expected(r.getString(0))
      assert(r.getAs[Long]("n_words") == nw, s"${r.getString(0)} words")
      assert(r.getAs[Long]("n_chars") == nc, s"${r.getString(0)} chars")
      assert(r.getAs[Long]("n_tokens") == nt, s"${r.getString(0)} tokens")
      // a word is at least one token; a token covers at least one char
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L)
      assert(r.getAs[Long]("chars_per_token_ppm") >= 1000000L)
    }
  }

  // ---- q451 straggler makespan -----------------------------------------------

  test("q451 replays the hash-assignment makespan table") {
    val shards = graft.model.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_orderkey % 128 AS BIGINT)").collect()
      .map(_.getLong(0)).groupBy(identity).map { case (k, v) =>
        k -> v.length.toLong
      }
    val rows = graft.ops.Stewardship.queries("q451_straggler_makespan")(spark, sf)
      .collect().sortBy(_.getAs[Long]("w"))
    assert(rows.map(_.getAs[Long]("w")).toSeq == Seq(4L, 8L, 16L))
    rows.foreach { r =>
      val w = r.getAs[Long]("w")
      val loads = shards.groupBy { case (s0, _) => s0 % w }
        .map { case (_, ss) => ss.values.sum }
      assert(r.getAs[Long]("n_workers") == w)
      assert(r.getAs[Long]("total_rows") == loads.sum)
      assert(r.getAs[Long]("makespan_rows") == loads.max)
      assert(r.getAs[Long]("makespan_rows") >= r.getAs[Long]("lower_bound"))
      assert(r.getAs[Long]("efficiency_ppm") <= 1000000L)
      assert(r.getAs[Long]("imbalance_ppm") >= 1000000L)
    }
  }

  // ---- q452 grouping NDV -------------------------------------------------------

  test("q452 replays the subset-lattice NDVs and the independence bound") {
    val o = graft.model.Tables.orders(spark, sf)
      .selectExpr("o_orderpriority", "o_orderstatus",
        "CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val (va, vb, vc) = (o.map(_._1).distinct.length.toLong,
      o.map(_._2).distinct.length.toLong, o.map(_._3).distinct.length.toLong)
    val expected = Map(
      "g1_priority" -> ((va, va)), "g2_status" -> ((vb, vb)),
      "g3_year" -> ((vc, vc)),
      "g4_priority_status" -> ((o.map(t => (t._1, t._2)).distinct.length.toLong, va * vb)),
      "g5_priority_year" -> ((o.map(t => (t._1, t._3)).distinct.length.toLong, va * vc)),
      "g6_status_year" -> ((o.map(t => (t._2, t._3)).distinct.length.toLong, vb * vc)),
      "g7_all_three" -> ((o.distinct.length.toLong, va * vb * vc)))
    val rows = graft.ops.Stewardship.queries("q452_grouping_ndv")(spark, sf)
      .collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val (m, f) = expected(r.getString(0))
      assert(r.getAs[Long]("measured_ndv") == m, r.getString(0))
      assert(r.getAs[Long]("forecast_ndv") == math.min(f, o.length.toLong))
      // a tuple NDV never exceeds the independence forecast
      assert(r.getAs[Long]("correlation_ppm") <= 1000000L)
    }
  }

  // ---- q453 cache sizing ---------------------------------------------------------

  test("q453 replays the MFU hit-rate curve and its monotonicity") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.ops.Stewardship.queries("q453_cache_sizing")(spark, sf)
      .collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      val hits = ev.filter(_._1 == t).groupBy(_._2)
        .map { case (u, es) => (u, es.length.toLong) }.toSeq
        .sortBy { case (u, h) => (-h, u) }
      val total = hits.map(_._2).sum
      val sorted = rs.sortBy(_.getAs[Long]("cache_size"))
      assert(sorted.map(_.getAs[Long]("cache_size")).toSeq ==
        Seq(8L, 64L, 512L))
      sorted.foreach { r =>
        val c = r.getAs[Long]("cache_size").toInt
        assert(r.getAs[Long]("n_keys") == hits.length.toLong)
        assert(r.getAs[Long]("n_accesses") == total)
        assert(r.getAs[Long]("hot_accesses") == hits.take(c).map(_._2).sum)
        assert(r.getAs[Long]("cached_keys") ==
          math.min(c.toLong, hits.length.toLong))
      }
      val ppms = sorted.map(_.getAs[Long]("hit_ppm"))
      assert(ppms.zip(ppms.tail).forall { case (a, b) => a <= b },
        s"$t hit rate must grow with cache size")
    }
  }

  // ---- q454 salt factor sweep --------------------------------------------------

  test("q454 replays the salt tradeoff: balance improves, overhead grows") {
    val counts = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id").collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val rows = graft.ops.Stewardship.queries("q454_salt_factor_sweep")(spark, sf)
      .collect().sortBy(_.getAs[Long]("salt"))
    assert(rows.map(_.getAs[Long]("salt")).toSeq == Seq(1L, 4L, 16L))
    rows.foreach { r =>
      val sSalt = r.getAs[Long]("salt")
      assert(r.getAs[Long]("n_keys") == counts.length.toLong)
      assert(r.getAs[Long]("n_rows") == counts.sum)
      assert(r.getAs[Long]("max_key_rows") == counts.max)
      assert(r.getAs[Long]("max_shard_rows") ==
        counts.map(c => (c + sSalt - 1) / sSalt).max)
      assert(r.getAs[Long]("partial_rows") ==
        counts.map(c => math.min(sSalt, c)).sum)
    }
    assert(rows.head.getAs[Long]("balance_gain_ppm") == 1000000L)
    assert(rows.head.getAs[Long]("overhead_ppm") == 1000000L)
    val gains = rows.map(_.getAs[Long]("balance_gain_ppm"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      "more salt can only shrink the hottest shard")
    val over = rows.map(_.getAs[Long]("overhead_ppm"))
    assert(over.zip(over.tail).forall { case (a, b) => a <= b },
      "more salt can only add re-combine partials")
  }

  // ---- q455 checkpoint interval -----------------------------------------------

  test("q455 replay/write-mass curves move oppositely in the interval") {
    val rows = graft.ops.Stewardship.queries("q455_checkpoint_interval")(spark, sf)
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("interval_s"))
      assert(sorted.map(_.getAs[Long]("interval_s")).toSeq ==
        Seq(10L, 60L, 600L))
      val (n, k, span) = (sorted.head.getAs[Long]("n_events"),
        sorted.head.getAs[Long]("state_keys"),
        sorted.head.getAs[Long]("span_s"))
      sorted.foreach { r =>
        val i = r.getAs[Long]("interval_s")
        assert(r.getAs[Long]("replay_rows_worst") == n * i / span, s"$t replay")
        assert(r.getAs[Long]("state_rows_per_hour") == k * 3600 / i, s"$t state")
      }
      val rep = sorted.map(_.getAs[Long]("replay_rows_worst"))
      assert(rep.zip(rep.tail).forall { case (a, b) => a <= b })
      val wr = sorted.map(_.getAs[Long]("state_rows_per_hour"))
      assert(wr.zip(wr.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---- q456 IVF shard balance ----------------------------------------------------

  test("q456 round-robin placement beats the aliased hash placement") {
    val rows = graft.ops.Similarity.queries("q456_ivf_shard_balance")(spark, sf)
      .collect().sortBy(_.getAs[String]("strategy"))
    assert(rows.length == 2)
    val (hash, rr) = (rows(0), rows(1))
    assert(hash.getAs[String]("strategy") == "s1_hash_assign")
    // both place every vector
    assert(hash.getAs[Long]("total_vecs") == rr.getAs[Long]("total_vecs"))
    // quantizer cell ids are multiples of 50 — even mod 8, so hash
    // placement uses only half the shards; round-robin uses all 8
    assert(hash.getAs[Long]("n_shards_used") <= 4L)
    assert(rr.getAs[Long]("n_shards_used") == 8L)
    assert(rr.getAs[Long]("max_shard") <= hash.getAs[Long]("max_shard"))
    assert(rr.getAs[Long]("imbalance_ppm") <=
      hash.getAs[Long]("imbalance_ppm"))
    rows.foreach(r => assert(r.getAs[Long]("imbalance_ppm") >= 1000000L))
  }

  // ---- q457 cluster consensus ---------------------------------------------------

  test("q457 replays the union/core shingle census per q65 cluster") {
    val labels = Dedup.connectedComponents(Dedup.dupEdges(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def shingles(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = labels.groupBy(_._2).map { case (label, members) =>
      val shs = members.keys.toSeq.map(id => shingles(docs(id)))
      label -> ((members.size.toLong, shs.reduce(_ union _).size.toLong,
        shs.reduce(_ intersect _).size.toLong))
    }
    val rows = Dedup.queries("q457_cluster_consensus")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("cluster_id")).toSet == expected.keySet)
    rows.foreach { r =>
      val (nm, uni, core) = expected(r.getAs[Long]("cluster_id"))
      assert(r.getAs[Long]("n_members") == nm)
      assert(r.getAs[Long]("n_union_shingles") == uni)
      assert(r.getAs[Long]("n_core_shingles") == core)
      assert(core <= uni)
      assert(r.getAs[Long]("core_share_ppm") <= 1000000L)
    }
  }

  // ---- q458 peak backlog ------------------------------------------------------------

  test("q458 replays the Lindley backlog walk; more capacity never hurts") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(unix_micros(ts) div 3600000000 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.ops.Stewardship.queries("q458_peak_backlog")(spark, sf)
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val hrs = ev.filter(_._1 == t).map(_._2)
      val (lo, hi) = (hrs.min, hrs.max)
      val counts = hrs.groupBy(identity).map { case (h, v) => h -> v.length.toLong }
      val tot = hrs.length.toLong
      val nHours = hi - lo + 1
      val sorted = rs.sortBy(_.getAs[Long]("c_tenths"))
      assert(sorted.map(_.getAs[Long]("c_tenths")).toSeq == Seq(10L, 15L, 20L))
      sorted.foreach { r =>
        val cap = math.max(tot * r.getAs[Long]("c_tenths") / (10 * nHours), 1L)
        var (bl, peak, over) = (0L, 0L, 0L)
        (lo to hi).foreach { h =>
          val a = counts.getOrElse(h, 0L)
          if (a > cap) over += 1
          bl = math.max(0L, bl + a - cap)
          peak = math.max(peak, bl)
        }
        assert(r.getAs[Long]("n_hours") == nHours, s"$t hours")
        assert(r.getAs[Long]("capacity_per_hour") == cap, s"$t cap")
        assert(r.getAs[Long]("hours_over") == over, s"$t over")
        assert(r.getAs[Long]("peak_backlog") == peak, s"$t peak")
      }
      val peaks = sorted.map(_.getAs[Long]("peak_backlog"))
      assert(peaks.zip(peaks.tail).forall { case (a, b) => a >= b })
      val overs = sorted.map(_.getAs[Long]("hours_over"))
      assert(overs.zip(overs.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---- q459 top-k + other --------------------------------------------------------------

  test("q459 conserves per-source mass and bounds the output") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = graft.ops.Extras.queries("q459_topk_other")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.length <= 4, s"$src emits at most top-3 + other")
      val mass = docs.count(_._1 == src).toLong
      assert(rs.map(_.getAs[Long]("n_docs")).sum == mass,
        s"$src tail is aggregated, not dropped")
      val perLang = docs.filter(_._1 == src).groupBy(_._2)
        .map(_._2.length.toLong).toSeq.sortBy(-_)
      val top = rs.filter(_.getAs[String]("bucket") != "zz_other")
      assert(top.map(_.getAs[Long]("n_docs")).sorted.reverse.toSeq ==
        perLang.take(top.length))
      top.foreach(r => assert(r.getAs[Long]("n_langs") == 1L))
    }
  }

  // ---- q460 watermark completeness ------------------------------------------------

  test("q460 replays the drop census; a longer watermark only helps") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(event_id AS BIGINT)",
        "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = graft.ops.Quality.queries("q460_watermark_completeness")(spark, sf)
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val ordered = ev.filter(_._1 == t).sortBy(_._2).map(_._3)
      val lates = ordered.zipWithIndex.map { case (us, i) =>
        if (i == 0) 0L
        else math.max(0L, (ordered.take(i).max - us) / 1000000L)
      }
      val sorted = rs.sortBy(_.getAs[Long]("watermark_s"))
      assert(sorted.map(_.getAs[Long]("watermark_s")).toSeq ==
        Seq(60L, 3600L, 86400L))
      sorted.foreach { r =>
        val d = r.getAs[Long]("watermark_s")
        assert(r.getAs[Long]("n_events") == ordered.length.toLong)
        assert(r.getAs[Long]("n_dropped") == lates.count(_ > d).toLong,
          s"$t at $d s")
      }
      val comp = sorted.map(_.getAs[Long]("completeness_ppm"))
      assert(comp.zip(comp.tail).forall { case (a, b) => a <= b })
    }
  }

  // ---- q461 embedding drift ----------------------------------------------------------

  test("q461 replays the split-cohort centroid shift in exact fixed point") {
    val em = graft.model.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(label AS STRING)",
        "transform(embedding, x -> CAST(x AS DOUBLE))")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Double](2)))
    val rows = graft.ops.Similarity.queries("q461_embedding_drift")(spark, sf)
      .collect()
    val byLabel = em.groupBy(_._2)
    rows.foreach { r =>
      val label = String.valueOf(r.get(0))
      val (a, b) = byLabel(label).partition(v =>
        java.lang.Long.parseLong(md5hex(s"cohort:${v._1}").take(8), 16) % 2 == 0)
      def sums(vs: Array[(Long, String, Seq[Double])]): Array[Long] = {
        val dim = vs.head._3.length
        val out = Array.fill(dim)(0L)
        vs.foreach(v => v._3.zipWithIndex.foreach { case (x, i) =>
          out(i) += math.floor(x * 1000000 + 0.5).toLong
        })
        out
      }
      val (sa, sb) = (sums(a), sums(b))
      val shifts = sa.indices.map(i =>
        (BigInt(sa(i)) * b.length - BigInt(sb(i)) * a.length).abs /
          (BigInt(a.length) * b.length))
      assert(r.getAs[Long]("n_a") == a.length.toLong)
      assert(r.getAs[Long]("n_b") == b.length.toLong)
      assert(r.getAs[Long]("shift_l1_micro") == shifts.sum.toLong, label)
      assert(r.getAs[Long]("max_dim_shift") == shifts.max.toLong)
      val worst = shifts.indices.map(i => shifts(i) * 1000 + i).max % 1000
      assert(r.getAs[Long]("worst_dim") == worst.toLong)
    }
  }

  // ---- q462 behavioral re-identification ----------------------------------------------

  test("q462 replays the fingerprint k-anonymity census") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us",
        "CAST(event_id AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val fps = ev.groupBy(_._1).map { case (_, es) =>
      val s3 = es.sortBy(e => (e._3, e._4)).take(3)
      val ts = (0 until 3).map(i =>
        if (i < s3.length) s3(i)._2 else "_")
      val h6 = (s3.head._3 / 3600000000L) % 24 / 6
      s"${ts(0)}>${ts(1)}>${ts(2)}>$h6"
    }.toSeq
    val classes = fps.groupBy(identity).map(_._2.size.toLong)
    def cls(k: Long) = if (k == 1) "a_unique" else if (k <= 4) "b_2_to_4"
      else if (k <= 9) "c_5_to_9" else "d_10_plus"
    val expected = classes.groupBy(cls).map { case (c, ks) =>
      c -> ((ks.size.toLong, ks.sum))
    }
    val rows = graft.ops.Stewardship.queries("q462_behavior_reident")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet == expected.keySet)
    assert(rows.map(_.getAs[Long]("n_users")).sum == fps.length.toLong,
      "census conserves users")
    rows.foreach { r =>
      val (nf, nu) = expected(r.getString(0))
      assert(r.getAs[Long]("n_fingerprints") == nf, r.getString(0))
      assert(r.getAs[Long]("n_users") == nu, r.getString(0))
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- q463 hash avalanche --------------------------------------------------------

  test("q463 replays the per-bit ones census of the neutral hash") {
    val ids = graft.model.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val hs = ids.map(id => java.lang.Long.parseLong(
      md5hex(id.toString).take(8), 16))
    val rows = Dedup.queries("q463_hash_avalanche")(spark, sf).collect()
    assert(rows.length == 32)
    rows.foreach { r =>
      val bit = r.getAs[Long]("bit").toInt
      val ones = hs.count(h => ((h >> bit) & 1L) == 1L).toLong
      assert(r.getAs[Long]("n") == ids.length.toLong)
      assert(r.getAs[Long]("n_ones") == ones, s"bit $bit")
      assert(r.getAs[Long]("bias_ppm") ==
        math.abs(ones * 1000000L / ids.length - 500000L))
    }
  }

  // ---- q464 split balance ----------------------------------------------------------

  test("q464 replays the 8/1/1 split census and conserves per-source mass") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def splitOf(id: Long): String = {
      val b = java.lang.Long.parseLong(md5hex(s"split:$id").take(8), 16) % 10
      if (b <= 7) "train" else if (b == 8) "val" else "test"
    }
    val expected = docs.groupBy(d => (d._2, splitOf(d._1)))
      .map { case (k, v) => k -> v.length.toLong }
    val rows = Dedup.queries("q464_split_balance")(spark, sf).collect()
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n_docs") == expected(k), k.toString)
    }
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("n_docs")).sum ==
        docs.count(_._2 == src).toLong, src)
    }
  }

  // ---- q465 HLL precision ladder -----------------------------------------------------

  test("q465 replays the raw HLL estimate at every precision rung") {
    val users = graft.model.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
    val hs = users.map(u => java.lang.Long.parseLong(
      md5hex(u.toString).take(15), 16))
    val rhos = hs.map { h =>
      val v = h / 256
      if (v == 0) 53L else 53L - java.lang.Long.toBinaryString(v).length
    }
    val exact = users.distinct.length.toLong
    val alphas = Map(16 -> 673000L, 64 -> 709000L, 256 -> 718274L)
    val rows = graft.ops.Pipeline.queries("q465_hll_precision_ladder")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("m")).toSeq == Seq(16L, 64L, 256L))
    rows.foreach { r =>
      val m = r.getAs[Long]("m").toInt
      val reg = hs.indices.groupBy(i => hs(i) % m)
        .map { case (b, is) => b -> is.map(rhos).max }
      val sOcc = reg.values.map(rho => BigInt(1) << (60 - rho.toInt)).sum
      val sAll = sOcc + BigInt(m - reg.size) * (BigInt(1) << 60)
      val est = (BigInt(alphas(m)) * m * m * (BigInt(1) << 60)) /
        (sAll * 1000000)
      assert(r.getAs[Long]("n_empty") == (m - reg.size).toLong, s"m=$m")
      assert(r.getAs[Long]("hll_raw_est") == est.toLong, s"m=$m estimate")
      assert(r.getAs[Long]("n_exact") == exact)
      assert(r.getAs[Long]("hll_raw_est") > 0L)
    }
  }

  // ---- q466 Jain fairness ------------------------------------------------------------

  test("q466 replays the daily Jain index and its 1/k..1 bounds") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)",
        "event_type").collect().map(r => (r.getLong(0), r.getString(1)))
    val perDay = ev.groupBy(_._1).map { case (day, es) =>
      val xs = es.groupBy(_._2).map(_._2.length.toLong).toSeq
      val j = (BigInt(xs.sum) * xs.sum * 1000000 /
        (xs.length * xs.map(x => BigInt(x) * x).sum)).toLong
      (day, xs.length, j)
    }.toSeq
    val rows = graft.ops.Stewardship.queries("q466_jain_fairness")(spark, sf)
      .collect()
    rows.foreach { r =>
      val k = r.getAs[Long]("k_types").toInt
      val js = perDay.filter(_._2 == k).map(_._3)
      assert(r.getAs[Long]("n_days") == js.length.toLong, s"k=$k")
      assert(r.getAs[Long]("mean_j_ppm") == js.sum / js.length, s"k=$k mean")
      assert(r.getAs[Long]("worst_j_ppm") == js.min)
      assert(r.getAs[Long]("best_j_ppm") == js.max)
      assert(r.getAs[Long]("worst_j_ppm") >= r.getAs[Long]("floor_j_ppm"))
      assert(r.getAs[Long]("best_j_ppm") <= 1000000L)
    }
  }

  // ---- q467 headroom canary ------------------------------------------------------------

  test("q467 bit arithmetic matches the n-times-max bound") {
    val rows = graft.ops.Stewardship.queries("q467_headroom_canary")(spark, sf)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val bitsV = 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(r.getAs[Long]("max_abs"), 1L))
      val bitsN = 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(r.getAs[Long]("n_rows"), 1L))
      assert(r.getAs[Long]("value_bits") == bitsV.toLong, r.getString(0))
      assert(r.getAs[Long]("sum_bits_bound") == (bitsV + bitsN).toLong)
      assert(r.getAs[Long]("sum_headroom_doublings") ==
        (62 - bitsV - bitsN).toLong)
    }
    // at test SFs nothing may be within a doubling of overflow
    rows.foreach(r => assert(r.getAs[Long]("sum_headroom_doublings") > 1L))
  }

  // ---- q468 peak rate --------------------------------------------------------------------

  test("q468 replays the trailing-60s peak with a two-pointer mirror") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.ops.Stewardship.queries("q468_peak_rate")(spark, sf)
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val us = ev.filter(_._1 == t).map(_._2).sorted
      var (lo, peak) = (0, 0L)
      us.indices.foreach { hi =>
        while (us(hi) - us(lo) > 59999999L) lo += 1
        peak = math.max(peak, (hi - lo + 1).toLong)
      }
      assert(r.getAs[Long]("n_events") == us.length.toLong, t)
      assert(r.getAs[Long]("peak_60s") == peak, s"$t peak")
      assert(r.getAs[Long]("peak_60s") >= 1L)
      assert(r.getAs[Long]("burst_ratio_ppm") >= 1000000L ||
        r.getAs[Long]("mean_per_60s") > r.getAs[Long]("peak_60s"))
    }
  }

  // ---- q469 epoch shuffle ---------------------------------------------------------

  test("q469 replays the adjacency-repeat census across two epoch orders") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def order(e: Int, ids: Seq[Long]): Seq[Long] =
      ids.sortBy(id => (java.lang.Long.parseLong(
        md5hex(s"epoch$e:$id").take(8), 16), id))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val ids = ds.map(_._2).toSeq
      def pairs(e: Int) = {
        val o = order(e, ids)
        o.zip(o.tail).map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .toSet
      }
      src -> ((ids.length.toLong, (pairs(0) intersect pairs(1)).size.toLong))
    }
    val rows = graft.ops.Curation.queries("q469_epoch_shuffle")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val (n, rep) = expected(r.getString(0))
      assert(r.getAs[Long]("n_docs") == n, r.getString(0))
      assert(r.getAs[Long]("n_repeats") == rep, r.getString(0))
      assert(r.getAs[Long]("repeat_ppm") ==
        rep * 1000000L / math.max(n - 1, 1L))
    }
  }

  // ---- q470 code detector -----------------------------------------------------------

  test("q470 stays quiet on the prose corpus and fires on planted code") {
    val quiet = graft.ops.TextAnalysis.queries("q470_code_detector")(spark, sf)
      .collect()
    assert(quiet.nonEmpty)
    quiet.foreach(r => assert(r.getAs[Long]("code_ppm") == 0L,
      s"${r.getString(0)} must not flag prose as code"))
    // planted fixture: two code-shaped docs + one prose doc per source
    val dir = writeDocs(Seq(
      doc(1, "def f(x) { return g[x] <= h(x); } // #1 y = (a < b);", "en", "s1"),
      doc(2, "for (i = 0; i < n; i++) { acc[i] = f(i) > 0 ? x : y; }", "en", "s1"),
      doc(3, "plain prose text with ordinary words and no markup at all", "en", "s1")))
    val fired = graft.ops.TextAnalysis.queries("q470_code_detector")(spark, dir)
      .collect()
    assert(fired.length == 1)
    assert(fired.head.getAs[Long]("n_docs") == 3L)
    assert(fired.head.getAs[Long]("n_code") == 2L,
      "both planted code docs must flag")
    assert(fired.head.getAs[Long]("code_ppm") == 666666L)
  }

  // ---- q471 sampling bias ------------------------------------------------------------

  test("q471 replays the exact sample-vs-full KS distance per source") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = graft.ops.Curation.queries("q471_sampling_bias")(spark, sf)
      .collect()
    rows.foreach { r =>
      val src = r.getString(0)
      val ds = docs.filter(_._1 == src)
      val samp = ds.filter(d => java.lang.Long.parseLong(
        md5hex(s"samp:${d._2}").take(8), 16) % 16 == 0)
      val values = ds.map(_._3).distinct.sorted
      val (tf, ts) = (ds.length.toLong, samp.length.toLong)
      val d = values.map { v =>
        val cf = ds.count(_._3 <= v).toLong
        val cs = samp.count(_._3 <= v).toLong
        ((BigInt(cs) * tf - BigInt(cf) * ts).abs * 1000000 /
          (BigInt(tf) * ts.max(1L))).toLong
      }.max
      assert(r.getAs[Long]("n_full") == tf, src)
      assert(r.getAs[Long]("n_sample") == ts, src)
      assert(r.getAs[Long]("ks_ppm") == d, s"$src KS")
    }
  }

  // ---- q472 LSH parameter planner -----------------------------------------------------

  test("q472 replays the banding probability chains and their shape laws") {
    val rows = graft.ops.Dedup.queries("q472_lsh_param_planner")(spark, sf)
      .collect()
    assert(rows.length == 15)
    def chainPow(x0: Long, base: Long, k: Int): Long =
      (1 until k).foldLeft(x0)((x, _) => x * base / 1000000L)
    rows.foreach { r =>
      val (tau, rr, b) = (r.getAs[Long]("tau_ppm"),
        r.getAs[Long]("rows_r").toInt, r.getAs[Long]("bands_b").toInt)
      val tr = chainPow(tau, tau, rr)
      val miss = chainPow(1000000L - tr, 1000000L - tr, b)
      assert(r.getAs[Long]("recall_ppm") == 1000000L - miss,
        s"tau=$tau r=$rr b=$b")
      assert(r.getAs[Boolean]("meets_90") ==
        (r.getAs[Long]("recall_ppm") >= 900000L))
    }
    // at fixed signature size, recall falls as rows-per-band grows
    rows.groupBy(_.getAs[Long]("tau_ppm")).foreach { case (tau, rs) =>
      val byR = rs.sortBy(_.getAs[Long]("rows_r"))
        .map(_.getAs[Long]("recall_ppm"))
      assert(byR.zip(byR.tail).forall { case (a, b) => a >= b },
        s"tau=$tau recall must be non-increasing in r")
    }
    // the shipped (4, 4) plan must capture dedup-grade pairs
    val ship = rows.find(r => r.getAs[Long]("rows_r") == 4L &&
      r.getAs[Long]("tau_ppm") == 900000L).get
    assert(ship.getAs[Boolean]("meets_90"),
      "(4,4) at tau=0.9 is the plan this engine ships — it must pass")
  }

  // ---- q473 predicate order ------------------------------------------------------------

  test("q473 replays the joint-cell costs; ranks are a permutation") {
    val li = graft.model.Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag", "CAST(l_quantity AS BIGINT)",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (lo, hi) = (li.map(_._3).min, li.map(_._3).max)
    val t = lo + (hi - lo + 1) / 4
    def s(is: Int*) = li.count { x =>
      val f = Seq(x._1 == "R", x._2 < 25, x._3 < t)
      is.forall(f)
    }.toLong
    val n = li.length.toLong
    val expected = Map(
      "o1_p1_p2_p3" -> (n + s(0) + s(0, 1)), "o2_p1_p3_p2" -> (n + s(0) + s(0, 2)),
      "o3_p2_p1_p3" -> (n + s(1) + s(0, 1)), "o4_p2_p3_p1" -> (n + s(1) + s(1, 2)),
      "o5_p3_p1_p2" -> (n + s(2) + s(0, 2)), "o6_p3_p2_p1" -> (n + s(2) + s(1, 2)))
    val rows = graft.ops.Stewardship.queries("q473_predicate_order")(spark, sf)
      .collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("cost_rows") == expected(r.getString(0)),
        r.getString(0))
      assert(r.getAs[Long]("out_rows") == s(0, 1, 2))
      assert(r.getAs[Long]("stage1_rows") == n)
    }
    assert(rows.map(_.getAs[Long]("cost_rank")).sorted.toSeq ==
      (1L to 6L).toSeq)
  }

  // ---- q474 anomaly consensus -------------------------------------------------------------

  test("q474 replays the three detector votes on the zero-filled grid") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(unix_micros(ts) div 86400000000 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.ops.Stewardship.queries("q474_anomaly_consensus")(spark, sf)
      .collect()
    rows.foreach { r =>
      val tpe = r.getString(0)
      val hs = ev.filter(_._1 == tpe).map(_._2)
      val (lo, hi) = (hs.min, hs.max)
      val counts = hs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val ns = (lo to hi).map(dd => counts.getOrElse(dd, 0L))
      def rankMid(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
      val med = rankMid(ns)
      val mad = rankMid(ns.map(x => math.abs(x - med)))
      var (nm, nr, nb, c2, c3) = (0L, 0L, 0L, 0L, 0L)
      ns.indices.foreach { i =>
        val x = ns(i)
        val vMad = if (math.abs(x - med) > 3 * mad) 1 else 0
        val vRec = if (i > 0 && x > ns.take(i).max) 1 else 0
        val w = ns.slice(math.max(0, i - 7), i)
        val vBur = if (w.length >= 3 && x * w.length > 2 * w.sum) 1 else 0
        nm += vMad; nr += vRec; nb += vBur
        val v = vMad + vRec + vBur
        if (v >= 2) c2 += 1
        if (v == 3) c3 += 1
      }
      assert(r.getAs[Long]("n_days") == (hi - lo + 1), tpe)
      assert(r.getAs[Long]("n_mad") == nm, s"$tpe mad")
      assert(r.getAs[Long]("n_record") == nr, s"$tpe record")
      assert(r.getAs[Long]("n_burst") == nb, s"$tpe burst")
      assert(r.getAs[Long]("n_consensus2") == c2)
      assert(r.getAs[Long]("n_consensus3") == c3)
    }
  }

  // ---- q475 runtime filter ------------------------------------------------------------

  test("q475 replays the per-segment admit counts at both hops") {
    val segOf = graft.model.Tables.customer(spark, sf)
      .selectExpr("CAST(c_custkey AS BIGINT)", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = graft.model.Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderkey AS BIGINT)", "CAST(o_custkey AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val okSeg = orders.map { case (ok, ck) => ok -> segOf.get(ck) }.toMap
    val lines = graft.model.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_orderkey AS BIGINT)").collect().map(_.getLong(0))
    val rows = graft.ops.Stewardship.queries("q475_runtime_filter")(spark, sf)
      .collect()
    rows.foreach { r =>
      val sg = r.getString(0)
      assert(r.getAs[Long]("n_orders") == orders.length.toLong)
      assert(r.getAs[Long]("orders_admitted") ==
        orders.count(o => segOf.get(o._2).contains(sg)).toLong, sg)
      assert(r.getAs[Long]("n_lines") == lines.length.toLong)
      assert(r.getAs[Long]("lines_admitted") ==
        lines.count(ok => okSeg.get(ok).flatten.contains(sg)).toLong, sg)
      assert(r.getAs[Long]("lines_admit_ppm") <= 1000000L)
    }
    // segments partition the fact mass: admits sum to the totals
    assert(rows.map(_.getAs[Long]("orders_admitted")).sum ==
      orders.length.toLong)
    assert(rows.map(_.getAs[Long]("lines_admitted")).sum ==
      lines.length.toLong)
  }

  // ---- q476 agg spill forecast ----------------------------------------------------------

  test("q476 replays the per-reducer key census at both widths") {
    def replay(keys: Seq[Long], p: Long): (Long, Long, Long) = {
      val perKey = keys.groupBy(identity).toSeq.map { case (k, v) =>
        (java.lang.Long.parseLong(md5hex(k.toString).take(8), 16) % p,
          v.length.toLong)
      }
      val byRed = perKey.groupBy(_._1)
      (perKey.length.toLong,
        byRed.map(_._2.length.toLong).max,
        byRed.map(_._2.map(_._2).sum).max)
    }
    val evKeys = graft.model.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0)).toSeq
    val liKeys = graft.model.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_partkey AS BIGINT)").collect().map(_.getLong(0)).toSeq
    val rows = graft.ops.Stewardship.queries("q476_agg_spill_forecast")(spark, sf)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val keys = if (r.getString(0).startsWith("k1")) evKeys else liKeys
      val (nk, mk, mr) = replay(keys, r.getAs[Long]("p"))
      assert(r.getAs[Long]("n_keys") == nk, r.getString(0))
      assert(r.getAs[Long]("max_reducer_keys") == mk,
        s"${r.getString(0)} p=${r.getAs[Long]("p")}")
      assert(r.getAs[Long]("max_reducer_rows") == mr)
      assert(r.getAs[Boolean]("fits_64mb") ==
        (r.getAs[Long]("est_table_bytes") <= 67108864L))
    }
    // more reducers can only shrink the biggest reducer
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("p"))
      assert(sorted.head.getAs[Long]("max_reducer_keys") >=
        sorted.last.getAs[Long]("max_reducer_keys"))
    }
  }

  // ---- q477 new vs returning -----------------------------------------------------------

  test("q477 replays the weekly ledger; new + returning = active") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(unix_micros(ts) div 86400000000 DIV 7 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstWk = ev.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    val rows = graft.ops.Behavior.queries("q477_new_vs_returning")(spark, sf)
      .collect()
    rows.foreach { r =>
      val wk = r.getAs[Long]("wk")
      val active = ev.filter(_._2 == wk).map(_._1).distinct
      val nNew = active.count(u => firstWk(u) == wk).toLong
      assert(r.getAs[Long]("n_active") == active.length.toLong, s"wk $wk")
      assert(r.getAs[Long]("n_new") == nNew, s"wk $wk new")
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_returning"))
    }
    // the first week is all-new by definition
    val first = rows.minBy(_.getAs[Long]("wk"))
    assert(first.getAs[Long]("n_returning") == 0L)
    // every user is new exactly once across the whole ledger
    assert(rows.map(_.getAs[Long]("n_new")).sum == firstWk.size.toLong)
  }

  // ---- q478 id-space reconciliation ------------------------------------------------------

  test("q478 replays the two key spaces and their exact overlap") {
    val users = graft.model.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0)).distinct
    val custs = graft.model.Tables.customer(spark, sf)
      .selectExpr("CAST(c_custkey AS BIGINT)").collect().map(_.getLong(0))
      .distinct
    val common = users.toSet.intersect(custs.toSet).size.toLong
    val r = graft.ops.Lakehouse.queries("q478_idspace_reconcile")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_users") == users.length.toLong)
    assert(r.getAs[Long]("n_custs") == custs.length.toLong)
    assert(r.getAs[Long]("n_common") == common)
    assert(r.getAs[Long]("min_user") == users.min)
    assert(r.getAs[Long]("max_cust") == custs.max)
    assert(r.getAs[Long]("user_coverage_ppm") ==
      common * 1000000L / users.length)
  }

  // ---- q479 embedding coverage ------------------------------------------------------------

  test("q479 replays per-source coverage and the orphan census") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val vecs = graft.model.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val docIds = docs.map(_._2).toSet
    val rows = graft.ops.Lakehouse.queries("q479_embedding_coverage")(spark, sf)
      .collect()
    rows.foreach { r =>
      val src = r.getString(0)
      val ds = docs.filter(_._1 == src)
      assert(r.getAs[Long]("n_docs") == ds.length.toLong, src)
      assert(r.getAs[Long]("n_embedded") ==
        ds.count(d => vecs(d._2)).toLong, src)
      assert(r.getAs[Long]("n_vecs") == vecs.size.toLong)
      assert(r.getAs[Long]("n_orphan_vecs") ==
        vecs.count(v => !docIds(v)).toLong)
      assert(r.getAs[Long]("coverage_ppm") <= 1000000L)
    }
  }

  // ---- q480 Anderson–Darling ---------------------------------------------------------------

  test("q480 replays the tie-adjusted two-sample A2 and detects planted tail drift") {
    // brute-force mirror on the shipped corpus
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (s2, xs) => s2 -> xs.map(_._2) }
    val rows = graft.ops.Stewardship.queries("q480_anderson_darling")(spark, sf)
      .collect()
    rows.take(12).foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (xa, xb) = (bySrc(a), bySrc(b))
      val (na, nb) = (xa.length.toLong, xb.length.toLong)
      val grid = (xa ++ xb).distinct.sorted
      var sum = BigInt(0)
      grid.foreach { v =>
        val ca = xa.count(_ == v).toLong; val cb = xb.count(_ == v).toLong
        val fa = xa.count(_ <= v).toLong; val fb = xb.count(_ <= v).toLong
        val m2a = 2 * fa - ca; val m2b = 2 * fb - cb
        val dd = BigInt(nb * m2a - na * m2b)
        val b2 = m2a + m2b
        val den = BigInt(b2) * (2 * (na + nb) - b2)
        sum += (BigInt(ca + cb) * dd * dd * 1000000) / den
      }
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb, (a, b))
      assert(r.getAs[Long]("n_grid") == grid.length.toLong, (a, b))
      assert(BigInt(r.getAs[Long]("ad_ppm")) == sum / (BigInt(na) * nb), (a, b))
    }
    // identical samples ⇒ D ≡ 0 ⇒ A² = 0; planted tail drift must fire.
    // A fixture with two sources: same body mass, one source with a
    // heavy far tail the mid-weighted members underrate.
    val fx = writeDocs((1L to 40L).map(i =>
      doc(i, "x" * 100, "en", "same")) ++
      (41L to 78L).map(i => doc(i, "x" * 100, "en", "tail")) ++
      (79L to 80L).map(i => doc(i, "x" * 5000, "en", "tail")))
    val fr = graft.ops.Stewardship.queries("q480_anderson_darling")(spark, fx)
      .collect()
    assert(fr.length == 1)
    assert(fr.head.getAs[Long]("ad_ppm") > 0L)
  }

  // ---- q481 Jonckheere–Terpstra ------------------------------------------------------------

  test("q481 replays pairwise doubled U and respects the 2·na·nb bound") {
    val li = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr("o_orderpriority",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byPrio = li.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2) }
    val rows = graft.ops.Stewardship.queries("q481_jonckheere_trend")(spark, sf)
      .collect()
    assert(rows.length == 10) // C(5,2) ordered priority pairs
    rows.foreach { r =>
      val (xa, xb) = (byPrio(r.getString(0)), byPrio(r.getString(1)))
      var u2 = 0L
      xb.foreach { vb =>
        u2 += 2 * xa.count(_ < vb) + xa.count(_ == vb)
      }
      assert(r.getAs[Long]("n_a") == xa.length.toLong)
      assert(r.getAs[Long]("u2_ab") == u2, (r.getString(0), r.getString(1)))
      assert(r.getAs[Long]("u2_ab") <= 2L * xa.length * xb.length)
      assert(r.getAs[Long]("trend_ppm") ==
        (BigInt(u2) * 1000000 / (BigInt(2) * xa.length * xb.length)).toLong)
    }
  }

  // ---- q482 pad-to-multiple sweep ----------------------------------------------------------

  test("q482 replays padded mass; waste is monotone in m and zero-bounded") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.ops.Quality.queries("q482_pad_multiple_sweep")(spark, sf)
      .collect()
    rows.foreach { r =>
      val ds = docs.filter(_._1 == r.getString(0)).map(_._2)
      val m = r.getAs[Long]("m")
      val padded = ds.map(l => ((l + m - 1) / m) * m).sum
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("payload") == ds.sum)
      assert(r.getAs[Long]("padded") == padded, (r.getString(0), m))
      assert(r.getAs[Long]("waste_ppm") ==
        (padded - ds.sum) * 1000000L / padded)
    }
    // padded mass (hence waste) is monotone non-decreasing in m per source
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("m"))
      assert(sorted.sliding(2).forall(p =>
        p.head.getAs[Long]("padded") <= p.last.getAs[Long]("padded")))
    }
  }

  // ---- q483 DRF allocation -----------------------------------------------------------------

  test("q483 equalizes dominant shares and never over-allocates either resource") {
    val demands = graft.model.Tables.documents(spark, sf)
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("chars"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("docs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cc = demands.map(_._2).sum; val cd = demands.map(_._3).sum
    val kk = BigInt(cc) * cd
    val rows = graft.ops.Analytics.queries("q483_drf_allocation")(spark, sf)
      .collect()
    // exact replay of the closed form
    val mi = demands.map { case (s2, ch, dc) =>
      s2 -> (BigInt(ch) * cd).max(BigInt(dc) * cc) }.toMap
    val consC = demands.map { case (s2, ch, _) =>
      (BigInt(ch) * cc * cd + mi(s2) - 1) / mi(s2) }.sum
    val consD = demands.map { case (s2, _, dc) =>
      (BigInt(dc) * cc * cd + mi(s2) - 1) / mi(s2) }.sum
    val alpha = ((BigInt(cc) * 1000000) / consC)
      .min((BigInt(cd) * 1000000) / consD)
    rows.foreach { r =>
      val m = mi(r.getString(0))
      assert(BigInt(r.getAs[Long]("drf_ppm")) == (alpha * kk) / m,
        r.getString(0))
      assert(BigInt(r.getAs[Long]("domshare_ppm")) == (m * 1000000) / kk)
      // equal dominant share up to the floor: x_i·m_i ∈ (αK − m_i, αK]
      val xm = BigInt(r.getAs[Long]("drf_ppm")) * m
      assert(xm <= alpha * kk && xm > alpha * kk - m, r.getString(0))
    }
    // feasibility: total admitted consumption within each capacity
    val byName = demands.map(t => t._1 -> t).toMap
    val usedC = rows.map(r => BigInt(r.getAs[Long]("drf_ppm")) *
      byName(r.getString(0))._2).sum
    val usedD = rows.map(r => BigInt(r.getAs[Long]("drf_ppm")) *
      byName(r.getString(0))._3).sum
    assert(usedC <= BigInt(cc) * 1000000)
    assert(usedD <= BigInt(cd) * 1000000)
    // the binding resource is nearly saturated (floors only under-fill)
    assert(usedC * 100 >= BigInt(cc) * 1000000 * 99 ||
      usedD * 100 >= BigInt(cd) * 1000000 * 99)
  }

  // ---- q484 degree octaves -------------------------------------------------------------------

  test("q484 conserves vertices and degree mass over the octave grid") {
    val rows = graft.ops.Graph.queries("q484_degree_octaves")(spark, sf)
      .collect()
    val assort = graft.ops.Graph.queries("q288_degree_assortativity")(
      spark, sf).collect().head
    assert(rows.map(_.getAs[Long]("n_nodes")).sum ==
      assort.getAs[Long]("n_vertices"))
    assert(rows.map(_.getAs[Long]("sum_degree")).sum ==
      2L * assort.getAs[Long]("n_edges"))
    rows.foreach { r =>
      val lo = r.getAs[Long]("degree_lo")
      assert(lo == (1L << r.getAs[Long]("octave").toInt))
      // bucket mean degree lies inside [lo, 2·lo)
      assert(r.getAs[Long]("sum_degree") >= lo * r.getAs[Long]("n_nodes"))
      assert(r.getAs[Long]("sum_degree") < 2 * lo * r.getAs[Long]("n_nodes"))
    }
  }

  // ---- q485 secret screen ----------------------------------------------------------------------

  test("q485 finds exactly the planted credentials; class-incomplete runs do not fire") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.ops.TextAnalysis.queries("q485_secret_screen")(spark, sf)
      .collect()
    rows.foreach { r =>
      val ds = docs.filter(_._1 == r.getString(0))
      val planted = ds.count(_._2 % 9 == 0).toLong
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("n_flagged_docs") == planted, r.getString(0))
      assert(r.getAs[Long]("n_secrets") == planted)
      assert(r.getAs[Long]("masked_chars") == 20L * planted)
    }
    // fixture: a mixed-class 24-char run fires; all-lowercase and
    // lower+digit runs of the same length do not (doc ids chosen % 9 != 0
    // so nothing extra is planted)
    val fx = writeDocs(Seq(
      doc(1L, "body Abc1abcdefghijklmnopqrst tail", "en", "hit"),
      doc(2L, "body abcdefghijklmnopqrstuvwx tail", "en", "miss"),
      doc(3L, "body abc1abcdefghijklmnopqrs2 tail", "en", "miss")))
    val fr = graft.ops.TextAnalysis.queries("q485_secret_screen")(spark, fx)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_secrets")).toMap
    assert(fr("hit") == 1L && fr("miss") == 0L)
  }

  // ---- q486 backlog aging ----------------------------------------------------------------------

  test("q486 replays the interval-aging census exactly") {
    // NOTE: q405's open-minus-closed balance is NOT the comparison
    // oracle here — the driver corpus contains orders whose last ship
    // month PRECEDES the order month (negative delays), which the
    // cumulative balance nets against genuine opens while the interval
    // definition [mo, mc) correctly drops them. Replay the interval
    // definition brute-force instead.
    val mc = graft.model.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(year(MAX(l_shipdate)) * 12 + month(MAX(l_shipdate)) - 1" +
          " AS BIGINT)").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ords = graft.model.Tables.orders(spark, sf)
      .selectExpr("o_orderkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hi = ords.map(t => math.max(t._2, mc.getOrElse(t._1, t._2))).max
    val expected = scala.collection.mutable.Map
      .empty[(Long, String), (Long, Long)]
    ords.foreach { case (okey, mo, cents) =>
      val mceff = mc.getOrElse(okey, hi + 1)
      (mo until math.min(mceff, hi + 1)).foreach { m =>
        val b = if (m == mo) "a_0m" else if (m - mo <= 3) "b_1_3m"
          else if (m - mo <= 12) "c_4_12m" else "d_gt12m"
        val (n0, c0) = expected.getOrElse((m, b), (0L, 0L))
        expected((m, b)) = (n0 + 1, c0 + cents)
      }
    }
    val aging = graft.ops.Stewardship.queries("q486_backlog_aging")(spark, sf)
      .collect()
    assert(aging.length == expected.size)
    aging.foreach { r =>
      val key = (r.getAs[Long]("month_idx"), r.getString(1))
      assert(expected(key) ==
        ((r.getAs[Long]("n_open"), r.getAs[Long]("open_cents"))), key)
    }
  }

  // ---- q487 sharded percentile bias ---------------------------------------------------------------

  test("q487 true p50 replays exactly and lies within the shard-median envelope") {
    val base = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr("o_orderpriority", "l_orderkey % 16",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def p50(xs: Seq[Long]): Long = xs.sorted.apply(((xs.length + 1) / 2) - 1)
    val rows = graft.ops.Stewardship.queries(
      "q487_sharded_percentile_bias")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val prio = r.getString(0)
      val all = base.filter(_._1 == prio).map(_._3)
      val shardP50s = base.filter(_._1 == prio).groupBy(_._2)
        .map { case (_, xs) => p50(xs.map(_._3).toSeq) }.toSeq
      assert(r.getAs[Long]("n_lines") == all.length.toLong)
      assert(r.getAs[Long]("p50_true") == p50(all.toSeq), prio)
      assert(r.getAs[Long]("n_shards") == shardP50s.length.toLong)
      assert(r.getAs[Long]("shard_mean_milli") ==
        shardP50s.sum * 1000L / shardP50s.length)
      // pooled median always lies inside [min, max] of the shard medians
      assert(r.getAs[Long]("p50_true") >= shardP50s.min)
      assert(r.getAs[Long]("p50_true") <= shardP50s.max)
      assert(r.getAs[Long]("worst_shard_dev") ==
        math.max(shardP50s.max - r.getAs[Long]("p50_true"),
          r.getAs[Long]("p50_true") - shardP50s.min))
    }
  }

  // ---- q488 popularity backtest ---------------------------------------------------------------------

  test("q488 replays the split, the top-20 ranking, and monotone hit@k") {
    val od = graft.model.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "CAST(datediff(o_orderdate, '1970-01-01') AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cut = od.map(_._2).min + (od.map(_._2).max - od.map(_._2).min) * 4 / 5
    val train = od.filter(_._2 < cut).map(_._1).toSet
    val test = od.filter(_._2 >= cut).map(_._1).toSet
    val li = graft.model.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val top = li.filter(t => train(t._1)).groupBy(_._2)
      .map { case (p, xs) => (p, xs.length.toLong) }.toSeq
      .sortBy { case (p, c) => (-c, p) }.take(20).map(_._1).zipWithIndex
      .map { case (p, i) => p -> (i + 1L) }.toMap
    val byOrder = li.filter(t => test(t._1)).groupBy(_._1)
    val rows = graft.ops.Behavior.queries("q488_popularity_backtest")(
      spark, sf).collect().sortBy(_.getAs[Long]("k"))
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val hits = byOrder.count { case (_, xs) =>
        xs.exists(t => top.get(t._2).exists(_ <= k)) }
      assert(r.getAs[Long]("n_test_orders") == byOrder.size.toLong)
      assert(r.getAs[Long]("n_hit") == hits.toLong, s"k=$k")
    }
    // hit@k is monotone in k
    assert(rows.sliding(2).forall(p =>
      p.head.getAs[Long]("n_hit") <= p.last.getAs[Long]("n_hit")))
  }

  // ---- q489 partition layout -----------------------------------------------------------------------

  test("q489 replays the partition censuses; refinement only grows parts and small files") {
    val base = graft.model.Tables.documents(spark, sf)
      .selectExpr("source", "lang", "n_chars DIV 128").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def census(key: ((String, String, Long)) => Any): Seq[Long] =
      base.groupBy(key).map(_._2.length.toLong).toSeq
    val expected = Map(
      "a_source" -> census(_._1), "b_lang" -> census(_._2),
      "c_source_lang" -> census(t => (t._1, t._2)),
      "d_source_lang_len" -> census(t => (t._1, t._2, t._3)))
    val rows = graft.ops.Lakehouse.queries("q489_partition_layout")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    expected.foreach { case (tag, sizes) =>
      val r = rows(tag)
      val sorted = sizes.sorted
      assert(r.getAs[Long]("n_partitions") == sizes.length.toLong, tag)
      assert(r.getAs[Long]("rows_min") == sorted.head, tag)
      assert(r.getAs[Long]("rows_max") == sorted.last, tag)
      assert(r.getAs[Long]("rows_p50") ==
        sorted(((sizes.length + 1) / 2) - 1), tag)
      assert(r.getAs[Long]("n_small") == sizes.count(_ < 128).toLong, tag)
      assert(r.getAs[Long]("skew_ppm") ==
        sorted.last * sizes.length * 1000000L / sizes.sum, tag)
    }
    // nested refinement a ⊂ c ⊂ d: partition count and small-file count
    // are monotone along the chain
    val chain = Seq("a_source", "c_source_lang", "d_source_lang_len")
    chain.sliding(2).foreach { case Seq(x, y) =>
      assert(rows(x).getAs[Long]("n_partitions") <=
        rows(y).getAs[Long]("n_partitions"))
      assert(rows(x).getAs[Long]("n_small") <= rows(y).getAs[Long]("n_small"))
    }
  }

  // ---- q490 day-boundary shift ------------------------------------------------------------------------

  test("q490 replays both boundary series; mass is conserved across the shift") {
    val ev = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.ops.Stewardship.queries("q490_day_boundary_shift")(
      spark, sf).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val us = ev.filter(_._1 == t).map(_._2)
      val a = us.groupBy(_ / 86400000000L).map { case (d2, xs) =>
        d2 -> xs.length.toLong }
      val b = us.groupBy(u => (u + 28800000000L) / 86400000000L)
        .map { case (d2, xs) => d2 -> xs.length.toLong }
      val days = (a.keySet ++ b.keySet).toSeq
      val diffs = days.map(d2 =>
        math.abs(a.getOrElse(d2, 0L) - b.getOrElse(d2, 0L)))
      assert(r.getAs[Long]("n_days") == days.length.toLong, t)
      assert(r.getAs[Long]("n_diverging") == diffs.count(_ != 0L).toLong, t)
      assert(r.getAs[Long]("max_abs_diff") == diffs.max, t)
      assert(r.getAs[Long]("shift_ppm") ==
        diffs.sum * 1000000L / (2L * us.length), t)
      assert(r.getAs[Long]("shift_ppm") <= 1000000L)
    }
  }

  // ---- q491 license propagation --------------------------------------------------------------------------

  test("q491 escalates only upward and conserves the doc census") {
    def licOf(src: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8"))
      java.lang.Long.parseLong(f"${dig(0) & 0xff}%02x", 16) % 3
    }
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> licOf(r.getString(1))).toMap
    val lab = graft.ops.Dedup.connectedComponents(
      graft.ops.Dedup.dupEdges(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = docs.keys.groupBy(k => lab.getOrElse(k, k))
    val eff = byCluster.map { case (cl, ms) => cl -> ms.map(docs).max }
    val names = Seq("a_permissive", "b_attribution", "c_restricted")
    val expected = docs.keys.groupBy { k =>
      (names(docs(k).toInt), names(eff(lab.getOrElse(k, k)).toInt))
    }.map { case (key, ms) =>
      key -> ((ms.size.toLong,
        ms.map(k => lab.getOrElse(k, k)).toSet.size.toLong))
    }
    val rows = graft.ops.Dedup.queries("q491_license_propagation")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.size.toLong)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getString(0) <= r.getString(1), key) // escalation only up
      assert(expected(key) ==
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters"))), key)
    }
  }

  // ---- q492 seasonal-residual anomaly --------------------------------------------------------------------

  test("q492 replays the median/MAD flags on q289's residuals") {
    val dec = graft.ops.Analytics.queries("q289_ts_decomposition")(spark, sf)
      .select("event_type", "resid_u").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def med(xs: Seq[Long]): Long = xs.sorted.apply(((xs.length + 1) / 2) - 1)
    val rows = graft.ops.Analytics.queries("q492_seasonal_anomaly")(spark, sf)
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val xs = dec.filter(_._1 == t).map(_._2).toSeq
      val m = med(xs)
      val mad = med(xs.map(x => math.abs(x - m)))
      val anom = xs.count(x => math.abs(x - m) > 3 * mad).toLong
      assert(r.getAs[Long]("n_days") == xs.length.toLong, t)
      assert(r.getAs[Long]("median_resid_u") == m, t)
      assert(r.getAs[Long]("mad_u") == mad, t)
      assert(r.getAs[Long]("n_anomalies") == anom, t)
      assert(r.getAs[Long]("worst_abs_dev") ==
        xs.map(x => math.abs(x - m)).max, t)
      // the detector flags the tail, not the body
      assert(anom * 5 <= xs.length.toLong, t)
    }
  }

  // ---- q493 batch variance decay ------------------------------------------------------------------------------

  test("q493 replays the exact batch-mean variance at every B") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = graft.ops.Analytics.queries("q493_batch_variance_decay")(
      spark, sf).collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("batch_size")
      val sums = docs.groupBy(_._1 / b).values
        .filter(_.length == b).map(_.map(_._2).sum).toSeq
      val nb = BigInt(sums.length)
      val ssum = sums.map(BigInt(_)).sum
      val ssq = sums.map(x => BigInt(x) * x).sum
      assert(r.getAs[Long]("n_batches") == sums.length.toLong, b)
      assert(BigInt(r.getAs[Long]("var_mean_u")) ==
        (nb * ssq - ssum * ssum) * 1000000 / (nb * nb * b * b), b)
      assert(BigInt(r.getAs[Long]("b_var_u")) ==
        (nb * ssq - ssum * ssum) * 1000000 / (nb * nb * b), b)
    }
  }

  // ---- q494 supplier SLA scorecard ---------------------------------------------------------------------------------

  test("q494 replays the nation rollup; the supplier envelope brackets it") {
    val sla = Map("1-URGENT" -> 30L, "2-HIGH" -> 45L, "3-MEDIUM" -> 60L,
      "4-NOT SPECIFIED" -> 75L, "5-LOW" -> 90L)
    val li = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr("l_suppkey", "o_orderpriority",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val suppNation = graft.model.Tables.supplier(spark, sf)
      .join(graft.model.Tables.nation(spark, sf),
        org.apache.spark.sql.functions.col("s_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .select("s_suppkey", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.ops.Warehouse.queries("q494_supplier_sla")(spark, sf)
      .collect()
    rows.foreach { r =>
      val nat = r.getString(0)
      val lines = li.filter(t => suppNation.get(t._1).contains(nat))
      val bySupp = lines.groupBy(_._1)
      val ontime = lines.count(t => t._3 <= sla(t._2)).toLong
      val lateDays = lines.map(t => math.max(0L, t._3 - sla(t._2))).sum
      val suppPpm = bySupp.values.map { xs =>
        xs.count(t => t._3 <= sla(t._2)).toLong * 1000000L / xs.length }
      assert(r.getAs[Long]("n_suppliers") == bySupp.size.toLong, nat)
      assert(r.getAs[Long]("n_lines") == lines.length.toLong, nat)
      assert(r.getAs[Long]("ontime_ppm") ==
        ontime * 1000000L / lines.length, nat)
      assert(r.getAs[Long]("avg_late_milli") ==
        lateDays * 1000L / lines.length, nat)
      assert(r.getAs[Long]("worst_supplier_ppm") == suppPpm.min, nat)
      assert(r.getAs[Long]("best_supplier_ppm") == suppPpm.max, nat)
      // the per-supplier envelope brackets the nation rate (±1 ppm floor)
      assert(suppPpm.min <= r.getAs[Long]("ontime_ppm") + 1)
      assert(suppPpm.max + 1 >= r.getAs[Long]("ontime_ppm"))
    }
  }

  // ---- q495 circuit breaker --------------------------------------------------------------------------------------

  test("q495 replays the burst census; raising the threshold only shrinks it") {
    val ms = graft.model.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .selectExpr("unix_micros(ts) div 60000000").collect().map(_.getLong(0))
    val (mn, mx, total) = (ms.min, ms.max, ms.length.toLong)
    val perMin = ms.groupBy(identity).map { case (m, xs) =>
      m -> xs.length.toLong }
    val rows = graft.ops.Stewardship.queries("q495_circuit_breaker")(
      spark, sf).collect().sortBy(_.getAs[Long]("threshold_x"))
    rows.foreach { r =>
      val t = r.getAs[Long]("threshold_x")
      val nmin = mx - mn + 1
      val above = (mn to mx).map(m =>
        perMin.getOrElse(m, 0L) * nmin > t * total)
      // islands of consecutive trues
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      var run = 0L
      above.foreach { a =>
        if (a) run += 1
        else { if (run > 0) lens += run; run = 0 } }
      if (run > 0) lens += run
      assert(r.getAs[Long]("n_minutes") == nmin, t)
      assert(r.getAs[Long]("n_above") == above.count(identity).toLong, t)
      assert(r.getAs[Long]("n_bursts") == lens.length.toLong, t)
      assert(r.getAs[Long]("n_trips") == lens.count(_ >= 3).toLong, t)
      assert(r.getAs[Long]("longest_burst") ==
        (if (lens.isEmpty) 0L else lens.max), t)
    }
    // monotone: a higher threshold can only reduce above-minutes and trips
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(x.getAs[Long]("n_above") >= y.getAs[Long]("n_above"))
      assert(x.getAs[Long]("n_trips") >= y.getAs[Long]("n_trips"))
    case _ => ()
    }
  }

  // ---- q496 A/A calibration ------------------------------------------------------------------------------------------

  test("q496 arms partition the population and the null rarely fires") {
    val rows = graft.ops.Behavior.queries("q496_aa_calibration")(spark, sf)
      .collect()
    assert(rows.length == 8)
    val nUsers = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    rows.foreach { r =>
      // every salt's two arms partition the same user population
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nUsers)
      assert(r.getAs[Long]("z2_milli") >= 0L)
    }
    // calibration: at most 2 of 8 null experiments may cross 5%
    assert(rows.map(_.getAs[Long]("sig_at_5pct")).sum <= 2L)
    // the salted splits genuinely differ (not one split copied 8 times)
    assert(rows.map(_.getAs[Long]("n_a")).distinct.length > 1)
  }

  // ---- q498 burn-rate alerts ------------------------------------------------------------------------------------

  test("q498 replays both burn legs; the AND page is the intersection") {
    val ms = graft.model.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .selectExpr("unix_micros(ts) div 60000000").collect().map(_.getLong(0))
    val (mn, mx, total) = (ms.min, ms.max, ms.length.toLong)
    val nmin = mx - mn + 1
    val perMin = ms.groupBy(identity).map { case (m, xs) =>
      m -> xs.length.toLong }
    val cs = (mn to mx).map(m => perMin.getOrElse(m, 0L))
    def flags(w: Int, burnTenths: Long): Seq[Boolean] =
      cs.indices.map { i =>
        val ws = cs.slice(math.max(0, i - w + 1), i + 1).sum
        ws * nmin * 10 > burnTenths * total * w
      }
    val f5 = flags(5, 144L); val f60 = flags(60, 60L)
    val rows = graft.ops.Stewardship.queries("q498_burn_rate_alerts")(
      spark, sf).collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a_5m_fast").getAs[Long]("n_flagged") ==
      f5.count(identity).toLong)
    assert(rows("b_60m_slow").getAs[Long]("n_flagged") ==
      f60.count(identity).toLong)
    val both = f5.zip(f60).count { case (a, b) => a && b }.toLong
    assert(rows("c_page_and").getAs[Long]("n_flagged") == both)
    // the AND page never fires more than either leg
    assert(both <= f5.count(identity) && both <= f60.count(identity))
    rows.values.foreach(r => assert(r.getAs[Long]("n_minutes") == nmin))
  }

  // ---- q499 Wilson-ranking inversions -----------------------------------------------------------------------------

  test("q499 replays the inversion census against a brute-force double mirror") {
    val sla = Map("1-URGENT" -> 30L, "2-HIGH" -> 45L, "3-MEDIUM" -> 60L,
      "4-NOT SPECIFIED" -> 75L, "5-LOW" -> 90L)
    val li = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr("l_suppkey", "o_orderpriority",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val suppNation = graft.model.Tables.supplier(spark, sf)
      .join(graft.model.Tables.nation(spark, sf),
        org.apache.spark.sql.functions.col("s_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .select("s_suppkey", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    case class W(sk: Long, n: Long, k: Long, ppm: Long, wl: Double)
    val bySupp = li.groupBy(_._1).map { case (sk, xs) =>
      val n = xs.length.toLong
      val k = xs.count(t => t._3 <= sla(t._2)).toLong
      val z2 = 3.8416
      val p = k.toDouble / n
      val wl = (p + z2 / (2.0 * n) -
        math.sqrt(z2) * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))) /
        (1 + z2 / n)
      W(sk, n, k, k * 1000000L / n, wl)
    }.toSeq
    val rows = graft.ops.Warehouse.queries("q499_wilson_rank_inversions")(
      spark, sf).collect()
    rows.foreach { r =>
      val nat = r.getString(0)
      val ws = bySupp.filter(w => suppNation.get(w.sk).contains(nat))
        .sortBy(w => (-w.n, w.sk)).take(100)
      val inv = (for {
        a <- ws; b <- ws if a.sk != b.sk
        if a.ppm > b.ppm || (a.ppm == b.ppm && a.sk < b.sk)
        if a.wl < b.wl || (a.wl == b.wl && a.sk > b.sk)
      } yield 1).size.toLong
      assert(r.getAs[Long]("n_suppliers") == ws.length.toLong, nat)
      assert(r.getAs[Long]("n_inversions") == inv, nat)
      assert(r.getAs[Long]("n_inversions") <=
        ws.length.toLong * (ws.length - 1) / 2)
      val topRaw = ws.maxBy(w => (w.ppm, -w.sk)).sk
      val topWl = ws.maxBy(w => (w.wl, -w.sk)).sk
      assert(r.getAs[Long]("top1_raw_sk") == topRaw, nat)
      assert(r.getAs[Long]("top1_wilson_sk") == topWl, nat)
      assert(r.getAs[Long]("top1_changed") ==
        (if (topRaw == topWl) 0L else 1L))
    }
  }

  // ---- q500 semantics canary ---------------------------------------------------------------------------------------

  test("q500 canary values match an independent JVM replay (third engine)") {
    val rows = graft.ops.Relational.queries("q500_semantics_canary")(
      spark, sf).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.size == 15)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("graft".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(rows("a_div_floor_pos") == "3")
    assert(rows("b_mod_pos") == "1")
    assert(rows("c_decimal_cents") == "1234567")
    assert(rows("d_md5_hex") == md5)
    assert(rows("e_md5_int64_bridge") ==
      java.lang.Long.parseLong(md5.take(8), 16).toString)
    assert(rows("f_regex_runs") == "3")
    assert(rows("g_char_len") == "5")
    assert(rows("h_byte_len") == "6")
    assert(rows("i_substr_1based") == "bcd")
    assert(rows("j_isqrt_2p52") == math.sqrt(4503599627370496L.toDouble)
      .toLong.toString)
    assert(rows("k_epoch_us") == "1704067200000000")
    assert(rows("l_datediff_days") == "60")
    assert(rows("m_collation_binary") == "binary")
    assert(rows("n_concat_ws") == "x:y")
    assert(rows("o_neg_div_convention") == "-3")
  }

  // ---- q501 Dixon extreme-day screen ------------------------------------------------------------------------------

  test("q501 replays gap-over-range for the single worst day") {
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")))
      .count().collect().map(r => (r.getString(0), r.getLong(2)))
    val rows = graft.ops.Stewardship.queries("q501_dixon_extreme_day")(
      spark, sf).collect()
    rows.foreach { r =>
      val cs = daily.filter(_._1 == r.getString(0)).map(_._2)
      val mx = cs.max; val mn = cs.min
      // order-statistic x(n−1): the max itself when ≥2 days tie at it
      val snd =
        if (cs.count(_ == mx) >= 2) mx
        else cs.filter(_ < mx) match {
          case xs if xs.isEmpty => mx
          case xs => xs.max
        }
      assert(r.getAs[Long]("n_days") == cs.length.toLong)
      assert(r.getAs[Long]("max_day_events") == mx)
      assert(r.getAs[Long]("second_max") == snd)
      assert(r.getAs[Long]("min_day_events") == mn)
      assert(r.getAs[Long]("q_milli") ==
        (mx - snd) * 1000L / math.max(mx - mn, 1L))
      assert(r.getAs[Long]("q_milli") <= 1000L)
    }
  }

  // ---- q502 basket dispersion -----------------------------------------------------------------------------------------

  test("q502 replays the exact Fano ratio per priority") {
    val baskets = graft.model.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").count()
      .join(graft.model.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_orderpriority", "count").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.ops.Lakehouse.queries("q502_basket_dispersion")(
      spark, sf).collect()
    rows.foreach { r =>
      val xs = baskets.filter(_._1 == r.getString(0)).map(_._2)
      val n = BigInt(xs.length); val sx = xs.map(BigInt(_)).sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      assert(r.getAs[Long]("n_orders") == xs.length.toLong)
      assert(r.getAs[Long]("n_lines") == xs.sum)
      assert(r.getAs[Long]("max_basket") == xs.max)
      assert(BigInt(r.getAs[Long]("mean_milli")) == sx * 1000 / n)
      assert(BigInt(r.getAs[Long]("fano_milli")) ==
        (n * sxx - sx * sx) * 1000 / (n * sx), r.getString(0))
      assert(r.getAs[Long]("fano_milli") >= 0L)
    }
  }

  // ---- q503 trade imbalance ------------------------------------------------------------------------------------------------

  test("q503 flows replay exactly; imbalance is symmetric and bounded") {
    val directed = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .join(graft.model.Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .join(graft.model.Tables.supplier(spark, sf),
        org.apache.spark.sql.functions.col("l_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
      .selectExpr("CAST(c_nationkey AS BIGINT) AS c_nationkey",
        "CAST(s_nationkey AS BIGINT) AS s_nationkey",
        "CAST(l_extendedprice AS DECIMAL(12,2))" +
          " * CAST(1 - l_discount AS DECIMAL(4,2)) AS v")
      .groupBy("c_nationkey", "s_nationkey")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(FLOOR(SUM(v) * 100) AS BIGINT) AS cents"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("cents"), r.getAs[Long]("n")))).toMap
    val rows = graft.ops.Relational.queries("q503_trade_imbalance")(
      spark, sf).collect()
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("nation_a"), r.getAs[Long]("nation_b"))
      assert(a < b)
      val ab = directed((a, b)); val ba = directed((b, a))
      assert(r.getAs[Long]("cents_a_buys_from_b") == ab._1)
      assert(r.getAs[Long]("cents_b_buys_from_a") == ba._1)
      assert(r.getAs[Long]("n_lines") == ab._2 + ba._2)
      assert(r.getAs[Long]("imbalance_ppm") ==
        math.abs(ab._1 - ba._1) * 1000000L / (ab._1 + ba._1))
      assert(r.getAs[Long]("imbalance_ppm") <= 1000000L)
    }
    // every two-way pair in the data appears in the output
    val twoWay = directed.keys.filter { case (x, y) =>
      x < y && directed.contains((y, x)) }.toSet
    assert(rows.length == twoWay.size)
  }

  // ---- q497 minute phase profile -----------------------------------------------------------------------------------------

  test("q497 conserves event mass and its peak dominates the mean") {
    val rows = graft.ops.Behavior.queries("q497_minute_phase_profile")(
      spark, sf).collect()
    val totals = graft.model.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getAs[Long]("n_events") == totals(t), t)
      assert(r.getAs[Long]("n_phases") <= 60L)
      assert(r.getAs[Long]("peak_minute_events") >=
        r.getAs[Long]("trough_minute_events"))
      // peak·60/total ≥ 1000 milli by definition of max
      assert(r.getAs[Long]("peak_to_mean_milli") >= 1000L, t)
    }
  }

  // ---- q504 twin census / q505 copy waste (batch 49) -------------------------------------------------------------

  test("q504 replays the per-source twin-class census") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // plain-Scala twin classes: identical distinct word-trigram sets
    val classes = docs.flatMap { case (_, src, text) =>
        val t = text.split(" ", -1)
        if (t.length >= 3) Some((src, t.sliding(3).map(_.mkString(" ")).toSet))
        else None
      }.groupBy(identity).toSeq
      .map { case ((src, _), g) => (src, g.length.toLong) }
      .groupBy(_._1)
    val rows = Dedup.queries("q504_twin_census")(spark, sf).collect()
    graft.ops.Caches.clear()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cls = classes(r.getString(0)).map(_._2)
      assert(r.getAs[Long]("n_docs") == cls.sum)
      assert(r.getAs[Long]("n_classes") == cls.length.toLong)
      assert(r.getAs[Long]("max_multiplicity") == cls.max)
      val twins = cls.filter(_ >= 2).sum
      assert(r.getAs[Long]("twin_docs") == twins)
      assert(r.getAs[Long]("twin_ppm") == twins * 1000000L / cls.sum)
    }
    // detector proof on a planted fixture (sf0.001's template copies
    // are cross-source, so the per-source census legitimately reads 0
    // there): 3 verbatim copies + 1 unique doc in one source must read
    // twin_docs = 3, max multiplicity 3
    val tpl = "alpha beta gamma delta epsilon zeta"
    val dir = writeDocs((0 until 3).map(i =>
      Row(i.toLong, tpl, "en", "s0", tpl.length.toLong)) :+
      Row(9L, "one unique doc here now", "en", "s0", 23L))
    val fx = Dedup.queries("q504_twin_census")(spark, dir).collect()
    graft.ops.Caches.clear()
    assert(fx.length == 1)
    assert(fx(0).getAs[Long]("n_docs") == 4L)
    assert(fx(0).getAs[Long]("n_classes") == 2L)
    assert(fx(0).getAs[Long]("max_multiplicity") == 3L)
    assert(fx(0).getAs[Long]("twin_docs") == 3L)
    assert(fx(0).getAs[Long]("twin_ppm") == 750000L)
  }

  test("q505 copy-waste accounting: raw = unique + wasted, exact-dup classes replay") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = Dedup.queries("q505_copy_waste")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      val cls = docs.filter(_._1 == src).groupBy(_._2).toSeq
        .map { case (text, g) =>
          (g.length.toLong, text.split(" ", -1).length.toLong) }
      val raw = cls.map { case (m, n) => m * n }.sum
      val uniq = cls.map(_._2).sum
      assert(r.getAs[Long]("raw_tokens") == raw, src)
      assert(r.getAs[Long]("unique_tokens") == uniq, src)
      assert(r.getAs[Long]("wasted_tokens") == raw - uniq, src)
      assert(r.getAs[Long]("raw_tokens") ==
        r.getAs[Long]("unique_tokens") + r.getAs[Long]("wasted_tokens"))
      assert(r.getAs[Long]("waste_ppm") ==
        (raw - uniq) * 1000000L / math.max(raw, 1L))
    }
  }

  // ---- batch 50: q506-q510 ----------------------------------------------------------------------------------------

  /** Independent JVM md5 bridge: same 13-hex-char → 52-bit integer
    * convention as the engines, via java.security.MessageDigest. */
  private def jvmH(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(13), 16)
  }

  test("q506 eval holdout equals the plain-Scala min-5-by-salted-md5 carve") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, src) => (src, jvmH(s"smp:$id"), id) }
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3)).take(5))
      .toMap
    val rows = graft.ops.Stewardship.queries("q506_eval_holdout")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.keySet == expect.keySet)
    bySrc.foreach { case (src, rs) =>
      val exp = expect(src)
      assert(rs.length == math.min(5, exp.length))
      rs.sortBy(_.getAs[Long]("rk")).zip(exp).foreach { case (r, (_, h, id)) =>
        assert(r.getAs[Long]("doc_id") == id, s"$src rank ${r.getAs[Long]("rk")}")
        assert(r.getAs[Long]("h") == h)
      }
    }
  }

  test("q507 split contamination replays and fires on a planted cross-split twin") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def isTest(id: Long): Boolean = jvmH(s"spl:$id") % 100 < 10
    val rows = graft.ops.Stewardship
      .queries("q507_split_contamination")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      val cls = docs.filter(_._2 == src).groupBy(_._3).toSeq.map { case (_, g) =>
        val nt = g.count(d => isTest(d._1)).toLong
        (nt, g.length.toLong - nt)
      }
      assert(r.getAs[Long]("n_classes") == cls.length.toLong, src)
      assert(r.getAs[Long]("n_multi") == cls.count(c => c._1 + c._2 >= 2), src)
      assert(r.getAs[Long]("n_cross") ==
        cls.count(c => c._1 >= 1 && c._2 >= 1), src)
      assert(r.getAs[Long]("contam_pairs") ==
        cls.map(c => c._1 * c._2).sum, src)
      val ctd = cls.filter(_._2 >= 1).map(_._1).sum
      val td = cls.map(_._1).sum
      assert(r.getAs[Long]("contam_test_docs") == ctd, src)
      assert(r.getAs[Long]("test_docs") == td, src)
      assert(r.getAs[Long]("contam_ppm") == ctd * 1000000L / math.max(td, 1L))
    }
    // detector proof: plant one exact-dup class spanning the hash split —
    // pick (deterministically) one test id and one train id from 0..999
    val testId = (0L until 1000L).find(isTest).get
    val trainId = (0L until 1000L).find(!isTest(_)).get
    val tpl = "contaminated benchmark answer text"
    val dir = writeDocs(Seq(
      Row(testId, tpl, "en", "s0", tpl.length.toLong),
      Row(trainId, tpl, "en", "s0", tpl.length.toLong)))
    val fx = graft.ops.Stewardship
      .queries("q507_split_contamination")(spark, dir).collect()
    assert(fx.length == 1)
    assert(fx(0).getAs[Long]("n_cross") == 1L)
    assert(fx(0).getAs[Long]("contam_pairs") == 1L)
    assert(fx(0).getAs[Long]("contam_test_docs") == 1L)
    assert(fx(0).getAs[Long]("contam_ppm") == 1000000L)
  }

  test("q508 Mann-Kendall S and tie-adjusted var18 replay exactly") {
    val daily = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((et, day), c) => (et, day, c) }
      .groupBy(_._1)
    val rows = graft.ops.Stewardship.queries("q508_mann_kendall")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val cs = daily(et).sortBy(_._2).map(_._3)
      val n = cs.length.toLong
      val sStat = (for {
        i <- cs.indices; j <- (i + 1) until cs.length
      } yield java.lang.Long.signum(cs(j) - cs(i)).toLong).sum
      val tie = cs.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      assert(r.getAs[Long]("n_days") == n, et)
      assert(r.getAs[Long]("s_stat") == sStat, et)
      assert(r.getAs[Long]("var18_num") == n * (n - 1) * (2 * n + 5) - tie, et)
      assert(r.getAs[Long]("trend_dir") == java.lang.Long.signum(sStat), et)
    }
  }

  test("q509 survival table replays; at-risk is a non-increasing suffix sum") {
    val rows = graft.ops.Stewardship
      .queries("q509_ship_lag_survival")(spark, sf).collect()
      .sortBy(_.getAs[Long]("lag_days"))
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("d_events")).sum
    // suffix-sum law: r(t) = Σ_{t' ≥ t} d(t'); first active lag covers all
    var suffix = total
    rows.foreach { r =>
      assert(r.getAs[Long]("n_at_risk") == suffix)
      assert(r.getAs[Long]("hazard_ppm") ==
        r.getAs[Long]("d_events") * 1000000L / suffix)
      suffix -= r.getAs[Long]("d_events")
    }
    assert(suffix == 0L)
    // independent replay of the lag histogram via the SQL-free join
    val o = graft.model.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS d").collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    val lags = graft.model.Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS d").collect()
      .map(r => java.time.temporal.ChronoUnit.DAYS.between(
        o(r.getLong(0)), r.getDate(1).toLocalDate))
    val hist = lags.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getAs[Long]("lag_days") ->
      r.getAs[Long]("d_events")).toMap == hist)
  }

  test("q510 CUSUM change-point replays the argmax of |n*P_k - k*S|") {
    val daily = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day").collect()
      .map(r => (r.getString(0), r.getDate(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((et, day), c) => (et, day, c) }
      .groupBy(_._1)
    val rows = graft.ops.Stewardship
      .queries("q510_cusum_changepoint")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val series = daily(et).sortBy(_._2.toLocalDate.toEpochDay)
      val n = series.length.toLong
      val s = series.map(_._3).sum
      var p = 0L
      val dks = series.zipWithIndex.map { case ((_, day, c), i) =>
        p += c
        (day.toLocalDate.toEpochDay, math.abs(n * p - (i + 1) * s))
      }
      val dMax = dks.map(_._2).max
      assert(r.getAs[Long]("n_days") == n, et)
      assert(r.getAs[Long]("total_events") == s, et)
      assert(r.getAs[Long]("d_abs_max") == dMax, et)
      assert(r.getAs[Long]("cp_epoch_day") ==
        dks.filter(_._2 == dMax).map(_._1).min, et)
      assert(r.getAs[Long]("cusum_milli") ==
        dMax * 1000L / math.max(n * s, 1L), et)
      assert(r.getAs[Long]("cusum_milli") <= 1000L, et)
    }
  }
}
