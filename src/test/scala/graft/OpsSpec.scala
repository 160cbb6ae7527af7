package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("shingleExpr yields n-2 trigrams and empty for short docs") {
    val df = Seq("a b c d e", "x y").toDF("text")
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .select(TextAnalysis.shingleExpr("t", 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d", "c d e"))
    assert(rows(1).isEmpty)
  }

  test("jaccardPairs computes exact intersection-over-union") {
    val sh = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "b"), (2L, "c"), (2L, "d"))
      .toDF("doc_id", "sh")
    val r = Dedup.jaccardPairs(sh).collect()(0)
    assert(r.getAs[Long]("common") == 2 && r.getAs[Long]("na") == 3)
    assert(math.abs(r.getAs[Double]("jac") - 0.5) < 1e-12)
  }

  test("minhash LSH candidates achieve full recall on near-identical pairs") {
    // exact pairs with jac >= 0.9 over the full sf0.001 corpus must all be
    // candidate pairs of the 16-hash/4-band LSH (banding theory: at
    // jac=0.9 the miss probability per band is (1-0.9^4), overall
    // (1-0.9^4)^4 ≈ 0.012 — and the corpus' near-dup pairs sit at ~0.99).
    val lsh = SparkEntry.queries("q26_minhash_lsh")(spark, sf)
      .filter(col("jac") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty, "corpus should contain near-dup pairs")
  }

  test("LSH ANN output is structurally consistent") {
    // The sf corpus is random noise (max pairwise cosine < 0.5), so top-5
    // recall is inherently ~0 — assert structure, not recall; recall on
    // genuinely clustered data is covered by the synthetic test below.
    val ann = SparkEntry.queries("q29_lsh_ann")(spark, sf)
      .select("q_id", "c_id", "rank").collect()
    assert(ann.nonEmpty, "ANN should return candidates")
    ann.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getLong(2)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq, "ranks must be 1..k with no gaps")
    }
  }

  test("LSH buckets: identical and near-identical vectors collide, opposites don't") {
    val base = Array.fill(64)(1.0)
    // perturb one coordinate by strictly less than the smallest plane-dot
    // margin / max plane weight, so no sign bit can flip
    val minAbsDot = (0 until 12)
      .map(i => math.abs((0 until 64).map(j => Similarity.planeWeight(i, j)).sum)).min
    val eps = minAbsDot / (2 * 1000.0)
    val near = base.clone(); near(0) = 1.0 + eps
    val opposite = base.map(-_)
    val df = Seq((1L, base.toSeq), (2L, base.toSeq), (3L, near.toSeq), (4L, opposite.toSeq))
      .toDF("vec_id", "v")
    val buckets = Similarity.lshBuckets(df, numPlanes = 12, dim = 64, spark = spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(1L) == buckets(2L), "identical vectors must share a bucket")
    assert(buckets(1L) == buckets(3L), "tiny perturbation must not flip sign bits")
    assert(buckets(1L) != buckets(4L), "antipodal vector must flip every nonzero bit")
  }

  test("plane weights are deterministic pure-integer arithmetic") {
    assert(Similarity.planeWeight(0, 0) == -1000.0)
    assert(Similarity.planeWeight(3, 17) ==
      ((3 * 7919 + 17 * 104729) % 2001 - 1000).toDouble)
  }

  test("lang-id trigram profiles discriminate languages with distinct vocab") {
    // Synthetic corpus where languages genuinely differ: the profile-overlap
    // predictor must recover every label. (On the driver corpus labels are
    // random, so q37 only checks determinism there.)
    import org.apache.spark.sql.functions.{col, explode, expr, lit, count => cnt}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val docs = Seq(
      (1L, "en", "the cat sat on the mat with the hat"),
      (2L, "en", "the dog sat on the log with the cat"),
      (3L, "xx", "zorp blip quux zorp blip wibble quux"),
      (4L, "xx", "blip zorp wibble quux zorp blip flib")).toDF("doc_id", "lang", "text")
    val tris = docs.select(col("doc_id"), col("lang"),
      explode(expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")).as("tri"))
    val wp = Window.partitionBy(col("lang")).orderBy(col("c").desc, col("tri"))
    val profile = tris.groupBy("lang", "tri").agg(cnt(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= 20)
      .select(col("lang").as("pred"), col("tri"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("o").desc, col("pred"))
    val preds = tris.select("doc_id", "tri").distinct()
      .join(profile, "tri").groupBy("doc_id", "pred").agg(cnt(lit(1)).as("o"))
      .withColumn("rn", row_number().over(wd)).filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "en", 2L -> "en", 3L -> "xx", 4L -> "xx"))
  }

  test("approx_count_distinct stays within 10% of exact") {
    // q36 emits the claim as a boolean (hash-checkable across engines);
    // assert it holds, and bound the raw Spark estimate directly too.
    SparkEntry.queries("q36_approx_distinct")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("approx_parts_ok"), s"parts claim failed: $r")
      assert(r.getAs[Boolean]("approx_orders_ok"), s"orders claim failed: $r")
    }
    val raw = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
           approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    raw.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"approx=$approx exact=$exact drifts beyond HLL++ tolerance")
    }
  }

  test("TopKAggregator merge order never changes the result") {
    import graft.functions.TopKAggregator
    val agg = TopKAggregator(3)
    val xs = Seq((5.0, 1L), (9.0, 2L), (9.0, 1L), (1.0, 3L), (7.0, 4L), (9.0, 9L))
    // all single-partition orders and all 2-way splits must agree
    val expected = Seq((9.0, 1L), (9.0, 2L), (9.0, 9L))
    xs.permutations.take(50).foreach { p =>
      assert(p.foldLeft(agg.zero)(agg.reduce) == expected)
    }
    for (cut <- 0 to xs.length) {
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
                             b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == expected, s"split at $cut diverged")
    }
    // NaN has a defined, deterministic rank (Double.compare: highest) —
    // a bare > comparison is not total under NaN and would corrupt the
    // sorted buffer partitioning-dependently
    val withNaN = Seq((1.0, 1L), (Double.NaN, 2L), (2.0, 3L), (Double.NaN, 1L))
    val direct = withNaN.foldLeft(agg.zero)(agg.reduce)
    for (cut <- 0 to withNaN.length) {
      val (a, b) = withNaN.splitAt(cut)
      assert(agg.merge(a.foldLeft(agg.zero)(agg.reduce),
                       b.foldLeft(agg.zero)(agg.reduce)) == direct,
        s"NaN handling must be partitioning-independent (cut $cut)")
    }
  }

  test("stratified sample takes exactly the quota per stratum, deterministically") {
    val rows = SparkEntry.queries("q47_stratified_sample")(spark, sf).collect()
    val perLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ == 5), s"quota must be 5 per stratum: $perLang")
    // re-running yields the identical sample (hash-ordered, no rand())
    val again = SparkEntry.queries("q47_stratified_sample")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ==
           again.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("int8 quantization bounds: values in [-127,127], argmax saturates") {
    SparkEntry.queries("q49_embedding_quantize")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_sat") >= 1, "the max-|x| component must hit ±127")
      assert(r.getAs[Double]("recon_err") >= 0.0)
      assert(r.getAs[Double]("recon_err") < 1.0,
        s"64-dim int8 reconstruction error should be small: $r")
    }
  }

  test("per-row band buckets equal the batch groupBy signature on the real corpus") {
    // the streaming path's per-row signature must be bit-identical to
    // minhashBands' groupBy form, or streaming candidates could never be
    // verified against a batch index
    val docs = Tables.documents(spark, sf)
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 3)
    val perRow = Dedup.bandBucketsPerRow(docs, "t", 16, 4, carry = Seq("doc_id"))
      .select("doc_id", "band", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val sh = docs.select(col("doc_id"),
      explode(TextAnalysis.shingleExpr("t", 3)).as("sh")).distinct()
    val batch = Dedup.minhashBands(sh, 16, 4)
      .select("doc_id", "band", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(perRow == batch, "streaming and batch signatures diverge")
    assert(perRow.nonEmpty)
  }

  test("connectedComponents chains transitive pairs into min-labeled clusters") {
    // two components: a 5-node chain (diameter forces multiple label
    // rounds) and a triangle; labels must be each component's minimum
    val edges = Seq((10L, 20L), (20L, 30L), (30L, 40L), (40L, 50L),
                    (7L, 9L), (9L, 8L), (7L, 8L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L, 50L -> 10L,
                         7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("edit-distance verification excludes oversize clusters instead of exploding them") {
    import graft.ops.Curation
    // one mega-cluster (shared 100-char prefix, size > MaxEditCluster) and
    // one small cluster: the mega-cluster must contribute ZERO pairs — the
    // quadratic kernel never touches it — while the small cluster verifies.
    val template = "x" * 100
    val mega = (1L to (Curation.MaxEditCluster + 4)).map(i => (i, template + s" tail$i"))
    val small = Seq((1000L, "y" * 100 + " a"), (1001L, "y" * 100 + " b"))
    val docs = (mega ++ small).toDF("doc_id", "text")
    val pairs = Curation.editDistanceVerify(docs).collect()
    assert(pairs.length == 1, s"only the small cluster's single pair: ${pairs.length}")
    assert(pairs(0).getAs[Long]("doc_a") == 1000L && pairs(0).getAs[Long]("doc_b") == 1001L)
    // at exactly the cap the cluster is still verified (boundary inclusive)
    val atCap = (1L to Curation.MaxEditCluster.toLong).map(i => (i, template + s" t$i"))
    val capPairs = Curation.editDistanceVerify(atCap.toDF("doc_id", "text")).count()
    val n = Curation.MaxEditCluster.toLong
    assert(capPairs == n * (n - 1) / 2)
  }

  test("q133 HLL registers max-merge: sketch of the whole = merge of shard sketches") {
    // the defining property of a mergeable sketch: registers built over
    // the full corpus equal the element-wise max of registers built
    // over disjoint shards — which is exactly why partial aggregation
    // distributes the construction with no second pass.
    import org.apache.spark.sql.functions._
    def regs(filter: org.apache.spark.sql.Column) = {
      graft.model.Tables.documents(spark, sf).filter(filter)
        .select(col("source"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"))
        .withColumn("bucket", expr("CAST(h % 64 AS BIGINT)"))
        .withColumn("v", expr("h DIV 64"))
        .withColumn("rho",
          expr("CAST(CASE WHEN v = 0 THEN 55 ELSE 55 - length(bin(v)) END AS BIGINT)"))
        .groupBy("source", "bucket").agg(max(col("rho")).as("max_rho"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val full = SparkEntry.queries("q133_hll_registers")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("max_rho")).toMap
    val even = regs(col("doc_id") % 2 === 0)
    val odd = regs(col("doc_id") % 2 === 1)
    val merged = (even.keySet ++ odd.keySet).map { k =>
      k -> math.max(even.getOrElse(k, 0L), odd.getOrElse(k, 0L))
    }.toMap
    assert(full == merged, "register max-merge must reproduce the full sketch")
    full.values.foreach(r => assert(r >= 1 && r <= 55, s"rho out of range: $r"))
  }

  test("q135 hopping windows: every event lands in exactly windowSize/slide windows") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q135_hopping_windows")(spark, sf).collect()
    val totalEvents = graft.model.Tables.events(spark, sf).count()
    val fanOut = rows.map(_.getAs[Long]("n_events")).sum
    assert(fanOut == 4 * totalEvents,
      s"24h/6h hop must place each event in exactly 4 windows: $fanOut vs ${4 * totalEvents}")
    rows.foreach { r =>
      assert(r.getAs[Long]("win_start_us") % 21600000000L == 0,
        "window starts must sit on the epoch-aligned 6h grid")
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
    }
  }

  test("multimodal stub decode derives features from bytes deterministically") {
    val a = Multimodal.Asset(7L, "s", "Hello".getBytes("UTF-8"))
    val m = Multimodal.decodeStub(a)
    assert(m.n_bytes == 5 && m.width == 64 + 5 && m.height == 64 + 5)
    assert(m.first_byte == 'H'.toLong)
    assert(m.brightness == 'H'.toInt / 255.0)
    val empty = Multimodal.decodeStub(Multimodal.Asset(8L, "s", Array.emptyByteArray))
    assert(empty.first_byte == 0L && empty.n_bytes == 0L)
  }

  test("resizeStub halves dimensions until both fit the bound") {
    val m = Multimodal.DecodedAsset(1L, "s", 100L, 96L, 80L, 65L, 0.25)
    val r = Multimodal.resizeStub(m, maxDim = 50L)
    assert(r.width == 48L && r.height == 40L)
    val r2 = Multimodal.resizeStub(m, maxDim = 25L)
    assert(r2.width == 24L && r2.height == 20L)
    assert(Multimodal.resizeStub(m, maxDim = 100L) == m, "already within bound")
  }

  test("decodeAssets runs the decode boundary distributed") {
    val df = Seq((1L, "src", "abc".getBytes("UTF-8"))).toDF("doc_id", "source", "content")
    val out = Multimodal.decodeAssets(df).collect()(0)
    assert(out.getAs[Long]("n_bytes") == 3L)
    assert(out.getAs[Double]("brightness") == 'a'.toInt / 255.0)
  }

  test("decodeAssets accepts an injected decoder in place of the stub") {
    val df = Seq((1L, "src", Array[Byte](1, 2)), (2L, "src", Array[Byte](3)))
      .toDF("doc_id", "source", "content")
    // a "real codec" double: constant dimensions, brightness from length —
    // observably different from decodeStub, batch signature unchanged
    val custom: Seq[Multimodal.Asset] => Seq[Multimodal.DecodedAsset] =
      _.map(a => Multimodal.DecodedAsset(a.doc_id, a.source,
        a.content.length.toLong, 1920L, 1080L, -1L, a.content.length / 10.0))
    val out = Multimodal.decodeAssets(df, batchSize = 1, decoder = custom)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("width") == 1920L)
    assert(out(1L).getAs[Long]("first_byte") == -1L)
    assert(out(2L).getAs[Double]("brightness") == 0.1)
  }

  test("q90 pagerank output is rank-sorted, parity-consistent, positive") {
    val rows = SparkEntry.queries("q90_bipartite_pagerank")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("node")).distinct.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_supplier") == (r.getAs[Long]("node") % 2 == 1))
      assert(r.getAs[Long]("pr_ppb") > 0L, "damping floor keeps every rank positive")
      assert(r.getAs[Long]("deg") >= 1L)
    }
    rows.map(_.getAs[Long]("pr_ppb")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "top-20 must be rank-sorted")
      case _ =>
    }
  }

  test("q91 label vote bounds and agreement flag consistency") {
    val rows = SparkEntry.queries("q91_knn_label_vote")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val votes = r.getAs[Long]("n_votes")
      assert(votes >= 1L && votes <= 5L)
      assert(r.getAs[Boolean]("agree") ==
        (r.getAs[Long]("true_label") == r.getAs[Long]("voted_label")))
    }
  }

  test("q94 vocab coverage bounds: covered <= total, types_covered <= 10") {
    val rows = SparkEntry.queries("q94_vocab_coverage")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_types_covered") <=
        math.min(r.getAs[Long]("n_types"), 10L))
      assert(r.getAs[Long]("token_cov_ppm") <= 1000000L)
      assert(r.getAs[Long]("type_cov_ppm") <= 1000000L)
    }
  }

  test("q95 incremental dedup verdicts are internally consistent") {
    val rows = SparkEntry.queries("q95_incremental_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getAs[Boolean]("is_dup")
      assert(dup == (r.getAs[Long]("n_matches") > 0L))
      if (dup) {
        assert(r.getAs[Long]("best_jac_ppm") >= 300000L,
          "a dup's best match must clear the threshold")
        assert(r.getAs[Long]("best_ref") % 7 != 0L,
          "best match must come from the reference side")
      } else {
        assert(r.getAs[Long]("best_ref") === -1L)
        assert(r.getAs[Long]("best_jac_ppm") === 0L)
      }
    }
  }

  test("q92 k-anonymity histogram accounts for every document") {
    val rows = SparkEntry.queries("q92_k_anonymity")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "size histogram must partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("at_risk") == (r.getAs[Long]("group_size") < 5L))
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("group_size") * r.getAs[Long]("n_groups"))
    }
  }

  test("piiRedact counts and redacts planted PII, leaves clean text untouched") {
    // NB: patterns are unanchored by design (no \b in the RE2 subset),
    // so the clean text must not EMBED a valid shape — "555-12-3456" would
    // count as an id hit even inside a longer digit run
    val clean = "no pii here 12-34 or user at example dot com 555-12-34"
    val df = Seq(
      (1L, "reach me at a.b%x@c-corp.io or 555-123-4567 and id 987-65-4321 ok"),
      (2L, clean)).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_email") == 1 && r1.getAs[Long]("n_phone") == 1 &&
      r1.getAs[Long]("n_id") == 1)
    assert(r1.getAs[String]("redacted") ==
      "reach me at <EMAIL> or <PHONE> and id <ID> ok")
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_email") == 0 && r2.getAs[Long]("n_phone") == 0 &&
      r2.getAs[Long]("n_id") == 0)
    assert(r2.getAs[String]("redacted") == clean,
      "near-miss digit shapes must not be redacted")
  }

  test("piiRedact counts sequentially so overlapping classes never disagree with redaction") {
    // adversarial overlaps: a phone shape inside the email's local part,
    // an id shape overlapping the phone's tail. Sequential semantics:
    // each class counts on the text AFTER earlier classes redacted — the
    // embedded phone and the overlapped id are neither counted nor left
    // behind as full shapes.
    val df = Seq((1L, "call 555-123-4567@mail.com and 111-222-3333-44-5555 end"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.piiRedact(df, "text").collect()(0)
    assert(r.getAs[Long]("n_email") == 1)
    assert(r.getAs[Long]("n_phone") == 1, "the email-embedded phone must not be counted")
    assert(r.getAs[Long]("n_id") == 0, "the phone-overlapped id must not be counted")
    assert(r.getAs[String]("redacted") == "call <EMAIL> and <PHONE>-44-5555 end")
  }

  test("BPE apply chain merges greedily left-to-right with atomic units") {
    import graft.ops.Corpus
    val sep = "\u001f"
    def units(us: String*) = us.map(u => s"$sep$u$sep").mkString
    // merges: m0 = "an", m1 = "na" (priority order). On "banana":
    // m0 fires greedily non-overlapping: b|an|an|a. m1 must NOT then
    // match the 'n' inside a merged "an" unit against the trailing 'a'
    // — unit atomicity via the separator wrapping.
    val out = Seq(("banana", "an", "na"), ("aaaa", "aa", "na"))
      .toDF("w", "m0", "m1")
      .withColumn("s0", regexp_replace(col("w"), "(.)", sep + "$1" + sep))
      .withColumn("enc", expr(Corpus.bpeApplySql("s0", 2)))
      .collect().map(r => r.getAs[String]("w") -> r.getAs[String]("enc")).toMap
    assert(out("banana") == units("b", "an", "an", "a"),
      "greedy non-overlapping merge of 'an', no cross-unit 'na' merge")
    // "aaaa" + merge "aa": pairs merge left-to-right non-overlapping:
    // aa|aa (not a|aa|a) — exactly replace()'s scan order
    assert(out("aaaa") == units("aa", "aa"))
  }
}
