package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Planted-skew stress proofs (round-7 VERDICT "Next round #7"): the
  * dedup pipeline's fan-out guards exercised on ADVERSARIAL fixtures —
  * a stop-shingle flood, a mega duplicate cluster, a long edit chain,
  * and a boilerplate band under the PPJoin prefix filter. Each test
  * first measures the quadratic blowup the guard exists to prevent,
  * then asserts the guarded path's exact bound and that the guard
  * never costs correctness (clusters stay connected; the exact join
  * stays exact).
  */
class SkewStressSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stop-shingle flood: df-cap collapses the C(n,2) pair blowup to zero") {
    // 200 docs, each 5 unique shingles + ONE boilerplate shingle shared
    // by all — the template-corpus adversary for any shingle self-join
    val sh = (0 until 200).flatMap(i =>
      (0 until 5).map(j => (i.toLong, s"u_${i}_$j")) :+ ((i.toLong, "hot"))
    ).toDF("doc_id", "sh")
    // uncapped: every pair collides on "hot" → C(200,2) candidates
    assert(Dedup.jaccardPairs(sh).count() == 199L * 200 / 2,
      "the flood shingle alone produces the full quadratic pair set")
    // df-capped at 50: the flood shingle (df=200) is dropped, the 1000
    // signal-bearing shingles survive, and no candidate pair remains
    val capped = Dedup.capDocFrequency(sh, maxDf = 50L)
    assert(capped.filter(col("sh") === "hot").count() == 0)
    assert(capped.count() == 200L * 5, "only the flood shingle is dropped")
    assert(Dedup.jaccardPairs(capped).count() == 0,
      "no spurious candidates survive the cap")
  }

  test("planted mega-cluster: anchor cap bounds candidates linearly, cluster stays whole") {
    val m = 100
    // m docs with IDENTICAL token sets → identical MinHash signatures →
    // every band lands the whole cluster in one bucket
    val sh = (0 until m).flatMap(i =>
      (0 until 8).map(j => (i.toLong, s"s$j"))).toDF("doc_id", "sh")
    val bands = Dedup.minhashBands(sh, numHashes = 16, bandSize = 4)
    // uncapped band join = C(m,2) distinct pairs — the s² bucket blowup
    val uncapped = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    assert(uncapped.count() == m.toLong * (m - 1) / 2)
    val k = 8
    val capped = Dedup.capBucketFanout(bands, k)
    val nc = capped.count()
    // exact bound: per bucket, each of the m members pairs with the ≤k
    // anchors below it → k·m − k(k+1)/2 pairs; all 4 bands produce the
    // SAME bucket membership here, so the distinct set is one bucket's
    assert(nc == k.toLong * m - k.toLong * (k + 1) / 2,
      s"anchor-star pair count, got $nc")
    assert(nc <= k.toLong * m * 4, "linear in members, never quadratic")
    // connectivity: components over the capped edges = ONE cluster of m
    val comp = Dedup.connectedComponents(capped)
      .groupBy("label").agg(count(lit(1)).as("n")).collect()
    assert(comp.length == 1 && comp.head.getAs[Long]("n") == m.toLong,
      "the anchor star keeps the mega-cluster one component")
  }

  test("1000-link chain converges inside the pointer-jumping round budget") {
    // worst-case diameter for label propagation: a chain of
    // incrementally-edited templates; pointer jumping must close it in
    // O(log n) ≈ 10 rounds, well inside connectedComponents' default 20
    val edges = (0 until 999).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val rows = Dedup.connectedComponents(edges).collect()
    assert(rows.length == 1000)
    assert(rows.forall(_.getAs[Long]("label") == 0L),
      "every node adopts the chain's minimum label — converged, not truncated")
  }

  test("q115 twin-collapse equals the direct census on a planted twin/variant corpus") {
    // 3 twin families (exact copies: multiplicities 12, 7, 1) + 2 edited
    // VARIANTS of family A (near-dup, not twins) + 30 unique docs — the
    // fixture exercises every algebra term: intra-class edges/triangles
    // (C(m,2)/C(m,3)), cross-class 2+1 triangles via the variant edges,
    // and rep-graph 1+1+1 triangles if A and both variants interlink.
    val base = (0 until 30).map(w => s"t$w").mkString(" ")
    def variant(k: Int) =
      ((0 until 27).map(w => s"t$w") ++ (0 until 3).map(j => s"v${k}_$j"))
        .mkString(" ")
    val famB = (0 until 24).map(w => s"b$w").mkString(" ")
    val docs = ((0 until 12).map(i => (i.toLong, base)) ++
      Seq((100L, variant(1)), (101L, variant(2))) ++
      (0 until 7).map(i => (200L + i, famB)) ++
      (0 until 30).map(i => (300L + i,
        (0 until 20).map(j => s"u_${i}_$j").mkString(" ")))
    ).map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("twincensus").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.queries("q115_dup_triangles")(spark, dir).collect()(0)
    graft.ops.Caches.clear()
    // DIRECT census: the uncollapsed LSH chain (minhashVerifiedPairs is
    // the same public kernel q26/q65 consume) + collections counting
    val edges = Dedup.minhashVerifiedPairs(spark, dir)
      .filter(col("jac") >= 0.6).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.ops.Caches.clear()
    val deg = scala.collection.mutable.HashMap.empty[Long, Long]
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
    }
    val eset = edges.toSet
    val tris = (for {
      (a, b) <- edges; (c, d) <- edges if b == c
      if eset.contains((a, d))
    } yield 1L).sum
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    assert(got.getAs[Long]("n_nodes") == deg.size.toLong)
    assert(got.getAs[Long]("n_edges") == edges.length.toLong)
    assert(got.getAs[Long]("n_wedges") == wedges)
    assert(got.getAs[Long]("n_triangles") == tris)
    // the fixture really exercises the collapse: twins exist (m up to
    // 12) AND a cross-class near-dup edge exists (variant ~ base)
    assert(got.getAs[Long]("n_triangles") >= 12L * 11 * 10 / 6 + 7L * 6 * 5 / 6,
      "both twin families must contribute their C(m,3) triangles")
    assert(got.getAs[Long]("n_edges") > 12L * 11 / 2 + 7L * 6 / 2,
      "at least one cross-class (variant) edge must exist")
  }

  test("q118 PPJoin stays exact under a global boilerplate band + template block") {
    // 60 docs: 10 verbatim template copies + 50 unique bodies; EVERY doc
    // ends with the same boilerplate sentence — the prefix filter's
    // adversary (a hot token band that must not flood the candidates)
    val boiler = "all rights reserved contact us for more information today ok"
    def uniq(i: Int) = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
    val docs = (0 until 60).map { i =>
      val text =
        if (i < 10) s"the quick brown template body repeated verbatim $boiler"
        else s"${uniq(i)} $boiler"
      (i.toLong, text, "en", "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("skewfix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.queries("q118_prefix_filter_join")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.ops.Caches.clear()
    // exhaustive mirror over the identical shingle universe
    val toks = docs.withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.shingleExpr("t", 3))).as("sh"))
    val expected = Dedup.jaccardPairs(toks)
      .filter(col("common") * 3 >= col("na") + col("nb"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, "prefix+position filtering must lose nothing")
    // and the duplicates are exactly the template block's C(10,2) pairs —
    // the boilerplate band produced zero false positives
    val tmpl = (for (a <- 0 until 10; b <- a + 1 until 10)
      yield (a.toLong, b.toLong)).toSet
    assert(got == tmpl, s"expected the 45 template pairs, got ${got.size}")
  }

  test("q26 twin-collapse expansion equals the uncollapsed verified pair list") {
    // same fixture family as the q115 census test: twin classes
    // (multiplicities 9 and 5), two near-dup variants, unique fill —
    // the collapsed front must reproduce the RAW chain's (doc_a, doc_b,
    // common, na, nb, jac) rows exactly, intra AND cross, including the
    // na/nb orientation after least/greatest canonicalization.
    val base = (0 until 30).map(w => s"t$w").mkString(" ")
    def variant(k: Int) =
      ((0 until 27).map(w => s"t$w") ++ (0 until 3).map(j => s"v${k}_$j"))
        .mkString(" ")
    val famB = (0 until 24).map(w => s"b$w").mkString(" ")
    val docs = ((0 until 9).map(i => (i.toLong, base)) ++
      Seq((100L, variant(1)), (101L, variant(2))) ++
      (0 until 5).map(i => (200L + i, famB)) ++
      (0 until 20).map(i => (300L + i,
        (0 until 20).map(j => s"u_${i}_$j").mkString(" ")))
    ).map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q26collapse").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getAs[Long]("common"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"),
        math.round(r.getAs[Double]("jac") * 1e12))
    // the collapsed q26 WITHOUT the top-100 cut (the fixture emits
    // fewer rows than the cap anyway, so the query output is the set)
    val got = Dedup.queries("q26_minhash_lsh")(spark, dir)
      .collect().map(key).toSet
    graft.ops.Caches.clear()
    val expected = Dedup.minhashVerifiedPairs(spark, dir)
      .select("doc_a", "doc_b", "common", "na", "nb", "jac")
      .collect().map(key).toSet
    graft.ops.Caches.clear()
    assert(expected.size < 100, "fixture must fit inside q26's top-100 cut")
    assert(got == expected,
      "collapsed-front q26 must equal the raw LSH chain row-for-row")
    // the fixture genuinely exercises both expansion legs
    assert(expected.count { case (_, _, _, _, _, j) => j == 1000000000000L }
      >= 9 * 8 / 2 + 5 * 4 / 2, "intra-class (jac = 1) pairs present")
    assert(expected.exists { case (_, _, _, _, _, j) => j < 1000000000000L },
      "cross-class (jac < 1) pairs present")
  }

  // Shared twin-class fixture + uncollapsed per-pair replay for the
  // round-11 q156/q424 collapse fronts: signatures and verified pairs of
  // the RAW (uncollapsed) LSH chain, folded in plain Scala.
  private def collapseFixture(): (String,
      Map[Long, Vector[Long]],
      Seq[(Long, Long, Long, Long, Long)]) = {
    val base = (0 until 30).map(w => s"t$w").mkString(" ")
    def variant(k: Int) =
      ((0 until 27).map(w => s"t$w") ++ (0 until 3).map(j => s"v${k}_$j"))
        .mkString(" ")
    val famB = (0 until 24).map(w => s"b$w").mkString(" ")
    val docs = ((0 until 9).map(i => (i.toLong, base)) ++
      Seq((100L, variant(1)), (101L, variant(2))) ++
      (0 until 5).map(i => (200L + i, famB)) ++
      (0 until 20).map(i => (300L + i,
        (0 until 20).map(j => s"u_${i}_$j").mkString(" ")))
    ).map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("collapse2").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.shingleExpr("t", 3))).as("sh"))
    val sigMap = Dedup.minhashSignatureWide(toks, 16).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
    val pairs = Dedup.minhashVerifiedPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("common"), r.getAs[Long]("na"), r.getAs[Long]("nb")))
      .toSeq
    graft.ops.Caches.clear()
    (dir, sigMap, pairs)
  }

  test("q156 collapse front equals the uncollapsed per-pair calibration") {
    val (dir, sigMap, pairs) = collapseFixture()
    val expected = pairs.groupBy { case (a, b, c, na, nb) =>
      val m = sigMap(a).zip(sigMap(b)).count { case (x, y) => x == y }.toLong
      math.abs(m * 1000000L / 16 - c * 1000000L / (na + nb - c)) / 100000L
    }.map { case (dec, ps) =>
      val sums = ps.map { case (a, b, c, na, nb) =>
        val m = sigMap(a).zip(sigMap(b)).count { case (x, y) => x == y }.toLong
        (m * 1000000L / 16, c * 1000000L / (na + nb - c))
      }
      (dec, ps.size.toLong, sums.map(_._1).sum, sums.map(_._2).sum)
    }.toSet
    val got = Dedup.queries("q156_minhash_calibration")(spark, dir)
      .collect().map(r => (r.getAs[Long]("err_decile"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("sum_est_ppm"),
        r.getAs[Long]("sum_exact_ppm"))).toSet
    graft.ops.Caches.clear()
    assert(got == expected,
      "collapsed-front q156 must equal the raw per-pair histogram")
  }

  test("q424 collapse front equals the uncollapsed per-pair band sweep") {
    val (dir, sigMap, pairs) = collapseFixture()
    def collided(va: Vector[Long], vb: Vector[Long], r: Int): Boolean =
      (0 until 16 / r).exists(bi =>
        (0 until r).forall(p => va(bi * r + p) == vb(bi * r + p)))
    val cells = for {
      r <- Seq(1, 2, 4, 8)
      (a, b, c, na, nb) <- pairs
    } yield {
      val dec = c * 1000000L / (na + nb - c) / 100000L
      ((16L / r, r.toLong, dec),
        if (collided(sigMap(a), sigMap(b), r)) 1L else 0L)
    }
    val expected = cells.groupBy(_._1).map { case ((bb, rr, dec), cs) =>
      val n = cs.size.toLong
      val nc = cs.map(_._2).sum
      // the q424 S-curve tail replayed in plain integers
      val s = math.min(dec * 100 + 50, 1000L)
      val p2 = s * s / 1000; val p4 = p2 * p2 / 1000; val p8 = p4 * p4 / 1000
      val q1 = 1000L - (rr match {
        case 1L => s; case 2L => p2; case 4L => p4; case _ => p8 })
      val q2 = q1 * q1 / 1000; val q4 = q2 * q2 / 1000
      val q8 = q4 * q4 / 1000; val q16 = q8 * q8 / 1000
      val exp = (1000L - (bb match {
        case 2L => q2; case 4L => q4; case 8L => q8; case _ => q16 })) * 1000L
      (bb, rr, dec, n, nc, nc * 1000000L / n, exp)
    }.toSet
    val got = Dedup.queries("q424_lsh_band_plan")(spark, dir)
      .collect().map(r => (r.getAs[Long]("bands"),
        r.getAs[Long]("rows_per_band"), r.getAs[Long]("decile"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("n_collide"),
        r.getAs[Long]("measured_ppm"), r.getAs[Long]("expected_ppm"))).toSet
    graft.ops.Caches.clear()
    assert(got == expected,
      "collapsed-front q424 must equal the raw per-pair plan sweep")
  }

  test("q27 fingerprint-collapse front equals a plain-Scala simhash replay") {
    val (dir, _, _) = collapseFixture()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h32(sx: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val fps = docs.map { case (id, text) =>
      val votes = Array.fill(32)(0L)
      text.split(" ", -1).foreach { t =>
        val h = h32(t)
        (0 until 32).foreach(i =>
          votes(i) += (if (((h >> i) & 1L) == 1L) 1 else -1))
      }
      id -> (0 until 32).map(i => if (votes(i) > 0) 1L << i else 0L).sum
    }.toMap
    val expected = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq
      if a < b
      if (0 until 4).exists(bd =>
        ((fa >> (bd * 8)) & 255L) == ((fb >> (bd * 8)) & 255L))
      h = java.lang.Long.bitCount(fa ^ fb).toLong
      if h <= 6
    } yield (a, b, h)).toSet
    assert(expected.size < 100, "fixture must fit inside q27's top-100 cut")
    assert(expected.exists(_._3 == 0L) && expected.exists(_._3 > 0L),
      "fixture exercises both the intra (hamming 0) and cross legs")
    val got = Dedup.queries("q27_simhash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toSet
    graft.ops.Caches.clear()
    assert(got == expected,
      "collapsed-front q27 must equal the brute-force simhash chain")
  }

  test("q95 collapse front equals the uncollapsed incremental-dedup view") {
    val (dir, _, pairs) = collapseFixture()
    // reference: the raw straddling-pair view over the uncollapsed chain
    val straddling = pairs
      .map { case (a, b, c, na, nb) => (a, b, c * 1000000L / (na + nb - c)) }
      .filter { case (a, b, j) => ((a % 7 == 0) != (b % 7 == 0)) && j >= 300000L }
      .map { case (a, b, j) => if (a % 7 == 0) (a, b, j) else (b, a, j) }
    val byDoc = straddling.groupBy(_._1)
    val shardDocs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 7 == 0).sorted
    val expected = shardDocs.map { id =>
      byDoc.get(id) match {
        case Some(ms) =>
          val best = ms.minBy { case (_, ref, j) => (-j, ref) }
          (id, ms.size.toLong, best._2, best._3, true)
        case None => (id, 0L, -1L, 0L, false)
      }
    }.toSeq
    val got = Dedup.queries("q95_incremental_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_matches"),
        r.getAs[Long]("best_ref"), r.getAs[Long]("best_jac_ppm"),
        r.getAs[Boolean]("is_dup"))).toSeq
    graft.ops.Caches.clear()
    assert(got == expected,
      "collapsed-front q95 must equal the raw straddling-pair view")
  }

  test("q74 equals an independently-derived df-capped containment join") {
    // Harness for any future q74 rework (round 11 tried a twin-collapse
    // front: exact, but ~2× slower at the gated sf0.1 — reverted; the
    // fixture stays so a re-attempt has its equality proof ready):
    // - 60 twins of X: every X shingle has df = 60 > 50 → fully capped,
    //   so the 60-copy family must emit ZERO pairs;
    // - a 'hot1 hot2 hot3' trigram carried by 45 unique docs AND the
    //   9-copy base family: a collapse front must weight its df census
    //   by multiplicity (54 > 50 capped) or diverge here;
    // - base twins + two near-variants: intra and cross pairs survive.
    val famX = (0 until 28).map(w => s"x$w").mkString(" ")
    val base = "hot1 hot2 hot3 " + (0 until 27).map(w => s"t$w").mkString(" ")
    def variant(k: Int) =
      ((0 until 24).map(w => s"t$w") ++ (0 until 3).map(j => s"v${k}_$j"))
        .mkString(" ")
    val docs = ((0 until 60).map(i => (i.toLong, famX)) ++
      (0 until 9).map(i => (100L + i, base)) ++
      Seq((200L, variant(1)), (201L, variant(2))) ++
      (0 until 45).map(i => (300L + i,
        s"hot1 hot2 hot3 " + (0 until 10).map(j => s"u_${i}_$j").mkString(" ")))
    ).map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q74collapse").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.shingleExpr("t", 3))).as("sh"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getAs[Long]("common"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"))
    val expected = Dedup.jaccardPairs(Dedup.capDocFrequency(toks, 50L))
      .filter(col("common") * 2 >= least(col("na"), col("nb")))
      .select("doc_a", "doc_b", "common", "na", "nb")
      .collect().map(key).toSet
    graft.ops.Caches.clear()
    val got = Dedup.queries("q74_containment")(spark, dir)
      .select("doc_a", "doc_b", "common", "na", "nb")
      .collect().map(key).toSet
    graft.ops.Caches.clear()
    assert(expected.nonEmpty, "fixture must produce surviving pairs")
    assert(!expected.exists { case (a, b, _, _, _) => a < 60 && b < 60 },
      "the fully-capped 60-copy family must emit nothing")
    assert(got == expected,
      "q74 must equal the independently-derived df-capped join")
  }
}
