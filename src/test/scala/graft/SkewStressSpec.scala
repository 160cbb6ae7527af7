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
}
