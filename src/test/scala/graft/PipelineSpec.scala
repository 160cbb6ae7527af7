package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pipeline

/** Invariants for the round-6 pipeline operators (q181–q185) that the
  * DuckDB hash-compare cannot express: cap saturation, fold
  * conservation, sketch-vs-exact sanity, and a JVM first-principles
  * replay of the q181 hash-rank rule (so the engine-neutral hash and
  * the rank order are pinned by something other than the two engines
  * agreeing with each other).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def neutralHash32(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(8), 16)

  test("q181 keeps exactly min(cap, n_docs) per source, and the kept mass matches a JVM replay of the hash-rank rule") {
    val rows = Pipeline.queries("q181_source_cap")(spark, sf).collect()
    rows.foreach { r =>
      val (nDocs, nKept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(nKept == math.min(Pipeline.SourceCap.toLong, nDocs),
        s"${r.getAs[String]("source")}: kept $nKept of $nDocs")
      assert(r.getAs[Long]("kept_chars") <= r.getAs[Long]("total_chars"))
    }
    // first-principles replay: rank docs per source by (hash, doc_id)
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val kept = ds.sortBy(d => (neutralHash32(s"cap:${d._2}"), d._2))
        .take(Pipeline.SourceCap)
      src -> kept.map(_._3).sum
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_chars") == expected(r.getAs[String]("source")),
        s"kept_chars mismatch for ${r.getAs[String]("source")}")
    }
  }

  test("q194 triple supports equal a plain-Scala basket replay") {
    // pins the round-12 in-row C(32,3) expansion against the
    // definition: support(a,b,c) = #baskets (distinct part sets, size
    // <= 32) containing all three, triples canonical ascending
    val items = graft.model.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).map(_._2.map(_._2).toSet)
      .filter(b => b.nonEmpty && b.size <= 32).toSeq
    val support = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    baskets.foreach { b =>
      val ps = b.toSeq.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length; k <- j + 1 until ps.length)
        support((ps(i), ps(j), ps(k))) =
          support.getOrElse((ps(i), ps(j), ps(k)), 0L) + 1L
    }
    val expTop = support.toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(20)
    val rows = Pipeline.queries("q194_basket_triples")(spark, sf).collect()
    assert(rows.length == math.min(20, support.size))
    rows.zip(expTop).foreach { case (r, ((a, b, c), s)) =>
      assert((r.getAs[Long]("p_a"), r.getAs[Long]("p_b"),
        r.getAs[Long]("p_c")) == ((a, b, c)), "triple order")
      assert(r.getAs[Long]("support") == s)
      assert(r.getAs[Long]("supp_ppm") == s * 1000000L / baskets.length)
    }
  }

  test("q182 distinct counts are ordered: ndv_norm <= ndv_raw <= n_docs") {
    Pipeline.queries("q182_norm_dedup")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("ndv_norm") <= r.getAs[Long]("ndv_raw"))
      assert(r.getAs[Long]("ndv_raw") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q183 folds partition the corpus: KFolds rows, doc counts conserve, shares sum to ~1e6") {
    val rows = Pipeline.queries("q183_kfold_balance")(spark, sf).collect()
    assert(rows.length == Pipeline.KFolds)
    val total = graft.model.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val shareSum = rows.map(_.getAs[Long]("docs_ppm")).sum
    assert(shareSum > 1000000L - Pipeline.KFolds && shareSum <= 1000000L,
      s"floor-ppm shares sum $shareSum")
  }

  test("q184 union sketch row dominates per-source exact counts and registers stay in range") {
    val rows = Pipeline.queries("q184_hll_estimate")(spark, sf).collect()
    val (all, per) = rows.partition(_.getAs[String]("source") == "__all__")
    assert(all.length == 1)
    val allExact = all.head.getAs[Long]("n_exact")
    per.foreach { r =>
      assert(r.getAs[Long]("n_exact") <= allExact)
      assert(r.getAs[Long]("n_empty") >= 0 && r.getAs[Long]("n_empty") <= 64)
      assert(r.getAs[Long]("hll_raw_est") > 0)
    }
  }

  test("q191 IPF weights are positive, mass-conserving, and the LAST-scaled axis is near-exact") {
    val rows = Pipeline.queries("q191_ipf_raking")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("weight_u") > 0)
      // the final pass scaled columns, so the column marginal can be off
      // only by the per-cell floor losses (≪ 100 ppm on this grid)
      assert(r.getAs[Long]("col_dev_ppm") <= 100L,
        s"col_dev ${r.getAs[Long]("col_dev_ppm")}")
    }
    val total = graft.model.Tables.documents(spark, sf).count()
    val wSum = rows.map(_.getAs[Long]("weight_u")).sum
    // raking preserves total mass up to accumulated floor error
    assert(math.abs(wSum - total * 1000000L) <= total * 1000L,
      s"mass drift: $wSum vs ${total * 1000000L}")
  }

  test("q193 confusability matrix is the strict upper triangle with cosines in [-1, 1]") {
    val rows = SparkEntry.queries("q193_label_confusability")(spark, sf).collect()
    val labels = graft.model.Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(rows.length == labels * (labels - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("label_a") < r.getAs[Long]("label_b"))
      val c = r.getAs[Long]("cos_ppb")
      assert(c >= -1000000000L && c <= 1000000000L)
    }
  }

  test("q201 ranks are a 1..n permutation and rank-1 deviation is zero") {
    val rows = SparkEntry.queries("q201_zipf_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ranks = rows.map(_.getAs[Long]("r")).sorted
    assert(ranks.sameElements(1L to ranks.length.toLong),
      "predecessor-count rank must be a dense permutation")
    assert(rows.find(_.getAs[Long]("r") == 1L).get.getAs[Long]("dev_ppm") == 0L)
  }

  test("q202 emits the full lang-pair grid with zero rows preserved") {
    val rows = SparkEntry.queries("q202_crosslingual_dups")(spark, sf).collect()
    val nLangs = graft.model.Tables.documents(spark, sf)
      .select("lang").distinct().count()
    assert(rows.length == nLangs * (nLangs - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("lang_a") < r.getAs[String]("lang_b"))
      assert(r.getAs[Long]("n_shared_fps") >= 0)
    }
  }

  test("q185 deciles are in [0,10] and doc counts conserve over the >=2-token domain") {
    val rows = Pipeline.queries("q185_bigram_novelty")(spark, sf).collect()
    rows.foreach { r =>
      val dec = r.getAs[Long]("decile")
      assert(dec >= 0 && dec <= 10, s"decile $dec")
    }
    import org.apache.spark.sql.functions._
    val eligible = graft.model.Tables.documents(spark, sf)
      .filter(size(graft.ops.TextAnalysis.tokens(col("text"))) >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == eligible)
  }
}
