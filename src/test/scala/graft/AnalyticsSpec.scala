package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Analytics

/** First-principles invariants for the q264+ analytics operators that the
  * DuckDB hash-compare cannot express: the two identities that DEFINE
  * Hamilton apportionment (budget conservation, within-one-of-ideal), the
  * q265 detectors actually firing on injected contamination, and a Scala
  * replay of the Chao1/Good–Turing sufficient statistics.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q264 allocations conserve the budget exactly and stay within one doc of ideal") {
    val rows = Analytics.queries("q264_quota_apportionment")(spark, sf).collect()
    assert(rows.nonEmpty)
    val b = 10000L
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(rows.map(_.getAs[Long]("alloc")).sum == b, "Hamilton conserves the budget")
    rows.foreach { r =>
      val ideal = b.toDouble * r.getAs[Long]("n_docs") / total
      val alloc = r.getAs[Long]("alloc").toDouble
      assert(math.abs(alloc - ideal) < 1.0, s"${r.getAs[String]("source")}: $alloc vs $ideal")
      assert(alloc.toLong == r.getAs[Long]("floor_alloc") ||
        alloc.toLong == r.getAs[Long]("floor_alloc") + 1)
    }
    // every +1 went to a remainder no smaller than any non-extra's
    val extras = rows.filter(r => r.getAs[Long]("alloc") > r.getAs[Long]("floor_alloc"))
      .map(_.getAs[Long]("rem_num"))
    val plain = rows.filter(r => r.getAs[Long]("alloc") == r.getAs[Long]("floor_alloc"))
      .map(_.getAs[Long]("rem_num"))
    if (extras.nonEmpty && plain.nonEmpty)
      assert(extras.min >= plain.max, "largest remainders win the extras")
  }

  test("q265 is all-zero on the clean fixture yet fires on injected mojibake") {
    val rows = Analytics.queries("q265_encoding_residue")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r => // clean corpus: zeros are measured rows, not absent ones
      assert(r.getAs[Long]("repl_chars") == 0L)
      assert(r.getAs[Long]("ctrl_chars") == 0L)
      assert(r.getAs[Long]("repl_ppm") == 0L)
    }
    // detector mechanics on injected contamination, same expressions
    import spark.implicits._
    val dirty = Seq(
      ("a", "clean text"),
      ("a", "bad � byte �� here"),
      ("b", "ctl\u0001and\u0002more")).toDF("source", "text")
    val got = dirty.select(col("source"),
        (length(col("text")) - length(expr("replace(text, '�', '')"))).as("nr"),
        (length(col("text")) - length(regexp_replace(col("text"),
          lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), lit("")))).as("nc"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Int]("nr"), r.getAs[Int]("nc")))
    assert(got.contains(("a", 0, 0)))
    assert(got.contains(("a", 3, 0)))
    assert(got.contains(("b", 0, 2)))
  }

  test("q266 matches a Scala replay of the singleton/doubleton statistics") {
    val rows = Analytics.queries("q266_chao1_richness")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.model.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val counts = byLang(lang).flatMap(_._2.split(" ", -1))
        .groupBy(identity).map(_._2.length.toLong)
      val v = counts.size.toLong
      val n = counts.sum
      val f1 = counts.count(_ == 1L).toLong
      val f2 = counts.count(_ == 2L).toLong
      assert(r.getAs[Long]("v_types") == v)
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("f1") == f1)
      assert(r.getAs[Long]("f2") == f2)
      assert(r.getAs[Long]("chao1_est") == v + f1 * (f1 - 1) / (2 * (f2 + 1)))
      assert(r.getAs[Long]("chao1_est") >= v, "Chao1 never estimates below the observed vocabulary")
      assert(r.getAs[Long]("gt_unseen_ppm") == f1 * 1000000L / n)
    }
  }

  test("q267 sufficient statistics match a BigInt replay and the normal equations solve") {
    val r = Analytics.queries("q267_ols_two_feature")(spark, sf).collect().head
    val rows = graft.model.Tables.lineitem(spark, sf)
      .select(
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 100"),
        expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"))
      .collect().map(x => (BigInt(x.getLong(0)), BigInt(x.getLong(1)), BigInt(x.getLong(2))))
    val n = BigInt(rows.length)
    def s(f: ((BigInt, BigInt, BigInt)) => BigInt) = rows.map(f).sum
    val (sx1, sx2, sy) = (s(_._2), s(_._3), s(_._1))
    val s11 = n * s(t => t._2 * t._2) - sx1 * sx1
    val s12 = n * s(t => t._2 * t._3) - sx1 * sx2
    val s22 = n * s(t => t._3 * t._3) - sx2 * sx2
    val s1y = n * s(t => t._2 * t._1) - sx1 * sy
    val s2y = n * s(t => t._3 * t._1) - sx2 * sy
    assert(BigInt(r.getAs[Long]("s11")) == s11)
    assert(BigInt(r.getAs[Long]("s12")) == s12)
    assert(BigInt(r.getAs[Long]("s22")) == s22)
    assert(BigInt(r.getAs[Long]("s1y")) == s1y)
    assert(BigInt(r.getAs[Long]("s2y")) == s2y)
    val det = s11 * s22 - s12 * s12
    assert(det > 0, "centered Gram matrix of non-collinear regressors is PD")
    val b1 = (BigDecimal(s1y * s22 - s2y * s12) / BigDecimal(det)).toDouble
    assert(math.abs(r.getAs[Double]("b1") - b1) < math.abs(b1) * 1e-9)
  }

  test("q268 affinity is bounded by the floored self-affinity and replays exactly") {
    val rows = Analytics.queries("q268_hellinger_affinity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "lang").collect().map(r => (r.getString(0), r.getString(1)))
    val nt = docs.length.toLong
    val gl = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = docs.filter(_._1 == src)
      val ns = mine.length.toLong
      val bc = mine.groupBy(_._2).map { case (l, xs) =>
        val p = xs.length.toLong * 1000000L / ns
        val q = gl(l) * 1000000L / nt
        math.floor(math.sqrt((p * q).toDouble)).toLong
      }.sum
      assert(r.getAs[Long]("bc_micro") == bc)
      assert(bc <= 1000000L, "Cauchy-Schwarz bounds the affinity")
      assert(r.getAs[Long]("h2_micro") == 1000000L - bc)
    }
  }

  test("q269 the ideal ordering dominates (rearrangement) and ndcg is a proper ppm") {
    val rows = Analytics.queries("q269_ndcg_at_10")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rated") <= 10)
      assert(r.getAs[Long]("idcg_micro") >= r.getAs[Long]("dcg_micro"),
        "sorting by relevance maximizes the discounted sum")
      assert(r.getAs[Long]("ndcg_ppm") >= 0 && r.getAs[Long]("ndcg_ppm") <= 1000000L)
    }
  }

  test("q270 run counts replay exactly and the dictionary width is the ceil-log2") {
    val rows = Analytics.queries("q270_encoding_advisor")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "doc_id", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val langs = docs.filter(_._1 == src).sortBy(_._2).map(_._3)
      val runs = 1 + langs.zip(langs.tail).count { case (a, b) => a != b }
      val ndv = langs.distinct.length.toLong
      assert(r.getAs[Long]("n_runs") == runs.toLong)
      assert(r.getAs[Long]("ndv") == ndv)
      assert(r.getAs[Long]("n_runs") >= ndv, "each distinct value opens at least one run")
      val bits = (0 to 31).find(b => (1L << b) >= ndv).get.toLong
      assert(r.getAs[Long]("dict_bits") == bits)
    }
  }

  test("q271 captures partition the population: |A| + |B| − |A∩B| = exact V") {
    val r = Analytics.queries("q271_capture_recapture")(spark, sf).collect().head
    // every doc is even or odd, so the capture union IS the population —
    // the inclusion-exclusion identity must hold exactly
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") - r.getAs[Long]("m_both")
      == r.getAs[Long]("exact_v"))
    assert(r.getAs[Long]("m_both") > 0, "shared fingerprints make the estimator defined")
    val est = r.getAs[Long]("est_chapman")
    assert(est == (r.getAs[Long]("n_a") + 1) * (r.getAs[Long]("n_b") + 1) /
      (r.getAs[Long]("m_both") + 1) - 1)
    assert(r.getAs[Long]("abs_err_ppm") ==
      math.abs(est - r.getAs[Long]("exact_v")) * 1000000L / r.getAs[Long]("exact_v"))
  }

  test("q272 correlations are proper and r_qty_price replays from the base sums") {
    val r = Analytics.queries("q272_corr_matrix")(spark, sf).collect().head
    val rs = Seq("r_qty_price", "r_qty_disc", "r_qty_tax",
      "r_price_disc", "r_price_tax", "r_disc_tax").map(c => c -> r.getAs[Double](c))
    rs.foreach { case (c, v) =>
      assert(v >= -1.0 && v <= 1.0, s"$c = $v out of [-1, 1]") }
    // replay the first entry with the same quantization from raw rows
    val rows = graft.model.Tables.lineitem(spark, sf)
      .select(expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 100"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = rows.length.toDouble
    val (sa, sb) = (rows.map(_._1).sum.toDouble, rows.map(_._2).sum.toDouble)
    val saa = rows.map(t => t._1 * t._1).sum.toDouble
    val sbb = rows.map(t => t._2 * t._2).sum.toDouble
    val sab = rows.map(t => t._1 * t._2).sum.toDouble
    val expect = (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    assert(math.abs(r.getAs[Double]("r_qty_price") - expect) < 1e-12)
  }

  test("q273 cells cover every joined line exactly once and did assembles from the cells") {
    val r = Analytics.queries("q273_did_promo")(spark, sf).collect().head
    val total = graft.model.Tables.lineitem(spark, sf).count()
    val cells = Seq("t1", "t0", "c1", "c0")
    assert(cells.map(c => r.getAs[Long](s"n_$c")).sum == total,
      "treated×post cells partition the fact table")
    cells.foreach { c =>
      assert(r.getAs[Long](s"mean_${c}_u") ==
        r.getAs[Long](s"s_$c") / r.getAs[Long](s"n_$c"))
    }
    def m(c: String) = r.getAs[Long](s"s_$c").toDouble / r.getAs[Long](s"n_$c")
    assert(math.abs(r.getAs[Double]("did_u") - ((m("t1") - m("t0")) - (m("c1") - m("c0"))))
      < 1e-6)
  }

  test("q274 rendezvous hashing moves an order of magnitude less than mod-N") {
    val r = Analytics.queries("q274_reshard_audit")(spark, sf).collect().head
    val n = r.getAs[Long]("n_docs")
    assert(n > 0)
    // mod-N reshuffles ~16/17 ≈ 941k ppm; HRW only what the new shard
    // wins, ~1/17 ≈ 59k ppm — the structural gap is the whole point
    assert(r.getAs[Long]("mod_ppm") > 800000L)
    assert(r.getAs[Long]("hrw_ppm") < 200000L)
    assert(r.getAs[Long]("moved_hrw") < r.getAs[Long]("moved_mod"))
    assert(r.getAs[Long]("mod_ppm") == r.getAs[Long]("moved_mod") * 1000000L / n)
  }

  test("q275 tvd is a proper ppm distance and replays on one class from raw rows") {
    val rows = Analytics.queries("q275_t_closeness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("tvd_ppm")
      assert(t >= 0 && t <= 1000000L)
      assert(r.getAs[Boolean]("at_risk") == (t > 300000L))
    }
    // replay the first class
    val j = graft.model.Tables.orders(spark, sf)
      .join(graft.model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(year(col("o_orderdate")).cast("long"), col("c_mktsegment"),
        col("c_nationkey").cast("long"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val nt = j.length.toLong
    val gl = j.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    val h = rows.head
    val mine = j.filter(x => x._1 == h.getAs[Long]("yr") &&
      x._2 == h.getAs[String]("c_mktsegment"))
    val nc = mine.length.toLong
    val cls = mine.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    val l1 = gl.keys.map { k =>
      math.abs(cls.getOrElse(k, 0L) * 1000000L / nc - gl(k) * 1000000L / nt)
    }.sum
    assert(h.getAs[Long]("tvd_ppm") == l1 / 2)
    assert(h.getAs[Long]("n_orders") == nc)
  }

  test("q276 decile maps are monotone in the decile and self-normalization is zero shift") {
    val rows = Analytics.queries("q276_quantile_normalization")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (_, rs) =>
      assert(rs.length == 9, "nine deciles per source")
      val sorted = rs.sortBy(_.getAs[Long]("decile"))
      val own = sorted.map(_.getAs[Long]("v_own"))
      val pool = sorted.map(_.getAs[Long]("v_pool"))
      assert(own.zip(own.tail).forall { case (a, b) => a <= b }, "own deciles monotone")
      assert(pool.zip(pool.tail).forall { case (a, b) => a <= b }, "pooled deciles monotone")
      sorted.foreach { r =>
        assert(r.getAs[Long]("shift") ==
          r.getAs[Long]("v_own") - r.getAs[Long]("v_pool"))
      }
    }
    // the pooled column is identical across sources (it IS the target)
    val pools = rows.groupBy(_.getAs[Long]("decile"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("v_pool")).distinct.length }
    assert(pools.forall(_ == 1))
  }

  test("q277 the conformal index over-covers by construction") {
    val rows = Analytics.queries("q277_conformal_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val k = r.getAs[Long]("k_idx")
      assert(k == (9 * (n + 1) + 9) / 10, "finite-sample ceil((n+1)·0.9) index")
      // realized calibration coverage clears the nominal level whenever
      // the index is attainable (k ≤ n)
      assert(k <= n, "fixture languages are large enough for a defined q-hat")
      // coverage at q-hat reaches at least k/n ≥ 0.9 — the conformal guarantee
      assert(r.getAs[Long]("realized_ppm") >= k * 1000000L / n)
      assert(k * 1000000L / n >= 899999L)
    }
  }

  test("q278 the moment matrix is symmetric in its summary and the diagonal dominates") {
    val r = Analytics.queries("q278_covariance_anisotropy")(spark, sf).collect().head
    val dims = r.getAs[Long]("dims")
    val width = graft.model.Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).collect().head.getInt(0).toLong
    assert(dims == width, "every vector dimension appears in the grid")
    assert(r.getAs[Long]("trace_q") > 0, "total variance is positive")
    assert(r.getAs[Long]("offdiag_q") >= 0)
    assert(r.getAs[Long]("top_abs") > 0)
    val (i, j) = (r.getAs[Long]("top_i"), r.getAs[Long]("top_j"))
    assert(i >= 0 && i < dims && j >= 0 && j < dims && i != j)
    // C(i,j) = C(j,i): the mirrored cell must carry the same |value|, so
    // the recorded max is attained at (i,j) AND (j,i) — the argmax key
    // rule then forces i*1024+j to be the smaller encoding
    assert(i * 1024 + j < j * 1024 + i)
    val anis = r.getAs[Long]("anisotropy_ppm")
    assert(anis >= 0 && anis < 1000000L,
      "mean |off-diagonal| stays below mean diagonal variance on near-isotropic data")
  }

  test("q279 depth 1 reproduces q180's single-probe hits and the curve is monotone") {
    val rows = graft.ops.Similarity.queries("q279_ivf_multiprobe")(spark, sf)
      .orderBy("nprobe").collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    val rec = rows.map(_.getAs[Long]("recall_ppm"))
    val cand = rows.map(_.getAs[Long]("n_candidates"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      "probing more cells never loses a hit")
    assert(cand.zip(cand.tail).forall { case (a, b) => a <= b },
      "the candidate set at depth P is a prefix of depth P+1's")
    val q180hits = graft.ops.Similarity.queries("q180_ann_recall")(spark, sf)
      .agg(sum(col("n_hit"))).collect().head.getLong(0)
    assert(rows.head.getAs[Long]("n_hits") == q180hits,
      "P=1 IS q180's probe — same cells, same kernel, same hits")
  }

  test("q416 Lloyd-3 ladder conserves members per iteration and only sheds cells") {
    val rows = graft.ops.Similarity.queries("q416_lloyd3_convergence")(spark, sf)
      .collect()
    val nVecs = graft.model.Tables.embeddings(spark, sf).count()
    val byIter = rows.groupBy(_.getAs[Long]("iter"))
    assert(byIter.keySet == Set(1L, 2L, 3L), "exactly three iterations")
    byIter.foreach { case (it, rs) =>
      // every vector is assigned every iteration — Lloyd loses nothing
      assert(rs.map(_.getAs[Long]("n_members")).sum == nVecs,
        s"iter $it membership conserves the corpus")
      rs.foreach { r =>
        assert(r.getAs[Long]("n_members") > 0, "emitted cells are non-empty")
        assert(r.getAs[Double]("new_norm") > 0.0)
        assert(math.abs(r.getAs[Double]("shift_cos")) <= 1.0)
      }
    }
    // cells can only DROP out across iterations (empty cells vanish; no
    // mechanism creates a centroid), and the seed set bounds iteration 1
    def cells(it: Long) = byIter(it).map(_.getAs[Long]("cell")).toSet
    assert(cells(2L).subsetOf(cells(1L)) && cells(3L).subsetOf(cells(2L)))
    assert(cells(1L).forall(_ % 50 == 0), "iter-1 cells carry seed ids")
  }

  test("q418 depth 1 reproduces q417's refined single-probe hits; curve monotone") {
    val rows = graft.ops.Similarity.queries("q418_multiprobe_lloyd3")(spark, sf)
      .orderBy("nprobe").collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    val rec = rows.map(_.getAs[Long]("recall_ppm"))
    val cand = rows.map(_.getAs[Long]("n_candidates"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      "probing more refined cells never loses a hit")
    assert(cand.zip(cand.tail).forall { case (a, b) => a <= b },
      "the candidate set at depth P is a prefix of depth P+1's")
    val q417 = graft.ops.Similarity.queries("q417_ivf_recall_lloyd3")(spark, sf)
      .collect()
    q417.foreach { r =>
      val h = r.getAs[Long]("n_hit")
      assert(h >= 0 && h <= 3)
      assert(r.getAs[Long]("recall_ppm") == h * 1000000L / 3)
    }
    assert(rows.head.getAs[Long]("n_hits") == q417.map(_.getAs[Long]("n_hit")).sum,
      "P=1 IS q417's probe — same refined cells, same kernel, same hits")
    assert(rows.head.getAs[Long]("n_queries") == q417.length.toLong)
  }

  test("q280 stats replay per table and the verdicts split dims from facts at this SF") {
    val rows = Analytics.queries("q280_broadcast_advisor")(spark, sf).collect()
    assert(rows.length == 7)
    val byName = rows.map(r => r.getAs[String]("table_name") -> r).toMap
    assert(byName("region").getAs[Long]("n_rows") ==
      graft.model.Tables.region(spark, sf).count())
    assert(byName("lineitem").getAs[Long]("n_rows") ==
      graft.model.Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("est_bytes") > 0)
      assert(r.getAs[Long]("bytes_per_row") ==
        r.getAs[Long]("est_bytes") / r.getAs[Long]("n_rows"))
      assert(r.getAs[Boolean]("would_broadcast") ==
        (r.getAs[Long]("est_bytes") < 10485760L))
    }
    assert(byName("region").getAs[Boolean]("would_broadcast"))
    assert(byName("nation").getAs[Boolean]("would_broadcast"))
  }

  test("q281 each type carries the full period grid with exactly one winner") {
    val rows = Analytics.queries("q281_period_detection")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("p")).sorted.toSeq == Seq(5L, 6L, 7L, 8L))
      assert(rs.count(_.getAs[Boolean]("is_best")) == 1, "exactly one winning period")
      val best = rs.filter(_.getAs[Boolean]("is_best")).head
      assert(best.getAs[Long]("eta2_ppm") == rs.map(_.getAs[Long]("eta2_ppm")).max)
      rs.foreach { r =>
        assert(r.getAs[Long]("eta2_ppm") >= 0 && r.getAs[Long]("eta2_ppm") <= 1000000L)
        assert(r.getAs[Long]("m_days") % r.getAs[Long]("p") == 0,
          "folds truncate to FULL periods")
      }
    }
  }

  test("q282 scores replay from a Scala implementation of the JM model") {
    val rows = Analytics.queries("q282_query_likelihood")(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Long]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "ranked by score")
    // full replay: tokenize, pick frequency ranks {10,20,30}, score every doc
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val cf = docs.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val top30 = cf.toSeq.sortBy { case (t, c) => (-c, t) }.take(30)
    val terms = Seq(10, 20, 30).map(i => top30(i - 1))
    val ctot = cf.values.sum
    val scored = docs.map { case (id, toks) =>
      val dl = toks.length.toLong
      val s = terms.map { case (t, c) =>
        val tf = toks.count(_ == t).toLong
        tf * 1000000L / (2 * dl) + c * 1000000L / (2 * ctot)
      }.product
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq
      == scored.toSeq)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q283 digests replay, and xor obeys the disjoint-union and O(1)-update laws") {
    val rows = Analytics.queries("q283_set_digest")(spark, sf).collect()
    val bySrc = rows.map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("ndv"), r.getAs[Long]("digest"))).toMap
    assert(bySrc.contains("__all__"))
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), java.lang.Long.parseLong(md5hex(r.getString(1)).take(15), 16)))
    // replay one source and the global row
    val (src, _) = docs.head
    val mine = docs.filter(_._1 == src).map(_._2).distinct
    assert(bySrc(src) == ((mine.length.toLong, mine.reduce(_ ^ _))))
    val all = docs.map(_._2).distinct
    assert(bySrc("__all__") == ((all.length.toLong, all.reduce(_ ^ _))))
    // the merge laws, on the replayed arithmetic: disjoint union XORs,
    // and appending one element updates the digest in O(1)
    val a = Seq(3L, 17L, 99L); val b = Seq(4L, 5L)
    assert((a ++ b).reduce(_ ^ _) == (a.reduce(_ ^ _) ^ b.reduce(_ ^ _)))
    assert((a :+ 123L).reduce(_ ^ _) == (a.reduce(_ ^ _) ^ 123L))
  }

  test("q284 exact legs replay and every source pair is present") {
    val rows = Analytics.queries("q284_kmv_theta")(spark, sf).collect()
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), java.lang.Long.parseLong(md5hex(r.getString(1)).take(15), 16)))
    val sets = docs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val srcs = sets.keys.toSeq.sorted
    assert(rows.length == srcs.length * (srcs.length - 1) / 2, "full pair grid")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
      assert(a < b)
      val inter = (sets(a) intersect sets(b)).size.toLong
      val union = (sets(a) union sets(b)).size.toLong
      assert(r.getAs[Long]("exact_inter") == inter)
      assert(r.getAs[Long]("exact_union") == union)
      assert(r.getAs[Long]("k_used") >= 1 && r.getAs[Long]("k_used") <= 16)
      assert(r.getAs[Long]("est_union") >= 0 && r.getAs[Long]("est_inter") >= 0)
    }
  }

  test("q285 the estimator and the exact second moment both replay from token counts") {
    val rows = Analytics.queries("q285_ams_f2")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.model.Tables.documents(spark, sf)
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val f = docs.filter(_._1 == lang).flatMap(_._2.split(" ", -1))
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val exact = f.values.map(x => BigInt(x) * x).sum
      assert(BigInt(r.getAs[Long]("exact_f2")) == exact)
      val est = (0 to 3).map { j =>
        val zj = f.map { case (t, c) =>
          val sign = if (java.lang.Long.parseLong(md5hex(s"$j:$t").take(8), 16) % 2 == 0) 1L else -1L
          sign * c
        }.sum
        BigInt(zj) * zj
      }.sum / 4
      assert(BigInt(r.getAs[Long]("est_f2")) == est)
      assert(r.getAs[Long]("abs_err_ppm") ==
        ((BigInt(r.getAs[Long]("est_f2")) - exact).abs * 1000000 / exact).toLong)
    }
  }

  test("q289 decomposition conserves y = t + s + r exactly and the trend replays") {
    val rows = Analytics.queries("q289_ts_decomposition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") * 1000000L ==
        r.getAs[Long]("trend_u") + r.getAs[Long]("seasonal_u") + r.getAs[Long]("resid_u"),
        "conservation is exact BY CONSTRUCTION, not approximate")
    }
    // trend replay for one type from the zero-filled daily series
    val et = rows.head.getAs[String]("event_type")
    val daily = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toLocalDate -> r.getAs[Long]("c")).toMap
    val all = graft.model.Tables.events(spark, sf)
      .agg(min(to_date(col("ts"))), max(to_date(col("ts")))).collect().head
    val (mn, mx) = (all.getAs[java.sql.Date](0).toLocalDate, all.getAs[java.sql.Date](1).toLocalDate)
    val nd = java.time.temporal.ChronoUnit.DAYS.between(mn, mx).toInt + 1
    val series = (0 until nd).map(i => daily.getOrElse(mn.plusDays(i), 0L))
    rows.filter(_.getAs[String]("event_type") == et).foreach { r =>
      val di = r.getAs[Long]("di").toInt
      val wsum = (di - 3 to di + 3).map(series).sum
      assert(r.getAs[Long]("trend_u") == wsum * 1000000L / 7)
    }
  }

  test("q290 weights are exact integer roots and shares shift toward big sources as alpha rises") {
    val rows = Analytics.queries("q290_temperature_sweep")(spark, sf).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("alpha_ppm")).sorted.toSeq ==
        Seq(250000L, 500000L, 750000L))
    }
    rows.filter(_.getAs[Long]("alpha_ppm") == 500000L).foreach { r =>
      val n = r.getAs[Long]("n_docs"); val w = r.getAs[Long]("weight")
      assert(w * w <= n * 1000000000000L && (w + 1) * (w + 1) > n * 1000000000000L,
        "alpha=1/2 weight is the exact integer sqrt of n on the 10^6 grid")
    }
    // monotone mix property at the extremes of the size distribution
    val biggest = rows.maxBy(_.getAs[Long]("n_docs")).getAs[String]("source")
    val smallest = rows.minBy(_.getAs[Long]("n_docs")).getAs[String]("source")
    if (biggest != smallest) {
      def shares(src: String) = rows.filter(_.getAs[String]("source") == src)
        .sortBy(_.getAs[Long]("alpha_ppm")).map(_.getAs[Long]("share_ppm"))
      val b = shares(biggest); val sm = shares(smallest)
      assert(b.zip(b.tail).forall { case (x, y) => x <= y },
        "the biggest source gains share as alpha approaches proportional")
      assert(sm.zip(sm.tail).forall { case (x, y) => x >= y },
        "the smallest source loses share as alpha approaches proportional")
    }
  }

  test("q291 elasticity replays from the four cross-multiplied sums") {
    val rows = Analytics.queries("q291_arc_elasticity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val h = rows.head
    val brand = h.getAs[String]("p_brand")
    val lo = li.filter(x => x._1 == brand && x._3 <= 2)
    val hi = li.filter(x => x._1 == brand && x._3 >= 8)
    assert(h.getAs[Long]("n_lo") == lo.length.toLong)
    assert(h.getAs[Long]("n_hi") == hi.length.toLong)
    val (nl, ql, pl) = (lo.length.toDouble, lo.map(_._2).sum.toDouble,
      lo.map(x => 100 - x._3).sum.toDouble)
    val (nh, qh, ph) = (hi.length.toDouble, hi.map(_._2).sum.toDouble,
      hi.map(x => 100 - x._3).sum.toDouble)
    val expect = ((qh * nl - ql * nh) / (qh * nl + ql * nh)) /
      ((ph * nl - pl * nh) / (ph * nl + pl * nh))
    assert(math.abs(h.getAs[Double]("elasticity") - expect) < 1e-9)
  }

  test("q292 fold accuracies recombine into the exact variance numerator") {
    val rows = Analytics.queries("q292_cv_accuracy_spread")(spark, sf)
      .orderBy("fold").collect()
    assert(rows.map(_.getAs[Long]("fold")).toSeq == (0L to 4L))
    val accs = rows.map(_.getAs[Long]("acc_ppm"))
    val k = accs.length.toLong
    val vn = k * accs.map(a => a * a).sum - accs.sum * accs.sum
    rows.foreach { r =>
      assert(r.getAs[Long]("var_num") == vn)
      assert(vn >= 0)
      assert(r.getAs[Long]("var_ppm2") == vn / (k * k))
      assert(r.getAs[Long]("acc_ppm") ==
        r.getAs[Long]("n_correct") * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  test("q293 saved prefix mass replays from a sorted-order Scala walk") {
    val rows = Analytics.queries("q293_front_coding")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val texts = docs.filter(_._1 == src).map(_._2).sorted
      def lcp(a: String, b: String): Long = {
        val n = math.min(a.length, b.length)
        var i = 0; while (i < n && a(i) == b(i)) i += 1; i.toLong
      }
      val saved = texts.zip(texts.drop(1)).map { case (a, b) => lcp(a, b) }.sum
      assert(r.getAs[Long]("n_docs") == texts.length.toLong)
      assert(r.getAs[Long]("plain_chars") == texts.map(_.length.toLong).sum)
      assert(r.getAs[Long]("saved_chars") == saved)
    }
  }

  test("q294 both curves are bijections and the fragment counts replay") {
    import graft.ops.Analytics.{HilbertTable, MortonTable}
    assert(HilbertTable.sorted == (0 until 256), "Hilbert visits every cell once")
    assert(MortonTable.sorted == (0 until 256), "Z-order visits every cell once")
    val rows = Analytics.queries("q294_curve_fragmentation")(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the occupied-cell set and replay fragments per curve/axis/band
    val maxc = graft.model.Tables.part(spark, sf)
      .agg(max(expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)")))
      .collect().head.getLong(0)
    val cells = graft.model.Tables.part(spark, sf)
      .select(col("p_size"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (((r.getInt(0) - 1) * 16 / 50), (r.getLong(1) * 16 / (maxc + 1)).toInt))
    val occ = cells.distinct
    val mass = cells.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (curve <- Seq("z", "hilbert"); axis <- Seq("x", "y")) {
      val table = if (curve == "z") MortonTable else HilbertTable
      val ordered = occ.sortBy { case (x, y) => table(x * 16 + y) }
      val bands = rows.filter(r => r.getAs[String]("curve") == curve &&
        r.getAs[String]("axis") == axis)
      bands.foreach { b =>
        val band = b.getAs[Long]("band").toInt
        def inBand(c: (Int, Int)) = if (axis == "x") c._1 == band else c._2 == band
        val frags = ordered.zipWithIndex.count { case (c, i) =>
          inBand(c) && (i == 0 || !inBand(ordered(i - 1)))
        }
        assert(b.getAs[Long]("n_fragments") == frags.toLong,
          s"$curve/$axis/$band fragments")
        assert(b.getAs[Long]("n_parts") == occ.filter(inBand).map(mass).sum)
      }
    }
  }

  test("q295 greedy gains are nonincreasing, telescope exactly, and round 1 replays") {
    val rows = Analytics.queries("q295_greedy_set_cover")(spark, sf)
      .orderBy("round").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    // a round is missing only when the previous round SATURATED coverage
    if (rows.length < 3)
      assert(rows.last.getAs[Long]("cum_ppm") == 1000000L,
        "early exhaustion means full coverage")
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      "submodular marginal gains never increase")
    assert(rows.map(_.getAs[String]("source")).distinct.length == rows.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("cum_covered") == gains.take(i + 1).sum) }
    // round-1 replay: the source with the largest distinct shingle set
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1)
      .map { case (s2, v) => s2 -> v.flatMap(_._2.split(" ", -1).toSeq
        .sliding(3).filter(_.length == 3).map(_.mkString(" "))).toSet }
    val best = vocab.toSeq.map { case (s2, v) => (s2, v.size) }
      .sortBy { case (s2, n) => (-n, s2) }.head
    assert(rows.head.getAs[String]("source") == best._1)
    assert(rows.head.getAs[Long]("gain") == best._2.toLong)
  }

  test("q296 tail statistics replay from the sorted daily series") {
    val r = Analytics.queries("q296_var_shortfall")(spark, sf).collect().head
    val daily = graft.model.Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate"))).agg(
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")))
      .collect().map(_.getLong(1)).sorted
    val n = daily.length
    val k = (n + 19) / 20
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("k_tail") == k.toLong)
    assert(r.getAs[Long]("var_cents") == daily(k - 1))
    assert(r.getAs[Long]("es_cents") == daily.take(k).sum / k)
    assert(r.getAs[Long]("es_cents") <= r.getAs[Long]("var_cents"),
      "the tail mean sits at or below the tail boundary")
    assert(r.getAs[Long]("mean_cents") == daily.sum / n)
  }

  test("q297 leave-one-out means and the exact variance numerator replay") {
    val rows = Analytics.queries("q297_cluster_jackknife")(spark, sf).collect()
    val g = graft.model.Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)), sum(col("n_chars")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (nt, st) = (g.map(_._2).sum, g.map(_._3).sum)
    val loos = rows.map { r =>
      val Some((_, n, sc)) = g.find(_._1 == r.getAs[String]("source"))
      val expect = (BigInt(st - sc) * 1000000 / BigInt(nt - n)).toLong
      assert(r.getAs[Long]("loo_mean_ppm") == expect)
      expect
    }
    val k = loos.length.toLong
    val vn = (BigInt(k) * loos.map(a => BigInt(a) * a).sum -
      BigInt(loos.sum) * loos.sum).toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("jk_var_num") == vn)
      assert(r.getAs[Long]("g_sources") == k)
    }
  }

  test("q301 style features replay for one source and every neighbor is a proper other") {
    val rows = Analytics.queries("q301_stylometry")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("nn_source") != r.getAs[String]("source"))
      assert(r.getAs[Long]("nn_l1") >= 0)
    }
    val h = rows.head
    val texts = graft.model.Tables.documents(spark, sf)
      .filter(col("source") === h.getAs[String]("source"))
      .select("text").collect().map(_.getString(0))
    val nc = texts.map(_.length.toLong).sum
    val nw = texts.map(_.split(" ", -1).length.toLong).sum
    val ns = texts.map(t => t.count(_ == '.').toLong + 1).sum
    val np = texts.map(_.count(".,;:!?".contains(_)).toLong).sum
    assert(h.getAs[Long]("wlen_ppm") == nc * 1000000L / nw)
    assert(h.getAs[Long]("slen_ppm") == nw * 1000000L / ns)
    assert(h.getAs[Long]("punct_ppm") == np * 1000000L / nc)
  }

  test("q302 the Wilson band sandwiches the point estimate inside [0, 1]") {
    val rows = Analytics.queries("q302_wilson_bounds")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_docs").toDouble, r.getAs[Long]("n_en").toDouble)
      val (lo, hi) = (r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))
      val p = k / n
      assert(lo >= 0.0 - 1e-12 && hi <= 1.0 + 1e-12, "Wilson never leaves the unit interval")
      assert(lo <= p + 1e-12 && p <= hi + 1e-12, "the band sandwiches p-hat")
      val z2 = 3.8416
      val expectLo = (p + z2 / (2 * n) - math.sqrt(z2) *
        math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (1 + z2 / n)
      assert(math.abs(lo - expectLo) < 1e-12)
    }
  }

  test("q303 the Brier identity holds with no tolerance in every bin") {
    val rows = graft.ops.Evaluation.queries("q303_brier_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p2, py, y) = (BigInt(r.getAs[Long]("sum_p2")),
        BigInt(r.getAs[Long]("sum_py")), BigInt(r.getAs[Long]("sum_y")))
      assert(BigInt(r.getAs[Long]("bin_sq")) ==
        p2 - 2 * 1000000 * py + BigInt(1000000L) * 1000000L * y,
        "bin_sq = sum p^2 - 2e6 sum py + 1e12 sum y, exactly")
      val d = BigInt(r.getAs[Long]("sum_p")) - 1000000 * y
      assert(BigInt(r.getAs[Long]("rel_q")) == d * d / r.getAs[Long]("n_docs"))
    }
  }

  test("q304 the residual bound replays from an exact BigInt fit") {
    val rows = Analytics.queries("q304_learned_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.model.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val grid = docs.filter(_._1 == src).map(_._2)
        .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
        .toSeq.sortBy(_._1)
      val pts = grid.zipWithIndex.map { case ((x, _), i) =>
        (BigInt(x), BigInt(1) + grid.take(i).map(_._2).sum) }
      val n = BigInt(pts.length)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val bn = n * sxy - sx * sy; val bd = n * sxx - sx * sx
      val maxe = pts.map { case (x, y) =>
        (bd * (n * y - sy) - bn * (n * x - sx)).abs }.max
      assert(r.getAs[Long]("n_keys") == pts.length.toLong)
      assert(BigInt(r.getAs[Long]("max_abs_err_rows")) == maxe / (n * bd))
      assert(math.abs(r.getAs[Double]("slope") - (bn.toDouble / bd.toDouble)) < 1e-9)
    }
  }

  test("q305 container stats replay and the classifier picks the true minimum") {
    val rows = Analytics.queries("q305_roaring_planner")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.model.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_keys")).sum == total,
      "every doc lands in exactly one (source, container) cell")
    rows.foreach { r =>
      val (na, nb, nr) = (r.getAs[Long]("bytes_array"),
        r.getAs[Long]("bytes_bitmap"), r.getAs[Long]("bytes_run"))
      assert(na == 2 * r.getAs[Long]("n_keys"))
      assert(nr == 4 + 4 * r.getAs[Long]("n_runs"))
      val best = r.getAs[String]("best")
      val winner = if (na <= nr && na <= nb) "array"
        else if (nr <= nb) "run" else "bitmap"
      assert(best == winner)
      assert(r.getAs[Long]("n_runs") <= r.getAs[Long]("n_keys"))
    }
  }

  test("q306 the Laspeyres decomposition conserves with no tolerance") {
    val rows = Analytics.queries("q306_pvm_decomposition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // numerators are exact DECIMAL(38,0) arithmetic emitted as digit
      // STRINGS (the int64 cut overflowed at sf10: r·n·n ~ 10²¹; and the
      // driver harness canonicalizes decimal128 lossily, so the wire
      // representation is a string — round-10 VERDICT #1)
      def num(c: String) = BigInt(r.getAs[String](c))
      val total = num("total_num")
      val parts = num("vol_num") + num("rate_num") + num("cross_num")
      assert(total == parts, "delta-revenue = volume + rate + cross, exactly")
      // and the numerators recombine from the cell sums
      val (n0, n1) = (BigInt(r.getAs[Long]("n0")), BigInt(r.getAs[Long]("n1")))
      val (r0, r1) = (BigInt(r.getAs[Long]("rev0_d")), BigInt(r.getAs[Long]("rev1_d")))
      assert(total == (r1 - r0) * n0 * n1)
      assert(num("vol_num") == (n1 - n0) * r0 * n1)
    }
  }

  test("q307 the efficiency axiom holds exactly and v(full) counts every converter") {
    val rows = Analytics.queries("q307_shapley_attribution")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("channel")).sorted.toSeq ==
      Seq("click", "signup", "view"))
    val vFull = rows.head.getAs[Long]("v_full")
    assert(rows.forall(_.getAs[Long]("v_full") == vFull))
    // every coalition is ⊆ the full set, so v(full) + untouched = converters
    val converters = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(vFull + rows.head.getAs[Long]("n_no_touch") == converters,
      "the game plus the no-touch remainder conserves the converter count")
    assert(rows.map(_.getAs[Long]("phi6")).sum == 6 * vFull,
      "Shapley efficiency: the credits sum to v(full), exactly")
    rows.foreach(r => assert(r.getAs[Long]("phi6") >= 0,
      "v is monotone, so every marginal contribution is nonnegative"))
  }

  test("q308 cohort curves are monotone with a full age horizon") {
    val rows = Analytics.queries("q308_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("age"))
      assert(sorted.map(_.getAs[Long]("age")).toSeq == (0L to 5L),
        "age 0 always exists, so every cohort carries the full horizon")
      val cum = sorted.map(_.getAs[Long]("cum_rev_d"))
      assert(cum.zip(cum.tail).forall { case (a, b) => a <= b }, "LTV accumulates")
      sorted.foreach { r =>
        assert(r.getAs[Long]("ltv_cents_per_cust") ==
          r.getAs[Long]("cum_rev_d") * 100 / r.getAs[Long]("n_customers"))
      }
    }
  }

  test("q309 each half contributes exactly ten head terms and displacement is consistent") {
    val rows = Analytics.queries("q309_trending_terms")(spark, sf).collect()
    assert(rows.length >= 10 && rows.length <= 20)
    assert(rows.count(_.getAs[Long]("rank_h1") <= 10) == 10, "ten head terms in half 1")
    assert(rows.count(_.getAs[Long]("rank_h2") <= 10) == 10, "ten head terms in half 2")
    rows.foreach { r =>
      assert(r.getAs[Long]("displacement") ==
        math.abs(r.getAs[Long]("rank_h1") - r.getAs[Long]("rank_h2")))
      assert(r.getAs[Long]("rank_h1") <= 10 || r.getAs[Long]("count_h1") == 0,
        "clamp rank 11 appears only for terms absent from the half")
    }
  }

  test("q310 ascii fixture reads zero overhead yet the detector fires on multibyte text") {
    val rows = Analytics.queries("q310_multibyte_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") >= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("overhead_ppm") == 0L, "the fixture corpus is pure ASCII")
    }
    import spark.implicits._
    val probe = Seq("héllo wörld", "plain ascii").toDF("text")
      .select((octet_length(col("text")) - length(col("text"))).as("d"))
      .collect().map(_.getInt(0)).sorted
    assert(probe.toSeq == Seq(0, 2), "two 2-byte code points measured")
  }

  test("q311 the freshest stream sits exactly at the high-water mark") {
    val rows = Analytics.queries("q311_freshness")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("staleness_s")).min == 0L,
      "some type attains the global maximum timestamp")
    rows.foreach { r =>
      assert(r.getAs[Long]("staleness_s") >= 0)
      assert(r.getAs[Long]("n_last_24h") >= 0)
      assert(r.getAs[Long]("n_last_24h") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("mean_gap_s") >= 0)
    }
  }

  test("q312 every vector casts exactly three votes and antihubs stay visible") {
    val rows = graft.ops.Similarity.queries("q312_hubness")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_.getAs[Long]("n_vectors")).sum
    val votes = rows.map(r => r.getAs[Long]("n3") * r.getAs[Long]("n_vectors")).sum
    assert(votes == 3 * nTotal, "conservation: sum N3 = 3n")
    val nVecs = graft.model.Tables.embeddings(spark, sf).count()
    assert(nTotal == math.min(nVecs, 4096L))
  }

  test("q313 the ratio deciles are monotone and never drop below 1") {
    val rows = graft.ops.Similarity.queries("q313_twonn_ratios")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 9L))
    val mus = rows.map(_.getAs[Long]("mu_ppb"))
    assert(mus.forall(_ >= 1000000000L), "r2 >= r1 forces mu >= 1")
    assert(mus.zip(mus.tail).forall { case (a, b) => a <= b }, "deciles are a CDF walk")
    assert(rows.map(_.getAs[Long]("n_degenerate")).distinct.length == 1)
  }

  test("q314 size classes conserve the vector count and work never exceeds brute force") {
    val rows = graft.ops.Similarity.queries("q314_lsh_bucket_load")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nv = graft.model.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == nv,
      "every vector lands in exactly one size class")
    rows.foreach { r =>
      assert(r.getAs[Long]("total_cand") <= r.getAs[Long]("brute_pairs"),
        "bucketing can only prune the pair space")
      assert(r.getAs[Long]("work_ppm") <= 1000000L)
      assert(r.getAs[Long]("brute_pairs") == nv * (nv - 1) / 2)
    }
  }

  test("q315 salting brings every hot key under the partition target") {
    val rows = Analytics.queries("q315_salt_advisor")(spark, sf).collect()
    assert(rows.length == 5)
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b }, "hottest first")
    rows.foreach { r =>
      val k = r.getAs[Long]("salt_k")
      assert(k >= 1)
      assert(r.getAs[Long]("n_rows") / k <= math.max(r.getAs[Long]("target_rows"), 1),
        "ceil-division salt factor fits the target")
      assert(r.getAs[Long]("post_salt_share_ppm") <= r.getAs[Long]("share_ppm"))
    }
  }

  test("q316 the dedup tiers nest: dup mass is monotone up the ladder") {
    val rows = Analytics.queries("q316_dedup_ladder")(spark, sf)
      .orderBy("tier").collect()
    assert(rows.map(_.getAs[Long]("tier")).toSeq == Seq(1L, 2L, 3L))
    val ndv = rows.map(_.getAs[Long]("ndv"))
    val dup = rows.map(_.getAs[Long]("dup_docs"))
    val saved = rows.map(_.getAs[Long]("saved_chars"))
    assert(ndv.zip(ndv.tail).forall { case (a, b) => a >= b },
      "coarser fingerprints can only merge groups")
    assert(dup.zip(dup.tail).forall { case (a, b) => a <= b },
      "duplicate mass is monotone up the ladder")
    assert(saved.zip(saved.tail).forall { case (a, b) => a <= b })
    // tier 1 replays from raw text equality
    val texts = graft.model.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    assert(ndv.head == texts.distinct.length.toLong)
    assert(dup.head == (texts.length - texts.distinct.length).toLong)
  }
}
