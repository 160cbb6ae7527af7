package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.TextAnalysis.tokens

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingestion and training (north-star extension surface, alongside
  * the dedup/similarity/text/multimodal families):
  *
  *   - q47: deterministic stratified sampling — a fixed per-stratum quota
  *     selected by an engine-neutral content hash, so the sample is
  *     reproducible across engines, runs, and data layouts (no rand(),
  *     no partition-order dependence);
  *   - q48: distribution statistics — exact interpolated token-count
  *     quantiles per language (the length profile that drives curriculum
  *     and truncation decisions);
  *   - q49: int8 scalar quantization of embeddings with reconstruction-
  *     error accounting — the storage-reduction pass before ANN indexing;
  *   - q50: boilerplate detection — clusters of documents sharing an
  *     identical text prefix (template/header detection upstream of
  *     near-dup analysis).
  *
  * Scale notes: q47's window partitions by stratum (shuffle on `lang`,
  * top-k per partition — no global sort); q48 is one hash aggregation;
  * q49 is embarrassingly parallel per vector; q50 shuffles on a 128-bit
  * prefix hash (group cardinality ≈ distinct prefixes, map-side combined).
  */
object Curation {

  /** Engine-neutral per-row sampling key: [[Dedup.neutralHash32]] of the
    * stringified id — ONE definition of the neutral hash across the
    * sampling/dedup/sketch family, so the shared DuckDB idiom
    * (('0x'||substr(md5(x),1,8))::BIGINT) mirrors all of them. */
  private def sampleKey(c: Column): Column =
    Dedup.neutralHash32(c.cast("string"))

  /** Count-Min Sketch hash family over the neutral 32-bit hash — the
    * same universal family as the MinHash permutations, reduced to the
    * sketch width. Row i's column for a term: h_i(t) = ((a_i·H(t) + b_i)
    * mod P) mod W. */
  private def cmsCol(h: Column, i: Int, width: Int): Column =
    ((lit(7919L * (i + 1)) * h + lit(104729L * i)) % Dedup.P) % width

  /** CMS geometry shared by q54 and the streaming heavy-hitter leg. */
  val CmsWidth = 256
  val CmsDepth = 4

  /** One (row, ccol) sketch cell per (term, depth-row) — the CMS update
    * set for a stream of terms. ONE definition used by both the batch
    * sketch (q54) and [[graft.streaming.StreamingOps.cmsMatrix]], so the
    * streaming matrix is bit-identical to the batch matrix on the same
    * input by construction (spec-asserted). Works on static and
    * streaming frames alike: stateless row-local projection + explode. */
  def cmsCells(terms: DataFrame, termCol: String): DataFrame = {
    // materialize the md5-derived hash ONCE per row before the 4-way
    // cell fan-out — as a shared subtree of CmsDepth expressions it
    // would rely on codegen CSE to avoid 4 md5 evaluations per term
    // (minhashBands documents the same trap; measured ~1.5× on q54)
    val hashed = terms.withColumn("_h",
      Dedup.neutralHash32(col(termCol)) % Dedup.P)
    hashed.select(explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("row"), cmsCol(col("_h"), i, CmsWidth).as("ccol"))): _*)).as("rc"))
      .select(col("rc.row").as("row"), col("rc.ccol").as("ccol"))
  }

  /** Pairwise quadratic-kernel budget: a prefix cluster of size n costs
    * n·(n−1)/2 levenshtein calls, so the per-cluster cost ceiling is
    * MaxEditCluster²/2 kernels regardless of corpus size. */
  val MaxEditCluster = 16

  /** q57 body, factored for testability: within-cluster all-pairs
    * levenshtein over q50's prefix clusters, with oversize clusters
    * excluded up front (count ≤ [[MaxEditCluster]]). The guard counts on
    * a (phash)-only projection — a key-sized groupBy, map-side combined —
    * so the full `text` payload is never shuffled for the count (a
    * partitioned count window here would exchange whole documents; at
    * corpus scale that shuffle IS the query cost). Clusters of size 1
    * drop with the same join: they cannot produce a doc_a < doc_b pair,
    * so pruning them is output-identical and skips the self-join for the
    * (overwhelmingly common) unique-prefix rows. Expects (doc_id, text). */
  def editDistanceVerify(documents: DataFrame): DataFrame = {
    val hashed = documents
      .withColumn("phash", md5(substring(col("text"), 1, 100).cast("binary")))
    val keep = hashed.select("phash")
      .groupBy("phash").agg(count(lit(1)).as("csize"))
      .filter(col("csize") >= 2 && col("csize") <= MaxEditCluster)
      .select("phash")
    val docs = hashed.join(keep, Seq("phash"))
    val a = docs.select(col("phash"), col("doc_id").as("doc_a"), col("text").as("ta"))
    val b = docs.select(col("phash"), col("doc_id").as("doc_b"), col("text").as("tb"))
    a.join(b, Seq("phash")).filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
      .withColumn("max_len", greatest(length(col("ta")), length(col("tb"))).cast("long"))
      .withColumn("sim_pct",
        round(lit(100.0) * (col("max_len") - col("dist")) / col("max_len"), 6))
      .select("doc_a", "doc_b", "dist", "max_len", "sim_pct")
      .orderBy("doc_a", "doc_b")
  }

  /** 8-bit × 8-bit Morton (Z-order) interleave as ONE generated
    * arithmetic expression, parameterized only by the engine's
    * floor-div token (`div` Spark, `//` DuckDB) — the Spark Column and
    * the DuckDB oracle are rendered from the same bit-term list, so the
    * two legs cannot drift. Pure non-negative integer arithmetic
    * (%, floor-div, ×2^k): engine-exact, codegen-friendly, no UDF. */
  private[graft] def zorderSql(x: String, y: String, divOp: String): String =
    (0 until 8).flatMap { i =>
      val m = 1L << (i + 1); val p = 1L << i
      Seq(s"(($x % $m) $divOp $p) * ${1L << (2 * i + 1)}",
          s"(($y % $m) $divOp $p) * ${1L << (2 * i)}")
    }.mkString(" + ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SAMPLING-BIAS audit — the foundation under every sampled audit
    // leg in this engine (q28/q41/q180's bounded sweeps, q97's encode
    // sample, q142's bootstrap): is a doc_id-HASH sample exchangeable
    // with the full population? Per source, the EXACT two-sample KS
    // distance (F192's step-CDF machinery) between the 1-in-16
    // neutral-hash sample's length distribution and the full corpus's,
    // in cross-multiplied floor-ppm (DECIMAL(38,0) products). A biased
    // hash here would quietly tilt every sampled estimate; the number
    // should sit at the √n noise floor. Scale: one map-combined
    // (source, value, leg) census + per-source cumulative windows over
    // the bounded distinct-length grid.
    "q471_sampling_bias" -> { (s, d) =>
      val base = Tables.documents(s, d).select(col("source"),
          col("n_chars").as("v"),
          (Dedup.neutralHash32(concat(lit("samp:"),
            col("doc_id").cast("string"))) % 16 === 0).as("in_samp"))
      val per = base.groupBy("source", "v")
        .agg(count(lit(1)).as("nf"),
          sum(when(col("in_samp"), 1L).otherwise(0L)).as("ns"))
      val tot = per.groupBy("source")
        .agg(sum(col("nf")).as("tf"), sum(col("ns")).as("ts_"))
      val w = Window.partitionBy("source").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per.withColumn("cf", sum(col("nf")).over(w))
        .withColumn("cs", sum(col("ns")).over(w))
        .join(tot, "source")
        .withColumn("d_ppm", expr(
          """CAST(abs(CAST(cs AS DECIMAL(38,0)) * tf
            | - CAST(cf AS DECIMAL(38,0)) * ts_) * 1000000
            | DIV (CAST(tf AS DECIMAL(38,0)) * greatest(ts_, 1)) AS BIGINT)"""
            .stripMargin))
        .groupBy("source")
        .agg(max(col("tf")).cast("long").as("n_full"),
          max(col("ts_")).cast("long").as("n_sample"),
          max(col("d_ppm")).cast("long").as("ks_ppm"))
        .orderBy("source")
    },

    // EPOCH-SHUFFLE adjacency audit — "is my shuffle actually
    // shuffling": multi-epoch training orders documents by a per-epoch
    // hash (md5 of epoch:id — the engine-neutral family); if the
    // shuffle works, the probability that two docs adjacent in epoch 0
    // are adjacent again in epoch 1 is ~2/(n−1), and systematic repeats
    // mean the "shuffle" is aliasing (the classic broken-seed bug that
    // quietly turns multi-epoch training into repeated batch order).
    // Per source (orders are built WITHIN source partitions — the
    // house no-global-sort rule, and how sharded loaders shuffle
    // anyway): adjacent-pair repeat count, floor-ppm rate, and the
    // 2·10⁶/(n−1) expectation to compare against. Scale: two
    // partitioned rank windows + one fixed-width pair join.
    "q469_epoch_shuffle" -> { (s, d) =>
      def ranked(epoch: Int) = {
        val w = Window.partitionBy("source")
          .orderBy(s"h$epoch", "doc_id")
        Tables.documents(s, d).select(col("source"), col("doc_id"),
            Dedup.neutralHash32(concat(lit(s"epoch$epoch:"),
              col("doc_id").cast("string"))).as(s"h$epoch"))
          .withColumn("rk", row_number().over(w))
      }
      def pairs(epoch: Int) = {
        val r = ranked(epoch)
        r.select(col("source"), col("doc_id").as("a"), col("rk"))
          .join(r.select(col("source"), col("doc_id").as("b"),
            (col("rk") - 1).as("rk")), Seq("source", "rk"))
          .select(col("source"), least(col("a"), col("b")).as("lo"),
            greatest(col("a"), col("b")).as("hi"))
      }
      val rep = pairs(0).join(pairs(1), Seq("source", "lo", "hi"))
        .groupBy("source").agg(count(lit(1)).as("n_repeats"))
      Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .join(rep, Seq("source"), "left")
        .withColumn("n_repeats",
          coalesce(col("n_repeats"), lit(0L)).cast("long"))
        .withColumn("repeat_ppm", expr(
          "CAST(n_repeats * 1000000 DIV greatest(n_docs - 1, 1) AS BIGINT)"))
        .withColumn("expected_ppm",
          expr("CAST(2000000 DIV greatest(n_docs - 1, 1) AS BIGINT)"))
        .orderBy("source")
    },

    // Z-order (Morton) clustering + zone-map pruning audit — the
    // lakehouse write-layout op: interleaving the bits of two filter
    // dimensions gives files whose min/max zone maps prune on BOTH
    // dimensions, where a single-column sort layout prunes on one only.
    // File = Morton code DIV 32 (≤2048 files from the 8+8-bit grid —
    // a bounded, SF-independent file population).
    // The audit materializes per-file zone maps (min/max user, min/max
    // day, rows) for two candidate layouts of the events table —
    // 'zorder' (file = Morton(user_id%256, day%256) DIV 32, ≤2048
    // files) and 'by_day' (file = day) — then counts, per layout, how
    // many files a point query on user_id=7 and one on epoch-day 19740
    // would have to read (probes chosen inside every SF's value range).
    // Everything after the map-only key computation is a groupBy on a
    // ≤2048-value file key: bounded shuffle, tiny result — the 100 TB
    // shape of a layout decision (the audit never rewrites data, it
    // prices the rewrite). Low byte of user_id only: the demo grid;
    // production widens the bit budget, same expression shape. Day
    // bucketing = Behavior.dayIndex, the repo's one day rule. Both
    // layout branches consume ev → eager-cache the scan (Caches rule).
    "q141_zorder_zonemap" -> { (s, d) =>
      val ev = Caches.shared(Tables.events(s, d)
        .select(col("user_id"), Behavior.dayIndex.as("day")))
      def zones(layout: String, fileCol: Column) = ev
        .withColumn("layout", lit(layout))
        .withColumn("file_id", fileCol)
        .groupBy("layout", "file_id")
        .agg(min("user_id").as("min_u"), max("user_id").as("max_u"),
          min("day").as("min_d"), max("day").as("max_d"),
          count(lit(1)).as("n_rows"))
      val z = zones("zorder",
        expr(s"(${zorderSql("(user_id % 256)", "(day % 256)", "div")}) div 32"))
      val b = zones("by_day", col("day"))
      z.unionByName(b)
        .groupBy("layout")
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum(col("n_rows")).cast("long").as("n_rows"),
          sum(when(col("min_u") <= 7 && col("max_u") >= 7, 1L)
            .otherwise(0L)).cast("long").as("files_user_query"),
          sum(when(col("min_d") <= 19740 && col("max_d") >= 19740, 1L)
            .otherwise(0L)).cast("long").as("files_day_query"))
        .orderBy("layout")
    },

    // Deterministic multiplier-bootstrap CI for the per-source mean doc
    // length — the error bar a corpus scorecard needs next to every
    // point estimate. B=32 pseudo-resamples; replicate b reweights doc
    // i by w = 1 + (H(doc_id:b) mod 3) ∈ {1,2,3} (positive Bayesian-
    // bootstrap-style multipliers from the repo's ONE neutral hash, so
    // the oracle replays them bit-for-bit); est_b = Σw·x ·1000 DIV Σw
    // in milli units, CI = the 2nd/31st order statistics of the 32
    // estimates (~94% coverage). Scale shape: the 32× explode feeds a
    // map-side-combined (source, b) agg — a bounded |sources|×32 grid,
    // no quadratic anything, no driver-side resampling; at 100 TB the
    // replicate weights ride the one corpus scan.
    "q142_bootstrap_ci" -> { (s, d) =>
      val reps = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("b", explode(sequence(lit(0), lit(31))))
        .withColumn("w", lit(1) + Dedup.neutralHash32(
          concat(col("doc_id").cast("string"), lit(":"),
            col("b").cast("string"))) % 3)
      val est = reps.groupBy("source", "b")
        .agg((sum(col("w") * col("n_chars")) * 1000).as("swx"),
          sum(col("w")).as("sw"))
        .withColumn("est_milli", expr("swx div sw"))
      val rk = est.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("est_milli", "b")))
      val ci = rk.groupBy("source")
        .agg(max(when(col("rn") === 2, col("est_milli"))).as("lo_milli"),
          max(when(col("rn") === 31, col("est_milli"))).as("hi_milli"))
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          expr("sum(n_chars) * 1000 div count(1)").as("mean_milli"))
        .join(ci, Seq("source"))
        .select("source", "n_docs", "mean_milli", "lo_milli", "hi_milli")
        .orderBy("source")
    },

    // Spearman rank correlation between two per-doc metrics (chars vs
    // tokens), per source — the monotone-association audit a scorecard
    // runs before trusting one metric as a proxy for another. Ranks are
    // TIE-FREE by construction (order by metric, doc_id), so the
    // classic d²-formula is exact and integer: sum_d2 = Σ(rk_a−rk_b)²
    // is an associative int64 sum (bound: n³/3 — safe to n≈2.6M docs
    // per source; beyond that, production buckets ranks to a 2²⁰ grid
    // first, same shape). Both rank windows share ONE source-partition
    // shuffle (two sorts over the same exchange — never a global sort);
    // rho = 1 − 6S/(n³−n) is a single mirrored IEEE divide + round(6),
    // the one-division-chain parity rule (SURVEY §7.0).
    "q144_spearman" -> { (s, d) =>
      val m = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
      val ranked = m
        .withColumn("rk_a", row_number().over(Window.partitionBy("source")
          .orderBy("n_chars", "doc_id")).cast("long"))
        .withColumn("rk_b", row_number().over(Window.partitionBy("source")
          .orderBy("n_tok", "doc_id")).cast("long"))
      ranked.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum((col("rk_a") - col("rk_b")) * (col("rk_a") - col("rk_b")))
            .cast("long").as("sum_d2"))
        // rho is undefined for a single-document source (n³−n = 0) —
        // NULL, never a 0/0 NaN (whose engine rendering differs)
        .withColumn("rho", expr(
          """CASE WHEN n_docs < 2 THEN CAST(NULL AS DOUBLE)
            |ELSE round(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE) /
            |  (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) *
            |   CAST(n_docs AS DOUBLE) - CAST(n_docs AS DOUBLE)), 6) END"""
            .stripMargin))
        .select("source", "n_docs", "sum_d2", "rho")
        .orderBy("source")
    },

    // Benford first-digit audit over order totals — the data-forensics
    // op that flags fabricated or truncated numeric columns before they
    // poison downstream stats. The expected shares log10(1+1/d) are
    // PUBLIC constants pinned as integer ppm literals (no transcendental
    // at query time — the parity rule); observed shares are exact
    // integer ppm. floor() before the int cast makes Spark's truncating
    // and DuckDB's rounding double→int64 casts agree. ONE scan → a
    // 9-row digit grid; the total rides in via a groupless-agg
    // broadcast (the PlanSpec-sanctioned root).
    "q145_benford" -> { (s, d) =>
      val fd = Tables.orders(s, d)
        .filter(col("o_totalprice") >= 1)
        .select(substring(
          expr("CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING)"),
          1, 1).cast("long").as("digit"))
      val expected = s.range(1, 10).toDF("digit")
        .withColumn("benford_ppm", expr(
          """CAST(element_at(array(301030, 176091, 124939, 96910, 79181,
            |  66947, 57992, 51153, 45757), CAST(digit AS INT)) AS BIGINT)"""
            .stripMargin))
      // ONE scan for real: every retained row has a leading digit in
      // 1..9, so n_total = Σn over the 9-row digit grid — the total is
      // re-aggregated from the grouped counts, never a second scan
      val counts = Caches.shared(
        fd.groupBy("digit").agg(count(lit(1)).cast("long").as("n")))
      val total = counts.agg(sum(col("n")).cast("long").as("n_total"))
      counts
        .join(expected, Seq("digit"), "right")
        .na.fill(0L, Seq("n"))
        .crossJoin(broadcast(total))
        .withColumn("share_ppm", expr("n * 1000000 DIV n_total"))
        .withColumn("dev_ppm", expr("abs(share_ppm - benford_ppm)"))
        .select(col("digit").cast("long").as("digit"), col("n"),
          col("share_ppm"), col("benford_ppm"), col("dev_ppm"))
        .orderBy("digit")
    },

    // Stratified sample: 5 docs per language, chosen by hash order —
    // the deterministic form of "uniform sample per stratum".
    "q47_stratified_sample" -> { (s, d) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("hk"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("hk", sampleKey(col("doc_id")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select("lang", "rk", "doc_id", "hk")
        .orderBy("lang", "rk")
    },

    // Schema/statistics profiling — the per-column null and distinct
    // audit an ingest pipeline materializes before anything downstream
    // trusts a new table drop. The column list is taken from the
    // DataFrame schema at plan time (the operator adapts to any table),
    // and the whole profile is ONE scan: a single aggregation row of
    // 2·|cols|+1 counters, unpivoted to rows with stack() — never one
    // pass per column. countDistinct and the null counters are
    // map-side partial; the oracle mirrors the (static) column list and
    // would fail the compare loudly if the schema drifted.
    "q107_table_profile" -> { (s, d) =>
      val df = Tables.orders(s, d)
      val cols = df.schema.fieldNames.toSeq
      val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap(c => Seq(
        count(when(col(c).isNull, 1)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd")))
      val stackExpr = s"stack(${cols.length}, " +
        cols.map(c => s"'$c', ${c}_nn, ${c}_nd").mkString(", ") +
        ") AS (column_name, n_null, n_distinct)"
      df.agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"), expr(stackExpr))
        .select(col("column_name"),
          col("n_rows").cast("long").as("n_rows"),
          col("n_null").cast("long").as("n_null"),
          col("n_distinct").cast("long").as("n_distinct"))
        .orderBy("column_name")
    },

    // MAD robust scale per language: median absolute deviation from the
    // median of document length, plus the 1.4826-consistency-scaled
    // sigma estimate — the robust dispersion number that closes the
    // robust-statistics family (q75 winsorize clamps, q100 IQR fences
    // flag, q125 Theil–Sen trends; MAD is the scale they standardize
    // against). Two aggregation passes over one scan subtree (the
    // per-lang median broadcasts back, bounded by |langs|); quantiles
    // follow q48's proven percentile pattern, the deviation is exact
    // double arithmetic on integers.
    "q128_mad_scale" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("lang"), col("n_chars"))
      val med = docs.groupBy("lang")
        .agg(expr("percentile(n_chars, 0.5D)").as("med"))
      docs.join(broadcast(med), "lang")
        .withColumn("dev", abs(col("n_chars") - col("med")))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          round(min(col("med")), 6).as("median_chars"),
          round(expr("percentile(dev, 0.5D)"), 6).as("mad"),
          round(expr("percentile(dev, 0.5D) * 1.4826D"), 6).as("mad_sigma"),
          round(max(col("dev")), 6).as("max_dev"))
        .orderBy("lang")
    },

    // Reciprocal-rank fusion of two selection signals — the standard
    // way a curation pipeline combines incomparable rankings (here a
    // length signal and a lexical-diversity signal) without score
    // calibration: RRF(d) = Σ 1/(60+rank_i), kept exact as floor
    // 10⁶/(60+rank). Production RRF fuses bounded candidate lists; the
    // demonstration ranks a deterministic 1/7 sample within each lang
    // stratum (partitioned windows — a per-stratum candidate set, never
    // a global sort). Output: top-3 fused picks per stratum with both
    // source ranks for audit.
    "q116_rrf_fusion" -> { (s, d) =>
      val w1 = Window.partitionBy("lang").orderBy(col("s_len").desc, col("doc_id"))
      val w2 = Window.partitionBy("lang").orderBy(col("s_ttr").desc, col("doc_id"))
      val wr = Window.partitionBy("lang").orderBy(col("rrf").desc, col("doc_id"))
      Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("s_len", col("n_chars").cast("long"))
        .withColumn("s_ttr",
          // CAST the Int32 size() BEFORE the multiply: int*1000000 wraps
          // past ~2147 distinct tokens (the oracle's len() is BIGINT)
          expr("CAST(CAST(size(array_distinct(toks)) AS BIGINT) * 1000000 " +
            "DIV size(toks) AS BIGINT)"))
        .select("lang", "doc_id", "s_len", "s_ttr")
        .withColumn("r1", row_number().over(w1).cast("long"))
        .withColumn("r2", row_number().over(w2).cast("long"))
        .withColumn("rrf", expr("1000000 DIV (60 + r1) + 1000000 DIV (60 + r2)"))
        .withColumn("rank", row_number().over(wr).cast("long"))
        .filter(col("rank") <= 3)
        .select("lang", "rank", "doc_id", "r1", "r2", "rrf")
        .orderBy("lang", "rank")
    },

    // Kolmogorov–Smirnov drift statistic per source vs the whole corpus
    // over (binned) document length — the nonparametric distribution-
    // drift gate complementing q66's chi-square over token frequencies:
    // KS needs no vocabulary and catches shape changes chi-square bins
    // away. ECDFs are exact integer counts on a 16-char bin grid
    // (|sources| × |length/16| cells, BOUNDED by the length domain, not
    // the corpus size); the sup-distance compares floor-ppm fractions —
    // deterministic, no doubles. The global cumulative needs no
    // unpartitioned window: at each grid length it is the SUM of the
    // per-source cumulatives (every source occupies every grid row).
    // Corpus cost is one scan + map-combined agg; everything after runs
    // on the bounded grid.
    "q113_ks_drift" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("len_bin", expr("n_chars DIV 16"))
      val perSL = docs.groupBy("source", "len_bin").agg(count(lit(1)).as("c"))
      // lens/srcs/nTot all derive from the bounded perSL matrix — the
      // corpus is scanned ONCE; three more aggregations over it would
      // read 100 TB four times for identical results
      val lens = perSL.select("len_bin").distinct()
      val srcs = perSL.groupBy("source").agg(sum(col("c")).as("n_s"))
      val nTot = perSL.agg(sum(col("c")).cast("long").as("n_g"))
      val wS = Window.partitionBy("source").orderBy("len_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = srcs.crossJoin(lens)
        .join(perSL, Seq("source", "len_bin"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .withColumn("cum_s", sum(col("c")).over(wS))
      val globCum = cum.groupBy("len_bin").agg(sum(col("cum_s")).as("cum_g"))
      val wD = Window.partitionBy("source").orderBy(col("d").desc, col("len_bin"))
      cum.join(globCum, "len_bin").crossJoin(broadcast(nTot))
        .withColumn("d",
          abs(expr("cum_s * 1000000 DIV n_s - cum_g * 1000000 DIV n_g")))
        .withColumn("rn", row_number().over(wD)).filter(col("rn") === 1)
        .select(col("source"), col("n_s").cast("long").as("n_docs"),
          col("d").cast("long").as("ks_ppm"),
          col("len_bin").cast("long").as("at_bin"))
        .orderBy("source")
    },

    // Referential-integrity audit across the warehouse's FK relations —
    // the data-quality gate every ingest pipeline runs before joins are
    // trusted (an orphaned fact row silently drops from inner joins; a
    // childless dimension row hints at a broken extract). One row per
    // relation: child/orphan counts with floor-ppm rate and
    // parent/childless-parent counts. Each leg is a LEFT ANTI join —
    // Spark broadcasts the (bounded) key side where AQE sizes it so,
    // and the counts are map-side combined; nothing quadratic.
    "q103_fk_audit" -> { (s, d) =>
      def leg(name: String, child: DataFrame, ck: String,
              parent: DataFrame, pk: String): DataFrame = {
        val c = child.select(col(ck).as("ck"))
        val p = parent.select(col(pk).as("pk"))
        val orphans = c.join(p, col("ck") === col("pk"), "left_anti")
          .agg(count(lit(1)).as("n_orphan"))
        val childless = p.join(c, col("pk") === col("ck"), "left_anti")
          .agg(count(lit(1)).as("n_childless"))
        c.agg(count(lit(1)).as("n_child"))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("n_parent"))))
          .crossJoin(broadcast(orphans))
          .crossJoin(broadcast(childless))
          .select(lit(name).as("relation"),
            col("n_child").cast("long").as("n_child"),
            col("n_orphan").cast("long").as("n_orphan"),
            expr("CAST(n_orphan * 1000000 DIV n_child AS BIGINT)").as("orphan_ppm"),
            col("n_parent").cast("long").as("n_parent"),
            col("n_childless").cast("long").as("n_childless"))
      }
      leg("lineitem.l_orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey")
        .unionByName(leg("orders.o_custkey->customer", Tables.orders(s, d),
          "o_custkey", Tables.customer(s, d), "c_custkey"))
        .unionByName(leg("lineitem.l_suppkey->supplier", Tables.lineitem(s, d),
          "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
        .orderBy("relation")
    },

    // Difficulty-curriculum bucketing: per language, documents are
    // ranked by an integer difficulty proxy (chars-per-token ×100,
    // floor) and split into 5 equal-depth NTILE buckets with full
    // (score, doc_id) tie ordering — the deterministic form of the
    // quantile-bucketed curriculum/batch assignment a training loader
    // applies. One partitioned window + one aggregation.
    "q104_curriculum_buckets" -> { (s, d) =>
      val w = Window.partitionBy("lang").orderBy(col("score"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("score",
          expr("CAST(n_chars * 100 DIV size(split(text, ' ')) AS BIGINT)"))
        .withColumn("bucket", ntile(5).over(w).cast("long"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).cast("long").as("n_docs"),
             min(col("score")).as("min_score"),
             max(col("score")).as("max_score"))
        .orderBy("lang", "bucket")
    },

    // IQR outlier quarantine per language over document length — the
    // robust-statistics gate (Tukey fences) that flags truncated and
    // runaway documents without assuming a distribution. Quantiles are
    // the exact type-7 interpolation (q48's cross-engine-stable
    // definition); quarter-quantiles of integers are exact binary
    // fractions and the 1.5×IQR fences multiply by halves, so the
    // bounds are bit-exact on both engines. Two aggregations plus a
    // per-lang bound broadcast (bounded by |langs|) — no window on the
    // corpus scan.
    "q100_length_outliers" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val bounds = docs.groupBy("lang")
        .agg(expr("percentile(n_chars, 0.25D)").as("q1"),
             expr("percentile(n_chars, 0.75D)").as("q3"))
        .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
        .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      docs.join(broadcast(bounds), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
             round(min(col("q1")), 6).as("q1"),
             round(min(col("q3")), 6).as("q3"),
             round(min(col("lo")), 6).as("lo"),
             round(min(col("hi")), 6).as("hi"),
             count(when(col("n_chars") < col("lo"), 1)).cast("long").as("n_out_lo"),
             count(when(col("n_chars") > col("hi"), 1)).cast("long").as("n_out_hi"))
        .withColumn("out_ppm",
          expr("CAST((n_out_lo + n_out_hi) * 1000000 DIV n_docs AS BIGINT)"))
        .orderBy("lang")
    },

    // Token-count quantiles per language: exact interpolated (type-7)
    // percentiles, the cross-engine-stable definition (q43 precedent).
    "q48_token_quantiles" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             round(expr("percentile(n_tokens, 0.25D)"), 6).as("p25"),
             round(expr("percentile(n_tokens, 0.5D)"), 6).as("p50"),
             round(expr("percentile(n_tokens, 0.75D)"), 6).as("p75"),
             round(expr("percentile(n_tokens, 0.95D)"), 6).as("p95"))
        .orderBy("lang")
    },

    // Int8 scalar quantization: scale = 127/max|x|, q_i = floor(x_i·scale
    // + 0.5) — floor(x+0.5) rounds identically in every engine (round()
    // half-handling differs across engines for negatives). Saturation
    // count, quantized sum, and reconstruction error audit the loss.
    "q49_embedding_quantize" -> { (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") % 25 === 0)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("max_abs", expr("array_max(transform(v, x -> abs(x)))"))
        // an all-zero vector has no quantization scale (127/0 = Inf →
        // NaN products → ANSI cast error); exclude it on both sides
        .filter(col("max_abs") > 0)
        .withColumn("scale", lit(127.0) / col("max_abs"))
        .withColumn("q", expr("transform(v, x -> CAST(floor(x * scale + 0.5D) AS BIGINT))"))
        .select(col("vec_id"),
          round(col("max_abs"), 6).as("max_abs"),
          expr("CAST(size(filter(q, y -> abs(y) = 127)) AS BIGINT)").as("n_sat"),
          expr("aggregate(q, 0L, (a, y) -> a + y)").as("sum_q"),
          // sequential left fold like the cosine kernels → same double
          // result both engines; round(6) absorbs any last-ulp residue
          expr("round(sqrt(aggregate(zip_with(v, q, (x, y) -> pow(x - y / scale, 2)), 0D, (a, c) -> a + c)), 6)").as("recon_err"))
        .orderBy("vec_id")
    },

    // Count-Min Sketch heavy hitters: a d×w counting sketch over the
    // term stream (d=4 rows, w=256 columns, the MinHash universal-hash
    // family over the engine-neutral hash), probed for the exact top-5
    // terms. Sketch build is one explode + groupBy (map-side combined,
    // matrix ≤ d·w rows no matter the corpus); estimates are min-of-row
    // cells. Everything is deterministic integer arithmetic, so exact
    // counts AND sketch estimates hash-match across engines — and the
    // CMS never-undercount invariant is emitted as a checked column.
    "q54_countmin_heavyhitters" -> { (s, d) =>
      val W = CmsWidth; val D = CmsDepth
      val toks = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("term"))
        .withColumn("h", Dedup.neutralHash32(col("term")) % Dedup.P)
      val matrix = cmsCells(toks.select("term"), "term")
        .groupBy("row", "ccol").agg(count(lit(1)).as("cnt"))
      val probes = toks.groupBy("term")
        .agg(count(lit(1)).as("exact_cnt"), min("h").as("h"))
        .orderBy(col("exact_cnt").desc, col("term")).limit(5)
      val lookups = probes.select(col("term"), col("exact_cnt"),
          explode(array((0 until D).map(i =>
            struct(lit(i).as("row"), cmsCol(col("h"), i, W).as("ccol"))): _*)).as("rc"))
        .select(col("term"), col("exact_cnt"),
                col("rc.row").as("row"), col("rc.ccol").as("ccol"))
      lookups.join(matrix, Seq("row", "ccol"))
        .groupBy("term", "exact_cnt")
        .agg(min(col("cnt")).as("cms_est"))
        .select(col("term"), col("exact_cnt"), col("cms_est"),
                (col("cms_est") >= col("exact_cnt")).as("never_undercounts"))
        .orderBy(col("exact_cnt").desc, col("term"))
    },

    // Edit-distance verification of near-dup candidates: levenshtein is
    // O(len²) per pair, so it NEVER runs all-pairs — candidates come
    // from the q50 prefix clusters (equi-join on the prefix hash), and
    // the quadratic kernel touches only within-cluster pairs. The
    // generate-candidates-then-verify-exactly shape is the same contract
    // as MinHash→Jaccard (q26) and LSH→cosine (q29). Clusters larger
    // than MaxEditCluster are EXCLUDED (not exploded): a viral template
    // shared by 10⁶ docs would otherwise cost 10¹² O(len²) kernels —
    // the same quadratic guard as Dedup.capDocFrequency; oversize
    // clusters are q50's finding, not a pairwise-verification input.
    "q57_edit_distance" -> { (s, d) =>
      editDistanceVerify(Tables.documents(s, d))
    },

    // C2 companion: winsorized (clamped-tail) robust statistics — the
    // outlier-trimming pass run on length/score columns before computing
    // corpus means, where a handful of giant documents would otherwise
    // dominate. Exact rank-based p05/p95 bounds (value at 0-based index
    // floor(q·(n−1)) of the (n_chars, doc_id)-sorted stratum — fully
    // deterministic, no interpolation), clamp, then integer-exact sums
    // and floor-ppm means. Shuffle shape: one window sort per source +
    // two same-key aggregations; the bounds frame is one row per source
    // and broadcast back. The per-source window sort is the exact
    // small-SF audit shape: at 100 TB the bounds come from the q62
    // mergeable histogram sketch instead (upper-edge p05/p95), and the
    // clamp + mean pass below them stays a linear map-side-combined agg.
    "q75_winsorized_stats" -> { (s, d) =>
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rn", row_number().over(w))
      val n = docs.groupBy("source").agg(count(lit(1)).as("n"))
      val bounds = docs.join(n, "source")
        .groupBy("source")
        .agg(min(when(col("rn") - 1 === expr("(5 * (n - 1)) DIV 100"),
               col("n_chars"))).as("lo"),
             min(when(col("rn") - 1 === expr("(95 * (n - 1)) DIV 100"),
               col("n_chars"))).as("hi"))
      docs.join(broadcast(bounds), "source")
        .withColumn("c", greatest(col("lo"), least(col("hi"), col("n_chars"))))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             min(col("lo")).as("lo"), min(col("hi")).as("hi"),
             sum(col("c")).cast("long").as("sum_wins"),
             count(when(col("n_chars") < col("lo"), 1)).as("n_clamped_lo"),
             count(when(col("n_chars") > col("hi"), 1)).as("n_clamped_hi"))
        // floor(sum·10⁶/n) decomposed as (sum div n)·10⁶ + ((sum mod n)·10⁶
        // div n): the remainder term's factor is < n, so nothing overflows
        // 64-bit even when sum·10⁶ itself would (multi-TB strata) — and the
        // identity is exact, so the oracle mirrors the same decomposition.
        .withColumn("wins_mean_ppm",
          expr("CAST(sum_wins DIV n_docs * 1000000 + " +
               "(sum_wins % n_docs) * 1000000 DIV n_docs AS BIGINT)"))
        .orderBy("source")
    },

    // C1 companion: score-proportional IMPORTANCE SAMPLING — the
    // quality-weighted acceptance step of a training-mix builder (keep
    // p = score, deterministically). A document is accepted iff an
    // engine-neutral hash of its id falls below its score_ppm, so the
    // sample is reproducible row-local (no rand(), no global state) and
    // the per-source acceptance rate converges to the mean score. Score
    // here is the length-weighted ramp min(1, n_tokens/60) as floor-ppm
    // — stand-in for any upstream quality model's [0,1] output. Audit
    // columns report realized vs target acceptance, both exact integers.
    "q84_importance_sample" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
        .withColumn("score_ppm",
          least(lit(1000000L), expr("n_tokens * 1000000 DIV 60")))
        .withColumn("h",
          Dedup.neutralHash32(concat(lit("samp:"), col("doc_id").cast("string")))
            % 1000000)
        .withColumn("accepted", col("h") < col("score_ppm"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             count(when(col("accepted"), 1)).as("n_accepted"),
             sum(col("score_ppm")).cast("long").as("sum_score"))
        .withColumn("accept_ppm",
          expr("CAST(n_accepted * 1000000 DIV n_docs AS BIGINT)"))
        .withColumn("target_ppm", expr("CAST(sum_score DIV n_docs AS BIGINT)"))
        .orderBy("source")
    },

    // Boilerplate prefixes: documents sharing their first 100 chars —
    // the template/header clusters a curation pipeline strips before
    // near-dup analysis (a viral prefix also breaks shingle dedup, see
    // Dedup.capDocFrequency).
    "q50_boilerplate_prefix" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("phash", md5(substring(col("text"), 1, 100).cast("binary")))
        .groupBy("phash")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("source")).as("n_sources"),
             countDistinct(col("lang")).as("n_langs"),
             min(col("doc_id")).as("min_doc_id"))
        .filter(col("n_docs") >= 2)
        .orderBy("phash")
    },

    // Join-skew diagnostics: the pre-flight audit run before a big
    // shuffle join to decide whether a key needs salting / AQE skew
    // handling. Per-key row counts (one map-side-combined aggregation),
    // then two tiny reductions: global stats and the top-10 key mass
    // (TakeOrdered — sort+limit, never a global window; ties broken by
    // key so the top-10 set is deterministic). Ratios are floor-ppm
    // integers. On 100 TB this is exactly the plan you want: one shuffle
    // at key cardinality, everything after is O(keys) and O(10).
    "q89_skew_audit" -> { (s, d) =>
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(
        count(lit(1)).cast("long").as("n_keys"),
        sum(col("cnt")).cast("long").as("total_rows"),
        max(col("cnt")).cast("long").as("max_cnt"))
      val top10 = counts.orderBy(col("cnt").desc, col("l_suppkey"))
        .limit(10)
        .agg(sum(col("cnt")).cast("long").as("top10_cnt"))
      stats.crossJoin(broadcast(top10))
        .withColumn("top10_share_ppm",
          expr("CAST(top10_cnt * 1000000 DIV total_rows AS BIGINT)"))
        // divide FIRST: max_cnt·n_keys·10⁶ would overflow BIGINT on a
        // 100 TB fact table with real skew; avg_cnt ≥ 1 by construction
        .withColumn("max_avg_ratio_ppm",
          expr("CAST(max_cnt * 1000000 DIV (total_rows DIV n_keys) AS BIGINT)"))
    },

    // k-anonymity audit: group the corpus by its quasi-identifier tuple
    // (lang, source, length-bucket) and report the group-SIZE histogram
    // with the k<5 at-risk flag — the privacy pre-release gate (a
    // quasi-identifier combination shared by fewer than k documents
    // re-identifies). Two map-side-combined aggregations, second one
    // over O(distinct sizes) rows; no window, no join. At 100 TB the
    // first groupBy is the only shuffle and its cardinality is the QID
    // domain, not the row count.
    "q92_k_anonymity" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          expr("CAST(n_chars DIV 100 AS BIGINT)").as("len_bucket"))
        .agg(count(lit(1)).as("group_size"))
        .groupBy(col("group_size").cast("long").as("group_size"))
        .agg(count(lit(1)).cast("long").as("n_groups"))
        .withColumn("n_docs",
          expr("CAST(group_size * n_groups AS BIGINT)"))
        .withColumn("at_risk", col("group_size") < 5)
        .orderBy("group_size")
    },

    // HyperLogLog REGISTER construction, engine-exact (next to q54's
    // Count-Min: the other classical mergeable sketch). Spark's own
    // approx_count_distinct is an HLL whose binary state no other
    // engine reproduces — so this builds the registers from the
    // engine-neutral md5 hash instead: 60-bit h = first 15 md5 hex
    // digits; bucket = low 6 bits (m=64 registers); rho = leading-zero
    // count of the remaining 54-bit value + 1 = 55 − bitlength(v),
    // with bitlength exact in BOTH engines as length(bin(v)) — no
    // floats, no logs. Register value = max rho per (source, bucket).
    // Why registers and not the estimate: the α·m²/Σ2^{−rho} finishing
    // step is one IEEE expression over 64 values, but the STATE is the
    // operator — registers max-merge associatively, so partial
    // aggregation IS the distributed merge (map-side combine does the
    // sketch union; OpsSpec asserts split-merge equality), and the
    // shuffle carries ≤ |sources|·64 rows at ANY corpus size.
    "q133_hll_registers" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"))
        .withColumn("bucket", expr("CAST(h % 64 AS BIGINT)"))
        .withColumn("v", expr("h DIV 64"))
        .withColumn("rho",
          expr("CAST(CASE WHEN v = 0 THEN 55 ELSE 55 - length(bin(v)) END AS BIGINT)"))
        .groupBy("source", "bucket")
        .agg(max(col("rho")).as("max_rho"),
          count(lit(1)).cast("long").as("n_items"))
        .orderBy("source", "bucket")
    },

    // Join-cardinality estimator audit — the cost-based-optimizer
    // primitive, measured against ground truth: for the self-join of
    // lineitem on l_suppkey, the EXACT output size (Σ c_k² over per-key
    // counts — no join executed, one aggregation), the textbook uniform
    // estimate |A|²/ndv, and the heavy-hitter-corrected estimate
    // (exact mass for the top-10 keys + uniform tail) — with floor-ppm
    // error for both. The audit quantifies exactly how much skew the
    // uniform assumption hides, which is the number that justifies
    // q89's skew handling. One map-combined key aggregation; top-10 is
    // TakeOrdered; everything downstream is one-row broadcasts.
    // Magnitude note: a join CARDINALITY is quadratic in row count, so
    // every n·n / est·10⁶ intermediate is computed in DECIMAL(38,0)
    // (HUGEINT in the oracle); the final BIGINT estimates themselves
    // only outgrow int64 once the true cardinality tops 9·10¹⁸ — past
    // that, run the audit per-partition-of-keys (the estimates are
    // sums over keys, so they shard exactly).
    "q165_join_cardinality" -> { (s, d) =>
      val cnts = Tables.lineitem(s, d)
        .groupBy("l_suppkey").agg(count(lit(1)).as("c"))
      val stats = cnts.agg(
        sum(col("c")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("ndv"),
        sum(col("c") * col("c")).cast("long").as("exact_pairs"))
      val top = cnts.orderBy(col("c").desc, col("l_suppkey")).limit(10)
        .agg(coalesce(sum(col("c") * col("c")), lit(0L)).cast("long").as("hh_pairs"),
          coalesce(sum(col("c")), lit(0L)).cast("long").as("hh_rows"),
          count(lit(1)).cast("long").as("hh_n"))
      stats.crossJoin(broadcast(top))
        .withColumn("uniform_est",
          expr("CAST(CAST(n_rows AS DECIMAL(38,0)) * n_rows DIV ndv AS BIGINT)"))
        .withColumn("hh_est", expr(
          """CAST(hh_pairs + CASE WHEN ndv > hh_n
            |  THEN CAST(n_rows - hh_rows AS DECIMAL(38,0)) * (n_rows - hh_rows)
            |    DIV (ndv - hh_n)
            |  ELSE 0 END AS BIGINT)""".stripMargin))
        .select(col("n_rows"), col("ndv"), col("exact_pairs"),
          col("uniform_est"), col("hh_est"),
          expr("CAST(abs(CAST(uniform_est AS DECIMAL(38,0)) - exact_pairs) * 1000000 DIV exact_pairs AS BIGINT)")
            .as("uniform_err_ppm"),
          expr("CAST(abs(CAST(hh_est AS DECIMAL(38,0)) - exact_pairs) * 1000000 DIV exact_pairs AS BIGINT)")
            .as("hh_err_ppm"))
    },

    // Weight-proportional Bernoulli (Poisson) sampling, deterministic:
    // each document is kept with probability n_chars/max(n_chars) —
    // long documents (more training tokens) sampled proportionally
    // more often — decided by the engine-neutral content hash, the
    // same reproducibility rule as q47's stratified quotas: no rand(),
    // no partition-order dependence, identical keep set on any engine,
    // any layout, any run. The salted hash key ("wsamp:"+doc_id) is
    // independent of q47's split hash by construction. One broadcast
    // scalar (global max weight) + one map-side keep decision + one
    // map-combined source aggregation: embarrassingly parallel at any
    // corpus size.
    "q157_weighted_sample" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val wmax = docs.agg(max(col("n_chars")).as("wmax"))
      docs.crossJoin(broadcast(wmax))
        .withColumn("h", Dedup.neutralHash32(
          concat(lit("wsamp:"), col("doc_id").cast("string"))) % 1000000L)
        .withColumn("kept", col("h") < expr("n_chars * 1000000 DIV wmax"))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"),
          sum(when(col("kept"), col("n_chars")).otherwise(0L)).cast("long")
            .as("kept_chars"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .withColumn("kept_ppm", expr("CAST(n_kept * 1000000 DIV n_docs AS BIGINT)"))
        .orderBy("source")
    },

    // Dense equi-width histogram with EMPTY-BIN densification: 10 bins
    // over the global value range per event type, where absent bins
    // are emitted as explicit zeros (sequence-explode grid + left
    // join) — the shape a monitoring/charting consumer needs (a
    // missing bin and a zero bin are different facts). Bin boundaries
    // are computed in exact integer micros (floor(value·10⁶) — one
    // mirrored IEEE multiply+floor) against the broadcast global max,
    // so bin edges cannot drift between engines. Scale: the raw scan
    // reduces to the ≤|types|×10 grid via one map-combined agg; the
    // densification grid and share normalizer live entirely on that
    // bounded grid.
    "q158_dense_histogram" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("vm"))
      val mx = ev.agg(max(col("vm")).as("vmax"))
      val binned = ev.crossJoin(broadcast(mx))
        .withColumn("bin", expr("least(vm * 10 DIV vmax, 9L)"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
      val grid = binned.select("event_type").distinct()
        .select(col("event_type"), explode(expr("sequence(0L, 9L)")).as("bin"))
      val dense = grid.join(binned, Seq("event_type", "bin"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)).cast("long"))
      val tot = dense.groupBy("event_type").agg(sum(col("n")).as("tot"))
      dense.join(tot, "event_type")
        .select(col("event_type"), col("bin"), col("n"),
          expr("CAST(n * 1000000 DIV tot AS BIGINT)").as("share_ppm"))
        .orderBy("event_type", "bin")
    },

    // Functional-dependency discovery audit: does column A determine
    // column B? The schema-inference / data-contract check a pipeline
    // runs before trusting a column as a lookup key (and the classical
    // TANE/FDep primitive). Four candidate FDs — two that must hold
    // (primary keys determine their row) and two that must fail (a
    // customer places orders at many priorities; an order mixes return
    // flags) — each audited as: group by LHS, count DISTINCT RHS per
    // group, then one groupless rollup counting violating groups.
    // Per FD the only shuffle is the map-combined LHS-key aggregation
    // (cardinality = |LHS domain|, not row count) followed by an O(1)
    // rollup — the same two-level shape as q92, once per candidate.
    // At 100 TB each audit is one pass over two columns of one table;
    // candidates are independent so Spark schedules them in parallel.
    "q148_fd_audit" -> { (s, d) =>
      def fd(df: DataFrame, lhs: String, rhs: String, label: String) =
        df.groupBy(col(lhs))
          .agg(countDistinct(col(rhs)).as("n_rhs"))
          .agg(count(lit(1)).cast("long").as("n_groups"),
            sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).cast("long")
              .as("n_violating"),
            max(col("n_rhs")).cast("long").as("max_rhs"))
          .select(lit(label).as("fd"), col("n_groups"), col("n_violating"),
            col("max_rhs"), (col("n_violating") === 0L).as("holds"))
      val ord = Tables.orders(s, d)
      fd(ord, "o_orderkey", "o_orderstatus", "orderkey->status")
        .unionByName(fd(ord, "o_custkey", "o_orderpriority", "custkey->priority"))
        .unionByName(fd(Tables.customer(s, d), "c_custkey", "c_mktsegment",
          "custkey->segment"))
        .unionByName(fd(Tables.lineitem(s, d), "l_orderkey", "l_returnflag",
          "orderkey->returnflag"))
        .orderBy("fd")
    },

    // l-diversity audit — the release gate one notch past q92's
    // k-anonymity: a quasi-identifier group can be large (k-anonymous)
    // yet still leak if every member shares one sensitive value. QID =
    // (order year, market segment, order priority); sensitive attribute
    // = the customer's nation. Per QID group count DISTINCT nations
    // (that group's l), then histogram groups by l with the l<3 at-risk
    // flag. One broadcast-sized dim join (customer is the bounded side
    // here only at test SF — at scale this is a plain key equi-join),
    // one map-combined QID aggregation (cardinality = QID domain), one
    // O(distinct l) rollup. No window, no self-join.
    "q149_l_diversity" -> { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          col("c_mktsegment"), col("o_orderpriority"))
        .agg(countDistinct(col("c_nationkey")).as("l"),
          count(lit(1)).as("n_orders"))
        .groupBy(col("l").cast("long").as("l"))
        .agg(count(lit(1)).cast("long").as("n_groups"),
          sum(col("n_orders")).cast("long").as("n_orders"))
        .withColumn("at_risk", col("l") < 3)
        .orderBy("l")
    },

    // Exact WEIGHTED quantiles (p25/p50/p75 of unit price, weighted by
    // quantity, per return flag) — the "median price actually paid per
    // unit" statistic, where an unweighted median over line items is
    // simply the wrong number. Quantile q = the smallest value whose
    // cumulative weight clears q·W — located by integer
    // cross-multiplication (4·cum ≥ W, 2·cum ≥ W, 4·cum ≥ 3·W), no
    // float thresholds, no interpolation ambiguity. Scale: line items
    // collapse to the (flag, price_cents) grid in ONE map-combined
    // agg; the cumulative window runs per flag ON THE GRID (distinct
    // prices, not raw rows); the per-flag totals broadcast. For
    // ultra-wide value domains, pre-bucket the grid (q62's histogram)
    // and refine within the winning bucket — documented, not needed at
    // this domain size (prices are bounded ~10⁵ distinct cents).
    "q179_weighted_quantiles" -> { (s, d) =>
      val grid = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("price_cents"),
          expr("CAST(l_quantity AS BIGINT)").as("w"))
        .groupBy("flag", "price_cents")
        .agg(sum(col("w")).as("wsum"))
      val tot = grid.groupBy("flag").agg(sum(col("wsum")).as("wtot"))
      val wCum = Window.partitionBy("flag").orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.withColumn("cum", sum(col("wsum")).over(wCum))
        .join(tot, "flag")
        .groupBy(col("flag"))
        .agg(
          min(when(col("cum") * 4 >= col("wtot"), col("price_cents")))
            .cast("long").as("p25_cents"),
          min(when(col("cum") * 2 >= col("wtot"), col("price_cents")))
            .cast("long").as("p50_cents"),
          min(when(col("cum") * 4 >= col("wtot") * 3, col("price_cents")))
            .cast("long").as("p75_cents"),
          max(col("wtot")).cast("long").as("total_weight"))
        .orderBy("flag")
    },

    // COMPRESSION-ratio quality signal (the CCNet/RefinedWeb gzip
    // filter): per source, the deflate(level 6) byte mass over the raw
    // byte mass in floor-ppm, plus the count of suspiciously-
    // compressible docs (ratio < 25% — template/boilerplate spam; prose
    // sits far higher). Runs through the codegen'd [[DeflateLength]]
    // expression — one static zlib call per row inside the projection,
    // no UDF boxing. Oracle: zlib is not expressible in DuckDB SQL, so
    // Verify emits a JVM-MIRROR oracle — the expected aggregates
    // recomputed driver-side by an independent java.util.zip loop over
    // the same parquet, dumped as a literal VALUES query (Verify.scala)
    // — giving this row the same hard rows+schema+hash verdict as the
    // SQL-expressible queries; determinism and the more-repetition-
    // compresses-more law stay spec-proven too (AuditOpsSpec).
    "q339_gzip_quality" -> { (s, d) =>
      import graft.functions.TextCodecs.deflate_len
      Tables.documents(s, d)
        .select(col("source"), octet_length(col("text")).cast("long").as("nb"),
          deflate_len(col("text")).as("nz"))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("nb")).cast("long").as("raw_bytes"),
          sum(col("nz")).cast("long").as("deflate_bytes"),
          sum(when(col("nz") * 4 < col("nb"), 1L).otherwise(0L)).cast("long")
            .as("n_suspicious"))
        .withColumn("ratio_ppm",
          expr("CAST(deflate_bytes * 1000000 DIV raw_bytes AS BIGINT)"))
        .orderBy("source")
    },

    // Unicode NFC-normalization audit: docs whose text changes under
    // canonical composition and the char-count delta — the hygiene gate
    // in FRONT of every hash-based dedup tier (composed "café" and
    // decomposed "café" are the same text but different md5s; q310
    // prices the multibyte mass, this prices the mass that isn't even
    // canonically composed). Runs through the codegen'd [[NfcNormalize]]
    // expression; DuckDB mirrors with nfc_normalize(). The shipped
    // corpus is ASCII, so the zeros are measured facts (the q158 rule);
    // the detector is spec-proven on injected decomposed text.
    "q340_nfc_audit" -> { (s, d) =>
      import graft.functions.TextCodecs.nfc
      Tables.documents(s, d)
        .select(col("source"), col("text"), nfc(col("text")).as("nt"))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("text") =!= col("nt"), 1L).otherwise(0L)).cast("long")
            .as("docs_changed"),
          sum(abs(length(col("text")) - length(col("nt")))).cast("long")
            .as("chars_delta"))
        .withColumn("changed_ppm",
          expr("CAST(docs_changed * 1000000 DIV n_docs AS BIGINT)"))
        .orderBy("source")
    }
  )

  def oracle: Map[String, String] = Map(
    "q471_sampling_bias" ->
      """WITH base AS (
        |  SELECT source, n_chars AS v,
        |    ('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 16 = 0 AS in_samp
        |  FROM documents),
        |per AS (
        |  SELECT source, v, COUNT(*) AS nf,
        |    SUM(CASE WHEN in_samp THEN 1 ELSE 0 END) AS ns
        |  FROM base GROUP BY 1, 2),
        |tot AS (SELECT source, SUM(nf) AS tf, SUM(ns) AS ts_
        |        FROM per GROUP BY 1),
        |cum AS (
        |  SELECT source, v, nf, ns,
        |    SUM(nf) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf,
        |    SUM(ns) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |  FROM per),
        |d AS (
        |  SELECT c.source, t.tf, t.ts_,
        |    CAST(ABS(CAST(cs AS HUGEINT) * tf - CAST(cf AS HUGEINT) * ts_)
        |      * 1000000 // (CAST(tf AS HUGEINT) * GREATEST(ts_, 1))
        |      AS BIGINT) AS d_ppm
        |  FROM cum c JOIN tot t USING (source))
        |SELECT source, CAST(MAX(tf) AS BIGINT) AS n_full,
        |  CAST(MAX(ts_) AS BIGINT) AS n_sample,
        |  CAST(MAX(d_ppm) AS BIGINT) AS ks_ppm
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q469_epoch_shuffle" -> {
      def ranks(e: Int) =
        s"""r$e AS (
           |  SELECT source, doc_id,
           |    row_number() OVER (PARTITION BY source ORDER BY
           |      ('0x' || substr(md5('epoch$e:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
           |      doc_id) AS rk
           |  FROM documents),
           |p$e AS (
           |  SELECT a.source, LEAST(a.doc_id, b.doc_id) AS lo,
           |    GREATEST(a.doc_id, b.doc_id) AS hi
           |  FROM r$e a JOIN r$e b
           |    ON a.source = b.source AND b.rk = a.rk + 1)""".stripMargin
      s"""WITH ${ranks(0)},
        |${ranks(1)},
        |rep AS (
        |  SELECT p0.source, COUNT(*) AS n_repeats
        |  FROM p0 JOIN p1 USING (source, lo, hi) GROUP BY 1),
        |tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT t.source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(COALESCE(n_repeats, 0) AS BIGINT) AS n_repeats,
        |  CAST(COALESCE(n_repeats, 0) * 1000000
        |    // GREATEST(n_docs - 1, 1) AS BIGINT) AS repeat_ppm,
        |  CAST(2000000 // GREATEST(n_docs - 1, 1) AS BIGINT) AS expected_ppm
        |FROM tot t LEFT JOIN rep ON rep.source = t.source
        |ORDER BY t.source""".stripMargin
    },

    "q141_zorder_zonemap" ->
      s"""WITH ev AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |keyed AS (
        |  SELECT user_id, day,
        |    (${zorderSql("(user_id % 256)", "(day % 256)", "//")}) // 32
        |      AS zfile
        |  FROM ev),
        |zones AS (
        |  SELECT 'zorder' AS layout, zfile AS file_id,
        |    MIN(user_id) AS min_u, MAX(user_id) AS max_u,
        |    MIN(day) AS min_d, MAX(day) AS max_d, COUNT(*) AS n_rows
        |  FROM keyed GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'by_day', day, MIN(user_id), MAX(user_id),
        |    MIN(day), MAX(day), COUNT(*)
        |  FROM keyed GROUP BY 1, 2)
        |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN min_u <= 7 AND max_u >= 7
        |    THEN 1 ELSE 0 END) AS BIGINT) AS files_user_query,
        |  CAST(SUM(CASE WHEN min_d <= 19740 AND max_d >= 19740
        |    THEN 1 ELSE 0 END) AS BIGINT) AS files_day_query
        |FROM zones GROUP BY layout ORDER BY layout""".stripMargin,

    "q142_bootstrap_ci" ->
      """WITH reps AS (
        |  SELECT source, doc_id, n_chars, b,
        |    1 + ('0x' || substr(md5(
        |      doc_id::VARCHAR || ':' || b::VARCHAR), 1, 8))::BIGINT % 3 AS w
        |  FROM documents, UNNEST(generate_series(0, 31)) AS g(b)),
        |est AS (
        |  SELECT source, b,
        |    CAST(SUM(w * n_chars) * 1000 // SUM(w) AS BIGINT) AS est_milli
        |  FROM reps GROUP BY 1, 2),
        |rk AS (
        |  SELECT source, est_milli,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY est_milli, b) AS rn
        |  FROM est),
        |ci AS (
        |  SELECT source,
        |    MAX(CASE WHEN rn = 2 THEN est_milli END) AS lo_milli,
        |    MAX(CASE WHEN rn = 31 THEN est_milli END) AS hi_milli
        |  FROM rk GROUP BY 1)
        |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) * 1000 // COUNT(*) AS BIGINT) AS mean_milli,
        |  MAX(ci.lo_milli) AS lo_milli, MAX(ci.hi_milli) AS hi_milli
        |FROM documents d JOIN ci ON d.source = ci.source
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q144_spearman" ->
      """WITH m AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |ranked AS (
        |  SELECT source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk_a,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_tok, doc_id) AS BIGINT) AS rk_b
        |  FROM m),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM((rk_a - rk_b) * (rk_a - rk_b)) AS BIGINT) AS sum_d2
        |  FROM ranked GROUP BY 1)
        |SELECT source, n_docs, sum_d2,
        |  CASE WHEN n_docs < 2 THEN CAST(NULL AS DOUBLE)
        |  ELSE round(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE) /
        |    (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) *
        |     CAST(n_docs AS DOUBLE) - CAST(n_docs AS DOUBLE)), 6) END AS rho
        |FROM agg ORDER BY source""".stripMargin,

    "q145_benford" ->
      """WITH fd AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders WHERE o_totalprice >= 1),
        |obs AS (SELECT digit, COUNT(*) AS n FROM fd GROUP BY 1),
        |n AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM obs),
        |exp AS (
        |  SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |    (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |    (9, 45757)) AS t(digit, benford_ppm)),
        |j AS (
        |  SELECT e.digit, COALESCE(o.n, 0) AS n, e.benford_ppm, n.n_total
        |  FROM exp e LEFT JOIN obs o ON e.digit = o.digit CROSS JOIN n)
        |SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000000 // n_total AS BIGINT) AS share_ppm,
        |  CAST(benford_ppm AS BIGINT) AS benford_ppm,
        |  CAST(abs(n * 1000000 // n_total - benford_ppm) AS BIGINT)
        |    AS dev_ppm
        |FROM j ORDER BY digit""".stripMargin,

    "q133_hll_registers" ->
      """WITH hx AS (
        |  SELECT source,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |b AS (SELECT source, h % 64 AS bucket, h // 64 AS v FROM hx)
        |SELECT source, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(MAX(CASE WHEN v = 0 THEN 55
        |                ELSE 55 - length(bin(v)) END) AS BIGINT) AS max_rho,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,

    "q47_stratified_sample" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hk
        |  FROM documents),
        |r AS (SELECT lang, doc_id, hk,
        |        row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
        |      FROM h)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, hk
        |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,

    "q107_table_profile" -> {
      // static mirror of the orders schema: a drift (new/renamed column)
      // fails the driver compare loudly, which is the desired behavior
      // for a profiling contract
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val legs = cols.map(c =>
        s"""SELECT '$c' AS column_name,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct FROM orders""".stripMargin)
        .mkString("\n  UNION ALL\n")
      s"""WITH p AS (
        |$legs),
        |n AS (SELECT COUNT(*) AS n_rows FROM orders)
        |SELECT column_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_null AS BIGINT) AS n_null,
        |  CAST(n_distinct AS BIGINT) AS n_distinct
        |FROM p CROSS JOIN n ORDER BY column_name""".stripMargin
    },

    "q128_mad_scale" ->
      """WITH med AS (
        |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
        |  FROM documents GROUP BY lang),
        |dev AS (
        |  SELECT d.lang, m.med, abs(d.n_chars - m.med) AS dev
        |  FROM documents d JOIN med m USING (lang))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  round(MIN(med), 6) AS median_chars,
        |  round(quantile_cont(dev, 0.5), 6) AS mad,
        |  round(quantile_cont(dev, 0.5) * 1.4826, 6) AS mad_sigma,
        |  round(MAX(dev), 6) AS max_dev
        |FROM dev GROUP BY lang ORDER BY lang""".stripMargin,

    "q116_rrf_fusion" ->
      """WITH base AS (
        |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS s_len,
        |    CAST(len(list_distinct(string_split(text, ' '))) * 1000000 //
        |         len(string_split(text, ' ')) AS BIGINT) AS s_ttr
        |  FROM documents WHERE doc_id % 7 = 0),
        |rk AS (
        |  SELECT lang, doc_id, s_len, s_ttr,
        |    row_number() OVER (PARTITION BY lang ORDER BY s_len DESC, doc_id) AS r1,
        |    row_number() OVER (PARTITION BY lang ORDER BY s_ttr DESC, doc_id) AS r2
        |  FROM base),
        |f AS (
        |  SELECT lang, doc_id, r1, r2,
        |    1000000 // (60 + r1) + 1000000 // (60 + r2) AS rrf
        |  FROM rk),
        |r AS (
        |  SELECT lang, doc_id, r1, r2, rrf,
        |    row_number() OVER (PARTITION BY lang ORDER BY rrf DESC, doc_id) AS rank
        |  FROM f)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id,
        |  CAST(r1 AS BIGINT) AS r1, CAST(r2 AS BIGINT) AS r2,
        |  CAST(rrf AS BIGINT) AS rrf
        |FROM r WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,

    "q113_ks_drift" ->
      """WITH docs AS (
        |  SELECT source, n_chars // 16 AS len_bin FROM documents),
        |per_sl AS (
        |  SELECT source, len_bin, COUNT(*) AS c FROM docs GROUP BY 1, 2),
        |lens AS (SELECT DISTINCT len_bin FROM docs),
        |srcs AS (SELECT source, COUNT(*) AS n_s FROM docs GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_g FROM docs),
        |grid AS (
        |  SELECT s.source, s.n_s, l.len_bin, COALESCE(p.c, 0) AS c
        |  FROM srcs s CROSS JOIN lens l
        |  LEFT JOIN per_sl p ON p.source = s.source AND p.len_bin = l.len_bin),
        |cum AS (
        |  SELECT source, n_s, len_bin,
        |    SUM(c) OVER (PARTITION BY source ORDER BY len_bin
        |                 ROWS UNBOUNDED PRECEDING) AS cum_s
        |  FROM grid),
        |gcum AS (SELECT len_bin, SUM(cum_s) AS cum_g FROM cum GROUP BY len_bin),
        |diff AS (
        |  SELECT c.source, c.n_s, c.len_bin,
        |    abs(c.cum_s * 1000000 // c.n_s - g.cum_g * 1000000 // n.n_g) AS d
        |  FROM cum c JOIN gcum g USING (len_bin) CROSS JOIN n),
        |r AS (
        |  SELECT source, n_s, len_bin, d,
        |    row_number() OVER (PARTITION BY source ORDER BY d DESC, len_bin) AS rn
        |  FROM diff)
        |SELECT source, CAST(n_s AS BIGINT) AS n_docs,
        |  CAST(d AS BIGINT) AS ks_ppm, CAST(len_bin AS BIGINT) AS at_bin
        |FROM r WHERE rn = 1 ORDER BY source""".stripMargin,

    "q103_fk_audit" ->
      """WITH l AS (
        |  SELECT 'lineitem.l_orderkey->orders' AS relation,
        |    (SELECT COUNT(*) FROM lineitem) AS n_child,
        |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
        |       (SELECT o_orderkey FROM orders)) AS n_orphan,
        |    (SELECT COUNT(*) FROM orders) AS n_parent,
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey NOT IN
        |       (SELECT l_orderkey FROM lineitem)) AS n_childless
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
        |       (SELECT c_custkey FROM customer)),
        |    (SELECT COUNT(*) FROM customer),
        |    (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
        |       (SELECT o_custkey FROM orders))
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem WHERE l_suppkey NOT IN
        |       (SELECT s_suppkey FROM supplier)),
        |    (SELECT COUNT(*) FROM supplier),
        |    (SELECT COUNT(*) FROM supplier WHERE s_suppkey NOT IN
        |       (SELECT l_suppkey FROM lineitem)))
        |SELECT relation, CAST(n_child AS BIGINT) AS n_child,
        |  CAST(n_orphan AS BIGINT) AS n_orphan,
        |  CAST(n_orphan * 1000000 // n_child AS BIGINT) AS orphan_ppm,
        |  CAST(n_parent AS BIGINT) AS n_parent,
        |  CAST(n_childless AS BIGINT) AS n_childless
        |FROM l ORDER BY relation""".stripMargin,

    "q104_curriculum_buckets" ->
      """WITH sc AS (
        |  SELECT lang, doc_id,
        |    CAST(n_chars * 100 // len(string_split(text, ' ')) AS BIGINT) AS score
        |  FROM documents),
        |b AS (
        |  SELECT lang, score,
        |    ntile(5) OVER (PARTITION BY lang ORDER BY score, doc_id) AS bucket
        |  FROM sc)
        |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(score) AS min_score, MAX(score) AS max_score
        |FROM b GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    "q100_length_outliers" ->
      """WITH b AS (
        |  SELECT lang, quantile_cont(n_chars, 0.25) AS q1,
        |         quantile_cont(n_chars, 0.75) AS q3
        |  FROM documents GROUP BY lang),
        |b2 AS (SELECT lang, q1, q3,
        |  q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi FROM b)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  round(MIN(q1), 6) AS q1, round(MIN(q3), 6) AS q3,
        |  round(MIN(lo), 6) AS lo, round(MIN(hi), 6) AS hi,
        |  CAST(COUNT(*) FILTER (n_chars < lo) AS BIGINT) AS n_out_lo,
        |  CAST(COUNT(*) FILTER (n_chars > hi) AS BIGINT) AS n_out_hi,
        |  CAST((COUNT(*) FILTER (n_chars < lo) +
        |        COUNT(*) FILTER (n_chars > hi)) * 1000000 // COUNT(*)
        |    AS BIGINT) AS out_ppm
        |FROM documents d JOIN b2 USING (lang)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "q48_token_quantiles" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | round(quantile_cont(len(string_split(text, ' ')), 0.25), 6) AS p25,
        | round(quantile_cont(len(string_split(text, ' ')), 0.5), 6) AS p50,
        | round(quantile_cont(len(string_split(text, ' ')), 0.75), 6) AS p75,
        | round(quantile_cont(len(string_split(text, ' ')), 0.95), 6) AS p95
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q49_embedding_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE vec_id % 25 = 0),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e),
        |sc AS (SELECT vec_id, v, max_abs, 127.0 / max_abs AS scale FROM m
        |       WHERE max_abs > 0),
        |qq AS (SELECT vec_id, v, max_abs, scale,
        |         list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS q
        |       FROM sc)
        |SELECT vec_id, round(max_abs, 6) AS max_abs,
        | CAST(len(list_filter(q, y -> abs(y) = 127)) AS BIGINT) AS n_sat,
        | CAST(list_sum(q) AS BIGINT) AS sum_q,
        | round(sqrt(list_sum(list_transform(generate_series(1, len(v)),
        |   i -> pow(v[i] - q[i] / scale, 2)))), 6) AS recon_err
        |FROM qq ORDER BY vec_id""".stripMargin,

    "q54_countmin_heavyhitters" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |th AS (SELECT term, ('0x' || substr(md5(term),1,8))::BIGINT % 2147483647 AS h FROM toks),
        |cells AS (
        |  SELECT i AS row, ((7919*(i+1)*h + 104729*i) % 2147483647) % 256 AS ccol
        |  FROM th, UNNEST(generate_series(0, 3)) AS g(i)),
        |matrix AS (SELECT row, ccol, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
        |probes AS (
        |  SELECT term, COUNT(*) AS exact_cnt, MIN(h) AS h FROM th GROUP BY term
        |  ORDER BY exact_cnt DESC, term LIMIT 5),
        |lookups AS (
        |  SELECT term, exact_cnt, i AS row,
        |    ((7919*(i+1)*h + 104729*i) % 2147483647) % 256 AS ccol
        |  FROM probes, UNNEST(generate_series(0, 3)) AS g(i)),
        |est AS (
        |  SELECT term, exact_cnt, MIN(cnt) AS cms_est
        |  FROM lookups JOIN matrix USING (row, ccol) GROUP BY 1, 2)
        |SELECT term, CAST(exact_cnt AS BIGINT) AS exact_cnt,
        |  CAST(cms_est AS BIGINT) AS cms_est,
        |  cms_est >= exact_cnt AS never_undercounts
        |FROM est ORDER BY exact_cnt DESC, term""".stripMargin,

    "q75_winsorized_stats" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn
        |  FROM documents),
        |n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
        |b AS (
        |  SELECT d.source,
        |    MIN(CASE WHEN rn - 1 = (5 * (n - 1)) // 100 THEN n_chars END) AS lo,
        |    MIN(CASE WHEN rn - 1 = (95 * (n - 1)) // 100 THEN n_chars END) AS hi
        |  FROM d JOIN n ON d.source = n.source GROUP BY 1),
        |c AS (
        |  SELECT d.source, d.n_chars, lo, hi,
        |    GREATEST(lo, LEAST(hi, d.n_chars)) AS c
        |  FROM d JOIN b ON d.source = b.source)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(lo) AS lo, MIN(hi) AS hi,
        |  CAST(SUM(c) AS BIGINT) AS sum_wins,
        |  CAST(COUNT(*) FILTER (n_chars < lo) AS BIGINT) AS n_clamped_lo,
        |  CAST(COUNT(*) FILTER (n_chars > hi) AS BIGINT) AS n_clamped_hi,
        |  CAST(SUM(c) // COUNT(*) * 1000000
        |       + (SUM(c) % COUNT(*)) * 1000000 // COUNT(*) AS BIGINT) AS wins_mean_ppm
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "q84_importance_sample" ->
      """WITH t AS (
        |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |sc AS (
        |  SELECT source, doc_id,
        |    LEAST(1000000, n_tokens * 1000000 // 60) AS score_ppm,
        |    ('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 AS h
        |  FROM t)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) FILTER (h < score_ppm) AS BIGINT) AS n_accepted,
        |  CAST(SUM(score_ppm) AS BIGINT) AS sum_score,
        |  CAST(COUNT(*) FILTER (h < score_ppm) * 1000000 // COUNT(*) AS BIGINT) AS accept_ppm,
        |  CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS target_ppm
        |FROM sc GROUP BY source ORDER BY source""".stripMargin,

    "q57_edit_distance" ->
      s"""WITH d0 AS (
        |  SELECT doc_id, text, md5(substr(text, 1, 100)) AS phash FROM documents),
        |ok AS (SELECT phash FROM d0 GROUP BY phash HAVING COUNT(*) <= $MaxEditCluster),
        |d AS (SELECT d0.* FROM d0 JOIN ok USING (phash)),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.text AS ta, b.text AS tb
        |      FROM d a JOIN d b ON a.phash = b.phash AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(levenshtein(ta, tb) AS BIGINT) AS dist,
        |  CAST(greatest(length(ta), length(tb)) AS BIGINT) AS max_len,
        |  round(100.0 * (greatest(length(ta), length(tb)) - levenshtein(ta, tb))
        |        / greatest(length(ta), length(tb)), 6) AS sim_pct
        |FROM p ORDER BY doc_a, doc_b""".stripMargin,

    "q50_boilerplate_prefix" ->
      """SELECT md5(substr(text, 1, 100)) AS phash,
        | CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        | CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        | MIN(doc_id) AS min_doc_id
        |FROM documents GROUP BY 1 HAVING COUNT(*) >= 2
        |ORDER BY phash""".stripMargin,

    "q89_skew_audit" ->
      """WITH counts AS (
        |  SELECT l_suppkey, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_suppkey),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(cnt) AS BIGINT) AS total_rows,
        |    CAST(MAX(cnt) AS BIGINT) AS max_cnt
        |  FROM counts),
        |top10 AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS top10_cnt FROM (
        |    SELECT cnt FROM counts
        |    ORDER BY cnt DESC, l_suppkey LIMIT 10))
        |SELECT n_keys, total_rows, max_cnt, top10_cnt,
        |  CAST(top10_cnt * 1000000 // total_rows AS BIGINT) AS top10_share_ppm,
        |  CAST(max_cnt * 1000000 // (total_rows // n_keys) AS BIGINT)
        |    AS max_avg_ratio_ppm
        |FROM stats CROSS JOIN top10""".stripMargin,

    "q92_k_anonymity" ->
      """WITH qid AS (
        |  SELECT lang, source, n_chars // 100 AS len_bucket,
        |         COUNT(*) AS group_size
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT CAST(group_size AS BIGINT) AS group_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(group_size * COUNT(*) AS BIGINT) AS n_docs,
        |  group_size < 5 AS at_risk
        |FROM qid GROUP BY group_size ORDER BY group_size""".stripMargin,

    "q165_join_cardinality" ->
      """WITH cnts AS (
        |  SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |st AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS ndv,
        |    CAST(SUM(c * c) AS BIGINT) AS exact_pairs
        |  FROM cnts),
        |tp AS (
        |  SELECT CAST(COALESCE(SUM(c * c), 0) AS BIGINT) AS hh_pairs,
        |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS hh_rows,
        |    CAST(COUNT(*) AS BIGINT) AS hh_n
        |  FROM (SELECT c FROM cnts ORDER BY c DESC, l_suppkey LIMIT 10)),
        |est AS (
        |  SELECT n_rows, ndv, exact_pairs,
        |    CAST(CAST(n_rows AS HUGEINT) * n_rows // ndv AS BIGINT)
        |      AS uniform_est,
        |    CAST(hh_pairs + CASE WHEN ndv > hh_n
        |      THEN CAST(n_rows - hh_rows AS HUGEINT) * (n_rows - hh_rows)
        |        // (ndv - hh_n)
        |      ELSE 0 END AS BIGINT) AS hh_est
        |  FROM st CROSS JOIN tp)
        |SELECT n_rows, ndv, exact_pairs, uniform_est, hh_est,
        |  CAST(abs(CAST(uniform_est AS HUGEINT) - exact_pairs) * 1000000
        |    // exact_pairs AS BIGINT) AS uniform_err_ppm,
        |  CAST(abs(CAST(hh_est AS HUGEINT) - exact_pairs) * 1000000
        |    // exact_pairs AS BIGINT) AS hh_err_ppm
        |FROM est""".stripMargin,

    "q157_weighted_sample" ->
      """WITH w AS (SELECT MAX(n_chars) AS wmax FROM documents),
        |k AS (
        |  SELECT source, n_chars,
        |    ('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 1000000 < n_chars * 1000000 // wmax AS kept
        |  FROM documents CROSS JOIN w)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
        |    AS kept_ppm
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q158_dense_histogram" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS vm
        |  FROM events),
        |mx AS (SELECT MAX(vm) AS vmax FROM ev),
        |b AS (
        |  SELECT event_type, LEAST(vm * 10 // vmax, 9) AS bin, COUNT(*) AS n
        |  FROM ev CROSS JOIN mx GROUP BY 1, 2),
        |grid AS (
        |  SELECT DISTINCT event_type, g.bin
        |  FROM b, UNNEST(generate_series(0, 9)) AS g(bin)),
        |dense AS (
        |  SELECT g.event_type, g.bin, COALESCE(b.n, 0) AS n
        |  FROM grid g LEFT JOIN b ON b.event_type = g.event_type
        |    AND b.bin = g.bin),
        |tot AS (SELECT event_type, SUM(n) AS tot FROM dense GROUP BY 1)
        |SELECT d.event_type, CAST(d.bin AS BIGINT) AS bin,
        |  CAST(d.n AS BIGINT) AS n,
        |  CAST(d.n * 1000000 // t.tot AS BIGINT) AS share_ppm
        |FROM dense d JOIN tot t USING (event_type)
        |ORDER BY 1, 2""".stripMargin,

    "q148_fd_audit" ->
      """WITH f1 AS (
        |  SELECT o_orderkey AS k, COUNT(DISTINCT o_orderstatus) AS n_rhs
        |  FROM orders GROUP BY 1),
        |f2 AS (
        |  SELECT o_custkey AS k, COUNT(DISTINCT o_orderpriority) AS n_rhs
        |  FROM orders GROUP BY 1),
        |f3 AS (
        |  SELECT c_custkey AS k, COUNT(DISTINCT c_mktsegment) AS n_rhs
        |  FROM customer GROUP BY 1),
        |f4 AS (
        |  SELECT l_orderkey AS k, COUNT(DISTINCT l_returnflag) AS n_rhs
        |  FROM lineitem GROUP BY 1),
        |u AS (
        |  SELECT 'orderkey->status' AS fd, * FROM f1
        |  UNION ALL SELECT 'custkey->priority', * FROM f2
        |  UNION ALL SELECT 'custkey->segment', * FROM f3
        |  UNION ALL SELECT 'orderkey->returnflag', * FROM f4)
        |SELECT fd,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  CAST(MAX(n_rhs) AS BIGINT) AS max_rhs,
        |  SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
        |FROM u GROUP BY fd ORDER BY fd""".stripMargin,

    "q149_l_diversity" ->
      """WITH qid AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    c_mktsegment, o_orderpriority,
        |    COUNT(DISTINCT c_nationkey) AS l,
        |    COUNT(*) AS n_orders
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3)
        |SELECT CAST(l AS BIGINT) AS l,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(n_orders) AS BIGINT) AS n_orders,
        |  l < 3 AS at_risk
        |FROM qid GROUP BY l ORDER BY l""".stripMargin,

    "q179_weighted_quantiles" ->
      """WITH grid AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS price_cents,
        |    SUM(CAST(l_quantity AS BIGINT)) AS wsum
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT flag, SUM(wsum) AS wtot FROM grid GROUP BY flag),
        |cum AS (
        |  SELECT flag, price_cents, SUM(wsum) OVER
        |    (PARTITION BY flag ORDER BY price_cents
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM grid)
        |SELECT cum.flag,
        |  CAST(MIN(CASE WHEN cum * 4 >= wtot THEN price_cents END) AS BIGINT)
        |    AS p25_cents,
        |  CAST(MIN(CASE WHEN cum * 2 >= wtot THEN price_cents END) AS BIGINT)
        |    AS p50_cents,
        |  CAST(MIN(CASE WHEN cum * 4 >= wtot * 3 THEN price_cents END) AS BIGINT)
        |    AS p75_cents,
        |  CAST(MAX(wtot) AS BIGINT) AS total_weight
        |FROM cum JOIN tot ON cum.flag = tot.flag
        |GROUP BY cum.flag ORDER BY cum.flag""".stripMargin,

    // q339_gzip_quality deliberately ABSENT: zlib is not expressible in
    // DuckDB SQL — the driver records the weaker rows-only check (the
    // declared streaming-op convention); AuditOpsSpec carries the
    // determinism and compression-law proofs.

    "q340_nfc_audit" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN text <> nfc_normalize(text) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS docs_changed,
        |  CAST(SUM(ABS(length(text) - length(nfc_normalize(text))))
        |    AS BIGINT) AS chars_delta,
        |  CAST(SUM(CASE WHEN text <> nfc_normalize(text) THEN 1 ELSE 0 END)
        |    * 1000000 // COUNT(*) AS BIGINT) AS changed_ppm
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
