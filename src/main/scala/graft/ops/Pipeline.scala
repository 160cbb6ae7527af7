package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Round-6 training-data pipeline operators (SURVEY.md §2F):
  * per-source frequency capping, normalization-tier dedup, stratified
  * k-fold assignment, the HLL cardinality ESTIMATE finishing q133's
  * registers, and bigram-level novelty scoring.
  *
  * Same contract as every ops module: each query paired with a DuckDB
  * oracle over the same parquet, engine-neutral md5-derived hashing
  * (never rand(), never Spark-internal Murmur3), floor-ppm integer
  * arithmetic, map-combinable aggregations, no unpartitioned windows.
  */
object Pipeline {

  /** q181's per-source document cap — ONE definition read by the query,
    * interpolated into the oracle, and asserted by PipelineSpec. */
  private[graft] val SourceCap = 60

  /** q183's fold count. */
  private[graft] val KFolds = 5

  /** q184's HLL bias constant α₆₄ = 0.7213/(1 + 1.079/64) ≈ 0.709341,
    * pinned as a ppm literal (the published constant from Flajolet et
    * al.'s HyperLogLog paper for m = 64 registers) so both engines use
    * the identical integer — no float derivation at query time. */
  private[graft] val Alpha64Ppm = 709341L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-source frequency CAP — the "downsample overrepresented
    // domains" curation primitive (a web crawl is 40% one boilerplate
    // mill; training mixes cap it): keep at most SourceCap docs per
    // source, chosen by engine-neutral hash order so the survivor set
    // is a uniform deterministic sample (no rand() — re-runs and the
    // oracle see the same set). Audit output: per source, how much doc
    // and char mass the cap sheds. Scale: the rank is a per-source
    // window — partitions are per-source, never global; at 100 TB a
    // single source's partition is still large, so the scale path is
    // threshold-refine (broadcast per-source counts, prefilter
    // hash < ~2·K/n of the hash domain, exact-rank only the ~K
    // survivors); the declared query keeps the one-window form the
    // oracle can mirror and documents the refinement.
    "q181_source_cap" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          Dedup.neutralHash32(
            concat(lit("cap:"), col("doc_id").cast("string"))).as("hk"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))))
        .withColumn("kept", col("rk") <= SourceCap)
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"),
          sum(when(col("kept"), col("n_chars")).otherwise(0L))
            .cast("long").as("kept_chars"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .withColumn("kept_ppm",
          expr("CAST(n_kept * 1000000 DIV n_docs AS BIGINT)"))
        .orderBy("source")
    },

    // Normalization-TIER dedup audit — the tier between exact md5
    // (q24: byte-identical only) and MinHash (q26: fuzzy): collapse
    // case-preserving reformatting by stripping non-alphanumerics and
    // collapsing runs of spaces, then fingerprint. The delta between
    // raw-distinct and normalized-distinct counts is exactly the
    // duplicate mass that trivial reformatting hides from exact dedup
    // but that near-dup machinery is overkill for. Regexes live in the
    // Java-regex ∩ RE2 intersection (explicit ASCII classes, no
    // backslash classes) so both engines normalize bytes identically;
    // no lower() — Unicode case folding is engine-dependent. Scale:
    // two countDistincts of fixed-width md5 strings per source — the
    // shuffle carries 32-char hashes, never text; the sketch-bounded
    // alternative at extreme |distinct| is q184's registers.
    "q182_norm_dedup" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), md5(col("text")).as("raw_h"),
          md5(trim(regexp_replace(
            regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), " +", " ")))
            .as("norm_h"))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          countDistinct(col("raw_h")).cast("long").as("ndv_raw"),
          countDistinct(col("norm_h")).cast("long").as("ndv_norm"))
        .withColumn("reformat_dups",
          expr("CAST(ndv_raw - ndv_norm AS BIGINT)"))
        .withColumn("norm_dup_ppm",
          expr("CAST((n_docs - ndv_norm) * 1000000 DIV n_docs AS BIGINT)"))
        .orderBy("source")
    },

    // Stratified k-fold assignment + balance audit — the CV/eval-split
    // generalization of q136's train/val/test rule: fold = neutral hash
    // of the doc id mod KFolds, so assignment is reproducible across
    // engines and runs, and adding a document never moves any other
    // document's fold (the property a growing corpus needs). Audit per
    // fold: doc and char mass, floor-ppm share of each, and the largest
    // single-source share inside the fold (a fold dominated by one
    // source evaluates that source, not the corpus). Scale: two
    // map-combined aggs onto the |folds| and |folds|×|sources| grids;
    // totals are one-row broadcasts.
    "q183_kfold_balance" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars"),
          (Dedup.neutralHash32(
            concat(lit("fold:"), col("doc_id").cast("string"))) % KFolds)
            .as("fold"))
      val byFold = docs.groupBy("fold")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
      val topSrc = docs.groupBy("fold", "source")
        .agg(count(lit(1)).as("c"))
        .groupBy("fold").agg(max(col("c")).cast("long").as("max_src_docs"))
      val tot = byFold.agg(sum(col("n_docs")).cast("long").as("t_docs"),
        sum(col("sum_chars")).cast("long").as("t_chars"))
      byFold.join(topSrc, "fold").crossJoin(broadcast(tot))
        .select(col("fold").cast("long").as("fold"),
          col("n_docs"), col("sum_chars"),
          expr("CAST(n_docs * 1000000 DIV t_docs AS BIGINT)").as("docs_ppm"),
          expr("CAST(sum_chars * 1000000 DIV t_chars AS BIGINT)").as("chars_ppm"),
          expr("CAST(max_src_docs * 1000000 DIV n_docs AS BIGINT)")
            .as("top_src_ppm"))
        .orderBy("fold")
    },

    // HLL cardinality ESTIMATE — the finishing step q133 deliberately
    // stops short of, now as its own op with the estimate computed in
    // EXACT integer arithmetic: E = α₆₄·m²/Σ2^(−Mⱼ) with the register
    // sum scaled by 2⁶² (max rho is 55, so every term 2^(62−ρ) is an
    // exact int64; the Σ and the α·m²·2⁶² numerator widen to
    // DECIMAL(38,0)/HUGEINT per the round-6 magnitude rule). Registers
    // use q133's exact derivation (60-bit md5 hash, m = 64, rho =
    // 55 − bitlength) and merge by MAX — the '__all__' row is the
    // union of the per-source sketches by that merge, demonstrating
    // the mergeability that makes the sketch the 100 TB path. The
    // exact countDistinct leg is the deliberate ground-truth audit
    // (same role as q41's brute-force sweep); err_ppm quantifies raw
    // HLL bias — large when n ≪ m (the regime the published
    // linear-counting correction exists for; n_empty is emitted so a
    // consumer can apply it — ln() is transcendental, so the mirrored
    // query stops at the raw estimate both engines compute exactly).
    "q184_hll_estimate" -> { (s, d) =>
      val hx = Tables.documents(s, d)
        .select(col("source"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"))
        .withColumn("bucket", expr("CAST(h % 64 AS BIGINT)"))
        .withColumn("v", expr("h DIV 64"))
        .withColumn("rho", expr(
          "CAST(CASE WHEN v = 0 THEN 55 ELSE 55 - length(bin(v)) END AS BIGINT)"))
      val perSrcReg = hx.groupBy("source", "bucket")
        .agg(max(col("rho")).as("max_rho"))
      val unionReg = perSrcReg.groupBy("bucket")
        .agg(max(col("max_rho")).as("max_rho"))
        .withColumn("source", lit("__all__"))
        .select("source", "bucket", "max_rho")
      val est = perSrcReg.unionByName(unionReg)
        .groupBy("source")
        .agg(sum(expr("CAST(shiftleft(1L, CAST(62 - max_rho AS INT)) AS DECIMAL(38,0))"))
            .as("s_occ"),
          count(lit(1)).as("n_occ"))
        .select(col("source"),
          expr("CAST(64 - n_occ AS BIGINT)").as("n_empty"),
          expr(s"""CAST(CAST($Alpha64Ppm AS DECIMAL(38,0)) * 4096 * 4611686018427387904
                  | DIV ((s_occ + (64 - n_occ) * CAST(4611686018427387904 AS DECIMAL(38,0)))
                  |      * 1000000) AS BIGINT)""".stripMargin)
            .as("hll_raw_est"))
      val exact = Tables.documents(s, d)
        .select(col("source"), md5(col("text")).as("h"))
      val exactPer = exact.groupBy("source")
        .agg(countDistinct(col("h")).cast("long").as("n_exact"))
      val exactAll = exact.agg(countDistinct(col("h")).cast("long").as("n_exact"))
        .withColumn("source", lit("__all__")).select("source", "n_exact")
      est.join(exactPer.unionByName(exactAll), "source")
        .select(col("source"), col("n_exact"), col("n_empty"), col("hll_raw_est"),
          expr("CAST(abs(hll_raw_est - n_exact) * 1000000 DIV n_exact AS BIGINT)")
            .as("err_ppm"))
        .orderBy("source")
    },

    // HLL PRECISION LADDER — q436 refines histograms and q338 sizes
    // blooms; this sizes the distinct-count sketch: the SAME register
    // construction as q133/q184 (15-hex md5 → h; value field v = h DIV
    // 256 so its bits are disjoint from EVERY bucket width here;
    // rho = 53 − bitlen(v)) run at m ∈ {16, 64, 256} registers over
    // the distinct-user population, with the raw HLL estimate in exact
    // integer arithmetic (empties contribute 2⁶⁰ to the harmonic sum;
    // α_m in ppm; DECIMAL(38,0) numerator) and the measured error vs
    // the exact count. The table is the memory-vs-accuracy sizing
    // sheet: 16 registers = 128 B of state, 256 = 2 KB — and the
    // measured err_ppm says what each buys. Scale: ONE hash pass
    // cached, one ≤ m-row register agg per rung.
    "q465_hll_precision_ladder" -> { (s, d) =>
      val hx = Caches.shared(Tables.events(s, d)
        .select(conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long").as("h"))
        .withColumn("v", expr("h DIV 256"))
        .withColumn("rho", expr(
          "CAST(CASE WHEN v = 0 THEN 53 ELSE 53 - length(bin(v)) END AS BIGINT)")))
      val exact = Tables.events(s, d)
        .agg(countDistinct(col("user_id")).cast("long").as("n_exact"))
      def rung(m: Int, alphaPpm: Long) =
        hx.groupBy(expr(s"h % $m").as("bucket"))
          .agg(max(col("rho")).as("max_rho"))
          .agg(sum(expr(
            "CAST(shiftleft(1L, CAST(60 - max_rho AS INT)) AS DECIMAL(38,0))"))
            .as("s_occ"), count(lit(1)).as("n_occ"))
          .select(lit(m.toLong).as("m"),
            expr(s"CAST($m - n_occ AS BIGINT)").as("n_empty"),
            expr(s"""CAST(CAST($alphaPpm AS DECIMAL(38,0)) * ${m.toLong * m}
                    | * 1152921504606846976
                    | DIV ((s_occ + ($m - n_occ)
                    |       * CAST(1152921504606846976 AS DECIMAL(38,0)))
                    |      * 1000000) AS BIGINT)""".stripMargin)
              .as("hll_raw_est"))
      rung(16, 673000L).unionByName(rung(64, 709000L))
        .unionByName(rung(256, 718274L))
        .crossJoin(broadcast(exact))
        .withColumn("err_ppm",
          expr("CAST(abs(hll_raw_est - n_exact) * 1000000 DIV n_exact AS BIGINT)"))
        .orderBy("m")
    },

    // Bigram-level novelty scoring — the sequence-level sibling of
    // q77's token-rarity gate: a document whose word PAIRS are unseen
    // elsewhere is novel composition even when every word is common
    // (q77 cannot see this; verbatim-remix spam is its blind spot).
    // Per doc: share of its distinct bigrams with corpus df = 1,
    // floor-ppm, histogrammed per source in deciles. Docs under 2
    // tokens have no bigrams and are excluded (documented domain).
    // Scale: one tokenize pass → distinct (doc, bigram) → df agg
    // (map-combined, fixed-width keys after the first shuffle) →
    // join back → per-doc agg → ≤|sources|×11 grid. The df join is
    // the one real shuffle; everything after lives on grids.
    "q185_bigram_novelty" -> { (s, d) =>
      val bg = Tables.documents(s, d)
        .withColumn("t", TextAnalysis.tokens(col("text")))
        .filter(size(col("t")) >= 2)
        .select(col("source"), col("doc_id"),
          explode(array_distinct(TextAnalysis.shingleExpr("t", 2))).as("bg"))
      val df = bg.groupBy("bg").agg(count(lit(1)).as("bg_df"))
      bg.join(df, "bg")
        .groupBy("source", "doc_id")
        .agg(count(lit(1)).as("n_bg"),
          sum(when(col("bg_df") === 1, 1L).otherwise(0L)).as("n_rare"))
        .withColumn("novelty_ppm", expr("n_rare * 1000000 DIV n_bg"))
        .groupBy(col("source"),
          expr("CAST(novelty_ppm DIV 100000 AS BIGINT)").as("decile"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .orderBy("source", "decile")
    },

    // Iterative proportional fitting (IPF / raking) of the
    // lang × source document matrix toward UNIFORM marginals — the
    // survey-weighting primitive a training-mix designer uses to
    // rebalance a corpus along two axes at once (per-axis quotas like
    // q64/q108 cannot hit both simultaneously). TWO row/column scaling
    // passes, statically unrolled — NO driver loop: the whole
    // computation is one declarative plan over the |langs|×|sources|
    // grid, so it scales with the grid, not the corpus. All arithmetic
    // is fixed-point µdoc/ppm floor division, the per-cell products
    // widened to DECIMAL(38,0)/HUGEINT (magnitude rule: weight ×
    // ppm-factor is ~10¹⁸ at 10⁶-doc cells). Residual row/col marginal
    // deviation is emitted per cell — the convergence the two passes
    // bought, measured not assumed.
    "q191_ipf_raking" -> { (s, d) =>
      val wLang = Window.partitionBy("lang")
      val wSrc = Window.partitionBy("source")
      val grid = Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val tot = grid.agg(sum(col("n")).cast("long").as("t"),
        countDistinct(col("lang")).cast("long").as("nl"),
        countDistinct(col("source")).cast("long").as("ns"))
      def rescale(df: DataFrame, overW: org.apache.spark.sql.expressions.WindowSpec,
                  target: String): DataFrame =
        df.withColumn("gs", sum(col("w")).over(overW))
          .withColumn("w", expr(
            s"CAST(CAST(w AS DECIMAL(38,0)) * ($target * 1000000 DIV gs) DIV 1000000 AS BIGINT)"))
          .drop("gs")
      val base = grid.crossJoin(broadcast(tot))
        .withColumn("t_r", expr("t * 1000000 DIV nl"))
        .withColumn("t_c", expr("t * 1000000 DIV ns"))
        .withColumn("w", expr("n * 1000000"))
      val fitted = Seq(
        (wLang, "t_r"), (wSrc, "t_c"), (wLang, "t_r"), (wSrc, "t_c"))
        .foldLeft(base) { case (df, (win, tgt)) => rescale(df, win, tgt) }
      fitted
        .withColumn("rs_f", sum(col("w")).over(wLang))
        .withColumn("cs_f", sum(col("w")).over(wSrc))
        .select(col("lang"), col("source"),
          col("n").cast("long").as("n_docs"),
          col("w").as("weight_u"),
          expr("CAST(abs(CAST(rs_f AS DECIMAL(38,0)) - t_r) * 1000000 DIV t_r AS BIGINT)")
            .as("row_dev_ppm"),
          expr("CAST(abs(CAST(cs_f AS DECIMAL(38,0)) - t_c) * 1000000 DIV t_c AS BIGINT)")
            .as("col_dev_ppm"))
        .orderBy("lang", "source")
    },

    // Frequent 3-ITEMSETS per order basket — one level past q99's pair
    // mining, because the blow-up management is a different story:
    // pair fan-out is basket²/2 per order but triple fan-out is
    // basket³/6, so the mega-basket guard (drop baskets past a bound —
    // the df-cap analog; TPC-H baskets are ≤ 7 lines so the bound is
    // moot here but the op carries it) is what keeps the 100 TB plan
    // alive. Canonical ordering p_a < p_b < p_c makes each set count
    // once; the three-way self-join shares ONE orderkey shuffle
    // (co-partitioned by the join key after the first exchange).
    "q194_basket_triples" -> { (s, d) =>
      val MaxBasket = 32
      // Round-12 shape (guide §2.4): the basket cap means every basket
      // is a ≤32-item SET, so the canonical p_a < p_b < p_c triples are
      // generated IN-ROW from the sorted per-order part set — collect_set
      // absorbs duplicate (okey, part) lines, so the old distinct pass,
      // the basket-size join, the eager 4-branch persist and the
      // three-way self-join all collapse into ONE okey exchange followed
      // by a bounded C(32,3) in-row expansion. Same canonical ordering,
      // same per-basket once-counting; PipelineSpec replays the triple
      // census from first principles.
      val baskets = Caches.shared(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
        .groupBy("okey").agg(sort_array(collect_set(col("part"))).as("ps"))
        .filter(size(col("ps")) <= MaxBasket))
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
      baskets
        .select(explode(expr(
          "flatten(flatten(transform(ps, (a, i) ->" +
            " transform(slice(ps, i + 2, size(ps)), (b, j) ->" +
            " transform(slice(ps, i + j + 3, size(ps)), c ->" +
            " struct(a AS p_a, b AS p_b, c AS p_c))))))")).as("t"))
        .groupBy(col("t.p_a").as("p_a"), col("t.p_b").as("p_b"),
          col("t.p_c").as("p_c"))
        .agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(nOrders))
        .orderBy(col("support").desc, col("p_a"), col("p_b"), col("p_c"))
        .limit(20)
        .select(col("p_a").cast("long").as("p_a"),
          col("p_b").cast("long").as("p_b"),
          col("p_c").cast("long").as("p_c"),
          col("support").cast("long").as("support"),
          expr("CAST(support * 1000000 DIV n_orders AS BIGINT)").as("supp_ppm"))
    },

    // Zipf rank×frequency audit over the corpus vocabulary — the
    // LOG-FREE power-law diagnostic: Zipf's law predicts r·f ≈ C for
    // the head of a natural-language vocabulary, so the product's
    // drift across ranks is the "is this corpus natural text or
    // generated/boilerplate spam" screen (a flat r·f curve ⇒ Zipfian;
    // machine-generated corpora bend it) — WITHOUT the log-log
    // regression that would demand cross-engine ln(). Top-50 ranks by
    // (count desc, token) — a total order, so the rank is
    // deterministic; it is computed as a predecessor-count self-join
    // over the 50-row grid, NOT a window (the repo's no-unpartitioned-
    // window rule admits no global window even on a bounded frame).
    // Deviation is floor-ppm vs the rank-1 product. Scale: one
    // token-count agg (map-combined, the q31 subtree family); the
    // limit is a TakeOrdered over the VOCABULARY (bounded), never the
    // corpus; everything after lives on the 50-row grid.
    "q201_zipf_audit" -> { (s, d) =>
      val top = Caches.shared(Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("tok")).limit(50))
      val counts = top.as("a")
        .join(top.as("b"),
          col("b.f") > col("a.f") ||
            (col("b.f") === col("a.f") && col("b.tok") < col("a.tok")),
          "left")
        .groupBy(col("a.tok").as("tok"), col("a.f").as("f"))
        .agg((count(col("b.tok")) + 1).as("r"))
      val c1 = counts.filter(col("r") === 1)
        .select((col("r") * col("f")).as("c_head"))
      counts.crossJoin(broadcast(c1))
        .select(col("r").cast("long").as("r"), col("tok"),
          col("f").cast("long").as("f"),
          (col("r") * col("f")).cast("long").as("rf"),
          expr("CAST(abs(r * f - c_head) * 1000000 DIV c_head AS BIGINT)")
            .as("dev_ppm"))
        .orderBy("r")
    },

    // Cross-LINGUAL contamination detection — the lang-pair matrix of
    // documents sharing a NORMALIZED fingerprint (q182's rule: strip
    // non-alphanumerics, collapse spaces) across different language
    // labels. A hit means either a mislabeled language or the same
    // content duplicated across language shards — both are training-mix
    // poison that per-language dedup passes structurally cannot see.
    // The output is the FULL lang-pair grid with explicit zeros — "no
    // contamination between (a, b)" is a checked fact a monitoring
    // consumer relies on, not an absent row (the q158 empty-bin rule).
    // Scale: fingerprints group map-side; only fingerprints spanning
    // ≥ 2 langs survive the first agg (rare by construction), so the
    // pair explosion runs on a tiny frame; the grid is |langs|².
    "q202_crosslingual_dups" -> { (s, d) =>
      val fp = Tables.documents(s, d)
        .select(col("lang"),
          md5(trim(regexp_replace(
            regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), " +", " ")))
            .as("h"))
        .groupBy("h", "lang").agg(count(lit(1)).as("n"))
      val spanning = fp.groupBy("h")
        .agg(countDistinct(col("lang")).as("nl"))
        .filter(col("nl") >= 2).select("h")
      val hits = fp.join(spanning, "h")
      val found = hits.as("a")
        .join(hits.as("b"),
          col("a.h") === col("b.h") && col("a.lang") < col("b.lang"))
        .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
        .agg(countDistinct(col("a.h")).as("n_shared_fps"),
          sum(col("a.n") + col("b.n")).as("n_docs_involved"))
      val langs = Tables.documents(s, d).select("lang").distinct()
      langs.as("x").join(langs.as("y"), col("x.lang") < col("y.lang"))
        .select(col("x.lang").as("lang_a"), col("y.lang").as("lang_b"))
        .join(found, Seq("lang_a", "lang_b"), "left")
        .select(col("lang_a"), col("lang_b"),
          coalesce(col("n_shared_fps"), lit(0L)).cast("long").as("n_shared_fps"),
          coalesce(col("n_docs_involved"), lit(0L)).cast("long")
            .as("n_docs_involved"))
        .orderBy("lang_a", "lang_b")
    },

    // HLL PAIRWISE MERGE — the property that justifies keeping q133's
    // registers at all: two sources' sketches union by slot-wise MAX
    // with ZERO data re-reads (the distributed-sketch contract — per-
    // shard registers merge associatively, so a 100 TB corpus unions
    // source cardinalities from 64-row register tables, never raw
    // text). Per source pair: union estimate from the merged registers
    // (q184's exact estimator arithmetic, one definition of the
    // α₆₄·m²/Σ2^(−ρ) fixed-point form), the EXACT union distinct for
    // the error audit, and the inclusion-exclusion intersection
    // estimate est_a + est_b − est_union (signed — small/disjoint
    // pairs legitimately go negative; that instability IS the
    // documented reason theta/KMV sketches exist, measured here
    // against the exact intersection). Scale: registers are
    // |sources|×64 rows; every join below is grid-sized; the only
    // data-volume pass is the one md5 scan shared with q133/q184.
    "q423_hll_pair_union" -> { (s, d) =>
      val hx = Tables.documents(s, d)
        .select(col("source"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"))
        .withColumn("bucket", expr("CAST(h % 64 AS BIGINT)"))
        .withColumn("v", expr("h DIV 64"))
        .withColumn("rho", expr(
          "CAST(CASE WHEN v = 0 THEN 55 ELSE 55 - length(bin(v)) END AS BIGINT)"))
      val reg = Caches.shared(hx.groupBy("source", "bucket")
        .agg(max(col("rho")).as("max_rho")))
      // register-table estimator: E = α₆₄·m² / (Σ_occ 2^(−ρ) + n_empty·1)
      // scaled by 2⁶² exactly as q184 (DECIMAL(38,0) throughout).
      def estimate(r: DataFrame, keys: Seq[String]): DataFrame =
        r.groupBy(keys.map(col): _*)
          .agg(sum(expr(
            "CAST(shiftleft(1L, CAST(62 - max_rho AS INT)) AS DECIMAL(38,0))"))
            .as("s_occ"), count(lit(1)).as("n_occ"))
          .select(keys.map(col) :+
            expr(s"""CAST(CAST($Alpha64Ppm AS DECIMAL(38,0)) * 4096 * 4611686018427387904
                    | DIV ((s_occ + (64 - n_occ) * CAST(4611686018427387904 AS DECIMAL(38,0)))
                    |      * 1000000) AS BIGINT)""".stripMargin).as("est"): _*)
      val srcs = reg.select("source").distinct()
      val pairs = srcs.select(col("source").as("src_a"))
        .join(broadcast(srcs.select(col("source").as("src_b"))),
          col("src_a") < col("src_b"))
      val merged = pairs.join(reg.withColumnRenamed("source", "src_a"), "src_a")
        .select("src_a", "src_b", "bucket", "max_rho")
        .unionByName(pairs.join(reg.withColumnRenamed("source", "src_b"), "src_b")
          .select("src_a", "src_b", "bucket", "max_rho"))
        .groupBy("src_a", "src_b", "bucket").agg(max(col("max_rho")).as("max_rho"))
      val estU = estimate(merged, Seq("src_a", "src_b"))
        .withColumnRenamed("est", "union_est")
      val estS = estimate(reg, Seq("source"))
      // exact legs over distinct text hashes (the same universe the
      // registers sketch): per-source ndv, cross-source intersection.
      val dist = Caches.shared(Tables.documents(s, d)
        .select(col("source"), md5(col("text")).as("hh")).distinct())
      val ndv = dist.groupBy("source").agg(count(lit(1)).as("ndv"))
      val interX = dist.as("x")
        .join(dist.as("y"),
          col("x.hh") === col("y.hh") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("inter_exact"))
      estU
        .join(estS.select(col("source").as("src_a"), col("est").as("est_a")), "src_a")
        .join(estS.select(col("source").as("src_b"), col("est").as("est_b")), "src_b")
        .join(ndv.select(col("source").as("src_a"), col("ndv").as("ndv_a")), "src_a")
        .join(ndv.select(col("source").as("src_b"), col("ndv").as("ndv_b")), "src_b")
        .join(interX, Seq("src_a", "src_b"), "left")
        .withColumn("inter_exact",
          coalesce(col("inter_exact"), lit(0L)).cast("long"))
        .select(col("src_a"), col("src_b"),
          col("union_est"),
          expr("CAST(ndv_a + ndv_b - inter_exact AS BIGINT)").as("union_exact"),
          expr("""CAST(abs(union_est - (ndv_a + ndv_b - inter_exact)) * 1000000
                 | DIV (ndv_a + ndv_b - inter_exact) AS BIGINT)""".stripMargin)
            .as("union_err_ppm"),
          expr("CAST(est_a + est_b - union_est AS BIGINT)").as("inter_est"),
          col("inter_exact"))
        .orderBy("src_a", "src_b")
    }
  )

  def oracle: Map[String, String] = Map(
    "q181_source_cap" ->
      s"""WITH r AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
        |      doc_id) AS rk
        |  FROM documents)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN rk <= $SourceCap THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN rk <= $SourceCap THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS kept_chars,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(CASE WHEN rk <= $SourceCap THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS kept_ppm
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q182_norm_dedup" ->
      """WITH n AS (
        |  SELECT source, md5(text) AS raw_h,
        |    md5(trim(regexp_replace(
        |      regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |      AS norm_h
        |  FROM documents)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT raw_h) AS BIGINT) AS ndv_raw,
        |  CAST(COUNT(DISTINCT norm_h) AS BIGINT) AS ndv_norm,
        |  CAST(COUNT(DISTINCT raw_h) - COUNT(DISTINCT norm_h) AS BIGINT)
        |    AS reformat_dups,
        |  CAST((COUNT(*) - COUNT(DISTINCT norm_h)) * 1000000 // COUNT(*)
        |    AS BIGINT) AS norm_dup_ppm
        |FROM n GROUP BY source ORDER BY source""".stripMargin,

    "q183_kfold_balance" ->
      s"""WITH f AS (
        |  SELECT source, n_chars,
        |    ('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % $KFolds AS fold
        |  FROM documents),
        |bf AS (
        |  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM f GROUP BY fold),
        |ts AS (
        |  SELECT fold, MAX(c) AS max_src_docs FROM (
        |    SELECT fold, source, COUNT(*) AS c FROM f GROUP BY fold, source)
        |  GROUP BY fold),
        |tot AS (SELECT SUM(n_docs) AS t_docs, SUM(sum_chars) AS t_chars FROM bf)
        |SELECT CAST(fold AS BIGINT) AS fold, n_docs, sum_chars,
        |  CAST(n_docs * 1000000 // t_docs AS BIGINT) AS docs_ppm,
        |  CAST(sum_chars * 1000000 // t_chars AS BIGINT) AS chars_ppm,
        |  CAST(max_src_docs * 1000000 // n_docs AS BIGINT) AS top_src_ppm
        |FROM bf JOIN ts USING (fold) CROSS JOIN tot
        |ORDER BY fold""".stripMargin,

    "q184_hll_estimate" ->
      s"""WITH hx AS (
        |  SELECT source,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |b AS (
        |  SELECT source, h % 64 AS bucket,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(h // 64)) END AS rho
        |  FROM hx),
        |reg AS (SELECT source, bucket, MAX(rho) AS max_rho FROM b
        |        GROUP BY source, bucket),
        |allreg AS (
        |  SELECT source, bucket, max_rho FROM reg
        |  UNION ALL
        |  SELECT '__all__' AS source, bucket, MAX(max_rho) AS max_rho
        |  FROM reg GROUP BY bucket),
        |est AS (
        |  SELECT source,
        |    CAST(64 - COUNT(*) AS BIGINT) AS n_empty,
        |    CAST(CAST($Alpha64Ppm AS HUGEINT) * 4096 * 4611686018427387904
        |      // ((SUM(CAST(CAST(1 AS BIGINT) << CAST(62 - max_rho AS INT) AS HUGEINT))
        |          + (64 - COUNT(*)) * CAST(4611686018427387904 AS HUGEINT))
        |         * 1000000) AS BIGINT) AS hll_raw_est
        |  FROM allreg GROUP BY source),
        |ex AS (
        |  SELECT source, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact
        |  FROM documents GROUP BY source
        |  UNION ALL
        |  SELECT '__all__', CAST(COUNT(DISTINCT md5(text)) AS BIGINT)
        |  FROM documents)
        |SELECT source, n_exact, n_empty, hll_raw_est,
        |  CAST(abs(hll_raw_est - n_exact) * 1000000 // n_exact AS BIGINT)
        |    AS err_ppm
        |FROM est JOIN ex USING (source) ORDER BY source""".stripMargin,

    "q465_hll_precision_ladder" -> {
      def rung(m: Int, alphaPpm: Long) =
        s"""SELECT CAST($m AS BIGINT) AS m,
           |  CAST($m - COUNT(*) AS BIGINT) AS n_empty,
           |  CAST(CAST($alphaPpm AS HUGEINT) * ${m.toLong * m}
           |    * 1152921504606846976
           |    // ((SUM(CAST(CAST(1 AS BIGINT) << CAST(60 - max_rho AS INT)
           |            AS HUGEINT))
           |        + ($m - COUNT(*)) * CAST(1152921504606846976 AS HUGEINT))
           |       * 1000000) AS BIGINT) AS hll_raw_est
           |FROM (SELECT h % $m AS bucket, MAX(rho) AS max_rho
           |      FROM hx GROUP BY 1) r$m""".stripMargin
      """WITH hx AS (
        |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h,
        |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT // 256 = 0
        |         THEN 53
        |         ELSE 53 - length(bin(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT // 256))
        |    END AS rho
        |  FROM events),
        |ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |       FROM events),
        |rungs AS (
        |""".stripMargin +
        Seq(rung(16, 673000L), rung(64, 709000L), rung(256, 718274L))
          .mkString("\nUNION ALL\n") + """
        |)
        |SELECT m, n_exact, n_empty, hll_raw_est,
        |  CAST(abs(hll_raw_est - n_exact) * 1000000 // n_exact AS BIGINT)
        |    AS err_ppm
        |FROM rungs CROSS JOIN ex ORDER BY m""".stripMargin
    },

    "q185_bigram_novelty" ->
      """WITH toks AS (
        |  SELECT source, doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT DISTINCT source, doc_id, array_to_string(t[i:i+1], ' ') AS bg
        |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
        |df AS (SELECT bg, COUNT(*) AS bg_df FROM bg GROUP BY bg),
        |per_doc AS (
        |  SELECT source, doc_id,
        |    COUNT(*) AS n_bg,
        |    SUM(CASE WHEN bg_df = 1 THEN 1 ELSE 0 END) AS n_rare
        |  FROM bg JOIN df USING (bg) GROUP BY source, doc_id)
        |SELECT source,
        |  CAST(n_rare * 1000000 // n_bg // 100000 AS BIGINT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM per_doc GROUP BY 1, 2 ORDER BY source, decile""".stripMargin,

    "q191_ipf_raking" ->
      """WITH g AS (
        |  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS t,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
        |  FROM g),
        |w0 AS (
        |  SELECT lang, source, n, t * 1000000 // nl AS t_r,
        |    t * 1000000 // ns AS t_c, n * 1000000 AS w
        |  FROM g CROSS JOIN tot),
        |r1 AS (
        |  SELECT lang, source, n, t_r, t_c,
        |    CAST(CAST(w AS HUGEINT) *
        |      (t_r * 1000000 // SUM(w) OVER (PARTITION BY lang))
        |      // 1000000 AS BIGINT) AS w
        |  FROM w0),
        |c1 AS (
        |  SELECT lang, source, n, t_r, t_c,
        |    CAST(CAST(w AS HUGEINT) *
        |      (t_c * 1000000 // SUM(w) OVER (PARTITION BY source))
        |      // 1000000 AS BIGINT) AS w
        |  FROM r1),
        |r2 AS (
        |  SELECT lang, source, n, t_r, t_c,
        |    CAST(CAST(w AS HUGEINT) *
        |      (t_r * 1000000 // SUM(w) OVER (PARTITION BY lang))
        |      // 1000000 AS BIGINT) AS w
        |  FROM c1),
        |c2 AS (
        |  SELECT lang, source, n, t_r, t_c,
        |    CAST(CAST(w AS HUGEINT) *
        |      (t_c * 1000000 // SUM(w) OVER (PARTITION BY source))
        |      // 1000000 AS BIGINT) AS w
        |  FROM r2)
        |SELECT lang, source, CAST(n AS BIGINT) AS n_docs, w AS weight_u,
        |  CAST(abs(CAST(SUM(w) OVER (PARTITION BY lang) AS HUGEINT) - t_r)
        |    * 1000000 // t_r AS BIGINT) AS row_dev_ppm,
        |  CAST(abs(CAST(SUM(w) OVER (PARTITION BY source) AS HUGEINT) - t_c)
        |    * 1000000 // t_c AS BIGINT) AS col_dev_ppm
        |FROM c2 ORDER BY lang, source""".stripMargin,

    "q194_basket_triples" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
        |  FROM lineitem),
        |bounded AS (
        |  SELECT okey, part FROM items
        |  WHERE okey IN (
        |    SELECT okey FROM items GROUP BY okey HAVING COUNT(*) <= 32)),
        |no AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM bounded),
        |tri AS (
        |  SELECT a.part AS p_a, b.part AS p_b, c.part AS p_c,
        |    COUNT(*) AS support
        |  FROM bounded a
        |  JOIN bounded b ON a.okey = b.okey AND a.part < b.part
        |  JOIN bounded c ON a.okey = c.okey AND b.part < c.part
        |  GROUP BY 1, 2, 3)
        |SELECT CAST(p_a AS BIGINT) AS p_a, CAST(p_b AS BIGINT) AS p_b,
        |  CAST(p_c AS BIGINT) AS p_c, CAST(support AS BIGINT) AS support,
        |  CAST(support * 1000000 // n_orders AS BIGINT) AS supp_ppm
        |FROM tri CROSS JOIN no
        |ORDER BY support DESC, p_a, p_b, p_c LIMIT 20""".stripMargin,

    "q201_zipf_audit" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (
        |  SELECT tok, COUNT(*) AS f FROM toks WHERE len(tok) > 0
        |  GROUP BY tok ORDER BY f DESC, tok LIMIT 50),
        |ranked AS (
        |  SELECT tok, f,
        |    row_number() OVER (ORDER BY f DESC, tok) AS r
        |  FROM cnt),
        |head AS (SELECT r * f AS c_head FROM ranked WHERE r = 1)
        |SELECT CAST(r AS BIGINT) AS r, tok, CAST(f AS BIGINT) AS f,
        |  CAST(r * f AS BIGINT) AS rf,
        |  CAST(abs(r * f - c_head) * 1000000 // c_head AS BIGINT) AS dev_ppm
        |FROM ranked CROSS JOIN head ORDER BY r""".stripMargin,

    "q202_crosslingual_dups" ->
      """WITH fp AS (
        |  SELECT lang,
        |    md5(trim(regexp_replace(
        |      regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |      AS h,
        |    COUNT(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |spanning AS (
        |  SELECT h FROM fp GROUP BY h HAVING COUNT(DISTINCT lang) >= 2),
        |hits AS (SELECT fp.* FROM fp JOIN spanning USING (h)),
        |found AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b,
        |    COUNT(DISTINCT a.h) AS n_shared_fps,
        |    SUM(a.n + b.n) AS n_docs_involved
        |  FROM hits a JOIN hits b ON a.h = b.h AND a.lang < b.lang
        |  GROUP BY 1, 2),
        |langs AS (SELECT DISTINCT lang FROM documents)
        |SELECT x.lang AS lang_a, y.lang AS lang_b,
        |  CAST(COALESCE(n_shared_fps, 0) AS BIGINT) AS n_shared_fps,
        |  CAST(COALESCE(n_docs_involved, 0) AS BIGINT) AS n_docs_involved
        |FROM langs x JOIN langs y ON x.lang < y.lang
        |LEFT JOIN found ON x.lang = found.lang_a AND y.lang = found.lang_b
        |ORDER BY lang_a, lang_b""".stripMargin,

    "q423_hll_pair_union" ->
      s"""WITH hx AS (
        |  SELECT source,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |b AS (
        |  SELECT source, h % 64 AS bucket,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(h // 64)) END AS rho
        |  FROM hx),
        |reg AS (SELECT source, bucket, MAX(rho) AS max_rho FROM b
        |        GROUP BY source, bucket),
        |srcs AS (SELECT DISTINCT source FROM reg),
        |pairs AS (
        |  SELECT x.source AS src_a, y.source AS src_b
        |  FROM srcs x JOIN srcs y ON x.source < y.source),
        |merged AS (
        |  SELECT src_a, src_b, bucket, MAX(max_rho) AS max_rho FROM (
        |    SELECT p.src_a, p.src_b, r.bucket, r.max_rho
        |    FROM pairs p JOIN reg r ON r.source = p.src_a
        |    UNION ALL
        |    SELECT p.src_a, p.src_b, r.bucket, r.max_rho
        |    FROM pairs p JOIN reg r ON r.source = p.src_b)
        |  GROUP BY 1, 2, 3),
        |estu AS (
        |  SELECT src_a, src_b,
        |    CAST(CAST($Alpha64Ppm AS HUGEINT) * 4096 * 4611686018427387904
        |      // ((SUM(CAST(CAST(1 AS BIGINT) << CAST(62 - max_rho AS INT) AS HUGEINT))
        |          + (64 - COUNT(*)) * CAST(4611686018427387904 AS HUGEINT))
        |         * 1000000) AS BIGINT) AS union_est
        |  FROM merged GROUP BY 1, 2),
        |ests AS (
        |  SELECT source,
        |    CAST(CAST($Alpha64Ppm AS HUGEINT) * 4096 * 4611686018427387904
        |      // ((SUM(CAST(CAST(1 AS BIGINT) << CAST(62 - max_rho AS INT) AS HUGEINT))
        |          + (64 - COUNT(*)) * CAST(4611686018427387904 AS HUGEINT))
        |         * 1000000) AS BIGINT) AS est
        |  FROM reg GROUP BY source),
        |dist AS (SELECT DISTINCT source, md5(text) AS hh FROM documents),
        |ndv AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ndv FROM dist GROUP BY 1),
        |interx AS (
        |  SELECT x.source AS src_a, y.source AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS inter_exact
        |  FROM dist x JOIN dist y ON x.hh = y.hh AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT e.src_a, e.src_b, e.union_est,
        |  CAST(na.ndv + nb.ndv - COALESCE(ix.inter_exact, 0) AS BIGINT)
        |    AS union_exact,
        |  CAST(abs(e.union_est - (na.ndv + nb.ndv - COALESCE(ix.inter_exact, 0)))
        |    * 1000000 // (na.ndv + nb.ndv - COALESCE(ix.inter_exact, 0)) AS BIGINT)
        |    AS union_err_ppm,
        |  CAST(ea.est + eb.est - e.union_est AS BIGINT) AS inter_est,
        |  CAST(COALESCE(ix.inter_exact, 0) AS BIGINT) AS inter_exact
        |FROM estu e
        |JOIN ests ea ON ea.source = e.src_a
        |JOIN ests eb ON eb.source = e.src_b
        |JOIN ndv na ON na.source = e.src_a
        |JOIN ndv nb ON nb.source = e.src_b
        |LEFT JOIN interx ix ON ix.src_a = e.src_a AND ix.src_b = e.src_b
        |ORDER BY e.src_a, e.src_b""".stripMargin
  )
}
