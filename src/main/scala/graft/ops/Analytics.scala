package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.model.Tables
import graft.ops.TextAnalysis.tokens

/** Round-6 closing additions (SURVEY.md §2F, F85+) — corpus-allocation and
  * corpus-statistics operators:
  *
  *   - q264: largest-remainder QUOTA apportionment — allocate a fixed eval
  *     budget across sources exactly proportionally (Hamilton's method:
  *     floor quotas + one extra doc to the largest remainders until the
  *     budget is spent). The exact-integer answer to "give me a 10k-doc
  *     eval set with the corpus mix" — per-source ppm quotas (D5b) round
  *     inconsistently and miss the budget by up to |sources| docs;
  *   - q265: ENCODING-RESIDUE screen — replacement-character (U+FFFD) and
  *     C0-control contamination per source, the mojibake audit run before
  *     any tokenizer sees the bytes. Counts via length-difference under
  *     replace/regexp_replace so no engine's regex COUNT dialect is
  *     load-bearing; explicit zeros are measured facts (q158 rule);
  *   - q266: CHAO1 species-richness estimate + Good–Turing unseen-mass per
  *     language — how much vocabulary the corpus has NOT seen yet
  *     (chao1 = V + F1²-ish from the singleton/doubleton counts, in the
  *     bias-corrected F1·(F1−1)/(2·(F2+1)) form that is exact-integer and
  *     division-safe) and the probability the next token is novel
  *     (GT mass = F1/N). The open-vocabulary companion of q213's Heaps
  *     screen: Heaps says HOW growth scales, Chao1 says WHERE it plateaus.
  *
  * Scale notes (100 TB): q264's heavy work is ONE map-combined per-source
  * count; everything after (quota arithmetic, the remainder rank via a
  * predecessor-count self-join — the q201/q216 rank rule, never a global
  * window) lives on the broadcast |sources| grid. q265 is a single scan
  * with per-row map arithmetic collapsing onto the |sources| grid. q266's
  * token counts collapse onto the (lang, type) vocabulary grid map-side;
  * the F1/F2 reduction is a second map-combined agg onto |langs| rows.
  * Magnitude rule: q264's B·n stays < 10¹⁷ for B=10⁴ up to 10¹³ docs;
  * q266's F1·(F1−1) crosses int64 near F1 ≈ 3·10⁹ singleton types, so the
  * product is widened DECIMAL(38,0)/HUGEINT from the start.
  */
object Analytics {

  /** q264 eval-set budget (docs). ONE definition interpolated into both
    * engines' SQL so the Spark leg and the oracle can never drift. */
  private[graft] val EvalBudget = 10000L

  /** Characters the q265 control screen counts: C0 minus tab/LF/CR. Java
    * and RE2 both read this class byte-for-byte the same. */
  private val CtrlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  /** q269 position-discount table: wᵢ = round(10⁶/log₂(i+1)) for ranks
    * 1..10, precomputed ONCE as ppm integer constants so neither engine
    * evaluates a transcendental at query time (the repo-wide log-free
    * rule) — interpolated into both engines' SQL from this one list. */
  private[graft] val NdcgW: Seq[Long] =
    Seq(1000000L, 630930L, 500000L, 430677L, 386853L, 356207L, 333333L,
      315465L, 301030L, 289065L)

  /** q294 grid order (16×16 cells, 4 bits per axis). */
  private[graft] val CurveN = 16

  /** Hilbert curve position of cell (x, y) on the [[CurveN]]² grid —
    * the standard xy2d rotation walk, evaluated ONCE in Scala and
    * interpolated into both engines' SQL as a 256-entry lookup array
    * (the curve is a constant of the operator, not data). */
  private[graft] def hilbertD(x0: Int, y0: Int): Int = {
    var x = x0; var y = y0; var d = 0; var s = CurveN / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Z-order (Morton) position of cell (x, y): interleaved bits. */
  private[graft] def mortonD(x: Int, y: Int): Int =
    (0 until 4).map(b => (((x >> b) & 1) << (2 * b + 1)) | (((y >> b) & 1) << (2 * b))).sum

  /** The two 256-entry curve lookups in cell = x·16+y order. */
  private[graft] lazy val HilbertTable: Seq[Int] =
    for (x <- 0 until CurveN; y <- 0 until CurveN) yield hilbertD(x, y)
  private[graft] lazy val MortonTable: Seq[Int] =
    for (x <- 0 until CurveN; y <- 0 until CurveN) yield mortonD(x, y)

  /** The q289 classical-decomposition CTE chain (events → zero-filled
    * day grid → centered 7-day trend → weekday seasonal → residual),
    * shared verbatim by q289's oracle and q492's anomaly layer so the
    * decomposition has ONE definition DuckDB-side. Ends in `dec`
    * (event_type, di, c, trend_u, seasonal_u, resid_u). */
  private[graft] val DecompChainSql: String =
    """ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |daily AS (SELECT event_type, day, COUNT(*) AS c0 FROM ev GROUP BY 1, 2),
      |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev),
      |days AS (SELECT CAST(g.d AS DATE) AS day, b.mn, b.mx
      |         FROM b, UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) g(d)),
      |ty AS (SELECT DISTINCT event_type FROM ev),
      |cells AS (
      |  SELECT t.event_type, date_diff('day', dy.mn, dy.day) AS di,
      |    date_diff('day', dy.mn, dy.mx) AS ndm1, COALESCE(d2.c0, 0) AS c
      |  FROM days dy CROSS JOIN ty t
      |  LEFT JOIN daily d2 ON d2.event_type = t.event_type AND d2.day = dy.day),
      |tr AS (
      |  SELECT event_type, di, c, ndm1,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY di
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wsum
      |  FROM cells),
      |trended AS (
      |  SELECT event_type, di, c,
      |    CAST(wsum * 1000000 // 7 AS BIGINT) AS trend_u,
      |    c * 1000000 - CAST(wsum * 1000000 // 7 AS BIGINT) AS det_u,
      |    di % 7 AS phase
      |  FROM tr WHERE di >= 3 AND di <= ndm1 - 3),
      |seas AS (
      |  SELECT event_type, phase,
      |    CAST(FLOOR(CAST(SUM(det_u) AS DOUBLE) / COUNT(*)) AS BIGINT)
      |      AS seasonal_u
      |  FROM trended GROUP BY 1, 2),
      |dec AS (
      |  SELECT t.event_type, t.di, t.c, t.trend_u, s.seasonal_u,
      |    CAST(t.det_u - s.seasonal_u AS BIGINT) AS resid_u
      |  FROM trended t JOIN seas s USING (event_type, phase))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DOMINANT-RESOURCE-FAIRNESS allocation (Ghodsi et al., NSDI'11 —
    // the YARN/Mesos/K8s multi-tenant scheduler invariant) over the
    // corpus read as a two-resource tenancy: each source demands
    // (chars, docs) against the pooled capacities; DRF equalizes every
    // tenant's DOMINANT share (q264 apportions ONE resource by count —
    // this is the two-resource generalization where a tenant of many
    // short docs is doc-bound while a long-doc tenant is char-bound).
    // Closed form, no iteration: tenant i's dominant mass m_i =
    // max(chars_i·C_docs, docs_i·C_chars) (cross-multiplied — exact,
    // no floor in the comparison); per unit of common dominant share α
    // it consumes CEIL(d_ir·K / m_i) of resource r (K = C_chars·C_docs;
    // the per-term CEILING makes the consumption estimate conservative,
    // so the floored α can never over-fill a capacity — a floored
    // estimate measurably over-allocated the binding resource by
    // ~0.06%, the law the spec enforces); α_ppm = min_r C_r·10⁶ DIV
    // Σ_i cons_ir, and the admitted fraction x_i = α·K/m_i (floor —
    // under-admission is safe). Products reach ~10²⁵ —
    // DECIMAL(38,0) throughout, HUGEINT mirror. Output: per source the
    // demand, dominant resource, dominant-share ppm, and drf_ppm (the
    // admitted fraction; >10⁶ means the fair share exceeds the
    // tenant's own demand). Scale: one (source)-grid agg + scalar
    // algebra; nothing row-wise survives the groupBy.
    "q483_drf_allocation" -> { (s, d) =>
      val c = Tables.documents(s, d).groupBy("source")
        .agg(sum(col("n_chars")).as("chars"), count(lit(1)).as("docs"))
      val t = c.agg(sum(col("chars")).as("cc"), sum(col("docs")).as("cd"))
      val g = c.crossJoin(broadcast(t))
        .withColumn("mi", expr("GREATEST(CAST(chars AS DECIMAL(38,0)) * cd," +
          " CAST(docs AS DECIMAL(38,0)) * cc)"))
        .withColumn("cons_chars",
          expr("(CAST(chars AS DECIMAL(38,0)) * cc * cd + mi - 1) div mi"))
        .withColumn("cons_docs",
          expr("(CAST(docs AS DECIMAL(38,0)) * cc * cd + mi - 1) div mi"))
      val alpha = g.agg(
          sum(expr("CAST(cons_chars AS DECIMAL(38,0))")).as("tot_chars"),
          sum(expr("CAST(cons_docs AS DECIMAL(38,0))")).as("tot_docs"),
          max(col("cc")).as("cc2"), max(col("cd")).as("cd2"))
        .select(expr("LEAST(" +
          "(CAST(cc2 AS DECIMAL(38,0)) * 1000000) div tot_chars," +
          "(CAST(cd2 AS DECIMAL(38,0)) * 1000000) div tot_docs)")
          .as("alpha_ppm"))
      g.crossJoin(broadcast(alpha))
        .select(col("source"), col("chars").cast("long").as("chars"),
          col("docs").cast("long").as("docs"),
          expr("CASE WHEN CAST(chars AS DECIMAL(38,0)) * cd >=" +
            " CAST(docs AS DECIMAL(38,0)) * cc THEN 'chars' ELSE 'docs' END")
            .as("dominant"),
          expr("CAST((mi * 1000000) div (CAST(cc AS DECIMAL(38,0)) * cd)" +
            " AS BIGINT)").as("domshare_ppm"),
          expr("CAST((alpha_ppm * cc * cd) div mi AS BIGINT)").as("drf_ppm"))
        .orderBy("source")
    },
    // Largest-remainder apportionment. floor_i = B·n_i DIV N always
    // under-spends; the shortfall k = B − Σfloor_i (< |sources|) goes one
    // doc each to the k largest remainders, ties broken by source name so
    // the allocation is a pure function of the counts. Spec-asserted:
    // Σalloc = B exactly and every source is within 1 doc of its ideal
    // B·n_i/N — the two invariants that define Hamilton's method.
    "q264_quota_apportionment" -> { (s, d) =>
      val c = Tables.documents(s, d).groupBy("source").agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).as("nt"))
      val q = c.crossJoin(broadcast(t)).select(col("source"), col("n"),
        expr(s"CAST($EvalBudget * n DIV nt AS BIGINT)").as("floor_alloc"),
        expr(s"CAST($EvalBudget * n % nt AS BIGINT)").as("rem_num"))
      val k = q.agg((lit(EvalBudget) - sum(col("floor_alloc"))).as("k"))
      // remainder rank = predecessor count on the broadcast grid
      val b = q.select(col("source").as("bs"), col("rem_num").as("br"))
      val rnk = q.join(broadcast(b),
          col("br") > col("rem_num") ||
            (col("br") === col("rem_num") && col("bs") < col("source")), "left")
        .groupBy("source", "n", "floor_alloc", "rem_num")
        .agg(count(col("bs")).as("rnk"))
      rnk.crossJoin(broadcast(k))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          col("floor_alloc"), col("rem_num"),
          (col("floor_alloc") +
            when(col("rnk") < col("k"), lit(1L)).otherwise(lit(0L)))
            .cast("long").as("alloc"))
        .orderBy("source")
    },

    // Encoding-residue screen. Occurrence counts are LENGTH DIFFERENCES
    // under replace (U+FFFD) / regexp_replace (C0 class) — both engines
    // count Unicode code points in length(), so the arithmetic is
    // engine-neutral without relying on any regex-count function. The
    // clean fixture yields all-zero rows per source: "no mojibake" is a
    // checked fact, not an absent row (q158 rule); the spec proves the
    // detectors actually fire on injected contamination.
    "q265_encoding_residue" -> { (s, d) =>
      val perDoc = Tables.documents(s, d).select(col("source"),
        length(col("text")).as("nc"),
        (length(col("text")) -
          length(expr("replace(text, '�', '')"))).as("n_repl"),
        (length(col("text")) -
          length(regexp_replace(col("text"), lit(CtrlClass), lit("")))).as("n_ctrl"))
      perDoc.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("nc")).as("n_chars"),
          sum(when(col("n_repl") > 0, 1L).otherwise(0L)).as("docs_repl"),
          sum(when(col("n_ctrl") > 0, 1L).otherwise(0L)).as("docs_ctrl"),
          sum(col("n_repl")).as("repl_chars"),
          sum(col("n_ctrl")).as("ctrl_chars"))
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          col("n_chars").cast("long").as("n_chars"),
          col("docs_repl").cast("long").as("docs_repl"),
          col("docs_ctrl").cast("long").as("docs_ctrl"),
          col("repl_chars").cast("long").as("repl_chars"),
          col("ctrl_chars").cast("long").as("ctrl_chars"),
          expr("CAST(repl_chars * 1000000 DIV n_chars AS BIGINT)").as("repl_ppm"),
          expr("CAST(ctrl_chars * 1000000 DIV n_chars AS BIGINT)").as("ctrl_ppm"))
        .orderBy("source")
    },

    // Chao1 richness + Good–Turing unseen mass. The vocabulary agg is the
    // only corpus-sized reduction; F1/F2/V/N are four map-combined sums
    // over the (lang, type) grid. chao1 uses the bias-corrected form
    // V + F1(F1−1)/(2(F2+1)) — defined even when no doubletons exist, and
    // a pure integer floor-DIV both engines mirror. gt_unseen_ppm = F1/N
    // is the Good–Turing estimate of P(next token is a NEW type) — the
    // number a tokenizer-budget decision (F32/q211) reads next.
    "q266_chao1_richness" -> { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
      tf.groupBy("lang").agg(
          count(lit(1)).as("v_types"),
          sum(col("f")).as("n_tokens"),
          sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"))
        .select(col("lang"), col("v_types").cast("long").as("v_types"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("f1").cast("long").as("f1"), col("f2").cast("long").as("f2"),
          expr("CAST(v_types + CAST(f1 AS DECIMAL(38,0)) * (f1 - 1)" +
            " DIV (2 * (f2 + 1)) AS BIGINT)").as("chao1_est"),
          expr("CAST(f1 * 1000000 DIV n_tokens AS BIGINT)").as("gt_unseen_ppm"))
        .orderBy("lang")
    },

    // Two-feature OLS by Cramér's rule on the CENTERED normal equations —
    // price (whole dollars) ~ quantity + discount-pct over lineitem. The
    // five sufficient statistics are exact integers from quantized
    // columns (the q134 single-feature trend generalized to two
    // regressors — which needs the 2×2 determinant, i.e. the first
    // genuinely multivariate fit); the ONLY floating point is the final
    // mirrored IEEE arithmetic assembling b1/b2 from already-BIGINT
    // S-values (int64→double is correctly rounded in both engines and
    // the expression tree is written identically — the q207 rule, since
    // floor-DIV diverges across engines on negative numerators).
    // Magnitude rule: S1y = n·Σx1y − Σx1·Σy reaches ~2·10¹⁸ at sf0.1
    // already, so every S assembles in DECIMAL(38,0)/HUGEINT and only
    // then casts down; past ~10⁷ rows the S-values themselves stay
    // DECIMAL — and at 100 TB the fit would run per-stratum (the
    // statistics are sum-mergeable, the point of the centered form).
    "q267_ols_two_feature" -> { (s, d) =>
      val q = Tables.lineitem(s, d).select(
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " DIV 100").as("y"),
        expr("CAST(l_quantity AS BIGINT)").as("x1"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)").as("x2"))
      q.agg(count(lit(1)).as("n"), sum(col("x1")).as("sx1"),
          sum(col("x2")).as("sx2"), sum(col("y")).as("sy"),
          sum(expr("x1 * x1")).as("sx11"), sum(expr("x1 * x2")).as("sx12"),
          sum(expr("x2 * x2")).as("sx22"), sum(expr("x1 * y")).as("sx1y"),
          sum(expr("x2 * y")).as("sx2y"))
        .select(col("n").cast("long").as("n"),
          expr("CAST(n * CAST(sx11 AS DECIMAL(38,0)) - CAST(sx1 AS DECIMAL(38,0)) * sx1 AS BIGINT)").as("s11"),
          expr("CAST(n * CAST(sx12 AS DECIMAL(38,0)) - CAST(sx1 AS DECIMAL(38,0)) * sx2 AS BIGINT)").as("s12"),
          expr("CAST(n * CAST(sx22 AS DECIMAL(38,0)) - CAST(sx2 AS DECIMAL(38,0)) * sx2 AS BIGINT)").as("s22"),
          expr("CAST(n * CAST(sx1y AS DECIMAL(38,0)) - CAST(sx1 AS DECIMAL(38,0)) * sy AS BIGINT)").as("s1y"),
          expr("CAST(n * CAST(sx2y AS DECIMAL(38,0)) - CAST(sx2 AS DECIMAL(38,0)) * sy AS BIGINT)").as("s2y"))
        .select(col("n"), col("s11"), col("s12"), col("s22"), col("s1y"), col("s2y"),
          expr("(CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) -" +
            " CAST(s2y AS DOUBLE) * CAST(s12 AS DOUBLE)) /" +
            " (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) -" +
            " CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))").as("b1"),
          expr("(CAST(s2y AS DOUBLE) * CAST(s11 AS DOUBLE) -" +
            " CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE)) /" +
            " (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) -" +
            " CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))").as("b2"))
    },

    // Hellinger/Bhattacharyya AFFINITY between each source's language
    // distribution and the corpus — BC = Σ√(p·q) scores how SIMILAR two
    // distributions are where TVD (E32) scores how far apart: BC weights
    // agreement on the SHARED mass geometrically, so a source missing a
    // language entirely pays full price on that term (√0 = 0) no matter
    // how the rest lines up. Shares are exact floor-ppm integers; each
    // √(p·q) is floor(sqrt) of an integer ≤ 10¹² — exactly representable
    // in a double, and IEEE sqrt is correctly rounded, so the floor is
    // the EXACT integer square root in both engines (no rounding-mode
    // drift is possible: √(k²−1) sits ~5·10⁻⁷ below k, 3 orders beyond
    // the half-ULP at 10⁶). h2_micro = 10⁶ − BC is the squared Hellinger
    // distance in µ-units.
    "q268_hellinger_affinity" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val sl = docs.groupBy("source", "lang").agg(count(lit(1)).as("nsl"))
      val sTot = sl.groupBy("source").agg(sum(col("nsl")).as("ns"))
      val gl = docs.groupBy("lang").agg(count(lit(1)).as("nl"))
      val n = docs.agg(count(lit(1)).as("nt"))
      val terms = sl.join(sTot, "source")
        .join(broadcast(gl.crossJoin(broadcast(n))), "lang")
        .select(col("source"),
          expr("nsl * 1000000 DIV ns").as("p_ppm"),
          expr("nl * 1000000 DIV nt").as("q_ppm"))
      terms.groupBy("source")
        .agg(sum(expr("CAST(FLOOR(SQRT(CAST(p_ppm * q_ppm AS DOUBLE))) AS BIGINT)"))
          .as("bc_micro"))
        .select(col("source"), col("bc_micro").cast("long").as("bc_micro"),
          (lit(1000000L) - col("bc_micro")).cast("long").as("h2_micro"))
        .orderBy("source")
    },

    // nDCG@10 retrieval evaluation per language — the GRADED-relevance
    // ranking metric next to q180's recall@k (binary) and q116's RRF
    // (fusion): position discounts wᵢ = 10⁶/log₂(i+1) come from the
    // precomputed [[NdcgW]] ppm table, so the whole metric is exact
    // integer arithmetic at query time. Ranking = longest-document-first
    // (the length prior, deterministic doc_id tiebreak); graded gold
    // rel ∈ {0..3} from the engine-neutral hash — the fixture's
    // deterministic stand-in for human judgments (the q180 convention).
    // IDCG re-ranks the SAME 10 rows by rel desc, so ndcg_ppm = 10⁶ iff
    // the length prior happens to order by relevance. Both windows are
    // per-LANG partitions; everything after the top-10 cut is a
    // 10·|langs|-row grid.
    "q269_ndcg_at_10" -> { (s, d) =>
      val w = Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
      val top = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .withColumn("rel", Dedup.neutralHash32(col("doc_id").cast("string")) % 4)
      val wi = Window.partitionBy("lang").orderBy(col("rel").desc, col("doc_id"))
      val both = top.withColumn("irnk", row_number().over(wi))
      val disc = NdcgW.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN ${v}L" }
        .mkString("CASE %s ", " ", " END")
      val scored = both.select(col("lang"),
        (col("rel") * expr(disc.format("rnk"))).as("dg"),
        (col("rel") * expr(disc.format("irnk"))).as("ig"))
      scored.groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_rated"),
          sum(col("dg")).cast("long").as("dcg_micro"),
          sum(col("ig")).cast("long").as("idcg_micro"))
        .withColumn("ndcg_ppm",
          expr("CASE WHEN idcg_micro > 0 THEN" +
            " CAST(dcg_micro * 1000000 DIV idcg_micro AS BIGINT)" +
            " ELSE CAST(1000000 AS BIGINT) END"))
        .orderBy("lang")
    },

    // Column-ENCODING advisor — the write-path statistics a parquet/ORC
    // writer's encoding chooser reads (next to F33/q212's row-group
    // packer and E31/q141's sort-order audit): per source, how RLE-able
    // the lang column is in doc_id storage order. n_runs counts value
    // CHANGES via per-source lag() (first row opens a run); dict_bits is
    // the ceil-log2 dictionary width from a 0..31 broadcast bit ladder —
    // log-free, the q222 power-of-two convention. rle_ratio_ppm =
    // runs/rows is the decision number: ≪ 10⁶ → RLE wins, ≈ 10⁶ →
    // dictionary-plain.
    "q270_encoding_advisor" -> { (s, d) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
      val runs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("lang"))
        .withColumn("chg",
          when(lag(col("lang"), 1).over(w).isNull ||
            lag(col("lang"), 1).over(w) =!= col("lang"), 1L).otherwise(0L))
      val g = runs.groupBy("source").agg(
        count(lit(1)).as("n_rows"), sum(col("chg")).as("n_runs"),
        countDistinct(col("lang")).as("ndv"),
        sum(length(col("lang"))).as("plain_chars"))
      val bits = g.sparkSession.range(0, 32).select(col("id").cast("long").as("b"))
      g.join(broadcast(bits), expr("shiftleft(1L, CAST(b AS INT)) >= ndv"))
        .groupBy("source", "n_rows", "n_runs", "ndv", "plain_chars")
        .agg(min(col("b")).as("dict_bits"))
        .select(col("source"), col("n_rows").cast("long").as("n_rows"),
          col("n_runs").cast("long").as("n_runs"),
          col("ndv").cast("long").as("ndv"),
          col("plain_chars").cast("long").as("plain_chars"),
          col("dict_bits").cast("long").as("dict_bits"),
          expr("CAST(n_runs * 1000000 DIV n_rows AS BIGINT)").as("rle_ratio_ppm"))
        .orderBy("source")
    },

    // Capture-recapture (CHAPMAN) vocabulary estimate — the mark-recapture
    // population estimator applied to the type inventory: how many DISTINCT
    // token types does the corpus hold, estimated from two disjoint
    // "captures" (the vocabularies of the even/odd doc_id halves) —
    // N̂ = (nA+1)(nB+1)/(m+1) − 1, exact integer DIV. A type "recaptured"
    // in both halves marks how thoroughly each half samples the
    // vocabulary; two SHARD manifests estimate global vocabulary with no
    // cross-shard join — the third vocabulary-size instrument next to
    // q213 (Heaps: how growth SCALES) and q266 (Chao1: where it
    // plateaus), with a different blind spot (capture heterogeneity vs
    // singleton mass). The exact leg is the deliberate small-SF
    // calibration audit (the q184-HLL convention).
    "q271_capture_recapture" -> { (s, d) =>
      val fp = Tables.documents(s, d).select(
        (col("doc_id") % 2 === 0).as("even"),
        explode(tokens(col("text"))).as("fp"))
      val caps = fp.groupBy("fp").agg(
        max(when(col("even"), 1L).otherwise(0L)).as("in_a"),
        max(when(!col("even"), 1L).otherwise(0L)).as("in_b"))
      caps.agg(
          sum(col("in_a")).as("n_a"), sum(col("in_b")).as("n_b"),
          sum(col("in_a") * col("in_b")).as("m_both"),
          count(lit(1)).as("exact_v"))
        .select(col("n_a").cast("long").as("n_a"),
          col("n_b").cast("long").as("n_b"),
          col("m_both").cast("long").as("m_both"),
          // (nA+1)(nB+1) crosses int64 near 3·10⁹ distinct per capture —
          // widened DECIMAL(38,0)/HUGEINT per the magnitude rule
          expr("CAST(CAST(n_a + 1 AS DECIMAL(38,0)) * (n_b + 1)" +
            " DIV (m_both + 1) - 1 AS BIGINT)").as("est_chapman"),
          col("exact_v").cast("long").as("exact_v"))
        .select(col("*"),
          expr("CAST(ABS(est_chapman - exact_v) * 1000000 DIV exact_v AS BIGINT)")
            .as("abs_err_ppm"),
          expr("CAST(SIGN(est_chapman - exact_v) AS BIGINT)").as("bias_sign"))
    },

    // One-pass Pearson CORRELATION MATRIX over the lineitem measures
    // (quantity, price-dollars, discount-pct, tax-pct) — ALL pairwise
    // moments Σxᵢxⱼ from ONE scan and one map-combined 15-sum agg (the
    // moment-matrix read PCA/feature-selection starts from; q237
    // cross-correlates TIME series, this correlates MEASURES). Base sums
    // are exact BIGINTs; each r assembles from them in mirrored IEEE
    // arithmetic (identical expression tree both engines — the q207
    // rule: r needs sqrt and signed division, both transcendental-free
    // points are behind us). Sums are SUM-MERGEABLE ⟹ the matrix shards
    // at 100 TB like q267's normal equations.
    "q272_corr_matrix" -> { (s, d) =>
      val q = Tables.lineitem(s, d).select(
        expr("CAST(l_quantity AS BIGINT)").as("a"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 100").as("b"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)").as("c"),
        expr("CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT)").as("e"))
      val pairs = Seq("a" -> "b", "a" -> "c", "a" -> "e", "b" -> "c", "b" -> "e", "c" -> "e")
      val sums =
        Seq("a", "b", "c", "e").flatMap(v => Seq(
          sum(col(v)).as(s"s_$v"), sum(expr(s"$v * $v")).as(s"s_$v$v"))) ++
        pairs.map { case (x, y) => sum(expr(s"$x * $y")).as(s"s_$x$y") }
      def r(x: String, y: String): Column = expr(
        s"(CAST(n AS DOUBLE) * CAST(s_$x$y AS DOUBLE) -" +
          s" CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE)) /" +
          s" SQRT((CAST(n AS DOUBLE) * CAST(s_$x$x AS DOUBLE) -" +
          s" CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE)) *" +
          s" (CAST(n AS DOUBLE) * CAST(s_$y$y AS DOUBLE) -" +
          s" CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE)))")
      q.agg(count(lit(1)).as("n"), sums: _*)
        .select(col("n").cast("long").as("n"),
          r("a", "b").as("r_qty_price"), r("a", "c").as("r_qty_disc"),
          r("a", "e").as("r_qty_tax"), r("b", "c").as("r_price_disc"),
          r("b", "e").as("r_price_tax"), r("c", "e").as("r_disc_tax"))
    },

    // DIFFERENCE-IN-DIFFERENCES of per-line revenue: treated = PROMO
    // part types, post = order year ≥ 1996 — did = (post−pre) change for
    // treated MINUS the same change for controls, the causal-inference
    // shape that nets out both the group gap and the secular trend
    // (q177's A/B z-test compares GROUPS at one time; q231's lift curve
    // has no time axis at all). Revenue in exact scale-4 µ-units (the
    // q186 shift rule); the four cell means are positive floor-DIVs; the
    // did itself is the ONE mirrored IEEE assembly (signed — the q207
    // floor-DIV rule). All four cells reduce in a single map-combined
    // agg over one fact pass: conditional sums, no second scan.
    "q273_did_promo" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .join(Tables.part(s, d).select(col("p_partkey"),
          col("p_type").startsWith("PROMO").as("treated")), // broadcast by AQE
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          (year(col("o_orderdate")) >= 1996).as("post")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("treated"), col("post"),
          (Relational.money(col("l_extendedprice")) *
            Relational.rate(lit(1) - col("l_discount")) * lit(10000))
            .cast("long").as("rev_u"))
      def cell(t: Boolean, p: Boolean, suffix: String) = Seq(
        sum(when(col("treated") === t && col("post") === p, 1L).otherwise(0L))
          .as(s"n_$suffix"),
        sum(when(col("treated") === t && col("post") === p, col("rev_u"))
          .otherwise(0L)).as(s"s_$suffix"))
      val cells = cell(true, true, "t1") ++ cell(true, false, "t0") ++
        cell(false, true, "c1") ++ cell(false, false, "c0")
      li.agg(cells.head, cells.tail: _*)
        .select(
          col("n_t1").cast("long").as("n_t1"), col("s_t1").cast("long").as("s_t1"),
          col("n_t0").cast("long").as("n_t0"), col("s_t0").cast("long").as("s_t0"),
          col("n_c1").cast("long").as("n_c1"), col("s_c1").cast("long").as("s_c1"),
          col("n_c0").cast("long").as("n_c0"), col("s_c0").cast("long").as("s_c0"),
          expr("CAST(s_t1 DIV n_t1 AS BIGINT)").as("mean_t1_u"),
          expr("CAST(s_t0 DIV n_t0 AS BIGINT)").as("mean_t0_u"),
          expr("CAST(s_c1 DIV n_c1 AS BIGINT)").as("mean_c1_u"),
          expr("CAST(s_c0 DIV n_c0 AS BIGINT)").as("mean_c0_u"),
          expr("(CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE) -" +
            " CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE)) -" +
            " (CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE) -" +
            " CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE))").as("did_u"))
    },

    // Consistent-hash RESHARD audit — growing 16 → 17 shards, what
    // fraction of the corpus MOVES under naive mod-N vs rendezvous/HRW
    // hashing (shard = argmax over per-shard hashes): mod reshuffles
    // ~16/17 of every shard's data, HRW moves only the ~1/17 the new
    // shard wins — THE reason consistent schemes exist, measured as an
    // exact corpus fact. HRW argmax is the mirrored two-step rule (max
    // value, then smallest index achieving it) over a 17-slot hash array
    // built per row — bounded map work, no join, no shuffle before the
    // one-row agg; the 33 md5s/row are the audit's documented price (a
    // production router caches them per key).
    "q274_reshard_audit" -> { (s, d) =>
      val hj = "conv(substring(md5(concat(CAST(doc_id AS STRING), ':'," +
        " CAST(j AS STRING))), 1, 8), 16, 10)"
      val df = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("h", Dedup.neutralHash32(col("doc_id").cast("string")))
        .withColumn("v17", expr(s"transform(sequence(0, 16), j -> CAST($hj AS BIGINT))"))
        .withColumn("v16", expr("slice(v17, 1, 16)"))
        .select(
          (col("h") % 16 =!= col("h") % 17).as("moved_mod"),
          (expr("array_position(v16, array_max(v16))") =!=
            expr("array_position(v17, array_max(v17))")).as("moved_hrw"))
      df.agg(count(lit(1)).as("n_docs"),
          sum(when(col("moved_mod"), 1L).otherwise(0L)).as("moved_mod"),
          sum(when(col("moved_hrw"), 1L).otherwise(0L)).as("moved_hrw"))
        .select(col("n_docs").cast("long").as("n_docs"),
          col("moved_mod").cast("long").as("moved_mod"),
          col("moved_hrw").cast("long").as("moved_hrw"),
          expr("CAST(moved_mod * 1000000 DIV n_docs AS BIGINT)").as("mod_ppm"),
          expr("CAST(moved_hrw * 1000000 DIV n_docs AS BIGINT)").as("hrw_ppm"))
    },

    // t-CLOSENESS audit — completes the privacy triad over the SAME
    // order/customer frame as q149: k-anonymity (q92) bounds group SIZE,
    // l-diversity (q149) bounds sensitive-value VARIETY, t-closeness
    // bounds sensitive-value DISTRIBUTION distance — a group can hold 5
    // distinct nations and still leak if 96% of it is one nation the
    // global table spreads evenly. t = TVD between the class's
    // c_nationkey distribution and the global one, exact floor-ppm on
    // the full class × nation grid WITH explicit zeros (a nation absent
    // from a class is leaked information, not a missing row — the q158
    // rule is load-bearing here, dropping zero cells understates t).
    "q275_t_closeness" -> { (s, d) =>
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          col("c_mktsegment"), col("c_nationkey"))
      val cls = j.groupBy("yr", "c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("c"))
      val classTot = cls.groupBy("yr", "c_mktsegment").agg(sum(col("c")).as("nc"))
      val glob = j.groupBy("c_nationkey").agg(count(lit(1)).as("g"))
      val tot = j.agg(count(lit(1)).as("nt"))
      classTot.crossJoin(broadcast(glob.crossJoin(broadcast(tot))))
        .join(cls, Seq("yr", "c_mktsegment", "c_nationkey"), "left")
        .withColumn("c0", coalesce(col("c"), lit(0L)))
        .groupBy("yr", "c_mktsegment", "nc")
        .agg(sum(expr("ABS(c0 * 1000000 DIV nc - g * 1000000 DIV nt)")).as("l1"))
        .select(col("yr"), col("c_mktsegment"),
          col("nc").cast("long").as("n_orders"),
          expr("CAST(l1 DIV 2 AS BIGINT)").as("tvd_ppm"))
        .withColumn("at_risk", col("tvd_ppm") > 300000L)
        .orderBy("yr", "c_mktsegment")
    },

    // Quantile NORMALIZATION map — the batch-effect-removal primitive:
    // align each source's doc-length distribution onto the pooled one by
    // mapping decile to decile (rank-preserving, distribution-destroying
    // — what expression-array pipelines and cross-source score
    // calibration both do). Decile d = the smallest value whose
    // cumulative count clears d·n/10, located by integer
    // CROSS-MULTIPLICATION (10·cum ≥ d·n — the q179 rule, no float
    // thresholds); shift = own − pooled is a pure subtraction, so no
    // signed-division trap exists. Per-source cumulatives ride a
    // per-SOURCE grid window; the POOLED cumulative uses a
    // predecessor-count self-join on the value grid instead (the q216
    // rank rule — a pooled window would be an unpartitioned sort).
    "q276_quantile_normalization" -> { (s, d) =>
      val g = Tables.documents(s, d).groupBy("source", "n_chars")
        .agg(count(lit(1)).as("f"))
      val w = Window.partitionBy("source").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = g.withColumn("below", coalesce(sum(col("f")).over(w), lit(0L)))
      val n = g.groupBy("source").agg(sum(col("f")).as("n"))
      val dec = g.sparkSession.range(1, 10).select(col("id").cast("long").as("decile"))
      val own = cum.join(n, "source").crossJoin(broadcast(dec))
        .filter(lit(10) * col("below") < col("decile") * col("n") &&
          col("decile") * col("n") <= lit(10) * (col("below") + col("f")))
        .select(col("source"), col("decile"), col("n_chars").as("v_own"))
      val pg = Tables.documents(s, d).groupBy("n_chars").agg(count(lit(1)).as("pf"))
      val pb = pg.select(col("n_chars").as("v2"), col("pf").as("pf2"))
      val pcum = pg.join(broadcast(pb), col("v2") < col("n_chars"), "left")
        .groupBy("n_chars", "pf")
        .agg(coalesce(sum(col("pf2")), lit(0L)).as("pbelow"))
      val pn = pg.agg(sum(col("pf")).as("pn"))
      val pool = pcum.crossJoin(broadcast(pn)).crossJoin(broadcast(dec))
        .filter(lit(10) * col("pbelow") < col("decile") * col("pn") &&
          col("decile") * col("pn") <= lit(10) * (col("pbelow") + col("pf")))
        .select(col("decile"), col("n_chars").as("v_pool"))
      own.join(broadcast(pool), "decile")
        .select(col("source"), col("decile"),
          col("v_own").cast("long").as("v_own"),
          col("v_pool").cast("long").as("v_pool"),
          (col("v_own") - col("v_pool")).cast("long").as("shift"))
        .orderBy("source", "decile")
    },

    // Split-CONFORMAL calibration quantile per language — the
    // distribution-free prediction-interval primitive: q̂ = the
    // ⌈0.9·(n+1)⌉-th smallest calibration score guarantees ≥ 90%
    // coverage on exchangeable future draws with NO model assumptions.
    // The finite-sample ⌈·(n+1)⌉ index is the entire point (the naive
    // 0.9·n quantile under-covers — q48/q62's percentiles answer a
    // different question); k = (9·(n+1) + 9) DIV 10 exactly, q̂ located
    // on the per-lang value grid by the covering-interval rule, realized
    // calibration coverage = cum(q̂)/n ≥ 90% rides along as the check.
    "q277_conformal_quantile" -> { (s, d) =>
      val g = Tables.documents(s, d).groupBy("lang", "n_chars")
        .agg(count(lit(1)).as("f"))
      val w = Window.partitionBy("lang").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = g.withColumn("below", coalesce(sum(col("f")).over(w), lit(0L)))
      val n = g.groupBy("lang").agg(sum(col("f")).as("n"))
      cum.join(n, "lang")
        .withColumn("k_idx", expr("(9 * (n + 1) + 9) DIV 10"))
        .filter(col("below") < col("k_idx") &&
          col("k_idx") <= col("below") + col("f"))
        .select(col("lang"), col("n").cast("long").as("n"),
          col("k_idx").cast("long").as("k_idx"),
          col("n_chars").cast("long").as("qhat"),
          expr("CAST((below + f) * 1000000 DIV n AS BIGINT)").as("realized_ppm"),
          lit(900000L).as("nominal_ppm"))
        .orderBy("lang")
    },

    // Embedding covariance ANISOTROPY audit — how far the embedding
    // cloud is from isotropic (the whitening go/no-go read: isotropic
    // embeddings make cosine ≈ dot product and ANN partitions balanced;
    // one dominant off-diagonal direction degrades both — q204 extracts
    // the dominant direction, q112 reads per-dim moments, THIS weighs
    // diagonal vs off-diagonal covariance mass as one number). The full
    // 32×32 moment matrix from ONE scan: per row a double posexplode of
    // the q3-quantized vector (1024 bounded cells/row — NO fact
    // self-join, unlike the oracle's replay), map-combined onto the
    // (i,j) grid; C_ij = n·S_ij − T_i·T_j exact; the dominant
    // off-diagonal cell is the mirrored two-step argmax with an
    // i·dims+j key for total tie order.
    "q278_covariance_anisotropy" -> { (s, d) =>
      val q = Tables.embeddings(s, d).select(
        expr("transform(embedding, x ->" +
          " CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5D) AS BIGINT))").as("qa"))
      val cells = q
        .select(col("qa"), posexplode(col("qa")).as(Seq("i", "qi")))
        .select(col("i"), col("qi"), posexplode(col("qa")).as(Seq("j", "qj")))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("nv"), sum(expr("qi * qj")).as("sij"))
      val t = q.select(posexplode(col("qa")).as(Seq("dim", "qi")))
        .groupBy("dim").agg(sum(col("qi")).as("ti"))
      val c = cells
        .join(broadcast(t.withColumnRenamed("dim", "i")), "i")
        .join(broadcast(t.select(col("dim").as("j"), col("ti").as("tj"))), "j")
        .select(col("i"), col("j"),
          expr("nv * CAST(sij AS DECIMAL(38,0)) -" +
            " CAST(ti AS DECIMAL(38,0)) * tj").as("cij"))
      val agg = c.agg(
        sum(when(col("i") === col("j"), col("cij"))).as("trace_q"),
        sum(when(col("i") =!= col("j"), abs(col("cij")))).as("offdiag_q"),
        countDistinct(col("i")).as("dims"),
        max(when(col("i") =!= col("j"), abs(col("cij")))).as("mx"))
      val top = c.crossJoin(broadcast(agg.select(col("mx"))))
        .filter(col("i") =!= col("j") && abs(col("cij")) === col("mx"))
        .agg(min(col("i") * 1024 + col("j")).as("key"))
      val nv = Tables.embeddings(s, d).agg(count(lit(1)).as("n_vecs"))
      agg.crossJoin(broadcast(top)).crossJoin(broadcast(nv))
        .select(col("n_vecs").cast("long").as("n_vecs"),
          col("dims").cast("long").as("dims"),
          expr("CAST(trace_q AS BIGINT)").as("trace_q"),
          expr("CAST(offdiag_q AS BIGINT)").as("offdiag_q"),
          expr("CAST(offdiag_q * dims * 1000000 DIV (trace_q * (dims * dims - dims))" +
            " AS BIGINT)").as("anisotropy_ppm"),
          expr("CAST(key DIV 1024 AS BIGINT)").as("top_i"),
          expr("CAST(key % 1024 AS BIGINT)").as("top_j"),
          expr("CAST(mx AS BIGINT)").as("top_abs"))
    },

    // Catalog-statistics BROADCAST advisor — the cost-based-optimizer
    // input Spark's autoBroadcastJoinThreshold reads, made an explicit
    // table: per-table row counts and estimated in-memory bytes (8 per
    // numeric/date column + measured string lengths — the width model a
    // catalog keeps), with the would-broadcast verdict at the default
    // 10 MiB threshold. The planning twin of F47/q226's runtime
    // cardinality estimate: THIS is what decides broadcast-vs-shuffle
    // BEFORE any data moves, and the dims-broadcast/fact-shuffled shape
    // every query in this library relies on is exactly the verdict
    // pattern this table emits. Each leg is one map-combined two-sum agg.
    "q280_broadcast_advisor" -> { (s, d) =>
      def leg(name: String, df: DataFrame, bytesExpr: String) =
        df.agg(count(lit(1)).as("n_rows"),
            sum(expr(bytesExpr)).as("est_bytes"))
          .select(lit(name).as("table_name"),
            col("n_rows").cast("long").as("n_rows"),
            col("est_bytes").cast("long").as("est_bytes"))
      val rows = Seq(
        leg("region", Tables.region(s, d), "8 + length(r_name)"),
        leg("nation", Tables.nation(s, d), "16 + length(n_name)"),
        leg("customer", Tables.customer(s, d),
          "24 + length(c_name) + length(c_mktsegment)"),
        leg("supplier", Tables.supplier(s, d), "24 + length(s_name)"),
        leg("part", Tables.part(s, d),
          "24 + length(p_name) + length(p_brand) + length(p_type)"),
        leg("orders", Tables.orders(s, d),
          "32 + length(o_orderstatus) + length(o_orderpriority)"),
        leg("lineitem", Tables.lineitem(s, d),
          "72 + length(l_returnflag) + length(l_linestatus)"))
      rows.reduce(_ unionByName _)
        .select(col("table_name"), col("n_rows"), col("est_bytes"),
          expr("CAST(est_bytes DIV n_rows AS BIGINT)").as("bytes_per_row"),
          (col("est_bytes") < 10485760L).as("would_broadcast"))
        .orderBy("table_name")
    },

    // Folded-phase PERIOD DETECTION per event type — which cycle length
    // p ∈ {5,6,7,8} days best explains daily volume (F60/q239 TESTS the
    // known weekly cycle; this DETECTS the period, the log-free/FFT-free
    // periodogram): fold the zero-filled day grid at each candidate p,
    // score with the balanced-ANOVA eta² in exact integers — which
    // demands truncating each fold to FULL periods (q239's 4-full-week
    // rule generalized: unbalanced phase groups break the integer
    // identity), eta²_ppm = (p·ΣTg² − T²)·10⁶ DIV (m·Σc² − T²), both
    // sides nonnegative by Cauchy-Schwarz on balanced groups so the
    // floor-DIV is sign-safe. best = the mirrored two-step argmax
    // (max eta², then smallest p).
    "q281_period_detection" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val daily = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c0"))
      val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val days = bounds.select(explode(expr("sequence(mn, mx)")).as("day"),
        col("mn"))
      val types = ev.select("event_type").distinct()
      val cells = days.crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), datediff(col("day"), col("mn")).as("di"),
          coalesce(col("c0"), lit(0L)).as("c"))
      val nd = cells.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      val pg = ev.sparkSession.range(5, 9).select(col("id").cast("int").as("p"))
      val folded = cells.join(broadcast(nd), "event_type")
        .crossJoin(broadcast(pg))
        .filter(col("di") < expr("CAST(n_days DIV p AS INT) * p"))
        .select(col("event_type"), col("p"), (col("di") % col("p")).as("phase"),
          col("c"))
      val phased = folded.groupBy("event_type", "p", "phase")
        .agg(sum(col("c")).as("tg"), sum(expr("c * c")).as("sc2"),
          count(lit(1)).as("ng"))
      val scored = phased.groupBy("event_type", "p")
        .agg(sum(col("tg")).as("t"), sum(col("ng")).as("m"),
          sum(expr("tg * CAST(tg AS DECIMAL(38,0))")).as("stg2"),
          sum(col("sc2")).as("sc2"))
        .select(col("event_type"), col("p").cast("long").as("p"),
          col("m").cast("long").as("m_days"),
          col("t").cast("long").as("n_events"),
          expr("CASE WHEN m * CAST(sc2 AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0)) * t > 0" +
            " THEN CAST((p * stg2 - CAST(t AS DECIMAL(38,0)) * t) * 1000000" +
            " DIV (m * CAST(sc2 AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0)) * t) AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("eta2_ppm"))
      val best = scored.groupBy(col("event_type").as("et2"))
        .agg(max(col("eta2_ppm")).as("mx"))
      val bestP = scored.join(broadcast(best),
          col("event_type") === col("et2") && col("eta2_ppm") === col("mx"))
        .groupBy(col("event_type").as("et3")).agg(min(col("p")).as("best_p"))
      scored.join(broadcast(bestP), col("event_type") === col("et3"))
        .select(col("event_type"), col("p"), col("m_days"), col("n_events"),
          col("eta2_ppm"),
          (col("p") === col("best_p")).as("is_best"))
        .orderBy("event_type", "p")
    },

    // Jelinek-Mercer-smoothed QUERY-LIKELIHOOD retrieval (λ = ½) — the
    // language-model ranking family next to B12/q137's BM25 and
    // q116's RRF: score(d) = Π_t (tf/2dl + cf/2C), each factor an exact
    // floor-ppm integer, the 3-term product ≤ 10¹⁸ so the WHOLE ranking
    // is integer arithmetic (the standard log-sum formulation exists
    // only to dodge underflow — at 3 terms the product needs no dodge,
    // and stays engine-exact where logs would not be).
    // PRECONDITION: the corpus vocabulary holds >= 30 distinct tokens
    // (true of any real corpus; GenData guarantees 31 like the driver
    // corpus) — below that, rank 30 has no term and the two engines'
    // missing-term conventions diverge (Spark folds the present terms,
    // the SQL mirror's MAX(CASE) goes NULL — caught by the round-8
    // generated-corpus gate). Query = the
    // global frequency ranks {10, 20, 30} (mid-frequency terms,
    // deterministic); rank via TakeOrdered-30 then a predecessor-count
    // self-join on that 30-row grid — never a global window. Every doc
    // scores against every query term (the λ-smoothed corpus factor
    // keeps docs MISSING a term alive — the entire point of JM
    // smoothing), via ONE broadcast term grid; the per-doc product
    // folds a sort_array'd collect_list, deterministic by term rank.
    "q282_query_likelihood" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      val cf = toks.groupBy("tok").agg(count(lit(1)).as("cf"))
      val top30 = cf.orderBy(col("cf").desc, col("tok")).limit(30)
      val t2 = top30.select(col("tok").as("t2"), col("cf").as("cf2"))
      val ranked = top30.join(broadcast(t2),
          col("cf2") > col("cf") || (col("cf2") === col("cf") && col("t2") < col("tok")),
          "left")
        .groupBy("tok", "cf").agg((count(col("t2")) + 1).as("trank"))
        .filter(col("trank").isin(10L, 20L, 30L))
      val ctot = toks.agg(count(lit(1)).as("ctot"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(dl, "doc_id")
      val tf = toks.join(broadcast(ranked.select(col("tok"))), "tok")
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val terms = docs.crossJoin(broadcast(ranked.crossJoin(broadcast(ctot))))
        .join(tf, Seq("doc_id", "tok"), "left")
        .select(col("doc_id"), col("lang"), col("trank"),
          (expr("coalesce(tf, 0) * 1000000 DIV (2 * dl)") +
            expr("cf * 1000000 DIV (2 * ctot)")).as("s_t"))
      terms.groupBy("doc_id", "lang")
        .agg(expr("aggregate(transform(sort_array(collect_list(struct(trank, s_t)))," +
          " x -> x.s_t), 1L, (acc, v) -> acc * v)").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          col("score").cast("long").as("score"))
    },

    // XOR SET-DIGEST per source — the invertible content fingerprint for
    // shard reconciliation (rsync/anti-entropy shape): digest = bit_xor
    // of 60-bit content hashes over the source's DISTINCT doc set.
    // Equal digests flag equal sets without comparing members; after an
    // append, digest' = digest ⊕ h(new) updates in O(1) — the
    // INVERTIBILITY CMS/HLL/MinHash all lack (they only add; xor also
    // removes). The distinct-first step is load-bearing: xor is
    // MULTISET PARITY, a doc present twice cancels itself. Spec proves
    // the disjoint-union merge law digest(A ⊎ B) = digest(A) ⊕
    // digest(B) and the single-doc update law. '__all__' = the digest
    // of the global distinct set (≠ xor of per-source digests exactly
    // when cross-source duplicates exist — that GAP is the
    // reconciliation signal).
    "q283_set_digest" -> { (s, d) =>
      val h = Tables.documents(s, d)
        .select(col("source"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .distinct()
      val per = h.groupBy("source").agg(
        count(lit(1)).as("ndv"), expr("bit_xor(h)").as("digest"))
      val all = h.select("h").distinct()
        .agg(count(lit(1)).as("ndv"), expr("bit_xor(h)").as("digest"))
        .select(lit("__all__").as("source"), col("ndv"), col("digest"))
      per.unionByName(all)
        .select(col("source"), col("ndv").cast("long").as("ndv"),
          col("digest").cast("long").as("digest"))
        .orderBy("source")
    },

    // KMV/THETA sketch: distinct-UNION and INTERSECTION estimates per
    // source pair + exact audit — the set-algebra sketch completing the
    // suite (CMS counts frequencies, HLL counts one set's cardinality,
    // MinHash estimates Jaccard; KMV is the one that estimates
    // |A∪B| AND |A∩B| directly, because the k minimum hashes of a union
    // are computable from the per-set minima — the merge law that makes
    // it shardable). θ = the k-th minimum hash mv; est_union =
    // (k−1)·M DIV mv (the unbiased KMV estimator); est_inter = (union
    // bottom-k values present in BOTH sets)·M DIV mv. k = 16, M = 2⁶⁰
    // (the 15-hex-digit hash range). The exact legs are the deliberate
    // small-SF calibration audit (q184's convention — at 100 TB only
    // the sketches ship).
    "q284_kmv_theta" -> { (s, d) =>
      val M = 1152921504606846976L // 2^60
      val h = Tables.documents(s, d)
        .select(col("source"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .distinct()
      val wS = Window.partitionBy("source").orderBy("h")
      val sigs = h.withColumn("rk", row_number().over(wS)).filter(col("rk") <= 16)
      val sa = sigs.select(col("source").as("a"), col("h"))
      val sb = sigs.select(col("source").as("b"), col("h"))
      // union sketch = bottom-32 of the two signature sets' union
      val wU = Window.partitionBy("a", "b").orderBy("h")
      // the source grid aggregates on `source` BEFORE any alias so the
      // plan audit sees the bounded grouping key
      val srcs = h.select("source").distinct()
      val usig = sa.crossJoin(broadcast(srcs.select(col("source").as("b"))))
        .where(col("a") < col("b"))
        .select(col("a"), col("b"), col("h"))
        .unionByName(sb.crossJoin(broadcast(srcs.select(col("source").as("a"))))
          .where(col("a") < col("b"))
          .select(col("a"), col("b"), col("h")))
        .distinct() // a hash in both signature sets enters once
        .withColumn("urk", row_number().over(wU))
        .filter(col("urk") <= 16)
      val theta = usig.groupBy("a", "b")
        .agg(max(col("h")).as("mv"), count(lit(1)).as("ku"))
      // membership of union-bottom values in each FULL distinct set
      val inA = usig.join(h.select(col("source").as("a"), col("h"), lit(1).as("ma")),
        Seq("a", "h"), "left")
      val both = inA.join(h.select(col("source").as("b"), col("h"), lit(1).as("mb")),
          Seq("b", "h"), "left")
        .groupBy("a", "b")
        .agg(sum(when(col("ma").isNotNull && col("mb").isNotNull, 1L).otherwise(0L))
          .as("c_both"))
      // exact legs from the hash → source-set inversion
      val perSrc = h.groupBy("source").agg(count(lit(1)).as("ndv"))
      val exInter = h.join(h.withColumnRenamed("source", "b2"), "h")
        .where(col("source") < col("b2"))
        .groupBy(col("source").as("a"), col("b2").as("b"))
        .agg(count(lit(1)).as("exact_inter"))
      theta.join(both, Seq("a", "b"))
        .join(broadcast(perSrc.select(col("source").as("a"), col("ndv").as("nda"))), "a")
        .join(broadcast(perSrc.select(col("source").as("b"), col("ndv").as("ndb"))), "b")
        .join(exInter, Seq("a", "b"), "left")
        .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
        .select(col("a"), col("b"), col("ku").cast("long").as("k_used"),
          expr(s"CAST((ku - 1) * CAST($M AS DECIMAL(38,0)) DIV mv AS BIGINT)")
            .as("est_union"),
          (col("nda") + col("ndb") - col("exact_inter")).cast("long").as("exact_union"),
          expr(s"CAST(c_both * CAST($M AS DECIMAL(38,0)) DIV mv AS BIGINT)")
            .as("est_inter"),
          col("exact_inter").cast("long").as("exact_inter"))
        .orderBy("a", "b")
    },

    // AMS F2 sketch per language — the SECOND-MOMENT estimator
    // completing the frequency-sketch family (CMS bounds point counts,
    // THIS estimates Σf² = the self-join size / repeat-rate of the
    // token stream): four independent ±1 hash estimators, Zⱼ = Σ
    // sign_j(t)·f_t computed EXACTLY on the vocab grid (the sketch's
    // linearity is the merge law: Zⱼ sums across shards), est = mean of
    // Zⱼ² — E[Z²] = F2 unbiased. The exact Σf² leg rides the same grid
    // as the calibration audit; err_ppm is the read.
    "q285_ams_f2" -> { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
      val jg = tf.sparkSession.range(0, 4).select(col("id").cast("int").as("j"))
      val z = tf.crossJoin(broadcast(jg))
        .select(col("lang"), col("j"),
          (when(Dedup.neutralHash32(
              concat(col("j").cast("string"), lit(":"), col("tok"))) % 2 === 0,
            lit(1L)).otherwise(lit(-1L)) * col("f")).as("sf"))
        .groupBy("lang", "j").agg(sum(col("sf")).as("zj"))
      val est = z.groupBy("lang")
        .agg(expr("CAST(sum(zj * CAST(zj AS DECIMAL(38,0))) DIV 4 AS BIGINT)")
          .as("est_f2"))
      val exact = tf.groupBy("lang")
        .agg(sum(col("f")).cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("v_types"),
          expr("CAST(sum(f * CAST(f AS DECIMAL(38,0))) AS BIGINT)").as("exact_f2"))
      exact.join(est, "lang")
        .select(col("lang"), col("n_tokens"), col("v_types"),
          col("exact_f2"), col("est_f2"),
          expr("CAST(ABS(est_f2 - exact_f2) * 1000000 DIV exact_f2 AS BIGINT)")
            .as("abs_err_ppm"))
        .orderBy("lang")
    },

    // ADDITIVE time-series DECOMPOSITION per event type — y = trend +
    // seasonal + residual, the classical-decomposition read every
    // monitoring dashboard draws (E42/q143's EWMA smooths ONE line;
    // this SEPARATES the three components so a level shift, a weekday
    // pattern, and noise stop masquerading as each other). Trend =
    // centered 7-day moving sum ×10⁶ DIV 7 on the zero-filled day grid
    // (interior days only — a partial window is a different estimator);
    // seasonal = per-weekday-phase mean of the detrended series, the
    // ONE mirrored floor(IEEE /) because phase sums go NEGATIVE and
    // integer DIV truncates toward zero in Spark but floors in DuckDB
    // (the q207 rule's division-side twin); residual = y − t − s BY
    // CONSTRUCTION, so conservation y·10⁶ = t + s + r is exact and
    // spec-asserted, not approximate.
    "q289_ts_decomposition" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val daily = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c0"))
      val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val days = bounds.select(explode(expr("sequence(mn, mx)")).as("day"),
        col("mn"), col("mx"))
      val types = ev.select("event_type").distinct()
      val cells = days.crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), datediff(col("day"), col("mn")).as("di"),
          datediff(col("mx"), col("mn")).as("ndm1"),
          coalesce(col("c0"), lit(0L)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("di").rowsBetween(-3, 3)
      val trended = cells
        .withColumn("wsum", sum(col("c")).over(w))
        .filter(col("di") >= 3 && col("di") <= col("ndm1") - 3)
        .select(col("event_type"), col("di"), col("c"),
          expr("CAST(wsum * 1000000 DIV 7 AS BIGINT)").as("trend_u"))
        .withColumn("det_u", col("c") * lit(1000000L) - col("trend_u"))
        .withColumn("phase", col("di") % 7)
      val seas = trended.groupBy("event_type", "phase")
        .agg(expr("CAST(FLOOR(CAST(SUM(det_u) AS DOUBLE) / COUNT(*)) AS BIGINT)")
          .as("seasonal_u"))
      trended.join(seas, Seq("event_type", "phase"))
        .select(col("event_type"), col("di").cast("long").as("di"),
          col("c").cast("long").as("n_events"),
          col("trend_u"), col("seasonal_u"),
          (col("det_u") - col("seasonal_u")).cast("long").as("resid_u"))
        .orderBy("event_type", "di")
    },

    // SEASONAL-RESIDUAL anomaly detector — the RIGHT way to alert on a
    // seasonal series: q344/q218 flag raw daily counts, so every
    // weekend reads as an anomaly on weekday-patterned data; THIS
    // flags |residual − median(residual)| > 3·MAD on q289's exact
    // decomposition residuals, where trend and weekday pattern are
    // already removed — the q344 robust rule pointed at the component
    // that is actually supposed to be noise. Medians/MADs by the
    // ceil-rank running-sum selection partitioned by event type (the
    // q487 shape). Per type: interior days, median residual, MAD,
    // anomaly count, worst |deviation|. Scale: rides q289's grid (the
    // horizon-bounded day lattice); two grid-sized rank selections.
    "q492_seasonal_anomaly" -> { (s, d) =>
      val dec = Caches.shared(queries("q289_ts_decomposition")(s, d)
        .select(col("event_type"), col("resid_u")))
      def medOf(df: DataFrame, v: String): DataFrame = {
        val g = df.groupBy(col("event_type"), col(v))
          .agg(count(lit(1)).as("cc"))
        val w = Window.partitionBy("event_type").orderBy(v)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.withColumn("cum", sum(col("cc")).over(w))
          .withColumn("n", sum(col("cc"))
            .over(Window.partitionBy("event_type")))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"),
            max(when(expr("cum - cc < (n + 1) DIV 2 AND (n + 1) DIV 2 <= cum"),
              col(v))).as("med"))
      }
      val med = medOf(dec, "resid_u")
      val ad = dec.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("resid_u") - col("med")).as("adv"))
      val mad = medOf(ad, "adv")
        .select(col("event_type"), col("med").as("mad"))
      dec.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(max(col("n")).cast("long").as("n_days"),
          max(col("med")).cast("long").as("median_resid_u"),
          max(col("mad")).cast("long").as("mad_u"),
          sum(when(abs(col("resid_u") - col("med")) > col("mad") * 3, 1L)
            .otherwise(0L)).cast("long").as("n_anomalies"),
          max(abs(col("resid_u") - col("med"))).cast("long")
            .as("worst_abs_dev"))
        .orderBy("event_type")
    },

    // Temperature-based mixing SWEEP, α ∈ {¼, ½, ¾} — the source-mix
    // decision CURVE above D5t/q64's single α = ½ point (α → 0 is
    // uniform-over-sources, α = 1 is proportional; WHERE to sit is the
    // dial every pretraining mix tunes). The log-free trick: n^α at
    // these α's is nested INTEGER square roots — isqrt(n·10¹²) =
    // n^½·10⁶, isqrt of that ×10³-scaled again gives n^¼·10³, and
    // n^¾ = n^½·n^¼ — floor(sqrt(double)) is the exact integer sqrt for
    // inputs < 2⁵³ (the q268 argument), so both engines derive
    // identical weights with no pow()/exp()/ln() anywhere. Output:
    // per-(source, α) weight and floor-ppm mix share. Magnitude note:
    // the n·10¹² input must stay < 2⁵³ for the exactness argument, i.e.
    // n < 9·10³ per source at this scaling — at larger per-source
    // counts, drop the pre-scale a decade (n·10¹⁰ → weight grid 10⁵)
    // which the same two-engine argument covers.
    "q290_temperature_sweep" -> { (s, d) =>
      val c = Tables.documents(s, d).groupBy("source").agg(count(lit(1)).as("n"))
      // w_q2 = n^(1/2)·10⁶, w_q1 = n^(1/4)·10³ — exact integer sqrts
      val w = c
        .withColumn("w2", expr(
          "CAST(FLOOR(SQRT(CAST(n * 1000000000000 AS DOUBLE))) AS BIGINT)"))
        .withColumn("w1", expr("CAST(FLOOR(SQRT(CAST(w2 AS DOUBLE))) AS BIGINT)"))
      val alphas = w.sparkSession.range(1, 4)
        .select(col("id").cast("long").as("a4")) // α = a4/4
      val weighted = w.crossJoin(broadcast(alphas))
        .select(col("source"), col("n"), col("a4"),
          // α=¼ → w1·10³ (rescale to the 10⁶ grid), α=½ → w2,
          // α=¾ → w1·w2 DIV 10³ (scale 10⁹ → 10⁶)
          expr("CASE a4 WHEN 1 THEN w1 * 1000 WHEN 2 THEN w2" +
            " ELSE w1 * w2 DIV 1000 END").as("wt"))
      val tot = weighted.groupBy("a4").agg(sum(col("wt")).as("wtot"))
      weighted.join(broadcast(tot), "a4")
        .select(col("source"), (col("a4") * 250000L).as("alpha_ppm"),
          col("n").cast("long").as("n_docs"), col("wt").cast("long").as("weight"),
          expr("CAST(wt * 1000000 DIV wtot AS BIGINT)").as("share_ppm"))
        .orderBy("source", "alpha_ppm")
    },

    // BATCH-MEAN variance DECAY audit — the data-side gradient-noise
    // read (McCandlish et al.'s critical-batch-size intuition, proxied
    // on an exact statistic): for deterministic id-order batches of
    // B ∈ {16, 256, 4096} docs, the variance of the batch MEAN doc
    // length, exactly (nb·ΣS² − (ΣS)²)·10⁶ DIV (nb²·B²). Under
    // iid-like ordering this decays as 1/B — so b_var_u = B·var stays
    // flat; a RISING b_var_u curve means id-adjacent docs correlate
    // (template runs, crawl bursts — the q469 adjacency finding read
    // through training-batch glasses) and batch means won't concentrate
    // the way the lr schedule assumes. Partial trailing batches are
    // dropped (k = B exactly). DECIMAL(38,0) sums (HUGEINT mirror).
    "q493_batch_variance_decay" -> { (s, d) =>
      val bs = s.range(0, 3).select(
        expr("element_at(array(16L, 256L, 4096L), CAST(id + 1 AS INT))")
          .as("bsz"))
      val batches = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
        .crossJoin(broadcast(bs))
        .groupBy(col("bsz"), expr("doc_id DIV bsz").as("bid"))
        .agg(count(lit(1)).as("k"), sum(col("n_chars")).as("sb"))
        .filter(col("k") === col("bsz"))
      batches.groupBy("bsz")
        .agg(count(lit(1)).as("nb"),
          sum(expr("CAST(sb AS DECIMAL(38,0))")).as("ssum"),
          sum(expr("sb * CAST(sb AS DECIMAL(38,0))")).as("ssq"))
        .select(col("bsz").cast("long").as("batch_size"),
          col("nb").cast("long").as("n_batches"),
          expr("CAST((nb * ssq - ssum * ssum) * 1000000" +
            " div (CAST(nb AS DECIMAL(38,0)) * nb * bsz * bsz) AS BIGINT)")
            .as("var_mean_u"),
          expr("CAST((nb * ssq - ssum * ssum) * 1000000" +
            " div (CAST(nb AS DECIMAL(38,0)) * nb * bsz) AS BIGINT)")
            .as("b_var_u"))
        .orderBy("batch_size")
    },

    // ARC price-ELASTICITY of demand per brand (the econ read on the
    // discount dial: midpoint-formula elasticity between the low-
    // discount (≤ 2%) and high-discount (≥ 8%) regimes — F52/q231
    // prices what a discount point buys in revenue; THIS asks whether
    // quantity demanded actually responds). Arc formula
    // ((q₂−q₁)/(q₂+q₁)) / ((p₂−p₁)/(p₂+p₁)) assembled from four exact
    // integer sums per brand — the two quotients ride the mirrored
    // IEEE assembly (signed — the q207 rule), with price = the exact
    // (100 − disc_pct) mean in cross-multiplied form so no per-group
    // division precedes the final expression.
    "q291_arc_elasticity" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          expr("CAST(l_quantity AS BIGINT)").as("q"),
          expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)").as("dp"))
      val g = li.filter(col("dp") <= 2 || col("dp") >= 8)
        .withColumn("hi", (col("dp") >= 8).cast("int"))
        .groupBy("p_brand").agg(
          sum(when(col("hi") === 0, 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("hi") === 0, col("q")).otherwise(0L)).as("q_lo"),
          sum(when(col("hi") === 0, lit(100L) - col("dp")).otherwise(0L)).as("p_lo"),
          sum(when(col("hi") === 1, 1L).otherwise(0L)).as("n_hi"),
          sum(when(col("hi") === 1, col("q")).otherwise(0L)).as("q_hi"),
          sum(when(col("hi") === 1, lit(100L) - col("dp")).otherwise(0L)).as("p_hi"))
        .filter(col("n_lo") > 0 && col("n_hi") > 0)
      // mean ratios cross-multiplied: q̄₂−q̄₁ ∝ q_hi·n_lo − q_lo·n_hi etc.
      g.select(col("p_brand"),
          col("n_lo").cast("long").as("n_lo"), col("n_hi").cast("long").as("n_hi"),
          expr("CAST(q_lo * 1000000 DIV n_lo AS BIGINT)").as("qbar_lo_u"),
          expr("CAST(q_hi * 1000000 DIV n_hi AS BIGINT)").as("qbar_hi_u"),
          expr("((CAST(q_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) -" +
            "   CAST(q_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) /" +
            "  (CAST(q_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) +" +
            "   CAST(q_lo AS DOUBLE) * CAST(n_hi AS DOUBLE))) /" +
            " ((CAST(p_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) -" +
            "   CAST(p_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) /" +
            "  (CAST(p_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) +" +
            "   CAST(p_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)))").as("elasticity"))
        .orderBy("p_brand")
    },

    // CROSS-VALIDATED accuracy spread of the q37 language predictor —
    // the model-eval variance read every benchmark number should carry
    // (a single accuracy hides whether the metric is stable; the
    // fold-to-fold spread IS the error bar, computed from q183's
    // reproducible hash folds over the q37/q102/q207 shared predictor
    // subtree so none of the four can drift). Per-fold accuracy is a
    // floor-ppm integer; the spread is the overflow-free k·Σa² − (Σa)²
    // population-variance numerator over the 5-row fold grid — exact,
    // no mean division anywhere.
    "q292_cv_accuracy_spread" -> { (s, d) =>
      val folds = TextAnalysis.langIdPredictions(s, d)
        .join(Tables.documents(s, d).select("doc_id", "lang"), "doc_id")
        .select((Dedup.neutralHash32(
            concat(lit("fold:"), col("doc_id").cast("string"))) % 5).as("fold"),
          when(col("pred_lang") === col("lang"), 1L).otherwise(0L).as("ok"))
        .groupBy("fold")
        .agg(count(lit(1)).as("n_docs"), sum(col("ok")).as("n_correct"))
        .withColumn("acc_ppm", expr("CAST(n_correct * 1000000 DIV n_docs AS BIGINT)"))
      val spread = folds.agg(count(lit(1)).as("k"),
          sum(col("acc_ppm")).as("sa"),
          sum(expr("acc_ppm * acc_ppm")).as("sa2"))
        .select(expr("CAST(k * sa2 - sa * sa AS BIGINT)").as("var_num"),
          expr("CAST((k * sa2 - sa * sa) DIV (k * k) AS BIGINT)").as("var_ppm2"))
      folds.crossJoin(broadcast(spread))
        .select(col("fold").cast("long").as("fold"),
          col("n_docs").cast("long").as("n_docs"),
          col("n_correct").cast("long").as("n_correct"),
          col("acc_ppm"), col("var_num"), col("var_ppm2"))
        .orderBy("fold")
    },

    // FRONT-CODING compression audit per source — how many bytes a
    // sorted-order shared-prefix encoding saves on the text column (the
    // string twin of F91/q270's RLE advisor: parquet's DELTA_BYTE_ARRAY
    // IS front coding, and this measures whether it pays BEFORE the
    // writer commits to it). Docs sort lexicographically within source
    // (the order front coding assumes); lcp = first mismatch position
    // against the predecessor via one transform+array_position probe —
    // O(len) map work, no quadratic comparisons; saved = Σ lcp.
    "q293_front_coding" -> { (s, d) =>
      val w = Window.partitionBy("source").orderBy("text")
      // lcp by UNROLLED binary lifting: 12 chained window comparisons
      // (4096 → 1) — each step extends the matched prefix by `step` when
      // the next window agrees. Windows memcmp in O(step) with no
      // per-character array materialization (the transform+array_position
      // form allocated one boolean per character and ran 3× slower at
      // sf0.1); the final clamp to min(len) absorbs the equal-prefix
      // overshoot. The chain lives in stacked withColumns so each step
      // references the previous ONCE — inlining it would blow the
      // expression tree up 3^12. The ladder covers lcp ≤ Σsteps = 8191
      // chars (fixture max doc length 577); longer corpora prepend
      // larger steps — one extra step per doubling.
      val steps = Seq(4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)
      val base = Tables.documents(s, d)
        .select(col("source"), col("text"))
        .withColumn("prev", lag(col("text"), 1).over(w))
        .withColumn("m", lit(0L))
      val lifted = steps.foldLeft(base) { (df, st) =>
        df.withColumn("m", expr(
          s"m + CASE WHEN prev IS NOT NULL AND" +
            s" substring(text, CAST(m + 1 AS INT), $st) =" +
            s" substring(prev, CAST(m + 1 AS INT), $st)" +
            s" THEN ${st}L ELSE 0L END"))
      }
      val lcp = lifted.withColumn("lcp", expr(
        "CASE WHEN prev IS NULL THEN 0L" +
          " ELSE least(m, CAST(least(length(text), length(prev)) AS BIGINT)) END"))
      lcp.groupBy("source").agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(length(col("text"))).cast("long").as("plain_chars"),
          sum(col("lcp")).cast("long").as("saved_chars"))
        .withColumn("saved_ppm",
          expr("CAST(saved_chars * 1000000 DIV plain_chars AS BIGINT)"))
        .orderBy("source")
    },

    // HILBERT vs Z-ORDER clustering audit — which space-filling curve
    // fragments a band predicate less (the liquid-clustering vs Z-order
    // question, measured): parts land on a 16×16 (size × price) grid,
    // each curve assigns every cell a storage position from a
    // PRECOMPUTED 256-entry lookup (the curve is an operator constant —
    // no bit-twiddling at query time), and for every single-row/column
    // band the fragment count = maximal runs of band cells in the
    // global occupied-cell curve order (exactly the row-group runs a
    // reader must open). Predecessor = max-d-below on the 256-cell
    // grid — a grid self-join, never a global window. E31/q141 audits
    // ONE ordering's zone-map quality; this ranks two orderings.
    "q294_curve_fragmentation" -> { (s, d) =>
      val hl = HilbertTable.mkString("array(", "L, ", "L)")
      val ml = MortonTable.mkString("array(", "L, ", "L)")
      val maxc = Tables.part(s, d)
        .agg(max(expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
          .as("maxc"))
      val cells = Tables.part(s, d)
        .crossJoin(broadcast(maxc))
        .select(
          expr("CAST((p_size - 1) * 16 DIV 50 AS INT)").as("bx"),
          expr("CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " * 16 DIV (maxc + 1) AS INT)").as("by"))
        .groupBy("bx", "by").agg(count(lit(1)).as("n_parts"))
        .withColumn("zd", expr(s"element_at($ml, bx * 16 + by + 1)"))
        .withColumn("hd", expr(s"element_at($hl, bx * 16 + by + 1)"))
      val curves = cells.sparkSession.range(0, 2)
        .select(when(col("id") === 0, "z").otherwise("hilbert").as("curve"))
      val pos = cells.crossJoin(broadcast(curves))
        .select(col("curve"), col("bx"), col("by"), col("n_parts"),
          when(col("curve") === "z", col("zd")).otherwise(col("hd")).as("dpos"))
      // global occupied-cell predecessor in curve order (grid self-join)
      val prev = pos.as("p").join(
          pos.select(col("curve").as("c2"), col("dpos").as("d2"),
            col("bx").as("px"), col("by").as("py")),
          col("c2") === col("curve") && col("d2") < col("dpos"), "left")
        .groupBy("curve", "bx", "by", "n_parts", "dpos")
        .agg(max(struct(col("d2"), col("px"), col("py"))).as("pc"))
        .select(col("curve"), col("bx"), col("by"), col("n_parts"),
          col("pc.px").as("px"), col("pc.py").as("py"))
      val axes = prev.sparkSession.range(0, 2)
        .select(when(col("id") === 0, "x").otherwise("y").as("axis"))
      prev.crossJoin(broadcast(axes))
        .select(col("curve"), col("axis"),
          when(col("axis") === "x", col("bx")).otherwise(col("by"))
            .cast("long").as("band"),
          col("n_parts"),
          // run start: no predecessor, or predecessor outside the band
          when(col("px").isNull, 1L)
            .when(col("axis") === "x" && col("px") =!= col("bx"), 1L)
            .when(col("axis") === "y" && col("py") =!= col("by"), 1L)
            .otherwise(0L).as("rs"))
        .groupBy("curve", "axis", "band")
        .agg(sum(col("n_parts")).cast("long").as("n_parts"),
          count(lit(1)).cast("long").as("n_cells"),
          sum(col("rs")).cast("long").as("n_fragments"))
        .orderBy("curve", "axis", "band")
    },

    // GREEDY shingle SET-COVER, 3 statically unrolled rounds — which
    // sources to ingest FIRST to cover the most distinct word-trigram
    // shingles (the
    // submodular data-selection primitive: greedy is the classic
    // (1−1/e)-approximation, and its round-by-round gain curve IS the
    // licensing/ingestion priority list). Each round picks the source
    // with the largest count of still-uncovered types (count desc,
    // source-name tiebreak — the mirrored two-step rule), removes its
    // types, repeats — unrolled like F11/q191's IPF passes, no driver
    // loop, one declarative plan. Gains are DISJOINT by construction so
    // the cumulative telescopes exactly (spec-asserted).
    "q295_greedy_set_cover" -> { (s, d) =>
      val st = Tables.documents(s, d)
        .select(col("source"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("source"),
          explode(TextAnalysis.shingleExpr("t", 3)).as("tok"))
        .distinct()
      val tot = st.agg(countDistinct(col("tok")).as("v_total"))
      def pick(rem: DataFrame) = rem.groupBy("source")
        .agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("source")).limit(1)
      val p1 = pick(st)
      val cov1 = st.join(broadcast(p1.select(col("source"))), "source")
        .select("tok").distinct()
      val rem2 = st.join(cov1, Seq("tok"), "left_anti")
      val p2 = pick(rem2)
      val cov2 = rem2.join(broadcast(p2.select(col("source"))), "source")
        .select("tok").distinct()
      val rem3 = rem2.join(cov2, Seq("tok"), "left_anti")
      val p3 = pick(rem3)
      val rounds = p1.select(lit(1L).as("round"), col("source"), col("gain"))
        .unionByName(p2.select(lit(2L).as("round"), col("source"), col("gain")))
        .unionByName(p3.select(lit(3L).as("round"), col("source"), col("gain")))
      // cumulative over the 3-row round grid via predecessor self-join
      val b = rounds.select(col("round").as("r2"), col("gain").as("g2"))
      rounds.join(broadcast(b), col("r2") <= col("round"))
        .groupBy("round", "source", "gain")
        .agg(sum(col("g2")).as("cum_covered"))
        .crossJoin(broadcast(tot))
        .select(col("round"), col("source"), col("gain").cast("long").as("gain"),
          col("cum_covered").cast("long").as("cum_covered"),
          expr("CAST(cum_covered * 1000000 DIV v_total AS BIGINT)").as("cum_ppm"))
        .orderBy("round")
    },

    // Historical VALUE-AT-RISK + EXPECTED SHORTFALL of daily order
    // revenue (the tail-risk pair: VaR = the p5 worst day, ES = the MEAN
    // of the worst 5% — ES is the coherent one, a single deep crash
    // moves ES but not VaR; E38-family quantiles read the middle of a
    // distribution, this reads its tail). k = ⌈0.05·n⌉ worst days; rank
    // by (revenue, day) total order via a predecessor-count self-join on
    // the bounded DAY grid — daily revenues are near-unique so the VALUE
    // grid trick does not apply, the day grid is the bounded structure
    // (the q216 rank rule). All cents exact.
    "q296_var_shortfall" -> { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
          .as("rev"))
      val b = daily.select(col("day").as("d2"), col("rev").as("r2"))
      val ranked = daily.join(b,
          col("r2") < col("rev") || (col("r2") === col("rev") && col("d2") < col("day")),
          "left")
        .groupBy("day", "rev").agg((count(col("d2")) + 1).as("rk"))
      val n = daily.agg(count(lit(1)).as("n_days"), sum(col("rev")).as("tot"))
      ranked.crossJoin(broadcast(n))
        .withColumn("k_tail", expr("(n_days + 19) DIV 20"))
        .filter(col("rk") <= col("k_tail"))
        .groupBy("n_days", "k_tail", "tot")
        .agg(max(col("rev")).as("var_cents"), sum(col("rev")).as("tail_sum"))
        .select(col("n_days").cast("long").as("n_days"),
          col("k_tail").cast("long").as("k_tail"),
          col("var_cents").cast("long").as("var_cents"),
          expr("CAST(tail_sum DIV k_tail AS BIGINT)").as("es_cents"),
          expr("CAST(tot DIV n_days AS BIGINT)").as("mean_cents"))
    },

    // CLUSTER JACKKNIFE of mean document length over sources — the
    // leave-one-SOURCE-out standard-error read (docs within a source are
    // correlated, so the i.i.d. SE of E13/q142's bootstrap-over-docs
    // understates; deleting whole clusters is the design-correct
    // resample). Every leave-one-out mean is an exact floor-ppm integer
    // (S−sᵢ)·10⁶ DIV (N−nᵢ); the spread is the exact g·Σθ² − (Σθ)²
    // numerator over the |sources| grid — NO floating point anywhere,
    // where a naive Σ(θᵢ−θ̄)² of doubles would be partial-aggregation-
    // order-dependent and engine-unstable.
    "q297_cluster_jackknife" -> { (s, d) =>
      val g = Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
      val tot = g.agg(count(lit(1)).as("gs"), sum(col("n")).as("nt"),
        sum(col("sc")).as("st"))
      val loo = g.crossJoin(broadcast(tot))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          expr("CAST(CAST(st - sc AS DECIMAL(38,0)) * 1000000" +
            " DIV (nt - n) AS BIGINT)").as("loo_mean_ppm"),
          col("gs"), expr("CAST(CAST(st AS DECIMAL(38,0)) * 1000000" +
            " DIV nt AS BIGINT)").as("mean_ppm"))
      val spread = loo.agg(count(lit(1)).as("g2"),
          sum(col("loo_mean_ppm")).as("sl"),
          sum(expr("loo_mean_ppm * CAST(loo_mean_ppm AS DECIMAL(38,0))")).as("sl2"))
        .select(expr("CAST(g2 * sl2 - CAST(sl AS DECIMAL(38,0)) * sl AS BIGINT)")
          .as("jk_var_num"))
      loo.crossJoin(broadcast(spread))
        .select(col("source"), col("n_docs"), col("loo_mean_ppm"),
          col("mean_ppm"), col("gs").cast("long").as("g_sources"),
          col("jk_var_num"))
        .orderBy("source")
    },

    // STYLOMETRIC fingerprint per source + nearest-style neighbor — the
    // authorship/provenance screen run when two "different" sources are
    // suspected to be one crawler in two coats (q174/q238 compare LENGTH
    // distributions; style is the orthogonal axis): five exact floor-ppm
    // features (mean word length, mean sentence length, punctuation /
    // digit / uppercase density), then the closest OTHER source by L1
    // distance on the feature vector — mirrored two-step argmin over the
    // \|sources\|² grid with name tiebreak. Character-class counts are
    // regexp_replace length differences (the q265 rule — no regex-count
    // dialect is load-bearing).
    "q301_stylometry" -> { (s, d) =>
      def classCount(cls: String) =
        length(col("text")) - length(regexp_replace(col("text"), lit(cls), lit("")))
      val f = Tables.documents(s, d).select(col("source"),
          length(col("text")).as("nc"),
          size(tokens(col("text"))).cast("long").as("nw"),
          (classCount("[.]") + lit(1L)).as("ns"),
          classCount("[.,;:!?]").as("np"),
          classCount("[0-9]").as("ndg"),
          classCount("[A-Z]").as("nup"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"), sum(col("nc")).as("snc"),
          sum(col("nw")).as("snw"), sum(col("ns")).as("sns"),
          sum(col("np")).as("snp"), sum(col("ndg")).as("sndg"),
          sum(col("nup")).as("snup"))
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          expr("CAST(snc * 1000000 DIV snw AS BIGINT)").as("wlen_ppm"),
          expr("CAST(snw * 1000000 DIV sns AS BIGINT)").as("slen_ppm"),
          expr("CAST(snp * 1000000 DIV snc AS BIGINT)").as("punct_ppm"),
          expr("CAST(sndg * 1000000 DIV snc AS BIGINT)").as("digit_ppm"),
          expr("CAST(snup * 1000000 DIV snc AS BIGINT)").as("upper_ppm"))
      val b = f.select(col("source").as("s2"), col("wlen_ppm").as("w2"),
        col("slen_ppm").as("l2"), col("punct_ppm").as("p2"),
        col("digit_ppm").as("d2"), col("upper_ppm").as("u2"))
      val pairs = f.join(broadcast(b), col("s2") =!= col("source"))
        .withColumn("l1", expr("ABS(wlen_ppm - w2) + ABS(slen_ppm - l2)" +
          " + ABS(punct_ppm - p2) + ABS(digit_ppm - d2) + ABS(upper_ppm - u2)"))
      val mn = pairs.groupBy(col("source").as("sm")).agg(min(col("l1")).as("ml"))
      val nn = pairs.join(broadcast(mn),
          col("sm") === col("source") && col("l1") === col("ml"))
        .groupBy(col("source").as("sn"))
        .agg(min(col("s2")).as("nn_source"), min(col("l1")).as("nn_l1"))
      f.join(nn, col("sn") === col("source"))
        .select(col("source"), col("n_docs"), col("wlen_ppm"), col("slen_ppm"),
          col("punct_ppm"), col("digit_ppm"), col("upper_ppm"),
          col("nn_source"), col("nn_l1").cast("long").as("nn_l1"))
        .orderBy("source")
    },

    // WILSON score interval per source for the share of English docs —
    // the proportion UNCERTAINTY band (E13/q142 bootstraps a mean;
    // Wilson is the closed-form interval that stays inside [0,1] and
    // behaves at small n where the naive ±z√(p̂q̂/n) band does not —
    // which is exactly the small-source regime a mix decision reads).
    // Inputs are the exact integers (k, n); the interval is ONE mirrored
    // IEEE assembly with z² = 3.8416 (z = 1.96) as a shared literal —
    // sqrt/division are the q207/q268-sanctioned IEEE steps; the
    // lo ≤ p̂ ≤ hi sandwich and [0,1] bounds are spec-asserted.
    "q302_wilson_bounds" -> { (s, d) =>
      val g = Tables.documents(s, d).groupBy("source").agg(
        count(lit(1)).as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("k"))
      val z2 = "3.8416D"
      def wilson(sign: String) =
        s"(CAST(k AS DOUBLE) / n + $z2 / (2 * CAST(n AS DOUBLE)) $sign" +
          s" SQRT($z2) * SQRT(CAST(k AS DOUBLE) / n * (1 - CAST(k AS DOUBLE) / n) / n" +
          s" + $z2 / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) /" +
          s" (1 + $z2 / CAST(n AS DOUBLE))"
      g.select(col("source"), col("n").cast("long").as("n_docs"),
          col("k").cast("long").as("n_en"),
          expr("CAST(k * 1000000 DIV n AS BIGINT)").as("p_ppm"),
          expr(wilson("-")).as("wilson_lo"),
          expr(wilson("+")).as("wilson_hi"))
        .orderBy("source")
    },

    // LEARNED-INDEX (RMI leaf) error bound per source — fit
    // rank ≈ a + b·key over the per-source (n_chars → cumulative rank)
    // grid and report max |residual|: the SEARCH-WINDOW radius a learned
    // index must binary-search after the model's guess, i.e. the ONE
    // number that decides whether a linear leaf beats a btree page
    // (E44/q134 fits a trend for its own sake; here the residual bound
    // IS the product). The residual maximum is computed on EXACT
    // integer numerators over the common denominator n·Sxx (no float
    // residuals — a one-ulp slip would move the max), |·| taken BEFORE
    // the floor-DIV so the division is sign-safe; a and b ride along as
    // the mirrored IEEE display pair.
    "q304_learned_index" -> { (s, d) =>
      val g = Tables.documents(s, d).groupBy("source", "n_chars")
        .agg(count(lit(1)).as("f"))
      val w = Window.partitionBy("source").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
      val pts = g.withColumn("rk", coalesce(sum(col("f")).over(w), lit(0L)) + 1)
        .select(col("source"), col("n_chars").as("x"), col("rk").as("y"))
      val sums = pts.groupBy("source").agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * CAST(x AS DECIMAL(38,0))")).as("sxx"),
        sum(expr("x * CAST(y AS DECIMAL(38,0))")).as("sxy"))
      val fitted = sums.select(col("source"), col("n"),
        expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy").as("bn"), // slope num
        expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx").as("bd"), // slope den
        col("sx"), col("sy"), col("sxx"), col("sxy"))
      pts.join(fitted, "source")
        // e_num = D·y − bn·x − (sy·sxx − sxy·sx) over D = n·bd... assembled
        // at the common denominator n·bd: n·bd·y − n·bn·x − (sy·bd − n... ):
        // simplest exact form: bd·(n·y − sy) − bn·(n·x − sx), denominator n·bd
        .withColumn("enum", expr(
          "bd * (n * CAST(y AS DECIMAL(38,0)) - sy) -" +
            " bn * (n * CAST(x AS DECIMAL(38,0)) - sx)"))
        .groupBy("source", "n", "bn", "bd", "sx", "sy")
        .agg(max(abs(col("enum"))).as("max_enum"))
        .select(col("source"), col("n").cast("long").as("n_keys"),
          expr("CAST(max_enum DIV (n * bd) AS BIGINT)").as("max_abs_err_rows"),
          expr("CAST(bn AS DOUBLE) / CAST(bd AS DOUBLE)").as("slope"),
          expr("(CAST(sy AS DOUBLE) - CAST(bn AS DOUBLE) / CAST(bd AS DOUBLE)" +
            " * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)").as("intercept"))
        .orderBy("source")
    },

    // ROARING-bitmap CONTAINER planner — for each source's doc_id set,
    // classify every container the way a roaring build does: array
    // (2 bytes/key) vs bitmap (fixed width/8 bytes) vs run-length
    // (4 bytes/run + header), pick the cheapest with the array < run <
    // bitmap tie precedence. Containers are 2¹² keys wide here (vs
    // roaring's 2¹⁶) so the fixture exercises MANY containers — the
    // classifier thresholds scale with the width (bitmap = 2¹²/8 = 512
    // bytes) and the mechanics are identical. The runs count is a per-(source, container)
    // lag() over sorted keys (gap ⟹ new run) — the bitmap-index sizing
    // twin of F91/q270's column-encoding advisor, and the statistic that
    // decides whether a posting-list index is even affordable.
    "q305_roaring_planner" -> { (s, d) =>
      val w = Window.partitionBy("source", "container").orderBy("doc_id")
      val keys = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          expr("doc_id DIV 4096").as("container"))
        .withColumn("prev", lag(col("doc_id"), 1).over(w))
        .withColumn("nr",
          when(col("prev").isNull || col("prev") =!= col("doc_id") - 1, 1L)
            .otherwise(0L))
      keys.groupBy("source", "container")
        .agg(count(lit(1)).as("n_keys"), sum(col("nr")).as("n_runs"))
        .select(col("source"), col("container").cast("long").as("container"),
          col("n_keys").cast("long").as("n_keys"),
          col("n_runs").cast("long").as("n_runs"),
          (col("n_keys") * 2).cast("long").as("bytes_array"),
          lit(512L).as("bytes_bitmap"),
          (lit(4L) + col("n_runs") * 4).cast("long").as("bytes_run"))
        .withColumn("best", expr("CASE" +
          " WHEN n_keys * 2 <= 4 + n_runs * 4 AND n_keys * 2 <= 512 THEN 'array'" +
          " WHEN 4 + n_runs * 4 <= 512 THEN 'run'" +
          " ELSE 'bitmap' END"))
        .orderBy("source", "container")
    },

    // PRICE-VOLUME-MIX decomposition of 1995 → 1996 order revenue per
    // market segment (the Laspeyres "why did revenue move" BI triplet:
    // volume effect Δn·r₀ + rate effect n₀·Δr + cross Δn·Δr, which
    // CONSERVES exactly — Δrev = vol + rate + cross as an algebraic
    // identity at the common denominator n₀·n₁, spec-asserted with NO
    // tolerance). Effects emitted as exact NUMERATORS at that
    // denominator (signed, so no floor-DIV is taken anywhere).
    // Numerators are DECIMAL(38,0)/HUGEINT: r·n·n tops ~10²¹ at sf10
    // (the sf10 gate caught the int64 cut overflowing — the q397
    // class), and 38 digits hold to ~sf10⁴. NO float legs: the round-9
    // driver gate flagged the decimal→double convenience columns
    // (environment-dependent at >2⁵³ magnitudes), and num/(n₀·n₁) is
    // derivable from the exact sufficient statistics emitted here — the
    // corpus-wide floor-ppm convention, restored.
    "q306_pvm_decomposition" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .select(col("c_mktsegment"), year(col("o_orderdate")).as("yr"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " DIV 100").as("rev_d"))
      val g = o.groupBy("c_mktsegment").agg(
        sum(when(col("yr") === 1995, 1L).otherwise(0L)).as("n0"),
        sum(when(col("yr") === 1995, col("rev_d")).otherwise(0L)).as("r0"),
        sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n1"),
        sum(when(col("yr") === 1996, col("rev_d")).otherwise(0L)).as("r1"))
      g.select(col("c_mktsegment"),
          col("n0").cast("long").as("n0"), col("r0").cast("long").as("rev0_d"),
          col("n1").cast("long").as("n1"), col("r1").cast("long").as("rev1_d"),
          // Numerators emitted as DIGIT STRINGS (round-10 VERDICT #1):
          // q306 was the only query whose schema carried DECIMAL(38,0),
          // and two rounds of driver hash-red localized to the harness's
          // decimal128 canonicalization — value-level replays are exact
          // at 4 SFs. The arithmetic below is UNCHANGED (still exact
          // DECIMAL(38,0)); only the emitted representation moves to the
          // canonicalization-free STRING, matching CAST(... AS VARCHAR)
          // in the DuckDB oracle digit for digit.
          expr("CAST(CAST(CAST(n1 - n0 AS DECIMAL(38,0)) * r0 * n1" +
            " AS DECIMAL(38,0)) AS STRING)").as("vol_num"),
          expr("CAST(CAST(CAST(n0 AS DECIMAL(38,0)) * (CAST(r1 AS DECIMAL(38,0))" +
            " * n0 - CAST(r0 AS DECIMAL(38,0)) * n1) AS DECIMAL(38,0)) AS STRING)")
            .as("rate_num"),
          expr("CAST(CAST(CAST(n1 - n0 AS DECIMAL(38,0)) * (CAST(r1 AS" +
            " DECIMAL(38,0)) * n0 - CAST(r0 AS DECIMAL(38,0)) * n1)" +
            " AS DECIMAL(38,0)) AS STRING)").as("cross_num"),
          expr("CAST(CAST(CAST(r1 - r0 AS DECIMAL(38,0)) * n0 * n1" +
            " AS DECIMAL(38,0)) AS STRING)").as("total_num"))
        .orderBy("c_mktsegment")
    },

    // EXACT SHAPLEY attribution over the 3-channel touch lattice — the
    // game-theoretic split of conversion credit (E:q122 last-touch and
    // q154 position rules are CONVENTIONS; Shapley is the unique
    // axiomatic one, and with k = 3 channels it is EXACT grid
    // arithmetic, no sampling): a converting user's coalition = the set
    // of {view, click, signup} touched before the first purchase;
    // v(S) = conversions whose coalition ⊆ S (8-row mask lattice);
    // φ_c·6 = Σ_{S∌c} w(|S|)·[v(S∪c) − v(S)] with the exact 3-player
    // weights (2,1,2)/6 — every quantity an integer at denominator 6,
    // and the EFFICIENCY axiom Σφ = v(full) holds with no tolerance
    // (spec-asserted). All post-reduction work on the 8×8 lattice.
    "q307_shapley_attribution" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val firstP = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("pts"))
      // one mask per CONVERTER: 0 when nothing attributable preceded the
      // first purchase (no prior events, or only non-channel ones)
      val userMask = firstP.join(
          ev.join(firstP.select(col("user_id"), col("pts")), "user_id")
            .filter(col("ts") < col("pts"))
            .groupBy("user_id").agg(
              (max(when(col("event_type") === "view", 1L).otherwise(0L)) +
                max(when(col("event_type") === "click", 2L).otherwise(0L)) +
                max(when(col("event_type") === "signup", 4L).otherwise(0L)))
                .as("mask0"))
            .select(col("user_id"), col("mask0")), Seq("user_id"), "left")
        .select(coalesce(col("mask0"), lit(0L)).as("mask"))
      // mask-0 converters leave the game (credit cannot be assigned to
      // absent channels — and v(∅) must be 0 for efficiency to bind);
      // they ride along as n_no_touch, conserved in the spec
      val noTouch = userMask.filter(col("mask") === 0)
        .agg(count(lit(1)).as("n_no_touch"))
      val nT = userMask.filter(col("mask") > 0)
        .groupBy("mask").agg(count(lit(1)).as("n"))
      val lattice = nT.sparkSession.range(0, 8).select(col("id").cast("long").as("s8"))
      val vS = lattice.join(broadcast(nT),
          expr("CAST(mask AS INT) & CAST(s8 AS INT) = CAST(mask AS INT)"), "left")
        .groupBy("s8").agg(coalesce(sum(col("n")), lit(0L)).as("v"))
      val chans = vS.sparkSession.range(0, 3)
        .select(expr("CAST(shiftleft(1L, CAST(id AS INT)) AS BIGINT)").as("cbit"),
          expr("CASE id WHEN 0 THEN \'view\' WHEN 1 THEN \'click\'" +
            " ELSE \'signup\' END").as("channel"))
      val terms = chans.join(broadcast(vS.select(col("s8"), col("v"))),
          expr("CAST(s8 AS INT) & CAST(cbit AS INT) = 0"))
        .join(broadcast(vS.select(col("s8").as("su"), col("v").as("vu"))),
          expr("CAST(su AS INT) = CAST(s8 AS INT) | CAST(cbit AS INT)"))
        .withColumn("w", expr("CASE bit_count(s8) WHEN 0 THEN 2L" +
          " WHEN 1 THEN 1L ELSE 2L END"))
        .groupBy("channel")
        .agg(sum(col("w") * (col("vu") - col("v"))).as("phi6"))
      val full = vS.filter(col("s8") === 7).select(col("v").as("v_full"))
      terms.crossJoin(broadcast(full)).crossJoin(broadcast(noTouch))
        .select(col("channel"), col("phi6").cast("long").as("phi6"),
          col("v_full").cast("long").as("v_full"),
          col("n_no_touch").cast("long").as("n_no_touch"),
          expr("CAST(phi6 * 1000000 DIV (6 * v_full) AS BIGINT)").as("share_ppm"))
        .orderBy("channel")
    },

    // Cohort LTV ACCUMULATION curve — cumulative revenue per signup-
    // cohort month at ages 0..5 months (D5l/q72 counts RETENTION; LTV
    // weighs it in dollars, and the cohort-age grid read "how much is a
    // month-m customer worth by age a" is what an acquisition budget
    // divides by). Cohort = the customer's first-order month index,
    // ages beyond 5 truncated (the curve's documented horizon), first-
    // year cohorts only so the grid is bounded and every cohort has a
    // full horizon. Cumulative = a ≤-join on the 6-row age grid;
    // monotonicity spec-asserted.
    "q308_cohort_ltv" -> { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 100")
          .as("rev_d"))
      val first = o.groupBy("o_custkey").agg(min(col("m")).as("m0"))
      val base = first.agg(min(col("m0")).as("mb"))
      val aged = o.join(first, "o_custkey").crossJoin(broadcast(base))
        .filter(col("m0") < col("mb") + 12)
        .withColumn("cohort", col("m0") - col("mb"))
        .withColumn("age", col("m") - col("m0"))
        .filter(col("age") <= 5)
      val cells = aged.groupBy("cohort", "age")
        .agg(sum(col("rev_d")).as("rev_d"), count(lit(1)).as("n_orders"))
      val sizes = aged.select("cohort", "o_custkey").distinct()
        .groupBy("cohort").agg(count(lit(1)).as("n_customers"))
      val ages = cells.sparkSession.range(0, 6).select(col("id").cast("long").as("a2"))
      cells.crossJoin(broadcast(ages)).filter(col("age") <= col("a2"))
        .groupBy("cohort", "a2")
        .agg(sum(col("rev_d")).as("cum_rev_d"), sum(col("n_orders")).as("cum_orders"))
        .join(broadcast(sizes), "cohort")
        .select(col("cohort").cast("long").as("cohort"), col("a2").as("age"),
          col("n_customers").cast("long").as("n_customers"),
          col("cum_orders").cast("long").as("cum_orders"),
          col("cum_rev_d").cast("long").as("cum_rev_d"),
          expr("CAST(cum_rev_d * 100 DIV n_customers AS BIGINT)")
            .as("ltv_cents_per_cust"))
        .orderBy("cohort", "age")
    },

    // TRENDING-TERMS drift — top-10 token lists of the first vs second
    // doc_id half, compared by set Jaccard and summed rank displacement
    // (the "what changed in the feed" monitoring read next to F66/q245's
    // distribution-level TVD: TVD says THAT the mix moved, this names
    // WHICH head terms moved and by how many places). Both top-10s are
    // TakeOrdered under the (count desc, token) total order; ranks via
    // predecessor-count self-joins on the two 10-row grids; a term
    // absent from the other list displaces to the clamp rank 11.
    "q309_trending_terms" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val mid = docs.agg(((min(col("doc_id")) + max(col("doc_id"))) / 2)
        .cast("long").as("mid"))
      val tok = docs.crossJoin(broadcast(mid))
        .select((col("doc_id") <= col("mid")).as("h1"),
          explode(tokens(col("text"))).as("tok"))
      def top(h: Boolean) = {
        val t = tok.filter(col("h1") === h).groupBy("tok")
          .agg(count(lit(1)).as("c")).orderBy(col("c").desc, col("tok")).limit(10)
        val b = t.select(col("tok").as("t2"), col("c").as("c2"))
        t.join(broadcast(b),
            col("c2") > col("c") || (col("c2") === col("c") && col("t2") < col("tok")),
            "left")
          .groupBy("tok", "c").agg((count(col("t2")) + 1).as("rk"))
      }
      val t1 = top(true).select(col("tok"), col("rk").as("rk1"), col("c").as("c1"))
      val t2 = top(false).select(col("tok"), col("rk").as("rk2"), col("c").as("c2"))
      t1.join(t2, Seq("tok"), "full_outer")
        .select(col("tok"),
          coalesce(col("rk1"), lit(11L)).cast("long").as("rank_h1"),
          coalesce(col("rk2"), lit(11L)).cast("long").as("rank_h2"),
          coalesce(col("c1"), lit(0L)).cast("long").as("count_h1"),
          coalesce(col("c2"), lit(0L)).cast("long").as("count_h2"))
        .withColumn("displacement", abs(col("rank_h1") - col("rank_h2")))
        .orderBy("tok")
    },

    // MULTIBYTE-density audit per source — UTF-8 bytes vs characters
    // (the storage/tokenizer-budget gap ASCII-centric estimates miss: a
    // CJK corpus is 3× the bytes its char count suggests, and byte-level
    // BPE pays exactly that ratio). octet_length vs length per doc,
    // floor-ppm overhead on the source grid; the ASCII fixture's zero
    // rows are measured facts (q158 rule), and the spec proves the
    // detector fires on injected multibyte text.
    "q310_multibyte_audit" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), length(col("text")).as("nc"),
          octet_length(col("text")).as("nb"))
        .groupBy("source").agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("nc")).cast("long").as("n_chars"),
          sum(col("nb")).cast("long").as("n_bytes"),
          sum(when(col("nb") > col("nc"), 1L).otherwise(0L)).cast("long")
            .as("docs_multibyte"))
        .withColumn("overhead_ppm",
          expr("CAST((n_bytes - n_chars) * 1000000 DIV n_chars AS BIGINT)"))
        .orderBy("source")
    },

    // FRESHNESS dashboard per event type — staleness of each stream
    // behind the global high-water mark, plus arrival-rate context (the
    // ops table a pipeline on-call reads first; F83/q262 sizes the
    // watermark DELAY, this reads which feed has gone QUIET): last-event
    // lag in seconds (exact µs integer arithmetic), events in the final
    // 24h window, and the mean inter-arrival gap over the whole stream.
    "q311_freshness" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("tu"))
      val hwm = ev.agg(max(col("tu")).as("hw"))
      ev.crossJoin(broadcast(hwm))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_events"),
          max(col("tu")).as("last_tu"), min(col("tu")).as("first_tu"),
          max(col("hw")).as("hw"),
          sum(when(col("tu") >= col("hw") - lit(86400000000L), 1L)
            .otherwise(0L)).cast("long").as("n_last_24h"))
        .select(col("event_type"), col("n_events"),
          expr("CAST((hw - last_tu) DIV 1000000 AS BIGINT)").as("staleness_s"),
          col("n_last_24h"),
          expr("CASE WHEN n_events > 1 THEN" +
            " CAST((last_tu - first_tu) DIV (1000000 * (n_events - 1)) AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("mean_gap_s"))
        .orderBy("event_type")
    },

    // SKEW-SALT advisor — the shuffle-planning table behind E:q121's
    // salted join and AQE's skew splitting, emitted BEFORE any join
    // runs: the top-5 hottest part keys by lineitem rows, each with its
    // corpus share and the salt factor k = ⌈rows / target⌉ that brings
    // the key under the average-partition target (total DIV 32 — the
    // session's shuffle parallelism), plus the post-salt residual
    // share. q89 AUDITS skew after the fact; this PRESCRIBES the fix.
    // Top-5 = TakeOrdered + predecessor-count rank (never a global
    // window); all arithmetic exact positive integers.
    "q315_salt_advisor" -> { (s, d) =>
      val cnt = Tables.lineitem(s, d).groupBy("l_partkey")
        .agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
      val top5 = cnt.orderBy(col("n").desc, col("l_partkey")).limit(5)
      top5.crossJoin(broadcast(tot))
        .withColumn("target_rows", expr("CAST(total DIV 32 AS BIGINT)"))
        .select(col("l_partkey").cast("long").as("partkey"),
          col("n").cast("long").as("n_rows"),
          expr("CAST(n * 1000000 DIV total AS BIGINT)").as("share_ppm"),
          col("target_rows"),
          expr("CAST(CASE WHEN n <= total DIV 32 THEN 1" +
            " ELSE (n + total DIV 32 - 1) DIV (total DIV 32) END AS BIGINT)")
            .as("salt_k"),
          expr("CAST((n DIV CASE WHEN n <= total DIV 32 THEN 1" +
            " ELSE (n + total DIV 32 - 1) DIV (total DIV 32) END)" +
            " * 1000000 DIV total AS BIGINT)").as("post_salt_share_ppm"))
        .orderBy(col("n_rows").desc, col("partkey"))
    },

    // Dedup-tier LADDER — one table pricing three NESTED dedup passes
    // before any of them runs: tier 1 byte-exact (md5 of the raw text),
    // tier 2 normalization-insensitive (q182's strip-and-collapse rule),
    // tier 3 ORDER-insensitive (md5 of the sorted token bag of the
    // normalized text — catches shuffled boilerplate that every
    // position-sensitive tier misses). The nesting is BY CONSTRUCTION
    // (equal text ⟹ equal normalization ⟹ equal sorted bag), so dup
    // mass is monotone up the ladder — spec-asserted, and the
    // tier-over-tier DELTA prices each pass separately (the q229
    // histogram sizes ONE tier's groups; this ranks the tiers). Savings
    // use the keep-min-doc_id survivor convention (q14's rule): saved
    // chars = total minus each group's representative.
    "q316_dedup_ladder" -> { (s, d) =>
      val f = Tables.documents(s, d).select(col("doc_id"),
        length(col("text")).as("nc"),
        md5(col("text")).as("t1"),
        md5(trim(regexp_replace(
          regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), " +", " "))).as("t2"),
        md5(expr("concat_ws(' ', sort_array(split(trim(regexp_replace(" +
          "regexp_replace(text, '[^A-Za-z0-9 ]', ''), ' +', ' ')), ' ')))"))
          .as("t3"))
      def tier(n: Int, c: String) = f.groupBy(col(c).as("fp"))
        .agg(count(lit(1)).as("cnt"), sum(col("nc")).as("sc"),
          min(struct(col("doc_id"), col("nc"))).as("rep"))
        .agg(lit(n.toLong).as("tier"), count(lit(1)).as("ndv"),
          sum(col("cnt") - 1).as("dup_docs"),
          sum(col("sc") - col("rep.nc")).as("saved_chars"),
          sum(col("cnt")).as("n_docs"), sum(col("sc")).as("n_chars"))
      tier(1, "t1").unionByName(tier(2, "t2")).unionByName(tier(3, "t3"))
        .select(col("tier"), col("ndv").cast("long").as("ndv"),
          col("dup_docs").cast("long").as("dup_docs"),
          col("saved_chars").cast("long").as("saved_chars"),
          expr("CAST(dup_docs * 1000000 DIV n_docs AS BIGINT)").as("dup_ppm"),
          expr("CAST(saved_chars * 1000000 DIV n_chars AS BIGINT)").as("saved_ppm"))
        .orderBy("tier")
    }
  )

  def oracle: Map[String, String] = Map(
    "q483_drf_allocation" ->
      """WITH c AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars,
        |    CAST(COUNT(*) AS BIGINT) AS docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(chars) AS BIGINT) AS cc,
        |    CAST(SUM(docs) AS BIGINT) AS cd FROM c),
        |g AS (
        |  SELECT source, chars, docs, cc, cd,
        |    GREATEST(CAST(chars AS HUGEINT) * cd,
        |      CAST(docs AS HUGEINT) * cc) AS mi
        |  FROM c CROSS JOIN t),
        |g2 AS (
        |  SELECT *,
        |    (CAST(chars AS HUGEINT) * cc * cd + mi - 1) // mi AS cons_chars,
        |    (CAST(docs AS HUGEINT) * cc * cd + mi - 1) // mi AS cons_docs
        |  FROM g),
        |alpha AS (
        |  SELECT LEAST(
        |    (CAST(MAX(cc) AS HUGEINT) * 1000000) // SUM(cons_chars),
        |    (CAST(MAX(cd) AS HUGEINT) * 1000000) // SUM(cons_docs))
        |    AS alpha_ppm
        |  FROM g2)
        |SELECT source, chars, docs,
        |  CASE WHEN CAST(chars AS HUGEINT) * cd >= CAST(docs AS HUGEINT) * cc
        |    THEN 'chars' ELSE 'docs' END AS dominant,
        |  CAST((mi * 1000000) // (CAST(cc AS HUGEINT) * cd) AS BIGINT)
        |    AS domshare_ppm,
        |  CAST((alpha_ppm * cc * cd) // mi AS BIGINT) AS drf_ppm
        |FROM g2 CROSS JOIN alpha ORDER BY source""".stripMargin,
    "q264_quota_apportionment" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
         |t AS (SELECT SUM(n) AS nt FROM c),
         |q AS (SELECT source, n,
         |        CAST($EvalBudget * n // nt AS BIGINT) AS floor_alloc,
         |        CAST($EvalBudget * n % nt AS BIGINT) AS rem_num FROM c, t),
         |k AS (SELECT $EvalBudget - SUM(floor_alloc) AS k FROM q),
         |r AS (SELECT q.source, q.n, q.floor_alloc, q.rem_num,
         |        (SELECT COUNT(*) FROM q q2 WHERE q2.rem_num > q.rem_num
         |           OR (q2.rem_num = q.rem_num AND q2.source < q.source)) AS rnk
         |      FROM q)
         |SELECT source, CAST(n AS BIGINT) AS n_docs, floor_alloc, rem_num,
         |  CAST(floor_alloc + CASE WHEN rnk < k THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM r, k ORDER BY source""".stripMargin,

    "q265_encoding_residue" ->
      """WITH p AS (
        |  SELECT source, length(text) AS nc,
        |    length(text) - length(replace(text, chr(65533), '')) AS n_repl,
        |    length(text) - length(regexp_replace(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS n_ctrl
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nc) AS BIGINT) AS n_chars,
        |  CAST(SUM(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_repl,
        |  CAST(SUM(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_ctrl,
        |  CAST(SUM(n_repl) AS BIGINT) AS repl_chars,
        |  CAST(SUM(n_ctrl) AS BIGINT) AS ctrl_chars,
        |  CAST(SUM(n_repl) * 1000000 // SUM(nc) AS BIGINT) AS repl_ppm,
        |  CAST(SUM(n_ctrl) * 1000000 // SUM(nc) AS BIGINT) AS ctrl_ppm
        |FROM p GROUP BY source ORDER BY source""".stripMargin,

    "q266_chao1_richness" ->
      """WITH tf AS (
        |  SELECT lang, tok, COUNT(*) AS f FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |g AS (SELECT lang, COUNT(*) AS v_types, SUM(f) AS n_tokens,
        |        SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS f1,
        |        SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS f2
        |      FROM tf GROUP BY 1)
        |SELECT lang, CAST(v_types AS BIGINT) AS v_types,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
        |  CAST(v_types + CAST(f1 AS HUGEINT) * (f1 - 1)
        |    // (2 * (f2 + 1)) AS BIGINT) AS chao1_est,
        |  CAST(f1 * 1000000 // n_tokens AS BIGINT) AS gt_unseen_ppm
        |FROM g ORDER BY lang""".stripMargin,

    "q267_ols_two_feature" ->
      """WITH q AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 100 AS y,
        |    CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x2
        |  FROM lineitem),
        |a AS (SELECT COUNT(*) AS n, SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
        |    SUM(x1 * x1) AS sx11, SUM(x1 * x2) AS sx12, SUM(x2 * x2) AS sx22,
        |    SUM(x1 * y) AS sx1y, SUM(x2 * y) AS sx2y FROM q),
        |s AS (SELECT CAST(n AS BIGINT) AS n,
        |    CAST(n * CAST(sx11 AS HUGEINT) - CAST(sx1 AS HUGEINT) * sx1 AS BIGINT) AS s11,
        |    CAST(n * CAST(sx12 AS HUGEINT) - CAST(sx1 AS HUGEINT) * sx2 AS BIGINT) AS s12,
        |    CAST(n * CAST(sx22 AS HUGEINT) - CAST(sx2 AS HUGEINT) * sx2 AS BIGINT) AS s22,
        |    CAST(n * CAST(sx1y AS HUGEINT) - CAST(sx1 AS HUGEINT) * sy AS BIGINT) AS s1y,
        |    CAST(n * CAST(sx2y AS HUGEINT) - CAST(sx2 AS HUGEINT) * sy AS BIGINT) AS s2y
        |  FROM a)
        |SELECT n, s11, s12, s22, s1y, s2y,
        |  (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) -
        |   CAST(s2y AS DOUBLE) * CAST(s12 AS DOUBLE)) /
        |  (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) -
        |   CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE)) AS b1,
        |  (CAST(s2y AS DOUBLE) * CAST(s11 AS DOUBLE) -
        |   CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE)) /
        |  (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) -
        |   CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE)) AS b2
        |FROM s""".stripMargin,

    "q268_hellinger_affinity" ->
      """WITH sl AS (SELECT source, lang, COUNT(*) AS nsl FROM documents GROUP BY 1, 2),
        |st AS (SELECT source, SUM(nsl) AS ns FROM sl GROUP BY 1),
        |gl AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY 1),
        |t AS (SELECT COUNT(*) AS nt FROM documents),
        |terms AS (
        |  SELECT sl.source,
        |    CAST(FLOOR(SQRT(CAST((nsl * 1000000 // ns) * (nl * 1000000 // nt)
        |      AS DOUBLE))) AS BIGINT) AS bq
        |  FROM sl JOIN st USING (source) JOIN gl USING (lang) CROSS JOIN t)
        |SELECT source, CAST(SUM(bq) AS BIGINT) AS bc_micro,
        |  CAST(1000000 - SUM(bq) AS BIGINT) AS h2_micro
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    "q269_ndcg_at_10" -> {
      val disc = NdcgW.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }
        .mkString(" ", " ", " END")
      s"""WITH t10 AS (
         |  SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk
         |  FROM documents QUALIFY rnk <= 10),
         |r AS (
         |  SELECT lang, doc_id, rnk,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS rel
         |  FROM t10),
         |bi AS (
         |  SELECT lang, rel, rnk,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rel DESC, doc_id) AS irnk
         |  FROM r)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rated,
         |  CAST(SUM(rel * CASE rnk$disc) AS BIGINT) AS dcg_micro,
         |  CAST(SUM(rel * CASE irnk$disc) AS BIGINT) AS idcg_micro,
         |  CAST(CASE WHEN SUM(rel * CASE irnk$disc) > 0
         |    THEN SUM(rel * CASE rnk$disc) * 1000000 // SUM(rel * CASE irnk$disc)
         |    ELSE 1000000 END AS BIGINT) AS ndcg_ppm
         |FROM bi GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q270_encoding_advisor" ->
      """WITH r AS (
        |  SELECT source, lang,
        |    CASE WHEN LAG(lang) OVER (PARTITION BY source ORDER BY doc_id)
        |      IS DISTINCT FROM lang THEN 1 ELSE 0 END AS chg
        |  FROM documents),
        |g AS (SELECT source, COUNT(*) AS n_rows, SUM(chg) AS n_runs,
        |    COUNT(DISTINCT lang) AS ndv, SUM(length(lang)) AS plain_chars
        |  FROM r GROUP BY 1),
        |bb AS (SELECT CAST(i.i AS BIGINT) AS b
        |       FROM UNNEST(generate_series(0, 31)) i(i)),
        |w AS (SELECT g.source, g.n_rows, g.n_runs, g.ndv, g.plain_chars,
        |    MIN(bb.b) AS dict_bits
        |  FROM g JOIN bb ON (CAST(1 AS BIGINT) << CAST(bb.b AS INT)) >= g.ndv
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_runs AS BIGINT) AS n_runs, CAST(ndv AS BIGINT) AS ndv,
        |  CAST(plain_chars AS BIGINT) AS plain_chars,
        |  CAST(dict_bits AS BIGINT) AS dict_bits,
        |  CAST(n_runs * 1000000 // n_rows AS BIGINT) AS rle_ratio_ppm
        |FROM w ORDER BY source""".stripMargin,

    "q271_capture_recapture" ->
      """WITH fp AS (
        |  SELECT doc_id % 2 = 0 AS even,
        |    unnest(string_split(text, ' ')) AS fp
        |  FROM documents),
        |caps AS (SELECT fp, MAX(CASE WHEN even THEN 1 ELSE 0 END) AS in_a,
        |    MAX(CASE WHEN NOT even THEN 1 ELSE 0 END) AS in_b
        |  FROM fp GROUP BY 1),
        |a AS (SELECT SUM(in_a) AS n_a, SUM(in_b) AS n_b,
        |    SUM(in_a * in_b) AS m_both, COUNT(*) AS exact_v FROM caps)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(m_both AS BIGINT) AS m_both,
        |  CAST(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) // (m_both + 1) - 1 AS BIGINT)
        |    AS est_chapman,
        |  CAST(exact_v AS BIGINT) AS exact_v,
        |  CAST(ABS(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) // (m_both + 1) - 1
        |    - exact_v) * 1000000 // exact_v AS BIGINT) AS abs_err_ppm,
        |  CAST(SIGN(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) // (m_both + 1) - 1
        |    - exact_v) AS BIGINT) AS bias_sign
        |FROM a""".stripMargin,

    "q272_corr_matrix" -> {
      def r(x: String, y: String) =
        s"""(CAST(n AS DOUBLE) * CAST(s_$x$y AS DOUBLE) -
           |   CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE)) /
           |  SQRT((CAST(n AS DOUBLE) * CAST(s_$x$x AS DOUBLE) -
           |   CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE)) *
           |   (CAST(n AS DOUBLE) * CAST(s_$y$y AS DOUBLE) -
           |   CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE)))""".stripMargin
      s"""WITH q AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS a,
         |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 100 AS b,
         |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS c,
         |    CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS e
         |  FROM lineitem),
         |m AS (SELECT COUNT(*) AS n,
         |    SUM(a) AS s_a, SUM(a * a) AS s_aa, SUM(b) AS s_b, SUM(b * b) AS s_bb,
         |    SUM(c) AS s_c, SUM(c * c) AS s_cc, SUM(e) AS s_e, SUM(e * e) AS s_ee,
         |    SUM(a * b) AS s_ab, SUM(a * c) AS s_ac, SUM(a * e) AS s_ae,
         |    SUM(b * c) AS s_bc, SUM(b * e) AS s_be, SUM(c * e) AS s_ce
         |  FROM q)
         |SELECT CAST(n AS BIGINT) AS n,
         |  ${r("a", "b")} AS r_qty_price,
         |  ${r("a", "c")} AS r_qty_disc,
         |  ${r("a", "e")} AS r_qty_tax,
         |  ${r("b", "c")} AS r_price_disc,
         |  ${r("b", "e")} AS r_price_tax,
         |  ${r("c", "e")} AS r_disc_tax
         |FROM m""".stripMargin
    },

    "q273_did_promo" ->
      """WITH li AS (
        |  SELECT p.p_type LIKE 'PROMO%' AS treated,
        |    EXTRACT(YEAR FROM o.o_orderdate) >= 1996 AS post,
        |    CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |      CAST(1 - l.l_discount AS DECIMAL(4,2)) * 10000 AS BIGINT) AS rev_u
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |a AS (SELECT
        |    SUM(CASE WHEN treated AND post THEN 1 ELSE 0 END) AS n_t1,
        |    SUM(CASE WHEN treated AND post THEN rev_u ELSE 0 END) AS s_t1,
        |    SUM(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END) AS n_t0,
        |    SUM(CASE WHEN treated AND NOT post THEN rev_u ELSE 0 END) AS s_t0,
        |    SUM(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END) AS n_c1,
        |    SUM(CASE WHEN NOT treated AND post THEN rev_u ELSE 0 END) AS s_c1,
        |    SUM(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END) AS n_c0,
        |    SUM(CASE WHEN NOT treated AND NOT post THEN rev_u ELSE 0 END) AS s_c0
        |  FROM li)
        |SELECT CAST(n_t1 AS BIGINT) AS n_t1, CAST(s_t1 AS BIGINT) AS s_t1,
        |  CAST(n_t0 AS BIGINT) AS n_t0, CAST(s_t0 AS BIGINT) AS s_t0,
        |  CAST(n_c1 AS BIGINT) AS n_c1, CAST(s_c1 AS BIGINT) AS s_c1,
        |  CAST(n_c0 AS BIGINT) AS n_c0, CAST(s_c0 AS BIGINT) AS s_c0,
        |  CAST(s_t1 // n_t1 AS BIGINT) AS mean_t1_u,
        |  CAST(s_t0 // n_t0 AS BIGINT) AS mean_t0_u,
        |  CAST(s_c1 // n_c1 AS BIGINT) AS mean_c1_u,
        |  CAST(s_c0 // n_c0 AS BIGINT) AS mean_c0_u,
        |  (CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE) -
        |   CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE)) -
        |  (CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE) -
        |   CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE)) AS did_u
        |FROM a""".stripMargin,

    "q274_reshard_audit" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h,
        |    list_transform(range(0, 17), j ->
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |        CAST(j AS VARCHAR)), 1, 8))::BIGINT) AS v17
        |  FROM documents),
        |m AS (
        |  SELECT h % 16 <> h % 17 AS moved_mod,
        |    list_position(v17[1:16], list_max(v17[1:16])) <>
        |      list_position(v17, list_max(v17)) AS moved_hrw
        |  FROM v)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN moved_mod THEN 1 ELSE 0 END) AS BIGINT) AS moved_mod,
        |  CAST(SUM(CASE WHEN moved_hrw THEN 1 ELSE 0 END) AS BIGINT) AS moved_hrw,
        |  CAST(SUM(CASE WHEN moved_mod THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS mod_ppm,
        |  CAST(SUM(CASE WHEN moved_hrw THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS hrw_ppm
        |FROM m""".stripMargin,

    "q275_t_closeness" ->
      """WITH j AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
        |    c.c_mktsegment, c.c_nationkey
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |cls AS (SELECT yr, c_mktsegment, c_nationkey, COUNT(*) AS c
        |  FROM j GROUP BY 1, 2, 3),
        |ct AS (SELECT yr, c_mktsegment, SUM(c) AS nc FROM cls GROUP BY 1, 2),
        |gl AS (SELECT c_nationkey, COUNT(*) AS g FROM j GROUP BY 1),
        |t AS (SELECT COUNT(*) AS nt FROM j),
        |grid AS (
        |  SELECT ct.yr, ct.c_mktsegment, ct.nc, gl.c_nationkey, gl.g, t.nt,
        |    COALESCE(cls.c, 0) AS c0
        |  FROM ct CROSS JOIN gl CROSS JOIN t
        |  LEFT JOIN cls ON cls.yr = ct.yr
        |    AND cls.c_mktsegment = ct.c_mktsegment
        |    AND cls.c_nationkey = gl.c_nationkey)
        |SELECT yr, c_mktsegment, CAST(nc AS BIGINT) AS n_orders,
        |  CAST(SUM(ABS(c0 * 1000000 // nc - g * 1000000 // nt)) // 2 AS BIGINT)
        |    AS tvd_ppm,
        |  CAST(SUM(ABS(c0 * 1000000 // nc - g * 1000000 // nt)) // 2 AS BIGINT)
        |    > 300000 AS at_risk
        |FROM grid GROUP BY yr, c_mktsegment, nc
        |ORDER BY yr, c_mktsegment""".stripMargin,

    "q276_quantile_normalization" ->
      """WITH g AS (SELECT source, n_chars, COUNT(*) AS f
        |  FROM documents GROUP BY 1, 2),
        |cum AS (SELECT a.source, a.n_chars, a.f,
        |    COALESCE(SUM(b.f), 0) AS below
        |  FROM g a LEFT JOIN g b
        |    ON b.source = a.source AND b.n_chars < a.n_chars
        |  GROUP BY 1, 2, 3),
        |n AS (SELECT source, SUM(f) AS n FROM g GROUP BY 1),
        |dec AS (SELECT CAST(i.i AS BIGINT) AS decile
        |  FROM UNNEST(generate_series(1, 9)) i(i)),
        |own AS (
        |  SELECT cum.source, dec.decile, cum.n_chars AS v_own
        |  FROM cum JOIN n USING (source) CROSS JOIN dec
        |  WHERE 10 * cum.below < dec.decile * n.n
        |    AND dec.decile * n.n <= 10 * (cum.below + cum.f)),
        |pg AS (SELECT n_chars, COUNT(*) AS pf FROM documents GROUP BY 1),
        |pcum AS (SELECT a.n_chars, a.pf, COALESCE(SUM(b.pf), 0) AS pbelow
        |  FROM pg a LEFT JOIN pg b ON b.n_chars < a.n_chars
        |  GROUP BY 1, 2),
        |pn AS (SELECT SUM(pf) AS pn FROM pg),
        |pool AS (
        |  SELECT dec.decile, pcum.n_chars AS v_pool
        |  FROM pcum CROSS JOIN pn CROSS JOIN dec
        |  WHERE 10 * pcum.pbelow < dec.decile * pn.pn
        |    AND dec.decile * pn.pn <= 10 * (pcum.pbelow + pcum.pf))
        |SELECT own.source, own.decile,
        |  CAST(own.v_own AS BIGINT) AS v_own,
        |  CAST(pool.v_pool AS BIGINT) AS v_pool,
        |  CAST(own.v_own - pool.v_pool AS BIGINT) AS shift
        |FROM own JOIN pool USING (decile)
        |ORDER BY source, decile""".stripMargin,

    "q277_conformal_quantile" ->
      """WITH g AS (SELECT lang, n_chars, COUNT(*) AS f
        |  FROM documents GROUP BY 1, 2),
        |cum AS (SELECT a.lang, a.n_chars, a.f, COALESCE(SUM(b.f), 0) AS below
        |  FROM g a LEFT JOIN g b ON b.lang = a.lang AND b.n_chars < a.n_chars
        |  GROUP BY 1, 2, 3),
        |n AS (SELECT lang, SUM(f) AS n FROM g GROUP BY 1)
        |SELECT cum.lang, CAST(n.n AS BIGINT) AS n,
        |  CAST((9 * (n.n + 1) + 9) // 10 AS BIGINT) AS k_idx,
        |  CAST(cum.n_chars AS BIGINT) AS qhat,
        |  CAST((cum.below + cum.f) * 1000000 // n.n AS BIGINT) AS realized_ppm,
        |  CAST(900000 AS BIGINT) AS nominal_ppm
        |FROM cum JOIN n USING (lang)
        |WHERE cum.below < (9 * (n.n + 1) + 9) // 10
        |  AND (9 * (n.n + 1) + 9) // 10 <= cum.below + cum.f
        |ORDER BY lang""".stripMargin,

    "q278_covariance_anisotropy" ->
      """WITH q AS (
        |  SELECT vec_id, g.i - 1 AS i,
        |    CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qi
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)),
        |cells AS (
        |  SELECT a.i AS i, b.i AS j, COUNT(*) AS nv, SUM(a.qi * b.qi) AS sij
        |  FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
        |t AS (SELECT i, SUM(qi) AS ti FROM q GROUP BY 1),
        |c AS (
        |  SELECT cells.i, cells.j,
        |    cells.nv * CAST(cells.sij AS HUGEINT)
        |      - CAST(ti.ti AS HUGEINT) * tj.ti AS cij
        |  FROM cells JOIN t ti ON ti.i = cells.i JOIN t tj ON tj.i = cells.j),
        |a AS (
        |  SELECT SUM(CASE WHEN i = j THEN cij END) AS trace_q,
        |    SUM(CASE WHEN i <> j THEN ABS(cij) END) AS offdiag_q,
        |    COUNT(DISTINCT i) AS dims,
        |    MAX(CASE WHEN i <> j THEN ABS(cij) END) AS mx
        |  FROM c),
        |top AS (
        |  SELECT MIN(c.i * 1024 + c.j) AS key FROM c, a
        |  WHERE c.i <> c.j AND ABS(c.cij) = a.mx),
        |nv AS (SELECT COUNT(*) AS n_vecs FROM embeddings)
        |SELECT CAST(nv.n_vecs AS BIGINT) AS n_vecs, CAST(a.dims AS BIGINT) AS dims,
        |  CAST(a.trace_q AS BIGINT) AS trace_q,
        |  CAST(a.offdiag_q AS BIGINT) AS offdiag_q,
        |  CAST(a.offdiag_q * a.dims * 1000000
        |    // (a.trace_q * (a.dims * a.dims - a.dims)) AS BIGINT) AS anisotropy_ppm,
        |  CAST(top.key // 1024 AS BIGINT) AS top_i,
        |  CAST(top.key % 1024 AS BIGINT) AS top_j,
        |  CAST(a.mx AS BIGINT) AS top_abs
        |FROM a, top, nv""".stripMargin,

    "q280_broadcast_advisor" ->
      """WITH legs AS (
        |  SELECT 'region' AS table_name, COUNT(*) AS n_rows,
        |    SUM(8 + length(r_name)) AS est_bytes FROM region
        |  UNION ALL SELECT 'nation', COUNT(*),
        |    SUM(16 + length(n_name)) FROM nation
        |  UNION ALL SELECT 'customer', COUNT(*),
        |    SUM(24 + length(c_name) + length(c_mktsegment)) FROM customer
        |  UNION ALL SELECT 'supplier', COUNT(*),
        |    SUM(24 + length(s_name)) FROM supplier
        |  UNION ALL SELECT 'part', COUNT(*),
        |    SUM(24 + length(p_name) + length(p_brand) + length(p_type)) FROM part
        |  UNION ALL SELECT 'orders', COUNT(*),
        |    SUM(32 + length(o_orderstatus) + length(o_orderpriority)) FROM orders
        |  UNION ALL SELECT 'lineitem', COUNT(*),
        |    SUM(72 + length(l_returnflag) + length(l_linestatus)) FROM lineitem)
        |SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(est_bytes AS BIGINT) AS est_bytes,
        |  CAST(est_bytes // n_rows AS BIGINT) AS bytes_per_row,
        |  est_bytes < 10485760 AS would_broadcast
        |FROM legs ORDER BY table_name""".stripMargin,

    "q281_period_detection" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |daily AS (SELECT event_type, day, COUNT(*) AS c0 FROM ev GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev),
        |days AS (SELECT CAST(g.d AS DATE) AS day, b.mn
        |         FROM b, UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) g(d)),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |cells AS (
        |  SELECT t.event_type, date_diff('day', dy.mn, dy.day) AS di,
        |    COALESCE(d2.c0, 0) AS c
        |  FROM days dy CROSS JOIN ty t
        |  LEFT JOIN daily d2 ON d2.event_type = t.event_type AND d2.day = dy.day),
        |nd AS (SELECT event_type, COUNT(*) AS n_days FROM cells GROUP BY 1),
        |pgrid AS (SELECT CAST(i.i AS INT) AS p
        |          FROM UNNEST(generate_series(5, 8)) i(i)),
        |folded AS (
        |  SELECT c.event_type, p.p, c.di % p.p AS phase, c.c
        |  FROM cells c JOIN nd USING (event_type) CROSS JOIN pgrid p
        |  WHERE c.di < CAST(nd.n_days // p.p AS INT) * p.p),
        |phased AS (
        |  SELECT event_type, p, phase, SUM(c) AS tg, SUM(c * c) AS sc2,
        |    COUNT(*) AS ng
        |  FROM folded GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT event_type, CAST(p AS BIGINT) AS p,
        |    CAST(SUM(ng) AS BIGINT) AS m_days,
        |    CAST(SUM(tg) AS BIGINT) AS n_events,
        |    CASE WHEN SUM(ng) * CAST(SUM(sc2) AS HUGEINT)
        |        - CAST(SUM(tg) AS HUGEINT) * SUM(tg) > 0
        |      THEN CAST((p * CAST(SUM(tg * CAST(tg AS HUGEINT)) AS HUGEINT)
        |        - CAST(SUM(tg) AS HUGEINT) * SUM(tg)) * 1000000
        |        // (SUM(ng) * CAST(SUM(sc2) AS HUGEINT)
        |        - CAST(SUM(tg) AS HUGEINT) * SUM(tg)) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS eta2_ppm
        |  FROM phased GROUP BY event_type, p),
        |best AS (SELECT event_type, MAX(eta2_ppm) AS mx FROM scored GROUP BY 1),
        |bestp AS (
        |  SELECT s.event_type, MIN(s.p) AS best_p
        |  FROM scored s JOIN best b2 ON s.event_type = b2.event_type
        |    AND s.eta2_ppm = b2.mx
        |  GROUP BY 1)
        |SELECT s.event_type, s.p, s.m_days, s.n_events, s.eta2_ppm,
        |  s.p = bp.best_p AS is_best
        |FROM scored s JOIN bestp bp USING (event_type)
        |ORDER BY s.event_type, s.p""".stripMargin,

    "q282_query_likelihood" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |cf AS (SELECT tok, COUNT(*) AS cf FROM toks GROUP BY 1),
        |top30 AS (SELECT tok, cf FROM cf ORDER BY cf DESC, tok LIMIT 30),
        |ranked AS (
        |  SELECT a.tok, a.cf,
        |    1 + (SELECT COUNT(*) FROM top30 b
        |         WHERE b.cf > a.cf OR (b.cf = a.cf AND b.tok < a.tok)) AS trank
        |  FROM top30 a),
        |terms AS (SELECT tok, cf, trank FROM ranked WHERE trank IN (10, 20, 30)),
        |ctot AS (SELECT COUNT(*) AS ctot FROM toks),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        |docs AS (SELECT d.doc_id, d.lang, dl.dl FROM documents d
        |         JOIN dl ON dl.doc_id = d.doc_id),
        |tf AS (
        |  SELECT t.doc_id, t.tok, COUNT(*) AS tf
        |  FROM toks t JOIN terms ON terms.tok = t.tok GROUP BY 1, 2),
        |st AS (
        |  SELECT d.doc_id, d.lang, terms.trank,
        |    COALESCE(tf.tf, 0) * 1000000 // (2 * d.dl)
        |      + terms.cf * 1000000 // (2 * ctot.ctot) AS s_t
        |  FROM docs d CROSS JOIN terms CROSS JOIN ctot
        |  LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.tok = terms.tok),
        |agg AS (
        |  SELECT doc_id, lang,
        |    MAX(CASE WHEN trank = 10 THEN s_t END) AS s10,
        |    MAX(CASE WHEN trank = 20 THEN s_t END) AS s20,
        |    MAX(CASE WHEN trank = 30 THEN s_t END) AS s30
        |  FROM st GROUP BY 1, 2)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |  CAST(s10 * s20 * s30 AS BIGINT) AS score
        |FROM agg ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q283_set_digest" ->
      """WITH h AS (
        |  SELECT DISTINCT source,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |per AS (SELECT source, COUNT(*) AS ndv, bit_xor(h) AS digest
        |  FROM h GROUP BY 1),
        |alld AS (SELECT '__all__' AS source, COUNT(*) AS ndv, bit_xor(h) AS digest
        |  FROM (SELECT DISTINCT h FROM h))
        |SELECT source, CAST(ndv AS BIGINT) AS ndv, CAST(digest AS BIGINT) AS digest
        |FROM (SELECT * FROM per UNION ALL SELECT * FROM alld)
        |ORDER BY source""".stripMargin,

    "q284_kmv_theta" ->
      """WITH h AS (
        |  SELECT DISTINCT source,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |sigs AS (SELECT source, h FROM (
        |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        |    FROM h) WHERE rk <= 16),
        |srcs AS (SELECT DISTINCT source FROM h),
        |usig0 AS (
        |  SELECT s.source AS a, t.source AS b, s.h
        |  FROM sigs s, srcs t WHERE s.source < t.source
        |  UNION
        |  SELECT t2.source AS a, s2.source AS b, s2.h
        |  FROM sigs s2, srcs t2 WHERE t2.source < s2.source),
        |usig AS (SELECT a, b, h FROM (
        |    SELECT a, b, h, row_number() OVER (PARTITION BY a, b ORDER BY h) AS urk
        |    FROM usig0) WHERE urk <= 16),
        |theta AS (SELECT a, b, MAX(h) AS mv, COUNT(*) AS ku FROM usig GROUP BY 1, 2),
        |bth AS (
        |  SELECT u.a, u.b,
        |    SUM(CASE WHEN ha.h IS NOT NULL AND hb.h IS NOT NULL
        |      THEN 1 ELSE 0 END) AS c_both
        |  FROM usig u
        |  LEFT JOIN h ha ON ha.source = u.a AND ha.h = u.h
        |  LEFT JOIN h hb ON hb.source = u.b AND hb.h = u.h
        |  GROUP BY 1, 2),
        |per AS (SELECT source, COUNT(*) AS ndv FROM h GROUP BY 1),
        |exi AS (
        |  SELECT x.source AS a, y.source AS b, COUNT(*) AS exact_inter
        |  FROM h x JOIN h y ON x.h = y.h AND x.source < y.source GROUP BY 1, 2)
        |SELECT t.a, t.b, CAST(t.ku AS BIGINT) AS k_used,
        |  CAST((t.ku - 1) * CAST(1152921504606846976 AS HUGEINT) // t.mv AS BIGINT)
        |    AS est_union,
        |  CAST(pa.ndv + pb.ndv - COALESCE(exi.exact_inter, 0) AS BIGINT)
        |    AS exact_union,
        |  CAST(bth.c_both * CAST(1152921504606846976 AS HUGEINT) // t.mv AS BIGINT)
        |    AS est_inter,
        |  CAST(COALESCE(exi.exact_inter, 0) AS BIGINT) AS exact_inter
        |FROM theta t JOIN bth USING (a, b)
        |JOIN per pa ON pa.source = t.a JOIN per pb ON pb.source = t.b
        |LEFT JOIN exi ON exi.a = t.a AND exi.b = t.b
        |ORDER BY t.a, t.b""".stripMargin,

    "q285_ams_f2" ->
      """WITH tf AS (
        |  SELECT lang, tok, COUNT(*) AS f FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |z AS (
        |  SELECT lang, j.j,
        |    SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || tok),
        |        1, 8)) AS BIGINT) % 2 = 0
        |      THEN f ELSE -f END) AS zj
        |  FROM tf, UNNEST(generate_series(0, 3)) j(j) GROUP BY 1, 2),
        |est AS (SELECT lang, CAST(SUM(zj * CAST(zj AS HUGEINT)) // 4 AS BIGINT)
        |    AS est_f2 FROM z GROUP BY 1),
        |ex AS (SELECT lang, CAST(SUM(f) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS v_types,
        |    CAST(SUM(f * CAST(f AS HUGEINT)) AS BIGINT) AS exact_f2
        |  FROM tf GROUP BY 1)
        |SELECT ex.lang, n_tokens, v_types, exact_f2, est_f2,
        |  CAST(ABS(est_f2 - exact_f2) * 1000000 // exact_f2 AS BIGINT) AS abs_err_ppm
        |FROM ex JOIN est USING (lang) ORDER BY lang""".stripMargin,

    "q289_ts_decomposition" -> ("WITH " + DecompChainSql +
      """
        |SELECT event_type, CAST(di AS BIGINT) AS di,
        |  CAST(c AS BIGINT) AS n_events, trend_u, seasonal_u, resid_u
        |FROM dec ORDER BY event_type, di""".stripMargin),

    "q492_seasonal_anomaly" -> ("WITH " + DecompChainSql +
      """,
        |g AS (SELECT event_type, resid_u, CAST(COUNT(*) AS BIGINT) AS c2
        |  FROM dec GROUP BY 1, 2),
        |gx AS (
        |  SELECT event_type, resid_u, c2,
        |    SUM(c2) OVER (PARTITION BY event_type ORDER BY resid_u) AS cum,
        |    SUM(c2) OVER (PARTITION BY event_type) AS n
        |  FROM g),
        |med AS (
        |  SELECT event_type, MAX(n) AS n,
        |    MAX(CASE WHEN cum - c2 < (n + 1) // 2 AND (n + 1) // 2 <= cum
        |      THEN resid_u END) AS med
        |  FROM gx GROUP BY 1),
        |ad AS (
        |  SELECT d2.event_type, ABS(d2.resid_u - m.med) AS adv
        |  FROM dec d2 JOIN med m USING (event_type)),
        |ag AS (SELECT event_type, adv, CAST(COUNT(*) AS BIGINT) AS c3
        |  FROM ad GROUP BY 1, 2),
        |agx AS (
        |  SELECT event_type, adv, c3,
        |    SUM(c3) OVER (PARTITION BY event_type ORDER BY adv) AS cum,
        |    SUM(c3) OVER (PARTITION BY event_type) AS n
        |  FROM ag),
        |mad AS (
        |  SELECT event_type,
        |    MAX(CASE WHEN cum - c3 < (n + 1) // 2 AND (n + 1) // 2 <= cum
        |      THEN adv END) AS mad
        |  FROM agx GROUP BY 1)
        |SELECT m.event_type, CAST(m.n AS BIGINT) AS n_days,
        |  CAST(m.med AS BIGINT) AS median_resid_u,
        |  CAST(mad.mad AS BIGINT) AS mad_u,
        |  CAST((SELECT COUNT(*) FROM dec d3
        |    WHERE d3.event_type = m.event_type
        |      AND ABS(d3.resid_u - m.med) > 3 * mad.mad) AS BIGINT)
        |    AS n_anomalies,
        |  CAST((SELECT MAX(ABS(d4.resid_u - m.med)) FROM dec d4
        |    WHERE d4.event_type = m.event_type) AS BIGINT) AS worst_abs_dev
        |FROM med m JOIN mad USING (event_type)
        |ORDER BY m.event_type""".stripMargin),

    "q493_batch_variance_decay" ->
      """WITH bs AS (
        |  SELECT CAST(g.b AS BIGINT) AS bsz FROM UNNEST([16, 256, 4096]) g(b)),
        |batches AS (
        |  SELECT bsz, doc_id // bsz AS bid, CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_chars) AS BIGINT) AS sb
        |  FROM documents CROSS JOIN bs GROUP BY 1, 2
        |  HAVING COUNT(*) = bsz),
        |agg AS (
        |  SELECT bsz, CAST(COUNT(*) AS BIGINT) AS nb,
        |    SUM(CAST(sb AS HUGEINT)) AS ssum,
        |    SUM(sb * CAST(sb AS HUGEINT)) AS ssq
        |  FROM batches GROUP BY 1)
        |SELECT bsz AS batch_size, nb AS n_batches,
        |  CAST((nb * ssq - ssum * ssum) * 1000000
        |    // (CAST(nb AS HUGEINT) * nb * bsz * bsz) AS BIGINT) AS var_mean_u,
        |  CAST((nb * ssq - ssum * ssum) * 1000000
        |    // (CAST(nb AS HUGEINT) * nb * bsz) AS BIGINT) AS b_var_u
        |FROM agg ORDER BY batch_size""".stripMargin,

    "q290_temperature_sweep" ->
      """WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (
        |  SELECT source, n,
        |    CAST(FLOOR(SQRT(CAST(n * 1000000000000 AS DOUBLE))) AS BIGINT) AS w2
        |  FROM c),
        |w4 AS (SELECT source, n, w2,
        |    CAST(FLOOR(SQRT(CAST(w2 AS DOUBLE))) AS BIGINT) AS w1 FROM w),
        |al AS (SELECT CAST(i.i AS BIGINT) AS a4
        |       FROM UNNEST(generate_series(1, 3)) i(i)),
        |wt AS (
        |  SELECT source, n, a4,
        |    CASE a4 WHEN 1 THEN w1 * 1000 WHEN 2 THEN w2
        |      ELSE w1 * w2 // 1000 END AS wt
        |  FROM w4 CROSS JOIN al),
        |tot AS (SELECT a4, SUM(wt) AS wtot FROM wt GROUP BY 1)
        |SELECT wt.source, CAST(wt.a4 * 250000 AS BIGINT) AS alpha_ppm,
        |  CAST(wt.n AS BIGINT) AS n_docs, CAST(wt.wt AS BIGINT) AS weight,
        |  CAST(wt.wt * 1000000 // tot.wtot AS BIGINT) AS share_ppm
        |FROM wt JOIN tot USING (a4)
        |ORDER BY wt.source, alpha_ppm""".stripMargin,

    "q291_arc_elasticity" ->
      """WITH li AS (
        |  SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS q,
        |    CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS dp
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |g AS (
        |  SELECT p_brand,
        |    SUM(CASE WHEN dp <= 2 THEN 1 ELSE 0 END) AS n_lo,
        |    SUM(CASE WHEN dp <= 2 THEN q ELSE 0 END) AS q_lo,
        |    SUM(CASE WHEN dp <= 2 THEN 100 - dp ELSE 0 END) AS p_lo,
        |    SUM(CASE WHEN dp >= 8 THEN 1 ELSE 0 END) AS n_hi,
        |    SUM(CASE WHEN dp >= 8 THEN q ELSE 0 END) AS q_hi,
        |    SUM(CASE WHEN dp >= 8 THEN 100 - dp ELSE 0 END) AS p_hi
        |  FROM li WHERE dp <= 2 OR dp >= 8 GROUP BY 1)
        |SELECT p_brand, CAST(n_lo AS BIGINT) AS n_lo, CAST(n_hi AS BIGINT) AS n_hi,
        |  CAST(q_lo * 1000000 // n_lo AS BIGINT) AS qbar_lo_u,
        |  CAST(q_hi * 1000000 // n_hi AS BIGINT) AS qbar_hi_u,
        |  ((CAST(q_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) -
        |    CAST(q_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) /
        |   (CAST(q_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) +
        |    CAST(q_lo AS DOUBLE) * CAST(n_hi AS DOUBLE))) /
        |  ((CAST(p_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) -
        |    CAST(p_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) /
        |   (CAST(p_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) +
        |    CAST(p_lo AS DOUBLE) * CAST(n_hi AS DOUBLE))) AS elasticity
        |FROM g WHERE n_lo > 0 AND n_hi > 0
        |ORDER BY p_brand""".stripMargin,

    "q292_cv_accuracy_spread" -> (TextAnalysis.LangIdPredSql +
      """,
        |pred AS (SELECT doc_id, pred_lang FROM r WHERE rn = 1),
        |f AS (
        |  SELECT ('0x' || substr(md5('fold:' || CAST(p.doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 5 AS fold,
        |    CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END AS ok
        |  FROM pred p JOIN documents d USING (doc_id)),
        |folds AS (
        |  SELECT fold, COUNT(*) AS n_docs, SUM(ok) AS n_correct,
        |    CAST(SUM(ok) * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm
        |  FROM f GROUP BY 1),
        |sp AS (SELECT COUNT(*) AS k, SUM(acc_ppm) AS sa,
        |    SUM(acc_ppm * acc_ppm) AS sa2 FROM folds)
        |SELECT CAST(fold AS BIGINT) AS fold, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_correct AS BIGINT) AS n_correct, acc_ppm,
        |  CAST(k * sa2 - sa * sa AS BIGINT) AS var_num,
        |  CAST((k * sa2 - sa * sa) // (k * k) AS BIGINT) AS var_ppm2
        |FROM folds, sp ORDER BY fold""".stripMargin),

    "q293_front_coding" ->
      """WITH l AS (
        |  SELECT source, text,
        |    LAG(text) OVER (PARTITION BY source ORDER BY text) AS prev
        |  FROM documents),
        |x AS (
        |  SELECT source, length(text) AS lt,
        |    CASE WHEN prev IS NULL THEN 0
        |      WHEN least(length(text), length(prev)) = 0 THEN 0
        |      ELSE COALESCE(NULLIF(list_position(list_transform(
        |        generate_series(1, least(length(text), length(prev))),
        |        i -> substr(text, i, 1) = substr(prev, i, 1)), false), 0) - 1,
        |        least(length(text), length(prev))) END AS lcp
        |  FROM l)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(lt) AS BIGINT) AS plain_chars,
        |  CAST(SUM(lcp) AS BIGINT) AS saved_chars,
        |  CAST(SUM(lcp) * 1000000 // SUM(lt) AS BIGINT) AS saved_ppm
        |FROM x GROUP BY source ORDER BY source""".stripMargin,

    "q294_curve_fragmentation" -> {
      val hl = HilbertTable.mkString("[", ", ", "]")
      val ml = MortonTable.mkString("[", ", ", "]")
      s"""WITH mx AS (
         |  SELECT MAX(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT))
         |    AS maxc FROM part),
         |cells0 AS (
         |  SELECT CAST((p_size - 1) * 16 // 50 AS INT) AS bx,
         |    CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 16
         |      // (maxc + 1) AS INT) AS by
         |  FROM part, mx),
         |cells AS (
         |  SELECT bx, by, COUNT(*) AS n_parts,
         |    ($ml)[bx * 16 + by + 1] AS zd,
         |    ($hl)[bx * 16 + by + 1] AS hd
         |  FROM cells0 GROUP BY 1, 2),
         |pos AS (
         |  SELECT c.curve, bx, by, n_parts,
         |    CASE WHEN c.curve = 'z' THEN zd ELSE hd END AS dpos
         |  FROM cells CROSS JOIN (SELECT UNNEST(['z', 'hilbert']) AS curve) c),
         |prev AS (
         |  SELECT curve, bx, by, n_parts,
         |    LAG(bx) OVER (PARTITION BY curve ORDER BY dpos) AS px,
         |    LAG(by) OVER (PARTITION BY curve ORDER BY dpos) AS py
         |  FROM pos),
         |b AS (
         |  SELECT curve, a.axis,
         |    CASE WHEN a.axis = 'x' THEN bx ELSE by END AS band, n_parts,
         |    CASE WHEN px IS NULL THEN 1
         |      WHEN a.axis = 'x' AND px <> bx THEN 1
         |      WHEN a.axis = 'y' AND py <> by THEN 1 ELSE 0 END AS rs
         |  FROM prev CROSS JOIN (SELECT UNNEST(['x', 'y']) AS axis) a)
         |SELECT curve, axis, CAST(band AS BIGINT) AS band,
         |  CAST(SUM(n_parts) AS BIGINT) AS n_parts,
         |  CAST(COUNT(*) AS BIGINT) AS n_cells,
         |  CAST(SUM(rs) AS BIGINT) AS n_fragments
         |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },

    "q295_greedy_set_cover" ->
      """WITH tk AS (
        |  SELECT source, string_split(text, ' ') AS t FROM documents),
        |st AS (
        |  SELECT DISTINCT source,
        |    t[g.i] || ' ' || t[g.i + 1] || ' ' || t[g.i + 2] AS tok
        |  FROM tk, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        |  WHERE len(t) >= 3),
        |tot AS (SELECT COUNT(DISTINCT tok) AS v_total FROM st),
        |p1 AS (SELECT source, COUNT(*) AS gain FROM st GROUP BY 1
        |       ORDER BY gain DESC, source LIMIT 1),
        |cov1 AS (SELECT DISTINCT st.tok FROM st JOIN p1 USING (source)),
        |rem2 AS (SELECT st.source, st.tok FROM st
        |         LEFT JOIN cov1 ON cov1.tok = st.tok WHERE cov1.tok IS NULL),
        |p2 AS (SELECT source, COUNT(*) AS gain FROM rem2 GROUP BY 1
        |       ORDER BY gain DESC, source LIMIT 1),
        |cov2 AS (SELECT DISTINCT rem2.tok FROM rem2 JOIN p2 USING (source)),
        |rem3 AS (SELECT rem2.source, rem2.tok FROM rem2
        |         LEFT JOIN cov2 ON cov2.tok = rem2.tok WHERE cov2.tok IS NULL),
        |p3 AS (SELECT source, COUNT(*) AS gain FROM rem3 GROUP BY 1
        |       ORDER BY gain DESC, source LIMIT 1),
        |rounds AS (
        |  SELECT 1 AS round, source, gain FROM p1
        |  UNION ALL SELECT 2, source, gain FROM p2
        |  UNION ALL SELECT 3, source, gain FROM p3)
        |SELECT CAST(a.round AS BIGINT) AS round, a.source,
        |  CAST(a.gain AS BIGINT) AS gain,
        |  CAST(SUM(b.gain) AS BIGINT) AS cum_covered,
        |  CAST(SUM(b.gain) * 1000000 // tot.v_total AS BIGINT) AS cum_ppm
        |FROM rounds a JOIN rounds b ON b.round <= a.round CROSS JOIN tot
        |GROUP BY a.round, a.source, a.gain, tot.v_total
        |ORDER BY a.round""".stripMargin,

    "q296_var_shortfall" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT a.day, a.rev, 1 + COUNT(b.day) AS rk
        |  FROM daily a LEFT JOIN daily b
        |    ON b.rev < a.rev OR (b.rev = a.rev AND b.day < a.day)
        |  GROUP BY 1, 2),
        |n AS (SELECT COUNT(*) AS n_days, SUM(rev) AS tot FROM daily)
        |SELECT CAST(n.n_days AS BIGINT) AS n_days,
        |  CAST((n.n_days + 19) // 20 AS BIGINT) AS k_tail,
        |  CAST(MAX(r.rev) AS BIGINT) AS var_cents,
        |  CAST(SUM(r.rev) // ((n.n_days + 19) // 20) AS BIGINT) AS es_cents,
        |  CAST(n.tot // n.n_days AS BIGINT) AS mean_cents
        |FROM ranked r CROSS JOIN n
        |WHERE r.rk <= (n.n_days + 19) // 20
        |GROUP BY n.n_days, n.tot""".stripMargin,

    "q297_cluster_jackknife" ->
      """WITH g AS (SELECT source, COUNT(*) AS n, SUM(n_chars) AS sc
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS gs, SUM(n) AS nt, SUM(sc) AS st FROM g),
        |loo AS (
        |  SELECT g.source, CAST(g.n AS BIGINT) AS n_docs,
        |    CAST(CAST(tot.st - g.sc AS HUGEINT) * 1000000
        |      // (tot.nt - g.n) AS BIGINT) AS loo_mean_ppm,
        |    tot.gs,
        |    CAST(CAST(tot.st AS HUGEINT) * 1000000 // tot.nt AS BIGINT) AS mean_ppm
        |  FROM g CROSS JOIN tot),
        |sp AS (SELECT CAST(COUNT(*) * SUM(loo_mean_ppm * CAST(loo_mean_ppm AS HUGEINT))
        |    - CAST(SUM(loo_mean_ppm) AS HUGEINT) * SUM(loo_mean_ppm) AS BIGINT)
        |    AS jk_var_num
        |  FROM loo)
        |SELECT loo.source, loo.n_docs, loo.loo_mean_ppm, loo.mean_ppm,
        |  CAST(loo.gs AS BIGINT) AS g_sources, sp.jk_var_num
        |FROM loo CROSS JOIN sp ORDER BY loo.source""".stripMargin,

    "q301_stylometry" ->
      """WITH p AS (
        |  SELECT source, length(text) AS nc,
        |    len(string_split(text, ' ')) AS nw,
        |    length(text) - length(regexp_replace(text, '[.]', '', 'g')) + 1 AS ns,
        |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS np,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS ndg,
        |    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS nup
        |  FROM documents),
        |f AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(nc) * 1000000 // SUM(nw) AS BIGINT) AS wlen_ppm,
        |    CAST(SUM(nw) * 1000000 // SUM(ns) AS BIGINT) AS slen_ppm,
        |    CAST(SUM(np) * 1000000 // SUM(nc) AS BIGINT) AS punct_ppm,
        |    CAST(SUM(ndg) * 1000000 // SUM(nc) AS BIGINT) AS digit_ppm,
        |    CAST(SUM(nup) * 1000000 // SUM(nc) AS BIGINT) AS upper_ppm
        |  FROM p GROUP BY 1),
        |pairs AS (
        |  SELECT a.source, b.source AS s2,
        |    ABS(a.wlen_ppm - b.wlen_ppm) + ABS(a.slen_ppm - b.slen_ppm)
        |    + ABS(a.punct_ppm - b.punct_ppm) + ABS(a.digit_ppm - b.digit_ppm)
        |    + ABS(a.upper_ppm - b.upper_ppm) AS l1
        |  FROM f a JOIN f b ON a.source <> b.source),
        |mn AS (SELECT source, MIN(l1) AS ml FROM pairs GROUP BY 1),
        |nn AS (
        |  SELECT p2.source, MIN(p2.s2) AS nn_source, MIN(p2.l1) AS nn_l1
        |  FROM pairs p2 JOIN mn ON mn.source = p2.source AND p2.l1 = mn.ml
        |  GROUP BY 1)
        |SELECT f.source, f.n_docs, f.wlen_ppm, f.slen_ppm, f.punct_ppm,
        |  f.digit_ppm, f.upper_ppm, nn.nn_source, CAST(nn.nn_l1 AS BIGINT) AS nn_l1
        |FROM f JOIN nn USING (source) ORDER BY f.source""".stripMargin,

    "q302_wilson_bounds" -> {
      def wilson(sign: String) =
        s"(CAST(k AS DOUBLE) / n + CAST(3.8416 AS DOUBLE) / (2 * CAST(n AS DOUBLE)) $sign" +
          s" SQRT(CAST(3.8416 AS DOUBLE)) * SQRT(CAST(k AS DOUBLE) / n * (1 - CAST(k AS DOUBLE) / n) / n" +
          s" + CAST(3.8416 AS DOUBLE) / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) /" +
          s" (1 + CAST(3.8416 AS DOUBLE) / CAST(n AS DOUBLE))"
      s"""WITH g AS (
         |  SELECT source, COUNT(*) AS n,
         |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS k
         |  FROM documents GROUP BY 1)
         |SELECT source, CAST(n AS BIGINT) AS n_docs, CAST(k AS BIGINT) AS n_en,
         |  CAST(k * 1000000 // n AS BIGINT) AS p_ppm,
         |  ${wilson("-")} AS wilson_lo,
         |  ${wilson("+")} AS wilson_hi
         |FROM g ORDER BY source""".stripMargin
    },

    "q304_learned_index" ->
      """WITH g AS (SELECT source, n_chars, COUNT(*) AS f
        |  FROM documents GROUP BY 1, 2),
        |pts AS (
        |  SELECT a.source, a.n_chars AS x,
        |    1 + COALESCE(SUM(b.f), 0) AS y
        |  FROM g a LEFT JOIN g b
        |    ON b.source = a.source AND b.n_chars < a.n_chars
        |  GROUP BY 1, 2),
        |sums AS (
        |  SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * CAST(x AS HUGEINT)) AS sxx, SUM(x * CAST(y AS HUGEINT)) AS sxy
        |  FROM pts GROUP BY 1),
        |fitted AS (
        |  SELECT source, n, sx, sy,
        |    n * sxy - CAST(sx AS HUGEINT) * sy AS bn,
        |    n * sxx - CAST(sx AS HUGEINT) * sx AS bd
        |  FROM sums),
        |res AS (
        |  SELECT p.source, f.n, f.bn, f.bd, f.sx, f.sy,
        |    ABS(f.bd * (f.n * CAST(p.y AS HUGEINT) - f.sy)
        |      - f.bn * (f.n * CAST(p.x AS HUGEINT) - f.sx)) AS aenum
        |  FROM pts p JOIN fitted f USING (source))
        |SELECT source, CAST(n AS BIGINT) AS n_keys,
        |  CAST(MAX(aenum) // (n * bd) AS BIGINT) AS max_abs_err_rows,
        |  CAST(bn AS DOUBLE) / CAST(bd AS DOUBLE) AS slope,
        |  (CAST(sy AS DOUBLE) - CAST(bn AS DOUBLE) / CAST(bd AS DOUBLE)
        |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        |FROM res GROUP BY source, n, bn, bd, sx, sy
        |ORDER BY source""".stripMargin,

    "q305_roaring_planner" ->
      """WITH k AS (
        |  SELECT source, doc_id, doc_id // 4096 AS container,
        |    LAG(doc_id) OVER (PARTITION BY source, doc_id // 4096
        |      ORDER BY doc_id) AS prev
        |  FROM documents),
        |r AS (
        |  SELECT source, container,
        |    CASE WHEN prev IS NULL OR prev <> doc_id - 1 THEN 1 ELSE 0 END AS nr
        |  FROM k),
        |g AS (SELECT source, container, COUNT(*) AS n_keys, SUM(nr) AS n_runs
        |  FROM r GROUP BY 1, 2)
        |SELECT source, CAST(container AS BIGINT) AS container,
        |  CAST(n_keys AS BIGINT) AS n_keys, CAST(n_runs AS BIGINT) AS n_runs,
        |  CAST(n_keys * 2 AS BIGINT) AS bytes_array,
        |  CAST(512 AS BIGINT) AS bytes_bitmap,
        |  CAST(4 + n_runs * 4 AS BIGINT) AS bytes_run,
        |  CASE WHEN n_keys * 2 <= 4 + n_runs * 4 AND n_keys * 2 <= 512 THEN 'array'
        |    WHEN 4 + n_runs * 4 <= 512 THEN 'run'
        |    ELSE 'bitmap' END AS best
        |FROM g ORDER BY source, container""".stripMargin,

    "q306_pvm_decomposition" ->
      """WITH o AS (
        |  SELECT c.c_mktsegment, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 100
        |      AS rev_d
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE EXTRACT(YEAR FROM o.o_orderdate) IN (1995, 1996)),
        |g AS (
        |  SELECT c_mktsegment,
        |    SUM(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS n0,
        |    SUM(CASE WHEN yr = 1995 THEN rev_d ELSE 0 END) AS r0,
        |    SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN yr = 1996 THEN rev_d ELSE 0 END) AS r1
        |  FROM o GROUP BY 1)
        |SELECT c_mktsegment, CAST(n0 AS BIGINT) AS n0, CAST(r0 AS BIGINT) AS rev0_d,
        |  CAST(n1 AS BIGINT) AS n1, CAST(r1 AS BIGINT) AS rev1_d,
        |  CAST(CAST((n1 - n0) * r0 * n1 AS DECIMAL(38,0)) AS VARCHAR) AS vol_num,
        |  CAST(CAST(n0 * (r1 * n0 - r0 * n1) AS DECIMAL(38,0)) AS VARCHAR) AS rate_num,
        |  CAST(CAST((n1 - n0) * (r1 * n0 - r0 * n1) AS DECIMAL(38,0)) AS VARCHAR) AS cross_num,
        |  CAST(CAST((r1 - r0) * n0 * n1 AS DECIMAL(38,0)) AS VARCHAR) AS total_num
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    "q307_shapley_attribution" ->
      """WITH fp AS (
        |  SELECT user_id, MIN(ts) AS pts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |tch AS (
        |  SELECT e.user_id,
        |    MAX(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END)
        |    + MAX(CASE WHEN e.event_type = 'click' THEN 2 ELSE 0 END)
        |    + MAX(CASE WHEN e.event_type = 'signup' THEN 4 ELSE 0 END) AS mask
        |  FROM events e JOIN fp ON fp.user_id = e.user_id
        |  WHERE e.ts < fp.pts GROUP BY 1),
        |ntc AS (SELECT COUNT(*) AS n_no_touch FROM fp
        |        WHERE user_id NOT IN (SELECT user_id FROM tch WHERE mask > 0)),
        |nt AS (SELECT mask, COUNT(*) AS n FROM tch WHERE mask > 0 GROUP BY 1),
        |lat AS (SELECT CAST(i.i AS BIGINT) AS s8
        |        FROM UNNEST(generate_series(0, 7)) i(i)),
        |vs AS (
        |  SELECT lat.s8, COALESCE(SUM(nt.n), 0) AS v
        |  FROM lat LEFT JOIN nt
        |    ON (CAST(nt.mask AS INT) & CAST(lat.s8 AS INT)) = CAST(nt.mask AS INT)
        |  GROUP BY 1),
        |ch AS (SELECT CAST(1 << CAST(i.i AS INT) AS BIGINT) AS cbit,
        |    CASE i.i WHEN 0 THEN 'view' WHEN 1 THEN 'click'
        |      ELSE 'signup' END AS channel
        |  FROM UNNEST(generate_series(0, 2)) i(i)),
        |terms AS (
        |  SELECT ch.channel,
        |    SUM(CASE bit_count(v0.s8) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END
        |      * (vu.v - v0.v)) AS phi6
        |  FROM ch
        |  JOIN vs v0 ON (CAST(v0.s8 AS INT) & CAST(ch.cbit AS INT)) = 0
        |  JOIN vs vu ON CAST(vu.s8 AS INT)
        |    = (CAST(v0.s8 AS INT) | CAST(ch.cbit AS INT))
        |  GROUP BY 1),
        |fl AS (SELECT v AS v_full FROM vs WHERE s8 = 7)
        |SELECT terms.channel, CAST(terms.phi6 AS BIGINT) AS phi6,
        |  CAST(fl.v_full AS BIGINT) AS v_full,
        |  CAST(ntc.n_no_touch AS BIGINT) AS n_no_touch,
        |  CAST(terms.phi6 * 1000000 // (6 * fl.v_full) AS BIGINT) AS share_ppm
        |FROM terms CROSS JOIN fl CROSS JOIN ntc ORDER BY terms.channel""".stripMargin,

    "q308_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) - 1 AS m,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 100
        |      AS rev_d
        |  FROM orders),
        |f AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1),
        |b AS (SELECT MIN(m0) AS mb FROM f),
        |aged AS (
        |  SELECT o.o_custkey, f.m0 - b.mb AS cohort, o.m - f.m0 AS age, o.rev_d
        |  FROM o JOIN f USING (o_custkey) CROSS JOIN b
        |  WHERE f.m0 < b.mb + 12 AND o.m - f.m0 <= 5),
        |cells AS (
        |  SELECT cohort, age, SUM(rev_d) AS rev_d, COUNT(*) AS n_orders
        |  FROM aged GROUP BY 1, 2),
        |sizes AS (
        |  SELECT cohort, COUNT(DISTINCT o_custkey) AS n_customers
        |  FROM aged GROUP BY 1),
        |ages AS (SELECT CAST(i.i AS BIGINT) AS a2
        |         FROM UNNEST(generate_series(0, 5)) i(i))
        |SELECT CAST(c.cohort AS BIGINT) AS cohort, ages.a2 AS age,
        |  CAST(s.n_customers AS BIGINT) AS n_customers,
        |  CAST(SUM(c.n_orders) AS BIGINT) AS cum_orders,
        |  CAST(SUM(c.rev_d) AS BIGINT) AS cum_rev_d,
        |  CAST(SUM(c.rev_d) * 100 // s.n_customers AS BIGINT) AS ltv_cents_per_cust
        |FROM cells c CROSS JOIN ages
        |JOIN sizes s ON s.cohort = c.cohort
        |WHERE c.age <= ages.a2
        |GROUP BY c.cohort, ages.a2, s.n_customers
        |ORDER BY cohort, age""".stripMargin,

    "q309_trending_terms" ->
      """WITH m AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS mid FROM documents),
        |tok AS (
        |  SELECT d.doc_id <= m.mid AS h1,
        |    unnest(string_split(d.text, ' ')) AS tok
        |  FROM documents d CROSS JOIN m),
        |t1 AS (SELECT tok, COUNT(*) AS c FROM tok WHERE h1
        |       GROUP BY 1 ORDER BY c DESC, tok LIMIT 10),
        |t2 AS (SELECT tok, COUNT(*) AS c FROM tok WHERE NOT h1
        |       GROUP BY 1 ORDER BY c DESC, tok LIMIT 10),
        |r1 AS (SELECT a.tok, a.c,
        |    1 + (SELECT COUNT(*) FROM t1 b WHERE b.c > a.c
        |         OR (b.c = a.c AND b.tok < a.tok)) AS rk
        |  FROM t1 a),
        |r2 AS (SELECT a.tok, a.c,
        |    1 + (SELECT COUNT(*) FROM t2 b WHERE b.c > a.c
        |         OR (b.c = a.c AND b.tok < a.tok)) AS rk
        |  FROM t2 a)
        |SELECT COALESCE(r1.tok, r2.tok) AS tok,
        |  CAST(COALESCE(r1.rk, 11) AS BIGINT) AS rank_h1,
        |  CAST(COALESCE(r2.rk, 11) AS BIGINT) AS rank_h2,
        |  CAST(COALESCE(r1.c, 0) AS BIGINT) AS count_h1,
        |  CAST(COALESCE(r2.c, 0) AS BIGINT) AS count_h2,
        |  CAST(ABS(COALESCE(r1.rk, 11) - COALESCE(r2.rk, 11)) AS BIGINT)
        |    AS displacement
        |FROM r1 FULL OUTER JOIN r2 ON r1.tok = r2.tok
        |ORDER BY tok""".stripMargin,

    "q310_multibyte_audit" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
        |  CAST(SUM(CASE WHEN strlen(text) > length(text) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS docs_multibyte,
        |  CAST((SUM(strlen(text)) - SUM(length(text))) * 1000000
        |    // SUM(length(text)) AS BIGINT) AS overhead_ppm
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q311_freshness" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS tu FROM events),
        |h AS (SELECT MAX(tu) AS hw FROM ev)
        |SELECT ev.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST((h.hw - MAX(ev.tu)) // 1000000 AS BIGINT) AS staleness_s,
        |  CAST(SUM(CASE WHEN ev.tu >= h.hw - 86400000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_last_24h,
        |  CASE WHEN COUNT(*) > 1 THEN
        |    CAST((MAX(ev.tu) - MIN(ev.tu)) // (1000000 * (COUNT(*) - 1)) AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS mean_gap_s
        |FROM ev CROSS JOIN h
        |GROUP BY ev.event_type, h.hw ORDER BY ev.event_type""".stripMargin,

    "q315_salt_advisor" ->
      """WITH cnt AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM cnt),
        |top5 AS (SELECT l_partkey, n FROM cnt ORDER BY n DESC, l_partkey LIMIT 5)
        |SELECT CAST(t.l_partkey AS BIGINT) AS partkey, CAST(t.n AS BIGINT) AS n_rows,
        |  CAST(t.n * 1000000 // tot.total AS BIGINT) AS share_ppm,
        |  CAST(tot.total // 32 AS BIGINT) AS target_rows,
        |  CAST(CASE WHEN t.n <= tot.total // 32 THEN 1
        |    ELSE (t.n + tot.total // 32 - 1) // (tot.total // 32) END AS BIGINT)
        |    AS salt_k,
        |  CAST((t.n // CASE WHEN t.n <= tot.total // 32 THEN 1
        |    ELSE (t.n + tot.total // 32 - 1) // (tot.total // 32) END)
        |    * 1000000 // tot.total AS BIGINT) AS post_salt_share_ppm
        |FROM top5 t CROSS JOIN tot
        |ORDER BY n_rows DESC, partkey""".stripMargin,

    "q316_dedup_ladder" ->
      """WITH f AS (
        |  SELECT doc_id, length(text) AS nc,
        |    md5(text) AS t1,
        |    md5(trim(regexp_replace(
        |      regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |      AS t2,
        |    md5(array_to_string(list_sort(string_split(trim(regexp_replace(
        |      regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g')),
        |      ' ')), ' ')) AS t3
        |  FROM documents),
        |tier AS (
        |  SELECT 1 AS tier, fp, COUNT(*) AS cnt, SUM(nc) AS sc,
        |    arg_min(nc, doc_id) AS rep_nc
        |  FROM (SELECT doc_id, nc, t1 AS fp FROM f) GROUP BY 2
        |  UNION ALL
        |  SELECT 2, fp, COUNT(*), SUM(nc), arg_min(nc, doc_id)
        |  FROM (SELECT doc_id, nc, t2 AS fp FROM f) GROUP BY 2
        |  UNION ALL
        |  SELECT 3, fp, COUNT(*), SUM(nc), arg_min(nc, doc_id)
        |  FROM (SELECT doc_id, nc, t3 AS fp FROM f) GROUP BY 2)
        |SELECT CAST(tier AS BIGINT) AS tier, CAST(COUNT(*) AS BIGINT) AS ndv,
        |  CAST(SUM(cnt - 1) AS BIGINT) AS dup_docs,
        |  CAST(SUM(sc - rep_nc) AS BIGINT) AS saved_chars,
        |  CAST(SUM(cnt - 1) * 1000000 // SUM(cnt) AS BIGINT) AS dup_ppm,
        |  CAST(SUM(sc - rep_nc) * 1000000 // SUM(sc) AS BIGINT) AS saved_ppm
        |FROM tier GROUP BY tier ORDER BY tier""".stripMargin
  )
}
