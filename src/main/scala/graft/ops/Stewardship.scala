package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Data-stewardship operators (round 7): the QA/forensics layer a
  * training-data pipeline runs over its own tables — declarative
  * expectation suites, robust anomaly detection, retrieval chunking
  * audits, coverage accounting, robust trend estimation, and
  * first-digit forensics.
  *
  * House conventions throughout (README "Determinism contract"):
  * engine-neutral integer arithmetic (floor-ppm, cents via
  * DECIMAL(12,2)·100), medians as explicit rank selection with total
  * tie-break orders, bounded-grid windows only (every window below is
  * either partitioned by a bounded key or runs on a grid whose size is
  * fixed by the generator's time span, not the corpus), and explicit
  * zero rows anchored on literal grids.
  */
object Stewardship {

  /** q344 anomaly threshold: flag a day when |n − median| > MadK · MAD
    * (parameter-free integer compare; 3 is the classic robust cutoff).
    * ONE definition interpolated into both engines' SQL. */
  private[graft] val MadK = 3L

  /** q346 retrieval chunking geometry (chars). Stride < chunk gives the
    * standard overlapping RAG windows; sized to the corpus' 48–553 char
    * docs so multi-chunk docs actually occur. */
  private[graft] val ChunkLen = 160L
  private[graft] val ChunkStride = 120L

  /** q347 event-interval half-life: each event covers [ts, ts+300 s). */
  private[graft] val CoverUs = 300000000L

  /** q349 Benford expected first-digit shares, ppm: round(log10(1+1/d)·10⁶)
    * for d = 1..9. Precomputed constants (they sum to exactly 10⁶) so
    * neither engine evaluates a transcendental — the repo-wide log-free
    * rule; interpolated into both engines from this ONE list. */
  private[graft] val BenfordPpm: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** q345 expectation-suite domains — single source of truth for both
    * engines (the advisor's interpolate-constants rule). */
  private[graft] val StatusDomain = Seq("O", "F", "P")
  private[graft] val PriorityDomain =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private[graft] val YearLo = 1995L
  private[graft] val YearHi = 2001L

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  /** q374 2-D box probe on the (user_id%256, day%256) demo grid —
    * ONE set of constants interpolated into both engines. The day leg
    * maps to real epoch days 197xx (inside every SF's 2024-01 horizon,
    * the q141 probe convention). */
  private[graft] val BoxULo = 100L
  private[graft] val BoxUHi = 115L
  private[graft] val BoxDLo = 20L
  private[graft] val BoxDHi = 35L

  /** Hilbert xy→d index on the 256×256 grid as ONE runtime
    * `aggregate()` fold (the q341 rule: the 8 rotation steps carry the
    * (x, y, d) accumulator at RUNTIME — expression-level unrolling
    * would inline the previous step into every branch and go
    * exponential). Classic top-down bit algorithm: at level i with
    * s = 2^i, quadrant code (3·rx) XOR ry advances d by s²·code, then
    * the lower bits are reflected/transposed into the quadrant's frame
    * (reflection bound 255 = n−1; bits ≥ s diverge from the s−1 form
    * but are never examined again). Bijectivity + the unit-step
    * adjacency law (only a TRUE Hilbert curve moves one cell per
    * index step) are spec-asserted over the full 65536-cell domain. */
  private[graft] def hilbertSql(x: String, y: String): String = {
    val s = "shiftleft(CAST(1 AS BIGINT), i)"
    s"""aggregate(
       |  sequence(7, 0, -1),
       |  named_struct('x', CAST($x AS BIGINT), 'y', CAST($y AS BIGINT),
       |               'h', CAST(0 AS BIGINT)),
       |  (a, i) -> named_struct(
       |    'x', CASE WHEN (a.y & $s) = 0
       |           THEN (CASE WHEN (a.x & $s) > 0 THEN 255 - a.y ELSE a.y END)
       |           ELSE a.x END,
       |    'y', CASE WHEN (a.y & $s) = 0
       |           THEN (CASE WHEN (a.x & $s) > 0 THEN 255 - a.x ELSE a.x END)
       |           ELSE a.y END,
       |    'h', a.h + shiftleft(CAST(1 AS BIGINT), 2 * i) *
       |      CAST(((CASE WHEN (a.x & $s) > 0 THEN 3 ELSE 0 END) ^
       |            (CASE WHEN (a.y & $s) > 0 THEN 1 ELSE 0 END)) AS BIGINT)),
       |  a -> a.h)""".stripMargin.replaceAll("\n\\s*", " ")
  }

  /** Embeddings quantized to the 10³ integer grid (the q355 trick):
    * (vec_id, q: Array[Long]) — exact integer geometry in both engines. */
  private def vecsQ3(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), expr("transform(CAST(embedding AS ARRAY<DOUBLE>)," +
        " x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))").as("q"))

  /** q345's constraint evaluation over any orders-shaped frame — factored
    * out so the spec can prove each detector arm on injected violations
    * (the production query passes [[Tables.orders]] through unchanged).
    * The five row-level checks share ONE aggregation pass (a new check
    * costs a column, not a scan); uniqueness needs the one distinct. */
  private[graft] def expectationReport(o: DataFrame): DataFrame = {
    val row = o.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v1"),
      sum(when(!col("o_orderstatus").isin(StatusDomain: _*), 1L)
        .otherwise(0L)).as("v2"),
      sum(when(!col("o_orderpriority").isin(PriorityDomain: _*), 1L)
        .otherwise(0L)).as("v3"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v4"),
      sum(when(year(col("o_orderdate")) < YearLo ||
        year(col("o_orderdate")) > YearHi, 1L).otherwise(0L)).as("v5"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v6"))
    row.select(col("n_rows"), explode(array(
        struct(lit("c1_totalprice_positive").as("check_name"), col("v1").as("n_violations")),
        struct(lit("c2_status_domain").as("check_name"), col("v2").as("n_violations")),
        struct(lit("c3_priority_domain").as("check_name"), col("v3").as("n_violations")),
        struct(lit("c4_custkey_not_null").as("check_name"), col("v4").as("n_violations")),
        struct(lit("c5_orderdate_bounds").as("check_name"), col("v5").as("n_violations")),
        struct(lit("c6_orderkey_unique").as("check_name"), col("v6").as("n_violations"))))
        .as("c"))
      .select(col("c.check_name").as("check_name"),
        col("n_rows").cast("long").as("n_rows"),
        col("c.n_violations").cast("long").as("n_violations"),
        (col("c.n_violations") === 0L).as("pass"))
      .orderBy("check_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MAD-based daily-volume ANOMALY detector — the robust on-call alarm
    // over per-type event counts (mean/stddev break on the very outliers
    // they should flag; median/MAD have a 50% breakdown point). Medians
    // are EXACT rank selection — the value at row (n_days+1) DIV 2 under
    // the total order (value, day) — never an interpolating percentile,
    // so both engines pick the identical element. A day is anomalous
    // when |n − med| > MadK·MAD in pure integers. Scale: the corpus pass
    // is ONE map-combined (type, day) count; everything after runs on
    // the ≤|types|·|days| grid with windows PARTITIONED by event_type.
    "q344_mad_anomalies" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val cnts = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      def medianOf(df: DataFrame, value: String, out: String): DataFrame =
        df.withColumn("rn", row_number().over(Window.partitionBy("event_type")
            .orderBy(col(value), col("day"))))
          .join(broadcast(cnts), "event_type")
          .filter(col("rn") === expr("(n_days + 1) DIV 2"))
          .select(col("event_type"), col(value).as(out))
      val med = medianOf(daily, "n", "med")
      val dev = daily.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("n") - col("med")))
      val mad = medianOf(dev, "dev", "mad")
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          max(col("med")).cast("long").as("med"),
          max(col("mad")).cast("long").as("mad"),
          sum(when(col("dev") > lit(MadK) * col("mad"), 1L).otherwise(0L))
            .cast("long").as("n_anomalies"),
          max(col("dev")).cast("long").as("max_dev"))
        .orderBy("event_type")
    },

    // Declarative EXPECTATION suite (the Deequ/Great-Expectations
    // operator class): a constraint table — completeness, domain
    // membership, bounds, uniqueness — evaluated against orders and
    // emitted as one row per check with its violation count and
    // verdict. The five row-level checks share ONE aggregation pass
    // (sum-of-when per predicate — adding a check costs a column, not a
    // scan); uniqueness is the one check that genuinely needs a second
    // (distinct) pass. Expected-zero rows are measured facts (the q158
    // rule), and the detector arms are spec-proven on injected
    // violations.
    "q345_expectations" -> { (s, d) =>
      expectationReport(Tables.orders(s, d))
    },

    // RAG CHUNKING audit — the geometry table read before an embedding
    // index is built over fixed-size overlapping windows (chunk
    // ChunkLen, stride ChunkStride): chunks per source, duplicated-char
    // overhead from the overlap (the index-size multiplier), and the
    // WORD-BREAKAGE rate at chunk boundaries (a boundary placed inside
    // a word costs retrieval the split word — the signal that decides
    // sentence-aware chunking is worth its cost). n_chunks = 1 +
    // ceil(max(len−chunk, 0)/stride) in pure integers; one explode of
    // the per-doc chunk index grid serves both the span and the
    // boundary legs. Scale: per-row map work; output is a source grid.
    "q346_chunking_audit" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"),
          length(col("text")).as("nc"))
        .withColumn("n_chunks", expr(
          s"1 + CAST((greatest(nc - $ChunkLen, 0) + $ChunkStride - 1)" +
            s" DIV $ChunkStride AS BIGINT)"))
      val chunks = docs
        .select(col("source"), col("text"), col("nc"), col("n_chunks"),
          explode(expr("sequence(CAST(0 AS BIGINT), n_chunks - 1)")).as("i"))
        .withColumn("span", expr(s"least(CAST($ChunkLen AS BIGINT), nc - i * $ChunkStride)"))
        .withColumn("brk", when(col("i") > 0 &&
          expr(s"substring(text, CAST(i * $ChunkStride AS INT), 1)") =!= " " &&
          expr(s"substring(text, CAST(i * $ChunkStride + 1 AS INT), 1)") =!= " ",
          1L).otherwise(0L))
      chunks.groupBy("source").agg(
          count(lit(1)).cast("long").as("n_chunks"),
          sum(when(col("i") === 0, col("nc")).otherwise(0L)).as("n_chars"),
          sum(col("span")).as("span_chars"),
          sum(when(col("i") > 0, 1L).otherwise(0L)).as("n_boundaries"),
          sum(col("brk")).cast("long").as("broken"))
        .select(col("source"), col("n_chunks"),
          col("n_chars").cast("long").as("n_chars"),
          col("span_chars").cast("long").as("span_chars"),
          expr("CAST((span_chars - n_chars) * 1000000 DIV n_chars AS BIGINT)")
            .as("overlap_ppm"),
          col("n_boundaries").cast("long").as("n_boundaries"),
          col("broken"),
          expr("CAST(CASE WHEN n_boundaries = 0 THEN 0" +
            " ELSE broken * 1000000 DIV n_boundaries END AS BIGINT)")
            .as("broken_ppm"))
        .orderBy("source")
    },

    // Interval-UNION coverage (the sweep-line islands-and-gaps staple):
    // each event covers [ts, ts+CoverUs); per user, overlapping or
    // touching intervals merge into islands (an event starts a new
    // island iff its start exceeds the running max end of everything
    // before it — the classic prefix-max sweep, exact because islands
    // are contiguous by construction). Emitted as the islands-per-user
    // distribution: users, total covered seconds, and max island span
    // per island count — the session-structure fingerprint D5k's fixed
    // 30-min sessionization cannot see. Scale: ONE per-user window pass
    // (partitioned, never global); the output grid is bounded by
    // max-events-per-user.
    "q347_interval_coverage" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("en", col("us") + lit(CoverUs))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val isl = ev
        .withColumn("pmax", max(col("en")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_isl",
          when(col("pmax").isNull || col("us") > col("pmax"), 1L).otherwise(0L))
        .withColumn("isl", sum(col("new_isl")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      val perIsland = isl.groupBy("user_id", "isl")
        .agg((max(col("en")) - min(col("us"))).as("cov_us"))
      val perUser = perIsland.groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"), sum(col("cov_us")).as("cov_us"),
          max(col("cov_us")).as("max_us"))
      perUser.groupBy("n_islands")
        .agg(count(lit(1)).cast("long").as("n_users"),
          expr("CAST(sum(cov_us) DIV 1000000 AS BIGINT)").as("covered_s"),
          expr("CAST(max(max_us) DIV 1000000 AS BIGINT)").as("max_island_s"))
        .select(col("n_islands").cast("long").as("n_islands"), col("n_users"),
          col("covered_s"), col("max_island_s"))
        .orderBy("n_islands")
    },

    // THEIL–SEN robust trend over monthly revenue — the median of all
    // pairwise slopes (q267's OLS minimizes squared error and one wild
    // month drags it; the TS estimator has a 29% breakdown point). The
    // slope multiset is kept EXACT-rational: each pair carries
    // (Δcents, Δmonths); the µ-cents/month figure truncates toward zero
    // symmetrically (sign split around non-negative DIV — both engines
    // floor non-negatives identically), and the MEDIAN element is
    // selected by rank under the total order (slope_u, num, den, t1,
    // t2) in the oracle, which is the same VALUE as "the distinct
    // slope_u whose cumulative tie-range covers rank (m+1) DIV 2" —
    // slope_u is the primary sort key, so within its ties the value is
    // constant; the Spark leg selects it by the house
    // predecessor-count rule (never a global window): per distinct
    // slope_u, count the pairs at strictly smaller slopes and keep the
    // value whose [before, before+cnt] range covers the median rank.
    // Scale: the corpus pass is one month grid agg; the pair set is
    // months² — fixed by the generator's 80-month span, NOT the
    // corpus, so the rank join runs on a bounded grid at any SF.
    // Magnitude: |num| ≤ month-cents ≈ 10¹⁰ at sf100; ×10⁶ ≤ 10¹⁶ <
    // int64.
    "q348_theil_sen" -> { (s, d) =>
      // key projected as a named attribute BEFORE the groupBy so the
      // broadcast-audit sees an aggregate grouped only on the
      // horizon-bounded key `t` (the q308 cohort pattern)
      val m = Caches.shared(Tables.orders(s, d)
        .select(((year(col("o_orderdate")) - 1990) * 12 +
            month(col("o_orderdate"))).as("t"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .groupBy("t").agg(sum(col("cents")).as("rc")))
      val pairs = m.select(col("t").as("t1"), col("rc").as("r1"))
        .join(broadcast(m.select(col("t").as("t2"), col("rc").as("r2"))),
          col("t1") < col("t2"))
        .withColumn("num", col("r2") - col("r1"))
        .withColumn("den", col("t2") - col("t1"))
        .withColumn("slope_u", expr("CASE WHEN num >= 0" +
          " THEN num * 1000000 DIV den" +
          " ELSE -((-num) * 1000000 DIV den) END"))
      val g = Caches.shared(pairs.groupBy("slope_u")
        .agg(count(lit(1)).as("cnt")))
      val cum = g.join(broadcast(g.select(col("slope_u").as("u2"),
          col("cnt").as("c2"))), col("u2") < col("slope_u"), "left")
        .groupBy("slope_u", "cnt")
        .agg(coalesce(sum(col("c2")), lit(0L)).as("before"))
      val stats = g.agg(sum(col("cnt")).as("n_pairs"),
        min(col("slope_u")).as("min_slope_u"),
        max(col("slope_u")).as("max_slope_u"))
      val nMonths = m.agg(count(lit(1)).as("n_months"))
      cum.crossJoin(broadcast(stats))
        .filter(expr("(n_pairs + 1) DIV 2 > before" +
          " AND (n_pairs + 1) DIV 2 <= before + cnt"))
        .crossJoin(broadcast(nMonths))
        .select(col("n_months").cast("long").as("n_months"),
          col("n_pairs").cast("long").as("n_pairs"),
          col("slope_u").cast("long").as("ts_slope_u"),
          col("min_slope_u").cast("long").as("min_slope_u"),
          col("max_slope_u").cast("long").as("max_slope_u"))
    },

    // BENFORD first-digit forensic audit over order totals (in cents) —
    // the classic fabricated-numbers screen: observed first-digit
    // shares against the logarithmic expectation, with the scaled χ²
    // contribution per digit. The expected shares are precomputed ppm
    // CONSTANTS (they sum to exactly 10⁶), interpolated into both
    // engines — no transcendental at query time; synthetic uniform-ish
    // prices will NOT follow Benford, and that measured divergence is
    // the point of the audit. Output anchored on the literal 9-digit
    // grid (explicit zero rows). Scale: one map-combined digit count.
    "q349_benford" -> { (s, d) =>
      val cents = Tables.orders(s, d)
        .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("c"))
        .filter(col("c") >= 1)
      val obs = cents
        .select(expr("CAST(substring(CAST(c AS STRING), 1, 1) AS BIGINT)").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val gridArr = BenfordPpm.zipWithIndex.map { case (p, i) =>
        s"struct(CAST(${i + 1} AS BIGINT) AS digit, CAST($p AS BIGINT) AS exp_ppm)"
      }.mkString("array(", ", ", ")")
      val grid = s.range(1).select(explode(expr(gridArr)).as("g"))
        .select(col("g.digit").as("digit"), col("g.exp_ppm").as("exp_ppm"))
      val tot = obs.agg(sum(col("n")).as("total"))
      grid.join(obs, Seq("digit"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("obs_ppm", expr("CAST(n * 1000000 DIV total AS BIGINT)"))
        .select(col("digit"), col("n").cast("long").as("n"),
          col("obs_ppm"), col("exp_ppm"),
          abs(col("obs_ppm") - col("exp_ppm")).as("abs_delta_ppm"),
          expr("CAST((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) DIV exp_ppm" +
            " AS BIGINT)").as("chi2_scaled"))
        .orderBy("digit")
    },

    // GDPR DELETION-CASCADE planner — the table a right-to-be-forgotten
    // batch reads before it runs: a deterministic 5% customer cohort
    // (engine-neutral md5 acceptance, the q64 hash-sampling rule, so
    // the same customers delete in every engine and every rerun), the
    // referential closure it drags along (their orders, those orders'
    // lineitems), and the post-delete ORPHAN audit per table — rows
    // whose parent is in the deletion set but which the closure missed
    // (zero BY CONSTRUCTION for a transitive closure; measured, not
    // assumed — the q158 rule). Scale: two semi-join hops on the FK
    // spine, never broadcast-hinted (a 5% cohort grows with the data);
    // counts map-combine.
    "q350_deletion_cascade" -> { (s, d) =>
      val cohort = Tables.customer(s, d)
        .filter(expr("CAST(conv(substring(md5(CAST(c_custkey AS STRING))," +
          " 1, 15), 16, 10) AS BIGINT) % 100 < 5"))
        .select(col("c_custkey"))
      val delOrders = Tables.orders(s, d)
        .join(cohort, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"))
      val delLines = Tables.lineitem(s, d)
        .join(delOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_linenumber"))
      // orphan audit: lineitems referencing a DELETED order that the
      // closure itself would not delete — the anti-of-the-semi, so the
      // count is a measured zero
      val orphans = Tables.lineitem(s, d)
        .join(delOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(delLines.select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2")),
          col("l_orderkey") === col("k1") && col("l_linenumber") === col("k2"),
          "left_anti")
      val c = Tables.customer(s, d).agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(cohort.agg(count(lit(1)).as("n_delete"))))
        .select(lit("customer").as("table_name"), col("n_rows"), col("n_delete"),
          lit(0L).as("n_orphans"))
      val o = Tables.orders(s, d).agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(delOrders.agg(count(lit(1)).as("n_delete"))))
        .select(lit("orders").as("table_name"), col("n_rows"), col("n_delete"),
          lit(0L).as("n_orphans"))
      val l = Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(delLines.agg(count(lit(1)).as("n_delete"))))
        .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orph"))))
        .select(lit("lineitem").as("table_name"), col("n_rows"), col("n_delete"),
          col("n_orph").as("n_orphans"))
      c.unionByName(o).unionByName(l)
        .select(col("table_name"), col("n_rows").cast("long").as("n_rows"),
          col("n_delete").cast("long").as("n_delete"),
          expr("CAST(n_delete * 1000000 DIV n_rows AS BIGINT)").as("delete_ppm"),
          col("n_orphans").cast("long").as("n_orphans"))
        .orderBy("table_name")
    },

    // PARETO FRONTIER (2-D skyline) over parts — maximize p_size,
    // minimize price: the multi-objective shortlist every "best value"
    // curation pass computes. Reduced FIRST to the 50-row size grid
    // (per size: part count + cheapest part under the (price, partkey)
    // total order), then a size is on the frontier iff NO larger size
    // is as cheap or cheaper — best_price < min over larger sizes,
    // evaluated by the predecessor-count-style successor join on the
    // grid (the max size, having no successors, is always on the
    // frontier via the left join's NULL). Scale: one map-combined agg
    // to the schema-bounded grid; the skyline itself is grid² algebra.
    "q351_pareto_frontier" -> { (s, d) =>
      val g = Caches.shared(Tables.part(s, d)
        .select(col("p_size"),
          expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("pc"),
          col("p_partkey"))
        .groupBy("p_size")
        .agg(count(lit(1)).as("n_parts"),
          min(struct(col("pc"), col("p_partkey"))).as("best"))
        .select(col("p_size"), col("n_parts"),
          col("best.pc").as("best_price_c"),
          col("best.p_partkey").as("best_partkey")))
      g.join(broadcast(g.select(col("p_size").as("s2"),
          col("best_price_c").as("bp2"))), col("s2") > col("p_size"), "left")
        .groupBy("p_size", "n_parts", "best_price_c", "best_partkey")
        .agg(min(col("bp2")).as("min_larger"))
        .select(col("p_size").cast("long").as("p_size"),
          col("n_parts").cast("long").as("n_parts"),
          col("best_price_c"), col("best_partkey").cast("long").as("best_partkey"),
          (col("min_larger").isNull ||
            col("best_price_c") < col("min_larger")).as("on_frontier"))
        .orderBy("p_size")
    },

    // MAX-DRAWDOWN audit over the daily event-volume series per type —
    // the "how far below its own peak has this feed fallen" measure
    // finance runs on equity curves and pipelines should run on feed
    // volume (a slow bleed never trips q344's point-anomaly MAD rule;
    // drawdown catches it): running peak via the partitioned prefix-max
    // window, dd = peak − n, plus days-underwater and the FIRST day the
    // maximum drawdown was reached (max(struct(dd, −day)) — the
    // (max dd, min day) tiebreak in one aggregate). Scale: one
    // map-combined (type, day) pass; windows PARTITIONED by event_type
    // over the horizon-bounded day grid.
    "q352_drawdown" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val dd = daily
        .withColumn("peak", max(col("n")).over(w))
        .withColumn("dd", col("peak") - col("n"))
        .withColumn("di", datediff(col("day"), lit("1990-01-01").cast("date")))
      dd.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          max(col("peak")).cast("long").as("peak_max"),
          max(col("dd")).cast("long").as("max_drawdown"),
          sum(when(col("dd") > 0, 1L).otherwise(0L)).cast("long")
            .as("days_underwater"),
          max(struct(col("dd"), (-col("di")).as("ni"))).as("m"))
        .select(col("event_type"), col("n_days"), col("peak_max"),
          col("max_drawdown"), col("days_underwater"),
          expr("date_add(CAST('1990-01-01' AS DATE), CAST(-m.ni AS INT))")
            .as("max_dd_day"))
        .orderBy("event_type")
    },

    // RANGE-PARTITION boundary planner — the exact image of Spark's
    // RangePartitioner decision (sample → pick split points) computed
    // EXACTLY: for 8 target partitions over documents sorted by
    // n_chars, the 7 split values at ideal ranks k·n DIV 8, each chosen
    // by the predecessor-count rule over the schema-bounded n_chars
    // grid (the value whose cumulative tie-range covers the rank), with
    // the achieved rank and the overshoot a DISCRETE key forces — ties
    // cannot be split, and overshoot_ppm prices exactly the skew that
    // sampling-based planners only estimate. Scale: one map-combined
    // value-grid agg; the cum/boundary joins are grid² and grid×7.
    "q353_range_splits" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("n_chars").agg(count(lit(1)).as("cnt")))
      val cum = g.join(broadcast(g.select(col("n_chars").as("v2"),
          col("cnt").as("c2"))), col("v2") < col("n_chars"), "left")
        .groupBy("n_chars", "cnt")
        .agg(coalesce(sum(col("c2")), lit(0L)).as("before"))
      val tot = g.agg(sum(col("cnt")).as("n"))
      val ks = g.sparkSession.range(1, 8).select(col("id").as("k"))
      ks.crossJoin(broadcast(tot))
        .withColumn("target_rank", expr("k * n DIV 8"))
        .join(broadcast(cum),
          col("target_rank") > col("before") &&
            col("target_rank") <= col("before") + col("cnt"))
        .select(col("k").cast("long").as("k"),
          col("target_rank").cast("long").as("target_rank"),
          col("n_chars").cast("long").as("boundary_n_chars"),
          (col("before") + col("cnt")).cast("long").as("cum_le_boundary"),
          expr("CAST((before + cnt - target_rank) * 1000000 DIV n AS BIGINT)")
            .as("overshoot_ppm"))
        .orderBy("k")
    },

    // K-ANONYMITY audit over the (nation, segment, balance-band)
    // quasi-identifier — the re-identification screen run before a
    // customer extract ships (t-closeness/q275 measures attribute
    // disclosure; this measures IDENTITY disclosure): equivalence-class
    // sizes bucketed into the standard risk bands, with the global
    // minimum k and the k<5 violator population every row carries.
    // Balance band = floor(acctbal/1000) on exact cents — a ≤12-value
    // schema-bounded key, so the class grid is domain-bounded (≤25·5·12
    // classes). Scale: one map-combined class count; band algebra on
    // the grid.
    "q354_k_anonymity" -> { (s, d) =>
      val cls = Caches.shared(Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          // OFFSET by +100000 cents so the dividend stays positive —
          // Spark's DIV truncates toward zero while DuckDB's // floors,
          // and they only agree on non-negatives (the q348 sign rule)
          expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " + 100000) DIV 100000").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("ksz")))
      val glob = cls.agg(min(col("ksz")).as("min_k"),
        sum(when(col("ksz") < 5, col("ksz")).otherwise(0L)).as("n_below5"))
      cls
        .withColumn("band",
          when(col("ksz") === 1, "a_unique")
            .when(col("ksz") <= 4, "b_2_4")
            .when(col("ksz") <= 9, "c_5_9")
            .otherwise("d_10_plus"))
        .groupBy("band")
        .agg(count(lit(1)).cast("long").as("n_classes"),
          sum(col("ksz")).cast("long").as("n_customers"))
        .crossJoin(broadcast(glob))
        .select(col("band"), col("n_classes"), col("n_customers"),
          col("min_k").cast("long").as("min_k"),
          col("n_below5").cast("long").as("n_below_k5"))
        .orderBy("band")
    },

    // JOHNSON–LINDENSTRAUSS random-projection distortion audit: project
    // the 64-d embeddings to 16-d with the deterministic ±1 sign matrix
    // (the q336 plane-lattice hash, so both engines build the identical
    // matrix from the (i,j) index alone) and measure, over the bounded
    // query-sample pair set, how well d16²/16 estimates d64² — the
    // distance-preservation table read before an index is served on
    // projected vectors (q334 SLICES dimensions; JL MIXES them, which is
    // why it works on non-Matryoshka embeddings). EXACT integers
    // throughout: components quantize to floor(x·10³+0.5) (the
    // lshBuckets trick), so projections, squared distances, and the
    // ratio are engine-exact with no float-summation order to pin.
    // Magnitude: |y| ≤ 64·2·10³, d16² ≤ 16·(2.6·10⁵)² ≈ 10¹²; ×10⁶
    // < 10¹⁸ holds int64 for any |x| ≤ 2 embedding. Scale: projection
    // is ONE runtime fold per row (value accumulator, the q341 rule);
    // the pair set is sample²-bounded.
    "q355_jl_projection" -> { (s, d) =>
      val q3 = Tables.embeddings(s, d)
        .select(col("vec_id"), expr("transform(CAST(embedding AS ARRAY<DOUBLE>)," +
          " x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))").as("q"))
        .filter(col("vec_id") % 50 === 0).orderBy("vec_id").limit(64)
      // NOT cached: the broadcast-audit needs the LIMIT visible in the
      // plan (a cache leaf carries vec_id, a fact marker), and the
      // 64-row projection is cheaper than the cache round-trip anyway
      val proj = q3.withColumn("y", expr(
        """transform(sequence(0, 15), i ->
          |  aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, j) ->
          |    acc + (CASE WHEN (i * 7919 + j * 104729) % 2001 - 1000 >= 0
          |           THEN 1 ELSE -1 END) * element_at(q, j + 1)))""".stripMargin))
      val pairs = proj.select(col("vec_id").as("ida"), col("q").as("qa"),
          col("y").as("ya"))
        .join(broadcast(proj.select(col("vec_id").as("idb"), col("q").as("qb"),
          col("y").as("yb"))), col("ida") < col("idb"))
        // codegen'd integer kernels — the pair sweep evaluates both
        // distances per pair; vec_l2sq_q keeps them in WholeStageCodegen
        .withColumn("d64",
          graft.functions.VectorExpressions.vec_l2sq_q(col("qa"), col("qb")))
        .withColumn("d16",
          graft.functions.VectorExpressions.vec_l2sq_q(col("ya"), col("yb")))
        .withColumn("ratio_u", expr("CASE WHEN d64 = 0 THEN CAST(1000000 AS BIGINT)" +
          " ELSE d16 * 1000000 DIV (16 * d64) END"))
      pairs.agg(count(lit(1)).cast("long").as("n_pairs"),
          min(col("ratio_u")).cast("long").as("min_ratio_u"),
          max(col("ratio_u")).cast("long").as("max_ratio_u"),
          sum(col("ratio_u")).as("sr"),
          sum(when(abs(col("ratio_u") - 1000000L) <= 100000L, 1L).otherwise(0L))
            .cast("long").as("n_within_10pct"))
        .select(col("n_pairs"), col("min_ratio_u"), col("max_ratio_u"),
          expr("CAST(sr DIV n_pairs AS BIGINT)").as("mean_ratio_u"),
          col("n_within_10pct"))
    },

    // FARTHEST-POINT traversal (Gonzalez maximin, the k-center /
    // coreset seeding active-learning batches run to pick MAXIMALLY
    // DIVERSE exemplars — where q83's k-means step refines given
    // centers, this PICKS them with a 2-approximation guarantee): seed
    // at min vec_id, then 3× "take the point whose distance to its
    // nearest selected is largest" (argmax by the (mindist, −id)
    // struct-max tiebreak). Distances are exact integers on the q355
    // 10³ quantization grid, so the traversal is engine-identical.
    // Scale: k−1 corpus passes, each joining the cached corpus against
    // a ≤k-row broadcast of the selected set — never corpus×corpus.
    "q356_farthest_points" -> { (s, d) =>
      val corpus = Caches.shared(Tables.embeddings(s, d)
        .select(col("vec_id"), expr("transform(CAST(embedding AS ARRAY<DOUBLE>)," +
          " x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))").as("q")))
      val seed = corpus.orderBy("vec_id").limit(1)
        .select(col("vec_id"), col("q"), lit(1L).as("step"),
          lit(0L).as("mindist_sq"))
      var sel = seed
      for (k <- 2 to 4) {
        // q rides through the groupBy and the struct-argmax (the
        // struct order decides on (mind, −id) before ever comparing
        // it), so the next selected point needs NO join back to the
        // corpus — which keeps every broadcast side a groupless
        // aggregate the plan audit can prove bounded
        val cand = corpus.join(sel.select(col("vec_id").as("xid")),
            col("vec_id") === col("xid"), "left_anti")
          .crossJoin(broadcast(sel.select(col("q").as("sq"))))
          // codegen'd integer kernel (vec_l2sq_q) — the corpus×selected
          // sweep repeats every round, so it must not be an eval island
          .withColumn("d2",
            graft.functions.VectorExpressions.vec_l2sq_q(col("q"), col("sq")))
          .groupBy("vec_id", "q").agg(min(col("d2")).as("mind"))
        val next = cand
          .agg(max(struct(col("mind"), (-col("vec_id")).as("ni"), col("q")))
            .as("m"))
          .select((-col("m.ni")).as("vec_id"), col("m.q").as("q"),
            lit(k.toLong).as("step"), col("m.mind").as("mindist_sq"))
        sel = sel.unionByName(next)
      }
      sel.select(col("step"), col("vec_id").cast("long").as("vec_id"),
          col("mindist_sq").cast("long").as("mindist_sq"))
        .orderBy("step")
    },

    // SAMPLE-RATIO-MISMATCH (SRM) check — the first gate every
    // experimentation platform runs before reading any metric: users
    // hash-split 50/50 (engine-neutral md5 acceptance), then the
    // per-stratum UNIT counts compared arm vs arm with the scaled χ²
    // statistic ((n_a−n_b)²·10⁶ DIV total — exact because the expected
    // split is exactly half). Imbalance in any stratum means the
    // assignment, not the treatment, moved the metric. The '__all__'
    // row counts distinct users globally (a user spans strata, so it is
    // NOT the column sum — computed separately, the q342 merge-row
    // discipline). Scale: one distinct-user pass per stratum grid +
    // one global; counts map-combine.
    "q357_srm_check" -> { (s, d) =>
      val u = Tables.events(s, d)
        .select(col("event_type"), col("user_id"),
          expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15)," +
            " 16, 10) AS BIGINT) % 2").as("arm"))
      val per = u.select("event_type", "user_id", "arm").distinct()
        .groupBy("event_type")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      val all = u.select("user_id", "arm").distinct()
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
        .select(lit("__all__").as("event_type"), col("n_a"), col("n_b"))
      per.unionByName(all)
        .select(col("event_type"), col("n_a").cast("long").as("n_a"),
          col("n_b").cast("long").as("n_b"),
          expr("CAST(abs(n_a - n_b) * 1000000 DIV (n_a + n_b) AS BIGINT)")
            .as("delta_ppm"),
          expr("CAST((n_a - n_b) * (n_a - n_b) * 1000000 DIV (n_a + n_b)" +
            " AS BIGINT)").as("chi2_scaled"))
        .orderBy("event_type")
    },

    // PEAK sliding-window load — the capacity number a feed is
    // provisioned for (q311's freshness reads the now; this reads the
    // worst hour ever): events bucketed to 5-min cells per type, the
    // 1-hour peak as a 12-bucket RANGE-frame sliding sum over the
    // bucket index (RANGE, not ROWS — empty buckets are absent from the
    // grid and a row frame would silently span gaps), peak start by
    // join-back min-bucket selection. Scale: one map-combined
    // (type, bucket) pass; windows PARTITIONED by type over the
    // horizon-bounded bucket grid.
    "q358_peak_window" -> { (s, d) =>
      val b = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 300000000").as("b"))
        .groupBy("event_type", "b").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy(col("b"))
        .rangeBetween(-11, 0)
      val sl = b.withColumn("win", sum(col("n")).over(w))
      val agg = sl.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_buckets"),
          sum(col("n")).cast("long").as("total_events"),
          max(col("win")).cast("long").as("peak_events"))
      val sel = sl.join(agg.select(col("event_type"), col("peak_events")),
          Seq("event_type"))
        .filter(col("win") === col("peak_events"))
        .groupBy("event_type").agg(min(col("b")).as("pb"))
      agg.join(sel, "event_type")
        .select(col("event_type"), col("n_buckets"), col("total_events"),
          col("peak_events"),
          expr("CAST((pb - 11) * 300000000 AS BIGINT)").as("peak_window_start_us"))
        .orderBy("event_type")
    },

    // Order-to-ship SLA latency table — exact p50/p90/p99 shipping
    // latency in days per order priority (the contract-compliance table
    // an ops review reads; interpolating percentiles are useless in an
    // SLA argument — the quantile must be an ACTUAL observed latency):
    // rank_k = ceil(n·k/100) selected by the predecessor-count rule
    // over the (priority, latency-days) grid — latency is
    // horizon-bounded, so the grid is ≤ 5·|days| at any SF. Scale: the
    // one corpus-sized step is the canonical lineitem⋈orders key join;
    // everything after is grid algebra.
    "q359_sla_latency" -> { (s, d) =>
      val lat = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("prio"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("lat"))
      val g = Caches.shared(lat.groupBy("prio", "lat")
        .agg(count(lit(1)).as("cnt")))
      val cum = g.join(broadcast(g.select(col("prio").as("p2"),
          col("lat").as("l2"), col("cnt").as("c2"))),
          col("p2") === col("prio") && col("l2") < col("lat"), "left")
        .groupBy("prio", "lat", "cnt")
        .agg(coalesce(sum(col("c2")), lit(0L)).as("before"))
      val tot = g.groupBy("prio").agg(sum(col("cnt")).as("n"))
      val ks = g.sparkSession.range(1).select(explode(expr(
        "array(CAST(50 AS BIGINT), CAST(90 AS BIGINT), CAST(99 AS BIGINT))"))
        .as("k"))
      val picked = tot.crossJoin(broadcast(ks))
        .withColumn("rk", expr("(n * k + 99) DIV 100"))
        .join(broadcast(cum), Seq("prio"))
        .filter(col("rk") > col("before") &&
          col("rk") <= col("before") + col("cnt"))
      picked.groupBy("prio")
        .agg(max(col("n")).cast("long").as("n_lines"),
          max(when(col("k") === 50, col("lat"))).cast("long").as("p50_days"),
          max(when(col("k") === 90, col("lat"))).cast("long").as("p90_days"),
          max(when(col("k") === 99, col("lat"))).cast("long").as("p99_days"))
        .orderBy("prio")
    },

    // CARDINALITY-ESTIMATION q-error audit — the cost-based-optimizer
    // science every join-order decision rests on: walk the star's
    // canonical chain (nation ⋈ customer ⋈ orders ⋈ lineitem), compute
    // each step's System-R estimate |A|·|B| DIV max(ndv_A(k), ndv_B(k))
    // CASCADED from the previous step's estimate (exactly how a planner
    // compounds its errors), and price it against the measured
    // cardinality with the standard q-error. ONE stats pass per table
    // (exact NDVs — this audits the formula, not a sketch); the actuals
    // are the three real joins, which ARE the corpus-sized work.
    // Magnitude: est·|B| ≤ 10¹⁶ at sf100; DECIMAL(38,0) widening keeps
    // the headroom.
    "q360_cardinality_qerror" -> { (s, d) =>
      val st = Tables.nation(s, d)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("n_nationkey")).as("n_ndv"))
        .crossJoin(Tables.customer(s, d)
          .agg(count(lit(1)).as("c_rows"),
            countDistinct(col("c_nationkey")).as("c_nk_ndv"),
            countDistinct(col("c_custkey")).as("c_ck_ndv")))
        .crossJoin(Tables.orders(s, d)
          .agg(count(lit(1)).as("o_rows"),
            countDistinct(col("o_custkey")).as("o_ck_ndv"),
            countDistinct(col("o_orderkey")).as("o_ok_ndv")))
        .crossJoin(Tables.lineitem(s, d)
          .agg(count(lit(1)).as("l_rows"),
            countDistinct(col("l_orderkey")).as("l_ok_ndv")))
        .withColumn("est1", expr("CAST(CAST(n_rows AS DECIMAL(38,0)) * c_rows" +
          " DIV greatest(n_ndv, c_nk_ndv) AS BIGINT)"))
        .withColumn("est2", expr("CAST(CAST(est1 AS DECIMAL(38,0)) * o_rows" +
          " DIV greatest(c_ck_ndv, o_ck_ndv) AS BIGINT)"))
        .withColumn("est3", expr("CAST(CAST(est2 AS DECIMAL(38,0)) * l_rows" +
          " DIV greatest(o_ok_ndv, l_ok_ndv) AS BIGINT)"))
      val a1 = Tables.nation(s, d).join(Tables.customer(s, d),
        col("n_nationkey") === col("c_nationkey"))
        .agg(count(lit(1)).as("act1"))
      val a2 = Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"))
        .agg(count(lit(1)).as("act2"))
      val a3 = Tables.orders(s, d).join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("act3"))
      // step-2/3 actuals are the full-chain prefixes: customer⋈orders
      // and orders⋈lineitem have no dangling rows vs the chain (FK
      // integrity, audited by q103), so the pair joins ARE the chain
      // cardinalities — one join each instead of re-joining the prefix
      val j = st.crossJoin(broadcast(a1)).crossJoin(broadcast(a2))
        .crossJoin(broadcast(a3))
      def leg(nm: String, est: String, act: String) =
        j.select(lit(nm).as("step"), col(est).cast("long").as("est_rows"),
          col(act).cast("long").as("actual_rows"),
          expr(s"CAST(greatest($est, $act) * 1000000" +
            s" DIV greatest(least($est, $act), 1) AS BIGINT)").as("q_error_ppm"))
      leg("s1_nation_customer", "est1", "act1")
        .unionByName(leg("s2_join_orders", "est2", "act2"))
        .unionByName(leg("s3_join_lineitem", "est3", "act3"))
        .orderBy("step")
    },

    // ZONE-MAP file-skipping simulator — the parquet min/max pruning
    // decision measured exactly, for the SAME corpus under two layouts:
    // 32 files by insertion order (doc_id ranges — the layout you get
    // for free) vs 32 files value-clustered on the filter column (what
    // a sort-on-write buys). For each `n_chars < T` threshold: files
    // skipped (zone min ≥ T), rows actually scanned, true matches, and
    // the scan amplification — THE number that justifies a re-cluster
    // job (q294 compares curve orders; this prices the skipping
    // itself). Scale: one stats pass builds both zone maps; the
    // threshold sweep is grid algebra on 2×32 zones.
    "q361_zonemap_skip" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val mx = docs.agg(max(col("doc_id")).as("mi"), max(col("n_chars")).as("mn"))
      val filed = Caches.shared(docs.crossJoin(broadcast(mx))
        .select(col("n_chars"),
          expr("doc_id * 32 DIV (mi + 1)").as("f_row"),
          expr("n_chars * 32 DIV (mn + 1)").as("f_clu")))
      def zones(fcol: String, layout: String) = filed
        .groupBy(col(fcol).as("fid"))
        .agg(min(col("n_chars")).as("zmin"), count(lit(1)).as("rows"))
        .select(lit(layout).as("layout"), col("fid"), col("zmin"), col("rows"))
      val z = zones("f_row", "a_insertion_order")
        .unionByName(zones("f_clu", "b_value_clustered"))
      val ts = docs.sparkSession.range(1, 6)
        .select((col("id") * 100).cast("long").as("t"))
      val matching = docs.crossJoin(broadcast(ts))
        .filter(col("n_chars") < col("t"))
        .groupBy("t").agg(count(lit(1)).as("n_match"))
      z.crossJoin(broadcast(ts))
        .groupBy("layout", "t")
        .agg(count(lit(1)).cast("long").as("files_total"),
          sum(when(col("zmin") >= col("t"), 1L).otherwise(0L)).cast("long")
            .as("files_skipped"),
          sum(when(col("zmin") < col("t"), col("rows")).otherwise(0L))
            .cast("long").as("rows_scanned"))
        .join(broadcast(matching), Seq("t"), "left")
        .select(col("layout"), col("t"), col("files_total"),
          col("files_skipped"), col("rows_scanned"),
          coalesce(col("n_match"), lit(0L)).cast("long").as("rows_matching"),
          expr("CAST(rows_scanned * 1000000" +
            " DIV greatest(coalesce(n_match, 0), 1) AS BIGINT)")
            .as("scan_amplification_ppm"))
        .orderBy("layout", "t")
    },

    // 2σ-DIMENSION outlier census over the embeddings — per vector, in
    // how many of its 64 dimensions it sits beyond two standard
    // deviations of that dimension's corpus distribution (the
    // Mahalanobis-diagonal screen run before outliers poison a
    // centroid/ANN build), emitted as the census histogram. The σ test
    // is EXACT integer cross-multiplication on the 10³ quantization
    // grid: (q·n − Σq)² > 4·(n·Σq² − (Σq)²) — no sqrt, no division, no
    // float; DECIMAL(38,0) widening because (q·n)² exceeds int64 past
    // ~10⁶ vectors. Scale: one posexplode pass to 64-key per-dim
    // stats; the flag pass re-joins the broadcast stats grid.
    "q362_sigma_dims" -> { (s, d) =>
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(expr(
          "transform(CAST(embedding AS ARRAY<DOUBLE>)," +
            " x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))"))
          .as(Seq("dim", "qv")))
      val st = q.groupBy("dim")
        .agg(count(lit(1)).as("n"), sum(col("qv")).as("sq"),
          sum(col("qv") * col("qv")).as("sqq"))
      val flags = q.join(broadcast(st), "dim")
        .withColumn("dev_n", expr("qv * n - sq"))
        .withColumn("is_out", expr(
          "CAST(dev_n AS DECIMAL(38,0)) * dev_n >" +
            " 4 * (CAST(n AS DECIMAL(38,0)) * sqq - CAST(sq AS DECIMAL(38,0)) * sq)"))
      flags.groupBy("vec_id")
        .agg(sum(when(col("is_out"), 1L).otherwise(0L)).as("k"))
        .groupBy("k").agg(count(lit(1)).cast("long").as("n_vectors"))
        .select(col("k").cast("long").as("n_outlier_dims"), col("n_vectors"))
        .orderBy("n_outlier_dims")
    },

    // CUSUM change-point detector over daily event volume — the
    // SEQUENTIAL drift alarm that completes the anomaly triptych (q344
    // flags single outlier days, q352 prices the fall from a peak;
    // CUSUM accumulates SMALL persistent shifts until they cross a
    // threshold — the Page 1954 control chart). Exact integers by the
    // closed form: with P_t the prefix sum of (x_t·D − T) (D = days,
    // T = total — so the target mean needs NO division), S_t = P_t −
    // running_min(P) and the alarm fires when S_t > 4·T (cumulative
    // excess worth 4 average days). Windows PARTITIONED by type over
    // the horizon-bounded day grid; one corpus pass.
    "q364_cusum" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val tot = daily.groupBy("event_type")
        .agg(count(lit(1)).as("dd"), sum(col("n")).as("tt"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val su = daily.join(broadcast(tot), "event_type")
        .withColumn("p", sum(col("n") * col("dd") - col("tt")).over(w))
        .withColumn("pmin", min(least(col("p"), lit(0L))).over(w))
        .withColumn("cusum", col("p") - col("pmin"))
      val agg = su.groupBy("event_type")
        .agg(max(col("dd")).cast("long").as("n_days"),
          max(col("tt")).cast("long").as("total_events"),
          max(col("cusum")).cast("long").as("max_cusum"),
          sum(when(col("cusum") > lit(4L) * col("tt"), 1L).otherwise(0L))
            .cast("long").as("n_alarm_days"))
      val first = su.filter(col("cusum") > lit(4L) * col("tt"))
        .groupBy("event_type").agg(min(col("day")).as("first_alarm_day"))
      agg.join(first, Seq("event_type"), "left")
        .select(col("event_type"), col("n_days"), col("total_events"),
          col("max_cusum"), col("n_alarm_days"), col("first_alarm_day"))
        .orderBy("event_type")
    },

    // READABILITY sufficient statistics per source — the exact integer
    // inputs of every readability formula (Flesch et al. are affine in
    // words/sentence and syllables/word with float constants, so per
    // the log-free rule both engines stop at the sufficient-statistic
    // table; the ppm ratios already rank sources): sentences by
    // terminal punctuation runs, words by whitespace tokens, the
    // classic vowel-GROUP syllable proxy by regexp runs — one regex
    // class+quantifier, byte-identical in RE2 and Java. Scale: pure
    // per-row map work; one grid agg; text never shuffles.
    "q365_readability" -> { (s, d) =>
      val f = Tables.documents(s, d).select(col("source"),
        expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long").as("sents"),
        expr("size(split(trim(text), ' +'))").cast("long").as("words"),
        expr("size(regexp_extract_all(text, '[aeiouAEIOU]+', 0))").cast("long")
          .as("vgroups"))
      f.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("words")).cast("long").as("words"),
          sum(col("sents")).cast("long").as("sentences"),
          sum(col("vgroups")).cast("long").as("vowel_groups"))
        .select(col("source"), col("n_docs"), col("words"), col("sentences"),
          col("vowel_groups"),
          expr("CAST(words * 1000000 DIV greatest(sentences, 1) AS BIGINT)")
            .as("words_per_sentence_ppm"),
          expr("CAST(vowel_groups * 1000000 DIV greatest(words, 1) AS BIGINT)")
            .as("vgroups_per_word_ppm"))
        .orderBy("source")
    },

    // SPLIT-CONFORMAL calibration table — distribution-free uncertainty
    // quantification (Vovk; the ML-ops staple): hash-split events 40/60
    // into calibration/test, per type take the calibration median as
    // the point prediction, the ⌈0.9(n+1)⌉-th smallest absolute
    // residual as the conformal quantile q̂, and MEASURE the test-side
    // coverage of [med − q̂, med + q̂] — marginal validity says it
    // lands ≥ ~90%, and the spec asserts the finite-sample bound.
    // Values quantize to µ-integers first, medians/quantiles are exact
    // rank selection under (value, event_id) total orders via windows
    // PARTITIONED by event_type (the q344 convention). One corpus
    // pass builds the split; everything else is per-type grid work.
    "q366_conformal" -> { (s, d) =>
      // event_id is consumed for the hash split, then DROPPED before the
      // cache: the rank-selected VALUE at a given rank is the same for
      // every tie order (same multiset), so the windows below need no
      // tiebreak key — and the cached leaf carrying no fact marker is
      // what lets the med/qhat grids broadcast past the plan audit
      val ev = Caches.shared(Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("vu"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15)," +
            " 16, 10) AS BIGINT) % 5").as("arm")))
      val cal = ev.filter(col("arm") < 2)
      val test = ev.filter(col("arm") >= 2)
      val nCal = cal.groupBy("event_type").agg(count(lit(1)).as("n_cal"))
      val wv = Window.partitionBy("event_type").orderBy(col("vu"))
      val med = cal.withColumn("rn", row_number().over(wv))
        .join(broadcast(nCal), "event_type")
        .filter(col("rn") === expr("(n_cal + 1) DIV 2"))
        .select(col("event_type"), col("vu").as("med_u"))
      val resid = cal.join(broadcast(med), "event_type")
        .withColumn("r", abs(col("vu") - col("med_u")))
      val wr = Window.partitionBy("event_type").orderBy(col("r"))
      val qhat = resid.withColumn("rn", row_number().over(wr))
        .join(broadcast(nCal), "event_type")
        .filter(col("rn") === expr("least((9 * (n_cal + 1) + 9) DIV 10, n_cal)"))
        .select(col("event_type"), col("r").as("qhat_u"))
      test.join(broadcast(med), "event_type")
        .join(broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_test"),
          max(col("med_u")).cast("long").as("med_u"),
          max(col("qhat_u")).cast("long").as("qhat_u"),
          sum(when(abs(col("vu") - col("med_u")) <= col("qhat_u"), 1L)
            .otherwise(0L)).cast("long").as("n_covered"))
        .join(broadcast(nCal), "event_type")
        .select(col("event_type"), col("n_cal").cast("long").as("n_cal"),
          col("n_test"), col("med_u"), col("qhat_u"), col("n_covered"),
          expr("CAST(n_covered * 1000000 DIV n_test AS BIGINT)")
            .as("coverage_ppm"))
        .orderBy("event_type")
    },

    // RECIPROCAL-RANK FUSION of two retrieval rankings (Cormack et al.
    // 2009 — the parameter-free ensemble every hybrid-search stack
    // ships): for one anchor query, fuse the cosine top-32 with the
    // L2-distance top-32 (different geometries — they genuinely
    // disagree when norms vary) by RRF score Σ ⌊10⁹/(60+rank)⌋,
    // missing-from-a-list clamped to rank 33 (the q309 clamp rule);
    // floor keeps the score an exact integer in both engines. Ranks
    // WITHIN each 32-row list come from predecessor-count joins on the
    // list grids — never a global window; candidate lists are
    // TakeOrdered-bounded. Output: fused top-10.
    "q367_rrf_fusion" -> { (s, d) =>
      val e = vecsQ3(s, d)
      val anchor = e.orderBy("vec_id").limit(1)
        .select(col("q").as("aq"))
      // the anchor stays in the corpus — it simply ranks first in its
      // own cosine list, as a real self-retrieval sanity row would
      val scored = Caches.shared(e.crossJoin(broadcast(anchor))
        .select(col("vec_id"),
          expr("aggregate(zip_with(q, aq, (x, y) -> x * y)," +
            " CAST(0 AS BIGINT), (a, e) -> a + e)").as("dot"),
          graft.functions.VectorExpressions.vec_l2sq_q(col("q"), col("aq"))
            .as("l2")))
      val topCos = scored.orderBy(col("dot").desc, col("vec_id")).limit(32)
        .select(col("vec_id"), col("dot"))
      val topL2 = scored.orderBy(col("l2").asc, col("vec_id")).limit(32)
        .select(col("vec_id"), col("l2"))
      // rank within each 32-row grid = 1 + count of strictly-better rows
      val rA = topCos.join(broadcast(topCos.select(col("dot").as("d2"),
          col("vec_id").as("i2"))),
          col("d2") > col("dot") ||
            (col("d2") === col("dot") && col("i2") < col("vec_id")), "left")
        .groupBy("vec_id").agg((count(col("i2")) + 1).as("rank_cos"))
      val rB = topL2.join(broadcast(topL2.select(col("l2").as("d2"),
          col("vec_id").as("i2"))),
          col("d2") < col("l2") ||
            (col("d2") === col("l2") && col("i2") < col("vec_id")), "left")
        .groupBy("vec_id").agg((count(col("i2")) + 1).as("rank_l2"))
      rA.join(rB, Seq("vec_id"), "full_outer")
        .select(col("vec_id"),
          coalesce(col("rank_cos"), lit(33L)).cast("long").as("rank_cos"),
          coalesce(col("rank_l2"), lit(33L)).cast("long").as("rank_l2"))
        .withColumn("rrf_score", expr("CAST(1000000000 DIV (60 + rank_cos)" +
          " + 1000000000 DIV (60 + rank_l2) AS BIGINT)"))
        .orderBy(col("rrf_score").desc, col("vec_id")).limit(10)
    },

    // TRIMMED-MEAN robust price table per priority — the estimator
    // between q348's median (throws away magnitude) and the raw mean
    // (one fat-finger order moves it): drop the bottom and top 5% BY
    // RANK (exact rank bounds ⌈0.05n⌉ / ⌊0.95n⌋ under the (cents, key)
    // total order, windows PARTITIONED by priority) and report the
    // exact integer mean of what remains next to the raw mean — the
    // gap IS the tail's leverage. One corpus pass; grid output.
    "q368_trimmed_mean" -> { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderpriority").as("prio"),
        col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("c"))
      val n = o.groupBy("prio").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("prio").orderBy(col("c"), col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .join(broadcast(n), "prio")
        .groupBy("prio")
        .agg(max(col("n")).cast("long").as("n_orders"),
          sum(col("c")).as("sum_all"),
          sum(when(col("rn") > expr("(n + 19) DIV 20") &&
            col("rn") <= expr("(19 * n) DIV 20"), col("c")).otherwise(0L))
            .as("sum_mid"),
          sum(when(col("rn") > expr("(n + 19) DIV 20") &&
            col("rn") <= expr("(19 * n) DIV 20"), 1L).otherwise(0L))
            .as("n_mid"))
        .select(col("prio"), col("n_orders"),
          expr("CAST(sum_all DIV n_orders AS BIGINT)").as("mean_cents"),
          col("n_mid").cast("long").as("n_kept"),
          expr("CAST(sum_mid DIV n_mid AS BIGINT)").as("trimmed_mean_cents"),
          expr("CAST(abs(sum_all DIV n_orders - sum_mid DIV n_mid)" +
            " AS BIGINT)").as("tail_leverage_cents"))
        .orderBy("prio")
    },

    // SEMI-MARKOV holding-time table — the DURATION dimension the
    // transition-count grid (D-family q215) and the q341 chain both
    // ignore: per (from → to) edge, how long a user SITS in `from`
    // before that transition fires (mean/max dwell, exact µs integer
    // sums). A funnel whose view→purchase dwell doubles has changed
    // even if its transition PROBABILITIES are identical — this is the
    // table that catches it. One per-user window pass (the q341
    // ordering convention: (ts, event_id) total order); output is the
    // ≤\|types\|² edge grid.
    "q369_holding_times" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val tr = ev
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .withColumn("nxt_us", lead(col("us"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("event_type").as("from_type"), col("nxt").as("to_type"),
          (col("nxt_us") - col("us")).as("dwell_us"))
      tr.groupBy("from_type", "to_type")
        .agg(count(lit(1)).cast("long").as("n_transitions"),
          expr("CAST(sum(dwell_us) DIV count(1) AS BIGINT)").as("mean_dwell_us"),
          max(col("dwell_us")).cast("long").as("max_dwell_us"),
          sum(when(col("dwell_us") === 0, 1L).otherwise(0L)).cast("long")
            .as("n_instant"))
        .orderBy("from_type", "to_type")
    },

    // Exact KOLMOGOROV–SMIRNOV two-sample statistic between every
    // source PAIR's length distributions — the sup-norm CDF distance
    // that catches shape drift TVD's fixed bins smear out (F66's TVD
    // needs a bin width; KS is bin-free). Exact integers by
    // cross-multiplication: D·n_a·n_b = max over the value grid of
    // |F_a(v)·n_b − F_b(v)·n_a|, with each leg's CDF count at v a
    // conditional SUM over its (source, n_chars) grid rows ≤ v (the
    // sup is attained at a sample point, so the shared value grid
    // suffices). Scale: one corpus grid agg; the sweep is
    // |sources|²·|values|² algebra on SCHEMA-bounded domains (length
    // is policy-capped — the q203 n_chars rule), independent of corpus
    // size.
    "q370_ks_statistic" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt")))
      val tot = g.groupBy("source").agg(sum(col("cnt")).as("n"))
      val vals = g.select("n_chars").distinct()
      val pairs = tot.select(col("source").as("sa"), col("n").as("na"))
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          col("sa") < col("sb"))
      // step-CDF computed ONCE per (source, value) over the shared value
      // grid — zero-filled at absent values, then a running-sum window
      // PARTITIONED by source (≤|values| rows per partition, schema-
      // bounded) — and looked up per pair by EQUI-join. The per-pair
      // theta-join form re-summed each source's grid |pairs| times and
      // measured ~4× slower.
      val cumAll = Caches.shared(tot.select(col("source").as("cs"))
        .crossJoin(broadcast(vals))
        .join(broadcast(g.select(col("source").as("g2"),
          col("n_chars").as("v2"), col("cnt").as("c2"))),
          col("g2") === col("cs") && col("v2") === col("n_chars"), "left")
        .select(col("cs"), col("n_chars"),
          coalesce(col("c2"), lit(0L)).as("c0"))
        .withColumn("f", sum(col("c0")).over(Window.partitionBy("cs")
          .orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, 0))))
      val atV = pairs.crossJoin(broadcast(vals))
        .join(broadcast(cumAll.select(col("cs").as("csa"),
          col("n_chars").as("va"), col("f").as("fa"))),
          col("csa") === col("sa") && col("va") === col("n_chars"))
        .join(broadcast(cumAll.select(col("cs").as("csb"),
          col("n_chars").as("vb"), col("f").as("fb"))),
          col("csb") === col("sb") && col("vb") === col("n_chars"))
      atV.groupBy("sa", "sb")
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          max(abs(col("fa") * col("nb") - col("fb") * col("na"))).as("dnum"))
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("n_a"), col("n_b"), col("dnum").cast("long").as("d_scaled"),
          expr("CAST(dnum * 1000000 DIV (n_a * n_b) AS BIGINT)").as("ks_ppm"))
        .orderBy("source_a", "source_b")
    },

    // Exact MANN–WHITNEY U + CLIFF'S DELTA per source pair — the
    // rank-sum location test beside q370's shape test (KS asks "same
    // distribution?", U asks "does one source stochastically WRITE
    // LONGER documents?"): 2U_a = Σ over a's grid values v of
    // cnt_a(v)·(2·cumlt_b(v) + cnt_b(v)) — the doubled form absorbs
    // the ½ tie credit so everything stays integer; Cliff's δ in ppm =
    // (2U_a − n_a·n_b)·10⁶ / (n_a·n_b), sign-split around the
    // non-negative division (the q348 rule). Same grid machinery as
    // q370 — never a corpus² join. Magnitude: 2U ≤ 2·n_a·n_b; int64
    // holds to ~2·10⁹ docs per pair, DECIMAL widening past that.
    "q371_mannwhitney" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt")))
      val tot = g.groupBy("source").agg(sum(col("cnt")).as("n"))
      val pairs = tot.select(col("source").as("sa"), col("n").as("na"))
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          col("sa") < col("sb"))
      val agrid = pairs.join(broadcast(g.select(col("source").as("ga"),
          col("n_chars").as("va"), col("cnt").as("ca"))),
          col("ga") === col("sa"))
      val withLt = agrid.join(broadcast(g.select(col("source").as("gb"),
          col("n_chars").as("vb"), col("cnt").as("cb"))),
          col("gb") === col("sb") && col("vb") < col("va"), "left")
        .groupBy("sa", "sb", "na", "nb", "va", "ca")
        .agg(coalesce(sum(col("cb")), lit(0L)).as("cbl"))
      val withEq = withLt.join(broadcast(g.select(col("source").as("gb2"),
          col("n_chars").as("vb2"), col("cnt").as("cb2"))),
          col("gb2") === col("sb") && col("vb2") === col("va"), "left")
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          (col("ca") * (col("cbl") * 2 + coalesce(col("cb2"), lit(0L))))
            .as("u2part"))
      withEq.groupBy("sa", "sb")
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          sum(col("u2part")).as("u2"))
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("n_a"), col("n_b"), col("u2").cast("long").as("u2_a"),
          expr("CAST(CASE WHEN u2 - n_a * n_b >= 0" +
            " THEN (u2 - n_a * n_b) * 1000000 DIV (n_a * n_b)" +
            " ELSE -((n_a * n_b - u2) * 1000000 DIV (n_a * n_b))" +
            " END AS BIGINT)").as("cliffs_delta_ppm"))
        .orderBy("source_a", "source_b")
    },

    // Exact KRUSKAL–WALLIS mean-rank table — the k-SAMPLE extension of
    // q371's two-sample rank test (one table answers "which sources
    // drift?" where q371 needs all 190 pairs): every doc's MIDRANK over
    // the pooled corpus, doubled to stay integer (2·r̄(v) = 2·cumlt(v)
    // + c_all(v) + 1), summed per source. mean_rank_milli vs the
    // pooled expectation (N+1)/2 ranks sources by stochastic length
    // dominance; the H statistic is a float function of exactly these
    // sufficient statistics (the log-free rule stops here). cumlt by
    // predecessor-count theta-join on the bounded value grid — never a
    // global window (PlanSpec rule). Conservation Σ 2R_i = N(N+1)
    // spec-asserted. Magnitude: 2R ≤ 2N², ×1000 holds int64 to
    // N ≈ 6·10⁷ docs; DECIMAL(38,0) widening past that.
    "q372_kruskal_wallis" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt")))
      val gv = g.groupBy("n_chars").agg(sum(col("cnt")).as("call"))
      val cum = gv.select(col("n_chars").as("v"), col("call"))
        .join(broadcast(gv.select(col("n_chars").as("w"), col("call").as("cw"))),
          col("w") < col("v"), "left")
        .groupBy("v", "call")
        .agg(coalesce(sum(col("cw")), lit(0L)).as("cumlt"))
      val nTot = g.agg(sum(col("cnt")).as("ntot"))
      g.join(broadcast(cum), g("n_chars") === cum("v"))
        .groupBy("source")
        .agg(sum(col("cnt")).cast("long").as("n_docs"),
          sum(col("cnt") * (col("cumlt") * 2 + col("call") + 1)).as("r2"))
        .crossJoin(broadcast(nTot))
        .select(col("source"), col("n_docs"),
          col("r2").cast("long").as("rank2_sum"),
          expr("CAST(r2 * 1000 DIV (2 * n_docs) AS BIGINT)")
            .as("mean_rank_milli"),
          expr("CAST(r2 * 1000 DIV (2 * n_docs) - (ntot + 1) * 500 AS BIGINT)")
            .as("delta_milli"))
        .orderBy("source")
    },

    // MANN–KENDALL trend test over daily event volume per type — the
    // NONPARAMETRIC monotone-trend sibling of q125's Theil–Sen slope
    // (S answers "is there a trend?", the slope says how steep):
    // S = Σ_{i<j} sign(x_j − x_i) over the day grid, plus the
    // tie-corrected variance NUMERATOR var18 = N(N−1)(2N+5) −
    // Σ_t t(t−1)(2t+5) (the /18 and the z-score's sqrt are float steps
    // both engines skip — sufficient statistics only), and Kendall's
    // tau in ppm = S·2·10⁶ DIV N(N−1), sign-split around the
    // non-negative division (the q348 rule). Scale: the pair sweep is
    // the HORIZON-bounded day grid squared (30² per type here, never
    // corpus²); one corpus pass builds the grid.
    "q373_mann_kendall" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val p = daily.select(col("event_type"), col("day").as("d1"),
          col("n").as("n1"))
        .join(broadcast(daily.select(col("event_type").as("et2"),
          col("day").as("d2"), col("n").as("n2"))),
          col("event_type") === col("et2") && col("d1") < col("d2"))
      val sStat = p.groupBy("event_type")
        .agg(sum(when(col("n2") > col("n1"), 1L)
          .when(col("n2") < col("n1"), -1L).otherwise(0L)).as("s"))
      val nd = daily.groupBy("event_type").agg(count(lit(1)).as("ndays"))
      val ties = daily.groupBy("event_type", "n")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tiesum"))
      nd.join(sStat, "event_type").join(ties, "event_type")
        .select(col("event_type"), col("ndays").cast("long").as("n_days"),
          col("s").cast("long").as("s_stat"),
          expr("CAST(ndays * (ndays - 1) * (2 * ndays + 5) - tiesum" +
            " AS BIGINT)").as("var18_num"),
          expr("CAST(CASE WHEN s >= 0" +
            " THEN s * 2000000 DIV (ndays * (ndays - 1))" +
            " ELSE -((-s) * 2000000 DIV (ndays * (ndays - 1)))" +
            " END AS BIGINT)").as("tau_ppm"))
        .orderBy("event_type")
    },

    // HILBERT-curve layout audit — q141/q361's zone-map machinery under
    // the THIRD layout the lakehouse clustering debate is actually
    // about: Morton (Z-order) interleaving has long diagonal jumps that
    // smear a file's 2-D zone box; the Hilbert walk moves ONE cell per
    // index step, so consecutive rows land in tighter boxes and a 2-D
    // box probe reads fewer files (the Delta/Iceberg liquid-clustering
    // pitch, measured exactly instead of argued). Each event maps to
    // the (user_id%256, day%256) demo cell; three 2048-file layouts —
    // hilbert (index DIV 32), zorder (Morton DIV 32, the q141
    // expression), row_order (event_id-ranged insertion order) — get
    // per-file (u8, d8) zone maps, priced against the ONE 16×16 box
    // probe. The Hilbert index is a runtime aggregate() fold
    // ([[hilbertSql]]); the oracle replays it as a recursive CTE.
    // Scale: map-only key computation, then a groupBy on a ≤2048-value
    // file key per layout — bounded shuffle, SF-independent result
    // shape; the audit prices a rewrite without performing it.
    "q374_hilbert_layout" -> { (s, d) =>
      val base = Tables.events(s, d).select(col("event_id"),
        (col("user_id") % 256).as("u8"), (Behavior.dayIndex % 256).as("d8"))
      val mx = base.agg(max(col("event_id")).as("mi"))
      val filed = Caches.shared(base.crossJoin(broadcast(mx)).select(
        col("u8"), col("d8"),
        expr(s"(${hilbertSql("u8", "d8")}) div 32").as("f_h"),
        expr(s"(${Curation.zorderSql("u8", "d8", "div")}) div 32").as("f_z"),
        expr("event_id * 2048 DIV (mi + 1)").as("f_r")))
      def zones(fcol: String, layout: String) = filed
        .groupBy(col(fcol).as("fid"))
        .agg(min(col("u8")).as("lu"), max(col("u8")).as("hu"),
          min(col("d8")).as("ld"), max(col("d8")).as("hd"),
          count(lit(1)).as("rows"))
        .withColumn("layout", lit(layout))
      val z = zones("f_h", "a_hilbert")
        .unionByName(zones("f_z", "b_zorder"))
        .unionByName(zones("f_r", "c_row_order"))
      val matching = filed
        .filter(col("u8").between(BoxULo, BoxUHi) &&
          col("d8").between(BoxDLo, BoxDHi))
        .agg(count(lit(1)).as("n_match"))
      z.groupBy("layout")
        .agg(count(lit(1)).cast("long").as("files_total"),
          sum(when(col("lu") <= BoxUHi && col("hu") >= BoxULo &&
            col("ld") <= BoxDHi && col("hd") >= BoxDLo, 1L).otherwise(0L))
            .cast("long").as("files_box"),
          sum(when(col("lu") <= BoxUHi && col("hu") >= BoxULo &&
            col("ld") <= BoxDHi && col("hd") >= BoxDLo, col("rows"))
            .otherwise(0L)).cast("long").as("rows_scanned"),
          sum(col("rows")).cast("long").as("rows_total"))
        .crossJoin(broadcast(matching))
        .select(col("layout"), col("files_total"), col("files_box"),
          col("rows_scanned"), col("rows_total"),
          col("n_match").cast("long").as("rows_matching"),
          expr("CAST(rows_scanned * 1000000" +
            " DIV greatest(n_match, 1) AS BIGINT)")
            .as("scan_amplification_ppm"))
        .orderBy("layout")
    },

    // Exact WASSERSTEIN-1 (earth-mover) distance per source pair — the
    // L¹ companion to q370's sup-norm KS: W₁ integrates |F_a − F_b|
    // over the value axis, so it prices HOW FAR mass must move, not
    // just the worst crossing (two sources can tie on KS yet differ
    // 10× on W₁). For step CDFs the integral is exact:
    // W₁·n_a·n_b = Σ over the sorted shared value grid of
    // |F_a(v)·n_b − F_b(v)·n_a| · (next(v) − v); the top value's gap
    // is empty (both CDFs are full there). next(v) by a min-over-
    // successors theta-join on the bounded grid — never an
    // unpartitioned window (PlanSpec rule). Same once-per-(source,
    // value) step-CDF cache as q370. Magnitude: Σ|D|·gap ≤
    // n_a·n_b·range(values); ×1000 holds int64 to ~10¹² doc-pairs per
    // source pair at the policy-capped length range.
    "q375_wasserstein" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt")))
      val tot = g.groupBy("source").agg(sum(col("cnt")).as("n"))
      val vals = g.select("n_chars").distinct()
      val gaps = vals.select(col("n_chars").as("v"))
        .join(broadcast(vals.select(col("n_chars").as("w"))),
          col("w") > col("v"))
        .groupBy("v").agg(min(col("w")).as("nxt"))
        .select(col("v"), (col("nxt") - col("v")).as("gap"))
      val pairs = tot.select(col("source").as("sa"), col("n").as("na"))
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          col("sa") < col("sb"))
      val cumAll = Caches.shared(tot.select(col("source").as("cs"))
        .crossJoin(broadcast(vals))
        .join(broadcast(g.select(col("source").as("g2"),
          col("n_chars").as("v2"), col("cnt").as("c2"))),
          col("g2") === col("cs") && col("v2") === col("n_chars"), "left")
        .select(col("cs"), col("n_chars"),
          coalesce(col("c2"), lit(0L)).as("c0"))
        .withColumn("f", sum(col("c0")).over(Window.partitionBy("cs")
          .orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, 0))))
      pairs.crossJoin(broadcast(gaps))
        .join(broadcast(cumAll.select(col("cs").as("csa"),
          col("n_chars").as("va"), col("f").as("fa"))),
          col("csa") === col("sa") && col("va") === col("v"))
        .join(broadcast(cumAll.select(col("cs").as("csb"),
          col("n_chars").as("vb"), col("f").as("fb"))),
          col("csb") === col("sb") && col("vb") === col("v"))
        .groupBy("sa", "sb")
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          sum(abs(col("fa") * col("nb") - col("fb") * col("na"))
            * col("gap")).as("wnum"))
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("n_a"), col("n_b"), col("wnum").cast("long").as("w1_scaled"),
          expr("CAST(wnum * 1000 DIV (n_a * n_b) AS BIGINT)")
            .as("w1_milli"))
        .orderBy("source_a", "source_b")
    },

    // Exact CRAMÉR–VON MISES two-sample statistic per source pair —
    // the L² member completing the CDF-distance triple (q370 sup-norm,
    // q375 L¹): ω² sums the SQUARED CDF gap at every pooled
    // observation, so it weights persistent mid-distribution drift the
    // sup-norm ignores and is more powerful than KS against
    // diffuse alternatives. Exact: cvm_num = Σ over the value grid of
    // (c_a(v)+c_b(v))·(F_a(v)·n_b − F_b(v)·n_a)² — the weight is the
    // PAIR's pooled point mass at v — with T = cvm_num / (N²·n_a·n_b)
    // the textbook normalization (N = n_a+n_b); the division is the
    // one reported (ppm), the numerator accumulates in DECIMAL(38,0)
    // because pooled·D² reaches ~N·(n_a·n_b)² (past int64 by sf1;
    // DuckDB mirrors in HUGEINT). Same grid machinery as q370.
    "q376_cramer_von_mises" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt")))
      val tot = g.groupBy("source").agg(sum(col("cnt")).as("n"))
      val vals = g.groupBy("n_chars").agg(sum(col("cnt")).as("call"))
      val pairs = tot.select(col("source").as("sa"), col("n").as("na"))
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          col("sa") < col("sb"))
      // step-CDF AND the per-(source, value) point mass c0 — the CvM
      // weight at v for pair (a,b) is the PAIR's pooled count
      // c0_a(v) + c0_b(v), not the global grid count (values only other
      // sources hit carry zero weight for this pair).
      val cumAll = Caches.shared(tot.select(col("source").as("cs"))
        .crossJoin(broadcast(vals.select("n_chars")))
        .join(broadcast(g.select(col("source").as("g2"),
          col("n_chars").as("v2"), col("cnt").as("c2"))),
          col("g2") === col("cs") && col("v2") === col("n_chars"), "left")
        .select(col("cs"), col("n_chars"),
          coalesce(col("c2"), lit(0L)).as("c0"))
        .withColumn("f", sum(col("c0")).over(Window.partitionBy("cs")
          .orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, 0))))
      pairs.crossJoin(broadcast(vals.select("n_chars")))
        .join(broadcast(cumAll.select(col("cs").as("csa"),
          col("n_chars").as("va"), col("f").as("fa"), col("c0").as("ca"))),
          col("csa") === col("sa") && col("va") === col("n_chars"))
        .join(broadcast(cumAll.select(col("cs").as("csb"),
          col("n_chars").as("vb"), col("f").as("fb"), col("c0").as("cb"))),
          col("csb") === col("sb") && col("vb") === col("n_chars"))
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          ((col("ca") + col("cb")).cast("decimal(38,0)") *
            (col("fa") * col("nb") - col("fb") * col("na")) *
            (col("fa") * col("nb") - col("fb") * col("na"))).as("term"))
        .groupBy("sa", "sb")
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          sum(col("term")).as("cvmd"))
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("n_a"), col("n_b"),
          expr("CAST(cvmd * 1000000 div (CAST(n_a + n_b AS DECIMAL(38,0))" +
            " * (n_a + n_b) * n_a * n_b) AS BIGINT)").as("cvm_ppm"))
        .orderBy("source_a", "source_b")
    },

    // ANDERSON–DARLING-STYLE tail-weighted two-sample CDF distance per
    // source pair — the TAIL-weighted member completing the quartet
    // (q370 sup-norm, q375 L¹, q376 pooled-mass L², q380 Lebesgue L²):
    // the 1/(H(1−H)) weight diverges at both CDF ends, so the statistic
    // detects tail drift (a new source whose SHORTEST and LONGEST docs
    // differ) that every mid-weighted member underrates. NOT the exact
    // Scholz–Stephens A²_akN: the (N−1)/N factor and the −N·l_j/4 tie
    // term in the denominator are deliberately dropped (both engines
    // drop them identically), so ad_ppm is a self-consistent A²-family
    // distance for CROSS-PAIR comparison — do not read it against
    // published A² critical values. Midrank handling keeps the doubled
    // half-counts integer (M2 = 2F − c); for pair (a,b) the two
    // per-sample terms collapse algebraically to
    //   A² = (1/(n_a·n_b)) · Σ_v l_v · D_v² / (B2_v·(2N − B2_v)),
    // D_v = n_b·M2_a(v) − n_a·M2_b(v), B2_v = M2_a(v) + M2_b(v),
    // l_v = the pair's pooled point mass (zero-mass grid values are
    // filtered — their denominator is 0/0 by construction). Per-term
    // floor at ×10⁶ then a final DIV n_a·n_b keeps everything integer;
    // the numerator runs in DECIMAL(38,0) (l·D²·10⁶ ~ 10²⁹ at sf100 —
    // DuckDB mirrors in HUGEINT); the per-term quotient itself stays
    // int64 through ~10⁵ docs/source (drop the 10⁶ prescale past
    // that — documented magnitude rule). Same (source × value)
    // step-CDF grid as q370/q376; grid algebra only, never corpus².
    "q480_anderson_darling" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt")))
      val tot = g.groupBy("source").agg(sum(col("cnt")).as("n"))
      val vals = g.groupBy("n_chars").agg(sum(col("cnt")).as("call"))
      val pairs = tot.select(col("source").as("sa"), col("n").as("na"))
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          col("sa") < col("sb"))
      val cumAll = Caches.shared(tot.select(col("source").as("cs"))
        .crossJoin(broadcast(vals.select("n_chars")))
        .join(broadcast(g.select(col("source").as("g2"),
          col("n_chars").as("v2"), col("cnt").as("c2"))),
          col("g2") === col("cs") && col("v2") === col("n_chars"), "left")
        .select(col("cs"), col("n_chars"),
          coalesce(col("c2"), lit(0L)).as("c0"))
        .withColumn("f", sum(col("c0")).over(Window.partitionBy("cs")
          .orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, 0))))
      pairs.crossJoin(broadcast(vals.select("n_chars")))
        .join(broadcast(cumAll.select(col("cs").as("csa"),
          col("n_chars").as("va"), col("f").as("fa"), col("c0").as("ca"))),
          col("csa") === col("sa") && col("va") === col("n_chars"))
        .join(broadcast(cumAll.select(col("cs").as("csb"),
          col("n_chars").as("vb"), col("f").as("fb"), col("c0").as("cb"))),
          col("csb") === col("sb") && col("vb") === col("n_chars"))
        .filter(col("ca") + col("cb") > 0)
        .withColumn("m2a", col("fa") * 2 - col("ca"))
        .withColumn("m2b", col("fb") * 2 - col("cb"))
        .withColumn("dd", col("nb") * col("m2a") - col("na") * col("m2b"))
        .withColumn("b2", col("m2a") + col("m2b"))
        .withColumn("term", expr(
          "(CAST(ca + cb AS DECIMAL(38,0)) * dd * dd * 1000000)" +
            " div (b2 * ((na + nb) * 2 - b2))"))
        .groupBy("sa", "sb")
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          count(lit(1)).cast("long").as("n_grid"),
          sum(col("term").cast("decimal(38,0)")).as("adsum"))
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("n_a"), col("n_b"), col("n_grid"),
          expr("CAST(adsum div (n_a * n_b) AS BIGINT)").as("ad_ppm"))
        .orderBy("source_a", "source_b")
    },

    // JONCKHEERE–TERPSTRA ordered-alternative trend — "does ship delay
    // RISE as order priority falls?": the dose–response question the
    // unordered k-sample tests (q372 Kruskal–Wallis, q389 Mood median)
    // cannot pose. Groups are the five o_orderpriority levels in their
    // banner order (the '1-'…'5-' prefix makes lexicographic = urgency
    // order); JT sums the Mann–Whitney count over every ordered pair,
    // doubled so ties count once and stay integer: U2(g,h) =
    // Σ_v c_h(v)·(2·cumlt_g(v) + c_g(v)) — q371's exact statistic on
    // the (priority × delay-day) grid, 5 × O(time-span) cells, never
    // corpus².
    // Per ordered pair the table carries U2 and its normalized
    // trend_ppm = U2·10⁶ DIV (2·n_g·n_h) (500000 = no trend, >½ means
    // the later group runs LATER); the product runs in DECIMAL(38,0)
    // (U2·10⁶ passes int64 just past sf1's 1.2M-row groups). One
    // orders⋈lineitem join is the only fact shuffle. The cumlt counts
    // come from the q370/q480 step-CDF (a PARTITIONED window over the
    // priority × delay grid — the grid is generator-span-bounded at a
    // few thousand delay values, and the <-comparison folds into the
    // running sum; a per-pair `va < vb` theta-join over the same grid
    // measured 35 s at sf0.1, this shape ~1 s).
    "q481_jonckheere_trend" -> { (s, d) =>
      val g = Caches.shared(Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("prio"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("delay"))
        .groupBy("prio", "delay").agg(count(lit(1)).as("cnt")))
      val tot = g.groupBy("prio").agg(sum(col("cnt")).as("n"))
      val vals = g.select("delay").distinct()
      val cumAll = tot.select(col("prio").as("cs"))
        .crossJoin(broadcast(vals))
        .join(broadcast(g.select(col("prio").as("g2"),
          col("delay").as("v2"), col("cnt").as("c2"))),
          col("g2") === col("cs") && col("v2") === col("delay"), "left")
        .select(col("cs"), col("delay"),
          coalesce(col("c2"), lit(0L)).as("c0"))
        .withColumn("f", sum(col("c0")).over(Window.partitionBy("cs")
          .orderBy("delay")
          .rowsBetween(Window.unboundedPreceding, 0)))
      val pairs = tot.select(col("prio").as("pa"), col("n").as("na"))
        .join(broadcast(tot.select(col("prio").as("pb"), col("n").as("nb"))),
          col("pa") < col("pb"))
      val withEq = pairs.join(broadcast(g.select(col("prio").as("gb"),
          col("delay").as("vb"), col("cnt").as("cb"))),
          col("gb") === col("pb"))
        .join(broadcast(cumAll.select(col("cs").as("csa"),
          col("delay").as("va"), col("f").as("fa"), col("c0").as("ca0"))),
          col("csa") === col("pa") && col("va") === col("vb"))
        .select(col("pa"), col("pb"), col("na"), col("nb"),
          (col("cb") * ((col("fa") - col("ca0")) * 2 + col("ca0")))
            .as("u2part"))
      withEq.groupBy("pa", "pb")
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          sum(col("u2part")).as("u2"))
        .select(col("pa").as("prio_a"), col("pb").as("prio_b"),
          col("n_a"), col("n_b"), col("u2").cast("long").as("u2_ab"),
          expr("CAST(CAST(u2 AS DECIMAL(38,0)) * 1000000" +
            " DIV (2 * n_a * n_b) AS BIGINT)").as("trend_ppm"))
        .orderBy("prio_a", "prio_b")
    },

    // KENDALL cross-correlation between event-type pairs' daily volume
    // series — "which event types CO-MOVE day over day?" (q373 is
    // Kendall-vs-TIME; this is Kendall-vs-each-other — the
    // nonparametric robust alternative to Pearson on raw counts, whose
    // sqrt-denominator the integer-exactness rule excludes):
    // S = Σ_{d1<d2} sign(x_a(d2)−x_a(d1)) · sign(x_b(d2)−x_b(d1))
    // over days BOTH types fired, tau_a in ppm = S·2·10⁶ DIV n(n−1),
    // sign-split around the non-negative division (q348 rule), plus
    // the concordant/discordant split so the ppm is auditable. Scale:
    // the sweep is the horizon-bounded day grid squared per type pair
    // — |types|²·|days|² algebra, never corpus²; one pass builds the
    // grid.
    "q377_kendall_comove" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val pairDays = daily.select(col("event_type").as("ta"),
          col("day"), col("n").as("xa"))
        .join(broadcast(daily.select(col("event_type").as("tb"),
          col("day").as("db"), col("n").as("xb"))),
          col("ta") < col("tb") && col("day") === col("db"))
        .select(col("ta"), col("tb"), col("day"), col("xa"), col("xb"))
      val sweep = pairDays.select(col("ta"), col("tb"), col("day").as("d1"),
          col("xa").as("a1"), col("xb").as("b1"))
        .join(broadcast(pairDays.select(col("ta").as("ta2"),
          col("tb").as("tb2"), col("day").as("d2"),
          col("xa").as("a2"), col("xb").as("b2"))),
          col("ta") === col("ta2") && col("tb") === col("tb2") &&
            col("d1") < col("d2"))
        .select(col("ta"), col("tb"),
          (signum(col("a2") - col("a1")).cast("long") *
            signum(col("b2") - col("b1")).cast("long")).as("sg"))
      val nShared = pairDays.groupBy("ta", "tb")
        .agg(count(lit(1)).as("nd"))
      sweep.groupBy("ta", "tb")
        .agg(sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("conc"),
          sum(when(col("sg") === -1L, 1L).otherwise(0L)).as("disc"))
        .join(nShared, Seq("ta", "tb"))
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("nd").cast("long").as("n_days"),
          col("conc").cast("long").as("concordant"),
          col("disc").cast("long").as("discordant"),
          expr("CAST(CASE WHEN conc - disc >= 0" +
            " THEN (conc - disc) * 2000000 DIV greatest(nd * (nd - 1), 1)" +
            " ELSE -((disc - conc) * 2000000 DIV greatest(nd * (nd - 1), 1))" +
            " END AS BIGINT)").as("tau_ppm"))
        .orderBy("type_a", "type_b")
    },

    // WALD–WOLFOWITZ runs test over daily volume per event type — the
    // randomness check underneath q373's trend test: binarize each day
    // against the series' exact lower median (rank ⌈n/2⌉ by
    // predecessor-count selection on the bounded value grid — never a
    // global window), count maximal runs of the binary sequence, and
    // report the exact sufficient statistics: R, n₁ (above-median
    // days), n₀, the expectation numerator E[R]·n = n + 2n₁n₀ (milli),
    // and the variance numerator 2n₁n₀(2n₁n₀−n) (the /n²(n−1) and the
    // z sqrt are the float steps both engines skip). Too FEW runs ⇒
    // clumped regimes (weekend plateaus); too many ⇒ oscillation.
    // Adjacent-day pairing by a next-day-with-data theta-join on the
    // horizon-bounded day grid.
    "q378_runs_test" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val nd = daily.groupBy("event_type").agg(count(lit(1)).as("ndays"))
      val grid = daily.groupBy("event_type", "n")
        .agg(count(lit(1)).as("c"))
      val cum = grid.select(col("event_type"), col("n").as("v"), col("c"))
        .join(broadcast(grid.select(col("event_type").as("e2"),
          col("n").as("w"), col("c").as("cw"))),
          col("event_type") === col("e2") && col("w") < col("v"), "left")
        .groupBy("event_type", "v", "c")
        .agg(coalesce(sum(col("cw")), lit(0L)).as("cumlt"))
      val med = cum.join(nd, "event_type")
        .withColumn("k", expr("(ndays + 1) div 2"))
        .filter(col("cumlt") < col("k") && col("k") <= col("cumlt") + col("c"))
        .select(col("event_type"), col("v").as("med"))
      val flagged = Caches.shared(daily.join(broadcast(med), "event_type")
        .select(col("event_type"), col("day"),
          when(col("n") > col("med"), 1L).otherwise(0L).as("hi")))
      val nxt = flagged.select(col("event_type"), col("day").as("d1"))
        .join(broadcast(flagged.select(col("event_type").as("e3"),
          col("day").as("d2"))),
          col("event_type") === col("e3") && col("d2") > col("d1"))
        .groupBy("event_type", "d1").agg(min(col("d2")).as("dn"))
      val steps = flagged.select(col("event_type"), col("day").as("d1"),
          col("hi").as("h1"))
        .join(nxt, Seq("event_type", "d1"))
        .join(flagged.select(col("event_type").as("e4"),
          col("day").as("d4"), col("hi").as("h2")),
          col("event_type") === col("e4") && col("dn") === col("d4"))
        .groupBy("event_type")
        .agg(sum(when(col("h1") =!= col("h2"), 1L).otherwise(0L)).as("chg"))
      val ones = flagged.groupBy("event_type")
        .agg(sum(col("hi")).as("n1"), count(lit(1)).as("n"))
      ones.join(steps, "event_type")
        .select(col("event_type"), col("n").cast("long").as("n_days"),
          col("n1").cast("long").as("n_above"),
          (col("n") - col("n1")).cast("long").as("n_below"),
          (col("chg") + 1).cast("long").as("runs"),
          expr("CAST((n + 2 * n1 * (n - n1)) * 1000 DIV n AS BIGINT)")
            .as("e_runs_milli"),
          expr("CAST(2 * n1 * (n - n1) * (2 * n1 * (n - n1) - n)" +
            " AS BIGINT)").as("var_num"))
        .orderBy("event_type")
    },

    // FANO-factor burstiness census per event type — the dispersion
    // diagnostic under q364's CUSUM and q358's peak window: a Poisson
    // arrival process has Var/mean = 1; Fano ≫ 1 means bursty regime
    // days (campaign spikes), ≪ 1 means a rate-limited/quota-shaped
    // feed. Exact sufficient statistics over the daily-count series —
    // n, Σx, Σx², the variance NUMERATOR n·Σx² − (Σx)², and
    // fano_ppm = (n·Σx² − (Σx)²)·10⁶ DIV ((n−1)·n·x̄·n) rearranged
    // integer-exactly as var_num·10⁶ DIV ((n−1)·Σx) (sample variance
    // over mean; all non-negative so plain DIV). Magnitude: Σx² ≤
    // n·max_daily²; int64 to ~3·10⁹ events/day — DECIMAL past. One
    // grid agg; output is |types| rows.
    "q379_fano_burstiness" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"), col("n").cast("long").as("n_days"),
          col("sx").cast("long").as("sum_n"),
          col("sxx").cast("long").as("sum_sq"),
          expr("CAST(n * sxx - sx * sx AS BIGINT)").as("var_num"),
          expr("CAST((n * sxx - sx * sx) * 1000000" +
            " DIV ((n - 1) * sx) AS BIGINT)").as("fano_ppm"))
        .orderBy("event_type")
    },

    // Exact CRAMÉR / ENERGY distance per source pair — the UNWEIGHTED
    // L² Lebesgue member finishing the CDF-distance family (q370 sup,
    // q375 L¹ ∫|ΔF|dx, q376 pooled-mass-weighted Σ(ΔF)²): the squared
    // CDF gap integrated over the VALUE AXIS itself, ∫(F_a−F_b)² dx —
    // Székely's 1-D energy distance 2E|X−Y| − E|X−X'| − E|Y−Y'| is
    // exactly TWICE this integral, so one number prices both. Exact
    // integers: e_num = Σ over the sorted shared grid of
    // (F_a(v)·n_b − F_b(v)·n_a)²·(next(v)−v) accumulated in
    // DECIMAL(38,0) (the squared term reaches (n_a·n_b)²·range — past
    // int64 by sf1; DuckDB mirrors in HUGEINT); int_sq_ppm =
    // e_num·10⁶ DIV (n_a·n_b)² (micro-chars of integral), energy_ppm
    // its doubled form as an INDEPENDENT division (never 2× the
    // already-rounded value — the mirrors must agree bit-for-bit).
    // |ΔF| ≤ D everywhere gives the law e_num ≤ D_scaled·W1_scaled
    // (checked in spec against q370/q375). Same step-CDF + gap
    // machinery as q375 — one corpus grid agg, |sources|²·|values|
    // algebra on the schema-bounded length histogram.
    "q380_energy_distance" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt")))
      val tot = g.groupBy("source").agg(sum(col("cnt")).as("n"))
      val vals = g.select("n_chars").distinct()
      val gaps = vals.select(col("n_chars").as("v"))
        .join(broadcast(vals.select(col("n_chars").as("w"))),
          col("w") > col("v"))
        .groupBy("v").agg(min(col("w")).as("nxt"))
        .select(col("v"), (col("nxt") - col("v")).as("gap"))
      val pairs = tot.select(col("source").as("sa"), col("n").as("na"))
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          col("sa") < col("sb"))
      val cumAll = Caches.shared(tot.select(col("source").as("cs"))
        .crossJoin(broadcast(vals))
        .join(broadcast(g.select(col("source").as("g2"),
          col("n_chars").as("v2"), col("cnt").as("c2"))),
          col("g2") === col("cs") && col("v2") === col("n_chars"), "left")
        .select(col("cs"), col("n_chars"),
          coalesce(col("c2"), lit(0L)).as("c0"))
        .withColumn("f", sum(col("c0")).over(Window.partitionBy("cs")
          .orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, 0))))
      pairs.crossJoin(broadcast(gaps))
        .join(broadcast(cumAll.select(col("cs").as("csa"),
          col("n_chars").as("va"), col("f").as("fa"))),
          col("csa") === col("sa") && col("va") === col("v"))
        .join(broadcast(cumAll.select(col("cs").as("csb"),
          col("n_chars").as("vb"), col("f").as("fb"))),
          col("csb") === col("sb") && col("vb") === col("v"))
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          ((col("fa") * col("nb") - col("fb") * col("na"))
            .cast("decimal(38,0)") *
            (col("fa") * col("nb") - col("fb") * col("na")) *
            col("gap")).as("term"))
        .groupBy("sa", "sb")
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          sum(col("term")).as("edist"))
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("n_a"), col("n_b"),
          expr("CAST(edist * 1000000 DIV (CAST(n_a AS DECIMAL(38,0))" +
            " * n_a * n_b * n_b) AS BIGINT)").as("int_sq_ppm"),
          expr("CAST(edist * 2000000 DIV (CAST(n_a AS DECIMAL(38,0))" +
            " * n_a * n_b * n_b) AS BIGINT)").as("energy_ppm"))
        .orderBy("source_a", "source_b")
    },

    // TURNING-POINT randomness census per event type — the
    // local-extremum companion to q378's runs test (runs binarize
    // around the median and see regime CLUMPS; turning points read the
    // raw series and see OSCILLATION): an interior day is a turning
    // point iff its volume is a STRICT local max or min vs the
    // adjacent days-with-data; under exchangeability E[T] = 2(n−2)/3
    // and Var(T) = (16n−29)/90 — both reported as exact integer
    // numerators (e_tp_milli = 2000(n−2) DIV 3, var90_num = 16n−29;
    // the /90 and the z sqrt are the float steps both engines skip).
    // T ≫ E ⇒ day-to-day oscillation (retry storms, alternating
    // feeds); T ≪ E ⇒ smooth ramps. Neighbor lookup by min/max
    // theta-joins on the horizon-bounded day grid (the q378 pattern);
    // types with < 3 days anchor explicit zero rows (the q336 rule).
    "q381_turning_points" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val nd = daily.groupBy("event_type").agg(count(lit(1)).as("ndays"))
      val nxt = daily.select(col("event_type"), col("day").as("d1"))
        .join(broadcast(daily.select(col("event_type").as("e2"),
          col("day").as("d2"))),
          col("event_type") === col("e2") && col("d2") > col("d1"))
        .groupBy("event_type", "d1").agg(min(col("d2")).as("dn"))
      val prv = daily.select(col("event_type"), col("day").as("d1"))
        .join(broadcast(daily.select(col("event_type").as("e3"),
          col("day").as("d3"))),
          col("event_type") === col("e3") && col("d3") < col("d1"))
        .groupBy("event_type", "d1").agg(max(col("d3")).as("dp"))
      val interior = daily.select(col("event_type"), col("day").as("d1"),
          col("n").as("x"))
        .join(nxt, Seq("event_type", "d1"))
        .join(prv, Seq("event_type", "d1"))
        .join(daily.select(col("event_type").as("e4"), col("day").as("d4"),
          col("n").as("xn")),
          col("event_type") === col("e4") && col("dn") === col("d4"))
        .join(daily.select(col("event_type").as("e5"), col("day").as("d5"),
          col("n").as("xp")),
          col("event_type") === col("e5") && col("dp") === col("d5"))
      val tp = interior.groupBy("event_type")
        .agg(sum(when(col("x") > col("xp") && col("x") > col("xn"), 1L)
          .otherwise(0L)).as("peaks"),
          sum(when(col("x") < col("xp") && col("x") < col("xn"), 1L)
            .otherwise(0L)).as("troughs"))
      nd.join(tp, Seq("event_type"), "left")
        .select(col("event_type"), col("ndays").cast("long").as("n_days"),
          coalesce(col("peaks"), lit(0L)).cast("long").as("n_peaks"),
          coalesce(col("troughs"), lit(0L)).cast("long").as("n_troughs"),
          (coalesce(col("peaks"), lit(0L)) + coalesce(col("troughs"), lit(0L)))
            .cast("long").as("n_turning"),
          expr("CAST(CASE WHEN ndays >= 3 THEN 2000 * (ndays - 2) DIV 3" +
            " ELSE 0 END AS BIGINT)").as("e_tp_milli"),
          expr("CAST(CASE WHEN ndays >= 3 THEN 16 * ndays - 29" +
            " ELSE 0 END AS BIGINT)").as("var90_num"))
        .orderBy("event_type")
    },

    // BLOMQVIST'S BETA (median-quadrant dependence) per event-type
    // pair — the cheapest member of the dependence family beside
    // q377's Kendall tau: split each pair's shared-day scatter at the
    // two legs' LOWER MEDIANS (exact rank selection with the (value,
    // day) total tie-break order) and count quadrants; beta =
    // (n_pp + n_mm − n_pm − n_mp) / (quadrant total), on-median days
    // reported as ties and excluded (the classic treatment). Kendall
    // compares every day PAIR (O(days²) per pair); beta reads each day
    // ONCE against two constants — the screening statistic you run
    // before paying for tau at scale. Sign-split ppm around the
    // non-negative DIV (q348 rule); medians over the SHARED-day subset
    // so both legs see the same n.
    "q382_blomqvist_beta" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val pairDays = Caches.shared(daily.select(col("event_type").as("ta"),
          col("day"), col("n").as("xa"))
        .join(broadcast(daily.select(col("event_type").as("tb"),
          col("day").as("db"), col("n").as("xb"))),
          col("ta") < col("tb") && col("day") === col("db"))
        .select(col("ta"), col("tb"), col("day"), col("xa"), col("xb")))
      val nd = pairDays.groupBy("ta", "tb").agg(count(lit(1)).as("nd"))
      val withRanks = pairDays.join(broadcast(nd), Seq("ta", "tb"))
        .withColumn("ra", row_number().over(Window.partitionBy("ta", "tb")
          .orderBy(col("xa"), col("day"))))
        .withColumn("rb", row_number().over(Window.partitionBy("ta", "tb")
          .orderBy(col("xb"), col("day"))))
      val medA = withRanks.filter(col("ra") === expr("(nd + 1) div 2"))
        .select(col("ta"), col("tb"), col("xa").as("ma"))
      val medB = withRanks.filter(col("rb") === expr("(nd + 1) div 2"))
        .select(col("ta").as("ta2"), col("tb").as("tb2"),
          col("xb").as("mb"))
      pairDays.join(broadcast(medA), Seq("ta", "tb"))
        .join(broadcast(medB),
          col("ta") === col("ta2") && col("tb") === col("tb2"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("ndays"),
          sum(when(col("xa") > col("ma") && col("xb") > col("mb"), 1L)
            .otherwise(0L)).as("n_pp"),
          sum(when(col("xa") < col("ma") && col("xb") < col("mb"), 1L)
            .otherwise(0L)).as("n_mm"),
          sum(when(col("xa") > col("ma") && col("xb") < col("mb"), 1L)
            .otherwise(0L)).as("n_pm"),
          sum(when(col("xa") < col("ma") && col("xb") > col("mb"), 1L)
            .otherwise(0L)).as("n_mp"))
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("ndays").cast("long").as("n_days"),
          col("n_pp").cast("long").as("n_pp"),
          col("n_mm").cast("long").as("n_mm"),
          col("n_pm").cast("long").as("n_pm"),
          col("n_mp").cast("long").as("n_mp"),
          (col("ndays") - col("n_pp") - col("n_mm") - col("n_pm")
            - col("n_mp")).cast("long").as("n_ties"),
          expr("CAST(CASE WHEN n_pp + n_mm - n_pm - n_mp >= 0" +
            " THEN (n_pp + n_mm - n_pm - n_mp) * 1000000" +
            " DIV greatest(n_pp + n_mm + n_pm + n_mp, 1)" +
            " ELSE -((n_pm + n_mp - n_pp - n_mm) * 1000000" +
            " DIV greatest(n_pp + n_mm + n_pm + n_mp, 1))" +
            " END AS BIGINT)").as("beta_ppm"))
        .orderBy("type_a", "type_b")
    },

    // RUNNING-RECORD census per event type — extreme-value forensics
    // over the daily series: a record-high day strictly exceeds EVERY
    // earlier day (the first day is a record both ways — the classic
    // convention); under exchangeability the expected record count is
    // the harmonic number H(n), so records ≫ H(n) is direct evidence
    // of a growth trend the q373 tau then quantifies, records ≈ H(n)
    // says spikes are just reshuffled noise. H(n) is reported as the
    // exact integer Σ_{i=1..n} 10⁶ DIV i — a DEFINED statistic both
    // engines compute identically (the repo-wide log-free rule;
    // truncation error < n ppm, irrelevant at horizon scale). Prior
    // extrema by one left theta-join on the horizon-bounded day grid;
    // the harmonic leg explodes sequence(1, n) per type — |types|·|days|
    // rows, never corpus-shaped.
    "q383_record_days" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val pri = daily.select(col("event_type"), col("day").as("d1"),
          col("n").as("x"))
        .join(broadcast(daily.select(col("event_type").as("e2"),
          col("day").as("d2"), col("n").as("x2"))),
          col("event_type") === col("e2") && col("d2") < col("d1"), "left")
        .groupBy("event_type", "d1", "x")
        .agg(max(col("x2")).as("pmax"), min(col("x2")).as("pmin"))
      val rec = pri.groupBy("event_type")
        .agg(count(lit(1)).as("ndays"),
          sum(when(col("pmax").isNull || col("x") > col("pmax"), 1L)
            .otherwise(0L)).as("nh"),
          sum(when(col("pmin").isNull || col("x") < col("pmin"), 1L)
            .otherwise(0L)).as("nl"))
      val harm = rec.select(col("event_type").as("eh"), col("ndays").as("nd2"))
        .select(col("eh"), explode(expr("sequence(1, nd2)")).as("i"))
        .groupBy("eh").agg(sum(expr("1000000 div i")).as("h_ppm"))
      rec.join(broadcast(harm), col("event_type") === col("eh"))
        .select(col("event_type"), col("ndays").cast("long").as("n_days"),
          col("nh").cast("long").as("n_record_high"),
          col("nl").cast("long").as("n_record_low"),
          col("h_ppm").cast("long").as("expected_ppm"))
        .orderBy("event_type")
    },

    // BOWLEY QUARTILE SKEWNESS per source over document lengths — the
    // moment-free asymmetry statistic (classical skewness needs a
    // cube and a 3/2-power the integer-exactness rule excludes; Bowley
    // reads three rank selections): B = (Q3 + Q1 − 2·Q2)/(Q3 − Q1) in
    // sign-split milli, quartiles as exact ceil-rank selection
    // (k = ⌈n/4⌉, ⌈n/2⌉, ⌈3n/4⌉) by predecessor-count on the
    // schema-bounded (source, n_chars) grid — never a global window.
    // B > 0 ⇒ a long-document tail (truncation policy candidates),
    // B < 0 ⇒ a short-document floor (boilerplate stubs). Degenerate
    // IQR = 0 guards to 0 via greatest(·, 1). One corpus grid agg.
    "q384_bowley_skew" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("c")))
      val tot = g.groupBy("source").agg(sum(col("c")).as("n"))
      val cum = g.select(col("source"), col("n_chars").as("v"), col("c"))
        .join(broadcast(g.select(col("source").as("s2"),
          col("n_chars").as("w"), col("c").as("cw"))),
          col("source") === col("s2") && col("w") < col("v"), "left")
        .groupBy("source", "v", "c")
        .agg(coalesce(sum(col("cw")), lit(0L)).as("cumlt"))
        .join(broadcast(tot), "source")
      def sel(kExpr: String, nm: String) =
        cum.filter(expr(s"cumlt < $kExpr AND $kExpr <= cumlt + c"))
          .select(col("source").as(s"s_$nm"), col("v").as(nm))
      sel("(n + 3) div 4", "q1")
        .join(sel("(n + 1) div 2", "q2"), col("s_q1") === col("s_q2"))
        .join(sel("(3 * n + 3) div 4", "q3"), col("s_q1") === col("s_q3"))
        .join(broadcast(tot), col("s_q1") === col("source"))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          col("q1").cast("long").as("q1"),
          col("q2").cast("long").as("q2"),
          col("q3").cast("long").as("q3"),
          (col("q3") - col("q1")).cast("long").as("iqr"),
          expr("CAST(CASE WHEN q3 + q1 - 2 * q2 >= 0" +
            " THEN (q3 + q1 - 2 * q2) * 1000 DIV greatest(q3 - q1, 1)" +
            " ELSE -((2 * q2 - q3 - q1) * 1000 DIV greatest(q3 - q1, 1))" +
            " END AS BIGINT)").as("bowley_milli"))
        .orderBy("source")
    },

    // LAG-k AUTOREGRESSION slope per event type on the ZERO-FILLED day
    // grid — "does yesterday predict today, and does last week echo?"
    // (k ∈ {1, 2, 3, 7}; the 7-lag is the weekly-seasonality probe
    // beside the q373 trend and q378 runs tests, which both ignore
    // LINEAR memory). Zero-filling the [min_day, max_day] horizon per
    // type matters: silent gap days ARE signal for memory statistics
    // (a skipped join leg would splice non-adjacent days together).
    // Exact integers: slope_ppm = cov_num·10⁶ / var_num sign-split,
    // cov_num = m·Σxy − Σx·Σy and var_num = m·Σx² − (Σx)² accumulated
    // in DECIMAL(38,0) (m·Σxy reaches days·(daily volume)² — past
    // int64 near ~10⁹ events/day; DuckDB mirrors in HUGEINT). The
    // lag pairing is an equi-join on date_add(day, k) over the
    // horizon-bounded grid; the k fan-out is a literal 4-row
    // broadcast. Pearson's r itself needs a sqrt — the regression
    // slope is the exact-integer stand-in with the same sign and zero
    // set.
    "q385_lag_slope" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val span = daily.groupBy("event_type")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val grid = Caches.shared(span
        .select(col("event_type"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("x")))
      val lags = span.sparkSession.range(1)
        .select(explode(array(lit(1), lit(2), lit(3), lit(7))).as("k"))
      grid.crossJoin(broadcast(lags))
        .join(grid.select(col("event_type").as("e2"), col("day").as("d2"),
          col("x").as("y")),
          col("event_type") === col("e2") &&
            expr("date_add(day, k)") === col("d2"))
        .groupBy("event_type", "k")
        .agg(count(lit(1)).as("m"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
        .select(col("event_type"), col("k").cast("long").as("lag_days"),
          col("m").cast("long").as("n_pairs"),
          expr("CAST(m * sxy - sx * sy AS BIGINT)").as("cov_num"),
          expr("CAST(m * sxx - sx * sx AS BIGINT)").as("var_num"),
          expr("CAST(CASE WHEN m * sxy - sx * sy >= 0" +
            " THEN (m * sxy - sx * sy) * 1000000" +
            " DIV greatest(m * sxx - sx * sx, 1)" +
            " ELSE -((sx * sy - m * sxy) * 1000000" +
            " DIV greatest(m * sxx - sx * sx, 1)) END AS BIGINT)")
            .as("slope_ppm"))
        .orderBy("event_type", "lag_days")
    },

    // GREENWALD–KHANNA percentile-sketch CALIBRATION AUDIT — the
    // quantile member of the sketch-audit family (q156 MinHash, q180
    // ANN recall): Spark's approx_percentile(accuracy = 1000)
    // guarantees rank error ≤ n/1000; the audit measures the sketch
    // against EXACT rank arithmetic and certifies the guarantee. The
    // approx value itself is engine-private (DuckDB runs a different
    // sketch), so the output carries only what both engines can agree
    // on: the exact ceil-rank quantile and the PROVABLE boolean "the
    // sketch's value has a rank within k ± bound" (bound = n DIV 1000
    // + 2 absorbs the real-vs-integer target slack; the law holds by
    // the GK invariant, so the oracle mirrors literal TRUE). A sketch
    // regression (or a broken law) flips the boolean and the round
    // goes red — exactly what a calibration gate is for. One grid agg
    // + one sketch agg; the rank lookup is a |pcts|×|values| join.
    "q386_gk_percentile_audit" -> { (s, d) =>
      val doc = Tables.documents(s, d)
      val g = doc.groupBy("n_chars").agg(count(lit(1)).as("c"))
      val cum = Caches.shared(g.select(col("n_chars").as("v"), col("c"))
        .join(broadcast(g.select(col("n_chars").as("w"), col("c").as("cw"))),
          col("w") < col("v"), "left")
        .groupBy("v", "c")
        .agg(coalesce(sum(col("cw")), lit(0L)).as("cumlt")))
      val tot = g.agg(sum(col("c")).as("n"))
      val approx = doc.agg(expr("approx_percentile(n_chars," +
        " array(0.25D, 0.50D, 0.75D, 0.90D, 0.99D), 1000)").as("ap"))
        .select(posexplode(col("ap")).as(Seq("idx", "av")))
      val pcts = doc.sparkSession.range(1)
        .select(posexplode(array(lit(25L), lit(50L), lit(75L), lit(90L),
          lit(99L))).as(Seq("idx", "pct")))
      val base = pcts.crossJoin(broadcast(tot))
        .withColumn("k", expr("(pct * n + 99) div 100"))
        .withColumn("bound", expr("n div 1000 + 2"))
      val exact = base.join(broadcast(cum),
          col("cumlt") < col("k") && col("k") <= col("cumlt") + col("c"))
        .select(col("idx").as("i2"), col("v").as("exact_q"))
      base.join(broadcast(approx), Seq("idx"))
        .join(broadcast(exact), col("idx") === col("i2"))
        .join(broadcast(cum.select(col("v").as("v3"), col("c").as("c3"),
          col("cumlt").as("rlo"))), col("av") === col("v3"))
        .select(col("pct").cast("long").as("percentile_pct"),
          col("n").cast("long").as("n_docs"),
          col("exact_q").cast("long").as("exact_q"),
          col("bound").cast("long").as("rank_err_bound"),
          (col("rlo") + 1 <= col("k") + col("bound") &&
            col("rlo") + col("c3") >= col("k") - col("bound"))
            .as("within_bound"))
        .orderBy("percentile_pct")
    },

    // WILCOXON SIGNED-RANK test per event-type pair — the PAIRED
    // location test the family still lacked (q371's Mann–Whitney is
    // unpaired; here each shared day pairs the two types' volumes and
    // the day-to-day noise cancels): d = x_a − x_b per shared day,
    // zeros dropped (reported), |d| ranked with midranks, W⁺ = rank
    // sum of the positive days. Everything integer via doubling:
    // 2W⁺ = Σ over the |d| grid of pos_c(v)·(2·cumlt(v) + c(v) + 1),
    // E[2W⁺] = n(n+1)/2, and the tie-corrected 48·Var(W⁺) =
    // 2n(n+1)(2n+1) − Σ(t³−t) (the /48 and z sqrt are the float steps
    // both engines skip). 2W⁺ far from n(n+1)/2 ⇒ one type
    // systematically out-volumes the other ON THE SAME DAYS — a
    // sharper signal than the marginal q371 when days share load
    // shocks. |d|-grid algebra per pair, horizon-bounded.
    "q387_wilcoxon_signed" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val diffs = Caches.shared(daily.select(col("event_type").as("ta"),
          col("day"), col("n").as("xa"))
        .join(broadcast(daily.select(col("event_type").as("tb"),
          col("day").as("db"), col("n").as("xb"))),
          col("ta") < col("tb") && col("day") === col("db"))
        .select(col("ta"), col("tb"), (col("xa") - col("xb")).as("dd")))
      val zeros = diffs.groupBy("ta", "tb")
        .agg(sum(when(col("dd") === 0L, 1L).otherwise(0L)).as("nz"))
      val grid = diffs.filter(col("dd") =!= 0L)
        .groupBy(col("ta"), col("tb"), abs(col("dd")).as("ad"))
        .agg(count(lit(1)).as("c"),
          sum(when(col("dd") > 0L, 1L).otherwise(0L)).as("posc"))
      val cum = grid.select(col("ta"), col("tb"), col("ad").as("v"),
          col("c"), col("posc"))
        .join(broadcast(grid.select(col("ta").as("t2"), col("tb").as("u2"),
          col("ad").as("w"), col("c").as("cw"))),
          col("ta") === col("t2") && col("tb") === col("u2") &&
            col("w") < col("v"), "left")
        .groupBy("ta", "tb", "v", "c", "posc")
        .agg(coalesce(sum(col("cw")), lit(0L)).as("cumlt"))
      cum.groupBy("ta", "tb")
        .agg(sum(col("c")).as("nn"),
          sum(col("posc")).as("np"),
          sum(col("posc") * (lit(2) * col("cumlt") + col("c") + 1))
            .as("w2"),
          sum(col("c") * col("c") * col("c") - col("c")).as("ties3"))
        .join(zeros, Seq("ta", "tb"))
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("nn").cast("long").as("n_nonzero"),
          col("nz").cast("long").as("n_zero"),
          col("np").cast("long").as("n_pos"),
          (col("nn") - col("np")).cast("long").as("n_neg"),
          col("w2").cast("long").as("w_plus_x2"),
          expr("CAST(nn * (nn + 1) DIV 2 AS BIGINT)").as("e_w_x2"),
          expr("CAST(2 * nn * (nn + 1) * (2 * nn + 1) - ties3 AS BIGINT)")
            .as("var48_num"))
        .orderBy("type_a", "type_b")
    },

    // MOOD SQUARED-RANK SCALE test per source pair — "same center,
    // different SPREAD?": the dispersion question none of the
    // location/shape tests answer (two sources can tie on median and
    // KS-drift only in the tails). Classic Mood statistic M =
    // Σ over sample a of (rank − (N+1)/2)² on the POOLED ranking;
    // everything integer via doubling: 4M = Σ_v c_a(v)·(2·midrank(v)
    // − N − 1)² with 2·midrank = 2·pooled-cumlt + pooled-c + 1, null
    // expectation 3·E[4M] = n_a(N²−1), scale_ppm = 4M·3·10⁶ DIV
    // (n_a(N²−1)) — ppm > 10⁶ ⇒ a's mass sits in the pooled tails
    // (wider), < 10⁶ ⇒ a is the tighter source. Both sides reported.
    // Pooled ranks from the SAME per-(source, value) step-CDF cache
    // as q370 (cumlt = F − c); grid algebra only.
    "q388_mood_scale" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt")))
      val tot = g.groupBy("source").agg(sum(col("cnt")).as("n"))
      val vals = g.select("n_chars").distinct()
      val pairs = tot.select(col("source").as("sa"), col("n").as("na"))
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          col("sa") < col("sb"))
      val cumAll = Caches.shared(tot.select(col("source").as("cs"))
        .crossJoin(broadcast(vals))
        .join(broadcast(g.select(col("source").as("g2"),
          col("n_chars").as("v2"), col("cnt").as("c2"))),
          col("g2") === col("cs") && col("v2") === col("n_chars"), "left")
        .select(col("cs"), col("n_chars"),
          coalesce(col("c2"), lit(0L)).as("c0"))
        .withColumn("f", sum(col("c0")).over(Window.partitionBy("cs")
          .orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, 0))))
      pairs.crossJoin(broadcast(vals))
        .join(broadcast(cumAll.select(col("cs").as("csa"),
          col("n_chars").as("va"), col("f").as("fa"), col("c0").as("ca"))),
          col("csa") === col("sa") && col("va") === col("n_chars"))
        .join(broadcast(cumAll.select(col("cs").as("csb"),
          col("n_chars").as("vb"), col("f").as("fb"), col("c0").as("cb"))),
          col("csb") === col("sb") && col("vb") === col("n_chars"))
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          col("ca"), col("cb"),
          (lit(2) * (col("fa") - col("ca") + col("fb") - col("cb"))
            + col("ca") + col("cb") + 1 - (col("na") + col("nb") + 1))
            .as("dev"))
        .groupBy("sa", "sb")
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          sum(col("ca").cast("decimal(38,0)") * col("dev") * col("dev"))
            .as("m4a"),
          sum(col("cb").cast("decimal(38,0)") * col("dev") * col("dev"))
            .as("m4b"))
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("n_a"), col("n_b"),
          col("m4a").cast("long").as("m4_a"),
          col("m4b").cast("long").as("m4_b"),
          expr("CAST(m4a * 3000000 DIV greatest(CAST(n_a AS DECIMAL(38,0))" +
            " * ((n_a + n_b) * (n_a + n_b) - 1), 1) AS BIGINT)")
            .as("scale_a_ppm"),
          expr("CAST(m4b * 3000000 DIV greatest(CAST(n_b AS DECIMAL(38,0))" +
            " * ((n_a + n_b) * (n_a + n_b) - 1), 1) AS BIGINT)")
            .as("scale_b_ppm"))
        .orderBy("source_a", "source_b")
    },

    // MOOD'S MEDIAN k-SAMPLE test — one table answers "which sources
    // sit above/below the CORPUS median?" where the pair tests need
    // |sources|² rows (the location analogue of q372's Kruskal–Wallis,
    // but reading one bit per document — the robustest possible
    // statistic, immune to everything except the median crossing):
    // pooled ceil-rank median over the global length grid, per-source
    // above/at/below counts, expectation n_src·A·1000 DIV N (A = total
    // strictly-above mass — the at-median column keeps the
    // classification conservation auditable), and the χ² above-cell
    // contribution in ppm (DECIMAL numerator; the Σ and dof are the
    // reader's float steps). One global grid agg + one per-source agg.
    "q389_mood_median" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("c")))
      val gv = g.groupBy("n_chars").agg(sum(col("c")).as("call"))
      val tot = gv.agg(sum(col("call")).as("nn"))
      val cum = gv.select(col("n_chars").as("v"), col("call"))
        .join(broadcast(gv.select(col("n_chars").as("w"),
          col("call").as("cw"))), col("w") < col("v"), "left")
        .groupBy("v", "call")
        .agg(coalesce(sum(col("cw")), lit(0L)).as("cumlt"))
      val med = cum.crossJoin(broadcast(tot))
        .filter(expr("cumlt < (nn + 1) div 2 AND" +
          " (nn + 1) div 2 <= cumlt + call"))
        .select(col("v").as("med"), col("nn"))
      val cls = g.crossJoin(broadcast(med))
        .groupBy("source", "nn")
        .agg(sum(col("c")).as("n_src"),
          sum(when(col("n_chars") > col("med"), col("c")).otherwise(0L))
            .as("above"),
          sum(when(col("n_chars") === col("med"), col("c")).otherwise(0L))
            .as("at"))
      val aTot = cls.agg(sum(col("above")).as("aa"))
      cls.crossJoin(broadcast(aTot))
        .select(col("source"), col("n_src").cast("long").as("n_docs"),
          col("above").cast("long").as("n_above"),
          col("at").cast("long").as("n_at"),
          (col("n_src") - col("above") - col("at")).cast("long")
            .as("n_below"),
          expr("CAST(n_src * aa * 1000 DIV nn AS BIGINT)")
            .as("expected_above_milli"),
          expr("CAST((above * nn - n_src * aa)" +
            " * CAST(above * nn - n_src * aa AS DECIMAL(38,0)) * 1000000" +
            " DIV greatest(CAST(n_src AS DECIMAL(38,0)) * aa * nn, 1)" +
            " AS BIGINT)").as("chi2_above_ppm"))
        .orderBy("source")
    },

    // Exact L-MOMENTS per source over document lengths — the
    // order-statistics alternative to classical moments (variance,
    // skewness need squares and cubes of VALUES, exploding under
    // outliers and excluded past λ by the integer rules; L-moments
    // are LINEAR in the sorted values, so every numerator is exact):
    // s1 = Σ(i−1)·x(i) and s2 = Σ(i−1)(i−2)·x(i) computed WITHOUT
    // sorting rows, via the rank-run closed forms on the length grid
    // (ranks of value v occupy (cumlt, cumlt+c]; Σ(i−1) over the run
    // = c·cumlt + c(c−1)/2, Σ(i−1)(i−2) = T(cumlt+c−1) − T(cumlt−1)
    // with T(m) = (m−1)m(m+1)/3 — three consecutive integers, so
    // the /3 is exact). Then λ2·n(n−1) = 2s1 − (n−1)s0 and
    // λ3·n(n−1)(n−2) = 6s2 − 6(n−2)s1 + (n−1)(n−2)s0; L-CV = λ2/λ1
    // in ppm and L-skewness τ3 = λ3/λ2 in sign-split milli (τ3
    // bounded in (−1, 1) — a LAW, unlike classical skewness).
    // DECIMAL(38,0) accumulators (s2 ~ n²·Σx — past int64 by sf10;
    // HUGEINT mirror). One corpus grid agg, grid² cumlt theta-join.
    "q390_l_moments" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("c")))
      val cum = g.select(col("source"), col("n_chars").as("v"), col("c"))
        .join(broadcast(g.select(col("source").as("s2"),
          col("n_chars").as("w"), col("c").as("cw"))),
          col("source") === col("s2") && col("w") < col("v"), "left")
        .groupBy("source", "v", "c")
        .agg(coalesce(sum(col("cw")), lit(0L)).as("cumlt"))
      cum.select(col("source"), col("c"), col("v"), col("cumlt"),
          (col("cumlt") + col("c") - 1).as("m1"),
          (col("cumlt") - 1).as("m0"))
        .select(col("source"),
          (col("c").cast("decimal(38,0)") * col("v")).as("t0"),
          expr("CAST(v AS DECIMAL(38,0))" +
            " * (c * cumlt + c * (c - 1) DIV 2)").as("t1"),
          expr("CAST(v AS DECIMAL(38,0))" +
            " * (CAST(m1 - 1 AS DECIMAL(38,0)) * m1 * (m1 + 1) DIV 3" +
            " - CAST(m0 - 1 AS DECIMAL(38,0)) * m0 * (m0 + 1) DIV 3)")
            .as("t2"),
          col("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n"), sum(col("t0")).as("s0"),
          sum(col("t1")).as("s1"), sum(col("t2")).as("s2"))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          expr("CAST(s0 * 1000 DIV n AS BIGINT)").as("l1_milli"),
          expr("CAST(2 * s1 - (n - 1) * s0 AS BIGINT)").as("l2_scaled"),
          expr("CAST(6 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0" +
            " AS BIGINT)").as("l3_scaled"),
          expr("CAST((2 * s1 - (n - 1) * s0) * 1000000" +
            " DIV greatest((n - 1) * s0, 1) AS BIGINT)").as("lcv_ppm"),
          expr("CAST(CASE WHEN 6 * s2 - 6 * (n - 2) * s1" +
            " + (n - 1) * (n - 2) * s0 >= 0" +
            " THEN (6 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0)" +
            " * 1000 DIV greatest((2 * s1 - (n - 1) * s0) * (n - 2), 1)" +
            " ELSE -((6 * (n - 2) * s1 - 6 * s2 - (n - 1) * (n - 2) * s0)" +
            " * 1000 DIV greatest((2 * s1 - (n - 1) * s0) * (n - 2), 1))" +
            " END AS BIGINT)").as("t3_milli"))
        .orderBy("source")
    },

    // ROUGE-1 ANCHOR audit per source — the eval-metric view of
    // templating: micro-averaged clipped-unigram precision/recall of
    // every document against its source's three anchor documents
    // (lowest doc_ids — deterministic, no sampling). ROUGE-1 overlap
    // = Σ_t min(cnt_doc(t), cnt_anchor(t)) — the MULTISET clip the
    // set-based q59 shingle containment can't see (a doc repeating
    // one anchor word 50× scores 1 shared shingle but 50/|doc| here
    // without the clip; the clip caps it at the anchor's count).
    // High micro-precision against a fixed anchor ⇒ boilerplate
    // vocabulary; recall normalizes by the anchor instead. Anchors by
    // THREE chained min-aggregations (min, min>a1, min>a2) — never a
    // per-source window over the corpus (unbounded partition at
    // 100 TB); zero-overlap docs stay in the denominators via
    // independent length/count legs. Token joins are (source, token)
    // equi-joins against a 3-row-per-source anchor side.
    "q391_rouge1_anchors" -> { (s, d) =>
      val doc = Caches.shared(Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          graft.ops.TextAnalysis.tokens(col("text")).as("t")))
      val tok = Caches.shared(doc
        .select(col("doc_id"), col("source"), explode(col("t")).as("tok"))
        .groupBy("doc_id", "source", "tok").agg(count(lit(1)).as("cnt")))
      val lens = doc.select(col("doc_id"), col("source"),
        size(col("t")).cast("long").as("len"))
      // each chained-min rung is an aggregate grouped ONLY on source
      // (never on the previous rung's doc_id) so the whole anchor
      // subtree stays |sources|-sized BY STRUCTURE — the PlanSpec
      // broadcast audit proves boundedness from grouping keys alone
      val a1 = lens.groupBy("source").agg(min(col("doc_id")).as("a1"))
      val a2 = lens.join(broadcast(a1), "source")
        .filter(col("doc_id") > col("a1"))
        .groupBy("source").agg(min(col("doc_id")).as("a2"))
      val a3 = lens.join(broadcast(a2), "source")
        .filter(col("doc_id") > col("a2"))
        .groupBy("source").agg(min(col("doc_id")).as("a3"))
      val anchors = a1.select(col("source").as("asrc"),
          lit(1L).as("anchor_rank"), col("a1").as("a_doc"))
        .unionByName(a2.select(col("source").as("asrc"),
          lit(2L).as("anchor_rank"), col("a2").as("a_doc")))
        .unionByName(a3.select(col("source").as("asrc"),
          lit(3L).as("anchor_rank"), col("a3").as("a_doc")))
      // anchor-side token/length frames re-aggregate on (source,
      // anchor_rank[, tok]) — bounded keys — so the broadcast roots are
      // aggregates the audit can certify, not raw fact joins
      val aTok = tok.join(broadcast(anchors),
          col("source") === col("asrc") && col("doc_id") === col("a_doc"))
        .groupBy(col("source"), col("anchor_rank"), col("tok").as("atok"))
        .agg(max(col("a_doc")).as("a_doc"), max(col("cnt")).as("acnt"))
        .select(col("source").as("asrc"), col("anchor_rank"), col("a_doc"),
          col("atok"), col("acnt"))
      val aLen = lens.join(broadcast(anchors),
          col("source") === col("asrc") && col("doc_id") === col("a_doc"))
        .groupBy(col("source"), col("anchor_rank"))
        .agg(max(col("a_doc")).as("a_doc"), max(col("len")).as("alen"))
        .select(col("source").as("asrc"), col("anchor_rank"), col("a_doc"),
          col("alen"))
      val denom = lens.join(broadcast(aLen.select(col("asrc").as("s2"),
          col("anchor_rank").as("r2"), col("a_doc").as("ad2"),
          col("alen"))), col("source") === col("s2"))
        .filter(col("doc_id") =!= col("ad2"))
        .groupBy(col("source"), col("r2"), col("ad2"), col("alen"))
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
      val ov = tok.join(broadcast(aTok.select(col("asrc").as("s3"),
          col("anchor_rank").as("r3"), col("a_doc").as("ad3"),
          col("atok"), col("acnt"))),
          col("source") === col("s3") && col("tok") === col("atok") &&
            col("doc_id") =!= col("ad3"))
        .groupBy(col("source"), col("r3"))
        .agg(sum(least(col("cnt"), col("acnt"))).as("sum_ov"))
      denom.join(ov.select(col("source").as("s4"), col("r3"),
          col("sum_ov")),
          col("source") === col("s4") && col("r2") === col("r3"), "left")
        .select(col("source"), col("r2").as("anchor_rank"),
          col("ad2").cast("long").as("anchor_doc_id"),
          col("alen").cast("long").as("anchor_len"),
          col("n_docs").cast("long").as("n_docs"),
          coalesce(col("sum_ov"), lit(0L)).cast("long").as("sum_overlap"),
          col("sum_len").cast("long").as("sum_doc_len"))
        .withColumn("prec_ppm",
          expr("CAST(sum_overlap * 1000000 DIV greatest(sum_doc_len, 1)" +
            " AS BIGINT)"))
        .withColumn("recall_ppm",
          expr("CAST(sum_overlap * 1000000" +
            " DIV greatest(n_docs * anchor_len, 1) AS BIGINT)"))
        .orderBy("source", "anchor_rank")
    },

    // L-DIVERSITY census — the privacy triad's second leg (q354 asked
    // "how many people share my quasi-identifier?"; this asks "do they
    // also share my SENSITIVE value?" — a k = 50 class where all 50
    // share one balance band leaks the attribute with certainty):
    // quasi-ID = (nation, segment), sensitive = the q354 balance band;
    // distinct-l per class, classes banded by l, plus the global
    // attack surface (customers in classes with l < 3) and the
    // RECURSIVE (2,2)-diversity failure count (r1 > 2·(k − r1): the
    // modal band dominates even after discounting — distinct-l alone
    // misses a 98/1/1 split). One grid agg; the sensitive grid is
    // schema-bounded (11 bands). Explicit four-band anchor rows (the
    // q336 rule) so empty bands hash identically in both engines.
    "q392_l_diversity" -> { (s, d) =>
      val cls = Caches.shared(Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " + 100000) DIV 100000").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("cnt")))
      val qi = cls.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("l"), sum(col("cnt")).as("ksz"),
          max(col("cnt")).as("r1"))
      val glob = qi.agg(min(col("l")).as("min_l"),
        sum(when(col("l") < 3, col("ksz")).otherwise(0L)).as("n_below_l3"),
        sum(when(col("r1") > lit(2) * (col("ksz") - col("r1")), 1L)
          .otherwise(0L)).as("n_rec22_fail"))
      val bands = qi.sparkSession.range(1).select(explode(array(
        lit("a_l1"), lit("b_l2"), lit("c_l3_4"), lit("d_l5_plus")))
        .as("band"))
      val got = qi.withColumn("band",
          when(col("l") === 1, "a_l1").when(col("l") === 2, "b_l2")
            .when(col("l") <= 4, "c_l3_4").otherwise("d_l5_plus"))
        .groupBy("band")
        .agg(count(lit(1)).as("ncl"), sum(col("ksz")).as("ncu"))
      bands.join(got, Seq("band"), "left")
        .crossJoin(broadcast(glob))
        .select(col("band"),
          coalesce(col("ncl"), lit(0L)).cast("long").as("n_classes"),
          coalesce(col("ncu"), lit(0L)).cast("long").as("n_customers"),
          col("min_l").cast("long").as("min_l"),
          col("n_below_l3").cast("long").as("n_below_l3"),
          col("n_rec22_fail").cast("long").as("n_rec22_fail"))
        .orderBy("band")
    },

    // T-CLOSENESS census — the privacy triad's third leg: l-diversity
    // counts distinct sensitive values; t-closeness asks whether the
    // class's sensitive DISTRIBUTION stays close to the corpus-wide
    // one (a class can hold all 11 bands yet be 95% band-2 — high l,
    // still leaking "probably band 2"). Exact TVD per quasi-class in
    // cross-multiplied integers: tvd_scaled = Σ over the band grid of
    // |cnt_class(v)·N − cnt_glob(v)·k|, tvd_milli = ·1000 DIV (2kN)
    // (the ½Σ|p−q| definition; int64 to ~3·10⁹ customers — the q168
    // magnitude-rule derivation, this time done right). Zero-filled
    // band grid per class (absent bands carry |0·N − g·k|, which is
    // exactly the leaked mass). |nations|·|segments| rows at any SF.
    "q393_t_closeness" -> { (s, d) =>
      val cls = Caches.shared(Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " + 100000) DIV 100000").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("cnt")))
      val qi = cls.groupBy("c_nationkey", "c_mktsegment")
        .agg(sum(col("cnt")).as("ksz"))
      val gb = cls.groupBy("bal_band").agg(sum(col("cnt")).as("gcnt"))
      val tot = gb.agg(sum(col("gcnt")).as("nn"))
      qi.crossJoin(broadcast(gb))
        .join(cls, Seq("c_nationkey", "c_mktsegment", "bal_band"), "left")
        .crossJoin(broadcast(tot))
        .select(col("c_nationkey"), col("c_mktsegment"), col("ksz"),
          col("nn"),
          abs(coalesce(col("cnt"), lit(0L)) * col("nn")
            - col("gcnt") * col("ksz")).as("term"))
        .groupBy("c_nationkey", "c_mktsegment", "ksz", "nn")
        .agg(sum(col("term")).as("tvd_scaled"))
        .select(col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"),
          col("ksz").cast("long").as("n_customers"),
          col("tvd_scaled").cast("long").as("tvd_scaled"),
          expr("CAST(tvd_scaled * 1000 DIV (2 * ksz * nn) AS BIGINT)")
            .as("tvd_milli"))
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // GENERALIZATION-LADDER utility audit — the Samarati ladder the
    // anonymization decision actually walks: each level drops one
    // quasi-identifier attribute ((nation, segment, band) → (nation,
    // segment) → (nation) → ⊤) and the table prices the privacy/
    // utility trade at every rung in one read: class count (utility —
    // more classes = finer analysis), min k (privacy floor), and the
    // suppression cost of enforcing k ≥ 5 (records that must be
    // dropped). The level whose min_k first clears the policy is the
    // release level; everything below is the utility price paid. Four
    // aggregations over ONE cached projection — a grouping-sets scan
    // shape, kept as explicit unions so each rung carries its label.
    "q394_generalization_ladder" -> { (s, d) =>
      val base = Caches.shared(Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " + 100000) DIV 100000").as("bal_band")))
      def rung(label: String, nAttrs: Long, keys: Seq[String]) = {
        val g = if (keys.isEmpty) base.groupBy(lit(1).as("one"))
        else base.groupBy(keys.map(col): _*)
        g.agg(count(lit(1)).as("ksz"))
          .agg(count(lit(1)).as("n_classes"), min(col("ksz")).as("min_k"),
            sum(when(col("ksz") < 5, col("ksz")).otherwise(0L))
              .as("n_suppressed_k5"))
          .select(lit(label).as("level"), lit(nAttrs).as("n_qi_attrs"),
            col("n_classes").cast("long").as("n_classes"),
            col("min_k").cast("long").as("min_k"),
            col("n_suppressed_k5").cast("long").as("n_suppressed_k5"))
      }
      rung("l0_nation_segment_band", 3L,
          Seq("c_nationkey", "c_mktsegment", "bal_band"))
        .unionByName(rung("l1_nation_segment", 2L,
          Seq("c_nationkey", "c_mktsegment")))
        .unionByName(rung("l2_nation", 1L, Seq("c_nationkey")))
        .unionByName(rung("l3_top", 0L, Seq.empty))
        .orderBy("level")
    },

    // CLUSTERING OVERLAP-DEPTH metric — the Delta/Iceberg OPTIMIZE
    // decision's other half (q361 prices skipping for ONE filter
    // column under two layouts; THIS asks, for each CANDIDATE key, how
    // clustered the insertion-order layout already is): depth(v) =
    // number of files whose [min, max] zone contains value v; a
    // perfectly clustered key has depth ≈ 1 everywhere, a shuffled key
    // has depth ≈ |files|. avg_depth_milli vs max_depth per candidate
    // tells which re-cluster job pays before running it. Same 32-file
    // insertion-order model as q361 (event_id·32 DIV (max+1)). Keys:
    // the event day (generator writes roughly time-ordered — low
    // depth) vs the user bucket (hash-scattered — depth ≈ files).
    // Scale: one stats pass builds 2×32 zones; the depth sweep is
    // |values|×32 algebra on horizon/lattice-bounded domains.
    "q401_overlap_depth" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long")
            .as("day_k"),
          (col("user_id") % 256).as("user_k"))
      val mx = ev.agg(max(col("event_id")).as("mi"))
      val filed = Caches.shared(ev.crossJoin(broadcast(mx))
        .select(expr("event_id * 32 DIV (mi + 1)").as("fid"),
          col("day_k"), col("user_k")))
      def depth(key: String, nm: String) = {
        val zones = filed.groupBy("fid")
          .agg(min(col(key)).as("zmin"), max(col(key)).as("zmax"))
        val vals = filed.select(col(key).as("v")).distinct()
        val nf = zones.agg(count(lit(1)).as("n_files"))
        vals.join(broadcast(zones),
            col("v") >= col("zmin") && col("v") <= col("zmax"))
          .groupBy("v").agg(count(lit(1)).as("dep"))
          .agg(count(lit(1)).as("n_values"), sum(col("dep")).as("sdep"),
            max(col("dep")).as("maxd"))
          .crossJoin(broadcast(nf))
          .select(lit(nm).as("candidate_key"),
            col("n_files").cast("long").as("n_files"),
            col("n_values").cast("long").as("n_values"),
            expr("CAST(sdep * 1000 DIV n_values AS BIGINT)")
              .as("avg_depth_milli"),
            col("maxd").cast("long").as("max_depth"))
      }
      depth("day_k", "a_event_day").unionByName(depth("user_k", "b_user_bucket"))
        .orderBy("candidate_key")
    },

    // NEYMAN ALLOCATION table — "given a labeling/eval budget, how many
    // docs should each source contribute?": optimal stratified
    // allocation n_h ∝ N_h·S_h. The exact-integer route: the variance
    // NUMERATOR var_num = n·Σx² − (Σx)² equals n²·Var, so
    // floor(sqrt(var_num)) IS n·S floored — sqrt is IEEE-754
    // correctly-rounded (hardware fsqrt, unlike log/exp), so
    // FLOOR(SQRT(CAST(x AS DOUBLE))) is bit-identical across engines
    // for x < 2^53 (var_num ≈ n²·var stays under that to ~10⁸ docs per
    // source; DECIMAL route past it). alloc_ppm vs the proportional
    // share n_h·10⁶ DIV N shows exactly where Neyman disagrees with
    // naive proportional sampling (high-variance sources oversample).
    // One grid agg; |sources| output rows.
    "q402_neyman_allocation" -> { (s, d) =>
      val st = Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        .select(col("source"), col("n"),
          expr("CAST(n * sxx - sx * sx AS BIGINT)").as("var_num"),
          expr("CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)))" +
            " AS BIGINT)").as("ns"))
      val tot = st.agg(sum(col("ns")).as("tns"), sum(col("n")).as("nn"))
      st.crossJoin(broadcast(tot))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          col("var_num"), col("ns").as("n_times_sd"),
          expr("CAST(ns * 1000000 DIV greatest(tns, 1) AS BIGINT)")
            .as("neyman_ppm"),
          expr("CAST(n * 1000000 DIV nn AS BIGINT)").as("proportional_ppm"),
          expr("CAST(ns * 1000 DIV greatest(tns, 1) AS BIGINT)")
            .as("n_alloc_of_1000"))
        .orderBy("source")
    },

    // SESSION TRIGRAM MOTIFS — which 3-step event-type sequences users
    // actually walk (q99's basket pairs are order-free co-occurrence;
    // funnels test ONE fixed sequence; this censuses ALL length-3
    // paths): per user, events ordered by (ts, event_id) — the
    // reference's arrival-order model — with the two successors read
    // by lead() over ONE user-partitioned sort; trigram counts and
    // share ppm over all trigrams. Output is ≤ |types|³ rows at any
    // SF. The per-user window is bounded by per-user activity, not
    // corpus size, and the single sort serves both leads.
    "q403_trigram_motifs" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val tri = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("e1"))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .withColumn("e3", lead(col("e1"), 2).over(w))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("cnt"))
      val tot = tri.agg(sum(col("cnt")).as("tt"))
      tri.crossJoin(broadcast(tot))
        .select(col("e1"), col("e2"), col("e3"),
          col("cnt").cast("long").as("n_walks"),
          expr("CAST(cnt * 1000000 DIV tt AS BIGINT)").as("share_ppm"))
        .orderBy("e1", "e2", "e3")
    },

    // WEEKLY FULFILLMENT-LAG percentile trend — "is shipping
    // degrading?" read as exact rank selections, not averages (q187
    // counts LATE lines against a threshold; this reads the whole
    // latency DISTRIBUTION per week): lag = ship − order days (a
    // SCHEMA-bounded 1..121 domain per the TPC-H generator), weekly
    // p50/p90/p95 by a PARTITIONED running sum over the (week, lag)
    // grid — Window.partitionBy(wk).orderBy(lag) is O(grid log grid)
    // where the earlier grid²-per-week theta-join was O(grid²/weeks)
    // (round-7 VERDICT "What's wrong #2"); never a corpus-wide sort.
    // Weeks are Monday buckets (epoch-day DIV 7 — one arithmetic
    // convention both engines replay). One orders⋈lineitem orderkey
    // join (the natural fact shuffle) → horizon×121 grid; all three
    // rank selections fold in ONE aggregate over the same pass, and
    // the final groupBy("wk") reuses the window's hash partitioning
    // on wk — no extra exchange, no shared subtree to cache.
    "q404_lag_percentiles" -> { (s, d) =>
      val g = Tables.lineitem(s, d)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("odate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(expr("datediff(ship, DATE '1970-01-05') div 7").as("wk"),
          datediff(col("ship"), col("odate")).cast("long").as("lag"))
        .groupBy("wk", "lag").agg(count(lit(1)).as("c"))
      val run = Window.partitionBy("wk").orderBy("lag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = g
        .withColumn("cumlt", sum(col("c")).over(run) - col("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("wk")))
      def pick(kExpr: String) =
        max(when(expr(s"cumlt < $kExpr AND $kExpr <= cumlt + c"), col("lag")))
      cum.groupBy("wk")
        .agg(max(col("n")).cast("long").as("n_lines"),
          pick("(n + 1) div 2").cast("long").as("p50_days"),
          pick("(9 * n + 9) div 10").cast("long").as("p90_days"),
          pick("(19 * n + 19) div 20").cast("long").as("p95_days"))
        .select(col("wk").cast("long").as("week"), col("n_lines"),
          col("p50_days"), col("p90_days"), col("p95_days"))
        .orderBy("week")
    },

    // MONTHLY OPEN-ORDER BACKLOG — the inventory-balance time series
    // (every warehouse runs one): an order opens at o_orderdate and
    // closes when its LAST line ships; backlog(m) = orders opened in
    // months ≤ m minus orders closed in months ≤ m, both cumulative
    // sums by predecessor-count theta-join on the horizon-bounded
    // month grid (84 months — never a window over the fact table). A
    // backlog that trends up says intake outruns fulfillment. Scale:
    // close dates are ONE max-aggregation per order (the natural
    // l_orderkey shuffle); everything after is month-grid algebra.
    "q405_order_backlog" -> { (s, d) =>
      def ym(c: Column) = (year(c) * 12 + month(c) - 1).cast("long")
      val opened = Tables.orders(s, d)
        .groupBy(ym(col("o_orderdate")).as("m")).agg(count(lit(1)).as("op"))
      val closed = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(max(to_date(col("l_shipdate"))).as("closed"))
        .groupBy(ym(col("closed")).as("m")).agg(count(lit(1)).as("cl"))
      val months = opened.select("m").union(closed.select("m")).distinct()
      val grid = Caches.shared(months
        .join(opened, Seq("m"), "left").join(closed, Seq("m"), "left")
        .select(col("m"), coalesce(col("op"), lit(0L)).as("op"),
          coalesce(col("cl"), lit(0L)).as("cl")))
      grid.select(col("m"), col("op"), col("cl"))
        .join(broadcast(grid.select(col("m").as("m2"), col("op").as("op2"),
          col("cl").as("cl2"))), col("m2") <= col("m"))
        .groupBy("m", "op", "cl")
        .agg(sum(col("op2")).as("cum_open"), sum(col("cl2")).as("cum_close"))
        .select(col("m").cast("long").as("month_idx"),
          col("op").cast("long").as("n_opened"),
          col("cl").cast("long").as("n_closed"),
          (col("cum_open") - col("cum_close")).cast("long").as("backlog"))
        .orderBy("month_idx")
    },

    // DIXON-Q extreme-day screen — the ratio-based single-outlier test
    // (Dean & Dixon 1951): per event type, Q = gap/range of the daily
    // maximum, Q_milli = (max − 2nd_max)·1000 DIV (max − min) on the
    // ACTIVE-day counts — division-free apart from the one final
    // floor, no variance, no distribution assumption; the classic lab
    // rule Q > 0.5-ish marks the top day as a discordant outlier
    // (replay spike, bot storm) rather than the tail of normal
    // variation. Complements q344/q218 (threshold detectors flag MANY
    // days; Dixon asks specifically whether the SINGLE worst day
    // belongs). second_max is the ORDER-STATISTIC x(n−1): when ≥2 days
    // tie at the maximum, x(n−1) = x(n) so the gap (and Q) is 0 — a
    // duplicated spike is two observations, not one discordant outlier
    // (Dixon's test is single-outlier by construction). One grouped
    // pass over the (type, day)-grid computes both the strict runner-up
    // and the tie count — no sort.
    "q501_dixon_extreme_day" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")))
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          max(col("c")).as("mx"), min(col("c")).as("mn"))
      val second = daily.join(
          stats.select(col("event_type"), col("mx").as("mx2")),
          Seq("event_type"))
        .groupBy("event_type").agg(
          max(when(col("c") < col("mx2"), col("c"))).as("snd"),
          sum(when(col("c") === col("mx2"), 1L).otherwise(0L)).as("n_at_max"))
      stats.join(second, Seq("event_type"), "left")
        // x(n−1): the max itself when tied (n_at_max ≥ 2) or when every
        // day ties (snd NULL); the strict runner-up otherwise
        .withColumn("x_nm1",
          when(col("n_at_max") >= 2L, col("mx"))
            .otherwise(coalesce(col("snd"), col("mx"))))
        .select(col("event_type"), col("n_days"),
          col("mx").cast("long").as("max_day_events"),
          col("x_nm1").cast("long").as("second_max"),
          col("mn").cast("long").as("min_day_events"),
          expr("CAST((mx - x_nm1) * 1000" +
            " DIV GREATEST(mx - mn, 1) AS BIGINT)").as("q_milli"))
        .orderBy("event_type")
    },

    // MULTIWINDOW BURN-RATE alerts — the Google-SRE error-budget
    // policy q495's consecutive-minutes breaker complements: a page
    // fires when the error rate burns the budget at 14.4× over a SHORT
    // 5-minute window AND 6× over a LONG 60-minute window (the AND is
    // the design — the short window gives reaction speed, the long one
    // kills flapping). Budget rate = the grid-mean error rate; window
    // sums are running sums over the zero-filled minute grid; the
    // threshold compare is division-free (sum_w·n_min·10 >
    // burn_tenths·total·w). Output: flagged-minute census for the 5m
    // leg, the 60m leg, and the AND-page — the table that shows how
    // much alert noise the multiwindow rule removes. Windows partition
    // by the 2-row config key over the generator-span minute grid.
    "q498_burn_rate_alerts" -> { (s, d) =>
      val err = Tables.events(s, d).filter(col("event_type") === "error")
        .select(expr("unix_micros(ts) div 60000000").as("m"))
      val perMin = err.groupBy("m").agg(count(lit(1)).as("c"))
      val bounds = err.agg(min(col("m")).as("mn"), max(col("m")).as("mx"),
        count(lit(1)).as("total"))
      val grid = bounds
        .select(explode(expr("sequence(mn, mx)")).as("m"),
          (col("mx") - col("mn") + 1).as("nmin"), col("total"))
        .join(perMin, Seq("m"), "left")
        .select(col("m"), col("nmin"), col("total"),
          coalesce(col("c"), lit(0L)).as("c"))
      // rolling sum with a per-config width needs the width folded into
      // the frame: run the two widths as separate branches of one join
      // (partition key = the constant nmin column — one run-scoped
      // partition over the time-span-bounded grid, the q495 envelope)
      def leg(w: Int, burnTenths: Long, tag: String): DataFrame =
        grid.withColumn("ws", sum(col("c")).over(
            Window.partitionBy("nmin").orderBy("m")
              .rowsBetween(-(w - 1), 0)))
          .select(col("m"),
            (col("ws") * col("nmin") * 10 >
              lit(burnTenths) * col("total") * w).as(tag))
      val f5 = leg(5, 144L, "f5")
      val f60 = leg(60, 60L, "f60")
      val joined = Caches.shared(f5.join(f60, "m"))
      val legs = Seq(
        ("a_5m_fast", col("f5")), ("b_60m_slow", col("f60")),
        ("c_page_and", col("f5") && col("f60")))
      legs.map { case (tag, cond) =>
        joined.agg(count(lit(1)).as("n_minutes"),
            sum(when(cond, 1L).otherwise(0L)).as("n_flagged"))
          .select(lit(tag).as("alert_leg"),
            col("n_minutes").cast("long").as("n_minutes"),
            col("n_flagged").cast("long").as("n_flagged"),
            expr("CAST(n_flagged * 1000000 DIV n_minutes AS BIGINT)")
              .as("noise_ppm"))
      }.reduce(_ unionByName _).orderBy("alert_leg")
    },

    // ERROR-BURST CIRCUIT-BREAKER tuning — the SRE dial (trip after K
    // consecutive over-threshold minutes) priced on real error
    // traffic: the error stream on the ZERO-FILLED minute grid (absent
    // minutes must break runs — without the fill, a quiet hour glues
    // two bursts together), swept at thresholds t× the grid-mean rate,
    // t ∈ {1, 2, 4}; "above" is the division-free cross-multiplied
    // compare c·n_minutes > t·total. Bursts = gaps-and-islands (q175)
    // over the flagged minutes: island id = minute − rank among
    // flagged; a trip = an island of ≥ 3 consecutive minutes. Per
    // threshold: grid size, above-minutes, burst count, trip count,
    // longest burst — the table that picks the threshold where trips
    // are incidents, not noise. Windows partition by the 3-row
    // threshold key over the generator-span minute grid (time-bounded,
    // never volume-bounded — the q404 rule).
    "q495_circuit_breaker" -> { (s, d) =>
      val err = Tables.events(s, d).filter(col("event_type") === "error")
        .select(expr("unix_micros(ts) div 60000000").as("m"))
      val perMin = err.groupBy("m").agg(count(lit(1)).as("c"))
      val bounds = err.agg(min(col("m")).as("mn"), max(col("m")).as("mx"),
        count(lit(1)).as("total"))
      val grid = bounds
        .select(explode(expr("sequence(mn, mx)")).as("m"),
          (col("mx") - col("mn") + 1).as("nmin"), col("total"))
        .join(perMin, Seq("m"), "left")
        .select(col("m"), col("nmin"), col("total"),
          coalesce(col("c"), lit(0L)).as("c"))
      val ts2 = s.range(0, 3).select(
        expr("element_at(array(1L, 2L, 4L), CAST(id + 1 AS INT))").as("t"))
      val flagged = grid.crossJoin(broadcast(ts2))
        .withColumn("above",
          col("c") * col("nmin") > col("t") * col("total"))
      val wr = Window.partitionBy("t").orderBy("m")
      val islands = flagged.filter(col("above"))
        .withColumn("isl", col("m") - row_number().over(wr))
        .groupBy("t", "isl").agg(count(lit(1)).as("len"))
      val perT = islands.groupBy("t")
        .agg(sum(col("len")).as("n_above"),
          count(lit(1)).cast("long").as("n_bursts"),
          sum(when(col("len") >= 3, 1L).otherwise(0L)).cast("long")
            .as("n_trips"),
          max(col("len")).cast("long").as("longest_burst"))
      ts2.join(perT, Seq("t"), "left")
        .crossJoin(broadcast(bounds.select(
          (col("mx") - col("mn") + 1).cast("long").as("n_minutes"))))
        .select(col("t").cast("long").as("threshold_x"), col("n_minutes"),
          coalesce(col("n_above"), lit(0L)).cast("long").as("n_above"),
          coalesce(col("n_bursts"), lit(0L)).as("n_bursts"),
          coalesce(col("n_trips"), lit(0L)).as("n_trips"),
          coalesce(col("longest_burst"), lit(0L)).as("longest_burst"))
        .orderBy("threshold_x")
    },

    // DAY-BOUNDARY sensitivity audit — how much every daily metric in
    // this repo depends on WHERE midnight falls (the timezone gotcha
    // that silently shifts dashboards when a pipeline moves regions):
    // the per-type daily-count series computed at the UTC boundary vs
    // the same series at UTC+8, full-outer-joined on (type, day);
    // reported per type as diverging-day count, max |Δ|, and the
    // total-variation-style shift_ppm = Σ|Δ|·10⁶ DIV (2·mass) — the
    // fraction of event mass that changes its day label. A high value
    // says "this metric is boundary-fragile; pin the reporting
    // timezone in the contract". Scale: two (type, day)-grid aggs +
    // grid algebra, both map-combined.
    "q490_day_boundary_shift" -> { (s, d) =>
      val ev = Caches.shared(Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us")))
      val a = ev.groupBy(col("event_type"),
          expr("us div 86400000000").as("day"))
        .agg(count(lit(1)).as("ca"))
      val b = ev.groupBy(col("event_type"),
          expr("(us + 28800000000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("cb"))
      a.join(b, Seq("event_type", "day"), "full_outer")
        .select(col("event_type"), col("day"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum(when(col("ca") =!= col("cb"), 1L).otherwise(0L)).cast("long")
            .as("n_diverging"),
          max(abs(col("ca") - col("cb"))).cast("long").as("max_abs_diff"),
          sum(abs(col("ca") - col("cb"))).as("sum_abs"),
          sum(col("ca")).as("mass"))
        .select(col("event_type"), col("n_days"), col("n_diverging"),
          col("max_abs_diff"),
          expr("CAST(sum_abs * 1000000 DIV (2 * mass) AS BIGINT)")
            .as("shift_ppm"))
        .orderBy("event_type")
    },

    // BACKLOG AGING — q405's balance split by AGE: the finance/WIP
    // aging report ("how much of the open book is 0, 1–3, 4–12, >12
    // months old?") that decides escalation and write-off policy; a
    // backlog that grows ONLY in the old buckets is a stuck-order
    // problem, not an intake problem. An order opened in month mo,
    // last-shipped in month mc is open at month-ends m ∈ [mo, mc)
    // (same-month closes never appear — filtered EXPLICITLY because
    // Spark's sequence() runs DESCENDING on an empty range while
    // DuckDB's generate_series returns empty, a parity trap);
    // never-shipped orders stay open through the horizon. Count AND
    // o_totalprice cents mass per bucket. Scale: close month is ONE
    // max-agg per order (the natural shuffle); orders collapse onto
    // the (mo, mc) month-pair grid (≤ horizon² cells) BEFORE the
    // explode, so the month fan-out is grid algebra, never per-order.
    "q486_backlog_aging" -> { (s, d) =>
      def ym(c: Column) = (year(c) * 12 + month(c) - 1).cast("long")
      val closed = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(ym(max(to_date(col("l_shipdate")))).as("mc"))
      val ords = Tables.orders(s, d).select(col("o_orderkey").as("okey"),
          ym(col("o_orderdate")).as("mo"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .join(closed, col("okey") === col("l_orderkey"), "left")
      val hi = ords.agg(max(greatest(col("mo"),
        coalesce(col("mc"), col("mo")))).as("hi"))
      val cells = ords.crossJoin(broadcast(hi))
        .withColumn("mceff", coalesce(col("mc"), col("hi") + 1))
        .groupBy("mo", "mceff", "hi")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .filter(col("mceff") > col("mo"))
      cells.select(col("mo"), col("n"), col("cents"),
          explode(expr("sequence(mo, least(mceff - 1, hi))")).as("m"))
        .withColumn("bucket", expr("CASE WHEN m = mo THEN 'a_0m'" +
          " WHEN m - mo <= 3 THEN 'b_1_3m'" +
          " WHEN m - mo <= 12 THEN 'c_4_12m' ELSE 'd_gt12m' END"))
        .groupBy("m", "bucket")
        .agg(sum(col("n")).cast("long").as("n_open"),
          sum(col("cents")).cast("long").as("open_cents"))
        .select(col("m").cast("long").as("month_idx"), col("bucket"),
          col("n_open"), col("open_cents"))
        .orderBy("month_idx", "bucket")
    },

    // PERCENTILE-OF-PERCENTILES bias audit — the distributed-systems
    // anti-pattern measured exactly: per-shard p50s averaged together
    // are NOT the p50 (percentiles don't compose), yet sharded
    // dashboards do it anyway; this prices the bias on real data. Ship
    // delay per order priority, sharded 16 ways by l_orderkey hash:
    // the TRUE exact p50 (q359's ceil-rank selection on the marginal),
    // the mean of the 16 per-shard p50s in milli-days, the bias, and
    // the worst single-shard deviation (how wrong one unlucky shard's
    // gauge can read). Windows are partitioned by the bounded
    // (priority[, shard]) keys over the generator-span delay grid —
    // the q404 selection shape, never a corpus sort.
    "q487_sharded_percentile_bias" -> { (s, d) =>
      val base = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("prio"),
          (col("l_orderkey") % 16).cast("long").as("shard"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("delay"))
      val g = Caches.shared(base.groupBy("prio", "shard", "delay")
        .agg(count(lit(1)).as("c")))
      def p50(df: DataFrame, keys: Seq[String]): DataFrame = {
        val w = Window.partitionBy(keys.map(col): _*).orderBy("delay")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = Window.partitionBy(keys.map(col): _*)
        df.withColumn("cum", sum(col("c")).over(w))
          .withColumn("n", sum(col("c")).over(wn))
          .groupBy(keys.map(col): _*)
          .agg(max(col("n")).as("n"),
            max(when(expr("cum - c < (n + 1) DIV 2 AND (n + 1) DIV 2 <= cum"),
              col("delay"))).as("p50"))
      }
      val byShard = p50(g, Seq("prio", "shard"))
        .groupBy("prio")
        .agg(count(lit(1)).as("n_shards"),
          sum(col("p50")).as("sum_p50"),
          max(col("p50")).as("max_p50"), min(col("p50")).as("min_p50"))
      val truth = p50(g.groupBy("prio", "delay")
          .agg(sum(col("c")).as("c")), Seq("prio"))
      truth.join(byShard, "prio")
        .select(col("prio"), col("n").cast("long").as("n_lines"),
          col("p50").cast("long").as("p50_true"),
          col("n_shards").cast("long").as("n_shards"),
          expr("CAST(sum_p50 * 1000 DIV n_shards AS BIGINT)")
            .as("shard_mean_milli"),
          expr("CAST(sum_p50 * 1000 DIV n_shards - p50 * 1000 AS BIGINT)")
            .as("bias_milli"),
          expr("CAST(GREATEST(max_p50 - p50, p50 - min_p50) AS BIGINT)")
            .as("worst_shard_dev"))
        .orderBy("prio")
    },

    // LEAD-LAG cross-correlation table — "does type A LEAD type B by k
    // days?" (q377 reads same-day co-movement; q385 reads each type's
    // own memory; THIS scans the lag axis BETWEEN types): for every
    // ordered pair and k ∈ −3..3, the exact covariance numerator
    // m·Σxy − Σx·Σy on the zero-filled day grids, then the argmax of
    // |cov| with the (|cov| desc, k asc) deterministic tie order. A
    // best lag of +2 with positive cov says A's spikes precede B's by
    // two days — the causality-screening table an attribution model
    // starts from. Zero-filling matters for the same reason as q385;
    // the k fan-out is a 7-row literal lattice; DECIMAL(38,0)
    // numerators (HUGEINT mirror).
    "q406_leadlag_best" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val span = daily.groupBy("event_type")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val grid = Caches.shared(span
        .select(col("event_type"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("x")))
      val lags = span.sparkSession.range(-3, 4)
        .select(col("id").cast("int").as("k"))
      val perK = grid.select(col("event_type").as("ta"), col("day"),
          col("x").as("xa"))
        .crossJoin(broadcast(lags))
        .join(grid.select(col("event_type").as("tb"), col("day").as("db"),
          col("x").as("xb")),
          col("ta") =!= col("tb") && expr("date_add(day, k)") === col("db"))
        .groupBy("ta", "tb", "k")
        .agg(count(lit(1)).as("m"),
          sum(col("xa").cast("decimal(38,0)")).as("sx"),
          sum(col("xb").cast("decimal(38,0)")).as("sy"),
          sum(col("xa").cast("decimal(38,0)") * col("xb")).as("sxy"))
        .select(col("ta"), col("tb"), col("k"),
          col("m"), expr("m * sxy - sx * sy").as("cov"))
      perK.groupBy("ta", "tb")
        .agg(max(struct(abs(col("cov")).as("ac"), (-col("k")).as("nk"),
          col("cov").as("cv"), col("m").as("mm"))).as("b"))
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          (-col("b.nk")).cast("long").as("best_lag_days"),
          col("b.mm").cast("long").as("n_pairs"),
          col("b.cv").cast("long").as("cov_num"),
          col("b.ac").cast("long").as("abs_cov"))
        .orderBy("type_a", "type_b")
    },

    // RENDEZVOUS (highest-random-weight) ROUTING audit — the
    // consistent-routing primitive behind cache shards and stateless
    // partitioners, measured exactly: shard(d, N) = argmax over s < N
    // of h(d:s) with the engine-neutral md5 hash (h desc, s asc tie
    // order — 32-bit collisions are possible at corpus scale, so the
    // tie rule is part of the definition). The table shows the 8-shard
    // balance, the 9-shard balance, and the REMAP column that proves
    // rendezvous' selling point: a document moves iff the NEW shard
    // wins its argmax, so every move lands on shard 8 and the old
    // shards lose ≈ 1/9 each and gain NOTHING (the zero-move law for
    // s < 8 is spec-asserted, not assumed). Scale: one |docs|×9
    // lattice explode, two conditional argmax aggregations, one
    // grid-sized groupBy — no shuffle wider than the doc_id agg.
    "q407_rendezvous_routing" -> { (s, d) =>
      val lat = Tables.documents(s, d).sparkSession.range(0, 9)
        .select(col("id").cast("long").as("sh"))
      val ex = Tables.documents(s, d).select(col("doc_id"))
        .crossJoin(broadcast(lat))
        .withColumn("h", Dedup.neutralHash32(
          concat(col("doc_id").cast("string"), lit(":"), col("sh"))))
      val assigned = ex.groupBy("doc_id")
        .agg(max(when(col("sh") <= 7, struct(col("h"), (-col("sh")).as("ns"))))
          .as("a8"),
          max(struct(col("h"), (-col("sh")).as("ns"))).as("a9"))
        .select(col("doc_id"), (-col("a8.ns")).as("s8"),
          (-col("a9.ns")).as("s9"))
      val tot = assigned.agg(count(lit(1)).as("n"))
      assigned.groupBy("s9")
        .agg(count(lit(1)).as("n9"),
          sum(when(col("s8") === col("s9"), 1L).otherwise(0L)).as("stay"),
          sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("moved_in"))
        .join(assigned.groupBy(col("s8").as("s9")).agg(count(lit(1)).as("n8"))
          .select(col("s9"), col("n8")), Seq("s9"), "full")
        .crossJoin(broadcast(tot))
        .select(col("s9").cast("long").as("shard"),
          coalesce(col("n8"), lit(0L)).cast("long").as("n_at_8_shards"),
          coalesce(col("n9"), lit(0L)).cast("long").as("n_at_9_shards"),
          coalesce(col("moved_in"), lit(0L)).cast("long").as("moved_in"),
          expr("CAST(coalesce(n9, 0) * 1000000 DIV n AS BIGINT)")
            .as("share9_ppm"))
        .orderBy("shard")
    },

    // RIGHT-TO-ERASURE impact census — the governance pre-flight every
    // deletion pipeline runs before touching data: given a deletion
    // cohort (key % 23 = 0 — the q59 sampling convention), how many
    // rows does each table lose, directly (events by user, customer by
    // key, orders by customer) and TRANSITIVELY (lineitem through its
    // order — the FK cascade q350 audits in the other direction)?
    // share_ppm per table shows whether the cohort's footprint is
    // uniform or concentrated. One scan per table; the lineitem leg
    // pays the natural orderkey shuffle against the doomed-orders set.
    "q408_erasure_impact" -> { (s, d) =>
      def leg(nm: String, df: DataFrame, hit: Column) =
        df.agg(count(lit(1)).as("t"),
            sum(when(hit, 1L).otherwise(0L)).as("del"))
          .select(lit(nm).as("table_name"), col("t").cast("long")
            .as("n_rows_total"), col("del").cast("long").as("n_rows_deleted"),
            expr("CAST(del * 1000000 DIV t AS BIGINT)").as("share_ppm"))
      val doomed = Tables.orders(s, d)
        .filter(col("o_custkey") % 23 === 0)
        .select(col("o_orderkey").as("dk"))
      val liLeg = Tables.lineitem(s, d).select(col("l_orderkey"))
        .join(doomed, col("l_orderkey") === col("dk"), "left")
        .agg(count(lit(1)).as("t"),
          sum(when(col("dk").isNotNull, 1L).otherwise(0L)).as("del"))
        .select(lit("d_lineitem").as("table_name"),
          col("t").cast("long").as("n_rows_total"),
          col("del").cast("long").as("n_rows_deleted"),
          expr("CAST(del * 1000000 DIV t AS BIGINT)").as("share_ppm"))
      leg("a_customer", Tables.customer(s, d), col("c_custkey") % 23 === 0)
        .unionByName(leg("b_orders", Tables.orders(s, d),
          col("o_custkey") % 23 === 0))
        .unionByName(leg("c_events", Tables.events(s, d),
          col("user_id") % 23 === 0))
        .unionByName(liLeg)
        .orderBy("table_name")
    },

    // INVERTED-INDEX POSTINGS census — the index-build capacity table
    // (q77 prices per-DOC rarity; q137's BM25 consumes the index; THIS
    // sizes it): document frequency per term, terms bucketed on the
    // power-of-2 df lattice (the q229 `lo` grid — log2 via lattice
    // join, never a transcendental), and per bucket the term count,
    // total postings and postings share. The long tail (df = 1) vs the
    // stop-band (top buckets) is THE sizing decision for posting-list
    // compression and stopword cuts. One tokenize+distinct scan →
    // (term, df) grid; the bucket join is a 34-row broadcast lattice.
    "q409_postings_census" -> { (s, d) =>
      val df0 = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val lat = df0.sparkSession.range(0, 34)
        .select(expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))" +
          " AS BIGINT)").as("lo"))
      val tot = df0.agg(sum(col("df")).as("tp"), count(lit(1)).as("nt"))
      df0.join(broadcast(lat),
          col("df") >= col("lo") && col("df") < col("lo") * 2)
        .groupBy("lo")
        .agg(count(lit(1)).as("n_terms"), sum(col("df")).as("postings"))
        .crossJoin(broadcast(tot))
        .select(col("lo").cast("long").as("df_bucket_lo"),
          col("n_terms").cast("long").as("n_terms"),
          col("postings").cast("long").as("n_postings"),
          expr("CAST(postings * 1000000 DIV tp AS BIGINT)")
            .as("postings_share_ppm"),
          expr("CAST(n_terms * 1000000 DIV nt AS BIGINT)")
            .as("terms_share_ppm"))
        .orderBy("df_bucket_lo")
    },

    // TREND SIGNIFICANCE screen — q373's Mann–Kendall made decidable
    // WITHOUT a single float: the z-score z = S/√Var compares to a
    // threshold c exactly by SQUARING both sides (S²·18 vs c²·var18 —
    // the sqrt never happens; sign carried separately). One table
    // flags every event type at the 2σ and 3σ gates and carries
    // z²·1000 for ranking; the 3σ column doubles as a 5-test
    // Bonferroni-ish screen (α ≈ 0.003 per test). The multiple-testing
    // story the per-type tau alone can't tell.
    "q410_trend_screen" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
      val p = daily.select(col("event_type"), col("day").as("d1"),
          col("n").as("n1"))
        .join(broadcast(daily.select(col("event_type").as("et2"),
          col("day").as("d2"), col("n").as("n2"))),
          col("event_type") === col("et2") && col("d1") < col("d2"))
      val sStat = p.groupBy("event_type")
        .agg(sum(when(col("n2") > col("n1"), 1L)
          .when(col("n2") < col("n1"), -1L).otherwise(0L)).as("s"))
      val nd = daily.groupBy("event_type").agg(count(lit(1)).as("ndays"))
      val ties = daily.groupBy("event_type", "n")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tiesum"))
      nd.join(sStat, "event_type").join(ties, "event_type")
        .withColumn("var18",
          expr("ndays * (ndays - 1) * (2 * ndays + 5) - tiesum"))
        .select(col("event_type"), col("ndays").cast("long").as("n_days"),
          col("s").cast("long").as("s_stat"),
          col("var18").cast("long").as("var18_num"),
          expr("CAST(18 * s * s * 1000 DIV greatest(var18, 1) AS BIGINT)")
            .as("z2_milli"),
          expr("18 * s * s > 4 * var18").as("sig_2sigma"),
          expr("18 * s * s > 9 * var18").as("sig_3sigma"))
        .orderBy("event_type")
    },

    // TIME-SPLIT drift test — the exact Kolmogorov–Smirnov machinery
    // (q370) pointed at the TIME axis instead of the source axis: for
    // each event type, does the VALUE distribution of the first half
    // of the horizon (through Jan 15) match the second half? Values
    // land on the floor(value) integer grid (≈ 560 buckets by the
    // generator's range — a documented bucketing, exact thereafter);
    // D·n_a·n_b = max over the type's value grid of
    // |F_a(v)·n_b − F_b(v)·n_a| with the step-CDFs built by one
    // running-sum window per (type, half) — partitions bounded by the
    // value grid, never the corpus. The drift gate a training-data
    // snapshot diff runs before shipping an incremental batch.
    "q411_timesplit_ks" -> { (s, d) =>
      val g = Caches.shared(Tables.events(s, d)
        .select(col("event_type"),
          when(to_date(col("ts")) <= lit("2024-01-15"), "a").otherwise("b")
            .as("half"),
          expr("CAST(floor(value) AS BIGINT)").as("v"))
        .groupBy("event_type", "half", "v").agg(count(lit(1)).as("c")))
      val tot = g.groupBy("event_type", "half").agg(sum(col("c")).as("n"))
      val vals = g.select("event_type", "v").distinct()
      val halves = g.sparkSession.range(1)
        .select(explode(array(lit("a"), lit("b"))).as("half"))
      val cum = vals.crossJoin(broadcast(halves))
        .join(g, Seq("event_type", "half", "v"), "left")
        .select(col("event_type"), col("half"), col("v"),
          coalesce(col("c"), lit(0L)).as("c0"))
        .withColumn("f", sum(col("c0")).over(
          Window.partitionBy("event_type", "half").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)))
      val wide = cum.filter(col("half") === "a")
        .select(col("event_type"), col("v"), col("f").as("fa"))
        .join(cum.filter(col("half") === "b")
          .select(col("event_type").as("e2"), col("v").as("v2"),
            col("f").as("fb")),
          col("event_type") === col("e2") && col("v") === col("v2"))
      val ns = tot.groupBy("event_type")
        .agg(max(when(col("half") === "a", col("n"))).as("na"),
          max(when(col("half") === "b", col("n"))).as("nb"))
      wide.join(broadcast(ns), "event_type")
        .groupBy("event_type", "na", "nb")
        .agg(max(abs(col("fa") * col("nb") - col("fb") * col("na")))
          .as("dnum"))
        .select(col("event_type"),
          col("na").cast("long").as("n_first"),
          col("nb").cast("long").as("n_second"),
          col("dnum").cast("long").as("d_scaled"),
          expr("CAST(dnum * 1000000 DIV greatest(na * nb, 1) AS BIGINT)")
            .as("ks_ppm"))
        .orderBy("event_type")
    },

    // MEDIAN with its ORDER-STATISTIC confidence interval — the robust
    // report every per-source summary should carry (a bare median from
    // 30 docs and one from 30,000 read the same; the CI width says
    // which to trust): the classic distribution-free √n interval —
    // ranks k ± ⌊√n⌋ clamped to [1, n] (≈ 95% coverage at the normal
    // approximation; the CONSTRUCTION is exact order statistics either
    // way) — with ⌊√n⌋ = FLOOR(SQRT(n)), bit-identical across engines
    // for n < 2⁵³ (the q402 IEEE-sqrt rule). Three ceil-rank
    // selections from ONE shared cumlt grid; width in chars is the
    // comparability number. One corpus grid agg.
    "q412_median_ci" -> { (s, d) =>
      val g = Caches.shared(Tables.documents(s, d)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("c")))
      val tot = g.groupBy("source").agg(sum(col("c")).as("n"))
      val cum = Caches.shared(g.select(col("source"), col("n_chars").as("v"),
          col("c"))
        .join(broadcast(g.select(col("source").as("s2"),
          col("n_chars").as("w"), col("c").as("cw"))),
          col("source") === col("s2") && col("w") < col("v"), "left")
        .groupBy("source", "v", "c")
        .agg(coalesce(sum(col("cw")), lit(0L)).as("cumlt"))
        .join(broadcast(tot), "source")
        .withColumn("k", expr("(n + 1) div 2"))
        .withColumn("r", expr("CAST(floor(sqrt(CAST(n AS DOUBLE)))" +
          " AS BIGINT)")))
      def sel(kExpr: String, nm: String) =
        cum.filter(expr(s"cumlt < $kExpr AND $kExpr <= cumlt + c"))
          .select(col("source").as(s"s_$nm"), col("v").as(nm))
      sel("k", "med")
        .join(sel("greatest(k - r, 1)", "ci_lo"), col("s_med") === col("s_ci_lo"))
        .join(sel("least(k + r, n)", "ci_hi"), col("s_med") === col("s_ci_hi"))
        .join(broadcast(tot), col("s_med") === col("source"))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          col("med").cast("long").as("median_chars"),
          col("ci_lo").cast("long").as("ci_lo"),
          col("ci_hi").cast("long").as("ci_hi"),
          (col("ci_hi") - col("ci_lo")).cast("long").as("ci_width"))
        .orderBy("source")
    },

    // COLUMN-ENCODING advisor — the parquet writer decision (dictionary
    // vs run-length) read from the data itself, per candidate column:
    // distinct ratio (dictionary page viability) and the CHANGE-POINT
    // count along adjacent doc_ids (run-length viability — values that
    // cluster in writer order compress as runs; the count is over
    // ADJACENT id pairs, one convention both engines replay, so id
    // gaps cost a pair, never a wrong answer). rle_ratio_ppm =
    // est_runs·10⁶ DIV rows: ≪ 10⁶ means sort-order already favors
    // RLE; ≈ 10⁶ means shuffled — dictionary or re-sort first. One
    // scan + one adjacent-id self-join; 2 output rows.
    "q413_encoding_advisor" -> { (s, d) =>
      val base = Caches.shared(Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang")))
      val pairs = Caches.shared(base.select(col("doc_id"),
          col("source").as("sa"), col("lang").as("la"))
        .join(base.select((col("doc_id") - 1).as("doc_id"),
          col("source").as("sb"), col("lang").as("lb")), "doc_id"))
      def leg(nm: String, vcol: String, a: String, b: String) = {
        val st = base.agg(count(lit(1)).as("nr"),
          countDistinct(col(vcol)).as("ndist"))
        val ch = pairs.agg(count(lit(1)).as("np"),
          sum(when(col(a) =!= col(b), 1L).otherwise(0L)).as("chg"))
        st.crossJoin(ch)
          .select(lit(nm).as("column_name"),
            col("nr").cast("long").as("n_rows"),
            col("ndist").cast("long").as("n_distinct"),
            expr("CAST(ndist * 1000000 DIV nr AS BIGINT)")
              .as("distinct_ppm"),
            col("np").cast("long").as("n_adjacent_pairs"),
            col("chg").cast("long").as("n_change_points"),
            expr("CAST((chg + 1) * 1000000 DIV nr AS BIGINT)")
              .as("rle_ratio_ppm"))
      }
      leg("a_source", "source", "sa", "sb")
        .unionByName(leg("b_lang", "lang", "la", "lb"))
        .orderBy("column_name")
    },

    // KENDALL'S W concordance across weekday rankings — "do the seven
    // weekdays agree on which event types are big?" (q373/q410 test
    // each type against time; THIS tests the RANKINGS against each
    // other — W ≈ 1 means one stable league table, W ≈ 0 means the
    // mix reshuffles by weekday and any single-day sample is biased):
    // judges = weekdays (m = 7), items = event types, midranks doubled
    // to stay integer (2r = 2·cnt_smaller + ties + 1 per judge),
    // R2_i = Σ_judges 2r, S4 = Σ_i (R2_i − m(k+1))² = 4S, and the
    // tie-corrected W = 12S/(m²(k³−k) − m·ΣT_j) reported as
    // w_ppm = 12·S4·10⁶ DIV 4·(m²(k³−k) − m·ΣT_j). Weekday index is
    // (epoch_day + 4) % 7 — one arithmetic convention both engines
    // replay (1970-01-01 was a Thursday), immune to locale WEEKDAY()
    // disagreements. Per-type rank sums ride along for audit. All
    // grids are |weekdays|×|types|. The grid is DENSIFIED (weekday ×
    // type cross join, missing counts 0) before ranking: a type with
    // zero events on some weekday must still be ranked by that judge,
    // or per-judge midranks break the m(k+1) centering W relies on.
    "q414_kendall_w" -> { (s, d) =>
      val raw = Tables.events(s, d)
        .select(expr("(datediff(to_date(ts), DATE '1970-01-01') + 4) % 7")
          .as("wd"), col("event_type"))
        .groupBy("wd", "event_type").agg(count(lit(1)).as("tot"))
      val g = Caches.shared(raw.select("wd").distinct()
        .crossJoin(broadcast(raw.select("event_type").distinct()))
        .join(broadcast(raw), Seq("wd", "event_type"), "left")
        .select(col("wd"), col("event_type"),
          coalesce(col("tot"), lit(0L)).as("tot")))
      val r2 = g.select(col("wd"), col("event_type"), col("tot"))
        .join(broadcast(g.select(col("wd").as("w2"),
          col("event_type").as("e2"), col("tot").as("t2"))),
          col("wd") === col("w2"))
        .groupBy("wd", "event_type")
        .agg((lit(2) * sum(when(col("t2") < col("tot"), 1L).otherwise(0L))
          + sum(when(col("t2") === col("tot"), 1L).otherwise(0L)) + 1)
          .as("r2x"))
      val ranks = r2.groupBy("event_type").agg(sum(col("r2x")).as("rsum2"))
      val ties = g.groupBy("wd", "tot").agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      val mk = g.agg(countDistinct(col("wd")).as("m"),
        countDistinct(col("event_type")).as("k"))
      val s4 = ranks.crossJoin(broadcast(mk))
        .select(((col("rsum2") - col("m") * (col("k") + 1)) *
          (col("rsum2") - col("m") * (col("k") + 1))).as("dev2"))
        .agg(sum(col("dev2")).as("s4"))
      ranks.crossJoin(broadcast(mk)).crossJoin(broadcast(ties))
        .crossJoin(broadcast(s4))
        .select(col("event_type"),
          col("rsum2").cast("long").as("rank_sum_x2"),
          col("m").cast("long").as("m_judges"),
          col("k").cast("long").as("k_items"),
          col("s4").cast("long").as("s4_num"),
          col("tsum").cast("long").as("tie_sum"),
          expr("CAST(12 * s4 * 1000000 DIV (4 * (m * m * (k * k * k - k)" +
            " - m * tsum)) AS BIGINT)").as("w_ppm"))
        .orderBy("event_type")
    },

    // WINSORIZED mean league — q368's trimmed mean DROPS the tails;
    // winsorizing CLAMPS them to the 5th/95th-percentile values (the
    // estimator that keeps n constant, so per-group means stay
    // comparable when group sizes differ): g = n DIV 20 rows clamp on
    // each side, clamp values by exact rank selection (x_(g+1),
    // x_(n−g)), winsorized sum = Σ middle + g·lo + g·hi in exact
    // cents. The wins-vs-raw delta prices the tails' leverage with
    // the q368 column conventions so the two robust means read
    // side-by-side. One partitioned rank pass (the q368 window).
    "q415_winsorized_mean" -> { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderpriority").as("prio"),
        col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("c"))
      val n = o.groupBy("prio").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("prio").orderBy(col("c"), col("o_orderkey"))
      val rn = Caches.shared(o.withColumn("rn", row_number().over(w))
        .join(broadcast(n), "prio")
        .withColumn("gg", expr("n DIV 20")))
      val loHi = rn.groupBy("prio")
        .agg(max(when(col("rn") === col("gg") + 1, col("c"))).as("lo"),
          max(when(col("rn") === col("n") - col("gg"), col("c"))).as("hi"))
      rn.groupBy("prio")
        .agg(max(col("n")).cast("long").as("n_orders"),
          max(col("gg")).cast("long").as("g_clamped"),
          sum(col("c")).as("sum_all"),
          sum(when(col("rn") > col("gg") &&
            col("rn") <= col("n") - col("gg"), col("c")).otherwise(0L))
            .as("sum_mid"))
        .join(broadcast(loHi), "prio")
        .select(col("prio"), col("n_orders"), col("g_clamped"),
          col("lo").cast("long").as("lo_clamp_cents"),
          col("hi").cast("long").as("hi_clamp_cents"),
          expr("CAST(sum_all DIV n_orders AS BIGINT)").as("mean_cents"),
          expr("CAST((sum_mid + g_clamped * (lo + hi)) DIV n_orders" +
            " AS BIGINT)").as("winsorized_mean_cents"),
          expr("CAST(abs(sum_all DIV n_orders - (sum_mid + g_clamped" +
            " * (lo + hi)) DIV n_orders) AS BIGINT)")
            .as("clamp_delta_cents"))
        .orderBy("prio")
    },

    // DIFFERENTIAL-PRIVACY pre-flight — the SENSITIVITY census that
    // must precede any "publish per-day event counts with DP noise"
    // release (the F175 k-anonymity / F214 l-diversity / F215
    // t-closeness triad bounds re-identification of the PUBLISHED
    // rows; this bounds what the MECHANISM must hide — one user's
    // total influence on the released histogram). Release = count per
    // (event_type, day) cell; contributor = user_id. Per event type:
    // Δ∞ = max single-user count in one cell, Δ₁ = max single-user
    // total across that type's cells (user-level Laplace calibration
    // uses Δ₁), Δ₀ = max cells one user touches, and the utility
    // verdict — Laplace scale b = Δ₁/ε as relative error vs the mean
    // and MINIMUM cell at ε ∈ {1, 2} in floor-ppm (a cell smaller
    // than Δ₁/ε is noise, not signal — the "suppress small cells"
    // rule made quantitative). Deterministic: no noise is drawn; the
    // operator prices the noise that WOULD be added. Scale: one
    // (type, day, user) map-combined agg — contributions shuffle as
    // fixed-width keys; everything after lives on user- then
    // type-level grids.
    "q425_dp_sensitivity" -> { (s, d) =>
      val uc = Tables.events(s, d)
        .select(col("event_type"), Behavior.dayIndex.as("day"), col("user_id"))
        .groupBy("event_type", "day", "user_id")
        .agg(count(lit(1)).as("c"))
      val byUser = uc.groupBy("event_type", "user_id")
        .agg(max(col("c")).as("u_linf"), sum(col("c")).as("u_l1"),
          count(lit(1)).as("u_l0"))
      val sens = byUser.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_users"),
          max(col("u_linf")).cast("long").as("delta_inf"),
          max(col("u_l1")).cast("long").as("delta_l1"),
          max(col("u_l0")).cast("long").as("delta_l0"))
      val cells = uc.groupBy("event_type", "day")
        .agg(sum(col("c")).as("cell_n"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_cells"),
          sum(col("cell_n")).cast("long").as("total_events"),
          min(col("cell_n")).cast("long").as("min_cell"))
      sens.join(cells, "event_type")
        .withColumn("mean_cell", expr("total_events DIV n_cells"))
        .select(col("event_type"), col("n_users"), col("n_cells"),
          col("total_events"), col("delta_inf"), col("delta_l1"),
          col("delta_l0"), col("mean_cell"), col("min_cell"),
          expr("CAST(delta_l1 * 1000000 DIV mean_cell AS BIGINT)")
            .as("rel_err_eps1_ppm"),
          expr("CAST(delta_l1 * 500000 DIV mean_cell AS BIGINT)")
            .as("rel_err_eps2_ppm"),
          expr("CAST(delta_l1 * 1000000 DIV min_cell AS BIGINT)")
            .as("worst_rel_err_eps1_ppm"))
        .orderBy("event_type")
    },

    // Stratified-sampling DESIGN EFFECT — the number that closes the
    // F225/q402 allocation story: q402 SAYS how to split the label
    // budget; this PRICES what stratification buys. For the mean
    // document length under source strata: DEFF = V_design/V_SRS in
    // floor-ppm for proportional allocation (Σ_h N_h·σ_h² over the
    // pooled N·σ², the n-free form — sample size cancels) and Neyman
    // allocation ((Σ_h N_h·σ_h)²/N over the same base, using q402's
    // floor-isqrt N_h·σ_h convention — ONE sqrt definition across both
    // operators). DEFF < 1 is variance REMOVED by stratifying; Neyman
    // ≤ proportional ≤ SRS is the textbook ordering, spec-asserted up
    // to floor slack. Magnitude: N_h·SS_h products run in
    // DECIMAL(38,0)/HUGEINT (the q165 rule); the isqrt operand must
    // stay under 2⁵³ for the shared IEEE-exact floor(sqrt(double))
    // convention — same documented bound as q402. Scale: one
    // map-combined (source) moment pass; everything after is a
    // |sources|-row grid folding to ONE design row.
    "q431_design_effect" -> { (s, d) =>
      val st = Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("nh"), sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        .select(col("nh"), col("sx"), col("sxx"),
          expr("""CAST((CAST(nh AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
                 | DIV nh AS BIGINT)""".stripMargin).as("ah"),
          expr("CAST(floor(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE))) AS BIGINT)")
            .as("ns"))
      st.agg(count(lit(1)).cast("long").as("n_strata"),
          sum(col("nh")).as("n"), sum(col("sx")).as("s"),
          sum(col("sxx")).as("ss"), sum(col("ah")).as("v_prop_num"),
          sum(col("ns")).as("sum_ns"))
        .select(col("n_strata"), col("n").cast("long").as("n_total"),
          expr("""CAST((CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)
                 | DIV n AS BIGINT)""".stripMargin).as("v_srs_num"),
          col("v_prop_num").cast("long").as("v_prop_num"),
          expr("""CAST(CAST(v_prop_num AS DECIMAL(38,0)) * 1000000
                 | DIV ((CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)
                 |      DIV n) AS BIGINT)""".stripMargin).as("deff_prop_ppm"),
          expr("CAST(CAST(sum_ns AS DECIMAL(38,0)) * sum_ns DIV n AS BIGINT)")
            .as("v_ney_num"),
          expr("""CAST((CAST(sum_ns AS DECIMAL(38,0)) * sum_ns DIV n) * 1000000
                 | DIV ((CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)
                 |      DIV n) AS BIGINT)""".stripMargin).as("deff_ney_ppm"))
    },

    // SORT-ORDER INTERFERENCE matrix — the OPTIMIZE-key decision q361
    // prices for one column, completed across a WORKLOAD: cluster
    // lineitem into 32 files by each candidate key (ship-day, partkey,
    // suppkey; value-proportional splits, the q361 convention) and
    // probe every layout with a mid-band range filter on every
    // candidate column ([40%, 60%) of the value domain). The diagonal
    // shows what sorting buys; the OFF-diagonal shows what it costs
    // the other filters — the cross-interference that makes the sort
    // key a WORKLOAD decision, not a column decision (and why Z-order
    // (q141/q294) exists: it trades diagonal depth for off-diagonal
    // breadth). Zone-map skip rule: file skipped iff zmax < lo or
    // zmin ≥ hi. Scale: ONE scan computes all three file ids + all
    // three probe columns; per (layout, filter) everything after is
    // 32-row zone-grid algebra.
    "q432_sort_advisor" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(
        expr("CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000 AS BIGINT)")
          .as("v_day"),
        col("l_partkey").cast("long").as("v_part"),
        col("l_suppkey").cast("long").as("v_supp"))
      val mx = li.agg(
        min(col("v_day")).as("lo_day"), max(col("v_day")).as("hi_day"),
        min(col("v_part")).as("lo_part"), max(col("v_part")).as("hi_part"),
        min(col("v_supp")).as("lo_supp"), max(col("v_supp")).as("hi_supp"))
      val filed = Caches.shared(li.crossJoin(broadcast(mx))
        .select(col("v_day"), col("v_part"), col("v_supp"),
          expr("(v_day - lo_day) * 32 DIV (hi_day - lo_day + 1)").as("f_day"),
          expr("(v_part - lo_part) * 32 DIV (hi_part - lo_part + 1)").as("f_part"),
          expr("(v_supp - lo_supp) * 32 DIV (hi_supp - lo_supp + 1)").as("f_supp"),
          expr("lo_day + (hi_day - lo_day + 1) * 2 DIV 5").as("q_lo_day"),
          expr("lo_day + (hi_day - lo_day + 1) * 3 DIV 5").as("q_hi_day"),
          expr("lo_part + (hi_part - lo_part + 1) * 2 DIV 5").as("q_lo_part"),
          expr("lo_part + (hi_part - lo_part + 1) * 3 DIV 5").as("q_hi_part"),
          expr("lo_supp + (hi_supp - lo_supp + 1) * 2 DIV 5").as("q_lo_supp"),
          expr("lo_supp + (hi_supp - lo_supp + 1) * 3 DIV 5").as("q_hi_supp")))
      val cols = Seq("day", "part", "supp")
      val legs = for (lay <- cols; f <- cols) yield {
        val zones = filed.groupBy(col(s"f_$lay").as("fid"))
          .agg(min(col(s"v_$f")).as("zmin"), max(col(s"v_$f")).as("zmax"),
            count(lit(1)).as("rows"),
            max(col(s"q_lo_$f")).as("lo"), max(col(s"q_hi_$f")).as("hi"),
            sum(when(col(s"v_$f") >= col(s"q_lo_$f") &&
              col(s"v_$f") < col(s"q_hi_$f"), 1L).otherwise(0L)).as("hits"))
        zones.agg(count(lit(1)).cast("long").as("files_total"),
            sum(when(col("zmax") < col("lo") || col("zmin") >= col("hi"), 1L)
              .otherwise(0L)).cast("long").as("files_skipped"),
            sum(when(col("zmax") >= col("lo") && col("zmin") < col("hi"),
              col("rows")).otherwise(0L)).cast("long").as("rows_scanned"),
            sum(col("hits")).cast("long").as("rows_matching"))
          .select(lit(lay).as("layout_key"), lit(f).as("filter_col"),
            col("files_total"), col("files_skipped"), col("rows_scanned"),
            col("rows_matching"),
            expr("""CAST(rows_scanned * 1000000
                   | DIV greatest(rows_matching, 1) AS BIGINT)""".stripMargin)
              .as("scan_amplification_ppm"))
      }
      legs.reduce(_.unionByName(_)).orderBy("layout_key", "filter_col")
    },

    // SELECTIVITY-estimation audit — the FILTER side of q360's join
    // q-error: for a battery of four predicate shapes over orders, the
    // estimate a statistics-only CBO makes (uniformity + NDV: equality
    // → n/ndv; range → n·(t−min)/(max−min)) vs the exact count, with
    // the q360 q-error convention. Low-NDV equality (priority) is
    // near-exact by construction; high-NDV equality (custkey), value
    // ranges (price), and time ranges (date) expose exactly where the
    // uniformity assumption bends — the table that justifies
    // histogram-backed stats. Thresholds are stats-derived (min + ¼
    // span), so the audit is self-contained at any SF. Scale: one
    // stats aggregation + one conditional-count scan; everything else
    // is a 4-row grid.
    "q433_selectivity_audit" -> { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderpriority"),
        col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS BIGINT)")
          .as("day"))
      val st = o.agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderpriority")).as("ndv_prio"),
        countDistinct(col("o_custkey")).as("ndv_cust"),
        min(col("o_custkey")).as("k0"),
        min(col("cents")).as("lo_c"), max(col("cents")).as("hi_c"),
        min(col("day")).as("lo_d"), max(col("day")).as("hi_d"))
        .withColumn("t_c", expr("lo_c + (hi_c - lo_c + 1) DIV 4"))
        .withColumn("t_d", expr("lo_d + (hi_d - lo_d + 1) DIV 4"))
      val acts = o.crossJoin(broadcast(st)).agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("a1"),
        sum(when(col("o_custkey") === col("k0"), 1L).otherwise(0L)).as("a2"),
        sum(when(col("cents") < col("t_c"), 1L).otherwise(0L)).as("a3"),
        sum(when(col("day") < col("t_d"), 1L).otherwise(0L)).as("a4"),
        max(col("n")).as("n"), max(col("ndv_prio")).as("ndv_prio"),
        max(col("ndv_cust")).as("ndv_cust"),
        max(col("lo_c")).as("lo_c"), max(col("hi_c")).as("hi_c"),
        max(col("t_c")).as("t_c"),
        max(col("lo_d")).as("lo_d"), max(col("hi_d")).as("hi_d"),
        max(col("t_d")).as("t_d"))
      def leg(nm: String, est: String, act: String) =
        acts.select(lit(nm).as("predicate"),
          expr(s"CAST($est AS BIGINT)").as("est_rows"),
          col(act).cast("long").as("actual_rows"),
          expr(s"""CAST(greatest($est, $act) * 1000000
                  | DIV greatest(least($est, $act), 1) AS BIGINT)""".stripMargin)
            .as("q_error_ppm"))
      leg("p1_eq_low_ndv", "n DIV ndv_prio", "a1")
        .unionByName(leg("p2_eq_high_ndv", "n DIV ndv_cust", "a2"))
        .unionByName(leg("p3_range_price",
          "n * (t_c - lo_c) DIV (hi_c - lo_c + 1)", "a3"))
        .unionByName(leg("p4_range_date",
          "n * (t_d - lo_d) DIV (hi_d - lo_d + 1)", "a4"))
        .orderBy("predicate")
    },

    // HISTOGRAM-refined selectivity — the fix q433's audit motivates:
    // the same `price < min + ¼·span` predicate estimated from
    // equi-width histograms of B ∈ {1, 16, 256} bins (B = 1 IS q433's
    // min/max uniformity estimate — one definition, three refinement
    // levels). Each bin keeps (count, observed min/max) — zone-map
    // statistics — and the estimate interpolates uniformly ONLY inside
    // the one bin straddling the threshold: est = Σ_{bin below} cnt +
    // cnt_t·(t − mn_t) DIV (mx_t − mn_t + 1). The estimation error is
    // therefore bounded by the straddling bin's population (spec law:
    // |est − act| ≤ max boundary-bin count) — the formal reason
    // engines ship histogram stats: error shrinks with 1/B regardless
    // of the distribution's shape. Scale: one map-combined bin
    // aggregation per B (bounded grids, no window, no sort); the
    // estimate folds ≤ B rows.
    "q436_histogram_selectivity" -> { (s, d) =>
      val o = Caches.shared(Tables.orders(s, d).select(
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents")))
      val st = o.agg(count(lit(1)).as("n"),
          min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        .withColumn("t", expr("lo + (hi - lo + 1) DIV 4"))
      val act = o.crossJoin(broadcast(st))
        .agg(sum(when(col("cents") < col("t"), 1L).otherwise(0L)).as("actual"))
      def method(bins: Int) = {
        val tag = f"b$bins%03d_bins"
        o.crossJoin(broadcast(st))
          .groupBy(expr(s"(cents - lo) * $bins DIV (hi - lo + 1)").as("bin"))
          .agg(count(lit(1)).as("cnt"), min(col("cents")).as("mn"),
            max(col("cents")).as("mx"), max(col("t")).as("t"))
          .agg(sum(expr(
            """CASE WHEN mx < t THEN cnt
              | WHEN mn >= t THEN CAST(0 AS BIGINT)
              | ELSE cnt * (t - mn) DIV (mx - mn + 1) END""".stripMargin))
            .as("est"))
          .select(lit(tag).as("method"), lit(bins.toLong).as("n_bins"),
            col("est").cast("long").as("est_rows"))
      }
      method(1).unionByName(method(16)).unionByName(method(256))
        .crossJoin(broadcast(act))
        .select(col("method"), col("n_bins"), col("est_rows"),
          col("actual").cast("long").as("actual_rows"),
          expr("""CAST(greatest(est_rows, actual) * 1000000
                 | DIV greatest(least(est_rows, actual), 1) AS BIGINT)""".stripMargin)
            .as("q_error_ppm"))
        .orderBy("method")
    },

    // JOIN-ORDER DP — the Selinger enumeration that q429 (per-join
    // strategy) and q433/q436 (selectivity) feed: price every LEFT-DEEP
    // order of the filtered customer ⋈ orders ⋈ lineitem triple with
    // the System-R cost model (cost = Σ intermediate-result rows;
    // |R ⋈ S| on key k = |R|·|S| DIV max(V(R,k), V(S,k)); an
    // intermediate inherits V(·,k) = least(V(base,k), |intermediate|)),
    // then measure the REAL intermediates and rank both ways — the
    // audit row is "did stats-only DP pick the truly cheapest order?".
    // plan_c prices the cartesian-first order the enumerator exists to
    // reject; its j1 size is EXACT arithmetic (nc·nl — measuring a
    // cross join is the thing the planner avoids), so pricing it costs
    // nothing. Filters are stats-derived (median order day) or domain
    // constants, so the audit is self-contained at any SF. Magnitude
    // rule: cardinality products run in DECIMAL(38,0) (nc·nl·no_
    // exceeds int64 headroom past ~sf30); quotients land back in
    // int64. Scale: three stats scans + two real equi-join counts + one
    // 3-way join count; the DP itself is a 3-row grid ranked by a 3×3
    // broadcast count — no window, no global sort.
    "q441_join_order_dp" -> { (s, d) =>
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("ck"))
      val oAll = Tables.orders(s, d).select(col("o_orderkey").as("ok"),
        col("o_custkey").as("ck"),
        expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS BIGINT)")
          .as("day"))
      val daySt = oAll.agg(min(col("day")).as("lo_d"), max(col("day")).as("hi_d"))
      val o = Caches.shared(oAll.crossJoin(broadcast(daySt))
        .filter(expr("day < lo_d + (hi_d - lo_d + 1) DIV 2"))
        .select("ok", "ck"))
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok"))
      val cc = Caches.shared(c)
      // ONE O⋈L pass serves both act_b and act_f: ck uniqueness in C makes
      // the left-tag count of in-C rows exactly |C⋈O⋈L|
      val jj = o.join(l, "ok")
        .join(cc.withColumn("in_c", lit(1L)), Seq("ck"), "left")
        .agg(count(lit(1)).as("act_b"),
          sum(coalesce(col("in_c"), lit(0L))).as("act_f"))
      val st = cc.agg(count(lit(1)).as("nc"))
        .crossJoin(o.agg(count(lit(1)).as("no_"),
          countDistinct(col("ck")).as("vo_ck")))
        .crossJoin(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .agg(count(lit(1)).as("nl"),
            countDistinct(col("l_orderkey")).as("vl_ok")))
        .crossJoin(cc.join(o, "ck").agg(count(lit(1)).as("act_a")))
        .crossJoin(jj)
      // V(C, ck) = nc and V(O, ok) = no_ (keys); V(O, ck), V(L, ok) measured
      val j1a = "CAST(nc AS DECIMAL(38,0)) * no_ DIV greatest(nc, vo_ck, 1)"
      val fa  = s"CAST(($j1a) AS DECIMAL(38,0)) * nl" +
        s" DIV greatest(least($j1a, no_), vl_ok, 1)"
      val j1b = "CAST(no_ AS DECIMAL(38,0)) * nl DIV greatest(no_, vl_ok, 1)"
      val fb  = s"CAST(($j1b) AS DECIMAL(38,0)) * nc" +
        s" DIV greatest(least($j1b, vo_ck), nc, 1)"
      val j1c = "CAST(nc AS DECIMAL(38,0)) * nl"
      val fc  = s"CAST(($j1c) AS DECIMAL(38,0)) * no_" +
        " DIV greatest(greatest(nc, vo_ck) * greatest(vl_ok, no_), 1)"
      def plan(nm: String, j1Est: String, fEst: String, j1Act: String) =
        st.select(lit(nm).as("plan"),
          expr(s"CAST($j1Est AS BIGINT)").as("est_inter_rows"),
          expr(s"CAST($fEst AS BIGINT)").as("est_final_rows"),
          expr(s"CAST(CAST($j1Est AS DECIMAL(38,0)) + ($fEst) AS BIGINT)")
            .as("est_cost"),
          expr(s"CAST($j1Act AS BIGINT)").as("act_inter_rows"),
          col("act_f").cast("long").as("act_final_rows"),
          expr(s"CAST(CAST($j1Act AS DECIMAL(38,0)) + act_f AS BIGINT)")
            .as("act_cost"))
      val plans = plan("plan_a_co_then_l", j1a, fa, "act_a")
        .unionByName(plan("plan_b_ol_then_c", j1b, fb, "act_b"))
        .unionByName(plan("plan_c_cxl_then_o", j1c, fc, j1c))
      plans.crossJoin(broadcast(plans.select(col("plan").as("p2"),
          col("est_cost").as("e2"), col("act_cost").as("a2"))))
        .groupBy("plan", "est_inter_rows", "est_final_rows", "est_cost",
          "act_inter_rows", "act_final_rows", "act_cost")
        .agg((sum(when(col("e2") < col("est_cost") ||
            (col("e2") === col("est_cost") && col("p2") < col("plan")), 1L)
            .otherwise(0L)) + 1L).cast("long").as("est_rank"),
          (sum(when(col("a2") < col("act_cost") ||
            (col("a2") === col("act_cost") && col("p2") < col("plan")), 1L)
            .otherwise(0L)) + 1L).cast("long").as("act_rank"))
        .orderBy("plan")
    },

    // EAGER PRE-AGGREGATION advisor — the group-by-pushdown rewrite
    // (Yan & Larson's eager aggregation) priced on the revenue-by-nation
    // rollup: SUM(lineitem cents) BY c_nationkey through L ⋈ O ⋈ C can
    // ship every lineitem row through both shuffles (join-then-agg), or
    // partial-aggregate L by l_orderkey BEFORE the first join and by
    // o_custkey before the second, shrinking each shuffle to the key
    // cardinality. BOTH plans execute for real and must produce the
    // identical (n_groups, total_cents) — the rewrite's correctness law,
    // visible in the output so the oracle checks it. Row-flow metrics
    // are stats-exact: referential integrity (q103-audited) makes
    // |L ⋈ O| = nl and the eager mids = the measured key NDVs. Scale:
    // this is THE 100 TB rewrite — shuffle mass drops from O(|fact|) to
    // O(|keys|); the table quantifies it (reduction_ppm). One NDV stats
    // pass + the two real aggregation pipelines.
    "q442_eager_preagg" -> { (s, d) =>
      val l = Tables.lineitem(s, d).select(col("l_orderkey").as("ok"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
      val o = Tables.orders(s, d).select(col("o_orderkey").as("ok"),
        col("o_custkey").as("ck"))
      val c = Tables.customer(s, d).select(col("c_custkey").as("ck"),
        col("c_nationkey").as("nk"))
      val stats = l.agg(count(lit(1)).as("nl"),
          countDistinct(col("ok")).as("nok"))
        .crossJoin(o.agg(count(lit(1)).as("no_"),
          countDistinct(col("ck")).as("nck")))
        .crossJoin(c.agg(count(lit(1)).as("nc")))
      val naive = l.join(o, "ok").join(c, "ck").groupBy("nk")
        .agg(sum(col("cents")).as("cents"))
        .agg(count(lit(1)).as("n_groups"), sum(col("cents")).as("total_cents"))
      val eager = l.groupBy("ok").agg(sum(col("cents")).as("cents"))
        .join(o, "ok").groupBy("ck").agg(sum(col("cents")).as("cents"))
        .join(c, "ck").groupBy("nk").agg(sum(col("cents")).as("cents"))
        .agg(count(lit(1)).as("n_groups"), sum(col("cents")).as("total_cents"))
      def leg(nm: String, sm: DataFrame, j1: String, j2: String) =
        sm.crossJoin(broadcast(stats)).select(lit(nm).as("strategy"),
          expr(s"CAST($j1 AS BIGINT)").as("rows_into_join1"),
          expr(s"CAST($j2 AS BIGINT)").as("rows_into_join2"),
          expr(s"CAST(($j1) + ($j2) AS BIGINT)").as("rows_shuffled"),
          expr(s"CAST((($j1) + ($j2)) * 1000000 DIV (no_ + nl + nl + nc) AS BIGINT)")
            .as("reduction_ppm"),
          col("n_groups").cast("long").as("n_groups"),
          col("total_cents").cast("long").as("total_cents"))
      leg("s1_join_then_agg", naive, "no_ + nl", "nl + nc")
        .unionByName(leg("s2_eager_preagg", eager, "no_ + nok", "nck + nc"))
        .orderBy("strategy")
    },

    // TIMESTAMP DELTA-OF-DELTA encoding audit — the Gorilla/Parquet
    // DELTA_BINARY_PACKED decision for the event-time column, measured
    // exactly: per event_type in (ts, event_id) arrival order, the
    // second difference dod = Δus − lag(Δus) falls into Gorilla's
    // asymmetric bit buckets (0 → 1 bit; [−63, 64] → 2+7; [−255, 256]
    // → 3+9; [−2047, 2048] → 4+12; else 4+32), with the first two
    // samples of each series stored raw (64 bits). The table is the
    // encoder's sizing sheet: bucket census, total bits vs 64·n raw,
    // and the floor-ppm compressed share — near-metronomic types (cf.
    // q434's bot detector) compress toward 1 bit/point, bursty human
    // traffic lands in the wide buckets. Scale: ONE partitioned window
    // per series (bounded key), then a map-combined census; nothing
    // global.
    "q443_delta_encoding" -> { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
      val ev = Tables.events(s, d).select(col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("dd", col("us") - lag(col("us"), 1).over(w))
        .withColumn("dod", col("dd") - lag(col("dd"), 1).over(w))
        .withColumn("bits", expr(
          """CASE WHEN dod IS NULL THEN 64
            | WHEN dod = 0 THEN 1
            | WHEN dod >= -63 AND dod <= 64 THEN 9
            | WHEN dod >= -255 AND dod <= 256 THEN 12
            | WHEN dod >= -2047 AND dod <= 2048 THEN 16
            | ELSE 36 END""".stripMargin))
      ev.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_points"),
          sum(when(col("dod").isNull, 1L).otherwise(0L)).cast("long")
            .as("n_raw"),
          sum(when(col("bits") === 1, 1L).otherwise(0L)).cast("long")
            .as("n_zero"),
          sum(when(col("bits") === 9, 1L).otherwise(0L)).cast("long")
            .as("n_b9"),
          sum(when(col("bits") === 12, 1L).otherwise(0L)).cast("long")
            .as("n_b12"),
          sum(when(col("bits") === 16, 1L).otherwise(0L)).cast("long")
            .as("n_b16"),
          sum(when(col("bits") === 36, 1L).otherwise(0L)).cast("long")
            .as("n_b36"),
          sum(col("bits")).cast("long").as("bits_total"))
        .withColumn("raw_bits", expr("n_points * 64"))
        .withColumn("compressed_ppm",
          expr("CAST(bits_total * 1000000 DIV raw_bits AS BIGINT)"))
        .orderBy("event_type")
    },

    // SHUFFLE-PARTITION sizing advisor — the spark.sql.shuffle.partitions
    // / AQE advisoryPartitionSizeInBytes decision priced from per-key
    // statistics for the three shuffles this corpus's pipelines actually
    // run (events by user_id, lineitem by l_orderkey, orders by
    // o_custkey): total shuffle bytes at declared row widths, partition
    // counts at the 128 MiB and 32 MiB targets (ceil division), the
    // single biggest key's byte share, and the skew verdict —
    // skew_ratio_ppm > 1,000,000 means one key alone exceeds the even
    // 128 MiB share, so no partition COUNT fixes it; that key needs
    // salting (q315's advisor) or AQE skew-join handling. Magnitude
    // rule: the skew product (max_key_bytes × parts × 10⁶) runs in
    // DECIMAL(38,0). Scale: one map-combined per-key aggregation + a
    // one-row reduction per leg — exactly the statistics a shuffle
    // write already maintains.
    "q446_shuffle_sizing" -> { (s, d) =>
      def leg(nm: String, df: DataFrame, key: String, width: Int) =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
            max(col("cnt")).as("max_key_rows"))
          .select(lit(nm).as("shuffle"),
            col("n_rows").cast("long").as("n_rows"),
            col("n_keys").cast("long").as("n_keys"),
            expr(s"CAST(n_rows * $width AS BIGINT)").as("total_bytes"),
            expr(s"CAST(max_key_rows * $width AS BIGINT)").as("max_key_bytes"),
            expr(s"CAST((n_rows * $width + 134217727) DIV 134217728 AS BIGINT)")
              .as("parts_128mb"),
            expr(s"CAST((n_rows * $width + 33554431) DIV 33554432 AS BIGINT)")
              .as("parts_32mb"),
            expr("CAST(max_key_rows * 1000000 DIV n_rows AS BIGINT)")
              .as("max_key_share_ppm"))
          .withColumn("skew_ratio_ppm",
            expr("""CAST(CAST(max_key_bytes AS DECIMAL(38,0)) * parts_128mb
                   | * 1000000 DIV total_bytes AS BIGINT)""".stripMargin))
      leg("s1_events_by_user", Tables.events(s, d), "user_id", 48)
        .unionByName(
          leg("s2_lineitem_by_orderkey", Tables.lineitem(s, d), "l_orderkey", 64))
        .unionByName(
          leg("s3_orders_by_custkey", Tables.orders(s, d), "o_custkey", 48))
        .orderBy("shuffle")
    },

    // OPTIMISTIC-CONCURRENCY conflict audit — the lakehouse
    // commit-protocol decision (OCC retry vs partition locking) priced
    // from the stream itself: model two concurrent writers (event_id
    // parity — deterministic, engine-neutral) committing (user, hour)
    // cells; a cell BOTH writers touch inside one hour is a write-write
    // conflict an optimistic committer must retry. The by-hour-of-day
    // profile shows when contention peaks (OCC is fine off-peak;
    // sustained high conflict_ppm hours want key-partitioned writers).
    // Scale: two map-combined aggregations, (user, hr) then hour-of-day
    // — the same stats shape a commit coordinator's metrics already
    // emit; nothing row-wise past the first groupBy.
    "q447_occ_conflicts" -> { (s, d) =>
      Tables.events(s, d).select(col("user_id"),
          expr("CAST(unix_micros(ts) div 3600000000 AS BIGINT)").as("hr"),
          expr("event_id % 2").as("writer"))
        .groupBy("user_id", "hr")
        .agg(count(lit(1)).as("n_ev"),
          countDistinct(col("writer")).as("nw"))
        .groupBy(expr("hr % 24").as("hour_of_day"))
        .agg(count(lit(1)).cast("long").as("n_cells"),
          sum(col("n_ev")).cast("long").as("n_events"),
          sum(when(col("nw") > 1, 1L).otherwise(0L)).cast("long")
            .as("n_conflicts"))
        .withColumn("conflict_ppm",
          expr("CAST(n_conflicts * 1000000 DIV n_cells AS BIGINT)"))
        .orderBy("hour_of_day")
    },

    // A/B SAMPLE-SIZE planner — the pre-registration table q177 (the
    // z² test) and q357 (SRM) assume someone computed: per event_type,
    // the baseline user-level conversion rate p, and for each minimum
    // detectable effect δ ∈ {1, 2, 5} percentage points the per-arm
    // sample size by the rule of 16 (n = 16·p(1−p)/δ², the standard
    // α = 5% two-sided / 80%-power approximation), entirely in ppm
    // integer arithmetic, plus the feasibility verdict against the
    // corpus's own user count — an experiment this corpus cannot power
    // is flagged before it ships. Scale: one distinct-user agg + a
    // (type × 3) broadcast grid.
    "q448_ab_power_planner" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val users = ev.agg(countDistinct(col("user_id")).as("n_users"))
      val grid = s.range(3)
        .select(expr("CAST(element_at(array(10000, 20000, 50000), CAST(id AS INT) + 1) AS BIGINT)")
          .as("mde_ppm"))
      ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("ntu"))
        .crossJoin(broadcast(users))
        .crossJoin(broadcast(grid))
        .withColumn("base_rate_ppm",
          expr("CAST(ntu * 1000000 DIV n_users AS BIGINT)"))
        .withColumn("n_per_arm",
          expr("""CAST(16 * base_rate_ppm * (1000000 - base_rate_ppm)
                 | DIV (mde_ppm * mde_ppm) AS BIGINT)""".stripMargin))
        .select(col("event_type"), col("mde_ppm"), col("base_rate_ppm"),
          col("n_users").cast("long").as("n_users"), col("n_per_arm"),
          expr("n_per_arm * 2 <= n_users").as("feasible"))
        .orderBy("event_type", "mde_ppm")
    },

    // RETRY-STORM / at-least-once REDELIVERY audit — the DOWNSTREAM
    // twin of the reference's exactly-once sink (A10/A14 prevent the
    // WRITER duplicating; this measures what an at-least-once PRODUCER
    // feeds it): an event is a redelivery iff the same logical payload
    // (user_id, event_type, value) already arrived within the previous
    // 60 s. Per event_type: event mass, redelivered count and floor-ppm
    // share, and how many users see any — the table that decides
    // whether the pipeline needs an idempotency-key dedup stage before
    // the sink. Scale: ONE window partitioned by the full payload key
    // (bounded per-key history), then a map-combined census.
    "q449_retry_storm" -> { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type", "value")
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("dup", when(col("prev").isNotNull &&
          col("us") - col("prev") <= 60000000L, 1L).otherwise(0L))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(col("dup")).cast("long").as("n_redelivered"),
          countDistinct(when(col("dup") === 1L, col("user_id")))
            .cast("long").as("n_affected_users"))
        .withColumn("redelivery_ppm",
          expr("CAST(n_redelivered * 1000000 DIV n_events AS BIGINT)"))
        .orderBy("event_type")
    },

    // STRAGGLER / MAKESPAN audit — hash-assignment load balance
    // measured, not assumed: 128 order-hash shards of lineitem assigned
    // to W ∈ {4, 8, 16} workers by shard % W; per W the makespan (max
    // worker load), the ceil(total/W) lower bound, the floor-ppm
    // efficiency total/(W·makespan), and the imbalance vs the bound.
    // This is THE wide-transform wall-clock model: a stage finishes
    // when its slowest worker does, so the gap between makespan and
    // bound is pure straggler tax — the number that justifies AQE
    // coalescing and q446's sizing. Scale: one map-combined (shard)
    // agg; everything after is a ≤ 128×3 grid.
    "q451_straggler_makespan" -> { (s, d) =>
      val shards = Tables.lineitem(s, d)
        .groupBy(expr("l_orderkey % 128").as("shard"))
        .agg(count(lit(1)).as("rows_"))
      val ws = s.range(3)
        .select(expr("CAST(element_at(array(4, 8, 16), CAST(id AS INT) + 1) AS BIGINT)")
          .as("w"))
      shards.crossJoin(broadcast(ws))
        .groupBy(col("w"), expr("shard % w").as("worker"))
        .agg(sum(col("rows_")).as("load"))
        .groupBy("w")
        .agg(count(lit(1)).cast("long").as("n_workers"),
          sum(col("load")).cast("long").as("total_rows"),
          max(col("load")).cast("long").as("makespan_rows"))
        .withColumn("lower_bound",
          expr("CAST((total_rows + w - 1) DIV w AS BIGINT)"))
        .withColumn("efficiency_ppm",
          expr("CAST(total_rows * 1000000 DIV (w * makespan_rows) AS BIGINT)"))
        .withColumn("imbalance_ppm",
          expr("CAST(makespan_rows * 1000000 DIV lower_bound AS BIGINT)"))
        .orderBy("w")
    },

    // GROUPING-NDV correlation forecaster — the CBO input q433/q436
    // don't cover: multi-column GROUP BY cardinality. For every subset
    // of (priority, status, order-year) over orders, the measured NDV
    // vs the independence forecast min(Π single-column NDVs, n) — the
    // correlation_ppm column (measured/forecast) is exactly the
    // correction factor engines ship as column-group statistics; 10⁶
    // means independent, small means correlated (a planner assuming
    // independence over-allocates reducers by its inverse). Scale: the
    // multi-countDistinct is one expand + map-combined partial agg over
    // a 3-attribute projection — the ANALYZE-pass shape; the 7-row
    // subset lattice is arithmetic on one stats row.
    "q452_grouping_ndv" -> { (s, d) =>
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("a"), col("o_orderstatus").as("b"),
        expr("year(CAST(o_orderdate AS DATE))").as("c"))
      val st = o.agg(count(lit(1)).as("n"),
        countDistinct(col("a")).as("va"), countDistinct(col("b")).as("vb"),
        countDistinct(col("c")).as("vc"),
        countDistinct(col("a"), col("b")).as("vab"),
        countDistinct(col("a"), col("c")).as("vac"),
        countDistinct(col("b"), col("c")).as("vbc"),
        countDistinct(col("a"), col("b"), col("c")).as("vabc"))
      def leg(nm: String, measured: String, forecast: String) =
        st.select(lit(nm).as("grouping_set"),
          expr(s"CAST($measured AS BIGINT)").as("measured_ndv"),
          expr(s"CAST(least($forecast, n) AS BIGINT)").as("forecast_ndv"),
          expr(s"""CAST($measured * 1000000
                  | DIV least($forecast, n) AS BIGINT)""".stripMargin)
            .as("correlation_ppm"))
      leg("g1_priority", "va", "va")
        .unionByName(leg("g2_status", "vb", "vb"))
        .unionByName(leg("g3_year", "vc", "vc"))
        .unionByName(leg("g4_priority_status", "vab", "va * vb"))
        .unionByName(leg("g5_priority_year", "vac", "va * vc"))
        .unionByName(leg("g6_status_year", "vbc", "vb * vc"))
        .unionByName(leg("g7_all_three", "vabc", "va * vb * vc"))
        .orderBy("grouping_set")
    },

    // CACHE-SIZING hit-rate curve — the broadcast/cache admission
    // decision priced from the access distribution itself: keys =
    // user_id per event_type ranked by access count; for cache sizes
    // C ∈ {8, 64, 512} hot keys, the floor-ppm hit rate a
    // most-frequently-used cache of that size would serve. Zipfian
    // traffic makes tiny caches disproportionately effective — this
    // table says exactly how much, which is the q315/q446 skew story
    // read as an OPPORTUNITY (cache the head, shuffle only the tail).
    // Scale: one map-combined (type, user) agg, one PARTITIONED rank
    // window per bounded event_type, then a grid census.
    "q453_cache_sizing" -> { (s, d) =>
      val w = Window.partitionBy("event_type")
        .orderBy(col("hits").desc, col("user_id"))
      val acc = Tables.events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("hits"))
        .withColumn("rk", row_number().over(w))
      val cs = s.range(3)
        .select(expr("CAST(element_at(array(8, 64, 512), CAST(id AS INT) + 1) AS BIGINT)")
          .as("cache_size"))
      acc.crossJoin(broadcast(cs))
        .groupBy("event_type", "cache_size")
        .agg(count(lit(1)).cast("long").as("n_keys"),
          sum(col("hits")).cast("long").as("n_accesses"),
          sum(when(col("rk") <= col("cache_size"), col("hits"))
            .otherwise(0L)).cast("long").as("hot_accesses"),
          sum(when(col("rk") <= col("cache_size"), 1L).otherwise(0L))
            .cast("long").as("cached_keys"))
        .withColumn("hit_ppm",
          expr("CAST(hot_accesses * 1000000 DIV n_accesses AS BIGINT)"))
        .orderBy("event_type", "cache_size")
    },

    // SALT-FACTOR sweep — q315 names the keys to salt; this prices the
    // salt ITSELF on the events-by-user shuffle: under salt factor
    // S ∈ {1, 4, 16} the hottest key's per-reducer slice shrinks to
    // ceil(max_key/S), while the re-combine pass (a salted aggregation
    // needs a second stage keyed on the original key) grows to
    // Σ_k min(S, rows_k) partial rows. The table shows both curves so
    // the operator picks the knee instead of over-salting — small keys
    // don't split (min(S, rows_k) caps their partials), so the overhead
    // is NOT n_keys·S. Scale: everything derives from one map-combined
    // per-key count; the sweep is a 3-row broadcast grid.
    "q454_salt_factor_sweep" -> { (s, d) =>
      val perKey = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val ss = s.range(3)
        .select(expr("CAST(element_at(array(1, 4, 16), CAST(id AS INT) + 1) AS BIGINT)")
          .as("salt"))
      perKey.crossJoin(broadcast(ss))
        .groupBy("salt")
        .agg(count(lit(1)).cast("long").as("n_keys"),
          sum(col("cnt")).cast("long").as("n_rows"),
          max(col("cnt")).cast("long").as("max_key_rows"),
          max(expr("(cnt + salt - 1) DIV salt")).cast("long")
            .as("max_shard_rows"),
          sum(least(col("salt"), col("cnt"))).cast("long")
            .as("partial_rows"))
        .withColumn("balance_gain_ppm",
          expr("CAST(max_shard_rows * 1000000 DIV max_key_rows AS BIGINT)"))
        .withColumn("overhead_ppm",
          expr("CAST(partial_rows * 1000000 DIV n_keys AS BIGINT)"))
        .orderBy("salt")
    },

    // CHECKPOINT-INTERVAL planner — the streaming recovery/overhead
    // tradeoff (StreamPipeline checkpoints per micro-batch; the
    // reference commits offsets per flush): per event_type, the
    // measured arrival rate over the stream's span and the distinct-key
    // state size, priced at checkpoint intervals I ∈ {10, 60, 600} s —
    // worst-case replay on failure = floor(rate·I) = n·I/span rows,
    // state writes per hour = state_keys · 3600/I. Replay grows and
    // write mass shrinks linearly in I; the table is where those curves
    // cross the operator's RTO and IO budgets. Scale: one map-combined
    // per-type agg; the interval grid rides a broadcast.
    "q455_checkpoint_interval" -> { (s, d) =>
      val st = Tables.events(s, d).select(col("event_type"),
          unix_micros(col("ts")).as("us"), col("user_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("state_keys"),
          min(col("us")).as("us0"), max(col("us")).as("us1"))
        .withColumn("span_s",
          expr("greatest((us1 - us0) DIV 1000000, 1)"))
      val is = s.range(3)
        .select(expr("CAST(element_at(array(10, 60, 600), CAST(id AS INT) + 1) AS BIGINT)")
          .as("interval_s"))
      st.crossJoin(broadcast(is))
        .select(col("event_type"), col("interval_s"),
          col("n").cast("long").as("n_events"),
          col("state_keys").cast("long").as("state_keys"),
          col("span_s").cast("long").as("span_s"),
          expr("CAST(n * interval_s DIV span_s AS BIGINT)")
            .as("replay_rows_worst"),
          expr("CAST(state_keys * 3600 DIV interval_s AS BIGINT)")
            .as("state_rows_per_hour"))
        .orderBy("event_type", "interval_s")
    },

    // PEAK-SHAVING BACKLOG audit — admission control for a
    // fixed-capacity consumer: per event_type on the ZERO-FILLED hour
    // grid, provision capacity at {1.0, 1.5, 2.0}× the mean hourly rate
    // and integrate the queue recurrence backlog_t = (backlog_{t−1} +
    // a_t − cap)⁺ — expressed windowed, not recursively: with
    // cum_t = Σ(a − cap), backlog_t = cum_t − min(0, min_{j≤t} cum_j),
    // the running-sum/running-min identity for the Lindley recursion.
    // Reported: hours over capacity and the peak backlog — the consumer
    // lag a Kafka-style sink (the reference's world) would show, and
    // the number that sizes its burst buffer. Scale: windows are
    // per-type over the generator-bounded hour grid (house rule);
    // everything upstream is one map-combined (type, hour) agg.
    "q458_peak_backlog" -> { (s, d) =>
      val arr = Tables.events(s, d).select(col("event_type"),
          expr("CAST(unix_micros(ts) div 3600000000 AS BIGINT)").as("hr"))
        .groupBy("event_type", "hr").agg(count(lit(1)).as("a"))
      val span = arr.groupBy("event_type")
        .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"),
          sum(col("a")).as("tot"))
        .withColumn("n_hours", expr("hi - lo + 1"))
      val dense = span
        .select(col("event_type"), col("tot"), col("n_hours"),
          explode(expr("sequence(lo, hi)")).as("hr"))
        .join(arr, Seq("event_type", "hr"), "left")
        .withColumn("a", coalesce(col("a"), lit(0L)))
      val cg = s.range(3)
        .select(expr("CAST(element_at(array(10, 15, 20), CAST(id AS INT) + 1) AS BIGINT)")
          .as("c_tenths"))
      val w = Window.partitionBy("event_type", "c_tenths")
        .orderBy("hr").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.crossJoin(broadcast(cg))
        .withColumn("cap", expr("greatest(tot * c_tenths DIV (10 * n_hours), 1)"))
        .withColumn("cum", sum(col("a") - col("cap")).over(w))
        .withColumn("backlog",
          expr("cum - least(0, min(cum) OVER (PARTITION BY event_type, c_tenths ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"))
        .groupBy("event_type", "c_tenths")
        .agg(count(lit(1)).cast("long").as("n_hours"),
          max(col("cap")).cast("long").as("capacity_per_hour"),
          sum(when(col("a") > col("cap"), 1L).otherwise(0L)).cast("long")
            .as("hours_over"),
          max(col("backlog")).cast("long").as("peak_backlog"))
        .orderBy("event_type", "c_tenths")
    },

    // BEHAVIORAL RE-IDENTIFICATION audit — the privacy quadrilateral
    // (q149/q275/q392/q425) guards QUASI-IDENTIFIER columns; the
    // re-identification literature's point is that BEHAVIOR is a
    // quasi-identifier too: fingerprint every user by their first three
    // event types (arrival order) plus the 6-hour bucket of their first
    // event, then run the k-anonymity census over fingerprints —
    // per anonymity class (k=1 unique / 2-4 / 5-9 / 10+): fingerprint
    // and user mass, and the headline unique-user ppm (users whose
    // behavior alone singles them out). Scale: one per-user window
    // (bounded first-3 prefix via conditional min), two map-combined
    // censuses.
    "q462_behavior_reident" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val fp = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .groupBy("user_id")
        .agg(min(when(col("rk") === 1, col("event_type"))).as("t1"),
          min(when(col("rk") === 2, col("event_type"))).as("t2"),
          min(when(col("rk") === 3, col("event_type"))).as("t3"),
          min(when(col("rk") === 1,
            expr("(us div 3600000000) % 24 DIV 6"))).as("h6"))
        .select(col("user_id"), concat_ws(">",
          coalesce(col("t1"), lit("_")), coalesce(col("t2"), lit("_")),
          coalesce(col("t3"), lit("_")), col("h6").cast("string"))
          .as("fingerprint"))
      val classes = fp.groupBy("fingerprint")
        .agg(count(lit(1)).as("k"))
        .withColumn("k_class", expr(
          """CASE WHEN k = 1 THEN 'a_unique' WHEN k <= 4 THEN 'b_2_to_4'
            | WHEN k <= 9 THEN 'c_5_to_9' ELSE 'd_10_plus' END""".stripMargin))
      val tot = classes.agg(sum(col("k")).as("n_users_total"))
      classes.groupBy("k_class")
        .agg(count(lit(1)).cast("long").as("n_fingerprints"),
          sum(col("k")).cast("long").as("n_users"))
        .crossJoin(broadcast(tot))
        .withColumn("share_ppm",
          expr("CAST(n_users * 1000000 DIV n_users_total AS BIGINT)"))
        .drop("n_users_total")
        .orderBy("k_class")
    },

    // JAIN FAIRNESS index of the daily event-type mix — the
    // multi-tenant scheduling gauge: per day, J = (Σx)² / (n·Σx²) over
    // the k event types' volumes (1 = perfectly fair, 1/k = one tenant
    // owns the day), in floor-ppm with the (Σx)² product in
    // DECIMAL(38,0). Summarized per event-type COUNT present that day
    // and overall: days measured, mean J, worst day — the fairness-SLA
    // row a shared ingest pipeline reports. Scale: one map-combined
    // (day, type) agg, then day-grid algebra.
    "q466_jain_fairness" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .select(expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"),
          col("event_type"))
        .groupBy("day", "event_type").agg(count(lit(1)).as("x"))
      val perDay = daily.groupBy("day")
        .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
          sum(expr("x * x")).as("sx2"))
        .withColumn("j_ppm", expr(
          """CAST(CAST(sx AS DECIMAL(38,0)) * sx * 1000000
            | DIV (k * sx2) AS BIGINT)""".stripMargin))
      perDay.groupBy("k")
        .agg(count(lit(1)).cast("long").as("n_days"),
          expr("CAST(sum(j_ppm) DIV count(1) AS BIGINT)").as("mean_j_ppm"),
          min(col("j_ppm")).cast("long").as("worst_j_ppm"),
          max(col("j_ppm")).cast("long").as("best_j_ppm"))
        .withColumn("floor_j_ppm", expr("CAST(1000000 DIV k AS BIGINT)"))
        .select(col("k").cast("long").as("k_types"), col("n_days"),
          col("mean_j_ppm"), col("worst_j_ppm"), col("best_j_ppm"),
          col("floor_j_ppm"))
        .orderBy("k_types")
    },

    // INT64-HEADROOM canary — the magnitude-rule table this repo's
    // operators carry as comments, automated: for every monetary/
    // measure column an aggregate might sum (lineitem cents, order
    // cents, event micro-values, doc chars), the live max |value|, its
    // bit width, and the headroom exponent 62 − bits — the number of
    // DOUBLINGS of the summand (or of row count under a full-table
    // SUM, reading sum_bits) left before an int64 aggregate overflows
    // and the DECIMAL(38,0) switch is mandatory. The canary is how a
    // 100× scale-up is caught in review instead of production. Scale:
    // four map-combined single-pass aggs on projected columns.
    "q467_headroom_canary" -> { (s, d) =>
      // sum headroom from the n·max UPPER BOUND (bits(max)+bits(n)), not
      // the live sum — the canary must not itself overflow at the very
      // scale it warns about
      def leg(nm: String, df: DataFrame, valueExpr: String) =
        df.select(expr(valueExpr).as("v"))
          .agg(count(lit(1)).as("n"), max(expr("abs(v)")).as("mx"))
          .select(lit(nm).as("column_key"),
            col("n").cast("long").as("n_rows"),
            col("mx").cast("long").as("max_abs"),
            expr("CAST(length(bin(greatest(mx, 1))) AS BIGINT)").as("value_bits"),
            expr("""CAST(length(bin(greatest(mx, 1)))
                   | + length(bin(greatest(n, 1))) AS BIGINT)""".stripMargin)
              .as("sum_bits_bound"),
            expr("""CAST(62 - length(bin(greatest(mx, 1)))
                   | - length(bin(greatest(n, 1))) AS BIGINT)""".stripMargin)
              .as("sum_headroom_doublings"))
      leg("c1_lineitem_price_cents", Tables.lineitem(s, d),
          "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .unionByName(leg("c2_orders_total_cents", Tables.orders(s, d),
          "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .unionByName(leg("c3_event_value_micro", Tables.events(s, d),
          "CAST(floor(value * 1000000 + 0.5) AS BIGINT)"))
        .unionByName(leg("c4_doc_chars", Tables.documents(s, d),
          "CAST(n_chars AS BIGINT)"))
        .orderBy("column_key")
    },

    // RUNTIME-FILTER (semi-join pushdown / DPP) benefit table — what a
    // dimension filter is WORTH when pushed across the joins: for each
    // customer market segment, the orders rows a runtime filter admits
    // (vs the full probe side) and the lineitem rows one hop deeper,
    // with floor-ppm reductions at both hops. This is the measured
    // justification for Spark's runtime row-group filters and dynamic
    // partition pruning: the fact-side scan shrinks by exactly these
    // ppm BEFORE the join executes. Scale: one semi-join count per hop
    // (the filter side is dimension-sized and broadcastable); the
    // segment grid is bounded by the domain.
    "q475_runtime_filter" -> { (s, d) =>
      val seg = Tables.customer(s, d)
        .select(col("c_mktsegment").as("segment"), col("c_custkey").as("ck"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey").as("ok"))
      val tot = o.agg(count(lit(1)).as("n_orders"))
        .crossJoin(li.agg(count(lit(1)).as("n_lines")))
      val oSeg = o.join(seg, "ck").groupBy("segment")
        .agg(count(lit(1)).as("orders_admitted"))
      val liSeg = li.join(o, "ok").join(seg, "ck").groupBy("segment")
        .agg(count(lit(1)).as("lines_admitted"))
      oSeg.join(liSeg, "segment").crossJoin(broadcast(tot))
        .select(col("segment"),
          col("n_orders").cast("long").as("n_orders"),
          col("orders_admitted").cast("long").as("orders_admitted"),
          expr("CAST(orders_admitted * 1000000 DIV n_orders AS BIGINT)")
            .as("orders_admit_ppm"),
          col("n_lines").cast("long").as("n_lines"),
          col("lines_admitted").cast("long").as("lines_admitted"),
          expr("CAST(lines_admitted * 1000000 DIV n_lines AS BIGINT)")
            .as("lines_admit_ppm"))
        .orderBy("segment")
    },

    // AGG-SPILL forecaster — will a groupBy's hash table fit? For the
    // two real aggregation keys (events by user, lineitem by partkey)
    // and reducer counts P ∈ {32, 256}, route every key by the neutral
    // hash % P and measure the BIGGEST reducer's key count and row
    // count exactly, priced at 64 B/entry against a 64 MiB per-task
    // hash-table budget — the fits/spills verdict AQE's coalescing and
    // q446's byte sizing do not see (they size by ROWS; a hash AGG
    // sizes by KEYS). Scale: one map-combined per-key count per leg;
    // the P routing is arithmetic on the key census, never the rows.
    "q476_agg_spill_forecast" -> { (s, d) =>
      def leg(nm: String, df: DataFrame, key: String) = {
        val perKey = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
          .select(Dedup.neutralHash32(col("k").cast("string")).as("h"),
            col("cnt"))
        val ps = perKey.sparkSession.range(2)
          .select(expr("CAST(element_at(array(32, 256), CAST(id AS INT) + 1) AS BIGINT)")
            .as("p"))
        perKey.crossJoin(broadcast(ps))
          .groupBy(col("p"), expr("h % p").as("reducer"))
          .agg(count(lit(1)).as("keys_"), sum(col("cnt")).as("rows_"))
          .groupBy("p")
          .agg(sum(col("keys_")).cast("long").as("n_keys"),
            max(col("keys_")).cast("long").as("max_reducer_keys"),
            max(col("rows_")).cast("long").as("max_reducer_rows"))
          .select(lit(nm).as("agg_key"), col("p"), col("n_keys"),
            col("max_reducer_keys"), col("max_reducer_rows"),
            expr("CAST(max_reducer_keys * 64 AS BIGINT)").as("est_table_bytes"),
            (expr("max_reducer_keys * 64") <= 67108864L).as("fits_64mb"))
      }
      leg("k1_events_by_user", Tables.events(s, d), "user_id")
        .unionByName(leg("k2_lineitem_by_partkey", Tables.lineitem(s, d),
          "l_partkey"))
        .orderBy("agg_key", "p")
    },

    // PREDICATE-ORDER advisor — the conjunctive-filter evaluation-order
    // decision (vectorized engines pay per row EXAMINED per predicate):
    // three lineitem predicates' full 2³ joint cell census in ONE pass,
    // then every one of the 6 evaluation orders priced exactly — cost =
    // rows examined = N + surv(first) + surv(first two). Greedy
    // marginal-selectivity ordering is optimal only under independence;
    // this table prices the TRUE joint distribution, so correlated
    // predicates (the q452 lesson) surface as a greedy-vs-optimal rank
    // gap. Scale: one map-combined 8-cell census; the 6-permutation
    // pricing and 6×6 rank are broadcast grid algebra.
    "q473_predicate_order" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag"), col("l_quantity"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
      val st = li.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        .withColumn("t", expr("lo + (hi - lo + 1) DIV 4"))
      val cells = li.crossJoin(broadcast(st))
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L).as("p1"),
          when(col("l_quantity") < 25, 1L).otherwise(0L).as("p2"),
          when(col("cents") < col("t"), 1L).otherwise(0L).as("p3"))
        .groupBy("p1", "p2", "p3").agg(count(lit(1)).as("c"))
      // survivals of every predicate subset from the 8-cell census —
      // shared-persisted: six permutation legs read this ONE row
      val sv = Caches.shared(cells.agg(sum(col("c")).as("n"),
        sum(expr("c * p1")).as("s1"), sum(expr("c * p2")).as("s2"),
        sum(expr("c * p3")).as("s3"),
        sum(expr("c * p1 * p2")).as("s12"),
        sum(expr("c * p1 * p3")).as("s13"),
        sum(expr("c * p2 * p3")).as("s23"),
        sum(expr("c * p1 * p2 * p3")).as("s123")))
      def perm(nm: String, first: String, firstTwo: String) =
        sv.select(lit(nm).as("eval_order"),
          col("n").cast("long").as("stage1_rows"),
          col(first).cast("long").as("stage2_rows"),
          col(firstTwo).cast("long").as("stage3_rows"),
          expr(s"CAST(n + $first + $firstTwo AS BIGINT)").as("cost_rows"),
          col("s123").cast("long").as("out_rows"))
      val plans = perm("o1_p1_p2_p3", "s1", "s12")
        .unionByName(perm("o2_p1_p3_p2", "s1", "s13"))
        .unionByName(perm("o3_p2_p1_p3", "s2", "s12"))
        .unionByName(perm("o4_p2_p3_p1", "s2", "s23"))
        .unionByName(perm("o5_p3_p1_p2", "s3", "s13"))
        .unionByName(perm("o6_p3_p2_p1", "s3", "s23"))
      plans.crossJoin(broadcast(plans.select(col("eval_order").as("o2"),
          col("cost_rows").as("c2"))))
        .groupBy("eval_order", "stage1_rows", "stage2_rows", "stage3_rows",
          "cost_rows", "out_rows")
        .agg((sum(when(col("c2") < col("cost_rows") ||
          (col("c2") === col("cost_rows") && col("o2") < col("eval_order")),
          1L).otherwise(0L)) + 1L).cast("long").as("cost_rank"))
        .orderBy("eval_order")
    },

    // ANOMALY-CONSENSUS disposition — the on-call integration view
    // (q160's role for the anomaly family): per (event_type, day) on
    // the zero-filled grid, three INDEPENDENT detector votes — robust
    // MAD (|n − median| > 3·MAD, the q344 rule), RECORD day (strictly
    // above every prior day, q383's statistic), and BURST (n > 2× the
    // trailing-7-day mean, integer cross-multiplied, needing ≥ 3 prior
    // days) — folded to the per-type consensus census: how many days
    // each detector flags alone vs how many carry 2+ and 3 votes. A
    // single-detector day is review noise; a 3-vote day is an incident.
    // Scale: per-type windows over the bounded day grid; median/MAD by
    // explicit rank selection (house convention).
    "q474_anomaly_consensus" -> { (s, d) =>
      val daily0 = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      val span = daily0.groupBy("event_type")
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val daily = Caches.shared(span
        .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("day"))
        .join(daily0, Seq("event_type", "day"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L))))
      val wCnt = Window.partitionBy("event_type")
      val wOrd = Window.partitionBy("event_type").orderBy("n", "day")
      val med = daily.withColumn("nd", count(lit(1)).over(wCnt))
        .withColumn("rk", row_number().over(wOrd))
        .filter(expr("rk = (nd + 1) DIV 2"))
        .select(col("event_type"), col("n").as("med"))
      val wDev = Window.partitionBy("event_type").orderBy("dev", "day")
      val mad = daily.join(med, "event_type")
        .withColumn("dev", expr("abs(n - med)"))
        .withColumn("nd", count(lit(1)).over(wCnt))
        .withColumn("rk", row_number().over(wDev))
        .filter(expr("rk = (nd + 1) DIV 2"))
        .select(col("event_type"), col("dev").as("mad"))
      val wPrev = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val w7 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      val votes = daily.join(med, "event_type").join(mad, "event_type")
        .withColumn("prev_max", max(col("n")).over(wPrev))
        .withColumn("t7_sum", sum(col("n")).over(w7))
        .withColumn("t7_n", count(lit(1)).over(w7))
        .withColumn("v_mad",
          when(expr("abs(n - med) > 3 * mad"), 1L).otherwise(0L))
        .withColumn("v_record", when(col("prev_max").isNotNull &&
          col("n") > col("prev_max"), 1L).otherwise(0L))
        .withColumn("v_burst", when(expr("t7_n >= 3 AND n * t7_n > 2 * t7_sum"),
          1L).otherwise(0L))
        .withColumn("votes", expr("v_mad + v_record + v_burst"))
      votes.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum(col("v_mad")).cast("long").as("n_mad"),
          sum(col("v_record")).cast("long").as("n_record"),
          sum(col("v_burst")).cast("long").as("n_burst"),
          sum(when(col("votes") >= 2, 1L).otherwise(0L)).cast("long")
            .as("n_consensus2"),
          sum(when(col("votes") === 3, 1L).otherwise(0L)).cast("long")
            .as("n_consensus3"))
        .orderBy("event_type")
    },

    // PEAK-RATE gauge — the fine-grained burst q455/q458 price by the
    // hour, measured at its true resolution: per event_type, the count
    // of events inside the trailing 60-second EVENT-TIME window at
    // every arrival (a RANGE frame over unix micros — O(1) sliding
    // state, never a self-join), summarized as the peak, the p-max
    // arrival second, and the mean-over-peak burstiness ratio. This is
    // the admission-control and provisioning number: a consumer sized
    // for the MEAN rate underruns by exactly peak/mean. Scale: ONE
    // per-type RANGE window in arrival order; census map-combined.
    "q468_peak_rate" -> { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy(col("us"))
        .rangeBetween(-60000000L + 1, 0)
      val ev = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn("win60", count(lit(1)).over(w))
      ev.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_events"),
          max(col("win60")).cast("long").as("peak_60s"),
          min(col("us")).as("us0"), max(col("us")).as("us1"))
        .withColumn("span_s", expr("greatest((us1 - us0) DIV 1000000, 1)"))
        .withColumn("mean_per_60s",
          expr("CAST(n_events * 60 DIV span_s AS BIGINT)"))
        .withColumn("burst_ratio_ppm", expr(
          "CAST(peak_60s * 1000000 DIV greatest(mean_per_60s, 1) AS BIGINT)"))
        .select("event_type", "n_events", "peak_60s", "mean_per_60s",
          "burst_ratio_ppm")
        .orderBy("event_type")
    },

    // DETERMINISTIC EVAL-HOLDOUT carve — the min-k hash sample every
    // training pipeline cuts before anything else (the eval set must be
    // a pure function of the DATA, not of partitioning or arrival
    // order): per source, the k = 5 documents with the SMALLEST salted
    // md5 priority (13 hex chars = 52 bits, exact in a double, so the
    // bounded-heap aggregator's double score compares identically to
    // the oracle's integer order; ties broken by doc_id). Scale: the
    // window spelling sorts every doc of every source behind a full
    // shuffle — the TopKAggregator keeps k pairs per partition and
    // combines map-side, so the shuffle carries k·|sources| rows at
    // any corpus size (the q55 plan, applied to sampling).
    "q506_eval_holdout" -> { (s, d) =>
      import s.implicits._
      val k = 5
      val hx = "CAST(conv(substring(md5(concat('smp:', CAST(doc_id AS" +
        " STRING))), 1, 13), 16, 10) AS BIGINT)"
      val picked = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), expr(hx).as("h"))
        .select(col("source"), col("h"), col("doc_id"))
        .as[(String, Long, Long)]
        // score DESC = priority ASC: 52-bit h negates exactly in double
        .groupByKey(_._1)
        .mapValues(t => (-t._2.toDouble, t._3))
        .agg(graft.functions.TopKAggregator(k).toColumn.name("topk"))
        .toDF("source", "topk")
        .select(col("source"), posexplode(col("topk")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
          col("col._2").as("doc_id"))
      picked.select(col("source"), col("rk"), col("doc_id"), expr(hx).as("h"))
        .orderBy("source", "rk")
    },

    // TRAIN/TEST CONTAMINATION census — the leakage audit an LLM eval
    // pipeline must run before trusting any benchmark number: docs are
    // hash-split 90/10 (split is a salted-md5 function of doc_id, so
    // it is stable under re-partitioning and re-ingestion), exact-dup
    // classes are md5-of-text fingerprints, and a class that spans both
    // splits means the test side is memorizable from train. Per source:
    // class counts, cross-split classes, contaminated test docs, exact
    // train×test pair count, and the contamination share in ppm. Scale:
    // ONE linear scan; the shuffle carries (source, 16-byte fp) partial
    // counts, map-combined — never text.
    "q507_split_contamination" -> { (s, d) =>
      val isTest = expr("CAST(conv(substring(md5(concat('spl:'," +
        " CAST(doc_id AS STRING))), 1, 13), 16, 10) AS BIGINT) % 100 < 10")
      Tables.documents(s, d)
        .select(col("source"), md5(col("text")).as("fp"),
          when(isTest, 1L).otherwise(0L).as("t"))
        .groupBy("source", "fp")
        .agg(sum(col("t")).as("nt"), sum(lit(1L) - col("t")).as("ntr"))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_classes"),
          sum(when(col("nt") + col("ntr") >= 2, 1L).otherwise(0L))
            .cast("long").as("n_multi"),
          sum(when(col("nt") >= 1 && col("ntr") >= 1, 1L).otherwise(0L))
            .cast("long").as("n_cross"),
          sum(col("nt") * col("ntr")).cast("long").as("contam_pairs"),
          sum(when(col("ntr") >= 1, col("nt")).otherwise(0L))
            .cast("long").as("contam_test_docs"),
          sum(col("nt")).cast("long").as("test_docs"))
        .withColumn("contam_ppm", expr(
          "CAST(contam_test_docs * 1000000 DIV greatest(test_docs, 1)" +
            " AS BIGINT)"))
        .orderBy("source")
    },

    // MANN–KENDALL trend census — the distribution-free monotone-trend
    // test (Mann 1945, Kendall 1975) the seasonal detectors (q289/q492)
    // assume away: per event type over its active-day counts, S =
    // Σ_{i<j} sign(c_j − c_i) and the tie-adjusted variance as the
    // EXACT integer numerator var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5)
    // (Var = var18/18; the /18 and the z sqrt are the float steps both
    // engines skip). All pair work runs on the post-agg (type, day)
    // grid — ≤ |types|·31 rows by the generator horizon — so the
    // theta-join is bounded at ANY corpus size; the fact table is
    // touched by exactly one map-combined count.
    "q508_mann_kendall" -> { (s, d) =>
      val daily = Caches.shared(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")))
      val pairs = daily.as("a")
        .join(daily.as("b"),
          col("b.event_type") === col("a.event_type") &&
            col("b.day") > col("a.day"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(when(col("b.c") > col("a.c"), 1L)
          .when(col("b.c") < col("a.c"), -1L).otherwise(0L)).as("s_stat"))
      val n = daily.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"))
      val ties = daily.groupBy("event_type", "c")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
      n.join(pairs, Seq("event_type"), "left")
        .join(ties, Seq("event_type"), "left")
        .select(col("event_type"), col("n_days"),
          coalesce(col("s_stat"), lit(0L)).cast("long").as("s_stat"),
          (expr("n_days * (n_days - 1) * (2 * n_days + 5)") -
            coalesce(col("tie_term"), lit(0L))).cast("long").as("var18_num"),
          when(coalesce(col("s_stat"), lit(0L)) > 0, 1L)
            .when(coalesce(col("s_stat"), lit(0L)) < 0, -1L).otherwise(0L)
            .cast("long").as("trend_dir"))
        .orderBy("event_type")
    },

    // SHIP-LAG SURVIVAL table — the Kaplan–Meier at-risk accounting
    // (n_at_risk, d_events, hazard) applied to order-to-ship latency:
    // for every active lag t, how many lines were still unshipped at t
    // (lag ≥ t) and how many shipped exactly at t; hazard_ppm =
    // d·10⁶ DIV r is the discrete conditional ship rate. The KM curve
    // itself is the float product both engines skip — the integer
    // at-risk table IS the estimator's sufficient statistic. Scale:
    // one natural-key lineitem⋈orders join + one lag agg; the suffix
    // sum runs as a theta-join on the lag grid, which is HORIZON-
    // bounded, not corpus-bounded: lag ∈ (−span, +span) of the 7-year
    // order horizon (the driver corpus ships negative delays — q486's
    // finding), ≈ 4.7k distinct lags ⇒ ≤ ~11M theta pairs at ANY sf,
    // broadcast-side grid.
    "q509_ship_lag_survival" -> { (s, d) =>
      val lag = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(datediff(to_date(col("l_shipdate")),
          to_date(col("o_orderdate"))).cast("long").as("t"))
      val grid = Caches.shared(
        lag.groupBy("t").agg(count(lit(1)).as("d_events")))
      grid.as("a")
        .join(broadcast(grid.as("b")), col("b.t") >= col("a.t"))
        .groupBy(col("a.t").as("lag_days"),
          col("a.d_events").as("d_events"))
        .agg(sum(col("b.d_events")).cast("long").as("n_at_risk"))
        .withColumn("hazard_ppm",
          expr("CAST(d_events * 1000000 DIV n_at_risk AS BIGINT)"))
        .select(col("lag_days"), col("d_events").cast("long").as("d_events"),
          col("n_at_risk"), col("hazard_ppm"))
        .orderBy("lag_days")
    },

    // OFFLINE CUSUM CHANGE-POINT — the batch twin of the streaming
    // Page detector (F217): per event type, the day k* maximizing
    // |n·P_k − k·S| over the active-day prefix sums (the scaled CUSUM
    // deviation — integer-exact because the mean is folded in as n·P −
    // k·S rather than divided out), with the earliest day winning ties.
    // cusum_milli = D_max·1000 DIV (n·S) normalizes to [0, 1000] for
    // cross-type compare. Magnitudes: n ≤ 31 days and P, S ≤ corpus
    // events, so n·P tops ~2·10⁹ even at sf100 — int64 holds by 9
    // orders. Windows run PARTITIONED on the post-agg per-type grid
    // (≤ 31 rows/type), never on the fact table.
    "q510_cusum_changepoint" -> { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("day")
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("p", sum(col("c")).over(w))
      val tot = daily.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum(col("c")).cast("long").as("total_events"))
      val dk = Caches.shared(daily.join(tot, Seq("event_type"))
        .withColumn("dk", abs(col("n_days") * col("p") -
          col("k") * col("total_events"))))
      dk.groupBy("event_type", "n_days", "total_events")
        .agg(max(col("dk")).as("d_abs_max"))
        .join(dk.select(col("event_type"), col("day"), col("dk")),
          Seq("event_type"))
        .filter(col("dk") === col("d_abs_max"))
        .groupBy("event_type", "n_days", "total_events", "d_abs_max")
        .agg(min(datediff(col("day"), lit("1970-01-01").cast("date"))
          .cast("long")).as("cp_epoch_day"))
        .select(col("event_type"), col("n_days"), col("total_events"),
          col("cp_epoch_day"), col("d_abs_max").cast("long").as("d_abs_max"),
          expr("CAST(d_abs_max * 1000 DIV greatest(n_days * total_events," +
            " 1) AS BIGINT)").as("cusum_milli"))
        .orderBy("event_type")
    }
  )

  def oracle: Map[String, String] = Map(

    "q344_mad_anomalies" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |cnts AS (SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1),
         |medr AS (
         |  SELECT event_type, n,
         |    row_number() OVER (PARTITION BY event_type ORDER BY n, day) AS rn
         |  FROM daily),
         |med AS (
         |  SELECT m.event_type, m.n AS med FROM medr m JOIN cnts c
         |    USING (event_type) WHERE m.rn = (c.n_days + 1) // 2),
         |dev AS (
         |  SELECT d.event_type, d.day, d.n, ABS(d.n - med.med) AS dev, med.med
         |  FROM daily d JOIN med USING (event_type)),
         |madr AS (
         |  SELECT event_type, dev,
         |    row_number() OVER (PARTITION BY event_type ORDER BY dev, day) AS rn
         |  FROM dev),
         |mad AS (
         |  SELECT m.event_type, m.dev AS mad FROM madr m JOIN cnts c
         |    USING (event_type) WHERE m.rn = (c.n_days + 1) // 2)
         |SELECT dev.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |  CAST(MAX(dev.med) AS BIGINT) AS med,
         |  CAST(MAX(mad.mad) AS BIGINT) AS mad,
         |  CAST(SUM(CASE WHEN dev.dev > $MadK * mad.mad THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_anomalies,
         |  CAST(MAX(dev.dev) AS BIGINT) AS max_dev
         |FROM dev JOIN mad USING (event_type)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q345_expectations" ->
      s"""WITH row_checks AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ${sqlList(StatusDomain)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         |    CAST(SUM(CASE WHEN o_orderpriority NOT IN ${sqlList(PriorityDomain)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
         |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v4,
         |    CAST(SUM(CASE WHEN year(o_orderdate) < $YearLo
         |      OR year(o_orderdate) > $YearHi THEN 1 ELSE 0 END) AS BIGINT) AS v5,
         |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v6
         |  FROM orders),
         |u AS (
         |  SELECT 'c1_totalprice_positive' AS check_name, n_rows, v1 AS n_violations FROM row_checks
         |  UNION ALL SELECT 'c2_status_domain', n_rows, v2 FROM row_checks
         |  UNION ALL SELECT 'c3_priority_domain', n_rows, v3 FROM row_checks
         |  UNION ALL SELECT 'c4_custkey_not_null', n_rows, v4 FROM row_checks
         |  UNION ALL SELECT 'c5_orderdate_bounds', n_rows, v5 FROM row_checks
         |  UNION ALL SELECT 'c6_orderkey_unique', n_rows, v6 FROM row_checks)
         |SELECT check_name, n_rows, n_violations, n_violations = 0 AS pass
         |FROM u ORDER BY check_name""".stripMargin,

    "q346_chunking_audit" ->
      s"""WITH docs AS (
         |  SELECT doc_id, source, text, CAST(length(text) AS BIGINT) AS nc,
         |    1 + (GREATEST(length(text) - $ChunkLen, 0) + $ChunkStride - 1)
         |      // $ChunkStride AS n_chunks
         |  FROM documents),
         |chunks AS (
         |  SELECT source, text, nc, g.i,
         |    LEAST($ChunkLen, nc - g.i * $ChunkStride) AS span,
         |    CASE WHEN g.i > 0
         |      AND substr(text, CAST(g.i * $ChunkStride AS INT), 1) <> ' '
         |      AND substr(text, CAST(g.i * $ChunkStride + 1 AS INT), 1) <> ' '
         |      THEN 1 ELSE 0 END AS brk
         |  FROM docs, UNNEST(generate_series(0, n_chunks - 1)) AS g(i))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(SUM(CASE WHEN i = 0 THEN nc ELSE 0 END) AS BIGINT) AS n_chars,
         |  CAST(SUM(span) AS BIGINT) AS span_chars,
         |  CAST((SUM(span) - SUM(CASE WHEN i = 0 THEN nc ELSE 0 END)) * 1000000
         |    // SUM(CASE WHEN i = 0 THEN nc ELSE 0 END) AS BIGINT) AS overlap_ppm,
         |  CAST(SUM(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
         |  CAST(SUM(brk) AS BIGINT) AS broken,
         |  CAST(CASE WHEN SUM(CASE WHEN i > 0 THEN 1 ELSE 0 END) = 0 THEN 0
         |    ELSE SUM(brk) * 1000000 // SUM(CASE WHEN i > 0 THEN 1 ELSE 0 END)
         |    END AS BIGINT) AS broken_ppm
         |FROM chunks GROUP BY 1 ORDER BY 1""".stripMargin,

    "q347_interval_coverage" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    epoch_us(CAST(ts AS TIMESTAMP)) + $CoverUs AS en
         |  FROM events),
         |sw AS (
         |  SELECT user_id, event_id, us, en,
         |    MAX(en) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM ev),
         |fl AS (
         |  SELECT user_id, event_id, us, en,
         |    CASE WHEN pmax IS NULL OR us > pmax THEN 1 ELSE 0 END AS new_isl
         |  FROM sw),
         |il AS (
         |  SELECT user_id, us, en,
         |    SUM(new_isl) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
         |  FROM fl),
         |per_island AS (
         |  SELECT user_id, isl, MAX(en) - MIN(us) AS cov_us
         |  FROM il GROUP BY 1, 2),
         |per_user AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
         |    SUM(cov_us) AS cov_us, MAX(cov_us) AS max_us
         |  FROM per_island GROUP BY 1)
         |SELECT n_islands, CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(cov_us) // 1000000 AS BIGINT) AS covered_s,
         |  CAST(MAX(max_us) // 1000000 AS BIGINT) AS max_island_s
         |FROM per_user GROUP BY 1 ORDER BY 1""".stripMargin,

    "q348_theil_sen" ->
      """WITH m AS (
        |  SELECT (year(o_orderdate) - 1990) * 12 + month(o_orderdate) AS t,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT a.t AS t1, b.t AS t2, b.rc - a.rc AS num, b.t - a.t AS den
        |  FROM m a JOIN m b ON a.t < b.t),
        |sl AS (
        |  SELECT t1, t2, num, den,
        |    CASE WHEN num >= 0 THEN num * 1000000 // den
        |         ELSE -((-num) * 1000000 // den) END AS slope_u
        |  FROM pairs),
        |rk AS (
        |  SELECT slope_u,
        |    row_number() OVER (ORDER BY slope_u, num, den, t1, t2) AS rn
        |  FROM sl),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(MIN(slope_u) AS BIGINT) AS min_slope_u,
        |  CAST(MAX(slope_u) AS BIGINT) AS max_slope_u FROM sl),
        |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM m)
        |SELECT nm.n_months, st.n_pairs,
        |  CAST(rk.slope_u AS BIGINT) AS ts_slope_u,
        |  st.min_slope_u, st.max_slope_u
        |FROM rk CROSS JOIN st CROSS JOIN nm
        |WHERE rk.rn = (st.n_pairs + 1) // 2""".stripMargin,

    "q349_benford" -> {
      val gridSql = BenfordPpm.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, ${p})" }.mkString(", ")
      s"""WITH grid(digit, exp_ppm) AS (VALUES $gridSql),
         |cents AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
         |  FROM orders),
         |obs AS (
         |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM cents WHERE c >= 1 GROUP BY 1),
         |tot AS (SELECT SUM(n) AS total FROM obs)
         |SELECT CAST(grid.digit AS BIGINT) AS digit,
         |  CAST(COALESCE(obs.n, 0) AS BIGINT) AS n,
         |  CAST(COALESCE(obs.n, 0) * 1000000 // tot.total AS BIGINT) AS obs_ppm,
         |  CAST(grid.exp_ppm AS BIGINT) AS exp_ppm,
         |  CAST(ABS(COALESCE(obs.n, 0) * 1000000 // tot.total - grid.exp_ppm)
         |    AS BIGINT) AS abs_delta_ppm,
         |  CAST((COALESCE(obs.n, 0) * 1000000 // tot.total - grid.exp_ppm)
         |    * (COALESCE(obs.n, 0) * 1000000 // tot.total - grid.exp_ppm)
         |    // grid.exp_ppm AS BIGINT) AS chi2_scaled
         |FROM grid LEFT JOIN obs USING (digit) CROSS JOIN tot
         |ORDER BY digit""".stripMargin
    },

    "q350_deletion_cascade" ->
      """WITH cohort AS (
        |  SELECT c_custkey FROM customer
        |  WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
        |    % 100 < 5),
        |del_orders AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM cohort)),
        |del_lines AS (
        |  SELECT l_orderkey, l_linenumber FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)),
        |orph AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem li
        |  WHERE li.l_orderkey IN (SELECT o_orderkey FROM del_orders)
        |    AND NOT EXISTS (SELECT 1 FROM del_lines dl
        |      WHERE dl.l_orderkey = li.l_orderkey
        |        AND dl.l_linenumber = li.l_linenumber)),
        |u AS (
        |  SELECT 'customer' AS table_name,
        |    CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
        |    CAST((SELECT COUNT(*) FROM cohort) AS BIGINT) AS n_delete,
        |    CAST(0 AS BIGINT) AS n_orphans
        |  UNION ALL
        |  SELECT 'orders',
        |    CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
        |    CAST((SELECT COUNT(*) FROM del_orders) AS BIGINT),
        |    CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem',
        |    CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
        |    CAST((SELECT COUNT(*) FROM del_lines) AS BIGINT),
        |    (SELECT n FROM orph))
        |SELECT table_name, n_rows, n_delete,
        |  CAST(n_delete * 1000000 // n_rows AS BIGINT) AS delete_ppm,
        |  n_orphans
        |FROM u ORDER BY table_name""".stripMargin,

    "q351_pareto_frontier" ->
      """WITH p AS (
        |  SELECT p_size, p_partkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc
        |  FROM part),
        |g1 AS (SELECT p_size, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |         MIN(pc) AS best_price_c FROM p GROUP BY 1),
        |g AS (
        |  SELECT g1.p_size, g1.n_parts, g1.best_price_c,
        |    CAST(MIN(p.p_partkey) AS BIGINT) AS best_partkey
        |  FROM g1 JOIN p ON p.p_size = g1.p_size AND p.pc = g1.best_price_c
        |  GROUP BY 1, 2, 3),
        |sky AS (
        |  SELECT a.p_size, a.n_parts, a.best_price_c, a.best_partkey,
        |    MIN(b.best_price_c) AS min_larger
        |  FROM g a LEFT JOIN g b ON b.p_size > a.p_size
        |  GROUP BY 1, 2, 3, 4)
        |SELECT CAST(p_size AS BIGINT) AS p_size, n_parts,
        |  CAST(best_price_c AS BIGINT) AS best_price_c,
        |  best_partkey,
        |  (min_larger IS NULL OR best_price_c < min_larger) AS on_frontier
        |FROM sky ORDER BY p_size""".stripMargin,

    "q352_drawdown" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type, day, n,
        |    MAX(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM daily),
        |d2 AS (SELECT event_type, day, n, peak, peak - n AS dd FROM dd),
        |agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(MAX(peak) AS BIGINT) AS peak_max,
        |    CAST(MAX(dd) AS BIGINT) AS max_drawdown,
        |    CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS days_underwater
        |  FROM d2 GROUP BY 1),
        |sel AS (
        |  SELECT d2.event_type, MIN(d2.day) AS max_dd_day
        |  FROM d2 JOIN agg ON d2.event_type = agg.event_type
        |    AND d2.dd = agg.max_drawdown
        |  GROUP BY 1)
        |SELECT agg.event_type, n_days, peak_max, max_drawdown, days_underwater,
        |  sel.max_dd_day
        |FROM agg JOIN sel ON agg.event_type = sel.event_type
        |ORDER BY agg.event_type""".stripMargin,

    "q353_range_splits" ->
      """WITH g AS (
        |  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1),
        |cum AS (
        |  SELECT a.n_chars, a.cnt,
        |    CAST(COALESCE(SUM(b.cnt), 0) AS BIGINT) AS before
        |  FROM g a LEFT JOIN g b ON b.n_chars < a.n_chars
        |  GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g),
        |ks AS (SELECT CAST(k.k AS BIGINT) AS k
        |       FROM UNNEST(generate_series(1, 7)) AS k(k))
        |SELECT ks.k, CAST(ks.k * tot.n // 8 AS BIGINT) AS target_rank,
        |  CAST(cum.n_chars AS BIGINT) AS boundary_n_chars,
        |  CAST(cum.before + cum.cnt AS BIGINT) AS cum_le_boundary,
        |  CAST((cum.before + cum.cnt - ks.k * tot.n // 8) * 1000000 // tot.n
        |    AS BIGINT) AS overshoot_ppm
        |FROM ks CROSS JOIN tot JOIN cum
        |  ON ks.k * tot.n // 8 > cum.before
        |  AND ks.k * tot.n // 8 <= cum.before + cum.cnt
        |ORDER BY ks.k""".stripMargin,

    "q354_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
        |      // 100000 AS bal_band,
        |    CAST(COUNT(*) AS BIGINT) AS ksz
        |  FROM customer GROUP BY 1, 2, 3),
        |gl AS (SELECT CAST(MIN(ksz) AS BIGINT) AS min_k,
        |  CAST(SUM(CASE WHEN ksz < 5 THEN ksz ELSE 0 END) AS BIGINT)
        |    AS n_below5 FROM cls),
        |banded AS (
        |  SELECT CASE WHEN ksz = 1 THEN 'a_unique'
        |              WHEN ksz <= 4 THEN 'b_2_4'
        |              WHEN ksz <= 9 THEN 'c_5_9'
        |              ELSE 'd_10_plus' END AS band, ksz
        |  FROM cls)
        |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(ksz) AS BIGINT) AS n_customers,
        |  gl.min_k, gl.n_below5 AS n_below_k5
        |FROM banded CROSS JOIN gl
        |GROUP BY band, gl.min_k, gl.n_below5
        |ORDER BY band""".stripMargin,

    "q355_jl_projection" ->
      """WITH q3 AS (
        |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
        |proj AS (
        |  SELECT vec_id, q, list_transform(generate_series(0, 15), i ->
        |    CAST(list_sum(list_transform(generate_series(0, 63), j ->
        |      (CASE WHEN (i * 7919 + j * 104729) % 2001 - 1000 >= 0
        |       THEN 1 ELSE -1 END) * q[j + 1])) AS BIGINT)) AS y
        |  FROM q3),
        |pairs AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      j -> (a.q[j] - b.q[j]) * (a.q[j] - b.q[j]))) AS BIGINT) AS d64,
        |    CAST(list_sum(list_transform(generate_series(1, 16),
        |      j -> (a.y[j] - b.y[j]) * (a.y[j] - b.y[j]))) AS BIGINT) AS d16
        |  FROM proj a JOIN proj b ON a.vec_id < b.vec_id),
        |r AS (
        |  SELECT CASE WHEN d64 = 0 THEN CAST(1000000 AS BIGINT)
        |    ELSE d16 * 1000000 // (16 * d64) END AS ratio_u
        |  FROM pairs)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(MIN(ratio_u) AS BIGINT) AS min_ratio_u,
        |  CAST(MAX(ratio_u) AS BIGINT) AS max_ratio_u,
        |  CAST(SUM(ratio_u) // COUNT(*) AS BIGINT) AS mean_ratio_u,
        |  CAST(SUM(CASE WHEN ABS(ratio_u - 1000000) <= 100000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_10pct
        |FROM r""".stripMargin,

    "q356_farthest_points" -> {
      def step(k: Int, prevSel: String): String =
        s"""d$k AS (
           |  SELECT c.vec_id, c.q,
           |    MIN(CAST(list_sum(list_transform(generate_series(1, 64),
           |      j -> (c.q[j] - s.q[j]) * (c.q[j] - s.q[j]))) AS BIGINT)) AS mind
           |  FROM c, $prevSel s
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM $prevSel)
           |  GROUP BY 1, 2),
           |p$k AS (SELECT vec_id, q, mind FROM d$k
           |        ORDER BY mind DESC, vec_id LIMIT 1),
           |sel$k AS (SELECT vec_id, q FROM $prevSel
           |          UNION ALL SELECT vec_id, q FROM p$k)""".stripMargin
      s"""WITH c AS (
         |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
         |    x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS q
         |  FROM embeddings),
         |sel1 AS (SELECT vec_id, q FROM c ORDER BY vec_id LIMIT 1),
         |${step(2, "sel1")},
         |${step(3, "sel2")},
         |${step(4, "sel3")}
         |SELECT CAST(1 AS BIGINT) AS step, CAST(vec_id AS BIGINT) AS vec_id,
         |  CAST(0 AS BIGINT) AS mindist_sq FROM sel1
         |UNION ALL SELECT 2, vec_id, mind FROM p2
         |UNION ALL SELECT 3, vec_id, mind FROM p3
         |UNION ALL SELECT 4, vec_id, mind FROM p4
         |ORDER BY step""".stripMargin
    },

    "q357_srm_check" ->
      """WITH u AS (
        |  SELECT event_type, user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
        |      AS arm
        |  FROM events),
        |per AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM (SELECT DISTINCT event_type, user_id, arm FROM u) GROUP BY 1),
        |al AS (
        |  SELECT '__all__' AS event_type,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM (SELECT DISTINCT user_id, arm FROM u)),
        |uni AS (SELECT * FROM per UNION ALL SELECT * FROM al)
        |SELECT event_type, n_a, n_b,
        |  CAST(ABS(n_a - n_b) * 1000000 // (n_a + n_b) AS BIGINT) AS delta_ppm,
        |  CAST((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) AS BIGINT)
        |    AS chi2_scaled
        |FROM uni ORDER BY event_type""".stripMargin,

    "q358_peak_window" ->
      """WITH b AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 300000000 AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT event_type, b, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY b
        |      RANGE BETWEEN 11 PRECEDING AND CURRENT ROW) AS win
        |  FROM b),
        |agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |    CAST(SUM(n) AS BIGINT) AS total_events,
        |    CAST(MAX(win) AS BIGINT) AS peak_events
        |  FROM sl GROUP BY 1),
        |sel AS (
        |  SELECT sl.event_type, MIN(sl.b) AS pb
        |  FROM sl JOIN agg ON sl.event_type = agg.event_type
        |    AND sl.win = agg.peak_events
        |  GROUP BY 1)
        |SELECT agg.event_type, n_buckets, total_events, peak_events,
        |  CAST((sel.pb - 11) * 300000000 AS BIGINT) AS peak_window_start_us
        |FROM agg JOIN sel ON agg.event_type = sel.event_type
        |ORDER BY agg.event_type""".stripMargin,

    "q359_sla_latency" ->
      """WITH lat AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(datediff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS lat
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |g AS (SELECT prio, lat, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM lat GROUP BY 1, 2),
        |cum AS (
        |  SELECT a.prio, a.lat, a.cnt,
        |    CAST(COALESCE(SUM(b.cnt), 0) AS BIGINT) AS before
        |  FROM g a LEFT JOIN g b ON b.prio = a.prio AND b.lat < a.lat
        |  GROUP BY 1, 2, 3),
        |tot AS (SELECT prio, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |ks AS (SELECT CAST(k.k AS BIGINT) AS k
        |       FROM UNNEST([50, 90, 99]) AS k(k)),
        |picked AS (
        |  SELECT tot.prio, tot.n, ks.k, cum.lat
        |  FROM tot CROSS JOIN ks JOIN cum ON cum.prio = tot.prio
        |    AND (tot.n * ks.k + 99) // 100 > cum.before
        |    AND (tot.n * ks.k + 99) // 100 <= cum.before + cum.cnt)
        |SELECT prio, CAST(MAX(n) AS BIGINT) AS n_lines,
        |  CAST(MAX(CASE WHEN k = 50 THEN lat END) AS BIGINT) AS p50_days,
        |  CAST(MAX(CASE WHEN k = 90 THEN lat END) AS BIGINT) AS p90_days,
        |  CAST(MAX(CASE WHEN k = 99 THEN lat END) AS BIGINT) AS p99_days
        |FROM picked GROUP BY prio ORDER BY prio""".stripMargin,

    "q360_cardinality_qerror" ->
      """WITH st AS (
        |  SELECT
        |    (SELECT COUNT(*) FROM nation) AS n_rows,
        |    (SELECT COUNT(DISTINCT n_nationkey) FROM nation) AS n_ndv,
        |    (SELECT COUNT(*) FROM customer) AS c_rows,
        |    (SELECT COUNT(DISTINCT c_nationkey) FROM customer) AS c_nk_ndv,
        |    (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS c_ck_ndv,
        |    (SELECT COUNT(*) FROM orders) AS o_rows,
        |    (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS o_ck_ndv,
        |    (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS o_ok_ndv,
        |    (SELECT COUNT(*) FROM lineitem) AS l_rows,
        |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS l_ok_ndv),
        |est AS (
        |  SELECT *,
        |    CAST(CAST(n_rows AS HUGEINT) * c_rows
        |      // GREATEST(n_ndv, c_nk_ndv) AS BIGINT) AS est1
        |  FROM st),
        |est2 AS (
        |  SELECT *,
        |    CAST(CAST(est1 AS HUGEINT) * o_rows
        |      // GREATEST(c_ck_ndv, o_ck_ndv) AS BIGINT) AS est2
        |  FROM est),
        |est3 AS (
        |  SELECT *,
        |    CAST(CAST(est2 AS HUGEINT) * l_rows
        |      // GREATEST(o_ok_ndv, l_ok_ndv) AS BIGINT) AS est3
        |  FROM est2),
        |act AS (
        |  SELECT
        |    (SELECT COUNT(*) FROM nation JOIN customer
        |       ON n_nationkey = c_nationkey) AS act1,
        |    (SELECT COUNT(*) FROM customer JOIN orders
        |       ON c_custkey = o_custkey) AS act2,
        |    (SELECT COUNT(*) FROM orders JOIN lineitem
        |       ON o_orderkey = l_orderkey) AS act3),
        |u AS (
        |  SELECT 's1_nation_customer' AS step, est1 AS est_rows, act1 AS act
        |  FROM est3 CROSS JOIN act
        |  UNION ALL SELECT 's2_join_orders', est2, act2 FROM est3 CROSS JOIN act
        |  UNION ALL SELECT 's3_join_lineitem', est3, act3 FROM est3 CROSS JOIN act)
        |SELECT step, CAST(est_rows AS BIGINT) AS est_rows,
        |  CAST(act AS BIGINT) AS actual_rows,
        |  CAST(GREATEST(est_rows, act) * 1000000
        |    // GREATEST(LEAST(est_rows, act), 1) AS BIGINT) AS q_error_ppm
        |FROM u ORDER BY step""".stripMargin,

    "q361_zonemap_skip" ->
      """WITH mx AS (SELECT MAX(doc_id) AS mi, MAX(n_chars) AS mn FROM documents),
        |filed AS (
        |  SELECT n_chars,
        |    doc_id * 32 // (mi + 1) AS f_row,
        |    n_chars * 32 // (mn + 1) AS f_clu
        |  FROM documents CROSS JOIN mx),
        |z AS (
        |  SELECT 'a_insertion_order' AS layout, f_row AS fid,
        |    MIN(n_chars) AS zmin, CAST(COUNT(*) AS BIGINT) AS rows_
        |  FROM filed GROUP BY 2
        |  UNION ALL
        |  SELECT 'b_value_clustered', f_clu, MIN(n_chars),
        |    CAST(COUNT(*) AS BIGINT)
        |  FROM filed GROUP BY 2),
        |ts AS (SELECT CAST(t.t * 100 AS BIGINT) AS t
        |       FROM UNNEST(generate_series(1, 5)) AS t(t)),
        |matching AS (
        |  SELECT ts.t, CAST(COUNT(*) AS BIGINT) AS n_match
        |  FROM documents CROSS JOIN ts WHERE n_chars < ts.t GROUP BY 1),
        |sw AS (
        |  SELECT layout, ts.t,
        |    CAST(COUNT(*) AS BIGINT) AS files_total,
        |    CAST(SUM(CASE WHEN zmin >= ts.t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS files_skipped,
        |    CAST(SUM(CASE WHEN zmin < ts.t THEN rows_ ELSE 0 END) AS BIGINT)
        |      AS rows_scanned
        |  FROM z CROSS JOIN ts GROUP BY 1, 2)
        |SELECT sw.layout, sw.t AS t, files_total, files_skipped, rows_scanned,
        |  CAST(COALESCE(n_match, 0) AS BIGINT) AS rows_matching,
        |  CAST(rows_scanned * 1000000
        |    // GREATEST(COALESCE(n_match, 0), 1) AS BIGINT)
        |    AS scan_amplification_ppm
        |FROM sw LEFT JOIN matching ON sw.t = matching.t
        |ORDER BY layout, t""".stripMargin,

    "q362_sigma_dims" ->
      """WITH q AS (
        |  SELECT vec_id, g.j - 1 AS dim,
        |    CAST(floor(v[g.j] * 1000 + 0.5) AS BIGINT) AS qv
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |    UNNEST(generate_series(1, len(v))) AS g(j)),
        |st AS (
        |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(qv) AS BIGINT) AS sq,
        |    CAST(SUM(qv * qv) AS BIGINT) AS sqq
        |  FROM q GROUP BY 1),
        |flags AS (
        |  SELECT q.vec_id,
        |    CASE WHEN CAST(q.qv * st.n - st.sq AS HUGEINT)
        |        * (q.qv * st.n - st.sq) >
        |      4 * (CAST(st.n AS HUGEINT) * st.sqq
        |        - CAST(st.sq AS HUGEINT) * st.sq)
        |      THEN 1 ELSE 0 END AS is_out
        |  FROM q JOIN st USING (dim)),
        |census AS (
        |  SELECT vec_id, CAST(SUM(is_out) AS BIGINT) AS k
        |  FROM flags GROUP BY 1)
        |SELECT k AS n_outlier_dims, CAST(COUNT(*) AS BIGINT) AS n_vectors
        |FROM census GROUP BY 1 ORDER BY 1""".stripMargin,

    "q364_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS dd,
        |          CAST(SUM(n) AS BIGINT) AS tt
        |        FROM daily GROUP BY 1),
        |su AS (
        |  SELECT d.event_type, d.day, t.dd, t.tt,
        |    SUM(d.n * t.dd - t.tt) OVER (PARTITION BY d.event_type
        |      ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS p
        |  FROM daily d JOIN tot t ON d.event_type = t.event_type),
        |cs AS (
        |  SELECT event_type, day, dd, tt,
        |    p - MIN(LEAST(p, 0)) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM su),
        |agg AS (
        |  SELECT event_type, CAST(MAX(dd) AS BIGINT) AS n_days,
        |    CAST(MAX(tt) AS BIGINT) AS total_events,
        |    CAST(MAX(cusum) AS BIGINT) AS max_cusum,
        |    CAST(SUM(CASE WHEN cusum > 4 * tt THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_alarm_days
        |  FROM cs GROUP BY 1),
        |fst AS (
        |  SELECT event_type, MIN(day) AS first_alarm_day
        |  FROM cs WHERE cusum > 4 * tt GROUP BY 1)
        |SELECT agg.event_type, n_days, total_events, max_cusum, n_alarm_days,
        |  fst.first_alarm_day
        |FROM agg LEFT JOIN fst ON agg.event_type = fst.event_type
        |ORDER BY agg.event_type""".stripMargin,

    "q365_readability" ->
      """WITH f AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sents,
        |    CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT)
        |      AS words,
        |    CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT)
        |      AS vgroups
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(words) AS BIGINT) AS words,
        |  CAST(SUM(sents) AS BIGINT) AS sentences,
        |  CAST(SUM(vgroups) AS BIGINT) AS vowel_groups,
        |  CAST(SUM(words) * 1000000 // GREATEST(SUM(sents), 1) AS BIGINT)
        |    AS words_per_sentence_ppm,
        |  CAST(SUM(vgroups) * 1000000 // GREATEST(SUM(words), 1) AS BIGINT)
        |    AS vgroups_per_word_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q366_conformal" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vu,
        |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 5
        |      AS arm
        |  FROM events),
        |cal AS (SELECT event_type, vu FROM ev WHERE arm < 2),
        |tst AS (SELECT event_type, vu FROM ev WHERE arm >= 2),
        |nc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal
        |       FROM cal GROUP BY 1),
        |medr AS (
        |  SELECT event_type, vu, row_number() OVER
        |    (PARTITION BY event_type ORDER BY vu) AS rn
        |  FROM cal),
        |med AS (
        |  SELECT m.event_type, m.vu AS med_u FROM medr m JOIN nc
        |    USING (event_type) WHERE m.rn = (n_cal + 1) // 2),
        |res AS (
        |  SELECT c.event_type, ABS(c.vu - med.med_u) AS r
        |  FROM cal c JOIN med USING (event_type)),
        |qr AS (
        |  SELECT event_type, r, row_number() OVER
        |    (PARTITION BY event_type ORDER BY r) AS rn
        |  FROM res),
        |qh AS (
        |  SELECT q.event_type, q.r AS qhat_u FROM qr q JOIN nc
        |    USING (event_type)
        |  WHERE q.rn = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal)),
        |tv AS (
        |  SELECT t.event_type, CAST(COUNT(*) AS BIGINT) AS n_test,
        |    CAST(MAX(med.med_u) AS BIGINT) AS med_u,
        |    CAST(MAX(qh.qhat_u) AS BIGINT) AS qhat_u,
        |    CAST(SUM(CASE WHEN ABS(t.vu - med.med_u) <= qh.qhat_u
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        |  FROM tst t JOIN med USING (event_type) JOIN qh USING (event_type)
        |  GROUP BY 1)
        |SELECT tv.event_type, nc.n_cal, n_test, med_u, qhat_u, n_covered,
        |  CAST(n_covered * 1000000 // n_test AS BIGINT) AS coverage_ppm
        |FROM tv JOIN nc USING (event_type) ORDER BY tv.event_type""".stripMargin,

    "q367_rrf_fusion" ->
      """WITH c AS (
        |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |a AS (SELECT q AS aq FROM c ORDER BY vec_id LIMIT 1),
        |sc AS (
        |  SELECT c.vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      j -> c.q[j] * a.aq[j])) AS BIGINT) AS dot,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      j -> (c.q[j] - a.aq[j]) * (c.q[j] - a.aq[j]))) AS BIGINT) AS l2
        |  FROM c, a),
        |tc AS (SELECT vec_id, dot FROM sc ORDER BY dot DESC, vec_id LIMIT 32),
        |tl AS (SELECT vec_id, l2 FROM sc ORDER BY l2 ASC, vec_id LIMIT 32),
        |ra AS (
        |  SELECT a1.vec_id, CAST(1 + COUNT(a2.vec_id) AS BIGINT) AS rank_cos
        |  FROM tc a1 LEFT JOIN tc a2 ON a2.dot > a1.dot
        |    OR (a2.dot = a1.dot AND a2.vec_id < a1.vec_id)
        |  GROUP BY 1),
        |rb AS (
        |  SELECT b1.vec_id, CAST(1 + COUNT(b2.vec_id) AS BIGINT) AS rank_l2
        |  FROM tl b1 LEFT JOIN tl b2 ON b2.l2 < b1.l2
        |    OR (b2.l2 = b1.l2 AND b2.vec_id < b1.vec_id)
        |  GROUP BY 1),
        |fu AS (
        |  SELECT COALESCE(ra.vec_id, rb.vec_id) AS vec_id,
        |    CAST(COALESCE(rank_cos, 33) AS BIGINT) AS rank_cos,
        |    CAST(COALESCE(rank_l2, 33) AS BIGINT) AS rank_l2
        |  FROM ra FULL OUTER JOIN rb ON ra.vec_id = rb.vec_id)
        |SELECT vec_id, rank_cos, rank_l2,
        |  CAST(1000000000 // (60 + rank_cos)
        |    + 1000000000 // (60 + rank_l2) AS BIGINT) AS rrf_score
        |FROM fu ORDER BY rrf_score DESC, vec_id LIMIT 10""".stripMargin,

    "q368_trimmed_mean" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |n AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1),
        |r AS (
        |  SELECT o.prio, o.c, row_number() OVER
        |    (PARTITION BY o.prio ORDER BY o.c, o.o_orderkey) AS rn
        |  FROM o),
        |agg AS (
        |  SELECT r.prio, MAX(n.n) AS n_orders,
        |    CAST(SUM(c) AS BIGINT) AS sum_all,
        |    CAST(SUM(CASE WHEN rn > (n.n + 19) // 20
        |      AND rn <= (19 * n.n) // 20 THEN c ELSE 0 END) AS BIGINT)
        |      AS sum_mid,
        |    CAST(SUM(CASE WHEN rn > (n.n + 19) // 20
        |      AND rn <= (19 * n.n) // 20 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_mid
        |  FROM r JOIN n USING (prio) GROUP BY 1)
        |SELECT prio, CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(sum_all // n_orders AS BIGINT) AS mean_cents,
        |  n_mid AS n_kept,
        |  CAST(sum_mid // n_mid AS BIGINT) AS trimmed_mean_cents,
        |  CAST(ABS(sum_all // n_orders - sum_mid // n_mid) AS BIGINT)
        |    AS tail_leverage_cents
        |FROM agg ORDER BY prio""".stripMargin,

    "q369_holding_times" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS to_type,
        |    lead(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) - us AS dwell_us
        |  FROM ev)
        |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions,
        |  CAST(SUM(dwell_us) // COUNT(*) AS BIGINT) AS mean_dwell_us,
        |  CAST(MAX(dwell_us) AS BIGINT) AS max_dwell_us,
        |  CAST(SUM(CASE WHEN dwell_us = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_instant
        |FROM tr WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q370_ks_statistic" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |vals AS (SELECT DISTINCT n_chars FROM g),
        |pairs AS (
        |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |atv AS (
        |  SELECT p.sa, p.sb, p.na, p.nb, v.n_chars,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars <= v.n_chars), 0) AS fa,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars <= v.n_chars), 0) AS fb
        |  FROM pairs p CROSS JOIN vals v)
        |SELECT sa AS source_a, sb AS source_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(MAX(ABS(fa * nb - fb * na)) AS BIGINT) AS d_scaled,
        |  CAST(MAX(ABS(fa * nb - fb * na)) * 1000000 // (na * nb) AS BIGINT)
        |    AS ks_ppm
        |FROM atv GROUP BY sa, sb, na, nb ORDER BY 1, 2""".stripMargin,

    "q371_mannwhitney" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |terms AS (
        |  SELECT p.sa, p.sb, p.na, p.nb,
        |    a.cnt * (2 * COALESCE((SELECT SUM(cnt) FROM g b
        |        WHERE b.source = p.sb AND b.n_chars < a.n_chars), 0)
        |      + COALESCE((SELECT SUM(cnt) FROM g b2
        |        WHERE b2.source = p.sb AND b2.n_chars = a.n_chars), 0))
        |      AS u2part
        |  FROM pairs p JOIN g a ON a.source = p.sa)
        |SELECT sa AS source_a, sb AS source_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(SUM(u2part) AS BIGINT) AS u2_a,
        |  CAST(CASE WHEN SUM(u2part) - na * nb >= 0
        |    THEN (SUM(u2part) - na * nb) * 1000000 // (na * nb)
        |    ELSE -((na * nb - SUM(u2part)) * 1000000 // (na * nb))
        |    END AS BIGINT) AS cliffs_delta_ppm
        |FROM terms GROUP BY sa, sb, na, nb ORDER BY 1, 2""".stripMargin,

    "q372_kruskal_wallis" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |gv AS (SELECT n_chars, CAST(SUM(cnt) AS BIGINT) AS c_all
        |  FROM g GROUP BY 1),
        |cum AS (
        |  SELECT v.n_chars, v.c_all,
        |    COALESCE((SELECT SUM(w.c_all) FROM gv w
        |      WHERE w.n_chars < v.n_chars), 0) AS cumlt
        |  FROM gv v),
        |ntot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS ntot FROM g),
        |r2 AS (
        |  SELECT g.source, CAST(SUM(g.cnt) AS BIGINT) AS n_docs,
        |    CAST(SUM(g.cnt * (2 * c.cumlt + c.c_all + 1)) AS BIGINT) AS r2
        |  FROM g JOIN cum c ON c.n_chars = g.n_chars GROUP BY 1)
        |SELECT source, n_docs, r2 AS rank2_sum,
        |  CAST(r2 * 1000 // (2 * n_docs) AS BIGINT) AS mean_rank_milli,
        |  CAST(r2 * 1000 // (2 * n_docs) - (ntot + 1) * 500 AS BIGINT)
        |    AS delta_milli
        |FROM r2, ntot ORDER BY source""".stripMargin,

    "q373_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |sst AS (
        |  SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.n > a.n THEN 1
        |      WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND a.day < b.day
        |  GROUP BY 1),
        |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ndays
        |  FROM daily GROUP BY 1),
        |ties AS (
        |  SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tiesum
        |  FROM (SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS t
        |    FROM daily GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT nd.event_type, nd.ndays AS n_days, sst.s AS s_stat,
        |  CAST(nd.ndays * (nd.ndays - 1) * (2 * nd.ndays + 5) - ties.tiesum
        |    AS BIGINT) AS var18_num,
        |  CAST(CASE WHEN sst.s >= 0
        |    THEN sst.s * 2000000 // (nd.ndays * (nd.ndays - 1))
        |    ELSE -((-sst.s) * 2000000 // (nd.ndays * (nd.ndays - 1)))
        |    END AS BIGINT) AS tau_ppm
        |FROM nd JOIN sst ON sst.event_type = nd.event_type
        |JOIN ties ON ties.event_type = nd.event_type
        |ORDER BY 1""".stripMargin,

    "q374_hilbert_layout" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT event_id, CAST(user_id % 256 AS BIGINT) AS u8,
         |    CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 256
         |      AS BIGINT) AS d8
         |  FROM events),
         |cells AS (SELECT DISTINCT u8, d8 FROM base),
         |hil AS (
         |  SELECT u8, d8, u8 AS x, d8 AS y, CAST(0 AS BIGINT) AS h, 7 AS i
         |  FROM cells
         |  UNION ALL
         |  SELECT u8, d8,
         |    CASE WHEN (y & (1 << i)) = 0
         |      THEN (CASE WHEN (x & (1 << i)) > 0 THEN 255 - y ELSE y END)
         |      ELSE x END,
         |    CASE WHEN (y & (1 << i)) = 0
         |      THEN (CASE WHEN (x & (1 << i)) > 0 THEN 255 - x ELSE x END)
         |      ELSE y END,
         |    h + (CAST(1 AS BIGINT) << (2 * i)) *
         |      xor(CASE WHEN (x & (1 << i)) > 0 THEN 3 ELSE 0 END,
         |          CASE WHEN (y & (1 << i)) > 0 THEN 1 ELSE 0 END),
         |    i - 1
         |  FROM hil WHERE i >= 0),
         |hidx AS (SELECT u8, d8, h FROM hil WHERE i = -1),
         |keyed AS (
         |  SELECT b.u8, b.d8, hi.h // 32 AS f_h,
         |    (${Curation.zorderSql("b.u8", "b.d8", "//")}) // 32 AS f_z,
         |    b.event_id * 2048 // (SELECT MAX(event_id) + 1 FROM base) AS f_r
         |  FROM base b JOIN hidx hi ON hi.u8 = b.u8 AND hi.d8 = b.d8),
         |zones AS (
         |  SELECT 'a_hilbert' AS layout, f_h AS fid, MIN(u8) AS lu,
         |    MAX(u8) AS hu, MIN(d8) AS ld, MAX(d8) AS hd,
         |    CAST(COUNT(*) AS BIGINT) AS nrows
         |  FROM keyed GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'b_zorder', f_z, MIN(u8), MAX(u8), MIN(d8), MAX(d8),
         |    CAST(COUNT(*) AS BIGINT)
         |  FROM keyed GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'c_row_order', f_r, MIN(u8), MAX(u8), MIN(d8), MAX(d8),
         |    CAST(COUNT(*) AS BIGINT)
         |  FROM keyed GROUP BY 1, 2),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_match FROM base
         |  WHERE u8 BETWEEN $BoxULo AND $BoxUHi
         |    AND d8 BETWEEN $BoxDLo AND $BoxDHi)
         |SELECT layout, CAST(COUNT(*) AS BIGINT) AS files_total,
         |  CAST(SUM(CASE WHEN lu <= $BoxUHi AND hu >= $BoxULo
         |    AND ld <= $BoxDHi AND hd >= $BoxDLo THEN 1 ELSE 0 END)
         |    AS BIGINT) AS files_box,
         |  CAST(SUM(CASE WHEN lu <= $BoxUHi AND hu >= $BoxULo
         |    AND ld <= $BoxDHi AND hd >= $BoxDLo THEN nrows ELSE 0 END)
         |    AS BIGINT) AS rows_scanned,
         |  CAST(SUM(nrows) AS BIGINT) AS rows_total,
         |  m.n_match AS rows_matching,
         |  CAST(SUM(CASE WHEN lu <= $BoxUHi AND hu >= $BoxULo
         |    AND ld <= $BoxDHi AND hd >= $BoxDLo THEN nrows ELSE 0 END)
         |    * 1000000 // GREATEST(m.n_match, 1) AS BIGINT)
         |    AS scan_amplification_ppm
         |FROM zones, m GROUP BY layout, m.n_match
         |ORDER BY layout""".stripMargin,

    "q375_wasserstein" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |vals AS (SELECT DISTINCT n_chars FROM g),
        |gaps AS (
        |  SELECT v.n_chars,
        |    (SELECT MIN(w.n_chars) FROM vals w WHERE w.n_chars > v.n_chars)
        |      - v.n_chars AS gap
        |  FROM vals v),
        |pairs AS (
        |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |atv AS (
        |  SELECT p.sa, p.sb, p.na, p.nb, gp.gap,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars <= gp.n_chars), 0) AS fa,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars <= gp.n_chars), 0) AS fb
        |  FROM pairs p CROSS JOIN gaps gp WHERE gp.gap IS NOT NULL)
        |SELECT sa AS source_a, sb AS source_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(SUM(ABS(fa * nb - fb * na) * gap) AS BIGINT) AS w1_scaled,
        |  CAST(SUM(ABS(fa * nb - fb * na) * gap) * 1000 // (na * nb)
        |    AS BIGINT) AS w1_milli
        |FROM atv GROUP BY sa, sb, na, nb ORDER BY 1, 2""".stripMargin,

    "q376_cramer_von_mises" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |gv AS (SELECT n_chars, CAST(SUM(cnt) AS BIGINT) AS c_all
        |  FROM g GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |atv AS (
        |  SELECT p.sa, p.sb, p.na, p.nb,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars = v.n_chars), 0)
        |    + COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars = v.n_chars), 0) AS w,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars <= v.n_chars), 0) AS fa,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars <= v.n_chars), 0) AS fb
        |  FROM pairs p CROSS JOIN gv v)
        |SELECT sa AS source_a, sb AS source_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(SUM(CAST(w AS HUGEINT) * (fa * nb - fb * na)
        |      * (fa * nb - fb * na)) * 1000000
        |    // (CAST(na + nb AS HUGEINT) * (na + nb) * na * nb)
        |    AS BIGINT) AS cvm_ppm
        |FROM atv GROUP BY sa, sb, na, nb ORDER BY 1, 2""".stripMargin,

    "q480_anderson_darling" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |gv AS (SELECT n_chars FROM g GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |atv AS (
        |  SELECT p.sa, p.sb, p.na, p.nb,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars = v.n_chars), 0) AS ca,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars = v.n_chars), 0) AS cb,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars <= v.n_chars), 0) AS fa,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars <= v.n_chars), 0) AS fb
        |  FROM pairs p CROSS JOIN gv v),
        |terms AS (
        |  SELECT sa, sb, na, nb,
        |    (CAST(ca + cb AS HUGEINT)
        |      * (nb * (2 * fa - ca) - na * (2 * fb - cb))
        |      * (nb * (2 * fa - ca) - na * (2 * fb - cb)) * 1000000)
        |      // (((2 * fa - ca) + (2 * fb - cb))
        |        * ((na + nb) * 2 - ((2 * fa - ca) + (2 * fb - cb)))) AS term
        |  FROM atv WHERE ca + cb > 0)
        |SELECT sa AS source_a, sb AS source_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_grid,
        |  CAST(SUM(term) // (na * nb) AS BIGINT) AS ad_ppm
        |FROM terms GROUP BY sa, sb, na, nb ORDER BY 1, 2""".stripMargin,

    "q481_jonckheere_trend" ->
      """WITH g AS (
        |  SELECT o.o_orderpriority AS prio,
        |    CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
        |      AS delay,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT prio, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |pairs AS (
        |  SELECT a.prio AS pa, a.n AS na, b.prio AS pb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.prio < b.prio),
        |terms AS (
        |  SELECT p.pa, p.pb, p.na, p.nb,
        |    b.cnt * (2 * COALESCE((SELECT SUM(cnt) FROM g a
        |        WHERE a.prio = p.pa AND a.delay < b.delay), 0)
        |      + COALESCE((SELECT SUM(cnt) FROM g a2
        |        WHERE a2.prio = p.pa AND a2.delay = b.delay), 0)) AS u2part
        |  FROM pairs p JOIN g b ON b.prio = p.pb)
        |SELECT pa AS prio_a, pb AS prio_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(SUM(u2part) AS BIGINT) AS u2_ab,
        |  CAST(CAST(SUM(u2part) AS HUGEINT) * 1000000 // (2 * na * nb)
        |    AS BIGINT) AS trend_ppm
        |FROM terms GROUP BY pa, pb, na, nb ORDER BY 1, 2""".stripMargin,

    "q377_kendall_comove" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |pd AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, a.day,
        |    a.n AS xa, b.n AS xb
        |  FROM daily a JOIN daily b
        |    ON a.event_type < b.event_type AND a.day = b.day),
        |sw AS (
        |  SELECT p.ta, p.tb,
        |    CAST(SIGN(q.xa - p.xa) * SIGN(q.xb - p.xb) AS BIGINT) AS sg
        |  FROM pd p JOIN pd q
        |    ON q.ta = p.ta AND q.tb = p.tb AND p.day < q.day),
        |nsh AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM pd GROUP BY 1, 2)
        |SELECT s.ta AS type_a, s.tb AS type_b, nsh.nd AS n_days,
        |  CAST(SUM(CASE WHEN s.sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS concordant,
        |  CAST(SUM(CASE WHEN s.sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS discordant,
        |  CAST(CASE WHEN SUM(CASE WHEN s.sg = 1 THEN 1 ELSE 0 END)
        |      - SUM(CASE WHEN s.sg = -1 THEN 1 ELSE 0 END) >= 0
        |    THEN (SUM(CASE WHEN s.sg = 1 THEN 1 ELSE 0 END)
        |      - SUM(CASE WHEN s.sg = -1 THEN 1 ELSE 0 END)) * 2000000
        |      // GREATEST(nsh.nd * (nsh.nd - 1), 1)
        |    ELSE -((SUM(CASE WHEN s.sg = -1 THEN 1 ELSE 0 END)
        |      - SUM(CASE WHEN s.sg = 1 THEN 1 ELSE 0 END)) * 2000000
        |      // GREATEST(nsh.nd * (nsh.nd - 1), 1))
        |    END AS BIGINT) AS tau_ppm
        |FROM sw s JOIN nsh ON nsh.ta = s.ta AND nsh.tb = s.tb
        |GROUP BY s.ta, s.tb, nsh.nd ORDER BY 1, 2""".stripMargin,

    "q378_runs_test" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ndays
        |  FROM daily GROUP BY 1),
        |grid AS (SELECT event_type, n AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM daily GROUP BY 1, 2),
        |cum AS (
        |  SELECT g.event_type, g.v, g.c,
        |    COALESCE((SELECT SUM(w.c) FROM grid w
        |      WHERE w.event_type = g.event_type AND w.v < g.v), 0) AS cumlt
        |  FROM grid g),
        |med AS (
        |  SELECT c.event_type, c.v AS med
        |  FROM cum c JOIN nd ON nd.event_type = c.event_type
        |  WHERE c.cumlt < (nd.ndays + 1) // 2
        |    AND (nd.ndays + 1) // 2 <= c.cumlt + c.c),
        |flagged AS (
        |  SELECT d.event_type, d.day,
        |    CASE WHEN d.n > m.med THEN 1 ELSE 0 END AS hi
        |  FROM daily d JOIN med m ON m.event_type = d.event_type),
        |steps AS (
        |  SELECT f.event_type,
        |    CAST(SUM(CASE WHEN f.hi <> g.hi THEN 1 ELSE 0 END) AS BIGINT)
        |      AS chg
        |  FROM flagged f JOIN flagged g
        |    ON g.event_type = f.event_type
        |    AND g.day = (SELECT MIN(h.day) FROM flagged h
        |      WHERE h.event_type = f.event_type AND h.day > f.day)
        |  GROUP BY 1),
        |ones AS (
        |  SELECT event_type, CAST(SUM(hi) AS BIGINT) AS n1,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM flagged GROUP BY 1)
        |SELECT o.event_type, o.n AS n_days, o.n1 AS n_above,
        |  o.n - o.n1 AS n_below, s.chg + 1 AS runs,
        |  CAST((o.n + 2 * o.n1 * (o.n - o.n1)) * 1000 // o.n AS BIGINT)
        |    AS e_runs_milli,
        |  CAST(2 * o.n1 * (o.n - o.n1) * (2 * o.n1 * (o.n - o.n1) - o.n)
        |    AS BIGINT) AS var_num
        |FROM ones o JOIN steps s ON s.event_type = o.event_type
        |ORDER BY 1""".stripMargin,

    "q379_fano_burstiness" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(x) AS BIGINT) AS sum_n,
        |  CAST(SUM(x * x) AS BIGINT) AS sum_sq,
        |  CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
        |    AS var_num,
        |  CAST((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) * 1000000
        |    // ((COUNT(*) - 1) * SUM(x)) AS BIGINT) AS fano_ppm
        |FROM daily GROUP BY 1 ORDER BY 1""".stripMargin,

    "q380_energy_distance" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |vals AS (SELECT DISTINCT n_chars FROM g),
        |gaps AS (
        |  SELECT v.n_chars,
        |    (SELECT MIN(w.n_chars) FROM vals w WHERE w.n_chars > v.n_chars)
        |      - v.n_chars AS gap
        |  FROM vals v),
        |pairs AS (
        |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |atv AS (
        |  SELECT p.sa, p.sb, p.na, p.nb, gp.gap,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars <= gp.n_chars), 0) AS fa,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars <= gp.n_chars), 0) AS fb
        |  FROM pairs p CROSS JOIN gaps gp WHERE gp.gap IS NOT NULL)
        |SELECT sa AS source_a, sb AS source_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(SUM(CAST(fa * nb - fb * na AS HUGEINT)
        |      * (fa * nb - fb * na) * gap) * 1000000
        |    // (CAST(na AS HUGEINT) * na * nb * nb) AS BIGINT)
        |    AS int_sq_ppm,
        |  CAST(SUM(CAST(fa * nb - fb * na AS HUGEINT)
        |      * (fa * nb - fb * na) * gap) * 2000000
        |    // (CAST(na AS HUGEINT) * na * nb * nb) AS BIGINT)
        |    AS energy_ppm
        |FROM atv GROUP BY sa, sb, na, nb ORDER BY 1, 2""".stripMargin,

    "q381_turning_points" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ndays
        |  FROM daily GROUP BY 1),
        |inter AS (
        |  SELECT d.event_type, d.n AS x,
        |    (SELECT e.n FROM daily e WHERE e.event_type = d.event_type
        |      AND e.day = (SELECT MIN(f.day) FROM daily f
        |        WHERE f.event_type = d.event_type AND f.day > d.day)) AS xn,
        |    (SELECT e.n FROM daily e WHERE e.event_type = d.event_type
        |      AND e.day = (SELECT MAX(f.day) FROM daily f
        |        WHERE f.event_type = d.event_type AND f.day < d.day)) AS xp
        |  FROM daily d),
        |tp AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL
        |      AND x > xp AND x > xn THEN 1 ELSE 0 END) AS BIGINT) AS peaks,
        |    CAST(SUM(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL
        |      AND x < xp AND x < xn THEN 1 ELSE 0 END) AS BIGINT) AS troughs
        |  FROM inter GROUP BY 1)
        |SELECT nd.event_type, nd.ndays AS n_days,
        |  CAST(COALESCE(tp.peaks, 0) AS BIGINT) AS n_peaks,
        |  CAST(COALESCE(tp.troughs, 0) AS BIGINT) AS n_troughs,
        |  CAST(COALESCE(tp.peaks, 0) + COALESCE(tp.troughs, 0) AS BIGINT)
        |    AS n_turning,
        |  CAST(CASE WHEN nd.ndays >= 3 THEN 2000 * (nd.ndays - 2) // 3
        |    ELSE 0 END AS BIGINT) AS e_tp_milli,
        |  CAST(CASE WHEN nd.ndays >= 3 THEN 16 * nd.ndays - 29
        |    ELSE 0 END AS BIGINT) AS var90_num
        |FROM nd LEFT JOIN tp ON tp.event_type = nd.event_type
        |ORDER BY 1""".stripMargin,

    "q382_blomqvist_beta" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |pd AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, a.day,
        |    a.n AS xa, b.n AS xb
        |  FROM daily a JOIN daily b
        |    ON a.event_type < b.event_type AND a.day = b.day),
        |nd AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM pd GROUP BY 1, 2),
        |rk AS (
        |  SELECT ta, tb, day, xa, xb,
        |    row_number() OVER (PARTITION BY ta, tb ORDER BY xa, day) AS ra,
        |    row_number() OVER (PARTITION BY ta, tb ORDER BY xb, day) AS rb
        |  FROM pd),
        |ma AS (SELECT r.ta, r.tb, r.xa AS ma FROM rk r
        |  JOIN nd ON nd.ta = r.ta AND nd.tb = r.tb
        |  WHERE r.ra = (nd.nd + 1) // 2),
        |mb AS (SELECT r.ta, r.tb, r.xb AS mb FROM rk r
        |  JOIN nd ON nd.ta = r.ta AND nd.tb = r.tb
        |  WHERE r.rb = (nd.nd + 1) // 2),
        |q AS (
        |  SELECT p.ta, p.tb, CAST(COUNT(*) AS BIGINT) AS ndays,
        |    CAST(SUM(CASE WHEN p.xa > ma.ma AND p.xb > mb.mb
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pp,
        |    CAST(SUM(CASE WHEN p.xa < ma.ma AND p.xb < mb.mb
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_mm,
        |    CAST(SUM(CASE WHEN p.xa > ma.ma AND p.xb < mb.mb
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pm,
        |    CAST(SUM(CASE WHEN p.xa < ma.ma AND p.xb > mb.mb
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_mp
        |  FROM pd p JOIN ma ON ma.ta = p.ta AND ma.tb = p.tb
        |  JOIN mb ON mb.ta = p.ta AND mb.tb = p.tb
        |  GROUP BY 1, 2)
        |SELECT ta AS type_a, tb AS type_b, ndays AS n_days,
        |  n_pp, n_mm, n_pm, n_mp,
        |  ndays - n_pp - n_mm - n_pm - n_mp AS n_ties,
        |  CAST(CASE WHEN n_pp + n_mm - n_pm - n_mp >= 0
        |    THEN (n_pp + n_mm - n_pm - n_mp) * 1000000
        |      // GREATEST(n_pp + n_mm + n_pm + n_mp, 1)
        |    ELSE -((n_pm + n_mp - n_pp - n_mm) * 1000000
        |      // GREATEST(n_pp + n_mm + n_pm + n_mp, 1))
        |    END AS BIGINT) AS beta_ppm
        |FROM q ORDER BY 1, 2""".stripMargin,

    "q383_record_days" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |pri AS (
        |  SELECT d.event_type, d.day, d.n,
        |    (SELECT MAX(e.n) FROM daily e WHERE e.event_type = d.event_type
        |      AND e.day < d.day) AS pmax,
        |    (SELECT MIN(e.n) FROM daily e WHERE e.event_type = d.event_type
        |      AND e.day < d.day) AS pmin
        |  FROM daily d),
        |rec AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ndays,
        |    CAST(SUM(CASE WHEN pmax IS NULL OR n > pmax THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nh,
        |    CAST(SUM(CASE WHEN pmin IS NULL OR n < pmin THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nl
        |  FROM pri GROUP BY 1),
        |ser AS (SELECT UNNEST(generate_series(1,
        |  (SELECT MAX(ndays) FROM rec))) AS i),
        |harm AS (
        |  SELECT r.event_type, CAST(SUM(1000000 // s.i) AS BIGINT) AS h_ppm
        |  FROM rec r JOIN ser s ON s.i <= r.ndays GROUP BY 1)
        |SELECT r.event_type, r.ndays AS n_days, r.nh AS n_record_high,
        |  r.nl AS n_record_low, h.h_ppm AS expected_ppm
        |FROM rec r JOIN harm h ON h.event_type = r.event_type
        |ORDER BY 1""".stripMargin,

    "q384_bowley_skew" ->
      """WITH gr AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM gr GROUP BY 1),
        |cum AS (
        |  SELECT o.source, o.n_chars AS v, o.c,
        |    COALESCE((SELECT SUM(w.c) FROM gr w
        |      WHERE w.source = o.source AND w.n_chars < o.n_chars), 0)
        |      AS cumlt
        |  FROM gr o),
        |q1c AS (SELECT c.source, c.v AS q1 FROM cum c
        |  JOIN tot ON tot.source = c.source
        |  WHERE c.cumlt < (tot.n + 3) // 4
        |    AND (tot.n + 3) // 4 <= c.cumlt + c.c),
        |q2c AS (SELECT c.source, c.v AS q2 FROM cum c
        |  JOIN tot ON tot.source = c.source
        |  WHERE c.cumlt < (tot.n + 1) // 2
        |    AND (tot.n + 1) // 2 <= c.cumlt + c.c),
        |q3c AS (SELECT c.source, c.v AS q3 FROM cum c
        |  JOIN tot ON tot.source = c.source
        |  WHERE c.cumlt < (3 * tot.n + 3) // 4
        |    AND (3 * tot.n + 3) // 4 <= c.cumlt + c.c)
        |SELECT t.source, t.n AS n_docs,
        |  CAST(q1c.q1 AS BIGINT) AS q1, CAST(q2c.q2 AS BIGINT) AS q2,
        |  CAST(q3c.q3 AS BIGINT) AS q3,
        |  CAST(q3c.q3 - q1c.q1 AS BIGINT) AS iqr,
        |  CAST(CASE WHEN q3c.q3 + q1c.q1 - 2 * q2c.q2 >= 0
        |    THEN (q3c.q3 + q1c.q1 - 2 * q2c.q2) * 1000
        |      // GREATEST(q3c.q3 - q1c.q1, 1)
        |    ELSE -((2 * q2c.q2 - q3c.q3 - q1c.q1) * 1000
        |      // GREATEST(q3c.q3 - q1c.q1, 1))
        |    END AS BIGINT) AS bowley_milli
        |FROM tot t JOIN q1c ON q1c.source = t.source
        |JOIN q2c ON q2c.source = t.source
        |JOIN q3c ON q3c.source = t.source
        |ORDER BY 1""".stripMargin,

    "q385_lag_slope" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        |  FROM daily GROUP BY 1),
        |grid AS (
        |  SELECT s.event_type,
        |    CAST(UNNEST(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM span s),
        |gx AS (
        |  SELECT g.event_type, g.day, COALESCE(d.n, 0) AS x
        |  FROM grid g LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day),
        |ks AS (SELECT * FROM (VALUES (1), (2), (3), (7)) AS t(k)),
        |pr AS (
        |  SELECT a.event_type, ks.k, a.x, b.x AS y
        |  FROM gx a CROSS JOIN ks JOIN gx b
        |    ON b.event_type = a.event_type AND b.day = a.day + ks.k)
        |SELECT event_type, CAST(k AS BIGINT) AS lag_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * y) - SUM(x) * SUM(y)
        |    AS BIGINT) AS cov_num,
        |  CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * x) - SUM(x) * SUM(x)
        |    AS BIGINT) AS var_num,
        |  CAST(CASE WHEN COUNT(*) * SUM(CAST(x AS HUGEINT) * y)
        |      - SUM(x) * SUM(y) >= 0
        |    THEN (COUNT(*) * SUM(CAST(x AS HUGEINT) * y) - SUM(x) * SUM(y))
        |      * 1000000 // GREATEST(COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
        |      - SUM(x) * SUM(x), 1)
        |    ELSE -((SUM(x) * SUM(y) - COUNT(*) * SUM(CAST(x AS HUGEINT) * y))
        |      * 1000000 // GREATEST(COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
        |      - SUM(x) * SUM(x), 1))
        |    END AS BIGINT) AS slope_ppm
        |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q386_gk_percentile_audit" ->
      """WITH g AS (
        |  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
        |cum AS (
        |  SELECT o.n_chars AS v, o.c,
        |    COALESCE((SELECT SUM(w.c) FROM g w
        |      WHERE w.n_chars < o.n_chars), 0) AS cumlt
        |  FROM g o),
        |p AS (SELECT * FROM (VALUES (25), (50), (75), (90), (99)) AS t(pct))
        |SELECT CAST(p.pct AS BIGINT) AS percentile_pct, tot.n AS n_docs,
        |  CAST(c2.v AS BIGINT) AS exact_q,
        |  CAST(tot.n // 1000 + 2 AS BIGINT) AS rank_err_bound,
        |  TRUE AS within_bound
        |FROM p CROSS JOIN tot JOIN cum c2
        |  ON c2.cumlt < (p.pct * tot.n + 99) // 100
        |  AND (p.pct * tot.n + 99) // 100 <= c2.cumlt + c2.c
        |ORDER BY 1""".stripMargin,

    "q387_wilcoxon_signed" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |df AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    a.n - b.n AS dd
        |  FROM daily a JOIN daily b
        |    ON a.event_type < b.event_type AND a.day = b.day),
        |zs AS (SELECT ta, tb,
        |  CAST(SUM(CASE WHEN dd = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz
        |  FROM df GROUP BY 1, 2),
        |grid AS (
        |  SELECT ta, tb, ABS(dd) AS ad, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS posc
        |  FROM df WHERE dd <> 0 GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT g.ta, g.tb, g.ad, g.c, g.posc,
        |    COALESCE((SELECT SUM(w.c) FROM grid w
        |      WHERE w.ta = g.ta AND w.tb = g.tb AND w.ad < g.ad), 0)
        |      AS cumlt
        |  FROM grid g),
        |agg AS (
        |  SELECT ta, tb, CAST(SUM(c) AS BIGINT) AS nn,
        |    CAST(SUM(posc) AS BIGINT) AS np,
        |    CAST(SUM(posc * (2 * cumlt + c + 1)) AS BIGINT) AS w2,
        |    CAST(SUM(c * c * c - c) AS BIGINT) AS ties3
        |  FROM cum GROUP BY 1, 2)
        |SELECT a.ta AS type_a, a.tb AS type_b, a.nn AS n_nonzero,
        |  z.nz AS n_zero, a.np AS n_pos, a.nn - a.np AS n_neg,
        |  a.w2 AS w_plus_x2,
        |  CAST(a.nn * (a.nn + 1) // 2 AS BIGINT) AS e_w_x2,
        |  CAST(2 * a.nn * (a.nn + 1) * (2 * a.nn + 1) - a.ties3 AS BIGINT)
        |    AS var48_num
        |FROM agg a JOIN zs z ON z.ta = a.ta AND z.tb = a.tb
        |ORDER BY 1, 2""".stripMargin,

    "q388_mood_scale" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |vals AS (SELECT DISTINCT n_chars FROM g),
        |pairs AS (
        |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |atv AS (
        |  SELECT p.sa, p.sb, p.na, p.nb,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars = v.n_chars), 0) AS ca,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars = v.n_chars), 0) AS cb,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sa AND g.n_chars <= v.n_chars), 0) AS fa,
        |    COALESCE((SELECT SUM(cnt) FROM g
        |      WHERE g.source = p.sb AND g.n_chars <= v.n_chars), 0) AS fb
        |  FROM pairs p CROSS JOIN vals v),
        |dv AS (
        |  SELECT sa, sb, na, nb, ca, cb,
        |    2 * (fa - ca + fb - cb) + ca + cb + 1 - (na + nb + 1) AS dev
        |  FROM atv)
        |SELECT sa AS source_a, sb AS source_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(SUM(CAST(ca AS HUGEINT) * dev * dev) AS BIGINT) AS m4_a,
        |  CAST(SUM(CAST(cb AS HUGEINT) * dev * dev) AS BIGINT) AS m4_b,
        |  CAST(SUM(CAST(ca AS HUGEINT) * dev * dev) * 3000000
        |    // GREATEST(CAST(na AS HUGEINT)
        |      * ((na + nb) * (na + nb) - 1), 1) AS BIGINT) AS scale_a_ppm,
        |  CAST(SUM(CAST(cb AS HUGEINT) * dev * dev) * 3000000
        |    // GREATEST(CAST(nb AS HUGEINT)
        |      * ((na + nb) * (na + nb) - 1), 1) AS BIGINT) AS scale_b_ppm
        |FROM dv GROUP BY sa, sb, na, nb ORDER BY 1, 2""".stripMargin,

    "q389_mood_median" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |gv AS (SELECT n_chars, CAST(SUM(c) AS BIGINT) AS call
        |  FROM g GROUP BY 1),
        |tot AS (SELECT CAST(SUM(call) AS BIGINT) AS nn FROM gv),
        |cum AS (
        |  SELECT o.n_chars AS v, o.call,
        |    COALESCE((SELECT SUM(w.call) FROM gv w
        |      WHERE w.n_chars < o.n_chars), 0) AS cumlt
        |  FROM gv o),
        |med AS (
        |  SELECT c.v AS med, t.nn FROM cum c CROSS JOIN tot t
        |  WHERE c.cumlt < (t.nn + 1) // 2
        |    AND (t.nn + 1) // 2 <= c.cumlt + c.call),
        |cls AS (
        |  SELECT g.source, m.nn, CAST(SUM(g.c) AS BIGINT) AS n_src,
        |    CAST(SUM(CASE WHEN g.n_chars > m.med THEN g.c ELSE 0 END)
        |      AS BIGINT) AS above,
        |    CAST(SUM(CASE WHEN g.n_chars = m.med THEN g.c ELSE 0 END)
        |      AS BIGINT) AS at_med
        |  FROM g CROSS JOIN med m GROUP BY 1, 2),
        |atot AS (SELECT CAST(SUM(above) AS BIGINT) AS aa FROM cls)
        |SELECT c.source, c.n_src AS n_docs, c.above AS n_above,
        |  c.at_med AS n_at, c.n_src - c.above - c.at_med AS n_below,
        |  CAST(c.n_src * a.aa * 1000 // c.nn AS BIGINT)
        |    AS expected_above_milli,
        |  CAST(CAST(c.above * c.nn - c.n_src * a.aa AS HUGEINT)
        |    * (c.above * c.nn - c.n_src * a.aa) * 1000000
        |    // GREATEST(CAST(c.n_src AS HUGEINT) * a.aa * c.nn, 1)
        |    AS BIGINT) AS chi2_above_ppm
        |FROM cls c CROSS JOIN atot a ORDER BY 1""".stripMargin,

    "q390_l_moments" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT o.source, o.n_chars AS v, o.c,
        |    COALESCE((SELECT SUM(w.c) FROM g w
        |      WHERE w.source = o.source AND w.n_chars < o.n_chars), 0)
        |      AS cumlt
        |  FROM g o),
        |t AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
        |    SUM(CAST(c AS HUGEINT) * v) AS s0,
        |    SUM(CAST(v AS HUGEINT) * (c * cumlt + c * (c - 1) // 2)) AS s1,
        |    SUM(CAST(v AS HUGEINT) *
        |      (CAST(cumlt + c - 2 AS HUGEINT) * (cumlt + c - 1)
        |        * (cumlt + c) // 3
        |      - CAST(cumlt - 2 AS HUGEINT) * (cumlt - 1) * cumlt // 3))
        |      AS s2
        |  FROM cum GROUP BY 1)
        |SELECT source, n AS n_docs,
        |  CAST(s0 * 1000 // n AS BIGINT) AS l1_milli,
        |  CAST(2 * s1 - (n - 1) * s0 AS BIGINT) AS l2_scaled,
        |  CAST(6 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0
        |    AS BIGINT) AS l3_scaled,
        |  CAST((2 * s1 - (n - 1) * s0) * 1000000
        |    // GREATEST((n - 1) * s0, 1) AS BIGINT) AS lcv_ppm,
        |  CAST(CASE WHEN 6 * s2 - 6 * (n - 2) * s1
        |      + (n - 1) * (n - 2) * s0 >= 0
        |    THEN (6 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0)
        |      * 1000 // GREATEST((2 * s1 - (n - 1) * s0) * (n - 2), 1)
        |    ELSE -((6 * (n - 2) * s1 - 6 * s2 - (n - 1) * (n - 2) * s0)
        |      * 1000 // GREATEST((2 * s1 - (n - 1) * s0) * (n - 2), 1))
        |    END AS BIGINT) AS t3_milli
        |FROM t ORDER BY 1""".stripMargin,

    "q391_rouge1_anchors" ->
      """WITH doc AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |tokc AS (
        |  SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT doc_id, source, UNNEST(t) AS tok FROM doc)
        |  GROUP BY 1, 2, 3),
        |lens AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS l
        |  FROM doc),
        |a1 AS (SELECT source, MIN(doc_id) AS a1 FROM lens GROUP BY 1),
        |a2 AS (SELECT l.source, MIN(l.doc_id) AS a2 FROM lens l
        |  JOIN a1 ON a1.source = l.source AND l.doc_id > a1.a1 GROUP BY 1),
        |a3 AS (SELECT l.source, MIN(l.doc_id) AS a3 FROM lens l
        |  JOIN a2 ON a2.source = l.source AND l.doc_id > a2.a2 GROUP BY 1),
        |anch AS (
        |  SELECT source, 1 AS anchor_rank, a1 AS a_doc FROM a1
        |  UNION ALL SELECT source, 2, a2 FROM a2
        |  UNION ALL SELECT source, 3, a3 FROM a3),
        |alen AS (SELECT an.source, an.anchor_rank, an.a_doc, l.l AS alen
        |  FROM anch an JOIN lens l ON l.doc_id = an.a_doc),
        |denom AS (
        |  SELECT al.source, al.anchor_rank, al.a_doc, al.alen,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(l.l) AS BIGINT) AS sum_len
        |  FROM alen al JOIN lens l
        |    ON l.source = al.source AND l.doc_id <> al.a_doc
        |  GROUP BY 1, 2, 3, 4),
        |atok AS (SELECT an.source, an.anchor_rank, an.a_doc, t.tok, t.cnt
        |  FROM anch an JOIN tokc t ON t.doc_id = an.a_doc),
        |ov AS (
        |  SELECT a.source, a.anchor_rank,
        |    CAST(SUM(LEAST(t.cnt, a.cnt)) AS BIGINT) AS sum_ov
        |  FROM atok a JOIN tokc t
        |    ON t.source = a.source AND t.tok = a.tok AND t.doc_id <> a.a_doc
        |  GROUP BY 1, 2)
        |SELECT d.source, CAST(d.anchor_rank AS BIGINT) AS anchor_rank,
        |  CAST(d.a_doc AS BIGINT) AS anchor_doc_id, d.alen AS anchor_len,
        |  d.n_docs, CAST(COALESCE(o.sum_ov, 0) AS BIGINT) AS sum_overlap,
        |  d.sum_len AS sum_doc_len,
        |  CAST(COALESCE(o.sum_ov, 0) * 1000000 // GREATEST(d.sum_len, 1)
        |    AS BIGINT) AS prec_ppm,
        |  CAST(COALESCE(o.sum_ov, 0) * 1000000
        |    // GREATEST(d.n_docs * d.alen, 1) AS BIGINT) AS recall_ppm
        |FROM denom d LEFT JOIN ov o
        |  ON o.source = d.source AND o.anchor_rank = d.anchor_rank
        |ORDER BY 1, 2""".stripMargin,

    "q392_l_diversity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      + 100000) // 100000 AS bal_band,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM customer GROUP BY 1, 2, 3),
        |qi AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS l,
        |    CAST(SUM(cnt) AS BIGINT) AS ksz, CAST(MAX(cnt) AS BIGINT) AS r1
        |  FROM cls GROUP BY 1, 2),
        |gstats AS (
        |  SELECT CAST(MIN(l) AS BIGINT) AS min_l,
        |    CAST(SUM(CASE WHEN l < 3 THEN ksz ELSE 0 END) AS BIGINT)
        |      AS n_below_l3,
        |    CAST(SUM(CASE WHEN r1 > 2 * (ksz - r1) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_rec22_fail
        |  FROM qi),
        |bands AS (SELECT * FROM (VALUES ('a_l1'), ('b_l2'), ('c_l3_4'),
        |  ('d_l5_plus')) AS t(band)),
        |got AS (
        |  SELECT CASE WHEN l = 1 THEN 'a_l1' WHEN l = 2 THEN 'b_l2'
        |    WHEN l <= 4 THEN 'c_l3_4' ELSE 'd_l5_plus' END AS band,
        |    CAST(COUNT(*) AS BIGINT) AS ncl, CAST(SUM(ksz) AS BIGINT) AS ncu
        |  FROM qi GROUP BY 1)
        |SELECT b.band, CAST(COALESCE(g.ncl, 0) AS BIGINT) AS n_classes,
        |  CAST(COALESCE(g.ncu, 0) AS BIGINT) AS n_customers,
        |  gl.min_l, gl.n_below_l3, gl.n_rec22_fail
        |FROM bands b LEFT JOIN got g USING (band) CROSS JOIN gstats gl
        |ORDER BY 1""".stripMargin,

    "q393_t_closeness" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      + 100000) // 100000 AS bal_band,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM customer GROUP BY 1, 2, 3),
        |qi AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(SUM(cnt) AS BIGINT) AS ksz
        |  FROM cls GROUP BY 1, 2),
        |gb AS (SELECT bal_band, CAST(SUM(cnt) AS BIGINT) AS gcnt
        |  FROM cls GROUP BY 1),
        |tot AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS nn FROM gb),
        |grid AS (
        |  SELECT q.c_nationkey, q.c_mktsegment, q.ksz, t.nn,
        |    ABS(COALESCE(c.cnt, 0) * t.nn - g.gcnt * q.ksz) AS term
        |  FROM qi q CROSS JOIN gb g CROSS JOIN tot t
        |  LEFT JOIN cls c ON c.c_nationkey = q.c_nationkey
        |    AND c.c_mktsegment = q.c_mktsegment AND c.bal_band = g.bal_band)
        |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
        |  CAST(ksz AS BIGINT) AS n_customers,
        |  CAST(SUM(term) AS BIGINT) AS tvd_scaled,
        |  CAST(SUM(term) * 1000 // (2 * ksz * nn) AS BIGINT) AS tvd_milli
        |FROM grid GROUP BY c_nationkey, c_mktsegment, ksz, nn
        |ORDER BY 1, 2""".stripMargin,

    "q394_generalization_ladder" ->
      """WITH base AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      + 100000) // 100000 AS bal_band
        |  FROM customer),
        |l0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ksz FROM base
        |  GROUP BY c_nationkey, c_mktsegment, bal_band),
        |l1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ksz FROM base
        |  GROUP BY c_nationkey, c_mktsegment),
        |l2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ksz FROM base
        |  GROUP BY c_nationkey),
        |l3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ksz FROM base)
        |SELECT 'l0_nation_segment_band' AS level,
        |  CAST(3 AS BIGINT) AS n_qi_attrs,
        |  CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(MIN(ksz) AS BIGINT) AS min_k,
        |  CAST(SUM(CASE WHEN ksz < 5 THEN ksz ELSE 0 END) AS BIGINT)
        |    AS n_suppressed_k5
        |FROM l0
        |UNION ALL SELECT 'l1_nation_segment', CAST(2 AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(MIN(ksz) AS BIGINT),
        |  CAST(SUM(CASE WHEN ksz < 5 THEN ksz ELSE 0 END) AS BIGINT)
        |FROM l1
        |UNION ALL SELECT 'l2_nation', CAST(1 AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(MIN(ksz) AS BIGINT),
        |  CAST(SUM(CASE WHEN ksz < 5 THEN ksz ELSE 0 END) AS BIGINT)
        |FROM l2
        |UNION ALL SELECT 'l3_top', CAST(0 AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(MIN(ksz) AS BIGINT),
        |  CAST(SUM(CASE WHEN ksz < 5 THEN ksz ELSE 0 END) AS BIGINT)
        |FROM l3
        |ORDER BY 1""".stripMargin,

    "q401_overlap_depth" ->
      """WITH ev AS (
        |  SELECT event_id,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_k,
        |    CAST(user_id % 256 AS BIGINT) AS user_k
        |  FROM events),
        |mx AS (SELECT MAX(event_id) AS mi FROM ev),
        |filed AS (
        |  SELECT e.event_id * 32 // (m.mi + 1) AS fid, e.day_k, e.user_k
        |  FROM ev e CROSS JOIN mx m),
        |zd AS (SELECT fid, MIN(day_k) AS zmin, MAX(day_k) AS zmax
        |  FROM filed GROUP BY 1),
        |vd AS (SELECT DISTINCT day_k AS v FROM filed),
        |dd AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dep
        |  FROM vd JOIN zd ON v BETWEEN zmin AND zmax GROUP BY 1),
        |ad AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
        |    CAST(SUM(dep) AS BIGINT) AS sdep, CAST(MAX(dep) AS BIGINT) AS maxd
        |  FROM dd),
        |nfd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_files FROM zd),
        |zu AS (SELECT fid, MIN(user_k) AS zmin, MAX(user_k) AS zmax
        |  FROM filed GROUP BY 1),
        |vu AS (SELECT DISTINCT user_k AS v FROM filed),
        |du AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dep
        |  FROM vu JOIN zu ON v BETWEEN zmin AND zmax GROUP BY 1),
        |au AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
        |    CAST(SUM(dep) AS BIGINT) AS sdep, CAST(MAX(dep) AS BIGINT) AS maxd
        |  FROM du),
        |nfu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_files FROM zu)
        |SELECT 'a_event_day' AS candidate_key, nfd.n_files, ad.n_values,
        |  CAST(ad.sdep * 1000 // ad.n_values AS BIGINT) AS avg_depth_milli,
        |  ad.maxd AS max_depth
        |FROM ad CROSS JOIN nfd
        |UNION ALL
        |SELECT 'b_user_bucket', nfu.n_files, au.n_values,
        |  CAST(au.sdep * 1000 // au.n_values AS BIGINT), au.maxd
        |FROM au CROSS JOIN nfu
        |ORDER BY 1""".stripMargin,

    "q402_neyman_allocation" ->
      """WITH st AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY 1),
        |s2 AS (
        |  SELECT source, n, CAST(n * sxx - sx * sx AS BIGINT) AS var_num,
        |    CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT)
        |      AS ns
        |  FROM st),
        |tot AS (SELECT CAST(SUM(ns) AS BIGINT) AS tns,
        |    CAST(SUM(n) AS BIGINT) AS nn FROM s2)
        |SELECT source, n AS n_docs, var_num, ns AS n_times_sd,
        |  CAST(ns * 1000000 // GREATEST(tns, 1) AS BIGINT) AS neyman_ppm,
        |  CAST(n * 1000000 // nn AS BIGINT) AS proportional_ppm,
        |  CAST(ns * 1000 // GREATEST(tns, 1) AS BIGINT) AS n_alloc_of_1000
        |FROM s2 CROSS JOIN tot ORDER BY 1""".stripMargin,

    "q403_trigram_motifs" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events),
        |tri AS (SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tt FROM tri)
        |SELECT e1, e2, e3, cnt AS n_walks,
        |  CAST(cnt * 1000000 // tt AS BIGINT) AS share_ppm
        |FROM tri CROSS JOIN tot ORDER BY 1, 2, 3""".stripMargin,

    "q404_lag_percentiles" ->
      """WITH g AS (
        |  SELECT (CAST(l.l_shipdate AS DATE) - DATE '1970-01-05') // 7 AS wk,
        |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
        |      AS BIGINT) AS lag,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT wk, lag, c,
        |    CAST(SUM(c) OVER (PARTITION BY wk ORDER BY lag
        |      ROWS UNBOUNDED PRECEDING) - c AS BIGINT) AS cumlt,
        |    CAST(SUM(c) OVER (PARTITION BY wk) AS BIGINT) AS n
        |  FROM g)
        |SELECT CAST(wk AS BIGINT) AS week, CAST(MAX(n) AS BIGINT) AS n_lines,
        |  CAST(MAX(CASE WHEN cumlt < (n + 1) // 2
        |    AND (n + 1) // 2 <= cumlt + c THEN lag END) AS BIGINT) AS p50_days,
        |  CAST(MAX(CASE WHEN cumlt < (9 * n + 9) // 10
        |    AND (9 * n + 9) // 10 <= cumlt + c THEN lag END) AS BIGINT) AS p90_days,
        |  CAST(MAX(CASE WHEN cumlt < (19 * n + 19) // 20
        |    AND (19 * n + 19) // 20 <= cumlt + c THEN lag END) AS BIGINT) AS p95_days
        |FROM cum GROUP BY wk
        |ORDER BY 1""".stripMargin,

    "q405_order_backlog" ->
      """WITH op AS (
        |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
        |    AS BIGINT) AS m, CAST(COUNT(*) AS BIGINT) AS op
        |  FROM orders GROUP BY 1),
        |cls AS (
        |  SELECT CAST(year(closed) * 12 + month(closed) - 1 AS BIGINT) AS m,
        |    CAST(COUNT(*) AS BIGINT) AS cl
        |  FROM (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS closed
        |        FROM lineitem GROUP BY 1)
        |  GROUP BY 1),
        |months AS (SELECT m FROM op UNION SELECT m FROM cls),
        |grid AS (
        |  SELECT months.m, COALESCE(op.op, 0) AS op, COALESCE(cls.cl, 0) AS cl
        |  FROM months LEFT JOIN op USING (m) LEFT JOIN cls USING (m))
        |SELECT g.m AS month_idx, CAST(g.op AS BIGINT) AS n_opened,
        |  CAST(g.cl AS BIGINT) AS n_closed,
        |  CAST((SELECT SUM(h.op - h.cl) FROM grid h WHERE h.m <= g.m)
        |    AS BIGINT) AS backlog
        |FROM grid g ORDER BY 1""".stripMargin,

    "q501_dixon_extreme_day" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    MAX(c) AS mx, MIN(c) AS mn
        |  FROM daily GROUP BY 1),
        |snd AS (
        |  SELECT d.event_type,
        |    MAX(CASE WHEN d.c < st.mx THEN d.c END) AS snd,
        |    SUM(CASE WHEN d.c = st.mx THEN 1 ELSE 0 END) AS n_at_max
        |  FROM daily d JOIN st ON st.event_type = d.event_type
        |  GROUP BY 1),
        |x AS (
        |  SELECT st.event_type, st.n_days, st.mx, st.mn,
        |    CASE WHEN snd.n_at_max >= 2 THEN st.mx
        |         ELSE COALESCE(snd.snd, st.mx) END AS x_nm1
        |  FROM st LEFT JOIN snd ON snd.event_type = st.event_type)
        |SELECT event_type, n_days,
        |  CAST(mx AS BIGINT) AS max_day_events,
        |  CAST(x_nm1 AS BIGINT) AS second_max,
        |  CAST(mn AS BIGINT) AS min_day_events,
        |  CAST((mx - x_nm1) * 1000
        |    // GREATEST(mx - mn, 1) AS BIGINT) AS q_milli
        |FROM x ORDER BY event_type""".stripMargin,

    "q498_burn_rate_alerts" ->
      """WITH err AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 60000000 AS m
        |  FROM events WHERE event_type = 'error'),
        |pm AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM err GROUP BY 1),
        |b AS (SELECT MIN(m) AS mn, MAX(m) AS mx,
        |    CAST(COUNT(*) AS BIGINT) AS total FROM err),
        |grid AS (
        |  SELECT CAST(g.m AS BIGINT) AS m, b.mx - b.mn + 1 AS nmin, b.total,
        |    COALESCE(pm.c, 0) AS c
        |  FROM b, UNNEST(generate_series(b.mn, b.mx)) g(m)
        |  LEFT JOIN pm ON pm.m = g.m),
        |f5 AS (
        |  SELECT m, SUM(c) OVER (ORDER BY m
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) * nmin * 10
        |    > 144 * total * 5 AS f
        |  FROM grid),
        |f60 AS (
        |  SELECT m, SUM(c) OVER (ORDER BY m
        |      ROWS BETWEEN 59 PRECEDING AND CURRENT ROW) * nmin * 10
        |    > 60 * total * 60 AS f
        |  FROM grid),
        |j AS (SELECT f5.m, f5.f AS a5, f60.f AS a60
        |  FROM f5 JOIN f60 ON f5.m = f60.m),
        |legs AS (
        |  SELECT 'a_5m_fast' AS alert_leg, CAST(COUNT(*) AS BIGINT)
        |      AS n_minutes,
        |    CAST(SUM(CASE WHEN a5 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |  FROM j
        |  UNION ALL
        |  SELECT 'b_60m_slow', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN a60 THEN 1 ELSE 0 END) AS BIGINT) FROM j
        |  UNION ALL
        |  SELECT 'c_page_and', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN a5 AND a60 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM j)
        |SELECT alert_leg, n_minutes, n_flagged,
        |  CAST(n_flagged * 1000000 // n_minutes AS BIGINT) AS noise_ppm
        |FROM legs ORDER BY alert_leg""".stripMargin,

    "q495_circuit_breaker" ->
      """WITH err AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 60000000 AS m
        |  FROM events WHERE event_type = 'error'),
        |pm AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM err GROUP BY 1),
        |b AS (SELECT MIN(m) AS mn, MAX(m) AS mx,
        |    CAST(COUNT(*) AS BIGINT) AS total FROM err),
        |grid AS (
        |  SELECT CAST(g.m AS BIGINT) AS m, b.mx - b.mn + 1 AS nmin, b.total,
        |    COALESCE(pm.c, 0) AS c
        |  FROM b, UNNEST(generate_series(b.mn, b.mx)) g(m)
        |  LEFT JOIN pm ON pm.m = g.m),
        |ts2 AS (SELECT CAST(g.t AS BIGINT) AS t FROM UNNEST([1, 2, 4]) g(t)),
        |fl AS (
        |  SELECT t, m, nmin,
        |    c * nmin > t * total AS above
        |  FROM grid CROSS JOIN ts2),
        |isl AS (
        |  SELECT t, m - ROW_NUMBER() OVER (PARTITION BY t ORDER BY m) AS i
        |  FROM fl WHERE above),
        |il AS (SELECT t, i, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2),
        |pt AS (
        |  SELECT t, SUM(len) AS n_above, CAST(COUNT(*) AS BIGINT) AS n_bursts,
        |    CAST(SUM(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_trips,
        |    CAST(MAX(len) AS BIGINT) AS longest_burst
        |  FROM il GROUP BY 1)
        |SELECT ts2.t AS threshold_x,
        |  CAST(b.mx - b.mn + 1 AS BIGINT) AS n_minutes,
        |  CAST(COALESCE(pt.n_above, 0) AS BIGINT) AS n_above,
        |  COALESCE(pt.n_bursts, 0) AS n_bursts,
        |  COALESCE(pt.n_trips, 0) AS n_trips,
        |  COALESCE(pt.longest_burst, 0) AS longest_burst
        |FROM ts2 CROSS JOIN b LEFT JOIN pt ON pt.t = ts2.t
        |ORDER BY threshold_x""".stripMargin,

    "q490_day_boundary_shift" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |a AS (SELECT event_type, us // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS ca
        |  FROM ev GROUP BY 1, 2),
        |b AS (SELECT event_type, (us + 28800000000) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM ev GROUP BY 1, 2),
        |j AS (
        |  SELECT COALESCE(a.event_type, b.event_type) AS event_type,
        |    COALESCE(a.day, b.day) AS day,
        |    COALESCE(a.ca, 0) AS ca, COALESCE(b.cb, 0) AS cb
        |  FROM a FULL OUTER JOIN b
        |    ON a.event_type = b.event_type AND a.day = b.day)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(CASE WHEN ca <> cb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_diverging,
        |  CAST(MAX(ABS(ca - cb)) AS BIGINT) AS max_abs_diff,
        |  CAST(SUM(ABS(ca - cb)) * 1000000 // (2 * SUM(ca)) AS BIGINT)
        |    AS shift_ppm
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q486_backlog_aging" ->
      """WITH cls AS (
        |  SELECT l_orderkey,
        |    CAST(year(closed) * 12 + month(closed) - 1 AS BIGINT) AS mc
        |  FROM (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS closed
        |        FROM lineitem GROUP BY 1)),
        |ords AS (
        |  SELECT o.o_orderkey,
        |    CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
        |      AS BIGINT) AS mo,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents,
        |    cls.mc
        |  FROM orders o LEFT JOIN cls ON cls.l_orderkey = o.o_orderkey),
        |hi AS (SELECT MAX(GREATEST(mo, COALESCE(mc, mo))) AS hi FROM ords),
        |cells AS (
        |  SELECT mo, COALESCE(mc, hi.hi + 1) AS mceff, hi.hi,
        |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM ords CROSS JOIN hi GROUP BY 1, 2, 3
        |  HAVING COALESCE(mc, hi.hi + 1) > mo),
        |expanded AS (
        |  SELECT c.mo, c.n, c.cents, CAST(g.m AS BIGINT) AS m
        |  FROM cells c, UNNEST(generate_series(c.mo, LEAST(c.mceff - 1,
        |    c.hi))) g(m))
        |SELECT m AS month_idx,
        |  CASE WHEN m = mo THEN 'a_0m' WHEN m - mo <= 3 THEN 'b_1_3m'
        |    WHEN m - mo <= 12 THEN 'c_4_12m' ELSE 'd_gt12m' END AS bucket,
        |  CAST(SUM(n) AS BIGINT) AS n_open,
        |  CAST(SUM(cents) AS BIGINT) AS open_cents
        |FROM expanded GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q487_sharded_percentile_bias" ->
      """WITH base AS (
        |  SELECT o.o_orderpriority AS prio,
        |    CAST(l.l_orderkey % 16 AS BIGINT) AS shard,
        |    CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
        |      AS delay
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |g AS (SELECT prio, shard, delay, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2, 3),
        |shx AS (
        |  SELECT prio, shard, delay, c,
        |    SUM(c) OVER (PARTITION BY prio, shard ORDER BY delay) AS cum,
        |    SUM(c) OVER (PARTITION BY prio, shard) AS n
        |  FROM g),
        |sh AS (
        |  SELECT prio, shard, MAX(n) AS n,
        |    MAX(CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
        |      THEN delay END) AS p50
        |  FROM shx GROUP BY 1, 2),
        |agg AS (
        |  SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_shards,
        |    CAST(SUM(p50) AS BIGINT) AS sum_p50,
        |    CAST(MAX(p50) AS BIGINT) AS max_p50,
        |    CAST(MIN(p50) AS BIGINT) AS min_p50
        |  FROM sh GROUP BY 1),
        |tm AS (SELECT prio, delay, CAST(SUM(c) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2),
        |trx AS (
        |  SELECT prio, delay, c,
        |    SUM(c) OVER (PARTITION BY prio ORDER BY delay) AS cum,
        |    SUM(c) OVER (PARTITION BY prio) AS n
        |  FROM tm),
        |tr AS (
        |  SELECT prio, MAX(n) AS n,
        |    MAX(CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
        |      THEN delay END) AS p50
        |  FROM trx GROUP BY 1)
        |SELECT tr.prio, CAST(tr.n AS BIGINT) AS n_lines,
        |  CAST(tr.p50 AS BIGINT) AS p50_true,
        |  a.n_shards,
        |  CAST(a.sum_p50 * 1000 // a.n_shards AS BIGINT) AS shard_mean_milli,
        |  CAST(a.sum_p50 * 1000 // a.n_shards - tr.p50 * 1000 AS BIGINT)
        |    AS bias_milli,
        |  CAST(GREATEST(a.max_p50 - tr.p50, tr.p50 - a.min_p50) AS BIGINT)
        |    AS worst_shard_dev
        |FROM tr JOIN agg a ON a.prio = tr.prio ORDER BY tr.prio""".stripMargin,

    "q406_leadlag_best" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        |  FROM daily GROUP BY 1),
        |grid AS (
        |  SELECT s.event_type,
        |    CAST(UNNEST(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM span s),
        |gx AS (
        |  SELECT g.event_type, g.day, COALESCE(d.n, 0) AS x
        |  FROM grid g LEFT JOIN daily d
        |    ON d.event_type = g.event_type AND d.day = g.day),
        |ks AS (SELECT * FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3))
        |  AS t(k)),
        |perk AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, ks.k,
        |    CAST(COUNT(*) AS BIGINT) AS m,
        |    COUNT(*) * SUM(CAST(a.x AS HUGEINT) * b.x)
        |      - SUM(CAST(a.x AS HUGEINT)) * SUM(CAST(b.x AS HUGEINT)) AS cov
        |  FROM gx a CROSS JOIN ks JOIN gx b
        |    ON b.event_type <> a.event_type AND b.day = a.day + ks.k
        |  GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT ta, tb, k, m, cov,
        |    row_number() OVER (PARTITION BY ta, tb
        |      ORDER BY ABS(cov) DESC, k ASC) AS rn
        |  FROM perk)
        |SELECT ta AS type_a, tb AS type_b,
        |  CAST(k AS BIGINT) AS best_lag_days, m AS n_pairs,
        |  CAST(cov AS BIGINT) AS cov_num, CAST(ABS(cov) AS BIGINT) AS abs_cov
        |FROM best WHERE rn = 1 ORDER BY 1, 2""".stripMargin,

    "q407_rendezvous_routing" ->
      """WITH lat AS (SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5),
        |  (6), (7), (8)) AS t(sh)),
        |ex AS (
        |  SELECT d.doc_id, l.sh,
        |    ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
        |      || CAST(l.sh AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM documents d CROSS JOIN lat l),
        |a8 AS (SELECT doc_id, sh AS s8 FROM (
        |    SELECT doc_id, sh, row_number() OVER
        |      (PARTITION BY doc_id ORDER BY h DESC, sh ASC) AS rn
        |    FROM ex WHERE sh <= 7) WHERE rn = 1),
        |a9 AS (SELECT doc_id, sh AS s9 FROM (
        |    SELECT doc_id, sh, row_number() OVER
        |      (PARTITION BY doc_id ORDER BY h DESC, sh ASC) AS rn
        |    FROM ex) WHERE rn = 1),
        |asg AS (SELECT a9.doc_id, a8.s8, a9.s9
        |  FROM a9 JOIN a8 USING (doc_id)),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM asg),
        |g9 AS (SELECT s9, CAST(COUNT(*) AS BIGINT) AS n9,
        |    CAST(SUM(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS moved_in
        |  FROM asg GROUP BY 1),
        |g8 AS (SELECT s8 AS s9, CAST(COUNT(*) AS BIGINT) AS n8
        |  FROM asg GROUP BY 1)
        |SELECT CAST(COALESCE(g9.s9, g8.s9) AS BIGINT) AS shard,
        |  CAST(COALESCE(g8.n8, 0) AS BIGINT) AS n_at_8_shards,
        |  CAST(COALESCE(g9.n9, 0) AS BIGINT) AS n_at_9_shards,
        |  CAST(COALESCE(g9.moved_in, 0) AS BIGINT) AS moved_in,
        |  CAST(COALESCE(g9.n9, 0) * 1000000 // tot.n AS BIGINT)
        |    AS share9_ppm
        |FROM g9 FULL JOIN g8 ON g8.s9 = g9.s9 CROSS JOIN tot
        |ORDER BY 1""".stripMargin,

    "q408_erasure_impact" ->
      """WITH doomed AS (SELECT o_orderkey FROM orders
        |  WHERE o_custkey % 23 = 0)
        |SELECT * FROM (
        |  SELECT 'a_customer' AS table_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows_total,
        |    CAST(SUM(CASE WHEN c_custkey % 23 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_rows_deleted,
        |    CAST(SUM(CASE WHEN c_custkey % 23 = 0 THEN 1 ELSE 0 END)
        |      * 1000000 // COUNT(*) AS BIGINT) AS share_ppm
        |  FROM customer
        |  UNION ALL
        |  SELECT 'b_orders', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN o_custkey % 23 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(SUM(CASE WHEN o_custkey % 23 = 0 THEN 1 ELSE 0 END)
        |      * 1000000 // COUNT(*) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'c_events', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN user_id % 23 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(SUM(CASE WHEN user_id % 23 = 0 THEN 1 ELSE 0 END)
        |      * 1000000 // COUNT(*) AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'd_lineitem', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(SUM(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      * 1000000 // COUNT(*) AS BIGINT)
        |  FROM lineitem l LEFT JOIN doomed d ON d.o_orderkey = l.l_orderkey
        |) ORDER BY 1""".stripMargin,

    "q409_postings_census" ->
      """WITH tk AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
        |    FROM documents)),
        |df0 AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM tk GROUP BY 1),
        |lat AS (SELECT CAST(1::BIGINT << g.i AS BIGINT) AS lo
        |  FROM UNNEST(generate_series(0, 33)) AS g(i)),
        |tot AS (SELECT CAST(SUM(df) AS BIGINT) AS tp,
        |  CAST(COUNT(*) AS BIGINT) AS nt FROM df0)
        |SELECT CAST(l.lo AS BIGINT) AS df_bucket_lo,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(d.df) AS BIGINT) AS n_postings,
        |  CAST(SUM(d.df) * 1000000 // tot.tp AS BIGINT)
        |    AS postings_share_ppm,
        |  CAST(COUNT(*) * 1000000 // tot.nt AS BIGINT) AS terms_share_ppm
        |FROM df0 d JOIN lat l ON d.df >= l.lo AND d.df < l.lo * 2
        |CROSS JOIN tot
        |GROUP BY l.lo, tot.tp, tot.nt ORDER BY 1""".stripMargin,

    "q410_trend_screen" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |sw AS (
        |  SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.n > a.n THEN 1
        |      WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND a.day < b.day
        |  GROUP BY 1),
        |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ndays
        |  FROM daily GROUP BY 1),
        |ties AS (
        |  SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tiesum
        |  FROM (SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS t
        |        FROM daily GROUP BY 1, 2)
        |  GROUP BY 1),
        |v AS (
        |  SELECT nd.event_type, nd.ndays, sw.s,
        |    nd.ndays * (nd.ndays - 1) * (2 * nd.ndays + 5) - ties.tiesum
        |      AS var18
        |  FROM nd JOIN sw ON sw.event_type = nd.event_type
        |  JOIN ties ON ties.event_type = nd.event_type)
        |SELECT event_type, ndays AS n_days, s AS s_stat,
        |  CAST(var18 AS BIGINT) AS var18_num,
        |  CAST(18 * s * s * 1000 // GREATEST(var18, 1) AS BIGINT)
        |    AS z2_milli,
        |  18 * s * s > 4 * var18 AS sig_2sigma,
        |  18 * s * s > 9 * var18 AS sig_3sigma
        |FROM v ORDER BY 1""".stripMargin,

    "q411_timesplit_ks" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
        |      THEN 'a' ELSE 'b' END AS half,
        |    CAST(floor(value) AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, half, CAST(SUM(c) AS BIGINT) AS n
        |  FROM g GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT event_type, v FROM g),
        |atv AS (
        |  SELECT vl.event_type, vl.v,
        |    COALESCE((SELECT SUM(c) FROM g
        |      WHERE g.event_type = vl.event_type AND g.half = 'a'
        |        AND g.v <= vl.v), 0) AS fa,
        |    COALESCE((SELECT SUM(c) FROM g
        |      WHERE g.event_type = vl.event_type AND g.half = 'b'
        |        AND g.v <= vl.v), 0) AS fb
        |  FROM vals vl),
        |ns AS (
        |  SELECT event_type,
        |    CAST(MAX(CASE WHEN half = 'a' THEN n END) AS BIGINT) AS na,
        |    CAST(MAX(CASE WHEN half = 'b' THEN n END) AS BIGINT) AS nb
        |  FROM tot GROUP BY 1)
        |SELECT a.event_type, ns.na AS n_first, ns.nb AS n_second,
        |  CAST(MAX(ABS(a.fa * ns.nb - a.fb * ns.na)) AS BIGINT) AS d_scaled,
        |  CAST(MAX(ABS(a.fa * ns.nb - a.fb * ns.na)) * 1000000
        |    // GREATEST(ns.na * ns.nb, 1) AS BIGINT) AS ks_ppm
        |FROM atv a JOIN ns ON ns.event_type = a.event_type
        |GROUP BY a.event_type, ns.na, ns.nb ORDER BY 1""".stripMargin,

    "q412_median_ci" ->
      """WITH g AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM g GROUP BY 1),
        |cum AS (
        |  SELECT o.source, o.n_chars AS v, o.c, t.n,
        |    (t.n + 1) // 2 AS k,
        |    CAST(FLOOR(SQRT(CAST(t.n AS DOUBLE))) AS BIGINT) AS r,
        |    COALESCE((SELECT SUM(w.c) FROM g w
        |      WHERE w.source = o.source AND w.n_chars < o.n_chars), 0)
        |      AS cumlt
        |  FROM g o JOIN tot t ON t.source = o.source),
        |med AS (SELECT source, v FROM cum
        |  WHERE cumlt < k AND k <= cumlt + c),
        |lo AS (SELECT source, v FROM cum
        |  WHERE cumlt < GREATEST(k - r, 1) AND GREATEST(k - r, 1) <= cumlt + c),
        |hi AS (SELECT source, v FROM cum
        |  WHERE cumlt < LEAST(k + r, n) AND LEAST(k + r, n) <= cumlt + c)
        |SELECT t.source, t.n AS n_docs,
        |  CAST(med.v AS BIGINT) AS median_chars,
        |  CAST(lo.v AS BIGINT) AS ci_lo, CAST(hi.v AS BIGINT) AS ci_hi,
        |  CAST(hi.v - lo.v AS BIGINT) AS ci_width
        |FROM tot t JOIN med ON med.source = t.source
        |JOIN lo ON lo.source = t.source JOIN hi ON hi.source = t.source
        |ORDER BY 1""".stripMargin,

    "q413_encoding_advisor" ->
      """WITH base AS (SELECT doc_id, source, lang FROM documents),
        |pairs AS (
        |  SELECT a.source AS sa, a.lang AS la, b.source AS sb, b.lang AS lb
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS nd_src,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS nd_lang
        |  FROM base),
        |ch AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
        |    CAST(SUM(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS chg_src,
        |    CAST(SUM(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS chg_lang
        |  FROM pairs)
        |SELECT 'a_source' AS column_name, st.nr AS n_rows,
        |  st.nd_src AS n_distinct,
        |  CAST(st.nd_src * 1000000 // st.nr AS BIGINT) AS distinct_ppm,
        |  ch.np AS n_adjacent_pairs, ch.chg_src AS n_change_points,
        |  CAST((ch.chg_src + 1) * 1000000 // st.nr AS BIGINT)
        |    AS rle_ratio_ppm
        |FROM st CROSS JOIN ch
        |UNION ALL
        |SELECT 'b_lang', st.nr, st.nd_lang,
        |  CAST(st.nd_lang * 1000000 // st.nr AS BIGINT),
        |  ch.np, ch.chg_lang,
        |  CAST((ch.chg_lang + 1) * 1000000 // st.nr AS BIGINT)
        |FROM st CROSS JOIN ch
        |ORDER BY 1""".stripMargin,

    "q414_kendall_w" ->
      """WITH raw AS (
        |  SELECT ((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS wd,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS tot
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT w.wd, e.event_type, CAST(COALESCE(r.tot, 0) AS BIGINT) AS tot
        |  FROM (SELECT DISTINCT wd FROM raw) w
        |  CROSS JOIN (SELECT DISTINCT event_type FROM raw) e
        |  LEFT JOIN raw r ON r.wd = w.wd AND r.event_type = e.event_type),
        |r2 AS (
        |  SELECT a.wd, a.event_type,
        |    CAST(2 * SUM(CASE WHEN b.tot < a.tot THEN 1 ELSE 0 END)
        |      + SUM(CASE WHEN b.tot = a.tot THEN 1 ELSE 0 END) + 1
        |      AS BIGINT) AS r2x
        |  FROM g a JOIN g b ON b.wd = a.wd GROUP BY 1, 2),
        |ranks AS (SELECT event_type, CAST(SUM(r2x) AS BIGINT) AS rsum2
        |  FROM r2 GROUP BY 1),
        |ties AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tsum FROM (
        |  SELECT wd, tot, CAST(COUNT(*) AS BIGINT) AS t FROM g
        |  GROUP BY 1, 2)),
        |mk AS (SELECT CAST(COUNT(DISTINCT wd) AS BIGINT) AS m,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM g),
        |s4 AS (SELECT CAST(SUM((rsum2 - mk.m * (mk.k + 1))
        |    * (rsum2 - mk.m * (mk.k + 1))) AS BIGINT) AS s4
        |  FROM ranks CROSS JOIN mk)
        |SELECT ranks.event_type, ranks.rsum2 AS rank_sum_x2,
        |  mk.m AS m_judges, mk.k AS k_items, s4.s4 AS s4_num,
        |  ties.tsum AS tie_sum,
        |  CAST(12 * s4.s4 * 1000000 // (4 * (mk.m * mk.m
        |    * (mk.k * mk.k * mk.k - mk.k) - mk.m * ties.tsum)) AS BIGINT)
        |    AS w_ppm
        |FROM ranks CROSS JOIN mk CROSS JOIN ties CROSS JOIN s4
        |ORDER BY 1""".stripMargin,

    "q415_winsorized_mean" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |n AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1),
        |rn AS (
        |  SELECT o.prio, o.c,
        |    row_number() OVER (PARTITION BY o.prio
        |      ORDER BY o.c, o.o_orderkey) AS rn,
        |    n.n, n.n // 20 AS gg
        |  FROM o JOIN n USING (prio)),
        |lohi AS (
        |  SELECT prio, MAX(CASE WHEN rn = gg + 1 THEN c END) AS lo,
        |    MAX(CASE WHEN rn = n - gg THEN c END) AS hi
        |  FROM rn GROUP BY 1),
        |agg AS (
        |  SELECT prio, CAST(MAX(n) AS BIGINT) AS n_orders,
        |    CAST(MAX(gg) AS BIGINT) AS g_clamped,
        |    CAST(SUM(c) AS BIGINT) AS sum_all,
        |    CAST(SUM(CASE WHEN rn > gg AND rn <= n - gg THEN c ELSE 0 END)
        |      AS BIGINT) AS sum_mid
        |  FROM rn GROUP BY 1)
        |SELECT a.prio, a.n_orders, a.g_clamped,
        |  CAST(l.lo AS BIGINT) AS lo_clamp_cents,
        |  CAST(l.hi AS BIGINT) AS hi_clamp_cents,
        |  CAST(a.sum_all // a.n_orders AS BIGINT) AS mean_cents,
        |  CAST((a.sum_mid + a.g_clamped * (l.lo + l.hi)) // a.n_orders
        |    AS BIGINT) AS winsorized_mean_cents,
        |  CAST(ABS(a.sum_all // a.n_orders - (a.sum_mid + a.g_clamped
        |    * (l.lo + l.hi)) // a.n_orders) AS BIGINT) AS clamp_delta_cents
        |FROM agg a JOIN lohi l USING (prio) ORDER BY 1""".stripMargin,

    "q425_dp_sensitivity" ->
      """WITH uc AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    user_id, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |byuser AS (
        |  SELECT event_type, user_id, MAX(c) AS u_linf, SUM(c) AS u_l1,
        |    COUNT(*) AS u_l0
        |  FROM uc GROUP BY 1, 2),
        |sens AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(MAX(u_linf) AS BIGINT) AS delta_inf,
        |    CAST(MAX(u_l1) AS BIGINT) AS delta_l1,
        |    CAST(MAX(u_l0) AS BIGINT) AS delta_l0
        |  FROM byuser GROUP BY 1),
        |cells AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    CAST(SUM(cell_n) AS BIGINT) AS total_events,
        |    CAST(MIN(cell_n) AS BIGINT) AS min_cell
        |  FROM (SELECT event_type, day, SUM(c) AS cell_n FROM uc
        |        GROUP BY 1, 2) GROUP BY 1)
        |SELECT s.event_type, s.n_users, c.n_cells, c.total_events,
        |  s.delta_inf, s.delta_l1, s.delta_l0,
        |  CAST(c.total_events // c.n_cells AS BIGINT) AS mean_cell,
        |  c.min_cell,
        |  CAST(s.delta_l1 * 1000000 // (c.total_events // c.n_cells)
        |    AS BIGINT) AS rel_err_eps1_ppm,
        |  CAST(s.delta_l1 * 500000 // (c.total_events // c.n_cells)
        |    AS BIGINT) AS rel_err_eps2_ppm,
        |  CAST(s.delta_l1 * 1000000 // c.min_cell AS BIGINT)
        |    AS worst_rel_err_eps1_ppm
        |FROM sens s JOIN cells c USING (event_type) ORDER BY 1""".stripMargin,

    "q431_design_effect" ->
      """WITH st AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY 1),
        |s2 AS (
        |  SELECT nh, sx, sxx,
        |    CAST((CAST(nh AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
        |      // nh AS BIGINT) AS ah,
        |    CAST(FLOOR(SQRT(CAST(nh * sxx - sx * sx AS DOUBLE))) AS BIGINT)
        |      AS ns
        |  FROM st),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(nh) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS s,
        |    CAST(SUM(sxx) AS BIGINT) AS ss,
        |    CAST(SUM(ah) AS BIGINT) AS v_prop_num,
        |    CAST(SUM(ns) AS BIGINT) AS sum_ns
        |  FROM s2)
        |SELECT n_strata, n AS n_total,
        |  CAST((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s) // n
        |    AS BIGINT) AS v_srs_num,
        |  v_prop_num,
        |  CAST(CAST(v_prop_num AS HUGEINT) * 1000000
        |    // ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s) // n)
        |    AS BIGINT) AS deff_prop_ppm,
        |  CAST(CAST(sum_ns AS HUGEINT) * sum_ns // n AS BIGINT) AS v_ney_num,
        |  CAST((CAST(sum_ns AS HUGEINT) * sum_ns // n) * 1000000
        |    // ((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s) // n)
        |    AS BIGINT) AS deff_ney_ppm
        |FROM tot""".stripMargin,

    "q432_sort_advisor" -> {
      val legs = for (lay <- Seq("day", "part", "supp");
                      f <- Seq("day", "part", "supp")) yield
        s"""SELECT '$lay' AS layout_key, '$f' AS filter_col,
           |  CAST(COUNT(*) AS BIGINT) AS files_total,
           |  CAST(SUM(CASE WHEN zmax < lo OR zmin >= hi THEN 1 ELSE 0 END)
           |    AS BIGINT) AS files_skipped,
           |  CAST(SUM(CASE WHEN zmax >= lo AND zmin < hi THEN nr ELSE 0 END)
           |    AS BIGINT) AS rows_scanned,
           |  CAST(SUM(hits) AS BIGINT) AS rows_matching,
           |  CAST(SUM(CASE WHEN zmax >= lo AND zmin < hi THEN nr ELSE 0 END)
           |    * 1000000 // GREATEST(SUM(hits), 1) AS BIGINT)
           |    AS scan_amplification_ppm
           |FROM (
           |  SELECT f_$lay AS fid, MIN(v_$f) AS zmin, MAX(v_$f) AS zmax,
           |    COUNT(*) AS nr, MAX(q_lo_$f) AS lo, MAX(q_hi_$f) AS hi,
           |    SUM(CASE WHEN v_$f >= q_lo_$f AND v_$f < q_hi_$f
           |        THEN 1 ELSE 0 END) AS hits
           |  FROM filed GROUP BY 1) z""".stripMargin
      """WITH li AS (
        |  SELECT epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS v_day,
        |    CAST(l_partkey AS BIGINT) AS v_part,
        |    CAST(l_suppkey AS BIGINT) AS v_supp
        |  FROM lineitem),
        |mx AS (
        |  SELECT MIN(v_day) AS lo_day, MAX(v_day) AS hi_day,
        |    MIN(v_part) AS lo_part, MAX(v_part) AS hi_part,
        |    MIN(v_supp) AS lo_supp, MAX(v_supp) AS hi_supp
        |  FROM li),
        |filed AS (
        |  SELECT v_day, v_part, v_supp,
        |    (v_day - lo_day) * 32 // (hi_day - lo_day + 1) AS f_day,
        |    (v_part - lo_part) * 32 // (hi_part - lo_part + 1) AS f_part,
        |    (v_supp - lo_supp) * 32 // (hi_supp - lo_supp + 1) AS f_supp,
        |    lo_day + (hi_day - lo_day + 1) * 2 // 5 AS q_lo_day,
        |    lo_day + (hi_day - lo_day + 1) * 3 // 5 AS q_hi_day,
        |    lo_part + (hi_part - lo_part + 1) * 2 // 5 AS q_lo_part,
        |    lo_part + (hi_part - lo_part + 1) * 3 // 5 AS q_hi_part,
        |    lo_supp + (hi_supp - lo_supp + 1) * 2 // 5 AS q_lo_supp,
        |    lo_supp + (hi_supp - lo_supp + 1) * 3 // 5 AS q_hi_supp
        |  FROM li CROSS JOIN mx)
        |""".stripMargin + legs.mkString("\nUNION ALL\n") +
        "\nORDER BY layout_key, filter_col"
    },

    "q433_selectivity_audit" ->
      """WITH o AS (
        |  SELECT o_orderpriority, o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day
        |  FROM orders),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS ndv_prio,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_cust,
        |    MIN(o_custkey) AS k0,
        |    MIN(cents) AS lo_c, MAX(cents) AS hi_c,
        |    MIN(day) AS lo_d, MAX(day) AS hi_d
        |  FROM o),
        |s2 AS (SELECT *, lo_c + (hi_c - lo_c + 1) // 4 AS t_c,
        |         lo_d + (hi_d - lo_d + 1) // 4 AS t_d FROM st),
        |a AS (
        |  SELECT
        |    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS a1,
        |    SUM(CASE WHEN o_custkey = s2.k0 THEN 1 ELSE 0 END) AS a2,
        |    SUM(CASE WHEN cents < s2.t_c THEN 1 ELSE 0 END) AS a3,
        |    SUM(CASE WHEN day < s2.t_d THEN 1 ELSE 0 END) AS a4
        |  FROM o CROSS JOIN s2),
        |legs AS (
        |  SELECT 'p1_eq_low_ndv' AS predicate, n // ndv_prio AS est_rows,
        |    a1 AS actual_rows FROM s2, a
        |  UNION ALL SELECT 'p2_eq_high_ndv', n // ndv_cust, a2 FROM s2, a
        |  UNION ALL SELECT 'p3_range_price',
        |    n * (t_c - lo_c) // (hi_c - lo_c + 1), a3 FROM s2, a
        |  UNION ALL SELECT 'p4_range_date',
        |    n * (t_d - lo_d) // (hi_d - lo_d + 1), a4 FROM s2, a)
        |SELECT predicate, CAST(est_rows AS BIGINT) AS est_rows,
        |  CAST(actual_rows AS BIGINT) AS actual_rows,
        |  CAST(GREATEST(est_rows, actual_rows) * 1000000
        |    // GREATEST(LEAST(est_rows, actual_rows), 1) AS BIGINT)
        |    AS q_error_ppm
        |FROM legs ORDER BY predicate""".stripMargin,

    "q436_histogram_selectivity" -> {
      val methods = Seq(1, 16, 256).map { bins =>
        val tag = f"b$bins%03d_bins"
        s"""SELECT '$tag' AS method, CAST($bins AS BIGINT) AS n_bins,
           |  CAST(SUM(CASE WHEN mx < t THEN cnt
           |    WHEN mn >= t THEN 0
           |    ELSE cnt * (t - mn) // (mx - mn + 1) END) AS BIGINT)
           |    AS est_rows
           |FROM (
           |  SELECT (cents - lo) * $bins // (hi - lo + 1) AS bin,
           |    COUNT(*) AS cnt, MIN(cents) AS mn, MAX(cents) AS mx,
           |    MAX(t) AS t
           |  FROM o CROSS JOIN s2 GROUP BY 1) z""".stripMargin
      }
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |    AS cents
        |  FROM orders),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(cents) AS lo,
        |         MAX(cents) AS hi FROM o),
        |s2 AS (SELECT *, lo + (hi - lo + 1) // 4 AS t FROM st),
        |act AS (
        |  SELECT CAST(SUM(CASE WHEN cents < t THEN 1 ELSE 0 END) AS BIGINT)
        |    AS actual
        |  FROM o CROSS JOIN s2),
        |ms AS (
        |""".stripMargin + methods.mkString("\nUNION ALL\n") + """
        |)
        |SELECT method, n_bins, est_rows,
        |  act.actual AS actual_rows,
        |  CAST(GREATEST(est_rows, act.actual) * 1000000
        |    // GREATEST(LEAST(est_rows, act.actual), 1) AS BIGINT)
        |    AS q_error_ppm
        |FROM ms CROSS JOIN act ORDER BY method""".stripMargin
    },

    "q441_join_order_dp" ->
      """WITH c AS (
        |  SELECT c_custkey AS ck FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |o0 AS (
        |  SELECT o_orderkey AS ok, o_custkey AS ck,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day
        |  FROM orders),
        |ds AS (SELECT MIN(day) AS lo_d, MAX(day) AS hi_d FROM o0),
        |o AS (SELECT ok, ck FROM o0, ds
        |      WHERE day < lo_d + (hi_d - lo_d + 1) // 2),
        |l AS (SELECT l_orderkey AS ok FROM lineitem WHERE l_returnflag = 'R'),
        |st AS (SELECT
        |    (SELECT COUNT(*) FROM c) AS nc,
        |    (SELECT COUNT(*) FROM o) AS no_,
        |    (SELECT COUNT(DISTINCT ck) FROM o) AS vo_ck,
        |    (SELECT COUNT(*) FROM l) AS nl,
        |    (SELECT COUNT(DISTINCT ok) FROM l) AS vl_ok,
        |    (SELECT COUNT(*) FROM c JOIN o USING (ck)) AS act_a,
        |    (SELECT COUNT(*) FROM o JOIN l USING (ok)) AS act_b,
        |    (SELECT COUNT(*) FROM c JOIN o USING (ck) JOIN l USING (ok))
        |      AS act_f),
        |pa AS (SELECT CAST(nc AS HUGEINT) * no_
        |         // greatest(nc, vo_ck, 1) AS j1, * FROM st),
        |pa2 AS (SELECT 'plan_a_co_then_l' AS plan, j1,
        |          j1 * nl // greatest(least(j1, no_), vl_ok, 1) AS f,
        |          act_a AS act_j1, act_f FROM pa),
        |pb AS (SELECT CAST(no_ AS HUGEINT) * nl
        |         // greatest(no_, vl_ok, 1) AS j1, * FROM st),
        |pb2 AS (SELECT 'plan_b_ol_then_c' AS plan, j1,
        |          j1 * nc // greatest(least(j1, vo_ck), nc, 1) AS f,
        |          act_b AS act_j1, act_f FROM pb),
        |pc AS (SELECT CAST(nc AS HUGEINT) * nl AS j1, * FROM st),
        |pc2 AS (SELECT 'plan_c_cxl_then_o' AS plan, j1,
        |          j1 * no_ // greatest(greatest(nc, vo_ck)
        |            * greatest(vl_ok, no_), 1) AS f,
        |          j1 AS act_j1, act_f FROM pc),
        |plans AS (
        |  SELECT plan, j1, f, j1 + f AS est_cost, act_j1,
        |    act_f, act_j1 + act_f AS act_cost
        |  FROM (SELECT * FROM pa2 UNION ALL SELECT * FROM pb2
        |        UNION ALL SELECT * FROM pc2) u)
        |SELECT p.plan, CAST(p.j1 AS BIGINT) AS est_inter_rows,
        |  CAST(p.f AS BIGINT) AS est_final_rows,
        |  CAST(p.est_cost AS BIGINT) AS est_cost,
        |  CAST(p.act_j1 AS BIGINT) AS act_inter_rows,
        |  CAST(p.act_f AS BIGINT) AS act_final_rows,
        |  CAST(p.act_cost AS BIGINT) AS act_cost,
        |  CAST((SELECT COUNT(*) FROM plans q
        |        WHERE q.est_cost < p.est_cost
        |           OR (q.est_cost = p.est_cost AND q.plan < p.plan)) + 1
        |    AS BIGINT) AS est_rank,
        |  CAST((SELECT COUNT(*) FROM plans q
        |        WHERE q.act_cost < p.act_cost
        |           OR (q.act_cost = p.act_cost AND q.plan < p.plan)) + 1
        |    AS BIGINT) AS act_rank
        |FROM plans p ORDER BY p.plan""".stripMargin,

    "q442_eager_preagg" ->
      """WITH l AS (
        |  SELECT l_orderkey AS ok,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem),
        |o AS (SELECT o_orderkey AS ok, o_custkey AS ck FROM orders),
        |c AS (SELECT c_custkey AS ck, c_nationkey AS nk FROM customer),
        |st AS (SELECT
        |    (SELECT COUNT(*) FROM l) AS nl,
        |    (SELECT COUNT(DISTINCT ok) FROM l) AS nok,
        |    (SELECT COUNT(*) FROM o) AS no_,
        |    (SELECT COUNT(DISTINCT ck) FROM o) AS nck,
        |    (SELECT COUNT(*) FROM c) AS nc),
        |naive AS (
        |  SELECT COUNT(*) AS n_groups, SUM(cents) AS total_cents FROM (
        |    SELECT nk, SUM(cents) AS cents
        |    FROM l JOIN o USING (ok) JOIN c USING (ck) GROUP BY 1) z),
        |eager AS (
        |  SELECT COUNT(*) AS n_groups, SUM(cents) AS total_cents FROM (
        |    SELECT nk, SUM(cents) AS cents FROM (
        |      SELECT ck, SUM(cents) AS cents FROM (
        |        SELECT ok, SUM(cents) AS cents FROM l GROUP BY 1) la
        |      JOIN o USING (ok) GROUP BY 1) oa
        |    JOIN c USING (ck) GROUP BY 1) z),
        |legs AS (
        |  SELECT 's1_join_then_agg' AS strategy, no_ + nl AS r1,
        |    nl + nc AS r2, n_groups, total_cents FROM st, naive
        |  UNION ALL
        |  SELECT 's2_eager_preagg', no_ + nok, nck + nc,
        |    n_groups, total_cents FROM st, eager)
        |SELECT strategy, CAST(r1 AS BIGINT) AS rows_into_join1,
        |  CAST(r2 AS BIGINT) AS rows_into_join2,
        |  CAST(r1 + r2 AS BIGINT) AS rows_shuffled,
        |  CAST((r1 + r2) * 1000000 // (st.no_ + st.nl + st.nl + st.nc)
        |    AS BIGINT) AS reduction_ppm,
        |  CAST(n_groups AS BIGINT) AS n_groups,
        |  CAST(total_cents AS BIGINT) AS total_cents
        |FROM legs, st ORDER BY strategy""".stripMargin,

    "q443_delta_encoding" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        |  FROM events),
        |d1 AS (
        |  SELECT event_type, us, event_id,
        |    us - lag(us) OVER (PARTITION BY event_type
        |      ORDER BY us, event_id) AS dd
        |  FROM ev),
        |d2 AS (
        |  SELECT event_type,
        |    dd - lag(dd) OVER (PARTITION BY event_type
        |      ORDER BY us, event_id) AS dod
        |  FROM d1),
        |b AS (
        |  SELECT event_type,
        |    CASE WHEN dod IS NULL THEN 64 WHEN dod = 0 THEN 1
        |      WHEN dod >= -63 AND dod <= 64 THEN 9
        |      WHEN dod >= -255 AND dod <= 256 THEN 12
        |      WHEN dod >= -2047 AND dod <= 2048 THEN 16
        |      ELSE 36 END AS bits,
        |    CASE WHEN dod IS NULL THEN 1 ELSE 0 END AS raw
        |  FROM d2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(raw) AS BIGINT) AS n_raw,
        |  CAST(SUM(CASE WHEN bits = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(SUM(CASE WHEN bits = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_b9,
        |  CAST(SUM(CASE WHEN bits = 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_b12,
        |  CAST(SUM(CASE WHEN bits = 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_b16,
        |  CAST(SUM(CASE WHEN bits = 36 THEN 1 ELSE 0 END) AS BIGINT) AS n_b36,
        |  CAST(SUM(bits) AS BIGINT) AS bits_total,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits,
        |  CAST(SUM(bits) * 1000000 // (COUNT(*) * 64) AS BIGINT)
        |    AS compressed_ppm
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q446_shuffle_sizing" -> {
      def leg(nm: String, table: String, key: String, width: Int) =
        s"""SELECT '$nm' AS shuffle, $width AS w,
           |    COUNT(*) AS n_keys, SUM(cnt) AS n_rows, MAX(cnt) AS mx
           |  FROM (SELECT COUNT(*) AS cnt FROM $table GROUP BY $key) z"""
          .stripMargin
      """WITH u AS (
        |""".stripMargin +
        Seq(leg("s1_events_by_user", "events", "user_id", 48),
          leg("s2_lineitem_by_orderkey", "lineitem", "l_orderkey", 64),
          leg("s3_orders_by_custkey", "orders", "o_custkey", 48))
          .mkString("\nUNION ALL\n") + """
        |)
        |SELECT shuffle, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_keys AS BIGINT) AS n_keys,
        |  CAST(n_rows * w AS BIGINT) AS total_bytes,
        |  CAST(mx * w AS BIGINT) AS max_key_bytes,
        |  CAST((n_rows * w + 134217727) // 134217728 AS BIGINT)
        |    AS parts_128mb,
        |  CAST((n_rows * w + 33554431) // 33554432 AS BIGINT) AS parts_32mb,
        |  CAST(mx * 1000000 // n_rows AS BIGINT) AS max_key_share_ppm,
        |  CAST(CAST(mx * w AS HUGEINT)
        |    * ((n_rows * w + 134217727) // 134217728)
        |    * 1000000 // (n_rows * w) AS BIGINT) AS skew_ratio_ppm
        |FROM u ORDER BY shuffle""".stripMargin
    },

    "q447_occ_conflicts" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    event_id % 2 AS writer
        |  FROM events),
        |cells AS (
        |  SELECT user_id, hr, COUNT(*) AS n_ev,
        |    COUNT(DISTINCT writer) AS nw
        |  FROM ev GROUP BY 1, 2)
        |SELECT CAST(hr % 24 AS BIGINT) AS hour_of_day,
        |  CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN nw > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_conflicts,
        |  CAST(SUM(CASE WHEN nw > 1 THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS conflict_ppm
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    "q448_ab_power_planner" ->
      """WITH u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
        |r AS (SELECT event_type, COUNT(DISTINCT user_id) AS ntu
        |      FROM events GROUP BY 1),
        |g AS (SELECT CAST(m.m AS BIGINT) AS mde_ppm
        |      FROM UNNEST([10000, 20000, 50000]) AS m(m)),
        |b AS (
        |  SELECT event_type, mde_ppm,
        |    CAST(ntu * 1000000 // n_users AS BIGINT) AS base_rate_ppm,
        |    n_users
        |  FROM r, u, g),
        |p AS (
        |  SELECT *, CAST(16 * base_rate_ppm * (1000000 - base_rate_ppm)
        |    // (mde_ppm * mde_ppm) AS BIGINT) AS n_per_arm
        |  FROM b)
        |SELECT event_type, mde_ppm, base_rate_ppm,
        |  CAST(n_users AS BIGINT) AS n_users, n_per_arm,
        |  n_per_arm * 2 <= n_users AS feasible
        |FROM p ORDER BY event_type, mde_ppm""".stripMargin,

    "q449_retry_storm" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id, event_type, value
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |d AS (
        |  SELECT event_type, user_id,
        |    CASE WHEN prev IS NOT NULL AND us - prev <= 60000000
        |         THEN 1 ELSE 0 END AS dup
        |  FROM ev)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(dup) AS BIGINT) AS n_redelivered,
        |  CAST(COUNT(DISTINCT CASE WHEN dup = 1 THEN user_id END) AS BIGINT)
        |    AS n_affected_users,
        |  CAST(SUM(dup) * 1000000 // COUNT(*) AS BIGINT) AS redelivery_ppm
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q451_straggler_makespan" ->
      """WITH shards AS (
        |  SELECT l_orderkey % 128 AS shard, COUNT(*) AS rows_
        |  FROM lineitem GROUP BY 1),
        |ws AS (SELECT CAST(w.w AS BIGINT) AS w FROM UNNEST([4, 8, 16]) AS w(w)),
        |loads AS (
        |  SELECT w, shard % w AS worker, SUM(rows_) AS load
        |  FROM shards CROSS JOIN ws GROUP BY 1, 2),
        |agg AS (
        |  SELECT w, COUNT(*) AS n_workers, SUM(load) AS total_rows,
        |    MAX(load) AS makespan_rows
        |  FROM loads GROUP BY 1)
        |SELECT w, CAST(n_workers AS BIGINT) AS n_workers,
        |  CAST(total_rows AS BIGINT) AS total_rows,
        |  CAST(makespan_rows AS BIGINT) AS makespan_rows,
        |  CAST((total_rows + w - 1) // w AS BIGINT) AS lower_bound,
        |  CAST(total_rows * 1000000 // (w * makespan_rows) AS BIGINT)
        |    AS efficiency_ppm,
        |  CAST(makespan_rows * 1000000 // ((total_rows + w - 1) // w)
        |    AS BIGINT) AS imbalance_ppm
        |FROM agg ORDER BY w""".stripMargin,

    "q452_grouping_ndv" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS a, o_orderstatus AS b,
        |    year(CAST(o_orderdate AS DATE)) AS c
        |  FROM orders),
        |st AS (SELECT
        |  (SELECT COUNT(*) FROM o) AS n,
        |  (SELECT COUNT(DISTINCT a) FROM o) AS va,
        |  (SELECT COUNT(DISTINCT b) FROM o) AS vb,
        |  (SELECT COUNT(DISTINCT c) FROM o) AS vc,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT a, b FROM o) z) AS vab,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT a, c FROM o) z) AS vac,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT b, c FROM o) z) AS vbc,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT a, b, c FROM o) z) AS vabc),
        |legs AS (
        |  SELECT 'g1_priority' AS grouping_set, va AS m, va AS f, n FROM st
        |  UNION ALL SELECT 'g2_status', vb, vb, n FROM st
        |  UNION ALL SELECT 'g3_year', vc, vc, n FROM st
        |  UNION ALL SELECT 'g4_priority_status', vab, va * vb, n FROM st
        |  UNION ALL SELECT 'g5_priority_year', vac, va * vc, n FROM st
        |  UNION ALL SELECT 'g6_status_year', vbc, vb * vc, n FROM st
        |  UNION ALL SELECT 'g7_all_three', vabc, va * vb * vc, n FROM st)
        |SELECT grouping_set, CAST(m AS BIGINT) AS measured_ndv,
        |  CAST(LEAST(f, n) AS BIGINT) AS forecast_ndv,
        |  CAST(m * 1000000 // LEAST(f, n) AS BIGINT) AS correlation_ppm
        |FROM legs ORDER BY grouping_set""".stripMargin,

    "q453_cache_sizing" ->
      """WITH acc AS (
        |  SELECT event_type, user_id, COUNT(*) AS hits
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, user_id, hits,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY hits DESC, user_id) AS rk
        |  FROM acc),
        |cs AS (SELECT CAST(c.c AS BIGINT) AS cache_size
        |       FROM UNNEST([8, 64, 512]) AS c(c))
        |SELECT event_type, cache_size, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(hits) AS BIGINT) AS n_accesses,
        |  CAST(SUM(CASE WHEN rk <= cache_size THEN hits ELSE 0 END)
        |    AS BIGINT) AS hot_accesses,
        |  CAST(SUM(CASE WHEN rk <= cache_size THEN 1 ELSE 0 END) AS BIGINT)
        |    AS cached_keys,
        |  CAST(SUM(CASE WHEN rk <= cache_size THEN hits ELSE 0 END)
        |    * 1000000 // SUM(hits) AS BIGINT) AS hit_ppm
        |FROM r CROSS JOIN cs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q454_salt_factor_sweep" ->
      """WITH perkey AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
        |ss AS (SELECT CAST(s.s AS BIGINT) AS salt
        |       FROM UNNEST([1, 4, 16]) AS s(s))
        |SELECT salt, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
        |  CAST(MAX((cnt + salt - 1) // salt) AS BIGINT) AS max_shard_rows,
        |  CAST(SUM(LEAST(salt, cnt)) AS BIGINT) AS partial_rows,
        |  CAST(MAX((cnt + salt - 1) // salt) * 1000000 // MAX(cnt)
        |    AS BIGINT) AS balance_gain_ppm,
        |  CAST(SUM(LEAST(salt, cnt)) * 1000000 // COUNT(*) AS BIGINT)
        |    AS overhead_ppm
        |FROM perkey CROSS JOIN ss GROUP BY salt ORDER BY salt""".stripMargin,

    "q455_checkpoint_interval" ->
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    COUNT(DISTINCT user_id) AS state_keys,
        |    GREATEST((MAX(epoch_us(CAST(ts AS TIMESTAMP)))
        |      - MIN(epoch_us(CAST(ts AS TIMESTAMP)))) // 1000000, 1)
        |      AS span_s
        |  FROM events GROUP BY 1),
        |iv AS (SELECT CAST(i.i AS BIGINT) AS interval_s
        |       FROM UNNEST([10, 60, 600]) AS i(i))
        |SELECT event_type, interval_s, CAST(n AS BIGINT) AS n_events,
        |  CAST(state_keys AS BIGINT) AS state_keys,
        |  CAST(span_s AS BIGINT) AS span_s,
        |  CAST(n * interval_s // span_s AS BIGINT) AS replay_rows_worst,
        |  CAST(state_keys * 3600 // interval_s AS BIGINT)
        |    AS state_rows_per_hour
        |FROM st CROSS JOIN iv ORDER BY event_type, interval_s""".stripMargin,

    "q458_peak_backlog" ->
      """WITH arr AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    COUNT(*) AS a
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi, SUM(a) AS tot,
        |    MAX(hr) - MIN(hr) + 1 AS n_hours
        |  FROM arr GROUP BY 1),
        |grid AS (
        |  SELECT s.event_type, s.tot, s.n_hours, g.hr
        |  FROM span s, UNNEST(generate_series(s.lo, s.hi)) AS g(hr)),
        |dense AS (
        |  SELECT g.event_type, g.tot, g.n_hours, g.hr, COALESCE(ar.a, 0) AS a
        |  FROM grid g
        |  LEFT JOIN arr ar ON ar.event_type = g.event_type AND ar.hr = g.hr),
        |cg AS (SELECT CAST(c.c AS BIGINT) AS c_tenths
        |       FROM UNNEST([10, 15, 20]) AS c(c)),
        |walk AS (
        |  SELECT event_type, c_tenths, hr, a,
        |    GREATEST(tot * c_tenths // (10 * n_hours), 1) AS cap,
        |    SUM(a - GREATEST(tot * c_tenths // (10 * n_hours), 1)) OVER (
        |      PARTITION BY event_type, c_tenths ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dense CROSS JOIN cg),
        |bl AS (
        |  SELECT event_type, c_tenths, a, cap,
        |    cum - LEAST(0, MIN(cum) OVER (
        |      PARTITION BY event_type, c_tenths ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS backlog
        |  FROM walk)
        |SELECT event_type, c_tenths, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(MAX(cap) AS BIGINT) AS capacity_per_hour,
        |  CAST(SUM(CASE WHEN a > cap THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hours_over,
        |  CAST(MAX(backlog) AS BIGINT) AS peak_backlog
        |FROM bl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q462_behavior_reident" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rk
        |  FROM events),
        |fp AS (
        |  SELECT user_id,
        |    COALESCE(MIN(CASE WHEN rk = 1 THEN event_type END), '_') || '>' ||
        |    COALESCE(MIN(CASE WHEN rk = 2 THEN event_type END), '_') || '>' ||
        |    COALESCE(MIN(CASE WHEN rk = 3 THEN event_type END), '_') || '>' ||
        |    CAST(MIN(CASE WHEN rk = 1
        |      THEN (us // 3600000000) % 24 // 6 END) AS VARCHAR)
        |      AS fingerprint
        |  FROM ranked WHERE rk <= 3 GROUP BY user_id),
        |classes AS (
        |  SELECT fingerprint, COUNT(*) AS k,
        |    CASE WHEN COUNT(*) = 1 THEN 'a_unique'
        |         WHEN COUNT(*) <= 4 THEN 'b_2_to_4'
        |         WHEN COUNT(*) <= 9 THEN 'c_5_to_9'
        |         ELSE 'd_10_plus' END AS k_class
        |  FROM fp GROUP BY fingerprint),
        |tot AS (SELECT SUM(k) AS n_users_total FROM classes)
        |SELECT k_class, CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
        |  CAST(SUM(k) AS BIGINT) AS n_users,
        |  CAST(SUM(k) * 1000000 // MAX(tot.n_users_total) AS BIGINT)
        |    AS share_ppm
        |FROM classes CROSS JOIN tot GROUP BY 1 ORDER BY 1""".stripMargin,

    "q466_jain_fairness" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    event_type, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |perday AS (
        |  SELECT day, COUNT(*) AS k, SUM(x) AS sx, SUM(x * x) AS sx2
        |  FROM daily GROUP BY 1),
        |j AS (
        |  SELECT day, k,
        |    CAST(CAST(sx AS HUGEINT) * sx * 1000000 // (k * sx2) AS BIGINT)
        |      AS j_ppm
        |  FROM perday)
        |SELECT CAST(k AS BIGINT) AS k_types,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(j_ppm) // COUNT(*) AS BIGINT) AS mean_j_ppm,
        |  CAST(MIN(j_ppm) AS BIGINT) AS worst_j_ppm,
        |  CAST(MAX(j_ppm) AS BIGINT) AS best_j_ppm,
        |  CAST(1000000 // k AS BIGINT) AS floor_j_ppm
        |FROM j GROUP BY k ORDER BY k_types""".stripMargin,

    "q467_headroom_canary" -> {
      def leg(nm: String, table: String, valueExpr: String) =
        s"""SELECT '$nm' AS column_key, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(MAX(ABS(v)) AS BIGINT) AS max_abs,
           |  CAST(length(bin(GREATEST(MAX(ABS(v)), 1))) AS BIGINT)
           |    AS value_bits,
           |  CAST(length(bin(GREATEST(MAX(ABS(v)), 1)))
           |    + length(bin(GREATEST(COUNT(*), 1))) AS BIGINT)
           |    AS sum_bits_bound,
           |  CAST(62 - length(bin(GREATEST(MAX(ABS(v)), 1)))
           |    - length(bin(GREATEST(COUNT(*), 1))) AS BIGINT)
           |    AS sum_headroom_doublings
           |FROM (SELECT $valueExpr AS v FROM $table) z""".stripMargin
      Seq(
        leg("c1_lineitem_price_cents", "lineitem",
          "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        leg("c2_orders_total_cents", "orders",
          "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        leg("c3_event_value_micro", "events",
          "CAST(floor(value * 1000000 + 0.5) AS BIGINT)"),
        leg("c4_doc_chars", "documents", "CAST(n_chars AS BIGINT)"))
        .mkString("\nUNION ALL\n") + "\nORDER BY column_key"
    },

    "q475_runtime_filter" ->
      """WITH seg AS (
        |  SELECT c_mktsegment AS segment, c_custkey AS ck FROM customer),
        |o AS (SELECT o_orderkey AS ok, o_custkey AS ck FROM orders),
        |li AS (SELECT l_orderkey AS ok FROM lineitem),
        |tot AS (SELECT (SELECT COUNT(*) FROM o) AS n_orders,
        |               (SELECT COUNT(*) FROM li) AS n_lines),
        |oseg AS (
        |  SELECT segment, COUNT(*) AS orders_admitted
        |  FROM o JOIN seg USING (ck) GROUP BY 1),
        |liseg AS (
        |  SELECT segment, COUNT(*) AS lines_admitted
        |  FROM li JOIN o USING (ok) JOIN seg USING (ck) GROUP BY 1)
        |SELECT segment, CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(orders_admitted AS BIGINT) AS orders_admitted,
        |  CAST(orders_admitted * 1000000 // n_orders AS BIGINT)
        |    AS orders_admit_ppm,
        |  CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(lines_admitted AS BIGINT) AS lines_admitted,
        |  CAST(lines_admitted * 1000000 // n_lines AS BIGINT)
        |    AS lines_admit_ppm
        |FROM oseg JOIN liseg USING (segment) CROSS JOIN tot
        |ORDER BY segment""".stripMargin,

    "q476_agg_spill_forecast" -> {
      def leg(nm: String, table: String, key: String) =
        s"""SELECT '$nm' AS agg_key, p, CAST(SUM(keys_) AS BIGINT) AS n_keys,
           |  CAST(MAX(keys_) AS BIGINT) AS max_reducer_keys,
           |  CAST(MAX(rows_) AS BIGINT) AS max_reducer_rows,
           |  CAST(MAX(keys_) * 64 AS BIGINT) AS est_table_bytes,
           |  MAX(keys_) * 64 <= 67108864 AS fits_64mb
           |FROM (
           |  SELECT p, h % p AS reducer, COUNT(*) AS keys_,
           |    SUM(cnt) AS rows_
           |  FROM (
           |    SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT
           |        AS h, cnt
           |    FROM (SELECT $key AS k, COUNT(*) AS cnt
           |          FROM $table GROUP BY 1) z) hh
           |  CROSS JOIN (SELECT CAST(p.p AS BIGINT) AS p
           |              FROM UNNEST([32, 256]) AS p(p)) ps
           |  GROUP BY 1, 2) r
           |GROUP BY p""".stripMargin
      Seq(leg("k1_events_by_user", "events", "user_id"),
        leg("k2_lineitem_by_partkey", "lineitem", "l_partkey"))
        .mkString("\nUNION ALL\n") + "\nORDER BY agg_key, p"
    },

    "q473_predicate_order" -> {
      def perm(nm: String, first: String, firstTwo: String) =
        s"""SELECT '$nm' AS eval_order, n AS stage1_rows,
           |  $first AS stage2_rows, $firstTwo AS stage3_rows,
           |  n + $first + $firstTwo AS cost_rows, s123 AS out_rows
           |FROM sv""".stripMargin
      """WITH li AS (
        |  SELECT l_returnflag, l_quantity,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem),
        |st AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi,
        |         MIN(cents) + (MAX(cents) - MIN(cents) + 1) // 4 AS t
        |       FROM li),
        |cells AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS p1,
        |    CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END AS p2,
        |    CASE WHEN cents < st.t THEN 1 ELSE 0 END AS p3,
        |    COUNT(*) AS c
        |  FROM li CROSS JOIN st GROUP BY 1, 2, 3),
        |sv AS (
        |  SELECT SUM(c) AS n, SUM(c * p1) AS s1, SUM(c * p2) AS s2,
        |    SUM(c * p3) AS s3, SUM(c * p1 * p2) AS s12,
        |    SUM(c * p1 * p3) AS s13, SUM(c * p2 * p3) AS s23,
        |    SUM(c * p1 * p2 * p3) AS s123
        |  FROM cells),
        |plans AS (
        |""".stripMargin +
        Seq(perm("o1_p1_p2_p3", "s1", "s12"), perm("o2_p1_p3_p2", "s1", "s13"),
          perm("o3_p2_p1_p3", "s2", "s12"), perm("o4_p2_p3_p1", "s2", "s23"),
          perm("o5_p3_p1_p2", "s3", "s13"), perm("o6_p3_p2_p1", "s3", "s23"))
          .mkString("\nUNION ALL\n") + """
        |)
        |SELECT p.eval_order, CAST(p.stage1_rows AS BIGINT) AS stage1_rows,
        |  CAST(p.stage2_rows AS BIGINT) AS stage2_rows,
        |  CAST(p.stage3_rows AS BIGINT) AS stage3_rows,
        |  CAST(p.cost_rows AS BIGINT) AS cost_rows,
        |  CAST(p.out_rows AS BIGINT) AS out_rows,
        |  CAST((SELECT COUNT(*) FROM plans q
        |        WHERE q.cost_rows < p.cost_rows
        |           OR (q.cost_rows = p.cost_rows
        |               AND q.eval_order < p.eval_order)) + 1 AS BIGINT)
        |    AS cost_rank
        |FROM plans p ORDER BY p.eval_order""".stripMargin
    },

    "q474_anomaly_consensus" ->
      """WITH daily0 AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
        |         FROM daily0 GROUP BY 1),
        |grid AS (
        |  SELECT s.event_type, g.day FROM span s,
        |    UNNEST(generate_series(s.lo, s.hi)) AS g(day)),
        |daily AS (
        |  SELECT g.event_type, g.day, COALESCE(d.n, 0) AS n
        |  FROM grid g LEFT JOIN daily0 d
        |    ON d.event_type = g.event_type AND d.day = g.day),
        |cnts AS (SELECT event_type, COUNT(*) AS nd FROM daily GROUP BY 1),
        |medr AS (
        |  SELECT event_type, n, row_number() OVER (
        |    PARTITION BY event_type ORDER BY n, day) AS rk
        |  FROM daily),
        |med AS (
        |  SELECT m.event_type, m.n AS med FROM medr m JOIN cnts c
        |    USING (event_type) WHERE m.rk = (c.nd + 1) // 2),
        |devr AS (
        |  SELECT d.event_type, ABS(d.n - med.med) AS dev, d.day,
        |    row_number() OVER (PARTITION BY d.event_type
        |      ORDER BY ABS(d.n - med.med), d.day) AS rk
        |  FROM daily d JOIN med USING (event_type)),
        |mad AS (
        |  SELECT m.event_type, m.dev AS mad FROM devr m JOIN cnts c
        |    USING (event_type) WHERE m.rk = (c.nd + 1) // 2),
        |pm AS (
        |  SELECT event_type, day, n,
        |    MAX(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS t7_sum,
        |    COUNT(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS t7_n
        |  FROM daily),
        |votes AS (
        |  SELECT pm.event_type,
        |    CASE WHEN ABS(pm.n - med.med) > 3 * mad.mad THEN 1 ELSE 0 END
        |      AS v_mad,
        |    CASE WHEN pm.prev_max IS NOT NULL AND pm.n > pm.prev_max
        |         THEN 1 ELSE 0 END AS v_record,
        |    CASE WHEN pm.t7_n >= 3 AND pm.n * pm.t7_n > 2 * pm.t7_sum
        |         THEN 1 ELSE 0 END AS v_burst
        |  FROM pm JOIN med USING (event_type) JOIN mad USING (event_type))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(v_mad) AS BIGINT) AS n_mad,
        |  CAST(SUM(v_record) AS BIGINT) AS n_record,
        |  CAST(SUM(v_burst) AS BIGINT) AS n_burst,
        |  CAST(SUM(CASE WHEN v_mad + v_record + v_burst >= 2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_consensus2,
        |  CAST(SUM(CASE WHEN v_mad + v_record + v_burst = 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_consensus3
        |FROM votes GROUP BY 1 ORDER BY 1""".stripMargin,

    "q468_peak_rate" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |win AS (
        |  SELECT event_type, us, COUNT(*) OVER (
        |    PARTITION BY event_type ORDER BY us
        |    RANGE BETWEEN 59999999 PRECEDING AND CURRENT ROW) AS win60
        |  FROM ev),
        |agg AS (
        |  SELECT event_type, COUNT(*) AS n_events, MAX(win60) AS peak_60s,
        |    GREATEST((MAX(us) - MIN(us)) // 1000000, 1) AS span_s
        |  FROM win GROUP BY 1)
        |SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(peak_60s AS BIGINT) AS peak_60s,
        |  CAST(n_events * 60 // span_s AS BIGINT) AS mean_per_60s,
        |  CAST(peak_60s * 1000000
        |    // GREATEST(n_events * 60 // span_s, 1) AS BIGINT)
        |    AS burst_ratio_ppm
        |FROM agg ORDER BY event_type""".stripMargin,

    "q506_eval_holdout" ->
      """WITH pr AS (
        |  SELECT source, doc_id,
        |    ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 13))
        |      ::BIGINT AS h
        |  FROM documents),
        |rk AS (
        |  SELECT source, doc_id, h,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
        |  FROM pr)
        |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, h
        |FROM rk WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    "q507_split_contamination" ->
      """WITH d AS (
        |  SELECT source, md5(text) AS fp,
        |    CASE WHEN ('0x' || substr(md5('spl:' || CAST(doc_id AS VARCHAR)),
        |      1, 13))::BIGINT % 100 < 10 THEN 1 ELSE 0 END AS t
        |  FROM documents),
        |cls AS (
        |  SELECT source, fp, CAST(SUM(t) AS BIGINT) AS nt,
        |    CAST(SUM(1 - t) AS BIGINT) AS ntr
        |  FROM d GROUP BY 1, 2)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(CASE WHEN nt + ntr >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_multi,
        |  CAST(SUM(CASE WHEN nt >= 1 AND ntr >= 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cross,
        |  CAST(SUM(nt * ntr) AS BIGINT) AS contam_pairs,
        |  CAST(SUM(CASE WHEN ntr >= 1 THEN nt ELSE 0 END) AS BIGINT)
        |    AS contam_test_docs,
        |  CAST(SUM(nt) AS BIGINT) AS test_docs,
        |  CAST(SUM(CASE WHEN ntr >= 1 THEN nt ELSE 0 END) * 1000000
        |    // GREATEST(SUM(nt), 1) AS BIGINT) AS contam_ppm
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,

    "q508_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |    SUM(CASE WHEN b.c > a.c THEN 1
        |             WHEN b.c < a.c THEN -1 ELSE 0 END) AS s_stat
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND b.day > a.day
        |  GROUP BY 1),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |      FROM daily GROUP BY 1),
        |ties AS (
        |  SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
        |  FROM (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS t
        |        FROM daily GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT n.event_type, n.n_days,
        |  CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat,
        |  CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
        |    - COALESCE(ties.tie_term, 0) AS BIGINT) AS var18_num,
        |  CAST(CASE WHEN COALESCE(s.s_stat, 0) > 0 THEN 1
        |            WHEN COALESCE(s.s_stat, 0) < 0 THEN -1
        |            ELSE 0 END AS BIGINT) AS trend_dir
        |FROM n LEFT JOIN s USING (event_type)
        |LEFT JOIN ties USING (event_type) ORDER BY 1""".stripMargin,

    "q509_ship_lag_survival" ->
      """WITH lag AS (
        |  SELECT CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
        |    CAST(l.l_shipdate AS DATE)) AS BIGINT) AS t
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |d AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS d_events
        |      FROM lag GROUP BY 1),
        |r AS (
        |  SELECT a.t, a.d_events,
        |    CAST((SELECT SUM(b.d_events) FROM d b WHERE b.t >= a.t)
        |      AS BIGINT) AS n_at_risk
        |  FROM d a)
        |SELECT t AS lag_days, d_events, n_at_risk,
        |  CAST(d_events * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm
        |FROM r ORDER BY 1""".stripMargin,

    "q510_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, day, c,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS k,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY day) AS p
        |  FROM daily),
        |t AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS s
        |  FROM daily GROUP BY 1),
        |d AS (
        |  SELECT g.event_type, g.day, t.n, t.s,
        |    ABS(t.n * g.p - g.k * t.s) AS dk
        |  FROM g JOIN t USING (event_type)),
        |best AS (
        |  SELECT event_type, n, s, MAX(dk) AS d_max
        |  FROM d GROUP BY 1, 2, 3)
        |SELECT b.event_type, b.n AS n_days, b.s AS total_events,
        |  CAST(MIN(d.day - DATE '1970-01-01') AS BIGINT) AS cp_epoch_day,
        |  CAST(b.d_max AS BIGINT) AS d_abs_max,
        |  CAST(b.d_max * 1000 // GREATEST(b.n * b.s, 1) AS BIGINT)
        |    AS cusum_milli
        |FROM best b JOIN d ON d.event_type = b.event_type
        |  AND d.dk = b.d_max
        |GROUP BY 1, 2, 3, 5, 6 ORDER BY 1""".stripMargin
  )
}
