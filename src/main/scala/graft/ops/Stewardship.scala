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
    }
  )
}
