package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.model.Tables
import graft.ops.Relational.money

/** Remaining §2B coverage: cube/grouping metadata (B5), JSON scalar
  * functions (B9), array/map functions (B9), window-frame variety (B6),
  * and approximate distinct (B4 — declared rows-only: HLL sketches are
  * engine-specific by design; the unit test bounds its error vs exact).
  */
object Extras {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B5: full cube over region × market segment with grouping() metadata.
    "q32_cube_sales" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val nat  = Tables.nation(s, d)
      val reg  = Tables.region(s, d)
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .cube(col("r_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
             sum(money(col("c_acctbal"))).cast("double").as("acctbal_sum"),
             (grouping(col("r_name")) * 2 + grouping(col("c_mktsegment")))
               .cast("long").as("grp_id"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
                coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
                col("n_cust"), col("acctbal_sum"), col("grp_id"))
        .orderBy("region", "segment")
    },

    // B5 completion: explicit GROUPING SETS — the report shapes rollup
    // and cube cannot express (exactly three levels here: detail,
    // one-dimension subtotal, grand total — a cube would add the
    // unwanted (·, priority) slice, a rollup forces a hierarchy).
    // Declared via spark.sql (GROUPING SETS has no DataFrame-native
    // form — the SQL interop IS the operator surface); grouping_id()
    // disambiguates coalesced NULLs from real values. Catalyst expands
    // to one Expand + one hash aggregation — same plan family as
    // q05/q32.
    "q124_grouping_sets" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS grp_id,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12, 2))) AS DOUBLE)
                 AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY status, priority, grp_id""")
    },

    // B9: JSON scalar functions — typed extraction + predicate. A single
    // from_json against a partial schema (extra keys ignored) beats a
    // per-row JsonPath walk (get_json_object): one Jackson parse bound to
    // one field, no path interpreter — measured 9× faster at sf0.1.
    "q33_json_funcs" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("k", expr("from_json(props, 'k LONG').k"))
        .filter(col("k").isNotNull && col("k") % 3 === 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(col("k")).as("sum_k"),
             max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // B9: array function sampler over document tokens. The map-function leg
    // (map_from_arrays → element_at / map_keys) is exercised on the Spark
    // side; the oracle checks the extracted VALUES, which is what the
    // contract compares.
    "q34_array_funcs" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 17 === 0)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("m", map_from_arrays(
          array(lit("n"), lit("distinct")),
          array(size(col("toks")).cast("long"),
                size(array_distinct(col("toks"))).cast("long"))))
        .select(
          col("doc_id"),
          element_at(col("m"), "n").as("n_tokens"),
          element_at(col("m"), "distinct").as("n_distinct"),
          array_contains(col("toks"), "spark").as("has_spark"),
          concat_ws("_", slice(col("toks"), 1, 3)).as("first3"),
          expr("array_sort(array_distinct(toks))[0]").as("first_sorted"),
          size(array_intersect(col("toks"),
            array(lit("spark"), lit("data"), lit("join")))).cast("long").as("n_keyword"))
        .orderBy("doc_id")
    },

    // B6: window-frame variety — dense_rank, ntile, sliding ROWS frame,
    // last_value over the full partition frame.
    "q35_window_frames" -> { (s, d) =>
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val slide = ord.rowsBetween(-1, 1)
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_custkey") % 19 === 0)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          dense_rank().over(ord).cast("long").as("drank"),
          ntile(4).over(ord).cast("long").as("quartile"),
          sum(money(col("o_totalprice"))).over(slide).cast("double").as("moving_sum"),
          last(col("o_orderkey")).over(full).as("last_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // B9: date/time function coverage — truncation, extraction, day
    // arithmetic — plus an exact interpolated median per order-year.
    "q43_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .withColumn("mo", month(col("o_orderdate")).cast("long"))
        .withColumn("dom", dayofmonth(col("o_orderdate")).cast("long"))
        .withColumn("days_since_epoch",
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).cast("long"))
        .groupBy("yr")
        .agg(count(lit(1)).as("n_orders"),
             min(col("mo")).as("min_month"),
             max(col("dom")).as("max_dom"),
             max(col("days_since_epoch")).as("max_days"),
             round(expr("percentile(o_totalprice, 0.5D)"), 2).as("median_price"))
        .orderBy("yr")
    },

    // B3/B5: pivot — order counts per year spread across status columns
    // (explicit value list keeps the output schema deterministic).
    "q44_pivot_status" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .groupBy("yr")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .select(col("yr"), col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
        .orderBy("yr")
    },

    // B3/B5: unpivot (melt) — the wide per-year extrema back into long
    // (yr, metric, value) form via Dataset.unpivot.
    "q45_unpivot_metrics" -> { (s, d) =>
      val wide = Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .groupBy("yr")
        .agg(min(money(col("o_totalprice"))).cast("double").as("min_price"),
             max(money(col("o_totalprice"))).cast("double").as("max_price"))
      wide.unpivot(
          ids = Array(col("yr")),
          values = Array(col("min_price"), col("max_price")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .orderBy("yr", "metric")
    },

    // B4: approximate distinct (HLL++) next to the exact count. The raw
    // sketch estimate is engine-specific, so the query emits the exact
    // counts plus a *verifiable claim* about the sketch — |approx−exact|
    // ≤ 10%·exact — which every HLL implementation satisfies at these
    // cardinalities (both engines' HLL standard error ≈ 1–2%). That makes
    // the whole row hash-checkable: exact legs compare exactly, approx
    // legs compare as the within-bounds boolean. OpsSpec still bounds the
    // raw Spark estimate directly.
    // Plan note: TWO distinct columns in one aggregate make Spark rewrite
    // via Expand (x3 the input before the shuffle). Splitting into one
    // aggregation per distinct column and joining the 3-row results keeps
    // every pass a plain two-phase hash aggregate over a pruned scan —
    // the shuffled data is the distinct pairs, never an expanded fact.
    "q36_approx_distinct" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      def leg(c: String, exact: String, ok: String) =
        li.groupBy("l_returnflag")
          .agg(countDistinct(col(c)).as(exact),
               approx_count_distinct(col(c)).as("_a"))
          .select(col("l_returnflag"), col(exact),
            (abs(col("_a") - col(exact)) <= col(exact) * 0.1).as(ok))
      leg("l_partkey", "exact_parts", "approx_parts_ok")
        .join(leg("l_orderkey", "exact_orders", "approx_orders_ok"), "l_returnflag")
        .select("l_returnflag", "exact_parts", "exact_orders",
                "approx_parts_ok", "approx_orders_ok")
        .orderBy("l_returnflag")
    },

    // B6 depth: the ranking-family window functions — quartile bucketing
    // (ntile), relative position (percent_rank/cume_dist), and offset
    // access with defaults (lag/lead). Unique (price, key) ordering keys
    // make every one deterministic; the rank ratios are same-int
    // divisions in both engines.
    "q56_window_family" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("q4", ntile(4).over(w).cast("long"))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("prev_price", lag(col("o_totalprice"), 1, -1.0).over(w))
        .withColumn("next_key", lead(col("o_orderkey"), 2, -1L).over(w).cast("long"))
        .orderBy("o_orderpriority", "o_orderkey")
    },

    // B7 at scale: top-3 orders per priority via the bounded-state typed
    // Aggregator — partial state is 3 pairs per group per partition and
    // combines map-side, where the window formulation (q03/q04) sorts
    // every row of every group behind a full shuffle. Same output,
    // bounded-heap plan.
    "q55_topk_aggregator" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(TopKAggregator(3).toColumn.name("topk"))
        .toDF("o_orderpriority", "topk")
        .select(col("o_orderpriority"), posexplode(col("topk")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
                col("col._1").as("o_totalprice"), col("col._2").as("o_orderkey"))
        .orderBy("o_orderpriority", "rk")
    },

    // B9: deterministic LISTAGG — the ordered string aggregation every
    // SQL dialect ships (LISTAGG / string_agg / GROUP_CONCAT) but whose
    // naive Spark spelling (concat over collect_list) is
    // partition-order-dependent and therefore non-deterministic.
    // The reproducible spelling: DISTINCT first (bounded domain), then
    // array_join(array_sort(collect_list(...))) so element order is a
    // property of the DATA, not the shuffle schedule — hash-checked
    // against DuckDB's string_agg(... ORDER BY ...). Per segment also
    // the distinct-priority count and total order volume. Scale: the
    // distinct pass map-side combines down to the ≤|segments|×|priorities|
    // grid before any shuffle; the collect_list only ever sees that
    // bounded grid, never raw orders.
    // TOP-K + OTHER rollup — the bounded-output reporting primitive: a
    // per-source language breakdown that can NEVER explode a dashboard,
    // because every source emits exactly top-3 rows plus one exact
    // 'zz_other' remainder (prefix keeps 'other' sorted last). The tail
    // is aggregated, not dropped — per-source masses are conserved
    // (spec law). This is the guard a 100 TB reporting layer puts in
    // front of every high-cardinality GROUP BY: output is O(sources·k)
    // regardless of the language cardinality. Scale: one map-combined
    // (source, lang) agg + a partitioned rank window over it.
    "q459_topk_other" -> { (s, d) =>
      val w = Window.partitionBy("source")
        .orderBy(col("n_docs").desc, col("lang"))
      val per = Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("rk", row_number().over(w))
      per.withColumn("bucket",
          when(col("rk") <= 3, col("lang")).otherwise(lit("zz_other")))
        .groupBy("source", "bucket")
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_langs"),
          min(col("rk")).cast("long").as("best_rank"))
        .orderBy("source", "best_rank")
    },

    "q151_listagg" -> { (s, d) =>
      val pairs = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
      pairs.groupBy("c_mktsegment")
        .agg(count(lit(1)).cast("long").as("n_priorities"),
          sum(col("n_orders")).cast("long").as("n_orders"),
          array_join(array_sort(collect_list(col("o_orderpriority"))), "|")
            .as("priorities"))
        .orderBy("c_mktsegment")
    }
  )

  def oracle: Map[String, String] = Map(
    "q459_topk_other" ->
      """WITH per AS (
        |  SELECT source, lang, COUNT(*) AS n_docs
        |  FROM documents GROUP BY 1, 2),
        |r AS (
        |  SELECT source, lang, n_docs,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_docs DESC, lang) AS rk
        |  FROM per)
        |SELECT source,
        |  CASE WHEN rk <= 3 THEN lang ELSE 'zz_other' END AS bucket,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_langs,
        |  CAST(MIN(rk) AS BIGINT) AS best_rank
        |FROM r GROUP BY 1, 2 ORDER BY source, best_rank""".stripMargin,

    "q151_listagg" ->
      """WITH pairs AS (
        |  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_priorities,
        |  CAST(SUM(n_orders) AS BIGINT) AS n_orders,
        |  string_agg(o_orderpriority, '|' ORDER BY o_orderpriority)
        |    AS priorities
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,

    "q56_window_family" ->
      """WITH t AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 50 = 0)
        |SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS q4,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
        |  CAST(lead(o_orderkey, 2, -1) OVER w AS BIGINT) AS next_key
        |FROM t
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q55_topk_aggregator" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_totalprice, o_orderkey
        |FROM r WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,

    // DuckDB's own HLL satisfies the same within-10% claim, so the
    // booleans (and the exact legs) hash-match across engines.
    "q36_approx_distinct" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    COUNT(DISTINCT l_partkey) AS exact_parts,
        |    approx_count_distinct(l_partkey) AS ap,
        |    COUNT(DISTINCT l_orderkey) AS exact_orders,
        |    approx_count_distinct(l_orderkey) AS ao
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(exact_parts AS BIGINT) AS exact_parts,
        | CAST(exact_orders AS BIGINT) AS exact_orders,
        | abs(ap - exact_parts) <= exact_parts * 0.1 AS approx_parts_ok,
        | abs(ao - exact_orders) <= exact_orders * 0.1 AS approx_orders_ok
        |FROM t ORDER BY l_returnflag""".stripMargin,

    "q124_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        | COALESCE(o_orderpriority, 'ALL') AS priority,
        | CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
        |   AS grp_id,
        | CAST(COUNT(*) AS BIGINT) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY status, priority, grp_id""".stripMargin,

    "q32_cube_sales" ->
      """SELECT COALESCE(r_name, 'ALL') AS region,
        | COALESCE(c_mktsegment, 'ALL') AS segment,
        | CAST(COUNT(*) AS BIGINT) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS acctbal_sum,
        | CAST(GROUPING(r_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS grp_id
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, c_mktsegment)
        |ORDER BY region, segment""".stripMargin,

    "q33_json_funcs" ->
      """WITH t AS (
        |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
        |FROM t WHERE k IS NOT NULL AND k % 3 = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q34_array_funcs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE doc_id % 17 = 0)
        |SELECT doc_id,
        | CAST(len(toks) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        | list_contains(toks, 'spark') AS has_spark,
        | array_to_string(toks[1:3], '_') AS first3,
        | (list_sort(list_distinct(toks)))[1] AS first_sorted,
        | CAST(len(list_filter(list_distinct(toks),
        |   x -> x IN ('spark','data','join'))) AS BIGINT) AS n_keyword
        |FROM t ORDER BY doc_id""".stripMargin,

    "q44_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q45_unpivot_metrics" ->
      """WITH w AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
        |    CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
        |  FROM orders GROUP BY 1)
        |SELECT yr, 'min_price' AS metric, min_price AS value FROM w
        |UNION ALL
        |SELECT yr, 'max_price' AS metric, max_price AS value FROM w
        |ORDER BY yr, metric""".stripMargin,

    "q43_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(COUNT(*) AS BIGINT) AS n_orders,
        | CAST(MIN(month(o_orderdate)) AS BIGINT) AS min_month,
        | CAST(MAX(day(o_orderdate)) AS BIGINT) AS max_dom,
        | CAST(MAX(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)) AS BIGINT) AS max_days,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS median_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q35_window_frames" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | CAST(dense_rank() OVER w AS BIGINT) AS drank,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS moving_sum,
        | last_value(o_orderkey) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders WHERE o_custkey % 19 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
