package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables

/** Relational operator surface (SURVEY.md §2B B1–B9) over the driver corpus.
  *
  * Every query follows the determinism contract (SURVEY.md §7.0):
  *   - total ordering over the full output key set;
  *   - double aggregates computed exactly via decimal accumulation, then
  *     cast back to double (`dsum`) so Spark and the DuckDB oracle produce
  *     bit-identical values regardless of partial-aggregation order;
  *   - computed integers cast to BIGINT to match DuckDB's wider int types.
  *
  * Scale notes: joins keep dimension tables (region/nation/supplier/part)
  * on the broadcast side; fact-fact joins shuffle on their natural keys and
  * rely on AQE for skew. Filters/projections are plain Catalyst expressions
  * so parquet pushdown and whole-stage codegen apply end-to-end.
  */
object Relational {

  /** Exact distributed sum of a double expression: accumulate as
    * DECIMAL(18,scale) (associative + exact, so shuffle order is
    * irrelevant), surface as double. Mirrors in SQL:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Source money columns are exact 2-decimal doubles (verified over the
    * corpus), so casting the FACTORS to decimal and multiplying in decimal
    * arithmetic is exact — unlike casting a double PRODUCT, whose
    * shortest-string (Spark) vs binary (DuckDB) decimal conversion can
    * disagree in the last place.
    */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  def rate(c: Column): Column  = c.cast(DecimalType(4, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CROSS-ENGINE SEMANTICS CANARY — the two-engine contract this
    // whole library's oracle methodology rests on, made EXECUTABLE:
    // one row per semantic probe (integer floor-division, decimal
    // cents, the md5→int64 hash bridge, RE2-safe regex, char-vs-byte
    // length, 1-based substring, the isqrt-exactness bound, epoch
    // microseconds, binary string collation, the negative-division
    // sign-split convention). Spark computes each with its idiom; the
    // oracle computes the SAME VALUE with DuckDB's idiom — any engine
    // upgrade that shifts a semantic breaks exactly one named row here
    // before it silently skews a real query. Literal-only: no scan, no
    // shuffle; the values are SF-invariant by design.
    "q500_semantics_canary" -> { (s, d) =>
      val probes: Seq[(String, String)] = Seq(
        "a_div_floor_pos" -> "CAST(7 DIV 2 AS STRING)",
        "b_mod_pos" -> "CAST(7 % 2 AS STRING)",
        "c_decimal_cents" ->
          ("CAST(CAST(CAST('12345.67' AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " AS STRING)"),
        "d_md5_hex" -> "md5('graft')",
        "e_md5_int64_bridge" ->
          ("CAST(CAST(conv(substring(md5('graft'), 1, 8), 16, 10)" +
            " AS BIGINT) AS STRING)"),
        "f_regex_runs" ->
          ("CAST(size(regexp_extract_all('a1b22c333', '[0-9]+', 0))" +
            " AS STRING)"),
        "g_char_len" -> "CAST(length('héllo') AS STRING)",
        "h_byte_len" -> "CAST(octet_length('héllo') AS STRING)",
        "i_substr_1based" -> "substring('abcdef', 2, 3)",
        "j_isqrt_2p52" ->
          ("CAST(CAST(FLOOR(SQRT(CAST(4503599627370496 AS DOUBLE)))" +
            " AS BIGINT) AS STRING)"),
        "k_epoch_us" ->
          "CAST(unix_micros(TIMESTAMP '2024-01-01 00:00:00') AS STRING)",
        "l_datediff_days" ->
          "CAST(datediff(DATE '2024-03-01', DATE '2024-01-01') AS STRING)",
        "m_collation_binary" ->
          "CASE WHEN 'B' < 'a' THEN 'binary' ELSE 'other' END",
        "n_concat_ws" -> "concat_ws(':', 'x', 'y')",
        "o_neg_div_convention" -> "CAST(-(7 DIV 2) AS STRING)")
      probes.map { case (name, e) =>
        s.range(1).select(lit(name).as("probe"), expr(e).as("value"))
      }.reduce(_ unionByName _).orderBy("probe")
    },
    // Incremental view maintenance — the aggregate-state MERGE a 100 TB
    // pipeline relies on to avoid full recomputes: yesterday's stored
    // partial state and today's batch partial state are UNIONED AND
    // RE-AGGREGATED, never rescanning history. The op's contract is
    // that every emitted statistic is an associatively-mergeable
    // algebra: count/sum merge by sum, min/max by min/max, mean
    // derives from merged (sum, count), and bounded-domain distinct
    // (langs ≤ ~20) merges as set union — exact, unlike a sketch.
    // The oracle computes the SAME numbers directly from the full
    // table in one pass, so the hash compare proves merge == rebuild.
    // (The unbounded-distinct analogue is q133's HLL registers, whose
    // max-merge the same way. Here the two partials simulate the
    // stored base + new batch via a doc_id parity split.)
    "q138_incremental_agg" -> { (s, d) =>
      def partial(f: Column) = Tables.documents(s, d).filter(f)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"),
          min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"),
          collect_set(col("lang")).as("langs"))
      partial(col("doc_id") % 2 === 0)
        .unionByName(partial(col("doc_id") % 2 === 1))
        .groupBy("source")
        .agg(sum(col("n")).cast("long").as("n_docs"),
          sum(col("sc")).cast("long").as("sum_chars"),
          min(col("mn")).cast("long").as("min_chars"),
          max(col("mx")).cast("long").as("max_chars"),
          size(array_distinct(flatten(collect_list(col("langs")))))
            .cast("long").as("n_langs"))
        .withColumn("mean_chars", expr("CAST(sum_chars DIV n_docs AS BIGINT)"))
        .orderBy("source")
    },

    // B3/B1: scan + filter + hash aggregation, TPC-H Q1 image.
    "q01_pricing_summary" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")) * rate(lit(1) + col("l_tax")))
            .cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // B2/B3: multi-way join with broadcast dims, TPC-H Q5 image.
    "q02_revenue_by_nation" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val ord  = Tables.orders(s, d)
      val li   = Tables.lineitem(s, d)
      val nat  = Tables.nation(s, d)
      val reg  = Tables.region(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg.filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // B2 completion, TPC-H Q7 image: bidirectional trade volume between
    // two trade BLOCS (nation key mod 5 — the exact single-nation pair
    // is empty at the smallest SF; the bloc generalization keeps Q7's
    // double-dimension semantics at every scale) by ship year — the
    // join shape where customer nation AND supplier nation bind on the
    // same fact row: two independent broadcast legs against one fact
    // scan, conditional pair filtering, year bucketing. Revenue in the
    // exact-decimal idiom; the (bloc, bloc, year) key space is bounded
    // by construction.
    "q126_nation_trade" -> { (s, d) =>
      def blocs(nk: String, out: String) = Tables.nation(s, d)
        .select(col("n_nationkey").as(nk),
          concat(lit("BLOC_"), (col("n_nationkey") % 5).cast("string")).as(out))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(blocs("c_nk", "cust_bloc")), col("c_nationkey") === col("c_nk"))
        .join(broadcast(blocs("s_nk", "supp_bloc")), col("s_nationkey") === col("s_nk"))
        .filter((col("cust_bloc") === "BLOC_1" && col("supp_bloc") === "BLOC_2") ||
                (col("cust_bloc") === "BLOC_2" && col("supp_bloc") === "BLOC_1"))
        .withColumn("l_year", year(col("l_shipdate")).cast("long"))
        .groupBy("cust_bloc", "supp_bloc", "l_year")
        .agg(sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
               .cast("double").as("revenue"),
             count(lit(1)).cast("long").as("n_items"))
        .orderBy("cust_bloc", "supp_bloc", "l_year")
    },

    // NATION-PAIR trade IMBALANCE — the macro read on q126's bilateral
    // flows: for every unordered customer-nation × supplier-nation pair
    // with traffic in BOTH directions, the flow cents each way and the
    // imbalance |a−b|·10⁶ DIV (a+b) — the surplus/deficit statistic
    // (1e6 = fully one-sided, 0 = balanced). Cents are the exact
    // decimal convention; restricting to two-way pairs keeps the
    // division total (one-way pairs are reported by q126's shape, not
    // this ratio). Scale: the one fact shuffle collapses onto the
    // ≤ nations² directed grid before the pair join; dims broadcast.
    "q503_trade_imbalance" -> { (s, d) =>
      val directed = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("cn"), col("s_nationkey").as("sn"),
          (money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
            .as("v"))
        .groupBy("cn", "sn")
        // the 4-decimal discount product leaves fractional cents: FLOOR
        // explicitly — a bare CAST truncates in Spark but ROUNDS in
        // DuckDB (one-ulp cents drift, caught by the sf0.01 gate)
        .agg(expr("CAST(FLOOR(SUM(v) * 100) AS BIGINT)").as("cents"),
          count(lit(1)).as("n"))
      // ONE conditional aggregation over the canonical (least, greatest)
      // pair — no self-join (a dual reference to the directed CTE sent
      // DuckDB's optimizer into a spilling plan at sf1; this shape is
      // one exchange cheaper on Spark too); both-directions-present is
      // a COUNT(*) = 2 filter since (cn, sn) rows are distinct, and it
      // ALSO excludes the diagonal — an explicit cn <> sn prefilter is
      // deliberately absent (DuckDB pushed it below the aggregation
      // into a customer × supplier `!=` NESTED-LOOP join, a 1.5·10⁹-row
      // intermediate that spilled 78 GB at sf1 — found by this gate)
      directed
        .groupBy(least(col("cn"), col("sn")).as("na"),
          greatest(col("cn"), col("sn")).as("nb"))
        .agg(sum(when(col("cn") < col("sn"), col("cents")).otherwise(0L))
            .as("cents_ab"),
          sum(when(col("cn") > col("sn"), col("cents")).otherwise(0L))
            .as("cents_ba"),
          sum(col("n")).as("nl"), count(lit(1)).as("dirs"))
        .filter(col("dirs") === 2)
        .select(col("na").cast("long").as("nation_a"),
          col("nb").cast("long").as("nation_b"),
          col("cents_ab").cast("long").as("cents_a_buys_from_b"),
          col("cents_ba").cast("long").as("cents_b_buys_from_a"),
          col("nl").cast("long").as("n_lines"),
          expr("CAST(ABS(cents_ab - cents_ba) * 1000000" +
            " DIV (cents_ab + cents_ba) AS BIGINT)").as("imbalance_ppm"))
        .orderBy("nation_a", "nation_b")
    },

    // B3 completion, TPC-H Q11 image: per-part stock value filtered by
    // a GLOBAL scalar threshold — the uncorrelated-scalar-subquery
    // shape q51's correlated form does not cover. The threshold is
    // SCALE-FREE (parts above 1.3× the mean per-part share: value ·
    // n_parts · 10 > 13 · total — a fixed fraction of total would
    // select nothing once the part count outgrows it), compared
    // division-free in exact decimals; the one-row global aggregate
    // broadcasts and the top-k is TakeOrdered.
    "q127_important_stock" -> { (s, d) =>
      val stock = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(money(col("p_retailprice")) * money(col("l_quantity")))
          .as("value_d"))
      val tot = stock.agg(sum(col("value_d")).as("total_d"),
        count(lit(1)).as("n_parts"))
      stock.crossJoin(broadcast(tot))
        .filter(col("value_d") * col("n_parts") * 10 > col("total_d") * 13)
        .select(col("partkey"),
          col("value_d").cast("double").as("stock_value"),
          col("total_d").cast("double").as("total_value"))
        .orderBy(col("stock_value").desc, col("partkey"))
        .limit(25)
    },

    // TPC-H Q18 image (large-volume customers): orders whose total
    // lineitem quantity clears a HAVING threshold, enriched with the
    // customer — the group-filter-then-join shape (aggregate first,
    // join the survivors) that a naive join-first plan gets backwards.
    // The quantity aggregation runs BEFORE any join, so the
    // order-grain shuffle carries (orderkey, sum) partial aggregates,
    // never raw lineitem×customer rows; the >300 filter then shrinks
    // the join input to the rare heavy orders (HAVING pushes into the
    // agg), and the final top-100 is TakeOrdered with a full
    // deterministic tiebreak, never a global sort. Quantity sums in
    // exact decimal (dsum) per the money-column rule.
    "q155_big_orders" -> { (s, d) =>
      val heavy = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      heavy.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Revenue-concentration (Lorenz/Pareto) profile: customer lifetime
    // value bucketed by power-of-two cents (the q133/q159 bitlength
    // trick — no quantiles, no global rank), with cumulative
    // richest-first share of revenue and of customers per bucket. The
    // "top X% of customers hold Y% of revenue" view, exact in integer
    // cents. The cumulative is NOT a window: per the repo's
    // no-unpartitioned-window rule it is a triangular self-join of the
    // ≤64-row bucket grid (b.bucket ≥ a.bucket) — bounded at 64² cells
    // at ANY corpus size. Customer totals are one map-combined key agg;
    // everything after lives on the bucket grid.
    "q166_revenue_concentration" -> { (s, d) =>
      val byBucket = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(money(col("o_totalprice"))).as("rev_d"))
        .withColumn("rev_cents", expr("CAST(rev_d * 100 AS BIGINT)"))
        .withColumn("bucket", expr("CAST(length(bin(rev_cents)) AS BIGINT)"))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("long").as("n_customers"),
          sum(col("rev_cents")).cast("long").as("rev_cents"))
      val tot = byBucket.agg(sum(col("rev_cents")).cast("long").as("total_cents"),
        sum(col("n_customers")).cast("long").as("total_cust"))
      byBucket.as("a")
        .join(byBucket.as("b"), col("b.bucket") >= col("a.bucket"))
        .groupBy(col("a.bucket").as("bucket"),
          col("a.n_customers").as("n_customers"),
          col("a.rev_cents").as("rev_cents"))
        .agg(sum(col("b.rev_cents")).cast("long").as("cum_rev_cents"),
          sum(col("b.n_customers")).cast("long").as("cum_customers"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_customers"), col("rev_cents"),
          expr("CAST(CAST(cum_rev_cents AS DECIMAL(38,0)) * 1000000 DIV total_cents AS BIGINT)")
            .as("cum_rev_ppm"),
          expr("CAST(cum_customers * 1000000 DIV total_cust AS BIGINT)")
            .as("cum_cust_ppm"))
        .orderBy(col("bucket").desc)
    },

    // Row-level table-version DIFF audit — the data-regression check
    // run between two snapshots of the same table before promoting a
    // rewrite (compaction, migration, backfill): full-outer join on
    // the key, classify every row added / deleted / modified /
    // unchanged. The v2 snapshot is derived deterministically from v1
    // (price bump on keys ≡0 mod 97, drop keys ≡0 mod 89, re-key
    // insert for keys ≡0 mod 83) so the expected counts are a pure
    // function of the data — no fixtures. Column comparison uses
    // null-safe equality; classification precedence (added/deleted
    // before modified) is total. Scale: ONE key equi-join (both sides
    // shuffle once on the key), then a 4-row rollup — the shuffle
    // carries only the compared columns, not full rows.
    "q162_table_diff" -> { (s, d) =>
      val v1 = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price1"),
          col("o_orderstatus").as("status1"))
      val base = Tables.orders(s, d)
      val v2 = base.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")).as("price2"),
          col("o_orderstatus").as("status2"))
        .unionByName(base.filter(col("o_orderkey") % 83 === 0)
          .select((col("o_orderkey") + 1000000000L).as("k"),
            col("o_totalprice").as("price2"),
            col("o_orderstatus").as("status2")))
      v1.join(v2, Seq("k"), "full_outer")
        .withColumn("klass",
          when(col("price1").isNull, "added")
            .when(col("price2").isNull, "deleted")
            .when(!(col("price1") <=> col("price2")) ||
              !(col("status1") <=> col("status2")), "modified")
            .otherwise("unchanged"))
        .groupBy("klass")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          min(col("k")).cast("long").as("min_key"),
          max(col("k")).cast("long").as("max_key"))
        .orderBy("klass")
    },

    // B7: global sort + limit (top-k) with deterministic tiebreak.
    "q03_topk_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // B6: window functions — row_number + lag per group, top-3 per customer.
    "q04_window_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("run_spend",
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice", "prev_price", "run_spend")
        .orderBy("o_custkey", "rn")
    },

    // B5: rollup over the region→nation hierarchy.
    "q05_rollup_sales" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val nat  = Tables.nation(s, d)
      val reg  = Tables.region(s, d)
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             dsum(col("c_acctbal"), 2).as("acctbal_sum"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
                coalesce(col("n_name"), lit("ALL")).as("nation"),
                col("n_cust"), col("acctbal_sum"))
        .orderBy("region", "nation")
    },

    // B8: set operations — UNION / INTERSECT / EXCEPT (distinct semantics).
    "q06_setops" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val ord  = Tables.orders(s, d)
      val building = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val bigSpenders = ord.filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("custkey"))
      val finished = ord.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val positive = cust.filter(col("c_acctbal") > 0.0)
        .select(col("c_custkey").as("custkey"))
      building.union(bigSpenders).distinct()
        .intersect(positive)
        .except(finished)
        .orderBy("custkey")
    },

    // B2: left-semi / left-anti joins, aggregated per segment.
    "q07_semi_anti" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val ord  = Tables.orders(s, d).select(col("o_custkey"))
      val withOrders = cust
        .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with"))
      val withoutOrders = cust
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without"))
      withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
                coalesce(col("n_with"), lit(0L)).as("n_with"),
                coalesce(col("n_without"), lit(0L)).as("n_without"))
        .orderBy("c_mktsegment")
    },

    // B9: scalar function sampler — string/date/math, all exactly
    // reproducible across engines (no transcendental functions except
    // correctly-rounded sqrt).
    "q08_scalar_sampler" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") % 7 === 0)
        .select(
          col("p_partkey"),
          upper(col("p_type")).as("type_upper"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          abs(col("p_size") - 25).cast("long").as("size_dist"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          ceil(col("p_retailprice")).cast("long").as("price_ceil"),
          sqrt(col("p_retailprice")).as("price_sqrt"),
          (col("p_partkey") % 97).as("key_mod"))
        .orderBy("p_partkey")
    },

    // B4: exact distinct aggregation.
    "q09_distinct_stats" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val nat  = Tables.nation(s, d)
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             countDistinct(col("c_mktsegment")).as("n_segments"),
             dsum(col("c_acctbal"), 2).as("acctbal_sum"))
        .orderBy("n_name")
    },

    // B1/B3: tight filtered aggregate, TPC-H Q6 image (single row).
    "q10_filtered_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                col("l_discount") >= 0.02 && col("l_discount") <= 0.09 &&
                col("l_quantity") < 24)
        .agg(sum(money(col("l_extendedprice")) * rate(col("l_discount")))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_items"))
    },

    // B2/B9 + spark.sql interop: correlated scalar subqueries (TPC-H
    // Q17-style "above this customer's average") — Catalyst decorrelates
    // both subqueries into aggregate + join; no per-row re-execution.
    // Division-free comparison (price·count·2 > sum·3 ⇔ price > 1.5·avg)
    // keeps every operand an exact decimal/integer — decimal division
    // rounding is the one arithmetic the two engines may disagree on.
    "q51_correlated_subq" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("graft_orders")
      Tables.customer(s, d).createOrReplaceTempView("graft_customer")
      s.sql("""
        SELECT c_mktsegment,
          CAST(COUNT(*) AS BIGINT) AS n_big_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM graft_orders o JOIN graft_customer c ON o_custkey = c_custkey
        WHERE CAST(o_totalprice AS DECIMAL(12,2))
                * (SELECT COUNT(*) FROM graft_orders o2
                   WHERE o2.o_custkey = o.o_custkey) * 2
              > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(12,2)))
                 FROM graft_orders o2 WHERE o2.o_custkey = o.o_custkey) * 3
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }
  )

  def oracle: Map[String, String] = Map(
    "q500_semantics_canary" ->
      """SELECT probe, value FROM (
        |  SELECT 'a_div_floor_pos' AS probe, CAST(7 // 2 AS VARCHAR) AS value
        |  UNION ALL SELECT 'b_mod_pos', CAST(7 % 2 AS VARCHAR)
        |  UNION ALL SELECT 'c_decimal_cents',
        |    CAST(CAST(CAST('12345.67' AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS VARCHAR)
        |  UNION ALL SELECT 'd_md5_hex', md5('graft')
        |  UNION ALL SELECT 'e_md5_int64_bridge',
        |    CAST(('0x' || substr(md5('graft'), 1, 8))::BIGINT AS VARCHAR)
        |  UNION ALL SELECT 'f_regex_runs',
        |    CAST(len(regexp_extract_all('a1b22c333', '[0-9]+')) AS VARCHAR)
        |  UNION ALL SELECT 'g_char_len', CAST(length('héllo') AS VARCHAR)
        |  UNION ALL SELECT 'h_byte_len', CAST(strlen('héllo') AS VARCHAR)
        |  UNION ALL SELECT 'i_substr_1based', substr('abcdef', 2, 3)
        |  UNION ALL SELECT 'j_isqrt_2p52',
        |    CAST(CAST(FLOOR(SQRT(CAST(4503599627370496 AS DOUBLE)))
        |      AS BIGINT) AS VARCHAR)
        |  UNION ALL SELECT 'k_epoch_us',
        |    CAST(epoch_us(TIMESTAMP '2024-01-01 00:00:00') AS VARCHAR)
        |  UNION ALL SELECT 'l_datediff_days',
        |    CAST(datediff('day', DATE '2024-01-01', DATE '2024-03-01')
        |      AS VARCHAR)
        |  UNION ALL SELECT 'm_collation_binary',
        |    CASE WHEN 'B' < 'a' THEN 'binary' ELSE 'other' END
        |  UNION ALL SELECT 'n_concat_ws', concat_ws(':', 'x', 'y')
        |  UNION ALL SELECT 'o_neg_div_convention',
        |    CAST(-(7 // 2) AS VARCHAR)
        |) ORDER BY probe""".stripMargin,
    // one-pass direct recompute — the rebuild the Spark-side partial
    // merge must reproduce bit-for-bit
    "q138_incremental_agg" ->
      """SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q503_trade_imbalance" ->
      """WITH directed AS (
        |  SELECT c_nationkey AS cn, s_nationkey AS sn,
        |    CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - l_discount AS DECIMAL(4,2))) * 100) AS BIGINT)
        |      AS cents,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT LEAST(cn, sn) AS na, GREATEST(cn, sn) AS nb,
        |    SUM(CASE WHEN cn < sn THEN cents ELSE 0 END) AS cents_ab,
        |    SUM(CASE WHEN cn > sn THEN cents ELSE 0 END) AS cents_ba,
        |    SUM(n) AS nl, COUNT(*) AS dirs
        |  FROM directed GROUP BY 1, 2)
        |SELECT CAST(na AS BIGINT) AS nation_a,
        |  CAST(nb AS BIGINT) AS nation_b,
        |  CAST(cents_ab AS BIGINT) AS cents_a_buys_from_b,
        |  CAST(cents_ba AS BIGINT) AS cents_b_buys_from_a,
        |  CAST(nl AS BIGINT) AS n_lines,
        |  CAST(ABS(cents_ab - cents_ba) * 1000000
        |    // (cents_ab + cents_ba) AS BIGINT) AS imbalance_ppm
        |FROM pairs WHERE dirs = 2
        |ORDER BY nation_a, nation_b""".stripMargin,

    "q126_nation_trade" ->
      """SELECT 'BLOC_' || (nc.n_nationkey % 5) AS cust_bloc,
        |  'BLOC_' || (ns.n_nationkey % 5) AS supp_bloc,
        |  CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |WHERE (nc.n_nationkey % 5 = 1 AND ns.n_nationkey % 5 = 2)
        |   OR (nc.n_nationkey % 5 = 2 AND ns.n_nationkey % 5 = 1)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q166_revenue_concentration" ->
      """WITH cr AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
        |      AS rev_cents
        |  FROM orders GROUP BY 1),
        |bb AS (
        |  SELECT length(bin(rev_cents)) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
        |  FROM cr GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
        |    CAST(SUM(n_customers) AS BIGINT) AS total_cust
        |  FROM bb),
        |cum AS (
        |  SELECT a.bucket, a.n_customers, a.rev_cents,
        |    CAST(SUM(b.rev_cents) AS BIGINT) AS cum_rev_cents,
        |    CAST(SUM(b.n_customers) AS BIGINT) AS cum_customers
        |  FROM bb a JOIN bb b ON b.bucket >= a.bucket
        |  GROUP BY 1, 2, 3)
        |SELECT CAST(bucket AS BIGINT) AS bucket, n_customers, rev_cents,
        |  CAST(CAST(cum_rev_cents AS HUGEINT) * 1000000 // total_cents AS BIGINT) AS cum_rev_ppm,
        |  CAST(cum_customers * 1000000 // total_cust AS BIGINT) AS cum_cust_ppm
        |FROM cum CROSS JOIN tot ORDER BY bucket DESC""".stripMargin,

    "q162_table_diff" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, o_totalprice AS price1,
        |    o_orderstatus AS status1
        |  FROM orders),
        |v2 AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS price2,
        |    o_orderstatus AS status2
        |  FROM orders WHERE o_orderkey % 89 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000 AS k, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 83 = 0),
        |j AS (
        |  SELECT COALESCE(v1.k, v2.k) AS k,
        |    CASE WHEN v1.price1 IS NULL THEN 'added'
        |         WHEN v2.price2 IS NULL THEN 'deleted'
        |         WHEN v1.price1 IS DISTINCT FROM v2.price2
        |           OR v1.status1 IS DISTINCT FROM v2.status2 THEN 'modified'
        |         ELSE 'unchanged' END AS klass
        |  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
        |SELECT klass, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(MIN(k) AS BIGINT) AS min_key,
        |  CAST(MAX(k) AS BIGINT) AS max_key
        |FROM j GROUP BY klass ORDER BY klass""".stripMargin,

    "q155_big_orders" ->
      """WITH heavy AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 300.0)
        |SELECT c_name, o_custkey, o_orderkey, o_orderdate,
        |  o_totalprice, sum_qty
        |FROM heavy
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q127_important_stock" ->
      """WITH stock AS (
        |  SELECT l_partkey AS partkey,
        |    SUM(CAST(p_retailprice AS DECIMAL(12,2)) *
        |        CAST(l_quantity AS DECIMAL(12,2))) AS value_d
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY l_partkey),
        |tot AS (SELECT SUM(value_d) AS total_d, COUNT(*) AS n_parts FROM stock)
        |SELECT partkey,
        |  CAST(value_d AS DOUBLE) AS stock_value,
        |  CAST(total_d AS DOUBLE) AS total_value
        |FROM stock, tot
        |WHERE value_d * n_parts * 10 > total_d * 13
        |ORDER BY stock_value DESC, partkey LIMIT 25""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        | CAST(COUNT(*) AS BIGINT) AS count_order,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q03_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q04_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice, prev_price, run_spend
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    lag(o_totalprice, 1) OVER w AS prev_price,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q05_rollup_sales" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        | CAST(COUNT(*) AS BIGINT) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "q06_setops" ->
      """SELECT custkey FROM (
        |  SELECT custkey FROM (
        |    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    UNION
        |    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
        |  ) u
        |  INTERSECT
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0.0
        |) i
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q07_semi_anti" ->
      """SELECT c_mktsegment,
        | CAST(COUNT(o.k) AS BIGINT) AS n_with,
        | CAST(COUNT(*) - COUNT(o.k) AS BIGINT) AS n_without
        |FROM customer
        |LEFT JOIN (SELECT DISTINCT o_custkey AS k FROM orders) o ON c_custkey = o.k
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q08_scalar_sampler" ->
      """SELECT p_partkey,
        | UPPER(p_type) AS type_upper,
        | SUBSTRING(p_name, 1, 8) AS name_prefix,
        | CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        | p_brand || '#' || p_type AS brand_type,
        | CAST(ABS(p_size - 25) AS BIGINT) AS size_dist,
        | CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
        | CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
        | SQRT(p_retailprice) AS price_sqrt,
        | p_partkey % 97 AS key_mod
        |FROM part
        |WHERE p_partkey % 7 = 0
        |ORDER BY p_partkey""".stripMargin,

    "q09_distinct_stats" ->
      """SELECT n_name,
        | CAST(COUNT(*) AS BIGINT) AS n_cust,
        | CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q10_filtered_agg" ->
      """SELECT
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.02 AND l_discount <= 0.09
        |  AND l_quantity < 24""".stripMargin,

    "q51_correlated_subq" ->
      """SELECT c_mktsegment,
        | CAST(COUNT(*) AS BIGINT) AS n_big_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN customer c ON o_custkey = c_custkey
        |WHERE CAST(o_totalprice AS DECIMAL(12,2))
        |        * (SELECT COUNT(*) FROM orders o2
        |           WHERE o2.o_custkey = o.o_custkey) * 2
        |      > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(12,2)))
        |         FROM orders o2 WHERE o2.o_custkey = o.o_custkey) * 3
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
