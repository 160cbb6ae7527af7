package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Relational.{dsum, money, rate}

/** Warehouse-analytics operator images (SURVEY.md §2E E57–E62): the
  * remaining classic TPC-H query shapes the corpus supports, adapted to
  * the driver schema (no partsupp/comment/phone columns — each image
  * keeps the SHAPE that makes the original a distinct optimizer/executor
  * exercise and re-expresses the predicate on available columns).
  *
  * Reference scope: the reference connector itself has no query surface
  * (it is a sink — `BigqueryStorageWriteSinkTask.java`); these extend the
  * §2B relational surface the way its BigQuery destination would be
  * queried downstream. All queries follow the SURVEY §7.0 determinism
  * contract: exact decimal money sums (`dsum`/`money`), BIGINT computed
  * integers, total output ordering, and integer cross-multiplication in
  * place of float division wherever a comparison or share is computed.
  */
object Warehouse {

  /** q494 priority-tiered ship SLA (days from order date). ONE CASE
    * expression interpolated into both engines' SQL so the contract has
    * a single definition; a deployment reads these from a vendor
    * contract table instead. */
  private[graft] val SlaCaseSql: String =
    "CASE o_orderpriority WHEN '1-URGENT' THEN 30 WHEN '2-HIGH' THEN 45" +
      " WHEN '3-MEDIUM' THEN 60 WHEN '4-NOT SPECIFIED' THEN 75 ELSE 90 END"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SUPPLIER SLA SCORECARD per nation — the vendor-management read
    // of the q359/q404 latency distributions: each line's ship delay
    // vs a priority-tiered SLA ([[SlaCaseSql]]), rolled up supplier →
    // nation so the table answers both "which region's supply base is
    // late" (ontime_ppm, avg_late_milli over late lines) and "is it
    // one bad vendor or systemic" (the min/max per-supplier on-time
    // ppm WITHIN the nation — a wide spread says one vendor, a tight
    // low band says systemic). Two-level aggregation: the lineitem ⋈
    // orders fact shuffle collapses to per-supplier partials first,
    // then the |suppliers|-sized grid joins the broadcast dimensions.
    "q494_supplier_sla" -> { (s, d) =>
      val late = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("sk"),
          (datediff(col("l_shipdate"), col("o_orderdate")) -
            expr(SlaCaseSql)).cast("long").as("late"))
      val perSupp = late.groupBy("sk")
        .agg(count(lit(1)).as("n"),
          sum(when(col("late") <= 0, 1L).otherwise(0L)).as("ontime"),
          sum(when(col("late") > 0, col("late")).otherwise(lit(0L)))
            .as("late_days"))
        .withColumn("s_ppm", expr("CAST(ontime * 1000000 DIV n AS BIGINT)"))
      perSupp
        .join(Tables.supplier(s, d).select(col("s_suppkey"),
          col("s_nationkey")), col("sk") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).cast("long").as("n_suppliers"),
          sum(col("n")).cast("long").as("n_lines"),
          expr("CAST(SUM(ontime) * 1000000 DIV SUM(n) AS BIGINT)")
            .as("ontime_ppm"),
          expr("CAST(SUM(late_days) * 1000 DIV SUM(n) AS BIGINT)")
            .as("avg_late_milli"),
          min(col("s_ppm")).cast("long").as("worst_supplier_ppm"),
          max(col("s_ppm")).cast("long").as("best_supplier_ppm"))
        .orderBy("n_name")
    },
    // WILSON-RANKING inversion audit — "how not to sort by average"
    // made measurable: within each nation, suppliers ranked by RAW
    // on-time ppm vs by the Wilson LOWER bound (q302's interval, the
    // z²=3.8416 mirrored-IEEE form — low-volume suppliers with lucky
    // streaks sink under the bound, which is the point). Per nation:
    // the strict-order inversion count between the two rankings and
    // whether the TOP supplier changes — the number that tells a
    // vendor-scorecard owner how much their naive sort misleads.
    // Candidates cap at the top-100 suppliers by line volume per
    // nation (row_number over the bounded nation key) so the pair
    // sweep is ≤ 100² per nation at ANY scale.
    "q499_wilson_rank_inversions" -> { (s, d) =>
      val perSupp = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("sk"),
          (datediff(col("l_shipdate"), col("o_orderdate")) -
            expr(SlaCaseSql)).cast("long").as("late"))
        .groupBy("sk")
        .agg(count(lit(1)).as("n"),
          sum(when(col("late") <= 0, 1L).otherwise(0L)).as("k"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"),
          col("s_nationkey")), col("sk") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("sk"), col("n"), col("k"),
          expr("CAST(k * 1000000 DIV n AS BIGINT)").as("ppm"),
          expr("(CAST(k AS DOUBLE) / n + 3.8416D / (2 * CAST(n AS DOUBLE))" +
            " - SQRT(3.8416D) * SQRT(CAST(k AS DOUBLE) / n" +
            " * (1 - CAST(k AS DOUBLE) / n) / n" +
            " + 3.8416D / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))" +
            " / (1 + 3.8416D / CAST(n AS DOUBLE))").as("wl"))
      val top = perSupp.withColumn("vol_rk",
          row_number().over(Window.partitionBy("n_name")
            .orderBy(col("n").desc, col("sk"))))
        .filter(col("vol_rk") <= 100).drop("vol_rk")
      val cached = Caches.shared(top)
      val pairs = cached.select(col("n_name"), col("sk").as("ska"),
          col("ppm").as("pa"), col("wl").as("wa"))
        .join(cached.select(col("n_name"), col("sk").as("skb"),
          col("ppm").as("pb"), col("wl").as("wb")), "n_name")
        .filter(col("ska") =!= col("skb"))
        .filter( // a precedes b in the raw order...
          (col("pa") > col("pb")) ||
            (col("pa") === col("pb") && col("ska") < col("skb")))
        .filter( // ...but b precedes a under the Wilson bound
          (col("wa") < col("wb")) ||
            (col("wa") === col("wb") && col("ska") > col("skb")))
      val inv = pairs.groupBy("n_name")
        .agg(count(lit(1)).cast("long").as("n_inversions"))
      val tops = cached.groupBy("n_name")
        .agg(max(struct(col("ppm"), (-col("sk")).as("nsk"))).as("t_raw"),
          max(struct(col("wl"), (-col("sk")).as("nsk"))).as("t_wl"),
          count(lit(1)).cast("long").as("n_suppliers"))
        .select(col("n_name"), col("n_suppliers"),
          (-col("t_raw.nsk")).cast("long").as("top1_raw_sk"),
          (-col("t_wl.nsk")).cast("long").as("top1_wilson_sk"))
      tops.join(inv, Seq("n_name"), "left")
        .select(col("n_name"), col("n_suppliers"),
          coalesce(col("n_inversions"), lit(0L)).as("n_inversions"),
          col("top1_raw_sk"), col("top1_wilson_sk"),
          when(col("top1_raw_sk") === col("top1_wilson_sk"), 0L)
            .otherwise(1L).as("top1_changed"))
        .orderBy("n_name")
    },

    // TPC-H Q13 image (customer order-count distribution): how many
    // customers placed 0, 1, 2, … qualifying orders (priority filter
    // standing in for Q13's o_comment NOT LIKE). The aggregate-BEFORE-
    // outer-join shape is the point: orders reduce to (custkey, cnt)
    // partials map-side first, so the left join against customer
    // carries one row per customer, never raw order rows — and the
    // zero-order customers the LEFT join manufactures are exactly the
    // rows an inner-join-then-agg plan would silently drop. Scale: one
    // shuffle of order partials + one shuffle of customer keys, then
    // the distribution grid (≤ max order count rows) map-combines;
    // AQE is free to broadcast the shrunken per-customer counts.
    "q167_cust_order_dist" -> { (s, d) =>
      val perCust = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      Tables.customer(s, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).cast("long").as("custdist"))
        .select(col("c_count").cast("long").as("c_count"), col("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q14 image (promotion revenue share): the share of one
    // ship-month's discounted revenue earned by PROMO-typed parts.
    // Conditional aggregation over ONE lineitem⨝part join — the
    // classic "percentage = two sums in one pass" shape; a two-query
    // plan (promo pass + total pass) would scan the join twice.
    // Share is exact: revenue accumulates in DECIMAL(18,4), shifts to
    // integer ten-thousandths-of-a-cent (×10⁶ exact — the product of
    // two 2-dp factors has ≤4 dp), and the ppm is integer floor
    // division. Magnitude rule (SURVEY §7.0): promo_u is already ×10⁶
    // micro-units, so the ppm numerator promo_u·10⁶ carries ×10¹² —
    // it leaves int64 at ~10⁷ revenue units, i.e. well inside sf0.1.
    // The numerator therefore widens to DECIMAL(38,0) (Spark) /
    // HUGEINT (DuckDB oracle) before the shift; the quotient is a ppm
    // ≤ 10⁶ and casts back to BIGINT exactly. Scale: the month filter
    // pushes into the lineitem scan (PushedFilters); part joins on
    // partkey broadcast-or-shuffle per AQE.
    "q168_promo_share" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"),
            money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
            .otherwise(lit(0).cast("decimal(12,2)"))).as("promo_d"),
          sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
            .as("total_d"))
        .select(
          expr("CAST(promo_d * 1000000 AS BIGINT)").as("promo_u"),
          expr("CAST(total_d * 1000000 AS BIGINT)").as("total_u"))
        .select(col("promo_u"), col("total_u"),
          expr("CAST(CAST(promo_u AS DECIMAL(38,0)) * 1000000 DIV total_u AS BIGINT)")
            .as("promo_ppm"))
    },

    // TPC-H Q19 image (disjunctive bracket join): three (brand, size,
    // quantity) brackets OR-ed into one join predicate. The shape that
    // separates an equi-join-with-residual plan from a nested-loop
    // disaster: Catalyst must extract l_partkey = p_partkey as the
    // equi key and evaluate the OR as a post-join residual. The part
    // side additionally carries the IMPLIED union prefilter
    // (brand ∈ {12,23,34} ∧ size ∈ [1,15]) spelled explicitly —
    // implied-by-OR filters across branch bounds are not something the
    // optimizer derives, and at 100 TB that prefilter is the difference
    // between broadcasting 3 brands' parts and shuffling the full part
    // table. Output: per-bracket discounted revenue + item count.
    "q169_bracket_revenue" -> { (s, d) =>
      val p = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#15") &&
          col("p_size").between(1, 15))
      val b1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)
      val b2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)
      val b3 = col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30)
      Tables.lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey") && (b1 || b2 || b3))
        .withColumn("bracket",
          when(b1, "B12-small").when(b2, "B23-mid").otherwise("B15-large"))
        .groupBy(col("bracket"))
        .agg(dsum(money(col("l_extendedprice")) *
          rate(lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).cast("long").as("n_items"))
        .orderBy(col("bracket"))
    },

    // TPC-H Q21 image (suppliers who kept orders waiting): in finished
    // multi-supplier orders, the supplier who was the ONLY late one
    // (ship > orderdate + 60 days standing in for receipt > commit).
    // Q21's EXISTS/NOT-EXISTS pair over lineitem self-joins is
    // re-expressed as ONE order-grain aggregation — n_supp and
    // n_late_supp as two COUNT(DISTINCT)s in one pass — joined back to
    // the distinct late (order, supplier) pairs: same semantics, two
    // scans fewer. Scale: everything shuffles once on orderkey (agg +
    // pair-distinct share the key), then the fault counts map-combine
    // on suppkey; the supplier dim broadcasts. Top-20 is TakeOrdered
    // with a full tiebreak.
    "q170_wait_faults" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val perOrder = li.groupBy(col("o_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
        .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      val latePairs = li.filter(col("late"))
        .select(col("l_orderkey").as("lo"), col("l_suppkey")).distinct()
      latePairs.join(perOrder, col("lo") === col("o_orderkey"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).cast("long").as("numwait"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("s_suppkey").cast("long").as("suppkey"),
          col("numwait"))
        .orderBy(col("numwait").desc, col("suppkey"))
        .limit(20)
    },

    // TPC-H Q22 image (lapsed rich customers): customers in a fixed
    // nation set with above-average positive balances and NO RECENT
    // orders (none since 1999 — this corpus gives every customer at
    // least one lifetime order, so Q22's "no orders at all" predicate
    // is re-expressed as recency lapse, same anti-join shape). Per
    // nation: how many and how much capital sits idle. The global
    // average never materializes as a float: the filter is the integer
    // cross-multiplication bal_cents·n_pos > sum_cents (exact at any
    // scale the cent sums fit int64, ≈10¹⁶ USD). The anti join is the
    // shape: customer LEFT ANTI recent-orders on custkey — at 100 TB a
    // NOT IN subquery that isn't null-hostile collapses to exactly
    // this plan, the date filter pushes into the orders scan, and the
    // one-row aggregate side broadcasts.
    "q171_idle_rich" -> { (s, d) =>
      val pool = Tables.customer(s, d)
        .filter(col("c_nationkey").isin(3, 7, 11, 14, 19, 21, 23) &&
          col("c_acctbal") > 0.0)
        .withColumn("bal_cents",
          expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      val avgRow = pool.agg(sum(col("bal_cents")).as("sum_cents"),
        count(lit(1)).as("n_pos"))
      pool.crossJoin(broadcast(avgRow))
        .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).cast("long").as("numcust"),
          sum(col("bal_cents")).cast("long").as("totacctbal_cents"))
        .orderBy(col("nationkey"))
    },

    // Nation × order-year revenue PIVOT (wide cross-tab): the
    // report-shaped rotation every BI layer asks of a warehouse. The
    // pivot column set is PINNED to the corpus' order-year domain
    // (1995–2001) so the output schema is static — a data-driven pivot
    // would make the schema a function of the data, which neither a
    // 100 TB job graph nor the oracle compare tolerates. Each cell is
    // an exact decimal sum surfaced as double; missing cells are 0
    // (COALESCE), distinguishing "traded nothing" from NULL-noise.
    // Scale: Spark's pivot compiles to ONE groupBy(n_name) with 7
    // conditional aggregates — one shuffle of |nations|×7 partials,
    // identical to the hand-written CASE spelling in the oracle; the
    // dims broadcast onto the orders fact.
    "q172_pivot_matrix" -> { (s, d) =>
      val years = 1995 to 2001
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), year(col("o_orderdate")).as("o_year"),
          money(col("o_totalprice")).as("price_d"))
      val wide = base.groupBy(col("n_name"))
        .pivot("o_year", years.map(y => y: Integer))
        .agg(sum(col("price_d")))
      years.foldLeft(wide) { (df, y) =>
        df.withColumn(s"y$y",
          coalesce(col(s"`$y`").cast("double"), lit(0.0)))
      }
        .select(col("n_name") +: years.map(y => col(s"y$y")): _*)
        .orderBy(col("n_name"))
    },

    // TPC-H Q9 image (product-type profit by nation and year): profit =
    // discounted revenue − a fixed 0.60 cost rate on retail price × qty
    // (the schema has no partsupp.supplycost; the SHAPE — a 5-way join
    // whose agg keys come from two different dimension arms — is what
    // Q9 exercises). All money stays exact decimal until the final
    // cents cast. Scale: the p_name filter prunes part FIRST (the only
    // selective predicate — it drives which lineitem rows survive the
    // partkey join); supplier→nation is a two-step broadcast dim;
    // orders joins on orderkey only to supply the year.
    "q186_profit_nation_year" -> { (s, d) =>
      val amount =
        money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")) -
          money(col("p_retailprice")) * rate(lit(0.6)) * money(col("l_quantity"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("widget")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(expr("CAST(count(1) AS BIGINT)").as("n_items"),
          sum(amount).as("profit_d"))
        // profit_d carries scale 6 (rate×rate×money product) — shift by
        // 10⁶, not 100, so the BIGINT cast is exact in both engines
        // (Spark truncates a fractional decimal, DuckDB rounds it)
        .select(col("nation"), col("o_year"), col("n_items"),
          expr("CAST(profit_d * 1000000 AS BIGINT)").as("profit_micro"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q12 image (shipmode/priority matrix → late-shipment audit):
    // per order priority, how many 1996-shipped items went out ≥ 90
    // days after the order was placed, split urgent vs not. The
    // conditional-count-over-a-join shape is Q12's; lateness is pure
    // integer µs arithmetic (the schema has no commit/receipt dates).
    // Scale: the ship-year filter pushes into the lineitem scan; ONE
    // orderkey join; the output grid is |priorities| rows.
    "q187_late_shipments" -> { (s, d) =>
      val lateUs = 90L * 86400000000L
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          sum(when(unix_micros(col("l_shipdate").cast("timestamp")) -
              unix_micros(col("o_orderdate").cast("timestamp")) >= lateUs, 1L)
            .otherwise(0L)).cast("long").as("n_late"))
        .withColumn("late_ppm",
          expr("CAST(n_late * 1000000 DIV n_items AS BIGINT)"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q16 image (supplier diversity per part group): distinct
    // suppliers and parts shipped per (brand, size bucket), excluding
    // one brand and excluding distrusted suppliers (negative account
    // balance — the comment-column proxy) via LEFT ANTI join, Q16's
    // NOT-IN shape. Scale: the anti join's right side is the tiny
    // filtered supplier set (broadcast); dual COUNT DISTINCT compiles
    // to one Expand ×2 over the join output — keys are fixed-width.
    "q188_supplier_diversity" -> { (s, d) =>
      val distrusted = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_brand") =!= "Brand#9"),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(distrusted), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"),
          expr("CAST(p_size DIV 5 AS BIGINT)").as("size_bucket"))
        .agg(countDistinct(col("l_suppkey")).cast("long").as("supplier_cnt"),
          countDistinct(col("l_partkey")).cast("long").as("part_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("size_bucket"))
    },

    // TPC-H Q17 image (small-quantity revenue): revenue locked up in
    // orders below 20% of their part's average order quantity, for one
    // brand. Q17's correlated scalar subquery (avg per part) is
    // DECORRELATED into one per-part aggregate joined back; the
    // threshold compare is integer cross-multiplication — qty <
    // 0.2·(sum/n) ⇔ 5·qty·n < sum — so no division and no float ever
    // enters the predicate. Output includes the /7 "yearly loss"
    // division as floor cents. Scale: the brand filter bounds the part
    // side BEFORE both joins; the per-part agg is map-combined and
    // AQE-broadcastable back against the same filtered join.
    "q189_small_qty_revenue" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_brand") === "Brand#1"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), money(col("l_quantity")).as("qty_d"),
          money(col("l_extendedprice")).as("price_d"))
      val perPart = li.groupBy("p_partkey")
        .agg(count(lit(1)).as("n"), sum(col("qty_d")).as("sum_qty"))
      li.join(perPart, "p_partkey")
        .filter(col("qty_d") * 5 * col("n") < col("sum_qty"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("price_d")).as("rev_d"))
        .select(col("n_rows"),
          expr("CAST(CAST(rev_d * 100 AS BIGINT) DIV 7 AS BIGINT)")
            .as("yearly_loss_cents"))
    },

    // TPC-H Q20 image (dominant suppliers of a part family): suppliers
    // who shipped MORE THAN HALF of a part's total 1996 volume, for
    // parts in one name family — Q20's nested EXISTS/IN chain spelled
    // as two grouped aggregates + a cross-multiplied dominance
    // threshold + one semi-style join back to supplier/nation. Strict
    // >50% means at most one dominant supplier per part, a fact the
    // spec asserts. Scale: name+year filters bound everything early;
    // per-(part,supp) and per-part aggs share the partkey shuffle; the
    // supplier/nation dims broadcast.
    "q190_dominant_supplier" -> { (s, d) =>
      val shipped = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.part(s, d).filter(col("p_name").contains("bolt")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("l_suppkey"),
          money(col("l_quantity")).as("qty_d"))
      val perPair = shipped.groupBy("p_partkey", "l_suppkey")
        .agg(sum(col("qty_d")).as("supp_qty"))
      val perPart = shipped.groupBy("p_partkey")
        .agg(sum(col("qty_d")).as("total_qty"))
      perPair.join(perPart, "p_partkey")
        .filter(col("supp_qty") * 2 > col("total_qty"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_name"), col("n_name").as("nation"))
        .agg(count(lit(1)).cast("long").as("n_parts_dominated"))
        .orderBy(col("s_name"))
    },

    // TPC-H Q2 image (min-cost supplier): for each part in a size
    // class, the supplier offering it at the LOWEST observed unit
    // price — the correlated-MIN-subquery shape, decorrelated into a
    // per-part min aggregate equality-joined back (ties: ALL minimal
    // suppliers survive, then the deterministic tiebreak picks one —
    // the oracle pins both). Unit price must be division-free: rows
    // join on cross-multiplied equality price_a·qty_b = price_b·qty_a
    // is wrong for MIN, so instead the min is taken over the exact
    // DECIMAL unit price computed at scale 6 (extendedprice/quantity
    // both 2-dp; the quotient is one mirrored division ROUNDED to
    // micro-units in BOTH engines before any comparison). Scale: part
    // filter first; per-part min agg map-combines; one partkey join.
    "q195_min_cost_supplier" -> { (s, d) =>
      val offers = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_size") === 15),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_brand"), col("l_suppkey"),
          expr("""CAST(floor(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
                 / CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)
                 * 1000000 + 0.5) AS BIGINT)""").as("unit_u"))
      val minPer = offers.groupBy("p_partkey").agg(min(col("unit_u")).as("min_u"))
      offers.join(minPer, "p_partkey")
        .filter(col("unit_u") === col("min_u"))
        .groupBy(col("p_partkey"), col("p_brand"), col("min_u"))
        .agg(min(col("l_suppkey")).cast("long").as("best_suppkey"),
          count(lit(1)).cast("long").as("n_tied"))
        .select(col("p_partkey").cast("long").as("p_partkey"), col("p_brand"),
          col("min_u"), col("best_suppkey"), col("n_tied"))
        .orderBy("p_partkey")
    },

    // TPC-H Q15 image (top supplier view): quarterly revenue per
    // supplier, then the supplier(s) achieving the GLOBAL MAX — the
    // scalar-aggregate-equality shape (a view + max(view) subquery).
    // Ties all return (the Q15 contract); revenue is exact decimal,
    // shifted ×10⁶ (scale-4 sum — a ×100 cents cast would truncate
    // differently across engines). Scale: one suppkey agg over the scan;
    // the one-row max broadcasts; the equality filter is a map-side
    // compare, never a sort.
    "q196_top_supplier" -> { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
          .as("rev_d"))
        .select(col("l_suppkey"),
          expr("CAST(rev_d * 1000000 AS BIGINT)").as("rev_micro"))
      val mx = rev.agg(max(col("rev_micro")).as("max_micro"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_micro") === col("max_micro"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
          col("rev_micro"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q3 image (shipping-priority top orders): one segment's
    // unshipped-revenue top-10 — the SELECTIVE-DIMS-FIRST shape: the
    // mktsegment filter shrinks customer before its join, the two date
    // filters push into the orders/lineitem scans, and the top-10 is
    // TakeOrdered over (orderkey, orderdate, priority) groups, never a
    // global sort. Revenue exact decimal ×10⁶.
    "q197_shipping_priority" -> { (s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d)
            .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
          .as("rev_d"))
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)")
            .as("orderdate_us"),
          col("o_orderpriority"),
          expr("CAST(rev_d * 1000000 AS BIGINT)").as("rev_micro"))
        .orderBy(col("rev_micro").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q4 image (order-priority checking): orders placed in one
    // quarter with AT LEAST ONE late line (shipped ≥ 60 days after
    // placement — the commit/receipt-date proxy), counted per priority.
    // The EXISTS shape is a LEFT SEMI join: the probe side never
    // duplicates orders however many lines are late, and the date
    // filters push into both scans. Lateness is integer µs arithmetic.
    "q198_priority_exists" -> { (s, d) =>
      val lateUs = 60L * 86400000000L
      val late = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .withColumn("ord_us", unix_micros(col("o_orderdate").cast("timestamp")))
        .join(late,
          col("o_orderkey") === col("l_orderkey") &&
            col("ship_us") - col("ord_us") >= lateUs,
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q8 image (national market share): of one customer-region's
    // ECONOMY-part market, the revenue share won by suppliers from one
    // nation, by order year — the TWO-ARM-DIMENSION shape (customer →
    // nation → region picks the market; supplier → nation marks the
    // competitor) over one fact scan, finished as the conditional-sum
    // ppm ratio (exact decimal µ-units, DECIMAL(38,0)/HUGEINT shift
    // per the magnitude rule). Both dimension arms broadcast.
    "q199_market_share" -> { (s, d) =>
      val custNation = Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables.supplier(s, d)
        .join(Tables.nation(s, d).withColumnRenamed("n_name", "s_nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nation"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(custNation, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("s_nation") === "NATION_3",
            money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
            .otherwise(lit(0).cast("decimal(12,2)"))).as("focus_d"),
          sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
            .as("total_d"))
        .select(col("o_year"),
          expr("CAST(focus_d * 1000000 AS BIGINT)").as("focus_u"),
          expr("CAST(total_d * 1000000 AS BIGINT)").as("total_u"),
          expr("CAST(CAST(focus_d * 1000000 AS DECIMAL(38,0)) * 1000000 DIV CAST(total_d * 1000000 AS BIGINT) AS BIGINT)")
            .as("share_ppm"))
        .orderBy("o_year")
    },

    // TPC-H Q10 image (returned-item reporting): the top-20 customers
    // by revenue RETURNED in one quarter — the aggregate-then-enrich
    // shape: revenue groups by custkey BEFORE the customer/nation dims
    // join (the shuffle carries (custkey, sum) partials, never raw
    // lineitem×customer rows), and the top-20 is TakeOrdered.
    "q200_returned_items" -> { (s, d) =>
      val ret = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(money(col("l_extendedprice")) * rate(lit(1) - col("l_discount")))
          .as("rev_d"))
      ret.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("n_name").as("nation"), col("c_acctbal").cast("double").as("acctbal"),
          expr("CAST(rev_d * 1000000 AS BIGINT)").as("rev_micro"))
        .orderBy(col("rev_micro").desc, col("c_custkey"))
        .limit(20)
    }
  )

  def oracle: Map[String, String] = Map(
    "q499_wilson_rank_inversions" -> (
      s"""WITH ps AS (
        |  SELECT l.l_suppkey AS sk, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate)
        |      - ($SlaCaseSql) <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1),
        |w AS (
        |  SELECT nn.n_name, ps.sk, ps.n, ps.k,
        |    CAST(ps.k * 1000000 // ps.n AS BIGINT) AS ppm,
        |    (CAST(ps.k AS DOUBLE) / ps.n + 3.8416 / (2 * CAST(ps.n AS DOUBLE))
        |      - SQRT(3.8416) * SQRT(CAST(ps.k AS DOUBLE) / ps.n
        |      * (1 - CAST(ps.k AS DOUBLE) / ps.n) / ps.n
        |      + 3.8416 / (4 * CAST(ps.n AS DOUBLE) * CAST(ps.n AS DOUBLE))))
        |      / (1 + 3.8416 / CAST(ps.n AS DOUBLE)) AS wl
        |  FROM ps JOIN supplier s ON s.s_suppkey = ps.sk
        |  JOIN nation nn ON nn.n_nationkey = s.s_nationkey),
        |top AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
        |      ORDER BY n DESC, sk) AS rk FROM w) x WHERE rk <= 100),
        |pairs AS (
        |  SELECT a.n_name
        |  FROM top a JOIN top b ON a.n_name = b.n_name AND a.sk <> b.sk
        |  WHERE (a.ppm > b.ppm OR (a.ppm = b.ppm AND a.sk < b.sk))
        |    AND (a.wl < b.wl OR (a.wl = b.wl AND a.sk > b.sk))),
        |inv AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_inversions
        |  FROM pairs GROUP BY 1),
        |tops AS (
        |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |    CAST(-struct_extract(MAX({'p': ppm, 'ns': -sk}), 'ns') AS BIGINT)
        |      AS top1_raw_sk,
        |    CAST(-struct_extract(MAX({'w': wl, 'ns': -sk}), 'ns') AS BIGINT)
        |      AS top1_wilson_sk
        |  FROM top GROUP BY 1)
        |SELECT t.n_name, t.n_suppliers,
        |  CAST(COALESCE(i.n_inversions, 0) AS BIGINT) AS n_inversions,
        |  t.top1_raw_sk, t.top1_wilson_sk,
        |  CAST(CASE WHEN t.top1_raw_sk = t.top1_wilson_sk THEN 0 ELSE 1 END
        |    AS BIGINT) AS top1_changed
        |FROM tops t LEFT JOIN inv i ON i.n_name = t.n_name
        |ORDER BY t.n_name""".stripMargin),

    "q494_supplier_sla" -> (
      s"""WITH late AS (
        |  SELECT l.l_suppkey AS sk,
        |    CAST(datediff('day', o.o_orderdate, l.l_shipdate)
        |      - ($SlaCaseSql) AS BIGINT) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |ps AS (
        |  SELECT sk, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN late <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ontime,
        |    CAST(SUM(CASE WHEN late > 0 THEN late ELSE 0 END) AS BIGINT)
        |      AS late_days
        |  FROM late GROUP BY 1),
        |ps2 AS (SELECT *, CAST(ontime * 1000000 // n AS BIGINT) AS s_ppm
        |  FROM ps)
        |SELECT n.n_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |  CAST(SUM(p.n) AS BIGINT) AS n_lines,
        |  CAST(SUM(p.ontime) * 1000000 // SUM(p.n) AS BIGINT) AS ontime_ppm,
        |  CAST(SUM(p.late_days) * 1000 // SUM(p.n) AS BIGINT)
        |    AS avg_late_milli,
        |  CAST(MIN(p.s_ppm) AS BIGINT) AS worst_supplier_ppm,
        |  CAST(MAX(p.s_ppm) AS BIGINT) AS best_supplier_ppm
        |FROM ps2 p JOIN supplier s ON s.s_suppkey = p.sk
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin),
    "q167_cust_order_dist" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderpriority <> '1-URGENT'
        |  GROUP BY o_custkey)
        |SELECT CAST(COALESCE(cnt, 0) AS BIGINT) AS c_count,
        |  CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
        |GROUP BY COALESCE(cnt, 0)
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q168_promo_share" ->
      """WITH agg AS (
        |  SELECT
        |    SUM(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(1 - l_discount AS DECIMAL(4,2))
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo_d,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        CAST(1 - l_discount AS DECIMAL(4,2))) AS total_d
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00')
        |SELECT CAST(promo_d * 1000000 AS BIGINT) AS promo_u,
        |  CAST(total_d * 1000000 AS BIGINT) AS total_u,
        |  CAST(CAST(CAST(promo_d * 1000000 AS BIGINT) AS HUGEINT) * 1000000
        |    // CAST(total_d * 1000000 AS BIGINT) AS BIGINT) AS promo_ppm
        |FROM agg""".stripMargin,

    "q169_bracket_revenue" ->
      """SELECT
        |  CASE
        |    WHEN p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |      AND l_quantity BETWEEN 1 AND 11 THEN 'B12-small'
        |    WHEN p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |      AND l_quantity BETWEEN 10 AND 20 THEN 'B23-mid'
        |    ELSE 'B15-large' END AS bracket,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY bracket ORDER BY bracket""".stripMargin,

    "q170_wait_faults" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_order AS (
        |  SELECT l_orderkey AS ok,
        |    COUNT(DISTINCT l_suppkey) AS n_supp,
        |    COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
        |  FROM li GROUP BY l_orderkey
        |  HAVING COUNT(DISTINCT l_suppkey) > 1
        |    AND COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) = 1),
        |late_pairs AS (
        |  SELECT DISTINCT l_orderkey AS lo, l_suppkey FROM li WHERE late)
        |SELECT s_name, CAST(l_suppkey AS BIGINT) AS suppkey,
        |  CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM late_pairs JOIN per_order ON lo = ok
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name, l_suppkey
        |ORDER BY numwait DESC, suppkey LIMIT 20""".stripMargin,

    "q171_idle_rich" ->
      """WITH pool AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer
        |  WHERE c_nationkey IN (3, 7, 11, 14, 19, 21, 23) AND c_acctbal > 0.0),
        |a AS (SELECT SUM(bal_cents) AS sum_cents, COUNT(*) AS n_pos FROM pool)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM pool, a
        |WHERE bal_cents * n_pos > sum_cents
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY nationkey""".stripMargin,

    "q172_pivot_matrix" ->
      """SELECT n_name,
        |  CAST(COALESCE(SUM(CASE WHEN y = 1995 THEN price_d END), 0) AS DOUBLE) AS y1995,
        |  CAST(COALESCE(SUM(CASE WHEN y = 1996 THEN price_d END), 0) AS DOUBLE) AS y1996,
        |  CAST(COALESCE(SUM(CASE WHEN y = 1997 THEN price_d END), 0) AS DOUBLE) AS y1997,
        |  CAST(COALESCE(SUM(CASE WHEN y = 1998 THEN price_d END), 0) AS DOUBLE) AS y1998,
        |  CAST(COALESCE(SUM(CASE WHEN y = 1999 THEN price_d END), 0) AS DOUBLE) AS y1999,
        |  CAST(COALESCE(SUM(CASE WHEN y = 2000 THEN price_d END), 0) AS DOUBLE) AS y2000,
        |  CAST(COALESCE(SUM(CASE WHEN y = 2001 THEN price_d END), 0) AS DOUBLE) AS y2001
        |FROM (
        |  SELECT n_name, EXTRACT(year FROM o_orderdate) AS y,
        |    CAST(o_totalprice AS DECIMAL(12,2)) AS price_d
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q186_profit_nation_year" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(
        |    CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      CAST(1 - l_discount AS DECIMAL(4,2)) -
        |    CAST(p_retailprice AS DECIMAL(12,2)) *
        |      CAST(0.6 AS DECIMAL(4,2)) *
        |      CAST(l_quantity AS DECIMAL(12,2))) * 1000000 AS BIGINT)
        |    AS profit_micro
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q187_late_shipments" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CASE WHEN epoch_us(CAST(l_shipdate AS TIMESTAMP)) -
        |      epoch_us(CAST(o_orderdate AS TIMESTAMP)) >= 7776000000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  CAST(SUM(CASE WHEN epoch_us(CAST(l_shipdate AS TIMESTAMP)) -
        |      epoch_us(CAST(o_orderdate AS TIMESTAMP)) >= 7776000000000
        |    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS late_ppm
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q188_supplier_diversity" ->
      """SELECT p_brand, CAST(p_size // 5 AS BIGINT) AS size_bucket,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS part_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_brand <> 'Brand#9'
        |WHERE l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, size_bucket""".stripMargin,

    "q189_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT p_partkey,
        |    CAST(l_quantity AS DECIMAL(12,2)) AS qty_d,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price_d
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'),
        |pp AS (
        |  SELECT p_partkey, COUNT(*) AS n, SUM(qty_d) AS sum_qty
        |  FROM li GROUP BY p_partkey)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(CAST(SUM(price_d) * 100 AS BIGINT) // 7 AS BIGINT)
        |    AS yearly_loss_cents
        |FROM li JOIN pp USING (p_partkey)
        |WHERE qty_d * 5 * n < sum_qty""".stripMargin,

    "q190_dominant_supplier" ->
      """WITH shipped AS (
        |  SELECT p_partkey, l_suppkey,
        |    CAST(l_quantity AS DECIMAL(12,2)) AS qty_d
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'),
        |pair AS (
        |  SELECT p_partkey, l_suppkey, SUM(qty_d) AS supp_qty
        |  FROM shipped GROUP BY 1, 2),
        |tot AS (
        |  SELECT p_partkey, SUM(qty_d) AS total_qty
        |  FROM shipped GROUP BY 1)
        |SELECT s_name, n_name AS nation,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts_dominated
        |FROM pair
        |JOIN tot USING (p_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE supp_qty * 2 > total_qty
        |GROUP BY 1, 2 ORDER BY s_name""".stripMargin,

    "q195_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT p_partkey, p_brand, l_suppkey,
        |    CAST(floor(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
        |      / CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)
        |      * 1000000 + 0.5) AS BIGINT) AS unit_u
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_size = 15),
        |mp AS (SELECT p_partkey, MIN(unit_u) AS min_u FROM offers GROUP BY 1)
        |SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand, min_u,
        |  CAST(MIN(l_suppkey) AS BIGINT) AS best_suppkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_tied
        |FROM offers JOIN mp USING (p_partkey)
        |WHERE unit_u = min_u
        |GROUP BY 1, 2, 3 ORDER BY p_partkey""".stripMargin,

    "q196_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - l_discount AS DECIMAL(4,2))) * 1000000 AS BIGINT)
        |      AS rev_micro
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey),
        |mx AS (SELECT MAX(rev_micro) AS max_micro FROM rev)
        |SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, rev_micro
        |FROM rev CROSS JOIN mx
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_micro = max_micro
        |ORDER BY s_suppkey""".stripMargin,

    "q197_shipping_priority" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
        |    AS orderdate_us,
        |  o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(1 - l_discount AS DECIMAL(4,2))) * 1000000 AS BIGINT)
        |    AS rev_micro
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY rev_micro DESC, o_orderkey LIMIT 10""".stripMargin,

    "q198_priority_exists" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) -
        |          epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) >= 5184000000000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q199_market_share" ->
      """WITH cust_in AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'),
        |sn AS (
        |  SELECT s_suppkey, n_name AS s_nation FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey),
        |base AS (
        |  SELECT EXTRACT(year FROM o_orderdate) AS o_year, s_nation,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      CAST(1 - l_discount AS DECIMAL(4,2)) AS rev
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN sn ON l_suppkey = s_suppkey
        |  WHERE o_custkey IN (SELECT c_custkey FROM cust_in)),
        |agg AS (
        |  SELECT o_year,
        |    SUM(CASE WHEN s_nation = 'NATION_3' THEN rev
        |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS focus_d,
        |    SUM(rev) AS total_d
        |  FROM base GROUP BY o_year)
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        |  CAST(focus_d * 1000000 AS BIGINT) AS focus_u,
        |  CAST(total_d * 1000000 AS BIGINT) AS total_u,
        |  CAST(CAST(CAST(focus_d * 1000000 AS BIGINT) AS HUGEINT) * 1000000
        |    // CAST(total_d * 1000000 AS BIGINT) AS BIGINT) AS share_ppm
        |FROM agg ORDER BY o_year""".stripMargin,

    "q200_returned_items" ->
      """WITH ret AS (
        |  SELECT o_custkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        CAST(1 - l_discount AS DECIMAL(4,2))) AS rev_d
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  WHERE l_returnflag = 'R'
        |  GROUP BY o_custkey)
        |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  n_name AS nation, CAST(c_acctbal AS DOUBLE) AS acctbal,
        |  CAST(rev_d * 1000000 AS BIGINT) AS rev_micro
        |FROM ret
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY rev_micro DESC, c_custkey LIMIT 20""".stripMargin
  )
}
