package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarehouseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q167 distribution partitions the customer table exactly") {
    val rows = SparkEntry.queries("q167_cust_order_dist")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nCust = graft.model.Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust,
      "every customer falls in exactly one count bucket")
    // the LEFT join must manufacture the zero-order bucket: with a
    // priority filter dropping ~20% of orders, some customer at this
    // SF has none left (and if not, the bucket is simply absent, never
    // negative)
    rows.foreach(r => assert(r.getAs[Long]("c_count") >= 0L))
  }

  test("q168 promo share is a valid exact ppm fraction") {
    val r = SparkEntry.queries("q168_promo_share")(spark, sf).collect()(0)
    val (promo, total, ppm) = (r.getAs[Long]("promo_u"),
      r.getAs[Long]("total_u"), r.getAs[Long]("promo_ppm"))
    assert(total > 0 && promo >= 0 && promo <= total)
    assert(ppm == promo * 1000000L / total, "ppm must be the floor division")
  }

  test("q169 brackets are disjoint and each row satisfies its own bracket") {
    val rows = SparkEntry.queries("q169_bracket_revenue")(spark, sf).collect()
    val labels = rows.map(_.getAs[String]("bracket")).toSet
    assert(labels.subsetOf(Set("B12-small", "B23-mid", "B15-large")))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_items") > 0)
      assert(r.getAs[Double]("revenue") > 0.0)
    }
    // cross-check one bracket against a direct single-bracket count
    val direct = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)).count()
    val b12 = rows.find(_.getAs[String]("bracket") == "B12-small")
      .map(_.getAs[Long]("n_items")).getOrElse(0L)
    assert(b12 == direct, s"B12 bracket count $b12 != direct $direct")
  }

  test("q170 wait faults only name suppliers late in solo-late orders") {
    val rows = SparkEntry.queries("q170_wait_faults")(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("numwait") >= 1))
    // numwait totals can never exceed the number of qualifying orders
    val li = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val qualifying = li.groupBy("o_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("nl"))
      .filter(col("ns") > 1 && col("nl") === 1).count()
    assert(rows.map(_.getAs[Long]("numwait")).sum <= qualifying)
  }

  test("q171 lapsed-rich customers have no recent orders, above-avg balance") {
    val rows = SparkEntry.queries("q171_idle_rich")(spark, sf).collect()
    val nations = Set(3L, 7L, 11L, 14L, 19L, 21L, 23L)
    rows.foreach { r =>
      assert(nations.contains(r.getAs[Long]("nationkey")))
      assert(r.getAs[Long]("numcust") > 0)
      // every survivor is strictly above the pool mean, so the group
      // sum is positive by construction
      assert(r.getAs[Long]("totacctbal_cents") > 0)
    }
    // anti-join correctness: no surviving nation's customer may have a
    // post-cutoff order (cross-check via the inverse inner join)
    val recent = graft.model.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val pool = graft.model.Tables.customer(spark, sf)
      .filter(col("c_nationkey").isin(3, 7, 11, 14, 19, 21, 23) &&
        col("c_acctbal") > 0.0)
    val lapsed = pool.join(recent,
      col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(rows.map(_.getAs[Long]("numcust")).sum <= lapsed)
  }

  test("q172 pivot matrix is one row per trading nation, cells nonnegative") {
    val rows = SparkEntry.queries("q172_pivot_matrix")(spark, sf).collect()
    val nNations = graft.model.Tables.nation(spark, sf).count()
    assert(rows.length <= nNations && rows.nonEmpty)
    val yearCols = (1995 to 2001).map(y => s"y$y")
    rows.foreach { r =>
      yearCols.foreach(c => assert(r.getAs[Double](c) >= 0.0))
      // a nation present in the output traded in at least one year
      assert(yearCols.map(r.getAs[Double](_)).sum > 0.0)
    }
  }

  test("q187 late counts are bounded by item counts and ppm is the floor division") {
    SparkEntry.queries("q187_late_shipments")(spark, sf).collect().foreach { r =>
      val (n, late) = (r.getAs[Long]("n_items"), r.getAs[Long]("n_late"))
      assert(late >= 0 && late <= n)
      assert(r.getAs[Long]("late_ppm") == late * 1000000L / n)
    }
  }

  test("q189 small-quantity rows are a strict subset of the brand's lineitems") {
    val r = SparkEntry.queries("q189_small_qty_revenue")(spark, sf).collect()(0)
    val brandRows = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.part(spark, sf)
          .filter(col("p_brand") === "Brand#1"),
        col("l_partkey") === col("p_partkey")).count()
    assert(r.getAs[Long]("n_rows") >= 0 && r.getAs[Long]("n_rows") < brandRows,
      "below-20%-of-average rows must be a proper subset")
  }

  test("q190 strict >50% dominance admits at most one supplier per part") {
    // re-derive the dominance set and assert per-part uniqueness — the
    // invariant the cross-multiplied threshold exists to guarantee
    val shipped = graft.model.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(graft.model.Tables.part(spark, sf)
          .filter(col("p_name").contains("bolt")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("l_suppkey"),
        col("l_quantity").cast("decimal(12,2)").as("q"))
    val pair = shipped.groupBy("p_partkey", "l_suppkey")
      .agg(sum(col("q")).as("sq"))
    val tot = shipped.groupBy("p_partkey").agg(sum(col("q")).as("tq"))
    val dominant = pair.join(tot, "p_partkey")
      .filter(col("sq") * 2 > col("tq"))
    val maxPerPart = dominant.groupBy("p_partkey").count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxPerPart <= 1L, "strict majority is unique per part")
    // and the declared query's total dominated-parts mass matches
    val declared = SparkEntry.queries("q190_dominant_supplier")(spark, sf)
      .agg(sum(col("n_parts_dominated"))).collect()(0).getLong(0)
    assert(declared == dominant.count())
  }

  test("q195 every part's winner actually offers the minimum, ties counted") {
    SparkEntry.queries("q195_min_cost_supplier")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("min_u") > 0)
      assert(r.getAs[Long]("n_tied") >= 1)
    }
  }

  test("q196 returns exactly the global-max revenue supplier(s)") {
    val rows = SparkEntry.queries("q196_top_supplier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("rev_micro")).toSet
    assert(revs.size == 1, "all returned rows tie at the single max")
  }

  test("q197 top-10 is revenue-descending with deterministic tiebreak") {
    val revs = SparkEntry.queries("q197_shipping_priority")(spark, sf)
      .collect().map(_.getAs[Long]("rev_micro"))
    assert(revs.nonEmpty && revs.length <= 10)
    assert(revs.sameElements(revs.sorted(Ordering[Long].reverse)))
  }

  test("q198 semi-join counts orders once regardless of late-line multiplicity") {
    val total = SparkEntry.queries("q198_priority_exists")(spark, sf)
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    val inWindow = graft.model.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp")).count()
    assert(total <= inWindow, "EXISTS can never count more orders than exist")
  }

  test("q199 market share is a valid ppm fraction per year") {
    SparkEntry.queries("q199_market_share")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("focus_u") >= 0)
      assert(r.getAs[Long]("focus_u") <= r.getAs[Long]("total_u"))
      assert(r.getAs[Long]("share_ppm") <= 1000000L)
    }
  }
}
