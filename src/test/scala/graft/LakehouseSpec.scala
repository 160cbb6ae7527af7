package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Lakehouse

/** Invariants for the round-6 lakehouse/planner operators (q224–q229)
  * beyond the DuckDB hash-compare: an event-by-event SCD2 replay, the
  * Kendall pair-count conservation law, the CMS join-estimate upper
  * bound with an exact-Σc² replay, the bottom-k sample's mergeability,
  * a brute-force dominance check of the skyline, and the dup-group
  * histogram's conservation identities.
  */
class LakehouseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q224 versions match an event-by-event replay and reopened is never negative") {
    val rows = Lakehouse.queries("q224_scd2_build")(spark, sf).collect()
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val ks = ev.filter(_._1 == uid).sortBy(e => (e._2, e._3)).map(_._4)
      val versions = 1 + ks.zip(ks.tail).count { case (a, b) => a != b }
      assert(r.getAs[Long]("n_events") == ks.length.toLong, s"user $uid events")
      assert(r.getAs[Long]("n_versions") == versions.toLong, s"user $uid versions")
      assert(r.getAs[Long]("reopened") ==
        versions.toLong - ks.distinct.length, s"user $uid reopened")
      assert(r.getAs[Long]("reopened") >= 0L)
    }
  }

  test("q225 pair counts conserve n(n-1)/2 and match a nested-loop replay") {
    val r = Lakehouse.queries("q225_kendall_sources")(spark, sf).collect().head
    val m = graft.model.Tables.documents(spark, sf).groupBy("source")
      .agg(sum("n_chars").as("mass"), count(lit(1)).as("docs")).collect()
      .map(x => (x.getString(0), x.getAs[Long]("mass"), x.getAs[Long]("docs")))
    val n = m.length
    assert(r.getAs[Long]("n_sources") == n.toLong)
    assert(r.getAs[Long]("n_pairs") == n.toLong * (n - 1) / 2)
    var (c, dct, t) = (0L, 0L, 0L)
    for (i <- m.indices; j <- 0 until i) {
      val p = (m(i)._2 - m(j)._2) * (m(i)._3 - m(j)._3)
      if (p > 0) c += 1 else if (p < 0) dct += 1 else t += 1
    }
    assert(r.getAs[Long]("concordant") == c)
    assert(r.getAs[Long]("discordant") == dct)
    assert(r.getAs[Long]("tied") == t)
    assert(r.getAs[Long]("concordant") + r.getAs[Long]("discordant") +
      r.getAs[Long]("tied") == r.getAs[Long]("n_pairs"))
    assert(r.getAs[Long]("tau_num") == c - dct)
  }

  test("q226 the sketch estimate upper-bounds the exact join size on both joins") {
    val rows = Lakehouse.queries("q226_cms_join_estimate")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("join_name")).sorted.toSeq ==
      Seq("fk_part", "self_partkey"))
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"${r.getAs[String]("join_name")}: inner-product estimate must not underestimate")
      assert(r.getAs[Long]("overest") ==
        r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
    val cs = graft.model.Tables.lineitem(spark, sf)
      .groupBy("l_partkey").count().collect().map(_.getAs[Long]("count"))
    val exactSelf = cs.map(c => c * c).sum
    assert(rows.find(_.getAs[String]("join_name") == "self_partkey").get
      .getAs[Long]("exact") == exactSelf)
  }

  test("q227 bottom-k per source is mergeable: bottom-k of a union = bottom-k of per-half bottom-k's") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"usamp:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val k = Lakehouse.SampleK
    docs.groupBy(_._2).foreach { case (_, ds) =>
      val ids = ds.map(_._1)
      val whole = ids.sortBy(i => (h(i), i)).take(k).toSet
      val (a, b) = ids.partition(_ % 2 == 0)
      val merged = (a.sortBy(i => (h(i), i)).take(k) ++
        b.sortBy(i => (h(i), i)).take(k)).sortBy(i => (h(i), i)).take(k).toSet
      assert(merged == whole, "bottom-k must merge associatively")
    }
    val rows = Lakehouse.queries("q227_stratified_sample")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_samp") ==
        math.min(k.toLong, r.getAs[Long]("n_docs")))
    }
  }

  test("q228 no skyline part is dominated and every non-skyline part is") {
    val parts = graft.model.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_size").cast("long"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._3 <= b._3 && a._2 >= b._2 && (a._3 < b._3 || a._2 > b._2)
    val sky = Lakehouse.queries("q228_part_skyline")(spark, sf).collect()
      .map(r => r.getAs[Long]("p_partkey")).toSet
    parts.foreach { p =>
      val dominated = parts.exists(q => dominates(q, p))
      if (sky.contains(p._1))
        assert(!dominated, s"part ${p._1} is on the skyline but dominated")
      else
        assert(dominated, s"part ${p._1} is off the skyline but undominated")
    }
  }

  test("q231 the zero-discount row is its own baseline at exactly 1e6 lift") {
    val rows = Lakehouse.queries("q231_discount_lift")(spark, sf).collect()
    val base = rows.find(_.getAs[Long]("disc_pct") == 0L)
    assert(base.isDefined, "the 0% discount level must exist")
    assert(base.get.getAs[Long]("lift_ppm") == 1000000L)
    val totalLines = rows.map(_.getAs[Long]("n_lines")).sum
    assert(totalLines == graft.model.Tables.lineitem(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Long]("rev_u") > 0))
  }

  test("q232 each decile matches a sort-based replay per priority") {
    val rows = Lakehouse.queries("q232_ship_delay_deciles")(spark, sf).collect()
    val dl = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val prios = dl.map(_._1).distinct
    assert(rows.length == prios.length * 9, "9 deciles per priority")
    rows.foreach { r =>
      val vs = dl.filter(_._1 == r.getAs[String]("prio")).map(_._2).sorted
      val q = r.getAs[Long]("q").toInt
      val pos = (q * vs.length + 9) / 10
      assert(r.getAs[Long]("delay_days") == vs(pos - 1),
        s"${r.getAs[String]("prio")} decile $q")
      assert(r.getAs[Long]("n") == vs.length.toLong)
    }
  }

  test("q234 stats match direct DataFrame aggregates per column") {
    val rows = Lakehouse.queries("q234_analyze_stats")(spark, sf).collect()
    assert(rows.length == 5)
    val li = graft.model.Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val c = r.getAs[String]("column_name")
      val cast = col(c).cast("long")
      val exp = li.agg(countDistinct(cast), min(cast), max(cast)).collect().head
      assert(r.getAs[Long]("ndv") == exp.getLong(0), s"$c ndv")
      assert(r.getAs[Long]("min_v") == exp.getLong(1), s"$c min")
      assert(r.getAs[Long]("max_v") == exp.getLong(2), s"$c max")
      assert(r.getAs[Long]("n_nulls") == 0L)
    }
  }

  test("q251 the status matrix conserves the joined line count and flags only forbidden cells") {
    val rows = Lakehouse.queries("q251_status_matrix")(spark, sf).collect()
    val joined = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(rows.map(_.getAs[Long]("n_lines")).sum == joined)
    rows.foreach { r =>
      val (o, l) = (r.getAs[String]("o_orderstatus"), r.getAs[String]("l_linestatus"))
      val expect = (o == "F" && l == "O") || (o == "O" && l == "F")
      assert((r.getAs[Long]("violation") == 1L) == expect, s"cell $o/$l")
    }
  }

  test("q252 error constraints hold and the warn tier matches a direct count") {
    val rows = Lakehouse.queries("q252_constraint_audit")(spark, sf).collect()
    assert(rows.length == 6)
    rows.filter(_.getAs[String]("severity") == "error").foreach { r =>
      assert(r.getAs[Long]("n_viol") == 0L,
        s"${r.getAs[String]("constraint_name")} must not trip on clean data")
    }
    val warn = rows.find(_.getAs[String]("constraint_name") == "discount_le_5_warn").get
    val direct = graft.model.Tables.lineitem(spark, sf)
      .filter(expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) > 5"))
      .count()
    assert(warn.getAs[Long]("n_viol") == direct)
    assert(warn.getAs[Long]("n_viol") > 0, "the warn tier is expected to trip")
  }

  test("q255 covariance numerators match a first-principles replay and the pooled row is consistent") {
    val rows = Lakehouse.queries("q255_simpson_paradox")(spark, sf).collect()
    val data = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"),
        expr("CAST(l_quantity AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def covNum(xs: Seq[(Long, Long)]): BigInt =
      BigInt(xs.length) * xs.map { case (x, y) => BigInt(x) * y }.sum -
        BigInt(xs.map(_._1).sum) * xs.map(_._2).sum
    val pooledSign = covNum(data.map(d => (d._2, d._3)).toSeq).signum
    rows.foreach { r =>
      val st = r.getAs[String]("stratum")
      val xs = if (st == "__all__") data.map(d => (d._2, d._3)).toSeq
               else data.filter(_._1 == st).map(d => (d._2, d._3)).toSeq
      assert(BigInt(r.getAs[Long]("cov_num")) == covNum(xs), s"$st cov")
      assert(r.getAs[Long]("cov_sign") == covNum(xs).signum.toLong)
      assert(r.getAs[Long]("pooled_sign") == pooledSign.toLong)
      val expectParadox = r.getAs[Long]("cov_sign") != 0 && pooledSign != 0 &&
        r.getAs[Long]("cov_sign") != pooledSign.toLong
      assert((r.getAs[Long]("paradox") == 1L) == expectParadox, s"$st paradox")
    }
  }

  test("q256 children's shares sum to 1e6 within floor error and revenue telescopes") {
    val rows = Lakehouse.queries("q256_share_of_parent")(spark, sf).collect()
    val l1 = rows.filter(_.getAs[Long]("lvl") == 1L)
    val l2 = rows.filter(_.getAs[Long]("lvl") == 2L)
    val l3 = rows.filter(_.getAs[Long]("lvl") == 3L)
    assert(l1.nonEmpty && l2.nonEmpty && l3.nonEmpty)
    // level-1 shares of grand total sum to ~1e6
    val s1 = l1.map(_.getAs[Long]("parent_share_ppm")).sum
    assert(s1 > 1000000L - l1.length && s1 <= 1000000L)
    // each region's nation revenues telescope to the region revenue
    l1.foreach { r =>
      val reg = r.getAs[String]("r_name")
      val kids = l2.filter(_.getAs[String]("r_name") == reg)
      assert(kids.map(_.getAs[Long]("rev_c")).sum == r.getAs[Long]("rev_c"),
        s"$reg nation revenues must sum to the region's")
      val ks = kids.map(_.getAs[Long]("parent_share_ppm")).sum
      assert(ks > 1000000L - kids.length && ks <= 1000000L)
    }
    // each nation's segments telescope to the nation revenue
    l2.foreach { r =>
      val kids = l3.filter(k => k.getAs[String]("r_name") == r.getAs[String]("r_name")
        && k.getAs[String]("n_name") == r.getAs[String]("n_name"))
      assert(kids.map(_.getAs[Long]("rev_c")).sum == r.getAs[Long]("rev_c"))
    }
  }

  test("q229 bucket masses conserve the corpus and dup_excess counts deletable rows") {
    val rows = Lakehouse.queries("q229_dupgroup_histogram")(spark, sf).collect()
    assert(rows.length == 20)
    val docs = graft.model.Tables.documents(spark, sf).count()
    val groups = graft.model.Tables.documents(spark, sf)
      .select(md5(trim(regexp_replace(
        regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), " +", " "))).as("fp"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    assert(rows.map(_.getAs[Long]("n_groups")).sum == groups)
    assert(rows.map(_.getAs[Long]("dup_excess")).sum == docs - groups)
  }

  test("q420 compaction plan replays next-fit exactly and conserves bytes in time order") {
    val target = 1048576L
    // month index computed BY Spark (session-TZ-safe); the mirror's
    // subject is the next-fit packing, the oracle checks the date math
    val files = graft.model.Tables.orders(spark, sf)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long")).collect()
      .map(_.getLong(0))
      .groupBy(identity).toSeq
      .map { case (m, rs) => (m, rs.length.toLong * 64) }
      .sortBy(_._1)
    // next-fit mirror: bin = cumulative-before DIV target
    var cum = 0L
    val assign = files.map { case (m, b) =>
      val bin = cum / target; cum += b; (bin, m, b)
    }
    val expected = assign.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (bin, fs) => (bin, fs.length.toLong, fs.map(_._2).min,
        fs.map(_._2).max, fs.map(_._3).sum)
    }
    val rows = graft.ops.Lakehouse.queries("q420_compaction_plan")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == expected)
    // laws: bytes conserve; bins are time-contiguous (ranges never
    // interleave — the property that preserves date zone maps); fill is
    // the floor-ppm of bytes vs target
    assert(rows.map(_._5).sum == files.map(_._2).sum, "byte conservation")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 < b._3, "bins pack neighbors in time order")
      case _ =>
    }
    rows.foreach(t => assert(t._6 == t._5 * 1000000 / target))
  }
}
