package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** First-principles replays for the q286–q288 co-purchase structure
  * queries: all three must agree with a nested-loop Scala rebuild of the
  * SAME edge set (q263's definition: distinct items, basket cap 32,
  * support ≥ 2) — so a drift in any one view's edge derivation fails
  * here before the oracle ever sees it.
  */
class GraphStructureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** The q263 edge set, rebuilt in plain Scala. */
  private lazy val edges: Set[(Long, Long)] = {
    val items = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val ok = items.groupBy(_._1).filter(_._2.length <= 32).keySet
    val kept = items.filter(i => ok.contains(i._1))
    kept.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
  }

  private lazy val adj: Map[Long, Seq[Long]] =
    (edges.toSeq.map(e => e._1 -> e._2) ++ edges.toSeq.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

  private lazy val brand: Map[Long, String] =
    graft.model.Tables.part(spark, sf).select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("q286 label flows replay the majority rule and conserve the vertex set") {
    val rows = Graph.queries("q286_label_propagation")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == adj.size.toLong,
      "every vertex lands in exactly one flow cell")
    // replay the majority vote for every vertex
    val flows = adj.toSeq.map { case (v, ns) =>
      val counts = ns.map(brand).groupBy(identity).map { case (l, xs) => l -> xs.size }
      val mc = counts.values.max
      (brand(v), counts.filter(_._2 == mc).keys.min)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = rows.map(r => (r.getAs[String]("old_label"), r.getAs[String]("new_label"))
      -> r.getAs[Long]("n_nodes")).toMap
    assert(got == flows)
  }

  test("q287 class counts replay the radius-1 refinement") {
    val rows = Graph.queries("q287_wl_signatures")(spark, sf).collect()
    assert(rows.nonEmpty)
    val classes = adj.toSeq
      .map { case (v, ns) => brand(v) + "|" + ns.map(brand).sorted.mkString(",") }
      .groupBy(identity).map { case (_, v) => v.size.toLong }
    val nClasses = classes.size.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("n_classes") == nClasses)
      assert(r.getAs[Long]("n_vertices") == adj.size.toLong)
    }
    val top = classes.toSeq.sortBy(-_).take(rows.length)
    assert(rows.map(_.getAs[Long]("n_nodes")).sorted.toSeq == top.sorted.toSeq,
      "top class sizes match the replay (signature ties broken by hash, sizes invariant)")
  }

  test("q288 assortativity replays from the degree sequence") {
    val r = Graph.queries("q288_degree_assortativity")(spark, sf).collect().head
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    assert(r.getAs[Long]("n_vertices") == deg.size.toLong)
    assert(r.getAs[Long]("n_pairs") == 2L * edges.size)
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    val xy = adj.toSeq.flatMap { case (v, ns) => ns.map(n => (deg(v), deg(n))) }
    val np = xy.length.toDouble
    val sx = xy.map(_._1).sum.toDouble; val sy = xy.map(_._2).sum.toDouble
    val sxx = xy.map(t => t._1 * t._1).sum.toDouble
    val syy = xy.map(t => t._2 * t._2).sum.toDouble
    val sxy = xy.map(t => t._1 * t._2).sum.toDouble
    assert(r.getAs[Long]("sxy") == xy.map(t => t._1 * t._2).sum)
    val vx = np * sxx - sx * sx; val vy = np * syy - sy * sy
    val expect = if (vx <= 0 || vy <= 0) 0.0
      else (np * sxy - sx * sy) / math.sqrt(vx * vy)
    assert(math.abs(r.getAs[Double]("r_assort") - expect) < 1e-9)
    assert(r.getAs[Double]("r_assort") >= -1.0 && r.getAs[Double]("r_assort") <= 1.0)
  }
}
