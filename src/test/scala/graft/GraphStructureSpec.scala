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

  test("q298 modularity replays from the brand partition and stays in [-1, 1]") {
    val r = Graph.queries("q298_brand_modularity")(spark, sf).collect().head
    val m = edges.size.toLong
    assert(r.getAs[Long]("n_edges") == m)
    val within = edges.count(e => brand(e._1) == brand(e._2)).toLong
    assert(r.getAs[Long]("within_edges") == within)
    val degByBrand = adj.toSeq.groupBy { case (v, _) => brand(v) }
      .map { case (c, vs) => c -> vs.map(_._2.size.toLong).sum }
    val winByBrand = edges.toSeq.filter(e => brand(e._1) == brand(e._2))
      .groupBy(e => brand(e._1)).map { case (c, es) => c -> es.size.toLong }
    val qnum = degByBrand.map { case (c, dc) =>
      BigInt(4) * m * BigInt(winByBrand.getOrElse(c, 0L)) - BigInt(dc) * dc }.sum
    assert(BigInt(r.getAs[Long]("q_num")) == qnum)
    val mod = r.getAs[Double]("modularity")
    assert(math.abs(mod - qnum.toDouble / (4.0 * m * m)) < 1e-12)
    assert(mod >= -1.0 && mod <= 1.0)
  }

  test("q299 club sizes and densities replay at every k") {
    val rows = Graph.queries("q299_rich_club")(spark, sf).orderBy("k").collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(2L, 4L, 8L, 16L))
    val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val club = deg.filter(_._2 > k).keySet
      val ek = edges.count(e => club(e._1) && club(e._2)).toLong
      assert(r.getAs[Long]("n_k") == club.size.toLong)
      assert(r.getAs[Long]("e_k") == ek)
      if (club.size >= 2)
        assert(r.getAs[Long]("phi_ppm") ==
          2 * ek * 1000000L / (club.size.toLong * (club.size - 1)))
    }
  }

  test("q300 the support histogram replays from common-neighbor counts") {
    val rows = Graph.queries("q300_truss_support")(spark, sf).collect()
    val nbr = adj.map { case (v, ns) => v -> ns.toSet }
    val hist = edges.toSeq
      .map { case (a, b) => (nbr(a) intersect nbr(b)).size.toLong }
      .groupBy(identity).map { case (s2, v) => s2 -> v.size.toLong }
    assert(rows.map(r => r.getAs[Long]("support") -> r.getAs[Long]("n_edges")).toMap
      == hist)
    assert(rows.map(_.getAs[Long]("n_edges")).sum == edges.size.toLong,
      "every edge lands in exactly one support bucket")
  }

  test("q419 link prediction replays the CN/RA scores over non-adjacent wedge pairs") {
    val deg = adj.map { case (v, ns) => v -> ns.length.toLong }
    // brute-force: all x<y pairs with >=1 common neighbor, minus edges
    val cand = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long)] // (cn, ra_ppm)
    for ((z, ns) <- adj; x <- ns; y <- ns if x < y) {
      val k = (x, y)
      val (cn, ra) = cand.getOrElse(k, (0L, 0L))
      cand(k) = (cn + 1, ra + 1000000L / deg(z))
    }
    val pred = cand.toSeq.filterNot { case (k, _) => edges.contains(k) }
      .map { case ((x, y), (cn, ra)) => (x, y, cn, ra) }
      .sortBy { case (x, y, cn, ra) => (-ra, -cn, x, y) }
      .take(20)
    val rows = Graph.queries("q419_link_prediction")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == pred, "top-20 CN/RA table replays exactly")
    // laws: predicted pairs are never existing edges; every common
    // neighbor has degree >= 2 (it touches both endpoints), so each RA
    // term <= 0.5 and ra_ppm <= cn * 500000
    rows.foreach { case (x, y, cn, ra) =>
      assert(!edges.contains((x, y)), s"($x,$y) is an existing edge")
      assert(ra <= cn * 500000L, "RA term bound via deg >= 2")
    }
  }

  test("q421 personalized PageRank replays the 2-superstep integer recurrence") {
    val deg = adj.map { case (v, ns) => v -> ns.length.toLong }
    val seeds = brand.filter(_._2 == "Brand#1").keySet.intersect(adj.keySet)
    assert(seeds.nonEmpty, "fixture has in-graph Brand#1 parts")
    val tele = adj.keySet.map(v =>
      v -> (if (seeds.contains(v)) 1000000000L / seeds.size else 0L)).toMap
    def step(r: Map[Long, Long]): Map[Long, Long] = {
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((u, ns) <- adj; v <- ns)
        inflow(v) += r(u) / deg(u)
      adj.keySet.map(v => v ->
        (150000000L * tele(v) / 1000000000L +
          850000000L * inflow(v) / 1000000000L)).toMap
    }
    val r2 = step(step(tele))
    val expected = r2.toSeq.sortBy { case (v, r) => (-r, v) }.take(15)
    val rows = Graph.queries("q421_personalized_pagerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(rows.toSeq == expected, "top-15 PPR table replays exactly")
    // law: restart mass keeps seeds strictly ahead of a zero-teleport
    // far node — some seed must appear in the top-15
    val got = Graph.queries("q421_personalized_pagerank")(spark, sf).collect()
    assert(got.exists(_.getAs[Boolean]("is_seed")), "a seed ranks in top-15")
    got.foreach(r => assert(r.getAs[Long]("ppr_ppb") >= 0))
  }
}
