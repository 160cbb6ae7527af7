package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.flow.Checkpoints
import graft.model.Tables

/** Iterative graph analytics over relationship graphs mined from the
  * relational tables (SURVEY.md §2D). Complements q65's connected
  * components (label propagation to a fixpoint) with a FIXED-ITERATION
  * damped random walk — the shape of PageRank/label-spreading jobs a
  * training-data pipeline runs to score sources or propagate trust.
  *
  * q90: bipartite customer↔supplier PageRank, 3 unrolled iterations.
  * All arithmetic is fixed-point ppb (parts-per-billion) integer with
  * floor division — deterministic, partitioning-independent, and
  * engine-exact (a float PageRank would diverge across engines in the
  * last ulp; see SURVEY §7.0 parity rules). Mass lost to floors is
  * accepted — the op contract is the deterministic integer recurrence,
  * not stochastic-matrix mass conservation.
  *
  * Scale notes (100 TB): each iteration is one shuffle-join of the
  * rank vector against the edge list on the source key plus one
  * map-side-combined aggregation on the destination key — the classic
  * Pregel/GraphX superstep expressed relationally, with AQE free to
  * pick broadcast sides when the rank vector is small. The edge list
  * is derived once and reused across iterations (self-joins dedupe via
  * exchange reuse). Iteration count is fixed and small, so lineage
  * stays bounded without checkpointing; an open-ended fixpoint loop
  * would localCheckpoint per round like q65's connected components.
  */
object Graph {

  /** ppb fixed-point scale for rank mass. */
  private val R = 1000000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Damped (0.85) random walk on the undirected bipartite graph
    // customer(2k) ↔ supplier(2k+1), edges = distinct trading pairs
    // from lineitem⨝orders. pr' = 0.15·R/N + 0.85·Σ_in pr(u)/deg(u),
    // every division a floor. Output: top-20 nodes by final rank.
    "q90_bipartite_pagerank" -> { (s, d) =>
      val pairs = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      // truncate the edge lineage ONCE (q65's pattern) so the DAG does
      // not re-derive the lineitem⨝orders distinct for the degree pass
      // and every superstep's join; the truncation itself is LAZY, but
      // note that the superstep materialization below (Caches.shared)
      // DOES run Spark jobs at DataFrame-construction time — builders
      // of this query pay supersteps 1–2 up front (bounded, node-sized
      // work) and must release the registered caches via Caches.clear
      // (Verify/Bench/PlanAudit and PlanSpec's fleet tests all do).
      // Mechanism conf-gated via spark.graft.checkpointDir (reliable
      // on clusters, local here).
      // ONE explicit hash exchange on the join key, shared by all three
      // supersteps: each superstep joins `edges` on `a`, and identical
      // exchange subtrees are deduplicated (ReuseExchange), so the edge
      // list is shuffled once per run instead of once per superstep.
      // The rank vector side then rides the partitioning its own
      // groupBy/join outputs already carry (node ≡ a's hash space).
      val edges = Checkpoints.truncate(
        pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b"))),
        eager = false)
        .repartition(col("a"))
      val deg = edges.groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("deg"))
      val nRow = deg.agg(count(lit(1)).as("n_nodes"))
      var pr = deg.crossJoin(broadcast(nRow))
        .select(col("node"), col("deg"), col("n_nodes"),
          expr(s"CAST($R DIV n_nodes AS BIGINT)").as("pr"))
      for (i <- 1 to 3) {
        val contrib = pr
          .withColumn("share", expr("CAST(pr DIV deg AS BIGINT)"))
          .join(edges, col("node") === col("a"))
          .groupBy(col("b").as("dst"))
          .agg(sum(col("share")).as("inflow"))
        val next = pr.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"), col("deg"), col("n_nodes"),
            expr("CAST(CAST(150000000 DIV n_nodes AS BIGINT) + " +
              "CAST(85 * coalesce(inflow, 0) DIV 100 AS BIGINT) AS BIGINT)")
              .as("pr"))
        // each superstep consumes pr TWICE (contrib join + rank join),
        // so an unrolled lazy loop doubles the pr lineage per level —
        // 2³ plan copies by superstep 3, deduped only where AQE's
        // ReuseExchange happens to catch identical subtrees. Eagerly
        // materializing each intermediate rank vector (node-count-sized,
        // the PageRank state every engine carries) makes the work
        // per-superstep linear by construction; the harness unpersists
        // via Caches after the query lands. The final superstep is
        // consumed once, so it stays lazy.
        pr = if (i < 3) Caches.shared(next) else next
      }
      pr.orderBy(col("pr").desc, col("node"))
        .limit(20)
        .select(col("node").cast("long").as("node"),
          (col("node") % 2 === 1).as("is_supplier"),
          col("deg").cast("long").as("deg"),
          col("pr").cast("long").as("pr_ppb"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q90_bipartite_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (
        |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
        |deg AS (SELECT a AS node, COUNT(*) AS deg FROM edges GROUP BY a),
        |n AS (SELECT COUNT(*) AS n_nodes FROM deg),
        |pr0 AS (
        |  SELECT node, deg, n_nodes,
        |    CAST(1000000000 // n_nodes AS BIGINT) AS pr
        |  FROM deg CROSS JOIN n),
        |it1 AS (
        |  SELECT p.node, p.deg, p.n_nodes,
        |    CAST(CAST(150000000 // p.n_nodes AS BIGINT) +
        |         CAST(85 * COALESCE(c.inflow, 0) // 100 AS BIGINT)
        |         AS BIGINT) AS pr
        |  FROM pr0 p LEFT JOIN (
        |    SELECT e.b AS dst, SUM(CAST(q.pr // q.deg AS BIGINT)) AS inflow
        |    FROM pr0 q JOIN edges e ON q.node = e.a GROUP BY e.b
        |  ) c ON p.node = c.dst),
        |it2 AS (
        |  SELECT p.node, p.deg, p.n_nodes,
        |    CAST(CAST(150000000 // p.n_nodes AS BIGINT) +
        |         CAST(85 * COALESCE(c.inflow, 0) // 100 AS BIGINT)
        |         AS BIGINT) AS pr
        |  FROM it1 p LEFT JOIN (
        |    SELECT e.b AS dst, SUM(CAST(q.pr // q.deg AS BIGINT)) AS inflow
        |    FROM it1 q JOIN edges e ON q.node = e.a GROUP BY e.b
        |  ) c ON p.node = c.dst),
        |it3 AS (
        |  SELECT p.node, p.deg, p.n_nodes,
        |    CAST(CAST(150000000 // p.n_nodes AS BIGINT) +
        |         CAST(85 * COALESCE(c.inflow, 0) // 100 AS BIGINT)
        |         AS BIGINT) AS pr
        |  FROM it2 p LEFT JOIN (
        |    SELECT e.b AS dst, SUM(CAST(q.pr // q.deg AS BIGINT)) AS inflow
        |    FROM it2 q JOIN edges e ON q.node = e.a GROUP BY e.b
        |  ) c ON p.node = c.dst)
        |SELECT CAST(node AS BIGINT) AS node, node % 2 = 1 AS is_supplier,
        |  CAST(deg AS BIGINT) AS deg, CAST(pr AS BIGINT) AS pr_ppb
        |FROM it3 ORDER BY pr DESC, node LIMIT 20""".stripMargin
  )
}
