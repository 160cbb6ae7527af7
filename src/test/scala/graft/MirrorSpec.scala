package graft

import org.scalatest.funsuite.AnyFunSuite

/** JVM-mirror oracle parity (round-9): each MirrorOracles replay must
  * equal the engine's own result bit-for-bit on the smallest corpus.
  * The mirrors' VALUES SQL is engine-neutral enough for Spark to
  * execute directly, so the comparison runs the literal oracle text the
  * sf1/sf10 gates hand to DuckDB — any drift in the mirror's hashing,
  * rounding, or census algebra fails here before it can mis-gate a
  * scale run. */
class MirrorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def assertMirrorEqualsEngine(name: String, sql: Option[String]): Unit = {
    assert(sql.isDefined, s"$name mirror must produce an oracle")
    val mirror = spark.sql(sql.get).collect().map(_.toSeq).toSeq
    val engine = SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
    graft.ops.Caches.clear()
    assert(mirror == engine,
      s"$name mirror diverges from the engine:\nmirror=$mirror\nengine=$engine")
  }

  test("q115 mirror census equals the engine") {
    assertMirrorEqualsEngine("q115_dup_triangles",
      MirrorOracles.q115Sql(spark, sf))
  }

  test("q457 mirror cluster census equals the engine") {
    assertMirrorEqualsEngine("q457_cluster_consensus",
      MirrorOracles.q457Sql(spark, sf))
  }

  test("q83 mirror Lloyd step equals the engine") {
    assertMirrorEqualsEngine("q83_kmeans_step",
      MirrorOracles.q83Sql(spark, sf))
  }
}
