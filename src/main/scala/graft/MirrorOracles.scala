package graft

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Driver-side JVM-MIRROR oracles (round-9 VERDICT ask #2, generalizing
  * the q339 pattern): independent plain-Scala replays of the three
  * operators whose top-SF DuckDB legs are resource-bound — q115's sf1
  * triangle census, q457's sf1 shingle×membership census, q83's sf10
  * k-means step (the DuckDB leg OOM'd at 78 GB in round 8's addendum 33
  * while Spark finished in seconds). Each mirror recomputes the expected
  * result with scala.collection code over the same parquet inputs — no
  * DataFrame machinery shared with the engine — and emits a literal
  * VALUES oracle, so the driver's compare gives the same hard
  * rows+schema+hash verdict as every SQL-expressible query.
  *
  * Enabled by SPARK_GRAFT_MIRRORS=1 in Verify (the driver's default runs
  * keep the DuckDB SQL oracles — the cross-engine check stays primary at
  * sf0.01; mirrors take over only where DuckDB cannot go).
  *
  * Numeric parity notes: md5-derived hashing mirrors Dedup.neutralHash32
  * via java.security.MessageDigest (separate code path, same public
  * algorithm — the q339 convention); double rounding mirrors Spark's
  * Round via java.math.BigDecimal.valueOf(x).setScale(6, HALF_UP), the
  * exact semantics Spark codegen emits; cosine folds run in the same
  * sequential index order as the engine's CosineSimilarity kernel.
  */
object MirrorOracles {
  private val P = 2147483647L

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
  private def neutralHash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** One class of exact twins: documents with identical distinct word-
    * trigram shingle sets. `members` is sorted ascending (head = the
    * representative / minimum id); `sig` is the 16-hash MinHash
    * signature — a pure function of the set, hence of the class. */
  private final case class TwinClass(members: Array[Long],
                                     set: Set[String], sig: Array[Long]) {
    def rep: Long = members.head
    def m: Long = members.length.toLong
  }

  /** Load documents and collapse to twin classes. Signature computation
    * is parallelized across classes (embarrassingly parallel; the md5
    * pass dominates at sf1+). */
  private def twinClasses(spark: SparkSession,
                          sfDir: String): Array[TwinClass] = {
    val byKey = mutable.HashMap
      .empty[String, (Set[String], mutable.ArrayBuffer[Long])]
    val it = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val id = r.getLong(0)
      val text = if (r.isNullAt(1)) "" else r.getString(1)
      val t = text.split(" ", -1)
      if (t.length >= 3) {
        val set = t.sliding(3).map(_.mkString(" ")).toSet
        val key = set.toSeq.sorted.mkString("")
        byKey.getOrElseUpdate(key,
          (set, mutable.ArrayBuffer.empty[Long]))._2 += id
      }
    }
    val raw = byKey.values.toArray
    val out = new Array[TwinClass](raw.length)
    java.util.stream.IntStream.range(0, raw.length).parallel().forEach { ci =>
      val (set, ids) = raw(ci)
      val hs = set.iterator.map(sh => neutralHash32(sh) % P).toArray
      val sig = Array.tabulate(16) { i =>
        var mn = Long.MaxValue
        var j = 0
        while (j < hs.length) {
          val v = (7919L * (i + 1) * hs(j) + 104729L * i) % P
          if (v < mn) mn = v
          j += 1
        }
        mn
      }
      out(ci) = TwinClass(ids.toArray.sorted, set, sig)
    }
    out.sortBy(_.rep)
  }

  /** LSH candidate class pairs: 4 bands × 4 rows, bucket = base-31
    * polynomial over the band's minima — the engine's banding constants.
    * Returns index pairs (i < j). */
  private def candidatePairs(cls: Array[TwinClass]): Array[(Int, Int)] = {
    val buckets = mutable.HashMap.empty[(Int, Long), mutable.ArrayBuffer[Int]]
    var ci = 0
    while (ci < cls.length) {
      val s = cls(ci).sig
      var b = 0
      while (b < 4) {
        val bucket = s(b * 4) * 29791L + s(b * 4 + 1) * 961L +
          s(b * 4 + 2) * 31L + s(b * 4 + 3)
        buckets.getOrElseUpdate((b, bucket),
          mutable.ArrayBuffer.empty[Int]) += ci
        b += 1
      }
      ci += 1
    }
    val seen = mutable.HashSet.empty[(Int, Int)]
    buckets.values.foreach { ids =>
      var i = 0
      while (i < ids.length) {
        var j = i + 1
        while (j < ids.length) {
          val p = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
          seen += p
          j += 1
        }
        i += 1
      }
    }
    seen.toArray.sorted
  }

  private def jaccard(a: Set[String], b: Set[String]): (Int, Double) = {
    val common = if (a.size <= b.size) a.count(b) else b.count(a)
    (common, common.toDouble / (a.size + b.size - common))
  }

  /** q115 mirror: twin-collapse census algebra over the jac ≥ 0.6 rep
    * graph — an independent collections implementation of the identical
    * algebra the engine runs relationally. */
  def q115Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val cls = twinClasses(spark, sfDir)
      val edges = candidatePairs(cls)
        .filter { case (i, j) => jaccard(cls(i).set, cls(j).set)._2 >= 0.6 }
      val nm = new Array[Long](cls.length)
      val adj = Array.fill(cls.length)(mutable.HashSet.empty[Int])
      var cross = 0L
      var t2 = 0L
      edges.foreach { case (i, j) =>
        val mi = cls(i).m; val mj = cls(j).m
        nm(i) += mj; nm(j) += mi
        cross += mi * mj
        t2 += mi * (mi - 1) / 2 * mj + mj * (mj - 1) / 2 * mi
        adj(i) += j; adj(j) += i
      }
      var nodes = 0L; var wedges = 0L; var intra = 0L; var t1 = 0L
      cls.indices.foreach { i =>
        val m = cls(i).m
        val deg = (m - 1) + nm(i)
        if (deg >= 1) { nodes += m; wedges += m * (deg * (deg - 1) / 2) }
        intra += m * (m - 1) / 2
        t1 += m * (m - 1) * (m - 2) / 6
      }
      var t3 = 0L
      edges.foreach { case (i, j) =>
        val (small, other) =
          if (adj(i).size <= adj(j).size) (adj(i), adj(j)) else (adj(j), adj(i))
        small.foreach { k =>
          if (k > i && k > j && other.contains(k))
            t3 += cls(i).m * cls(j).m * cls(k).m
        }
      }
      val tris = t1 + t2 + t3
      val nEdges = intra + cross
      val closure = if (wedges == 0) 0L else 3 * tris * 1000000L / wedges
      s"SELECT * FROM (VALUES (CAST($nodes AS BIGINT), " +
        s"CAST($nEdges AS BIGINT), CAST($wedges AS BIGINT), " +
        s"CAST($tris AS BIGINT), CAST($closure AS BIGINT))) " +
        "AS t(n_nodes, n_edges, n_wedges, n_triangles, closure_ppm)"
    }.toOption

  /** q457 mirror: union-find over the jac ≥ 0.3 class graph (intra-class
    * pairs are always edges — jac = 1), then the per-cluster member /
    * union-shingle / core-shingle census. */
  def q457Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val cls = twinClasses(spark, sfDir)
      val edges = candidatePairs(cls)
        .filter { case (i, j) => jaccard(cls(i).set, cls(j).set)._2 >= 0.3 }
      val parent = Array.tabulate(cls.length)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      def union(a: Int, b: Int): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.foreach { case (i, j) => union(i, j) }
      val inGraph = Array.fill(cls.length)(false)
      cls.indices.foreach(i => if (cls(i).m >= 2) inGraph(i) = true)
      edges.foreach { case (i, j) => inGraph(i) = true; inGraph(j) = true }
      val comps = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
      cls.indices.foreach { i =>
        if (inGraph(i))
          comps.getOrElseUpdate(find(i), mutable.ArrayBuffer.empty[Int]) += i
      }
      val rows = comps.values.map { idxs =>
        val label = idxs.map(cls(_).rep).min
        val nMembers = idxs.map(cls(_).m).sum
        val unionSh = mutable.HashSet.empty[String]
        idxs.foreach(i => unionSh ++= cls(i).set)
        // core = shingles every member carries = intersection of the
        // class sets (each class's set is shared by all its members)
        var core: Set[String] = cls(idxs.head).set
        idxs.tail.foreach(i => core = core & cls(i).set)
        (label, nMembers, unionSh.size.toLong, core.size.toLong)
      }.toArray.sortBy(_._1)
      require(rows.nonEmpty, "empty duplicate graph")
      val values = rows.map { case (label, m, u, c) =>
        s"(CAST($label AS BIGINT), CAST($m AS BIGINT), CAST($u AS BIGINT), " +
          s"CAST($c AS BIGINT), CAST(${c * 1000000L / u} AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(cluster_id, n_members, " +
        "n_union_shingles, n_core_shingles, core_share_ppm) " +
        "ORDER BY cluster_id"
    }.toOption

  /** Spark's round(x, 6) on DOUBLE: decimal-string HALF_UP — the exact
    * semantics of the engine's codegen. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The engine's CosineSimilarity kernel: sequential fold over
    * min(len), 0 when a norm is 0. */
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** q83 mirror: nearest-centroid assignment (round-6 cosine, cent_id
    * tie-break) + the fixed-point Lloyd update, replayed sequentially. */
  def q83Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val vecs = mutable.ArrayBuffer.empty[(Long, Array[Double])]
      val it = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val arr = r.getSeq[Float](1).iterator.map(_.toDouble).toArray
        vecs += ((r.getLong(0), arr))
      }
      val cents = vecs.filter(_._1 % 50 == 0).sortBy(_._1).take(256).toArray
      require(cents.nonEmpty, "no centroids")
      val dim = cents.head._2.length
      val nAcc = mutable.HashMap.empty[Long, Long]
      val sqAcc = mutable.HashMap.empty[Long, Array[Long]]
      // parallel assignment with thread-local accumulation would race;
      // the corpus fits a sequential pass comfortably (64-dim × ≤ 256
      // kernel calls per vector)
      val assign = new Array[Long](vecs.length)
      java.util.stream.IntStream.range(0, vecs.length).parallel().forEach { vi =>
        val v = vecs(vi)._2
        var best = -1L
        var bestCos = Double.NegativeInfinity
        cents.foreach { case (cid, cv) =>
          val c = round6(cosine(v, cv))
          if (c > bestCos) { bestCos = c; best = cid }
        }
        assign(vi) = best
      }
      vecs.indices.foreach { vi =>
        val cell = assign(vi)
        val v = vecs(vi)._2
        nAcc.update(cell, nAcc.getOrElse(cell, 0L) + 1)
        val acc = sqAcc.getOrElseUpdate(cell, new Array[Long](dim))
        var k = 0
        while (k < dim) {
          acc(k) += math.floor(v(k) * 1000000 + 0.5).toLong
          k += 1
        }
      }
      val centById = cents.toMap
      val rows = nAcc.keys.toArray.sorted.map { cell =>
        val n = nAcc(cell)
        val nc = sqAcc(cell).map(s => s.toDouble / 1000000 / n)
        var ss = 0.0
        nc.foreach(x => ss += x * x)
        val newNorm = round6(math.sqrt(ss))
        val shift = round6(cosine(nc, centById(cell)))
        s"(CAST($cell AS BIGINT), CAST($n AS BIGINT), " +
          s"CAST($newNorm AS DOUBLE), CAST($shift AS DOUBLE))"
      }
      s"SELECT * FROM (VALUES ${rows.mkString(", ")}) " +
        "AS t(cell, n_members, new_norm, shift_cos) ORDER BY cell"
    }.toOption
}
