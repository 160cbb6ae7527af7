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

  // Mirror-side memoization (round 10): Verify materializes EVERY
  // registered mirror once at startup, and ten of them replay the same
  // twin-class chain / Lloyd ladder — cache the expensive intermediates
  // per sfDir (one entry; Verify runs one SF per invocation).
  private var tcKey: String = null
  private var tcVal: Array[TwinClass] = null
  private def twinClassesCached(spark: SparkSession,
                                sfDir: String): Array[TwinClass] =
    synchronized {
      if (tcKey != sfDir) { tcVal = twinClasses(spark, sfDir); tcKey = sfDir }
      tcVal
    }

  /** Union-find components over the jac ≥ 0.3 class graph — the shared
    * front of every CC-consumer mirror. Returns (classes, components as
    * arrays of class indices, doc -> component-label map over in-graph
    * docs). Cached per sfDir like [[twinClassesCached]]. */
  private var ccKey: String = null
  private var ccVal: (Array[TwinClass], Array[Array[Int]],
    mutable.HashMap[Long, Long]) = null
  private def componentsCached(spark: SparkSession, sfDir: String):
      (Array[TwinClass], Array[Array[Int]], mutable.HashMap[Long, Long]) =
    synchronized {
      if (ccKey != sfDir) {
        val cls = twinClassesCached(spark, sfDir)
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
        edges.foreach { case (i, j) =>
          val (ra, rb) = (find(i), find(j))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val inGraph = Array.fill(cls.length)(false)
        cls.indices.foreach(i => if (cls(i).m >= 2) inGraph(i) = true)
        edges.foreach { case (i, j) => inGraph(i) = true; inGraph(j) = true }
        val byRoot = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
        cls.indices.foreach { i =>
          if (inGraph(i))
            byRoot.getOrElseUpdate(find(i), mutable.ArrayBuffer.empty[Int]) += i
        }
        val comps = byRoot.values.map(_.toArray).toArray
        val docLabel = mutable.HashMap.empty[Long, Long]
        comps.foreach { idxs =>
          val label = idxs.map(cls(_).rep).min
          idxs.foreach(i => cls(i).members.foreach(docLabel.update(_, label)))
        }
        ccVal = (cls, comps, docLabel)
        ccKey = sfDir
      }
      ccVal
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

  /** q65 mirror: union-find over the jac ≥ 0.3 class graph (the q457
    * mirror's component machinery), emitted as the q65 per-cluster
    * census — label = min member, n_members = Σ class multiplicities,
    * max_member = the component's largest doc id. */
  def q65Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (cls, comps, _) = componentsCached(spark, sfDir)
      val rows = comps.map { idxs =>
        (idxs.map(cls(_).rep).min, idxs.map(cls(_).m).sum,
          idxs.map(cls(_).members.last).max)
      }.sortBy(_._1)
      require(rows.nonEmpty, "empty duplicate graph")
      val values = rows.map { case (label, m, mx) =>
        s"(CAST($label AS BIGINT), CAST($m AS BIGINT), CAST($mx AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(cluster_id, n_members, " +
        "max_member) ORDER BY cluster_id"
    }.toOption

  /** q445 mirror: the alternating-star CC output is component-identical
    * to q65's — the mirror checks the SIZE-HISTOGRAM view. */
  def q445Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (cls, comps, _) = componentsCached(spark, sfDir)
      val rows = comps.map(_.map(cls(_).m).sum)
        .groupBy(identity).toArray
        .map { case (sz, xs) => (sz, xs.length.toLong, sz * xs.length) }
        .sortBy(_._1)
      require(rows.nonEmpty, "empty duplicate graph")
      val values = rows.map { case (sz, nc, nd) =>
        s"(CAST($sz AS BIGINT), CAST($nc AS BIGINT), CAST($nd AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(cluster_size, n_clusters, " +
        "n_docs) ORDER BY cluster_size"
    }.toOption

  /** q26 mirror: the top-100 verified LSH pairs by (jac desc, doc_a,
    * doc_b), computed collapsed — intra-class pairs are jac = 1 with
    * common = na = nb = n, cross pairs expand verified rep pairs. The
    * top-100-by-(a,b) prefix of a class's C(m,2) intra pairs lies
    * within its first 101 members, so intra generation is bounded per
    * class; cross rep pairs expand in jac-desc order (ties fully) only
    * until the cut is covered. */
  def q26Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val cls = twinClassesCached(spark, sfDir)
      final case class P(a: Long, b: Long, common: Long, na: Long,
                         nb: Long, jac: Double)
      val ord = Ordering.by[P, (Double, Long, Long)](p => (-p.jac, p.a, p.b))
      val intra = mutable.ArrayBuffer.empty[P]
      var intraTotal = 0L
      cls.foreach { c =>
        val m = c.members.length
        if (m >= 2) {
          intraTotal += m.toLong * (m - 1) / 2
          val n = c.set.size.toLong
          val take = math.min(m, 101)
          val local = mutable.ArrayBuffer.empty[P]
          var i = 0
          while (i < take - 1) {
            var j = i + 1
            while (j < take) {
              local += P(c.members(i), c.members(j), n, n, n, 1.0)
              j += 1
            }
            i += 1
          }
          intra ++= local.sorted(ord).take(100)
        }
      }
      val top = mutable.ArrayBuffer.empty[P]
      top ++= intra.sorted(ord).take(100)
      if (intraTotal < 100) {
        // need cross pairs: expand verified rep pairs jac-desc until the
        // remainder is covered, keeping full tie groups
        val need = 100 - intraTotal
        val reps = candidatePairs(cls).map { case (i, j) =>
          val (common, jac) = jaccard(cls(i).set, cls(j).set)
          (i, j, common.toLong, jac)
        }.sortBy { case (_, _, _, jac) => -jac }
        val cross = mutable.ArrayBuffer.empty[P]
        var k = 0
        while (k < reps.length &&
            (cross.length < need ||
              reps(k)._4 == reps(k - 1)._4)) {
          val (i, j, common, jac) = reps(k)
          val (na, nb) = (cls(i).set.size.toLong, cls(j).set.size.toLong)
          cls(i).members.foreach { ma =>
            cls(j).members.foreach { mb =>
              if (ma < mb) cross += P(ma, mb, common, na, nb, jac)
              else cross += P(mb, ma, common, nb, na, jac)
            }
          }
          k += 1
        }
        top ++= cross
      }
      val rows = top.sorted(ord).take(100)
      require(rows.nonEmpty, "no verified pairs")
      val values = rows.map { p =>
        s"(CAST(${p.a} AS BIGINT), CAST(${p.b} AS BIGINT), " +
          s"CAST(${p.common} AS BIGINT), CAST(${p.na} AS BIGINT), " +
          s"CAST(${p.nb} AS BIGINT), CAST(${fmtD(p.jac)} AS DOUBLE))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(doc_a, doc_b, common, na, " +
        "nb, jac)"
    }.toOption

  /** The ONE split rule (Dedup.splitOf): md5("split:"+id) bucket %10 →
    * 8/1/1. */
  private def splitOf(id: Long): String = {
    val b = neutralHash32(s"split:$id") % 10
    if (b <= 7) "train" else if (b == 8) "val" else "test"
  }

  /** q76 mirror: per-cluster split-leakage audit. */
  def q76Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (cls, comps, _) = componentsCached(spark, sfDir)
      val rows = comps.map { idxs =>
        val members = idxs.flatMap(cls(_).members)
        val label = idxs.map(cls(_).rep).min
        val splits = members.map(splitOf)
        (label, members.length.toLong, splits.distinct.length.toLong,
          splits.min, splitOf(label))
      }.sortBy(_._1)
      require(rows.nonEmpty, "empty duplicate graph")
      val values = rows.map { case (label, n, ns, fs, cs) =>
        s"(CAST($label AS BIGINT), CAST($n AS BIGINT), CAST($ns AS BIGINT), " +
          s"'$fs', ${ns > 1}, '$cs')"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(cluster_id, n_members, " +
        "n_splits, first_split, leaky, cluster_split) ORDER BY cluster_id"
    }.toOption

  /** Whitespace token count per the engine's tokens() = split(text, " ")
    * (Spark split keeps trailing empty strings; size counts them). */
  private def nTok(text: String): Long = text.split(" ", -1).length.toLong

  /** q136 mirror: cluster-aware split assignment over the FULL corpus
    * (singletons = own doc_id). */
  def q136Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (_, _, docLabel) = componentsCached(spark, sfDir)
      val agg = mutable.HashMap.empty[String, (Long, mutable.HashSet[Long], Long)]
      val it = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val id = r.getLong(0)
        val cluster = docLabel.getOrElse(id, id)
        val sp = splitOf(cluster)
        val t = if (r.isNullAt(1)) 0L else nTok(r.getString(1))
        val (n, cs, tk) = agg.getOrElse(sp, (0L, mutable.HashSet.empty[Long], 0L))
        cs += cluster
        agg.update(sp, (n + 1, cs, tk + t))
      }
      require(agg.nonEmpty, "empty corpus")
      val values = agg.toArray.sortBy(_._1).map { case (sp, (n, cs, tk)) =>
        s"('$sp', CAST($n AS BIGINT), CAST(${cs.size} AS BIGINT), " +
          s"CAST($tk AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(split, n_docs, n_clusters, " +
        "n_tokens) ORDER BY split"
    }.toOption

  /** q106 mirror: dedup-adjusted effective tokens per source. */
  def q106Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (_, _, docLabel) = componentsCached(spark, sfDir)
      val agg = mutable.SortedMap.empty[String, (Long, Long, Long, Long)]
      val it = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source", "text").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val id = r.getLong(0)
        val src = r.getString(1)
        val t = if (r.isNullAt(2)) 0L else nTok(r.getString(2))
        val survivor = docLabel.get(id).forall(_ == id)
        val (n, tk, nd, eff) = agg.getOrElse(src, (0L, 0L, 0L, 0L))
        agg.update(src, (n + 1, tk + t, nd + (if (survivor) 0 else 1),
          eff + (if (survivor) t else 0)))
      }
      require(agg.nonEmpty, "empty corpus")
      val values = agg.toArray.map { case (src, (n, tk, nd, eff)) =>
        s"('${src.replace("'", "''")}', CAST($n AS BIGINT), " +
          s"CAST($tk AS BIGINT), CAST($nd AS BIGINT), CAST($eff AS BIGINT), " +
          s"CAST(${eff * 1000000L / tk} AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(source, n_docs, n_tokens, " +
        "n_dup_docs, eff_tokens, eff_ppm) ORDER BY source"
    }.toOption

  /** q160 mirror: drop-reason census (exact dup > near dup > boilerplate
    * > kept precedence) with share over the corpus. */
  def q160Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (_, _, docLabel) = componentsCached(spark, sfDir)
      case class Doc(id: Long, cmd5: String, phash: String, nt: Long)
      val docs = mutable.ArrayBuffer.empty[Doc]
      val it = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        docs += Doc(r.getLong(0), md5hex(text),
          md5hex(text.substring(0, math.min(100, text.length))),
          nTok(text))
      }
      val exact = mutable.HashMap.empty[String, (Long, Long)]
      val boiler = mutable.HashMap.empty[String, (Long, Long)]
      docs.foreach { d =>
        val e = exact.getOrElse(d.cmd5, (Long.MaxValue, 0L))
        exact.update(d.cmd5, (math.min(e._1, d.id), e._2 + 1))
        val b = boiler.getOrElse(d.phash, (Long.MaxValue, 0L))
        boiler.update(d.phash, (math.min(b._1, d.id), b._2 + 1))
      }
      val agg = mutable.SortedMap.empty[String, (Long, Long)]
      docs.foreach { d =>
        val (eSurv, eN) = exact(d.cmd5)
        val (bSurv, bN) = boiler(d.phash)
        val label = docLabel.get(d.id)
        val reason =
          if (eN > 1 && d.id != eSurv) "exact_dup"
          else if (label.exists(_ != d.id)) "near_dup"
          else if (bN > 1 && d.id != bSurv) "boilerplate"
          else "kept"
        val (n, tk) = agg.getOrElse(reason, (0L, 0L))
        agg.update(reason, (n + 1, tk + d.nt))
      }
      val total = docs.length.toLong
      val values = agg.toArray.map { case (reason, (n, tk)) =>
        s"('$reason', CAST($n AS BIGINT), CAST($tk AS BIGINT), " +
          s"CAST(${n * 1000000L / total} AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(reason, n_docs, n_tokens, " +
        "share_ppm) ORDER BY reason"
    }.toOption

  /** q491 mirror: license escalation matrix through the dup clusters
    * (lic = first md5 byte of source mod 3; effective = cluster max). */
  def q491Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (_, _, docLabel) = componentsCached(spark, sfDir)
      val licOfSrc = mutable.HashMap.empty[String, Long]
      def lic(src: String): Long = licOfSrc.getOrElseUpdate(src,
        java.lang.Long.parseLong(md5hex(src).substring(0, 2), 16) % 3)
      val docLic = mutable.HashMap.empty[Long, Long]
      val docCl = mutable.HashMap.empty[Long, Long]
      val it = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val id = r.getLong(0)
        docLic.update(id, lic(r.getString(1)))
        docCl.update(id, docLabel.getOrElse(id, id))
      }
      val effOf = mutable.HashMap.empty[Long, Long]
      docLic.foreach { case (id, l) =>
        val cl = docCl(id)
        effOf.update(cl, math.max(effOf.getOrElse(cl, -1L), l))
      }
      val names = Array("a_permissive", "b_attribution", "c_restricted")
      val cells = mutable.HashMap.empty[(Long, Long),
        (Long, mutable.HashSet[Long])]
      docLic.foreach { case (id, l) =>
        val cl = docCl(id)
        val key = (l, effOf(cl))
        val (n, cs) = cells.getOrElse(key,
          (0L, mutable.HashSet.empty[Long]))
        cs += cl
        cells.update(key, (n + 1, cs))
      }
      val values = cells.toArray.sortBy { case ((l, e), _) => (l, e) }
        .map { case ((l, e), (n, cs)) =>
          s"('${names(l.toInt)}', '${names(e.toInt)}', CAST($n AS BIGINT), " +
            s"CAST(${cs.size} AS BIGINT))"
        }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(own_license, eff_license, " +
        "n_docs, n_clusters) ORDER BY own_license, eff_license"
    }.toOption

  /** q504 mirror: per-source twin census over the shingle classes. */
  def q504Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val cls = twinClassesCached(spark, sfDir)
      val srcOf = mutable.HashMap.empty[Long, String]
      val it = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        srcOf.update(r.getLong(0), r.getString(1))
      }
      // per (source, class): multiplicity — a class can span sources
      val bySrcCls = mutable.HashMap.empty[(String, Int), Long]
      cls.indices.foreach { ci =>
        cls(ci).members.foreach { id =>
          val key = (srcOf(id), ci)
          bySrcCls.update(key, bySrcCls.getOrElse(key, 0L) + 1)
        }
      }
      val agg = mutable.SortedMap.empty[String, (Long, Long, Long, Long)]
      bySrcCls.foreach { case ((src, _), m) =>
        val (nd, nc, mx, tw) = agg.getOrElse(src, (0L, 0L, 0L, 0L))
        agg.update(src, (nd + m, nc + 1, math.max(mx, m),
          tw + (if (m >= 2) m else 0)))
      }
      require(agg.nonEmpty, "empty corpus")
      val values = agg.toArray.map { case (src, (nd, nc, mx, tw)) =>
        s"('${src.replace("'", "''")}', CAST($nd AS BIGINT), " +
          s"CAST($nc AS BIGINT), CAST($mx AS BIGINT), CAST($tw AS BIGINT), " +
          s"CAST(${tw * 1000000L / nd} AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(source, n_docs, n_classes, " +
        "max_multiplicity, twin_docs, twin_ppm) ORDER BY source"
    }.toOption

  /** q325 mirror: winnowing fingerprints (k=5, w=4 — the
    * graft.functions.Winnow algorithm replayed byte-for-byte) over the
    * doc_id % 3 == 0 sample, per-source distinct sets, and the full
    * source-pair overlap grid. */
  def q325Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val B = 257L
      val k = 5; val w = 4
      var bk1 = 1L
      (0 until k - 1).foreach(_ => bk1 = bk1 * B % P)
      def winnow(text: String): Array[Long] = {
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = bytes.length
        if (n < k) return Array.empty
        val nh = n - k + 1
        val hs = new Array[Long](nh)
        var h = 0L
        var i = 0
        while (i < k) { h = (h * B + (bytes(i) & 0xff)) % P; i += 1 }
        hs(0) = h
        i = 1
        while (i < nh) {
          h = (h - (bytes(i - 1) & 0xff) * bk1 % P + P) % P
          h = (h * B + (bytes(i + k - 1) & 0xff)) % P
          hs(i) = h
          i += 1
        }
        if (nh <= w) return Array(hs.min)
        val out = mutable.ArrayBuffer.empty[Long]
        var lastPicked = -1
        var ws = 0
        while (ws <= nh - w) {
          var mi = ws
          var j = ws + 1
          while (j < ws + w) { if (hs(j) <= hs(mi)) mi = j; j += 1 }
          if (mi != lastPicked) { out += hs(mi); lastPicked = mi }
          ws += 1
        }
        out.toArray
      }
      val bySrc = mutable.HashMap.empty[String, mutable.HashSet[Long]]
      val it = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source", "text").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        if (r.getLong(0) % 3 == 0 && !r.isNullAt(2)) {
          // only enter the pair grid with >= 1 fingerprint (round-10
          // ADVICE): a zero-fp source (all sampled texts shorter than
          // k) would divide by zero in min(na, nb) and the Try would
          // silently drop the whole mirror — the engine's grid rule is
          // ">= 1 fingerprint", so match it here
          val fps = winnow(r.getString(2))
          if (fps.nonEmpty) {
            val set = bySrc.getOrElseUpdate(r.getString(1),
              mutable.HashSet.empty[Long])
            fps.foreach(set += _)
          }
        }
      }
      val srcs = bySrc.keys.toArray.sorted
      require(srcs.length >= 2, "need >= 2 sources")
      val values = (for {
        ai <- srcs.indices; bi <- (ai + 1) until srcs.length
      } yield {
        val (sa, sb) = (srcs(ai), srcs(bi))
        val (fa, fb) = (bySrc(sa), bySrc(sb))
        val (small, big) = if (fa.size <= fb.size) (fa, fb) else (fb, fa)
        val shared = small.count(big).toLong
        val (na, nb) = (fa.size.toLong, fb.size.toLong)
        val esc = (s: String) => s.replace("'", "''")
        s"('${esc(sa)}', '${esc(sb)}', CAST($na AS BIGINT), " +
          s"CAST($nb AS BIGINT), CAST($shared AS BIGINT), " +
          s"CAST(${shared * 1000000L / (na + nb - shared)} AS BIGINT), " +
          s"CAST(${shared * 1000000L / math.min(na, nb)} AS BIGINT))"
      }).mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(src_a, src_b, ndv_a, ndv_b, " +
        "shared_fps, jaccard_ppm, containment_ppm) ORDER BY src_a, src_b"
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

  // ---------------------------------------------------------------------
  // Round-10 mirrors (VERDICT ask #3): the six sf1 rows whose DuckDB legs
  // died on capacity (q194 interrupt; q416-q418/q421/q428 oracle
  // disk-full). Same convention as above: plain collections replays,
  // VALUES oracles, Option on any failure.
  // ---------------------------------------------------------------------

  private def fmtD(x: Double): String =
    if (x == math.rint(x) && math.abs(x) < 1e15) s"${x.toLong}.0" else x.toString

  /** Load embeddings as (vec_id, double[]) sorted by vec_id. */
  private def loadVecs(spark: SparkSession,
                       sfDir: String): Array[(Long, Array[Double])] = {
    val vecs = mutable.ArrayBuffer.empty[(Long, Array[Double])]
    val it = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      vecs += ((r.getLong(0), r.getSeq[Float](1).iterator.map(_.toDouble).toArray))
    }
    vecs.toArray.sortBy(_._1)
  }

  /** The lloyd3 ladder replayed sequentially: 3 × (assign via round-6
    * cosine with cent_id tie-break, fixed-point mean update). Returns
    * (vectors, final centroids sorted by cent_id, per-iteration stats
    * rows (iter, cell, n, new_norm, shift_cos)). Mirrors
    * Similarity.lloyd3 exactly, including cells that lose all members
    * dropping from the ladder. */
  private def lloyd3Replay(spark: SparkSession, sfDir: String):
      (Array[(Long, Array[Double])], Array[(Long, Array[Double])],
        Array[(Long, Long, Long, Double, Double)]) = {
    val vecs = loadVecs(spark, sfDir)
    var cents = vecs.filter(_._1 % 50 == 0).sortBy(_._1).take(256)
    val stats = mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Double)]
    val dim = vecs.head._2.length
    for (it <- 1 to 3) {
      val cs = cents // stable reference for the parallel lambda
      val assign = new Array[Long](vecs.length)
      java.util.stream.IntStream.range(0, vecs.length).parallel().forEach { vi =>
        val v = vecs(vi)._2
        var best = -1L
        var bestCos = Double.NegativeInfinity
        cs.foreach { case (cid, cv) =>
          val c = round6(cosine(v, cv))
          if (c > bestCos) { bestCos = c; best = cid }
        }
        assign(vi) = best
      }
      val nAcc = mutable.HashMap.empty[Long, Long]
      val sAcc = mutable.HashMap.empty[Long, Array[Long]]
      vecs.indices.foreach { vi =>
        val cell = assign(vi)
        nAcc.update(cell, nAcc.getOrElse(cell, 0L) + 1)
        val acc = sAcc.getOrElseUpdate(cell, new Array[Long](dim))
        val v = vecs(vi)._2
        var k = 0
        while (k < dim) {
          acc(k) += math.floor(v(k) * 1000000 + 0.5).toLong; k += 1
        }
      }
      val prev = cents.toMap
      cents = nAcc.keys.toArray.sorted.map { cell =>
        val n = nAcc(cell)
        (cell, sAcc(cell).map(s => s.toDouble / 1000000.0 / n.toDouble))
      }
      cents.foreach { case (cell, ncv) =>
        var ss = 0.0
        ncv.foreach(x => ss += x * x)
        stats += ((it.toLong, cell, nAcc(cell), round6(math.sqrt(ss)),
          round6(cosine(ncv, prev(cell)))))
      }
    }
    (vecs, cents, stats.toArray)
  }

  /** q416 mirror: the lloyd3 convergence table. */
  def q416Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (_, _, stats) = lloyd3Replay(spark, sfDir)
      require(stats.nonEmpty, "empty lloyd ladder")
      val values = stats.sortBy(r => (r._1, r._2)).map {
        case (it, cell, n, nn, sc) =>
          s"(CAST($it AS BIGINT), CAST($cell AS BIGINT), " +
            s"CAST($n AS BIGINT), CAST(${fmtD(nn)} AS DOUBLE), " +
            s"CAST(${fmtD(sc)} AS DOUBLE))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(iter, cell, n_members, " +
        "new_norm, shift_cos) ORDER BY iter, cell"
    }.toOption

  /** Shared q417/q418 front: assign every vector to the refined
    * centroids, pick the bounded query set (vec_id % 100 == 0, sorted,
    * first 64), and rank the corpus per query by (round-6 cosine desc,
    * c_id). Returns (queries with their cell, per-query ranked corpus
    * (c_id, cell, rank), final centroids). */
  private def refinedRanks(spark: SparkSession, sfDir: String):
      (Array[(Long, Array[Double], Long)],
        Array[Array[(Long, Long, Int)]],
        Array[(Long, Array[Double])]) = {
    val (vecs, cents, _) = lloyd3Replay(spark, sfDir)
    val cellOf = new Array[Long](vecs.length)
    java.util.stream.IntStream.range(0, vecs.length).parallel().forEach { vi =>
      val v = vecs(vi)._2
      var best = -1L
      var bestCos = Double.NegativeInfinity
      cents.foreach { case (cid, cv) =>
        val c = round6(cosine(v, cv))
        if (c > bestCos) { bestCos = c; best = cid }
      }
      cellOf(vi) = best
    }
    val qIdx = vecs.indices.filter(vecs(_)._1 % 100 == 0).take(64).toArray
    val queries = qIdx.map(i => (vecs(i)._1, vecs(i)._2, cellOf(i)))
    val ranked = new Array[Array[(Long, Long, Int)]](queries.length)
    java.util.stream.IntStream.range(0, queries.length).parallel().forEach { qi =>
      val (qid, qv, _) = queries(qi)
      val scored = vecs.indices.iterator
        .filter(vecs(_)._1 != qid)
        .map(ci => (vecs(ci)._1, cellOf(ci), round6(cosine(qv, vecs(ci)._2))))
        .toArray
        .sortBy { case (cid, _, cos) => (-cos, cid) }
      ranked(qi) = scored.zipWithIndex
        .map { case ((cid, cell, _), r) => (cid, cell, r + 1) }
    }
    (queries, ranked, cents)
  }

  /** q417 mirror: recall@3 of same-cell IVF against the exact top-3. */
  def q417Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (queries, ranked, _) = refinedRanks(spark, sfDir)
      require(queries.nonEmpty, "no query vectors")
      val values = queries.indices.map { qi =>
        val (qid, _, qcell) = queries(qi)
        val exact3 = ranked(qi).take(3).map(_._1).toSet
        val ivf3 = ranked(qi).iterator.filter(_._2 == qcell)
          .take(3).map(_._1).toSet
        val nHit = exact3.count(ivf3).toLong
        s"(CAST($qid AS BIGINT), CAST($nHit AS BIGINT), " +
          s"CAST(${nHit * 1000000L / 3} AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(q_id, n_hit, recall_ppm) " +
        "ORDER BY q_id"
    }.toOption

  /** q418 mirror: the nprobe ∈ {1,2,4} recall/cost curve over the
    * refined cells (probe rank = round-6 centroid cosine desc, cent_id). */
  def q418Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val (queries, ranked, cents) = refinedRanks(spark, sfDir)
      require(queries.nonEmpty, "no query vectors")
      val nq = queries.length.toLong
      // per query: cell -> probe rank (1..4)
      val probeOf = queries.map { case (_, qv, _) =>
        cents.map { case (cid, cv) => (cid, round6(cosine(qv, cv))) }
          .sortBy { case (cid, c) => (-c, cid) }
          .take(4).zipWithIndex.map { case ((cid, _), i) => cid -> (i + 1) }
          .toMap
      }
      val nCand = new Array[Long](5)
      val nHit = new Array[Long](5)
      queries.indices.foreach { qi =>
        ranked(qi).foreach { case (_, cell, r) =>
          probeOf(qi).get(cell).foreach { crn =>
            nCand(crn) += 1
            if (r <= 3) nHit(crn) += 1
          }
        }
      }
      val values = Seq(1, 2, 4).map { np =>
        val c = (1 to np).map(nCand(_)).sum
        val h = (1 to np).map(nHit(_)).sum
        s"(CAST($np AS BIGINT), CAST($nq AS BIGINT), CAST($c AS BIGINT), " +
          s"CAST($h AS BIGINT), CAST(${h * 1000000L / (3 * nq)} AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(nprobe, n_queries, " +
        "n_candidates, n_hits, recall_ppm) ORDER BY nprobe"
    }.toOption

  /** Distinct (okey -> sorted distinct parts) baskets from lineitem. */
  private def baskets(spark: SparkSession,
                      sfDir: String): mutable.HashMap[Long, mutable.TreeSet[Long]] = {
    val by = mutable.HashMap.empty[Long, mutable.TreeSet[Long]]
    val it = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      by.getOrElseUpdate(r.getLong(0), mutable.TreeSet.empty[Long]) += r.getLong(1)
    }
    by
  }

  /** q194 mirror: top-20 frequent 3-itemsets over ≤32-item baskets. */
  def q194Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val by = baskets(spark, sfDir)
      val bounded = by.values.filter(_.size <= 32).toArray
      val nOrders = bounded.length.toLong
      val counts = mutable.HashMap.empty[(Long, Long, Long), Long]
      bounded.foreach { set =>
        val ps = set.toArray
        var i = 0
        while (i < ps.length - 2) {
          var j = i + 1
          while (j < ps.length - 1) {
            var k = j + 1
            while (k < ps.length) {
              val key = (ps(i), ps(j), ps(k))
              counts.update(key, counts.getOrElse(key, 0L) + 1)
              k += 1
            }
            j += 1
          }
          i += 1
        }
      }
      val top = counts.toArray
        .sortBy { case ((a, b, c), sup) => (-sup, a, b, c) }.take(20)
      require(top.nonEmpty, "no triples")
      val values = top.map { case ((a, b, c), sup) =>
        s"(CAST($a AS BIGINT), CAST($b AS BIGINT), CAST($c AS BIGINT), " +
          s"CAST($sup AS BIGINT), CAST(${sup * 1000000L / nOrders} AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(p_a, p_b, p_c, support, supp_ppm)"
    }.toOption

  /** Co-purchase adjacency (graft.ops.Graph convention: distinct
    * (okey, part), basket size 2..32, canonical pairs, support ≥ 2).
    * Returns node -> sorted neighbor array. */
  private def copurchaseAdj(spark: SparkSession,
                            sfDir: String): mutable.HashMap[Long, Array[Long]] = {
    val by = baskets(spark, sfDir)
    val sup = mutable.HashMap.empty[(Long, Long), Int]
    by.values.foreach { set =>
      if (set.size >= 2 && set.size <= 32) {
        val ps = set.toArray
        var i = 0
        while (i < ps.length - 1) {
          var j = i + 1
          while (j < ps.length) {
            val key = (ps(i), ps(j))
            sup.update(key, sup.getOrElse(key, 0) + 1)
            j += 1
          }
          i += 1
        }
      }
    }
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    sup.foreach { case ((a, b), n) =>
      if (n >= 2) {
        adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty[Long]) += b
        adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty[Long]) += a
      }
    }
    adj.map { case (v, ns) => (v, ns.toArray.sorted) }
  }

  private def brand1Parts(spark: SparkSession, sfDir: String): Set[Long] = {
    val seeds = mutable.HashSet.empty[Long]
    val it = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_brand").toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      if (r.getString(1) == "Brand#1") seeds += r.getLong(0)
    }
    seeds.toSet
  }

  /** q421 mirror: 2-superstep ppb fixed-point personalized PageRank from
    * the Brand#1 seed set, top-15 by (mass desc, node). */
  def q421Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val adj = copurchaseAdj(spark, sfDir)
      val seedSet = brand1Parts(spark, sfDir)
      val nodes = adj.keys.toArray.sorted
      val inGraphSeeds = nodes.filter(seedSet)
      require(inGraphSeeds.nonEmpty, "no seeds in graph")
      val teleVal = 1000000000L / inGraphSeeds.length
      val tele = nodes.iterator
        .map(v => v -> (if (seedSet(v)) teleVal else 0L)).toMap
      var r: Map[Long, Long] = tele
      for (_ <- 1 to 2) {
        val inflow = mutable.HashMap.empty[Long, Long]
        adj.foreach { case (u, ns) =>
          val c = r(u) / ns.length
          ns.foreach(n => inflow.update(n, inflow.getOrElse(n, 0L) + c))
        }
        r = nodes.iterator.map { v =>
          v -> (150000000L * tele(v) / 1000000000L +
            850000000L * inflow.getOrElse(v, 0L) / 1000000000L)
        }.toMap
      }
      val top = nodes.map(v => (v, r(v)))
        .sortBy { case (v, m) => (-m, v) }.take(15)
      val values = top.map { case (v, m) =>
        s"(CAST($v AS BIGINT), ${seedSet(v)}, " +
          s"CAST(${adj(v).length} AS BIGINT), CAST($m AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(node, is_seed, deg, ppr_ppb)"
    }.toOption

  /** q428 mirror: 3-hop multi-source BFS census from the Brand#1 seeds
    * (hop −1 = unreached), share over all graph nodes. */
  def q428Sql(spark: SparkSession, sfDir: String): Option[String] =
    scala.util.Try {
      val adj = copurchaseAdj(spark, sfDir)
      val seedSet = brand1Parts(spark, sfDir)
      val hop = mutable.HashMap.empty[Long, Long]
      adj.keys.foreach(v => if (seedSet(v)) hop.update(v, 0L))
      var frontier = hop.keys.toArray
      for (h <- 1 to 3) {
        val next = mutable.HashSet.empty[Long]
        frontier.foreach(v => adj(v).foreach { n =>
          if (!hop.contains(n)) next += n
        })
        next.foreach(hop.update(_, h.toLong))
        frontier = next.toArray
      }
      val nTotal = adj.size.toLong
      val rows = adj.keys.toArray
        .map(v => (hop.getOrElse(v, -1L), adj(v).length.toLong))
        .groupBy(_._1).toArray
        .map { case (h, vs) => (h, vs.length.toLong, vs.map(_._2).sum) }
        .sortBy(_._1)
      require(rows.nonEmpty, "empty graph")
      val values = rows.map { case (h, n, sd) =>
        s"(CAST($h AS BIGINT), CAST($n AS BIGINT), CAST($sd AS BIGINT), " +
          s"CAST(${n * 1000000L / nTotal} AS BIGINT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $values) AS t(hop, n_nodes, sum_deg, " +
        "share_ppm) ORDER BY hop"
    }.toOption
}
