package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.vec_cosine
import graft.model.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors,
  * unit-normalized upstream but norms are still computed defensively).
  *
  *   - q28: brute-force cosine top-k — the exactness baseline. The query
  *     set is broadcast against the streamed corpus, so the plan is one
  *     scan + per-row loop: no shuffle of the corpus at all; scales to
  *     any corpus size (cost ∝ |corpus|·|queries|).
  *   - q29: random-hyperplane LSH ANN — the scale path. Hyperplanes come
  *     from a deterministic integer formula (no engine-specific RNG), the
  *     signature computation is explode→join→partial-agg (map-side
  *     combine), and candidate pairs only form within identical sign
  *     buckets. Output = exact cosine re-rank of candidates. Rows-only:
  *     bucket collisions are by design lossy vs. the exact top-k.
  *
  * Determinism: cosines are rounded to 6 decimals and every ordering uses
  * (rounded value, id) keys, so the ≤1-ulp difference between Spark's
  * left-fold `aggregate` and DuckDB's list_dot_product vanishes.
  */
object Similarity {

  /** Cast a float array to double and compute the sequential dot product. */
  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")

  def norm(a: String): Column =
    sqrt(expr(s"aggregate($a, 0D, (acc, v) -> acc + v * v)"))

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", norm("v"))

  /** Deterministic hyperplane weight — pure integer arithmetic so any
    * engine reproduces it: w(i,j) = ((i*7919 + j*104729) mod 2001) - 1000. */
  def planeWeight(plane: Int, dim: Int): Double =
    ((plane * 7919 + dim * 104729) % 2001) - 1000.0

  /** Sign-bucket of `numPlanes` hyperplane dots per vector, computed via
    * posexplode + broadcast plane join + groupBy — fully distributed,
    * map-side combinable, any dimension/plane count. */
  def lshBuckets(vecs: DataFrame, numPlanes: Int, dim: Int,
                 spark: SparkSession): DataFrame = {
    import spark.implicits._
    val planes = broadcast(
      (for (i <- 0 until numPlanes; j <- 0 until dim)
        yield (i, j, planeWeight(i, j))).toDF("plane", "j", "w"))
    vecs.select(col("vec_id"), posexplode(col("v")).as(Seq("j", "x")))
      .join(planes, "j")
      .groupBy("vec_id", "plane")
      .agg(sum(col("x") * col("w")).as("dotp"))
      .groupBy("vec_id")
      .agg(sum(when(col("dotp") > 0,
        expr("shiftleft(1L, plane)")).otherwise(0L)).as("bucket"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ANN baseline: exact brute-force cosine top-5 per query vector.
    "q28_knn_cosine" -> { (s, d) =>
      val e = vecs(s, d)
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
      c.join(broadcast(q), col("c_id") =!= col("q_id"))
        // codegen'd kernel; inline norms reproduce qn*cn bit-for-bit
        .withColumn("cos", round(vec_cosine(col("qv"), col("cv")), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "c_id", "cos")
        .orderBy("q_id", "rank")
    },

    // Embedding-cosine near-dup pairs: full exact pairwise sweep with a
    // similarity threshold — the dedup-by-embedding baseline (the LSH
    // variant prunes the same computation by bucket).
    "q41_embedding_neardup" -> { (s, d) =>
      val e = vecs(s, d)
      val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos", round(vec_cosine(col("va"), col("vb")), 6))
        .filter(col("cos") >= 0.35)
        .select("id_a", "id_b", "cos")
        .orderBy("id_a", "id_b")
    },

    // ANN scale path #2: IVF (inverted-file) — deterministic coarse
    // quantizer (every 50th vector is a centroid), vectors assigned to
    // their nearest centroid's cell, queries probe only their own cell.
    // Unlike LSH the whole pipeline is deterministic arithmetic, so it is
    // oracle-checked end-to-end. At scale: the assignment is a broadcast
    // of |centroids| rows against a streamed corpus, the search joins on
    // the cell id — both shuffle-light.
    "q42_ivf_ann" -> { (s, d) =>
      val e = vecs(s, d)
      val cents = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("ccos", round(vec_cosine(col("v"), col("cv")), 6))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
      val q = assigned.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cell"))
      val c = assigned.select(col("vec_id").as("c_id"), col("v").as("cv2"), col("cell"))
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
      c.join(broadcast(q), Seq("cell")).filter(col("c_id") =!= col("q_id"))
        .withColumn("cos", round(vec_cosine(col("qv"), col("cv2")), 6))
        .withColumn("rank", row_number().over(wTop).cast("long"))
        .filter(col("rank") <= 3)
        .select("q_id", "rank", "c_id", "cos")
        .orderBy("q_id", "rank")
    },

    // ANN scale path: LSH bucket join + exact re-rank of candidates.
    "q29_lsh_ann" -> { (s, d) =>
      val e = vecs(s, d)
      val buckets = lshBuckets(e, numPlanes = 12, dim = 64, spark = s)
      val eb = e.join(buckets, "vec_id")
      val q = eb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
                col("nrm").as("qn"), col("bucket"))
      val c = eb.select(col("vec_id").as("c_id"), col("v").as("cv"),
                        col("nrm").as("cn"), col("bucket"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
      c.join(broadcast(q), Seq("bucket")).filter(col("c_id") =!= col("q_id"))
        .withColumn("cos", round(vec_cosine(col("qv"), col("cv")), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "c_id", "cos")
        .orderBy("q_id", "rank")
    }
  )

  def oracle: Map[String, String] = Map(
    "q42_ivf_ann" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
        |assign AS (
        |  SELECT vec_id, v, nrm, cent_id AS cell, row_number() OVER
        |    (PARTITION BY vec_id
        |     ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cent_id) AS rn
        |  FROM n, cents),
        |cells AS (SELECT vec_id, v, nrm, cell FROM assign WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell FROM cells WHERE vec_id % 100 = 0),
        |p AS (
        |  SELECT q_id, c.vec_id AS c_id,
        |    round(list_dot_product(qv, c.v) / (qn * c.nrm), 6) AS cos
        |  FROM q JOIN cells c USING (cell) WHERE c.vec_id <> q_id),
        |r AS (SELECT q_id, c_id, cos,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn FROM p)
        |SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, cos
        |FROM r WHERE rn <= 3 ORDER BY q_id, rank""".stripMargin,

    "q41_embedding_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
        |  FROM n a, n b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.35 ORDER BY id_a, id_b""".stripMargin,

    "q28_knn_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
        |p AS (
        |  SELECT q_id, vec_id AS c_id,
        |    round(list_dot_product(qv, v) / (qn * nrm), 6) AS cos
        |  FROM q, n WHERE vec_id <> q_id),
        |r AS (SELECT q_id, c_id, cos,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
        |      FROM p)
        |SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, cos
        |FROM r WHERE rn <= 5 ORDER BY q_id, rank""".stripMargin
  )
}
