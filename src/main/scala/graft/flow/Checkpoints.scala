package graft.flow

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * PageRank), with a conf-gated choice of mechanism.
  *
  * Iterative Spark jobs MUST truncate lineage each round or the DAG grows
  * without bound (every round re-plans all prior rounds). The cheap way is
  * `localCheckpoint`: blocks live on executors, no I/O to a shared store —
  * but it is documented as NOT fault-tolerant: lose one executor mid-job
  * and the blocks are gone, the lineage that could recompute them was
  * discarded, and the job dies. Acceptable on local[32]; NOT acceptable
  * for a 20-round component search over 100 TB of candidate edges on a
  * 1000-executor cluster, where some executor loss is a statistical
  * certainty.
  *
  * So the mechanism is conf-gated: set `spark.graft.checkpointDir` to a
  * reliable store (HDFS/S3 path) and these operators switch to Spark's
  * reliable `checkpoint()` — blocks written to the shared store, lineage
  * recoverable after executor loss. Unset (the default, and the local-mode
  * behavior) keeps `localCheckpoint`.
  */
object Checkpoints {

  val DirConf = "spark.graft.checkpointDir"

  /** True when the session is configured for reliable checkpointing. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(DirConf).exists(_.trim.nonEmpty)

  /** Truncate `df`'s lineage: reliable `checkpoint(eager)` when
    * [[DirConf]] is set (pointing `SparkContext.checkpointDir` at it on
    * first use), `localCheckpoint(eager)` otherwise. */
  def truncate(df: DataFrame, eager: Boolean): DataFrame =
    if (reliable(df)) {
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir mints a fresh UUID subdir per call — set once
      // per context, not per round, or every round scatters its blocks
      // into a new directory
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(df.sparkSession.conf.get(DirConf).trim)
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
}
