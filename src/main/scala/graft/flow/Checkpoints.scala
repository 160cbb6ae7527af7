package graft.flow

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

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
  *
  * Two well-known reliable-checkpoint traps are handled here rather than
  * at every call site:
  *
  *   - Spark writes reliable checkpoint files in a SECOND job that
  *     recomputes the RDD from lineage unless it is persisted first
  *     (the RDD.checkpoint contract) — so the reliable path persists,
  *     checkpoints, and (for eager truncation) unpersists once the
  *     checkpoint is materialized. Without this, every CC round would
  *     run twice.
  *   - Spark does not delete superseded checkpoint files unless
  *     `spark.cleaner.referenceTracking.cleanCheckpoints` is enabled
  *     (default false, and only settable at context start). A 20-round
  *     loop would otherwise leak ~20 full dataset copies into the
  *     checkpoint dir; iterative callers pass the previous round's
  *     truncated frame to [[dropCheckpoint]] once it is superseded.
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
      // setCheckpointDir mints a fresh UUID subdir per call — re-point
      // only when unset or the conf moved, not per round, or every round
      // scatters its blocks into a new directory
      val want = df.sparkSession.conf.get(DirConf).trim
      if (!sc.getCheckpointDir.exists(_.contains(want)))
        sc.setCheckpointDir(want)
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      val cp = cached.checkpoint(eager)
      // eager: the checkpoint files exist now, the cache was only there
      // to keep the write job from recomputing — release it. Lazy
      // truncation (q90's plan-inspection-safe edges) keeps the cache
      // until the first action materializes the checkpoint.
      if (eager) cached.unpersist(blocking = false)
      cp
    } else df.localCheckpoint(eager)

  /** The reliable-checkpoint file behind a [[truncate]]d frame, if any. */
  private def checkpointFile(df: DataFrame): Option[String] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.getCheckpointFile
      case _ => None
    }

  /** Delete the reliable checkpoint files backing a SUPERSEDED truncated
    * frame (no-op for local checkpoints — executor blocks are reclaimed
    * by the block manager). Call only when no future job will read the
    * frame: in an iterative loop, round N's labels once round N+1's are
    * materialized and compared. */
  def dropCheckpoint(df: DataFrame): Unit =
    checkpointFile(df).foreach { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
}
