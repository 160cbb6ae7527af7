package graft.flow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataflow operators re-expressing the reference connector's per-partition
  * record flow (SURVEY.md §2A) as declarative Spark plans.
  *
  * The reference buffers records per Kafka TopicPartition and cuts
  * count-based micro-batches (BigqueryStreamWriter.java:54-56,221-223),
  * force-cuts at remembered retry boundaries
  * (BigqueryStorageWriteSinkTask.java:82-96,110-114), and routes quarantined
  * offsets to a dead-letter reporter (BigqueryStorageWriteSinkTask.java:86-92,
  * 103-106). All three are per-partition-key window algebra here, so the plan
  * scales horizontally: no global ordering is ever required, each partition
  * key's timeline sorts independently inside its shuffle partition.
  */
object Flow {

  /** A5: assign count-based micro-batch (chunk) ids within each partition
    * key, ordered by `offsetCol`. Image of the reference's per-TopicPartition
    * buffer cut at `buffer.size` records.
    */
  def microBatchIds(df: DataFrame, partitionCol: Column, offsetCol: Column,
                    batchSize: Int): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(offsetCol)
    df.withColumn("mb_rn", row_number().over(w))
      .withColumn("mb_chunk", ((col("mb_rn") - 1) / batchSize).cast("long"))
      .drop("mb_rn")
  }

  /** A6: cut batches exactly AFTER each boundary offset, per partition key.
    * `isBoundary` marks rows whose offset is a remembered retry boundary;
    * the batch id of a row is the number of boundaries strictly before it —
    * a running sum over the lagged flag, never a global sort.
    */
  def boundaryCutIds(df: DataFrame, partitionCol: Column, offsetCol: Column,
                     isBoundary: Column): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(offsetCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cut_batch",
      coalesce(sum(isBoundary.cast("long")).over(w), lit(0L)))
  }

  /** A4: split a stream into (good, quarantined) legs against a quarantine
    * key set. Good leg = left_anti join (records never seen in the set),
    * DLQ leg = left_semi join. The quarantine side is small by construction
    * (it holds failed offsets), so Catalyst broadcasts it.
    */
  def quarantineSplit(df: DataFrame, quarantine: DataFrame,
                      keys: Seq[String]): (DataFrame, DataFrame) = {
    // no broadcast HINT: the quarantine list is usually tiny (AQE's
    // size-thresholded auto-broadcast picks it up) but it is rejected-row
    // derived and therefore unbounded — a forced broadcast would OOM on
    // the pathological all-rejected batch; AQE degrades to a shuffle
    // join instead
    val good = df.join(quarantine, keys, "left_anti")
    val dlq  = df.join(quarantine, keys, "left_semi")
    (good, dlq)
  }

  /** B10 / A12 image: deterministic exact-dedup survivor — for each key set
    * keep the row ranked first by `order` (e.g. latest timestamp, highest
    * offset). `row_number`-based so the survivor is stable across runs,
    * unlike `dropDuplicates`.
    */
  def dedupSurvivor(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("dd_rn", row_number().over(w))
      .filter(col("dd_rn") === 1)
      .drop("dd_rn")
  }
}
