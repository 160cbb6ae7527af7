package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `/root/testdata/sf{0.001,0.01,0.1}/`.
  * Reads stay lazy DataFrames so Catalyst can push projections/filters
  * into the parquet scan — callers must NOT cache or collect here.
  */
object Tables {

  /** Cached (dir, table) → file length — one FS stat per table per JVM. */
  private val fileLen = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Scale-adaptive scan spread (optimization guide §2.5 "input skew: one
    * huge unsplittable file"). The driver corpora ship as ONE parquet row
    * group per table, so the scan — and everything that runs before the
    * first exchange: explodes, partial aggregation, broadcast-join
    * probes, vector kernels — executes as a SINGLE task regardless of
    * core count. When the file fits in one scan split (natural scan
    * parallelism provably 1) and the session has more than one core,
    * spread the rows round-robin across `defaultParallelism` partitions:
    * the shuffled volume is bounded by one split (≤ maxPartitionBytes)
    * BY CONSTRUCTION, and at production scale (multi-split inputs) the
    * guard self-disables, so no full-corpus exchange is ever introduced.
    * `defaultParallelism` tracks the master's core count, so the
    * driver's scaling runs (lower SPARK_GRAFT_CPUS) keep measuring real
    * scaling. Results are partitioning-independent by the repo's parity
    * contract (ParitySpec), so the spread is result-invisible; the
    * oracle gate re-proves it per query.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.parquet(path)
    val len = fileLen.computeIfAbsent(path, p => try {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sessionState.newHadoopConf())
        .getContentSummary(hp).getLength
    } catch { case _: Exception => Long.MaxValue })
    val par = spark.sparkContext.defaultParallelism
    if (len < spark.sessionState.conf.filesMaxPartitionBytes && par > 1)
      df.repartition(par)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) — which Spark 4
    * only reads as raw long nanos under the legacy conf — and
    * TIMESTAMP(MICROS), read natively as TIMESTAMP_NTZ. Branch on the loaded
    * type and normalize to a µs `TimestampType` either way: raw nanos truncate
    * with integer division (the same floor semantics DuckDB applies narrowing
    * ns→µs on read), and NTZ casts losslessly because every entry point pins
    * `spark.sql.session.timeZone=UTC`, matching DuckDB's naive reading.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
