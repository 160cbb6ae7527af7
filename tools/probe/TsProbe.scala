import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TsProbe extends App {
  val spark = SparkSession.builder().master("local[2]")
    .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
  df.printSchema()
  val t = df.withColumn("ts2", timestamp_micros(expr("ts div 1000")))
  t.select("event_id","ts","ts2").show(3, false)
}
