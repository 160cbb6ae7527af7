package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.StrictConvert
import graft.model.Tables

/** Declared queries exercising the strict converter (SURVEY.md §2A A7/A9)
  * end-to-end. The JSON text of the golden query is exactly reproducible in
  * SQL (schema-ordered keys, integer/string payload only), so the oracle
  * checks the converter's actual output bytes — the Spark image of the
  * reference's golden-JSON test (RecordConverterTest.java:17-76).
  */
object ConvertQueries {

  private def payload(s: SparkSession, d: String): DataFrame = {
    val k = regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
    Tables.events(s, d)
      .withColumn("k", when(k === "", lit(null)).otherwise(k).cast("long"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A7: strict conversion golden output on a deterministic sample.
    "q19_convert_golden" -> { (s, d) =>
      payload(s, d)
        .filter(col("event_id") % 101 === 0)
        .select(col("event_id"),
          StrictConvert.strict_to_json(
            struct(col("event_id"), col("event_type"), col("k"))).as("json"))
        .orderBy("event_id")
    },

    // A9: row-level partial-failure split — destination schema requires
    // `k_req` (null whenever k % 7 == 0), convert_error_as routes bad rows.
    "q20_convert_split" -> { (s, d) =>
      val target = StructType(Seq(
        StructField("event_id", LongType, nullable = false),
        StructField("k_req", LongType, nullable = false)))
      payload(s, d)
        .withColumn("k_req", when(col("k") % 7 === 0, lit(null)).otherwise(col("k")))
        .withColumn("err",
          StrictConvert.convert_error_as(struct(col("event_id"), col("k_req")), target))
        .groupBy("event_type")
        .agg(count(when(col("err").isNull, 1)).as("n_ok"),
             count(when(col("err").isNotNull, 1)).as("n_bad"))
        .orderBy("event_type")
    }
  )

  def oracle: Map[String, String] = Map(
    "q19_convert_golden" ->
      """SELECT event_id,
        | '{"event_id":' || event_id || ',"event_type":"' || event_type ||
        | '","k":' || CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)
        | || '}' AS json
        |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin,

    "q20_convert_split" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        | CAST(SUM(CASE WHEN k % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        | CAST(SUM(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
