package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.StrictConvert
import graft.model.Tables
import graft.streaming.StreamPipeline

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
    },

    // A7 fallback: schemaless decode — no declared value schema; the
    // pipeline infers one from a bounded payload sample (reference
    // RecordConverter.java:17-23 infers from the runtime value and makes
    // it optional) and decodes with it. The inferred `k` arrives typed
    // (BIGINT), not re-parsed per row.
    "q46_infer_decode" -> { (s, d) =>
      val env = Tables.events(s, d).select(
        lit("events").as("topic"), lit(0).as("partition"),
        col("event_id").as("offset"), col("event_type").as("key"),
        col("props").as("value"))
      StreamPipeline.decodeInferred(env, sampleSize = 256)
        .select(col("key").as("event_type"), col("payload.k").as("k"))
        .filter(col("k").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
        .orderBy("event_type")
    }
  )

  def oracle: Map[String, String] = Map(
    // COALESCE(…, 'null') matches strict_to_json, which emits `"k":null`
    // for an optional missing field — '||' alone would null out the whole
    // string for a props without k.
    "q19_convert_golden" ->
      """SELECT event_id,
        | '{"event_id":' || event_id || ',"event_type":"' || event_type ||
        | '","k":' || COALESCE(CAST(CAST(NULLIF(
        |     regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT) AS VARCHAR), 'null')
        | || '}' AS json
        |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin,

    // NULL-explicit branches: a row with no k at all is a converter
    // REJECT (null in the non-nullable k_req), so it must count as n_bad —
    // a bare `k % 7 = 0 / <> 0` CASE would send NULL k to neither bucket.
    "q20_convert_split" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        | CAST(SUM(CASE WHEN k IS NOT NULL AND k % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        | CAST(SUM(CASE WHEN k IS NULL OR k % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q46_infer_decode" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM t WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
