package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.ops.{Analytics, Behavior, ConvertQueries, Corpus, Curation, Dedup, Evaluation, Extras, FlowQueries, Graph, Lakehouse, Multimodal, Pipeline, Quality, Relational, Similarity, Stewardship, TextAnalysis, Warehouse}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per declared operator (SURVEY.md §2) to a
  * DataFrame builder over a scale-factor directory; `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way join + broadcast dims + exact aggregation (TPC-H Q5 image).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ FlowQueries.queries ++ ConvertQueries.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Extras.queries ++ Curation.queries ++ Corpus.queries ++ Behavior.queries ++
      Graph.queries ++ Warehouse.queries ++ Pipeline.queries ++ Evaluation.queries ++
      Quality.queries ++ Lakehouse.queries ++ Analytics.queries ++
      Stewardship.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ FlowQueries.oracle ++ ConvertQueries.oracle ++
      TextAnalysis.oracle ++ Dedup.oracle ++ Similarity.oracle ++ Multimodal.oracle ++
      Extras.oracle ++ Curation.oracle ++ Corpus.oracle ++ Behavior.oracle ++
      Graph.oracle ++ Warehouse.oracle ++ Pipeline.oracle ++ Evaluation.oracle ++
      Quality.oracle ++ Lakehouse.oracle ++ Analytics.oracle ++
      Stewardship.oracle
}
