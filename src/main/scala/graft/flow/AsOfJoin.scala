package graft.flow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each left row, attach the most
  * recent right row with the same key and time ≤ the left row's time.
  *
  * Implementation is by COMPOSITION, not a custom physical operator: union
  * both sides tagged, then `last(..., ignoreNulls) OVER (PARTITION BY key
  * ORDER BY time, tag ROWS UNBOUNDED PRECEDING)` carries the latest right
  * attributes forward onto left rows. One shuffle on the key, sort within
  * partitions, zero range-join pair explosion — the shape that survives
  * 100 TB (a `right.time BETWEEN ...` range join is quadratic per key;
  * this is linear in rows per key).
  *
  * Ties at equal time resolve right-before-left (tag order), i.e. a right
  * row at exactly t matches a left row at t.
  */
object AsOfJoin {
  /** @param valueCols right-side columns to carry onto left rows (renamed
    *                  with `asof_` prefix in the output). */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           valueCols: Seq[String]): DataFrame = {
    val tagged =
      right.select((key +: time +: valueCols).map(col): _*).withColumn("_tag", lit(0))
        .unionByName(
          left.withColumn("_tag", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the whole right row as ONE struct through a single
    // last(ignoreNulls) — carrying each value column independently would
    // let a NULL in one right column fall back to an OLDER right row while
    // the other columns come from the newest, mixing fields across rows.
    // The struct itself is null only on left rows, so nullable right
    // columns stay attached to the row they arrived on.
    val carried = tagged
      .withColumn("_rrow",
        last(when(col("_tag") === 0, struct(valueCols.map(col): _*)),
             ignoreNulls = true).over(w))
    val withVals = valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"_rrow.$c"))
    }
    // On tag=1 rows every shared-name column still holds the LEFT value
    // (the union merges by name but `when(_tag === 0, …)` only reads right
    // rows), so selecting left.columns plus the carried asof_ columns is
    // exact. Key and time column names must match across sides; rename
    // before calling otherwise.
    withVals.filter(col("_tag") === 1)
      .select(left.columns.map(col).toIndexedSeq ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
