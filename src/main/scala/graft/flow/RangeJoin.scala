package graft.flow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the theta-join blowup.
  *
  * Spark plans `points JOIN intervals ON start <= pt AND pt <= end` as a
  * broadcast nested loop (or worse, a cartesian product) — O(|P|·|I|)
  * comparisons with no partitioning, the classic scale-killer for
  * temporal/value-band joins. The standard fix is binning: quantize the
  * range dimension into fixed-width bins, explode each interval onto the
  * bins it covers, map each point to its single bin, equi-join on the bin
  * id, and refine with the exact containment predicate.
  *
  *   - The equi-join shuffles on `_bin`, so it hash-partitions, AQE can
  *     size/skew-split it, and cost is O(matching bins), not O(|P|·|I|).
  *   - With `binWidth` ≥ the maximum interval length each interval covers
  *     at most 2 bins, so the interval side at most doubles; a point maps
  *     to exactly one bin, so no pair is produced twice and no dedup pass
  *     is needed.
  *   - Pick `binWidth` ≈ the typical interval length: wider bins mean
  *     fewer replicas but more refine-filter misses, narrower bins the
  *     reverse.
  *
  * Works on any integral range dimension (epoch days/seconds, integer
  * keys); callers convert timestamps with `unix_date`/`unix_timestamp`.
  */
object RangeJoin {

  /** Join `points` (with integral column `ptCol`) to `intervals` (with
    * integral `startCol`/`endCol`, both inclusive) on containment.
    * Requires max interval length ≤ binWidth (checked at runtime inside
    * the join only by the refine predicate — longer intervals are safe
    * for correctness here because bins are exploded from start to end,
    * they just replicate more). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val iv = intervals.withColumn("_bin",
      explode(expr(s"sequence($startCol div $binWidth, $endCol div $binWidth)")))
    val pt = points.withColumn("_bin", expr(s"$ptCol div $binWidth"))
    pt.join(iv, Seq("_bin"))
      .filter(col(startCol) <= col(ptCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }
}
