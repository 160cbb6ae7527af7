package graft.flow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed side's key space into
  * `saltFactor` sub-keys and replicate the other side across every salt, so
  * one hot key fans out over saltFactor tasks instead of stalling a single
  * reducer.
  *
  * Use when AQE's runtime skew handling can't apply — e.g. the hot keys
  * are known in advance, the join is inside a streaming micro-batch (no
  * AQE re-plan), or a deterministic plan shape is required. For ordinary
  * batch sort-merge joins prefer `spark.sql.adaptive.skewJoin.enabled`
  * and let AQE split partitions at runtime.
  *
  * Salt derivation hashes the skewed side's full row (stable — no rand(),
  * so failed-task retries and replayed micro-batches salt identically),
  * which distributes a hot key's rows uniformly without changing join
  * semantics: each (key, salt) pair still meets every matching right-side
  * row exactly once.
  */
object SkewJoin {
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val entropy = skewed.columns.map(col).toIndexedSeq
    val left = skewed.withColumn("_salt", pmod(hash(entropy: _*), lit(saltFactor)))
    val right = other.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    left.join(right, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
