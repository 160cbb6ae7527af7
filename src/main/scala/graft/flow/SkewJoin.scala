package graft.flow

import org.apache.spark.sql.{Column, DataFrame}
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
  * Salt derivation round-robins on the per-partition row index
  * (`monotonically_increasing_id` = partition id ⊕ local row counter —
  * deterministic under task retry for a stable input split, no rand()).
  * Row-CONTENT hashing would fail exactly on the worst input: identical
  * duplicate rows of a hot key (the classic skew shape in dedup corpora)
  * all hash to one salt and still land on a single reducer; the row-index
  * salt fans them out uniformly regardless of content. Join semantics are
  * unchanged: each (key, salt) pair still meets every matching right-side
  * row exactly once.
  */
object SkewJoin {
  /** The salt expression, exposed so tests audit the fan-out property of
    * the IMPLEMENTATION (not a copy of it). */
  def saltColumn(saltFactor: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltFactor.toLong))

  /** Left-preserving join types only: the right side is replicated once
    * per salt, so a right-preserving join (right/full outer) would emit
    * every UNMATCHED right row saltFactor times — one per surviving
    * replica. */
  private val LeftPreserving =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti")

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(LeftPreserving.contains(joinType.toLowerCase),
      s"saltedJoin supports left-preserving join types only, got '$joinType' " +
        "(an unmatched right row would appear once per salt replica)")
    val left = skewed.withColumn("_salt", saltColumn(saltFactor))
    val right = other.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    left.join(right, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
