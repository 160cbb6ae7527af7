package graft

import java.math.{BigDecimal => JBigDecimal}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Relational}

/** Executable form of the oracle-parity determinism contract (README):
  * the idioms every declared query leans on to hash-match DuckDB are
  * property-tested against engine-independent reference models, so the
  * rules are checked code, not prose.
  *
  *   - `neutralHash32` must equal the first 8 hex digits of the
  *     byte-standard md5 of the UTF-8 bytes — md5 is bytewise identical
  *     in every engine, which is the whole reason the LSH/sketch family
  *     is oracle-checkable (DuckDB: ('0x'||substr(md5(s),1,8))::BIGINT).
  *   - `dsum`/`money`/`rate` must behave as EXACT decimal arithmetic
  *     with one final cast to double — the semantics DuckDB's
  *     SUM(DECIMAL) has natively — and be partitioning-invariant
  *     (decimal addition is associative/commutative; double addition is
  *     not, which is why summing doubles directly would hash-mismatch).
  */
class ParitySpec extends AnyFunSuite {
  /** Deterministic ScalaCheck sampling (scalatestplus bridge isn't on the
    * offline classpath, so drive Gen directly with fixed seeds). */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference model: unsigned value of the md5 digest's first 4 bytes —
    * exactly the first 8 hex digits read base-16. */
  private def refNeutralHash32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("neutralHash32 equals the byte-standard md5 prefix on arbitrary unicode") {
    // ASCII-heavy with CSV/JSON metacharacters, Latin-1, CJK, and astral
    // emoji (4-byte UTF-8) — the encodings where a hash family diverges
    // between engines if anything but raw UTF-8 bytes is hashed
    val genCp = Gen.frequency(
      6 -> Gen.choose(0x20, 0x7e),
      2 -> Gen.choose(0xa0, 0x2fff),
      1 -> Gen.choose(0x4e00, 0x9fff),
      1 -> Gen.choose(0x1f300, 0x1f64f))
    val genStr = Gen.listOf(genCp).map(_.flatMap(Character.toChars(_).toSeq).mkString)
    val strs = (samples(genStr, 300) :+ "" :+ "a,b\nc\\d\"e").distinct
    val got = strs.toDF("s")
      .select(col("s"), Dedup.neutralHash32(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      assert(got(s) == refNeutralHash32(s),
        s"hash mismatch for ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("dsum decimal idiom: exact decimal sum, partitioning-invariant") {
    // 2-decimal money values generated as exact cents; the reference
    // model sums cents in Long (exact) and casts once to double — the
    // same arithmetic DuckDB's SUM(CAST(x AS DECIMAL)) performs
    val genGroup = Gen.nonEmptyListOf(Gen.choose(-1000000000L, 1000000000L))
    val groups = samples(genGroup, 40).zipWithIndex
    val rows = groups.flatMap { case (vs, g) => vs.map(c => (g, c / 100.0)) }
    val df = rows.toDF("g", "v")
    def run(d: DataFrame): Map[Int, Double] =
      d.groupBy("g").agg(Relational.dsum(col("v"), 2).as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val expected = groups.map { case (vs, g) =>
      g -> new JBigDecimal(vs.sum).movePointLeft(2).doubleValue
    }.toMap
    assert(run(df.repartition(1)) == expected, "single-partition sum diverges")
    assert(run(df.repartition(7)) == expected,
      "decimal sums must not depend on the partitioning")
  }

  test("money*rate products: exact decimal multiply-then-sum parity") {
    // the q01/q02 revenue kernel: DECIMAL(12,2) price × DECIMAL(4,2)
    // rate, summed exactly, one final double cast
    val gen = for {
      cents <- Gen.choose(0L, 9999999L)
      disc  <- Gen.choose(0, 100)
    } yield (cents, disc)
    val xs = samples(gen, 250)
    val df = xs.map { case (c, d) => (c / 100.0, d / 100.0) }.toDF("p", "d")
    val got = df
      .agg(sum(Relational.money(col("p")) * Relational.rate(lit(1) - col("d")))
        .cast("double")).collect()(0).getDouble(0)
    val expected = xs.map { case (c, d) =>
      JBigDecimal.valueOf(c, 2).multiply(JBigDecimal.valueOf(100L - d, 2))
    }.reduce(_.add(_)).doubleValue
    assert(got == expected,
      s"decimal product sum must be bit-identical: got $got expected $expected")
  }
}
