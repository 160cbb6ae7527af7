package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Winnow, WinnowFingerprints}

class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fps(text: String, k: Int = 5, w: Int = 4): Seq[Long] =
    WinnowFingerprints(Literal(text), k, w).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq

  test("identical documents produce identical fingerprints") {
    val t = "the quick brown fox jumps over the lazy dog"
    assert(fps(t) == fps(t) && fps(t).nonEmpty)
  }

  test("winnowing guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    val core = "abcdefghijklmnopqrstuv" // 22 chars >= w+k-1 = 8
    val a = s"XXXXX $core YYYYY"
    val b = s"QQ $core PPPPPPPP"
    assert(fps(a).toSet.intersect(fps(b).toSet).nonEmpty,
      "documents sharing a long substring must share a fingerprint")
  }

  test("disjoint alphabets share no fingerprints") {
    assert(fps("aaaa bbbb cccc dddd eeee").toSet
      .intersect(fps("0000 1111 2222 3333 4444").toSet).isEmpty)
  }

  test("an edit only perturbs fingerprints locally") {
    val base = "a" * 30 + "MIDDLE" + "b" * 30
    val edit = "a" * 30 + "MUDDLE" + "b" * 30
    val shared = fps(base).toSet.intersect(fps(edit).toSet)
    // the long unchanged prefix/suffix regions must still match
    assert(shared.nonEmpty, "far-away fingerprints must survive a local edit")
  }

  test("short documents yield the global-min fingerprint; sub-k yields none") {
    assert(fps("abcdef", k = 5, w = 10).length == 1)
    assert(fps("abc", k = 5, w = 4).isEmpty)
  }

  test("rolling hash matches direct polynomial evaluation") {
    val t = "hello world!"
    val k = 5
    val B = 257L; val M = 2147483647L
    def direct(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * B + (b & 0xff)) % M)
    // with w=1 every k-gram hash is picked (dedup-consecutive aside):
    val all = fps(t, k, 1)
    val expected = (0 to t.length - k).map(i => direct(t.substring(i, i + k)))
    // consecutive duplicates collapse; compare against dedup of expected
    val dedup = expected.foldLeft(Vector.empty[Long])((acc, h) =>
      if (acc.nonEmpty && acc.last == h) acc else acc :+ h)
    assert(all == dedup)
  }

  test("DataFrame integration via the Column API") {
    val out = Seq(("x", "some document text here")).toDF("id", "text")
      .select(Winnow.winnow_fingerprints(col("text")).as("fps"))
      .collect()(0).getSeq[Long](0)
    assert(out.nonEmpty && out.forall(h => h >= 0 && h < 2147483647L))
  }
}
