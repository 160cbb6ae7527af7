package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

// top-level so Spark can build an Encoder without an outer-scope instance
case class Ev(ts: Timestamp, key: String, value: Double)
case class NDoc(ts: Timestamp, doc_id: Long, text: String)
case class FEv(ts: Timestamp, key: String, kind: String)

/** B14 operator coverage over MemoryStream (the offline stand-in for the
  * Kafka source, per FIXTURES.md F5). */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private var qid = 0
  private def runToMemory(df: DataFrame, mode: OutputMode): String = {
    qid += 1
    val name = s"streaming_ops_out_$qid"
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    name
  }

  test("tumbling window aggregation groups by event-time bucket") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    s.addData(Ev(t(1), "a", 1.0), Ev(t(2), "a", 2.0), Ev(t(11), "a", 4.0), Ev(t(3), "b", 8.0))
    val out = runToMemory(
      StreamingOps.tumblingAgg(s.toDF(), "ts", "key", "10 minutes", "1 minute"),
      OutputMode.Complete)
    val rows = spark.table(out)
      .selectExpr("window.start", "key", "n", "sum_value").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "a", 2L, 3.0),
      (Timestamp.valueOf("2024-01-01 10:10:00"), "a", 1L, 4.0),
      (Timestamp.valueOf("2024-01-01 10:00:00"), "b", 1L, 8.0)))
  }

  test("streaming CMS matrix is bit-identical to the batch sketch (C12 twin)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // Skewed term stream across two REAL micro-batches (data added and
    // processed while the query runs — both addData calls before start
    // would collapse into one batch and never exercise the cross-batch
    // state merge): incremental updates must land in the same cells as
    // one batch pass.
    val s = MemoryStream[String]
    qid += 1
    val name = s"streaming_ops_out_$qid"
    val q = StreamingOps.cmsMatrix(s.toDF().toDF("term"), "term")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName(name).start()
    s.addData("spark", "spark", "shuffle", "spark", "join")
    q.processAllAvailable()
    s.addData("join", "spark", "codegen", "shuffle")
    q.processAllAvailable()
    assert(q.lastProgress.batchId >= 1,
      "the test must span at least two micro-batches")
    q.stop()
    val out = name
    val streaming = spark.table(out).collect()
      .map(r => (r.getAs[Int]("row"), r.getAs[Long]("ccol"), r.getAs[Long]("cnt"))).toSet
    val batch = graft.ops.Curation.cmsCells(
        Seq("spark", "spark", "shuffle", "spark", "join",
          "join", "spark", "codegen", "shuffle").toDF("term"), "term")
      .groupBy("row", "ccol").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt")).collect()
      .map(r => (r.getAs[Int]("row"), r.getAs[Long]("ccol"), r.getAs[Long]("cnt"))).toSet
    assert(streaming == batch, "streaming and batch sketches must agree cell-for-cell")
    // Sketch-state bound: never more than depth x width cells.
    assert(streaming.size <= graft.ops.Curation.CmsDepth * graft.ops.Curation.CmsWidth)
    // Every term contributes exactly one cell per depth row.
    assert(streaming.toSeq.map(_._3).sum ==
      9L * graft.ops.Curation.CmsDepth)
  }

  test("sliding window emits one group per overlapping window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    s.addData(Ev(t(5), "a", 1.0))
    val out = runToMemory(
      StreamingOps.slidingAgg(s.toDF(), "ts", "key", "10 minutes", "5 minutes", "1 minute"),
      OutputMode.Complete)
    // a 10-minute window sliding by 5 covers 10:05 twice: [9:55,10:05) no —
    // [10:00,10:10) and [10:05,10:15)
    assert(spark.table(out).count() == 2)
  }

  test("session window closes after the inactivity gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    s.addData(Ev(t(1), "a", 1.0), Ev(t(3), "a", 1.0), // session 1 (gap < 5m)
              Ev(t(20), "a", 1.0))                    // session 2
    val out = runToMemory(
      StreamingOps.sessionAgg(s.toDF(), "ts", "key", "5 minutes", "1 minute"),
      OutputMode.Complete)
    val sessions = spark.table(out).selectExpr("session_window.start", "n").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(sessions == Set(
      (Timestamp.valueOf("2024-01-01 10:01:00"), 2L),
      (Timestamp.valueOf("2024-01-01 10:20:00"), 1L)))
  }

  test("dropDuplicatesWithinWatermark suppresses replays of the same key") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    s.addData(Ev(t(1), "k1", 1.0), Ev(t(2), "k1", 99.0), Ev(t(3), "k2", 2.0))
    val out = runToMemory(
      StreamingOps.dedupWithinWatermark(s.toDF(), "ts", Seq("key"), "30 minutes"),
      OutputMode.Append)
    val keys = spark.table(out).select("key").collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("k1", "k2"), "duplicate k1 must be suppressed")
  }

  test("append mode drops late data beyond the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    val q = StreamingOps.tumblingAgg(s.toDF(), "ts", "key", "10 minutes", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_drop").start()
    s.addData(Ev(t(1), "a", 1.0), Ev(t(2), "a", 1.0))
    q.processAllAvailable()
    s.addData(Ev(Timestamp.valueOf("2024-01-01 11:00:00"), "a", 1.0))
    q.processAllAvailable() // watermark advances to 10:50
    s.addData(Ev(t(3), "a", 99.0)) // late: event-time 10:03 < watermark
    q.processAllAvailable()         // also triggers the flush of closed windows
    q.stop()
    val rows = spark.table("late_drop")
      .selectExpr("window.start", "n").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(rows(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L,
      "the late event must not be counted into the closed window")
  }

  test("mapGroupsWithState keeps running counts across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    // NoTimeout keeps the engine data-driven (deterministic under
    // processAllAvailable); the timeout leg has its own test below.
    val counts = StreamingOps.runningCount[Ev](s.toDS(), _.key, idleTimeout = None)
    val q = counts.toDF().writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("running_counts").start()
    s.addData(Ev(t(1), "a", 1.0), Ev(t(2), "a", 1.0), Ev(t(3), "b", 1.0))
    q.processAllAvailable()
    s.addData(Ev(t(4), "a", 1.0)) // second micro-batch must see prior state
    q.processAllAvailable()
    q.stop()
    val last = spark.table("running_counts").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last == Map("a" -> 3L, "b" -> 1L))
  }

  test("stream-stream join matches within the skew window only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    val joined = StreamingOps.streamStreamJoin(
      l.toDF(), r.toDF(), keyCol = "key",
      watermark = "10 minutes", skew = "2 MINUTES")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ss_join").start()
    l.addData(Ev(t(10), "a", 1.0), Ev(t(10), "b", 5.0))
    r.addData(Ev(t(11), "a", 2.0),  // within skew → matches
              Ev(t(20), "a", 3.0),  // 10 min away → no match
              Ev(t(11), "c", 4.0))  // wrong key → no match
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join")
      .select("key", "value", "r_value").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2))).toSet
    assert(rows == Set(("a", 1.0, 2.0)), s"got $rows")
  }

  test("flatMapGroupsWithState emits a session exactly when it provably closed") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    val sessions = StreamingOps.closedSessions[Ev](
      s.toDS().withWatermark("ts", "1 minute").as[Ev],
      _.key, _.ts, gapMillis = 5 * 60 * 1000)
    val q = sessions.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("closed_sessions").start()
    // batch 1: open sessions for a and b
    s.addData(Ev(t(1), "a", 1.0), Ev(t(3), "a", 1.0), Ev(t(2), "b", 1.0))
    q.processAllAvailable()
    assert(spark.table("closed_sessions").isEmpty,
      "nothing closes while the watermark is behind the gap")
    // batch 2: a@10:30 gap-splits into a second session. In the data
    // batch itself (wm 10:02 < 10:08) nothing may emit — the emission
    // happens in the trailing no-data batch, once the watermark advances
    // to 10:29 and provably passes a's first deadline (10:08) and b's
    // (10:07). (The non-emission while wm < end+gap is pinned by the
    // bridge test below, where the watermark delay exceeds the gap.)
    s.addData(Ev(t(30), "a", 1.0))
    q.processAllAvailable()
    val afterB2 = spark.table("closed_sessions").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(afterB2 == Set(("a", t(1), t(3), 2L), ("b", t(2), t(2), 1L)),
      s"watermark 10:29 closes exactly the two early sessions: $afterB2")
    // batch 3: c@10:40 pushes the watermark to 10:39, past a's second
    // deadline (10:35)
    s.addData(Ev(t(40), "c", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("closed_sessions").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(rows == Set(
      ("a", t(1), t(3), 2L),    // watermark passed end+gap
      ("b", t(2), t(2), 1L),    // closed by the event-time timeout
      ("a", t(30), t(30), 1L)), // c@10:40 pushed the watermark past 10:35
      s"unexpected closed sessions: $rows")
    // c's session stays open (deadline 10:45 > watermark 10:39)
  }

  test("streaming near-dup candidates: bucket pairs within the horizon, expiry after") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[NDoc]
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different words about winnowing fingerprints and sketches here"
    val cands = StreamingOps.streamingNearDupCandidates(
      s.toDF().withWatermark("ts", "1 minute"),
      horizonMillis = 10 * 60 * 1000)
    val q = cands.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("near_dup_stream").start()
    // identical docs share every band bucket → one candidate per band
    s.addData(NDoc(t(0), 1L, textA), NDoc(t(1), 2L, textA), NDoc(t(2), 3L, textB))
    q.processAllAvailable()
    val first = spark.table("near_dup_stream")
      .select("doc_a", "doc_b", "band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(first.map(x => (x._1, x._2)).distinct.toSeq == Seq((1L, 2L)),
      s"only the identical pair may be a candidate: ${first.toSeq}")
    assert(first.length == 4, s"one candidate per band: ${first.toSeq}")
    // push the watermark past every bucket's horizon, then replay the
    // same text: old members expired, so no pair with doc 1/2 forms —
    // but a fresh same-text pair (5, 6) does
    s.addData(NDoc(Timestamp.valueOf("2024-01-01 11:00:00"), 4L, "unrelated filler words to advance the watermark forward"))
    q.processAllAvailable()
    s.addData(NDoc(Timestamp.valueOf("2024-01-01 11:05:00"), 5L, textA),
              NDoc(Timestamp.valueOf("2024-01-01 11:05:01"), 6L, textA))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("near_dup_stream")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
    assert(all == Set((1L, 2L), (5L, 6L)),
      s"expired buckets must not pair with pre-horizon docs: $all")
  }

  test("closedSessions bridges two unconfirmed sessions and never widens across the gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    val sessions = StreamingOps.closedSessions[Ev](
      s.toDS().withWatermark("ts", "30 minutes").as[Ev],
      _.key, _.ts, gapMillis = 5 * 60 * 1000)
    val q = sessions.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("bridge_sessions").start()
    // two sessions 8 min apart — farther than the 5-min gap, closer than
    // the 30-min watermark delay, so neither is provably closed
    s.addData(Ev(t(1), "k", 1.0), Ev(t(9), "k", 1.0))
    q.processAllAvailable()
    assert(spark.table("bridge_sessions").isEmpty)
    // an out-of-order event at 10:05 is within the gap of BOTH — the two
    // sessions must merge into one (1..9), not overlap or mis-split
    s.addData(Ev(t(5), "k", 1.0))
    q.processAllAvailable()
    // push the watermark far past end+gap to flush everything
    s.addData(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "z", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("bridge_sessions").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .filter(_._1 == "k")
    assert(rows.toSeq == Seq(("k", t(1), t(9), 3L)),
      s"bridge event must collapse the two sessions: ${rows.toSeq}")
  }

  test("closedSessions drops late events instead of merging across the gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    val sessions = StreamingOps.closedSessions[Ev](
      s.toDS().withWatermark("ts", "1 minute").as[Ev],
      _.key, _.ts, gapMillis = 5 * 60 * 1000)
    val q = sessions.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_sessions").start()
    s.addData(Ev(t(40), "c", 1.0))  // open session; watermark → 10:39
    q.processAllAvailable()
    // a late event 35 min BEFORE the open session (behind the watermark):
    // flatMapGroupsWithState receives it — the operator must drop it, or
    // the session would absorb an event a whole gap away
    s.addData(Ev(t(5), "c", 9.0))
    q.processAllAvailable()
    s.addData(Ev(Timestamp.valueOf("2024-01-01 11:00:00"), "d", 1.0))
    q.processAllAvailable() // watermark 10:59 > 10:45 closes c
    q.stop()
    val rows = spark.table("late_sessions").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .filter(_._1 == "c")
    assert(rows.toSeq == Seq(("c", t(40), t(40), 1L)),
      s"late event must not stretch the session: ${rows.toSeq}")
  }

  test("funnelStages folds out-of-order arrivals in event-time order") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[FEv]
    val stages = StreamingOps.funnelStages[FEv](
      s.toDS().withWatermark("ts", "10 minutes").as[FEv],
      _.key, _.ts, _.kind)
    val q = stages.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_stages").start()
    def rows() = spark.table("funnel_stages").collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2))).toSet
    // u's click+purchase arrive BEFORE its view (out of order): nothing
    // may emit yet — folding in arrival order would wrongly reject both
    s.addData(FEv(t(5), "u", "click"), FEv(t(7), "u", "purchase"))
    q.processAllAvailable()
    assert(rows().isEmpty, "events above the watermark must stay buffered")
    // the earlier view arrives within the watermark horizon; x probes the
    // wrong-order rejection (purchase precedes any click in EVENT time)
    s.addData(FEv(t(1), "u", "view"),
      FEv(t(2), "x", "purchase"), FEv(t(3), "x", "view"), FEv(t(4), "x", "click"))
    q.processAllAvailable()
    // advance the watermark to 10:10 (> all of u's and x's events)
    s.addData(FEv(t(20), "w", "view"))
    q.processAllAvailable()
    assert(rows() == Set(
      ("u", "view", t(1)), ("u", "click", t(5)), ("u", "purchase", t(7)),
      ("x", "view", t(3)), ("x", "click", t(4))),
      s"event-time fold must qualify u fully and reject x's early purchase: ${rows()}")
    // advance past w's view: its stage emits via the event-time timeout
    s.addData(FEv(t(40), "z", "view"))
    q.processAllAvailable()
    q.stop()
    assert(rows().contains(("w", "view", t(20))),
      "a quiet key's ripe buffer must fold via the event-time timeout")
    assert(!rows().exists(r => r._1 == "x" && r._2 == "purchase"),
      "x never purchases after its click")
  }

  test("funnelStages suppresses duplicates within the horizon and restarts after expiry") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[FEv]
    val stages = StreamingOps.funnelStages[FEv](
      s.toDS().withWatermark("ts", "1 minute").as[FEv],
      _.key, _.ts, _.kind, expireAfterMillis = 5 * 60 * 1000)
    val q = stages.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_expiry").start()
    def viewRows() = spark.table("funnel_expiry").collect()
      .filter(r => r.getString(0) == "u" && r.getString(1) == "view")
      .map(_.getTimestamp(2)).toSeq
    s.addData(FEv(t(1), "u", "view"))
    q.processAllAvailable()
    s.addData(FEv(t(3), "u", "view"), FEv(t(4), "z", "view")) // wm -> 10:03
    q.processAllAvailable()
    assert(viewRows() == Seq(t(1)),
      s"second view within the horizon must not re-emit: ${viewRows()}")
    // push the watermark past u.lastSeen(10:03) + 5 min: u's state expires
    s.addData(FEv(t(20), "z", "view"))
    q.processAllAvailable()
    // a reappearing u starts a FRESH journey (documented restart)
    s.addData(FEv(t(25), "u", "view"), FEv(t(40), "z", "view"))
    q.processAllAvailable()
    q.stop()
    assert(viewRows().toSet == Set(t(1), t(25)),
      s"post-expiry reappearance is a new journey: ${viewRows()}")
  }

  test("idle-timeout drops per-key state so a reappearing key restarts at 1") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    val counts = StreamingOps.runningCount[Ev](s.toDS(), _.key,
      idleTimeout = Some("200 milliseconds"))
    // a processing-time trigger (not ASAP) so timeout-evaluation batches
    // are rate-limited — the production pairing the scaladoc prescribes.
    val q = counts.toDF().writeStream.outputMode(OutputMode.Update)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .format("memory").queryName("timeout_counts").start()
    def countsNow(): Seq[Long] = spark.table("timeout_counts")
      .filter(org.apache.spark.sql.functions.col("key") === "a")
      .collect().map(_.getLong(1)).toSeq
    def awaitRow(pred: Seq[Long] => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!pred(countsNow())) {
        assert(System.currentTimeMillis() < deadline, s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    s.addData(Ev(t(1), "a", 1.0), Ev(t(2), "a", 1.0))
    awaitRow(_.contains(2L), "initial count of 2")
    Thread.sleep(1000) // > idleTimeout: the key's state must expire
    s.addData(Ev(t(3), "a", 1.0))
    awaitRow(_.contains(1L), "post-timeout restart at 1")
    q.stop()
    val seen = countsNow()
    assert(seen.contains(2L) && seen.contains(1L) && !seen.contains(3L),
      s"state must reset after idle timeout, saw $seen")
  }

  test("piiRedact runs unchanged on a stream and matches the batch output") {
    // the PII scrub is stateless row-local work, so the SAME operator
    // must compose into a readStream→writeStream leg with bit-identical
    // results — the q96 streaming twin (B14's batch/stream parity rule).
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = Seq(
      NDoc(t(1), 1L, "mail a.b@c.io now"),
      NDoc(t(2), 2L, "call 555-123-4567"),
      NDoc(t(3), 3L, "clean row"))
    val s = MemoryStream[NDoc]
    s.addData(docs: _*)
    val out = runToMemory(
      graft.ops.TextAnalysis.piiRedact(s.toDF(), "text")
        .select("doc_id", "n_email", "n_phone", "n_id", "redacted"),
      OutputMode.Append)
    val streamed = spark.table(out).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    val batch = graft.ops.TextAnalysis.piiRedact(docs.toDF(), "text")
      .select("doc_id", "n_email", "n_phone", "n_id", "redacted").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(streamed == batch)
    assert(streamed(1L)._4 == "mail <EMAIL> now" && streamed(2L)._4 == "call <PHONE>")
  }

  test("streaming funnel stages equal batch q71's stage table under out-of-order delivery") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // the REAL fixture (600 events, 15 users), delivered out of order:
    // a deterministic multiplicative hash of (ts, key) interleaves users
    // and times across batches (no Random — replayable)
    val ev = graft.model.Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("ts"), col("user_id").cast("string").as("key"),
        col("event_type").as("kind"))
      .as[FEv].collect().toSeq
    val shuffled = ev.sortBy(e => (e.ts.getTime * 2654435761L + e.key.hashCode).toInt)
    val maxMs = ev.map(_.ts.getTime).max
    val minMs = ev.map(_.ts.getTime).min
    // watermark delay wider than the whole fixture span: nothing is ever
    // late-dropped, every journey folds only at the final flush — the
    // strictest possible out-of-order schedule
    val delayMin = (maxMs - minMs) / 60000 + 10
    val s = MemoryStream[FEv]
    val stages = StreamingOps.funnelStages[FEv](
      s.toDS().withWatermark("ts", s"$delayMin minutes").as[FEv],
      _.key, _.ts, _.kind, expireAfterMillis = (maxMs - minMs) * 2 + 1000)
    val q = stages.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_parity").start()
    shuffled.grouped((shuffled.size + 4) / 5).foreach { b =>
      s.addData(b: _*); q.processAllAvailable()
    }
    // sentinel far past everything pushes the watermark over every real
    // event, folding all buffered journeys
    s.addData(FEv(new Timestamp(maxMs + delayMin * 60000 * 3), "zz_sentinel", "view"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("funnel_parity").collect()
      .filter(_.getString(0) != "zz_sentinel")
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        val m = rows.map(r => r.getString(1) -> r.getTimestamp(2).getTime).toMap
        k -> ((m.get("view"), m.get("click"), m.get("purchase")))
      }
    // batch leg: q71's shared stage table, µs floored to ms — lossless
    // here because the fixture has no same-user same-ms events (and the
    // two legs' documented tie rules only diverge on exact ties)
    val batch = graft.ops.Behavior.funnelTimes(spark, sf).collect()
      .map { r =>
        def g(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i) / 1000)
        r.getLong(0).toString -> ((g(1), g(2), g(3)))
      }
      .filter { case (_, (v, c, p)) => v.isDefined || c.isDefined || p.isDefined }
      .toMap
    assert(streamed == batch,
      s"streaming vs batch stage tables diverge:\n streamed=$streamed\n batch=$batch")
  }

  test("stream-static enrichment broadcasts the dim and keeps unmatched events (left join)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    s.addData(Ev(t(1), "a", 1.0), Ev(t(2), "b", 2.0), Ev(t(3), "zz", 3.0))
    val dim = Seq(("a", "alpha", 10L), ("b", "beta", 20L), ("c", "gamma", 30L))
      .toDF("key", "name", "rank")
    val out = runToMemory(
      StreamingOps.streamStaticEnrich(s.toDF(), dim, "key"),
      OutputMode.Append)
    val rows = spark.table(out)
      .selectExpr("key", "value", "dim_name", "dim_rank").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    assert(rows == Set(
      ("a", 1.0, Some("alpha"), Some(10L)),
      ("b", 2.0, Some("beta"), Some(20L)),
      ("zz", 3.0, None, None)), // missing dim key SURVIVES with nulls
      s"enrichment rows: $rows")
  }

  test("Misra-Gries heavy hitters: bounded state, frequent items present, error bracketed") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    val k = 4 // at most 3 counters; anything with freq > N/4 guaranteed kept
    val hh = StreamingOps.heavyHitters[Ev](s.toDS(), _ => "all", _.key, k)
    val q = hh.toDF().writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("mg_hh").start()
    // skewed stream across two micro-batches: "hot" 12 of 20 events,
    // 8 singleton-ish others spread over 6 distinct keys
    val hot = (1 to 7).map(i => Ev(t(i), "hot", 1.0))
    val cold = Seq("c1", "c2", "c3", "c4").zipWithIndex
      .map { case (c, i) => Ev(t(10 + i), c, 1.0) }
    s.addData(hot ++ cold: _*)
    q.processAllAvailable()
    s.addData((1 to 5).map(i => Ev(t(30 + i), "hot", 1.0)) ++
      Seq(Ev(t(40), "c5", 1.0), Ev(t(41), "c6", 1.0),
        Ev(t(42), "c1", 1.0), Ev(t(43), "c2", 1.0)): _*)
    q.processAllAvailable()
    q.stop()
    val last = spark.table("mg_hh").collect()
      .map(r => (r.getAs[Long]("n_processed"), r.getAs[Long]("decrements"),
        r.getAs[Map[String, Long]]("items")))
      .maxBy(_._1) // latest summary has the largest n
    val (n, dec, items) = last
    val trueCounts = Map("hot" -> 12L, "c1" -> 2L, "c2" -> 2L,
      "c3" -> 1L, "c4" -> 1L, "c5" -> 1L, "c6" -> 1L)
    assert(n == 20L)
    assert(items.size <= k - 1, "state must stay within k-1 counters")
    assert(dec <= n / k, "decrement rounds cannot exceed N/k")
    // frequency > N/k = 5 must be present
    assert(items.contains("hot"), s"hot item missing from $items")
    // every estimate brackets truth: est <= true <= est + dec
    items.foreach { case (i, est) =>
      assert(est <= trueCounts(i), s"$i overestimated")
      assert(trueCounts(i) <= est + dec, s"$i undercounted beyond the bound")
    }
  }

  test("online CUSUM alarms on the shifted key only and matches a fold mirror") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val (ref, h) = (10L, 25L)
    val s = MemoryStream[Ev]
    val cusum = StreamingOps.onlineCusum[Ev](s.toDS(), _.key,
      _.value.toLong, ref = ref, h = h)
    val q = cusum.toDF().writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cusum_status").start()
    val batch1 = (1 to 6).map(i => Ev(t(i), "stable", 10.0 + (i % 2))) ++
      (1 to 6).map(i => Ev(t(i), "drift", 10.0 - (i % 2)))
    s.addData(batch1: _*)
    q.processAllAvailable()
    val mid = spark.table("cusum_status").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("alarms_pos"), r.getAs[Long]("alarms_neg"))).toMap
    assert(mid("stable") == ((0L, 0L)) && mid("drift") == ((0L, 0L)),
      "no alarm before the level shift")
    // level shift: "drift" jumps to 25/event (+15 vs the reference)
    val batch2 = (7 to 12).map(i => Ev(t(i), "drift", 25.0)) ++
      (7 to 12).map(i => Ev(t(i), "stable", 10.0))
    s.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // Scala fold mirror over the full per-key value sequence
    def mirror(xs: Seq[Long]) =
      xs.foldLeft((0L, 0L, 0L, 0L, 0L)) { case ((n, sp0, sn0, ap0, an0), x) =>
        var sp = math.max(0L, sp0 + (x - ref))
        var sn = math.max(0L, sn0 + (ref - x))
        var ap = ap0
        var an = an0
        if (sp > h) { ap += 1; sp = 0L }
        if (sn > h) { an += 1; sn = 0L }
        (n + 1, sp, sn, ap, an)
      }
    val byKey = (batch1 ++ batch2).groupBy(_.key)
      .map { case (k, vs) => k -> vs.sortBy(_.ts.getTime).map(_.value.toLong) }
    val fin = spark.table("cusum_status").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("s_pos"),
        r.getAs[Long]("s_neg"), r.getAs[Long]("alarms_pos"),
        r.getAs[Long]("alarms_neg")))
      .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
    byKey.foreach { case (k, xs) =>
      val (n, sp, sn, ap, an) = mirror(xs)
      val got = fin(k)
      assert((got._2, got._3, got._4, got._5, got._6) == ((n, sp, sn, ap, an)),
        s"key $k: got $got, want ($n, $sp, $sn, $ap, $an)")
    }
    assert(fin("drift")._5 > 0, "the shifted key must alarm on the high side")
    assert(fin("stable")._5 == 0 && fin("stable")._6 == 0,
      "the stable key must never alarm")
  }

  test("windowed distinct gauge closes windows and bounds its estimate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    val wd = StreamingOps.windowedDistinct(s.toDF(), "ts", "key",
      win = "10 minutes", watermark = "0 seconds")
    val q = wd.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win_distinct").start()
    // window [10:00, 10:10): keys a,b,a,c (3 distinct, 4 events)
    s.addData(Ev(t(1), "a", 1.0), Ev(t(2), "b", 1.0), Ev(t(3), "a", 1.0),
      Ev(t(4), "c", 1.0))
    q.processAllAvailable()
    // advance the watermark past the first window to force its close
    s.addData(Ev(t(15), "z", 1.0))
    q.processAllAvailable()
    s.addData(Ev(t(25), "z", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_distinct")
      .selectExpr("window.start", "n_distinct", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toList
    val first = rows.find(_._1 == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(first.isDefined, s"first window must close and emit: $rows")
    val (_, nd, ne) = first.get
    assert(ne == 4L)
    assert(nd <= ne, "distinct estimate never exceeds the event count")
    // HLL++ is exact in its sparse regime; allow the contractual rsd anyway
    assert(math.abs(nd - 3L) <= 1L, s"estimate $nd too far from 3")
  }

  test("late-drop gauge counts exactly what a watermark would discard") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    // 2-minute allowed lateness, event-time in the ts column
    val g = StreamingOps.lateDropGauge[Ev](s.toDS(), _.key, _.value.toLong,
      _.ts.getTime * 1000L, allowedLatenessUs = 120L * 1000000L)
    val q = g.toDF().writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("late_gauge").start()
    // arrival order via value: hwm reaches 10:10; 10:05 is within the
    // 2-min?? no — 5 min behind -> dropped; 10:09 is 1 min behind -> ok
    s.addData(Ev(t(1), "a", 1), Ev(t(10), "a", 2), Ev(t(5), "a", 3),
      Ev(t(9), "a", 4), Ev(t(11), "a", 5))
    s.addData(Ev(t(1), "b", 1), Ev(t(2), "b", 2))
    q.processAllAvailable(); q.stop()
    val fin = spark.table("late_gauge").collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_seen"),
        r.getAs[Long]("n_admitted"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("hwm_us")))).toMap
    assert(fin("a") == ((5L, 4L, 1L, t(11).getTime * 1000L)),
      s"a: ${fin("a")} — only the 5-minutes-late event drops")
    assert(fin("b") == ((2L, 2L, 0L, t(2).getTime * 1000L)))
    // conservation law
    fin.values.foreach { case (n, adm, drop, _) => assert(n == adm + drop) }
  }


  test("P2 quantile gauge tracks the exact p95 within tolerance at O(1) state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    val g = StreamingOps.p2QuantileGauge[Ev](s.toDS(), _.key,
      _.value.toLong, _.value.toLong, p = 0.95)
    val q = g.toDF().writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("p2_gauge").start()
    // a deterministic permutation of 1..2000 for key a, fed in 4 batches;
    // key b sees only 3 values (the pre-init path)
    val perm = (1 to 2000).sortBy(i => (i * 2654435761L) % 4096)
    perm.grouped(500).foreach { chunk =>
      s.addData(chunk.map(i => Ev(t(1), "a", i.toDouble)))
      q.processAllAvailable()
    }
    s.addData(Ev(t(1), "b", 7.0), Ev(t(2), "b", 3.0), Ev(t(3), "b", 5.0))
    q.processAllAvailable(); q.stop()
    val fin = spark.table("p2_gauge").collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.maxBy(_.getAs[Long]("n")) }
    val a = fin("a")
    assert(a.getAs[Long]("n") == 2000L)
    assert(a.getAs[Long]("v_min") == 1L && a.getAs[Long]("v_max") == 2000L)
    // exact p95 of 1..2000 is 1900; P2 must land within 5% of the range
    val est = a.getAs[Long]("est_milli") / 1000.0
    assert(math.abs(est - 1900.0) <= 100.0, s"p95 estimate drifted: $est")
    // pre-init path: exact small-n quantile (ceil-rank of the sorted 3)
    val b = fin("b")
    assert(b.getAs[Long]("n") == 3L)
    assert(b.getAs[Long]("est_milli") == 7000L)
    assert(b.getAs[Long]("v_min") == 3L && b.getAs[Long]("v_max") == 7L)
  }

  test("token-bucket gauge admits the burst, defers the flood, refills on event time") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    // burst 3, refill 1 token per event-time second
    val g = StreamingOps.tokenBucketGauge[Ev](s.toDS(), _.key,
      _.value.toLong, _.ts.getTime * 1000L, ratePerSec = 1L, burst = 3L)
    val q = g.toDF().writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("bucket_gauge").start()
    // five arrivals in the SAME second: 3 admitted (the burst), 2 deferred
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(sec: Int) = new Timestamp(base.getTime + sec * 1000L)
    s.addData((1 to 5).map(i => Ev(at(0), "flood", i.toDouble)): _*)
    // 10 seconds later: bucket refilled to the 3-token cap, 2 more admit
    s.addData(Ev(at(10), "flood", 6), Ev(at(10), "flood", 7))
    s.addData(Ev(at(0), "calm", 1), Ev(at(5), "calm", 2))
    q.processAllAvailable(); q.stop()
    val fin = spark.table("bucket_gauge").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_seen"),
        r.getAs[Long]("n_admitted"), r.getAs[Long]("n_deferred"),
        r.getAs[Long]("tokens_left")))
      .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
    val fl = fin("flood")
    assert((fl._2, fl._3, fl._4) == ((7L, 5L, 2L)),
      s"flood: $fl — burst of 3, then 2 deferred, then 2 refilled admits")
    assert(fl._5 == 1L, "10 s refill caps at burst 3, two spent -> 1 left")
    val cm = fin("calm")
    assert((cm._2, cm._3, cm._4) == ((2L, 2L, 0L)))
    fin.values.foreach { case (_, n, adm, defe, _) => assert(n == adm + defe) }
  }
}
