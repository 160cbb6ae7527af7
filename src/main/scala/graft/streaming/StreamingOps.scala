package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operator assemblies (SURVEY.md §2B B14): event-time windowed
  * aggregation, session windows, watermarked dedup, and custom state — the
  * Structured Streaming counterparts of the batch images q17/q18/q14.
  *
  * These compose on any streaming DataFrame with an event-time column;
  * state is bounded by the watermark in every case (tumbling/sliding
  * windows age out, session state closes `gap` after the last event,
  * dedup keys expire after `watermark`), which is what lets the operators
  * run indefinitely at scale.
  */
object StreamingOps {

  /** Tumbling event-time window counts/sums per key. */
  def tumblingAgg(df: DataFrame, tsCol: String, keyCol: String,
                  windowLen: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding event-time window counts per key. */
  def slidingAgg(df: DataFrame, tsCol: String, keyCol: String,
                 windowLen: String, slide: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Session windows closed by `gap` of event-time inactivity — the
    * streaming twin of the batch sessionization (q18). */
  def sessionAgg(df: DataFrame, tsCol: String, keyCol: String,
                 gap: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Streaming Count-Min heavy-hitter sketch: the incrementally-
    * maintained CMS matrix over a stream of terms — C12's streaming
    * twin. The cell derivation is [[graft.ops.Curation.cmsCells]], the
    * SAME definition the batch sketch (q54) uses, so on identical input
    * the streaming matrix is bit-identical to the batch matrix by
    * construction (spec-asserted). CMS updates are commutative counts,
    * so the operator is ORDER-INDEPENDENT — no watermark buffering is
    * needed for correctness (unlike the funnel leg), and the state is
    * the fixed CmsDepth×CmsWidth cell grid regardless of stream volume:
    * the textbook bounded-state sketch for unbounded streams. Run with
    * update/complete output mode. */
  def cmsMatrix(terms: DataFrame, termCol: String): DataFrame =
    graft.ops.Curation.cmsCells(terms, termCol)
      .groupBy("row", "ccol").agg(count(lit(1)).as("cnt"))

  /** Exactly-once-per-key passthrough within the watermark horizon —
    * the streaming image of the dedup survivor (A12/B10). */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, keys: Seq[String],
                           watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream inner join with a bounded time skew: each left event
    * matches right events for the same key within `[left.ts - skew,
    * left.ts + skew]`. The watermarks plus the time-range predicate are
    * what make this runnable forever: they bound how long each side's
    * rows wait in state for late matches, so the join state ages out
    * instead of growing with the stream (the unbounded-state trap of an
    * unconstrained stream-stream equi-join).
    *
    * Column contract: both inputs carry (`ts`, `keyCol`); the right side's
    * columns are prefixed `r_` in the output to avoid collisions. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, keyCol: String,
                       watermark: String, skew: String): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("r_key"), col("ts").as("r_ts"),
              col("value").as("r_value"))
    l.join(r,
      col(keyCol) === col("r_key") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $skew") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $skew"))
  }

  /** Stream-STATIC enrichment: the most common production streaming
    * shape — a high-volume event stream LEFT-joined against a bounded
    * dimension table. The static side is broadcast (no shuffle touches
    * the stream, no join state accumulates — unlike a stream-stream
    * join, nothing waits for late matches because the dim side is
    * complete by definition). LEFT join semantics are part of the
    * contract: an event whose key is missing from the dim must SURVIVE
    * with null enrichment (dropping it would silently filter the
    * stream on dim coverage). Snapshot semantics: a file-backed static
    * side is re-listed per micro-batch, an in-memory one is fixed for
    * the query's lifetime — either way there is no temporal alignment
    * between event time and dim version; a pipeline needing AS-OF
    * enrichment uses the q132 batch image or a stream-stream join.
    *
    * Column contract: dim carries `keyCol` plus enrichment columns,
    * prefixed `dim_` in the output to avoid collisions. */
  def streamStaticEnrich(stream: DataFrame, dim: DataFrame,
                         keyCol: String): DataFrame = {
    val d = dim.select(
      col(keyCol).as("_dk") +:
        dim.columns.filterNot(_ == keyCol).map(c => col(c).as(s"dim_$c")): _*)
    stream.join(broadcast(d), col(keyCol) === col("_dk"), "left").drop("_dk")
  }

  /** Custom keyed state: running event count per key via
    * mapGroupsWithState — the escape hatch the reference's per-partition
    * offset accounting would use if it weren't subsumed by checkpoints.
    *
    * State for a key is dropped after `idleTimeout` of processing-time
    * inactivity (the key's count restarts from 0 if it reappears), so
    * total state is bounded by the number of keys active within the
    * timeout horizon — without a timeout, per-key state would grow with
    * lifetime key cardinality, which is unbounded on a real stream.
    * Pass `idleTimeout = None` only for short-lived/bounded-key streams:
    * with NoTimeout the engine runs batches only when data arrives (a
    * processing-time timeout makes it re-trigger to evaluate expiries, so
    * production queries should pair it with a processing-time trigger
    * interval rather than the default run-as-fast-as-possible trigger). */
  case class KeyCount(key: String, n: Long)
  def runningCount[T](ds: Dataset[T], keyOf: T => String,
                      idleTimeout: Option[String] = Some("1 hour")): Dataset[KeyCount] = {
    import ds.sparkSession.implicits._
    val conf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    ds.groupByKey(keyOf)
      .mapGroupsWithState[Long, KeyCount](conf) {
        (key: String, values: Iterator[T], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            KeyCount(key, n)
          } else {
            val n = state.getOption.getOrElse(0L) + values.size
            state.update(n)
            idleTimeout.foreach(state.setTimeoutDuration)
            KeyCount(key, n)
          }
      }
  }

  /** Streaming MISRA–GRIES heavy-hitter summary — the bounded-state
    * frequent-items operator a feed monitor runs where an exact
    * groupBy's state would grow with item cardinality: per stratum, at
    * most k−1 counters. The classic guarantees hold per stratum and are
    * spec-asserted: any item with true frequency > N/k is PRESENT in
    * the summary, and every estimate undercounts its true frequency by
    * at most the decrement total (≤ N/k) — so `est` brackets truth as
    * est ≤ true ≤ est + decrements. Emission is one summary row per
    * stratum per micro-batch (Update mode); state is the counter map
    * alone, independent of stream length. The batch-side q309/q245
    * read WHICH terms are hot offline; this is the online image with
    * an explicit error budget.
    */
  case class HeavyHitters(stratum: String, n_processed: Long,
                          decrements: Long, items: Map[String, Long])
  case class MgState(n: Long, dec: Long, counters: Map[String, Long])
  def heavyHitters[T](ds: Dataset[T], stratumOf: T => String,
                      itemOf: T => String, k: Int): Dataset[HeavyHitters] = {
    import ds.sparkSession.implicits._
    require(k >= 2, "Misra-Gries needs k >= 2 (k-1 counters)")
    ds.groupByKey(stratumOf)
      .mapGroupsWithState[MgState, HeavyHitters](GroupStateTimeout.NoTimeout) {
        (stratum: String, values: Iterator[T], state: GroupState[MgState]) =>
          var st = state.getOption.getOrElse(MgState(0L, 0L, Map.empty))
          values.foreach { v =>
            val item = itemOf(v)
            val c = st.counters
            val next =
              if (c.contains(item)) c.updated(item, c(item) + 1)
              else if (c.size < k - 1) c.updated(item, 1L)
              else {
                st = st.copy(dec = st.dec + 1)
                c.map { case (i, n) => i -> (n - 1) }.filter(_._2 > 0)
              }
            st = st.copy(n = st.n + 1, counters = next)
          }
          state.update(st)
          HeavyHitters(stratum, st.n, st.dec, st.counters)
      }
  }

  /** Streaming ONLINE CUSUM drift alarm — the stateful-stream image of
    * the batch q364 detector (there the day grid is replayed offline;
    * here the page-style recursion S⁺ = max(0, S⁺ + (x − ref)),
    * S⁻ = max(0, S⁻ + (ref − x)) folds ONLINE, alarming and resetting
    * the tripped side when it exceeds `h` — the classic restart
    * convention, so repeated drift re-alarms instead of saturating).
    * Integer-exact: values, reference and threshold are all Long (the
    * repo-wide exactness rule extends to stream state).
    *
    * State per key is five Longs — constant, independent of stream
    * length (the q364 batch detector's whole day grid never lives in
    * memory here). Emission is one status row per key per micro-batch
    * (Update mode). Values fold in ARRIVAL order, within and across
    * micro-batches — the reference's Kafka-record model
    * (BigqueryStorageWriteSinkTask.java:98-116), where ordering
    * guarantees belong to the upstream log, not the operator. The fold
    * consumes the group iterator directly (no per-batch `toSeq`/sort),
    * so the working set is O(1) even when one hot key receives an
    * entire burst batch — the Page recursion only ever needs the
    * running (S⁺, S⁻) pair, never the batch. */
  case class CusumStatus(key: String, n: Long, s_pos: Long, s_neg: Long,
                         alarms_pos: Long, alarms_neg: Long)
  case class CusumState(n: Long, sPos: Long, sNeg: Long,
                        aPos: Long, aNeg: Long)
  def onlineCusum[T](ds: Dataset[T], keyOf: T => String,
                     valueOf: T => Long, ref: Long,
                     h: Long): Dataset[CusumStatus] = {
    import ds.sparkSession.implicits._
    require(h > 0, "CUSUM threshold must be positive")
    ds.groupByKey(keyOf)
      .mapGroupsWithState[CusumState, CusumStatus](GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[T], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L, 0L))
          values.foreach { v =>
            val x = valueOf(v)
            var sp = math.max(0L, st.sPos + (x - ref))
            var sn = math.max(0L, st.sNeg + (ref - x))
            var ap = st.aPos
            var an = st.aNeg
            if (sp > h) { ap += 1; sp = 0L }
            if (sn > h) { an += 1; sn = 0L }
            st = CusumState(st.n + 1, sp, sn, ap, an)
          }
          state.update(st)
          CusumStatus(key, st.n, st.sPos, st.sNeg, st.aPos, st.aNeg)
      }
  }

  /** Streaming LATE-DROP gauge — the live twin of the batch watermark
    * completeness curve (q460): per key, state is the event-time
    * high-water mark plus three counters; an arrival more than
    * `allowedLatenessUs` behind the mark is counted DROPPED (what a
    * watermark of that delay would discard), everything else admits
    * and can only advance the mark. Emits one gauge row per key per
    * micro-batch — the completeness dashboard a streaming SLA watches,
    * measured by the operator itself instead of inferred offline.
    * State is O(1) per key (one long + three counters); elements fold
    * in `seqOf` arrival order so replays are deterministic. */
  case class LateGauge(key: String, n_seen: Long, n_admitted: Long,
                       n_dropped: Long, hwm_us: Long)
  case class LateState(hwm: Long, seen: Long, admitted: Long, dropped: Long)
  def lateDropGauge[T](ds: Dataset[T], keyOf: T => String, seqOf: T => Long,
                       usOf: T => Long,
                       allowedLatenessUs: Long): Dataset[LateGauge] = {
    import ds.sparkSession.implicits._
    require(allowedLatenessUs >= 0, "allowed lateness must be non-negative")
    ds.groupByKey(keyOf)
      .mapGroupsWithState[LateState, LateGauge](GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[T], state: GroupState[LateState]) =>
          var st = state.getOption.getOrElse(
            LateState(Long.MinValue, 0L, 0L, 0L))
          values.toSeq.sortBy(seqOf).foreach { v =>
            val us = usOf(v)
            val late = st.hwm != Long.MinValue &&
              us < st.hwm - allowedLatenessUs
            st = LateState(math.max(st.hwm, us), st.seen + 1,
              st.admitted + (if (late) 0L else 1L),
              st.dropped + (if (late) 1L else 0L))
          }
          state.update(st)
          LateGauge(key, st.seen, st.admitted, st.dropped, st.hwm)
      }
  }

  /** Streaming TOKEN-BUCKET admission gauge — the live twin of the
    * batch peak-backlog model (q458): per key, a bucket of at most
    * `burst` tokens refills `ratePerSec` per elapsed EVENT-TIME second
    * and each arrival spends one token or is counted DEFERRED. The
    * gauge row per key per micro-batch is the admission-control
    * dashboard (admitted/deferred mass) that sizes a downstream
    * consumer's burst buffer. O(1) state per key; event-time refill
    * makes replays deterministic (no wall clock in the fold). */
  case class AdmissionGauge(key: String, n_seen: Long, n_admitted: Long,
                            n_deferred: Long, tokens_left: Long)
  case class BucketGaugeState(sec: Long, tokens: Long, seen: Long,
                              admitted: Long, deferred: Long)
  def tokenBucketGauge[T](ds: Dataset[T], keyOf: T => String,
                          seqOf: T => Long, usOf: T => Long,
                          ratePerSec: Long, burst: Long): Dataset[AdmissionGauge] = {
    import ds.sparkSession.implicits._
    require(ratePerSec >= 0 && burst >= 1, "need burst >= 1, rate >= 0")
    ds.groupByKey(keyOf)
      .mapGroupsWithState[BucketGaugeState, AdmissionGauge](
        GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[T],
         state: GroupState[BucketGaugeState]) =>
          var st = state.getOption.orNull
          values.toSeq.sortBy(seqOf).foreach { v =>
            val sec = usOf(v) / 1000000L
            st =
              if (st == null) BucketGaugeState(sec, burst, 0L, 0L, 0L)
              else if (sec > st.sec) BucketGaugeState(sec,
                math.min(burst, st.tokens + (sec - st.sec) * ratePerSec),
                st.seen, st.admitted, st.deferred)
              else st // same or older event-time second: no refill
            st =
              if (st.tokens >= 1)
                st.copy(tokens = st.tokens - 1, seen = st.seen + 1,
                  admitted = st.admitted + 1)
              else st.copy(seen = st.seen + 1, deferred = st.deferred + 1)
          }
          state.update(st)
          AdmissionGauge(key, st.seen, st.admitted, st.deferred, st.tokens)
      }
  }

  /** Streaming P² QUANTILE gauge (Jain & Chlamtac, CACM 1985) — the
    * classic O(1)-state online percentile estimator: five markers
    * (min, p/2, p, (1+p)/2, max) whose heights adjust by parabolic
    * (fallback linear) interpolation as observations stream in. The
    * state is FIVE numbers per key regardless of volume — the reason a
    * live p95-latency board can run forever where an exact quantile's
    * state grows with every distinct value (the q386 GK sketch audits
    * batch-side accuracy; this is the streaming deployment at even
    * smaller state). No oracle (estimator, not exact) — the spec
    * bounds its error against the exact quantile on a planted stream
    * and pins the exact-min/max invariants. Values fold in seq order
    * so replays are deterministic. */
  case class P2Gauge(key: String, n: Long, est_milli: Long,
                     v_min: Long, v_max: Long)
  case class P2State(n: Long, init: Seq[Double], q: Seq[Double],
                     pos: Seq[Double], dpos: Seq[Double])
  def p2QuantileGauge[T](ds: Dataset[T], keyOf: T => String,
                         seqOf: T => Long, valueOf: T => Long,
                         p: Double): Dataset[P2Gauge] = {
    import ds.sparkSession.implicits._
    require(p > 0 && p < 1, "quantile must be in (0, 1)")
    def step(st0: P2State, x: Double): P2State = {
      if (st0.n < 5) {
        val init = (st0.init :+ x).sorted
        if (st0.n == 4)
          P2State(5, Nil, init, Seq(1d, 2d, 3d, 4d, 5d),
            Seq(1d, 1 + 2 * p, 1 + 4 * p, 3 + 2 * p, 5d))
        else st0.copy(n = st0.n + 1, init = init)
      } else {
        var q = st0.q.toArray
        var n = st0.pos.toArray
        val np = st0.dpos.toArray
        // locate cell and clamp extremes
        val k =
          if (x < q(0)) { q(0) = x; 0 }
          else if (x >= q(4)) { q(4) = math.max(q(4), x); 3 }
          // getOrElse clamp: unreachable while marker heights stay
          // monotone (the parabolic-accept/linear-fallback invariant);
          // if a future edit ever broke monotonicity this degrades the
          // estimate to the nearest cell instead of killing the query
          else (0 to 3).find(i => q(i) <= x && x < q(i + 1))
            .getOrElse(if (x < q(2)) 0 else 3)
        (k + 1 to 4).foreach(i => n(i) += 1)
        val inc = Seq(0d, p / 2, p, (1 + p) / 2, 1d)
        (0 to 4).foreach(i => np(i) += inc(i))
        (1 to 3).foreach { i =>
          val d = np(i) - n(i)
          if ((d >= 1 && n(i + 1) - n(i) > 1) ||
              (d <= -1 && n(i - 1) - n(i) < -1)) {
            val s = math.signum(d)
            // parabolic (P²) candidate, linear fallback if non-monotone
            val qp = q(i) + s / (n(i + 1) - n(i - 1)) *
              ((n(i) - n(i - 1) + s) * (q(i + 1) - q(i)) /
                (n(i + 1) - n(i)) +
               (n(i + 1) - n(i) - s) * (q(i) - q(i - 1)) /
                (n(i) - n(i - 1)))
            q(i) =
              if (q(i - 1) < qp && qp < q(i + 1)) qp
              else q(i) + s * (q((i + s).toInt) - q(i)) /
                (n((i + s).toInt) - n(i))
            n(i) += s
          }
        }
        P2State(st0.n + 1, Nil, q.toSeq, n.toSeq, np.toSeq)
      }
    }
    ds.groupByKey(keyOf)
      .mapGroupsWithState[P2State, P2Gauge](GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[T], state: GroupState[P2State]) =>
          var st = state.getOption.getOrElse(
            P2State(0L, Nil, Nil, Nil, Nil))
          values.toSeq.sortBy(seqOf).foreach { v =>
            st = step(st, valueOf(v).toDouble)
          }
          state.update(st)
          val (est, mn, mx) =
            if (st.n == 0) (0d, 0d, 0d)
            else if (st.n < 5) {
              val srt = st.init
              val idx = math.min(srt.size - 1,
                math.max(0, math.ceil(p * srt.size).toInt - 1))
              (srt(idx), srt.head, srt.last)
            } else (st.q(2), st.q(0), st.q(4))
          P2Gauge(key, st.n, math.round(est * 1000), math.round(mn),
            math.round(mx))
      }
  }

  /** Streaming WINDOWED-DISTINCT gauge — distinct keys per tumbling
    * event-time window via the HLL++ sketch (approx_count_distinct):
    * the sketch IS the state, so per-window memory is a fixed few KB
    * regardless of key cardinality — the reason a live "unique users
    * per 10 minutes" board can run forever where an exact
    * countDistinct's state grows with every new key. Watermarked, so
    * closed windows emit finals and drop state (Append mode). The
    * batch q36 audits HLL's error offline; this is its streaming
    * deployment with the n_distinct ≤ n_events law carried alongside.
    */
  def windowedDistinct(df: DataFrame, tsCol: String, keyCol: String,
                       win: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), win))
      .agg(approx_count_distinct(col(keyCol)).as("n_distinct"),
        count(lit(1)).as("n_events"))

  /** Streaming near-dup candidate detection — the B11 MinHash/LSH scale
    * path running INSIDE a stream with bounded state: each document's
    * band buckets are computed per row ([[graft.ops.Dedup
    * .bandBucketsPerRow]] — no aggregation, so the plan stays legal
    * ahead of the stateful operator), the stream is keyed by
    * (band, bucket), and per-bucket state holds the last `maxPerBucket`
    * member doc ids. A new arrival emits one candidate pair per current
    * member of its bucket — the streaming image of the batch band join
    * (q26), with the same signature math, so candidates can be verified
    * against a batch index.
    *
    * State bounds, in order: the bucket membership list is FIFO-capped
    * at `maxPerBucket` (a viral template flooding one bucket evicts
    * oldest members instead of growing state — the streaming twin of
    * capDocFrequency); a bucket idle past `horizonMillis` of event time
    * is dropped via the event-time timeout (dedup-within-horizon
    * semantics, like dropDuplicatesWithinWatermark); rows at/behind the
    * watermark are dropped for determinism under replay. Requires
    * `.withWatermark` on `ts` upstream and OutputMode.Append.
    *
    * Emission is AT-LEAST-ONCE per (band, bucket, pair): a doc evicted
    * by the FIFO cap (or re-delivered by an at-least-once source after
    * eviction) re-pairs with current members on re-arrival — the price
    * of bounded membership state. Candidates are by contract a superset
    * that downstream exact verification (jaccardOfPairs) dedups anyway,
    * same as the multi-band batch join emitting one candidate per
    * colliding band before its `distinct`. */
  case class DupCandidate(band: Int, bucket: Long, doc_a: Long, doc_b: Long)
  case class BucketState(docs: Seq[Long], lastTs: Long)
  def streamingNearDupCandidates(docs: DataFrame, horizonMillis: Long,
                                 numHashes: Int = 16, bandSize: Int = 4,
                                 maxPerBucket: Int = 32): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    val banded = graft.ops.Dedup.bandBucketsPerRow(
        docs.withColumn("_t", graft.ops.TextAnalysis.tokens(col("text")))
          .filter(size(col("_t")) >= 3),
        "_t", numHashes, bandSize, carry = Seq("ts", "doc_id"))
      .select(col("ts"), col("doc_id"), col("band"), col("bucket"))
      .as[(Timestamp, Long, Int, Long)]
    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[BucketState, DupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, bucket), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs
            val fresh = rows.toSeq.filter(_._1.getTime > wm)
              .sortBy(r => (r._1.getTime, r._2))
            val out = scala.collection.mutable.ArrayBuffer.empty[DupCandidate]
            var st = state.getOption.getOrElse(BucketState(Seq.empty, 0L))
            fresh.foreach { case (ts, d, _, _) =>
              if (!st.docs.contains(d)) {
                st.docs.foreach { a =>
                  out += DupCandidate(band, bucket, math.min(a, d), math.max(a, d))
                }
                st = BucketState((st.docs :+ d).takeRight(maxPerBucket),
                                 math.max(st.lastTs, ts.getTime))
              } else st = st.copy(lastTs = math.max(st.lastTs, ts.getTime))
            }
            if (st.docs.nonEmpty) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(st.lastTs + horizonMillis, wm + 1))
            }
            out.iterator
          }
      }
  }

  /** Closed-session emission via flatMapGroupsWithState — the 0-or-many
    * output shape mapGroupsWithState can't express: a key emits NOTHING
    * while its sessions accumulate and exactly one summary row per session
    * once the event-time watermark passes the session's end (+gap).
    *
    * A session is emitted ONLY when `watermark >= end + gap` — the one
    * condition that PROVES it closed: until then the watermark contract
    * still admits a non-late event in (watermark, end+gap] that extends
    * or bridges it. Seeing a newer event beyond end+gap proves nothing
    * (event time is allowed to arrive out of order up to the watermark
    * delay), so state holds a LIST of disjoint sessions per key:
    * closed-but-unconfirmed sessions wait for the watermark while newer
    * sessions accumulate. An event merges into every session within
    * `gap` on EITHER side (bridging two sessions collapses them); an
    * event more than `gap` below a session's start opens a separate
    * session rather than silently widening the old one downward.
    *
    * State per key is bounded by the number of sessions inside one
    * watermark horizon (~delay/gap + 1), dropped on emission — the same
    * invariant the built-in session_window operator maintains
    * ([[sessionAgg]] is the declarative twin; this is the custom-state
    * escape hatch for session logic session_window can't express, e.g.
    * value-dependent gaps).
    *
    * Requires `.withWatermark` on `tsOf`'s column upstream and
    * OutputMode.Append downstream; the event-time timeout fires when the
    * watermark crosses the registered deadline, so emission is driven by
    * data progress, not wall clock — deterministic under replay. */
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionListState(sessions: Seq[SessionState])
  case class ClosedSession(key: String, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)
  def closedSessions[T](ds: Dataset[T], keyOf: T => String, tsOf: T => Timestamp,
                        gapMillis: Long): Dataset[ClosedSession] = {
    import ds.sparkSession.implicits._
    // merge one event into the disjoint session list: absorb every
    // session within gap of t (0, 1, or 2 of them — 2 = bridge)
    def absorb(sessions: Seq[SessionState], t: Long): Seq[SessionState] = {
      val (near, far) = sessions.partition(s =>
        t >= s.start - gapMillis && t <= s.end + gapMillis)
      val merged = near.foldLeft(SessionState(t, t, 1L)) { (a, s) =>
        SessionState(math.min(a.start, s.start), math.max(a.end, s.end), a.n + s.n)
      }
      (far :+ merged).sortBy(_.start)
    }
    def flush(key: String, sessions: Seq[SessionState],
              state: GroupState[SessionListState], wm: Long): Iterator[ClosedSession] = {
      val (closed, open) = sessions.partition(_.end + gapMillis <= wm)
      if (open.nonEmpty) {
        state.update(SessionListState(open))
        // earliest still-open deadline; must sit above the watermark
        state.setTimeoutTimestamp(
          math.max(open.map(_.end + gapMillis).min, wm + 1))
      } else state.remove()
      closed.sortBy(_.start).iterator.map(s =>
        ClosedSession(key, new Timestamp(s.start), new Timestamp(s.end), s.n))
    }
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[SessionListState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, values: Iterator[T], state: GroupState[SessionListState]) =>
          val wm = state.getCurrentWatermarkMs
          if (state.hasTimedOut) {
            flush(key, state.get.sessions, state, wm)
          } else {
            // flatMapGroupsWithState does NOT drop late input (unlike the
            // built-in session_window), so drop rows at/behind the
            // watermark ourselves before merging
            val ts = values.map(tsOf(_).getTime).filter(_ > wm).toSeq.sorted
            val sessions = ts.foldLeft(
              state.getOption.map(_.sessions).getOrElse(Seq.empty))(absorb)
            flush(key, sessions, state, wm)
          }
      }
  }

  /** Watermark-correct ORDERED-FUNNEL stage emission — the streaming leg
    * of the batch q71 funnel: per key, emit one row the moment each
    * funnel stage is PROVABLY reached (first view; first click at/after
    * that view; first purchase at/after that click), folding events in
    * EVENT-TIME order even when they arrive out of order.
    *
    * Why buffering is required: the stage chain is order-dependent — a
    * late-arriving earlier view can qualify a click that previously
    * didn't count, so folding in arrival order would emit wrong stages.
    * Events are therefore buffered while `ts > watermark` (the horizon
    * in which an even-earlier event may still legally arrive) and folded
    * into the running (view, click, purchase) triple only once the
    * watermark passes them — at which point the event-time prefix is
    * complete and each fold decision is final. Input at/behind the
    * watermark is dropped (flatMapGroupsWithState does not drop late
    * rows itself; matching the built-in operators).
    *
    * State bound: the buffer is watermark-horizon-bounded like
    * [[closedSessions]], and the folded triple is retained only until
    * `expireAfterMillis` of EVENT time passes the key's last event, then
    * dropped via the event-time timeout — so total state is bounded by
    * the keys active within one expiry horizon, not lifetime key
    * cardinality. Within the horizon every stage row is emitted at most
    * once (Append-mode safe); a key reappearing AFTER expiry starts a
    * fresh funnel journey and emits fresh stage rows — the documented
    * restart semantics (the same per-journey reading product funnels
    * use), not a duplicate of the old journey.
    *
    * Tie note: events at one timestamp fold views before clicks before
    * purchases (a click may count its same-instant view). Batch q71
    * breaks same-`us` ties by ingestion offset instead — the two legs
    * agree whenever a key's stage-relevant events have distinct
    * timestamps. */
  case class FunnelState(buffer: Seq[(Long, Int)], view: Option[Long],
                         click: Option[Long], purchase: Option[Long],
                         lastSeen: Long)
  case class FunnelStage(key: String, stage: String, ts: Timestamp)
  def funnelStages[T](ds: Dataset[T], keyOf: T => String, tsOf: T => Timestamp,
                      typeOf: T => String,
                      expireAfterMillis: Long = 24L * 3600 * 1000): Dataset[FunnelStage] = {
    import ds.sparkSession.implicits._
    val stageOrd = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    def foldRipe(key: String, st0: FunnelState, wm: Long,
                 state: GroupState[FunnelState]): Iterator[FunnelStage] = {
      val (ripe, pending) = st0.buffer.partition(_._1 <= wm)
      var (v, c, p) = (st0.view, st0.click, st0.purchase)
      val out = Seq.newBuilder[FunnelStage]
      ripe.sorted.foreach { case (t, typ) =>
        if (typ == 0 && v.isEmpty) { v = Some(t); out += FunnelStage(key, "view", new Timestamp(t)) }
        else if (typ == 1 && c.isEmpty && v.exists(_ <= t)) { c = Some(t); out += FunnelStage(key, "click", new Timestamp(t)) }
        else if (typ == 2 && p.isEmpty && c.exists(_ <= t)) { p = Some(t); out += FunnelStage(key, "purchase", new Timestamp(t)) }
      }
      state.update(FunnelState(pending, v, c, p, st0.lastSeen))
      // pending events drive the next fold; a drained key waits out the
      // expiry horizon (suppressing duplicate stages) and is then dropped
      val deadline =
        if (pending.nonEmpty) pending.map(_._1).min
        else st0.lastSeen + expireAfterMillis
      state.setTimeoutTimestamp(math.max(deadline, wm + 1))
      out.result().iterator
    }
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[FunnelState, FunnelStage](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, values: Iterator[T], state: GroupState[FunnelState]) =>
          val wm = state.getCurrentWatermarkMs
          val st0 = state.getOption.getOrElse(FunnelState(Nil, None, None, None, Long.MinValue))
          if (state.hasTimedOut) {
            if (st0.buffer.isEmpty && st0.lastSeen + expireAfterMillis <= wm) {
              state.remove(); Iterator.empty // horizon passed: journey over
            } else foldRipe(key, st0, wm, state)
          } else {
            val fresh = values
              .flatMap(t => stageOrd.get(typeOf(t)).map(o => (tsOf(t).getTime, o)))
              .filter(_._1 > wm).toSeq
            val lastSeen = (st0.lastSeen +: fresh.map(_._1)).max
            foldRipe(key, st0.copy(buffer = st0.buffer ++ fresh,
              lastSeen = lastSeen), wm, state)
          }
      }
  }
}
