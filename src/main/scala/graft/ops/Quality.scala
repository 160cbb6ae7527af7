package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.TextAnalysis.tokens

/** Round-6 corpus-quality / statistics operators (SURVEY.md §2F,
  * F34–F44): the audits a training-data pipeline runs on corpus SHAPE
  * rather than individual documents — vocabulary growth (Heaps-law
  * screen), count-min-sketch heavy hitters, event-type Markov
  * transitions, source-mass concentration (Lorenz/Gini), daily
  * burstiness (Fano factor) and MAD robust outliers, language Simpson
  * diversity, importance-weight effective sample size, context-window
  * truncation loss, phrase-index posting histograms, and per-language
  * OOV rates.
  *
  * Same contract as every ops module: each query paired with a DuckDB
  * oracle over the same parquet, engine-neutral md5-derived hashing
  * (never rand(), never Spark-internal Murmur3), floor-ppm integer
  * arithmetic with DECIMAL(38,0)/HUGEINT widening where the sf1+ bound
  * fails, map-combinable aggregations, windows only over value-bounded
  * grids (per-user event windows and per-lang vocab windows only).
  */
object Quality {

  /** q214's count-min sketch geometry — depth (independent hash rows)
    * × width (buckets per row). Width 16 is deliberately SMALLER than
    * the corpus vocabulary so collisions are guaranteed and the
    * overestimate behavior of the sketch is hash-observable; a
    * deployment sizes width ≈ e/ε. ONE definition read by the query,
    * interpolated into the oracle, and replayed by QualitySpec. */
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 16

  /** q218's robust-outlier multiplier: a day is flagged when its
    * absolute deviation from the per-type median exceeds 3× the median
    * absolute deviation (with mad = 0, any nonzero deviation flags). */
  private[graft] val MadK = 3

  /** q221's context-window lengths (chars — the sf-scale stand-in for
    * a tokenizer's context budget; n_chars spans 48–553 in this corpus
    * so both thresholds bite). */
  private[graft] val TruncWindows = Seq(128L, 384L)

  /** q223's per-language vocabulary budget: tokens outside the lang's
    * top-8 types count as OOV. 8 < |vocab| = 31 here, so the OOV mass
    * is nonzero by construction; a deployment uses the tokenizer's
    * actual vocab. */
  private[graft] val OovTopK = 8

  /** Distinct adjacent-token bigrams per document, as `(doc_id, bg)`
    * with repetition (one row per OCCURRENCE — q213/q222 dedup where
    * their semantics need distinct). */
  private def bigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bg"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Heaps-law vocabulary-growth audit over the BIGRAM vocabulary
    // (the unigram vocab saturates in pages; bigram types keep growing
    // corpus-long — the signal a tokenizer/dedup planner sizes by).
    // Log-free screen (the q201 Zipf convention): V(N) ≈ K·N^β means
    // the V ratio between nested prefixes of doubling span is roughly
    // constant — emitted as vocab_growth_ppm next to mass_growth_ppm,
    // no ln() in either engine. Prefixes are doc_id-VALUE prefixes
    // cut at mn + (mx−mn)·k/8, k ∈ {1,2,4,8} (nested, spans doubling);
    // "type is in prefix k" = first_doc ≤ cut, so the whole audit is
    // one min-aggregate onto the bigram-vocab grid (map-combined)
    // plus per-doc mass sums — the corpus is scanned twice, joined
    // never. Scale: the k-grid is 4 rows broadcast; the vocab grid is
    // vocabulary-bounded.
    "q213_heaps_bigrams" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val fd = bigrams(s, d).groupBy("bg").agg(min(col("doc_id")).as("fd"))
      val bounds = docs.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      val kgrid = s.range(0, 4)
        .select(expr("shiftleft(1L, CAST(id AS INT))").as("k"))
        .crossJoin(broadcast(bounds))
        .select(col("k"), expr("mn + (mx - mn) * k DIV 8").as("cut"))
      val v = fd.join(broadcast(kgrid), col("fd") <= col("cut"))
        .groupBy("k", "cut").agg(count(lit(1)).as("v_types"))
      val dmass = docs.select(col("doc_id"),
        greatest(lit(0L), (size(tokens(col("text"))) - 1).cast("long")).as("nb"))
      val n = dmass.join(broadcast(kgrid), col("doc_id") <= col("cut"))
        .groupBy("k", "cut")
        .agg(count(lit(1)).as("n_docs"), sum(col("nb")).cast("long").as("n_bigrams"))
      val j = n.join(v, Seq("k", "cut"))
      val p = j.select(col("k").as("pk"),
        col("n_bigrams").as("p_nb"), col("v_types").as("p_v"))
      j.join(p, col("pk") === expr("k DIV 2"), "left")
        .select(col("k"), col("cut").as("cut_id"), col("n_docs"),
          col("n_bigrams"), col("v_types"),
          coalesce(expr("CAST(n_bigrams * 1000000 DIV p_nb AS BIGINT)"), lit(0L))
            .as("mass_growth_ppm"),
          coalesce(expr("CAST(v_types * 1000000 DIV p_v AS BIGINT)"), lit(0L))
            .as("vocab_growth_ppm"))
        .orderBy("k")
    },

    // Count-min-sketch HEAVY HITTERS with the exact audit leg: the
    // mergeable frequency sketch (cellwise-SUM merge across
    // shards/days — QualitySpec proves the merge law) estimated
    // against exact counts for the top-20 tokens, overestimate and
    // err_ppm exposed. est ≥ exact ALWAYS (min of upper bounds —
    // spec-asserted); width 16 < |vocab| forces collisions so the
    // bound is strict somewhere. Scale shape: token counts collapse
    // onto the vocab grid FIRST (map-combined), the sketch is
    // depth×width = 64 cells built from that grid — the corpus-sized
    // stream never touches the hash fan-out; the exact top-20 is a
    // TakeOrdered over the vocab grid, never a global sort.
    "q214_cms_heavy_hitters" -> { (s, d) =>
      val tokcnt = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val rg = s.range(0, CmsDepth).select(col("id").as("r"))
      def bucket(tok: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
        Dedup.neutralHash32(concat(lit("cms"), r.cast("string"), lit(":"), tok)) % CmsWidth
      val cells = tokcnt.crossJoin(broadcast(rg))
        .select(col("r"), bucket(col("tok"), col("r")).as("b"), col("cnt"))
        .groupBy("r", "b").agg(sum(col("cnt")).as("cell"))
      val top = tokcnt.orderBy(col("cnt").desc, col("tok")).limit(20)
      top.crossJoin(broadcast(rg))
        .select(col("tok"), col("cnt"), col("r"), bucket(col("tok"), col("r")).as("b"))
        .join(broadcast(cells), Seq("r", "b"))
        .groupBy("tok", "cnt").agg(min(col("cell")).as("est"))
        .select(col("tok"), col("cnt").cast("long").as("exact"),
          col("est").cast("long").as("est"),
          (col("est") - col("cnt")).cast("long").as("overest"),
          expr("CAST((est - cnt) * 1000000 DIV cnt AS BIGINT)").as("err_ppm"))
        .orderBy(col("exact").desc, col("tok"))
    },

    // Event-type MARKOV transition matrix: P(next type | type) from
    // per-user event sequences — the behavioral fingerprint a bot /
    // replay detector compares sessions against, and the q71 funnel's
    // order-free generalization. The lead() window is per-USER (the
    // funnel convention — state bounded by one user's history, never
    // global); the |types|² grid carries explicit zeros (q158 rule:
    // "transition never happens" is a checked fact) and row_ppm is
    // row-stochastic floor-ppm. A type that never has a successor
    // (only ever last in its users' streams) keeps row_ppm = 0 via the
    // mirrored CASE — floor-DIV by zero diverges across engines.
    "q215_event_markov" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = ev.withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
        .agg(count(lit(1)).as("n0"))
      val types = ev.select("event_type").distinct()
      val grid = types.select(col("event_type").as("from_type"))
        .crossJoin(broadcast(types.select(col("event_type").as("to_type"))))
      val full = grid.join(pairs, Seq("from_type", "to_type"), "left")
        .withColumn("n", coalesce(col("n0"), lit(0L)))
      val tots = full.groupBy("from_type").agg(sum(col("n")).as("tot"))
      full.join(broadcast(tots), "from_type")
        .select(col("from_type"), col("to_type"), col("n").cast("long").as("n"),
          expr("CASE WHEN tot > 0 THEN CAST(n * 1000000 DIV tot AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("row_ppm"))
        .orderBy("from_type", "to_type")
    },

    // Source-mass CONCENTRATION: the Lorenz curve + Gini coefficient
    // of char mass across sources — "is 80% of the corpus three
    // domains?" is the first mix question, and Gini is its one-number
    // answer (0 = uniform). Rank and cumulative are predecessor-count
    // joins on the broadcast |sources| grid (the q201 rank rule — no
    // global window); Gini via the rank identity G = Σ(2i−n−1)mᵢ /
    // (n·Σm), exact-integer, widened DECIMAL(38,0)/HUGEINT because
    // cum·10⁶ overflows int64 once Σm passes ~10¹³ chars (10 TB).
    "q216_source_lorenz" -> { (s, d) =>
      val m = Tables.documents(s, d).groupBy("source")
        .agg(sum(col("n_chars")).cast("long").as("mass"))
      val b = m.select(col("source").as("s2"), col("mass").as("m2"))
      val ranked = m.join(broadcast(b),
          (col("m2") < col("mass")) ||
            (col("m2") === col("mass") && col("s2") < col("source")), "left")
        .groupBy("source", "mass")
        .agg((count(col("s2")) + 1).cast("long").as("rk"),
          coalesce(sum(col("m2")), lit(0L)).as("below"))
        .withColumn("cum", (col("below") + col("mass")).cast("long"))
      val tot = m.agg(sum(col("mass")).as("tot"), count(lit(1)).as("nsrc"))
      val g = ranked.crossJoin(broadcast(tot))
      val gnum = g.agg(sum((lit(2) * col("rk") - col("nsrc") - 1) * col("mass"))
        .as("gnum"))
      g.crossJoin(broadcast(gnum))
        .select(col("source"), col("mass"), col("rk"),
          expr("CAST(CAST(cum AS DECIMAL(38,0)) * 1000000 DIV tot AS BIGINT)")
            .as("cum_ppm"),
          expr("CAST(CAST(gnum AS DECIMAL(38,0)) * 1000000" +
            " DIV (CAST(nsrc AS DECIMAL(38,0)) * tot) AS BIGINT)").as("gini_ppm"))
        .orderBy("rk")
    },

    // Daily BURSTINESS per event type — the Fano factor F = Var/Mean
    // of the per-day event count (1 = Poisson, ≫1 = bursty: flash
    // crowds, incident retries, scraper storms). The day×type grid
    // carries explicit ZEROS (a silent day is variance, not a missing
    // row — the q158 rule), built from one sequence() over the global
    // [min, max] day span. Variance in the overflow-free integer form
    // n·Σc²−(Σc)² with Σc² widened DECIMAL(38,0)/HUGEINT (c² passes
    // int64 once a type logs ~3·10⁹ events/day); everything
    // map-combines onto the (day, type) grid first.
    "q217_type_fano" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val daily = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c0"))
      val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val days = bounds.select(explode(expr("sequence(mn, mx)")).as("day"))
      val types = ev.select("event_type").distinct()
      val cells = days.crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .withColumn("c", coalesce(col("c0"), lit(0L)))
      cells.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum(col("c")).cast("long").as("s1"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
        .select(col("event_type"), col("n_days"), col("s1").as("n_events"),
          expr("CAST(s1 * 1000000 DIV n_days AS BIGINT)").as("mean_ppm"),
          expr("CASE WHEN s1 > 0 THEN CAST((n_days * s2 -" +
            " CAST(s1 AS DECIMAL(38,0)) * s1) * 1000000" +
            " DIV (n_days * CAST(s1 AS DECIMAL(38,0))) AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("fano_ppm"))
        .orderBy("event_type")
    },

    // MAD robust daily-outlier flags per event type — the
    // median-absolute-deviation screen next to E42/q143's EWMA (mean
    // charts move WITH the anomaly; the median does not, so MAD
    // catches level shifts EWMA absorbs). Lower median (position
    // ⌈n/2⌉) computed by predecessor-count on the (type, count)
    // VALUE grid — counts collapse to distinct values with
    // frequencies first, so no sort ever sees a corpus-sized input;
    // the deviation median repeats the trick on the |c−med| grid. A
    // day is flagged when |c−med| > 3·mad (mad = 0 ⟹ any nonzero
    // deviation flags — the mirrored strict inequality).
    "q218_daily_mad_outliers" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val days = bounds.select(explode(expr("sequence(mn, mx)")).as("day"))
      val types = ev.select("event_type").distinct()
      val cells = days.crossJoin(broadcast(types))
        .join(ev.groupBy("event_type", "day").agg(count(lit(1)).as("c0")),
          Seq("event_type", "day"), "left")
        .withColumn("c", coalesce(col("c0"), lit(0L)))
        .select("event_type", "day", "c")
      // lower median of grid values via predecessor-count: the value v
      // with below < ⌈n/2⌉ ≤ below + freq
      def lowerMedian(vals: DataFrame, valCol: String, outCol: String): DataFrame = {
        val g = vals.groupBy(col("event_type"), col(valCol).as("v"))
          .agg(count(lit(1)).as("f"))
        val tot = g.groupBy("event_type").agg(sum(col("f")).as("n"))
        g.join(broadcast(g.select(col("event_type").as("et2"),
            col("v").as("v2"), col("f").as("f2"))),
            col("et2") === col("event_type") && col("v2") < col("v"), "left")
          .groupBy("event_type", "v", "f")
          .agg(coalesce(sum(col("f2")), lit(0L)).as("below"))
          .join(broadcast(tot), "event_type")
          .filter(col("below") < expr("(n + 1) DIV 2") &&
            expr("(n + 1) DIV 2") <= col("below") + col("f"))
          .select(col("event_type"), col("v").as(outCol))
      }
      val med = lowerMedian(cells, "c", "med")
      val dev = cells.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("c") - col("med")))
      val mad = lowerMedian(dev.select(col("event_type"), col("ad")), "ad", "mad")
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med"), col("mad"))
        .agg(count(when(col("ad") > lit(MadK) * col("mad"), 1)).as("n_flagged"),
          max(col("ad")).cast("long").as("max_dev"),
          count(lit(1)).cast("long").as("n_days"))
        .orderBy("event_type")
    },

    // Language SIMPSON diversity per source — the log-free diversity
    // index (Shannon entropy needs ln(); Simpson's Σn(n−1)/(N(N−1))
    // is exact integer): 0 = every doc a different lang, 1e6 = one
    // lang. dominant_ppm (largest single-lang share) rides along as
    // the actionable number. The work collapses onto the
    // |sources|×|langs| grid map-side; products widened
    // DECIMAL(38,0)/HUGEINT because N² passes int64 at ~3·10⁹
    // docs/source.
    "q219_simpson_diversity" -> { (s, d) =>
      Tables.documents(s, d).groupBy("source", "lang")
        .agg(count(lit(1)).as("nl"))
        .groupBy("source")
        .agg(sum(col("nl")).cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_langs"),
          sum(expr("CAST(nl AS DECIMAL(38,0)) * (nl - 1)")).as("num"),
          max(col("nl")).cast("long").as("mx"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          expr("CASE WHEN n_docs > 1 THEN CAST(num * 1000000" +
            " DIV (CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1)) AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("simpson_ppm"),
          expr("CAST(mx * 1000000 DIV n_docs AS BIGINT)").as("dominant_ppm"))
        .orderBy("source")
    },

    // EFFECTIVE SAMPLE SIZE of the q84 importance weights — the
    // one-number audit of a weighted mix: ESS = (Σw)²/Σw² in
    // count-equivalents, ess_ppm = ESS/n (1e6 = uniform weights, small
    // = a few heavy docs dominate the gradient). Shares q84's exact
    // weight rule (w = min(1e6, tokens·1e6 DIV 60)) so the two
    // queries audit the same sample; per-source rows plus the
    // '__all__' rollup row (the q184 convention). (Σw)² reaches 10¹⁹
    // at 5·10³ docs already — both sums accumulate DECIMAL(38,0)/
    // HUGEINT from the start, not just the final product.
    "q220_importance_ess" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
        .withColumn("w",
          least(lit(1000000L), expr("n_tokens * 1000000 DIV 60")))
        .rollup("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(expr("CAST(w AS DECIMAL(38,0))")).as("sw"),
          sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("sw2"))
        .select(coalesce(col("source"), lit("__all__")).as("source"),
          col("n_docs"),
          expr("CAST(sw DIV n_docs AS BIGINT)").as("wmean_ppm"),
          expr("CASE WHEN sw2 > 0 THEN CAST(sw * sw * 1000000" +
            " DIV (sw2 * n_docs) AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("ess_ppm"))
        .orderBy("source")
    },

    // Context-window TRUNCATION/PADDING loss audit: for each window
    // length L, the char mass lost to truncation (docs longer than L)
    // and the padding waste of one-doc-per-window batching (docs
    // shorter than L) — the numbers that decide between packing
    // (q61/q212) and padding, per source. Per-doc terms are pure map
    // arithmetic fanned out over the broadcast 2-row L grid, then
    // map-combined onto the |sources|×|L| grid; the lost-mass product
    // is widened DECIMAL(38,0)/HUGEINT (mass·10⁶ passes int64 at
    // ~10¹³ chars).
    "q221_truncation_loss" -> { (s, d) =>
      val lg = s.range(0, TruncWindows.size)
        .select(expr(s"element_at(array(${TruncWindows.mkString("L,")}L)," +
          " CAST(id + 1 AS INT))").as("l"))
      Tables.documents(s, d).select(col("source"), col("n_chars"))
        .crossJoin(broadcast(lg))
        .groupBy("source", "l")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(greatest(col("n_chars") - col("l"), lit(0L))).cast("long").as("lost"),
          count(when(col("n_chars") > col("l"), 1)).cast("long").as("n_trunc"),
          sum(when(col("n_chars") < col("l"), col("l") - col("n_chars"))
            .otherwise(lit(0L))).cast("long").as("pad"))
        .select(col("source"), col("l"), col("n_docs"), col("n_trunc"),
          expr("CAST(CAST(lost AS DECIMAL(38,0)) * 1000000" +
            " DIV total_chars AS BIGINT)").as("trunc_ppm"),
          expr("CAST(CAST(pad AS DECIMAL(38,0)) * 1000000" +
            " DIV (n_docs * l) AS BIGINT)").as("pad_ppm"))
        .orderBy("source", "l")
    },

    // PAD-TO-MULTIPLE waste sweep — the tensor-alignment knob q221
    // does NOT measure: q221 pads/truncates to a FIXED context window;
    // production batching instead pads each sequence up to the next
    // multiple of m (8/64/512 — tensor-core alignment, KV-cache page,
    // bucket granularity) and never truncates. Per (source, m): doc
    // mass, payload units, padded units Σ ceil(len/m)·m, and the waste
    // in floor-ppm of the padded mass — the fraction of accelerator
    // FLOPs burned on padding at that alignment. The m-ladder is the
    // decision table: waste grows with m while kernel efficiency grows
    // with m; this emits the data side of that tradeoff. Scale: one
    // map-side-combined (source × 3)-cell aggregation; the sweep is a
    // 3-row broadcast, nothing row-wise survives the groupBy.
    "q482_pad_multiple_sweep" -> { (s, d) =>
      val ms = s.range(0, 3).select(
        expr("element_at(array(8L, 64L, 512L), CAST(id + 1 AS INT))")
          .as("m"))
      Tables.documents(s, d).select(col("source"), col("n_chars"))
        .crossJoin(broadcast(ms))
        .groupBy("source", "m")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("payload"),
          sum(expr("((n_chars + m - 1) DIV m) * m")).cast("long")
            .as("padded"))
        .select(col("source"), col("m"), col("n_docs"), col("payload"),
          col("padded"),
          expr("CAST(CAST(padded - payload AS DECIMAL(38,0)) * 1000000" +
            " DIV padded AS BIGINT)").as("waste_ppm"))
        .orderBy("source", "m")
    },

    // Phrase-index POSTING-LIST histogram: document frequency of each
    // distinct bigram bucketed into powers of two — the sizing audit
    // for the q176 phrase-search index (how many singleton postings
    // vs how many stop-bigram monsters decides compression strategy
    // and the df-cap). All 32 power buckets are emitted with explicit
    // zeros (q158 rule). df collapses onto the bigram-vocab grid
    // first; the bucket assignment is a 32-row broadcast range join.
    "q222_posting_buckets" -> { (s, d) =>
      val df_ = bigrams(s, d).distinct()
        .groupBy("bg").agg(count(lit(1)).as("df"))
      val pw = s.range(0, 32).select(expr("shiftleft(1L, CAST(id AS INT))").as("lo"))
      val bucketed = df_.join(broadcast(pw),
          col("df") >= col("lo") && col("df") < col("lo") * 2)
        .groupBy("lo").agg(count(lit(1)).as("nt"), sum(col("df")).as("po"))
      val tot = df_.agg(count(lit(1)).as("t_types"), sum(col("df")).as("t_post"))
      pw.join(bucketed, Seq("lo"), "left")
        .crossJoin(broadcast(tot))
        .select(col("lo").as("bucket_lo"),
          coalesce(col("nt"), lit(0L)).cast("long").as("n_types"),
          coalesce(col("po"), lit(0L)).cast("long").as("postings"),
          expr("CAST(coalesce(nt, 0) * 1000000 DIV t_types AS BIGINT)")
            .as("types_share_ppm"),
          expr("CAST(coalesce(po, 0) * 1000000 DIV t_post AS BIGINT)")
            .as("post_share_ppm"))
        .orderBy("bucket_lo")
    },

    // Per-language OOV rate vs a top-K vocabulary — the tokenizer-
    // budget audit at the (source, lang) grain: token mass outside the
    // language's top-8 types (K = 8 < |vocab| so the OOV mass is real
    // at this SF; a deployment plugs in its tokenizer vocab). The
    // per-lang top-K is a row_number window over the |langs|×|vocab|
    // grid (value-bounded — the permitted window class), broadcast
    // back against the token stream; per-(source, lang) shares are one
    // map-combined agg.
    "q223_oov_rate" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("source"), col("lang"), explode(tokens(col("text"))).as("tok"))
      val vocab = toks.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      val wv = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
      val topk = vocab.withColumn("rn", row_number().over(wv))
        .filter(col("rn") <= OovTopK).select(col("lang"), col("tok"), lit(1).as("iv"))
      toks.join(broadcast(topk), Seq("lang", "tok"), "left")
        .groupBy("source", "lang")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          count(when(col("iv").isNull, 1)).cast("long").as("n_oov"))
        .withColumn("oov_ppm",
          expr("CAST(n_oov * 1000000 DIV n_tokens AS BIGINT)"))
        .orderBy("source", "lang")
    },

    // Top event-type PATH TRIGRAMS — the 3-step sequence-mining layer
    // above q215's one-step Markov matrix (a Markov chain cannot see
    // that view→click→purchase outruns its pairwise factorization;
    // path mining can). Two per-USER lead()s, counts map-combined
    // onto the ≤|types|³ path grid, top-10 by TakeOrdered with the
    // full (n desc, t1, t2, t3) tiebreak; share_ppm against the total
    // trigram mass rides along as a one-row broadcast.
    "q230_path_trigrams" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val tri = ev
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("n"))
      val tot = tri.agg(sum(col("n")).as("t_tri"))
      tri.crossJoin(broadcast(tot))
        .select(col("t1"), col("t2"), col("t3"), col("n").cast("long").as("n"),
          expr("CAST(n * 1000000 DIV t_tri AS BIGINT)").as("share_ppm"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(10)
    },

    // Product-quantization CODEBOOK assignment — the vector-
    // compression audit next to E6/q117's IVF cells: the 64-dim
    // embedding splits into two 32-dim subvectors, each assigned to
    // its nearest of 4 deterministic centroids (the 4 smallest
    // vec_ids — a real PQ trains these; the assignment/audit plumbing
    // is identical), L2² in q3 fixed point (the q112/q204 convention)
    // with the mirrored two-step argmin (min distance, then min
    // centroid id on ties — no engine-specific arg_min). Output: the
    // 4×4 code-cell occupancy with explicit zeros plus the total
    // quantization error per cell — the numbers that size a PQ index
    // and expose dead codes. Centroid table is 256 broadcast rows;
    // distances map-combine onto (vec, subspace, centroid).
    "q233_pq_codebook" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val el = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("vec_id"), col("i").cast("long").as("i"),
          expr("CAST(i DIV 32 AS BIGINT)").as("ss"),
          expr("CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5D) AS BIGINT)").as("q3"))
      val cids = emb.select(col("vec_id").as("cid")).orderBy("cid").limit(4)
      // centroid elements derive from the LIMITed rows directly (not a
      // join back into the full element stream) so the broadcast side
      // is structurally bounded — PlanSpec's broadcast audit checks this
      val cent = emb.orderBy("vec_id").limit(4)
        .select(col("vec_id").as("cid"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("cid"), col("i").cast("long").as("i"),
          expr("CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5D) AS BIGINT)").as("c3"))
      val dist = el.join(broadcast(cent), Seq("i"))
        .groupBy(col("vec_id"), col("ss"), col("cid"))
        .agg(sum((col("q3") - col("c3")) * (col("q3") - col("c3"))).as("d2"))
      val md = dist.groupBy("vec_id", "ss").agg(min(col("d2")).as("md"))
      val best = dist.join(md, Seq("vec_id", "ss"))
        .filter(col("d2") === col("md"))
        .groupBy("vec_id", "ss", "md").agg(min(col("cid")).as("code"))
      val codes = best.groupBy("vec_id")
        .agg(max(when(col("ss") === 0, col("code"))).as("code0"),
          max(when(col("ss") === 1, col("code"))).as("code1"),
          sum(col("md")).as("qerr"))
      val cells = codes.groupBy("code0", "code1")
        .agg(count(lit(1)).as("nv"), sum(col("qerr")).as("qe"))
      val grid = cids.select(col("cid").as("code0"))
        .crossJoin(broadcast(cids.select(col("cid").as("code1"))))
      val tot = emb.agg(count(lit(1)).as("tv"))
      grid.join(cells, Seq("code0", "code1"), "left")
        .crossJoin(broadcast(tot))
        .select(col("code0"), col("code1"),
          coalesce(col("nv"), lit(0L)).cast("long").as("n_vecs"),
          coalesce(col("qe"), lit(0L)).cast("long").as("qerr_u"),
          expr("CAST(coalesce(nv, 0) * 1000000 DIV tv AS BIGINT)").as("share_ppm"))
        .orderBy("code0", "code1")
    },

    // Event-stream DISORDER audit — how out-of-order is event time
    // relative to arrival order (event_id), per type: the number a
    // streaming deployment sets its WATERMARK delay by (B14's
    // watermarks assume a bound; this measures it). late = ts behind
    // the running max of the user's earlier arrivals (per-USER window
    // — arrival state bounded by one user's history); depth in µs
    // with the max and DECIMAL-widened sum emitted (Σdepth passes
    // int64 near 10⁶ very-late events × month-deep lateness).
    "q235_event_disorder" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("tu"))
        .withColumn("pm", max(col("tu")).over(w))
        .withColumn("depth",
          when(col("pm").isNotNull && col("pm") > col("tu"),
            col("pm") - col("tu")).otherwise(lit(0L)))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_events"),
          count(when(col("depth") > 0, 1)).cast("long").as("n_late"),
          max(col("depth")).cast("long").as("max_depth_us"),
          sum(expr("CAST(depth AS DECIMAL(38,0))")).as("sd"))
        .select(col("event_type"), col("n_events"), col("n_late"),
          expr("CAST(n_late * 1000000 DIV n_events AS BIGINT)").as("late_ppm"),
          col("max_depth_us"),
          expr("CAST(sd AS BIGINT)").as("sum_depth_us"))
        .orderBy("event_type")
    },

    // RFM OCTANT segmentation — recency/frequency/monetary, each
    // split at its corpus mean by integer CROSS-MULTIPLICATION
    // (x·n ≤ Σx — never a mean division, so the split is exact in
    // both engines; quantile splits would need a corpus sort, the
    // mean split map-combines). Monetary in exact DECIMAL(12,2)
    // cents; the 2³ = 8 octant grid carries explicit zeros (q158
    // rule). Per-user reduction is one key shuffle; the three means
    // are a one-row broadcast.
    "q236_rfm_octants" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"),
        to_date(col("ts")).as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
      val mx = ev.agg(max(col("day")).as("mx"))
      val u = ev.crossJoin(broadcast(mx))
        .groupBy("user_id")
        .agg(min(datediff(col("mx"), col("day"))).cast("long").as("r"),
          count(lit(1)).cast("long").as("f"),
          sum(col("cents")).cast("long").as("m"))
      val t = u.agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
        sum(col("f")).as("sf"), sum(col("m")).as("sm"))
      val seg = u.crossJoin(broadcast(t))
        .select(
          when(col("r") * col("n") <= col("sr"), 1L).otherwise(0L).as("recent"),
          when(col("f") * col("n") >= col("sf"), 1L).otherwise(0L).as("frequent"),
          when(col("m") * col("n") >= col("sm"), 1L).otherwise(0L).as("monetary"))
        .groupBy("recent", "frequent", "monetary")
        .agg(count(lit(1)).as("nu"))
      val bits = s.range(0, 2).select(col("id").as("b"))
      val grid = bits.select(col("b").as("recent"))
        .crossJoin(broadcast(bits.select(col("b").as("frequent"))))
        .crossJoin(broadcast(bits.select(col("b").as("monetary"))))
      val nTot = u.agg(count(lit(1)).as("nt"))
      grid.join(seg, Seq("recent", "frequent", "monetary"), "left")
        .crossJoin(broadcast(nTot))
        .select(col("recent"), col("frequent"), col("monetary"),
          coalesce(col("nu"), lit(0L)).cast("long").as("n_users"),
          expr("CAST(coalesce(nu, 0) * 1000000 DIV nt AS BIGINT)")
            .as("share_ppm"))
        .orderBy("recent", "frequent", "monetary")
    },

    // Daily CROSS-correlation between event-type pairs at lags 0–7 —
    // "does click lead purchase by k days": the between-series
    // sibling of E40/q150's within-series autocorrelation (a ≠ b
    // pairs only — the diagonal IS q150). raw(lag) = Σ_d a(d)·b(d+lag)
    // over the zero-filled day grid (silent days are signal); the
    // ratio to the pair's own lag-0 product is floor-ppm, so a
    // lead-lag asymmetry reads directly. Everything lives on the
    // (day × type) grid × 8 broadcast lags; products widened
    // DECIMAL(38,0)/HUGEINT (a·b passes int64 once both types log
    // ~3·10⁹/day).
    "q237_type_crosscorr" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val days = bounds.select(col("mn"), explode(expr("sequence(mn, mx)")).as("day"))
        .select(datediff(col("day"), col("mn")).cast("long").as("di"), col("day"))
      val types = ev.select("event_type").distinct()
      val cells = days.crossJoin(broadcast(types))
        .join(ev.groupBy("event_type", "day").agg(count(lit(1)).as("c0")),
          Seq("event_type", "day"), "left")
        .select(col("event_type"), col("di"),
          coalesce(col("c0"), lit(0L)).as("c"))
      val lags = s.range(0, 8).select(col("id").as("lag"))
      val shifted = cells.crossJoin(broadcast(lags))
        .select(col("event_type").as("t_from"), (col("di") + col("lag")).as("dj"),
          col("c").as("ca"), col("lag"))
      val raw = shifted.join(
          cells.select(col("event_type").as("t_to"), col("di").as("dj"),
            col("c").as("cb")), Seq("dj"))
        .filter(col("t_from") =!= col("t_to"))
        .groupBy("t_from", "t_to", "lag")
        .agg(sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("raw_d"))
        .withColumn("raw", expr("CAST(raw_d AS BIGINT)"))
      val base = raw.filter(col("lag") === 0)
        .select(col("t_from"), col("t_to"), col("raw_d").as("raw0"))
      raw.join(base, Seq("t_from", "t_to"))
        .select(col("t_from"), col("t_to"), col("lag"), col("raw"),
          expr("CASE WHEN raw0 > 0 THEN CAST(raw_d * 1000000 DIV raw0 AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("ratio_ppm"))
        .orderBy("t_from", "t_to", "lag")
    },

    // 1-D EARTH-MOVER distance between each source's length
    // distribution and the rest of the corpus — the integral-of-
    // |CDF-gap| metric next to E2/q113's KS (sup of the gap) and
    // E32/q142's TVD (density gap): EMD alone scores HOW FAR mass
    // moved, not just that it differs. Exact integer: both CDFs in
    // floor-ppm on the shared |distinct lengths| VALUE grid, gap
    // integrated × the value step (lead on the global grid — the
    // permitted window class), normalized by the value span. The
    // corpus-sized input collapses onto the grid in one map-combined
    // agg; the |sources|×|values| frame is grid-bounded.
    "q238_emd_lengths" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
      val g = docs.groupBy("source", "n_chars").agg(count(lit(1)).as("f0"))
      val vgrid = docs.groupBy("n_chars").agg(count(lit(1)).as("fa"))
      // global cumulative + next-value step WITHOUT an unpartitioned
      // window (the fleet PlanSpec rule): both are ≤/>-joins on the
      // broadcast value grid — the q201/q203 predecessor-count form
      val v2 = vgrid.select(col("n_chars").as("vc"), col("fa").as("fa2"))
      val cumg = vgrid.join(broadcast(v2), col("vc") <= col("n_chars"))
        .groupBy("n_chars").agg(sum(col("fa2")).as("cum_all"))
      val nextg = vgrid.join(broadcast(v2), col("vc") > col("n_chars"), "left")
        .groupBy("n_chars").agg(min(col("vc")).as("nxt"))
      val gv = cumg.join(nextg, "n_chars")
        .withColumn("dv", coalesce(col("nxt") - col("n_chars"), lit(0L)))
      val srcs = docs.groupBy("source").agg(count(lit(1)).as("ns"))
      val full = srcs.crossJoin(gv.select("n_chars", "cum_all", "dv"))
        .join(g, Seq("source", "n_chars"), "left")
        .withColumn("f", coalesce(col("f0"), lit(0L)))
      val ws = Window.partitionBy("source").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = docs.agg(count(lit(1)).as("n_all"))
      full.withColumn("cum_s", sum(col("f")).over(ws))
        .crossJoin(broadcast(tot))
        .groupBy(col("source"), col("ns"))
        .agg(sum(abs(expr("cum_s * 1000000 DIV ns") -
            expr("(cum_all - cum_s) * 1000000 DIV (n_all - ns)")) * col("dv"))
          .cast("long").as("emd_u"),
          (max(col("n_chars")) - min(col("n_chars"))).cast("long").as("span"))
        .select(col("source"), col("ns").cast("long").as("n_docs"),
          col("emd_u"),
          expr("CAST(emd_u DIV span AS BIGINT)").as("emd_ppm"))
        .orderBy("source")
    },

    // Balanced one-way ANOVA of daily volume by WEEKDAY per event
    // type — does day-of-week explain the variance (eta² = SSB/SST)?
    // The variance-DECOMPOSITION read next to F29/q208's forecast-
    // error ratio. The day grid is truncated to the first 4 FULL
    // WEEKS (28 days) so every weekday has exactly 4 observations —
    // the balanced design is what makes eta² exact integer:
    // eta²_ppm = (7·ΣT_g² − T²)·10⁶ DIV (28·Σc² − T²), no per-group
    // division ever. Weekday index via datediff-mod-7 from the
    // corpus min day (engine-neutral — no locale-dependent dow()).
    // Squares widened DECIMAL(38,0)/HUGEINT.
    "q239_weekday_anova" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val bounds = ev.agg(min(col("day")).as("mn"))
      val days = bounds.select(col("mn"), explode(expr("sequence(mn, date_add(mn, 27))")).as("day"))
        .select(col("day"), (datediff(col("day"), col("mn")) % 7).cast("long").as("wd"))
      val types = ev.select("event_type").distinct()
      val cells = days.crossJoin(broadcast(types))
        .join(ev.groupBy("event_type", "day").agg(count(lit(1)).as("c0")),
          Seq("event_type", "day"), "left")
        .select(col("event_type"), col("wd"), coalesce(col("c0"), lit(0L)).as("c"))
      val byWd = cells.groupBy("event_type", "wd")
        .agg(sum(col("c")).as("tg"))
      val agg = cells.groupBy("event_type")
        .agg(sum(col("c")).as("t"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
      byWd.groupBy("event_type")
        .agg(sum(expr("CAST(tg AS DECIMAL(38,0)) * tg")).as("stg2"))
        .join(agg, "event_type")
        .select(col("event_type"), col("t").cast("long").as("n_events_28d"),
          expr("CASE WHEN 28 * s2 - CAST(t AS DECIMAL(38,0)) * t > 0" +
            " THEN CAST((7 * stg2 - CAST(t AS DECIMAL(38,0)) * t) * 1000000" +
            " DIV (28 * s2 - CAST(t AS DECIMAL(38,0)) * t) AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("eta2_ppm"))
        .orderBy("event_type")
    },

    // MUTUAL nearest-neighbor SOURCES by exact token-set Jaccard —
    // the source-level merge candidate detector (two sources that are
    // each other's closest vocabulary neighbor are one crawl seen
    // twice; one-directional nearest is just similar). Vocabulary
    // sets are |vocab|-bounded, so the exact pair matrix is a
    // grid-bounded join (F31/q210's sketch matrix is the 100 TB
    // estimate; this is its exact small-grid sibling). Nearest =
    // mirrored two-step argmax (max j, then min name on ties — no
    // engine arg_max); mutual = one self-join of the NN relation.
    "q240_mutual_nn_sources" -> { (s, d) =>
      val st = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .distinct()
      val sizes = st.groupBy("source").agg(count(lit(1)).as("nv"))
      val inter = st.join(st.select(col("source").as("s2"), col("tok")), Seq("tok"))
        .filter(col("source") =!= col("s2"))
        .groupBy("source", "s2").agg(count(lit(1)).as("ix"))
      val jac = inter
        .join(broadcast(sizes), "source")
        .join(broadcast(sizes.select(col("source").as("s2"), col("nv").as("nv2"))), "s2")
        .select(col("source"), col("s2"),
          expr("CAST(ix * 1000000 DIV (nv + nv2 - ix) AS BIGINT)").as("j_ppm"))
      val mj = jac.groupBy("source").agg(max(col("j_ppm")).as("mj"))
      val nn = jac.join(mj, "source").filter(col("j_ppm") === col("mj"))
        .groupBy(col("source"), col("mj")).agg(min(col("s2")).as("nn"))
      val rev = nn.select(col("source").as("nn"), col("nn").as("rev_nn"))
      nn.join(rev, Seq("nn"), "left")
        .select(col("source"), col("nn"), col("mj").as("j_ppm"),
          when(col("rev_nn") === col("source"), 1L).otherwise(0L).as("mutual"))
        .orderBy("source")
    },

    // BIGRAM-LM BACKTEST — train a majority-continuation bigram model
    // on the doc_id % 3 == 0 split (the q37 profile convention) and
    // score next-token accuracy on the held-out docs, per language:
    // the cheapest possible language-model signal, and the sanity
    // bound any learned LM must beat on this corpus. The model is the
    // vocab-bounded (w1 → argmax-count w2) table (mirrored two-step
    // argmax, min w2 on ties) broadcast against the test bigram
    // stream; coverage (w1 seen in training) is emitted so accuracy
    // is never read against unseen contexts silently. Integer exact
    // end to end.
    "q241_bigram_lm_accuracy" -> { (s, d) =>
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("lang"), explode(expr(
          "transform(sequence(1, size(t) - 1)," +
            " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("lang"),
          col("b.w1").as("w1"), col("b.w2").as("w2"))
      val trainCnt = bg.filter(col("doc_id") % 3 === 0)
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val mxc = trainCnt.groupBy("w1").agg(max(col("c")).as("mc"))
      val model = trainCnt.join(mxc, "w1").filter(col("c") === col("mc"))
        .groupBy("w1").agg(min(col("w2")).as("pred"))
      bg.filter(col("doc_id") % 3 =!= 0)
        .join(broadcast(model), Seq("w1"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_pos"),
          count(when(col("pred").isNotNull, 1)).cast("long").as("n_covered"),
          count(when(col("pred") === col("w2"), 1)).cast("long").as("n_correct"))
        .select(col("lang"), col("n_pos"),
          expr("CAST(n_covered * 1000000 DIV n_pos AS BIGINT)").as("coverage_ppm"),
          expr("CAST(n_correct * 1000000 DIV n_pos AS BIGINT)").as("acc_ppm"))
        .orderBy("lang")
    },

    // CHURN-LABEL construction audit — the label-building step of a
    // retention model: feature window = days 0–20 from the corpus min
    // day, label = any activity in days 21–27; users bucketed by
    // feature-window activity (power of 2) with churn rate per bucket
    // — the monotone activity→retention gradient a model must at
    // least reproduce, and the leakage check (label events NEVER
    // counted in the feature) is structural: the two windows are
    // disjoint filters of one scan. Users outside both windows drop
    // (no label defined); buckets are a broadcast range join.
    "q242_churn_labels" -> { (s, d) =>
      val ev = Tables.events(s, d).crossJoin(broadcast(
          Tables.events(s, d).agg(min(to_date(col("ts"))).as("mn"))))
        .select(col("user_id"),
          datediff(to_date(col("ts")), col("mn")).cast("long").as("di"))
      val u = ev.filter(col("di") < 28)
        .groupBy("user_id")
        .agg(count(when(col("di") <= 20, 1)).cast("long").as("f_events"),
          count(when(col("di") >= 21, 1)).cast("long").as("l_events"))
        .filter(col("f_events") > 0)
        .withColumn("active", when(col("l_events") > 0, 1L).otherwise(0L))
      val pw = s.range(0, 12).select(expr("shiftleft(1L, CAST(id AS INT))").as("lo"))
      val bk = u.join(broadcast(pw),
          col("f_events") >= col("lo") && col("f_events") < col("lo") * 2)
        .groupBy("lo")
        .agg(count(lit(1)).as("nu"), sum(col("active")).as("na"))
      pw.join(bk, Seq("lo"), "left")
        .select(col("lo").as("bucket_lo"),
          coalesce(col("nu"), lit(0L)).cast("long").as("n_users"),
          coalesce(col("na"), lit(0L)).cast("long").as("n_retained"),
          expr("CASE WHEN coalesce(nu, 0) > 0 THEN" +
            " CAST((nu - na) * 1000000 DIV nu AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("churn_ppm"))
        .orderBy("bucket_lo")
    },

    // DAU/WAU STICKINESS per event type over the 4-full-week window
    // (the q239 balanced frame): avgDAU/avgWAU collapses to the exact
    // integer ΣDAU·10⁶ DIV (7·ΣWAU) — 10⁶ ppm = every weekly-active
    // user active daily. Distinct users per (type, day) and per
    // (type, week) are two map-combined countDistincts over one scan;
    // no window anywhere. The classic product-analytics engagement
    // ratio, and the shape a 100 TB events store answers from its
    // (day, type)-partitioned layout without a global pass.
    "q243_dau_wau_stickiness" -> { (s, d) =>
      val ev = Tables.events(s, d).crossJoin(broadcast(
          Tables.events(s, d).agg(min(to_date(col("ts"))).as("mn"))))
        .select(col("event_type"), col("user_id"),
          datediff(to_date(col("ts")), col("mn")).cast("long").as("di"))
        .filter(col("di") < 28)
      val dau = ev.groupBy(col("event_type"), col("di"))
        .agg(countDistinct(col("user_id")).as("du"))
        .groupBy("event_type").agg(sum(col("du")).cast("long").as("sum_dau"))
      val wau = ev.groupBy(col("event_type"), expr("di DIV 7").as("wk"))
        .agg(countDistinct(col("user_id")).as("wu"))
        .groupBy("event_type").agg(sum(col("wu")).cast("long").as("sum_wau"))
      dau.join(wau, "event_type")
        .select(col("event_type"), col("sum_dau"), col("sum_wau"),
          expr("CAST(sum_dau * 1000000 DIV (7 * sum_wau) AS BIGINT)")
            .as("stickiness_ppm"))
        .orderBy("event_type")
    },

    // AUDIENCE-OVERLAP matrix — distinct-user Jaccard between event
    // types: "are purchasers a subset of clickers" read directly from
    // the full |types|² grid (explicit zeros, q158 rule). The pair
    // stream is built from per-USER type sets (≤|types| per user, so
    // the explode is ≤|types|² per user — linear in users, never a
    // user-set self-join); sizes broadcast back. The entity-level
    // sibling of F61/q240's source-vocabulary matrix.
    "q244_audience_overlap" -> { (s, d) =>
      val ut = Tables.events(s, d).select(col("user_id"), col("event_type"))
        .distinct()
      val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("nu"))
      val pairs = ut.join(ut.select(col("user_id"), col("event_type").as("t2")),
          Seq("user_id"))
        .filter(col("event_type") =!= col("t2"))
        .groupBy(col("event_type").as("ta"), col("t2").as("tb"))
        .agg(count(lit(1)).as("ix"))
      val types = ut.select("event_type").distinct()
      val grid = types.select(col("event_type").as("ta"))
        .crossJoin(broadcast(types.select(col("event_type").as("tb"))))
        .filter(col("ta") =!= col("tb"))
      grid.join(pairs, Seq("ta", "tb"), "left")
        .join(broadcast(sizes.select(col("event_type").as("ta"), col("nu").as("na"))), "ta")
        .join(broadcast(sizes.select(col("event_type").as("tb"), col("nu").as("nb"))), "tb")
        .select(col("ta"), col("tb"),
          coalesce(col("ix"), lit(0L)).cast("long").as("n_both"),
          expr("CAST(coalesce(ix, 0) * 1000000" +
            " DIV (na + nb - coalesce(ix, 0)) AS BIGINT)").as("jaccard_ppm"),
          expr("CAST(coalesce(ix, 0) * 1000000 DIV na AS BIGINT)")
            .as("containment_ppm"))
        .orderBy("ta", "tb")
    },

    // POSITIONAL vocabulary drift per language — TVD between the
    // unigram distribution of first-half vs second-half token
    // POSITIONS within documents: prompts/templates load the front of
    // a doc, boilerplate footers the back, and either skews any model
    // trained on truncated windows (F42/q221 prices the truncation;
    // this detects what the kept half over-represents). Both halves'
    // counts collapse onto the |langs|×|vocab| grid in ONE pass
    // (half = position ≤ size/2); TVD floor-ppm per the E32/q142
    // convention.
    "q245_positional_drift" -> { (s, d) =>
      val pos = Tables.documents(s, d)
        .select(col("lang"), tokens(col("text")).as("t"))
        .select(col("lang"), size(col("t")).as("n"),
          posexplode(col("t")).as(Seq("i", "tok")))
        .select(col("lang"), col("tok"),
          when(col("i") * 2 < col("n"), 1L).otherwise(0L).as("h1"))
      val cell = pos.groupBy("lang", "tok")
        .agg(sum(col("h1")).as("c1"), sum(lit(1) - col("h1")).as("c2"))
      val tot = cell.groupBy("lang")
        .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      cell.join(broadcast(tot), "lang")
        .groupBy(col("lang"), col("n1"), col("n2"))
        .agg(sum(abs(expr("c1 * 1000000 DIV n1") -
          expr("c2 * 1000000 DIV n2"))).as("sdiff"))
        .select(col("lang"), col("n1").cast("long").as("n_first"),
          col("n2").cast("long").as("n_second"),
          expr("CAST(sdiff DIV 2 AS BIGINT)").as("tvd_ppm"))
        .orderBy("lang")
    },

    // FUNNEL LATENCY quantiles — days from a user's FIRST view to the
    // first purchase AFTER it: D5k/q71 counts who converts; this
    // measures how long conversion takes (the number a retention
    // campaign is timed by). Median and p90 computed on the
    // day-granular delta VALUE grid by predecessor-count (the grid is
    // bounded by the date span — never a sort over users); earliest
    // timestamps are plain min-aggregates per user, one key shuffle
    // each.
    "q246_funnel_latency" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("vts"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(firstView, "user_id")
        .filter(col("ts") >= col("vts"))
        .groupBy("user_id").agg(min(col("ts")).as("pts"), min(col("vts")).as("vts2"))
        .select(datediff(to_date(col("pts")), to_date(col("vts2")))
          .cast("long").as("delta"))
      val grid = conv.groupBy("delta").agg(count(lit(1)).as("f"))
      val g2 = grid.select(col("delta").as("d2"), col("f").as("f2"))
      val below = grid.join(broadcast(g2), col("d2") < col("delta"), "left")
        .groupBy("delta", "f").agg(coalesce(sum(col("f2")), lit(0L)).as("below"))
      val n = grid.agg(sum(col("f")).as("n"))
      val qg = s.range(0, 2)
        .select(expr("CASE WHEN id = 0 THEN 50L ELSE 90L END").as("q"))
      below.crossJoin(broadcast(n)).crossJoin(broadcast(qg))
        .withColumn("pos", expr("(q * n + 99) DIV 100"))
        .filter(col("below") < col("pos") && col("pos") <= col("below") + col("f"))
        .select(col("q"), col("delta").as("delta_days"),
          col("n").cast("long").as("n_converted"))
        .orderBy("q")
    },

    // REVENUE CONCENTRATION — which power-of-2 customer-value bucket
    // the top-80% revenue line crosses: the 80/20 read of the Pareto
    // question F37/q216 answers for sources, scaled to a corpus-sized
    // entity (customers) by bucketing BEFORE any ordering, so the
    // only ordered structure is the 40-row bucket grid (suffix sums =
    // grid self-join, never a customer sort). Revenue exact DECIMAL
    // cents; cum-from-top floor-ppm; crossing flag emitted per
    // bucket.
    "q247_revenue_concentration" -> { (s, d) =>
      val cust = Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .groupBy("o_custkey").agg(sum(col("cents")).as("rev"))
      // 40 buckets reach 2^40 cents (~$11B per customer) — no silent
      // drop of a whale outside the grid (the q222 no-silent-caps rule)
      val pw = s.range(0, 40).select(expr("shiftleft(1L, CAST(id AS INT))").as("lo"))
      val bk = cust.join(broadcast(pw),
          col("rev") >= col("lo") && col("rev") < col("lo") * 2)
        .groupBy("lo").agg(count(lit(1)).as("nc"),
          sum(expr("CAST(rev AS DECIMAL(38,0))")).as("rv"))
      val full = pw.join(bk, Seq("lo"), "left")
        .select(col("lo"), coalesce(col("nc"), lit(0L)).as("nc"),
          coalesce(col("rv"), expr("CAST(0 AS DECIMAL(38,0))")).as("rv"))
      val f2 = full.select(col("lo").as("lo2"), col("rv").as("rv2"))
      val tot = full.agg(sum(col("rv")).as("t_rev"), sum(col("nc")).as("t_cust"))
      full.join(broadcast(f2), col("lo2") >= col("lo"))
        .groupBy("lo", "nc", "rv").agg(sum(col("rv2")).as("cum_top"))
        .crossJoin(broadcast(tot))
        .select(col("lo").as("bucket_lo"), col("nc").cast("long").as("n_cust"),
          expr("CAST(rv AS BIGINT)").as("rev_c"),
          expr("CASE WHEN t_rev > 0 THEN CAST(cum_top * 1000000 DIV t_rev AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("cum_from_top_ppm"),
          expr("CASE WHEN t_rev > 0 AND cum_top * 1000000 DIV t_rev >= 800000" +
            " THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("covers_80"))
        .orderBy("bucket_lo")
    },

    // Cramér's V² of the lang × source association — the EFFECT SIZE
    // the E63/q173 chi-square lacks (chi² grows with N; V² =
    // chi²/(N·min(r−1,c−1)) is scale-free, and V is its square root —
    // both engines stop at V², the last transcendental-free point).
    // Per-cell contributions follow q173's exact-sufficient-statistics
    // + cell-rounded-µ rule, summed to ONE audit row. The contingency
    // grid is |langs|×|sources|; margins are broadcast aggregates of
    // the grid.
    "q248_cramers_v2" -> { (s, d) =>
      val cell = Tables.documents(s, d).groupBy("lang", "source")
        .agg(count(lit(1)).cast("long").as("obs"))
      val rowT = cell.groupBy("lang").agg(sum(col("obs")).as("row_tot"))
      val colT = cell.groupBy("source").agg(sum(col("obs")).as("col_tot"))
      val grand = cell.agg(sum(col("obs")).as("n_tot"),
        countDistinct(col("lang")).as("r"), countDistinct(col("source")).as("c"))
      cell.join(broadcast(rowT), "lang").join(broadcast(colT), "source")
        .crossJoin(broadcast(grand))
        .select(col("n_tot"), col("r"), col("c"),
          expr("""CAST(round(
              CAST(CAST(obs AS DECIMAL(38,0)) * n_tot - CAST(row_tot AS DECIMAL(38,0)) * col_tot AS DOUBLE) *
              CAST(CAST(obs AS DECIMAL(38,0)) * n_tot - CAST(row_tot AS DECIMAL(38,0)) * col_tot AS DOUBLE) /
              CAST(CAST(row_tot AS DECIMAL(38,0)) * col_tot AS DOUBLE) /
              CAST(n_tot AS DOUBLE) * 1000000) AS BIGINT)""").as("contrib_e6"))
        .groupBy(col("n_tot"), col("r"), col("c"))
        .agg(sum(col("contrib_e6")).cast("long").as("chi2_e6"))
        .select(col("n_tot").cast("long").as("n_docs"),
          col("r").cast("long").as("n_langs"), col("c").cast("long").as("n_sources"),
          col("chi2_e6"),
          expr("CAST(chi2_e6 DIV (n_tot * least(r - 1, c - 1)) AS BIGINT)")
            .as("v2_ppm"))
    },

    // EMBEDDING SANITY audit per label — the vector-hygiene screen an
    // ANN index build (E6/q117, q42) runs first: near-zero-norm
    // vectors poison cosine similarity (direction is noise), exact
    // duplicate vectors inflate neighbor lists, and a label whose max
    // norm dwarfs its peers hints at an unnormalized batch. Norms in
    // q3 fixed point (Σq3² µ²-units, the q112 convention); duplicate
    // detection by md5 of the CANONICAL quantized string (engine-
    // neutral — float bytes are not). One scan; per-label grid.
    "q249_embedding_sanity" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          expr("aggregate(embedding, 0L, (a, x) -> a +" +
            " CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5D) AS BIGINT)" +
            " * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5D) AS BIGINT))")
            .as("norm2_u"),
          md5(expr("CAST(array_join(transform(embedding," +
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5D) AS BIGINT)), ',')" +
            " AS BINARY)")).as("qh"))
        .groupBy("label")
        .agg(count(lit(1)).cast("long").as("n_vecs"),
          count(when(col("norm2_u") < 1000L, 1)).cast("long").as("n_near_zero"),
          (count(lit(1)) - countDistinct(col("qh"))).cast("long").as("n_dups"),
          max(col("norm2_u")).cast("long").as("max_norm2_u"),
          min(col("norm2_u")).cast("long").as("min_norm2_u"))
        .orderBy("label")
    },

    // MLM MASK-SPAN planner — the deterministic 15% masking plan a
    // masked-LM data builder materializes: position masked iff the
    // engine-neutral hash of (doc, position) lands under the rate, so
    // the plan is reproducible and append-stable (adding a doc never
    // remasks another). The audit per source: realized mask ppm vs
    // the 150 000 target, span count and mean span length (consecutive
    // masked positions fuse into one span — the gaps-islands i−rank
    // trick on the per-DOC window, bounded by one doc's length).
    "q250_mask_plan" -> { (s, d) =>
      val pos = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), posexplode(tokens(col("text")))
          .as(Seq("i", "tok")))
        .withColumn("masked",
          (Dedup.neutralHash32(concat(lit("mask:"), col("doc_id").cast("string"),
            lit(":"), col("i").cast("string"))) % 100 < 15).cast("int"))
      val wd = Window.partitionBy("doc_id").orderBy("i")
      val spans = pos.filter(col("masked") === 1)
        .withColumn("rk", row_number().over(wd))
        .select(col("doc_id"), col("source"), (col("i") - col("rk")).as("island"))
        .groupBy("doc_id", "source", "island").agg(count(lit(1)).as("sl"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_spans"), sum(col("sl")).as("n_masked2"))
      pos.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          sum(col("masked")).cast("long").as("n_masked"))
        .join(spans, Seq("source"), "left")
        .select(col("source"), col("n_tokens"), col("n_masked"),
          expr("CAST(n_masked * 1000000 DIV n_tokens AS BIGINT)").as("mask_ppm"),
          coalesce(col("n_spans"), lit(0L)).cast("long").as("n_spans"),
          expr("CASE WHEN coalesce(n_spans, 0) > 0 THEN" +
            " CAST(n_masked * 1000000 DIV n_spans AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("mean_span_utok"))
        .orderBy("source")
    },

    // CLIPPED n-gram PRECISION of each source against the rest of the
    // corpus — the BLEU-precision kernel (clipping = min with the
    // reference count) at n ∈ {1, 2}: high unigram but low bigram
    // precision is the signature of word-salad paraphrase spam that
    // D5n/q74 containment misses and F5/q185 novelty only sees
    // per-doc. Occurrence counts (not distinct) collapse onto the
    // vocab grid per source in one pass per level; rest counts =
    // global − own, so the "reference" needs no second scan. Exact
    // integer throughout.
    "q253_clipped_ngram_precision" -> { (s, d) =>
      def level(n: Int): DataFrame = {
        val grams =
          if (n == 1)
            Tables.documents(s, d).select(col("source"),
              explode(tokens(col("text"))).as("g"))
          else
            bigrams2(s, d)
        grams.groupBy("source", "g").agg(count(lit(1)).as("cs"))
          .withColumn("n", lit(n.toLong))
      }
      val cell = level(1).unionByName(level(2))
      val glob = cell.groupBy("n", "g").agg(sum(col("cs")).as("ct"))
      cell.join(glob, Seq("n", "g"))
        .groupBy("source", "n")
        .agg(sum(col("cs")).cast("long").as("total_grams"),
          sum(least(col("cs"), col("ct") - col("cs"))).cast("long").as("clipped"))
        .withColumn("prec_ppm",
          expr("CAST(clipped * 1000000 DIV total_grams AS BIGINT)"))
        .orderBy("source", "n")
    },

    // SHARED n-gram LADDER between source pairs — contamination DEPTH
    // where F31/q210 scores overlap MASS: sharing any 8-gram is
    // near-verbatim copying, sharing only 2-grams is shared style;
    // the ladder (n ∈ {2, 4, 8}) localizes each pair on that scale.
    // Per n, distinct (source, md5(ngram)) sets join on hash with
    // s2 > source (each unordered pair once); flags land on the
    // |sources|²/2 pair grid with explicit zeros, max_shared_n =
    // greatest flagged rung. The shuffle carries 32-char hashes,
    // never text (the q182 rule).
    "q254_shared_ngram_ladder" -> { (s, d) =>
      // Round-12 shape (guide §2.3/§2.4): the three rungs used to run as
      // three FULL pipelines — scan + explode + distinct(source, h) +
      // hash self-join + pair distinct each. The explodes stay per-rung
      // (plain string transforms with post-explode codegen md5 — an
      // all-widths struct-array concat was measured slower), but they
      // now UNION into one shared downstream: the rung membership
      // question "which source pairs share an n-gram" is answered by a
      // per-(n, h) SOURCE-BITMASK census, distinct masks expand to their
      // ordered pairs against the broadcast source-rank grid (never a
      // self-join), and the pair flags land with one map-combined max()
      // per width. Same n-gram text (space-joined token windows), same
      // md5 keys, same pair grid with explicit zeros — QualitySpec pins
      // equality against a plain-Scala per-rung shared-set replay.
      def rungRows(n: Int): DataFrame = Tables.documents(s, d)
        .select(col("source"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= n)
        .select(col("source"), explode(expr(
          s"transform(sequence(1, size(t) - ${n - 1})," +
            s" i -> array_join(slice(t, i, $n), ' '))")).as("ng"))
        .select(lit(n.toLong).as("n"), md5(col("ng")).as("h"), col("source"))
      // The census aggregate is a fixed-width BIT_OR bitmask, not
      // collect_set: millions of near-singleton (n, h) groups push an
      // object-buffer aggregate past ObjectHashAggregate's sort-based
      // fallback (measured: the collect_set form gave the plan win back
      // in agg time), while bit_or keeps the whole census in codegen
      // HashAggregate with map-side combine — and absorbs duplicate
      // occurrences, so no distinct pass exists anywhere. Source bits
      // come from the deterministic rank of the source name; sources are
      // a bounded enumeration (20 values at every SF) and the ≤64 bound
      // is enforced loudly by assert_true, never silently wrapped.
      val srcs0 = Tables.documents(s, d).select("source").distinct()
      val srcIdx = srcs0
        .join(srcs0.select(col("source").as("s0")),
          col("s0") < col("source"), "left")
        .groupBy("source").agg(count(col("s0")).cast("int").as("idx"))
        .filter(expr("assert_true(idx < 64) IS NULL"))
      val ai = srcIdx.select(col("source"), col("idx").as("ia"))
      val bi = srcIdx.select(col("source").as("s2"), col("idx").as("ib"))
      val flags = rungRows(2).unionByName(rungRows(4)).unionByName(rungRows(8))
        .join(broadcast(srcIdx), "source")
        .groupBy("n", "h")
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), idx))").as("mask"))
        .select("n", "mask").distinct()
        .join(broadcast(ai), expr("(mask & shiftleft(CAST(1 AS BIGINT), ia)) != 0"))
        .join(broadcast(bi), expr("(mask & shiftleft(CAST(1 AS BIGINT), ib)) != 0" +
          " AND ib > ia"))
        .groupBy("source", "s2")
        .agg(max(when(col("n") === 2, 1L).otherwise(0L)).as("has2"),
          max(when(col("n") === 4, 1L).otherwise(0L)).as("has4"),
          max(when(col("n") === 8, 1L).otherwise(0L)).as("has8"))
      val srcs = Tables.documents(s, d).select("source").distinct()
      val pairs = srcs.join(srcs.select(col("source").as("s2")),
          col("s2") > col("source"))
      pairs.join(flags, Seq("source", "s2"), "left")
        .select(col("source"), col("s2"),
          coalesce(col("has2"), lit(0L)).as("has2"),
          coalesce(col("has4"), lit(0L)).as("has4"),
          coalesce(col("has8"), lit(0L)).as("has8"))
        .withColumn("max_shared_n",
          expr("CASE WHEN has8 = 1 THEN 8L WHEN has4 = 1 THEN 4L" +
            " WHEN has2 = 1 THEN 2L ELSE 0L END"))
        .orderBy("source", "s2")
    },

    // Sequential 2-PATTERN support — P(a occurs before b | user saw
    // both), any gap: the order statistic q215's Markov matrix
    // (adjacent only) and D5k/q71's fixed funnel chain both miss. A
    // user's first occurrence per type is a min-aggregate (ts, then
    // event_id on ties — the mirrored two-step, no struct-min);
    // ordered pairs explode from per-USER type sets (≤|types|² per
    // user, linear in users), landing on the |types|² grid with
    // explicit zeros. support(a→b) + support(b→a) = 1e6 within floor
    // error by construction — spec-asserted.
    "q257_seq2_support" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"), col("event_id"))
      val mt = ev.groupBy("user_id", "event_type").agg(min(col("tu")).as("mt"))
      val first = ev.join(mt, Seq("user_id", "event_type"))
        .filter(col("tu") === col("mt"))
        .groupBy("user_id", "event_type", "mt").agg(min(col("event_id")).as("me"))
      val pairs = first.join(
          first.select(col("user_id"), col("event_type").as("tb"),
            col("mt").as("mtb"), col("me").as("meb")), Seq("user_id"))
        .filter(col("event_type") =!= col("tb"))
        .groupBy(col("event_type").as("ta"), col("tb"))
        .agg(count(lit(1)).as("n_both"),
          count(when(col("mt") < col("mtb") ||
            (col("mt") === col("mtb") && col("me") < col("meb")), 1)).as("n_first"))
      val types = ev.select("event_type").distinct()
      val grid = types.select(col("event_type").as("ta"))
        .crossJoin(broadcast(types.select(col("event_type").as("tb"))))
        .filter(col("ta") =!= col("tb"))
      grid.join(pairs, Seq("ta", "tb"), "left")
        .select(col("ta"), col("tb"),
          coalesce(col("n_both"), lit(0L)).cast("long").as("n_both"),
          coalesce(col("n_first"), lit(0L)).cast("long").as("n_a_first"),
          expr("CASE WHEN coalesce(n_both, 0) > 0 THEN" +
            " CAST(coalesce(n_first, 0) * 1000000 DIV n_both AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("support_ppm"))
        .orderBy("ta", "tb")
    },

    // Survival HAZARD table of user activity lifetimes — the
    // Kaplan–Meier INPUT (at-risk counts, churn events, hazards per
    // lifetime day) with right-censoring: a user still active on the
    // observation's last day hasn't churned, just stopped being
    // observed — counting them as deaths (the naive read) biases
    // every retention number down. The K–M survival product itself
    // needs a multiplication chain; both engines stop at the exact
    // hazard table it is built from. Lifetimes collapse onto the
    // bounded day grid; at-risk = suffix-count via a ≥-join on that
    // grid (the q201 rank rule).
    "q258_hazard_table" -> { (s, d) =>
      val bounds = Tables.events(s, d).agg(max(to_date(col("ts"))).as("emax"))
      val life = Tables.events(s, d).crossJoin(broadcast(bounds))
        .groupBy("user_id")
        .agg((datediff(max(to_date(col("ts"))), min(to_date(col("ts")))))
          .cast("long").as("t"),
          max(when(to_date(col("ts")) === col("emax"), 1L).otherwise(0L))
            .as("censored"))
      val grid = life.groupBy("t")
        .agg(count(lit(1)).as("f"),
          count(when(col("censored") === 0, 1)).as("d"),
          count(when(col("censored") === 1, 1)).as("c"))
      val atRisk = grid.join(broadcast(grid.select(col("t").as("t2"),
          col("f").as("f2"))), col("t2") >= col("t"))
        .groupBy("t", "d", "c").agg(sum(col("f2")).as("n_at_risk"))
      atRisk.select(col("t").as("lifetime_days"),
          col("n_at_risk").cast("long").as("n_at_risk"),
          col("d").cast("long").as("n_churned"),
          col("c").cast("long").as("n_censored"),
          expr("CAST(d * 1000000 DIV n_at_risk AS BIGINT)").as("hazard_ppm"))
        .orderBy("lifetime_days")
    },

    // AS-OF join with TOLERANCE — E24/q132's merge-join ASOF plus the
    // staleness bound every real point-in-time lookup carries (pandas
    // merge_asof(tolerance=...), kdb wj): a view older than ONE HOUR
    // is not "the quote in effect", it is stale context, and matching
    // it silently is the bug this operator class exists to prevent.
    // Same single-shuffle union-tag + running last(ignoreNulls)
    // machinery; the tolerance is applied AFTER the match so matched
    // (within-tolerance), stale (match beyond tolerance → nulled,
    // flagged), and unmatched are three distinct observable states.
    "q261_asof_tolerance" -> { (s, d) =>
      val TolUs = 3600000000L // 1 hour in µs — interpolated into the oracle
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("value"))
      val left = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("us"),
          lit(1).as("side"), lit(null).cast("long").as("q_us"))
      val right = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("us"))
        .agg(max(col("event_id")).as("event_id"))
        .select(col("user_id"), col("event_id"), col("us"),
          lit(0).as("side"), col("us").as("q_us"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      left.unionByName(right)
        .withColumn("raw_asof", last(col("q_us"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
          when(col("us") - col("raw_asof") <= TolUs, col("raw_asof"))
            .as("asof_us"),
          when(col("us") - col("raw_asof") <= TolUs, col("us") - col("raw_asof"))
            .as("gap_us"),
          expr(s"CAST(CASE WHEN raw_asof IS NULL THEN 0" +
            s" WHEN us - raw_asof <= ${TolUs}L THEN 1" +
            s" ELSE 2 END AS BIGINT)").as("match_state"))
        .orderBy("event_id")
    },

    // WATERMARK SIZING quantiles — p99/p99.9 of the per-type DISORDER
    // depth (F56/q235 measures the depths; this picks the delay): a
    // watermark at p99 drops 1% of events, at p99.9 one in a thousand
    // — the accuracy-vs-latency dial, read off the exact quantile
    // table. Depths floor to SECONDS so the quantile grid is
    // value-bounded (the permitted window class, per-type
    // partitioned). ALL events enter with on-time depth 0 — on this
    // fixture every stream is perfectly ordered, and "p99.9 delay =
    // 0 s, no watermark needed" must be a MEASURED row, not an empty
    // result (the q158 empty-bin rule applied to time).
    "q262_watermark_sizing" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val depths = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("tu"))
        .withColumn("pm", max(col("tu")).over(w))
        .select(col("event_type"),
          when(col("pm").isNotNull && col("pm") > col("tu"),
            expr("(pm - tu) DIV 1000000")).otherwise(lit(0L)).as("depth_s"))
      val grid = depths.groupBy("event_type", "depth_s").agg(count(lit(1)).as("f"))
      val wc = Window.partitionBy("event_type").orderBy("depth_s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = grid.withColumn("below", coalesce(sum(col("f")).over(wc), lit(0L)))
      val n = grid.groupBy("event_type").agg(sum(col("f")).as("n"))
      val qg = s.range(0, 2)
        .select(expr("CASE WHEN id = 0 THEN 990L ELSE 999L END").as("qpm"))
      cum.join(broadcast(n), "event_type").crossJoin(broadcast(qg))
        .withColumn("pos", expr("(qpm * n + 999) DIV 1000"))
        .filter(col("below") < col("pos") && col("pos") <= col("below") + col("f"))
        .select(col("event_type"), col("qpm"), col("depth_s").as("delay_s"),
          col("n").cast("long").as("n_events"))
        .orderBy("event_type", "qpm")
    },

    // CO-PURCHASE graph TRIANGLES + global clustering closure — the
    // community-structure read of the basket graph (D6m/q99 counts
    // pair frequencies; F14/q194 counts within-basket triples; a
    // TRIANGLE needs its three edges in possibly three different
    // baskets — only the graph view sees it). Edges = part pairs
    // co-bought in ≥ 2 orders (the support threshold IS the scale
    // bound, the df-cap analog), baskets capped at 32 lines like
    // q194. Triangles by the standard a<b<c edge-join closure;
    // wedges Σ deg·(deg−1)/2; closure_ppm = 3T·10⁶/W. All joins run
    // on the thresholded edge set, never on baskets.
    "q263_copurchase_triangles" -> { (s, d) =>
      // in-row pair expansion from the sorted basket (two shuffles where
      // the okey self-join form needed four) — the same pair set; the
      // sorted array makes a < b free and the ≤32 cap bounds fan-out
      val edges = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
        .groupBy("okey")
        .agg(expr("sort_array(collect_set(part))").as("ps"))
        .filter(size(col("ps")).between(2, 32))
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ps) - 1)," +
            " i -> transform(sequence(i + 1, size(ps))," +
            " j -> struct(element_at(ps, i) AS a, element_at(ps, j) AS b))))"))
          .as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2)
        .select("a", "b")
      val deg = edges.select(col("a").as("v")).unionByName(
          edges.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
      val wedges = deg.agg(sum(expr("dg * (dg - 1) DIV 2")).as("n_wedges"),
        count(lit(1)).as("n_vertices"))
      val tri = edges.join(edges.select(col("a").as("b"), col("b").as("c")), Seq("b"))
        .join(edges.select(col("a"), col("b").as("c"), lit(1).as("closed")),
          Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
      val ne = edges.agg(count(lit(1)).as("n_edges"))
      wedges.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
        .select(col("n_vertices").cast("long").as("n_vertices"),
          col("n_edges").cast("long").as("n_edges"),
          col("n_wedges").cast("long").as("n_wedges"),
          col("n_triangles").cast("long").as("n_triangles"),
          expr("CASE WHEN n_wedges > 0 THEN" +
            " CAST(3 * n_triangles * 1000000 DIV n_wedges AS BIGINT)" +
            " ELSE CAST(0 AS BIGINT) END").as("closure_ppm"))
    },

    // WATERMARK COMPLETENESS curve — q262 sizes the watermark from
    // lateness QUANTILES; this prices fixed CHOICES: per event_type in
    // per-partition arrival order (event_id — the q235 disorder
    // convention), an event's lateness is how far the stream's
    // event-time high-water mark had already passed it, and a watermark
    // of delay d DROPS events later than d. For d ∈ {60 s, 1 h, 1 d}
    // the table reports dropped count and floor-ppm completeness — the
    // correctness-vs-latency contract a streaming SLA states. Scale:
    // ONE per-type running-max window + a map-combined census per grid
    // point; the d grid rides a broadcast.
    "q460_watermark_completeness" -> { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val late = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("hwm", max(col("us")).over(w))
        .withColumn("late_s", when(col("hwm").isNotNull &&
          col("hwm") > col("us"),
          expr("(hwm - us) DIV 1000000")).otherwise(lit(0L)))
      val ds = s.range(3)
        .select(expr("CAST(element_at(array(60, 3600, 86400), CAST(id AS INT) + 1) AS BIGINT)")
          .as("watermark_s"))
      late.crossJoin(broadcast(ds))
        .groupBy("event_type", "watermark_s")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("late_s") > col("watermark_s"), 1L).otherwise(0L))
            .cast("long").as("n_dropped"))
        .withColumn("completeness_ppm",
          expr("CAST((n_events - n_dropped) * 1000000 DIV n_events AS BIGINT)"))
        .orderBy("event_type", "watermark_s")
    }
  )

  /** Bigram occurrences as `(source, g)` WITH repetition — q253's
    * count-level sibling of [[bigrams]] (which keys by doc for
    * distinct-per-doc semantics). */
  private def bigrams2(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("g"))

  private val BigramSql =
    """bg AS (
      |  SELECT t.doc_id, t.t[g.i] || ' ' || t.t[g.i + 1] AS bg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) t,
      |    UNNEST(generate_series(1, len(t.t) - 1)) g(i)
      |  WHERE len(t.t) >= 2)""".stripMargin

  def oracle: Map[String, String] = Map(
    "q213_heaps_bigrams" ->
      ("""WITH """ + BigramSql +
        """,
          |fd AS (SELECT bg.bg, MIN(doc_id) AS fd FROM bg GROUP BY 1),
          |b AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents),
          |kg AS (
          |  SELECT CAST(1 << g.i AS BIGINT) AS k,
          |    mn + (mx - mn) * CAST(1 << g.i AS BIGINT) // 8 AS cut
          |  FROM b, UNNEST(generate_series(0, 3)) g(i)),
          |v AS (SELECT k, cut, COUNT(*) AS v_types
          |      FROM kg JOIN fd ON fd.fd <= kg.cut GROUP BY 1, 2),
          |dm AS (SELECT doc_id,
          |         GREATEST(len(string_split(text, ' ')) - 1, 0) AS nb
          |       FROM documents),
          |n AS (SELECT k, cut, COUNT(*) AS n_docs, SUM(nb) AS n_bigrams
          |      FROM kg JOIN dm ON dm.doc_id <= kg.cut GROUP BY 1, 2),
          |j AS (SELECT kg.k, kg.cut, n.n_docs, n.n_bigrams, v.v_types
          |      FROM kg JOIN n USING (k, cut) JOIN v USING (k, cut))
          |SELECT j.k, j.cut AS cut_id, CAST(j.n_docs AS BIGINT) AS n_docs,
          |  CAST(j.n_bigrams AS BIGINT) AS n_bigrams,
          |  CAST(j.v_types AS BIGINT) AS v_types,
          |  CAST(COALESCE(j.n_bigrams * 1000000 // p.n_bigrams, 0) AS BIGINT)
          |    AS mass_growth_ppm,
          |  CAST(COALESCE(j.v_types * 1000000 // p.v_types, 0) AS BIGINT)
          |    AS vocab_growth_ppm
          |FROM j LEFT JOIN j p ON p.k = j.k // 2
          |ORDER BY j.k""").stripMargin,

    "q214_cms_heavy_hitters" ->
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |tc AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
         |rg AS (SELECT g.i AS r FROM UNNEST(generate_series(0, ${CmsDepth - 1})) g(i)),
         |cells AS (
         |  SELECT r, ('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':' || tok),
         |      1, 8))::BIGINT % $CmsWidth AS b,
         |    SUM(cnt) AS cell
         |  FROM tc CROSS JOIN rg GROUP BY 1, 2),
         |top AS (SELECT tok, cnt FROM tc ORDER BY cnt DESC, tok LIMIT 20)
         |SELECT t.tok, CAST(t.cnt AS BIGINT) AS exact,
         |  CAST(MIN(c.cell) AS BIGINT) AS est,
         |  CAST(MIN(c.cell) - t.cnt AS BIGINT) AS overest,
         |  CAST((MIN(c.cell) - t.cnt) * 1000000 // t.cnt AS BIGINT) AS err_ppm
         |FROM top t CROSS JOIN rg
         |JOIN cells c ON c.r = rg.r
         |  AND c.b = ('0x' || substr(md5('cms' || CAST(rg.r AS VARCHAR) || ':' || t.tok),
         |    1, 8))::BIGINT % $CmsWidth
         |GROUP BY t.tok, t.cnt
         |ORDER BY exact DESC, t.tok""".stripMargin,

    "q215_event_markov" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |cnt AS (SELECT from_type, to_type, COUNT(*) AS n0
        |        FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT a.event_type AS from_type, b.event_type AS to_type
        |         FROM ty a CROSS JOIN ty b),
        |fl AS (SELECT g.from_type, g.to_type, COALESCE(c.n0, 0) AS n
        |       FROM grid g LEFT JOIN cnt c USING (from_type, to_type)),
        |tot AS (SELECT from_type, SUM(n) AS tot FROM fl GROUP BY 1)
        |SELECT f.from_type, f.to_type, CAST(f.n AS BIGINT) AS n,
        |  CASE WHEN t.tot > 0 THEN CAST(f.n * 1000000 // t.tot AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS row_ppm
        |FROM fl f JOIN tot t USING (from_type)
        |ORDER BY f.from_type, f.to_type""".stripMargin,

    "q216_source_lorenz" ->
      """WITH m AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
        |  FROM documents GROUP BY 1),
        |r AS (
        |  SELECT a.source, a.mass,
        |    CAST(1 + COUNT(b.source) AS BIGINT) AS rk,
        |    CAST(a.mass + COALESCE(SUM(b.mass), 0) AS BIGINT) AS cum
        |  FROM m a LEFT JOIN m b
        |    ON (b.mass < a.mass OR (b.mass = a.mass AND b.source < a.source))
        |  GROUP BY a.source, a.mass),
        |t AS (SELECT SUM(mass) AS tot, COUNT(*) AS nsrc FROM m),
        |gn AS (SELECT SUM((2 * rk - nsrc - 1) * mass) AS gnum
        |       FROM r CROSS JOIN t)
        |SELECT r.source, r.mass, r.rk,
        |  CAST(CAST(r.cum AS HUGEINT) * 1000000 // t.tot AS BIGINT) AS cum_ppm,
        |  CAST(CAST(gn.gnum AS HUGEINT) * 1000000 // (t.nsrc * t.tot) AS BIGINT)
        |    AS gini_ppm
        |FROM r CROSS JOIN t CROSS JOIN gn ORDER BY r.rk""".stripMargin,

    "q217_type_fano" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |daily AS (SELECT event_type, day, COUNT(*) AS c0 FROM ev GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev),
        |days AS (SELECT CAST(g.d AS DATE) AS day
        |         FROM b, UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) g(d)),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |cells AS (
        |  SELECT t.event_type, dy.day, COALESCE(d2.c0, 0) AS c
        |  FROM days dy CROSS JOIN ty t
        |  LEFT JOIN daily d2 ON d2.event_type = t.event_type AND d2.day = dy.day),
        |agg AS (
        |  SELECT event_type, COUNT(*) AS n_days, SUM(c) AS s1,
        |    SUM(CAST(c AS HUGEINT) * c) AS s2
        |  FROM cells GROUP BY 1)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(s1 AS BIGINT) AS n_events,
        |  CAST(s1 * 1000000 // n_days AS BIGINT) AS mean_ppm,
        |  CASE WHEN s1 > 0 THEN
        |    CAST((n_days * s2 - CAST(s1 AS HUGEINT) * s1) * 1000000
        |      // (n_days * CAST(s1 AS HUGEINT)) AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS fano_ppm
        |FROM agg ORDER BY event_type""".stripMargin,

    "q218_daily_mad_outliers" ->
      s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
         |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev),
         |days AS (SELECT CAST(g.d AS DATE) AS day
         |         FROM b, UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) g(d)),
         |ty AS (SELECT DISTINCT event_type FROM ev),
         |daily AS (SELECT event_type, day, COUNT(*) AS c0 FROM ev GROUP BY 1, 2),
         |cells AS (
         |  SELECT t.event_type, dy.day, COALESCE(d2.c0, 0) AS c
         |  FROM days dy CROSS JOIN ty t
         |  LEFT JOIN daily d2 ON d2.event_type = t.event_type AND d2.day = dy.day),
         |cg AS (SELECT event_type, c AS v, COUNT(*) AS f FROM cells GROUP BY 1, 2),
         |cn AS (SELECT event_type, SUM(f) AS n FROM cg GROUP BY 1),
         |cb AS (
         |  SELECT a.event_type, a.v, a.f, COALESCE(SUM(b2.f), 0) AS below
         |  FROM cg a LEFT JOIN cg b2
         |    ON b2.event_type = a.event_type AND b2.v < a.v
         |  GROUP BY 1, 2, 3),
         |med AS (
         |  SELECT cb.event_type, cb.v AS med
         |  FROM cb JOIN cn USING (event_type)
         |  WHERE cb.below < (cn.n + 1) // 2 AND (cn.n + 1) // 2 <= cb.below + cb.f),
         |dev AS (
         |  SELECT cells.event_type, abs(cells.c - med.med) AS ad, med.med
         |  FROM cells JOIN med USING (event_type)),
         |dg AS (SELECT event_type, ad AS v, COUNT(*) AS f FROM dev GROUP BY 1, 2),
         |db AS (
         |  SELECT a.event_type, a.v, a.f, COALESCE(SUM(b2.f), 0) AS below
         |  FROM dg a LEFT JOIN dg b2
         |    ON b2.event_type = a.event_type AND b2.v < a.v
         |  GROUP BY 1, 2, 3),
         |mad AS (
         |  SELECT db.event_type, db.v AS mad
         |  FROM db JOIN cn USING (event_type)
         |  WHERE db.below < (cn.n + 1) // 2 AND (cn.n + 1) // 2 <= db.below + db.f)
         |SELECT dev.event_type, dev.med, mad.mad,
         |  COUNT(*) FILTER (WHERE dev.ad > $MadK * mad.mad) AS n_flagged,
         |  CAST(MAX(dev.ad) AS BIGINT) AS max_dev,
         |  CAST(COUNT(*) AS BIGINT) AS n_days
         |FROM dev JOIN mad USING (event_type)
         |GROUP BY 1, 2, 3 ORDER BY dev.event_type""".stripMargin,

    "q219_simpson_diversity" ->
      """WITH cl AS (
        |  SELECT source, lang, COUNT(*) AS nl FROM documents GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, SUM(nl) AS n_docs, COUNT(*) AS n_langs,
        |    SUM(CAST(nl AS HUGEINT) * (nl - 1)) AS num, MAX(nl) AS mx
        |  FROM cl GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_langs AS BIGINT) AS n_langs,
        |  CASE WHEN n_docs > 1 THEN
        |    CAST(num * 1000000 // (CAST(n_docs AS HUGEINT) * (n_docs - 1)) AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS simpson_ppm,
        |  CAST(mx * 1000000 // n_docs AS BIGINT) AS dominant_ppm
        |FROM agg ORDER BY source""".stripMargin,

    "q220_importance_ess" ->
      """WITH w AS (
        |  SELECT source,
        |    LEAST(1000000,
        |      len(string_split(text, ' ')) * 1000000 // 60) AS w
        |  FROM documents),
        |agg AS (
        |  SELECT COALESCE(source, '__all__') AS source,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    SUM(CAST(w AS HUGEINT)) AS sw,
        |    SUM(CAST(w AS HUGEINT) * w) AS sw2
        |  FROM w GROUP BY ROLLUP (source))
        |SELECT source, n_docs,
        |  CAST(sw // n_docs AS BIGINT) AS wmean_ppm,
        |  CASE WHEN sw2 > 0 THEN
        |    CAST(sw * sw * 1000000 // (sw2 * n_docs) AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS ess_ppm
        |FROM agg ORDER BY source""".stripMargin,

    "q221_truncation_loss" ->
      s"""WITH lg AS (
         |  SELECT CAST(g.l AS BIGINT) AS l
         |  FROM UNNEST([${TruncWindows.mkString(", ")}]) g(l)),
         |agg AS (
         |  SELECT source, l,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |    CAST(SUM(GREATEST(n_chars - l, 0)) AS BIGINT) AS lost,
         |    CAST(COUNT(*) FILTER (WHERE n_chars > l) AS BIGINT) AS n_trunc,
         |    CAST(SUM(CASE WHEN n_chars < l THEN l - n_chars ELSE 0 END) AS BIGINT)
         |      AS pad
         |  FROM documents CROSS JOIN lg GROUP BY 1, 2)
         |SELECT source, l, n_docs, n_trunc,
         |  CAST(CAST(lost AS HUGEINT) * 1000000 // total_chars AS BIGINT)
         |    AS trunc_ppm,
         |  CAST(CAST(pad AS HUGEINT) * 1000000 // (n_docs * l) AS BIGINT)
         |    AS pad_ppm
         |FROM agg ORDER BY source, l""".stripMargin,

    "q482_pad_multiple_sweep" ->
      """WITH ms AS (
        |  SELECT CAST(g.m AS BIGINT) AS m FROM UNNEST([8, 64, 512]) g(m)),
        |agg AS (
        |  SELECT source, m,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS payload,
        |    CAST(SUM(((n_chars + m - 1) // m) * m) AS BIGINT) AS padded
        |  FROM documents CROSS JOIN ms GROUP BY 1, 2)
        |SELECT source, m, n_docs, payload, padded,
        |  CAST(CAST(padded - payload AS HUGEINT) * 1000000 // padded
        |    AS BIGINT) AS waste_ppm
        |FROM agg ORDER BY source, m""".stripMargin,

    "q222_posting_buckets" ->
      ("""WITH """ + BigramSql +
        """,
          |df AS (SELECT bg, COUNT(*) AS df
          |       FROM (SELECT DISTINCT doc_id, bg FROM bg) x GROUP BY 1),
          |pw AS (SELECT CAST(1::BIGINT << g.i AS BIGINT) AS lo
          |       FROM UNNEST(generate_series(0, 31)) g(i)),
          |bk AS (
          |  SELECT pw.lo, COUNT(*) AS nt, SUM(df.df) AS po
          |  FROM df JOIN pw ON df.df >= pw.lo AND df.df < pw.lo * 2
          |  GROUP BY 1),
          |t AS (SELECT COUNT(*) AS t_types, SUM(df) AS t_post FROM df)
          |SELECT pw.lo AS bucket_lo,
          |  CAST(COALESCE(bk.nt, 0) AS BIGINT) AS n_types,
          |  CAST(COALESCE(bk.po, 0) AS BIGINT) AS postings,
          |  CAST(COALESCE(bk.nt, 0) * 1000000 // t.t_types AS BIGINT)
          |    AS types_share_ppm,
          |  CAST(COALESCE(bk.po, 0) * 1000000 // t.t_post AS BIGINT)
          |    AS post_share_ppm
          |FROM pw LEFT JOIN bk USING (lo) CROSS JOIN t
          |ORDER BY bucket_lo""").stripMargin,

    "q223_oov_rate" ->
      s"""WITH toks AS (
         |  SELECT source, lang, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |vocab AS (SELECT lang, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
         |topk AS (
         |  SELECT lang, tok FROM (
         |    SELECT lang, tok,
         |      row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rn
         |    FROM vocab) v
         |  WHERE rn <= $OovTopK)
         |SELECT t.source, t.lang,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) FILTER (WHERE k.tok IS NULL) AS BIGINT) AS n_oov,
         |  CAST(COUNT(*) FILTER (WHERE k.tok IS NULL) * 1000000
         |    // COUNT(*) AS BIGINT) AS oov_ppm
         |FROM toks t LEFT JOIN topk k ON k.lang = t.lang AND k.tok = t.tok
         |GROUP BY 1, 2 ORDER BY t.source, t.lang""".stripMargin,

    "q230_path_trigrams" ->
      """WITH p AS (
        |  SELECT event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |tri AS (
        |  SELECT t1, t2, t3, COUNT(*) AS n FROM p
        |  WHERE t3 IS NOT NULL GROUP BY 1, 2, 3),
        |t AS (SELECT SUM(n) AS t_tri FROM tri)
        |SELECT t1, t2, t3, CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000000 // t.t_tri AS BIGINT) AS share_ppm
        |FROM tri CROSS JOIN t
        |ORDER BY n DESC, t1, t2, t3 LIMIT 10""".stripMargin,

    "q233_pq_codebook" ->
      """WITH el AS (
        |  SELECT vec_id, g.i - 1 AS i, (g.i - 1) // 32 AS ss,
        |    CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
        |      AS q3
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) g(i)),
        |cid AS (SELECT vec_id AS cid FROM embeddings ORDER BY vec_id LIMIT 4),
        |cent AS (SELECT c.cid, e.i, e.q3 AS c3
        |         FROM el e JOIN cid c ON e.vec_id = c.cid),
        |dist AS (
        |  SELECT e.vec_id, e.ss, c.cid,
        |    SUM((e.q3 - c.c3) * (e.q3 - c.c3)) AS d2
        |  FROM el e JOIN cent c USING (i) GROUP BY 1, 2, 3),
        |md AS (SELECT vec_id, ss, MIN(d2) AS md FROM dist GROUP BY 1, 2),
        |best AS (
        |  SELECT d.vec_id, d.ss, m.md, MIN(d.cid) AS code
        |  FROM dist d JOIN md m
        |    ON d.vec_id = m.vec_id AND d.ss = m.ss AND d.d2 = m.md
        |  GROUP BY 1, 2, 3),
        |codes AS (
        |  SELECT vec_id,
        |    MAX(CASE WHEN ss = 0 THEN code END) AS code0,
        |    MAX(CASE WHEN ss = 1 THEN code END) AS code1,
        |    SUM(md) AS qerr
        |  FROM best GROUP BY 1),
        |grid AS (SELECT a.cid AS code0, b.cid AS code1
        |         FROM cid a CROSS JOIN cid b),
        |cc AS (SELECT code0, code1, COUNT(*) AS nv, SUM(qerr) AS qe
        |       FROM codes GROUP BY 1, 2),
        |t AS (SELECT COUNT(*) AS tv FROM embeddings)
        |SELECT g.code0, g.code1,
        |  CAST(COALESCE(cc.nv, 0) AS BIGINT) AS n_vecs,
        |  CAST(COALESCE(cc.qe, 0) AS BIGINT) AS qerr_u,
        |  CAST(COALESCE(cc.nv, 0) * 1000000 // t.tv AS BIGINT) AS share_ppm
        |FROM grid g LEFT JOIN cc USING (code0, code1) CROSS JOIN t
        |ORDER BY g.code0, g.code1""".stripMargin,

    "q235_event_disorder" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS tu,
        |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM events),
        |dd AS (
        |  SELECT event_type,
        |    CASE WHEN pm IS NOT NULL AND pm > tu THEN pm - tu ELSE 0 END AS depth
        |  FROM e),
        |agg AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) FILTER (WHERE depth > 0) AS BIGINT) AS n_late,
        |    CAST(MAX(depth) AS BIGINT) AS max_depth_us,
        |    SUM(CAST(depth AS HUGEINT)) AS sd
        |  FROM dd GROUP BY 1)
        |SELECT event_type, n_events, n_late,
        |  CAST(n_late * 1000000 // n_events AS BIGINT) AS late_ppm,
        |  max_depth_us, CAST(sd AS BIGINT) AS sum_depth_us
        |FROM agg ORDER BY event_type""".stripMargin,

    "q236_rfm_octants" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |mx AS (SELECT MAX(day) AS mx FROM ev),
        |u AS (
        |  SELECT user_id,
        |    CAST(MIN(date_diff('day', day, mx.mx)) AS BIGINT) AS r,
        |    CAST(COUNT(*) AS BIGINT) AS f,
        |    CAST(SUM(cents) AS BIGINT) AS m
        |  FROM ev CROSS JOIN mx GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n, SUM(r) AS sr, SUM(f) AS sf, SUM(m) AS sm
        |      FROM u),
        |seg AS (
        |  SELECT CASE WHEN u.r * t.n <= t.sr THEN 1 ELSE 0 END AS recent,
        |    CASE WHEN u.f * t.n >= t.sf THEN 1 ELSE 0 END AS frequent,
        |    CASE WHEN u.m * t.n >= t.sm THEN 1 ELSE 0 END AS monetary
        |  FROM u CROSS JOIN t),
        |cnt AS (SELECT recent, frequent, monetary, COUNT(*) AS nu
        |        FROM seg GROUP BY 1, 2, 3),
        |bits AS (SELECT g.b AS b FROM UNNEST(generate_series(0, 1)) g(b)),
        |grid AS (
        |  SELECT CAST(a.b AS BIGINT) AS recent, CAST(b2.b AS BIGINT) AS frequent,
        |    CAST(c.b AS BIGINT) AS monetary
        |  FROM bits a CROSS JOIN bits b2 CROSS JOIN bits c),
        |nt AS (SELECT COUNT(*) AS nt FROM u)
        |SELECT g.recent, g.frequent, g.monetary,
        |  CAST(COALESCE(cnt.nu, 0) AS BIGINT) AS n_users,
        |  CAST(COALESCE(cnt.nu, 0) * 1000000 // nt.nt AS BIGINT) AS share_ppm
        |FROM grid g LEFT JOIN cnt USING (recent, frequent, monetary)
        |CROSS JOIN nt ORDER BY g.recent, g.frequent, g.monetary""".stripMargin,

    "q237_type_crosscorr" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev),
        |days AS (
        |  SELECT CAST(date_diff('day', mn, CAST(g.d AS DATE)) AS BIGINT) AS di,
        |    CAST(g.d AS DATE) AS day
        |  FROM b, UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) g(d)),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |daily AS (SELECT event_type, day, COUNT(*) AS c0 FROM ev GROUP BY 1, 2),
        |cells AS (
        |  SELECT t.event_type, dy.di, COALESCE(d2.c0, 0) AS c
        |  FROM days dy CROSS JOIN ty t
        |  LEFT JOIN daily d2 ON d2.event_type = t.event_type AND d2.day = dy.day),
        |lags AS (SELECT CAST(g.l AS BIGINT) AS lag
        |         FROM UNNEST(generate_series(0, 7)) g(l)),
        |raw AS (
        |  SELECT a.event_type AS t_from, b2.event_type AS t_to, l.lag,
        |    SUM(CAST(a.c AS HUGEINT) * b2.c) AS raw_d
        |  FROM cells a CROSS JOIN lags l
        |  JOIN cells b2 ON b2.di = a.di + l.lag
        |    AND b2.event_type <> a.event_type
        |  GROUP BY 1, 2, 3),
        |base AS (SELECT t_from, t_to, raw_d AS raw0 FROM raw WHERE lag = 0)
        |SELECT r.t_from, r.t_to, r.lag, CAST(r.raw_d AS BIGINT) AS raw,
        |  CASE WHEN b3.raw0 > 0
        |    THEN CAST(r.raw_d * 1000000 // b3.raw0 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS ratio_ppm
        |FROM raw r JOIN base b3 USING (t_from, t_to)
        |ORDER BY r.t_from, r.t_to, r.lag""".stripMargin,

    "q238_emd_lengths" ->
      """WITH g AS (
        |  SELECT source, n_chars, COUNT(*) AS f0
        |  FROM documents GROUP BY 1, 2),
        |gv AS (
        |  SELECT n_chars,
        |    SUM(fa) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all,
        |    COALESCE(lead(n_chars) OVER (ORDER BY n_chars) - n_chars, 0) AS dv
        |  FROM (SELECT n_chars, COUNT(*) AS fa FROM documents GROUP BY 1) v),
        |srcs AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY 1),
        |fl AS (
        |  SELECT s.source, s.ns, gv.n_chars, gv.cum_all, gv.dv,
        |    COALESCE(g.f0, 0) AS f
        |  FROM srcs s CROSS JOIN gv
        |  LEFT JOIN g ON g.source = s.source AND g.n_chars = gv.n_chars),
        |cs AS (
        |  SELECT source, ns, n_chars, cum_all, dv,
        |    SUM(f) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
        |  FROM fl),
        |t AS (SELECT COUNT(*) AS n_all FROM documents)
        |SELECT cs.source, CAST(cs.ns AS BIGINT) AS n_docs,
        |  CAST(SUM(abs(cs.cum_s * 1000000 // cs.ns
        |    - (cs.cum_all - cs.cum_s) * 1000000 // (t.n_all - cs.ns)) * cs.dv)
        |    AS BIGINT) AS emd_u,
        |  CAST(SUM(abs(cs.cum_s * 1000000 // cs.ns
        |    - (cs.cum_all - cs.cum_s) * 1000000 // (t.n_all - cs.ns)) * cs.dv)
        |    // (MAX(cs.n_chars) - MIN(cs.n_chars)) AS BIGINT) AS emd_ppm
        |FROM cs CROSS JOIN t
        |GROUP BY cs.source, cs.ns ORDER BY cs.source""".stripMargin,

    "q239_weekday_anova" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |b AS (SELECT MIN(day) AS mn FROM ev),
        |days AS (
        |  SELECT CAST(g.d AS DATE) AS day,
        |    CAST(date_diff('day', mn, CAST(g.d AS DATE)) % 7 AS BIGINT) AS wd
        |  FROM b, UNNEST(generate_series(mn, CAST(mn + INTERVAL 27 DAY AS DATE),
        |    INTERVAL 1 DAY)) g(d)),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |daily AS (SELECT event_type, day, COUNT(*) AS c0 FROM ev GROUP BY 1, 2),
        |cells AS (
        |  SELECT t.event_type, dy.wd, COALESCE(d2.c0, 0) AS c
        |  FROM days dy CROSS JOIN ty t
        |  LEFT JOIN daily d2 ON d2.event_type = t.event_type AND d2.day = dy.day),
        |bywd AS (SELECT event_type, wd, SUM(c) AS tg FROM cells GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, SUM(c) AS t,
        |    SUM(CAST(c AS HUGEINT) * c) AS s2
        |  FROM cells GROUP BY 1),
        |sg AS (SELECT event_type, SUM(CAST(tg AS HUGEINT) * tg) AS stg2
        |       FROM bywd GROUP BY 1)
        |SELECT a.event_type, CAST(a.t AS BIGINT) AS n_events_28d,
        |  CASE WHEN 28 * a.s2 - CAST(a.t AS HUGEINT) * a.t > 0
        |    THEN CAST((7 * sg.stg2 - CAST(a.t AS HUGEINT) * a.t) * 1000000
        |      // (28 * a.s2 - CAST(a.t AS HUGEINT) * a.t) AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS eta2_ppm
        |FROM agg a JOIN sg USING (event_type)
        |ORDER BY a.event_type""".stripMargin,

    "q240_mutual_nn_sources" ->
      """WITH st AS (
        |  SELECT DISTINCT source, tok FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) x),
        |sizes AS (SELECT source, COUNT(*) AS nv FROM st GROUP BY 1),
        |inter AS (
        |  SELECT a.source, b.source AS s2, COUNT(*) AS ix
        |  FROM st a JOIN st b ON a.tok = b.tok AND a.source <> b.source
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT i.source, i.s2,
        |    CAST(i.ix * 1000000 // (sa.nv + sb.nv - i.ix) AS BIGINT) AS j_ppm
        |  FROM inter i
        |  JOIN sizes sa ON sa.source = i.source
        |  JOIN sizes sb ON sb.source = i.s2),
        |mj AS (SELECT source, MAX(j_ppm) AS mj FROM jac GROUP BY 1),
        |nn AS (
        |  SELECT j.source, m.mj, MIN(j.s2) AS nn
        |  FROM jac j JOIN mj m ON j.source = m.source AND j.j_ppm = m.mj
        |  GROUP BY 1, 2)
        |SELECT n1.source, n1.nn, n1.mj AS j_ppm,
        |  CAST(CASE WHEN n2.nn = n1.source THEN 1 ELSE 0 END AS BIGINT) AS mutual
        |FROM nn n1 LEFT JOIN nn n2 ON n2.source = n1.nn
        |ORDER BY n1.source""".stripMargin,

    "q241_bigram_lm_accuracy" ->
      """WITH t0 AS (SELECT doc_id, lang, string_split(text, ' ') AS t
        |            FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, t[g.i] AS w1, t[g.i + 1] AS w2
        |  FROM t0, UNNEST(generate_series(1, len(t) - 1)) g(i)
        |  WHERE len(t) >= 2),
        |tc AS (SELECT w1, w2, COUNT(*) AS c FROM bg
        |       WHERE doc_id % 3 = 0 GROUP BY 1, 2),
        |mxc AS (SELECT w1, MAX(c) AS mc FROM tc GROUP BY 1),
        |model AS (
        |  SELECT tc.w1, MIN(tc.w2) AS pred
        |  FROM tc JOIN mxc ON tc.w1 = mxc.w1 AND tc.c = mxc.mc
        |  GROUP BY 1),
        |test AS (SELECT lang, w1, w2 FROM bg WHERE doc_id % 3 <> 0)
        |SELECT t.lang, CAST(COUNT(*) AS BIGINT) AS n_pos,
        |  CAST(COUNT(*) FILTER (WHERE m.pred IS NOT NULL) * 1000000
        |    // COUNT(*) AS BIGINT) AS coverage_ppm,
        |  CAST(COUNT(*) FILTER (WHERE m.pred = t.w2) * 1000000
        |    // COUNT(*) AS BIGINT) AS acc_ppm
        |FROM test t LEFT JOIN model m USING (w1)
        |GROUP BY 1 ORDER BY t.lang""".stripMargin,

    "q242_churn_labels" ->
      """WITH mn AS (SELECT MIN(CAST(ts AS DATE)) AS mn FROM events),
        |ev AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', mn.mn, CAST(ts AS DATE)) AS BIGINT) AS di
        |  FROM events CROSS JOIN mn),
        |u AS (
        |  SELECT user_id,
        |    CAST(COUNT(*) FILTER (WHERE di <= 20) AS BIGINT) AS f_events,
        |    CASE WHEN COUNT(*) FILTER (WHERE di >= 21) > 0 THEN 1 ELSE 0 END
        |      AS active
        |  FROM ev WHERE di < 28 GROUP BY 1
        |  HAVING COUNT(*) FILTER (WHERE di <= 20) > 0),
        |pw AS (SELECT CAST(1::BIGINT << g.i AS BIGINT) AS lo
        |       FROM UNNEST(generate_series(0, 11)) g(i)),
        |bk AS (
        |  SELECT pw.lo, COUNT(*) AS nu, SUM(u.active) AS na
        |  FROM u JOIN pw ON u.f_events >= pw.lo AND u.f_events < pw.lo * 2
        |  GROUP BY 1)
        |SELECT pw.lo AS bucket_lo,
        |  CAST(COALESCE(bk.nu, 0) AS BIGINT) AS n_users,
        |  CAST(COALESCE(bk.na, 0) AS BIGINT) AS n_retained,
        |  CASE WHEN COALESCE(bk.nu, 0) > 0
        |    THEN CAST((bk.nu - bk.na) * 1000000 // bk.nu AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS churn_ppm
        |FROM pw LEFT JOIN bk USING (lo) ORDER BY bucket_lo""".stripMargin,

    "q243_dau_wau_stickiness" ->
      """WITH mn AS (SELECT MIN(CAST(ts AS DATE)) AS mn FROM events),
        |ev AS (
        |  SELECT event_type, user_id,
        |    CAST(date_diff('day', mn.mn, CAST(ts AS DATE)) AS BIGINT) AS di
        |  FROM events CROSS JOIN mn),
        |f AS (SELECT * FROM ev WHERE di < 28),
        |dau AS (
        |  SELECT event_type, CAST(SUM(du) AS BIGINT) AS sum_dau FROM (
        |    SELECT event_type, di, COUNT(DISTINCT user_id) AS du
        |    FROM f GROUP BY 1, 2) x GROUP BY 1),
        |wau AS (
        |  SELECT event_type, CAST(SUM(wu) AS BIGINT) AS sum_wau FROM (
        |    SELECT event_type, di // 7 AS wk, COUNT(DISTINCT user_id) AS wu
        |    FROM f GROUP BY 1, 2) x GROUP BY 1)
        |SELECT d.event_type, d.sum_dau, w.sum_wau,
        |  CAST(d.sum_dau * 1000000 // (7 * w.sum_wau) AS BIGINT)
        |    AS stickiness_ppm
        |FROM dau d JOIN wau w USING (event_type)
        |ORDER BY d.event_type""".stripMargin,

    "q244_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sizes AS (SELECT event_type, COUNT(*) AS nu FROM ut GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS ix
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type
        |  GROUP BY 1, 2),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |grid AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM ty a CROSS JOIN ty b WHERE a.event_type <> b.event_type)
        |SELECT g.ta, g.tb,
        |  CAST(COALESCE(p.ix, 0) AS BIGINT) AS n_both,
        |  CAST(COALESCE(p.ix, 0) * 1000000
        |    // (sa.nu + sb.nu - COALESCE(p.ix, 0)) AS BIGINT) AS jaccard_ppm,
        |  CAST(COALESCE(p.ix, 0) * 1000000 // sa.nu AS BIGINT)
        |    AS containment_ppm
        |FROM grid g LEFT JOIN pairs p USING (ta, tb)
        |JOIN sizes sa ON sa.event_type = g.ta
        |JOIN sizes sb ON sb.event_type = g.tb
        |ORDER BY g.ta, g.tb""".stripMargin,

    "q245_positional_drift" ->
      """WITH pos AS (
        |  SELECT lang, t[g.i] AS tok,
        |    CASE WHEN (g.i - 1) * 2 < len(t) THEN 1 ELSE 0 END AS h1
        |  FROM (SELECT lang, string_split(text, ' ') AS t FROM documents) x,
        |    UNNEST(generate_series(1, len(t))) g(i)),
        |cell AS (
        |  SELECT lang, tok, SUM(h1) AS c1, SUM(1 - h1) AS c2
        |  FROM pos GROUP BY 1, 2),
        |tot AS (SELECT lang, SUM(c1) AS n1, SUM(c2) AS n2 FROM cell GROUP BY 1)
        |SELECT c.lang, CAST(t.n1 AS BIGINT) AS n_first,
        |  CAST(t.n2 AS BIGINT) AS n_second,
        |  CAST(SUM(abs(c.c1 * 1000000 // t.n1 - c.c2 * 1000000 // t.n2)) // 2
        |    AS BIGINT) AS tvd_ppm
        |FROM cell c JOIN tot t USING (lang)
        |GROUP BY c.lang, t.n1, t.n2 ORDER BY c.lang""".stripMargin,

    "q246_funnel_latency" ->
      """WITH fv AS (
        |  SELECT user_id, MIN(ts) AS vts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id,
        |    CAST(date_diff('day', CAST(MIN(f.vts) AS DATE),
        |      CAST(MIN(e.ts) AS DATE)) AS BIGINT) AS delta
        |  FROM events e JOIN fv f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= f.vts
        |  GROUP BY 1),
        |grid AS (SELECT delta, COUNT(*) AS f FROM conv GROUP BY 1),
        |below AS (
        |  SELECT a.delta, a.f, COALESCE(SUM(b.f), 0) AS below
        |  FROM grid a LEFT JOIN grid b ON b.delta < a.delta
        |  GROUP BY 1, 2),
        |n AS (SELECT SUM(f) AS n FROM grid),
        |qg AS (SELECT CAST(CASE WHEN g.i = 0 THEN 50 ELSE 90 END AS BIGINT) AS q
        |       FROM UNNEST(generate_series(0, 1)) g(i))
        |SELECT qg.q, b2.delta AS delta_days, CAST(n.n AS BIGINT) AS n_converted
        |FROM below b2 CROSS JOIN n CROSS JOIN qg
        |WHERE b2.below < (qg.q * n.n + 99) // 100
        |  AND (qg.q * n.n + 99) // 100 <= b2.below + b2.f
        |ORDER BY qg.q""".stripMargin,

    "q247_revenue_concentration" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |pw AS (SELECT CAST(1::BIGINT << g.i AS BIGINT) AS lo
        |       FROM UNNEST(generate_series(0, 39)) g(i)),
        |bk AS (
        |  SELECT pw.lo, COUNT(*) AS nc, SUM(CAST(rev AS HUGEINT)) AS rv
        |  FROM cust JOIN pw ON cust.rev >= pw.lo AND cust.rev < pw.lo * 2
        |  GROUP BY 1),
        |fl AS (
        |  SELECT pw.lo, COALESCE(bk.nc, 0) AS nc,
        |    COALESCE(bk.rv, CAST(0 AS HUGEINT)) AS rv
        |  FROM pw LEFT JOIN bk USING (lo)),
        |t AS (SELECT SUM(rv) AS t_rev, SUM(nc) AS t_cust FROM fl),
        |cum AS (
        |  SELECT a.lo, a.nc, a.rv, SUM(b.rv) AS cum_top
        |  FROM fl a JOIN fl b ON b.lo >= a.lo
        |  GROUP BY 1, 2, 3)
        |SELECT c.lo AS bucket_lo, CAST(c.nc AS BIGINT) AS n_cust,
        |  CAST(c.rv AS BIGINT) AS rev_c,
        |  CASE WHEN t.t_rev > 0 THEN CAST(c.cum_top * 1000000 // t.t_rev AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS cum_from_top_ppm,
        |  CAST(CASE WHEN t.t_rev > 0
        |      AND c.cum_top * 1000000 // t.t_rev >= 800000
        |    THEN 1 ELSE 0 END AS BIGINT) AS covers_80
        |FROM cum c CROSS JOIN t ORDER BY c.lo""".stripMargin,

    "q248_cramers_v2" ->
      """WITH cell AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, SUM(obs) AS row_tot FROM cell GROUP BY 1),
        |ct AS (SELECT source, SUM(obs) AS col_tot FROM cell GROUP BY 1),
        |g AS (SELECT SUM(obs) AS n_tot, COUNT(DISTINCT lang) AS r,
        |        COUNT(DISTINCT source) AS c FROM cell),
        |contrib AS (
        |  SELECT g.n_tot, g.r, g.c,
        |    CAST(round(
        |      CAST(CAST(cell.obs AS HUGEINT) * g.n_tot
        |        - CAST(rt.row_tot AS HUGEINT) * ct.col_tot AS DOUBLE) *
        |      CAST(CAST(cell.obs AS HUGEINT) * g.n_tot
        |        - CAST(rt.row_tot AS HUGEINT) * ct.col_tot AS DOUBLE) /
        |      CAST(CAST(rt.row_tot AS HUGEINT) * ct.col_tot AS DOUBLE) /
        |      CAST(g.n_tot AS DOUBLE) * 1000000) AS BIGINT) AS contrib_e6
        |  FROM cell JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN g)
        |SELECT CAST(n_tot AS BIGINT) AS n_docs, CAST(r AS BIGINT) AS n_langs,
        |  CAST(c AS BIGINT) AS n_sources,
        |  CAST(SUM(contrib_e6) AS BIGINT) AS chi2_e6,
        |  CAST(SUM(contrib_e6) // (n_tot * LEAST(r - 1, c - 1)) AS BIGINT)
        |    AS v2_ppm
        |FROM contrib GROUP BY n_tot, r, c""".stripMargin,

    "q249_embedding_sanity" ->
      """WITH q AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    (SELECT SUM(CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
        |       * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
        |     FROM UNNEST(embedding) AS t(x)) AS norm2_u,
        |    md5(array_to_string(list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)), ','))
        |      AS qh
        |  FROM embeddings)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(COUNT(*) FILTER (WHERE norm2_u < 1000) AS BIGINT) AS n_near_zero,
        |  CAST(COUNT(*) - COUNT(DISTINCT qh) AS BIGINT) AS n_dups,
        |  CAST(MAX(norm2_u) AS BIGINT) AS max_norm2_u,
        |  CAST(MIN(norm2_u) AS BIGINT) AS min_norm2_u
        |FROM q GROUP BY 1 ORDER BY label""".stripMargin,

    "q250_mask_plan" ->
      """WITH pos AS (
        |  SELECT doc_id, source, g.i - 1 AS i,
        |    CASE WHEN ('0x' || substr(md5('mask:' || CAST(doc_id AS VARCHAR)
        |      || ':' || CAST(g.i - 1 AS VARCHAR)), 1, 8))::BIGINT % 100 < 15
        |      THEN 1 ELSE 0 END AS masked
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS t
        |        FROM documents) x,
        |    UNNEST(generate_series(1, len(t))) g(i)),
        |sp AS (
        |  SELECT doc_id, source,
        |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS island
        |  FROM pos WHERE masked = 1),
        |spans AS (
        |  SELECT source, COUNT(*) AS n_spans FROM (
        |    SELECT source, doc_id, island FROM sp GROUP BY 1, 2, 3) y
        |  GROUP BY 1),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(masked) AS BIGINT) AS n_masked
        |  FROM pos GROUP BY 1)
        |SELECT a.source, a.n_tokens, a.n_masked,
        |  CAST(a.n_masked * 1000000 // a.n_tokens AS BIGINT) AS mask_ppm,
        |  CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS n_spans,
        |  CASE WHEN COALESCE(s.n_spans, 0) > 0
        |    THEN CAST(a.n_masked * 1000000 // s.n_spans AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS mean_span_utok
        |FROM agg a LEFT JOIN spans s USING (source)
        |ORDER BY a.source""".stripMargin,

    "q253_clipped_ngram_precision" ->
      """WITH t0 AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |u AS (
        |  SELECT source, t[g.i] AS g, CAST(1 AS BIGINT) AS n
        |  FROM t0, UNNEST(generate_series(1, len(t))) g(i)),
        |b AS (
        |  SELECT source, t[g.i] || ' ' || t[g.i + 1] AS g, CAST(2 AS BIGINT) AS n
        |  FROM t0, UNNEST(generate_series(1, len(t) - 1)) g(i)
        |  WHERE len(t) >= 2),
        |cell AS (
        |  SELECT source, n, g, COUNT(*) AS cs
        |  FROM (SELECT * FROM u UNION ALL SELECT * FROM b) x
        |  GROUP BY 1, 2, 3),
        |gt AS (SELECT n, g, SUM(cs) AS ct FROM cell GROUP BY 1, 2)
        |SELECT c.source, c.n,
        |  CAST(SUM(c.cs) AS BIGINT) AS total_grams,
        |  CAST(SUM(LEAST(c.cs, gl.ct - c.cs)) AS BIGINT) AS clipped,
        |  CAST(SUM(LEAST(c.cs, gl.ct - c.cs)) * 1000000 // SUM(c.cs) AS BIGINT)
        |    AS prec_ppm
        |FROM cell c JOIN gt gl USING (n, g)
        |GROUP BY 1, 2 ORDER BY c.source, c.n""".stripMargin,

    "q254_shared_ngram_ladder" ->
      """WITH t0 AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |g2 AS (
        |  SELECT DISTINCT source, md5(array_to_string(t[g.i:g.i+1], ' ')) AS h
        |  FROM t0, UNNEST(generate_series(1, len(t) - 1)) g(i)
        |  WHERE len(t) >= 2),
        |g4 AS (
        |  SELECT DISTINCT source, md5(array_to_string(t[g.i:g.i+3], ' ')) AS h
        |  FROM t0, UNNEST(generate_series(1, len(t) - 3)) g(i)
        |  WHERE len(t) >= 4),
        |g8 AS (
        |  SELECT DISTINCT source, md5(array_to_string(t[g.i:g.i+7], ' ')) AS h
        |  FROM t0, UNNEST(generate_series(1, len(t) - 7)) g(i)
        |  WHERE len(t) >= 8),
        |p2 AS (SELECT DISTINCT a.source, b.source AS s2 FROM g2 a
        |       JOIN g2 b ON a.h = b.h AND b.source > a.source),
        |p4 AS (SELECT DISTINCT a.source, b.source AS s2 FROM g4 a
        |       JOIN g4 b ON a.h = b.h AND b.source > a.source),
        |p8 AS (SELECT DISTINCT a.source, b.source AS s2 FROM g8 a
        |       JOIN g8 b ON a.h = b.h AND b.source > a.source),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |pairs AS (SELECT a.source, b.source AS s2 FROM srcs a
        |          JOIN srcs b ON b.source > a.source)
        |SELECT p.source, p.s2,
        |  CAST(CASE WHEN p2.source IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS has2,
        |  CAST(CASE WHEN p4.source IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS has4,
        |  CAST(CASE WHEN p8.source IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS has8,
        |  CAST(CASE WHEN p8.source IS NOT NULL THEN 8
        |    WHEN p4.source IS NOT NULL THEN 4
        |    WHEN p2.source IS NOT NULL THEN 2 ELSE 0 END AS BIGINT)
        |    AS max_shared_n
        |FROM pairs p
        |LEFT JOIN p2 USING (source, s2)
        |LEFT JOIN p4 USING (source, s2)
        |LEFT JOIN p8 USING (source, s2)
        |ORDER BY p.source, p.s2""".stripMargin,

    "q257_seq2_support" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
        |  FROM events),
        |mt AS (SELECT user_id, event_type, MIN(tu) AS mt
        |       FROM ev GROUP BY 1, 2),
        |fst AS (
        |  SELECT e.user_id, e.event_type, m.mt, MIN(e.event_id) AS me
        |  FROM ev e JOIN mt m ON e.user_id = m.user_id
        |    AND e.event_type = m.event_type AND e.tu = m.mt
        |  GROUP BY 1, 2, 3),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    COUNT(*) AS n_both,
        |    COUNT(*) FILTER (WHERE a.mt < b.mt
        |      OR (a.mt = b.mt AND a.me < b.me)) AS n_first
        |  FROM fst a JOIN fst b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type
        |  GROUP BY 1, 2),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT a.event_type AS ta, b.event_type AS tb
        |         FROM ty a CROSS JOIN ty b WHERE a.event_type <> b.event_type)
        |SELECT g.ta, g.tb,
        |  CAST(COALESCE(p.n_both, 0) AS BIGINT) AS n_both,
        |  CAST(COALESCE(p.n_first, 0) AS BIGINT) AS n_a_first,
        |  CASE WHEN COALESCE(p.n_both, 0) > 0
        |    THEN CAST(COALESCE(p.n_first, 0) * 1000000 // p.n_both AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS support_ppm
        |FROM grid g LEFT JOIN pairs p USING (ta, tb)
        |ORDER BY g.ta, g.tb""".stripMargin,

    "q258_hazard_table" ->
      """WITH b AS (SELECT MAX(CAST(ts AS DATE)) AS emax FROM events),
        |life AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
        |      AS BIGINT) AS t,
        |    MAX(CASE WHEN CAST(ts AS DATE) = b.emax THEN 1 ELSE 0 END)
        |      AS censored
        |  FROM events CROSS JOIN b GROUP BY 1),
        |grid AS (
        |  SELECT t, COUNT(*) AS f,
        |    COUNT(*) FILTER (WHERE censored = 0) AS d,
        |    COUNT(*) FILTER (WHERE censored = 1) AS c
        |  FROM life GROUP BY 1),
        |ar AS (
        |  SELECT a.t, a.d, a.c, SUM(b2.f) AS n_at_risk
        |  FROM grid a JOIN grid b2 ON b2.t >= a.t
        |  GROUP BY 1, 2, 3)
        |SELECT t AS lifetime_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  CAST(d AS BIGINT) AS n_churned, CAST(c AS BIGINT) AS n_censored,
        |  CAST(d * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm
        |FROM ar ORDER BY lifetime_days""".stripMargin,

    "q261_asof_tolerance" ->
      """WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, MAX(event_id) AS event_id
        |      FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        |m AS (
        |  SELECT l.event_id, l.user_id,
        |    epoch_us(CAST(l.ts AS TIMESTAMP)) AS purchase_us,
        |    epoch_us(CAST(r.ts AS TIMESTAMP)) AS raw_asof
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts >= r.ts)
        |SELECT event_id, user_id, purchase_us,
        |  CASE WHEN purchase_us - raw_asof <= 3600000000 THEN raw_asof END
        |    AS asof_us,
        |  CASE WHEN purchase_us - raw_asof <= 3600000000
        |    THEN purchase_us - raw_asof END AS gap_us,
        |  CAST(CASE WHEN raw_asof IS NULL THEN 0
        |    WHEN purchase_us - raw_asof <= 3600000000 THEN 1
        |    ELSE 2 END AS BIGINT) AS match_state
        |FROM m ORDER BY event_id""".stripMargin,

    "q262_watermark_sizing" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS tu,
        |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM events),
        |dp AS (
        |  SELECT event_type,
        |    CASE WHEN pm IS NOT NULL AND pm > tu
        |      THEN (pm - tu) // 1000000 ELSE 0 END AS depth_s
        |  FROM e),
        |grid AS (SELECT event_type, depth_s, COUNT(*) AS f
        |         FROM dp GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, depth_s, f,
        |    COALESCE(SUM(f) OVER (PARTITION BY event_type ORDER BY depth_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM grid),
        |n AS (SELECT event_type, SUM(f) AS n FROM grid GROUP BY 1),
        |qg AS (SELECT CAST(CASE WHEN g.i = 0 THEN 990 ELSE 999 END AS BIGINT)
        |         AS qpm
        |       FROM UNNEST(generate_series(0, 1)) g(i))
        |SELECT c.event_type, qg.qpm, c.depth_s AS delay_s,
        |  CAST(n.n AS BIGINT) AS n_events
        |FROM cum c JOIN n USING (event_type) CROSS JOIN qg
        |WHERE c.below < (qg.qpm * n.n + 999) // 1000
        |  AND (qg.qpm * n.n + 999) // 1000 <= c.below + c.f
        |ORDER BY c.event_type, qg.qpm""".stripMargin,

    "q263_copurchase_triangles" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
        |  FROM lineitem),
        |ok AS (SELECT okey FROM items GROUP BY okey HAVING COUNT(*) <= 32),
        |it AS (SELECT i.okey, i.part FROM items i JOIN ok USING (okey)),
        |edges AS (
        |  SELECT a.part AS a, b.part AS b
        |  FROM it a JOIN it b ON a.okey = b.okey AND a.part < b.part
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (
        |  SELECT v, COUNT(*) AS dg FROM (
        |    SELECT a AS v FROM edges UNION ALL SELECT b FROM edges) x
        |  GROUP BY 1),
        |w AS (SELECT SUM(dg * (dg - 1) // 2) AS n_wedges,
        |        COUNT(*) AS n_vertices FROM deg),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM edges e1
        |  JOIN edges e2 ON e2.a = e1.b
        |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
        |ne AS (SELECT COUNT(*) AS n_edges FROM edges)
        |SELECT CAST(w.n_vertices AS BIGINT) AS n_vertices,
        |  CAST(ne.n_edges AS BIGINT) AS n_edges,
        |  CAST(w.n_wedges AS BIGINT) AS n_wedges,
        |  CAST(tri.n_triangles AS BIGINT) AS n_triangles,
        |  CASE WHEN w.n_wedges > 0
        |    THEN CAST(3 * tri.n_triangles * 1000000 // w.n_wedges AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS closure_ppm
        |FROM w CROSS JOIN ne CROSS JOIN tri""".stripMargin,

    "q460_watermark_completeness" ->
      """WITH late AS (
        |  SELECT event_type,
        |    CASE WHEN hwm IS NOT NULL AND hwm > us
        |         THEN (hwm - us) // 1000000 ELSE 0 END AS late_s
        |  FROM (
        |    SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |      MAX(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |        PARTITION BY event_type ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |    FROM events) z),
        |ds AS (SELECT CAST(d.d AS BIGINT) AS watermark_s
        |       FROM UNNEST([60, 3600, 86400]) AS d(d))
        |SELECT event_type, watermark_s, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN late_s > watermark_s THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped,
        |  CAST((COUNT(*) - SUM(CASE WHEN late_s > watermark_s
        |    THEN 1 ELSE 0 END)) * 1000000 // COUNT(*) AS BIGINT)
        |    AS completeness_ppm
        |FROM late CROSS JOIN ds GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
