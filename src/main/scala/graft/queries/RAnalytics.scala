package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.r4

/** Group R (round-7 extension wave) — corpus-quality rules, cross-doc
  * novelty, deterministic shard export, and event-funnel / cohort
  * analytics. SURVEY §2's discipline applies: every key is a declarative
  * DataFrame plan (one or two keyed shuffles, partial aggregation, no
  * driver-side loops) with a DuckDB oracle mirroring it exactly.
  */
object RAnalytics {

  /** Stopwords present in the fixture vocabulary; the rule only needs a
    * stable, engine-agnostic list. */
  private val Stop = Seq("the", "a", "of", "and", "to")

  /** OHLC downsampling: per (type, hour bucket) the open/high/low/close of
    * the value stream — open/close via lexicographic (ts, value) struct
    * min/max, NOT bare min_by/max_by: equal timestamps would make min_by's
    * pick aggregation-order-dependent, while the struct ordering is total
    * (tie → smaller value opens, larger closes) on both engines
    * (tie semantics property-tested in PropertySpec). One partial+final
    * aggregate pass on the bucket key — no window, no in-bucket sort; at
    * 100 TB the shuffle carries one row per (partition × bucket). */
  def ohlc(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("bucket"))
      .agg(
        r4(min(struct(col("ts"), col("value"))).getField("value"))
          .as("open"),
        r4(max("value")).as("high"), r4(min("value")).as("low"),
        r4(max(struct(col("ts"), col("value"))).getField("value"))
          .as("close"),
        count(lit(1)).as("n"))
      .orderBy("event_type", "bucket")

  val m: ListMap[String, Q] = ListMap(
    "i_gopher_rules" -> ((s, d) => {
      // Gopher-style (Rae et al. 2021) word-statistics quality rules:
      // word count bounds, mean word length in [3,10], stopword presence.
      // One codegen'd projection pass — each rule is a column over the
      // token array, flags derive from the ROUNDED values so the boolean
      // is bit-stable cross-engine. At 100 TB this is a linear scan that
      // pipelines into whatever filter consumes `keep` (no shuffle).
      val a = split(col("text"), " ")
      val base = Tables.documents(s, d).select(
        col("doc_id"),
        size(a).cast("long").as("n_words"),
        // words are single-space-joined: total word chars = len − (n−1)
        r4((length(col("text")) - size(a) + 1).cast("double") / size(a))
          .as("mean_word_len"),
        r4(size(filter(a, w => w.isin(Stop: _*))).cast("double") / size(a))
          .as("stop_frac"),
        // presence from the EXACT count, not the rounded fraction: a huge
        // doc's 1-in-20000 stopword rounds to stop_frac = 0.0
        (size(filter(a, w => w.isin(Stop: _*))) > 0).as("has_stop"))
      base.withColumn("keep",
          col("n_words") >= 15 && col("n_words") <= 100000 &&
            col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
            col("has_stop"))
        .drop("has_stop")
        .orderBy("doc_id")
    }),

    "i_ngram_novelty" -> ((s, d) => {
      // Cross-doc novelty: the fraction of a doc's DISTINCT trigrams whose
      // corpus-wide first occurrence (min doc_id) is the doc itself — the
      // memorization/boilerplate signal a curation pass prices before
      // sampling. Shape at 100 TB: one shuffle on the gram key for the
      // global min (partial agg — grams dedupe map-side), one join back,
      // one per-doc aggregate. Never pairwise.
      val grams = Tables.documents(s, d)
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), split(col("text"), " ").as("a"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(a) - 3), " +
            "i -> concat_ws(' ', a[i], a[i+1], a[i+2]))")).as("g"))
        .distinct()
      val first = grams.groupBy("g").agg(min("doc_id").as("first_doc"))
      grams.join(first, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tri"),
          sum((col("first_doc") === col("doc_id")).cast("long")).as("n_novel"))
        // half-up integer basis points: (2a + b) DIV 2b
        .withColumn("novelty_bp",
          expr("(2 * n_novel * 10000 + n_tri) DIV (2 * n_tri)"))
        .orderBy("doc_id")
    }),

    "i_doc_shard" -> ((s, d) =>
      // Deterministic training-shard export audit: md5-range sharding (the
      // i_sample_hash discipline — content-independent, engine-portable,
      // stable under re-runs) into 8 shards, with the balance stats an
      // export job publishes (docs + chars per shard). The shard id is a
      // pure projection, so at 100 TB the write is one hash partition by
      // shard_id; the audit is one partial-agg shuffle of 8 groups.
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 8).as("shard_id"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("shard_id")),

    "e_funnel" -> ((s, d) => {
      // Ordered event funnel view → click → purchase per user: each stage
      // is the FIRST qualifying event at-or-after the previous stage's
      // time. Three bounded aggregations, all shuffling on user_id — the
      // same partitioning reused stage to stage, so at 100 TB the funnel
      // costs one wide shuffle plus co-partitioned joins, never a
      // sort-the-world sessionization.
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") >= col("t_view"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") >= col("t_click"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"),
          (lit(1L) + col("t_click").isNotNull.cast("long") +
            col("t_purchase").isNotNull.cast("long")).as("stage"))
        .orderBy("user_id")
    }),

    "e_ohlc" -> ((s, d) => ohlc(Tables.events(s, d))),

    "e_gap_stats" -> ((s, d) => {
      // inter-event gap distribution per user (the statistic that prices a
      // session gap threshold): gaps as exact integer micros via one lag
      // window, then median (kept doubled — exact), p90 by explicit rank
      // position ceil(0.9n) (interpolated quantiles differ cross-engine in
      // the last ulp; rank positions are integers), max. One window sort
      // on (user, ts) + one grouped pass.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("ts"),
          (unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
            .as("gap_us"))
        .filter(col("gap_us").isNotNull)
      val ranked = gaps.withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("gap_us", "ts")))
      val agg = ranked.groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          floor(expr("percentile(gap_us, 0.5)") * 2 + 0.5).cast("long")
            .as("med2"),
          max("gap_us").as("max_gap_us"))
      val p90 = ranked.join(agg.select(col("user_id"), col("n_gaps")),
          "user_id")
        .filter(col("rn") === expr("(9 * n_gaps + 9) DIV 10"))
        .select(col("user_id"), col("gap_us").as("p90_gap_us"))
      agg.join(p90, "user_id")
        .select(col("user_id"), col("n_gaps"),
          r4(col("med2") / 2000000.0).as("med_gap_s"),
          col("p90_gap_us"), col("max_gap_us"))
        .orderBy("user_id")
    }),

    "p_backfill_plan" -> ((s, d) => {
      // partition backfill planner: the expected daily calendar (min..max)
      // left-joined with per-day counts — missing days surface with n=0,
      // the list a backfill job consumes. The calendar is a generated
      // one-row explode (days-sized); counts are one partial-agg shuffle.
      val days = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_day"))
      val cal = days.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      cal.join(days, Seq("day"), "left")
        .select(col("day"), coalesce(col("n_day"), lit(0L)).as("n"),
          coalesce(col("n_day"), lit(0L)) === 0L).toDF("day", "n", "missing")
        .orderBy("day")
    }),

    "i_source_overlap" -> ((s, d) => {
      // cross-source contamination matrix: asymmetric 5-gram shingle
      // containment C(a→b) = |A∩B| / |A| for every ordered source pair —
      // the audit run before declaring corpus slices independent.
      // Shingles dedupe to source level map-side; the pair work is one
      // equi-join on the gram (work ∝ shared grams, never corpus²); the
      // 5×5 matrix assembles from broadcast-sized aggregates.
      val g = Tables.documents(s, d)
        .filter(size(split(col("text"), " ")) >= 5)
        .select(col("source"), split(col("text"), " ").as("a"))
        .select(col("source"), explode(expr(
          "transform(sequence(0, size(a) - 5), " +
            "i -> concat_ws(' ', a[i], a[i+1], a[i+2], a[i+3], a[i+4]))"))
          .as("g"))
        .distinct().cutLineage()
      val sizes = g.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = g.as("x").join(g.as("y"),
          col("x.g") === col("y.g") && col("x.source") =!= col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("inter"))
      sizes.select(col("source").as("src_a"), col("n").as("n_a"))
        .crossJoin(sizes.select(col("source").as("src_b")))
        .filter(col("src_a") =!= col("src_b"))
        .join(inter, Seq("src_a", "src_b"), "left")
        .select(col("src_a"), col("src_b"), col("n_a"),
          coalesce(col("inter"), lit(0L)).as("inter"))
        .withColumn("containment_bp",
          expr("(2 * inter * 10000 + n_a) DIV (2 * n_a)"))
        .orderBy("src_a", "src_b")
    }),

    "d_agg_weighted" -> ((s, d) =>
      // weighted aggregates: quantity-weighted mean price and weighted
      // discount per flag — sum(w·x)/sum(w) re-aggregates (partial sums),
      // so the shuffle carries two numbers per group, like any avg
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(r4(sum("l_quantity")).as("sum_w"),
          r4(sum(col("l_quantity") * col("l_extendedprice")) /
            sum("l_quantity")).as("w_avg_price"),
          r4(sum(col("l_quantity") * col("l_discount")) /
            sum("l_quantity")).as("w_avg_discount"))
        .orderBy("l_returnflag")),

    "p_skew_report" -> ((s, d) => {
      // join-key skew audit — the report a pipeline runs BEFORE picking a
      // salt factor (pairs with p_join_salted): top-10 heavy hitters of
      // the supplier key with each key's share-of-average in integer
      // basis points, computed RELATIVE TO the integer mean rows-per-key
      // (avg = n_rows DIV n_keys; ratio_bp = round(cnt·10⁴/avg)) so the
      // largest intermediate is 2·cnt·10⁴ — safe in Long up to ~4.6e14
      // rows on one key, where the naive cnt·n_keys·10⁴ product wraps
      // silently at 100 TB scale (and DuckDB would error instead: a
      // cross-engine divergence). avg ≥ 1 always since every counted key
      // has ≥ 1 row. One partial-agg shuffle on the key; the global stats
      // are a broadcast one-rower.
      val top = Tables.lineitem(s, d)
        .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      val stats = top.agg(sum("cnt").as("n_rows"),
        count(lit(1)).as("n_keys"))
      // global top-10 via orderBy+limit (TakeOrderedAndProject — at 100 TB
      // the key-count table is millions of rows; never a one-partition
      // window over it), then rank the 10 survivors
      top.crossJoin(broadcast(stats))
        .withColumn("ratio_bp",
          expr("(2 * cnt * 10000 + (n_rows DIV n_keys)) DIV (2 * (n_rows DIV n_keys))"))
        .orderBy(col("cnt").desc, col("l_suppkey")).limit(10)
        .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
          .Window.orderBy(col("cnt").desc, col("l_suppkey"))).cast("long"))
        .select("l_suppkey", "cnt", "n_keys", "ratio_bp", "rn")
        .orderBy("rn")
    }),

    "d_agg_mad" -> ((s, d) => {
      // robust outlier stats per event type: median / MAD / outlier count
      // (|v − med| > 3·1.4826·MAD), ENTIRELY in scaled integers so the
      // comparison is bit-stable cross-engine: v in micros, median kept
      // doubled (med2 — exact, since an even-count median is a .5), the
      // deviation d_us = |2·v_us − med2| exact, MAD doubled again (mad2),
      // and the flag is the integer inequality 20000·d_us > 44478·mad2.
      // Three linear passes with broadcast per-type scalars — the shape a
      // 100 TB quality gate wants (no window, no sort of the world).
      val ev = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 1000000 + 0.5).cast("long").as("v_us"))
      val med = ev.groupBy("event_type")
        .agg(floor(expr("percentile(v_us, 0.5)") * 2 + 0.5).cast("long")
          .as("med2"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("d_us", abs(col("v_us") * 2 - col("med2")))
      val mad = dev.groupBy("event_type")
        .agg(floor(expr("percentile(d_us, 0.5)") * 2 + 0.5).cast("long")
          .as("mad2"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max(r4(col("med2") / 2000000.0)).as("med"),
          max(r4(col("mad2") / 4000000.0)).as("mad"),
          sum((col("d_us") * 20000 > col("mad2") * 44478).cast("long"))
            .as("n_outliers"))
        .orderBy("event_type")
    }),

    "e_cohort_retention" -> ((s, d) => {
      // Cohort retention: users grouped by first-active day, counted on
      // each later active day offset k. distinct() bounds the grid at
      // (users × active days); both shuffles are keyed (user for the
      // cohort min, (cohort, k) for the count) with partial aggregation.
      val act = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val coh = act.groupBy("user_id").agg(min("day").as("cohort"))
      act.join(coh, "user_id")
        .select(col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("k"),
          col("user_id"))
        .groupBy("cohort", "k").agg(count(lit(1)).as("n_active"))
        .orderBy("cohort", "k")
    }),
  )

  /** DuckDB hex→int for the first 4 md5 hex chars (no conv() in DuckDB). */
  private def duckHex4(e: String): String =
    (1 to 4).map { i =>
      val shift = math.pow(16, 4 - i).toLong
      s"(strpos('0123456789abcdef', substring($e, $i, 1)) - 1) * $shift"
    }.mkString("(", " + ", ")")

  val oracle: ListMap[String, String] = ListMap(
    "i_gopher_rules" ->
      ("WITH t AS (SELECT doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
        "round((length(text) - len(string_split(text, ' ')) + 1)::DOUBLE " +
        "/ len(string_split(text, ' ')), 4) AS mean_word_len, " +
        "round(len(list_filter(string_split(text, ' '), " +
        "w -> w IN ('the','a','of','and','to')))::DOUBLE " +
        "/ len(string_split(text, ' ')), 4) AS stop_frac, " +
        "len(list_filter(string_split(text, ' '), " +
        "w -> w IN ('the','a','of','and','to'))) > 0 AS has_stop " +
        "FROM documents) " +
        "SELECT doc_id, n_words, mean_word_len, stop_frac, " +
        "n_words >= 15 AND n_words <= 100000 AND mean_word_len >= 3.0 " +
        "AND mean_word_len <= 10.0 AND has_stop AS keep " +
        "FROM t ORDER BY doc_id"),
    "i_ngram_novelty" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) w, " +
        "generate_subscripts(string_split(text, ' '), 1) pos FROM documents), " +
        "g0 AS (SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || " +
        "lead(w, 2) OVER win AS g FROM tok " +
        "WINDOW win AS (PARTITION BY doc_id ORDER BY pos)), " +
        "g AS (SELECT DISTINCT doc_id, g FROM g0 WHERE g IS NOT NULL), " +
        "f AS (SELECT g, min(doc_id) first_doc FROM g GROUP BY g) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) n_tri, " +
        "CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) " +
        "n_novel, " +
        "CAST((2 * sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) " +
        "* 10000 + count(*)) // (2 * count(*)) AS BIGINT) novelty_bp " +
        "FROM g JOIN f USING (g) GROUP BY doc_id ORDER BY doc_id"),
    "i_doc_shard" ->
      ("SELECT " + duckHex4("substring(md5(doc_id::VARCHAR), 1, 4)") +
        " % 8 AS shard_id, CAST(count(*) AS BIGINT) n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) min_doc, " +
        "CAST(max(doc_id) AS BIGINT) max_doc " +
        "FROM documents GROUP BY shard_id ORDER BY shard_id"),
    "e_funnel" ->
      ("WITH v AS (SELECT user_id, min(ts::TIMESTAMP) t_view FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.ts::TIMESTAMP) t_click FROM events e " +
        "JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'click' " +
        "AND e.ts::TIMESTAMP >= v.t_view GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.ts::TIMESTAMP) t_purchase " +
        "FROM events e JOIN c ON e.user_id = c.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP >= c.t_click " +
        "GROUP BY 1) " +
        "SELECT v.user_id, v.t_view, c.t_click, p.t_purchase, " +
        "CAST(1 + (c.t_click IS NOT NULL)::INT + " +
        "(p.t_purchase IS NOT NULL)::INT AS BIGINT) stage " +
        "FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id) " +
        "ORDER BY v.user_id"),
    "e_ohlc" ->
      ("SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS bucket, " +
        "round(min({'t': ts::TIMESTAMP, 'v': value}).v, 4) AS open, " +
        "round(max(value), 4) AS high, round(min(value), 4) AS low, " +
        "round(max({'t': ts::TIMESTAMP, 'v': value}).v, 4) AS close, " +
        "CAST(count(*) AS BIGINT) n " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "e_gap_stats" ->
      ("WITH g0 AS (SELECT user_id, ts::TIMESTAMP AS tt, " +
        "epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER " +
        "(PARTITION BY user_id ORDER BY ts)) AS gap_us FROM events), " +
        "g AS (SELECT user_id, tt, gap_us FROM g0 WHERE gap_us IS NOT NULL), " +
        "r AS (SELECT user_id, gap_us, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY gap_us, tt) rn FROM g), " +
        "a AS (SELECT user_id, CAST(count(*) AS BIGINT) n_gaps, " +
        "CAST(floor(quantile_cont(gap_us, 0.5) * 2 + 0.5) AS BIGINT) med2, " +
        "CAST(max(gap_us) AS BIGINT) max_gap_us FROM g GROUP BY 1), " +
        "p AS (SELECT r.user_id, CAST(gap_us AS BIGINT) p90_gap_us " +
        "FROM r JOIN a USING (user_id) WHERE rn = (9 * n_gaps + 9) // 10) " +
        "SELECT a.user_id, n_gaps, round(med2 / 2000000.0, 4) med_gap_s, " +
        "p90_gap_us, max_gap_us FROM a JOIN p USING (user_id) " +
        "ORDER BY a.user_id"),
    "p_backfill_plan" ->
      ("WITH dd AS (SELECT CAST(ts::TIMESTAMP AS DATE) dy, " +
        "CAST(count(*) AS BIGINT) n_day FROM events GROUP BY 1), " +
        "cal AS (SELECT unnest(generate_series((SELECT min(dy) FROM dd), " +
        "(SELECT max(dy) FROM dd), INTERVAL 1 DAY))::DATE AS dy) " +
        "SELECT cal.dy AS \"day\", CAST(coalesce(n_day, 0) AS BIGINT) n, " +
        "coalesce(n_day, 0) = 0 AS missing " +
        "FROM cal LEFT JOIN dd USING (dy) ORDER BY 1"),
    "i_source_overlap" ->
      ("WITH tok AS (SELECT doc_id, source, " +
        "unnest(string_split(text, ' ')) w, " +
        "generate_subscripts(string_split(text, ' '), 1) pos FROM documents), " +
        "g0 AS (SELECT source, w || ' ' || lead(w, 1) OVER win || ' ' || " +
        "lead(w, 2) OVER win || ' ' || lead(w, 3) OVER win || ' ' || " +
        "lead(w, 4) OVER win AS g FROM tok " +
        "WINDOW win AS (PARTITION BY doc_id ORDER BY pos)), " +
        "g AS (SELECT DISTINCT source, g FROM g0 WHERE g IS NOT NULL), " +
        "sz AS (SELECT source, CAST(count(*) AS BIGINT) n FROM g GROUP BY 1), " +
        "i AS (SELECT x.source src_a, y.source src_b, " +
        "CAST(count(*) AS BIGINT) inter FROM g x JOIN g y " +
        "ON x.g = y.g AND x.source <> y.source GROUP BY 1, 2) " +
        "SELECT a.source src_a, b.source src_b, a.n n_a, " +
        "CAST(coalesce(inter, 0) AS BIGINT) inter, " +
        "CAST((2 * coalesce(inter, 0) * 10000 + a.n) // (2 * a.n) AS BIGINT) " +
        "containment_bp " +
        "FROM sz a CROSS JOIN sz b " +
        "LEFT JOIN i ON i.src_a = a.source AND i.src_b = b.source " +
        "WHERE a.source <> b.source ORDER BY 1, 2"),
    "d_agg_weighted" ->
      ("SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_w, " +
        "round(sum(l_quantity * l_extendedprice) / sum(l_quantity), 4) " +
        "AS w_avg_price, " +
        "round(sum(l_quantity * l_discount) / sum(l_quantity), 4) " +
        "AS w_avg_discount " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "p_skew_report" ->
      ("WITH t AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) cnt " +
        "FROM lineitem GROUP BY 1), " +
        "s AS (SELECT CAST(sum(cnt) AS BIGINT) n_rows, " +
        "CAST(count(*) AS BIGINT) n_keys FROM t) " +
        "SELECT l_suppkey, cnt, n_keys, ratio_bp, rn FROM (" +
        "SELECT l_suppkey, cnt, n_keys, " +
        "CAST((2 * cnt * 10000 + (n_rows // n_keys)) // (2 * (n_rows // n_keys)) " +
        "AS BIGINT) ratio_bp, " +
        "CAST(row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS BIGINT) rn " +
        "FROM t CROSS JOIN s) WHERE rn <= 10 ORDER BY rn"),
    "d_agg_mad" ->
      ("WITH ev AS (SELECT event_type, " +
        "CAST(floor(value * 1000000 + 0.5) AS BIGINT) v_us FROM events), " +
        "m AS (SELECT event_type, " +
        "CAST(floor(quantile_cont(v_us, 0.5) * 2 + 0.5) AS BIGINT) med2 " +
        "FROM ev GROUP BY 1), " +
        "dv AS (SELECT ev.event_type, abs(v_us * 2 - med2) d_us, med2 " +
        "FROM ev JOIN m USING (event_type)), " +
        "md AS (SELECT event_type, " +
        "CAST(floor(quantile_cont(d_us, 0.5) * 2 + 0.5) AS BIGINT) mad2 " +
        "FROM dv GROUP BY 1) " +
        "SELECT dv.event_type, CAST(count(*) AS BIGINT) n, " +
        "round(max(med2) / 2000000.0, 4) med, " +
        "round(max(mad2) / 4000000.0, 4) mad, " +
        "CAST(sum(CASE WHEN d_us * 20000 > mad2 * 44478 THEN 1 ELSE 0 END) " +
        "AS BIGINT) n_outliers " +
        "FROM dv JOIN md USING (event_type) GROUP BY 1 ORDER BY 1"),
    "e_cohort_retention" ->
      ("WITH d AS (SELECT DISTINCT user_id, " +
        "CAST(ts::TIMESTAMP AS DATE) AS dy FROM events), " +
        "f AS (SELECT user_id, min(dy) cohort FROM d GROUP BY 1) " +
        "SELECT cohort, CAST(date_diff('day', cohort, dy) AS BIGINT) k, " +
        "CAST(count(*) AS BIGINT) n_active " +
        "FROM d JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"),
  )
}
