package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.r4

/** Group J — event-time windowing and streaming-equivalent operators over
  * the `events` table.
  *
  * The declared queries are the batch-equivalent formulations (the oracle can
  * only check batch results — `Verify` runs batch DataFrames). The same
  * window/session/dedup logic runs under Structured Streaming in the
  * scalatest suite via MemoryStream, where watermarks, late data, and output
  * modes are observable (graft.streaming.StreamRunner).
  *
  * Scale posture: tumbling/sliding/session windows shuffle on
  * (key, window-bucket), never on raw event time; state in the streaming
  * form is bounded by the watermark.
  */
object JStreaming {

  val m: ListMap[String, Q] = ListMap(
    "j_tumbling" -> ((s, d) =>
      graft.streaming.StreamOps.tumbling(Tables.events(s, d)).orderBy("ws")),

    "j_sliding" -> ((s, d) =>
      graft.streaming.StreamOps.sliding(Tables.events(s, d)).orderBy("ws")),

    "j_session" -> ((s, d) =>
      // gap-based session windows; break semantics: new session when the
      // gap is >= 30 minutes (verified parity recipe, SURVEY §7.3.2)
      graft.streaming.StreamOps.sessions(Tables.events(s, d))
        .orderBy("user_id", "session_start")),

    "j_stream_dedup" -> ((s, d) =>
      // batch equivalent of withWatermark+dropDuplicates: first event per
      // (user, type) in event-time order, via min_by (never bare first())
      Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(min_by(col("event_id"), col("ts")).as("first_event"),
          min(col("ts")).as("first_ts"))
        .orderBy("user_id", "event_type")),

    "j_stream_neardup" -> ((s, d) =>
      // batch equivalent of the streaming near-dup gate: an arriving doc
      // is dropped when an earlier doc shares its first LSH band hash
      // (md5 of signature slots s0‖s1) — watermark+dropDuplicates over
      // the band key in the stream, min-per-band here. The signature is
      // the NATIVE row-wise graft_minhash (a pure projection, so the
      // streaming plan is stateless map + one dedup state store); the
      // MemoryStream semantics are asserted in StreamingSpec.
      ILlmOps.minhashSig(Tables.documents(s, d).select("doc_id", "text"))
        .select(col("doc_id"), md5(concat(col("s0"), col("s1"))).as("b0"))
        .groupBy("b0")
        .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_collided"))
        .select("survivor_id", "n_collided", "b0")
        .orderBy("survivor_id")),

    "j_late_data" -> ((s, d) => {
      // batch analog of the watermark cutoff: events within 1 hour of the
      // max observed event time; the true late-row-drop behavior is
      // asserted in the MemoryStream scalatest
      val mx = Tables.events(s, d).agg(max(col("ts")).as("mx"))
      Tables.events(s, d).crossJoin(broadcast(mx))
        .filter(col("ts") >= col("mx") - expr("INTERVAL 1 HOUR"))
        .select("event_id", "user_id", "ts")
        .orderBy("event_id")
    }),

    "j_stream_stream_join" -> ((s, d) => {
      // batch equivalent of the watermarked stream-stream interval join
      // (the streaming semantics — state eviction under two watermarks —
      // are asserted in StreamingSpec with two MemoryStreams)
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      graft.streaming.StreamOps.clickViewIntervalJoin(clicks, views)
        .orderBy("user_id", "click_id", "view_id")
    }),

    "j_stream_stream_outer" -> ((s, d) => {
      // LEFT OUTER stream-stream join: clicks with no view in the
      // trailing 10 minutes emit with a NULL view — in streaming the
      // null row is emitted only once the view-side watermark proves no
      // match can still arrive, and the buffered state is then evicted
      // (asserted in StreamingSpec); this key checks the join VALUES
      // against the batch oracle
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      graft.streaming.StreamOps
        .clickViewIntervalJoin(clicks, views, "left_outer")
        .orderBy(col("user_id"), col("click_id"),
          col("view_id").asc_nulls_first)
    }),

    "j_stream_static_join" -> ((s, d) =>
      // stream ⋈ static dimension enrichment (broadcast — the dim is small)
      Tables.events(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), r4(sum("value")).as("sum_val"))
        .orderBy("c_mktsegment")),

    // output modes / foreachBatch are sink behaviors — scalatest-only; the
    // declared query is the underlying aggregation so the key is benchable
    "j_stream_agg_modes" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), r4(sum("value")).as("sum_val"))
        .orderBy("event_type")),

    "j_foreachbatch" -> ((s, d) => {
      val tmp = scratch("foreachbatch_sink")
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp).orderBy("event_type")
    }),

    "j_stream_sessionize_state" -> ((s, d) => {
      // REAL Structured Streaming execution of the custom-state
      // sessionizer (flatMapGroupsWithState + EventTimeTimeout), hash-
      // checked against the batch gaps-and-islands oracle. Two micro-
      // batches: (1) the real events; (2) one far-future sentinel per
      // user, which closes every still-open real session via the gap
      // rule — Append emits closed sessions immediately, so the result
      // does not depend on timeout/no-data-batch scheduling. Sentinel
      // sessions themselves stay open (never emitted) and their timeout
      // (sentinel + gap) is beyond the final watermark (sentinel − 1 h).
      // The memory sink bounds this key to test scale; the production
      // shape is the same plan into a parquet/kafka sink.
      import s.implicits._
      import graft.streaming.SessEvent
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(): Unit
      }
      val inDir = scratch("sess_state_in")
      val ckpt = scratch("sess_state_ckpt")
      rm(new java.io.File(inDir)); rm(new java.io.File(ckpt))
      val evs = Tables.events(s, d).select(col("user_id"), col("ts"))
      // sentinel placement rides the SAME pass that stages the input —
      // an Observation on the write job, not a second scan (the fused
      // shape PPipeline's threshold probes use)
      val obs = new org.apache.spark.sql.Observation(
        s"sess_max_${java.util.UUID.randomUUID().toString.take(8)}")
      evs.observe(obs, max(col("ts")).as("max_ts"))
        .coalesce(1).write.mode("overwrite").parquet(inDir)
      val maxTs = obs.get("max_ts").asInstanceOf[java.sql.Timestamp]
      val name = "sess_state_out"
      if (s.catalog.tableExists(name)) s.catalog.dropTempView(name)
      // per-batch cost scales with state partitions (store open/commit ×
      // partitions × batches): 8 is plenty for 150 user keys. The no-data
      // batch is disabled because correctness here comes from the
      // sentinel flush, not from timeout scheduling. Both confs restored.
      val oldShuffle = s.conf.get("spark.sql.shuffle.partitions")
      val oldNoData =
        s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      try {
        val src = s.readStream.schema(evs.schema).parquet(inDir).as[SessEvent]
        val q = graft.streaming.StreamOps.sessionize(src, 30, "1 hour").toDF()
          .writeStream.format("memory").queryName(name).outputMode("append")
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable()
        evs.select("user_id").distinct()
          .withColumn("ts", lit(maxTs) + expr("INTERVAL 30 DAYS"))
          .coalesce(1).write.mode("append").parquet(inDir)
        q.processAllAvailable()
        q.stop()
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", oldShuffle)
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", oldNoData)
      }
      s.table(name).orderBy("user_id", "session_start")
    }),

    "j_stream_bus" -> ((s, d) => {
      // REAL streaming ingestion through the DSv2 message-bus source
      // (graft.sources.BusSource): events are PUBLISHED from the executors
      // (a distributed keyed producer — no driver collect), then consumed
      // by a readStream micro-batch query doing a grouped aggregate, and
      // the final snapshot is hash-checked against the batch oracle. The
      // payload carries the value pre-scaled to an exact integer so the
      // aggregate is independent of broker arrival order (which is
      // genuinely nondeterministic under a parallel producer — exactly
      // like a real bus).
      val topic = s"graft_bus_${java.util.UUID.randomUUID().toString.take(8)}"
      graft.sources.BusBroker.create(topic, 4)
      Tables.events(s, d).filter(col("user_id") < 200)
        .select(col("user_id").cast("string").as("k"),
          concat_ws(",", col("event_type"),
            floor(col("value") * 10000 + 0.5).cast("long").cast("string")).as("v"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            graft.sources.BusBroker.publish(topic, r.getString(0), r.getString(1))
            ()
          }
        }
      val name = s"bus_out_${topic.takeRight(8)}"
      val q = s.readStream.format("graft.sources.BusSource")
        .option("topic", topic).load()
        .select(split(col("value"), ",").as("p"))
        .select(col("p").getItem(0).as("event_type"),
          col("p").getItem(1).cast("long").as("bp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("bp").as("sum_bp"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
      graft.sources.BusBroker.delete(topic)
      s.table(name).orderBy("event_type")
    }),

    "j_stream_bus_window" -> ((s, d) => {
      // EVENT-TIME processing end to end through the bus: the payload
      // carries the raw event-time micros; the stream rebuilds the
      // timestamp, applies a 1-hour watermark, and aggregates tumbling
      // hourly windows in APPEND mode — a window row is emitted exactly
      // once, only after the watermark passes its close (the mode a
      // downstream sink can consume incrementally). Two far-future
      // sentinel records (10 min apart, same far hour) deterministically
      // flush every real window: the first advances the watermark past
      // all real data, the second triggers the batch that emits under
      // that watermark. Both sentinels' own window stays open and is
      // never emitted, so the snapshot equals the batch hourly aggregate.
      val topic = s"graft_busw_${java.util.UUID.randomUUID().toString.take(8)}"
      graft.sources.BusBroker.create(topic, 4)
      val evs = Tables.events(s, d).filter(col("user_id") < 100)
      // the sentinel epoch is observed on the publish pass itself — no
      // second scan of events just to place the watermark jump
      val obs = new org.apache.spark.sql.Observation(
        s"busw_max_${topic.takeRight(8)}")
      evs.observe(obs, max(unix_micros(col("ts"))).as("max_us"))
        .select(col("user_id").cast("string").as("k"),
          concat_ws(",", unix_micros(col("ts")).cast("string"),
            floor(col("value") * 10000 + 0.5).cast("long").cast("string")).as("v"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            graft.sources.BusBroker.publish(topic, r.getString(0), r.getString(1))
            ()
          }
        }
      val name = s"busw_out_${topic.takeRight(8)}"
      val q = s.readStream.format("graft.sources.BusSource")
        .option("topic", topic).load()
        .select(split(col("value"), ",").as("p"))
        .select(timestamp_micros(col("p").getItem(0).cast("long")).as("ts"),
          col("p").getItem(1).cast("long").as("bp"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"), sum("bp").as("sum_bp"))
        .select(col("window.start").as("ws"), col("cnt"), col("sum_bp"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable() // batch 1: every real event
      // empty corpus: no real windows to flush; any sentinel epoch works
      val sent = (obs.get("max_us") match {
        case l: java.lang.Long => l.longValue()
        case _ => 0L
      }) + 100L * 3600 * 1000000
      graft.sources.BusBroker.publish(topic, "s1", s"$sent,0")
      q.processAllAvailable() // batch 2: watermark jumps past all real windows
      graft.sources.BusBroker.publish(topic, "s2", s"${sent + 600L * 1000000},0")
      q.processAllAvailable() // batch 3: emits every real window
      q.stop()
      graft.sources.BusBroker.delete(topic)
      s.table(name).orderBy("ws")
    }),

    "j_stream_dlq" -> ((s, d) => {
      // poison-pill handling, the operational reality of any ingest: odd
      // event_ids are published as deterministically CORRUPT payloads
      // (unparseable), and the consumer routes every record to exactly
      // one of two transactional tables — parsed rows to the main table,
      // raw corrupt records to the dead-letter queue — both via
      // idempotent (app, batch) appends, so the split inherits the
      // exactly-once guarantee. Nothing is dropped silently: the output
      // carries the main aggregate PLUS a '_dlq' row whose count the
      // oracle pins from the corruption rule (a swallowed or double-
      // routed record breaks the hash either side).
      val topic = s"graft_dlq_${java.util.UUID.randomUUID().toString.take(8)}"
      graft.sources.BusBroker.create(topic, 4)
      Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("user_id").cast("string").as("k"),
          when(col("event_id") % 2 === 0,
            concat_ws(",", col("event_type"),
              floor(col("value") * 10000 + 0.5).cast("long").cast("string")))
            .otherwise(concat(lit("junk|"), col("event_id").cast("string")))
            .as("v"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            graft.sources.BusBroker.publish(topic, r.getString(0), r.getString(1))
            ()
          }
        }
      val tGood = graft.sources.TxnTable.fresh(s, scratch("dlq_good"))
      val tBad = graft.sources.TxnTable.fresh(s, scratch("dlq_bad"))
      val q = s.readStream.format("graft.sources.BusSource")
        .option("topic", topic).load()
        .select(col("value"))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val parsed = df
            .withColumn("p", split(col("value"), ","))
            .withColumn("event_type", expr("get(p, 0)"))
            // ANSI-safe: get() returns NULL past the end of a corrupt
            // (1-element) payload where getItem would throw the task
            .withColumn("bp", expr("get(p, 1)").cast("long"))
          tGood.appendIdempotent(
            parsed.filter(col("bp").isNotNull).select("event_type", "bp"),
            "dlq_good", id)
          tBad.appendIdempotent(
            parsed.filter(col("bp").isNull).select("value"), "dlq_bad", id)
          ()
        }.start()
      q.processAllAvailable()
      q.stop()
      graft.sources.BusBroker.delete(topic)
      tGood.read().groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("bp").as("sum_bp"))
        .unionByName(tBad.read().agg(count(lit(1)).as("n"))
          .select(lit("_dlq").as("event_type"), col("n"), lit(0L).as("sum_bp")))
        .orderBy("event_type")
    }),
  )

  val oracle: ListMap[String, String] = ListMap(
    "j_tumbling" ->
      ("SELECT date_trunc('hour', ts::TIMESTAMP) AS ws, count(*) AS cnt, " +
        "round(sum(value), 4) AS sum_val FROM events GROUP BY ws ORDER BY ws"),
    "j_sliding" ->
      ("SELECT time_bucket(INTERVAL '15 minutes', ts::TIMESTAMP) - " +
        "(k * INTERVAL '15 minutes') AS ws, count(*) AS cnt, " +
        "round(sum(value), 4) AS sum_val " +
        "FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) t(k) " +
        "GROUP BY ws ORDER BY ws"),
    "j_session" ->
      ("WITH d AS (SELECT user_id, ts::TIMESTAMP ts, " +
        "CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL THEN 1 " +
        "WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w >= INTERVAL '30 minutes' " +
        "THEN 1 ELSE 0 END AS brk " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM d) " +
        "SELECT user_id, min(ts) AS session_start, " +
        "max(ts) + INTERVAL '30 minutes' AS session_end, count(*) AS n_events " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"),
    "j_stream_dedup" ->
      ("SELECT user_id, event_type, arg_min(event_id, ts) AS first_event, " +
        "min(ts::TIMESTAMP) AS first_ts FROM events " +
        "GROUP BY user_id, event_type ORDER BY user_id, event_type"),
    "j_stream_neardup" ->
      ("WITH " + ILlmOps.sigSql("documents") + " " +
        "SELECT min(doc_id) AS survivor_id, count(*) AS n_collided, " +
        "md5(s0 || s1) AS b0 FROM sig GROUP BY b0 ORDER BY survivor_id"),
    "j_late_data" ->
      ("SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events " +
        "WHERE ts::TIMESTAMP >= (SELECT max(ts::TIMESTAMP) FROM events) - INTERVAL 1 HOUR " +
        "ORDER BY event_id"),
    "j_stream_stream_join" ->
      ("SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id, " +
        "c.ts::TIMESTAMP AS click_ts, v.ts::TIMESTAMP AS view_ts " +
        "FROM events c JOIN events v ON c.user_id = v.user_id " +
        "WHERE c.event_type = 'click' AND v.event_type = 'view' " +
        "AND v.ts::TIMESTAMP >= c.ts::TIMESTAMP - INTERVAL 10 MINUTE " +
        "AND v.ts::TIMESTAMP <= c.ts::TIMESTAMP " +
        "ORDER BY 1, 2, 3"),
    "j_stream_stream_outer" ->
      ("SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id, " +
        "c.ts::TIMESTAMP AS click_ts, v.ts::TIMESTAMP AS view_ts " +
        "FROM (SELECT * FROM events WHERE event_type = 'click') c " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v " +
        "ON c.user_id = v.user_id " +
        "AND v.ts::TIMESTAMP >= c.ts::TIMESTAMP - INTERVAL 10 MINUTE " +
        "AND v.ts::TIMESTAMP <= c.ts::TIMESTAMP " +
        "ORDER BY c.user_id, c.event_id, v.event_id NULLS FIRST"),
    "j_stream_static_join" ->
      ("SELECT c_mktsegment, count(*) AS cnt, round(sum(value), 4) AS sum_val " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "j_stream_agg_modes" ->
      ("SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_val " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // the sink write itself is scalatest territory; the read-back VALUES
    // are checkable against the base aggregate
    "j_foreachbatch" ->
      ("SELECT event_type, count(*) AS cnt FROM events " +
        "GROUP BY event_type ORDER BY event_type"),
    // the streaming fMGWS result must equal the batch gaps-and-islands
    // sessionization (session_end = last event, no +gap padding)
    "j_stream_sessionize_state" ->
      ("WITH d AS (SELECT user_id, ts::TIMESTAMP ts, " +
        "CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL THEN 1 " +
        "WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w >= INTERVAL '30 minutes' " +
        "THEN 1 ELSE 0 END AS brk " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM d) " +
        "SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events FROM s GROUP BY user_id, sid " +
        "ORDER BY user_id, session_start"),
    // the bus carries (event_type, basis-point value) pairs; the grouped
    // aggregate over everything the stream ingested must equal the batch
    // aggregate over everything the producer published
    "j_stream_bus" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) " +
        "AS sum_bp FROM events WHERE user_id < 200 " +
        "GROUP BY event_type ORDER BY event_type"),
    // every parsed record lands in the main aggregate, every corrupt one
    // in the '_dlq' row — the corruption rule (odd event_id) lets the
    // oracle pin both sides
    "j_stream_dlq" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) " +
        "AS sum_bp FROM events WHERE user_id < 50 AND event_id % 2 = 0 " +
        "GROUP BY event_type " +
        "UNION ALL SELECT '_dlq', count(*), CAST(0 AS BIGINT) FROM events " +
        "WHERE user_id < 50 AND event_id % 2 = 1 " +
        "ORDER BY event_type"),
    // every real hourly window must be emitted exactly once and match the
    // batch aggregate; the sentinel hour must NOT appear
    "j_stream_bus_window" ->
      ("SELECT date_trunc('hour', ts::TIMESTAMP) AS ws, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) " +
        "AS sum_bp FROM events WHERE user_id < 100 " +
        "GROUP BY ws ORDER BY ws"),
  )
}
