package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured Streaming behaviors that the batch oracle cannot check:
  * late-data dropping under a watermark, streaming dedup, output modes,
  * foreachBatch, and batch-vs-stream equivalence of the window logic.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("watermark drops late rows (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val agg = StreamOps.tumblingWithWatermark(ms.toDF(), "1 hour")
    val q = agg.writeStream.format("memory").queryName("late1").outputMode("append").start()
    // batch 1: events up to 12:00 → watermark advances to 11:00 AFTER the batch
    ms.addData(
      Ev(t("2024-01-01 09:10:00"), 1, "click", 1.0),
      Ev(t("2024-01-01 12:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: an event at 09:20 — older than the 11:00 watermark → dropped
    ms.addData(Ev(t("2024-01-01 09:20:00"), 1, "late", 99.0))
    q.processAllAvailable()
    // batch 3: advance time so the 09:00 window closes and emits
    ms.addData(Ev(t("2024-01-01 14:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late1").collect()
    val nine = rows.filter(_.getTimestamp(0) == t("2024-01-01 09:00:00"))
    assert(nine.length == 1 && nine.head.getLong(1) == 1,
      s"09:00 window must contain ONLY the on-time event, got ${rows.mkString(";")}")
  }

  test("streaming dedup keeps first event per (user, type)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(
      Ev(t("2024-01-01 09:00:00"), 1, "click", 1.0),
      Ev(t("2024-01-01 09:05:00"), 1, "click", 2.0), // dup → dropped
      Ev(t("2024-01-01 09:06:00"), 2, "click", 3.0))
    runToMemory(StreamOps.dedupWithinWatermark(ms.toDF()), "dedup1", "append")
    val vals = spark.table("dedup1").select("user_id", "value").as[(Long, Double)]
      .collect().toSet
    assert(vals == Set((1L, 1.0), (2L, 3.0)))
  }

  test("output modes: complete vs update on a streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(Ev(t("2024-01-01 09:00:00"), 1, "click", 1.0))
    val agg = ms.toDF().groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val qc = agg.writeStream.format("memory").queryName("modes_c")
      .outputMode("complete").start()
    qc.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 09:10:00"), 2, "click", 1.0))
    qc.processAllAvailable()
    qc.stop()
    // complete mode: final table holds the full updated aggregate
    val cnt = spark.table("modes_c").as[(String, Long)].collect().toMap
    assert(cnt == Map("click" -> 2L))
  }

  test("foreachBatch writes each micro-batch through the batch writer") {
    implicit val sqlCtx = spark.sqlContext
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_scratch/febtest"
    val ms = MemoryStream[Ev]
    ms.addData(Ev(t("2024-01-01 09:00:00"), 1, "click", 1.0),
      Ev(t("2024-01-01 09:01:00"), 2, "view", 2.0))
    val q = ms.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(out)
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).count() == 2)
  }

  test("flatMapGroupsWithState accumulates per-user running totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[graft.streaming.UserEvent]
    val q = StreamOps.runningUserTotals(ms.toDS())
      .toDF().writeStream.format("memory").queryName("state1")
      .outputMode("update").start()
    ms.addData(graft.streaming.UserEvent(1, 10.0), graft.streaming.UserEvent(1, 5.0))
    q.processAllAvailable()
    ms.addData(graft.streaming.UserEvent(1, 1.0), graft.streaming.UserEvent(2, 7.0))
    q.processAllAvailable()
    q.stop()
    // update mode: last emission per user carries the accumulated state
    val last = spark.table("state1").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (u, xs) => u -> xs.last._2 }
    assert(last(1L) == ((3L, 16.0)), s"user 1 state: ${last(1L)}")
    assert(last(2L) == ((1L, 7.0)))
  }

  test("EventTimeTimeout evicts the idle session and emits it exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessEvent
    val ms = MemoryStream[SessEvent]
    val q = StreamOps.sessionize(ms.toDS(), gapMinutes = 30,
        watermarkDelay = "10 seconds")
      .toDF().writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    // open a session for user 1 (two events, 5 min apart)
    ms.addData(SessEvent(1, t("2024-01-01 09:00:00")),
      SessEvent(1, t("2024-01-01 09:05:00")))
    q.processAllAvailable()
    assert(spark.table("sess_timeout").isEmpty,
      "open session must not emit before the timeout")
    // another user's much later event advances the watermark past
    // 09:05 + 30 min; the timeout itself fires in the NEXT micro-batch
    ms.addData(SessEvent(2, t("2024-01-01 11:00:00")))
    q.processAllAvailable()
    ms.addData(SessEvent(2, t("2024-01-01 11:01:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_timeout").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(rows.count(_._1 == 1L) == 1, s"user 1 session emitted once, got: ${rows.toSeq}")
    val s1 = rows.find(_._1 == 1L).get
    assert(s1._2 == t("2024-01-01 09:00:00") && s1._3 == t("2024-01-01 09:05:00")
      && s1._4 == 2L, s"session summary: $s1")
  }

  test("checkpoint restart is exactly-once: no replay, no loss across queries") {
    // the recovery contract a production stream lives on: a NEW query
    // started on the SAME checkpoint must resume from the source offsets
    // in the commit log — files processed before the stop are neither
    // reprocessed (no duplicates) nor skipped (no loss)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    val base = graft.queries.scratch("restart_test")
    rm(new java.io.File(base))
    val (in, ckpt, out) = (s"$base/in", s"$base/ckpt", s"$base/out")
    val ev = Tables.events(spark, sfDir).select("event_id", "event_type")
    val half = ev.count() / 2
    val firstHalf = ev.filter(col("event_id") <= half).count()
    ev.filter(col("event_id") <= half).coalesce(1)
      .write.mode("overwrite").parquet(in)
    def start() = spark.readStream.schema(ev.schema).parquet(in)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    val afterBatch1 = spark.read.parquet(out).count()
    assert(afterBatch1 == firstHalf, s"first query wrote $afterBatch1")
    // new file arrives while no query is running
    ev.filter(col("event_id") > half).coalesce(1)
      .write.mode("append").parquet(in)
    val q2 = start()   // fresh query object, same checkpoint
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == ev.count(),
      s"expected ${ev.count()} rows after restart, got ${rows.count()}")
    assert(rows.select("event_id").distinct().count() == ev.count(),
      "restart must not duplicate any event")
  }

  test("sessionize preserves microsecond timestamps in session bounds") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessEvent
    // Timestamp.valueOf keeps fractional seconds — 123456 µs survives the
    // state round-trip only if OpenSession state is µs-granular
    val a = t("2024-01-01 09:00:00.123456")
    val b = t("2024-01-01 09:05:00.654321")
    val ms = MemoryStream[SessEvent]
    val q = StreamOps.sessionize(ms.toDS(), gapMinutes = 30,
        watermarkDelay = "10 seconds")
      .toDF().writeStream.format("memory").queryName("sess_us")
      .outputMode("append").start()
    ms.addData(SessEvent(1, a), SessEvent(1, b))
    q.processAllAvailable()
    // close user 1's session via a later event's watermark + timeout
    ms.addData(SessEvent(2, t("2024-01-01 11:00:00")))
    q.processAllAvailable()
    ms.addData(SessEvent(2, t("2024-01-01 11:30:00")))
    q.processAllAvailable()
    q.stop()
    val s1 = spark.table("sess_us").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .find(_._1 == 1L).get
    assert(s1._2 == a && s1._3 == b,
      s"µs bounds must survive the state round-trip: $s1")
  }

  test("batch and stream produce identical tumbling aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(t("2024-01-01 09:10:00"), 1, "click", 1.5),
      Ev(t("2024-01-01 09:40:00"), 2, "view", 2.5),
      Ev(t("2024-01-01 10:10:00"), 1, "click", 3.5))
    val ms = MemoryStream[Ev]
    ms.addData(evs: _*)
    runToMemory(StreamOps.tumbling(ms.toDF()), "bveq", "complete")
    val streamed = spark.table("bveq").orderBy("ws").collect().map(_.toString).toSeq
    val batch = StreamOps.tumbling(evs.toDF()).orderBy("ws").collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("file-source stream: readStream over a parquet directory") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scratch/stream_src"
    val f = new java.io.File(dir)
    if (f.exists()) { f.listFiles().foreach(_.delete()); f.delete() }
    val evs = Seq(
      Ev(t("2024-01-01 09:10:00"), 1, "click", 1.5),
      Ev(t("2024-01-01 09:40:00"), 2, "view", 2.5),
      Ev(t("2024-01-01 10:10:00"), 1, "click", 3.5))
    evs.toDF().write.parquet(dir)
    val stream = spark.readStream.schema(evs.toDF().schema).parquet(dir)
    assert(stream.isStreaming)
    runToMemory(StreamOps.tumbling(stream), "filestream1", "complete")
    val streamed = spark.table("filestream1").orderBy("ws").collect().map(_.toString).toSeq
    val batch = StreamOps.tumbling(evs.toDF()).orderBy("ws").collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("stream-stream interval join matches the batch formulation") {
    implicit val sqlCtx = spark.sqlContext
    val clicksRaw = Seq(
      Ev(t("2024-01-01 09:08:00"), 1, "click", 100.0),
      Ev(t("2024-01-01 09:50:00"), 1, "click", 101.0),
      Ev(t("2024-01-01 09:08:00"), 2, "click", 102.0))
    val viewsRaw = Seq(
      Ev(t("2024-01-01 09:00:00"), 1, "view", 200.0), // 8 min before click 100 → joins
      Ev(t("2024-01-01 09:05:00"), 1, "view", 201.0), // 3 min before click 100 → joins
      Ev(t("2024-01-01 09:30:00"), 1, "view", 202.0), // 20 min before click 101 → out of range
      Ev(t("2024-01-01 09:07:00"), 2, "view", 203.0)) // user 2 → joins click 102 only
    def shapeC(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("value").cast("long").as("click_id"),
        col("ts").as("click_ts"))
    def shapeV(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id").as("v_user"), col("value").cast("long").as("view_id"),
        col("ts").as("view_ts"))
    val msC = MemoryStream[Ev]
    val msV = MemoryStream[Ev]
    msC.addData(clicksRaw: _*)
    msV.addData(viewsRaw: _*)
    // both sides watermarked — required for the engine to bound join state
    val joined = StreamOps.clickViewIntervalJoin(
      shapeC(msC.toDF()).withWatermark("click_ts", "1 hour"),
      shapeV(msV.toDF()).withWatermark("view_ts", "1 hour"))
    runToMemory(joined, "ssj1", "append")
    val streamed = spark.table("ssj1").orderBy("user_id", "click_id", "view_id")
      .collect().map(_.toString).toSeq
    val batch = StreamOps.clickViewIntervalJoin(
        shapeC(clicksRaw.toDF()), shapeV(viewsRaw.toDF()))
      .orderBy("user_id", "click_id", "view_id")
      .collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.size == 3,
      s"streamed=$streamed batch=$batch")
  }

  test("stream-stream LEFT OUTER join emits unmatched clicks after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val msC = MemoryStream[Ev]
    val msV = MemoryStream[Ev]
    def shapeC(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("value").cast("long").as("click_id"),
        col("ts").as("click_ts"))
    def shapeV(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id").as("v_user"), col("value").cast("long").as("view_id"),
        col("ts").as("view_ts"))
    // tight 10s watermark so the unmatched row's state can expire in-test
    val joined = StreamOps.clickViewIntervalJoin(
      shapeC(msC.toDF()).withWatermark("click_ts", "10 seconds"),
      shapeV(msV.toDF()).withWatermark("view_ts", "10 seconds"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssjlo")
      .outputMode("append").start()
    msC.addData(
      Ev(t("2024-01-01 09:08:00"), 1, "click", 100.0), // matched by the view
      Ev(t("2024-01-01 10:30:00"), 3, "click", 101.0)) // no view → null emit
    msV.addData(Ev(t("2024-01-01 09:05:00"), 1, "view", 200.0))
    q.processAllAvailable()
    // advance both watermarks far past 10:30 so the unmatched click closes
    msC.addData(Ev(t("2024-01-01 12:00:00"), 9, "click", 900.0))
    msV.addData(Ev(t("2024-01-01 12:00:00"), 9, "view", 901.0))
    q.processAllAvailable()
    msC.addData(Ev(t("2024-01-01 13:00:00"), 9, "click", 902.0))
    msV.addData(Ev(t("2024-01-01 13:00:00"), 9, "view", 903.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjlo").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(rows.contains((1L, 100L, 200L)), s"matched pair missing: $rows")
    assert(rows.contains((3L, 101L, -1L)),
      s"unmatched click must emit with null view after watermark: $rows")
  }

  test("file sink restart from checkpoint does not duplicate data") {
    implicit val sqlCtx = spark.sqlContext
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_scratch/ckpt_test"
    for (sub <- Seq("out", "ckpt")) {
      val d = new java.io.File(s"$base/$sub")
      if (d.exists()) { import scala.reflect.io.Directory; new Directory(d).deleteRecursively() }
    }
    val ms = MemoryStream[Ev]
    def run(): Unit = {
      val q = ms.toDF().writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    ms.addData(Ev(t("2024-01-01 09:00:00"), 1, "click", 1.0),
      Ev(t("2024-01-01 09:01:00"), 2, "view", 2.0))
    run()
    // second, NEW query instance resumes from the same checkpoint: the
    // first batch must not be re-emitted (exactly-once file sink)
    ms.addData(Ev(t("2024-01-01 09:02:00"), 3, "error", 3.0))
    run()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 3, s"expected exactly-once output, got ${out.count()}")
    assert(out.select("user_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("streaming near-dup gate: graft_minhash runs in a stream, bands dedup") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.VectorExprs.register(spark)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs: _*)
    val gated = ms.toDF().toDF("doc_id", "text")
      .selectExpr("doc_id", "graft_minhash(text) AS sig")
      .selectExpr("doc_id", "md5(concat(sig[0], sig[1])) AS b0")
      .dropDuplicates("b0")
    runToMemory(gated, "neardup1", "append")
    val streamed = spark.table("neardup1")
    // stream keeps ONE doc per band hash — the same survivor-set SIZE as
    // the batch equivalent (which survivor wins depends on arrival order)
    val batch = SparkEntry.queries("j_stream_neardup")(spark, sfDir)
    assert(streamed.count() == batch.count())
    assert(streamed.select("b0").distinct().count() == streamed.count())
    // and every streamed survivor's band exists in the batch band set
    val batchBands = batch.select("b0").collect().map(_.getString(0)).toSet
    val streamBands = streamed.select("b0").collect().map(_.getString(0)).toSet
    assert(streamBands == batchBands)
  }

  test("RocksDB state store: windowed agg state survives provider swap") {
    // the production state store at 100 TB of stream state is RocksDB
    // (bounded JVM heap, spill to local disk) — the same windowed
    // aggregation must produce identical results under it
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Seq(
        Ev(t("2024-01-01 09:10:00"), 1, "click", 1.0),
        Ev(t("2024-01-01 09:20:00"), 1, "click", 2.0),
        Ev(t("2024-01-01 10:05:00"), 2, "view", 3.0),
        Ev(t("2024-01-01 12:00:00"), 1, "click", 4.0))
      val ms = MemoryStream[Ev]
      ms.addData(evs: _*)
      runToMemory(StreamOps.tumblingWithWatermark(ms.toDF(), "1 hour"),
        "rocks1", "complete")
      val streamed = spark.table("rocks1")
        .orderBy("ws").collect().map(_.toString).toSeq
      // the same data through the plain batch formulation
      val batch = StreamOps.tumbling(evs.toDF())
        .orderBy("ws").collect().map(_.toString).toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("RocksDB state store: custom-state sessionizer and stream-stream join are provider-invariant") {
    // the other two 100-TB state shapes beside the windowed agg: the
    // flatMapGroupsWithState sessionizer (arbitrary user state +
    // EventTimeTimeout eviction) and the dual-buffer stream-stream
    // interval join — both must produce IDENTICAL output under the
    // RocksDB provider (bounded heap, local-disk spill), or the provider
    // is not a deployment knob but a semantics change
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessEvent
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // --- sessionizer under RocksDB (the EventTimeTimeout scenario)
      val ms = MemoryStream[SessEvent]
      val q = StreamOps.sessionize(ms.toDS(), gapMinutes = 30,
          watermarkDelay = "10 seconds")
        .toDF().writeStream.format("memory").queryName("rocks_sess")
        .outputMode("append").start()
      ms.addData(SessEvent(1, t("2024-01-01 09:00:00")),
        SessEvent(1, t("2024-01-01 09:05:00")))
      q.processAllAvailable()
      ms.addData(SessEvent(2, t("2024-01-01 11:00:00")))
      q.processAllAvailable()
      ms.addData(SessEvent(2, t("2024-01-01 11:01:00")))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("rocks_sess").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(rows.count(_._1 == 1L) == 1,
        s"user 1 session emitted once under RocksDB, got: ${rows.toSeq}")
      assert(rows.find(_._1 == 1L).get ==
        ((1L, t("2024-01-01 09:00:00"), t("2024-01-01 09:05:00"), 2L)))
      // --- stream-stream interval join under RocksDB vs the batch truth
      val clicksRaw = Seq(
        Ev(t("2024-01-01 09:08:00"), 1, "click", 100.0),
        Ev(t("2024-01-01 09:50:00"), 1, "click", 101.0),
        Ev(t("2024-01-01 09:08:00"), 2, "click", 102.0))
      val viewsRaw = Seq(
        Ev(t("2024-01-01 09:00:00"), 1, "view", 200.0),
        Ev(t("2024-01-01 09:05:00"), 1, "view", 201.0),
        Ev(t("2024-01-01 09:30:00"), 1, "view", 202.0),
        Ev(t("2024-01-01 09:07:00"), 2, "view", 203.0))
      def shapeC(df: org.apache.spark.sql.DataFrame) = df
        .select(col("user_id"), col("value").cast("long").as("click_id"),
          col("ts").as("click_ts"))
      def shapeV(df: org.apache.spark.sql.DataFrame) = df
        .select(col("user_id").as("v_user"), col("value").cast("long").as("view_id"),
          col("ts").as("view_ts"))
      val msC = MemoryStream[Ev]
      val msV = MemoryStream[Ev]
      msC.addData(clicksRaw: _*)
      msV.addData(viewsRaw: _*)
      val joined = StreamOps.clickViewIntervalJoin(
        shapeC(msC.toDF()).withWatermark("click_ts", "1 hour"),
        shapeV(msV.toDF()).withWatermark("view_ts", "1 hour"))
      runToMemory(joined, "rocks_ssj", "append")
      val streamed = spark.table("rocks_ssj")
        .orderBy("user_id", "click_id", "view_id").collect().map(_.toString).toSeq
      val batch = StreamOps.clickViewIntervalJoin(
          shapeC(clicksRaw.toDF()), shapeV(viewsRaw.toDF()))
        .orderBy("user_id", "click_id", "view_id").collect().map(_.toString).toSeq
      assert(streamed == batch && streamed.size == 3,
        s"RocksDB streamed=$streamed batch=$batch")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("rate source: live trigger-interval run drains the backlog through the sessionizer") {
    // The sandbox's closest analog to a message bus: `rate` generates rows
    // continuously while the query runs, so unlike the MemoryStream tests
    // each ProcessingTime trigger drains whatever backlog accumulated since
    // the last one. Event time is derived DETERMINISTICALLY from `value`
    // (wall-clock timestamps would make every assertion racy): user =
    // value % 4, per-user index k = value DIV 4, session group g = k DIV 50.
    // Within a group events are 1 s apart; consecutive groups sit 1 h apart
    // (> the 30-min gap), so every group is exactly one 50-event session —
    // any closed session must have n_events = 50 and a 49 s span no matter
    // how many rows the wall clock let the source generate.
    import org.apache.spark.sql.streaming.Trigger
    val evs = spark.readStream.format("rate")
      .option("rowsPerSecond", 400).option("numPartitions", 2).load()
      .selectExpr("value % 4 AS user_id", "value DIV 4 AS k")
      .selectExpr("user_id",
        "timestamp'2024-01-01 00:00:00' + (k DIV 50) * INTERVAL 1 HOUR" +
          " + (k % 50) * INTERVAL 1 SECOND AS ts")
      .as[graft.streaming.SessEvent]
    val q = StreamOps.sessionize(evs, gapMinutes = 30, watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("rate_sess")
      .outputMode("append").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      // poll until at least 2 sessions per user have closed (≈3–4 s of
      // generation) — bounded by a deadline so a hang fails, not wedges
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      while (spark.table("rate_sess").count() < 8 && System.nanoTime() < deadline)
        Thread.sleep(200)
      val rows = spark.table("rate_sess")
        .selectExpr("user_id", "n_events",
          "unix_timestamp(session_end) - unix_timestamp(session_start) AS span_s",
          "second(session_start) AS start_sec")
        .collect()
      assert(rows.length >= 8, s"only ${rows.length} sessions closed before deadline")
      assert(rows.forall(_.getLong(1) == 50L),
        s"session with lost/duplicated events: ${rows.filter(_.getLong(1) != 50L).mkString(",")}")
      assert(rows.forall(r => r.getLong(2) == 49L && r.getInt(3) == 0),
        "session bounds off the deterministic grid")
      assert(rows.map(_.getLong(0)).distinct.sorted.sameElements(Seq(0L, 1L, 2L, 3L)),
        "expected closed sessions from all 4 round-robin users")
      // the live-source property: multiple triggers each ingested fresh rows
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "expected at least two non-empty micro-batches from the live source")
    } finally q.stop()
  }

  test("batch and stream produce identical session windows") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(t("2024-01-01 09:00:00"), 1, "a", 1.0),
      Ev(t("2024-01-01 09:10:00"), 1, "b", 1.0), // same session (10 min gap)
      Ev(t("2024-01-01 10:00:00"), 1, "c", 1.0)) // 50 min gap → new session
    val ms = MemoryStream[Ev]
    ms.addData(evs: _*)
    runToMemory(StreamOps.sessions(ms.toDF()), "sveq", "complete")
    val streamed = spark.table("sveq").orderBy("session_start").collect().map(_.toString).toSeq
    val batch = StreamOps.sessions(evs.toDF()).orderBy("session_start").collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.size == 2)
  }

  // ---- BusSource: the DSv2 micro-batch contract, run against BOTH
  // brokers behind the seam (mem = in-JVM logs, file = on-disk logs with
  // atomic offset slots). Identical matrix, so "swap the broker, keep
  // every Spark-facing line" is a tested property, not scaladoc prose.

  import graft.sources.{BusBroker, BusOffset}

  private val brokerKinds = Seq("mem", "file")

  private def busTopic(kind: String): String = {
    val id = java.util.UUID.randomUUID().toString.take(8)
    if (kind == "file") "file:" + graft.queries.scratch(s"bus_file_$id")
    else s"bus_spec_$id"
  }

  test("bus source: offsets JSON-roundtrip through the checkpoint format") {
    val o = BusOffset(Array(0L, 17L, 123456789012L))
    assert(BusOffset.parse(o.json()).ends.sameElements(o.ends))
    assert(BusOffset.parse(BusOffset(Array.empty[Long]).json()).ends.isEmpty)
  }

  test("file broker: concurrent publishers get dense unique offsets, state is on disk") {
    val topic = busTopic("file")
    BusBroker.create(topic, 1)
    try {
      // 4 racing publisher threads — the create-if-absent slot protocol
      // must serialize them without loss (the cross-process story run
      // in-process: the contention path is identical, the state is disk)
      val ts = (0 until 4).map(w => new Thread(() =>
        (0 until 10).foreach(i => { BusBroker.publish(topic, s"k$w-$i", s"v$w-$i"); () })))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(BusBroker.endOffsets(topic).toSeq == Seq(40L))
      val recs = BusBroker.fetch(topic, 0, 0L, 40L)
      assert(recs.map(_._1).toSeq == (0L until 40L), "offsets not dense")
      assert(recs.map(_._2).distinct.length == 40, "a record was overwritten")
    } finally BusBroker.delete(topic)
  }

  for (kind <- brokerKinds)
  test(s"bus source [$kind]: multi-partition range planning reads every record exactly once") {
    val topic = busTopic(kind)
    BusBroker.create(topic, 3)
    try {
      (0 until 97).foreach(i => BusBroker.publish(topic, s"k$i", s"v$i"))
      val name = s"bus_mp_$kind"
      val q = spark.readStream.format("graft.sources.BusSource")
        .option("topic", topic).load()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val rows = spark.table(name).collect()
      assert(rows.length == 97, s"expected 97 records, got ${rows.length}")
      // (partition, offset) identity: no record read twice, none skipped
      assert(rows.map(r => (r.getInt(0), r.getLong(1))).distinct.length == 97)
      // the keyed producer spread 97 distinct keys over all 3 partitions
      assert(rows.map(_.getInt(0)).distinct.sorted.toSeq == Seq(0, 1, 2))
      // payload fidelity end to end
      assert(rows.map(r => r.getString(2) -> r.getString(3)).toMap ==
        (0 until 97).map(i => s"k$i" -> s"v$i").toMap)
      // same key always lands on the same partition (keyed-producer contract)
      assert(rows.groupBy(_.getString(2)).forall(_._2.map(_.getInt(0)).distinct.length == 1))
    } finally BusBroker.delete(topic)
  }

  for (kind <- brokerKinds)
  test(s"bus source [$kind]: checkpoint restart resumes from committed offsets, no duplication") {
    val topic = busTopic(kind)
    BusBroker.create(topic, 2)
    val ckpt = graft.queries.scratch(
      s"bus_ckpt_${java.util.UUID.randomUUID().toString.take(8)}")
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.BusSource")
        .option("topic", topic).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val vs = df.select("value").collect().map(_.getString(0))
          seen.synchronized { seen ++= vs }
          ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    try {
      (0 until 50).foreach(i => BusBroker.publish(topic, s"k$i", s"a$i"))
      drain()
      assert(seen.toSet == (0 until 50).map(i => s"a$i").toSet)
      (0 until 30).foreach(i => BusBroker.publish(topic, s"k$i", s"b$i"))
      drain() // second query, SAME checkpoint: must start past batch 1
      assert(seen.length == 80,
        s"restart re-read committed records: ${seen.length} total, expected 80")
      assert(seen.toSet ==
        ((0 until 50).map(i => s"a$i") ++ (0 until 30).map(i => s"b$i")).toSet)
    } finally BusBroker.delete(topic)
  }

  for (kind <- brokerKinds)
  test(s"bus source [$kind]: Trigger.AvailableNow drains the backlog, caps at start, stops itself") {
    import org.apache.spark.sql.streaming.Trigger
    val topic = busTopic(kind)
    BusBroker.create(topic, 2)
    try {
      (0 until 30).foreach(i => BusBroker.publish(topic, s"k$i", s"v$i"))
      val q = spark.readStream.format("graft.sources.BusSource")
        .option("topic", topic).load()
        .writeStream.format("memory").queryName(s"bus_an_$kind").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow query did not stop itself")
      assert(spark.table(s"bus_an_$kind").count() == 30)
      // a second AvailableNow run picks up exactly the records published
      // after the first run's cap (fresh query, no checkpoint → from
      // earliest, so 30 old + 5 new)
      (0 until 5).foreach(i => BusBroker.publish(topic, s"n$i", s"w$i"))
      val q2 = spark.readStream.format("graft.sources.BusSource")
        .option("topic", topic).load()
        .writeStream.format("memory").queryName(s"bus_an2_$kind").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      assert(q2.awaitTermination(120000))
      assert(spark.table(s"bus_an2_$kind").count() == 35)
    } finally BusBroker.delete(topic)
  }

  for (kind <- brokerKinds)
  test(s"bus source [$kind]: maxRecordsPerTrigger paces the backlog into bounded batches") {
    val topic = busTopic(kind)
    BusBroker.create(topic, 3)
    try {
      (0 until 100).foreach(i => BusBroker.publish(topic, s"k$i", s"v$i"))
      val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("graft.sources.BusSource")
        .option("topic", topic).option("maxRecordsPerTrigger", "16").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = df.count()
          sizes.synchronized { sizes += n }
          ()
        }.start()
      q.processAllAvailable(); q.stop()
      val nonEmpty = sizes.filter(_ > 0)
      assert(nonEmpty.sum == 100, s"lost/duplicated records: $sizes")
      assert(nonEmpty.forall(_ <= 16), s"a batch exceeded the limit: $sizes")
      assert(nonEmpty.length >= 7, s"backlog not paced: $sizes") // ceil(100/16)
    } finally BusBroker.delete(topic)
  }

  for (kind <- brokerKinds)
  test(s"bus source [$kind]: a fresh query replays the retained log from earliest") {
    val topic = busTopic(kind)
    BusBroker.create(topic, 2)
    try {
      (0 until 40).foreach(i => BusBroker.publish(topic, s"k$i", s"v$i"))
      def readAll(name: String): Long = {
        val q = spark.readStream.format("graft.sources.BusSource")
          .option("topic", topic).load()
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        q.processAllAvailable(); q.stop()
        spark.table(name).count()
      }
      // two independent queries (no shared checkpoint): each reads the full
      // log — the broker retains records, consumption does not destroy them
      assert(readAll(s"bus_replay_1_$kind") == 40)
      assert(readAll(s"bus_replay_2_$kind") == 40)
    } finally BusBroker.delete(topic)
  }

  test("txn stream source: checkpoint restart resumes at the committed version, no replay") {
    import graft.sources.TxnTable
    val base = graft.queries.scratch("txn_stream_restart")
    // wipe the WHOLE base: a stale checkpoint/out pair from a previous JVM
    // run would pin offsets the fresh table can't serve
    locally {
      val d = new java.io.File(base)
      if (d.exists()) { import scala.reflect.io.Directory; new Directory(d).deleteRecursively(): Unit }
    }
    val t = TxnTable.fresh(spark, s"$base/tbl")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v0
    t.append(Seq((3L, "c")).toDF("k", "v"))            // v1
    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.TxnStreamSource")
        .option("path", s"$base/tbl").load()
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    drain()
    assert(spark.read.parquet(s"$base/out").count() == 3)
    // commits land while NO query runs; a fresh query on the same
    // checkpoint must deliver exactly the new versions — the offset is
    // the commit version, so the restart contract is one number
    t.append(Seq((4L, "d")).toDF("k", "v"))            // v2
    t.compact(target = 1)                              // v3: silent
    t.append(Seq((5L, "e")).toDF("k", "v"))            // v4
    drain()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 5, "restart must neither replay nor lose commits")
    assert(out.select("k").as[Long].collect().sorted.toSeq == (1L to 5L))
  }

  test("txn stream source: Trigger.AvailableNow drains the log and stops itself") {
    // the nightly catch-up mode: the engine's v1-source wrapper snapshots
    // the available offset at start, drains to it, and terminates —
    // commits landing after the run wait for the next scheduled one
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.TxnTable
    val t = TxnTable.fresh(spark, graft.queries.scratch("txn_stream_an"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.append(Seq((3L, "c")).toDF("k", "v"))
    def drainOnce(name: String): Long = {
      val q = spark.readStream.format("graft.sources.TxnStreamSource")
        .option("path", t.root).load()
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow query did not stop itself")
      spark.table(name).count()
    }
    assert(drainOnce("txn_an_1") == 3)
    t.append(Seq((4L, "d")).toDF("k", "v"))
    // fresh query, no checkpoint → from the beginning again, now 4 rows
    assert(drainOnce("txn_an_2") == 4)
  }

  test("txn stream source: maxVersionsPerTrigger bounds every batch and composes with AvailableNow") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.TxnTable
    val base = graft.queries.scratch("txn_stream_cap")
    locally {
      val d = new java.io.File(base)
      if (d.exists()) { import scala.reflect.io.Directory; new Directory(d).deleteRecursively(): Unit }
    }
    val t = TxnTable.fresh(spark, s"$base/tbl")
    // a 10-version backlog, one row per version, BEFORE any query runs
    (1L to 10L).foreach(i => t.append(Seq((i, s"r$i")).toDF("k", "v")))
    def reader = spark.readStream.format("graft.sources.TxnStreamSource")
      .option("path", s"$base/tbl").option("maxVersionsPerTrigger", "3").load()
    // continuous trigger: the backlog must drain in ≥4 batches of ≤3
    // versions (1 row each) — including the FIRST batch: admission
    // control receives the start position from the engine, so there is
    // no uncapped anchor batch
    locally {
      val q = reader.writeStream.format("memory").queryName("txn_cap_cont")
        .outputMode("append").start()
      q.processAllAvailable();
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
      q.stop()
      assert(spark.table("txn_cap_cont").count() == 10)
      assert(sizes.forall(_ <= 3), s"a batch exceeded the version cap: $sizes")
      assert(sizes.length >= 4, s"backlog drained in too few batches: $sizes")
    }
    // AvailableNow: same bounded batches, drains to the start-time tip,
    // stops itself; a commit landing mid-drain waits for the next run
    def drainAvailableNow(): Seq[Long] = {
      val q = reader.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt_an").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow query did not stop itself")
      q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    }
    locally {
      val sizes = drainAvailableNow()
      assert(spark.read.parquet(s"$base/out").count() == 10)
      assert(sizes.forall(_ <= 3) && sizes.length >= 4,
        s"AvailableNow must drain capped: $sizes")
    }
    // checkpoint restart under the cap: new commits resume from the
    // COMMITTED version (the engine supplies the position — no replay,
    // no skip), still capped
    t.append(Seq((11L, "r11")).toDF("k", "v"))
    t.append(Seq((12L, "r12")).toDF("k", "v"))
    locally {
      drainAvailableNow()
      assert(spark.read.parquet(s"$base/out").select("k").as[Long].collect()
        .sorted.toSeq == (1L to 12L),
        "restart must deliver exactly the new versions")
    }
  }

  test("graft-txn native sink: ledger-backed exactly-once, engine-level crash replay is a no-op") {
    import graft.sources.TxnTable
    val base = graft.queries.scratch("txn_sink")
    locally {
      val d = new java.io.File(base)
      if (d.exists()) { import scala.reflect.io.Directory; new Directory(d).deleteRecursively(): Unit }
    }
    val src = TxnTable.fresh(spark, s"$base/src")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    def run(): Unit = {
      // BOTH directions through the registered short name: the format's
      // createSource (stream read) and createSink (stream write) paths
      val q = spark.readStream.format("graft-txn")
        .option("path", s"$base/src").load()
        .writeStream.format("graft-txn")
        .option("path", s"$base/dst").option("txnAppId", "sink_app")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()                                          // batch 0: the base drain
    val dst = TxnTable.at(spark, s"$base/dst")
    assert(dst.read().count() == 2)
    src.append(Seq((3L, "c")).toDF("k", "v"))
    run()                                          // batch 1: incremental hop
    assert(dst.read().count() == 3)
    val versionsBefore = dst.currentVersion
    // CRASH WINDOW, driven through the engine itself: the sink committed
    // batch 1 but the streaming commit log lost its entry (sink-committed
    // / checkpoint-not-advanced). The restarted query REPLAYS batch 1
    // into addBatch — and the (app, batch) ledger must no-op it.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val lastCommit = Files.list(Paths.get(s"$base/ckpt/commits"))
    val names = try lastCommit.iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit)).toList
      finally lastCommit.close()
    val lastBatch = names.map(_.toLong).max
    Files.delete(Paths.get(s"$base/ckpt/commits/$lastBatch"))
    // the local-FS checksum shadow must go too, or the replay's rename dies
    Files.deleteIfExists(Paths.get(s"$base/ckpt/commits/.$lastBatch.crc"))
    run()                                          // replay of batch 1
    assert(dst.read().count() == 3, "crash replay duplicated a batch")
    assert(dst.currentVersion == versionsBefore,
      "the replayed batch must not create a new commit")
    // and the pipeline keeps flowing after the replay
    src.append(Seq((4L, "d")).toDF("k", "v"))
    run()                                          // batch 2
    assert(dst.read().select("k").as[Long].collect().sorted.toSeq ==
      (1L to 4L))
    // wrong mode fails loudly at sink construction
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft.sources.TxnStreamSource")
        .option("path", s"$base/src").load()
        .writeStream.format("graft-txn")
        .option("path", s"$base/dst").option("txnAppId", "sink_app")
        .outputMode("update").start()
    }
  }

  test("txn stream source: a mid-stream rename fails loudly; a restarted stream binds the new schema") {
    import graft.sources.TxnTable
    val base = graft.queries.scratch("txn_stream_ren")
    locally {
      val d = new java.io.File(base)
      if (d.exists()) { import scala.reflect.io.Directory; new Directory(d).deleteRecursively(): Unit }
    }
    val t = TxnTable.fresh(spark, s"$base/tbl")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val q = spark.readStream.format("graft.sources.TxnStreamSource")
      .option("path", s"$base/tbl").load()
      .writeStream.format("memory").queryName("txn_ren_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("txn_ren_sink").count() == 1)
    // rename + append under the new name: the running stream, pinned to
    // the creation-time schema, must FAIL (NULL-filling the renamed
    // column would silently corrupt the feed), not limp on
    t.renameColumn("v", "val2")
    t.append(Seq((2L, "b")).toDF("k", "val2"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(ex.getMessage.contains("renamed") || Option(ex.getCause)
      .exists(_.getMessage.contains("renamed")), s"wrong failure: $ex")
    // a fresh stream binds the CURRENT schema and reads both eras merged
    val q2 = spark.readStream.format("graft.sources.TxnStreamSource")
      .option("path", s"$base/tbl").load()
      .writeStream.format("memory").queryName("txn_ren_sink2")
      .outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("txn_ren_sink2")
    assert(got.columns.toSeq == Seq("k", "val2"))
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("txn stream source: a content-replacing commit fails the append feed loudly") {
    import graft.sources.TxnTable
    val base = graft.queries.scratch("txn_stream_replace")
    val t = TxnTable.fresh(spark, s"$base/tbl")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val q = spark.readStream.format("graft.sources.TxnStreamSource")
      .option("path", s"$base/tbl").load()
      .writeStream.format("memory").queryName("txn_stream_replace_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("txn_stream_replace_sink").count() == 1)
    // an overwrite invalidates incremental consumption — the stream must
    // DIE (re-sync from a snapshot), not re-deliver replaced content
    t.overwrite(Seq((9L, "z")).toDF("k", "v"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000): Unit
    }
    // the CDC feed, by contrast, streams THROUGH replacing commits…
    val t2 = TxnTable.fresh(spark, s"$base/tbl2")
    t2.append(Seq((1L, 10L), (2L, 60L)).toDF("k", "n"))
    t2.deleteWhere(col("n") > 50, cdc = true)
    val q2 = spark.readStream.format("graft.sources.TxnStreamSource")
      .option("path", s"$base/tbl2").option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("txn_stream_cdc_sink2")
      .outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val feed = spark.table("txn_stream_cdc_sink2")
    assert(feed.filter(col("_change_type") === "delete").count() == 1)
    assert(feed.filter(col("_change_type") === "insert").count() == 2)
    // …but a DML commit written WITHOUT cdc=true kills it, same posture
    t2.merge(Seq((1L, 11L)).toDF("k", "n"), Seq("k")) // no sidecar
    val q3 = spark.readStream.format("graft.sources.TxnStreamSource")
      .option("path", s"$base/tbl2").option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("txn_stream_cdc_sink3")
      .outputMode("append").start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
      q3.awaitTermination(30000): Unit
    }
  }
}
