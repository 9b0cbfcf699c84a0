package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The transactional table as a STREAMING SOURCE: a Structured Streaming
  * query tails the commit log, and each micro-batch delivers the data
  * committed in a `(startVersion, endVersion]` range — the Delta-style
  * "table as a topic" mode that turns every txn table into a replayable
  * feed with the streaming checkpoint carrying just one number.
  *
  * Two modes, chosen by `readChangeFeed`:
  *
  *  - default: the APPEND feed (`changesSince`) — each batch reads only
  *    the files appended in its version range; compact rewrites deliver
  *    nothing (dataChange=false), and a content-replacing commit
  *    (overwrite / merge / delete / restore) FAILS the query: silently
  *    re-delivering replaced rows as if they were new is corruption, the
  *    consumer must re-sync from a snapshot.
  *  - `readChangeFeed=true`: the row-level CDC feed (`readChanges`) —
  *    inserts / deletes / update pre+post images with `_change_type` and
  *    `_commit_version` columns; DML commits must have been written with
  *    `cdc = true` (their sidecars are the feed).
  *
  * This is a v1 `Source` (the same API Delta's streaming source uses),
  * deliberately: `getBatch` can then hand back a REAL DataFrame — the
  * full parquet reader with column pruning and filter pushdown — instead
  * of re-implementing parquet decode inside a DSv2 PartitionReader. The
  * offset is the commit version (`LongOffset`), so checkpoint state is a
  * few bytes however large the table; on restart the engine replays
  * `getBatch(checkpointed, latest)` and the version fold makes that
  * exactly-once. `startingVersion` (default: everything) starts the tail
  * mid-log — the "consume from now on" mode.
  *
  * Scale posture: offset discovery is one KB-scale log listing per
  * trigger; a batch's read cost is ∝ the files its version range added
  * (never table size); nothing here collects data rows on the driver.
  *
  * Admission control: the source ALSO implements the connector-level
  * `SupportsTriggerAvailableNow` (⊃ `SupportsAdmissionControl`) — the
  * public pattern a v1 Kafka-style source uses — so the engine calls
  * `latestOffset(start, limit)` WITH the current position instead of the
  * position-blind `getOffset`. `maxVersionsPerTrigger` then caps every
  * batch at `start + N` versions with no unsafe anchoring window (the
  * engine supplies the start, including across checkpoint restarts),
  * and `Trigger.AvailableNow` composes: `prepareForTriggerAvailableNow`
  * snapshots the tip, the capped batches drain UP TO that snapshot in
  * bounded steps, and the query stops itself — a backlog catch-up that
  * never builds one table-sized batch.
  */
class TxnStreamSource extends StreamSourceProvider {
  import TxnStreamSource._

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName, schemaFor(ctx, opts(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val o = opts(parameters)
    new TxnSource(ctx, o, schemaFor(ctx, o))
  }
}

object TxnStreamSource {
  val shortName = "graft-txn-stream"

  private[sources] case class Opts(root: String, cdc: Boolean,
      startingVersion: Long, maxVersionsPerTrigger: Option[Long])

  private def opt(parameters: Map[String, String], key: String): Option[String] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  private[sources] def opts(parameters: Map[String, String]): Opts = Opts(
    opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft-txn-stream needs .option(\"path\", <table root>)")),
    opt(parameters, "readChangeFeed").exists(_.toBoolean),
    opt(parameters, "startingVersion").map(_.toLong).getOrElse(-1L),
    opt(parameters, "maxVersionsPerTrigger").map { s =>
      val n = s.toLong
      require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
      n
    })

  /** The stream schema is the LOG's current schema (never a footer pass);
    * the CDC mode appends the two feed metadata columns. The table must
    * already have a committed version — a stream over a not-yet-created
    * table has no schema to bind, so fail loudly rather than guess. */
  private[sources] def schemaFor(ctx: SQLContext, o: Opts): StructType = {
    val t = TxnTable.at(ctx.sparkSession, o.root)
    val v = t.currentVersion
    require(v >= 0, s"graft-txn-stream: no committed version in ${o.root}")
    val base = t.schemaAt(v).getOrElse(
      throw new IllegalStateException(s"no schema recorded in ${o.root}"))
    if (!o.cdc) base
    else StructType(base.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
  }
}

private[sources] class TxnSource(ctx: SQLContext,
    o: TxnStreamSource.Opts, override val schema: StructType)
    extends Source with SupportsTriggerAvailableNow {
  private val table = TxnTable.at(ctx.sparkSession, o.root)

  private def versionOf(off: AnyRef): Long = off match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset // checkpoint restart
    case other => throw new IllegalStateException(s"unexpected offset $other")
  }

  /** Latest available offset = the log tip; one KB-scale directory
    * listing, no data touched. (Position-blind legacy path — the engine
    * prefers the admission-controlled `latestOffset` below.) */
  override def getOffset: Option[V1Offset] = {
    val v = table.currentVersion
    if (v < 0) None else Some(LongOffset(v))
  }

  /** `Trigger.AvailableNow` drain ceiling: the tip snapshotted at query
    * start. Capped batches run up to it, then the query stops itself. */
  @volatile private var availableNowCap: Long = Long.MaxValue

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = table.currentVersion

  override def getDefaultReadLimit: ReadLimit =
    o.maxVersionsPerTrigger.fold(ReadLimit.allAvailable())(ReadLimit.maxRows)

  /** Admission-controlled offset discovery: the engine hands in the
    * CURRENT position (null on a fresh query — then `startingVersion`),
    * so a version cap needs no anchoring heuristics and survives
    * checkpoint restarts exactly. The "rows" of the ReadMaxRows limit
    * are COMMIT VERSIONS — the unit this source's offset advances in. */
  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val tip = math.min(table.currentVersion, availableNowCap)
    if (tip < 0) return null
    val from = Option(start).map(versionOf).getOrElse(o.startingVersion)
    val end = limit match {
      case r: ReadMaxRows => math.min(tip, from + r.maxRows)
      case _ => tip
    }
    if (end <= from) null else LongOffset(end)
  }

  override def reportLatestOffset(): V2Offset = {
    val v = table.currentVersion
    if (v < 0) null else LongOffset(v)
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val since = start.map(versionOf).getOrElse(o.startingVersion)
    val upTo = versionOf(end)
    val df =
      if (o.cdc) table.readChanges(since, upTo)
      else table.changesSince(since, upTo)
    // pin every batch to the CREATION-time schema: changesSince binds each
    // batch at that batch's log tip, so a mid-stream additive evolution
    // would hand the engine a frame WIDER than the declared source schema
    // (misbound columns downstream). Columns the old schema lacks are
    // dropped — the restarted stream then picks up the evolved schema,
    // Delta-style. A declared column MISSING from the batch means a
    // rename/drop landed mid-stream (append evolution only ever widens
    // the tip schema): NULL-filling would silently corrupt the feed, so
    // fail with the restart message instead.
    val missing = schema.fieldNames.filterNot(df.columns.contains)
    if (missing.nonEmpty) throw new IllegalStateException(
      s"graft-txn-stream: column(s) ${missing.mkString(", ")} were renamed " +
        "or dropped after this stream started; restart the stream to bind " +
        "the table's current schema")
    // backquoted references: a plain col("a.b") would parse as a nested-
    // field path, not the literal column name
    val pinned = df.select(schema.fields.toSeq.map(f =>
      col(s"`${f.name}`").cast(f.dataType).as(f.name)): _*)
    // the engine requires a streaming-tagged frame from a v1 source
    org.apache.spark.sql.graftbridge.Bridge.asStreaming(pinned)
  }

  override def stop(): Unit = ()
}
