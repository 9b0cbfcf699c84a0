package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

/** The transactional table as a NATIVE STREAMING SINK:
  * `writeStream.format("graft-txn").option("path", root)`. Each
  * micro-batch commits through `appendIdempotent` with the sink's
  * (appId, batchId) tag in the commit-log entry, so EXACTLY-ONCE is a
  * property of the SINK's commit protocol — not of a user-supplied
  * foreachBatch function remembering to dedup. The classic at-least-once
  * crash window (sink committed, streaming checkpoint not yet advanced)
  * replays `addBatch` with the same batchId, and the log's ledger turns
  * the replay into a no-op; batch ids are monotone per checkpoint, which
  * Structured Streaming guarantees.
  *
  * App identity: `txnAppId` option if set, else the query's checkpoint
  * location — both stable across restarts of the same query, which is
  * exactly the scope the dedup must cover. Two DIFFERENT queries writing
  * the same table get different ledger rows and interleave safely under
  * the log's optimistic concurrency.
  *
  * This is a v1 `Sink` (the API shape Delta's sink uses), deliberately:
  * `addBatch` receives the planned frame, re-wraps it as a batch frame
  * (`Bridge.asBatch` — the engine's own file sink does the same
  * internally), and the table's staging write handles distribution;
  * commit cost stays one KB metadata publish per micro-batch regardless
  * of batch size. Append-mode only: update/complete modes would require
  * replacing content per batch, which is `overwrite`/`merge` territory,
  * not a streaming ledger's.
  */
class TxnSink extends StreamSinkProvider {
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-txn sink supports Append output mode only, got $outputMode")
    require(partitionColumns.isEmpty,
      "graft-txn sink does not support partitionBy: the table format's " +
        "layout comes from compact(clusterBy = ...) on the table itself — " +
        "silently ignoring the requested partitioning would mislead")
    def opt(key: String): Option[String] =
      parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
    val path = opt("path").getOrElse(throw new IllegalArgumentException(
      "graft-txn sink needs .option(\"path\", <table root>)"))
    val appId = opt("txnAppId").orElse(opt("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-txn sink needs a stable app identity: set " +
          ".option(\"txnAppId\", ...) or a checkpointLocation"))
    new GraftTxnSink(ctx, path, appId)
  }
}

private[sources] class GraftTxnSink(ctx: SQLContext, root: String,
    appId: String) extends Sink {
  private val table = TxnTable.at(ctx.sparkSession, root)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graftbridge.Bridge.asBatch(data)
    // -1 = the ledger already holds this (or a later) batch: a post-crash
    // replay or a concurrent twin — dropped, making redelivery exactly-once
    table.appendIdempotent(batch, appId, batchId)
    ()
  }

  override def toString: String = s"GraftTxnSink[$root]"
}
