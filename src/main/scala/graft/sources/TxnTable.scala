package graft.sources

import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException, StandardOpenOption}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional table format: parquet data files + an append-only
  * commit log, giving atomic multi-file commits, snapshot-isolated reads,
  * time travel, and optimistic concurrency between writers — the piece the
  * plain `a_sink_*` keys can't model (a half-finished overwrite there is a
  * corrupt table; here it is invisible until its single log-entry publish).
  *
  * Layout under the table root:
  * {{{
  *   d-<uuid>/part-*.parquet     one staged directory per commit's data
  *   _txn_log/v00000.txn         one entry per version, 0..N contiguous
  * }}}
  *
  * A log entry is line-based (`action=`, `rows=`, `add=`/`remove=` with
  * tab-joined table-relative paths, optional `txn=app:batch` for
  * idempotent streaming appends, optional `schema=` carrying the table
  * schema as StructType JSON — reads bind the log's schema, never a
  * footer-merge pass). A commit stages its parquet files
  * first (invisible to readers — nothing references them), then publishes
  * the entry for version v+1 via an ATOMIC create-if-absent. Losing the
  * race throws, the writer re-reads the log and retries against the new
  * tip: appends always converge; overwrite recomputes its remove-set each
  * attempt (last-writer-wins on content, never lost-update on the log).
  *
  * The atomic primitive here is a hard-link publish (write temp fully,
  * `Files.createLink(target, tmp)` — POSIX-atomic, fails if the version
  * exists, readers see a complete entry or none). On HDFS the same slot
  * is rename-without-replace; on an object store, a conditional PUT
  * (if-none-match). Nothing else in the protocol changes — which is the
  * point: commit cost is one tiny metadata write regardless of data size,
  * and at 100 TB the log stays KBs while data files never move after
  * staging.
  *
  * Reads list the log (versions are dense, so the snapshot at v is the
  * fold of entries 0..v: live = live -- remove ++ add) and hand the live
  * file list straight to the parquet reader — column pruning and filter
  * pushdown apply unchanged. Old versions stay readable (time travel)
  * until `vacuum()` deletes files the LATEST snapshot no longer
  * references.
  *
  * Local-filesystem paths via java.nio keep the sandbox honest; a cluster
  * deployment swaps the file ops for the Hadoop FileSystem API without
  * touching the protocol.
  *
  * == Driver-memory ceiling (the format's scale bound) ==
  * Snapshot resolution folds the log DRIVER-side: `liveFiles` holds every
  * live path in driver memory, and `merge`/`deleteWhere` additionally
  * `collect()` the touched-file list. That is the standard shape for
  * log-structured table formats, and it bounds the format at
  * O(live files + log entries) driver heap — ~100 bytes per path means
  * one million files ≈ 100 MB: ample for this engine's compaction-
  * disciplined tables, but a 100 TB table of 10M+ small files would need
  * the fold moved into the data plane. The upgrade path (sketched in
  * SURVEY §7.6) is manifest files: each commit writes its add/remove sets
  * as a parquet MANIFEST, the log entry references manifests instead of
  * inlining paths, and snapshot resolution becomes a Spark anti-join over
  * manifest rows — distributed, never driver-resident. The commit
  * protocol (atomic create-if-absent of the next version slot) is
  * untouched by that swap, which is why it is deferred rather than built:
  * TxnSpec pins today's bound so the ceiling is explicit, not latent.
  */
final class TxnTable(val spark: SparkSession, val root: String) {
  private val rootP: Path = Paths.get(root)
  private val logP: Path = rootP.resolve("_txn_log")

  private case class Entry(version: Long, action: String, rows: Long,
      add: Seq[String], remove: Seq[String], txn: Option[(String, Long)],
      schema: Option[String])

  /** Files.list with the stream closed (it holds a directory handle). */
  private def ls(p: Path): List[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  // ----------------------------------------------------------------- log io

  private def entryFile(v: Long): Path = logP.resolve(f"v$v%05d.txn")

  private def parse(v: Long): Entry = {
    val kv = Files.readAllLines(entryFile(v), UTF_8).asScala
      .filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap
    def files(k: String) =
      kv.getOrElse(k, "").split('\t').toSeq.filter(_.nonEmpty)
    val txn = kv.get("txn").map { t =>
      val i = t.lastIndexOf(':')
      (t.substring(0, i), t.substring(i + 1).toLong)
    }
    Entry(v, kv("action"), kv("rows").toLong, files("add"), files("remove"),
      txn, kv.get("schema"))
  }

  /** Latest committed version, or -1 for an empty/absent log. Versions are
    * dense (the publish primitive makes v+1 impossible to skip), so the
    * max listed entry IS the tip. */
  def currentVersion: Long =
    if (!Files.isDirectory(logP)) -1L
    else ls(logP)
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".txn") =>
        s.substring(1, s.length - 4).toLong }
      .foldLeft(-1L)(math.max)

  private def entries(upTo: Long): Seq[Entry] = (0L to upTo).map(parse)

  private def liveFiles(version: Long): Seq[String] =
    entries(version).foldLeft(Vector.empty[String]) { (live, e) =>
      live.filterNot(e.remove.contains) ++ e.add
    }

  /** Publish entry `v` atomically; false = another writer won the slot. */
  private def tryCommit(v: Long, action: String, rows: Long,
      add: Seq[String], remove: Seq[String],
      txn: Option[(String, Long)] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Boolean = {
    Files.createDirectories(logP)
    val body = s"action=$action\nrows=$rows\n" +
      s"add=${add.mkString("\t")}\nremove=${remove.mkString("\t")}\n" +
      txn.fold("") { case (app, batch) => s"txn=$app:$batch\n" } +
      schema.fold("")(sc => s"schema=${sc.json}\n")
    val tmp = logP.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, body.getBytes(UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try { Files.createLink(entryFile(v), tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.delete(tmp)
  }

  // ------------------------------------------------------------------ write

  /** Stage `df` as parquet under an unreferenced directory; returns the
    * table-relative file paths and the exact row count. The count comes
    * straight from the parquet FOOTERS (block row counts), read
    * driver-side — KBs of metadata, no Spark job; a read-back count()
    * here would schedule one extra job per commit, which at one commit
    * per micro-batch is real overhead. */
  private def stage(df: DataFrame): (Seq[String], Long) = {
    val dir = s"d-${UUID.randomUUID()}"
    df.write.parquet(rootP.resolve(dir).toString)
    val files = ls(rootP.resolve(dir))
      .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
      .map(f => s"$dir/$f").sorted
    val conf = spark.sessionState.newHadoopConf()
    val rows = files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(abs(f)), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
    (files, rows)
  }

  private def abs(rel: String): String = rootP.resolve(rel).toString

  /** Table schema as of `version`: the last entry that recorded one.
    * Lives in the LOG (KBs), never inferred from data-file footers — at
    * 100 TB, schema resolution must not touch data files. */
  def schemaAt(version: Long): Option[org.apache.spark.sql.types.StructType] =
    entries(version).flatMap(_.schema).lastOption
      .map(org.apache.spark.sql.types.DataType.fromJson(_)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Additive-only evolution: every existing column keeps its name and
    * type (retypes/drops rejected); new columns append. Old data files
    * simply lack the new columns and read back as NULL under the log
    * schema — no file rewrite. */
  private def unionSchema(
      base: Option[org.apache.spark.sql.types.StructType],
      s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = base match {
    case None => s
    case Some(b) =>
      val byName = s.fields.map(f => f.name -> f).toMap
      b.fields.foreach { f =>
        byName.get(f.name).foreach { g =>
          require(g.dataType == f.dataType,
            s"schema evolution may not retype ${f.name}: " +
              s"${f.dataType.simpleString} -> ${g.dataType.simpleString}")
        }
      }
      org.apache.spark.sql.types.StructType(
        b.fields ++ s.fields.filterNot(f => b.fieldNames.contains(f.name)))
  }

  /** Shared append path: stage once, then loop { scan log prefix, check
    * the txn tag, merge the schema, claim the next slot } — see
    * `appendIdempotent` for why the scan+claim pair is race-free. */
  private def appendCommit(df: DataFrame, txn: Option[(String, Long)]): Long = {
    val (files, rows) = stage(df)
    var res = -2L
    while (res == -2L) {
      val tip = currentVersion
      if (txn.exists { case (app, b) => committedUpTo(app, tip) >= b }) res = -1L
      else {
        val sc = unionSchema(schemaAt(tip), df.schema)
        if (tryCommit(tip + 1, "append", rows, files, Nil, txn, Some(sc)))
          res = tip + 1
      }
    }
    res
  }

  def append(df: DataFrame): Long = appendCommit(df, None)

  private def committedUpTo(appId: String, tip: Long): Long =
    if (tip < 0) -1L
    else entries(tip).flatMap(_.txn)
      .collect { case (app, b) if app == appId => b }
      .foldLeft(-1L)(math.max)

  /** Highest batch id committed under `appId`, or -1 if none. A scan of
    * the log's txn tags — KBs of metadata, no data read. */
  def lastCommitted(appId: String): Long = committedUpTo(appId, currentVersion)

  /** Exactly-once streaming-sink primitive (the foreachBatch contract):
    * append `df` tagged `txn=appId:batchId` in its commit-log entry. If
    * the log already holds a batch ≥ `batchId` for this app — a
    * post-crash foreachBatch replay (the sink committed but the streaming
    * checkpoint didn't advance), or a concurrent twin of the same job —
    * the call is a NO-OP returning -1, and the caller's at-least-once
    * redelivery becomes exactly-once table content. Batch ids must be
    * monotone per app, which Structured Streaming guarantees per
    * checkpoint. A twin abandons its staged (unreferenced) files for
    * `vacuum` to reclaim.
    *
    * The tag check and the slot claim are one atomic unit WITHOUT a lock,
    * because versions are dense: each attempt scans tags over the log
    * prefix `0..tip` and then claims slot `tip+1`. If the claim succeeds,
    * no other commit landed at ≤ tip+1 in between — so the scanned prefix
    * was the complete log at commit time and cannot have hidden a twin's
    * tag. If the claim fails, the loop rescans the grown prefix. */
  def appendIdempotent(df: DataFrame, appId: String, batchId: Long): Long = {
    require(!appId.contains('\n') && !appId.contains('\t'), s"bad appId: $appId")
    if (lastCommitted(appId) >= batchId) return -1L // fast path: skip staging
    appendCommit(df, Some((appId, batchId)))
  }

  /** Replace the table content. The remove-set is recomputed on every
    * retry so a concurrent append's files are removed too, not orphaned
    * as silent extra rows (lost-update prevention). */
  def overwrite(df: DataFrame): Long = {
    val (files, rows) = stage(df)
    var done = false; var v = -1L
    while (!done) {
      v = currentVersion + 1
      val gone = if (v == 0) Nil else liveFiles(v - 1)
      // an overwrite REPLACES content, so it resets the schema to its own
      // (dropping columns via overwrite is legitimate; via append it isn't)
      done = tryCommit(v, "overwrite", rows, files, gone, None, Some(df.schema))
    }
    v
  }

  /** Rewrite the current live set into `target` files with identical
    * content — small-file compaction as one transaction (readers never
    * see a half-compacted table). With `clusterBy`, the rewrite
    * range-partitions and sorts on those columns (the OPTIMIZE/cluster
    * layout job): each output file then covers a disjoint key range, so
    * min/max file stats prune point and range reads to one file instead
    * of all of them — layout work a reader never has to repeat. */
  def compact(target: Int = 1, atTip: Long = -1L,
      clusterBy: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.col
    val v = if (atTip >= 0) atTip else currentVersion
    val gone = liveFiles(v)
    val base = read(v)
    val compacted =
      if (clusterBy.isEmpty) base.repartition(target)
      else base.repartitionByRange(target, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    val (files, rows) = stage(compacted)
    val done = tryCommit(v + 1, "compact", rows, files, gone, None,
      Some(compacted.schema))
    // a concurrent commit moved the tip: compaction of a stale snapshot
    // must NOT clobber it — give up rather than drop the newer data
    if (!done) throw new IllegalStateException(
      s"compact lost the race at v${v + 1}; re-run against the new tip")
    v + 1
  }

  // ------------------------------------------------------------------- read

  /** Snapshot read at `version` (default: latest). The returned plan scans
    * exactly the files live at that version. */
  def read(version: Long = -1L): DataFrame = {
    val v = if (version < 0) currentVersion else version
    require(v >= 0, s"no committed version in $root")
    val files = liveFiles(v).map(abs)
    schemaAt(v) match {
      // the LOG schema drives the scan: files staged before an additive
      // evolution lack the new columns and read as NULL — no footer
      // merge pass, no file rewrite
      case Some(sc) => spark.read.schema(sc).parquet(files: _*)
      case None => spark.read.parquet(files: _*)
    }
  }

  /** MERGE (upsert) at FILE granularity — the table format's DML: rows of
    * `updates` replace same-key rows, new keys append. Only files that
    * actually CONTAIN a matched key are rewritten; every untouched file
    * stays live in place, so merge cost is ∝ touched files + updates,
    * never table size (the whole point of file-level commit metadata).
    * Key matching is on `keyCols`; `updates` must carry the table schema
    * (or an additive evolution of it). Runs as ONE transaction: remove
    * touched files, add the rewritten+inserted files. Aborts on a
    * concurrent commit (like `compact`) rather than merging onto a stale
    * snapshot — the caller re-runs against the new tip.
    *
    * With `clusterBy` (typically = keyCols), the rewritten+inserted rows
    * are range-partitioned and sorted on those columns before staging —
    * the merge-time counterpart of clustered `compact`: each staged file
    * keeps a disjoint key range, so a table that was cluster-compacted
    * STAYS clustered across merges and the next point-update's touched
    * set is one file, not every file. Without it, inserted keys land
    * wherever the update batch put them and clustering erodes commit by
    * commit (the t_txn_merge 10x scale-stress showed ratio ~2 for exactly
    * that reason). */
  def merge(updates: DataFrame, keyCols: Seq[String],
      clusterBy: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val v = currentVersion
    require(v >= 0, s"no committed version in $root")
    val live = liveFiles(v)
    val keyExpr = keyCols.map(col)
    // absolute-path tag → table-relative, to match the log's file names
    val tagged = read(v).withColumn("_f", input_file_name())
    val absOf = live.map(f => "file://" + abs(f) -> f).toMap ++
      live.map(f => "file:" + abs(f) -> f).toMap ++ live.map(f => abs(f) -> f).toMap
    val touchedAbs = tagged
      .join(updates.select(keyExpr: _*).distinct(), keyCols)
      .select("_f").distinct().collect().map(_.getString(0))
    val touched = touchedAbs.map(a => absOf.getOrElse(a,
      throw new IllegalStateException(s"untracked file in scan: $a"))).toSeq.sorted
    // rewritten content: touched files' unmatched rows + ALL update rows
    // (matched replacements and brand-new keys land together)
    val touchedRows = if (touched.isEmpty) updates.limit(0)
      else tagged.filter(col("_f").isin(touchedAbs.toSeq: _*)).drop("_f")
        .join(updates.select(keyExpr: _*).distinct(), keyCols, "left_anti")
    val merged = touchedRows.unionByName(updates, allowMissingColumns = true)
    val staged =
      if (clusterBy.isEmpty) merged
      else merged.repartitionByRange(math.max(1, touched.size), clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    val (files, rows) = stage(staged)
    val sc = unionSchema(schemaAt(v), updates.schema)
    if (!tryCommit(v + 1, "merge", rows, files, touched, None, Some(sc)))
      throw new IllegalStateException(
        s"merge lost the race at v${v + 1}; re-run against the new tip")
    v + 1
  }

  /** DELETE WHERE at file granularity, same shape as `merge`: only files
    * CONTAINING a matching row are rewritten (without their matches);
    * fully-unmatched files stay live untouched. Rows where `cond` is NULL
    * are KEPT (SQL DELETE semantics: only provably-true rows go). A
    * delete matching nothing is a metadata no-op — no commit at all. */
  def deleteWhere(cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit}
    val v = currentVersion
    require(v >= 0, s"no committed version in $root")
    val live = liveFiles(v)
    val tagged = read(v).withColumn("_f", input_file_name())
    val touchedAbs = tagged.filter(coalesce(cond, lit(false)))
      .select("_f").distinct().collect().map(_.getString(0))
    if (touchedAbs.isEmpty) return v
    val absOf = live.map(f => "file://" + abs(f) -> f).toMap ++
      live.map(f => "file:" + abs(f) -> f).toMap ++ live.map(f => abs(f) -> f).toMap
    val touched = touchedAbs.map(a => absOf.getOrElse(a,
      throw new IllegalStateException(s"untracked file in scan: $a"))).toSeq.sorted
    val keep = tagged.filter(col("_f").isin(touchedAbs.toSeq: _*))
      .filter(coalesce(cond, lit(false)) === lit(false)).drop("_f")
    val (files, rows) = stage(keep)
    if (!tryCommit(v + 1, "delete", rows, files, touched, None, schemaAt(v)))
      throw new IllegalStateException(
        s"delete lost the race at v${v + 1}; re-run against the new tip")
    v + 1
  }

  /** Incremental append-feed read: rows added by `append` commits with
    * version in (since, upTo] — the change-data-feed primitive an
    * incremental consumer (nightly dedup, downstream aggregate) tails
    * instead of rescanning the table. `compact` rewrites are EXCLUDED:
    * their files carry rows a consumer already saw (the dataChange=false
    * analog), so including them would double-deliver. An intervening
    * `overwrite` replaced content rather than extending it, making
    * incremental consumption unsound — it throws, and the consumer
    * re-syncs from a snapshot. Cost: the log scan is KBs; the data read
    * touches ONLY the newly added files, never the table. */
  def changesSince(since: Long, upTo: Long = -1L): DataFrame = {
    val tip = if (upTo < 0) currentVersion else upTo
    val es = ((since + 1) to tip).map(parse)
    // overwrite AND merge replace rows rather than extend them — tailing
    // across either would deliver replaced content as if it were new
    require(es.forall(e =>
        e.action != "overwrite" && e.action != "merge" && e.action != "delete"),
      s"content-replacing commit inside ($since, $tip]: incremental read " +
        "invalid, re-sync from a snapshot")
    val files = es.filter(_.action == "append").flatMap(_.add)
    if (files.isEmpty) read(tip).limit(0)
    else schemaAt(tip) match {
      // consumers get ONE stable schema per tail call (the tip's), however
      // many evolution steps the range spans
      case Some(sc) => spark.read.schema(sc).parquet(files.map(abs): _*)
      case None => spark.read.parquet(files.map(abs): _*)
    }
  }

  /** The commit log as a DataFrame (version, action, rows, file counts). */
  def history(): DataFrame = {
    import spark.implicits._
    entries(currentVersion)
      .map(e => (e.version, e.action, e.rows, e.add.size.toLong, e.remove.size.toLong))
      .toDF("version", "action", "rows", "n_added_files", "n_removed_files")
  }

  /** Delete data files the LATEST snapshot no longer references. Time
    * travel to versions that needed them stops working — the retention
    * trade every log-structured table format prices. Returns #deleted. */
  def vacuum(): Int = {
    val keep = liveFiles(currentVersion).toSet
    val all = ls(rootP)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("d-"))
      .flatMap(d => ls(d))
      .map(p => rootP.relativize(p).toString)
    val gone = all.filterNot(keep)
    gone.foreach(f => Files.deleteIfExists(rootP.resolve(f)))
    gone.size
  }
}

object TxnTable {
  /** Open (possibly not-yet-existing) table at `root`. */
  def at(spark: SparkSession, root: String): TxnTable = {
    Files.createDirectories(Paths.get(root))
    new TxnTable(spark, root)
  }

  /** Wipe and reopen — the deterministic-fixture entry point the query
    * keys use so every invocation replays the same history from v0. */
  def fresh(spark: SparkSession, root: String): TxnTable = {
    val p = Paths.get(root)
    if (Files.exists(p)) {
      val w = Files.walk(p)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally w.close()
    }
    at(spark, root)
  }
}
