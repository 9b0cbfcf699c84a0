package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector (the companion to the read-side
  * `SeqSource`): tab-separated text files under `path`, written with the
  * full V2 commit protocol — the part of a sink that actually matters at
  * cluster scale:
  *
  *  - each task's `DataWriter` writes to a PRIVATE temp file
  *    (`_tmp/attempt-<task>-<partition>`); nothing is visible mid-job;
  *  - `DataWriter.commit()` hands the temp path to the driver as its
  *    commit message; `abort()` (failed/speculative duplicate attempts)
  *    deletes the temp file so failed attempts leave no trace;
  *  - only `BatchWrite.commit(messages)` — on the driver, once every
  *    task has committed exactly one attempt — publishes the temp files
  *    as `part-NNNNN.tsv` and drops a `_SUCCESS` marker. A job that dies
  *    mid-write leaves no partial output, only unreferenced temp files.
  *
  * Overwrite mode is honored via `SupportsTruncate` (the target dir is
  * cleared at publish time, not eagerly — an aborted overwrite keeps the
  * old data). The demo serializes long/int/double/string columns; the
  * temp→final rename assumes a shared filesystem (local FS here; a real
  * deployment points `path` at HDFS/an object store with an appropriate
  * committer).
  *
  * Read back with `spark.read.schema(...).option("sep", "\t").csv(path)`.
  */
class DirSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  // write-only source: the schema always comes from the DataFrame
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DirSinkTable(schema, properties.get("path"))
}

private[sources] class DirSinkTable(schema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "graft DirSink: 'path' option is required")
  override def name(): String = s"graft-dirsink($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DirSinkWriteBuilder(info.schema(), path, truncate = false)
}

private[sources] class DirSinkWriteBuilder(
    schema: StructType, path: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new DirSinkWriteBuilder(schema, path, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new DirSinkBatchWrite(schema, path, truncate)
  }
}

private[sources] case class TempFileCommit(tempPath: String) extends WriterCommitMessage

private[sources] class DirSinkBatchWrite(
    schema: StructType, path: String, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DirSinkWriterFactory(schema, path)

  // driver-side, after every task committed exactly one attempt: publish
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    if (truncate) {
      dir.listFiles().filter(_.isFile).foreach(_.delete())
    }
    messages.zipWithIndex.foreach { case (TempFileCommit(tmp), i) =>
      Files.move(Paths.get(tmp), Paths.get(path, f"part-$i%05d.tsv"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    Files.write(Paths.get(path, "_SUCCESS"), Array.emptyByteArray)
    val tmpDir = new File(dir, "_tmp")
    if (tmpDir.isDirectory && tmpDir.listFiles().isEmpty) tmpDir.delete()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TempFileCommit(tmp) => new File(tmp).delete()
      case _ =>
    }
}

private[sources] class DirSinkWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DirSinkWriter(schema, path, partitionId, taskId)
}

private[sources] class DirSinkWriter(
    schema: StructType, path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmpDir = new File(path, "_tmp")
  tmpDir.mkdirs()
  private val tmpFile = new File(tmpDir, s"attempt-$taskId-$partitionId")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(tmpFile), StandardCharsets.UTF_8))
  private val types: Array[DataType] = schema.fields.map(_.dataType)

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append('\t')
      if (!row.isNullAt(i)) types(i) match {
        case LongType    => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case DoubleType  => sb.append(row.getDouble(i))
        case StringType  => sb.append(row.getUTF8String(i).toString)
        case dt => throw new IllegalArgumentException(
          s"graft DirSink: unsupported column type $dt")
      }
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TempFileCommit(tmpFile.getAbsolutePath)
  }

  override def abort(): Unit = { out.close(); tmpFile.delete() }
  override def close(): Unit = ()
}
