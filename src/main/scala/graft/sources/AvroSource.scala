package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.avro.{Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file DataSource V2 connector (read + write), built on
  * avro-core (`org.apache.avro`) only — the external `spark-avro` module
  * is not on this classpath, but the format itself is just the Avro
  * Object Container File spec, which avro-core reads and writes natively.
  *
  * Read side (`spark.read.format("graft.sources.AvroSource")
  * .option("path", dir).load()`):
  *  - schema inference opens ONE file's header (KBs — the writer schema
  *    is file metadata, never a data scan);
  *  - one input partition per `.avro` file — files are the parallelism
  *    unit here; production Avro splits WITHIN a file on its sync
  *    markers, which changes only `planInputPartitions`, not the reader;
  *  - COLUMN PRUNING pushes down as an Avro READER SCHEMA: the datum
  *    reader skip-decodes non-projected fields (Avro resolution rules),
  *    so a 2-column projection never materializes the other columns —
  *    the same discipline the parquet scans get from Catalyst.
  *
  * Write side honors the full V2 commit protocol (same shape as
  * `DirSink`): task-private temp files, publish on driver commit as
  * `part-NNNNN.avro` + `_SUCCESS`, aborted attempts leave no trace,
  * truncate-on-publish for overwrite mode.
  *
  * Type mapping (both directions): long/int/double/float/boolean/string/
  * binary/date(int days)/timestamp(long micros); nullable columns map to
  * the canonical `union {null, T}`. That covers every fixture column;
  * anything else fails loudly rather than mis-encoding.
  */
class AvroSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = AvroSource.listAvro(options.get("path"))
    // writes never reach here (supportsExternalMetadata: Spark hands the
    // query schema to getTable); an empty READ target is an error, not an
    // empty table
    require(files.nonEmpty,
      s"graft AvroSource: no .avro files at ${options.get("path")}")
    val r = new DataFileReader[GenericRecord](
      files.head, new GenericDatumReader[GenericRecord]())
    try AvroSource.toStruct(r.getSchema) finally r.close()
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(schema, properties.get("path"))
}

object AvroSource {
  /** List the .avro files at `path` — a directory or a single container
    * file. A path that exists as neither FAILS LOUDLY: a typo'd path
    * reading back as an empty table is silent data loss at the consumer,
    * which contradicts this connector's fail-on-mis-encode posture. */
  private[sources] def listAvro(path: String): Seq[File] = {
    require(path != null && path.nonEmpty, "graft AvroSource: 'path' option is required")
    val d = new File(path)
    if (d.isFile && d.getName.endsWith(".avro")) Seq(d)
    else if (d.isDirectory)
      d.listFiles().filter(f => f.isFile && f.getName.endsWith(".avro"))
        .sortBy(_.getName).toSeq
    else throw new IllegalArgumentException(
      s"graft AvroSource: path is neither a directory nor an .avro file: $path")
  }

  /** Avro writer/reader schema → Spark schema. Unions must be the
    * canonical nullable shape `[null, T]`. */
  private[sources] def toStruct(s: ASchema): StructType =
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = f.schema().getType match {
        case ASchema.Type.UNION =>
          val branches = f.schema().getTypes.asScala
          require(branches.size == 2 &&
            branches.exists(_.getType == ASchema.Type.NULL),
            s"graft AvroSource: only [null, T] unions supported: ${f.schema()}")
          (branches.find(_.getType != ASchema.Type.NULL).get, true)
        case _ => (f.schema(), false)
      }
      StructField(f.name(), fromAvroType(t), nullable)
    })

  private def fromAvroType(t: ASchema): DataType = t.getType match {
    case ASchema.Type.LONG =>
      if (t.getLogicalType == null) LongType
      else t.getLogicalType.getName match {
        case "timestamp-micros" => TimestampType
        case "local-timestamp-micros" => TimestampNTZType
        case _ => LongType
      }
    case ASchema.Type.INT =>
      if (t.getLogicalType != null && t.getLogicalType.getName == "date")
        DateType
      else IntegerType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.FLOAT => FloatType
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.STRING => StringType
    case ASchema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(
      s"graft AvroSource: unsupported Avro type $other")
  }

  /** Spark schema → Avro record schema (the write path and the pruned
    * reader schema both use it — one mapping, no drift). */
  private[sources] def toAvro(schema: StructType, recordName: String): ASchema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => ASchema.create(ASchema.Type.LONG)
        case IntegerType => ASchema.create(ASchema.Type.INT)
        case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
        case FloatType => ASchema.create(ASchema.Type.FLOAT)
        case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
        case StringType => ASchema.create(ASchema.Type.STRING)
        case BinaryType => ASchema.create(ASchema.Type.BYTES)
        case DateType =>
          org.apache.avro.LogicalTypes.date()
            .addToSchema(ASchema.create(ASchema.Type.INT))
        case TimestampType =>
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(ASchema.create(ASchema.Type.LONG))
        case TimestampNTZType =>
          org.apache.avro.LogicalTypes.localTimestampMicros()
            .addToSchema(ASchema.create(ASchema.Type.LONG))
        case dt => throw new IllegalArgumentException(
          s"graft AvroSource: unsupported column type $dt")
      }
      val t = if (f.nullable) ASchema.createUnion(
        util.Arrays.asList(ASchema.create(ASchema.Type.NULL), base)) else base
      new ASchema.Field(f.name, t, null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
    }
    ASchema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }
}

private[sources] class AvroTable(schema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(info.schema(), path, truncate = false)
}

// --------------------------------------------------------------------- read

private[sources] class AvroScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var pruned: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema
  override def build(): Scan = new AvroScan(path, pruned)
}

private[sources] case class AvroFilePartition(path: String) extends InputPartition

private[sources] class AvroScan(path: String, pruned: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    AvroSource.listAvro(path).map(f => AvroFilePartition(f.getAbsolutePath))
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(pruned)
}

private[sources] class AvroReaderFactory(pruned: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = new File(p.asInstanceOf[AvroFilePartition].path)
    // the PRUNED schema becomes the Avro reader schema: skip-decode of
    // dropped fields happens inside avro-core's resolving decoder
    val readerSchema = AvroSource.toAvro(pruned, "graft_avro")
    val fileReader = new DataFileReader[GenericRecord](file,
      new GenericDatumReader[GenericRecord](null, readerSchema))
    val names = pruned.fieldNames
    val types = pruned.fields.map(_.dataType)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = fileReader.hasNext
      override def get(): InternalRow = {
        val rec = fileReader.next()
        InternalRow.fromSeq(names.indices.map { i =>
          rec.get(names(i)) match {
            case null => null
            case v => types(i) match {
              case StringType => UTF8String.fromString(v.toString)
              case BinaryType =>
                val bb = v.asInstanceOf[java.nio.ByteBuffer]
                val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
              case _ => v // long/int/double/float/boolean/date-int/ts-long
            }
          }
        })
      }
      override def close(): Unit = fileReader.close()
    }
  }
}

// -------------------------------------------------------------------- write

private[sources] class AvroWriteBuilder(
    schema: StructType, path: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new AvroWriteBuilder(schema, path, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AvroBatchWrite(schema, path, truncate)
  }
}

private[sources] class AvroBatchWrite(
    schema: StructType, path: String, truncate: Boolean) extends BatchWrite {
  // one token per logical write, minted driver-side: published names are
  // part-NNNNN-<token>.avro, so a second append commit ACCUMULATES files
  // instead of silently renaming over the first commit's part-00000
  // (ATOMIC_MOVE replaces existing targets — without the token, append
  // mode was silent data loss)
  private val commitToken = java.util.UUID.randomUUID().toString
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(schema, path)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    if (truncate)
      dir.listFiles().filter(f => f.isFile && f.getName.endsWith(".avro"))
        .foreach(_.delete())
    messages.zipWithIndex.foreach { case (TempFileCommit(tmp), i) =>
      Files.move(Paths.get(tmp), Paths.get(path, f"part-$i%05d-$commitToken.avro"),
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

private[sources] class AvroWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroWriter(schema, path, partitionId, taskId)
}

private[sources] class AvroWriter(
    schema: StructType, path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmpDir = new File(path, "_tmp")
  tmpDir.mkdirs()
  private val tmpFile = new File(tmpDir, s"attempt-$taskId-$partitionId.avro")
  private val avroSchema = AvroSource.toAvro(schema, "graft_avro")
  private val writer = new DataFileWriter[GenericRecord](
    new GenericDatumWriter[GenericRecord](avroSchema))
  writer.create(avroSchema, tmpFile)

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.fields.length) {
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else schema.fields(i).dataType match {
          case LongType | TimestampType | TimestampNTZType =>
            java.lang.Long.valueOf(row.getLong(i))
          case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
          case FloatType => java.lang.Float.valueOf(row.getFloat(i))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case StringType => row.getUTF8String(i).toString
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case dt => throw new IllegalArgumentException(
            s"graft AvroSource: unsupported column type $dt")
        }
      rec.put(i, v)
      i += 1
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    TempFileCommit(tmpFile.getAbsolutePath)
  }
  override def abort(): Unit = { writer.close(); tmpFile.delete() }
  override def close(): Unit = ()
}
