package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Message-bus streaming source: the full DataSource V2 micro-batch
  * contract (offset tracking, per-partition range planning, replay,
  * checkpoint restart) against a partitioned append-only broker — the
  * abstraction a Kafka/Kinesis integration implements, exercised end to
  * end without a network broker in the sandbox.
  *
  * What Spark drives (and what this source therefore proves): each trigger
  * asks `latestOffset`, plans one `InputPartition` per broker partition
  * over the `(start, end]` offset range, reads records by offset, persists
  * the end offset in the streaming checkpoint, and on restart resumes from
  * the checkpointed offset — exactly-once ingestion with replayability
  * (the broker retains its log, so a fresh query re-reads from earliest).
  * StreamingSpec pins restart-no-duplication, replay, and multi-partition
  * range planning.
  *
  * The broker behind the topic is a SEAM (`BusBrokerApi`), with two
  * implementations proving it: `MemBroker` (in-JVM append-only logs, the
  * fast fixture) and `FileBroker` (`file:`-prefixed topics; on-disk
  * partition logs with atomic create-if-absent offset slots — reachable
  * and consistent across processes). A production deployment replaces
  * ONLY the broker calls (endOffsets, fetch — a network client on the
  * executor — and publish); every line Spark touches (offsets, planning,
  * readers, checkpoint JSON) is the real contract and ships unchanged —
  * StreamingSpec runs the same exactly-once/restart/replay matrix
  * against BOTH brokers, so that portability is tested, not asserted.
  * Scale posture: partitions read in parallel with no cross-partition
  * coordination; offsets are per-partition longs so checkpoint state is
  * O(partitions) bytes.
  *
  * Usage:
  * {{{
  *   BusBroker.create(topic, nPartitions)
  *   BusBroker.publish(topic, key, value)   // partition = hash(key)
  *   spark.readStream.format("graft.sources.BusSource")
  *     .option("topic", topic).load()       // partition, offset, key, value
  * }}}
  */
class BusSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val topic = properties.get("topic")
    require(topic != null, "BusSource needs .option(\"topic\", ...)")
    new BusTable(topic)
  }
}

object BusSource {
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

/** The broker seam: what a production deployment swaps for a network
  * client. Everything Spark drives (offsets, planning, readers,
  * checkpoint JSON) sits ABOVE this trait and is broker-agnostic — the
  * portability claim StreamingSpec tests by running the full micro-batch
  * matrix against both implementations below. */
trait BusBrokerApi {
  def create(topic: String, nPartitions: Int): Unit
  def delete(topic: String): Unit
  def nPartitions(topic: String): Int
  /** Append one record; the partition is the key's hash (stable across
    * publishers, like a keyed producer). Returns (partition, offset). */
  def publish(topic: String, key: String, value: String): (Int, Long)
  def endOffsets(topic: String): Array[Long]
  /** Records of `partition` with offsets in [from, until). */
  def fetch(topic: String, partition: Int, from: Long, until: Long)
      : IndexedSeq[(Long, String, String)]
}

/** Router: `file:`-prefixed topics live on disk (`FileBroker`, reachable
  * from any process), everything else in this JVM (`MemBroker`). The
  * DSv2 classes only ever see topic strings, so the choice of broker is
  * invisible to the Spark-facing contract. */
object BusBroker extends BusBrokerApi {
  private def impl(topic: String): BusBrokerApi =
    if (topic.startsWith("file:")) FileBroker else MemBroker
  def create(topic: String, nPartitions: Int): Unit = impl(topic).create(topic, nPartitions)
  def delete(topic: String): Unit = impl(topic).delete(topic)
  def nPartitions(topic: String): Int = impl(topic).nPartitions(topic)
  def publish(topic: String, key: String, value: String): (Int, Long) =
    impl(topic).publish(topic, key, value)
  def endOffsets(topic: String): Array[Long] = impl(topic).endOffsets(topic)
  def fetch(topic: String, partition: Int, from: Long, until: Long)
      : IndexedSeq[(Long, String, String)] = impl(topic).fetch(topic, partition, from, until)
}

/** The in-JVM broker: per-topic, per-partition append-only record logs.
  * Publish is the only mutation; records are never rewritten, so any
  * offset range reads back identically forever (infinite retention). */
object MemBroker extends BusBrokerApi {
  private case class Topic(parts: Array[ArrayBuffer[(String, String)]])
  private val topics = TrieMap.empty[String, Topic]

  def create(topic: String, nPartitions: Int): Unit =
    topics.put(topic, Topic(Array.fill(nPartitions)(ArrayBuffer.empty)))

  def delete(topic: String): Unit = topics.remove(topic)

  def nPartitions(topic: String): Int = topics(topic).parts.length

  def publish(topic: String, key: String, value: String): (Int, Long) = {
    val t = topics(topic)
    val p = math.floorMod(key.hashCode, t.parts.length)
    val log = t.parts(p)
    log.synchronized { log += ((key, value)); (p, log.length - 1L) }
  }

  def endOffsets(topic: String): Array[Long] =
    topics(topic).parts.map(l => l.synchronized(l.length.toLong))

  def fetch(topic: String, partition: Int, from: Long, until: Long)
      : IndexedSeq[(Long, String, String)] = {
    val log = topics(topic).parts(partition)
    log.synchronized {
      (from until until).map(o => (o, log(o.toInt)._1, log(o.toInt)._2))
    }
  }
}

/** File-backed multi-PROCESS broker: topic = `file:<dir>`, partition =
  * `p-<i>` subdirectory, record = one `%012d.rec` file (DataOutputStream
  * writeUTF key then value — length-prefixed, so keys/values may contain
  * anything). Offset allocation is the txn-log publish primitive: write a
  * tmp file, `Files.createLink` it into the next offset slot; losing a
  * race to a concurrent publisher (same JVM or another process) just
  * retries the next slot, so offsets stay dense and no record is ever
  * overwritten. All state is on disk — a second process (or a restarted
  * one) sees the same topic with no handshake, which is what makes the
  * StreamingSpec matrix against this broker a real portability test
  * rather than a same-object rerun. One file per record keeps the
  * publish atomic and the fixture honest at test scale; a production
  * file broker would batch segments exactly like the bus products do,
  * behind the same six calls. */
object FileBroker extends BusBrokerApi {
  import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException}
  import scala.jdk.CollectionConverters._

  private def root(topic: String): Path = Paths.get(topic.stripPrefix("file:"))
  private def part(topic: String, p: Int): Path = root(topic).resolve(s"p-$p")
  private def rec(topic: String, p: Int, off: Long): Path =
    part(topic, p).resolve(f"$off%012d.rec")

  private def ls(p: Path): List[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  def create(topic: String, nPartitions: Int): Unit =
    (0 until nPartitions).foreach(p => Files.createDirectories(part(topic, p)))

  def delete(topic: String): Unit = {
    val r = root(topic)
    if (Files.exists(r)) {
      val w = Files.walk(r)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally w.close()
    }
  }

  def nPartitions(topic: String): Int =
    ls(root(topic)).count(_.getFileName.toString.startsWith("p-"))

  private def endOffset(topic: String, p: Int): Long =
    ls(part(topic, p)).map(_.getFileName.toString)
      .collect { case n if n.endsWith(".rec") => n.stripSuffix(".rec").toLong }
      .foldLeft(-1L)(math.max) + 1L

  def publish(topic: String, key: String, value: String): (Int, Long) = {
    val p = math.floorMod(key.hashCode, nPartitions(topic))
    val tmp = part(topic, p).resolve(s".tmp-${java.util.UUID.randomUUID()}")
    val out = new java.io.DataOutputStream(java.nio.file.Files.newOutputStream(tmp))
    try { out.writeUTF(key); out.writeUTF(value) } finally out.close()
    try {
      var off = endOffset(topic, p)
      var done = false
      while (!done) {
        try { Files.createLink(rec(topic, p, off), tmp); done = true }
        catch { case _: FileAlreadyExistsException => off += 1 }
      }
      (p, off)
    } finally Files.delete(tmp)
  }

  def endOffsets(topic: String): Array[Long] =
    Array.tabulate(nPartitions(topic))(endOffset(topic, _))

  def fetch(topic: String, partition: Int, from: Long, until: Long)
      : IndexedSeq[(Long, String, String)] =
    (from until until).map { off =>
      val in = new java.io.DataInputStream(
        java.nio.file.Files.newInputStream(rec(topic, partition, off)))
      try (off, in.readUTF(), in.readUTF()) finally in.close()
    }
}

class BusTable(topic: String) extends Table with SupportsRead {
  override def name(): String = s"graft_bus($topic)"
  override def schema(): StructType = BusSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerTrigger = Option(options.get("maxRecordsPerTrigger")).map(_.toLong)
    () => new BusScan(topic, maxPerTrigger)
  }
}

/** Per-partition end offsets, JSON-round-tripped through the streaming
  * checkpoint (the durability contract on restart). */
case class BusOffset(ends: Array[Long]) extends Offset {
  override def json(): String = ends.mkString("[", ",", "]")
}

object BusOffset {
  def parse(s: String): BusOffset =
    BusOffset(s.stripPrefix("[").stripSuffix("]").split(',')
      .filter(_.nonEmpty).map(_.trim.toLong))
}

case class BusRange(topic: String, partition: Int, from: Long, until: Long)
  extends InputPartition

class BusScan(topic: String, maxPerTrigger: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = BusSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BusStream(topic, maxPerTrigger)
}

class BusStream(topic: String, maxPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Trigger.AvailableNow contract: snapshot the end offsets when the query
  // starts; the run drains up to that cap and stops itself — records
  // published while it drains wait for the next scheduled run (the
  // nightly catch-up mode)
  @volatile private var availableNowCap: Option[BusOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(BusOffset(BusBroker.endOffsets(topic)))

  override def initialOffset(): Offset =
    BusOffset(Array.fill(BusBroker.nPartitions(topic))(0L)) // earliest
  override def latestOffset(): Offset =
    availableNowCap.getOrElse(BusOffset(BusBroker.endOffsets(topic)))
  // admission control: `maxRecordsPerTrigger` bounds each micro-batch —
  // the backpressure knob that keeps per-trigger work (and any stateful
  // operator's delta) bounded under backlog. The budget is spread
  // round-robin in chunks so one hot partition cannot starve the rest.
  // Composes with AvailableNow: the drain then runs MANY bounded batches
  // up to the start-time cap instead of one giant one.
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val ends = availableNowCap.map(_.ends).getOrElse(BusBroker.endOffsets(topic))
    limit match {
      case mr: ReadMaxRows =>
        val out = start.asInstanceOf[BusOffset].ends.clone()
        var remaining = mr.maxRows()
        var active = out.indices.filter(p => out(p) < ends(p))
        while (remaining > 0 && active.nonEmpty) {
          val share = math.max(1L, remaining / active.size)
          for (p <- active if remaining > 0) {
            val take = math.min(share, math.min(ends(p) - out(p), remaining))
            out(p) += take; remaining -= take
          }
          active = out.indices.filter(p => out(p) < ends(p))
        }
        BusOffset(out)
      case _ => BusOffset(ends)
    }
  }
  override def deserializeOffset(json: String): Offset = BusOffset.parse(json)
  override def commit(end: Offset): Unit = () // infinite retention: no trim
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].ends
    val e = end.asInstanceOf[BusOffset].ends
    s.indices.iterator
      .map(p => BusRange(topic, p, s(p), e(p)))
      .filter(r => r.from < r.until)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BusReaderFactory
}

class BusReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[BusRange]
    // the broker fetch happens reader-side: on a real cluster this is the
    // executor's network read from the bus, here it is the shared-JVM log
    val recs = BusBroker.fetch(r.topic, r.partition, r.from, r.until)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < recs.length }
      override def get(): InternalRow = {
        val (off, k, v) = recs(i)
        InternalRow(r.partition, off,
          UTF8String.fromString(k), UTF8String.fromString(v))
      }
      override def close(): Unit = ()
    }
  }
}
