package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 connector: a deterministic sequence table
  * (`id BIGINT, val DOUBLE, tag STRING` with val = id·0.5, tag = 't'||id%5),
  * split into `slices` input partitions for parallel reads and supporting
  * COLUMN PRUNING through `SupportsPushDownRequiredColumns`.
  *
  * This is the connector surface a real engine integration uses: the same
  * TableProvider → Table → ScanBuilder → Batch → PartitionReader chain
  * backs JDBC/Kafka/warehouse connectors, and the pruning hook is what
  * keeps a 100 TB scan from materializing unused columns. Deterministic
  * content means the source itself is oracle-checkable (DuckDB
  * `generate_series` reproduces it exactly).
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  *   .option("n", "2000").option("slices", "8").load()`
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object SeqSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class SeqTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($n)"
  override def schema(): StructType = SeqSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, slices)
}

class SeqScanBuilder(n: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var pruned: StructType = SeqSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema
  override def build(): Scan = new SeqScan(n, slices, pruned)
}

case class SeqRange(start: Long, end: Long) extends InputPartition

class SeqScan(n: Long, slices: Int, pruned: StructType) extends Scan with Batch {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val step = (n + slices - 1) / slices
    (0 until slices).iterator
      .map(i => SeqRange(i * step, math.min(n, (i + 1L) * step)))
      .filter(r => r.start < r.end)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(pruned)
}

class SeqReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[SeqRange]
    new PartitionReader[InternalRow] {
      private var cur = range.start - 1
      override def next(): Boolean = { cur += 1; cur < range.end }
      override def get(): InternalRow = InternalRow.fromSeq(
        schema.fieldNames.toSeq.map {
          case "id" => cur
          case "val" => cur * 0.5
          case "tag" => UTF8String.fromString("t" + (cur % 5))
        })
      override def close(): Unit = ()
    }
  }
}
