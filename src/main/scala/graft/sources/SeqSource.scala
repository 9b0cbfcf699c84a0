package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 connector: a deterministic sequence table
  * (`id BIGINT, val DOUBLE, tag STRING` with val = id·0.5, tag = 't'||id%5),
  * split into `slices` input partitions for parallel reads, supporting the
  * three pushdown hooks a serious connector implements:
  *
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`) — unused columns
  *    are never materialized;
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`) — `id` range predicates
  *    fold into the generated range itself, so filtered-out rows are never
  *    CREATED (the connector-side analog of parquet row-group skipping;
  *    unsupported predicates are returned to Spark for post-scan
  *    evaluation);
  *  - AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`) — ungrouped
  *    COUNT(*) / MIN / MAX over the (filter-narrowed) range are answered
  *    in CLOSED FORM: the scan returns one row and zero source rows are
  *    iterated, the same contract a warehouse/JDBC connector uses to turn
  *    a table-wide MIN into an index lookup. Complete pushdown is only
  *    claimed when every aggregate is supported and no group-by is
  *    present; Spark only attempts it when all filters were consumed, so
  *    the closed forms are always evaluated over the exact surviving
  *    range. Anything else is declined and Spark aggregates normally.
  *
  * This is the connector surface a real engine integration uses: the same
  * TableProvider → Table → ScanBuilder → Batch → PartitionReader chain
  * backs JDBC/Kafka/warehouse connectors. Deterministic content means the
  * source itself is oracle-checkable (DuckDB `generate_series` reproduces
  * it exactly).
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
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var pruned: StructType = SeqSource.fullSchema
  private var lo = 0L          // surviving range [lo, hi) after filters
  private var hi = n
  private var accepted: Array[Filter] = Array.empty
  private var agg: Option[(StructType, Seq[Any])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema

  /** `id` comparisons tighten [lo, hi) — the rows they exclude are never
    * generated. Returns the filters Spark must still evaluate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val rest = Array.newBuilder[Filter]
    val acc = Array.newBuilder[Filter]
    def lit(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    // saturating successor: v+1 on Long.MaxValue must clamp, not wrap —
    // a wrapped bound silently widens/empties the range AND feeds the
    // pushed-aggregate closed forms (and a pushed filter is never
    // re-evaluated by Spark, so the wrong rows would be final)
    def inc(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    filters.foreach {
      case f @ GreaterThan("id", v) if lit(v).isDefined =>
        lo = math.max(lo, inc(lit(v).get)); acc += f
      case f @ GreaterThanOrEqual("id", v) if lit(v).isDefined =>
        lo = math.max(lo, lit(v).get); acc += f
      case f @ LessThan("id", v) if lit(v).isDefined =>
        hi = math.min(hi, lit(v).get); acc += f
      case f @ LessThanOrEqual("id", v) if lit(v).isDefined =>
        hi = math.min(hi, inc(lit(v).get)); acc += f
      case f @ EqualTo("id", v) if lit(v).isDefined =>
        lo = math.max(lo, lit(v).get); hi = math.min(hi, inc(lit(v).get)); acc += f
      case f @ IsNotNull(_) => acc += f // columns are non-nullable: a no-op
      case f => rest += f
    }
    accepted = acc.result()
    rest.result()
  }
  override def pushedFilters(): Array[Filter] = accepted

  private def colName(e: Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Closed forms over [lo, hi): id is the sequence itself and val is
    * monotone in id, so MIN/MAX/COUNT need no row at all. An empty range
    * is declined (Spark's empty-input aggregate semantics — COUNT 0,
    * MIN/MAX NULL — then apply with no special-casing here). */
  private def compile(a: Aggregation): Option[(StructType, Seq[Any])] = {
    if (a.groupByExpressions.nonEmpty || lo >= hi) return None
    val parts = a.aggregateExpressions.toSeq.map {
      case _: CountStar => Some((LongType: DataType, (hi - lo): Any))
      case m: Min => colName(m.column).collect {
        case "id" => (LongType: DataType, lo: Any)
        case "val" => (DoubleType: DataType, lo * 0.5: Any)
      }
      case m: Max => colName(m.column).collect {
        case "id" => (LongType: DataType, (hi - 1): Any)
        case "val" => (DoubleType: DataType, (hi - 1) * 0.5: Any)
      }
      case _ => None
    }
    if (parts.exists(_.isEmpty)) None
    else Some((
      StructType(parts.flatten.zipWithIndex.map { case ((t, _), i) =>
        StructField(s"agg$i", t, nullable = false) }),
      parts.flatten.map(_._2)))
  }

  override def supportCompletePushDown(a: Aggregation): Boolean =
    compile(a).isDefined
  override def pushAggregation(a: Aggregation): Boolean = {
    agg = compile(a); agg.isDefined
  }

  override def build(): Scan = agg match {
    case Some((sc, row)) => new SeqAggScan(sc, row)
    case None => new SeqScan(lo, hi, slices, pruned)
  }
}

case class SeqRange(start: Long, end: Long) extends InputPartition

class SeqScan(lo: Long, hi: Long, slices: Int, pruned: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val step = math.max(1L, (n + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => SeqRange(lo + i * step, math.min(hi, lo + (i + 1L) * step)))
      .filter(r => r.start < r.end)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(pruned)
  override def description(): String =
    s"graft_seq range=[$lo,$hi) cols=${pruned.fieldNames.mkString(",")}"
}

/** The completely-pushed aggregate: one partition, one precomputed row,
  * zero source rows iterated. */
case class SeqAggRow(values: Seq[Any]) extends InputPartition

class SeqAggScan(schema: StructType, row: Seq[Any]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqAggRow(row))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow =
            InternalRow.fromSeq(p.asInstanceOf[SeqAggRow].values)
          override def close(): Unit = ()
        }
    }
  override def description(): String = s"graft_seq PushedAggregates -> 1 row"
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
