package graft.functions

import scala.collection.mutable.ArrayBuffer
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-k (score, id) pairs per group as a TypedImperativeAggregate.
  *
  * The declarative top-k-per-group pattern (row_number window + filter)
  * sorts EVERY candidate row: inside an O(n²) similarity join that is a sort
  * of n²·(k/n) ≫ k·n rows. This aggregate instead keeps a bounded buffer of
  * the k best pairs per group, so the shuffle carries k rows per group and
  * nothing is ever globally sorted — the 100 TB-correct shape for
  * "nearest k per item".
  *
  * Ordering matches the window formulation exactly: by score (asc/desc),
  * then id ascending — so results are row-identical to
  * `row_number() OVER (PARTITION BY g ORDER BY score [DESC], id)` ≤ k
  * whenever ids are unique within a group AND no score/id is NULL: update()
  * drops NULL-score/NULL-id rows entirely, where the window form would rank
  * them NULLS LAST — with fewer than k non-null candidates the two differ.
  * All graft query call sites feed non-null similarity scores.
  *
  * Output: array<struct<id: long, score: double, rn: long>> sorted best-first.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (scoreExpr.dataType != DoubleType)
      TypeCheckFailure(s"graft_topk: score must be DOUBLE, got ${scoreExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckFailure(s"graft_topk: id must be BIGINT, got ${idExpr.dataType.sql}")
    else TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("rn", LongType, nullable = false))), containsNull = false)

  // java.lang.Double.compare handles NaN like Spark's sort (NaN largest,
  // equal to itself) so the comparator stays a strict weak order even with
  // NaN scores and matches the window formulation's ordering
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) { if (asc) c < 0 else c > 0 }
    else i1 < i2
  }
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    better(a._1, a._2, b._1, b._2)

  private def trim(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > k) {
      val best = buf.sortWith(better).take(k)
      buf.clear()
      buf ++= best
    }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow)
      : ArrayBuffer[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val sc = s.asInstanceOf[Double]
      val id = i.asInstanceOf[Long]
      if (buf.length < k) buf += ((sc, id))
      else {
        // saturated: replace the current worst iff the candidate beats it —
        // inside an O(n²) pair join almost every row is rejected here with
        // k comparisons and ZERO allocation (vs append-then-sort), which is
        // what keeps the aggregate out of the allocator on the hot path
        var w = 0
        var j = 1
        while (j < buf.length) {
          if (better(buf(w), buf(j))) w = j
          j += 1
        }
        val worst = buf(w)
        if (better(sc, id, worst._1, worst._2)) buf(w) = ((sc, id))
      }
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    a ++= b
    trim(a)
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(better).take(k)
    new GenericArrayData(top.zipWithIndex.map { case ((s, i), idx) =>
      InternalRow(i, s, (idx + 1).toLong)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    trim(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var j = 0
    while (j < n) { buf += ((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "graft_topk"
}
