package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_minhash(text)`: the k=8 MinHash signature computed ROW-WISE in
  * one pass over the token stream — array(s0..s7) of 8-hex-char minima,
  * bit-identical to the declarative `explode(split) → groupBy(doc) →
  * min(substring(md5…))` formulation (same md5 windows, same
  * lexicographic minima), but as a pure projection.
  *
  * Why it exists: the declarative form EXPLODES the corpus and SHUFFLES
  * every token row to regroup by document — at 100 TB that shuffle (tens
  * of tokens per doc) dominates the whole dedup pipeline. A per-row
  * signature is a map-only stage fused with the parquet scan: no token
  * rows, no exchange; the band table falls out as another projection.
  * Same family trick as the aggregate form: families 0..3 are the four
  * disjoint 8-hex windows of md5('a' ‖ token), 4..7 of md5('b' ‖ token)
  * — two digests per token, portable across engines (the DuckDB oracle
  * keeps the unnest+min formulation and must hash-match).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects STRING, got ${child.dataType.sql}")
  }
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String])

  // stays inside whole-stage codegen: the generated code calls the same
  // static kernel the interpreted path uses
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

object MinHashSig {
  // MessageDigest is stateful; one instance per thread, digest() resets it
  private val md5Pool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** One pass over the tokens; `split(" ", -1)` matches Spark's
    * `split(text, " ")` exactly (empty tokens kept, so "" has a
    * signature — the same rows the aggregate form produces). */
  def compute(text: UTF8String): ArrayData = {
    val md = md5Pool.get()
    val words = text.toString.split(" ", -1)
    val mins = new Array[String](8)
    var w = 0
    while (w < words.length) {
      val ha = hex(md.digest(("a" + words(w)).getBytes("UTF-8")))
      val hb = hex(md.digest(("b" + words(w)).getBytes("UTF-8")))
      var i = 0
      while (i < 8) {
        val off = 8 * (i % 4)
        val sub = (if (i < 4) ha else hb).substring(off, off + 8)
        if (mins(i) == null || sub.compareTo(mins(i)) < 0) mins(i) = sub
        i += 1
      }
      w += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString))
  }
}
