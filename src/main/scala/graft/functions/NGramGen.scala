package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table function (the true `Generator` tier of SURVEY §2.K
  * — `posexplode` wrappers are the composition tier; this is the operator
  * tier): `graft_ngrams(text, n)` emits one (pos, ngram) row per
  * word-level n-gram of the whitespace-tokenized input.
  *
  * Why a Generator instead of split+posexplode+window: the declarative
  * n-gram build needs a `lead()` window per offset — a full shuffle and
  * sort on (doc, pos) — or an explode of a transformed array, which
  * materializes every n-gram in one array value before generating. The
  * Generator streams rows straight out of the tokenizer inside
  * `GenerateExec` with zero shuffle and zero intermediate array — at
  * 100 TB the n-gram stage becomes a pure map stage fused with the scan.
  *
  * Null/edge semantics (pinned by CurateSpec and the DuckDB oracle):
  * NULL text → no rows; fewer than n tokens → no rows; tokens are the
  * maximal run-free split on single spaces, matching `split(text, ' ')`.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams: text must be STRING, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val toks = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < n) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        private val sb = new java.lang.StringBuilder
        override def hasNext: Boolean = i <= toks.length - n
        override def next(): InternalRow = {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          val row = new GenericInternalRow(2)
          row.update(0, i)
          row.update(1, UTF8String.fromString(sb.toString))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramGenerator =
    copy(child = newChild)
  override def prettyName: String = "graft_ngrams"
}

object NGramGen {
  /** Builder for registry injection: graft_ngrams(text, n) with literal n. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_ngrams(text, n) takes 2 arguments")
    require(exprs(1).foldable, "graft_ngrams: n must be a literal")
    val n = exprs(1).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_ngrams: n must be an integer literal, got $other")
    }
    require(n > 0, s"graft_ngrams: n must be positive, got $n")
    NGramGenerator(exprs(0), n)
  }

  /** Idempotent per-session registration (same pattern as VectorExprs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_ngrams", builder, "built-in")
}
