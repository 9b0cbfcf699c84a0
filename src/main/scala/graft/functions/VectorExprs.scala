package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path
  * (SURVEY §2 `k_custom_expression`, §7.4(3)).
  *
  * The HOF formulation (`aggregate(zip_with(a, b, …))`) builds an
  * intermediate array per pair inside an O(n²) pair join — the dominant
  * bench cost. These expressions run a tight codegen'd loop directly over
  * the two `ArrayData`s: no intermediate allocation, stays inside
  * whole-stage codegen. Summation order is the same left-to-right fold as
  * the HOF form, so results are bit-identical and oracle parity is
  * unaffected.
  */
abstract class VectorFold extends BinaryExpression {
  // inputs must be array<double> — callers cast first (ILlmOps.vecs)
  override def dataType: DataType = DoubleType

  // null semantics match the HOF `aggregate(zip_with(...))` form exactly:
  // mismatched lengths (zip_with pads with null) or a null element poison
  // the sum to NULL — so FuseVectorFold is a pure physical rewrite
  override def nullable: Boolean = true

  /** Java source for one loop step, given element vars `x`/`y`, acc `s`;
    * `tmp` is a collision-free scratch variable name. */
  protected def stepJava(s: String, x: String, y: String, tmp: String): String
  protected def step(s: Double, x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      s = step(s, xs.getDouble(i), ys.getDouble(i))
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val tmp = ctx.freshName("t")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${stepJava(s, s"$a.getDouble($i)", s"$b.getDouble($i)", tmp)}
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
}

/** dot(a, b) = Σ aᵢ·bᵢ */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def stepJava(s: String, x: String, y: String, tmp: String): String =
    s"$s += $x * $y;"
  override protected def step(s: Double, x: Double, y: Double): Double = s + x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** sqdiff(a, b) = Σ (aᵢ−bᵢ)² — squared L2 distance (sqrt applied outside). */
case class SquaredDiffSum(left: Expression, right: Expression) extends VectorFold {
  override protected def stepJava(s: String, x: String, y: String, tmp: String): String =
    s"double $tmp = $x - $y; $s += $tmp * $tmp;"
  override protected def step(s: Double, x: Double, y: Double): Double = {
    val d = x - y; s + d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sqdiff"
}

object VectorExprs {
  /** Register graft_dot / graft_sqdiff as SQL functions on this session
    * (idempotent) so queries can use them via expr("graft_dot(a, b)"). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sqdiff", exprs => SquaredDiffSum(exprs(0), exprs(1)), "built-in")
    // graft_topk(score, id, k, asc): bounded top-k-per-group aggregate
    reg.createOrReplaceTempFunction("graft_topk", topKBuilder, "built-in")
    // graft_minhash(text): row-wise k=8 MinHash signature (map-only)
    reg.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSig(exprs.head), "built-in")
  }

  /** Builder with validated literal k/asc args (analyzer wraps the bare
    * AggregateFunction in an AggregateExpression). */
  val topKBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 4, "graft_topk(score, id, k, asc) takes 4 arguments")
    require(exprs(2).foldable && exprs(3).foldable,
      "graft_topk: k and asc must be literals")
    val k = exprs(2).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_topk: k must be an integer literal, got $other")
    }
    val asc = exprs(3).eval() match {
      case b: Boolean => b
      case other => throw new IllegalArgumentException(
        s"graft_topk: asc must be a boolean literal, got $other")
    }
    require(k > 0, s"graft_topk: k must be positive, got $k")
    TopKPairs(exprs(0), exprs(1), k, asc)
  }
}
