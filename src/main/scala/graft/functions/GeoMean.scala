package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2 K): geometric mean via ln-sum, numerically stable
  * for the ~1k..100k price domain. Buffer is (ln-sum, count); merge is
  * associative+commutative so partial aggregation works across partitions
  * exactly like a built-in aggregate.
  */
case class GeoMeanBuf(var lnSum: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, java.lang.Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, a: Double): GeoMeanBuf = {
    b.lnSum += math.log(a); b.n += 1; b
  }
  override def merge(x: GeoMeanBuf, y: GeoMeanBuf): GeoMeanBuf =
    GeoMeanBuf(x.lnSum + y.lnSum, x.n + y.n)
  /** NULL on an empty buffer — matching built-in aggregates over an empty
    * relation (exp(0/0) would be NaN). */
  override def finish(b: GeoMeanBuf): java.lang.Double =
    if (b.n == 0L) null else java.lang.Double.valueOf(math.exp(b.lnSum / b.n))
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
