package graft

import org.apache.spark.sql.functions._
import graft.plans.FuseVectorFold

/** The optimizer rule rewrites HOF vector folds to the native expressions
  * and leaves everything else untouched.
  */
class FuseVectorFoldSpec extends SparkTestBase {

  private def hofPlan(sqlExpr: String) =
    Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .selectExpr("vec_id", sqlExpr)
      .queryExecution.analyzed

  test("dot-product HOF pattern fuses to graft_dot") {
    val rewritten = FuseVectorFold(hofPlan(
      "aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D, (acc, e) -> acc + e) AS n2"))
    assert(rewritten.toString.contains("graft_dot"), rewritten.toString)
    assert(!rewritten.toString.contains("aggregate(zip_with"))
  }

  test("squared-diff HOF pattern fuses to graft_sqdiff") {
    val rewritten = FuseVectorFold(hofPlan(
      "aggregate(zip_with(v, v, (x, y) -> (x - y) * (x - y)), 0.0D, (acc, e) -> acc + e) AS d2"))
    assert(rewritten.toString.contains("graft_sqdiff"), rewritten.toString)
  }

  test("non-matching folds are left alone") {
    // different seed, different merge — must NOT rewrite
    val p1 = hofPlan(
      "aggregate(zip_with(v, v, (x, y) -> x * y), 1.0D, (acc, e) -> acc + e) AS n2")
    assert(FuseVectorFold(p1).toString.contains("aggregate(zip_with"))
    val p2 = hofPlan(
      "aggregate(zip_with(v, v, (x, y) -> x + y), 0.0D, (acc, e) -> acc + e) AS n2")
    assert(FuseVectorFold(p2).toString.contains("aggregate(zip_with"))
  }

  test("fused expression computes the identical value") {
    graft.functions.VectorExprs.register(spark)
    val df = Tables.embeddings(spark, sfDir).limit(50)
      .withColumn("v", col("embedding").cast("array<double>"))
    val hof = df.selectExpr("vec_id",
      "aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D, (acc, e) -> acc + e) AS n2")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = df.selectExpr("vec_id", "graft_dot(v, v) AS n2")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hof == native, "fold order must be bit-identical")
  }
}
