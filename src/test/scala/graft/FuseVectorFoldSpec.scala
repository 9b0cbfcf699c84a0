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

  test("native fold null semantics match the HOF form") {
    graft.functions.VectorExprs.register(spark)
    // mismatched lengths: zip_with pads with null → sum is NULL; the native
    // expression must agree (so the rewrite is a pure physical change)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(1.0D, 2.0D), array(3.0D)) AS native_mismatch,
        |  aggregate(zip_with(array(1.0D, 2.0D), array(3.0D), (x, y) -> x * y),
        |            0.0D, (acc, e) -> acc + e) AS hof_mismatch,
        |  graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS native_nullelem,
        |  aggregate(zip_with(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D),
        |            (x, y) -> x * y), 0.0D, (acc, e) -> acc + e) AS hof_nullelem
        |""".stripMargin).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("graft_topk rejects non-literal or mistyped k/asc") {
    graft.functions.VectorExprs.register(spark)
    Tables.events(spark, sfDir).createOrReplaceTempView("ev_topk")
    // long literal k is accepted (common SQL literal form)
    val ok = spark.sql(
      "SELECT user_id, graft_topk(value, event_id, 2L, false) FROM ev_topk GROUP BY user_id")
    assert(ok.count() > 0)
    val err = intercept[Exception] {
      spark.sql("SELECT user_id, graft_topk(value, event_id, value, false) FROM ev_topk GROUP BY user_id")
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
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
