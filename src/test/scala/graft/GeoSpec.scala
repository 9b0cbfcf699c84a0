package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial keys (queries/UGeo.scala): the grid-bucketed nearest-site
  * join must agree with brute-force nearest over the whole fixture — that
  * equivalence is what licenses the 3x3 cell ring as the scale shape
  * (cell size vs site density), and the formulas are re-derived here
  * independently so a drift in either copy fails the test.
  */
class GeoSpec extends SparkTestBase {

  private val hav =
    "2 * 6371.0 * asin(sqrt(power(sin(radians(slat - plat) / 2), 2) + " +
      "cos(radians(plat)) * cos(radians(slat)) * " +
      "power(sin(radians(slon - plon) / 2), 2)))"

  test("grid-bucketed nearest-site join equals brute-force nearest") {
    val sites = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("site_id"),
      expr("39.8 + c_custkey * 379 % 4000 / 10000.0").as("slat"),
      expr("-75.4 + c_custkey * 523 % 5000 / 10000.0").as("slon"))
    val pts = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      expr("39.8 + o_orderkey * 7919 % 4000 / 10000.0").as("plat"),
      expr("-75.4 + o_orderkey * 104729 % 5000 / 10000.0").as("plon"))
    val brute = pts.crossJoin(sites)
      .withColumn("dist_km", round(expr(hav), 4))
      .withColumn("rn", row_number().over(Window.partitionBy("o_orderkey")
        .orderBy(col("dist_km"), col("site_id"))))
      .filter(col("rn") === 1)
      .select("o_orderkey", "site_id", "dist_km")
      .orderBy("o_orderkey")
      .collect().map(_.toString).toSeq
    val bucketed = SparkEntry.queries("c_join_geo_bucket")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(bucketed.size == brute.size && bucketed.nonEmpty,
      s"row counts differ: bucketed=${bucketed.size} brute=${brute.size}")
    assert(bucketed == brute, "bucketed nearest diverges from brute force")
  }

  test("grid-bucketed k-nearest join equals brute-force top-3") {
    val sites = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("site_id"),
      expr("39.8 + c_custkey * 379 % 4000 / 10000.0").as("slat"),
      expr("-75.4 + c_custkey * 523 % 5000 / 10000.0").as("slon"))
    val pts = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      expr("39.8 + o_orderkey * 7919 % 4000 / 10000.0").as("plat"),
      expr("-75.4 + o_orderkey * 104729 % 5000 / 10000.0").as("plon"))
    val brute = pts.crossJoin(sites)
      .withColumn("dist_km", round(expr(hav), 4))
      .withColumn("rn", row_number().over(Window.partitionBy("o_orderkey")
        .orderBy(col("dist_km"), col("site_id"))))
      .filter(col("rn") <= 3)
      .select("o_orderkey", "site_id", "dist_km", "rn")
      .orderBy("o_orderkey", "rn")
      .collect().map(_.toString).toSeq
    val bucketed = SparkEntry.queries("c_join_geo_knn")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(bucketed.size == brute.size && bucketed.nonEmpty,
      s"row counts differ: bucketed=${bucketed.size} brute=${brute.size}")
    assert(bucketed == brute, "bucketed k-nearest diverges from brute force")
  }

  test("radius query returns only points inside the radius, none missed") {
    val got = SparkEntry.queries("g_geo_haversine")(spark, sfDir)
      .collect()
    assert(got.nonEmpty && got.forall(_.getAs[Double]("dist_km") < 5.0))
    // recompute membership independently: every customer either appears
    // with its distance or is farther than the radius
    val all = Tables.customer(spark, sfDir).select(
      col("c_custkey"),
      round(expr("2 * 6371.0 * asin(sqrt(" +
        "power(sin(radians((39.8 + c_custkey * 7919 % 4000 / 10000.0) " +
        "- 39.9526) / 2), 2) + " +
        "cos(radians(39.9526)) * " +
        "cos(radians(39.8 + c_custkey * 7919 % 4000 / 10000.0)) * " +
        "power(sin(radians((-75.4 + c_custkey * 104729 % 5000 / 10000.0) " +
        "- (-75.1652)) / 2), 2)))"), 4).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inKey = got.map(r => r.getAs[Long]("c_custkey")).toSet
    val expected = all.filter(_._2 < 5.0).keySet
    assert(inKey == expected, s"membership mismatch: ${inKey diff expected} / ${expected diff inKey}")
  }

  test("geo bucket join is a broadcast equi-join on the cell id") {
    val exec = SparkEntry.queries("c_join_geo_bucket")(spark, sfDir)
      .queryExecution.executedPlan
    // the candidate machinery may be served from the shared phase-1
    // cache (bucket = rank-1 of the knn candidates since r13) — assert
    // the shape on the plan that actually COMPUTES candidates, looking
    // through any in-memory scan to its cached plan
    val cached = exec.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s.relation.cachedPlan.toString
    }
    val p = exec.toString + cached.mkString("\n")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"spatial candidates must meet on cell equality:\n$p")
  }
}
