package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench must be failure-transparent: a key that throws shows up in the
  * bench JSON's "failed" list, never as a silently-recorded wall time. */
class BenchSpec extends SparkTestBase {

  test("Bench.run reports throwing keys in the failed list") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(5).toDF("id")
    val boomEager: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("broken at plan time")
    val boomLazy: (SparkSession, String) => DataFrame =
      (s, _) => s.range(5).toDF("id")
        .filter(udf((_: Long) => sys.error("broken at run time"): Boolean)
          .apply(col("id")))
    val (results, failed) = Bench.run(spark, sfDir,
      Seq("good" -> ok, "bad_plan" -> boomEager, "bad_exec" -> boomLazy))
    assert(results.map(_._1) == Seq("good", "bad_plan", "bad_exec"))
    assert(results.forall(_._2 >= 0.0), "every key still gets a wall time")
    assert(failed == Seq("bad_plan", "bad_exec"),
      s"both failure modes must be surfaced, got: $failed")
  }

  test("Bench.run reports no failures for healthy keys") {
    val (results, failed) = Bench.run(spark, sfDir,
      Seq("a" -> ((s: SparkSession, _: String) => s.range(3).toDF("id"))))
    assert(results.size == 1 && failed.isEmpty)
  }
}
