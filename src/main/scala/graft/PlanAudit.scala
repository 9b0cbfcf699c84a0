package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit over every query key: prints one line per key with the
  * pair-at-a-time join nodes (CartesianProduct / BroadcastNestedLoopJoin)
  * and the join/exchange inventory of its executed plan. PlanShapeSpec's
  * global no-cartesian gate was seeded from this tool's output; keeping it
  * lets the allowlist be re-derived in one command when keys change:
  *
  *   tools/run.sh graft.PlanAudit /root/testdata/sf0.001
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(p).length
        val flags = Seq(
          "cartesian" -> n("CartesianProduct"),
          "bnlj" -> n("BroadcastNestedLoopJoin"),
          "bhj" -> n("BroadcastHashJoin"),
          "smj" -> n("SortMergeJoin"),
          "shj" -> n("ShuffledHashJoin"),
          "exch" -> n("Exchange hashpartitioning"))
          .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"PLAN $name :: $flags")
      } catch {
        case e: Throwable => println(s"PLAN $name :: ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
