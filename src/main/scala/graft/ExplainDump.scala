package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named query keys to files — the
  * plan evidence the optimization rounds commit under plans/rNN/:
  *
  *   tools/run.sh graft.ExplainDump <sfDir> <outDir> <suffix> k1,k2,...
  *
  * writes <outDir>/<key>_<suffix>.txt per key. Uses the same session
  * shape as Bench (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus)
  * so the dumped plan is the one the bench executes. Keys whose plan
  * only exists after eager fixture work (txn DML) dump the plan of the
  * RETURNED frame — the declared query surface. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, keysCsv) = args.take(4)
    val keys = keysCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty)
      System.err.println(s"unknown keys skipped: ${unknown.mkString(",")}")
    keys.filter(SparkEntry.queries.contains).foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${k}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"EXPLAIN $k -> $outDir/${k}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"EXPLAIN $k FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
