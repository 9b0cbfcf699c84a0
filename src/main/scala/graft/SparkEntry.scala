package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is a ListMap so Bench iterates in a controlled order: a cheap
  * query runs first and absorbs JVM/codegen warmup (SURVEY.md §6).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    DAggregates.m("d_agg_basic")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap("b_distinct" -> ARelational.m("b_distinct")) ++ // warmup: tiny scan
      ARelational.m ++ DAggregates.m ++ EWindows.m ++ GScalars.m ++
      ILlmOps.m ++ NTrainOps.m ++ OCurate.m ++ QCurate.m ++ RAnalytics.m ++
      JStreaming.m ++ KUdx.m ++ MMultimodal.m ++ PPipeline.m ++ TTxn.m ++
      VInfer.m ++ UGeo.m

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ARelational.oracle ++ DAggregates.oracle ++ EWindows.oracle ++
      GScalars.oracle ++ ILlmOps.oracle ++ NTrainOps.oracle ++
      OCurate.oracle ++ QCurate.oracle ++ RAnalytics.oracle ++
      JStreaming.oracle ++ KUdx.oracle ++ MMultimodal.oracle ++
      PPipeline.oracle ++ TTxn.oracle ++ VInfer.oracle ++ UGeo.oracle
}
