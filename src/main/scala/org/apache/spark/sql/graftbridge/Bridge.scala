package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Access bridge for `Dataset.ofRows` (private[sql]) so the library can
  * materialize a DataFrame from a custom LogicalPlan — the standard
  * technique Spark-ecosystem libraries use to expose custom operators
  * (the public API offers no constructor for third-party plans).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Column → Catalyst Expression (Spark 4 moved this behind private[sql]). */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Catalyst Expression → Column (the reverse direction — lets the library
    * use native expressions Spark ships but does not expose as SQL
    * functions, e.g. BloomFilterMightContain). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Rebind `df`'s logical plan into a CLONED session carrying the given
    * conf overrides — the same isolation trick Structured Streaming uses
    * to run each micro-batch under per-batch conf. The clone shares the
    * SparkContext and a snapshot of session state, so the plan executes
    * unchanged, but the overrides are invisible to the original session:
    * no set/restore window for a concurrent thread to observe or clobber. */
  def withConf(df: org.apache.spark.sql.DataFrame,
      kv: (String, String)*): DataFrame = {
    val classic = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val s = classic.sparkSession.cloneSession()
    kv.foreach { case (k, v) => s.conf.set(k, v) }
    Dataset.ofRows(s, classic.queryExecution.logical)
  }

  /** A derived SparkSession whose analyzer carries the given extension
    * rules — the seam a library needs when it cannot control session
    * startup (the standard `spark.sql.extensions` conf only applies at
    * builder time). Works by injecting into the parent's (mutable)
    * extensions object and cloning: the PARENT's already-built analyzer
    * is untouched (its session state is forced first), while the clone's
    * state is rebuilt from the now-extended rule set. The clone shares
    * SparkContext and SharedState, copies the runtime conf, and gets a
    * fresh catalog manager — `spark.sql.catalog.*` set on it resolves
    * independently of the parent. */
  def sessionWithExtensions(spark0: org.apache.spark.sql.SparkSession,
      f: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : org.apache.spark.sql.SparkSession = {
    val spark = spark0.asInstanceOf[SparkSession]
    spark.sessionState // force: pins the parent's analyzer pre-mutation
    f(spark.extensions)
    spark.cloneSession()
  }

  /** Re-tag a batch DataFrame as STREAMING (`isStreaming = true`) — what a
    * v1 streaming `Source.getBatch` must return. The micro-batch engine
    * rejects plain batch frames, and `internalCreateDataFrame` (the hook
    * Spark's own file/delta-style sources use for exactly this) is
    * private[sql]; this bridge is the standard ecosystem workaround. */
  def asStreaming(df: org.apache.spark.sql.DataFrame): DataFrame = {
    val classic = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = true)
  }

  /** The inverse: re-wrap the incrementally-planned RDD of the frame a
    * streaming `Sink.addBatch` receives as a plain BATCH DataFrame, so a
    * sink can run ordinary batch writes on it (a direct `.write` on the
    * streaming-tagged frame is rejected by the analyzer — the same
    * re-wrap Spark's own file sink performs internally). */
  def asBatch(df: org.apache.spark.sql.DataFrame): DataFrame = {
    val classic = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = false)
  }
}
