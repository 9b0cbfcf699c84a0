package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md, FIXTURES.md).
  *
  * Encapsulates the events timestamp-encoding shim (SURVEY.md §7.3.2): the
  * driver has shipped `events.parquet` with `ts` as either
  * `INT64 (TIMESTAMP(NANOS,false))` (which Spark 4.1.2 refuses to read as a
  * timestamp — we flip `spark.sql.legacy.parquet.nanosAsLong`, read Long
  * nanoseconds, and truncate with integer division `ts DIV 1000` to match
  * DuckDB's ns→µs truncation exactly) or, since the 2026-08-13 regeneration,
  * a native `timestamp[us]` (read as TIMESTAMP_NTZ, cast to session-TZ
  * timestamp — session TZ is pinned UTC, so wall values are unchanged). The
  * loader dispatches on the *observed* read schema so both vintages work.
  *
  * Scale posture: these are plain parquet scans — column pruning and filter
  * pushdown are applied by Catalyst against the vectorized parquet reader, so
  * a query that needs 2 columns of the 100 TB fact table reads 2 columns.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampType => df
        case _ => // TIMESTAMP_NTZ micros: session TZ is UTC, cast is value-preserving
          df.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
