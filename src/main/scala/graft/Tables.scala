package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md, FIXTURES.md).
  *
  * Encapsulates the events ns-timestamp workaround (SURVEY.md §7.3.2):
  * `events.parquet` stores `INT64 (TIMESTAMP(NANOS,false))`, which Spark
  * 4.1.2 refuses to read as a timestamp (`PARQUET_TYPE_ILLEGAL`). We flip
  * `spark.sql.legacy.parquet.nanosAsLong` at runtime (a settable SQL conf),
  * read the column as Long nanoseconds, and convert with **integer** division
  * to microseconds — `ts DIV 1000`, never `/ 1000` — which matches DuckDB's
  * ns→µs truncation exactly.
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
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
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
