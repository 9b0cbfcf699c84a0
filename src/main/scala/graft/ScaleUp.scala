package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale-stress dataset generator: writes a `factor`× copy of an
  * input tier by union-and-reid (BENCH_NOTES scale-stress protocol).
  *
  *   tools/run.sh graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10
  *
  * Reid discipline — every copy offsets each SURROGATE KEY family by its
  * own stride so FK joins stay 1:N exactly as in the source tier (colliding
  * keys would multiply join fan-out by `factor` and corrupt the scaling
  * exponent); nation/region keys are NOT offset (fixed 25/5-row dims, FK
  * targets must stay valid). Content columns are perturbed per copy where
  * identity would change the WORKLOAD SHAPE rather than just its size:
  *
  *  - `documents.text` gets a per-copy Caesar rotation of the lowercase
  *    alphabet: token/char/whitespace statistics (and n_chars) are
  *    preserved, but shingles differ across copies — without this, every
  *    doc would gain 9 exact near-dup twins and the dedup keys would
  *    measure duplicate-cluster blowup (pairs ∝ copies²), not corpus
  *    growth (a real 10× corpus has ~constant dup RATE).
  *  - `embeddings.embedding` gets small deterministic per-(id, slot)
  *    hash noise, so cosine neighborhoods spread instead of stacking 10
  *    identical vectors into every IVF cell / LSH bucket.
  *
  * Timestamps keep the source calendar span (10× density per day — the
  * honest shape for date-bucketed keys and partition pruning). `events.ts`
  * is copied RAW (int64 nanoseconds, the driver fixture encoding) so
  * Tables.load's nanosAsLong path reads the output tier unchanged.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val outDir = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // key strides, all far above any source tier's max key
    val KO = 1000000000L // orderkey
    val KC = 100000000L  // custkey
    val KP = 100000000L  // partkey
    val KS = 10000000L   // suppkey
    val KE = 1000000000L // event_id
    val KU = 100000000L  // user_id
    val KD = 10000000L   // doc_id
    val KV = 1000000L    // vec_id

    def copies(df: DataFrame)(reid: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => reid(df, i)).reduce(_ union _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name written")
    }

    // fixed dims: copy through unchanged
    for (t <- Seq("region", "nation"))
      write(spark.read.parquet(s"$inDir/$t.parquet"), t)

    write(copies(spark.read.parquet(s"$inDir/customer.parquet")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * KC))
    }, "customer")

    write(copies(spark.read.parquet(s"$inDir/supplier.parquet")) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * KS))
    }, "supplier")

    write(copies(spark.read.parquet(s"$inDir/part.parquet")) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * KP))
    }, "part")

    write(copies(spark.read.parquet(s"$inDir/orders.parquet")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * KO))
        .withColumn("o_custkey", col("o_custkey") + lit(i * KC))
    }, "orders")

    write(copies(spark.read.parquet(s"$inDir/lineitem.parquet")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * KO))
        .withColumn("l_partkey", col("l_partkey") + lit(i * KP))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * KS))
    }, "lineitem")

    // events: read RAW (ts stays int64 ns; Tables.load converts at read)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write(copies(spark.read.parquet(s"$inDir/events.parquet")) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * KE))
        .withColumn("user_id", col("user_id") + lit(i * KU))
    }, "events")

    val az = "abcdefghijklmnopqrstuvwxyz"
    write(copies(spark.read.parquet(s"$inDir/documents.parquet")) { (df, i) =>
      val rot = az.drop(i % 26) + az.take(i % 26)
      df.withColumn("doc_id", col("doc_id") + lit(i * KD))
        .withColumn("text", translate(col("text"), az, rot))
    }, "documents")

    write(copies(spark.read.parquet(s"$inDir/embeddings.parquet")) { (df, i) =>
      val out = df.withColumn("vec_id", col("vec_id") + lit(i * KV))
      if (i == 0) out
      else out.withColumn("embedding", expr(
        // ±0.05 deterministic per-(vec_id, slot) jitter, schema-preserving
        "transform(embedding, (x, j) -> CAST(x + " +
          "(pmod(hash(vec_id * 64 + j), 100) - 50) / 1000.0 AS FLOAT))"))
    }, "embeddings")

    spark.stop()
  }
}
