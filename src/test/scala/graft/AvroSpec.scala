package graft

import java.io.File
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro DSv2 connector (sources/AvroSource.scala): type-mapping round
  * trips, reader-schema column pruning, and the V2 commit protocol's
  * visible artifacts. The a_scan_avro / a_sink_avro keys value-check the
  * round trip against DuckDB; this suite pins the connector mechanics the
  * oracle can't see.
  */
class AvroSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String) = queries.scratch(s"avrospec_$name")

  test("every supported type round-trips, including nulls in unions") {
    val dir = tmp("types")
    val df = Seq(
      (1L, 10, 1.5, 2.5f, true, "a", Array[Byte](1, 2)),
      (2L, 20, -0.25, 0f, false, "", Array.empty[Byte])
    ).toDF("l", "i", "d", "f", "b", "s", "bin")
      .withColumn("ts", to_timestamp(lit("2024-03-01 12:34:56.789")))
      .withColumn("s_null", when(col("l") === 1L, col("s")))
    df.write.format("graft.sources.AvroSource").option("path", dir)
      .mode("overwrite").save()
    val back = spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load()
    assert(back.schema("l").dataType == LongType)
    assert(back.schema("bin").dataType == BinaryType)
    assert(!back.schema("l").nullable && back.schema("s_null").nullable)
    val rows = back.orderBy("l").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("l") == 1L && rows(0).getAs[Int]("i") == 10)
    assert(rows(0).getAs[Double]("d") == 1.5 && rows(0).getAs[Float]("f") == 2.5f)
    assert(rows(0).getAs[Boolean]("b") && rows(0).getAs[String]("s") == "a")
    assert(rows(0).getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2))
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toString
      .startsWith("2024-03-01 12:34:56.789"))
    assert(rows(0).getAs[String]("s_null") == "a" && rows(1).isNullAt(
      rows(1).fieldIndex("s_null")), "null union branch must survive")
    assert(rows(1).getAs[String]("s") == "" &&
      rows(1).getAs[Array[Byte]]("bin").isEmpty)
  }

  test("column pruning reaches the Avro scan as a reader schema") {
    val dir = tmp("prune")
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.format("graft.sources.AvroSource").option("path", dir)
      .mode("overwrite").save()
    val q = spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load()
      .select("o_orderkey")
    val p = q.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("BatchScan"))
    assert(scanLine.isDefined, s"expected a BatchScan node:\n$p")
    assert(scanLine.get.contains("o_orderkey#") &&
      !scanLine.get.contains("o_totalprice#") &&
      !scanLine.get.contains("o_orderstatus#"),
      s"scan must be pruned to o_orderkey: ${scanLine.get}")
    assert(q.distinct().count() == Tables.orders(spark, sfDir).count())
  }

  test("a failed write job publishes nothing and keeps prior content intact") {
    val dir = tmp("abort")
    Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      .write.format("graft.sources.AvroSource").option("path", dir)
      .mode("overwrite").save()
    val before = spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load().count()
    assert(before > 0)
    // a task that throws mid-write must abort its private temp file; the
    // driver never reaches BatchWrite.commit, so the prior published
    // content — including the truncate-on-overwrite — is untouched
    val boom = udf((k: Long) => if (k >= 0) sys.error("poisoned row") else k)
    intercept[Exception] {
      Tables.nation(spark, sfDir)
        .select(boom(col("n_nationkey")).as("k"), col("n_name"))
        .write.format("graft.sources.AvroSource").option("path", dir)
        .mode("overwrite").save()
    }
    val files = new File(dir).listFiles().map(_.getName)
    assert(!new File(dir, "_tmp").isDirectory ||
      new File(dir, "_tmp").listFiles().isEmpty,
      s"aborted attempts left temp residue: ${files.mkString(",")}")
    assert(spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load().count() == before,
      "failed overwrite must not disturb published content")
  }

  test("write publishes atomically: part files + _SUCCESS, no temp residue") {
    val dir = tmp("publish")
    Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      .repartition(3)
      .write.format("graft.sources.AvroSource").option("path", dir)
      .mode("overwrite").save()
    val files = new File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".avro")) == 3, files.mkString(","))
    assert(files.contains("_SUCCESS"))
    assert(!files.exists(_.startsWith("_tmp")), "temp dir must be cleaned up")
    // one input partition per file on the read side
    val back = spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load()
    assert(back.rdd.getNumPartitions == 3)
    // overwrite truncates previous content instead of accumulating
    Tables.nation(spark, sfDir).select("n_nationkey", "n_name").limit(5)
      .coalesce(1)
      .write.format("graft.sources.AvroSource").option("path", dir)
      .mode("overwrite").save()
    assert(spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load().count() == 5)
  }

  test("append commits accumulate: commit-unique names, no silent rename-over") {
    val dir = tmp("append")
    // scratch dirs persist across runs; append semantics need a clean slate
    val d0 = new File(dir)
    if (d0.isDirectory) d0.listFiles().foreach(_.delete())
    val base = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    val n = base.count()
    // two append commits, each coalesced to ONE writer task: without a
    // commit-unique token both would publish part-00000.avro and the
    // second ATOMIC_MOVE would silently replace the first (data loss)
    base.coalesce(1).write.format("graft.sources.AvroSource")
      .option("path", dir).mode("append").save()
    base.coalesce(1).write.format("graft.sources.AvroSource")
      .option("path", dir).mode("append").save()
    val files = new File(dir).listFiles().map(_.getName)
    assert(files.count(_.endsWith(".avro")) == 2, files.mkString(","))
    assert(spark.read.format("graft.sources.AvroSource")
      .option("path", dir).load().count() == 2 * n,
      "second append must accumulate, not replace")
  }

  test("a typo'd or missing read path fails loudly, not as an empty table") {
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.AvroSource")
        .option("path", tmp("no_such_dir_xyz")).load()
    }
    assert(ex.getMessage.contains("neither a directory nor an .avro file") ||
      ex.getMessage.contains("no .avro files"), ex.getMessage)
  }

  test("a single .avro file path reads as that one file") {
    val dir = tmp("single")
    Tables.nation(spark, sfDir).select("n_nationkey", "n_name").coalesce(1)
      .write.format("graft.sources.AvroSource").option("path", dir)
      .mode("overwrite").save()
    val one = new File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val back = spark.read.format("graft.sources.AvroSource")
      .option("path", one.getAbsolutePath).load()
    assert(back.count() == Tables.nation(spark, sfDir).count())
  }
}
