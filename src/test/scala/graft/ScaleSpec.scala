package graft

import org.apache.spark.sql.functions._

/** Scale-technique behaviors: bucketed co-located joins (no shuffle),
  * salted-join equivalence, malformed-input handling (the reference drops
  * unparseable rows).
  */
class ScaleSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle") {
    // warehouse dir is a static conf — set in SparkTestBase's builder.
    // drop stale tables AND their directories (the in-memory catalog forgets
    // them across JVMs but the warehouse files persist)
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_scratch/warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").saveAsTable("ord_bucketed")
    // force a sort-merge join: the fixture tables are small enough that the
    // planner would broadcast (which also disables bucketed scans)
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
  }

  test("salted join equals the unsalted join") {
    val salted = SparkEntry.queries("p_join_salted")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 4).as("revenue"))
      .orderBy("p_type").collect().map(_.toString).toSeq
    assert(salted == plain)
  }

  test("malformed CSV rows are dropped under DROPMALFORMED") {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_scratch/bad_csv"
    val dir = new java.io.File(tmp)
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/data.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\n")
    val ok = spark.read.schema("id INT, qty INT").option("header", "true")
      .option("mode", "DROPMALFORMED").csv(tmp)
    // count() alone prunes all columns so nothing parses (and nothing is
    // dropped) — force a full parse with collect()
    assert(ok.collect().length == 2)
    val permissive = spark.read
      .schema("id INT, qty INT, _corrupt_record STRING")
      .option("header", "true")
      .option("columnNameOfCorruptRecord", "_corrupt_record").csv(tmp)
    // PERMISSIVE keeps the row, nulls the bad field, captures the raw line.
    // (collect first — filtering directly on the corrupt column is
    // unsupported without caching)
    val rows = permissive.collect().filter(!_.isNullAt(2))
    assert(rows.length == 1 && rows.head.getInt(0) == 2)
  }

  test("compaction rewrites 64 small files into 4 and keeps every row") {
    val before = SparkEntry.queries("p_compact")(spark, sfDir).collect().head
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val base = graft.queries.scratch("compact")
    assert(parquetFiles(s"$base/small") == 64)
    assert(parquetFiles(s"$base/compacted") == 4)
    assert(before.getLong(0) == Tables.lineitem(spark, sfDir).count())
  }
}
