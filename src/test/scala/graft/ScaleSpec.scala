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

  test("manual salt and AQE auto-split agree on a skewed aggregate join") {
    // ties p_join_salted to its automatic sibling: the SAME skewed
    // fixture run (a) through the manual salt-and-explode shape and
    // (b) as a plain shuffle join under AQE skew handling must produce
    // identical aggregates — AQE's split is a physical re-plan, never a
    // semantic change. Also pins WHEN manual salting is still required:
    // with skewJoin.enabled=false (clusters that pin it off, engines
    // without AQE, or joins AQE declines because the skewed exchange's
    // partitioning is required downstream) the plain plan gets NO
    // skew=true split and the hot key rides one straggler task — the
    // operating regime p_join_salted exists for. Measured timings for
    // the two shapes are recorded in BENCH_NOTES §8.
    import spark.implicits._
    val nSalt = 8
    val fact = ((0 until 60000).map(i => (7L, i.toLong)) ++
      (0 until 2000).map(i => (i.toLong % 50, 1000000L + i)))
      .toDF("k", "payload")
    val dim = (0L until 50L).map(k => (k, s"dim${k % 5}")).toDF("rk", "name")
    def agg(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.groupBy("name")
        .agg(count(lit(1)).as("cnt"), sum("payload").as("sum_payload"))
        .orderBy("name").collect().map(_.toString).toSeq
    // (a) manual: salt the fact key, explode the dim across the salt space
    val factSalted = fact.withColumn("salt", pmod(col("payload"), lit(nSalt)))
    val dimSalted = dim.withColumn("salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    val salted = agg(factSalted.join(dimSalted,
      col("k") === col("rk") && factSalted("salt") === dimSalted("salt")))
    val confs = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // (b) automatic: plain shuffle join, AQE splits the hot partition
      val joined = fact.hint("merge").join(dim, col("k") === col("rk"))
      assert(joined.collect().length == 62000)
      assert(joined.queryExecution.executedPlan.toString.contains("skew=true"),
        "AQE must split the hot partition on this fixture")
      assert(agg(fact.hint("merge").join(dim, col("k") === col("rk"))) == salted)
      // (c) the no-AQE-rescue regime: skew handling off, no split happens
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val unsplit = fact.hint("merge").join(dim, col("k") === col("rk"))
      assert(unsplit.collect().length == 62000)
      assert(!unsplit.queryExecution.executedPlan.toString.contains("skew=true"),
        "with skewJoin off the hot key must ride one partition — " +
          "the regime manual salting covers")
    } finally confs.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
    }
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

  test("maxPartitionBytes controls scan parallelism") {
    // the input-split knob: at 100 TB this (with openCostInBytes) decides
    // how many tasks read the corpus; the same file must fan out into
    // more partitions when the split size shrinks
    val path = s"$sfDir/lineitem.parquet"
    val coarse = spark.read.parquet(path).rdd.getNumPartitions
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      // openCostInBytes (default 4 MB) floors the split size for small
      // files — both knobs must shrink for a tiny fixture file to split
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      spark.conf.set("spark.sql.files.openCostInBytes", "1024")
      val fine = spark.read.parquet(path).rdd.getNumPartitions
      assert(fine > coarse,
        s"shrinking maxPartitionBytes must add input splits ($coarse -> $fine)")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // runtime skew mitigation — the automatic sibling of p_join_salted's
    // manual salting: one hot key dominates the left side; with the skew
    // thresholds forced low, AQE must mark the sort-merge join skew=true
    // and split the hot partition instead of leaving one straggler task
    import spark.implicits._
    val hot = (0 until 60000).map(i => (7L, i.toLong)) ++
      (0 until 2000).map(i => (i.toLong % 50, 1000000L + i))
    val left = hot.toDF("k", "payload")
    val right = (0L until 50L).map(k => (k, s"dim$k")).toDF("rk", "name")
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = left.hint("merge")
        .join(right, col("k") === col("rk"))
      // execute the join's OWN query execution — count() builds a separate
      // aggregate execution, leaving this one un-finalized
      assert(joined.collect().length == 62000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed SMJ partition:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
    }
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

  test("partition-column filter prunes to one directory on read") {
    SparkEntry.queries("a_scan_partition_prune")(spark, sfDir).count()
    val pruned = spark.read
      .parquet(graft.queries.scratch("scan_partition_prune"))
      .filter(col("o_orderstatus") === "F")
    // inputFiles reports the UNPRUNED FileIndex — the physical scan's
    // selected partitions are what pruning actually touches
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.urlEncodedPath)
    assert(files.nonEmpty)
    assert(files.forall(_.contains("o_orderstatus=F")),
      s"scan must touch only the matching partition, got: ${files.take(3).toSeq}")
  }

  test("ANALYZE TABLE records row/column stats the CBO plans from") {
    SparkEntry.queries("p_cbo_stats")(spark, sfDir).count()
    // table-level stats: sizeInBytes + rowCount land in the catalog
    val desc = spark.sql("DESCRIBE EXTENDED graft_cbo_orders").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("Statistics").exists(_.contains("rows")),
      s"expected rowCount in catalog stats, got: ${desc.get("Statistics")}")
    // column-level stats: ndv recorded for the join key
    val ck = spark.sql(
      "DESCRIBE EXTENDED graft_cbo_cust c_custkey").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ck.get("distinct_count").exists(_.trim.toLong > 0),
      s"expected ndv for c_custkey, got: $ck")
    // the key scopes its CBO confs (set + restore), so it must not leak
    assert(spark.conf.getOption("spark.sql.cbo.enabled").forall(_ == "false"),
      "p_cbo_stats leaked spark.sql.cbo.enabled into the session")
    // and with CBO scoped on HERE, the optimized plan carries the
    // stats-derived row count written by the key's ANALYZE TABLE
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val df = spark.sql(
        "SELECT * FROM graft_cbo_orders o JOIN graft_cbo_cust c " +
          "ON o.o_custkey = c.c_custkey")
      val rc = df.queryExecution.optimizedPlan.stats.rowCount
      assert(rc.isDefined && rc.get > 0, s"CBO row-count estimate missing: $rc")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None    => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("txn metadata plane at 100x files: checkpoint rows stay in the data plane, driver holds only survivors") {
    // the r19 scale pin for the commit-log format: snapshot resolution on
    // a checkpointed manifest-scale table must (a) read the checkpoint's
    // FILE rows as a parquet scan inside the liveDF plan — never as a
    // driver-materialized local relation ∝ live files — and (b) land
    // only PRUNE SURVIVORS on the driver for a predicate read. The
    // LIGHT-checkpoint mode (file rows not retained driver-side) is
    // forced via the test seam so fixture scale exercises the 100 TB
    // path; content must equal the retained mode exactly.
    import graft.sources.TxnTable
    import spark.implicits._
    val root = queries.scratch("scalespec_ckpt")
    val t = TxnTable.fresh(spark, root,
      manifestThreshold = 0, checkpointInterval = 2)
    // 5 commits: appends + an overwrite + a delete → checkpoints at v2, v4
    t.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "q"))        // v0
    t.append(Seq((3L, 30.0), (4L, 40.0)).toDF("k", "q"))        // v1
    t.append(Seq((5L, 50.0)).toDF("k", "q"))                    // v2 +ckpt
    t.overwrite(Seq((6L, 60.0), (7L, 70.0)).toDF("k", "q"))     // v3
    t.append(Seq((8L, 80.0)).toDF("k", "q"))                    // v4 +ckpt
    val want = Set((6L, 60.0), (7L, 70.0), (8L, 80.0))
    val prevLimit = TxnTable.checkpointDriverFileLimit
    try {
      TxnTable.checkpointDriverFileLimit = 0L // every checkpoint LIGHT
      val fresh = TxnTable.at(spark, root,
        manifestThreshold = 0, checkpointInterval = 2)
      // (a) plan shape: the checkpoint parquet is a FileScan leaf of the
      // resolution plan, and no local relation carries the live set
      val live = fresh.liveFilesDF(fresh.currentVersion)
      // sparkPlan (pre-AQE): executedPlan's only leaf is the adaptive shell
      val exec = live.queryExecution.sparkPlan
      val scanned = exec.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.toSeq
      }.flatten
      assert(scanned.exists(_.contains(".ckpt.parquet")),
        s"checkpoint file rows must enter liveDF as a parquet scan; " +
          s"scanned: ${scanned.mkString(", ")}\nplan:\n$exec")
      val localRows = exec.collectLeaves().collect {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l.rows.size
      }.sum
      assert(localRows <= 4,
        s"local relation must carry only the TAIL's inline rows, got $localRows")
      // (b) content equals the retained-mode twin at every version
      assert(fresh.read().as[(Long, Double)].collect().toSet == want)
      assert(fresh.read(version = 2).as[(Long, Double)].collect().toSet ==
        Set((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))
      // (c) a predicate read lands only survivors on the driver
      assert(fresh.readWhereEq("k", 8L).count() == 1)
      assert(fresh.lastPlanningCollect >= 0 && fresh.lastPlanningCollect <= 2,
        s"driver landed ${fresh.lastPlanningCollect} paths for a point read")
      // (d) none of the reads above materialized the light checkpoint's
      // file rows driver-side — opening + reading a huge table must
      // never pin O(files) driver heap (only commit-time folds may)
      assert(fresh.lightCheckpointLoads.get() == 0,
        s"read path materialized a light checkpoint " +
          s"${fresh.lightCheckpointLoads.get()} times")
      // (e) the WIDE stats attach (implicit CBO stats on a no-predicate
      // read) through the broadcast-join path lands only planned-file
      // rows on the driver — never the live (path, stats) set. The isin
      // crossover is forced to 0 via the seam so the join path runs at
      // fixture scale; a fresh handle defeats the per-handle stats cache.
      val fresh2 = TxnTable.at(spark, root,
        manifestThreshold = 0, checkpointInterval = 2)
      fresh2.statsAttachIsinLimit = 0
      val wide = fresh2.read()
      assert(wide.as[(Long, Double)].collect().toSet == want)
      val nPlanned = wide.inputFiles.length
      assert(fresh2.lastStatsAttachCollect >= 0 &&
        fresh2.lastStatsAttachCollect <= nPlanned,
        s"wide stats attach landed ${fresh2.lastStatsAttachCollect} rows " +
          s"on the driver for $nPlanned planned files")
    } finally TxnTable.checkpointDriverFileLimit = prevLimit
    // retained mode agrees
    val again = TxnTable.at(spark, root,
      manifestThreshold = 0, checkpointInterval = 2)
    assert(again.read().as[(Long, Double)].collect().toSet == want)
  }
}
