package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
import graft.Det.r4

/** Groups A (scans/sources/sinks), B (projection/filters), C (joins) of the
  * SURVEY.md §2 contract.
  *
  * Scale posture (100 TB): every query is a declarative DataFrame plan —
  * filters and projections reach the parquet scan (Catalyst pushdown), small
  * dimensions are broadcast explicitly, and no query collects to the driver.
  */
object ARelational {

  // ---------------------------------------------------------------- A. scans
  val m: ListMap[String, Q] = ListMap(
    "a_scan_parquet" -> ((s, d) =>
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic lineitem
      // — order by enough columns for a total order (SURVEY §7.3.5)
      Tables.lineitem(s, d).orderBy("l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")),

    "a_scan_parquet_events" -> ((s, d) =>
      Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("event_id")),

    "a_scan_pruned" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity")
        .orderBy("l_orderkey", "l_quantity")),

    "a_scan_filter_pushdown" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate")),

    "a_scan_csv" -> ((s, d) => {
      val tmp = scratch("csv_nation")
      Tables.nation(s, d).coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(tmp)
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("header", "true").csv(tmp).orderBy("n_nationkey")
    }),

    "a_scan_jsonl" -> ((s, d) => {
      val tmp = scratch("jsonl_nation")
      Tables.nation(s, d).coalesce(1).write.mode("overwrite").json(tmp)
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .json(tmp).orderBy("n_nationkey")
    }),

    "a_sink_parquet" -> ((s, d) => {
      val tmp = scratch("sink_parquet")
      Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), r4(sum("l_quantity")).as("sum_qty"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp).orderBy("l_returnflag", "l_linestatus")
    }),

    "a_sink_partitioned" -> ((s, d) => {
      val tmp = scratch("sink_partitioned")
      val proj = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      proj.write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
      // explicit read schema: a partitioned write of an EMPTY batch lays
      // down no files, and a schema-less read of that is an error — the
      // reader of a partitioned layout binds its schema, never infers it
      s.read.schema(proj.schema).parquet(tmp)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    }),

    "a_scan_partition_prune" -> ((s, d) => {
      // partition pruning on read: the table is laid out by the partition
      // column, the filter selects ONE directory, and files of every
      // other partition are never opened — at 100 TB this is the
      // difference between scanning the table and scanning 1/N of it.
      // scalatest asserts inputFiles stay inside o_orderstatus=F/.
      val tmp = scratch("scan_partition_prune")
      val proj = Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice",
          "o_orderstatus")
      proj.write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
      // explicit schema — see a_sink_partitioned (empty-batch robustness)
      s.read.schema(proj.schema).parquet(tmp)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), r4(sum("o_totalprice")).as("total"))
        .orderBy("o_orderpriority")
    }),

    "a_scan_xml" -> ((s, d) => {
      // XML ingest (native in Spark 4 — the spark-xml module moved into
      // core): round-trip the nation table through an XML batch with an
      // explicit schema (schema inference over XML is a full extra pass
      // at 100 TB) and a rowTag; values must equal the base table.
      val tmp = scratch("scan_xml")
      Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").option("rowTag", "nation").xml(tmp)
      s.read
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("rowTag", "nation")
        .xml(tmp)
        .orderBy("n_nationkey")
    }),

    "a_scan_corrupt" -> ((s, d) => {
      // malformed-ingest handling: a JSONL batch with three corrupt lines
      // planted among the good rows, read in PERMISSIVE mode with a
      // _corrupt_record column — the production posture (quarantine bad
      // lines, never fail the 100 TB job; FAILFAST's throw is asserted in
      // scalatest). The key returns the clean rows, which must equal the
      // base table exactly — so a reader that dropped or mangled good
      // rows alongside the bad ones hash-mismatches.
      import s.implicits._
      val tmp = scratch("scan_corrupt")
      val good = Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey").toJSON
      val bad = s.createDataset(Seq(
        """{"n_nationkey": 900, "n_name": "TRUNCAT""",
        """not json at all""",
        """{"n_nationkey": "NaN-ish", "n_name": 7, "n_regionkey": []}"""))
      good.union(bad).coalesce(1).write.mode("overwrite").text(tmp)
      // Materialize the parsed batch before touching _corrupt_record:
      // Catalyst prunes a downstream count() to the corrupt column alone,
      // which the JSON scan rejects (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
      // caching is Spark's documented posture for quarantine reads (the
      // parse happens once; the quarantine filter runs against the
      // materialized batch). 25 rows here; at scale this is the
      // parse-once-then-split pattern, not a re-read per branch.
      val parsed = s.read
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT, " +
          "_corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
        .cache()
      parsed
        .filter(col("_corrupt_record").isNull)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),

    "a_sink_dynamic_overwrite" -> ((s, d) => {
      // dynamic partition overwrite — the incremental-pipeline write mode:
      // a full day-partitioned write, then a second write that holds only
      // the earliest day's (recomputed) rows with partitionOverwriteMode=
      // dynamic, which must replace ONLY that partition and leave every
      // other day untouched. The oracle computes the expected final state
      // (earliest day doubled, rest original) — a static overwrite (which
      // would wipe the other days) or an append (which would duplicate
      // the target day) both hash-mismatch, so the mode's semantics are
      // value-checked end-to-end.
      val tmp = scratch("sink_dynover")
      val ev = Tables.events(s, d)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .select("event_id", "day", "value")
      ev.write.mode("overwrite").partitionBy("day").parquet(tmp)
      val minDay = ev.agg(min("day").as("day"))
      val upd = ev.join(broadcast(minDay), "day")
        .withColumn("value", col("value") * 2)
        .select("event_id", "day", "value")
      upd.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(tmp)
      // explicit schema (see a_sink_partitioned): day stays the plain
      // string key instead of being type-inferred into a timestamp, and
      // an empty batch round-trips instead of failing schema inference
      s.read.schema(ev.schema).parquet(tmp)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("sum_val"))
        .orderBy("day")
    }),

    "a_scan_custom_source" -> ((s, d) =>
      // DataSource V2 connector (graft.sources.SeqSource): parallel
      // partition planning + column pruning; the projection drops `val`,
      // which the scan never materializes (pruning asserted in
      // PlanShapeSpec). Deterministic content → real DuckDB oracle.
      s.read.format("graft.sources.SeqSource")
        .option("n", "2000").option("slices", "8").load()
        .filter(col("id") % 7 === 0)
        .select("id", "tag")
        .orderBy("id")),

    "a_scan_agg_pushdown" -> ((s, d) =>
      // AGGREGATE PUSHDOWN through the DSv2 connector: the ungrouped
      // COUNT/MIN/MAX over the id-range-filtered sequence is answered by
      // the source in closed form — the physical plan is a bare BatchScan
      // returning ONE row, no aggregate exec, zero source rows iterated
      // (asserted in PlanShapeSpec with a 2-billion-row instance; the
      // same contract a warehouse connector uses to turn table-wide
      // MIN/MAX into metadata lookups). Filters must be fully consumed
      // first — Spark only attempts it then — so the closed forms bind
      // the exact surviving range.
      s.read.format("graft.sources.SeqSource")
        .option("n", "100000").option("slices", "8").load()
        .filter(col("id") >= 1000 && col("id") < 99000)
        .agg(count(lit(1)).as("n"), min("id").as("min_id"),
          max("id").as("max_id"), min("val").as("min_val"),
          max("val").as("max_val"))),

    "a_sink_orc" -> ((s, d) => {
      // ORC round-trip: aggregate, write ORC, read back — the oracle checks
      // the read-back values against the same aggregate on parquet, so the
      // format conversion itself is value-checked
      val tmp = scratch("sink_orc")
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice")).as("total"))
        .coalesce(1).write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).orderBy("o_orderpriority")
    }),

    "a_scan_orc" -> ((s, d) => {
      // ORC as a SOURCE (the sink twin a_sink_orc only proves the write):
      // a typed slice (long / timestamp / double / string + a genuinely
      // NULL column) lands as multi-file ORC, then the READ path is what's
      // under test — filter + projection through Spark's vectorized ORC
      // reader, with the predicate pushed to ORC stripe/row-group stats
      // and the projection pruning the reader schema (pinned in
      // PlanShapeSpec). Values oracle-checked against the base table, so
      // a type mis-round-trip (timestamp unit, null encoding) cannot hide.
      val tmp = scratch("scan_orc")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          col("o_orderstatus"),
          when(col("o_orderkey") % 10 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderpriority")).as("prio"))
        .repartition(4)
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate", "o_totalprice", "prio")
        .orderBy("o_orderkey")
    }),

    "a_sink_table" -> ((s, d) => {
      // managed-table catalog surface: CTAS via saveAsTable into the
      // session catalog, append via insertInto (positional resolution),
      // then read back BY NAME — downstream consumers bind to the catalog
      // entry, never to file paths. On a cluster this is the shared
      // metastore contract; locally the default catalog + warehouse dir.
      val name = "graft_sink_table"
      s.sql(s"DROP TABLE IF EXISTS $name")
      // a FRESH catalog (new JVM) doesn't know the table, so the DROP is a
      // no-op while the warehouse directory from a previous run persists —
      // saveAsTable then fails with LOCATION_ALREADY_EXISTS. Remove the
      // stale location the way a catalog-level DROP would have.
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
      val loc = new java.io.File(
        if (wh.getScheme == "file") wh.getPath
        else s.conf.get("spark.sql.warehouse.dir"), name)
      if (loc.isDirectory) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
      Tables.orders(s, d).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice")).as("total"))
        .write.mode("overwrite").saveAsTable(name)
      Tables.orders(s, d)
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice")).as("total"))
        .select(lit("ALL").as("o_orderstatus"), col("cnt"), col("total"))
        .write.mode("append").insertInto(name)
      s.table(name).orderBy("o_orderstatus")
    }),

    "a_sink_custom" -> ((s, d) => {
      // DataSource V2 WRITE connector (graft.sources.DirSink): tasks write
      // private temp files, the driver publishes them atomically on commit
      // (_SUCCESS marker, aborted attempts leave no trace) — the V2 commit
      // protocol end-to-end. The oracle checks the read-back values
      // against the same aggregate on parquet.
      val tmp = scratch("sink_custom")
      Tables.orders(s, d).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice")).as("total"))
        .repartition(2) // force 2 writer tasks (AQE folds the tiny agg to 1)
        .write.format("graft.sources.DirSink").option("path", tmp)
        .mode("overwrite").save()
      s.read.schema("o_orderstatus STRING, cnt BIGINT, total DOUBLE")
        .option("sep", "\t").csv(tmp).orderBy("o_orderstatus")
    }),

    "a_scan_avro" -> ((s, d) => {
      // Avro round-trip through the custom DSv2 connector
      // (graft.sources.AvroSource — avro-core only; spark-avro is not on
      // this classpath): write a typed slice (long / timestamp-micros /
      // double / string + a genuinely NULL union column) as Avro container
      // files, read back THROUGH the connector with a projection + filter.
      // Column pruning rides the Avro READER schema (skip-decode of
      // dropped fields — pinned in AvroSpec); values oracle-checked
      // against the base table.
      val tmp = scratch("scan_avro")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          col("o_orderstatus"),
          when(col("o_orderkey") % 10 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderpriority")).as("prio"))
        .repartition(4)
        .write.format("graft.sources.AvroSource").option("path", tmp)
        .mode("overwrite").save()
      s.read.format("graft.sources.AvroSource").option("path", tmp).load()
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate", "o_totalprice", "prio")
        .orderBy("o_orderkey")
    }),

    "a_sink_avro" -> ((s, d) => {
      // Avro as a SINK with the full V2 commit protocol (task-private
      // temps, atomic publish, _SUCCESS) — the oracle checks the
      // read-back values against the same aggregate on parquet, so the
      // format conversion itself is value-checked (a_sink_orc pattern).
      val tmp = scratch("sink_avro")
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice")).as("total"))
        .repartition(2) // force 2 writer tasks (AQE folds the tiny agg to 1)
        .write.format("graft.sources.AvroSource").option("path", tmp)
        .mode("overwrite").save()
      s.read.format("graft.sources.AvroSource").option("path", tmp).load()
        .orderBy("o_orderpriority")
    }),

    "a_scan_merge_schema" -> ((s, d) => {
      // schema evolution: two parquet batches with different column sets
      // (a later pipeline version added a column; old files stay), read
      // together with mergeSchema — the schema-drift reality of any
      // long-lived ingest. Values oracle-checked against the base table.
      val tmp = scratch("merge_schema")
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$tmp/v1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$tmp/v2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
        .select(col("o_orderkey"), r4(col("o_totalprice")).as("price"),
          coalesce(col("o_orderpriority"), lit("MISSING")).as("prio"))
        .orderBy("o_orderkey")
    }),

    "a_sink_csv" -> ((s, d) => {
      val tmp = scratch("sink_csv")
      Tables.orders(s, d).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice")).as("total"))
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema("o_orderstatus STRING, cnt BIGINT, total DOUBLE")
        .option("header", "true").csv(tmp).orderBy("o_orderstatus")
    }),

    // ---------------------------------------------------- B. project/filter
    "b_project_rename_cast" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        // floor-then-cast on BOTH engines: Spark double→long truncates while
        // DuckDB ::BIGINT rounds, so the bare cast is not portable (§2 B).
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        col("o_orderstatus").as("status"))
        .orderBy("id")),

    "b_filter_compare" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 30 && col("l_discount") < 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    "b_filter_in_like_between" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").isin("ECONOMY", "PROMO")
          && col("p_name").like("%bolt%")
          && col("p_size").between(1, 25))
        .select("p_partkey", "p_name", "p_type", "p_size")
        .orderBy("p_partkey")),

    "b_filter_null_bool" -> ((s, d) =>
      // testdata has no NULLs — manufacture them with nullif (§2 B note)
      Tables.orders(s, d)
        .select(col("o_orderkey"), expr("nullif(o_orderstatus,'P')").as("st"),
          col("o_totalprice"))
        .filter(col("st").isNull || col("o_totalprice") > 450000)
        .orderBy("o_orderkey")),

    "b_case_when" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_discount") < 0.02, lit(0.0))
          .when(col("l_discount") > 0.08, r4(col("l_discount") * 2))
          .otherwise(col("l_discount")).as("disc_adj"))
        .orderBy("l_orderkey", "l_linenumber", "disc_adj")),

    "b_distinct" -> ((s, d) =>
      Tables.customer(s, d).select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")),

    // ------------------------------------------------------------- C. joins
    "c_join_broadcast" -> ((s, d) =>
      // the reference's code→description lookup analog: fact ⋈ broadcast dim
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), r4(sum("l_extendedprice")).as("revenue"))
        .orderBy("p_brand")),

    "c_join_shuffle_hash" -> ((s, d) =>
      Tables.lineitem(s, d).hint("shuffle_hash")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), r4(sum("l_quantity")).as("qty"))
        .orderBy("o_orderpriority")),

    "c_join_sort_merge" -> ((s, d) =>
      // revenue summed in EXACT integer cents: at sf0.1 the double sum of
      // ~240k prices lands on a round(,4) half-boundary and the two
      // engines' last-ulp sums round apart (SURVEY §7.3 rule: never emit
      // a value computed at a decimal rounding boundary)
      Tables.lineitem(s, d).hint("merge")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev_cents"))
        .orderBy("o_orderstatus")),

    "c_join_left_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"),
          r4(sum("o_totalprice")).as("total"))
        .orderBy("c_mktsegment")),

    "c_join_right_outer" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_nationkey")
        .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy("c_nationkey")),

    "c_join_full_outer" -> ((s, d) =>
      // key ranges engineered so BOTH null sides occur (custkey vs suppkey*20)
      Tables.customer(s, d)
        .join(Tables.supplier(s, d),
          col("c_custkey") === col("s_suppkey") * 20, "full")
        .select("c_custkey", "s_suppkey", "c_mktsegment", "s_name")
        .orderBy(col("c_custkey").asc_nulls_first,
          col("s_suppkey").asc_nulls_first)),

    "c_join_semi" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    "c_join_anti" -> ((s, d) =>
      // customers with no high-value order (selective right side so the
      // anti join actually produces rows — every customer has SOME order)
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "c_join_lateral" -> ((s, d) => {
      // correlated LATERAL subquery: each customer's 2 most recent orders
      // via a per-row subquery with its own ORDER BY + LIMIT — the SQL
      // surface for "top-n per key" when the consumer writes SQL, not
      // window functions. Catalyst decorrelates it into a join +
      // per-group limit, so it executes set-at-a-time, never row-at-a-time.
      Tables.customer(s, d).createOrReplaceTempView("customer_lat")
      Tables.orders(s, d).createOrReplaceTempView("orders_lat")
      s.sql(
        """SELECT c_custkey, o_orderkey, o_orderdate
          |FROM customer_lat JOIN LATERAL (
          |  SELECT o_orderkey, o_orderdate FROM orders_lat
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2)
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    }),

    "b_correlated_scalar" -> ((s, d) => {
      // correlated scalar subquery: orders costing more than twice their
      // customer's average — the per-row aggregate comparison Catalyst
      // rewrites into an aggregate + join (decorrelation), so the plan is
      // one grouped pass over orders, not a subquery per row.
      Tables.orders(s, d).createOrReplaceTempView("orders_cs")
      s.sql(
        """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
          |FROM orders_cs o
          |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
          |                          FROM orders_cs o2
          |                          WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    "c_join_null_safe" -> ((s, d) => {
      // null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
      // EACH OTHER, where a plain `=` silently drops every NULL-keyed row
      // — the semantic a dedup or reconciliation job needs when the join
      // key is itself nullable. Keys are pre-aggregated per side, so the
      // join is 11 x 11; the NULL row surviving the INNER join is the
      // proof of the semantics.
      val a = Tables.orders(s, d)
        .groupBy(expr("nullif(o_custkey % 10, 3)").as("ka"))
        .agg(count(lit(1)).as("cnt_a"))
      val b = Tables.customer(s, d)
        .groupBy(expr("nullif(c_custkey % 10, 3)").as("kb"))
        .agg(count(lit(1)).as("cnt_b"))
      a.join(b, col("ka") <=> col("kb"))
        .select(col("ka"), col("cnt_a"), col("cnt_b"))
        .orderBy(col("ka").asc_nulls_first)
    }),

    "c_join_cross" -> ((s, d) =>
      Tables.nation(s, d).crossJoin(Tables.region(s, d))
        .select("n_nationkey", "r_regionkey", "n_name", "r_name")
        .orderBy("n_nationkey", "r_regionkey")),

    "c_join_theta_range" -> ((s, d) => {
      // non-equi band join; inputs bounded by a selective filter so the
      // BroadcastNestedLoop stays small at every SF (32 rows @ sf0.01)
      val small = Tables.orders(s, d).filter(col("o_totalprice") < 2000)
        .select("o_orderkey", "o_totalprice")
      val a = small.as("a")
      val b = small.as("b")
      a.join(b,
        col("a.o_totalprice").between(col("b.o_totalprice") - 10, col("b.o_totalprice"))
          && col("a.o_orderkey") =!= col("b.o_orderkey"))
        .select(col("a.o_orderkey").as("a_key"), col("b.o_orderkey").as("b_key"))
        .orderBy("a_key", "b_key")
    }),

    "c_join_star_5way" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("r_name", "n_name")),

    "c_join_asof" -> ((s, d) => {
      // as-of join: latest prior click per error event, same user.
      // inner-join + max_by formulation (verified parity recipe, §2 C).
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      errors.join(clicks, col("user_id") === col("c_user") && col("c_ts") <= col("ts"))
        .groupBy("event_id")
        .agg(max_by(col("c_id"), col("c_ts")).as("prior_click"))
        .orderBy("event_id")
    }),

    "c_join_asof_native" -> ((s, d) => {
      // same as-of semantics through the custom physical operator
      // (graft.plans.AsOfJoinExec): one shuffle + sort per side and a
      // single merge pass — no per-key (error × prior-click) pair
      // materialization like the declarative baseline above. Left-outer:
      // errors with no prior click keep a NULL prior_click.
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      graft.plans.AsOfJoin.asof(errors, clicks,
          "user_id", "c_user", "ts", "c_ts", "c_id")
        .select(col("event_id"), col("c_id").as("prior_click"))
        .orderBy("event_id")
    }),

    "c_join_interval_native" -> ((s, d) => {
      // the stream-stream interval join's batch semantics through the
      // custom sweep operator (graft.plans.IntervalJoinExec): same
      // shuffle+sort as the SortMergeJoin Spark would pick, but the time
      // window is enforced DURING the merge by a bounded sliding buffer
      // (streaming-state-store shape) instead of a post-join filter over
      // every same-key pair — at a skewed 100 TB key the declarative form
      // is quadratic per key, this one is linear + window density.
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      graft.plans.IntervalJoin.interval(clicks, views,
          "user_id", "v_user", "click_ts", "view_ts", 10L * 60 * 1000000)
        .select("user_id", "click_id", "view_id", "click_ts", "view_ts")
        .orderBy("user_id", "click_id", "view_id")
    }),
  )

  val oracle: ListMap[String, String] = ListMap(
    "a_scan_parquet" ->
      ("SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, " +
        "l_suppkey, l_quantity, l_extendedprice, l_discount"),
    "a_scan_parquet_events" ->
      ("SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props " +
        "FROM events ORDER BY event_id"),
    "a_scan_pruned" ->
      "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_quantity",
    "a_scan_filter_pushdown" ->
      ("SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '2000-12-01' ORDER BY l_orderkey, l_linenumber, l_shipdate"),
    "a_scan_custom_source" ->
      ("SELECT g AS id, 't' || (g % 5) AS tag FROM generate_series(0, 1999) t(g) " +
        "WHERE g % 7 = 0 ORDER BY id"),
    "a_scan_agg_pushdown" ->
      ("SELECT count(*) AS n, min(g) AS min_id, max(g) AS max_id, " +
        "min(CAST(g AS DOUBLE) * 0.5) AS min_val, " +
        "max(CAST(g AS DOUBLE) * 0.5) AS max_val " +
        "FROM generate_series(0, 99999) t(g) WHERE g >= 1000 AND g < 99000"),
    "a_sink_table" ->
      ("SELECT * FROM (" +
        "SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 4) AS total " +
        "FROM orders GROUP BY o_orderstatus " +
        "UNION ALL SELECT 'ALL', count(*), round(sum(o_totalprice), 4) FROM orders" +
        ") ORDER BY o_orderstatus"),
    "a_sink_custom" ->
      ("SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 4) AS total " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // clean rows after corrupt-line quarantine = the base table verbatim
    "a_scan_corrupt" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    // XML round-trip = the base table verbatim
    "a_scan_xml" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    // pruned read = the plain filtered aggregate off the base table
    "a_scan_partition_prune" ->
      ("SELECT o_orderpriority, count(*) AS n, " +
        "round(sum(o_totalprice), 4) AS total FROM orders " +
        "WHERE o_orderstatus = 'F' " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // expected FINAL table state after the dynamic-partition overwrite:
    // earliest day recomputed (doubled), every other day untouched
    "a_sink_dynamic_overwrite" ->
      ("WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, value FROM events), " +
        "md AS (SELECT min(day) AS d FROM e) " +
        "SELECT day, count(*) AS n, " +
        "round(sum(CASE WHEN day = (SELECT d FROM md) THEN value * 2 " +
        "ELSE value END), 4) AS sum_val " +
        "FROM e GROUP BY day ORDER BY day"),
    // round-trip keys: the oracle checks the read-back VALUES against the
    // base table, so the format conversion itself is value-checked (same
    // pattern as a_sink_orc)
    "a_scan_csv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "a_scan_jsonl" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "a_sink_parquet" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS cnt, " +
        "round(sum(l_quantity), 4) AS sum_qty FROM lineitem " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "a_sink_partitioned" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag"),
    "a_sink_csv" ->
      ("SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 4) AS total " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "a_scan_merge_schema" ->
      ("SELECT o_orderkey, round(o_totalprice, 4) AS price, " +
        "CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority ELSE 'MISSING' END AS prio " +
        "FROM orders ORDER BY o_orderkey"),
    // Avro round-trip: read-back values vs the base table (NULL union
    // column included — a mis-encoded null would mismatch)
    "a_scan_avro" ->
      ("SELECT o_orderkey, o_orderdate, o_totalprice, " +
        "CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderpriority END AS prio " +
        "FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey"),
    "a_sink_avro" ->
      ("SELECT o_orderpriority, count(*) AS cnt, round(sum(o_totalprice), 4) AS total " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // ORC SOURCE: read-back values vs the base table (NULL column
    // included — a mis-encoded null or timestamp unit would mismatch)
    "a_scan_orc" ->
      ("SELECT o_orderkey, o_orderdate, o_totalprice, " +
        "CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderpriority END AS prio " +
        "FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey"),
    // checks the ORC write→read round-trip against the parquet-side aggregate
    "a_sink_orc" ->
      ("SELECT o_orderpriority, count(*) AS cnt, round(sum(o_totalprice), 4) AS total " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "b_project_rename_cast" ->
      ("SELECT o_orderkey AS id, CAST(floor(o_totalprice) AS BIGINT) AS price_floor, " +
        "o_orderstatus AS status FROM orders ORDER BY id"),
    "b_filter_compare" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem " +
        "WHERE l_quantity >= 30 AND l_discount < 0.05 ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount"),
    "b_filter_in_like_between" ->
      ("SELECT p_partkey, p_name, p_type, p_size FROM part " +
        "WHERE p_type IN ('ECONOMY','PROMO') AND p_name LIKE '%bolt%' " +
        "AND p_size BETWEEN 1 AND 25 ORDER BY p_partkey"),
    "b_filter_null_bool" ->
      ("SELECT o_orderkey, nullif(o_orderstatus,'P') AS st, o_totalprice FROM orders " +
        "WHERE nullif(o_orderstatus,'P') IS NULL OR o_totalprice > 450000 " +
        "ORDER BY o_orderkey"),
    "b_case_when" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_discount < 0.02 THEN 0.0 " +
        "WHEN l_discount > 0.08 THEN round(l_discount * 2, 4) " +
        "ELSE l_discount END AS disc_adj " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_adj"),
    "b_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "c_join_broadcast" ->
      ("SELECT p_brand, count(*) AS cnt, round(sum(l_extendedprice),4) AS revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "c_join_shuffle_hash" ->
      ("SELECT o_orderpriority, count(*) AS cnt, round(sum(l_quantity),4) AS qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "c_join_sort_merge" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) " +
        "AS BIGINT) AS rev_cents " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "c_join_left_outer" ->
      ("SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows, " +
        "round(sum(o_totalprice),4) AS total " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "c_join_right_outer" ->
      ("SELECT c_nationkey, count(o_orderkey) AS n_orders, count(*) AS n_rows " +
        "FROM orders RIGHT JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_nationkey ORDER BY c_nationkey"),
    "c_join_full_outer" ->
      ("SELECT c_custkey, s_suppkey, c_mktsegment, s_name " +
        "FROM customer FULL JOIN supplier ON c_custkey = s_suppkey * 20 " +
        "ORDER BY c_custkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST"),
    "c_join_semi" ->
      ("SELECT o_orderkey, o_totalprice FROM orders WHERE EXISTS " +
        "(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49) " +
        "ORDER BY o_orderkey"),
    "c_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000) " +
        "ORDER BY c_custkey"),
    "c_join_lateral" ->
      ("SELECT c_custkey, o_orderkey, o_orderdate " +
        "FROM customer JOIN LATERAL (" +
        "SELECT o_orderkey, o_orderdate FROM orders " +
        "WHERE o_custkey = c_custkey " +
        "ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) t ON true " +
        "ORDER BY c_custkey, o_orderkey"),
    "b_correlated_scalar" ->
      ("SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price " +
        "FROM orders o " +
        "WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2 " +
        "WHERE o2.o_custkey = o.o_custkey) " +
        "ORDER BY o_orderkey"),
    "c_join_null_safe" ->
      ("WITH a AS (SELECT nullif(o_custkey % 10, 3) ka, count(*) cnt_a " +
        "FROM orders GROUP BY 1), " +
        "b AS (SELECT nullif(c_custkey % 10, 3) kb, count(*) cnt_b " +
        "FROM customer GROUP BY 1) " +
        "SELECT ka, cnt_a, cnt_b FROM a JOIN b ON ka IS NOT DISTINCT FROM kb " +
        "ORDER BY ka ASC NULLS FIRST"),
    "c_join_cross" ->
      ("SELECT n_nationkey, r_regionkey, n_name, r_name FROM nation CROSS JOIN region " +
        "ORDER BY n_nationkey, r_regionkey"),
    "c_join_theta_range" ->
      ("WITH small AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 2000) " +
        "SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key FROM small a JOIN small b " +
        "ON a.o_totalprice BETWEEN b.o_totalprice - 10 AND b.o_totalprice " +
        "AND a.o_orderkey <> b.o_orderkey ORDER BY a_key, b_key"),
    "c_join_star_5way" ->
      ("SELECT r_name, n_name, round(sum(l_extendedprice * (1 - l_discount)),4) AS revenue, " +
        "count(*) AS cnt FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
    "c_join_asof" ->
      // ts truncated to µs on the oracle side to match Spark's µs timestamps
      ("SELECT e.event_id, arg_max(c.event_id, c.ts::TIMESTAMP) AS prior_click " +
        "FROM events e JOIN events c ON c.user_id = e.user_id " +
        "AND c.ts::TIMESTAMP <= e.ts::TIMESTAMP AND c.event_type = 'click' " +
        "WHERE e.event_type = 'error' GROUP BY e.event_id ORDER BY e.event_id"),
    // left-outer + explicit (ts DESC, id DESC) tiebreak — the native
    // operator's defined total order
    "c_join_asof_native" ->
      ("SELECT event_id, prior_click FROM (" +
        "SELECT e.event_id, c.event_id AS prior_click, row_number() OVER (" +
        "PARTITION BY e.event_id ORDER BY c.ts::TIMESTAMP DESC, c.event_id DESC) rn " +
        "FROM (SELECT * FROM events WHERE event_type = 'error') e " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON e.user_id = c.user_id AND c.ts::TIMESTAMP <= e.ts::TIMESTAMP" +
        ") WHERE rn = 1 ORDER BY event_id"),
    "c_join_interval_native" ->
      ("SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id, " +
        "c.ts::TIMESTAMP AS click_ts, v.ts::TIMESTAMP AS view_ts " +
        "FROM events c JOIN events v ON c.user_id = v.user_id " +
        "WHERE c.event_type = 'click' AND v.event_type = 'view' " +
        "AND v.ts::TIMESTAMP >= c.ts::TIMESTAMP - INTERVAL 10 MINUTE " +
        "AND v.ts::TIMESTAMP <= c.ts::TIMESTAMP " +
        "ORDER BY 1, 2, 3"),
  )
}
