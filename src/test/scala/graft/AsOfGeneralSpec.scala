package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** Round-4 generalization of the native as-of join (VERDICT r3 #7 + ADVICE):
  * arbitrary orderable key types (string plates/tickets, not just BIGINT),
  * SQL NULL semantics, and the planning-time type/name guards.
  */
class AsOfGeneralSpec extends SparkTestBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")

  test("string-keyed as-of join agrees with the declarative window baseline") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val lefts = (0 until 300).map(i =>
      (s"PLATE-${rng.nextInt(9)}", ts(rng.nextInt(50)), i.toLong))
      .toDF("plate", "ts", "event_id")
    val rights = (0 until 300).map(i =>
      (s"PLATE-${rng.nextInt(9)}", ts(rng.nextInt(50)), 1000L + i))
      .toDF("c_plate", "c_ts", "c_id")
    val native = AsOfJoin
      .asof(lefts, rights, "plate", "c_plate", "ts", "c_ts", "c_id")
      .select("event_id", "c_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    lefts.createOrReplaceTempView("asof_sl")
    rights.createOrReplaceTempView("asof_sr")
    val window = spark.sql(
      """SELECT event_id, c_id FROM (
        |  SELECT l.event_id, r.c_id, row_number() OVER (
        |    PARTITION BY l.event_id ORDER BY r.c_ts DESC, r.c_id DESC) rn
        |  FROM asof_sl l LEFT JOIN asof_sr r
        |    ON l.plate = r.c_plate AND r.c_ts <= l.ts) WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native == window)
  }

  test("NULL keys/timestamps follow SQL join semantics (never coerced to 0)") {
    import spark.implicits._
    val lefts = Seq(
      (Option("A"), Option(ts(10)), 1L), // matches the valid right row
      (Option.empty[String], Option(ts(10)), 2L), // null key -> no match
      (Option("A"), Option.empty[Timestamp], 3L)  // null ts  -> no match
    ).toDF("k", "ts", "event_id")
    val rights = Seq(
      (Option("A"), Option(ts(5)), 10L),          // the only matchable row
      (Option.empty[String], Option(ts(1)), 11L), // null key: never a match
      (Option("A"), Option.empty[Timestamp], 12L) // null ts: never a match
    ).toDF("ck", "cts", "c_id")
    val out = AsOfJoin.asof(lefts, rights, "k", "ck", "ts", "cts", "c_id")
      .select("event_id", "c_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> 10L, 2L -> -1L, 3L -> -1L))
  }

  test("mismatched ts types across sides are rejected at planning") {
    import spark.implicits._
    val lefts = Seq(("A", ts(10), 1L)).toDF("k", "ts", "event_id")
    val rights = Seq(("A", 5L, 10L)).toDF("ck", "cts", "c_id") // BIGINT ts
    val e = intercept[Throwable] {
      AsOfJoin.asof(lefts, rights, "k", "ck", "ts", "cts", "c_id").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("ts types must match"),
      s"got: ${e.getMessage}")
  }

  test("native interval join agrees with the declarative range join on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val lefts = (0 until 400).map(i =>
      (rng.nextInt(7).toLong, ts(rng.nextInt(55)), i.toLong))
      .toDF("k", "lts", "l_id")
    val rights = (0 until 400).map(i =>
      (rng.nextInt(7).toLong, ts(rng.nextInt(55)), 1000L + i))
      .toDF("rk", "rts", "r_id")
    // 10-minute window, inclusive both ends — boundary ties included by
    // construction (minute-granularity fixture)
    val native = graft.plans.IntervalJoin
      .interval(lefts, rights, "k", "rk", "lts", "rts", 10L * 60 * 1000000)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val declarative = lefts.join(rights,
        col("k") === col("rk") &&
          col("rts") >= col("lts") - expr("INTERVAL 10 MINUTES") &&
          col("rts") <= col("lts"))
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == declarative,
      s"native ${native.size} pairs vs declarative ${declarative.size}")
    assert(declarative.nonEmpty)
  }

  test("interval join NULL keys/timestamps never match (inner-join semantics)") {
    import spark.implicits._
    val lefts = Seq(
      (Option("A"), Option(ts(10)), 1L),
      (Option.empty[String], Option(ts(10)), 2L),
      (Option("A"), Option.empty[Timestamp], 3L)
    ).toDF("k", "lts", "l_id")
    val rights = Seq(
      (Option("A"), Option(ts(5)), 10L),
      (Option.empty[String], Option(ts(5)), 11L),
      (Option("A"), Option.empty[Timestamp], 12L)
    ).toDF("rk", "rts", "r_id")
    val out = graft.plans.IntervalJoin
      .interval(lefts, rights, "k", "rk", "lts", "rts", 10L * 60 * 1000000)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(1L -> 10L))
  }

  test("interval join with window 0 matches only exact-timestamp pairs") {
    import spark.implicits._
    val lefts = Seq(("A", ts(10), 1L), ("A", ts(20), 2L)).toDF("k", "lts", "l_id")
    val rights = Seq(("A", ts(10), 10L), ("A", ts(19), 11L), ("A", ts(21), 12L))
      .toDF("rk", "rts", "r_id")
    val out = graft.plans.IntervalJoin
      .interval(lefts, rights, "k", "rk", "lts", "rts", 0L)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(1L -> 10L))
  }

  test("as-of join generalizes to DATE timestamps (any orderable ts type)") {
    import spark.implicits._
    def dt(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")
    val lefts = Seq(("A", dt(10), 1L), ("A", dt(3), 2L), ("B", dt(10), 3L))
      .toDF("k", "d", "l_id")
    val rights = Seq(("A", dt(5), 10L), ("A", dt(9), 11L), ("B", dt(11), 12L))
      .toDF("rk", "rd", "r_id")
    val out = graft.plans.AsOfJoin
      .asof(lefts, rights, "k", "rk", "d", "rd", "r_id")
      .select("l_id", "r_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // latest right date <= left date per key; B's only candidate is later
    assert(out == Map(1L -> 11L, 2L -> -1L, 3L -> -1L))
  }

  test("portable simhash: equal texts get equal signatures, different texts differ") {
    import spark.implicits._
    val docs = Seq((1L, "join hash row"), (2L, "join hash row"),
      (3L, "batch scan filter sort")).toDF("doc_id", "text")
    val sigs = graft.queries.ILlmOps.portableSimhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "identical text must hash identically")
    assert(sigs(1L) != sigs(3L), "disjoint vocab should differ")
  }

  test("shared column names across sides are rejected eagerly") {
    import spark.implicits._
    val lefts = Seq(("A", ts(10), 1L)).toDF("k", "ts", "event_id")
    val rights = Seq(("A", ts(5), 10L)).toDF("ck", "ts", "c_id") // 'ts' collides
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(lefts, rights, "k", "ck", "ts", "ts", "c_id")
    }
    assert(e.getMessage.contains("rename/alias"), s"got: ${e.getMessage}")
  }
}
