package graft

import org.apache.spark.sql.functions._

/** Algebraic properties of the LLM-pipeline operators (SURVEY §5.2(3)). */
class PropertySpec extends SparkTestBase {

  test("dedup is idempotent: dedup(dedup(X)) == dedup(X)") {
    val once = SparkEntry.queries("i_dedup_exact")(spark, sfDir)
    val twice = once.groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n"))
    assert(once.count() == twice.count())
    assert(twice.agg(max("n")).collect().head.getLong(0) == 1L)
  }

  test("jaccard is in [0,1] and cosine top-k values in [-1,1]") {
    val jac = SparkEntry.queries("i_jaccard_pairs")(spark, sfDir)
      .select("jac").collect().map(_.getDouble(0))
    assert(jac.forall(j => j >= 0.0 && j <= 1.0))
    val cos = SparkEntry.queries("i_cosine_topk")(spark, sfDir)
      .select("cos").collect().map(_.getDouble(0))
    assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("cosine(v, v) == 1 for the unit-norm embeddings") {
    graft.functions.VectorExprs.register(spark)
    val self = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("v"))
      .selectExpr("round(graft_dot(v, v) / (sqrt(graft_dot(v, v)) * sqrt(graft_dot(v, v))), 6) AS c")
      .agg(min("c"), max("c")).collect().head
    assert(self.getDouble(0) == 1.0 && self.getDouble(1) == 1.0)
  }

  test("hash anonymization is deterministic and collision-free on customers") {
    val h = SparkEntry.queries("g_hash_anonymize")(spark, sfDir)
    assert(h.select("plate_hash").distinct().count() == h.count())
    val a = h.collect().map(_.toString).toSeq
    val b = SparkEntry.queries("g_hash_anonymize")(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("set-op cardinality laws: |A| = |A∩B| + |A\\B| (multiset)") {
    val a = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 200000)
      .select("o_orderstatus", "o_orderpriority")
    val b = Tables.orders(spark, sfDir).filter(col("o_orderstatus") =!= "P")
      .select("o_orderstatus", "o_orderpriority")
    assert(a.count() == a.intersectAll(b).count() + a.exceptAll(b).count())
  }

  test("session window event counts sum to the table row count") {
    val sessions = SparkEntry.queries("j_session")(spark, sfDir)
    val total = sessions.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("sliding windows each hold >= the tumbling window count sum / 4") {
    val slide = SparkEntry.queries("j_sliding")(spark, sfDir)
      .agg(sum("cnt")).collect().head.getLong(0)
    val events = Tables.events(spark, sfDir).count()
    assert(slide == events * 4, "each event belongs to exactly 4 sliding windows")
  }

  test("graft_topk equals the row_number window on adversarial random data") {
    // random scores with deliberate DUPLICATE score values per group — the
    // tie path the fixtures rarely hit. Deterministic seed.
    graft.functions.VectorExprs.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = (0 until 2000).map { i =>
      (i % 17L, rng.nextInt(20) / 10.0, i.toLong) // only 20 distinct scores
    }
    val df = rows.toDF("g", "score", "id")
    df.createOrReplaceTempView("topk_prop")
    val native = spark.sql(
      """SELECT g, t.id, t.score, t.rn FROM (
        |  SELECT g, explode(graft_topk(score, id, 3, false)) AS t
        |  FROM topk_prop GROUP BY g)""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    val window = spark.sql(
      """SELECT g, id, score, rn FROM (
        |  SELECT g, id, score, CAST(row_number() OVER (
        |    PARTITION BY g ORDER BY score DESC, id) AS BIGINT) rn
        |  FROM topk_prop) WHERE rn <= 3""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    assert(native == window)
  }

  test("native as-of join equals the window formulation under ts ties") {
    // coarse timestamps force (key, ts) TIES on the right side — exercising
    // the operator's (ts DESC, id DESC) tiebreak, which fixture data with
    // unique timestamps never hits. Deterministic seed.
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 09:${m}%02d:00")
    val lefts = (0 until 300).map(i => (rng.nextInt(9).toLong, ts(rng.nextInt(50)), i.toLong))
      .toDF("user_id", "ts", "event_id")
    val rights = (0 until 300).map(i => (rng.nextInt(9).toLong, ts(rng.nextInt(50)), 1000L + i))
      .toDF("c_user", "c_ts", "c_id")
    val native = graft.plans.AsOfJoin
      .asof(lefts, rights, "user_id", "c_user", "ts", "c_ts", "c_id")
      .select("event_id", "c_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    lefts.createOrReplaceTempView("asof_l")
    rights.createOrReplaceTempView("asof_r")
    val window = spark.sql(
      """SELECT event_id, c_id FROM (
        |  SELECT l.event_id, r.c_id, row_number() OVER (
        |    PARTITION BY l.event_id ORDER BY r.c_ts DESC, r.c_id DESC) rn
        |  FROM asof_l l LEFT JOIN asof_r r
        |    ON l.user_id = r.c_user AND r.c_ts <= l.ts) WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native == window)
  }

  test("minhash signature similarity correlates with exact duplicate") {
    // identical docs (none in fixture) would share all 8 signatures; sanity:
    // a doc always shares all 8 signatures with itself via recompute
    val sig = SparkEntry.queries("i_minhash")(spark, sfDir)
    val again = SparkEntry.queries("i_minhash")(spark, sfDir)
    assert(sig.collect().map(_.toString).toSeq == again.collect().map(_.toString).toSeq)
  }
}
