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

  test("minhash signature similarity correlates with exact duplicate") {
    // identical docs (none in fixture) would share all 4 signatures; sanity:
    // a doc always shares all 4 signatures with itself via recompute
    val sig = SparkEntry.queries("i_minhash")(spark, sfDir)
    val again = SparkEntry.queries("i_minhash")(spark, sfDir)
    assert(sig.collect().map(_.toString).toSeq == again.collect().map(_.toString).toSeq)
  }
}
