package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.r4
import graft.functions.GeoMean

/** Group K — user-defined function surfaces: scalar UDF, typed Aggregator
  * UDAF, and a flatMap-based table function (UDTF).
  *
  * UDFs are Catalyst black boxes (no pushdown through them), so the logic is
  * kept SQL-replicable and the UDF column is computed after filters.
  */
object KUdx {

  val m: ListMap[String, Q] = ListMap(
    "k_udf_scalar" -> ((s, d) => {
      // value-clamping cleaning rule (the reference's fine-normalization
      // analog) as a registered Scala UDF
      val clamp = udf((v: Double) => math.min(v, 100.0))
      Tables.events(s, d)
        .select(col("event_id"), col("value"), clamp(col("value")).as("clamped"))
        .orderBy("event_id")
    }),

    "k_udaf_aggregator" -> ((s, d) => {
      val gm = udaf(GeoMean)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(r4(gm(col("l_extendedprice"))).as("geo_mean"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    "k_typed_mapgroups" -> ((s, d) => {
      // typed KeyValueGroupedDataset API: per-user aggregation via
      // mapGroups (an arbitrary Scala reduction, not a SQL aggregate)
      import s.implicits._
      Tables.events(s, d).select("user_id", "value").as[(Long, Double)]
        .groupByKey(_._1)
        .mapGroups { (user, rows) =>
          var n = 0L
          var mx = Double.MinValue
          rows.foreach { r => n += 1; mx = math.max(mx, r._2) }
          (user, n, mx)
        }
        .toDF("user_id", "n_events", "max_val")
        .orderBy("user_id")
    }),

    "k_custom_expression" -> ((s, d) => {
      // native codegen'd Catalyst expression (graft_dot) exercised directly:
      // pairwise cosine over a bounded id range, hash-matched against
      // DuckDB's list_cosine_similarity
      graft.functions.VectorExprs.register(s)
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 30)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val a = e.select(col("vec_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          r4(expr("graft_dot(va, vb)") / (col("na") * col("nb"))).as("cos"))
        .orderBy("a_id", "b_id")
    }),

    "k_generator_native" -> ((s, d) => {
      // TRUE Catalyst Generator (functions/NGramGen.scala): the n-gram
      // table function runs inside GenerateExec as a pure map stage fused
      // with the scan — no lead() window shuffle, no intermediate array
      // materialization. Trigram stream per doc, position included.
      graft.functions.NGramGen.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), expr("graft_ngrams(text, 3)"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("ngram"))
        .orderBy("doc_id", "pos")
    }),

    "k_udtf_generator" -> ((s, d) => {
      // table function: one row per token with position and length,
      // as a typed Dataset flatMap (a genuine row-generator, not a
      // relational explode)
      import s.implicits._
      Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, text) =>
          text.split(" ").iterator.zipWithIndex.map {
            case (w, i) => (id, i.toLong, w, w.length.toLong)
          }
        }
        .toDF("doc_id", "pos", "w", "w_len")
        .orderBy("doc_id", "pos")
    }),
  )

  val oracle: ListMap[String, String] = ListMap(
    "k_udf_scalar" ->
      ("SELECT event_id, value, least(value, 100.0::DOUBLE) AS clamped " +
        "FROM events ORDER BY event_id"),
    "k_udaf_aggregator" ->
      ("SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean, " +
        "count(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "k_typed_mapgroups" ->
      ("SELECT user_id, count(*) AS n_events, max(value) AS max_val " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "k_custom_expression" ->
      ("SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "(round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) + 0.0) AS cos " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE a.vec_id < 30 AND b.vec_id < 30 ORDER BY a_id, b_id"),
    // same trigram stream the shingle keys build with lead() windows —
    // the native Generator must agree with the declarative formulation
    "k_generator_native" ->
      ("SELECT doc_id, CAST(pos AS BIGINT) AS pos, ngram FROM (" +
        "SELECT doc_id, pos, w || ' ' || lead(w, 1) OVER win || ' ' || " +
        "lead(w, 2) OVER win AS ngram FROM (" +
        "SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos, " +
        "unnest(string_split(text, ' ')) AS w FROM documents) " +
        "WINDOW win AS (PARTITION BY doc_id ORDER BY pos)) " +
        "WHERE ngram IS NOT NULL ORDER BY doc_id, pos"),
    "k_udtf_generator" ->
      ("SELECT doc_id, pos, w, length(w) AS w_len FROM " +
        "(SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos, " +
        "unnest(string_split(text, ' ')) AS w FROM documents) " +
        "ORDER BY doc_id, pos"),
  )
}
