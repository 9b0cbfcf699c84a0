package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.r4

/** Group V — model-inference operators: embedding GENERATION (the round-7
  * gap: embeddings were consumed by the ANN/semdedup stack but never
  * produced). The "model" is a hashing-trick projection — each token is
  * md5-hashed to one of 8 dimensions with a ±1 sign, and a document's
  * embedding is the per-dimension signed token count (Weinberger et al.'s
  * feature hashing, the standard cheap text embedder). Deterministic and
  * engine-portable (md5 hex digits, like `i_simhash_port`), so the
  * inference OUTPUT is itself oracle-checkable — not just smoke-tested.
  *
  * Three first-class shapes, because at 100 TB they are different ops:
  *  - `i_embed_infer`: the fully relational formulation (token explode →
  *    grouped signed counts). Catalyst sees through it — predicate
  *    pushdown, partial aggregation, whole-stage codegen all apply.
  *  - `i_embed_infer_batch`: the PRODUCTION INFERENCE SEAM — typed
  *    `mapPartitions` with once-per-partition model load, rows streamed
  *    through the loaded model. A real deployment replaces only the model
  *    init + forward call (tokenizer/weights/GPU session); the Spark-side
  *    plumbing (schema, partition batching, no shuffle) is exactly what
  *    ships. InferSpec proves it row-identical to the relational path, so
  *    the seam's correctness contract is executable.
  *  - `i_embed_infer_sim`: generated vectors flowing straight into the
  *    similarity stack (cosine top-3 via the bounded `graft_topk`
  *    aggregate) — inference → index → query end to end, with the same
  *    bounded-baseline posture as `i_cosine_topk` (the bucketed ANN
  *    family is the declared scale path for the candidate join).
  *
  * Scale posture: inference is embarrassingly parallel — per-partition
  * model init amortizes across the partition's rows, output is one row per
  * document, no shuffle. The relational twin shuffles token rows to regroup
  * by document (fine at fixture scale, dominated by the md5 projection at
  * corpus scale) — the same trade `minhashSig` documents, with the batch
  * seam as the production answer.
  */
object VInfer {

  private val D = 8 // projection dimensions

  /** Value 0..15 of hex digit `pos` (1-based) of md5(w) — the portable
    * per-token hash basis shared with `i_simhash_port`/`minhashSig`. */
  private def hexv(pos: Int) =
    s"(instr('0123456789abcdef', substring(md5(w), $pos, 1)) - 1)"

  /** Relational hashed-projection embedding: dimension = md5 digit 1 & 7,
    * sign = md5 digit 2 & 1. Exact integer components; norm in half-up
    * integer basis points (SURVEY §7.3 cross-engine float discipline). */
  private[graft] def inferRelational(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val dims = (0 until D).map { j =>
      sum(expr(s"CASE WHEN (${hexv(1)} & 7) = $j THEN " +
        s"CASE WHEN (${hexv(2)} & 1) = 1 THEN 1 ELSE -1 END ELSE 0 END")).as(s"e$j")
    }
    tok.groupBy("doc_id").agg(dims.head, dims.tail: _*)
      .withColumn("norm_bp", expr(
        "CAST(floor(sqrt(CAST(" +
          (0 until D).map(j => s"e$j*e$j").mkString(" + ") +
          " AS DOUBLE)) * 10000 + 0.5) AS BIGINT)"))
  }

  val m: ListMap[String, Q] = ListMap(
    "i_embed_infer" -> ((s, d) =>
      inferRelational(Tables.documents(s, d)).orderBy("doc_id")),

    "i_embed_infer_batch" -> ((s, d) => {
      // the inference seam: model loaded ONCE per partition, rows streamed
      // through it. The hashing projection stands in for the model; its
      // output must be bit-identical to `i_embed_infer` (InferSpec + the
      // shared oracle both enforce that), so swapping in a real model
      // changes numbers, never plumbing.
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          // per-partition "model load" — digest instance + projection
          // config; a real embedder initializes tokenizer/weights here
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { case (id, text) =>
            val e = new Array[Long](D)
            for (w <- text.split(" ")) {
              // hex digit 1 = high nibble of byte 0, digit 2 = low nibble
              val b0 = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
              val dim = (b0 >> 4) & 7
              e(dim) += (if ((b0 & 1) == 1) 1L else -1L)
            }
            val n2 = e.map(x => x * x).sum
            (id, e(0), e(1), e(2), e(3), e(4), e(5), e(6), e(7),
              math.floor(math.sqrt(n2.toDouble) * 10000 + 0.5).toLong)
          }
        }
        .toDF("doc_id", "e0", "e1", "e2", "e3", "e4", "e5", "e6", "e7", "norm_bp")
        .orderBy("doc_id")
    }),

    "i_embed_infer_sim" -> ((s, d) => {
      // end to end: infer embeddings, then cosine top-3 neighbors over the
      // inferred vectors (bounded calibration subset; zero vectors have no
      // direction and are excluded before the pair join in BOTH engines)
      graft.functions.VectorExprs.register(s)
      val e = inferRelational(Tables.documents(s, d).filter(col("doc_id") < 120))
        .filter(col("norm_bp") > 0)
        .select(col("doc_id"),
          array((0 until D).map(j => col(s"e$j").cast("double")): _*).as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val a = e.select(col("doc_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
      val b = e.select(col("doc_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("a_id") =!= col("b_id"))
        .withColumn("cos", expr("graft_dot(va, vb)") / (col("na") * col("nb")))
        .groupBy("a_id")
        .agg(expr("graft_topk(cos, b_id, 3, false)").as("top"))
        .select(col("a_id"), explode(col("top")).as("t"))
        .select(col("a_id"), col("t.id").as("b_id"),
          r4(col("t.score")).as("cos"), col("t.rn").as("rn"))
        .orderBy("a_id", "rn")
    }),
  )

  // ---- DuckDB mirrors -------------------------------------------------

  /** DuckDB mirror of `inferRelational` over `src`, as CTEs `tok`+`emb`. */
  private def embSql(src: String): String =
    s"tok AS (SELECT doc_id, unnest(string_split(text, ' ')) w FROM $src), " +
      "emb AS (SELECT doc_id, " +
      (0 until D).map { j =>
        "CAST(sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) & 7) = " +
          s"$j THEN CASE WHEN ((strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) & 1) = 1 " +
          s"THEN 1 ELSE -1 END ELSE 0 END) AS BIGINT) e$j"
      }.mkString(", ") +
      " FROM tok GROUP BY doc_id)"

  private val n2 = (0 until D).map(j => s"e$j*e$j").mkString(" + ")

  private val inferSelect =
    "SELECT doc_id, " + (0 until D).map(j => s"e$j").mkString(", ") +
      s", CAST(floor(sqrt(CAST($n2 AS DOUBLE)) * 10000 + 0.5) AS BIGINT) norm_bp " +
      "FROM emb ORDER BY doc_id"

  val oracle: ListMap[String, String] = ListMap(
    "i_embed_infer" -> s"WITH ${embSql("documents")} $inferSelect",
    // the batch seam must produce the SAME rows — one oracle, two paths
    "i_embed_infer_batch" -> s"WITH ${embSql("documents")} $inferSelect",
    "i_embed_infer_sim" ->
      (s"WITH ${embSql("(SELECT * FROM documents WHERE doc_id < 120)")}, " +
        "e AS (SELECT doc_id, " +
        (0 until D).map(j => s"CAST(e$j AS DOUBLE) e$j").mkString(", ") +
        s", sqrt(CAST($n2 AS DOUBLE)) nrm FROM emb WHERE $n2 > 0) " +
        "SELECT a_id, b_id, (round(cos, 4) + 0.0) AS cos, rn FROM (" +
        "SELECT a.doc_id a_id, b.doc_id b_id, " +
        "(" + (0 until D).map(j => s"a.e$j*b.e$j").mkString(" + ") + ") / (a.nrm * b.nrm) cos, " +
        "row_number() OVER (PARTITION BY a.doc_id ORDER BY " +
        "(" + (0 until D).map(j => s"a.e$j*b.e$j").mkString(" + ") + ") / (a.nrm * b.nrm) DESC, " +
        "b.doc_id) rn FROM e a JOIN e b ON a.doc_id <> b.doc_id) " +
        "WHERE rn <= 3 ORDER BY a_id, rn"),
  )
}
