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

    "i_embed_infer_sim" -> ((s, d) =>
      // end to end: infer embeddings, then EXACT cosine top-3 neighbors
      // over the inferred vectors (bounded calibration subset; zero
      // vectors have no direction and are excluded in BOTH engines)
      // bucket is unused on the exact path — pin nBits to skip the
      // corpus-count job (Catalyst prunes the bucket column anyway)
      pairTopk(inferVecs(s, d, maxId = 120, nBits = MinAnnBits), byBucket = false)
        .orderBy("a_id", "rn")),

    "i_embed_infer_ann" -> ((s, d) => {
      // the SCALE path for the same question: nBits random-hyperplane
      // sign-LSH buckets over the inferred vectors, candidates only
      // within a bucket — an equi-join on the bucket id, never all-pairs.
      // Runs on the full corpus precisely because it doesn't need the
      // bound. The bit count is the corpus-size knob and tracks the
      // corpus automatically (`annBitsFor(count)`; BENCH_NOTES §13
      // measures both sides of that rule) — `graft.ann.bits` stays as
      // the manual override for experiments.
      val bits = s.conf.getOption("graft.ann.bits")
        .map(_.toInt).getOrElse(-1)
      pairTopk(inferVecs(s, d, maxId = -1, nBits = bits), byBucket = true)
        .orderBy("a_id", "rn")
    }),

    "i_embed_infer_ann_recall" -> ((s, d) => {
      // the bridge that prices the approximation: recall@3 of the
      // bucketed path vs the exact path on the shared subset — the
      // number a pipeline checks before trusting the bucket join on its
      // corpus (family pattern of i_ann_recall/i_lsh_recall)
      val e = inferVecs(s, d, maxId = 120)
      val exact = pairTopk(e, byBucket = false).select("a_id", "b_id")
      val ann = pairTopk(e, byBucket = true).select("a_id", "b_id")
      val hit = exact.join(ann, Seq("a_id", "b_id"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_exact"), col("n_hit"),
          floor(col("n_hit") / col("n_exact") * 10000 + 0.5).as("recall_bp"))
    }),
  )

  /** Deterministic ±1 hyperplane coefficients (md5-seeded at PLAN time —
    * plain literals in both engines' plans, no runtime hashing). Random
    * hyperplanes decouple the BIT COUNT from the embedding dimension:
    * sign-of-component bucketing caps at D bits, but LSH bucket count
    * must track corpus size (bits ≈ log₂(n / target_bucket_size)) or
    * in-bucket candidate pairs grow quadratically — measured in
    * BENCH_NOTES §13. */
  private def hypCoef(h: Int, j: Int): Int = {
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft:$h:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
    if ((b & 1) == 1) 1 else -1
  }

  /** Bucket-width law, made executable: bits = the corpus-size knob of
    * the sign-LSH family (BENCH_NOTES §13 measured the fixed-bucket
    * failure: in-bucket pairs ∝ n²/buckets, ratio ~16 at 10× data).
    * `annBitsFor` is the smallest b in [Min, Max] with n/2^b below the
    * target occupancy — i.e. 2^bits buckets track the corpus so
    * per-bucket candidates stay ~constant and wall time tracks n.
    * Pure shift-and-compare integers so `annBitsSql` can mirror it as a
    * literal CASE chain in DuckDB with zero float divergence. */
  private[graft] val AnnTargetBucket = 4L
  private[graft] val MinAnnBits = 8
  private[graft] val MaxAnnBits = 20

  private[graft] def annBitsFor(n: Long): Int = {
    var b = MinAnnBits
    while (b < MaxAnnBits && (n >> b) >= AnnTargetBucket) b += 1
    b
  }

  /** Exact SQL mirror of `annBitsFor` over a rowcount expression. */
  private[graft] def annBitsSql(nExpr: String): String =
    "CASE " + (MaxAnnBits to (MinAnnBits + 1) by -1).map { b =>
      s"WHEN ($nExpr) >= ${AnnTargetBucket << (b - 1)} THEN $b"
    }.mkString(" ") + s" ELSE $MinAnnBits END"

  /** Inferred nonzero vectors with per-vector norm and an `nBits`-bit
    * sign-LSH bucket (bit h = hyperplane-h projection positive) — shared
    * by the sim/ANN/recall keys. `nBits <= 0` resolves the width from
    * the corpus rowcount via `annBitsFor` (one cheap count job; at real
    * scale the rowcount comes from table stats / parquet footers, and
    * `graft.ann.bits` remains the manual override). */
  private def inferVecs(s: org.apache.spark.sql.SparkSession, d: String,
      maxId: Int, nBits: Int = -1): DataFrame = {
    graft.functions.VectorExprs.register(s)
    val base =
      if (maxId > 0) Tables.documents(s, d).filter(col("doc_id") < maxId)
      else Tables.documents(s, d)
    val bits = if (nBits > 0) nBits else annBitsFor(base.count())
    val bucket = (0 until bits).map { h =>
      val proj = (0 until D).map(j => col(s"e$j") * lit(hypCoef(h, j))).reduce(_ + _)
      when(proj > 0, lit(1 << h)).otherwise(lit(0))
    }.reduce(_ + _)
    inferRelational(base).filter(col("norm_bp") > 0)
      .withColumn("bucket", bucket)
      .select(col("doc_id"), col("bucket"),
        array((0 until D).map(j => col(s"e$j").cast("double")): _*).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  /** Cosine top-3 per vector via the bounded `graft_topk` aggregate —
    * all-pairs when `byBucket` is false (bounded calibration), an
    * equi-join on the sign-LSH bucket when true (the scale shape). */
  private def pairTopk(e: DataFrame, byBucket: Boolean): DataFrame = {
    val a = e.select(col("doc_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"), col("bucket").as("ba"))
    val b = e.select(col("doc_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"), col("bucket").as("bb"))
    val joined =
      if (byBucket) a.join(b, col("ba") === col("bb") && col("a_id") =!= col("b_id"))
      else a.join(b, col("a_id") =!= col("b_id"))
    joined
      .withColumn("cos", expr("graft_dot(va, vb)") / (col("na") * col("nb")))
      .groupBy("a_id")
      .agg(expr("graft_topk(cos, b_id, 3, false)").as("top"))
      .select(col("a_id"), explode(col("top")).as("t"))
      .select(col("a_id"), col("t.id").as("b_id"),
        r4(col("t.score")).as("cos"), col("t.rn").as("rn"))
  }

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

  /** Nonzero vectors + norm + sign-LSH bucket (mirror of `inferVecs`;
    * the same plan-time `hypCoef` literals feed both engines, and the
    * bit width is `annBitsFor` over the SAME source rowcount — the `nb`
    * scalar CTE is the SQL twin of the Scala shift-loop, so both engines
    * derive identical widths with no float in sight). */
  private def eCte(src: String): String =
    s"nb AS (SELECT ${annBitsSql(s"SELECT count(*) FROM $src AS c")} AS bits), " +
      "e AS (SELECT doc_id, " +
      (0 until D).map(j => s"CAST(e$j AS DOUBLE) e$j").mkString(", ") +
      s", sqrt(CAST($n2 AS DOUBLE)) nrm, " +
      (0 until MaxAnnBits).map { h =>
        val proj = (0 until D).map(j => s"(${hypCoef(h, j)})*e$j").mkString(" + ")
        s"(CASE WHEN $h < nb.bits AND ($proj) > 0 THEN ${1 << h} ELSE 0 END)"
      }.mkString(" + ") +
      s" AS bucket FROM emb, nb WHERE $n2 > 0)"

  private val dotAB = (0 until D).map(j => s"a.e$j*b.e$j").mkString(" + ")

  /** Pair join + per-a_id cosine ranking (mirror of `pairTopk`). */
  private def pairsSql(cond: String): String =
    "SELECT a.doc_id a_id, b.doc_id b_id, " +
      s"($dotAB) / (a.nrm * b.nrm) cos, " +
      "row_number() OVER (PARTITION BY a.doc_id ORDER BY " +
      s"($dotAB) / (a.nrm * b.nrm) DESC, b.doc_id) rn " +
      s"FROM e a JOIN e b ON $cond"

  private val docsUnder120 = "(SELECT * FROM documents WHERE doc_id < 120)"

  val oracle: ListMap[String, String] = ListMap(
    "i_embed_infer" -> s"WITH ${embSql("documents")} $inferSelect",
    // the batch seam must produce the SAME rows — one oracle, two paths
    "i_embed_infer_batch" -> s"WITH ${embSql("documents")} $inferSelect",
    "i_embed_infer_sim" ->
      (s"WITH ${embSql(docsUnder120)}, ${eCte(docsUnder120)} " +
        "SELECT a_id, b_id, (round(cos, 4) + 0.0) AS cos, rn FROM (" +
        pairsSql("a.doc_id <> b.doc_id") + ") " +
        "WHERE rn <= 3 ORDER BY a_id, rn"),
    "i_embed_infer_ann" ->
      (s"WITH ${embSql("documents")}, ${eCte("documents")} " +
        "SELECT a_id, b_id, (round(cos, 4) + 0.0) AS cos, rn FROM (" +
        pairsSql("a.bucket = b.bucket AND a.doc_id <> b.doc_id") + ") " +
        "WHERE rn <= 3 ORDER BY a_id, rn"),
    "i_embed_infer_ann_recall" ->
      (s"WITH ${embSql(docsUnder120)}, ${eCte(docsUnder120)}, " +
        "exact AS (SELECT a_id, b_id FROM (" +
        pairsSql("a.doc_id <> b.doc_id") + ") WHERE rn <= 3), " +
        "ann AS (SELECT a_id, b_id FROM (" +
        pairsSql("a.bucket = b.bucket AND a.doc_id <> b.doc_id") +
        ") WHERE rn <= 3), " +
        "ex AS (SELECT count(*) c FROM exact), " +
        "h AS (SELECT count(*) c FROM exact JOIN ann USING (a_id, b_id)) " +
        "SELECT CAST(ex.c AS BIGINT) AS n_exact, CAST(h.c AS BIGINT) AS n_hit, " +
        "CAST(floor(h.c / ex.c * 10000 + 0.5) AS BIGINT) AS recall_bp " +
        "FROM ex, h"),
  )
}
