package graft

import org.apache.spark.sql.functions._

/** The model-inference seam (queries/VInfer.scala): the batched
  * mapPartitions path must be row-identical to the relational path — that
  * equivalence IS the seam's contract (a real model swaps in behind the
  * same plumbing) — and the inferred vectors must behave like embeddings
  * (token-order invariance, near-dups rank closest).
  */
class InferSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("batch inference seam is row-identical to the relational path") {
    // real corpus, and across a partitioning change: per-partition model
    // init must not leak state between partitions or depend on their count
    for (parts <- Seq(1, 7)) {
      val base = Tables.documents(spark, sfDir).repartition(parts)
      val rel = graft.queries.VInfer.inferRelational(base)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val batch = SparkEntry.queries("i_embed_infer_batch")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(rel == batch && rel.nonEmpty, s"paths diverge at $parts partitions")
    }
  }

  test("the decode seam holds a REAL stateful codec: init once per partition, rows independent") {
    // java.util.zip's Deflater/CRC32 stand in for a production codec:
    // natively backed, stateful, NOT serializable. The seam only works if
    // the codec is constructed inside mapPartitions (closure capture
    // would fail to serialize) and only yields stable numbers if per-row
    // reset discipline holds — so partition-count invariance here tests
    // the real obligations a model/codec runtime imposes, which the
    // arithmetic StubDecoder cannot.
    val rows = (1L to 40L)
      .map(i => (i, Array.tabulate((i % 7 + 3).toInt)(j => (i * 31 + j * 7).toByte)))
      .toDF("doc_id", "media")
    def run(parts: Int): Seq[(Long, Seq[Float])] =
      rows.repartition(parts).as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val dec = graft.queries.ZlibDecoder.init()
          it.map { case (id, b) => (id, dec.decodeBatch(b).toSeq) }
        }.collect().sortBy(_._1).toSeq
    graft.queries.ZlibDecoder.inits.set(0)
    val a = run(2)
    assert(graft.queries.ZlibDecoder.inits.get() == 2,
      "codec must initialize exactly once per partition")
    val b = run(8)
    assert(graft.queries.ZlibDecoder.inits.get() == 10,
      "8-partition run must add exactly 8 inits (one per partition, never per row)")
    assert(a == b && a.size == 40,
      "codec output must be invariant to partitioning (no leaked native state)")
    // and the same bytes decode to the same features twice (reset works)
    assert(run(2) == a)
  }

  test("a REAL image codec (javax.imageio PNG) holds the decode seam end to end") {
    // the m_decode_png path in miniature: genuine PNG encode + decode per
    // row through the once-per-partition seam, decoded pixels equal to
    // the generator closed-form (PNG is lossless), output invariant to
    // partitioning, init exactly once per partition
    def run(parts: Int): Seq[(Long, Int, Int, Long)] =
      spark.range(1, 41).select(col("id")).repartition(parts).as[Long]
        .mapPartitions { it =>
          val codec = graft.queries.PngCodec.init()
          it.map { id =>
            val w = (4 + id % 3).toInt; val h = (3 + id % 2).toInt
            val png = codec.encodeGray(w, h, i => ((id * 13 + i) % 256).toInt)
            val (dw, dh, sum) = codec.decodeSum(png)
            (id, dw, dh, sum)
          }
        }.collect().sortBy(_._1).toSeq
    graft.queries.PngCodec.inits.set(0)
    val a = run(2)
    assert(graft.queries.PngCodec.inits.get() == 2,
      "codec must initialize exactly once per partition")
    val b = run(8)
    assert(graft.queries.PngCodec.inits.get() == 10,
      "8-partition run must add exactly 8 inits")
    assert(a == b && a.size == 40, "decode must be partition-invariant")
    // pixel truth: lossless round trip reproduces the generator exactly
    a.foreach { case (id, w, h, sum) =>
      assert(w == (4 + id % 3).toInt && h == (3 + id % 2).toInt)
      val expect = (0 until w * h).map(i => (id * 13 + i) % 256).sum
      assert(sum == expect, s"doc $id: decoded sum $sum != generated $expect")
    }
  }

  test("the inference seam is model-agnostic: a zlib-CRC 'model' swaps in, plumbing unchanged") {
    // same mapPartitions shape as i_embed_infer_batch with a DIFFERENT
    // model behind it: numbers change, plumbing doesn't — the exact swap
    // the seam exists for, exercised with a second real library
    val d = docs(1L -> "alpha beta", 2L -> "gamma delta epsilon",
      3L -> "zeta", 4L -> "eta theta iota kappa")
    def embed(parts: Int): Seq[(Long, Long)] =
      d.select(col("doc_id"), col("text")).repartition(parts)
        .as[(Long, String)]
        .mapPartitions { it =>
          val crc = new java.util.zip.CRC32() // per-partition "weights"
          it.map { case (id, text) =>
            crc.reset()
            crc.update(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            (id, crc.getValue)
          }
        }.collect().sortBy(_._1).toSeq
    assert(embed(1) == embed(3), "second model must be partition-invariant too")
  }

  test("embedding is a function of the token multiset, not token order") {
    val e = graft.queries.VInfer.inferRelational(
      docs(1L -> "alpha beta gamma beta", 2L -> "beta gamma beta alpha"))
      .orderBy("doc_id").drop("doc_id").collect().map(_.toString)
    assert(e(0) == e(1), "reordering tokens changed the embedding")
  }

  test("a planted near-duplicate is its source's top cosine neighbor") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy cat again and again",
      3L -> "entirely unrelated legal boilerplate concerning maritime salvage law")
    graft.functions.VectorExprs.register(spark)
    val e = graft.queries.VInfer.inferRelational(d)
      .select(col("doc_id"),
        array((0 until 8).map(j => col(s"e$j").cast("double")): _*).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val a = e.select(col("doc_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("doc_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
    val top1 = a.join(b, col("a_id") =!= col("b_id"))
      .withColumn("cos", expr("graft_dot(va, vb)") / (col("na") * col("nb")))
      .groupBy("a_id").agg(expr("graft_topk(cos, b_id, 1, false)").as("t"))
      .select(col("a_id"), col("t")(0)("id").as("b_id"))
      .as[(Long, Long)].collect().toMap
    assert(top1(1L) == 2L && top1(2L) == 1L,
      s"near-dup pair not mutually closest: $top1")
  }

  test("annBitsFor tracks corpus size and its SQL mirror agrees exactly") {
    import graft.queries.VInfer.{annBitsFor, annBitsSql, MinAnnBits, MaxAnnBits}
    // the law: per-bucket occupancy n/2^bits stays under the target once
    // past the floor, so 10× data gets +3–4 bits automatically
    assert(annBitsFor(0) == MinAnnBits && annBitsFor(500) == MinAnnBits)
    assert(annBitsFor(5000) == 11 && annBitsFor(50000) == 14)
    assert(annBitsFor(Long.MaxValue) == MaxAnnBits)
    // SQL mirror must be value-identical — including at every threshold
    // boundary, where a float log2 formulation would diverge
    val probes = Seq(0L, 1L, 499L, 500L, 1023L, 1024L, 1025L, 5000L,
      50000L, 1L << 22, (1L << 22) - 1, Long.MaxValue) ++
      (MinAnnBits to MaxAnnBits).flatMap { b =>
        val t = 4L << (b - 1); Seq(t - 1, t, t + 1) }
    val got = spark.sql(
      probes.map(n => s"SELECT ${annBitsSql(n.toString)} AS b").mkString(" UNION ALL "))
      .collect().map(_.getInt(0)).toSeq
    assert(got == probes.map(n => annBitsFor(n)),
      s"SQL mirror diverges: ${probes.zip(got)}")
  }
}
