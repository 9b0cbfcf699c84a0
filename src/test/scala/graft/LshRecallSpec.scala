package graft

import org.apache.spark.sql.functions._

/** Round-4 recall gates for the multi-band MinHash LSH (VERDICT r3 #1/#6):
  * the 4-band × 2-row banding must propose ≥95% of the true near-dup pairs
  * (exact token-set Jaccard ≥ 0.8) as candidates — measured on the natural
  * corpus at two tiers AND on planted near-duplicates.
  */
class LshRecallSpec extends SparkTestBase {

  private def jaccardTruth(corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val sets = corpus.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("w"))
    sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(size(array_intersect(col("a.w"), col("b.w"))).cast("double") /
        size(array_union(col("a.w"), col("b.w"))) >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("multi-band candidates recall >= 0.95 of exact-Jaccard(0.8) pairs, natural corpus") {
    // theoretical candidate probability at J = 0.8 is 1-(1-J^2)^4 ~ 0.983;
    // the old single-band-of-4 scheme sat at ~J^4 ~ 0.41 (the r3 gap)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val truth = jaccardTruth(docs)
    assert(truth.nonEmpty, "fixture corpus must contain near-dup pairs")
    val cand = graft.queries.ILlmOps.lshCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(cand.contains).toDouble / truth.size
    assert(recall >= 0.95, s"candidate recall $recall over ${truth.size} true pairs")
  }

  test("planted near-duplicates are recovered by the bucketed path") {
    // plant perturbed copies (truncate to the first 70 tokens) of every doc;
    // the bucket join must recover >= 95% of the planted pairs whose exact
    // Jaccard clears the 0.8 threshold — this turns the 'bucketing works on
    // corpora with real duplicate structure' claim into a measurement
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val planted = docs.select((col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 70)).as("text"))
    val corpus = docs.union(planted)
    val truth = jaccardTruth(corpus)
    val plantedTrue = truth.filter { case (a, b) => b == a + 100000L }
    assert(plantedTrue.nonEmpty, "planted copies must clear the 0.8 Jaccard bar")
    val cand = graft.queries.ILlmOps.lshCandidates(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedRecall = plantedTrue.count(cand.contains).toDouble / plantedTrue.size
    assert(plantedRecall >= 0.95,
      s"planted recall $plantedRecall over ${plantedTrue.size} planted pairs")
    val overallRecall = truth.count(cand.contains).toDouble / truth.size
    assert(overallRecall >= 0.95, s"overall recall $overallRecall")
  }

  test("planted embedding near-dups land in the same sign-LSH bucket") {
    // i_embed_neardup documents that bucketing can't reach this corpus's
    // low-similarity pairs (cos 0.35-0.60); the bucketed path is for REAL
    // near-dups (cos >= 0.9). Plant them: a deterministic small rotation
    // v' = 0.98*v + 0.02*roll(v, 1) keeps cos(v, v') ~ 0.98+, and the
    // 8-dim sign-LSH bucket must put >= 80% of planted pairs in one
    // bucket (per-dim sign-flip probability ~ (2/pi)*atan(0.02/0.98)).
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pert = e.select((col("vec_id") + 100000L).as("vec_id"),
      expr("transform(v, (x, i) -> 0.98 * x + " +
        "0.02 * element_at(v, ((CAST(i AS INT) + 1) % size(v)) + 1))").as("v"))
    val corpus = e.union(pert)
    graft.functions.VectorExprs.register(spark)
    // sanity: the planted copies really are near-duplicates by cosine
    val cos = e.join(pert.select((col("vec_id") - 100000L).as("vec_id"),
        col("v").as("vp")), "vec_id")
      .select(expr("graft_dot(v, vp)") /
        (sqrt(expr("graft_dot(v, v)")) * sqrt(expr("graft_dot(vp, vp)"))))
      .collect().map(_.getDouble(0))
    assert(cos.forall(_ >= 0.9), s"planted cos floor ${cos.min}")
    // same bucket expression as i_ann_lsh
    val bucketed = corpus.withColumn("bucket",
      (1 to 8).map(i => when(element_at(col("v"), i) > 0, lit(1 << (i - 1)))
        .otherwise(lit(0))).reduce(_ + _))
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n = bucketed.count { case (id, _) => id < 100000L }
    val hits = bucketed.count { case (id, b) =>
      id < 100000L && bucketed(id + 100000L) == b
    }
    assert(n > 0 && hits.toDouble / n >= 0.8,
      s"only $hits/$n planted pairs share a bucket")
  }

  test("i_lsh_recall key reports recall_bp >= 9500 at the verification tier") {
    // same gate the driver's oracle checks, at sf0.01 when present
    val root = new java.io.File(sfDir).getParentFile
    val tier = new java.io.File(root, "sf0.01")
    val dir = if (tier.isDirectory) tier.getPath else sfDir
    val r = SparkEntry.queries("i_lsh_recall")(spark, dir).collect().head
    val nTrue = r.getLong(0)
    assert(nTrue > 0, "verification tier must contain true near-dup pairs")
    assert(!r.isNullAt(3) && r.getLong(3) >= 9500L,
      s"recall_bp ${r.get(3)} over $nTrue true pairs")
  }

  test("the bucket cap bounds a planted template cluster but keeps normal pairs") {
    import spark.implicits._
    // 200 identical template docs (one degenerate bucket per band) plus one
    // ordinary near-dup pair that must NOT be affected by the cap
    val template = (1 to 60).map(i => s"tpl$i").mkString(" ")
    val base = (1 to 50).map(i => s"tok${i * 7}").mkString(" ")
    val near = (1 to 48).map(i => s"tok${i * 7}").mkString(" ")
    val docs = ((0 until 200).map(i => (i.toLong, template)) ++
      Seq((1000L, base), (1001L, near))).toDF("doc_id", "text")
    val capped = graft.queries.ILlmOps.cappedCandidates(docs, cap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1000L, 1001L)), "ordinary near-dup pair must survive")
    // every template pair collides ONLY in hot (size-200) buckets → dropped;
    // without the cap this would be 200*199/2 = 19900 quadratic pairs
    assert(!capped.exists { case (a, b) => a < 200 && b < 200 },
      "template-cluster pairs must be suppressed by the cap")
    val plain = graft.queries.ILlmOps.lshCandidates(docs)
      .filter(col("a_id") < 200 && col("b_id") < 200).count()
    assert(plain == 19900L, "uncapped join does quadratic work on the hot bucket")
  }

  test("IVF recall@3 is monotone in nprobe and strictly gains by nprobe=3") {
    // the multi-probe tuning law: each probe set CONTAINS the previous
    // one, so measured recall must be non-decreasing in nprobe — and on
    // this corpus (random unit vectors, neighbors straddling cell
    // boundaries constantly) extra probes must actually recover some of
    // the single-probe miss class, not just tie it
    val rows = SparkEntry.queries("i_ann_ivf_probe_recall")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    val recalls = rows.map(_._2).toSeq
    assert(recalls.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"recall not monotone in nprobe: $recalls")
    assert(recalls.last > recalls.head,
      s"three probes should beat one on this corpus: $recalls")
  }

  test("IVF+PQ multi-probe: candidate sets nest in nprobe, rows match the dedicated keys") {
    // the containment law that IS guaranteed for the hybrid: probe p's
    // candidate pair set is a subset of probe p+1's (measured RECALL is
    // deliberately not asserted monotone — ADC-quantized ranking lets a
    // newly probed cell's candidate displace a true neighbor, which is
    // why the tuning table exists). The recall table's nprobe=1/2 rows
    // must reproduce the dedicated single-probe and probe keys exactly.
    import graft.queries.OCurate
    val bounded = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 300)
    val ranked = OCurate.kmeansRanked(bounded, 3)
    val data = ranked.filter(col("arank") === 1)
      .select(col("vec_id").as("b_id"), col("cell"))
    def candidates(p: Int): Set[(Long, Long)] = ranked
      .filter(col("arank") <= p && col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("cell"))
      .join(data, "cell")
      .filter(col("q_id") =!= col("b_id"))
      .select("q_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (c1, c2, c3) = (candidates(1), candidates(2), candidates(3))
    assert(c1.subsetOf(c2) && c2.subsetOf(c3),
      s"candidate sets must nest: ${c1.size}/${c2.size}/${c3.size}")
    assert(c1.size < c2.size && c2.size < c3.size,
      "extra probes must actually widen the candidate pool on this corpus")
    val rows = SparkEntry.queries("i_ann_ivfpq_probe_recall")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    // nprobe=1 row reproduces the single-probe hybrid key's numbers
    val one = graft.queries.OCurate.annIvfPqRecall(
      graft.Tables.embeddings(spark, sfDir)).head()
    assert(rows.head._2 == ((one.getLong(1), one.getLong(2))),
      "probe-recall nprobe=1 row must reproduce the single-probe key")
    val probeN = SparkEntry.queries("i_ann_ivfpq_probe")(spark, sfDir).count()
    assert(rows(1)._2._1 == probeN,
      "probe-recall nprobe=2 row must describe the dedicated probe key's set")
  }

  test("shared full-corpus PQ build reproduces the standalone PQ keys bit-identically") {
    // r20: i_ann_pq / i_ann_pq_recall serve from the per-(session, dir)
    // pqFullShared training build; the standalone forms train their own.
    // Both rank through annPqRank, and all columns are integers, so the
    // rows must match exactly — a drifted shared build breaks this before
    // it can break the oracle.
    val emb = Tables.embeddings(spark, sfDir)
    val pqKey = SparkEntry.queries("i_ann_pq")(spark, sfDir).collect().toSeq
    val pqStandalone = graft.queries.OCurate.annPq(emb).collect().toSeq
    assert(pqKey == pqStandalone, "i_ann_pq shared != standalone")
    val rKey = SparkEntry.queries("i_ann_pq_recall")(spark, sfDir)
      .collect().toSeq
    val rStandalone = graft.queries.OCurate.annPqRecall(emb).collect().toSeq
    assert(rKey == rStandalone, "i_ann_pq_recall shared != standalone")
  }
}
