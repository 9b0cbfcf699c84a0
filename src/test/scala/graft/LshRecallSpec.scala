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
}
