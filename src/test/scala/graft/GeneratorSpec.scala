package graft

import org.apache.spark.sql.functions._
import graft.functions.NGramGen

/** Native Catalyst Generator (graft_ngrams): semantics on planted input,
  * agreement with the declarative lead()-window formulation on the real
  * fixture, and the plan-shape claim that motivates it — GenerateExec
  * directly over the scan, no Window, no Exchange.
  */
class GeneratorSpec extends SparkTestBase {

  private def planted(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("graft_ngrams emits every n-gram with its position, in order") {
    NGramGen.register(spark)
    val out = planted(Seq((1L, "a b c d")))
      .select(col("doc_id"), expr("graft_ngrams(text, 2)"))
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq((0, "a b"), (1, "b c"), (2, "c d")))
  }

  test("graft_ngrams edge semantics: null text, short text, n = token count") {
    NGramGen.register(spark)
    val df = planted(Seq((1L, null), (2L, "x y"), (3L, "p q r")))
    assert(df.select(col("doc_id"), expr("graft_ngrams(text, 3)"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((3L, "p q r")), "null and too-short docs emit no rows")
  }

  test("graft_ngrams agrees with the lead()-window trigram formulation") {
    NGramGen.register(spark)
    val docs = Tables.documents(spark, sfDir).limit(100)
    val native = docs.select(col("doc_id"), expr("graft_ngrams(text, 3)"))
      .select("doc_id", "pos", "ngram")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val tok = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val declarative = tok
      .withColumn("ngram", concat_ws(" ", col("w"),
        lead("w", 1).over(win), lead("w", 2).over(win)))
      .withColumn("nx2", lead("w", 2).over(win))
      .filter(col("nx2").isNotNull)
      .select("doc_id", "pos", "ngram")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(native == declarative)
  }

  test("the Generator plan is a pure map stage: Generate over scan, no shuffle") {
    NGramGen.register(spark)
    val plan = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("graft_ngrams(text, 3)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"expected GenerateExec:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"n-gram generation must not shuffle or sort:\n$plan")
  }
}
