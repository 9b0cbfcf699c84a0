package graft

/** The iterative keys cut lineage via algo.Lineage, whose mode is selected
  * by the `graft.checkpoint.dir` conf. A cluster run flips that one setting
  * to get fault-tolerant reliable checkpoints — so reliable mode must be
  * result-identical to the default localCheckpoint mode, and must actually
  * write checkpoint data to the configured directory.
  */
class CheckpointModeSpec extends SparkTestBase {

  test("reliable-checkpoint mode is result-identical to localCheckpoint mode") {
    val iterative =
      Seq("i_dup_clusters", "i_pagerank", "i_kmeans", "i_bpe_merges",
        "p_dense_ids") // round 8: the partition-pinning cut, not iteration
    val dir = java.nio.file.Files
      .createTempDirectory("graft_reliable_ckpt").toFile
    for (key <- iterative) {
      val fn = SparkEntry.queries(key)
      assert(spark.conf.getOption(graft.algo.Lineage.ConfKey).isEmpty)
      val local = fn(spark, sfDir).collect().map(_.toString).toSeq
      spark.conf.set(graft.algo.Lineage.ConfKey, dir.toString)
      val reliable =
        try fn(spark, sfDir).collect().map(_.toString).toSeq
        finally spark.conf.unset(graft.algo.Lineage.ConfKey)
      assert(local == reliable,
        s"$key output differs between checkpoint modes")
      assert(local.nonEmpty, s"$key produced no rows")
    }
    // reliable mode really engaged: RDD checkpoint files landed in the dir
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
    assert(anyFile(dir), s"no checkpoint data written under $dir")
  }

  test("switching graft.checkpoint.dir redirects checkpoints to the new dir") {
    // regression: the old substring check against sc.getCheckpointDir kept
    // a stale dir whenever its resolved path contained the new dir as a
    // prefix (e.g. ".../ckpt-old" vs ".../ckpt")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_sw")
    val oldDir = new java.io.File(base.toFile, "ckpt-old")
    val newDir = new java.io.File(base.toFile, "ckpt")
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
    graft.algo.Lineage.cutTo(Seq(1, 2, 3).toDF("x"), oldDir.toString).count()
    assert(anyFile(oldDir), "first cut must land in the first dir")
    graft.algo.Lineage.cutTo(Seq(4, 5, 6).toDF("x"), newDir.toString).count()
    assert(anyFile(newDir),
      "after the dir changes, checkpoints must land in the NEW dir " +
        "(old resolved path contains the new dir as a prefix)")
  }
}
