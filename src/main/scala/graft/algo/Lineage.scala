package graft.algo

import org.apache.spark.sql.DataFrame

/** Shared lineage cut for iterative/multi-consumer plans.
  *
  * Every iterative key (connected components, pagerank, k-means, BPE) must
  * truncate lineage each round or the plan grows without bound. Two modes,
  * selected by ONE runtime conf so a cluster deployment flips a setting
  * rather than editing call sites:
  *
  *  - `graft.checkpoint.dir` unset (default): `localCheckpoint()` — fast,
  *    blocks live on executors. Fine on local mode and ephemeral jobs, NOT
  *    fault-tolerant: an executor loss destroys the truncated lineage and
  *    fails the job.
  *  - `graft.checkpoint.dir=<path>`: reliable `checkpoint()` into that
  *    directory (HDFS/object store on a real cluster) — a lost executor
  *    recomputes from storage. The mode a 100 TB run must use.
  *
  * Both modes materialize eagerly, so counts taken over the cut output scan
  * the round's result instead of replaying the round. Results are mode-
  * independent (CheckpointModeSpec proves hash-identical outputs).
  */
object Lineage {
  /** Runtime conf naming the reliable checkpoint directory; empty/unset
    * selects localCheckpoint. */
  val ConfKey = "graft.checkpoint.dir"

  // the dir THIS helper last configured: sc.getCheckpointDir returns the
  // resolved path + UUID subdir, so a substring test against it would keep
  // a stale dir whenever the old path merely contains the new one (e.g.
  // "/data/ckpt-old" vs "/data/ckpt"); tracking our own last-set value is
  // exact
  @volatile private var activeDir: Option[String] = None

  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) => cutTo(df, dir)
      case None      => df.localCheckpoint()
    }

  /** Reliable checkpoint into `dir` (the explicit-dir form shared with
    * ConnectedComponents' checkpointDir parameter). */
  def cutTo(df: DataFrame, dir: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    // activeDir is JVM-global but the checkpoint dir is per-SparkContext:
    // a stopped-and-recreated context starts with no dir even when
    // activeDir still matches, so the context's own state must be
    // consulted too or df.checkpoint() throws on the fresh context
    if (!activeDir.contains(dir) || sc.getCheckpointDir.isEmpty) synchronized {
      if (!activeDir.contains(dir) || sc.getCheckpointDir.isEmpty) {
        sc.setCheckpointDir(dir)
        activeDir = Some(dir)
      }
    }
    df.checkpoint()
  }
}
