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

  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir appends a UUID subdir, so compare by prefix; the
        // resolved path may also carry a filesystem scheme
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
