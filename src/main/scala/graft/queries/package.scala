package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** The driver contract's query shape: (session, sf-dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Scratch dir for sink/source round-trip queries (a_sink_*, a_scan_csv…).
    * Under java.io.tmpdir so Verify/Bench/tests never touch the repo or the
    * read-only testdata. */
  def scratch(sub: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_scratch/$sub"

  /** Lineage cut honoring the `graft.checkpoint.dir` conf — reliable
    * checkpoint() when set, localCheckpoint() otherwise (algo.Lineage). */
  implicit class LineageOps(private val df: DataFrame) {
    def cutLineage(): DataFrame = graft.algo.Lineage.cut(df)
  }
}
