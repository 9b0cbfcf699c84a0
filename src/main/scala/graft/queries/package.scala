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
}
