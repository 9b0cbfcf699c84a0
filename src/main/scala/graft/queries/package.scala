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

  /** Rowcount of a single parquet file from its FOOTER, read driver-side
    * (KBs of metadata, no Spark job — the TxnTable.stage primitive);
    * falls back to a count() for non-file layouts. Scale parameters that
    * only need a cardinality (geo cell size, recall query-sample stride)
    * should never cost a scan. */
  def footerRowCount(s: SparkSession, path: String,
      fallback: => Long): Long =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), s.sessionState.newHadoopConf())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    } catch { case _: Exception => fallback }

  /** Lineage cut honoring the `graft.checkpoint.dir` conf — reliable
    * checkpoint() when set, localCheckpoint() otherwise (algo.Lineage). */
  implicit class LineageOps(private val df: DataFrame) {
    def cutLineage(): DataFrame = graft.algo.Lineage.cut(df)
  }
}
