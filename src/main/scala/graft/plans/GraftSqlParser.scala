package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import graft.sources.TxnTable

/** Parser extension for the MAINTENANCE statements a lakehouse operator
  * types — the pieces plain Spark SQL has no grammar for (the same seam
  * Delta uses for its VACUUM/OPTIMIZE/DESCRIBE HISTORY):
  *
  *  - `DESCRIBE HISTORY <target>` — the commit log;
  *  - `VACUUM <target> [RETAIN <h> HOURS] [KEEP <n> VERSIONS]` —
  *    age + version-floor retention (union of keep-sets), returns the
  *    reclaimed-file count;
  *  - `OPTIMIZE <target> TARGET <n> ROWS [CLUSTER BY (c1, c2, ...)]` —
  *    the incremental small-file bin-pack, optionally range-clustered,
  *    returns the committed version (or the unchanged tip on no-op).
  *
  * `<target>` is a quoted filesystem path (`'/path/to/table'`) or a
  * catalog-qualified name (`graft.ns.t`). Anything the three patterns do
  * not match delegates verbatim to Spark's parser, so the extension can
  * never change the meaning of standard SQL. Unlike the read-only table
  * functions, these ARE side-effecting — which is exactly why they are
  * commands (executed when the statement runs, inert under EXPLAIN). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Describe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+('[^']+'|[\w.`]+)\s*;?\s*""".r
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+('[^']+'|[\w.`]+)""" +
      """(?:\s+RETAIN\s+([0-9.]+)\s+HOURS)?""" +
      """(?:\s+KEEP\s+(\d+)\s+VERSIONS)?\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+('[^']+'|[\w.`]+)\s+TARGET\s+(\d+)\s+ROWS""" +
      """(?:\s+(CLUSTER|ZORDER)\s+BY\s+\(([^)]*)\))?\s*;?\s*""").r
  private val Zorder =
    ("""(?is)\s*OPTIMIZE\s+('[^']+'|[\w.`]+)\s+ZORDER\s+BY\s+\(([^)]*)\)""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?\s*;?\s*""").r

  private def target(raw: String): String = {
    val t = raw.trim
    if (t.startsWith("'")) t.substring(1, t.length - 1)
    else t.replace("`", "")
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Describe(t) => GraftHistorySqlCommand(target(t))
    case Vacuum(t, hours, keep) =>
      GraftVacuumCommand(target(t),
        Option(keep).map(_.toInt).getOrElse(1),
        Option(hours).map(_.toDouble).getOrElse(-1.0))
    case Optimize(t, rows, kind, cols) =>
      val cs = Option(cols).toSeq.flatMap(_.split(',')).map(_.trim)
        .filter(_.nonEmpty).map(_.replace("`", ""))
      val zorder = Option(kind).exists(_.equalsIgnoreCase("ZORDER"))
      GraftOptimizeCommand(target(t), rows.toLong,
        if (zorder) Nil else cs, if (zorder) cs else Nil)
    case Zorder(t, cols, files) =>
      GraftZorderCommand(target(t),
        cols.split(',').map(_.trim).filter(_.nonEmpty)
          .map(_.replace("`", "")).toSeq,
        Option(files).map(_.toInt).getOrElse(4))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** DESCRIBE HISTORY as a command (rows come from KB-scale log metadata). */
case class GraftHistorySqlCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("action", org.apache.spark.sql.types.StringType)(),
    AttributeReference("rows", LongType)(),
    AttributeReference("n_added_files", LongType)(),
    AttributeReference("n_removed_files", LongType)(),
    AttributeReference("ts_millis", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    TxnTable.at(session, GraftTableFunctions.rootOf(target))
      .history().collect().toSeq
}

/** VACUUM with the union retention (age window + version floor). */
case class GraftVacuumCommand(target: String, retainVersions: Int,
    retainHours: Double) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_deleted", IntegerType)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxnTable.at(session, GraftTableFunctions.rootOf(target))
      .vacuum(retainVersions, retainHours)))
}

/** OPTIMIZE: incremental bin-pack of sub-target files. */
case class GraftOptimizeCommand(target: String, targetRows: Long,
    clusterBy: Seq[String], zorderBy: Seq[String] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxnTable.at(session, GraftTableFunctions.rootOf(target))
      .optimize(targetRows, clusterBy, zorderBy)))
}

/** OPTIMIZE ... ZORDER BY: full Z-order relayout (a clustered compact). */
case class GraftZorderCommand(target: String, zorderBy: Seq[String],
    files: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxnTable.at(session, GraftTableFunctions.rootOf(target))
      .compact(target = files, zorderBy = zorderBy)))
}
