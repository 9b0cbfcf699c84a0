package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import graft.sources.{GraftCatalog, GraftTableV2, TxnTable}

/** Operational TABLE FUNCTIONS for the transactional table — the
  * introspection a lakehouse operator types (`DESCRIBE HISTORY`-class
  * surfaces), exposed through the standard `injectTableFunction` seam so
  * they work in any extension-carrying session:
  *
  *  - `SELECT * FROM graft_history('<table root or graft.ns.name>')` —
  *    the commit log (version, action, rows, file counts, commit time);
  *  - `SELECT * FROM graft_files('<target>' [, version])` — the LIVE
  *    file list at a version with per-file row counts from commit-time
  *    stats: what a point read would plan against, no footer touched.
  *
  * Both are METADATA reads (KB-scale log resolution, never a data scan)
  * and side-effect-free — maintenance actions (vacuum/optimize/compact)
  * deliberately stay native API calls: a table function materializes at
  * analysis time, where a side effect would fire on EXPLAIN.
  *
  * Targets: a filesystem path (contains '/') or a catalog-qualified name
  * (`graft.ns.t`), resolved through the session's own catalog manager. */
object GraftTableFunctions {

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private[plans] def rootOf(target: String): String =
    if (target.contains('/')) target
    else {
      val parts = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseMultipartIdentifier(target)
      require(parts.length >= 2, s"qualify the table: catalog.ns.name ($target)")
      val session = SparkSession.active
      session.sessionState.catalogManager.catalog(parts.head) match {
        case c: GraftCatalog =>
          c.loadTable(org.apache.spark.sql.connector.catalog.Identifier
            .of(parts.tail.init.toArray, parts.last)) match {
            case t: GraftTableV2 => t.root
            case other => throw new IllegalArgumentException(
              s"not a graft-txn table: $target ($other)")
          }
        case other => throw new IllegalArgumentException(
          s"${parts.head} is not a graft catalog: $other")
      }
    }

  private def analyzed(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  val history: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_history"),
    new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_history"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_history(target)")
      val t = TxnTable.at(SparkSession.active,
        rootOf(stringArg(args.head, "target")))
      analyzed(t.history())
    })

  val files: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_files"),
    new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_files"),
    (args: Seq[Expression]) => {
      require(args.nonEmpty && args.length <= 2,
        "graft_files(target [, version])")
      val session = SparkSession.active
      val t = TxnTable.at(session, rootOf(stringArg(args.head, "target")))
      val version = args.drop(1).headOption.map {
        case Literal(v, _) => v.toString.toLong
        case other => throw new IllegalArgumentException(
          s"version must be a literal, got $other")
      }.getOrElse(-1L)
      analyzed(t.filesDF(version))
    })
}
