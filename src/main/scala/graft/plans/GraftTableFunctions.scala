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
  *    stats: what a point read would plan against, no footer touched;
  *  - `SELECT * FROM graft_changes('<target>', since [, upTo])` — the
  *    row-level change feed in (since, upTo] (`readChanges`), the
  *    incremental-view consumer's SQL entry point. Rows tagged
  *    `_change_type` / `_commit_version`; a commit written without its
  *    CDC sidecar throws at resolution (pre-images unrecoverable).
  *
  * All are SIDE-EFFECT-FREE reads (history/files are KB-scale metadata;
  * changes touches only changed files + sidecars) — maintenance actions
  * (vacuum/optimize/compact/restore) deliberately stay statements: a
  * table function materializes at analysis time, where a side effect
  * would fire on EXPLAIN.
  *
  * Targets: a filesystem path (contains '/') or a catalog-qualified name
  * (`graft.ns.t`). Each builder is constructed with the session that
  * REGISTERS it (`sessionOf`), so in a multi-session JVM a statement
  * parsed in session A resolves through A's catalog manager even while
  * another session is "active" — the extension-injection path, which has
  * no session at construction time, falls back to `SparkSession.active`. */
object GraftTableFunctions {

  type Tvf = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v, _) if v != null => v.toString.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }

  private[graft] def rootOf(target: String,
      session: SparkSession = SparkSession.active): String =
    if (target.contains('/')) target
    else {
      val parts = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseMultipartIdentifier(target)
      require(parts.length >= 2, s"qualify the table: catalog.ns.name ($target)")
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

  /** Resolve a catalog-qualified name to the directory it WOULD occupy —
    * for statements that create a table there (CLONE). A path target
    * passes through; the name must resolve through a graft catalog but
    * the table must NOT exist yet. */
  private[plans] def rootOfNew(target: String,
      session: SparkSession = SparkSession.active): String =
    if (target.contains('/')) target
    else {
      val parts = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseMultipartIdentifier(target)
      require(parts.length >= 2, s"qualify the table: catalog.ns.name ($target)")
      session.sessionState.catalogManager.catalog(parts.head) match {
        case c: GraftCatalog =>
          c.dirOfName(parts.tail.init.toArray, parts.last)
        case other => throw new IllegalArgumentException(
          s"${parts.head} is not a graft catalog: $other")
      }
    }

  private def analyzed(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  def historyFn(sessionOf: () => SparkSession): Tvf = (
    FunctionIdentifier("graft_history"),
    new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_history"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_history(target)")
      val session = sessionOf()
      val t = TxnTable.at(session,
        rootOf(stringArg(args.head, "target"), session))
      analyzed(t.history())
    })

  def filesFn(sessionOf: () => SparkSession): Tvf = (
    FunctionIdentifier("graft_files"),
    new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_files"),
    (args: Seq[Expression]) => {
      require(args.nonEmpty && args.length <= 2,
        "graft_files(target [, version])")
      val session = sessionOf()
      val t = TxnTable.at(session,
        rootOf(stringArg(args.head, "target"), session))
      val version = args.drop(1).headOption
        .map(longArg(_, "version")).getOrElse(-1L)
      analyzed(t.filesDF(version))
    })

  def changesFn(sessionOf: () => SparkSession): Tvf = (
    FunctionIdentifier("graft_changes"),
    new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_changes"),
    (args: Seq[Expression]) => {
      require(args.length == 2 || args.length == 3,
        "graft_changes(target, since [, upTo])")
      val session = sessionOf()
      val t = TxnTable.at(session,
        rootOf(stringArg(args.head, "target"), session))
      val since = longArg(args(1), "since")
      val upTo = args.drop(2).headOption
        .map(longArg(_, "upTo")).getOrElse(-1L)
      analyzed(t.readChanges(since, upTo))
    })

  /** All three TVFs for a given session capture — `GraftSql.session`
    * registers these on each derived session it builds. */
  def all(sessionOf: () => SparkSession): Seq[Tvf] =
    Seq(historyFn(sessionOf), filesFn(sessionOf), changesFn(sessionOf))

  // extension-injection forms (no session at construction time): the
  // standard DSv2-plugin fallback to the active session
  val history: Tvf = historyFn(() => SparkSession.active)
  val files: Tvf = filesFn(() => SparkSession.active)
  val changes: Tvf = changesFn(() => SparkSession.active)
}
