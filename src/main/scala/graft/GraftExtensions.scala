package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, SquaredDiffSum}

/** Standard Spark extension point: install the engine's native functions at
  * session build time via
  * `spark.sql.extensions=graft.GraftExtensions`, or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * This is the idiomatic way to ship custom Catalyst surface with a library
  * — the session owns the registration, not the queries. (The query layer
  * also registers lazily via VectorExprs.register for sessions built without
  * the extension, e.g. the driver-owned Verify/Bench mains.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // user-written HOF vector folds get the fused native loop automatically
    ext.injectOptimizerRule(_ => graft.plans.FuseVectorFold)
    // the native as-of merge operator (AsOfJoinPlan → AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // the native interval-sweep join (IntervalJoinPlan → IntervalJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    // the graft catalog's SQL surface: reads of GraftTableV2 lower onto
    // the native snapshot plan; INSERT/DELETE/UPDATE/MERGE INTO lower
    // onto the transactional DML (post-hoc: the plan is fully resolved)
    ext.injectPostHocResolutionRule(session => graft.plans.GraftSqlRule(session))
    // operational table functions over the txn table's commit metadata
    ext.injectTableFunction(graft.plans.GraftTableFunctions.history)
    ext.injectTableFunction(graft.plans.GraftTableFunctions.files)
    ext.injectTableFunction(graft.plans.GraftTableFunctions.changes)
    // maintenance statements (DESCRIBE HISTORY / VACUUM / OPTIMIZE) —
    // non-matching SQL delegates verbatim to Spark's parser
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdiff"),
      new ExpressionInfo(classOf[SquaredDiffSum].getName, "graft_sqdiff"),
      (children: Seq[Expression]) => SquaredDiffSum(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.functions.TopKPairs].getName, "graft_topk"),
      graft.functions.VectorExprs.topKBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[graft.functions.NGramGenerator].getName, "graft_ngrams"),
      graft.functions.NGramGen.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => graft.functions.MinHashSig(children.head)))
  }
}
