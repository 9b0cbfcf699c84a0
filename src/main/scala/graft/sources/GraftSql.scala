package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** Entry point to the SQL surface for callers whose session was built
  * WITHOUT `spark.sql.extensions=graft.GraftExtensions` (the driver-owned
  * Verify/Bench mains, notebooks attaching to an existing session):
  * returns a derived session — same SparkContext, same data, the parent's
  * runtime conf — whose analyzer carries the graft extension rules and
  * whose `graft` catalog is mounted at `catalogRoot`. Cached per
  * (parent, root): repeated calls share one derived session, so temp
  * views and the catalog instance persist across queries in a JVM. */
object GraftSql {
  private val sessions =
    new ConcurrentHashMap[(SparkSession, String), SparkSession]()

  /** Parents whose extensions object already carries the graft rules —
    * `sessionWithExtensions` mutates the parent's extensions, so a second
    * derivation from the same parent must not inject twice. */
  private val injected =
    java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def session(parent: SparkSession, catalogRoot: String): SparkSession =
    sessions.computeIfAbsent((parent, catalogRoot), _ => {
      val s = Bridge.sessionWithExtensions(parent,
        ext => if (injected.add(parent)) new graft.GraftExtensions().apply(ext))
      s.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.root", catalogRoot)
      // a CLONED session inherits the parent's function registries (only
      // the analyzer rules rebuild from extensions), so extension-
      // injected functions must register on the derived session directly
      // — capturing THIS session, so multi-session JVMs resolve each
      // statement through the session that parsed it
      graft.functions.VectorExprs.register(s)
      for ((ident, info, builder) <- graft.plans.GraftTableFunctions.all(() => s))
        s.sessionState.tableFunctionRegistry
          .registerFunction(ident, info, builder)
      s
    })
}
