package graft.sources

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The transactional table's SQL/catalog surface — a DSv2 `TableCatalog`
  * (+ `SupportsNamespaces`) mounted as
  * {{{ spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *     spark.sql.catalog.graft.root = /warehouse/path }}}
  * so the table a user previously reached only through the
  * `TxnTable` API / `format("graft-txn")` becomes something SQL can hold:
  * `CREATE TABLE graft.ns.t (...) USING graft-txn`, `INSERT INTO`,
  * `SELECT ... VERSION AS OF n` / `TIMESTAMP AS OF t`,
  * `ALTER TABLE ... ADD COLUMNS / RENAME COLUMN / DROP COLUMN`,
  * `DROP TABLE`, `SHOW TABLES`, plus `DELETE FROM` via the connector's
  * own `SupportsDelete` pushdown. `UPDATE` / `MERGE INTO` and the read
  * path route through `graft.plans.GraftSqlRule` (session extension),
  * which rewrites them onto the native `TxnTable` DML — the same
  * architecture Delta uses (catalog + extension rules over a V1
  * execution core).
  *
  * Layout: a table named `graft.a.b.t` lives at `<root>/a/b/t` — the
  * namespace IS the directory tree, `listTables`/`listNamespaces` are
  * directory listings, and everything about the table itself (schema,
  * versions, stats) stays in its own commit log. The catalog holds NO
  * state of its own: concurrent engines sharing the root see the same
  * tables with no metastore to reconcile — at 100 TB the catalog layer
  * must never become a second source of truth.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: java.nio.file.Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null,
      s"graft catalog '$name' needs spark.sql.catalog.$name.root=<dir>")
    root = Paths.get(r)
    Files.createDirectories(root)
    ()
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array("default")

  /** Declares ALTER TABLE ADD/DROP CONSTRAINT support — Spark routes the
    * parsed constraint DDL through `alterTable` only when this is set —
    * and CREATE TABLE with GENERATED ALWAYS AS (expr) / AS IDENTITY
    * columns: Spark refuses the statements outright for a catalog that
    * does not declare the capability, and with it the specs arrive as
    * field METADATA (`identity.start`/`step`/`allowExplicitInsert`,
    * `GENERATION_EXPRESSION`) which `createTable` lowers onto the same
    * log properties the write paths already honor. */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  private def dirOf(ident: Identifier): java.nio.file.Path =
    ident.namespace().foldLeft(root)(_.resolve(_)).resolve(ident.name())

  /** The directory a (possibly not-yet-existing) table name maps to —
    * the CLONE destination resolver's hook. */
  private[graft] def dirOfName(ns: Array[String], name: String): String =
    dirOf(Identifier.of(ns, name)).toString

  private def dirOf(ns: Array[String]): java.nio.file.Path =
    ns.foldLeft(root)(_.resolve(_))

  private def isTableDir(p: java.nio.file.Path): Boolean =
    Files.isDirectory(p.resolve("_txn_log"))

  private def spark: SparkSession = SparkSession.active

  // -------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dirOf(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def loadTable(ident: Identifier): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    new GraftTableV2(fullName(ident), d.toString, -1L)
  }

  /** `VERSION AS OF` time travel: the version string is the commit
    * version number. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    new GraftTableV2(fullName(ident), d.toString, version.toLong)
  }

  /** `TIMESTAMP AS OF` time travel: Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    val v = TxnTable.at(spark, d.toString).versionAtTime(timestamp / 1000L)
    new GraftTableV2(fullName(ident), d.toString, v)
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace().toSeq :+ ident.name()).mkString(".")

  /** The Column-based CREATE — the overload Spark actually calls for SQL
    * DDL, and the ONLY one that carries GENERATED ALWAYS AS (expr) /
    * AS IDENTITY specs (the default StructType conversion silently drops
    * them, which is why the deprecated overload below also re-extracts
    * from field metadata as a fallback for direct API callers). */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val identities = columns.collect {
      case c if c.identityColumnSpec() != null =>
        val s = c.identityColumnSpec()
        require(!s.isAllowExplicitInsert,
          s"column ${c.name()}: GENERATED BY DEFAULT AS IDENTITY is not " +
            "supported — use GENERATED ALWAYS AS IDENTITY")
        c.name() -> (s.getStart, s.getStep)
    }.toMap
    val generated = columns.collect {
      case c if c.generationExpression() != null =>
        c.name() -> c.generationExpression()
    }.toMap
    val schema = StructType(columns.map { c =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      if (c.comment() != null) mb.putString("comment", c.comment())
      org.apache.spark.sql.types.StructField(
        c.name(), c.dataType(), c.nullable(), mb.build())
    })
    createGraft(ident, schema, partitions, properties, identities, generated)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // direct API callers may carry the specs as field metadata (the
    // encoding Spark's catalyst utilities use) — re-extract and strip
    val GenKey = "GENERATION_EXPRESSION"
    val identities = schema.fields.collect {
      case f if f.metadata.contains("identity.start") =>
        require(!f.metadata.contains("identity.allowExplicitInsert") ||
            !f.metadata.getBoolean("identity.allowExplicitInsert"),
          s"column ${f.name}: GENERATED BY DEFAULT AS IDENTITY is not " +
            "supported — use GENERATED ALWAYS AS IDENTITY")
        f.name -> (f.metadata.getLong("identity.start"),
          f.metadata.getLong("identity.step"))
    }.toMap
    val generated = schema.fields.collect {
      case f if f.metadata.contains(GenKey) =>
        f.name -> f.metadata.getString(GenKey)
    }.toMap
    val clean = StructType(schema.fields.map { f =>
      if (!identities.contains(f.name) && !generated.contains(f.name)) f
      else {
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        Seq("identity.start", "identity.step", "identity.allowExplicitInsert",
          GenKey).foreach(mb.remove)
        f.copy(metadata = mb.build())
      }
    })
    createGraft(ident, clean, partitions, properties, identities, generated)
  }

  /** Shared CREATE body: cluster transforms -> `graft.clusterBy`,
    * engine-owned column declarations ride the SAME v0 commit as log
    * properties (the write paths' single source of truth). */
  private def createGraft(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String],
      identities: Map[String, (Long, Long)],
      generated: Map[String, String]): Table = {
    // `CREATE TABLE ... CLUSTER BY (c1, c2)` arrives as a ClusterByTransform
    // — the declarative layout this format DOES support: it lowers onto the
    // `graft.clusterBy` property (every write range-sorts, OPTIMIZE
    // defaults to it). Hive-style PARTITIONED BY stays rejected.
    val clusterTransforms = partitions.collect {
      case org.apache.spark.sql.connector.expressions
        .ClusterByTransform(cols) => cols.map(_.fieldNames().mkString("."))
    }
    require(partitions.length == clusterTransforms.length,
      "graft-txn lays data out by write-time clustering (CLUSTER BY) and " +
        "clustered compaction (OPTIMIZE), not hive-style partitions; " +
        "create the table unpartitioned or with CLUSTER BY")
    val clusterCols = clusterTransforms.flatten
    val d = dirOf(ident)
    if (isTableDir(d)) throw new TableAlreadyExistsException(ident.toString)
    Files.createDirectories(d)
    val t = TxnTable.at(spark, d.toString)
    t.create(schema, identities, generated)
    // column-level NOT NULL in the DDL becomes an enforced constraint —
    // schema nullability alone would be a promise the write path never
    // checks (engine-owned columns excluded: the engine fills them, and
    // a NOT NULL check on a pre-declaration NULL would be unsatisfiable)
    schema.fields.filterNot(_.nullable)
      .filterNot(f => identities.contains(f.name) || generated.contains(f.name))
      .foreach(f => t.setNotNull(f.name))
    // user TBLPROPERTIES ride the log (Spark-injected bookkeeping keys
    // stay out — the catalog holds no state, so only log-recorded
    // properties exist). `graft.clusterBy` is the layout-bearing one:
    // every subsequent write range-sorts on it.
    val user = properties.asScala.filterNot { case (k, _) =>
      k == TableCatalog.PROP_PROVIDER || k == TableCatalog.PROP_LOCATION ||
        k == TableCatalog.PROP_OWNER || k == TableCatalog.PROP_COMMENT ||
        k == TableCatalog.PROP_EXTERNAL || k.startsWith("option.")
    }.toMap ++ (if (clusterCols.nonEmpty)
      Map("graft.clusterBy" -> clusterCols.mkString(",")) else Map.empty)
    if (user.nonEmpty) t.setProperties(user)
    new GraftTableV2(fullName(ident), d.toString, -1L)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    val t = TxnTable.at(spark, d.toString)
    // property changes batch into ONE commit (ALTER ... SET TBLPROPERTIES
    // with several pairs is one statement, so one log entry)
    val setP = changes.collect {
      case c: TableChange.SetProperty => c.property() -> c.value() }.toMap
    val unsetP = changes.collect {
      case c: TableChange.RemoveProperty => c.property() }
    if (setP.nonEmpty || unsetP.nonEmpty) t.setProperties(setP, unsetP)
    changes.foreach {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case c: TableChange.AddColumn =>
        require(c.fieldNames().length == 1,
          s"nested add-column unsupported: ${c.fieldNames().mkString(".")}")
        t.addColumns(StructType(Seq(org.apache.spark.sql.types.StructField(
          c.fieldNames()(0), c.dataType(), c.isNullable))))
      case c: TableChange.RenameColumn =>
        require(c.fieldNames().length == 1,
          s"nested rename unsupported: ${c.fieldNames().mkString(".")}")
        t.renameColumn(c.fieldNames()(0), c.newName())
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames().length == 1,
          s"nested drop unsupported: ${c.fieldNames().mkString(".")}")
        t.dropColumn(c.fieldNames()(0))
      case c: TableChange.AddConstraint => c.constraint() match {
        case ch: org.apache.spark.sql.connector.catalog.constraints.Check =>
          t.addConstraint(ch.name(), ch.predicateSql())
        case other => throw new UnsupportedOperationException(
          "graft-txn enforces CHECK constraints only (PRIMARY KEY / UNIQUE " +
            s"/ FOREIGN KEY are informational elsewhere, refused here): $other")
      }
      case c: TableChange.DropConstraint =>
        if (t.constraintsAt(t.currentVersion).exists(_._1 == c.name()))
          t.dropConstraint(c.name())
        else if (!c.ifExists())
          throw new IllegalArgumentException(s"no such constraint: ${c.name()}")
      case c: TableChange.UpdateColumnNullability =>
        require(c.fieldNames().length == 1,
          s"nested nullability unsupported: ${c.fieldNames().mkString(".")}")
        val colName = c.fieldNames()(0)
        if (!c.nullable()) t.setNotNull(colName)
        else if (t.constraintsAt(t.currentVersion).exists(_._1 == s"nn_$colName"))
          t.dropConstraint(s"nn_$colName")
      case c: TableChange.ClusterBy =>
        // ALTER TABLE ... CLUSTER BY (cols) / CLUSTER BY NONE — the same
        // property the CREATE-time clause lowers onto
        val cols = c.clusteringColumns().map(_.fieldNames().mkString("."))
        if (cols.isEmpty) t.setProperties(Map.empty, Seq("graft.clusterBy"))
        else t.setProperties(Map("graft.clusterBy" -> cols.mkString(",")))
      case other => throw new UnsupportedOperationException(
        s"graft-txn: unsupported ALTER TABLE change $other")
    }
    new GraftTableV2(fullName(ident), d.toString, -1L)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    if (!isTableDir(d)) return false
    val w = Files.walk(d)
    try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    finally w.close()
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    val to = dirOf(newIdent)
    if (isTableDir(to)) throw new TableAlreadyExistsException(newIdent.toString)
    Files.createDirectories(to.getParent)
    Files.move(from, to)
    ()
  }

  // ---------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => Array(p.getFileName.toString)).toArray
    finally s.close()
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = dirOf(namespace)
    if (!Files.isDirectory(d) || isTableDir(d))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => namespace :+ p.getFileName.toString).toArray
    finally s.close()
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    val d = dirOf(namespace)
    if (!Files.isDirectory(d) || isTableDir(d))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    Files.createDirectories(dirOf(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val d = dirOf(namespace)
    if (!Files.isDirectory(d)) return false
    if (!cascade) {
      val s = Files.list(d)
      val empty = try !s.iterator().hasNext finally s.close()
      require(empty, s"namespace ${namespace.mkString(".")} is not empty")
    }
    val w = Files.walk(d)
    try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    finally w.close()
    true
  }
}

/** The DSv2 `Table` a `GraftCatalog` serves. Reads are rewritten by
  * `graft.plans.GraftSqlRule` onto the native snapshot plan (the V1
  * parquet scan with pruning/pushdown — never a re-implemented reader);
  * writes go through the V1 write fallback (`V1_BATCH_WRITE` →
  * `InsertableRelation`), which maps INSERT INTO onto `append` and
  * INSERT OVERWRITE / truncate onto `overwrite`; DELETE WHERE with
  * connector-translatable filters runs through `SupportsDelete` without
  * any extension installed. `pinnedVersion` ≥ 0 is a time-travel load —
  * a read-only snapshot (writes refuse). */
private[graft] class GraftTableV2(tableName: String, val root: String,
    val pinnedVersion: Long) extends Table with SupportsWrite with SupportsDelete {

  private def spark: SparkSession = SparkSession.active

  private[graft] def txn: TxnTable = TxnTable.at(spark, root)

  /** The snapshot DataFrame this table denotes (tip, or the pinned
    * time-travel version). */
  private[graft] def readDf(session: SparkSession): org.apache.spark.sql.DataFrame =
    TxnTable.at(session, root).read(pinnedVersion)

  /** The snapshot scan over only the files surviving `preds` — the
    * commit-log file skipping (stats/bloom/null prune) for the SQL
    * lowering; the caller keeps the exact row filter above. */
  private[graft] def readDfPruned(session: SparkSession,
      preds: Seq[TxnTable.SkipPred]): org.apache.spark.sql.DataFrame =
    TxnTable.at(session, root).readPruned(preds, pinnedVersion)

  override def name(): String = tableName

  override def schema(): StructType = {
    val t = txn
    val v = if (pinnedVersion < 0) t.currentVersion else pinnedVersion
    // mapping metadata (physical names) is table-internal — SQL sees
    // clean logical fields
    t.schemaAt(v).map(sc => StructType(sc.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty))))
      .getOrElse(new StructType())
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def properties(): util.Map[String, String] = {
    val t = txn
    val v = if (pinnedVersion < 0) t.currentVersion else pinnedVersion
    (t.propertiesAt(v) ++
      Map("provider" -> "graft-txn", "location" -> root)).asJava
  }

  /** Active CHECK constraints, surfaced as enforced+validated (add-time
    * validation scanned existing data; write-time enforcement is fused
    * into staging) — DESCRIBE and the analyzer read these. */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    val t = txn
    val v = if (pinnedVersion < 0) t.currentVersion else pinnedVersion
    t.constraintsAt(v).map { case (n, e) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint.check(n)
        .predicateSql(e)
        .enforced(true)
        .validationStatus(org.apache.spark.sql.connector.catalog
          .constraints.Constraint.ValidationStatus.VALID)
        .build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray
  }

  // ------------------------------------------------------------- writes

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion < 0,
      s"cannot write to the time-travel snapshot $tableName@v$pinnedVersion")
    new GraftWriteBuilder(root, overwrite = false)
  }

  private class GraftWriteBuilder(root: String, overwrite: Boolean)
      extends WriteBuilder with SupportsTruncate {
    override def truncate(): WriteBuilder = new GraftWriteBuilder(root, true)
    override def build(): Write = new V1Write {
      override def toInsertableRelation: InsertableRelation =
        (data: org.apache.spark.sql.DataFrame, overwriteFlag: Boolean) => {
          val t = TxnTable.at(data.sparkSession, root)
          if (overwrite || overwriteFlag) t.overwrite(data) else t.append(data)
          ()
        }
    }
  }

  // ----------------------------------------------- connector-level DELETE

  /** Reuses the V1 filter translation: a filter set the bridge can
    * express as a Column is deletable exactly (Spark requires exact
    * semantics here — unlike scan pushdown there is no re-evaluation
    * above, so an untranslatable filter must REFUSE, not approximate). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    TxnFilters.toCondition(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinnedVersion < 0,
      s"cannot delete from the time-travel snapshot $tableName@v$pinnedVersion")
    val cond = TxnFilters.toCondition(filters).getOrElse(
      throw new UnsupportedOperationException(
        s"untranslatable delete filters: ${filters.mkString(", ")}"))
    txn.deleteWhere(cond)
    ()
  }
}
