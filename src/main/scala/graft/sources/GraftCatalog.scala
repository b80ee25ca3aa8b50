package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSourceV2 [[TableCatalog]] over versioned tables — the table
  * LIFECYCLE as native SQL, no bridge views or quoted paths:
  *
  * {{{
  *   spark.conf: spark.sql.catalog.graft = graft.sources.GraftCatalog
  *               [spark.sql.catalog.graft.warehouse = /path]
  *
  *   CREATE TABLE graft.events (k BIGINT, v STRING) [USING graftvt]
  *   INSERT INTO graft.events SELECT ...      -- optimistic-commit append
  *   INSERT OVERWRITE graft.events SELECT ... -- one overwrite commit
  *   SELECT * FROM graft.events               -- DSv2 scan: data skipping,
  *                                            --   agg/limit pushdown, DPP
  *   SELECT * FROM graft.events VERSION AS OF 3      -- native time travel
  *   SELECT * FROM graft.events TIMESTAMP AS OF '...'--   (loadTable hooks)
  *   CREATE TABLE graft.copy AS SELECT ...    -- CTAS
  *   DROP TABLE graft.events
  * }}}
  *
  * Each table is one versioned directory `<warehouse>/<name>` (the
  * transaction log IS the catalog state — `tableExists` checks the log,
  * exactly like a path-based Delta catalog). Namespaces are flattened
  * into the directory name with dots, so `graft.ns.t` lives at
  * `<warehouse>/ns.t` — listTables/namespace support stays minimal by
  * design; the reference's catalog surface is flat table names.
  *
  * Time travel: Spark resolves `VERSION AS OF` through
  * `loadTable(ident, version)` and `TIMESTAMP AS OF` through
  * `loadTable(ident, micros)` natively for catalog tables — no parser
  * substitution involved (that path stays for bridge names and quoted
  * paths).
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouseOpt: Option[String] = None

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouseOpt = Option(options.get("warehouse"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** The catalog root: the configured warehouse, else
    * `<spark warehouse>/_graft_catalog_<name>`.
    */
  private[graft] def warehouse: Path = new Path(warehouseOpt.getOrElse(
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"_graft_catalog_$catalogName").toString))

  private def fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The versioned directory of an identifier (namespace parts joined
    * into the name with dots).
    */
  private[graft] def tableDir(ident: Identifier): Path =
    new Path(warehouse, (ident.namespace().toSeq :+ ident.name()).mkString("."))

  private def hasLog(dir: Path): Boolean =
    try fs.exists(new Path(dir, "_graft_log")) catch { case _: Exception => false }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!fs.exists(warehouse)) return Array.empty
    val prefix = namespace.toSeq.map(_ + ".").mkString
    fs.listStatus(warehouse).toSeq
      .filter(st => st.isDirectory && hasLog(st.getPath))
      .map(_.getPath.getName)
      .filter(n => prefix.isEmpty || n.startsWith(prefix))
      .map(n => Identifier.of(namespace, n.stripPrefix(prefix)))
      .toArray
  }

  private def tableAt(ident: Identifier, version: Int): Table = {
    val dir = tableDir(ident)
    if (!hasLog(dir)) throw new NoSuchTableException(ident)
    val vt = new VersionedTable(spark, dir.toString)
    val v = if (version >= 0) version else vt.latestVersion
    // the LOG-recorded schema: loadTable runs per query during
    // analysis, and a readAt-based inference would list every active
    // directory each time
    new GraftVtTable(vt, v, dir.toString, vt.tableSchema(Some(v)),
      timeTravelled = version >= 0)
  }

  override def loadTable(ident: Identifier): Table = tableAt(ident, -1)

  /** `VERSION AS OF v` (Spark hands the version text verbatim). */
  override def loadTable(ident: Identifier, version: String): Table =
    tableAt(ident, version.trim.toInt)

  /** `TIMESTAMP AS OF ts` (Spark hands epoch MICROseconds). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!hasLog(dir)) throw new NoSuchTableException(ident)
    val vt = new VersionedTable(spark, dir.toString)
    tableAt(ident, vt.versionAtTimestamp(timestampMicros / 1000L))
  }

  override def tableExists(ident: Identifier): Boolean = hasLog(tableDir(ident))

  /** Keys Spark itself injects into every CREATE — not user
    * TBLPROPERTIES; they are filtered before the log records the rest.
    */
  private val reservedProps = Set(
    TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
    TableCatalog.PROP_LOCATION, TableCatalog.PROP_EXTERNAL,
    TableCatalog.PROP_IS_MANAGED_LOCATION)

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // IDENTITY transforms only — `PARTITIONED BY (col)`, the
    // reference's Bronze layout. The column list rides the transaction
    // log; every append splits its payload one directory per distinct
    // partition tuple, whose exact [min = max] stat makes the SAME
    // manifest pruning that serves data skipping serve partition
    // pruning (no second index, no Hive directory parsing). Function
    // transforms (bucket/days/...) would need derived-value stats —
    // rejected loudly; OPTIMIZE/ZORDER cluster within and across
    // partitions instead.
    val partCols = partitions.toSeq.map { t =>
      val refs = t.references()
      require(t.name() == "identity" && refs.length == 1 &&
        refs(0).fieldNames().length == 1,
        s"graft catalog tables support identity PARTITIONED BY " +
          s"(top-level columns) only, got transform: $t")
      refs(0).fieldNames()(0)
    }
    val dir = tableDir(ident)
    if (hasLog(dir)) throw new TableAlreadyExistsException(ident)
    val vt = new VersionedTable(spark, dir.toString)
    // user TBLPROPERTIES (and COMMENT) persist in the transaction log
    // and ride checkpoints; Spark-injected provider/owner/location
    // entries are the catalog's own bookkeeping, not table state
    vt.create(schema,
      properties.asScala.toMap.filterNot { case (k, _) =>
        reservedProps.contains(k) },
      partCols)
    loadTable(ident)
  }

  /** `ALTER TABLE graft.t ADD COLUMNS (...)` / `DROP COLUMN[S]` /
    * `RENAME COLUMN` / `ALTER COLUMN ... TYPE` — METADATA-ONLY schema
    * commits ([[VersionedTable.addColumns]] /
    * [[VersionedTable.dropColumns]] / [[VersionedTable.renameColumn]]
    * via column mapping / [[VersionedTable.widenColumn]] via reader
    * upcast): no data file is touched, old directories read added
    * columns as null and widened columns upcast at scan, time travel
    * keeps each version's own schema. Anything else (narrowing,
    * repositioning — which would need file rewrites) fails loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!hasLog(dir)) throw new NoSuchTableException(ident)
    val vt = new VersionedTable(spark, dir.toString)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val widens = changes.collect { case w: TableChange.UpdateColumnType => w }
    val sets = changes.collect { case s: TableChange.SetProperty => s }
    val unsets = changes.collect { case u: TableChange.RemoveProperty => u }
    require(adds.size + drops.size + renames.size + widens.size + sets.size +
      unsets.size == changes.size,
      "the graft catalog supports ALTER TABLE ADD COLUMNS, DROP " +
        "COLUMN[S], RENAME COLUMN, ALTER COLUMN ... TYPE (lossless " +
        "widening), and SET/UNSET TBLPROPERTIES only (metadata-only " +
        "commits); CHECK constraints and maintenance run through the " +
        "SQL command frontend")
    adds.foreach(a => require(a.fieldNames().length == 1 && a.position() == null,
      "ADD COLUMNS supports top-level columns without position clauses"))
    drops.foreach(d => require(d.fieldNames().length == 1,
      "DROP COLUMN supports top-level columns"))
    renames.foreach(r => require(r.fieldNames().length == 1,
      "RENAME COLUMN supports top-level columns"))
    widens.foreach(w => require(w.fieldNames().length == 1,
      "ALTER COLUMN TYPE supports top-level columns"))
    if (adds.nonEmpty)
      vt.addColumns(StructType(adds.map(a =>
        org.apache.spark.sql.types.StructField(a.fieldNames()(0), a.dataType()))))
    if (drops.nonEmpty) vt.dropColumns(drops.map(_.fieldNames()(0)))
    renames.foreach(r => vt.renameColumn(r.fieldNames()(0), r.newName()))
    widens.foreach(w => vt.widenColumn(w.fieldNames()(0), w.newDataType()))
    val userSets = sets.filterNot(s => reservedProps.contains(s.property()))
    if (userSets.nonEmpty)
      vt.setProperties(userSets.map(s => s.property() -> s.value()).toMap)
    if (unsets.nonEmpty) vt.unsetProperties(unsets.map(_.property()))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!hasLog(dir)) false
    else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    val to = tableDir(newIdent)
    if (!hasLog(from)) throw new NoSuchTableException(oldIdent)
    if (hasLog(to)) throw new TableAlreadyExistsException(newIdent)
    require(fs.rename(from, to),
      s"rename $from -> $to failed (target parent missing or cross-filesystem)")
  }
}
