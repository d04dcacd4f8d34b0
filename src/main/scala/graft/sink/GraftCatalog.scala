package graft.sink

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` over the graft table layout — the catalog-backed
  * destination the reference gets from a live Hive metastore
  * (`HiveSourceProvider.scala:46-52` resolves tables/partitions there; the
  * rebuild's `_schema.json` + `_partitioning` files under each table dir
  * carry the same contracts, and this catalog surfaces them to Spark's
  * catalog machinery). Register with:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sink.GraftCatalog
  *   spark.sql.catalog.graft.path = /data/warehouse
  * }}}
  *
  * after which graft tables are first-class:
  *
  *  - `CREATE TABLE graft.db.t (id BIGINT, msg STRING) PARTITIONED BY (msg)`
  *  - `INSERT INTO graft.db.t ...` / `df.writeTo("graft.db.t").append()`
  *  - `SELECT * FROM graft.db.t` (stats/bloom/partition skipping intact —
  *    loadTable returns the same [[GraftSinkTable]] the path API builds)
  *  - `df.writeStream.toTable("graft.db.t")` (exactly-once epochs)
  *  - `CREATE TABLE ... AS SELECT` (non-atomic CTAS via create + append)
  *  - `SHOW TABLES IN graft.db`, `DROP TABLE`, `ALTER TABLE ... RENAME`
  *
  * Identity mapping: namespace `db` + table `t` ↔ directory
  * `<path>/<db>.<t>` — exactly the layout every non-catalog writer uses, so
  * catalog and `format("graft-streaming")` access interoperate on the same
  * tables with the same validation.
  *
  * Creation-time table properties (`format`, `batch.size`, `bloom.columns`,
  * … — any [[GraftSinkOptions]] key, optionally `option.`-prefixed as Spark
  * DDL passes them) persist to `_props` in the table dir and apply to every
  * later write through the catalog, the metastore-parameters analogue.
  *
  * Scale note: every operation here is O(1) filesystem metadata per table
  * (list of one warehouse dir for SHOW TABLES; no manifest is ever parsed
  * at resolution time) — catalog resolution stays off the data path, which
  * keeps planning cost independent of table size.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouse: String = _
  private var defaults: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("path")).map(_.trim).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.path is required — the warehouse " +
          "directory that holds <db>.<table> graft table directories"))
    // every other catalog option is a default write option for all tables
    // (e.g. spark.sql.catalog.graft.format=orc)
    defaults = options.asCaseSensitiveMap().asScala.toMap - "path"
  }

  override def name(): String = catName

  private def conf = SparkSession.active.sparkContext.hadoopConfiguration
  private def fs = new Path(warehouse).getFileSystem(conf)

  /** Single-level namespaces only — `<db>.<table>` is the on-disk contract. */
  private def dbOf(ident: Identifier): String = ident.namespace match {
    case Array(d) => d
    case _ => throw new NoSuchTableException(ident)
  }

  private def optionKeys: Set[String] = Set(
    GraftSinkOptions.FORMAT, GraftSinkOptions.BATCH_SIZE,
    GraftSinkOptions.TXN_PER_BATCH, GraftSinkOptions.AUTO_CREATE_PARTITIONS,
    GraftSinkOptions.KEEPALIVE_INTERVAL_MS, GraftSinkOptions.BLOOM_COLUMNS,
    GraftSinkOptions.BLOOM_BITS, GraftSinkOptions.PRINCIPAL,
    GraftSinkOptions.KEYTAB)

  /** Creation/DDL properties → persisted graft write options: recognized
    * keys pass through, Spark's `option.`-prefixed forms are unwrapped,
    * engine-internal props (provider/location/owner) are dropped.
    */
  private def graftProps(properties: util.Map[String, String]): Map[String, String] =
    properties.asScala.toMap.flatMap { case (k0, v) =>
      val k = if (k0.startsWith(TableCatalog.OPTION_PREFIX))
        k0.stripPrefix(TableCatalog.OPTION_PREFIX) else k0
      if (optionKeys.contains(k.toLowerCase)) Some(k.toLowerCase -> v) else None
    }

  private def optsFor(ident: Identifier,
      extra: Map[String, String] = Map.empty): GraftSinkOptions = {
    val merged = defaults ++ extra ++
      Map("path" -> warehouse, "db" -> dbOf(ident), "table" -> ident.name)
    GraftSinkOptions.from(new CaseInsensitiveStringMap(merged.asJava))
  }

  // ---- persisted per-table write options (`_props`) ------------------------

  private def propsPath(o: GraftSinkOptions) = new Path(o.tableDir, "_props")

  private def loadProps(o: GraftSinkOptions): Map[String, String] = {
    val p = propsPath(o)
    if (!fs.exists(p)) Map.empty
    else CommitLog.readFully(fs, p).linesIterator
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
  }

  /** Writes `_props` atomically (temp + rename) and FAILS LOUDLY when the
    * rename loses: DDL that silently drops a property (a format=orc table
    * quietly reverting to jsonl) is worse than a retried ALTER. `replace`
    * deletes the old file first — HDFS rename does not overwrite.
    */
  private def saveProps(o: GraftSinkOptions, props: Map[String, String],
      replace: Boolean = false): Unit = {
    val p = propsPath(o)
    if (props.isEmpty) {
      if (replace && fs.exists(p)) fs.delete(p, false)
      return
    }
    val tmp = new Path(p.getParent, s".props.${java.util.UUID.randomUUID}.tmp")
    val out = fs.create(tmp, false)
    try out.write(props.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (replace && fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"failed to publish table properties at $p (concurrent DDL?); " +
          "the table's recorded properties are unchanged — retry the ALTER")
    }
  }

  // ---- TableCatalog ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] =
    namespace match {
      case Array(d) =>
        if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
        val root = new Path(warehouse)
        if (!fs.exists(root)) Array.empty
        else fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$d."))
          .map(st => Identifier.of(Array(d),
            st.getPath.getName.stripPrefix(s"$d.")))
          .toArray
      case _ => throw new NoSuchNamespaceException(namespace)
    }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 && {
      val o = optsFor(ident)
      fs.exists(new Path(o.tableDir, "_schema.json"))
    }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val bare = optsFor(ident)
    // one _props read per load; the snapshot also serves properties() —
    // DESCRIBE/explain would otherwise re-read the file per call
    val props = loadProps(bare)
    val opts = optsFor(ident, props)
    val schema = SchemaRegistry.load(opts).getOrElse(
      throw new NoSuchTableException(ident))
    val partCols = SchemaRegistry.loadPartitioning(opts).getOrElse(Seq.empty)
    // partitionColumnsSpecified = false: writes through the catalog
    // INHERIT the recorded layout (the metastore-resolution behavior) and
    // can never re-declare a conflicting one
    new GraftSinkTable(schema,
      opts.copy(partitionColumns = partCols,
        partitionColumnsSpecified = false)) {
      override def partitioning(): Array[Transform] =
        partCols.map(c => Expressions.identity(c)).toArray
      override def properties(): util.Map[String, String] =
        (props + (TableCatalog.PROP_PROVIDER -> "graft-streaming",
          TableCatalog.PROP_LOCATION -> opts.tableDir)).asJava
    }
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (ident.namespace.length != 1) throw new NoSuchNamespaceException(ident.namespace)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // only identity partitioning maps to the directory layout
    val partCols = partitions.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        s"graft tables support identity partition transforms only, got $other")
    }.toSeq
    partCols.foreach { c =>
      if (!schema.fieldNames.contains(c)) {
        throw new IllegalArgumentException(
          s"Partition column '$c' is not present in the table schema " +
            s"(${schema.fieldNames.mkString(",")})")
      }
    }
    val props = graftProps(properties)
    val opts = optsFor(ident, props)
      .copy(partitionColumns = partCols, partitionColumnsSpecified = true)
    // record the three table contracts NOW, so the table exists (and is
    // SELECTable as empty) before any row lands — the metastore behavior
    SchemaRegistry.saveIfAbsent(opts, schema)
    if (partCols.nonEmpty) SchemaRegistry.savePartitioningIfAbsent(opts, partCols)
    saveProps(opts, props)
    loadTable(ident)
  }

  /** Schema evolution is deliberately out of scope: the sink's declared
    * contract is NAME-SET validation against the recorded schema
    * (reference `HiveSourceProvider.scala:55-58`), and silently widening a
    * destination under live exactly-once streams is how mixed-schema
    * epochs happen. Property changes are allowed.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val bare = optsFor(ident)
    val propChanges = changes.map {
      case p: TableChange.SetProperty =>
        val k = if (p.property.startsWith(TableCatalog.OPTION_PREFIX))
          p.property.stripPrefix(TableCatalog.OPTION_PREFIX) else p.property
        if (!optionKeys.contains(k.toLowerCase)) {
          throw new UnsupportedOperationException(
            s"graft tables accept only write-option properties " +
              s"(${optionKeys.toSeq.sorted.mkString(", ")}); got '${p.property}'")
        }
        k.toLowerCase -> Some(p.value)
      case r: TableChange.RemoveProperty =>
        val k = if (r.property.startsWith(TableCatalog.OPTION_PREFIX))
          r.property.stripPrefix(TableCatalog.OPTION_PREFIX) else r.property
        k.toLowerCase -> None
      case other => throw new UnsupportedOperationException(
        "graft tables do not support schema evolution (name-set contract " +
          s"with exactly-once streams); rejected change: $other")
    }
    val updated = propChanges.foldLeft(loadProps(bare)) {
      case (acc, (k, Some(v))) => acc + (k -> v)
      case (acc, (k, None)) => acc - k
    }
    // _props is tiny and single-writer by DDL convention: rewrite whole,
    // atomically, failing loudly if the publish loses a race
    saveProps(bare, updated, replace = true)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(new Path(optsFor(ident).tableDir), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // `ALTER TABLE cat.db.t RENAME TO cat.db.t2` reaches the catalog with
    // the catalog name still in the target's namespace — strip our own
    // prefix before the single-level check
    val target = newIdent.namespace match {
      case Array(c, d) if c == catName => Identifier.of(Array(d), newIdent.name)
      case _ => newIdent
    }
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(target)) throw new TableAlreadyExistsException(target)
    if (target.namespace.length != 1) {
      throw new NoSuchNamespaceException(target.namespace)
    }
    // manifests record table-dir-RELATIVE paths, so a directory rename is
    // a complete, atomic-on-HDFS rename of the whole table
    if (!fs.rename(new Path(optsFor(oldIdent).tableDir),
        new Path(optsFor(target).tableDir))) {
      throw new IllegalStateException(
        s"rename ${oldIdent} -> ${target} failed at the filesystem")
    }
  }

  // ---- SupportsNamespaces ---------------------------------------------------
  // A namespace "exists" if any table carries it, or it was explicitly
  // created (marker file `_namespace.<db>` in the warehouse root).

  private def nsMarker(db: String) = new Path(warehouse, s"_namespace.$db")

  private def tableDbs(): Set[String] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(n => n.contains(".") && !n.startsWith("_"))
      .map(_.split("\\.", 2)(0)).toSet
  }

  private def markerDbs(): Set[String] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_namespace.") =>
        n.stripPrefix("_namespace.") }.toSet
  }

  override def listNamespaces(): Array[Array[String]] =
    (tableDbs() ++ markerDbs()).toSeq.sorted.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    namespace match {
      case Array() => listNamespaces()
      case ns if namespaceExists(ns) => Array.empty // single-level: no children
      case ns => throw new NoSuchNamespaceException(ns)
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace match {
      case Array(d) => tableDbs().contains(d) || markerDbs().contains(d)
      case _ => false
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    namespace match {
      case Array(d) =>
        if (namespaceExists(namespace)) {
          throw new NamespaceAlreadyExistsException(namespace)
        }
        fs.mkdirs(new Path(warehouse))
        fs.create(nsMarker(d), false).close()
      case _ => throw new IllegalArgumentException(
        s"graft namespaces are single-level; got ${namespace.mkString(".")}")
    }

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean =
    namespace match {
      case Array(d) if namespaceExists(namespace) =>
        val tables = listTables(namespace)
        if (tables.nonEmpty && !cascade) {
          throw new IllegalStateException(
            s"namespace $d holds ${tables.length} table(s); use CASCADE")
        }
        tables.foreach(dropTable)
        if (fs.exists(nsMarker(d))) fs.delete(nsMarker(d), false)
        true
      case _ => false
    }
}
