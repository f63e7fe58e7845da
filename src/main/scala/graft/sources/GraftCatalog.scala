package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier,
  NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{ColDef, GSchema, GType}

/** The engine as a Spark SQL CATALOG — full DDL/DML without ever
  * touching the Scala API:
  *
  * {{{
  * spark.sql.catalog.g      = graft.sources.GraftCatalog
  * spark.sql.catalog.g.path = /data/my-repo
  *
  * CREATE TABLE g.prices.btc (ts TIMESTAMP, px DOUBLE)
  *   PARTITIONED BY (ts)                  -- identity transforms = the
  *                                        -- series' INDEX, in order
  * INSERT INTO g.prices.btc SELECT ...    -- the engine's one-job write
  * SELECT * FROM g.prices.btc WHERE ts > X  -- manifest-pruned scan
  * SELECT * FROM g.prices.btc TIMESTAMP AS OF '...'  -- time travel
  * SELECT * FROM g.prices.btc.segments   -- metadata tables: zero-job
  * SELECT * FROM g.prices.btc.history    --   driver-local scans
  * DROP TABLE g.prices.btc
  * }}}
  *
  * Mapping: namespace = COLLECTION (one schema shared by its series,
  * exactly the engine's model), table = SERIES. `CREATE TABLE` creates
  * the collection on first use; a second series in the same collection
  * must declare the identical schema (the collection's contract —
  * reference lakota/collection.py one-schema-per-collection). Series
  * are implicit in the engine (they materialize at first write), so
  * `loadTable` resolves any label in an existing collection — INSERT
  * right after CREATE works — while `tableExists`/`listTables` report
  * only series present in the manifest. `kv` upsert schemas via
  * `TBLPROPERTIES ('kv' = 'true')`.
  *
  * TIMESTAMP AS OF maps to the changelog revision clock
  * (`Series.frame(beforeMs)`); VERSION AS OF accepts the same
  * epoch-millis number for scripting.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var rootUri: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootUri = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name': set spark.sql.catalog.$name.path"))
  }

  override def name(): String = catalogName

  /** DEFAULT-valued columns are accepted (ALTER TABLE ADD COLUMN ...
    * DEFAULT v — the zero-copy schema-evolution path). */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def repo: graft.api.Repo =
    new graft.api.Repo(rootUri, SparkSession.active)

  /** 'page_len' TBLPROPERTY value: positive integer rows-per-file */
  private def parsePageLen(v: String): Long = {
    val n = try v.toLong catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"page_len must be a positive integer, got '$v'") }
    require(n > 0, s"page_len must be positive, got $v")
    n
  }

  private def collectionOf(ns: Array[String]): String = {
    if (ns.length != 1)
      throw new NoSuchNamespaceException(ns)
    ns(0)
  }

  // ------------------------------------------------------------------
  // tables = series
  // ------------------------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] =
    repo.collection(collectionOf(ns)) match {
      case None => throw new NoSuchNamespaceException(ns)
      case Some(c) => c.ls().map(Identifier.of(ns, _)).toArray
    }

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace().length == 2) metaTable(ident, None)
    else {
      val clct = collectionOf(ident.namespace())
      if (repo.collection(clct).isEmpty)
        throw new NoSuchTableException(ident)
      new GraftTable(rootUri, clct, ident.name(), None)
    }

  /** TIMESTAMP AS OF — Spark passes MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long)
      : Table =
    if (ident.namespace().length == 2)
      metaTable(ident, Some(timestampMicros / 1000L))
    else {
      val clct = collectionOf(ident.namespace())
      if (repo.collection(clct).isEmpty)
        throw new NoSuchTableException(ident)
      new GraftTable(rootUri, clct, ident.name(),
        Some(timestampMicros / 1000L))
    }

  /** VERSION AS OF — epoch millis on the changelog clock, or a
    * REVISION ID (the `revision` column of `CALL g.sys.history`, full
    * `hextime-sha1` or any unambiguous prefix): the snapshot pins to
    * that revision's commit instant. */
  override def loadTable(ident: Identifier, version: String): Table =
    if (ident.namespace().length == 2) {
      val c = repo.collection(ident.namespace()(0)).getOrElse(
        throw new NoSuchTableException(ident))
      metaTable(ident, Some(resolveVersionMs(c, version)))
    } else {
      val clct = collectionOf(ident.namespace())
      val c = repo.collection(clct).getOrElse(
        throw new NoSuchTableException(ident))
      new GraftTable(rootUri, clct, ident.name(),
        Some(resolveVersionMs(c, version)))
    }

  private def resolveVersionMs(c: graft.api.Collection, version: String)
      : Long =
    scala.util.Try(version.toLong).getOrElse {
      val log = c.changelog.log()
      val hits = log.filter(r =>
        r.child == version || r.child.startsWith(version) ||
          r.digest.startsWith(version))
      hits match {
        case Seq(r) =>
          // the snapshot clock is millisecond-grained: another
          // revision in the same millisecond would silently win the
          // leaf resolution at epochMs+1 — refuse rather than serve
          // the wrong snapshot. Checked against ALL same-ms revisions
          // that are not ancestors of r (DFS linearization is not
          // commit-time order on forked histories, so a sibling
          // branch's same-ms revision can appear BEFORE r in the log);
          // ancestors of r are safe — they lose the leaf race to r by
          // construction.
          val ancestors = {
            // merge nodes carry one edge per parent: follow them all
            val parentsOf = log.groupBy(_.child)
              .view.mapValues(_.map(_.parent)).toMap
            val seen = scala.collection.mutable.Set.empty[String]
            val todo = scala.collection.mutable.Queue(
              parentsOf.getOrElse(r.child, Nil): _*)
            while (todo.nonEmpty) {
              val p = todo.dequeue()
              if (seen.add(p)) todo.enqueueAll(parentsOf.getOrElse(p, Nil))
            }
            seen.toSet
          }
          if (log.exists(x => x.child != r.child &&
              !ancestors.contains(x.child) && x.epochMs == r.epochMs))
            throw new IllegalArgumentException(
              s"graft VERSION AS OF: revision ${r.child} shares its " +
                "millisecond with a later revision, so the snapshot " +
                "clock cannot pin it — pin the later revision, or " +
                "squash/trim first")
          r.epochMs + 1L // include r, exclude later
        case Seq() => throw new IllegalArgumentException(
          s"graft VERSION AS OF: no revision matches '$version' " +
            s"(epoch millis or a revision id from CALL sys.history)")
        case _ => throw new IllegalArgumentException(
          s"graft VERSION AS OF: '$version' is ambiguous " +
            s"(${hits.length} revisions match)")
      }
    }

  /** 4-part names select a METADATA TABLE of a series —
    * `cat.<collection>.<series>.segments` / `.history`
    * ([[GraftMetaTable]], a zero-job driver-local scan). */
  private def metaTable(ident: Identifier, beforeMs: Option[Long])
      : Table = {
    val clct = ident.namespace()(0)
    val kind = ident.name().toLowerCase(java.util.Locale.ROOT)
    if (repo.collection(clct).isEmpty ||
        !GraftMetaTable.kinds.contains(kind))
      throw new NoSuchTableException(ident)
    new GraftMetaTable(rootUri, clct, ident.namespace()(1), kind,
      beforeMs)
  }

  override def tableExists(ident: Identifier): Boolean =
    if (ident.namespace().length == 2)
      GraftMetaTable.kinds.contains(
        ident.name().toLowerCase(java.util.Locale.ROOT)) &&
        repo.collection(ident.namespace()(0))
          .exists(_.ls().contains(ident.namespace()(1)))
    else
      repo.collection(collectionOf(ident.namespace()))
        .exists(_.ls().contains(ident.name()))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val idxNames: Seq[String] = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"graft tables take identity PARTITIONED BY columns (the " +
          s"series index), got $t")
      t.references()(0).fieldNames().mkString(".")
    }
    require(idxNames.nonEmpty,
      "graft tables need PARTITIONED BY (<index columns...>) — the " +
        "series' sorted index, in significance order")
    // DEFAULTs at CREATE time would shadow explicitly-stored nulls
    // (the read-side fill is coalesce-based); they belong to schema
    // evolution, where the fill is exactly right for pre-ADD files
    schema.fields.foreach(f => require(
      !f.metadata.contains("CURRENT_DEFAULT"),
      s"graft: column ${f.name}: CREATE TABLE with DEFAULT is not " +
        "supported — create without it, then ALTER TABLE ADD COLUMN " +
        "... DEFAULT for zero-copy evolution"))
    // index columns first, in PARTITIONED BY order (the engine sorts
    // and prunes by this order), then the value columns
    val byName = schema.fields.map(f => f.name -> f).toMap
    idxNames.foreach(n => require(byName.contains(n),
      s"PARTITIONED BY column $n is not in the table schema"))
    val cols: Seq[ColDef] =
      idxNames.map(n => ColDef(n, GType.fromSpark(byName(n).dataType),
        idx = true)) ++
        schema.fields.toSeq.filterNot(f => idxNames.contains(f.name))
          .map(f => ColDef(f.name, GType.fromSpark(f.dataType),
            idx = false))
    require(schema.fields.exists(f => !idxNames.contains(f.name)),
      "a graft series needs at least one value column beyond " +
        "PARTITIONED BY (the index)")
    val kv = Option(properties.get("kv")).contains("true")
    // persisted page length (rows per segment file): finer segments
    // prune tighter and make row-level operations rewrite less
    val pageLen = Option(properties.get("page_len")).map(parsePageLen)
    val gschema = GSchema(cols, kv)
    val clct = collectionOf(ident.namespace())
    // creates the collection on first use; an existing collection
    // enforces schema equality (one schema per collection)
    repo.createCollection(gschema, clct, pageLen = pageLen)
    new GraftTable(rootUri, clct, ident.name(), None)
  }

  /** Zero-copy schema evolution — ADD / RENAME / DROP COLUMN as pure
    * registry metadata (the clone machinery's colMap/defaults, applied
    * in place): no file is rewritten, old segment files keep serving
    * through the rename map, files predating an added column fill it
    * with its DEFAULT (or null). The schema is COLLECTION-wide (one
    * schema per collection, the engine's contract), so altering any
    * series' table alters its siblings too. Added columns get a FRESH
    * physical name, so dropping and re-adding a name can never
    * resurrect dead stored values. Index columns may be renamed but
    * not dropped; nothing may be added to the index (segment pruning
    * is positional over the existing sort). */
  override def alterTable(ident: Identifier, changes: TableChange*)
      : Table = {
    import org.apache.spark.sql.connector.catalog.TableChange._
    val clct = collectionOf(ident.namespace())
    val c = repo.collection(clct).getOrElse(
      throw new NoSuchTableException(ident))
    var cols = c.schema.cols
    var colMap = c.colMap
    var defaults = c.defaults
    var colsChanged = false
    // property changes stage here and commit AFTER the loop, like the
    // column vars: a later unsupported change in the same statement
    // must not leave a half-applied DDL behind
    var pageLenChange: Option[Option[Long]] = None
    def one(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"graft columns are top-level, got ${fieldNames.mkString(".")}")
      fieldNames(0)
    }
    changes.foreach {
      case a: AddColumn =>
        colsChanged = true
        val name = one(a.fieldNames())
        require(!cols.exists(_.name == name),
          s"column $name already exists")
        require(a.position() == null,
          "graft ADD COLUMN appends; positions are not supported")
        val dt = GType.fromSpark(a.dataType())
        // fresh physical name: a dropped-then-re-added name must not
        // resurrect the dead stored column from old files
        val phys = s"${name}__a${graft.core.Hash.hextime()}"
        // a DEFAULT is required: it is what rows written BEFORE the
        // column existed answer (files lacking the column, and
        // manifest-inline micro-rows whose stored vectors predate it)
        val v = Option(a.defaultValue()).map(_.getValue.value())
          .getOrElse(throw new IllegalArgumentException(
            s"graft ADD COLUMN $name needs a DEFAULT — it is the " +
              "value rows written before the column existed answer"))
        require(v != null, s"graft ADD COLUMN $name: DEFAULT NULL " +
          "is not supported; give a concrete default")
        cols = cols :+ ColDef(name, dt, idx = false)
        colMap = colMap + (name -> phys)
        defaults = defaults + (name -> kernelOfLiteral(dt, v))
      case r: RenameColumn =>
        colsChanged = true
        val from = one(r.fieldNames())
        val to = r.newName()
        require(cols.exists(_.name == from), s"no column $from")
        require(!cols.exists(_.name == to),
          s"column $to already exists")
        val phys = c.physOf(from)
        cols = cols.map(cd =>
          if (cd.name == from) cd.copy(name = to) else cd)
        colMap = (colMap - from) + (to -> phys)
        defaults = defaults.get(from) match {
          case Some(v) => (defaults - from) + (to -> v)
          case None => defaults
        }
      case d: DeleteColumn =>
        colsChanged = true
        val name = one(d.fieldNames())
        if (!cols.exists(_.name == name)) {
          require(d.ifExists() == java.lang.Boolean.TRUE,
            s"no column $name")
        } else {
          require(!cols.find(_.name == name).get.idx,
            s"cannot drop index column $name")
          cols = cols.filterNot(_.name == name)
          colMap = colMap - name
          defaults = defaults - name
        }
      case p: SetProperty if p.property() == "page_len" =>
        pageLenChange = Some(Some(parsePageLen(p.value())))
      case p: RemoveProperty if p.property() == "page_len" =>
        pageLenChange = Some(None)
      case other => throw new UnsupportedOperationException(
        s"graft ALTER TABLE supports ADD/RENAME/DROP COLUMN and " +
          s"SET/UNSET TBLPROPERTIES ('page_len'), got $other")
    }
    if (colsChanged) {
      require(cols.exists(!_.idx),
        "a graft series needs at least one value column")
      // a mixed ALTER (columns + page_len) commits as ONE registry
      // write inside alterCollection — all validations (value-column
      // require, the inline-rows drop guard) run before anything is
      // applied, so a failing column change cannot leave the property
      // half-applied (or vice versa)
      repo.alterCollection(clct, GSchema(cols, c.schema.kv), colMap,
        defaults, pageLenChange = pageLenChange)
    } else
      pageLenChange.foreach(pl => repo.alterPageLen(clct, pl))
    new GraftTable(rootUri, clct, ident.name(), None)
  }

  /** v2 Literal value (catalyst representation) -> kernel scalar */
  private def kernelOfLiteral(dt: GType, v: Any): Any = dt match {
    case GType.StrT => v.toString
    case GType.DateT => v.asInstanceOf[Number].longValue()
    case GType.FloatT => v.asInstanceOf[Number].doubleValue()
    case _ => v.asInstanceOf[Number].longValue() // int / ts-micros
  }

  override def dropTable(ident: Identifier): Boolean =
    repo.collection(collectionOf(ident.namespace())) match {
      case Some(c) if c.ls().contains(ident.name()) =>
        c.deleteSeries(ident.name()); true
      case _ => false
    }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    require(from.namespace().sameElements(to.namespace()),
      "graft series rename stays within its collection")
    repo.collection(collectionOf(from.namespace())) match {
      case None => throw new NoSuchTableException(from)
      case Some(c) =>
        if (!c.ls().contains(from.name()))
          throw new NoSuchTableException(from)
        if (c.ls().contains(to.name()))
          throw new TableAlreadyExistsException(to)
        c.renameSeries(from.name(), to.name())
    }
  }

  // ------------------------------------------------------------------
  // stored procedures: the maintenance verbs (CALL g.sys.defrag(...))
  // ------------------------------------------------------------------

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure =
    GraftProcedures.load(rootUri, ident)

  override def listProcedures(ns: Array[String]): Array[Identifier] =
    GraftProcedures.list(ns)

  // ------------------------------------------------------------------
  // namespaces = collections
  // ------------------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    repo.ls().map(Array(_)).toArray

  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    if (ns.isEmpty) listNamespaces()
    else if (ns.length == 1 && repo.collection(ns(0)).isDefined)
      Array.empty // collections have no children
    else throw new NoSuchNamespaceException(ns)

  override def loadNamespaceMetadata(ns: Array[String])
      : util.Map[String, String] =
    repo.collection(collectionOf(ns)) match {
      case None => throw new NoSuchNamespaceException(ns)
      case Some(c) => Map("schema" -> c.schema.serialize,
        "location" -> s"$rootUri/${c.path}").asJava
    }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && repo.collection(ns(0)).isDefined

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft collections carry a schema: CREATE TABLE " +
        s"$catalogName.<collection>.<series> (...) PARTITIONED BY " +
        "(<index>) creates the collection")

  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft collections have no alterable metadata")

  override def dropNamespace(ns: Array[String], cascade: Boolean)
      : Boolean =
    repo.collection(collectionOf(ns)) match {
      case None => false
      case Some(c) =>
        if (!cascade && c.ls().nonEmpty)
          throw new org.apache.spark.sql.catalyst.analysis
            .NonEmptyNamespaceException(ns)
        repo.deleteCollection(collectionOf(ns))
        true
    }
}
