package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport}
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter,
  PrimitiveConverter, RecordMaterializer}
import org.apache.parquet.schema.{MessageType, Types}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  Statistics, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Closed, ColDef, GType, GSchema, IndexKey,
  SegmentRead, SegmentWriter}
import graft.engine.SparkVals

/** `spark.read.format("graft")` — the SQL-first entry into the
  * engine: a DataSourceV2 TableProvider whose ScanBuilder receives
  * the query's pushed index-column predicates and drives MANIFEST
  * segment pruning with them, so a plain
  * `spark.sql("SELECT … WHERE ts < X")` over a registered graft
  * table opens only the covering segment files — the same pruning
  * the `Series.frame(start, stop)` API performs, now available to a
  * SQL user who never touches the Scala API (the mechanism Delta
  * uses for the same job: TableProvider + ScanBuilder).
  *
  * Options: `path` (repo root), `collection`, `series`,
  * `before` (optional time travel — epoch millis or ISO-8601, the
  * changelog revision clock of `Series.frame(beforeMs)`).
  *
  * Semantics = `Series.frame()`: overlay (splice-clipped segments
  * get their residual range filter applied IN the reader),
  * manifest-inline micro-segments served from the plan, clone
  * renames/defaults resolved per file. Pushed filters are used for
  * pruning and REMAIN residual — Spark re-applies every predicate
  * above the scan, so a partially-usable filter can never change
  * results.
  */
/** shared option parsing: errors NAME the option, timestamp options
  * accept the same forms everywhere (epoch millis, ISO instant, bare
  * local date/datetime read as UTC — the engine convention) */
private[sources] object GraftOptions {
  def epochMs(name: String, s: String): Long =
    try s.toLong
    catch {
      case _: NumberFormatException =>
        try java.time.Instant.parse(s).toEpochMilli // offset/Z forms
        catch {
          case _: java.time.format.DateTimeParseException =>
            val t = s.replace(" ", "T") match {
              case d if d.length == 10 => d + "T00:00:00"
              case d => d
            }
            try java.time.LocalDateTime.parse(t)
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
            catch {
              case _: java.time.format.DateTimeParseException =>
                throw new IllegalArgumentException(
                  s"graft: option '$name' must be epoch millis or an " +
                    s"ISO date/datetime, got '$s'")
            }
        }
    }

  def nonNegLong(name: String, s: String): Long = {
    val n = try java.lang.Long.parseLong(s)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft: option '$name' must be a non-negative integer, " +
            s"got '$s'") }
    require(n >= 0,
      s"graft: option '$name' must be a non-negative integer, got '$s'")
    n
  }
}

class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def resolve(options: CaseInsensitiveStringMap): GraftTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft: missing 'path' option"))
    val clct = Option(options.get("collection")).getOrElse(
      throw new IllegalArgumentException(
        "graft: missing 'collection' option"))
    val series = Option(options.get("series")).getOrElse("_")
    val beforeMs = Option(options.get("before"))
      .map(GraftOptions.epochMs("before", _))
    new GraftTable(path, clct, series, beforeMs)
  }

  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    resolve(new CaseInsensitiveStringMap(properties))
}

/** Driver-side planning state: segments are resolved from the
  * manifest lazily per scan, AFTER filters arrive. */
class GraftTable(rootUri: String, collectionName: String,
    seriesLabel: String, beforeMs: Option[Long])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog
      .SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog
      .SupportsMetadataColumns {

  private[sources] def series: graft.api.Series = {
    val spark = SparkSession.active
    val repo = new graft.api.Repo(rootUri, spark)
    val clct = repo.collection(collectionName).getOrElse(
      throw new IllegalArgumentException(
        s"graft: no collection '$collectionName' under $rootUri"))
    clct.series(seriesLabel)
  }

  private[sources] lazy val gschema: GSchema = series.collection.schema

  override def name(): String =
    s"graft.`$rootUri`.$collectionName.$seriesLabel"
  override def schema(): StructType = gschema.sparkSchema
  /** surfaced in DESCRIBE TABLE EXTENDED */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    series.collection.pageLenCfg.foreach(n =>
      m.put("page_len", n.toString))
    if (gschema.kv) m.put("kv", "true")
    m
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.STREAMING_WRITE)
  /** Hidden PROVENANCE column (the Iceberg/Delta `_file` idiom):
    * `SELECT _file, ...` surfaces the store-relative segment file
    * serving each row (null for manifest-inline micro-rows) — it
    * joins against the `.segments` metadata table's `files` for
    * surgical repair flows. Never stored, excluded from `SELECT *`
    * and writes; projected as a per-partition constant, no file IO. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = GraftPlanning.FileCol
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = true
      override def comment(): String =
        "store-relative segment file serving this row " +
          "(null for manifest-inline rows)"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftScanBuilder(this, beforeMs,
      options.getOrDefault("stream.starting", "earliest") == "latest",
      options.getOrDefault("stream.rewrites", "emit") == "skip",
      GraftOptions.nonNegLong("stream.maxRevisionsPerTrigger",
        options.getOrDefault("stream.maxRevisionsPerTrigger", "0")),
      Option(options.get("stream.startingTimestamp"))
        .map(GraftOptions.epochMs("stream.startingTimestamp", _)),
      // DEFAULT ON (round 12): along a linear history the frontier
      // holds exactly one head, so the offset and per-batch work are
      // identical to the single-anchor mode; a fork costs one
      // revision-id string per un-healed head (transient — the heal
      // collapses it) plus a cached manifest decode per head per
      // batch. Exactly-once across heals is what CDC consumers
      // assume; "false" opts back into the smaller at-least-once
      // offset for extreme fork widths.
      options.getOrDefault("stream.forkDedup", "true") == "true")
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWriteBuilder(this, info)

  /** SQL UPDATE / MERGE / rewrite-DELETE — group-based copy-on-write
    * over visible segment windows ([[GraftRowLevelOperation]]).
    * Index-range DELETEs still take the metadata-only SupportsDelete
    * route via Spark's OptimizeMetadataOnlyDeleteFromTable. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new GraftRowLevelOperation(this, info.command())

  // ---- SQL DELETE — the engine's native delete IS metadata-only
  // (a manifest tombstone row, no data job), so `DELETE FROM g WHERE
  // <index range>` maps 1:1 onto `Series.delete`. Accepted only when
  // the WHERE is EXACTLY expressible as tombstones: a conjunction of
  // comparisons forming one lexicographic interval over an index
  // prefix (equalities extend the prefix, the first range column
  // terminates it), or a single IN/= list on the head column (one
  // tombstone per value, one batched commit). Anything else — a
  // value-column predicate, disjunctions — is declined here and
  // falls back to the copy-on-write rewrite path
  // (GraftRowLevelOperation) via Spark's
  // OptimizeMetadataOnlyDeleteFromTable dichotomy: metadata-only
  // when exact, group rewrite otherwise, never silently wrong.
  // A one-sided range substitutes the manifest's
  // recorded extreme for the missing side (exact for the snapshot's
  // rows). DELETE without WHERE = truncate: one commit that drops the
  // series' manifest rows; history stays readable.

  private[sources] sealed trait DeletePlan
  private[sources] case object DeleteAll extends DeletePlan
  private[sources] case class DeleteRange(start: IndexKey,
      stop: IndexKey, closed: Closed) extends DeletePlan
  private[sources] case class DeleteKeys(values: Seq[Any])
      extends DeletePlan

  private[sources] def deletePlan(filters: Array[Filter])
      : Option[DeletePlan] = {
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (real.isEmpty) return Some(DeleteAll)
    val gs = gschema
    val head = gs.idx.head
    // IN / = list on the head column, as the only predicate
    real match {
      case Array(In(c, vs)) if c == head.name && vs.nonEmpty &&
          !vs.contains(null) =>
        return Some(DeleteKeys(vs.toSeq.map(v =>
          SparkVals.parseBound(head.dtype, v)).distinct))
      case _ => ()
    }
    // conjunction of comparisons over an index prefix
    final class B(val dt: GType) {
      var lo: Any = null; var loC = true
      var hi: Any = null; var hiC = true
      def k(v: Any): Any = SparkVals.parseBound(dt, v)
      def tighten(lo0: Any, loC0: Boolean, hi0: Any,
          hiC0: Boolean): Unit = {
        if (lo0 != null && (lo == null || dt.cmp(k(lo0), k(lo)) > 0 ||
            (dt.cmp(k(lo0), k(lo)) == 0 && !loC0))) {
          lo = lo0; loC = loC0
        }
        if (hi0 != null && (hi == null || dt.cmp(k(hi0), k(hi)) < 0 ||
            (dt.cmp(k(hi0), k(hi)) == 0 && !hiC0))) {
          hi = hi0; hiC = hiC0
        }
      }
      def eq: Boolean = lo != null && hi != null && loC && hiC &&
        dt.cmp(k(lo), k(hi)) == 0
    }
    val bounds = gs.idx.map(c => c.name -> new B(c.dtype)).toMap
    real.foreach {
      case GreaterThan(c, v) if bounds.contains(c) && v != null =>
        bounds(c).tighten(v, false, null, true)
      case GreaterThanOrEqual(c, v) if bounds.contains(c) && v != null =>
        bounds(c).tighten(v, true, null, true)
      case LessThan(c, v) if bounds.contains(c) && v != null =>
        bounds(c).tighten(null, true, v, false)
      case LessThanOrEqual(c, v) if bounds.contains(c) && v != null =>
        bounds(c).tighten(null, true, v, true)
      case EqualTo(c, v) if bounds.contains(c) && v != null =>
        bounds(c).tighten(v, true, v, true)
      case _ => return None // not exactly expressible — refuse
    }
    // eq-prefix, then at most ONE range column, nothing deeper
    val prefix = Vector.newBuilder[Any]
    var rangeCol: Option[B] = None
    var depth = 0
    val it = gs.idx.iterator
    var stop = false
    while (!stop && it.hasNext) {
      val b = bounds(it.next().name)
      if (b.eq) { prefix += b.k(b.lo); depth += 1 }
      else {
        if (b.lo != null || b.hi != null) rangeCol = Some(b)
        stop = true
      }
    }
    // any bound BELOW the terminating column is inexpressible
    val deeper = gs.idx.drop(depth + 1)
      .exists(c => bounds(c.name).lo != null || bounds(c.name).hi != null)
    if (deeper) return None
    val p = prefix.result()
    val (startK, closedL) = rangeCol match {
      case Some(b) if b.lo != null =>
        (IndexKey(p :+ b.k(b.lo)), b.loC)
      case _ if p.nonEmpty => (IndexKey(p), true)
      case _ => (null, true)
    }
    val (stopK, closedR) = rangeCol match {
      case Some(b) if b.hi != null =>
        (IndexKey(p :+ b.k(b.hi)), b.hiC)
      case _ if p.nonEmpty => (IndexKey(p), true)
      case _ => (null, true)
    }
    if (startK == null && stopK == null) return None
    Some(DeleteRange(startK, stopK,
      Closed.Both.setLeft(closedL).setRight(closedR)))
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    deletePlan(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit =
    deletePlan(filters) match {
      case None => throw new UnsupportedOperationException(
        s"graft DELETE needs an index-range WHERE; got " +
          filters.mkString(", "))
      case Some(p) =>
        val s = series
        s.collection.multi { applyDelete(s, p) } // one commit
    }

  /** execute a resolved delete plan (shared by SQL DELETE and the
    * replaceWhere overwrite commit — batchable inside multi()) */
  private[sources] def applyDelete(s: graft.api.Series,
      plan: DeletePlan): Unit = plan match {
    case DeleteAll =>
      // on the PASSED series: Collection.multi batching is
      // instance-scoped, so truncateTable()'s fresh resolution would
      // commit outside the enclosing batch
      s.collection.truncateWrite(s.label, Seq.empty)
    case DeleteKeys(vs) =>
      vs.foreach(v => s.delete(IndexKey(Vector(v)),
        IndexKey(Vector(v))))
    case DeleteRange(startK, stopK, closed) =>
      // one-sided range: substitute the manifest's recorded extreme
      // (exact for the rows this snapshot holds). Head/tail pruned
      // walks against ONE revision snapshot, NOT a full decode — a
      // one-sided DELETE against a 1e6-segment table must stay
      // O(touched) like every other planning path, and two
      // independent leaf reads could straddle a concurrent commit
      // into a [st, sp] window no snapshot ever held.
      val bounds =
        if (startK != null && stopK != null) null
        else s.collection.labelBoundsSnapshot(s.label, closed)
          .getOrElse(return)
      val st =
        if (startK != null) startK
        else {
          val head = bounds._1.filter(_.meta.hasData)
          if (head.isEmpty) return
          head.head.start
        }
      val sp =
        if (stopK != null) stopK
        else {
          val tail = bounds._2.filter(_.meta.hasData)
          if (tail.isEmpty) return
          tail.last.stop
        }
      if (gschema.cmpKey(st, sp) > 0) return // empty range: no-op
      s.delete(st, sp, closed)
  }

  override def truncateTable(): Boolean = {
    val s = series
    s.collection.truncateWrite(s.label, Seq.empty)
    true
  }
}

/** Test/diagnostic probe: records how the LAST planned graft scan
  * pruned (covering vs total manifest segments). */
object GraftScanProbe {
  @volatile var lastSegmentsScanned: Int = -1
  @volatile var lastSegmentsTotal: Int = -1
  @volatile var lastPushed: Seq[String] = Nil
  @volatile var lastLimit: Int = -1
  /** staged files sealed by the LAST connector batch write */
  @volatile var lastWriteFiles: Int = -1
  /** the LAST planned scan answered its aggregate from the manifest */
  @volatile var lastAggPushed: Boolean = false
  /** segments surviving the LAST runtime (DPP) filter, -1 = none ran */
  @volatile var lastRuntimeScanned: Int = -1
  /** the LAST COW scan's group selection was fully static (index
    * bound covered the whole condition; no runtime subquery planned) */
  @volatile var lastCowStatic: Boolean = false
  /** the LAST COW scan skipped the runtime group-filter subquery for
    * ECONOMY (candidate cover ≤ spark.graft.cow.runtimeFilterMinSegments
    * — rewriting every candidate is cheaper than the subquery that
    * would choose among them), NOT because exactness was claimed */
  @volatile var lastCowTinySkip: Boolean = false
  /** segments dropped by VALUE-column stats in the LAST planned scan */
  @volatile var lastStatSkipped: Int = -1
  /** decode-path counters (local-mode visible; diagnostics only) */
  val vectorizedOpens = new java.util.concurrent.atomic.AtomicLong
  val columnarFallbackOpens = new java.util.concurrent.atomic.AtomicLong
  val fallbackOpens = new java.util.concurrent.atomic.AtomicLong
}

class GraftScanBuilder(table: GraftTable, beforeMs: Option[Long],
    streamStartLatest: Boolean = false,
    streamSkipRewrites: Boolean = false,
    streamMaxRevs: Long = 0L,
    streamStartTs: Option[Long] = None,
    streamForkDedup: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  /** per-index-column bound state, tightest-seen (kernel-compared) */
  private final class ColBound(val dt: GType) {
    var lo: Any = null; var loClosed = true
    var hi: Any = null; var hiClosed = true
    def hasEq: Boolean = lo != null && hi != null && loClosed &&
      hiClosed && dt.cmp(k(lo), k(hi)) == 0
    private def k(v: Any) = SparkVals.parseBound(dt, v)
    def tighten(lo0: Any = null, loC: Boolean = true,
        hi0: Any = null, hiC: Boolean = true): Unit = {
      if (lo0 != null) {
        if (lo == null || dt.cmp(k(lo0), k(lo)) > 0 ||
            (dt.cmp(k(lo0), k(lo)) == 0 && !loC)) {
          lo = lo0; loClosed = loC
        }
      }
      if (hi0 != null) {
        if (hi == null || dt.cmp(k(hi0), k(hi)) < 0 ||
            (dt.cmp(k(hi0), k(hi)) == 0 && !hiC)) {
          hi = hi0; hiClosed = hiC
        }
      }
    }
  }

  private val idxCols: Seq[ColDef] = table.gschema.idx
  private val bounds: Map[String, ColBound] =
    idxCols.map(c => c.name -> new ColBound(c.dtype)).toMap
  // value-column bounds drive SEGMENT-STATS data skipping (the
  // manifest's per-segment value min/max) — no range structure, just
  // per-column disjointness tests
  private val vbounds: Map[String, ColBound] =
    table.gschema.cols.filterNot(_.idx)
      .map(c => c.name -> new ColBound(c.dtype)).toMap
  private var pushed: Array[Filter] = Array.empty
  private var required: Option[StructType] = None
  private var limitN: Option[Int] = None
  private var limitReversed = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = ArrayBuffer.empty[Filter]
    // predicates on ANY index column collect per-column bounds; the
    // lexicographic prefix assembly in build() uses columns 2..n only
    // below an unbroken run of equalities, matching what
    // `Series.frame`'s full-tuple pruning resolves. Value-column
    // comparisons collect bounds for stats-based skipping. The
    // `v != null` guards are unreachable after constant folding (a
    // null-literal comparison folds to null first) but keep a
    // hand-built filter from reaching SparkVals.parseBound.
    def on(c: String): Option[ColBound] =
      bounds.get(c).orElse(vbounds.get(c))
    filters.foreach {
      case f @ GreaterThan(c, v) if on(c).isDefined && v != null =>
        usable += f; on(c).get.tighten(lo0 = v, loC = false)
      case f @ GreaterThanOrEqual(c, v)
          if on(c).isDefined && v != null =>
        usable += f; on(c).get.tighten(lo0 = v, loC = true)
      case f @ LessThan(c, v) if on(c).isDefined && v != null =>
        usable += f; on(c).get.tighten(hi0 = v, hiC = false)
      case f @ LessThanOrEqual(c, v)
          if on(c).isDefined && v != null =>
        usable += f; on(c).get.tighten(hi0 = v, hiC = true)
      case f @ EqualTo(c, v) if on(c).isDefined && v != null =>
        usable += f
        on(c).get.tighten(lo0 = v, loC = true)
        on(c).get.tighten(hi0 = v, hiC = true)
      case f @ In(c, vs) if vbounds.contains(c) && vs.nonEmpty &&
          !vs.contains(null) =>
        // an IN list bounds the column by its own min/max — enough
        // for segment disjointness (membership stays residual)
        usable += f
        val dt = vbounds(c).dt
        def k(v: Any) = SparkVals.parseBound(dt, v)
        val raw = vs.toSeq
        val lo = raw.reduce((a, b) =>
          if (dt.cmp(k(a), k(b)) <= 0) a else b)
        val hi = raw.reduce((a, b) =>
          if (dt.cmp(k(a), k(b)) >= 0) a else b)
        vbounds(c).tighten(lo0 = lo, loC = true)
        vbounds(c).tighten(hi0 = hi, hiC = true)
      case _ => ()
    }
    pushed = usable.toArray
    filters // everything stays residual: Spark re-applies above scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  /** LIMIT k over the bare scan: the manifest's prefix-covering logic
    * answers it with the fewest leading segments (partial push — Spark
    * re-applies the limit above, so over-serving is safe). */
  override def pushLimit(limit: Int): Boolean = {
    limitN = Some(limit); true
  }
  override def isPartiallyPushed(): Boolean = true

  /** ORDER BY <idx prefix> LIMIT k: manifest order IS index order, so
    * an ascending top-k needs only the leading covering segments and a
    * descending one only the trailing (partial push — Spark still
    * sorts/limits the reduced input above the scan). */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{
      NamedReference, SortDirection}
    if (orders.isEmpty || orders.length > idxCols.length) return false
    val names = orders.map(_.expression() match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        r.fieldNames()(0)
      case _ => return false
    })
    if (!names.sameElements(idxCols.take(names.length).map(_.name)))
      return false
    val dirs = orders.map(_.direction()).distinct
    if (dirs.length != 1) return false
    limitN = Some(limit)
    limitReversed = dirs.head == SortDirection.DESCENDING
    true
  }

  /** `SELECT count(*) / min(idx) / max(idx) FROM g` answered from the
    * MANIFEST — no file IO at all, like Delta's metadata-only count.
    * Accepted only for ungrouped aggregates the metadata answers
    * EXACTLY: count(*) / count(non-null index col) = sum of visible
    * row lengths, min/max of the FIRST index column = the first/last
    * visible segment's recorded data bounds — and only when every
    * visible segment is fully visible (an overlay-clipped segment's
    * visible count/extremes are unknowable without reading it: the
    * whole aggregation is then rejected and planned as a normal
    * scan). Filtered queries never reach here: every WHERE stays a
    * residual post-scan filter, and Spark only offers aggregate
    * pushdown when no post-scan filters remain. */
  private var aggPush: Option[(StructType, Seq[Any])] = None

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = aggPush.isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (agg.groupByExpressions().nonEmpty) return false
    if (limitN.isDefined) return false
    val head = idxCols.head
    def headRef(e: org.apache.spark.sql.connector.expressions
        .Expression): Boolean = e match {
      case r: NamedReference => r.fieldNames().sameElements(
        Array(head.name))
      case _ => false
    }
    def idxRef(e: org.apache.spark.sql.connector.expressions
        .Expression): Boolean = e match {
      case r: NamedReference => r.fieldNames().length == 1 &&
        idxCols.exists(_.name == r.fieldNames()(0))
      case _ => false
    }
    // resolve the plan BEFORE accepting: any clipped segment rejects.
    // Plan-time snapshot = the query's snapshot (same beforeMs).
    val series = table.series
    val segs = series.segments(null, null, beforeMs)
      .filter(_.meta.hasData)
    if (!segs.forall(s => GraftPlanning.covers(table.gschema, s)))
      return false
    val cnt: java.lang.Long = segs.map(_.meta.length).sum
    // SUM over an integer value column answers from per-segment
    // recorded sums — exact (token budgets, counts) — when every
    // visible segment carries the entry and the column has no
    // registry DEFAULT (stored nulls would read as the default)
    def sumOf(e: org.apache.spark.sql.connector.expressions
        .Expression): Option[java.lang.Long] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        val n = r.fieldNames()(0)
        table.gschema.cols.find(c => c.name == n && !c.idx &&
          c.dtype == GType.IntT) match {
          case Some(_)
              if !series.collection.defaults.contains(n) =>
            val phys = series.collection.physOf(n)
            val per = segs.map(_.meta.vsums.flatMap(_.get(phys)))
            if (per.isEmpty || per.exists(_.isEmpty)) None
            else try Some(per.flatten
              .foldLeft(0L)((a, b) => Math.addExact(a, b)))
            catch { case _: ArithmeticException => None }
          case _ => None
        }
      case _ => None
    }
    def minHead: Any =
      segs.headOption.flatMap(_.meta.dataStart).map(k =>
        GraftRead.kernelToInternal(head.dtype, k.values(0))).orNull
    def maxHead: Any =
      segs.lastOption.flatMap(_.meta.dataStop).map(k =>
        GraftRead.kernelToInternal(head.dtype, k.values(0))).orNull
    val out = agg.aggregateExpressions().map {
      case _: CountStar =>
        Some((org.apache.spark.sql.types.StructField("count(*)",
          org.apache.spark.sql.types.LongType, nullable = false), cnt))
      case c: Count if !c.isDistinct && idxRef(c.column) =>
        // index columns are non-null by schema: count(col) = count(*)
        Some((org.apache.spark.sql.types.StructField("count",
          org.apache.spark.sql.types.LongType, nullable = false), cnt))
      case m: Min if headRef(m.column) =>
        Some((org.apache.spark.sql.types.StructField("min",
          head.dtype.sparkType, nullable = true), minHead))
      case m: Max if headRef(m.column) =>
        Some((org.apache.spark.sql.types.StructField("max",
          head.dtype.sparkType, nullable = true), maxHead))
      case s: Sum if !s.isDistinct =>
        sumOf(s.column).map(v =>
          (org.apache.spark.sql.types.StructField("sum",
            org.apache.spark.sql.types.LongType, nullable = true),
            v: Any))
      case _ => None
    }
    if (out.exists(_.isEmpty)) return false
    val resolved = out.flatten
    aggPush = Some((StructType(resolved.map(_._1)),
      resolved.map(_._2).toSeq))
    true
  }

  /** Assemble the lexicographic prefix bound: equalities on leading
    * index columns extend the prefix; the first non-equality column
    * contributes its own bound and terminates it (anything deeper
    * cannot prune without the full tuple — it stays residual). */
  private def prefixBound(lower: Boolean): (Seq[Any], Boolean) = {
    val prefix = Vector.newBuilder[Any]
    var closed = true
    var n = 0
    var stop = false
    val it = idxCols.iterator
    while (!stop && it.hasNext) {
      val b = bounds(it.next().name)
      if (b.hasEq) { prefix += b.lo; n += 1 }
      else {
        val (v, cl) = if (lower) (b.lo, b.loClosed) else (b.hi, b.hiClosed)
        if (v != null) { prefix += v; closed = cl; n += 1 }
        stop = true // anything deeper than the first range column
                    // cannot prune without the full tuple
      }
    }
    (if (n == 0) null else prefix.result(), closed)
  }

  override def build(): Scan = {
    val (startB, startClosed) = prefixBound(lower = true)
    val (stopB, stopClosed) = prefixBound(lower = false)
    val closed = Closed.Both.setLeft(startClosed).setRight(stopClosed)
    // value-column bounds, kernel-parsed: the stats-skipping query
    val vquery = vbounds.toSeq.flatMap { case (n, b) =>
      if (b.lo == null && b.hi == null) None
      else Some((n, b.dt,
        if (b.lo == null) null
        else SparkVals.parseBound(b.dt, b.lo), b.loClosed,
        if (b.hi == null) null
        else SparkVals.parseBound(b.dt, b.hi), b.hiClosed))
    }
    new GraftScan(table, startB, stopB, closed, beforeMs,
      aggPush.map(_._1).orElse(required).getOrElse(table.schema()),
      pushed.map(_.toString).toSeq, streamStartLatest,
      limitN, limitReversed, streamSkipRewrites, streamMaxRevs,
      aggPush, vquery, streamStartTs, streamForkDedup)
  }
}

class GraftScan(table: GraftTable, start: Any, stop: Any,
    closed: Closed, beforeMs: Option[Long], required: StructType,
    pushedDesc: Seq[String], streamStartLatest: Boolean = false,
    limit: Option[Int] = None, limitReversed: Boolean = false,
    streamSkipRewrites: Boolean = false,
    streamMaxRevs: Long = 0L,
    aggPush: Option[(StructType, Seq[Any])] = None,
    vquery: Seq[(String, GType, Any, Boolean, Any, Boolean)] = Nil,
    streamStartTs: Option[Long] = None,
    streamForkDedup: Boolean = false)
    extends Scan with Batch
    with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Per-PARTITION ordering, declared to Catalyst: every planned
    * partition serves one index-sorted segment file (or inline run),
    * and residual filters / default fills preserve that order — so
    * the scan reports the longest prefix of index columns that
    * survives column pruning, ascending (nulls-first, the engine's
    * index order). `RemoveRedundantSorts` then drops any
    * within-partition SortExec on the index (`sortWithinPartitions`,
    * local-sort requirements) — a GLOBAL `ORDER BY` keeps its
    * exchange+sort, since the scan reports no partitioning (range
    * segments are not a KeyGroupedPartitioning, and this Spark has
    * no single-partition shortcut for v2 scans). Top-k `ORDER BY idx
    * LIMIT k` is already served by the pushed-TopN prefix cover. */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions,
      SortDirection}
    val present = required.fieldNames.toSet
    table.gschema.idx.map(_.name).takeWhile(present.contains)
      .map(n => Expressions.sort(Expressions.column(n),
        SortDirection.ASCENDING)).toArray
  }

  /** Post-pruning statistics from the MANIFEST (no file IO): row
    * counts are recorded per segment at write time, so the join
    * planner sees the size of the data actually scanned — a graft
    * table filtered down to one segment broadcasts like the small
    * table it is. Clipped segments report their full stored length
    * (an upper bound — statistics are estimates). */
  override def estimateStatistics(): Statistics =
    GraftPlanning.manifestStatistics(plannedSegments, table.gschema)

  override def description(): String = {
    val segs = plannedSegments
    s"GraftScan ${table.name()} segments=${segs.length}/" +
      s"$totalSegments pushed=[${pushedDesc.mkString(", ")}]" +
      limit.map(l => s" limit=$l" +
        (if (limitReversed) " (desc)" else "")).getOrElse("") +
      (if (aggPush.isDefined) " agg=manifest" else "")
  }

  /** ONE resolution per scan: plannedSegments, planInputPartitions
    * and statistics all read the same changelog revision (a commit
    * landing mid-planning can never mix segment lists from one
    * revision with colMap/defaults from another), and the store
    * metadata loads once instead of once per planning step. */
  private lazy val resolvedSeries: graft.api.Series = table.series

  private lazy val (plannedSegments, totalSegments):
      (Seq[SegmentRead], Int) = {
    val s = resolvedSeries
    // O(touched), not O(manifest): enumerating every segment (and
    // thus parsing every manifest chunk) to display a denominator
    // made COLD planning against a 1e6-segment table pay the full
    // decode the bisected prune exists to avoid
    val total = s.segmentCountFast(beforeMs)
    val covering1 = s.segments(start, stop, beforeMs, closed)
      .filter(_.meta.hasData)
    // data skipping on VALUE-column stats: drop segments whose
    // recorded per-column (min, max) is disjoint from the query's
    // bounds. Columns with a registry DEFAULT are exempt: a stored
    // null reads back as the default through the coalesce fill, so
    // null-skipped stats can not bound what the reader sees there.
    val covering0 =
      if (vquery.isEmpty) covering1
      else {
        val clct = s.collection
        val q = vquery.filterNot(v => clct.defaults.contains(v._1))
          .map { case (n, dt, lo, loC, hi, hiC) =>
            (clct.physOf(n), dt, lo, loC, hi, hiC) }
        if (q.isEmpty) covering1
        else {
          val kept = covering1.filterNot { seg =>
            seg.meta.vstats.exists { vs =>
              q.exists { case (phys, dt, lo, loC, hi, hiC) =>
                vs.get(phys).exists { case (rmn, rmx) =>
                  val mn = graft.core.Manifest.kernelValue(dt, rmn)
                  val mx = graft.core.Manifest.kernelValue(dt, rmx)
                  (lo != null && (dt.cmp(mx, lo) < 0 ||
                    (dt.cmp(mx, lo) == 0 && !loC))) ||
                  (hi != null && (dt.cmp(mn, hi) > 0 ||
                    (dt.cmp(mn, hi) == 0 && !hiC)))
                }
              }
            }
          }
          GraftScanProbe.lastStatSkipped = covering1.length - kept.length
          kept
        }
      }
    // pushed LIMIT k: the shortest run of segments GUARANTEED to hold
    // ≥ k rows (manifest order = index order; ascending limits take
    // the leading run, descending top-k the trailing). Only fully
    // visible segments contribute guaranteed rows — an overlay-clipped
    // one counts 0, so the cover can only over-serve, never starve the
    // re-applied limit above the scan.
    val covering = limit match {
      case Some(k) =>
        val ordered =
          if (limitReversed) covering0.reverse else covering0
        val out = Seq.newBuilder[SegmentRead]
        var guaranteed = 0L
        val it = ordered.iterator
        while (guaranteed < k && it.hasNext) {
          val seg = it.next()
          out += seg
          if (GraftPlanning.covers(table.gschema, seg))
            guaranteed += seg.meta.length
        }
        val run = out.result()
        if (limitReversed) run.reverse else run
      case None => covering0
    }
    GraftScanProbe.lastSegmentsScanned = covering.length
    GraftScanProbe.lastSegmentsTotal = total
    GraftScanProbe.lastPushed = pushedDesc
    GraftScanProbe.lastLimit = limit.getOrElse(-1)
    (covering, total)
  }

  // ---- runtime filtering (DPP-style): a join's build side delivers
  // the head index column's value set AT RUNTIME; segments whose
  // recorded range contains none of the values drop before any file
  // opens. Pruning only — Spark still applies the join, so over-keep
  // is safe and the coarse head-component containment check suffices.
  private var runtimeKeep: Option[Seq[Any]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val head = table.gschema.idx.head.name
    // only offer the runtime-filter key while it survives column
    // pruning: Spark resolves these refs against the scan OUTPUT, so
    // naming a pruned-away column is an analysis error (surfaced by
    // metadata-only projections like `SELECT _file`)
    if (required.fieldNames.contains(head))
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(head))
    else Array.empty
  }

  override def filter(filters: Array[Filter]): Unit = {
    val head = table.gschema.idx.head.name
    val dt = table.gschema.idx.head.dtype
    val vals = filters.toSeq.flatMap {
      case In(c, vs) if c == head =>
        Some(vs.toSeq.filter(_ != null).map(v =>
          SparkVals.parseBound(dt, v)))
      case EqualTo(c, v) if c == head && v != null =>
        Some(Seq(SparkVals.parseBound(dt, v)))
      case _ => None
    }
    if (vals.nonEmpty) runtimeKeep = Some(vals.flatten.distinct)
  }

  private def runtimePruned(segs: Seq[SegmentRead]): Seq[SegmentRead] =
    runtimeKeep match {
      case None => segs
      case Some(vals) =>
        val dt = table.gschema.idx.head.dtype
        val kept = segs.filter { s =>
          val lo = s.start.values(0)
          val hi = s.stop.values(0)
          vals.exists(v => dt.cmp(v, lo) >= 0 && dt.cmp(v, hi) <= 0)
        }
        GraftScanProbe.lastRuntimeScanned = kept.length
        kept
    }

  // retained for createReaderFactory's columnar-eligibility decision
  // (Spark calls planInputPartitions before the factory on the same
  // Batch instance)
  @volatile private var plannedParts: Array[InputPartition] = null

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = aggPush match {
      case Some((_, values)) =>
        GraftScanProbe.lastAggPushed = true
        Array[InputPartition](GraftAggPartition(values.toVector))
      case None =>
        runtimePruned(plannedSegments).flatMap(seg =>
          GraftPlanning.partitionsFor(resolvedSeries, table.gschema,
            required.fields.map(_.name).toSeq, seg, null)).toArray
    }
    plannedParts = parts
    parts
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(table, required, streamStartLatest,
      streamSkipRewrites, streamMaxRevs, streamStartTs,
      streamForkDedup)

  override def createReaderFactory(): PartitionReaderFactory = {
    // COLUMNAR whenever every partition is a plain full-file decode
    // (no clip/defaults/projection/inline/agg work): whole
    // ColumnarBatches flow from the vectorized reader (or the
    // engine's page decoder for BSS files — the factory adapts per
    // file) into codegen's ColumnarToRow, skipping the per-row DSv2
    // iterator tax. Anything needing per-row work — boundary-clipped
    // range scans, clone defaults, `_file` — keeps the row path.
    val parts = plannedParts
    if (parts != null && GraftPlanning.columnarEligible(parts))
      GraftPlanning.columnarReaderFactory()
    else GraftPlanning.readerFactory()
  }
}

/** `INSERT INTO` / `df.write.format("graft").mode(...)` — the
  * DataSourceV2 write path into the engine. The physical shape is the
  * engine's own one-job bulk write ([[SegmentWriter.TaskSegmentWriter]]
  * per task: roll ≤ pageLen-row engine-format parquet files, return
  * per-file count/min/max/content-hash inline), so a SQL insert pays
  * exactly what `Series.write` pays: ONE distributed job, no read-back
  * scan, one metadata commit. Sorting is requested declaratively via
  * [[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]]
  * (Spark plans the range-shuffle + sort INSIDE the write job — the V2
  * counterpart of the API path's repartitionByRange), or skipped
  * entirely with `option("presorted", "true")`, which mirrors
  * `write(df, presorted = true)`: trusted but verified per row
  * in-task, with file-range disjointness re-checked at seal time.
  * `mode("overwrite")` (SupportsTruncate) replaces THIS series only —
  * a single commit whose manifest drops the series' rows and splices
  * the new ones, so other series in the collection and all history
  * (time travel) stay intact. Semantics = `Series.write` range
  * overlay; KV upsert merge is an API-only surface. */
class GraftWriteBuilder(table: GraftTable,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite {
  private var truncateMode = false
  private var overwritePlan: Option[table.DeletePlan] = None

  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    truncateMode = true; this
  }

  /** `df.writeTo(...).overwrite(cond)` / INSERT ... REPLACE WHERE —
    * Delta's replaceWhere for the versioned store: the condition must
    * be an index range (same algebra as SQL DELETE), and the commit
    * tombstones that range + splices the new rows atomically. The
    * written rows must FALL WITHIN the range (checked against the
    * staged files' bounds before anything commits) — the day-backfill
    * contract: replace exactly what you said you would. */
  override def overwrite(filters: Array[Filter])
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    table.deletePlan(filters) match {
      case Some(table.DeleteAll) => truncateMode = true
      case Some(r: table.DeleteRange) => overwritePlan = Some(r)
      case _ => throw new UnsupportedOperationException(
        s"graft overwrite needs an index-range condition (the range " +
          s"to replace); got ${filters.mkString(", ")}")
    }
    this
  }

  override def build(): org.apache.spark.sql.connector.write.Write = {
    // kv collections MERGE on write (first-wins upsert) — a plain
    // splice would silently skip the merge, so refuse rather than
    // diverge from the API's semantics
    require(!table.gschema.kv,
      "graft: kv (upsert) collections merge on write — use the " +
        "Series API (KVSeries.write); SQL INSERT cannot express it")
    val expect = table.gschema.sparkSchema
    val got = info.schema()
    require(got.length == expect.length &&
      got.fields.zip(expect.fields).forall { case (a, b) =>
        a.name == b.name && a.dataType == b.dataType },
      s"graft write schema mismatch: got ${got.simpleString}, " +
        s"table is ${expect.simpleString}")
    new GraftWrite(table,
      info.options().getBoolean("presorted", false), truncateMode,
      info.queryId(), overwritePlan)
  }
}

class GraftWrite(table: GraftTable, presorted: Boolean,
    truncate: Boolean, queryId: String = "",
    overwritePlan: Option[GraftTable#DeletePlan] = None)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write
      .RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution,
    Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions,
    SortDirection, SortOrder}

  private def idxOrders: Array[SortOrder] =
    table.gschema.idx.map(c => Expressions.sort(
      Expressions.column(c.name), SortDirection.ASCENDING)).toArray

  // presorted = the caller's declaration that the input is already
  // globally sorted (lakota's own write precondition): no shuffle, no
  // sort — the task-side order verify + seal-time disjointness check
  // still reject a false declaration before anything commits
  override def requiredDistribution(): Distribution =
    if (presorted) Distributions.unspecified()
    else Distributions.ordered(idxOrders)
  override def requiredOrdering(): Array[SortOrder] =
    if (presorted) Array.empty else idxOrders

  private def taskParams(): SegmentWriter.TaskParams = {
    val s = table.series
    val clct = s.collection
    val store = clct.repo.store
    val tmpRel = s"tmp/${graft.core.Hash.hextime()}-" +
      java.util.UUID.randomUUID().toString.take(12)
    SegmentWriter.TaskParams(table.gschema,
      table.gschema.names.map(clct.physOf).toIndexedSeq,
      tmpRel, store.uri(tmpRel), clct.pageLen,
      {
        val codec = clct.repo.spark.conf
          .get("spark.graft.segment.codec", "zstd")
        if (codec.toLowerCase(java.util.Locale.ROOT).endsWith("+bss"))
          clct.enableBss() // sticky read-routing hint
        codec
      },
      verifySorted = presorted, labeled = false)
  }

  override def toBatch
      : org.apache.spark.sql.connector.write.BatchWrite =
    new GraftBatchWrite(table, taskParams(), truncate, overwritePlan)

  /** `df.writeStream.format("graft")` — each micro-batch commits as
    * ONE engine revision (the same staged write + manifest splice the
    * batch path uses; the per-epoch shuffle+sort comes from this
    * Write's distribution requirement, honored by micro-batch plans).
    * Exactly-once visible state: a per-query marker file records the
    * last committed epoch, so a replayed epoch after restart is
    * skipped — and even inside the tiny commit-then-mark window, a
    * replayed commit splices identical content-addressed files over
    * the identical range, leaving the visible rows unchanged.
    * `outputMode("complete")` maps to the per-epoch series truncate. */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new GraftStreamingWrite(table, taskParams(), truncate, queryId)
}

/** per-task stats travel back in the commit message — the write's
  * ONLY metadata channel, exactly like the bulk job's collect */
final case class GraftCommitMessage(
    stats: Seq[SegmentWriter.FileStat])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class GraftBatchWrite(table: GraftTable,
    params: SegmentWriter.TaskParams, truncate: Boolean,
    overwritePlan: Option[GraftTable#DeletePlan] = None)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write.{DataWriterFactory,
    PhysicalWriteInfo, WriterCommitMessage}

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new GraftWriterFactory(params, new SegmentWriter.SerConf(
      SparkSession.active.sessionState.newHadoopConf()))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val stats = messages.toSeq.flatMap {
      case GraftCommitMessage(s) => s
      case other => throw new IllegalStateException(
        s"unexpected commit message: $other")
    }
    val series = table.series
    try overwritePlan match {
      case None => series.commitStaged(stats, truncate)
      case Some(plan) =>
        // replaceWhere: the written rows must fall within the
        // declared range — refuse before anything commits
        plan match {
          case r: table.DeleteRange if stats.nonEmpty =>
            val gs = table.gschema
            val mn = stats.map(_.min).reduce((a, b) =>
              if (gs.cmpKey(a, b) <= 0) a else b)
            val mx = stats.map(_.max).reduce((a, b) =>
              if (gs.cmpKey(a, b) >= 0) a else b)
            def inside: Boolean = {
              val okL = r.start == null || {
                val c = gs.cmpKey(mn, r.start)
                c > 0 || (c == 0 && r.closed.left)
              }
              val okR = r.stop == null || {
                val c = gs.cmpKey(mx, r.stop)
                c < 0 || (c == 0 && r.closed.right)
              }
              okL && okR
            }
            require(inside,
              s"graft overwrite: written rows [$mn, $mx] fall " +
                s"outside the replace range [${r.start}, ${r.stop}]")
          case _ => ()
        }
        series.collection.multi {
          table.applyDelete(series,
            plan.asInstanceOf[table.DeletePlan])
          series.commitStaged(stats, truncate = false)
        }
    }
    finally series.collection.repo.store.rm(params.tmpRel,
      recursive = true)
    GraftScanProbe.lastWriteFiles = stats.length
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    table.series.collection.repo.store.rm(params.tmpRel,
      recursive = true)
}

/** The streaming half of the connector write: per-epoch staging under
  * `<tmp>/e<epoch>`, one changelog commit per micro-batch, replayed
  * epochs skipped via the per-query marker (see GraftWrite.toStreaming
  * scaladoc for the exactly-once argument). */
class GraftStreamingWrite(table: GraftTable,
    base: SegmentWriter.TaskParams, truncate: Boolean, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingWrite {
  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo,
    WriterCommitMessage}

  // one resolution per streaming query, not per epoch store access
  private lazy val resolvedSeries = table.series
  private def store = resolvedSeries.collection.repo.store
  private val qdir =
    s"streams/${queryId.replaceAll("[^A-Za-z0-9-]", "_")}"
  // the CURRENT epoch's staging base (micro-batches are serial per
  // query). Each epoch gets a FRESH hextime-named dir: gc's staging
  // sweep ages dirs by their hextime prefix, so a long-running stream
  // must not reuse one base dir across epochs — the sweep would reap
  // it mid-flight once the query outlives the gc timeout.
  @volatile private var currentRel: String = base.tmpRel

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory = {
    val rel = s"tmp/${graft.core.Hash.hextime()}-" +
      java.util.UUID.randomUUID().toString.take(12)
    currentRel = rel
    new GraftStreamingWriterFactory(
      base.copy(tmpRel = rel, tmpUri = store.uri(rel)),
      new SegmentWriter.SerConf(
        SparkSession.active.sessionState.newHadoopConf()))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val marker = s"$qdir/e$epochId"
    try {
      if (store.exists(marker)) return // replayed epoch: already in
      val stats = messages.toSeq.flatMap {
        case GraftCommitMessage(s) => s
        case other => throw new IllegalStateException(
          s"unexpected commit message: $other")
      }
      val series = table.series
      if (stats.nonEmpty || truncate)
        series.commitStaged(stats, truncate)
      store.write(marker, Array.emptyByteArray)
      // only the latest epoch can replay after a restart — older
      // markers are dead weight
      store.rm(s"$qdir/e${epochId - 1}")
      GraftScanProbe.lastWriteFiles = stats.length
    } finally store.rm(currentRel, recursive = true)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    store.rm(currentRel, recursive = true)
}

class GraftStreamingWriterFactory(base: SegmentWriter.TaskParams,
    conf: SegmentWriter.SerConf)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
    val p = base.copy(tmpRel = s"${base.tmpRel}/e$epochId",
      tmpUri = s"${base.tmpUri}/e$epochId")
    new GraftDataWriter(
      new SegmentWriter.TaskSegmentWriter(p, conf.value, partitionId,
        taskId))
  }
}

class GraftWriterFactory(params: SegmentWriter.TaskParams,
    conf: SegmentWriter.SerConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftDataWriter(
      new SegmentWriter.TaskSegmentWriter(params, conf.value,
        partitionId, taskId))
}

class GraftDataWriter(tw: SegmentWriter.TaskSegmentWriter)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  override def write(row: InternalRow): Unit = tw.write(row)
  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage =
    GraftCommitMessage(tw.finish().map(_._2))
  override def abort(): Unit = tw.closeQuiet()
  override def close(): Unit = tw.closeQuiet()
}

/** Planning helpers shared by the batch scan and the micro-batch
  * stream: segment → InputPartitions, and the reader factory with
  * the task-side Hadoop conf Spark's parquet machinery needs. */
private[graft] object GraftPlanning {

  /** Manifest-derived Statistics (no file IO) shared by the regular
    * scan and the COW scan: recorded per-segment row counts times a
    * coarse per-dtype width. Clipped segments report their full
    * stored length (an upper bound — statistics are estimates). */
  def manifestStatistics(segs: => Seq[SegmentRead], gs: GSchema)
      : Statistics = new Statistics {
    private lazy val rows: Long = segs.map(_.meta.length).sum
    private val rowWidth: Long = gs.cols.map(_.dtype match {
      case GType.StrT => 24L
      case GType.DateT => 4L
      case _ => 8L
    }).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * rowWidth)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  def covers(gs: GSchema, s: SegmentRead): Boolean =
    (s.meta.dataStart, s.meta.dataStop) match {
      case (Some(ds), Some(de)) =>
        val l = gs.cmpKey(s.start, ds)
        val r = gs.cmpKey(s.stop, de)
        (l < 0 || (l == 0 && s.closed.left)) &&
          (r > 0 || (r == 0 && s.closed.right))
      case _ => false
    }

  /** the hidden provenance metadata column (SupportsMetadataColumns):
    * the store-relative segment file serving each row (null for
    * manifest-inline rows) — joinable against `.segments`.files */
  val FileCol = "_file"

  /** Partitions for one visible segment. `onlyFiles` (null = all)
    * restricts a multi-file segment row to a subset — the streaming
    * diff uses it to serve just the NEWLY-appeared files of a row.
    * Residual clip needs the index values even when pruned away:
    * read (requested ∪ index-if-clipping), emit requested positions.
    * A requested `_file` metadata column is never read from parquet:
    * it projects as a per-partition constant (outPos sentinel -1).
    */
  def partitionsFor(s: graft.api.Series, gs: GSchema,
      reqNames0: Seq[String], seg: SegmentRead,
      onlyFiles: Set[String]): Seq[InputPartition] = {
    val clct = s.collection
    val clip = !covers(gs, seg)
    val dataReq = reqNames0.filterNot(_ == FileCol)
    // `SELECT _file` alone still needs one stored column to drive
    // row iteration
    val reqNames =
      if (dataReq.isEmpty && reqNames0.nonEmpty) Seq(gs.idxNames.head)
      else dataReq
    val readNames =
      if (clip) (reqNames ++ gs.idxNames.filterNot(reqNames.contains))
      else reqNames
    val cols = readNames.map(n => gs(n))
    val outPos = reqNames0.map(n =>
      if (n == FileCol) -1 else readNames.indexOf(n)).toArray
    // only meaningful when clipping (idx cols are then in readNames)
    val idxPos =
      if (clip) gs.idxNames.map(readNames.indexOf).toArray
      else Array.empty[Int]
    val defaults = readNames.map(n => clct.defaults.get(n).orNull)
    val bounds =
      if (clip) GraftClip(seg.start, seg.stop, seg.closed) else null
    if (seg.meta.inline.isDefined) {
      val srcCols = gs.cols.filterNot(c =>
        clct.defaults.contains(c.name)).map(_.name)
      Seq(GraftInlinePartition(seg.meta.inline.get,
        srcCols.toVector, readNames.toVector,
        cols.map(_.dtype.name).toVector,
        defaults.toVector, outPos, idxPos, bounds))
    } else seg.meta.files
      .filter(f => onlyFiles == null || onlyFiles.contains(f))
      .map { f =>
        GraftFilePartition(clct.repo.store.uri(f),
          readNames.toVector, cols.map(n => clct.physOf(n.name)).toVector,
          cols.map(_.dtype.name).toVector, defaults.toVector,
          outPos, idxPos, bounds, fileLabel = f)
      }
  }

  def readerFactory(): PartitionReaderFactory =
    new GraftReaderFactory(serConf())

  /** Columnar serving is planned only when EVERY partition is a plain
    * full-file decode: no clip, no defaults, identity projection, no
    * `_file` column, no inline rows — anything needing per-row work
    * routes the whole scan row-based. */
  private[sources] def columnarEligible(
      parts: Array[InputPartition]): Boolean =
    parts.nonEmpty && parts.forall {
      case fp: GraftFilePartition =>
        fp.clip == null && fp.readNames.nonEmpty &&
          fp.defaults.forall(_ == null) &&
          fp.outPos.length == fp.readNames.length &&
          fp.outPos.indices.forall(i => fp.outPos(i) == i)
      case _ => false
    }

  private[sources] def columnarReaderFactory(): PartitionReaderFactory =
    new GraftColumnarReaderFactory(serConf())

  private def serConf(): SegmentWriter.SerConf = {
    val session = SparkSession.active
    val c = session.sessionState.newHadoopConf()
    // the entries Spark's parquet reader machinery
    // (ParquetReadSupport / ParquetToSparkSchemaConverter /
    // VectorizedParquetRecordReader) resolves from the TASK-side
    // Hadoop conf — newHadoopConf only carries EXPLICITLY-set SQL
    // entries, so mirror the session-resolved values here exactly
    // like ParquetFileFormat.buildReaderWithPartitionValues does
    import org.apache.spark.sql.internal.SQLConf
    val sc = session.sessionState.conf
    Seq(SQLConf.CASE_SENSITIVE, SQLConf.PARQUET_BINARY_AS_STRING,
      SQLConf.PARQUET_INT96_AS_TIMESTAMP,
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
      SQLConf.LEGACY_PARQUET_NANOS_AS_LONG,
      SQLConf.PARQUET_FIELD_ID_READ_ENABLED)
      .foreach(e => c.set(e.key, sc.getConf(e).toString))
    c.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet" +
        ".ParquetReadSupport")
    new SegmentWriter.SerConf(c)
  }

  /** DataFrame over engine partitions decoded by the connector's own
    * readers ([[GraftFileReader]]/[[GraftInlineReader]]) — the scan
    * [[graft.api.Series.frame]] routes BSS-mode segments through:
    * Spark's builtin parquet source cannot decode BYTE_STREAM_SPLIT
    * pages (no vectorized BSS reader, no per-relation row-mode
    * toggle), while GraftFileReader flips to its parquet-mr row
    * fallback on the first-batch encoding failure. Rows arrive in
    * `schema` order (partitionsFor bakes clip/renames/defaults). */
  def internalScan(spark: SparkSession, parts: Seq[InputPartition],
      schema: StructType): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.GraftBridge.internalDf(spark,
      new GraftFileRDD(spark.sparkContext, parts, readerFactory()),
      schema)

  /** DataFrame over the engine readers as an ANONYMOUS DSv2 relation
    * — unlike [[internalScan]]'s LogicalRDD, this participates in
    * Catalyst column pruning: an aggregate over one column of a
    * BSS-mode frame() decodes one column, not the whole schema
    * (partitions are re-planned with the pruned name set, so the
    * page-level decode itself narrows, same as the builtin parquet
    * source's ReadSchema). */
  def internalScanTable(spark: SparkSession, s: graft.api.Series,
      gs: GSchema, segs: Seq[SegmentRead])
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.GraftBridge.internalDsv2(spark,
      new GraftSegmentsTable(s, gs, segs))
}

/** Anonymous single-use DSv2 table over a fixed set of segment reads
  * (the BSS-mode [[graft.api.Series.frame]] scan) — see
  * [[GraftPlanning.internalScanTable]]. Driver-side objects (Series,
  * SegmentReads) never leave the driver; only the planned
  * [[InputPartition]]s ship. */
private final class GraftSegmentsTable(s: graft.api.Series,
    gs: GSchema, segs: Seq[SegmentRead]) extends Table
    with SupportsRead {
  override def name(): String = s"graft_segments_${s.label}"
  override def schema(): StructType = gs.sparkSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap)
      : ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var req: Seq[String] = gs.names
      override def pruneColumns(st: StructType): Unit = {
        req = st.fieldNames.toSeq
        ()
      }
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = StructType(
          req.map(n => org.apache.spark.sql.types.StructField(
            n, gs(n).dtype.sparkType, nullable = true)))
        override def toBatch: Batch = this
        private lazy val parts: Array[InputPartition] =
          segs.flatMap(sr =>
            GraftPlanning.partitionsFor(s, gs, req, sr, null)).toArray
        // COLUMNAR when every partition is a plain full-file decode:
        // row-group batches feed Spark's codegen'd ColumnarToRow
        // directly, skipping the per-row DSv2 iterator tax.
        override def planInputPartitions(): Array[InputPartition] = parts
        override def createReaderFactory(): PartitionReaderFactory =
          if (GraftPlanning.columnarEligible(parts))
            GraftPlanning.columnarReaderFactory()
          else GraftPlanning.readerFactory()
      }
    }
}

private final case class GraftRddPartition(index: Int,
    part: InputPartition) extends org.apache.spark.Partition

/** RDD over connector [[InputPartition]]s — see
  * [[GraftPlanning.internalScan]]. The reader factory ships to tasks
  * (it carries only a serializable Hadoop conf). */
class GraftFileRDD(
    @transient private val sc: org.apache.spark.SparkContext,
    @transient private val parts: Seq[InputPartition],
    factory: PartitionReaderFactory)
    extends org.apache.spark.rdd.RDD[InternalRow](sc, Nil) {
  override def getPartitions: Array[org.apache.spark.Partition] =
    parts.zipWithIndex.map { case (p, i) =>
      GraftRddPartition(i, p): org.apache.spark.Partition }.toArray
  override def compute(split: org.apache.spark.Partition,
      ctx: org.apache.spark.TaskContext): Iterator[InternalRow] = {
    val r = factory.createReader(
      split.asInstanceOf[GraftRddPartition].part)
    ctx.addTaskCompletionListener[Unit](_ => r.close())
    new Iterator[InternalRow] {
      private var ready = false
      private var done = false
      override def hasNext: Boolean = {
        if (!ready && !done) { ready = r.next(); done = !ready }
        ready
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException("graft rdd")
        ready = false
        // readers reuse row/batch buffers; downstream operators may
        // hold references across next() calls
        r.get().copy()
      }
    }
  }
}

/** Streaming offset: ordinal into the collection's LINEARIZED
  * changelog plus the revision id at that ordinal. The id is the
  * stable anchor: if a concurrent branch's revisions interleave into
  * the linearization (shifting ordinals), the offset still resolves
  * to the same revision by id; the ordinal is the fallback when the
  * anchored revision was trimmed/squashed away. */
final case class GraftStreamOffset(n: Long, rev: String,
    heads: Vector[String] = Vector.empty)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    if (heads.isEmpty) s"""{"n":$n,"rev":"$rev"}"""
    else s"""{"n":$n,"rev":"$rev","heads":[""" +
      heads.map(h => "\"" + h + "\"").mkString(",") + "]}"
}

/** `spark.readStream.format("graft")` — the versioned store as a
  * CDC-style streaming source. Offsets are ordinals into the
  * series' linearized changelog; each micro-batch serves the rows of
  * segment FILES newly referenced by the end revision's manifest
  * versus the start revision's (plus manifest rows not present
  * before — inline micro-writes), clipped to their visibility at the
  * end revision. Append workloads stream exactly once; an overlay
  * REWRITE streams its new rows (and a splice-truncated inline row
  * re-emits its surviving remainder — documented CDC semantics, not
  * a replay bug). `option("stream.starting", "latest")` skips
  * history; the default replays the full series.
  *
  * Rewrite contract (MIGRATION.md "Streaming CDC"): by default a
  * compaction (defrag/squash-style commit that rewrites existing rows
  * into new files) RE-EMITS those rows — at-least-once with replay on
  * compaction — and range deletes never surface (no tombstone
  * events). The same at-least-once bound applies across HEALED
  * CONCURRENT-WRITER FORKS: batches diff consecutive manifests along
  * the DFS linearization, and a merge commit re-references the
  * sibling branch's files, so a batch window straddling the branch
  * point can serve a file twice (exactly-once holds along any linear
  * history); `option("stream.forkDedup", "true")` upgrades forked
  * histories to exactly-once — the offset then carries the whole
  * leaf FRONTIER and the served set diffs against every drained
  * branch. `option("stream.rewrites", "skip")` suppresses the
  * replay: a commit is classified as compaction from MANIFEST
  * METADATA ONLY — every affected series keeps an identical merged
  * visible-window cover and total row count, with everything fully
  * visible on both sides — and its newly-referenced files/inline rows
  * are not served. An overlay update that preserves exactly its
  * range's row count and bounds is indistinguishable from compaction
  * at the metadata level and is ALSO skipped in this mode: skip is
  * for append+compact workloads; value-rewriting workloads keep the
  * default. The reference has no streaming surface at all; this
  * reuses the batch connector's partitions and readers wholesale. */
class GraftMicroBatchStream(table: GraftTable, required: StructType,
    startingLatest: Boolean, skipRewrites: Boolean = false,
    maxRevsPerTrigger: Long = 0L,
    startingTs: Option[Long] = None,
    forkDedup: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming
      .MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset,
    ReadLimit}

  // one resolution per stream; the changelog refreshes per poll
  private lazy val series = table.series
  private def changelog = series.collection.changelog

  private def logNow(): Seq[graft.core.Revision] = {
    changelog.refresh()
    changelog.log()
  }

  /** leaves of a log SLICE: children with no child inside the slice
    * (distinct — a merge leaf appears once per PARENT EDGE in the
    * changelog, and duplicate head ids would make frontierManifests
    * resolve, and a meta-keyed dedup serve, the same manifest twice) */
  private def headsOf(log: Seq[graft.core.Revision]): Vector[String] = {
    val parents = log.map(_.parent).toSet
    log.collect { case r if !parents.contains(r.child) => r.child }
      .distinct.toVector
  }

  private def offsetAt(log: Seq[graft.core.Revision]): GraftStreamOffset =
    GraftStreamOffset(log.length.toLong,
      log.lastOption.map(_.child).getOrElse(""),
      if (forkDedup) headsOf(log) else Vector.empty)

  /** resolve an offset to a revision: by id first (stable under
    * linearization shifts), by ordinal as fallback */
  private def revisionOf(o: GraftStreamOffset)
      : Option[graft.core.Revision] = {
    if (o.n <= 0) return None
    val log = changelog.log()
    log.find(_.child == o.rev)
      .orElse(log.take(math.min(o.n, log.length.toLong).toInt)
        .lastOption)
  }

  private def manifestOf(o: GraftStreamOffset)
      : Option[graft.core.Manifest] =
    revisionOf(o).map(series.collection.decodeCached)

  override def latestOffset(): Offset = offsetAt(logNow())

  /** Admission control — `option("stream.maxRevisionsPerTrigger", n)`
    * caps how many changelog revisions one micro-batch may span (the
    * Delta `maxFilesPerTrigger` idiom, on the revision clock): a
    * restart after a long pause then drains its backlog in BOUNDED
    * batches (each a bounded per-batch MERGE target / checkpoint
    * unit) instead of one giant catch-up batch. Default 0 = all
    * available. Works under Trigger.AvailableNow: the wrapper keeps
    * issuing batches until the captured target offset is reached. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Trigger.AvailableNow: capture the drain TARGET once at query
    * start; every capped batch then advances toward it (never past
    * it) until the wrapper sees the target reached and terminates —
    * without this, AvailableNow degrades to a single batch and a
    * capped stream would stop early. */
  @volatile private var availableNowTarget: Option[GraftStreamOffset] =
    None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(offsetAt(logNow()))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val log0 = logNow()
    // under AvailableNow, never plan past the captured target
    val log = availableNowTarget match {
      case Some(t) if t.n > 0 =>
        val i = log0.indexWhere(_.child == t.rev)
        if (i >= 0) log0.take(i + 1)
        else log0.take(math.min(t.n, log0.length.toLong).toInt)
      case Some(_) => Vector.empty[graft.core.Revision]
      case None => log0
    }
    val s = start.asInstanceOf[GraftStreamOffset]
    if (maxRevsPerTrigger <= 0) return offsetAt(log)
    // anchor the start POSITION on the revision id (stable under
    // linearization shifts from healed forks/trims), ordinal as
    // fallback; cap the advance without Long overflow
    val pos: Long =
      if (s.n <= 0) 0L
      else {
        val i = log.indexWhere(_.child == s.rev)
        if (i >= 0) i + 1L else math.min(s.n, log.length.toLong)
      }
    val cap = math.min(maxRevsPerTrigger, Int.MaxValue.toLong)
    val end = math.min(log.length.toLong, pos + cap)
    if (end <= pos) GraftStreamOffset(s.n, s.rev, s.heads) // caught up
    else GraftStreamOffset(end, log(end.toInt - 1).child,
      if (forkDedup) headsOf(log.take(end.toInt)) else Vector.empty)
  }
  override def reportLatestOffset(): Offset = offsetAt(logNow())

  /** `option("stream.startingTimestamp", epochMs)` starts the CDC
    * feed AFTER the revisions already committed before that instant
    * on the changelog clock (the batch reader's `before` convention:
    * `log(Some(ms))` = history visible at ms) — the Delta
    * startingTimestamp idiom. Mutually sensible with
    * `stream.starting=latest`, which wins if both are set. */
  override def initialOffset(): Offset =
    if (startingLatest) offsetAt(logNow())
    else startingTs match {
      case Some(ms) =>
        changelog.refresh()
        // anchor on the last pre-cut revision's ID, with its ordinal
        // taken from the FULL linearization (log(Some(ms)) filters a
        // DFS order, so count and position can disagree on a forked
        // history)
        changelog.log(Some(ms)).lastOption match {
          case None => GraftStreamOffset(0L, "")
          case Some(r) =>
            val full = changelog.log()
            val i = full.indexWhere(_.child == r.child)
            GraftStreamOffset(if (i >= 0) i + 1L else 1L, r.child)
        }
      case None => GraftStreamOffset(0L, "")
    }
  override def deserializeOffset(json: String): Offset = {
    val n = "\"n\":(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(0L)
    val rev = "\"rev\":\"([^\"]*)\"".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    val heads = "\"heads\":\\[([^\\]]*)\\]".r.findFirstMatchIn(json)
      .map(m => "\"([^\"]*)\"".r.findAllMatchIn(m.group(1))
        .map(_.group(1)).toVector)
      .getOrElse(Vector.empty)
    GraftStreamOffset(n, rev, heads)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** merged visible-window cover + total row count for one series of
    * a manifest — None when any row is overlay-clipped (its visible
    * length is unknowable from metadata alone, so a commit touching
    * it is never classified as compaction). The merged cover makes
    * the signature partition-independent: N small contiguous rows and
    * the one page-sized row defrag rewrote them into hash equal. */
  private def compactionSig(m: graft.core.Manifest, label: String)
      : Option[(Vector[(String, Boolean, String, Boolean)], Long)] = {
    val gs = table.gschema
    val segs = m.segments(label).filter(_.meta.hasData)
    if (!segs.forall(s => GraftPlanning.covers(gs, s))) return None
    // key-adjacent both-closed windows ([0,999] then [1000,…]) merge
    // too when the last index component is a DISCRETE dtype (int /
    // timestamp-micros / date-days — every engine dtype except float
    // and string): defrag's one output window [0,4999] must hash
    // equal to the five input windows it replaced
    def isSuccessor(a: graft.core.IndexKey,
        b: graft.core.IndexKey): Boolean = {
      val n = gs.idx.length
      if (a.values.length != n || b.values.length != n || n == 0)
        return false
      var i = 0
      while (i < n - 1) {
        if (gs.idx(i).dtype.cmp(a.values(i), b.values(i)) != 0)
          return false
        i += 1
      }
      gs.idx(n - 1).dtype match {
        case GType.FloatT | GType.StrT => false
        case _ => (a.values(n - 1), b.values(n - 1)) match {
          case (x: java.lang.Long, y: java.lang.Long) => y == x + 1L
          case _ => false
        }
      }
    }
    val merged = ArrayBuffer
      .empty[(graft.core.IndexKey, Boolean, graft.core.IndexKey, Boolean)]
    segs.foreach { s =>
      val contiguous = merged.nonEmpty && {
        val last = merged.last
        (gs.cmpKey(last._3, s.start) == 0 &&
          (last._4 || s.closed.left)) ||
          (last._4 && s.closed.left && isSuccessor(last._3, s.start))
      }
      if (contiguous) {
        val last = merged.last
        merged(merged.length - 1) =
          (last._1, last._2, s.stop, s.closed.right)
      } else merged += ((s.start, s.closed.left, s.stop, s.closed.right))
    }
    Some((merged.map(w =>
      (w._1.toString, w._2, w._3.toString, w._4)).toVector,
      segs.map(_.meta.length).sum))
  }

  /** files + inline rows introduced by commits in (a, b] that the
    * metadata classifies as pure compaction (see class doc) */
  private def compactionArtifacts(a: GraftStreamOffset,
      b: GraftStreamOffset)
      : (Set[String], Set[graft.core.SegmentMeta]) = {
    val log = changelog.log()
    // anchor window positions on revision IDs (stable under healed
    // forks / trims), ordinals as fallback — mirrors latestOffset
    def posOf(o: GraftStreamOffset): Int =
      if (o.n <= 0) 0
      else {
        val i = log.indexWhere(_.child == o.rev)
        if (i >= 0) i + 1
        else math.min(o.n, log.length.toLong).toInt
      }
    val lo = posOf(a)
    val hi = posOf(b)
    var files = Set.empty[String]
    var inline = Set.empty[graft.core.SegmentMeta]
    var prev: Option[graft.core.Manifest] =
      if (lo == 0) None
      else Some(series.collection.decodeCached(log(lo - 1)))
    (lo until hi).foreach { i =>
      val cur = series.collection.decodeCached(log(i))
      val prevRows = prev.map(_.rows.toSet).getOrElse(Set.empty)
      val labels = (cur.rows.map(_.label) ++
        prev.toSeq.flatMap(_.rows.map(_.label))).distinct.filter { l =>
        cur.rows.filter(_.label == l) !=
          prev.map(_.rows.filter(_.label == l)).getOrElse(Vector.empty)
      }
      val isCompaction = labels.nonEmpty && prev.isDefined &&
        labels.forall { l =>
          val s1 = compactionSig(prev.get, l)
          val s2 = compactionSig(cur, l)
          s1.isDefined && s1 == s2
        }
      if (isCompaction) {
        val prevFiles = prev.map(_.allFiles).getOrElse(Set.empty)
        cur.rows.filterNot(prevRows.contains).foreach { r =>
          files ++= r.files.filterNot(prevFiles.contains)
          if (r.inline.isDefined) inline += r
        }
      }
      prev = Some(cur)
    }
    (files, inline)
  }

  /** resolve an offset's FRONTIER to manifests: every head by id
    * (trimmed heads drop out), falling back to the single anchored
    * revision when no head resolves — pre-forkDedup checkpoints have
    * no heads and land there too */
  private def frontierManifests(o: GraftStreamOffset)
      : Seq[graft.core.Manifest] =
    if (forkDedup && o.heads.nonEmpty) {
      val byId = changelog.log().map(r => r.child -> r).toMap
      val ms = o.heads.flatMap(h => byId.get(h))
        .map(series.collection.decodeCached)
      if (ms.nonEmpty) ms else manifestOf(o).toSeq
    } else manifestOf(o).toSeq

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val a = start.asInstanceOf[GraftStreamOffset]
    val b = end.asInstanceOf[GraftStreamOffset]
    if (b.n <= a.n && b.rev == a.rev && b.heads == a.heads)
      return Array.empty
    // forkDedup: the served set is the union over the start offset's
    // whole FRONTIER (every leaf already drained), so a heal that
    // re-references a sibling branch's files diffs them away instead
    // of replaying them — exactly-once across healed forks, for the
    // price of a multi-head offset
    val endMs = frontierManifests(b)
    if (endMs.isEmpty) return Array.empty
    val startMs = frontierManifests(a)
    val label = series.label
    val (skipFiles, skipInline) =
      if (skipRewrites) compactionArtifacts(a, b)
      else (Set.empty[String], Set.empty[graft.core.SegmentMeta])
    val prevFiles: Set[String] =
      startMs.flatMap(_.allFiles).toSet ++ skipFiles
    val prevRows: Set[graft.core.SegmentMeta] =
      startMs.flatMap(_.rows.filter(_.label == label)).toSet ++
        skipInline
    val gs = table.gschema
    val reqNames = required.fields.map(_.name).toSeq
    // A ROW present on TWO end heads (e.g. both sides of a fork
    // inherited it) must still be served once — dedup by the
    // SegmentMeta (window + files), NEVER by bare file name: one
    // file legitimately backs TWO visible windows of one manifest
    // (a batch spanning a write plus a middle overlay/delete leaves
    // truncated rows [lo,a) and [b,hi) sharing the original file),
    // and a file-keyed set would silently drop the second window's
    // rows from the stream. Residual at-least-once corner (forkDedup
    // only): two UN-HEALED heads carrying DIVERGENT truncations of a
    // file written in the same batch (A's [0,80)+[120,200) vs B's
    // untouched [0,200)) serve the overlap from both heads — distinct
    // metas, so no sound dedup exists short of per-row interval
    // bookkeeping; never loses, and the heal's merge resolves the
    // windows before any later batch.
    var servedRows = Set.empty[graft.core.SegmentMeta]
    var servedInline = Set.empty[graft.core.SegmentMeta]
    endMs.flatMap { endM =>
      endM.rows.filter(r => r.label == label && r.hasData).flatMap {
        meta =>
          val seg = SegmentRead(meta, meta.start, meta.stop, meta.closed)
          if (meta.inline.isDefined) {
            if (prevRows.contains(meta) || servedInline.contains(meta))
              Nil
            else {
              servedInline += meta
              GraftPlanning.partitionsFor(series, gs, reqNames, seg,
                null)
            }
          } else {
            val fresh = meta.files.filterNot(prevFiles.contains).toSet
            if (fresh.isEmpty || servedRows.contains(meta)) Nil
            else {
              servedRows += meta
              GraftPlanning.partitionsFor(series, gs, reqNames, seg,
                fresh)
            }
          }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftPlanning.readerFactory()
}

/** residual overlay-clip bounds, evaluated per row in the reader */
final case class GraftClip(start: IndexKey, stop: IndexKey,
    closed: Closed) extends Serializable

final case class GraftFilePartition(uri: String,
    readNames: Vector[String], physNames: Vector[String],
    dtypeNames: Vector[String], defaults: Vector[Any],
    outPos: Array[Int], idxPos: Array[Int], clip: GraftClip,
    /** store-relative segment path served as the `_file` metadata
      * column (joins against `.segments`.files) */
    fileLabel: String = "")
    extends InputPartition

final case class GraftInlinePartition(rows: Vector[Vector[Any]],
    srcCols: Vector[String], readNames: Vector[String],
    dtypeNames: Vector[String], defaults: Vector[Any],
    outPos: Array[Int], idxPos: Array[Int], clip: GraftClip)
    extends InputPartition

/** one pre-computed row: the manifest-answered aggregate (values are
  * already in InternalRow representation) */
final case class GraftAggPartition(values: Vector[Any])
    extends InputPartition

class GraftReaderFactory(conf: SegmentWriter.SerConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case fp: GraftFilePartition => new GraftFileReader(fp, conf)
    case ip: GraftInlinePartition => new GraftInlineReader(ip)
    case ap: GraftAggPartition =>
      new PartitionReader[InternalRow] {
        private var served = false
        override def next(): Boolean =
          if (served) false else { served = true; true }
        override def get(): InternalRow =
          new GenericInternalRow(ap.values.toArray)
        override def close(): Unit = ()
      }
  }
}

private object GraftRead {
  def dtypeOf(name: String): GType =
    GType.all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"bad dtype $name"))

  /** Files whose pages the vectorized reader has ALREADY failed to
    * decode (BYTE_STREAM_SPLIT): the probe open + first-batch throw
    * costs a footer parse and reader init per attempt, so repeat
    * reads skip straight to the engine's page decoder. Sound because
    * segment files are content-addressed — a URI's bytes never
    * change. Cleared wholesale if it ever grows past bound (a JVM
    * reading a million distinct BSS files). */
  private val knownBssUris =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def isKnownBss(uri: String): Boolean = knownBssUris.contains(uri)
  def markBssUri(uri: String): Unit = {
    if (knownBssUris.size() > 1000000) knownBssUris.clear()
    knownBssUris.add(uri)
    ()
  }

  /** Open Spark's VectorizedParquetRecordReader over one segment
    * file, or null when the file can't open that way (exotic store
    * streams). `batches = true` flips it to whole-ColumnarBatch
    * output (enableReturningBatches) for the columnar factory;
    * `false` keeps row iteration for [[GraftFileReader]]. An
    * unsupported page ENCODING (BYTE_STREAM_SPLIT) opens fine here
    * and only fails on the first read — callers handle that flip. */
  def openVectorized(uri: String, physNames: Seq[String],
      dtypes: Array[GType],
      hconf: org.apache.hadoop.conf.Configuration, batches: Boolean)
      : org.apache.spark.sql.execution.datasources.parquet
        .VectorizedParquetRecordReader =
    try {
      val c = new org.apache.hadoop.conf.Configuration(hconf)
      val reqStruct = org.apache.spark.sql.types.StructType(
        physNames.zip(dtypes).map { case (n, dt) =>
          org.apache.spark.sql.types.StructField(n, dt.sparkType,
            nullable = true) })
      // the conf keys ParquetReadSupport/SpecificParquetRecordReaderBase
      // consult when initialized from an InputSplit
      c.set("org.apache.spark.sql.parquet.row.requested_schema",
        reqStruct.json)
      c.set("parquet.read.support.class",
        "org.apache.spark.sql.execution.datasources.parquet" +
          ".ParquetReadSupport")
      c.setBoolean("spark.sql.parquet.binaryAsString", false)
      c.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
      c.setBoolean("spark.sql.caseSensitive", false)
      val path = new Path(uri)
      val len = path.getFileSystem(c).getFileStatus(path).getLen
      // NOTE: Spark's SpecificParquetRecordReaderBase casts to the
      // OLD mapred FileSplit, not the mapreduce one
      val split = new org.apache.hadoop.mapred.FileSplit(
        path, 0, len, Array.empty[String])
      val ctx = new org.apache.hadoop.mapreduce.task
        .TaskAttemptContextImpl(c,
          new org.apache.hadoop.mapreduce.TaskAttemptID())
      // engine files store proleptic INT64 micros (CORRECTED); the
      // INT96 branch only matters for pre-round-8 files of modern
      // timestamps, where CORRECTED and LEGACY agree
      val r = new org.apache.spark.sql.execution.datasources.parquet
        .VectorizedParquetRecordReader(null, "CORRECTED", "UTC",
          "CORRECTED", "UTC", false, 4096)
      r.initialize(split, ctx)
      r.initBatch(org.apache.spark.sql.types.StructType(Nil),
        InternalRow.empty)
      if (batches) r.enableReturningBatches()
      GraftScanProbe.vectorizedOpens.incrementAndGet()
      r
    } catch { case scala.util.control.NonFatal(e) =>
      if (sys.env.contains("GRAFT_DEBUG_VEC")) e.printStackTrace()
      null }

  /** Task-side gc-buried resurrect (segment parity with
    * [[graft.api.Series]]'s scanFiles): a referenced file
    * soft-deleted by a racing gc still exists under its hextime
    * suffix — rename it back before any read tier opens. Without
    * this, engine-reader scans (BSS-mode collections, CDC file
    * batches) lacked the self-heal the builtin-reader path has, and
    * the concurrent-ingest gates failed under gc races (found by
    * the zstd+bss full-oracle pass, q207/q208). Quiet on every
    * miss: true absence is the readers' error to report, and a
    * racing resurrector's rename is a win, not a failure. */
  def ensurePresent(uri: String,
      conf: org.apache.hadoop.conf.Configuration): Unit =
    try {
      val path = new Path(uri)
      val fs = path.getFileSystem(conf)
      if (!fs.exists(path)) {
        val name = path.getName
        fs.listStatus(path.getParent).map(_.getPath.getName)
          .find(_.startsWith(name + ".t"))
          .foreach { b =>
            try { fs.rename(new Path(path.getParent, b), path); () }
            catch { case scala.util.control.NonFatal(_) => () }
          }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** kernel scalar -> InternalRow slot value for a dtype */
  def kernelToInternal(dt: GType, v: Any): Any =
    if (v == null) null
    else dt match {
      case GType.DateT => v.asInstanceOf[Long].toInt
      case GType.StrT  => UTF8String.fromString(v.asInstanceOf[String])
      case _           => v
    }

  /** InternalRow slot value -> kernel scalar */
  def internalToKernel(dt: GType, v: Any): Any = dt match {
    case GType.DateT => v.asInstanceOf[Int].toLong
    case GType.StrT  => v.toString
    case _           => v
  }

  /** does the row's index key fall inside the clip bounds? */
  def inClip(gs: Array[GType], key: Array[Any], clip: GraftClip): Boolean = {
    if (clip == null) return true
    def cmp(k: IndexKey): Int = {
      val n = math.min(key.length, k.values.length)
      var i = 0
      while (i < n) {
        val c = gs(i).cmp(key(i), k.values(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
    val l = cmp(clip.start)
    val r = cmp(clip.stop)
    (l > 0 || (l == 0 && clip.closed.left)) &&
      (r < 0 || (r == 0 && clip.closed.right))
  }

  /** assemble the output row; outPos sentinel -1 = the partition's
    * `_file` constant (null for manifest-inline partitions) */
  def project(slots: Array[Any], outPos: Array[Int],
      fileConst: UTF8String): InternalRow = {
    if (outPos.length == slots.length &&
        outPos.indices.forall(i => outPos(i) == i))
      new GenericInternalRow(slots.clone())
    else {
      val out = new Array[Any](outPos.length)
      var i = 0
      while (i < outPos.length) {
        val pos = outPos(i)
        out(i) = if (pos == -1) fileConst else slots(pos)
        i += 1
      }
      new GenericInternalRow(out)
    }
  }
}

/** Segment-file reader for the connector. The PRIMARY decode path is
  * Spark's own VectorizedParquetRecordReader (columnar batch decode,
  * iterated as rows) over a FileSplit with the session's Hadoop conf
  * — the same machinery `Series.frame()`'s scans use, so an
  * unfiltered SQL view scan pays vectorized-decode cost, not per-value
  * converter callbacks. Missing columns (pre-clone files) come back
  * as null vectors, which the shared default-injection fills. When
  * the vectorized reader cannot open the file (exotic store streams),
  * a parquet-mr row materializer takes over — it also handles
  * legacy INT96 timestamps explicitly. Rows pass through the shared
  * clip/defaults/projection step only when the partition needs one;
  * the common unclipped, no-defaults, no-extra-columns case emits
  * the reader's row views untouched. */
/** Column-at-a-time decode over parquet-mr's page machinery — the
  * MIDDLE read tier for files Spark's vectorized reader cannot decode
  * (BYTE_STREAM_SPLIT pages from the `<codec>+bss` storage mode).
  * parquet-mr's [[org.apache.parquet.column.ColumnReader]] dispatches
  * every page encoding (its ByteStreamSplitValuesReader included), and
  * filling one [[OnHeapColumnVector]] per column in a tight typed loop
  * keeps the batch shape — no record assembly, no per-row
  * materializer callbacks, no slot boxing. Rows are served as batch
  * row VIEWS (the RDD copies on emit, same contract as the vectorized
  * tier). The parquet-mr row materializer remains the last-resort
  * tier beneath this one. */
private final class GraftColumnarScan(uri: String,
    physNames: Vector[String], dtypes: Array[GType],
    hconf: org.apache.hadoop.conf.Configuration) {
  import org.apache.parquet.column.impl.ColumnReadStoreImpl
  import org.apache.parquet.io.api.PrimitiveConverter
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
    org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new Path(uri), hconf))
  private val fileMeta = reader.getFooter.getFileMetaData
  private val fileSchema = fileMeta.getSchema
  private val byName = fileSchema.getFields.asScala
    .map(f => f.getName -> f).toMap
  // projected schema: requested columns present in the file, in
  // request order; absent columns (pre-clone files) serve null
  // vectors. A zero-column projection (count(*)) serves empty rows
  // straight off the row-group counts — no column IO at all.
  private val presentIdx: Array[Int] = {
    var k = -1
    physNames.map(n =>
      if (byName.contains(n)) { k += 1; k } else -1).toArray
  }
  private val proj: MessageType = {
    val b = Types.buildMessage()
    physNames.foreach(n => byName.get(n).foreach(b.addField))
    b.named(fileSchema.getName)
  }
  if (proj.getFieldCount > 0) reader.setRequestedSchema(proj)
  private val descs = proj.getColumns.asScala.toArray
  private val sparkTypes = dtypes.map(_.sparkType)
  // ColumnReaderImpl requires a converter tree even when values are
  // pulled via the typed getters; dictionary support stays off so
  // dictionary-encoded pages materialize per value
  private val dummyConverter = new GroupConverter {
    override def getConverter(i: Int): Converter =
      new PrimitiveConverter {}
    override def start(): Unit = ()
    override def end(): Unit = ()
  }

  private var batch: ColumnarBatch = null
  private var vecs: Array[OnHeapColumnVector] = null
  private var vecCap: Int = 0
  private var rowIt: java.util.Iterator[InternalRow] = null

  // every requested column absent from this file (pre-clone/ALTER
  // segment): serve null-filled batches of physNames.length columns
  // sized straight off the footer's row-group counts — no page IO
  // (readNextRowGroup with no requested schema would decode EVERY
  // file column), and the row arity stays physNames.length so the
  // shared default-injection downstream can fill the slots
  private var nullOnlyBlocks: Iterator[Long] =
    if (physNames.nonEmpty && proj.getFieldCount == 0)
      reader.getFooter.getBlocks.asScala.iterator.map(_.getRowCount)
    else null

  private def loadNextRowGroup(): Boolean = {
    if (nullOnlyBlocks != null) return loadNullOnlyGroup()
    val rg = reader.readNextRowGroup() // zero-col case never gets here
    if (rg == null) return false
    val n = rg.getRowCount
    require(n <= Int.MaxValue, s"row group of $n rows")
    val rows = n.toInt
    ensureBatch(rows)
    val crs = new ColumnReadStoreImpl(rg, dummyConverter, proj,
      fileMeta.getCreatedBy)
    var i = 0
    while (i < physNames.length) {
      val v = vecs(i)
      v.reset()
      if (presentIdx(i) < 0) v.putNulls(0, rows)
      else fill(v, crs, descs(presentIdx(i)), dtypes(i), rows)
      i += 1
    }
    batch.setNumRows(rows)
    rowIt = batch.rowIterator()
    true
  }

  private def loadNullOnlyGroup(): Boolean = {
    if (!nullOnlyBlocks.hasNext) return false
    val n = nullOnlyBlocks.next()
    require(n <= Int.MaxValue, s"row group of $n rows")
    val rows = n.toInt
    ensureBatch(rows)
    var i = 0
    while (i < physNames.length) {
      vecs(i).reset()
      vecs(i).putNulls(0, rows)
      i += 1
    }
    batch.setNumRows(rows)
    rowIt = batch.rowIterator()
    true
  }

  /** REUSE vectors across row groups (downstream consumes each batch
    * before the next load — the DSv2 buffer-reuse contract): a
    * fresh-allocation-per-group scan churned ~8 MB of vector garbage
    * per 500k-row group and showed up as GC tax inside the full
    * bench suite. */
  private def ensureBatch(rows: Int): Unit =
    if (vecs == null || rows > vecCap) {
      if (batch != null) batch.close()
      vecs = Array.tabulate(physNames.length)(i =>
        new OnHeapColumnVector(rows, sparkTypes(i)))
      vecCap = rows
      batch = new ColumnarBatch(
        vecs.asInstanceOf[Array[org.apache.spark.sql.vectorized
          .ColumnVector]], rows)
    }

  private def fill(v: OnHeapColumnVector,
      crs: ColumnReadStoreImpl,
      cd: org.apache.parquet.column.ColumnDescriptor, dt: GType,
      rows: Int): Unit = {
    val cr = crs.getColumnReader(cd)
    val maxDef = cd.getMaxDefinitionLevel
    val int96 = cd.getPrimitiveType.getPrimitiveTypeName ==
      org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96
    var r = 0
    while (r < rows) {
      if (cr.getCurrentDefinitionLevel < maxDef) v.putNull(r)
      else dt match {
        case GType.FloatT => v.putDouble(r, cr.getDouble)
        case GType.IntT => v.putLong(r, cr.getLong)
        case GType.TimestampT =>
          if (int96) {
            // legacy INT96: 8 B nanos-of-day LE + 4 B julian day LE
            val buf = cr.getBinary.toByteBuffer
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val base = buf.position()
            val nanos = buf.getLong(base)
            val julian = buf.getInt(base + 8)
            v.putLong(r,
              (julian - 2440588L) * 86400000000L + nanos / 1000L)
          } else v.putLong(r, cr.getLong)
        case GType.DateT => v.putInt(r, cr.getInteger)
        case GType.StrT =>
          val b = cr.getBinary.getBytes
          v.putByteArray(r, b, 0, b.length)
      }
      cr.consume()
      r += 1
    }
  }

  // zero-column REQUEST (count(*)): serve empty row views off row
  // counts. Distinct from the null-only case above — there columns
  // WERE requested, so the served arity must stay physNames.length
  private var emptyLeft: Long =
    if (physNames.isEmpty)
      reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    else -1L
  private val emptyRow = new GenericInternalRow(0)

  /** next decoded row-group batch, or null at EOF (columnar serving:
    * empty-projection files have no batch form — callers route those
    * through [[nextRow]]) */
  def nextBatch(): ColumnarBatch =
    if (loadNextRowGroup()) batch else null

  /** next row VIEW in physNames order, or null at EOF */
  def nextRow(): InternalRow = {
    if (emptyLeft >= 0) {
      if (emptyLeft == 0) return null
      emptyLeft -= 1
      return emptyRow
    }
    while (rowIt == null || !rowIt.hasNext) {
      if (!loadNextRowGroup()) return null
    }
    rowIt.next()
  }

  def close(): Unit = {
    if (batch != null) batch.close()
    reader.close()
  }
}

/** Columnar partition reader over [[GraftColumnarScan]] — row-group
  * batches flow straight into Spark's codegen'd ColumnarToRow, so
  * the per-row DSv2 iterator tax disappears. Only planned for
  * partitions with no clip/defaults/projection work (the
  * [[GraftSegmentsTable]] eligibility check). */
private final class GraftColumnarFileReader(p: GraftFilePartition,
    conf: SegmentWriter.SerConf)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  GraftRead.ensurePresent(p.uri, conf.value)
  private val dtypes = p.dtypeNames.map(GraftRead.dtypeOf).toArray
  // same per-FILE adaptivity as the row path: Spark's vectorized
  // reader in whole-batch mode first (plain-codec files in a
  // BSS-hinted collection keep their fastest decode), flipping to
  // the engine's page decoder on the first-batch encoding failure
  private var vec =
    if (GraftRead.isKnownBss(p.uri)) null
    else GraftRead.openVectorized(p.uri, p.physNames, dtypes,
      conf.value, batches = true)
  private var scan: GraftColumnarScan =
    if (vec != null) null else openScan()
  private def openScan(): GraftColumnarScan = {
    GraftScanProbe.columnarFallbackOpens.incrementAndGet()
    new GraftColumnarScan(p.uri, p.physNames, dtypes, conf.value)
  }
  private var emitted = false
  private var cur: org.apache.spark.sql.vectorized.ColumnarBatch = _
  override def next(): Boolean = {
    if (vec != null) {
      val has =
        try vec.nextKeyValue()
        catch {
          case scala.util.control.NonFatal(e) if !emitted =>
            if (sys.env.contains("GRAFT_DEBUG_VEC")) e.printStackTrace()
            vec.close(); vec = null
            GraftRead.markBssUri(p.uri)
            scan = openScan()
            return next()
        }
      if (has) {
        emitted = true
        cur = vec.getCurrentValue
          .asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
      }
      has
    } else {
      cur = scan.nextBatch()
      cur != null
    }
  }
  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = cur
  override def close(): Unit = {
    if (vec != null) vec.close()
    if (scan != null) scan.close()
  }
}

private final class GraftColumnarReaderFactory(
    conf: SegmentWriter.SerConf) extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] =
    throw new IllegalStateException(
      "graft columnar factory: row reads not planned here")
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftColumnarFileReader(p.asInstanceOf[GraftFilePartition], conf)
}

class GraftFileReader(p: GraftFilePartition, conf: SegmentWriter.SerConf)
    extends PartitionReader[InternalRow] {
  import GraftRead._

  private val fileConst: UTF8String =
    if (p.fileLabel.isEmpty) null else UTF8String.fromString(p.fileLabel)
  private val dtypes = p.dtypeNames.map(dtypeOf).toArray
  private val idxDts = p.idxPos.map(i => dtypes(i))
  private val slots = new Array[Any](p.readNames.length)
  private val kernelDefaults: Array[Any] =
    p.defaults.toArray
  private val hasDefaults = kernelDefaults.exists(_ != null)
  private val identityOut = p.clip == null && !hasDefaults &&
    p.outPos.length == p.readNames.length &&
    p.outPos.indices.forall(i => p.outPos(i) == i)

  // ---- primary: vectorized columnar decode -------------------------
  // var, not val: a file whose pages use an encoding the vectorized
  // reader lacks (BYTE_STREAM_SPLIT segments written with the
  // `<codec>+bss` storage mode) opens fine but throws on the FIRST
  // read batch — next() then closes this and flips to the parquet-mr
  // fallback, which decodes every parquet encoding
  private var vec: org.apache.spark.sql.execution.datasources.parquet
      .VectorizedParquetRecordReader = {
    GraftRead.ensurePresent(p.uri, conf.value)
    if (GraftRead.isKnownBss(p.uri)) null // straight to the mid tier
    else {
      val r = GraftRead.openVectorized(p.uri, p.physNames, dtypes,
        conf.value, batches = false)
      if (r == null) GraftScanProbe.fallbackOpens.incrementAndGet()
      r
    }
  }

  // ---- fallback: parquet-mr row materializer -----------------------
  private lazy val support = new ReadSupport[Array[Any]] {
    override def init(ctx: InitContext): ReadSupport.ReadContext = {
      val fileSchema = ctx.getFileSchema
      val byName = fileSchema.getFields.asScala.map(f =>
        f.getName -> f).toMap
      val b = Types.buildMessage()
      p.physNames.foreach(n => byName.get(n).foreach(b.addField))
      // parquet forbids empty group types: a zero-column projection
      // (count(*) over a clipped snapshot) reads the first file
      // column and discards it (slotOf maps it to no output slot)
      if (p.physNames.isEmpty)
        fileSchema.getFields.asScala.headOption.foreach(b.addField)
      new ReadSupport.ReadContext(b.named(fileSchema.getName))
    }
    override def prepareForRead(c: org.apache.hadoop.conf.Configuration,
        meta: util.Map[String, String], fileSchema: MessageType,
        ctx: ReadSupport.ReadContext): RecordMaterializer[Array[Any]] = {
      val requested = ctx.getRequestedSchema
      // requested field i -> slot index
      val slotOf = requested.getFields.asScala.map(f =>
        p.physNames.indexOf(f.getName)).toArray
      new RecordMaterializer[Array[Any]] {
        private val root: GroupConverter = new GroupConverter {
          override def getConverter(fieldIndex: Int): Converter = {
            val slot = slotOf(fieldIndex)
            if (slot < 0) // the empty-projection placeholder column
              return new PrimitiveConverter {
                override def addLong(v: Long): Unit = ()
                override def addInt(v: Int): Unit = ()
                override def addDouble(v: Double): Unit = ()
                override def addFloat(v: Float): Unit = ()
                override def addBoolean(v: Boolean): Unit = ()
                override def addBinary(v: Binary): Unit = ()
              }
            val dt = dtypes(slot)
            val prim = requested.getType(fieldIndex).asPrimitiveType()
              .getPrimitiveTypeName
            new PrimitiveConverter {
              override def addLong(v: Long): Unit = slots(slot) = v
              override def addInt(v: Int): Unit = slots(slot) =
                if (dt == GType.DateT) v else v.toLong
              override def addDouble(v: Double): Unit = slots(slot) = v
              override def addFloat(v: Float): Unit =
                slots(slot) = v.toDouble
              override def addBinary(v: Binary): Unit =
                if (prim == org.apache.parquet.schema.PrimitiveType
                    .PrimitiveTypeName.INT96) {
                  // legacy INT96 timestamp: 8 B nanos-of-day LE +
                  // 4 B julian day LE -> epoch micros. toByteBuffer
                  // may wrap a larger backing array with position>0 —
                  // index RELATIVE to position, never absolute 0
                  val buf = v.toByteBuffer
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                  val base = buf.position()
                  val nanos = buf.getLong(base)
                  val julian = buf.getInt(base + 8)
                  slots(slot) =
                    (julian - 2440588L) * 86400000000L + nanos / 1000L
                } else slots(slot) =
                  UTF8String.fromBytes(v.getBytes)
            }
          }
          override def start(): Unit = {
            java.util.Arrays.fill(
              slots.asInstanceOf[Array[AnyRef]], null)
          }
          override def end(): Unit = ()
        }
        override def getRootConverter: GroupConverter = root
        override def getCurrentRecord: Array[Any] = slots
      }
    }
  }

  private var readerOpened = false
  private lazy val reader: ParquetReader[Array[Any]] = {
    readerOpened = true
    ParquetReader.builder(support, new Path(p.uri))
      .withConf(conf.value).build()
  }

  private var current: InternalRow = _

  /** defaults + clip + projection over a row in readNames layout */
  private def finish(): Boolean = {
    var i = 0
    while (i < slots.length) {
      if (slots(i) == null && kernelDefaults(i) != null)
        slots(i) = kernelToInternal(dtypes(i), kernelDefaults(i))
      i += 1
    }
    if (p.clip != null) {
      val key = p.idxPos.map(j => internalToKernel(dtypes(j), slots(j)))
      if (!inClip(idxDts, key, p.clip)) return false
    }
    current = project(slots, p.outPos, fileConst)
    true
  }

  private def fillSlots(row: InternalRow): Unit = {
    var i = 0
    while (i < slots.length) {
      slots(i) =
        if (row.isNullAt(i)) null
        else dtypes(i) match {
          case GType.TimestampT | GType.IntT => row.getLong(i)
          case GType.DateT  => row.getInt(i)
          case GType.FloatT => row.getDouble(i)
          case GType.StrT   => row.getUTF8String(i)
        }
      i += 1
    }
  }

  // middle tier: column-at-a-time decode (BYTE_STREAM_SPLIT pages);
  // opened after the vectorized first-batch failure — or immediately
  // when the URI is already KNOWN to hold BSS pages (skips the doomed
  // probe open's footer parse on every repeat read)
  private var mid: GraftColumnarScan =
    if (vec != null || !GraftRead.isKnownBss(p.uri)) null
    else try {
      GraftScanProbe.columnarFallbackOpens.incrementAndGet()
      new GraftColumnarScan(p.uri, p.physNames, dtypes, conf.value)
    } catch { case scala.util.control.NonFatal(e) =>
      if (sys.env.contains("GRAFT_DEBUG_VEC")) e.printStackTrace()
      GraftScanProbe.fallbackOpens.incrementAndGet()
      null
    }

  private var emitted = false
  override def next(): Boolean = {
    if (vec != null) {
      // unsupported-encoding pages surface on the FIRST batch, before
      // any row is emitted — flip to the columnar fallback then (and
      // ONLY then: a mid-file failure after emitted rows must
      // propagate, or a fallback would re-serve rows already returned)
      val first =
        try vec.nextKeyValue()
        catch {
          case scala.util.control.NonFatal(e) if !emitted =>
            if (sys.env.contains("GRAFT_DEBUG_VEC")) e.printStackTrace()
            vec.close(); vec = null
            GraftRead.markBssUri(p.uri)
            try {
              mid = new GraftColumnarScan(p.uri, p.physNames, dtypes,
                conf.value)
              GraftScanProbe.columnarFallbackOpens.incrementAndGet()
            } catch { case scala.util.control.NonFatal(e2) =>
              if (sys.env.contains("GRAFT_DEBUG_VEC")) e2.printStackTrace()
              mid = null
              GraftScanProbe.fallbackOpens.incrementAndGet()
            }
            return next()
        }
      if (first) {
        emitted = true
        var has = true
        while (has) {
          val row = vec.getCurrentValue.asInstanceOf[InternalRow]
          if (identityOut) { current = row; return true }
          fillSlots(row)
          if (finish()) return true
          has = vec.nextKeyValue()
        }
      }
      false
    } else if (mid != null) {
      // same contract as the vectorized tier: a failure before any
      // emitted row demotes to the parquet-mr row materializer.
      // emitted flips only once a fully-assembled row is about to be
      // RETURNED — a throw while projecting the first row (or while
      // rows were read but all clipped out) still demotes, since the
      // consumer has received nothing that a fresh reader would
      // re-serve
      try {
        while (true) {
          val row = mid.nextRow()
          if (row == null) return false
          if (identityOut) { current = row; emitted = true; return true }
          fillSlots(row)
          if (finish()) { emitted = true; return true }
        }
        false
      } catch {
        case scala.util.control.NonFatal(e) if !emitted =>
          if (sys.env.contains("GRAFT_DEBUG_VEC")) e.printStackTrace()
          try mid.close() catch { case _: Throwable => () }
          mid = null
          GraftScanProbe.fallbackOpens.incrementAndGet()
          next()
      }
    } else {
      while (true) {
        val rec = reader.read()
        if (rec == null) return false
        if (finish()) return true
      }
      false
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit =
    if (vec != null) vec.close()
    else if (mid != null) mid.close()
    // never FORCE the lazy fallback reader during cleanup: that would
    // open the file (which may be the unreadable file that put us on
    // this path) just to close it, masking the original failure
    else if (readerOpened) reader.close()
}

class GraftInlineReader(p: GraftInlinePartition)
    extends PartitionReader[InternalRow] {
  import GraftRead._

  private val dtypes = p.dtypeNames.map(dtypeOf).toArray
  private val idxDts = p.idxPos.map(i => dtypes(i))
  private val srcIdx: Array[Int] =
    p.readNames.map(n => p.srcCols.indexOf(n)).toArray
  private val it = p.rows.iterator
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (it.hasNext) {
      val v = it.next()
      val slots = new Array[Any](p.readNames.length)
      var i = 0
      while (i < slots.length) {
        val kernel =
          if (srcIdx(i) >= 0) v(srcIdx(i)) else p.defaults(i)
        slots(i) = kernelToInternal(dtypes(i), kernel)
        i += 1
      }
      val key = p.idxPos.map(j => internalToKernel(dtypes(j), slots(j)))
      if (inClip(idxDts, key, p.clip)) {
        // inline rows have no backing file: `_file` projects null
        current = project(slots, p.outPos, null)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
