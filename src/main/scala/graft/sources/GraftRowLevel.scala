package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.write.{BatchWrite,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.core.{Closed, GType, IndexKey, RangeRegions, SegmentRead,
  SegmentWriter}
import graft.engine.SparkVals

/** SQL `UPDATE` / `MERGE INTO` / rewrite-`DELETE` on graft tables —
  * Spark 4's group-based copy-on-write row-level operations
  * (`SupportsRowLevelOperations`), the mechanism Iceberg/Delta use
  * for the same verbs.
  *
  * Contract with Spark: the operation's SCAN reads whole affected
  * GROUPS (here: a segment's visible window — every row, matched or
  * not), Spark computes the rewritten rows, and the operation's WRITE
  * must replace exactly the groups the scan served. Group selection
  * happens via runtime group filtering (Spark plans a dynamic-pruning
  * subquery from the operation's condition over the ORIGINAL table —
  * verified against Spark 4.1's
  * `RowLevelOperationRuntimeGroupFiltering`, which rebuilds the
  * matching-rows plan from `RowLevelOperationTable.table`): the
  * scan's [[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]]
  * then drops every segment whose recorded index range holds none of
  * the matching head-index values, so a selective UPDATE rewrites
  * only the segments it touches. Without a usable runtime filter the
  * scan serves the whole series and the operation degrades to a full
  * rewrite — correct, never wrong-sized.
  *
  * The replacement itself is [[graft.api.Series.commitReplace]]: one
  * changelog commit that splices each scanned visible window
  * (tombstone-stretched cover of the window's rewritten files), with
  * task-side writers rolling output files at window boundaries so
  * every staged file lies in exactly one window (or in free index
  * space — where MERGE-inserted rows may land; landing on unscanned
  * VISIBLE data is refused rather than clobbered). Index-range
  * DELETEs never reach this path: Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` swaps them back to the
  * metadata-only `SupportsDelete` tombstone route.
  */
class GraftRowLevelOperation(table: GraftTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** the visible windows the scan ACTUALLY planned (post runtime
    * group filtering) — the write replaces exactly these */
  @volatile private[sources] var replacedRanges
      : Seq[(IndexKey, IndexKey, Closed)] = null

  /** ONE manifest snapshot per OPERATION: the scan's group planning
    * (bounded AND unbounded), the probe totals, the write's
    * roll-window computation and the sort-width decision all query
    * this one decoded manifest — one label-span walk per statement
    * instead of three, and no concurrent commit can slip a different
    * revision between the scan's view and the write's. */
  private[sources] lazy val tableManifest
      : Option[graft.core.Manifest] =
    table.series.collection.manifest(None)
  private[sources] lazy val tableSegments: Seq[SegmentRead] =
    // empty snapshot (no leaf yet) must stay empty — segments(from =
    // None) would FALL BACK to a live manifest read, letting the
    // bounded and unbounded group queries observe two different live
    // revisions: exactly the race this snapshot exists to prevent
    tableManifest.map(m =>
      table.series.segments(from = Some(m)).filter(_.meta.hasData))
      .getOrElse(Seq.empty)

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String =
    s"GraftRowLevelOperation[$cmd] ${table.name()}"

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : ScanBuilder = new GraftCowScanBuilder(table,
    GraftRowLevelOperation.this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        require(!table.gschema.kv,
          "graft: kv (upsert) collections merge on write — use the " +
            "Series API; SQL row-level operations cannot express it")
        val expect = table.gschema.sparkSchema
        val got = info.schema()
        require(got.length == expect.length &&
          got.fields.zip(expect.fields).forall { case (a, b) =>
            a.name == b.name && a.dataType == b.dataType },
          s"graft row-level write schema mismatch: got " +
            s"${got.simpleString}, table is ${expect.simpleString}")
        new GraftCowWrite(table, GraftRowLevelOperation.this)
      }
    }
}

/** Group-selection pushdown for the copy-on-write scan
  * (`GroupBasedRowLevelOperationScanPlanning` pushes the command's
  * condition here, exactly as it does for Iceberg): index-range
  * conjuncts assemble a lexicographic prefix bound that selects the
  * covering GROUPS straight from the manifest — O(segments) driver
  * work, no table-scan subquery. Rows are never filtered (a group is
  * read whole so unmatched rows survive the rewrite; the returned
  * post-scan filters keep every predicate residual).
  *
  * When EVERY pushed conjunct folded into the index bound, the
  * static cover already contains all matched groups, and the scan
  * reports no runtime-filter attributes — Spark then skips planning
  * the `RowLevelOperationRuntimeGroupFiltering` subquery entirely
  * (three AQE jobs per statement at bench scale; a full table scan's
  * worth of IO at 100 TB). Any non-index conjunct (a value predicate,
  * an IN list) keeps the runtime filter: static bounds still cap the
  * cover, and the matched-row value set prunes it finer. */
class GraftCowScanBuilder(table: GraftTable, op: GraftRowLevelOperation)
    extends ScanBuilder with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, GreaterThan,
    GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}

  private val idxCols = table.gschema.idx
  private final class B(val dt: GType) {
    var lo: Any = null; var loClosed = true
    var hi: Any = null; var hiClosed = true
    private def k(v: Any) = SparkVals.parseBound(dt, v)
    def hasEq: Boolean = lo != null && hi != null && loClosed &&
      hiClosed && dt.cmp(k(lo), k(hi)) == 0
    def tighten(lo0: Any, loC: Boolean, hi0: Any, hiC: Boolean): Unit = {
      if (lo0 != null && (lo == null || dt.cmp(k(lo0), k(lo)) > 0 ||
          (dt.cmp(k(lo0), k(lo)) == 0 && !loC))) { lo = lo0; loClosed = loC }
      if (hi0 != null && (hi == null || dt.cmp(k(hi0), k(hi)) < 0 ||
          (dt.cmp(k(hi0), k(hi)) == 0 && !hiC))) { hi = hi0; hiClosed = hiC }
    }
  }
  private val bounds: Map[String, B] =
    idxCols.map(c => c.name -> new B(c.dtype)).toMap
  private var accepted: Array[Filter] = Array.empty
  // true only while every conjunct Spark handed over folded into the
  // index bound — the condition under which the runtime group filter
  // can prune nothing the static cover didn't
  private var allIndexRange = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = scala.collection.mutable.ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ GreaterThan(c, v) if bounds.contains(c) && v != null =>
        usable += f; bounds(c).tighten(v, false, null, true)
      case f @ GreaterThanOrEqual(c, v)
          if bounds.contains(c) && v != null =>
        usable += f; bounds(c).tighten(v, true, null, true)
      case f @ LessThan(c, v) if bounds.contains(c) && v != null =>
        usable += f; bounds(c).tighten(null, true, v, false)
      case f @ LessThanOrEqual(c, v)
          if bounds.contains(c) && v != null =>
        usable += f; bounds(c).tighten(null, true, v, true)
      case f @ EqualTo(c, v) if bounds.contains(c) && v != null =>
        usable += f; bounds(c).tighten(v, true, v, true)
      case IsNotNull(c) if bounds.contains(c) =>
        () // index columns are non-null by schema: vacuous, not a miss
      case _ => allIndexRange = false
    }
    accepted = usable.toArray
    filters // ALL residual: COW groups must be read whole
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** equalities on leading index columns extend the prefix; the first
    * range column contributes its bound and terminates it (same
    * lexicographic-prefix rule as [[GraftScanBuilder]]). A bound on a
    * column BELOW the terminated prefix was accepted but cannot
    * prune — it drops out of the assembled bound, so exactness also
    * requires every bounded column to have been consumed. */
  private def prefix(lower: Boolean): (Seq[Any], Boolean, Int) = {
    val out = Vector.newBuilder[Any]
    var closed = true
    var n = 0
    var consumed = 0
    var stop = false
    val it = idxCols.iterator
    while (!stop && it.hasNext) {
      val b = bounds(it.next().name)
      if (b.hasEq) { out += b.lo; n += 1; consumed += 1 }
      else {
        val (v, cl) = if (lower) (b.lo, b.loClosed) else (b.hi, b.hiClosed)
        if (v != null) {
          out += v; closed = cl; n += 1
          if (b.lo != null || b.hi != null) consumed += 1
        }
        stop = true
      }
    }
    (if (n == 0) null else out.result(), closed, consumed)
  }

  override def build(): Scan = {
    val (startB, startClosed, usedLo) = prefix(lower = true)
    val (stopB, stopClosed, usedHi) = prefix(lower = false)
    val bounded = bounds.valuesIterator
      .count(b => b.lo != null || b.hi != null)
    // UPDATE/DELETE only: their condition is a pure predicate over
    // the target, so an all-consumed index bound IS the matched-group
    // cover. A MERGE's matched groups are decided by the JOIN with
    // the source — a target-only conjunct in its ON clause (pushed
    // here all the same) caps the cover but can never make it exact,
    // and dropping the runtime filter would rewrite every covered
    // segment even when the source matches two of them.
    val exact = op.command() != RowLevelOperation.Command.MERGE &&
      allIndexRange && (startB != null || stopB != null) &&
      math.max(usedLo, usedHi) == bounded
    val cl = Closed.Both.setLeft(startClosed).setRight(stopClosed)
    // A handful of candidate groups can never pay for the runtime
    // group-filter subquery: Spark plans it as an extra target-scan +
    // join (2-3 AQE jobs, ~300-400 ms at bench scale) whose only
    // benefit is NOT rewriting the candidates it prunes — with ≤ N
    // candidates the conservative rewrite of all of them is cheaper
    // than the subquery that would choose among them. Segment-count
    // based, so a real table (10^4-10^5 segments at 100 TB) always
    // keeps the filter; only toy/tail tables skip it. Candidates are
    // counted against the operation's ONE snapshot manifest.
    val minSeg = table.series.collection.repo.spark.conf
      .get("spark.graft.cow.runtimeFilterMinSegments", "4").toInt
    val candidates =
      if (startB == null && stopB == null) op.tableSegments.length
      else if (op.tableManifest.isEmpty) 0 // no leaf: nothing to prune
      else table.series
        .segments(startB, stopB, None, cl, from = op.tableManifest)
        .count(_.meta.hasData)
    new GraftCowScan(table, op, startB, stopB, cl,
      skipRuntimeFilter = exact || candidates <= minSeg,
      staticExact = exact)
  }
}

/** The copy-on-write scan: serves ENTIRE visible windows (no row
  * filtering — a group must be read whole so unmatched rows survive
  * the rewrite), prunes windows statically through the pushed index
  * bound and dynamically through the runtime group filter, and
  * records what it planned for the write side. */
class GraftCowScan(table: GraftTable, op: GraftRowLevelOperation,
    start: Any = null, stop: Any = null, closed: Closed = Closed.Both,
    skipRuntimeFilter: Boolean = false,
    /** filter skipped because static selection was EXACT (vs skipped
      * for economy on a tiny candidate cover) — probe attribution */
    staticExact: Boolean = false)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportOrdering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  /** every planned partition serves one index-sorted visible window —
    * reported so the rewrite-DELETE's in-partition sort requirement
    * is satisfied by the scan itself (`RemoveRedundantSorts`) */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions,
      SortDirection}
    table.gschema.idx.map(c => Expressions.sort(
      Expressions.column(c.name), SortDirection.ASCENDING)).toArray
  }

  private lazy val resolvedSeries: graft.api.Series = table.series
  /** covering segments for the static bound, as FULL visible windows
    * (the bounded manifest query returns windows CLIPPED to the
    * bound; serving those would splice a sub-segment replacement —
    * correct for pure UPDATEs but it breaks the group contract the
    * write side assumes: roll windows must not overlap untouched
    * windows, and MERGE free-space inserts must be able to land
    * anywhere inside a scanned group). Matching the bounded hits back
    * to the unbounded list by manifest row keeps whole groups; a
    * window whose meta is shared by another visible window over-keeps
    * that sibling — a superset, safe for copy-on-write. */
  private lazy val (allSegments, tableSegmentCount)
      : (Seq[SegmentRead], Int) = {
    val full = op.tableSegments // the operation's one snapshot
    val kept =
      if (start == null && stop == null) full
      else {
        // bounded query against the SAME snapshot manifest: reading
        // the live changelog here would let a concurrent commit land
        // between the two reads — its new metas would match nothing
        // in `full` and covered groups would silently drop out
        val hit = resolvedSeries
          .segments(start, stop, None, closed, from = op.tableManifest)
          .filter(_.meta.hasData).map(_.meta).toSet
        full.filter(s => hit.contains(s.meta))
      }
    (kept, full.length)
  }

  /** Post-static-pruning statistics from the MANIFEST (no file IO),
    * shared with [[GraftScan]]: the join planner in a MERGE rewrite
    * or group-filter subquery sees the size of the groups actually
    * scanned, not the whole table — a selective operation's scanned
    * groups are broadcast-sized next to a bulk source even when the
    * table is not. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    GraftPlanning.manifestStatistics(allSegments, table.gschema)

  override def readSchema(): StructType = table.gschema.sparkSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCowScan ${table.name()}" +
      (if (start != null || stop != null) " bounded=static" else "") +
      (if (skipRuntimeFilter) " runtimeFilter=skipped" else "")

  private var runtimeKeep: Option[Seq[Any]] = None

  /** empty when the static index bound already covers every matched
    * group — `RowLevelOperationRuntimeGroupFiltering` then plans no
    * subquery at all */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (skipRuntimeFilter) Array.empty
    else Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(table.gschema.idx.head.name))

  override def filter(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.sources.{EqualTo, In}
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

  override def planInputPartitions(): Array[InputPartition] = {
    val dt: GType = table.gschema.idx.head.dtype
    val kept = runtimeKeep match {
      case None => allSegments
      case Some(vals) => allSegments.filter { s =>
        val lo = s.start.values(0)
        val hi = s.stop.values(0)
        vals.exists(v => dt.cmp(v, lo) >= 0 && dt.cmp(v, hi) <= 0)
      }
    }
    op.replacedRanges = kept.map(s => (s.start, s.stop, s.closed))
    // probe semantics: "scanned" counts groups kept by EITHER pruning
    // mechanism (static index bound or runtime matched-value filter);
    // "total" is always the table's full segment count
    val statik = start != null || stop != null
    GraftScanProbe.lastCowStatic = staticExact
    GraftScanProbe.lastCowTinySkip = skipRuntimeFilter && !staticExact
    GraftScanProbe.lastRuntimeScanned =
      if (runtimeKeep.isDefined || statik) kept.length else -1
    GraftScanProbe.lastSegmentsScanned = kept.length
    GraftScanProbe.lastSegmentsTotal = tableSegmentCount
    val reqNames = table.gschema.names
    kept.flatMap(seg => GraftPlanning.partitionsFor(resolvedSeries,
      table.gschema, reqNames, seg, null)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftPlanning.readerFactory()
}

/** The copy-on-write write: the engine's one-job staged write (same
  * TaskSegmentWriter, same per-file stats channel), with region-aware
  * file rolling and a commitReplace instead of the append splice. */
class GraftCowWrite(table: GraftTable, op: GraftRowLevelOperation)
    extends Write
    with org.apache.spark.sql.connector.write
      .RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution,
    Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions,
    SortDirection, SortOrder}

  private def idxOrders: Array[SortOrder] =
    table.gschema.idx.map(c => Expressions.sort(
      Expressions.column(c.name), SortDirection.ASCENDING)).toArray

  /** Rewrite-DELETE needs NO distribution: its output is a strict
    * SUBSET of the scanned rows under narrow operators (scan →
    * filter), so the scan's per-window partitions arrive still
    * index-sorted and range-disjoint — exactly what the rolling
    * writers need. Requiring `ordered` here would buy nothing and
    * cost a RangePartitioner sample job + a full shuffle+sort per
    * statement. UPDATE can rewrite index values (`SET ts = ...`)
    * and MERGE unions in source rows, so both keep the global sort;
    * the in-partition ordering requirement below stays for DELETE
    * (a no-op local sort over already-sorted partitions, dropped by
    * `RemoveRedundantSorts` once the scan reports its ordering). */
  override def requiredDistribution(): Distribution =
    if (op.command() == RowLevelOperation.Command.DELETE)
      Distributions.unspecified()
    else Distributions.ordered(idxOrders)
  override def requiredOrdering(): Array[SortOrder] = idxOrders

  /** Sort width: a SINGLE-PAGE series (UPDATE/DELETE only — those
    * rewrites can never emit more rows than the table holds) requires
    * exactly one sorted partition, where `RangePartitioner` skips its
    * sampling pass entirely — one whole Spark job saved per
    * small-table statement. Every other case returns 0 (no
    * requirement) so AQE sizes the sort from the rows ACTUALLY
    * rewritten: forcing table-page-many partitions would shatter a
    * narrow rewrite into that many tiny files (an exact requirement
    * disables AQE coalescing), progressively fragmenting the very
    * segments page_len sizes — and MERGE inserts are bounded by the
    * SOURCE, which can dwarf a small target. */
  override def requiredNumPartitions(): Int = {
    // MERGE: AQE sizes the sort (see above). DELETE: unspecified
    // distribution — Spark refuses a partition count without one
    // (and there is no sample job to save anyway).
    if (op.command() != RowLevelOperation.Command.UPDATE) return 0
    val totalRows = op.tableSegments.map(_.meta.length).sum
    if (totalRows <= table.series.collection.pageLen) 1 else 0
  }

  override def toBatch: BatchWrite = {
    val s = table.series
    val clct = s.collection
    val store = clct.repo.store
    val tmpRel = s"tmp/${graft.core.Hash.hextime()}-" +
      java.util.UUID.randomUUID().toString.take(12)
    val params = SegmentWriter.TaskParams(table.gschema,
      table.gschema.names.map(clct.physOf).toIndexedSeq,
      tmpRel, store.uri(tmpRel), clct.pageLen,
      {
        val codec = clct.repo.spark.conf
          .get("spark.graft.segment.codec", "zstd")
        if (codec.toLowerCase(java.util.Locale.ROOT).endsWith("+bss"))
          clct.enableBss() // sticky read-routing hint
        codec
      },
      verifySorted = false, labeled = false)
    new GraftCowBatchWrite(table, params, op)
  }
}

class GraftCowBatchWrite(table: GraftTable,
    params: SegmentWriter.TaskParams, op: GraftRowLevelOperation)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    // the scan plans before the write job materializes (its RDD
    // partitions are computed first), so the replaced windows are
    // known here; fail loudly if that execution-order assumption
    // ever breaks rather than writing unsplittable files
    val ranges = op.replacedRanges
    require(ranges != null,
      "graft row-level write started before its scan planned — " +
        "cannot determine the replaced groups")
    // roll boundaries = replaced windows PLUS the untouched visible
    // windows: a staged file must never straddle an existing segment
    // either, or commitReplace's per-file gap splices (and its
    // occupied-space check) would have to refuse legitimate inserts
    // that merely bracket untouched data
    val gs = params.gschema
    val replacedSet = ranges.toSet
    val untouched = op.tableSegments
      .map(s => (s.start, s.stop, s.closed))
      .filterNot(replacedSet.contains)
    val rollWindows = (ranges ++ untouched)
      .sortWith((a, b) => gs.cmpKey(a._1, b._1) < 0)
    new GraftCowWriterFactory(params,
      new SegmentWriter.SerConf(
        SparkSession.active.sessionState.newHadoopConf()),
      new RangeRegions(gs, rollWindows.toIndexedSeq))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val stats = messages.toSeq.flatMap {
      case GraftCommitMessage(s) => s
      case other => throw new IllegalStateException(
        s"unexpected commit message: $other")
    }
    val series = table.series
    try series.commitReplace(stats, op.replacedRanges)
    finally series.collection.repo.store.rm(params.tmpRel,
      recursive = true)
    GraftScanProbe.lastWriteFiles = stats.length
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    table.series.collection.repo.store.rm(params.tmpRel,
      recursive = true)
}

class GraftCowWriterFactory(params: SegmentWriter.TaskParams,
    conf: SegmentWriter.SerConf, regions: RangeRegions)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftCowDataWriter(
      new SegmentWriter.TaskSegmentWriter(params, conf.value,
        partitionId, taskId), params, regions)
}

/** Rolls the underlying segment writer whenever a row crosses into a
  * different replaced window (or gap), so each staged file maps to
  * exactly one region — the property commitReplace's per-window
  * splices rely on.
  *
  * Incoming rows may carry ONE extra leading column: Spark's
  * group-based ReplaceData tags every row with a `__row_operation`
  * marker, and (Spark 4.1, `ReplaceDataExec.writingTask`) strips it
  * via the data projection ONLY on the metadata-attributes path — a
  * connector with no metadata columns receives the raw tagged row
  * while `LogicalWriteInfo.schema()` still reports the bare table
  * schema. The first row's field count decides the shift; a
  * zero-copy delegating view re-aligns the columns for the segment
  * writer (whose stats/digest read positions 0..n-1). */
class GraftCowDataWriter(tw: SegmentWriter.TaskSegmentWriter,
    params: SegmentWriter.TaskParams, regions: RangeRegions)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val idxPos = params.gschema.cols.zipWithIndex
    .filter(_._1.idx).map(_._2).toArray
  private val dtypes = params.gschema.cols.map(_.dtype).toIndexedSeq
  private val nCols = params.gschema.cols.length
  private var region = Int.MinValue
  private var started = false
  private var shift = -1
  private val shifted = new ShiftedInternalRow(nCols)

  private def keyAt(ir: InternalRow): IndexKey = IndexKey(
    idxPos.map { i =>
      dtypes(i) match {
        case GType.TimestampT | GType.IntT => ir.getLong(i)
        case GType.DateT  => ir.getInt(i).toLong
        case GType.FloatT => ir.getDouble(i)
        case GType.StrT   => ir.getUTF8String(i).toString
      }
    }.toVector)

  override def write(row: InternalRow): Unit = {
    if (shift < 0) {
      shift = row.numFields - nCols
      require(shift == 0 || shift == 1,
        s"graft row-level write got ${row.numFields} columns for a " +
          s"$nCols-column table")
      shifted.off = shift
    }
    val r =
      if (shift == 0) row
      else { shifted.base = row; shifted }
    val reg = regions.regionOf(keyAt(r))
    if (started && reg != region) tw.rollNow()
    region = reg
    started = true
    tw.write(r)
  }

  override def commit(): WriterCommitMessage =
    GraftCommitMessage(tw.finish().map(_._2))
  override def abort(): Unit = tw.closeQuiet()
  override def close(): Unit = tw.closeQuiet()
}

/** Zero-copy view of an InternalRow with its first `off` columns
  * dropped (the ReplaceData operation marker). Read-only. */
private[sources] final class ShiftedInternalRow(n: Int)
    extends InternalRow {
  var base: InternalRow = _
  var off: Int = 0

  override def numFields: Int = n
  override def isNullAt(i: Int): Boolean = base.isNullAt(i + off)
  override def getBoolean(i: Int): Boolean = base.getBoolean(i + off)
  override def getByte(i: Int): Byte = base.getByte(i + off)
  override def getShort(i: Int): Short = base.getShort(i + off)
  override def getInt(i: Int): Int = base.getInt(i + off)
  override def getLong(i: Int): Long = base.getLong(i + off)
  override def getFloat(i: Int): Float = base.getFloat(i + off)
  override def getDouble(i: Int): Double = base.getDouble(i + off)
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    base.getDecimal(i + off, precision, scale)
  override def getUTF8String(i: Int)
      : org.apache.spark.unsafe.types.UTF8String =
    base.getUTF8String(i + off)
  override def getBinary(i: Int): Array[Byte] = base.getBinary(i + off)
  override def getInterval(i: Int)
      : org.apache.spark.unsafe.types.CalendarInterval =
    base.getInterval(i + off)
  override def getStruct(i: Int, numFields: Int): InternalRow =
    base.getStruct(i + off, numFields)
  override def getArray(i: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    base.getArray(i + off)
  override def getMap(i: Int)
      : org.apache.spark.sql.catalyst.util.MapData =
    base.getMap(i + off)
  override def getVariant(i: Int)
      : org.apache.spark.unsafe.types.VariantVal =
    base.getVariant(i + off)
  override def getGeography(i: Int)
      : org.apache.spark.unsafe.types.GeographyVal =
    base.getGeography(i + off)
  override def getGeometry(i: Int)
      : org.apache.spark.unsafe.types.GeometryVal =
    base.getGeometry(i + off)
  override def get(i: Int, dt: org.apache.spark.sql.types.DataType)
      : AnyRef = base.get(i + off, dt)
  override def setNullAt(i: Int): Unit =
    throw new UnsupportedOperationException("read-only row view")
  override def update(i: Int, value: Any): Unit =
    throw new UnsupportedOperationException("read-only row view")
  override def copy(): InternalRow =
    // the segment writer consumes rows in place; a copy would need
    // the field dataTypes, which this transient view does not carry
    throw new UnsupportedOperationException(
      "ShiftedInternalRow is a transient write-path view")
}
