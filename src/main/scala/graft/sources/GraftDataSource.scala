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
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def resolve(options: CaseInsensitiveStringMap): GraftTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft: missing 'path' option"))
    val clct = Option(options.get("collection")).getOrElse(
      throw new IllegalArgumentException(
        "graft: missing 'collection' option"))
    val series = Option(options.get("series")).getOrElse("_")
    val beforeMs = Option(options.get("before")).map { s =>
      try s.toLong
      catch {
        case _: NumberFormatException =>
          try java.time.Instant.parse(s).toEpochMilli // offset/Z forms
          catch {
            case _: java.time.format.DateTimeParseException =>
              // bare local date/datetime -> UTC (engine convention)
              val t = s.replace(" ", "T") match {
                case d if d.length == 10 => d + "T00:00:00"
                case d => d
              }
              java.time.LocalDateTime.parse(t)
                .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          }
      }
    }
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
    extends Table with SupportsRead {

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
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftScanBuilder(this, beforeMs,
      options.getOrDefault("stream.starting", "earliest") == "latest")
}

/** Test/diagnostic probe: records how the LAST planned graft scan
  * pruned (covering vs total manifest segments). */
object GraftScanProbe {
  @volatile var lastSegmentsScanned: Int = -1
  @volatile var lastSegmentsTotal: Int = -1
  @volatile var lastPushed: Seq[String] = Nil
  /** decode-path counters (local-mode visible; diagnostics only) */
  val vectorizedOpens = new java.util.concurrent.atomic.AtomicLong
  val fallbackOpens = new java.util.concurrent.atomic.AtomicLong
}

class GraftScanBuilder(table: GraftTable, beforeMs: Option[Long],
    streamStartLatest: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var startB: Any = null
  private var startClosed = true
  private var stopB: Any = null
  private var stopClosed = true
  private var pushed: Array[Filter] = Array.empty
  private var required: Option[StructType] = None

  private def idxHead: String = table.gschema.idx.head.name

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ GreaterThan(c, v) if c == idxHead =>
        usable += f; tighten(lo = v, loClosed = false)
      case f @ GreaterThanOrEqual(c, v) if c == idxHead =>
        usable += f; tighten(lo = v, loClosed = true)
      case f @ LessThan(c, v) if c == idxHead =>
        usable += f; tighten(hi = v, hiClosed = false)
      case f @ LessThanOrEqual(c, v) if c == idxHead =>
        usable += f; tighten(hi = v, hiClosed = true)
      case f @ EqualTo(c, v) if c == idxHead =>
        usable += f
        tighten(lo = v, loClosed = true)
        tighten(hi = v, hiClosed = true)
      case _ => ()
    }
    pushed = usable.toArray
    filters // everything stays residual: Spark re-applies above scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** keep the tightest bound seen (kernel-compared) */
  private def tighten(lo: Any = null, loClosed: Boolean = true,
      hi: Any = null, hiClosed: Boolean = true): Unit = {
    val dt = table.gschema.idx.head.dtype
    def k(v: Any) = SparkVals.parseBound(dt, v)
    if (lo != null) {
      if (startB == null || dt.cmp(k(lo), k(startB)) > 0 ||
          (dt.cmp(k(lo), k(startB)) == 0 && !loClosed)) {
        startB = lo; startClosed = loClosed
      }
    }
    if (hi != null) {
      if (stopB == null || dt.cmp(k(hi), k(stopB)) < 0 ||
          (dt.cmp(k(hi), k(stopB)) == 0 && !hiClosed)) {
        stopB = hi; stopClosed = hiClosed
      }
    }
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = {
    val closed = Closed.Both.setLeft(startClosed).setRight(stopClosed)
    new GraftScan(table, startB, stopB, closed, beforeMs,
      required.getOrElse(table.schema()),
      pushed.map(_.toString).toSeq, streamStartLatest)
  }
}

class GraftScan(table: GraftTable, start: Any, stop: Any,
    closed: Closed, beforeMs: Option[Long], required: StructType,
    pushedDesc: Seq[String], streamStartLatest: Boolean = false)
    extends Scan with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Post-pruning statistics from the MANIFEST (no file IO): row
    * counts are recorded per segment at write time, so the join
    * planner sees the size of the data actually scanned — a graft
    * table filtered down to one segment broadcasts like the small
    * table it is. Clipped segments report their full stored length
    * (an upper bound — statistics are estimates). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows: Long = plannedSegments.map(_.meta.length).sum
    private val rowWidth: Long = table.gschema.cols.map(_.dtype match {
      case GType.StrT => 24L
      case GType.DateT => 4L
      case _ => 8L
    }).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * rowWidth)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  override def description(): String = {
    val segs = plannedSegments
    s"GraftScan ${table.name()} segments=${segs.length}/" +
      s"$totalSegments pushed=[${pushedDesc.mkString(", ")}]"
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
    val total = s.segments().count(_.meta.hasData)
    val covering = s.segments(start, stop, beforeMs, closed)
      .filter(_.meta.hasData)
    GraftScanProbe.lastSegmentsScanned = covering.length
    GraftScanProbe.lastSegmentsTotal = total
    GraftScanProbe.lastPushed = pushedDesc
    (covering, total)
  }

  override def planInputPartitions(): Array[InputPartition] =
    plannedSegments.flatMap(seg => GraftPlanning.partitionsFor(
      resolvedSeries, table.gschema,
      required.fields.map(_.name).toSeq, seg, null)).toArray

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(table, required, streamStartLatest)

  override def createReaderFactory(): PartitionReaderFactory =
    GraftPlanning.readerFactory()
}

/** Planning helpers shared by the batch scan and the micro-batch
  * stream: segment → InputPartitions, and the reader factory with
  * the task-side Hadoop conf Spark's parquet machinery needs. */
private[sources] object GraftPlanning {

  def covers(gs: GSchema, s: SegmentRead): Boolean =
    (s.meta.dataStart, s.meta.dataStop) match {
      case (Some(ds), Some(de)) =>
        val l = gs.cmpKey(s.start, ds)
        val r = gs.cmpKey(s.stop, de)
        (l < 0 || (l == 0 && s.closed.left)) &&
          (r > 0 || (r == 0 && s.closed.right))
      case _ => false
    }

  /** Partitions for one visible segment. `onlyFiles` (null = all)
    * restricts a multi-file segment row to a subset — the streaming
    * diff uses it to serve just the NEWLY-appeared files of a row.
    * Residual clip needs the index values even when pruned away:
    * read (requested ∪ index-if-clipping), emit requested positions.
    */
  def partitionsFor(s: graft.api.Series, gs: GSchema,
      reqNames: Seq[String], seg: SegmentRead,
      onlyFiles: Set[String]): Seq[InputPartition] = {
    val clct = s.collection
    val clip = !covers(gs, seg)
    val readNames =
      if (clip) (reqNames ++ gs.idxNames.filterNot(reqNames.contains))
      else reqNames
    val cols = readNames.map(n => gs(n))
    val outPos = reqNames.map(readNames.indexOf).toArray
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
          outPos, idxPos, bounds)
      }
  }

  def readerFactory(): PartitionReaderFactory = {
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
    new GraftReaderFactory(new SegmentWriter.SerConf(c))
  }
}

/** Streaming offset: ordinal into the collection's LINEARIZED
  * changelog plus the revision id at that ordinal. The id is the
  * stable anchor: if a concurrent branch's revisions interleave into
  * the linearization (shifting ordinals), the offset still resolves
  * to the same revision by id; the ordinal is the fallback when the
  * anchored revision was trimmed/squashed away. */
final case class GraftStreamOffset(n: Long, rev: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    s"""{"n":$n,"rev":"$rev"}"""
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
  * history; the default replays the full series. The reference has
  * no streaming surface at all; this reuses the batch connector's
  * partitions and readers wholesale. */
class GraftMicroBatchStream(table: GraftTable, required: StructType,
    startingLatest: Boolean)
    extends org.apache.spark.sql.connector.read.streaming
      .MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // one resolution per stream; the changelog refreshes per poll
  private lazy val series = table.series
  private def changelog = series.collection.changelog

  private def logNow(): Seq[graft.core.Revision] = {
    changelog.refresh()
    changelog.log()
  }

  private def offsetAt(log: Seq[graft.core.Revision]): GraftStreamOffset =
    GraftStreamOffset(log.length.toLong,
      log.lastOption.map(_.child).getOrElse(""))

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
  override def initialOffset(): Offset =
    if (startingLatest) offsetAt(logNow())
    else GraftStreamOffset(0L, "")
  override def deserializeOffset(json: String): Offset = {
    val n = "\"n\":(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(0L)
    val rev = "\"rev\":\"([^\"]*)\"".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    GraftStreamOffset(n, rev)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val a = start.asInstanceOf[GraftStreamOffset]
    val b = end.asInstanceOf[GraftStreamOffset]
    if (b.n <= a.n && b.rev == a.rev) return Array.empty
    val endM = manifestOf(b)
    if (endM.isEmpty) return Array.empty
    val startM = manifestOf(a)
    val label = series.label
    val prevFiles: Set[String] =
      startM.map(_.allFiles).getOrElse(Set.empty)
    val prevRows: Set[graft.core.SegmentMeta] =
      startM.map(_.rows.filter(_.label == label).toSet)
        .getOrElse(Set.empty)
    val gs = table.gschema
    val reqNames = required.fields.map(_.name).toSeq
    endM.get.rows.filter(r => r.label == label && r.hasData).flatMap {
      meta =>
        val seg = SegmentRead(meta, meta.start, meta.stop, meta.closed)
        if (meta.inline.isDefined) {
          if (prevRows.contains(meta)) Nil
          else GraftPlanning.partitionsFor(series, gs, reqNames, seg,
            null)
        } else {
          val fresh = meta.files.filterNot(prevFiles.contains).toSet
          if (fresh.isEmpty) Nil
          else GraftPlanning.partitionsFor(series, gs, reqNames, seg,
            fresh)
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
    outPos: Array[Int], idxPos: Array[Int], clip: GraftClip)
    extends InputPartition

final case class GraftInlinePartition(rows: Vector[Vector[Any]],
    srcCols: Vector[String], readNames: Vector[String],
    dtypeNames: Vector[String], defaults: Vector[Any],
    outPos: Array[Int], idxPos: Array[Int], clip: GraftClip)
    extends InputPartition

class GraftReaderFactory(conf: SegmentWriter.SerConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case fp: GraftFilePartition => new GraftFileReader(fp, conf)
    case ip: GraftInlinePartition => new GraftInlineReader(ip)
  }
}

private object GraftRead {
  def dtypeOf(name: String): GType =
    GType.all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"bad dtype $name"))

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

  def project(slots: Array[Any], outPos: Array[Int]): InternalRow = {
    if (outPos.length == slots.length &&
        outPos.indices.forall(i => outPos(i) == i))
      new GenericInternalRow(slots.clone())
    else {
      val out = new Array[Any](outPos.length)
      var i = 0
      while (i < outPos.length) { out(i) = slots(outPos(i)); i += 1 }
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
class GraftFileReader(p: GraftFilePartition, conf: SegmentWriter.SerConf)
    extends PartitionReader[InternalRow] {
  import GraftRead._

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
  private val vec: org.apache.spark.sql.execution.datasources.parquet
      .VectorizedParquetRecordReader = {
    try {
      val c = new org.apache.hadoop.conf.Configuration(conf.value)
      val reqStruct = org.apache.spark.sql.types.StructType(
        p.physNames.zip(dtypes).map { case (n, dt) =>
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
      val path = new Path(p.uri)
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
      GraftScanProbe.vectorizedOpens.incrementAndGet()
      r
    } catch { case scala.util.control.NonFatal(e) =>
      if (sys.env.contains("GRAFT_DEBUG_VEC")) e.printStackTrace()
      GraftScanProbe.fallbackOpens.incrementAndGet(); null }
  }

  // ---- fallback: parquet-mr row materializer -----------------------
  private lazy val support = new ReadSupport[Array[Any]] {
    override def init(ctx: InitContext): ReadSupport.ReadContext = {
      val fileSchema = ctx.getFileSchema
      val byName = fileSchema.getFields.asScala.map(f =>
        f.getName -> f).toMap
      val b = Types.buildMessage()
      p.physNames.foreach(n => byName.get(n).foreach(b.addField))
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

  private lazy val reader: ParquetReader[Array[Any]] =
    ParquetReader.builder(support, new Path(p.uri))
      .withConf(conf.value).build()

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
    current = project(slots, p.outPos)
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

  override def next(): Boolean = {
    if (vec != null) {
      while (vec.nextKeyValue()) {
        val row = vec.getCurrentValue.asInstanceOf[InternalRow]
        if (identityOut) { current = row; return true }
        fillSlots(row)
        if (finish()) return true
      }
      false
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
    if (vec != null) vec.close() else reader.close()
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
        current = project(slots, p.outPos)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
