package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES for a graft series, resolved by the
  * catalog as a 4th name part and served as a driver-local scan —
  * metadata queries cost ZERO Spark jobs, exactly like the engine's
  * own metadata operations (tombstone deletes, inline commits):
  *
  * {{{
  * SELECT * FROM g.prices.btc.segments   -- one row per manifest segment
  * SELECT * FROM g.prices.btc.history    -- one row per changelog revision
  * SELECT * FROM g.prices.btc.segments VERSION AS OF <rev>  -- pinned
  * }}}
  *
  * `segments` exposes the leaf manifest's planning state for the
  * series: visible index window (`start`/`stop`/`closed`), stored
  * data window, row count, backing parquet files (empty for
  * manifest-inline micro-writes and tombstones), and which
  * data-skipping stats are present. `history` is the joinable form of
  * `CALL sys.history`, scoped to the series: revision ids usable with
  * `VERSION AS OF`, plus the series' segment/row counts at each
  * revision. Both honor TIMESTAMP/VERSION AS OF through the same
  * changelog clock as the data table.
  *
  * The reference inspects this state imperatively (`lakota ls`,
  * `Series.segments()` in lakota/series.py); the SQL-first engine
  * makes it a relation you can filter, join and aggregate — e.g.
  * `sum(rows)` over `segments` is the zero-job row count for an
  * append-only series, and joining `history` to a `VERSION AS OF`
  * read reconciles a snapshot against its commit.
  *
  * NOTE `rows` is the segment's PLANNING length: splice truncation
  * narrows the visible [start, stop] window but keeps lengths
  * unchanged (reference behavior, lakota/commit.py:263-359), so
  * after an overlay or range delete clips a segment, `sum(rows)` is
  * an UPPER BOUND on the visible row count — same contract as the
  * engine's own planner (and the reason the manifest count-pushdown
  * refuses clipped manifests).
  */
final class GraftMetaTable(rootUri: String, collectionName: String,
    seriesLabel: String, kind: String, beforeMs: Option[Long])
    extends Table with SupportsRead {

  private def collection: graft.api.Collection = {
    val repo = new graft.api.Repo(rootUri, SparkSession.active)
    repo.collection(collectionName).getOrElse(
      throw new IllegalArgumentException(
        s"graft: no collection '$collectionName' under $rootUri"))
  }

  override def name(): String =
    s"graft.`$rootUri`.$collectionName.$seriesLabel.$kind"

  override def schema(): StructType = kind match {
    case "segments" => GraftMetaTable.segmentsSchema
    case "history" => GraftMetaTable.historySchema
    case other => throw new IllegalArgumentException(
      s"graft: unknown metadata table '$other' " +
        "(expected: segments, history)")
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val out = schema() // validates `kind` eagerly at resolution
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = computeRows()
        override def description(): String = name()
      }
    }
  }

  private def str(s: String): UTF8String = UTF8String.fromString(s)
  private def keyRepr(k: graft.core.IndexKey): UTF8String =
    str(k.values.mkString("[", ",", "]"))

  private def computeRows(): Array[InternalRow] = kind match {
    case "segments" =>
      val m = collection.manifest(beforeMs)
        .getOrElse(graft.core.Manifest(collection.schema, Vector.empty))
      m.rows.iterator.zipWithIndex
        .filter(_._1.label == seriesLabel)
        .map { case (r, pos) =>
          new GenericInternalRow(Array[Any](
            pos,
            keyRepr(r.start),
            keyRepr(r.stop),
            str(r.closed.short), // manifest convention: n / r / l / b
            r.length,
            new GenericArrayData(r.files.map(str).toArray[Any]),
            r.inline.isDefined,
            r.dataStart.map(keyRepr).orNull,
            r.dataStop.map(keyRepr).orNull,
            r.vstats.isDefined,
            r.vsums.isDefined))
        }.toArray
    case "history" =>
      val c = collection
      c.changelog.log(beforeMs).iterator.map { r =>
        val m = c.decodeCached(r)
        val mine = m.rows.filter(s =>
          s.label == seriesLabel && s.hasData)
        new GenericInternalRow(Array[Any](
          str(r.child),
          str(r.parent),
          r.epochMs * 1000L, // micros for TimestampType
          r.isLeaf,
          mine.length.toLong,
          mine.map(_.length).sum))
      }.toArray
  }
}

object GraftMetaTable {
  /** the metadata table names `loadTable` recognizes as a 4th part */
  val kinds: Set[String] = Set("segments", "history")

  val segmentsSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("start", StringType, nullable = false),
    StructField("stop", StringType, nullable = false),
    StructField("closed", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("files", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("is_inline", BooleanType, nullable = false),
    StructField("data_start", StringType, nullable = true),
    StructField("data_stop", StringType, nullable = true),
    StructField("has_value_stats", BooleanType, nullable = false),
    StructField("has_value_sums", BooleanType, nullable = false)))

  val historySchema: StructType = StructType(Seq(
    StructField("revision", StringType, nullable = false),
    StructField("parent", StringType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("is_leaf", BooleanType, nullable = false),
    StructField("segments", LongType, nullable = false),
    StructField("rows", LongType, nullable = false)))
}
