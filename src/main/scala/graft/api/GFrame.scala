package graft.api

import graft.core.{Closed, GSchema}
import graft.engine.{Ops, SparkVals}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's Frame verbs (lakota/frame.py) over a Spark
  * DataFrame, so code written against the reference API ports
  * line-for-line:
  *
  * {{{
  *   series.gframe()
  *     .mask("(< self.value 10)")                    // Frame.mask
  *     .sliceIndex("2024-01-10", "2024-01-20")       // Frame.slice_index
  *     .reduce("day" -> "(floor self.ts 'D')",
  *             "total" -> "(sum self.value)")        // Frame.reduce
  *     .df                                           // Frame.df
  * }}}
  *
  * Everything is LAZY (each verb composes the logical plan; Catalyst
  * optimizes the whole chain), unlike the reference's eager NumPy
  * arrays — the one semantic difference, and the point: the same
  * chain runs unchanged on a 100 TB series.
  */
final case class GFrame(df: DataFrame, schema: GSchema) {

  private def idxCols = schema.idxNames.map(col)

  /** Frame.mask: boolean s-expression filter. */
  def mask(expr: String): GFrame = copy(df = Ops.mask(df, expr))

  /** Frame.reduce with named outputs: non-aggregate expressions are
    * group keys, aggregates compute per group; no aggregates = plain
    * projection (reference test_reduce_without_agg semantics). */
  def reduce(outputs: (String, String)*): GFrame =
    copy(df = Ops.reduce(df, outputs, schema.idxNames))

  /** Frame.reduce positional form: bare column names or s-exprs. */
  def reduceExprs(exprs: String*): GFrame =
    copy(df = Ops.reduce(df, exprs: _*))

  /** Frame.slice_index: index-value range with closed-bound algebra. */
  def sliceIndex(start: Any = null, stop: Any = null,
      closed: Closed = Closed.Left): GFrame = {
    val s = Option(start).map(v => graft.core.IndexKey(Vector(
      SparkVals.parseBound(schema.idx.head.dtype, v)))).orNull
    val e = Option(stop).map(v => graft.core.IndexKey(Vector(
      SparkVals.parseBound(schema.idx.head.dtype, v)))).orNull
    copy(df = df.filter(
      SparkVals.rangePredicate(schema.idx, idxCols, s, e, closed)))
  }

  /** Frame.slice: positional [start, stop) over index order. Spark's
    * offset/limit are Int-bounded, so out-of-range slices fail loudly
    * instead of silently wrapping past 2^31 rows. */
  def slice(start: Long, stop: Long): GFrame = {
    require(start >= 0 && stop >= start && stop <= Int.MaxValue,
      s"slice [$start, $stop) out of supported range [0, 2^31)")
    copy(df = df.orderBy(idxCols: _*)
      .offset(start.toInt).limit((stop - start).toInt))
  }

  /** Frame.sorted: total order by the index. */
  def sorted: GFrame = copy(df = df.orderBy(idxCols: _*))

  /** Frame.concat. */
  def concat(others: GFrame*): GFrame =
    copy(df = others.foldLeft(df)((acc, o) => acc.unionByName(o.df)))

  /** Frame.select / drop / rename. */
  def select(cols: String*): GFrame = copy(df = df.select(
    cols.map(col): _*))
  def drop(cols: String*): GFrame = copy(df = df.drop(cols: _*))
  def rename(mapping: (String, String)*): GFrame =
    copy(df = mapping.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to) })

  /** Frame.start / Frame.stop: first/last index key (actions). */
  def start(): Option[Seq[Any]] = boundRow(asc = true)
  def stop(): Option[Seq[Any]] = boundRow(asc = false)
  private def boundRow(asc: Boolean): Option[Seq[Any]] = {
    val ordered =
      if (asc) df.orderBy(idxCols: _*)
      else df.orderBy(idxCols.map(_.desc): _*)
    ordered.select(idxCols: _*).limit(1).collect()
      .headOption.map(_.toSeq)
  }

  /** Frame.empty (action). */
  def empty: Boolean = df.isEmpty

  /** Frame.__len__ (action). */
  def length: Long = df.count()
}
