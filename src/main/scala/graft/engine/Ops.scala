package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frame-level analytic operators over DataFrames, mirroring the
  * reference's Frame.mask / Frame.reduce (lakota/frame.py:157-353)
  * with s-expression inputs.
  */
object Ops {

  /** Boolean-expression filter: `(= (% self.x 2) 0)` etc. */
  def mask(df: DataFrame, expr: String): DataFrame =
    df.filter(SExprCompiler.compile(expr))

  /** Group-by aggregate following Frame.reduce semantics: outputs are
    * (alias, s-expr) pairs; non-aggregate expressions become group
    * keys (evaluated first), aggregate expressions are computed per
    * group. Without any aggregate, this is a plain projection; without
    * any key, aggregates collapse to one row.
    */
  def reduce(df: DataFrame, outputs: Seq[(String, String)],
      orderKeys: Seq[String] = Nil): DataFrame = {
    val parsed = outputs.map { case (alias, src) =>
      (alias, src, SExprCompiler.isAggregate(src))
    }
    // ordering for first/last: caller-provided index columns, or every
    // frame column as a deterministic fallback (the index is a prefix
    // of the column order, so this matches index order with full-row
    // tiebreak among duplicate keys). A chained reduce may have
    // projected the index away — keep only the order keys that still
    // exist so the fallback kicks in instead of an unresolved-column
    // error
    val present = orderKeys.filter(df.columns.contains)
    val ordCols = (if (present.nonEmpty) present
      else df.columns.toSeq).map(col)
    def comp(src: String): Column =
      SExprCompiler.withOrdering(ordCols)(SExprCompiler.compile(src))
    val aggs = parsed.collect { case (a, src, true) => comp(src).as(a) }

    if (aggs.isEmpty)
      return df.select(parsed.map { case (a, src, _) =>
        comp(src).as(a) }: _*)

    // evaluate group keys first under collision-free internal names
    val keyed = parsed.zipWithIndex.collect {
      case ((a, src, false), i) => (a, s"_gk$i", comp(src))
    }
    val withKeys = df.select(
      df.columns.map(col).toSeq ++
        keyed.map { case (_, kn, c) => c.as(kn) }: _*)
    val grouped =
      if (keyed.isEmpty) withKeys.groupBy()
      else withKeys.groupBy(keyed.map(k => col(k._2)): _*)
    val out = grouped.agg(aggs.head, aggs.tail: _*)
    // column order + public aliases as requested
    out.select(parsed.map { case (a, _, isAgg) =>
      if (isAgg) col(a)
      else col(keyed.find(_._1 == a).get._2).as(a)
    }: _*)
  }

  /** reduce with positional syntax: bare column names or aliased
    * s-exprs; alias defaults to a sanitized form of the source. */
  def reduce(df: DataFrame, outputs: String*)(implicit d: DummyImplicit)
      : DataFrame =
    reduce(df, outputs.map { src =>
      val (_, aliasOpt) = SExprCompiler.compileAliased(src)
      val alias = aliasOpt.getOrElse(
        if (src.startsWith("self.")) src.stripPrefix("self.")
        else if (!src.contains('(')) src
        else src.replaceAll("[^A-Za-z0-9_]+", "_").stripPrefix("_")
          .stripSuffix("_"))
      (alias, src)
    })
}
