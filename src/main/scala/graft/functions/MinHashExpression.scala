package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused minhash-signature kernel.
  *
  * Computes the 8 minhash values of a document's distinct 3-word
  * shingles in ONE pass over the raw UTF-8 bytes: because tokens are
  * split on a single space, every 3-token shingle joined by spaces is
  * exactly a substring of the original text, so the kernel walks the
  * byte array once, md5-hashes each shingle's byte range and folds the
  * 8 running minima — no token array, no shingle strings, no
  * intermediate collections. (Dedup is unnecessary for a min-fold:
  * min over a multiset equals min over its support.)
  *
  * Integer math is identical to the SQL formulation in
  * `QueriesSim.sparkSigInline` and the DuckDB oracle:
  * h = first 8 md5 hex chars as unsigned int, mh_j = min((a_j*h+b_j)
  * mod P). a_j < 1e6 keeps a_j*h below 2^52 — exact in any engine.
  */
object MinHashImpl {
  val P = 2147483647L
  val A: Array[Long] = Array(999983L, 999979L, 999961L, 999959L,
    999953L, 999931L, 999917L, 999907L)
  val B: Array[Long] = Array(15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L, 141650939L)

  // one digest instance per executor thread: getInstance("MD5") is a
  // synchronized provider lookup + allocation — per ROW that would be
  // the kernel's dominant cost; reset() makes an instance reusable
  private val localMd =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private[functions] def md5(): java.security.MessageDigest = localMd.get()

  /** null when the text has fewer than 3 tokens (mirrors the SQL
    * `WHERE size(t) >= 3` gate) */
  def sig(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    // token start offsets: 0 and every byte after a 0x20. In UTF-8 a
    // 0x20 byte can only be the space character itself.
    var nTok = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') nTok += 1
      i += 1
    }
    if (nTok < 3) return null
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val mins = Array.fill(8)(Long.MaxValue)
    val md = localMd.get()
    var s = 0
    while (s + 2 < nTok) {
      // shingle = tokens s..s+2 == bytes[starts(s), end of token s+2)
      val from = starts(s)
      val until =
        if (s + 3 < nTok) starts(s + 3) - 1 else bytes.length
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < 8) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** Fused shingle-set kernel: the distinct 3-word shingle hashes of a
  * document as a SORTED array<bigint>, in the same single byte-walk as
  * [[MinHashImpl]] (same h = md5-top-32-bits formula, so the values
  * are exactly the `hv` column of the exploded shingle table). Sorted
  * + distinct output makes pairwise set intersection a linear merge —
  * the LSH verify's inner loop at corpus scale. Null for texts of
  * fewer than 3 tokens (mirrors the SQL `size(t) >= 3` gate).
  */
object ShingleImpl {
  def hashes(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') nTok += 1
      i += 1
    }
    if (nTok < 3) return null
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val hs = new Array[Long](nTok - 2)
    val md = MinHashImpl.md5()
    var s = 0
    while (s + 2 < nTok) {
      val from = starts(s)
      val until =
        if (s + 3 < nTok) starts(s + 3) - 1 else bytes.length
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      hs(s) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      s += 1
    }
    java.util.Arrays.sort(hs)
    // dedup in place (sorted)
    var w = 0
    i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** |a ∩ b| for two SORTED long arrays, as a linear merge — no hash
    * set, no result array (Spark's array_intersect builds both). */
  def intersectSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** In-row term-count kernel: the whitespace-token histogram of one
  * document as array<struct<term, cnt>> — map-side combine taken to
  * row grain. The inverted-index build (`doc_terms`) explodes this
  * directly instead of exploding every token occurrence into an
  * aggregate: the explode emits one row per DISTINCT term (~20x fewer
  * at typical repetition), and no groupBy shuffle runs at all.
  * Tokenization matches `split(text, ' ', -1)` exactly, including
  * empty tokens (and the single empty token of an empty text), so the
  * SQL-aggregate oracle stays bit-identical. First-occurrence output
  * order (deterministic; every consumer aggregates).
  */
object TermCountsImpl {
  def counts(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val c = m.get(tok)
        if (c == null) m.put(tok, Array(1L)) else c(0) += 1
        start = i + 1
      }
      i += 1
    }
    val rows = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      rows(j) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(rows)
  }
}

/** Fused simhash kernel: one walk over the raw UTF-8 bytes hashes
  * each DISTINCT word token (dedup on token content — two distinct
  * tokens colliding to one hash still vote twice, exactly like the
  * SQL `array_distinct` formulation), accumulates the 32 ±1 bit
  * votes, and recombines the sign vector into the 32-bit simhash.
  * Token split on a single 0x20 byte with empty tokens KEPT, the
  * `split(text, ' ', -1)` contract; hash = first 8 md5 hex chars as
  * unsigned int (the corpus-wide convention). */
object SimHashImpl {
  def simhash(text: UTF8String): Long = {
    val bytes = text.getBytes
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](32)
    val md = MinHashImpl.md5()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val tok = new String(bytes, start, i - start,
          java.nio.charset.StandardCharsets.UTF_8)
        if (seen.add(tok)) {
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var b = 0
          while (b < 32) {
            if (((h >> b) & 1L) == 1L) counts(b) += 1
            else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

/** `graft_simhash(text)` -> the 32-bit simhash as bigint (see
  * [[SimHashImpl]]). Whole-stage-codegen'd; replaces the
  * `aggregate`/`zip_with` lambda chain (interpreted higher-order
  * functions, a 32-slot array allocation per token) on the q26/q152
  * hot path. */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashImpl.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash = copy(child = newChild)
}

/** `graft_termcounts(text)` -> array<struct<term string, cnt bigint>>
  * (see [[TermCountsImpl]]). */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_termcounts"

  override def nullSafeEval(input: Any): Any =
    TermCountsImpl.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCountsImpl.counts($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : TermCounts = copy(child = newChild)
}

/** `graft_minhash(text)` -> array<bigint> of the 8 signature values,
  * or null for texts of fewer than 3 tokens. Whole-stage-codegen'd:
  * the scan emits signatures directly — the preferred 100 TB shape
  * versus the `transform`/`aggregate` lambda chain (interpreted
  * higher-order functions, per-row array allocations).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.sig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("mhsig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.MinHashImpl.sig($c);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

/** `graft_shingles(text)` -> sorted distinct array<bigint> of 3-word
  * shingle hashes (null below 3 tokens). See [[ShingleImpl]]. */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleImpl.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("shingles")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.ShingleImpl.hashes($c);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashes = copy(child = newChild)
}

/** `graft_isect(a, b)` -> bigint |a ∩ b| over two SORTED long arrays
  * (the [[ShingleHashes]] output contract) as a fused linear merge. */
case class SortedIntersectSize(
    left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> arguments, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean =
    left.nullable || right.nullable
  override def prettyName: String = "graft_isect"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleImpl.intersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ShingleImpl.intersectSize($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
