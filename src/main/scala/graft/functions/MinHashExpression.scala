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
