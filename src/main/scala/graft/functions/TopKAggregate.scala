package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.
  TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact top-k aggregate over a long column: `graft_topk(x, k)` →
  * the k largest values, descending.
  *
  * The buffer is a bounded min-heap, so partial (map-side) aggregation
  * keeps at most k candidates per group per partition and merges are
  * exact — the scale shape for "best k per group" over 100 TB, where
  * the window-function formulation (`row_number() OVER … <= k`) must
  * shuffle and sort EVERY row of every group. The guide's
  * TypedImperativeAggregate surface (mutable buffer + serialize/merge)
  * exists for exactly this kind of operator.
  */
case class TopKLong(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "graft_topk needs k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects an integral column, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer()
      : java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k)

  private def offer(buf: java.util.PriorityQueue[java.lang.Long],
      v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (buf.peek() < v) { buf.poll(); buf.add(v); () }
  }

  override def update(buf: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(b1: java.util.PriorityQueue[java.lang.Long],
      b2: java.util.PriorityQueue[java.lang.Long])
      : java.util.PriorityQueue[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next().longValue)
    b1
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next().longValue; i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    var l = 0; var r = arr.length - 1
    while (l < r) { val t = arr(l); arr(l) = arr(r); arr(r) = t
      l += 1; r -= 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.PriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(java.lang.Long.valueOf(bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKLong =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKLong =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TopKLong =
    copy(child = c)
}

object TopKLong {
  /** SQL builder: second argument must be a foldable int literal. */
  def fromExprs(exprs: Seq[Expression]): TopKLong = {
    require(exprs.length == 2, "graft_topk(col, k) takes two arguments")
    require(exprs(1).foldable, "graft_topk k must be a literal")
    val kv = exprs(1).eval()
    require(kv != null && kv.isInstanceOf[Number],
      s"graft_topk k must be a non-null integer literal, got $kv")
    TopKLong(exprs(0), kv.asInstanceOf[Number].intValue)
  }
}

/** Exact top-k ROWS aggregate — the engine half of the
  * `row_number() <= k` rewrite ([[graft.plans.RankToArgMin]]).
  *
  * Input is ONE struct expression whose first `nKeys` fields are the
  * ORDER BY key and whose remaining fields carry the row payload;
  * the buffer is a bounded heap of k copied rows compared on the key
  * fields (all-ascending or all-descending, matching the two default
  * window sort shapes), so partial aggregation holds ≤ k rows per
  * group per mapper and merges stay exact. `eval` returns the rows
  * as an array in rank order — `posexplode` downstream restores
  * (rank-1, row). The window formulation must sort EVERY row of
  * every group; this is O(n log k) map-side work with k-bounded
  * state — the 100 TB shape for "keep the best k per group".
  */
case class TopKRows(child: Expression, nKeys: Int, k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, "graft_topk_rows needs k > 0")
  require(nKeys > 0, "graft_topk_rows needs at least one key field")

  private def structType: StructType =
    child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case s: StructType if s.fields.length > nKeys =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_topk_rows expects struct(key…, payload…), got " +
          other.simpleString)
    }
  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_rows"

  /** rank order over the key prefix; generated (codegen) comparator */
  @transient private lazy val rankOrd:
      scala.math.Ordering[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending,
      BoundReference, Descending, SortOrder}
    val so = structType.fields.take(nKeys).zipWithIndex.map {
      case (f, i) =>
        SortOrder(BoundReference(i, f.dataType, f.nullable),
          if (asc) Ascending else Descending)
    }
    new org.apache.spark.sql.catalyst.expressions.codegen
      .LazilyGeneratedOrdering(so.toIndexedSeq)
  }

  /** heap keeps the WORST kept row at its head */
  private def heapOrd: java.util.Comparator[InternalRow] =
    rankOrd.reverse

  override def createAggregationBuffer()
      : java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k, heapOrd)

  private def offer(buf: java.util.PriorityQueue[InternalRow],
      r: InternalRow): Unit = {
    if (buf.size < k) { buf.add(r.copy()); () }
    else if (rankOrd.compare(r, buf.peek()) < 0) {
      buf.poll(); buf.add(r.copy()); ()
    }
  }

  override def update(buf: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(b1: java.util.PriorityQueue[InternalRow],
      b2: java.util.PriorityQueue[InternalRow])
      : java.util.PriorityQueue[InternalRow] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray(new Array[InternalRow](buf.size))
    java.util.Arrays.sort(arr, rankOrd)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  @transient private lazy val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(structType)

  override def serialize(buf: java.util.PriorityQueue[InternalRow])
      : Array[Byte] = {
    val rows = buf.toArray(new Array[InternalRow](buf.size))
    // getBytes returns the projection's SHARED backing array for
    // fixed-width schemas (exactly-sized UnsafeRow buffer) — clone
    // per row or every serialized entry aliases the last one
    val bytess = rows.map(r => toUnsafe(r).getBytes.clone())
    val bb = ByteBuffer.allocate(4 + bytess.map(_.length + 4).sum)
    bb.putInt(rows.length)
    bytess.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    val nFields = structType.fields.length
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(
        nFields)
      row.pointTo(b, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TopKRows =
    copy(child = c)
}
