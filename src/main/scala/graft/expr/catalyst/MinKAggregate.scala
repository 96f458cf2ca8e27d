package graft.expr.catalyst

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-k aggregate over (h bigint, v double) pairs — the
  * deterministic-uniform-sample primitive behind
  * [[graft.ops.Sketch.minKSample]]: keep the `m` entries with the
  * SMALLEST (h, v) under the total order (h asc, then v asc with the
  * nan-safe double order, NaN greatest). With `h` a salted xxhash64 of
  * a unique row id, the kept set is a uniform row sample that is
  *
  *  - MERGEABLE: min-k of a union is the min-k of the per-part min-ks,
  *    so map-side partial aggregation ships m entries per partition
  *    instead of the group's rows (the [[TopKByScore]] scale shape);
  *  - DETERMINISTIC: the same rows win under any partitioning, any
  *    arrival order, and any engine — a DuckDB ROW_NUMBER over the
  *    restated hash reproduces the sample bit-for-bit (contrast
  *    reservoir sampling, whose result depends on encounter order).
  *
  * Null-safe contract (matches TopKByScore): a null child or a null
  * h/v field is SKIPPED. Returns array<struct<h:bigint, v:double>>
  * sorted (h asc, v asc) — the selection order, NOT value order.
  */
case class MinKByHash(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKBuffer] {

  require(m > 0, "m must be positive")

  override def prettyName: String = "graft_min_k_by_hash"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MinKByHash.entryType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b))
        if a.dataType == LongType && b.dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires struct<h:bigint, v:double>, got ${other.sql}")
    }

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(m)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val x = child.eval(input)
    if (x != null) {
      val row = x.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.add(row.getLong(0), row.getDouble(1))
    }
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MinKBuffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (h, v) =>
      InternalRow(h, v)
    }.toArray[Any])
  }

  override def serialize(buf: MinKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MinKBuffer = MinKBuffer.fromBytes(m, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinKByHash {
  val entryType: StructType = StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))
}

/** m-bounded max-heap on (h, v) so the WORST kept entry (largest) is at
  * the root; beats-root check is O(1), insert O(log m). */
final class MinKBuffer(m: Int) {
  private var n = 0
  private val hs = new Array[Long](m)
  private val vs = new Array[Double](m)

  /** nan-safe double order (see TopKBuffer.cmpScore): NaN == NaN, NaN
    * ABOVE every number — in this ASC-keeps-smallest aggregate a NaN
    * value ranks as the largest (last kept), exactly like an asc
    * window sort; primitive < alone would let a NaN at the root block
    * every replacement. */
  @inline private def cmpV(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else if (a == b) 0
    else {
      val an = java.lang.Double.isNaN(a)
      val bn = java.lang.Double.isNaN(b)
      if (an && bn) 0 else if (an) 1 else -1
    }

  /** true if (h1, v1) ranks WORSE (larger) than (h2, v2). */
  @inline private def worse(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    if (h1 != h2) h1 > h2 else cmpV(v1, v2) > 0

  def add(h: Long, v: Double): Unit = {
    if (n < m) {
      hs(n) = h; vs(n) = v; n += 1
      siftUp(n - 1)
    } else if (worse(hs(0), vs(0), h, v)) {
      hs(0) = h; vs(0) = v
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(hs(i), vs(i), hs(p), vs(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < n && worse(hs(l), vs(l), hs(w), vs(w))) w = l
      if (r < n && worse(hs(r), vs(r), hs(w), vs(w))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val th = hs(a); hs(a) = hs(b); hs(b) = th
    val tv = vs(a); vs(a) = vs(b); vs(b) = tv
  }

  def mergeFrom(o: MinKBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.hs(i), o.vs(i)); i += 1 }
  }

  /** selection order: (h asc, v asc nan-safe). */
  def sortedEntries: Seq[(Long, Double)] =
    (0 until n).map(i => (hs(i), vs(i)))
      .sortWith { case ((h1, v1), (h2, v2)) =>
        if (h1 != h2) h1 < h2 else cmpV(v1, v2) < 0
      }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(hs(i)); bb.putDouble(vs(i)); i += 1 }
    bb.array()
  }
}

object MinKBuffer {
  def fromBytes(m: Int, bytes: Array[Byte]): MinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val c = bb.getInt
    val buf = new MinKBuffer(m)
    var i = 0
    while (i < c) { buf.add(bb.getLong, bb.getDouble); i += 1 }
    buf
  }
}
