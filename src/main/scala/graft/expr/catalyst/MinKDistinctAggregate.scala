package graft.expr.catalyst

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-k aggregate over DISTINCT long hashes — the KMV
  * (k-minimum-values / theta) sketch primitive behind
  * [[graft.ops.Sketch.kmvSetOps]]: keep the `k` SMALLEST DISTINCT
  * values of a hash column. Distinctness is the whole point —
  * [[MinKByHash]] samples rows (unique ids, duplicates impossible),
  * while a KMV sketch summarizes a VALUE SET, so a hot key arriving a
  * billion times must occupy one slot, not k.
  *
  * Mergeable (min-k of a union == min-k over the per-part min-ks) and
  * deterministic: the kept set is a pure function of the input value
  * set, independent of partitioning, arrival order, and engine — a
  * DuckDB ROW_NUMBER over the restated hash reproduces it exactly, so
  * KMV estimates are value-exact cross-engine where HLL's register
  * estimates are assertion-gated.
  *
  * Null children are SKIPPED (the MinKByHash contract). Returns
  * array<bigint> sorted ascending.
  */
case class MinKDistinctHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKDistinctBuffer] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_min_k_distinct"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a bigint hash child, got ${other.sql}")
    }

  override def createAggregationBuffer(): MinKDistinctBuffer =
    new MinKDistinctBuffer(k)

  override def update(buf: MinKDistinctBuffer, input: InternalRow): MinKDistinctBuffer = {
    val x = child.eval(input)
    if (x != null) buf.add(x.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKDistinctBuffer, other: MinKDistinctBuffer): MinKDistinctBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MinKDistinctBuffer): Any =
    new GenericArrayData(buf.sortedValues.toArray[Any])

  override def serialize(buf: MinKDistinctBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MinKDistinctBuffer =
    MinKDistinctBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKDistinctHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKDistinctHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** k-bounded max-heap of distinct longs: the WORST kept value (largest)
  * is at the root, a bounded hash set gives O(1) duplicate rejection.
  * Once the buffer is full, a value ≥ the root can never belong to the
  * min-k of the distinct set (the kept set only ever gets smaller-
  * valued), so skipping it — including a re-arrival of an evicted
  * value — is exact, not approximate. */
final class MinKDistinctBuffer(k: Int) {
  private var n = 0
  private val hs = new Array[Long](k)
  private val seen = new java.util.HashSet[java.lang.Long](k * 2)

  def add(h: Long): Unit = {
    if (seen.contains(h)) return
    if (n < k) {
      hs(n) = h; n += 1; seen.add(h)
      siftUp(n - 1)
    } else if (h < hs(0)) {
      seen.remove(hs(0))
      hs(0) = h; seen.add(h)
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (hs(i) > hs(p)) { val t = hs(i); hs(i) = hs(p); hs(p) = t; i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < n && hs(l) > hs(w)) w = l
      if (r < n && hs(r) > hs(w)) w = r
      if (w == i) return
      val t = hs(i); hs(i) = hs(w); hs(w) = t; i = w
    }
  }

  def mergeFrom(o: MinKDistinctBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.hs(i)); i += 1 }
  }

  def sortedValues: Seq[Long] = (0 until n).map(hs).sorted

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(hs(i)); i += 1 }
    bb.array()
  }
}

object MinKDistinctBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): MinKDistinctBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val c = bb.getInt
    val buf = new MinKDistinctBuffer(k)
    var i = 0
    while (i < c) { buf.add(bb.getLong); i += 1 }
    buf
  }
}
