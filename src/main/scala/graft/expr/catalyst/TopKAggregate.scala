package graft.expr.catalyst

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score double, id long) pairs — the
  * argmax-k `TypedImperativeAggregate` reserved in SURVEY §7.3.
  *
  * The window formulation (`row_number() over (order by score desc)`)
  * must SORT every candidate row per group before discarding all but k;
  * this aggregate keeps a k-bounded buffer per group with map-side
  * partial aggregation, so a 10^9-candidate group costs O(n log k) and
  * ships k rows per partition through the shuffle instead of n.
  *
  * Ordering contract (matches the oracle-checked window queries):
  * higher score first; ties broken by LOWER id. Null scores are
  * skipped. Returns array<struct<score:double, id:bigint>> sorted
  * best-first; callers explode with posexplode to recover ranks.
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_top_k"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByScore.entryType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires struct<score:double, id:bigint>, got ${other.sql}")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.add(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKByScore {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))
}

/** k-bounded min-heap on (score, -id) so the worst kept entry is at the
  * root; beats-root check is O(1), insert O(log k). */
final class TopKBuffer(k: Int) {
  private var n = 0
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)

  /** Spark's nan-safe double total order (Utils.nanSafeCompareDoubles):
    * NaN == NaN, NaN ABOVE every number (so NaN ranks FIRST in the
    * score-desc output, exactly like a desc window sort), ±0.0 equal.
    * Primitive < / == alone returns false for every NaN comparison,
    * which would let a NaN at the heap root permanently block
    * replacements and sort NaN entries last — diverging from the
    * window formulation this aggregate is contracted to match. */
  @inline private def cmpScore(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else if (a == b) 0
    else { // at least one NaN
      val an = java.lang.Double.isNaN(a)
      val bn = java.lang.Double.isNaN(b)
      if (an && bn) 0 else if (an) 1 else -1
    }

  /** true if (s1, id1) ranks WORSE than (s2, id2): lower score, or equal
    * score with higher id. */
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = cmpScore(s1, s2)
    c < 0 || (c == 0 && id1 > id2)
  }

  def add(s: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
  }

  /** best-first: score desc (NaN first, the nan-safe order), id asc. */
  def sortedEntries: Seq[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i)))
      .sortWith { case ((s1, i1), (s2, i2)) =>
        val c = cmpScore(s1, s2)
        c > 0 || (c == 0 && i1 < i2)
      }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < m) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}
