package graft.expr.catalyst

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row zlib sizing for the compression-ratio quality signal
  * (Gopher / RefinedWeb use deflate ratio as a cheap repetition &
  * boilerplate detector: heavily repetitive text compresses far below
  * natural prose). The KERNEL is deterministic for a fixed JVM (zlib
  * level + strategy pinned); the exact byte count is
  * zlib-build-specific, so the driver-visible oracle states BOUNDS
  * (positivity, the zlib worst-case expansion envelope, the
  * doubled-text theorem) rather than exact sizes — the same posture as
  * the approx sketches — while the spec asserts exact planted-string
  * behavior in-JVM. */
object DeflateKernel {
  // one Deflater per (thread, level): Deflater wraps native zlib state
  // whose alloc/free per ROW would dominate the kernel; reset() reuses
  // the native stream. Levels are tiny ints -> a 10-slot array. On an
  // executor the slot registers a task-completion listener that end()s
  // the native stream and clears the slot (ADVICE r9: ThreadLocal-only
  // pooling held zlib state until thread death) — one alloc per
  // (task, level), amortized over the task's rows. Driver-side eval
  // (constant folding, no TaskContext) keeps the bounded thread pool.
  private val pool = new ThreadLocal[Array[Deflater]] {
    override def initialValue(): Array[Deflater] = new Array[Deflater](10)
  }

  /** Size in bytes of the zlib-compressed UTF-8 of `s` at `level`. */
  def size(s: UTF8String, level: Int): Long = {
    val input = s.getBytes
    val ds = pool.get()
    var d = ds(level)
    if (d == null) {
      d = new Deflater(level, false); ds(level) = d
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        // runs on the task's own thread: same ThreadLocal array
        val arr = pool.get()
        val dd = arr(level)
        if (dd != null) { arr(level) = null; dd.end() }
      }
    }
    d.reset()
    d.setInput(input)
    d.finish()
    var total = 0L
    val out = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(out)
    total
  }
}

/** bigint zlib-compressed size of a string — whole-stage-codegen
  * compatible (one static kernel call per row, no shuffle, the
  * embarrassingly-parallel quality-signal shape). */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, s"deflate level must be in [1, 9], got $level")

  override def prettyName: String = "graft_deflate_size"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    DeflateKernel.size(t.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.DeflateKernel.size($c, $level);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
