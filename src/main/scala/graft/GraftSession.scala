package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expr.catalyst._

/** SparkSessionExtensions registering the engine's native expressions
  * as SQL functions, so the full surface is reachable from
  * `spark.sql(...)` (not just the Scala Column API):
  *
  *   graft_dot(a, b)               Σ aᵢ·bᵢ (fused kernel)
  *   graft_l2sq(a, b)              Σ (aᵢ−bᵢ)²
  *   graft_minhash_sig(text, n, k) MinHash signature array
  *   graft_lsh_buckets(v, b, t)    multi-table LSH bucket ids
  *   graft_q96_ratio(sp)           (sp/2^96)² at 50-digit context
  *   graft_quantize_int8(v)        int8 scalar quantization struct
  *   graft_shingles(text, n)       distinct word n-gram shingles
  *   graft_simhash64(text)         64-bit SimHash fingerprint
  *   graft_top_k(struct(s, id), k) bounded argmax-k aggregate
  *   graft_winnow_fps(text, k, w)  distinct winnowed fingerprints
  *   graft_cms_estimate(sk, key)   count-min sketch estimate
  *   graft_normalize(text, form)   Unicode NFC/NFD/NFKC/NFKD
  *
  * Enable with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal argument, got $other")
  }

  /** (name, usage, builder) for every registered function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "graft_dot(a, b) - dot product of float/double arrays",
      args => DotProduct(args(0), args(1))),
    ("graft_l2sq", "graft_l2sq(a, b) - squared euclidean distance",
      args => L2SquaredDistance(args(0), args(1))),
    ("graft_minhash_sig",
      "graft_minhash_sig(text, shingleSize, k) - MinHash signature",
      args => MinHashSignature(args(0),
        intArg(args(1), "graft_minhash_sig"), intArg(args(2), "graft_minhash_sig"))),
    ("graft_lsh_buckets",
      "graft_lsh_buckets(v, nBits, nTables) - multi-table LSH bucket ids",
      args => LshBuckets(args(0),
        intArg(args(1), "graft_lsh_buckets"), intArg(args(2), "graft_lsh_buckets"))),
    ("graft_q96_ratio", "graft_q96_ratio(sqrtPriceX96) - Q64.96 price ratio",
      args => Q96Ratio(args(0))),
    ("graft_shingles",
      "graft_shingles(text, n) - distinct word n-gram shingles",
      args => ShingleArray(args(0), intArg(args(1), "graft_shingles"))),
    ("graft_simhash64", "graft_simhash64(text) - 64-bit SimHash fingerprint",
      args => SimHash64(args(0))),
    ("graft_quantize_int8",
      "graft_quantize_int8(v) - struct(scale float, q array<tinyint>) int8 quantization",
      args => QuantizeInt8(args(0))),
    ("graft_top_k", "graft_top_k(struct(score, id), k) - bounded top-k by score",
      args => TopKByScore(args(0), intArg(args(1), "graft_top_k"))
        .toAggregateExpression()),
    ("graft_winnow_fps",
      "graft_winnow_fps(text, k, w) - distinct winnowed k-gram fingerprints",
      args => WinnowFingerprints(args(0),
        intArg(args(1), "graft_winnow_fps"), intArg(args(2), "graft_winnow_fps"))),
    ("graft_cms_estimate",
      "graft_cms_estimate(sketch, key) - count-min sketch frequency estimate",
      args => CmsEstimate(args(0), args(1))),
    ("graft_normalize",
      "graft_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') - Unicode normalization",
      args => UnicodeNormalize(args(0), args(1) match {
        case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
        case other => throw new IllegalArgumentException(
          s"graft_normalize expects a string literal form, got $other")
      })))

  /** Register into an EXISTING session (extensions only apply at
    * construction time). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftbridge.FunctionBridge
        .registerTemp(spark, name, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
}

/** Library session entrypoint with the engine's defaults: UTC, AQE with
  * skew handling + runtime coalescing, sized scan splits, graft SQL
  * functions.
  *
  * Scan/shuffle sizing posture for the 100 TB target:
  *  - `files.maxPartitionBytes` 256 MB: fewer, fuller scan tasks —
  *    columnar parquet decodes ~256 MB comfortably inside a few-GB
  *    executor; the default 128 MB doubles task-scheduling overhead on
  *    a 100 TB scan (800k→400k tasks) for no memory benefit.
  *  - `shufflePartitions` is the static ceiling; AQE coalesces small
  *    post-shuffle partitions to `advisoryPartitionSizeInBytes` (64 MB)
  *    at runtime, so oversizing the ceiling on a big cluster is safe
  *    and undersizing it is corrected per-stage.
  */
object GraftSession {
  def builder(appName: String = "graft",
              master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .withExtensions(new GraftExtensions)
}
