package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.expr.catalyst.{DotProduct, L2SquaredDistance, RandomProject}

/** Embedding-vector Column helpers (north-star similarity surface —
  * SURVEY §2.11). Embeddings are first-class `array<float>` columns.
  *
  * The hot kernels (dot / l2) are fused native Catalyst expressions with
  * whole-stage codegen (graft.expr.catalyst.VectorExpressions) — the
  * higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted and allocates per evaluation, which dominates top-k
  * similarity cost. Both accumulate in double, strictly in index order —
  * deterministic and oracle-reproducible.
  */
object Vectors {

  /** Dot product of two float/double array columns (double accumulation,
    * fused codegen kernel). */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a); val nb = l2Norm(b)
    when(na > 0 && nb > 0, dot(a, b) / (na * nb))
  }

  /** Squared euclidean distance (fused codegen kernel). */
  def l2Sq(a: Column, b: Column): Column =
    column(L2SquaredDistance(expression(a), expression(b)))

  /** Johnson–Lindenstrauss random projection to `outDim` dims
    * (Achlioptas ±1 variant, fused kernel). The sign matrix is derived
    * from (outDim, seed) via xxhash64 on every executor — no matrix
    * data ships, so this is a pure per-row map at any corpus size.
    * Same (outDim, seed) ⇒ bit-identical projections everywhere. */
  def randomProject(v: Column, outDim: Int, seed: Long = 42L): Column =
    column(RandomProject(expression(v), outDim, seed))

  /** Symmetric scalar int8 quantization of an embedding:
    * struct(scale: float, q: array<tinyint>) with q[i] =
    * round(127·v[i]/max|v|) and scale = max|v|/127, so v[i] ≈
    * scale·q[i]. 4× smaller at rest and on the wire than float32 —
    * the storage/bandwidth lever for a 100 TB embedding corpus. Note
    * cosine over q equals cosine over the dequantized vector exactly
    * (the per-vector scale cancels in the ratio), so a quantized
    * similarity scan needs no dequantization at all. Zero vectors
    * quantize to all-zero q with scale 0. Fused O(dim) kernel
    * (graft.expr.catalyst.QuantizeInt8) — the declarative HOF
    * formulation below re-evaluates the captured max-abs subtree per
    * element (O(dim²) interpreted; kernel-parity-tested). */
  def quantizeInt8(v: Column): Column =
    column(catalyst.QuantizeInt8(expression(v)))

  /** Declarative reference formulation (kernel parity test only). */
  def quantizeInt8Declarative(v: Column): Column = {
    val maxabs = array_max(transform(v, x => abs(x.cast("double"))))
    struct(
      (maxabs / lit(127.0)).cast("float").as("scale"),
      transform(v, x =>
        when(maxabs > 0, round(x.cast("double") * lit(127.0) / maxabs))
          .otherwise(lit(0.0)).cast("tinyint")).as("q"))
  }

  /** Pack coordinate signs into ceil(dim/64) longs (fused kernel,
    * [[catalyst.SignPack]]): bit j of word w is set iff
    * v[w·64+j] > 0. The 1-bit point of the quantization matrix — 32×
    * smaller than float32; pair comparison drops to dim/64 word ops
    * via [[hamming]]. */
  def signPack(v: Column): Column = column(catalyst.SignPack(expression(v)))

  /** Declarative reference formulation (kernel parity test only) —
    * including the kernel's edges: an EMPTY vector packs to an empty
    * word array (Spark's sequence(0, −1) would otherwise generate the
    * DESCENDING [0, −1] and fabricate two words), and a null element
    * nulls the whole pack. */
  def signPackDeclarative(v: Column): Column =
    when(v.isNull || exists(v, x => x.isNull), lit(null).cast("array<bigint>"))
      .when(size(v) === 0, array().cast("array<bigint>"))
      .otherwise(
        transform(sequence(lit(0), ((size(v) + 63) / 64).cast("int") - 1), w =>
          aggregate(
            sequence(w * 64, least(w * 64 + 63, size(v) - 1)),
            lit(0L),
            // !isnan: Catalyst '>' ranks NaN ABOVE every number while
            // the kernel's Java compare is false for NaN — a NaN
            // coordinate packs as 0 in both forms
            (acc, i) => acc + when(!isnan(element_at(v, i.cast("int") + 1)) &&
                element_at(v, i.cast("int") + 1) > 0,
              call_function("shiftleft", lit(1L), pmod(i, lit(64)).cast("int")))
              .otherwise(lit(0L)))))

  /** Hamming distance between two [[signPack]] word arrays:
    * Σ popcount(xor) — fused kernel ([[catalyst.HammingDistance]]). */
  def hamming(a: Column, b: Column): Column =
    column(catalyst.HammingDistance(expression(a), expression(b)))

  /** Sign bit of the projection onto a deterministic pseudo-random
    * hyperplane (seeded per plane from the element index) — the building
    * block for LSH bucketing of embeddings. plane(i) uses a fixed integer
    * mix so the "random" planes are reproducible with no RNG. */
  def hyperplaneSign(v: Column, planeSeed: Int): Column = {
    // pseudo-random ±1 weights per element index via xxhash64(seed, idx)
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
        x.cast("double") *
          when(pmod(xxhash64(lit(planeSeed), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** nBits-bit LSH bucket id for an embedding — used to pre-bucket ANN
    * candidate search so the pairwise join is per-bucket, not global.
    * Declarative reference formulation (single table). */
  def lshBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map(b => hyperplaneSign(v, b) * lit(1 << b))
      .reduce((x, y) => x + y)

  /** Top-`n` nearest centroid ids (array<long>, best first) for a
    * vector against a PACKED centroid array — one broadcast value of
    * struct(cid: long, cv, cn: double) rows. The assignment primitive
    * of the IVF/k-means family: per-row O(k·dim), no row expansion, no
    * shuffle — versus the declarative broadcast-join + row_number
    * window, which shuffles the k-expanded corpus by id just to pick
    * each row's best. Ordering matches that window exactly
    * (csim desc with Spark NaN-first semantics, invalid scores last,
    * ties on cid asc; parity-tested). `metric`: "cosine" (cn-gated
    * dot/(vn·cn)) or "l2" (negated squared distance; cn ignored). */
  def nearestCents(v: Column, cents: Column, n: Int, metric: String): Column = {
    val cosine = metric match {
      case "cosine" => true
      case "l2" => false
      case other => throw new IllegalArgumentException(s"unknown metric $other")
    }
    column(catalyst.NearestCents(expression(v), expression(cents), n, cosine))
  }

  /** Multi-table LSH bucket ids (fused kernel): array<int> of
    * (table << nBits | bucket). Probing all tables bounds the ANN miss
    * probability at (1 − p^nBits)^nTables — single-probe recall
    * collapses when neighbor similarity is modest, multi-table is the
    * production shape. Element t's planes use seeds t·nBits+b, so table
    * 0 with nTables=1 equals lshBucket (parity-tested). */
  def lshBuckets(v: Column, nBits: Int, nTables: Int): Column =
    column(catalyst.LshBuckets(expression(v), nBits, nTables))
}
