package graft

import org.apache.spark.sql.functions._

import graft.expr.Text

/** DeflateSize kernel + compressionRatio signal: planted-string
  * discrimination (repetitive ≪ prose < noise), the zlib envelope,
  * the doubled-text theorem, determinism, and null/empty contracts. */
class DeflateSpec extends SparkSpec {
  import spark.implicits._

  private val repetitive = "spam ham " * 400                 // ~3.2 KB
  private val prose = (1 to 400).map(i =>
    s"sentence $i mentions topic${i % 37} and verb${i % 53}.").mkString(" ")
  private val noise = {
    val rnd = new scala.util.Random(42)
    (1 to 3200).map(_ => rnd.nextPrintableChar()).mkString
  }

  private def ratios = Seq(("rep", repetitive), ("prose", prose), ("noise", noise))
    .toDF("kind", "text")
    .select(col("kind"), Text.compressionRatio(col("text")).as("r"))
    .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("compression ratio discriminates: repetitive << prose < noise") {
    val r = ratios
    assert(r("rep") < 0.05, s"repetitive text should collapse, got ${r("rep")}")
    assert(r("rep") < r("prose") && r("prose") < r("noise"),
      s"ordering violated: $r")
    assert(r("noise") > 0.5, s"high-entropy text should stay high, got ${r("noise")}")
  }

  test("zlib envelope and the doubled-text theorem hold on every planted string") {
    val df = ratios // force evaluation once
    for ((_, t) <- Seq(("rep", repetitive), ("prose", prose), ("noise", noise), ("one", "a"))) {
      val row = Seq(t).toDF("text").select(
        octet_length(col("text")).as("len"),
        Text.deflateSize(col("text")).as("s1"),
        Text.deflateSize(concat(col("text"), col("text"))).as("s2")).head()
      val (len, s1, s2) = (row.getInt(0), row.getLong(1), row.getLong(2))
      assert(s1 > 0 && s1 <= len + len / 1024 + 32)
      assert(s2 < 2 * s1, s"doubling must exploit the LZ77 window: $s2 vs 2*$s1")
    }
  }

  test("deterministic per JVM, null-safe, empty-text contract") {
    val a = Seq(prose).toDF("text").select(Text.deflateSize(col("text"))).head().getLong(0)
    val b = Seq(prose).toDF("text").select(Text.deflateSize(col("text"))).head().getLong(0)
    assert(a === b)
    val n = Seq[Option[String]](None).toDF("text")
      .select(Text.deflateSize(col("text"))).head()
    assert(n.isNullAt(0))
    // empty text: deflate emits a header (size > 0) but the RATIO is
    // null (0-byte denominator), the documented degrade
    val e = Seq("").toDF("text").select(
      Text.deflateSize(col("text")).as("s"),
      Text.compressionRatio(col("text")).as("r")).head()
    assert(e.getLong(0) > 0 && e.isNullAt(1))
  }

  test("level is honored: max compression never beats speed by being larger") {
    val row = Seq(prose).toDF("text").select(
      Text.deflateSize(col("text"), level = 1).as("fast"),
      Text.deflateSize(col("text"), level = 9).as("best")).head()
    assert(row.getLong(1) <= row.getLong(0))
  }
}
