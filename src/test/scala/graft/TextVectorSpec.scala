package graft

import org.apache.spark.sql.functions._

import graft.expr.{Text, Vectors}

/** Text-analysis expression semantics + vector/ANN quality. */
class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  test("tokens/tokenCount: whitespace runs, empty string") {
    val df = Seq("one two  three", "", "  padded  ", "a\tb\nc").map(Tuple1(_)).toDF("t")
    val got = df.select(Text.tokenCount($"t")).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(3, 0, 1, 3))
  }

  test("subwordCount splits words, digits, punct runs") {
    val df = Seq(Tuple1("hello, world42!")).toDF("t")
    // hello | , | world | 4 | 2 | !
    assert(df.select(Text.subwordCount($"t")).first().getInt(0) === 6)
  }

  test("langId identifies stopword-bearing sentences; und on no evidence") {
    val df = Seq(
      ("en", "the cat sat on the mat and it was happy"),
      ("de", "der hund ist nicht mit der katze"),
      ("fr", "le chat est dans la maison pour le moment"),
      ("es", "el gato es una mascota en la casa"),
      ("und", "zzz qqq xxx")).toDF("expected", "text")
    val got = df.select($"expected", Text.langId($"text")).collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0), r.toString))
  }

  test("fingerprint64 is whitespace/case insensitive") {
    val df = Seq(("A  b\tC", "a b c"), ("x y", "x  z")).toDF("t1", "t2")
    val got = df.select(
      (Text.fingerprint64($"t1") === Text.fingerprint64($"t2")).as("eq")).collect()
    assert(got(0).getBoolean(0) === true)
    assert(got(1).getBoolean(0) === false)
  }

  test("qualityScore in [0,1]; prose scores above punct noise") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and it was a good day for running in the park with friends",
      "#$%^& !!! ??? ### @@@ %%%").toDF("t")
    val got = df.select(Text.qualityScore($"t")).collect().map(_.getDouble(0))
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("cosine: self-similarity 1.0, orthogonal 0.0, zero vector null") {
    val df = Seq(
      (Array(1.0f, 0f, 2f), Array(1.0f, 0f, 2f)),
      (Array(1.0f, 0f, 0f), Array(0f, 1.0f, 0f)),
      (Array(0f, 0f, 0f), Array(1.0f, 0f, 0f))).toDF("a", "b")
    val got = df.select(Vectors.cosine($"a", $"b")).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(got(1).getDouble(0) === 0.0)
    assert(got(2).isNullAt(0))
  }

  test("lshBucket: deterministic, in [0, 2^nBits)") {
    val df = schema.Tables.load(spark, sfDir, "embeddings")
    val b1 = df.select($"vec_id", Vectors.lshBucket($"embedding", 8).as("b"))
    val buckets = b1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets.values.forall(b => b >= 0 && b < 256))
    val b2 = b1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets === b2)
  }

  test("lshBuckets kernel: table 0 of 1×nBits == declarative lshBucket") {
    val e = schema.Tables.load(spark, sfDir, "embeddings").limit(100)
    val bad = e.select(
        Vectors.lshBucket($"embedding", 6).as("slow"),
        element_at(Vectors.lshBuckets($"embedding", 6, 1), 1).as("fast"))
      .filter(not($"fast" <=> $"slow")).count()
    assert(bad === 0)
  }

  private def annGround(k: Int): (org.apache.spark.sql.DataFrame, Map[Long, Set[Long]]) = {
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val brute = graft.ops.Ann.bruteTopK(e.filter($"id" < 20), e, k)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    (e, brute)
  }

  test("multi-table LSH ANN: recall@5 well above single-probe, candidates pruned") {
    val (e, brute) = annGround(5)
    val lsh = graft.ops.Ann.lshTopK(e.filter($"id" < 20), e, 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, nn) =>
      lsh.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.4, s"mean LSH recall@5 = $mean")
  }

  test("IVF-Flat ANN: recall@5 on clustered fixture embeddings") {
    val (e, brute) = annGround(5)
    val ivf = graft.ops.Ann.ivfTopK(e.filter($"id" < 20), e, 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, nn) =>
      ivf.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.4, s"mean IVF recall@5 = $mean")
  }
}
