package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expr.Vectors
import graft.ops.Dedup

/** The SQL function surface registered by GraftExtensions must agree
  * with the Column API (same expressions underneath). */
class ExtensionsSpec extends SparkSpec {

  // the shared test session already exists, so exercise the
  // existing-session registration path (the extensions path is what
  // Verify/Bench use at construction)
  private lazy val gspark: SparkSession = { GraftFunctions.register(spark); spark }

  test("graft_dot / graft_l2sq SQL functions == Column API") {
    val e = schema.Tables.load(gspark, sfDir, "embeddings").limit(50)
    e.createOrReplaceTempView("emb")
    val sql = gspark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS d,
        |  graft_l2sq(embedding, embedding) AS z FROM emb""".stripMargin)
    val api = e.select(col("vec_id"),
      Vectors.dot(col("embedding"), col("embedding")).as("d"),
      Vectors.l2Sq(col("embedding"), col("embedding")).as("z"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("graft_minhash_sig SQL == Dedup.minhashSignature") {
    val d = schema.Tables.load(gspark, sfDir, "documents").limit(50)
    d.createOrReplaceTempView("docs")
    val sql = gspark.sql(
      "SELECT doc_id, graft_minhash_sig(text, 3, 4) AS sig FROM docs")
    val api = d.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 3, 4).as("sig"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("graft_normalize SQL == Text.normalizeUnicode; composes, idempotent, null-safe") {
    val d = schema.Tables.load(gspark, sfDir, "documents").limit(20)
      .select(col("doc_id"),
        concat(col("text"), lit(" cafe\u0301")).as("t"))
    d.createOrReplaceTempView("docs_nfc")
    val sql = gspark.sql(
      "SELECT doc_id, graft_normalize(t, 'NFC') AS n FROM docs_nfc")
    val api = d.select(col("doc_id"),
      graft.expr.Text.normalizeUnicode(col("t"), "NFC").as("n"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
    // composes e+combining-acute into the single precomposed char
    val one = api.limit(1).collect()(0).getString(1)
    assert(one.endsWith(" caf\u00e9"), s"expected precomposed tail, got ${one.takeRight(8)}")
    // idempotent on already-normalized input; null stays null
    val again = gspark.sql(
      "SELECT graft_normalize(graft_normalize(t, 'NFC'), 'NFC') = graft_normalize(t, 'NFC') AS eq, " +
      "graft_normalize(CAST(NULL AS STRING), 'NFD') IS NULL AS nn FROM docs_nfc")
      .collect()
    assert(again.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("graft_shingles / graft_simhash64 SQL == Column API") {
    val d = schema.Tables.load(gspark, sfDir, "documents").limit(50)
    d.createOrReplaceTempView("docs_sh")
    val sql = gspark.sql(
      "SELECT doc_id, graft_shingles(text, 3) AS sh, graft_simhash64(text) AS h FROM docs_sh")
    val api = d.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"),
      Dedup.simhash64(col("text")).as("h"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("graft_q96_ratio SQL: 2^96 -> exactly 1") {
    val got = gspark.sql(
      "SELECT graft_q96_ratio(CAST('79228162514264337593543950336' AS DECIMAL(38,0))) AS r")
      .first().getDecimal(0)
    assert(got.compareTo(new java.math.BigDecimal("1")) === 0)
  }

  test("graft_top_k SQL aggregate returns best-first bounded list") {
    gspark.range(100).selectExpr("id % 3 AS g", "CAST(id AS DOUBLE) AS score", "id")
      .createOrReplaceTempView("scores")
    val got = gspark.sql(
      """SELECT g, graft_top_k(struct(score, id), 2) AS top FROM scores GROUP BY g
        |ORDER BY g""".stripMargin).collect()
    val g0 = got(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g0.map(_.getLong(1)).toSeq === Seq(99L, 96L))
  }

  test("graft_quantize_int8 SQL == Vectors.quantizeInt8") {
    val e = schema.Tables.load(gspark, sfDir, "embeddings").limit(30)
    e.createOrReplaceTempView("emb3")
    val sql = gspark.sql(
      "SELECT vec_id, graft_quantize_int8(embedding) AS qz FROM emb3")
    val api = e.select(col("vec_id"),
      Vectors.quantizeInt8(col("embedding")).as("qz"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("graft_lsh_buckets SQL == Vectors.lshBuckets") {
    val e = schema.Tables.load(gspark, sfDir, "embeddings").limit(30)
    e.createOrReplaceTempView("emb2")
    val sql = gspark.sql(
      "SELECT vec_id, graft_lsh_buckets(embedding, 4, 3) AS b FROM emb2")
    val api = e.select(col("vec_id"),
      Vectors.lshBuckets(col("embedding"), 4, 3).as("b"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("graft_winnow_fps SQL == Fingerprint.winnow") {
    val d = schema.Tables.load(gspark, sfDir, "documents").limit(30)
    d.createOrReplaceTempView("docs_w")
    val sql = gspark.sql(
      "SELECT doc_id, explode(graft_winnow_fps(text, 8, 4)) AS fp FROM docs_w")
    val api = graft.ops.Fingerprint.winnow(d, "doc_id", "text", 8, 4)
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("graft_cms_estimate SQL probes a count_min_sketch binary") {
    import gspark.implicits._
    (Seq.fill(7)("x") ++ Seq.fill(3)("y")).toDF("k")
      .createOrReplaceTempView("cms_in")
    val out = gspark.sql(
      """WITH s AS (SELECT count_min_sketch(k, 0.001d, 0.99d, 42) AS cms FROM cms_in)
        |SELECT graft_cms_estimate(s.cms, t.k) AS est
        |FROM (SELECT DISTINCT k FROM cms_in) t, s ORDER BY t.k""".stripMargin)
      .as[Long].collect()
    assert(out.toSeq == Seq(7L, 3L), out.mkString(", "))
  }
}
