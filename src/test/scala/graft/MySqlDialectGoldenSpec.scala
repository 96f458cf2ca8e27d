package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcSource.MySqlUpsertDialect

/** MySQL upsert dialect pinned against a golden file (VERDICT r8 item
  * 6): a live MySQL cannot run in the zero-egress sandbox, so the
  * generated `INSERT … ON DUPLICATE KEY UPDATE` statements for every
  * reference upsert site are asserted text-exactly against
  * `src/test/resources/mysql_upsert_golden.sql` — a dialect regression
  * (marker count, VALUES() form, clause order, spacing) fails here,
  * without a server. The statements mirror the reference's own sites
  * (Bifrost.py:116-124, 257-263, 172-180; Stellar.py:138-146). The
  * env-gated [[MySqlUpsertCheck]] covers the live round trip when a
  * database exists.
  */
class MySqlDialectGoldenSpec extends AnyFunSuite {

  /** (table, cols, keys, updateCols) for each reference upsert site, in
    * golden-file order. */
  private val sites = Seq(
    ("dim_tokens",
      Seq("chain_id", "address", "symbol", "name", "decimals",
        "asset_type_id", "updated_at"),
      Seq("chain_id", "address"),
      Seq("symbol", "name", "decimals", "asset_type_id", "updated_at")),
    ("fact_token_daily_stats",
      Seq("token_id", "date", "volume", "volume_usd", "txns_count",
        "price_usd", "created_at"),
      Seq("token_id", "date"),
      Seq("price_usd")),
    ("fact_token_daily_stats",
      Seq("token_id", "date", "volume", "volume_usd", "volume_yoy",
        "volume_qoq", "txns_count", "txns_yoy", "txns_qoq", "price_usd",
        "created_at"),
      Seq("token_id", "date"),
      Seq("price_usd", "volume_usd", "volume_yoy", "volume_qoq",
        "txns_count", "txns_yoy", "txns_qoq", "created_at")),
    ("fact_yield_stats",
      Seq("token_id", "return_type_id", "pool_address", "date", "apy",
        "tvl", "tvl_usd", "created_at"),
      Seq("token_id", "return_type_id", "pool_address", "date"),
      Seq("tvl", "apy", "tvl_usd")))

  private def golden: Seq[String] = {
    val in = getClass.getResourceAsStream("/mysql_upsert_golden.sql")
    require(in != null, "golden file missing from test resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("--")).toList
    finally src.close()
  }

  test("generated statements match the golden file text-exactly") {
    val got = sites.map { case (t, cols, keys, upd) =>
      MySqlUpsertDialect.statement(t, cols, keys, upd)
    }
    assert(got === golden,
      "dialect output drifted from mysql_upsert_golden.sql — if the " +
        "change is intentional, update the golden file in the same commit")
  }

  test("statement structure matches the reference's upsert semantics") {
    for ((t, cols, keys, upd) <- sites) {
      val sql = MySqlUpsertDialect.statement(t, cols, keys, upd)
      // one marker per inserted column, bound in column order
      assert(sql.count(_ == '?') === cols.size)
      assert(MySqlUpsertDialect.bindOrder(cols, keys, upd) === cols)
      // every update column takes the INCOMING value via VALUES(col) —
      // the reference's partial-column-merge semantics (U2/U3)
      upd.foreach(c => assert(sql.contains(s"$c = VALUES($c)"), s"$t/$c"))
      // key columns are never in the UPDATE clause (they locate the row)
      keys.foreach(k =>
        assert(!sql.contains(s"$k = VALUES($k)"), s"key $k must not update"))
      // untouched non-key columns stay untouched (partial merge)
      cols.filterNot(keys.contains).filterNot(upd.contains).foreach(c =>
        assert(!sql.contains(s"$c = VALUES($c)"), s"$t/$c must not update"))
    }
  }
}
