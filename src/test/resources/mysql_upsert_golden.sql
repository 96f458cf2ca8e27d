-- Golden MySQL upsert statements: what JdbcSource.MySqlUpsertDialect
-- generates for each of the reference warehouse's ON DUPLICATE KEY
-- UPDATE sites. Pinned so dialect correctness is provable without a
-- live server (the env-gated MySqlUpsertCheck covers the live path).
--
-- One intended difference from the reference text: the reference sets
-- updated_at = NOW() inside the UPDATE clause (per-row server time);
-- the set-oriented pipeline carries updated_at as a DATA column (the
-- batch timestamp) so replays are idempotent — it therefore appears in
-- the column list and updates via VALUES(updated_at).
--
-- site: dim_tokens SCD-1 upsert (Bifrost.py:116-124)
INSERT INTO dim_tokens (chain_id, address, symbol, name, decimals, asset_type_id, updated_at) VALUES (?, ?, ?, ?, ?, ?, ?) ON DUPLICATE KEY UPDATE symbol = VALUES(symbol), name = VALUES(name), decimals = VALUES(decimals), asset_type_id = VALUES(asset_type_id), updated_at = VALUES(updated_at)
-- site: fact_token_daily_stats partial-column price merge (Bifrost.py:257-263)
INSERT INTO fact_token_daily_stats (token_id, date, volume, volume_usd, txns_count, price_usd, created_at) VALUES (?, ?, ?, ?, ?, ?, ?) ON DUPLICATE KEY UPDATE price_usd = VALUES(price_usd)
-- site: fact_token_daily_stats full stats merge (Stellar.py:138-146)
INSERT INTO fact_token_daily_stats (token_id, date, volume, volume_usd, volume_yoy, volume_qoq, txns_count, txns_yoy, txns_qoq, price_usd, created_at) VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?) ON DUPLICATE KEY UPDATE price_usd = VALUES(price_usd), volume_usd = VALUES(volume_usd), volume_yoy = VALUES(volume_yoy), volume_qoq = VALUES(volume_qoq), txns_count = VALUES(txns_count), txns_yoy = VALUES(txns_yoy), txns_qoq = VALUES(txns_qoq), created_at = VALUES(created_at)
-- site: fact_yield_stats merge (Bifrost.py:172-180)
INSERT INTO fact_yield_stats (token_id, return_type_id, pool_address, date, apy, tvl, tvl_usd, created_at) VALUES (?, ?, ?, ?, ?, ?, ?, ?) ON DUPLICATE KEY UPDATE tvl = VALUES(tvl), apy = VALUES(apy), tvl_usd = VALUES(tvl_usd)
