
      SELECT 'customer' AS table_name, count(*) AS n_rows,
             count(*) - count(c_custkey) AS n_nulls,
             CAST(min(c_custkey) AS BIGINT) AS min_key,
             CAST(max(c_custkey) AS BIGINT) AS max_key,
             TRUE AS ndv_ok
      FROM customer
      UNION ALL
      SELECT 'orders', count(*), count(*) - count(o_custkey),
             CAST(min(o_custkey) AS BIGINT), CAST(max(o_custkey) AS BIGINT), TRUE
      FROM orders
      ORDER BY table_name