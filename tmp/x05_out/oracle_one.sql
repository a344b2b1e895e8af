
      SELECT CASE WHEN event_id % 2 = 0 THEN 'high' ELSE 'normal' END AS priority,
             CASE WHEN event_id % 2 = 0 THEN 'high' ELSE 'normal' END AS observed_pool,
             count(*) AS n_rows,
             round(sum(CAST(round(value * 1000000) AS BIGINT)) * 1.0
                   / 1000000.0, 6) AS sum_value,
             CAST(2 AS BIGINT) AS n_journal,
             'SUCCEEDED' AS final_status
      FROM events WHERE ts < TIMESTAMP '2024-01-04'
      GROUP BY 1, 2 ORDER BY priority