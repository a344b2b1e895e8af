
      WITH e AS (
        SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-02'),
      rolled AS (
        SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day,
               hour(ts) AS hour,
               CAST(floor(coalesce(sum(length(CAST(event_id AS VARCHAR))
                     + length(event_type) + length(CAST(user_id AS VARCHAR))
                     + length(coalesce(props, '')) + 64)
                 OVER (PARTITION BY year(ts), month(ts), day(ts), hour(ts)
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 / 1024.0) AS BIGINT) AS roll
        FROM e)
      SELECT year, month, day, hour, count(*) AS n_rows,
             CAST(count(DISTINCT roll) AS BIGINT) AS n_files
      FROM rolled GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4