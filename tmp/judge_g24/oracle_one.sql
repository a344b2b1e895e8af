
      WITH seqd AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
      pairs AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seqd WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n,
             (n * 1000000) // sum(n) OVER (PARTITION BY prev_type) AS p_ppm
      FROM pairs ORDER BY prev_type, next_type