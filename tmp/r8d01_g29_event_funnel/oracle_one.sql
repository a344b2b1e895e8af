
      WITH s0 AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY 1),
      s1 AS (
        SELECT s0.user_id, min(e.ts) AS t1
        FROM s0 LEFT JOIN events e
          ON e.user_id = s0.user_id
         AND e.event_type = 'click' AND e.ts >= s0.t0
        GROUP BY 1),
      s2 AS (
        SELECT s1.user_id, min(e.ts) AS t2
        FROM s1 LEFT JOIN events e
          ON e.user_id = s1.user_id
         AND e.event_type = 'signup' AND e.ts >= s1.t1
        GROUP BY 1),
      s3 AS (
        SELECT s2.user_id, min(e.ts) AS t3
        FROM s2 LEFT JOIN events e
          ON e.user_id = s2.user_id
         AND e.event_type = 'purchase' AND e.ts >= s2.t2
        GROUP BY 1),
      tot AS (
        SELECT count(s0.t0) AS n0, count(s1.t1) AS n1,
               count(s2.t2) AS n2, count(s3.t3) AS n3
        FROM s0 JOIN s1 USING (user_id) JOIN s2 USING (user_id)
                JOIN s3 USING (user_id))
      SELECT CAST(0 AS INTEGER) AS step_idx, 'view' AS step,
             n0 AS n_users, CAST(1000000 AS BIGINT) AS conv_top_ppm,
             CAST(1000000 AS BIGINT) AS conv_prev_ppm FROM tot
      UNION ALL
      SELECT 1, 'click', n1,
             CASE WHEN n0 = 0 THEN 0 ELSE (n1 * 1000000) // n0 END,
             CASE WHEN n0 = 0 THEN 0 ELSE (n1 * 1000000) // n0 END FROM tot
      UNION ALL
      SELECT 2, 'signup', n2,
             CASE WHEN n0 = 0 THEN 0 ELSE (n2 * 1000000) // n0 END,
             CASE WHEN n1 = 0 THEN 0 ELSE (n2 * 1000000) // n1 END FROM tot
      UNION ALL
      SELECT 3, 'purchase', n3,
             CASE WHEN n0 = 0 THEN 0 ELSE (n3 * 1000000) // n0 END,
             CASE WHEN n2 = 0 THEN 0 ELSE (n3 * 1000000) // n2 END FROM tot
      ORDER BY step_idx