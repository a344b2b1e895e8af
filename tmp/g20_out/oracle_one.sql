
      WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_exact, TRUE AS est_ok, TRUE AS union_ok
      FROM du a JOIN du b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2 ORDER BY type_a, type_b