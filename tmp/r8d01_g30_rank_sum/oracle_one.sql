
      WITH per AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               count(*) AS n
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY 1),
      r AS (
        SELECT cents, na, n,
               coalesce(sum(n) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cntless
        FROM per),
      a AS (
        SELECT CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(n - na) AS BIGINT) AS n_b,
               CAST(sum(na * (2 * cntless + n + 1)) AS BIGINT) AS r2a,
               CAST(sum(n * n * n - n) AS BIGINT) AS tie_term
        FROM r)
      SELECT n_a, n_b,
             r2a - n_a * (n_a + 1) AS u2_a,
             2 * n_a * n_b - (r2a - n_a * (n_a + 1)) AS u2_b,
             tie_term,
             CAST(round(((r2a - n_a * (n_a + 1) - n_a * n_b) / sqrt(CAST(n_a AS DOUBLE) * n_b * ((n_a + n_b + 1.0) - CAST(tie_term AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1.0))) / 3.0)) * 1000000) AS BIGINT) AS z_micros,
             abs((r2a - n_a * (n_a + 1) - n_a * n_b) / sqrt(CAST(n_a AS DOUBLE) * n_b * ((n_a + n_b + 1.0) - CAST(tie_term AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1.0))) / 3.0)) > 1.96 AS significant
      FROM a