
      WITH b AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events),
      u AS (SELECT DISTINCT user_id FROM events),
      grid AS (
        SELECT u.user_id, g.h
        FROM u, b, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR))
               AS g(h)),
      p AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'),
      bars AS (SELECT user_id, h, cents FROM p WHERE rn = 1),
      f AS (
        SELECT g.user_id, bars.cents,
               last_value(bars.cents IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS fill
        FROM grid g LEFT JOIN bars
          ON bars.user_id = g.user_id AND bars.h = g.h)
      SELECT user_id, count(*) AS n_hours,
             count(cents) AS n_bar_hours,
             count(fill) AS n_filled_hours,
             count(fill) - count(cents) AS n_gap_hours,
             CAST(sum(fill) AS BIGINT) AS sum_filled_cents,
             (count(fill) * 1000000) // count(*) AS coverage_ppm
      FROM f GROUP BY 1 ORDER BY user_id