
      WITH seqd AS (
        SELECT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS page,
               lag(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        FROM events),
      edges AS (
        SELECT DISTINCT least(src, page) AS u, greatest(src, page) AS v
        FROM seqd WHERE src IS NOT NULL AND src <> page),
      deg AS (
        SELECT node, count(*) AS deg
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v FROM edges) GROUP BY 1),
      o AS (
        SELECT CASE WHEN (x.deg, e.u) < (y.deg, e.v) THEN e.u ELSE e.v END
                 AS a,
               CASE WHEN (x.deg, e.u) < (y.deg, e.v) THEN e.v ELSE e.u END
                 AS b
        FROM edges e JOIN deg x ON x.node = e.u JOIN deg y ON y.node = e.v),
      tri AS (
        SELECT count(*) AS n_triangles
        FROM o e1 JOIN o e2 ON e1.b = e2.a
                  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
      st AS (
        SELECT count(*) AS n_nodes,
               CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg),
      ec AS (SELECT count(*) AS n_edges FROM edges)
      SELECT n_nodes, n_edges, n_wedges, n_triangles,
             CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)
                  ELSE (3 * n_triangles * 1000000) // n_wedges END
               AS clustering_ppm
      FROM st, ec, tri