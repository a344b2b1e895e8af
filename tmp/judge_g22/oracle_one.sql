
      WITH seqd AS (
        SELECT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS page,
               lag(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        FROM events),
      edges AS (
        SELECT src, page AS dst, count(*) AS w
        FROM seqd WHERE src IS NOT NULL GROUP BY 1, 2),
      ew AS (
        SELECT e.src, e.dst, e.w, o.outw
        FROM edges e
        JOIN (SELECT src, sum(w) AS outw FROM edges GROUP BY 1) o USING (src)),
      nodes AS (SELECT DISTINCT src AS node FROM edges
                UNION SELECT DISTINCT dst FROM edges),
      r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
      r1 AS (
        SELECT n.node,
               CAST(150000000 AS BIGINT) +
                 COALESCE((85 * s.inw) // 100, 0) AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst, sum((p.r * e.w) // e.outw) AS inw
          FROM r0 p JOIN ew e ON e.src = p.node
          GROUP BY e.dst) s ON s.dst = n.node),
      r2 AS (
        SELECT n.node,
               CAST(150000000 AS BIGINT) +
                 COALESCE((85 * s.inw) // 100, 0) AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst, sum((p.r * e.w) // e.outw) AS inw
          FROM r1 p JOIN ew e ON e.src = p.node
          GROUP BY e.dst) s ON s.dst = n.node),
      r3 AS (
        SELECT n.node,
               CAST(150000000 AS BIGINT) +
                 COALESCE((85 * s.inw) // 100, 0) AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst, sum((p.r * e.w) // e.outw) AS inw
          FROM r2 p JOIN ew e ON e.src = p.node
          GROUP BY e.dst) s ON s.dst = n.node),
      r4 AS (
        SELECT n.node,
               CAST(150000000 AS BIGINT) +
                 COALESCE((85 * s.inw) // 100, 0) AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst, sum((p.r * e.w) // e.outw) AS inw
          FROM r3 p JOIN ew e ON e.src = p.node
          GROUP BY e.dst) s ON s.dst = n.node),
      r5 AS (
        SELECT n.node,
               CAST(150000000 AS BIGINT) +
                 COALESCE((85 * s.inw) // 100, 0) AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst, sum((p.r * e.w) // e.outw) AS inw
          FROM r4 p JOIN ew e ON e.src = p.node
          GROUP BY e.dst) s ON s.dst = n.node)
      SELECT node AS page, r AS rank_scaled
      FROM r5
      ORDER BY rank_scaled DESC, page