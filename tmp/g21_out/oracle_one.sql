
      WITH RECURSIVE s(items, last) AS (
        SELECT [it], it FROM (SELECT DISTINCT event_type AS it FROM events)
        UNION ALL
        SELECT list_append(s.items, t.it), t.it
        FROM s, (SELECT DISTINCT event_type AS it FROM events) t
        WHERE t.it > s.last),
      b AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               list_sort(list(DISTINCT event_type)) AS items
        FROM events GROUP BY 1, 2),
      tot AS (SELECT count(*) AS n FROM b),
      sup AS (
        SELECT array_to_string(s.items, ',') AS itemset,
               count(*) AS n_baskets
        FROM s JOIN b ON list_has_all(b.items, s.items)
        GROUP BY 1)
      SELECT itemset, n_baskets
      FROM sup, tot WHERE n_baskets * 20 >= tot.n
      ORDER BY itemset