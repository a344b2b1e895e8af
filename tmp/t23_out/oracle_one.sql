
      WITH f AS (
        SELECT doc_id,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10.0
                 / length(text)
               + ln(1 + length(text)) AS margin
        FROM documents WHERE length(text) > 0)
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '33'
                  THEN 'test' ELSE 'train' END AS split,
             count(*) AS n_docs,
             CAST(count(*) FILTER (WHERE margin > 13.9)
                  AS BIGINT) AS n_pos,
             TRUE AS acc_ok
      FROM f GROUP BY 1 ORDER BY split