
      WITH rel AS (
        SELECT event_type,
               'uid=' || user_id || ' mail=u' || user_id || '@ex' ||
               (user_id % 7) || '.example phone=+1-555-' ||
               lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') ||
               ' ip=10.' || (user_id % 256) || '.' || (event_id % 256) ||
               '.7 props=' || props AS line
        FROM events),
      m AS (
        SELECT event_type,
               len(regexp_extract_all(line, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[a-z]{2,}')) AS ne,
               len(regexp_extract_all(line, '\+1-555-[0-9]{4}')) AS np,
               len(regexp_extract_all(line, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ni,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(line, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[a-z]{2,}', '<email>', 'g'),
                   '\+1-555-[0-9]{4}', '<phone>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<ip>', 'g') AS masked
        FROM rel)
      SELECT event_type,
             count(*) AS n_events,
             CAST(sum(ne) AS BIGINT) AS n_emails,
             CAST(sum(np) AS BIGINT) AS n_phones,
             CAST(sum(ni) AS BIGINT) AS n_ips,
             count(DISTINCT masked) AS n_masked_distinct,
             CAST(sum(('0x' || substr(md5(masked), 1, 8))::BIGINT) AS BIGINT)
               AS mask_sum,
             CAST(sum(length(masked)) AS BIGINT) AS masked_len
      FROM m
      GROUP BY event_type
      ORDER BY event_type