
      WITH rungs AS (
        SELECT CAST(unnest([16, 8, 4, 2, 1]) AS BIGINT)
                 AS denom,
               (SELECT max(doc_id) FROM documents) AS mx),
      cuts AS (SELECT denom, (mx + 1) // denom AS cut FROM rungs),
      tok AS (
        SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term FROM documents),
      toks AS (SELECT doc_id, term FROM tok WHERE term <> ''),
      firsts AS (SELECT term, min(doc_id) AS fd FROM toks GROUP BY 1),
      vocab AS (
        SELECT c.cut, count(*) AS vocab
        FROM firsts f JOIN cuts c ON f.fd < c.cut GROUP BY 1),
      dtok AS (SELECT doc_id, count(*) AS nt FROM toks GROUP BY 1),
      dstats AS (
        SELECT c.cut, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        FROM dtok d JOIN cuts c ON d.doc_id < c.cut GROUP BY 1)
      SELECT d.cut, d.n_docs, d.n_tokens, v.vocab,
             v.vocab - coalesce(lag(v.vocab) OVER (ORDER BY d.cut), 0)
               AS new_terms,
             (v.vocab * 1000000) // d.n_tokens AS ttr_ppm
      FROM dstats d JOIN vocab v ON v.cut = d.cut
      ORDER BY d.cut