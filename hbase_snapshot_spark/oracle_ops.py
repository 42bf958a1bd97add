"""DuckDB oracle SQL for the training-pipeline operators (dedup /
similarity / text / multimodal) — generated from the SAME constants as
the Spark implementations (operators/text.py STOPWORDS, TOKEN_PATTERN;
md5-based hashing everywhere) so both sides stay in lock-step."""

from __future__ import annotations

from hbase_snapshot_spark.operators.text import STOPWORDS, TOKEN_PATTERN

# shared text fragments -------------------------------------------------

#: whitespace-normalized text: the explicit ASCII class collapsed to
#: single spaces, edges trimmed.  Twin of the Spark side's
#: trim(regexp_replace(text, _WS, ' ')) — plain trim() strips only
#: spaces in BOTH engines (a leading newline grew an empty first
#: token), and RE2's \s disagrees with Java's on \x0B.
_NORM = "trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g'))"
#: tokens of non-empty normalized text (empty → 0 tokens, no empties)
_TOKS = f"string_split({_NORM}, ' ')"
_NTOK = f"CASE WHEN {_NORM} = '' THEN 0 ELSE len({_TOKS}) END"


def _shingle_cte(n: int) -> str:
    """doc_id → distinct word n-gram shingles (matches functions.word_ngrams
    + array_distinct on the Spark side)"""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE {_NORM} <> ''),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - {n - 2}), i -> {parts})) AS s
  FROM toks WHERE len(t) >= {n}
),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
sz AS (SELECT doc_id, len(s) AS sz FROM sh)
"""


def _winnow_sel_cte(k: int = 8, window: int = 4) -> str:
    """doc_id → sorted distinct winnow-selected hashes (the SQL twin of
    text.winnow_fingerprints over documents) — shared by the
    fingerprint query's winnow columns and dedup_jaccard's 'winnow'
    pair branch."""
    return f"""wsel AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           range(1, greatest(len(hs) - {window - 1}, 0) + 1),
           i -> list_min(hs[i : i + {window - 1}])))) AS sel
  FROM (
    SELECT doc_id,
           list_transform(hx,
             h -> CAST({_hex8_int_sql("h")} AS BIGINT)) AS hs
    FROM (
      SELECT doc_id,
             list_transform(
               range(1, greatest(length(nrm) - {k - 1}, 0) + 1),
               p -> substr(md5(substr(nrm, CAST(p AS INT), {k})), 1, 8)
             ) AS hx
      FROM (SELECT doc_id,
                   regexp_replace(lower(text), '[^\\p{{L}}\\p{{N}}]', '', 'g') AS nrm
            FROM documents) n) g0) g
)"""


def _jaccard_guarded_tail(threshold: float, df_max: int | None) -> str:
    """The candidate + exact-verification tail over CTEs ex(doc_id,
    shingle) / sz(doc_id, sz) — hub guard included, shared by the
    shingle and winnow pair branches."""
    if df_max is None:
        return _jaccard_core(threshold)
    return f"""exg AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS dfc
    FROM ex) t
  WHERE dfc <= {df_max}
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM exg a JOIN exg b USING (shingle)
  WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS i
  FROM cand c
  JOIN ex a ON a.doc_id = c.a_id
  JOIN ex b ON b.doc_id = c.b_id AND b.shingle = a.shingle
  GROUP BY 1, 2
),
jac AS (
  SELECT a_id AS a, b_id AS b,
         round(i / (sa.sz + sb.sz - i), 6) AS jaccard
  FROM inter
  JOIN sz sa ON sa.doc_id = a_id
  JOIN sz sb ON sb.doc_id = b_id
)
SELECT a, b, jaccard FROM jac WHERE jaccard >= {threshold}
"""


def _jaccard_core(threshold: float) -> str:
    return f"""
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM ex a JOIN ex b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT a_id AS a, b_id AS b,
         round(i / (sa.sz + sb.sz - i), 6) AS jaccard
  FROM inter
  JOIN sz sa ON sa.doc_id = a_id
  JOIN sz sb ON sb.doc_id = b_id
)
SELECT a, b, jaccard FROM jac WHERE jaccard >= {threshold}
"""


def dedup_exact_sql() -> str:
    return """
SELECT doc_id, dup_count FROM (
  SELECT doc_id,
         count(*) OVER (PARTITION BY md5(text)) AS dup_count,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents) t
WHERE rn = 1
"""


def _spans_sql(k: int, source: str, dup_pred: str) -> str:
    """Gaps-and-islands duplicated-span core shared by the 'spans' and
    'contam' branches: positional k-grams from ``source``, positions
    whose gram satisfies ``dup_pred`` merged into maximal spans.  The
    twin groups by the gram STRING where dedup.duplicated_spans groups
    by xxhash64 of it — identical modulo 64-bit hash collisions."""
    return f"""
grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(t[i : i + {k - 1}], chr(31)) AS g
  FROM ({source}) toks,
       UNNEST(generate_series(1, len(t) - {k} + 1)) AS u(i)
  WHERE len(t) >= {k}
),
flagged AS (SELECT doc_id, pos FROM grams WHERE {dup_pred}),
islands AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM flagged),
spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + {k} AS span_end
  FROM islands GROUP BY doc_id, isl)
"""


# the shared WS_RE contract (r12): RE2's \s excludes \x0B while Java's
# includes it — the explicit class keeps the span tokenization in
# lock-step with the Spark side on \x0B-bearing text
_SPAN_TOKS_SRC = f"SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents"


def dedup_suite_sql(k: int = 8) -> str:
    """SQL twin of the dedup_exact composite: exact-dedup + ExactSubstr
    duplicated spans + eval-contamination spans (dedup.duplicated_spans
    / contaminated_spans), tagged branches under one hash."""
    spans_core = _spans_sql(
        k, _SPAN_TOKS_SRC,
        "g IN (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2)",
    )
    contam_core = _spans_sql(
        k, _SPAN_TOKS_SRC + " WHERE doc_id % 10 != 0",
        f"""g IN (
      SELECT array_to_string(t[i : i + {k - 1}], chr(31))
      FROM ({_SPAN_TOKS_SRC} WHERE doc_id % 10 = 0) etoks,
           UNNEST(generate_series(1, len(t) - {k} + 1)) AS eu(i)
      WHERE len(t) >= {k})""",
    )
    return f"""
SELECT 'exact' AS branch, doc_id, dup_count AS v1,
       CAST(NULL AS BIGINT) AS v2, CAST(NULL AS BIGINT) AS v3
FROM (
  SELECT doc_id,
         count(*) OVER (PARTITION BY md5(text)) AS dup_count,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents) t
WHERE rn = 1
UNION ALL
SELECT 'spans' AS branch, doc_id, span_start AS v1, span_end AS v2,
       span_end - span_start AS v3
FROM (WITH {spans_core.strip()} SELECT * FROM spans) s
WHERE span_end - span_start >= {k}
UNION ALL
SELECT 'contam' AS branch, doc_id, span_start AS v1, span_end AS v2,
       span_end - span_start AS v3
FROM (WITH {contam_core.strip()} SELECT * FROM spans) s
WHERE span_end - span_start >= {k}
UNION ALL
-- 'lines': CCNet line dedup (mode='first') twin of dedup.line_dedup
-- over the deterministic 4-line page (NAV header / two word-halves /
-- footer).  Repeated normalized lines survive only at their first
-- (doc_id, pos); empty-normalized lines are always kept (the skew
-- rule).  v3 pins the reassembled clean text.
SELECT 'lines' AS branch, d.doc_id,
       CAST(coalesce(tot.n_lines, 0) AS BIGINT) AS v1,
       CAST(coalesce(tot.n_lines, 0) - coalesce(ag.n_kept, 0) AS BIGINT) AS v2,
       CAST({_hex8_int_sql("coalesce(ag.hx, substr(md5(''), 1, 8))")}
            AS BIGINT) AS v3
FROM documents d
LEFT JOIN (
  WITH pages AS (
    SELECT doc_id,
           'NAV HOME ABOUT CONTACT' || chr(10)
           || array_to_string(w[1:half], ' ') || chr(10)
           || array_to_string(w[half + 1:], ' ') || chr(10)
           || '(c) footer 2024' AS page
    FROM (SELECT doc_id, w,
                 greatest(1, CAST(ceil(len(w) / 2.0) AS INT)) AS half
          FROM (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents) w0) h0
  ), lns AS (
    -- explicit ASCII trim class, matching the operator (trim() would
    -- strip only spaces)
    SELECT doc_id, i AS pos, ls[CAST(i AS INT)] AS line,
           lower(regexp_replace(ls[CAST(i AS INT)],
                 '^[ \t\r\f]+|[ \t\r\f]+$', '', 'g')) AS nrm
    FROM (SELECT doc_id, string_split(page, chr(10)) AS ls FROM pages) p,
         UNNEST(generate_series(1, len(ls))) AS u(i)
  ), kept AS (
    SELECT doc_id, pos, line FROM (
      SELECT doc_id, pos, line, nrm,
             row_number() OVER (
               PARTITION BY CASE WHEN length(nrm) > 0 THEN md5(nrm) END
               ORDER BY doc_id, pos) AS rn
      FROM lns) x
    WHERE length(nrm) = 0 OR rn = 1
  )
  SELECT doc_id, count(*) AS n_kept,
         substr(md5(string_agg(line, chr(10) ORDER BY pos)), 1, 8) AS hx
  FROM kept GROUP BY doc_id
) ag ON d.doc_id = ag.doc_id
LEFT JOIN (
  SELECT doc_id, len(string_split(page2, chr(10))) AS n_lines
  FROM (SELECT doc_id,
               'NAV HOME ABOUT CONTACT' || chr(10)
               || array_to_string(w[1:half], ' ') || chr(10)
               || array_to_string(w[half + 1:], ' ') || chr(10)
               || '(c) footer 2024' AS page2
        FROM (SELECT doc_id, w,
                     greatest(1, CAST(ceil(len(w) / 2.0) AS INT)) AS half
              FROM (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents) w1) h1) p2
) tot ON d.doc_id = tot.doc_id
"""


def dedup_jaccard_sql(
    n: int = 3, threshold: float = 0.5, df_max: int | None = 5000
) -> str:
    """SQL twin of dedup.jaccard_pairs INCLUDING its default hub-shingle
    guard: candidate pairs come only from shingles with document
    frequency <= df_max, while the intersection count runs over the full
    shingle sets (reported jaccard stays exact) — keeping both sides in
    lock-step at every scale, not just where no shingle is hot."""
    tail = _jaccard_guarded_tail(threshold, df_max)
    return f"""
SELECT 'shingle' AS branch, a, b, jaccard FROM (
  WITH {_shingle_cte(n)}, {tail}
) s1
UNION ALL
-- 'winnow': MOSS detection — the SAME guarded jaccard tail over the
-- winnow-selected hash sets instead of word shingles (dedup.winnow_pairs)
SELECT 'winnow' AS branch, a, b, jaccard FROM (
  WITH {_winnow_sel_cte()},
  ex AS (SELECT doc_id, unnest(sel) AS shingle FROM wsel),
  sz AS (SELECT doc_id, len(sel) AS sz FROM wsel),
  {tail}
) s2
"""


def _mh_xh_cte() -> str:
    """the r12 minhash base hash: ONE md5 per shingle, 52-bit prefix as
    BIGINT folded to [0, MH_PRIME) — DuckDB twin of Spark's
    conv(substring(md5(shingle),1,13),16,10) % MH_PRIME."""
    from hbase_snapshot_spark.operators.dedup import MH_PRIME
    return ("exh AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 13))"
            f"::BIGINT % {MH_PRIME} AS xh FROM ex)")


def _mh_mins(num_hashes: int) -> str:
    """the r12 affine minhash family over the shared folded base hash
    ``xh``: min((a_i*xh + b_i) % MH_PRIME) — (a_i, b_i, prime) imported
    from operators.dedup so the two engines CANNOT drift, and bounded
    there so a_i*xh + b_i < 2^63 (exact BIGINT in both engines, no
    HUGEINT promotion).  Shared by the signature and pairs twins."""
    from hbase_snapshot_spark.operators.dedup import MH_PRIME, _mh_params
    parts = []
    for i in range(num_hashes):
        a, b = _mh_params(i)
        parts.append(f"min(({a} * xh + {b}) % {MH_PRIME}) AS mh{i}")
    return ", ".join(parts)


def minhash_signature_sql(n: int = 3, num_hashes: int = 8) -> str:
    return (f"WITH {_shingle_cte(n)}, {_mh_xh_cte()} "
            f"SELECT doc_id, {_mh_mins(num_hashes)}"
            " FROM exh GROUP BY doc_id")


def minhash_pairs_sql(
    n: int = 3, num_hashes: int = 8, bands: int = 4, threshold: float = 0.5
) -> str:
    rpb = num_hashes // bands
    mins = _mh_mins(num_hashes)
    band_cols = ", ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"mh{b * rpb + r}" for r in range(rpb))
        + f")) AS band{b}"
        for b in range(bands)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS bh FROM banded"
        for b in range(bands)
    )
    return f"""
WITH {_shingle_cte(n)},
{_mh_xh_cte()},
sig AS (SELECT doc_id, {mins} FROM exh GROUP BY doc_id),
banded AS (SELECT doc_id, {band_cols} FROM sig),
bl AS ({band_union}),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bl x JOIN bl y ON x.band_id = y.band_id AND x.bh = y.bh
  WHERE x.doc_id < y.doc_id
),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM ex a JOIN ex b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT a_id AS a, b_id AS b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
  FROM inter
  JOIN sz sa ON sa.doc_id = a_id
  JOIN sz sb ON sb.doc_id = b_id
)
SELECT j.a, j.b, j.jaccard
FROM jac j JOIN cand c ON c.a = j.a AND c.b = j.b
WHERE j.jaccard >= {threshold}
"""


def simhash_sql(bits: int = 16) -> str:
    nib = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"
    h4 = (
        f"(({nib.format(p=1)}) * 4096 + ({nib.format(p=2)}) * 256 "
        f"+ ({nib.format(p=3)}) * 16 + ({nib.format(p=4)}))"
    )
    votes = ", ".join(
        f"sum(CASE WHEN floor(hv / {1 << k}) % 2 = 1 THEN 1 ELSE -1 END) AS v{k}"
        for k in range(bits)
    )
    fp = " + ".join(f"CASE WHEN v{k} > 0 THEN {1 << k} ELSE 0 END" for k in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents WHERE {_NORM} <> ''
),
hashed AS (SELECT doc_id, {h4} AS hv FROM (SELECT doc_id, md5(tok) AS h FROM toks) t),
agg AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, {fp} AS simhash FROM agg
"""


def cosine_pairs_sql(threshold: float = 0.9) -> str:
    return f"""
SELECT a, b, cos FROM (
  SELECT a.vec_id AS a, b.vec_id AS b,
         round(CASE WHEN list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]) > 0 AND list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0 THEN list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) AS cos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id) t
WHERE cos >= {threshold}
"""


def semantic_dedup_sql(num_clusters: int = 16, eps: float = 0.93) -> str:
    """SQL twin of dedup.semantic_dedup (SemDeDup, iterations=0): the
    smallest-id init quantizer and round-6 cosine ranks resolve
    identically in both engines; the keep rule is the exists-a-farther-
    similar-item anti-join."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell, v AS cvec
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT {num_clusters}) t
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN list_dot_product(e.v, e.v) > 0 AND list_dot_product(c.cvec, c.cvec) > 0 THEN list_cosine_similarity(e.v, c.cvec) END, 6) DESC,
                      c.cell ASC) AS rn
    FROM e CROSS JOIN cents c) t
  WHERE rn = 1
),
scored AS (
  SELECT a.vec_id, a.v, a.cell,
         round(CASE WHEN list_dot_product(a.v, a.v) > 0 AND list_dot_product(c.cvec, c.cvec) > 0 THEN list_cosine_similarity(a.v, c.cvec) END, 6) AS cent_sim
  FROM assigned a JOIN cents c USING (cell)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cell
                               ORDER BY cent_sim ASC NULLS FIRST, vec_id ASC) AS rk
  FROM scored
),
removed AS (
  SELECT DISTINCT b.vec_id FROM ranked a JOIN ranked b
    ON a.cell = b.cell AND a.rk < b.rk
  WHERE round(CASE WHEN list_dot_product(a.v, a.v) > 0 AND list_dot_product(b.v, b.v) > 0 THEN list_cosine_similarity(a.v, b.v) END, 6) >= {eps}
)
SELECT r.vec_id, r.cell, r.cent_sim,
       CASE WHEN rm.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM ranked r LEFT JOIN removed rm ON r.vec_id = rm.vec_id
"""


def cosine_suite_sql(
    threshold: float = 0.25, num_clusters: int = 16, eps: float = 0.3
) -> str:
    """SQL twin of the 2-branch __spark_entry__.q_cosine_pairs composite:
    branch='pairs' = cosine_pairs_sql rows (keep=1); branch='sem' =
    semantic_dedup_sql rows (cell in b, centroid sim in cos)."""
    pairs = cosine_pairs_sql(threshold)
    sem = semantic_dedup_sql(num_clusters, eps)
    return f"""
WITH pairs AS ({pairs}),
sem AS ({sem})
SELECT 'pairs' AS branch, a, b, cos, CAST(1 AS BIGINT) AS keep FROM pairs
UNION ALL
SELECT 'sem' AS branch, vec_id AS a, CAST(cell AS BIGINT) AS b,
       cent_sim AS cos, CAST(keep AS BIGINT) AS keep FROM sem
"""


def cosine_topk_sql(k: int = 10, num_queries: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {num_queries}),
s AS (
  SELECT q.query_id, e.vec_id,
         round(CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0 AND list_dot_product(q.qv, q.qv) > 0 THEN list_cosine_similarity(e.embedding::DOUBLE[], q.qv) END, 6) AS cos
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id ASC) AS rank
  FROM s) t
WHERE rank <= {k}
"""


def ann_lsh_sql(
    k: int = 10, num_queries: int = 5, num_planes: int = 6, dim: int = 64
) -> str:
    """SQL twin of similarity.ann_lsh_topk — the SRP planes are md5-seeded
    (similarity._srp_planes: sign = parity of md5(f"{p}:{d}").digest()[0]),
    so the bucketing has a closed form: digest byte 0 is the first two hex
    chars of DuckDB's md5(), and its parity is the parity of hex char 2."""
    return f"""
WITH planes AS (
  SELECT p,
         list(CASE WHEN substr(md5(p || ':' || d), 2, 1)
                        IN ('0','2','4','6','8','a','c','e')
                   THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END ORDER BY d) AS pv
  FROM range({num_planes}) t1(p) CROSS JOIN range({dim}) t2(d)
  GROUP BY p
),
sigs AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
         CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.pv) >= 0
                       THEN power(2, pl.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id, e.embedding
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket
      FROM sigs WHERE vec_id < {num_queries}),
s AS (
  SELECT q.query_id, e.vec_id, round(CASE WHEN list_dot_product(e.v, e.v) > 0 AND list_dot_product(q.qv, q.qv) > 0 THEN list_cosine_similarity(e.v, q.qv) END, 6) AS cos
  FROM sigs e JOIN q ON e.bucket = q.bucket
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id ASC) AS rank
  FROM s) t
WHERE rank <= {k}
"""


def ann_ivf_sql(
    k: int = 10, num_queries: int = 5, num_centroids: int = 16, nprobe: int = 4
) -> str:
    """SQL twin of similarity.ivf_topk — centroids are the num_centroids
    smallest vec_ids (deterministic init quantizer); cell assignment and
    probe selection rank on round(cos, 6) with cell-asc tie-break so both
    engines resolve near-ties identically."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell, v AS cvec
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT {num_centroids}) t
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN list_dot_product(e.v, e.v) > 0 AND list_dot_product(c.cvec, c.cvec) > 0 THEN list_cosine_similarity(e.v, c.cvec) END, 6) DESC,
                      c.cell ASC) AS rn
    FROM e CROSS JOIN cents c) t
  WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {num_queries}),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(c.cvec, c.cvec) > 0 THEN list_cosine_similarity(q.qv, c.cvec) END, 6) DESC,
                      c.cell ASC) AS rn
    FROM q CROSS JOIN cents c) t
  WHERE rn <= {nprobe}
),
s AS (
  SELECT p.query_id, a.vec_id, round(CASE WHEN list_dot_product(a.v, a.v) > 0 AND list_dot_product(p.qv, p.qv) > 0 THEN list_cosine_similarity(a.v, p.qv) END, 6) AS cos
  FROM assigned a JOIN probes p ON a.cell = p.cell
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id ASC) AS rank
  FROM s) t
WHERE rank <= {k}
"""


def _l2sq_sql(a: str, b: str, d: int) -> str:
    """squared L2 over two DOUBLE[] columns, summed in index order —
    the twin of similarity._l2sq's sequential fold."""
    return (
        f"list_sum(list_transform(generate_series(1, {d}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _pq_common_ctes(
    num_queries: int, m: int, num_codes: int, dim: int
) -> str:
    """shared PQ CTEs: seeded codebooks (pq_train iterations=0 — the
    smallest-id vectors donate codewords, so the books are closed-form),
    per-(vector, subspace) argmin codes (pq_encode), and the per-query
    ADC lookup tables (pq_topk's broadcast side)."""
    d_sub = dim // m
    sl = f"s.sub * {d_sub} + 1, s.sub * {d_sub} + {d_sub}"
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
subs AS (SELECT unnest(generate_series(0, {m - 1})) AS sub),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS code, v
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT {num_codes}) t),
books AS (
  SELECT s.sub, c.code, list_slice(c.v, {sl}) AS cvec
  FROM seeds c CROSS JOIN subs s),
subv AS (
  SELECT e.vec_id, s.sub, list_slice(e.v, {sl}) AS svec
  FROM e CROSS JOIN subs s),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT sv.vec_id, sv.sub, b.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub
             ORDER BY round({_l2sq_sql('sv.svec', 'b.cvec', d_sub)}, 6) ASC,
                      b.code ASC) AS rn
    FROM subv sv JOIN books b ON sv.sub = b.sub) t
  WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e
      WHERE vec_id < {num_queries}),
qsub AS (
  SELECT query_id, s.sub, list_slice(qv, {sl}) AS qs
  FROM q CROSS JOIN subs s),
lookup AS (
  SELECT qsub.query_id, b.sub, b.code,
         round({_l2sq_sql('qsub.qs', 'b.cvec', d_sub)}, 6) AS d
  FROM qsub JOIN books b ON qsub.sub = b.sub)
"""


def pq_topk_sql(
    k: int = 10, num_queries: int = 5, m: int = 8, num_codes: int = 16,
    dim: int = 64,
) -> str:
    """SQL twin of similarity.pq_topk over pq_train(iterations=0) +
    pq_encode codes: ADC distance = per-sub table-lookup sum, rounded
    like the engine (lookup round 6, sum round 6)."""
    return f"""
WITH {_pq_common_ctes(num_queries, m, num_codes, dim)},
adc AS (
  SELECT l.query_id, enc.vec_id, round(sum(l.d), 6) AS dist
  FROM enc JOIN lookup l ON enc.sub = l.sub AND enc.code = l.code
  GROUP BY l.query_id, enc.vec_id)
SELECT query_id, vec_id, dist, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist ASC, vec_id ASC) AS rank
  FROM adc) t
WHERE rank <= {k}
"""


def ivfpq_topk_sql(
    k: int = 10, num_queries: int = 5, num_centroids: int = 16,
    nprobe: int = 4, m: int = 8, num_codes: int = 16, dim: int = 64,
) -> str:
    """SQL twin of similarity.ivfpq_topk (pq_iterations=0): the IVF
    coarse quantizer (ann_ivf_sql's cents/assigned/probes) restricts
    candidates to nprobe cells; ADC runs on PQ codes inside them."""
    return f"""
WITH {_pq_common_ctes(num_queries, m, num_codes, dim)},
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell, v AS cvec
  FROM (SELECT * FROM e ORDER BY vec_id ASC LIMIT {num_centroids}) t),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN list_dot_product(e.v, e.v) > 0 AND list_dot_product(c.cvec, c.cvec) > 0 THEN list_cosine_similarity(e.v, c.cvec) END, 6) DESC,
                      c.cell ASC) AS rn
    FROM e CROSS JOIN cents c) t
  WHERE rn = 1),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(c.cvec, c.cvec) > 0 THEN list_cosine_similarity(q.qv, c.cvec) END, 6) DESC,
                      c.cell ASC) AS rn
    FROM q CROSS JOIN cents c) t
  WHERE rn <= {nprobe}),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM assigned a JOIN probes p ON a.cell = p.cell),
adc AS (
  SELECT c.query_id, c.vec_id, round(sum(l.d), 6) AS dist
  FROM cand c
  JOIN enc ON enc.vec_id = c.vec_id
  JOIN lookup l ON l.query_id = c.query_id
               AND l.sub = enc.sub AND l.code = enc.code
  GROUP BY c.query_id, c.vec_id)
SELECT query_id, vec_id, dist, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist ASC, vec_id ASC) AS rank
  FROM adc) t
WHERE rank <= {k}
"""


def ann_suite_sql(
    k: int = 10, num_queries: int = 5, num_centroids: int = 16,
    nprobe: int = 4, m: int = 8, num_codes: int = 16, dim: int = 64,
) -> str:
    """SQL twin of the 4-branch __spark_entry__.q_ann_ivf composite:
    branch='topk' = ann_ivf_sql rows; branch='recall' = IVF recall@k vs
    exact; branch='pq' = pq_topk_sql rows (ADC dist in cos);
    branch='pqr' = IVF-PQ recall@k vs exact."""
    ivf = ann_ivf_sql(k, num_queries, num_centroids, nprobe)
    exact = cosine_topk_sql(k, num_queries)
    pq = pq_topk_sql(k, num_queries, m, num_codes, dim)
    ivfpq = ivfpq_topk_sql(k, num_queries, num_centroids, nprobe, m,
                           num_codes, dim)
    return f"""
WITH ivf AS ({ivf}),
exact AS ({exact}),
pq AS ({pq}),
ivfpq AS ({ivfpq}),
hits AS (
  SELECT i.query_id, count(*) AS h
  FROM ivf i JOIN exact x ON i.query_id = x.query_id AND i.vec_id = x.vec_id
  GROUP BY i.query_id),
hits_pqr AS (
  SELECT i.query_id, count(*) AS h
  FROM ivfpq i JOIN exact x ON i.query_id = x.query_id AND i.vec_id = x.vec_id
  GROUP BY i.query_id),
qs AS (SELECT DISTINCT query_id FROM exact)
SELECT 'topk' AS branch, query_id, vec_id, cos, rank FROM ivf
UNION ALL
SELECT 'recall' AS branch, q.query_id,
       CAST(coalesce(h.h, 0) AS BIGINT) AS vec_id,
       round(coalesce(h.h, 0) / {k}.0, 6) AS cos,
       CAST({k} AS BIGINT) AS rank
FROM qs q LEFT JOIN hits h ON q.query_id = h.query_id
UNION ALL
SELECT 'pq' AS branch, query_id, vec_id, dist AS cos, rank FROM pq
UNION ALL
SELECT 'pqr' AS branch, q.query_id,
       CAST(coalesce(h.h, 0) AS BIGINT) AS vec_id,
       round(coalesce(h.h, 0) / {k}.0, 6) AS cos,
       CAST({k} AS BIGINT) AS rank
FROM qs q LEFT JOIN hits_pqr h ON q.query_id = h.query_id
"""


def dedup_clusters_sql(n: int = 3, num_hashes: int = 8, bands: int = 4,
                       threshold: float = 0.5) -> str:
    """SQL twin of dedup.duplicate_clusters over minhash_dup_pairs:
    connected components via a recursive reachability CTE (min reachable
    id = the iterative min-label fixed point)."""
    pairs = minhash_pairs_sql(n=n, num_hashes=num_hashes, bands=bands,
                              threshold=threshold)
    return f"""
WITH RECURSIVE pairs AS (SELECT a, b FROM ({pairs}) mp),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id
"""


def kmv_sql_entry() -> str:
    """KMV distinct-users-per-event_type twin (sketches.kmv_sql with the
    entry's parameters)."""
    from hbase_snapshot_spark.operators.sketches import kmv_sql

    return kmv_sql("user_id", "events", "event_type", k=64)


def hll_sql_entry() -> str:
    """HLL distinct-users-per-event_type twin (sketches.hll_sql with the
    entry's parameters)."""
    from hbase_snapshot_spark.operators.sketches import hll_sql

    return hll_sql("user_id", "events", "event_type")


def tfidf_sql(k: int = 3) -> str:
    """SQL twin of text.tfidf_top_terms (smoothed tf*ln((N+1)/(df+1)),
    round 6, ties by term asc)."""
    return f"""
WITH docs AS (SELECT doc_id, lower({_NORM}) AS t FROM documents
              WHERE {_NORM} <> ''),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM docs),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM docs),
scored AS (
  SELECT doc_id, term, round(tf * ln((n.n + 1) / (df + 1)), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rank
  FROM scored) t
WHERE rank <= {k}
"""


def bm25_sql(
    queries: dict[str, str], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """SQL twin of text.bm25_topk — same tokenizer as tfidf_sql, Lucene
    idf ln(1 + (N − df + 0.5)/(df + 0.5)), round-6 score, ties doc asc.
    avgdl is exact in both engines (integer sum / count)."""
    qterms = sorted({
        (qid, t) for qid, qs in queries.items()
        for t in qs.lower().strip().split()
    })
    vals = ", ".join(f"('{q}', '{t}')" for q, t in qterms)
    inlist = ", ".join(f"'{t}'" for t in sorted({t for _, t in qterms}))
    return f"""
WITH docs AS (SELECT doc_id, lower({_NORM}) AS t FROM documents
              WHERE {_NORM} <> ''),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM docs),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM docs) AS n,
                 (SELECT avg(dl) FROM dl) AS avgdl),
q(query_id, term) AS (VALUES {vals}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ({inlist}) GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT t.doc_id, t.term,
         ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
         * (t.tf * ({k1} + 1.0))
         / (t.tf + {k1} * (1.0 - {b} + {b} * d.dl / s.avgdl)) AS c
  FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
  CROSS JOIN stats s),
scored AS (SELECT q.query_id, c.doc_id, round(sum(c.c), 6) AS score
           FROM q JOIN contrib c USING (term) GROUP BY 1, 2)
SELECT query_id, doc_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored) t
WHERE rank <= {k}
"""


def tfidf_suite_sql(queries: dict[str, str], k_tfidf: int = 3,
                    k_bm25: int = 10) -> str:
    """SQL twin of the 2-branch __spark_entry__.q_tfidf composite:
    branch='tfidf' = tfidf_sql rows; branch='bm25' = bm25_sql rows
    (query_id rides in term)."""
    return f"""
WITH tfidf AS ({tfidf_sql(k_tfidf)}),
bm25 AS ({bm25_sql(queries, k_bm25)})
SELECT 'tfidf' AS branch, doc_id, term, score, rank FROM tfidf
UNION ALL
SELECT 'bm25' AS branch, doc_id, query_id AS term, score, rank FROM bm25
"""


def pack_sequences_sql(cap: int, chunk: int = 64, overlap: int = 16) -> str:
    """SQL twin of packing.chunk_documents + pack_sequences over
    documents grouped by lang: 0-based ``chunk``-token windows at
    stride ``chunk - overlap`` (DuckDB 1-based inclusive list slicing
    matches Spark's slice(start, length)), then the cumulative-sum
    packing in (doc_id, chunk_idx) order."""
    # CAST(bin_offset AS BIGINT): DuckDB's windowed SUM over BIGINT yields
    # HUGEINT, which pandas fetches as float64 — that flipped the driver's
    # value hash in round 2 while every row compared equal (int 5 == 5.0).
    stride = chunk - overlap
    return f"""
WITH d AS (SELECT doc_id, lang,
                  string_split({_NORM}, ' ') AS toks
           FROM documents
           WHERE text IS NOT NULL AND {_NORM} <> ''),
c AS (SELECT doc_id, lang, toks, len(toks) AS n,
             UNNEST(range(CAST(greatest(
               ceil((len(toks) - {overlap}) / {stride}.0), 1) AS BIGINT)))
               AS chunk_idx
      FROM d),
x AS (SELECT doc_id, lang, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             array_to_string(
               toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {chunk}],
               ' ') AS chunk_text,
             CAST(least({chunk}, n - chunk_idx * {stride}) AS BIGINT)
               AS n_chunk_tokens
      FROM c)
SELECT 'pack' AS branch, doc_id, lang, chunk_idx, chunk_text,
       n_chunk_tokens,
       CAST(bin_offset AS BIGINT) AS n1,
       CAST(floor(bin_offset * 1.0 / {cap}) AS BIGINT) AS n2
FROM (
  SELECT *, COALESCE(SUM(n_chunk_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bin_offset
  FROM x) t
UNION ALL
SELECT 'batch' AS branch, doc_id, lang, chunk_idx, chunk_text,
       n_chunk_tokens,
       CAST(lb AS BIGINT) AS n1,
       CAST((row_number() OVER (
               PARTITION BY lang, lb ORDER BY doc_id, chunk_idx) - 1)
            // 32 AS BIGINT) AS n2
FROM (
  SELECT *, (CAST(n_chunk_tokens > 16 AS INT)
           + CAST(n_chunk_tokens > 32 AS INT)
           + CAST(n_chunk_tokens > 48 AS INT)) AS lb
  FROM x) b
"""


def scrub_pii_sql(email_pattern: str, url_pattern: str,
                  phone_pattern: str, ipv4_pattern: str,
                  card_pattern: str) -> str:
    """SQL twin of text.scrub_pii — the patterns are RE2-compatible so
    they run verbatim in DuckDB ('g' = replace all, matching Spark's
    regexp_replace).  Mirrors the query's synthetic
    email+URL+phone+IP+card suffix so the comparison proves pattern
    agreement, not just zero counts; replacement order email → URL →
    IP → phone → card matches the operator, and n_cards replays the
    Luhn mod-10 lambda over the candidate list (1-based index: even
    positions of the reversed digit string double, matching Spark's
    0-based odd)."""
    rev = "reverse(regexp_replace(c, '[ -]', '', 'g'))"
    dig = f"CAST(substr({rev}, CAST(i AS INT), 1) AS INT)"
    luhn = (
        f"list_sum(list_transform(range(1, length({rev}) + 1), i -> "
        f"CASE WHEN i % 2 = 0 THEN "
        f"CASE WHEN 2 * {dig} > 9 THEN 2 * {dig} - 9 "
        f"ELSE 2 * {dig} END ELSE {dig} END)) % 10 = 0"
    )
    return f"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or '
              || 'https://ex.io/d/' || doc_id
              || ' call +1 555-123-4567 or ('
              || (doc_id % 800 + 200) || ') 987-6543 from 10.0.'
              || (doc_id % 256) || '.7 now'
              || ' pay 4111 1111 1111 1111 not 4111 1111 1111 1112'
              || CASE WHEN doc_id % 3 = 0
                      THEN ' backup 5500-0000-0000-0004' ELSE '' END
           AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{email_pattern}')) AS n_emails,
       len(regexp_extract_all(text, '{url_pattern}')) AS n_urls,
       len(regexp_extract_all(text, '{phone_pattern}')) AS n_phones,
       len(regexp_extract_all(text, '{ipv4_pattern}')) AS n_ips,
       len(list_filter(regexp_extract_all(text, '{card_pattern}'),
                       c -> {luhn})) AS n_cards,
       length(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(
                text, '{email_pattern}', '<EMAIL>', 'g'),
                      '{url_pattern}', '<URL>', 'g'),
                      '{ipv4_pattern}', '<IP>', 'g'),
                      '{phone_pattern}', '<PHONE>', 'g'),
                      '{card_pattern}', '<CARD>', 'g')) AS clean_len
FROM d
"""


def quantize_sql() -> str:
    """SQL twin of embeddings.quantize_embeddings (symmetric int8:
    scale = max|x|/127, q = round(x/scale))."""
    return """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT vec_id, v,
             greatest(list_max(list_transform(v, x -> abs(x))) / 127.0,
                      1e-12) AS scale
      FROM e),
q AS (SELECT vec_id, scale,
             list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qv
      FROM s)
SELECT vec_id, round(scale, 9) AS scale,
       CAST(list_sum(qv) AS INT) AS q_sum,
       list_min(qv) AS q_min, list_max(qv) AS q_max
FROM q
"""


def _stopword_hits_sql(words: list[str]) -> str:
    return " + ".join(
        f"CASE WHEN ' ' || trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g')) || ' ' LIKE '% {w} %' THEN 1 ELSE 0 END"
        for w in words
    )


def lang_id_sql() -> str:
    scores = ", ".join(
        f"({_stopword_hits_sql(ws)}) AS s_{lang}" for lang, ws in STOPWORDS.items()
    )
    langs = list(STOPWORDS)
    gmax = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    case = "CASE "
    for la in langs:
        case += f"WHEN s_{la} = {gmax} AND {gmax} > 0 THEN '{la}' "
    case += "ELSE 'und' END"
    return f"""
WITH scored AS (SELECT doc_id, lang, text, {scores} FROM documents)
SELECT doc_id, lang, {case} AS detected FROM scored
"""


def text_stats_sql(ngram: int = 2) -> str:
    """stats + the Gopher repetition signals (text.repetition_signals)
    folded in as extra columns — dup_line_frac (repeated-line fraction)
    and top_ngram_frac (share of the most frequent word n-gram)."""
    nonspace = "length(regexp_replace(text, '[ \t\n\r\f]+', '', 'g'))"
    punct = "length(regexp_replace(text, '[a-zA-Z0-9 \t\n\r\f]', '', 'g'))"
    return f"""
WITH rep AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)),
                     l -> trim(l) <> '') AS lines,
         CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[])
              ELSE {_TOKS} END AS toks
  FROM documents),
grams AS (
  SELECT doc_id, lines,
         list_transform(
           generate_series(1, len(toks) - {ngram - 1}),
           i -> {" || ' ' || ".join(f"toks[i + {j}]" for j in range(ngram))}
         ) AS g
  FROM rep)
SELECT d.doc_id,
       {_NTOK} AS n_tokens,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_bpe_tokens,
       round(CASE WHEN {_NTOK} > 0 THEN {nonspace} / ({_NTOK}) ELSE 0.0 END, 4)
         AS avg_token_len,
       round(CASE WHEN length(text) > 0 THEN {punct} / length(text) ELSE 0.0 END, 4)
         AS punct_ratio,
       CASE WHEN len(g.lines) > 0
            THEN round((len(g.lines) - len(list_distinct(g.lines)))
                       / len(g.lines), 4)
            ELSE 0.0 END AS dup_line_frac,
       CASE WHEN len(g.g) > 0
            THEN round(list_max(list_transform(
                   list_distinct(g.g),
                   x -> len(list_filter(g.g, y -> y = x)))) / len(g.g), 4)
            ELSE 0.0 END AS top_ngram_frac
FROM documents d JOIN grams g ON d.doc_id = g.doc_id
"""


def quality_sql() -> str:
    """Six branches (see __spark_entry__.q_quality): 'gate' is the
    composite quality score; 'gopher' the rule mask
    (gopher_branch_sql); 'jxh'/'jxn' the justext extractor pins
    (justext_branch_sql); 'ppl' is Stupid-Backoff bigram scoring —
    LM counts from even doc_ids, odd doc_ids scored, backoff chain
    P = c(ctx,w)/c(ctx) else 0.4*c(w)/N else 0.4/N, v = round(avg
    log10 P, 6).  Tokens split on the explicit ASCII whitespace
    class; <s>/</s> frame each document."""
    sw = _stopword_hits_sql(STOPWORDS["en"])
    punct = (
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[a-zA-Z0-9 \t\n\r\f]', '', 'g')) / length(text) "
        "ELSE 0.0 END"
    )
    return f"""
WITH c AS (
  SELECT doc_id, {_NTOK} AS n_tok, ({sw}) AS sw, ({punct}) AS punct
  FROM documents
),
gate AS (
  SELECT 'gate' AS branch, doc_id,
       CASE WHEN n_tok IS NULL OR n_tok = 0 THEN 0.0 ELSE round((
         (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 1.0
               WHEN n_tok > 0 THEN 0.5 ELSE 0.0 END)
         + (CASE WHEN sw >= 2 THEN 1.0 ELSE sw / 2.0 END)
         + (CASE WHEN punct <= 0.2 THEN 1.0
                 ELSE greatest(0.0, 1.0 - (punct - 0.2) * 2) END)
       ) / 3, 4) END AS v
  FROM c
),
tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '[ \t\n\r\f]+'),
                     x -> x <> '') AS ws
  FROM documents
),
pairs0 AS (
  SELECT doc_id,
         unnest(list_zip(list_prepend('<s>', ws),
                         list_append(ws, '</s>'))) AS p
  FROM tok
),
pairs AS (SELECT doc_id, p[1] AS ctx, p[2] AS w FROM pairs0),
tpairs AS (SELECT * FROM pairs WHERE doc_id % 2 = 0),
epairs AS (SELECT * FROM pairs WHERE doc_id % 2 = 1),
big AS (SELECT ctx, w, count(*)::DOUBLE AS c FROM tpairs GROUP BY 1, 2),
bigt AS (SELECT ctx, sum(c) AS t FROM big GROUP BY 1),
uni AS (SELECT w, count(*)::DOUBLE AS c FROM tpairs GROUP BY 1),
unit AS (SELECT sum(c) AS t FROM uni),
ppl AS (
  SELECT 'ppl' AS branch, e.doc_id,
         round(avg(log10(coalesce(
            b.c / bt.t,
            0.4 * u.c / (SELECT t FROM unit),
            0.4 / (SELECT t FROM unit)))), 6) AS v
  FROM epairs e
  LEFT JOIN big b ON b.ctx = e.ctx AND b.w = e.w
  LEFT JOIN bigt bt ON bt.ctx = e.ctx
  LEFT JOIN uni u ON u.w = e.w
  GROUP BY e.doc_id
),
nbtok AS (
  SELECT doc_id, (lang = 'en') AS pos,
         unnest(list_filter(
           regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f]+'),
           x -> x <> '')) AS token
  FROM documents
),
nbmodel AS (
  SELECT token,
         SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pn,
         SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
  FROM nbtok WHERE doc_id % 2 = 0 GROUP BY token
),
nbc AS (SELECT SUM(pn) AS p, SUM(nn) AS n, COUNT(*) AS v FROM nbmodel),
nb AS (
  SELECT 'nb' AS branch, t.doc_id,
         round(SUM(
             ln((coalesce(m.pn, 0) + 1.0) / (c.p + 1.0 * c.v))
           - ln((coalesce(m.nn, 0) + 1.0) / (c.n + 1.0 * c.v))), 6) AS v
  FROM nbtok t
  LEFT JOIN nbmodel m ON m.token = t.token
  CROSS JOIN nbc c
  WHERE t.doc_id % 2 = 1
  GROUP BY t.doc_id
)
SELECT branch, doc_id, v FROM gate
UNION ALL
SELECT branch, doc_id, v FROM ppl
UNION ALL
SELECT branch, doc_id, v FROM nb
UNION ALL
SELECT branch, doc_id, v FROM ({gopher_branch_sql()}) gopher
UNION ALL
SELECT branch, doc_id, v FROM ({justext_branch_sql()}) jx
"""


#: q_quality's justext-branch thresholds, shared by the Spark call and
#: the SQL twin.  NOT the operator defaults: the synthetic documents
#: text is content-word-heavy (stopword fraction 0..~0.15), so the
#: paper's prose thresholds would classify every block bad and the pin
#: would discriminate nothing — these put the corpus ACROSS the
#: good/near/bad boundaries so per-doc classification (and the
#: promotion chain) varies.
JUSTEXT_PARAMS = {
    "max_link_density": 0.2,
    "length_low": 30,
    "length_high": 100,
    "stopwords_low": 0.03,
    "stopwords_high": 0.06,
}


def justext_branch_sql() -> str:
    """SQL twin of text.extract_main_content over the q_quality HTML
    shell (jusText, Pomikálek 2011): the identical clean → block-split
    → per-block features (link density / length / stopword density) →
    classification → one promotion pass, replayed in DuckDB list
    lambdas.  'jxh' = first 32 md5 bits of the newline-joined kept
    content (exact double); 'jxn' = n_blocks*1000 + n_good.  Regexes
    are injected from the SAME Python constants the Spark expression
    uses; whitespace is the explicit ASCII class (the Java-\\s-vs-RE2
    divergence note, as in the ppl branch)."""
    from hbase_snapshot_spark.operators.text import (
        _BLOCK_SPLIT_RE,
        JUSTEXT_STOPWORDS_EN,
    )

    stop = ", ".join(f"'{w}'" for w in JUSTEXT_STOPWORDS_EN)
    anchor_re = "(?is)<a\\b[^>]*>(.*?)</a[ \\t\\n\\r\\f]*>"
    # per-word edge strip: the single quote doubles inside the SQL
    # literal
    word_strip = "^[^a-z0-9'']+|[^a-z0-9'']+$"
    # tag strip → entity decode (strip_html's order) → ws collapse,
    # chain built programmatically so the nesting can't drift
    chain = "regexp_replace(b, '<[^>]+>', ' ', 'g')"
    for pat, rep in [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "''"),
                     ("&apos;", "''"), ("&amp;", "&")]:
        chain = f"regexp_replace({chain}, '{pat}', '{rep}', 'g')"
    plain_expr = (
        f"trim(regexp_replace({chain}, '[ \t\n\r\f]+', ' ', 'g'))"
    )
    w = "struct_extract(s, 'w')"
    p = "struct_extract(s, 'plain')"
    stopfrac = (
        f"CASE WHEN len({w}) > 0 THEN "
        f"len(list_filter({w}, x -> list_contains([{stop}], "
        f"regexp_replace(x, '{word_strip}', '', 'g'))))"
        f" / greatest(len({w}), 1) ELSE 0.0 END"
    )
    return f"""
WITH jxsrc AS (
  SELECT doc_id,
         '<nav><a href="/">Home</a> <a href="/a">About</a> '
         || '<a href="/c">Contact</a></nav><h2>Doc '
         || CAST(doc_id AS VARCHAR) || '</h2><p>' || text
         || '</p><div>accept all cookies settings privacy imprint '
         || 'navigation menu toolbar sitemap categories archive '
         || 'tags login register</div>'
         || '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a> '
         || '<a href="/i">Imprint</a></footer>' AS html
  FROM documents
),
jxclean AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(html,
      '(?s)<!--.*?-->', ' ', 'g'),
      '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
      '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g') AS t
  FROM jxsrc
),
jxfeat AS (
  SELECT doc_id,
    list_filter(
      list_transform(
        regexp_split_to_array(t, '{_BLOCK_SPLIT_RE}'),
        b -> struct_pack(
          plain := {plain_expr},
          w := list_filter(string_split(lower({plain_expr}), ' '),
                           x -> x <> ''),
          link_len := coalesce(list_sum(list_transform(
            regexp_extract_all(b, '{anchor_re}', 1),
            a -> length(trim(regexp_replace(a, '<[^>]+>', ' ', 'g')))
          )), 0))),
      s -> struct_extract(s, 'plain') <> '') AS blocks
  FROM jxclean
),
jxcls AS (
  SELECT doc_id, blocks,
    list_transform(blocks, s ->
      CASE
        WHEN struct_extract(s, 'link_len')
             / greatest(length({p}), 1)
             > {JUSTEXT_PARAMS['max_link_density']} THEN 0
        WHEN length({p}) < {JUSTEXT_PARAMS['length_low']} THEN 1
        WHEN ({stopfrac}) >= {JUSTEXT_PARAMS['stopwords_high']}
             AND length({p}) > {JUSTEXT_PARAMS['length_high']} THEN 2
        WHEN ({stopfrac}) >= {JUSTEXT_PARAMS['stopwords_low']} THEN 1
        ELSE 0 END) AS cls
  FROM jxfeat
),
jxkept AS (
  -- context resolution: an undecided block (cls 1) survives iff its
  -- nearest DECIDED neighbor (cls != 1) on either side is good; list
  -- slices are 1-based end-inclusive, out-of-range => empty => edge
  -- counts as bad
  SELECT doc_id, len(blocks) AS n_blocks,
    list_filter(
      list_transform(range(1, len(blocks) + 1), i ->
        CASE WHEN cls[CAST(i AS INT)] = 2
               OR (cls[CAST(i AS INT)] = 1
                   AND (coalesce(list_filter(cls[1:CAST(i AS INT) - 1],
                                 c -> c != 1)[-1], 0) = 2
                     OR coalesce(list_filter(cls[CAST(i AS INT) + 1:],
                                 c -> c != 1)[1], 0) = 2))
             THEN struct_extract(blocks[CAST(i AS INT)], 'plain')
        END),
      x -> x IS NOT NULL) AS kept
  FROM jxcls
)
SELECT 'jxh' AS branch, doc_id,
       -- array_to_string([]) is NULL in DuckDB but '' in Spark's
       -- array_join: the CASE keeps empty-kept and null-input apart
       CAST(('0x' || substr(md5(
         CASE WHEN kept IS NULL THEN NULL
              WHEN len(kept) = 0 THEN ''
              ELSE array_to_string(kept, chr(10)) END), 1, 8))
            ::BIGINT AS DOUBLE) AS v
FROM jxkept
UNION ALL
SELECT 'jxn' AS branch, doc_id,
       CAST(n_blocks * 1000 + len(kept) AS DOUBLE) AS v
FROM jxkept
"""


def gopher_branch_sql() -> str:
    """SQL twin of text.gopher_rules, shaped into (branch='gopher',
    doc_id, v=the 8-bit rule mask) — the mask pins every rule
    independently under the one composite hash."""
    sws = ", ".join(f"'{w}'" for w in (
        "the", "be", "to", "of", "and", "that", "have", "with"))
    return f"""
WITH g AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                x -> x <> '') AS words,
    length(regexp_replace(text, '[ \t\n\r\f]+', '', 'g'))
        AS n_word_chars,
    len(regexp_extract_all(text, '#'))
      + len(regexp_extract_all(text, '\\.\\.\\.')) AS symbols,
    list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM documents
),
m AS (
  SELECT doc_id, len(words) AS n_words, n_word_chars, symbols,
    len(lines) AS n_lines,
    len(list_filter(lines,
        x -> regexp_matches(x, '^[ \t]*[-*•]'))) AS bullet,
    len(list_filter(lines,
        x -> regexp_matches(x, '\\.\\.\\.[ \t]*$'))) AS ellipsis,
    len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
    len(list_intersect(
        list_distinct(list_transform(words, x -> lower(x))),
        [{sws}])) AS swp,
    (len(lines) - len(list_distinct(lines)))
        / greatest(len(lines), 1) AS dup_lines
  FROM g
)
SELECT 'gopher' AS branch, doc_id, CAST(
    (CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END)
  + (CASE WHEN n_words > 0
               AND n_word_chars / greatest(n_words, 1) >= 3.0
               AND n_word_chars / greatest(n_words, 1) <= 10.0
          THEN 2 ELSE 0 END)
  + (CASE WHEN n_words > 0 AND symbols / greatest(n_words, 1) <= 0.1
          THEN 4 ELSE 0 END)
  + (CASE WHEN n_words > 0
               AND (n_lines = 0 OR bullet / greatest(n_lines, 1) <= 0.1)
          THEN 8 ELSE 0 END)
  + (CASE WHEN n_words > 0
               AND (n_lines = 0 OR ellipsis / greatest(n_lines, 1) <= 0.3)
          THEN 16 ELSE 0 END)
  + (CASE WHEN n_words > 0 AND alpha / greatest(n_words, 1) >= 0.8
          THEN 32 ELSE 0 END)
  + (CASE WHEN n_words > 0 AND swp >= 2 THEN 64 ELSE 0 END)
  + (CASE WHEN n_words > 0 AND dup_lines <= 0.3 THEN 128 ELSE 0 END)
  AS DOUBLE) AS v
FROM m
"""


def fingerprint_sql() -> str:
    # urlkey: the closed form of Keying.createKey over the synthetic URL
    # http://<source>.example.org/doc/<doc_id> — scheme kept, host
    # dot-reversed ('org.example.' || source), wrapped in 'r:'.  The
    # Spark side computes the same thing through the REAL url_key
    # regex+reverse expression, so a hash match verifies the transform.
    # plain: the strip_html chain (comments → script → style → tags →
    # entities in decode order → whitespace collapse) over the same
    # deterministic HTML shell the Spark side builds.  Whitespace is
    # the explicit ASCII class (Java \s would include \x0B, RE2's
    # would not — the explicit class keeps both sides identical).
    return r"""
WITH h AS (
  SELECT doc_id, source, text,
         '<html lang="EN-' || (doc_id % 4) || '"><head><title>T</title>'
         || '<meta name="description" content="d' || (doc_id % 9)
         || '"><link rel="canonical" href="https://c.example/p/'
         || doc_id
         || '"><style type="text/css">'
         || 'p{color:red}</style></head><body onload="init()">'
         || '<!-- header --><p class="x">' || text
         || '</p><script type="text/javascript">if (1 < 2) { go(); }'
         || '</script>&nbsp;&amp;done</body></html>' AS html
  FROM documents
), s AS (
  SELECT doc_id, source, text,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      '(?s)<!--.*?-->', ' ', 'g'),
      '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
      '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
      '<[^>]+>', ' ', 'g') AS t
  FROM h
), e AS (
  SELECT doc_id, source, text,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(regexp_replace(t,
      '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
      '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&apos;', '''', 'g'),
      '&amp;', '&', 'g') AS t
  FROM s
)
, """ + _winnow_sel_cte() + r"""
, b AS (
  -- domain_filter twin: host of the per-doc page URL (every third doc
  -- gets a deeper cdn. host), whole-label dot suffixes, any-hit
  -- against the literal blocklist
  SELECT doc_id,
         list_has_any(
           list_transform(range(1, len(hp) + 1),
                          i -> array_to_string(hp[CAST(i AS INT):], '.')),
           ['src3.example.org', 'src7.example.org', 'example.net']
         ) AS blocked
  FROM (
    -- trailing-dot strip mirrors text.url_host (root-qualified FQDNs)
    SELECT doc_id,
           string_split(regexp_replace(lower(regexp_extract(
             CASE WHEN doc_id % 3 = 0
                  THEN 'https://cdn.' || source || '.example.org/p/' || doc_id
                  ELSE 'http://' || source || '.example.org/doc/' || doc_id
             END,
             '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)),
             '\.+$', ''),
             '.') AS hp
    FROM documents) hb
)
SELECT e.doc_id,
       md5(trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'))) AS fingerprint,
       'r:http://org.example.' || source || '/doc/' || e.doc_id AS urlkey,
       trim(regexp_replace(t, '[ \t\n\r\f]+', ' ', 'g')) AS plain,
       CAST(len(wsel.sel) AS BIGINT) AS n_winnow,
       md5(array_to_string(list_transform(wsel.sel,
           x -> CAST(x AS VARCHAR)), ',')) AS winnow_digest,
       b.blocked AS blocked,
       cn.canon AS canon,
       -- html_metadata twin: the closed form of the shell's head
       -- fields (the urlkey pattern — construction is shared, so the
       -- engine's extraction regexes must reproduce these exactly)
       'd' || (e.doc_id % 9) AS meta_description,
       'https://c.example/p/' || e.doc_id AS meta_canonical,
       'en-' || (e.doc_id % 4) AS meta_lang
FROM e JOIN wsel ON e.doc_id = wsel.doc_id JOIN b ON e.doc_id = b.doc_id
JOIN (""" + canonicalize_branch_sql() + r""") cn ON e.doc_id = cn.doc_id
"""


def canonicalize_branch_sql() -> str:
    """SQL twin of text.canonicalize_url over q_fingerprint's messy
    synthetic URL (upper-cased scheme+host every 5th doc, default :80
    port every 4th, a :8080 keeper every 4th+1, tracking params
    bracketing a real one, fragment).  Applies the IDENTICAL regexp
    chain with the same shared pattern constants — possible because
    the chain uses no capture-group replacements (Java '$1' vs RE2
    '\\\\1' would diverge)."""
    from hbase_snapshot_spark.operators.text import (
        _SCHEME_HOST_RE,
        TRACKING_PARAMS_RE,
    )

    return rf"""
WITH msrc AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 5 = 0 THEN 'HTTP://' ELSE 'http://' END)
         || (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END)
         || '.Example.org'
         || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                  WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END)
         || '/Doc/' || doc_id
         || '?utm_source=feed&id=' || (doc_id % 7)
         || '&fbclid=abc#sec' AS u
  FROM documents
),
mparts0 AS (
  SELECT doc_id,
         lower(regexp_extract(u, '{_SCHEME_HOST_RE}', 0)) AS sh,
         regexp_replace(
           regexp_replace(u, '{_SCHEME_HOST_RE}', ''),
           '(?s)#.*$', '') AS rest0
  FROM msrc
),
mparts AS (
  -- tracking strips scoped to the QUERY part, like the Spark side:
  -- '&utm_' inside a path segment is real path bytes
  SELECT doc_id, sh,
         regexp_extract(rest0, '^[^?]*', 0)
         || regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(rest0, '^[^?]*', ''),
              '&{TRACKING_PARAMS_RE}', '', 'g'),
              '\?{TRACKING_PARAMS_RE}&', '?'),
              '\?{TRACKING_PARAMS_RE}$', '') AS rest
  FROM mparts0
)
SELECT doc_id,
       (CASE WHEN sh LIKE 'http://%' THEN regexp_replace(sh, ':80$', '')
             WHEN sh LIKE 'https://%' THEN regexp_replace(sh, ':443$', '')
             ELSE sh END)
       || (CASE WHEN rest = '' THEN '/' ELSE rest END) AS canon
FROM mparts
"""


def media_features_sql() -> str:
    return """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest,
       lower(substr(hex(encode(text)), 1, 16)) AS head_hex
FROM documents
"""


def _hex8_int_sql(hex_expr: str) -> str:
    """8-char lowercase hex string → uint32 via nibble arithmetic
    (DuckDB twin of Spark's conv(x,16,10)).  Pass a PRE-COMPUTED hex
    expression (e.g. a lambda variable) so anything expensive inside it
    is evaluated once, not once per nibble."""
    nib = (
        "(strpos('0123456789abcdef', "
        f"substr({hex_expr}, {{i}}, 1)) - 1)"
    )
    return "(" + " + ".join(
        f"{nib.format(i=i + 1)} * {16 ** (7 - i)}" for i in range(8)
    ) + ")"


def hash_fraction_sql(key_expr: str) -> str:
    """DuckDB twin of sampling.hash_fraction: first 8 md5 hex chars →
    uint32 via nibble arithmetic (no hex-cast needed), / 2^32.
    NULL keys share the sentinel, mirroring sampling.NULL_KEY_SENTINEL."""
    keyed = f"coalesce(CAST({key_expr} AS VARCHAR), '<NULL>')"
    nib = (
        "(strpos('0123456789abcdef', "
        f"substr(md5({keyed}), {{i}}, 1)) - 1)"
    )
    terms = " + ".join(
        f"{nib.format(i=i + 1)} * {16 ** (7 - i)}" for i in range(8)
    )
    return f"(CAST({terms} AS DOUBLE) / 4294967296.0)"


def stratified_sample_sql(fractions: dict[str, float], default: float = 0.0) -> str:
    """Three-branch sampling composite twin (strat/mix/imp) — see
    q_stratified_sample.  The mix/imp literals mirror the query's
    weights/budget/fraction and the Python-side float arithmetic
    (targets are computed here with the same ``budget * w / Σw``)."""
    frac = hash_fraction_sql("doc_id")
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {f}" for s, f in fractions.items()
    )
    weights = {"en": 2.0, "de": 1.0, "fr": 1.0}
    budget, wsum = 200_000, sum(weights.values())
    tcases = " ".join(
        f"WHEN lang = '{d}' THEN {float(budget) * float(w) / wsum!r}"
        for d, w in weights.items()
    )
    return f"""
WITH strat AS (
  SELECT 'strat' AS branch, doc_id, lang FROM documents
  WHERE {frac} < (CASE {cases} ELSE {default} END)
), totals AS (
  SELECT lang, SUM(CAST(n_chars AS DOUBLE)) AS tot
  FROM documents GROUP BY lang
), rates AS (
  SELECT lang,
         least(1.0, (CASE {tcases} ELSE 0.0 END) / tot) AS rate
  FROM totals
), mix AS (
  SELECT 'mix' AS branch, d.doc_id, d.lang
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE {frac.replace('doc_id', 'd.doc_id')} < r.rate
), mw AS (
  SELECT AVG(CAST(n_chars AS DOUBLE)) AS mean_w FROM documents
), imp AS (
  SELECT 'imp' AS branch, doc_id, lang
  FROM documents, mw
  WHERE {frac} < least(1.0, CAST(n_chars AS DOUBLE) * (0.25 / mean_w))
)
SELECT branch, doc_id, lang FROM strat
UNION ALL SELECT branch, doc_id, lang FROM mix
UNION ALL SELECT branch, doc_id, lang FROM imp
"""


def grouping_agg_sql() -> str:
    return """
SELECT user_id, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM events
WHERE user_id IS NOT NULL AND event_type IS NOT NULL
GROUP BY user_id, event_type
"""


def tpch_q1_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""
