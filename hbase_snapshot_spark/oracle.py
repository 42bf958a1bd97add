"""DuckDB oracle SQL generators — the ANSI-SQL twins of the engine's
operators, used by ``__spark_entry__.oracle_sql()``.

Every generator mirrors, statement-for-statement, the semantics encoded
in resolve.py (tombstone masking / time-range / TTL / version counting)
and parity.py (the orders→cells melt).  Keeping them as *generated*
strings from shared parameters is what keeps the two sides in lock-step.
"""

from __future__ import annotations

ORDERS_SRC_SQL = """
  SELECT lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS row,
         o_orderkey AS k,
         o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS total_s,
         o_orderpriority,
         strftime(o_orderdate, '%Y-%m-%d') AS odate_s
  FROM orders
"""

ORDERS_CELLS_SQL = f"""
  WITH src AS ({ORDERS_SRC_SQL})
  SELECT row, CAST('o' AS VARCHAR) AS family, CAST('status' AS VARCHAR) AS qualifier,
         CAST(1000 AS BIGINT) AS ts, CAST(4 AS INTEGER) AS type, CAST(1 AS BIGINT) AS seq,
         CAST(o_orderstatus AS VARCHAR) AS value
  FROM src
  UNION ALL SELECT row, 'o', 'total', 1000, 4, 1, total_s FROM src
  UNION ALL SELECT row, 'm', 'prio', 1000, 4, 1, o_orderpriority FROM src
  UNION ALL SELECT row, 'm', 'odate', 1000, 4, 1, odate_s FROM src
  UNION ALL SELECT row, 'o', 'status', 2000, 4, 2, 'U-' || o_orderstatus FROM src WHERE k % 3 = 0
  UNION ALL SELECT row, 'o', 'status', 3000, 4, 3, 'FINAL' FROM src WHERE k % 9 = 0
  UNION ALL SELECT row, 'o', 'total', 2000, 4, 4, 'T2-' || total_s FROM src WHERE k % 6 = 0
  UNION ALL SELECT row, 'm', 'prio', 1500, 12, 5, NULL FROM src WHERE k % 5 = 0
  UNION ALL SELECT row, 'o', NULL, 1700, 14, 6, NULL FROM src WHERE k % 11 = 0
  UNION ALL SELECT row, 'o', 'total', 1000, 8, 7, NULL FROM src WHERE k % 7 = 0
"""


def _in_list(vals) -> str:
    return ", ".join("'" + str(v).replace("'", "''") + "'" for v in vals)


def resolve_sql(
    *,
    cells_sql: str = ORDERS_CELLS_SQL,
    max_versions: int | None = 1,
    family_max_versions: dict[str, int] | None = None,
    time_range: tuple[int, int] | None = None,
    ttl_cutoffs: dict[str, int] | None = None,
    families: list[str] | None = None,
    columns: dict[str, list[str]] | None = None,
    cell_filter_sql: str | None = None,
    stream_qualify: str | None = None,
    select: str = "row, family, qualifier, ts, value",
    where: str | None = None,
    tail: str = "",
) -> str:
    """SQL twin of resolve.resolve() — see that module's docstring for
    the semantics citations (ScanQueryMatcher / ScanDeleteTracker /
    TimeRange / column trackers)."""
    base_preds = []
    if families:
        base_preds.append(f"family IN ({_in_list(families)})")
    for fam, cutoff in (ttl_cutoffs or {}).items():
        # TTL expiry before delete tracking (ScanQueryMatcher.java:151-168)
        base_preds.append(f"(family <> '{fam}' OR ts >= {cutoff})")
    fam_proj = ("WHERE " + " AND ".join(base_preds)) if base_preds else ""
    del_tr = f"AND ts >= {time_range[0]}" if time_range else ""
    live_where = (
        f"AND p.ts >= {time_range[0]} AND p.ts < {time_range[1]}" if time_range else ""
    )
    cell_where = f"WHERE {cell_filter_sql}" if cell_filter_sql else ""
    # qualifier projection happens AFTER the filter/stream stage, like the
    # reference's column tracker (checkColumn runs last in match())
    if columns:
        ors = [
            f"(family = '{fam}' AND qualifier IN ({_in_list(quals)}))"
            for fam, quals in columns.items()
        ]
        # addFamily'd families without explicit qualifiers = all columns
        # of that family (Scan.addFamily: familyMap.put(family, null))
        whole = [f for f in (families or []) if f not in columns]
        if whole:
            ors.append(f"family IN ({_in_list(whole)})")
        col_proj = "WHERE " + " OR ".join(ors)
    else:
        col_proj = ""
    if family_max_versions:
        # effective N = min(scan.maxVersions, family.maxVersions)
        # (Store.versionsToReturn:952)
        scan_n = max_versions if max_versions is not None else 1 << 31
        cases = " ".join(
            f"WHEN family = '{fam}' THEN {min(scan_n, n)}"
            for fam, n in family_max_versions.items()
        )
        n_expr = f"(CASE {cases} ELSE {scan_n} END)"
        qualify = (
            f"QUALIFY row_number() OVER (PARTITION BY row, family, qualifier "
            f"ORDER BY ts DESC, seq DESC) <= {n_expr}"
        )
    elif max_versions is not None:
        qualify = (
            f"QUALIFY row_number() OVER (PARTITION BY row, family, qualifier "
            f"ORDER BY ts DESC, seq DESC) <= {max_versions}"
        )
    else:
        qualify = ""
    stream_q = f"QUALIFY {stream_qualify}" if stream_qualify else ""
    outer_where = f"WHERE {where}" if where else ""
    return f"""
WITH cells AS ({cells_sql}),
base AS (SELECT * FROM cells {fam_proj}),
dels AS (SELECT * FROM base WHERE type IN (8, 12, 14) {del_tr}),
famdel AS (SELECT row, family, max(ts) AS fts FROM dels WHERE type = 14 GROUP BY 1, 2),
coldel AS (SELECT row, family, qualifier, max(ts) AS cts
           FROM dels WHERE type = 12 GROUP BY 1, 2, 3),
verdel AS (SELECT DISTINCT row, family, qualifier, ts FROM dels WHERE type = 8),
live AS (
  SELECT p.row, p.family, p.qualifier, p.ts, p.seq, p.value
  FROM base p
  LEFT JOIN famdel f ON p.row = f.row AND p.family = f.family
  LEFT JOIN coldel c ON p.row = c.row AND p.family = c.family AND p.qualifier = c.qualifier
  LEFT JOIN verdel v ON p.row = v.row AND p.family = v.family
                    AND p.qualifier = v.qualifier AND p.ts = v.ts
  WHERE p.type = 4
    AND (f.fts IS NULL OR p.ts > f.fts)
    AND (c.cts IS NULL OR p.ts > c.cts)
    AND v.ts IS NULL
    {live_where}
),
-- same-coordinate rewrite collapse: newest seq wins at one
-- (row,family,qualifier,ts) — MemStore SkipListMap put-overwrite
-- (KeyValueSkipListSet.java:157-159); mirrors resolve.mask()
collapsed AS (
  SELECT * FROM live
  QUALIFY row_number() OVER (PARTITION BY row, family, qualifier, ts
                             ORDER BY seq DESC) = 1
),
filtered AS (SELECT * FROM collapsed {cell_where}),
streamed AS (
  SELECT * FROM filtered
  {stream_q}
),
projected AS (SELECT * FROM streamed {col_proj}),
resolved AS (
  SELECT * FROM projected
  {qualify}
)
SELECT {select} FROM resolved {outer_where} {tail}
"""
