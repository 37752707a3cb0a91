"""Manifest-level per-file column statistics — Iceberg-style file skipping.

The reference narrows its work by listing object-store prefixes and
filtering filenames before it ever downloads content
(/root/reference/load/InputFileset.py:86-118); Iceberg generalizes
that into per-data-file column bounds kept in the manifest, so a scan
planner prunes files from METADATA alone. This module is that layer
for the lake: at write time each data file's footer is read once
(metadata-only — no row bytes) and min/max/null-count bounds for the
table's configured stats columns are recorded in the manifest entry;
at read time ``LakeTable.read(where=...)`` drops every file whose
bounds prove it cannot match, before Spark ever sees a path.

Why this matters at 100 TB: bucket pruning narrows a point lookup to
~1/B of the data, and parquet row-group stats narrow scanning WITHIN
an opened file — but both still require shipping every surviving file
path into the scan. Manifest bounds are the only layer that lets a
1000-executor range scan over years of snapshots open just the handful
of files whose ``warc_ts`` range overlaps the query, exactly like
Iceberg's ``lower_bounds``/``upper_bounds`` manifest fields.

Correctness never depends on stats: pruning is strictly conservative
(a file is dropped only when its bounds PROVE emptiness; missing or
unreadable stats keep the file), and the residual predicate is always
re-applied to the scanned rows. Stats are keyed by COLUMN ID, not
name, so rename-by-id schema evolution keeps old files prunable.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

_EPOCH = _dt.datetime(1970, 1, 1)
_OPS = ("=", "<", "<=", ">", ">=", "in")


def _norm(value: Any, kind: str, tz: _dt.tzinfo | None = None) -> Any:
    """Normalize a python value into the manifest-comparable form for
    ``kind`` (the ``t`` tag stored with each column's bounds).

    ``tz``: the Spark session timezone — a NAIVE datetime (or datetime
    string) predicate means session-local wall time, exactly as
    ``F.lit(naive_dt)`` does, so it must be localized before comparing
    against the manifest's absolute (UTC-epoch) bounds. Stat values
    read from footers arrive tz-aware (UTC) and ignore ``tz``.

    Returns None when the value cannot be coerced — callers treat that
    as "cannot prune on this predicate" (conservative).
    """
    try:
        if kind == "num":
            if isinstance(value, bool) or not isinstance(value, (int, float)):
                return None
            return value
        if kind == "str":
            return value if isinstance(value, str) else None
        if kind == "bool":
            return int(value) if isinstance(value, bool) else None
        if kind == "ts":
            # Mirror Spark's own localization rules EXACTLY (measured,
            # not assumed — pruning must never be tighter than the
            # residual filter): a STRING predicate is cast with the
            # SESSION timezone; a naive datetime OBJECT crosses py4j
            # as an instant in the python process's OS timezone.
            if isinstance(value, str):
                value = _dt.datetime.fromisoformat(value)
                if value.tzinfo is None:
                    if tz is None:
                        return None  # session tz unknown — cannot prune
                    value = value.replace(tzinfo=tz)
            if isinstance(value, _dt.datetime):
                if value.tzinfo is None:
                    value = value.astimezone()  # OS-local, as F.lit does
                value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                return (value - _EPOCH) // _dt.timedelta(microseconds=1)
            return None
        if kind == "date":
            if isinstance(value, str):
                value = _dt.date.fromisoformat(value)
            if isinstance(value, _dt.datetime):
                value = value.date()
            if isinstance(value, _dt.date):
                return value.toordinal()
            return None
    except (ValueError, TypeError, OverflowError):
        return None
    return None


def _kind_of(value: Any) -> str | None:
    """Stat-value kind tag for a footer min/max value (by python type)."""
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, (int, float)):
        return "num"
    if isinstance(value, str):
        return "str"
    if isinstance(value, _dt.datetime):
        return "ts"
    if isinstance(value, _dt.date):
        return "date"
    return None  # bytes / decimal / nested — not supported for bounds


def collect_file_stats(abs_path: str, wanted: dict[str, int]) -> dict:
    """Read ONE parquet footer and return manifest-ready bounds.

    ``wanted`` maps written-schema column NAME -> column ID. Returns
    ``{"rows": n, "cols": {str(col_id): {"t","min","max","nulls"}}}``;
    a column is omitted when any row group lacks usable stats for it
    (partial bounds would not be conservative). Raises nothing — on
    any failure the caller records no stats and pruning is disabled
    for the file, which is always safe.
    """
    import pyarrow.parquet as pq

    md = pq.read_metadata(abs_path)
    out: dict[str, dict] = {}
    # column-chunk index by path name (flat schema: path == name)
    if md.num_row_groups == 0:
        return {"rows": 0, "cols": {}}
    rg0 = md.row_group(0)
    idx_by_name = {rg0.column(i).path_in_schema: i for i in range(rg0.num_columns)}
    for name, col_id in wanted.items():
        i = idx_by_name.get(name)
        if i is None:
            continue
        lo = hi = None
        nulls = 0
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_null_count:
                ok = False
                break
            nulls += st.null_count
            if not st.has_min_max:
                # all-null chunk has no bounds — fine only if truly all
                # null, else we cannot bound the file
                if st.null_count != md.row_group(rg).num_rows:
                    ok = False
                    break
                continue
            kind = _kind_of(st.min)
            if kind is None or kind != _kind_of(st.max):
                ok = False
                break
            mn, mx = _norm(st.min, kind), _norm(st.max, kind)
            if mn is None or mx is None:
                ok = False
                break
            if lo is None:
                lo, hi, tag = mn, mx, kind
            elif tag != kind:
                ok = False
                break
            else:
                lo, hi = min(lo, mn), max(hi, mx)
        if not ok:
            continue
        entry: dict[str, Any] = {"nulls": nulls}
        if lo is not None:
            entry.update({"t": tag, "min": lo, "max": hi})
        out[str(col_id)] = entry
    return {"rows": md.num_rows, "cols": out}


def validate_predicates(preds: list[tuple]) -> None:
    for p in preds:
        if len(p) != 3 or p[1] not in _OPS:
            raise ValueError(
                f"predicate must be (column, op, value) with op in {_OPS}: {p!r}"
            )
        if p[1] == "in" and not isinstance(p[2], (list, tuple, set)):
            raise ValueError(f"'in' predicate needs a list of values: {p!r}")


def file_may_match(
    file_entry: dict,
    preds_by_id: dict[int, list[tuple]],
    tz: _dt.tzinfo | None = None,
) -> bool:
    """True unless this file's bounds PROVE no row satisfies the AND of
    all predicates. ``preds_by_id`` maps column id -> [(op, value)].
    Missing stats for a column => that predicate cannot prune.
    ``tz``: session timezone for naive datetime predicates (see _norm).
    """
    stats = file_entry.get("stats")
    if not stats:
        return True
    rows = stats.get("rows")
    cols = stats.get("cols", {})
    for col_id, preds in preds_by_id.items():
        s = cols.get(str(col_id))
        if s is None:
            continue
        has_bounds = "min" in s
        if not has_bounds:
            # no non-null values in the file: any comparison / equality
            # predicate (SQL semantics: NULL never matches) excludes it
            if rows is not None and s.get("nulls") == rows:
                return False
            continue
        kind, lo, hi = s["t"], s["min"], s["max"]
        for op, value in preds:
            if op == "in":
                vals = [_norm(v, kind, tz) for v in value]
                if all(v is not None and (v < lo or v > hi) for v in vals) and vals:
                    return False
                continue
            v = _norm(value, kind, tz)
            if v is None:
                continue
            if (
                (op == "=" and (v < lo or v > hi))
                or (op == "<" and lo >= v)
                or (op == "<=" and lo > v)
                or (op == ">" and hi <= v)
                or (op == ">=" and hi < v)
            ):
                return False
    return True


def file_must_match(
    file_entry: dict,
    preds_by_id: dict[int, list[tuple]],
    tz: _dt.tzinfo | None = None,
) -> bool:
    """True only when this file's bounds PROVE that EVERY row satisfies
    the AND of all predicates — the inverse of ``file_may_match``, and
    the basis of predicate-aware metadata aggregation: a must-match
    file contributes its (live) row count without being opened.

    Conservative in the opposite direction: missing stats, missing
    bounds, any nulls in a predicate column (NULL never satisfies a
    comparison), or an un-normalizable literal all return False — the
    caller then scans the file, which is always exact.
    """
    stats = file_entry.get("stats")
    if not stats:
        return False
    cols = stats.get("cols", {})
    for col_id, preds in preds_by_id.items():
        s = cols.get(str(col_id))
        if s is None or "min" not in s or s.get("nulls", 0) != 0:
            return False
        kind, lo, hi = s["t"], s["min"], s["max"]
        for op, value in preds:
            if op == "in":
                vals = [_norm(v, kind, tz) for v in value]
                # provable only when the file is constant on this column
                # and that constant is in the list
                if not (lo == hi and any(v == lo for v in vals)):
                    return False
                continue
            v = _norm(value, kind, tz)
            if v is None:
                return False
            if not (
                (op == "=" and lo == hi == v)
                or (op == "<" and hi < v)
                or (op == "<=" and hi <= v)
                or (op == ">" and lo > v)
                or (op == ">=" and lo >= v)
            ):
                return False
    return True


# ---------------------------------------------------------------- key blooms
#
# Per-file bloom filters over the MERGE KEY — the Iceberg-puffin analog.
# Bucket pruning narrows a point lookup to ~1/B of files and min/max
# bounds rarely help on high-cardinality hashed keys; a per-file bloom
# answers "does this file possibly contain key X" from a few KB of
# sidecar, so the lookup opens only the file(s) that can match. The
# filter bytes live in a SIDECAR next to the data file (manifest entries
# carry only {m, k, path}) so the manifest stays O(files), not O(rows).
# No false negatives: a "definitely absent" verdict is always safe; a
# false positive merely scans one extra file.

_BLOOM_K = 7


def _bloom_bytes_of(value) -> bytes | None:
    """Normalize a key value for bloom hashing (must match between the
    write side, which sees storage values, and the read side, which
    sees predicate literals)."""
    if value is None:
        return None
    if isinstance(value, bool):  # no sane key is boolean; exclude
        return None
    if isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, int):
        return str(value).encode("ascii")
    if isinstance(value, bytes):
        return value
    return None  # float/timestamp keys: not supported for blooms


def _bloom_positions(data: bytes, m_bits: int):
    import hashlib

    d = hashlib.md5(data).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    for i in range(_BLOOM_K):
        yield (h1 + i * h2) % m_bits


def build_key_bloom(abs_path: str, key_name: str) -> tuple[bytes, int] | None:
    """Read one parquet file's key column and build its bloom bits.
    Returns (filter_bytes, m_bits), or None when the column is missing
    or holds unsupported values. Sized ~10 bits/row (≈1% fpp at k=7)."""
    import pyarrow.parquet as pq

    try:
        tbl = pq.read_table(abs_path, columns=[key_name])
    except Exception:  # noqa: BLE001 — blooms are an optimization
        return None
    vals = tbl.column(0).to_pylist()
    m_bits = max(1024, ((len(vals) * 10 + 7) // 8) * 8)
    bits = bytearray(m_bits // 8)
    for v in vals:
        b = _bloom_bytes_of(v)
        if b is None:
            if v is not None:
                return None  # unsupported key type — no bloom for this file
            continue
        for pos in _bloom_positions(b, m_bits):
            bits[pos >> 3] |= 1 << (pos & 7)
    return bytes(bits), m_bits


def bloom_may_contain(bits: bytes, m_bits: int, value) -> bool:
    """True unless the filter PROVES the key is absent (conservative:
    un-normalizable values never prune)."""
    b = _bloom_bytes_of(value)
    if b is None:
        return True
    return all(bits[p >> 3] & (1 << (p & 7)) for p in _bloom_positions(b, m_bits))
