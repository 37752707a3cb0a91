"""Measurement-only data generator (optimization round 6).

The driver's round-5 MEASUREMENT escalated the bench to a
driver-generated ``sf1.0`` directory that does not exist in this
sandbox anymore.  This script synthesizes a *statistically matched*
stand-in so optimization work can be timed at the same scale: row
counts extrapolate the sf0.01 -> sf0.1 ratios, schemas and value
distributions are matched to /root/testdata/sf0.1 (inspected with
DuckDB), and every table is a single parquet file with one row group,
like the driver's fixtures.

This data is NEVER used for correctness (the DuckDB oracle runs on the
driver's own sf0.01) and is written outside /root/testdata (read-only
per TESTDATA.md).  Usage:

    python scripts/make_sf_scaled.py /root/sfbig/sf1.0 10

where the second argument is the multiplier relative to sf0.1.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small "
    "batch part line order sort scan fast query agg slow filter customer "
    "string text hash join group key row index cache"
).split()
assert len(VOCAB) == 31

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "small", "cold", "dim", "light", "dark", "plain"]
PNOUN = ["ring", "bolt", "washer", "nut", "gear", "cam", "rod", "pin"]
ETYPES = ["click", "view", "purchase", "signup", "error"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    # pyarrow default row-group size (1Mi rows): matches the observed
    # driver fixtures (sf0.1 tables are single-row-group at <=1M rows),
    # so multi-million-row tables get a few row groups, like a plain
    # pq.write_table would produce
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}", flush=True)


def main() -> None:
    out_dir = sys.argv[1]
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    n_ord = int(150_000 * mult)
    n_li = int(600_000 * mult)
    n_ev = int(100_000 * mult)
    n_users = int(1_500 * mult)
    n_doc = int(5_000 * mult)
    # embeddings grew 4x per 10x sf in the driver's fixtures (500 -> 2000)
    n_emb = int(2_000 * (4.0 ** (np.log10(mult) if mult > 0 else 0)))

    # region / nation: fixed-size dims, copy the driver's shapes
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))

    _write(out_dir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}" for i in range(n_part)
        ],
        "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part) % 1000, 2),
    }))

    day = 86_400.0
    o_dates = (
        np.datetime64("1995-01-01")
        + (rng.uniform(0, 7 * 365, n_ord) * day).astype("timedelta64[s]")
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 450_000, n_ord), 2),
        "o_orderdate": pa.array(o_dates.astype("datetime64[us]")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    l_dates = (
        np.datetime64("1995-01-01")
        + (rng.uniform(0, 7 * 365, n_li) * day).astype("timedelta64[s]")
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(l_dates.astype("datetime64[us]")),
    }))

    # events: 30 days of Jan 2024, event_id follows ts order
    ts = np.sort(rng.uniform(0, 30 * day, n_ev))
    ev_ts = (np.datetime64("2024-01-01") + (ts * 1e6).astype("timedelta64[us]"))
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(ev_ts),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(ETYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 561, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10..100 words from the 31-word vocab
    lens = rng.integers(10, 101, n_doc)
    toks = rng.integers(0, 31, int(lens.sum()))
    texts = []
    pos = 0
    varr = np.array(VOCAB)
    for ln in lens:
        texts.append(" ".join(varr[toks[pos : pos + ln]]))
        pos += ln
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * n_doc,
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 64-dim unit vectors clustered around 10 label centers
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32))),
        "label": labels.astype(np.int32),
    }))

    print(json.dumps({"out": out_dir, "mult": mult}))


if __name__ == "__main__":
    main()
