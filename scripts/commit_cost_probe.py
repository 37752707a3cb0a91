"""Commit-cost probe: show commit metadata cost is O(retained), not O(history).

Commits N tiny batches into two tables — one with periodic
expire_snapshots, one without — and records manifest bytes + per-commit
wall over time. The round-2 liability was the no-expiry curve: manifest
(ledger + file list) grows linearly with history, so does the JSON
serialize/rewrite on every commit. With expiry the curve is flat.

Usage: python scripts/commit_cost_probe.py [n_batches] [expire_every]
Writes one JSON line; redirect to BENCH/commit_cost_rN.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from dbp_etl_spark.lake import LakeTable, TableSchema  # noqa: E402
from dbp_etl_spark.session import get_spark  # noqa: E402

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def mk_rows(spark, n, tag):
    return spark.range(n).select(
        F.concat(F.lit("https://h.example/"), F.lit(tag), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("warc_ts"),
        F.encode(F.concat(F.lit(tag), F.col("id")), "utf-8").alias("html"),
        F.lit(tag).alias("text"),
        F.lit("en").alias("lang"),
    )


def run_side(spark, root, n_batches, expire_every, keep_last=8):
    """MERGE-shaped commit loop: every batch overwrites all buckets (the
    upsert hot path), so prior snapshots' files become dead — exactly
    what expiry is supposed to collect. Append-only tables grow their
    live file list by design (that's compaction's axis, not expiry's)."""
    t = LakeTable.create(spark, root, TableSchema.from_struct(PAGES), key="url", num_buckets=4)
    rows = mk_rows(spark, 16, "x").persist()
    rows.count()
    all_buckets = list(range(t.num_buckets))
    samples = []
    for i in range(n_batches):
        t0 = time.time()
        t = t.overwrite_buckets(rows, all_buckets, batch_id=i)
        commit_wall = time.time() - t0
        if expire_every and (i + 1) % expire_every == 0:
            t.expire_snapshots(keep_last=keep_last)
            t = t.refresh()
        if (i + 1) % max(n_batches // 10, 1) == 0:
            samples.append(
                {
                    "batch": i + 1,
                    "manifest_bytes": len(json.dumps(t.manifest)),
                    "ledger_entries": len(t.manifest["committed_batches"]),
                    "commit_wall_sec": round(commit_wall, 3),
                }
            )
    rows.unpersist()
    return samples, t.state_hash()


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    expire_every = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    import tempfile

    base = tempfile.mkdtemp(prefix="commit_cost_", dir="/dev/shm")
    spark = get_spark(app_name="commit-cost-probe", cores=4, shuffle_partitions=4)
    no_exp, h1 = run_side(spark, f"{base}/plain", n_batches, expire_every=0)
    with_exp, h2 = run_side(spark, f"{base}/expired", n_batches, expire_every=expire_every)
    out = {
        "metric": "commit_cost_vs_history",
        "n_batches": n_batches,
        "expire_every": expire_every,
        "state_hash_equal": h1 == h2,
        "no_expiry": no_exp,
        "with_expiry": with_exp,
        "no_expiry_final_manifest_bytes": no_exp[-1]["manifest_bytes"],
        "with_expiry_final_manifest_bytes": with_exp[-1]["manifest_bytes"],
        "manifest_growth_ratio_no_expiry": round(
            no_exp[-1]["manifest_bytes"] / no_exp[0]["manifest_bytes"], 2
        ),
        "manifest_growth_ratio_with_expiry": round(
            with_exp[-1]["manifest_bytes"] / with_exp[0]["manifest_bytes"], 2
        ),
    }
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
