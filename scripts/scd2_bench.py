"""SCD2 history-maintenance throughput vs the plain latest-state runner.

Same staged time-partitioned tail, same session, interleaved order.
Writes one JSON line (and BENCH/scd2_r4.json when --out is given).

Usage: python scripts/scd2_bench.py [n_events] [n_urls] [n_batches] [--out path]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dbp_etl_spark.cdc import CDCRunner  # noqa: E402
from dbp_etl_spark.cdc.generator import generate_changes  # noqa: E402
from dbp_etl_spark.cdc.scd import SCD2Runner, scd2_schema  # noqa: E402
from dbp_etl_spark.lake import LakeTable, TableSchema  # noqa: E402
from dbp_etl_spark.session import get_spark  # noqa: E402

from pyspark.sql import types as T  # noqa: E402

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    n_events = int(args[0]) if len(args) > 0 else 1_000_000
    n_urls = int(args[1]) if len(args) > 1 else 100_000
    n_batches = int(args[2]) if len(args) > 2 else 8

    spark = get_spark(app_name="scd2-bench", cores=16, shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="scd2_bench_")

    # time-aligned batches (the tail contract SCD2 assumes: batch
    # boundaries are event-time boundaries)
    ev = generate_changes(spark, n_events, n_urls, n_batches=n_batches, seed=42)
    ev = ev.withColumn(
        "batch_id",
        (
            (F.unix_seconds(F.col("warc_ts")) - F.lit(1700000000))
            * F.lit(n_batches)
            / F.lit(n_events)
        ).cast("long"),
    )
    staged = CDCRunner.stage_by_batch(ev, f"{root}/changes")

    def run_cdc() -> tuple[float, int]:
        t = LakeTable.create(
            spark,
            tempfile.mkdtemp(prefix="cdc_", dir=root) + "/t",
            TableSchema.from_struct(PAGES),
            key="url",
            num_buckets=32,
        )
        t0 = time.time()
        CDCRunner(t).run(staged)
        return time.time() - t0, t.read().count()

    def run_scd2() -> tuple[float, int]:
        t = LakeTable.create(
            spark,
            tempfile.mkdtemp(prefix="scd2_", dir=root) + "/t",
            scd2_schema({}),
            key="url",
            num_buckets=32,
        )
        t0 = time.time()
        SCD2Runner(t).run(staged)
        return time.time() - t0, t.read().count()

    # interleave to share any host-quota weather
    cdc_a, cur_rows = run_cdc()
    scd_a, hist_rows = run_scd2()
    cdc_b, _ = run_cdc()
    scd_b, _ = run_scd2()
    cdc_s, scd_s = min(cdc_a, cdc_b), min(scd_a, scd_b)
    res = {
        "n_events": n_events,
        "n_urls": n_urls,
        "n_batches": n_batches,
        "cdc_events_per_sec": round(n_events / cdc_s),
        "scd2_events_per_sec": round(n_events / scd_s),
        "scd2_over_cdc_wall": round(scd_s / cdc_s, 3),
        "current_rows": cur_rows,
        "history_rows": hist_rows,
        "raw": {
            "cdc_sec": [round(cdc_a, 2), round(cdc_b, 2)],
            "scd2_sec": [round(scd_a, 2), round(scd_b, 2)],
        },
    }
    print(json.dumps(res))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
