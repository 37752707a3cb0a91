"""Interleaved N-vs-4N scaling measurement (the in-quota protocol).

The sandbox's CPU quota drifts in episodes, so running all low-core
rounds then all high-core rounds confounds scaling with weather. This
interleaves them — round k runs the SAME deterministic CDC job at
``lo`` cores then at ``hi`` cores back-to-back — and reports best-of
per level plus per-round pairs, so a throttling episode hits both
levels of a pair equally. State hashes must match across every run.

Host-ceiling context (BENCH/BASELINE.md): this box tops out ~220k ev/s
regardless of cores; every observed ratio fits
``min(1, ceiling / (4 x lo_throughput))`` — verified round 2 with a
JVM-only control that hits the same ceiling. The 1v4 pair is the
configuration that stays under the quota.

Usage: python scripts/interleave_scaling.py [n_events] [rounds] [lo] [hi]
Prints per-round lines then a JSON summary; tee into BENCH/.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py)
from dbp_etl_spark.session import get_spark  # noqa: E402


def _jvm_only_transform(df):
    """Ceiling-model control: replace the Arrow extraction UDF with pure
    JVM expressions. If the measured scaling ratio matches the Arrow
    pipeline's at the same levels, the ceiling is the HOST quota, not
    python-worker oversubscription (the round-2 finding)."""
    from pyspark.sql import functions as F

    raw = F.trim(F.regexp_replace(F.decode(F.col("html"), "utf-8"), "<[^>]*>", " "))
    return df.withColumn(
        "text", F.when(F.col("_payload_changed"), raw).otherwise(F.col("_old_text"))
    ).withColumn(
        "lang", F.when(F.col("_payload_changed"), F.lit("en")).otherwise(F.col("_old_lang"))
    )


def main():
    args = [a for a in sys.argv[1:] if a != "--jvm-only"]
    jvm_only = "--jvm-only" in sys.argv
    n_events = int(args[0]) if len(args) > 0 else 3_000_000
    rounds = int(args[1]) if len(args) > 1 else 2
    lo = int(args[2]) if len(args) > 2 else 1
    hi = int(args[3]) if len(args) > 3 else 4
    tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
    extra = {"spark.ui.showConsoleProgress": "false"}
    if tmpfs:
        extra["spark.local.dir"] = f"{tmpfs}/spark-local"
    bench._sweep_stale_tmpfs()

    per_level: dict[int, list[dict]] = {lo: [], hi: []}
    pair_effs = []
    probes: list[dict] = []
    for r in range(rounds):
        row = {}
        for cores in (lo, hi):
            spark = get_spark(
                app_name=f"interleave-{cores}",
                cores=cores,
                shuffle_partitions=max(cores, 2),
                extra_conf=extra,
            )
            tf = _jvm_only_transform if jvm_only else None
            if r == 0:
                bench.run_cdc_pipeline(
                    spark, max(n_events // 8, 100_000), work_dir=tmpfs, transform=tf
                )  # warmup per level, once
            p0 = bench.host_probe()
            res = bench.run_cdc_pipeline(spark, n_events, work_dir=tmpfs, transform=tf)
            p1 = bench.host_probe()
            spark.stop()
            res["probe_before"], res["probe_after"] = p0, p1
            probes.append(
                {"round": r, "cores": cores, "before": p0, "after": p1}
            )
            per_level[cores].append(res)
            row[cores] = res["events_per_sec"]
            print(
                f"round {r} cores {cores}: {res['events_per_sec']} ev/s "
                f"(probe {p0}/{p1} s)",
                flush=True,
            )
        pair_effs.append(round((row[hi] / row[lo]) / (hi / lo), 3))

    best = {c: max(rs, key=lambda x: x["events_per_sec"]) for c, rs in per_level.items()}
    hashes = {r["state_hash"] for rs in per_level.values() for r in rs}
    eff = round((best[hi]["events_per_sec"] / best[lo]["events_per_sec"]) / (hi / lo), 3)
    print(
        f"best {lo}-core: {best[lo]['events_per_sec']} "
        f"best {hi}-core: {best[hi]['events_per_sec']} eff: {eff}"
    )
    print(
        json.dumps(
            {
                "metric": "cdc_scaling_efficiency_interleaved",
                "transform": "jvm_only" if jvm_only else "arrow_udf",
                "value": eff,
                "unit": "ratio",
                "levels": {
                    str(c): {
                        "best_events_per_sec": best[c]["events_per_sec"],
                        "all_runs": [r["events_per_sec"] for r in per_level[c]],
                        "probes": [
                            [r.get("probe_before"), r.get("probe_after")]
                            for r in per_level[c]
                        ],
                    }
                    for c in (lo, hi)
                },
                "per_round_eff": pair_effs,
                "probes": probes,
                "state_identical": len(hashes) == 1,
                "events": n_events,
                "rounds": rounds,
            }
        )
    )


if __name__ == "__main__":
    main()
