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


def quota_control(lo: int, hi: int, iters: int = 40_000_000) -> dict:
    """Same-window trivially-parallel CPU control: aggregate busy-loop
    ops/s at ``lo`` and ``hi`` process counts. A pure-CPU workload with
    zero shuffle/IO/coordination scales at 1.0 on unclamped hardware;
    any deficit here is the HOST's aggregate CPU quota, not the engine.
    Run back-to-back with the engine pair so both see the same quota
    episode — this is the "same-window control proving the quota" the
    r4 verdict asked for.

    Probes at THREE process counts: ``lo``, ``hi``, and ``2*hi`` — the
    last because a Spark level at N cores actually demands ~2N threads
    of CPU (N task threads + N Python/Arrow workers), so the quota that
    matters for the hi engine level is the one visible at 2*hi procs.
    Measured r5 window: 1/4 procs scale ~1.0 but 8 procs read ~5.5
    effective cores — the host clamp engages between 4 and 8 threads."""
    rates = {}
    for n in (lo, hi, 2 * hi):
        t0 = bench.time.time()
        bench.host_probe(nproc=n, iters=iters)
        wall = bench.time.time() - t0
        rates[n] = round(n * iters / wall / 1e6, 2)  # M ops/s aggregate
    eff = round((rates[hi] / rates[lo]) / (hi / lo), 3)
    return {
        "rates_mops": {str(k): v for k, v in rates.items()},
        "eff": eff,
        # aggregate CPU available to a 2*hi-thread workload, in units
        # of single-proc cores — the engine's hi level needs 2*hi
        "effective_cores_at_2hi": round(rates[2 * hi] / rates[lo], 2),
    }


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
    controls: list[dict] = []
    for r in range(rounds):
        ctl = quota_control(lo, hi)
        controls.append(ctl)
        print(f"round {r} quota-control: {ctl}", flush=True)
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

    ctl = quota_control(lo, hi)
    controls.append(ctl)
    print(f"final quota-control: {ctl}", flush=True)

    best = {c: max(rs, key=lambda x: x["events_per_sec"]) for c, rs in per_level.items()}
    hashes = {r["state_hash"] for rs in per_level.values() for r in rs}
    eff = round((best[hi]["events_per_sec"] / best[lo]["events_per_sec"]) / (hi / lo), 3)
    control_eff = max(c["eff"] for c in controls)
    print(
        f"best {lo}-core: {best[lo]['events_per_sec']} "
        f"best {hi}-core: {best[hi]['events_per_sec']} eff: {eff} "
        f"control_eff: {control_eff} eff_vs_control: "
        f"{round(eff / control_eff, 3) if control_eff else None}"
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
                "quota_controls": controls,
                "control_eff": control_eff,
                "eff_vs_control": (
                    round(eff / control_eff, 3) if control_eff else None
                ),
                "probes": probes,
                "state_identical": len(hashes) == 1,
                "events": n_events,
                "rounds": rounds,
            }
        )
    )


if __name__ == "__main__":
    main()
