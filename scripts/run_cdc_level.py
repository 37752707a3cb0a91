"""Run ONE level of the scaling measurement in an isolated process.

Launched by scripts/interleave_scaling.py --pin under
``taskset -c 0..N-1``, so the WHOLE level — JVM task threads, GC,
netty, Python/Arrow workers — shares exactly N CPUs. That is the
faithful sandbox analog of "N single-core executors": an unpinned
local[1] driver actually burns ~2 CPUs (1 JVM task thread + 1 python
worker overlapping), which inflates the lo baseline and deflates the
measured N->4N efficiency to ~0.67-0.70 even in healthy quota windows
(BENCH/scaling_r5_1_4_12M.json / _30M). A fresh subprocess per level
also gives each level its own JVM, so the pin applies from birth to
every thread.

Usage: run_cdc_level.py <cores> <n_events> [--warmup N] [--json-tag T]
Prints one JSON line: {"cores", "events_per_sec", "state_hash", ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from dbp_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cores = int(args[0])
    n_events = int(args[1])
    warmup = int(args[2]) if len(args) > 2 else max(n_events // 8, 100_000)
    # 4 task waves per core: shuffle_partitions == cores gives each
    # reduce stage exactly one wave, so ANY straggler leaves the other
    # cores idle for its whole tail — measured 278k -> 436k ev/s at 4
    # cores just from 4 -> 16 partitions (12M events). Finer tasks
    # pack the tail; AQE coalesces them back when they are tiny. Same
    # RULE at every level (partitions proportional to cores), as a real
    # cluster would configure it.
    shuffle = int(args[3]) if len(args) > 3 else 4 * cores
    tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
    extra = {"spark.ui.showConsoleProgress": "false"}
    if tmpfs:
        extra["spark.local.dir"] = f"{tmpfs}/spark-local"
    spark = get_spark(
        app_name=f"cdc-level-{cores}",
        cores=cores,
        shuffle_partitions=shuffle,
        extra_conf=extra,
    )
    if warmup:
        bench.run_cdc_pipeline(spark, warmup, work_dir=tmpfs)
    res = bench.run_cdc_pipeline(spark, n_events, work_dir=tmpfs)
    spark.stop()
    res["cores"] = cores
    res["affinity_cpus"] = len(os.sched_getaffinity(0))
    print("LEVEL_RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
