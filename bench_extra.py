"""Extra benchmarks for optimization work (guide §1.4): isolate
individual queries with the noop sink, capture .explain("formatted"),
and report per-query wall times. ``bench.py`` is frozen for the
driver's measurement; numbers from THIS file are the working evidence
cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py [query ...]          # time the named queries
    python bench_extra.py --plans [query ...]  # also write plans to plans/r06/
    env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
         BENCH_EXTRA_REPEATS (default 3), BENCH_EXTRA_SUFFIX (plan filename suffix)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout


def main() -> None:
    from dbp_etl_spark.queries import QUERIES
    from dbp_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_plans = "--plans" in sys.argv
    names = args or [
        "content_chunk_dedup",
        "containment_neardup",
        "winnow_fingerprint_profile",
        "pmi_collocations",
        "ann_ivf_topk",
        "ann_cosine_topk",
    ]

    tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": f"{tmpfs}/spark-local"} if tmpfs else {}
    spark = get_spark(
        app_name="bench-extra", cores=cpus, shuffle_partitions=2 * cpus, extra_conf=extra
    )
    # session warm-up, mirrors bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.range(10000).select(
        F.row_number().over(Window.partitionBy(F.col("id") % 7).orderBy("id"))
    ).count()

    os.makedirs("plans/r06", exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        if want_plans:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r06/{name}{suffix}.txt", "w") as fh:
                fh.write(buf.getvalue())
        walls = []
        for i in range(repeats):
            # honest repeats: drop any intra-query persist so run N+1
            # cannot reuse run N's materialization via CacheManager
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"walls": walls, "min": min(walls)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
