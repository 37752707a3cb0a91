"""Operate a lake table from the command line (spark-submit friendly).

The maintenance / recovery / ref surface of LakeTable as subcommands,
so an operator can run them the same way the CDC job runs
(``spark-submit --py-files dbp_etl_spark.zip scripts/table_admin.py …``):

    table_admin.py --table /lake/pages history
    table_admin.py --table /lake/pages expire --keep-last 8
    table_admin.py --table /lake/pages vacuum-orphans --grace-sec 86400
    table_admin.py --table /lake/pages compact --sort-by warc_ts
    table_admin.py --table /lake/pages rebucket --num-buckets 1024
    table_admin.py --table /lake/pages rollback --to 41
    table_admin.py --table /lake/pages tag --name audit-2026-08 [--snapshot 41]
    table_admin.py --table /lake/pages untag --name audit-2026-08
    table_admin.py --table /lake/pages tags
    table_admin.py --table /lake/pages wap-list
    table_admin.py --table /lake/pages wap-publish --wap-id audit-b17
    table_admin.py --table /lake/pages wap-abandon --wap-id audit-b17
    table_admin.py --table /lake/pages constraints
    table_admin.py --table /lake/pages constraint-add --name nonneg --expr "val >= 0"
    table_admin.py --table /lake/pages constraint-drop --name nonneg
    table_admin.py --table /lake/pages replicate --target /lake/pages_en \\
        --name en --where "lang = 'en'" [--per-snapshot]
    table_admin.py --table /lake/pages check        # integrity report
    table_admin.py --table /lake/pages changes --from-snapshot 41 \\
        [--to-snapshot 45] [--include-pre] [--mode auto|log|join]

Every mutating subcommand is ledger-keyed (``--batch-id`` overrides
the default), so re-running after a crash or a lost shell is a no-op.
Reference analog: the operational re-runs the reference does through
its controller entry points (/root/reference/load/DBPLoadController.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--table", required=True, help="lake table root")
    p.add_argument("--batch-id", help="override the ledger id of a mutating op")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("history")
    sub.add_parser("tags")
    sub.add_parser("check")

    s = sub.add_parser("clone")
    s.add_argument("--dest", required=True, help="destination root for the deep clone")
    s.add_argument("--snapshot", type=int, default=None, help="source snapshot (default head)")

    s = sub.add_parser("changes")
    s.add_argument("--from-snapshot", type=int, required=True, help="exclusive")
    s.add_argument("--to-snapshot", type=int, default=None, help="inclusive; default head")
    s.add_argument("--include-pre", action="store_true")
    s.add_argument(
        "--mode",
        choices=("auto", "log", "join"),
        default="auto",
        help="auto = changelog fast path when covered; log = require it; join = force the state join",
    )
    s.add_argument("--limit", type=int, default=20, help="rows printed (count is always full)")

    s = sub.add_parser("expire")
    s.add_argument("--keep-last", type=int, default=8)
    s.add_argument("--older-than-sec", type=float, default=None,
                   help="age-based retention: keep snapshots younger than this; --keep-last becomes the floor")

    s = sub.add_parser("vacuum-orphans")
    s.add_argument("--grace-sec", type=float, default=86400.0)

    s = sub.add_parser("vacuum-tombstones")
    s.add_argument("--older-than", required=True, help="ISO timestamp watermark")

    s = sub.add_parser("compact")
    s.add_argument("--sort-by", nargs="*", default=None)

    s = sub.add_parser("rebucket")
    s.add_argument("--num-buckets", type=int, required=True)

    # one step of the online B -> k*B migration; run once per
    # maintenance window until the reported status flips to done
    s = sub.add_parser("migrate")
    s.add_argument("--num-buckets", type=int, required=True)
    s.add_argument("--max-buckets", type=int, default=None, help="buckets per step")

    s = sub.add_parser("rollback")
    s.add_argument("--to", type=int, required=True, help="target snapshot id")

    s = sub.add_parser("tag")
    s.add_argument("--name", required=True)
    s.add_argument("--snapshot", type=int, default=None)

    s = sub.add_parser("untag")
    s.add_argument("--name", required=True)

    sub.add_parser("wap-list")

    s = sub.add_parser("wap-publish")
    s.add_argument("--wap-id", required=True)

    s = sub.add_parser("wap-abandon")
    s.add_argument("--wap-id", required=True)

    sub.add_parser("constraints")

    s = sub.add_parser("constraint-add")
    s.add_argument("--name", required=True)
    s.add_argument("--expr", required=True, help="boolean SQL over table columns")

    s = sub.add_parser("constraint-drop")
    s.add_argument("--name", required=True)

    # advance a downstream replica from this (source) table's change
    # feed; run per maintenance window or behind a scheduler
    s = sub.add_parser("replicate")
    s.add_argument("--target", required=True, help="replica table root")
    s.add_argument("--name", default="default", help="replication-stream id")
    s.add_argument("--where", default=None, help="row filter over source columns")
    s.add_argument(
        "--per-snapshot",
        action="store_true",
        help="one commit per source snapshot (prunable contiguous cursor)",
    )

    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"table-admin-{args.cmd}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from dbp_etl_spark.lake import LakeTable

    t = LakeTable.load(spark, args.table)
    bid = args.batch_id
    out: object

    if args.cmd == "history":
        out = t.history()
    elif args.cmd == "tags":
        out = t.tags
    elif args.cmd == "check":
        from dbp_etl_spark.lake.integrity import state_checks

        report = {r["check"]: r["n_violations"] for r in state_checks(t).collect()}
        print(json.dumps({"table": args.table, "cmd": args.cmd, "result": report}))
        spark.stop()
        return 0 if all(n == 0 for n in report.values()) else 2
    elif args.cmd == "changes":
        use_cl = {"auto": None, "log": True, "join": False}[args.mode]
        feed = t.read_changes(
            args.from_snapshot,
            args.to_snapshot,
            include_pre=args.include_pre,
            use_changelog=use_cl,
        )
        rows = [r.asDict(recursive=True) for r in feed.limit(args.limit).collect()]
        for r in rows:
            for k, v in r.items():
                if isinstance(v, (bytes, bytearray)):
                    r[k] = f"<{len(v)} bytes>"
                elif hasattr(v, "isoformat"):
                    r[k] = v.isoformat()
        out = {"rows": rows, "total": feed.count()}
    elif args.cmd == "expire":
        out = t.expire_snapshots(keep_last=args.keep_last, older_than_sec=args.older_than_sec)
    elif args.cmd == "vacuum-orphans":
        out = t.remove_orphan_files(grace_sec=args.grace_sec)
    elif args.cmd == "vacuum-tombstones":
        from datetime import datetime

        # parse driver-side: a malformed watermark must FAIL, not pass
        # NULL into the filter and silently vacuum nothing
        watermark = datetime.fromisoformat(args.older_than)
        t = t.vacuum_tombstones(
            watermark, bid or f"vacuum-{args.older_than}-from-{t.snapshot_id}"
        )
        out = {"snapshot_id": t.snapshot_id}
    elif args.cmd == "compact":
        # default ids are head-scoped: a constant id would make every
        # later default-id run a silent ledger no-op
        t = t.compact(bid or f"compact-from-{t.snapshot_id}", sort_by=args.sort_by or None)
        out = {"snapshot_id": t.snapshot_id}
    elif args.cmd == "rebucket":
        t = t.rebucket(
            args.num_buckets,
            batch_id=bid or f"rebucket-{args.num_buckets}-from-{t.snapshot_id}",
        )
        out = {"snapshot_id": t.snapshot_id, "num_buckets": t.num_buckets}
    elif args.cmd == "migrate":
        t = t.migrate_to_buckets(
            args.num_buckets,
            batch_id=bid or f"migrate-{args.num_buckets}-from-{t.snapshot_id}",
            max_buckets=args.max_buckets,
        )
        out = {
            "snapshot_id": t.snapshot_id,
            "num_buckets": t.num_buckets,
            "status": t.migration_status() or "done",
        }
    elif args.cmd == "rollback":
        t = t.rollback_to(args.to, batch_id=bid)
        out = {"snapshot_id": t.snapshot_id, "rolled_back_to": args.to}
    elif args.cmd == "tag":
        t = t.tag_snapshot(args.name, snapshot_id=args.snapshot, batch_id=bid)
        out = {"tags": t.tags}
    elif args.cmd == "untag":
        t = t.untag_snapshot(args.name, batch_id=bid)
        out = {"tags": t.tags}
    elif args.cmd == "wap-list":
        out = {"staged": t.wap_ids()}
    elif args.cmd == "wap-publish":
        t = t.publish_wap(args.wap_id, batch_id=bid)
        out = {"snapshot_id": t.snapshot_id, "published": args.wap_id}
    elif args.cmd == "wap-abandon":
        t.abandon_wap(args.wap_id)
        out = {"staged": t.wap_ids()}
    elif args.cmd == "constraints":
        out = {"constraints": t.constraints}
    elif args.cmd == "constraint-add":
        t = t.add_constraint(args.name, args.expr, batch_id=bid)
        out = {"snapshot_id": t.snapshot_id, "constraints": t.constraints}
    elif args.cmd == "constraint-drop":
        t = t.drop_constraint(args.name, batch_id=bid)
        out = {"snapshot_id": t.snapshot_id, "constraints": t.constraints}
    elif args.cmd == "clone":
        c = t.clone_to(args.dest, snapshot_id=args.snapshot)
        out = {
            "dest": c.root,
            "source_snapshot": c.manifest["summary"]["source_snapshot"],
            "files": len(c.manifest["files"]),
            "rows": c.read().count(),
        }
    elif args.cmd == "replicate":
        from dbp_etl_spark.cdc import TableReplicator

        tgt = LakeTable.load(spark, args.target)
        rep = TableReplicator(t, tgt, name=args.name, where=args.where)
        results = rep.sync_each_snapshot() if args.per_snapshot else [rep.sync()]
        out = {
            "cursor": rep.cursor(),
            "source_head": rep.source.snapshot_id,
            "syncs": [
                {
                    "from": r.from_snapshot,
                    "to": r.to_snapshot,
                    "mode": r.mode,
                    "skipped": r.skipped,
                    "counts": r.counts,
                }
                for r in results
            ],
        }
    else:  # pragma: no cover
        raise SystemExit(f"unknown cmd {args.cmd}")

    print(json.dumps({"table": args.table, "cmd": args.cmd, "result": out}, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
