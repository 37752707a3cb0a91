"""Incrementally-maintained IVF vector index as a lake table.

Composes three engine primitives into the ANN capability a churning
100 TB corpus actually needs — an index that FOLLOWS the data instead
of being rebuilt:

* ``kmeans_centroids``/``assign_cells`` (operators/similarity.py):
  deterministic coarse quantizer; assignment is a zero-shuffle
  map-side projection with the k centroids inlined as literals.
* ``TableReplicator`` (cdc/replicate.py): the index table is a
  transformed replica of the corpus table, maintained exactly-once
  from its change feed — updates re-assign cells, deletes drop
  postings, all at O(churn) per sync.
* manifest file statistics (lake/stats.py): the index keeps per-file
  ``cell`` bounds; ``optimize()`` clusters each bucket's rows by cell
  (``compact(sort_by=["cell"])``) so a probe that visits ``nprobe``
  cells opens only the files whose bounds intersect them — IVF's
  inverted-list skip expressed as ordinary lake file skipping.

The reference has no ANN surface; this is the engine-native extension
for the embedding-dedup / retrieval workloads the documents+embeddings
test tables model (SURVEY.md §6 training-data ops).

Freshness/probe-cost trade: between ``optimize()`` calls, files
written by recent syncs straddle cells and are always scanned;
``optimize`` re-tightens the bounds. That is the same bounded-
staleness contract as merge-on-read compaction, and the same knob
(run it on the maintenance cadence).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbp_etl_spark.cdc.replicate import SyncResult, TableReplicator
from dbp_etl_spark.lake.schema import TableSchema
from dbp_etl_spark.lake.table import LakeTable
from dbp_etl_spark.operators.similarity import assign_cells, cosine, kmeans_centroids

_CENTROIDS_REL = os.path.join("_meta", "vector_index.json")


class VectorIndex:
    """Handle over (corpus table, index table, frozen centroids).

    The quantizer is trained ONCE at ``build`` and persisted beside the
    index table's metadata; retraining is a rebuild (same as faiss —
    a moved centroid would strand already-assigned rows). The index
    table carries (key, warc_ts, cell, vector) and is safe to rebuild
    from the corpus at any time.
    """

    def __init__(self, source: LakeTable, index: LakeTable, vec_col: str = "embedding"):
        self.source = source
        self.index = index
        self.vec_col = vec_col
        raw = index._fs.read_text(os.path.join(index.root, _CENTROIDS_REL))
        meta = json.loads(raw)
        self.centroids: list[list[float]] = meta["centroids"]
        self.vec_col = meta.get("vec_col", vec_col)
        self._replicator = TableReplicator(
            source, index, name=meta.get("name", "vecidx"), transform=self._transform
        )

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        source: LakeTable,
        root: str,
        k: int = 8,
        iterations: int = 2,
        vec_col: str = "embedding",
        num_buckets: int | None = None,
        name: str = "vecidx",
    ) -> "VectorIndex":
        """Train the quantizer on the corpus's CURRENT vectors, create
        the index table (cell bounds tracked from the first write), and
        run the initial sync. At 100 TB, train on a sample — the
        assignment plan is the same either way."""
        from pyspark.sql import types as T

        corpus = source.read().select(source.key, "warc_ts", vec_col)
        if corpus.limit(1).count() == 0:
            raise ValueError("cannot build a vector index over an empty corpus")
        cents = kmeans_centroids(
            corpus, dim=0, k=k, iterations=iterations, id_col=source.key, vec_col=vec_col
        )
        centroids = [
            list(r["centroid"]) for r in cents.orderBy("centroid_id").collect()
        ]
        if not centroids:
            raise ValueError("cannot build a vector index over an empty corpus")
        key_type = source.schema.to_struct()[source.key].dataType
        vec_type = source.schema.to_struct()[vec_col].dataType
        schema = TableSchema.from_struct(
            T.StructType(
                [
                    T.StructField(source.key, key_type),
                    T.StructField("warc_ts", T.TimestampType()),
                    T.StructField("cell", T.IntegerType()),
                    T.StructField(vec_col, vec_type),
                ]
            )
        )
        index = LakeTable.create(
            source.spark,
            root,
            schema,
            key=source.key,
            num_buckets=num_buckets or source.num_buckets,
            stats_columns=["cell"],
        )
        index._fs.write_text(
            os.path.join(root, _CENTROIDS_REL),
            json.dumps({"centroids": centroids, "vec_col": vec_col, "name": name}),
        )
        idx = cls(source, index, vec_col=vec_col)
        idx.sync()
        return idx

    @classmethod
    def open(cls, source: LakeTable, index: LakeTable) -> "VectorIndex":
        return cls(source, index)

    # -------------------------------------------------------- maintenance

    def _transform(self, ups: DataFrame) -> DataFrame:
        return assign_cells(ups, self.centroids, self.vec_col, out_col="cell")

    def sync(self) -> SyncResult:
        """Advance the index to the corpus head (exactly-once, O(churn);
        see TableReplicator.sync)."""
        res = self._replicator.sync()
        self.source = self._replicator.source
        self.index = self._replicator.target
        return res

    def optimize(self, files_per_bucket: int = 4, batch_id=None) -> "LakeTable":
        """Re-cluster every bucket's rows by cell so per-file cell
        bounds tighten and probe reads skip files (state unchanged)."""
        bid = batch_id if batch_id is not None else f"vecidx-optimize-{self.index.snapshot_id}"
        self.index = self.index.compact(
            bid, sort_by=["cell"], files_per_bucket=files_per_bucket
        )
        self._replicator.target = self.index
        return self.index

    # ------------------------------------------------------------- query

    def nearest_cells(self, probe: list[float], nprobe: int) -> list[int]:
        """The nprobe nearest centroid ids to a probe vector — k values
        of driver-side float math (k is small by construction)."""
        d2 = [
            (sum((float(x) - float(c)) ** 2 for x, c in zip(probe, cent)), i)
            for i, cent in enumerate(self.centroids)
        ]
        return [i for _, i in sorted(d2)[: max(1, nprobe)]]

    def topk(self, probe: list[float], k: int = 10, nprobe: int = 2) -> DataFrame:
        """Cosine top-k over the probed cells. The read carries
        ``cell IN (probes)``: file skipping via the manifest bounds
        (tight after ``optimize``), exact residual filter either way,
        then one JVM fold per candidate row — no UDFs, no crossJoin.
        ``nprobe=len(centroids)`` degrades gracefully to exact
        brute-force over the whole index."""
        cells = self.nearest_cells(probe, nprobe)
        cand = self.index.read(where=[("cell", "in", cells)])
        probe_lit = F.lit([float(x) for x in probe])
        return (
            cand.select(
                F.col(self.index.key),
                "cell",
                cosine(F.col(self.vec_col), probe_lit).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col(self.index.key))
            .limit(k)
        )

    def probe_plan_files(self, probe: list[float], nprobe: int = 2) -> int:
        """How many index files the probe read would open (metadata
        only) — the observable that optimize() shrinks."""
        cells = self.nearest_cells(probe, nprobe)
        return len(self.index.candidate_files(where=[("cell", "in", cells)]))
