"""Incrementally-maintained MinHash-LSH near-duplicate index.

The batch near-dup operators (operators/dedup_ops.py) re-shingle and
re-minhash the WHOLE corpus every run — fine for a one-shot dedup,
wrong for a churning 100 TB corpus where each crawl batch must be
checked against everything already ingested. This maintains the LSH
posting table as a 1->N fan-out replica of the corpus
(cdc/replicate.py key_expand mode), the same index-follows-the-data
shape as operators/vector_index.py:

* index row = one LSH band posting: (pk = "<doc>#<band>", doc, band,
  bh, warc_ts); ``pk`` is the replica key, so a doc's ``bands``
  postings are exactly the rows its key expands to — updates replace
  them, deletes tombstone them, all exactly-once from the change feed
  at O(churn) per sync. Signature computation (the dominant cost:
  shingling reads ~10x the text bytes) runs ONCE per changed doc,
  never again for the resident corpus.
* probing a new batch = compute the batch's band rows (map-side) and
  equi-join the index on (band, bh) — the standard LSH candidate join,
  linear, shuffled by band key; candidates then verify with exact
  shingle jaccard against the corpus rows they hit.

The reference dedups whole load batches against the database's current
state by exact key (/root/reference/load/FilenameReducer.py:73-120);
this is the content-equivalence generalization of that same
"new batch vs resident state" check.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbp_etl_spark.cdc.replicate import SyncResult, TableReplicator
from dbp_etl_spark.lake.schema import TableSchema
from dbp_etl_spark.lake.table import LakeTable
from dbp_etl_spark.operators.dedup_ops import _shingles, lsh_band_rows

_CONFIG_REL = os.path.join("_meta", "neardup_index.json")


class NearDupIndex:
    """Handle over (corpus table, LSH posting table, frozen config)."""

    def __init__(self, source: LakeTable, index: LakeTable):
        self.source = source
        self.index = index
        cfg = json.loads(index._fs.read_text(os.path.join(index.root, _CONFIG_REL)))
        self.num_hashes = int(cfg["num_hashes"])
        self.bands = int(cfg["bands"])
        self.shingle_n = int(cfg["shingle_n"])
        self.hash_fn = cfg["hash_fn"]
        self.text_col = cfg["text_col"]
        self._replicator = TableReplicator(
            source,
            index,
            name=cfg.get("name", "lshidx"),
            transform=self._transform,
            key_expand=self._key_expand,
        )

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        source: LakeTable,
        root: str,
        num_hashes: int = 16,
        bands: int = 4,
        shingle_n: int = 3,
        hash_fn: str = "xxhash64",
        text_col: str = "text",
        num_buckets: int | None = None,
        merge_on_read: bool = True,
        name: str = "lshidx",
    ) -> "NearDupIndex":
        """Create the posting table and run the initial sync (the
        bootstrap feed IS the corpus — one code path). Defaults to a
        merge-on-read index: per-sync churn lands as delta files."""
        from pyspark.sql import types as T

        if num_hashes % bands != 0:
            raise ValueError("num_hashes must be a multiple of bands")
        key_type = source.schema.to_struct()[source.key].dataType
        bh_type = T.StringType() if hash_fn == "md5_60" else T.LongType()
        schema = TableSchema.from_struct(
            T.StructType(
                [
                    T.StructField("pk", T.StringType()),
                    T.StructField("warc_ts", T.TimestampType()),
                    T.StructField("doc", key_type),
                    T.StructField("band", T.IntegerType()),
                    T.StructField("bh", bh_type),
                ]
            )
        )
        index = LakeTable.create(
            source.spark,
            root,
            schema,
            key="pk",
            num_buckets=num_buckets or source.num_buckets,
            merge_on_read=merge_on_read,
        )
        index._fs.write_text(
            os.path.join(root, _CONFIG_REL),
            json.dumps(
                {
                    "num_hashes": num_hashes,
                    "bands": bands,
                    "shingle_n": shingle_n,
                    "hash_fn": hash_fn,
                    "text_col": text_col,
                    "name": name,
                }
            ),
        )
        idx = cls(source, index)
        idx.sync()
        return idx

    @classmethod
    def open(cls, source: LakeTable, index: LakeTable) -> "NearDupIndex":
        return cls(source, index)

    # -------------------------------------------------------- maintenance

    def _pk(self, doc_col, band_col):
        return F.concat(doc_col.cast("string"), F.lit("#"), band_col.cast("string"))

    def _band_rows(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        return lsh_band_rows(
            df,
            id_col=id_col,
            content_col=text_col,
            num_hashes=self.num_hashes,
            bands=self.bands,
            shingle_n=self.shingle_n,
            hash_fn=self.hash_fn,
        )

    def _transform(self, ups: DataFrame) -> DataFrame:
        key = self.source.key
        banded = self._band_rows(ups, key, self.text_col)
        return (
            banded.join(ups.select(F.col(key), "warc_ts"), key)
            .select(
                self._pk(F.col(key), F.col("band")).alias("pk"),
                F.col("warc_ts"),
                F.col(key).alias("doc"),
                F.col("band"),
                F.col("bh"),
            )
        )

    def _key_expand(self, keys: DataFrame) -> DataFrame:
        key = self.source.key
        return keys.select(
            F.col(key), F.col("warc_ts"), F.explode(F.sequence(F.lit(0), F.lit(self.bands - 1))).alias("band")
        ).select(self._pk(F.col(key), F.col("band")).alias("pk"), "warc_ts")

    def sync(self) -> SyncResult:
        """Advance the index to the corpus head — exactly-once,
        O(churned docs x bands) rows per sync."""
        res = self._replicator.sync()
        self.source = self._replicator.source
        self.index = self._replicator.target
        return res

    def tail(self, checkpoint: str, available_now: bool = True, **source_options):
        """Maintain the index as a STREAM over the corpus change feed
        (streaming/cdf_replicate.py with this index's transform +
        key_expand). Shares the batch ``sync()`` ledger namespace, so
        the two modes are interchangeable mid-life. Returns the
        StreamingQuery; call ``refresh()`` afterwards."""
        from dbp_etl_spark.streaming.cdf_replicate import replicate_stream

        return replicate_stream(
            self.source.spark,
            self.source.root,
            self.index,
            checkpoint,
            name=self._replicator.name,
            transform=self._transform,
            key_expand=self._key_expand,
            available_now=available_now,
            **source_options,
        )

    def refresh(self) -> "NearDupIndex":
        """Re-load both table handles (after tail() or another writer)."""
        self.source = self.source.refresh()
        self.index = self.index.refresh()
        self._replicator.source = self.source
        self._replicator.target = self.index
        return self

    # ------------------------------------------------------------- query

    def candidates(self, batch: DataFrame, id_col: str = "probe_id",
                   text_col: str | None = None) -> DataFrame:
        """Candidate (probe, resident-doc) near-dup pairs: the batch's
        band rows equi-joined to the posting table on (band, bh),
        deduplicated. Resident docs whose key equals the probe id are
        kept — filter afterwards if the id spaces coincide."""
        banded = self._band_rows(batch, id_col, text_col or self.text_col)
        return (
            banded.join(self.index.read().select("band", "bh", "doc"), ["band", "bh"])
            .select(F.col(id_col), F.col("doc"))
            .distinct()
        )

    def near_dups_of(
        self,
        batch: DataFrame,
        id_col: str = "probe_id",
        text_col: str | None = None,
        threshold: float = 0.5,
    ) -> DataFrame:
        """Verified near-dups of a new batch against the RESIDENT
        corpus: candidates -> exact shingle-set jaccard (corpus text
        read back semi-join-pruned to candidate docs only). Returns
        (probe id, doc, jaccard >= threshold)."""
        tcol = text_col or self.text_col
        cand = self.candidates(batch, id_col, tcol)
        key = self.source.key
        probe_sets = batch.select(
            F.col(id_col), F.array_distinct(_shingles(tcol, self.shingle_n)).alias("set_a")
        )
        corpus_sets = (
            self.source.read()
            .join(cand.select(F.col("doc").alias(key)).distinct(), key)
            .select(F.col(key).alias("doc"),
                    F.array_distinct(_shingles(self.text_col, self.shingle_n)).alias("set_b"))
        )
        inter = F.size(F.array_intersect("set_a", "set_b"))
        union = F.size(F.array_union("set_a", "set_b"))
        return (
            cand.join(probe_sets, id_col)
            .join(corpus_sets, "doc")
            .select(
                F.col(id_col),
                F.col("doc"),
                F.round(inter / union, 4).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
