"""ES rollover alias / ILM hot-index management: one ALIAS covering an
ordered chain of physical sub-indexes. Writes land in the newest
("write index"); when the write index crosses ``max_docs`` the alias
ROLLS OVER — the next ingest opens a fresh sub-index (the old one is
sealed and, like ES's ILM warm phase, can be compacted independently).
Searches fan the alias out across every sub-index via the existing
multi-index path (per-index statistics, ES semantics).

This is the time-series / log-stream shape: rollover keeps every
physical index bounded (merge/compaction cost stays constant over the
stream's lifetime), and the alias chain IS the retention unit — drop the
oldest sub-index directory to age data out, no delete-by-query storm.
The reference's single ever-growing index is the anti-pattern this
replaces at 100 TB.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from unichem2index_spark.operators import query as Q
from unichem2index_spark.operators.ingest import build_index_from_webtext
from unichem2index_spark.operators.update import add_generation


class RolloverAlias:
    """Alias manifest: ``alias.json`` lists the sub-index dirs in order;
    the LAST entry is the write index. The manifest write is tmp+rename
    atomic like the SegmentStore's own commits."""

    def __init__(self, alias_dir: str):
        self.base = alias_dir

    @property
    def _mf(self) -> str:
        return os.path.join(self.base, "alias.json")

    def indexes(self) -> list[str]:
        if not os.path.exists(self._mf):
            return []
        with open(self._mf) as f:
            return json.load(f)["indexes"]

    def _commit(self, idxs: list[str]) -> None:
        os.makedirs(self.base, exist_ok=True)
        tmp = self._mf + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"indexes": idxs}, f)
        os.replace(tmp, self._mf)

    def ingest(
        self,
        spark: SparkSession,
        webtext: DataFrame,
        max_docs: int,
        n_shards: int = 4,
    ) -> str:
        """Write a batch into the alias: roll over first if the current
        write index is already at/over ``max_docs`` (ES checks
        conditions at rollover time, not mid-bulk — one batch may
        overshoot, exactly like ES), then build-or-append."""
        idxs = self.indexes()
        if idxs:
            h = Q.IndexHandle.open(spark, idxs[-1])
            if h.n_docs >= max_docs:
                idxs = idxs + [
                    os.path.join(self.base, f"ix-{len(idxs):06d}")
                ]
                self._commit(idxs)
        else:
            idxs = [os.path.join(self.base, "ix-000000")]
            self._commit(idxs)
        write_idx = idxs[-1]
        if os.path.exists(os.path.join(write_idx, "manifest.json")):
            add_generation(spark, write_idx, webtext, build_id="alias")
        else:
            build_index_from_webtext(
                spark, webtext, write_idx, n_shards=n_shards,
                build_id="alias",
            )
        return write_idx

    def search(
        self, spark: SparkSession, terms: list[str], k: int
    ) -> DataFrame:
        """Alias search = multi-index fan-out with per-index stats
        (index_id is the chain position, so results are attributable
        to their physical index — the _index field analog)."""
        handles = [
            (Q.IndexHandle.open(spark, d), 1.0) for d in self.indexes()
        ]
        return Q.bm25_topk_multi_index(spark, handles, terms, k)

    def total_docs(self, spark: SparkSession) -> int:
        return sum(
            Q.IndexHandle.open(spark, d).n_docs for d in self.indexes()
        )


def cat_indices(spark: SparkSession, index_dirs: list[str]) -> list[dict]:
    """ES `_cat/indices` analog: per physical index, doc count, committed
    generations, tombstone presence, shard count — the one-glance ops
    listing. Driver-side metadata only (manifest reads), no Spark jobs
    beyond an optional deletes count."""
    out = []
    for d in index_dirs:
        h = Q.IndexHandle.open(spark, d)
        dele = h.deletes(spark)
        out.append(
            {
                "index": os.path.basename(d.rstrip("/")),
                "docs": h.n_docs,
                "generations": list(h.generations or [0]),
                "n_shards": h.n_shards,
                "deleted_docs": int(dele.count()) if dele is not None else 0,
                "positions": bool(h.has_positions),
            }
        )
    return out
