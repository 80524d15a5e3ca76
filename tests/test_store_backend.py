"""Store backend selection: Iceberg runtime detection and the parquet
fallback (the Iceberg jar is absent in this sandbox, so the factory must
choose the parquet+manifest SegmentStore)."""

from __future__ import annotations

from unichem2index_spark.sources.tables import (
    IcebergSegmentStore,
    SegmentStore,
    iceberg_available,
    open_store,
)


def test_iceberg_not_available_in_sandbox(spark):
    assert iceberg_available(spark) is False
    assert iceberg_available(spark, "some_catalog") is False


def test_open_store_falls_back_to_parquet(spark, tmp_path):
    store = open_store(spark, str(tmp_path / "idx"))
    assert type(store) is SegmentStore


def test_iceberg_store_name_mapping(spark, tmp_path):
    # construction + catalog-name mapping are pure and testable without
    # the runtime jar; writes are the documented cluster path.
    s = IcebergSegmentStore(str(tmp_path / "my-index"), spark, "prod")
    assert s.qualified("segments") == "prod.u2i_my_index.segments"
    assert s.qualified("term_stats") == "prod.u2i_my_index.term_stats"


def test_versioned_path_sequence():
    assert SegmentStore.next_version("segments", "segments") == "segments_v1"
    assert SegmentStore.next_version("segments_v1", "segments") == "segments_v2"
    assert SegmentStore.next_version("segments_v9", "segments") == "segments_v10"


# ---------------------------------------------------------------------------
# Stub-catalog contract: drive every IcebergSegmentStore write path without
# the runtime jar and assert the exact DataFrameWriterV2 call sequence
# (the documented cluster path; ref contract: index DDL + upsert
# idempotency, extractor/loader.go:114-136,186).
# ---------------------------------------------------------------------------
class _StubWriterV2:
    def __init__(self, log: list, table: str):
        self._log, self._table, self._parts = log, table, None

    def partitionedBy(self, *cols):
        self._parts = tuple(str(c) for c in cols)
        return self

    def _fire(self, verb):
        self._log.append((verb, self._table, self._parts))

    def create(self):
        self._fire("create")

    def createOrReplace(self):
        self._fire("createOrReplace")

    def overwritePartitions(self):
        self._fire("overwritePartitions")


class _StubDF:
    """Records the plan-side calls the store makes before writeTo."""

    def __init__(self, log: list):
        self._log = log

    def repartition(self, *cols):
        self._log.append(("repartition", cols))
        return self

    def sortWithinPartitions(self, *cols):
        self._log.append(("sortWithinPartitions", cols))
        return self

    def coalesce(self, n):
        self._log.append(("coalesce", n))
        return self

    def writeTo(self, table: str):
        return _StubWriterV2(self._log, table)


class _StubCatalog:
    def __init__(self, existing: set[str]):
        self.existing = existing

    def tableExists(self, name: str) -> bool:
        return name in self.existing


class _StubSpark:
    def __init__(self, existing: set[str]):
        self.catalog = _StubCatalog(existing)
        self.sql_log: list[str] = []

    def sql(self, q: str):
        self.sql_log.append(q)


def _writes(log):
    return [e for e in log if e[0] in ("create", "createOrReplace", "overwritePartitions")]


def test_iceberg_write_segments_call_sequence(tmp_path):
    sp = _StubSpark(existing=set())
    s = IcebergSegmentStore(str(tmp_path / "idx"), sp, "prod")
    seg = s.qualified("segments")

    # first build: table absent -> partitioned createOrReplace
    log: list = []
    assert s.write_segments(_StubDF(log)) == "segments"
    assert _writes(log) == [("createOrReplace", seg, ("gen", "shard"))]
    assert ("sortWithinPartitions", ("gen", "shard", "term", "block_id")) in log

    # generation append: table present -> overwritePartitions, and the
    # returned name still matches the logical table (manifest pointer
    # consistency — the GC comparison must be a no-op).
    sp.catalog.existing.add(seg)
    log2: list = []
    assert s.write_segments(_StubDF(log2), physical="segments_v1") == "segments"
    assert _writes(log2) == [("overwritePartitions", seg, None)]


def test_iceberg_compaction_replaces_not_drops(tmp_path):
    """The compaction path must (a) atomically REPLACE segments so stale
    gen>=1 partitions can't resurrect, and (b) return the logical name so
    post-commit GC never DROPs the live table."""
    sp = _StubSpark(existing=set())
    s = IcebergSegmentStore(str(tmp_path / "idx"), sp, "prod")
    sp.catalog.existing.add(s.qualified("segments"))

    log: list = []
    old = "segments"  # what compact() resolves pre-stage
    seg_phys = s.stage_segments(_StubDF(log))
    assert _writes(log) == [
        ("createOrReplace", s.qualified("segments"), ("gen", "shard"))
    ]
    # the GC guard `tables[name] != phys` is False -> no DROP is issued
    assert seg_phys == old
    tables = {"segments": seg_phys}
    for name, phys in {"segments": old}.items():
        if tables[name] != phys:
            s.remove_table(phys)
    assert sp.sql_log == []


def test_iceberg_gen_partition_and_stage_table(tmp_path):
    sp = _StubSpark(existing=set())
    s = IcebergSegmentStore(str(tmp_path / "idx"), sp, "prod")

    log: list = []
    assert s.write_gen_partition(_StubDF(log), "deletes") == "deletes"
    assert _writes(log) == [("create", s.qualified("deletes"), ("gen",))]

    sp.catalog.existing.add(s.qualified("deletes"))
    log2: list = []
    assert s.write_gen_partition(_StubDF(log2), "deletes") == "deletes"
    assert _writes(log2) == [("overwritePartitions", s.qualified("deletes"), None)]

    # whole-table rewrite: atomic replace, logical name returned (the
    # versioned-path bookkeeping stays an identity mapping)
    log3: list = []
    assert s.stage_table(_StubDF(log3), "term_stats", max_files=8) == "term_stats"
    assert ("coalesce", 8) in log3
    assert _writes(log3) == [("createOrReplace", s.qualified("term_stats"), None)]

    s.remove_table("term_stats_old")
    assert sp.sql_log == [
        f"DROP TABLE IF EXISTS {s.qualified('term_stats_old')}"
    ]
