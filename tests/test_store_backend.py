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
