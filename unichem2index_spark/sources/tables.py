"""Table IO: testdata parquet loaders, webtext writer, CSV source/sink,
and the segment-store abstraction.

The reference reads a joined Oracle source (Docker/config.yaml:26-56), loads
pipe-CSV fixtures (alter/testDataLoader.go:42-61) and spools pipe-CSV exports
(alter/spool*.sql); its index lives in Elasticsearch.  Here: parquet scans
for sources, ``sep='|'`` CSV for the fixture formats, and a parquet-backed
segment store (Iceberg-ready: all writes go through one interface, SURVEY.md
§7 M2 fallback note — the Iceberg runtime jar is not available in-sandbox).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def write_webtext(spark: SparkSession, rows: list[dict], path: str) -> DataFrame:
    """Materialize a synthetic webtext table (synth.gen_webtext) as parquet."""
    from unichem2index_spark.schemas import WEBTEXT_SCHEMA

    df = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def read_pipe_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S4: pipe-delimited CSV source (alter/testDataLoader.go:43 r.Comma='|')."""
    reader = spark.read.option("sep", "|").option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_pipe_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: pipe-delimited spool sink (alter/spool2M.sql:13-35)."""
    df.write.mode(mode).option("sep", "|").option("header", "true").csv(path)


class SegmentStore:
    """Index-artifact store: segments / term_stats / docs / stats / lineage.

    Parquet-backed with a JSON manifest. On a real cluster this would be an
    Iceberg catalog (`writeTo(...).append()`, `MERGE INTO` for upserts —
    SURVEY.md §1.1); the interface is the same so only this class changes.
    Segments are written partitioned by ``shard`` so a shard rebuild is an
    idempotent partition overwrite (the reference gets the same idempotency
    from doc_as_upsert keyed bulks, extractor/loader.go:186).
    """

    def __init__(self, base_dir: str):
        self.base = base_dir

    def path(self, name: str) -> str:
        return os.path.join(self.base, name)

    # -- writes ------------------------------------------------------------
    def write_segments(self, df: DataFrame, overwrite_partitions: bool = True) -> None:
        mode = "overwrite" if overwrite_partitions else "append"
        (
            # One file per (gen, shard), rows sorted by (term, block_id):
            # a query's `term IN (...)` predicate prunes parquet row groups
            # via min/max stats and touches exactly one file per shard —
            # without this, every shuffle task leaves a file fragment in
            # every shard dir (~shuffle_partitions x n_shards tiny files).
            df.repartition("gen", "shard")
            .sortWithinPartitions("gen", "shard", "term", "block_id")
            .write.mode(mode)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen", "shard")
            .parquet(self.path("segments"))
        )

    def append_table(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self.path(name))

    def remove_table(self, name: str) -> None:
        """Drop a staged/retired table (Iceberg: DROP TABLE)."""
        import shutil

        shutil.rmtree(self.path(name), ignore_errors=True)

    def swap_table(self, staged: str, live: str) -> None:
        """Promote a fully-written staged table over the live one (Iceberg:
        atomic snapshot swap; parquet fallback: rename-after-write)."""
        import shutil

        shutil.rmtree(self.path(live), ignore_errors=True)
        os.rename(self.path(staged), self.path(live))

    def write_table(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        max_files: int | None = None,
    ) -> None:
        if max_files:
            df = df.coalesce(max_files)
        df.write.mode(mode).parquet(self.path(name))

    def append_lineage(self, df: DataFrame) -> None:
        df.coalesce(1).write.mode("append").parquet(self.path("lineage"))

    def write_manifest(self, meta: dict) -> None:
        os.makedirs(self.base, exist_ok=True)
        with open(self.path("manifest.json"), "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)

    # -- reads -------------------------------------------------------------
    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def read_manifest(self) -> dict:
        with open(self.path("manifest.json")) as f:
            return json.load(f)

    def exists(self, name: str = "manifest.json") -> bool:
        return os.path.exists(self.path(name))

    def done_shards(self, spark: SparkSession) -> set[int]:
        """Shards recorded complete in lineage (T1 resume watermark)."""
        if not os.path.exists(self.path("lineage")):
            return set()
        rows = (
            self.read(spark, "lineage")
            .where("status = 'done'")
            .select("shard")
            .distinct()
            .collect()
        )
        return {r.shard for r in rows}
