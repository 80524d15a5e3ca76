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


def iceberg_available(spark: SparkSession, catalog: str | None = None) -> bool:
    """True iff an Iceberg Spark catalog is configured on this session AND
    the Iceberg runtime classes actually load. In this sandbox the runtime
    jar is absent, so this returns False and stores fall back to the
    parquet+manifest backend (SURVEY.md §1.1 / §7 M2 fallback note)."""
    try:
        pairs = dict(spark.sparkContext.getConf().getAll())
        catalogs = [
            k.split(".")[3]
            for k, v in pairs.items()
            if k.startswith("spark.sql.catalog.")
            and k.count(".") == 3
            and "iceberg" in v.lower()
        ]
        if catalog is not None and catalog not in catalogs:
            return False
        if not catalogs:
            return False
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — jar probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def open_store(
    spark: SparkSession, base_dir: str, catalog: str | None = None
) -> "SegmentStore":
    """Store factory: an Iceberg-backed store when the runtime is present
    (atomic snapshot commits replace the manifest protocol), else the
    parquet+manifest SegmentStore. Callers use the same interface either
    way — only the commit mechanics differ."""
    if iceberg_available(spark, catalog):
        return IcebergSegmentStore(base_dir, spark, catalog or "spark_catalog")
    return SegmentStore(base_dir)


class SegmentStore:
    """Index-artifact store: segments / term_stats / docs / url_map /
    deletes / lineage, parquet-backed with a JSON manifest.

    Commit protocol (crash-safe, object-store friendly — no renames of
    data paths, the reference gets the analogous idempotency from
    doc_as_upsert keyed bulks, extractor/loader.go:186):

    * **Generation-gated appends.** segments/docs/url_map/deletes are
      partitioned by ``gen``; an incremental update writes ONLY its own
      gen's partitions (dynamic partition overwrite, so a retry
      overwrites rather than duplicates). Readers filter
      ``gen IN manifest["generations"]`` — partitions from an
      uncommitted or crashed update are invisible until the manifest
      names their generation.
    * **Versioned rewrites.** whole-table rewrites (term_stats on every
      update; everything on compaction) go to a fresh ``<name>_v<k>``
      path recorded in ``manifest["tables"]``; the single atomic
      manifest write (tmp + rename) flips every pointer at once. Old
      versions are garbage-collected after the commit.

    On a real cluster the same interface maps onto an Iceberg catalog
    (`writeTo(...).overwritePartitions()`, snapshot commit — SURVEY.md
    §1.1); only this class changes.

    Concurrency contract: **single writer, snapshot-ish readers.** Builds,
    updates and compactions must not run concurrently against one index
    (the reference gets the same guarantee from its single extractor
    process, main.go:112-115). Readers (:class:`IndexHandle`) opened
    before a commit keep working through it: retired physical versions
    are garbage-collected under a retention window (see
    :meth:`commit_and_gc`) — a version retired at commit k is removed by
    commit k+1 at the earliest, so a handle survives at least one full
    update cycle; re-open handles to pick up new commits.
    """

    #: True when the backend provides atomic table replacement natively
    #: (Iceberg snapshot commits) — versioned-path staging and GC are
    #: then inert and must not delete live tables.
    native_atomic = False

    def __init__(self, base_dir: str):
        self.base = base_dir

    def path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def _resolve(self, name: str) -> str:
        """Logical table name -> current physical relpath (manifest
        ``tables`` pointer when present, else the name itself)."""
        mf_path = self.path("manifest.json")
        if os.path.exists(mf_path):
            with open(mf_path) as f:
                tables = json.load(f).get("tables", {})
            if name in tables:
                return tables[name]
        return name

    @staticmethod
    def next_version(physical: str, logical: str) -> str:
        """segments -> segments_v1 -> segments_v2 -> ..."""
        if physical == logical:
            return f"{logical}_v1"
        k = int(physical.rsplit("_v", 1)[1])
        return f"{logical}_v{k + 1}"

    # -- writes ------------------------------------------------------------
    def write_segments(self, df: DataFrame, physical: str | None = None) -> str:
        """Write segment rows; returns the physical name actually written
        (the manifest pointer / GC comparisons must use THIS value — a
        backend is free to ignore ``physical``, e.g. Iceberg)."""
        phys = physical or self._resolve("segments")
        (
            # One file per (gen, shard), rows sorted by (term, block_id):
            # a query's `term IN (...)` predicate prunes parquet row groups
            # via min/max stats and touches exactly one file per shard —
            # without this, every shuffle task leaves a file fragment in
            # every shard dir (~shuffle_partitions x n_shards tiny files).
            df.repartition("gen", "shard")
            .sortWithinPartitions("gen", "shard", "term", "block_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen", "shard")
            .parquet(self.path(phys))
        )
        return phys

    def stage_segments(self, df: DataFrame) -> str:
        """Full segments rewrite (compaction): stage to the next version
        path and return it for the manifest flip. On backends with native
        atomic replacement this is a plain table replace instead."""
        phys = self.next_version(self._resolve("segments"), "segments")
        return self.write_segments(df, physical=phys)

    def write_gen_partition(
        self, df: DataFrame, name: str, physical: str | None = None
    ) -> str:
        """Write one generation's rows of a gen-partitioned table
        (docs/url_map/deletes). Dynamic overwrite of exactly the gen
        partitions present in ``df`` — an update retry is idempotent.
        ``physical`` overrides the manifest pointer for pre-commit writes
        to a not-yet-committed version path."""
        phys = physical or self._resolve(name)
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen")
            .parquet(self.path(phys))
        )
        return phys

    def stage_table(
        self, df: DataFrame, name: str, max_files: int | None = None,
        partition_gen: bool = False,
    ) -> str:
        """Write a full rewrite of ``name`` to the NEXT version path and
        return that physical name; the caller records it in
        manifest["tables"] at commit time."""
        physical = self.next_version(self._resolve(name), name)
        if max_files:
            df = df.coalesce(max_files)
        w = df.write.mode("overwrite")
        if partition_gen:
            w = w.partitionBy("gen")
        w.parquet(self.path(physical))
        return physical

    def remove_table(self, name: str) -> None:
        """Physically drop a retired table version (post-commit GC)."""
        import shutil

        shutil.rmtree(self.path(name), ignore_errors=True)

    def write_table(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        max_files: int | None = None,
    ) -> None:
        if max_files:
            df = df.coalesce(max_files)
        df.write.mode(mode).parquet(self.path(self._resolve(name)))

    def append_lineage(self, df: DataFrame) -> None:
        df.coalesce(1).write.mode("append").parquet(self.path("lineage"))

    def write_manifest(self, meta: dict) -> None:
        """Atomic commit point: POSIX rename of a fully-written temp file.
        (On an object store this becomes the catalog's atomic pointer
        swap — Iceberg snapshot commit / HMS alter-table.)"""
        os.makedirs(self.base, exist_ok=True)
        tmp = self.path("manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.path("manifest.json"))

    def commit_and_gc(
        self, mf: dict, retired: list[str], keep: int = 1
    ) -> None:
        """Atomic manifest commit + retention-window GC of retired
        physical versions.

        A version retired at commit_seq k is physically removed only by a
        commit with seq >= k + ``keep`` — an :class:`IndexHandle` (or any
        lazily-evaluated DataFrame holding resolved paths) opened against
        the previous manifest survives at least ``keep`` subsequent
        commits instead of hitting PATH_NOT_FOUND mid-query. Pending
        retirements ride the manifest (``retired``/``commit_seq`` keys),
        so a crash between commit and GC just defers the GC to the next
        commit. Never removes a path the new manifest still points at."""
        seq = int(mf.get("commit_seq", 0)) + 1
        pending = list(mf.get("retired", [])) + [
            {"phys": p, "seq": seq} for p in retired
        ]
        live = set(mf.get("tables", {}).values())
        keep_list: list[dict] = []
        gc_list: list[dict] = []
        for e in pending:
            if e["phys"] in live:
                continue
            (gc_list if seq - int(e["seq"]) >= keep else keep_list).append(e)
        mf["commit_seq"] = seq
        mf["retired"] = keep_list
        self.write_manifest(mf)  # COMMIT — everything above is invisible
        for e in gc_list:  # post-commit, crash-safe to skip/retry
            self.remove_table(e["phys"])

    # -- reads -------------------------------------------------------------
    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(self._resolve(name)))

    def read_committed(
        self, spark: SparkSession, name: str, generations: list[int]
    ) -> DataFrame:
        """Gen-partitioned read restricted to committed generations (the
        gen filter prunes whole partition directories)."""
        from pyspark.sql import functions as F

        return self.read(spark, name).where(F.col("gen").isin(list(generations)))

    def read_manifest(self) -> dict:
        with open(self.path("manifest.json")) as f:
            return json.load(f)

    def exists(self, name: str = "manifest.json") -> bool:
        return os.path.exists(self.path(self._resolve(name)))

    # Snapshot table set: everything the manifest can reference.
    _SNAPSHOT_TABLES = (
        "segments", "term_stats", "docs", "url_map", "deletes", "lineage",
    )

    def snapshot_to(self, dest_dir: str) -> dict:
        """ES `_snapshot` analog: a CONSISTENT point-in-time copy of the
        index — the manifest plus exactly the physical table versions it
        references. Correct without any lock because of the store's own
        invariants: committed physical versions are immutable (rewrites
        go to fresh ``_v<k>`` paths; gen partitions are only ever written
        by their own uncommitted generation), so copying the manifest
        FIRST and then the paths it names can never observe a torn
        table — a concurrent update writes only paths this manifest does
        not reference. Physical paths are therefore resolved from the
        ALREADY-READ manifest dict, never re-read from disk: a re-read
        racing a concurrent commit could resolve a newer physical
        version (e.g. ``segments_v3``) than the copied manifest
        references, leaving the snapshot manifest pointing at a
        directory that was never copied. The snapshot is itself a
        complete standalone store (restore = open it, or copy it back).

        Driver-side file copy — this store's backend is a filesystem; on
        an object store the same walk maps to server-side copies, and
        the Iceberg variant delegates to catalog snapshot/export."""
        import shutil

        os.makedirs(dest_dir, exist_ok=True)
        mf = self.read_manifest()
        with open(os.path.join(dest_dir, "manifest.json"), "w") as f:
            json.dump(mf, f)
        copied = []
        mf_tables = mf.get("tables", {})
        for name in self._SNAPSHOT_TABLES:
            phys = mf_tables.get(name, name)
            src = self.path(phys)
            if not os.path.exists(src):
                continue
            dst = os.path.join(dest_dir, phys)
            shutil.copytree(src, dst, dirs_exist_ok=True)
            copied.append(phys)
        return {"tables": copied, "generations": mf.get("generations", [0])}

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


class IcebergSegmentStore(SegmentStore):
    """Iceberg-backed variant: every table is a catalog table
    ``<catalog>.<db>.<name>`` and the commit protocol collapses onto
    Iceberg's own atomicity — gen-partition writes become
    ``writeTo(...).overwritePartitions()`` (dynamic partition overwrite as
    an atomic snapshot), whole-table rewrites become
    ``createOrReplace()`` (no versioned-path dance needed), and existence
    is ``spark.catalog.tableExists``. The JSON manifest survives only as
    the stats record (n_docs/avgdl/generations), stored next to the
    warehouse path.

    Exercised when :func:`iceberg_available` is True — the runtime jar is
    not in this sandbox, so CI drives these write paths through a stub
    catalog/DataFrame contract test (tests/test_store_backend.py) that
    asserts the exact DataFrameWriterV2 call sequences, plus detection +
    the parquet fallback (Iceberg public Spark API only).

    Every write returns the LOGICAL table name: Iceberg replaces tables
    atomically (snapshot commit), so the manifest's version pointers stay
    identity mappings and the versioned-path GC is inert by construction
    — it can never DROP a live table (``tables[name] == phys`` always).
    """

    native_atomic = True

    def __init__(self, base_dir: str, spark: SparkSession, catalog: str):
        super().__init__(base_dir)
        self.spark = spark
        self.catalog = catalog
        # one namespace per index directory, derived deterministically
        self.db = "u2i_" + os.path.basename(base_dir.rstrip("/")).replace(
            "-", "_"
        )

    def qualified(self, name: str) -> str:
        return f"{self.catalog}.{self.db}.{name}"

    def exists(self, name: str = "manifest.json") -> bool:
        if name == "manifest.json":
            return os.path.exists(self.path(name))
        return self.spark.catalog.tableExists(self.qualified(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.table(self.qualified(name))

    def _sorted_segments(self, df: DataFrame) -> DataFrame:
        return df.repartition("gen", "shard").sortWithinPartitions(
            "gen", "shard", "term", "block_id"
        )

    def write_segments(self, df: DataFrame, physical: str | None = None) -> str:
        """Generation append / first build. ``physical`` is ignored —
        Iceberg has no versioned paths — and the LOGICAL name is returned
        so manifest pointers and GC comparisons stay consistent (they
        must never reference a path the catalog doesn't manage)."""
        out = self._sorted_segments(df)
        if not self.exists("segments"):
            out.writeTo(self.qualified("segments")).partitionedBy(
                "gen", "shard"
            ).createOrReplace()
        else:
            out.writeTo(self.qualified("segments")).overwritePartitions()
        return "segments"

    def stage_segments(self, df: DataFrame) -> str:
        """Compaction rewrite: ``createOrReplace`` — ONE atomic snapshot
        that both installs the gen-0 blocks and drops every stale gen>=1
        partition (``overwritePartitions`` would only rewrite gen=0 and
        leave old generations to resurrect on the next update)."""
        self._sorted_segments(df).writeTo(self.qualified("segments")).partitionedBy(
            "gen", "shard"
        ).createOrReplace()
        return "segments"

    def write_gen_partition(
        self, df: DataFrame, name: str, physical: str | None = None
    ) -> str:
        if not self.exists(name):
            df.writeTo(self.qualified(name)).partitionedBy("gen").create()
        else:
            df.writeTo(self.qualified(name)).overwritePartitions()
        return name

    def stage_table(
        self, df: DataFrame, name: str, max_files: int | None = None,
        partition_gen: bool = False,
    ) -> str:
        # Iceberg replaces the table atomically — no versioned path needed;
        # returning the logical name keeps the manifest bookkeeping inert.
        if max_files:
            df = df.coalesce(max_files)
        w = df.writeTo(self.qualified(name))
        if partition_gen:
            w = w.partitionedBy("gen")
        w.createOrReplace()
        return name

    def write_table(
        self, df: DataFrame, name: str, mode: str = "overwrite",
        max_files: int | None = None,
    ) -> None:
        self.stage_table(df, name, max_files=max_files)

    def remove_table(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.qualified(name)}")
