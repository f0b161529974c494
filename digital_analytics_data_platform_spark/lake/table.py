"""Snapshot-based table format: immutable parquet files + JSON manifests.

Layout on disk::

    <table>/
        data/<commit-uuid>/_bucket=K/part-*.parquet   immutable data files
        snapshots/v000000000001.json                  manifest chain
        _CURRENT                                      atomic pointer (rename)
        quarantine/                                   rejected garbage rows

A snapshot manifest records: version, parent, Spark schema JSON, key
columns, bucket count, the full live file list (path, bucket, rows,
min/max stats), table properties (including the exactly-once ledger of
applied batches), and per-bucket lineage for the last commit.

Single-writer model (one streaming query per table), like the
reference's scheduler-serialized stored procedures
(``orchestration/bigquery/…/00_sdi_sa360_paid_search_sp_call.sql:1-17``).
Commits still verify the expected parent version so a misconfigured
second writer fails loudly instead of corrupting state.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# System column marking tombstoned keys. Tombstones are retained so a
# late-arriving older update cannot resurrect a deleted key; readers
# filter them, maintenance can expire them past the watermark.
DELETED_COL = "_deleted"


class CommitConflict(RuntimeError):
    pass


@dataclass
class Snapshot:
    version: int
    parent: int | None
    schema_json: str
    key_cols: list[str]
    order_cols: list[str]
    n_buckets: int
    files: list[dict[str, Any]]
    props: dict[str, Any] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "parent": self.parent,
                "schema": json.loads(self.schema_json),
                "key_cols": self.key_cols,
                "order_cols": self.order_cols,
                "n_buckets": self.n_buckets,
                "files": self.files,
                "props": self.props,
                "lineage": self.lineage,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        return Snapshot(
            version=d["version"],
            parent=d.get("parent"),
            schema_json=json.dumps(d["schema"]),
            key_cols=d["key_cols"],
            order_cols=d["order_cols"],
            n_buckets=d["n_buckets"],
            files=d["files"],
            props=d.get("props", {}),
            lineage=d.get("lineage", []),
        )


def _atomic_write(path: str, content: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(content)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX


class LakeTable:
    """Handle to a snapshot-versioned bucketed table."""

    def __init__(self, path: str):
        self.path = path

    # -- lifecycle -------------------------------------------------------

    @staticmethod
    def create(
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        order_cols: list[str],
        n_buckets: int = 64,
        props: dict[str, Any] | None = None,
    ) -> "LakeTable":
        """Create an empty table. ``order_cols`` define the total
        last-writer-wins order (e.g. ``["ts", "lsn"]``)."""
        if os.path.exists(os.path.join(path, "_CURRENT")):
            raise FileExistsError(f"table already exists at {path}")
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        if DELETED_COL not in schema.fieldNames():
            schema = T.StructType(list(schema.fields) + [T.StructField(DELETED_COL, T.BooleanType(), False)])
        snap = Snapshot(
            version=0,
            parent=None,
            schema_json=schema.json(),
            key_cols=list(key_cols),
            order_cols=list(order_cols),
            n_buckets=n_buckets,
            files=[],
            props=dict(props or {}),
        )
        t = LakeTable(path)
        t._write_snapshot(snap)
        return t

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, "_CURRENT"))

    @staticmethod
    def load(path: str) -> "LakeTable":
        if not LakeTable.exists(path):
            raise FileNotFoundError(f"no lake table at {path}")
        return LakeTable(path)

    def snapshot(self, version: int | None = None) -> Snapshot:
        if version is None:
            with open(os.path.join(self.path, "_CURRENT")) as f:
                version = int(f.read().strip())
        with open(os.path.join(self.path, "snapshots", f"v{version:012d}.json")) as f:
            return Snapshot.from_json(f.read())

    def _write_snapshot(self, snap: Snapshot) -> None:
        snap_path = os.path.join(self.path, "snapshots", f"v{snap.version:012d}.json")
        if os.path.exists(snap_path):
            raise CommitConflict(f"snapshot v{snap.version} already exists (concurrent writer?)")
        _atomic_write(snap_path, snap.to_json())
        _atomic_write(os.path.join(self.path, "_CURRENT"), str(snap.version))

    # -- read ------------------------------------------------------------

    def bucket_expr(self, n_buckets: int, col: str | None = None) -> F.Column:
        """Bucket id for a key column: pmod(xxhash64(key), B)."""
        c = F.col(col) if col else F.col(self.snapshot().key_cols[0])
        return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")

    def read(
        self,
        spark: SparkSession,
        *,
        buckets: Iterable[int] | None = None,
        include_deleted: bool = False,
        snapshot_version: int | None = None,
        min_order: tuple | None = None,
        stats_range: dict[str, tuple] | None = None,
        collapse: bool | None = None,
    ) -> DataFrame:
        """Read the table at a snapshot. ``buckets`` prunes to the given
        bucket ids via the manifest (file skipping — the partition-
        pruning analog); ``min_order`` prunes files whose max order-col
        stat is below the bound (incremental-scan analog).

        ``stats_range`` maps column → (lo, hi) inclusive bounds and
        skips files whose per-file min/max stats cannot overlap — the
        Iceberg file-skipping analog for consumption-time range reads
        (``day BETWEEN`` on a day-keyed gold mart). Bounds compare
        against the manifest's JSON-safe stat values (dates/timestamps
        as ISO strings, whose lexicographic order is chronological), so
        pass ISO strings for temporal columns. Either bound may be
        None (open-ended). Skipping is conservative: kept files may
        still hold out-of-range rows — apply the actual predicate on
        the returned frame as usual. Stats exist for key and order
        columns; range-pruning on a KEY column can never split a key's
        LWW version history across kept/dropped files (all versions of
        a key share its key values).

        If the snapshot carries merge-on-read delta files (appended by
        ``merge_changes(strategy="mor")``), a key may appear in several
        files; the read collapses to the latest version per key with the
        same last-writer-wins hash agg the MERGE uses. ``collapse``
        forces/suppresses this (default: auto from the manifest)."""
        snap = self.snapshot(snapshot_version)
        files = snap.files
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]
        if min_order is not None and files:
            ocol = snap.order_cols[-1]  # lsn stats
            files = [f for f in files if f.get(f"max_{ocol}") is None or f[f"max_{ocol}"] >= min_order[-1]]
        if stats_range:
            for col, (lo, hi) in stats_range.items():
                files = [
                    f
                    for f in files
                    if f.get(f"min_{col}") is None  # no stats → keep (conservative)
                    or not (
                        (hi is not None and f[f"min_{col}"] > hi)
                        or (lo is not None and f[f"max_{col}"] < lo)
                    )
                ]
        schema = snap.schema()
        if not files:
            return spark.createDataFrame([], schema)
        df = spark.read.schema(schema).parquet(*[os.path.join(self.path, f["path"]) for f in files])
        if collapse is None:
            collapse = bool(snap.props.get("delta_buckets"))
        if collapse:
            df = lww_collapse(df, snap.key_cols, snap.order_cols)
        if not include_deleted:
            df = df.filter(~F.col(DELETED_COL)).drop(DELETED_COL)
        return df

    # -- write -----------------------------------------------------------

    def write_data_files(
        self,
        df: DataFrame,
        *,
        bucket_col: str = "_bucket",
        write_salt: int = 1,
        extra_stats: dict[str, F.Column] | None = None,
    ) -> tuple[str, list[dict[str, Any]]]:
        """Write ``df`` (which carries ``bucket_col``) as immutable data
        files grouped by bucket under a fresh commit directory. Returns
        (commit_dir_relpath, file_entries). No manifest change yet —
        files become live only when :meth:`commit` publishes them, so a
        failed write leaves only unreferenced orphans.

        ``write_salt > 1`` spreads a hot bucket over several write tasks
        (skew mitigation for the write stage; the dedupe stage is
        already skew-safe via partial hash aggregation).
        """
        import time

        commit_dir = f"data/{uuid.uuid4().hex}"
        out = os.path.join(self.path, commit_dir)
        snap = self.snapshot()
        # EXPLICIT partition count (buckets × salt): the write stage's
        # parallelism is the physical layout, not a shuffle-size
        # heuristic — without it AQE coalesces the bucket repartition to
        # ~data/64MB tasks, capping write parallelism far below the
        # core count at small batches (measured: flat 4→16-core scaling)
        n_parts = snap.n_buckets * max(write_salt, 1)
        if write_salt > 1:
            salted = df.repartition(
                n_parts, F.col(bucket_col), F.pmod(F.xxhash64(F.col(snap.key_cols[-1])), F.lit(write_salt))
            )
        else:
            salted = df.repartition(n_parts, F.col(bucket_col))
        t0 = time.monotonic()
        salted.write.partitionBy(bucket_col).mode("overwrite").parquet(out)
        t1 = time.monotonic()
        entries = self._stats_job(df.sparkSession, out, bucket_col, extra_stats, schema=df.schema)
        self.last_write_walls = {"write_job": round(t1 - t0, 3), "stats_job": round(time.monotonic() - t1, 3)}
        return commit_dir, entries

    def _stats_job(
        self,
        spark: SparkSession,
        out: str,
        bucket_col: str,
        extra_stats: dict[str, F.Column] | None = None,
        schema: T.StructType | None = None,
    ) -> list[dict[str, Any]]:
        """Per-file manifest entries (path, bucket, rows, min/max order
        stats) via ONE distributed aggregation grouped by
        ``_metadata.file_path`` — executor-side, column-pruned to the
        order columns (the Iceberg write-task stats shape). Replaces the
        round-1 driver `os.walk` + per-footer reads, whose O(files)
        driver wall was the fixed per-commit cost that sank N→4N scaling
        efficiency at small batches (VERDICT r1 #3)."""
        from pyspark.errors import AnalysisException

        snap = self.snapshot()
        try:
            # explicit schema (incl. the bucket partition column) skips
            # driver-side footer inference on the fresh commit dir
            reader = spark.read.schema(schema) if schema is not None else spark.read
            written = reader.parquet(out)
        except AnalysisException:
            return []  # empty write: no part files to publish
        # min/max stats for key AND order columns: order-col stats drive
        # the incremental-scan pruning (min_order), key-col stats drive
        # consumption-time range pruning (stats_range) — e.g. the gold
        # marts key on day/qgp_week, so a dashboard's `day BETWEEN` read
        # skips files whose day range can't overlap. Same agg job either
        # way — stats ride the one groupBy(file_path) pass.
        seen: set[str] = set()
        ocols = [
            c
            for c in (*snap.key_cols, *snap.order_cols)
            if c in written.columns and not (c in seen or seen.add(c))
        ]
        aggs: list[F.Column] = [F.count(F.lit(1)).alias("rows")]
        for c in ocols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        for name, expr in (extra_stats or {}).items():
            aggs.append(expr.alias(name))
        rows = (
            written.groupBy(
                F.col("_metadata.file_path").alias("_fp"), F.col(bucket_col).alias("_bk")
            )
            .agg(*aggs)
            .collect()
        )
        from urllib.parse import unquote, urlparse

        entries: list[dict[str, Any]] = []
        for r in rows:
            local = r["_fp"]
            if local.startswith("file:"):
                # _metadata.file_path is a percent-encoded URI — decode,
                # or a table path with a space bricks the manifest
                local = unquote(urlparse(local).path)
            entry: dict[str, Any] = {
                "path": os.path.relpath(local, self.path),
                "bucket": int(r["_bk"]),
                "rows": int(r["rows"]),
            }
            for c in ocols:
                if r[f"min_{c}"] is not None:
                    entry[f"min_{c}"] = _json_safe(r[f"min_{c}"])
                    entry[f"max_{c}"] = _json_safe(r[f"max_{c}"])
            for name in extra_stats or {}:
                entry[name] = _json_safe(r[name])
            entries.append(entry)
        entries.sort(key=lambda e: (e["bucket"], e["path"]))
        return entries

    def commit(
        self,
        *,
        new_files: list[dict[str, Any]],
        replaced_buckets: Iterable[int] = (),
        expected_version: int | None = None,
        schema: T.StructType | None = None,
        props_update: dict[str, Any] | None = None,
        lineage: list[dict[str, Any]] | None = None,
    ) -> Snapshot:
        """Publish a new snapshot: carry over files outside
        ``replaced_buckets``, add ``new_files``, optionally evolve the
        schema and update properties. Atomic via manifest rename."""
        cur = self.snapshot()
        if expected_version is not None and cur.version != expected_version:
            raise CommitConflict(f"expected v{expected_version}, table at v{cur.version}")
        replaced = set(replaced_buckets)
        carried = [f for f in cur.files if f["bucket"] not in replaced]
        props = dict(cur.props)
        props.update(props_update or {})
        snap = Snapshot(
            version=cur.version + 1,
            parent=cur.version,
            schema_json=(schema or cur.schema()).json(),
            key_cols=cur.key_cols,
            order_cols=cur.order_cols,
            n_buckets=cur.n_buckets,
            files=carried + new_files,
            props=props,
            lineage=lineage or [],
        )
        self._write_snapshot(snap)
        return snap

    # -- maintenance -----------------------------------------------------

    def total_rows(self) -> int:
        return sum(f["rows"] for f in self.snapshot().files)

    def quarantine_path(self) -> str:
        return os.path.join(self.path, "quarantine")


def lww_collapse(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Collapse multi-version rows to the latest per key: one hash agg
    ``max_by(payload, order)`` — partial (map-side) combine makes this
    skew-safe for Zipf-hot keys, unlike a window sort. Used by the MERGE
    kernel and by merge-on-read scans."""
    payload = [c for c in df.columns if c not in key_cols]
    order_struct = F.struct(*[F.col(c) for c in order_cols])
    payload_struct = F.struct(*[F.col(c) for c in payload])
    return (
        df.groupBy(*key_cols)
        .agg(F.max_by(payload_struct, order_struct).alias("_w"))
        .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


def _json_safe(v: Any) -> Any:
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v
