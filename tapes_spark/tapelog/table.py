"""TapeTable — an append-only, snapshot-versioned parquet table.

The storage contract the pipeline needs from Iceberg (SURVEY.md §2.8,
§2.10: snapshot isolation, append + partition-overwrite, snapshot-id
change cursor, time travel), implemented over plain parquet + JSON
manifests because no Iceberg runtime ships in this environment.  The
public surface mirrors the Iceberg operations we use, so swapping in
`spark.read.format("iceberg")` on a real cluster is a one-module change
(see `HAS_ICEBERG` below).

Layout:
    <root>/data/<uuid>/part-*.parquet     immutable data file groups
    <root>/snapshots/<n>.json             manifest: file list + lineage
    <root>/_current                       pointer, updated by atomic rename

Semantics:
  * append(df)                — new snapshot = parent files + new files
  * overwrite_partitions(df, keys) — the idempotent MERGE+prune (D3):
        new snapshot = parent files MINUS files whose partition-column
        value-set intersects the incoming keys, PLUS rewritten rows for
        those keys.  Because derivation is a pure function with
        deterministic ids (D2), replacing a conversation's rows wholesale
        is exactly "upsert every emitted row + prune stale rows".
  * read(snapshot_id=None)    — current or time-travel read
  * snapshots()               — the change feed (D4): consumers record the
        last snapshot id they processed and read only newer ones
  * lineage in every manifest — run_id, input fingerprint, operation,
        per-write row counts (the auditable tape the north_rule asks for)

Writer concurrency: single-writer per table (the per-session advisory
lock analog ST3 — in Spark one driver owns a sink).  Readers are safe at
all times: data files are immutable and `_current` flips atomically.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - exercised only on clusters with Iceberg jars
    import importlib.util

    HAS_ICEBERG = (
        importlib.util.find_spec("pyspark.sql.iceberg") is not None
    )
except Exception:  # pragma: no cover
    HAS_ICEBERG = False


class TapeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # ------------------------------------------------------------ state

    def _current_path(self) -> str:
        return os.path.join(self.root, "_current")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.root, "snapshots", f"{snapshot_id}.json")

    def manifest(self, snapshot_id: int) -> dict:
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """All snapshots in id order — the change feed (D4)."""
        out = []
        snap_dir = os.path.join(self.root, "snapshots")
        for name in sorted(os.listdir(snap_dir), key=lambda n: int(n.split(".")[0])):
            with open(os.path.join(snap_dir, name)) as f:
                out.append(json.load(f))
        return out

    # ------------------------------------------------------------ write

    def _write_data_group(self, df: DataFrame) -> tuple[str, list[str]]:
        group = uuid.uuid4().hex
        path = os.path.join(self.root, "data", group)
        df.write.mode("overwrite").parquet(path)
        files = sorted(
            os.path.join("data", group, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return group, files

    def _commit(
        self,
        files: list[str],
        operation: str,
        lineage: dict | None,
        partition_values: dict[str, list] | None = None,
    ) -> int:
        parent = self.current_snapshot_id()
        snapshot_id = (parent or 0) + 1
        manifest = {
            "snapshot_id": snapshot_id,
            "parent_id": parent,
            "operation": operation,
            "files": files,
            "committed_at_unix": time.time(),
            "lineage": lineage or {},
            "partition_values": partition_values or {},
        }
        tmp = self._manifest_path(snapshot_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(snapshot_id))
        tmp_cur = self._current_path() + ".tmp"
        with open(tmp_cur, "w") as f:
            f.write(str(snapshot_id))
        os.replace(tmp_cur, self._current_path())  # atomic flip
        return snapshot_id

    def append(self, df: DataFrame, lineage: dict | None = None) -> int:
        _, new_files = self._write_data_group(df)
        parent = self.current_snapshot_id()
        prev_files = self.manifest(parent)["files"] if parent else []
        prev_pv = self.manifest(parent).get("partition_values", {}) if parent else {}
        return self._commit(prev_files + new_files, "append", lineage, prev_pv)

    def overwrite(self, df: DataFrame, lineage: dict | None = None) -> int:
        _, new_files = self._write_data_group(df)
        return self._commit(new_files, "overwrite", lineage)

    def overwrite_partitions(
        self,
        df: DataFrame,
        partition_col: str,
        keys: list,
        lineage: dict | None = None,
    ) -> int:
        """D3: replace all rows whose partition_col is in *keys* with the
        incoming rows (which must only contain those keys).

        File groups track which key values they contain; groups whose
        value-set intersects *keys* are rewritten minus the replaced rows.
        At Iceberg this is `overwritePartitions()`; here we rewrite the
        affected groups (rows for unaffected keys are preserved).
        """
        keyset = set(keys)
        parent = self.current_snapshot_id()
        kept_files: list[str] = []
        rewritten: list[DataFrame] = []
        prev_pv: dict[str, list] = {}
        if parent:
            m = self.manifest(parent)
            prev_pv = m.get("partition_values", {})
            groups: dict[str, list[str]] = {}
            for f in m["files"]:
                groups.setdefault(os.path.dirname(f), []).append(f)
            for group_dir, files in groups.items():
                vals = set(prev_pv.get(group_dir, []))
                if vals and not (vals & keyset):
                    kept_files.extend(files)
                else:
                    old = self.spark.read.parquet(
                        os.path.join(self.root, group_dir)
                    )
                    remaining = old.filter(~old[partition_col].isin(list(keyset)))
                    rewritten.append(remaining)
        new_pv = dict(prev_pv)
        to_write = df
        for r in rewritten:
            to_write = to_write.unionByName(r)
        group, new_files = self._write_data_group(to_write)
        group_dir = os.path.join("data", group)
        # record the value-set of the new group for future pruning
        vals = [
            r[0]
            for r in self.spark.read.parquet(
                os.path.join(self.root, group_dir)
            ).select(partition_col).distinct().collect()
        ]
        new_pv = {d: v for d, v in new_pv.items()
                  if any(f.startswith(d) for f in kept_files)}
        new_pv[group_dir] = sorted(str(v) for v in vals)
        return self._commit(
            kept_files + new_files, "overwrite_partitions", lineage, new_pv
        )

    # ------------------------------------------------------------- read

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            raise ValueError(f"tape table {self.root} has no snapshots")
        files = self.manifest(sid)["files"]
        if not files:
            raise ValueError(f"snapshot {sid} has no data files")
        paths = [os.path.join(self.root, f) for f in files]
        return self.spark.read.parquet(*paths)

    def read_incremental(self, after_snapshot_id: int | None) -> DataFrame | None:
        """Rows appended in snapshots strictly newer than the checkpoint
        (file-level incremental scan — the Iceberg incremental read)."""
        current = self.current_snapshot_id()
        if current is None or (after_snapshot_id or 0) >= current:
            return None
        seen: set[str] = set()
        if after_snapshot_id:
            seen = set(self.manifest(after_snapshot_id)["files"])
        new_files = [
            f for f in self.manifest(current)["files"] if f not in seen
        ]
        if not new_files:
            return None
        return self.spark.read.parquet(
            *[os.path.join(self.root, f) for f in new_files]
        )

    # ---------------------------------------------------------- utility

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
