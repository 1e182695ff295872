"""Checkpoint catalog: Iceberg-style atomic table checkpoints on parquet.

The pipeline's resumability layer (SURVEY.md §7 step 9).  The sandbox has
no Iceberg runtime jar, so this implements the same contract on plain
parquet + a JSON manifest:

* a stage checkpoint is ``<root>/<name>/data/*.parquet`` plus
  ``<root>/<name>/manifest.json`` holding schema, row count, config hash,
  stage version and wall time (per-partition lineage + metrics);
* writes are atomic-by-rename: data lands in a temp dir, the manifest is
  written last — a checkpoint without a manifest is invisible, so a killed
  job never exposes partial state;
* :func:`load_or_compute` skips recomputation iff a manifest exists with a
  matching config hash (kill the job after stage k, rerun, stages 1..k are
  read back — the resume test in tests/test_pipeline_recall.py).

On a real deployment the same five functions map 1:1 onto Iceberg
``writeTo(...).createOrReplace()`` + snapshot metadata; the pipeline code
is identical under either backend.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Catalog"]


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "manifest.json")

    def manifest(self, name: str) -> dict | None:
        try:
            with open(self._manifest_path(name)) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def exists(self, name: str, config_hash: str | None = None) -> bool:
        m = self.manifest(name)
        if m is None:
            return False
        return config_hash is None or m.get("config_hash") == config_hash

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(name), "data"))

    # -------------------------------------------------- multi-part tables
    # Manifest-level append (the Iceberg snapshot story): a logical table
    # = its base checkpoint + an ordered list of part checkpoints.  An
    # incremental fold registers the increment's table as a part instead of
    # rewriting the base — O(increment) I/O, and the base data files never
    # churn.  A full rewrite (``write``) resets the part list.

    def _parts_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}__parts.json")

    def parts(self, name: str) -> list[str]:
        try:
            with open(self._parts_path(name)) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return []

    def add_part(self, name: str, part_table: str) -> None:
        """Register ``part_table`` (an existing checkpoint) as a part of the
        logical table ``name``.  Idempotent (set semantics) and atomic
        (tmp-file + rename), so a crashed/rerun fold never duplicates."""
        if not self.exists(part_table):
            raise ValueError(f"part table {part_table} has no checkpoint")
        ps = self.parts(name)
        if part_table in ps:
            return
        ps.append(part_table)
        tmp = self._parts_path(name) + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(ps, fh)
        os.replace(tmp, self._parts_path(name))

    def read_union(self, name: str) -> DataFrame:
        """The logical table: base checkpoint unioned with all parts."""
        df = self.read(name)
        for p in self.parts(name):
            df = df.unionByName(self.read(p))
        return df

    def compact(self, name: str, max_parts: int = 8) -> bool:
        """Fold part checkpoints into the base when the logical table's
        scan fan-in exceeds ``max_parts`` (the Iceberg rewrite_data_files
        story): rewrites base = read_union(name) and clears the part list
        (``write`` supersedes parts atomically), so unbounded daily
        increments can never degenerate into an unbounded union plan.
        Part checkpoints stay on disk — they are independent stage
        checkpoints that incremental runs may still resume from.
        Returns True iff a compaction ran."""
        ps = self.parts(name)
        if len(ps) <= max_parts:
            return False
        m = self.manifest(name)
        self.write(
            name,
            self.read_union(name),
            m["config_hash"],
            m.get("stage_version", 1),
            extra_meta={"compacted_parts": len(ps)},
        )
        return True

    def write(
        self,
        name: str,
        df: DataFrame,
        config_hash: str,
        stage_version: int = 1,
        extra_meta: dict | None = None,
    ) -> DataFrame:
        """Materialize df as the checkpoint ``name`` (atomic), return the
        re-read DataFrame (so downstream stages scan parquet, cutting
        lineage exactly like an Iceberg table boundary would)."""
        t0 = time.time()
        table_dir = self._dir(name)
        tmp = os.path.join(self.root, f"_tmp_{name}_{uuid.uuid4().hex[:8]}")
        # small row groups so read-back splits parallelize: one file with a
        # single giant row group serializes every downstream scan task
        (
            df.write.mode("overwrite")
            .option("parquet.block.size", 8 * 1024 * 1024)
            .parquet(os.path.join(tmp, "data"))
        )
        back = self.spark.read.parquet(os.path.join(tmp, "data"))
        # per-partition lineage: row count per written file, read from the
        # parquet footers directly (no extra Spark job per stage); on a
        # remote filesystem fall back to one metadata-only aggregate
        data_dir = os.path.join(tmp, "data")
        files = sorted(
            f for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        try:
            import pyarrow.parquet as pq

            part_rows = [
                [i, pq.ParquetFile(os.path.join(data_dir, f)).metadata.num_rows]
                for i, f in enumerate(files)
            ]
            n_rows = sum(n for _, n in part_rows)
        except Exception:  # pragma: no cover - remote fs fallback
            n_rows = back.count()
            part_rows = []
        n_files = len(files)
        manifest = {
            "table": name,
            "config_hash": config_hash,
            "stage_version": stage_version,
            "rows": n_rows,
            "files": n_files,
            "partition_rows": part_rows,
            "schema": back.schema.jsonValue(),
            "wall_sec": round(time.time() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            **(extra_meta or {}),
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=1)
        if os.path.exists(table_dir):
            shutil.rmtree(table_dir)
        os.rename(tmp, table_dir)
        # a full rewrite supersedes any incremental parts
        if os.path.exists(self._parts_path(name)):
            os.remove(self._parts_path(name))
        return self.read(name)

    def load_or_compute(
        self,
        name: str,
        config_hash: str,
        compute,
        stage_version: int = 1,
        extra_meta: dict | None = None,
    ) -> tuple[DataFrame, bool]:
        """→ (df, was_cached).  ``compute`` is a 0-arg callable returning the
        stage DataFrame; only invoked on a config-hash miss."""
        if self.exists(name, config_hash):
            return self.read(name), True
        df = self.write(name, compute(), config_hash, stage_version, extra_meta)
        return df, False
