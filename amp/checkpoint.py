"""Per-stage checkpointing with a run manifest — the resumability layer.

Mirrors the reference's feature tables: each pipeline stage in the
reference is a full read-transform-write pass against a LIST-partitioned
Postgres table keyed by run_id (scripts/init_db.sql:78-115), and re-runs
first DELETE the run's partition (internal/matcher/shared.go:244-256) —
i.e. idempotent partition overwrite. Here:

  * every stage writes parquet partitioned by ``run_id`` with
    mode("overwrite") + dynamic partition overwrite — same idempotency;
  * a ``manifest`` table (the analog of the reference's ``runs`` table,
    init_db.sql:117-121) records per-stage row counts + wall time;
    per-partition row counts are recorded in a companion ``counters``
    table (north_rule: "per-partition lineage and counters");
  * resume: a stage whose manifest row exists is read back instead of
    recomputed — kill the job after stage k, rerun, and stages 1..k are
    served from the checkpoint (tested resume-equals-fresh).

Iceberg is the intended catalog at production scale (snapshot ids would
land in the manifest's ``snapshot`` column); the runtime jar is not in
this sandbox, so the layout is partitioned parquet with an identical
API — the swap is confined to this module.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, run_id: int):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, "_manifest", f"run{self.run_id}_{stage}.json")

    def is_done(self, stage: str) -> bool:
        return os.path.exists(self._manifest_path(stage))

    def manifest(self) -> list[dict]:
        out = []
        d = os.path.join(self.root, "_manifest")
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
        return out

    # -- snapshots ----------------------------------------------------------
    def _run_partition_dir(self, stage: str) -> str:
        return os.path.join(self.table_path(stage), f"run_id={self.run_id}")

    def _snapshot_of(self, stage: str) -> tuple[str, list[dict]]:
        """Iceberg-shaped snapshot: the manifest pins the exact data-file
        set (relative path + byte size) of this run's partition; the
        snapshot id is a digest of that file list. On a real Iceberg
        catalog this column would hold the table snapshot id — the
        CONTRACT exercised here is the same: a stage row names an
        immutable file set, and verify_snapshot detects any drift.

        LIMITATION (documented, matching Iceberg's own manifest checks):
        the digest covers file names + sizes, not file contents —
        in-place corruption that preserves byte sizes passes
        verification; content integrity belongs to the parquet readers'
        page checksums, not the manifest."""
        base = self._run_partition_dir(stage)
        files = []
        for root, _, names in os.walk(base):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    files.append(
                        {"path": os.path.relpath(p, base), "bytes": os.path.getsize(p)}
                    )
        files.sort(key=lambda f: f["path"])
        snap = hashlib.sha256(
            json.dumps(files, sort_keys=True).encode()
        ).hexdigest()[:16]
        return snap, files

    def verify_snapshot(self, stage: str) -> bool:
        """Recompute the stage's file-set digest and compare with the
        manifest — False means the checkpoint was tampered with or
        partially lost and the stage must be recomputed, not resumed."""
        if not self.is_done(stage):
            return False
        with open(self._manifest_path(stage)) as fh:
            recorded = json.load(fh)
        if "snapshot" not in recorded:
            # legacy manifest written before snapshots existed: distinct
            # from tampering — accept it (the done-marker contract it
            # was written under) but say so, instead of silently
            # recomputing a valid checkpoint forever.
            import logging

            logging.getLogger("amp.checkpoint").info(
                "stage %s: legacy manifest without a snapshot id — "
                "accepted as valid; rewrite the stage to upgrade", stage
            )
            return True
        snap, _ = self._snapshot_of(stage)
        return snap == recorded["snapshot"]

    # -- write / read ------------------------------------------------------
    def table_path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def write(self, df: DataFrame, stage: str, started_at: float | None = None) -> DataFrame:
        """Checkpoint a stage: partitioned write + per-partition counters
        + manifest row. Returns the re-read DataFrame so downstream
        stages consume the materialized table (cuts lineage, exactly
        like the reference's table-to-table passes)."""
        t0 = started_at if started_at is not None else time.time()
        path = self.table_path(stage)
        if "run_id" not in df.columns:
            df = df.withColumn("run_id", F.lit(self.run_id))
        df.write.mode("overwrite").partitionBy("run_id").parquet(path)
        back = self.spark.read.parquet(path).where(F.col("run_id") == self.run_id)

        # per-partition lineage counters (north_rule)
        counters = (
            back.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count("*").alias("rows_out"))
        )
        cpath = os.path.join(self.root, "_counters", f"run{self.run_id}_{stage}")
        counters.withColumn("stage", F.lit(stage)).withColumn(
            "run_id", F.lit(self.run_id)
        ).write.mode("overwrite").parquet(cpath)

        rows = back.count()
        snap, files = self._snapshot_of(stage)
        with open(self._manifest_path(stage), "w") as fh:
            json.dump(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "rows": rows,
                    "wall_sec": round(time.time() - t0, 3),
                    "path": path,
                    # Iceberg-shaped: the snapshot id digests the pinned
                    # data-file set (on a real catalog: the table
                    # snapshot id); verify_snapshot() checks it on resume.
                    # The explicit file list is for small-table
                    # inspection only — beyond 64 files the digest +
                    # totals carry the contract without bloating every
                    # manifest() load
                    "snapshot": snap,
                    "n_files": len(files),
                    "n_bytes": sum(f["bytes"] for f in files),
                    "files": files if len(files) <= 64 else None,
                },
                fh,
            )
        return back

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(stage)).where(
            F.col("run_id") == self.run_id
        )

    def stage(self, name: str, thunk) -> DataFrame:
        """Run-or-resume: resume only when the manifest row exists AND
        its snapshot still matches the on-disk file set — a tampered or
        partially-lost checkpoint is recomputed, never silently read."""
        if self.is_done(name):
            if self.verify_snapshot(name):
                return self.read(name)
            import logging

            logging.getLogger("amp.checkpoint").warning(
                "stage %s: manifest snapshot does not match on-disk files; "
                "recomputing instead of resuming",
                name,
            )
        t0 = time.time()
        return self.write(thunk(), name, started_at=t0)
