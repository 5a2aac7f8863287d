"""Stage checkpoint store with per-partition lineage and resume.

The north rule requires every stage to checkpoint "with per-partition lineage
rows (input split, triple counts, fixpoint iteration) so the job resumes
mid-pipeline".  The reference has no analog (it reruns from scratch; see
/root/reference/run_experiment.py:138-170) — this is new, Spark-native
infrastructure.

Layout under ``base_dir`` (parquet; on a production cluster the same API maps
onto Iceberg tables via ``df.writeTo(...)`` — parquet-dir-per-stage keeps this
sandbox dependency-free while preserving the atomic-commit semantics we rely
on: Spark's _SUCCESS marker == Iceberg snapshot commit):

    <base>/stages/<stage>/          stage output (parquet, _SUCCESS on commit)
    <base>/lineage/<stage>/         lineage rows for that stage

Lineage schema:
    stage string, partition_id int, rows long, meta map<string,string>

A stage is complete iff its _SUCCESS marker exists; ``load`` returns None
otherwise, so a re-run recomputes exactly the incomplete suffix of the DAG.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir.rstrip("/")

    # -- paths ------------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return f"{self.base}/stages/{stage}"

    def _lineage_dir(self, stage: str) -> str:
        return f"{self.base}/lineage/{stage}"

    def _manifest(self, stage: str) -> str:
        return f"{self.base}/stages/{stage}.manifest.json"

    # -- api --------------------------------------------------------------------
    def has(self, stage: str, fingerprint: str | None = None) -> bool:
        """Complete AND (if a fingerprint is given) produced from the same
        inputs.  A manifest fingerprint mismatch means the checkpoint is stale
        (resumed with changed pages/aliases/shapes/seed) and the stage must be
        recomputed — without this, resume silently returns old outputs."""
        if not (
            os.path.exists(f"{self._stage_dir(stage)}/_SUCCESS")
            and os.path.exists(self._manifest(stage))
        ):
            return False
        if fingerprint is None:
            return True
        with open(self._manifest(stage)) as f:
            return json.load(f).get("fingerprint") == fingerprint

    def save(
        self,
        stage: str,
        df: DataFrame,
        meta: dict[str, str] | None = None,
        fingerprint: str | None = None,
    ) -> DataFrame:
        """Write stage output + lineage; returns the re-read (checkpointed)
        frame so downstream plans hang off the files, not the upstream DAG."""
        out = self._stage_dir(stage)
        df.write.mode("overwrite").parquet(out)
        persisted = self.spark.read.parquet(out)

        meta = {k: str(v) for k, v in (meta or {}).items()}
        lineage = (
            persisted.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .select(
                F.lit(stage).alias("stage"),
                F.col("partition_id"),
                F.col("rows"),
                F.create_map(
                    *[x for kv in meta.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
                ).alias("meta")
                if meta
                else F.create_map().cast("map<string,string>").alias("meta"),
            )
        )
        lineage.write.mode("overwrite").parquet(self._lineage_dir(stage))
        # manifest written LAST: a stage is resumable only once lineage exists too
        with open(self._manifest(stage), "w") as f:
            json.dump({"stage": stage, "meta": meta, "fingerprint": fingerprint}, f)
        return persisted

    def load(self, stage: str, fingerprint: str | None = None) -> DataFrame | None:
        if not self.has(stage, fingerprint):
            return None
        return self.spark.read.parquet(self._stage_dir(stage))

    def stage_meta(self, stage: str) -> dict[str, str] | None:
        if not os.path.exists(self._manifest(stage)):
            return None
        with open(self._manifest(stage)) as f:
            return json.load(f)["meta"]

    def lineage(self, stage: str | None = None) -> DataFrame:
        """All lineage rows (or one stage's)."""
        root = f"{self.base}/lineage"
        if stage is not None:
            return self.spark.read.parquet(self._lineage_dir(stage))
        dirs = [
            f"{root}/{d}" for d in sorted(os.listdir(root))
            if os.path.exists(f"{root}/{d}/_SUCCESS")
        ] if os.path.exists(root) else []
        if not dirs:
            return self.spark.createDataFrame(
                [], "stage string, partition_id int, rows long, meta map<string,string>"
            )
        return self.spark.read.parquet(*dirs)

    def run_stage(
        self,
        stage: str,
        build,
        meta: dict[str, str] | None = None,
        force: bool = False,
        fingerprint: str | None = None,
    ) -> DataFrame:
        """Resume-or-compute: return the checkpointed frame if complete (and,
        when a fingerprint is given, input-compatible), otherwise call
        ``build()`` and persist its result."""
        if not force:
            cached = self.load(stage, fingerprint)
            if cached is not None:
                return cached
        return self.save(stage, build(), meta, fingerprint)


def input_fingerprint(*parts) -> str:
    """Deterministic md5 over a json rendering of arbitrary input descriptors
    (alias rows, shape reprs, input file lists, seeds…).  Cheap — no Spark job."""
    import hashlib

    blob = json.dumps([repr(p) for p in parts], sort_keys=True).encode()
    return hashlib.md5(blob).hexdigest()
