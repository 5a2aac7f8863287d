"""Streaming KG maintenance: per-micro-batch incremental fusion.

incremental.py streams the stateless FRONT END (extract → mentions → emit) and
historically left the fusion fixpoint batch-only ("it is a whole-graph
fixpoint").  pipeline.fuse_delta removes that constraint: each micro-batch of
triples extends the closed KG via the delta-fed fixpoint, so the fused,
canonicalized, validated graph is maintained continuously instead of being
re-closed from scratch per ingest.

Exactly-once without distributed transactions:

* the streaming checkpoint (``checkpoint_dir``) tracks which input files each
  micro-batch consumed (file-source log, Trigger.AvailableNow);
* fused state is written to a fresh ``state_dir/v{batch_id}`` directory, then
  a one-line pointer file is atomically replaced (``os.replace``) — readers
  never observe a half-written state;
* on crash-replay of a batch whose state already landed (pointer moved but
  the checkpoint commit didn't), the pointer equals ``v{batch_id}`` and the
  batch is skipped outright; a crash BEFORE the pointer swap leaves the
  pointer on the previous version and the replay recomputes ``v{batch_id}``
  from scratch (mode=overwrite clears partial files) — the sink is
  idempotent, which is exactly the property foreachBatch requires.

At crawl scale each increment costs O(|delta|) rule joins (see fuse_delta);
state I/O is one parquet write of the graph per batch — on a real deployment
that becomes an Iceberg/Delta table MERGE, the layout here is the minimal
dependency-free equivalent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from re_shacl_spark.model.triples import TRIPLE_SCHEMA
from re_shacl_spark.pipeline import FusionResult, fuse, fuse_delta

_POINTER = "CURRENT"


def _read_pointer(state_dir: str) -> str | None:
    try:
        with open(os.path.join(state_dir, _POINTER)) as f:
            v = f.read().strip()
        return v or None
    except FileNotFoundError:
        return None


def _write_pointer(state_dir: str, version: str) -> None:
    tmp = os.path.join(state_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(state_dir, _POINTER))


def load_state(spark: SparkSession, state_dir: str) -> FusionResult | None:
    """Current fused state (triples + rep map), or None before the first batch."""
    v = _read_pointer(state_dir)
    if v is None:
        return None
    base = os.path.join(state_dir, v)
    return FusionResult(
        triples=spark.read.parquet(os.path.join(base, "triples")),
        rep_map=spark.read.parquet(os.path.join(base, "rep_map")),
        tbox=None,  # re-derived by fuse_delta from the triples
        rounds=0,
        check_counts={},
    )


def load_violations(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current maintained violations report (shapes-enabled streams only)."""
    v = _read_pointer(state_dir)
    if v is None:
        return None
    path = os.path.join(state_dir, v, "violations")
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def _maintained_report(spark, base, res, prev_violations, shapes):
    """Per-batch violations maintenance: when the batch triggered no
    representative merges (rep-map row count unchanged — every merge adds
    member→rep rows), only the CLOSED delta's affected foci are re-validated
    and spliced into the previous report (validate/incremental.py); any merge
    activity renames foci globally, so the report rebuilds in full."""
    from re_shacl_spark.validate.engine import ValidationReport, validate
    from re_shacl_spark.validate.incremental import validate_delta

    if base is None or prev_violations is None:
        return validate(spark, res.triples, shapes).violations
    if res.rep_map.count() != base.rep_map.count():
        return validate(spark, res.triples, shapes).violations
    old = base.triples
    cond = (
        (F.col("n.s") == F.col("o.s"))
        & (F.col("n.p") == F.col("o.p"))
        & (F.col("n.o") == F.col("o.o"))
        & F.col("n.o_lit").eqNullSafe(F.col("o.o_lit"))
    )
    delta = res.triples.alias("n").join(old.alias("o"), cond, "left_anti")
    prev = ValidationReport(prev_violations, True, len(shapes))
    return validate_delta(spark, old, delta, shapes, prev).violations


def _prune_versions(state_dir: str, retain: int = 2) -> None:
    """Drop superseded state versions (ADVICE r3): every batch writes a full
    new v{batch_id} (triples + rep_map [+ violations]) and swaps the pointer,
    so without pruning disk grows O(batches × |graph|) under continuous
    maintenance.  Only the pointer target and the in-flight write are ever
    needed for the idempotent-replay contract; ``retain`` keeps the newest 2
    (current + immediate predecessor) as a cheap operator-error cushion."""
    import re
    import shutil

    versions = []
    for name in os.listdir(state_dir):
        m = re.fullmatch(r"v(\d+)", name)
        if m and os.path.isdir(os.path.join(state_dir, name)):
            versions.append(int(m.group(1)))
    for bid in sorted(versions)[:-retain] if len(versions) > retain else []:
        shutil.rmtree(os.path.join(state_dir, f"v{bid}"), ignore_errors=True)


def _apply_batch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    shapes=None,
) -> None:
    if _read_pointer(state_dir) == f"v{batch_id}":
        # crash-replay of a fully-applied batch (state landed, checkpoint
        # commit didn't): the pointer only ever moves AFTER a complete state
        # write, so this batch's effect is already durable — skip.  A crash
        # BEFORE the pointer swap leaves the pointer on the previous version
        # and the replay recomputes into v{batch_id} from scratch (overwrite).
        return
    base = load_state(spark, state_dir)
    prev_violations = load_violations(spark, state_dir) if shapes else None
    if base is None:
        res = fuse(spark, batch)
    else:
        res = fuse_delta(spark, base, batch)
    vdir = os.path.join(state_dir, f"v{batch_id}")
    res.triples.write.mode("overwrite").parquet(os.path.join(vdir, "triples"))
    res.rep_map.write.mode("overwrite").parquet(os.path.join(vdir, "rep_map"))
    if shapes:
        report = _maintained_report(spark, base, res, prev_violations, shapes)
        report.write.mode("overwrite").parquet(os.path.join(vdir, "violations"))
    _write_pointer(state_dir, f"v{batch_id}")
    _prune_versions(state_dir)


def run_streaming_fusion(
    spark: SparkSession,
    triples_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files: int = 64,
    shapes=None,
) -> FusionResult:
    """Drain all unseen triple files (Trigger.AvailableNow), folding each
    micro-batch into the fused state; returns the final state.  Re-invocation
    picks up exactly where the checkpoint log left off — the batch analog of
    a continuously-running maintenance query.  With ``shapes`` the versioned
    state also carries a continuously-maintained violations report
    (incremental per merge-free batch, rebuilt on merge activity); read it
    with ``load_violations``."""
    os.makedirs(state_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(TRIPLE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(triples_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: _apply_batch(spark, state_dir, df, bid, shapes=shapes)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = load_state(spark, state_dir)
    assert state is not None, "stream drained but no state was written"
    return state
