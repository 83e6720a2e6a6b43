"""Continuous resolution: Structured Streaming → IncrementalResolver fold.

Documents land as files (the sink of streaming/ingest.py); each
micro-batch folds into the incremental state via ``foreachBatch`` — the
standard Spark pattern for stateful sinks the built-in operators can't
express (the CC merge is iterative).

Exactly-once (ADVICE r3 medium): Structured Streaming replays a
micro-batch after any failure with the SAME batch_id and rows, so the
fold must be idempotent under replay.  Two layers guarantee it:
  * a replayed batch whose fold already COMMITTED is skipped outright
    (``batch_id <= resolver.committed_fold_id()``), covering the crash
    window between fold commit and stream-checkpoint commit;
  * a fold that crashed MIDWAY re-runs with the same ``fold_id`` and
    every per-increment write targets a deterministic ``inc=<fold_id>``
    directory in overwrite mode (operators/incremental.py), replacing the
    partial output instead of appending duplicates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from zentity_spark.io import Storage
from zentity_spark.model import Model
from zentity_spark.operators.incremental import IncrementalResolver
from zentity_spark.streaming.ingest import SPAN_SCHEMA  # noqa: F401
from zentity_spark.streaming.ingest import STREAM_SCHEMA


def make_fold(resolver: IncrementalResolver):
    """the ``foreachBatch`` body: fold a micro-batch into the resolver
    state, skipping replays of already-committed folds (exported so tests
    can drive the exact production code path with a chosen batch_id)."""
    def _fold(batch_df, batch_id: int) -> None:
        if batch_id <= resolver.committed_fold_id():
            return  # replay of an already-committed fold
        batch = batch_df.select("doc_id", "spans")
        if batch.isEmpty():
            return
        resolver.add(batch, fold_id=batch_id)
    return _fold


def stream_resolve(spark: SparkSession, landing_dir: str, state_dir: str,
                   model: Model, checkpoint_dir: str,
                   scope=None, block_cap: int = 1000,
                   available_now: bool = True,
                   max_files_per_trigger: int = 64,
                   storage: Storage | None = None):
    """start the folding stream; returns (StreamingQuery, IncrementalResolver).

    ``available_now=True`` drains the current backlog then stops (the test
    / catch-up mode); False runs continuously.  Read the rolling result via
    ``resolver.clusters()`` between (or after) micro-batches."""
    storage = storage if storage is not None else Storage(spark)
    resolver = IncrementalResolver(spark, model, state_dir,
                                   scope=scope, block_cap=block_cap,
                                   storage=storage)
    _fold = make_fold(resolver)

    src = storage.stream_source(
        STREAM_SCHEMA, landing_dir,
        maxFilesPerTrigger=str(max_files_per_trigger))
    writer = (src.writeStream
              .foreachBatch(_fold)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q, resolver
