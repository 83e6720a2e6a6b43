"""Continuous dedup: Structured Streaming → IncrementalDeduper fold.

The td sibling of streaming/resolve.py — documents land as files, each
micro-batch folds into the standing near-dup state via ``foreachBatch``
(the CC in ``groups()`` is iterative, so a stateful sink is the right
pattern), and the rolling keep-one map is read between batches with
``deduper.groups()``.

Exactly-once: same two layers as the resolver stream — replays of
already-committed folds are skipped by batch_id, and a fold that crashed
midway re-runs into deterministic ``inc=<batch_id>`` overwrite targets
(operators/dedup.py), replacing its partial output.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, types as T

from zentity_spark.io import Storage
from zentity_spark.operators.dedup import IncrementalDeduper

DOC_STREAM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def make_dedup_fold(deduper: IncrementalDeduper):
    """the ``foreachBatch`` body (exported so tests drive the exact
    production code path with a chosen batch_id)."""
    def _fold(batch_df, batch_id: int) -> None:
        if batch_id <= deduper.committed_fold_id():
            return  # replay of an already-committed fold
        batch = batch_df.select("doc_id", "text")
        if batch.isEmpty():
            return
        deduper.fold(batch, fold_id=batch_id)
    return _fold


def stream_dedup(spark: SparkSession, landing_dir: str, state_dir: str,
                 checkpoint_dir: str, available_now: bool = True,
                 max_files_per_trigger: int = 64,
                 storage: Storage | None = None, **tier):
    """start the dedup stream; returns (StreamingQuery, IncrementalDeduper).
    ``tier`` kwargs (k/bands/shingle_w/tau) select the MinHash tier —
    default is the low-background production tier."""
    storage = storage if storage is not None else Storage(spark)
    deduper = IncrementalDeduper(spark, state_dir, storage=storage, **tier)
    src = storage.stream_source(
        DOC_STREAM_SCHEMA, landing_dir,
        maxFilesPerTrigger=str(max_files_per_trigger))
    writer = (src.writeStream
              .foreachBatch(make_dedup_fold(deduper))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q, deduper
