"""Continuous resolution: Structured Streaming → IncrementalResolver fold.

Documents land as parquet files (the sink of streaming/ingest.py); each
micro-batch folds into the incremental state via ``foreachBatch`` — the
standard Spark pattern for stateful sinks the built-in operators can't
express (the CC merge is iterative).  Exactly-once per file via the
stream checkpoint; the resolver state itself is idempotent per doc_id
(globally-unique ids, the ingest dedup's contract).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from zentity_spark.model import Model
from zentity_spark.operators.incremental import IncrementalResolver
from zentity_spark.streaming.ingest import SPAN_SCHEMA  # noqa: F401
from zentity_spark.streaming.ingest import STREAM_SCHEMA


def stream_resolve(spark: SparkSession, landing_dir: str, state_dir: str,
                   model: Model, checkpoint_dir: str,
                   scope=None, block_cap: int = 1000,
                   available_now: bool = True,
                   max_files_per_trigger: int = 64):
    """start the folding stream; returns (StreamingQuery, IncrementalResolver).

    ``available_now=True`` drains the current backlog then stops (the test
    / catch-up mode); False runs continuously.  Read the rolling result via
    ``resolver.clusters()`` between (or after) micro-batches."""
    resolver = IncrementalResolver(spark, model, state_dir,
                                   scope=scope, block_cap=block_cap)

    def _fold(batch_df, _batch_id: int) -> None:
        batch = batch_df.select("doc_id", "spans")
        if batch.isEmpty():
            return
        resolver.add(batch)

    src = (spark.readStream.schema(STREAM_SCHEMA)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .parquet(landing_dir))
    writer = (src.writeStream
              .foreachBatch(_fold)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q, resolver
