"""Structured Streaming ingest into the interleaved documents table.

The reference has NO streaming subsystem — it is a stateless request-time
plugin (SURVEY §3(b): streaming = absent).  This module is our additive
scale path: continuous document arrival feeds the batch resolution
pipeline's input table.

Design:
  * ``readStream`` over a landing directory of parquet files with the
    interleaved schema ``(doc_id, spans)``, optionally with an ``event_ts``
    column for late-data handling;
  * watermark + ``dropDuplicates`` on doc_id bounds dedup state (exactly
    the `docIds`-set role of the reference's hop loop, SURVEY row 23, but
    windowed so state can't grow unboundedly at 10^12-doc scale);
  * append sink partitioned for downstream resolution; the checkpoint
    location makes ingest exactly-once per file.

Incremental resolution at scale: re-resolve only blocks whose key sets
gained members since the last run — the blocking-key table is keyed by
(attr, key), so the delta join is an equi-join of new keys against the
key table, then a bounded re-clustering of the touched components.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F, types as T

from zentity_spark.io import Storage

SPAN_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
]))

STREAM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", SPAN_SCHEMA),
    T.StructField("event_ts", T.TimestampType()),
])


def stream_documents(spark: SparkSession, landing_dir: str, table_dir: str,
                     checkpoint_dir: str, watermark: str = "10 minutes",
                     available_now: bool = False,
                     storage: Storage | None = None):
    """landing files → deduped append stream into the docs table.

    Returns the started ``StreamingQuery``.  ``available_now=True``
    processes the current backlog and stops (test/batch-catchup mode);
    otherwise the query runs continuously.  Source/sink formats come from
    ``storage`` (plain parquet offline; Iceberg by config — io.Storage).
    """
    storage = storage if storage is not None else Storage(spark)
    src = storage.stream_source(STREAM_SCHEMA, landing_dir,
                                maxFilesPerTrigger="64")
    deduped = (
        src.withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(["doc_id"])
        .select("doc_id", "spans")
    )
    writer = storage.stream_sink(deduped, table_dir,
                                 checkpoint_dir).outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
