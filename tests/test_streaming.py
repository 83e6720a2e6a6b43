"""Structured Streaming ingest: landing files → deduped docs table
(watermark dedup, exactly-once checkpointing, availableNow catch-up)."""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zentity_spark.streaming.ingest import stream_documents

ARROW_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))),
    ("event_ts", pa.timestamp("us")),
])


def _write_landing(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=ARROW_SCHEMA), path)


def _row(doc_id, text, ts_min):
    return {
        "doc_id": doc_id,
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
        "event_ts": datetime.datetime(2026, 1, 1, 0, ts_min),
    }


@pytest.mark.slow
def test_stream_ingest_dedup_and_resume(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")

    _write_landing(os.path.join(landing, "batch1.parquet"), [
        _row("a-000001", "full_name=kai jon", 0),
        _row("a-000002", "full_name=lee ray", 1),
        _row("a-000001", "full_name=kai jon", 2),      # in-batch dup
    ])
    q = stream_documents(spark, landing, table, ckpt, available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(table)
    assert got.count() == 2                             # dup dropped
    assert set(got.columns) == {"doc_id", "spans"}

    # second micro-batch: one genuinely new doc + an already-seen file is
    # NOT reprocessed (checkpoint exactly-once)
    _write_landing(os.path.join(landing, "batch2.parquet"), [
        _row("a-000003", "full_name=new person", 3),
    ])
    q2 = stream_documents(spark, landing, table, ckpt, available_now=True)
    q2.awaitTermination(120)
    rows = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    assert rows == {"a-000001", "a-000002", "a-000003"}
