from zentity_spark.streaming.ingest import stream_documents

__all__ = ["stream_documents"]
