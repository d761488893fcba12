"""Structured-Streaming ingestion: near-real-time incremental indexing.

A file-source stream watches a directory for new page parquet drops (the
continuous-crawl pattern); each micro-batch appends a segment to the index
via incremental.append_pages (foreachBatch — the index append is a batch
job, exactly-once per epoch via the streaming checkpoint). Queries pick up
new segments on the next IndexReader open; WAND should use
recompute_bounds=True until the next compaction (see incremental.py).

Compaction = a fresh build_index over the full corpus: restores the
docid==url-rank invariant and tight block bounds.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .corpus import PAGES_SCHEMA
from .index.incremental import append_pages


def stream_index(spark: SparkSession, watch_dir: str, index_dir: str,
                 checkpoint_dir: str, available_now: bool = True,
                 processing_interval: str = "30 seconds"):
    """Start the ingestion stream; returns the StreamingQuery.
    available_now=True drains what's there and stops (batch-test mode);
    False runs continuously on a trigger interval."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(watch_dir)
    )

    def sink(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        m = append_pages(spark, index_dir, batch_df)
        print(f"[stream_index] epoch={epoch_id} appended={m.get('appended')}")

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()
