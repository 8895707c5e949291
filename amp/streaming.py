"""Structured Streaming ingest (beyond-reference capability).

The reference is strictly batch (SURVEY.md §2.9) — its "incremental"
story is run_id-partitioned reprocessing. This module adds the Spark
native continuous form: a stream of repo files is normalized with the
SAME kernel as batch (identical semantics — one code path for both),
and either appended to the records table or matched against a
MatchIndex per micro-batch via foreachBatch.

Local smoke path: parquet-dir source + memory/foreachBatch sink,
driven synchronously with processAllAvailable() in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from . import normalize
from .config import AmpConfig, DEFAULT_CONFIG
from .io import REPO_FILES_SCHEMA


def read_file_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 32) -> DataFrame:
    """Streaming source over a landing directory of parquet files —
    the continuous analog of the reference's staging-table COPY
    (load_csv.go:72-125): files land, each micro-batch picks up
    whatever arrived."""
    return (
        spark.readStream.schema(REPO_FILES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def normalize_stream(stream: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG, run_id: int = 0) -> DataFrame:
    """normalize() is a stateless mapInPandas — it applies to streaming
    DataFrames unchanged (same kernel, same output schema)."""
    return normalize.normalize(stream, cfg, run_id)


def ingest_to_parquet(
    records_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Append-mode sink into the records table; exactly-once via the
    streaming checkpoint (the streaming twin of amp.checkpoint's
    batch manifest)."""
    return (
        records_stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


DEDUP_OUTPUT_SCHEMA = (
    "record_id string, content_sha string, canonical_id string, "
    "is_duplicate boolean"
)
DEDUP_STATE_SCHEMA = "canonical_id string, n_seen long"

# Ships inside Spark 4's JVM — no extra jar. The default HDFS-backed
# provider keeps every state row on the executor HEAP; at 100-TB corpus
# scale (state = one row per distinct content) that balloons executor
# memory. RocksDB keeps state off-heap on executor-local disk with an
# incremental changelog in the streaming checkpoint — the standard
# production configuration for large stateful streams.
ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession) -> None:
    """Switch stateful streaming queries started AFTER this call to the
    RocksDB state store (see ROCKSDB_STATE_PROVIDER). Session-wide conf:
    a query pins its provider at first start and keeps it across
    restarts from the same checkpoint."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_PROVIDER
    )


def dedup_stream(
    records_stream: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Custom STATEFUL streaming operator: continuous exact dedup via
    ``applyInPandasWithState`` keyed by content_sha. State per
    fingerprint = (canonical_id, n_seen); the first record to arrive
    becomes canonical (min record_id within its first micro-batch for
    determinism), every later arrival is emitted flagged
    ``is_duplicate`` with a pointer to the canonical — the streaming
    twin of normalize.exact_edges' star edges. State size is
    O(distinct contents), the same bound as the batch representatives
    table; keys shard across executors by the groupBy hash.

    100-TB state story: run under the RocksDB state store
    (use_rocksdb_state_store — off-heap, disk-backed, changelog in the
    checkpoint) and, for unbounded corpora, set ``state_ttl_ms``:
    fingerprints idle longer than the TTL are EVICTED
    (ProcessingTimeTimeout), bounding state to the active working set.
    Documented tradeoff: a duplicate arriving after its fingerprint was
    evicted is re-admitted as a new canonical — eviction trades
    cross-epoch dedup completeness for bounded state, exactly like a
    windowed dedup."""
    import pandas as pd

    def fn(key, pdfs, state):
        sha = key[0]
        if state.hasTimedOut:
            # TTL eviction: drop the fingerprint; nothing to emit
            state.remove()
            yield pd.DataFrame(
                {
                    "record_id": pd.Series([], dtype="object"),
                    "content_sha": pd.Series([], dtype="object"),
                    "canonical_id": pd.Series([], dtype="object"),
                    "is_duplicate": pd.Series([], dtype="bool"),
                }
            )
            return
        if state.exists:
            canonical, n_seen = state.get
        else:
            canonical, n_seen = None, 0
        # drain ALL Arrow chunks first: a hot fingerprint's micro-batch
        # can arrive split across chunks, and the documented canonical
        # (min record_id within the first micro-batch) must consider
        # every chunk, not just the first
        all_ids: list[str] = []
        for pdf in pdfs:
            all_ids.extend(pdf["record_id"])
        all_ids.sort()
        if canonical is None and all_ids:
            canonical = all_ids[0]
        n_seen += len(all_ids)
        state.update((canonical, n_seen))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {
                "record_id": all_ids,
                "content_sha": sha,
                "canonical_id": canonical,
                "is_duplicate": [rid != canonical for rid in all_ids],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        records_stream.select("record_id", "content_sha")
        .groupBy("content_sha")
        .applyInPandasWithState(
            fn,
            DEDUP_OUTPUT_SCHEMA,
            DEDUP_STATE_SCHEMA,
            "append",
            timeout,
        )
    )


def ingest_stats_stream(
    records_stream: DataFrame,
    window_duration: str = "10 seconds",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Watermarked windowed aggregation over the ingest stream:
    per-(window, lang) record/byte counts with late data bounded by the
    watermark — the standard Structured Streaming shape for ingest
    monitoring counters (the streaming twin of the checkpoint
    manifest's per-stage counters). Uses arrival time: the file-landing
    stream has no domain event time."""
    from pyspark.sql import functions as F

    return (
        records_stream.withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", watermark_delay)
        .groupBy(F.window("ingest_ts", window_duration), "lang")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )


def match_stream(
    stream: DataFrame,
    index,
    on_batch,
    checkpoint_path: str | None = None,
    cfg: AmpConfig = DEFAULT_CONFIG,
) -> StreamingQuery:
    """Continuous matching: every micro-batch of raw files is matched
    against the prebuilt MatchIndex (amp.incremental) and the ranked
    candidates handed to ``on_batch(df, epoch_id)`` — the streaming
    form of the reference's POST /match request loop."""
    from .incremental import match_records

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        on_batch(match_records(index, batch_df, run_id=int(epoch_id) + 1), epoch_id)

    w = stream.writeStream.foreachBatch(handle).outputMode("update")
    if checkpoint_path:
        w = w.option("checkpointLocation", checkpoint_path)
    return w.start()
