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
