"""Stage 5 — threshold, rank window, per-input top-k.

Reference parity:
  P4  similarity threshold filter       match.sql:79
  W1  RANK() OVER (PARTITION BY input)  match.sql:66
  W2  top-N truncation                  matcher.go:221-228 — NB the
      reference truncates GLOBALLY across the whole response; the
      distributed semantics here is per-input top-k (the right
      behavior), with `global_top_n` provided for exact parity on
      single-record requests.
  O1  ORDER BY input, similarity        match.sql:100
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .config import AmpConfig, DEFAULT_CONFIG


def threshold_edges(scored: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """Scored pairs -> match edges for clustering."""
    return (
        scored.where(F.col("score") >= cfg.score_threshold)
        .select("left_id", "right_id")
        .withColumn("pass_name", F.lit("scored"))
    )


def rank_candidates(scored: DataFrame) -> DataFrame:
    """W1: rank per left record by descending composite score."""
    w = Window.partitionBy("left_id").orderBy(F.desc("score"), F.asc("right_id"))
    return scored.withColumn("rank", F.rank().over(w))


def top_k(scored: DataFrame, k: int | None = None, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """W2 (distributed form): per-input top-k via row_number window."""
    k = k if k is not None else cfg.top_k
    w = Window.partitionBy("left_id").orderBy(F.desc("score"), F.asc("right_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def global_top_n(scored: DataFrame, n: int) -> DataFrame:
    """Exact reference semantics (matcher.go:226-228): one global sort +
    truncate. Only for small request-scoped outputs — a global sort of
    the full pair table would be a single-reducer bottleneck at scale."""
    return scored.orderBy(F.desc("score"), "left_id", "right_id").limit(n)
