"""Stage 4 — pairwise scoring.

The reference scores each candidate pair with six per-field n-gram
frequency cosines + a pgvector cosine + the tf-idf dot, then combines
them with fixed weights and clamps to [1,100]
(internal/matcher/matcher.go:160-208, match.sql:21,65). Same shape
here, re-targeted at code records:

  feature            reference analog                       where computed
  tfidf_cosine       tfidf_score (match.sql:65)             postings join (features.pair_tfidf)
  jaccard_est        binary-key match (shared.go:79-101)    JVM zip_with over MinHash sigs
  emb_cosine         pgvector <=> (match.sql:21)            JVM zip_with dot (unit vectors)
  path_jw            trigram_cosine_first/last_name         pandas UDF (batched Jaro-Winkler)
  path_lev_sim       —  (north_rule requires Levenshtein)   built-in F.levenshtein
  lang_match         state/zip equality attrs               column expression

Only Jaro-Winkler needs Python at all, and it runs as ONE Arrow-batched
pandas UDF; everything else stays inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import AmpConfig, DEFAULT_CONFIG


# ---------------------------------------------------------------------------
# Jaro-Winkler — classic Winkler variant (boost only when jaro > 0.7,
# prefix capped at 4, weight 0.1), matching DuckDB's
# jaro_winkler_similarity so the oracle comparison is exact.
# ---------------------------------------------------------------------------

def jaro(s1: str, s2: str) -> float:
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    m = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(len2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, threshold: float = 0.7) -> float:
    j = jaro(s1, s2)
    if j > threshold:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j += prefix * prefix_weight * (1.0 - j)
    return j


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    a = s1.fillna("")
    b = s2.fillna("")
    return pd.Series([jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64")


# ---------------------------------------------------------------------------
# feature assembly + composite
# ---------------------------------------------------------------------------

def side_features(reps: DataFrame, sigs: DataFrame, embs: DataFrame) -> DataFrame:
    """Per-representative scoring features, joined once on record_id.
    Downstream, pairs join this table twice (left/right side) — the
    Spark replacement for the reference's per-side index lookups
    (match.sql:26-29): no index, so denormalize."""
    return (
        reps.select("record_id", "stem", "lang")
        .join(sigs, "record_id")
        .join(embs, "record_id")
    )


def _dot_expr(l: str, r: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({l}, {r}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _sig_agreement_expr(l: str, r: str) -> F.Column:
    """MinHash Jaccard estimate: fraction of agreeing signature positions."""
    return F.expr(
        f"aggregate(zip_with({l}, {r}, (x, y) -> CASE WHEN x = y THEN 1.0D ELSE 0.0D END), "
        f"0.0D, (acc, v) -> acc + v) / cast(size({l}) as double)"
    )


def score_pairs(
    pairs: DataFrame,
    sides: DataFrame,
    pair_tfidf: DataFrame,
    cfg: AmpConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """candidate pairs -> scored pairs.

    Output: left_id, right_id, tfidf_dot, tfidf_cosine, jaccard_est,
    emb_cosine, path_jw, path_lev_sim, lang_match, score (composite in
    [0,1]), score_100 (reference-style clamp to [1,100],
    matcher.go:208)."""
    lhs = sides.select(
        F.col("record_id").alias("left_id"),
        F.col("stem").alias("l_stem"),
        F.col("lang").alias("l_lang"),
        F.col("sig").alias("l_sig"),
        F.col("embedding").alias("l_emb"),
    )
    rhs = sides.select(
        F.col("record_id").alias("right_id"),
        F.col("stem").alias("r_stem"),
        F.col("lang").alias("r_lang"),
        F.col("sig").alias("r_sig"),
        F.col("embedding").alias("r_emb"),
    )
    feat = (
        pairs.join(lhs, "left_id")
        .join(rhs, "right_id")
        .join(pair_tfidf, ["left_id", "right_id"], "left")
        .withColumn("tfidf_dot", F.coalesce(F.col("tfidf_dot"), F.lit(0.0)))
        .withColumn(
            "tfidf_cosine",
            F.coalesce(F.nanvl(F.col("tfidf_cosine"), F.lit(0.0)), F.lit(0.0)),
        )
        .withColumn("jaccard_est", _sig_agreement_expr("l_sig", "r_sig"))
        .withColumn("emb_cosine", F.coalesce(_dot_expr("l_emb", "r_emb"), F.lit(0.0)))
        .withColumn("path_jw", jaro_winkler_udf(F.col("l_stem"), F.col("r_stem")))
        .withColumn(
            "path_lev_sim",
            F.lit(1.0)
            - F.levenshtein("l_stem", "r_stem")
            / F.greatest(F.length("l_stem"), F.length("r_stem"), F.lit(1)),
        )
        .withColumn(
            "lang_match", (F.col("l_lang") == F.col("r_lang")).cast("double")
        )
    )
    composite = (
        F.col("tfidf_cosine") * cfg.w_token_cosine
        + F.col("jaccard_est") * cfg.w_shingle_jaccard
        + F.col("emb_cosine") * cfg.w_emb_cosine
        + F.col("path_jw") * cfg.w_path_jw
        + F.col("path_lev_sim") * cfg.w_path_lev
        + F.col("lang_match") * cfg.w_lang_match
    )
    return feat.select(
        "left_id",
        "right_id",
        "tfidf_dot",
        "tfidf_cosine",
        "jaccard_est",
        "emb_cosine",
        "path_jw",
        "path_lev_sim",
        "lang_match",
        composite.alias("score"),
        # reference composite clamp (matcher.go:208): max(1, min(100, 100*s))
        F.greatest(F.lit(1.0), F.least(F.lit(100.0), composite * 100.0)).alias(
            "score_100"
        ),
    )
