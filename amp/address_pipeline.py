"""Reference-shaped address matching, end-to-end — the literal
match.sql pipeline re-expressed in Spark.

Input records mirror `customer_matching` (scripts/init_db.sql:54-65):
(customer_id int, first_name, last_name, phone_number, street, city,
state, zip_code string, run_id int). run_id = 0 is the candidate space;
run_id > 0 a query batch — exactly the reference's partition semantics
(match.sql:30-31).

The blocking join `(c.state=i.state OR c.zip=i.zip) AND (c.zip=i.zip OR
c.city=i.city OR c.phone=i.phone)` (match.sql:22-25) is logically
`zip=zip OR (state=state AND city=city) OR (state=state AND
phone=phone)`; Catalyst would execute the OR form as a
BroadcastNestedLoopJoin (O(n*m)), so it is rewritten as THREE equi-join
passes unioned + deduplicated — same pair set, all hash/sort-merge
joins (SURVEY.md §2.3 J1).

Scoring follows matcher.go:119-211: pgvector cosine distance ->
hashing-trick embedding cosine distance (spaCy is a model download;
same record->vector->distance semantics); tfidf dot over per-field
trigram postings (match.sql:65-75, quirks preserved: unsmoothed idf,
missing-token weight 0); six per-field bigram frequency cosines +
binary-key flag + weighted composite clamped to [1,100].
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .reference_parity import (
    REFERENCE_ENTITIES,
    WEIGHTS,
    calculate_binary_key,
    ngram_frequency_similarity,
    ngrams,
    standardize_address,
)

FIELDS = ["first_name", "last_name", "phone_number", "street", "city", "state", "zip_code"]


def _lowered(records: DataFrame) -> DataFrame:
    """P1: every text field lowercased at ingest (shared.go:194-195)."""
    out = records
    for f in FIELDS:
        out = out.withColumn(f, F.lower(F.coalesce(F.col(f), F.lit(""))))
    return out


# ---------------------------------------------------------------------------
# J1 rewrite: OR-of-equalities -> union of equi-join passes
# ---------------------------------------------------------------------------

def blocking_pairs(
    candidates: DataFrame, queries: DataFrame, exclude_empty_keys: bool = True
) -> DataFrame:
    """(query_id, candidate_id) pairs per the match.sql:22-25 predicate,
    as three equi-join passes.

    ``exclude_empty_keys`` (default True) is a DOCUMENTED DEVIATION from
    the literal Postgres predicate: `'' = ''` matches there, so two
    empty-phone records sharing a state would pair. Empty-string keys
    are excluded from the equality passes they'd otherwise hot-spot (an
    all-'' phone column must not become a mega-block at scale) — pairs
    whose only link is an empty attribute are not meaningful blocks.
    Pass False for exact literal parity (tested both ways in
    tests/test_address_pipeline.py)."""
    q = queries.select(
        F.col("customer_id").alias("query_id"), "state", "zip_code", "city", "phone_number"
    )
    c = candidates.select(
        F.col("customer_id").alias("candidate_id"), "state", "zip_code", "city", "phone_number"
    )

    def pas(cols: list[str]):
        qq, cc = q, c
        if exclude_empty_keys:
            for col in cols:
                qq = qq.where(F.col(col) != "")
                cc = cc.where(F.col(col) != "")
        return qq.join(cc, cols).select("query_id", "candidate_id")

    pairs = (
        pas(["zip_code"])
        .unionByName(pas(["state", "city"]))
        .unionByName(pas(["state", "phone_number"]))
    )
    return pairs.dropDuplicates(["query_id", "candidate_id"])


# ---------------------------------------------------------------------------
# feature kernels (Arrow-batched; the reference's Go worker pools)
# ---------------------------------------------------------------------------

def _embed(text: str, dim: int = 64) -> np.ndarray:
    import zlib

    v = np.zeros(dim, dtype=np.float64)
    for t in text.split():
        h = zlib.crc32(t.encode())
        v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def record_features(records: DataFrame, refs: list[str] | None = None) -> DataFrame:
    """One pass per record: standardized street (F1), 10-bit binary key
    vs the anchor strings (F7, shared.go:79-101), embedding (F12
    semantics), and the per-field trigram tf map used for the tfidf dot
    (make_tf_idf.go:242-286 — entity_type 2 = 'first last' name text,
    1 = standardized street)."""
    refs = refs if refs is not None else REFERENCE_ENTITIES

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            std_streets, bin_keys, embs = [], [], []
            name_toks, name_tfs, street_toks, street_tfs = [], [], [], []
            for first, last, street, city, state, zipc, phone in zip(
                pdf["first_name"], pdf["last_name"], pdf["street"], pdf["city"],
                pdf["state"], pdf["zip_code"], pdf["phone_number"],
            ):
                std = standardize_address(street)
                std_streets.append(std)
                bin_keys.append(calculate_binary_key(std, refs))
                embs.append(
                    _embed(" ".join((first, last, std, city, state, zipc, phone)))
                )
                # per-field trigram term frequencies (tf = count/len;
                # make_tf_idf.go:242-255). NB trigrams here keep spaces
                # (generateTrigrams runs on the raw lowered text, F4)
                for text, toks_out, tfs_out in (
                    (f"{first} {last}", name_toks, name_tfs),
                    (std, street_toks, street_tfs),
                ):
                    tri = (
                        [text] if len(text) < 3
                        else [text[i : i + 3] for i in range(len(text) - 2)]
                    )
                    from collections import Counter

                    cnt = Counter(tri)
                    n = len(tri)
                    toks_out.append(list(cnt.keys()))
                    tfs_out.append([v / n for v in cnt.values()])
            yield pd.DataFrame(
                {
                    "customer_id": pdf["customer_id"],
                    "std_street": std_streets,
                    "binary_key": bin_keys,
                    "embedding": embs,
                    "name_tokens": name_toks,
                    "name_tf": name_tfs,
                    "street_tokens": street_toks,
                    "street_tf": street_tfs,
                }
            )

    feat_schema = (
        "customer_id int, std_street string, binary_key string, "
        "embedding array<double>, name_tokens array<string>, name_tf array<double>, "
        "street_tokens array<string>, street_tf array<double>"
    )
    return records.select("customer_id", *FIELDS).mapInPandas(fn, feat_schema)


def idf_maps(cand_features: DataFrame, n_docs: int) -> dict[str, dict[str, float]]:
    """IDF over the run-0 corpus only (generateCandidateIDF,
    make_tf_idf.go:75-168): idf = ln(N/df), unsmoothed; per-field
    namespaces (entity_type 2 = name, 1 = street)."""
    import math

    out: dict[str, dict[str, float]] = {}
    for fld in ("name", "street"):
        df_tbl = (
            cand_features.select(
                "customer_id", F.explode(F.array_distinct(F.col(f"{fld}_tokens"))).alias("t")
            )
            .groupBy("t")
            .count()
            .toPandas()
        )
        out[fld] = {
            t: math.log(n_docs / c) for t, c in zip(df_tbl["t"], df_tbl["count"])
        }
    return out


# ---------------------------------------------------------------------------
# the match query (match.sql) + Go post-loop (matcher.go)
# ---------------------------------------------------------------------------

def find_potential_matches(
    candidates: DataFrame,
    queries: DataFrame,
    top_n: int = 10,
    similarity_threshold: float = 0.12,
    global_truncate: bool = False,
) -> DataFrame:
    """The full reference match: blocking join -> embedding cosine
    distance filter (match.sql:79 `similarity <= 0.12`) -> binary-key
    flag (match.sql:33-43,64) -> tfidf dot (match.sql:65) -> rank by
    similarity (match.sql:66) -> six bigram cosines + composite score
    (matcher.go:171-208) -> top-N (matcher.go:221-228; the reference
    truncates GLOBALLY — set global_truncate=True for exact parity on
    single-record requests, default is the distributed per-query form).
    """
    spark = candidates.sparkSession
    cand = _lowered(candidates)
    qry = _lowered(queries)

    cand_feat = record_features(cand).localCheckpoint(eager=True)
    idf = idf_maps(cand_feat, cand_feat.count())
    qry_feat = record_features(qry).localCheckpoint(eager=True)
    idf_b = spark.sparkContext.broadcast(idf)

    pairs = blocking_pairs(cand, qry)

    qf = qry_feat.select(
        F.col("customer_id").alias("query_id"),
        F.col("binary_key").alias("q_bin"),
        F.col("embedding").alias("q_emb"),
        F.col("name_tokens").alias("q_nt"), F.col("name_tf").alias("q_ntf"),
        F.col("street_tokens").alias("q_st"), F.col("street_tf").alias("q_stf"),
    )
    cf = cand_feat.select(
        F.col("customer_id").alias("candidate_id"),
        F.col("binary_key").alias("c_bin"),
        F.col("embedding").alias("c_emb"),
        F.col("name_tokens").alias("c_nt"), F.col("name_tf").alias("c_ntf"),
        F.col("street_tokens").alias("c_st"), F.col("street_tf").alias("c_stf"),
    )
    joined = pairs.join(qf, "query_id").join(cf, "candidate_id")

    def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idf_local = idf_b.value
        for pdf in batches:
            n = len(pdf)
            sim = np.zeros(n); dot = np.zeros(n); bin_match = np.zeros(n, dtype=bool)
            shared = np.zeros(n, dtype=bool)
            for i in range(n):
                # pgvector cosine DISTANCE (match.sql:21)
                sim[i] = 1.0 - float(np.dot(pdf["q_emb"].iat[i], pdf["c_emb"].iat[i]))
                bin_match[i] = pdf["q_bin"].iat[i] == pdf["c_bin"].iat[i]
                # tfidf dot: SUM over shared (entity_type, token) of
                # q.tfidf * c.tfidf (match.sql:65,71-75)
                d = 0.0
                any_shared = False
                for fld, qt, qtf, ct, ctf in (
                    ("name", "q_nt", "q_ntf", "c_nt", "c_ntf"),
                    ("street", "q_st", "q_stf", "c_st", "c_stf"),
                ):
                    fidf = idf_local[fld]
                    cw = {
                        t: tf * fidf.get(t, 0.0)
                        for t, tf in zip(pdf[ct].iat[i], pdf[ctf].iat[i])
                    }
                    for t, tf in zip(pdf[qt].iat[i], pdf[qtf].iat[i]):
                        if t in cw:
                            any_shared = True
                            d += tf * fidf.get(t, 0.0) * cw[t]
                dot[i] = d
                shared[i] = any_shared
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "candidate_id": pdf["candidate_id"],
                    "similarity": sim,
                    "bin_key_match": bin_match,
                    "tfidf_score": dot,
                    "has_shared_token": shared,
                }
            )

    matched = (
        joined.mapInPandas(
            score_fn,
            "query_id int, candidate_id int, similarity double, "
            "bin_key_match boolean, tfidf_score double, has_shared_token boolean",
        )
        .where(F.col("similarity") <= similarity_threshold)
        # match.sql:68-75 INNER joins customer_tokens per side: a pair
        # sharing zero (entity_type, token) never reaches the result —
        # not retained with tfidf_score=0
        .where(F.col("has_shared_token"))
        .drop("has_shared_token")
    )

    # match.sql:66 RANK() OVER (ORDER BY similarity) — ties share a rank
    # (no hidden candidate_id tie-break), partitioned per query because
    # the reference runs one query record per statement
    w = Window.partitionBy("query_id").orderBy(F.asc("similarity"))
    matched = matched.withColumn("rank", F.rank().over(w))

    # re-attach the raw fields for the Go-side cosines (matcher.go:160-177)
    q_cols = qry.select(
        F.col("customer_id").alias("query_id"),
        *[F.col(f).alias(f"input_{f}") for f in FIELDS],
    )
    c_cols = cand.select(
        F.col("customer_id").alias("candidate_id"),
        *[F.col(f).alias(f"candidate_{f}") for f in FIELDS],
    )
    full = matched.join(q_cols, "query_id").join(c_cols, "candidate_id")

    def cosine_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            cos = {f: np.zeros(n) for f in ("first_name", "last_name", "street", "city", "phone_number", "zip_code")}
            score = np.zeros(n)
            for i in range(n):
                for f in cos:
                    cos[f][i] = ngram_frequency_similarity(
                        pdf[f"input_{f}"].iat[i], pdf[f"candidate_{f}"].iat[i], 2
                    )
                s = (
                    (1.0 - pdf["similarity"].iat[i]) * WEIGHTS["similarity"]
                    + pdf["tfidf_score"].iat[i] * WEIGHTS["tfidf"]
                    + cos["first_name"][i] * WEIGHTS["firstName"]
                    + cos["last_name"][i] * WEIGHTS["lastName"]
                    + cos["street"][i] * WEIGHTS["street"]
                    + cos["city"][i] * WEIGHTS["city"]
                    + cos["phone_number"][i] * WEIGHTS["phoneNumber"]
                    + cos["zip_code"][i] * WEIGHTS["zipCode"]
                    + (1.0 if pdf["bin_key_match"].iat[i] else 0.0) * WEIGHTS["binKeyMatch"]
                )
                score[i] = max(1.0, min(100.0, s * 100.0))
            out = pdf[[c for c in pdf.columns]].copy()
            for f, arr in cos.items():
                out[f"trigram_cosine_{f}"] = arr
            out["score"] = score
            yield out

    out_schema = (
        ",".join(f"{f.name} {f.dataType.simpleString()}" for f in full.schema.fields)
        + ", trigram_cosine_first_name double, trigram_cosine_last_name double"
        + ", trigram_cosine_street double, trigram_cosine_city double"
        + ", trigram_cosine_phone_number double, trigram_cosine_zip_code double"
        + ", score double"
    )
    scored = full.mapInPandas(cosine_fn, out_schema)

    if global_truncate:
        return scored.orderBy(F.desc("score")).limit(top_n)
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("candidate_id"))
    return (
        scored.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= top_n)
        .drop("rn")
        .orderBy("query_id", "similarity")  # match.sql:100
    )
