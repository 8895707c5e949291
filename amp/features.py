"""Stage 3 — features: TF-IDF postings, IDF dictionary, embeddings.

Reference parity (SURVEY.md §2.4/§2.8):
  * postings layout mirrors `customer_tokens` (scripts/init_db.sql:87-96):
    exploded (record_id, field, token, tfidf) rows — the idiomatic Spark
    sparse-vector representation.
  * idf = ln(N / df), UNSMOOTHED (internal/matcher/make_tf_idf.go:66-72);
    token missing from the dictionary weighs 0 (Go map zero-value
    semantics, make_tf_idf.go:268-270).
  * tf = token count / tokens in doc (make_tf_idf.go:242-255).
  * per-field token namespaces replace the reference's entity_type_id
    (1=street, 2=name; make_tf_idf.go:256-282).
  * the pair score SUM(l.tfidf * r.tfidf) (match.sql:65) is kept as
    `tfidf_dot`, plus the properly normalized `tfidf_cosine`.
  * embedding: the reference shells out to spaCy for a 300-d mean
    word vector (python-ml/generate_embeddings.py:43-67). Same
    semantics — record -> fixed-dim dense vector, order-insensitive sum
    of per-token vectors — via the signed hashing trick (public
    technique; no model download), in ONE vectorized pandas UDF.

The IDF dictionary is a small aggregate (vocabulary-sized, not
corpus-sized) and is broadcast into the postings join — the
north_rule's "broadcast of frequency dictionaries".
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import AmpConfig, DEFAULT_CONFIG


def term_counts(reps: DataFrame) -> DataFrame:
    """(record_id, field, token, cnt, n_doc_tokens) — exploded postings.

    fields: 'content' = code token unigrams; 'path' = char trigrams of
    the basename (reference: trigrams over name/street,
    make_tf_idf.go:53-63)."""
    content = (
        reps.select("record_id", F.explode("tokens").alias("token"))
        .withColumn("field", F.lit("content"))
    )
    # char trigrams of basename, JVM-side: substrings via sequence/transform
    path = (
        reps.select(
            "record_id",
            F.expr(
                "explode(CASE WHEN length(basename) < 3 THEN array(basename) "
                "ELSE transform(sequence(1, length(basename) - 2), "
                "i -> substring(basename, i, 3)) END)"
            ).alias("token"),
        )
        .withColumn("field", F.lit("path"))
    )
    toks = content.unionByName(path)
    counts = toks.groupBy("record_id", "field", "token").agg(F.count("*").alias("cnt"))
    doc_len = counts.groupBy("record_id", "field").agg(F.sum("cnt").alias("n_doc_tokens"))
    return counts.join(doc_len, ["record_id", "field"])


def idf_dict(counts: DataFrame, n_docs: int, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """df = docs containing token (per field); idf = ln(N/df) unsmoothed."""
    df_tbl = counts.groupBy("field", "token").agg(
        F.countDistinct("record_id").alias("df")
    )
    denom = (F.col("df") + F.lit(1)) if cfg.idf_smoothing else F.col("df")
    return df_tbl.withColumn(
        "idf", F.log(F.lit(float(n_docs)) / denom.cast("double"))
    )


def postings(counts: DataFrame, idf: DataFrame) -> DataFrame:
    """(record_id, field, token, tf, tfidf, norm) — norm is the
    per-(record, field) L2 norm of the tfidf vector, carried on every
    posting so cosine needs no extra join at scoring time."""
    from pyspark.sql import Window

    p = (
        counts.join(F.broadcast(idf), ["field", "token"], "left")
        .withColumn("tf", F.col("cnt") / F.col("n_doc_tokens"))
        .withColumn("tfidf", F.col("tf") * F.coalesce(F.col("idf"), F.lit(0.0)))
        .select("record_id", "field", "token", "tf", "tfidf")
    )
    w = Window.partitionBy("record_id", "field")
    return p.withColumn("norm", F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf")).over(w)))


def pair_tfidf(pairs: DataFrame, post: DataFrame, field: str = "content") -> DataFrame:
    """A1 / J4 (match.sql:65-75): grouped SUM of tfidf products over the
    shared tokens of each candidate pair, via two equi-joins through the
    postings table. Emits both the reference's unnormalized dot and the
    normalized cosine."""
    pl = post.where(F.col("field") == field).select(
        F.col("record_id").alias("left_id"),
        F.col("token"),
        F.col("tfidf").alias("l_tfidf"),
        F.col("norm").alias("l_norm"),
    )
    pr = post.where(F.col("field") == field).select(
        F.col("record_id").alias("right_id"),
        F.col("token"),
        F.col("tfidf").alias("r_tfidf"),
        F.col("norm").alias("r_norm"),
    )
    joined = pairs.join(pl, "left_id").join(pr, ["right_id", "token"])
    return joined.groupBy("left_id", "right_id").agg(
        F.sum(F.col("l_tfidf") * F.col("r_tfidf")).alias("tfidf_dot"),
        (
            F.sum(F.col("l_tfidf") * F.col("r_tfidf"))
            / (F.first("l_norm") * F.first("r_norm"))
        ).alias("tfidf_cosine"),
    )


def doc_tfidf(docs: DataFrame) -> DataFrame:
    """TF-IDF postings over a documents(doc_id, text) table — the
    oracle-facing twin of postings(): tf = count/len, idf = ln(N/df)
    unsmoothed (reference make_tf_idf.go:66-72)."""
    from .text import tokens_col

    toks = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    counts = toks.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    doclen = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    df_tbl = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    return (
        counts.join(doclen, "doc_id")
        .join(F.broadcast(df_tbl), "token")
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("c") / F.col("n"))
                * F.log(F.lit(float(n_docs)) / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )


def doc_pair_dot(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Grouped SUM of tfidf products over shared tokens of each pair
    (match.sql:65-75 shape, over the documents table)."""
    post = doc_tfidf(docs)
    pl = post.select(
        F.col("doc_id").alias("left_id"), "token", F.col("tfidf").alias("lt")
    )
    pr = post.select(
        F.col("doc_id").alias("right_id"), "token", F.col("tfidf").alias("rt")
    )
    return (
        pairs.join(pl, "left_id")
        .join(pr, ["right_id", "token"])
        .groupBy("left_id", "right_id")
        .agg(F.round(F.sum(F.col("lt") * F.col("rt")), 6).alias("tfidf_dot"))
    )


# ---------------------------------------------------------------------------
# hashing-trick embeddings
# ---------------------------------------------------------------------------

def _embed_batchfn(dim: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros((len(pdf), dim), dtype=np.float32)
            for i, toks in enumerate(pdf["tokens"]):
                if toks is None or len(toks) == 0:
                    continue
                v = np.zeros(dim, dtype=np.float32)
                for t in toks:
                    h = zlib.crc32(t.encode())
                    idx = h % dim
                    sign = 1.0 if (h >> 16) & 1 else -1.0
                    v[idx] += sign
                n = float(np.linalg.norm(v))
                if n > 0:
                    v /= n
                out[i] = v
            yield pd.DataFrame(
                {"record_id": pdf["record_id"], "embedding": list(out)}
            )

    return fn


def embeddings(reps: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """record_id -> unit-norm array<float> embedding (signed hashing
    trick over content tokens). Arrow-batched; no per-row Python UDFs."""
    schema = T.StructType(
        [
            T.StructField("record_id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return reps.select("record_id", "tokens").mapInPandas(
        _embed_batchfn(cfg.emb_dim), schema=schema
    )
