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
    """(record_id, field, token, cnt, n_doc_tokens) — per-record term
    counts, already aggregated.

    fields: 'content' = code token unigrams; 'path' = char trigrams of
    the basename (reference: trigrams over name/street,
    make_tf_idf.go:53-63).

    Computed with collections.Counter inside one mapInPandas pass —
    the per-record aggregation needs NO shuffle at all (the reference's
    goroutine TF fan-out, make_tf_idf.go:229-286, collapses into this),
    versus explode + groupBy which would shuffle every token occurrence
    (~100x more rows than the counted output)."""
    from collections import Counter
    from collections.abc import Iterator

    import pandas as pd

    import zlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rid, fld, tok, th, cnt, ndoc = [], [], [], [], [], []
            for record_id, text, base in zip(
                pdf["record_id"], pdf["norm_text"], pdf["basename"]
            ):
                toks = text.split() if text else []
                c = Counter(toks)
                n = len(toks)
                for t, k in c.items():
                    rid.append(record_id); fld.append("content")
                    tok.append(t); th.append(zlib.crc32(b"c:" + t.encode()))
                    cnt.append(k); ndoc.append(n)
                tris = (
                    [base]
                    if len(base) < 3
                    else [base[i : i + 3] for i in range(len(base) - 2)]
                )
                c = Counter(tris)
                n = len(tris)
                for t, k in c.items():
                    rid.append(record_id); fld.append("path")
                    tok.append(t); th.append(zlib.crc32(b"p:" + t.encode()))
                    cnt.append(k); ndoc.append(n)
            yield pd.DataFrame(
                {
                    "record_id": rid,
                    "field": fld,
                    "token": tok,
                    "token_hash": pd.array(th, dtype="int64"),
                    "cnt": pd.array(cnt, dtype="int64"),
                    "n_doc_tokens": pd.array(ndoc, dtype="int64"),
                }
            )

    return reps.select("record_id", "norm_text", "basename").mapInPandas(
        fn,
        "record_id string, field string, token string, token_hash long, "
        "cnt long, n_doc_tokens long",
    )


def idf_dict(counts: DataFrame, n_docs: int, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """df = docs containing token (per field); idf = ln(N/df) unsmoothed.

    Keyed by int64 token_hash, not the token string: every downstream
    shuffle/agg/join on the vocabulary goes through fixed-width ints
    (string keys measurably anti-scale the JVM hash agg on this
    hardware, and are strictly more bytes at any scale). The hash is
    field-salted crc32, computed once at term_counts time."""
    df_tbl = counts.groupBy("field", "token_hash").agg(
        F.count("*").alias("df")  # counts are pre-aggregated per record
    )
    denom = (F.col("df") + F.lit(1)) if cfg.idf_smoothing else F.col("df")
    return df_tbl.withColumn(
        "idf", F.log(F.lit(float(n_docs)) / denom.cast("double"))
    )


def postings(counts: DataFrame, idf: DataFrame) -> DataFrame:
    """(record_id, field, token, token_hash, tf, tfidf) — weighted
    postings.

    Norms are NOT carried per posting: a window over (record_id, field)
    would sort-shuffle the full postings table (measured: the single
    most expensive stage). record_norms() aggregates them into a
    record-sized side table instead (partial map-side agg, then a join
    against the much smaller pair set)."""
    return (
        counts.join(F.broadcast(idf), ["field", "token_hash"], "left")
        .withColumn("tf", F.col("cnt") / F.col("n_doc_tokens"))
        .withColumn("tfidf", F.col("tf") * F.coalesce(F.col("idf"), F.lit(0.0)))
        .select("record_id", "field", "token", "token_hash", "tf", "tfidf")
    )


def df_partials(reps: DataFrame) -> DataFrame:
    """(token_hash, df) partial document frequencies, pre-aggregated PER
    PARTITION inside the Python kernel. The shuffle then moves
    ~vocab-per-partition rows instead of one row per (record, token)
    occurrence (measured: the per-record layout shuffles 20M+ rows at
    280k records and dominated the 4-executor profile). Same math as a
    map-side combine, but the rows never materialize JVM-side at all."""
    import zlib
    from collections.abc import Iterator

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, int] = {}
        # per-worker hash memos: the corpus vocabulary repeats across
        # documents, so each token/trigram is crc32'd once per partition
        # (pure caching, bit-identical counts)
        tok_memo: dict[str, int] = {}
        tri_memo: dict[str, int] = {}
        for pdf in batches:
            for text, base in zip(pdf["norm_text"], pdf["basename"]):
                toks = set(text.split()) if text else set()
                for t in toks:
                    h = tok_memo.get(t)
                    if h is None:
                        h = zlib.crc32(b"c:" + t.encode())
                        tok_memo[t] = h
                    acc[h] = acc.get(h, 0) + 1
                tris = (
                    {base}
                    if len(base) < 3
                    else {base[i : i + 3] for i in range(len(base) - 2)}
                )
                for t in tris:
                    h = tri_memo.get(t)
                    if h is None:
                        h = zlib.crc32(b"p:" + t.encode())
                        tri_memo[t] = h
                    acc[h] = acc.get(h, 0) + 1
        yield pd.DataFrame(
            {
                "token_hash": pd.array(list(acc.keys()), dtype="int64"),
                "df": pd.array(list(acc.values()), dtype="int64"),
            }
        )

    return reps.select("norm_text", "basename").mapInPandas(
        fn, "token_hash long, df long"
    )


def idf_map(reps: DataFrame, n_docs: int, cfg: AmpConfig = DEFAULT_CONFIG) -> dict[int, float]:
    """Collect the IDF dictionary to the driver as {field-salted
    token_hash: idf} for broadcast into the one-pass feature kernel —
    the north_rule's 'broadcast of frequency dictionaries', and exactly
    what the reference does (IDF map held in Go memory,
    make_tf_idf.go:66-72,253-255). Valid while the vocabulary fits on
    the driver (vocab is corpus-content-bounded, not row-bounded); for
    open-web-scale vocabularies flip AmpConfig.broadcast_idf=False to
    use the distributed postings-join path (pair_tfidf)."""
    denom = (F.col("df") + F.lit(1)) if cfg.idf_smoothing else F.col("df")
    pdf = (
        df_partials(reps)
        .groupBy("token_hash")
        .agg(F.sum("df").alias("df"))
        .withColumn("idf", F.log(F.lit(float(n_docs)) / denom.cast("double")))
        .select("token_hash", "idf")
        .toPandas()
    )
    # Arrow-path toPandas: a row-by-row .collect() of a million-token
    # vocabulary serializes through py4j and dominates the whole
    # pipeline wall (measured 29-54s vs ~2s via Arrow)
    vocab = len(pdf)
    if vocab > 20_000_000:
        # ~20M hashes ~= 320MB as a broadcast dict — past this the
        # driver-bounded path is the wrong plan; fail loudly instead of
        # OOMing an executor mid-broadcast
        raise ValueError(
            f"idf_map: vocabulary has {vocab} hashes — too large to broadcast; "
            "set AmpConfig.broadcast_idf=False to use the distributed "
            "postings-join path"
        )
    if vocab > 5_000_000:
        import logging

        logging.getLogger("amp.features").warning(
            "idf_map: broadcasting %d-entry IDF dict; consider "
            "broadcast_idf=False (postings-join path) at this vocabulary size",
            vocab,
        )
    return dict(zip(pdf["token_hash"].astype("int64"), pdf["idf"].astype("float64")))


def record_norms(post: DataFrame) -> DataFrame:
    """Per-(record, field) L2 norm of the tfidf vector — record-sized."""
    return post.groupBy("record_id", "field").agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("norm")
    )


def pair_tfidf(pairs: DataFrame, post: DataFrame, field: str = "content") -> DataFrame:
    """A1 / J4 (match.sql:65-75): grouped SUM of tfidf products over the
    shared tokens of each candidate pair, via two equi-joins through the
    postings table. Emits both the reference's unnormalized dot and the
    normalized cosine (norms joined from the record-sized norms table,
    never carried per posting)."""
    norms = record_norms(post.where(F.col("field") == field))
    pl = post.where(F.col("field") == field).select(
        F.col("record_id").alias("left_id"),
        F.col("token_hash"),
        F.col("tfidf").alias("l_tfidf"),
    )
    pr = post.where(F.col("field") == field).select(
        F.col("record_id").alias("right_id"),
        F.col("token_hash"),
        F.col("tfidf").alias("r_tfidf"),
    )
    joined = pairs.join(pl, "left_id").join(pr, ["right_id", "token_hash"])
    dots = joined.groupBy("left_id", "right_id").agg(
        F.sum(F.col("l_tfidf") * F.col("r_tfidf")).alias("tfidf_dot")
    )
    nl = norms.select(F.col("record_id").alias("left_id"), F.col("norm").alias("l_norm"))
    nr = norms.select(F.col("record_id").alias("right_id"), F.col("norm").alias("r_norm"))
    return (
        dots.join(nl, "left_id")
        .join(nr, "right_id")
        .select(
            "left_id",
            "right_id",
            "tfidf_dot",
            (F.col("tfidf_dot") / (F.col("l_norm") * F.col("r_norm"))).alias(
                "tfidf_cosine"
            ),
        )
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
            for i, text in enumerate(pdf["norm_text"]):
                toks = text.split() if text else []
                if not toks:
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
    return reps.select("record_id", "norm_text").mapInPandas(
        _embed_batchfn(cfg.emb_dim), schema=schema
    )
