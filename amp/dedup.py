"""Deduplication operators over a documents table — the training-data
pipeline counterpart of the ER engine's blocking stage. Five families:

  exact            hash-groupBy on a normalized fingerprint (linear)
  minhash LSH      shingle -> md5-minhash -> band -> bucket equi-join
  simhash          weighted bit-vote fingerprint, hamming-bucket join
  n-gram jaccard   exact token-set jaccard on LSH candidates
  embedding cosine near-dup via cosine >= threshold on candidate pairs

Everything except simhash is pure built-in expressions (md5/array ops),
so each has a bit-exact DuckDB oracle. The md5-string minhash here is
the oracle-friendly twin of the production int64 minhash in
amp.blocking (same math, cheaper hashes there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup via hash-groupBy on normalized-text sha256. Returns
    (exact_fp, n_dups, canonical_doc_id) for groups of size > 1.
    One shuffle on the fingerprint; linear at any scale."""
    norm_sha = F.sha2(F.concat_ws(" ", tokens_col()), 256)
    return (
        docs.select("doc_id", norm_sha.alias("exact_fp"))
        .groupBy("exact_fp")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
        .where(F.col("n_dups") > 1)
    )


def _distinct_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col())).alias("token")
    )


def _shingles_col(text_col: str = "text", k: int = 3):
    """Word k-shingles of the tokenized text (whole text when shorter) —
    the unit of MinHash. Token unigrams would be degenerate on
    small-vocabulary corpora (every doc contains the global min token)."""
    toks = tokens_col(text_col)
    whole = F.array(F.concat_ws(" ", toks))
    slid = F.expr(
        f"transform(sequence(1, size(filter(split(lower(text), '{'[^a-z0-9]+'}'), x -> x != '')) - {k - 1}), "
        f"i -> concat_ws(' ', slice(filter(split(lower(text), '{'[^a-z0-9]+'}'), x -> x != ''), i, {k})))"
    )
    return F.when(F.size(toks) < k, whole).otherwise(slid)


def _distinct_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.array_distinct(_shingles_col("text", k))).alias("shingle")
    )


def minhash_band_keys(docs: DataFrame, bands: int = 4) -> DataFrame:
    """(doc_id, band, band_key): band_key = min over distinct word
    3-shingles of md5(seed || shingle) — one independent 1-perm MinHash
    per band. md5 keeps the oracle comparison exact; the production
    variant uses int64 affine perms (amp.blocking.minhash_signatures)."""
    sh = _distinct_shingles(docs)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"band{b}:"), F.col("shingle")))).alias(f"mh_{b}")
        for b in range(bands)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    pairs = []
    for b in range(bands):
        pairs.append(
            agg.select(
                "doc_id", F.lit(b).alias("band"), F.col(f"mh_{b}").alias("band_key")
            )
        )
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionByName(p)
    return out


def minhash_lsh_pairs(docs: DataFrame, bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: equi-self-join per (band, band_key)."""
    keys = minhash_band_keys(docs, bands)
    l = keys.select(F.col("doc_id").alias("left_id"), "band", "band_key")
    r = keys.select(F.col("doc_id").alias("right_id"), "band", "band_key")
    return (
        l.join(r, ["band", "band_key"])
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )


def ngram_jaccard(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs via double explode +
    intersection count — the verification step after LSH. Shuffles on
    doc_id (token lists re-joined per side), never on token."""
    toks = _distinct_tokens(docs)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    lt = toks.select(F.col("doc_id").alias("left_id"), "token")
    rt = toks.select(F.col("doc_id").alias("right_id"), "token")
    inter = (
        pairs.join(lt, "left_id")
        .join(rt, ["right_id", "token"])
        .groupBy("left_id", "right_id")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "left_id").withColumnRenamed("n_tok", "l_n"), "left_id")
        .join(sizes.withColumnRenamed("doc_id", "right_id").withColumnRenamed("n_tok", "r_n"), "right_id")
        .select(
            "left_id",
            "right_id",
            F.round(
                F.col("n_inter")
                / (F.col("l_n") + F.col("r_n") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash fingerprint: bit j votes +1/-1 per distinct token
    depending on bit j of md5(token); fingerprint bit j = 1 iff the sum
    is positive. Expressed with explode + conditional sums — fully
    built-in (no UDF), and SQL-oracle-able via the same md5 nibble
    arithmetic."""
    toks = _distinct_tokens(docs)
    # bit j of the md5: nibble = hex digit at position j//4, bit = j%4
    bit_votes = []
    for j in range(bits):
        nib = F.conv(F.substring(F.md5("token"), j // 4 + 1, 1), 16, 10).cast("int")
        bit = F.shiftright(nib, j % 4).bitwiseAND(F.lit(1))
        bit_votes.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v_{j}")
        )
    votes = toks.groupBy("doc_id").agg(*bit_votes)
    fp = sum(
        (
            F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(bits)
        ),
        F.lit(0),
    )
    return votes.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, bits: int = 16, max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by simhash: block on the high byte (trades recall
    for a bounded join, standard at scale), then filter hamming
    distance via bit_count(xor)."""
    fp = simhash(docs, bits)
    bucket = F.shiftright(F.col("simhash"), bits // 2)
    keyed = fp.select("doc_id", "simhash", bucket.alias("bucket"))
    l = keyed.select(
        F.col("doc_id").alias("left_id"), F.col("simhash").alias("l_fp"), "bucket"
    )
    r = keyed.select(
        F.col("doc_id").alias("right_id"), F.col("simhash").alias("r_fp"), "bucket"
    )
    return (
        l.join(r, "bucket")
        .where(F.col("left_id") < F.col("right_id"))
        .withColumn(
            "hamming", F.bit_count(F.col("l_fp").bitwiseXOR(F.col("r_fp")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )


def embedding_near_dup(
    embs: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-dup: exact pairwise cosine >= threshold.
    Brute-force O(n^2) — correct baseline; the scale path buckets first
    (amp.ann.lsh_topk). Dot products via zip_with/aggregate, JVM-side."""
    d = embs.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        # norms once per record, not once per pair (n vs n^2 aggregates)
        "n", F.sqrt(F.expr("aggregate(v, 0.0D, (a, x) -> a + x * x)"))
    )
    l = d.select(F.col("id").alias("left_id"), F.col("v").alias("lv"), F.col("n").alias("ln"))
    r = d.select(F.col("id").alias("right_id"), F.col("v").alias("rv"), F.col("n").alias("rn"))
    dot = F.expr(
        "aggregate(zip_with(lv, rv, (x, y) -> x * y), 0.0D, (a, v) -> a + v)"
    )
    return (
        l.crossJoin(r)
        .where(F.col("left_id") < F.col("right_id"))
        .withColumn("cosine", F.round(dot / (F.col("ln") * F.col("rn")), 6))
        .where(F.col("cosine") >= threshold)
        .select("left_id", "right_id", "cosine")
    )
