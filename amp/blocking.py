"""Stage 2 — multi-pass blocking: candidate-pair generation.

The reference's candidate generation is ONE Postgres θ-join with an
OR-of-equalities predicate (internal/matcher/match.sql:22-25) plus a
binary-key equi-self-join (match.sql:33-43). Catalyst cannot execute an
OR-join as anything but a nested-loop product, so the architecture here
is the classic multi-pass rewrite: each pass emits (record_id,
block_key) rows, passes are unioned, pairs are generated per key with
``left_id < right_id``, and the union is deduplicated. Same pair set,
all equi-joins (SURVEY.md §2.3 J1/J3, §4).

Passes:
  minhash — b bands × r rows MinHash over k-token shingles; the analog
            of the reference's 10-bit anchor "binary key"
            (internal/matcher/shared.go:79-101): a fixed-width
            content-derived signature used as an equi-join key.
            Computed entirely JVM-side (array_min over transform) —
            no Python in this stage at all.
  path    — (lang, path stem): the analog of the reference's exact
            attribute blocks (state/city/zip/phone, match.sql:24-25).

Skew handling (north_rule): exact-duplicate contents are already
collapsed to representatives before blocking (normalize.representatives).
Remaining hot keys are handled two ways, both explicit and counted:
  * frequency cap  — blocks larger than ``max_block_size`` are dropped
    from pair generation and surfaced in a metrics DataFrame (never
    silent; standard ER practice).
  * salted self-join — blocks above ``salt_block_size`` get their pair
    generation split across ceil(m/salt) tasks via the
    replicate-one-side trick, preserving the exact pair set.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import AmpConfig, DEFAULT_CONFIG
from .normalize import shingles_expr

_MERSENNE_P = (1 << 61) - 1


def _minhash_coeffs(cfg: AmpConfig) -> tuple[list[int], list[int]]:
    """Deterministic permutation coefficients h_j(x) = (a_j*x + b_j) mod p.

    Coefficients are kept below 2^30 so a_j * (x + 2^31) + b_j stays
    under 2^62 — Spark 4 runs ANSI mode by default and would throw on
    bigint overflow."""
    rng = np.random.RandomState(cfg.seed)
    a = rng.randint(1, 1 << 30, size=cfg.minhash_perms, dtype=np.int64)
    b = rng.randint(0, 1 << 30, size=cfg.minhash_perms, dtype=np.int64)
    return a.tolist(), b.tolist()


def minhash_signature_cols(cfg: AmpConfig = DEFAULT_CONFIG, shingle_col: str = "shingles"):
    """One column per permutation, all built-in expressions (codegen'd):
    min over shingles of (a*x+b) mod p. Shingle hashes are murmur3 int32
    from ``hash``; lifted to non-negative bigint before the affine map."""
    a, b = _minhash_coeffs(cfg)
    cols = []
    for j in range(cfg.minhash_perms):
        cols.append(
            F.expr(
                f"array_min(transform({shingle_col}, "
                f"x -> pmod({a[j]}L * (cast(x as bigint) + 2147483648L) + {b[j]}L, "
                f"{_MERSENNE_P}L)))"
            ).alias(f"mh_{j}")
        )
    return cols


def minhash_signatures(reps: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """(record_id, sig array<bigint>) — the full MinHash signature,
    computed in one Arrow-batched mapInPandas pass (crc32 shingle hash +
    numpy affine permutations). Reused twice: band keys here, Jaccard
    estimation at scoring (mean positional agreement), so shingle sets
    are never carried past this stage. A JVM-expression variant
    (minhash_signatures_jvm) exists; the pandas kernel is the default
    for the same reason as normalize() — string-heavy JVM work
    anti-scales across local threads, Python worker processes don't."""
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    a, b = _minhash_coeffs(cfg)
    a_arr = np.array(a, dtype=np.int64)[:, None]
    b_arr = np.array(b, dtype=np.int64)[:, None]
    k = cfg.shingle_k

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf["norm_text"]:
                toks = text.split() if text else []
                if len(toks) < k:
                    shingles = [" ".join(toks)]
                else:
                    shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
                h = np.fromiter(
                    (zlib.crc32(s.encode()) for s in set(shingles)),
                    dtype=np.int64,
                )
                sig = ((a_arr * h[None, :] + b_arr) % _MERSENNE_P).min(axis=1)
                sigs.append(sig)
            yield pd.DataFrame({"record_id": pdf["record_id"], "sig": sigs})

    return reps.select("record_id", "norm_text").mapInPandas(
        fn, "record_id string, sig array<long>"
    )


def minhash_signatures_jvm(reps: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """Built-in-expression twin (murmur3 shingle hash instead of crc32 —
    signatures differ numerically but are an equally valid MinHash)."""
    wide = reps.select(
        "record_id",
        shingles_expr(cfg.shingle_k).alias("shingles"),
    ).select("record_id", *minhash_signature_cols(cfg))
    return wide.select(
        "record_id",
        F.array(*[F.col(f"mh_{j}") for j in range(cfg.minhash_perms)]).alias("sig"),
    )


def minhash_blocks(sigs: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """(record_id, block_key) rows: one key per band. Band key =
    xxhash64(band index, its r signature values) — an int64, so every
    downstream shuffle/join on blocking keys moves fixed-width ints,
    never strings (explicit-repartition-on-blocking-keys is the
    north_rule; int keys make that repartition cheap)."""
    r = cfg.minhash_rows_per_band
    band_keys = []
    for band in range(cfg.minhash_bands):
        parts = [F.element_at("sig", band * r + i + 1) for i in range(r)]
        band_keys.append(F.xxhash64(F.lit(band), *parts))
    # array_distinct makes the no-duplicate-(record_id, block_key)
    # invariant STRUCTURAL within the pass (band index is salted into
    # each key, so duplicates require a real xxhash64 collision — but
    # the grouped pair-gen's hot-key pre-count counts raw rows, and its
    # equivalence to the authoritative distinct-size gate must not rest
    # on a probabilistic argument). Cross-pass duplicates would need a
    # minhash-vs-path key collision (disjoint hash inputs; 2^-64),
    # and the post-collect distinct-size filter remains authoritative.
    return (
        sigs.select(
            "record_id", F.array_distinct(F.array(*band_keys)).alias("keys")
        )
        .select("record_id", F.explode("keys").alias("block_key"))
        .withColumn("pass_name", F.lit("minhash"))
    )


def path_blocks(reps: DataFrame) -> DataFrame:
    """Exact-attribute pass: (lang, stem) — catches renames/edits that
    keep the file name (reference analog: state/city equality blocks)."""
    return reps.select(
        "record_id",
        F.xxhash64(F.lit("p"), F.col("lang"), F.col("stem")).alias("block_key"),
    ).withColumn("pass_name", F.lit("path"))


def all_blocks(
    reps: DataFrame, sigs: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG
) -> DataFrame:
    return minhash_blocks(sigs, cfg).unionByName(path_blocks(reps))


def block_stats(blocks: DataFrame) -> DataFrame:
    """Per-key sizes — broadcast back for cap/salt decisions and kept
    as a metrics table (never drop a block silently)."""
    return blocks.groupBy("pass_name", "block_key").agg(
        F.count("*").alias("block_size")
    )


def candidate_pairs(
    blocks: DataFrame,
    cfg: AmpConfig = DEFAULT_CONFIG,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Blocks -> distinct candidate pairs (left_id < right_id).

    Two shapes, chosen by the frequency cap:

      cap <= grouped_pairgen_max_block (default): ONE groupBy shuffle
        collects each block's (capped, deduplicated) member array and a
        codegen'd lambda explodes the ordered pairs in place — pair
        output per block is bounded by cap^2/2, so no task ever owns
        unbounded work and the salt machinery is unnecessary. This
        replaces the window + salted self-join shape (3 shuffles of the
        blocks table) with one shuffle + the final pair dedup.

      cap > grouped_pairgen_max_block: the salted equi-self-join
        (_candidate_pairs_salted) — with a loose cap a single block's
        m^2/2 pair generation is real work and must be SPLIT across
        tasks, which only the replicate-one-side salt can do.

    Both shapes produce the identical distinct pair set (asserted in
    tests). Cap semantics in the grouped shape count DISTINCT member
    ids per key (collect_set), which is the intended meaning; the
    window shape counted raw rows — identical unless a pass emits the
    same (record, key) twice, which none does.
    """
    if cfg.max_block_size <= cfg.grouped_pairgen_max_block:
        return _candidate_pairs_grouped(blocks, cfg)
    return _candidate_pairs_salted(blocks, cfg, stats)


def _candidate_pairs_grouped(blocks: DataFrame, cfg: AmpConfig) -> DataFrame:
    # Hot-key guard BEFORE the collect: a degenerate key (a band every
    # record shares, a stem like "index" across millions of repos) would
    # otherwise build its full member array in one non-spillable
    # aggregation buffer just to be discarded by the size filter. The
    # guard is a pre-count + anti-join, NOT a count window: a window
    # needs WindowExec, which SORTS every partition of the blocks table
    # and buffers its rows — measured +62% on the full 1.4M-record
    # pipeline (146.5s -> 235.0s, the round-4 bisect) for a guard that
    # almost never fires. The pre-count aggregates fixed-size longs
    # (map-side partial combine; spill-proof buffers) into a tiny
    # per-key table, the anti-join drops hot-key rows before any array
    # is built, and the groupBy below REUSES the anti-join's
    # block_key exchange — the blocks table still shuffles exactly
    # once, now with no sort. The second scan of the blocks plan for
    # the count is narrow projections over the pinned sides table.
    # Row count == distinct count here because no pass emits the same
    # (record, key) twice — STRUCTURAL as of round 5: minhash_blocks
    # explodes an array_distinct'd key array and path_blocks emits one
    # row per record (cross-pass dup needs a 2^-64 key collision); the
    # post-collect size filter stays as the authoritative gate.
    hot = (
        blocks.groupBy("block_key")
        .agg(F.count("*").alias("m"))
        .where(F.col("m") > cfg.max_block_size)
        .select("block_key")
    )
    grouped = (
        blocks.join(hot, "block_key", "left_anti")
        .groupBy("block_key")
        .agg(F.array_sort(F.collect_set("record_id")).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= cfg.max_block_size))
    )
    # ordered pairs from the sorted member array: x pairs with every
    # strictly-later element, so left < right holds by construction.
    # All codegen'd expressions — no Python, no second shuffle.
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "y -> struct(x AS left_id, y AS right_id))))"
            )
        ).alias("p")
    ).select("p.left_id", "p.right_id")
    # explicit partition count on the dedup shuffle: pair ROWS are tiny
    # (~80 B) but each costs real Python-kernel work downstream, so
    # AQE's byte-based coalesce would serialize the scorer onto one
    # task. Partition by left_id ONLY: hash(left_id) satisfies the
    # dedup's clustered distribution on (left_id, right_id) — every
    # duplicate shares its left_id — AND the scorer's first
    # shuffled-hash join keys on left_id, so dedup + join-1 share THIS
    # one exchange and the pair table shuffles once, not twice
    # (round-4 verdict task 1). Skew is bounded: one record pairs with
    # at most (max_block_size - 1) x n_passes others.
    return pairs.repartition(cfg.shuffle_partitions, "left_id").dropDuplicates(
        ["left_id", "right_id"]
    )


def _candidate_pairs_salted(
    blocks: DataFrame,
    cfg: AmpConfig,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Salted equi-self-join pair generation (the loose-cap shape).

    Three size regimes, per key:
      m <= salt_block_size      : plain equi-join (AQE handles residue)
      salt < m <= max_block_size: salted — right side carries
          salt = hash(id) mod s, left side is replicated s times with a
          target_salt column, join on (key, target_salt = salt). The
          shuffle key becomes (key, salt): a hot block's m^2/2 pair
          outputs are computed by s tasks instead of one.
      m > max_block_size        : dropped (counted in dropped_blocks()).
    """
    # Block sizes via a count window over block_key: ONE shuffle of the
    # blocks table and no second scan — strictly cheaper than the
    # aggregate-then-join-back shape (blocks scanned twice + stats
    # shuffled) at every scale. The separate block_stats() table remains
    # the metrics surface (computed only when something acts on it);
    # the ``stats`` parameter is kept for API compatibility but the
    # sizes here are derived inline.
    from pyspark.sql import Window

    sized = blocks.withColumn(
        "block_size", F.count("*").over(Window.partitionBy("block_key"))
    ).where(
        (F.col("block_size") > 1) & (F.col("block_size") <= cfg.max_block_size)
    )

    s_expr = F.ceil(F.col("block_size") / F.lit(cfg.salt_block_size)).cast("int")
    sized = sized.withColumn("n_salt", F.greatest(F.lit(1), s_expr)).withColumn(
        "salt", F.pmod(F.hash("record_id"), F.col("n_salt"))
    )

    left = (
        sized.withColumn("target_salt", F.explode(F.expr("sequence(0, n_salt - 1)")))
        .select(
            F.col("block_key"),
            F.col("record_id").alias("left_id"),
            F.col("target_salt"),
        )
    )
    right = sized.select(
        F.col("block_key"),
        F.col("record_id").alias("right_id"),
        F.col("salt").alias("target_salt"),
    )
    pairs = left.join(right, ["block_key", "target_salt"]).where(
        F.col("left_id") < F.col("right_id")
    )
    return pairs.select("left_id", "right_id").dropDuplicates(["left_id", "right_id"])


def dropped_blocks(stats: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG) -> DataFrame:
    """Metrics: keys excluded by the frequency cap, with sizes."""
    return stats.where(F.col("block_size") > cfg.max_block_size)
