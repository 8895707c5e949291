"""Pipeline configuration.

One frozen dataclass; every stage takes it explicitly so runs are
reproducible from (input, run_id, config) alone — the determinism
requirement behind checkpoint/resume (resume-equals-fresh).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class AmpConfig:
    # ---- normalize ----
    max_tokens: int = 4096          # cap tokens carried per record (signature budget)
    shingle_k: int = 3              # k-token shingles for minhash

    # ---- blocking ----
    minhash_perms: int = 32         # total permutations
    minhash_bands: int = 8          # bands (rows per band = perms // bands)
    max_block_size: int = 64        # frequency cap: blocks larger than this are
                                    # dropped from pair generation (counted, never silent)
    salt_block_size: int = 16       # blocks above this get salted sub-pairing
                                    # (salted-join shape only; see next knob)
    grouped_pairgen_max_block: int = 256
                                    # cap at or below this: pair generation is ONE
                                    # groupBy + in-place pair explode (per-block
                                    # work bounded by cap^2/2 — no salt needed);
                                    # above: the salted self-join, which can SPLIT
                                    # a hot block's m^2/2 output across tasks

    # ---- features ----
    idf_smoothing: bool = False     # reference parity: idf = ln(N/df), unsmoothed
                                    # (reference make_tf_idf.go:66-72)
    emb_dim: int = 64               # hashing-trick embedding dimension
    broadcast_idf: bool = True      # True: IDF dict broadcast into a one-pass
                                    # feature kernel (vocab fits driver);
                                    # False: distributed postings-join scoring
                                    # (open-vocabulary scale path)

    # ---- scoring ----
    # weights mirror the shape of the reference composite score
    # (internal/matcher/matcher.go:180-208) re-targeted at code records
    w_token_cosine: float = 0.35    # content token tf-idf cosine
    w_shingle_jaccard: float = 0.25 # minhash-estimated / exact shingle jaccard
    w_emb_cosine: float = 0.15      # hashing-trick embedding cosine
    w_path_jw: float = 0.10         # Jaro-Winkler on path stem
    w_path_lev: float = 0.10        # normalized Levenshtein similarity on stem
    w_lang_match: float = 0.05

    broadcast_sides_max_records: int = 100_000
                                    # scorer join strategy: at or below this many
                                    # records the quantized side-features table
                                    # (~300 B/record -> <=30 MB) broadcasts into
                                    # BOTH scorer joins, so the pair table and the
                                    # wide pair+features intermediate never
                                    # shuffle; above it, shuffled-hash joins
                                    # (the only shape that survives 10^12 rows).
                                    # Crossover measured on the 280k-record
                                    # scaling job (scripts/phase_scaling.py):
                                    # broadcast cuts the scoring phase ~13s at
                                    # local[2] but ADDS ~6s at local[8] — the
                                    # relation build is driver-single-threaded
                                    # and the shuffle it replaces was parallel —
                                    # so the default keeps SHJ at that size. On
                                    # a real cluster (per-executor broadcast vs
                                    # network-wide shuffle) the crossover sits
                                    # higher; the knob is the executor-memory
                                    # budget for the dimension-style side.

    gather_sides_max_records: int = 0
                                    # round-6 alternate scorer transport (the
                                    # round-5 "dictionary join" proposal): at or
                                    # below this many records the side-features
                                    # table is collected once and broadcast as
                                    # numpy stores; the pair stream then crosses
                                    # the Arrow boundary as BARE ID PAIRS and
                                    # the kernel gathers payloads by index —
                                    # no payload joins, no payload shuffle, no
                                    # per-pair payload serialization. Measured
                                    # A/B at 168k records on local[32]
                                    # (OPTIMIZATION_r06.md): 19.1 s vs the join
                                    # path's 15.8 s — the driver-serial
                                    # collect+broadcast costs more than the
                                    # tmpfs-local shuffle it replaces, so the
                                    # default stays OFF. The transport exists
                                    # for network-bound clusters where shuffle
                                    # bytes, not driver serialization, dominate;
                                    # budget ~payload bytes x records per Python
                                    # worker when enabling.

    fused_reps_min_partitions: int = 24
                                    # pipeline constant-phase shape: when the
                                    # pinned records table has at least this
                                    # many partitions (a cheap driver-side
                                    # size proxy — partition count scales with
                                    # input bytes), the representatives pin is
                                    # fused into the uniqueness-probe window
                                    # as ONE concurrent groupBy+semijoin job
                                    # instead of two sequential pins (winners,
                                    # then reps). Both shapes are semantically
                                    # identical; the heuristic only decides
                                    # which timing we get, so a wrong guess is
                                    # never a correctness event. Small corpora
                                    # keep the lazy broadcast-winners reps.

    # ---- rank / edges ----
    score_threshold: float = 0.62   # composite in [0,1]; >= threshold -> edge
    top_k: int = 10

    # ---- clustering ----
    cc_max_iters: int = 20
    cc_checkpoint_every: int = 3
    cc_driver_cutoff: int = 5_000_000  # <= this many edges: driver union-find;
                                       # above: distributed large/small-star.
                                       # 0 disables the driver path entirely.

    # ---- misc ----
    seed: int = 42
    shuffle_partitions: int = 32

    def __post_init__(self) -> None:
        assert self.minhash_perms % self.minhash_bands == 0

    @property
    def minhash_rows_per_band(self) -> int:
        return self.minhash_perms // self.minhash_bands


DEFAULT_CONFIG = AmpConfig()
