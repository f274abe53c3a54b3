"""Frozen configuration dataclasses mirroring the reference's weights/tiers.

Reference provenance:
- FeatureWeights values: /root/reference internal/match/types.go:76-91
- MatchTiers values:     internal/match/types.go:49-57
- Blocking knobs are new (the reference used pg_trgm GIN indexes as its
  blocking structure, internal/match/generator.go:209-249; we use
  MinHash-LSH band keys + domain-prefix keys per the north rule).

All configs are frozen so they can be captured by Ray tasks/actors and
hashed into lineage manifests without mutation hazards.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class FeatureWeights:
    """Linear-blend scoring weights (internal/match/types.go:76-91)."""

    trigram_similarity: float = 0.45
    embedding_cosine: float = 0.45
    locality_overlap: float = 0.05
    street_overlap: float = 0.05
    same_house_number: float = 0.08
    same_house_alpha: float = 0.02
    usrn_match: float = 0.04
    llpg_live: float = 0.03
    legacy_uprn_valid: float = 0.20
    spatial_boost_max: float = 0.10
    descriptor_penalty: float = -0.05
    phonetic_miss_penalty: float = -0.03


@dataclass(frozen=True)
class MatchTiers:
    """Decision thresholds + winner margin (internal/match/types.go:49-57,
    decision logic internal/match/scorer.go:142-198)."""

    auto_accept_high: float = 0.92
    auto_accept_medium: float = 0.88
    review_threshold: float = 0.80
    min_threshold: float = 0.70
    winner_margin: float = 0.03


@dataclass(frozen=True)
class BlockingConfig:
    """MinHash-LSH + composite-key blocking knobs.

    The reference blocks candidates with a trigram GIN index limited to
    top-50 (internal/match/generator.go:209-249) plus component-equality
    keys (internal/matcher/engine_components_fixed.go:201-241).  We block
    with (a) exact canonical-hash keys, (b) MinHash-LSH band keys over
    token/char shingles, (c) optional domain-prefix keys — all emitted by
    flat_map and shuffled with one groupby.
    """

    num_perm: int = 32          # minhash permutations
    num_bands: int = 8          # LSH bands; rows_per_band = num_perm // num_bands
    shingle_size: int = 3       # token n-gram size for shingles
    char_shingles: bool = True  # shingle over chars (True) or tokens (False)
    seed: int = 42
    max_block_size: int = 32    # blocks above this get salted/subdivided
    max_pairs_per_block: int = 496  # C(32,2): pair budget per (possibly salted) block
    use_domain_key: bool = False  # also emit normalized-domain prefix keys
    prefix_tokens: int = 2      # extra composite key: first-K canonical tokens
    use_prefix_key: bool = True  # J6-cascade analogue; rescues short texts whose
                                 # shingle Jaccard falls below the LSH threshold
    # Keep a pair only when >= this many LSH BANDS agree (or any prefix
    # key matches — prefix keys stay absolute, they exist to rescue
    # pairs the shingle bands miss).  1 = classic OR-of-bands; 2 turns
    # the candidate rule into "2-of-b bands", pushing the effective
    # Jaccard threshold up without rehashing: P(cand) falls from
    # 1-(1-J^r)^b to its >=2-agreement tail, which cuts the low-J pair
    # mass the scorer would reject anyway (score floor 0.8).
    min_band_agreement: int = 1

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.num_bands


@dataclass(frozen=True)
class SymSpellConfig:
    """ST1 — corpus-derived SymSpell correction (internal/symspell/types.go).

    The reference ships Enabled:false by default (types.go); we default it
    ON because the web-corpus F1 gate depends on typo-robust canonical
    text (documented divergence).  The dictionary is fit on (a sample of)
    unique canonical texts, capped at ``max_vocab`` terms, and broadcast
    once via ray.put to the corrector actor pool.
    """

    enabled: bool = True
    max_edit_distance: int = 2
    min_term_length: int = 3
    min_frequency: int = 2      # tokens rarer than this stay out of the dictionary
    max_vocab: int = 100_000    # dictionary term cap (most frequent first)


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end flagship pipeline config; hashed into manifests."""

    weights: FeatureWeights = field(default_factory=FeatureWeights)
    tiers: MatchTiers = field(default_factory=MatchTiers)
    # flagship blocking defaults to 2-of-b band agreement: cuts the
    # scored pair mass ~40% (the pruned pairs sit below the 0.8 score
    # floor) while the labeled-pair F1 gate holds >= 0.99 (swept r3:
    # agree=1 F1 0.9976 / agree=2 0.9959 / agree=3 0.9943 at 300
    # entities; 0.9960 at the 500k-entity bench corpus).  The raw
    # BlockingConfig default stays 1 so the blocking-family queries
    # (minhash/jaccard near-dup) keep their classic OR-of-bands oracle
    # semantics.
    blocking: BlockingConfig = field(
        default_factory=lambda: BlockingConfig(min_band_agreement=2)
    )
    symspell: SymSpellConfig = field(default_factory=SymSpellConfig)
    # P3 selector: "production" (P2 blend, the primary) or "alt" (the
    # engine package's alternative fuzzy blend, fuzzy.go:287-331)
    score_formula: str = "production"
    # J6 ordered-cascade semantics (hierarchical_matcher.go:51-153): the
    # reference tries blocking levels most-specific-first and STOPS at
    # the first level that yields candidates ("break" at main loop
    # :146-150).  When True, the fuzzy tier keeps, per source document,
    # only candidates from its most specific shared key family
    # (exact-prefix < phonetic-prefix < LSH band) before scoring.
    # Default False = recall-favoring union of all key families (the
    # round-1 approximation; strictly higher recall, lower precision
    # ordering).
    ordered_cascade: bool = False
    score_batch_size: int = 16384
    normalize_batch_size: int = 4096
    max_cluster_iters: int = 25   # label-prop fixpoint bound (O(log n) typical)
    scorer_concurrency: tuple[int, int] | None = None  # None = scale to cluster CPUs
    # payload attachment for candidate pairs: when the deduped reps table
    # has at most this many rows, the (url -> text/canonical) lookup is
    # broadcast via ray.put and resolved inside the scorer actors —
    # avoiding two pair-sized payload-join shuffles (measured ~5 GB at
    # 250k pages).  Larger corpora fall back to hash joins (the only
    # option at 10^12 scale).
    broadcast_payload_max: int = 2_000_000
    # hard BYTE budget for the same broadcast: row count alone is the
    # wrong gate (2M long documents would blow the driver heap); the LUT
    # build aborts to the hash-join path the moment cumulative text bytes
    # exceed this
    broadcast_payload_max_bytes: int = 1 << 31

    def config_hash(self) -> str:
        """Stable hash of the whole config for lineage manifests."""
        d = asdict(self)
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
