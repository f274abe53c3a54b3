"""Declared Arrow schemas for every logical table (SURVEY.md §1.3).

The reference declares schemas in SQL migrations (42 files under
/root/reference/migrations); we declare them as pyarrow.Schema constants
and validate stage outputs against them in tests.
"""

from __future__ import annotations

import pyarrow as pa

# input_hint shape: Common-Crawl-style pages
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# normalize-stage output (html projected away — wide binary stays out of
# every shuffle, SURVEY.md §7.5)
NORMALIZED = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("canonical", pa.string()),
        ("code", pa.string()),          # postcode-analogue extracted code
        ("text_hash", pa.string()),     # md5 hex of canonical (exact-dup key)
        ("n_tokens", pa.int32()),
    ]
)

# blocking key emissions
BLOCK_KEYS = pa.schema(
    [
        ("block_key", pa.uint64()),
        ("url", pa.string()),
    ]
)

# candidate pairs after in-block enumeration + cross-band dedup.
# Production (id-keyed) blocking emits (id_a, id_b, dropped_pairs) int64
# — 63-bit url fingerprints, the same id space the cluster stage uses as
# node ids — so pair-scale shuffles never carry strings; this url-keyed
# variant is the compatibility shape for callers without a nid column.
PAIRS = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("text_a", pa.string()),
        ("text_b", pa.string()),
        ("canonical_a", pa.string()),
        ("canonical_b", pa.string()),
    ]
)

PAIRS_ID = pa.schema(
    [
        ("id_a", pa.int64()),
        ("id_b", pa.int64()),
        ("dropped_pairs", pa.int64()),
    ]
)

# scored pairs (typed feature columns replace the reference's JSONB bag,
# migrations/002_normalized_schema.sql match_result.features)
SCORED_PAIRS = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("trigram_similarity", pa.float64()),
        ("jaro_similarity", pa.float64()),
        ("levenshtein_similarity", pa.float64()),
        ("cosine_bow", pa.float64()),
        ("embedding_cosine", pa.float64()),
        ("has_same_house_num", pa.bool_()),
        ("has_same_house_alpha", pa.bool_()),
        ("locality_overlap_ratio", pa.float64()),
        ("street_overlap_ratio", pa.float64()),
        ("descriptor_penalty", pa.bool_()),
        ("phonetic_hits", pa.int32()),
        ("score", pa.float64()),
    ]
)

# per-source decisions (match_result / match_accepted analogue,
# internal/engine/matcher.go:96-130)
DECISIONS = pa.schema(
    [
        ("url", pa.string()),
        ("decision", pa.string()),       # auto_accept | review | reject
        ("accepted_url", pa.string()),
        ("top_score", pa.float64()),
        ("margin", pa.float64()),
        ("n_candidates", pa.int32()),
    ]
)

# transitive clusters
CLUSTERS = pa.schema(
    [
        ("url", pa.string()),
        ("cluster_id", pa.uint64()),
    ]
)

# final fact table (fact_documents_lean analogue,
# cmd/matcher-v2/main.go:1058-1215)
FACT = pa.schema(
    [
        ("url", pa.string()),
        ("canonical", pa.string()),
        ("text_hash", pa.string()),
        ("cluster_id", pa.uint64()),
        ("cluster_rep_url", pa.string()),
        ("cluster_size", pa.int64()),
        ("decision", pa.string()),
        ("top_score", pa.float64()),
        ("is_exact_dup", pa.bool_()),
    ]
)

# ground truth sidecar for the synthetic corpus (FIXTURES.md §1)
PAGES_TRUTH = pa.schema(
    [
        ("url", pa.string()),
        ("entity_id", pa.int64()),
    ]
)

# labeled pairs for the F1 gate (FIXTURES.md §2)
LABELED_PAIRS = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("block_key", pa.uint64()),
        ("is_match", pa.bool_()),
    ]
)
