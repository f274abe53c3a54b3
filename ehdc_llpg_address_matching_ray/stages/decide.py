"""Per-source top-k + decision stage (D1/D2).

Reference: ranking internal/match/scorer.go:42-49, decision
scorer.go:142-198 (0.92 high / 0.88 conditional / 0.80 review / 0.70
floor, margin 0.03).

Scored pairs are symmetric (url_a < url_b); each side acts as a
"source document" whose candidate list is its incident pairs — so we
flat_map every pair into two directed rows, hash-partition by source
(keyed repartition, NOT groupby.map_groups: Ray's per-group Python
overhead is ~1 ms/group and the group count here equals the corpus
size), sort each partition by (src, -score) and resolve every source
with pure numpy over the equal-src runs.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import MatchTiers
from ..rayutil import partition_by_key


def _rank_codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Order-preserving integer codes for a string column: dictionary-
    encode (one hash pass), sort only the UNIQUE values, and remap the
    codes to the rank of their value — so ``rank[i] < rank[j]`` iff
    ``col[i] < col[j]`` under Arrow's binary string order.  Sorting a
    multi-million-row partition by these int64 ranks (np.lexsort) is
    several times cheaper than Arrow's comparison sort on the string
    column itself, and the uniques table is block-bounded (sources
    repeat ~tens of times within a block)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dct = col.dictionary_encode()
    codes = dct.indices.to_numpy()
    order = pc.sort_indices(dct.dictionary).to_numpy()
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    return rank[codes]


def _group_codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """First-appearance dictionary codes — a GROUPING key only (equal
    strings share a code; code order is arbitrary).  Cheaper than
    ``_rank_codes`` when the caller never relies on the sort order of
    the groups themselves."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.dictionary_encode().indices.to_numpy()


def to_directed(batch: pa.Table) -> pa.Table:
    """Each undirected scored pair -> two directed (src, cand) rows.

    Carries the D2 medium-tier features (symmetric per pair) when the
    scorer provides them."""
    base = {
        "src": pa.concat_arrays([batch["url_a"].combine_chunks(), batch["url_b"].combine_chunks()]),
        "cand": pa.concat_arrays([batch["url_b"].combine_chunks(), batch["url_a"].combine_chunks()]),
    }
    arr = batch["score"].combine_chunks()
    base["score"] = pa.concat_arrays([arr, arr])
    for col in ("has_same_house_num", "locality_overlap"):
        if col in batch.column_names:
            a = batch[col].combine_chunks()
            base[col] = pa.concat_arrays([a, a])
    return pa.table(base)


_EMPTY_DECISIONS = pa.table(
    {
        "url": pa.array([], pa.string()),
        "decision": pa.array([], pa.string()),
        "accepted_url": pa.array([], pa.string()),
        "top_score": pa.array([], pa.float64()),
        "margin": pa.array([], pa.float64()),
        "n_candidates": pa.array([], pa.int64()),
    }
)

_EMPTY_DECISIONS_ID = pa.table(
    {
        "id": pa.array([], pa.int64()),
        "decision": pa.array([], pa.string()),
        "accepted_id": pa.array([], pa.int64()),
        "top_score": pa.array([], pa.float64()),
        "margin": pa.array([], pa.float64()),
        "n_candidates": pa.array([], pa.int64()),
    }
)


def decide_partition(t, tiers: MatchTiers):
    """Vectorized per-source decision over one src-partition (Arrow in,
    Arrow out).

    Per source: sort candidates desc (done partition-wide), take top-1 +
    margin to top-2, apply the FULL D2 tier logic including the 0.88
    medium tier (scorer.go:177-188): top >= auto_accept_medium with
    margin >= winner_margin+0.02 auto-accepts when the top candidate
    shares a house number and locality overlap >= 0.5.  The feature
    columns arrive from the scorer via ``to_directed``; when absent
    (feature-less callers) the medium tier evaluates False, preserving
    the old subset semantics.

    All sorting and run detection happen on Arrow buffers / dictionary
    codes — the url strings never convert to Python/pandas objects (an
    object-string mergesort on a multi-million-row partition dominated
    this stage at scale)."""
    if isinstance(t, pd.DataFrame):  # compat: direct callers with frames
        t = pa.Table.from_pandas(t, preserve_index=False)
    if t.num_rows == 0:
        try:
            if pa.types.is_integer(t.schema.field("src").type):
                return _EMPTY_DECISIONS_ID
        except KeyError:
            pass
        return _EMPTY_DECISIONS
    # int-rank lexsort instead of Arrow's string-comparison sort (the
    # (src, -score, cand) order is identical; scores are finite in this
    # pipeline), and gather ONLY the per-source winning rows — the full
    # partition's strings are never permuted.  src is a grouping key
    # only (output rows are keyed by url, never consumed in order).
    src_r = _group_codes(t["src"])
    cand_r = _rank_codes(t["cand"])
    score_all = np.asarray(t["score"].to_numpy(zero_copy_only=False), dtype=np.float64)
    perm = np.lexsort((cand_r, -score_all, src_r))
    codes = src_r[perm]
    score = score_all[perm]
    n = len(codes)

    is_first = np.ones(n, dtype=bool)
    is_first[1:] = codes[1:] != codes[:-1]
    firsts = np.flatnonzero(is_first)
    ends = np.concatenate([firsts[1:], [n]])
    n_cands = ends - firsts

    # with the partial_top2 combiner upstream, the surviving rows are a
    # superset of each source's global top-2; the true candidate count is
    # the sum of the per-block partial counts
    if "pcount" in t.column_names:
        pcount = t["pcount"].to_numpy(zero_copy_only=False)[perm]
        n_cands = np.add.reduceat(pcount, firsts).astype(np.int64)
        has_second = (ends - firsts) >= 2
    else:
        has_second = n_cands >= 2

    top_score = score[firsts]
    second = np.full(len(firsts), np.nan)
    second[has_second] = score[firsts[has_second] + 1]
    margin = np.where(has_second, top_score - second, 1.0)

    sel_first = perm[firsts]
    auto = (top_score >= tiers.auto_accept_high) & (margin >= tiers.winner_margin)
    if "has_same_house_num" in t.column_names:
        top_house = t["has_same_house_num"].to_numpy(zero_copy_only=False)[sel_first].astype(bool)
        top_loc = t["locality_overlap"].to_numpy(zero_copy_only=False)[sel_first]
        medium = (
            (top_score >= tiers.auto_accept_medium)
            & (margin >= tiers.winner_margin + 0.02)
            & top_house
            & (top_loc >= 0.5)
        )
        auto = auto | medium
    review = ~auto & (top_score >= tiers.review_threshold)
    rejected = top_score < tiers.min_threshold
    decision = np.where(
        rejected, "reject", np.where(auto, "auto_accept", np.where(review, "review", "reject"))
    )
    first_idx = pa.array(sel_first, pa.int64())
    url = t["src"].take(first_idx).combine_chunks()
    cand_first = t["cand"].take(first_idx).combine_chunks()
    # accepted_url = top candidate where auto-accepted, else ""
    accept_mask = pa.array(auto & ~rejected)
    if pa.types.is_integer(t.schema.field("src").type):
        # int-keyed pairs: (id, accepted_id) with -1 = no accepted
        # candidate; the caller resolves ids back to urls in one small
        # rep-sized join at the end
        accepted = pc.if_else(accept_mask, cand_first, pa.scalar(-1, pa.int64()))
        return pa.table(
            {
                "id": url,
                "decision": pa.array(decision.astype(str), pa.string()),
                "accepted_id": accepted,
                "top_score": pa.array(top_score, pa.float64()),
                "margin": pa.array(margin, pa.float64()),
                "n_candidates": pa.array(n_cands, pa.int64()),
            }
        )
    accepted = pc.if_else(accept_mask, cand_first, pa.scalar("", pa.string()))

    return pa.table(
        {
            "url": url,
            "decision": pa.array(decision.astype(str), pa.string()),
            "accepted_url": accepted,
            "top_score": pa.array(top_score, pa.float64()),
            "margin": pa.array(margin, pa.float64()),
            "n_candidates": pa.array(n_cands, pa.int64()),
        }
    )


def partial_top2(batch: pa.Table) -> pa.Table:
    """Per-BLOCK top-2 candidates per source (combiner before the src
    shuffle): the global top-2 of a source is contained in the union of
    its per-block top-2s (anything better in the same block would rank
    higher there too), so top-1 + margin survive exactly; the true
    candidate count rides along as ``pcount`` partial sums.  Pairs from
    one block key are adjacent in the scored table, so sources repeat
    within blocks and the directed table shrinks severalfold (measured
    6.2x) before the decide shuffle.  Pure Arrow + numpy — the source
    strings never convert to Python objects (dictionary-encode for the
    run boundaries)."""
    n = batch.num_rows
    if n == 0:
        return batch.append_column("pcount", pa.array([], pa.int64()))
    # int-rank lexsort (same (src, -score, cand) order as the Arrow
    # string sort — scores are finite here) and a single gather of ONLY
    # the kept rows: the block's strings are never fully permuted
    # (measured 1.5x on a 1M-row block).  src only GROUPS rows here —
    # raw dictionary codes (first-appearance order) group identically
    # and skip the unique-sort; the within-group (score desc, cand asc)
    # order, which downstream exactness depends on, is unchanged.
    src_r = _group_codes(batch["src"])
    cand_r = _rank_codes(batch["cand"])
    score = np.asarray(batch["score"].to_numpy(zero_copy_only=False), dtype=np.float64)
    perm = np.lexsort((cand_r, -score, src_r))
    codes = src_r[perm]
    is_new = np.ones(n, dtype=bool)
    is_new[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(is_new)
    lengths = np.diff(np.concatenate([starts, [n]]))
    rank = np.arange(n) - np.repeat(starts, lengths)
    keep = rank < 2
    pcount = np.zeros(n, dtype=np.int64)
    pcount[starts] = lengths
    sel = pa.array(perm[keep], pa.int64())
    return batch.take(sel).append_column("pcount", pa.array(pcount[keep], pa.int64()))


def directed_top2(batch: pa.Table, release_token: str | None = None) -> pa.Table:
    """Fused ``to_directed`` + ``partial_top2``: run the per-block top-2
    combiner once per pair DIRECTION over zero-copy column aliases of
    the undirected batch, instead of materializing the doubled directed
    table (which copied every url string once more before sorting).
    Output rows/columns are identical to ``partial_top2(to_directed(b))``
    up to row order — both feed the same src-keyed exchange."""
    # scoring is complete once decide runs: release the scorer's heavy
    # per-worker state (payload copy + caches, ~0.5 GB/worker) so this
    # and later stages don't allocate under memory pressure.  The release
    # is guarded by a per-decide-run token: if a caller composed decide
    # lazily over score_pairs and the streaming executor interleaves the
    # stages, the state drops at most ONCE per worker per run instead of
    # thrashing per batch.
    from ..rayutil import release_worker_state

    release_worker_state("pair_scorer", once_token=release_token)
    feature_cols = [
        c for c in ("has_same_house_num", "locality_overlap") if c in batch.column_names
    ]
    id_mode = "id_a" in batch.column_names
    side_cols = (("id_a", "id_b"), ("id_b", "id_a")) if id_mode else (("url_a", "url_b"), ("url_b", "url_a"))
    sides = []
    for src_col, cand_col in side_cols:
        side = pa.table(
            {
                "src": batch[src_col],
                "cand": batch[cand_col],
                "score": batch["score"],
                **{c: batch[c] for c in feature_cols},
            }
        )
        sides.append(partial_top2(side))
    # a source can appear on both sides of a block's pairs, so the
    # per-side outputs hold up to 4 rows per source; one more combiner
    # pass over the (already tiny) union restores the 2-row invariant
    # before the exchange, carrying the pcount partial SUMS along
    return _recombine_top2(pa.concat_tables(sides))


def _recombine_top2(t: pa.Table) -> pa.Table:
    """Top-2 per source over an already-reduced table whose ``pcount``
    column holds partial candidate counts: keep each source's 2 best
    rows, folding the source's full pcount sum into its first row (the
    downstream ``decide_partition`` sums pcount over all of a source's
    rows, so totals are preserved exactly)."""
    n = t.num_rows
    if n == 0:
        return t
    src_r = _group_codes(t["src"])
    cand_r = _rank_codes(t["cand"])
    score = np.asarray(t["score"].to_numpy(zero_copy_only=False), dtype=np.float64)
    perm = np.lexsort((cand_r, -score, src_r))
    codes = src_r[perm]
    is_new = np.ones(n, dtype=bool)
    is_new[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(is_new)
    lengths = np.diff(np.concatenate([starts, [n]]))
    rank = np.arange(n) - np.repeat(starts, lengths)
    keep = rank < 2
    pc_in = t["pcount"].to_numpy(zero_copy_only=False)[perm]
    pc_out = np.zeros(n, dtype=np.int64)
    pc_out[starts] = np.add.reduceat(pc_in, starts)
    sel = pa.array(perm[keep], pa.int64())
    out = t.drop_columns(["pcount"]).take(sel)
    return out.append_column("pcount", pa.array(pc_out[keep], pa.int64()))


def decide(
    scored_pairs_ds,
    tiers: MatchTiers | None = None,
    num_partitions: int = 8,
    combine_batch_size: int = 1 << 18,
    post_fn=None,
):
    """scored pairs -> per-source DECISIONS Dataset.

    NOTE: the combiner (``directed_top2``) releases the scorer's heavy
    per-worker state (~0.5 GB/worker) at task entry.  The flagship
    pipeline materializes the scored dataset first (04_scored pin), so
    scoring is complete when the release fires.  A caller composing
    decide() lazily over score_pairs() interleaves the stages under
    streaming execution; the release is RUN-TOKEN-GUARDED (once per
    worker per decide call), so the worst case is ONE scorer-state
    rebuild per worker, not a per-batch drop/rebuild thrash.

    ``combine_batch_size``: the scored dataset arrives in the scorer's
    small load-balancing blocks (~32-64k rows); an explicit batch size
    makes Ray bundle several blocks per combiner task, cutting per-task
    dispatch overhead and shrinking the reduced output (top-2-per-source
    dedups over more rows at once).  Swept at 55M pairs / 32 CPUs: 256k
    is the knee — larger batches lose parallelism and pay superlinear
    sort cost (2M-row batches measured 2.8x slower than 256k)."""
    tiers = tiers or MatchTiers()
    import uuid

    run_token = uuid.uuid4().hex
    reduced = scored_pairs_ds.map_batches(
        lambda b: directed_top2(b, release_token=run_token),
        batch_format="pyarrow",
        batch_size=combine_batch_size,
    )
    # decide_partition (and the caller's optional post-transform, e.g.
    # the flagship's id->url resolve) run INSIDE the src-keyed exchange's
    # merge task: two task rounds and their object-store round-trips
    # fewer than chained map_batches
    return partition_by_key(
        reduced,
        ["src"],
        num_partitions,
        sort=False,
        apply_fn=functools.partial(_decide_apply, tiers=tiers, post_fn=post_fn),
    )


def _decide_apply(batch: pa.Table, tiers, post_fn=None) -> pa.Table:
    out = decide_partition(batch, tiers)
    return post_fn(out) if post_fn is not None else out
