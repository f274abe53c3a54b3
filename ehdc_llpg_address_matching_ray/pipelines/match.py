"""Two-table record linkage: source documents matched AGAINST a
gazetteer — the reference's primary production flow
(ADDRESS_MATCHING_PROCESS.md:319-354, internal/match/engine.go:55-124).

Tier cascade (each tier consumes the previous tier's leftovers — the
J10 anti-join "still unmatched" pattern, internal/engine/matcher.go:150-160):

  A1  exact legacy-key join (J1, generator.go:149-171): source carries a
      legacy id; normalize it (M12 ``.00``-strip) and hash-join the
      gazetteer key → score 1.0, auto_accept.
  A2  exact canonical equality (J2, generator.go:174-206): join on the
      canonical text hash; a UNIQUE gazetteer hit auto-accepts at 0.99,
      multiple hits go to review.
  B   MinHash-LSH + prefix-key blocking (J4/J6) as a bipartite
      block-key join, pairwise scoring (P1/P2 production blend), per-source
      decision (D1/D2).

All shuffles are keyed; hot block keys are DROPPED above a cap with the
dropped candidate volume accounted (the stop-key rule — the reference's
LIMIT 50 per trigram lookup is the one-node version of the same bound).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import BlockingConfig, MatchTiers, PipelineConfig
from ..functions import normalize as N
from ..functions import textstats as TS
from ..rayutil import (
    anti_join,
    default_concurrency,
    default_partitions,
    engine_join,
    hash_shuffle,
    partition_by_key,
)
from ..stages import decide as D
from ..stages import scoring as SC
from ..stages.blocking import BandKeyEmitter


def normalize_uprn_batch(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """M12 key hygiene (internal/matcher/engine_components_fixed.go:247-257):
    trim + strip a trailing ``.00`` decimal suffix."""
    s = pc.utf8_trim_whitespace(col.cast(pa.string()))
    return pc.replace_substring_regex(s, r"\.0+$", "")


def _normalize_side(ds: rd.Dataset, id_col: str, text_col: str, batch_size: int) -> rd.Dataset:
    """M1 canonicalization of one side; output (id, text, canonical, text_hash)."""

    def f(b: pa.Table) -> pa.Table:
        canonical, code = N.canonical_batch(b[text_col])
        return pa.table(
            {
                "id": b[id_col].cast(pa.string()),
                "text": b[text_col],
                "canonical": canonical,
                "code": code,
                "text_hash": pa.array(TS.md5_hex(canonical.to_pylist()), pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def run_match(
    sources_ds: rd.Dataset,
    gazetteer_ds: rd.Dataset,
    cfg: PipelineConfig | None = None,
    source_id: str = "src_id",
    source_text: str = "raw_address",
    source_legacy_key: str | None = None,
    gaz_id: str = "uprn",
    gaz_text: str = "full_address",
    max_key_freq: int = 256,
    fuzzy_tier: bool = True,
) -> dict[str, rd.Dataset]:
    """sources × gazetteer -> per-source match decisions.

    Returns stage datasets: ``matches`` has one row per source with
    (src_id, decision, matched_id, score, method) — method in
    {exact_key, exact_canonical, fuzzy, none}.

    ``fuzzy_tier=False`` truncates the J6 cascade after the exact tiers
    (A1/A2) — the reference's exact-phase-only run mode
    (cmd/matcher-v2/main.go exact pass before the fuzzy generations);
    tier B's blocking/scoring/decide stages are skipped entirely.
    """
    cfg = cfg or PipelineConfig()
    with hash_shuffle():
        return _run_match_inner(
            sources_ds, gazetteer_ds, cfg, source_id, source_text,
            source_legacy_key, gaz_id, gaz_text, max_key_freq, fuzzy_tier,
        )


def _run_match_inner(
    sources_ds, gazetteer_ds, cfg, source_id, source_text,
    source_legacy_key, gaz_id, gaz_text, max_key_freq, fuzzy_tier,
):
    P = default_partitions()
    conc = cfg.scorer_concurrency or default_concurrency()

    src = _normalize_side(sources_ds, source_id, source_text, cfg.normalize_batch_size)
    if source_legacy_key is not None:
        legacy = sources_ds.map_batches(
            lambda b: pa.table(
                {
                    "id": b[source_id].cast(pa.string()),
                    "legacy_key": normalize_uprn_batch(b[source_legacy_key]),
                }
            ),
            batch_format="pyarrow",
        )
        src = engine_join(src, legacy, ("id",), how="left_outer", num_partitions=P)
    src = src.materialize()
    gaz = _normalize_side(gazetteer_ds, gaz_id, gaz_text, cfg.normalize_batch_size).materialize()

    # ---- Tier A1: exact legacy-key join (J1) --------------------------------
    if source_legacy_key is not None:
        gaz_keys = gaz.map_batches(
            lambda b: pa.table({"legacy_key": b["id"], "gaz_id_a1": b["id"]}),
            batch_format="pyarrow",
        )
        with_key = src.map_batches(
            lambda b: b.filter(
                pc.and_(pc.is_valid(b["legacy_key"]), pc.not_equal(pc.coalesce(b["legacy_key"], ""), ""))
            ),
            batch_format="pyarrow",
        )
        a1 = (
            engine_join(with_key, gaz_keys, ("legacy_key",), how="inner", num_partitions=P)
            .map_batches(
                lambda b: pa.table(
                    {
                        "src_id": b["id"],
                        "matched_id": b["gaz_id_a1"],
                        "score": pa.array([1.0] * b.num_rows, pa.float64()),
                        "decision": pa.array(["auto_accept"] * b.num_rows, pa.string()),
                        "method": pa.array(["exact_key"] * b.num_rows, pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    else:
        a1 = rd.from_arrow(
            pa.table(
                {
                    "src_id": pa.array([], pa.string()),
                    "matched_id": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                    "decision": pa.array([], pa.string()),
                    "method": pa.array([], pa.string()),
                }
            )
        )

    # J10 anti-join: src rows not matched by A1 (distributed, no driver set —
    # a1 is unique on src_id because gaz ids are unique and each src carries
    # one legacy key)
    remaining = anti_join(src, a1, key="id", right_key="src_id", num_partitions=P).materialize()
    # compact: join inputs must not lead with an empty block (Ray 2.49)
    remaining = remaining.repartition(max(1, min(P, remaining.count()))).materialize()

    # ---- Tier A2: exact canonical equality (J2) -----------------------------
    gaz_hash = gaz.map_batches(
        lambda b: pa.table({"text_hash": b["text_hash"], "gaz_id_a2": b["id"]}),
        batch_format="pyarrow",
    )
    a2_hits = engine_join(remaining, gaz_hash, ("text_hash",), how="inner", num_partitions=P)

    def a2_resolve(df: pd.DataFrame) -> pd.DataFrame:
        # single gazetteer hit -> auto_accept 0.99; multiple -> review
        # (deterministic min matched id), generator.go:174-206
        g = df.sort_values(["id", "gaz_id_a2"], kind="mergesort")
        counts = g.groupby("id", sort=False)["gaz_id_a2"].transform("size")
        first = ~g["id"].duplicated()
        out = g[first].copy()
        multi = counts[first].to_numpy() > 1
        out["src_id"] = out["id"]
        out["matched_id"] = out["gaz_id_a2"]
        out["score"] = np.where(multi, 0.90, 0.99)
        out["decision"] = np.where(multi, "review", "auto_accept")
        out["method"] = "exact_canonical"
        return out[["src_id", "matched_id", "score", "decision", "method"]]

    a2 = partition_by_key(a2_hits, ["id"], P, sort=False).map_batches(
        a2_resolve, batch_format="pandas", batch_size=None
    ).materialize()

    # J10 anti-join: remaining rows not resolved by A2 (a2_resolve emits
    # exactly one row per source id, so a2 is unique on src_id)
    leftovers = anti_join(remaining, a2, key="id", right_key="src_id", num_partitions=P).materialize()
    leftovers = leftovers.repartition(max(1, min(P, leftovers.count()))).materialize()

    if not fuzzy_tier:
        # cascade truncated after the exact tiers: no blocking, scoring
        # or decide work is scheduled at all
        fuzzy = rd.from_arrow(
            pa.table(
                {
                    "src_id": pa.array([], pa.string()),
                    "matched_id": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                    "decision": pa.array([], pa.string()),
                    "method": pa.array([], pa.string()),
                }
            )
        )
        matches = a1.union(a2).materialize()
        return {
            "sources_normalized": src,
            "gazetteer_normalized": gaz,
            "tier_a1": a1,
            "tier_a2": a2,
            "candidate_pairs": fuzzy,
            "scored": fuzzy,
            "fuzzy": fuzzy,
            "matches": matches,
        }

    # ---- Tier B: bipartite LSH blocking + scoring ---------------------------
    # idf over the gazetteer canonicals via the SAME distributed
    # partial+merge fit the flagship uses (stages/correct.fit_token_df:
    # per-block partials, token-keyed exchange, capped merge) — above
    # 100k rows the driver receives only the bounded vocab table, never
    # an O(corpus) stream (the r2 driver iter_batches pass is gone)
    from ..stages import correct as CR

    token_df, n_docs = CR.fit_token_df(
        gaz.map_batches(
            lambda b: pa.table(
                {"canonical": b["canonical"], "text_hash": b["text_hash"]}
            ),
            batch_format="pyarrow",
        )
    )
    idf = SC.fit_idf(dict(token_df), n_docs)
    idf_ref = ray.put(idf)

    from ..rayutil import ref_token, worker_cached

    _ek_tok = ref_token(cfg.blocking)

    def emit_keys(side_ds: rd.Dataset, tag: str) -> rd.Dataset:
        def _emit(batch: pa.Table) -> pa.Table:
            # warm-worker task stage: permutation matrices built once per
            # worker process (no actor-pool spawn floor per side)
            em = worker_cached(
                "side_key_emitter", _ek_tok, lambda: _SideKeyEmitter(cfg.blocking)
            )
            return em(batch)

        keyed = side_ds.select_columns(["id", "canonical"]).map_batches(
            _emit, batch_format="pyarrow", batch_size=4096
        )
        return keyed.map_batches(
            lambda b: b.append_column("side", pa.array([tag] * b.num_rows, pa.string())),
            batch_format="pyarrow",
        )

    src_keys = emit_keys(leftovers, "s")
    gaz_keyed = emit_keys(gaz, "g")

    # stop-key rule: drop block keys hotter than max_key_freq on either
    # side (accounted, not silent)
    both = src_keys.union(gaz_keyed)
    part = partition_by_key(both, ["block_key"], P, sort=False)

    # J6 cascade level per key COLUMN, most specific first
    # (hierarchical_matcher.go:52-108 orders levels postcode+house →
    # locality): exact-prefix key = 0, phonetic-prefix = 1, LSH bands = 2.
    # Key columns are ordered [bands..., exact_pk, phon_pk] (BandKeyEmitter).
    def _col_levels(nk: int) -> np.ndarray:
        lv = np.full(nk, 2, dtype=np.int64)
        if cfg.blocking.use_prefix_key and nk >= 2:
            lv[-2] = 0
            lv[-1] = 1
        return lv

    def bipartite_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src_id": pa.array([], pa.string()),
                "gaz_id": pa.array([], pa.string()),
                "level": pa.array([], pa.int64()),
                "dropped_candidates": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        order = pc.sort_indices(
            batch.select(["block_key"]), sort_keys=[("block_key", "ascending")]
        )
        batch = batch.take(order)
        nk = sum(1 for c in batch.column_names if c.startswith("k"))
        bk = batch["block_key"].to_numpy()
        side_is_src = pc.equal(batch["side"], "s").to_numpy(zero_copy_only=False)
        K = np.stack([batch[f"k{j:02d}"].to_numpy() for j in range(nk)], axis=1)
        boundaries = np.flatnonzero(np.diff(bk)) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(bk)]])
        col_lv = _col_levels(nk)
        out_s, out_g, out_lv = [], [], []
        dropped = 0
        for s0, e0 in zip(starts, ends):
            sm = side_is_src[s0:e0]
            gm = ~sm
            ns, ng = int(sm.sum()), int(gm.sum())
            if ns == 0 or ng == 0:
                continue
            if ns > 256 or ng > 256:
                dropped += ns * ng
                continue
            si = np.flatnonzero(sm) + s0
            gi = np.flatnonzero(gm) + s0
            ii, jj = np.meshgrid(si, gi, indexing="ij")
            ii, jj = ii.ravel(), jj.ravel()
            # first-shared-key dedup across blocks (same rule as self-dedup)
            Ka, Kb = K[ii], K[jj]
            shared = Ka == Kb
            key_val = bk[s0]
            cur = ((Ka == key_val) & (Kb == key_val)).argmax(axis=1)
            keep = shared.argmax(axis=1) == cur
            out_s.append(ii[keep])
            out_g.append(jj[keep])
            # pair's cascade level = most specific (min) level among ALL
            # shared key columns — global info carried by the full key
            # vectors, so it is identical no matter which block keeps the
            # pair under the first-shared-key rule
            out_lv.append(np.where(shared[keep], col_lv[None, :], 99).min(axis=1))
        if not out_s or not any(len(x) for x in out_s):
            return empty
        ii = np.concatenate(out_s)
        jj = np.concatenate(out_g)
        lv = np.concatenate(out_lv)
        ids = batch["id"].combine_chunks() if isinstance(batch["id"], pa.ChunkedArray) else batch["id"]
        dcol = np.zeros(len(ii), dtype=np.int64)
        dcol[0] = dropped
        return pa.table(
            {
                "src_id": pc.take(ids, pa.array(ii)),
                "gaz_id": pc.take(ids, pa.array(jj)),
                "level": pa.array(lv, pa.int64()),
                "dropped_candidates": pa.array(dcol, pa.int64()),
            }
        )

    cand = part.map_batches(
        bipartite_pairs, batch_format="pyarrow", batch_size=None
    ).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        fuzzy = rd.from_arrow(
            pa.table(
                {
                    "src_id": pa.array([], pa.string()),
                    "matched_id": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                    "decision": pa.array([], pa.string()),
                    "method": pa.array([], pa.string()),
                }
            )
        )
        matches = a1.union(a2).union(fuzzy).materialize()
        return {
            "sources_normalized": src,
            "gazetteer_normalized": gaz,
            "tier_a1": a1,
            "tier_a2": a2,
            "candidate_pairs": cand,
            "scored": cand,
            "fuzzy": fuzzy,
            "matches": matches,
        }
    if cfg.ordered_cascade:
        # J6 break-at-first-hit (hierarchical_matcher.go:146-150): keep,
        # per source document, only candidates from its most specific
        # shared key family.  One narrow keyed exchange on
        # (src_id, gaz_id, level) — the partition owns every candidate of
        # a src, so the min is exact; less specific candidates are never
        # scored, matching the reference's per-document level loop.
        def _min_level_filter(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            df = b.to_pandas()
            keep = df["level"] == df.groupby("src_id")["level"].transform("min")
            dropped_total = int(df["dropped_candidates"].sum())
            out = df[keep].reset_index(drop=True)
            out["dropped_candidates"] = 0
            if len(out):
                out.loc[0, "dropped_candidates"] = dropped_total
            return pa.Table.from_pandas(out, preserve_index=False).cast(b.schema)

        cand = (
            partition_by_key(cand, ["src_id"], P, sort=False)
            .map_batches(_min_level_filter, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        n_cand = max(1, cand.count())

    # exact block count <= row count guarantees NO empty blocks: ray
    # 2.49's hash-join schema broadcast breaks when a join input's FIRST
    # block is empty ("No match or multiple matches for key field")
    n_blocks = max(1, min(P, -(-n_cand // cfg.score_batch_size)))
    cand = cand.repartition(n_blocks).materialize()

    # payload attach (dedup-then-rejoin, G3)
    s_payload = leftovers.map_batches(
        lambda b: pa.table({"src_id": b["id"], "text_a": b["text"], "canonical_a": b["canonical"]}),
        batch_format="pyarrow",
    )
    g_payload = gaz.map_batches(
        lambda b: pa.table({"gaz_id": b["id"], "text_b": b["text"], "canonical_b": b["canonical"]}),
        batch_format="pyarrow",
    )
    pairs = engine_join(cand, s_payload, ("src_id",), how="inner", num_partitions=P)
    pairs = engine_join(pairs, g_payload, ("gaz_id",), how="inner", num_partitions=P)
    pairs = pairs.map_batches(
        lambda b: pa.table(
            {
                "url_a": b["src_id"],
                "url_b": b["gaz_id"],
                "text_a": b["text_a"],
                "text_b": b["text_b"],
                "canonical_a": b["canonical_a"],
                "canonical_b": b["canonical_b"],
                "dropped_pairs": b["dropped_candidates"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    scored = SC.score_pairs(
        pairs, idf_ref=idf_ref, n_docs=n_docs, concurrency=conc, batch_size=cfg.score_batch_size
    ).materialize()

    # directed decide: sources only (url_a side)
    directed = scored.map_batches(
        lambda b: pa.table(
            {
                "src": b["url_a"],
                "cand": b["url_b"],
                "score": b["score"],
                "has_same_house_num": b["has_same_house_num"],
                "locality_overlap": b["locality_overlap"],
            }
        ),
        batch_format="pyarrow",
    )
    fuzzy_dec = partition_by_key(directed, ["src"], P, sort=False).map_batches(
        lambda b: D.decide_partition(b, cfg.tiers), batch_format="pyarrow", batch_size=None
    )
    fuzzy = fuzzy_dec.map_batches(
        lambda b: pa.table(
            {
                "src_id": b["url"],
                "matched_id": b["accepted_url"],
                "score": b["top_score"],
                "decision": b["decision"],
                "method": pa.array(["fuzzy"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    matches = a1.union(a2).union(fuzzy).materialize()
    return {
        "sources_normalized": src,
        "gazetteer_normalized": gaz,
        "tier_a1": a1,
        "tier_a2": a2,
        "candidate_pairs": pairs,
        "scored": scored,
        "fuzzy": fuzzy,
        "matches": matches,
    }


class _SideKeyEmitter(BandKeyEmitter):
    """BandKeyEmitter variant keeping the ``id`` column name."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["canonical"].to_pylist()
        keys = self.key_matrix(texts)
        n, nk = keys.shape
        idx = np.repeat(np.arange(n), nk)
        cols: dict = {
            "block_key": pa.array(keys.reshape(-1), pa.int64()),
            "id": batch["id"].take(pa.array(idx)),
        }
        flat = keys[idx]
        for j in range(nk):
            cols[f"k{j:02d}"] = pa.array(flat[:, j], pa.int64())
        return pa.table(cols)
