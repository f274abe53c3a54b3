"""Blocking: exact-dup grouping, LSH key emission, in-block pair
enumeration with salted skew caps.

Reference analogues:
- exact canonical block  J2 (internal/match/generator.go:174-206) and the
  dedup-then-fanout pattern G3 (cmd/matcher-v2/enhanced_layer3.go:50-97)
- trigram GIN blocking   J4 (internal/match/generator.go:209-249) →
  MinHash-LSH band keys here (north rule)
- hierarchical cascade   J6 (internal/engine/hierarchical_matcher.go:51-153)
  → exact + phonetic prefix-token key families
- group-size caps        cmd/matcher-v2/main.go:858 capped groups at 30;
  at web scale we SALT oversized blocks instead: contiguous chunks of a
  sorted block, each chunk pair-enumerated independently, with the
  dropped cross-chunk coverage recorded (no silent truncation).

Dataflow (all Ray Data primitives, NO per-group Python):
    normalized ──partition_by_key(text_hash)──vectorized min──► rep map
    reps ──map_batches(BandKeyEmitter)──► (block_key, url, k_0..k_{nk-1})
         ──partition_by_key(block_key)──map_batches(enumerate)──► pairs
         ──join payload (url→text/canonical) twice──► scored-ready pairs

Pair dedup is FREE: a pair co-blocked under several keys is kept only in
the block of its FIRST shared key column (each row carries its full key
vector), so no global pair-dedup shuffle exists.  Ray's groupby
aggregate costs ~1 ms/group of Python — measured 115 s for a 35k-pair
dedup that the first-shared-key rule does in zero extra time.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import BlockingConfig
from ..functions import minhash as MH
from ..functions import phonetics as PH
from ..rayutil import partition_by_key


class BandKeyEmitter:
    """Stateful map_batches callable: holds the seeded permutation
    matrices (built once per actor, SURVEY.md §7.3) and emits one row per
    (row × key family): columns (block_key, url, k_0..k_{nk-1}).

    Every emitted row carries the row's FULL key vector (nk int64
    columns) so the pair enumerator can apply the first-shared-key dedup
    rule locally.  Output rows = input rows × nk; only narrow integer +
    url columns enter the shuffle — text payloads never do.
    """

    def __init__(self, cfg: BlockingConfig):
        self.cfg = cfg
        self.a, self.b = MH.make_perms(cfg.num_perm, cfg.seed)
        # per-emitter caches (emitters are worker-cached, so these warm
        # once per worker): prefix strings repeat heavily across page
        # variants of an entity, and metaphone/FNV are per-byte Python
        self._pk_cache: dict[str, tuple[int, int]] = {}

    def key_matrix(self, texts: list[str]) -> np.ndarray:
        """(n, nk) int64 key matrix: LSH band keys + optional prefix keys."""
        cfg = self.cfg
        if cfg.char_shingles:
            # vectorized whole-batch path (value-identical to the scalar
            # loop, parity-tested; ~9x faster on ~60-shingle canonicals)
            keys = MH.batch_band_keys_char(
                texts, self.a, self.b, cfg.num_bands, cfg.shingle_size
            )
        else:
            token_lists = [t.split(" ") if t else [] for t in texts]
            keys = MH.batch_band_keys(
                texts, self.a, self.b, cfg.num_bands, cfg.shingle_size, token_lists=token_lists
            )
        keys = keys.astype(np.int64)
        if cfg.use_prefix_key:
            # prefix-token equality keys (J6-cascade analogue): exact and
            # phonetic (metaphone) variants — rescue short texts whose
            # shingle Jaccard falls below the LSH threshold and DL-1
            # street-token typos
            n = len(texts)
            exact_pk = np.empty(n, dtype=np.int64)
            phon_pk = np.empty(n, dtype=np.int64)
            k = cfg.prefix_tokens
            cache = self._pk_cache
            if len(cache) > 1_000_000:  # bound worker heap
                cache.clear()
            for i, t in enumerate(texts):
                if not t:
                    exact_pk[i] = 0
                    phon_pk[i] = 0
                    continue
                key = " ".join(t.split(" ")[:k])
                hit = cache.get(key)
                if hit is None:
                    toks = key.split(" ")
                    e = MH.string_key(key)
                    p = MH.string_key(
                        "PH|"
                        + " ".join(tok if tok.isdigit() else PH.metaphone(tok) for tok in toks)
                    )
                    hit = (e, p)
                    cache[key] = hit
                exact_pk[i] = hit[0]
                phon_pk[i] = hit[1]
            keys = np.concatenate([keys, exact_pk[:, None], phon_pk[:, None]], axis=1)
        return keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["canonical"].to_pylist()
        keys = self.key_matrix(texts)
        n, nk = keys.shape
        idx = np.repeat(np.arange(n), nk)
        # id-keyed mode: when the reps carry an int64 ``nid`` column the
        # band shuffle moves ONLY integers (8 bytes/row instead of a url
        # string) and every downstream pair table is (id_a, id_b)
        id_col = "nid" if "nid" in batch.column_names else "url"
        cols: dict = {
            "block_key": pa.array(keys.reshape(-1), pa.int64()),
            id_col: batch[id_col].take(pa.array(idx)),
        }
        flat = keys[idx]  # (n*nk, nk) — each emitted row carries its full key vector
        for j in range(nk):
            cols[f"k{j:02d}"] = pa.array(flat[:, j], pa.int64())
        return pa.table(cols)


def enumerate_block_pairs(batch: pa.Table, cfg: BlockingConfig) -> pa.Table:
    """map_batches fn over ONE key-partition (batch_size=None, pyarrow —
    zero Python-object churn): sort the partition by (block_key, url),
    detect equal-key runs, enumerate pairs per run with salting caps, and
    keep a pair only when this key column is the FIRST the two rows share
    (global dedup without a shuffle).

    Note: a pair dropped by salting in its first-shared block is counted
    in that block's ``dropped_pairs`` and not rescued by later shared
    keys (they apply the same first-shared rule) — coverage loss is
    accounted, never silent.
    """
    id_mode = "nid" in batch.column_names
    id_col = "nid" if id_mode else "url"
    a_col, b_col = ("id_a", "id_b") if id_mode else ("url_a", "url_b")
    key_type = pa.int64() if id_mode else pa.string()
    sentinel = -1 if id_mode else ""
    empty = pa.table(
        {
            a_col: pa.array([], key_type),
            b_col: pa.array([], key_type),
            "dropped_pairs": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty

    order = pc.sort_indices(
        batch.select(["block_key", id_col]),
        sort_keys=[("block_key", "ascending"), (id_col, "ascending")],
    )
    batch = batch.take(order)

    nk = sum(1 for c in batch.column_names if c.startswith("k"))
    bk = batch["block_key"].to_numpy()
    K = np.stack([batch[f"k{j:02d}"].to_numpy() for j in range(nk)], axis=1)
    # band-agreement pruning inputs: the first num_bands key columns are
    # LSH bands, any later ones are prefix keys (absolute — they rescue
    # pairs the bands can't see)
    min_agree = getattr(cfg, "min_band_agreement", 1)
    n_band_cols = min(cfg.num_bands, nk)

    boundaries = np.flatnonzero(np.diff(bk)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(bk)]])
    cap = cfg.max_block_size

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    dropped_total = 0

    def _keep_pairs(ia: np.ndarray, ib: np.ndarray, keyvals: np.ndarray) -> None:
        """first-shared-key rule over flat global index vectors, plus the
        optional min-band-agreement prune (every block that sees a pair
        evaluates the same full shared-key vector, so the rule composes
        with first-shared-key dedup without any extra shuffle)."""
        Ka, Kb = K[ia], K[ib]
        shared = Ka == Kb  # (p, nk)
        cur = ((Ka == keyvals[:, None]) & (Kb == keyvals[:, None])).argmax(axis=1)
        keep = shared.argmax(axis=1) == cur
        if min_agree > 1:
            strong = shared[:, :n_band_cols].sum(axis=1) >= min_agree
            if n_band_cols < nk:
                strong |= shared[:, n_band_cols:].any(axis=1)
            keep &= strong
        if keep.any():
            out_a.append(ia[keep])
            out_b.append(ib[keep])

    # size-class batching: one vectorized triu-broadcast per distinct
    # block size instead of a Python iteration per block (block counts
    # run to millions per partition; sizes only to max_block_size).
    sizes = ends - starts
    multi = sizes >= 2
    small = multi & (sizes <= cap)
    for m in np.unique(sizes[small]):
        blk = starts[small & (sizes == m)]
        iu, il = np.triu_indices(int(m), k=1)
        p_m = len(iu)
        # chunk the block list so the flattened (B_chunk * p_m, nk) key
        # gathers stay cache-friendly
        step = max(1, 200_000 // max(1, p_m))
        for cs in range(0, len(blk), step):
            bc = blk[cs : cs + step]
            ia = (bc[:, None] + iu[None, :]).ravel()
            ib = (bc[:, None] + il[None, :]).ravel()
            _keep_pairs(ia, ib, np.repeat(bk[bc], p_m))

    # oversized blocks: salted contiguous chunks, dropped cross-chunk
    # coverage accounted (rare — loop per block is fine)
    for s, e in zip(starts[sizes > cap], ends[sizes > cap]):
        m = e - s
        iu_l, il_l = [], []
        kept = 0
        for cs in range(0, m, cap):
            cm = min(cap, m - cs)
            if cm < 2:
                continue
            a_, b_ = np.triu_indices(cm, k=1)
            iu_l.append(a_ + cs)
            il_l.append(b_ + cs)
            kept += cm * (cm - 1) // 2
        dropped_total += m * (m - 1) // 2 - kept
        if iu_l:
            iu = np.concatenate(iu_l)
            il = np.concatenate(il_l)
            _keep_pairs(s + iu, s + il, np.full(len(iu), bk[s]))

    if not out_a:
        if dropped_total:
            # row-less partitions still need the coverage metric recorded;
            # emit a sentinel row that downstream filters drop (empty urls
            # / id -1 never resolve against a payload)
            return pa.table(
                {
                    a_col: pa.array([sentinel], key_type),
                    b_col: pa.array([sentinel], key_type),
                    "dropped_pairs": pa.array([dropped_total], pa.int64()),
                }
            )
        return empty
    ia = np.concatenate(out_a)
    ib = np.concatenate(out_b)
    ids = batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
    dropped = np.zeros(len(ia), dtype=np.int64)
    dropped[0] = dropped_total
    return pa.table(
        {
            a_col: pc.take(ids, pa.array(ia)),
            b_col: pc.take(ids, pa.array(ib)),
            "dropped_pairs": pa.array(dropped, pa.int64()),
        }
    )


def build_blocks(
    reps_ds,
    cfg: BlockingConfig,
    concurrency=None,
    num_partitions: int = 8,
    attach_payload: bool = True,
):
    """reps Dataset -> unique candidate-pair Dataset.

    reps_ds columns: (url, text, canonical).  With ``attach_payload``
    (the join path) returns columns (url_a, url_b, text_a, text_b,
    canonical_a, canonical_b, dropped_pairs); otherwise the narrow
    (url_a, url_b, dropped_pairs) — the caller resolves payloads from a
    broadcast lookup inside the scorer (scoring.score_pairs payload_ref;
    shipping full texts through two pair-sized join shuffles was ~5 GB
    at 250k pages while the reps lookup is ~75 MB).

    The band shuffle moves ONLY integer keys + url either way.
    """
    from ..rayutil import ref_token, worker_cached

    _tok = ref_token(cfg)

    def _emit(batch: pa.Table) -> pa.Table:
        # task-based stateful stage: the seeded permutation matrices are
        # built once per (warm, reused) worker process instead of once
        # per freshly-spawned pool actor — no pool-startup floor
        emitter = worker_cached("band_key_emitter", _tok, lambda: BandKeyEmitter(cfg))
        return emitter(batch)

    id_mode = "nid" in reps_ds.schema().names
    id_col = "nid" if id_mode else "url"
    a_col, b_col = ("id_a", "id_b") if id_mode else ("url_a", "url_b")
    keyed = reps_ds.select_columns([id_col, "canonical"]).map_batches(
        _emit, batch_format="pyarrow", batch_size=4096
    )
    # pair enumeration FUSED into the exchange's merge task (one task
    # round + one barrier fewer than a downstream map_batches)
    pairs = partition_by_key(
        keyed,
        ["block_key"],
        num_partitions,
        sort=False,
        apply_fn=functools.partial(enumerate_block_pairs, cfg=cfg),
    )
    if not attach_payload:
        return pairs

    payload = reps_ds.select_columns([id_col, "text", "canonical"])
    side_a = payload.map_batches(
        lambda b: pa.table(
            {a_col: b[id_col], "text_a": b["text"], "canonical_a": b["canonical"]}
        ),
        batch_format="pyarrow",
    )
    side_b = payload.map_batches(
        lambda b: pa.table(
            {b_col: b[id_col], "text_b": b["text"], "canonical_b": b["canonical"]}
        ),
        batch_format="pyarrow",
    )
    from ..rayutil import engine_join

    out = engine_join(pairs, side_a, (a_col,), how="inner", num_partitions=num_partitions)
    out = engine_join(out, side_b, (b_col,), how="inner", num_partitions=num_partitions)
    return out


def _assign_rep(batch: pa.Table) -> pa.Table:
    """Within one text_hash partition: rep_url = min url per hash run
    (sort by (text_hash, url), first of each run) — pure Arrow/numpy."""
    if batch.num_rows == 0:
        return batch.append_column("rep_url", pa.array([], pa.string()))
    order = pc.sort_indices(
        batch.select(["text_hash", "url"]),
        sort_keys=[("text_hash", "ascending"), ("url", "ascending")],
    )
    b = batch.take(order)
    th = b["text_hash"].combine_chunks() if isinstance(b["text_hash"], pa.ChunkedArray) else b["text_hash"]
    is_new = np.ones(len(th), dtype=bool)
    if len(th) > 1:
        # adjacent-run detection stays in Arrow (no Python-object round-trip)
        is_new[1:] = np.invert(
            pc.equal(th.slice(1), th.slice(0, len(th) - 1)).to_numpy(zero_copy_only=False)
        )
    starts = np.flatnonzero(is_new)
    lengths = np.diff(np.concatenate([starts, [len(th)]]))
    rep_idx = np.repeat(starts, lengths)
    urls = b["url"].combine_chunks() if isinstance(b["url"], pa.ChunkedArray) else b["url"]
    return b.append_column("rep_url", pc.take(urls, pa.array(rep_idx)))


def exact_groups(normalized_ds, num_partitions: int = 8):
    """groupby(text_hash) -> (membership, reps) in ONE keyed shuffle:
    hash-partition the normalized rows by text_hash and assign each row
    its group's min-url representative inside the partition — no join,
    no per-group Python (the G3 dedup-then-score-once pattern,
    cmd/matcher-v2/enhanced_layer3.go:50-97)."""
    part = partition_by_key(normalized_ds, ["text_hash"], num_partitions, sort=False)
    membership = part.map_batches(_assign_rep, batch_format="pyarrow", batch_size=None)
    reps = membership.filter(expr="url == rep_url")
    return membership, reps
