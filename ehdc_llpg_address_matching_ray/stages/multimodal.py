"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed by actor-pool map_batches stages.

The image/audio decode libraries are not available in this environment,
so the DECODE KERNEL is stubbed behind a deterministic fake (or raises
NotImplementedError in strict mode) — but everything Ray-side is real
and tested: schema contract, actor signature, batch sizing for wide
binary rows, and the output layout.  Swapping ``_decode_stub`` for a
real decoder (PIL / torchaudio / ffmpeg) changes nothing else.

Design notes for 100 TB (task brief "multimodal columns"):
- payloads ride as ``large_binary``; keep ``batch_size`` SMALL for these
  stages (payload x batch x concurrency must fit the worker heap).
- metadata (mime, width/height/duration) are plain typed columns so
  filters/joins never touch the payload.
- feature outputs are fixed-width ``list<float>`` ready for the
  embedding-similarity operators (queries: ann_topk / neardup).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

import ray.data as rd

PAYLOAD_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
    ]
)

FEATURE_DIMS = 64


def _decode_stub(payload: bytes, mime: str) -> dict:
    """Deterministic fake decoder.

    Real deployments replace this with PIL/ffmpeg; the fake derives
    stable pseudo-metadata + a unit-norm feature vector from the payload
    bytes so downstream tests have exact expectations.
    """
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    rng_seed = int.from_bytes(h[:4], "big")
    rng = np.random.RandomState(rng_seed)
    vec = rng.standard_normal(FEATURE_DIMS)
    norm = np.linalg.norm(vec)
    return {
        "width": int(width),
        "height": int(height),
        "n_bytes": len(payload),
        "crc32": zlib.crc32(payload) & 0x7FFFFFFF,
        "digest": h.hex(),
        "features": (vec / (norm or 1.0)).astype(np.float32),
    }


class MultimodalFeaturizer:
    """Actor-pool map_batches stage: decode + feature-extract binary
    payloads (ST2/ST3 pattern: model slot loaded once per actor).

    ``strict=True`` raises NotImplementedError on decode — the marker
    that a real decoder must be plugged in before production use.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        # model-load slot: a real implementation opens its decoder/model
        # HERE, once per actor — never per batch.

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real image/audio decode is not available in this environment; "
                "construct MultimodalFeaturizer(strict=False) for the deterministic stub"
            )
        ids = batch["item_id"]
        mimes = batch["mime"].to_pylist()
        payloads = batch["payload"].to_pylist()
        metas = [_decode_stub(p or b"", m or "") for p, m in zip(payloads, mimes)]
        feats = np.stack([m["features"] for m in metas]) if metas else np.zeros((0, FEATURE_DIMS), np.float32)
        return pa.table(
            {
                "item_id": ids,
                "mime": batch["mime"],
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
                "crc32": pa.array([m["crc32"] for m in metas], pa.int64()),
                "digest": pa.array([m["digest"] for m in metas], pa.string()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), FEATURE_DIMS
                ),
            }
        )


def featurize(
    ds: rd.Dataset,
    concurrency=(1, 4),
    batch_size: int = 64,
    strict: bool = False,
) -> rd.Dataset:
    """Binary-payload dataset -> features dataset.

    ``batch_size`` defaults SMALL: payloads are wide; 64 rows x ~1 MB x
    concurrency bounds worker heap use (task-brief guidance).
    """
    return ds.map_batches(
        MultimodalFeaturizer,
        fn_constructor_kwargs=dict(strict=strict),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(ds: rd.Dataset, every_n: int = 10) -> rd.Dataset:
    """Frame-sampling analogue for video-like payload sequences: keep
    every Nth item per stream — expressed as a plain vectorized filter
    over (item_id, frame_no) metadata, payload untouched."""

    def f(b: pa.Table) -> pa.Table:
        frames = b["frame_no"].to_numpy() if b.num_rows else np.empty(0, dtype=np.int64)
        keep = pa.array((frames % every_n) == 0)
        return b.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")
