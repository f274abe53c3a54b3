"""Audio payload plumbing: a REAL WAV (RIFF / PCM-16) codec in pure
numpy + stdlib, and an actor-pool featurizer stage.

The task brief assumes audio decode must be stubbed because the audio
libraries are absent — but canonical WAV needs none: the RIFF container
and 16-bit PCM frames parse with ``int.from_bytes`` + ``np.frombuffer``.
Like the BMP/PNG codecs in stages/multimodal.py this is an actual
byte-format decoder (chunked RIFF walk, fmt validation, multi-channel
interleave), not a deterministic fake; formats that genuinely need
codecs (mp3/ogg/aac) still raise under ``strict=True``.

Scale notes (task brief "multimodal columns"): payloads ride as
``large_binary`` with SMALL batch sizes; the stats the featurizer emits
(n_samples, rms, zero_crossings) are integer-exact so they can be
oracle-checked in SQL against the float source the test payloads are
synthesized from (pipelines/queries.py: q_audio_features).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .multimodal import FEATURE_DIMS, _decode_stub

# ---------------------------------------------------------------------------
# WAV codec (RIFF, PCM 16-bit little-endian)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 samples -> canonical 16-bit PCM WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).tobytes()  # interleaved LE
    block = ch * 2
    fmt = (
        (1).to_bytes(2, "little")          # PCM
        + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")       # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, ch) int16 samples, sample_rate).

    Walks the RIFF chunk list (fmt may be padded / followed by LIST or
    fact chunks), validates PCM-16, de-interleaves channels."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = ch = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt = int.from_bytes(body[0:2], "little")
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or bits != 16 or ch < 1:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt} bits={bits} ch={ch})"
                )
        elif tag == b"data":
            pcm = body
        pos += 8 + ln + (ln & 1)  # RIFF chunks pad to even length
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    frames = np.frombuffer(pcm, dtype="<i2")
    if ch > 1:
        frames = frames[: (len(frames) // ch) * ch].reshape(-1, ch)
    else:
        frames = frames[:, None]
    return np.ascontiguousarray(frames), rate


def _audio_features(mono: np.ndarray) -> np.ndarray:
    """Deterministic FEATURE_DIMS-bin magnitude-spectrum descriptor,
    L2-normalized (the audio twin of multimodal._image_features)."""
    if mono.size == 0:
        return np.zeros(FEATURE_DIMS, np.float32)
    mag = np.abs(np.fft.rfft(mono.astype(np.float64)))
    idx = (np.arange(mag.size) * FEATURE_DIMS) // max(mag.size, 1)
    vec = np.zeros(FEATURE_DIMS, np.float64)
    np.add.at(vec, np.minimum(idx, FEATURE_DIMS - 1), mag)
    n = np.linalg.norm(vec)
    return (vec / (n or 1.0)).astype(np.float32)


class AudioFeaturizer:
    """Actor-pool map_batches stage: decode WAV payloads and emit
    integer-exact stats + a spectral feature vector.

    ``audio/wav`` decodes for REAL; other audio mimes fall back to the
    deterministic stub or raise under ``strict=True``."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        mimes = batch["mime"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows = []
        for p, m in zip(payloads, mimes):
            p = p or b""
            if (m or "") == "audio/wav":
                try:
                    frames, rate = decode_wav(p)
                except ValueError:
                    # malformed payload: strict propagates, lax degrades
                    if self.strict:
                        raise
                    stub = _decode_stub(p, m or "")
                    rows.append(
                        {
                            "n_samples": stub["n_bytes"],
                            "n_channels": 1,
                            "sample_rate": 16000,
                            "duration_s": stub["n_bytes"] / 16000,
                            "rms": 0.0,
                            "zero_crossings": 0,
                            "features": stub["features"],
                        }
                    )
                    continue
                mono = frames[:, 0].astype(np.int64)
                n = int(mono.size)
                sum_sq = int(np.sum(mono * mono))
                rms = float(np.sqrt(sum_sq / n)) if n else 0.0
                zcr = int(np.sum((mono[:-1] * mono[1:]) < 0)) if n > 1 else 0
                rows.append(
                    {
                        "n_samples": n,
                        "n_channels": int(frames.shape[1]),
                        "sample_rate": int(rate),
                        "duration_s": n / rate if rate else 0.0,
                        "rms": rms,
                        "zero_crossings": zcr,
                        "features": _audio_features(mono),
                    }
                )
            elif self.strict:
                raise NotImplementedError(
                    f"no real decoder for mime {m!r}; only audio/wav decodes "
                    "natively — construct AudioFeaturizer(strict=False) for "
                    "the deterministic stub"
                )
            else:
                stub = _decode_stub(p, m or "")
                rows.append(
                    {
                        "n_samples": stub["n_bytes"],
                        "n_channels": 1,
                        "sample_rate": 16000,
                        "duration_s": stub["n_bytes"] / 16000,
                        "rms": 0.0,
                        "zero_crossings": 0,
                        "features": stub["features"],
                    }
                )
        feats = (
            np.stack([r["features"] for r in rows])
            if rows
            else np.zeros((0, FEATURE_DIMS), np.float32)
        )
        return pa.table(
            {
                "item_id": batch["item_id"],
                "mime": batch["mime"],
                "n_samples": pa.array([r["n_samples"] for r in rows], pa.int64()),
                "n_channels": pa.array([r["n_channels"] for r in rows], pa.int32()),
                "sample_rate": pa.array([r["sample_rate"] for r in rows], pa.int32()),
                "duration_s": pa.array([r["duration_s"] for r in rows], pa.float64()),
                "rms": pa.array([r["rms"] for r in rows], pa.float64()),
                "zero_crossings": pa.array([r["zero_crossings"] for r in rows], pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), FEATURE_DIMS
                ),
            }
        )


def featurize_audio(
    ds: rd.Dataset,
    concurrency=(1, 4),
    batch_size: int = 64,
    strict: bool = False,
) -> rd.Dataset:
    """Payload dataset -> audio feature dataset (small batches: payloads
    are wide; batch x concurrency bounds worker heap)."""
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs=dict(strict=strict),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
