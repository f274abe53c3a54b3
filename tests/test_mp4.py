"""ISO BMFF keyframe sampling (stages/mp4.py + Mp4KeyframeSampler):
writer→parser roundtrip, sample-table walk across chunks, stss/all-sync
semantics, malformed-input behavior, strict/lax stage modes."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ehdc_llpg_address_matching_ray.stages.mp4 import (
    build_mp4,
    keyframes,
    video_samples,
)
from ehdc_llpg_address_matching_ray.stages.multimodal import Mp4KeyframeSampler


def _samples(n: int) -> list[bytes]:
    return [f"frame-{i}".encode() * (i + 1) for i in range(n)]


class TestMp4Container:
    def test_keyframe_roundtrip_multi_chunk(self):
        smp = _samples(7)
        data = build_mp4(smp, sync=[1, 4, 7], chunks=3)
        kf = keyframes(data)
        assert [(n, t) for n, t, _ in kf] == [(1, 0), (4, 300), (7, 600)]
        assert [p for _, _, p in kf] == [smp[0], smp[3], smp[6]]

    def test_no_stss_means_all_sync(self):
        smp = _samples(5)
        kf = keyframes(build_mp4(smp, sync=None, chunks=2))
        assert [p for _, _, p in kf] == smp

    def test_single_chunk_and_timescale(self):
        data = build_mp4(_samples(4), sync=[2], timescale=90_000, delta=3000, chunks=1)
        samples, ts = video_samples(data)
        assert ts == 90_000
        assert [s.ts for s in samples] == [0, 3000, 6000, 9000]
        assert [s.is_sync for s in samples] == [False, True, False, False]

    def test_max_frames_bound(self):
        data = build_mp4(_samples(9), sync=None)
        assert len(keyframes(data, max_frames=3)) == 3

    def test_malformed_raises_value_error(self):
        good = build_mp4(_samples(3))
        for bad in (b"", b"\x00\x00\x00\x08ftyp"[:6], good[: len(good) // 2]):
            with pytest.raises(ValueError):
                keyframes(bad)

    def test_no_video_track_raises(self):
        with pytest.raises(ValueError):
            keyframes(b"\x00\x00\x00\x08mdat")


class TestMp4Stage:
    def _batch(self, payload: bytes, mime: str = "video/mp4") -> pa.Table:
        return pa.table(
            {
                "item_id": pa.array(["x"], pa.string()),
                "mime": pa.array([mime], pa.string()),
                "payload": pa.array([payload], pa.large_binary()),
            }
        )

    def test_explodes_keyframes(self):
        smp = _samples(6)
        out = Mp4KeyframeSampler()(self._batch(build_mp4(smp, sync=[1, 5])))
        assert out["sample_no"].to_pylist() == [1, 5]
        assert out["payload"].to_pylist() == [smp[0], smp[4]]
        assert out["timescale"].to_pylist() == [1000, 1000]

    def test_strict_rejects_other_mimes_lax_skips(self):
        b = self._batch(b"not an mp4", mime="video/webm")
        assert Mp4KeyframeSampler()(b).num_rows == 0
        with pytest.raises(NotImplementedError):
            Mp4KeyframeSampler(strict=True)(b)

    def test_strict_propagates_malformed_lax_skips(self):
        b = self._batch(b"garbage")
        assert Mp4KeyframeSampler()(b).num_rows == 0
        with pytest.raises(ValueError):
            Mp4KeyframeSampler(strict=True)(b)


class TestMp4Malformed:
    def test_bit_flip_fuzz_error_contract(self):
        """Every single-bit corruption of a valid file must either still
        decode or raise ValueError — never struct.error/IndexError (the
        lax stage only catches ValueError) and never an unbounded
        allocation (declared counts are sanity-bounded by file size)."""
        import random

        good = build_mp4(_samples(7), sync=[1, 4, 7], chunks=3)
        rng = random.Random(1)
        for _ in range(800):
            b = bytearray(good)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                keyframes(bytes(b))
            except ValueError:
                pass

    def test_corrupt_count_fields_raise_not_allocate(self):
        """Flipping a table count high (the 48 GB-allocation shape) must
        raise ValueError up front."""
        import struct as _s

        good = build_mp4(_samples(5), sync=[1], chunks=2)
        for four in (b"stts", b"stsz", b"stco", b"stss", b"stsc"):
            pos = good.find(four)
            assert pos > 0, four
            # count field: fullbox version/flags (4 bytes) after the
            # fourcc, then the 32-bit count (stsz: skip fixed-size too)
            cpos = pos + 8 + (4 if four == b"stsz" else 0)
            bad = bytearray(good)
            bad[cpos : cpos + 4] = _s.pack(">I", 0x7FFFFFFF)
            with pytest.raises(ValueError):
                keyframes(bytes(bad))
