"""Progressive (SOF2) JPEG decode (stages/jpeg.py round 5): multi-scan
spectral selection + successive approximation must reconstruct the SAME
quantized coefficients as the baseline encoding of the same image, so
decoded pixels are bit-identical between the two byte formats — the
pin that catches any entropy-decode desync (EOB runs, refinement
correction-bit ordering, ZRL folding)."""

from __future__ import annotations

import numpy as np
import pytest

from ehdc_llpg_address_matching_ray.stages.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 // (w - 1)), (yy * 255 // (h - 1)), ((xx + yy) * 255 // (h + w - 2))],
        axis=2,
    ).astype(np.uint8)


class TestProgressiveDecode:
    @pytest.mark.parametrize("successive", [False, True])
    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("quality", [90, 50])
    def test_pixel_identical_to_baseline(self, successive, sub, quality):
        img = _gradient()
        ref = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quality=quality, subsampling=sub, successive=successive
            )
        )
        assert np.array_equal(ref, prog)

    @pytest.mark.parametrize("successive", [False, True])
    def test_random_images_fuzz(self, successive):
        rng = np.random.default_rng(5)
        for _ in range(12):
            h, w = rng.integers(1, 40, 2)
            img = rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8)
            ref = decode_jpeg(encode_jpeg(img, quality=80))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=80, successive=successive)
            )
            assert np.array_equal(ref, prog), (h, w, successive)

    def test_grayscale(self):
        yy, xx = np.mgrid[0:40, 0:56]
        g = ((xx * yy) % 256).astype(np.uint8)
        ref = decode_jpeg(encode_jpeg(g, quality=90))
        prog = decode_jpeg(encode_jpeg_progressive(g, quality=90))
        assert np.array_equal(ref, prog)
        assert prog.shape == (40, 56, 3)

    def test_marker_is_sof2_and_multiscan(self):
        data = encode_jpeg_progressive(_gradient(), successive=True)
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        # 1 DC first + 3 AC first + 1 DC refine + 3 AC refine = 8 scans
        assert data.count(b"\xff\xda") == 8

    def test_truncated_progressive_raises(self):
        data = encode_jpeg_progressive(_gradient())
        with pytest.raises(ValueError):
            decode_jpeg(data[: len(data) * 2 // 3])

    def test_featurizer_decodes_progressive_mime(self):
        import pyarrow as pa

        from ehdc_llpg_address_matching_ray.stages.multimodal import (
            MultimodalFeaturizer,
        )

        img = _gradient(16, 16)
        payload = encode_jpeg_progressive(img, successive=True)
        batch = pa.table(
            {
                "item_id": pa.array(["p1"], pa.string()),
                "mime": pa.array(["image/jpeg"], pa.string()),
                "payload": pa.array([payload], pa.large_binary()),
            }
        )
        out = MultimodalFeaturizer(strict=True)(batch)
        assert out["width"].to_pylist() == [16]
        assert out["height"].to_pylist() == [16]
        assert out["pixel_mean"].to_pylist()[0] is not None


class TestJpegMalformed:
    def test_bit_flip_fuzz_error_contract(self):
        """Single-bit corruptions of valid baseline AND progressive
        streams must either decode or raise ValueError — never
        IndexError/KeyError/StopIteration/OverflowError (the
        featurizer's lax mode only catches ValueError)."""
        import random

        img = _gradient(24, 32)
        for data in (
            encode_jpeg(img, quality=80),
            encode_jpeg_progressive(img, quality=80, successive=True),
        ):
            rng = random.Random(2)
            for _ in range(600):
                b = bytearray(data)
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
                try:
                    decode_jpeg(bytes(b))
                except ValueError:
                    pass

    def test_crafted_huge_sof_raises_before_alloc(self):
        """A tiny payload declaring 65535x65535 must raise ValueError up
        front (the declared-blocks-vs-payload-size bound), not allocate
        gigabytes of coefficient storage."""
        import struct as _s

        data = bytearray(encode_jpeg(_gradient(8, 8), quality=80))
        sof = bytes(data).find(b"\xff\xc0")
        data[sof + 5 : sof + 9] = _s.pack(">HH", 65535, 65535)
        with pytest.raises(ValueError, match="geometry"):
            decode_jpeg(bytes(data))

    def test_dqt_redefinition_between_scans_uses_first_scan_table(self):
        """T.81 B.2.4.1: a DQT redefinition between scans applies to
        SUBSEQUENT scans only.  Build a two-scan progressive grayscale
        stream, splice a DQT redefining slot 0 to all-1s between the
        scans, and check the decode still matches the ORIGINAL table's
        decode (the component's table snapshots at its first scan)."""
        img = ((np.mgrid[0:16, 0:16][0] * 16) % 256).astype(np.uint8)
        data = encode_jpeg_progressive(img, quality=80, successive=False)
        ref = decode_jpeg(data)
        # locate the second SOS and insert a DQT before it
        first = data.find(b"\xff\xda")
        second = data.find(b"\xff\xda", first + 2)
        assert second > 0
        ones = bytes([0]) + bytes([1] * 64)
        dqt = b"\xff\xdb" + (len(ones) + 2).to_bytes(2, "big") + ones
        spliced = data[:second] + dqt + data[second:]
        assert np.array_equal(decode_jpeg(spliced), ref)
