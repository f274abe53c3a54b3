"""Unit tests for the rule/range/component operator kernels (pure
functions, no Ray session needed)."""

from __future__ import annotations

from ehdc_llpg_address_matching_ray.functions import components as CP
from ehdc_llpg_address_matching_ray.functions import rangeexpand as RE
from ehdc_llpg_address_matching_ray.functions import rules as RU


class TestRules:
    def test_first_match_wins(self):
        out, rid, conf = RU.apply_rules("former site of 12 High Street")
        assert out == "12 HIGH STREET"
        assert rid == 5 and conf == 0.75

    def test_coop_variants(self):
        for v in ["CO-OP STORE", "COOP STORE", "CO OP STORE"]:
            out, rid, _ = RU.apply_rules(v)
            assert out == "COOPERATIVE STORE"
            assert rid == 4

    def test_rear_of(self):
        out, rid, _ = RU.apply_rules("REAR OF 12 HIGH STREET")
        assert out == "12 HIGH STREETA"  # suffix appended per the rule
        assert rid == 7

    def test_rule10_go_bug_reproduced(self):
        """Go's map[...]["$1"] compiles to "" — single N/S tokens are
        DELETED (documented divergence-as-fidelity)."""
        out, rid, _ = RU.apply_rules("12 N PARADE")
        assert rid == 10
        assert out == "12  PARADE"

    def test_no_rule(self):
        out, rid, conf = RU.apply_rules("12 High Street, Alton")
        assert out == "12 HIGH STREET, ALTON"
        assert rid == 0 and conf == 0.0


class TestRangeExpansion:
    def test_numeric_range(self):
        assert RE.generate_property_range("9", "11") == ["9", "10", "11"]

    def test_letter_range(self):
        assert RE.generate_property_range("9A", "9C") == ["9A", "9B", "9C"]

    def test_validation_rules(self):
        assert RE.is_valid_property_range("9", "11")
        assert RE.is_valid_property_range("9A", "9C")
        assert not RE.is_valid_property_range("11", "9")      # start >= end
        assert not RE.is_valid_property_range("9", "9")       # equal, no letters
        assert not RE.is_valid_property_range("1", "60")      # span > 50
        assert not RE.is_valid_property_range("0", "5")       # below 1
        assert RE.is_valid_property_range("47", "93")         # the "aggressive" case

    def test_expand_address(self):
        rows = RE.expand_address("9-11 HIGH STREET, ALTON", "9 11 HIGH STREET ALTON")
        assert [r[2] for r in rows] == ["9", "10", "11"]
        assert rows[0][0] == "9 HIGH STREET, ALTON"
        assert rows[2][0] == "11 HIGH STREET, ALTON"

    def test_no_ranges(self):
        assert RE.expand_address("12 HIGH STREET", "12 HIGH STREET") == []


class TestComponents:
    def test_extract(self):
        c = CP.extract_address_components("12A High Street, Alton, GU34 1AA")
        assert c["house_number"] == "12A"
        assert c["road"] == "HIGH STREET"
        assert c["city"] == "ALTON"
        assert c["postcode"] == "GU341AA"

    def test_is_real_address(self):
        assert CP.is_real_address("12 High Street, Alton")
        assert CP.is_real_address("The Old Cottage Farm yard")
        assert not CP.is_real_address("F12345")        # planning ref
        assert not CP.is_real_address("AU123/45")
        assert not CP.is_real_address("short")
        assert not CP.is_real_address("N/A")
        assert not CP.is_real_address(None)
        # long but no address indicator and no comma
        assert not CP.is_real_address("just some random words here")

    def test_quality_filters(self):
        assert CP.passes_quality_filters("12 High Street, Alton, GU34")
        assert not CP.passes_quality_filters("12 High St")            # too short
        assert not CP.passes_quality_filters("High Street, Alton, X")  # no leading number
        assert not CP.passes_quality_filters("12 High Street Alton")   # < 2 commas

    def test_component_score_house_veto(self):
        """P4: house-number mismatch = x0.1 penalty (the '4 MONKS ORCHARD
        != 16 MONKS ORCHARD' class)."""
        a = CP.extract_address_components("4 Monks Orchard Road, Alton, GU34 1AA")
        b = CP.extract_address_components("16 Monks Orchard Road, Alton, GU34 1AA")
        s = CP.component_score(a, b)
        assert not s.house_number_match
        assert s.overall_score <= 0.1 * 1.0 + 1e-9 or s.overall_score < 0.2

    def test_perfect_match(self):
        a = CP.extract_address_components("4 Monks Road, Alton, GU34 1AA")
        s = CP.component_score(a, dict(a))
        assert s.overall_score == 1.0
        assert CP.component_decision(s) == ("auto_accept", "auto")

    def test_decision_matrix_bands(self):
        s = CP.ComponentScore(overall_score=0.96)
        assert CP.component_decision(s)[0] == "auto_accept"
        s = CP.ComponentScore(overall_score=0.85)
        assert CP.component_decision(s)[0] == "needs_review"
        s = CP.ComponentScore(overall_score=0.65)
        assert CP.component_decision(s)[0] == "low_confidence"
        s = CP.ComponentScore(overall_score=0.3)
        assert CP.component_decision(s)[0] == "no_match"
        assert CP.component_decision(None) == ("no_match", "auto")


class TestEnhancedNormalizer:
    def test_pipeline(self):
        from ehdc_llpg_address_matching_ray.functions.enhanced import enhanced_canonical_address

        canon, pc_, toks = enhanced_canonical_address("The Co-op 12 High St Alton GU34 1AA")
        assert pc_ == "GU341AA"
        assert "COOPERATIVE" in canon
        assert canon.count("COOPERATIVE") == 1  # no self-corrupting re-match
        assert "STREET" in canon
        assert canon == " ".join(toks)
        # noise word THE removed
        assert "THE" not in toks

    def test_abbrev_anchors(self):
        from ehdc_llpg_address_matching_ray.functions.enhanced import expand_abbreviations

        assert expand_abbreviations("12 HIGH ST") == "12 HIGH STREET"
        assert expand_abbreviations("ST MARYS CHURCH LANE") == "STREET MARYS CHURCH LANE"
        assert expand_abbreviations("FOO HANTS") == "FOO HAMPSHIRE"

    def test_char_containment_is_not_jw(self):
        from ehdc_llpg_address_matching_ray.functions.enhanced import char_containment_similarity

        # per-byte containment, not real Jaro-Winkler (documented divergence)
        assert char_containment_similarity("AB", "BA") == 1.0
        assert char_containment_similarity("", "X") == 0.0

    def test_partial_string_match(self):
        from ehdc_llpg_address_matching_ray.functions.enhanced import partial_string_match

        assert partial_string_match("HIGH STREET", "HIGH ROAD") == 1 / 3
        assert partial_string_match("A B", "A B") == 1.0

    def test_match_by_components(self):
        from ehdc_llpg_address_matching_ray.functions.enhanced import match_by_components

        a = {"postcode": "GU341AA", "house_number": "12", "road": "HIGH STREET", "city": "ALTON"}
        assert match_by_components(a, dict(a)) == 1.0
        b = dict(a, house_number="14")
        assert match_by_components(a, b) < 1.0
        assert match_by_components({}, {}) == 0.0


class TestMultimodal:
    def test_featurizer_stub(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ehdc_llpg_address_matching_ray.stages.multimodal import FEATURE_DIMS, featurize

        ds = rd.from_arrow(
            pa.table(
                {
                    "item_id": ["a", "b"],
                    "mime": ["image/png", "image/jpeg"],
                    "payload": pa.array([b"\x89PNG fake", b"\xff\xd8 fake"], pa.large_binary()),
                }
            )
        )
        out = featurize(ds).to_pandas()
        assert list(out.columns) == [
            "item_id", "mime", "width", "height", "n_bytes", "crc32", "digest",
            "pixel_mean", "features",
        ]
        assert (out["n_bytes"] == [9, 7]).all()
        assert all(len(f) == FEATURE_DIMS for f in out["features"])
        # deterministic: same payload -> same features
        out2 = featurize(ds).to_pandas()
        assert out.digest.tolist() == out2.digest.tolist()

    def test_strict_mode_raises(self, ray_session):
        import pyarrow as pa
        import pytest as _pytest
        import ray
        import ray.data as rd

        from ehdc_llpg_address_matching_ray.stages.multimodal import featurize

        ds = rd.from_arrow(
            pa.table({"item_id": ["a"], "mime": ["x"], "payload": pa.array([b"z"], pa.large_binary())})
        )
        with _pytest.raises(Exception):
            featurize(ds, strict=True).materialize()

    def test_bmp_codec_roundtrip(self):
        import numpy as np

        from ehdc_llpg_address_matching_ray.stages.multimodal import decode_bmp, encode_bmp

        rng = np.random.default_rng(5)
        for h, w in ((16, 16), (7, 5), (1, 1), (3, 31)):  # odd widths hit row padding
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            out = decode_bmp(encode_bmp(img))
            assert out.shape == (h, w, 3)
            assert np.array_equal(out, img)

    def test_bmp_decode_top_down(self):
        import numpy as np

        from ehdc_llpg_address_matching_ray.stages.multimodal import decode_bmp, encode_bmp

        img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
        data = bytearray(encode_bmp(img))
        # flip the height sign to declare top-down rows, then reverse the
        # stored row order to compensate — decode must be identical
        h = int.from_bytes(data[22:26], "little", signed=True)
        data[22:26] = (-h).to_bytes(4, "little", signed=True)
        row = (3 * 3 + 3) & ~3
        body = bytes(data[54:])
        rows = [body[i * row:(i + 1) * row] for i in range(4)][::-1]
        assert np.array_equal(decode_bmp(bytes(data[:54]) + b"".join(rows)), img)

    def test_bmp_decode_rejects_garbage(self):
        import pytest as _pytest

        from ehdc_llpg_address_matching_ray.stages.multimodal import decode_bmp

        with _pytest.raises(ValueError):
            decode_bmp(b"not a bmp at all, definitely not")

    def test_jpeg_codec_roundtrip(self):
        """Baseline JPEG (stages/jpeg.py): lossy, so the gate is PSNR
        per subsampling mode + exact header geometry, plus grayscale and
        the progressive/garbage rejection paths."""
        import numpy as np
        import pytest as _pytest

        from ehdc_llpg_address_matching_ray.stages.jpeg import decode_jpeg, encode_jpeg

        yy, xx = np.mgrid[0:40, 0:56]
        img = np.stack(
            [(xx * 255 // 55), (yy * 255 // 39), ((xx + yy) * 255 // 94)], axis=2
        ).astype(np.uint8)
        for q, sub, min_psnr in ((90, "444", 40.0), (90, "420", 35.0), (50, "420", 28.0)):
            out = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            assert out.shape == img.shape
            mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
            psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
            assert psnr >= min_psnr, (q, sub, psnr)
        # odd, non-MCU-aligned sizes exercise the padding paths
        rng = np.random.default_rng(11)
        for h, w in ((1, 1), (17, 23), (8, 9)):
            small = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert decode_jpeg(encode_jpeg(small, quality=95)).shape == (h, w, 3)
        # grayscale replicates to the 3-channel output contract
        g = ((xx * yy) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=90))
        assert out.shape == (40, 56, 3)
        assert np.array_equal(out[:, :, 0], out[:, :, 1])
        with _pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")
        # a baseline stream RELABELED SOF2 is structurally invalid
        # progressive (its single scan mixes DC and AC) — rejected, not
        # mis-decoded; real SOF2 decodes (tests/test_jpeg_progressive.py)
        data = bytearray(encode_jpeg(img))
        sof = bytes(data).find(b"\xff\xc0")
        data[sof + 1] = 0xC2
        with _pytest.raises(ValueError, match="mixes DC and AC"):
            decode_jpeg(bytes(data))
        # arithmetic-coded SOF9 still rejected loudly
        data[sof + 1] = 0xC9
        with _pytest.raises(ValueError, match="coding process"):
            decode_jpeg(bytes(data))

    def test_jpeg_in_codec_registry(self):
        import numpy as np

        from ehdc_llpg_address_matching_ray.stages.multimodal import _CODECS

        dec, enc = _CODECS["image/jpeg"]
        img = np.full((9, 9, 3), 200, dtype=np.uint8)
        assert dec(enc(img)).shape == (9, 9, 3)
        assert _CODECS["image/jpg"] == _CODECS["image/jpeg"]

    def test_png_codec_roundtrip(self):
        import numpy as np

        from ehdc_llpg_address_matching_ray.stages.multimodal import decode_png, encode_png

        rng = np.random.default_rng(7)
        for h, w in ((16, 16), (7, 5), (1, 1), (3, 31)):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            out = decode_png(encode_png(img))
            assert out.shape == (h, w, 3) and np.array_equal(out, img)

    @staticmethod
    def _png_filter_forward(img, ftypes):
        """Reference forward filterer (PNG spec 4.5.2): per-row residuals
        for the given filter-type sequence."""
        import numpy as np

        h, w = img.shape[:2]
        bpp, stride = 3, w * 3
        flat = img.reshape(h, stride).astype(np.int32)
        out = np.zeros((h, 1 + stride), dtype=np.uint8)
        for y, ft in enumerate(ftypes):
            out[y, 0] = ft
            prev = flat[y - 1] if y else np.zeros(stride, np.int32)
            for x in range(stride):
                a = flat[y, x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if (x >= bpp and y) else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                out[y, 1 + x] = (flat[y, x] - pred) % 256
        return out

    def test_png_decode_all_filters(self):
        """decode_png must invert every scanline filter type, not just the
        filter-0 rows encode_png emits."""
        import zlib

        import numpy as np

        from ehdc_llpg_address_matching_ray.stages.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
        )

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
        raw = self._png_filter_forward(img, [0, 1, 2, 3, 4])
        ihdr = (6).to_bytes(4, "big") + (5).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
        data = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(data), img)

    def test_png_decode_rgba_and_crc(self):
        import zlib

        import numpy as np
        import pytest as _pytest

        from ehdc_llpg_address_matching_ray.stages.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
            encode_png,
        )

        # RGBA (color type 6): alpha dropped
        rng = np.random.default_rng(13)
        rgba = rng.integers(0, 256, (4, 3, 4), dtype=np.uint8)
        rows = np.zeros((4, 1 + 3 * 4), dtype=np.uint8)
        rows[:, 1:] = rgba.reshape(4, 12)
        ihdr = (3).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
        data = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(rows.tobytes()))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(data), rgba[:, :, :3])

        # corrupt a payload byte: CRC validation must catch it
        good = bytearray(encode_png(rgba[:, :, :3]))
        good[40] ^= 0xFF
        with _pytest.raises(ValueError):
            decode_png(bytes(good))
        with _pytest.raises(ValueError):
            decode_png(b"not a png")

    def test_resizer_png_path(self):
        import numpy as np
        import pyarrow as pa

        from ehdc_llpg_address_matching_ray.stages.multimodal import (
            ImageResizer,
            decode_png,
            encode_png,
            resize_nn,
        )

        rng = np.random.default_rng(17)
        img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
        batch = pa.table(
            {
                "item_id": ["x"],
                "mime": ["image/png"],
                "payload": pa.array([encode_png(img)], pa.large_binary()),
            }
        )
        out = ImageResizer(out_h=4, out_w=4, strict=True)(batch)
        got = decode_png(out["payload"][0].as_py())
        assert np.array_equal(got, resize_nn(img, 4, 4))

    def test_resize_nn_kernel(self):
        import numpy as np

        from ehdc_llpg_address_matching_ray.stages.multimodal import resize_nn

        img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
        out = resize_nn(img, 8, 8)
        assert out.shape == (8, 8, 3)
        # dst (y, x) samples src (2y, 2x)
        assert np.array_equal(out, img[::2, ::2])
        # non-integer ratio: floor(y*h/out_h) mapping
        out2 = resize_nn(img, 5, 7)
        rows = (np.arange(5) * 16) // 5
        cols = (np.arange(7) * 16) // 7
        assert np.array_equal(out2, img[rows][:, cols])

    def test_resize_stage_roundtrip(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ehdc_llpg_address_matching_ray.stages.multimodal import (
            decode_bmp,
            encode_bmp,
            resize_images,
        )

        rng = np.random.default_rng(11)
        imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(3)]
        ds = rd.from_arrow(
            pa.table(
                {
                    "item_id": ["a", "b", "c"],
                    "mime": ["image/bmp"] * 3,
                    "payload": pa.array([encode_bmp(i) for i in imgs], pa.large_binary()),
                }
            )
        )
        out = resize_images(ds, out_h=8, out_w=8, strict=True).to_pandas()
        got = {r.item_id: decode_bmp(r.payload) for r in out.itertuples()}
        for key, img in zip(["a", "b", "c"], imgs):
            assert np.array_equal(got[key], img[::2, ::2])

    def test_featurizer_real_bmp_path(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ehdc_llpg_address_matching_ray.stages.multimodal import (
            encode_bmp,
            encode_png,
            featurize,
        )

        img = np.full((8, 8, 3), 100, dtype=np.uint8)
        img[:, :, 2] = 200
        ds = rd.from_arrow(
            pa.table(
                {
                    "item_id": ["a", "b"],
                    "mime": ["image/bmp", "image/png"],
                    "payload": pa.array(
                        [encode_bmp(img), encode_png(img)], pa.large_binary()
                    ),
                }
            )
        )
        # strict=True: image/bmp AND image/png must decode for REAL, not raise
        out = featurize(ds, strict=True).to_pandas().set_index("item_id")
        for i in ("a", "b"):
            assert out.loc[i, "width"] == 8 and out.loc[i, "height"] == 8
            assert out.loc[i, "pixel_mean"] == (100 + 100 + 200) / 3
            feats = np.asarray(out.loc[i, "features"])
            assert abs(np.linalg.norm(feats) - 1.0) < 1e-5
        # identical pixels -> identical histogram features across codecs
        assert np.array_equal(
            np.asarray(out.loc["a", "features"]), np.asarray(out.loc["b", "features"])
        )

    def test_frame_sample(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ehdc_llpg_address_matching_ray.stages.multimodal import frame_sample

        ds = rd.from_arrow(pa.table({"item_id": ["v"] * 25, "frame_no": list(range(25))}))
        out = frame_sample(ds, every_n=10).to_pandas()
        assert out["frame_no"].tolist() == [0, 10, 20]


class TestThresholdTuner:
    def test_sweep_and_best(self):
        import numpy as np
        import pandas as pd

        from ehdc_llpg_address_matching_ray.pipelines.tuning import best_threshold, sweep_thresholds

        rng = np.random.RandomState(0)
        pos = 0.85 + 0.1 * rng.rand(200)
        neg = 0.45 + 0.25 * rng.rand(200)
        df = pd.DataFrame(
            {"score": np.concatenate([pos, neg]),
             "is_match": [True] * 200 + [False] * 200}
        )
        sw = sweep_thresholds(df)
        assert {"threshold", "precision", "recall", "f1"} <= set(sw.columns)
        # a clean separation exists around 0.75-0.85
        t = best_threshold(sw, min_precision=0.98)
        assert 0.70 <= t <= 0.86
        row = sw[sw.threshold == t].iloc[0]
        assert row.precision >= 0.98 and row.recall >= 0.95

    def test_sweep_parity_hand_computed(self):
        """Parity fixture for the D5 sweep (threshold_tuner.go:83-244):
        seven labeled pairs, every tp/fp/fn/precision/recall/F1 cell below
        computed by hand, pinned exactly (4-dp rounding as in the port)."""
        import pandas as pd

        from ehdc_llpg_address_matching_ray.pipelines.tuning import best_threshold, sweep_thresholds

        df = pd.DataFrame(
            {
                "score": [0.96, 0.91, 0.86, 0.74, 0.62, 0.55, 0.41],
                "is_match": [True, True, False, True, False, True, False],
            }
        )
        sw = sweep_thresholds(df).set_index("threshold")
        # t=0.90 -> pred {0.96,0.91}: tp=2 fp=0 fn=2 -> P=1, R=0.5
        assert (sw.loc[0.90, ["tp", "fp", "fn"]].tolist() == [2, 0, 2]
                and sw.loc[0.90, "precision"] == 1.0
                and sw.loc[0.90, "recall"] == 0.5
                and sw.loc[0.90, "f1"] == 0.6667)
        # t=0.80 -> adds the 0.86 false pair: tp=2 fp=1 fn=2
        assert (sw.loc[0.80, ["tp", "fp", "fn"]].tolist() == [2, 1, 2]
                and sw.loc[0.80, "precision"] == 0.6667
                and sw.loc[0.80, "f1"] == 0.5714)
        # t=0.70 -> adds the 0.74 true pair: tp=3 fp=1 fn=1 -> P=R=F1=0.75
        assert sw.loc[0.70, ["precision", "recall", "f1"]].tolist() == [0.75, 0.75, 0.75]
        # t=0.60 -> adds the 0.62 false pair: P=0.6 R=0.75 F1=0.6667
        assert sw.loc[0.60, ["precision", "recall", "f1"]].tolist() == [0.6, 0.75, 0.6667]
        # t=0.50 -> adds the 0.55 true pair: tp=4 fp=2 fn=0 -> R=1, F1=0.8
        assert (sw.loc[0.50, ["tp", "fp", "fn"]].tolist() == [4, 2, 0]
                and sw.loc[0.50, "precision"] == 0.6667
                and sw.loc[0.50, "recall"] == 1.0
                and sw.loc[0.50, "f1"] == 0.8)
        # operating point: P>=0.98 first holds at t=0.87 (pred {0.96,0.91}),
        # where F1 peaks (0.6667) within the qualifying band
        assert best_threshold(sw.reset_index(), min_precision=0.98) == 0.87
        # relaxed bar admits the t=0.63..0.74 band (P=0.75, F1=0.75)
        assert best_threshold(sw.reset_index(), min_precision=0.70) == 0.63


class TestAsofAndWindows:
    @staticmethod
    def _events_dir(tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        us = 1_700_000_000_000_000
        rows = [
            # user 1: view at t0, purchase at t0 (exact tie -> matches),
            # purchase at t0+10 (matches same view)
            (1, us, 1, "view", 1.0),
            (2, us, 1, "purchase", 2.0),
            (3, us + 10, 1, "purchase", 3.0),
            # user 2: purchase BEFORE any view -> unmatched; later view+purchase
            (4, us + 5, 2, "purchase", 4.0),
            (5, us + 20, 2, "view", 5.0),
            (6, us + 30, 2, "purchase", 6.0),
            # user 3: views only -> no output rows
            (7, us + 1, 3, "view", 7.0),
        ]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_asof_join_edges(self, ray_session, tmp_path):
        from ehdc_llpg_address_matching_ray.pipelines.queries import q_asof_join

        us = 1_700_000_000_000_000
        out = (
            q_asof_join(self._events_dir(tmp_path))
            .to_pandas()
            .sort_values("event_id")
            .set_index("event_id")
        )
        assert out.index.tolist() == [2, 3, 4, 6]
        # exact-tie match (allow_exact_matches / p.ts >= v.ts)
        assert out.loc[2, "view_us"] == us and out.loc[2, "gap_us"] == 0
        assert out.loc[3, "view_us"] == us and out.loc[3, "gap_us"] == 10
        # purchase before any view: unmatched sentinel
        assert out.loc[4, "view_us"] == -1 and out.loc[4, "gap_us"] == -1
        assert out.loc[6, "view_us"] == us + 20 and out.loc[6, "gap_us"] == 10

    def test_tumbling_window(self, ray_session, tmp_path):
        from ehdc_llpg_address_matching_ray.pipelines.queries import q_tumbling_window

        us = 1_700_000_000_000_000
        hour = 3_600_000_000
        win0 = (us // hour) * hour
        out = (
            q_tumbling_window(self._events_dir(tmp_path))
            .to_pandas()
            .sort_values(["window_us", "event_type"])
        )
        g = out.set_index(["window_us", "event_type"])
        assert g.loc[(win0, "purchase"), "n"] == 4
        assert g.loc[(win0, "purchase"), "sum_value"] == 2.0 + 3.0 + 4.0 + 6.0
        assert g.loc[(win0, "view"), "n"] == 3
