"""WAV codec + AudioFeaturizer stage (real RIFF/PCM-16 decode path)."""

import numpy as np
import pyarrow as pa
import pytest

from ehdc_llpg_address_matching_ray.stages.audio import (
    AudioFeaturizer,
    decode_wav,
    encode_wav,
    featurize_audio,
)


class TestWavCodec:
    def test_roundtrip_mono(self):
        rng = np.random.default_rng(3)
        s = rng.integers(-32768, 32768, 1000, dtype=np.int16)
        frames, rate = decode_wav(encode_wav(s, rate=8000))
        assert rate == 8000 and frames.shape == (1000, 1)
        assert np.array_equal(frames[:, 0], s)

    def test_roundtrip_stereo(self):
        rng = np.random.default_rng(4)
        s = rng.integers(-32768, 32768, (500, 2), dtype=np.int16)
        frames, rate = decode_wav(encode_wav(s))
        assert rate == 16000 and frames.shape == (500, 2)
        assert np.array_equal(frames, s)

    def test_extra_chunks_and_odd_padding(self):
        """RIFF walkers must skip unknown chunks and honour the odd-length
        pad byte before the data chunk."""
        s = np.array([1, -2, 3], dtype=np.int16)
        data = bytearray(encode_wav(s))
        # splice an odd-length LIST chunk between fmt and data
        fmt_end = 12 + 8 + 16
        junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # pad
        data = bytes(data[:fmt_end]) + junk + bytes(data[fmt_end:])
        data = b"RIFF" + (len(data) - 8).to_bytes(4, "little") + data[8:]
        frames, rate = decode_wav(data)
        assert np.array_equal(frames[:, 0], s)

    def test_rejects_garbage_and_nonpcm(self):
        with pytest.raises(ValueError):
            decode_wav(b"not a wav")
        data = bytearray(encode_wav(np.array([1], dtype=np.int16)))
        data[20:22] = (3).to_bytes(2, "little")  # IEEE float fmt
        with pytest.raises(ValueError):
            decode_wav(bytes(data))


class TestAudioFeaturizer:
    def _batch(self, samples, mime="audio/wav"):
        return pa.table(
            {
                "item_id": ["a"],
                "mime": [mime],
                "payload": pa.array([encode_wav(samples)], pa.large_binary()),
            }
        )

    def test_stats_hand_computed(self):
        # samples 3,-4,0,4: sum sq = 9+16+0+16 = 41; rms = sqrt(41/4)
        # zero crossings (strict sign product < 0): 3*-4 yes, -4*0 no, 0*4 no
        s = np.array([3, -4, 0, 4], dtype=np.int16)
        out = AudioFeaturizer(strict=True)(self._batch(s)).to_pydict()
        assert out["n_samples"] == [4]
        assert out["sample_rate"] == [16000]
        assert out["duration_s"] == [4 / 16000]
        assert out["rms"][0] == pytest.approx(np.sqrt(41 / 4))
        assert out["zero_crossings"] == [1]
        feats = np.asarray(out["features"][0])
        assert abs(np.linalg.norm(feats) - 1.0) < 1e-5

    def test_stereo_uses_first_channel(self):
        s = np.array([[100, 0], [-100, 0]], dtype=np.int16)
        out = AudioFeaturizer(strict=True)(self._batch(s)).to_pydict()
        assert out["n_channels"] == [2]
        assert out["zero_crossings"] == [1]
        assert out["rms"][0] == pytest.approx(100.0)

    def test_strict_rejects_unknown_mime(self):
        with pytest.raises(NotImplementedError):
            AudioFeaturizer(strict=True)(self._batch(np.array([1], np.int16), mime="audio/mp3"))

    def test_stage_over_dataset(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(9)
        tbl = pa.table(
            {
                "item_id": [f"s{i}" for i in range(10)],
                "mime": ["audio/wav"] * 10,
                "payload": pa.array(
                    [
                        encode_wav(rng.integers(-1000, 1000, 256, dtype=np.int16))
                        for _ in range(10)
                    ],
                    pa.large_binary(),
                ),
            }
        )
        out = featurize_audio(rd.from_arrow(tbl), strict=True).to_pandas()
        assert len(out) == 10
        assert (out["n_samples"] == 256).all()
        assert (out["duration_s"] == 256 / 16000).all()
