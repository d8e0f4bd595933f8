"""Multimodal stage tests: SyntheticMedia codec round-trips, feature
extraction, resize, frame sampling, failure rows."""

from __future__ import annotations

import numpy as np
import pytest

from ai_pdf_extraction_ray.stages.multimodal import (
    AudioFeatures,
    ImageFeatures,
    ImageResize,
    VideoFrameSampler,
    _decode_audio,
    _decode_image,
    encode_audio,
    encode_image,
    encode_video,
    synthesize_media_batch,
)

import pyarrow as pa


def _media_batch(rows):
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
    })


class TestCodec:
    def test_image_roundtrip(self):
        img = _decode_image(encode_image(seed=5, width=10, height=4, channels=3))
        assert img.shape == (4, 10, 3)
        # payload[i] = (5*31 + 7i) % 256
        flat = img.reshape(-1)
        assert flat[0] == (5 * 31) % 256
        assert flat[1] == (5 * 31 + 7) % 256

    def test_audio_roundtrip(self):
        rate, data = _decode_audio(encode_audio(seed=3, sample_rate=8000, n_samples=100))
        assert rate == 8000 and len(data) == 100
        assert data[2] == (3 * 17 + 2 * 13) % 256

    def test_unknown_format_raises_not_implemented(self):
        with pytest.raises(NotImplementedError):
            _decode_image(b"\x89PNG\r\n\x1a\n....")  # real codec absent -> stub

    def test_truncated_payload_rejected(self):
        good = encode_image(1, 8, 8)
        with pytest.raises(ValueError):
            _decode_image(good[:-5])


class TestStages:
    def test_image_features_exact(self):
        payload = encode_image(seed=2, width=8, height=6, channels=3)
        out = ImageFeatures()(_media_batch([(7, payload)])).to_pylist()[0]
        img = _decode_image(payload)
        assert out["width"] == 8 and out["height"] == 6 and out["channels"] == 3
        assert out["mean_pixel"] == round(float(img.mean()), 4)
        assert out["error"] is None

    def test_image_features_failure_row(self):
        out = ImageFeatures()(_media_batch([(1, b"\x89PNGgarbage")])).to_pylist()[0]
        assert out["width"] is None
        assert "unavailable" in out["error"]

    def test_resize_longest_side(self):
        payload = encode_image(seed=1, width=100, height=40, channels=3)
        out = ImageResize(max_side=25)(_media_batch([(1, payload)])).to_pylist()[0]
        img = _decode_image(out["payload"])
        assert max(img.shape[0], img.shape[1]) <= 25
        # stride sampling: pixel (0,0) preserved
        orig = _decode_image(payload)
        assert (img[0, 0] == orig[0, 0]).all()

    def test_audio_features_exact(self):
        payload = encode_audio(seed=4, sample_rate=16000, n_samples=3200)
        out = AudioFeatures()(_media_batch([(2, payload)])).to_pylist()[0]
        assert out["duration_s"] == 0.2
        _, data = _decode_audio(payload)
        expected_rms = round(float(np.sqrt(((data.astype(np.float64) - 128.0) ** 2).mean())), 4)
        assert out["rms"] == expected_rms

    def test_video_frame_sampling(self):
        payload = encode_video(seed=9, n_frames=23, width=16, height=12)
        out = VideoFrameSampler(stride=10)(_media_batch([(3, payload)])).to_pandas()
        assert out.frame_index.tolist() == [0, 10, 20]
        frame0 = _decode_image(out.payload.iloc[0])
        assert frame0.shape == (12, 16, 1)
        # frame content matches the generator formula for frame 0
        assert frame0.reshape(-1)[1] == (9 * 31 + 7) % 256

    def test_synthesize_media_deterministic(self):
        docs = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64())})
        a, b = synthesize_media_batch(docs), synthesize_media_batch(docs)
        assert a.equals(b)
        assert a.column("media_type").to_pylist() == ["image", "audio", "video", "image"]


class TestPipelines:
    def test_image_features_pipeline(self, ray_session):
        from ai_pdf_extraction_ray.stages.multimodal import image_features

        df = image_features("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 167  # doc_id % 3 == 0 of 500
        assert df.error.isna().all()
        assert (df.width >= 16).all()

    def test_video_frames_pipeline(self, ray_session):
        from ai_pdf_extraction_ray.stages.multimodal import video_frames

        df = video_frames("/root/testdata/sf0.001", stride=5).to_pandas()
        assert df.media_id.nunique() == 166  # doc_id % 3 == 2
        assert (df.frame_index % 5 == 0).all()


class TestDegenerateAudio:
    def test_zero_rate_or_empty_becomes_error_row(self):
        """A structurally valid SAUD header with rate=0 / n=0 must yield an
        error ROW, not a ZeroDivisionError task crash (failure-is-data —
        review finding)."""
        import struct

        import pyarrow as pa

        from ai_pdf_extraction_ray.stages.multimodal import AudioFeatures

        t = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([
                b"SAUD" + struct.pack("<II", 0, 0),
                encode_audio(seed=3, sample_rate=8000, n_samples=100),
            ], pa.binary()),
        })
        rows = AudioFeatures()(t).to_pylist()
        assert rows[0]["error"].startswith("degenerate audio")
        assert rows[0]["rms"] is None
        assert rows[1]["error"] is None  # healthy row unaffected
