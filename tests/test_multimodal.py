"""Multimodal plumbing tests: schema, actor stages, deterministic decode."""

import pyarrow as pa
import pytest

import ray

from tera_ray.multimodal.media import (
    MEDIA_SCHEMA,
    decode_images,
    sample_frames,
    synthetic_media,
)


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_fixture_schema(self):
        t = synthetic_media(10)
        assert t.schema.equals(MEDIA_SCHEMA)
        assert t.num_rows == 10

    def test_image_decode_stage(self):
        t = synthetic_media(20)
        out = decode_images(ray.data.from_arrow(t), out_size=8,
                            concurrency=(1, 2)).take_all()
        assert len(out) == 20
        assert all(len(r["pixels"]) == 8 * 8 * 3 for r in out)
        assert all(0.0 <= r["px_mean"] <= 255.0 for r in out)

    def test_decode_deterministic_across_runs(self):
        t = synthetic_media(5)
        a = decode_images(ray.data.from_arrow(t), out_size=8,
                          concurrency=(1, 2)).take_all()
        b = decode_images(ray.data.from_arrow(t), out_size=8,
                          concurrency=(1, 2)).take_all()
        key = lambda rows: {r["media_id"]: list(r["pixels"]) for r in rows}
        assert key(a) == key(b)

    def test_frame_sampling_fans_out(self):
        t = synthetic_media(6, kind="video")
        out = sample_frames(ray.data.from_arrow(t), num_frames=3, out_size=4,
                            concurrency=(1, 2)).take_all()
        assert len(out) == 18
        per = {}
        for r in out:
            per.setdefault(r["media_id"], set()).add(r["frame_idx"])
        assert all(v == {0, 1, 2} for v in per.values())
        # distinct frames of one video decode differently (stub keyed on ts)
        f = [r for r in out if r["media_id"] == 0]
        assert list(f[0]["pixels"]) != list(f[1]["pixels"])


@pytest.mark.usefixtures("ray_session")
class TestAudioFeatures:
    def test_window_counts_and_determinism(self):
        import ray

        from tera_ray.multimodal.media import (
            extract_audio_features,
            synthetic_media,
        )

        t = synthetic_media(20, kind="audio", seed=7)
        ds = ray.data.from_arrow(t)
        rows = {r["media_id"]: r
                for r in extract_audio_features(ds).take_all()}
        assert len(rows) == 20
        durs = dict(zip(t["media_id"].to_pylist(),
                        t["duration_ms"].to_pylist()))
        for mid, r in rows.items():
            expect = min(32, max(1, (durs[mid] * 8) // (250 * 8)))
            assert r["n_windows"] == expect
            assert len(r["energy"]) == 32           # fixed-size output
            assert 0.0 <= r["rms_mean"] <= 1.5
        # deterministic across a second run
        rows2 = {r["media_id"]: r["rms_mean"]
                 for r in extract_audio_features(ds).take_all()}
        assert all(rows2[m] == rows[m]["rms_mean"] for m in rows)
