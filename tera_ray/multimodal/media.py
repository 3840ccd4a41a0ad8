"""Multimodal columns: opaque binary payloads + typed metadata.

Engine-first addition for training-data pipelines: image/audio/video
travel as ``binary`` columns with sidecar metadata columns; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages.  The decode kernels themselves are STUBBED — no PIL/ffmpeg in
this container — behind ``_HAVE_PIL``-style gates with a deterministic
fake used by tests; everything Ray-side (schema, batch sizing, actor
signature, output layout) is real and tested.

Scale notes: binary payloads dominate block size, so these stages use
SMALL ``batch_size`` (default 64) and actor pools sized by
``concurrency``; outputs carry fixed-size tensor columns
(``FixedSizeListArray``) so downstream stages stay zero-copy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),          # images/video
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),    # audio/video
])

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: pixels derived from a
    SHA-256 keystream of the payload (stable across runs/workers)."""
    n = w * h * 3
    out = np.empty(n, np.uint8)
    seed = hashlib.sha256(payload).digest()
    block = hashlib.sha256()
    pos = 0
    counter = 0
    while pos < n:
        block = hashlib.sha256(seed + counter.to_bytes(4, "little")).digest()
        take = min(32, n - pos)
        out[pos:pos + take] = np.frombuffer(block[:take], np.uint8)
        pos += take
        counter += 1
    return out.reshape(h, w, 3)


class ImageDecodeStage:
    """Actor-pool stage: payload → fixed-size RGB tensor (+ mean/std
    features).  Real decode would go through PIL in ``_decode``; the
    Ray-side contract (constructor state, per-batch tensor output) is
    identical either way."""

    def __init__(self, out_size: int = 32):
        self.out = out_size

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if _HAVE_PIL:  # pragma: no cover
            raise NotImplementedError(
                "real decode path requires PIL at runtime; wire "
                "PIL.Image.open(io.BytesIO(payload)) here")
        return _fake_pixels(payload, w, h)

    def _resize(self, px: np.ndarray) -> np.ndarray:
        """Nearest-neighbor resize to (out, out) — pure numpy gather."""
        h, w, _ = px.shape
        yi = (np.arange(self.out) * h // self.out)
        xi = (np.arange(self.out) * w // self.out)
        return px[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        n = len(pay)
        d = self.out * self.out * 3
        tens = np.empty((n, d), np.uint8)
        means = np.empty(n, np.float64)
        stds = np.empty(n, np.float64)
        for i in range(n):
            px = self._resize(self._decode(pay[i], ws[i], hs[i]))
            tens[i] = px.reshape(-1)
            means[i] = px.mean()
            stds[i] = px.std()
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pa.FixedSizeListArray.from_arrays(
                pa.array(tens.reshape(-1), pa.uint8()), d),
            "px_mean": pa.array(means),
            "px_std": pa.array(stds),
        })


class FrameSampleStage:
    """Actor-pool stage: video payload → k evenly-spaced frame tensors
    (one output row per frame — a flat_map-shaped batch transform)."""

    def __init__(self, num_frames: int = 4, out_size: int = 16):
        self.k = num_frames
        self.decoder = ImageDecodeStage(out_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, tensors = [], [], []
        d = self.decoder.out * self.decoder.out * 3
        for mid, pay, w, h, dur in zip(
                batch["media_id"].to_pylist(), batch["payload"].to_pylist(),
                batch["width"].to_pylist(), batch["height"].to_pylist(),
                batch["duration_ms"].to_pylist()):
            for f in range(self.k):
                ts = (dur or 0) * f // max(1, self.k)
                # frame decode stub: payload + frame timestamp → pixels
                px = self.decoder._resize(
                    self.decoder._decode(pay + ts.to_bytes(4, "little"), w, h))
                ids.append(mid)
                frames.append(f)
                tensors.append(px.reshape(-1))
        flat = (np.concatenate(tensors) if tensors
                else np.empty(0, np.uint8))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
            "pixels": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.uint8()), d),
        })


class AudioFeatureStage:
    """Actor-pool stage: audio payload → fixed-size per-window energy
    features (one row per clip; ``n_windows`` derived from duration at
    ``window_ms``, capped at ``max_windows`` and zero-padded — fixed-size
    outputs keep downstream Arrow zero-copy).  The PCM decode is stubbed
    like the image path (``_fake_pixels``-style keystream); swapping in a
    real decoder only replaces ``_decode_pcm``."""

    def __init__(self, window_ms: int = 250, max_windows: int = 32):
        self.window_ms = window_ms
        self.max_windows = max_windows

    def _decode_pcm(self, payload: bytes, duration_ms: int) -> np.ndarray:
        # 8 samples per ms of deterministic fake PCM in [-1, 1)
        n = max(1, int(duration_ms)) * 8
        raw = _fake_pixels(payload, n, 1).reshape(-1)[:n]
        return raw.astype(np.float32) / 128.0 - 1.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        pays = batch["payload"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        k = self.max_windows
        feats = np.zeros((len(pays), k), np.float32)
        n_win = np.zeros(len(pays), np.int32)
        for i, (pay, dur) in enumerate(zip(pays, durs)):
            pcm = self._decode_pcm(pay, dur or 0)
            wlen = self.window_ms * 8
            nw = min(k, max(1, len(pcm) // wlen))
            n_win[i] = nw
            for wi in range(nw):
                seg = pcm[wi * wlen:(wi + 1) * wlen]
                feats[i, wi] = np.sqrt(np.mean(seg * seg))  # RMS energy
        return pa.table({
            "media_id": batch["media_id"],
            "n_windows": pa.array(n_win, pa.int32()),
            "energy": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), k),
            "rms_mean": pa.array(
                [float(feats[i, :n_win[i]].mean()) for i in range(len(pays))],
                pa.float64()),
        })


def extract_audio_features(ds, window_ms: int = 250, max_windows: int = 32,
                           concurrency=(1, 8), batch_size: int = 64):
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"window_ms": window_ms,
                               "max_windows": max_windows},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def synthetic_media(n: int, kind: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic fixture media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(256))) for _ in range(n)]
    w = rng.randint(16, 64, n).astype(np.int32)
    h = rng.randint(16, 64, n).astype(np.int32)
    dur = rng.randint(1000, 10_000, n).astype(np.int32)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kind] * n),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array([f"{kind}/x-synthetic"] * n),
        "width": pa.array(w),
        "height": pa.array(h),
        "duration_ms": pa.array(dur),
    }, schema=MEDIA_SCHEMA)


def decode_images(ds, out_size: int = 32, concurrency=(1, 8),
                  batch_size: int = 64):
    return ds.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"out_size": out_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_frames(ds, num_frames: int = 4, out_size: int = 16,
                  concurrency=(1, 8), batch_size: int = 16):
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"num_frames": num_frames, "out_size": out_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
