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
        """Decoder seam — the ONLY method a real codec replaces.
        Contract (enforced by tests/test_multimodal.py's contract
        test): returns ``uint8`` pixels shaped ``(h', w', 3)`` for any
        positive dims; everything downstream (resize, tensor layout,
        output schema) is decoder-independent."""
        if _HAVE_PIL:  # pragma: no cover - PIL absent in this container
            return self._decode_real(payload)
        return _fake_pixels(payload, w, h)

    def _decode_real(self, payload: bytes) -> np.ndarray:  # pragma: no cover
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)

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


# deterministic corruption cadence for the mixed fixture (every k-th row)
_CORRUPTIONS = (
    (13, "empty_payload"),
    (17, "mime_mismatch"),
    (19, "bad_dims"),
    (23, "bad_duration"),
)


def synthetic_media_mixed(n: int, seed: int = 42) -> pa.Table:
    """Heterogeneous fixture: kinds cycle image/audio/video and a
    deterministic subset of rows is corrupted (empty payload, wrong
    mime prefix, non-positive dims/duration) so the validation stage
    has real dead letters to catch.  Pure function of ``(n, seed)`` —
    the SQL oracle reads the identical parquet."""
    kinds = ["image", "audio", "video"]
    t = synthetic_media(n, seed=seed)
    kind = [kinds[i % 3] for i in range(n)]
    mime = [f"{k}/x-synthetic" for k in kind]
    payload = t["payload"].to_pylist()
    width = t["width"].to_pylist()
    height = t["height"].to_pylist()
    dur = t["duration_ms"].to_pylist()
    for i in range(n):
        if i and i % 13 == 0:
            payload[i] = b""
        elif i and i % 17 == 0:
            mime[i] = "application/octet-stream"
        elif i and i % 19 == 0 and kind[i] in ("image", "video"):
            width[i] = 0
        elif i and i % 23 == 0 and kind[i] in ("audio", "video"):
            dur[i] = -1
    return pa.table({
        "media_id": t["media_id"],
        "kind": pa.array(kind, pa.string()),
        "payload": pa.array(payload, pa.binary()),
        "mime": pa.array(mime, pa.string()),
        "width": pa.array(width, pa.int32()),
        "height": pa.array(height, pa.int32()),
        "duration_ms": pa.array(dur, pa.int32()),
    }, schema=MEDIA_SCHEMA)


def validate_media(ds):
    """Metadata/dead-letter gate ahead of any decode stage: every row
    gets ``(media_id, ok, reason)`` with the FIRST failing check (fixed
    priority) as the reason — the media analog of the NT reader's
    dead-letter rows.  All checks are Arrow kernels over metadata and
    ``binary_length``; payload bytes are never touched, so the gate
    runs at metadata speed even when payloads are megabytes.

    Checks, in priority order:

    1. ``empty_payload`` — null or zero-length payload
    2. ``unknown_kind`` — kind ∉ {image, audio, video}
    3. ``mime_mismatch`` — mime prefix (before ``/``) ≠ kind
    4. ``bad_dims`` — image/video with null/non-positive width or height
    5. ``bad_duration`` — audio/video with null/non-positive duration_ms
    """
    def check(t: pa.Table) -> pa.Table:
        decided, reason = _validity(t)
        import pyarrow.compute as pc

        return pa.table({
            "media_id": t["media_id"],
            "ok": pc.invert(decided),
            "reason": reason,
        })

    return ds.map_batches(check, batch_format="pyarrow")


def _validity(t: pa.Table):
    """Shared validity kernel → (failed mask, first-failure reason)."""
    import pyarrow.compute as pc

    if True:
        n = t.num_rows
        pay = t["payload"].combine_chunks() if isinstance(
            t["payload"], pa.ChunkedArray) else t["payload"]
        kind = t["kind"]
        mime_pre = pc.replace_substring_regex(
            pc.fill_null(t["mime"], ""), "/.*$", "")
        plen = pc.fill_null(pc.binary_length(pay), 0)
        visual = pc.is_in(kind, value_set=pa.array(["image", "video"]))
        timed = pc.is_in(kind, value_set=pa.array(["audio", "video"]))
        w = pc.fill_null(t["width"], 0)
        h = pc.fill_null(t["height"], 0)
        d = pc.fill_null(t["duration_ms"], 0)
        checks = [
            ("empty_payload", pc.equal(plen, 0)),
            ("unknown_kind", pc.invert(pc.is_in(
                kind, value_set=pa.array(["image", "audio", "video"])))),
            ("mime_mismatch", pc.not_equal(mime_pre, kind)),
            ("bad_dims", pc.and_(visual, pc.or_(
                pc.less_equal(w, 0), pc.less_equal(h, 0)))),
            ("bad_duration", pc.and_(timed, pc.less_equal(d, 0))),
        ]
        reason = pa.nulls(n, pa.string())
        decided = pa.array([False] * n, pa.bool_())
        for name, mask in checks:
            hit = pc.and_(pc.fill_null(mask, True), pc.invert(decided))
            reason = pc.if_else(hit, pa.scalar(name, pa.string()), reason)
            decided = pc.or_(decided, hit)
        return decided, reason


def filter_valid_media(ds):
    """Map-side gate: keep only rows that pass :func:`validate_media`'s
    checks (full rows stream through; zero shuffle) — the stage you put
    directly ahead of a decode pool."""
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        decided, _ = _validity(t)
        return t.filter(pc.invert(decided))

    return ds.map_batches(keep, batch_format="pyarrow")


class MediaDispatchStage:
    """Per-format dispatch in ONE actor-pool pass over a heterogeneous
    media table: each batch is sliced by ``kind`` and routed to the
    matching decode stage; outputs share a fixed common schema
    ``(media_id, kind, n_units, feat float32[feat_dim])`` so the union
    stays a single zero-copy Dataset.  ``n_units``: 1 for images,
    windows for audio, frames for video.  Swapping a stub decoder for a
    real codec only replaces the inner stage — dispatch is unchanged."""

    FEAT_DIM = 16

    def __init__(self, out_size: int = 16, window_ms: int = 250,
                 num_frames: int = 2):
        self.img = ImageDecodeStage(out_size)
        self.aud = AudioFeatureStage(window_ms, self.FEAT_DIM)
        self.vid = FrameSampleStage(num_frames, out_size)
        self.num_frames = num_frames

    def _pad(self, rows: np.ndarray) -> pa.Array:
        k = self.FEAT_DIM
        out = np.zeros((len(rows), k), np.float32)
        m = min(k, rows.shape[1]) if rows.size else 0
        if m:
            out[:, :m] = rows[:, :m]
        return pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), pa.float32()), k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = []
        empty = pa.table({
            "media_id": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "n_units": pa.array([], pa.int32()),
            "feat": pa.FixedSizeListArray.from_arrays(
                pa.array([], pa.float32()), self.FEAT_DIM),
        })
        for kind in ("image", "audio", "video"):
            sub = batch.filter(pc.equal(batch["kind"], kind))
            if sub.num_rows == 0:
                continue
            if kind == "image":
                dec = self.img(sub)
                feats = np.stack([
                    dec["px_mean"].to_numpy(zero_copy_only=False),
                    dec["px_std"].to_numpy(zero_copy_only=False)], axis=1)
                n_units = np.ones(sub.num_rows, np.int32)
                ids = dec["media_id"]
            elif kind == "audio":
                dec = self.aud(sub)
                feats = np.asarray(dec["energy"].combine_chunks()
                                   .flatten().to_numpy(zero_copy_only=False)
                                   ).reshape(sub.num_rows, -1)
                n_units = dec["n_windows"].to_numpy(zero_copy_only=False)
                ids = dec["media_id"]
            else:
                dec = self.vid(sub)  # one row PER FRAME
                px = np.asarray(dec["pixels"].combine_chunks().flatten()
                                .to_numpy(zero_copy_only=False), np.float64)
                per_frame = px.reshape(len(dec), -1).mean(axis=1)
                feats = per_frame.reshape(sub.num_rows, self.num_frames)
                n_units = np.full(sub.num_rows, self.num_frames, np.int32)
                ids = sub["media_id"]
            outs.append(pa.table({
                "media_id": ids if isinstance(ids, (pa.Array, pa.ChunkedArray))
                else pa.array(ids, pa.int64()),
                "kind": pa.array([kind] * sub.num_rows, pa.string()),
                "n_units": pa.array(np.asarray(n_units, np.int32)),
                "feat": self._pad(np.asarray(feats, np.float32)),
            }))
        if not outs:
            return empty
        return pa.concat_tables(outs, promote_options="none")


def dispatch_media(ds, out_size: int = 16, window_ms: int = 250,
                   num_frames: int = 2, concurrency=(1, 8),
                   batch_size: int = 64):
    return ds.map_batches(
        MediaDispatchStage,
        fn_constructor_kwargs={"out_size": out_size, "window_ms": window_ms,
                               "num_frames": num_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
