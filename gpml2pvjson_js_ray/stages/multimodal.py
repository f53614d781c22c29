"""Multimodal column handling: opaque binary payloads + typed metadata.

Real Ray-side plumbing (schema, actor signature, batch sizing, output
layout); the decode kernels themselves are STUBBED because this container
ships no image/audio libraries — they either raise NotImplementedError
(strict mode) or apply a deterministic fake decode (default), clearly
marked. Swap `_decode_image_stub` for a PIL/cv2 call in production.

Batch-size note: multi-MB binary payloads need SMALL batches so
batch × concurrency fits worker heaps (ray_guide memory-aware point);
default batch_size=32 here vs thousands for text stages.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("url", pa.string()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("width", pa.int32()),            # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
])

FEATURES_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),
    ("n_bytes", pa.int64()),
    ("content_sha256", pa.string()),
    ("feature", pa.list_(pa.float32())),   # fixed-dim feature vector
    ("decoder", pa.string()),              # pil | stub (capability-gated)
])

FEATURE_DIM = 64


def _load_real_decoder():
    """Capability check: return a real image decoder when an imaging
    library is importable, else None (→ labeled stub). One attempt per
    actor, in __init__."""
    try:
        import io

        from PIL import Image

        def decode(payload: bytes) -> np.ndarray:
            img = Image.open(io.BytesIO(payload)).convert("L") \
                .resize((FEATURE_DIM, FEATURE_DIM))
            arr = np.asarray(img, dtype=np.float32)
            # column-mean luminance profile → FEATURE_DIM vector
            return arr.mean(axis=0) / 255.0

        return decode
    except ImportError:
        return None


def _decode_image_stub(payload: bytes, strict: bool) -> np.ndarray:
    """STUB decode (no imaging library in this container). Deterministic
    fake: a FEATURE_DIM histogram of payload bytes."""
    if strict:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; wire PIL/cv2 here")
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                         minlength=256).astype(np.float32)
    return counts.reshape(FEATURE_DIM, -1).sum(axis=1) / max(1, len(payload))


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize binary media payloads.

    __init__ runs once per actor (load the model / codec tables there);
    __call__ runs per batch. Use:
        media.map_batches(MediaFeatureExtractor,
                          fn_constructor_kwargs={"strict": False},
                          batch_format="pyarrow", batch_size=32,
                          concurrency=(2, 8), num_cpus=1)
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        # one-time per-actor capability check + model load
        self.real_decode = _load_real_decoder()
        if strict and self.real_decode is None:
            raise NotImplementedError(
                "strict mode requires an imaging library (PIL/cv2)")
        rng = np.random.RandomState(7)
        self.projection = rng.normal(
            size=(FEATURE_DIM, FEATURE_DIM)).astype(np.float32)

    def _decode(self, payload: bytes, kind: str) -> tuple[np.ndarray, str]:
        if kind == "image" and self.real_decode is not None:
            try:
                return self.real_decode(payload), "pil"
            except Exception:
                if self.strict:
                    raise
                # non-image bytes (or corrupt payload) → labeled stub
        return _decode_image_stub(payload, False), "stub"

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_bytes, shas, feats, decoders = [], [], [], []
        for payload, kind in zip(payloads, kinds):
            payload = payload or b""
            n_bytes.append(len(payload))
            shas.append(hashlib.sha256(payload).hexdigest())
            raw, used = self._decode(payload, kind)
            feats.append((self.projection @ raw).tolist())
            decoders.append(used)
        return pa.Table.from_pydict({
            "media_id": media_ids,
            "kind": kinds,
            "n_bytes": n_bytes,
            "content_sha256": shas,
            "feature": pa.array(feats, type=pa.list_(pa.float32())),
            "decoder": decoders,
        }, schema=FEATURES_SCHEMA)


def synth_media_dataset(n_rows: int = 64, seed: int = 11):
    """Deterministic fake media table for tests/benchmarks."""
    import ray.data as rd
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_rows):
        kind = ["image", "audio", "video"][i % 3]
        payload = zlib.compress(rng.bytes(1024 + 64 * i))
        rows.append({
            "media_id": f"m{i:05d}",
            "url": f"https://pages.synthetic.test/media/{i}",
            "kind": kind,
            "payload": payload,
            "width": 64 if kind == "image" else -1,
            "height": 64 if kind == "image" else -1,
            "sample_rate": 16000 if kind == "audio" else -1,
        })
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


def media_features(n_rows: int = 64):
    ds = synth_media_dataset(n_rows)
    return ds.map_batches(MediaFeatureExtractor,
                          fn_constructor_kwargs={"strict": False},
                          batch_format="pyarrow", batch_size=32,
                          concurrency=2, num_cpus=1)


# ---------------------------------------------------------------------------
# resize + frame-sample stages (same actor-pool pattern as featurize)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),
    ("payload", pa.large_binary()),   # resized encoded bytes
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("decoder", pa.string()),
])

FRAMES_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("frame_index", pa.int32()),
    ("frame_ts_ms", pa.int32()),
    ("frame", pa.large_binary()),     # one encoded frame per row
    ("decoder", pa.string()),
])


class MediaResizer:
    """Actor-pool stage: image resize to a fixed target. Real PIL path when
    an imaging library exists; otherwise a labeled deterministic stub that
    preserves the plumbing (payload truncation/padding to a size-dependent
    length). Small batches: payloads are multi-MB."""

    def __init__(self, target: int = 256, strict: bool = False):
        self.target = target
        self.strict = strict
        self.real_decode = _load_real_decoder()
        if strict and self.real_decode is None:
            raise NotImplementedError(
                "strict mode requires an imaging library (PIL/cv2)")

    def _resize(self, payload: bytes, kind: str) -> tuple[bytes, str]:
        if kind == "image" and self.real_decode is not None:
            try:
                import io

                from PIL import Image
                img = Image.open(io.BytesIO(payload))
                img = img.resize((self.target, self.target))
                out = io.BytesIO()
                img.save(out, format="PNG")
                return out.getvalue(), "pil"
            except Exception:
                if self.strict:
                    raise
        # STUB: deterministic size-normalized payload (hash-keyed repeat)
        n = self.target * self.target // 64
        rep = hashlib.sha256(payload).digest()
        return (rep * (n // len(rep) + 1))[:n], "stub"

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in RESIZED_SCHEMA.names}
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            resized, used = self._resize(payload or b"", kind)
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["payload"].append(resized)
            out["width"].append(self.target)
            out["height"].append(self.target)
            out["decoder"].append(used)
        return pa.Table.from_pydict(out, schema=RESIZED_SCHEMA)


class FrameSampler:
    """Actor-pool stage: sample N frames per video payload (flat_map shape:
    one input row → N frame rows). Video decoding needs codecs absent from
    this container, so frame extraction is a clearly-labeled deterministic
    stub (byte-range slices standing in for decoded frames); the Ray-side
    plumbing — 1→N row fan-out, per-frame timestamps, binary frame
    payloads, small batches — is real and tested."""

    def __init__(self, n_frames: int = 4, fps: float = 1.0):
        self.n_frames = n_frames
        self.frame_interval_ms = int(1000 / fps)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in FRAMES_SCHEMA.names}
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "video":
                continue
            payload = payload or b""
            step = max(1, len(payload) // self.n_frames)
            for i in range(self.n_frames):
                out["media_id"].append(mid)
                out["frame_index"].append(i)
                out["frame_ts_ms"].append(i * self.frame_interval_ms)
                out["frame"].append(payload[i * step:(i + 1) * step])
                out["decoder"].append("stub")
        return pa.Table.from_pydict(out, schema=FRAMES_SCHEMA)


def media_resize(n_rows: int = 64, target: int = 256):
    ds = synth_media_dataset(n_rows)
    return ds.map_batches(MediaResizer,
                          fn_constructor_kwargs={"target": target},
                          batch_format="pyarrow", batch_size=32,
                          concurrency=2, num_cpus=1)


def media_frames(n_rows: int = 64, n_frames: int = 4):
    ds = synth_media_dataset(n_rows)
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs={"n_frames": n_frames},
                          batch_format="pyarrow", batch_size=32,
                          concurrency=2, num_cpus=1)
