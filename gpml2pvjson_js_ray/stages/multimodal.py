"""Multimodal column handling: opaque binary payloads + typed metadata.

Decode paths, in priority order per payload:
- PIL/cv2 when importable (capability check once per actor) — the
  production path for compressed formats (PNG/JPEG/...); labeled "pil".
- A REAL pure-numpy PPM (P6) codec that needs no external library —
  decode, featurize, resize, and (for video-as-concatenated-frames)
  frame splitting all genuinely run in this container; labeled "ppm" /
  "ppm-seq". The synthetic media corpus emits PPM payloads so the whole
  pipeline exercises real decode end-to-end in CI.
- A clearly-labeled deterministic stub for bytes neither path can
  decode (labeled "stub"; strict=True raises instead).

Batch-size note: multi-MB binary payloads need SMALL batches so
batch × concurrency fits worker heaps (ray_guide memory-aware point);
default batch_size=32 here vs thousands for text stages.
"""

from __future__ import annotations

import hashlib
import os
import re

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
    ("decoder", pa.string()),     # pil | ppm | wav | stub (capability-gated)
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


_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def _ppm_encode(arr: np.ndarray) -> bytes:
    """uint8 H×W×3 → binary PPM (P6) bytes. Pure numpy/stdlib."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _ppm_decode(payload: bytes) -> np.ndarray | None:
    """Binary PPM (P6) → uint8 H×W×3, or None when not (valid) PPM.
    Pure numpy — a REAL decoder with no library dependency."""
    m = _PPM_HEADER.match(payload)
    if not m:
        return None
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    body = payload[m.end():m.end() + w * h * 3]
    if len(body) != w * h * 3:
        return None
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def _ppm_frame_length(payload: bytes, offset: int) -> int | None:
    """Length (header + body) of the P6 frame starting at offset, or
    None — lets a concatenated-frames video container be split without
    decoding every pixel."""
    m = _PPM_HEADER.match(payload[offset:offset + 64])
    if not m:
        return None
    w, h, maxval = (int(g) for g in m.groups())
    # same validity rules as _ppm_decode, so every frame this splitter
    # accepts is genuinely decodable downstream
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    return m.end() + w * h * 3


def _nearest_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via two index takes — vectorized numpy."""
    h, w = arr.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[yi][:, xi]


def _ppm_feature(arr: np.ndarray) -> np.ndarray:
    """Same feature recipe as the PIL path: grayscale, resize to
    FEATURE_DIM×FEATURE_DIM, column-mean luminance profile in [0, 1]."""
    gray = arr.astype(np.float32).mean(axis=2)
    small = _nearest_resize(gray, FEATURE_DIM, FEATURE_DIM)
    return small.mean(axis=0) / 255.0


def _wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes. stdlib `wave` + numpy — real."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _wav_decode(payload: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WAVE PCM → (float32 mono samples in [-1, 1], sample_rate),
    or None when not decodable WAV. stdlib `wave` + numpy — a REAL
    audio decoder with no external dependency."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2 or w.getnframes() == 0:
                return None
            raw = w.readframes(w.getnframes())
            rate = w.getframerate()
            ch = w.getnchannels()
        # a truncated data chunk yields a non-frame-aligned buffer;
        # frombuffer/reshape then raise ValueError — treat as not-WAV
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32)
        if ch > 1:
            samples = samples.reshape(-1, ch).mean(axis=1)
    except (wave.Error, EOFError, ValueError):
        return None
    return samples / 32768.0, rate


def _wav_feature(samples: np.ndarray) -> np.ndarray:
    """FEATURE_DIM per-window RMS energy profile — the audio analogue
    of the image column-luminance feature."""
    n = len(samples)
    edges = (np.arange(FEATURE_DIM + 1) * n // FEATURE_DIM).clip(0, n)
    sq = np.concatenate(([0.0], np.cumsum(samples.astype(np.float64) ** 2)))
    widths = np.maximum(1, edges[1:] - edges[:-1])
    return np.sqrt((sq[edges[1:]] - sq[edges[:-1]]) / widths) \
        .astype(np.float32)


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
                # fall through to the PPM / stub paths
        if kind == "image":
            arr = _ppm_decode(payload)
            if arr is not None:
                return _ppm_feature(arr), "ppm"  # REAL, library-free
        if kind == "audio":
            dec = _wav_decode(payload)
            if dec is not None:
                return _wav_feature(dec[0]), "wav"  # REAL, stdlib-only
        # strict must raise here too (undecodable audio / any video),
        # matching AudioResampler's strict semantics
        return _decode_image_stub(payload, self.strict), "stub"

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
    """Deterministic media table for tests/benchmarks. Image payloads
    are REAL binary PPMs (gradient + seeded noise), video payloads are
    concatenated PPM frames, and audio payloads are REAL RIFF/PCM WAV
    (seeded tone + noise), so the decode/resize/frame-sample/resample
    stages all exercise their real kernels in this container."""
    import ray.data as rd
    rng = np.random.RandomState(seed)

    def frame(w, h, phase):
        x = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        noise = rng.randint(0, 40, size=(h, w, 3)).astype(np.float32)
        return np.clip(x + noise + phase, 0, 255).astype(np.uint8)

    rows = []
    for i in range(n_rows):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            payload = _ppm_encode(frame(64, 64, i))
        elif kind == "video":
            payload = b"".join(_ppm_encode(frame(32, 32, 8 * j + i))
                               for j in range(8))
        else:
            t = np.arange(4000, dtype=np.float64) / 16000.0
            tone = np.sin(2 * np.pi * (200 + 10 * i) * t)
            noise = rng.normal(scale=0.05, size=t.shape)
            payload = _wav_encode(
                ((tone + noise) * 12000).clip(-32768, 32767))
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
        if kind == "image":
            arr = _ppm_decode(payload)
            if arr is not None:
                # REAL library-free resize: nearest-neighbor + re-encode
                return _ppm_encode(_nearest_resize(
                    arr, self.target, self.target)), "ppm"
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
    """Actor-pool stage: sample N frames per video payload (flat_map
    shape: one input row → N frame rows). Videos packed as concatenated
    PPM frames (the synthetic container format) are GENUINELY split —
    each emitted frame is a standalone decodable P6 image, sampled
    evenly across the stream (labeled "ppm-seq"). Compressed codecs are
    absent from this container, so any other byte stream falls back to
    the clearly-labeled deterministic stub (byte-range slices); the
    Ray-side plumbing — 1→N fan-out, per-frame timestamps, binary frame
    payloads, small batches — is identical on both paths."""

    def __init__(self, n_frames: int = 4, fps: float = 1.0):
        self.n_frames = n_frames
        self.frame_interval_ms = int(1000 / fps)

    def _split_ppm_seq(self, payload: bytes) -> list[bytes] | None:
        frames, off = [], 0
        while off < len(payload):
            ln = _ppm_frame_length(payload, off)
            if ln is None or off + ln > len(payload):
                return None
            frames.append(payload[off:off + ln])
            off += ln
        return frames or None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in FRAMES_SCHEMA.names}
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "video":
                continue
            payload = payload or b""
            frames = self._split_ppm_seq(payload)
            if frames is not None:
                # even temporal sampling over the real frame list
                n = min(self.n_frames, len(frames))
                picks = [frames[j * len(frames) // n] for j in range(n)]
                used = "ppm-seq"
            else:
                step = max(1, len(payload) // self.n_frames)
                picks = [payload[i * step:(i + 1) * step]
                         for i in range(self.n_frames)]
                used = "stub"
            for i, fr in enumerate(picks):
                out["media_id"].append(mid)
                out["frame_index"].append(i)
                out["frame_ts_ms"].append(i * self.frame_interval_ms)
                out["frame"].append(fr)
                out["decoder"].append(used)
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


# ---------------------------------------------------------------------------
# audio resample + frame featurize (composed real-kernel stages)
# ---------------------------------------------------------------------------

RESAMPLED_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.large_binary()),   # resampled WAV bytes
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int64()),
    ("decoder", pa.string()),
])


class AudioResampler:
    """Actor-pool stage: resample WAV audio to a target rate by linear
    interpolation (numpy + stdlib wave — REAL, library-free). The
    training-data preprocessing step that normalizes heterogeneous
    crawl audio to one model rate. Non-WAV bytes pass through with a
    labeled stub payload."""

    def __init__(self, target_rate: int = 8000, strict: bool = False):
        self.target_rate = target_rate
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in RESAMPLED_SCHEMA.names}
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "audio":
                continue
            payload = payload or b""
            dec = _wav_decode(payload)
            if dec is not None:
                samples, rate = dec
                n_out = max(1, int(round(len(samples)
                                         * self.target_rate / rate)))
                xp = np.arange(len(samples), dtype=np.float64)
                xq = np.linspace(0, len(samples) - 1, n_out)
                res = np.interp(xq, xp, samples)
                wav = _wav_encode(
                    np.clip(res * 32768.0, -32768, 32767),
                    self.target_rate)
                out["payload"].append(wav)
                out["n_samples"].append(n_out)
                out["sample_rate"].append(self.target_rate)
                out["decoder"].append("wav")
            else:
                if self.strict:
                    raise NotImplementedError(
                        "non-WAV audio needs a codec library")
                # passed through UN-resampled: report the rate as
                # unknown (-1, matching n_samples), not target_rate
                out["payload"].append(payload)
                out["n_samples"].append(-1)
                out["sample_rate"].append(-1)
                out["decoder"].append("stub")
            out["media_id"].append(mid)
        return pa.Table.from_pydict(out, schema=RESAMPLED_SCHEMA)


def media_audio_resample(n_rows: int = 64, target_rate: int = 8000):
    ds = synth_media_dataset(n_rows)
    return ds.map_batches(AudioResampler,
                          fn_constructor_kwargs={
                              "target_rate": target_rate},
                          batch_format="pyarrow", batch_size=32,
                          concurrency=2, num_cpus=1)


# ---------------------------------------------------------------------------
# perceptual image hashing + near-duplicate pairs (multimodal dedup)
# ---------------------------------------------------------------------------

AHASH_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("ahash", pa.int64()),            # 64-bit average-hash (int64 view)
    ("decoder", pa.string()),
])

_AHASH_SIDE = 8  # 8x8 grid -> 64-bit fingerprint


def _ahash_from_gray(gray: np.ndarray) -> int:
    """float gray HxW -> 64-bit average hash: nearest-resize to 8x8,
    threshold each cell against the grid mean, pack row-major."""
    small = _nearest_resize(gray, _AHASH_SIDE, _AHASH_SIDE)
    bits = (small > small.mean()).reshape(-1)
    return int(np.packbits(bits).view(">u8")[0])


class ImageAHasher:
    """Actor-pool stage: perceptual average-hash (aHash) per image — the
    multimodal analogue of the text SimHash fingerprint. Decode uses the
    same capability ladder as MediaFeatureExtractor (PIL when importable,
    the pure-numpy PPM codec otherwise — REAL in this container); bytes
    neither path can decode get a labeled stub hash (blake2b prefix:
    deterministic, never near any real hash family). Re-encodes / light
    noise / small edits land within a few bits of Hamming distance."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        self.real_decode_gray = None
        try:
            import io

            from PIL import Image

            def decode_gray(payload: bytes) -> np.ndarray:
                img = Image.open(io.BytesIO(payload)).convert("L")
                return np.asarray(img, dtype=np.float32)

            self.real_decode_gray = decode_gray
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "strict mode requires an imaging library (PIL/cv2)")

    def _hash(self, payload: bytes) -> tuple[int, str]:
        if self.real_decode_gray is not None:
            try:
                return _ahash_from_gray(
                    self.real_decode_gray(payload)), "pil"
            except Exception:
                if self.strict:
                    raise
        arr = _ppm_decode(payload)
        if arr is not None:
            gray = arr.astype(np.float32).mean(axis=2)
            return _ahash_from_gray(gray), "ppm"
        if self.strict:
            raise NotImplementedError(
                "undecodable image payload (no codec for this format)")
        h = hashlib.blake2b(payload, digest_size=8).digest()
        return int.from_bytes(h, "big"), "stub"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes, decoders = [], [], []
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "image":
                continue
            hv, used = self._hash(payload or b"")
            ids.append(mid)
            # two's-complement int64 view keeps Arrow/pandas/SQL happy
            hashes.append(np.uint64(hv).astype(np.int64))
            decoders.append(used)
        return pa.Table.from_pydict({
            "media_id": ids,
            "ahash": pa.array(hashes, type=pa.int64()),
            "decoder": decoders,
        }, schema=AHASH_SCHEMA)


def hash_near_dup_pairs(hashes, max_hamming: int = 3,
                        num_buckets: int = 32):
    """Near-duplicate PAIRS from any (media_id, ahash) 64-bit
    fingerprint dataset via Manku pigeonhole banding — the shared
    machinery behind the image (aHash) and audio (spectral-hash) dedup
    ops, and the same shape as the text SimHash dedup: max_hamming+1
    bands of 64/(max_hamming+1) bits; any pair within the Hamming ball
    shares ≥1 exact band, so candidates co-locate via a band-value
    groupby and the exact popcount verify runs inside the group. No
    all-pairs stage anywhere; at 10^12 items the only exchange is the
    banded groupby, and hot bands (e.g. monochrome thumbnails) spread
    across `num_buckets` via the same hash-bucket trick as the text
    path.

    Returns (media_a, media_b, hamming) with media_a < media_b."""
    import itertools

    import pandas as pd

    from .exchange import hash_rows_mod

    n_bands = max_hamming + 1
    band_bits = 64 // n_bands

    def bands(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"band_id": pa.array([], pa.int32()),
                             "band_val": pa.array([], pa.int64()),
                             "media_id": pa.array([], pa.string()),
                             "ahash": pa.array([], pa.int64())})
        fps = batch.column("ahash").to_numpy().view(np.uint64)
        mids = batch.column("media_id").to_pylist()
        n = len(fps)
        shifts = (np.arange(n_bands, dtype=np.uint64)
                  * np.uint64(band_bits))
        mask = np.uint64((1 << band_bits) - 1)
        band_vals = ((fps[:, None] >> shifts[None, :]) & mask) \
            .astype(np.int64).reshape(-1)
        return pa.table({
            "band_id": pa.array(np.tile(
                np.arange(n_bands, dtype=np.int32), n)),
            "band_val": pa.array(band_vals, type=pa.int64()),
            "media_id": pa.array(np.repeat(mids, n_bands),
                                 type=pa.string()),
            "ahash": pa.array(fps.view(np.int64).repeat(n_bands),
                              type=pa.int64()),
        })

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        dup = df[df.duplicated(["band_id", "band_val"], keep=False)]
        for _, g in dup.groupby(["band_id", "band_val"], sort=False):
            uniq = g.drop_duplicates("media_id")[["media_id", "ahash"]]
            for (a, ha), (b, hb) in itertools.combinations(
                    uniq.itertuples(index=False), 2):
                d = bin((int(ha) ^ int(hb)) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    lo, hi = (a, b) if a < b else (b, a)
                    rows.append((lo, hi, d))
        return pd.DataFrame(rows,
                            columns=["media_a", "media_b", "hamming"]) \
            if rows else pd.DataFrame(
                {"media_a": pd.Series([], dtype="string"),
                 "media_b": pd.Series([], dtype="string"),
                 "hamming": pd.Series([], dtype="int64")})

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["band_id", "band_val"], num_buckets)
        return b.append_column("bucket", pa.array(ids, type=pa.int32()))

    cand = (hashes.map_batches(bands, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pandas"))
    return cand.groupby(["media_a", "media_b"]).map_groups(
        lambda df: df.drop_duplicates(["media_a", "media_b"]),
        batch_format="pandas")


def image_near_dup_pairs(media, max_hamming: int = 3,
                         num_buckets: int = 32):
    """Image near-duplicate pairs: perceptual aHash per image (actor
    pool, real PIL/PPM decode) + the shared pigeonhole banding."""
    hashes = media.map_batches(ImageAHasher, batch_format="pyarrow",
                               batch_size=32, concurrency=2, num_cpus=1)
    return hash_near_dup_pairs(hashes, max_hamming=max_hamming,
                               num_buckets=num_buckets)


class AudioSpectralHasher:
    """Actor-pool stage: 64-bit spectral-band fingerprint per audio
    payload (chromaprint-lite) — bit j set when geometric band j holds
    ≥ 25% of the peak band energy, so the fingerprint marks the
    dominant spectral lines and is stable under additive noise /
    re-encoding. Real stdlib-wave decode + numpy rFFT; undecodable
    bytes get a labeled stub hash (blake2b prefix)."""

    N_BANDS = 64
    F_LO = 50.0

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _hash(self, payload: bytes) -> tuple[int, str]:
        dec = _wav_decode(payload)
        if dec is None:
            if self.strict:
                raise NotImplementedError(
                    "non-WAV audio needs a codec library")
            h = hashlib.blake2b(payload, digest_size=8).digest()
            return int.from_bytes(h, "big"), "stub"
        samples, rate = dec
        spec = np.abs(np.fft.rfft(samples.astype(np.float64))) ** 2
        freqs = np.fft.rfftfreq(len(samples), 1.0 / rate)
        edges = np.geomspace(self.F_LO, rate / 2.0, self.N_BANDS + 1)
        idx = np.searchsorted(freqs, edges).clip(0, len(spec))
        cum = np.concatenate(([0.0], np.cumsum(spec)))
        energies = cum[idx[1:]] - cum[idx[:-1]]
        peak = energies.max()
        bits = energies >= 0.25 * peak if peak > 0 \
            else np.zeros(self.N_BANDS, dtype=bool)
        return int(np.packbits(bits).view(">u8")[0]), "wav"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes, decoders = [], [], []
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "audio":
                continue
            hv, used = self._hash(payload or b"")
            ids.append(mid)
            hashes.append(np.uint64(hv).astype(np.int64))
            decoders.append(used)
        return pa.Table.from_pydict({
            "media_id": ids,
            "ahash": pa.array(hashes, type=pa.int64()),
            "decoder": decoders,
        }, schema=AHASH_SCHEMA)


def audio_near_dup_pairs(media, max_hamming: int = 3,
                         num_buckets: int = 32):
    """Audio near-duplicate pairs: spectral-band fingerprint per clip
    (actor pool, real WAV decode + rFFT) + the shared pigeonhole
    banding — re-recorded / re-encoded copies of the same material
    share dominant spectral lines and land within the Hamming ball."""
    hashes = media.map_batches(AudioSpectralHasher,
                               batch_format="pyarrow",
                               batch_size=32, concurrency=2, num_cpus=1)
    return hash_near_dup_pairs(hashes, max_hamming=max_hamming,
                               num_buckets=num_buckets)


def synth_audio_corpus(n_rows: int = 24, seed: int = 37,
                       n_dup_pairs: int = 3):
    """Deterministic audio corpus with PLANTED near-duplicates: each
    base clip is a DISTINCT two-tone chord (tone slots ≥ 1.5× apart —
    distinct spectral bands; 10 slots give 45 distinct chords, and two
    different chords share at most one tone → fingerprint Hamming ≥ 2);
    the first n_dup_pairs clips get a copy with FRESH noise at 4× the
    amplitude (the re-encode / re-record case: same spectral lines,
    different noise floor → Hamming 0)."""
    import itertools

    import ray.data as rd
    rng = np.random.RandomState(seed)
    chords = list(itertools.combinations(range(10), 2))
    rows = []

    def clip(slot_a, slot_b, noise_scale):
        t = np.arange(8000, dtype=np.float64) / 16000.0
        tone = (0.5 * np.sin(2 * np.pi * 110.0 * (1.5 ** slot_a) * t)
                + 0.5 * np.sin(2 * np.pi * 110.0 * (1.5 ** slot_b) * t))
        noise = rng.normal(scale=noise_scale, size=t.shape)
        return _wav_encode(((tone + noise) * 12000).clip(-32768, 32767))

    for i in range(n_rows):
        a, b = chords[i % len(chords)]
        rows.append({
            "media_id": f"aud{i:05d}",
            "url": f"https://pages.synthetic.test/aud/{i}",
            "kind": "audio",
            "payload": clip(a, b, 0.02),
            "width": -1, "height": -1, "sample_rate": 16000,
        })
        if i < n_dup_pairs:
            rows.append({
                "media_id": f"aud{i:05d}-dup",
                "url": f"https://pages.synthetic.test/aud/{i}d",
                "kind": "audio",
                "payload": clip(a, b, 0.08),
                "width": -1, "height": -1, "sample_rate": 16000,
            })
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


def media_audio_dups(n_rows: int = 24, max_hamming: int = 1):
    ds = synth_audio_corpus(n_rows)
    return audio_near_dup_pairs(ds, max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# fingerprint checkpoints: give the media near-dup family a DuckDB oracle
# ---------------------------------------------------------------------------

_MEDIA_CKPT_ROOT = "/tmp/gpml2pvjson_media"
# bump when a hasher's semantics change (stale-checkpoint invalidation,
# same discipline as kg.KG_PIPELINE_VERSION)
MEDIA_HASH_VERSION = 1


def media_hash_checkpoint_path(name: str, n_rows: int) -> str:
    """Deterministic fingerprint-parquet path — pure string arithmetic,
    so oracle_sql() can embed it without running anything."""
    return os.path.join(_MEDIA_CKPT_ROOT,
                        f"{name}_n{n_rows}_v{MEDIA_HASH_VERSION}.parquet")


def _checkpoint_hashes(hashes, path: str):
    """Write the (media_id, ahash, decoder) fingerprint table to ONE
    byte-stable parquet (sorted by media_id). Driver-side collect is
    deliberate: this is the bounded synthetic check corpus (≤ dozens of
    rows), not a corpus-scale stage — the corpus-scale path stays the
    streamed `hash_near_dup_pairs` input."""
    import pyarrow.parquet as pq
    t = pa.Table.from_pandas(
        hashes.to_pandas().sort_values("media_id").reset_index(drop=True),
        schema=AHASH_SCHEMA, preserve_index=False)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def media_phash_dups_oracled(n_rows: int = 48, max_hamming: int = 3):
    """media_phash_dups with a driver-verifiable contract: the per-image
    aHash table is checkpointed to parquet, the banded pair-gen runs
    over the checkpoint, and the DuckDB oracle brute-forces
    bit_count(xor) <= max_hamming over the same parquet — proving the
    pigeonhole banding lossless against all-pairs."""
    import ray.data as rd
    ds = synth_image_corpus(n_rows)
    hashes = ds.map_batches(ImageAHasher, batch_format="pyarrow",
                            batch_size=32, concurrency=2, num_cpus=1)
    path = media_hash_checkpoint_path("image_ahash", n_rows)
    _checkpoint_hashes(hashes, path)
    return hash_near_dup_pairs(rd.read_parquet(path),
                               max_hamming=max_hamming)


def media_audio_dups_oracled(n_rows: int = 24, max_hamming: int = 1):
    """media_audio_dups under the same checkpoint + brute-force-oracle
    contract as media_phash_dups_oracled."""
    import ray.data as rd
    ds = synth_audio_corpus(n_rows)
    hashes = ds.map_batches(AudioSpectralHasher, batch_format="pyarrow",
                            batch_size=32, concurrency=2, num_cpus=1)
    path = media_hash_checkpoint_path("audio_spectral", n_rows)
    _checkpoint_hashes(hashes, path)
    return hash_near_dup_pairs(rd.read_parquet(path),
                               max_hamming=max_hamming)


def media_dups_oracle_sql(name: str, n_rows: int, max_hamming: int) -> str:
    """Brute-force all-pairs Hamming join over the fingerprint
    checkpoint — the blocking-free ground truth the banded engine path
    must equal exactly."""
    p = media_hash_checkpoint_path(name, n_rows)
    return f"""
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
FROM read_parquet('{p}') a JOIN read_parquet('{p}') b
  ON a.media_id < b.media_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= {max_hamming}"""


FRAME_HASH_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("frame_index", pa.int32()),
    ("ahash", pa.int64()),
])


def video_frame_hashes(media, n_frames: int = 4):
    """Per-(video, sampled frame) aHash table — the fingerprint layer of
    video_near_dup_pairs, split out so it can be checkpointed for the
    brute-force SQL oracle (media_video_dups_oracled)."""
    frames = media.map_batches(FrameSampler,
                               fn_constructor_kwargs={
                                   "n_frames": n_frames},
                               batch_format="pyarrow", batch_size=32,
                               concurrency=2, num_cpus=1)

    def fhash(b: pa.Table) -> pa.Table:
        ids, idxs, hashes = [], [], []
        for mid, fi, fr in zip(b.column("media_id").to_pylist(),
                               b.column("frame_index").to_pylist(),
                               b.column("frame").to_pylist()):
            arr = _ppm_decode(fr or b"")
            if arr is None:
                continue  # undecodable container: no hash, no pair
            hv = _ahash_from_gray(arr.astype(np.float32).mean(axis=2))
            ids.append(mid)
            idxs.append(fi)
            hashes.append(np.uint64(hv).astype(np.int64))
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "frame_index": pa.array(idxs, type=pa.int32()),
            "ahash": pa.array(hashes, type=pa.int64()),
        })

    return frames.map_batches(fhash, batch_format="pyarrow")


def media_video_dups_oracled(n_rows: int = 24, max_hamming: int = 3,
                             min_frames: int = 3):
    """media_video_dups under the checkpoint + brute-force-oracle
    contract of media_phash_dups_oracled: the per-frame aHash table is
    checkpointed, the banded co-positioned pair-gen runs over the
    checkpoint, and the DuckDB oracle brute-forces the
    frame-position-aligned Hamming join + min_frames threshold over
    the same parquet — proving the (frame_index, band) pigeonhole
    lossless against all-pairs."""
    import ray.data as rd
    ds = synth_video_corpus(n_rows)
    hashes = video_frame_hashes(ds)
    path = media_hash_checkpoint_path("video_fhash", n_rows)
    import pyarrow.parquet as pq
    t = pa.Table.from_pandas(
        hashes.to_pandas().sort_values(["media_id", "frame_index"])
        .reset_index(drop=True),
        schema=FRAME_HASH_SCHEMA, preserve_index=False)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return video_pairs_from_frame_hashes(
        rd.read_parquet(path), max_hamming=max_hamming,
        min_frames=min_frames)


def video_dups_oracle_sql(n_rows: int = 24, max_hamming: int = 3,
                          min_frames: int = 3) -> str:
    """Blocking-free ground truth over the frame-hash checkpoint: count
    co-positioned frame pairs within the Hamming ball per video pair,
    threshold at min_frames — the banded engine path must equal it
    exactly."""
    p = media_hash_checkpoint_path("video_fhash", n_rows)
    return f"""
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(count(*) AS BIGINT) AS n_frames_matched
FROM read_parquet('{p}') a JOIN read_parquet('{p}') b
  ON a.media_id < b.media_id AND a.frame_index = b.frame_index
WHERE bit_count(xor(a.ahash, b.ahash)) <= {max_hamming}
GROUP BY media_a, media_b
HAVING count(*) >= {min_frames}
ORDER BY media_a, media_b"""


def video_near_dup_pairs(media, n_frames: int = 4, max_hamming: int = 3,
                         min_frames: int = 3, num_buckets: int = 32):
    """Video near-duplicate PAIRS by frame-sequence perceptual hashing:
    sample n_frames per video (real PPM-sequence split), aHash every
    sampled frame (real decode), band each frame hash with the Manku
    pigeonhole — keyed by (frame_index, band) so only CO-POSITIONED
    frames ever collide — and call two videos near-duplicates when
    ≥ min_frames sampled positions match within the Hamming ball (the
    re-encoded / lightly-edited-copy case). No all-pairs stage: the only
    exchanges are the banded groupby and the tiny pair-count groupby.

    Returns (media_a, media_b, n_frames_matched) with media_a < media_b."""
    return video_pairs_from_frame_hashes(
        video_frame_hashes(media, n_frames=n_frames),
        max_hamming=max_hamming, min_frames=min_frames,
        num_buckets=num_buckets)


def video_pairs_from_frame_hashes(hashes, max_hamming: int = 3,
                                  min_frames: int = 3,
                                  num_buckets: int = 32):
    """Pair generation half of video_near_dup_pairs over a prepared
    (media_id, frame_index, ahash) Dataset (live or checkpointed)."""
    import itertools

    import pandas as pd
    from ray.data.aggregate import Count

    from .exchange import hash_rows_mod

    n_bands = max_hamming + 1
    band_bits = 64 // n_bands

    def bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"frame_index": pa.array([], pa.int32()),
                             "band_id": pa.array([], pa.int32()),
                             "band_val": pa.array([], pa.int64()),
                             "media_id": pa.array([], pa.string()),
                             "ahash": pa.array([], pa.int64())})
        fps = batch.column("ahash").to_numpy().view(np.uint64)
        shifts = (np.arange(n_bands, dtype=np.uint64)
                  * np.uint64(band_bits))
        mask = np.uint64((1 << band_bits) - 1)
        band_vals = ((fps[:, None] >> shifts[None, :]) & mask) \
            .astype(np.int64).reshape(-1)
        return pa.table({
            "frame_index": pa.array(
                np.repeat(batch.column("frame_index").to_numpy(), n_bands),
                type=pa.int32()),
            "band_id": pa.array(np.tile(
                np.arange(n_bands, dtype=np.int32), n)),
            "band_val": pa.array(band_vals, type=pa.int64()),
            "media_id": pa.array(
                np.repeat(batch.column("media_id").to_pylist(), n_bands),
                type=pa.string()),
            "ahash": pa.array(fps.view(np.int64).repeat(n_bands),
                              type=pa.int64()),
        })

    def frame_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        key = ["frame_index", "band_id", "band_val"]
        dup = df[df.duplicated(key, keep=False)]
        for (fi, _, _), g in dup.groupby(key, sort=False):
            uniq = g.drop_duplicates("media_id")[["media_id", "ahash"]]
            for (a, ha), (b_, hb) in itertools.combinations(
                    uniq.itertuples(index=False), 2):
                d = bin((int(ha) ^ int(hb)) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    lo, hi = (a, b_) if a < b_ else (b_, a)
                    rows.append((lo, hi, int(fi)))
        return pd.DataFrame(
            rows, columns=["media_a", "media_b", "frame_index"]) \
            if rows else pd.DataFrame(
                {"media_a": pd.Series([], dtype="string"),
                 "media_b": pd.Series([], dtype="string"),
                 "frame_index": pd.Series([], dtype="int64")})

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["frame_index", "band_id", "band_val"],
                            num_buckets)
        return b.append_column("bucket", pa.array(ids, type=pa.int32()))

    # banded candidates → one row per (pair, frame) → count matched
    # positions per pair → threshold
    cand = (hashes.map_batches(bands, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(frame_pairs, batch_format="pandas")
            .groupby(["media_a", "media_b", "frame_index"])
            .map_groups(lambda df: df.drop_duplicates(),
                        batch_format="pandas"))

    def threshold(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.greater_equal(b.column("n_frames_matched"),
                                pa.scalar(min_frames, type=pa.int64()))
        return b.filter(keep)

    return (cand.groupby(["media_a", "media_b"])
            .aggregate(Count(alias_name="n_frames_matched"))
            .map_batches(threshold, batch_format="pyarrow")
            .sort(["media_a", "media_b"]))


def synth_video_corpus(n_rows: int = 24, seed: int = 31,
                       n_dup_pairs: int = 3, n_frames: int = 8):
    """Deterministic video corpus with PLANTED near-duplicates: each
    base video is a distinct random block pattern evolving slightly per
    frame; the first n_dup_pairs videos get a re-encoded copy with
    light per-frame pixel noise (frame aHashes within a couple of
    bits)."""
    import ray.data as rd
    rng = np.random.RandomState(seed)
    rows = []

    def encode_video(base_blocks, noise_scale):
        frames = []
        for j in range(n_frames):
            arr = _nearest_resize(base_blocks[j], 32, 32)
            if noise_scale:
                arr = np.clip(arr + rng.normal(scale=noise_scale,
                                               size=arr.shape), 0, 255)
            frames.append(_ppm_encode(
                np.repeat(arr[:, :, None], 3, axis=2)))
        return b"".join(frames)

    for i in range(n_rows):
        blocks = [rng.randint(0, 2, size=(8, 8)).astype(np.float32)
                  * 255 for _ in range(n_frames)]
        rows.append({
            "media_id": f"vid{i:05d}",
            "url": f"https://pages.synthetic.test/vid/{i}",
            "kind": "video",
            "payload": encode_video(blocks, 0),
            "width": 32, "height": 32, "sample_rate": -1,
        })
        if i < n_dup_pairs:
            rows.append({
                "media_id": f"vid{i:05d}-dup",
                "url": f"https://pages.synthetic.test/vid/{i}d",
                "kind": "video",
                "payload": encode_video(blocks, 8.0),
                "width": 32, "height": 32, "sample_rate": -1,
            })
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


def media_video_dups(n_rows: int = 24, max_hamming: int = 3):
    ds = synth_video_corpus(n_rows)
    return video_near_dup_pairs(ds, max_hamming=max_hamming)


def synth_image_corpus(n_rows: int = 48, seed: int = 23,
                       n_dup_pairs: int = 4):
    """Deterministic image corpus with PLANTED near-duplicates: each base
    image is a distinct random 8x8 block pattern upscaled to 64x64 (so
    unrelated aHashes sit ~32 bits apart), and the first `n_dup_pairs`
    images get a re-encoded copy with light pixel noise (aHash within a
    couple of bits — the re-crawled-thumbnail case)."""
    import ray.data as rd
    rng = np.random.RandomState(seed)
    rows = []

    def encode(arr):
        return _ppm_encode(np.repeat(arr[:, :, None], 3, axis=2))

    for i in range(n_rows):
        blocks = rng.randint(0, 2, size=(8, 8)).astype(np.float32) * 255
        base = _nearest_resize(blocks, 64, 64)
        rows.append({
            "media_id": f"img{i:05d}",
            "url": f"https://pages.synthetic.test/img/{i}",
            "kind": "image",
            "payload": encode(base),
            "width": 64, "height": 64, "sample_rate": -1,
        })
        if i < n_dup_pairs:
            noisy = np.clip(
                base + rng.normal(scale=8.0, size=base.shape),
                0, 255)
            rows.append({
                "media_id": f"img{i:05d}-dup",
                "url": f"https://pages.synthetic.test/img/{i}d",
                "kind": "image",
                "payload": encode(noisy),
                "width": 64, "height": 64, "sample_rate": -1,
            })
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


def media_phash_dups(n_rows: int = 48, max_hamming: int = 3):
    ds = synth_image_corpus(n_rows)
    return image_near_dup_pairs(ds, max_hamming=max_hamming)


def media_frame_features(n_rows: int = 64, n_frames: int = 4):
    """Composed two-stage media pipeline: sample frames from each video
    (real PPM-sequence split), then featurize every frame as an image
    (real PPM decode) — the video-understanding preprocessing shape
    (frame sampling → per-frame vision features), both stages actor
    pools over small binary batches."""
    frames = media_frames(n_rows, n_frames)

    def as_media(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ids = [f"{m}#f{i}" for m, i in zip(
            b.column("media_id").to_pylist(),
            b.column("frame_index").to_pylist())]
        return pa.Table.from_pydict({
            "media_id": ids,
            "url": [""] * n,
            "kind": ["image"] * n,
            "payload": b.column("frame"),
            "width": pa.array([-1] * n, type=pa.int32()),
            "height": pa.array([-1] * n, type=pa.int32()),
            "sample_rate": pa.array([-1] * n, type=pa.int32()),
        }, schema=MEDIA_SCHEMA)

    return frames.map_batches(as_media, batch_format="pyarrow") \
        .map_batches(MediaFeatureExtractor,
                     fn_constructor_kwargs={"strict": False},
                     batch_format="pyarrow", batch_size=32,
                     concurrency=2, num_cpus=1)


# ---------------------------------------------------------------------------
# driver-safe oracled projections for the featurize/resize stages
# ---------------------------------------------------------------------------
#
# The raw stage outputs carry large_binary payloads and list<float32>
# feature vectors — types whose cross-engine value-hashing (DuckDB BLOB /
# FLOAT[] vs Arrow) is not byte-stable in the driver's compare. The
# catalog entries therefore return a PROJECTION where every binary/list
# column is replaced by its sha256 (computed in the engine at write AND
# at query time), and the DuckDB oracle identity-reads the checkpoint —
# the documents_simhash determinism-gate contract with all-scalar
# columns. The full-payload stages (media_features / media_resize)
# remain the library surface.

FEATURES_PROJ_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),
    ("n_bytes", pa.int64()),
    ("content_sha256", pa.string()),
    ("feature_sha256", pa.string()),   # sha256 of float32-LE vector bytes
    ("decoder", pa.string()),
])

RESIZE_PROJ_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),
    ("payload_sha256", pa.string()),   # sha256 of the resized bytes
    ("n_bytes", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("decoder", pa.string()),
])


def _features_projection(b: pa.Table) -> pa.Table:
    feats = b.column("feature").to_pylist()
    fh = [hashlib.sha256(
        np.asarray(f or [], dtype=np.float32).tobytes()).hexdigest()
        for f in feats]
    return pa.Table.from_pydict({
        "media_id": b.column("media_id"),
        "kind": b.column("kind"),
        "n_bytes": b.column("n_bytes"),
        "content_sha256": b.column("content_sha256"),
        "feature_sha256": pa.array(fh, pa.string()),
        "decoder": b.column("decoder"),
    }, schema=FEATURES_PROJ_SCHEMA)


def _resize_projection(b: pa.Table) -> pa.Table:
    payloads = b.column("payload").to_pylist()
    ph = [hashlib.sha256(p or b"").hexdigest() for p in payloads]
    nb = [len(p or b"") for p in payloads]
    return pa.Table.from_pydict({
        "media_id": b.column("media_id"),
        "kind": b.column("kind"),
        "payload_sha256": pa.array(ph, pa.string()),
        "n_bytes": pa.array(nb, pa.int64()),
        "width": b.column("width"),
        "height": b.column("height"),
        "decoder": b.column("decoder"),
    }, schema=RESIZE_PROJ_SCHEMA)


def _checkpoint_projection(ds, schema, sort_cols, path: str):
    import pyarrow.parquet as pq
    t = pa.Table.from_pandas(
        ds.to_pandas().sort_values(sort_cols).reset_index(drop=True),
        schema=schema, preserve_index=False)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def media_features_oracled(n_rows: int = 64):
    """media_features under the determinism-gate contract: one run's
    projection is checkpointed, a SECOND independent run's projection is
    returned, and the DuckDB oracle identity-reads the checkpoint — any
    nondeterminism in decode/featurize across actor pools breaks the
    driver hash."""
    proj = media_features(n_rows).map_batches(
        _features_projection, batch_format="pyarrow")
    path = media_hash_checkpoint_path("features_proj", n_rows)
    _checkpoint_projection(proj, FEATURES_PROJ_SCHEMA, ["media_id"],
                           path)
    return media_features(n_rows).map_batches(
        _features_projection, batch_format="pyarrow")


def media_resize_oracled(n_rows: int = 64, target: int = 256):
    """media_resize under the same determinism-gate contract as
    media_features_oracled."""
    proj = media_resize(n_rows, target=target).map_batches(
        _resize_projection, batch_format="pyarrow")
    path = media_hash_checkpoint_path("resize_proj", n_rows)
    _checkpoint_projection(proj, RESIZE_PROJ_SCHEMA, ["media_id"], path)
    return media_resize(n_rows, target=target).map_batches(
        _resize_projection, batch_format="pyarrow")


def media_features_oracle_sql(n_rows: int = 64) -> str:
    p = media_hash_checkpoint_path("features_proj", n_rows)
    return (f"SELECT media_id, kind, n_bytes, content_sha256, "
            f"feature_sha256, decoder FROM read_parquet('{p}')")


def media_resize_oracle_sql(n_rows: int = 64) -> str:
    p = media_hash_checkpoint_path("resize_proj", n_rows)
    return (f"SELECT media_id, kind, payload_sha256, n_bytes, width, "
            f"height, decoder FROM read_parquet('{p}')")


FRAMES_PROJ_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("frame_index", pa.int32()),
    ("frame_ts_ms", pa.int32()),
    ("frame_sha256", pa.string()),    # sha256 of the encoded frame bytes
    ("n_bytes", pa.int64()),
    ("decoder", pa.string()),
])

RESAMPLE_PROJ_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload_sha256", pa.string()),  # sha256 of the resampled WAV bytes
    ("n_bytes", pa.int64()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int64()),
    ("decoder", pa.string()),
])


def _frames_projection(b: pa.Table) -> pa.Table:
    frames = b.column("frame").to_pylist()
    return pa.Table.from_pydict({
        "media_id": b.column("media_id"),
        "frame_index": b.column("frame_index"),
        "frame_ts_ms": b.column("frame_ts_ms"),
        "frame_sha256": pa.array(
            [hashlib.sha256(f or b"").hexdigest() for f in frames],
            pa.string()),
        "n_bytes": pa.array([len(f or b"") for f in frames], pa.int64()),
        "decoder": b.column("decoder"),
    }, schema=FRAMES_PROJ_SCHEMA)


def _resample_projection(b: pa.Table) -> pa.Table:
    payloads = b.column("payload").to_pylist()
    return pa.Table.from_pydict({
        "media_id": b.column("media_id"),
        "payload_sha256": pa.array(
            [hashlib.sha256(p or b"").hexdigest() for p in payloads],
            pa.string()),
        "n_bytes": pa.array([len(p or b"") for p in payloads],
                            pa.int64()),
        "sample_rate": b.column("sample_rate"),
        "n_samples": b.column("n_samples"),
        "decoder": b.column("decoder"),
    }, schema=RESAMPLE_PROJ_SCHEMA)


def media_frames_oracled(n_rows: int = 64, n_frames: int = 4):
    """media_frames under the determinism-gate contract of
    media_features_oracled (checkpointed projection vs an independent
    second run; DuckDB identity-reads the checkpoint)."""
    proj = media_frames(n_rows, n_frames=n_frames).map_batches(
        _frames_projection, batch_format="pyarrow")
    path = media_hash_checkpoint_path("frames_proj", n_rows)
    _checkpoint_projection(proj, FRAMES_PROJ_SCHEMA,
                           ["media_id", "frame_index"], path)
    return media_frames(n_rows, n_frames=n_frames).map_batches(
        _frames_projection, batch_format="pyarrow")


def media_audio_resample_oracled(n_rows: int = 64,
                                 target_rate: int = 8000):
    """media_audio_resample under the same determinism-gate contract."""
    proj = media_audio_resample(n_rows, target_rate=target_rate) \
        .map_batches(_resample_projection, batch_format="pyarrow")
    path = media_hash_checkpoint_path("resample_proj", n_rows)
    _checkpoint_projection(proj, RESAMPLE_PROJ_SCHEMA, ["media_id"],
                           path)
    return media_audio_resample(n_rows, target_rate=target_rate) \
        .map_batches(_resample_projection, batch_format="pyarrow")


def media_frames_oracle_sql(n_rows: int = 64) -> str:
    p = media_hash_checkpoint_path("frames_proj", n_rows)
    return (f"SELECT media_id, frame_index, frame_ts_ms, frame_sha256, "
            f"n_bytes, decoder FROM read_parquet('{p}')")


def media_resample_oracle_sql(n_rows: int = 64) -> str:
    p = media_hash_checkpoint_path("resample_proj", n_rows)
    return (f"SELECT media_id, payload_sha256, n_bytes, sample_rate, "
            f"n_samples, decoder FROM read_parquet('{p}')")
