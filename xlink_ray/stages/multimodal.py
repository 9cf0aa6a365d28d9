"""Multimodal column plumbing (task spec): image/audio/video as opaque
``binary`` columns + typed metadata, processed by actor-pool
``map_batches`` stages.

The container ships no image/audio codecs, so COMPRESSED decode is
stubbed: ``decode_backend='none'`` raises NotImplementedError exactly
where a real libjpeg/ffmpeg call would go, and ``'fake'`` derives a
deterministic feature vector from the payload bytes.  The ``'raw'``
backend is a REAL decoder for uncompressed payloads (width × height ×
3 interleaved uint8 RGB): reshape + vectorized bilinear resize + mean/
std/luma-histogram features, all numpy — no codec needed.  Everything
around the kernel — schema, batch sizing for large binary payloads,
actor signature, output layout — is shared by all three backends, so
swapping in libjpeg is still a one-function change.
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = [
    "MEDIA_SCHEMA",
    "synth_media",
    "synth_media_raw",
    "MediaFeatureActor",
    "media_features",
    "ImageResizeActor",
    "resize_images",
    "FrameSampleActor",
    "sample_frames",
    "image_ahash",
    "phash_dup_pairs",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media(n: int = 256, seed: int = 7) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        mt = types[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8).tobytes()
        rows.append(
            {
                "media_id": i,
                "doc_id": i % 50,
                "media_type": mt,
                "payload": payload,
                "width": 64 * (1 + i % 4) if mt == "image" else 0,
                "height": 48 * (1 + i % 4) if mt == "image" else 0,
                "duration_ms": 1000 * (1 + i % 7) if mt != "image" else 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _raw_rgb(payload: bytes, w: int, h: int) -> np.ndarray:
    """Uncompressed interleaved RGB payload → (h, w, 3) uint8 view."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) != w * h * 3:
        raise ValueError(f"raw RGB payload is {len(buf)} bytes, expected {w * h * 3}")
    return buf.reshape(h, w, 3)


def _bilinear_resize(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Vectorized bilinear resample of an (h, w, 3) image to (th, tw, 3)
    float32 (pixel-center sampling, edges clamped)."""
    h, w = px.shape[:2]
    xs = (np.arange(tw, dtype=np.float64) + 0.5) * w / tw - 0.5
    ys = (np.arange(th, dtype=np.float64) + 0.5) * h / th - 0.5
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)
    fy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)
    p = px.astype(np.float32)
    top = p[y0[:, None], x0[None, :]] * (1 - fx)[None, :, None] + p[y0[:, None], x1[None, :]] * fx[None, :, None]
    bot = p[y1[:, None], x0[None, :]] * (1 - fx)[None, :, None] + p[y1[:, None], x1[None, :]] * fx[None, :, None]
    return top * (1 - fy)[:, None, None] + bot * fy[:, None, None]


RAW_AUDIO_RATE = 8000  # Hz, int16 mono PCM for the 'raw' audio payloads


def _audio_features(pcm: np.ndarray, dim: int) -> np.ndarray:
    """Real DSP features of int16 mono PCM: RMS, zero-crossing rate,
    FFT spectral centroid/rolloff, and a 12-band energy profile."""
    x = pcm.astype(np.float32) / 32768.0
    v = np.zeros(dim, dtype=np.float32)
    if len(x) == 0:
        return v
    v[0] = float(np.sqrt(np.mean(x * x)))
    v[1] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))  # ZCR
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / RAW_AUDIO_RATE)
    power = spec * spec
    tot = float(power.sum())
    if tot > 0:
        v[2] = float((freqs * power).sum() / tot) / (RAW_AUDIO_RATE / 2)  # centroid
        cum = np.cumsum(power)
        v[3] = float(freqs[np.searchsorted(cum, 0.85 * tot)]) / (RAW_AUDIO_RATE / 2)
        # 12 equal bands of the spectrum, energy fractions
        bands = np.array_split(power, 12)
        v[4:16] = np.array([float(b.sum()) for b in bands], dtype=np.float32) / tot
    return v


def synth_media_raw(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic media table whose image payloads are REAL
    uncompressed RGB arrays (smooth two-axis gradients + per-image
    offset) and whose audio payloads are REAL int16 mono PCM sine
    mixes at RAW_AUDIO_RATE, for the 'raw' decode/resize/feature
    paths.  Every third row is audio."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 3 == 2:  # audio row: two-tone sine mix, 0.25-1.0 s
            dur = 0.25 * (1 + i % 4)
            t = np.arange(int(RAW_AUDIO_RATE * dur)) / RAW_AUDIO_RATE
            f1, f2 = 200 + 40 * (i % 7), 800 + 60 * (i % 5)
            x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(2 * np.pi * f2 * t)
            pcm = (x * 32767).astype(np.int16)
            rows.append(
                {
                    "media_id": i,
                    "doc_id": i % 10,
                    "media_type": "audio",
                    "payload": pcm.tobytes(),
                    "width": 0,
                    "height": 0,
                    "duration_ms": int(dur * 1000),
                }
            )
            continue
        w, h = 16 * (1 + i % 3), 12 * (1 + i % 3)
        yy, xx = np.mgrid[0:h, 0:w]
        base = rng.integers(0, 64)
        img = np.stack(
            [
                (xx * 255 // max(w - 1, 1) + base) % 256,
                (yy * 255 // max(h - 1, 1) + base) % 256,
                ((xx + yy) * 255 // max(w + h - 2, 1) + base) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        rows.append(
            {
                "media_id": i,
                "doc_id": i % 10,
                "media_type": "image",
                "payload": img.tobytes(),
                "width": w,
                "height": h,
                "duration_ms": 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaFeatureActor:
    """payload → fixed-size feature vector.

    ``backend='fake'``: deterministic 32-dim feature from a blake2b
    digest of the payload (unit-norm). ``backend='none'``: the real
    decoder slot — raises NotImplementedError (no codecs in this
    container).
    """

    DIM = 32

    def __init__(self, backend: str = "fake", batch_pixel_budget: int = 1 << 24):
        if backend not in ("fake", "raw", "none"):
            raise ValueError(backend)
        self.backend = backend
        self.batch_pixel_budget = batch_pixel_budget

    def _decode(self, payload: bytes, media_type: str, w: int = 0, h: int = 0) -> np.ndarray:
        if self.backend == "none":
            raise NotImplementedError(
                "real decode requires an image/audio codec (libjpeg/ffmpeg); "
                "not available in this container — use backend='fake' or 'raw'"
            )
        if self.backend == "raw" and media_type == "audio":
            return _audio_features(np.frombuffer(payload, dtype=np.int16), self.DIM)
        if self.backend == "raw" and media_type == "image" and w and h:
            # real decode of uncompressed interleaved RGB: per-channel
            # mean/std + a 16-bin luma histogram (normalized), 32-dim
            px = _raw_rgb(payload, w, h).astype(np.float32)
            luma = px @ np.array([0.2126, 0.7152, 0.0722], dtype=np.float32)
            hist = np.histogram(luma, bins=16, range=(0.0, 256.0))[0].astype(np.float32)
            hist /= max(float(hist.sum()), 1.0)
            v = np.zeros(self.DIM, dtype=np.float32)
            v[0:3] = px.reshape(-1, 3).mean(axis=0) / 255.0
            v[3:6] = px.reshape(-1, 3).std(axis=0) / 255.0
            v[6] = float(luma.mean()) / 255.0
            v[7] = float(luma.std()) / 255.0
            v[8:24] = hist
            return v
        d = hashlib.blake2b(payload, digest_size=self.DIM * 2).digest()
        v = np.frombuffer(d, dtype=np.uint16).astype(np.float32)
        v = v / np.linalg.norm(v)
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, t, w or 0, h or 0)
            for p, t, w, h in zip(
                batch["payload"].to_pylist(),
                batch["media_type"].to_pylist(),
                batch["width"].to_pylist(),
                batch["height"].to_pylist(),
            )
        ]
        mat = np.stack(feats) if feats else np.zeros((0, self.DIM), dtype=np.float32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), pa.float32()), self.DIM
                ),
            }
        )


class ImageResizeActor:
    """Image rows → payload resized to (target_w, target_h); non-image
    rows pass through untouched. The RESIZE kernel is a real vectorized
    nearest-neighbor index gather; only the bytes→pixels *decode* is
    fake (``backend='fake'`` tiles the payload into an (h, w) grayscale
    grid; ``'none'`` is the libjpeg slot and raises)."""

    def __init__(self, target_w: int = 32, target_h: int = 32, backend: str = "fake"):
        if backend not in ("fake", "raw", "none"):
            raise ValueError(backend)
        self.tw, self.th = target_w, target_h
        self.backend = backend

    def _pixels(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self.backend == "none":
            raise NotImplementedError(
                "real decode requires an image codec (libjpeg); "
                "not available in this container — use backend='fake' or 'raw'"
            )
        buf = np.frombuffer(payload, dtype=np.uint8)
        reps = -(-(w * h) // max(len(buf), 1))
        return np.tile(buf, reps)[: w * h].reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        out_payload, out_w, out_h = [], [], []
        rows = np.arange(self.th)
        cols = np.arange(self.tw)
        for mt, p, w, h in zip(types, payloads, widths, heights):
            if mt != "image" or not w or not h:
                out_payload.append(p)
                out_w.append(w)
                out_h.append(h)
                continue
            if self.backend == "raw":
                # real bilinear resample of the uncompressed RGB array
                resized = (
                    _bilinear_resize(_raw_rgb(p, w, h), self.tw, self.th)
                    .round()
                    .astype(np.uint8)
                )
            else:
                px = self._pixels(p, w, h)
                resized = px[np.ix_(rows * h // self.th, cols * w // self.tw)]
            out_payload.append(resized.tobytes())
            out_w.append(self.tw)
            out_h.append(self.th)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "doc_id": batch["doc_id"],
                "media_type": batch["media_type"],
                "payload": pa.array(out_payload, pa.binary()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "duration_ms": batch["duration_ms"],
            }
        )


def resize_images(
    ds: Dataset, target_w: int = 32, target_h: int = 32, backend: str = "fake"
) -> Dataset:
    return ds.map_batches(
        ImageResizeActor,
        fn_constructor_args=(target_w, target_h, backend),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool_size(),
        num_cpus=1,
    )


class FrameSampleActor:
    """Video rows → one row per sampled frame every ``every_ms``
    (frame_idx, t_ms, frame payload); the flat_map-shaped expansion is
    real, the per-frame *decode* is the ffmpeg slot (fake = keyed
    digest of the payload; deterministic)."""

    FRAME_BYTES = 64

    def __init__(self, every_ms: int = 500, backend: str = "fake"):
        if backend not in ("fake", "none"):
            raise ValueError(backend)
        self.every_ms = every_ms
        self.backend = backend

    def _frame(self, payload: bytes, idx: int) -> bytes:
        if self.backend == "none":
            raise NotImplementedError(
                "real frame extraction requires ffmpeg; not available "
                "in this container — use backend='fake'"
            )
        return hashlib.blake2b(
            payload + idx.to_bytes(4, "big"), digest_size=self.FRAME_BYTES
        ).digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, tms, frames = [], [], [], []
        for mid, mt, p, dur in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if mt != "video" or not dur:
                continue
            n = dur // self.every_ms + 1  # frame at t=0 always
            for k in range(n):
                mids.append(mid)
                fidx.append(k)
                tms.append(k * self.every_ms)
                frames.append(self._frame(p, k))
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "t_ms": pa.array(tms, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(ds: Dataset, every_ms: int = 500, backend: str = "fake") -> Dataset:
    return ds.map_batches(
        FrameSampleActor,
        fn_constructor_args=(every_ms, backend),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool_size(),
        num_cpus=1,
    )


def media_features(ds: Dataset, backend: str = "fake") -> Dataset:
    """Actor-pool feature extraction; small batches — binary payloads
    are wide, so batch_size × payload must fit the worker heap."""
    return ds.map_batches(
        MediaFeatureActor,
        fn_constructor_args=(backend,),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool_size(),
        num_cpus=1,
    )


def image_ahash(
    media: Dataset,
    grid: int = 4,
    id_col: str = "media_id",
) -> Dataset:
    """Integer-exact perceptual average hash (aHash) over the 'raw'
    uncompressed RGB payloads → (media_id, phash).

    Per image: milli-luma = 299·R + 587·G + 114·B per pixel (the BT.601
    weights ×1000 — integers, no float), the frame divides into an
    exact ``grid × grid`` block grid (the raw fixture's dimensions are
    divisible; enforced), and bit gy·grid+gx is set iff
    block_sum · n_pixels ≥ total_sum · block_pixels — the mean
    comparison as an integer cross-multiply, so the hash is bit-stable
    across engines and partitionings. Non-image rows are dropped."""

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t["media_type"], "image"))
        ids, hashes = [], []
        for row in t.to_pylist():
            w, h = int(row["width"]), int(row["height"])
            if w % grid or h % grid:
                raise ValueError(f"image {row[id_col]}: {w}x{h} not divisible by {grid}")
            px = _raw_rgb(row["payload"], w, h).astype(np.int64)
            luma = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
            bh, bw = h // grid, w // grid
            blocks = luma.reshape(grid, bh, grid, bw).sum(axis=(1, 3))
            total = int(luma.sum())
            npx, bpx = w * h, bh * bw
            bits = (blocks * npx >= total * bpx).astype(np.int64)
            phash = int((bits.ravel() << np.arange(grid * grid, dtype=np.int64)).sum())
            ids.append(int(row[id_col]))
            hashes.append(phash)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "phash": pa.array(hashes, pa.int64()),
            }
        )

    return media.map_batches(fn, batch_format="pyarrow")


def phash_dup_pairs(
    hashes: Dataset,
    max_hamming: int = 3,
    nbits: int = 16,
    bands: int = 4,
    id_col: str = "media_id",
) -> Dataset:
    """Near-duplicate images by perceptual-hash Hamming distance →
    (id_a, id_b, hamming). Banded exactly like SimHash dedup: the hash
    splits into ``bands`` equal bit-bands; pairs within ≤ max_hamming
    bits must collide on ≥ one band (pigeonhole: max_hamming < bands),
    so one ``groupby(band, value)`` blocking shuffle + in-group verify
    finds EVERY qualifying pair; a pair-keyed bucket reduce dedupes
    multi-band collisions."""
    if max_hamming >= bands:
        raise ValueError("recall guarantee needs max_hamming < bands")
    width = nbits // bands
    mask = (1 << width) - 1

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ph = t["phash"].to_numpy(zero_copy_only=False)
        out_b = np.repeat(np.arange(bands, dtype=np.int64), len(ids))
        out_id = np.tile(ids, bands)
        out_ph = np.tile(ph, bands)
        out_v = (out_ph >> (out_b * width)) & mask
        return pa.table(
            {
                "band": pa.array(out_b),
                "v": pa.array(out_v),
                "id": pa.array(out_id),
                "phash": pa.array(out_ph),
            }
        )

    def in_group(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy(zero_copy_only=False)
        ph = g["phash"].to_numpy(zero_copy_only=False)
        o = np.argsort(ids, kind="stable")
        ids, ph = ids[o], ph[o]
        n = len(ids)
        ii, jj = np.triu_indices(n, k=1)
        x = ph[ii] ^ ph[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - 1)
        keep = ham <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(ids[ii[keep]]),
                "id_b": pa.array(ids[jj[keep]]),
                "hamming": pa.array(ham[keep]),
            }
        )

    cand = (
        hashes.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "v"])
        .map_groups(in_group, batch_format="pyarrow")
    )

    from xlink_ray.stages._bucket import bucket_shuffle

    def dedupe(bucket: pa.Table) -> pa.Table:
        a = bucket["id_a"].to_numpy(zero_copy_only=False)
        b = bucket["id_b"].to_numpy(zero_copy_only=False)
        hm = bucket["hamming"].to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        a, b, hm = a[o], b[o], hm[o]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table(
            {
                "id_a": pa.array(a[first]),
                "id_b": pa.array(b[first]),
                "hamming": pa.array(hm[first]),
            }
        )

    out = bucket_shuffle(cand, "id_a", 32, dedupe)
    return out.map_batches(
        lambda t: t.drop_columns(["__b"]) if "__b" in t.column_names else t,
        batch_format="pyarrow",
    )
