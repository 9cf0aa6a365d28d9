"""Multimodal column plumbing (task spec): image/audio/video as opaque
``binary`` columns + typed metadata, processed by actor-pool
``map_batches`` stages.

The container ships no image/audio codecs, so the *decode* kernel is
stubbed: ``decode_backend='none'`` raises NotImplementedError exactly
where a real libjpeg/ffmpeg call would go, and the default
``'fake'`` backend derives a deterministic feature vector from the
payload bytes. Everything around the kernel — schema, batch sizing for
large binary payloads, actor signature, output layout — is real and
tested, so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from xlink_ray.util import pool_size

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["MEDIA_SCHEMA", "synth_media", "MediaFeatureActor", "media_features"]

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


class MediaFeatureActor:
    """payload → fixed-size feature vector.

    ``backend='fake'``: deterministic 32-dim feature from a blake2b
    digest of the payload (unit-norm). ``backend='none'``: the real
    decoder slot — raises NotImplementedError (no codecs in this
    container).
    """

    DIM = 32

    def __init__(self, backend: str = "fake", batch_pixel_budget: int = 1 << 24):
        if backend not in ("fake", "none"):
            raise ValueError(backend)
        self.backend = backend
        self.batch_pixel_budget = batch_pixel_budget

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.backend == "none":
            raise NotImplementedError(
                "real decode requires an image/audio codec (libjpeg/ffmpeg); "
                "not available in this container — use backend='fake'"
            )
        d = hashlib.blake2b(payload, digest_size=self.DIM * 2).digest()
        v = np.frombuffer(d, dtype=np.uint16).astype(np.float32)
        v = v / np.linalg.norm(v)
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, t)
            for p, t in zip(batch["payload"].to_pylist(), batch["media_type"].to_pylist())
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
