"""Multimodal column stages: decode / feature-extract / resize /
frame-sample over opaque ``binary`` media payloads with typed metadata.

The Ray-side plumbing (schemas, actor-pool signatures, batch sizing,
output layout) is REAL and tested; the codec itself is STUBBED because
image/audio libraries are not in this container: each decoder first
tries the real library import, and otherwise uses a clearly marked
deterministic fake (hash-derived dimensions / features) so pipelines
are exercisable end-to-end.  Set ``strict=True`` to get the
``NotImplementedError`` instead of the fake.

Batch-size note (memory-aware, SURVEY.md §4): media payloads are large —
callers should pass a SMALL ``batch_size`` (e.g. 32-256) so
batch × concurrency fits worker heaps; metadata-only stages keep the
default.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DECODED_IMAGE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_channels", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


def _fake_dims(ref: str) -> tuple[int, int, int]:
    h = hashlib.sha256(ref.encode()).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def _fake_feature(ref: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(ref.encode()).digest()[:4], "little")
    return np.random.RandomState(seed).normal(size=dim).astype(np.float32)


class ImageDecoder:
    """Actor-pool stage: ``payload: binary`` (or a ``media_ref`` to fetch)
    → decoded metadata + feature vector.  Library load happens ONCE per
    actor in ``__init__``; per-batch work is vectorized over the fake
    path and per-item over the real codec (images decode one at a time
    by nature)."""

    def __init__(self, feature_dim: int = 64, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict
        try:  # real codec if available (not in this container)
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        if self._pil is None:
            if self.strict:
                raise NotImplementedError(
                    "image decode requires PIL; container has no image codecs "
                    "(STUB — deterministic fake used when strict=False)"
                )
            dims = [_fake_dims(r or "") for r in refs]
            feats = [_fake_feature(r or "", self.feature_dim) for r in refs]
        else:  # pragma: no cover - not reachable in this container
            raise NotImplementedError("real decode path: wire payload bytes → PIL here")
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "width": pa.array([d[0] for d in dims], type=pa.int32()),
                "height": pa.array([d[1] for d in dims], type=pa.int32()),
                "n_channels": pa.array([d[2] for d in dims], type=pa.int32()),
                "feature": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Video frame-sampling stub: ``media_ref`` → ``n_frames`` sampled
    frame indices + per-frame fake features.  Real path would use
    pyav/ffmpeg (absent here)."""

    def __init__(self, n_frames: int = 4, feature_dim: int = 32, strict: bool = False):
        self.n_frames = n_frames
        self.feature_dim = feature_dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video decode requires ffmpeg/pyav (STUB)")
        refs = batch["media_ref"].to_pylist()
        rows = []
        for r in refs:
            h = hashlib.sha256((r or "").encode()).digest()
            total = 30 + h[2] % 270  # fake frame count
            idxs = np.linspace(0, total - 1, self.n_frames).astype(np.int32)
            for i in idxs:
                rows.append(
                    {
                        "media_ref": r,
                        "frame_index": int(i),
                        "feature": _fake_feature(f"{r}#{i}", self.feature_dim).tolist(),
                    }
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("frame_index", pa.int32()),
                    ("feature", pa.list_(pa.float32())),
                ]
            ),
        )


def decode_media_spans(docs_ds, batch_size: int = 128, concurrency: int = 2, feature_dim: int = 64):
    """End-to-end media path over the interleaved table: explode media
    spans → deduplicate refs within batch → ImageDecoder actor pool."""
    import pyarrow.compute as pc

    def explode_refs(batch: pa.Table) -> pa.Table:
        spans = batch["spans"].combine_chunks() if isinstance(batch["spans"], pa.ChunkedArray) else batch["spans"]
        flat = spans.flatten()
        refs = pc.struct_field(flat, "media_ref").drop_null().unique()
        return pa.table({"media_ref": refs})

    refs = docs_ds.map_batches(explode_refs, batch_format="pyarrow")
    return refs.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads are wide
        concurrency=(1, concurrency),
    )
