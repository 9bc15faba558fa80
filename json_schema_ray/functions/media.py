"""Multimodal column stages: decode / feature-extract / resize /
frame-sample over opaque ``binary`` media payloads with typed metadata.

Families: image (decode / feature-extract / resize), audio
(WAV decode / feature-extract), video (REAL frame-sampling over the
in-repo JRVF raw-frames container — indexed seek, decode only sampled
frames; ffmpeg/pyav remain the production hook for real codecs).
Image decode resolution order per payload:

1. **PIL**, when importable (not in this container — the import hook is
   real and tested by force-injecting a stub module);
2. **stdlib codecs** (this module): uncompressed 24/32-bit BMP and
   binary PPM (P6) are decoded to real pixel arrays with numpy — a REAL
   decode path with zero external dependencies, exercised end-to-end by
   ``q_media_decode`` over deterministically generated BMP payloads;
3. deterministic hash-derived fake (``strict=False``) or
   ``NotImplementedError`` (``strict=True``) for formats neither path
   can handle (JPEG/PNG/video need the absent libraries).

Features are an 8×8 mean-pooled grayscale grid (vectorized numpy) for
real decodes, hash-seeded vectors on the fake path.

Batch-size note (memory-aware, SURVEY.md §4): media payloads are large —
callers should pass a SMALL ``batch_size`` (e.g. 32-256) so
batch × concurrency fits worker heaps; metadata-only stages keep the
default.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

# --------------------------------------------------- stdlib image codecs


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (BITMAPINFOHEADER)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR order
    img[:, : w * 3] = bgr.reshape(h, w * 3)
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def decode_image_bytes(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode BMP (24/32-bit BI_RGB) or PPM (P6) → (w, h, channels,
    (h, w, 3) uint8 RGB).  Raises ValueError for other formats."""
    if payload[:2] == b"BM":
        off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if comp != 0 or bpp not in (24, 32):
            raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
        flip = h > 0
        h = abs(h)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
        px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        if flip:
            px = px[::-1]
        rgb = px[:, :, 2::-1] if nb >= 3 else px  # BGR(A) → RGB
        return w, h, 3, np.ascontiguousarray(rgb[:, :, :3])
    if payload[:2] == b"P6":
        # P6\n<w> <h>\n<maxval>\n<binary RGB>
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment line
                pos = payload.index(b"\n", pos) + 1
                continue
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PPM unsupported")
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return w, h, 3, px.reshape(h, w, 3).copy()
    raise ValueError("unknown image format (not BMP/P6 PPM)")


def _mean_pool_feature(rgb: np.ndarray, dim: int) -> np.ndarray:
    """8×8 mean-pooled grayscale grid → feature vector (padded/truncated
    to ``dim``).  Pure vectorized numpy."""
    g = rgb.astype(np.float32).mean(axis=2)
    h, w = g.shape
    gy, gx = min(8, h), min(8, w)
    g = g[: (h // gy) * gy, : (w // gx) * gx]
    pooled = g.reshape(gy, h // gy, gx, w // gx).mean(axis=(1, 3)) / 255.0
    flat = pooled.reshape(-1).astype(np.float32)
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(flat))] = flat[:dim]
    return out

DECODED_IMAGE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_channels", pa.int32()),
        ("feature", pa.list_(pa.float32())),
        ("decode_path", pa.string()),  # "pil" | "stdlib" | "fake"
    ]
)


def synth_wav_payload(ref: str, sr: int = 8000) -> bytes:
    """Deterministic short WAV tone derived from the ref hash (exercises
    the REAL stdlib audio path without external data)."""
    h = hashlib.sha256((ref or "").encode()).digest()
    f = 200.0 + (h[0] << 2)
    dur = 0.05 + (h[1] % 20) / 100.0
    t = np.arange(int(sr * dur)) / sr
    return encode_wav(0.4 * np.sin(2 * np.pi * f * t), sr)


def synth_bmp_payload(ref: str) -> bytes:
    """Deterministic small BMP derived from the ref hash (test/bench
    payload source — exercises the REAL stdlib decode path without
    external data)."""
    h = hashlib.sha256((ref or "").encode()).digest()
    w, ht = 8 + h[0] % 9, 8 + h[1] % 9
    seed = int.from_bytes(h[:4], "little")
    px = np.random.RandomState(seed).randint(0, 256, size=(ht, w, 3), dtype=np.uint8)
    return encode_bmp(px)


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

    def _decode_one(self, ref: str, payload: bytes | None):
        """→ (w, h, channels, feature, path) — resolution order: PIL →
        stdlib BMP/PPM → fake/strict (module docstring)."""
        if payload is not None:
            if self._pil is not None:
                import io

                try:
                    img = self._pil.open(io.BytesIO(payload))
                    rgb = np.asarray(img.convert("RGB"))
                    return (
                        img.width, img.height, 3,
                        _mean_pool_feature(rgb, self.feature_dim), "pil",
                    )
                except Exception:
                    pass  # fall through to stdlib codecs
            try:
                w, h, c, rgb = decode_image_bytes(bytes(payload))
                return w, h, c, _mean_pool_feature(rgb, self.feature_dim), "stdlib"
            except ValueError:
                pass
        if self.strict:
            raise NotImplementedError(
                "no decoder for this payload: PIL absent and format is not "
                "BMP/PPM (strict=True; set strict=False for the deterministic fake)"
            )
        d = _fake_dims(ref or "")
        return d[0], d[1], d[2], _fake_feature(ref or "", self.feature_dim), "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = batch["payload"].to_pylist() if "payload" in batch.column_names else [None] * len(refs)
        ws, hs, cs, feats, paths = [], [], [], [], []
        for r, p in zip(refs, payloads):  # per-item: codecs decode one image at a time
            w, h, c, f, path = self._decode_one(r, p)
            ws.append(w); hs.append(h); cs.append(c); feats.append(f); paths.append(path)
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "n_channels": pa.array(cs, type=pa.int32()),
                "feature": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
                "decode_path": pa.array(paths, type=pa.string()),
            }
        )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """stdlib WAV (PCM 8/16-bit) → (sample_rate, n_channels,
    (n_frames, n_channels) float32 in [-1, 1])."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        sr, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return sr, nch, x.reshape(-1, nch)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n_frames,) or (n_frames, ch) float in [-1, 1] → 16-bit PCM WAV."""
    import io
    import wave

    x = np.atleast_2d(samples.T).T
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(x.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class AudioFeatures:
    """Actor-pool stage: WAV payloads → (duration_sec, sample_rate, rms,
    zero_crossing_rate) via the stdlib decoder; hash-derived fake for
    undecodable payloads (strict=True raises instead)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = (
            batch["payload"].to_pylist() if "payload" in batch.column_names else [None] * len(refs)
        )
        rows = {"duration_sec": [], "sample_rate": [], "rms": [], "zcr": [], "decode_path": []}
        for r, p in zip(refs, payloads):
            try:
                if p is None:
                    raise ValueError("no payload")
                sr, _, x = decode_wav(bytes(p))
                mono = x.mean(axis=1)
                rows["duration_sec"].append(len(mono) / sr)
                rows["sample_rate"].append(sr)
                rows["rms"].append(float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0)
                rows["zcr"].append(
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
                )
                rows["decode_path"].append("stdlib")
            except Exception as e:  # codec boundary: wave.Error/struct.error/ValueError
                if self.strict:
                    raise NotImplementedError(f"cannot decode audio payload: {e}")
                h = hashlib.sha256((r or "").encode()).digest()
                rows["duration_sec"].append(1 + h[3] % 30)
                rows["sample_rate"].append(16000)
                rows["rms"].append(h[4] / 255.0)
                rows["zcr"].append(h[5] / 255.0)
                rows["decode_path"].append("fake")
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "duration_sec": pa.array(rows["duration_sec"], type=pa.float64()),
                "sample_rate": pa.array(rows["sample_rate"], type=pa.int32()),
                "rms": pa.array(rows["rms"], type=pa.float64()),
                "zcr": pa.array(rows["zcr"], type=pa.float64()),
                "decode_path": pa.array(rows["decode_path"], type=pa.string()),
            }
        )


def resize_rgb(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (vectorized index sampling) — the stdlib
    analog of PIL's resize for the decode paths this container supports."""
    h, w = rgb.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return rgb[yi][:, xi]


class ImageResizer:
    """Actor-pool stage: (media_ref, payload) → resized payload (BMP) +
    dimensions.  Same decode resolution order as ImageDecoder; payloads
    that cannot decode pass through unchanged with ``resized=False``."""

    def __init__(self, out_w: int = 32, out_h: int = 32, strict: bool = False):
        self.out_w, self.out_h = out_w, out_h
        self.dec = ImageDecoder(feature_dim=1, strict=strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = batch["payload"].to_pylist()
        outs, ok = [], []
        for r, p in zip(refs, payloads):
            try:
                _, _, _, rgb = decode_image_bytes(bytes(p))
                outs.append(encode_bmp(resize_rgb(rgb, self.out_w, self.out_h)))
                ok.append(True)
            except (ValueError, TypeError):
                if self.dec.strict:
                    raise NotImplementedError("cannot decode payload for resize")
                outs.append(p)
                ok.append(False)
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "payload": pa.array(outs, type=pa.binary()),
                "width": pa.array([self.out_w if k else -1 for k in ok], type=pa.int32()),
                "height": pa.array([self.out_h if k else -1 for k in ok], type=pa.int32()),
                "resized": pa.array(ok),
            }
        )


# --------------------------------------------------- raw-frames video
#
# JRVF ("JSR raw video frames") — the trivial decodable container that
# gives video the same REAL stdlib path audio got with WAV: a seekable
# index header + concatenated BMP frames.  Layout (little-endian):
#
#   b"JRV1" | uint32 n_frames | float64 fps | uint32 lengths[n_frames]
#   | frame 0 bytes (BMP) | frame 1 bytes | ...
#
# The length table makes frame access O(1): FrameSampler seeks to the k
# SAMPLED frames and decodes only those — at scale you never decode the
# frames you throw away (the same reason real pipelines use keyframe
# indexes).  ffmpeg/pyav stay the production hook for real codecs.

JRVF_MAGIC = b"JRV1"


def encode_jrvf(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """list of (h, w, 3) uint8 RGB frames → JRVF container bytes."""
    blobs = [encode_bmp(f) for f in frames]
    head = JRVF_MAGIC + struct.pack("<Id", len(blobs), fps)
    head += struct.pack(f"<{len(blobs)}I", *[len(b) for b in blobs])
    return head + b"".join(blobs)


def jrvf_index(payload: bytes) -> tuple[float, np.ndarray]:
    """Parse only the header → (fps, frame byte-offset array of
    n_frames+1 entries).  Raises ValueError for non-JRVF payloads."""
    if payload[:4] != JRVF_MAGIC:
        raise ValueError("not a JRVF payload")
    n, fps = struct.unpack_from("<Id", payload, 4)
    lens = np.frombuffer(payload, dtype="<u4", count=n, offset=16).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    offs += 16 + 4 * n
    return fps, offs


def decode_jrvf_frame(payload: bytes, offs: np.ndarray, i: int) -> np.ndarray:
    """Decode frame ``i`` only (seek via the index — no full-file decode)."""
    return decode_image_bytes(payload[offs[i] : offs[i + 1]])[3]


def synth_jrvf_payload(ref: str, fps: float = 10.0) -> bytes:
    """Deterministic tiny JRVF clip derived from the ref hash (exercises
    the REAL frame-sampling path without external data): 6-17 frames of
    drifting noise so sampled frames differ."""
    h = hashlib.sha256((ref or "").encode()).digest()
    n = 6 + h[2] % 12
    w, ht = 8 + h[0] % 9, 8 + h[1] % 9
    rs = np.random.RandomState(int.from_bytes(h[:4], "little"))
    base = rs.randint(0, 256, size=(ht, w, 3), dtype=np.uint8)
    frames = [np.roll(base, t, axis=1) for t in range(n)]
    return encode_jrvf(frames, fps=fps)


class FrameSampler:
    """Video frame-sampling stage: ``(media_ref, payload)`` → ``n_frames``
    uniformly sampled frames with per-frame features.

    REAL path: JRVF containers (index header + BMP frames, encoder
    in-repo) — only the sampled frames are decoded, via the O(1) length
    table.  Production codecs (mp4/webm) would slot in through pyav/
    ffmpeg, absent in this container: such payloads raise under
    ``strict=True`` and fall back to the deterministic hash-derived fake
    otherwise (``decode_path`` column says which path produced each row)."""

    def __init__(self, n_frames: int = 4, feature_dim: int = 32, strict: bool = False):
        self.n_frames = n_frames
        self.feature_dim = feature_dim
        self.strict = strict

    def _sample_real(self, r: str, payload: bytes, rows: list):
        fps, offs = jrvf_index(payload)
        total = len(offs) - 1
        idxs = np.unique(np.linspace(0, total - 1, min(self.n_frames, total)).astype(np.int32))
        for i in idxs:
            rgb = decode_jrvf_frame(payload, offs, int(i))
            rows.append(
                {
                    "media_ref": r,
                    "frame_index": int(i),
                    "timestamp_sec": float(i / fps) if fps else 0.0,
                    "feature": _mean_pool_feature(rgb, self.feature_dim).tolist(),
                    "decode_path": "stdlib",
                }
            )

    def _sample_fake(self, r: str, rows: list):
        h = hashlib.sha256((r or "").encode()).digest()
        total = 30 + h[2] % 270  # fake frame count
        idxs = np.linspace(0, total - 1, self.n_frames).astype(np.int32)
        for i in idxs:
            rows.append(
                {
                    "media_ref": r,
                    "frame_index": int(i),
                    "timestamp_sec": float(i / 10.0),
                    "feature": _fake_feature(f"{r}#{i}", self.feature_dim).tolist(),
                    "decode_path": "fake",
                }
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = (
            batch["payload"].to_pylist()
            if "payload" in batch.column_names
            else [None] * len(refs)
        )
        rows: list[dict] = []
        for r, p in zip(refs, payloads):  # per-item: frames decode one at a time
            try:
                if p is None:
                    raise ValueError("no payload")
                self._sample_real(r, bytes(p), rows)
            except (ValueError, struct.error) as e:
                if self.strict:
                    raise NotImplementedError(
                        f"cannot decode video payload ({e}); real codecs need "
                        "ffmpeg/pyav, absent in this container"
                    ) from e
                self._sample_fake(r, rows)
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("frame_index", pa.int32()),
                    ("timestamp_sec", pa.float64()),
                    ("feature", pa.list_(pa.float32())),
                    ("decode_path", pa.string()),
                ]
            ),
        )


def sample_video_spans(
    docs_ds, n_frames: int = 4, batch_size: int = 128, concurrency: int = 2,
    feature_dim: int = 32, synthesize_payloads: bool = False,
):
    """Video family end-to-end: explode video-span refs → FrameSampler
    actor pool.  ``synthesize_payloads=True`` attaches a deterministic
    JRVF clip per ref so the REAL seek+decode path runs (a production
    table would carry the payload column / object-store URI directly)."""
    import pyarrow.compute as pc

    def explode_refs(batch: pa.Table) -> pa.Table:
        spans = batch["spans"].combine_chunks() if isinstance(batch["spans"], pa.ChunkedArray) else batch["spans"]
        flat = spans.flatten()
        is_video = pc.equal(pc.struct_field(flat, "kind"), "video")
        refs = pc.struct_field(flat, "media_ref").filter(is_video).drop_null().unique()
        t = pa.table({"media_ref": refs})
        if synthesize_payloads:
            t = t.append_column(
                "payload",
                pa.array([synth_jrvf_payload(r) for r in refs.to_pylist()], type=pa.binary()),
            )
        return t

    refs = docs_ds.map_batches(explode_refs, batch_format="pyarrow")
    return refs.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads are wide
        concurrency=(1, concurrency),
    )


def decode_media_spans(
    docs_ds, batch_size: int = 128, concurrency: int = 2, feature_dim: int = 64,
    synthesize_payloads: bool = False,
):
    """End-to-end media path over the interleaved table: explode media
    spans → deduplicate refs within batch → ImageDecoder actor pool.

    ``synthesize_payloads=True`` attaches a deterministic BMP payload per
    ref so the REAL stdlib decode path runs (the interleaved test corpus
    stores refs, not bytes; a production table would carry the payload
    column directly)."""
    import pyarrow.compute as pc

    def explode_refs(batch: pa.Table) -> pa.Table:
        spans = batch["spans"].combine_chunks() if isinstance(batch["spans"], pa.ChunkedArray) else batch["spans"]
        flat = spans.flatten()
        refs = pc.struct_field(flat, "media_ref").drop_null().unique()
        t = pa.table({"media_ref": refs})
        if synthesize_payloads:
            t = t.append_column(
                "payload",
                pa.array([synth_bmp_payload(r) for r in refs.to_pylist()], type=pa.binary()),
            )
        return t

    refs = docs_ds.map_batches(explode_refs, batch_format="pyarrow")
    return refs.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads are wide
        concurrency=(1, concurrency),
    )
