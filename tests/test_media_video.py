"""Real video frame-sampling path over the in-repo JRVF raw-frames
container (index header + concatenated BMP frames) — the same
real-stdlib treatment audio got with WAV.  Production codecs stay
behind the documented ffmpeg/pyav hook; undecodable payloads raise
under strict=True and fall back to the deterministic fake otherwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from json_schema_ray.functions.media import (
    FrameSampler,
    decode_jrvf_frame,
    encode_jrvf,
    jrvf_index,
    sample_video_spans,
    synth_jrvf_payload,
)


def _frames(n, w=6, h=5, seed=0):
    rs = np.random.RandomState(seed)
    return [rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_jrvf_roundtrip_exact_pixels():
    frames = _frames(7)
    payload = encode_jrvf(frames, fps=12.5)
    fps, offs = jrvf_index(payload)
    assert fps == 12.5 and len(offs) == 8
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(decode_jrvf_frame(payload, offs, i), f)


def test_jrvf_index_rejects_non_jrvf():
    with pytest.raises(ValueError):
        jrvf_index(b"RIFFxxxxWAVE" + b"\x00" * 32)


def test_frame_sampler_real_path_decodes_only_sampled():
    frames = _frames(20, seed=3)
    payload = encode_jrvf(frames, fps=10.0)
    batch = pa.table(
        {"media_ref": ["v1"], "payload": pa.array([payload], type=pa.binary())}
    )
    out = FrameSampler(n_frames=4, feature_dim=16)(batch).to_pandas()
    assert list(out["decode_path"].unique()) == ["stdlib"]
    assert len(out) == 4
    # uniform sampling over 20 frames: first and last always included
    assert out["frame_index"].iloc[0] == 0 and out["frame_index"].iloc[-1] == 19
    assert out["timestamp_sec"].iloc[-1] == pytest.approx(1.9)
    # features come from the REAL pixel content: frame 0's feature must
    # equal the mean-pooled grayscale of frames[0]
    from json_schema_ray.functions.media import _mean_pool_feature

    np.testing.assert_allclose(
        np.array(out["feature"].iloc[0]), _mean_pool_feature(frames[0], 16)
    )


def test_frame_sampler_short_clip_no_duplicate_indices():
    payload = encode_jrvf(_frames(2), fps=10.0)
    batch = pa.table(
        {"media_ref": ["v"], "payload": pa.array([payload], type=pa.binary())}
    )
    out = FrameSampler(n_frames=4)(batch).to_pandas()
    assert sorted(out["frame_index"]) == [0, 1]  # clip shorter than n_frames


def test_frame_sampler_strict_raises_for_real_codecs():
    mp4ish = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64
    batch = pa.table(
        {"media_ref": ["v"], "payload": pa.array([mp4ish], type=pa.binary())}
    )
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        FrameSampler(strict=True)(batch)
    # non-strict: deterministic fake, flagged as such
    out = FrameSampler(strict=False)(batch).to_pandas()
    assert list(out["decode_path"].unique()) == ["fake"]
    again = FrameSampler(strict=False)(batch).to_pandas()
    assert out.equals(again)


def test_synth_payload_deterministic():
    assert synth_jrvf_payload("media://x") == synth_jrvf_payload("media://x")
    assert synth_jrvf_payload("media://x") != synth_jrvf_payload("media://y")
    fps, offs = jrvf_index(synth_jrvf_payload("media://x"))
    assert 6 <= len(offs) - 1 <= 17


def test_sample_video_spans_e2e(ray_session):
    import ray.data as rd

    from json_schema_ray.sources.interleaved import generate

    data = generate(n_docs=200, seed=5, n_parts=2)
    ds = rd.from_arrow(data.documents)
    out = sample_video_spans(ds, n_frames=3, synthesize_payloads=True).to_pandas()
    assert len(out) > 0
    assert (out["decode_path"] == "stdlib").all()  # every clip real-decoded
    assert out.groupby("media_ref").size().max() <= 3


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    n_frames=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    fps=st.sampled_from([1.0, 10.0, 23.976, 60.0]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jrvf_roundtrip_property(n_frames, w, h, fps, seed):
    rs = np.random.RandomState(seed)
    frames = [rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
    payload = encode_jrvf(frames, fps=fps)
    got_fps, offs = jrvf_index(payload)
    assert got_fps == fps and len(offs) == n_frames + 1
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(decode_jrvf_frame(payload, offs, i), f)
