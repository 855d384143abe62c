"""Property tests for the pure-Python media decoders: random images
through the test encoders must roundtrip bit-exactly (PNG/GIF/WAV) or
match the baseline decode of identical coefficients (progressive JPEG).
Sizes are bounded so each example stays in the low milliseconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_media_decode import (
    _fmp4_bytes,
    _gif_anim_bytes,
    _jpeg_bytes,
    _jpeg_progressive_bytes,
    _png_bytes,
    _wav_raw,
)
from simple_tsdb_spark.pipeline.gif import decode_gif_frames
from simple_tsdb_spark.pipeline.jpeg import decode_jpeg
from simple_tsdb_spark.pipeline.mp4 import parse_mp4
from simple_tsdb_spark.pipeline.multimodal import _decode_wav
from simple_tsdb_spark.pipeline.png import decode_png


@settings(deadline=None, max_examples=40)
@given(
    h=st.integers(1, 13),
    w=st.integers(1, 13),
    depth=st.sampled_from([1, 2, 4, 8, 16]),
    nch=st.sampled_from([1, 3, 4]),
    interlace=st.booleans(),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    seed=st.integers(0, 2**16),
)
def test_png_roundtrip_property(h, w, depth, nch, interlace, filters, seed):
    if depth < 8 and nch != 1:
        depth = 8  # sub-byte only exists for greyscale/indexed
    mx = (1 << depth) - 1
    rng = np.random.default_rng(seed)
    shape = (h, w) if nch == 1 else (h, w, nch)
    img = rng.integers(0, mx + 1, size=shape).astype(
        np.uint16 if depth == 16 else np.uint8
    )
    out = decode_png(_png_bytes(img, depth=depth, interlace=int(interlace), filters=filters))
    if depth < 8:
        np.testing.assert_array_equal(out, (img.astype(int) * 255 // mx).astype(np.uint8))
    else:
        np.testing.assert_array_equal(out, img)


@settings(deadline=None, max_examples=15)
@given(
    bh=st.integers(1, 3),
    bw=st.integers(1, 3),
    crop_y=st.integers(0, 7),
    crop_x=st.integers(0, 7),
    al=st.integers(0, 2),
    subsample=st.booleans(),
    gray=st.booleans(),
    seed=st.integers(0, 2**16),
)
def test_jpeg_progressive_matches_baseline_property(
    bh, bw, crop_y, crop_x, al, subsample, gray, seed
):
    rng = np.random.default_rng(seed)
    h = max(1, bh * 8 - crop_y)
    w = max(1, bw * 8 - crop_x)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    if subsample and gray:
        subsample = False
    prog = decode_jpeg(_jpeg_progressive_bytes(img, subsample=subsample, Al=al))
    base = decode_jpeg(_jpeg_bytes(img, subsample=subsample))
    np.testing.assert_array_equal(prog, base)


@settings(deadline=None, max_examples=25)
@given(
    nframes=st.integers(1, 4),
    h=st.integers(1, 6),
    w=st.integers(1, 6),
    seed=st.integers(0, 2**16),
)
def test_gif_animation_property(nframes, h, w, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
    frames = [
        (
            rng.integers(0, 4, size=(h, w)).astype(np.uint8),
            (0, 0),
            int(rng.integers(0, 4)),
            int(rng.integers(0, 100)),
            None,
        )
        for _ in range(nframes)
    ]
    out, delays = decode_gif_frames(_gif_anim_bytes((w, h), frames, pal))
    assert out.shape == (nframes, h, w, 4)
    assert delays == [f[3] * 10 for f in frames]
    # full-screen opaque frames: each canvas IS that frame's pixels
    for i, (idx, _o, _d, _dl, _t) in enumerate(frames):
        np.testing.assert_array_equal(out[i][..., :3], pal[idx])


@settings(deadline=None, max_examples=25)
@given(
    tag=st.sampled_from([1, 3]),
    bits_pcm=st.sampled_from([8, 16, 24, 32]),
    bits_f=st.sampled_from([32, 64]),
    nch=st.integers(1, 3),
    n=st.integers(1, 50),
    seed=st.integers(0, 2**16),
)
def test_wav_roundtrip_property(tag, bits_pcm, bits_f, nch, n, seed):
    rng = np.random.default_rng(seed)
    if tag == 1:
        bits = bits_pcm
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        if bits == 8:
            lo, hi = 0, 255
        vals = rng.integers(lo, hi + 1, size=(n, nch))
        if bits == 24:
            raw = b"".join(
                int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals.flatten()
            )
        else:
            dt = {8: "u1", 16: "<i2", 32: "<i4"}[bits]
            raw = vals.astype(dt).tobytes()
    else:
        bits = bits_f
        vals = rng.normal(size=(n, nch))
        raw = vals.astype("<f4" if bits == 32 else "<f8").tobytes()
    data, rate = _decode_wav(_wav_raw(raw, tag=tag, nch=nch, rate=8000, bits=bits))
    assert rate == 8000 and data.shape == (n, nch)
    if tag == 1 and bits == 24:
        np.testing.assert_array_equal(data, (vals << 8).astype(np.int32))
    elif tag == 1:
        np.testing.assert_array_equal(data, vals)
    else:
        np.testing.assert_array_equal(
            data, vals.astype("<f4" if bits == 32 else "<f8")
        )


@settings(deadline=None, max_examples=20)
@given(
    nfrag=st.integers(1, 3),
    sizes=st.lists(st.integers(1, 40), min_size=1, max_size=5),
    explicit=st.booleans(),
    seed=st.integers(0, 2**16),
)
def test_fmp4_sample_table_property(nfrag, sizes, explicit, seed):
    rng = np.random.default_rng(seed)
    frags = [
        [(bytes(rng.integers(0, 256, size=s).astype(np.uint8)), int(rng.integers(1, 500)))
         for s in sizes]
        for _ in range(nfrag)
    ]
    payload = _fmp4_bytes(frags, explicit_base=explicit)
    trk = parse_mp4(payload)["tracks"][0]
    want = [s for frag in frags for s, _d in frag]
    assert trk["n_samples"] == len(want)
    for (off, size), raw in zip(trk["samples"], want):
        assert payload[off : off + size] == raw
    assert trk["duration"] == sum(d for frag in frags for _s, d in frag)
