"""Real media decode: PPM/PGM, uncompressed 24-bit BMP, PCM WAV — the
formats stdlib+numpy can decode without external codec libraries.
Codec-requiring formats still raise DecoderNotAvailable (honest stub).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pytest

from simple_tsdb_spark.pipeline.multimodal import (
    DecoderNotAvailable,
    _resize_nearest,
    decode_media,
    extract_blob_features,
    resize_images,
)


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def _pgm_bytes(img: np.ndarray) -> bytes:
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Hand-rolled uncompressed 24-bit BMP (bottom-up, BGR, 4-byte rows)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r][:, ::-1].tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(rows), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + bytes(rows)


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    img = _img(5, 7)
    out = decode_media(_ppm_bytes(img), "image/x-portable-pixmap")
    np.testing.assert_array_equal(out, img)


def test_pgm_roundtrip():
    img = np.random.default_rng(1).integers(0, 256, size=(4, 6), dtype=np.uint8)
    out = decode_media(_pgm_bytes(img), "image/x-portable-graymap")
    np.testing.assert_array_equal(out, img)


def test_bmp_roundtrip_including_row_padding():
    img = _img(3, 5)  # width 5 → 15-byte rows padded to 16
    out = decode_media(_bmp_bytes(img), "image/bmp")
    np.testing.assert_array_equal(out, img)


def test_wav_roundtrip_stereo():
    t = np.arange(400)
    samples = np.stack(
        [(1000 * np.sin(t / 10)).astype(np.int16), (500 * np.cos(t / 7)).astype(np.int16)],
        axis=1,
    )
    data, rate = decode_media(_wav_bytes(samples, rate=16000), "audio/wav")
    assert rate == 16000
    np.testing.assert_array_equal(data, samples)


def test_codec_formats_still_raise():
    for mime in ("image/jpeg", "image/png", "video/mp4", "text/plain"):
        with pytest.raises(DecoderNotAvailable):
            decode_media(b"\xff\xd8\xff", mime)


def _media_df(spark, rows):
    """rows: list of (doc_id, payload_bytes, mime)."""
    from pyspark.sql import Row

    data = [
        Row(
            doc_id=i,
            payload=bytearray(p),
            media_meta=Row(mime=m, n_bytes=len(p), encoding="binary"),
        )
        for i, p, m in rows
    ]
    return spark.createDataFrame(data)


def test_extract_features_real_decoder_images_and_audio(spark):
    img = _img(6, 9, seed=2)
    samples = np.stack([np.arange(-200, 200, dtype=np.int16)], axis=1)
    df = _media_df(
        spark,
        [
            (1, _ppm_bytes(img), "image/x-portable-pixmap"),
            (2, _wav_bytes(samples), "audio/x-wav"),
        ],
    )
    out = {r.doc_id: r for r in extract_blob_features(df, use_real_decoder=True).collect()}
    assert (out[1].width, out[1].height) == (9, 6)
    assert out[1].mean_sample == pytest.approx(img.astype(np.float64).mean() / 255.0)
    assert (out[2].width, out[2].height) == (400, 1)  # n_frames, channels
    want = np.abs(np.arange(-200, 200, dtype=np.float64)).mean() / 32768.0
    assert out[2].mean_sample == pytest.approx(want)


def test_resize_real_decoder_nearest_neighbor(spark):
    img = _img(8, 8, seed=3)
    df = _media_df(spark, [(1, _ppm_bytes(img), "image/x-portable-pixmap")])
    row = resize_images(df, width=4, height=4, use_real_decoder=True).collect()[0]
    want = hashlib.md5(_resize_nearest(img, 4, 4).tobytes()).hexdigest()
    assert (row.out_width, row.out_height, row.resized_md5) == (4, 4, want)
    # nearest-neighbor semantics: picks every other pixel of an 8x8
    np.testing.assert_array_equal(_resize_nearest(img, 4, 4), img[::2][:, ::2])


def test_resize_real_decoder_rejects_audio(spark):
    samples = np.zeros((10, 1), dtype=np.int16)
    df = _media_df(spark, [(1, _wav_bytes(samples), "audio/wav")])
    with pytest.raises(Exception) as exc:
        resize_images(df, width=2, height=2, use_real_decoder=True).collect()
    assert "image" in str(exc.value)


def test_truncated_payloads_raise_decoder_not_available():
    """Malformed/truncated media must signal DecoderNotAvailable, not
    escape as raw ValueError/struct.error (one bad blob would otherwise
    kill the whole mapInPandas task)."""
    img = _img(4, 4, seed=7)
    full_ppm = _ppm_bytes(img)
    full_bmp = _bmp_bytes(img)
    samples = np.arange(-8, 8, dtype=np.int16).reshape(-1, 2)
    full_wav = _wav_bytes(samples)
    cases = [
        (b"P6", "image/x-portable-pixmap"),            # header cut mid-token
        (b"P6\n4 4\n255\n" + b"\x00" * 5, "image/x-portable-pixmap"),  # short raster
        (b"P6\n4 x\n255\n", "image/x-portable-pixmap"),  # non-numeric dim
        (full_ppm[:10], "image/x-portable-pixmap"),
        (full_bmp[:20], "image/bmp"),                  # header truncated
        (full_bmp[:-30], "image/bmp"),                 # raster truncated
        (full_wav[:-3], "audio/wav"),                  # frame data truncated
        (b"", "image/bmp"),
    ]
    for payload, mime in cases:
        with pytest.raises(DecoderNotAvailable):
            decode_media(payload, mime)
