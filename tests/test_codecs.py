"""Pure-stdlib media codecs: bit-exact round-trips and the distributed
real-decode path (operators/codecs.py + multimodal integration)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_java_spark.operators import codecs as C
from etl_java_spark.operators.multimodal import (
    extract_features,
    synthesize_real_media_table,
)


def _img(h=13, w=17, ch=3, seed=7):
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_bmp_roundtrip_exact():
    img = _img()
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)


def test_ppm_roundtrip_exact():
    img = _img()
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)
    gray = _img(ch=1)[:, :, 0]
    assert np.array_equal(C.decode_ppm(C.encode_ppm(gray)), gray)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    img = _img(h=9, w=11)
    assert np.array_equal(C.decode_png(C.encode_png(img, filter_type)), img)


@pytest.mark.parametrize("shape", [(8, 6), (8, 6, 2), (8, 6, 4)])
def test_png_gray_and_alpha_color_types(shape):
    img = np.random.RandomState(3).randint(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(C.decode_png(C.encode_png(img)), img)


def test_wav_roundtrip_close():
    t = np.arange(1600) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    samples, rate = C.decode_wav(C.encode_wav(tone, rate=8000))
    assert rate == 8000 and samples.shape == (1600, 1)
    assert np.abs(samples[:, 0] - tone).max() < 1e-4  # 16-bit quantization


def test_wav_8_24_32_bit_widths():
    import io
    import struct
    import wave

    mono = (np.sin(np.arange(100) / 5.0) * 0.5).astype(np.float64)
    for sw, enc in [
        (1, lambda x: (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()),
        (3, lambda x: b"".join(struct.pack("<i", int(v * 8388607))[:3] for v in x)),
        (4, lambda x: (np.clip(x, -1, 1) * 2147483647).astype("<i4").tobytes()),
    ]:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(sw)
            w.setframerate(8000)
            w.writeframes(enc(mono))
        decoded, rate = C.decode_wav(buf.getvalue())
        assert rate == 8000
        assert np.abs(decoded[:, 0] - mono).max() < 0.02, f"sampwidth={sw}"


def test_image_features_shape_and_range():
    feats = C.image_features(_img(h=50, w=40))
    assert len(feats) == 64 and all(0.0 <= f <= 1.0 for f in feats)
    # tiny image (smaller than the grid) still yields 64 cells
    assert len(C.image_features(_img(h=3, w=2))) == 64
    flat = C.image_features(np.full((10, 10), 128, dtype=np.uint8))
    assert all(abs(f - 128 / 255) < 1e-9 for f in flat)


def test_audio_features_tone():
    rate = 8000
    t = np.arange(rate) / rate
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    dur, rms, zcr, centroid, rolloff, peak, mean_abs, nch = C.audio_features(tone, rate)
    assert abs(dur - 1.0) < 1e-9
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(centroid - 440.0) < 5.0  # energy concentrated at the tone
    assert abs(rolloff - 440.0) < 10.0
    assert nch == 1.0


def test_decode_any_rejects_jpeg():
    with pytest.raises(NotImplementedError):
        C.decode_any(b"\xff\xd8\xff", "image/jpeg")


def test_real_codec_distributed(spark):
    """End-to-end: real BMP/PNG/PPM/WAV bytes through Arrow-batched
    mapInPandas with the stdlib codec — no fake features anywhere."""
    media = synthesize_real_media_table(spark, n=16)
    feats = extract_features(media, codec=C.stdlib_codec).orderBy("uri").collect()
    assert len(feats) == 16
    for r in feats:
        if r.mime == "audio/wav":
            assert len(r.feature) == 8 and r.feature[0] > 0  # duration
        else:
            assert len(r.feature) == 64
            assert all(0.0 <= f <= 1.0 for f in r.feature)


# ---------------------------------------------------------------------------
# resize / framepack / frame sampling (charter: decode, feature-extract,
# resize, frame-sample)


def test_resize_nearest_upscale_exact():
    img = np.array([[0, 255], [100, 200]], dtype=np.uint8)
    big = C.resize_nearest(img, 4, 4)
    assert big.shape == (4, 4)
    # each source pixel becomes a 2x2 block
    assert (big[:2, :2] == 0).all() and (big[:2, 2:] == 255).all()
    assert (big[2:, :2] == 100).all() and (big[2:, 2:] == 200).all()


def test_resize_nearest_downscale_and_color():
    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    small = C.resize_nearest(img, 3, 4)
    assert small.shape == (3, 4, 3)
    # row/col index mapping: out[i,j] = in[(i*6)//3, (j*8)//4]
    assert (small[1, 2] == img[2, 4]).all()


def test_framepack_roundtrip_bit_exact():
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8) for _ in range(4)]
    packed = C.encode_framepack(frames)
    out = C.decode_framepack(packed)
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_sample_frame_indices_policy():
    assert C.sample_frame_indices(10, 4) == [0, 3, 6, 9]  # ends included
    assert C.sample_frame_indices(10, 1) == [5]
    assert C.sample_frame_indices(3, 5) == [0, 1, 2]  # k capped at n
    assert C.sample_frame_indices(0, 3) == []


def test_video_features_shape_and_determinism():
    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(8)]
    packed = C.encode_framepack(frames)
    f1 = C.video_features(packed, k=4, thumb=4)
    f2 = C.video_features(packed, k=4, thumb=4)
    assert len(f1) == 4 * 4 * 4  # k frames x thumb^2
    assert f1 == f2
    assert all(0.0 <= x <= 1.0 for x in f1)
