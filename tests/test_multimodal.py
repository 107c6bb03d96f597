import hashlib

import numpy as np
import pytest

from tric_spark.operators import multimodal as mm


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"abc")
    a = mm.decode_image(b"abc", fake=True)
    b = mm.decode_image(b"abc", fake=True)
    c = mm.decode_image(b"abd", fake=True)
    assert a.shape == (8, 8, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_feature_extraction_plumbing(spark):
    media = mm.synth_media(spark, 200, seed=42)
    feats = mm.extract_media_features(media).collect()
    assert len(feats) == 200
    by_id = {r.media_id: r for r in feats}
    # deterministic, matches a driver-side recomputation through the stub
    row = media.filter("media_id = 3").collect()[0]
    want = hashlib.sha256(bytes(row.payload)).hexdigest()
    assert by_id[3].sha256 == want
    assert len(by_id[3].feat) == 12
    arr = mm.decode_image(bytes(row.payload), fake=True).astype(np.float32)
    assert abs(by_id[3].feat[0] - float(arr.mean(axis=(0, 1))[0])) < 1e-4


def test_media_repartition_byte_budget(spark):
    media = mm.synth_media(spark, 500, seed=42)
    # tiny budget → many partitions; each holds bounded payload
    parts = mm.media_repartition(media, target_bytes=20_000)
    assert parts.rdd.getNumPartitions() > 1
    assert parts.count() == 500


def test_frame_sample_plan(spark):
    media = mm.synth_media(spark, 200, seed=42)
    plan = mm.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert len(rows) > 0
    vids = {r.media_id for r in rows}
    assert vids == {0, 50, 100, 150}
    durs = {r.media_id: r.duration_ms for r in media.filter("kind='video'").collect()}
    for r in rows:
        assert 0 <= r.frame_ts_ms <= durs[r.media_id]


def _wav_bytes(freq_hz: float, n_frames: int = 8000, rate: int = 8000) -> bytes:
    """Genuine PCM16 WAV bytes: one-second sine at freq_hz."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<h", int(20000 * math.sin(2 * math.pi * freq_hz * i / rate))
            )
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_real_wav_decode_and_features(spark):
    """decode_audio is a REAL decoder (stdlib wave): a sine's RMS must be
    amplitude/sqrt(2); corrupt payloads null out, never kill the task."""
    import numpy as np

    from tric_spark.operators.multimodal import decode_audio, extract_audio_features

    wav = _wav_bytes(440.0)
    rate, nch, x = decode_audio(wav)
    assert (rate, nch) == (8000, 1) and x.shape == (8000, 1)
    assert abs(float(np.sqrt((x**2).mean())) - (20000 / 32768) / np.sqrt(2)) < 1e-3

    rows = [
        (1, bytearray(wav)),
        (2, bytearray(_wav_bytes(100.0, n_frames=4000))),
        (3, bytearray(b"not a wav at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in extract_audio_features(df).collect()}
    assert got[1].sample_rate == 8000 and got[1].duration_ms == 1000
    assert got[2].duration_ms == 500
    assert abs(got[1].rms - (20000 / 32768) / 2**0.5) < 1e-3
    assert got[3].sample_rate is None and got[3].rms is None
