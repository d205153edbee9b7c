"""Multimodal plumbing: golden values for the stub decoder, feature
extraction, and chunk sampling (the registry's rows-only queries are
value-pinned HERE, as their docstrings promise)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rsbsa_etl_spark.functions import multimodal


def test_decode_stub_golden():
    # deterministic: sha256-derived, dim values in [0, 1)
    v = multimodal.decode_stub(b"hello")
    assert len(v) == multimodal.FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in v)
    h = hashlib.sha256(b"hello").digest()
    assert v[0] == int.from_bytes(h[0:4], "big") / 2**32
    assert v == multimodal.decode_stub(b"hello")
    assert v != multimodal.decode_stub(b"hello!")


def test_extract_features_golden(spark):
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "hello world")], "doc_id bigint, text string"
    )
    frames = multimodal.attach_binary(docs)
    rows = {
        r["doc_id"]: r for r in multimodal.extract_features(frames).collect()
    }
    assert rows[1]["byte_len"] == 3
    assert rows[1]["content_md5"] == hashlib.md5(b"abc").hexdigest()
    assert rows[1]["feature"] == multimodal.decode_stub(b"abc")
    assert rows[2]["content_md5"] == hashlib.md5(b"hello world").hexdigest()


def test_sample_chunks_golden(spark):
    text = "x" * 300  # 300 bytes -> offsets 0,128,256 at stride 128
    docs = spark.createDataFrame([(7, text)], "doc_id bigint, text string")
    frames = multimodal.attach_binary(docs)
    rows = sorted(
        map(tuple, multimodal.sample_chunks(frames, 64, 128).collect())
    )
    raw = text.encode()
    want = [
        (7, i, len(raw[o : o + 64]), hashlib.md5(raw[o : o + 64]).hexdigest())
        for i, o in enumerate([0, 128, 256])
    ]
    assert rows == sorted(want)
    # last chunk is the 300-256=44-byte tail
    assert rows[2][2] == 44


def test_meta_supports_predicate_pushdown(spark, tmp_path):
    # the claim in the module docstring: metadata predicates prune
    # BEFORE decode work — the meta column must be scannable without
    # touching payload bytes
    docs = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 1000)], "doc_id bigint, text string"
    )
    path = str(tmp_path / "frames")
    multimodal.attach_binary(docs).write.parquet(path)
    small = spark.read.parquet(path).where(F.col("meta.byte_len") < 100)
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert (
        "PushedFilters: [IsNotNull(meta.byte_len), LessThan(meta.byte_len,100)]"
        in plan
    )
    assert small.count() == 1


def _sine_wav(freq: float, rate: int = 8000, secs: float = 1.0,
              amp: float = 0.5, nch: int = 1) -> bytes:
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * secs)) / rate
    x = (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype("<i2")
    if nch > 1:
        x = np.repeat(x[:, None], nch, axis=1).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def _bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    import struct

    stride = (width * 3 + 3) & ~3
    img = bytearray()
    row = (bytes([rgb[2], rgb[1], rgb[0]]) * width).ljust(stride, b"\0")
    for _ in range(height):
        img += row
    off = 54
    size = off + len(img)
    header = (
        b"BM" + struct.pack("<IHHI", size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(img), 2835, 2835, 0, 0)
    )
    return header + bytes(img)


def test_wav_decoder_measures_real_audio(spark):
    """the flag-gated REAL audio decode (r8 verdict item 8): features
    must track the CONTENT of a genuine RIFF/WAVE payload — duration,
    channel count, amplitude, and the spectral centroid landing on
    the sine's frequency — through the same mapInPandas plan as the
    stub arm."""
    a440 = _sine_wav(440.0, rate=8000, secs=1.0, amp=0.5)
    a2k = _sine_wav(2000.0, rate=8000, secs=2.0, amp=0.25, nch=2)
    frames = spark.createDataFrame(
        [(1, bytearray(a440)), (2, bytearray(a2k))],
        "doc_id bigint, payload binary",
    )
    rows = {
        r["doc_id"]: r["feature"]
        for r in multimodal.extract_features(frames, decoder="wav").collect()
    }
    dur, rate, nch, peak, rms, _zc, _ma, cent = range(8)
    f1, f2 = rows[1], rows[2]
    assert abs(f1[dur] - 1.0) < 1e-9 and abs(f2[dur] - 2.0) < 1e-9
    assert f1[nch] == 1.0 and f2[nch] == 2.0
    assert abs(f1[rate] - 8000 / 48000) < 1e-9
    # sine amplitude 0.5 -> peak ~0.5, rms ~0.5/sqrt(2)
    assert abs(f1[peak] - 0.5) < 0.01
    assert abs(f1[rms] - 0.3536) < 0.01
    assert f2[peak] < f1[peak]  # quieter file measures quieter
    # spectral centroid: 440 Hz vs 2 kHz of a 4 kHz Nyquist
    assert abs(f1[cent] - 440 / 4000) < 0.02
    assert abs(f2[cent] - 2000 / 4000) < 0.02


def test_bmp_decoder_measures_real_pixels(spark):
    """the flag-gated REAL image decode: geometry and channel means
    must come from the actual BMP pixels (BGR order, bottom-up rows,
    4-byte stride padding all handled)."""
    red = _bmp(5, 3, (255, 0, 0))
    grey = _bmp(16, 16, (128, 128, 128))
    frames = spark.createDataFrame(
        [(1, bytearray(red)), (2, bytearray(grey))],
        "doc_id bigint, payload binary",
    )
    rows = {
        r["doc_id"]: r["feature"]
        for r in multimodal.extract_features(frames, decoder="bmp").collect()
    }
    w, h, aspect, r_, g_, b_, gstd, bpp = range(8)
    f1, f2 = rows[1], rows[2]
    assert f1[w] == 5 / 4096.0 and f1[h] == 3 / 4096.0
    assert abs(f1[aspect] - 5 / 3) < 1e-9
    assert f1[r_] == 1.0 and f1[g_] == 0.0 and f1[b_] == 0.0
    assert abs(f2[r_] - 128 / 255) < 1e-9 and f2[gstd] == 0.0
    assert f1[bpp] == 24 / 32.0
    # malformed payload degrades to the zero row, never crashes
    bad = spark.createDataFrame(
        [(3, bytearray(b"not a bitmap"))], "doc_id bigint, payload binary"
    )
    (zrow,) = multimodal.extract_features(bad, decoder="bmp").collect()
    assert zrow["feature"] == [0.0] * multimodal.FEATURE_DIM


def test_stub_stays_the_default_decoder(spark):
    """the oracle-checked sha256 stub must remain the default arm —
    the real codecs are opt-in flags, exactly as SURVEY/VERDICT
    document the fixture limitation."""
    frames = spark.createDataFrame(
        [(1, bytearray(b"abc"))], "doc_id bigint, payload binary"
    )
    (row,) = multimodal.extract_features(frames).collect()
    assert row["feature"] == multimodal.decode_stub(b"abc")


def test_wav_chunker_respects_frame_boundaries_and_physics(spark):
    """the REAL-codec chunking arm (r12 verdict item 7): windows are
    whole PCM frames over the DECODED signal, and the per-chunk stats
    are the signal's physics — a 0.5-amplitude sine chunk measures
    RMS ≈ 0.5/√2 and peak ≈ 0.5, a silent chunk measures exactly 0,
    and boundaries land where the frame math says. The stereo file
    would shear to noise under byte-offset slicing (4 bytes/frame),
    which is exactly why this arm exists; the byte-offset stub stays
    the oracle-checked registry default."""
    import numpy as np

    rate = 8000
    # 1 s of 0.5-amp 440 Hz sine, then 1 s of silence — STEREO, so a
    # mid-frame byte cut would misalign every later sample
    t = np.arange(rate) / rate
    sine = (0.5 * 32767 * np.sin(2 * np.pi * 440.0 * t)).astype("<i2")
    x = np.concatenate([sine, np.zeros(rate, dtype="<i2")])
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.repeat(x[:, None], 2, axis=1).ravel().tobytes())
    frames = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not audio"))],
        "doc_id bigint, payload binary",
    )
    rows = sorted(
        multimodal.sample_chunks_wav(
            frames, chunk_frames=1000, stride_frames=2000
        ).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # non-WAV payload emits nothing (skip, don't crash the worker)
    assert {r["doc_id"] for r in rows} == {1}
    # 16000 frames / stride 2000 → 8 chunks, frame-aligned starts
    assert [r["start_frame"] for r in rows] == list(range(0, 16000, 2000))
    assert all(r["n_frames"] == 1000 for r in rows)
    first_half = [r for r in rows if r["start_frame"] < 8000]
    second_half = [r for r in rows if r["start_frame"] >= 8000]
    for r in first_half:  # sine chunks: RMS A/√2, peak A
        assert abs(r["chunk_rms"] - 0.5 / np.sqrt(2)) < 0.01, r
        assert abs(r["chunk_peak"] - 0.5) < 0.01, r
    for r in second_half:  # silence: exactly zero
        assert r["chunk_rms"] == 0.0 and r["chunk_peak"] == 0.0, r
