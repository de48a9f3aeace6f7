"""Multimodal media columns: opaque binary payloads + typed metadata.

The crawl's media spans (kind='media', media_ref=URL — FIXTURES.md §6)
reference binary objects. This module is the Spark-side plumbing for a
media table keyed by those refs: schema, partitioning, and the
decode / feature-extract / resize / frame-sample stages as Arrow-batched
pandas UDFs over ``mapInPandas``.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
container, so the decode core is STUBBED behind ``DecodeBackend``:
- ``FakeDecodeBackend`` — deterministic pure-numpy synthesis from the
  payload bytes (same bytes => same pixels/samples everywhere), so every
  downstream stage (resize, frame sample, feature extraction) runs real
  vectorized numpy over real Spark plumbing and is fully testable;
- a production backend implements the same 3 methods with PIL/ffmpeg and
  nothing else changes.

Scale shape: media blobs are stored in their own table partitioned by
``pmod(xxhash64(media_ref), P)`` — NEVER carried through the crawl
shuffles (spans carry only the ref); stages here are narrow (no shuffle)
and Arrow-batched with a bounded ``maxRecordsPerBatch`` so a batch of
blobs fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "DecodeBackend",
    "FakeDecodeBackend",
    "CodecDecodeBackend",
    "media_from_spans",
    "decode_metadata",
    "image_features",
    "image_resize_features",
    "video_frame_sample",
    "audio_window_energies",
    "audio_window_sigs",
]

# media table: (media_ref, kind, payload, meta) — kind in image|audio|video,
# meta is typed per-kind metadata filled by decode_metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


class DecodeBackend:
    """Codec interface. Production: PIL / ffmpeg / librosa. This container
    has none of them, so the default backend synthesizes deterministic
    content; the Spark plumbing around it is identical either way."""

    def decode_image(self, payload: bytes) -> np.ndarray:  # (H, W, C) uint8
        raise NotImplementedError("no image codec in this environment")

    def decode_audio(self, payload: bytes) -> tuple[np.ndarray, int]:  # (samples,), rate
        raise NotImplementedError("no audio codec in this environment")

    def decode_video_frames(self, payload: bytes, every_n: int) -> np.ndarray:  # (F, H, W, C)
        raise NotImplementedError("no video codec in this environment")


class CodecDecodeBackend(DecodeBackend):
    """Real-codec backend, validated against the committed golden vectors
    in tests/golden/media_vectors.json (tools/make_media_golden.py):

    - images: PIL (``decode_image`` raises NotImplementedError when PIL is
      absent — this sandbox — and the golden test skips; a production
      environment runs it for real);
    - audio: 16-bit PCM WAV via the stdlib ``wave`` module (no external
      codec needed — validates everywhere). Contract: float32 samples in
      [-1, 1) as int16/32768, channels mean-downmixed;
    - video: YUV4MPEG2 (y4m) via a pure parser. Contract: grayscale
      passthrough — frames are emitted as RGB with R=G=B=Y (the golden
      clips carry U=V=128, where every YCbCr matrix agrees); a production
      ffmpeg backend must use the same convention to match the vectors.

    Each method covers its own format subset; anything else raises
    NotImplementedError so environments validate exactly the subset they
    can decode.
    """

    def decode_image(self, payload: bytes) -> np.ndarray:
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - sandbox has no PIL
            raise NotImplementedError("PIL not available") from e
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)

    def decode_audio(self, payload: bytes) -> tuple[np.ndarray, int]:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
            width, ch = w.getsampwidth(), w.getnchannels()
        if width != 2:
            raise NotImplementedError("only 16-bit PCM WAV is supported")
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        if ch > 1:
            arr = arr.reshape(-1, ch).mean(axis=1).astype(np.float32)
        return arr, rate

    def decode_video_frames(self, payload: bytes, every_n: int) -> np.ndarray:
        if not payload.startswith(b"YUV4MPEG2"):
            raise NotImplementedError("only y4m video is supported")
        header, _, body = payload.partition(b"\n")
        params = dict(
            (p[:1], p[1:]) for p in header.split(b" ")[1:] if p
        )
        w, h = int(params[b"W"]), int(params[b"H"])
        chroma = params.get(b"C", b"420jpeg")
        y_len = w * h
        # Explicit per-format plane math; anything else (444alpha's 4
        # planes, 411, ...) raises per the class contract instead of
        # mis-sizing frame_len and silently emitting misaligned luma.
        if chroma == b"mono":
            c_len = 0
        elif chroma in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
            if w % 2 or h % 2:
                raise NotImplementedError(f"odd dims {w}x{h} for chroma {chroma!r}")
            c_len = y_len // 4
        elif chroma == b"422":
            if w % 2:
                raise NotImplementedError(f"odd width {w} for chroma 422")
            c_len = y_len // 2
        elif chroma == b"444":
            c_len = y_len
        else:
            raise NotImplementedError(f"unsupported y4m chroma {chroma!r}")
        frame_len = y_len + 2 * c_len
        frames = []
        pos = 0
        while pos < len(body):
            if not body.startswith(b"FRAME", pos):
                raise ValueError("malformed y4m: expected FRAME marker")
            nl = body.index(b"\n", pos)  # FRAME marker line
            data = body[nl + 1 : nl + 1 + frame_len]
            if len(data) != frame_len:
                raise ValueError("truncated y4m frame")
            y = np.frombuffer(data[:y_len], dtype=np.uint8).reshape(h, w)
            frames.append(np.repeat(y[:, :, None], 3, axis=2))
            pos = nl + 1 + frame_len
        if not frames:
            return np.zeros((0, h, w, 3), dtype=np.uint8)
        return np.stack(frames)[::every_n]


class FakeDecodeBackend(DecodeBackend):
    """Deterministic synthesis: content is a pure function of the payload
    bytes (seeded from a rolling checksum), so tests and both sides of any
    comparison agree byte-for-byte."""

    def _seed(self, payload: bytes) -> int:
        import zlib

        return zlib.crc32(payload) & 0x7FFFFFFF

    def decode_image(self, payload: bytes) -> np.ndarray:
        rng = np.random.default_rng(self._seed(payload))
        h = 32 + self._seed(payload) % 97
        w = 32 + (self._seed(payload) // 7) % 131
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def decode_audio(self, payload: bytes) -> tuple[np.ndarray, int]:
        rng = np.random.default_rng(self._seed(payload))
        n = 1000 + self._seed(payload) % 8000
        return rng.standard_normal(n).astype(np.float32), 16_000

    def decode_video_frames(self, payload: bytes, every_n: int) -> np.ndarray:
        rng = np.random.default_rng(self._seed(payload))
        n_frames = 8 + self._seed(payload) % 25
        frames = rng.integers(0, 256, size=(n_frames, 16, 16, 3), dtype=np.uint8)
        return frames[::every_n]


def media_from_spans(docs: DataFrame) -> DataFrame:
    """Harvest the distinct media refs out of the interleaved-span docs
    table and synthesize their media rows (payload = deterministic bytes
    from the ref; kind from the extension). In production the payload
    column is filled by the fetch tier instead."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    kind = (
        F.when(F.lower("media_ref").rlike(r"\.(png|jpe?g|gif|svg|bmp|webp|ico)$"), "image")
        .when(F.lower("media_ref").rlike(r"\.(mp3|wav|flac|ogg)$"), "audio")
        .when(F.lower("media_ref").rlike(r"\.(mp4|webm|avi|mov)$"), "video")
        .otherwise("image")
    )
    return refs.select(
        "media_ref",
        kind.alias("kind"),
        F.encode(F.md5("media_ref"), "utf-8").cast("binary").alias("payload"),
        F.lit(None).cast(MEDIA_SCHEMA["meta"].dataType).alias("meta"),
    )


def _meta_dict(kind: str, backend: DecodeBackend, payload: bytes) -> dict:
    none = {k: None for k in ("width", "height", "channels", "duration_ms", "sample_rate", "n_frames")}
    if payload is None:
        return none
    if kind == "image":
        arr = backend.decode_image(payload)
        return {**none, "width": arr.shape[1], "height": arr.shape[0], "channels": arr.shape[2]}
    if kind == "audio":
        samples, rate = backend.decode_audio(payload)
        return {**none, "sample_rate": rate, "duration_ms": int(1000 * len(samples) / rate)}
    frames = backend.decode_video_frames(payload, 1)
    return {
        **none,
        "n_frames": frames.shape[0],
        "width": frames.shape[2],
        "height": frames.shape[1],
        "channels": frames.shape[3],
    }


def decode_metadata(media: DataFrame, backend: DecodeBackend | None = None) -> DataFrame:
    """Fill the typed ``meta`` struct by decoding each payload (Arrow
    batches; narrow — no shuffle)."""
    backend = backend or FakeDecodeBackend()
    out_schema = MEDIA_SCHEMA

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["meta"] = [
                _meta_dict(k, backend, p) for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pdf

    return media.mapInPandas(_decode, out_schema)


IMAGE_FEATURES_SCHEMA = (
    "media_ref string, width int, height int, thumb_w int, thumb_h int, "
    "mean_r double, mean_g double, mean_b double, phash long"
)


def image_features(ref: str, payload: bytes | None, thumb: int, backend: DecodeBackend) -> dict | None:
    """Per-image feature core (pure function — shared by the Spark UDF
    and the pure-Python oracle generator in queries.py): decode -> resize
    to a thumb x thumb grid (mean-pool) -> channel means + a 64-bit
    average-hash (phash-style) for image near-dup detection."""
    if payload is None:
        return None
    arr = backend.decode_image(payload)
    h, w, _ = arr.shape
    ys = (np.arange(thumb + 1) * h) // thumb
    xs = (np.arange(thumb + 1) * w) // thumb
    small = np.empty((thumb, thumb), dtype=np.float64)
    for i in range(thumb):
        for j in range(thumb):
            small[i, j] = arr[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (small > small.mean()).flatten()
    phash = 0
    for b in bits:
        phash = (phash << 1) | int(b)
    return {
        "media_ref": ref,
        "width": w,
        "height": h,
        "thumb_w": thumb,
        "thumb_h": thumb,
        "mean_r": float(arr[:, :, 0].mean()),
        "mean_g": float(arr[:, :, 1].mean()),
        "mean_b": float(arr[:, :, 2].mean()),
        "phash": phash - (1 << 63),  # to signed long
    }


def image_resize_features(media: DataFrame, thumb: int = 8, backend: DecodeBackend | None = None) -> DataFrame:
    """Arrow-batched image_features over the media table's image rows."""
    backend = backend or FakeDecodeBackend()

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_ref", "width", "height", "thumb_w", "thumb_h",
                "mean_r", "mean_g", "mean_b", "phash")
        for pdf in it:
            feats = [
                f
                for f in (
                    image_features(ref, payload, thumb, backend)
                    for ref, payload in zip(pdf["media_ref"], pdf["payload"])
                )
                if f is not None
            ]
            yield pd.DataFrame({c: [f[c] for f in feats] for c in cols})

    return media.filter(F.col("kind") == "image").mapInPandas(_feat, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, mean_lum double"


def video_frame_sample(media: DataFrame, every_n: int = 4, backend: DecodeBackend | None = None) -> DataFrame:
    """Decode -> sample every Nth frame -> one row per sampled frame with
    its mean luminance (UDTF-shaped: 1 video row -> F frame rows)."""
    backend = backend or FakeDecodeBackend()

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_ref": [], "frame_idx": [], "mean_lum": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if payload is None:
                    continue
                frames = backend.decode_video_frames(payload, every_n)
                for i, fr in enumerate(frames):
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(i * every_n)
                    rows["mean_lum"].append(float(fr.mean()))
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(_frames, FRAME_SAMPLE_SCHEMA)


AUDIO_WINDOW_SCHEMA = "media_ref string, win_idx int, energy_micro long"


def audio_window_energies(payload: bytes, win_samples: int, backend: DecodeBackend) -> list[int]:
    """Per-window energy fingerprint core (pure function — shared by the
    Spark UDTF and the oracle literal generator): decode -> fixed
    win_samples windows (trailing partial window dropped) -> floor-micro
    mean absolute amplitude per window (micro precision: the fake
    backend's window means cluster near E|N(0,1)| ~ 0.798 with a
    ~0.02 spread, so milli precision would alias unrelated windows)."""
    samples, _rate = backend.decode_audio(payload)
    s = np.abs(samples.astype(np.float64))
    n = len(s) // win_samples
    return [
        int(np.floor(s[i * win_samples : (i + 1) * win_samples].mean() * 1_000_000))
        for i in range(n)
    ]


def audio_window_sigs(
    media: DataFrame, win_samples: int = 1000, backend: DecodeBackend | None = None
) -> DataFrame:
    """Decode -> fixed-length sample windows -> one row per window with
    its integer energy fingerprint (UDTF-shaped: 1 clip row -> W window
    rows — the audio sibling of video_frame_sample, and the signature
    stream audio fingerprinting pipelines bucket on)."""
    backend = backend or FakeDecodeBackend()

    def _wins(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_ref": [], "win_idx": [], "energy_micro": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if payload is None:
                    continue
                for i, e in enumerate(audio_window_energies(payload, win_samples, backend)):
                    rows["media_ref"].append(ref)
                    rows["win_idx"].append(i)
                    rows["energy_micro"].append(e)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").mapInPandas(_wins, AUDIO_WINDOW_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_ref string, sample_rate int, n_samples int, duration_ms int, "
    "mean_abs_milli long, zero_crossings int"
)


def audio_features(ref: str, payload: bytes | None, backend: DecodeBackend) -> dict | None:
    """Per-clip audio feature core (pure function — shared by the Spark
    UDF and the oracle literal generator): decode -> duration + mean
    absolute amplitude (fixed-point milli) + zero-crossing count."""
    if payload is None:
        return None
    samples, rate = backend.decode_audio(payload)
    s = samples.astype(np.float64)
    mean_abs = float(np.abs(s).mean()) if len(s) else 0.0
    zc = int(np.sum(np.signbit(s[1:]) != np.signbit(s[:-1]))) if len(s) > 1 else 0
    return {
        "media_ref": ref,
        "sample_rate": int(rate),
        "n_samples": int(len(s)),
        "duration_ms": int(1000 * len(s) / rate),
        "mean_abs_milli": int(np.floor(mean_abs * 1000)),
        "zero_crossings": zc,
    }


def audio_feature_stats(media: DataFrame, backend: DecodeBackend | None = None) -> DataFrame:
    """Arrow-batched audio_features over the media table's audio rows
    (narrow — no shuffle, like the image/video stages)."""
    backend = backend or FakeDecodeBackend()

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_ref", "sample_rate", "n_samples", "duration_ms",
                "mean_abs_milli", "zero_crossings")
        for pdf in it:
            feats = [
                f
                for f in (
                    audio_features(ref, payload, backend)
                    for ref, payload in zip(pdf["media_ref"], pdf["payload"])
                )
                if f is not None
            ]
            yield pd.DataFrame({c: [f[c] for f in feats] for c in cols})

    return media.filter(F.col("kind") == "audio").mapInPandas(_feat, AUDIO_FEATURES_SCHEMA)
