"""DecodeBackend golden vectors: real media bytes -> pinned expected
features, so a production codec backend can be validated drop-in.

Three layers, by what each environment can decode:
- WAV (stdlib wave) and y4m (pure parser) validate EVERYWHERE, including
  this sandbox — CodecDecodeBackend genuinely decodes them;
- PNG structure + pixel bytes validate everywhere via a pure-Python
  zlib/unfilter pass (proving the committed file is a correct PNG);
- the PIL image path runs wherever PIL exists (skipped here).
"""

import base64
import json
import os
import struct
import zlib

import numpy as np
import pytest

from crawler_spark.operators.multimodal import (
    CodecDecodeBackend,
    audio_features,
    image_features,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "media_vectors.json")


@pytest.fixture(scope="module")
def vectors():
    with open(GOLDEN) as f:
        return json.load(f)


def _payload(v, key):
    return base64.b64decode(v[key]["payload_b64"])


def test_wav_golden_vector(vectors):
    """Real 16-bit PCM WAV decode (stdlib) reproduces the pinned audio
    features exactly."""
    got = audio_features("golden.wav", _payload(vectors, "audio"), CodecDecodeBackend())
    assert got == vectors["audio"]["expected"]


def test_y4m_golden_vector(vectors):
    """Real y4m decode (pure parser, grayscale-passthrough contract)
    reproduces the pinned frame count / dims / sampled luminances."""
    exp = vectors["video"]["expected_frames"]
    be = CodecDecodeBackend()
    every_n = vectors["video"]["every_n"]
    all_frames = be.decode_video_frames(_payload(vectors, "video"), 1)
    assert all_frames.shape == (exp["n_frames_all"], exp["height"], exp["width"], 3)
    sampled = be.decode_video_frames(_payload(vectors, "video"), every_n)
    assert [float(fr.mean()) for fr in sampled] == exp["sampled_mean_lum"]
    assert len(sampled) == len(exp["sampled_frame_idx"])


def test_y4m_unsupported_and_malformed_inputs_raise(vectors):
    """Per the DecodeBackend contract, formats outside the supported
    chroma set raise NotImplementedError (never silently mis-size the
    frame planes), and corrupt payloads raise ValueError."""
    import pytest

    be = CodecDecodeBackend()

    def y4m(chroma: bytes, w=4, h=4, frames=1, trunc=0):
        y_len = w * h
        c_len = {b"mono": 0, b"420jpeg": y_len // 4, b"422": y_len // 2, b"444": y_len}.get(
            chroma, y_len // 4
        )
        frame = b"FRAME\n" + bytes(range(256))[: y_len + 2 * c_len]
        body = (frame * frames)[: len(frame) * frames - trunc]
        return b"YUV4MPEG2 W%d H%d C%s\n" % (w, h, chroma) + body

    for bad in (b"422jpeg", b"444alpha", b"411", b"nonsense"):
        with pytest.raises(NotImplementedError):
            be.decode_video_frames(y4m(bad), 1)
    with pytest.raises(NotImplementedError):  # odd dims under 420 subsampling
        be.decode_video_frames(b"YUV4MPEG2 W3 H3 C420jpeg\nFRAME\n" + bytes(12), 1)
    # supported formats parse with correct plane math
    for ok, c_mult in ((b"mono", 0), (b"420jpeg", 2), (b"422", 4), (b"444", 8)):
        out = be.decode_video_frames(y4m(ok, frames=3), 2)
        assert out.shape == (2, 4, 4, 3), (ok, c_mult)
    # zero frames -> empty stack, not np.stack([]) ValueError
    assert be.decode_video_frames(b"YUV4MPEG2 W4 H4 C444\n", 1).shape == (0, 4, 4, 3)
    with pytest.raises(ValueError):  # truncated final frame
        be.decode_video_frames(y4m(b"444", frames=2, trunc=3), 1)
    with pytest.raises(ValueError):  # garbage where FRAME marker expected
        be.decode_video_frames(b"YUV4MPEG2 W4 H4 C444\nNOTAFRAME\n" + bytes(48), 1)


def test_png_bytes_are_a_correct_png(vectors):
    """The committed PNG decodes (pure zlib + unfilter) to pixels whose
    crc32 matches the pinned value — any standards-conforming codec will
    therefore see the same array the expectations were computed from."""
    png = _payload(vectors, "image")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", None
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", png[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
            assert (depth, ctype) == (8, 2)  # 8-bit RGB
        elif tag == b"IDAT":
            idat += data
        pos += 12 + length
    raw = zlib.decompress(idat)
    rows = []
    stride = 1 + 3 * w
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == 0  # filter type 0 rows only
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 3))
    arr = np.stack(rows)
    assert (zlib.crc32(arr.tobytes()) & 0xFFFFFFFF) == vectors["image"]["pixels_crc32"]

    # expectations really are image_features over exactly these pixels
    class _B(CodecDecodeBackend):
        def decode_image(self, payload):
            return arr

    got = image_features("golden.png", png, vectors["image"]["thumb"], _B())
    assert got == vectors["image"]["expected"]


def test_pil_backend_matches_golden(vectors):
    """Production-image path: a real PIL decode of the committed PNG must
    reproduce the pinned features bit-for-bit. Skipped where PIL is
    absent (this sandbox)."""
    pytest.importorskip("PIL")
    got = image_features(
        "golden.png", _payload(vectors, "image"), vectors["image"]["thumb"],
        CodecDecodeBackend(),
    )
    assert got == vectors["image"]["expected"]


def test_codec_backend_rejects_unknown_formats():
    be = CodecDecodeBackend()
    with pytest.raises(NotImplementedError):
        be.decode_video_frames(b"not-a-y4m", 1)
    with pytest.raises(Exception):  # wave raises on garbage
        be.decode_audio(b"not-a-wav")
