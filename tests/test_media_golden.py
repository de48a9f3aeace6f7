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


def _decode_baseline_jpeg(jpg: bytes) -> np.ndarray:
    """Minimal spec-driven baseline JPEG decoder for the golden vector's
    subset (single grayscale component, no subsampling, DC-only blocks):
    parses DQT/SOF0/DHT/SOS per T.81, canonically rebuilds the Huffman
    tables from BITS/HUFFVAL, entropy-decodes every block generically
    (DC category + AC symbols until EOB), and reconstructs pixels with
    the exact flat-IDCT identity pixel = dequant_dc/8 + 128. Independent
    of the encoder in tools/make_media_golden.py — it trusts only the
    committed bytes."""
    assert jpg[:2] == b"\xff\xd8"
    pos, qt, huff, sof = 2, {}, {}, None
    while True:
        assert jpg[pos] == 0xFF
        marker = jpg[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", jpg[pos + 2 : pos + 4])
        body = jpg[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            assert body[0] & 0xF0 == 0  # 8-bit table
            qt[body[0] & 0x0F] = list(body[1:65])
        elif marker == 0xC0:
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            assert (prec, nf) == (8, 1)
            cid, hv, tq = body[6], body[7], body[8]
            assert hv == 0x11
            sof = (h, w, cid, tq)
        elif marker == 0xC4:
            while body:
                tc_th, bits = body[0], list(body[1:17])
                nvals = sum(bits)
                vals = list(body[17 : 17 + nvals])
                code, k, table = 0, 0, {}
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code, k = code + 1, k + 1
                    code <<= 1
                huff[(tc_th >> 4, tc_th & 0x0F)] = table
                body = body[17 + nvals :]
        elif marker == 0xDA:
            ns = body[0]
            assert ns == 1
            td_ta = body[2]
            dc_t, ac_t = huff[(0, td_ta >> 4)], huff[(1, td_ta & 0x0F)]
            scan = jpg[pos:-2].replace(b"\xff\x00", b"\xff")
            h, w, _, tq = sof
            q = qt[tq]
            bh, bw = (h + 7) // 8, (w + 7) // 8
            bitpos, prev = 0, 0
            out = np.zeros((h, w), dtype=np.uint8)

            def bit(i):
                return (scan[i >> 3] >> (7 - (i & 7))) & 1

            def read_sym(table):
                nonlocal bitpos
                code, length = 0, 0
                while True:
                    code = (code << 1) | bit(bitpos)
                    bitpos += 1
                    length += 1
                    if (length, code) in table:
                        return table[(length, code)]
                    assert length <= 16, "invalid Huffman stream"

            def read_val(s):
                nonlocal bitpos
                v = 0
                for _ in range(s):
                    v = (v << 1) | bit(bitpos)
                    bitpos += 1
                if s and v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                return v

            for b in range(bh * bw):
                s = read_sym(dc_t)
                prev += read_val(s)
                k = 1
                while k < 64:  # generic AC walk; golden blocks hit EOB at once
                    rs = read_sym(ac_t)
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += (rs >> 4) + 1
                    read_val(rs & 0x0F)
                # DC-only flat IDCT: pixel = dequant/8 + 128 (exact when
                # dequant is a multiple of 8, which the vector guarantees)
                dq = prev * q[0]
                assert dq % 8 == 0
                px = dq // 8 + 128
                bi, bj = divmod(b, bw)
                out[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = px
            return np.repeat(out[:, :, None], 3, axis=2)
    raise AssertionError("no SOS segment")


def test_jpeg_bytes_are_a_correct_jpeg(vectors):
    """The committed baseline JPEG decodes (independent pure-Python T.81
    parse) to pixels whose crc32 matches the pinned value — a
    standards-conforming codec sees the same array the expectations were
    computed from, and DC-only+flat-quant makes that decode EXACT (no
    IDCT rounding freedom)."""
    v = vectors["image_jpeg"]
    jpg = _payload(vectors, "image_jpeg")
    arr = _decode_baseline_jpeg(jpg)
    assert (zlib.crc32(arr.tobytes()) & 0xFFFFFFFF) == v["pixels_crc32"]

    class _B(CodecDecodeBackend):
        def decode_image(self, payload):
            return arr

    got = image_features("golden.jpg", jpg, v["thumb"], _B())
    assert got == v["expected"]


def test_pil_backend_matches_jpeg_golden(vectors):
    """Production-image path for the LOSSY codec: a real PIL/libjpeg decode
    of the committed DC-only JPEG must reproduce the pinned features
    bit-for-bit (libjpeg's islow shortcut computes (8k+4)>>3 = k exactly).
    Skipped where PIL is absent (this sandbox)."""
    pytest.importorskip("PIL")
    v = vectors["image_jpeg"]
    got = image_features(
        "golden.jpg", _payload(vectors, "image_jpeg"), v["thumb"], CodecDecodeBackend()
    )
    assert got == v["expected"]
