"""Generate tests/golden/media_vectors.json: input-bytes -> expected-feature
golden vectors for DecodeBackend implementations.

The payloads are REAL media files written with pure Python (a lossless
8-bit RGB PNG, a 16-bit PCM WAV, a YUV4MPEG2 clip with U=V=128 so every
YCbCr matrix agrees on RGB=Y), and the expectations are computed from the
known source arrays through the SAME pure feature functions the Spark UDFs
use (multimodal.image_features / audio_features / frame luminance). A
production backend (PIL / wave / ffmpeg-with-grayscale-passthrough) must
reproduce them bit-for-bit — see tests/test_media_golden.py.

Run: python tools/make_media_golden.py  (rewrites the golden file)
"""

from __future__ import annotations

import base64
import json
import os
import struct
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.operators.multimodal import (  # noqa: E402
    DecodeBackend,
    audio_features,
    image_features,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def make_image() -> tuple[bytes, np.ndarray]:
    """12x10 RGB PNG, filter 0 rows, deterministic pixel pattern."""
    h, w = 12, 10
    i, j = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [(i * 23 + j * 7) % 256, (i * 5 + j * 31) % 256, (i * j * 3 + 17) % 256],
        axis=2,
    ).astype(np.uint8)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    return png, arr


def make_audio() -> tuple[bytes, np.ndarray, int]:
    """16-bit PCM mono WAV, 16 kHz, deterministic int16 pattern."""
    import io
    import wave

    rate = 16_000
    n = 2400
    ints = (((np.arange(n) * 37) % 20011) - 10005).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(ints.tobytes())
    samples = ints.astype(np.float32) / 32768.0
    return buf.getvalue(), samples, rate


def make_video() -> tuple[bytes, list[int], int, int]:
    """y4m, 16x12, C420jpeg, 5 frames of constant luma with U=V=128 —
    grayscale content, so RGB=Y under any YCbCr matrix."""
    w, h = 16, 12
    lumas = [24, 80, 128, 190, 240]
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
    body = b""
    for y in lumas:
        body += b"FRAME\n"
        body += bytes([y]) * (w * h)  # Y plane
        body += bytes([128]) * (w * h // 4) * 2  # U, V planes
    return header + body, lumas, w, h


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman assignment (ITU-T T.81 Annex C): value ->
    (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first entropy-coded segment writer with FF00 byte stuffing and
    1-fill final-byte padding, per T.81 B.1.1.5 / F.1.2.3."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def done(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)
        return bytes(self.buf)


# minimal-but-standard Huffman tables: DC categories 0..11 as 4-bit codes
# 0000..1011; AC carries ONLY the EOB symbol (run=0,size=0) as the 1-bit
# code '0'. Canonical per Annex C, no all-ones code, decodable by any
# conforming decoder.
JPEG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
JPEG_DC_VALS = list(range(12))
JPEG_AC_BITS = [1] + [0] * 15
JPEG_AC_VALS = [0x00]


def make_jpeg() -> tuple[bytes, np.ndarray]:
    """32x24 grayscale BASELINE JFIF in which every 8x8 block is a constant
    value, entropy-coded DC-only against a flat quant table of 1s.

    Why this shape: the IDCT of a DC-only block is exactly flat, and with
    q=1 and DC = 8*(v-128) the reconstruction is exact INTEGER math —
    libjpeg's islow shortcut computes (8k+4)>>3 = k with zero fixed-point
    error, so every conforming decoder (libjpeg, libjpeg-turbo, PIL on
    either) reproduces the committed pixel array bit-for-bit. That removes
    the usual reason JPEG can't be a golden vector (decoder-dependent IDCT
    rounding on AC coefficients)."""
    vals = [
        [16, 240, 64, 200],
        [128, 32, 224, 96],
        [160, 8, 248, 112],
    ]
    bh, bw = len(vals), len(vals[0])
    h, w = bh * 8, bw * 8
    gray = np.zeros((h, w), dtype=np.uint8)
    for bi in range(bh):
        for bj in range(bw):
            gray[bi * 8 : (bi + 1) * 8, bj * 8 : (bj + 1) * 8] = vals[bi][bj]
    arr = np.repeat(gray[:, :, None], 3, axis=2)  # PIL L->RGB replication

    dc_codes = _huff_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    ac_codes = _huff_codes(JPEG_AC_BITS, JPEG_AC_VALS)
    bw_ = _BitWriter()
    prev = 0
    for bi in range(bh):
        for bj in range(bw):
            dc = 8 * (int(vals[bi][bj]) - 128)
            diff, prev = dc - prev, dc
            mag = diff if diff >= 0 else -diff
            s = mag.bit_length()
            bw_.put(*dc_codes[s])
            if s:
                bw_.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            bw_.put(*ac_codes[0x00])  # EOB
    scan = bw_.done()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    jpg = (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
        + seg(0xFFDB, b"\x00" + bytes([1] * 64))  # DQT: table 0, all 1s
        + seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))  # SOF0
        + seg(0xFFC4, b"\x00" + bytes(JPEG_DC_BITS) + bytes(JPEG_DC_VALS))
        + seg(0xFFC4, b"\x10" + bytes(JPEG_AC_BITS) + bytes(JPEG_AC_VALS))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
        + scan
        + b"\xff\xd9"  # EOI
    )
    return jpg, arr


class _ArrayBackend(DecodeBackend):
    """Backend returning the KNOWN source arrays — computes expectations
    through the same pure feature functions without any codec."""

    def __init__(self, img=None, audio=None, rate=None):
        self._img, self._audio, self._rate = img, audio, rate

    def decode_image(self, payload):
        return self._img

    def decode_audio(self, payload):
        return self._audio, self._rate


def main() -> None:
    png, img_arr = make_image()
    wav, samples, rate = make_audio()
    y4m, lumas, vw, vh = make_video()

    jpg, jpg_arr = make_jpeg()

    img_exp = image_features("golden.png", png, 8, _ArrayBackend(img=img_arr))
    jpg_exp = image_features("golden.jpg", jpg, 8, _ArrayBackend(img=jpg_arr))
    aud_exp = audio_features("golden.wav", wav, _ArrayBackend(audio=samples, rate=rate))

    vectors = {
        "comment": "DecodeBackend golden vectors — see tools/make_media_golden.py",
        "image": {
            "format": "png-rgb8",
            "payload_b64": base64.b64encode(png).decode(),
            "pixels_crc32": zlib.crc32(img_arr.tobytes()) & 0xFFFFFFFF,
            "thumb": 8,
            "expected": img_exp,
        },
        "image_jpeg": {
            "format": "jfif-baseline-gray-dconly",
            "contract": "DC-only constant blocks, q=1: exact in every conforming decoder",
            "payload_b64": base64.b64encode(jpg).decode(),
            "pixels_crc32": zlib.crc32(jpg_arr.tobytes()) & 0xFFFFFFFF,
            "thumb": 8,
            "expected": jpg_exp,
        },
        "audio": {
            "format": "wav-pcm16-mono",
            "contract": "float32 samples = int16/32768",
            "payload_b64": base64.b64encode(wav).decode(),
            "expected": aud_exp,
        },
        "video": {
            "format": "y4m-420jpeg",
            "contract": "grayscale passthrough: RGB=Y (clips carry U=V=128)",
            "payload_b64": base64.b64encode(y4m).decode(),
            "every_n": 2,
            "expected_frames": {
                "width": vw,
                "height": vh,
                "n_frames_all": len(lumas),
                "sampled_frame_idx": list(range(0, len(lumas), 2)),
                "sampled_mean_lum": [float(lumas[i]) for i in range(0, len(lumas), 2)],
            },
        },
    }
    out = os.path.join(GOLDEN, "media_vectors.json")
    with open(out, "w") as f:
        json.dump(vectors, f, indent=1, sort_keys=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
