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

    img_exp = image_features("golden.png", png, 8, _ArrayBackend(img=img_arr))
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
