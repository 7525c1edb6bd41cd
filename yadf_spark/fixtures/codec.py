"""Deterministic stand-in image codec.

The container has no Pillow/libjpeg, so the fixture tables use a tiny
self-describing codec that preserves the *semantics* the pipeline needs:

* ``png``  — lossless: zlib over raw RGB; decode == original pixels.
* ``jpeg`` — lossy: uniform quantization (step q) then zlib; decode is
  close-but-not-equal, with PSNR ~= 10*log10(255^2 * 12 / q^2) — step 2
  gives ~53 dB, comfortably above the 40 dB verification bar.

``decode_image`` tries Pillow first (real deployments decode real
formats); the fake codec is the documented fallback, keyed by magic
bytes so real and fake payloads can coexist in one table. This mirrors
how the reference's corpus generator makes content a pure function of
(seed, content_key) (reference: scripts/gen-corpus.py:230-249).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_PNG = b"YDFP"  # fake-lossless
MAGIC_JPG = b"YDFJ"  # fake-lossy
_HEADER = struct.Struct("<4sHHB")  # magic, w, h, quant step


#: payloads are zero-padded to a multiple of this, so distinct contents
#: frequently share a byte length — deliberately stressing the ladder's
#: size stage the way real-world size collisions do
PAD_TO = 64


def _pad(b: bytes) -> bytes:
    rem = len(b) % PAD_TO
    return b if rem == 0 else b + b"\x00" * (PAD_TO - rem)


def encode_png(pixels: np.ndarray) -> bytes:
    """Lossless encode of an (h, w, 3) uint8 array."""
    h, w, _ = pixels.shape
    return _pad(_HEADER.pack(MAGIC_PNG, w, h, 0) + zlib.compress(pixels.tobytes(), 6))


def encode_jpeg(pixels: np.ndarray, step: int = 2) -> bytes:
    """Lossy encode: quantize channel values to multiples of ``step``."""
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int32) // step * step + step // 2).clip(0, 255).astype(np.uint8)
    return _pad(_HEADER.pack(MAGIC_JPG, w, h, step) + zlib.compress(q.tobytes(), 6))


def decode_fake(payload: bytes) -> np.ndarray:
    magic, w, h, _step = _HEADER.unpack_from(payload)
    if magic not in (MAGIC_PNG, MAGIC_JPG):
        raise ValueError("not a fake-codec payload")
    # decompressobj stops at end-of-stream, ignoring the size padding.
    raw = zlib.decompressobj().decompress(bytes(payload[_HEADER.size :]))
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 array. Pillow for real formats when
    available; the deterministic fake codec otherwise."""
    if payload[:4] in (MAGIC_PNG, MAGIC_JPG):
        return decode_fake(payload)
    try:  # pragma: no cover - Pillow absent in this container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "real image decoding requires Pillow; fixture payloads use the "
            "deterministic fake codec (yadf_spark.fixtures.codec)"
        ) from exc


def sniff_format(payload: bytes) -> str:
    """Container format from magic bytes (fake codec first, then the
    real-world signatures so mixed tables classify correctly)."""
    if payload[:4] == MAGIC_PNG:
        return "png"
    if payload[:4] == MAGIC_JPG:
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def perceptual_hash(pixels: np.ndarray) -> int:
    """64-bit block-mean perceptual hash: grayscale -> 8x8 mean pooling ->
    threshold at the median. Signed int64 (Spark LongType compatible)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # Crop to a multiple of 8 then mean-pool to 8x8.
    gh, gw = (h // 8) * 8, (w // 8) * 8
    g = gray[:gh, :gw].reshape(8, gh // 8, 8, gw // 8).mean(axis=(1, 3))
    bits = (g > np.median(g)).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val
