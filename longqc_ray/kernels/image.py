"""Pure-numpy image codecs and feature kernels.

No image codec library ships in this container, but two common
formats are plain byte layouts decodable with numpy alone:

- **PPM (P6)** — ASCII header ``P6\\n<w> <h>\\n255\\n`` + packed RGB.
- **BMP (24-bit uncompressed BI_RGB)** — 14-byte file header +
  40-byte BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes.

These make the image-featurizer path REAL for payloads in either
format; compressed formats (JPEG/PNG) remain behind the declared
stub (pipelines/multimodal.py) because their codecs are not in the
container. Encoders exist so fixtures can synthesize test corpora
deterministically; decode(encode(x)) == x is pinned in tests.
"""

from __future__ import annotations

import re

import numpy as np

_PPM_HEADER_RE = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray | None:
    m = _PPM_HEADER_RE.match(payload)
    if not m:
        return None
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    body = payload[m.end():]
    if len(body) < w * h * 3:
        return None
    return np.frombuffer(body[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (BI_RGB,
    bottom-up BGR rows padded to 4-byte multiples)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    body_size = stride * h
    header = bytearray(54)
    header[0:2] = b"BM"
    header[2:6] = (54 + body_size).to_bytes(4, "little")
    header[10:14] = (54).to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = h.to_bytes(4, "little")
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (24).to_bytes(2, "little")
    # biCompression (0 = BI_RGB) and remaining fields stay zero
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = img[::-1, :, ::-1].reshape(h, row_bytes)  # bottom-up, BGR
    return bytes(header) + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray | None:
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    offset = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if hdr_size < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < offset + stride * h:
        return None
    rows = np.frombuffer(payload[offset : offset + stride * h], dtype=np.uint8)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = rows if top_down else rows[::-1]
    return img[:, :, ::-1].copy()  # BGR → RGB


def sniff_image(payload: bytes) -> str | None:
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def decode_image(payload: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB or None for unknown/undecodable payloads."""
    kind = sniff_image(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    return None


def image_feature_vec(img: np.ndarray) -> np.ndarray:
    """8-float feature vector: [w, h, mean_r, mean_g, mean_b,
    luma_std, edge_energy, 1.0] — matches ImageFeaturizer.N_FEATURES;
    the trailing 1.0 marks a real decode (fake features carry 0.0)."""
    h, w, _ = img.shape
    f = img.astype(np.float64)
    means = f.reshape(-1, 3).mean(axis=0)
    luma = f[:, :, 0] * 0.299 + f[:, :, 1] * 0.587 + f[:, :, 2] * 0.114
    edge = 0.0
    if w > 1:
        edge += float(np.abs(np.diff(luma, axis=1)).mean())
    if h > 1:
        edge += float(np.abs(np.diff(luma, axis=0)).mean())
    return np.array(
        [float(w), float(h), means[0], means[1], means[2], float(luma.std()), edge, 1.0]
    )
