"""Pure-numpy video container codec: YUV4MPEG2 (.y4m).

Y4M is a public uncompressed container (ffmpeg's raw-video
interchange format): one ASCII stream header
``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C444\\n`` followed by frames, each
``FRAME\\n`` + packed planar YUV. With C444 every plane is w*h bytes,
so frame k starts at ``header_len + k * (6 + 3*w*h)`` — frame seeking
is pure arithmetic, no codec needed. Compressed containers (MP4/AVI
with codec payloads) stay behind the declared stub in
pipelines/multimodal.py. Encoder exists for deterministic fixtures;
decode(encode(x)) == x is pinned in tests.
"""

from __future__ import annotations

import re

import numpy as np

_Y4M_HEADER_RE = re.compile(rb"^YUV4MPEG2 ([^\n]*)\n")
_FRAME_MAGIC = b"FRAME\n"


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 planar-encodable YUV (C444) → .y4m bytes.
    Channel axis holds (Y, U, V); stored planar per frame."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for k in range(n):
        # (h, w, 3) → planar (3, h, w)
        out.append(_FRAME_MAGIC + frames[k].transpose(2, 0, 1).tobytes())
    return b"".join(out)


def probe_y4m(payload: bytes) -> tuple[int, int, int, int] | None:
    """(width, height, n_frames, header_len) or None if not C444 y4m."""
    m = _Y4M_HEADER_RE.match(payload)
    if not m:
        return None
    w = h = None
    c_tag = "C420"  # y4m default colourspace when the C param is absent
    for tok in m.group(1).split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            c_tag = tok.decode("ascii", "replace")
    if w is None or h is None or w <= 0 or h <= 0 or c_tag != "C444":
        return None
    hdr = m.end()
    frame_bytes = len(_FRAME_MAGIC) + 3 * w * h
    n = (len(payload) - hdr) // frame_bytes
    if n <= 0:
        return None
    return w, h, n, hdr


def decode_y4m_frame(payload: bytes, k: int) -> np.ndarray | None:
    """Frame ``k`` as (h, w, 3) uint8 YUV — pure arithmetic seek."""
    p = probe_y4m(payload)
    if p is None:
        return None
    w, h, n, hdr = p
    if not 0 <= k < n:
        return None
    start = hdr + k * (len(_FRAME_MAGIC) + 3 * w * h)
    if payload[start : start + len(_FRAME_MAGIC)] != _FRAME_MAGIC:
        return None
    body = payload[start + len(_FRAME_MAGIC) : start + len(_FRAME_MAGIC) + 3 * w * h]
    return (
        np.frombuffer(body, dtype=np.uint8).reshape(3, h, w).transpose(1, 2, 0).copy()
    )


def frame_luma_stats(frame: np.ndarray) -> tuple[float, float]:
    """(mean, std) of the Y plane of a (h, w, 3) YUV frame."""
    y = frame[:, :, 0].astype(np.float64)
    return float(y.mean()), float(y.std())
