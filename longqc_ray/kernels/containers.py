"""Binary audio-container codecs: WAV/RIFF and Sun AU.

The reference streams records out of binary containers — BAM via
pysam (/root/reference/lq_utils.py:238-261) and fast5/HDF5 via h5py
(lq_utils.py:211-236) — sniffing the container first
(lq_utils.py:101-134 guess_format). The graft's payload is audio, so
the container analogue is RIFF/WAVE and Sun-AU framing around the
same raw codecs the engine already decodes (pcm_s16le / mulaw /
float32 PCM). Everything here is header parsing + numpy views — no
external audio library, no Python per-sample work.

Semantics shared by the engine (stages/features.py) and the oracle
twin (oracle.py):

- codec "wav"/"au" with an unparseable or unsupported header
  → ``codec_ok`` False (drop reason ``bad_codec``), the container
  twin of the reference's guess_format -1 "unknown" path.
- a parseable header whose sample rate differs from the table's
  ``sr_hz`` column → ``sr_ok`` False (drop reason ``bad_sr``) — the
  header-vs-metadata cross-check analogue of the reference's
  readtype/header sanity checks (lq_utils.py:299-360).
- frame counts come from the data chunk, so a truncated container
  fails the duration-consistency rule exactly like a truncated raw
  payload.
- multi-channel payloads decode to mono by a float32 channel mean
  (duplicated channels reproduce the mono signal bit-exactly).

Supported layouts (unsupported → None, never an exception):

- WAV: fmt 1 (PCM int16le), fmt 3 (IEEE float32le), fmt 7 (G.711
  mu-law); chunk walker skips unknown chunks (fact/LIST/cue).
- AU: encoding 1 (mu-law), encoding 3 (int16 big-endian).
- AIFF: IFF ``FORM``/``AIFF`` framing, COMM (channels / frame count /
  16-bit samples / 80-bit-extended sample rate) + SSND chunks, PCM
  int16 big-endian only. Compressed ``AIFC`` forms are unsupported
  (→ None / ``bad_codec``), the analogue of guess_format's unknown
  branch. The COMM frame count is authoritative: SSND bytes beyond it
  are trailer padding; fewer bytes than it declares is truncation and
  yields fewer frames.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .audio import mulaw_decode, mulaw_encode

__all__ = [
    "ContainerMeta",
    "parse_wav",
    "parse_au",
    "parse_aiff",
    "container_meta",
    "container_decode",
    "decode_meta",
    "header_sr",
    "wav_encode",
    "au_encode",
    "aiff_encode",
    "sniff_codec",
]

# (wav fmt code, bits) and (au encoding,) the engine can decode
_WAV_FMTS = {1: 16, 3: 32, 7: 8}  # fmt -> required bits_per_sample
_AU_ENCODINGS = {1: 8, 3: 16}  # encoding -> bits per sample


class ContainerMeta(NamedTuple):
    """Parsed container header, with ``data_len`` clamped to the bytes
    actually present (truncated files yield fewer frames, not errors)."""

    kind: str  # "wav" | "au"
    fmt: int  # wav fmt code, or au encoding code
    channels: int
    sr: int
    bits: int
    data_off: int
    data_len: int

    @property
    def bytes_per_frame(self) -> int:
        return (self.bits // 8) * self.channels

    @property
    def frames(self) -> int:
        """Whole mono frames in the (possibly truncated) data chunk."""
        return self.data_len // self.bytes_per_frame


def _as_u8(b: bytes | np.ndarray) -> np.ndarray:
    if isinstance(b, np.ndarray):
        return b
    return np.frombuffer(b, dtype=np.uint8)


def _u32le(a: np.ndarray, o: int) -> int:
    return int.from_bytes(a[o : o + 4].tobytes(), "little")


def _u16le(a: np.ndarray, o: int) -> int:
    return int.from_bytes(a[o : o + 2].tobytes(), "little")


def _u32be(a: np.ndarray, o: int) -> int:
    return int.from_bytes(a[o : o + 4].tobytes(), "big")


def parse_wav(b: bytes | np.ndarray) -> ContainerMeta | None:
    """Walk RIFF chunks for ``fmt `` + ``data``. None when the payload
    is not a decodable WAV (bad magic, missing chunks, unsupported fmt
    code / bit depth / channel count)."""
    a = _as_u8(b)
    n = a.size
    if n < 44 or a[:4].tobytes() != b"RIFF" or a[8:12].tobytes() != b"WAVE":
        return None
    fmt = channels = sr = bits = -1
    data_off = data_len = -1
    pos = 12
    while pos + 8 <= n:
        cid = a[pos : pos + 4].tobytes()
        size = _u32le(a, pos + 4)
        body = pos + 8
        if cid == b"fmt " and size >= 16 and body + 16 <= n:
            fmt = _u16le(a, body)
            channels = _u16le(a, body + 2)
            sr = _u32le(a, body + 4)
            bits = _u16le(a, body + 14)
        elif cid == b"data":
            data_off = body
            data_len = min(size, n - body)  # clamp: truncation is data loss, not an error
        # chunks are padded to even length
        pos = body + size + (size & 1)
    if fmt not in _WAV_FMTS or _WAV_FMTS[fmt] != bits:
        return None
    if channels < 1 or channels > 8 or sr <= 0 or data_off < 0 or data_len < 0:
        return None
    return ContainerMeta("wav", fmt, channels, sr, bits, data_off, data_len)


def parse_au(b: bytes | np.ndarray) -> ContainerMeta | None:
    """Sun AU header (big-endian): magic ``.snd``, data offset, data
    size (0xFFFFFFFF = unknown → rest of payload), encoding, sample
    rate, channels."""
    a = _as_u8(b)
    n = a.size
    if n < 24 or a[:4].tobytes() != b".snd":
        return None
    off = _u32be(a, 4)
    size = _u32be(a, 8)
    enc = _u32be(a, 12)
    sr = _u32be(a, 16)
    channels = _u32be(a, 20)
    if enc not in _AU_ENCODINGS or channels < 1 or channels > 8 or sr <= 0:
        return None
    if off < 24 or off > n:
        return None
    data_len = n - off if size == 0xFFFFFFFF else min(size, n - off)
    return ContainerMeta("au", enc, channels, sr, _AU_ENCODINGS[enc], off, data_len)


def _ext80_decode(a: np.ndarray, o: int) -> int:
    """80-bit IEEE-extended big-endian -> non-negative int sample rate
    (0 when negative / non-finite / zero — all invalid rates anyway).
    Layout: 1 sign bit, 15 exponent bits (bias 16383), 64 mantissa
    bits with the integer bit explicit."""
    se = int.from_bytes(a[o : o + 2].tobytes(), "big")
    mant = int.from_bytes(a[o + 2 : o + 10].tobytes(), "big")
    if se & 0x8000 or mant == 0:
        return 0
    exp = se & 0x7FFF
    if exp == 0x7FFF:  # inf / nan
        return 0
    shift = exp - 16383 - 63
    if shift >= 0:
        return mant << shift if shift < 64 else 0
    if shift < -64:
        return 0
    # round-to-nearest on the dropped fraction (integer rates encode
    # exactly, so this only matters for hand-crafted fractional rates)
    return (mant + (1 << (-shift - 1))) >> -shift


def _ext80_encode(sr: int) -> bytes:
    """Positive int sample rate -> 80-bit IEEE-extended big-endian.
    Values above 2^64 keep only the top 64 mantissa bits (the format's
    own precision limit)."""
    if sr <= 0:
        return bytes(10)
    msb = sr.bit_length() - 1
    exp = 16383 + msb
    mant = sr << (63 - msb) if msb <= 63 else sr >> (msb - 63)
    return exp.to_bytes(2, "big") + mant.to_bytes(8, "big")


def parse_aiff(b: bytes | np.ndarray) -> ContainerMeta | None:
    """IFF chunk walk for ``COMM`` + ``SSND``. None when not a
    decodable AIFF (bad magic, AIFC/compressed, missing chunks,
    non-16-bit samples, bad channel count / rate). ``data_len`` is
    min(declared frames, bytes actually present) — COMM is
    authoritative, truncation yields fewer frames."""
    a = _as_u8(b)
    n = a.size
    if n < 12 or a[:4].tobytes() != b"FORM" or a[8:12].tobytes() != b"AIFF":
        return None
    channels = sr = bits = -1
    nframes = -1
    data_off = avail = -1
    pos = 12
    while pos + 8 <= n:
        cid = a[pos : pos + 4].tobytes()
        size = _u32be(a, pos + 4)
        body = pos + 8
        if cid == b"COMM" and size >= 18 and body + 18 <= n:
            channels = int.from_bytes(a[body : body + 2].tobytes(), "big")
            nframes = _u32be(a, body + 2)
            bits = int.from_bytes(a[body + 6 : body + 8].tobytes(), "big")
            sr = _ext80_decode(a, body + 8)
        elif cid == b"SSND" and size >= 8 and body + 8 <= n:
            off = _u32be(a, body)  # alignment offset into the chunk
            data_off = body + 8 + off
            avail = min(size - 8 - off, n - data_off)
        # IFF chunks are padded to even length, like RIFF
        pos = body + size + (size & 1)
    if bits != 16 or channels < 1 or channels > 8 or sr <= 0:
        return None
    if nframes < 0 or data_off < 0 or avail < 0:
        return None
    data_len = min(avail, nframes * 2 * channels)
    return ContainerMeta("aiff", 1, channels, sr, 16, data_off, data_len)


def container_meta(b: bytes | np.ndarray, codec: str) -> ContainerMeta | None:
    if codec == "wav":
        return parse_wav(b)
    if codec == "au":
        return parse_au(b)
    if codec == "aiff":
        return parse_aiff(b)
    return None


def header_sr(b: bytes | np.ndarray, codec: str) -> int | None:
    """Container-declared sample rate (None = not a parseable container)."""
    m = container_meta(b, codec)
    return None if m is None else m.sr


def decode_meta(
    b: bytes | np.ndarray, meta: ContainerMeta, max_frames: int | None = None
) -> np.ndarray:
    """Decode an already-parsed container to mono float32 PCM in
    [-1, 1]. Reads only ``max_frames`` worth of bytes when capped (the
    analysis-cap fast path in the fused feature stage). Channel mix is
    a float32 mean, so duplicated channels reproduce mono bit-exactly."""
    a = _as_u8(b)
    frames = meta.frames if max_frames is None else min(meta.frames, max_frames)
    need = frames * meta.bytes_per_frame
    raw = a[meta.data_off : meta.data_off + need]
    ch = meta.channels
    if meta.kind == "aiff":  # always PCM int16 big-endian
        pcm = raw.view(">i2").astype(np.float32) / np.float32(32767.0)
    elif meta.kind == "au":
        if meta.fmt == 3:  # int16 big-endian
            pcm = raw.view(">i2").astype(np.float32) / np.float32(32767.0)
        else:  # enc 1: mu-law, shared LUT decode
            pcm = mulaw_decode(raw)
    elif meta.fmt == 1:  # wav PCM int16le — same math as pcm16_decode
        pcm = raw.view("<i2").astype(np.float32) / np.float32(32767.0)
    elif meta.fmt == 3:  # wav IEEE float32le
        pcm = raw.view("<f4").astype(np.float32, copy=False)
    else:  # wav fmt 7: mu-law
        pcm = mulaw_decode(raw)
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1, dtype=np.float32)
    return pcm


def container_decode(
    b: bytes | np.ndarray, codec: str, max_frames: int | None = None
) -> np.ndarray | None:
    m = container_meta(b, codec)
    return None if m is None else decode_meta(b, m, max_frames)


def sniff_codec(b: bytes | np.ndarray) -> str | None:
    """Magic-byte container sniff — the payload-level twin of
    ``sources.ingest.guess_format`` (reference guess_format,
    lq_utils.py:101-134). None = raw/unknown payload."""
    a = _as_u8(b)
    if a.size >= 12 and a[:4].tobytes() == b"RIFF" and a[8:12].tobytes() == b"WAVE":
        return "wav"
    if a.size >= 24 and a[:4].tobytes() == b".snd":
        return "au"
    if a.size >= 12 and a[:4].tobytes() == b"FORM" and a[8:12].tobytes() == b"AIFF":
        return "aiff"
    return None


# ---------------------------------------------------------------- encoders
# Used by fixtures and tests only — the engine never writes containers.


def _interleave(x: np.ndarray, channels: int) -> np.ndarray:
    """Mono float PCM -> (frames*channels,) duplicated interleave."""
    if channels == 1:
        return x
    return np.repeat(x[:, None], channels, axis=1).ravel()


def wav_encode(
    x: np.ndarray,
    sr: int,
    inner: str = "pcm_s16le",
    channels: int = 1,
    header_sr: int | None = None,
) -> bytes:
    """float PCM in [-1,1] -> WAV bytes. ``inner`` picks the fmt code:
    pcm_s16le → 1, float32 → 3, mulaw → 7. ``header_sr`` overrides the
    declared rate (fixture knob for the hdr_sr_mismatch defect)."""
    y = _interleave(np.asarray(x), channels)
    if inner == "pcm_s16le":
        fmt, bits = 1, 16
        data = (np.round(np.clip(y, -1.0, 1.0) * 32767.0).astype("<i2")).tobytes()
    elif inner == "float32":
        fmt, bits = 3, 32
        data = np.asarray(y, dtype="<f4").tobytes()
    elif inner == "mulaw":
        fmt, bits = 7, 8
        data = mulaw_encode(y).tobytes()
    else:
        raise ValueError(f"unsupported wav inner codec {inner!r}")
    sr_out = int(header_sr if header_sr is not None else sr)
    block = (bits // 8) * channels
    # non-PCM fmt chunks carry cbSize=0 (18 bytes) + a fact chunk
    fmt_body = (
        fmt.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sr_out.to_bytes(4, "little")
        + (sr_out * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + (b"" if fmt == 1 else (0).to_bytes(2, "little"))
    )
    chunks = [b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body]
    if fmt != 1:
        nframes = len(data) // block
        chunks.append(b"fact" + (4).to_bytes(4, "little") + nframes.to_bytes(4, "little"))
    chunks.append(b"data" + len(data).to_bytes(4, "little") + data)
    if len(data) & 1:
        chunks.append(b"\x00")
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def au_encode(
    x: np.ndarray,
    sr: int,
    inner: str = "mulaw",
    channels: int = 1,
    header_sr: int | None = None,
) -> bytes:
    """float PCM in [-1,1] -> Sun AU bytes (encoding 1 = mu-law,
    3 = int16 big-endian)."""
    y = _interleave(np.asarray(x), channels)
    if inner == "mulaw":
        enc = 1
        data = mulaw_encode(y).tobytes()
    elif inner == "pcm_s16be":
        enc = 3
        data = (np.round(np.clip(y, -1.0, 1.0) * 32767.0).astype(">i2")).tobytes()
    else:
        raise ValueError(f"unsupported au inner codec {inner!r}")
    sr_out = int(header_sr if header_sr is not None else sr)
    head = (
        b".snd"
        + (24).to_bytes(4, "big")
        + len(data).to_bytes(4, "big")
        + enc.to_bytes(4, "big")
        + sr_out.to_bytes(4, "big")
        + channels.to_bytes(4, "big")
    )
    return head + data


def aiff_encode(
    x: np.ndarray,
    sr: int,
    channels: int = 1,
    header_sr: int | None = None,
) -> bytes:
    """float PCM in [-1,1] -> AIFF bytes (PCM int16 big-endian, the
    only AIFF-proper sound format)."""
    y = _interleave(np.asarray(x), channels)
    data = (np.round(np.clip(y, -1.0, 1.0) * 32767.0).astype(">i2")).tobytes()
    sr_out = int(header_sr if header_sr is not None else sr)
    nframes = len(data) // (2 * channels)
    comm = (
        channels.to_bytes(2, "big")
        + nframes.to_bytes(4, "big")
        + (16).to_bytes(2, "big")
        + _ext80_encode(sr_out)
    )
    ssnd_body = (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + data
    chunks = [
        b"COMM" + len(comm).to_bytes(4, "big") + comm,
        b"SSND" + len(ssnd_body).to_bytes(4, "big") + ssnd_body,
    ]
    if len(ssnd_body) & 1:
        chunks.append(b"\x00")
    body = b"AIFF" + b"".join(chunks)
    return b"FORM" + len(body).to_bytes(4, "big") + body
