"""Minimal FLAC writer for decoder tests.

Emits spec-shaped FLAC streams — STREAMINFO plus fixed-blocksize frames of
VERBATIM subframes (16-bit) — which is everything the from-scratch decoder
in ``_native/audioio.cpp`` needs to exercise its sync, header, subframe and
stereo paths.  Frame CRCs are written as zeros (the decoder reads and
ignores them, like many stream decoders); files are for these tests only,
not for external players.
"""

from __future__ import annotations

import struct

import numpy as np


def _utf8_frame_number(idx: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (enough for test sizes)."""
    if idx < 0x80:
        return bytes([idx])
    if idx < 0x800:
        return bytes([0xC0 | (idx >> 6), 0x80 | (idx & 0x3F)])
    if idx < 0x10000:
        return bytes(
            [0xE0 | (idx >> 12), 0x80 | ((idx >> 6) & 0x3F), 0x80 | (idx & 0x3F)]
        )
    raise ValueError("frame index too large for this writer")


def write_flac(path: str, pcm16: np.ndarray, sr: int, blocksize: int = 4096) -> None:
    """Write int16 PCM ``(n, channels)`` as a verbatim-subframe FLAC file."""
    pcm16 = np.asarray(pcm16, dtype=np.int16)
    if pcm16.ndim == 1:
        pcm16 = pcm16[:, None]
    n, ch = pcm16.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (type 0, last-metadata flag set, 34 bytes)
    out += bytes([0x80, 0, 0, 34])
    info = bytearray()
    info += struct.pack(">HH", blocksize, blocksize)      # min/max blocksize
    info += b"\x00\x00\x00" * 2                            # min/max framesize
    # sample_rate(20) | channels-1(3) | bps-1(5) | total(36), then MD5(16B)
    bits = (sr << 44) | ((ch - 1) << 41) | ((16 - 1) << 36) | n
    info += bits.to_bytes(8, "big")
    info += b"\x00" * 16
    assert len(info) == 34
    out += info

    for f_idx, start in enumerate(range(0, n, blocksize)):
        block = pcm16[start : start + blocksize]
        bs = block.shape[0]
        # frame header: sync(14)=0x3FFE, reserved(1)=0, blocking(1)=0,
        # bs_code(4)=7 (16-bit field), sr_code(4)=0 (STREAMINFO),
        # ch_code(4)=ch-1 (independent), ss_code(3)=4 (16-bit), reserved(1)=0
        hdr32 = (0x3FFE << 18) | (7 << 12) | (0 << 8) | ((ch - 1) << 4) | (4 << 1)
        out += hdr32.to_bytes(4, "big")
        out += _utf8_frame_number(f_idx)
        out += struct.pack(">H", bs - 1)
        out += b"\x00"  # CRC-8 (unchecked by the decoder)
        for c in range(ch):
            out += b"\x02"  # pad(1)=0 | type(6)=000001 VERBATIM | wasted(1)=0
            out += block[:, c].astype(">i2").tobytes()
        out += b"\x00\x00"  # CRC-16 (unchecked)

    with open(path, "wb") as fh:
        fh.write(bytes(out))
