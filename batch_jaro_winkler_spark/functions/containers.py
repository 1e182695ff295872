"""Real container demuxers for frame sampling — no codecs required.

Frame *sampling* at 100 TB is a demuxing problem, not a decoding one: the
container's block structure locates frame boundaries, and the sampled
frames ship on as opaque bytes for downstream decode/feature stages.
Both parsers below implement their PUBLIC container specs from scratch:

* GIF (GIF87a/89a): the stream is a flat sequence of blocks — extensions
  (0x21, label + length-prefixed sub-blocks), image descriptors (0x2C,
  9-byte header + optional local color table + LZW-min byte + sub-blocks)
  and the trailer (0x3B).  Each image descriptor IS one animation frame;
  its raw byte range (descriptor through its data sub-blocks) is the
  frame payload.  The LZW pixel data is never decoded.
* WAV (RIFF/WAVE): chunks of (fourcc, u32le size); ``fmt `` gives the
  byte rate, ``data`` holds PCM.  A "frame" is one second of audio
  (byte_rate bytes), the natural fixed sampling unit.

Malformed payloads raise ValueError — the sample_frames dispatcher skips
them (no frames), the same soft behavior as empty payloads.
"""

from __future__ import annotations

import struct

__all__ = ["gif_frames", "wav_frames"]


def _skip_subblocks(data: bytes, pos: int) -> int:
    """Advance past a length-prefixed sub-block chain (incl. terminator)."""
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("GIF: truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size


def gif_frames(payload: bytes, every_n: int):
    """Yield (frame_no, frame_bytes) for every ``every_n``-th image frame
    of a GIF, where frame_bytes is the raw image-descriptor block
    (header + local color table + LZW data sub-blocks)."""
    data = bytes(payload)
    if data[:3] != b"GIF" or data[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("GIF: truncated logical screen descriptor")
    packed = data[10]
    pos = 13
    if packed & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (1 << ((packed & 0x07) + 1))
    frame_no = 0
    n = len(data)
    while pos < n:
        block = data[pos]
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: introducer + label + sub-blocks
            if pos + 2 > n:
                raise ValueError("GIF: truncated extension")
            pos = _skip_subblocks(data, pos + 2)
        elif block == 0x2C:  # image descriptor = one frame
            start = pos
            if pos + 10 > n:
                raise ValueError("GIF: truncated image descriptor")
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table
                pos += 3 * (1 << ((ipacked & 0x07) + 1))
            pos += 1  # LZW minimum code size
            pos = _skip_subblocks(data, pos)
            if frame_no % every_n == 0:
                yield frame_no, data[start:pos]
            frame_no += 1
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02X}")
    raise ValueError("GIF: missing trailer")


def wav_frames(payload: bytes, every_n: int):
    """Yield (frame_no, frame_bytes) for every ``every_n``-th one-second
    PCM block of a RIFF/WAVE payload (frame size = byte rate from fmt)."""
    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    n = len(data)
    byte_rate = None
    while pos + 8 <= n:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"fmt ":
            if size < 16 or len(body) < 16:
                raise ValueError("WAV: short fmt chunk")
            byte_rate = struct.unpack("<I", body[8:12])[0]
            if byte_rate <= 0:
                raise ValueError("WAV: zero byte rate")
        elif fourcc == b"data":
            if byte_rate is None:
                raise ValueError("WAV: data before fmt")
            n_frames = max(1, (len(body) + byte_rate - 1) // byte_rate)
            for i in range(0, n_frames, every_n):
                yield i, body[i * byte_rate : (i + 1) * byte_rate]
            return
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV: missing data chunk")
