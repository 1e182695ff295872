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
* MP4 (ISO BMFF, ISO/IEC 14496-12): the stream is a tree of boxes
  (u32be size + fourcc, size==1 → u64 largesize, size==0 → to EOF).
  ``moov/trak/mdia/minf/stbl`` carries the sample tables — ``stsz``
  (sizes), ``stsc`` (samples per chunk), ``stco``/``co64`` (chunk file
  offsets) — which locate every sample's byte range inside ``mdat``
  without touching the codec bitstream.  One sample IS one frame.

Malformed payloads raise ValueError — the sample_frames dispatcher skips
them (no frames), the same soft behavior as empty payloads.
"""

from __future__ import annotations

import struct

__all__ = ["gif_frames", "wav_frames", "mp4_frames"]


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


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, box_end) for the ISO-BMFF boxes in
    data[pos:end]; validates sizes so a lying header raises ValueError."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("MP4: truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4: bad box size {size} for {fourcc!r}")
        yield fourcc, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("MP4: trailing garbage between boxes")


def _u32_table(body: bytes, what: str) -> list[int]:
    """Parse a full-box u32 table: ver/flags u32, count u32, count*u32."""
    if len(body) < 8:
        raise ValueError(f"MP4: truncated {what}")
    (count,) = struct.unpack(">I", body[4:8])
    if len(body) < 8 + 4 * count:
        raise ValueError(f"MP4: {what} count overruns box")
    return list(struct.unpack(f">{count}I", body[8 : 8 + 4 * count]))


def _parse_stbl(data: bytes, start: int, end: int):
    """→ (sizes, chunk_offsets, samples_per_chunk) from one stbl box."""
    sizes = offsets = stsc = None
    for fourcc, bs, be in _iter_boxes(data, start, end):
        body = data[bs:be]
        if fourcc == b"stsz":
            if len(body) < 12:
                raise ValueError("MP4: truncated stsz")
            fixed, count = struct.unpack(">II", body[4:12])
            if fixed:  # constant-size samples: table omitted
                sizes = [fixed] * count
            else:
                if len(body) < 12 + 4 * count:
                    raise ValueError("MP4: stsz count overruns box")
                sizes = list(
                    struct.unpack(f">{count}I", body[12 : 12 + 4 * count])
                )
        elif fourcc == b"stco":
            offsets = _u32_table(body, "stco")
        elif fourcc == b"co64":
            if len(body) < 8:
                raise ValueError("MP4: truncated co64")
            (count,) = struct.unpack(">I", body[4:8])
            if len(body) < 8 + 8 * count:
                raise ValueError("MP4: co64 count overruns box")
            offsets = list(
                struct.unpack(f">{count}Q", body[8 : 8 + 8 * count])
            )
        elif fourcc == b"stsc":
            # count field counts 12-byte (first_chunk, samples_per_chunk,
            # sample_desc_idx) entries, not u32s
            if len(body) < 8:
                raise ValueError("MP4: truncated stsc")
            (count,) = struct.unpack(">I", body[4:8])
            if len(body) < 8 + 12 * count:
                raise ValueError("MP4: stsc count overruns box")
            raw = struct.unpack(f">{3 * count}I", body[8 : 8 + 12 * count])
            stsc = [tuple(raw[i : i + 3]) for i in range(0, len(raw), 3)]
    if sizes is None or offsets is None or stsc is None:
        return None
    return sizes, offsets, stsc


def mp4_frames(payload: bytes, every_n: int):
    """Yield (sample_no, sample_bytes) for every ``every_n``-th sample of
    the first ISO-BMFF track carrying complete sample tables.  Pure
    structural demux: sample byte ranges come from stsz/stsc/stco(co64),
    the codec bitstream inside mdat is never interpreted."""
    data = bytes(payload)
    n = len(data)
    if n < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no ftyp)")
    tables = None
    for fourcc, bs, be in _iter_boxes(data, 0, n):
        if fourcc != b"moov":
            continue
        for t4, tbs, tbe in _iter_boxes(data, bs, be):
            if t4 != b"trak" or tables is not None:
                continue
            # descend trak → mdia → minf → stbl (skipping siblings)
            scope = (tbs, tbe)
            for want in (b"mdia", b"minf", b"stbl"):
                found = None
                for c4, cbs, cbe in _iter_boxes(data, *scope):
                    if c4 == want:
                        found = (cbs, cbe)
                        break
                if found is None:
                    scope = None
                    break
                scope = found
            if scope is not None:
                tables = _parse_stbl(data, *scope)
    if tables is None:
        raise ValueError("MP4: no track with stsz/stsc/stco sample tables")
    sizes, offsets, stsc = tables
    # expand stsc runs → samples-per-chunk for each of len(offsets) chunks
    n_chunks = len(offsets)
    spc: list[int] = []
    for i, (first_chunk, per_chunk, _sdi) in enumerate(stsc):
        if first_chunk != len(spc) + 1:
            raise ValueError("MP4: stsc first_chunk out of sequence")
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        spc.extend([per_chunk] * (last - len(spc)))
    if len(spc) != n_chunks:
        raise ValueError("MP4: stsc does not cover the chunk list")
    sample_no = 0
    for chunk_i, off in enumerate(offsets):
        pos = off
        for _ in range(spc[chunk_i]):
            if sample_no >= len(sizes):
                raise ValueError("MP4: stsc implies more samples than stsz")
            size = sizes[sample_no]
            if pos + size > n:
                raise ValueError("MP4: sample range outside payload")
            if sample_no % every_n == 0:
                yield sample_no, data[pos : pos + size]
            pos += size
            sample_no += 1
    if sample_no != len(sizes):
        raise ValueError("MP4: stsz implies more samples than stsc/stco")
