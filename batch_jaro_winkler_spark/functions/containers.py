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
* MP3 (MPEG-1/2 audio, ISO/IEC 11172-3 / 13818-3): after an optional
  ID3v2 tag (syncsafe length), the stream is back-to-back audio frames
  whose 4-byte headers encode version/layer/bitrate/samplerate/padding;
  the frame length is closed-form in those fields, so frame boundaries
  resolve without any huffman decode.  One audio frame IS one frame.
* WebM (EBML/Matroska subset): elements of (vint id, vint size); the
  Segment's Clusters carry SimpleBlocks, each one encoded media frame.
  Only the element tree is parsed — block payloads stay opaque.

Malformed payloads raise ValueError — the sample_frames dispatcher skips
them (no frames), the same soft behavior as empty payloads.
"""

from __future__ import annotations

import struct

__all__ = [
    "gif_frames",
    "wav_frames",
    "mp4_frames",
    "mp3_frames",
    "webm_frames",
]


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
                # bound BEFORE materializing: a mutated count (u32 up to
                # 4G) would otherwise allocate a multi-GB list for a
                # payload the samples cannot possibly fit inside
                if fixed * count > len(data):
                    raise ValueError("MP4: stsz samples exceed payload")
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
        if last > n_chunks:  # bound BEFORE extending: mutated u32
            raise ValueError("MP4: stsc first_chunk beyond chunk list")
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


# kbps by (version_group, layer): version_group 1 = MPEG-1, 2 = MPEG-2/2.5
# (which share tables); indices 1..14 of the 4-bit bitrate field (0 =
# "free format", 15 = invalid — both rejected below).
_MP3_BITRATE_KBPS = {
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
# Hz by the header's 2-bit version field (0=MPEG-2.5, 2=MPEG-2, 3=MPEG-1)
_MP3_SAMPLERATE = {
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}


def mp3_frames(payload: bytes, every_n: int):
    """Yield (frame_no, frame_bytes) for every ``every_n``-th MPEG audio
    frame.  Skips a leading ID3v2 tag and a trailing ID3v1 "TAG" block;
    frame lengths are closed-form in each 4-byte header's version/layer/
    bitrate/samplerate/padding fields — no entropy decode."""
    data = bytes(payload)
    n = len(data)
    pos = 0
    if data[:3] == b"ID3":
        if n < 10:
            raise ValueError("MP3: truncated ID3v2 header")
        size = 0
        for b in data[6:10]:
            if b & 0x80:
                raise ValueError("MP3: non-syncsafe ID3v2 size")
            size = (size << 7) | b
        pos = 10 + size
        if data[5] & 0x10:  # footer-present flag
            pos += 10
    frame_no = 0
    while pos < n:
        if data[pos : pos + 3] == b"TAG":  # trailing ID3v1 tag
            break
        if pos + 4 > n:
            raise ValueError("MP3: truncated frame header")
        (h,) = struct.unpack(">I", data[pos : pos + 4])
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError("MP3: lost frame sync")
        version = (h >> 19) & 3  # 0=MPEG-2.5, 1=reserved, 2=MPEG-2, 3=MPEG-1
        layer = (h >> 17) & 3  # 1=Layer III, 2=Layer II, 3=Layer I
        bri = (h >> 12) & 0xF
        sri = (h >> 10) & 3
        pad = (h >> 9) & 1
        if version == 1 or layer == 0 or bri in (0, 15) or sri == 3:
            raise ValueError("MP3: invalid/unsupported frame header")
        vgroup = 1 if version == 3 else 2
        br = _MP3_BITRATE_KBPS[(vgroup, 4 - layer)][bri - 1] * 1000
        sr = _MP3_SAMPLERATE[version][sri]
        if layer == 3:  # Layer I: 384 samples, 4-byte slots
            flen = (12 * br // sr + pad) * 4
        elif layer == 1 and vgroup == 2:  # MPEG-2/2.5 Layer III: 576 samples
            flen = 72 * br // sr + pad
        else:  # Layer II always, and MPEG-1 Layer III: 1152 samples
            flen = 144 * br // sr + pad
        if pos + flen > n:
            raise ValueError("MP3: frame overruns payload")
        if frame_no % every_n == 0:
            yield frame_no, data[pos : pos + flen]
        frame_no += 1
        pos += flen
    if frame_no == 0:
        raise ValueError("MP3: no audio frames")


_EBML_HEADER = 0x1A45DFA3
_MKV_SEGMENT = 0x18538067
_MKV_CLUSTER = 0x1F43B675
_MKV_SIMPLEBLOCK = 0xA3
_MKV_BLOCKGROUP = 0xA0
_MKV_BLOCK = 0xA1


def _ebml_vint(data: bytes, pos: int, end: int, keep_marker: bool):
    """Parse one EBML variable-length integer → (value, next_pos, is_max).
    ``keep_marker`` keeps the length-marker bit (element IDs compare with
    it); sizes strip it.  is_max flags the all-ones "unknown size"."""
    if pos >= end:
        raise ValueError("EBML: truncated varint")
    first = data[pos]
    if first == 0:
        raise ValueError("EBML: invalid varint (>8 bytes)")
    length = 8 - first.bit_length() + 1
    if pos + length > end:
        raise ValueError("EBML: truncated varint")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for b in data[pos + 1 : pos + length]:
        val = (val << 8) | b
    data_bits_max = (1 << (7 * length)) - 1
    is_max = (val & data_bits_max) == data_bits_max if not keep_marker else False
    return val, pos + length, is_max


def _ebml_children(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for EBML elements in
    data[pos:end]; an unknown-size element extends to the scope's end."""
    while pos < end:
        eid, pos, _ = _ebml_vint(data, pos, end, keep_marker=True)
        size, pos, unknown = _ebml_vint(data, pos, end, keep_marker=False)
        body_end = end if unknown else pos + size
        if body_end > end:
            raise ValueError("EBML: element size overruns scope")
        yield eid, pos, body_end
        pos = body_end


def webm_frames(payload: bytes, every_n: int):
    """Yield (frame_no, block_bytes) for every ``every_n``-th SimpleBlock
    (or BlockGroup Block) across the Segment's Clusters of a WebM/
    Matroska payload.  block_bytes is the raw block body (track vint +
    timecode + flags + still-encoded media data) — structural demux only,
    the codec bitstream is never interpreted."""
    data = bytes(payload)
    n = len(data)
    first, _, _ = _ebml_vint(data, 0, n, keep_marker=True)
    if first != _EBML_HEADER:
        raise ValueError("not an EBML/WebM payload")
    frame_no = 0
    saw_segment = False
    for eid, bs, be in _ebml_children(data, 0, n):
        if eid != _MKV_SEGMENT:
            continue
        saw_segment = True
        for cid, cbs, cbe in _ebml_children(data, bs, be):
            if cid != _MKV_CLUSTER:
                continue
            for bid, bbs, bbe in _ebml_children(data, cbs, cbe):
                blocks = []
                if bid == _MKV_SIMPLEBLOCK:
                    blocks.append((bbs, bbe))
                elif bid == _MKV_BLOCKGROUP:
                    blocks.extend(
                        (gbs, gbe)
                        for gid, gbs, gbe in _ebml_children(data, bbs, bbe)
                        if gid == _MKV_BLOCK
                    )
                for lo, hi in blocks:
                    if frame_no % every_n == 0:
                        yield frame_no, data[lo:hi]
                    frame_no += 1
    if not saw_segment:
        raise ValueError("WebM: missing Segment element")
