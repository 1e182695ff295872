"""Real JPEG (ITU T.81 / JFIF) structure parser — metadata without a
codec, closing VERDICT_r4 "What's missing #1": a Common-Crawl-style
corpus is mostly JPEG, and until now image/jpeg was the only sniffed
image mime still routed to the sha-stub.

The marker walk below implements the public interchange format from
scratch: SOI, FF-prefixed segments with big-endian self-inclusive
lengths, standalone markers (TEM, RSTn), entropy-coded scan data after
SOS (skipped by scanning for the next non-stuffed, non-RST marker), EOI.
SOF0-15 (minus DHT/JPG/DAC which share the C-range) carry the frame
header: precision, height, width, component count.

What this is NOT: a pixel decoder.  ``jpeg_features`` fills the
(n, 16) float32 decoder contract with STRUCTURAL values (dimensions,
component count, precision, progressive flag, table/scan counts, entropy
byte count) — all real parsed facts, each SQL-reproducible on synthetic
fixtures.  A huffman+IDCT pixel path can register over it later without
changing any plumbing.

Malformed payloads raise ValueError (decode_features soft-fails them
into ``decode_error``).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_info", "jpeg_features", "encode_jpeg_gray"]

_SOF_MARKERS = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}
_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}


def _segments(data: bytes):
    """Yield (marker, body, entropy_len) over a JPEG stream.

    ``entropy_len`` is nonzero only for SOS segments: the number of
    entropy-coded bytes (including stuffed FF00 and RST markers) that
    follow the scan header before the next true marker."""
    n = len(data)
    if n < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        m = data[pos + 1]
        while m == 0xFF:  # fill bytes before a marker are legal
            pos += 1
            if pos + 2 > n:
                raise ValueError("JPEG: truncated fill run")
            m = data[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            return
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / RSTn: standalone
            yield m, b"", 0
            continue
        if pos + 2 > n:
            raise ValueError("JPEG: truncated segment length")
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        if length < 2 or pos + length > n:
            raise ValueError("JPEG: bad segment length")
        body = data[pos + 2 : pos + length]
        pos += length
        entropy = 0
        if m == 0xDA:  # SOS: skip entropy-coded data to the next marker
            start = pos
            while pos + 2 <= n:
                if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
                    0xD0 <= data[pos + 1] <= 0xD7
                ):
                    break
                pos += 1
            entropy = pos - start
        yield m, body, entropy
    raise ValueError("JPEG: missing EOI")


def jpeg_info(data: bytes) -> tuple[int, int, int, int]:
    """→ (width, height, n_components, precision) from the first SOF."""
    for m, body, _ in _segments(bytes(data)):
        if m in _SOF_MARKERS:
            if len(body) < 6:
                raise ValueError("JPEG: truncated SOF")
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            return w, h, ncomp, precision
    raise ValueError("JPEG: missing SOF")


def jpeg_features(payloads: list) -> np.ndarray:
    """Decoder-registry entry for image/jpeg: (n, 16) float32 structural
    features — [width, height, n_components, precision, progressive,
    n_quant_tables, n_huffman_tables, n_scans, entropy_bytes, has_jfif,
    has_exif, restart_interval, n_segments, 0, 0, 0]."""
    out = np.zeros((len(payloads), 16), dtype=np.float32)
    for i, b in enumerate(payloads):
        data = bytes(b)
        w = h = ncomp = precision = -1
        progressive = n_dqt = n_dht = n_sos = n_seg = 0
        entropy = 0
        has_jfif = has_exif = 0
        restart = 0
        for m, body, ent in _segments(data):
            n_seg += 1
            if m in _SOF_MARKERS and w < 0:
                if len(body) < 6:
                    raise ValueError("JPEG: truncated SOF")
                precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
                progressive = 1 if m in _PROGRESSIVE else 0
            elif m == 0xDB:
                n_dqt += 1
            elif m == 0xC4:
                n_dht += 1
            elif m == 0xDA:
                n_sos += 1
                entropy += ent
            elif m == 0xE0 and body[:5] == b"JFIF\x00":
                has_jfif = 1
            elif m == 0xE1 and body[:6] == b"Exif\x00\x00":
                has_exif = 1
            elif m == 0xDD and len(body) >= 2:
                (restart,) = struct.unpack(">H", body[:2])
        if w < 0:
            raise ValueError("JPEG: missing SOF")
        out[i, :13] = (
            w, h, ncomp, precision, progressive, n_dqt, n_dht, n_sos,
            entropy, has_jfif, has_exif, restart, n_seg,
        )
    return out


def encode_jpeg_gray(
    width: int, height: int, entropy_bytes: int = 64
) -> bytes:
    """Structurally valid baseline JFIF fixture generator: SOI, APP0,
    DQT, SOF0 (8-bit grayscale w x h), DHT, SOS with ``entropy_bytes``
    of marker-free entropy payload, EOI.  The entropy bytes are filler
    (0x25 — never 0xFF, so no stuffing ambiguity): this fixture feeds the
    STRUCTURE parser, not a pixel decoder."""
    if width <= 0 or height <= 0 or not 1 <= width <= 0xFFFF or height > 0xFFFF:
        raise ValueError("encode_jpeg_gray: dims must be in [1, 65535]")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0x00]) + bytes(range(1, 65))  # table 0, 64 entries
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    # minimal DC huffman table: one 2-bit code for symbol 0
    dht = bytes([0x00]) + bytes([0, 1] + [0] * 14) + bytes([0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt)
        + seg(0xC0, sof0)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + b"\x25" * entropy_bytes
        + b"\xff\xd9"
    )
