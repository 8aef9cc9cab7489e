"""SEI message writers/parsers (spec Annex D).

Analog of x265's SEI class zoo (source/encoder/sei.h); v1 carries the
decoded-picture-hash (MD5) message — the bit-exactness mechanism the
whole validation strategy hangs on (reference sei.h:729,
frameencoder.cpp:1343).
"""
from __future__ import annotations

import hashlib

from .bitwriter import BitWriter
from .bitreader import BitReader

SEI_DECODED_PICTURE_HASH = 132
HASH_MD5 = 0


def plane_md5(*planes, bit_depth: int = 8) -> bytes:
    """Concatenated per-plane MD5 of decoded samples (spec D.3.19: one
    byte per sample for 8-bit, little-endian 16-bit above)."""
    out = b""
    for p in planes:
        if bit_depth > 8:
            out += hashlib.md5(p.astype("<u2").tobytes()).digest()
        else:
            out += hashlib.md5(p.astype("uint8").tobytes()).digest()
    return out


def write_decoded_picture_hash(md5_planes: bytes) -> bytes:
    """RBSP of a suffix SEI carrying hash_type=MD5 + per-plane digests."""
    bw = BitWriter()
    payload = bytes([HASH_MD5]) + md5_planes
    bw.u(SEI_DECODED_PICTURE_HASH, 8)
    size = len(payload)
    while size >= 255:
        bw.u(255, 8)
        size -= 255
    bw.u(size, 8)
    for b in payload:
        bw.u(b, 8)
    bw.rbsp_trailing_bits()
    return bw.get_bytes()


def parse_sei(rbsp: bytes):
    """Parse SEI messages -> list of (payload_type, payload bytes)."""
    br = BitReader(rbsp)
    out = []
    while True:
        ptype = 0
        while True:
            b = br.u(8)
            ptype += b
            if b != 255:
                break
        psize = 0
        while True:
            b = br.u(8)
            psize += b
            if b != 255:
                break
        payload = bytes(br.u(8) for _ in range(psize))
        out.append((ptype, payload))
        if not br.more_rbsp_data():
            break
    return out
