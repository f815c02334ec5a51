"""Snappy framing-format codec (pure Python + NumPy).

The reference optionally compresses the collated RAD file with Snappy
frames (``snap::write::FrameEncoder`` at src/collate.rs:564-575, read
back with ``FrameDecoder`` at src/quant.rs:372-382).  Both directions
implement the full Snappy block format (literals and all three copy
element kinds):

* the hot codec paths (block compress/uncompress, CRC-32C) run in the
  native library (csrc/radc.cpp) when built;
* without the native library, decompression falls back to the pure
  Python decoder and compression to valid *uncompressed* frame chunks
  (type 0x01) — still a legal snappy framing stream.

Framing spec: https://github.com/google/snappy/blob/main/framing_format.txt
"""

from __future__ import annotations

import struct
from typing import BinaryIO

import numpy as np

from . import _native

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK = 65536

# --- CRC-32C (Castagnoli), table-driven --------------------------------------
_POLY = 0x82F63B78
_TABLE = np.zeros(256, np.uint32)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if (_c & 1) else (_c >> 1)
    _TABLE[_i] = _c


def crc32c(data: bytes) -> int:
    if _native.available():
        return _native.crc32c(data)
    crc = 0xFFFFFFFF
    arr = np.frombuffer(data, np.uint8)
    table = _TABLE
    for b in arr:
        crc = int(table[(crc ^ int(b)) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return ((((c >> 15) | (c << 17)) & 0xFFFFFFFF) + 0xA282EAD8) & 0xFFFFFFFF


# --- block format ------------------------------------------------------------

def _read_varint(buf: bytes, pos: int):
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not (b & 0x80):
            return val, pos
        shift += 7


def block_decompress(buf: bytes) -> bytes:
    """Decode one Snappy block."""
    ulen, pos = _read_varint(buf, 0)
    if _native.available():
        return _native.snappy_uncompress(buf, ulen)
    out = bytearray(ulen)
    opos = 0
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            out[opos : opos + ln] = buf[pos : pos + ln]
            pos += ln
            opos += ln
        else:
            if kind == 1:
                ln = ((tag >> 2) & 0x7) + 4
                off = ((tag >> 5) << 8) | buf[pos]
                pos += 1
            elif kind == 2:
                ln = (tag >> 2) + 1
                off = int.from_bytes(buf[pos : pos + 2], "little")
                pos += 2
            else:
                ln = (tag >> 2) + 1
                off = int.from_bytes(buf[pos : pos + 4], "little")
                pos += 4
            src = opos - off
            if off >= ln:
                out[opos : opos + ln] = out[src : src + ln]
                opos += ln
            else:
                # overlapping copy: byte-by-byte semantics
                for _ in range(ln):
                    out[opos] = out[src]
                    opos += 1
                    src += 1
    return bytes(out[:opos]) if opos != ulen else bytes(out)


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def block_compress_literal(data: bytes) -> bytes:
    """A valid snappy block storing ``data`` as a single literal."""
    out = bytearray(_write_varint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    ln = n - 1
    if ln < 60:
        out.append(ln << 2)
    elif ln < (1 << 8):
        out.append(60 << 2)
        out += ln.to_bytes(1, "little")
    elif ln < (1 << 16):
        out.append(61 << 2)
        out += ln.to_bytes(2, "little")
    elif ln < (1 << 24):
        out.append(62 << 2)
        out += ln.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += ln.to_bytes(4, "little")
    out += data
    return bytes(out)


# --- framing -----------------------------------------------------------------

class SnappyFrameWriter:
    """Incremental snappy framing writer.  Each <=64KiB chunk is
    block-compressed by the native codec; a chunk that does not shrink
    (or when the native library is absent) is stored uncompressed —
    exactly the framing-spec rule reference encoders follow."""

    def __init__(self, fh: BinaryIO):
        self.fh = fh
        fh.write(_STREAM_ID)
        self._pend = bytearray()

    def write(self, data: bytes) -> None:
        self._pend += data
        while len(self._pend) >= _MAX_CHUNK:
            self._emit(bytes(self._pend[:_MAX_CHUNK]))
            del self._pend[:_MAX_CHUNK]

    def _emit(self, chunk: bytes) -> None:
        crc = struct.pack("<I", _masked_crc(chunk))
        if _native.available():
            comp = _native.snappy_compress(chunk)
            if len(comp) < len(chunk):
                body = crc + comp
                self.fh.write(struct.pack("<I", (len(body) << 8) | 0x00))
                self.fh.write(body)
                return
        body = crc + chunk
        self.fh.write(struct.pack("<I", (len(body) << 8) | 0x01))
        self.fh.write(body)

    def flush(self) -> None:
        if self._pend:
            self._emit(bytes(self._pend))
            self._pend.clear()

    def tell(self) -> int:  # for interface compatibility; not seekable
        raise OSError("snappy frame writer is not seekable")


def frame_compress_stream(data: bytes, fh: BinaryIO) -> None:
    """Write ``data`` as a snappy framing stream of uncompressed chunks."""
    w = SnappyFrameWriter(fh)
    w.write(data)
    w.flush()


class SnappyFrameReader:
    """Streaming snappy framing reader with a file-like ``read``/``seek``
    surface, so consumers (quant's whole-cell block streaming) never
    hold the decompressed file in memory.

    ``read(n)`` returns exactly ``n`` bytes unless EOF.  Relative
    backward ``seek`` is supported within retained history: history is
    kept in full until :meth:`drop_history` (the header parser
    over-reads and seeks back while scanning ref names), after which
    consumed bytes are trimmed aggressively.
    """

    def __init__(self, fh: BinaryIO):
        self._fh = fh
        self._buf = bytearray()
        self._pos = 0       # cursor into _buf
        self._base = 0      # absolute offset of _buf[0]
        self._keep_history = True
        self._eof = False
        self._first = True

    def drop_history(self) -> None:
        self._keep_history = False
        self._trim()

    def _trim(self) -> None:
        if self._keep_history or self._pos < (1 << 22):
            return
        del self._buf[: self._pos]
        self._base += self._pos
        self._pos = 0

    def _pull_frame(self) -> bool:
        hdr = self._fh.read(4)
        if len(hdr) < 4:
            self._eof = True
            return False
        word = struct.unpack("<I", hdr)[0]
        ctype = word & 0xFF
        ln = word >> 8
        body = self._fh.read(ln)
        if len(body) != ln:
            raise EOFError("truncated snappy frame")
        if ctype == 0xFF:
            if self._first and body != b"sNaPpY":
                raise ValueError("bad snappy stream identifier")
        elif ctype == 0x00:
            self._buf += block_decompress(body[4:])
        elif ctype == 0x01:
            self._buf += body[4:]
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            pass  # padding / skippable
        else:
            raise ValueError(f"unskippable snappy chunk type 0x{ctype:02x}")
        self._first = False
        return True

    def read(self, n: int = -1) -> bytes:
        if n < 0:
            while self._pull_frame():
                pass
            out = bytes(self._buf[self._pos :])
            self._pos = len(self._buf)
            self._trim()
            return out
        while len(self._buf) - self._pos < n and not self._eof:
            self._pull_frame()
        out = bytes(self._buf[self._pos : self._pos + n])
        self._pos += len(out)
        self._trim()
        return out

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 1:
            target = self._pos + offset
        elif whence == 0:
            target = offset - self._base
        else:
            raise OSError("snappy frame reader cannot seek from end")
        if target < 0:
            raise OSError("seek before retained snappy history")
        while target > len(self._buf) and not self._eof:
            self._pull_frame()
        self._pos = min(target, len(self._buf))
        return self._base + self._pos

    def tell(self) -> int:
        return self._base + self._pos

    def close(self) -> None:
        self._fh.close()


def frame_decompress(fh: BinaryIO) -> bytes:
    """Read a whole snappy framing stream."""
    out = bytearray()
    hdr = fh.read(4)
    first = True
    while len(hdr) == 4:
        word = struct.unpack("<I", hdr)[0]
        ctype = word & 0xFF
        ln = word >> 8
        body = fh.read(ln)
        if len(body) != ln:
            raise EOFError("truncated snappy frame")
        if ctype == 0xFF:
            if first and body != b"sNaPpY":
                raise ValueError("bad snappy stream identifier")
        elif ctype == 0x00:
            out += block_decompress(body[4:])
        elif ctype == 0x01:
            out += body[4:]
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            pass  # padding / skippable
        else:
            raise ValueError(f"unskippable snappy chunk type 0x{ctype:02x}")
        first = False
        hdr = fh.read(4)
    return bytes(out)
