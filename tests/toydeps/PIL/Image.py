"""Minimal real PNG codec (8-bit grayscale, filters 0-2) with the PIL
Image API surface the real-decode branch uses. See package docstring."""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


class _Image:
    def __init__(self, size: tuple[int, int], pixels: list[int]):
        self.size = size
        self._px = pixels

    def convert(self, mode: str) -> "_Image":
        if mode != "L":
            raise NotImplementedError("toy PIL supports grayscale 'L' only")
        return self

    def getdata(self) -> list[int]:
        return list(self._px)

    def save(self, fp, format: str = "PNG") -> None:
        if format.upper() != "PNG":
            raise NotImplementedError("toy PIL writes PNG only")
        w, h = self.size
        raw = b"".join(
            b"\x00" + bytes(self._px[y * w : (y + 1) * w]) for y in range(h)
        )
        fp.write(
            _SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )

    def __enter__(self) -> "_Image":
        return self

    def __exit__(self, *exc) -> bool:
        return False


def new(mode: str, size: tuple[int, int], color: int = 0) -> _Image:
    if mode != "L":
        raise NotImplementedError("toy PIL supports grayscale 'L' only")
    w, h = size
    return _Image((w, h), [int(color)] * (w * h))


def open(fp) -> _Image:  # noqa: A001 - PIL's own name
    data = fp.read() if hasattr(fp, "read") else bytes(fp)
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = bitdepth = colortype = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, colortype = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if bitdepth != 8 or colortype != 0:
        raise NotImplementedError("toy PIL reads 8-bit grayscale PNG only")
    raw = zlib.decompress(idat)
    stride = w + 1
    px: list[int] = []
    prev = bytes(w)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        f, scan = row[0], bytearray(row[1:])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(1, w):
                scan[x] = (scan[x] + scan[x - 1]) & 0xFF
        elif f == 2:  # Up
            for x in range(w):
                scan[x] = (scan[x] + prev[x]) & 0xFF
        else:
            raise NotImplementedError(f"toy PIL: PNG filter {f}")
        px.extend(scan)
        prev = bytes(scan)
    return _Image((w, h), px)
