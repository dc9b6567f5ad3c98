"""Minimal stdlib-only PNG codec (round-11, r10 VERDICT stretch item 7).

The container has no pillow, so the multimodal tier's REAL decode branch
(``multimodal.decode_image`` -> ``real_decode_features``) had never
executed here — it was import-gated behind PIL and skipped. This module
implements exactly enough of the PNG spec (public: RFC 2083 / W3C
PNG) to drive that branch with 8-bit grayscale and RGB test fixtures:

- ``encode_png``: IHDR + one zlib IDAT (filter 0 rows) + IEND.
- ``decode_png``: chunk walk, zlib inflate, and ALL five scanline
  filters (None/Sub/Up/Average/Paeth) unfiltered per the spec.
- ``MiniImage``: the thin image-object shim ``decode_image`` returns
  when PIL is absent — ``.size``, ``.mode``, ``.convert("L")`` (ITU-R
  601-2 luma, truncating, matching PIL's documented RGB->L transform),
  and ``__array__`` so ``numpy.asarray(img)`` works unchanged in
  ``real_decode_features``.

Deliberately NOT a general decoder: no interlace, palette, 16-bit, or
alpha — those raise ValueError loudly. Production clusters install a
real imaging library behind the same ``decode_fn`` seam.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color type -> samples per pixel (8-bit only)
_MODE_CT = {"L": 0, "RGB": 2}


class MiniImage:
    """Image-object shim: rows are list-of-list pixel tuples/ints."""

    def __init__(self, width: int, height: int, mode: str, pixels):
        if mode not in _MODE_CT:
            raise ValueError(f"unsupported mode {mode!r}")
        self.size = (width, height)
        self.mode = mode
        self._px = pixels  # grayscale: [[int]*w]*h; RGB: [[(r,g,b)]*w]*h

    def convert(self, mode: str) -> "MiniImage":
        if mode == self.mode:
            return self
        if mode == "L" and self.mode == "RGB":
            # PIL's documented ITU-R 601-2 luma transform, truncating
            rows = [[(r * 299 + g * 587 + b * 114) // 1000
                     for (r, g, b) in row] for row in self._px]
            return MiniImage(self.size[0], self.size[1], "L", rows)
        raise ValueError(f"unsupported convert {self.mode!r}->{mode!r}")

    def __array__(self, dtype=None, copy=None):
        import numpy as np

        arr = np.array(self._px, dtype=dtype if dtype is not None
                       else np.uint8)
        return arr


def encode_png(pixels, mode: str = "L") -> bytes:
    """pixels: grayscale [[int]] or RGB [[(r,g,b)]] row-major."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    ct = _MODE_CT[mode]
    raw = bytearray()
    for row in pixels:
        raw.append(0)  # filter type None
        if ct == 0:
            raw.extend(row)
        else:
            for px in row:
                raw.extend(px)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> MiniImage:
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, bytearray(), None
    while pos + 8 <= len(data):
        (ln,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        if pos + 12 + ln > len(data):
            raise ValueError(
                f"truncated PNG: chunk {tag!r} declares {ln} bytes but "
                f"only {len(data) - pos - 12} remain")
        body = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            try:
                w, h, depth, ct, comp, filt, ilace = struct.unpack(
                    ">IIBBBBB", body)
            except struct.error as exc:
                raise ValueError(
                    f"malformed IHDR ({ln} bytes, want 13)") from exc
            if depth != 8 or ct not in _CHANNELS or ilace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ct}, "
                    f"interlace={ilace}); png_mini handles 8-bit "
                    f"gray/RGB only")
            meta = (w, h, ct)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("no IHDR chunk")
    w, h, ct = meta
    nch = _CHANNELS[ct]
    stride = w * nch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ftype == 1:
                line[i] = (line[i] + a) & 0xFF
            elif ftype == 2:
                line[i] = (line[i] + b) & 0xFF
            elif ftype == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
            elif ftype != 0:
                raise ValueError(f"bad filter type {ftype}")
        out.extend(line)
        prev = line
    if ct == 0:
        rows = [list(out[y * stride:(y + 1) * stride]) for y in range(h)]
        return MiniImage(w, h, "L", rows)
    rows = [[tuple(out[y * stride + x * 3:y * stride + x * 3 + 3])
             for x in range(w)] for y in range(h)]
    return MiniImage(w, h, "RGB", rows)
