"""From-spec PNG codec (pure stdlib ``zlib``/``struct`` + numpy).

The container ships no image libraries, so — as with the BIFF8 xls
and SPSS .sav readers — the codec is written directly from the public
specification (RFC 2083 / W3C PNG): 8-byte signature, length-typed
chunks with CRC32, IHDR geometry, zlib-compressed IDAT scanlines with
per-row filter bytes (None/Sub/Up/Average/Paeth).

Scope: non-interlaced, bit depth 8, color types 0 (grayscale),
2 (RGB), 3 (palette, expanded to RGB/RGBA via PLTE + optional tRNS),
4 (gray+alpha), 6 (RGBA).  16-bit and Adam7 raise
``NotImplementedError`` — sniffed up front, never silently wrong.  Encoding filters are fully vectorized (they read only
original neighbor values); decoding Sub/Average/Paeth is inherently
sequential per scanline (each pixel depends on the reconstructed
left neighbor) and runs as a per-byte loop — appropriate for the
fixture/validation scale this codec serves; production pipelines
plug a native codec into the same :func:`multimodal.image_stats`
dataflow, which is the part that carries the 100-TB design (byte-
budgeted Arrow sub-batching, blob column pruning).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels in the FILTERED stream (depth 8 only);
# palette (3) carries 1 index byte per pixel, expanded after unfilter
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_CTYPE_FOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, filters: str = "mixed") -> bytes:
    """numpy (H,W) or (H,W,C) uint8 → PNG bytes.

    ``filters="mixed"`` cycles the filter type per scanline
    (row % 5), so a round-trip exercises every filter the decoder
    implements; ``"none"`` writes filter 0 throughout.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    ctype = _CTYPE_FOR[channels]
    flat = arr.reshape(h, w * channels).astype(np.int16)
    bpp = channels
    zero_row = np.zeros(w * channels, dtype=np.int16)
    lines = []
    for r in range(h):
        cur = flat[r]
        prev = flat[r - 1] if r else zero_row
        left = np.concatenate([zero_row[:bpp], cur[:-bpp]])
        upleft = np.concatenate([zero_row[:bpp], prev[:-bpp]])
        f = r % 5 if filters == "mixed" else 0
        if f == 0:
            filt = cur
        elif f == 1:                              # Sub
            filt = cur - left
        elif f == 2:                              # Up
            filt = cur - prev
        elif f == 3:                              # Average
            filt = cur - ((left + prev) >> 1)
        else:                                     # Paeth
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
            + _chunk(b"IEND", b""))


def encode_png_palette(indices: np.ndarray, palette: np.ndarray,
                       trns: np.ndarray | None = None,
                       filters: str = "mixed") -> bytes:
    """(H,W) uint8 index grid + (P,3) palette (+ optional per-entry
    alpha) → color-type-3 PNG.  Filters apply to the index bytes,
    exactly as the spec prescribes for palette images."""
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    body = encode_png(indices, filters=filters)
    # rewrite the gray IHDR as palette and splice PLTE (+tRNS) in
    ihdr_start = 8
    ihdr_len = 13
    h, w = indices.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    rest = body[ihdr_start + 12 + ihdr_len:]     # IDAT onward
    extra = _chunk(b"PLTE", palette.tobytes())
    if trns is not None:
        extra += _chunk(b"tRNS",
                        np.ascontiguousarray(trns, np.uint8).tobytes())
    return PNG_SIG + _chunk(b"IHDR", ihdr) + extra + rest


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → numpy uint8 array, (H,W) for grayscale else
    (H,W,C).  Non-interlaced depth-8 only (see module docstring)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    plte = trns = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace or ctype not in _CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} ctype={ctype} interlace={interlace} "
            "unsupported (depth-8 non-interlaced "
            "gray/palette/GA/RGB/RGBA only)")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    channels = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    bpp = channels
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=r * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:                              # Up (vectorizable)
            cur = (line + prev) & 0xFF
        elif f == 1:                              # Sub: per-channel cumsum
            cur = line.reshape(w, bpp).cumsum(axis=0).reshape(stride) & 0xFF
        elif f == 3:                              # Average (scan dep)
            # byte-to-byte scan dependency can't vectorize exactly
            # (floor division inside the recurrence), but plain
            # Python lists beat numpy per-element indexing ~5x here
            cl = line.tolist()
            pl = prev.tolist()
            for i in range(bpp):
                cl[i] = (cl[i] + (pl[i] >> 1)) & 0xFF
            for i in range(bpp, stride):
                cl[i] = (cl[i] + ((cl[i - bpp] + pl[i]) >> 1)) & 0xFF
            cur = np.asarray(cl, dtype=np.int32)
        elif f == 4:                              # Paeth (scan dep)
            cl = line.tolist()
            pl = prev.tolist()
            for i in range(bpp):
                cl[i] = (cl[i] + pl[i]) & 0xFF    # a=c=0 → pred=b
            for i in range(bpp, stride):
                a = cl[i - bpp]
                b = pl[i]
                c = pl[i - bpp]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                cl[i] = (cl[i] + pred) & 0xFF
            cur = np.asarray(cl, dtype=np.int32)
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        out[r] = cur.astype(np.uint8)
        prev = out[r].astype(np.int32)
    img = out.reshape(h, w, channels)
    if ctype == 3:
        idx = img[:, :, 0]
        if idx.max() >= plte.shape[0]:
            raise ValueError("palette index out of range")
        rgb = plte[idx]                      # (H,W,3)
        if trns is None:
            return rgb
        alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
        alpha[:trns.size] = trns
        return np.dstack([rgb, alpha[idx]])  # (H,W,4)
    return img[:, :, 0] if channels == 1 else img
