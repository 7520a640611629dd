"""Minimal pure-stdlib SPSS system-file (.sav) reader.

The reference converts .sav via pyreadstat (``lib_materialize/
datamart_materialize/spss.py``), which is not in this environment, so
this module implements the subset of the PUBLIC format specification
(documented in the PSPP manual, "System File Format") the conversion
needs: the $FL2 header, variable records (numeric + strings spanning
continuation elements), value-label and document records (skipped),
type-7 extensions (subtype 14 very-long-string widths parsed — strings
>255 bytes stored as 252-content-byte segments are merged back; other
subtypes skipped), bytecode ("compression 1") case decoding with
bias/sysmis/spaces/literal opcodes, and SPSS date/datetime formats
(values are seconds since 1582-10-14, the Gregorian epoch).

No pyreadstat/PSPP code is used or copied — record layouts follow the
published specification.
"""

from __future__ import annotations

import datetime
import struct

import numpy as np
import pandas as pd

SYSMIS = -1.7976931348623157e308
_GREGORIAN = datetime.datetime(1582, 10, 14)
# print-format TYPE codes that render as calendar dates / datetimes
_DATE_TYPES = {20, 23, 24, 38, 39}      # DATE ADATE JDATE EDATE SDATE
_DATETIME_TYPES = {22}                  # DATETIME


class SavError(ValueError):
    pass


def _read_sav(data: bytes):
    if data[:4] != b"$FL2":
        raise SavError("not an SPSS system file ($FL2)")
    layout = struct.unpack_from("<i", data, 64)[0]
    endian = "<" if layout in (2, 3) else ">"

    def u32(off):
        return struct.unpack_from(endian + "i", data, off)[0]

    def f64(off):
        return struct.unpack_from(endian + "d", data, off)[0]

    case_size = u32(68)
    compression = u32(72)
    n_cases = u32(80)
    bias = f64(84)
    pos = 176

    names: list[str] = []
    widths: list[int] = []       # 0 = numeric, >0 = string width
    fmts: list[int] = []         # print-format TYPE code
    vls: dict[str, int] = {}     # very-long-string true widths
    while True:
        rtype = u32(pos)
        pos += 4
        if rtype == 2:           # variable record
            vtype = u32(pos)
            has_label = u32(pos + 4)
            n_missing = u32(pos + 8)
            print_fmt = u32(pos + 12)
            name = data[pos + 20:pos + 28].rstrip(b" ").decode(
                "latin-1")
            pos += 28
            if has_label:
                llen = u32(pos)
                pos += 4 + ((llen + 3) // 4) * 4
            if n_missing:
                pos += abs(n_missing) * 8
            if vtype >= 0:       # continuation records have vtype -1
                names.append(name)
                widths.append(vtype)
                fmts.append((print_fmt >> 16) & 0xFF)
        elif rtype == 3:         # value labels
            n = u32(pos)
            pos += 4
            for _ in range(n):
                pos += 8                       # labelled value
                llen = data[pos]
                # length byte + chars + padding → multiple of 8
                pos += ((1 + llen + 7) // 8) * 8
        elif rtype == 4:         # value-label variable list
            n = u32(pos)
            pos += 4 + n * 4
        elif rtype == 6:         # documents
            n = u32(pos)
            pos += 4 + n * 80
        elif rtype == 7:         # extension
            subtype = u32(pos)
            pos += 4
            size = u32(pos)
            count = u32(pos + 4)
            pos += 8
            if subtype == 14:
                # very-long-string record: "NAME=LENGTH" pairs, each
                # followed by a null byte and a tab (PSPP spec);
                # strings >255 bytes are stored as 255-wide segments
                # of 252 content bytes each, merged below
                raw = data[pos:pos + size * count]
                for entry in raw.replace(b"\x00", b"").split(b"\t"):
                    if b"=" in entry:
                        nm, ln = entry.split(b"=", 1)
                        try:
                            vls[nm.rstrip(b" ").decode("latin-1")] = \
                                int(ln)
                        except ValueError:
                            pass
            pos += size * count
        elif rtype == 999:       # dictionary terminator
            pos += 4
            break
        else:
            raise SavError(f"unknown record type {rtype} at {pos - 4}")

    # ---- case data ----
    n_elems = n_cases * case_size if n_cases >= 0 else None

    def iter_elements_uncompressed():
        p = pos
        while p + 8 <= len(data):
            yield data[p:p + 8]
            p += 8

    def iter_elements_bytecode():
        p = pos
        while p + 8 <= len(data):
            codes = data[p:p + 8]
            p += 8
            for c in codes:
                if c == 0:
                    continue
                if c == 252:
                    return
                if c == 253:
                    yield data[p:p + 8]
                    p += 8
                elif c == 254:
                    yield b" " * 8
                elif c == 255:
                    yield struct.pack(endian + "d", SYSMIS)
                else:
                    yield struct.pack(endian + "d", float(c) - bias)

    elems = (iter_elements_bytecode() if compression == 1
             else iter_elements_uncompressed())

    cols: list[list] = [[] for _ in names]
    done = False
    while not done:
        row_raw = []
        for w in widths:
            need = 1 if w == 0 else (w + 7) // 8
            parts = []
            for _ in range(need):
                try:
                    parts.append(next(elems))
                except StopIteration:
                    done = True
                    break
            if done:
                break
            row_raw.append((w, parts))
        if done or len(row_raw) < len(widths):
            break
        for i, (w, parts) in enumerate(row_raw):
            if w == 0:
                v = struct.unpack(endian + "d", parts[0])[0]
                cols[i].append(np.nan if v == SYSMIS else v)
            else:
                cols[i].append(b"".join(parts))   # raw; decoded below
        if n_cases >= 0 and len(cols[0]) >= n_cases:
            break

    # merge very-long-string segments (width > 255): the dictionary
    # holds ceil(W/252) segment variables — every segment but the last
    # is 255 wide and carries 252 content bytes
    out_names, out_widths, out_fmts, out_cols = [], [], [], []
    i = 0
    while i < len(names):
        w = widths[i]
        true_w = vls.get(names[i])
        if w == 255 and true_w and true_w > 255:
            n_segs = (true_w + 251) // 252
            last_w = true_w - 252 * (n_segs - 1)
            merged = []
            for r in range(len(cols[i])):
                buf = b"".join(cols[i + k][r][:252]
                               for k in range(n_segs - 1))
                buf += cols[i + n_segs - 1][r][:last_w]
                merged.append(buf.rstrip(b" ").decode("latin-1"))
            out_names.append(names[i])
            out_widths.append(true_w)
            out_fmts.append(fmts[i])
            out_cols.append(merged)
            i += n_segs
        else:
            if w > 0:
                out_cols.append([b[:w].rstrip(b" ").decode("latin-1")
                                 for b in cols[i]])
            else:
                out_cols.append(cols[i])
            out_names.append(names[i])
            out_widths.append(w)
            out_fmts.append(fmts[i])
            i += 1
    return out_names, out_widths, out_fmts, out_cols


def read_sav_frame(path: str) -> pd.DataFrame:
    """Parse a .sav file into a DataFrame (pyreadstat-shaped output:
    numeric → float64 with NaN for sysmis, strings → str, DATE* /
    DATETIME formats → datetime64)."""
    with open(path, "rb") as f:
        data = f.read()
    names, widths, fmts, cols = _read_sav(data)
    out = {}
    for name, w, fmt, col in zip(names, widths, fmts, cols):
        if w > 0:
            out[name] = pd.Series(col, dtype=object)
        elif fmt in _DATE_TYPES or fmt in _DATETIME_TYPES:
            vals = [
                (pd.NaT if (isinstance(v, float) and np.isnan(v))
                 else _GREGORIAN + datetime.timedelta(seconds=v))
                for v in col]
            if fmt in _DATE_TYPES:
                # pyreadstat parity: DATE* formats come back as
                # datetime.date objects (so CSV round-trips render
                # them date-only), DATETIME as datetime64
                out[name] = pd.Series(
                    [v if v is pd.NaT else v.date() for v in vals],
                    dtype=object)
            else:
                out[name] = pd.Series(vals, dtype="datetime64[ns]")
        else:
            out[name] = pd.Series(col, dtype=np.float64)
    return pd.DataFrame(out)
