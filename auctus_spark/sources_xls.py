"""Minimal pure-stdlib Excel 97 (.xls / BIFF8) reader.

The reference converts .xls uploads to CSV via xlrd
(``lib_materialize/datamart_materialize/excel97.py``: single-sheet
workbooks only, date cells decoded to ISO-8601, numbers formatted
``{:g}`` to avoid forced decimal points).  This environment has no
xlrd/openpyxl, so this module implements the subset of the PUBLIC
format specs needed for that conversion from scratch:

- MS-CFB (OLE2 compound file): header, FAT chain walk, directory,
  mini-stream/miniFAT for streams under the 4096-byte cutoff.
- MS-XLS (BIFF8): globals substream (SST with CONTINUE splits,
  FORMAT/XF for date detection, DATEMODE, BOUNDSHEET), worksheet cell
  records (LABELSST, NUMBER, RK, MULRK, LABEL, BOOLERR, BLANK).

No xlrd code is used or copied — record layouts follow the published
[MS-XLS]/[MS-CFB] specifications.  Formulas are out of scope (the
cached-value record is read when present as a literal number).
"""

from __future__ import annotations

import datetime
import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE

# builtin number-format ids that render as dates/times ([MS-XLS] 2.4.126)
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(27, 37)) \
    | set(range(45, 48)) | set(range(50, 59))


class XlsError(ValueError):
    pass


# ---------------------------------------------------------------------
# MS-CFB container
# ---------------------------------------------------------------------

def _cfb_stream(data: bytes, name: str) -> bytes:
    """Extract a named stream from an OLE2 compound file."""
    if data[:8] != CFB_MAGIC:
        raise XlsError("not an OLE2 compound file")
    sect_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    ssz, msz = 1 << sect_shift, 1 << mini_shift
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        # [MS-CFB] 2.1: sector i starts at (i+1) << sectorShift — the
        # 512-byte header occupies (and v4 files zero-pad) sector -1.
        off = (i + 1) * ssz
        return data[off:off + ssz]

    # FAT sector list: 109 header DIFAT entries + DIFAT chain
    fat_sectors = [s for s in struct.unpack_from("<109I", data, 76)
                   if s != FREESECT]
    d = first_difat
    for _ in range(n_difat):
        if d in (FREESECT, ENDOFCHAIN):
            break
        body = sector(d)
        entries = struct.unpack(f"<{ssz // 4}I", body)
        fat_sectors.extend(s for s in entries[:-1] if s != FREESECT)
        d = entries[-1]
    fat: list[int] = []
    for s in fat_sectors:
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))

    def chain(start: int, size: int | None = None) -> bytes:
        out, s, guard = [], start, 0
        while s not in (ENDOFCHAIN, FREESECT):
            out.append(sector(s))
            s = fat[s]
            guard += 1
            if guard > len(fat) + 1:
                raise XlsError("FAT chain cycle")
        blob = b"".join(out)
        return blob if size is None else blob[:size]

    # directory
    dir_blob = chain(first_dir)
    entries = []
    for off in range(0, len(dir_blob) - 127, 128):
        e = dir_blob[off:off + 128]
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2:
            continue
        ename = e[:nlen - 2].decode("utf-16-le", errors="replace")
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        entries.append((ename, e[66], start, size))
    root = next(e for e in entries if e[1] == 5)
    target = next((e for e in entries
                   if e[1] == 2 and e[0].lower() == name.lower()), None)
    if target is None:
        raise XlsError(f"stream {name!r} not found "
                       f"(have {[e[0] for e in entries]})")
    _, _, start, size = target
    if size >= mini_cutoff:
        return chain(start, size)
    # mini stream: held in the root entry's chain, mapped by miniFAT
    mini_container = chain(root[2])
    minifat: list[int] = []
    s = first_minifat
    for _ in range(n_minifat):
        if s in (ENDOFCHAIN, FREESECT):
            break
        minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))
        s = fat[s]
    out, s, guard = [], start, 0
    while s not in (ENDOFCHAIN, FREESECT):
        out.append(mini_container[s * msz:(s + 1) * msz])
        s = minifat[s]
        guard += 1
        if guard > max(len(minifat), 1) + 1:
            raise XlsError("miniFAT chain cycle")
    return b"".join(out)[:size]


# ---------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------

def _records(stream: bytes):
    off = 0
    while off + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, off)
        yield rid, stream[off + 4:off + 4 + ln], off
        off += 4 + ln


def _rk_value(rk: int) -> float:
    cents = rk & 1
    if rk & 2:  # 30-bit signed integer
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
        v = float(v)
    else:       # top 30 bits of an IEEE double
        v = struct.unpack("<d", b"\0\0\0\0" +
                          struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if cents else v


def _parse_sst(chunks: list[bytes]) -> list[str]:
    """SST + CONTINUE records: strings may split across record
    boundaries, where a fresh option byte restarts the encoding."""
    if not chunks:
        return []
    bounds = []
    total = 0
    for c in chunks:
        total += len(c)
        bounds.append(total)
    blob = b"".join(chunks)
    pos = 8  # total & unique counts
    n_unique = struct.unpack_from("<I", blob, 4)[0]
    out: list[str] = []

    def boundary_between(a: int, b: int) -> int | None:
        for x in bounds[:-1]:
            if a <= x < b:
                return x
        return None

    while len(out) < n_unique and pos < len(blob):
        clen = struct.unpack_from("<H", blob, pos)[0]
        flags = blob[pos + 2]
        pos += 3
        rich = ext = 0
        if flags & 0x08:
            rich = struct.unpack_from("<H", blob, pos)[0]
            pos += 2
        if flags & 0x04:
            ext = struct.unpack_from("<I", blob, pos)[0]
            pos += 4
        parts: list[str] = []
        remaining = clen
        wide = bool(flags & 0x01)
        while remaining:
            unit = 2 if wide else 1
            nxt = boundary_between(pos, pos + remaining * unit)
            take = remaining if nxt is None else (nxt - pos) // unit
            raw = blob[pos:pos + take * unit]
            parts.append(raw.decode("utf-16-le" if wide else "latin-1"))
            pos += take * unit
            remaining -= take
            if remaining:
                # crossed into a CONTINUE: new option byte
                wide = bool(blob[pos] & 0x01)
                pos += 1
        out.append("".join(parts))
        pos += rich * 4 + ext
    return out


def _read_unicode_inline(payload: bytes, off: int) -> str:
    clen = struct.unpack_from("<H", payload, off)[0]
    flags = payload[off + 2]
    p = off + 3
    if flags & 0x01:
        return payload[p:p + clen * 2].decode("utf-16-le")
    return payload[p:p + clen].decode("latin-1")


def _is_date_format(fmt: str) -> bool:
    """Heuristic on the format string (custom formats): date/time
    pattern chars outside quoted/bracketed sections."""
    bare = []
    q = b = False
    for ch in fmt:
        if q:
            q = ch != '"'
            continue
        if b:
            b = ch != "]"
            continue
        if ch == '"':
            q = True
        elif ch == "[":
            b = True
        else:
            bare.append(ch.lower())
    s = "".join(bare)
    return any(c in s for c in "ymdhs") and "#" not in s and "0" not in s


def parse_xls(data: bytes) -> list[list]:
    """Parse BIFF8 bytes → rectangular rows (reference parity:
    single-sheet workbooks only; dates → datetime, numbers → float,
    text → str, booleans → int 1/0, blanks → '')."""
    wb = None
    for nm in ("Workbook", "Book"):
        try:
            wb = _cfb_stream(data, nm)
            break
        except XlsError as e:
            if "not found" not in str(e):
                raise
    if wb is None:
        raise XlsError("no Workbook stream")

    # globals substream
    sst: list[str] = []
    sst_chunks: list[bytes] = []
    in_sst = False
    xf_fmt: list[int] = []
    custom_date: set[int] = set()
    sheet_offsets: list[int] = []
    date1904 = False
    for rid, payload, off in _records(wb):
        if rid == 0x00FC:                   # SST
            sst_chunks = [payload]
            in_sst = True
            continue
        if rid == 0x003C and in_sst:        # CONTINUE
            sst_chunks.append(payload)
            continue
        in_sst = False
        if rid == 0x0085:                   # BOUNDSHEET
            sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
        elif rid == 0x00E0:                 # XF
            xf_fmt.append(struct.unpack_from("<H", payload, 2)[0])
        elif rid == 0x041E:                 # FORMAT (custom)
            ifmt = struct.unpack_from("<H", payload, 0)[0]
            if _is_date_format(_read_unicode_inline(payload, 2)):
                custom_date.add(ifmt)
        elif rid == 0x0022:                 # DATEMODE
            date1904 = bool(struct.unpack_from("<H", payload, 0)[0])
        elif rid == 0x000A:                 # EOF of globals
            break
    sst = _parse_sst(sst_chunks)
    if len(sheet_offsets) != 1:
        # reference behavior: refuse multi-sheet workbooks
        # (excel97.py raises UnsupportedConversion)
        raise XlsError(
            f"Excel workbook has {len(sheet_offsets)} sheets")

    def xf_is_date(xf: int) -> bool:
        if xf >= len(xf_fmt):
            return False
        ifmt = xf_fmt[xf]
        return ifmt in _BUILTIN_DATE_FMTS or ifmt in custom_date

    def to_date(serial: float):
        if date1904:
            epoch = datetime.datetime(1904, 1, 1)
        else:
            epoch = datetime.datetime(1899, 12, 30)
        return epoch + datetime.timedelta(days=serial)

    cells: dict[tuple[int, int], object] = {}

    def put_num(row, col, xf, v):
        cells[(row, col)] = to_date(v) if xf_is_date(xf) else v

    for rid, payload, off in _records(wb[sheet_offsets[0]:]):
        if rid == 0x000A:                   # EOF of the sheet
            break
        if rid == 0x00FD:                   # LABELSST
            row, col, xf, idx = struct.unpack_from("<HHHI", payload, 0)
            cells[(row, col)] = sst[idx] if idx < len(sst) else ""
        elif rid == 0x0203:                 # NUMBER
            row, col, xf = struct.unpack_from("<HHH", payload, 0)
            put_num(row, col, xf,
                    struct.unpack_from("<d", payload, 6)[0])
        elif rid == 0x027E:                 # RK
            row, col, xf = struct.unpack_from("<HHH", payload, 0)
            put_num(row, col, xf,
                    _rk_value(struct.unpack_from("<I", payload, 6)[0]))
        elif rid == 0x00BD:                 # MULRK
            row, col0 = struct.unpack_from("<HH", payload, 0)
            n = (len(payload) - 6) // 6
            for i in range(n):
                xf, rk = struct.unpack_from("<HI", payload, 4 + i * 6)
                put_num(row, col0 + i, xf, _rk_value(rk))
        elif rid == 0x0204:                 # LABEL (inline)
            row, col, xf = struct.unpack_from("<HHH", payload, 0)
            cells[(row, col)] = _read_unicode_inline(payload, 6)
        elif rid == 0x0205:                 # BOOLERR
            row, col, xf, val, is_err = struct.unpack_from(
                "<HHHBB", payload, 0)
            cells[(row, col)] = "" if is_err else int(val)
        # BLANK/MULBLANK/ROW/others: nothing to record

    if not cells:
        return []
    nrows = max(r for r, _ in cells) + 1
    ncols = max(c for _, c in cells) + 1
    return [[cells.get((r, c), "") for c in range(ncols)]
            for r in range(nrows)]


def xls_to_csv_text(data: bytes) -> str:
    """Reference-parity conversion (excel97.py xls_to_csv): dates →
    ISO-8601, numbers → '{:g}' (no forced decimal point on ints)."""
    import csv
    import io
    out = io.StringIO()
    w = csv.writer(out)
    for row in parse_xls(data):
        vals = []
        for v in row:
            if isinstance(v, datetime.datetime):
                vals.append(v.isoformat())
            elif isinstance(v, float):
                vals.append("{0:g}".format(v))
            else:
                vals.append(v)
        w.writerow(vals)
    return out.getvalue()
