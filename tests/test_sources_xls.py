"""Excel 97 (.xls / BIFF8) reader — fixture bytes are built from the
published [MS-CFB]/[MS-XLS] specs by the writer below (independent of
the reader's code paths), covering: FAT chain walk, SST with a
CONTINUE split mid-string, RK/MULRK/NUMBER/LABEL/BOOLERR cells,
builtin + custom date formats, and the reference's single-sheet rule.
"""

import datetime
import struct

import pytest

from auctus_spark.sources_xls import (XlsError, parse_xls,
                                      xls_to_csv_text)

FREE = 0xFFFFFFFF
END = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _unistr(s: str) -> bytes:
    return struct.pack("<HB", len(s), 0) + s.encode("latin-1")


def _ole2(stream: bytes) -> bytes:
    """Wrap one 'Workbook' stream (padded past the 4096 mini cutoff)
    into a minimal v3 OLE2 container: sector 0 = FAT, 1 = directory,
    2.. = stream."""
    stream = stream + b"\0" * max(0, 4096 - len(stream))
    m = (len(stream) + 511) // 512
    stream = stream + b"\0" * (m * 512 - len(stream))
    fat = [FATSECT, END] + [3 + i for i in range(m - 1)] + [END]
    fat += [FREE] * (128 - len(fat))
    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x3E)    # minor
    struct.pack_into("<H", header, 26, 3)       # major (v3)
    struct.pack_into("<H", header, 28, 0xFFFE)  # byte order
    struct.pack_into("<H", header, 30, 9)       # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)       # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)       # 1 FAT sector
    struct.pack_into("<I", header, 48, 1)       # first dir sector
    struct.pack_into("<I", header, 56, 4096)    # mini cutoff
    struct.pack_into("<I", header, 60, END)     # no miniFAT
    struct.pack_into("<I", header, 68, END)     # no DIFAT
    difat = [0] + [FREE] * 108
    struct.pack_into("<109I", header, 76, *difat)

    def direntry(name, typ, start, size, child=FREE):
        e = bytearray(128)
        nm = name.encode("utf-16-le")
        e[:len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = typ
        struct.pack_into("<III", e, 68, FREE, FREE, child)  # l/r/child
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    directory = (direntry("Root Entry", 5, END, 0, child=1)
                 + direntry("Workbook", 2, 2, len(stream))
                 + bytes(128) + bytes(128))
    return (bytes(header)
            + struct.pack("<128I", *fat)
            + directory
            + stream)


def _biff8(n_sheets: int = 1, split_sst: bool = False) -> bytes:
    """Workbook stream: globals (DATEMODE, custom FORMAT, XFs, SST,
    BOUNDSHEETs) + one worksheet exercising every cell record."""
    sst_strings = ["name", "wideéstr"]  # second forced 16-bit
    s0 = _unistr(sst_strings[0])
    w = sst_strings[1]
    s1 = struct.pack("<HB", len(w), 1) + w.encode("utf-16-le")
    if split_sst:
        # split the SECOND string mid-characters across a CONTINUE;
        # the continuation restarts with its own option byte
        keep = 3  # chars of s1 kept in the SST record
        head = struct.pack("<HB", len(w), 1) + \
            w[:keep].encode("utf-16-le")
        cont = b"\x01" + w[keep:].encode("utf-16-le")
        sst_payloads = [struct.pack("<II", 3, 2) + s0 + head, cont]
    else:
        sst_payloads = [struct.pack("<II", 3, 2) + s0 + s1]

    globals_recs = [
        _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0)),
        _rec(0x0022, struct.pack("<H", 0)),               # DATEMODE 1900
        _rec(0x041E, struct.pack("<H", 164) + _unistr("yyyy-mm-dd")),
        _rec(0x00E0, struct.pack("<HH", 0, 0) + bytes(16)),    # xf0 gen
        _rec(0x00E0, struct.pack("<HH", 0, 164) + bytes(16)),  # xf1 date
        _rec(0x00E0, struct.pack("<HH", 0, 14) + bytes(16)),   # xf2 d/m/y
        _rec(0x00FC, sst_payloads[0]),
    ]
    if len(sst_payloads) > 1:
        globals_recs.append(_rec(0x003C, sst_payloads[1]))

    def sheet_bytes():
        recs = [
            _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010,
                                     0, 0, 0, 0)),
            _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0)),  # LABELSST
            _rec(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1)),
            _rec(0x0203, struct.pack("<HHHd", 1, 0, 0, 3.25)),  # NUMBER
            _rec(0x027E, struct.pack("<HHHI", 1, 1, 0,
                                     (42 << 2) | 2)),       # RK int
            _rec(0x027E, struct.pack("<HHHI", 1, 2, 0,
                                     (123456 << 2) | 3)),   # RK /100 int
            _rec(0x00BD, struct.pack("<HH", 2, 0)
                 + struct.pack("<HI", 0, (7 << 2) | 2)
                 + struct.pack("<HI", 0, (9 << 2) | 2)
                 + struct.pack("<H", 1)),                   # MULRK 2 cells
            _rec(0x0204, struct.pack("<HHH", 2, 2, 0)
                 + _unistr("inline")),                      # LABEL
            _rec(0x0205, struct.pack("<HHHBB", 3, 0, 0, 1, 0)),  # BOOL
            # date via builtin fmt 14 and via custom fmt 164
            _rec(0x0203, struct.pack("<HHHd", 3, 1, 2, 45000.0)),
            _rec(0x0203, struct.pack("<HHHd", 3, 2, 1, 45000.5)),
            _rec(0x000A, b""),
        ]
        return b"".join(recs)

    sheet = sheet_bytes()
    # BOUNDSHEET needs absolute sheet offsets: compute globals size
    # with placeholder BOUNDSHEETs first (their length is fixed)
    def boundsheet(pos, name):
        return _rec(0x0085, struct.pack("<IH", pos, 0)
                    + bytes([len(name), 0]) + name.encode("latin-1"))

    fixed = b"".join(globals_recs)
    bs_len = len(boundsheet(0, "Sheet1"))
    globals_len = len(fixed) + n_sheets * bs_len + len(_rec(0x000A, b""))
    parts = [fixed]
    for i in range(n_sheets):
        parts.append(boundsheet(globals_len + i * len(sheet),
                                f"Sheet{i + 1}"))
    parts.append(_rec(0x000A, b""))
    parts.extend([sheet] * n_sheets)
    return b"".join(parts)


@pytest.mark.parametrize("split_sst", [False, True])
def test_parse_xls_cells(split_sst):
    data = _ole2(_biff8(split_sst=split_sst))
    rows = parse_xls(data)
    assert rows[0][:2] == ["name", "wideéstr"]
    assert rows[1][0] == 3.25
    assert rows[1][1] == 42.0
    assert rows[1][2] == 1234.56
    assert rows[2][:3] == [7.0, 9.0, "inline"]
    assert rows[3][0] == 1
    # serial 45000 (1900 mode) = 2023-03-15; builtin + custom formats
    assert rows[3][1] == datetime.datetime(2023, 3, 15)
    assert rows[3][2] == datetime.datetime(2023, 3, 15, 12, 0)


def test_xls_to_csv_text_reference_parity():
    """excel97.py parity: ISO-8601 dates, %g numbers (no forced
    decimal point on integers)."""
    csv_text = xls_to_csv_text(_ole2(_biff8()))
    lines = csv_text.strip().splitlines()
    assert lines[0].startswith("name,wide")
    assert lines[1] == "3.25,42,1234.56"
    assert lines[3].split(",")[1] == "2023-03-15T00:00:00"
    assert lines[3].split(",")[2] == "2023-03-15T12:00:00"


def test_multi_sheet_refused():
    with pytest.raises(XlsError, match="2 sheets"):
        parse_xls(_ole2(_biff8(n_sheets=2)))


def test_read_any_xls_end_to_end(spark, tmp_path):
    from auctus_spark.sources import detect_format, read_any
    p = tmp_path / "t.xls"
    p.write_bytes(_ole2(_biff8()))
    assert detect_format(str(p))["format"] == "xls"
    df = read_any(spark, str(p))
    assert df.columns[0] == "name"
    rows = df.collect()
    assert rows[0][0] == "3.25"
    assert rows[0][1] == "42"
