"""SPSS .sav reader — fixture bytes built from the published PSPP
"System File Format" spec by the independent writer below: header,
variable records (numeric with label + missing values, 12-char string
with a continuation element, DATE and DATETIME formats), a value-label
record pair, a type-7 extension (must be skipped), and both
uncompressed and bytecode-compressed case data (bias/literal/sysmis/
spaces opcodes)."""

import struct

import numpy as np
import pytest

SYSMIS = -1.7976931348623157e308


def _var_record(vtype, name, fmt_type=5, label=None, missing=0):
    fmt = (fmt_type << 16) | (8 << 8)
    rec = struct.pack("<iiiiii", 2, vtype, 1 if label else 0,
                      missing, fmt, fmt)
    rec += name.ljust(8)[:8].encode()
    if label:
        lb = label.encode()
        rec += struct.pack("<i", len(lb))
        rec += lb + b"\0" * ((4 - len(lb) % 4) % 4)
    rec += b"\0" * (8 * missing)
    return rec


def _sav(compressed: bool, n_cases: int = 3) -> bytes:
    head = b"$FL2" + b"@(#) test".ljust(60)
    head += struct.pack("<i", 2)            # layout
    head += struct.pack("<i", 4)            # case size: num + 2(str) + date
    head += struct.pack("<i", 1 if compressed else 0)
    head += struct.pack("<i", 0)            # weight
    head += struct.pack("<i", n_cases)
    head += struct.pack("<d", 100.0)        # bias
    head += b"01 Jan 26" + b"00:00:00" + b"fixture".ljust(64) + b"\0" * 3
    assert len(head) == 176

    recs = _var_record(0, "NUM", label="a number", missing=1)
    recs += _var_record(12, "NAME", fmt_type=1)
    recs += struct.pack("<iiiiii", 2, -1, 0, 0, 0, 0) + b" " * 8  # cont.
    recs += _var_record(0, "WHEN", fmt_type=22)     # DATETIME
    # value labels for NUM + var list
    recs += struct.pack("<ii", 3, 1) + struct.pack("<d", 1.0) \
        + bytes([3]) + b"one" + b" " * 4
    recs += struct.pack("<iii", 4, 1, 1)
    # type-7 extension to skip
    recs += struct.pack("<iiii", 7, 3, 1, 8) + b"ignored!"
    recs += struct.pack("<ii", 999, 0)

    # cases: (num, "ab"/"longerval"/" ", datetime secs)
    import datetime as _dt
    epoch_2020 = (_dt.datetime(2020, 1, 1)
                  - _dt.datetime(1582, 10, 14)).total_seconds()
    cases = [
        (1.0, b"ab".ljust(16), epoch_2020),
        (12.5, b"hello world!".ljust(16), epoch_2020 + 86400 + 3600),
        (None, b"".ljust(16), None),
    ]
    if not compressed:
        body = b""
        for num, s, when in cases:
            body += struct.pack("<d", SYSMIS if num is None else num)
            body += s
            body += struct.pack("<d", SYSMIS if when is None else when)
        return head + recs + body
    # bytecode: one command block is enough for 12 elements
    codes = []
    extra = []

    def emit_num(v):
        if v is None:
            codes.append(255)
        elif v == int(v) and 1 - 100 <= v - 0 and abs(v + 100) < 252 \
                and float(int(v + 100)) == v + 100 and 1 <= v + 100 <= 251:
            codes.append(int(v + 100))
        else:
            codes.append(253)
            extra.append(struct.pack("<d", v))

    for num, s, when in cases:
        emit_num(num)
        for i in range(2):
            chunk = s[i * 8:(i + 1) * 8]
            if chunk == b" " * 8:
                codes.append(254)
            else:
                codes.append(253)
                extra.append(chunk)
        emit_num(when)
    codes.append(252)
    body = b""
    ex = iter(extra)
    pending = []
    for c in codes:
        pending.append(c)
        if len(pending) == 8:
            body += bytes(pending)
            # literals for the 253s in this block follow the block
            body += b"".join(next(ex) for x in pending if x == 253)
            pending = []
    if pending:
        blk = pending + [0] * (8 - len(pending))
        body += bytes(blk)
        body += b"".join(next(ex) for x in pending if x == 253)
    return head + recs + body


@pytest.mark.parametrize("compressed", [False, True])
def test_read_sav(tmp_path, compressed):
    from auctus_spark.sources_sav import read_sav_frame
    p = tmp_path / "t.sav"
    p.write_bytes(_sav(compressed))
    df = read_sav_frame(str(p))
    assert list(df.columns) == ["NUM", "NAME", "WHEN"]
    assert df["NUM"].tolist()[:2] == [1.0, 12.5]
    assert np.isnan(df["NUM"].iloc[2])
    assert df["NAME"].tolist() == ["ab", "hello world!", ""]
    assert str(df["WHEN"].iloc[0]) == "2020-01-01 00:00:00"
    assert str(df["WHEN"].iloc[1]) == "2020-01-02 01:00:00"
    assert df["WHEN"].isna().iloc[2]


def test_read_any_sav_end_to_end(spark, tmp_path):
    from auctus_spark.sources import detect_format, read_any
    p = tmp_path / "t.sav"
    p.write_bytes(_sav(True))
    assert detect_format(str(p))["format"] == "spss"
    df = read_any(spark, str(p))
    rows = df.collect()
    assert rows[0]["NUM"] == "1"        # reference %g formatting
    assert rows[1]["NUM"] == "12.5"
    # reference spss.py passes NO date_format to to_csv → pandas
    # default space separator (the T-format is stata.py's only)
    assert rows[1]["WHEN"] == "2020-01-02 01:00:00"


def test_reference_csv_frame_spss_dates():
    """pyreadstat parity: SPSS DATE columns (date objects) render
    date-only, DATETIME with the pandas space separator, missing as
    empty string; Stata's explicit format keeps the T separator."""
    import datetime

    import numpy as np
    import pandas as pd

    from auctus_spark.sources import _reference_csv_frame
    pdf = pd.DataFrame({
        "d": pd.Series([datetime.date(2020, 1, 1), np.nan], dtype=object),
        "ts": pd.Series([pd.Timestamp("2020-01-01 12:00:00"), pd.NaT]),
    })
    got = _reference_csv_frame(pdf)
    assert got["d"].tolist() == ["2020-01-01", ""]
    assert got["ts"].tolist() == ["2020-01-01 12:00:00", ""]
    got_t = _reference_csv_frame(pdf, date_format="%Y-%m-%dT%H:%M:%S")
    assert got_t["ts"].tolist() == ["2020-01-01T12:00:00", ""]


def test_read_any_stata_end_to_end(spark, tmp_path):
    import pandas as pd

    from auctus_spark.sources import detect_format, read_any
    p = tmp_path / "t.dta"
    pd.DataFrame({"a": [1.0, 2.25], "b": ["x", "y"]}).to_stata(
        str(p), write_index=False, version=117)
    assert detect_format(str(p))["format"] == "stata"
    df = read_any(spark, str(p))
    rows = df.collect()
    assert rows[0]["a"] == "1" and rows[1]["a"] == "2.25"
    assert rows[0]["b"] == "x"


def _sav_vls() -> bytes:
    """Fixture with a very-long-string variable (W=300): two segments
    (255-wide carrying 252 content bytes + 48-wide remainder), the
    type-7 subtype-14 record mapping LONGSTR to its true width, and
    uncompressed cases — all per the PSPP spec."""
    head = b"$FL2" + b"@(#) vls".ljust(60)
    head += struct.pack("<i", 2)            # layout
    # case size: 1 numeric + 32 (seg1: 255-wide) + 6 (seg2: 48-wide)
    head += struct.pack("<i", 39)
    head += struct.pack("<i", 0)            # uncompressed
    head += struct.pack("<i", 0)            # weight
    head += struct.pack("<i", 2)            # n_cases
    head += struct.pack("<d", 100.0)
    head += b"01 Jan 26" + b"00:00:00" + b"vls".ljust(64) + b"\0" * 3
    assert len(head) == 176

    recs = _var_record(0, "NUM")
    recs += _var_record(255, "LONGSTR", fmt_type=1)
    for _ in range(31):                     # seg1 continuations
        recs += struct.pack("<iiiiii", 2, -1, 0, 0, 0, 0) + b" " * 8
    recs += _var_record(48, "LONGST_1", fmt_type=1)
    for _ in range(5):                      # seg2 continuations
        recs += struct.pack("<iiiiii", 2, -1, 0, 0, 0, 0) + b" " * 8
    vls = b"LONGSTR=00300\x00\t"
    recs += struct.pack("<iiii", 7, 14, 1, len(vls)) + vls
    recs += struct.pack("<ii", 999, 0)

    def seg_bytes(value: bytes) -> bytes:
        # segment 1: content bytes 0..251, padded to 256 (32 elements)
        # segment 2: content bytes 252..299, padded to 48 (6 elements)
        s1 = value[:252].ljust(256)
        s2 = value[252:300].ljust(48)
        return s1 + s2

    # v2 has spaces AT the segment boundary (positions 250-251) that
    # must survive the merge
    v1 = b"A" * 260
    v2 = b"b" * 250 + b"  c" + b"d" * 47
    assert len(v2) == 300
    body = struct.pack("<d", 1.0) + seg_bytes(v1.ljust(300))
    body += struct.pack("<d", 2.0) + seg_bytes(v2)
    return head + recs + body


def test_read_sav_very_long_string(tmp_path):
    from auctus_spark.sources_sav import read_sav_frame
    p = tmp_path / "vls.sav"
    p.write_bytes(_sav_vls())
    df = read_sav_frame(str(p))
    assert list(df.columns) == ["NUM", "LONGSTR"]
    assert df["NUM"].tolist() == [1.0, 2.0]
    assert df["LONGSTR"].iloc[0] == "A" * 260
    # interior spaces straddling the 252-byte segment cut are intact
    assert df["LONGSTR"].iloc[1] == "b" * 250 + "  c" + "d" * 47
