"""Minimal pure-stdlib .xlsx (SpreadsheetML / ECMA-376) reader.

The reference converts .xlsx via openpyxl (``lib_materialize/
datamart_materialize/excel.py``: single-sheet rule, dates → ISO-8601,
floats → '{:g}').  openpyxl is absent here; an .xlsx file is a ZIP of
XML parts (a PUBLIC ECMA standard), so this reads the needed subset
with ``zipfile`` + ``xml.etree``: workbook.xml (sheet list),
workbook.xml.rels (sheet part paths), sharedStrings.xml, styles.xml
(numFmt date detection), and the sheet's ``<c>`` cells with types
s/str/inlineStr/b/n/e, date1904 handling, and A1 column references.
"""

from __future__ import annotations

import datetime
import re
import zipfile
from xml.etree import ElementTree as ET

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
NS_R = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
        "relationships}")
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48))
_CELLREF = re.compile(r"([A-Z]+)([0-9]+)")


class XlsxError(ValueError):
    pass


def _col_index(ref: str) -> int:
    m = _CELLREF.match(ref)
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


# One shared heuristic for custom number formats, so the same workbook
# content is typed identically whether it arrives as .xls or .xlsx.
from .sources_xls import _is_date_format as _is_date_fmt


def parse_xlsx(path: str) -> list[list]:
    """→ rectangular rows; floats stay float, dates become datetime,
    shared/inline strings become str, booleans int 1/0."""
    z = zipfile.ZipFile(path)
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    sheets = wb.findall(f"{NS}sheets/{NS}sheet")
    if len(sheets) != 1:
        raise XlsxError(f"Excel workbook has {len(sheets)} sheets")
    date1904 = False
    pr = wb.find(f"{NS}workbookPr")
    if pr is not None and pr.get("date1904") in ("1", "true"):
        date1904 = True
    rid = sheets[0].get(f"{NS_R}id")
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    target = None
    for rel in rels:
        if rel.get("Id") == rid:
            target = rel.get("Target")
    if target is None:
        raise XlsxError("sheet relationship missing")
    if not target.startswith("/"):
        target = "xl/" + target
    else:
        target = target.lstrip("/")

    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in sst.findall(f"{NS}si"):
            shared.append("".join(t.text or ""
                                  for t in si.iter(f"{NS}t")))

    date_styles: set[int] = set()
    if "xl/styles.xml" in z.namelist():
        st = ET.fromstring(z.read("xl/styles.xml"))
        custom = {}
        for nf in st.iter(f"{NS}numFmt"):
            custom[int(nf.get("numFmtId"))] = nf.get("formatCode", "")
        xfs = st.find(f"{NS}cellXfs")
        if xfs is not None:
            for i, xf in enumerate(xfs.findall(f"{NS}xf")):
                fid = int(xf.get("numFmtId", "0"))
                if fid in _BUILTIN_DATE_FMTS or (
                        fid in custom and _is_date_fmt(custom[fid])):
                    date_styles.add(i)

    epoch = (datetime.datetime(1904, 1, 1) if date1904
             else datetime.datetime(1899, 12, 30))
    cells: dict[tuple[int, int], object] = {}
    sheet = ET.fromstring(z.read(target))
    for row in sheet.iter(f"{NS}row"):
        r = int(row.get("r", "0")) - 1
        next_col = 0
        for c in row.findall(f"{NS}c"):
            ref = c.get("r")
            col = _col_index(ref) if ref else next_col
            next_col = col + 1
            ctype = c.get("t", "n")
            v = c.find(f"{NS}v")
            if ctype == "inlineStr":
                is_el = c.find(f"{NS}is")
                cells[(r, col)] = "".join(
                    t.text or "" for t in is_el.iter(f"{NS}t")) \
                    if is_el is not None else ""
                continue
            if v is None or v.text is None:
                continue
            if ctype == "s":
                cells[(r, col)] = shared[int(v.text)]
            elif ctype == "str":
                cells[(r, col)] = v.text
            elif ctype == "b":
                cells[(r, col)] = int(v.text != "0")
            elif ctype == "e":
                cells[(r, col)] = ""
            else:  # numeric
                num = float(v.text)
                style = int(c.get("s", "-1"))
                if style in date_styles:
                    cells[(r, col)] = epoch + datetime.timedelta(
                        days=num)
                else:
                    cells[(r, col)] = num
    if not cells:
        return []
    nrows = max(r for r, _ in cells) + 1
    ncols = max(cc for _, cc in cells) + 1
    return [[cells.get((r, cc), "") for cc in range(ncols)]
            for r in range(nrows)]


def xlsx_to_csv_text(path: str) -> str:
    """Reference-parity conversion (excel.py xlsx_to_csv)."""
    import csv
    import io
    out = io.StringIO()
    w = csv.writer(out)
    for row in parse_xlsx(path):
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
