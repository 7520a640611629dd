""".xlsx reader — fixture built with zipfile + hand-written
SpreadsheetML parts (independent of the reader), covering shared and
inline strings, floats, booleans, builtin + custom date styles, the
single-sheet rule, and read_any end-to-end."""

import zipfile

import pytest

NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
NS_R = ('xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
        '2006/relationships"')


def _xlsx(path, n_sheets=1):
    wb_sheets = "".join(
        f'<sheet name="S{i}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i in range(n_sheets))
    rels = "".join(
        f'<Relationship Id="rId{i+1}" Type="http://schemas.'
        f'openxmlformats.org/officeDocument/2006/relationships/'
        f'worksheet" Target="worksheets/sheet{i+1}.xml"/>'
        for i in range(n_sheets))
    sheet = f"""<worksheet {NS}><sheetData>
<row r="1">
 <c r="A1" t="s"><v>0</v></c>
 <c r="B1" t="s"><v>1</v></c>
 <c r="C1" t="inlineStr"><is><t>inline</t></is></c>
</row>
<row r="2">
 <c r="A2"><v>3.25</v></c>
 <c r="B2"><v>42</v></c>
 <c r="C2" t="b"><v>1</v></c>
</row>
<row r="3">
 <c r="A3" s="1"><v>43831</v></c>
 <c r="B3" s="2"><v>43831.5</v></c>
 <c r="C3" t="str"><v>formula-str</v></c>
</row>
</sheetData></worksheet>"""
    z = zipfile.ZipFile(path, "w")
    z.writestr("[Content_Types].xml", f'<Types {NS}/>')
    z.writestr("xl/workbook.xml",
               f'<workbook {NS} {NS_R}><sheets>{wb_sheets}</sheets>'
               '</workbook>')
    z.writestr("xl/_rels/workbook.xml.rels",
               '<Relationships xmlns="http://schemas.openxmlformats.'
               f'org/package/2006/relationships">{rels}</Relationships>')
    z.writestr("xl/sharedStrings.xml",
               f'<sst {NS}><si><t>name</t></si>'
               '<si><r><t>two-</t></r><r><t>part</t></r></si></sst>')
    z.writestr("xl/styles.xml",
               f'<styleSheet {NS}>'
               '<numFmts><numFmt numFmtId="164" '
               'formatCode="yyyy\\-mm\\-dd hh:mm"/></numFmts>'
               '<cellXfs>'
               '<xf numFmtId="0"/><xf numFmtId="14"/>'
               '<xf numFmtId="164"/></cellXfs></styleSheet>')
    for i in range(n_sheets):
        z.writestr(f"xl/worksheets/sheet{i+1}.xml", sheet)
    z.close()


def test_parse_xlsx(tmp_path):
    import datetime

    from auctus_spark.sources_xlsx import parse_xlsx
    p = tmp_path / "t.xlsx"
    _xlsx(str(p))
    rows = parse_xlsx(str(p))
    assert rows[0] == ["name", "two-part", "inline"]
    assert rows[1] == [3.25, 42.0, 1]
    assert rows[2][0] == datetime.datetime(2020, 1, 1)
    assert rows[2][1] == datetime.datetime(2020, 1, 1, 12, 0)
    assert rows[2][2] == "formula-str"


def test_multi_sheet_refused(tmp_path):
    from auctus_spark.sources_xlsx import XlsxError, parse_xlsx
    p = tmp_path / "t.xlsx"
    _xlsx(str(p), n_sheets=2)
    with pytest.raises(XlsxError, match="2 sheets"):
        parse_xlsx(str(p))


def test_read_any_xlsx_end_to_end(spark, tmp_path):
    from auctus_spark.sources import detect_format, read_any
    p = tmp_path / "t.xlsx"
    _xlsx(str(p))
    assert detect_format(str(p))["format"] == "xlsx"
    df = read_any(spark, str(p))
    assert df.columns[:2] == ["name", "two-part"]
    rows = df.collect()
    assert rows[0][0] == "3.25"
    assert rows[0][1] == "42"
    assert rows[1][0] == "2020-01-01T00:00:00"
