"""Sources / sinks / format adapters — Spark-first equivalents of the
reference's materialization layer.

Reference: ``lib_materialize/datamart_materialize/detect.py`` (magic-
byte format detection, TSV delimiter sniffing, header-junk skipping,
pivoted-table detection) and the converter family (``excel.py``,
``parquet.py``, ``tsv.py``, ``pivot.py``, ``common.py``); CSV sampling
``lib_profiler/.../core.py:176-285`` (MAX_SIZE 5 MB, seed 89).

Detection reads a small local prefix of the file (driver-side, like
the reference); the LOAD is always a distributed ``spark.read``.
Every detected format has a real dependency-free codec: xls/xlsx via
the from-spec readers in ``sources_xls``/``sources_xlsx``, SPSS via
``sources_sav``, Stata via ``pandas.read_stata``.
"""

from __future__ import annotations

import csv as _csv
import io
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_SAMPLE_SIZE = 5 * 2**20   # reference core.py:35
SAMPLE_SEED = 89              # reference core.py:33
DELIMITERS = ",\t;|"          # reference detect.py


def detect_format(path: str) -> dict:
    """Magic-byte + sniffing detection (reference detect.py:25-193).
    Returns {format, separator?, skip_rows?, pivoted?}."""
    with open(path, "rb") as fp:
        magic = fp.read(16)
    if magic[:4] == b"PAR1":
        return {"format": "parquet"}
    if magic[:4] == b"PK\x03\x04":
        return {"format": "xlsx"}
    if magic[:8] == b"\xD0\xCF\x11\xE0\xA1\xB1\x1A\xE1":
        return {"format": "xls"}
    if magic[:11] == b"<stata_dta>":
        return {"format": "stata"}
    if magic[:4] in (b"\xC1\xE2\xC3\xC9", b"$FL2", b"$FL3"):
        return {"format": "spss"}
    if magic[:1] in (b"{", b"["):
        return {"format": "json"}

    out: dict = {"format": "csv", "separator": ","}
    with open(path, "r", errors="replace") as fp:
        sample = fp.read(65536)
        while sample.count("\n") < 3 and len(sample) < MAX_SAMPLE_SIZE:
            more = fp.read(65536)
            if not more:
                break
            sample += more
    if sample.count("\n") >= 3:
        try:
            dialect = _csv.Sniffer().sniff(sample, DELIMITERS)
            out["separator"] = dialect.delimiter
        except Exception:
            pass
    skip = count_rows_to_skip(io.StringIO(sample), out["separator"])
    if skip:
        out["skip_rows"] = skip
    lines = sample.splitlines()
    if len(lines) > skip:
        header = next(_csv.reader([lines[skip]],
                                  delimiter=out["separator"]))
        piv = pivoted_columns(header)
        if piv:
            out["pivoted"] = piv
    return out


def count_rows_to_skip(fp, sep: str = ",", max_skip: int = 6,
                       needed: int = 4) -> int:
    """Header-junk detection (reference core.py:135-173): skip up to 6
    title rows until ``needed`` consecutive rows have the same column
    count (> 1)."""
    rows = []
    reader = _csv.reader(fp, delimiter=sep)
    for i, row in enumerate(reader):
        rows.append(len(row))
        if i > max_skip + needed + 2:
            break
    for skip in range(0, min(max_skip, max(len(rows) - 1, 0)) + 1):
        window = rows[skip:skip + needed]
        if len(window) >= 2 and len(set(window)) == 1 and window[0] > 1:
            return skip
    return 0


_YEAR_RE = re.compile(r"^(19|20)\d\d$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}(-\d{2})?$")


def pivoted_columns(columns: list[str]) -> list[int] | None:
    """Pivoted-table detection (reference detect.py:147-191): >= 3
    columns whose names are dates or years → the unpivot candidates."""
    if len(columns) < 3:
        return None
    hits = [i for i, c in enumerate(columns)
            if _YEAR_RE.match(c.strip()) or _DATE_RE.match(c.strip())]
    return hits if len(hits) >= 3 else None


def _reference_csv_frame(pdf, date_format: str | None = None):
    """The reference's converter output discipline: floats through
    '%g' (no forced decimal point), datetimes rendered as the
    reference's CSV round-trip would.  ``date_format`` is the Stata
    converter's explicit '%Y-%m-%dT%H:%M:%S' (reference stata.py);
    SPSS passes None because the reference's spss.py gives
    ``to_csv`` no date_format, so pyreadstat datetimes serialize with
    the pandas default space separator and DATE columns (date objects)
    date-only."""
    import pandas as pd
    out = {}
    for c in pdf.columns:
        s = pdf[c]
        if str(s.dtype).startswith("datetime"):
            out[c] = (s.dt.strftime(date_format or "%Y-%m-%d %H:%M:%S")
                      .fillna(""))
        elif s.dtype.kind == "f":
            out[c] = s.map(lambda v: "" if pd.isna(v) else f"{v:g}")
        elif s.dtype == object:
            out[c] = s.map(lambda v: "" if pd.isna(v) else str(v))
        else:
            out[c] = s.astype(str)
    return pd.DataFrame(out)


_CONVERTED_TMP: list[str] = []


def _csv_sidecar(path: str, csv_text: str) -> str:
    """Write converted CSV text next to the source (same FS the
    executors read — a driver-local /tmp would be invisible to a real
    cluster).  The file must outlive the LAZY DataFrame built over it,
    so it is removed at interpreter exit, not eagerly."""
    import atexit
    import tempfile
    tmp = tempfile.NamedTemporaryFile(
        "w", suffix=".csv", delete=False,
        dir=os.path.dirname(path) or None)
    tmp.write(csv_text)
    tmp.close()
    if not _CONVERTED_TMP:
        atexit.register(_cleanup_converted)
    _CONVERTED_TMP.append(tmp.name)
    return tmp.name


def _cleanup_converted() -> None:
    for p in _CONVERTED_TMP:
        try:
            os.unlink(p)
        except OSError:
            pass
    _CONVERTED_TMP.clear()


def read_corpus_table(spark: SparkSession, ref: str) -> DataFrame:
    """Corpus input adapter for the build pipeline: ``ref`` is either
    a CATALOG TABLE NAME (e.g. an Iceberg table ``cat.db.repos`` on a
    cluster whose session carries the Iceberg runtime — see
    ``session.get_spark(iceberg_catalog=...)``) or a filesystem PATH
    (parquet).  Table names resolve through ``spark.table()``, so
    snapshot/format handling belongs to the catalog (Iceberg, Hive,
    temp views alike); the engine itself is storage-agnostic — it only
    needs the ``(repo, path, commit, lang, content)``-shaped rows."""
    if "/" not in ref and os.sep not in ref:
        try:
            if spark.catalog.tableExists(ref):
                return spark.table(ref)
        except Exception:
            pass
        if not os.path.exists(ref):
            raise ValueError(
                f"{ref!r} is neither a catalog table nor a path — "
                "register the table (or configure the Iceberg catalog "
                "via get_spark(iceberg_catalog=...)) or pass a "
                "parquet path")
    return spark.read.parquet(ref)


def read_any(spark: SparkSession, path: str, header: bool = True
             ) -> DataFrame:
    """Detect + load.  parquet/csv/tsv/json load natively; xls (Excel
    97 / BIFF8) via the from-spec pure-Python BIFF8/OLE2 reader in
    ``sources_xls``, xlsx via the pure-stdlib SpreadsheetML reader in
    ``sources_xlsx`` (reference excel97.py / excel.py parity: convert
    to CSV text, then the standard CSV path with header/junk
    handling); SPSS via the from-spec PSPP reader in ``sources_sav``
    and Stata via ``pandas.read_stata``, both through the reference
    converters' CSV string discipline (``_reference_csv_frame``)."""
    info = detect_format(path)
    fmt = info["format"]
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "xlsx":
        from .sources_xlsx import xlsx_to_csv_text
        return read_any(spark, _csv_sidecar(path, xlsx_to_csv_text(path)),
                        header=header)
    if fmt == "xls":
        from .sources_xls import xls_to_csv_text
        with open(path, "rb") as f:
            csv_text = xls_to_csv_text(f.read())
        return read_any(spark, _csv_sidecar(path, csv_text),
                        header=header)
    if fmt == "stata":
        # reference stata.py: pandas.read_stata → CSV (%g floats,
        # ISO-8601 T-separated dates — the one converter that passes
        # an explicit date_format); pandas' Stata reader is
        # dependency-free
        import pandas as pd
        pdf = pd.read_stata(path)
        return spark.createDataFrame(_reference_csv_frame(
            pdf, date_format="%Y-%m-%dT%H:%M:%S"))
    if fmt == "spss":
        from .sources_sav import read_sav_frame
        return spark.createDataFrame(_reference_csv_frame(
            read_sav_frame(path)))
    reader = (spark.read.option("header", header)
              .option("sep", info.get("separator", ",")))
    if info.get("skip_rows"):
        # Spark has no skipRows for csv: filter by line index via text
        # read + re-parse (still distributed)
        text = spark.read.text(path)
        from .ids import sequential_index
        body = (sequential_index(text, "_i")
                .filter(F.col("_i") >= info["skip_rows"])
                .drop("_i"))
        return (spark.read.option("header", header)
                .option("sep", info.get("separator", ","))
                .csv(body.rdd.map(lambda r: r.value)))
    return reader.csv(path)


def unpivot(df: DataFrame, id_cols: list[str], value_cols: list[str],
            var_name: str = "date", value_name: str = "value"
            ) -> DataFrame:
    """Melt (reference pivot.py via stack): wide date/year columns →
    long (id..., date, value)."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    expr = (f"stack({len(value_cols)}, {pairs}) "
            f"as (`{var_name}`, `{value_name}`)")
    return df.selectExpr(*[f"`{c}`" for c in id_cols], expr)


def sample_dataset(df: DataFrame, max_rows: int, seed: int = SAMPLE_SEED
                   ) -> DataFrame:
    """Bounded random sample (reference: 5 MB target via random row
    subset, seed 89)."""
    n = df.count()
    if n <= max_rows:
        return df
    return df.sample(fraction=max_rows / n, seed=seed)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_d3m_like(df: DataFrame, path: str) -> None:
    """D3M-dataset-style output (reference d3m.py): learningData.csv
    with a d3mIndex column.  :func:`write_d3m` adds the full
    datasetDoc.json."""
    from .ids import sequential_index
    with_idx = sequential_index(df, "d3mIndex")
    cols = ["d3mIndex"] + [c for c in df.columns]
    write_csv(with_idx.select(*cols).orderBy("d3mIndex"),
              os.path.join(path, "tables", "learningData.csv"),
              single_file=True)


# ---------------------------------------------------------------------
# D3M datasetDoc.json (MIT-LL data-supply schema)
# ---------------------------------------------------------------------
# Semantic-type URIs from the PUBLIC D3M / schema.org vocabulary
# (reference lib_profiler/datamart_profiler/types.py)
T_BOOLEAN = "http://schema.org/Boolean"
T_INTEGER = "http://schema.org/Integer"
T_FLOAT = "http://schema.org/Float"
T_TEXT = "http://schema.org/Text"
T_DATE_TIME = "http://schema.org/DateTime"
T_ID = "http://schema.org/identifier"
T_CATEGORICAL = \
    "https://metadata.datadrivendiscovery.org/types/CategoricalData"

_D3M_STRUCTURAL = {T_BOOLEAN: "boolean", T_INTEGER: "integer",
                   T_FLOAT: "real", T_TEXT: "string"}
D3M_VERSIONS = ("3.2.0", "4.0.0")


def d3m_metadata(dataset_id: str, metadata: dict,
                 version: str = "4.0.0",
                 need_d3mindex: bool = False) -> dict:
    """Full datasetDoc.json metadata (reference d3m.py:25-98 parity):
    column roles/types from structural + semantic types, about block
    with version map, 4.0.0 vs 3.2.0 resFormat shapes."""
    if version not in D3M_VERSIONS:
        raise ValueError(f"Unknown D3M schema version {version!r}")
    columns = metadata["columns"]
    if need_d3mindex and not any(c["name"] == "d3mIndex"
                                 for c in columns):
        columns = [{"name": "d3mIndex", "structural_type": T_INTEGER,
                    "semantic_types": [T_ID]}] + list(columns)
    d3m_columns = []
    for i, column in enumerate(columns):
        if T_BOOLEAN in column["semantic_types"]:
            col_type = "boolean"
        elif T_CATEGORICAL in column["semantic_types"]:
            col_type = "categorical"
        elif (column["structural_type"] == T_TEXT
                and T_DATE_TIME in column["semantic_types"]):
            col_type = "dateTime"
        else:
            col_type = _D3M_STRUCTURAL.get(column["structural_type"],
                                           "string")
        d3m_columns.append({
            "colIndex": i,
            "colName": column["name"],
            "colType": col_type,
            "role": ["index" if column["name"] == "d3mIndex"
                     else "attribute"],
        })
    meta = {
        "about": {
            "datasetID": dataset_id,
            "datasetName": metadata.get("name", dataset_id),
            "license": metadata.get("license", "unknown"),
            "datasetSchemaVersion": version,
            "redacted": False,
            "datasetVersion": "1.0",
        },
        "dataResources": [{
            "resID": "learningData",
            "resPath": "tables/learningData.csv",
            "resType": "table",
            "resFormat": ({"text/csv": ["csv"]} if version == "4.0.0"
                          else ["text/csv"]),
            "isCollection": False,
            "columns": d3m_columns,
        }],
    }
    if "description" in metadata:
        meta["about"]["description"] = metadata["description"]
    if "size" in metadata:
        meta["about"]["approximateSize"] = "%d B" % metadata["size"]
    if "qualities" in metadata:
        meta["qualities"] = metadata["qualities"]
    return meta


def _spark_structural_type(dtype: str) -> str:
    if dtype == "boolean":
        return T_BOOLEAN
    if dtype in ("tinyint", "smallint", "int", "bigint", "long"):
        return T_INTEGER
    if dtype in ("float", "double") or dtype.startswith("decimal"):
        return T_FLOAT
    return T_TEXT


def write_d3m(df: DataFrame, path: str, dataset_id: str,
              metadata: dict | None = None, version: str = "4.0.0",
              semantic_types: dict[str, list[str]] | None = None
              ) -> dict:
    """Complete D3M dataset output (reference d3m.py D3mWriter):
    ``tables/learningData.csv`` with a prepended d3mIndex plus
    ``datasetDoc.json`` (sort_keys, indent=2 — byte-parity with the
    reference's json.dump call).  Structural types derive from the
    Spark schema; per-column ``semantic_types`` override/annotate
    (e.g. categorical, dateTime)."""
    import json
    write_d3m_like(df, path)
    cols = [{"name": c,
             "structural_type": _spark_structural_type(t),
             "semantic_types": (semantic_types or {}).get(c, [])}
            for c, t in df.dtypes]
    meta = dict(metadata or {})
    meta["columns"] = cols
    doc = d3m_metadata(dataset_id, meta, version=version,
                       need_d3mindex=True)
    with open(os.path.join(path, "datasetDoc.json"), "w",
              encoding="utf-8", newline="") as fp:
        json.dump(doc, fp, sort_keys=True, indent=2)
    return doc
