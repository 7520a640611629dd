"""ES ingest pipelines as a declarative DataFrame transform compiler.

An ES ingest pipeline is a list of processors applied to every
document before indexing (``PUT _ingest/pipeline/...``).  Here each
processor compiles to built-in Spark column expressions — the whole
pipeline is ONE projection over one scan (whole-stage codegen, no
UDF, no shuffle), which is exactly how a 100-TB ingest should run.

Supported processors (the common core of ES's set):

- ``{"json": {"field", "target_field"}}``        — get_json_object map
  (``target_field`` receives ``field`` parsed as map<string,string>)
- ``{"set": {"field", "value"}}``                — literal assign
- ``{"rename": {"field", "target_field"}}``
- ``{"remove": {"field"}}``
- ``{"convert": {"field", "type"}}``             — int/long/double/
  float/string/boolean cast
- ``{"gsub": {"field", "pattern", "replacement"}}``
- ``{"lowercase"/"uppercase": {"field"}}``
- ``{"trim": {"field"}}``
- ``{"split": {"field", "separator"}}``          — to array<string>.
  Divergence: the separator is treated as a LITERAL string (ES's
  split processor separator is a Java regex) — a pipeline ported
  from ES with ``separator: "\\s+"`` must pre-escape or use gsub;
  same simplification class as the json/date processors below
- ``{"date": {"field", "target_field"}}``        — to timestamp
- ``{"grok": {"field", "pattern", "captures"}}`` — regexp named
  captures: ``captures`` maps new column -> 1-based group index
- ``{"dissect": {"field", "pattern"}}``          — ``%{name}`` between
  literal separators, compiled to the equivalent anchored regex
- ``{"enrich": {"lookup", "on", "fields"}}``     — ES enrich
  processor: broadcast-join a small lookup DataFrame on a key

Reference behavior: ES ingest pipeline processor semantics
(docs/reference/ingest/processors); the reference repo normalizes
columns imperatively in pandas — beyond-ref surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAST = {"integer": "int", "int": "int", "long": "long",
         "float": "float", "double": "double", "string": "string",
         "boolean": "boolean"}


def _dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile an ES dissect pattern ('%{a} - %{b}') to an anchored
    regex with one group per key; greedy-free ([^<next-sep-char>]*
    analog is overkill — non-greedy .*? between literal separators
    matches ES's left-to-right longest-separator walk for
    non-adjacent keys)."""
    parts = re.split(r"%\{([^}]*)\}", pattern)
    keys, rx = [], "^"
    for i, p in enumerate(parts):
        if i % 2 == 0:
            rx += re.escape(p)
        else:
            keys.append(p)
            rx += "(.*?)" if i < len(parts) - 1 else "(.*)"
    return rx + "$", keys


def ingest_pipeline(df: DataFrame, processors: list[dict],
                    lookups: dict[str, DataFrame] | None = None
                    ) -> DataFrame:
    """Apply an ES-style ingest pipeline (see module docstring).
    ``lookups`` supplies the enrich processors' named lookup tables;
    every lookup is broadcast (ES enrich indexes are replicated to
    every node — the same contract)."""
    out = df
    for proc in processors:
        if len(proc) != 1:
            raise ValueError(f"one processor type per entry: {proc}")
        (kind, p), = proc.items()
        f = p.get("field")
        if kind == "json":
            out = out.withColumn(
                p["target_field"],
                F.from_json(F.col(f), "map<string,string>"))
        elif kind == "set":
            out = out.withColumn(p["field"], F.lit(p["value"]))
        elif kind == "rename":
            out = out.withColumnRenamed(f, p["target_field"])
        elif kind == "remove":
            out = out.drop(f)
        elif kind == "convert":
            t = _CAST[p["type"]]
            out = out.withColumn(f, F.col(f).cast(t))
        elif kind == "gsub":
            out = out.withColumn(
                f, F.regexp_replace(F.col(f), p["pattern"],
                                    p["replacement"]))
        elif kind == "lowercase":
            out = out.withColumn(f, F.lower(F.col(f)))
        elif kind == "uppercase":
            out = out.withColumn(f, F.upper(F.col(f)))
        elif kind == "trim":
            out = out.withColumn(f, F.trim(F.col(f)))
        elif kind == "split":
            out = out.withColumn(
                f, F.split(F.col(f), re.escape(p["separator"])))
        elif kind == "date":
            out = out.withColumn(
                p.get("target_field", f), F.col(f).cast("timestamp"))
        elif kind == "grok":
            for name, grp in p["captures"].items():
                out = out.withColumn(
                    name, F.regexp_extract(F.col(f), p["pattern"],
                                           int(grp)))
        elif kind == "dissect":
            rx, keys = _dissect_to_regex(p["pattern"])
            for gi, name in enumerate(keys, start=1):
                out = out.withColumn(
                    name, F.regexp_extract(F.col(f), rx, gi))
        elif kind == "enrich":
            if not lookups or p["lookup"] not in lookups:
                raise ValueError(
                    f"enrich lookup {p['lookup']!r} not supplied")
            lk = lookups[p["lookup"]].select(
                F.col(p["on"]), *[F.col(c) for c in p["fields"]])
            out = out.join(F.broadcast(lk), p["on"], "left")
        else:
            raise ValueError(f"unknown processor {kind!r}")
    return out
