"""ES date-math expression parser.

Elasticsearch range queries on date fields accept expressions like
``"2024-01-08||+1w/w"`` or ``"now-7d/d"``: an anchor (ISO date/datetime
before ``||``, or the literal ``now``) followed by a chain of
``+N<unit>`` / ``-N<unit>`` arithmetic steps and ``/<unit>`` rounding
steps, applied LEFT TO RIGHT (rounding is not commutative with
arithmetic — ES applies them in written order).  Units: ``y`` years,
``M`` months, ``w`` weeks, ``d`` days, ``h``/``H`` hours, ``m``
minutes, ``s`` seconds.  ``/w`` rounds down to Monday (the same
week-start every other calendar surface in this engine uses).

``now`` is only honored when the caller injects a concrete ``now``
datetime — this engine refuses wall-clock reads so every query stays
deterministic and cross-engine reproducible (the same discipline as
the md5-variate random_score).

Reference behavior: ES common-options date-math; the reference repo
passes raw dates through to ES (apiserver search temporal filters) —
the parser itself is beyond-ref ES-parity surface.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

_ANCHOR_SPLIT = "||"
_STEP_RE = re.compile(r"([+\-/])(\d*)([yMwdhHms])")

_ISO_FORMATS = [
    "%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M", "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d", "%Y-%m", "%Y",
]


def _parse_anchor(text: str) -> datetime:
    for fmt in _ISO_FORMATS:
        try:
            return datetime.strptime(text, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable date-math anchor {text!r}")


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "y":
        return datetime(dt.year, 1, 1)
    if unit == "M":
        return datetime(dt.year, dt.month, 1)
    if unit == "w":  # Monday start, like date_trunc('week')
        d = datetime(dt.year, dt.month, dt.day)
        return d - timedelta(days=d.weekday())
    if unit == "d":
        return datetime(dt.year, dt.month, dt.day)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    return dt.replace(microsecond=0)  # "s"


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "y":
        return dt.replace(year=dt.year + n)
    if unit == "M":
        total = dt.year * 12 + (dt.month - 1) + n
        y, m = divmod(total, 12)
        # ES clamps the day into the target month (Jan 31 +1M -> Feb 28)
        day = min(dt.day, [31, 29 if y % 4 == 0 and
                           (y % 100 != 0 or y % 400 == 0) else 28,
                           31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m])
        return dt.replace(year=y, month=m + 1, day=day)
    span = {"w": timedelta(weeks=1), "d": timedelta(days=1),
            "h": timedelta(hours=1), "H": timedelta(hours=1),
            "m": timedelta(minutes=1), "s": timedelta(seconds=1)}[unit]
    return dt + n * span


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    """Resolve an ES date-math expression to a concrete datetime.

    ``now``-anchored expressions require the caller to inject ``now``
    (deterministic-engine contract); anchored forms never need it."""
    expr = expr.strip()
    if expr.startswith("now"):
        if now is None:
            raise ValueError(
                "date-math 'now' needs an injected now= anchor (this "
                "engine refuses wall-clock reads for determinism)")
        anchor, rest = now, expr[3:]
    elif _ANCHOR_SPLIT in expr:
        a, rest = expr.split(_ANCHOR_SPLIT, 1)
        anchor = _parse_anchor(a)
    else:
        return _parse_anchor(expr)
    pos = 0
    dt = anchor
    for m in _STEP_RE.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"malformed date-math steps {rest!r}")
        pos = m.end()
        op, n, unit = m.groups()
        if op == "/":
            if n:
                raise ValueError(f"rounding step takes no count: "
                                 f"/{n}{unit}")
            dt = _round_down(dt, unit)
        else:
            count = int(n) if n else 1
            dt = _add(dt, count if op == "+" else -count, unit)
    if pos != len(rest):
        raise ValueError(f"malformed date-math steps {rest!r}")
    return dt


def date_math_range(df, col: str, gte: str | None = None,
                    lt: str | None = None,
                    now: datetime | None = None):
    """ES range query on a date field with date-math bounds: gte
    inclusive, lt exclusive (the ES gte/lt pair).  Bounds resolve
    driver-side to literals, so the predicate is SARGABLE — it pushes
    to the parquet scan and prunes partitions/row groups on a
    time-partitioned table (the 100-TB hot path for temporal
    filters)."""
    from pyspark.sql import functions as F
    out = df
    if gte is not None:
        out = out.filter(F.col(col) >= F.lit(parse_date_math(gte, now)))
    if lt is not None:
        out = out.filter(F.col(col) < F.lit(parse_date_math(lt, now)))
    return out
