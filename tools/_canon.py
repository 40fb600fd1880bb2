"""Driver-faithful canonicalization shared by the replay gates.

The round driver compares a Spark query and its DuckDB oracle by
round-tripping BOTH results through pandas (`DataFrame.toPandas()` /
`duckdb .df()`), sorting the frame, and hashing ``repr(round(v, 9))``
per value.  Round 4 proved the old `str(value)`-on-raw-fetch mirror is
blind to two hazard classes that only appear after the pandas hop:

- DuckDB HUGEINT (e.g. un-cast windowed ``sum(BIGINT)``) becomes
  float64 in pandas, so the driver hashes ``5248.0`` against Spark's
  ``5248`` and every row mismatches (q154, r4).
- list/array output columns make ``pandas.sort_values`` throw
  ``TypeError: unhashable type`` and the driver records ERR (q157, r4).

This module reproduces both behaviors: results are fetched as pandas
frames, a sort probe raises exactly where the driver would ERR, and the
value normalizer works on the pandas-level values (numpy scalars,
``datetime.date`` vs midnight ``Timestamp``) rather than raw rows.

Date columns arrive as ``datetime.date`` from Spark (Arrow) but as
midnight ``datetime64`` from DuckDB; driver-green history (every
indicator query emits a ``dt`` date) shows the driver treats these as
equal, so ``norm`` folds a midnight timestamp onto the date string.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def norm(v) -> str:
    """Canonical string for one pandas-level value."""
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "True" if v else "False"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(round(f, 9))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if hasattr(v, "isoformat"):
        # Spark NULL date -> None (handled above); DuckDB NULL date ->
        # NaT inside a datetime64 column.  q25 is driver-green with
        # null dates on both sides, so the driver unifies them.
        if v != v or str(v) == "NaT":
            return "NULL"
        s = v.isoformat()
        # Spark DATE -> datetime.date('2024-01-05'); DuckDB DATE ->
        # Timestamp('2024-01-05 00:00:00').  Fold midnight onto date.
        if s.endswith("T00:00:00"):
            return s[: -len("T00:00:00")]
        return s
    if isinstance(v, (list, np.ndarray)):
        # Unreachable when the sort probe ran first (it raises), but be
        # explicit: containers are a driver hazard, never canonical.
        raise TypeError(f"unsortable container value in result: {type(v)}")
    return str(v)


def sort_probe(pdf) -> None:
    """Raise exactly where the driver's frame sort would ERR."""
    cols = sorted(pdf.columns)
    pdf[cols].sort_values(by=cols)


def frame_hash(pdf) -> str:
    """Order-insensitive hash of the pandas frame's normalized rows."""
    cols = sorted(pdf.columns)
    sub = pdf[cols]
    lines = sorted(
        "|".join(norm(v) for v in row)
        for row in sub.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def frame_lines(pdf) -> list[str]:
    """Normalized row-strings (for FAIL diffing)."""
    cols = sorted(pdf.columns)
    sub = pdf[cols]
    return [
        "|".join(norm(v) for v in row)
        for row in sub.itertuples(index=False, name=None)
    ]


def compare_frames(spark_pdf, duck_pdf) -> tuple[str, str]:
    """(verdict, detail): verdict in PASS/FAIL/ERR, driver-faithful.

    Order of checks mirrors the driver: schema (column names), row
    count, sortability (ERR), then value hash.
    """
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        return "FAIL", f"cols spark={scols} duck={dcols}"
    if len(spark_pdf) != len(duck_pdf):
        return "FAIL", f"rows spark={len(spark_pdf)} duck={len(duck_pdf)}"
    try:
        sort_probe(spark_pdf)
        sort_probe(duck_pdf)
        sh, dh = frame_hash(spark_pdf), frame_hash(duck_pdf)
    except Exception as exc:  # the driver records this as ERR
        return "ERR", f"{type(exc).__name__}: {exc}"
    if sh != dh:
        return "FAIL", "hash mismatch"
    return "PASS", ""
