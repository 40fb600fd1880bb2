"""Cross-engine-portable scalar expressions.

The correctness gate hashes query output values, so every float column
must be bit-identical between the Spark plan and the DuckDB oracle.
Native ``round`` differs between engines on exact decimal-boundary
doubles (Spark rounds the shortest decimal representation HALF_UP;
DuckDB rounds the raw binary double), so both sides use the same
explicit expression instead:

    floor(x * 10^d + 0.5) / 10^d

IEEE multiply/add/floor/divide are exactly specified, so identical
input doubles give identical output doubles in any engine. Residual
mismatch risk is only when the two engines' *upstream* accumulations
already differ near a boundary — the rounding grid is chosen orders of
magnitude above fp error to make that negligible.

Same trick for hashes: both engines have md5 over UTF-8 bytes, so a
64-bit portable hash is "take 15 hex digits of md5, parse base-16"
(15 hex digits = 60 bits, fits signed int64 exactly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def prnd(col: Column | str, digits: int) -> Column:
    """Portable round-half-up(ish): floor(x*10^d + 0.5)/10^d."""
    if isinstance(col, str):
        col = F.col(col)
    scale = F.lit(float(10**digits))
    return F.floor(col * scale + F.lit(0.5)) / scale


def o_rnd(expr: str, digits: int) -> str:
    """DuckDB SQL text equivalent of :func:`prnd`."""
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column via md5 hex digits."""
    if isinstance(col, str):
        col = F.col(col)
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def o_hash64(expr: str) -> str:
    """DuckDB SQL text equivalent of :func:`hash64`."""
    return f"CAST(('0x' || substr(md5(CAST(({expr}) AS VARCHAR)), 1, 15)) AS BIGINT)"
