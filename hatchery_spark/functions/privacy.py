"""Differentially private count release — the two-sided geometric
(discrete Laplace) mechanism in exact integer arithmetic.

Per-sink aggregate counts are the pipeline's primary release surface
(the north rule's count-parity gate); when those counts describe user
activity, releasing them raw leaks membership. The geometric mechanism
(Ghosh, Roughgarden & Sundararajan, STOC'09 — the discrete, utility-
optimal Laplace analog) adds integer noise Z with

    P(Z = z) = (1-q)/(1+q) · q^|z|,   q = e^(-eps)

For eps = ln 2 (q = 1/2) the sample is constructible WITHOUT floats:
if G1, G2 are iid Geometric(1/2) on {0,1,2,...} (P(g) = 2^-(g+1)),
then Z = G1 − G2 has exactly the law above — and a Geometric(1/2)
draw is the count of leading 1-bits of a uniform bit string, here the
32-bit md5 prefix of the release cell's key. Everything is bit
arithmetic → the DuckDB oracle replays every noise draw exactly
(lpad(bin(h),32,'0') + strpos — both engines render bin() without
leading zeros, the HLL-oracle trick).

Privacy accounting: one turn contributes to exactly ONE (route, day)
cell, so the per-cell draws compose in parallel — the whole release is
eps = ln 2 DP for add/remove-one-turn neighbors. Noise keyed on the
CELL identity is deterministic per release (same key → same noise),
which is the correct posture for repeated publication of the same
cell: re-releasing never spends extra budget. The unclamped value may
go negative — clamping would be postprocessing (allowed) but is left
to consumers so the exhibit stays linear.

The catalog query also emits ``true_n`` so the driver can pin the
mechanism bit-for-bit; a REAL release drops that column — stated here
so nobody mistakes the exhibit for the release.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _geom_half(prefix: str, key: Column) -> Column:
    """Geometric(1/2) on {0,1,...,32}: leading 1-bits of the 32-bit md5
    prefix of ``prefix || key``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), key)), 1, 8), 16, 10
    ).cast("long")
    b = F.lpad(F.bin(h), 32, "0")
    pos = F.instr(b, "0")
    return (
        F.when(pos == 0, F.lit(32)).otherwise(pos - 1).cast("long")
    )


def geometric_noise(key: Column) -> Column:
    """Two-sided geometric noise (eps = ln 2), deterministic per key."""
    return (_geom_half("dpa-", key) - _geom_half("dpb-", key)).cast("long")


def _geom_half_sql(prefix: str, key_expr: str) -> str:
    digits = "0123456789abcdef"
    md5 = f"md5(concat('{prefix}', {key_expr}))"
    h = " + ".join(
        f"(strpos('{digits}', substr({md5}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    b = f"lpad(bin(cast({h} AS bigint)), 32, '0')"
    return (
        f"(CASE WHEN strpos({b}, '0') = 0 THEN 32"
        f" ELSE strpos({b}, '0') - 1 END)"
    )


def geometric_noise_sql(key_expr: str) -> str:
    """DuckDB replay of :func:`geometric_noise`, bit-for-bit."""
    return (
        f"({_geom_half_sql('dpa-', key_expr)}"
        f" - {_geom_half_sql('dpb-', key_expr)})"
    )
