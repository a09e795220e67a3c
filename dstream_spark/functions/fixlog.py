"""Cross-engine EXACT fixed-point log2 for positive integers.

The repo's float convention is "no transcendentals": ln/log/exp are
only ~1-ulp-accurate and their last bit differs between the JVM's
Math.log and DuckDB's libm, so a hash-gated oracle over log-derived
values would flake. Means, ranks, and sketches all dodge this with
integer arithmetic (exact-integer means, floored PageRank, 2^-rho HLL
registers). This module extends that discipline to logarithms, which
the LM-perplexity scorer genuinely needs.

`log2(n)` for integer n >= 1 decomposes into an exact exponent and a
mantissa refined by the classic SQUARING algorithm (de Lorenzo /
binary-digit extraction):

- e = floor(log2(n)) = length(bin(n)) - 1 — a string op, exact on
  both engines.
- m = n / 2^e in [1, 2) — division by a power of two, IEEE-exact for
  n < 2^53.
- each fractional BIT of log2(m): square m (IEEE multiplication is
  correctly rounded — bit-identical on every IEEE-754 engine); if the
  square >= 2 the bit is 1 and m halves (exact). 19 rounds give ~1e-6
  precision.

Every operation is either exact or correctly rounded with an exactly
representable result, so Spark and DuckDB produce BIT-IDENTICAL
fixed-point values by construction — not "close enough after
rounding". The result is an integer count of MICRO-BITS:
log2_micro(n) = e*1_000_000 + sum(bit_k * (1_000_000 >> k)). It is a
deterministic ~1e-6-precision approximation of log2 — both engines
compute the SAME approximation, which is what a hash gate needs.

Bounds: exact for n < 2^53 (the double mantissa); callers here hold
n <= corpus tokens + vocab, fine far past 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_LOG2_STEPS = 19  # 1_000_000 >> 20 == 0: step 20 cannot contribute
FP_SCALE = 1_000_000


def with_fp_log2(df: DataFrame, incol: str, out: str) -> DataFrame:
    """Append BIGINT column ``out`` = fixed-point log2(incol) in
    micro-bits. ``incol`` must be an integer column >= 1. The chain of
    withColumns keeps the plan linear (each Project feeds the next);
    all of it fuses into one whole-stage-codegen span."""
    e_c, x_c, f_c = f"__{out}_e", f"__{out}_x", f"__{out}_f"
    df = df.withColumn(e_c, (F.length(F.bin(F.col(incol))) - 1).cast("int"))
    df = df.withColumn(
        x_c,
        F.col(incol).cast("double")
        / F.expr(f"cast(shiftleft(1L, {e_c}) as double)"),
    )
    df = df.withColumn(f_c, F.lit(0).cast("long"))
    for k in range(1, FP_LOG2_STEPS + 1):
        w = FP_SCALE >> k
        df = df.withColumn(x_c, F.col(x_c) * F.col(x_c))
        df = df.withColumn(
            f_c,
            F.col(f_c)
            + F.when(F.col(x_c) >= 2.0, F.lit(w)).otherwise(F.lit(0)).cast("long"),
        )
        df = df.withColumn(
            x_c, F.when(F.col(x_c) >= 2.0, F.col(x_c) / 2.0).otherwise(F.col(x_c))
        )
    return df.withColumn(
        out, F.col(e_c).cast("long") * FP_SCALE + F.col(f_c)
    ).drop(e_c, x_c, f_c)


def fp_log2_sql(inner: str, incol: str, out: str) -> str:
    """DuckDB twin: wrap subquery text ``inner`` (which yields integer
    column ``incol`` >= 1) in the same squaring chain, yielding all of
    inner's columns plus BIGINT ``out``. The generated SQL is a linear
    nest of SELECTs — each step names the squared value once per use
    (textual duplication, same value), mirroring with_fp_log2 op for
    op so the two engines agree bit-for-bit."""
    q = (
        f"SELECT *, CAST(length(bin({incol})) - 1 AS INT) AS __e, "
        f"CAST({incol} AS DOUBLE) / CAST((1::BIGINT << (length(bin({incol})) - 1)) AS DOUBLE) AS __x0, "
        f"CAST(0 AS BIGINT) AS __f0 FROM ({inner})"
    )
    for k in range(1, FP_LOG2_STEPS + 1):
        w = FP_SCALE >> k
        p = k - 1
        q = (
            f"SELECT * EXCLUDE (__x{p}, __f{p}), "
            f"CASE WHEN __x{p}*__x{p} >= 2 THEN __x{p}*__x{p}/2 ELSE __x{p}*__x{p} END AS __x{k}, "
            f"__f{p} + CASE WHEN __x{p}*__x{p} >= 2 THEN {w} ELSE 0 END AS __f{k} "
            f"FROM ({q})"
        )
    return (
        f"SELECT * EXCLUDE (__e, __x{FP_LOG2_STEPS}, __f{FP_LOG2_STEPS}), "
        f"CAST(__e AS BIGINT)*{FP_SCALE} + __f{FP_LOG2_STEPS} AS {out} FROM ({q})"
    )
