"""Deterministic, oracle-exact streaming sketches: HyperLogLog
count-distinct and count-min frequency estimation.

At 10^12 turns, "distinct conversations per role/day" and "per-key
event frequency" cannot be answered with COUNT(DISTINCT)/groupBy at
interactive cost — the reference punts cardinality questions to the
downstream warehouse entirely (its pipeline is a relay,
docs/design/design.md:87-101). The Spark-native answer is a MERGEABLE
sketch: bounded-size per-group state whose merge is associative +
commutative (max for HLL registers, sum for CMS cells), so partial
sketches combine map-side, across partitions, AND across streaming
micro-batches through the exactly-once sink — the same algebra
Spark's own approx_count_distinct (HLL++) uses internally.

The twist that makes these ORACLE-EXACT (unlike approx_count_distinct,
whose sketch internals are engine-private): every hash is md5 over an
explicit string and every scalar formula is a SHARED SQL TEXT
(module constants below) evaluated by Spark via F.expr and by DuckDB
verbatim — identical bit patterns in, identical arithmetic out. The
estimate is still approximate with respect to the TRUE cardinality
(that's the point of a sketch); it is exact with respect to the
algorithm, so a value-hash comparison against the oracle closes.

Determinism notes (why the formula text is shaped this way):
- register terms are powers of two: power(2.0, 63 - r) is an exact
  double for r in [1, 63], summed as DECIMAL(38,0) (exact integers;
  a bigint sum could overflow at 256 * 2^62). rho is capped at 63 so
  the scaled term stays integral; the cap costs 2^-63 of accuracy.
- the only libm call is ln() in the linear-counting branch; both
  engines are correctly-rounded to well under the round(..., 4) the
  outputs carry.
- float summation order never matters: all double-valued expressions
  are per-ROW scalars or ratios of exact aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"

# -- shared scalar SQL (Spark F.expr == DuckDB verbatim) ---------------


def hex_pair_expr(hcol: str, pos: int = 1) -> str:
    """Value of two hex digits of ``hcol`` starting at 1-based ``pos``
    (0..255)."""
    return (
        f"(instr('{_HEX}', substr({hcol}, {pos}, 1)) - 1) * 16 + "
        f"(instr('{_HEX}', substr({hcol}, {pos + 1}, 1)) - 1)"
    )


def rho_expr(hcol: str) -> str:
    """Position (1-based) of the first set bit in the 64-bit tail
    (hex chars 3..18) of ``hcol``, capped at 63.

    Computed digit-wise so no engine-specific hex→int conversion is
    needed: z leading zero DIGITS via regexp, then the leading-zero
    BITS of the first non-zero nibble via a 4-way CASE."""
    tail = f"substr({hcol}, 3, 16)"
    z = f"length(regexp_extract({tail}, '^(0*)', 1))"
    d = f"substr({tail}, {z} + 1, 1)"
    nlz = (
        f"CASE WHEN {d} = '1' THEN 3 "
        f"WHEN {d} IN ('2', '3') THEN 2 "
        f"WHEN {d} IN ('4', '5', '6', '7') THEN 1 ELSE 0 END"
    )
    return (
        f"CASE WHEN {z} >= 16 THEN 63 "
        f"ELSE least(4 * {z} + ({nlz}) + 1, 63) END"
    )


# HLL estimate from per-group aggregates n (registers present) and
# s_scaled (SUM of 2^(63-r) as DECIMAL): raw estimate with the
# standard alpha_256 bias constant, linear counting below 2.5m when
# empty registers remain. m = 256 is baked into the text — the oracle
# must be the same algorithm, not a parameterized cousin.
HLL_EST_EXPR = (
    "round(CASE WHEN ((0.7213 / (1 + 1.079 / 256.0)) * 65536.0"
    " / ((256 - n) * 1.0 + CAST(s_scaled AS DOUBLE) / power(2.0, 63)))"
    " <= 640.0 AND (256 - n) > 0"
    " THEN 256.0 * ln(256.0 / (256 - n))"
    " ELSE ((0.7213 / (1 + 1.079 / 256.0)) * 65536.0"
    " / ((256 - n) * 1.0 + CAST(s_scaled AS DOUBLE) / power(2.0, 63)))"
    " END, 4)"
)


# -- HyperLogLog -------------------------------------------------------


def hll_registers(
    df: DataFrame, group_cols: list[str], item_col: str
) -> DataFrame:
    """Per-group HLL register table: (group..., bucket, r).

    bucket = first byte of md5(item), r = max over items of the
    first-set-bit position of the next 64 bits. ONE partial-aggregated
    shuffle on (group, bucket) — ≤256 rows per group regardless of
    item cardinality, and the table itself IS the mergeable sketch
    (merge = MAX per (group, bucket), idempotent + commutative, so
    replays and out-of-order partials cannot corrupt it)."""
    h = df.select(
        *group_cols, F.md5(F.col(item_col).cast("string")).alias("_h")
    )
    b = h.select(
        *group_cols,
        F.expr(hex_pair_expr("_h")).cast("int").alias("bucket"),
        F.expr(rho_expr("_h")).cast("int").alias("rho"),
    )
    return b.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("r"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a register table to (group..., est_distinct).

    est_distinct carries round(..., 4); the aggregates feeding it are
    exact (COUNT + DECIMAL sum of power-of-two terms), so the value is
    bit-identical across engines and partitionings."""
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr("CAST(power(2.0, 63 - r) AS DECIMAL(38,0))")
        ).alias("s_scaled"),
    )
    return agg.select(
        *group_cols, F.expr(HLL_EST_EXPR).alias("est_distinct")
    )


# -- equi-width histogram quantiles ------------------------------------

HIST_BINS = 128

# quantile estimate from per-group aggregates over the bin table,
# linearly interpolated inside the selected bin. Inputs: lo, span
# (scalars), n_total, and cum/cnt/bin of the FIRST bin whose running
# count reaches ceil(q * n_total). All scalar double math — no
# summation-order hazard — and the only narrowing is floor().
def hist_quantile_expr(q: str) -> str:
    """SQL text: interpolated value at quantile ``q`` given columns
    bin, cnt, cum (first bin reaching the rank), lo, span, n_total."""
    rank = f"ceil({q} * n_total)"
    frac = f"(({rank} - (cum - cnt)) * 1.0 / cnt)"
    return (
        f"round(lo + (bin + {frac}) * (span / {HIST_BINS}.0), 4)"
    )


def hist_bins(
    df: DataFrame, group_cols: list[str], value_col: str, lo: float, span: float
) -> DataFrame:
    """Equi-width histogram over ``[lo, lo + span)``: (group..., bin,
    cnt). ≤HIST_BINS rows per group at any input size; merge across
    partials/micro-batches = SUM per (group, bin) — same mergeable-
    sketch algebra as the CMS cells. Bounds are parameters (a prior
    scalar agg or domain knowledge) so the deposit is one pass."""
    b = F.least(
        F.lit(HIST_BINS - 1),
        F.floor((F.col(value_col) - F.lit(lo)) * HIST_BINS / F.lit(span)).cast("int"),
    ).alias("bin")
    return (
        df.select(*group_cols, b)
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    bins: DataFrame, group_cols: list[str], lo: float, span: float,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Collapse a bin table to per-group interpolated quantile
    estimates (one column per requested quantile, est_p50-style
    names). The rank scan is a running sum over ≤HIST_BINS rows per
    group — a bounded window, never a sort of the raw data."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_total", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    cum = cum.withColumn("lo", F.lit(lo)).withColumn("span", F.lit(span))
    outs = []
    for q in quantiles:
        name = f"est_p{int(q * 100)}"
        first = (
            cum.filter(F.col("cum") >= F.expr(f"ceil({q} * n_total)"))
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(*group_cols).orderBy("bin")
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(*group_cols, F.expr(hist_quantile_expr(str(q))).alias(name))
        )
        outs.append(first)
    res = outs[0]
    for o in outs[1:]:
        res = res.join(o, group_cols)
    return res


# -- count-min sketch --------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_build(
    df: DataFrame, key_col: str, weight_col: str | None = None
) -> DataFrame:
    """Count-min table (i, bucket, cnt): CMS_DEPTH independent rows of
    CMS_WIDTH counters; row i hashes key via md5(key || ':' || i).
    The table is d*w counters TOTAL (256 cells here) regardless of key
    cardinality; merge across partials/micro-batches = SUM per cell.
    Pre-aggregate per key first when keys repeat heavily — the deposit
    shuffle then carries |keys| * d rows, not |rows| * d."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    keyed = df.groupBy(key_col).agg(F.sum(w).cast("long").alias("_w"))
    rows = keyed.select(
        F.col(key_col).cast("string").alias("_k"),
        "_w",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("i"),
    ).select(
        "i",
        "_w",
        F.md5(F.concat(F.col("_k"), F.lit(":"), F.col("i").cast("string"))).alias("_h"),
    )
    cell = rows.select(
        "i",
        (F.expr(hex_pair_expr("_h")) % CMS_WIDTH).cast("int").alias("bucket"),
        "_w",
    )
    return cell.groupBy("i", "bucket").agg(F.sum("_w").alias("cnt"))


def cms_build_raw(df: DataFrame, key_col: str) -> DataFrame:
    """Count-min table built WITHOUT any per-key shuffle: every row
    deposits weight 1 into its d cells and the only exchange is the
    (i, bucket) partial aggregate — ≤d*w rows per map task regardless
    of input size OR key cardinality. This is the 10^12-row form:
    `cms_build` pre-aggregates per key first (cheaper when keys repeat
    heavily and a key shuffle is acceptable); this one never sees the
    key space at all."""
    rows = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("i"),
    ).select(
        "i",
        F.md5(F.concat(F.col("_k"), F.lit(":"), F.col("i").cast("string"))).alias("_h"),
    )
    cell = rows.select(
        "i", (F.expr(hex_pair_expr("_h")) % CMS_WIDTH).cast("int").alias("bucket")
    )
    return cell.groupBy("i", "bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cms_probe_rows(df: DataFrame, key_col: str, table: DataFrame) -> DataFrame:
    """Per-ROW CMS estimate with NO shuffle of ``df``: the d depth
    slices of the (256-cell) table broadcast into d map-side hash
    joins on the row's bucket columns; cms_est = least over depths.
    Unlike `cms_lookup` (which groups per distinct key — a key
    shuffle), this annotates rows in place, so a threshold filter on
    the estimate can drop the long tail BEFORE any exchange sees it."""
    hashed = df.select(
        "*",
        *[
            F.md5(
                F.concat(F.col(key_col).cast("string"), F.lit(":"), F.lit(str(i)))
            ).alias(f"_h{i}")
            for i in range(CMS_DEPTH)
        ],
    )
    bucketed = hashed.select(
        *df.columns,
        *[
            (F.expr(hex_pair_expr(f"_h{i}")) % CMS_WIDTH).cast("int").alias(f"_b{i}")
            for i in range(CMS_DEPTH)
        ],
    )
    out = bucketed
    for i in range(CMS_DEPTH):
        slice_i = table.filter(F.col("i") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("cnt").alias(f"_c{i}")
        )
        out = out.join(F.broadcast(slice_i), f"_b{i}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(CMS_DEPTH)]
    ).alias("cms_est")
    return out.select(*df.columns, est)


def cms_lookup(keys: DataFrame, table: DataFrame, key_col: str) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: the estimate is
    MIN over the d cells the key hashes to — an overestimate of the
    true count by construction (collisions only add). The 256-cell
    table is broadcast; the probe is a map-side join however many keys
    are queried."""
    probes = keys.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("i"),
    ).select(
        key_col,
        "i",
        F.md5(
            F.concat(F.col(key_col).cast("string"), F.lit(":"), F.col("i").cast("string"))
        ).alias("_h"),
    ).select(
        key_col,
        "i",
        (F.expr(hex_pair_expr("_h")) % CMS_WIDTH).cast("int").alias("bucket"),
    )
    j = probes.join(F.broadcast(table), ["i", "bucket"])
    return j.groupBy(key_col).agg(F.min("cnt").alias("cms_est"))
