"""Z-order (Morton) keys — multi-dimensional locality for storage layout.

At 100 TB, min/max-zone data skipping only prunes on the leading sort
column; sorting by an interleaved-bit Morton key keeps BOTH dimensions
clustered, so predicates on either column prune files (the same idea as
Delta/Iceberg OPTIMIZE ZORDER — here as a plain column expression plus a
range-partitioned sorted write).

The key is pure integer arithmetic (shift/and/or), whole-stage codegen
in Spark and bit-for-bit replayable in DuckDB SQL — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` of two non-negative integer columns:
    bit i of x lands at 2i, bit i of y at 2i+1. Values are clipped to
    [0, 2^bits) by masking (callers quantize floats/ids first)."""
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical expression as engine-neutral SQL (for oracles and
    for pushing the layout key into external systems)."""
    mask = (1 << bits) - 1
    terms = []
    # every term fully parenthesized: PostgreSQL/DuckDB give all bitwise
    # operators EQUAL precedence (left-assoc), so `a | b << 2` parses as
    # `(a | b) << 2` there
    for i in range(bits):
        terms.append(f"(((({x} & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y} & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Materialize parquet laid out by Morton key: range-partition on
    the key (equal-size files via sampled range bounds — the same
    mechanism as a global sort, but we only need partition-level
    clustering) and sort within partitions, so per-file min/max zones
    are tight on BOTH x and y."""
    keyed = df.withColumn(
        "_zkey", zorder_key(F.col(x_col), F.col(y_col), bits)
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_col: str = "hilbert_key",
    bits: int = 8,
) -> DataFrame:
    """Append a Hilbert-curve distance key over two non-negative integer
    columns (clipped to [0, 2^bits) by masking, like `zorder_key`).

    Why a second space-filling curve next to Morton: the Hilbert curve
    has strictly better locality — every pair of consecutive key values
    is ADJACENT in the grid (no Z-shaped jumps across half the space),
    so range scans over the key touch ~25% fewer distinct tiles for the
    same selectivity; it is the layout Iceberg/Delta offer as the
    premium alternative to OPTIMIZE ZORDER. The classic iterative
    xy->d transform (one rotate-and-accumulate step per bit level, most
    significant first) runs as `bits` chained integer projections —
    shift/and/xor/CASE only, whole-stage codegen collapses the chain
    into one stage, and the identical staged arithmetic replays in any
    SQL engine (the oracle unrolls the same levels as CTE stages).

    The level-k step (s = 2^k): rx/ry = bit k of x/y; d += s^2 *
    ((3*rx) xor ry); then the quadrant rotation — if ry==0, flip both
    coords to (n-1 - v) when rx==1 and swap x/y.
    """
    n = 1 << bits
    mask = n - 1
    out = df.withColumn(
        "_hx", F.col(x_col).cast("long").bitwiseAND(F.lit(mask))
    ).withColumn(
        "_hy", F.col(y_col).cast("long").bitwiseAND(F.lit(mask))
    ).withColumn(key_col, F.lit(0).cast("long"))
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = F.shiftright(F.col("_hx"), k).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), k).bitwiseAND(F.lit(1))
        out = out.withColumn("_rx", rx).withColumn("_ry", ry)
        out = out.withColumn(
            key_col,
            F.col(key_col)
            + F.lit(s * s)
            * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")),
        )
        x_flip = F.when(
            F.col("_rx") == 1, F.lit(n - 1) - F.col("_hx")
        ).otherwise(F.col("_hx"))
        y_flip = F.when(
            F.col("_rx") == 1, F.lit(n - 1) - F.col("_hy")
        ).otherwise(F.col("_hy"))
        out = (
            out.withColumn(
                "_hx_next",
                F.when(F.col("_ry") == 0, y_flip).otherwise(F.col("_hx")),
            )
            .withColumn(
                "_hy_next",
                F.when(F.col("_ry") == 0, x_flip).otherwise(F.col("_hy")),
            )
            .drop("_hx", "_hy")
            .withColumnRenamed("_hx_next", "_hx")
            .withColumnRenamed("_hy_next", "_hy")
        )
    return out.drop("_hx", "_hy", "_rx", "_ry")


def hilbert_stage_sql(
    select_cols: str, source: str, bits: int = 8, key_col: str = "hilbert_key"
) -> str:
    """The identical Hilbert transform as engine-neutral staged-CTE SQL
    (for oracles / external systems): returns a `WITH h0 AS ..., hN AS
    ...` chain whose final stage exposes `select_cols` plus `key_col`.
    `source` must yield columns hx, hy (already masked) alongside
    select_cols. Every level uses level-suffixed column names (hx7,
    hy7, d7 -> hx6, ...) so no SELECT ever re-aliases a name it also
    reads — DuckDB's lateral column aliases would otherwise shadow the
    source column mid-expression. DuckDB note: xor(a, b) is the bigint
    XOR (the ^ operator is exponentiation there)."""
    n = 1 << bits
    stages = [
        f"h{bits} AS (SELECT {select_cols}, hx AS hx{bits}, "
        f"hy AS hy{bits}, 0 AS d{bits} FROM {source})"
    ]
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        p = k + 1
        rx = f"((hx{p} >> {k}) & 1)"
        ry = f"((hy{p} >> {k}) & 1)"
        x_flip = f"(CASE WHEN {rx} = 1 THEN {n - 1} - hx{p} ELSE hx{p} END)"
        y_flip = f"(CASE WHEN {rx} = 1 THEN {n - 1} - hy{p} ELSE hy{p} END)"
        stages.append(
            f"""h{k} AS (
  SELECT {select_cols},
         (CASE WHEN {ry} = 0 THEN {y_flip} ELSE hx{p} END) AS hx{k},
         (CASE WHEN {ry} = 0 THEN {x_flip} ELSE hy{p} END) AS hy{k},
         d{p} + {s * s} * xor(3 * {rx}, {ry}) AS d{k}
  FROM h{p}
)"""
        )
    stages.append(
        f"hfinal AS (SELECT {select_cols}, d0 AS {key_col} FROM h0)"
    )
    return "WITH " + ",\n".join(stages)
