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
