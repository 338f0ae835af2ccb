#!/usr/bin/env python
"""Measure what the space-filling-curve layouts actually buy: file-level
zone-map prunability of box predicates under three physical layouts of
the same 2-D table — hash-scattered (baseline), Morton/Z-order
(`write_zordered`), and Hilbert (`with_hilbert_key` + the same
range-partitioned sorted write).

Method: write N_ROWS of deterministic (x, y, payload) rows to
`n_files` parquet files per layout, read every file's parquet footer
min/max statistics for x and y (pyarrow — exactly the zone maps
Spark/Iceberg/Delta data skipping consults), and for a grid of square
box predicates count the files whose [min, max] envelopes intersect
the box — the files a stats-based planner must touch. Fewer touched
files = better multi-dimensional clustering. This is the measurement
behind the layout-key operators' 100-TB claim: at cluster scale,
"files touched" is the scan cost.

Prints ONE JSON line:
  {"n_files": F, "n_rows": N, "box": W,
   "files_touched": {"unsorted": avg, "zorder": avg, "hilbert": avg}}

Run:  python scripts/layout_prune_probe.py [--rows 200000] [--files 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from dbpedia_spotlight_spark.session import get_spark  # noqa: E402
from dbpedia_spotlight_spark.functions.zorder import (  # noqa: E402
    with_hilbert_key,
    write_zordered,
)


def file_stats(path: str, cols: tuple[str, str]):
    """[(min_x, max_x, min_y, max_y)] per parquet data file."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name_c = col.path_in_schema
                if name_c in cols and col.statistics is not None:
                    s = col.statistics
                    if lo[name_c] is None or s.min < lo[name_c]:
                        lo[name_c] = s.min
                    if hi[name_c] is None or s.max > hi[name_c]:
                        hi[name_c] = s.max
        out.append((lo[cols[0]], hi[cols[0]], lo[cols[1]], hi[cols[1]]))
    return out


def touched(stats, x0, x1, y0, y1) -> int:
    return sum(
        1
        for (xl, xh, yl, yh) in stats
        if xl is not None and xl <= x1 and xh >= x0 and yl <= y1 and yh >= y0
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=200_000)
    p.add_argument("--files", type=int, default=64)
    p.add_argument("--bits", type=int, default=10)
    p.add_argument("--box", type=int, default=64, help="box side length")
    args = p.parse_args(argv)

    spark = get_spark(app_name="layout-prune-probe")
    n = 1 << args.bits
    base = (
        spark.range(args.rows)
        .select(
            F.col("id"),
            (F.conv(F.substring(F.md5(F.concat(F.lit("x"), F.col("id"))),
                                1, 12), 16, 10).cast("long") % n).alias("x"),
            (F.conv(F.substring(F.md5(F.concat(F.lit("y"), F.col("id"))),
                                1, 12), 16, 10).cast("long") % n).alias("y"),
        )
    )

    tmp = tempfile.mkdtemp(prefix="layout_probe_")
    try:
        paths = {k: os.path.join(tmp, k) for k in ("unsorted", "zorder", "hilbert")}
        # baseline: hash-scattered (repartition on id = no spatial locality)
        base.repartition(args.files, "id").write.mode("overwrite").parquet(
            paths["unsorted"]
        )
        write_zordered(base, paths["zorder"], "x", "y", n_files=args.files, bits=args.bits)
        (
            with_hilbert_key(base, "x", "y", bits=args.bits)
            .repartitionByRange(args.files, "hilbert_key")
            .sortWithinPartitions("hilbert_key")
            .drop("hilbert_key")
            .write.mode("overwrite")
            .parquet(paths["hilbert"])
        )

        stats = {k: file_stats(v, ("x", "y")) for k, v in paths.items()}
        # probe grid: boxes tiling the space with stride 4*box
        results = {k: 0 for k in paths}
        n_boxes = 0
        step = args.box * 4
        for x0 in range(0, n - args.box, step):
            for y0 in range(0, n - args.box, step):
                n_boxes += 1
                for k in paths:
                    results[k] += touched(
                        stats[k], x0, x0 + args.box - 1, y0, y0 + args.box - 1
                    )
        print(
            json.dumps(
                {
                    "n_files": args.files,
                    "n_rows": args.rows,
                    "bits": args.bits,
                    "box": args.box,
                    "n_boxes": n_boxes,
                    "files_touched_avg": {
                        k: round(results[k] / n_boxes, 2) for k in results
                    },
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
