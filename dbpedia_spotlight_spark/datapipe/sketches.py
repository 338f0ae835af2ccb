"""Deterministic cardinality sketches for corpus profiling — KMV
(k-minimum-values, Bar-Yossef et al. 2002, the bottom-k theta-sketch
family).

Why KMV and not HLL: Spark's built-in `approx_count_distinct` (HLL++) is
the right default at 100 TB, but its register layout is
implementation-defined, so no independent engine can reproduce the
estimate bit-for-bit. KMV is DETERMINISTIC given the hash function: the
sketch of a key group is exactly the k smallest distinct hash values of
its items, so a DuckDB oracle replaying the same hash reproduces the
estimate to the last bit — the sketch itself becomes hash-checkable,
which is this repo's correctness gate (`kmv_distinct` in
__spark_entry__.py). Estimator: (k-1) / normalized k-th minimum.

Hash choice: the first 12 hex chars (48 bits) of md5 — both engines
expose md5 over identical UTF-8 bytes, and every 48-bit integer is
exactly representable in float64, so the (h+1)/2^48 normalization and
the (k-1)/kth_min division are bit-identical IEEE ops on both sides
(same pattern as the winnowing / stratified-sampling oracles). At
production scale swap in xxhash64 — same plan shape, cheaper hash — at
the cost of the cross-engine replay property.

Scale shape: everything is built-in codegen expressions — hash, distinct,
per-key window top-k — one shuffle on the group key after a map-side
partial distinct. The sketch is MERGEABLE (union of two groups' sketches
= k smallest of the union), which is what makes bottom-k the standard
distributed-cardinality design; the same k-minimum representation also
yields set-operation estimates (the theta-sketch intersection below)
that plain HLL cannot give without inclusion-exclusion blowup.

Reference parity note: DBpedia Spotlight has no sketching — this extends
the training-data-pipeline operators (SURVEY.md §2.7): corpus-scale
distinct-token profiling and cross-corpus overlap estimation
(decontamination triage before the exact `decontaminate` pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = float(1 << 48)


def _int_hash(col):
    """48-bit md5 prefix as BIGINT — DuckDB twin:
    ('0x' || substr(md5(x), 1, 12))::BIGINT. Integer outputs hash-compare
    exactly; the (h+1)/2^48 normalization used inside the estimators is
    exact in float64 (48 < 53 mantissa bits)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
    ).cast("long")


def _unit(col):
    """Normalized (0, 1] hash; +1 keeps 0 out (a zero k-th minimum would
    divide by zero)."""
    return (col + F.lit(1.0)) / F.lit(_SCALE)


def _bottom_k_per_key(
    df: DataFrame, key_cols: list[str], h_col: str, k: int
) -> DataFrame:
    """Keep the k smallest h_col per key WITHOUT a single-partition global
    sort: stage 1 ranks within (key, physical input partition) — a window
    whose partitions are already distributed — keeping <= k rows per
    (key, partition); stage 2 ranks the survivors per key. Pruning is
    lossless (any global bottom-k row is bottom-k within its own
    partition), so the result is identical to the one-stage window while
    the per-key window only ever sees k x num_partitions rows. With no
    key_cols the same trick bounds a GLOBAL bottom-k, where a one-stage
    `Window.orderBy` would move the entire relation to one task."""
    pid = F.spark_partition_id()
    w_local = Window.partitionBy(*key_cols, pid).orderBy(F.asc(h_col))
    pruned = (
        df.withColumn("_lrank", F.row_number().over(w_local))
        .filter(F.col("_lrank") <= k)
        .drop("_lrank")
    )
    w_global = Window.partitionBy(*key_cols).orderBy(F.asc(h_col))
    return (
        pruned.withColumn("_rank", F.row_number().over(w_global))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def kmv_sketch(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-key KMV sketch -> (key_cols..., n_seen, kth_min, estimate).

    n_seen = number of distinct items actually retained (= min(k, true
    distinct count)); when n_seen < k the group is exact and estimate ==
    n_seen. Otherwise estimate = (k-1) / kth_min — the classic unbiased
    bottom-k estimator.

    Plan: distinct (map-side partial) -> partition-local bottom-k prune
    (no shuffle, bounds every key to k rows per input partition) -> one
    shuffle on key_cols -> per-key bottom-k + single-row agg. No collect,
    no UDF; at 100 TB swap in approx_count_distinct only if the oracle
    property is not needed.
    """
    hashed = (
        df.select(*key_cols, F.col(item_col).alias("_item"))
        .distinct()
        .withColumn("_h", _int_hash(F.col("_item")))
        .drop("_item")
        .distinct()  # md5-prefix collisions: KMV is defined on hash values
    )
    kept = _bottom_k_per_key(hashed, key_cols, "_h", k)
    return kept.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n_seen"),
        F.max("_h").alias("kth_min"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                F.lit(float(k - 1)) / _unit(F.max("_h"))
            ),
            4,
        ).alias("estimate"),
    )


def kmv_intersection(
    df_a: DataFrame,
    df_b: DataFrame,
    item_col: str,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch set-operation estimate from two KMV sketches: one row
    (theta, n_common, inter_estimate, jaccard_estimate).

    theta = min(kth_min_A, kth_min_B) — the shared sampling threshold;
    n_common = |{hashes below theta present in BOTH sketches}|; the
    intersection estimate is n_common / theta and the Jaccard estimate is
    n_common / |union sample below theta| (both standard theta-sketch
    estimators). All deterministic given the hash, hence oracle-checkable.

    Scale: each side reduces to <= k rows before the final broadcast-sized
    join — the cross-corpus decontamination TRIAGE: estimate overlap with
    two tiny sketches first, run the exact n-gram `decontaminate` join
    only on corpora the sketch flags."""
    def bottom_k(df: DataFrame, tag: str) -> DataFrame:
        hashed = (
            df.select(F.col(item_col).alias("_item"))
            .distinct()
            .select(_int_hash(F.col("_item")).alias(f"h_{tag}"))
            .distinct()
        )
        return _bottom_k_per_key(hashed, [], f"h_{tag}", k)

    a, b = bottom_k(df_a, "a"), bottom_k(df_b, "b")
    theta_a = a.agg(F.max("h_a").alias("ta"))
    theta_b = b.agg(F.max("h_b").alias("tb"))
    theta = F.broadcast(theta_a.crossJoin(theta_b)).select(
        F.least(F.col("ta"), F.col("tb")).alias("theta")
    )
    au = a.select(F.col("h_a").alias("h"))
    bu = b.select(F.col("h_b").alias("h"))
    both = au.intersect(bu)
    union = au.union(bu).distinct()
    counts = (
        both.crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("n_common"))
        .crossJoin(
            union.crossJoin(F.broadcast(theta))
            .filter(F.col("h") < F.col("theta"))
            .agg(F.count("*").alias("n_union"))
        )
        .crossJoin(F.broadcast(theta))
    )
    return counts.select(
        F.col("theta").cast("long").alias("theta"),
        F.col("n_common").cast("long").alias("n_common"),
        F.round(F.col("n_common") / _unit(F.col("theta") - 1), 4).alias(
            "inter_estimate"
        ),
        F.round(
            F.when(F.col("n_union") > 0, F.col("n_common") / F.col("n_union"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("jaccard_estimate"),
    )


def hll_registers(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-key HyperLogLog register table -> (key_cols..., bucket, register).

    Deterministic explicit-register HLL (Flajolet et al. 2007): unlike
    Spark's built-in `approx_count_distinct` (HLL++, register layout
    implementation-defined), the registers here are a plain DataFrame with
    a defined hash, so the SKETCH ITSELF is reproducible by any engine —
    the same argument that motivates `kmv_sketch` above, extended to the
    register-based family. Layout: 48-bit md5-prefix hash; low p bits pick
    the bucket (m = 2^p), the remaining 48-p bits w give the rank
    rho = (48-p) - floor(log2(w)) + 1 (= position of the leftmost 1-bit,
    (48-p)+1 when w == 0). floor(log2(w)) is computed EXACTLY as
    length(bin(w)) - 1 — both engines' `bin` emit minimal binary strings —
    so no float log is involved anywhere in the sketch.

    Registers are MERGEABLE: the registers of a union of groups are the
    element-wise max of the groups' registers (groupBy max is the merge),
    which is what makes HLL the standard 100-TB cardinality design — a
    2^p-row summary per key regardless of input size, one shuffle on
    (key, bucket) after map-side partial max.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    wbits = 48 - p
    h = _int_hash(F.col(item_col))
    w = F.shiftright(h, p)  # top 48-p bits (h is non-negative)
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(
            *key_cols,
            (h % F.lit(m)).cast("int").alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_estimate(
    registers: DataFrame, key_cols: list[str], p: int = 8
) -> DataFrame:
    """Registers -> per-key cardinality estimate
    (key_cols..., n_buckets_used, raw_estimate, estimate).

    raw_estimate = alpha_m * m^2 / Z with Z = sum(2^-register) over all m
    buckets (absent buckets contribute 2^0 = 1): every 2^-register term
    and their sum are exact in float64 (register <= 41, m terms), so the
    raw estimator is bit-reproducible. `estimate` applies the standard
    small-range linear-counting correction (E <= 2.5m and empty buckets
    exist -> m * ln(m / V0)); ln is the one transcendental, rounded to 4
    decimals like every float in the oracle-checked surface.
    """
    m = 1 << p
    # Flajolet's alpha_m for m >= 128; the same literal arithmetic runs in
    # the DuckDB twin, so the constant folds identically on both sides.
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n_buckets_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("_z_used"),
    )
    z = F.col("_z_used") + (F.lit(m) - F.col("n_buckets_used"))
    raw = F.lit(alpha * m * m) / z
    v0 = F.lit(m) - F.col("n_buckets_used")  # empty buckets
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v0)
    return agg.select(
        *key_cols,
        "n_buckets_used",
        F.round(raw, 4).alias("raw_estimate"),
        F.round(
            F.when((raw <= 2.5 * m) & (v0 > 0), lin).otherwise(raw), 4
        ).alias("estimate"),
    )


def cms_sketch(
    df: DataFrame, item_col: str, depth: int = 3, width: int = 64
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) ->
    (row_idx, col_idx, cell) — the depth x width counter table as rows.

    hash_i(x) = md5_48(i · US · x) mod width (US = \\x1f unit separator,
    the same keyed-hash convention as datapipe/kg_samples.py), so the
    sketch is deterministic and any engine replays it cell-for-cell.
    Built in ONE scan: each input row explodes into `depth` (row_idx,
    col_idx) pairs — a constant-factor map — then one groupBy over at
    most depth*width cells (map-side partial sums; the shuffle carries
    the CELL table, never the vocabulary, which is the whole point of
    CMS at 100 TB). Cells are MERGEABLE by addition across corpus shards.
    """
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                (
                    _int_hash(
                        F.concat_ws("\x1f", F.lit(str(i)), F.col(item_col))
                    )
                    % width
                )
                .cast("int")
                .alias("col_idx"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("rc"))
        .select("rc.row_idx", "rc.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.count("*").cast("long").alias("cell"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Point queries against a cms_sketch -> (item_col, cms_estimate).

    est(x) = min over rows i of cell[i, hash_i(x)] — an upper bound on the
    true count (CMS never undercounts), exact integers throughout. The
    candidate set is exploded to its depth probe cells and equi-joined to
    the (tiny, broadcast) cell table; missing cells count 0.
    """
    probes = items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        (
                            _int_hash(
                                F.concat_ws(
                                    "\x1f", F.lit(str(i)), F.col(item_col)
                                )
                            )
                            % width
                        )
                        .cast("int")
                        .alias("col_idx"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("item", "rc.row_idx", "rc.col_idx")
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
        .withColumn("cell", F.coalesce(F.col("cell"), F.lit(0)))
        .groupBy("item")
        .agg(F.min("cell").cast("long").alias("cms_estimate"))
        .withColumnRenamed("item", item_col)
    )


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT heavy hitters — every item occurring > n/k times — via the
    two-phase Misra-Gries design (Misra & Gries 1982; the distributed
    form in Agarwal et al., "Mergeable Summaries", PODS 2012).

    Phase 1 (one scan, bounded memory): each partition runs a batched
    Misra-Gries summary with k-1 counters over its rows — per Arrow
    batch, value_counts (vectorized) merge into the summary; when more
    than k-1 counters remain, the (k-1)-th largest count is subtracted
    from all and non-positive counters drop. MG guarantees every item
    with partition count > n_p/k survives; by pigeonhole, an item with
    GLOBAL count > n/k exceeds n_p/k in at least one partition, so the
    union of partition summaries is a superset of the true answer —
    regardless of how rows are partitioned.

    Phase 2 (exact verify): the candidate set (≤ (k-1) × n_partitions
    values, tiny) broadcast-semi-joins the input, one exact groupBy
    count restricted to candidates, filter cnt·k > n. Output is exact
    and partitioning-independent — which is what makes it oracle-
    checkable (`HAVING count(*)*k > total` in any engine).

    At 100 TB this is the standard shape: the full-column groupBy a naive
    top-k needs would shuffle every distinct value (vocabulary-sized);
    here the shuffle carries only candidate rows.
    """
    if k < 2:
        raise ValueError("k must be >= 2")

    from pyspark.sql import types as T

    src = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    # summary rows: item NULL carries the partition's row count, so ONE
    # scan yields both the candidate set and n — a separate count()
    # would re-read the full input (a third scan at 100 TB)
    out_schema = T.StructType(
        [
            T.StructField("item", T.StringType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )

    def _mg(batches):
        import pandas as pd

        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            vc = pdf["item"].value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k - 1:
                # batched decrement: drop everything at/below the
                # (k-1)-th largest count, subtracting it from the rest
                cuts = sorted(counters.values(), reverse=True)
                m = cuts[k - 1]
                counters = {
                    i: c - m for i, c in counters.items() if c - m > 0
                }
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "n_rows": [0] * len(counters) + [n_rows],
            }
        )

    summary = src.mapInPandas(_mg, out_schema).localCheckpoint(eager=True)
    candidates = F.broadcast(
        summary.filter(F.col("item").isNotNull()).select("item").distinct()
    )
    total = summary.agg(F.coalesce(F.sum("n_rows"), F.lit(0))).collect()[0][0]
    return (
        src.join(candidates, "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(total))
        .select("item", "cnt")
    )
