"""Sequence packing + stratified sampling — training-data assembly ops.

Two operators a 100-TB pretraining pipeline runs after cleaning/dedup:

  - sequence_pack: GPT-style concat-and-chunk. Conceptually concatenate
    every document's tokens in a deterministic global order and cut the
    stream into fixed-size chunks; emit one row per (chunk, contributing
    document span). No concatenation actually happens: each doc only
    needs the GLOBAL TOKEN OFFSET where it starts, which is a prefix sum
    — computed distributed (range partition -> per-partition sums -> one
    P-row collect of partition offsets), the same shape as
    operators/skew.py:dense_sorted_id. Everything else is per-row column
    math + one explode; no single-partition window anywhere.

  - stratified_sample: deterministic per-stratum Bernoulli sampling (the
    "domain mixing" knob: keep 100% of wiki, 10% of common-crawl, ...).
    The keep decision hashes the document id — reproducible across runs
    and cluster sizes, no RNG state — via the md5-bucket recipe that is
    bit-identical in Spark and DuckDB, so the op is oracle-checkable.

Reference scope note: the reference engine stops at corpus indexing
(index/.../TokenOccurrenceSource et al.); packing/mixing are the
SURVEY §2.8 "beyond the reference" training-data ops, same family as
datapipe/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbpedia_spotlight_spark.datapipe.textstats import token_count, words_col


def prefix_token_offsets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """-> docs + (n_tok, tok_offset): each document's whitespace token
    count and the number of stream tokens strictly before it in global
    `id_col` order.

    Distributed prefix sum: range-repartition on the order key, sum
    within each partition with a parallel window, then add per-partition
    offsets (one collect of P partial sums — the only driver-side data).
    Byte-identical to `sum(n) over (order by id rows unbounded preceding
    ... 1 preceding)` without funnelling the corpus through one task."""
    sess = docs.sparkSession
    if partitions is None:
        partitions = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = (
        docs.withColumn("n_tok", token_count(F.col(text_col)).cast("long"))
        .repartitionByRange(partitions, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = dict(
        parts.groupBy("_pid").agg(F.sum("n_tok").alias("s")).collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    offset_expr = (
        F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
                F.col("_pid"),
            ),
            F.lit(0),
        )
        if offsets
        else F.lit(0)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return parts.withColumn(
        "tok_offset",
        (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) + offset_expr).cast(
            "long"
        ),
    ).drop("_pid")


def sequence_pack(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_text: bool = True,
) -> DataFrame:
    """Concat-and-chunk packing at a fixed `budget` tokens per chunk.

    -> (chunk_id, doc_id, tok_start, n_tok_slice[, chunk_text]) — one row
    per (chunk, document span): document tokens [tok_start, tok_start +
    n_tok_slice) land in chunk `chunk_id`; a document longer than the
    remaining room spans multiple consecutive chunks. Grouping by
    chunk_id (order by doc_id) reassembles exactly `budget` tokens per
    chunk (except the tail).

    All per-row codegen after the prefix sum: first/last chunk ids from
    the global offset, one `sequence` explode for multi-chunk docs, and
    the text slice via slice+array_join (no Python)."""
    with_off = prefix_token_offsets(docs, id_col=id_col, text_col=text_col)
    b = F.lit(budget)
    first = (F.col("tok_offset") / b).cast("long")
    last = ((F.col("tok_offset") + F.col("n_tok") - 1) / b).cast("long")
    spans = (
        with_off.filter(F.col("n_tok") > 0)
        .withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .withColumn(
            "tok_start",
            F.greatest(F.col("chunk_id") * b - F.col("tok_offset"), F.lit(0)),
        )
        .withColumn(
            "n_tok_slice",
            (
                F.least(
                    (F.col("chunk_id") + 1) * b - F.col("tok_offset"),
                    F.col("n_tok"),
                )
                - F.col("tok_start")
            ).cast("long"),
        )
        .withColumn("tok_start", F.col("tok_start").cast("long"))
    )
    cols = ["chunk_id", id_col, "tok_start", "n_tok_slice"]
    if emit_text:
        spans = spans.withColumn(
            "chunk_text",
            F.array_join(
                F.slice(
                    words_col(F.col(text_col)),
                    F.col("tok_start").cast("int") + 1,
                    F.col("n_tok_slice").cast("int"),
                ),
                " ",
            ),
        )
        cols.append("chunk_text")
    return spans.select(*cols)


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_text: bool = True,
) -> DataFrame:
    """Per-document sliding windows: cut each document into chunks of up to
    `max_tokens` whitespace tokens whose starts advance by `stride`
    (stride < max_tokens ⇒ overlapping windows, the long-document recipe
    for embedding models and pretraining context windows; stride defaults
    to max_tokens ⇒ disjoint chunks).

    -> (doc_id, chunk_idx, tok_start, n_tok_slice[, chunk_text]). Chunks
    stop once a window reaches the document's end (the last chunk may be
    short; no window fully contained in its predecessor is emitted); empty
    documents emit nothing.

    Unlike sequence_pack there is no global state at all — every row is
    independent, so the op is embarrassingly parallel at any scale: one
    `sequence` explode for the window starts and slice+array_join for the
    text, all codegen, no shuffle, no Python."""
    if stride is None:
        stride = max_tokens
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("max_tokens and stride must be positive")
    n = token_count(F.col(text_col)).cast("long")
    # 1 window when n <= max_tokens, else 1 + ceil((n - max_tokens)/stride)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(max_tokens)) / F.lit(stride)).cast("long")
    )
    spans = (
        docs.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn("tok_start", (F.col("chunk_idx") * F.lit(stride)).cast("long"))
        .withColumn(
            "n_tok_slice",
            F.least(F.lit(max_tokens), F.col("_n") - F.col("tok_start")).cast(
                "long"
            ),
        )
    )
    cols = [id_col, "chunk_idx", "tok_start", "n_tok_slice"]
    if emit_text:
        spans = spans.withColumn(
            "chunk_text",
            F.array_join(
                F.slice(
                    words_col(F.col(text_col)),
                    F.col("tok_start").cast("int") + 1,
                    F.col("n_tok_slice").cast("int"),
                ),
                " ",
            ),
        )
        cols.append("chunk_text")
    return spans.select(*cols)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep each row of stratum s with probability rates[s], decided by a
    deterministic hash of the row id (not an RNG): bucket =
    md5-tail-int(id) mod `buckets`, keep iff bucket < rate * buckets.
    Reproducible across runs, retries, and cluster sizes — the property
    that matters when a 100-TB mixing job is resumed — and exactly
    replayable in SQL (DuckDB computes the identical md5 buckets).
    Rows whose stratum is not in `rates` get `default_rate`."""
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 25, 8), 16, 10
        ).cast("long"),
        F.lit(buckets),
    )
    thresh = F.lit(int(default_rate * buckets))
    for s, r in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == s, F.lit(int(r * buckets))
        ).otherwise(thresh)
    return docs.filter(bucket < thresh)


def quota_sample(
    docs: DataFrame,
    quotas: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_quota: int = 0,
) -> DataFrame:
    """EXACT-quota stratified sampling: precisely quotas[s] rows from each
    stratum (all rows if the stratum is smaller), chosen as the lowest
    md5-rank ids — the fixed-token-budget counterpart to the rate-based
    `stratified_sample`. Deterministic across runs, retries and cluster
    sizes, and exactly replayable in SQL. One shuffle (the per-stratum
    rank window); at 100 TB strata are far larger than quotas, so prune
    first with `stratified_sample` at a rate ~2x the implied fraction and
    take exact quotas from the survivors."""
    from pyspark.sql import Window

    rank_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(id_col))
    quota = F.lit(default_quota)
    for s, q in sorted(quotas.items()):
        quota = F.when(F.col(stratum_col) == s, F.lit(q)).otherwise(quota)
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def temperature_quotas(
    docs: DataFrame,
    total: int,
    stratum_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-stratum quotas under temperature sampling (the multilingual
    mixing rule of mBERT/XLM-R/mT5: sample stratum d with probability
    proportional to (n_d/N)^alpha, alpha<1 upweighting the tail so small
    languages/domains are not drowned by the head). Quotas are
    apportioned to `total` by largest remainder (Hamilton method) with
    a deterministic (remainder desc, stratum asc) tie-break, and each
    quota is capped at the stratum's population. The quota sum equals
    `total` exactly whenever no stratum hits its cap; capped-off mass
    is NOT redistributed (exact water-filling is iterative — callers
    needing the full budget at caps should raise alpha or lower total),
    so the sum is a documented lower bound in that regime.

    -> (stratum_col, n_docs, quota). Combine with temperature_sample
    below, or feed the dict into quota_sample directly.

    Scale shape: ONE groupBy over the corpus produces the stratum dim;
    everything after (powers, normalization, largest-remainder ranks)
    runs on that tiny dim — the windows there partition a table whose
    row count is the number of strata, not documents.
    """
    if total < 0:
        raise ValueError("total must be >= 0")
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    wsum = Window.partitionBy()
    alloc = (
        counts.withColumn("_w", F.pow(F.col("n_docs"), F.lit(float(alpha))))
        .withColumn("_q", F.col("_w") / F.sum("_w").over(wsum) * F.lit(total))
        .withColumn("_fl", F.floor(F.least(F.col("_q"), F.col("n_docs"))))
        .withColumn("_rem", F.least(F.col("_q"), F.col("n_docs")) - F.col("_fl"))
    )
    give = F.lit(total) - F.sum("_fl").over(wsum)
    ranked = alloc.withColumn(
        "_rk",
        F.row_number().over(
            Window.orderBy(F.col("_rem").desc(), F.col(stratum_col).asc())
        ),
    ).withColumn(
        "quota",
        F.least(
            F.col("_fl")
            + F.when(F.col("_rk") <= give, F.lit(1)).otherwise(F.lit(0)),
            F.col("n_docs"),
        ).cast("long"),
    )
    return ranked.select(stratum_col, "n_docs", "quota")


def temperature_sample(
    docs: DataFrame,
    total: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Draw ~`total` documents under alpha-temperature mixing: quotas
    from temperature_quotas, members chosen as each stratum's lowest
    md5-rank ids (the quota_sample mechanism — deterministic across
    runs, retries, and cluster sizes, exactly replayable in SQL).
    The only driver-side data is the stratum-quota dim (one collect of
    #strata rows, broadcast back as a literal CASE chain)."""
    q = {
        r[0]: int(r[2])
        for r in temperature_quotas(
            docs, total, stratum_col=stratum_col, alpha=alpha
        ).collect()
    }
    return quota_sample(
        docs, q, stratum_col=stratum_col, id_col=id_col, default_quota=0
    )


def leakage_safe_split(
    docs: DataFrame,
    fractions: dict[str, float],
    group_col: str = "source",
    buckets: int = 10_000,
) -> DataFrame:
    """Group-aware train/validation/test assignment: every row whose
    `group_col` matches lands in the SAME split, so near-duplicate
    clusters, URL domains, or paraphrase families never straddle the
    train/eval boundary — the contamination mode that inflates benchmark
    scores (the reason dedup.decontaminate exists) applied at split
    time instead of after the fact.

    ``fractions`` maps split name -> fraction (must sum to <= 1; any
    remainder falls into the LAST split in sorted-name order, keeping
    the partition total). Assignment: bucket = md5-tail-int(group) mod
    `buckets`, split by cumulative thresholds over sorted names —
    deterministic, RNG-free, replayable in SQL (the stratified_sample
    hash scheme, hashed on the GROUP not the row id).

    -> docs + a `split` column. Scale shape: zero joins, zero shuffles —
    one codegen hash + CASE chain per row.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be >= 0")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("fractions must sum to <= 1")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(group_col).cast("string")), 25, 8), 16, 10
        ).cast("long"),
        F.lit(buckets),
    )
    names = sorted(fractions)
    # chained WHENs test in order, first match wins: ascending cumulative
    # thresholds give each name its contiguous bucket range
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        hi = int(round(acc * buckets))
        expr = (
            F.when(bucket < hi, F.lit(name))
            if expr is None
            else expr.when(bucket < hi, F.lit(name))
        )
    expr = (
        expr.otherwise(F.lit(names[-1])) if expr is not None
        else F.lit(names[-1])
    )
    return docs.withColumn("split", expr)


def priority_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res,
    IPL 2006): each row gets priority u^(1/w) for a uniform u, and the
    top-k priorities are the sample — the distribution-exact way to
    draw "10k docs, quality-score-weighted" that quota/temperature
    sampling (count-driven) cannot express. u is DETERMINISTIC:
    (md5-tail-24-bits + 0.5) / 2^24 — the stratified_sample hash
    scheme — so the draw replays across runs, retries, cluster sizes,
    and engines; we rank by the monotone-equivalent key ln(u)/w
    (descending), avoiding pow() while preserving the A-Res order.
    Rows with weight <= 0 or null are excluded (zero mass).

    With ``stratum_col``: top-k PER stratum (one window, partitioned).
    Without: a global top-k via per-partition prefilter — each input
    partition keeps its local top-k first, then one tiny window ranks
    the <= k * n_partitions survivors, so no single-partition pass over
    the corpus ever happens.

    -> the sampled input rows unchanged (plus nothing: the priority key
    is internal).
    """
    if k <= 0:
        raise ValueError("k must be >= 1")
    u = (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 25, 8),
                16,
                10,
            ).cast("long"),
            F.lit(1 << 24),
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 24))
    key = F.log(u) / F.col(weight_col).cast("double")
    cand = docs.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_pk", key)
    cols = docs.columns
    if stratum_col is not None:
        w = Window.partitionBy(stratum_col).orderBy(
            F.col("_pk").desc(), F.col(id_col).asc()
        )
        return (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(*cols)
        )
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("_pk").desc(), F.col(id_col).asc()
    )
    pruned = cand.withColumn("_ln", F.row_number().over(local)).filter(
        F.col("_ln") <= k
    )
    final = Window.orderBy(F.col("_pk").desc(), F.col(id_col).asc())
    return (
        pruned.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= k)
        .select(*cols)
    )


def blend_scores(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Percentile-normalized score blending — the mixing-desk step
    before priority_sample/quota_sample when quality signals live on
    incomparable scales (a perplexity, a length ratio, a classifier
    logit): each signal is mapped to its percent_rank (uniform on
    [0, 1] by construction), then combined as a weighted sum.
    Negative weights invert a signal ("low perplexity is good").

    ``weights``: column -> weight. -> docs + (<col>_pct ... , blended
    round 6). NULL signal values rank at the bottom of their column
    (they sort first), a deliberate "missing = worst" policy.

    Scale shape (r5 — no unpartitioned window anywhere): each signal's
    percent_rank is computed as a DISTRIBUTED global row_number via
    operators/skew.py:dense_sorted_id — range-repartition on the
    (signal, id) total order, row_number within each range partition
    (parallel windows), plus per-partition prefix offsets (one tiny
    P-row collect) — then pct = rn / (n-1). Byte-identical to
    `percent_rank() OVER (ORDER BY signal, id)` (the ordering is a
    total order, so percent_rank == (row_number-1)/(n-1)), but every
    stage is parallel: the old one-task global window became one range
    shuffle per signal. A constant (fully skewed) signal still
    balances, because the range keys include the unique id tie-break.
    Cost: one range shuffle + one persisted pass per signal and one
    count() of the input — the price of exact ranks at 10^12 rows.
    """
    if not weights:
        raise ValueError("blend_scores needs >= 1 weighted column")
    from dbpedia_spotlight_spark.operators.skew import dense_sorted_id

    n = docs.count()
    denom = float(max(n - 1, 1))
    out = docs
    blended = F.lit(0.0)
    for col, wt in sorted(weights.items()):
        out = dense_sorted_id(
            out,
            [F.col(col).asc_nulls_first(), F.col(id_col).asc()],
            "_blend_rn",
        )
        out = out.withColumn(
            f"{col}_pct", F.col("_blend_rn") / F.lit(denom)
        ).drop("_blend_rn")
        blended = blended + F.lit(float(wt)) * F.col(f"{col}_pct")
    return out.withColumn("blended", F.round(blended, 6))


def mixture_drift(
    docs: DataFrame,
    targets: dict[str, float],
    stratum_col: str = "source",
) -> DataFrame:
    """Mixture-drift check (Pearson chi-square decomposition): did the
    corpus you actually assembled match the mixture you specified?
    Per stratum: observed count, expected count (target fraction x
    total), and the chi-square contribution (obs-exp)²/exp — the
    monitoring twin of temperature_sample/quota_sample that catches a
    mis-sized shard before training does. Strata absent from
    ``targets`` get expected 0 and are reported with a NULL
    contribution (an UNPLANNED stratum — the worst drift of all —
    flagged rather than divided by zero).

    -> (stratum_col, observed, expected round 6, chi2 round 6).

    Scale shape: ONE groupBy over the corpus; everything else runs on
    the stratum dim.
    """
    if not targets:
        raise ValueError("mixture_drift needs >= 1 target")
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("observed"))
    total = F.sum("observed").over(Window.partitionBy())
    frac = F.lit(None).cast("double")
    for name, f in sorted(targets.items()):
        frac = F.when(F.col(stratum_col) == name, F.lit(float(f))).otherwise(
            frac
        )
    return (
        counts.withColumn("_exp", frac * total)
        .select(
            stratum_col,
            F.col("observed").cast("long").alias("observed"),
            F.round(F.coalesce(F.col("_exp"), F.lit(0.0)), 6)
            .alias("expected"),
            F.round(
                F.when(
                    F.col("_exp") > 0,
                    F.pow(F.col("observed") - F.col("_exp"), 2)
                    / F.col("_exp"),
                ),
                6,
            ).alias("chi2"),
        )
    )


def sft_pack(
    pairs: DataFrame,
    budget: int,
    id_col: str = "example_id",
    prompt_col: str = "prompt",
    completion_col: str = "completion",
) -> DataFrame:
    """SFT concat-and-chunk with LOSS MASKS: pack (prompt, completion)
    examples into fixed-`budget` token chunks exactly like
    sequence_pack, and emit each slice's completion-token intersection
    in CHUNK-LOCAL coordinates — the [loss_start, loss_end) span the
    trainer unmasks, so prompt tokens never take gradient and nothing
    is re-tokenized downstream (the packed-SFT recipe of every
    instruction-tuning stack).

    Example text = prompt ⊕ ' ' ⊕ completion (whitespace tokens); the
    completion occupies the example's token tail [n_prompt, n_tok).

    -> (chunk_id, example_id, chunk_pos, n_tok_slice, loss_start,
    loss_end): slice occupies chunk-local positions [chunk_pos,
    chunk_pos + n_tok_slice); loss_start == loss_end for prompt-only
    slices. Grouping by chunk_id reassembles `budget` tokens with
    per-token loss flags.

    Scale shape: identical to sequence_pack (distributed prefix sum,
    one sequence-explode, all integer codegen — cited there); the loss
    span adds four greatest/least expressions, no extra join or
    shuffle beyond the prompt-length column carried along.
    """
    docs = pairs.select(
        F.col(id_col),
        F.concat_ws(" ", F.col(prompt_col), F.col(completion_col)).alias(
            "text"
        ),
        token_count(F.col(prompt_col)).cast("long").alias("_np"),
    )
    with_off = prefix_token_offsets(docs, id_col=id_col, text_col="text")
    b = F.lit(budget)
    first = (F.col("tok_offset") / b).cast("long")
    last = ((F.col("tok_offset") + F.col("n_tok") - 1) / b).cast("long")
    spans = (
        with_off.filter(F.col("n_tok") > 0)
        .withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .withColumn(
            "tok_start",
            F.greatest(
                F.col("chunk_id") * b - F.col("tok_offset"), F.lit(0)
            ).cast("long"),
        )
        .withColumn(
            "_tok_end",
            F.least(
                (F.col("chunk_id") + 1) * b - F.col("tok_offset"),
                F.col("n_tok"),
            ).cast("long"),
        )
        .withColumn(
            "chunk_pos",
            (
                F.col("tok_offset") + F.col("tok_start")
                - F.col("chunk_id") * b
            ).cast("long"),
        )
    )
    # the completion is the example's token TAIL [np, n_tok), so a
    # slice's loss region is its own tail from the clamped intersection
    # start; a prompt-only slice clamps to its end (empty span).
    inter_lo = F.least(
        F.greatest(F.col("tok_start"), F.col("_np")), F.col("_tok_end")
    )
    return spans.select(
        "chunk_id",
        id_col,
        "chunk_pos",
        (F.col("_tok_end") - F.col("tok_start")).alias("n_tok_slice"),
        (F.col("chunk_pos") + inter_lo - F.col("tok_start")).alias(
            "loss_start"
        ),
        (
            F.col("chunk_pos") + F.col("_tok_end") - F.col("tok_start")
        ).alias("loss_end"),
    )


def harmonic_pack(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NO-SPLIT bin packing by harmonic classes (Lee & Lee, JACM '85 —
    the classic online bin-packing family): examples that must not
    cross chunk boundaries (contrastive pairs, strict instruction
    examples) are grouped into size classes k = floor(budget / len),
    and class-k bins hold EXACTLY k documents — so every bin total is
    <= k * (budget/k) = budget BY CONSTRUCTION, no overflow check, no
    sequential packer. The price vs sequence_pack's concat-and-split
    is bounded waste (the harmonic ~1.69x-OPT guarantee) instead of
    zero waste; the win is that no example is ever cut.

    Documents longer than `budget` are DROPPED (route them through
    chunk_documents first); empty documents are dropped.

    -> (bin_id, doc_id, slot, n_tok, bin_offset): slot = position in
    the bin (0..k-1), bin_offset = sum of earlier slots' tokens.
    bin_id = '<k>/<index>' — unique across classes.

    Scale shape: one token-count pass, ONE per-class rank window
    (keyed by the class — at most `budget` classes, each window
    partition-parallel), one per-bin cumsum window for offsets; pure
    integer arithmetic, no join, no collect, no driver state.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    base = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            token_count(F.col(text_col)).cast("long").alias("n_tok"),
        )
        .filter((F.col("n_tok") > 0) & (F.col("n_tok") <= budget))
        .withColumn("_k", F.floor(F.lit(budget) / F.col("n_tok")).cast("long"))
    )
    w = Window.partitionBy("_k").orderBy(F.col(id_col))
    ranked = base.withColumn("_r", F.row_number().over(w) - 1)
    placed = ranked.select(
        F.concat(
            F.col("_k"), F.lit("/"), (F.col("_r") / F.col("_k")).cast("long")
        ).alias("bin_id"),
        id_col,
        F.pmod(F.col("_r"), F.col("_k")).cast("long").alias("slot"),
        "n_tok",
    )
    wb = (
        Window.partitionBy("bin_id")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return placed.withColumn(
        "bin_offset", F.coalesce(F.sum("n_tok").over(wb), F.lit(0)).cast("long")
    )
