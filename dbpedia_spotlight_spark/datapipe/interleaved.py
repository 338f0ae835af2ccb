"""Operators over the north-rule interleaved document table.

The engine's input contract (BASELINE input_hint) is an Iceberg/parquet
table of interleaved text + media documents:

    (doc_id: string,
     spans:  array<struct<kind:string, text:string,
                          media_ref:string, offset:int>>)

where span ARRAY ORDER is the document order (the per-row invariant the
driver checks is span-sequence equality on (kind, text, media_ref,
order)). The annotate pipeline consumes this table; the operators here
are the table-level utilities a multimodal training pipeline needs
AROUND annotation: modality profiling, media-caption context harvesting,
token-budget packing that never splits a media span, and the
span-sequence diff that implements the invariant itself as a first-class
regression check between two pipeline versions.

Reference scope: the reference engine is text-only (its corpus sources
are TSV/XML text, core/src/main/scala/org/dbpedia/spotlight/io/*); the
interleaved schema and these operators are the SURVEY §2.8
"beyond the reference" multimodal axis, same family as
datapipe/multimodal.py (which handles the media PAYLOADS; this module
handles the SPAN STRUCTURE).

Scale shapes, per operator:

  - interleaved_stats: zero-shuffle — every signal is an array fold
    (`F.filter`/`F.aggregate`/`F.size`) over the spans column, pure
    whole-stage codegen, one map pass over the corpus.
  - media_context: one posexplode + one window partitioned by doc_id
    (per-document sequential semantics — exactly the partitioning the
    data demands; span counts per doc are bounded, so no skew).
  - pack_interleaved: the distributed prefix-sum of
    datapipe/packing.py generalized to per-span costs; media spans are
    ATOMIC (assigned whole to the chunk containing their start token),
    text spans split exactly at chunk boundaries. No single-partition
    window, no driver-side loop beyond the P-row partition-offset
    collect.
  - span_diff: one full-outer join on doc_id + one zip_with comparison
    of the two span arrays — per-row codegen after the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "flat_to_interleaved_multi",
    "interleaved_stats",
    "media_context",
    "pack_interleaved",
    "span_diff",
]

_KINDS = ["image", "audio", "video"]


def _text_span(txt: Column, off: Column) -> Column:
    return F.struct(
        F.lit("text").alias("kind"),
        txt.cast("string").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        off.cast("int").alias("offset"),
    )


def _media_span(kind: Column, ref: Column, off: Column) -> Column:
    return F.struct(
        kind.cast("string").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        ref.cast("string").alias("media_ref"),
        off.cast("int").alias("offset"),
    )


def flat_to_interleaved_multi(
    documents_flat: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Deterministic rich synthesizer: flat (doc_id, text) -> interleaved
    docs with up to TWO media spans of cycling kinds, so span-structure
    operators see mixed modalities and per-doc media multiplicity.

    Tokens split into thirds; docs with n >= 3 tokens become
        [text(t1), media(kind_a), text(t2), media(kind_b), text(t3)]
    with kind_a = _KINDS[doc_id % 3], kind_b = _KINDS[(doc_id+1) % 3]
    and media_ref "<kind>://<doc_id>/<ordinal>"; n == 2 degrades to the
    single-media form [text, media(kind_a), text]; n < 2 is one text
    span. Offsets are text-stream char offsets (media occupies no
    chars) — identical convention to
    operators/tokenizer.py:flat_to_interleaved_media, and every branch
    is plain list arithmetic so a SQL oracle replays it exactly."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    doc_id = F.col("doc_id").cast("string")
    kind_a = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id").cast("bigint") % 3 + 1).cast("int"),
    )
    kind_b = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        ((F.col("doc_id").cast("bigint") + 1) % 3 + 1).cast("int"),
    )
    ref_a = F.concat(kind_a, F.lit("://"), doc_id, F.lit("/0"))
    ref_b = F.concat(kind_b, F.lit("://"), doc_id, F.lit("/1"))

    # Three-way token split: sizes ceil(n/3), then ceil of the rest.
    k1 = F.ceil(n / F.lit(3)).cast("int")
    k2 = F.ceil((n - k1) / F.lit(2)).cast("int")
    t1 = F.concat_ws(" ", F.slice(toks, F.lit(1), k1))
    t2 = F.concat_ws(" ", F.slice(toks, k1 + 1, k2))
    t3 = F.concat_ws(" ", F.slice(toks, k1 + k2 + 1, n - k1 - k2))
    off2 = (F.length(t1) + 1).cast("int")
    off3 = (off2 + F.length(t2) + 1).cast("int")

    # n == 2 fallback: halves around one media span.
    h = F.ceil(n / F.lit(2)).cast("int")
    h1 = F.concat_ws(" ", F.slice(toks, F.lit(1), h))
    h2 = F.concat_ws(" ", F.slice(toks, h + 1, n - h))
    hoff = (F.length(h1) + 1).cast("int")

    spans = (
        F.when(
            n >= 3,
            F.array(
                _text_span(t1, F.lit(0)),
                _media_span(kind_a, ref_a, off2),
                _text_span(t2, off2),
                _media_span(kind_b, ref_b, off3),
                _text_span(t3, off3),
            ),
        )
        .when(
            n == 2,
            F.array(
                _text_span(h1, F.lit(0)),
                _media_span(kind_a, ref_a, hoff),
                _text_span(h2, hoff),
            ),
        )
        .otherwise(F.array(_text_span(F.col(text_col), F.lit(0))))
    )
    return documents_flat.select(doc_id.alias("doc_id"), spans.alias("spans"))


def interleaved_stats(documents: DataFrame) -> DataFrame:
    """Per-document modality profile of an interleaved table — the
    corpus-health rollup a multimodal pipeline reads before deciding
    mixing ratios (text-only share, media density, modality balance).

    -> (doc_id, n_spans, n_text, n_image, n_audio, n_video, text_chars,
        text_tokens, first_media_idx, media_ratio) where first_media_idx
    is the 0-based index of the first non-text span (NULL for text-only
    docs) and media_ratio = media spans / total spans rounded to 6.

    Zero shuffle: every column is an array fold over `spans` (F.filter
    + F.size, F.aggregate for the char/token sums) — whole-stage
    codegen, one map pass, no explode. At 10^12 docs this is the
    cheapest possible shape: scan + project."""
    spans = F.col("spans")

    def _count(kind: str) -> Column:
        return F.size(F.filter(spans, lambda s: s["kind"] == F.lit(kind)))

    texts = F.filter(spans, lambda s: s["kind"] == "text")
    text_chars = F.aggregate(
        texts,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
    )
    text_tokens = F.aggregate(
        texts,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(
            F.coalesce(F.length(F.trim(s["text"])), F.lit(0)) == 0, F.lit(0)
        ).otherwise(F.size(F.split(F.trim(s["text"]), r"\s+"))),
    )
    n_spans = F.size(spans)
    n_text = _count("text")
    # 0-based index of the first non-text span: count the all-text prefix
    # via a fold that stops growing at the first media span.
    prefix_text = F.aggregate(
        spans,
        F.struct(
            F.lit(0).alias("n"), F.lit(False).alias("stop")
        ),
        lambda acc, s: F.struct(
            F.when(
                acc["stop"] | (s["kind"] != "text"), acc["n"]
            ).otherwise(acc["n"] + 1).alias("n"),
            (acc["stop"] | (s["kind"] != "text")).alias("stop"),
        ),
    )
    first_media = F.when(
        n_spans > n_text, prefix_text["n"]
    ).cast("int")
    return documents.select(
        "doc_id",
        n_spans.alias("n_spans"),
        n_text.alias("n_text"),
        _count("image").alias("n_image"),
        _count("audio").alias("n_audio"),
        _count("video").alias("n_video"),
        text_chars.alias("text_chars"),
        text_tokens.alias("text_tokens"),
        first_media.alias("first_media_idx"),
        F.round((n_spans - n_text) / n_spans, 6).alias("media_ratio"),
    )


def media_context(
    documents: DataFrame, n_words: int = 8
) -> DataFrame:
    """Caption-context harvesting: for every media span, the trailing
    `n_words` words of the nearest PRECEDING text span and the leading
    `n_words` words of the nearest FOLLOWING text span — the standard
    weak-supervision signal for media-caption pairing in interleaved
    corpora (the text around an image is its best no-cost caption
    candidate).

    -> (doc_id, span_idx, kind, media_ref, before_text, after_text),
    one row per media span; before/after are NULL when no text span
    exists on that side. Nearest-text resolution is general (consecutive
    media spans share their flanking text; leading/trailing media get a
    NULL side) — not limited to strictly alternating layouts.

    Scale shape: one posexplode, then two window functions partitioned
    by doc_id ordered by span index (last(text, ignorenulls) looking
    back, first(text, ignorenulls) looking forward). Per-document
    sequential semantics demand exactly this partitioning; span counts
    per doc are bounded, so partitions stay balanced. The word slicing
    is slice/split column math — no UDF anywhere."""
    w_back = (
        Window.partitionBy("doc_id")
        .orderBy("span_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_fwd = (
        Window.partitionBy("doc_id")
        .orderBy("span_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    exploded = documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
        F.when(F.col("span.kind") == "text", F.col("span.text")).alias(
            "_txt"
        ),
    )
    before = F.last("_txt", ignorenulls=True).over(w_back)
    after = F.first("_txt", ignorenulls=True).over(w_fwd)
    # The windows must be materialized BEFORE the media filter (a window
    # evaluated after it would only see media rows); all slicing below
    # reads the materialized _b/_a columns.
    b_toks = F.split(F.trim(F.col("_b")), r"\s+")
    a_toks = F.split(F.trim(F.col("_a")), r"\s+")
    nw = F.lit(n_words)
    return (
        exploded.withColumn("_b", before)
        .withColumn("_a", after)
        .filter(F.col("kind") != "text")
        .select(
            "doc_id",
            "span_idx",
            "kind",
            "media_ref",
            F.when(
                F.length(F.trim(F.col("_b"))) > 0,
                F.concat_ws(
                    " ",
                    F.slice(
                        b_toks,
                        F.greatest(F.size(b_toks) - nw + 1, F.lit(1)),
                        F.least(F.size(b_toks), nw),
                    ),
                ),
            ).alias("before_text"),
            F.when(
                F.length(F.trim(F.col("_a"))) > 0,
                F.concat_ws(" ", F.slice(a_toks, F.lit(1), nw)),
            ).alias("after_text"),
        )
    )


def pack_interleaved(
    documents: DataFrame,
    budget: int,
    media_token_costs: dict[str, int] | None = None,
) -> DataFrame:
    """Multimodal concat-and-chunk packing: assign every span of every
    interleaved document to fixed-`budget` training chunks, where a text
    span costs its whitespace token count and a media span costs a fixed
    per-kind token budget (the "image = 576 tokens" convention of
    vision-language training). Media spans are ATOMIC — a media span
    whose token interval crosses a chunk boundary is assigned whole to
    the chunk containing its START token (chunks absorb the overflow;
    stream offsets are unaffected, so the assignment stays pure column
    math). Text spans split exactly at chunk boundaries, one output row
    per (chunk, text slice).

    -> (chunk_id, doc_id, span_idx, kind, media_ref, tok_start,
        n_tok_slice): text rows carry the slice [tok_start, tok_start +
    n_tok_slice) of the span's own tokens; media rows carry tok_start=0
    and their full cost. Grouping by chunk_id and ordering by (doc_id,
    span_idx, tok_start) reassembles each chunk's span sequence in
    document order — the span-sequence invariant survives packing.

    Default costs: image 576, audio 1500, video 7200, any other kind 1.

    Scale shape: per-span costs fold inside the row (F.transform /
    F.aggregate), the global doc offset is the distributed prefix sum of
    datapipe/packing.py:prefix_token_offsets (range partition ->
    partition sums -> P-row collect), and span offsets ride a zip_with
    running sum within the row. The only explode is text spans into the
    1..ceil(cost/budget) chunks they overlap. No single-partition
    window, no driver loop."""
    costs = {"image": 576, "audio": 1500, "video": 7200}
    if media_token_costs:
        costs.update(media_token_costs)
    cost_map = F.create_map(
        *[F.lit(x) for kv in costs.items() for x in kv]
    )

    def span_cost(s: Column) -> Column:
        txt = F.trim(F.coalesce(s["text"], F.lit("")))
        n_txt = F.when(F.length(txt) == 0, F.lit(0)).otherwise(
            F.size(F.split(txt, r"\s+"))
        )
        return (
            F.when(s["kind"] == "text", n_txt)
            .otherwise(
                F.coalesce(F.element_at(cost_map, s["kind"]), F.lit(1))
            )
            .cast("long")
        )

    sess = documents.sparkSession
    partitions = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    with_cost = documents.select(
        "doc_id",
        "spans",
        F.aggregate(
            "spans", F.lit(0).cast("long"), lambda a, s: a + span_cost(s)
        ).alias("n_tok"),
    )
    # Distributed prefix sum over doc cost (same machinery as
    # packing.prefix_token_offsets, inlined for the precomputed column).
    parts = (
        with_cost.repartitionByRange(partitions, F.col("doc_id"))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = dict(parts.groupBy("_pid").agg(F.sum("n_tok").alias("s")).collect())
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0
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
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    docs_off = parts.withColumn(
        "doc_offset",
        (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) + offset_expr).cast(
            "long"
        ),
    ).drop("_pid", "n_tok")

    # Within-row running span offsets: costs[], then cumulative sums via
    # a transform over indices of an aggregated prefix array.
    costs_col = F.transform("spans", span_cost)
    prefix = F.aggregate(
        costs_col,
        F.array(F.lit(0).cast("long")),
        lambda acc2, c: F.concat(
            acc2, F.array(F.element_at(acc2, -1) + c)
        ),
    )  # length n+1; prefix[i] = tokens before span i (0-based)
    spans_enriched = docs_off.select(
        "doc_id",
        "doc_offset",
        F.posexplode(
            F.zip_with(
                F.col("spans"),
                F.slice(prefix, 1, F.size("spans")),
                lambda s, p: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    p.alias("span_off"),
                ),
            )
        ).alias("span_idx", "s"),
    ).select(
        "doc_id",
        "span_idx",
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
        (F.col("doc_offset") + F.col("s.span_off")).alias("g_off"),
        F.when(F.col("s.kind") == "text", F.col("s.text")).alias("_txt"),
    )
    txt = F.trim(F.coalesce(F.col("_txt"), F.lit("")))
    n_tok = F.when(F.col("kind") == "text",
                   F.when(F.length(txt) == 0, F.lit(0)).otherwise(
                       F.size(F.split(txt, r"\s+")))
                   ).otherwise(
        F.coalesce(F.element_at(cost_map, F.col("kind")), F.lit(1))
    ).cast("long")
    b = F.lit(budget).cast("long")
    enriched = spans_enriched.withColumn("n_tok", n_tok).filter(
        F.col("n_tok") > 0
    )
    media = enriched.filter(F.col("kind") != "text").select(
        (F.col("g_off") / b).cast("long").alias("chunk_id"),
        "doc_id",
        "span_idx",
        "kind",
        "media_ref",
        F.lit(0).alias("tok_start"),
        F.col("n_tok").alias("n_tok_slice"),
    )
    first = (F.col("g_off") / b).cast("long")
    last = ((F.col("g_off") + F.col("n_tok") - 1) / b).cast("long")
    text = (
        enriched.filter(F.col("kind") == "text")
        .withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .select(
            "chunk_id",
            "doc_id",
            "span_idx",
            "kind",
            "media_ref",
            F.greatest(
                F.col("chunk_id") * b - F.col("g_off"), F.lit(0)
            ).cast("int").alias("tok_start"),
            (
                F.least((F.col("chunk_id") + 1) * b,
                        F.col("g_off") + F.col("n_tok"))
                - F.greatest(F.col("chunk_id") * b, F.col("g_off"))
            ).cast("long").alias("n_tok_slice"),
        )
    )
    return media.unionByName(text).select(
        "chunk_id", "doc_id", "span_idx", "kind", "media_ref",
        F.col("tok_start").cast("int").alias("tok_start"),
        "n_tok_slice",
    )


def span_diff(
    expected: DataFrame, actual: DataFrame
) -> DataFrame:
    """The north-rule per-row invariant as an operator: compare two
    interleaved tables on span-sequence equality (kind, text, media_ref,
    ORDER — offsets are derived and excluded, matching the driver's
    check) and emit ONE row per differing document:

    -> (doc_id, status, n_expected, n_actual, first_diff_idx) with
    status in {'missing_doc', 'extra_doc', 'length', 'span'} and
    first_diff_idx the 0-based index of the first diverging span
    (NULL for missing/extra/length-only rows). Equal docs emit nothing,
    so on a healthy pipeline the result is empty — the cheap regression
    gate to run between two versions of an annotate/repack job before
    shipping the new output.

    Scale shape: one full-outer join on doc_id (both sides shuffled
    once on the key), then the comparison is a zip_with over the two
    span arrays + array_position — per-row codegen, no explode, output
    bounded by the number of DIFFERING docs."""
    ex = expected.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("spans").alias("_e"),
    )
    ac = actual.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("spans").alias("_a"),
    )
    joined = ex.join(ac, "doc_id", "full_outer")
    same = lambda a, b: (  # noqa: E731
        (a["kind"] == b["kind"])
        & (a["text"].eqNullSafe(b["text"]))
        & (a["media_ref"].eqNullSafe(b["media_ref"]))
    )
    n_e, n_a = F.size("_e"), F.size("_a")
    zipped = F.zip_with(
        F.slice("_e", 1, F.least(n_e, n_a)),
        F.slice("_a", 1, F.least(n_e, n_a)),
        lambda a, b: same(a, b),
    )
    first_bad = F.array_position(zipped, F.lit(False))
    status = (
        F.when(F.col("_a").isNull(), F.lit("missing_doc"))
        .when(F.col("_e").isNull(), F.lit("extra_doc"))
        .when(first_bad > 0, F.lit("span"))
        .when(n_e != n_a, F.lit("length"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            "doc_id",
            "status",
            n_e.alias("n_expected"),
            n_a.alias("n_actual"),
            F.when(first_bad > 0, first_bad - 1)
            .cast("int")
            .alias("first_diff_idx"),
        )
    )


def inject_entity_spans(
    documents: DataFrame,
    annotations: DataFrame,
) -> DataFrame:
    """Merge entity-link annotations back INTO the interleaved span
    sequence — the output shape the north rule's annotate pipeline owes
    its consumer: the original (kind, text, media_ref, offset) spans in
    their original relative order, with one `entity` span per
    annotation positioned by its text-stream char offset (an entity
    span carries the URI in media_ref — the "reference to an external
    object" slot — and the matched surface form in text). Ordering is
    total and engine-independent: (offset, original-before-entity,
    original span position / annotation URI) — so an entity annotated
    at a span boundary lands after the span it closes, and two
    entities at one offset order by URI.

    ``documents``: the interleaved schema (doc_id, spans). 
    ``annotations``: (doc_id, offset, surface_form, uri).

    -> FLAT ordered spans (doc_id, span_idx, kind, text, media_ref,
    offset): posexplode keeps the original index, the annotation union
    is a per-doc sort via one row_number window — shuffle keyed on the
    doc, never a global sort. Callers needing the nested form fold with
    pack_interleaved-style collect_list over span_idx; tests pin that
    the text-span subsequence survives byte-identical (the span-
    sequence invariant).
    """
    from pyspark.sql import Window

    orig = documents.select(
        "doc_id", F.posexplode("spans").alias("_pos", "_s")
    ).select(
        "doc_id",
        F.col("_s.kind").alias("kind"),
        F.col("_s.text").alias("text"),
        F.col("_s.media_ref").alias("media_ref"),
        F.col("_s.offset").alias("offset"),
        F.lit(0).alias("_is_ent"),
        F.col("_pos").cast("string").alias("_tie"),
    )
    ents = annotations.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("entity").alias("kind"),
        F.col("surface_form").alias("text"),
        F.col("uri").alias("media_ref"),
        F.col("offset").cast("int").alias("offset"),
        F.lit(1).alias("_is_ent"),
        F.col("uri").alias("_tie"),
    )
    merged = orig.unionByName(ents)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("offset"), F.col("_is_ent"), F.col("_tie")
    )
    return merged.select(
        "doc_id",
        (F.row_number().over(w) - 1).alias("span_idx"),
        "kind",
        "text",
        "media_ref",
        "offset",
    )


def mask_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_token: str = "[MASK]",
) -> DataFrame:
    """Salient-span masking (the REALM pretraining objective, Guu et al.
    ICML 2020: mask ENTITY spans, not random tokens, so the model must
    recall world knowledge to fill them — the canonical KG-guided
    corpus transform, fed directly by this engine's annotate offsets):
    replace each doc's [begin, end) char spans with `mask_token`.
    Overlapping/adjacent spans are merged per doc first
    (operators/temporal.interval_coalesce keyed on the doc), spans are
    clipped to the text bounds, and out-of-range spans drop out.

    -> (doc_id, masked_text, n_masked); docs with no spans pass
    through with n_masked 0.

    Scale shape: pure segment algebra, no UDF — ONE per-doc window
    (lag of the previous span end) turns each span into (kept-prefix
    segment + mask token), one groupBy assembles the pieces with
    array_sort(collect_list(struct(begin, piece))) plus the tail
    substring — every substring/concat is codegen; shuffle keyed on
    the doc only.
    """
    from dbpedia_spotlight_spark.operators.temporal import interval_coalesce

    base = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    ).withColumn("_len", F.length("_txt"))
    sp = (
        spans.select(
            F.col(id_col).alias("_id"),
            F.col("begin").cast("long").alias("begin"),
            F.col("end").cast("long").alias("end"),
        )
        .join(base.select("_id", "_len"), "_id")
        .select(
            "_id",
            F.greatest("begin", F.lit(0)).alias("begin"),
            F.least("end", F.col("_len")).alias("end"),
        )
        .filter(F.col("begin") < F.col("end"))
    )
    merged = interval_coalesce(sp, keys=["_id"], start="begin", end="end")
    w = Window.partitionBy("_id").orderBy("begin")
    pieces = (
        merged.join(base, "_id")
        .withColumn("_prev", F.coalesce(F.lag("end").over(w), F.lit(0)))
        .withColumn(
            "_piece",
            F.concat(
                F.substring(
                    F.col("_txt"),
                    F.col("_prev").cast("int") + 1,
                    (F.col("begin") - F.col("_prev")).cast("int"),
                ),
                F.lit(mask_token),
            ),
        )
    )
    assembled = pieces.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("begin"), F.col("_piece")))
                ),
                lambda s: s["_piece"],
            ),
            "",
        ).alias("_head"),
        F.max("end").alias("_last"),
        F.count("*").alias("n_masked"),
    )
    return (
        base.join(assembled, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.when(
                F.col("_head").isNull(), F.col("_txt")
            )
            .otherwise(
                F.concat(
                    F.col("_head"),
                    F.substring(
                        F.col("_txt"),
                        F.col("_last").cast("int") + 1,
                        (F.col("_len") - F.col("_last")).cast("int"),
                    ),
                )
            )
            .alias("masked_text"),
            F.coalesce(F.col("n_masked"), F.lit(0)).cast("long")
            .alias("n_masked"),
        )
    )


def span_align(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlap join between two annotation LAYERS of the same corpus
    (model spots vs gold, NER layer vs link layer, v1 vs v2 of a
    tagger) — the alignment every span-level evaluator and layer-merge
    needs before it can count matches: all (left, right) span pairs in
    the same doc whose [begin, end) char ranges intersect, classified
    exact / left_within / right_within / overlap, with the char-range
    Jaccard as the soft-match weight.

    ``left``/``right``: (doc_id, begin, end, label). -> (doc_id,
    l_begin, l_end, l_label, r_begin, r_end, r_label, relation,
    jaccard round 6).

    Scale shape: ONE equi-join on the doc id (annotation layers are
    per-doc bounded — tens of spans — so the per-key pair count is
    tiny); the overlap predicate and the CASE classification evaluate
    post-join inside codegen. Never a keyless range join.
    """
    l = left.select(
        F.col(id_col).alias(id_col),
        F.col("begin").cast("long").alias("l_begin"),
        F.col("end").cast("long").alias("l_end"),
        F.col("label").alias("l_label"),
    )
    r = right.select(
        F.col(id_col).alias(id_col),
        F.col("begin").cast("long").alias("r_begin"),
        F.col("end").cast("long").alias("r_end"),
        F.col("label").alias("r_label"),
    )
    j = l.join(r, id_col).filter(
        (F.col("l_begin") < F.col("r_end"))
        & (F.col("r_begin") < F.col("l_end"))
    )
    inter = F.least("l_end", "r_end") - F.greatest("l_begin", "r_begin")
    union = F.greatest("l_end", "r_end") - F.least("l_begin", "r_begin")
    relation = (
        F.when(
            (F.col("l_begin") == F.col("r_begin"))
            & (F.col("l_end") == F.col("r_end")),
            "exact",
        )
        .when(
            (F.col("l_begin") >= F.col("r_begin"))
            & (F.col("l_end") <= F.col("r_end")),
            "left_within",
        )
        .when(
            (F.col("r_begin") >= F.col("l_begin"))
            & (F.col("r_end") <= F.col("l_end")),
            "right_within",
        )
        .otherwise("overlap")
    )
    return j.select(
        id_col,
        "l_begin",
        "l_end",
        "l_label",
        "r_begin",
        "r_end",
        "r_label",
        relation.alias("relation"),
        F.round(inter / union, 6).alias("jaccard"),
    )
