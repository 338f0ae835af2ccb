"""Text-analysis operators for training-data pipelines — all built-in column
functions (JVM-side, whole-stage codegen); no UDFs.

  - token_count / whitespace + BPE-ish regex token estimate
  - quality_score: length / punctuation / stopword-ratio heuristics
  - language_id: marker-word n-gram heuristic
  - fingerprint: rolling 64-bit document fingerprint (xxhash of normalized
    word sequence windows)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_EN_STOP = ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"]

# marker lexicons for the language-ID heuristic over Latin-script text;
# non-Latin scripts are detected by Unicode-range character fractions first
_LANG_MARKERS = {
    "en": ["the", "and", "with", "from", "this", "that", "have", "was"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "dans", "est", "une", "pour"],
    "es": ["el", "los", "las", "que", "por", "una", "con", "para"],
    "it": ["il", "che", "di", "non", "per", "una", "sono", "del"],
    "pt": ["o", "de", "que", "em", "um", "uma", "com", "nao"],
}

# script character classes (Java regex and RE2/DuckDB both accept the
# \uXXXX-range form inside a character class)
_SCRIPTS = [
    ("ja", r"[぀-ヿ]", 0.05),   # kana is uniquely Japanese
    ("zh", r"[一-鿿]", 0.30),   # Han without kana
    ("ko", r"[가-힯]", 0.30),   # Hangul
    ("ru", r"[Ѐ-ӿ]", 0.30),   # Cyrillic
    ("ar", r"[؀-ۿ]", 0.30),   # Arabic
    ("el", r"[Ͱ-Ͽ]", 0.30),   # Greek
]


def words_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored estimate: word-internal splits at letter/digit/punct
    boundaries (regexp tokenizer, counts subword-ish pieces)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
        )
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[\p{Punct}]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_ratio(text: Column, stopwords: list = _EN_STOP) -> Column:
    words = words_col(text)
    hits = F.size(F.array_intersect(words, F.array(*[F.lit(s) for s in stopwords])))
    # distinct-intersection ratio: cheap and monotone with true ratio
    return hits / F.greatest(F.size(F.array_distinct(words)), F.lit(1))


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: long enough, not punctuation-heavy, has stopwords."""
    n = token_count(text)
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return (len_term + punct_term + stop_term) / 3.0


def language_id(text: Column) -> Column:
    """Two-stage heuristic: (1) Unicode-script character fractions decide
    non-Latin languages (kana -> ja before Han -> zh, Hangul, Cyrillic,
    Arabic, Greek); (2) otherwise argmax over marker-word hit counts;
    'und' (undetermined) when nothing fires. Pure codegen column math."""
    n_chars = F.greatest(F.length(text), F.lit(1))
    script_pick = F.lit(None).cast("string")
    # first match wins: build the chain in order, earlier condition first
    chain = None
    for lang, cls, thr in _SCRIPTS:
        frac = F.size(F.regexp_extract_all(text, F.lit(cls), 0)) / n_chars
        cond = frac > thr
        chain = F.when(cond, lang) if chain is None else chain.when(cond, lang)
    script_pick = chain.otherwise(F.lit(None).cast("string"))

    words = words_col(text)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        hits = F.size(
            F.filter(words, lambda w: w.isin(*markers))
        )
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    marker_pick = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return F.coalesce(script_pick, marker_pick)


FP_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1
FP_BASE = 1000003


# B^(2^k) mod p for the bit-decomposed modpow below; 24 bits covers docs of
# up to 16M words. (A two-level element_at lookup over 4096-entry array
# literals was measured 3.5x SLOWER than this chain at sf0.1 — array
# literals are materialized per evaluation in codegen, so "one lookup"
# actually pays a 4096-element array build. The square-and-multiply chain
# of scalar constants stays in registers.)
_FP_POW2: list[int] = []
_c = FP_BASE % FP_MOD
for _ in range(24):
    _FP_POW2.append(_c)
    _c = (_c * _c) % FP_MOD


def _modpow_base(e: Column) -> Column:
    """FP_BASE ** e mod FP_MOD as pure column math: multiply in the
    precomputed B^(2^k) constants for each set bit of e. Each step
    references the accumulator once (`acc * when(bit,c_k).otherwise(1)`),
    so the expression tree grows linearly, not exponentially, and every
    intermediate stays < p² < 2^62."""
    acc = F.lit(1).cast("long")
    for k, ck in enumerate(_FP_POW2):
        bit = F.shiftright(e, k).bitwiseAND(F.lit(1))
        acc = (
            acc * F.when(bit == 1, F.lit(ck).cast("long")).otherwise(F.lit(1))
        ) % F.lit(FP_MOD)
    return acc


def fingerprint_agg(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "fingerprint",
) -> DataFrame:
    """Polynomial rolling-hash document fingerprint over the normalized word
    sequence: Horner fold acc -> (acc*B + h(w)) mod p with h(w) = low 32 md5
    bits mod p — algebraically Σ h_i · B^(n-1-i) mod p, computed as a flat
    posexplode + groupBy sum so every expression stays inside whole-stage
    codegen. (The previous F.transform/F.aggregate formulation was correct
    but evaluated INTERPRETED — the same trap measured at ~130x on simhash,
    BENCH.md.) Exploding the REVERSED word array makes the position itself
    the exponent, computed via bit-decomposed modpow over precomputed
    B^(2^k) mod p constants. Map-side partial aggregation keeps the shuffle
    at one long per doc. Exactly reproducible in ANSI SQL; docs with no
    words fingerprint to 0 (explode_outer keeps them).
    -> (id_col, out) only — use fingerprint_df to append to a wide table."""
    # split-on-\s+ of trimmed text yields '' entries ONLY for empty text, so
    # the empty-word filter is a whole-text CASE, not an array-HOF lambda —
    # this keeps the entire fingerprint plan lambda-free (regression-tested)
    t = F.col(text_col)
    words = F.when(
        F.trim(t) == "", F.array().cast("array<string>")
    ).otherwise(words_col(t))
    tok = df.select(
        F.col(id_col).alias(id_col),
        F.posexplode_outer(F.reverse(words)).alias("_e", "_w"),
    )
    h = F.conv(F.substring(F.md5("_w"), 25, 8), 16, 10).cast("long") % F.lit(
        FP_MOD
    )
    term = (h * _modpow_base(F.col("_e"))) % F.lit(FP_MOD)
    # sum of n terms each < 2^31 fits int64 for any realistic doc
    return tok.groupBy(id_col).agg(
        (F.coalesce(F.sum(term), F.lit(0)) % F.lit(FP_MOD)).alias(out)
    )


def fingerprint_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "fingerprint",
) -> DataFrame:
    """fingerprint_agg joined back onto the full row set (equi-join on the
    id, co-partitioned with the agg's own shuffle)."""
    fp = fingerprint_agg(df, text_col, id_col, out).withColumnRenamed(
        id_col, "_fp_id"
    )
    return df.join(fp, df[id_col] == fp["_fp_id"], "left").drop("_fp_id")


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document (the standard quality
    gate for LLM training corpora: heavily repetitive pages are boilerplate
    or spam). -> (id_col, n_words, dup_word_frac, top_word_frac,
    dup_2gram_frac):

      - dup_word_frac  = 1 - distinct_words / n_words
      - top_word_frac  = count(most frequent word) / n_words
      - dup_2gram_frac = 1 - distinct_bigrams / n_bigrams

    Shape at 100 TB: one posexplode, then every aggregation/window keys on
    the doc id, so all four signals compute in ONE shuffle partitioning
    (the per-(doc, word) count reuses the exchange of the per-doc agg —
    AQE coalesces, nothing re-shuffles on a new key). The bigram is a
    `lead` window over the same doc-id partitioning; map-side partial
    aggregation keeps the shuffle at a handful of longs per doc. All
    column math is codegen — no array higher-order functions (the
    interpreted-HOF trap, BENCH.md)."""
    from pyspark.sql import Window

    t = F.col(text_col)
    words = F.when(
        F.trim(t) == "", F.array().cast("array<string>")
    ).otherwise(words_col(t))
    tok = df.select(
        F.col(id_col), F.posexplode_outer(words).alias("_p", "_w")
    )
    w = Window.partitionBy(id_col).orderBy("_p")
    big = tok.withColumn("_w2", F.lead("_w").over(w))
    per_doc = big.groupBy(id_col).agg(
        F.count("_w").alias("n_words"),
        F.countDistinct("_w").alias("_nd"),
        F.count("_w2").alias("_nb"),
        F.countDistinct(
            F.when(F.col("_w2").isNotNull(), F.concat_ws(" ", "_w", "_w2"))
        ).alias("_ndb"),
    )
    # most-frequent-word count: second agg over the SAME doc-id keying
    top = (
        tok.where(F.col("_w").isNotNull())
        .groupBy(id_col, "_w")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top"))
    )
    def frac(num: Column, den: Column) -> Column:
        # 0.0 (not 1.0) when the denominator is empty: an empty doc is not
        # "fully repetitive"
        return F.when(den == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - num / den
        )

    return (
        per_doc.join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            frac(F.col("_nd"), F.col("n_words")).alias("dup_word_frac"),
            (
                F.coalesce(F.col("_top"), F.lit(0))
                / F.greatest("n_words", F.lit(1))
            ).alias("top_word_frac"),
            frac(F.col("_ndb"), F.col("_nb")).alias("dup_2gram_frac"),
        )
    )


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    t = F.col(text_col)
    stats = df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_ish_token_count(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio": stopword_ratio(t),
            "quality": quality_score(t),
            "lang_pred": language_id(t),
        }
    )
    return fingerprint_df(stats, text_col=text_col, id_col=id_col)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    max_dup_word_frac: float = 0.3,
    max_top_word_frac: float = 0.2,
    max_dup_2gram_frac: float = 0.2,
    max_punct_ratio: float = 0.3,
) -> DataFrame:
    """Gopher-style composite quality gate -> (id_col, n_words, keep,
    reasons): a document is kept iff it passes every check; `reasons`
    lists the failed checks (fixed order, comma-joined) so downstream
    can audit WHY a page was dropped — the standard practice for LLM
    corpus filtering (drop decisions must be explainable and reversible).

    All signals reuse repetition_stats' single doc-id shuffle plus
    per-row column math; the reason string is one concat_ws over
    nullable CASE flags (concat_ws skips NULLs — identical semantics in
    ANSI SQL, so the whole gate is oracle-checkable). Signals are
    rounded to 6 dp BEFORE threshold comparison so the keep/drop
    decision is bit-stable across engines."""
    rep = repetition_stats(df, text_col, id_col)
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.round(punct_ratio(t), 6).alias("_pr"),
        F.round(stopword_ratio(t), 6).alias("_sr"),
    )
    j = rep.join(base, id_col)
    checks = [
        ("dup_2grams", F.round("dup_2gram_frac", 6) > max_dup_2gram_frac),
        ("dup_words", F.round("dup_word_frac", 6) > max_dup_word_frac),
        ("no_stopwords", F.col("_sr") == 0.0),
        ("punct_heavy", F.col("_pr") > max_punct_ratio),
        ("too_long", F.col("n_words") > max_words),
        ("too_short", F.col("n_words") < min_words),
        ("top_word", F.round("top_word_frac", 6) > max_top_word_frac),
    ]
    reasons = F.concat_ws(",", *[F.when(c, F.lit(n)) for n, c in checks])
    return j.select(
        F.col(id_col),
        "n_words",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def unigram_model(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus unigram language model -> (token, n, logp) with add-one
    smoothing: logp = ln((n+1) / (N+V)). The N/V totals are one scalar
    aggregate broadcast back over the count table (a 1-row crossJoin —
    no second scan of the corpus)."""
    tok = df.select(F.explode(words_col(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    tot = counts.agg(
        F.sum("n").cast("double").alias("_N"),
        F.count("*").cast("double").alias("_V"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "token",
        "n",
        F.log((F.col("n") + 1.0) / (F.col("_N") + F.col("_V"))).alias("logp"),
    )


def unigram_doc_logprob(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style quality signal: mean unigram log-probability per
    document under `model` (unigram_model output, possibly from a
    different reference corpus) -> (id_col, n_words, logprob).

    Shape at 100 TB: documents pre-aggregate to (doc, token, c) — the
    join probes one row per DISTINCT token per doc, not per occurrence —
    then an equi-join on token against the model dim. The model is NOT
    broadcast by default (a web-scale vocabulary is 100M+ rows); the
    token key is Zipf-skewed, which AQE skew-join splitting handles
    (hot tokens like 'the' land on many distinct docs, so salting is
    rarely needed once pre-aggregated). Tokens absent from the model are
    dropped from the mean (documented; same-corpus scoring has none)."""
    per = (
        df.select(
            F.col(id_col), F.explode(words_col(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("c"))
    )
    joined = per.join(model.select("token", "logp"), "token")
    return joined.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_words"),
        (F.sum(F.col("c") * F.col("logp")) / F.sum("c")).alias("logprob"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS scheme): positioned k-token-gram hashes, and from every
    window of `w` consecutive hashes select the minimum (rightmost on
    ties); the distinct selected (position, hash) set is the fingerprint.
    Guarantees any shared run of >= w+k-1 tokens between two documents
    yields a shared fingerprint — the locality property MinHash/SimHash
    don't give. -> (doc_id, pos, h).

    All codegen: grams assembled with window lead()s (NOT array-HOF
    lambdas — the measured interpreted-eval trap), md5-derived 32-bit
    hashes (the cross-engine idiom of simhash_buckets), one frame-window
    min per gram, then an equi-join back on (doc, h == window-min) to
    find the rightmost argmin — only hash matches inside one small window
    join, so the join fans out ~1:1. No Python anywhere."""
    wd = Window.partitionBy("doc_id").orderBy("pos")
    tok_rows = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "tok"
        ),
    )
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(wd) for j in range(1, k)
    ]
    # gram and the full-gram sentinel MUST be projected together, BEFORE
    # the filter: a lead() evaluated after the filter sees the truncated
    # row set and concat_ws silently drops the resulting nulls, yielding
    # short tail grams instead of none
    grams = (
        tok_rows.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", *parts).alias("gram"),
            parts[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())  # full k-grams only
        .withColumn(
            "h",
            F.conv(F.substring(F.md5("gram"), 17, 8), 16, 10).cast("long"),
        )
        .select("doc_id", "pos", "h")
    )
    frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    per_doc = Window.partitionBy("doc_id")
    starts = (
        grams.withColumn("m", F.min("h").over(frame))
        .withColumn("n_grams", F.count("*").over(per_doc))
        .filter(F.col("pos") <= F.col("n_grams") - w)  # full windows only
        .select("doc_id", F.col("pos").alias("s"), "m")
    )
    sel = (
        starts.join(
            grams.select("doc_id", F.col("pos").alias("p"), "h"), ["doc_id"]
        )
        .where(
            (F.col("h") == F.col("m"))
            & (F.col("p") >= F.col("s"))
            & (F.col("p") < F.col("s") + w)
        )
        .groupBy("doc_id", "s")
        .agg(F.max("p").alias("pos"), F.first("m").alias("h"))
    )
    return sel.select("doc_id", "pos", "h").distinct()


NFC_SCHEMA = "doc_id long, text string, changed boolean"


def normalize_nfc(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode NFC normalization of a text column — the first stage of any
    multilingual corpus pipeline (decomposed accents, compatibility
    variants and mojibake artifacts otherwise defeat exact dedup, hashing
    and dictionary lookup downstream). -> (doc_id, text NFC-normalized,
    changed).

    Spark has no built-in Unicode normalizer, so this is one Arrow pass
    over stdlib `unicodedata` (vectorized pandas .map — the sanctioned
    Python slot, no per-row Python at the DataFrame level); DuckDB's
    native nfc_normalize provides the cross-engine oracle."""
    import unicodedata

    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            norm = pdf[text_col].map(
                lambda s: unicodedata.normalize("NFC", s)
                if s is not None
                else None
            )
            # pandas NaN != NaN is True — null rows must read unchanged
            changed = (norm != pdf[text_col]) & norm.notna()
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "text": norm,
                    "changed": changed,
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, NFC_SCHEMA
    )


def ngram_counts(
    df: DataFrame, text_col: str = "text", order: int = 3
) -> DataFrame:
    """Corpus n-gram counts -> (gram, n), gram = space-joined lowercase
    whitespace tokens. The gram array per document is built with one
    codegen transform(sequence) over the words array (no UDF, no
    per-token shuffle); only the groupBy shuffles, keyed by gram."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    grams = df.select(words_col(F.col(text_col)).alias("_ws")).filter(
        F.size("_ws") >= order
    ).select(
        F.explode(
            F.expr(
                f"transform(sequence(0, size(_ws) - {order}), "
                f"i -> concat_ws(' ', slice(_ws, i + 1, {order})))"
            )
        ).alias("gram")
    )
    return grams.groupBy("gram").agg(F.count("*").alias("n"))


def ngram_doc_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 3,
    k: float = 0.1,
    model_corpus: DataFrame | None = None,
) -> DataFrame:
    """CCNet/KenLM-style conditional n-gram scoring: mean add-k-smoothed
    log P(w_i | w_{i-order+1..i-1}) per document, under an n-gram model
    trained on ``model_corpus`` (a clean reference corpus; defaults to
    ``df`` itself for self-perplexity). -> (id_col, n_grams, logprob,
    perplexity) where perplexity = exp(-logprob); documents shorter than
    ``order`` words emit nothing.

    Model: P(w|ctx) = (c(gram) + k) / (c(ctx) + k·V), with c(ctx)
    summed over the gram counts (one corpus pass builds both tables) and
    V = |distinct unigrams| (a scalar). Unseen grams/contexts get the
    smoothing floor via left-join coalesce.

    Scale shape at 100 TB: per-doc grams pre-aggregate to
    (doc, gram, c) so the model join probes once per DISTINCT gram per
    doc; the gram and ctx model tables are shuffle-joined dims (a
    web-scale trigram table is billions of rows — never broadcast).
    Gram keys are Zipf-skewed but pre-aggregation caps any one key's
    per-doc fan-out; AQE skew-join covers the rest. To bound model size
    on open-domain corpora, prune with a count threshold or feature-hash
    the gram key into fixed buckets (datapipe/dsir.py's trick) — the
    smoothing floor absorbs the pruned mass.
    """
    corpus = model_corpus if model_corpus is not None else df
    gram_model = ngram_counts(corpus, text_col=text_col, order=order)
    ctx_of = F.expr("substring_index(gram, ' ', " + str(order - 1) + ")")
    ctx_model = gram_model.groupBy(ctx_of.alias("ctx")).agg(
        F.sum("n").alias("ctx_n")
    )
    vocab = corpus.select(
        F.explode(words_col(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w").cast("double").alias("_V"))

    per = (
        df.select(F.col(id_col), words_col(F.col(text_col)).alias("_ws"))
        .filter(F.size("_ws") >= order)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_ws) - {order}), "
                    f"i -> concat_ws(' ', slice(_ws, i + 1, {order})))"
                )
            ).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("c"))
        .withColumn("ctx", ctx_of)
    )
    scored = (
        per.join(gram_model.withColumnRenamed("n", "gram_n"), "gram", "left")
        .join(ctx_model, "ctx", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_lp",
            F.log(
                (F.coalesce(F.col("gram_n"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("ctx_n"), F.lit(0)) + F.lit(k) * F.col("_V"))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_grams"),
        (F.sum(F.col("c") * F.col("_lp")) / F.sum("c")).alias("logprob"),
    )
    return agg.withColumn("perplexity", F.exp(-F.col("logprob")))


def vocab_profile(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """One-row corpus vocabulary profile — the Zipf/Heaps diagnostics a
    pretraining-data pipeline tracks per shard to catch boilerplate
    floods and template corpora (a healthy natural-language crawl has
    zipf slope ~ -1 and a fat hapax tail; machine-generated spam
    doesn't): token count N, vocab size V, hapax & dis legomena
    counts, coverage of the top_k types, and the least-squares slope
    of ln(freq) ~ ln(rank).

    -> (n_tokens, vocab_size, hapax, dis_legomena, topk_coverage,
    zipf_slope), floats rounded to 6.

    Scale shape: ONE explode + groupBy(token) builds the frequency
    table (map-side combinable); ranks come from skew.dense_sorted_id
    (range partition + parallel windows + P-row offset collect — never
    a single-partition global window over the vocabulary); the profile
    itself is one scalar aggregate. covar_pop/var_pop give the exact
    regression slope in one pass — no iteration.
    """
    from dbpedia_spotlight_spark.operators.skew import dense_sorted_id

    freqs = (
        docs.select(F.explode(words_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    ranked = dense_sorted_id(
        freqs, [F.desc("freq"), F.asc("token")], "rank", start=1
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    return ranked.agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab_size"),
        F.sum((F.col("freq") == 1).cast("long")).alias("hapax"),
        F.sum((F.col("freq") == 2).cast("long")).alias("dis_legomena"),
        F.round(
            F.sum(F.when(F.col("rank") <= top_k, F.col("freq")).otherwise(0))
            / F.sum("freq"),
            6,
        ).alias("topk_coverage"),
        F.round((F.covar_pop(x, y) / F.var_pop(x)), 6).alias("zipf_slope"),
    )


def shard_divergence(
    docs: DataFrame,
    shard_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard unigram KL divergence from the corpus distribution —
    the distribution-shift monitor for sharded ingestion: a shard
    whose token distribution diverges hard from the corpus is usually
    boilerplate, another language, or template spam (the vocab_profile
    diagnosis localized to its source). KL(shard ∥ corpus) =
    Σ_w p_shard(w) · ln(p_shard(w) / p_corpus(w)); finite by
    construction because every shard token is also a corpus token.

    -> (shard_col, n_tokens, vocab_size, kl round 6).

    Scale shape: one explode + ONE groupBy (shard, token) — map-side
    combinable, the only corpus-sized pass; corpus totals reuse the
    same table with a second groupBy over tokens; the KL sum is one
    aggregation keyed by shard. No windows, no driver data.
    """
    tok = docs.select(
        F.col(shard_col).alias("shard"),
        F.explode(words_col(F.col(text_col))).alias("token"),
    )
    st = tok.groupBy("shard", "token").agg(F.count("*").alias("n_st"))
    corpus = st.groupBy("token").agg(F.sum("n_st").alias("n_t"))
    shard_tot = st.groupBy("shard").agg(F.sum("n_st").alias("n_s"))
    corpus_tot = corpus.agg(F.sum("n_t").alias("n")).collect()[0][0]
    return (
        st.join(corpus, "token")
        .join(shard_tot, "shard")
        .withColumn(
            "_term",
            (F.col("n_st") / F.col("n_s"))
            * F.log(
                (F.col("n_st") / F.col("n_s"))
                / (F.col("n_t") / F.lit(float(corpus_tot)))
            ),
        )
        .groupBy(F.col("shard").alias(shard_col))
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("vocab_size"),
            F.round(F.sum("_term"), 6).alias("kl"),
        )
    )


def word_dropout(
    docs: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic word-dropout augmentation (the denoising /
    robustness transform of word-dropout regularization and DAE-style
    pretraining — corrupt the input, keep the target): drop each token
    with probability `rate`, decided by the md5 bucket of
    (doc_id, position) — NOT an RNG — so the augmented corpus is
    reproducible across runs, retries, engines, and cluster sizes
    (the stratified_sample hash discipline applied per token).

    -> (doc_id, text, n_dropped): text = surviving tokens joined by a
    space in original order; a doc whose every token drops keeps an
    empty string (the caller's quality_filter handles those).

    Scale shape: one posexplode + one filter + ONE groupBy(doc)
    reassembling via array_sort(collect_list(struct(pos, token))) —
    shuffle keyed on the doc only, no windows, no Python.
    """
    if not (0.0 <= rate < 1.0):
        raise ValueError("rate must be in [0, 1)")
    hi = int(rate * buckets)
    toks = docs.select(
        F.col(id_col),
        F.posexplode(words_col(F.col(text_col))).alias("pos", "token"),
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f", F.col(id_col).cast("string"),
                        F.col("pos").cast("string"),
                    )
                ),
                25,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(buckets),
    )
    flagged = toks.withColumn("_drop", bucket < hi)
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"),
                            F.struct(F.col("pos"), F.col("token")),
                        )
                    )
                ),
                lambda s: s["token"],
            ),
            " ",
        ).alias("text"),
        F.sum(F.col("_drop").cast("long")).alias("n_dropped"),
    )


def textrank_summaries(
    docs: DataFrame,
    top_k: int = 2,
    iterations: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Extractive summarization via TextRank (Mihalcea & Tarau, EMNLP
    2004): sentences are nodes, token-overlap Jaccard the edge
    weights, and a damped weighted PageRank picks each document's
    `top_k` central sentences — the unsupervised summary/centrality
    signal a pretraining pipeline uses for document previews and
    salience-weighted sampling, with no model in the loop.

    Sentences split on '. ' (the terminator stays off all but the last
    sentence — ranking is unaffected; an upstream segmenter
    generalizes it). Single-sentence documents return that sentence
    carrying only the (1-d) base mass (0.15 — no neighbors to vote).

    The ENTIRE iteration runs in integer fixed point (Jaccard weights
    in 1e6 units, rank mass in 1e9 units, every division an explicit
    integer div) — bit-identical on any engine and partitioning, the
    neighborhood_aggregate scale= discipline applied to PageRank:
    p_v <- (S*15) div (100*n_d) + (85 * Σ_u (w_uv * p_u div W_u))
    div 100, with W_u = u's total outgoing weight (column wsum).

    -> (doc_id, sid, sentence, score, rank): rank 1..top_k by
    (fixed-point score desc, sid asc); score = the integer mass / 1e9.

    Scale shape: ALL joins and windows key on the doc id (sentence
    counts per doc are small constants); the pair join is per-doc
    |s|², the price every sentence-graph method pays, bounded by
    max-sentences-per-doc — never cross-document. `iterations` is a
    small constant; each round is one join + one groupBy.
    """
    S = 1_000_000_000
    WS = 1_000_000
    sents = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.posexplode(F.split(F.col(text_col), r"\. ")).alias(
                "sid", "sentence"
            ),
        )
        .filter(F.trim(F.col("sentence")) != "")
        .withColumn(
            "toks",
            F.array_distinct(words_col(F.col("sentence"))),
        )
    )
    a = sents.select(
        "doc", F.col("sid").alias("u"), F.col("toks").alias("_tu")
    )
    b = sents.select(
        "doc", F.col("sid").alias("v"), F.col("toks").alias("_tv")
    )
    edges = (
        a.join(b, "doc")
        .filter(F.col("u") != F.col("v"))
        .withColumn(
            "w",
            (
                F.lit(WS)
                * F.size(F.array_intersect("_tu", "_tv"))
                / F.size(F.array_union("_tu", "_tv"))
            ).cast("long"),
        )
        .filter(F.col("w") > 0)
        .select("doc", "u", "v", "w")
        .localCheckpoint(eager=False)
    )
    out_w = edges.groupBy("doc", "u").agg(F.sum("w").alias("wsum"))
    n_d = sents.groupBy("doc").agg(F.count("*").alias("n"))
    p = sents.select("doc", "sid").join(n_d, "doc").select(
        "doc", "sid", F.expr(f"{S} div n").alias("p"), "n"
    )
    for _ in range(iterations):
        contrib = (
            edges.join(
                p.select("doc", F.col("sid").alias("u"), F.col("p")),
                ["doc", "u"],
            )
            .join(out_w, ["doc", "u"])
            .select(
                "doc",
                F.col("v").alias("sid"),
                F.expr("(w * p) div wsum").alias("_c"),
            )
            .groupBy("doc", "sid")
            .agg(F.sum("_c").alias("_in"))
        )
        p = (
            p.join(contrib, ["doc", "sid"], "left")
            .select(
                "doc",
                "sid",
                F.expr(
                    f"({S}::long * 15) div (100 * n) "
                    "+ (85 * coalesce(_in, 0)) div 100"
                ).alias("p"),
                "n",
            )
            .localCheckpoint(eager=False)
        )
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy(
        F.col("p").desc(), F.col("sid").asc()
    )
    return (
        p.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .join(sents.select("doc", "sid", "sentence"), ["doc", "sid"])
        .select(
            F.col("doc").alias(id_col),
            "sid",
            "sentence",
            (F.col("p").cast("double") / S).alias("score"),
            "rank",
        )
    )


def blocklist_filter(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Blocklist screening — the unglamorous filter every production
    corpus pipeline runs first (policy terms, PII keywords, site
    boilerplate markers): flag documents whose token set intersects a
    term list, and report WHICH terms hit (the audit trail content
    moderation requires, not just a boolean).

    -> docs + (blocked boolean, matched array<string> sorted). Matching
    is exact on lowercased whitespace tokens — substring/fuzzy policy
    belongs upstream in normalization, not hidden in the filter.

    Scale shape: the term list broadcasts as a LITERAL array (policy
    lists are thousands of terms, not millions); the intersection is
    one codegen array op per row — no join, no shuffle, no UDF.
    """
    if not terms:
        raise ValueError("blocklist_filter needs >= 1 term")
    dim = F.array(*[F.lit(t.lower()) for t in sorted(set(terms))])
    matched = F.array_sort(
        F.array_intersect(F.array_distinct(words_col(F.col(text_col))), dim)
    )
    return docs.withColumn("matched", matched).withColumn(
        "blocked", F.size("matched") > 0
    )


def feature_hash(
    docs: DataFrame,
    dim: int = 1 << 18,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML 2009 — the
    vocabulary-free featurizer of Vowpal Wabbit and every
    fasttext-style linear classifier): token t contributes ±1 to
    index md5(t) mod dim, the sign from an independent hash bit, so
    features need NO vocabulary table, NO fitting pass, and collide
    unbiasedly. Deterministic and engine-replayable (the md5
    discipline of the sampling operators applied to featurization).

    -> (doc_id, indices array<long> sorted ascending, values
    array<double>) — the sparse vector a downstream trainer consumes;
    zero-sum collided features are dropped (true sparse form).

    Scale shape: one explode + ONE (doc, index) groupBy (map-side
    combinable) + one per-doc sorted collect; no vocabulary build, no
    join, no driver state — the entire point of the trick at corpus
    scale.
    """
    if dim < 2:
        raise ValueError("dim must be >= 2")
    toks = docs.select(
        F.col(id_col),
        F.explode(words_col(F.col(text_col))).alias("token"),
    )
    h = F.conv(F.substring(F.md5("token"), 1, 12), 16, 10).cast("long")
    idx = F.pmod(h, F.lit(dim))
    sign = F.when(F.pmod(F.floor(h / dim).cast("long"), 2) == 0, 1.0).otherwise(-1.0)
    summed = (
        toks.withColumn("_i", idx)
        .withColumn("_s", sign)
        .groupBy(id_col, "_i")
        .agg(F.sum("_s").alias("_v"))
        .filter(F.col("_v") != 0.0)
    )
    return (
        summed.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_i"), F.col("_v")))
            ).alias("_z")
        )
        .select(
            id_col,
            F.transform(F.col("_z"), lambda s: s["_i"]).alias("indices"),
            F.transform(F.col("_z"), lambda s: s["_v"]).alias("values"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty against everything EARLIER in
    `id_col` order — "how much genuinely new content does each crawl
    batch add" (the marginal-value curve behind dedup ROI and
    crawl-scheduling decisions): a doc's novelty is the fraction of
    its distinct n-grams whose FIRST corpus occurrence is this doc.
    The first doc scores 1.0 by construction; a doc made entirely of
    boilerplate seen before scores 0.0.

    -> (doc_id, n_ngrams, n_new, novelty round 6); docs with fewer
    than n tokens carry their whole text as one gram.

    Scale shape: one explode to distinct (doc, gram) rows, ONE
    groupBy(gram) for the min-doc owner, one join back + one
    groupBy(doc) — all map-side-combinable hash aggregations keyed on
    gram/doc; no windows, no driver state.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.col("_w")
    grams = (
        docs.select(
            F.col(id_col),
            words_col(F.col(text_col)).alias("_w"),
        )
        .select(
            id_col,
            F.explode(
                F.when(
                    F.size(toks) < n,
                    F.array(F.array_join(toks, " ")),
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - n + 1),
                        lambda i: F.array_join(F.slice(toks, i, n), " "),
                    )
                )
            ).alias("gram"),
        )
        .distinct()
    )
    first = grams.groupBy("gram").agg(F.min(id_col).alias("_first"))
    return (
        grams.join(first, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_ngrams"),
            F.sum((F.col("_first") == F.col(id_col)).cast("long"))
            .alias("n_new"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_new",
            F.round(F.col("n_new") / F.col("n_ngrams"), 6).alias("novelty"),
        )
    )


def readability_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document ->
    (id_col, n_words, n_sentences, n_syllables, flesch, fk_grade) — the
    classic readability pair (Flesch 1948; Kincaid et al. 1975), a
    standard corpus-quality feature alongside the Gopher stats in
    `quality_filter`.

    Counting is regex-only and engine-portable (RE2-safe, no
    lookarounds): words = maximal [A-Za-z]+ runs, sentences = maximal
    [.!?]+ runs (floored at 1 so headline-ish fragments still score),
    syllables = maximal vowel-group runs [aeiouyAEIOUY]+ (the standard
    cheap approximation; vowel groups only occur inside words, so the
    global count equals the per-word sum). Scores are the published
    linear formulas on two exact-replayable ratios, rounded to 4.
    Documents with zero words yield NULL scores rather than a division
    error. Pure whole-stage codegen — three regexp_count projections and
    arithmetic, no shuffle at all."""
    words = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+"))
    sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    )
    syls = F.regexp_count(F.col(text_col), F.lit(r"[aeiouyAEIOUY]+"))
    base = docs.select(
        id_col,
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syls.cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
            ),
            4,
        ).alias("flesch"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59),
            ),
            4,
        ).alias("fk_grade"),
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF keywords per document -> (id_col, term, tf, rank):
    the classic salience baseline (Sparck Jones 1972) next to the
    graph-based `textrank_summaries` — corpus-level document frequency
    downweights boilerplate, so the survivors are what the doc is
    *about* (tag generation, routing, weak topic labels).

    tfidf = tf · (ln((N+1)/(df+1)) + 1) — the smoothed idf; tf and df
    are exact integers and the single ln ratio is computed identically
    by any engine, so the per-doc (tfidf desc, term asc) ranking
    hash-checks. Plan: one tokenize+groupBy for tf, one df aggregate
    over distinct (doc, term) (both map-side combinable), broadcast-
    sized df dim joined back, per-doc rank window — keyed throughout."""
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(words_col(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    n_docs = docs.select(F.countDistinct(id_col).alias("n")).collect()[0]["n"]
    df_dim = (
        toks.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1)) + 1.0
    scored = tf.join(F.broadcast(df_dim), "term").withColumn(
        "_s", F.col("tf") * idf
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_s"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "rank")
    )
