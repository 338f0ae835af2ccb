"""Query operators over the materialized knowledge graph.

The reference stores its extracted graph behind Lucene/JDBM lookups
(core/src/main/scala/org/dbpedia/spotlight/db/ — single-key gets); the
Spark-native counterpart is a (subj, pred, obj) triple TABLE (our
pipeline/triples.py output), which supports declarative multi-pattern
queries the reference cannot express at all. Two classic shapes:

* ``bgp_match`` — SPARQL basic-graph-pattern matching: a conjunction of
  triple patterns with shared variables compiled to a selectivity-ordered
  self-join chain over the triple table. This is the standard relational
  encoding of SPARQL BGPs (Neumann & Weikum, RDF-3X, VLDB 2008: join
  order from pattern selectivity); Catalyst/AQE then picks
  broadcast-vs-shuffle per join from runtime sizes.

* ``bfs_distances`` — multi-source breadth-first shortest hop distances,
  the reachability primitive under "related entities within k hops".
  Frontier-expansion DataFrame loop: each hop is one equi-join + one
  min-groupBy, both co-partitioned on the node key; lineage truncated per
  hop exactly like the redirect closure (operators/closure.py).

Scale notes (100 TB triple store):
  - every BGP join is an equi-join on a binding variable — shuffle keyed
    on the join var; patterns are ordered most-constrained-first so the
    intermediate stays small and AQE can flip early joins to broadcast.
  - BFS state is (node, dist) — one row per REACHED node, never per path;
    the frontier shrinks to new nodes only (anti-join), so total work is
    O(edges within k hops), the same bound as Pregel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


# ---------------------------------------------------------------------------
# SPARQL 1.1 property paths (§9.1)
# ---------------------------------------------------------------------------
# A path is a nested-tuple AST over predicate IRIs:
#   ("iri", p)          exact predicate
#   ("plus", node)      one-or-more      node+
#   ("star", node)      zero-or-more     node*   (zero-length = identity)
#   ("opt", node)       zero-or-one      node?
#   ("seq", [n, ...])   sequence         n1/n2
#   ("alt", [n, ...])   alternation      n1|n2
#   ("inv", node)       inverse          ^node
#   ("negset", [p, ...]) negated property set   !p | !(p1|p2)
# Each evaluates to a DISTINCT (subj, obj) relation; bgp_match treats a
# path-predicate pattern exactly like a plain one afterwards. The
# reference exposes full SPARQL through a remote endpoint
# (core/src/main/scala/org/dbpedia/spotlight/sparql/SparqlQueryExecuter.scala);
# here paths compile to native DataFrame algebra instead.


def _graph_identity(triples: DataFrame) -> DataFrame:
    """The zero-length-path relation: every term in the graph related to
    itself (SPARQL 1.1 §18.4 ZeroLengthPath — all subjects and objects)."""
    nodes = (
        triples.select(F.col("subj").alias("n"))
        .unionByName(triples.select(F.col("obj").alias("n")))
        .distinct()
    )
    return nodes.select(F.col("n").alias("subj"), F.col("n").alias("obj"))


def _path_df(triples: DataFrame, node: tuple) -> DataFrame:
    """Evaluate a property-path AST to a (subj, obj) relation.

    Scale shape: sequences are equi-join chains on the mid node (AQE
    picks broadcast vs shuffle from runtime sizes), alternation is a
    unionByName + distinct, and both closure quantifiers reuse the
    repeated-squaring transitive_closure — a depth-D chain costs log2(D)
    join rounds, never D."""
    kind = node[0]
    if kind == "iri":
        return triples.filter(F.col("pred") == F.lit(node[1])).select(
            "subj", "obj"
        )
    if kind == "seq":
        acc = _path_df(triples, node[1][0])
        for part in node[1][1:]:
            step = _path_df(triples, part)
            acc = (
                acc.select("subj", F.col("obj").alias("_m"))
                .join(
                    step.select(F.col("subj").alias("_m"), "obj"), "_m"
                )
                .select("subj", "obj")
            )
        return acc.distinct()
    if kind == "alt":
        acc = _path_df(triples, node[1][0])
        for part in node[1][1:]:
            acc = acc.unionByName(_path_df(triples, part))
        return acc.distinct()
    if kind == "plus":
        from dbpedia_spotlight_spark.operators.closure import (
            transitive_closure,
        )

        return transitive_closure(
            _path_df(triples, node[1]), src="subj", dst="obj"
        )
    if kind == "star":
        return (
            _path_df(triples, ("plus", node[1]))
            .unionByName(_graph_identity(triples))
            .distinct()
        )
    if kind == "opt":
        return (
            _path_df(triples, node[1])
            .unionByName(_graph_identity(triples))
            .distinct()
        )
    if kind == "inv":
        base = _path_df(triples, node[1])
        return base.select(
            F.col("obj").alias("subj"), F.col("subj").alias("obj")
        )
    if kind == "negset":
        # §9.1 PathNegatedPropertySet: any edge whose predicate is NOT in
        # the set — one scan, the isin NOT-filter pushes to the source
        return triples.filter(~F.col("pred").isin(list(node[1]))).select(
            "subj", "obj"
        )
    if kind == "rep":
        # Bounded repetition <p>{n,m} (the pre-CR SPARQL 1.1 draft form,
        # kept by Jena/Virtuoso as an extension): union of the k-fold
        # compositions for k in n..m; {n,} composes P^n with P* (whose
        # identity member supplies every length ≥ n). Powers come from
        # binary decomposition — {8} costs 3 join rounds, not 7 — and
        # each power is memoized across the k range, so {n,m} costs
        # O(log m + (m - n)) joins total.
        _, sub, lo, hi = node
        base = _path_df(triples, sub)

        def _compose(a: DataFrame, b: DataFrame) -> DataFrame:
            return (
                a.select("subj", F.col("obj").alias("_m"))
                .join(b.select(F.col("subj").alias("_m"), "obj"), "_m")
                .select("subj", "obj")
                .distinct()
            )

        memo: dict = {}

        def _power(k: int) -> DataFrame:
            if k in memo:
                return memo[k]
            if k == 1:
                r = base
            elif k % 2 == 0:
                half = _power(k // 2)
                r = _compose(half, half)
            else:
                r = _compose(_power(k - 1), base)
            memo[k] = r
            return r

        if hi is None:
            star = _path_df(triples, ("star", sub))
            return _compose(_power(lo), star) if lo else star
        if hi == 0:
            return _graph_identity(triples)
        parts = [_graph_identity(triples)] if lo == 0 else []
        parts += [_power(k) for k in range(max(lo, 1), hi + 1)]
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        return acc.distinct()
    raise ValueError(f"unknown path node {node!r}")


def predicate_counts(triples: DataFrame) -> dict:
    """{pred: triple count} — the statistics dim for cost-based BGP
    ordering (pass as bgp_match(pred_stats=...)). Predicate vocabularies
    are tiny (thousands), so the collect is bounded; compute once per
    KB snapshot and reuse across queries."""
    return {
        r["pred"]: r["n"]
        for r in triples.groupBy("pred").agg(F.count("*").alias("n")).collect()
    }


def _estimated_rows(pat: tuple, stats: dict, default: int) -> float:
    """Cardinality estimate for one triple pattern: the predicate's
    actual count when the predicate is a constant (property paths and
    variable predicates fall back to the whole-KB default), divided by
    10 per additional bound subject/object term — the classic
    selectivity-factor heuristic, now anchored on REAL predicate counts
    instead of constant-arity alone."""
    s_term, p_term, o_term = pat
    if isinstance(p_term, str) and not _is_var(p_term) and not p_term.endswith("+"):
        est = float(stats.get(p_term, default))
    else:
        est = float(default)
    for t in (s_term, o_term):
        if not _is_var(t):
            est /= 10.0
    return est


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]] | None = None,
    filters: list[str] | None = None,
    minus: list[tuple[str, str, str]] | None = None,
    pred_stats: dict | None = None,
) -> DataFrame:
    """Match a SPARQL-style basic graph pattern against a triple table.

    ``triples``: columns (subj, pred, obj). ``patterns``: list of
    (s, p, o) where each term is either a constant or a "?var". Returns
    one column per distinct variable, one row per distinct binding
    (SPARQL set semantics for SELECT DISTINCT).

    ``optional``: one pattern group — or a list of groups — with SPARQL
    OPTIONAL semantics: each group's bindings are LEFT-joined in order on
    the variables shared with what is bound so far, so non-matching rows
    survive with nulls in the optional-only variables (SPARQL 1.1 §5.4
    left join algebra; every optional group must share >= 1 variable
    with the bindings before it).

    ``filters``: SPARQL FILTER expressions as Spark SQL strings over the
    variable columns (e.g. ``"n != 'n0'"``), applied after the required
    joins and before OPTIONAL — constants in patterns are cheaper; use
    filters for non-equality constraints.

    ``minus``: a pattern group with SPARQL MINUS semantics (§8.3 /
    NOT EXISTS on shared variables): rows whose shared-variable values
    match any binding of the minus group are removed — one left-anti
    join, the negation the triple-store API otherwise can't express.
    The minus group must share >= 1 variable with the required group
    (a shared-variable-free MINUS is a SPARQL no-op footgun — rejected
    here instead of silently keeping everything).

    Patterns are joined most-constrained-first (more constants = smaller
    scan), and among equals, patterns sharing a variable with the bound
    set come first — a cross join is only emitted when the BGP is
    genuinely disconnected.

    ``pred_stats``: optional {pred: count} dict (predicate_counts) that
    upgrades the ordering from the constant-arity heuristic to COST-
    BASED: patterns are ordered by estimated cardinality (the
    predicate's real count, /10 per extra bound term). At 100 TB the
    difference between starting from a 100-row predicate and a
    10^10-row one is the whole query; the heuristic can't see it, the
    stats can. Semantics are identical either way (ordering only).
    """
    if not patterns:
        raise ValueError("empty basic graph pattern")
    _opt_pats = [p for g in _normalize_optional(optional) for p in g]
    for pat in list(patterns) + _opt_pats + list(minus or []):
        if len(pat) != 3:
            raise ValueError(f"pattern must be a (s,p,o) triple: {pat!r}")
        if not any(_is_var(t) for t in pat):
            raise ValueError(f"pattern binds no variable: {pat!r}")

    def _relation(pat: tuple[str, str, str]) -> tuple[DataFrame, set]:
        """Filter constants, project variable positions to var columns.

        A constant predicate ending in ``+`` is a SPARQL 1.1 property
        path (one-or-more, §9.1): the pattern matches the TRANSITIVE
        closure of that predicate's edge set — computed by the repeated-
        squaring transitive_closure operator, so a depth-D chain costs
        log2(D) join rounds, not D. A tuple predicate is a full path AST
        (seq/alt/plus/star/opt — see _path_df)."""
        s_term, p_term, o_term = pat
        if isinstance(p_term, tuple) or (
            not _is_var(p_term)
            and isinstance(p_term, str)
            and p_term.endswith("+")
            and len(p_term) > 1
        ):
            node = (
                p_term
                if isinstance(p_term, tuple)
                else ("plus", ("iri", p_term[:-1]))
            )
            df = _path_df(triples, node)
            positions = [("subj", s_term), ("obj", o_term)]
        else:
            df = triples
            positions = [
                ("subj", s_term), ("pred", p_term), ("obj", o_term)
            ]
        cols, seen = [], {}
        for col, term in positions:
            if _is_var(term):
                name = term[1:]
                if name in seen:
                    # repeated var inside one pattern: equality filter
                    df = df.filter(F.col(col) == F.col(seen[name]))
                else:
                    seen[name] = col
                    cols.append(F.col(col).alias(name))
            else:
                df = df.filter(F.col(col) == F.lit(term))
        return df.select(*cols), set(seen)

    if pred_stats is not None:
        # cost-based: smallest estimated cardinality first
        default = max(pred_stats.values(), default=1) * 10
        order = sorted(
            range(len(patterns)),
            key=lambda i: _estimated_rows(patterns[i], pred_stats, default),
        )
    else:
        # most-constrained-first: sort by number of constants descending
        order = sorted(
            range(len(patterns)),
            key=lambda i: -sum(0 if _is_var(t) else 1 for t in patterns[i]),
        )
    remaining = list(order)
    first = remaining.pop(0)
    result, bound = _relation(patterns[first])
    while remaining:
        # prefer a pattern sharing >=1 bound variable (connected join)
        pick = next(
            (i for i in remaining if _relation_vars(patterns[i]) & bound),
            remaining[0],
        )
        remaining.remove(pick)
        rel, vs = _relation(patterns[pick])
        shared = sorted(vs & bound)
        result = (
            result.join(rel, on=shared) if shared else result.crossJoin(rel)
        )
        bound |= vs
    return _apply_group_modifiers(
        triples, result, bound, optional, filters, minus
    ).distinct()


def _normalize_optional(optional) -> list:
    """Accept one OPTIONAL group (a list of (s,p,o) tuples — the round-3
    API) or a list of groups; always return a list of groups."""
    if not optional:
        return []
    return [optional] if isinstance(optional[0], tuple) else list(optional)


def _apply_group_modifiers(
    triples: DataFrame,
    result: DataFrame,
    bound: set,
    optional: list | None,
    filters: list | None,
    minus: list | None,
) -> DataFrame:
    """FILTER → MINUS → OPTIONAL → deferred FILTER over a binding frame
    (shared by bgp_match and sparql_select's UNION path).

    A FILTER that references an optional-only variable is deferred until
    after the left joins that bind it (SPARQL's group-level filter scope
    — previously an unresolved-column AnalysisException). Filters over
    required-only variables still run first: a left join preserves the
    left side's columns, so the two orders agree there and the early
    filter shrinks the join input."""
    opt_groups = _normalize_optional(optional)
    opt_only = set()
    for g in opt_groups:
        for pat in g:
            opt_only |= _relation_vars(pat)
    opt_only -= bound
    deferred = []
    for expr in filters or []:
        if opt_only and (_filter_identifiers(expr) & opt_only):
            deferred.append(expr)
        else:
            result = result.filter(F.expr(expr))
    if minus:
        neg = bgp_match(triples, minus)
        shared = sorted(set(neg.columns) & bound)
        if not shared:
            raise ValueError(
                "MINUS group shares no variable with the required group"
            )
        result = result.join(
            neg.select(*shared).distinct(), on=shared, how="left_anti"
        )
    for g in opt_groups:
        opt = bgp_match(triples, g)
        shared = sorted(set(opt.columns) & bound)
        if not shared:
            raise ValueError(
                "OPTIONAL group shares no variable with the required group"
            )
        result = result.join(opt, on=shared, how="left")
        bound |= set(opt.columns)
    for expr in deferred:
        result = result.filter(F.expr(expr))
    return result


def _relation_vars(pat: tuple[str, str, str]) -> set:
    return {t[1:] for t in pat if _is_var(t)}


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Minimum hop distance from any source node, up to ``max_hops``.

    ``edges``: directed (src, dst) pairs — symmetrize first for an
    undirected graph. ``sources``: one column ``node``. Returns
    (node, dist) with dist = min #edges from the nearest source,
    including the sources themselves at dist 0.

    Frontier expansion: per hop, join the frontier to edges (equi-join on
    the node key), drop nodes already reached (left-anti), dedupe the new
    frontier. State stays one row per reached node; `localCheckpoint`
    truncates the per-iteration lineage (the closure-loop pattern,
    operators/closure.py). Early-exits when the frontier drains — the
    count() per hop is a scalar driver aggregate, not a collect.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    reached = sources.select(F.col(node).alias(node)).distinct().withColumn(
        "dist", F.lit(0)
    )
    frontier = reached.select(node)
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier[node] == e["_s"])
            .select(F.col("_d").alias(node))
            .distinct()
            .join(reached.select(node), node, "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt.withColumn("dist", F.lit(hop)))
        reached = reached.localCheckpoint(eager=True)
        frontier = nxt
    return reached


def rdfs_entailment(
    type_rows: DataFrame,
    subclass_edges: DataFrame,
    entity: str = "entity",
    cls: str = "cls",
    supercls: str = "supercls",
) -> DataFrame:
    """Materialize RDFS subclass entailment: every type an entity holds
    explicitly OR through rdfs:subClassOf* (the rdfs9 rule, W3C RDF 1.1
    Semantics §9.2.1) — forward-chained inference, the standard
    materialization step when loading a KG into a triple store.

    ``type_rows``: (entity, cls) explicit rdf:type assertions.
    ``subclass_edges``: (cls, supercls) direct subclass DAG edges.
    Returns the DISTINCT entailed (entity, cls) set.

    Plan: the subclass closure comes from transitive_closure (repeated
    squaring, log-depth rounds — operators/closure.py) and is tiny
    relative to the instance data (ontologies are KBs' smallest tables),
    so the instance join broadcasts the closure; the instance table is
    scanned once."""
    from dbpedia_spotlight_spark.operators.closure import transitive_closure

    t = type_rows.select(F.col(entity).alias("entity"), F.col(cls).alias("cls"))
    closure = transitive_closure(
        subclass_edges.select(
            F.col(cls).alias("class_id"), F.col(supercls).alias("ancestor_id")
        ),
        src="class_id",
        dst="ancestor_id",
    )
    inherited = t.join(
        F.broadcast(closure), t["cls"] == closure["class_id"]
    ).select("entity", F.col("ancestor_id").alias("cls"))
    return t.unionByName(inherited).distinct()


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node: str = "node",
) -> DataFrame:
    """Bounded-hop weighted shortest path distance from any source —
    Bellman-Ford relaxation (the weighted companion of bfs_distances):
    dist_{t+1}(v) = min(dist_t(v), min_{(u,v)} dist_t(u) + w(u,v)),
    ``max_hops`` rounds, so the result is exact for paths of up to that
    many edges (the standard bounded-iteration form — Pregel SSSP).

    ``edges``: (src, dst, weight>0) directed; symmetrize for undirected.
    ``sources``: one ``node`` column. Returns (node, dist) for reached
    nodes. Each round is one equi-join + one min-groupBy co-partitioned
    on the node key; state is one row per reached node (never per path);
    lineage truncated per round. Relaxation is deterministic — the same
    min over the same path sums — so a SQL twin unrolling the rounds
    reproduces it bit-for-bit."""
    e = edges.select(
        F.col(src).alias("_s"),
        F.col(dst).alias("_d"),
        F.col(weight).cast("double").alias("_w"),
    )
    dist = sources.select(F.col(node).alias(node)).distinct().withColumn(
        "dist", F.lit(0.0)
    )
    for _ in range(max_hops):
        relaxed = (
            dist.withColumnRenamed(node, "_s")
            .join(e, "_s")
            .select(F.col("_d").alias(node), (F.col("dist") + F.col("_w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy(node)
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


_SPARQL_RE = __import__("re").compile(
    r"""
    \?\w+                |  # variable
    <[^>\s]*>[+*?]?      |  # IRI (no spaces), optional path quantifier
    "(?:[^"\\]|\\.)*"    |  # double-quoted literal
    '(?:[^'\\]|\\.)*'    |  # single-quoted literal
    \d+\.\d+             |  # decimal literal (kept whole for FILTERs)
    &&|\|\|              |  # boolean connectives (single tokens)
    [=!<>]=?             |  # comparison operators
    [{}()./|^,;]         |  # structure + path operators + separators
    [^\s{}()./|^,;]+        # bareword / keyword (stops at structure)
    """,
    __import__("re").VERBOSE,
)

# SQL keywords/functions that may appear inside a translated FILTER and
# must not be mistaken for variable references when deciding whether a
# filter touches optional-only variables.
_SQL_WORDS = frozenset(
    "and or not in like is null true false between exists case when then"
    " else end cast as rlike contains startswith endswith length lower"
    " upper isnotnull string abs ceil floor round regexp_extract concat"
    " substring regexp_replace if coalesce instr".split()
)

# SPARQL 1.1 §17 builtin functions -> the Spark SQL function with the
# same (string, string) -> value semantics over our plain-string terms.
# Translated per token when followed by "(".
_SPARQL_FNS = {
    "REGEX": "rlike",
    "CONTAINS": "contains",
    "STRSTARTS": "startswith",
    "STRENDS": "endswith",
    "STRLEN": "length",
    "LCASE": "lower",
    "UCASE": "upper",
    "BOUND": "isnotnull",
    # 1:1 renames whose Spark SQL twin has identical semantics over the
    # engine's plain-string/number terms (SPARQL SUBSTR and SQL
    # substring share 1-based indexing; IF/COALESCE/CONCAT are the
    # standard functional forms; REPLACE is regex in both, §17.4.3.15).
    "CONCAT": "concat",
    "SUBSTR": "substring",
    "REPLACE": "regexp_replace",
    "IF": "if",
    "COALESCE": "coalesce",
    "ABS": "abs",
    "CEIL": "ceil",
    "FLOOR": "floor",
    "ROUND": "round",
}

# Term-model builtins (LANG / DATATYPE / STR / LANGMATCHES) expand to SQL
# templates over the N-Triples lexical forms of functions/rdfterm.py —
# a lang-tagged literal is stored as `"v"@en`, a typed one as
# `"v"^^<dt>`. Backslashes double for embedding in SQL string literals.


def _sql_re(py_re: str) -> str:
    return py_re.replace("\\", "\\\\").replace("'", "''")


def _term_regexes():
    from dbpedia_spotlight_spark.functions.rdfterm import (
        _DT_RE, _LANG_RE, _VALUE_RE,
    )

    return _sql_re(_VALUE_RE), _sql_re(_LANG_RE), _sql_re(_DT_RE)


def _tpl_lang(args: list[str]) -> str:
    _, lang_re, _ = _term_regexes()
    return f"regexp_extract({args[0]}, '{lang_re}', 1)"


def _tpl_datatype(args: list[str]) -> str:
    val_re, lang_re, dt_re = _term_regexes()
    x = args[0]
    return (
        f"CASE WHEN {x} RLIKE '{dt_re}' THEN regexp_extract({x}, '{dt_re}', 1) "
        f"WHEN {x} RLIKE '{lang_re}' "
        "THEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString' "
        f"WHEN {x} RLIKE '{val_re}' "
        "THEN 'http://www.w3.org/2001/XMLSchema#string' END"
    )


def _tpl_str(args: list[str]) -> str:
    # Lexical value of a literal term, pass-through for IRIs/bare strings
    # (escape sequences stay escaped in the FILTER path; term_value on
    # the DataFrame side does the full unescape).
    val_re, _, _ = _term_regexes()
    x = args[0]
    return (
        f"CASE WHEN {x} RLIKE '{val_re}' "
        f"THEN regexp_extract({x}, '{val_re}', 1) ELSE {x} END"
    )


def _tpl_langmatches(args: list[str]) -> str:
    # RFC 4647 basic filtering: '*' matches any non-empty tag, else
    # case-insensitive exact or range- prefix match.
    a, b = args[0], args[1]
    return (
        f"CASE WHEN lower({b}) = '*' THEN {a} != '' "
        f"ELSE lower({a}) = lower({b}) "
        f"OR lower({a}) LIKE lower({b}) || '-%' END"
    )


def _tpl_strbefore(args: list[str]) -> str:
    # §17.4.3.3: empty separator -> "", absent separator -> "".
    a, b = args[0], args[1]
    return (
        f"CASE WHEN {b} = '' THEN '' "
        f"WHEN instr({a}, {b}) > 0 "
        f"THEN substring({a}, 1, instr({a}, {b}) - 1) ELSE '' END"
    )


def _tpl_strafter(args: list[str]) -> str:
    # §17.4.3.4: empty separator -> the whole string, absent -> "".
    a, b = args[0], args[1]
    return (
        f"CASE WHEN {b} = '' THEN {a} "
        f"WHEN instr({a}, {b}) > 0 "
        f"THEN substring({a}, instr({a}, {b}) + length({b})) ELSE '' END"
    )


_TERM_TEMPLATES = {
    "LANG": (_tpl_lang, 1),
    "DATATYPE": (_tpl_datatype, 1),
    "STR": (_tpl_str, 1),
    "LANGMATCHES": (_tpl_langmatches, 2),
    "STRBEFORE": (_tpl_strbefore, 2),
    "STRAFTER": (_tpl_strafter, 2),
}


def _resolve_term_builtins(toks: list[str]) -> list[str]:
    """Expand LANG/DATATYPE/STR/LANGMATCHES calls (possibly nested, e.g.
    LANGMATCHES(LANG(?o), 'en')) into SQL template strings. Operates on
    ALREADY-TRANSLATED tokens; paren matching splits top-level commas."""
    out, i = [], 0
    while i < len(toks):
        t = toks[i]
        entry = _TERM_TEMPLATES.get(t.upper())
        if entry and i + 1 < len(toks) and toks[i + 1] == "(":
            depth, j = 0, i + 1
            while j < len(toks):
                if toks[j] == "(":
                    depth += 1
                elif toks[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j >= len(toks):
                raise ValueError(f"unbalanced parens in FILTER near {t}")
            inner = toks[i + 2 : j]
            args, cur, d = [], [], 0
            for tk in inner:
                if tk == "(":
                    d += 1
                elif tk == ")":
                    d -= 1
                if tk == "," and d == 0:
                    args.append(cur)
                    cur = []
                else:
                    cur.append(tk)
            args.append(cur)
            fn, arity = entry
            if len(args) != arity:
                raise ValueError(
                    f"{t} expects {arity} argument(s), got {len(args)}"
                )
            arg_sql = [
                " ".join(_resolve_term_builtins(a)).strip() for a in args
            ]
            out.append("(" + fn(arg_sql) + ")")
            i = j + 1
        else:
            out.append(t)
            i += 1
    return out


def _filter_expr_sql(expr_toks: list[str]) -> str:
    """Translate SPARQL FILTER tokens to one Spark SQL expression.

    Token-aware (the round-3 ADVICE fix): rewrites (``?x``→``x``,
    ``&&``→AND, ``||``→OR, ``=``→``==``) apply per token, so quoted
    literals pass through verbatim — ``FILTER(?x != 'a=b')`` keeps its
    literal intact — and decimal literals like ``1.5`` are single tokens
    (the tokenizer no longer splits them on the dot). ``<iri>`` terms
    become quoted string literals (the triple table stores bare IRIs)."""
    out = []
    for i, t in enumerate(expr_toks):
        if t.startswith("?"):
            out.append(t[1:])
        elif t[0] in "\"'":
            out.append("'" + t[1:-1].replace("'", "''") + "'")
        elif t.startswith("<") and t.endswith(">"):
            out.append("'" + t[1:-1].replace("'", "''") + "'")
        elif t == "&&":
            out.append("AND")
        elif t == "||":
            out.append("OR")
        elif t == "=":
            out.append("==")
        elif (
            t.upper() in _SPARQL_FNS
            and i + 1 < len(expr_toks)
            and expr_toks[i + 1] == "("
        ):
            out.append(_SPARQL_FNS[t.upper()])
        else:
            out.append(t)
    return " ".join(_resolve_term_builtins(out))


def _filter_identifiers(expr: str) -> set:
    """Bareword identifiers referenced by a translated filter expression
    (quoted literals stripped first so 'a AND b' the literal doesn't
    count), minus SQL keywords — used to decide whether a FILTER can run
    before the OPTIONAL left joins or must wait until its variables
    exist."""
    re_ = __import__("re")
    no_lits = re_.sub(r"'(?:[^'])*'", "", expr)
    return {
        w
        for w in re_.findall(r"[A-Za-z_]\w*", no_lits)
        if w.lower() not in _SQL_WORDS
    }


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL SELECT query (conjunctive subset) against a triple
    table — the user-facing entry to bgp_match.

    Supported grammar (enough for the BGP + OPTIONAL + FILTER algebra
    the engine implements; anything else raises ValueError):

        SELECT (DISTINCT)? (?v ... | *) WHERE {
            ?s <p> ?o .  ...                 # triple patterns
            ?s <a>/<b>+ ?o .                 # property paths: / | + * ?
            OPTIONAL { ?s <p2> ?x . ... }    # any number of OPTIONAL groups
            MINUS { ?s <p3> ?y . ... }       # at most one MINUS group
            FILTER(?x != "lit" && ...)       # any number of FILTERs
            FILTER EXISTS { ?s <p4> ?z . }   # correlated semi-join (§8.1)
            FILTER NOT EXISTS { ... }        # correlated anti-join
            BIND(UCASE(?x) AS ?u)            # computed variable (§7.6)
            VALUES ?x { 'a' 'b' <c> }        # inline data (single var)
            VALUES (?x ?y) { ('a' 'b') ... } # inline data (multi var)
            { SELECT ... WHERE { ... } }     # subquery (§12), joined on
                                             # shared vars; FILTERs over
                                             # subquery-only vars run
                                             # after the join
        }

    Property paths (SPARQL 1.1 §9.1) in predicate position: ``<p>+``
    (one-or-more), ``<p>*`` (zero-or-more), ``<p>?`` (zero-or-one),
    ``<a>/<b>`` (sequence), ``<a>|<b>`` (alternation), ``^<p>``
    (inverse), parenthesised combinations; ``/`` binds tighter than
    ``|``. Zero-length paths relate every term in the graph to itself
    (§18.4). FILTERs may use the §17 builtins REGEX/CONTAINS/STRSTARTS/
    STRENDS/STRLEN/LCASE/UCASE/BOUND (translated to the Spark SQL
    functions with identical plain-string semantics) plus the term-model
    builtins LANG/DATATYPE/STR/LANGMATCHES over the N-Triples lexical
    literal forms of functions/rdfterm.py (``"v"@en``, ``"v"^^<dt>``) —
    LANG returns '' for untagged terms, DATATYPE returns rdf:langString
    / xsd:string / the ^^ tag (NULL for IRIs), STR strips quotes+tags,
    LANGMATCHES does RFC 4647 basic filtering incl. '*' and range-
    prefix matches; calls nest (LANGMATCHES(LANG(?o), 'en')). Trailing
    OFFSET n is supported next to LIMIT. ASK and CONSTRUCT forms live in
    sparql_ask / sparql_construct.

    Terms: ``?var``, ``<iri>`` (angle brackets stripped), quoted
    literals, or barewords. FILTER expressions translate to Spark SQL
    per token (``?x`` → column ``x``; ``&&``/``||`` → AND/OR; ``=`` →
    ``==``; quoted and decimal literals pass through intact). A FILTER
    referencing an optional-only variable runs after the left join that
    binds it (group-level filter scope); all other filters run before
    OPTIONAL, where the two orders agree. SELECT with named variables
    projects them; ``*`` keeps every variable. DISTINCT is implicit
    (bgp_match returns set semantics, per SELECT DISTINCT).

    Solution modifiers after the pattern group:
    ``(COUNT(?v) AS ?n)`` (also SUM/MIN/MAX/AVG, ``SAMPLE`` (min — a
    deterministic sample), ``GROUP_CONCAT(?v ; SEPARATOR = ",")``
    (values sorted for determinism); ``COUNT(*)`` and
    ``AGG(DISTINCT ?v)`` accepted) with ``GROUP BY ?k``,
    ``HAVING(COUNT(?v) > n)`` (the aggregate must also be projected —
    it is rewritten to its alias), ``ORDER BY ?v [ASC|DESC]``, and
    ``LIMIT n`` / ``OFFSET n``. Aggregates evaluate over the DISTINCT
    solution set (set-semantics subquery); every non-aggregated
    projected variable must appear in GROUP BY. Property paths also
    accept ``!<p>`` / ``!(<a>|<b>)`` negated property sets (§9.1).
    BIND targets are projectable and usable in modifiers, not in
    subsequent patterns or FILTERs. Anything unparsed raises."""
    toks = _SPARQL_RE.findall(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(f"unexpected end of query (wanted {expected})")
        t = toks[pos]
        if expected and t.upper() != expected.upper():
            raise ValueError(f"expected {expected!r}, got {t!r}")
        pos += 1
        return t

    def term(tok: str) -> str:
        if tok.startswith("?"):
            return tok
        if tok.startswith("<") and tok.endswith(">+"):
            return tok[1:-2] + "+"  # property path: <p>+ -> p+
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok[0] in "\"'" and tok[-1] == tok[0] and len(tok) >= 2:
            return tok[1:-1]
        return tok

    _QUANT = {"+": "plus", "*": "star", "?": "opt"}

    def maybe_quant(node: tuple) -> tuple:
        """Apply a trailing path quantifier if one follows: + * ? or the
        bounded-repetition form {n} / {n,} / {n,m} (draft §9.1, kept as
        an extension by Jena/Virtuoso — compiled to ("rep", node, n, m)
        with m=None for the unbounded tail)."""
        if peek() in ("+", "*", "?"):
            return (_QUANT[take()], node)
        if peek() == "{":
            take()
            lo = int(take())
            hi: int | None = lo
            if peek() == ",":
                take()
                hi = None if peek() == "}" else int(take())
            take("}")
            if hi is not None and hi < lo:
                raise ValueError(
                    f"path quantifier {{{lo},{hi}}}: max < min"
                )
            return ("rep", node, lo, hi)
        return node

    def path_atom() -> tuple:
        t = take()
        if t == "^":
            # inverse path (§9.1 PathEltOrInverse): swap subj/obj
            return ("inv", path_atom())
        if t == "!":
            # negated property set: !<p> or !(<a>|<b>); inverse members
            # (^<p> inside the set) are not supported — raise clearly
            members = []
            if peek() == "(":
                take()
                while True:
                    m = take()
                    if m == "^":
                        raise ValueError(
                            "inverse members in a negated property set "
                            "(!(^<p>)) are not supported"
                        )
                    members.append(term(m))
                    if peek() == "|":
                        take()
                        continue
                    take(")")
                    break
            else:
                m = take()
                if m == "^":
                    raise ValueError(
                        "inverse members in a negated property set "
                        "(!^<p>) are not supported"
                    )
                members.append(term(m))
            return maybe_quant(("negset", members))
        if t == "(":
            node = path_expr()
            take(")")
            return maybe_quant(node)
        if t.startswith("?"):
            raise ValueError(f"variable {t!r} inside a property path")
        quant = None
        if t.startswith("<"):
            if not t.endswith(">") and t[-1] in "+*?":
                quant, t = t[-1], t[:-1]
            base = ("iri", t[1:-1])
        elif t[0] in "\"'":
            base = ("iri", t[1:-1])
        else:
            if len(t) > 1 and t[-1] in "+*?":
                quant, t = t[-1], t[:-1]
            base = ("iri", t)
        return (_QUANT[quant], base) if quant else maybe_quant(base)

    def path_seq() -> tuple:
        parts = [path_atom()]
        while peek() == "/":
            take()
            parts.append(path_atom())
        return parts[0] if len(parts) == 1 else ("seq", parts)

    def path_expr() -> tuple:
        parts = [path_seq()]
        while peek() == "|":
            take()
            parts.append(path_seq())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def pred_term():
        """Predicate position: a ?var, or a property-path expression.
        Plain IRIs and single ``<p>+`` collapse to the string forms
        bgp_match already accepts; anything richer stays an AST."""
        if peek() is not None and peek().startswith("?"):
            return take()
        node = path_expr()
        if node[0] == "iri":
            return node[1]
        if node[0] == "plus" and node[1][0] == "iri":
            return node[1][1] + "+"
        return node

    def pattern_triple() -> tuple:
        s = term(take())
        p = pred_term()
        o = term(take())
        if peek() == ".":
            take()
        return (s, p, o)

    _AGGS = {"COUNT", "SUM", "MIN", "MAX", "AVG", "GROUP_CONCAT", "SAMPLE"}

    take("SELECT")
    if peek() and peek().upper() == "DISTINCT":
        take()
    proj = []  # list of ("var", name) | ("agg", fn, var, name)
    star = False
    while peek() and peek().upper() != "WHERE":
        t = take()
        if t == "*":
            star = True
        elif t.startswith("?"):
            proj.append(("var", t[1:]))
        elif t == "(":
            # (AGG(?v) AS ?name)
            fn = take().upper()
            if fn not in _AGGS:
                raise ValueError(f"unsupported aggregate {fn!r}")
            take("(")
            agg_distinct = False
            v = take()
            if v.upper() == "DISTINCT":
                agg_distinct = True
                v = take()
            if v == "*":
                if fn != "COUNT":
                    raise ValueError(f"{fn}(*) is not a SPARQL aggregate")
            elif not v.startswith("?"):
                raise ValueError(f"aggregate needs a ?var, got {v!r}")
            sep = None
            if peek() == ";":
                # GROUP_CONCAT(?v ; SEPARATOR = "lit") (§18.5.1.7)
                take()
                if take().upper() != "SEPARATOR":
                    raise ValueError("expected SEPARATOR after ';'")
                take("=")
                lit = take()
                if lit[0] not in "\"'":
                    raise ValueError("SEPARATOR needs a quoted literal")
                sep = lit[1:-1]
            take(")")
            take("AS")
            name = take()
            if not name.startswith("?"):
                raise ValueError(f"AS needs a ?name, got {name!r}")
            take(")")
            proj.append(
                ("agg", fn, v if v == "*" else v[1:], name[1:],
                 agg_distinct, sep)
            )
        else:
            raise ValueError(f"bad projection term {t!r}")
    if star and proj:
        raise ValueError("cannot mix * with named projection terms")
    if not star and not proj:
        raise ValueError("SELECT needs at least one projection term")
    take("WHERE")
    take("{")

    def _group() -> list:
        take("{")
        pats = []
        while peek() and peek() != "}":
            pats.append(pattern_triple())
        take("}")
        return pats

    patterns, optionals, minus, filters = [], [], None, []
    union_branches, values_clauses = None, []
    exists_clauses, binds, subqueries = [], [], []
    while peek() and peek() != "}":
        head = peek()
        if head == "{" and pos + 1 < len(toks) and toks[pos + 1].upper() == "SELECT":
            # subquery (§12): { SELECT ... WHERE { ... } ... } — extract
            # the token span, re-join (tokens preserve quoting/brackets),
            # and evaluate recursively; joined on shared variables below
            take()
            depth, start = 1, pos
            while depth:
                t = take()
                if t == "{":
                    depth += 1
                elif t == "}":
                    depth -= 1
            subqueries.append(" ".join(toks[start:pos - 1]))
        elif head == "{":
            # { g1 } UNION { g2 } [UNION { g3 } ...]
            if union_branches is not None:
                raise ValueError("only one UNION chain is supported")
            union_branches = [_group()]
            while peek() and peek().upper() == "UNION":
                take()
                union_branches.append(_group())
            if len(union_branches) < 2:
                raise ValueError("braced group without UNION")
        elif head.upper() == "OPTIONAL":
            take()
            optionals.append(_group())
        elif head.upper() == "MINUS":
            take()
            if minus is not None:
                raise ValueError("only one MINUS group is supported")
            minus = _group()
        elif head.upper() == "VALUES":
            # inline data: VALUES ?x { 'a' 'b' <c> } or
            # VALUES (?x ?y) { ('a' 'b') ('c' 'd') }
            take()
            if peek() == "(":
                take()
                vnames = []
                while peek() and peek() != ")":
                    v = take()
                    if not v.startswith("?"):
                        raise ValueError(f"VALUES needs ?vars, got {v!r}")
                    vnames.append(v[1:])
                take(")")
                if not vnames:
                    raise ValueError("empty VALUES variable list")
                take("{")
                rows = []
                while peek() and peek() != "}":
                    take("(")
                    row = []
                    while peek() and peek() != ")":
                        t = take()
                        if t.upper() == "UNDEF":
                            raise ValueError(
                                "VALUES UNDEF is not supported"
                            )
                        row.append(term(t))
                    take(")")
                    if len(row) != len(vnames):
                        raise ValueError(
                            f"VALUES row width {len(row)} != "
                            f"{len(vnames)} variables"
                        )
                    rows.append(tuple(row))
                take("}")
                values_clauses.append((vnames, rows))
            else:
                v = take()
                if not v.startswith("?"):
                    raise ValueError(f"VALUES needs a ?var, got {v!r}")
                take("{")
                vals = []
                while peek() and peek() != "}":
                    vals.append(term(take()))
                take("}")
                values_clauses.append(([v[1:]], [(x,) for x in vals]))
        elif head.upper() == "FILTER":
            take()
            nxt = peek()
            if nxt is not None and nxt.upper() in ("EXISTS", "NOT"):
                # FILTER (NOT) EXISTS { ... } (§8.1): correlated on the
                # shared variables -> one semi/anti join, never a filter
                # expression. The inner group is triple patterns only.
                positive = nxt.upper() == "EXISTS"
                take()
                if not positive:
                    take("EXISTS")
                exists_clauses.append((positive, _group()))
                continue
            take("(")
            depth, expr_toks = 1, []
            while depth:
                t = take()
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
                    if not depth:
                        break
                expr_toks.append(t)
            filters.append(_filter_expr_sql(expr_toks))
        elif head.upper() == "BIND":
            # BIND(expr AS ?var) (§7.6): expression over already-bound
            # variables, evaluated after the pattern group (the bound
            # variable is projectable / usable in modifiers, not in
            # subsequent patterns or FILTERs — documented restriction)
            take()
            take("(")
            depth, expr_toks = 1, []
            while depth:
                t = take()
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
                    if not depth:
                        break
                expr_toks.append(t)
            as_idx, d = None, 0
            for i, t in enumerate(expr_toks):
                if t == "(":
                    d += 1
                elif t == ")":
                    d -= 1
                elif d == 0 and t.upper() == "AS":
                    as_idx = i
            if as_idx is None or as_idx != len(expr_toks) - 2:
                raise ValueError("BIND needs the form BIND(expr AS ?var)")
            v = expr_toks[-1]
            if not v.startswith("?"):
                raise ValueError(f"BIND target must be a ?var, got {v!r}")
            binds.append((_filter_expr_sql(expr_toks[:as_idx]), v[1:]))
        else:
            patterns.append(pattern_triple())
    take("}")
    optional = optionals or None

    # trailing modifiers: GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET
    group_by, order_by, limit, offset = [], [], None, None
    having_toks = None
    while peek() is not None:
        head = take()
        if head.upper() == "GROUP":
            take("BY")
            while peek() and peek().startswith("?"):
                group_by.append(take()[1:])
        elif head.upper() == "ORDER":
            take("BY")
            while peek() and (
                peek().startswith("?")
                or peek().upper() in ("ASC", "DESC")
            ):
                t = take()
                if t.upper() in ("ASC", "DESC"):
                    if not order_by:
                        raise ValueError("ASC/DESC without a sort variable")
                    order_by[-1] = (order_by[-1][0], t.upper() == "DESC")
                else:
                    order_by.append((t[1:], False))
        elif head.upper() == "LIMIT":
            limit = int(take())
        elif head.upper() == "OFFSET":
            offset = int(take())
        elif head.upper() == "HAVING":
            take("(")
            depth, expr_toks = 1, []
            while depth:
                t = take()
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
                    if not depth:
                        break
                expr_toks.append(t)
            having_toks = expr_toks
        else:
            raise ValueError(f"unexpected token after pattern group: {head!r}")

    # evaluate subqueries first (§12 bottom-up evaluation); FILTERs that
    # reference subquery-only variables must wait until after the
    # subquery join that binds them (same group-scope rule as the
    # optional-only deferral in _apply_group_modifiers)
    sub_frames = [sparql_select(triples, s) for s in subqueries]
    deferred_sub = []
    if sub_frames:
        sub_vars = set().union(*[set(f.columns) for f in sub_frames])
        pat_vars = set()
        for pat in patterns + [p for g in optionals for p in g]:
            pat_vars |= _relation_vars(pat)
        for br in union_branches or []:
            for pat in br:
                pat_vars |= _relation_vars(pat)
        keep = []
        for fexpr in filters:
            ids = _filter_identifiers(fexpr)
            if (ids - pat_vars) and (ids & sub_vars):
                deferred_sub.append(fexpr)
            else:
                keep.append(fexpr)
        filters = keep

    if union_branches is not None:
        # SPARQL UNION (§7): branch solutions concatenated; variables a
        # branch doesn't bind come back null (unionByName padding)
        if patterns:
            raise ValueError(
                "cannot mix top-level patterns with a UNION chain"
            )
        frames = [bgp_match(triples, br) for br in union_branches]
        bound = set().union(*[set(f.columns) for f in frames])
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        out = _apply_group_modifiers(
            triples, out, bound, optional, filters, minus
        ).distinct()
    elif patterns:
        out = bgp_match(
            triples, patterns, optional=optional, filters=filters, minus=minus
        )
    elif sub_frames:
        # subquery-only group: the first subquery seeds the bindings;
        # group modifiers then apply over the joined frame
        out = sub_frames[0]
        for sub in sub_frames[1:]:
            shared = sorted(set(sub.columns) & set(out.columns))
            out = out.join(sub, on=shared) if shared else out.crossJoin(sub)
        sub_frames = []
        out = _apply_group_modifiers(
            triples, out, set(out.columns), optional, filters, minus
        ).distinct()
    else:
        raise ValueError("empty basic graph pattern")

    for sub in sub_frames:
        # §12 join semantics: subquery solutions join the group's
        # bindings on their shared variables (cross join when disjoint)
        shared = sorted(set(sub.columns) & set(out.columns))
        out = out.join(sub, on=shared) if shared else out.crossJoin(sub)
    for fexpr in deferred_sub:
        out = out.filter(F.expr(fexpr))

    for positive, grp in exists_clauses:
        sub = bgp_match(triples, grp)
        shared = sorted(set(sub.columns) & set(out.columns))
        if shared:
            out = out.join(
                sub.select(*shared).distinct(),
                on=shared,
                how="left_semi" if positive else "left_anti",
            )
        else:
            # uncorrelated EXISTS: the group either holds for every
            # solution or for none — one scalar probe decides
            if sub.limit(1).isEmpty() == positive:
                out = out.limit(0)

    for expr_sql, name in binds:
        refs = _filter_identifiers(expr_sql)
        missing = sorted(refs - set(out.columns))
        if missing:
            raise ValueError(f"BIND references unbound variables: {missing}")
        if name in out.columns:
            raise ValueError(f"BIND target ?{name} is already bound")
        out = out.withColumn(name, F.expr(expr_sql))

    for vnames, rows in values_clauses:
        missing = [v for v in vnames if v not in out.columns]
        if missing:
            raise ValueError(f"VALUES variables not bound: {missing}")
        if len(vnames) == 1:
            out = out.filter(F.col(vnames[0]).isin([r[0] for r in rows]))
        else:
            # multi-variable inline data: semi-join against the (tiny,
            # broadcast) literal table — SPARQL §10.2 join-with-VALUES
            inline = triples.sparkSession.createDataFrame(
                rows, schema=", ".join(f"{v} string" for v in vnames)
            ).dropDuplicates()
            out = out.join(F.broadcast(inline), on=vnames, how="left_semi")

    aggs = [p for p in proj if p[0] == "agg"]
    if having_toks is not None and not (aggs or group_by):
        raise ValueError("HAVING requires GROUP BY or an aggregate projection")
    if aggs or group_by:
        # aggregates evaluate over the DISTINCT solution set (bgp_match
        # set semantics, i.e. an implicit SELECT DISTINCT subquery)
        plain = [p[1] for p in proj if p[0] == "var"]
        if sorted(plain) != sorted(set(group_by)) and plain:
            missing = set(plain) - set(group_by)
            if missing:
                raise ValueError(
                    f"non-aggregated variables not in GROUP BY: {sorted(missing)}"
                )
        missing = [v for v in set(group_by) | {a[2] for a in aggs if a[2] != "*"}
                   if v not in out.columns]
        if missing:
            raise ValueError(f"variables not bound: {sorted(missing)}")
        exprs = []
        for _, fn, v, name, agg_distinct, sep in aggs:
            if v == "*":
                # COUNT(*): count solutions (already set-distinct)
                exprs.append(F.count(F.lit(1)).alias(name))
            elif fn == "GROUP_CONCAT":
                # §18.5.1.7 — values sorted lexicographically so the
                # result is deterministic under Spark's unordered groups
                vals = (
                    F.collect_set(v) if agg_distinct else F.collect_list(v)
                )
                exprs.append(
                    F.array_join(
                        F.sort_array(vals), sep if sep is not None else " "
                    ).alias(name)
                )
            elif fn == "SAMPLE":
                # §18.5.1.8 allows any value from the group; min() is the
                # deterministic choice
                exprs.append(F.min(v).alias(name))
            elif agg_distinct:
                exprs.append(F.expr(f"{fn.lower()}(DISTINCT {v})").alias(name))
            else:
                exprs.append(getattr(F, fn.lower())(v).alias(name))
        out = (
            out.groupBy(*group_by).agg(*exprs)
            if group_by
            else out.agg(*exprs)
        )
        if having_toks is not None:
            # HAVING (§7.5 grammar rule [22]): rewrite aggregate calls to
            # the matching projected alias, then filter post-aggregation.
            rewritten, i = [], 0
            while i < len(having_toks):
                t = having_toks[i]
                if (
                    t.upper() in _AGGS
                    and i + 1 < len(having_toks)
                    and having_toks[i + 1] == "("
                ):
                    j = i + 2
                    h_distinct = False
                    if j < len(having_toks) and having_toks[j].upper() == "DISTINCT":
                        h_distinct = True
                        j += 1
                    hv = having_toks[j] if j < len(having_toks) else None
                    if hv is None or (
                        j + 1 >= len(having_toks) or having_toks[j + 1] != ")"
                    ):
                        raise ValueError("HAVING aggregate must be AGG(?v)")
                    hv_name = hv if hv == "*" else hv[1:]
                    match = next(
                        (
                            a for a in aggs
                            if a[1] == t.upper()
                            and a[2] == hv_name
                            and a[4] == h_distinct
                        ),
                        None,
                    )
                    if match is None:
                        raise ValueError(
                            f"HAVING aggregate {t.upper()}({hv}) must also "
                            "be projected with an AS alias"
                        )
                    rewritten.append("?" + match[3])
                    i = j + 2
                else:
                    rewritten.append(t)
                    i += 1
            out = out.filter(F.expr(_filter_expr_sql(rewritten)))
    elif not star:
        names = [p[1] for p in proj]
        missing = [v for v in names if v not in out.columns]
        if missing:
            raise ValueError(f"projected variables not bound: {missing}")
        out = out.select(*names).distinct()

    for v, _ in order_by:
        if v not in out.columns:
            raise ValueError(f"ORDER BY variable not in result: {v!r}")
    if order_by:
        out = out.orderBy(
            *[F.desc(v) if d else F.asc(v) for v, d in order_by]
        )
    if offset is not None:
        out = out.offset(offset)  # OFFSET skips first, LIMIT then bounds
    if limit is not None:
        out = out.limit(limit)
    return out


def sparql_ask(triples: DataFrame, query: str) -> DataFrame:
    """SPARQL ASK (§16.3): does the pattern group have any solution?
    Accepts the same group grammar as sparql_select; returns a one-row
    (ask boolean) DataFrame — the existence probe stops at the first
    binding (limit 1), it never materializes the solution set."""
    re_ = __import__("re")
    m = re_.match(r"\s*ASK\s*(\{.*\})\s*$", query, re_.S | re_.I)
    if not m:
        raise ValueError("not an ASK query")
    found = not sparql_select(
        triples, "SELECT * WHERE " + m.group(1)
    ).limit(1).isEmpty()
    return triples.sparkSession.createDataFrame(
        [(found,)], "ask boolean"
    )


def sparql_construct(triples: DataFrame, query: str) -> DataFrame:
    """SPARQL CONSTRUCT (§16.2) — the KG-construction query form: solve
    the WHERE group, then instantiate the template's triple patterns once
    per solution; constants pass through, variables substitute. Returns
    the DISTINCT (subj, pred, obj) graph (CONSTRUCT builds an RDF graph,
    which is a set). Rows whose template instantiation leaves a null
    (an optional-only variable unbound in that solution) are dropped,
    per the spec's "incomplete triple" rule."""
    re_ = __import__("re")
    m = re_.match(
        r"\s*CONSTRUCT\s*\{(.*?)\}\s*WHERE\s*(\{.*\})\s*$",
        query,
        re_.S | re_.I,
    )
    if not m:
        raise ValueError("not a CONSTRUCT query")
    tmpl_toks = _SPARQL_RE.findall(m.group(1))

    def tterm(tok: str):
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok and tok[0] in "\"'" and tok[-1] == tok[0] and len(tok) >= 2:
            return tok[1:-1]
        return tok

    templates, i = [], 0
    while i < len(tmpl_toks):
        if tmpl_toks[i] == ".":
            i += 1
            continue
        if i + 2 >= len(tmpl_toks):
            raise ValueError("CONSTRUCT template needs (s p o) triples")
        templates.append(tuple(tterm(t) for t in tmpl_toks[i:i + 3]))
        i += 3
    if not templates:
        raise ValueError("empty CONSTRUCT template")

    bindings = sparql_select(triples, "SELECT * WHERE " + m.group(2))
    cols = set(bindings.columns)
    missing = {
        t[1:] for tr in templates for t in tr if _is_var(t)
    } - cols
    if missing:
        raise ValueError(
            f"CONSTRUCT template variables not bound: {sorted(missing)}"
        )
    out = None
    for s, p, o in templates:
        row = bindings.select(
            (F.col(s[1:]) if _is_var(s) else F.lit(s)).alias("subj"),
            (F.col(p[1:]) if _is_var(p) else F.lit(p)).alias("pred"),
            (F.col(o[1:]) if _is_var(o) else F.lit(o)).alias("obj"),
        )
        out = row if out is None else out.unionByName(row)
    return out.na.drop().distinct()


def sparql_describe(
    triples: DataFrame, query: str, form: str = "outbound"
) -> DataFrame:
    """SPARQL DESCRIBE (§16.4): return the triples describing a set of
    resources. The description form is implementation-defined by the
    spec; this engine returns the OUTBOUND concise description — every
    (subj, pred, obj) triple whose SUBJECT is a described resource
    (the common triple-store default), DISTINCT — or, with
    ``form="cbd"``, the full Concise Bounded Description (recursing
    through blank-node objects via concise_bounded_description below,
    the other spec-named form).

    Two query shapes::

        DESCRIBE <iri> [<iri> ...]
        DESCRIBE ?v [?u ...] WHERE { ... }    # resources = the vars'
                                              # bindings over the group

    Scale shape: the resource set is built once (constants union the
    DISTINCT bindings of the named variables) and semi-joined against
    the triple table — one scan, broadcast-eligible when small."""
    re_ = __import__("re")
    m = re_.match(
        r"\s*DESCRIBE\s+(.+?)\s*(?:WHERE\s*(\{.*\}))?\s*$",
        query,
        re_.S | re_.I,
    )
    if not m:
        raise ValueError("not a DESCRIBE query")
    head_toks = _SPARQL_RE.findall(m.group(1))
    vars_ = [t[1:] for t in head_toks if t.startswith("?")]
    consts = [
        t[1:-1] if (t.startswith("<") and t.endswith(">")) else t
        for t in head_toks
        if not t.startswith("?")
    ]
    if not vars_ and not consts:
        raise ValueError("DESCRIBE needs at least one resource or ?var")
    if vars_ and not m.group(2):
        raise ValueError("DESCRIBE with variables needs a WHERE group")
    spark = triples.sparkSession
    frames = []
    if consts:
        frames.append(spark.createDataFrame([(c,) for c in consts], "r string"))
    if vars_:
        bindings = sparql_select(triples, "SELECT * WHERE " + m.group(2))
        missing = [v for v in vars_ if v not in bindings.columns]
        if missing:
            raise ValueError(f"DESCRIBE variables not bound: {missing}")
        for v in vars_:
            frames.append(bindings.select(F.col(v).alias("r")).distinct())
    resources = frames[0]
    for f in frames[1:]:
        resources = resources.unionByName(f)
    res = resources.distinct()
    if form == "cbd":
        return concise_bounded_description(triples, res)
    if form != "outbound":
        raise ValueError(f"unknown DESCRIBE form: {form!r}")
    return triples.join(
        res, on=triples["subj"] == res["r"], how="left_semi"
    ).distinct()


def rdfs_schema_entailment(
    triples: DataFrame,
    subproperties: DataFrame | None = None,
    domains: DataFrame | None = None,
    ranges: DataFrame | None = None,
    type_pred: str = "rdf:type",
    rounds: int = 2,
) -> DataFrame:
    """Materialize the property-side RDFS rules that complete
    rdfs_entailment's class-side rdfs9 (W3C RDF 1.1 Semantics §9.2.1):

    - rdfs5+7: ``(s p o) ∧ p rdfs:subPropertyOf* q ⇒ (s q o)`` —
      the subproperty DAG is transitively closed first (repeated
      squaring, operators/closure.py), so one join applies the whole
      hierarchy.
    - rdfs2: ``(s p o) ∧ p rdfs:domain C ⇒ (s rdf:type C)``.
    - rdfs3: ``(s p o) ∧ p rdfs:range C ⇒ (o rdf:type C)``.

    ``subproperties``: (prop, superprop) direct edges; ``domains`` /
    ``ranges``: (prop, cls). Returns the DISTINCT closure of the input
    triples under the given rules.

    The rules feed each other (a domain-derived rdf:type triple is
    itself subject to rdfs7 if rdf:type has superproperties), so the
    pass runs `rounds` times; 2 reaches the fixpoint for every schema
    whose type predicate carries at most one level of its own schema
    (real ontologies converge in round 1 — round 2 is the guard).
    Schema tables are ontology-sized (the smallest tables of any KB),
    so every rule join broadcasts them; the instance table is scanned
    once per rule per round and deduped with one distinct."""
    from dbpedia_spotlight_spark.operators.closure import transitive_closure

    t = triples.select("subj", "pred", "obj")
    prop_closure = None
    if subproperties is not None:
        cols = subproperties.columns
        prop_closure = transitive_closure(
            subproperties.select(
                F.col(cols[0]).alias("class_id"), F.col(cols[1]).alias("ancestor_id")
            ),
            src="class_id",
            dst="ancestor_id",
        )
    for _ in range(rounds):
        new = [t]
        if prop_closure is not None:
            new.append(
                t.join(
                    F.broadcast(prop_closure), t["pred"] == prop_closure["class_id"]
                ).select("subj", F.col("ancestor_id").alias("pred"), "obj")
            )
        if domains is not None:
            d = domains.select(
                F.col(domains.columns[0]).alias("_p"),
                F.col(domains.columns[1]).alias("_c"),
            )
            new.append(
                t.join(F.broadcast(d), t["pred"] == F.col("_p")).select(
                    "subj", F.lit(type_pred).alias("pred"), F.col("_c").alias("obj")
                )
            )
        if ranges is not None:
            r = ranges.select(
                F.col(ranges.columns[0]).alias("_p"),
                F.col(ranges.columns[1]).alias("_c"),
            )
            new.append(
                t.join(F.broadcast(r), t["pred"] == F.col("_p")).select(
                    F.col("obj").alias("subj"),
                    F.lit(type_pred).alias("pred"),
                    F.col("_c").alias("obj"),
                )
            )
        out = new[0]
        for frag in new[1:]:
            out = out.unionByName(frag)
        t = out.distinct().localCheckpoint(eager=False)
    return t


def _parse_triple_templates(block: str, what: str) -> list:
    """Tokenize a `{ s p o . ... }` template block into (s, p, o) term
    triples (IRIs unwrapped, quoted literals unquoted, ?vars kept)."""
    toks = _SPARQL_RE.findall(block)

    def term(tok: str):
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok and tok[0] in "\"'" and tok[-1] == tok[0] and len(tok) >= 2:
            return tok[1:-1]
        return tok

    out, i = [], 0
    while i < len(toks):
        if toks[i] == ".":
            i += 1
            continue
        if i + 2 >= len(toks):
            raise ValueError(f"{what} template needs (s p o) triples")
        out.append(tuple(term(t) for t in toks[i:i + 3]))
        i += 3
    if not out:
        raise ValueError(f"empty {what} template")
    return out


def _instantiate_templates(bindings: DataFrame, templates: list) -> DataFrame:
    """One (subj, pred, obj) row per solution per template; solutions
    leaving a null slot (unbound optional var) drop, per the
    incomplete-triple rule. DISTINCT (graphs are sets)."""
    cols = set(bindings.columns)
    missing = {t[1:] for tr in templates for t in tr if _is_var(t)} - cols
    if missing:
        raise ValueError(f"template variables not bound: {sorted(missing)}")
    out = None
    for s, p, o in templates:
        row = bindings.select(
            (F.col(s[1:]) if _is_var(s) else F.lit(s)).alias("subj"),
            (F.col(p[1:]) if _is_var(p) else F.lit(p)).alias("pred"),
            (F.col(o[1:]) if _is_var(o) else F.lit(o)).alias("obj"),
        )
        out = row if out is None else out.unionByName(row)
    return out.na.drop().distinct()


def sparql_update(triples: DataFrame, query: str) -> DataFrame:
    """SPARQL 1.1 Update (§3.1) over an immutable triple DataFrame —
    returns the UPDATED graph (functional semantics: parquet/Iceberg
    tables version forward rather than mutate; pair with
    streaming/kg_ingest.py's CURRENT-marker commit for the storage
    side). Supported forms::

        INSERT DATA { ground triples }
        DELETE DATA { ground triples }
        DELETE WHERE { patterns }              # template == pattern
        DELETE { tmpl } INSERT { tmpl } WHERE { group }   # either
        INSERT { tmpl } WHERE { group }                   # part alone
        DELETE { tmpl } WHERE { group }

    Per §3.1.3 both templates instantiate against the bindings of the
    ORIGINAL graph, deletes apply before inserts, and a solution that
    leaves a template slot unbound drops that instantiation.

    Scale shape: one sparql_select solves the WHERE group; the delta
    graphs are tiny next to the KB, so the delete lands as a left_anti
    join (delta broadcast-eligible) and the insert as union+distinct —
    the same shapes as operators/kbmaintain.py:kb_diff.
    """
    re_ = __import__("re")
    q = query.strip()

    m = re_.match(r"INSERT\s+DATA\s*\{(.*)\}\s*$", q, re_.S | re_.I)
    if m:
        tmpl = _parse_triple_templates(m.group(1), "INSERT DATA")
        if any(_is_var(t) for tr in tmpl for t in tr):
            raise ValueError("INSERT DATA takes ground triples only")
        spark = triples.sparkSession
        delta = spark.createDataFrame(
            tmpl, "subj string, pred string, obj string"
        )
        return triples.unionByName(delta).distinct()

    m = re_.match(r"DELETE\s+DATA\s*\{(.*)\}\s*$", q, re_.S | re_.I)
    if m:
        tmpl = _parse_triple_templates(m.group(1), "DELETE DATA")
        if any(_is_var(t) for tr in tmpl for t in tr):
            raise ValueError("DELETE DATA takes ground triples only")
        spark = triples.sparkSession
        delta = spark.createDataFrame(
            tmpl, "subj string, pred string, obj string"
        )
        return triples.join(delta, ["subj", "pred", "obj"], "left_anti")

    m = re_.match(r"DELETE\s+WHERE\s*(\{.*\})\s*$", q, re_.S | re_.I)
    if m:
        tmpl = _parse_triple_templates(m.group(1)[1:-1], "DELETE WHERE")
        bindings = sparql_select(triples, "SELECT * WHERE " + m.group(1))
        dele = _instantiate_templates(bindings, tmpl)
        return triples.join(dele, ["subj", "pred", "obj"], "left_anti")

    m = re_.match(
        r"(?:DELETE\s*\{(?P<d>.*?)\}\s*)?(?:INSERT\s*\{(?P<i>.*?)\}\s*)?"
        r"WHERE\s*(?P<w>\{.*\})\s*$",
        q,
        re_.S | re_.I,
    )
    if m and (m.group("d") is not None or m.group("i") is not None):
        bindings = sparql_select(triples, "SELECT * WHERE " + m.group("w"))
        out = triples
        if m.group("d") is not None:
            dele = _instantiate_templates(
                bindings, _parse_triple_templates(m.group("d"), "DELETE")
            )
            out = out.join(dele, ["subj", "pred", "obj"], "left_anti")
        if m.group("i") is not None:
            ins = _instantiate_templates(
                bindings, _parse_triple_templates(m.group("i"), "INSERT")
            )
            out = out.unionByName(ins).distinct()
        return out

    raise ValueError(
        "unsupported update form (INSERT/DELETE DATA, DELETE WHERE, "
        "DELETE/INSERT ... WHERE)"
    )


def owl_property_entailment(
    triples: DataFrame,
    inverse_of: DataFrame | None = None,
    symmetric: DataFrame | None = None,
    transitive: DataFrame | None = None,
    max_iterations: int = 10,
) -> DataFrame:
    """OWL property-characteristic materialization, the property-side
    complement of rdfs_schema_entailment: owl:inverseOf ((s,p,o) &
    (p inv q) -> (o,q,s), both directions), owl:SymmetricProperty
    ((s,p,o) -> (o,p,s)), owl:TransitiveProperty (per-predicate
    transitive closure). Run to FIXPOINT, because the rules feed each
    other (the inverse of a transitively-derived edge must itself be
    asserted).

    Schema inputs: inverse_of(prop, inverse), symmetric(prop),
    transitive(prop) — ontology-sized, broadcast into every rule join.

    -> the entailed graph (base ∪ derived), distinct.

    Scale shape: each round is 2-3 broadcast equi-joins + one
    repeated-squaring closure restricted to the transitive predicates'
    edges (never the whole KB); lineage truncated per round. Real
    ontologies close in 2-3 rounds (the loop guard is for pathological
    rule feedback).
    """
    from dbpedia_spotlight_spark.operators.closure import transitive_closure

    spark = triples.sparkSession
    inv = None
    if inverse_of is not None:
        fwd = inverse_of.select(
            F.col("prop").alias("_p"), F.col("inverse").alias("_q")
        )
        inv = fwd.unionByName(
            fwd.select(F.col("_q").alias("_p"), F.col("_p").alias("_q"))
        ).distinct()
    sym = (
        symmetric.select(F.col("prop").alias("_p")).distinct()
        if symmetric is not None
        else None
    )
    trans = (
        transitive.select(F.col("prop").alias("_p")).distinct()
        if transitive is not None
        else None
    )

    cur = triples.select("subj", "pred", "obj").distinct().localCheckpoint()
    n = cur.count()
    for _ in range(max_iterations):
        derived = [cur]
        if inv is not None:
            derived.append(
                cur.join(
                    F.broadcast(inv), cur["pred"] == F.col("_p")
                ).select(
                    F.col("obj").alias("subj"),
                    F.col("_q").alias("pred"),
                    F.col("subj").alias("obj"),
                )
            )
        if sym is not None:
            derived.append(
                cur.join(
                    F.broadcast(sym), cur["pred"] == F.col("_p")
                ).select(
                    F.col("obj").alias("subj"),
                    "pred",
                    F.col("subj").alias("obj"),
                )
            )
        if trans is not None:
            tedges = cur.join(
                F.broadcast(trans), cur["pred"] == F.col("_p")
            ).select("pred", F.col("subj").alias("src"), F.col("obj").alias("dst"))
            preds = [r._p for r in trans.collect()]  # ontology-sized
            for p in preds:
                closed = transitive_closure(
                    tedges.filter(F.col("pred") == p).select("src", "dst")
                )
                derived.append(
                    closed.select(
                        F.col("src").alias("subj"),
                        F.lit(p).alias("pred"),
                        F.col("dst").alias("obj"),
                    )
                )
        stepped = derived[0]
        for d in derived[1:]:
            stepped = stepped.unionByName(d)
        stepped = stepped.distinct().localCheckpoint()
        n_next = stepped.count()
        cur = stepped
        if n_next == n:
            return cur
        n = n_next
    raise RuntimeError(
        f"owl_property_entailment did not converge in {max_iterations} rounds"
    )


# ---------------------------------------------------------------------------
# Named graphs: GRAPH clause over quad tables (SPARQL 1.1 §13)
# ---------------------------------------------------------------------------


def graph_bgp_match(
    quads: DataFrame,
    gterm: str,
    patterns: list[tuple[str, str, str]],
    graph_col: str = "graph",
) -> DataFrame:
    """Match a basic graph pattern inside a GRAPH clause against a quad
    table (subj, pred, obj, <graph_col>) — SPARQL 1.1 §13.3: every
    pattern in the group matches within the SAME graph; ``gterm`` is
    either ``?var`` (the graph name becomes a binding, one result row
    per graph it matches in) or a constant IRI (restricts the group to
    that graph). Returns one column per variable (incl. the graph var).

    Scale shape: identical to bgp_match — each pattern is a
    constant-filtered scan projected to its variable columns (the graph
    column rides along as one more variable position), joined
    most-constrained-first on shared variables. With a variable graph
    term the graph var is shared by construction, so the within-group
    joins are always connected (never a cross join); with a constant
    the graph filter pushes into every scan."""
    if not patterns:
        raise ValueError("empty GRAPH group")
    quads = quads.withColumnRenamed(graph_col, "_g")

    def _rel(pat):
        if len(pat) != 3:
            raise ValueError(f"pattern must be a (s,p,o) triple: {pat!r}")
        df = quads
        positions = [
            ("_g", gterm),
            ("subj", pat[0]), ("pred", pat[1]), ("obj", pat[2]),
        ]
        cols, seen = [], {}
        for col, t in positions:
            if _is_var(t):
                name = t[1:]
                if name in seen:
                    df = df.filter(F.col(col) == F.col(seen[name]))
                else:
                    seen[name] = col
                    cols.append(F.col(col).alias(name))
            else:
                df = df.filter(F.col(col) == F.lit(t))
        return df.select(*cols), set(seen)

    order = sorted(
        range(len(patterns)),
        key=lambda i: -sum(0 if _is_var(t) else 1 for t in patterns[i]),
    )
    remaining = list(order)
    result, bound = _rel(patterns[remaining.pop(0)])
    while remaining:
        pick = next(
            (
                i
                for i in remaining
                if {t[1:] for t in patterns[i] if _is_var(t)} & bound
                or _is_var(gterm)
            ),
            remaining[0],
        )
        remaining.remove(pick)
        rel, vs = _rel(patterns[pick])
        shared = sorted(vs & bound)
        result = (
            result.join(rel, on=shared) if shared else result.crossJoin(rel)
        )
        bound |= vs
    return result.distinct()


def sparql_select_quads(
    quads: DataFrame, query: str, graph_col: str = "graph"
) -> DataFrame:
    """SPARQL SELECT over a NAMED-GRAPH dataset — a quad table
    (subj, pred, obj, <graph_col>), e.g. the with_graph /
    lift_named_graphs output that to_nquads serializes.

    Supported subset (a dedicated §13 front end next to sparql_select's
    single-graph grammar; unsupported syntax raises ValueError):

        SELECT (DISTINCT)? (?v ... | *) WHERE {
            ?s <p> ?o .                      # default-graph pattern:
                                             #   matches the UNION of all
                                             #   graphs (RDF-dataset
                                             #   default-as-union, the
                                             #   common store behavior)
            GRAPH ?g { ?s <p2> ?x . ... }    # graph var becomes a binding
            GRAPH <http://g> { ... }         # constant graph restriction
            FILTER(...)                      # over any bound variable,
                                             #   applied after all joins
        }

    Any number of GRAPH groups; groups and the default-graph block join
    on shared variables (connected-first order). FILTER supports the
    full builtin set of _filter_expr_sql incl. LANG/DATATYPE/
    LANGMATCHES. Property paths / OPTIONAL / MINUS inside GRAPH groups
    are not supported here — lift the group to a triple view and use
    sparql_select for those.

    Scale: each GRAPH group compiles via graph_bgp_match (constant
    graphs push a filter into every scan; variable graphs join within
    one graph by construction); the default-graph block reuses the full
    cost-ordered bgp_match over the projected triple view. Cross-block
    joins are equi-joins on shared variables."""
    toks = _SPARQL_RE.findall(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected: str | None = None) -> str:
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(f"unexpected end of query (wanted {expected})")
        t = toks[pos]
        pos += 1
        if expected and t.upper() != expected.upper():
            raise ValueError(f"expected {expected}, got {t!r}")
        return t

    def term(tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok and tok[0] in "\"'":
            return tok[1:-1]
        return tok

    take("SELECT")
    if peek() and peek().upper() == "DISTINCT":
        take()  # bgp set semantics are already distinct
    proj = []
    while peek() and peek().upper() != "WHERE":
        t = take()
        if t == "*":
            proj = None
        elif t.startswith("?"):
            proj.append(t[1:])
        else:
            raise ValueError(f"bad projection term {t!r}")
    take("WHERE")
    take("{")

    def pattern_triple():
        s, p, o = term(take()), term(take()), term(take())
        if peek() == ".":
            take()
        return (s, p, o)

    default_pats, graph_groups, filters = [], [], []
    while peek() and peek() != "}":
        head = peek()
        if head.upper() == "GRAPH":
            take()
            g = term(take())
            take("{")
            pats = []
            while peek() and peek() != "}":
                pats.append(pattern_triple())
            take("}")
            graph_groups.append((g, pats))
        elif head.upper() == "FILTER":
            take()
            take("(")
            depth, expr_toks = 1, []
            while depth:
                t = take()
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
                    if not depth:
                        break
                expr_toks.append(t)
            filters.append(_filter_expr_sql(expr_toks))
        else:
            default_pats.append(pattern_triple())
    take("}")
    if not default_pats and not graph_groups:
        raise ValueError("empty WHERE block")

    blocks: list[tuple[DataFrame, set]] = []
    if default_pats:
        tri = quads.select("subj", "pred", "obj")
        df = bgp_match(tri, default_pats)
        blocks.append((df, set(df.columns)))
    for g, pats in graph_groups:
        df = graph_bgp_match(quads, g, pats, graph_col=graph_col)
        blocks.append((df, set(df.columns)))

    result, bound = blocks[0]
    rest = blocks[1:]
    while rest:
        i = next(
            (k for k, (_, vs) in enumerate(rest) if vs & bound), 0
        )
        df, vs = rest.pop(i)
        shared = sorted(vs & bound)
        result = result.join(df, on=shared) if shared else result.crossJoin(df)
        bound |= vs
    for f in filters:
        result = result.filter(F.expr(f))
    if proj is not None:
        missing = [v for v in proj if v not in bound]
        if missing:
            raise ValueError(f"projected variables not bound: {missing}")
        result = result.select(*proj)
    return result.distinct()


def disjointness_violations(
    triples: DataFrame,
    disjoint_pairs: DataFrame,
    type_pred: str = "rdf:type",
    subclass_closure: DataFrame | None = None,
) -> DataFrame:
    """owl:disjointWith consistency check — the class-level integrity
    constraint a KB built by statistical extraction needs most: an
    entity typed both Person and Organization is a linking error, not a
    fact. Finds every instance typed (directly, or through the optional
    (sub, sup) subclass closure) in BOTH classes of a declared disjoint
    pair.

    disjoint_pairs(a, b): ontology-sized, broadcast; normalized
    internally so (a,b) and (b,a) declarations are equivalent and each
    violation reports once with a <= b.

    -> (inst, class_a, class_b). Scale shape: the type table shuffles
    once on the instance key for the self-join; the disjoint-pair
    filter is a broadcast semi-join on the (tiny) class-pair key, so
    the self-join's output is pruned to declared pairs before any
    materialization (the join condition includes the pair equi-key).
    """
    from pyspark.sql.functions import broadcast

    types = triples.filter(F.col("pred") == type_pred).select(
        F.col("subj").alias("inst"), F.col("obj").alias("cls")
    )
    if subclass_closure is not None:
        inherited = (
            types.join(
                broadcast(
                    subclass_closure.select(
                        F.col("sub").alias("cls"), F.col("sup").alias("_sup")
                    )
                ),
                "cls",
            )
            .select("inst", F.col("_sup").alias("cls"))
        )
        types = types.unionByName(inherited).distinct()
    else:
        types = types.distinct()
    pairs = broadcast(
        disjoint_pairs.select(
            F.least("a", "b").alias("class_a"),
            F.greatest("a", "b").alias("class_b"),
        ).distinct()
    )
    t2 = types.select(F.col("inst"), F.col("cls").alias("class_b"))
    return (
        types.withColumnRenamed("cls", "class_a")
        .join(t2, "inst")
        .filter(F.col("class_a") < F.col("class_b"))
        .join(pairs, ["class_a", "class_b"])
        .select("inst", "class_a", "class_b")
    )


def datalog_fixpoint(
    triples: DataFrame,
    rules: list[tuple[list[tuple[str, str, str]], tuple[str, str, str]]],
    max_rounds: int = 20,
) -> DataFrame:
    """Generic datalog-lite rule engine over a triple table — the
    user-defined-inference layer (SWRL / SPIN / OWL 2 RL custom rules)
    that generalizes this module's fixed entailments: each rule is
    (body, head) where body is a BGP (list of (s, p, o) patterns,
    "?var" or constant terms) and head is one (s, p, o) template over
    the body's variables and constants. Rules are applied jointly to
    FIXPOINT: round k evaluates every body against everything derived
    so far (bgp_match — selectivity-ordered joins), projects the heads,
    and unions new facts in; terminates when a round derives nothing.

    Recursive rules (transitivity) converge in depth rounds — naive
    evaluation, each round re-deriving the known set plus one frontier;
    the standard semi-naive delta restriction is a planned refinement
    and the docstring says so rather than pretending. For the log-depth
    special case of a single transitive predicate use
    closure.transitive_closure directly.

    -> the saturated graph (base ∪ derived), distinct. Raises
    RuntimeError when max_rounds rounds still derive new facts, and
    ValueError for a head variable the body never binds (caught at
    plan time, not as a mid-job AnalysisException).
    """
    def _term(t: str, bound: set[str]):
        if t.startswith("?"):
            if t[1:] not in bound:
                raise ValueError(
                    f"head term {t} is not bound by the rule body"
                )
            return F.col(t[1:])
        return F.lit(t)

    for body, head in rules:
        bound = {
            t[1:] for pat in body for t in pat if t.startswith("?")
        }
        for t in head:
            _term(t, bound)

    known = triples.select("subj", "pred", "obj").distinct().localCheckpoint()
    n = known.count()
    for _ in range(max_rounds):
        derived = None
        for body, head in rules:
            b = bgp_match(known, body)
            bound = set(b.columns)
            h = b.select(
                _term(head[0], bound).alias("subj"),
                _term(head[1], bound).alias("pred"),
                _term(head[2], bound).alias("obj"),
            )
            derived = h if derived is None else derived.unionByName(h)
        stepped = known.unionByName(derived).distinct().localCheckpoint()
        n_next = stepped.count()
        if n_next == n:
            return stepped
        known, n = stepped, n_next
    raise RuntimeError(
        f"datalog_fixpoint did not converge in {max_rounds} rounds"
    )


def mine_composition_rules(
    triples: DataFrame,
    min_support: int = 2,
    min_confidence: float = 0.1,
    type_pred: str = "rdf:type",
) -> DataFrame:
    """AMIE-lite rule mining — the INVERSE of datalog_fixpoint: discover
    which 2-atom horn rules  head(?a,?b) <= body1(?a,?c) ∧ body2(?c,?b)
    the KG itself supports (Galárraga et al. WWW'13, restricted to the
    closed path-rule shape that covers the bulk of AMIE's useful output:
    locatedIn <= inNation ∘ within, and friends). The mined rules feed
    straight back into datalog_fixpoint for KB completion.

    support    = #distinct (a, b) pairs satisfying body AND head
    confidence = support / #distinct (a, b) pairs satisfying the body
    (standard CWA confidence; AMIE's PCA variant is a one-filter
    refinement on the denominator, documented not implemented).

    Scale shape: the body enumeration is ONE self-join on the shared
    node — cost Σ_node in-degree × out-degree, the same wedge bound as
    triangle counting, keyed joins throughout; per-(q, r) distinct pair
    counting and the head probe are groupBys keyed on the (a, b) pair.
    Type triples are excluded (class memberships would dominate every
    wedge). head == body1 == body2 rules are KEPT — that shape is
    transitivity (within <= within ∘ within), among the most useful
    rules this miner can find.

    -> (head_pred, body_pred1, body_pred2, support, n_body,
    confidence desc) rounded to 6.
    """
    e = triples.filter(F.col("pred") != type_pred).select(
        "subj", "pred", "obj"
    )
    comp = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.obj") == F.col("y.subj"))
        .select(
            F.col("x.subj").alias("a"),
            F.col("y.obj").alias("b"),
            F.col("x.pred").alias("q"),
            F.col("y.pred").alias("r"),
        )
        .distinct()
    )
    n_body = comp.groupBy("q", "r").agg(F.count("*").alias("n_body"))
    heads = e.select(
        F.col("subj").alias("a"),
        F.col("obj").alias("b"),
        F.col("pred").alias("p"),
    ).distinct()
    support = (
        comp.join(heads, ["a", "b"])
        .groupBy("p", "q", "r")
        .agg(F.count("*").alias("support"))
    )
    return (
        support.join(n_body, ["q", "r"])
        .filter(F.col("support") >= min_support)
        .withColumn(
            "confidence", F.round(F.col("support") / F.col("n_body"), 6)
        )
        .filter(F.col("confidence") >= min_confidence)
        .select(
            F.col("p").alias("head_pred"),
            F.col("q").alias("body_pred1"),
            F.col("r").alias("body_pred2"),
            "support",
            "n_body",
            "confidence",
        )
    )


def wup_similarity(
    subclass: DataFrame,
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Wu-Palmer taxonomy similarity (Wu & Palmer, ACL'94) between class
    pairs over a subclass TREE: wup(a, b) = 2·depth(lca) / (depth(a) +
    depth(b)), the standard ontology-aware "how related are these two
    types" measure (entity-typing evaluation, type-constrained candidate
    pruning) — graded where subclass-closure membership is binary.

    ``subclass``: (sub, sup) tree edges (single parent; DAGs with
    multiple inheritance make depth ambiguous — split them first).
    ``pairs``: (a, b) class pairs to score — an explicit pair table,
    never all-pairs, so the caller controls the join size.

    Ancestor sets via the repeated-squaring transitive closure plus the
    identity (a class is its own ancestor); depth(x) = |ancestors(x)|
    (root depth 1); lca = the shared ancestor of maximum depth, found
    by joining the two ancestor sets on the ancestor id — per-pair work
    bounded by depth², i.e. ontology-constant. -> (a, b, lca, depth_a,
    depth_b, wup rounded to 6).
    """
    from .closure import transitive_closure

    e = subclass.select(F.col("sub").alias("src"), F.col("sup").alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    anc = (
        transitive_closure(e, max_iterations=max_iterations)
        .select(F.col("src").alias("node"), F.col("dst").alias("anc"))
        .unionByName(nodes.select("node", F.col("node").alias("anc")))
        .distinct()
    )
    depth = anc.groupBy("node").agg(F.count("*").alias("depth"))
    p = pairs.select("a", "b")
    aa = anc.select(F.col("node").alias("a"), F.col("anc"))
    ab = anc.select(F.col("node").alias("b"), F.col("anc"))
    common = p.join(aa, "a").join(ab, ["b", "anc"])
    ranked = common.join(
        depth.select(F.col("node").alias("anc"), F.col("depth").alias("_d")),
        "anc",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a", "b").orderBy(
        F.col("_d").desc(), F.col("anc").asc()
    )
    lca = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("a", "b", F.col("anc").alias("lca"), F.col("_d").alias("_dl"))
    )
    da = depth.select(F.col("node").alias("a"), F.col("depth").alias("depth_a"))
    db = depth.select(F.col("node").alias("b"), F.col("depth").alias("depth_b"))
    return (
        lca.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "lca",
            "depth_a",
            "depth_b",
            F.round(
                2.0 * F.col("_dl") / (F.col("depth_a") + F.col("depth_b")), 6
            ).alias("wup"),
        )
    )


def ic_similarity(
    subclass: DataFrame,
    instances: DataFrame,
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Information-content class similarity (Resnik, IJCAI'95; Lin,
    ICML'98) — the corpus-weighted complement of wup_similarity above:
    where Wu-Palmer only sees taxonomy DEPTH, IC weights each class by
    how selective it actually is in the instance data. IC(c) =
    -ln(n(c)/N) with n(c) = distinct instances typed with c or any
    descendant and N = all typed instances; resnik(a,b) = IC(mica),
    lin(a,b) = 2·IC(mica) / (IC(a)+IC(b)) where mica is the shared
    ancestor of MAXIMUM IC (most informative common ancestor).

    ``subclass``: (sub, sup) edges; ``instances``: (inst, cls) direct
    type assertions; ``pairs``: explicit (a, b) pair table (caller
    controls the join size — never all-pairs). -> (a, b, mica, resnik,
    lin), both scores rounded to 6; lin is 0.0 when IC(a)+IC(b) = 0
    (both classes cover the whole corpus — by convention, not division).

    Scale shape: subtree counts = instances ⋈ ancestor-closure on cls
    then ONE distinct+groupBy over (anc, inst) — the closure is
    ontology-sized (repeated squaring, log-depth), the only
    corpus-sized pass is that single join; per-pair MICA work is
    bounded by depth² like the LCA pick in wup_similarity.
    """
    from .closure import transitive_closure

    e = subclass.select(F.col("sub").alias("src"), F.col("sup").alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    anc = (
        transitive_closure(e, max_iterations=max_iterations)
        .select(F.col("src").alias("node"), F.col("dst").alias("anc"))
        .unionByName(nodes.select("node", F.col("node").alias("anc")))
        .distinct()
    )
    inst = instances.select(
        F.col("inst").alias("_i"), F.col("cls").alias("node")
    ).distinct()
    subtree = (
        inst.join(anc, "node")
        .select("_i", "anc")
        .distinct()
        .groupBy("anc")
        .agg(F.count("*").alias("_n"))
    )
    total = inst.select("_i").distinct().count()
    ic = subtree.select(
        "anc", (-F.log(F.col("_n") / F.lit(float(total)))).alias("_ic")
    )
    p = pairs.select("a", "b")
    aa = anc.select(F.col("node").alias("a"), F.col("anc"))
    ab = anc.select(F.col("node").alias("b"), F.col("anc"))
    common = p.join(aa, "a").join(ab, ["b", "anc"]).join(ic, "anc")
    from pyspark.sql import Window

    w = Window.partitionBy("a", "b").orderBy(
        F.col("_ic").desc(), F.col("anc").asc()
    )
    mica = (
        common.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("a", "b", F.col("anc").alias("mica"), F.col("_ic").alias("_im"))
    )
    ia = ic.select(F.col("anc").alias("a"), F.col("_ic").alias("_ia"))
    ib = ic.select(F.col("anc").alias("b"), F.col("_ic").alias("_ib"))
    return (
        mica.join(ia, "a")
        .join(ib, "b")
        .select(
            "a",
            "b",
            "mica",
            # + 0.0 canonicalizes IEEE -0.0 (IC of the root is -ln(1))
            # to 0.0 so every engine serializes the zero the same way
            (F.round("_im", 6) + F.lit(0.0)).alias("resnik"),
            (
                F.round(
                    F.when(
                        F.col("_ia") + F.col("_ib") > 0.0,
                        2.0 * F.col("_im") / (F.col("_ia") + F.col("_ib")),
                    ).otherwise(F.lit(0.0)),
                    6,
                )
                + F.lit(0.0)
            ).alias("lin"),
        )
    )


def _delta_pat_df(t: DataFrame, pat: tuple) -> DataFrame:
    """Instantiate one triple pattern against one source table:
    constants filter, variables project (repeated vars equi-filter)."""
    df = t
    bind, seen = [], {}
    for term, col in zip(pat, ("subj", "pred", "obj")):
        if isinstance(term, str) and term.startswith("?"):
            v = term[1:]
            if v in seen:
                df = df.filter(F.col(col) == F.col(seen[v]))
            else:
                seen[v] = col
                bind.append(F.col(col).alias(v))
        else:
            df = df.filter(F.col(col) == term)
    return df.select(*bind).distinct()


def bgp_view_delta(
    base: DataFrame,
    adds: DataFrame,
    dels: DataFrame,
    patterns: list,
) -> DataFrame:
    """Incremental maintenance of a conjunctive-BGP view (the delta
    rule of incremental Datalog — DRed/DBToaster reduced to positive
    set-semantics conjunctive queries): given the base triple table
    and a changeset, compute the VIEW's change rows without
    recomputing bgp(new) from scratch — the operator a continuously
    maintained KB needs to keep materialized query results (entity
    cards, dashboards, downstream caches) fresh per ingest batch.

    Candidates come from the telescoping delta expansion — for
    patterns p1..pn, ∪_i join(new for j<i, Δ at i, old for j>i) — so
    every term is DELTA-DRIVEN (pattern i only reads changed
    triples); set-semantics verification then keeps a candidate as
    'add' iff it holds in new but not old (reverse for 'del'), via
    per-pattern semi-joins over the candidate set.

    -> binding columns (the patterns' variables, sorted) + op in
    {'add', 'del'}; empty when the changeset doesn't touch the view.

    Scale shape: the base/new tables are only ever probed by keyed
    joins whose build side is delta-sized; no full bgp(new) is
    materialized. Verification is 2n semi-joins over candidates.
    Patterns sharing no variable cross-join (same caveat as
    bgp_match — keep BGPs connected).
    """
    if not patterns:
        raise ValueError("bgp_view_delta needs >= 1 pattern")
    cols3 = ["subj", "pred", "obj"]
    old = base.select(*cols3).distinct()
    a = adds.select(*cols3).distinct()
    d = dels.select(*cols3).distinct()
    new = old.join(d, cols3, "left_anti").unionByName(a).distinct()
    delta = a.unionByName(d).distinct()

    def conj(tables):
        out = None
        for t, pat in zip(tables, patterns):
            pd = _delta_pat_df(t, pat)
            if out is None:
                out = pd
            else:
                common = [c for c in out.columns if c in pd.columns]
                out = out.join(pd, common) if common else out.crossJoin(pd)
        return out

    n = len(patterns)
    cand = None
    for i in range(n):
        term = conj(
            [new if j < i else (delta if j == i else old) for j in range(n)]
        )
        term = term.select(*sorted(term.columns))
        cand = term if cand is None else cand.unionByName(term)
    cand = cand.distinct()

    def holds(table):
        out = cand
        for pat in patterns:
            pd = _delta_pat_df(table, pat)
            out = out.join(pd, [c for c in pd.columns], "left_semi")
        return out

    in_new = holds(new)
    in_old = holds(old)
    keys = cand.columns
    added = in_new.join(in_old, keys, "left_anti").withColumn(
        "op", F.lit("add")
    )
    removed = in_old.join(in_new, keys, "left_anti").withColumn(
        "op", F.lit("del")
    )
    return added.unionByName(removed)


def concise_bounded_description(
    triples: DataFrame,
    resources: DataFrame,
    max_depth: int = 8,
) -> DataFrame:
    """Concise Bounded Description (Stickler, W3C CBD 2005 — the
    description form SPARQL §16.4 cites by name, and the upgrade over
    sparql_describe's outbound-only default): starting from the
    resource set, take all outbound triples, and RECURSE through
    blank-node objects — a bnode is scoped to its graph, so a
    description that stops at ``_:addr`` is unusable; CBD closes over
    them (ground IRIs/literals stay frontier-terminal).

    ``resources``: one column ``r``. -> the distinct CBD triples.
    Raises if bnode chains exceed max_depth (the spec's descriptions
    are finite because bnode structures are trees/DAGs in practice;
    a cycle of bnodes would converge by the dedupe, but pathological
    depth signals modeling trouble).

    Scale shape per round: ONE semi-join of the triple table against
    the current frontier (broadcast-eligible — frontiers are
    resource-set-sized) + a bnode filter for the next frontier, with
    accumulated-set dedupe; rounds bounded by the bnode-chain depth,
    a small constant in real data.
    """
    frontier = resources.select(F.col("r").alias("subj")).distinct()
    seen = frontier
    out = None
    for _ in range(max_depth):
        step = triples.join(frontier, "subj", "left_semi").select(
            "subj", "pred", "obj"
        )
        out = step if out is None else out.unionByName(step)
        nxt = (
            step.filter(F.col("obj").startswith("_:"))
            .select(F.col("obj").alias("subj"))
            .distinct()
            .join(seen, "subj", "left_anti")
        )
        if nxt.isEmpty():
            return out.distinct()
        seen = seen.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.localCheckpoint(eager=False)
    raise RuntimeError(
        f"concise_bounded_description exceeded max_depth={max_depth}"
    )
