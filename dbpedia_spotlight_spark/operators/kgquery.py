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


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]] | None = None,
    filters: list[str] | None = None,
    minus: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Match a SPARQL-style basic graph pattern against a triple table.

    ``triples``: columns (subj, pred, obj). ``patterns``: list of
    (s, p, o) where each term is either a constant or a "?var". Returns
    one column per distinct variable, one row per distinct binding
    (SPARQL set semantics for SELECT DISTINCT).

    ``optional``: a second pattern group with SPARQL OPTIONAL semantics —
    its bindings are LEFT-joined on the variables shared with the
    required group, so non-matching rows survive with nulls in the
    optional-only variables (SPARQL 1.1 §5.4 left join algebra; the
    optional group must share >= 1 variable with the required group).

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
    """
    if not patterns:
        raise ValueError("empty basic graph pattern")
    for pat in list(patterns) + list(optional or []) + list(minus or []):
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
        log2(D) join rounds, not D."""
        s_term, p_term, o_term = pat
        if (
            not _is_var(p_term)
            and isinstance(p_term, str)
            and p_term.endswith("+")
            and len(p_term) > 1
        ):
            from dbpedia_spotlight_spark.operators.closure import (
                transitive_closure,
            )

            base = triples.filter(
                F.col("pred") == F.lit(p_term[:-1])
            ).select("subj", "obj")
            df = transitive_closure(base, src="subj", dst="obj")
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


def _apply_group_modifiers(
    triples: DataFrame,
    result: DataFrame,
    bound: set,
    optional: list | None,
    filters: list | None,
    minus: list | None,
) -> DataFrame:
    """FILTER → MINUS → OPTIONAL over a binding frame (shared by
    bgp_match and sparql_select's UNION path)."""
    for expr in filters or []:
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
    if optional:
        opt = bgp_match(triples, optional)
        shared = sorted(set(opt.columns) & bound)
        if not shared:
            raise ValueError(
                "OPTIONAL group shares no variable with the required group"
            )
        result = result.join(opt, on=shared, how="left")
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
    <[^>]*>\+?           |  # IRI, optional + property-path suffix
    "(?:[^"\\]|\\.)*"    |  # double-quoted literal
    '(?:[^'\\]|\\.)*'    |  # single-quoted literal
    [{}().]              |  # structure
    [^\s{}().]+             # bareword / keyword (stops at structure)
    """,
    __import__("re").VERBOSE,
)


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL SELECT query (conjunctive subset) against a triple
    table — the user-facing entry to bgp_match.

    Supported grammar (enough for the BGP + OPTIONAL + FILTER algebra
    the engine implements; anything else raises ValueError):

        SELECT (DISTINCT)? (?v ... | *) WHERE {
            ?s <p> ?o .  ...                 # triple patterns
            OPTIONAL { ?s <p2> ?x . ... }    # at most one OPTIONAL group
            MINUS { ?s <p3> ?y . ... }       # at most one MINUS group
            FILTER(?x != "lit" && ...)       # any number of FILTERs
            VALUES ?x { 'a' 'b' <c> }        # single-var inline data
        }

    Terms: ``?var``, ``<iri>`` (angle brackets stripped), quoted
    literals, or barewords. FILTER expressions translate to Spark SQL
    (``?x`` → column ``x``; ``&&``/``||`` → AND/OR; ``=`` → ``==``).
    SELECT with named variables projects them; ``*`` keeps every
    variable. DISTINCT is implicit (bgp_match returns set semantics,
    per SELECT DISTINCT).

    Solution modifiers after the pattern group:
    ``(COUNT(?v) AS ?n)`` (also SUM/MIN/MAX/AVG) with ``GROUP BY ?k``,
    ``ORDER BY ?v [ASC|DESC]``, and ``LIMIT n``. Aggregates evaluate
    over the DISTINCT solution set (set-semantics subquery); every
    non-aggregated projected variable must appear in GROUP BY.
    Anything unparsed after the modifiers raises."""
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

    _AGGS = {"COUNT", "SUM", "MIN", "MAX", "AVG"}

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
            v = take()
            if not v.startswith("?"):
                raise ValueError(f"aggregate needs a ?var, got {v!r}")
            take(")")
            take("AS")
            name = take()
            if not name.startswith("?"):
                raise ValueError(f"AS needs a ?name, got {name!r}")
            take(")")
            proj.append(("agg", fn, v[1:], name[1:]))
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
            s, p, o = take(), take(), take()
            pats.append((term(s), term(p), term(o)))
            if peek() == ".":
                take()
        take("}")
        return pats

    patterns, optional, minus, filters = [], None, None, []
    union_branches, values_clauses = None, []
    while peek() and peek() != "}":
        head = peek()
        if head == "{":
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
            if optional is not None:
                raise ValueError("only one OPTIONAL group is supported")
            optional = _group()
        elif head.upper() == "MINUS":
            take()
            if minus is not None:
                raise ValueError("only one MINUS group is supported")
            minus = _group()
        elif head.upper() == "VALUES":
            # single-variable inline data: VALUES ?x { 'a' 'b' <c> }
            # (joins-with-group == an isin filter when ?x is bound)
            take()
            v = take()
            if not v.startswith("?"):
                raise ValueError(f"VALUES needs a ?var, got {v!r}")
            take("{")
            vals = []
            while peek() and peek() != "}":
                vals.append(term(take()))
            take("}")
            values_clauses.append((v[1:], vals))
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
            expr = " ".join(
                t[1:] if t.startswith("?") else t for t in expr_toks
            )
            expr = (
                expr.replace("&&", " AND ").replace("||", " OR ")
            )
            expr = __import__("re").sub(r"(?<![<>!=])=(?!=)", "==", expr)
            filters.append(expr)
        else:
            s, p, o = take(), take(), take()
            patterns.append((term(s), term(p), term(o)))
            if peek() == ".":
                take()
    take("}")

    # trailing solution modifiers: GROUP BY / ORDER BY / LIMIT
    group_by, order_by, limit = [], [], None
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
        else:
            raise ValueError(f"unexpected token after pattern group: {head!r}")

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
    else:
        out = bgp_match(
            triples, patterns, optional=optional, filters=filters, minus=minus
        )

    for v, vals in values_clauses:
        if v not in out.columns:
            raise ValueError(f"VALUES variable not bound: {v!r}")
        out = out.filter(F.col(v).isin(vals))

    aggs = [p for p in proj if p[0] == "agg"]
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
        missing = [v for v in set(group_by) | {a[2] for a in aggs}
                   if v not in out.columns]
        if missing:
            raise ValueError(f"variables not bound: {sorted(missing)}")
        exprs = [
            getattr(F, fn.lower())(v).alias(name) for _, fn, v, name in aggs
        ]
        out = (
            out.groupBy(*group_by).agg(*exprs)
            if group_by
            else out.agg(*exprs)
        )
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
    if limit is not None:
        out = out.limit(limit)
    return out
