#!/usr/bin/env python
"""spark-submit entrypoint: run a SPARQL SELECT query against a materialized
triple table (e.g. the kg_export_job / annotate_job --triples output).

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/sparql_job.py \
        --triples /kg/triples_parquet \
        --query "SELECT ?s ?o WHERE { ?s <pred> ?o . FILTER(?s != 'x') }" \
        --output /out/result

The triple table must have (subj, pred, obj) string columns. Supports the
engine's SPARQL subset (operators/kgquery.py:sparql_select): conjunctive
triple patterns; property paths (<p>+ / <p>* / <p>? quantifiers, bounded
repetition <p>{n} / <p>{n,} / <p>{n,m}, <a>/<b> sequences, <a>|<b>
alternation, parenthesised combinations); any number
of OPTIONAL groups; one MINUS group; { } UNION { } chains; FILTERs
(optional-only variables filtered after their left join); VALUES inline
data (single- and multi-variable); aggregates COUNT/SUM/MIN/MAX/AVG with
GROUP_CONCAT/SAMPLE and GROUP BY (COUNT(*) / AGG(DISTINCT ?v) accepted)
and HAVING; subqueries { SELECT ... } joined on shared vars; ORDER BY
[ASC|DESC]; LIMIT / OFFSET; BIND(expr AS ?var); FILTER EXISTS / NOT
EXISTS groups (correlated semi/anti joins); negated property sets !<p>
and !(<a>|<b>); §17 FILTER builtins (REGEX/CONTAINS/STRSTARTS/STRENDS/
STRLEN/LCASE/UCASE/BOUND) and the typed-literal term builtins
LANG/DATATYPE/STR/LANGMATCHES over `"v"@en` / `"v"^^<dt>` object terms
(functions/rdfterm.py). Queries starting with ASK, CONSTRUCT or
DESCRIBE dispatch to sparql_ask / sparql_construct / sparql_describe
(boolean row / constructed triple graph / outbound description;
sparql_describe also offers form='cbd' for the blank-node-closed
Concise Bounded Description). Writes
the result as parquet and prints one JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--triples", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("spotlight-sparql").getOrCreate()

    from dbpedia_spotlight_spark.operators.kgquery import (
        sparql_ask,
        sparql_construct,
        sparql_describe,
        sparql_select,
    )

    t0 = time.time()
    triples = spark.read.parquet(args.triples)
    head = args.query.lstrip().split(None, 1)[0].upper()
    runner = {
        "ASK": sparql_ask, "CONSTRUCT": sparql_construct,
        "DESCRIBE": sparql_describe,
    }.get(head, sparql_select)
    result = runner(triples, args.query)
    result.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "job": "sparql",
                "seconds": round(time.time() - t0, 2),
                "variables": result.columns,
                "rows_written": n,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
