"""dbpedia_spotlight_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the query/data-processing capabilities of
DBpedia Spotlight (reference: hunterhector/dbpedia-spotlight) as idiomatic
Spark: DataFrame ops + vectorized pandas/Arrow UDFs, broadcast dictionaries,
two-stage skew-aware joins, partitioned Parquet/Iceberg-style output with
per-partition lineage for resumability.

Pipeline (reference: rest/.../SpotlightInterface.java:124-172):
    documents -> tokenize -> spot -> candidates -> disambiguate -> filter
              -> annotations -> triples + co-occurrence graph
"""

__version__ = "0.1.0"

from dbpedia_spotlight_spark.session import get_spark  # noqa: F401
