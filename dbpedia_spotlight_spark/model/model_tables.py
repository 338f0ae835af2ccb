"""SpotlightModel — the statistics model as Spark tables.

The reference loads five kryo memory-mapped stores into one JVM
(core/src/main/scala/org/dbpedia/spotlight/db/SpotlightModel.scala:60-151).
Here the model IS a set of Parquet/Iceberg tables; small dims are broadcast
at join time, global totals are computed once and carried as Python floats
(they become literals in column expressions — no shuffle at query time).

Tables (SURVEY.md §1.2):
    surface_forms(sf_id, surface_form, surface_form_norm, annotated_count, total_count)
    resources(res_id, uri, support, types)
    candidates(sf_id, res_id, pair_count)
    token_types(token_id, token, count)
    context_counts(res_id, token_id, count)
    redirects(src_uri, dst_uri) / disambiguations(uri)
    ontology_types(type_id, type_qname, type_uri)
    stopwords(word)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "surface_forms",
    "resources",
    "candidates",
    "token_types",
    "context_counts",
    "redirects",
    "disambiguations",
    "ontology_types",
    "stopwords",
]

# Spotter linear-model weights [annot_prob, is_abbrev, is_number, bias]
# (ref index/.../db/CreateSpotlightModel.scala:230-233 writes "1.0 0.2 -0.2 0.1").
DEFAULT_SPOT_WEIGHTS = (1.0, 0.2, -0.2, 0.1)


@dataclass
class SpotlightModel:
    surface_forms: DataFrame
    resources: DataFrame
    candidates: DataFrame
    token_types: DataFrame | None = None
    context_counts: DataFrame | None = None
    redirects: DataFrame | None = None
    disambiguations: DataFrame | None = None
    ontology_types: DataFrame | None = None
    stopwords: DataFrame | None = None
    spot_weights: tuple = DEFAULT_SPOT_WEIGHTS

    # Global scalars (computed lazily; literals in downstream expressions).
    _totals: dict = field(default_factory=dict, repr=False)

    def _total(self, key: str, compute) -> float:
        if key not in self._totals:
            self._totals[key] = float(compute())
        return self._totals[key]

    @property
    def total_support(self) -> float:
        """Σ resource support — denominator of P(e)
        (ref core/.../db/memory/MemoryResourceStore.scala:72-78)."""
        return self._total(
            "total_support",
            lambda: self.resources.agg(F.sum("support")).collect()[0][0] or 0,
        )

    @property
    def total_annotated_count(self) -> float:
        """Σ sf annotated counts — NIL P(e) denominator
        (ref MemorySurfaceFormStore.scala:63, DBTwoStepDisambiguator.scala:188)."""
        return self._total(
            "total_annotated",
            lambda: self.surface_forms.agg(
                F.sum(F.greatest(F.col("annotated_count"), F.lit(0)))
            ).collect()[0][0]
            or 0,
        )

    @property
    def total_token_count(self) -> float:
        """Σ token counts (ref MemoryTokenTypeStore.scala:30-39)."""
        return self._total(
            "total_tokens",
            lambda: self.token_types.agg(F.sum("count")).collect()[0][0] or 0,
        )

    @property
    def vocabulary_size(self) -> float:
        return self._total("vocab_size", lambda: self.token_types.count())

    @property
    def candidates_count(self) -> float:
        """Row count of the candidate fact table — drives the automatic
        broadcast-vs-two-stage join decision in annotate()."""
        return self._total("candidates_count", lambda: self.candidates.count())

    def head_ids(self, top_n: int = 1000) -> list:
        """Skew-head sf_ids (largest fanout x frequency), computed once per
        model and cached — the model-build-time statistic the two-stage
        candidate join broadcasts."""
        key = f"head_ids_{top_n}"
        if key not in self._totals:
            from dbpedia_spotlight_spark.operators.candidates import head_sf_ids

            self._totals[key] = head_sf_ids(self.candidates, top_n)
        return self._totals[key]

    def resource_token_totals(self) -> DataFrame:
        """Per-resource total context token count
        (ref MemoryContextStore.scala:99-107 computes on load)."""
        return self.context_counts.groupBy("res_id").agg(
            F.sum("count").alias("total_count")
        )

    def stopword_set(self) -> set:
        if self.stopwords is None:
            return set()
        return {r[0] for r in self.stopwords.collect()}

    # ---- persistence -----------------------------------------------------
    def save(self, path: str) -> None:
        for name in TABLE_NAMES:
            df = getattr(self, name)
            if df is not None:
                df.write.mode("overwrite").parquet(os.path.join(path, name))

    REQUIRED_TABLES = ("surface_forms", "resources", "candidates")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SpotlightModel":
        kwargs = {}
        for name in TABLE_NAMES:
            p = os.path.join(path, name)
            kwargs[name] = spark.read.parquet(p) if os.path.exists(p) else None
        missing = [t for t in cls.REQUIRED_TABLES if kwargs[t] is None]
        if missing:
            raise FileNotFoundError(
                f"not a Spotlight model dir: {path!r} is missing required "
                f"table(s) {missing} (expected parquet subdirs named "
                f"{list(cls.REQUIRED_TABLES)})"
            )
        return cls(**kwargs)
