from dbpedia_spotlight_spark.model.schemas import (  # noqa: F401
    ANNOTATIONS_SCHEMA,
    DOCUMENTS_SCHEMA,
    SPOTS_SCHEMA,
    TOKENS_SCHEMA,
    TRIPLES_SCHEMA,
)
from dbpedia_spotlight_spark.model.model_tables import SpotlightModel  # noqa: F401
