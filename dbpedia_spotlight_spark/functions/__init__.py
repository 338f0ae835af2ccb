from dbpedia_spotlight_spark.functions.text import (  # noqa: F401
    normalize_surface_form_py,
    normalize_text_col,
    normalize_surface_form_col,
    wiki_clean_uri_col,
)
