from crawlers_spark.extraction.extractors import (  # noqa: F401
    extract_offers,
    extract_outlinks,
)
