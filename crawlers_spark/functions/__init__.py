"""Column-level functions: URL canonicalization, text analysis, hashing.

Everything here is either a JVM-side ``pyspark.sql.functions`` composition
(preferred — stays inside whole-stage codegen) or an Arrow-batched pandas
UDF (never a row-at-a-time Python UDF).
"""

from crawlers_spark.functions.canonicalize import (  # noqa: F401
    canonicalize_series,
    canonicalize_udf,
    host_col,
    with_canonical_url,
)
