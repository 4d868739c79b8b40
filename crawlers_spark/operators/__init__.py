from crawlers_spark.operators.frontier import select_wave_topk, with_salt  # noqa: F401
from crawlers_spark.operators.dedup import anti_join_seen, BloomShards  # noqa: F401
from crawlers_spark.operators.politeness import politeness_budget  # noqa: F401
from crawlers_spark.operators.robots import robots_filter  # noqa: F401
from crawlers_spark.operators.fetch import fetch_pages  # noqa: F401
