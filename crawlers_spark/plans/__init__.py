from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine  # noqa: F401
