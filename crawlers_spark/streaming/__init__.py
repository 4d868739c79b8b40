from crawlers_spark.streaming.continuous import crawl_continuously

__all__ = ["crawl_continuously"]
