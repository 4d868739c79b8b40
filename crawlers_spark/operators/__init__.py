from crawlers_spark.operators.frontier import select_wave_topk, with_salt  # noqa: F401
from crawlers_spark.operators.dedup import anti_join_seen, BloomShards  # noqa: F401
from crawlers_spark.operators.politeness import ip_politeness_budget, politeness_budget  # noqa: F401
from crawlers_spark.operators.robots import robots_filter  # noqa: F401
from crawlers_spark.operators.fetch import fetch_pages  # noqa: F401
from crawlers_spark.operators.linkrank import (  # noqa: F401
    pagerank_priorities,
    related_pages,
    spam_mass,
    trustrank_scores,
)
from crawlers_spark.operators.communities import host_communities  # noqa: F401
from crawlers_spark.operators.opic import opic_importance, opic_init, opic_step  # noqa: F401
from crawlers_spark.operators.similarity import pq_topk  # noqa: F401
from crawlers_spark.operators.scc import bowtie_classes, strongly_connected_components  # noqa: F401
from crawlers_spark.operators.dust import apply_dust_rules, dust_param_rules  # noqa: F401
from crawlers_spark.operators.focused import focused_scores, frontier_context, nb_train  # noqa: F401
from crawlers_spark.operators.mirrors import mirror_host_pairs  # noqa: F401
from crawlers_spark.operators.sampling import temperature_mix, temperature_rates  # noqa: F401
from crawlers_spark.operators.recrawl import snapshot_diff  # noqa: F401
from crawlers_spark.operators.textdedup import (  # noqa: F401
    containment_pairs,
    host_boilerplate_stats,
    keep_best_per_cluster,
    line_dedup_stats,
    paragraph_bloom_dedup,
)
from crawlers_spark.operators.similarity import bitext_margin_pairs  # noqa: F401
from crawlers_spark.operators.quality_classifier import quality_classifier  # noqa: F401
