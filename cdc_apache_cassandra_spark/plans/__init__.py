"""Query registry consumed by __spark_entry__ (the driver contract).

Import side effects register every query module's entries into QUERIES.
"""

from cdc_apache_cassandra_spark.plans.registry import QUERIES, Query, register

# registration side effects
from cdc_apache_cassandra_spark.plans import cdc_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import cdc_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import tpch_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import tpch_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import relational_extra_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_sampling_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import events_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import events_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import fuzzy_dedup_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import multimodal_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import analytics_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_text_stats_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import cdc_time_travel_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import vector_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import analytics_extra_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import profile_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import function_gallery_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import extra_surface_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import kmeans_srp_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_substring_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_bpe_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_pii_queries  # noqa: E402,F401
