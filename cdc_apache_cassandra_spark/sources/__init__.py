from cdc_apache_cassandra_spark.sources.registry import TABLES, load_table, load_tables
