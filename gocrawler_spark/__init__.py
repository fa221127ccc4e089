"""gocrawler_spark — a PySpark-native distributed URL-frontier + fetch
scheduler with the query/data-processing capabilities of Alvazz/gocrawler.

Not a port: the reference's colly/goquery single-process crawl loop is
re-expressed as DataFrame micro-batches over snapshot tables (Iceberg on
a real cluster; a parquet snapshot catalog in this sandbox), with the
URL-seen set as bloom shards + exact anti-join, politeness as
window-ranked per-host credits, and extraction as Arrow-vectorized
pandas UDFs.
"""

__version__ = "0.1.0"
