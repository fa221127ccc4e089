import pytest

from gocrawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=4, app_name="gocrawler-tests", shuffle_partitions=4)
    yield s
    s.stop()


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
SEEDS_DDL = "url string, priority int"
ROBOTS_DDL = "host string, agent string, rule string, path_prefix string, crawl_delay_ms long"


def pages_df(spark, pages_rows):
    return spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in pages_rows],
        PAGES_DDL,
    )


def seeds_df(spark, seeds):
    return spark.createDataFrame([(s["url"], s["priority"]) for s in seeds], SEEDS_DDL)


def robots_df(spark, robots):
    return spark.createDataFrame(
        [(r["host"], r["agent"], r["rule"], r["path_prefix"], r["crawl_delay_ms"]) for r in robots],
        ROBOTS_DDL,
    )
