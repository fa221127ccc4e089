"""Exact-quota stratified sampling vs a DuckDB twin (same md5 ordering
computed by an independent engine) + determinism/plan checks."""

import duckdb
import pandas as pd
import pytest

from gocrawler_spark.operators.sample import sample_stratified_exact


def _docs(spark, n=500):
    rows = [
        (i, ["en", "de", "fr", "xx"][i % 4], f"doc {i} body", i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, bucket int"
    )


def test_stratified_exact_matches_duckdb_twin(spark):
    docs = _docs(spark)
    quotas = spark.createDataFrame(
        [("en", 10), ("de", 3), ("fr", 0), ("zz", 5)], "lang string, quota int"
    )
    got = sample_stratified_exact(
        docs, quotas, ["lang"], id_col="doc_id", seed="s1"
    )
    got_rows = {(r["doc_id"], r["lang"]) for r in got.collect()}
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    con.register(
        "quotas",
        pd.DataFrame({"lang": ["en", "de", "fr", "zz"], "quota": [10, 3, 0, 5]}),
    )
    want = con.execute(
        """
        SELECT doc_id, d.lang FROM docs d JOIN quotas q USING (lang)
        QUALIFY row_number() OVER (
            PARTITION BY d.lang
            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || 's1'), doc_id
        ) <= q.quota
        """
    ).fetchall()
    assert got_rows == {(r[0], r[1]) for r in want}
    # exact quota counts; 'fr' zeroed, 'xx' absent from quotas -> dropped
    by_lang = {}
    for _, lang in got_rows:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    assert by_lang == {"en": 10, "de": 3}


def test_stratified_exact_determinism_and_seed(spark):
    docs = _docs(spark, n=200)
    quotas = spark.createDataFrame(
        [("en", 5, 0), ("en", 5, 1), ("de", 7, 2)],
        "lang string, quota int, bucket int",
    )
    sel = lambda seed, d: {
        r["doc_id"]
        for r in sample_stratified_exact(
            d, quotas, ["lang", "bucket"], seed=seed
        ).collect()
    }
    a = sel("7", docs)
    # same selection under a different partition layout
    b = sel("7", docs.repartition(13, "text"))
    assert a == b and len(a) == 5 + 5 + 7
    # a different seed draws a different (overlapping is fine) sample
    assert sel("8", docs) != a
    # quota larger than the stratum: take all of it, no error
    small_q = spark.createDataFrame([("de", 10_000, 2)], quotas.schema)
    de2 = sample_stratified_exact(docs, small_q, ["lang", "bucket"])
    assert de2.count() == docs.where("lang='de' and bucket=2").count()
    # scale shape: the rank<=quota window plans as WindowGroupLimit
    # (map-side partial top-k before the stratum shuffle) and stays JVM-side
    plan = (
        sample_stratified_exact(docs, quotas, ["lang", "bucket"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "BatchEvalPython" not in plan
