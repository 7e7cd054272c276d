"""Skew machinery tests: hot-host detection, adaptive salting spreads
only the hot keys, two-phase aggregate equals the plain aggregate."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def session():
    from ocr_api_spark.plans.session import build_session

    return build_session(app_name="skew-tests", master="local[4]", shuffle_partitions=8)


@pytest.fixture(scope="module")
def skewed_pages(session):
    # host0 owns 60% of urls, host1 20%, the rest spread over 20 hosts
    rows = []
    for i in range(1000):
        if i < 600:
            h = "host0.example"
        elif i < 800:
            h = "host1.example"
        else:
            h = f"host{2 + i % 20}.example"
        rows.append((f"https://{h}/p/{i}", float(i)))
    return session.createDataFrame(rows, "url string, value double")


def test_hot_host_detection(session, skewed_pages):
    from ocr_api_spark.plans.skew import hot_hosts

    hot = hot_hosts(skewed_pages, threshold=0.1)
    assert hot == ["host0.example", "host1.example"]


def test_adaptive_salt_spreads_only_hot(session, skewed_pages):
    from pyspark.sql import functions as F

    from ocr_api_spark.plans.skew import hot_hosts, with_adaptive_salt

    hot = hot_hosts(skewed_pages, threshold=0.1)
    salted = with_adaptive_salt(skewed_pages, hot, n_salts=8)
    per_key = salted.groupBy("host", "salt").count()
    # the hot hosts spread over many salts; cold hosts stay at salt 0
    hot_salts = per_key.where(F.col("host") == "host0.example").count()
    assert hot_salts >= 6
    cold = per_key.where(~F.col("host").isin(hot)).select("salt").distinct().collect()
    assert [r["salt"] for r in cold] == [0]
    # largest (host, salt) cell is far below the unsalted hot-host count
    max_cell = per_key.agg(F.max("count")).collect()[0][0]
    assert max_cell < 600 / 4


def test_salted_agg_equals_plain_agg(session, skewed_pages):
    from pyspark.sql import functions as F

    from ocr_api_spark.plans.skew import hot_hosts, salted_host_agg, with_adaptive_salt

    hot = hot_hosts(skewed_pages, threshold=0.1)
    salted = with_adaptive_salt(skewed_pages, hot, n_salts=8)
    two_phase = salted_host_agg(
        salted, [F.count("*").alias("n"), F.sum("value").alias("sum_value")]
    )
    plain = (
        salted.groupBy("host")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
    a = {r["host"]: (r["n"], r["sum_value"]) for r in two_phase.collect()}
    b = {r["host"]: (r["n"], r["sum_value"]) for r in plain.collect()}
    assert a == b


def test_pipeline_adaptive_salt_cold_hosts_stay_zero(session, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from ocr_api_spark.plans.pipeline import extraction_plan

    rows = []
    for i in range(200):
        h = "hot.example" if i < 150 else f"cold{i % 5}.example"
        rows.append({"url": f"https://{h}/p/{i}", "warc_ts": pd.Timestamp("2024-01-01"),
                     "html": None, "text": f"doc {i}", "lang": "en"})
    p = str(tmp_path / "pages.parquet")
    pd.DataFrame(rows).to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    pages = session.read.parquet(p)

    plan = extraction_plan(pages, None, 8, 8, hot_hosts=["hot.example"])
    out = plan.select("url", "salt").toPandas()
    hot_salts = out[out.url.str.contains("hot.example")]["salt"].nunique()
    cold_salts = set(out[~out.url.str.contains("hot.example")]["salt"])
    assert hot_salts >= 4
    assert cold_salts == {0}
