"""Co-bucketed join: the production-scale strategy for the claims join
(SURVEY §2.7 / pipeline docstring) — both tables bucketed on the join
key at write time, so the join runs with ZERO shuffle exchanges.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    from ocr_api_spark.plans.session import build_session

    wh = tmp_path_factory.mktemp("warehouse")
    return build_session(
        app_name="bucket-tests",
        master="local[2]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": str(wh),
            "spark.sql.autoBroadcastJoinThreshold": "-1",  # force non-broadcast
            "spark.sql.sources.bucketing.autoBucketedScan.enabled": "true",
        },
    )


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_cobucketed_join_has_no_shuffle(session, tmp_path):
    from ocr_api_spark.sources.pages import write_pages

    paths = write_pages(str(tmp_path), n_rows=400, seed=21)
    pages = session.read.parquet(paths["pages"])
    claims = session.read.parquet(paths["claims"])

    # getOrCreate() may hand us a pre-existing session whose static
    # spark.sql.warehouse.dir differs from this module's fixture conf, so
    # never rely on the warehouse location: give each table an explicit
    # tmp_path LOCATION and drop any stale catalog entry first.
    for name in ("pages_bucketed", "claims_bucketed"):
        session.sql(f"DROP TABLE IF EXISTS {name}")
    (
        pages.write.mode("overwrite")
        .bucketBy(8, "url")
        .sortBy("url")
        .option("path", str(tmp_path / "pages_bucketed"))
        .saveAsTable("pages_bucketed")
    )
    (
        claims.write.mode("overwrite")
        .bucketBy(8, "url")
        .sortBy("url")
        .option("path", str(tmp_path / "claims_bucketed"))
        .saveAsTable("claims_bucketed")
    )

    joined = session.table("pages_bucketed").join(session.table("claims_bucketed"), "url")
    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    # co-bucketed scan: no shuffle Exchange anywhere in the join plan
    assert ") Exchange" not in plan, plan

    # and it is correct
    n_claims = claims.count()
    assert joined.count() == n_claims


def test_extraction_plan_cobucketed_claims_join_shuffle_free(session, tmp_path):
    """The 10^12-row claims story (plans/pipeline.py: 'at scale disable
    broadcast and co-bucket both tables') asserted on the REAL plan, not
    just the docstring: extraction_plan(broadcast_claims=False) over
    bucketBy-written pages+claims runs the url join as a shuffle-free
    SortMergeJoin — the only Exchange-free way to join two 10^12-row
    tables."""
    from ocr_api_spark.plans.pipeline import extraction_plan
    from ocr_api_spark.sources.pages import write_pages

    paths = write_pages(str(tmp_path), n_rows=300, seed=23)
    for name in ("pages_xb", "claims_xb"):
        session.sql(f"DROP TABLE IF EXISTS {name}")
    (
        session.read.parquet(paths["pages"]).write.mode("overwrite")
        .bucketBy(8, "url").sortBy("url")
        .option("path", str(tmp_path / "pages_xb")).saveAsTable("pages_xb")
    )
    (
        session.read.parquet(paths["claims"]).write.mode("overwrite")
        .bucketBy(8, "url").sortBy("url")
        .option("path", str(tmp_path / "claims_xb")).saveAsTable("claims_xb")
    )

    pages = session.table("pages_xb")
    claims = session.table("claims_xb")
    # n_parts=None: the pre-UDF repartition is the SMALL-cluster knob;
    # the co-bucketed layout already gives both parallelism (one task
    # per bucket) and sink alignment
    out = extraction_plan(pages, claims, n_buckets=16, n_salts=4,
                          n_parts=None, broadcast_claims=False)
    plan = explain_str(out)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert ") Exchange" not in plan, plan

    # and the plan actually runs: every page row survives the left join
    assert out.count() == 300
