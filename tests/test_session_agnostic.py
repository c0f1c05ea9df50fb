"""The engine must run on a SparkSession it did NOT build.

The round-1 driver handed each query its own bare session (no
``session.py`` builder confs) and every events.parquet scan died with
PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS).  These tests simulate that
driver: strip the required runtime confs off the active session, run
events-based queries through each entry point, and rely on
``configure_session`` (session.py) to re-pin them.
"""

import pytest

from tests.conftest import SF_DIR

REQUIRED = [
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.session.timeZone",
    "spark.sql.execution.arrow.pyspark.enabled",
]


def _strip_confs(spark):
    for key in REQUIRED:
        try:
            spark.conf.unset(key)
        except Exception:
            pass
    # simulate a non-UTC driver environment
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")


def test_planner_repins_confs_on_bare_session(spark):
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog

    _strip_confs(spark)
    QueryPlanner(spark, testdata_catalog(SF_DIR))
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_events_query_runs_on_stripped_session(spark):
    import __spark_entry__ as entrymod

    _strip_confs(spark)
    df = entrymod.queries()["q_events_by_type"](spark, SF_DIR)
    assert df.count() > 0
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


@pytest.mark.parametrize(
    "name", ["q_funnel", "q_sessionize_batch", "q_map_functions", "q_argmax"]
)
def test_round1_failing_events_queries(spark, name):
    import __spark_entry__ as entrymod

    _strip_confs(spark)
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_streaming_pipeline_on_stripped_session(spark):
    from datafusion_dolomite_spark.streaming.pipeline import windowed_event_counts

    _strip_confs(spark)
    df = windowed_event_counts(spark, SF_DIR)
    assert df.count() > 0
