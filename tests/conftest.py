import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from datafusion_dolomite_spark.session import get_spark

    s = get_spark("ddspark-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def catalog():
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog

    return testdata_catalog(SF_DIR)


@pytest.fixture()
def ctx(catalog):
    from datafusion_dolomite_spark.optimizer.rule import OptimizerContext

    return OptimizerContext(catalog)


@pytest.fixture()
def planner(spark, catalog):
    from datafusion_dolomite_spark import QueryPlanner

    return QueryPlanner(spark, catalog)
