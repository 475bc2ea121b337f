import pytest

from distributed_extraction_framework_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="defs-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def pages_df(spark):
    from distributed_extraction_framework_spark.sources.synth import synth_pages

    return synth_pages(spark, 400, partitions=4).cache()


@pytest.fixture(scope="session")
def pages_local():
    from distributed_extraction_framework_spark.sources.synth import local_pages

    return local_pages(400)
