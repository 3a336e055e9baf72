import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_table_extractor_to_csv_spark.session import get_spark

    s = get_spark(
        app_name="pytest",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield s
    s.stop()
