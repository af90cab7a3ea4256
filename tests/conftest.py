import pytest


@pytest.fixture(scope="session")
def spark():
    from dxnn_ocr_cpp_spark.session import build_session

    s = build_session(app="tests", master="local[4]",
                      arrow_max_records=64, shuffle_partitions=8)
    yield s
    s.stop()
