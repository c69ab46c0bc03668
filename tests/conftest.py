import pytest


@pytest.fixture(scope="session")
def spark():
    from ocrflow.session import build_session
    s = build_session(master="local[4]", app="ocrflow-tests",
                      shuffle_partitions=8, arrow_batch=64)
    yield s
    s.stop()
