from __future__ import annotations

import pytest

from pdftableextractor_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="pdfte-tests", master="local[4]")
    yield s
    s.stop()
