"""S12 backend health check (reference Backend.Check,
/root/reference/backend/backend.go:15, nfdump probe backend/nfdump.go:62-66)."""

import pytest

from flow_indexer_spark.health import (
    HealthCheckError,
    _version_tuple,
    check,
    check_arrow_stack,
    check_session_conf,
)


def test_arrow_stack_present():
    v = check_arrow_stack()
    assert set(v) == {"pyarrow", "pandas"}


def test_full_check_with_session(spark):
    report = check(spark)
    assert report["spark"] == spark.version
    assert "java" in report


def test_version_tuple_parsing():
    assert _version_tuple("21.0.0") == (21, 0, 0)
    assert _version_tuple("2.3.0.dev1") == (2, 3, 0)
    assert _version_tuple("4.1") == (4, 1)


def test_bad_timezone_rejected(spark):
    class FakeConf:
        def get(self, k, d=None):
            return "America/New_York"

    class FakeSpark:
        conf = FakeConf()

    with pytest.raises(HealthCheckError):
        check_session_conf(FakeSpark())
