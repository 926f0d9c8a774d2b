"""Backend health checks — the S12 analogue.

The reference verifies an external tool is runnable before indexing with
it (``Backend.Check``, /root/reference/backend/backend.go:15; nfdump
probes ``nfdump -V`` at /root/reference/backend/nfdump.go:62-66, argus at
backend/argus.go:55-63). Our "external tools" are the Arrow bridge
(pyarrow + pandas — the pandas-UDF parse stage dies at task time without
them) and the JVM itself; failing fast at session build beats a cryptic
executor-side stack trace 20 minutes into a 100 TB job.
"""

from __future__ import annotations

import os


class HealthCheckError(RuntimeError):
    """A required runtime dependency is missing or too old."""


#: minimum versions for the Arrow-batched UDF path (Spark 4 requires
#: pyarrow>=4 and pandas>=2 for pandas_udf/mapInPandas)
MIN_PYARROW = (4, 0)
MIN_PANDAS = (1, 5)


def _version_tuple(v: str) -> tuple[int, ...]:
    parts = []
    for p in v.split(".")[:3]:
        digits = "".join(ch for ch in p if ch.isdigit())
        if not digits:
            break
        parts.append(int(digits))
    return tuple(parts)


def check_arrow_stack() -> dict:
    """Verify pyarrow/pandas are importable and new enough (the pandas-UDF
    extract stage hard-requires them). Returns {'pyarrow': v, 'pandas': v}."""
    try:
        import pyarrow
    except ImportError as e:  # pragma: no cover - environment guard
        raise HealthCheckError("pyarrow is required for Arrow-batched UDFs") from e
    try:
        import pandas
    except ImportError as e:  # pragma: no cover - environment guard
        raise HealthCheckError("pandas is required for pandas UDFs") from e
    versions = {"pyarrow": pyarrow.__version__, "pandas": pandas.__version__}
    if _version_tuple(pyarrow.__version__) < MIN_PYARROW:
        raise HealthCheckError(
            f"pyarrow {pyarrow.__version__} < required {'.'.join(map(str, MIN_PYARROW))}"
        )
    if _version_tuple(pandas.__version__) < MIN_PANDAS:
        raise HealthCheckError(
            f"pandas {pandas.__version__} < required {'.'.join(map(str, MIN_PANDAS))}"
        )
    return versions


def check_java() -> str:
    """Verify a JVM is reachable (JAVA_HOME or java on PATH)."""
    java_home = os.environ.get("JAVA_HOME")
    if java_home and os.path.exists(os.path.join(java_home, "bin", "java")):
        return os.path.join(java_home, "bin", "java")
    from shutil import which

    java = which("java")
    if java is None:  # pragma: no cover - environment guard
        raise HealthCheckError("no JVM found: set JAVA_HOME or put java on PATH")
    return java


def check_session_conf(spark) -> None:
    """Post-build session sanity: Arrow execution on, UTC session timezone
    (the key/date derivations assume it)."""
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz != "UTC":
        raise HealthCheckError(f"session timezone must be UTC, got {tz!r}")


def check(spark=None) -> dict:
    """Full health probe; raises HealthCheckError on the first failure."""
    report = {"java": check_java(), **check_arrow_stack()}
    if spark is not None:
        check_session_conf(spark)
        report["spark"] = spark.version
    return report
