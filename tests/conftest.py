from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from dhs_to_database_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests")
    yield s


SF_DIR = "/root/testdata/sf0.001"


def plan_string(df) -> str:
    """Formatted physical plan as a string (shared by the plan tests)."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def count_exchanges(plan: str) -> int:
    """Number of shuffle Exchange nodes (broadcast exchanges excluded —
    they appear as 'BroadcastExchange')."""
    import re

    return len(re.findall(r"\) Exchange\b", plan))
