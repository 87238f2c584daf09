from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# Python workers must be able to unpickle functions defined in the repo
# and in test modules.
_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [p for p in (_REPO, _HERE, os.environ.get("PYTHONPATH")) if p]
)


@pytest.fixture(scope="session")
def spark():
    from dump_es_parquet_spark.session import get_spark

    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ["SPARK_GRAFT_SF_DIR"]
