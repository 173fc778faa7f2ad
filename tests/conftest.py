from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_pipeline_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "bpp-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
        driver_memory="6g",
        # static config — needed by bucketed-table tests, must be set at
        # session creation (CANNOT_MODIFY_STATIC_CONFIG at runtime).
        # PER-PROCESS path: the suite is documented to run as two
        # concurrent halves, and managed-table names are keyed by sf
        # fixture only — with a shared warehouse, one half's atexit
        # table-dir cleanup (registry/eval_io.py q_managed_table) can
        # delete the table out from under the other half mid-query.
        extra_conf={
            "spark.sql.warehouse.dir": f"/tmp/bpp-test-warehouse-{os.getpid()}"
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    import shutil

    shutil.rmtree(f"/tmp/bpp-test-warehouse-{os.getpid()}", ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
