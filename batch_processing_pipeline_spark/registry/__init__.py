"""Query registry: every operator the engine claims, as a runnable query.

Package form of the former 13k-line ``registry.py`` (split round 7, VERDICT
r6 task #4): ``_base`` holds the shared table readers and the two registry
dicts; each section module registers its queries at import time. The import
order below reproduces the original single-file insertion order exactly —
``__spark_entry__._ordered_names()`` depends on it.

See ``_base`` for the oracle-comparison conventions (portable round4,
aliased finals, epoch-second timestamps, unique tie-breaks).
"""

from __future__ import annotations

from batch_processing_pipeline_spark.registry._base import (  # noqa: F401
    ORACLES,
    QUERIES,
    R,
    _events,
    _t,
    round4,
)

# section imports in single-file order — do not reorder (QUERIES insertion
# order is the driver-window ordering contract)
from batch_processing_pipeline_spark.registry import core  # noqa: F401, E402
from batch_processing_pipeline_spark.registry import curation  # noqa: F401, E402
from batch_processing_pipeline_spark.registry import sql_surface  # noqa: F401, E402
from batch_processing_pipeline_spark.registry import relational  # noqa: F401, E402
from batch_processing_pipeline_spark.registry import analytics  # noqa: F401, E402
from batch_processing_pipeline_spark.registry import stats  # noqa: F401, E402
from batch_processing_pipeline_spark.registry import eval_io  # noqa: F401, E402
from batch_processing_pipeline_spark.registry import eval_stats  # noqa: F401, E402

from batch_processing_pipeline_spark.registry.eval_io import (  # noqa: F401, E402
    _roundtrip_store,  # re-exported: tests/test_round5_queries.py imports it
)

__all__ = ["QUERIES", "ORACLES"]
