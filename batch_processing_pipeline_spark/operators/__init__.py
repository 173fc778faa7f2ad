"""Engine operators.

Each module implements one operator family from SURVEY.md §2 as pure
DataFrame transformations (JVM-side column expressions wherever possible, so
whole-stage codegen stays intact and Catalyst can push filters/prune columns
through them).
"""

from batch_processing_pipeline_spark.operators.prefix import (
    normalize_queries,
    expand_prefixes,
    prefix_frequencies,
)
from batch_processing_pipeline_spark.operators.topk import top_k_per_group
from batch_processing_pipeline_spark.operators.merge import merge_frequencies
from batch_processing_pipeline_spark.operators.sessionize import sessionize
from batch_processing_pipeline_spark.operators.observe import (
    assert_quality,
    observed_quality,
)
from batch_processing_pipeline_spark.operators.state_store import (
    merge_touched_buckets,
    read_bucketed_state,
)
from batch_processing_pipeline_spark.operators.bucketed import (
    write_bucketed,
    bucketed_join,
)
from batch_processing_pipeline_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    assign_split,
    domain_mix,
    cap_per_group,
)

__all__ = [
    "assert_quality",
    "observed_quality",
    "merge_touched_buckets",
    "read_bucketed_state",
    "write_bucketed",
    "bucketed_join",
    "normalize_queries",
    "expand_prefixes",
    "prefix_frequencies",
    "top_k_per_group",
    "merge_frequencies",
    "sessionize",
    "deterministic_sample",
    "stratified_sample",
    "assign_split",
    "domain_mix",
    "cap_per_group",
]
