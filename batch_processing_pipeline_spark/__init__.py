"""batch_processing_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``kheder-hassoun/batch-processing-pipeline`` (a Java Spark
search-autocomplete batch pipeline), re-expressed Spark-first:

* declarative DataFrame/SQL plans (Catalyst + Tungsten pick the physical
  strategy — no hand-scheduled RDD hops),
* the reference's signature prefix fan-out as pure column expressions
  (reference used an RDD flatMap: ``IncrementalAutocomplete.java:72-79``),
* deterministic top-K (fixes reference hazards H4/H5: unordered
  ``collect_list`` and tie-break-less ranking),
* incremental frequency merge with idempotent, upsert-style sinks
  (fixes H1/H2: double-count on recompute + Overwrite dropping DDL),
* LLM-data-pipeline extensions: exact/near dedup, similarity search,
  text analysis, multimodal binary columns.

All modules use only public Apache Spark APIs.
"""

from batch_processing_pipeline_spark.session import get_spark
from batch_processing_pipeline_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]
__version__ = "0.1.0"
