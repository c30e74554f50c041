"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `ingnisage/AI-Powered-Data-Pipeline-Assistant`
(an AI data-pipeline workbench: relational store, vector store, federated
search pipeline, streaming job processor, guarded SQL entry point).

Everything here is idiomatic Spark DataFrame / SQL / Structured Streaming:
the logical plan is declared declaratively and Catalyst/Tungsten choose the
physical strategy. Designed for a large multi-executor cluster (broadcast
joins for dims, map-side partial aggregation, pushdown-friendly scans);
tested on local mode against /root/testdata.
"""

__version__ = "0.1.0"

from ai_powered_data_pipeline_assistant_spark.session import get_spark  # noqa: F401
from ai_powered_data_pipeline_assistant_spark.catalog import load_tables  # noqa: F401
