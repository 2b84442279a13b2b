"""go_readability_spark — PySpark-native main-content extraction engine.

Layout:
- ``readability/``: pure-Python per-document extraction core (no Spark).
- ``sources/``: span codec + deterministic corpus generator + table IO.
- ``operators/``: Spark pipeline stages (extract UDF, skew bucketing,
  metrics rollup, checkpoint/resume).
- ``functions/``: large-scale training-data-pipeline ops (dedup,
  similarity search, text stats, multimodal plumbing).
"""

__version__ = "0.1.0"
