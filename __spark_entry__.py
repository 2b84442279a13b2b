"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction over the sf0.001 documents table
reshaped into the north-rule interleaved spans schema.
``queries()`` / ``oracle_sql()`` — operator registry with DuckDB oracles
(go_readability_spark/queries.py; formulas shared between engines via
go_readability_spark/functions/*). Extraction-family queries are
non-SQL-expressible (the readability algorithm); their oracles are
committed golden-parquet regression pins generated at THE DRIVER'S
CORRECTNESS SCALE, sf0.01 (tools/make_goldens.py). Of those, only
extract_driver_docs reads the sf tables, so its oracle is valid at
sf0.01 exclusively — evaluating the exported oracles at another SF must
skip it (queries.GOLDEN_SF_BOUND marks it; tools/check_oracles.py
demonstrates the guard). The corpus-based goldens are sf-independent.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from go_readability_spark.operators.extract import extract_documents
    from go_readability_spark.readability.extract import ReadabilityOptions
    from go_readability_spark.sources.tables import documents_as_spans_df

    docs = documents_as_spans_df(spark, "/root/testdata/sf0.001")
    # CharThreshold=150: the synthetic corpus averages ~250 chars/doc,
    # well under the 500-byte web-article default gate
    ext = extract_documents(
        docs, options=ReadabilityOptions(char_threshold=150, forced_page_type="")
    )
    return ext.select(
        "doc_id",
        F.col("meta.page_type").alias("page_type"),
        F.col("meta.title").alias("title"),
        F.col("meta.node_count").alias("node_count"),
        F.size("spans_out").alias("n_spans_out"),
        F.col("doc_bytes").alias("doc_bytes"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    training-data ops (dedup/similarity/text-analysis/multimodal)."""
    from go_readability_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; extraction
    queries are omitted (rows-only check)."""
    from go_readability_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
