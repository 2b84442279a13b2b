"""The extraction operator: Arrow-batched mapInPandas over span documents.

This is the Spark face of the per-document pure function (SURVEY.md §3
"Spark lifecycle"): scan (doc_id, spans) → native doc_bytes pre-pass →
salted, size-aware repartition → mapInPandas(extract_batch) → extracted
rows (doc_id, spans_out, meta, metrics, doc_bytes, error).

Design notes for 100 TB scale:
- the only shuffle is the explicit skew repartition; extraction itself is
  map-only and the metrics rollup is a partial-agg hash aggregate;
- all per-doc work happens JVM→Arrow→pandas batch-wise, never per-row
  Python (input_hint requirement);
- failures never kill the job: per-doc try/except emits an error row and
  the error count is a first-class metric;
- docs above MAX_DOC_BYTES are refused before parsing (skew.py).
"""

from __future__ import annotations

import sys
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..readability.extract import ReadabilityOptions
from ..schemas import EXTRACTED_SCHEMA
from ..plans.skew import MAX_DOC_BYTES, skew_partitioned, with_doc_bytes

__all__ = ["extract_documents", "extract_batch_rows", "metrics_rollup"]

# deep DOM recursion (walkers + html.parser) needs headroom beyond the
# 1000-frame default; bumped once per executor worker
_RECURSION_LIMIT = 20000


def _row_for_error(doc_id: str, doc_bytes: int, error: str) -> dict:
    return {
        "doc_id": doc_id,
        "spans_out": [],
        "meta": {
            "title": "",
            "byline": "",
            "page_type": "error",
            "node_count": 0,
        },
        "metrics": {
            "candidate_count": 0,
            "pruned_nodes": 0,
            "prune_ratio": 0.0,
            "top_score": 0.0,
            "link_density": 0.0,
            "is_probably_content": False,
        },
        "doc_bytes": doc_bytes,
        "error": error,
    }


def extract_batch_rows(
    doc_ids,
    spans_lists,
    doc_bytes_list,
    options: Optional[ReadabilityOptions] = None,
    max_doc_bytes: int = MAX_DOC_BYTES,
) -> list[dict]:
    """Extract one Arrow batch; pure Python, testable without Spark."""
    # imported lazily so the module imports fast on the driver
    from ..readability.instrumented import extract_with_metrics
    from ..spans import element_to_spans, spans_to_html

    if sys.getrecursionlimit() < _RECURSION_LIMIT:
        sys.setrecursionlimit(_RECURSION_LIMIT)

    opts = options or ReadabilityOptions(forced_page_type="")
    out: list[dict] = []
    for doc_id, spans, doc_bytes in zip(doc_ids, spans_lists, doc_bytes_list):
        doc_bytes = int(doc_bytes) if doc_bytes is not None else 0
        if spans is None:
            out.append(_row_for_error(doc_id, 0, "null spans"))
            continue
        if doc_bytes > max_doc_bytes:
            out.append(
                _row_for_error(
                    doc_id, doc_bytes, f"doc_bytes {doc_bytes} > cap {max_doc_bytes}"
                )
            )
            continue
        try:
            html = spans_to_html(spans)
            article, metrics = extract_with_metrics(
                html,
                ReadabilityOptions(
                    char_threshold=opts.char_threshold,
                    nb_top_candidates=opts.nb_top_candidates,
                    forced_page_type=opts.forced_page_type,
                ),
            )
            out.append(
                {
                    "doc_id": doc_id,
                    "spans_out": element_to_spans(article.root),
                    "meta": {
                        "title": article.title,
                        "byline": article.byline,
                        "page_type": article.page_type,
                        "node_count": article.node_count,
                    },
                    "metrics": {
                        "candidate_count": metrics.candidate_count,
                        "pruned_nodes": metrics.pruned_nodes,
                        "prune_ratio": metrics.prune_ratio,
                        "top_score": metrics.top_score,
                        "link_density": metrics.link_density,
                        "is_probably_content": metrics.is_probably_content,
                    },
                    "doc_bytes": doc_bytes,
                    "error": None,
                }
            )
        except Exception as exc:  # noqa: BLE001 — never kill the job
            out.append(
                _row_for_error(doc_id, doc_bytes, f"{type(exc).__name__}: {exc}")
            )
    return out


def _make_batch_fn(options: Optional[ReadabilityOptions], max_doc_bytes: int):
    def extract_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = extract_batch_rows(
                pdf["doc_id"].tolist(),
                pdf["spans"].tolist(),
                pdf["doc_bytes"].tolist(),
                options,
                max_doc_bytes,
            )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "spans_out",
                    "meta",
                    "metrics",
                    "doc_bytes",
                    "error",
                ],
            )

    return extract_batches


def extract_documents(
    df: DataFrame,
    options: Optional[ReadabilityOptions] = None,
    num_partitions: Optional[int] = None,
    max_doc_bytes: int = MAX_DOC_BYTES,
    repartition: bool = True,
) -> DataFrame:
    """documents(doc_id, spans) → extracted(doc_id, spans_out, meta, metrics,
    doc_bytes, error).

    ``repartition=False`` keeps the input partitioning (useful when the
    caller already co-partitioned, e.g. the checkpointed per-partition loop).
    """
    df = with_doc_bytes(df)
    if repartition:
        num = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        df = skew_partitioned(df, num)
    return df.select("doc_id", "spans", "doc_bytes").mapInPandas(
        _make_batch_fn(options, max_doc_bytes), EXTRACTED_SCHEMA
    )


def metrics_rollup(extracted: DataFrame, *group_cols: str) -> DataFrame:
    """Aggregate extraction metrics (SURVEY.md §4.2: plain hash-agg with
    map-side partials — Catalyst handles partial aggregation for free)."""
    keys = [F.col(c) for c in group_cols] or [F.col("meta.page_type").alias("page_type")]
    return extracted.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_errors"),
        F.sum("doc_bytes").alias("total_bytes"),
        F.avg("metrics.candidate_count").alias("avg_candidates"),
        F.avg("metrics.prune_ratio").alias("avg_prune_ratio"),
        F.avg("metrics.link_density").alias("avg_link_density"),
        F.avg(F.size("spans_out")).alias("avg_spans_out"),
        F.sum(
            F.when(F.col("metrics.is_probably_content"), 1).otherwise(0)
        ).alias("n_probably_content"),
    )
