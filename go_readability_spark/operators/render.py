"""Rendered-output operator: the reference CLI's sinks as a DataFrame op.

The reference CLI (cmd/readability/main.go:17-84) emits the extracted
article as clean HTML (``--format html``, format.go:76-139), Markdown
(``--format markdown``, markdown.go:536-551) or a metadata JSON map
(``--metadata``, main.go:52-64). This operator produces the same four
renderings as columns over the documents table — one Arrow-batched pass,
reusing the extraction lifecycle.
"""

from __future__ import annotations

import json
import sys
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from ..plans.skew import MAX_DOC_BYTES, skew_partitioned, with_doc_bytes
from ..readability.extract import ReadabilityOptions

__all__ = ["render_documents", "RENDERED_SCHEMA", "render_article"]

RENDERED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("html", StringType()),
        StructField("markdown", StringType()),
        StructField("text", StringType()),
        StructField("metadata_json", StringType()),
        StructField("error", StringType()),
    ]
)


def render_article(article) -> dict:
    """Render one extracted article into the CLI's output formats."""
    from ..readability.fmt import format_document, stringify, to_html
    from ..readability.markdown import to_markdown

    # metadata JSON mirrors cmd/readability/main.go:52-64
    metadata = {
        "title": article.title,
        "byline": article.byline,
        "nodeCount": article.node_count,
        "pageType": article.page_type,
    }
    return {
        "html": to_html(article.root),
        "markdown": to_markdown(article.root),
        "text": format_document(stringify(article.root)),
        "metadata_json": json.dumps(metadata, ensure_ascii=False),
    }


def _render_batches(options: Optional[ReadabilityOptions], max_doc_bytes: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..readability.instrumented import extract_with_metrics
        from ..spans import spans_to_html

        if sys.getrecursionlimit() < 20000:
            sys.setrecursionlimit(20000)
        opts = options or ReadabilityOptions(forced_page_type="")
        for pdf in batches:
            rows = []
            for doc_id, spans, doc_bytes in zip(
                pdf["doc_id"], pdf["spans"], pdf["doc_bytes"]
            ):
                row = {
                    "doc_id": doc_id,
                    "html": "",
                    "markdown": "",
                    "text": "",
                    "metadata_json": "",
                    "error": None,
                }
                try:
                    if spans is None:
                        raise ValueError("null spans")
                    if int(doc_bytes or 0) > max_doc_bytes:
                        raise ValueError(f"doc_bytes {doc_bytes} > cap")
                    article, _ = extract_with_metrics(
                        spans_to_html(spans), opts
                    )
                    row.update(render_article(article))
                except Exception as exc:  # noqa: BLE001
                    row["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in RENDERED_SCHEMA.fields]
            )

    return run


def render_documents(
    df: DataFrame,
    options: Optional[ReadabilityOptions] = None,
    num_partitions: Optional[int] = None,
    max_doc_bytes: int = MAX_DOC_BYTES,
) -> DataFrame:
    """documents(doc_id, spans) → (doc_id, html, markdown, text,
    metadata_json, error)."""
    df = with_doc_bytes(df)
    num = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    df = skew_partitioned(df, num)
    return df.select("doc_id", "spans", "doc_bytes").mapInPandas(
        _render_batches(options, max_doc_bytes), RENDERED_SCHEMA
    )
