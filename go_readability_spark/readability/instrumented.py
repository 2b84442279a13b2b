"""Metrics-instrumented extraction for the Spark pipeline.

Same lifecycle as ``extract`` (core.go:25-51 → 63-140) but additionally
captures per-document metrics (FIXTURES.md §2 ``metrics`` struct):
candidate_count, pruned_nodes, prune_ratio, top_score, link_density,
is_probably_content. These feed the partition-level metrics rollup
(SURVEY.md §4.2) — the reference has no equivalent; the numbers come from
its intermediate state (scored candidate list, preprocess deletions).

The extraction itself is shared with ``extract_content`` via
``_extract_content_core`` — one implementation, so the instrumented Spark
path cannot drift from the library path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .classify import PAGE_TYPE_ARTICLE
from .extract import (
    ReadabilityArticle,
    ReadabilityOptions,
    _extract_content_core,
)
from .fmt import count_nodes
from .parser import parse_html
from .preprocess import preprocess_document

__all__ = ["ExtractionMetrics", "extract_with_metrics"]


@dataclass
class ExtractionMetrics:
    candidate_count: int = 0
    pruned_nodes: int = 0
    prune_ratio: float = 0.0
    top_score: float = 0.0
    link_density: float = 0.0
    is_probably_content: bool = False


def extract_with_metrics(
    html: str, options: Optional[ReadabilityOptions] = None
) -> tuple[ReadabilityArticle, ExtractionMetrics]:
    """``extract_content`` (parse+preprocess included) plus captured metrics.

    With ``options=None`` this mirrors ``extract``'s defaulting quirk
    (ForcedPageType→"article", core.go:46-47). An explicit
    ``ReadabilityOptions(forced_page_type="")`` reaches the classifier —
    the pipeline uses that so index pages get page_type="other".
    """
    if options is None:
        options = ReadabilityOptions(forced_page_type=PAGE_TYPE_ARTICLE)

    metrics = ExtractionMetrics()
    doc = parse_html(html, "")
    nodes_before = count_nodes(doc.document_element)
    preprocess_document(doc)
    nodes_after = count_nodes(doc.document_element)
    metrics.pruned_nodes = max(0, nodes_before - nodes_after)
    metrics.prune_ratio = (
        metrics.pruned_nodes / nodes_before if nodes_before > 0 else 0.0
    )

    captured: dict = {}
    article = _extract_content_core(doc, options, metrics_out=captured)
    metrics.candidate_count = captured.get("candidate_count", 0)
    metrics.top_score = captured.get("top_score", 0.0)
    metrics.link_density = captured.get("link_density", 0.0)
    metrics.is_probably_content = captured.get("is_probably_content", False)
    return article, metrics
