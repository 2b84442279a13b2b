"""Metrics-instrumented extraction for the Spark pipeline.

Same lifecycle as ``extract`` (core.go:25-51 → 63-140) but additionally
captures per-document metrics (FIXTURES.md §2 ``metrics`` struct):
candidate_count, pruned_nodes, prune_ratio, top_score, link_density,
is_probably_content. These feed the partition-level metrics rollup
(SURVEY.md §4.2) — the reference has no equivalent; the numbers come from
its intermediate state (scored candidate list, preprocess deletions).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .classify import PAGE_TYPE_ARTICLE, classify_page_type
from .dom import get_inner_text, get_link_density
from .extract import (
    ReadabilityArticle,
    ReadabilityOptions,
    find_structural_elements,
)
from .fmt import count_nodes
from .metadata import get_article_byline, get_article_title
from .parser import parse_html
from .preprocess import preprocess_document
from .regexps import DEFAULT_CHAR_THRESHOLD, DEFAULT_N_TOP_CANDIDATES, byte_len
from .scoring import find_main_candidates, is_probably_content

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
    char_threshold = (
        options.char_threshold
        if options.char_threshold > 0
        else DEFAULT_CHAR_THRESHOLD
    )
    nb_top = (
        options.nb_top_candidates
        if options.nb_top_candidates > 0
        else DEFAULT_N_TOP_CANDIDATES
    )
    forced = options.forced_page_type

    metrics = ExtractionMetrics()
    doc = parse_html(html, "")
    nodes_before = count_nodes(doc.document_element)
    preprocess_document(doc)
    nodes_after = count_nodes(doc.document_element)
    metrics.pruned_nodes = max(0, nodes_before - nodes_after)
    metrics.prune_ratio = (
        metrics.pruned_nodes / nodes_before if nodes_before > 0 else 0.0
    )

    # the tree is immutable from here on (scoring touches only
    # ContentScore) — memoize get_inner_text for the whole read phase
    from .dom import begin_inner_text_cache, end_inner_text_cache

    begin_inner_text_cache()
    try:
        candidates = find_main_candidates(doc, nb_top)
        metrics.candidate_count = len(candidates)

        article_content = None
        if candidates:
            top = candidates[0]
            metrics.top_score = (
                top.readability if top.readability is not None else 0.0
            )
            metrics.link_density = get_link_density(top)
            metrics.is_probably_content = is_probably_content(top)
            text_length = byte_len(get_inner_text(top, False))
            if text_length >= char_threshold and metrics.link_density <= 0.5:
                article_content = top

        page_type = forced
        if page_type == "":
            page_type = (
                PAGE_TYPE_ARTICLE
                if article_content is not None
                else classify_page_type(doc, candidates, char_threshold, "")
            )

        header = footer = None
        other: list = []
        if page_type == PAGE_TYPE_ARTICLE and article_content is None:
            header, footer, other = find_structural_elements(doc)

        article = ReadabilityArticle(
            title=get_article_title(doc),
            byline=get_article_byline(doc),
            root=article_content,
            node_count=count_nodes(article_content),
            page_type=page_type,
            header=header,
            footer=footer,
            other_significant_nodes=other,
            aria_tree=None,
        )
    finally:
        end_inner_text_cache()
    return article, metrics
