"""Extraction lifecycle: parse → preprocess → score → gate → classify → meta.

Ports /root/reference/core.go:25-326 (Extract, ExtractContent,
FindStructuralElements, AddSignificantElementsByClassOrId) and the
options/article structs (options.go:21-49, article.go:12-26).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .classify import (
    PAGE_TYPE_ARTICLE,
    classify_page_type,
    is_semantic_tag,
    is_significant_node,
)
from .dom import (
    get_elements_by_tag_name,
    get_elements_in_tag_order,
    get_inner_text,
    get_link_density,
    is_probably_visible,
)
from .fmt import count_nodes
from .metadata import get_article_byline, get_article_title
from .parser import parse_html
from .preprocess import preprocess_document
from .regexps import DEFAULT_CHAR_THRESHOLD, DEFAULT_N_TOP_CANDIDATES, byte_len
from .scoring import find_main_candidates
from .vdom import VDocument, VElement

__all__ = [
    "ReadabilityOptions",
    "ReadabilityArticle",
    "extract",
    "extract_content",
    "find_structural_elements",
    "add_significant_elements_by_class_or_id",
    "create_extractor",
]

# core.go:282-326 significant class/id substrings
_SIGNIFICANT_PATTERNS = (
    "content", "main", "article", "post", "entry", "body", "text",
    "story", "container", "wrapper", "page", "blog", "section",
)


@dataclass
class ReadabilityOptions:
    """options.go:21-33 / DefaultOptions options.go:43-49."""

    char_threshold: int = DEFAULT_CHAR_THRESHOLD
    nb_top_candidates: int = DEFAULT_N_TOP_CANDIDATES
    generate_aria_tree: bool = False
    forced_page_type: str = ""


@dataclass
class ArticleContent:
    """article.go:28-34 — article-page view of the result."""

    title: str = ""
    byline: str = ""
    root: Optional[VElement] = None


@dataclass
class OtherContent:
    """article.go:36-45 — non-article-page view of the result."""

    title: str = ""
    header: Optional[VElement] = None
    footer: Optional[VElement] = None
    other_significant_nodes: list[VElement] = field(default_factory=list)
    aria_tree: object = None


@dataclass
class ReadabilityArticle:
    """article.go:12-26."""

    title: str = ""
    byline: str = ""
    root: Optional[VElement] = None
    node_count: int = 0
    page_type: str = PAGE_TYPE_ARTICLE
    header: Optional[VElement] = None
    footer: Optional[VElement] = None
    other_significant_nodes: list[VElement] = field(default_factory=list)
    aria_tree: object = None  # never populated by Extract (core.go:120-126)

    def get_content_by_page_type(self):
        """ArticleContent or OtherContent by page type (article.go:54-75)."""
        if self.page_type == PAGE_TYPE_ARTICLE:
            return ArticleContent(
                title=self.title, byline=self.byline, root=self.root
            )
        return OtherContent(
            title=self.title,
            header=self.header,
            footer=self.footer,
            other_significant_nodes=self.other_significant_nodes,
            aria_tree=self.aria_tree,
        )


def extract(
    html: str, options: Optional[ReadabilityOptions] = None
) -> ReadabilityArticle:
    """Main entry point (core.go:25-51).

    Defaults are applied to a COPY: Go passes Options by value
    (core.go:25), so its in-function defaulting never leaks to the
    caller — mutating the caller's instance here would silently force
    page_type='article' on their later extract_content calls."""
    options = options or ReadabilityOptions()
    doc = parse_html(html, "")
    preprocess_document(doc)
    effective = ReadabilityOptions(
        char_threshold=(
            options.char_threshold
            if options.char_threshold > 0
            else DEFAULT_CHAR_THRESHOLD
        ),
        nb_top_candidates=(
            options.nb_top_candidates
            if options.nb_top_candidates > 0
            else DEFAULT_N_TOP_CANDIDATES
        ),
        generate_aria_tree=options.generate_aria_tree,
        forced_page_type=options.forced_page_type or PAGE_TYPE_ARTICLE,
    )
    return extract_content(doc, effective)


def extract_content(
    doc: VDocument, options: Optional[ReadabilityOptions] = None
) -> ReadabilityArticle:
    """Core extraction (core.go:63-140).

    NOTE (quirk replicated): ``Extract`` defaults ForcedPageType to
    "article" when unset (core.go:46-47), so the library path always forces
    page_type="article" and ``ClassifyPageType`` is only reachable by
    calling this function directly with forced_page_type="".
    """
    options = options or ReadabilityOptions(forced_page_type="")
    return _extract_content_core(doc, options)


def _extract_content_core(
    doc: VDocument,
    options: ReadabilityOptions,
    metrics_out: Optional[dict] = None,
) -> ReadabilityArticle:
    """Shared lifecycle for extract_content and extract_with_metrics.

    ``metrics_out`` (a plain dict, to avoid a circular import with
    instrumented.py) receives candidate_count / top_score / link_density /
    is_probably_content when provided."""
    char_threshold = (
        options.char_threshold
        if options.char_threshold > 0
        else DEFAULT_CHAR_THRESHOLD
    )
    nb_top_candidates = (
        options.nb_top_candidates
        if options.nb_top_candidates > 0
        else DEFAULT_N_TOP_CANDIDATES
    )

    # the tree is immutable during scoring/classify/metadata (only
    # ContentScore mutates) — memoize get_inner_text for this read phase
    from .dom import begin_inner_text_cache, end_inner_text_cache

    begin_inner_text_cache()
    try:
        candidates = find_main_candidates(doc, nb_top_candidates)
        top_candidate: Optional[VElement] = None
        article_content: Optional[VElement] = None
        if metrics_out is not None:
            metrics_out["candidate_count"] = len(candidates)

        if candidates:
            top_candidate = candidates[0]
            text_length = byte_len(get_inner_text(top_candidate, False))
            link_density = get_link_density(top_candidate)
            if metrics_out is not None:
                from .scoring import is_probably_content

                metrics_out["top_score"] = (
                    top_candidate.readability
                    if top_candidate.readability is not None
                    else 0.0
                )
                metrics_out["link_density"] = link_density
                metrics_out["is_probably_content"] = is_probably_content(
                    top_candidate
                )
            # accept gate (core.go:83-94)
            if text_length >= char_threshold and link_density <= 0.5:
                article_content = top_candidate

        page_type = options.forced_page_type
        if page_type == "":
            if article_content is not None:
                page_type = PAGE_TYPE_ARTICLE
            else:
                page_type = classify_page_type(
                    doc, candidates, char_threshold, ""
                )

        title = get_article_title(doc)
        byline = get_article_byline(doc)

        header: Optional[VElement] = None
        footer: Optional[VElement] = None
        other_significant_nodes: list[VElement] = []
        if page_type == PAGE_TYPE_ARTICLE and article_content is None:
            header, footer, other_significant_nodes = find_structural_elements(
                doc
            )
    finally:
        end_inner_text_cache()

    return ReadabilityArticle(
        title=title,
        byline=byline,
        root=article_content,
        node_count=count_nodes(article_content),
        page_type=page_type,
        header=header,
        footer=footer,
        other_significant_nodes=other_significant_nodes,
        aria_tree=None,
    )


def find_structural_elements(
    doc: VDocument,
) -> tuple[Optional[VElement], Optional[VElement], list[VElement]]:
    """Header/footer/significant-node fallback (core.go:154-273)."""
    body = doc.body
    header: Optional[VElement] = None
    footer: Optional[VElement] = None

    # 1. header (core.go:161-184)
    header_tags = get_elements_by_tag_name(doc.document_element, "header")
    if len(header_tags) == 1:
        header = header_tags[0]
    else:
        for el in get_elements_by_tag_name(body, "*"):
            role = el.get_attribute("role").lower()
            el_id = el.id.lower()
            class_name = el.class_name.lower()
            if (
                role == "banner"
                or el_id == "header"
                or el_id == "masthead"
                or "header" in class_name
                or "masthead" in class_name
            ):
                if header is None or (
                    el.parent is body and header.parent is not body
                ):
                    header = el

    # 2. footer, scanned bottom-up (core.go:186-223)
    footer_tags = get_elements_by_tag_name(doc.document_element, "footer")
    if len(footer_tags) == 1:
        footer = footer_tags[0]
    else:
        all_elements = get_elements_by_tag_name(body, "*")
        for el in reversed(all_elements):
            role = el.get_attribute("role").lower()
            el_id = el.id.lower()
            class_name = el.class_name.lower()
            if (
                role == "contentinfo"
                or el_id == "footer"
                or el_id == "colophon"
                or "footer" in class_name
                or "site-info" in class_name
            ):
                if footer is None:
                    is_inside_header = False
                    current = el
                    while current is not None and current is not body:
                        if current is header:
                            is_inside_header = True
                            break
                        current = current.parent
                    if not is_inside_header:
                        footer = el

    # 3. other significant nodes (core.go:225-272); one grouped walk,
    # concatenated in the reference's tag order
    potential = get_elements_in_tag_order(
        body, ("main", "article", "section", "aside", "nav")
    )
    add_significant_elements_by_class_or_id(body, potential)

    other_significant_nodes: list[VElement] = []
    for node in potential:
        is_inside = False
        current = node
        while current is not None and current is not body:
            if current is header or current is footer:
                is_inside = True
                break
            current = current.parent
        already = any(n is node for n in other_significant_nodes)
        if not is_inside and not already:
            if is_probably_visible(node) and (
                is_significant_node(node) or is_semantic_tag(node)
            ):
                other_significant_nodes.append(node)

    return header, footer, other_significant_nodes


def add_significant_elements_by_class_or_id(
    body: VElement, potential_nodes: list[VElement]
) -> None:
    """Append elements whose class+" "+id contains a significant substring
    (core.go:282-326). Mutates ``potential_nodes`` in place."""
    for el in get_elements_by_tag_name(body, "*"):
        combined = el.class_name.lower() + " " + el.id.lower()
        for pattern in _SIGNIFICANT_PATTERNS:
            if pattern in combined:
                if not any(n is el for n in potential_nodes):
                    potential_nodes.append(el)
                break


def create_extractor(options: ReadabilityOptions):
    """core.go:582-586."""

    def _extract(html: str) -> ReadabilityArticle:
        return extract(html, ReadabilityOptions(**options.__dict__))

    return _extract
