"""DataFrame-level operators: extraction, dedup, similarity, text analysis."""

from .extract import extract_documents, metrics_rollup  # noqa: F401
