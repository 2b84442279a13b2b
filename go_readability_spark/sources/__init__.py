"""Sources: testdata parquet loaders and the distributed corpus builder."""

from .tables import (  # noqa: F401
    corpus_df,
    documents_as_spans_df,
    load_table,
)
