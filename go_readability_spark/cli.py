"""CLI parity with the reference's ``cmd/readability``
(/root/reference/cmd/readability/main.go:17-142).

Usage:
    python -m go_readability_spark.cli [--format html|markdown] [--metadata] [SOURCE]

SOURCE is a file path, an http(s) URL (fetched like main.go:101-123;
fails with exit 2 where no network exists, e.g. this sandbox), or
``-``/absent for stdin (≤1 GiB, main.go:86-94).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Callable, Optional

MAX_STDIN = 1 << 30  # 1 GiB cap, main.go:88

# Injectable opener (tests / sandboxes without network). None → urllib.
URL_OPENER: Optional[Callable] = None


def fetch_url(url: str, max_bytes: int = MAX_STDIN) -> str:
    """HTTP source (fetchContent, main.go:101-123): GET, require 200,
    read the body. The opener is injectable via ``URL_OPENER``."""
    if URL_OPENER is not None:
        opener = URL_OPENER
    else:
        import urllib.request

        def opener(u):
            return urllib.request.urlopen(u, timeout=30)  # noqa: S310

    with opener(url) as resp:
        status = getattr(resp, "status", 200)
        if status != 200:
            raise RuntimeError(
                f"HTTP request failed with status code: {status}"
            )
        return resp.read(max_bytes).decode("utf-8", "replace")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="go-readability-spark", description=__doc__
    )
    parser.add_argument(
        "--format",
        choices=("html", "markdown"),
        default="html",
        help="output format (default: html)",
    )
    parser.add_argument(
        "--metadata",
        action="store_true",
        help="print metadata JSON instead of content",
    )
    parser.add_argument("source", nargs="?", default="-")
    args = parser.parse_args(argv)

    if args.source.startswith(("http://", "https://")):
        try:
            html = fetch_url(args.source)
        except Exception as exc:  # noqa: BLE001 — CLI boundary
            print(f"error: failed to fetch URL: {exc}", file=sys.stderr)
            return 2
    elif args.source == "-":
        html = sys.stdin.buffer.read(MAX_STDIN).decode("utf-8", "replace")
    else:
        with open(args.source, encoding="utf-8", errors="replace") as f:
            html = f.read()

    from .readability import extract
    from .readability.fmt import to_html
    from .readability.markdown import to_markdown

    article = extract(html)

    if args.metadata:
        # cmd/readability/main.go:52-64
        print(
            json.dumps(
                {
                    "title": article.title,
                    "byline": article.byline,
                    "nodeCount": article.node_count,
                    "pageType": article.page_type,
                },
                ensure_ascii=False,
                indent=2,
            )
        )
        return 0

    if args.format == "markdown":
        print(to_markdown(article.root))
    else:
        print(to_html(article.root))
    return 0


if __name__ == "__main__":
    sys.exit(main())
