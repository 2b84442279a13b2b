"""CLI parity with the reference's ``cmd/readability``
(/root/reference/cmd/readability/main.go:17-142).

Usage:
    python -m go_readability_spark.cli [--format html|markdown] [--metadata] [SOURCE]

SOURCE is a file path, or ``-``/absent for stdin (≤1 GiB, main.go:86-94).
HTTP sources (main.go:101-123) are intentionally unsupported here — this
sandbox has no network; production would fetch upstream of the table.
"""

from __future__ import annotations

import argparse
import json
import sys

MAX_STDIN = 1 << 30  # 1 GiB cap, main.go:88


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
        print(
            "error: HTTP sources are not supported in this build",
            file=sys.stderr,
        )
        return 2

    if args.source == "-":
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
