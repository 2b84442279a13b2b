"""Deterministic synthetic corpus of interleaved text+media span documents.

Builds the north-rule input table (FIXTURES.md §1): rows of
``(doc_id, spans array<struct<kind,text,media_ref,offset>>)``, seed-stable
(every doc is a pure function of its doc_id — no wall clock, no network,
no process-global RNG), so tests, the DuckDB correctness round and the
bench harness all see byte-identical data.

Populations mirror FIXTURES.md §1's table; each cites the reference
branches it exercises. ``fixture-001`` chunks the reference's vendored
Mozilla fixture (/root/reference/testdata/fixtures/001/source.html,
CC BY-SA 3.0 test data) with every ``<img>`` replaced by a media span.

Pure Python, no Spark imports.
"""

from __future__ import annotations

import os
import random
import re
import zlib
from typing import Iterator, Optional

from .spans import KIND_MEDIA, KIND_TEXT

__all__ = [
    "generate_corpus",
    "generate_doc",
    "fixture_001_spans",
    "POPULATIONS",
    "FIXTURE_001_PATH",
]

# Vendored copy of the reference's CC BY-SA fixture (attribution in
# tests/fixtures/001/ATTRIBUTION.md) — no runtime dependency on the
# read-only reference checkout. Overridable for alternate corpora.
FIXTURE_001_PATH = os.environ.get(
    "SPARK_GRAFT_FIXTURE_001",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "001",
        "source.html",
    ),
)

# Bump whenever generation logic or populations change: cached bench
# corpora on disk are keyed by (n_docs, CORPUS_VERSION) so stale data
# can't silently survive a generator change.
CORPUS_VERSION = 2

_WORDS = (
    "analysis spark pipeline document content extraction reader article "
    "partition shuffle broadcast executor lineage checkpoint manifest "
    "signal window batch vector column schema parquet iceberg arrow "
    "heuristic density candidate ancestor threshold metadata byline title "
    "corpus golden fixture span media placeholder offset order invariant"
).split()

_IMG_RE = re.compile(r"<img\b[^>]*>", re.IGNORECASE)
_ALT_RE = re.compile(r'alt\s*=\s*"([^"]*)"', re.IGNORECASE)
_SRC_RE = re.compile(r'src\s*=\s*"([^"]*)"', re.IGNORECASE)


def _rng(doc_id: str, seed: int = 42) -> random.Random:
    # random.Random(str) seeds via SHA-512 of the bytes — deterministic
    # across processes (unlike hash(), which is salted per interpreter).
    return random.Random(f"{seed}:{doc_id}")


def _sentence(rng: random.Random, n_words: int, commas: bool = True) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    if commas and n_words >= 6:
        words[n_words // 2] += ","
    text = " ".join(words)
    return text[0].upper() + text[1:] + "."


def _paragraph(rng: random.Random, n_sentences: int = 4) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 16)) for _ in range(n_sentences))


def _media_ref(rng: random.Random, kind: str = "img") -> str:
    return f"media://{kind}/{zlib.crc32(str(rng.random()).encode()):08x}"


# ---------------------------------------------------------------------------
# segment → span chunking
# ---------------------------------------------------------------------------

def _segments_to_spans(
    segments: list[tuple], rng: random.Random, min_chunk: int = 1024,
    max_chunk: int = 4096,
) -> list[dict]:
    """Chunk ("text", html) segments at arbitrary boundaries (mid-tag is
    fine — only the concatenation is parsed, FIXTURES.md §1) and thread
    ("media", alt, ref) segments through as kind='media' spans."""
    spans: list[dict] = []
    offset = 0
    for seg in segments:
        if seg[0] == KIND_MEDIA:
            spans.append(
                {
                    "kind": KIND_MEDIA,
                    "text": seg[1],
                    "media_ref": seg[2],
                    "offset": offset,
                }
            )
            offset += 1
            continue
        html = seg[1]
        pos = 0
        while pos < len(html):
            size = rng.randint(min_chunk, max_chunk)
            chunk = html[pos : pos + size]
            spans.append(
                {"kind": KIND_TEXT, "text": chunk, "media_ref": "", "offset": offset}
            )
            offset += 1
            pos += size
    return spans


def _shuffle_offsets(spans: list[dict], rng: random.Random) -> list[dict]:
    """Return spans in scrambled physical order; offsets still reassemble."""
    shuffled = list(spans)
    rng.shuffle(shuffled)
    return shuffled


# ---------------------------------------------------------------------------
# populations (FIXTURES.md §1 table)
# ---------------------------------------------------------------------------

def fixture_001_spans(rng: Optional[random.Random] = None) -> list[dict]:
    """Reference fixture 001, imgs → media spans (site_extraction_test.go:94)."""
    rng = rng or _rng("fixture-001")
    with open(FIXTURE_001_PATH, encoding="utf-8") as f:
        html = f.read()
    segments: list[tuple] = []
    pos = 0
    for m in _IMG_RE.finditer(html):
        if m.start() > pos:
            segments.append((KIND_TEXT, html[pos : m.start()]))
        tag = m.group(0)
        alt_m = _ALT_RE.search(tag)
        src_m = _SRC_RE.search(tag)
        alt = alt_m.group(1) if alt_m else ""
        src = src_m.group(1) if src_m else ""
        ref = f"media://img/{zlib.crc32(src.encode('utf-8')):08x}"
        segments.append((KIND_MEDIA, alt, ref))
        pos = m.end()
    if pos < len(html):
        segments.append((KIND_TEXT, html[pos:]))
    return _shuffle_offsets(_segments_to_spans(segments, rng), rng)


def _page(head_extra: str, body: str, title: str = "Synthetic Page") -> str:
    return (
        f"<html><head><title>{title}</title>{head_extra}</head>"
        f"<body>{body}</body></html>"
    )


def _gen_article(rng: random.Random, i: int) -> list[tuple]:
    """≥500-byte bodies, commas, low link density — semantic shortcut
    (core.go:363-371), scoring (core.go:398-421), gate (core.go:83-94)."""
    wrapper = ("article", "main", "div")[i % 3]
    attrs = ' class="content post-body"' if wrapper == "div" else ""
    paras = "".join(
        f"<p>{_paragraph(rng, rng.randint(3, 6))}</p>" for _ in range(rng.randint(6, 12))
    )
    body = (
        f"<{wrapper}{attrs}><h1>Deep Dive {i}</h1>{paras}"
        f'<p>More details at <a href="/ref">the appendix</a>.</p></{wrapper}>'
    )
    return [(KIND_TEXT, _page("", body, f"Deep Dive {i} | Synthetic Journal"))]


def _gen_index(rng: random.Random, i: int) -> list[tuple]:
    """Link-farm/card-list pages → PageTypeOther (classify.go:135-144)."""
    cards = "".join(
        f'<div class="card"><a href="/p/{k}">{_sentence(rng, 5, False)}</a></div>'
        for k in range(60)
    )
    items = "".join(f'<li><a href="/i/{k}">Item {k}</a></li>' for k in range(15))
    segs: list[tuple] = [(KIND_TEXT, _page("", f"<div>{cards}<ul>{items}</ul>"))]
    return segs


def _gen_noise(rng: random.Random, i: int) -> list[tuple]:
    """Article wrapped in nav/header/footer/script/ads — preprocess removal
    (preprocess.go:13-35, 38-55, 133-155)."""
    paras = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(8))
    body = (
        '<header><nav><a href="/">Home</a><a href="/x">X</a></nav></header>'
        '<aside class="sidebar">ignore</aside>'
        '<div class="adsense" data-ad-slot="1">buy things</div>'
        '<div role="advertisement">more ads</div>'
        "<script>var x=1;</script><style>p{}</style>"
        f'<div class="article-content"><h1>Story {i}</h1>{paras}</div>'
        '<iframe src="/embed"></iframe><form><button>Go</button></form>'
        "<footer>© synthetic</footer>"
    )
    return [(KIND_TEXT, _page("", body, f"Story {i}"))]


def _gen_sidebar(rng: random.Random, i: int) -> list[tuple]:
    """Content vs negative-class competitors — GetClassWeight ±25
    (core.go:598-624), UnlikelyCandidates (internal/util/regexp.go:36-37)."""
    good = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(7))
    bad = "".join(f"<p>{_paragraph(rng, 2)}</p>" for _ in range(3))
    body = (
        f'<div class="main-content article">{good}</div>'
        f'<div class="sidebar widget">{bad}</div>'
        f'<div class="comment hidden-banner">{bad}</div>'
    )
    return [(KIND_TEXT, _page("", body, f"Sidebar Duel {i}"))]


def _gen_links(rng: random.Random, i: int) -> list[tuple]:
    """High link density incl. href="#" anchors — 0.3 hash coefficient
    (internal/dom/dom_utils.go:162-181)."""
    paras = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(5))
    hashlinks = "".join(
        f'<a href="#s{k}">{_sentence(rng, 4, False)}</a>' for k in range(10)
    )
    reallinks = "".join(
        f'<a href="/out/{k}">{_sentence(rng, 4, False)}</a>' for k in range(10)
    )
    body = (
        f'<div class="content">{paras}<p>{hashlinks}</p></div>'
        f'<div class="linkfarm">{reallinks}</div>'
    )
    return [(KIND_TEXT, _page("", body, f"Anchors {i}"))]


def _gen_meta(rng: random.Random, i: int) -> list[tuple]:
    """JSON-LD + meta tags + entities + multi-script commas
    (metadata.go:251-373, 383-425; Commas regex internal/util/regexp.go:40)."""
    jsonld = (
        '<script type="application/ld+json">{"@context":"https://schema.org",'
        '"@type":"NewsArticle","headline":"Meta Rich %d",'
        '"author":{"name":"Ada Author"},"datePublished":"2024-01-02",'
        '"publisher":{"name":"Synthetic Press"}}</script>' % i
    )
    metas = (
        '<meta name="author" content="Bea &amp; Bob"/>'
        '<meta property="og:site_name" content="Synthetic Press"/>'
        '<meta name="parsely-author" content="Cara"/>'
    )
    paras = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(6))
    body = (
        f'<article><h1>Meta Rich {i}</h1>'
        f"<p>lists: alpha，beta、gamma، delta﹐epsilon</p>{paras}</article>"
    )
    return [(KIND_TEXT, _page(jsonld + metas, body, f"Meta Rich {i} - Synthetic Press"))]


def _gen_structural(rng: random.Random, i: int) -> list[tuple]:
    """Article-classified pages that FAIL the 500-byte gate —
    FindStructuralElements fallback (core.go:154-273)."""
    body = (
        '<div role="banner" id="masthead">Site</div>'
        f"<main><p>{_sentence(rng, 10)}</p></main>"
        '<aside class="related">links</aside>'
        '<div role="contentinfo" id="colophon">fine print</div>'
    )
    return [(KIND_TEXT, _page("", body, f"Thin Page {i}"))]


def _gen_media_heavy(rng: random.Random, i: int) -> list[tuple]:
    """Media spans interleaved inside paragraphs — ref threading + output
    span ordering (the codec invariant)."""
    segs: list[tuple] = [
        (KIND_TEXT, f"<html><head><title>Gallery Essay {i}</title></head><body>"
                    f'<article><h1>Gallery Essay {i}</h1>')
    ]
    for k in range(rng.randint(4, 8)):
        segs.append((KIND_TEXT, f"<p>{_paragraph(rng)}"))
        segs.append((KIND_MEDIA, f"figure {k} of essay {i}", _media_ref(rng)))
        segs.append((KIND_TEXT, f"{_paragraph(rng, 2)}</p>"))
    segs.append((KIND_MEDIA, f"closing clip {i}", _media_ref(rng, "video")))
    segs.append((KIND_TEXT, "</article></body></html>"))
    return segs


def _gen_edge(rng: random.Random, i: int) -> list[tuple]:
    """Degenerate documents — body synthesis (internal/parser/parser.go:70-82),
    body fallback (core.go:493-495), IsProbablyVisible (dom_utils.go:51-60)."""
    variants = (
        "<html><head><title>empty</title></head><body></body></html>",
        "<p>no body tag at all</p>",
        _page("", '<div style="display: none">hidden</div>'
                  '<div hidden>also hidden</div>'
                  '<div aria-hidden="true">gone</div><p>tiny</p>'),
        _page("", "<div>" + "short. " * 2 + "</div>", ""),
    )
    return [(KIND_TEXT, variants[i % len(variants)])]


def _gen_giant(rng: random.Random, i: int) -> list[tuple]:
    """1–8 MiB docs with thousands of spans — skew handling (SURVEY.md §4.2).
    Bench-only (FIXTURES.md: not part of the correctness populations)."""
    target = rng.randint(1, 8) * 1024 * 1024
    segs: list[tuple] = [
        (KIND_TEXT, f"<html><head><title>Giant {i}</title></head><body><article>")
    ]
    size = 0
    while size < target:
        p = f"<p>{_paragraph(rng, 8)}</p>"
        segs.append((KIND_TEXT, p))
        size += len(p)
        if rng.random() < 0.02:
            segs.append((KIND_MEDIA, f"giant figure {size}", _media_ref(rng)))
    segs.append((KIND_TEXT, "</article></body></html>"))
    return segs


POPULATIONS: dict[str, object] = {
    "syn-article": _gen_article,
    "syn-index": _gen_index,
    "syn-noise": _gen_noise,
    "syn-sidebar": _gen_sidebar,
    "syn-links": _gen_links,
    "syn-meta": _gen_meta,
    "syn-structural": _gen_structural,
    "syn-media-heavy": _gen_media_heavy,
    "syn-edge": _gen_edge,
}


def generate_doc(doc_id: str, seed: int = 42) -> list[dict]:
    """Spans for one doc_id — a pure function of (doc_id, seed)."""
    rng = _rng(doc_id, seed)
    if doc_id == "fixture-001":
        return fixture_001_spans(rng)
    population, _, idx = doc_id.rpartition("-")
    i = int(idx)
    if population == "syn-giant":
        gen = _gen_giant
    else:
        gen = POPULATIONS[population]
    segments = gen(rng, i)
    min_chunk, max_chunk = (1024, 4096)
    if population == "syn-edge":
        min_chunk, max_chunk = (8, 64)  # tiny chunks stress mid-tag splits
    spans = _segments_to_spans(segments, rng, min_chunk, max_chunk)
    return _shuffle_offsets(spans, rng)


def corpus_doc_ids(
    n_docs: int,
    include_fixture: bool = True,
    giant_every: int = 0,
) -> list[str]:
    """The deterministic doc_id sequence of a corpus of ``n_docs`` rows.

    Ids are cheap; spans are a pure function of the id (``generate_doc``),
    so a distributed corpus build parallelizes the ids and generates spans
    executor-side (sources/tables.py).
    """
    ids: list[str] = []
    names = list(POPULATIONS)
    if include_fixture and os.path.exists(FIXTURE_001_PATH) and n_docs > 0:
        ids.append("fixture-001")
    i = 0
    while len(ids) < n_docs:
        if giant_every and i and i % giant_every == 0:
            ids.append(f"syn-giant-{i:06d}")
        else:
            ids.append(f"{names[i % len(names)]}-{i:06d}")
        i += 1
    return ids


def generate_corpus(
    n_docs: int,
    seed: int = 42,
    include_fixture: bool = True,
    giant_every: int = 0,
) -> Iterator[tuple[str, list[dict]]]:
    """Yield (doc_id, spans) rows; round-robins the populations.

    ``giant_every=k`` inserts one syn-giant doc per k ordinary docs
    (bench-only skew). Deterministic for a given (n_docs, seed, flags).
    """
    for doc_id in corpus_doc_ids(n_docs, include_fixture, giant_every):
        yield doc_id, generate_doc(doc_id, seed)
