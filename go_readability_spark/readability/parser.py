"""HTML parsing into the virtual DOM.

The reference parses with golang.org/x/net/html (a WHATWG HTML5 parser) and
converts to its VDOM (/root/reference/internal/parser/parser.go:16-126):
tags lowercased (:98), comments/doctype dropped (:124), a body synthesized
when absent (:70-82), and the <html> element's own attributes dropped
(:47 creates a fresh "html" element).

html5lib is not available in this environment, so this module implements an
HTML5-*subset* tree builder on top of the stdlib tokenizer
(``html.parser.HTMLParser``). It covers the constructions the extraction
algorithm is sensitive to:

- void elements never take children
- ``<p>`` is implicitly closed by block-level start tags; ``<li>`` by
  ``<li>``; ``<dt>/<dd>``, ``<tr>``, ``<td>/<th>``, ``<option>``,
  ``<thead>/<tbody>/<tfoot>`` likewise
- head/body synthesis with head-only elements kept in <head>
- character references decoded in text (convert_charrefs)
- script/style contents kept as raw text (tokenizer CDATA mode)
- one newline immediately after ``<pre>``/``<textarea>``/``<listing>``
  start tags is dropped (HTML5 tokenizer rule honoured by x/net/html)
- ``<x-media .../>`` — OUR span-codec placeholder, not an HTML tag — is
  treated as void so interleaved media refs never swallow siblings

Not implemented (golden corpora avoid them; fixture-001 does not use them):
table foster-parenting, the adoption-agency algorithm for misnested
formatting tags, template contents, SVG/MathML foreign content.
"""

from __future__ import annotations

from html.parser import HTMLParser

from .vdom import VDocument, VElement, VText

__all__ = [
    "parse_html",
    "serialize_to_html",
    "serialize_document_to_html",
    "serialize_to_writer",
    "serialize_document_to_writer",
]

VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
    "x-media",  # our media placeholder (span codec), void by definition
})

HEAD_ONLY = frozenset({
    "base", "basefont", "bgsound", "link", "meta", "title", "noframes",
    "style", "script", "template",
})

# Start tags that implicitly close an open <p> (HTML5 "close a p element")
P_CLOSERS = frozenset({
    "address", "article", "aside", "blockquote", "details", "dialog", "dir",
    "div", "dl", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "main",
    "menu", "nav", "ol", "p", "pre", "section", "table", "ul", "dd", "dt",
    "li", "xmp", "listing",
})

# tag -> ORDERED closer groups. The search walks the open stack once
# (innermost-out, bounded by scope); the close happens at the INNERMOST
# match of the earliest-priority group that matched anywhere in scope. The
# ordering encodes HTML5's layered implied-ends: a <tr> start closes the
# open ROW (which also pops an unclosed cell above it) when one exists,
# and only falls back to closing a bare cell otherwise — a flat
# nearest-match set closed just the cell and nested the new row inside
# the old one (found by tools/parse_fuzz.py round 2).
SIBLING_CLOSERS: dict[str, tuple[frozenset[str], ...]] = {
    "li": (frozenset({"li"}),),
    "dt": (frozenset({"dt", "dd"}),),
    "dd": (frozenset({"dt", "dd"}),),
    "tr": (frozenset({"tr"}), frozenset({"td", "th"})),
    "td": (frozenset({"td", "th"}),),
    "th": (frozenset({"td", "th"}),),
    "thead": (
        frozenset({"thead", "tbody", "tfoot"}),
        frozenset({"tr"}),
        frozenset({"td", "th"}),
    ),
    "tbody": (
        frozenset({"thead", "tbody", "tfoot"}),
        frozenset({"tr"}),
        frozenset({"td", "th"}),
    ),
    "tfoot": (
        frozenset({"thead", "tbody", "tfoot"}),
        frozenset({"tr"}),
        frozenset({"td", "th"}),
    ),
    "option": (frozenset({"option"}),),
    "optgroup": (frozenset({"option", "optgroup"}),),
    # HTML5 "in table" mode: a <table> start tag acts as </table> first.
    # The td/th/caption scope boundaries keep legitimate nested tables
    # (inside a cell) open — only a table started in row/table context
    # (e.g. directly inside <tr>) closes the outer one.
    "table": (frozenset({"table"}),),
}

# per-tag union of its closer groups, precomputed off the hot path
_SIBLING_ANY: dict[str, frozenset[str]] = {
    tag: frozenset().union(*groups) for tag, groups in SIBLING_CLOSERS.items()
}

# Elements that bound the implicit-close search (approximate HTML5 scopes)
SCOPE_BOUNDARIES = frozenset({
    "html", "body", "table", "td", "th", "caption", "template", "applet",
    "object", "marquee", "select",
})

# Per-tag additions to the boundary set: an <li> start tag closes an open
# <li> only within "list item scope" (HTML5), i.e. the search must stop at
# a nested <ul>/<ol> so inner lists don't close the outer item.
# HTML5 "has an element in list item scope" is bounded by ul/ol; the
# spec's generate-implied-ends walk for li/dt/dd additionally stops at
# any "special" element other than address/div/p — approximated here by
# the block-level set (a new <li> must not close a list item across an
# intervening <section>/<blockquote>/heading boundary).
_LI_SPECIAL_STOPS = frozenset({
    "ul", "ol", "section", "article", "aside", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6", "nav", "header", "footer",
    "main", "figure", "figcaption", "fieldset", "details", "summary",
    "dl", "form", "hgroup", "menu",
})
SIBLING_SCOPE_EXTRA: dict[str, frozenset[str]] = {
    "li": _LI_SPECIAL_STOPS,
    "dt": _LI_SPECIAL_STOPS,
    "dd": _LI_SPECIAL_STOPS,
}

PRE_LIKE = frozenset({"pre", "textarea", "listing"})

# HTML5 "active formatting elements" — candidates for reconstruction when
# a mismatched end tag pops them (simplified adoption agency)
FORMATTING_ELEMENTS = frozenset({
    "a", "b", "big", "code", "em", "font", "i", "nobr", "s", "small",
    "strike", "strong", "tt", "u",
})

# Simplified foster parenting: while one of these is the current node,
# content other than table structure is inserted BEFORE the open table
_TABLE_CONTEXT = frozenset({"table", "thead", "tbody", "tfoot", "tr"})
_TABLE_ALLOWED = frozenset({
    "caption", "colgroup", "col", "thead", "tbody", "tfoot", "tr", "td",
    "th", "script", "style", "template", "form",
})


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = VElement("html")  # <html> attrs dropped (parser.go:47)
        self.head: VElement | None = None
        self.body: VElement | None = None
        self.stack: list[VElement] = [self.root]
        self.mode = "before_head"
        # formatting elements popped by a mismatched end tag, awaiting lazy
        # reconstruction (tag, attrs) — see _materialize_pending
        self.pending_format: list[tuple[str, dict]] = []

    # -- helpers -------------------------------------------------------
    def updatepos(self, i: int, j: int) -> int:
        # line/column tracking disabled: nothing in the tree builder or
        # its callers reads self.lineno/self.offset, and the stdlib
        # bookkeeping (a splitlines per data chunk) showed up in per-doc
        # profiles. Return j exactly as _markupbase.updatepos does.
        return j

    def _current(self) -> VElement:
        return self.stack[-1]

    def _ensure_head(self) -> None:
        if self.head is None:
            self.head = VElement("head")
            self.root.append_child(self.head)

    def _ensure_body(self) -> None:
        self._ensure_head()
        if self.body is None:
            self.body = VElement("body")
            self.root.append_child(self.body)
        if self.mode != "in_body":
            # drop any open head-structure from the stack
            self.stack = [self.root, self.body]
            self.mode = "in_body"

    def _insert(self, tag: str, attrs, push: bool) -> VElement:
        el = VElement(tag)
        for name, value in attrs:
            # duplicate attributes: first one wins (HTML5 tokenizer rule)
            if name not in el.attributes:
                el.attributes[name] = value if value is not None else ""
        self._current().append_child(el)
        if push:
            self.stack.append(el)
        return el

    def _implicit_close(self, tag: str) -> None:
        """Pop elements that the HTML5 algorithm would close before ``tag``."""
        if tag in P_CLOSERS:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag_name
                if t == "p":
                    del self.stack[i:]
                    break
                if t in SCOPE_BOUNDARIES:
                    break
        groups = SIBLING_CLOSERS.get(tag)
        if groups:
            any_closer = _SIBLING_ANY[tag]
            extra = SIBLING_SCOPE_EXTRA.get(tag)
            # innermost match per group, scanned once out to the scope
            # boundary; close at the earliest-priority group that matched
            # (the scan stops early when the top-priority group matches —
            # its first, i.e. innermost, hit always wins)
            matches: dict[int, int] = {}
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag_name
                for g, group in enumerate(groups):
                    if t in group and g not in matches:
                        matches[g] = i
                if 0 in matches:
                    break
                if t not in any_closer and (
                    t in SCOPE_BOUNDARIES or (extra and t in extra)
                ):
                    break
            for g in range(len(groups)):
                if g in matches:
                    del self.stack[matches[g]:]
                    break

    # -- tokenizer callbacks -------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "html":
            return  # root exists; x/net/html attrs are dropped anyway
        if tag == "head":
            if self.mode == "before_head":
                self._ensure_head()
                self.stack = [self.root, self.head]
                self.mode = "in_head"
            return
        if tag == "body":
            self._ensure_body()
            if self.body is not None:
                # per-attribute merge: a repeated <body> tag contributes
                # each attribute the body doesn't already have
                # (x/net/html body-in-body rule)
                for name, value in attrs:
                    if name not in self.body.attributes:
                        self.body.attributes[name] = (
                            value if value is not None else ""
                        )
            return

        if self.mode == "before_head":
            if tag in HEAD_ONLY:
                self._ensure_head()
                self.stack = [self.root, self.head]
                self.mode = "in_head"
            else:
                self._ensure_body()
        elif self.mode == "in_head":
            if tag not in HEAD_ONLY and self._current() is self.head:
                self._ensure_body()
        elif self.mode == "after_head":
            # content after an explicit </head> with no <body> tag must
            # still synthesize and enter body (x/net/html :70-82)
            if tag not in HEAD_ONLY:
                self._ensure_body()

        if self.pending_format:
            if tag in P_CLOSERS or self._current().tag_name in _TABLE_CONTEXT:
                # conservative containment: reconstruction stays local to
                # the inline run; block boundaries and table context
                # cancel it (the spec carries formatting further, but
                # materializing into <tr>/<table> corrupts the tree)
                self.pending_format.clear()
            else:
                self._materialize_pending()

        # implicit closes run BEFORE the foster check so that a tag which
        # closes a fostered element (e.g. the second <p> of
        # <table><p>one<p>two) re-enters table context and fosters too
        self._implicit_close(tag)

        # foster parenting: non-table content opened in table context goes
        # before the table (HTML5 "in table" insertion mode, simplified)
        if (
            self._current().tag_name in _TABLE_CONTEXT
            and tag not in _TABLE_ALLOWED
            and tag != "table"
        ):
            point = self._foster_point()
            if point is not None:
                parent, idx = point
                el = VElement(tag)
                for name, value in attrs:
                    if name not in el.attributes:
                        el.attributes[name] = value if value is not None else ""
                el.parent = parent
                parent.children.insert(idx, el)
                if tag not in VOID_ELEMENTS:
                    self.stack.append(el)
                return

        self._insert(tag, attrs, push=tag not in VOID_ELEMENTS)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # "<div/>" on a non-void HTML element: x/net/html ignores the
        # self-closing flag and keeps the element open — same code path
        # as a plain start tag either way.
        self.handle_starttag(tag, attrs)

    def _foster_point(self):
        """(parent, index) immediately before the nearest open table, or
        None when no table is open (then content inserts normally)."""
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag_name == "table":
                table = self.stack[i]
                parent = table.parent if table.parent is not None else self.stack[i - 1]
                for idx, child in enumerate(parent.children):
                    if child is table:
                        return parent, idx
                return parent, len(parent.children)
        return None

    def _materialize_pending(self) -> None:
        """Reconstruct formatting elements popped by a mismatched end tag
        (lazy — only when content actually follows, so no empty elements
        are synthesized; the common observable effect of the HTML5
        adoption-agency algorithm: ``<b>x<i>y</b>z`` italicizes z)."""
        for tag, attrs in self.pending_format:
            el = VElement(tag)
            el.attributes.update(attrs)
            self._current().append_child(el)
            self.stack.append(el)
        self.pending_format.clear()

    def handle_endtag(self, tag: str) -> None:
        if tag in ("html", "body", "head"):
            if tag == "head" and self.mode == "in_head":
                self.stack = [self.root]
                self.mode = "after_head"
            return
        stack = self.stack
        # fast path: balanced end tag closes the current node — nothing
        # sits above the match, so no formatting elements can be popped
        if len(stack) > 1 and stack[-1].tag_name == tag:
            del stack[-1]
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag_name == tag:
                # formatting elements above the match are implicitly
                # popped — queue them for reconstruction, EXCEPT across
                # cell/caption/table closes: those are formatting-scope
                # markers in HTML5, formatting never leaks out of a cell
                if tag not in ("td", "th", "caption", "table"):
                    popped = self.stack[i + 1 :]
                    self.pending_format.extend(
                        (el.tag_name, dict(el.attributes))
                        for el in popped
                        if el.tag_name in FORMATTING_ELEMENTS
                    )
                del self.stack[i:]
                return
        # end tag for a pending (not-yet-reconstructed) formatting
        # element cancels it
        for j in range(len(self.pending_format) - 1, -1, -1):
            if self.pending_format[j][0] == tag:
                del self.pending_format[j]
                return
        # unmatched end tag: ignored

    def handle_data(self, data: str) -> None:
        if not data:
            return
        if self.mode in ("before_head", "after_head"):
            if data.strip() == "":
                return  # whitespace between structure tags is dropped
            self._ensure_body()
        elif self.mode == "in_head" and self._current() is self.head:
            if data.strip() == "":
                # whitespace inside <head> between elements: keep in head
                # (x/net/html inserts it); it never affects body text.
                self.head.append_child(VText(data))
                return
            self._ensure_body()

        if self.pending_format and data.strip():
            if self._current().tag_name in _TABLE_CONTEXT:
                self.pending_format.clear()  # never reconstruct into <tr>
            else:
                self._materialize_pending()

        # foster parenting for character data in table context
        if self._current().tag_name in _TABLE_CONTEXT and data.strip():
            point = self._foster_point()
            if point is not None:
                parent, idx = point
                prev = parent.children[idx - 1] if idx > 0 else None
                if isinstance(prev, VText):
                    prev.text_content += data
                else:
                    node = VText(data)
                    node.parent = parent
                    parent.children.insert(idx, node)
                return

        cur = self._current()
        if (
            cur.tag_name in PRE_LIKE
            and not cur.children
            and data.startswith("\n")
        ):
            data = data[1:]
            if not data:
                return
        # merge adjacent text nodes (x/net/html produces one text node per
        # contiguous run; the tokenizer may split on entity boundaries)
        if cur.children and isinstance(cur.children[-1], VText):
            cur.children[-1].text_content += data
        else:
            cur.append_child(VText(data))

    # comments / doctype / PIs dropped (parser.go:124)
    def handle_comment(self, data: str) -> None:  # noqa: D102
        pass

    def handle_decl(self, decl: str) -> None:  # noqa: D102
        pass

    def handle_pi(self, data: str) -> None:  # noqa: D102
        pass

    def unknown_decl(self, data: str) -> None:  # noqa: D102
        pass


def parse_html(html_content: str, base_uri: str = "") -> VDocument:
    """Parse an HTML string into a VDocument (parser.go:16-90).

    Like the reference, a body element is always present on return (:70-82),
    and the returned document element is always a fresh ``<html>``.
    """
    builder = _TreeBuilder()
    builder.feed(html_content)
    builder.close()
    builder._ensure_body()
    doc = VDocument(builder.root, builder.body)
    doc.base_uri = base_uri
    doc.document_uri = base_uri
    return doc


def _escape_text(text: str) -> str:
    """html.EscapeString equivalent (escapes &, ', <, >, ")."""
    return (
        text.replace("&", "&amp;")
        .replace("'", "&#39;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&#34;")
    )


def serialize_to_html(node) -> str:
    """Serialize a node with sorted attributes (parser.go:129-201)."""
    if node is None:
        return ""
    if isinstance(node, VText):
        return _escape_text(node.text_content)
    if not isinstance(node, VElement):
        return ""

    parts = ["<", node.tag_name]
    for key in sorted(node.attributes):
        parts.append(f' {key}="{_escape_text(node.attributes[key])}"')
    if node.tag_name in VOID_ELEMENTS and not node.children:
        parts.append("/>")
        return "".join(parts)
    parts.append(">")
    for child in node.children:
        parts.append(serialize_to_html(child))
    parts.append(f"</{node.tag_name}>")
    return "".join(parts)


def serialize_document_to_html(doc: VDocument) -> str:
    """parser.go:204-213."""
    if doc is None or doc.document_element is None:
        return ""
    return "<!DOCTYPE html>\n" + serialize_to_html(doc.document_element)


def serialize_to_writer(node, writer) -> None:
    """Write a node's HTML to a text file-like object (the io.Writer
    sink, parser.go:216-219)."""
    writer.write(serialize_to_html(node))


def serialize_document_to_writer(doc: VDocument, writer) -> None:
    """Write a document's HTML to a text file-like object
    (parser.go:222-225)."""
    writer.write(serialize_document_to_html(doc))
