"""Formatting tests ported from /root/reference/format_test.go."""

from go_readability_spark.readability import (
    VElement,
    VText,
    count_nodes,
    escape_html,
    extract_text_content,
    format_document,
    stringify,
    to_html,
)


def el(tag, attrs=None, children=()):
    e = VElement(tag)
    if attrs:
        e.attributes.update(attrs)
    for c in children:
        e.append_child(c)
    return e


def test_to_html_basic():
    p = el("p", children=[VText("Hello")])
    assert to_html(p) == "<p>Hello</p>"


def test_to_html_span_unwrapped():
    p = el("p", children=[
        VText("a "),
        el("span", {"class": "x"}, [VText("inner")]),
        VText(" b"),
    ])
    assert to_html(p) == "<p>a inner b</p>"


def test_to_html_class_stripped():
    d = el("div", {"class": "content", "id": "main"}, [VText("t")])
    assert to_html(d) == '<div id="main">t</div>'


def test_to_html_self_closing():
    assert to_html(el("img", {"src": "x.png"})) == '<img src="x.png"/>'
    assert to_html(el("br")) == "<br/>"


def test_to_html_escapes_text():
    p = el("p", children=[VText("a < b & c > d \"q\" 'a'")])
    assert to_html(p) == "<p>a &lt; b &amp; c &gt; d &quot;q&quot; &#039;a&#039;</p>"


def test_escape_html_nbsp():
    assert escape_html("a b") == "a&nbsp;b"
    assert escape_html("&<>") == "&amp;&lt;&gt;"


def test_stringify_blocks_and_breaks():
    div = el("div", children=[
        el("p", children=[VText("First paragraph.")]),
        el("p", children=[VText("Second paragraph.")]),
    ])
    s = stringify(div)
    assert "First paragraph." in s
    assert "Second paragraph." in s
    # block boundaries produce single newlines, merged
    assert "\n\n" not in s


def test_stringify_br_hr():
    assert stringify(el("br")) == "\n"
    assert stringify(el("hr")) == "\n----------\n"


def test_stringify_inline_spacing():
    p = el("p", children=[
        VText("Hello"),
        el("b", children=[VText("bold")]),
        VText("world"),
    ])
    assert stringify(p).strip() == "Hello bold world"


def test_format_document():
    assert format_document("\n\n\na\n\n\nb\n\n\n") == "a\nb"
    assert format_document("  x  ") == "x"


def test_extract_text_content_no_spaces():
    """format.go:272-286 — raw concatenation, unlike get_inner_text."""
    div = el("div", children=[
        el("p", children=[VText("a")]),
        el("p", children=[VText("b")]),
    ])
    assert extract_text_content(div) == "ab"


def test_count_nodes():
    # div(1) + p(1) + text(1) + p(1) + text(1) = 5
    div = el("div", children=[
        el("p", children=[VText("a")]),
        el("p", children=[VText("b")]),
    ])
    assert count_nodes(div) == 5
    assert count_nodes(None) == 0
