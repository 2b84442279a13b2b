"""ARIA tree tests, ported from /root/reference/aria_test.go:10-212 plus
compression/build coverage on parsed documents."""

from __future__ import annotations

import pytest

from go_readability_spark.readability.aria import (
    AriaNode,
    aria_tree_to_string,
    build_aria_node,
    build_aria_tree,
    compress_aria_tree,
    count_aria_nodes,
    get_accessible_name,
    get_aria_role,
)
from go_readability_spark.readability.parser import parse_html
from go_readability_spark.readability.vdom import VElement, VText


def el(tag: str, attrs: dict | None = None, children: list | None = None) -> VElement:
    e = VElement(tag)
    e.attributes.update(attrs or {})
    for c in children or []:
        e.append_child(c)
    return e


class TestGetAriaRole:
    """aria_test.go:10-76."""

    @pytest.mark.parametrize(
        "tag,attrs,expected",
        [
            ("div", {"role": "button"}, "button"),
            ("a", {"href": "https://example.com"}, "link"),
            ("a", {}, "generic"),
            ("h1", {}, "heading"),
            ("input", {"type": "checkbox"}, "checkbox"),
            ("input", {}, "textbox"),
            ("input", {"type": "radio"}, "radio"),
            ("input", {"type": "search"}, "searchbox"),
            ("nav", {}, "navigation"),
            ("section", {}, "region"),
            ("DIV", {"role": "MAIN"}, "main"),  # explicit role lowercased
        ],
    )
    def test_roles(self, tag, attrs, expected):
        assert get_aria_role(el(tag, attrs)) == expected


class TestGetAccessibleName:
    """aria_test.go:78-140."""

    def test_aria_label(self):
        assert get_accessible_name(el("div", {"aria-label": "Test Label"})) == "Test Label"

    def test_alt_for_img(self):
        assert (
            get_accessible_name(el("img", {"alt": "Image Description"}))
            == "Image Description"
        )

    def test_title(self):
        assert get_accessible_name(el("div", {"title": "Title Text"})) == "Title Text"

    def test_text_content_for_heading(self):
        assert (
            get_accessible_name(el("h1", {}, [VText("Heading Text")]))
            == "Heading Text"
        )

    def test_text_content_for_paragraph(self):
        assert (
            get_accessible_name(el("p", {}, [VText("Paragraph Text")]))
            == "Paragraph Text"
        )

    def test_truncation_at_50_bytes(self):
        """47-byte prefix + '...' (aria.go:220-223)."""
        long = "x" * 60
        got = get_accessible_name(el("h1", {}, [VText(long)]))
        assert got == "x" * 47 + "..."
        assert len(got.encode()) == 50

    def test_long_paragraph_not_named(self):
        assert get_accessible_name(el("p", {}, [VText("y" * 150)])) == ""


class TestBuildAriaNode:
    """aria_test.go:142-176."""

    def test_heading(self):
        element = el("h1", {"class": "title"}, [VText("Test Heading")])
        node = build_aria_node(element)
        assert node.type == "heading"
        assert node.name == "Test Heading"
        assert node.level == 1
        assert node.original_element is element

    def test_checkbox_state(self):
        node = build_aria_node(el("input", {"type": "checkbox", "checked": ""}))
        assert node.type == "checkbox" and node.checked is True
        node = build_aria_node(el("input", {"type": "checkbox"}))
        assert node.checked is False

    def test_states_and_values(self):
        node = build_aria_node(
            el(
                "div",
                {
                    "role": "slider",
                    "aria-expanded": "true",
                    "aria-disabled": "true",
                    "aria-required": "true",
                    "aria-valuemin": "0",
                    "aria-valuemax": "10",
                    "aria-valuetext": "five",
                },
            )
        )
        assert node.type == "slider"
        assert node.expanded is True
        assert node.disabled is True
        assert node.required is True
        assert node.value_min == 0.0 and node.value_max == 10.0
        assert node.value_text == "five"

    def test_invisible_children_skipped(self):
        parent = el(
            "div",
            {"role": "main"},
            [
                el("h1", {}, [VText("Visible")]),
                el("h2", {"style": "display: none"}, [VText("Hidden")]),
            ],
        )
        node = build_aria_node(parent)
        assert [c.name for c in node.children] == ["Visible"]


class TestCountAriaNodes:
    """aria_test.go:178-212."""

    def test_count(self):
        root = AriaNode(
            type="main",
            name="Main Content",
            children=[
                AriaNode(type="heading", name="Title"),
                AriaNode(
                    type="text",
                    name="Paragraph",
                    children=[AriaNode(type="link", name="Link")],
                ),
            ],
        )
        assert count_aria_nodes(root) == 4
        assert count_aria_nodes(None) == 0


class TestCompressAndBuildTree:
    def test_compress_drops_empty_text(self):
        node = AriaNode(type="text", name="   ")
        out = compress_aria_tree(node)
        assert out.type == "generic"

    def test_compress_merges_single_generic_chain(self):
        node = AriaNode(
            type="generic",
            children=[AriaNode(type="heading", name="T", level=2)],
        )
        out = compress_aria_tree(node)
        assert out.type == "heading" and out.name == "T"

    def test_build_tree_promotes_significant_root(self):
        doc = parse_html(
            "<html><body><main><h1>Title</h1><p>Body text here.</p></main>"
            "</body></html>",
            "",
        )
        tree = build_aria_tree(doc)
        assert tree.root is not None
        assert tree.root.type == "main"
        assert tree.node_count == count_aria_nodes(tree.root)

    def test_tree_to_string(self):
        doc = parse_html(
            "<html><body><main><h1>Title</h1></main></body></html>", ""
        )
        s = aria_tree_to_string(build_aria_tree(doc))
        assert "main" in s
        assert "heading: Title" in s
        assert "level: 1" in s

    def test_tree_deterministic(self):
        html = (
            "<html><body><div><article><h2>A</h2><p>aaa</p></article>"
            "<article><h2>B</h2><p>bbb</p></article>"
            "<ul><li>x</li><li>y</li></ul></div></body></html>"
        )
        a = aria_tree_to_string(build_aria_tree(parse_html(html, "")))
        b = aria_tree_to_string(build_aria_tree(parse_html(html, "")))
        assert a == b

    def test_to_string_none(self):
        assert aria_tree_to_string(None) == ""


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
