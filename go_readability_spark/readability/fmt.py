"""Output formatting: clean HTML, plain text, node counting.

Ports /root/reference/format.go:76-315.
"""

from __future__ import annotations

from .regexps import BLOCK_ELEMENTS, SELF_CLOSING_TAGS
from .vdom import VElement, VText

__all__ = [
    "to_html",
    "escape_html",
    "stringify",
    "format_document",
    "extract_text_content",
    "count_nodes",
]


def escape_html(s: str) -> str:
    """format.go:149-157 (&amp; first, then nbsp, lt, gt, quot, apos)."""
    result = s.replace("&", "&amp;")
    result = result.replace("\u00a0", "&nbsp;")
    result = result.replace("<", "&lt;")
    result = result.replace(">", "&gt;")
    result = result.replace('"', "&quot;")
    result = result.replace("'", "&#039;")
    return result


def to_html(element: VElement | None) -> str:
    """HTML omitting <span> wrappers and class attributes (format.go:76-139).

    NOTE: the reference iterates Go's randomized attribute map here
    (format.go:98) so its output attribute order is nondeterministic
    run-to-run (SURVEY.md §1.2(7)); we iterate insertion order, which is
    deterministic and matches document order.
    """
    if element is None:
        return ""
    tag_name = element.tag_name

    if tag_name == "span":
        parts = []
        for child in element.children:
            if isinstance(child, VText):
                parts.append(escape_html(child.text_content))
            elif isinstance(child, VElement):
                parts.append(to_html(child))
        return "".join(parts)

    attrs = " ".join(
        f'{key}="{escape_html(value)}"'
        for key, value in element.attributes.items()
        if key != "class"
    )

    if tag_name in SELF_CLOSING_TAGS and not element.children:
        if attrs:
            return f"<{tag_name} {attrs}/>"
        return f"<{tag_name}/>"

    parts = [f"<{tag_name} {attrs}>" if attrs else f"<{tag_name}>"]
    for child in element.children:
        if isinstance(child, VText):
            parts.append(escape_html(child.text_content))
        elif isinstance(child, VElement):
            parts.append(to_html(child))
    parts.append(f"</{tag_name}>")
    return "".join(parts)


def stringify(element: VElement | None) -> str:
    """Readable plain text with block-level newlines (format.go:169-236)."""
    if element is None:
        return ""
    tag_name = element.tag_name
    if tag_name == "br":
        return "\n"
    if tag_name == "hr":
        return "\n----------\n"

    is_block = tag_name in BLOCK_ELEMENTS
    parts: list[str] = []
    if is_block:
        parts.append("\n")

    for child in element.children:
        if isinstance(child, VText):
            trimmed = child.text_content.strip()
            if trimmed != "":
                parts.append(trimmed)
                parts.append(" ")
        elif isinstance(child, VElement):
            child_result = stringify(child)
            parts.append(child_result)
            if (
                len(child_result) > 0
                and not child_result.endswith(" ")
                and not child_result.endswith("\n")
            ):
                parts.append(" ")

    result = "".join(parts)
    if result.endswith(" "):
        result = result[:-1]
    if is_block:
        result += "\n"
    while "\n\n" in result:
        result = result.replace("\n\n", "\n")
    return result


def format_document(text: str) -> str:
    """Collapse blank lines and trim (format.go:247-262)."""
    result = text
    while "\n\n" in result:
        result = result.replace("\n\n", "\n")
    return result.lstrip("\n").rstrip("\n").strip()


def extract_text_content(element: VElement | None) -> str:
    """Raw concatenated text, NO spaces inserted — differs from
    get_inner_text (format.go:272-286)."""
    if element is None:
        return ""
    parts: list[str] = []

    def walk(el: VElement) -> None:
        for child in el.children:
            if isinstance(child, VText):
                parts.append(child.text_content)
            elif isinstance(child, VElement):
                walk(child)

    walk(element)
    return "".join(parts)


def count_nodes(element: VElement | None) -> int:
    """Element + text node count including self (format.go:296-315).

    Iterative (same stack pattern as the dom walkers): the recursive
    form was one Python frame per element on multi-thousand-node giant
    documents, and counting needs no ordering at all."""
    if element is None:
        return 0
    count = 0
    stack = [element]
    pop = stack.pop
    extend = stack.extend
    while stack:
        el = pop()
        count += 1
        # isinstance, not exact-class: the recursive form descended into
        # VElement subclasses too, and count_nodes is a facade export
        if isinstance(el, VElement):
            cs = el.children
            if cs:
                extend(cs)
    return count
