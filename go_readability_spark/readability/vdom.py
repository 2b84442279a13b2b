"""Virtual DOM node types.

Reimplements the reference's in-memory tree model
(/root/reference/internal/dom/vnode.go:15-139) as slotted Python classes.
These objects exist only inside executor-side Python UDFs; they are never
materialized as Spark rows.
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

__all__ = ["VText", "VElement", "VDocument", "VNode", "is_element", "is_text"]


class VText:
    """Text node (vnode.go:66-69)."""

    __slots__ = ("text_content", "parent", "readability")

    def __init__(self, text_content: str = "") -> None:
        self.text_content = text_content
        self.parent: Optional[VElement] = None
        self.readability: Optional[float] = None  # ContentScore; unused on text

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"VText({self.text_content!r})"


class VElement:
    """Element node (vnode.go:82-87).

    ``readability`` holds the mutable ContentScore (vnode.go:15-17); ``None``
    means the node has not been initialized as a candidate.
    """

    __slots__ = ("tag_name", "attributes", "children", "parent", "readability")

    def __init__(self, tag_name: str) -> None:
        self.tag_name = tag_name.lower()
        self.attributes: dict[str, str] = {}
        self.children: list[VNode] = []
        self.parent: Optional[VElement] = None
        self.readability: Optional[float] = None

    # -- attribute helpers (vnode.go:105-133) --
    @property
    def id(self) -> str:
        return self.attributes.get("id", "")

    @property
    def class_name(self) -> str:
        return self.attributes.get("class", "")

    def get_attribute(self, name: str) -> str:
        return self.attributes.get(name, "")

    def has_attribute(self, name: str) -> bool:
        return name in self.attributes

    def set_attribute(self, name: str, value: str) -> None:
        self.attributes[name] = value

    def append_child(self, child: "VNode") -> None:
        child.parent = self
        self.children.append(child)

    def iter_elements(self) -> Iterator["VElement"]:
        """Pre-order iteration over self + descendant elements."""
        stack = [self]
        while stack:
            el = stack.pop()
            yield el
            stack.extend(
                c for c in reversed(el.children) if isinstance(c, VElement)
            )

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"VElement(<{self.tag_name}> children={len(self.children)})"


VNode = Union[VText, VElement]


class VDocument:
    """Parsed document (vnode.go:134-139)."""

    __slots__ = ("document_element", "body", "base_uri", "document_uri")

    def __init__(self, document_element: VElement, body: VElement) -> None:
        self.document_element = document_element
        self.body = body
        self.base_uri = ""
        self.document_uri = ""


def is_element(node: object) -> bool:
    return isinstance(node, VElement)


def is_text(node: object) -> bool:
    return isinstance(node, VText)


def create_element(tag_name: str) -> VElement:
    """dom_utils.go:79-81 — tag lowercased by VElement ctor."""
    return VElement(tag_name)


def create_text_node(content: str) -> VText:
    """dom_utils.go:84-86."""
    return VText(content)
