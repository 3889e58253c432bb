"""Minimal stand-in for docling_core (not installed) so the reference's
reading_order_rb.py can be imported for parity testing.

Geometry predicate semantics mirror our Element implementation
(operators/reading_order.py, derived from the public docling-core
BoundingBox API). The parity test therefore validates the reference's
300-line graph algorithm (DAG build, dilation, head sort, DFS, caption
passes) against ours under a shared geometry vocabulary.
"""

from __future__ import annotations

import sys
import types

from pydantic import BaseModel


class Size(BaseModel):
    width: float = 0.0
    height: float = 0.0


class BoundingBox(BaseModel):
    l: float  # noqa: E741
    t: float
    r: float
    b: float

    # bottom-left origin semantics (elements are generated that way)
    def to_bottom_left_origin(self, page_height):
        return self

    def overlaps_horizontally(self, other) -> bool:
        return not (self.r <= other.l or other.r <= self.l)

    def overlaps_vertically(self, other) -> bool:
        return not (self.t <= other.b or other.t <= self.b)

    def overlaps(self, other) -> bool:
        return self.overlaps_horizontally(other) and self.overlaps_vertically(other)

    def overlaps_vertically_with_iou(self, other, iou: float) -> bool:
        if not self.overlaps_vertically(other):
            return False
        union = max(self.t, other.t) - min(self.b, other.b)
        inter = min(self.t, other.t) - max(self.b, other.b)
        return union > 0 and inter / union > iou

    def is_strictly_above(self, other, eps: float = 1.0e-3) -> bool:
        return self.b + eps > other.t

    def is_strictly_left_of(self, other, eps: float = 1.0e-3) -> bool:
        return self.r + eps < other.l

    def is_horizontally_connected(self, elem_i, elem_j) -> bool:
        min_ij = min(elem_i.b, elem_j.t)
        max_ij = max(elem_i.b, elem_j.t)
        return self.b < max_ij and self.t > min_ij


class RefItem(BaseModel):
    cref: str = "#"


import enum


class DocItemLabel(str, enum.Enum):
    CAPTION = "caption"
    FOOTNOTE = "footnote"
    FORMULA = "formula"
    LIST_ITEM = "list_item"
    PAGE_FOOTER = "page_footer"
    PAGE_HEADER = "page_header"
    PICTURE = "picture"
    SECTION_HEADER = "section_header"
    TABLE = "table"
    TEXT = "text"
    TITLE = "title"
    DOCUMENT_INDEX = "document_index"
    CODE = "code"
    CHECKBOX_SELECTED = "checkbox_selected"
    CHECKBOX_UNSELECTED = "checkbox_unselected"
    FORM = "form"
    KEY_VALUE_REGION = "key_value_region"
    PARAGRAPH = "paragraph"


def install():
    if "docling_core" in sys.modules:
        return
    root = types.ModuleType("docling_core")
    t = types.ModuleType("docling_core.types")
    doc = types.ModuleType("docling_core.types.doc")
    base = types.ModuleType("docling_core.types.doc.base")
    document = types.ModuleType("docling_core.types.doc.document")
    labels = types.ModuleType("docling_core.types.doc.labels")
    base.BoundingBox = BoundingBox
    base.Size = Size
    document.RefItem = RefItem
    labels.DocItemLabel = DocItemLabel
    for m in (root, t, doc, base, document, labels):
        sys.modules[m.__name__] = m
    root.types = t
    t.doc = doc
    doc.base = base
    doc.document = document
    doc.labels = labels
