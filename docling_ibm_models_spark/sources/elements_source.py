"""Deterministic synthetic page-element layouts (FIXTURES.md §5).

Generates per-page element sets in 1-2 column layouts with known
ground-truth reading order (``cid`` = row order), shuffled for input.
Used by the reading-order tests (Spearman protocol mirroring
/root/reference/tests/test_reading_order.py) and by the Spark
reading-order stage demo.
"""

from __future__ import annotations

import random

from docling_ibm_models_spark.operators.reading_order import (
    CAPTION,
    FOOTNOTE,
    PAGE_FOOTER,
    PAGE_HEADER,
    PICTURE,
    TABLE,
    TEXT,
    Element,
)

PAGE_W, PAGE_H = 612.0, 792.0


def synth_page_elements(doc_seed: int, page_no: int = 0) -> list[Element]:
    """One page: bottom-left origin, ground-truth order = cid order.
    Returns elements in ground-truth order (caller shuffles)."""
    rng = random.Random(f"elems-{doc_seed}-{page_no}")
    two_col = rng.random() < 0.5
    elems: list[Element] = []
    cid = 0

    def add(label, l, r, t, b, text="x y z"):  # noqa: E741
        nonlocal cid
        elems.append(
            Element(
                cid=cid, text=text, label=label, l=l, r=r, t=t, b=b,
                page_no=page_no, page_width=PAGE_W, page_height=PAGE_H,
            )
        )
        cid += 1

    # optional page header (always first in ground truth)
    if rng.random() < 0.4:
        add(PAGE_HEADER, 50, 560, 780, 765)

    # optional full-width title
    title_t = 750.0
    if rng.random() < 0.6:
        add(TEXT, 60, 540, title_t, title_t - 30)
        title_t -= 45

    def fill_column(l, r, t_start, b_limit):  # noqa: E741
        nonlocal cid
        t = t_start
        while t - 25 > b_limit and len(elems) < 40:
            h = rng.uniform(20, 55)
            if t - h < b_limit:
                break
            kind = rng.random()
            if kind < 0.12:
                # picture + caption after
                add(PICTURE, l, r, t, t - h)
                ch = 14
                if t - h - 4 - ch > b_limit:
                    add(CAPTION, l + 10, r - 10, t - h - 4, t - h - 4 - ch)
                    t = t - h - 4 - ch - rng.uniform(6, 14)
                else:
                    t = t - h - rng.uniform(6, 14)
            elif kind < 0.2:
                # table + footnote after
                add(TABLE, l, r, t, t - h)
                fh = 12
                if t - h - 4 - fh > b_limit:
                    add(FOOTNOTE, l + 10, r - 10, t - h - 4, t - h - 4 - fh)
                    t = t - h - 4 - fh - rng.uniform(6, 14)
                else:
                    t = t - h - rng.uniform(6, 14)
            else:
                add(TEXT, l, r, t, t - h)
                t = t - h - rng.uniform(6, 14)

    if two_col:
        fill_column(50, 290, title_t, 60)
        fill_column(322, 560, title_t, 60)
    else:
        fill_column(50, 560, title_t, 60)

    if rng.random() < 0.4:
        add(PAGE_FOOTER, 50, 560, 40, 25)
    return elems


def shuffled(elements: list[Element], seed: int) -> list[Element]:
    out = list(elements)
    random.Random(seed).shuffle(out)
    return out
