"""Matching post-processor — from scratch, behavior-parity with the
reference's 9-step pipeline
(/root/reference/docling_ibm_models/tableformer/data_management/matching_post_processor.py:1166-1416,
algorithm comment block :1186-1231). Verified against the imported reference
on randomized tables in tests/test_postprocessor_parity.py; no code copied.

This is the hardest parity surface of the port (SURVEY.md §7): the steps
mutate shared state in a fixed order and several behaviors are
deliberate-looking quirks that MUST be preserved for byte-identical output:

* match dicts switch to **string keys** via a JSON round-trip after every
  re-match (reference :382-384 — done "to have string keys", kept for
  determinism with their C++ impl);
* step 1 appends a good cell once per matching (pdf, match) occurrence →
  duplicates are possible and flow through the later steps;
* cells with ``cell_class <= 1`` can never be "good" (the sticky
  ``allow_class`` flag, reference :93-103);
* ``_do_final_asignment`` keeps the FIRST maximal iopdf on ties
  (Python ``max`` semantics);
* the de-dup step's ``new_tab_columns`` subtracts the raw length of the
  eliminate-list (duplicates included);
* ``_align_table_cells_to_pdf``'s final dedupe keeps the LAST duplicate;
* orphan depths use Python ``round`` (banker's rounding);
* orphan pdf ids are sorted ascending before assignment (reference
  :1064-1077, "to produce the same results with the c++ implementation");
* the 300-cell performance guards are semantics (outputs differ), not just
  perf (SURVEY.md §4).

Everything here is per-table pure Python, invoked from Arrow-batched UDFs;
the *relational* skeletons of the aggregation steps are exposed as oracle
queries (plans/queries.py: col_median_snap, window_top1_match,
band_orphan_join, dense_rank_compaction).
"""

from __future__ import annotations

import json
import math
import statistics

from docling_ibm_models_spark.operators.cell_matcher import match_iopdf

_ALIGNMENTS = ("left", "middle", "right")


def table_dimensions(table_cells):
    """Step 0 — (columns, rows, max_cell_id); minimums of 1/1/0."""
    cols = rows = 1
    max_id = 0
    for c in table_cells:
        cols = max(cols, c["column_id"])
        rows = max(rows, c["row_id"])
        max_id = max(max_id, c["cell_id"])
    return cols + 1, rows + 1, max_id


def split_good_bad_in_column(table_cells, column, matches):
    """Step 1 — good (matched, class>1) vs bad cells of one column.

    Faithful to the reference's loop shape: a cell is appended to the good
    list once per (pdf_cell, match) hit, and a class<=1 cell is permanently
    barred from being good the moment the flag trips."""
    good, bad = [], []
    for cell in table_cells:
        if cell["column_id"] != column:
            continue
        cid = cell["cell_id"]
        unmatched = True
        class_ok = True
        for pdf_id in matches:
            if "cell_class" in cell and cell["cell_class"] <= 1:
                class_ok = False
            if class_ok:
                for m in matches[pdf_id]:
                    if m["table_cell_id"] == cid:
                        good.append(cell)
                        unmatched = False
        if unmatched:
            bad.append(cell)
    return good, bad


def column_alignment(cells):
    """Step 2 — argmin of the min-max spread of left/middle/right x."""
    if not cells:
        return "left"
    lefts = [c["bbox"][0] for c in cells]
    rights = [c["bbox"][2] for c in cells]
    mids = [(left + right) / 2 for left, right in zip(lefts, rights)]
    deltas = [
        max(lefts) - min(lefts),
        max(mids) - min(mids),
        max(rights) - min(rights),
    ]
    return _ALIGNMENTS[deltas.index(min(deltas))]


def column_medians(cells, alignment):
    """Step 3 — exact medians (statistics.median: mean of middle pair) of
    the alignment-x, y, width, height over non-span class>1 cells."""
    xs, ys, ws, hs = [], [], [], []
    for c in cells:
        if "rowspan_val" in c or "colspan_val" in c or c["cell_class"] <= 1:
            continue
        x1, y1, x2, y2 = c["bbox"]
        x = x1
        if alignment == "middle":
            x = (x2 + x1) / 2
        if alignment == "right":
            x = x2
        xs.append(x)
        ys.append(y1)
        ws.append(x2 - x1)
        hs.append(y2 - y1)
    return (
        statistics.median(xs) if xs else 0,
        statistics.median(ys) if ys else 0,
        statistics.median(ws) if ws else 1,
        statistics.median(hs) if hs else 1,
    )


def snap_cells_to_column(cells, median_x, rescale, median_w, median_h, alignment):
    """Step 4 — move (optionally resize) cells to the column median."""
    out = []
    for c in cells:
        x1, y1, x2, y2 = c["bbox"]
        w = x2 - x1
        nx1, ny1, nx2, ny2 = median_x, y1, median_x + w, y2
        if rescale:
            nx2 = median_x + median_w
            ny2 = y1 + median_h
        if alignment == "middle":
            nx1 = median_x - w / 2
            nx2 = nx1 + w
            if rescale:
                nx1 = median_x - median_w / 2
                nx2 = median_x + median_w / 2
        if alignment == "right":
            nx1 = median_x - w
            nx2 = median_x
            if rescale:
                nx1 = median_x - median_w
        nc = {
            "bbox": [nx1, ny1, nx2, ny2],
            "cell_id": c["cell_id"],
            "column_id": c["column_id"],
            "label": c["label"],
            "row_id": c["row_id"],
            "cell_class": c["cell_class"],
        }
        if "rowspan_val" in c:
            nc["rowspan_val"] = c["rowspan_val"]
        if "colspan_val" in c:
            nc["colspan_val"] = c["colspan_val"]
        out.append(nc)
    return out


def rematch_string_keyed(table_cells, pdf_cells):
    """Step 5 — fresh iopdf match, then the JSON round-trip that stringifies
    keys (reference :376-385) — preserved for byte parity downstream."""
    matches, _n = match_iopdf(table_cells, pdf_cells)
    return json.loads(json.dumps(matches))


def deduplicate_columns(tab_columns, table_cells, iou_matches, ioc_matches):
    """Step 7 — score each column (sum of iou/iopdf), collect its pdf-cell
    id sets, and drop the lower-scoring of any adjacent pair sharing >60%
    of pdf cells. Matches are filtered; column ids are NOT renumbered."""
    pdf_ids_per_col = []
    score_per_col = []
    for col in range(tab_columns):
        col_cell_ids = [c["cell_id"] for c in table_cells if c["column_id"] == col]
        # two accumulators summed at the end — same float-op order as the
        # reference (:614-648), so tie comparisons round identically
        score_iou = 0
        score_ioc = 0
        ids_iou, ids_ioc = [], []
        for key, mlist in iou_matches.items():
            for m in mlist:
                if m["table_cell_id"] in col_cell_ids:
                    if "iou" in m:
                        score_iou += m["iou"]
                    elif "iopdf" in m:
                        score_iou += m["iopdf"]
                    ids_iou.append(key)
        for key, mlist in ioc_matches.items():
            for m in mlist:
                if m["table_cell_id"] in col_cell_ids:
                    score_ioc += m["iopdf"]
                    ids_ioc.append(key)
        ids = ids_iou + list(set(ids_ioc) - set(ids_iou))
        pdf_ids_per_col.append(ids)
        score_per_col.append(score_iou + score_ioc)

    pdf_ids_per_col = [list({int(x) for x in ids}) for ids in pdf_ids_per_col]
    eliminate = []
    for cl in range(tab_columns - 1):
        col_a, col_b = pdf_ids_per_col[cl], pdf_ids_per_col[cl + 1]
        shared = set(col_a).intersection(col_b)
        frac = len(shared) / len(col_a) if col_a else 0
        if frac > 0.6:
            if score_per_col[cl] >= score_per_col[cl + 1]:
                eliminate.append(cl + 1)
            else:
                eliminate.append(cl)

    removed_ids = []
    new_cells = []
    for c in table_cells:
        if c["column_id"] in eliminate:
            # reference appends once per eliminate-list hit; duplicates in
            # `eliminate` therefore duplicate the removed id — harmless for
            # the membership test below, kept for parity of arithmetic
            for col_del in eliminate:
                if c["column_id"] == col_del:
                    removed_ids.append(c["cell_id"])
        else:
            new_cells.append(c)
    new_matches = {}
    for pdf_id, mlist in ioc_matches.items():
        kept = [m for m in mlist if m["table_cell_id"] not in removed_ids]
        if kept:
            new_matches[pdf_id] = kept
    return new_cells, new_matches, tab_columns - len(eliminate)


def final_assignment(ioc_matches):
    """Step 8 — one table cell per pdf cell: keep the max-iopdf match
    (first maximum on ties, like Python max)."""
    return {
        pdf_id: [max(mlist, key=lambda m: m["iopdf"])]
        for pdf_id, mlist in ioc_matches.items()
    }


def align_cells_to_pdf(table_cells, pdf_cells, matches):
    """Step 8.a — rewrite each matched table cell's bbox to its pdf cell's
    bbox, then envelope duplicates (min/min/max/max) and dedupe keeping the
    last occurrence of each identical dict (reference :470-577)."""
    new_cells = []
    # positional index: cell_id → cells in list order (exact equivalent of
    # the reference's per-match full scan; single-id fast path below)
    by_id: dict[int, list[dict]] = {}
    for c in table_cells:
        by_id.setdefault(c["cell_id"], []).append(c)
    pdf_by_id = {p["id"]: p["bbox"] for p in pdf_cells}
    for pdf_id, mlist in matches.items():
        wanted = []
        for m in mlist:
            tid = int(m["table_cell_id"])
            if tid not in wanted:
                wanted.append(tid)
        pdf_bbox = pdf_by_id.get(int(pdf_id), [])
        if len(wanted) == 1:
            selected = by_id.get(wanted[0], [])
        else:
            selected = [c for c in table_cells if c["cell_id"] in wanted]
        for c in selected:
            nc = {
                "bbox": list(pdf_bbox),
                "cell_id": c["cell_id"],
                "column_id": c["column_id"],
                "label": c["label"],
                "row_id": c["row_id"],
                "cell_class": c.get("cell_class", "2"),
            }
            if "colspan_val" in c:
                nc["colspan_val"] = c["colspan_val"]
            if "rowspan_val" in c:
                nc["rowspan_val"] = c["rowspan_val"]
            new_cells.append(nc)

    # envelope duplicates: one grouped pass instead of the reference's
    # O(n²) rescans — identical result (same min/min/max/max over the same
    # per-cell_id boxes; untouched when a cell_id occurs once)
    env: dict[int, list[float]] = {}
    counts: dict[int, int] = {}
    for c in new_cells:
        cid = c["cell_id"]
        b = c["bbox"]
        counts[cid] = counts.get(cid, 0) + 1
        e = env.get(cid)
        if e is None:
            env[cid] = [b[0], b[1], b[2], b[3]]
        else:
            e[0] = min(e[0], b[0])
            e[1] = min(e[1], b[1])
            e[2] = max(e[2], b[2])
            e[3] = max(e[3], b[3])
    for c in new_cells:
        if counts[c["cell_id"]] > 1:
            c["bbox"] = list(env[c["cell_id"]])

    # dedupe keeping the LAST occurrence of each identical dict (reference
    # :572-576). Post-envelope, all entries sharing a cell_id are identical
    # dicts (same source cell, same rewritten bbox), so last-per-cell_id is
    # an exact O(n) equivalent of the reference's quadratic membership scan.
    seen: set[int] = set()
    out_rev = []
    for c in reversed(new_cells):
        if c["cell_id"] not in seen:
            seen.add(c["cell_id"])
            out_rev.append(c)
    return out_rev[::-1]


def merge_bboxes(b1, b2):
    return [min(b1[0], b2[0]), min(b1[1], b2[1]), max(b1[2], b2[2]), max(b1[3], b2[3])]


def _collect_orphan_bands(
    n_bands, table_cells, pdf_cells, matches, axis
):
    """Shared core of steps 9.a/9.b: band per row (axis='row') or column
    (axis='col'), assign each unmatched pdf cell to the deepest-overlap band
    with duplicate resolution by smaller rounded centroid distance."""
    if axis == "row":
        band_field, span_field, lo_i, hi_i = "row_id", "rowspan_val", 1, 3
    else:
        band_field, span_field, lo_i, hi_i = "column_id", "colspan_val", 0, 2
    bands, depths, bboxes = [], [], []
    used_ids, used_band = [], []
    for band in range(n_bands):
        los, his = [], []
        for c in table_cells:
            if c[band_field] == band and span_field not in c and c["cell_class"] > 1:
                los.append(c["bbox"][lo_i])
                his.append(c["bbox"][hi_i])
        lo = min(los) if los else -1
        hi = max(his) if his else -1
        in_band, in_depth, in_bbox = [], [], []
        for p in pdf_cells:
            sid = str(p["id"])
            if sid in matches:
                continue
            plo, phi = p["bbox"][lo_i], p["bbox"][hi_i]
            centroid_band = (hi + lo) / 2
            centroid_cell = (phi + plo) / 2
            inside = (
                (lo <= plo <= hi)
                or (lo <= phi <= hi)
                or (plo <= lo and phi >= hi if axis == "row" else plo < lo and phi > hi)
            )
            if not inside:
                continue
            depth = abs(centroid_band - centroid_cell)
            if sid not in used_ids:
                used_ids.append(sid)
                used_band.append(band)
                in_band.append(sid)
                in_depth.append(round(depth))
                in_bbox.append(p["bbox"])
            else:
                ui = used_ids.index(sid)
                prev_band = used_band[ui]
                if len(bands) > prev_band:
                    prev_idx = bands[prev_band].index(sid)
                    if round(depth) < depths[prev_band][prev_idx]:
                        bands[prev_band].pop(prev_idx)
                        depths[prev_band].pop(prev_idx)
                        bboxes[prev_band].pop(prev_idx)
                        used_ids.pop(ui)
                        used_band.pop(ui)
                        used_ids.append(sid)
                        used_band.append(band)
                        in_band.append(sid)
                        in_depth.append(round(depth))
                        in_bbox.append(p["bbox"])
        bands.append(in_band)
        depths.append(in_depth)
        bboxes.append(in_bbox)
    return bands, depths, bboxes, used_ids, used_band


def pick_orphan_cells(tab_rows, tab_cols, max_cell_id, table_cells, pdf_cells, matches):
    """Step 9 — band-match unmatched pdf cells into (row, column) slots;
    merge into an existing grid cell or mint a new one; add a 'post'
    match. Mutates `matches`/`table_cells` in place like the reference."""
    rows, row_depths, _row_bboxes, _u, _ub = _collect_orphan_bands(
        tab_rows, table_cells, pdf_cells, matches, "row"
    )
    cols, col_depths, col_bboxes, used_col_ids, used_col_band = _collect_orphan_bands(
        tab_cols, table_cells, pdf_cells, matches, "col"
    )

    # deterministic ascending order over all row-banded orphan ids
    # (reference :1064-1077)
    row_of_pdf: dict[int, int] = {}
    orphan_ids: list[int] = []
    for row_id, sids in enumerate(rows):
        orphan_ids.extend(int(s) for s in sids)
        for s in sids:
            row_of_pdf[int(s)] = row_id
    orphan_ids.sort()

    for pdf_int in orphan_ids:
        sid = str(pdf_int)
        if sid not in used_col_ids:
            continue
        new_row = row_of_pdf[pdf_int]
        new_col = used_col_band[used_col_ids.index(sid)]
        di = cols[new_col].index(sid)
        confidence = col_depths[new_col][di]
        pdf_bbox = col_bboxes[new_col][di]

        slot = [
            c
            for c in table_cells
            if c["row_id"] == new_row and c["column_id"] == new_col
        ]
        if slot:
            tid = slot[0]["cell_id"]
            for c in table_cells:
                if c["cell_id"] == tid:
                    c["bbox"] = merge_bboxes(c["bbox"], pdf_bbox)
        else:
            max_cell_id += 1
            tid = max_cell_id
            table_cells.append(
                {
                    "bbox": pdf_bbox,
                    "cell_id": tid,
                    "column_id": new_col,
                    "label": "body",
                    "row_id": new_row,
                    "cell_class": 2,
                }
            )
        matches[sid] = [{"post": confidence, "table_cell_id": tid}]
    return matches, table_cells, max_cell_id


def correct_overlaps(table_cells):
    """A9 — pairwise order-dependent push-apart of overlapping bboxes
    (reference :387-468). Iterative & mutating by design."""

    def overlap(b1, b2):
        return not (
            b1[0] >= b2[2] or b1[2] <= b2[0] or b1[3] <= b2[1] or b1[1] >= b2[3]
        )

    for i in range(len(table_cells)):
        for j in range(i + 1, len(table_cells)):
            c1, c2 = table_cells[i], table_cells[j]
            if c1 == c2 or not overlap(c1["bbox"], c2["bbox"]):
                continue
            b1, b2 = c1["bbox"], c2["bbox"]
            ox = min(b1[2], b2[2]) - max(b1[0], b2[0])
            oy = min(b1[3], b2[3]) - max(b1[1], b2[1])
            if ox <= 0 or oy <= 0:
                continue
            if ox < oy:
                if b1[0] < b2[0]:
                    b1[2] -= math.ceil(ox / 2) + 2
                    b2[0] += math.floor(ox / 2)
                else:
                    b2[2] -= math.ceil(ox / 2) + 2
                    b1[0] += math.floor(ox / 2)
            else:
                if b1[1] < b2[1]:
                    b1[3] -= math.ceil(oy / 2) + 2
                    b2[1] += math.floor(oy / 2)
                else:
                    b2[3] -= math.ceil(oy / 2) + 2
                    b1[1] += math.floor(oy / 2)
            c1["bbox"] = [min(b1[0], b1[2]), min(b1[1], b1[3]), max(b1[0], b1[2]), max(b1[1], b1[3])]
            c2["bbox"] = [min(b2[0], b2[2]), min(b2[1], b2[3]), max(b2[0], b2[2]), max(b2[1], b2[3])]
    return table_cells


def drop_empty_text_cells(pdf_cells):
    """P9 — drop OCR tokens with empty text (reference :1146-1164)."""
    return [p for p in pdf_cells if p["text"] != ""]


def process(matching_details, correct_overlapping_cells=False):
    """The 9-step pipeline (reference process(), :1166-1416), same order,
    same guards, same mutation points."""
    table_cells = matching_details["table_cells"]
    pdf_cells = drop_empty_text_cells(matching_details["pdf_cells"])
    matches = matching_details["matches"]

    if not matches:
        matches = rematch_string_keyed(table_cells, pdf_cells)

    tab_columns, tab_rows, max_cell_id = table_dimensions(table_cells)

    fixed_cells = []
    for col in range(tab_columns):
        good, bad = split_good_bad_in_column(table_cells, col, matches)
        alignment = column_alignment(good)
        median_x, _my, median_w, median_h = column_medians(good, alignment)
        moved = snap_cells_to_column(bad, median_x, False, median_w, median_h, alignment)
        fixed_cells.extend(good)
        fixed_cells.extend(moved)

    fixed_sorted = sorted(fixed_cells, key=lambda c: c["cell_id"])
    ioc_matches = rematch_string_keyed(fixed_sorted, pdf_cells)

    dedup_cells, dedup_matches, _ncols = deduplicate_columns(
        tab_columns, fixed_sorted, matches, ioc_matches
    )

    final_matches = final_assignment(dedup_matches)

    dedup_sorted = sorted(dedup_cells, key=lambda c: c["cell_id"])
    if len(pdf_cells) > 300:  # perf guard — semantics-affecting, kept
        aligned = dedup_sorted
    else:
        aligned = align_cells_to_pdf(dedup_sorted, pdf_cells, final_matches)

    final_matches, final_cells, max_cell_id = pick_orphan_cells(
        tab_rows, tab_columns, max_cell_id, aligned, pdf_cells, final_matches
    )

    if correct_overlapping_cells and len(final_cells) <= 300:
        final_cells = correct_overlaps(final_cells)

    matching_details["table_cells"] = final_cells
    matching_details["matches"] = final_matches
    matching_details["pdf_cells"] = pdf_cells
    return matching_details
