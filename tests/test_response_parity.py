"""Parity of response_gen vs the reference TFPredictor's deterministic
methods (imported with fake torch modules; instance methods called with a
minimal dummy self)."""

from __future__ import annotations

import copy
import logging
import random

import pytest

from docling_ibm_models_spark.operators import cell_matcher as ours_cm
from docling_ibm_models_spark.operators import post_processor as ours_pp
from docling_ibm_models_spark.operators import response_gen as ours_rg
from .ref_import import import_tf_predictor
from .test_matcher_parity import random_page, random_prediction

tfp = import_tf_predictor()


class _DummySelf:
    def _log(self):
        return logging.getLogger("dummy")

    def _deletebbox(self, bboxes, indexes):
        return tfp.TFPredictor._deletebbox(self, bboxes, indexes)

    def _remove_bbox_span_desync(self, prediction):
        return tfp.TFPredictor._remove_bbox_span_desync(self, prediction)


REF = _DummySelf()


def processed_details(seed):
    rng = random.Random(seed)
    pred = random_prediction(rng)
    page = random_page(rng, rng.randint(5, 60))
    details = ours_cm.match_cells(page, [100.0, 200.0, 800.0, 900.0], pred)
    return ours_pp.process(details)


@pytest.mark.parametrize("seed", range(25))
def test_generate_tf_response_parity(seed):
    d = processed_details(60000 + seed)
    ref = tfp.TFPredictor._generate_tf_response(REF, d["table_cells"], d["matches"])
    got = ours_rg.generate_tf_response(d["table_cells"], d["matches"])
    assert got == ref


@pytest.mark.parametrize("seed", range(25))
def test_merge_tf_output_parity(seed):
    d = processed_details(61000 + seed)
    docling_output = ours_rg.generate_tf_response(d["table_cells"], d["matches"])
    docling_output.sort(key=lambda c: c["cell_id"])
    ref = tfp.TFPredictor._merge_tf_output(REF, docling_output, d["pdf_cells"])
    got = ours_rg.merge_tf_output(docling_output, d["pdf_cells"])
    assert got == ref


@pytest.mark.parametrize("seed", range(25))
def test_compaction_parity(seed):
    """A11 vs the inline logic of multi_table_predict (:502-564), re-run
    here step-for-step on the reference side."""
    d = processed_details(62000 + seed)
    resp = ours_rg.generate_tf_response(d["table_cells"], d["matches"])
    resp.sort(key=lambda c: c["cell_id"])
    ref_resp = copy.deepcopy(resp)

    # reference-side: execute the published algorithm (their code is inline
    # in multi_table_predict which needs a model; asserting against a
    # faithful trace of :506-560)
    sc, ec, sr, er = [], [], [], []
    for c in ref_resp:
        if c["start_col_offset_idx"] not in sc:
            sc.append(c["start_col_offset_idx"])
        if c["end_col_offset_idx"] not in ec:
            ec.append(c["end_col_offset_idx"])
        if c["start_row_offset_idx"] not in sr:
            sr.append(c["start_row_offset_idx"])
        if c["end_row_offset_idx"] not in er:
            er.append(c["end_row_offset_idx"])
    for lst in (sc, ec, sr, er):
        lst.sort()
    for c in ref_resp:
        c["start_col_offset_idx"] = sc.index(c["start_col_offset_idx"])
        c["end_col_offset_idx"] = c["start_col_offset_idx"] + c["col_span"]
        c["start_row_offset_idx"] = sr.index(c["start_row_offset_idx"])
        c["end_row_offset_idx"] = c["start_row_offset_idx"] + c["row_span"]

    got = copy.deepcopy(resp)
    ncols, nrows = ours_rg.compact_row_col_indexes(got)
    assert got == ref_resp
    assert ncols == len(ec) and nrows == len(er)
    if got:  # dense: indexes start at 0 and are gap-free
        assert min(c["start_col_offset_idx"] for c in got) == 0
        assert min(c["start_row_offset_idx"] for c in got) == 0


@pytest.mark.parametrize("seed", range(20))
def test_bbox_sync_and_desync_repair_parity(seed):
    rng = random.Random(63000 + seed)
    pred = random_prediction(rng)
    # randomly desync: add or remove a bbox
    if rng.random() < 0.5 and pred["bboxes"]:
        pred["bboxes"] = pred["bboxes"][:-1]
    else:
        pred["bboxes"] = pred["bboxes"] + [[0.1, 0.1, 0.2, 0.2]]
    ref_match, ref_bboxes = tfp.TFPredictor._check_bbox_sync(REF, copy.deepcopy(pred))
    got_match, got_bboxes = ours_rg.check_bbox_sync(copy.deepcopy(pred))
    assert (got_match, got_bboxes) == (ref_match, ref_bboxes)


@pytest.mark.parametrize("seed", range(10))
def test_coordinate_transforms_parity(seed):
    rng = random.Random(64000 + seed)
    table_bbox = [100.0, 200.0, 800.0, 900.0]
    for _ in range(20):
        x1, y1 = rng.uniform(100, 700), rng.uniform(200, 800)
        bbox = [x1, y1, x1 + rng.uniform(1, 90), y1 + rng.uniform(1, 90)]
        ref = tfp.TFPredictor.page_coords_to_table_coords(REF, bbox, table_bbox, 448, 448)
        got = ours_rg.page_coords_to_table_coords(bbox, table_bbox, 448, 448)
        assert got == ref
    bboxes = [[rng.random() for _ in range(4)] for _ in range(10)]
    ratio = rng.uniform(0.5, 2.0)
    ref = tfp.TFPredictor._depad_bboxes(REF, copy.deepcopy(bboxes), ratio)
    got = ours_rg.depad_bboxes(copy.deepcopy(bboxes), ratio)
    assert got == ref


@pytest.mark.parametrize("seed", range(10))
def test_dummy_path_parity(seed):
    """predict_dummy path: match_cells_dummy + _generate_tf_response_dummy."""
    import sys

    sys.path.insert(0, "/root/reference")
    from docling_ibm_models.tableformer.data_management.tf_cell_matcher import (
        CellMatcher,
    )

    from docling_ibm_models_spark.operators import cell_matcher as ours_cm
    from .test_matcher_parity import random_page, random_prediction

    rng = random.Random(70000 + seed)
    pred = random_prediction(rng)
    page = random_page(rng, rng.randint(1, 40))
    table_bbox = [100.0, 200.0, 800.0, 900.0]
    ref_cm = CellMatcher({"predict": {"pdf_cell_iou_thres": 0.05}})
    ref = ref_cm.match_cells_dummy(copy.deepcopy(page), list(table_bbox), dict(pred))
    got = ours_cm.match_cells_dummy(copy.deepcopy(page), list(table_bbox), dict(pred))
    for key in ("table_cells", "pdf_cells", "matches", "prediction_bboxes_page"):
        assert got[key] == ref[key], key

    ref_resp = tfp.TFPredictor._generate_tf_response_dummy(REF, ref["table_cells"])
    got_resp = ours_rg.generate_tf_response_dummy(got["table_cells"])
    assert got_resp == ref_resp


def test_resize_plan_and_bbox_scale_parity():
    """P3 scale-factor semantics vs reference resize_img (cv2 faked; the
    mock records the dim argument) + multi_table_predict bbox scaling."""
    import numpy as np

    class _Img:
        def __init__(self, h, w):
            self.shape = (h, w, 3)

    import docling_ibm_models.tableformer.data_management.tf_predictor as ref_tfp

    for h, w, kw in [(1612, 1237, {"height": 1024}), (500, 800, {"width": 640}),
                     (1024, 1024, {}), (333, 777, {"height": 512})]:
        ref_out, ref_sf = tfp.TFPredictor.resize_img(REF, _Img(h, w), **kw)
        dim, sf = ours_rg.resize_plan(h, w, **kw)
        assert sf == ref_sf
        if kw:
            called_dim = ref_tfp.cv2.resize.call_args[0][1]
            assert dim == called_dim

    scaled, crops = ours_rg.scale_table_bbox([178.0, 748.0, 1061.0, 976.0], 1024 / 1612)
    assert scaled == [c * (1024 / 1612) for c in [178.0, 748.0, 1061.0, 976.0]]
    assert crops == (round(scaled[1]), round(scaled[3]), round(scaled[0]), round(scaled[2]))
