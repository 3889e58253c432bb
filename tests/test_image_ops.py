"""P3 pixel resample: numpy INTER_AREA (operators/image_ops.py) behavioral
tests. cv2 is not installed in-container, so parity is pinned to the
publicly documented INTER_AREA algorithm (exact area means when shrinking,
modified bilinear when zooming) rather than recorded cv2 goldens; the
integer-shrink and zoom-by-2 cases below are exact cv2 invariants."""

from __future__ import annotations

import numpy as np
import pytest

from docling_ibm_models_spark.operators import response_gen
from docling_ibm_models_spark.operators import image_ops
from docling_ibm_models_spark.operators.image_ops import resize_img


def test_identity_when_no_dims():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out, sf = resize_img(img)
    assert sf == 1.0 and out is img


def test_integer_shrink_is_exact_box_mean():
    img = np.array(
        [[0, 2, 4, 6], [8, 10, 12, 14], [16, 18, 20, 22], [24, 26, 28, 30]],
        dtype=np.float64,
    )
    out, sf = resize_img(img, height=2)
    assert sf == 0.5 and out.shape == (2, 2)
    # each output pixel = mean of its 2x2 block
    assert np.allclose(out, [[5.0, 9.0], [21.0, 25.0]])


def test_fractional_shrink_weights():
    # 3 -> 2 rows: out[0] = (p0 + 0.5*p1) / 1.5, out[1] = (0.5*p1 + p2) / 1.5
    img = np.array([[3.0, 3.0, 3.0], [6.0, 6.0, 6.0], [9.0, 9.0, 9.0]])
    out, _ = resize_img(img, height=2)  # cols 3 -> int(3*2/3) = 2
    assert out.shape == (2, 2)
    assert np.allclose(out[:, 0], [(3 + 0.5 * 6) / 1.5, (0.5 * 6 + 9) / 1.5])


def test_zoom_by_two_is_nearest():
    # cv2 INTER_AREA zoom: fx = (dx+1) - (sx+1)*dst/src == 0 for integer
    # factors -> pixel duplication
    img = np.array([[1.0, 2.0], [3.0, 4.0]])
    out, sf = resize_img(img, height=4)
    assert sf == 2.0
    assert np.allclose(
        out,
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
    )


def test_uint8_rounding_and_dtype():
    img = np.array([[10, 11], [12, 14]], dtype=np.uint8)
    out, _ = resize_img(img, height=1)
    assert out.dtype == np.uint8
    # mean = 11.75 -> rint 12
    assert out.tolist() == [[12]]


def test_three_channel_page_resize_matches_plan():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(1612, 1240, 3), dtype=np.uint8)
    out, sf = resize_img(img, height=1024)
    dim, sf_plan = response_gen.resize_plan(1612, 1240, height=1024)
    assert sf == sf_plan
    assert out.shape == (dim[1], dim[0], 3)
    # area mean preserves global brightness closely
    assert abs(float(out.mean()) - float(img.mean())) < 1.0


@pytest.mark.parametrize("h,w,target", [(7, 5, 3), (11, 4, 11), (5, 9, 20)])
def test_weights_partition_of_unity(h, w, target):
    img = np.full((h, w), 42.0)
    out, _ = resize_img(img, height=target)
    assert np.allclose(out, 42.0)


# ---- TableFormer preprocessing chain (P1/P2/P4-P8) --------------------------

from docling_ibm_models_spark.operators.image_ops import (  # noqa: E402
    prepare_image,
    resize_bilinear,
    tf_normalize,
    tf_resize,
)


def test_tf_normalize_formula_quirk():
    # reference functional.py:53: offset 255*mean, std applied RAW (not
    # scaled by 255), no /255 yet
    img = np.full((2, 2, 3), 128, dtype=np.uint8)
    mean, std = [0.5, 0.25, 0.0], [2.0, 1.0, 0.5]
    out = tf_normalize(img, mean, std)
    # float64: the reference divides a float32 array by a float64 np.array,
    # which promotes — preserved as-is
    assert out.dtype == np.float64
    assert np.allclose(out[0, 0], [(128 - 127.5) / 2.0, (128 - 63.75) / 1.0, 256.0])


def test_resize_bilinear_exact_values():
    # 2 -> 3 on one axis: src = (d+0.5)*2/3 - 0.5 -> [-1/6, 1/2, 7/6]
    img = np.array([[0.0], [6.0]])
    out = resize_bilinear(img, 1, 3)
    assert np.allclose(out[:, 0], [0.0, 3.0, 6.0])  # clamped, midpoint, clamped


def test_tf_resize_int_smaller_edge_and_early_return():
    img = np.zeros((10, 5, 3), dtype=np.float32)
    assert tf_resize(img, 5) is img  # w == size -> untouched (ref :79-80)
    out = tf_resize(img, 4)
    assert out.shape == (8, 4, 3)  # smaller edge to 4, aspect kept
    out2 = tf_resize(np.zeros((5, 10, 3), dtype=np.float32), 4)
    assert out2.shape == (4, 8, 3)


def test_prepare_image_shape_and_range():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
    mean = [0.94247851, 0.94254675, 0.94292611]
    std = [0.17910956, 0.17940403, 0.17931663]
    batch = prepare_image(img, mean, std, 448)
    # reference quirk: (batch, channels, WIDTH, HEIGHT)
    assert batch.shape == (1, 3, 448, 448)
    assert batch.dtype == np.float32
    # normalize then /255: values land in roughly [-6, +1] for uint8 input
    assert float(batch.min()) > -7 and float(batch.max()) < 2
    # deterministic
    assert np.array_equal(batch, prepare_image(img, mean, std, 448))


def test_three_channel_zoom_and_bilinear():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    up, sf = resize_img(img, height=12)  # zoom path, 3 channels
    assert up.shape == (12, 10, 3) and sf == 2.0
    # integer zoom = duplication per the INTER_AREA zoom formula
    assert np.array_equal(up[::2, ::2], img)
    bl = resize_bilinear(img.astype(np.float64), 10, 12)
    assert bl.shape == (12, 10, 3)
    # channels stay independent: a constant channel stays constant
    flat = np.zeros((4, 4, 3)); flat[..., 1] = 9.0
    out = resize_bilinear(flat, 7, 5)
    assert np.allclose(out[..., 0], 0) and np.allclose(out[..., 1], 9.0)


# ---------------------------------------------------------------------------
# SamOptImageProcessor preprocessing (M7 input side)
# ---------------------------------------------------------------------------
class TestPilBilinearResize:
    def test_identity_at_same_size(self):
        rng = np.random.default_rng(5)
        img = rng.uniform(0, 255, (7, 9, 3))
        out = image_ops.resize_bilinear_pil(img, 9, 7)
        np.testing.assert_allclose(out, img, rtol=0, atol=1e-12)

    def test_constant_preserved(self):
        img = np.full((11, 5, 3), 42.0)
        out = image_ops.resize_bilinear_pil(img, 13, 4)
        np.testing.assert_allclose(out, 42.0, rtol=0, atol=1e-12)

    def test_factor2_interior_taps_are_pil_triangle(self):
        """Interior output pixel at an exact 2x shrink mixes 4 inputs with
        triangle weights [0.125, 0.375, 0.375, 0.125] — the antialiased
        support PIL uses and cv2 INTER_LINEAR does not."""
        img = np.zeros((1, 8))
        img[0, 2] = 1.0
        out = image_ops.resize_bilinear_pil(img, 4, 1)
        # window of output 0 is clipped at the border and renormalized
        # (weights 0.75/0.75/0.25 over inputs 0..2); interior windows span
        # 4 taps with triangle weights [0.125, 0.375, 0.375, 0.125]
        np.testing.assert_allclose(out[0], [0.25 / 1.75, 0.375, 0.0, 0.0], atol=1e-12)
        img2 = np.zeros((1, 8))
        img2[0, 3] = 1.0
        out2 = image_ops.resize_bilinear_pil(img2, 4, 1)
        np.testing.assert_allclose(out2[0], [0.0, 0.375, 0.125, 0.0], atol=1e-12)

    def test_upscale_matches_classic_bilinear(self):
        """For scale >= 1 the PIL triangle filter degenerates to classic
        2-tap half-pixel bilinear — identical to the cv2-semantics
        resize_bilinear already ported for the TableFormer path."""
        rng = np.random.default_rng(11)
        img = rng.uniform(0, 255, (6, 5, 3))
        a = image_ops.resize_bilinear_pil(img, 11, 14)
        b = image_ops.resize_bilinear(img, 11, 14)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-9)

    def test_code_formula_preprocess_chain(self):
        """resize → /255 CHW → normalize (sam_opt_image_processor.py:24-28),
        shape-contracted for the SAM encoder."""
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
        out = image_ops.code_formula_preprocess(img, mean, std, size=(64, 64))
        assert out.shape == (3, 64, 64)
        # undo normalize on a constant image → exact pixel recovery
        const = np.full((10, 10, 3), 128, dtype=np.uint8)
        out_c = image_ops.code_formula_preprocess(const, mean, std, size=(16, 16))
        recovered = out_c * np.asarray(std)[:, None, None] + np.asarray(mean)[:, None, None]
        np.testing.assert_allclose(recovered, 128 / 255.0, atol=1e-12)

    def test_figure_classifier_preprocess_constants(self):
        """M8 chain (document_figure_classifier_predictor.py:92-99): the
        reference-hardcoded normalize constants and 224x224 target."""
        rng = np.random.default_rng(29)
        img = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
        out = image_ops.figure_classifier_preprocess(img)
        assert out.shape == (3, 224, 224)
        const = np.full((10, 10, 3), 64, dtype=np.uint8)
        out_c = image_ops.figure_classifier_preprocess(const)
        rec = out_c * np.asarray(image_ops.FIGURE_STD)[:, None, None] + np.asarray(
            image_ops.FIGURE_MEAN
        )[:, None, None]
        np.testing.assert_allclose(rec, 64 / 255.0, atol=1e-12)

    def test_pil_partition_of_unity_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(src_h=st.integers(1, 37), src_w=st.integers(1, 37),
               dst_h=st.integers(1, 37), dst_w=st.integers(1, 37))
        def prop(src_h, src_w, dst_h, dst_w):
            img = np.full((src_h, src_w), 7.0)
            out = image_ops.resize_bilinear_pil(img, dst_w, dst_h)
            assert out.shape == (dst_h, dst_w)
            np.testing.assert_allclose(out, 7.0, rtol=0, atol=1e-10)

        prop()
