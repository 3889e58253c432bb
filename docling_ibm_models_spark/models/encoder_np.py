"""M2 encoder deterministic surface as REAL numpy (reference:
docling_ibm_models/tableformer/models/table04_rs/encoder04_rs.py:16-72).

The reference encoder is ``torchvision.models.resnet18()`` truncated with
``list(resnet.children())[:-3]`` (drops layer4/avgpool/fc → 256-channel
feature map), followed by ``AdaptiveAvgPool2d((enc_image_size,
enc_image_size))`` and an NCHW→NHWC permute. The resnet backbone itself is
torch-library weights (environment-blocked); what the reference OWNS — the
truncation, the adaptive average pool and the output layout — is ported
here and parity-tested by executing the reference ``Encoder04`` class under
the computing fake-torch with a synthetic conv stack standing in for the
torchvision factory (tests/test_bbox_decoder_np.py).

``adaptive_avg_pool2d`` uses torch's exact bin formula
(start = floor(i·H/out), end = ceil((i+1)·H/out)), so outputs are
float-identical to eval-mode torch for any input/output size pair.
"""

from __future__ import annotations

import numpy as np

from docling_ibm_models_spark.models.bbox_decoder_np import batchnorm2d, conv2d


def adaptive_avg_pool2d(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """torch.nn.AdaptiveAvgPool2d semantics over NCHW."""
    n, c, h, w = x.shape
    oh, ow = out_hw
    out = np.zeros((n, c, oh, ow), dtype=np.float64)
    for i in range(oh):
        h0 = (i * h) // oh
        h1 = -(-((i + 1) * h) // oh)  # ceil division
        for j in range(ow):
            w0 = (j * w) // ow
            w1 = -(-((j + 1) * w) // ow)
            out[:, :, i, j] = x[:, :, h0:h1, w0:w1].mean(axis=(2, 3))
    return out


def conv_stack_forward(x_nchw: np.ndarray, stack: list[dict]) -> np.ndarray:
    """A truncated-backbone stand-in: sequence of conv/bn/relu layer specs
    (each dict: {"conv": w, "stride": s, "padding": p, "bn": {...}})."""
    x = x_nchw
    for layer in stack:
        x = conv2d(x, layer["conv"], stride=layer["stride"], padding=layer["padding"])
        x = batchnorm2d(x, layer["bn"])
        x = np.maximum(x, 0.0)
    return x


def encoder04_forward(
    x_nchw: np.ndarray, stack: list[dict], enc_image_size: int
) -> np.ndarray:
    """Encoder04.forward (encoder04_rs.py:47-72): truncated backbone →
    adaptive avg pool to (enc_image_size)² → NCHW→NHWC permute."""
    out = conv_stack_forward(x_nchw, stack)
    out = adaptive_avg_pool2d(out, (enc_image_size, enc_image_size))
    return np.transpose(out, (0, 2, 3, 1))


def synthetic_encoder_stack(seed: int = 11, channels=(3, 8, 16)) -> list[dict]:
    """Deterministic small conv stack (stride-2 conv+BN+ReLU per step) —
    the weight stand-in for the torchvision backbone."""
    import math

    rng = np.random.default_rng(seed)
    stack = []
    for cin, cout in zip(channels[:-1], channels[1:]):
        stack.append(
            {
                "conv": rng.normal(0.0, 1.0 / math.sqrt(9 * cin), (cout, cin, 3, 3)),
                "stride": 2,
                "padding": 1,
                "bn": {
                    "weight": rng.uniform(0.8, 1.2, cout),
                    "bias": rng.normal(0.0, 0.05, cout),
                    "running_mean": rng.normal(0.0, 0.05, cout),
                    "running_var": rng.uniform(0.5, 1.5, cout),
                },
            }
        )
    return stack
