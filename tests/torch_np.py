"""Computing fake-torch: a numpy-backed mini implementation of exactly the
torch / torch.nn / torchvision surface that the REFERENCE's BBoxDecoder
(bbox_decoder_rs.py:18-168), utils.resnet_block/MLP (utils.py:116-124,
260-274) and PositionalEncoding (transformer_rs.py:18-35) touch at
construction + inference time.

Unlike tests/fake_torch_rs.py (which replays prescribed streams to drive the
predict() CONTROL FLOW), this module actually COMPUTES: Linear is a real
matmul, Conv2d a real convolution, BatchNorm2d the real eval-mode transform.
Reference classes instantiated with these primitives (their module globals
monkeypatched) therefore produce real numeric outputs that the repo's
from-scratch numpy forwards (models/bbox_decoder_np.py) are parity-tested
against — reference code executing, not a reimplementation judging itself.

All math is float64 (numpy default) on both sides, so parity asserts can be
near-bitwise (rtol 1e-10).
"""

from __future__ import annotations

import math
import types

import numpy as np


class Tensor:
    """Minimal ndarray wrapper with the torch methods the reference uses."""

    def __init__(self, data):
        a = np.asarray(data)
        # preserve bool (masks built via ==) and integer dtypes (LongTensor
        # tag-id streams survive cat/squeeze/tolist as ints, like torch);
        # everything else computes in float64
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            self.a = a
        else:
            self.a = a.astype(np.float64)

    # --- shape ops -------------------------------------------------------
    def permute(self, *dims):
        return Tensor(np.transpose(self.a, dims))

    def transpose(self, d0, d1):
        return Tensor(np.swapaxes(self.a, d0, d1))

    def view(self, *shape):
        return Tensor(self.a.reshape(shape))

    def reshape(self, *shape):
        return Tensor(self.a.reshape(shape))

    def unsqueeze(self, dim):
        return Tensor(np.expand_dims(self.a, dim))

    def squeeze(self, dim=None):
        return Tensor(np.squeeze(self.a, axis=dim) if dim is not None else np.squeeze(self.a))

    def expand(self, *sizes):
        shape = [self.a.shape[i] if s == -1 else s for i, s in enumerate(sizes)]
        return Tensor(np.broadcast_to(self.a, shape).copy())

    def size(self, dim=None):
        return self.a.shape if dim is None else self.a.shape[dim]

    @property
    def shape(self):
        return self.a.shape

    def to(self, *a, **k):
        return self

    def float(self):
        return self

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self.a

    def tolist(self):
        return self.a.tolist()

    def __len__(self):
        return self.a.shape[0]

    def __getitem__(self, idx):
        if isinstance(idx, Tensor):
            idx = idx.a
        elif isinstance(idx, tuple):
            idx = tuple(i.a if isinstance(i, Tensor) else i for i in idx)
        out = self.a[idx]
        return Tensor(out) if isinstance(out, np.ndarray) else out

    def __setitem__(self, idx, value):
        self.a[idx] = value.a if isinstance(value, Tensor) else value

    # --- arithmetic -------------------------------------------------------
    def _other(self, o):
        return o.a if isinstance(o, Tensor) else o

    def __add__(self, o):
        return Tensor(self.a + self._other(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Tensor(self.a - self._other(o))

    def __mul__(self, o):
        return Tensor(self.a * self._other(o))

    __rmul__ = __mul__

    def __truediv__(self, o):
        return Tensor(self.a / self._other(o))

    def __neg__(self):
        return Tensor(-self.a)

    def __eq__(self, o):  # elementwise, like torch (zeros(...) == ones(...))
        return Tensor(self.a == self._other(o))

    __hash__ = None

    # --- reductions / activations ----------------------------------------
    def mean(self, dim=None, keepdim=False):
        return Tensor(self.a.mean(axis=dim, keepdims=keepdim))

    def sum(self, dim=None, keepdim=False):
        return Tensor(self.a.sum(axis=dim, keepdims=keepdim))

    def sigmoid(self):
        return Tensor(1.0 / (1.0 + np.exp(-self.a)))

    def exp(self):
        return Tensor(np.exp(self.a))

    def argmax(self, dim=None):
        return Tensor(np.argmax(self.a, axis=dim))

    def item(self):
        return self.a.item()

    def __matmul__(self, o):
        return Tensor(self.a @ self._other(o))

    def softmax(self, dim=-1):
        m = self.a.max(axis=dim, keepdims=True)
        e = np.exp(self.a - m)
        return Tensor(e / e.sum(axis=dim, keepdims=True))

    def unbind(self, dim=0):
        return tuple(Tensor(t) for t in np.moveaxis(self.a, dim, 0))

    def contiguous(self):
        return self

    def pow(self, p):
        return Tensor(self.a**p)

    def long(self):
        return Tensor(self.a.astype(np.int64))

    def flatten(self, start_dim=0, end_dim=-1):
        shape = self.a.shape
        end = len(shape) - 1 if end_dim == -1 else end_dim
        new = shape[:start_dim] + (-1,) + shape[end + 1 :]
        return Tensor(self.a.reshape(new))


def tensor(data, dtype=None, device=None):
    return Tensor(data)


def zeros(*shape, device=None, dtype=None):
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
        shape = tuple(shape[0])
    return Tensor(np.zeros(shape))


def ones(*shape, device=None, dtype=None):
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
        shape = tuple(shape[0])
    return Tensor(np.ones(shape))


def empty(*shape):
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
        shape = tuple(shape[0])
    return Tensor(np.empty(shape))


def arange(start, end=None, step=1, dtype=None):
    a = np.arange(start) if end is None else np.arange(start, end, step)
    return Tensor(a.astype(np.float64))


def stack(tensors, dim=0):
    return Tensor(np.stack([t.a if isinstance(t, Tensor) else np.asarray(t) for t in tensors], axis=dim))


def cat(tensors, dim=0):
    return Tensor(np.concatenate([t.a if isinstance(t, Tensor) else np.asarray(t) for t in tensors], axis=dim))


def LongTensor(vals):
    return Tensor(np.asarray(vals, dtype=np.int64))


def sin(t):
    return Tensor(np.sin(t.a))


def cos(t):
    return Tensor(np.cos(t.a))


def exp(t):
    return Tensor(np.exp(t.a))


def sigmoid(t):
    return t.sigmoid()


def sqrt(t):
    return Tensor(np.sqrt(t.a if isinstance(t, Tensor) else t))


def where(cond, *rest):
    c = cond.a if isinstance(cond, Tensor) else np.asarray(cond)
    if rest:
        x, y = rest
        return Tensor(np.where(c, x.a if isinstance(x, Tensor) else x,
                               y.a if isinstance(y, Tensor) else y))
    return tuple(Tensor(i) for i in np.where(c))


class set_grad_enabled:
    """Context manager shim (no autograd here — eval-mode numerics only)."""

    def __init__(self, mode):
        self.mode = mode

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def einsum(eq, *ops):
    return Tensor(np.einsum(eq, *[o.a if isinstance(o, Tensor) else np.asarray(o) for o in ops]))


# ---------------------------------------------------------------------------
# nn
# ---------------------------------------------------------------------------
class Module:
    def __call__(self, *a, **k):
        return self.forward(*a, **k)

    def __init__(self, *a, **k):
        pass

    def eval(self):
        return self

    def train(self, mode=True):
        return self

    def to(self, *a, **k):
        return self

    def register_buffer(self, name, t):
        setattr(self, name, t)


class Linear(Module):
    """weight: (out, in) — assign numpy arrays directly for seeded tests."""

    def __init__(self, in_features, out_features, bias=True):
        self.in_features = in_features
        self.out_features = out_features
        self.weight = np.zeros((out_features, in_features))
        self.bias = np.zeros(out_features) if bias else None

    def forward(self, x):
        y = x.a @ self.weight.T
        if self.bias is not None:
            y = y + self.bias
        return Tensor(y)


class ReLU(Module):
    def __init__(self, inplace=False):
        pass

    def forward(self, x):
        return Tensor(np.maximum(x.a, 0.0))


class Sigmoid(Module):
    def forward(self, x):
        return x.sigmoid()


class Softmax(Module):
    def __init__(self, dim=None):
        self.dim = dim

    def forward(self, x):
        m = x.a.max(axis=self.dim, keepdims=True)
        e = np.exp(x.a - m)
        return Tensor(e / e.sum(axis=self.dim, keepdims=True))


class Dropout(Module):
    """Eval-mode (inference) dropout: identity."""

    def __init__(self, p=0.5, inplace=False):
        self.p = p

    def forward(self, x):
        return x


class Sequential(Module):
    def __init__(self, *mods):
        self.mods = list(mods)

    def forward(self, x):
        for m in self.mods:
            x = m(x)
        return x

    def __iter__(self):
        return iter(self.mods)

    def __getitem__(self, i):
        return self.mods[i]


class GELU(Module):
    """torch.nn.GELU default: exact erf form (not the tanh approximation)."""

    def forward(self, x):
        import math as _m

        erf = np.vectorize(_m.erf)
        return Tensor(0.5 * x.a * (1.0 + erf(x.a / _m.sqrt(2.0))))


def Parameter(t, requires_grad=True):
    return t


class ModuleList(Module):
    def __init__(self, mods=()):
        self.mods = list(mods)

    def __iter__(self):
        return iter(self.mods)

    def __getitem__(self, i):
        return self.mods[i]

    def __len__(self):
        return len(self.mods)

    def append(self, mod):
        self.mods.append(mod)


class BatchNorm2d(Module):
    """Eval-mode BN: (x - running_mean) / sqrt(running_var + eps) * w + b."""

    def __init__(self, num_features, eps=1e-5, **k):
        self.num_features = num_features
        self.eps = eps
        self.weight = np.ones(num_features)
        self.bias = np.zeros(num_features)
        self.running_mean = np.zeros(num_features)
        self.running_var = np.ones(num_features)

    def forward(self, x):
        # x: (N, C, H, W)
        scale = self.weight / np.sqrt(self.running_var + self.eps)
        shift = self.bias - self.running_mean * scale
        return Tensor(x.a * scale[None, :, None, None] + shift[None, :, None, None])


def _conv2d(x, w, stride, padding):
    """Exact float64 2-D convolution (cross-correlation, torch semantics)."""
    n, c, h, wd = x.shape
    oc, ic, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    oh = (h + 2 * padding - kh) // stride + 1
    ow = (wd + 2 * padding - kw) // stride + 1
    out = np.zeros((n, oc, oh, ow))
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, :, i : i + oh * stride : stride, j : j + ow * stride : stride]
            out += np.einsum("ncij,oc->noij", patch, w[:, :, i, j])
    return out


class Conv2d(Module):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0, groups=1, bias=True, dilation=1):
        assert groups == 1 and dilation == 1
        k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
        self.stride = stride if isinstance(stride, int) else stride[0]
        self.padding = padding if isinstance(padding, int) else padding[0]
        self.weight = np.zeros((out_ch, in_ch, k, k))
        self.bias = np.zeros(out_ch) if bias else None

    def forward(self, x):
        y = _conv2d(x.a, self.weight, self.stride, self.padding)
        if self.bias is not None:
            y = y + self.bias[None, :, None, None]
        return Tensor(y)


class LayerNorm(Module):
    """torch.nn.LayerNorm over the last dim (biased variance)."""

    def __init__(self, normalized_shape, eps=1e-5):
        n = normalized_shape if isinstance(normalized_shape, int) else normalized_shape[0]
        self.eps = eps
        self.weight = np.ones(n)
        self.bias = np.zeros(n)

    def forward(self, x):
        mu = x.a.mean(axis=-1, keepdims=True)
        var = x.a.var(axis=-1, keepdims=True)  # unbiased=False, torch default
        return Tensor((x.a - mu) / np.sqrt(var + self.eps) * self.weight + self.bias)


class MultiheadAttention(Module):
    """torch.nn.MultiheadAttention, seq-first (L, N, E), packed in_proj.

    Public semantics: q/k/v through one (3E, E) projection, per-head
    scaled dot-product with 1/sqrt(head_dim), bool attn_mask True=blocked,
    float mask added to scores, out_proj back to E."""

    def __init__(self, embed_dim, num_heads, dropout=0.0, batch_first=False, **k):
        assert not batch_first
        self.e = embed_dim
        self.h = num_heads
        self.in_proj_weight = np.zeros((3 * embed_dim, embed_dim))
        self.in_proj_bias = np.zeros(3 * embed_dim)
        self.out_proj = Linear(embed_dim, embed_dim)

    def forward(self, query, key, value, attn_mask=None, key_padding_mask=None, need_weights=True):
        E, h = self.e, self.h
        d = E // h
        L, N, _ = query.shape
        S = key.shape[0]
        W, b = self.in_proj_weight, self.in_proj_bias
        Q = query.a @ W[:E].T + b[:E]
        K = key.a @ W[E : 2 * E].T + b[E : 2 * E]
        V = value.a @ W[2 * E :].T + b[2 * E :]

        def heads(x, T):
            return x.reshape(T, N * h, d).transpose(1, 0, 2)  # (N*h, T, d)

        Qh, Kh, Vh = heads(Q, L), heads(K, S), heads(V, S)
        scores = Qh @ Kh.transpose(0, 2, 1) / math.sqrt(d)  # (N*h, L, S)
        if attn_mask is not None:
            m = attn_mask.a if isinstance(attn_mask, Tensor) else np.asarray(attn_mask)
            if m.dtype == bool:
                scores = np.where(m, -np.inf, scores)
            else:
                scores = scores + m
        mx = scores.max(axis=-1, keepdims=True)
        ex = np.exp(scores - mx)
        attn = ex / ex.sum(axis=-1, keepdims=True)
        out = attn @ Vh  # (N*h, L, d)
        out = out.transpose(1, 0, 2).reshape(L, N, E)
        out = out @ self.out_proj.weight.T + self.out_proj.bias
        return Tensor(out), None


class TransformerEncoderLayer(Module):
    """torch.nn.TransformerEncoderLayer, post-norm (norm_first=False
    default), relu activation, eval-mode dropout = identity."""

    def __init__(self, d_model, nhead, dim_feedforward=2048, dropout=0.1, **k):
        self.self_attn = MultiheadAttention(d_model, nhead, dropout=dropout)
        self.linear1 = Linear(d_model, dim_feedforward)
        self.linear2 = Linear(dim_feedforward, d_model)
        self.norm1 = LayerNorm(d_model)
        self.norm2 = LayerNorm(d_model)

    def forward(self, src, src_mask=None, src_key_padding_mask=None):
        sa = self.self_attn(src, src, src, attn_mask=src_mask,
                            key_padding_mask=src_key_padding_mask)[0]
        x = self.norm1(src + sa)
        ff = self.linear2(Tensor(np.maximum(self.linear1(x).a, 0.0)))
        return self.norm2(x + ff)


class TransformerDecoderLayer(Module):
    """torch.nn.TransformerDecoderLayer __init__ attribute surface: the
    reference's TMTransformerDecoderLayer subclasses it ONLY for the module
    attributes (self_attn, multihead_attn, linear1/2, norm1/2/3, dropouts,
    relu activation) and overrides forward entirely — so the layer math that
    executes is reference-authored code running over these primitives."""

    def __init__(self, d_model, nhead, dim_feedforward=2048, dropout=0.1, **k):
        self.self_attn = MultiheadAttention(d_model, nhead, dropout=dropout)
        self.multihead_attn = MultiheadAttention(d_model, nhead, dropout=dropout)
        self.linear1 = Linear(d_model, dim_feedforward)
        self.linear2 = Linear(dim_feedforward, d_model)
        self.norm1 = LayerNorm(d_model)
        self.norm2 = LayerNorm(d_model)
        self.norm3 = LayerNorm(d_model)
        self.dropout = Dropout(dropout)
        self.dropout1 = Dropout(dropout)
        self.dropout2 = Dropout(dropout)
        self.dropout3 = Dropout(dropout)
        self.activation = ReLU()


class TransformerDecoder(Module):
    """torch.nn.TransformerDecoder __init__ surface (deep-copied layer
    stack); forward is overridden by the reference's TMTransformerDecoder."""

    def __init__(self, decoder_layer, num_layers, norm=None):
        import copy

        self.layers = [copy.deepcopy(decoder_layer) for _ in range(num_layers)]
        self.num_layers = num_layers
        self.norm = norm


class TransformerEncoder(Module):
    """torch.nn.TransformerEncoder: deep-copied layer stack, norm=None."""

    def __init__(self, encoder_layer, num_layers, norm=None, enable_nested_tensor=True):
        import copy

        self.layers = [copy.deepcopy(encoder_layer) for _ in range(num_layers)]
        self.norm = norm

    def forward(self, src, mask=None, src_key_padding_mask=None):
        out = src
        for layer in self.layers:
            out = layer(out, src_mask=mask, src_key_padding_mask=src_key_padding_mask)
        if self.norm is not None:
            out = self.norm(out)
        return out


class AdaptiveAvgPool2d(Module):
    """torch bin formula: start=floor(i*H/out), end=ceil((i+1)*H/out)."""

    def __init__(self, output_size):
        self.output_size = output_size

    def forward(self, x):
        n, c, h, w = x.shape
        oh, ow = self.output_size
        out = np.zeros((n, c, oh, ow))
        for i in range(oh):
            h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
            for j in range(ow):
                w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
                out[:, :, i, j] = x.a[:, :, h0:h1, w0:w1].mean(axis=(2, 3))
        return Tensor(out)


class Embedding(Module):
    def __init__(self, num_embeddings, embedding_dim):
        self.weight = np.zeros((num_embeddings, embedding_dim))

    def forward(self, idx):
        ids = np.asarray(idx.a if isinstance(idx, Tensor) else idx, dtype=np.int64)
        return Tensor(self.weight[ids])


# ---------------------------------------------------------------------------
# functional + torchvision pieces
# ---------------------------------------------------------------------------
def _relu_f(x, inplace=False):
    return Tensor(np.maximum(x.a, 0.0))


def _pad_f(x, pad, mode="constant", value=0.0):
    """torch.nn.functional.pad: pad pairs run from the LAST dim backward."""
    a = x.a if isinstance(x, Tensor) else np.asarray(x)
    widths = [(0, 0)] * a.ndim
    for i in range(len(pad) // 2):
        widths[a.ndim - 1 - i] = (pad[2 * i], pad[2 * i + 1])
    return Tensor(np.pad(a, widths, constant_values=value))


F = types.SimpleNamespace(relu=_relu_f, pad=_pad_f)


def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
    """torchvision.models.resnet.conv3x3 (public semantics)."""
    return Conv2d(in_planes, out_planes, 3, stride=stride, padding=dilation, groups=groups, bias=False, dilation=dilation)


def conv1x1(in_planes, out_planes, stride=1):
    """torchvision.models.resnet.conv1x1 (public semantics)."""
    return Conv2d(in_planes, out_planes, 1, stride=stride, bias=False)


class BasicBlock(Module):
    """torchvision.models.resnet.BasicBlock (public semantics), eval mode."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, **k):
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = BatchNorm2d(planes)
        self.relu = ReLU(inplace=True)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.conv1(x)
        out = self.bn1(out)
        out = self.relu(out)
        out = self.conv2(out)
        out = self.bn2(out)
        if self.downsample is not None:
            identity = self.downsample(x)
        out = out + identity
        return self.relu(out)


nn = types.SimpleNamespace(
    Module=Module,
    Linear=Linear,
    ReLU=ReLU,
    GELU=GELU,
    Parameter=Parameter,
    Sigmoid=Sigmoid,
    Softmax=Softmax,
    Dropout=Dropout,
    Sequential=Sequential,
    ModuleList=ModuleList,
    BatchNorm2d=BatchNorm2d,
    Conv2d=Conv2d,
    Embedding=Embedding,
    AdaptiveAvgPool2d=AdaptiveAvgPool2d,
    LayerNorm=LayerNorm,
    MultiheadAttention=MultiheadAttention,
    TransformerEncoderLayer=TransformerEncoderLayer,
    TransformerEncoder=TransformerEncoder,
    TransformerDecoderLayer=TransformerDecoderLayer,
    TransformerDecoder=TransformerDecoder,
)

torch = types.SimpleNamespace(
    Tensor=Tensor,
    tensor=tensor,
    zeros=zeros,
    ones=ones,
    empty=empty,
    arange=arange,
    stack=stack,
    cat=cat,
    LongTensor=LongTensor,
    sin=sin,
    cos=cos,
    exp=exp,
    sigmoid=sigmoid,
    sqrt=sqrt,
    einsum=einsum,
    where=where,
    set_grad_enabled=set_grad_enabled,
    nn=nn,
    float=np.float64,
    float64=np.float64,
    float32=np.float64,  # everything computes in float64 here
)
nn.functional = F
torch.nn = nn

math = math  # re-export for patched modules that expect a math global
