"""Import helper: load reference modules that depend on torch/cv2/PIL by
installing fake module providers (the deterministic, non-model functions
under test never touch them)."""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import sys
import types
from unittest.mock import MagicMock

_FAKE_PREFIXES = (
    "torch",
    "torchvision",
    "cv2",
    "PIL",
    "safetensors",
    "transformers",
    "huggingface_hub",
)


class _FakeClass:
    """Real class usable as a base (nn.Module, Dataset, ...)."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        # nn.Module dispatch: reference submodules created with the
        # computing fake-torch (tests/torch_np.py) are invoked as callables
        return self.forward(*a, **k)

    def register_buffer(self, name, t):
        setattr(self, name, t)

    def to(self, *a, **k):
        return self

    def eval(self):
        return self


class _FakeLoader(importlib.abc.Loader):
    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mock = MagicMock(name=spec.name)
        mod.__getattr__ = lambda name, _m=mock: _ensure_classish(getattr(_m, name), name)
        mod.__path__ = []  # behave like a package
        return mod

    def exec_module(self, module):
        pass


def _ensure_classish(value, name):
    # attribute names that are used as base classes must be real classes
    # (a MagicMock base swallows the subclass body — TMTransformerDecoder's
    # reference-authored forward would vanish)
    if name in ("Module", "Dataset", "BasicBlock", "TransformerDecoder",
                "TransformerDecoderLayer", "OPTModel", "OPTForCausalLM",
                "OPTConfig"):
        return _FakeClass
    return value


class _FakeFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path, target=None):
        if any(fullname == p or fullname.startswith(p + ".") for p in _FAKE_PREFIXES):
            if fullname in sys.modules:
                return None
            return importlib.machinery.ModuleSpec(fullname, _FakeLoader())
        return None


def install():
    if not any(isinstance(f, _FakeFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _FakeFinder())
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def import_tf_predictor():
    install()
    import docling_ibm_models.tableformer.data_management.tf_predictor as tfp

    return tfp
