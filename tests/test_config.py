"""Config utilities parity vs the reference common.py, driven both by the
reference test scenarios (tests/test_common.py:37-89) and side-by-side
against the imported reference functions on randomized nested dicts."""

from __future__ import annotations

import json
import random

import pytest

from docling_ibm_models_spark.functions import config as c

from . import ref_import

TEST_CONFIG_A = {
    "base_dir": "./tests/test_data/",
    "dataset": {
        "name": ["PhysRevB"],
        "limit": 10,
        "split": {"test": 0.2, "train": 0.5, "evaluate": 0.3},
    },
    "features": {
        "name": "Data2Features03b",
        "parameters": {
            "normalize_features": True,
            "normalize_features_method": "Z-Score",
        },
    },
}


def _ref_common():
    ref_import.install()
    import docling_ibm_models.tableformer.common as ref_c

    return ref_c


def test_safe_get_parameter_reference_scenarios():
    assert c.safe_get_parameter(None, None, 10) == 10
    p = ["features", "parameters", "normalize_features_method"]
    assert c.safe_get_parameter(TEST_CONFIG_A, p, None) == "Z-Score"
    assert c.safe_get_parameter(TEST_CONFIG_A, ["features", "parameters", "wrong"], "hello") == "hello"
    assert c.safe_get_parameter(TEST_CONFIG_A, ["features", "wrong", "x"], 10) == 10
    assert c.safe_get_parameter(TEST_CONFIG_A, ["model", "parameters", "x"], "hello") == "hello"
    with pytest.raises(ValueError):
        c.safe_get_parameter(TEST_CONFIG_A, ["missing"], required=True)


def test_validate_config_reference_scenarios():
    assert c.validate_config({"preparation": {"max_tag_len": 300}, "model": {"seq_len": 30}})
    assert c.validate_config({"preparation": {"max_tag_len": 300}, "model": {"seq_len": 302}})
    with pytest.raises(AssertionError):
        c.validate_config({"preparation": {"max_tag_len": 300}, "model": {"seq_len": 303}})
    # absent sections short-circuit True (reference :33-36)
    assert c.validate_config({})
    assert c.validate_config({"model": {"seq_len": -5}})
    assert c.validate_config({"preparation": {}})
    with pytest.raises(AssertionError):
        c.validate_config({"model": {}, "preparation": {}})  # max_tag_len missing
    with pytest.raises(AssertionError):
        c.validate_config({"model": {"seq_len": 0}, "preparation": {"max_tag_len": 5}})


def test_read_config_roundtrip(tmp_path):
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps(TEST_CONFIG_A))
    assert c.read_config(str(f)) == TEST_CONFIG_A


def _random_nested(rng, depth=3):
    if depth == 0 or rng.random() < 0.3:
        return rng.choice([1, "x", None, [1, 2]])
    return {f"k{i}": _random_nested(rng, depth - 1) for i in range(rng.randint(1, 3))}


def test_safe_get_parameter_randomized_parity():
    ref_c = _ref_common()
    rng = random.Random(42)
    for _ in range(300):
        d = _random_nested(rng)
        path = [f"k{rng.randint(0, 3)}" for _ in range(rng.randint(1, 4))]
        required = rng.random() < 0.3
        try:
            exp = ref_c.safe_get_parameter(d, path, "DEF", required)
            exc = None
        except (ValueError, TypeError) as e:
            exp, exc = None, type(e)
        try:
            got = c.safe_get_parameter(d, path, "DEF", required)
            gexc = None
        except (ValueError, TypeError) as e:
            got, gexc = None, type(e)
        assert (exp, exc) == (got, gexc), (d, path, required)


def test_validate_config_randomized_parity():
    ref_c = _ref_common()
    rng = random.Random(7)
    for _ in range(300):
        cfg = {}
        if rng.random() < 0.7:
            cfg["model"] = {"seq_len": rng.randint(-2, 310)} if rng.random() < 0.8 else {}
        if rng.random() < 0.7:
            cfg["preparation"] = (
                {"max_tag_len": rng.choice([10, 300])} if rng.random() < 0.8 else {}
            )
        try:
            exp, exc = ref_c.validate_config(dict(cfg)), None
        except AssertionError:
            exp, exc = None, AssertionError
        try:
            got, gexc = c.validate_config(dict(cfg)), None
        except AssertionError:
            got, gexc = None, AssertionError
        assert (exp, exc) == (got, gexc), cfg
