"""Config utilities — behavioral re-creation of the reference's
``tableformer/common.py`` (:19-95), covered by reference
``tests/test_common.py:37-89`` scenarios in tests/test_config.py.

Semantics preserved exactly:

* ``validate_config`` returns True early when "model" or "preparation" is
  absent (only a config carrying BOTH is constrained); ``seq_len`` must be
  positive and at most ``max_tag_len + 2``; violations raise
  AssertionError (the reference uses bare asserts).
* ``safe_get_parameter`` walks a nested dict by an index path, returning
  ``default`` on any break, or raising ValueError naming the missing key
  when ``required=True``. ``None`` inputs yield the default.
* ``read_config`` loads JSON then validates.
"""

from __future__ import annotations

import json


def validate_config(config: dict) -> bool:
    if "model" not in config:
        return True
    if "preparation" not in config:
        return True
    assert (
        "max_tag_len" in config["preparation"]
    ), "Config error: 'preparation.max_tag_len' parameter is missing"
    if "seq_len" in config["model"]:
        assert (
            config["model"]["seq_len"] > 0
        ), "Config error: 'model.seq_len' should be positive"
        assert config["model"]["seq_len"] <= (
            config["preparation"]["max_tag_len"] + 2
        ), "Config error: 'model.seq_len' should be up to 'preparation.max_tag_len' + 2"
    return True


def read_config(config_filename: str) -> dict:
    with open(config_filename) as fd:
        config = json.load(fd)
    validate_config(config)
    return config


def safe_get_parameter(input_dict, index_path, default=None, required=False):
    if input_dict is None or index_path is None:
        return default
    d = input_dict
    for key in index_path[:-1]:
        if key not in d:
            if required:
                raise ValueError(f"Missing parameter: {key}")
            return default
        d = d[key]
    last = index_path[-1]
    if last not in d:
        if required:
            raise ValueError(f"Missing parameter: {last}")
        return default
    return d[last]
