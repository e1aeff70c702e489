"""YAML config loading + deep-merge utilities.

Schema parity with the reference configs (SURVEY.md §2.23): ``data``,
``features``, ``model``, ``loss``, ``optim``, ``augmentation``, ``decoding``,
``logging`` blocks; ``features`` is documentation-only except
``features.teacher.dim`` (reference ``train.py:437``).
"""

from __future__ import annotations

import copy
import json
import logging
from pathlib import Path
from typing import Any, Dict

import yaml


def setup_cli_logging() -> None:
    """INFO logging for our CLIs, with library noise tamed.

    ``force=True`` because orbax.checkpoint installs a root handler at import
    time, which would otherwise turn ``basicConfig`` into a silent no-op;
    orbax/absl per-save INFO chatter is demoted to WARNING.
    """
    logging.basicConfig(
        level=logging.INFO, format="%(levelname)s: %(message)s", force=True
    )
    for noisy in ("orbax", "absl", "jax._src"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def load_config(path: Path | str) -> Dict[str, Any]:
    with Path(path).open("r") as f:
        return yaml.safe_load(f)


def save_config(cfg: Dict[str, Any], path: Path | str) -> None:
    Path(path).write_text(json.dumps(cfg, indent=2))


def deep_update(base: Dict[str, Any], overrides: Dict[str, Any]) -> Dict[str, Any]:
    """Recursive dict merge returning a new dict (reference
    ``config_builder.py:19-26`` semantics)."""
    out = copy.deepcopy(base)
    for key, val in overrides.items():
        if isinstance(val, dict) and isinstance(out.get(key), dict):
            out[key] = deep_update(out[key], val)
        else:
            out[key] = copy.deepcopy(val)
    return out
