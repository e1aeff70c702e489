"""Average N checkpoints into one (the standard Conformer/ASR eval trick:
uniform parameter averaging of the last/best checkpoints reduces variance
and usually buys a small WER gain; see e.g. the torchaudio/ESPnet recipes).

Usage:
  python -m ssd_tpu.training.average_checkpoints \
      --checkpoints run/epoch10 run/epoch11 run/best \
      --output results/checkpoints/run_avg

All inputs must share one param topology (same config). Params and
batch_stats average uniformly in fp64 accumulate / fp32 store; epoch/step
take the max; the embedded config comes from the first checkpoint;
optimizer state is dropped (averaged checkpoints are for evaluation,
serving, and warm starts — not ``--resume``).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from ssd_tpu.training.checkpoint import load_checkpoint_np, load_config_for

logger = logging.getLogger(__name__)


def average_payloads(payloads: list) -> dict:
    """Uniformly average params/batch_stats across checkpoint payloads."""
    if not payloads:
        raise ValueError("need at least one checkpoint")

    def avg(*leaves):
        acc = np.zeros(np.shape(leaves[0]), np.float64)
        for leaf in leaves:
            arr = np.asarray(leaf)
            if arr.shape != acc.shape:
                raise ValueError(
                    f"checkpoint topology mismatch: {arr.shape} vs {acc.shape}"
                )
            acc += arr.astype(np.float64)
        mean = acc / len(leaves)
        # integer leaves (none expected in float checkpoints, but int8
        # prequant trees must not be averaged silently)
        if not np.issubdtype(np.asarray(leaves[0]).dtype, np.floating):
            raise ValueError(
                "non-float leaf in checkpoint — averaging only supports "
                "float param trees (not int8_prequant conversions)"
            )
        return mean.astype(np.asarray(leaves[0]).dtype)

    out = {}
    for key in ("params", "batch_stats"):
        out[key] = jax.tree_util.tree_map(avg, *[p[key] for p in payloads])
    for key in ("epoch", "step"):
        vals = [int(p[key]) for p in payloads if key in p]
        if vals:
            out[key] = np.asarray(max(vals))
    return out


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s",
                        force=True)
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoints", nargs="+", required=True,
                    help="checkpoint dirs (…/last, …/best)")
    ap.add_argument("--output", required=True,
                    help="output run dir (gets <output>/last + config.json)")
    args = ap.parse_args(argv)

    paths = [Path(p).resolve() for p in args.checkpoints]
    cfg = load_config_for(paths[0])
    payloads = [load_checkpoint_np(p) for p in paths]
    out_payload = average_payloads(payloads)

    out_dir = Path(args.output).resolve()
    out_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_dir / "last", out_payload, force=True)
    ckptr.wait_until_finished()
    (out_dir / "config.json").write_text(json.dumps(cfg, indent=2))
    logger.info(
        "Averaged %d checkpoints → %s (optimizer state dropped)",
        len(paths), out_dir / "last",
    )


if __name__ == "__main__":
    main()
