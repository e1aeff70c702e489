"""Convert a checkpoint between the unrolled (``block_0`` … ``block_{L-1}``)
and scanned (``blocks/block`` stacked, ``model.encoder.scan_layers: true``)
encoder parameter layouts.

The two layouts are the same weights (``tests/test_scan_layers.py`` pins
math equivalence); this CLI moves trained checkpoints between them so a
flagship-style unrolled run can serve or fine-tune under ``scan_layers``
(O(1)-in-depth compiles) and vice versa. The converted checkpoint carries
params + batch_stats + counters and the flipped embedded config; optimizer
state is dropped (its moment trees embed the source layout — converted
checkpoints are for evaluation, serving, and ``--init-checkpoint`` warm
starts, not mid-run ``--resume``).

Usage:
  python -m ssd_tpu.training.convert_layout \
      --checkpoint results/checkpoints/run/best --to scan \
      --output results/checkpoints/run_scan
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import orbax.checkpoint as ocp

from ssd_tpu.models.conformer import stack_block_tree, unstack_block_tree
from ssd_tpu.training.checkpoint import load_checkpoint_np, load_config_for

logger = logging.getLogger(__name__)


def convert_payload(payload: dict, cfg: dict, to: str) -> tuple[dict, dict]:
    """Return (converted payload, updated cfg). ``to`` ∈ {scan, unrolled}.

    The source layout is detected from the PARAMS TREE, not the config:
    pipelined checkpoints (``pipeline_microbatches > 0``) use the stacked
    ``blocks/block`` layout with ``scan_layers`` false, and must convert to
    unrolled like a scanned checkpoint would. Converting a pipelined
    checkpoint *to scan* flips it to ``scan_layers: true`` (pipeline off) —
    the stacked leaves are identical either way.
    """
    num_layers = int(cfg["model"]["encoder"]["num_layers"])
    enc_params = payload["params"].get("encoder", {})
    was_stacked = "blocks" in enc_params
    was_pipelined = int(
        cfg["model"]["encoder"].get("pipeline_microbatches", 0) or 0
    ) > 0
    if to == "scan" and was_stacked and was_pipelined:
        # pipelined → scan: the stacked leaves ARE the scan layout; only the
        # config flags change
        convert = lambda tree, n: tree  # noqa: E731
    elif (to == "scan") == was_stacked:
        raise ValueError(
            f"checkpoint is already in the "
            f"{'stacked (scan/pipeline)' if was_stacked else 'unrolled'} layout"
        )
    else:
        convert = stack_block_tree if to == "scan" else unstack_block_tree

    out = {}
    for key in ("params", "batch_stats"):
        tree = dict(payload[key])
        enc = dict(tree.get("encoder", {}))
        has_blocks = any(k.startswith("block_") for k in enc) or "blocks" in enc
        if has_blocks:
            tree["encoder"] = convert(enc, num_layers)
        out[key] = tree
    for key in ("epoch", "step"):
        if key in payload:
            out[key] = payload[key]

    new_cfg = json.loads(json.dumps(cfg))  # deep copy
    new_cfg["model"]["encoder"]["scan_layers"] = to == "scan"
    # the output layout is exactly scan-or-unrolled; a pipelined source's
    # flag would otherwise conflict with scan_layers at load time
    new_cfg["model"]["encoder"].pop("pipeline_microbatches", None)
    return out, new_cfg


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s",
                        force=True)
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint dir (…/last or …/best)")
    ap.add_argument("--to", required=True, choices=("scan", "unrolled"))
    ap.add_argument("--output", required=True,
                    help="output run dir (gets <output>/last + config.json)")
    args = ap.parse_args(argv)

    ckpt = Path(args.checkpoint).resolve()
    cfg = load_config_for(ckpt)
    payload = load_checkpoint_np(ckpt)
    out_payload, out_cfg = convert_payload(payload, cfg, args.to)

    out_dir = Path(args.output).resolve()
    out_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_dir / "last", out_payload, force=True)
    ckptr.wait_until_finished()
    (out_dir / "config.json").write_text(json.dumps(out_cfg, indent=2))
    logger.info(
        "Converted %s → %s (%s layout); optimizer state dropped "
        "(eval/serve/warm-start only)", ckpt, out_dir / "last", args.to,
    )


if __name__ == "__main__":
    main()
