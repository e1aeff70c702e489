"""Build an in-domain n-gram LM from normalized transcripts.

Reference surface parity (``src/decoding/build_char_lm.py``): filters the
manifest (default voiced train+val), writes a normalized-transcript corpus
next to the output, then trains a 5-gram ARPA. The reference shells out to
KenLM's ``lmplz``; here the estimator is the native interpolated Kneser–Ney
trainer (:func:`ssd_tpu.decoding.lm.train_ngram`) with an optional
``--use-kenlm`` escape hatch when ``lmplz`` is on PATH.
"""

from __future__ import annotations

import argparse
import logging
import shutil
import subprocess
from pathlib import Path
from typing import List, Sequence

from ssd_tpu.data.index_dataset import load_index
from ssd_tpu.data.text_normalizer import normalize_transcript

logger = logging.getLogger(__name__)


def collect_transcripts(
    index_path: Path, splits: Sequence[str], subsets: Sequence[str] | None
) -> List[str]:
    df = load_index(index_path)
    df = df[df["split"].isin(list(splits))].reset_index(drop=True)
    if subsets and "subset" in df.columns:
        df = df[df["subset"].isin(list(subsets))].reset_index(drop=True)
    out = [normalize_transcript(t) for t in df["transcript"].tolist()]
    return [t for t in out if t]


def write_corpus(lines: Sequence[str], path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines) + "\n")


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", type=Path, default=Path("results/index.parquet"))
    p.add_argument("--splits", nargs="+", default=["voiced_parallel_data"])
    p.add_argument("--subsets", nargs="+", default=["train", "val"])
    p.add_argument("--order", type=int, default=5)
    p.add_argument("--output", type=Path, default=Path("results/lm/char_5gram.arpa"))
    p.add_argument(
        "--skip-kenlm",
        action="store_true",
        help="Only write the corpus; do not train an LM (reference flag).",
    )
    p.add_argument(
        "--use-kenlm",
        action="store_true",
        help="Train with KenLM lmplz if available instead of the native trainer.",
    )
    return p.parse_args()


def main() -> None:
    from ssd_tpu.utils.config import setup_cli_logging

    setup_cli_logging()
    args = _parse_args()
    transcripts = collect_transcripts(args.index, args.splits, args.subsets)
    if not transcripts:
        raise ValueError("No transcripts after filtering; check splits/subsets.")

    corpus_path = args.output.with_suffix(".txt")
    write_corpus(transcripts, corpus_path)
    logger.info("Wrote %d normalized lines to %s", len(transcripts), corpus_path)

    if args.skip_kenlm:
        logger.info("Skipping LM training (--skip-kenlm).")
        return

    args.output.parent.mkdir(parents=True, exist_ok=True)
    if args.use_kenlm and shutil.which("lmplz"):
        subprocess.run(
            ["lmplz", "-o", str(args.order), "--text", str(corpus_path), "--arpa", str(args.output)],
            check=True,
        )
    else:
        from ssd_tpu.decoding.lm import train_ngram

        lm = train_ngram(transcripts, order=args.order)
        lm.to_arpa(args.output)
    logger.info("ARPA LM saved to %s", args.output)


if __name__ == "__main__":
    main()
