"""Dataset indexing for the Gaddy & Klein 2020 EMG corpus.

Walks ``data/emg_data/<split>/<session>/*_info.json``, filters unusable rows,
and writes a 12-column manifest (Parquet or JSONL). Behavioral parity with the
reference indexer (``src/data/index_dataset.py``):

* split directory layout (``SPLIT_PATHS``, reference ``:25-31``)
* row filters — missing EMG file, empty transcript, negative ``sentence_index``
  (reference ``:106-113``)
* clean-audio preference ``*_audio_clean.flac`` > ``*_audio.flac``
  (reference ``:72-81``)
* deterministic MD5(utterance_id) % 100 → 80/10/10 train/val/test for both
  voiced and silent parallel splits (reference ``:84-93``). Bit-exact parity
  here is required for CER comparability with the published numbers.
* closed-vocab splits → subset ``closed_vocab``; nonparallel → ``unused``.

CLI: ``python -m ssd_tpu.data.index_dataset --root … --out … [--stats
[--durations]]``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import logging
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

#: logical split name -> directory relative to the dataset root
SPLIT_PATHS: Dict[str, str] = {
    "voiced_parallel_data": "voiced_parallel_data",
    "silent_parallel_data": "silent_parallel_data",
    "closed_vocab_voiced": "closed_vocab/voiced",
    "closed_vocab_silent": "closed_vocab/silent",
    "nonparallel_data": "nonparallel_data",
}

DEFAULT_SPLITS: List[str] = [
    "voiced_parallel_data",
    "silent_parallel_data",
    "closed_vocab_voiced",
    "closed_vocab_silent",
]

EMG_SAMPLE_RATE = 1000  # Hz — used for duration stats only

_PARALLEL_SPLITS = frozenset({"voiced_parallel_data", "silent_parallel_data"})


@dataclass
class IndexEntry:
    """One utterance row of the manifest (schema parity: reference ``:43-58``)."""

    utterance_id: str
    split: str
    subset: str
    speaker: str
    stem: str
    emg_path: str
    audio_path: Optional[str]
    transcript: str
    sentence_index: int
    book: str
    has_audio: bool
    metadata_json: str


def assign_subset(split: str, utterance_id: str) -> str:
    """Deterministic subset assignment.

    Parallel splits hash MD5(utterance_id) into 80/10/10 train/val/test;
    closed-vocab rows become ``closed_vocab``; everything else ``unused``.
    """
    if split in _PARALLEL_SPLITS:
        h = int(hashlib.md5(utterance_id.encode("utf-8")).hexdigest(), 16) % 100
        if h < 80:
            return "train"
        if h < 90:
            return "val"
        return "test"
    if split.startswith("closed_vocab"):
        return "closed_vocab"
    return "unused"


def _preferred_audio(session_dir: Path, stem: str) -> Optional[Path]:
    for suffix in ("_audio_clean.flac", "_audio.flac"):
        candidate = session_dir / f"{stem}{suffix}"
        if candidate.exists():
            return candidate
    return None


def _entry_from_info(info_path: Path, root: Path, split: str) -> Optional[IndexEntry]:
    with info_path.open("r", encoding="utf-8") as f:
        meta = json.load(f)

    transcript = (meta.get("text") or "").strip()
    sentence_index = meta.get("sentence_index", -1)
    if sentence_index is None or sentence_index < 0 or not transcript:
        return None

    stem = info_path.stem
    if stem.endswith("_info"):
        stem = stem[: -len("_info")]
    emg_path = info_path.with_name(f"{stem}_emg.npy")
    if not emg_path.exists():
        logger.warning("No EMG array next to %s; dropping row", info_path)
        return None

    audio_path = _preferred_audio(info_path.parent, stem)
    speaker = info_path.parent.name
    utterance_id = f"{split}/{speaker}/{stem}"

    return IndexEntry(
        utterance_id=utterance_id,
        split=split,
        subset=assign_subset(split, utterance_id),
        speaker=speaker,
        stem=stem,
        emg_path=str(emg_path.relative_to(root)),
        audio_path=str(audio_path.relative_to(root)) if audio_path else None,
        transcript=transcript,
        sentence_index=int(sentence_index),
        book=meta.get("book", ""),
        has_audio=audio_path is not None,
        metadata_json=json.dumps(meta, sort_keys=True),
    )


def build_index(root: Path, splits: Iterable[str]) -> pd.DataFrame:
    """Walk the dataset tree and build the manifest DataFrame."""
    root = Path(root).expanduser().resolve()
    entries: List[IndexEntry] = []
    for split in splits:
        if split not in SPLIT_PATHS:
            raise ValueError(f"Unknown split {split!r}; known: {sorted(SPLIT_PATHS)}")
        split_dir = root / SPLIT_PATHS[split]
        if not split_dir.exists():
            logger.warning("Split directory missing: %s", split_dir)
            continue
        for info_path in sorted(split_dir.rglob("*_info.json")):
            entry = _entry_from_info(info_path, root, split)
            if entry is not None:
                entries.append(entry)

    if not entries:
        logger.error("Indexed zero entries under %s", root)
        return pd.DataFrame()

    df = pd.DataFrame([asdict(e) for e in entries])
    return df.sort_values(["split", "utterance_id"]).reset_index(drop=True)


def save_index(df: pd.DataFrame, out_path: Path) -> None:
    """Write the manifest as Parquet or JSONL depending on extension."""
    out_path = Path(out_path).expanduser()
    out_path.parent.mkdir(parents=True, exist_ok=True)
    suffix = out_path.suffix.lower()
    if suffix == ".parquet":
        df.to_parquet(out_path, index=False)
    elif suffix in {".jsonl", ".json"}:
        df.to_json(out_path, orient="records", lines=True, force_ascii=False)
    else:
        raise ValueError(f"Unsupported index format: {out_path}")
    logger.info("Wrote %d rows to %s", len(df), out_path)


def load_index(index_path: Path) -> pd.DataFrame:
    index_path = Path(index_path).expanduser()
    if not index_path.exists():
        raise FileNotFoundError(f"Index not found: {index_path}")
    suffix = index_path.suffix.lower()
    if suffix == ".parquet":
        return pd.read_parquet(index_path)
    if suffix in {".jsonl", ".json"}:
        return pd.read_json(index_path, orient="records", lines=True)
    raise ValueError(f"Unsupported index format: {index_path}")


def summarize_index(
    df: pd.DataFrame,
    root: Optional[Path] = None,
    include_durations: bool = False,
) -> Dict[str, Dict]:
    """Per-split counts, audio availability, and (optionally) duration stats."""
    summary: Dict[str, Dict] = {}
    root = Path(root).expanduser().resolve() if root else None
    for split, group in df.groupby("split"):
        stats: Dict = {
            "count": int(len(group)),
            "with_audio": int(group["has_audio"].sum()),
            "subset_counts": group["subset"].value_counts().to_dict(),
        }
        if include_durations and root is not None:
            durations: List[float] = []
            for rel in group["emg_path"]:
                p = root / rel
                if not p.exists():
                    logger.warning("EMG file missing during stats: %s", p)
                    continue
                durations.append(np.load(p, mmap_mode="r").shape[0] / EMG_SAMPLE_RATE)
            if durations:
                stats["mean_duration_sec"] = float(np.mean(durations))
                stats["total_hours"] = float(np.sum(durations) / 3600.0)
        summary[str(split)] = stats
    return summary


def _format_summary(summary: Dict[str, Dict]) -> str:
    lines = []
    for split in sorted(summary):
        s = summary[split]
        line = f"{split}: {s['count']} utterances ({s['with_audio']} with audio)"
        if "mean_duration_sec" in s:
            line += (
                f", mean duration {s['mean_duration_sec']:.2f}s,"
                f" total {s['total_hours']:.2f}h"
            )
        lines.append(line)
    return "\n".join(lines)


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", type=Path, help="Dataset root (needed to build).")
    p.add_argument("--out", type=Path, help="Manifest output (.parquet/.jsonl).")
    p.add_argument("--index", type=Path, help="Existing manifest (stats only).")
    p.add_argument(
        "--splits",
        nargs="+",
        default=DEFAULT_SPLITS,
        help=f"Splits to include; choices: {sorted(SPLIT_PATHS)}",
    )
    p.add_argument("--stats", action="store_true", help="Print summary stats.")
    p.add_argument(
        "--durations",
        action="store_true",
        help="With --stats: also compute durations from the EMG arrays.",
    )
    p.add_argument("--overwrite", action="store_true", help="Replace existing output.")
    return p.parse_args()


def main() -> None:
    from ssd_tpu.utils.config import setup_cli_logging

    setup_cli_logging()
    args = _parse_args()

    df: Optional[pd.DataFrame] = None
    if args.out:
        if not args.root:
            raise SystemExit("--root is required when writing an index.")
        out_path = args.out.expanduser()
        if out_path.exists() and not args.overwrite:
            raise SystemExit(f"{out_path} exists; pass --overwrite to replace it.")
        df = build_index(args.root, args.splits)
        if df.empty:
            raise SystemExit("Indexing produced zero entries.")
        save_index(df, out_path)

    if args.stats:
        if df is None:
            if not args.index:
                raise SystemExit("Provide --index or --out with --stats.")
            df = load_index(args.index)
        print(_format_summary(summarize_index(df, args.root, args.durations)))

    if args.out is None and not args.stats:
        raise SystemExit("Nothing to do: pass --out and/or --stats.")


if __name__ == "__main__":
    main()
