"""WER/CER and error-breakdown metrics.

The reference uses jiwer (``src/evaluation/evaluate.py:34-98``); jiwer is not
a dependency here, so edit distances are computed natively with a banded-free
O(N·M) DP that also tracks insertion/deletion/substitution/hit counts (same
tie-breaking as the reference's fallback counter: minimal cost, then maximal
hits — ``evaluate.py:80``).
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _edit_counts_native(ref: List[str], hyp: List[str]) -> Dict[str, int] | None:
    """Native DP kernel (native/edit_distance.cpp); None if unavailable."""
    from ssd_tpu.utils.native import load

    lib = load()
    if lib is None:
        return None
    table: Dict[str, int] = {}
    def ids(tokens: List[str]) -> np.ndarray:
        return np.asarray(
            [table.setdefault(t, len(table)) for t in tokens], dtype=np.int32
        )

    r, h = ids(ref), ids(hyp)
    out = np.zeros(5, dtype=np.int32)
    lib.edit_distance_counts(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(r),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(h),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return {
        "cost": int(out[0]),
        "insertions": int(out[1]),
        "deletions": int(out[2]),
        "substitutions": int(out[3]),
        "hits": int(out[4]),
    }


def _edit_counts(ref: List[str], hyp: List[str]) -> Dict[str, int]:
    native = _edit_counts_native(ref, hyp)
    if native is not None:
        return native
    return _edit_counts_py(ref, hyp)


def _edit_counts_py(ref: List[str], hyp: List[str]) -> Dict[str, int]:
    """(cost, ins, del, sub, hits) DP over token lists; two-row rolling."""
    n, m = len(ref), len(hyp)
    # rows of tuples (cost, -hits, ins, del, sub, hits); compare by (cost, -hits)
    prev: List[Tuple[int, int, int, int, int]] = [
        (j, j, 0, 0, 0) for j in range(m + 1)
    ]  # (cost, ins, del, sub, hits)
    for i in range(1, n + 1):
        cur = [(i, 0, i, 0, 0)] + [None] * m  # type: ignore[list-item]
        ri = ref[i - 1]
        for j in range(1, m + 1):
            ins_c, ins_i, ins_d, ins_s, ins_h = cur[j - 1]
            ins_state = (ins_c + 1, ins_i + 1, ins_d, ins_s, ins_h)
            del_c, del_i, del_d, del_s, del_h = prev[j]
            del_state = (del_c + 1, del_i, del_d + 1, del_s, del_h)
            dia_c, dia_i, dia_d, dia_s, dia_h = prev[j - 1]
            if ri == hyp[j - 1]:
                diag_state = (dia_c, dia_i, dia_d, dia_s, dia_h + 1)
            else:
                diag_state = (dia_c + 1, dia_i, dia_d, dia_s + 1, dia_h)
            cur[j] = min(
                (ins_state, del_state, diag_state), key=lambda t: (t[0], -t[4])
            )
        prev = cur
    c, i, d, s, h = prev[m]
    return {"cost": c, "insertions": i, "deletions": d, "substitutions": s, "hits": h}


def _rate(totals: Dict[str, int]) -> float:
    denom = totals["substitutions"] + totals["deletions"] + totals["hits"]
    return totals["cost"] / max(denom, 1)


def wer(refs: Sequence[str], hyps: Sequence[str]) -> float:
    """Corpus word error rate (jiwer convention: pooled counts)."""
    totals = {"cost": 0, "insertions": 0, "deletions": 0, "substitutions": 0, "hits": 0}
    for r, h in zip(refs, hyps):
        counts = _edit_counts(r.split(), h.split())
        for k in totals:
            totals[k] += counts[k]
    return _rate(totals)


def cer(refs: Sequence[str], hyps: Sequence[str]) -> float:
    """Corpus character error rate (jiwer convention: pooled counts)."""
    totals = {"cost": 0, "insertions": 0, "deletions": 0, "substitutions": 0, "hits": 0}
    for r, h in zip(refs, hyps):
        counts = _edit_counts(list(r), list(h))
        for k in totals:
            totals[k] += counts[k]
    return _rate(totals)


def compute_metrics(refs: Sequence[str], hyps: Sequence[str]) -> Dict[str, float]:
    return {"wer": float(wer(refs, hyps)), "cer": float(cer(refs, hyps))}


def compute_error_breakdown(refs: Sequence[str], hyps: Sequence[str]) -> Dict[str, float]:
    """Word-level ins/del/sub breakdown (reference ``evaluate.py:41-98``)."""
    totals = {"insertions": 0, "deletions": 0, "substitutions": 0, "hits": 0}
    for r, h in zip(refs, hyps):
        counts = _edit_counts(r.split(), h.split())
        for k in totals:
            totals[k] += counts[k]
    total_words = max(1.0, float(totals["substitutions"] + totals["deletions"] + totals["hits"]))
    return {
        "substitutions": float(totals["substitutions"]),
        "deletions": float(totals["deletions"]),
        "insertions": float(totals["insertions"]),
        "hits": float(totals["hits"]),
        "substitution_rate": totals["substitutions"] / total_words,
        "deletion_rate": totals["deletions"] / total_words,
        "insertion_rate": totals["insertions"] / total_words,
    }
