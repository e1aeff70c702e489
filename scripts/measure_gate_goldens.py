"""Measure the accuracy-gate corpus metrics to pin as goldens.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo python scripts/measure_gate_goldens.py

Reproduces tests/test_accuracy_gates.py's exact fixtures (same seeds, same
training budget) and prints every metric the gates assert, so the measured
values can be pinned as goldens with tolerance (VERDICT r4 weak #6: ceilings
at ~2× the observed values let a quality halving pass silently).
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from helpers import make_separable_setup  # noqa: E402

from ssd_tpu.decoding.ctc import build_decoder  # noqa: E402
from ssd_tpu.decoding.lm import train_ngram  # noqa: E402
from ssd_tpu.evaluation.evaluate import evaluate_checkpoint  # noqa: E402
from ssd_tpu.training.train import train_from_config  # noqa: E402


def _eval(cfg, vocab, run_dir, decoder_fn, splits=("voiced_parallel_data",)):
    out = evaluate_checkpoint(
        run_dir / "best", cfg, vocab,
        splits=list(splits), subsets=["val"],
        decoder_fn=decoder_fn, batch_size=4,
    )
    return out["metrics"]


def main() -> None:
    results = {}
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        cfg, vocab, root, texts, _ = make_separable_setup(
            tmp / "v", n_train=28, n_val=8, noise=1.5, seed=2,
            words_per_utt=(3, 6), max_epochs=14,
        )
        (tmp / "v").mkdir(exist_ok=True)
        run_dir = root / "run"
        train_from_config(cfg, run_dir)
        lm = train_ngram(texts[:28], order=4)
        arpa = root / "char_lm.arpa"
        lm.to_arpa(arpa)

        for name, dec in (
            ("greedy", build_decoder("greedy", vocab)),
            ("beam", build_decoder("beam", vocab, beam_width=16,
                                   beam_prune_logp=-10.0)),
            ("beam_lm", build_decoder("beam", vocab, lm_path=arpa,
                                      beam_width=16, alpha=0.5, beta=0.05,
                                      beam_prune_logp=-10.0)),
            ("beam_topk16", build_decoder("beam", vocab, beam_width=16,
                                          beam_prune_logp=-10.0,
                                          token_top_k=16)),
        ):
            m = _eval(cfg, vocab, run_dir, dec)
            results[name] = {"cer": round(m["cer"], 4), "wer": round(m["wer"], 4)}
            print(json.dumps({name: results[name]}), flush=True)

        # silent fine-tune fixture (same seeds as the gate)
        s_cfg, s_vocab, _, _, _ = make_separable_setup(
            tmp / "s", n_train=24, n_val=8, noise=1.8, seed=5,
            words_per_utt=(3, 6), max_epochs=14, split="silent_parallel_data",
        )
        run_ft = tmp / "s" / "run_ft"
        train_from_config(s_cfg, run_ft, init_checkpoint=run_dir / "best")
        dec = build_decoder("greedy", s_vocab)
        ft = _eval(s_cfg, s_vocab, run_ft, dec, splits=("silent_parallel_data",))
        zero = evaluate_checkpoint(
            run_dir / "best", s_cfg, s_vocab,
            splits=["silent_parallel_data"], subsets=["val"],
            decoder_fn=dec, batch_size=4,
        )["metrics"]
        results["silent_finetune"] = {"cer": round(ft["cer"], 4),
                                      "wer": round(ft["wer"], 4)}
        results["silent_zero_shot"] = {"cer": round(zero["cer"], 4)}

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
