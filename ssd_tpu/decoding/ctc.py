"""Decoder factory: greedy / beam with optional char-LM shallow fusion.

Surface parity with reference ``src/decoding/ctc.py:39-122``: the factory
returns a ``DecoderFn(log_probs, lengths) -> List[str]`` closure; knobs are
``beam_width``, ``alpha`` (LM weight), ``beta`` (word bonus),
``beam_prune_logp`` and ``blank_bias``. The compute runs on device
(:mod:`ssd_tpu.ops.ctc_decode`); only string materialization is host-side.

When an ARPA LM path is given, decoding uses the **on-device** fused beam
search (:mod:`ssd_tpu.decoding.device_lm`): the n-gram packed into a device
hash table, word-history hashes carried per beam in the scan, pyctcdecode
fusion semantics. The host prefix search (:mod:`ssd_tpu.decoding.host_beam`)
is kept as the oracle and is selectable with ``host_lm=True``.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, List, Optional

import numpy as np

import jax.numpy as jnp

from ssd_tpu.data.vocab import Vocab
from ssd_tpu.ops.ctc_decode import beam_search, greedy_decode, traceback

DecoderFn = Callable[[jnp.ndarray, jnp.ndarray], List[str]]


def build_greedy_decoder(vocab: Vocab, blank_bias: float = 0.0) -> DecoderFn:
    def decode(log_probs, lengths) -> List[str]:
        toks, counts = greedy_decode(
            jnp.asarray(log_probs),
            jnp.asarray(lengths),
            blank_id=vocab.blank_id,
            pad_id=vocab.pad_id,
            blank_bias=blank_bias,
        )
        toks = np.asarray(toks)
        counts = np.asarray(counts)
        return [vocab.decode(toks[i, : counts[i]]) for i in range(toks.shape[0])]

    return decode


def build_beam_decoder(
    vocab: Vocab,
    lm_path: Optional[Path] = None,
    beam_width: int = 50,
    alpha: float = 0.6,
    beta: float = 0.0,
    beam_prune_logp: float = -10.0,
    blank_bias: float = 0.0,
    token_min_logp: float = -5.0,
    token_top_k: Optional[int] = None,
    host_lm: bool = False,
) -> DecoderFn:
    lm = None
    lm_table = None
    if lm_path is not None:
        if Path(lm_path).exists():
            if host_lm:
                from ssd_tpu.decoding.lm import NGramLM

                lm = NGramLM.from_arpa(Path(lm_path))
            else:
                # sidecar-cached packed table: ARPA parse+hash+pack once per
                # (file, vocab, format), np.load afterwards
                from ssd_tpu.decoding.device_lm import load_packed_lm

                lm_table = load_packed_lm(Path(lm_path), vocab)
        else:
            # deliberate lenient skip (reference parity: orchestrate grids
            # run before the LM stage exists) — but say so loudly
            logging.getLogger(__name__).warning(
                "LM path %s does not exist — beam decoding WITHOUT LM", lm_path
            )

    def decode(log_probs, lengths) -> List[str]:
        if lm_table is not None:
            from ssd_tpu.decoding.device_lm import beam_decode_lm_device

            return beam_decode_lm_device(
                jnp.asarray(log_probs),
                jnp.asarray(lengths),
                vocab,
                lm_table,
                beam_width=beam_width,
                alpha=alpha,
                beta=beta,
                beam_prune_logp=beam_prune_logp,
                token_min_logp=token_min_logp,
                blank_bias=blank_bias,
                token_top_k=token_top_k,
            )
        if lm is not None:
            from ssd_tpu.decoding.host_beam import beam_search_lm_batch

            return beam_search_lm_batch(
                np.asarray(log_probs),
                np.asarray(lengths),
                vocab,
                lm,
                beam_width=beam_width,
                alpha=alpha,
                beta=beta,
                beam_prune_logp=beam_prune_logp,
                token_min_logp=token_min_logp,
                blank_bias=blank_bias,
            )
        chars, parents, _ = beam_search(
            jnp.asarray(log_probs),
            jnp.asarray(lengths),
            blank_id=vocab.blank_id,
            pad_id=vocab.pad_id,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            blank_bias=blank_bias,
            token_top_k=token_top_k,
        )
        prefixes = traceback(np.asarray(chars), np.asarray(parents), 0)
        return [vocab.decode(p) for p in prefixes]

    return decode


def build_decoder(
    method: str,
    vocab: Vocab,
    lm_path: Optional[Path] = None,
    beam_width: int = 50,
    alpha: float = 0.6,
    beta: float = 0.0,
    beam_prune_logp: float = -10.0,
    blank_bias: float = 0.0,
    token_top_k: Optional[int] = None,
    host_lm: bool = False,
) -> DecoderFn:
    """Reference-surface dispatch (``ctc.py:102-122``) plus ``token_top_k``.

    ``token_top_k`` restricts per-frame extension candidates to the top-k
    tokens — exact whenever ≤k tokens pass the ``token_min_logp`` admission
    (see :func:`ssd_tpu.ops.ctc_decode.beam_search`); the production serving
    and bench path uses 16. None keeps the exact all-token sort. ``host_lm``
    selects the host oracle for LM decoding instead of the device kernel.
    """
    if method.lower() == "beam":
        return build_beam_decoder(
            vocab=vocab,
            lm_path=lm_path,
            beam_width=beam_width,
            alpha=alpha,
            beta=beta,
            beam_prune_logp=beam_prune_logp,
            blank_bias=blank_bias,
            token_top_k=token_top_k,
            host_lm=host_lm,
        )
    return build_greedy_decoder(vocab, blank_bias=blank_bias)
