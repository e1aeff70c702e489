"""Combined student model: encoder + projection head + CTC head.

One flax module bundling the three reference modules that
``src/training/train.py:56-84`` builds separately — a single parameter tree
keeps optimizer state, checkpointing, and sharding annotations simple.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ssd_tpu.models.conformer import EMGConformerEncoder, EncoderConfig
from ssd_tpu.models.heads import CTCHead, ProjectionHead


class SSDModel(nn.Module):
    encoder_cfg: EncoderConfig
    projection_dim: int
    vocab_size: int
    ctc_dropout: float = 0.1

    @nn.compact
    def __call__(
        self, emg: jnp.ndarray, lengths: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (log_probs (B,T',V), out_lengths (B,), student_repr (B,T',P))."""
        enc, out_lengths = EMGConformerEncoder(self.encoder_cfg, name="encoder")(
            emg, lengths, train=train
        )
        student = ProjectionHead(
            self.projection_dim,
            dropout=self.encoder_cfg.dropout,
            dtype=self.encoder_cfg.dtype,
            name="projection",
        )(enc, train=train)
        log_probs = CTCHead(
            self.vocab_size,
            dropout=self.ctc_dropout,
            dtype=self.encoder_cfg.dtype,
            name="ctc_head",
        )(enc, train=train)
        return log_probs, out_lengths, student


def build_model(cfg: Dict[str, Any], input_dim: int, vocab_size: int) -> SSDModel:
    """Construct from the reference YAML config schema (``train.py:56-83``)."""
    enc = cfg["model"]["encoder"]
    encoder_cfg = EncoderConfig(
        input_dim=input_dim,
        d_model=enc["d_model"],
        num_layers=enc["num_layers"],
        num_heads=enc["num_heads"],
        ffn_dim=enc["ffn_dim"],
        depthwise_conv_kernel_size=enc["depthwise_conv_kernel_size"],
        dropout=enc.get("dropout", 0.1),
        subsample_factor=enc.get("subsample_factor", 4),
        conv_norm=enc.get("conv_norm", "batch"),
        compute_dtype=enc.get("compute_dtype", "float32"),
        remat=enc.get("remat", False),
        remat_policy=enc.get("remat_policy", "full"),
        attn_remat=enc.get("attn_remat", False),
        attention_impl=enc.get("attention_impl", "flax"),
        depthwise_impl=enc.get("depthwise_impl", "lax"),
        quantize=enc.get("quantize", "none"),
        sequence_parallel=enc.get("sequence_parallel", False),
        scan_layers=enc.get("scan_layers", False),
        pipeline_microbatches=int(enc.get("pipeline_microbatches", 0)),
    )
    if encoder_cfg.remat_policy not in ("full", "dots", "dots_no_batch"):
        raise ValueError(
            f"model.encoder.remat_policy must be 'full', 'dots', or "
            f"'dots_no_batch', got {encoder_cfg.remat_policy!r}"
        )
    if encoder_cfg.quantize not in ("none", "int8", "int8_prequant"):
        raise ValueError(
            f"model.encoder.quantize must be 'none', 'int8', or "
            f"'int8_prequant', got {encoder_cfg.quantize!r}"
        )
    from ssd_tpu.parallel.pipeline import validate_pipeline_config

    validate_pipeline_config(encoder_cfg)
    return SSDModel(
        encoder_cfg=encoder_cfg,
        projection_dim=cfg["model"]["projection_dim"],
        vocab_size=vocab_size,
        ctc_dropout=cfg["model"].get("ctc_dropout", 0.1),
    )
