"""Projection (distillation) and CTC heads.

Parity with reference ``src/models/heads.py``: projection = Dropout + Dense to
the teacher dim (768); CTC head = Dropout + Dense to vocab + log-softmax.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssd_tpu.ops.dropout import FastDropout


class ProjectionHead(nn.Module):
    output_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = FastDropout(self.dropout, deterministic=not train)(x)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(x)
        return out.astype(jnp.float32)  # distillation MSE always in fp32


class CTCHead(nn.Module):
    vocab_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, D) → (B, T, V) log-probs (fp32 — CTC numerics)."""
        x = FastDropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.vocab_size, dtype=self.dtype, name="fc")(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
