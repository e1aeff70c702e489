"""Projection (distillation) and CTC heads.

Parity with reference ``src/models/heads.py``: projection = Dropout + Dense to
the teacher dim (768); CTC head = Dropout + Dense to vocab + log-softmax.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ProjectionHead(nn.Module):
    output_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="proj")(x)


class CTCHead(nn.Module):
    vocab_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, D) → (B, T, V) log-probs."""
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.vocab_size, name="fc")(x)
        return jax.nn.log_softmax(logits, axis=-1)
