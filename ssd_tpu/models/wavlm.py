"""Flax WavLM port — the frozen distillation teacher.

TPU-native rebuild of the teacher path (reference
``src/data/preprocessing.py:126-198`` and ``src/models/teacher.py``, which
load HF ``microsoft/wavlm-base-plus`` in torch). This is a from-scratch flax
implementation of the WavLM *inference* graph (the teacher is always frozen
and in eval mode, so dropout/layerdrop/spec-masking paths are omitted):

* 7-layer strided conv feature encoder (group-norm on layer 0, GELU),
* feature projection (LayerNorm → Dense 512→768),
* grouped positional conv embedding (kernel 128, 16 groups, weight-normed —
  folded into a plain conv at weight-conversion time), same-pad trim, GELU,
* 12 post-LN transformer layers with WavLM's **gated relative position
  bias**: T5-style log-bucketed relative positions (320 buckets, max
  distance 800) embedded per head in layer 0, shared down the stack, and
  gated per layer by a sigmoid function of the per-head hidden states.

``hidden_states[i]`` indexing matches HF exactly (index 0 = pre-layer-0
embeddings, index L = after layer L−1), so ``layer=9`` selects the same
tensor the reference cached. Parity is golden-tested against the torch
implementation with random weights in ``tests/test_wavlm.py``.

Weight conversion reads a torch state dict (from safetensors or an HF
checkout) and remaps to this module's parameter tree — no torch at runtime.
"""

from __future__ import annotations


import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class WavLMConfig:
    """Defaults = microsoft/wavlm-base-plus."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    do_normalize: bool = True  # waveform zero-mean/unit-var (HF processor)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def output_length(self, n_samples: int) -> int:
        out = n_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            out = (out - k) // s + 1
        return out


# --------------------------------------------------------------------------
# Relative position buckets (T5-style, bidirectional)
# --------------------------------------------------------------------------


def relative_position_buckets(
    q_len: int, k_len: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """(q_len, k_len) int32 bucket ids; matches WavLM `_relative_positions_bucket`."""
    context = np.arange(q_len)[:, None]
    memory = np.arange(k_len)[None, :]
    rel = memory - context

    half = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * half
    rel_abs = np.abs(rel)

    max_exact = half // 2
    is_small = rel_abs < max_exact
    with np.errstate(divide="ignore"):
        large = np.log(np.maximum(rel_abs, 1) / max_exact) / np.log(max_distance / max_exact)
    large = (max_exact + large * (half - max_exact)).astype(np.int64)
    large = np.minimum(large, half - 1)

    buckets += np.where(is_small, rel_abs, large)
    return buckets.astype(np.int32)


# --------------------------------------------------------------------------
# Modules
# --------------------------------------------------------------------------


def conv_output_lengths(cfg: WavLMConfig, n_samples):
    """Valid frame counts through the conv pyramid (HF `_get_feat_extract_
    output_lengths`): L → (L − k)//s + 1 per layer. Works on ints, numpy,
    or traced jnp arrays."""
    L = n_samples
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        L = (L - k) // s + 1
    return L


class _MaskedChannelNorm(nn.Module):
    """GroupNorm with num_groups == channels (per-channel stats over time),
    extended with per-sample valid-length masking so a zero-padded batch
    reproduces the unpadded statistics exactly. Same param names/shapes as
    ``nn.GroupNorm`` (scale, bias) — checkpoint/conversion compatible."""

    dim: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid=None) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        if valid is None:
            mean = x.mean(axis=1, keepdims=True)
            mean_sq = (x * x).mean(axis=1, keepdims=True)
        else:
            mask = (jnp.arange(x.shape[1])[None, :] < valid[:, None])[..., None]
            n = jnp.maximum(valid, 1).astype(x.dtype)[:, None, None]
            xm = jnp.where(mask, x, 0.0)
            mean = xm.sum(axis=1, keepdims=True) / n
            mean_sq = (xm * xm).sum(axis=1, keepdims=True) / n
        var = mean_sq - mean * mean
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class FeatureEncoder(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_samples=None) -> jnp.ndarray:
        """(B, L) waveform → (B, T, conv_dim[-1]) features.

        ``n_samples`` (B,) enables the padded-batch path: the layer-0
        channel norm computes its over-time statistics on valid frames
        only, so frames whose receptive field lies inside the true length
        are bit-identical to an unpadded forward (padding only ever feeds
        frames BEYOND each sample's valid count — VALID conv arithmetic)."""
        c = self.cfg
        x = x[:, :, None]  # (B, L, 1)
        valid = n_samples
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            x = nn.Conv(
                features=dim,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=c.conv_bias,
                name=f"conv_{i}",
            )(x)
            if valid is not None:
                valid = (valid - k) // s + 1
            if i == 0:
                # per-channel group norm over time (num_groups == channels)
                x = _MaskedChannelNorm(dim, name="group_norm")(x, valid)
            x = nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        pad = c.num_conv_pos_embeddings // 2
        out = nn.Conv(
            features=c.hidden_size,
            kernel_size=(c.num_conv_pos_embeddings,),
            padding=[(pad, pad)],
            feature_group_count=c.num_conv_pos_embedding_groups,
            name="conv",
        )(x)
        if c.num_conv_pos_embeddings % 2 == 0:
            out = out[:, :-1]  # same-pad trim
        return nn.gelu(out, approximate=False)


class GatedRelPosAttention(nn.Module):
    """WavLM self-attention with gated relative position bias (eval mode)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        position_bias: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        c = self.cfg
        B, T, D = x.shape
        H, hd = c.num_attention_heads, c.head_dim

        q = nn.Dense(D, name="q_proj")(x).reshape(B, T, H, hd)
        k = nn.Dense(D, name="k_proj")(x).reshape(B, T, H, hd)
        v = nn.Dense(D, name="v_proj")(x).reshape(B, T, H, hd)

        # --- gate: sigmoid projections of the per-head hidden states
        gru_const = self.param("gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1))
        gated_hidden = x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # (B,H,T,hd)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(gated_hidden)
        proj = proj.reshape(B, H, T, 2, 4).sum(-1)  # (B,H,T,2)
        gate = jax.nn.sigmoid(proj)
        gate_a, gate_b = gate[..., 0:1], gate[..., 1:2]  # (B,H,T,1)
        gate_output = gate_a * (gate_b * gru_const - 1.0) + 2.0  # (B,H,T,1)
        gated_bias = gate_output * position_bias[None]  # (B,H,T,T)

        scale = hd**-0.5
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k) + gated_bias
        if pad_mask is not None:
            scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (do_stable_layer_norm=False, base models)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x, position_bias, pad_mask):
        c = self.cfg
        attn = GatedRelPosAttention(c, name="attention")(x, position_bias, pad_mask)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x + attn)
        ff = nn.Dense(c.intermediate_size, name="intermediate_dense")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(c.hidden_size, name="output_dense")(ff)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x + ff)


class FlaxWavLM(nn.Module):
    """Full WavLM inference graph; returns all hidden states (HF indexing)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(
        self, input_values: jnp.ndarray, n_samples: Optional[jnp.ndarray] = None
    ) -> List[jnp.ndarray]:
        """``n_samples`` (B,) valid sample counts enable the padded-batch
        path (offline teacher featurization at TPU-friendly static shapes):
        masked layer-0 norm, zeroed frames ahead of the positional conv
        (reproducing its same-padding zeros at each sample's true edge),
        and key-masked attention. Valid output frames — the first
        ``conv_output_lengths(cfg, n_samples)`` per sample — match the
        unpadded forward to fp-reassociation tolerance."""
        c = self.cfg
        feats = FeatureEncoder(c, name="feature_extractor")(input_values, n_samples)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="feature_projection_ln")(feats)
        x = nn.Dense(c.hidden_size, name="feature_projection")(x)

        pad_mask = None
        if n_samples is not None:
            n_frames = conv_output_lengths(c, n_samples)
            pad_mask = jnp.arange(x.shape[1])[None, :] < n_frames[:, None]
            # the unpadded forward's same-pad conv sees zeros beyond the
            # edge; zeroing invalid frames reproduces that exactly
            x = jnp.where(pad_mask[:, :, None], x, 0.0)

        pos = PositionalConvEmbedding(c, name="pos_conv_embed")(x)
        x = x + pos
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_ln")(x)

        T = x.shape[1]
        buckets = jnp.asarray(
            relative_position_buckets(T, T, c.num_buckets, c.max_bucket_distance)
        )
        rel_embed = self.param(
            "rel_attn_embed",
            nn.initializers.normal(0.02),
            (c.num_buckets, c.num_attention_heads),
        )
        position_bias = jnp.transpose(rel_embed[buckets], (2, 0, 1))  # (H,T,T)

        hidden_states = [x]
        for i in range(c.num_hidden_layers):
            x = EncoderLayer(c, name=f"layer_{i}")(x, position_bias, pad_mask)
            hidden_states.append(x)
        return hidden_states


# --------------------------------------------------------------------------
# Torch weight conversion
# --------------------------------------------------------------------------


def _t(w) -> np.ndarray:
    return np.asarray(w)


def convert_torch_state_dict(state: Dict[str, "np.ndarray"], cfg: WavLMConfig) -> Dict:
    """Map an HF ``WavLMModel`` state dict onto the FlaxWavLM param tree.

    Accepts numpy-valued dicts (e.g. loaded from safetensors). The
    weight-normed positional conv is folded into a plain conv kernel.
    """

    def get(name):
        if name in state:
            return _t(state[name])
        raise KeyError(name)

    p: Dict = {}

    # feature extractor convs
    fe: Dict = {}
    for i in range(len(cfg.conv_dim)):
        kernel = get(f"feature_extractor.conv_layers.{i}.conv.weight")  # (out,in,k)
        layer = {"kernel": kernel.transpose(2, 1, 0)}
        if cfg.conv_bias:
            layer["bias"] = get(f"feature_extractor.conv_layers.{i}.conv.bias")
        fe[f"conv_{i}"] = layer
    fe["group_norm"] = {
        "scale": get("feature_extractor.conv_layers.0.layer_norm.weight"),
        "bias": get("feature_extractor.conv_layers.0.layer_norm.bias"),
    }
    p["feature_extractor"] = fe

    p["feature_projection_ln"] = {
        "scale": get("feature_projection.layer_norm.weight"),
        "bias": get("feature_projection.layer_norm.bias"),
    }
    p["feature_projection"] = {
        "kernel": get("feature_projection.projection.weight").T,
        "bias": get("feature_projection.projection.bias"),
    }

    # weight-normed positional conv → plain conv (weight = g · v/‖v‖, dim=2)
    def _pos_conv_weight():
        for g_name, v_name in (
            ("encoder.pos_conv_embed.conv.weight_g", "encoder.pos_conv_embed.conv.weight_v"),
            (
                "encoder.pos_conv_embed.conv.parametrizations.weight.original0",
                "encoder.pos_conv_embed.conv.parametrizations.weight.original1",
            ),
        ):
            if g_name in state:
                g, v = _t(state[g_name]), _t(state[v_name])
                norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
                return g * v / np.maximum(norm, 1e-12)
        return get("encoder.pos_conv_embed.conv.weight")

    p["pos_conv_embed"] = {
        "conv": {
            "kernel": _pos_conv_weight().transpose(2, 1, 0),
            "bias": get("encoder.pos_conv_embed.conv.bias"),
        }
    }
    p["encoder_ln"] = {
        "scale": get("encoder.layer_norm.weight"),
        "bias": get("encoder.layer_norm.bias"),
    }
    p["rel_attn_embed"] = get("encoder.layers.0.attention.rel_attn_embed.weight")

    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        layer = {
            "attention": {
                "q_proj": {
                    "kernel": get(f"{pre}.attention.q_proj.weight").T,
                    "bias": get(f"{pre}.attention.q_proj.bias"),
                },
                "k_proj": {
                    "kernel": get(f"{pre}.attention.k_proj.weight").T,
                    "bias": get(f"{pre}.attention.k_proj.bias"),
                },
                "v_proj": {
                    "kernel": get(f"{pre}.attention.v_proj.weight").T,
                    "bias": get(f"{pre}.attention.v_proj.bias"),
                },
                "out_proj": {
                    "kernel": get(f"{pre}.attention.out_proj.weight").T,
                    "bias": get(f"{pre}.attention.out_proj.bias"),
                },
                "gru_rel_pos_linear": {
                    "kernel": get(f"{pre}.attention.gru_rel_pos_linear.weight").T,
                    "bias": get(f"{pre}.attention.gru_rel_pos_linear.bias"),
                },
                "gru_rel_pos_const": get(f"{pre}.attention.gru_rel_pos_const"),
            },
            "layer_norm": {
                "scale": get(f"{pre}.layer_norm.weight"),
                "bias": get(f"{pre}.layer_norm.bias"),
            },
            "intermediate_dense": {
                "kernel": get(f"{pre}.feed_forward.intermediate_dense.weight").T,
                "bias": get(f"{pre}.feed_forward.intermediate_dense.bias"),
            },
            "output_dense": {
                "kernel": get(f"{pre}.feed_forward.output_dense.weight").T,
                "bias": get(f"{pre}.feed_forward.output_dense.bias"),
            },
            "final_layer_norm": {
                "scale": get(f"{pre}.final_layer_norm.weight"),
                "bias": get(f"{pre}.final_layer_norm.bias"),
            },
        }
        p[f"layer_{i}"] = layer

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), p)


# --------------------------------------------------------------------------
# Teacher wrapper
# --------------------------------------------------------------------------


class WavLMTeacher:
    """Frozen WavLM feature extractor: waveform → layer-``layer`` states.

    API-equivalent to the reference's ``FrozenWavLM`` (``teacher.py:19-56``)
    plus the offline precompute path; the forward runs jitted on TPU.
    """

    def __init__(self, cfg: WavLMConfig, params, layer: int = 9):
        self.cfg = cfg
        self.layer = layer
        self.model = FlaxWavLM(cfg)
        self.params = params
        self._forward = jax.jit(
            lambda p, w: self.model.apply({"params": p}, w)[self.layer]
        )
        self._forward_batch = jax.jit(
            lambda p, w, n: self.model.apply({"params": p}, w, n)[self.layer]
        )

    # -------------------------------------------------------------- loading
    @classmethod
    def from_pretrained(
        cls, model_name_or_path: str, layer: int = 9, cfg: Optional[WavLMConfig] = None
    ) -> "WavLMTeacher":
        """Load from a local safetensors file/dir or the HF cache."""
        cfg = cfg or WavLMConfig()
        path = Path(model_name_or_path)
        state = None
        if path.is_file() and path.suffix == ".safetensors":
            state = _load_safetensors(path)
        elif path.is_dir():
            candidates = sorted(path.glob("*.safetensors"))
            if candidates:
                state = _load_safetensors(candidates[0])
        if state is None:
            state = _load_from_hf(model_name_or_path)
        state = {k.removeprefix("wavlm."): v for k, v in state.items()}
        params = convert_torch_state_dict(state, cfg)
        return cls(cfg, params, layer=layer)

    @classmethod
    def from_torch_model(cls, torch_model, layer: int = 9, cfg: Optional[WavLMConfig] = None):
        """Convert an in-memory HF ``WavLMModel`` (used by parity tests)."""
        cfg = cfg or WavLMConfig()
        state = {k: v.detach().cpu().numpy() for k, v in torch_model.state_dict().items()}
        return cls(cfg, convert_torch_state_dict(state, cfg), layer=layer)

    # -------------------------------------------------------------- forward
    def _normalize(self, waveform: np.ndarray) -> np.ndarray:
        if not self.cfg.do_normalize:
            return waveform
        mean = waveform.mean()
        var = waveform.var()
        return (waveform - mean) / np.sqrt(var + 1e-7)

    def extract(self, waveform: np.ndarray) -> np.ndarray:
        """(samples,) float32 mono at 16 kHz → (frames, hidden) float32."""
        w = self._normalize(np.asarray(waveform, np.float32))
        out = self._forward(self.params, jnp.asarray(w[None]))
        return np.asarray(out[0], np.float32)

    def extract_batch(
        self, waveforms: List[np.ndarray], sample_bucket: int = 16000
    ) -> List[np.ndarray]:
        """Batched, padded extraction at TPU-friendly static shapes.

        Waveforms are normalized individually (HF-processor semantics),
        zero-padded to the batch max rounded up to ``sample_bucket``
        (default 1 s at 16 kHz — executables are cached per (B, L_pad)
        bucket, so a corpus compiles a handful of graphs instead of one per
        unique length), and run through the masked forward. Returns each
        utterance's valid (frames_i, hidden) slice; matches per-utterance
        :meth:`extract` to fp tolerance (``tests/test_wavlm.py``)."""
        if not waveforms:
            return []
        ws = [self._normalize(np.asarray(w, np.float32)) for w in waveforms]
        n = np.asarray([w.shape[0] for w in ws], np.int32)
        L_pad = max(
            sample_bucket,
            ((int(n.max()) + sample_bucket - 1) // sample_bucket) * sample_bucket,
        )
        batch = np.zeros((len(ws), L_pad), np.float32)
        for i, w in enumerate(ws):
            batch[i, : w.shape[0]] = w
        out = self._forward_batch(self.params, jnp.asarray(batch), jnp.asarray(n))
        frames = conv_output_lengths(self.cfg, n)
        # ONE device→host transfer of the batch-max slice (callers feed
        # length-sorted batches, so batch-max ≈ every row's frame count);
        # per-utterance slice fetches measured SLOWER on a high-latency
        # link (16 round-trips beat ~30% fewer bytes — docs/PERF.md)
        out_np = np.asarray(out[:, : int(frames.max())], np.float32)
        return [out_np[i, : int(frames[i])] for i in range(len(ws))]


def _load_safetensors(path: Path) -> Dict[str, np.ndarray]:
    try:
        from safetensors.numpy import load_file

        return load_file(str(path))
    except ImportError:
        from safetensors import safe_open  # type: ignore

        out = {}
        with safe_open(str(path), framework="np") as f:  # pragma: no cover
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out


def _load_from_hf(model_name: str) -> Dict[str, np.ndarray]:
    """Resolve weights via the local HF cache (no network in this stack)."""
    try:
        from huggingface_hub import snapshot_download

        local = snapshot_download(model_name, allow_patterns=["*.safetensors"], local_files_only=True)
        candidates = sorted(Path(local).glob("*.safetensors"))
        if candidates:
            return _load_safetensors(candidates[0])
    except Exception as exc:
        raise FileNotFoundError(
            f"Could not resolve WavLM weights for {model_name!r}: {exc}. "
            "Provide a local safetensors path (offline environment)."
        ) from exc
    raise FileNotFoundError(f"No safetensors found for {model_name!r}")
