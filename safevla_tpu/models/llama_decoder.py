"""LLaMA-style causal decoder with an explicit functional KV cache.

Architecture parity with the reference's vendored decoder
(reference: training/online/third_party_models/llama/model.py): RMSNorm
(eps=1e-5) -> attention -> residual -> RMSNorm -> SwiGLU FFN -> residual,
final RMSNorm + a bias-free output projection back to `dim`
(the reference sets vocab_size == dim, model.py:222-229 & 437). As in the
reference forward pass, NO rotary embedding is applied (the rotary helpers
exist there but are unused; temporal information enters via a sinusoidal
time encoding added to the inputs upstream).

TPU-native differences:
  * The mutable `cache_k/cache_v` buffers + `time_step_counter` + the
    `sampler_select` cache-row surgery (model.py:224-247,241-247) become a
    carried pytree: `(params, cache, x, pos, mask) -> (y, cache)`. Sampler
    pause/resume reindexing is a pure gather on the cache arrays.
  * Attention runs as one fused XLA dot-general chain in bf16 with f32
    softmax accumulation; full-sequence and single-step decode share weights
    but use separate specialized jitted paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class DecoderConfig:
    dim: int = 512
    n_layers: int = 3
    n_heads: int = 8
    multiple_of: int = 256
    norm_eps: float = 1e-5
    max_seq_len: int = 500
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def ffn_hidden(self) -> int:
        # SwiGLU sizing (reference model.py:348-353): 4*dim -> 2/3 -> round up
        # to a multiple of `multiple_of`.
        hidden = int(2 * (4 * self.dim) / 3)
        return self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (normed.astype(x.dtype)) * weight.astype(x.dtype)


def _attend(q, k, v, mask, dtype):
    """q: (B, Tq, H, Dh), k/v: (B, Tk, H, Dh), mask: (B, 1, Tq, Tk) bool or None."""
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(head_dim).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(dtype)


class Attention(nn.Module):
    cfg: DecoderConfig

    def setup(self):
        d = self.cfg.dim
        self.wq = nn.Dense(d, use_bias=False, dtype=self.cfg.dtype, name="wq")
        self.wk = nn.Dense(d, use_bias=False, dtype=self.cfg.dtype, name="wk")
        self.wv = nn.Dense(d, use_bias=False, dtype=self.cfg.dtype, name="wv")
        self.wo = nn.Dense(d, use_bias=False, dtype=self.cfg.dtype, name="wo")

    def _qkv(self, x):
        b, t, _ = x.shape
        h, dh = self.cfg.n_heads, self.cfg.head_dim
        q = self.wq(x).reshape(b, t, h, dh)
        k = self.wk(x).reshape(b, t, h, dh)
        v = self.wv(x).reshape(b, t, h, dh)
        return q, k, v

    def full(self, x, mask):
        q, k, v = self._qkv(x)
        out = _attend(q, k, v, mask, self.cfg.dtype)
        b, t = x.shape[:2]
        return self.wo(out.reshape(b, t, self.cfg.dim))

    def step(self, x, cache_k, cache_v, pos, mask):
        """x: (B, 1, D); cache_k/v: (B, S, H, Dh); pos: scalar int32.

        Returns (y, new_cache_k, new_cache_v).
        """
        q, k, v = self._qkv(x)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k.astype(cache_k.dtype), pos, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v.astype(cache_v.dtype), pos, axis=1)
        out = _attend(q, cache_k.astype(q.dtype), cache_v.astype(q.dtype), mask, self.cfg.dtype)
        b = x.shape[0]
        return self.wo(out.reshape(b, 1, self.cfg.dim)), cache_k, cache_v


class FeedForward(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x):
        hidden = self.cfg.ffn_hidden
        w1 = nn.Dense(hidden, use_bias=False, dtype=self.cfg.dtype, name="w1")
        w2 = nn.Dense(self.cfg.dim, use_bias=False, dtype=self.cfg.dtype, name="w2")
        w3 = nn.Dense(hidden, use_bias=False, dtype=self.cfg.dtype, name="w3")
        return w2(nn.silu(w1(x)) * w3(x))


class DecoderBlock(nn.Module):
    """One decoder block, written as an `nn.scan` body: carry is the hidden
    state, the scanned input is this layer's KV-cache slice (or None on the
    full-sequence path), the scanned output is the updated slice. Running the
    layer stack as ONE scan module keeps all layers' params in depth-stacked
    leaves (9 leaves instead of 9 * n_layers) — per-dispatch argument
    marshaling in the rollout hot loop scales with leaf count over the axon
    tunnel (see models/vit.py ViTBlock for the same treatment)."""

    cfg: DecoderConfig

    def setup(self):
        self.attention = Attention(self.cfg)
        self.feed_forward = FeedForward(self.cfg, name="feed_forward")
        self.attention_norm = RMSNorm(self.cfg.dim, self.cfg.norm_eps)
        self.ffn_norm = RMSNorm(self.cfg.dim, self.cfg.norm_eps)

    def __call__(self, x, cache, pos, mask):
        if cache is None:  # full-sequence path (static branch at trace time)
            h = x + self.attention.full(self.attention_norm(x), mask)
            return h + self.feed_forward(self.ffn_norm(h)), None
        a, ck, cv = self.attention.step(
            self.attention_norm(x), cache[0], cache[1], pos, mask
        )
        h = x + a
        return h + self.feed_forward(self.ffn_norm(h)), (ck, cv)


def _scanned_blocks(cfg: DecoderConfig):
    """The layer stack as one scan module with depth-stacked param leaves.
    Lowering is platform-defaulted (unrolled on TPU, rolled scan on CPU);
    SAFEVLA_TOWER_UNROLL overrides — identical param tree either way
    (models/scan_policy.py)."""
    from safevla_tpu.models.scan_policy import stack_unroll

    unroll = stack_unroll(cfg.n_layers, "SAFEVLA_TOWER_UNROLL")
    return nn.scan(
        DecoderBlock,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(0, nn.broadcast, nn.broadcast),
        out_axes=0,
        length=cfg.n_layers,
        unroll=unroll,
    )(cfg, name="layers")


class LlamaDecoder(nn.Module):
    """Full-sequence and incremental decode over the same weights.

    Call with method="full": (x (B,T,D), mask (B,1,T,T) bool) -> (B,T,D) f32.
    Call with method="step": (x (B,1,D), cache {k,v: (L,B,S,H,Dh)}, pos, mask
    (B,1,1,S) bool) -> ((B,1,D) f32, new cache).
    """

    cfg: DecoderConfig

    def setup(self):
        self.layers = _scanned_blocks(self.cfg)
        self.norm = RMSNorm(self.cfg.dim, self.cfg.norm_eps)
        # bias-free projection back to dim (reference vocab_size == dim)
        self.output = nn.Dense(self.cfg.dim, use_bias=False, dtype=self.cfg.dtype, name="output")

    def full(self, x, mask):
        h = x.astype(self.cfg.dtype)
        h, _ = self.layers(h, None, None, mask)
        h = self.norm(h)
        return self.output(h).astype(jnp.float32)

    def step(self, x, cache, pos, mask):
        h = x.astype(self.cfg.dtype)
        h, (new_k, new_v) = self.layers(h, (cache["k"], cache["v"]), pos, mask)
        h = self.norm(h)
        out = self.output(h).astype(jnp.float32)
        return out, {"k": new_k, "v": new_v}

    def __call__(self, x, mask):
        # default path (used for init)
        return self.full(x, mask)


def init_kv_cache(
    cfg: DecoderConfig, batch: int, dtype: Optional[jnp.dtype] = None
) -> dict:
    """Zeroed cache pytree {k, v: (L, B, S, H, Dh)}."""
    shape = (cfg.n_layers, batch, cfg.max_seq_len, cfg.n_heads, cfg.head_dim)
    dt = dtype or cfg.dtype
    return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}


def gather_cache(cache: dict, keep: jax.Array) -> dict:
    """Functional replacement for the reference's `sampler_select` cache-row
    surgery (reference model.py:241-247): select sampler rows by index."""
    return {"k": cache["k"][:, keep], "v": cache["v"][:, keep]}
