"""Fusion transformer over [fusion token, camera patch tokens, text tokens].

Matches the numerics of the reference's `nn.TransformerEncoder(
nn.TransformerEncoderLayer(d_model, nhead, batch_first=True))`
(reference: allenact_dino_transformer.py:545-552): post-layer-norm residual
blocks with a ReLU MLP of width 2048 and a jointly-projected multi-head
attention with biases. Written as one flax module so XLA fuses the token
concat + attention + MLP into a single program.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from safevla_tpu.models.norms import CompatLayerNorm


def _flat_ln_mlp() -> bool:
    """Run each layer's LN+MLP block over (B*T, D) flattened rows.

    MEASURED DEAD END (round 4, kept for the record — default OFF). The
    update's device trace (tools/prof_update_trace.py) showed XLA assigning
    a {3,1,2,0} layout to the (towers, chunk, tokens, D) activations in the
    fwd/bwd graph while the pallas attention custom-calls require row-major
    {3,2,1,0}, hiding (chunk, tokens) transposes inside the LN reduce
    fusions. Hypothesis: flattening (chunk, tokens) into one row axis for
    LN+MLP removes the permutable dim pair. On-chip A/B at the production
    chunk shape (tools/exp_fusion_flat.py, chunk=128 x 3 towers, remat):
    fwd 11.81 -> 13.76 ms, fwd+bwd 34.74 -> 37.18 ms — SLOWER both ways.
    The reshape at the layout boundary materializes the very copy it was
    meant to remove, and XLA keeps the {3,1,2,0} choice for the flat rows'
    producers anyway. Numerics identical (LN and the MLP are per-row).
    """
    return os.environ.get("SAFEVLA_FUSION_FLAT", "0") == "1"


class TorchMultiheadAttention(nn.Module):
    """nn.MultiheadAttention-compatible self-attention (in/out proj with bias)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, key_mask=None, key_lens=None, q_rows=None):
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        # torch packs q/k/v into one (3d, d) in_proj; keep the same layout for
        # checkpoint-compatible conversion.
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        if q_rows is not None:
            # restricted-query attention: only the first q_rows tokens'
            # outputs are needed (the caller discards the rest — see
            # FusionTransformer.cls_rows). Same weights, same math for those
            # rows; skips the q projection for the other tokens, and the
            # (b, q_rows, t) logits are small enough that the XLA path wins.
            from safevla_tpu.ops.flash_attention import attention

            wq = in_proj_w[:d].astype(self.dtype)
            wkv = in_proj_w[d:].astype(self.dtype)
            q = (
                jnp.einsum("btd,ed->bte", x[:, :q_rows], wq)
                + in_proj_b[:d].astype(self.dtype)
            )
            kv = (
                jnp.einsum("btd,ed->bte", x, wkv)
                + in_proj_b[d:].astype(self.dtype)
            )
            k, v = kv[..., :d], kv[..., d:]
            fold = lambda z, n: z.reshape(b, n, h, dh)
            out = attention(
                fold(q, q_rows), fold(k, t), fold(v, t),
                use_pallas=False, key_mask=key_mask, key_lens=key_lens,
            ).reshape(b, q_rows, d).astype(self.dtype)
        else:
            qkv = (
                jnp.einsum("btd,ed->bte", x, in_proj_w.astype(self.dtype))
                + in_proj_b.astype(self.dtype)
            )
            # the [q|k|v] lane layout of torch's in_proj feeds the packed
            # attention entry directly — no split copies around the kernel
            from safevla_tpu.ops.flash_attention import attention_qkv

            out = attention_qkv(
                qkv, h, key_mask=key_mask, key_lens=key_lens
            ).astype(self.dtype)
        out = nn.Dense(d, dtype=self.dtype, name="out_proj")(out)
        return out


class FusionLayer(nn.Module):
    """One post-LN encoder layer, written as an `nn.scan` body (returns
    (x, None)): the first n-1 layers run as ONE scan module with depth-stacked
    param leaves — per-dispatch argument marshaling in the rollout hot loop
    scales with leaf count over the axon tunnel (see models/vit.py ViTBlock).
    The last layer is a separate module because it optionally restricts the
    query rows (q_rows, see FusionTransformer.out_rows)."""

    dim: int
    num_heads: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, key_mask=None, key_lens=None, q_rows=None):
        # post-LN (torch default norm_first=False)
        attn = TorchMultiheadAttention(self.dim, self.num_heads, self.dtype, name="self_attn")(
            x, key_mask, key_lens, q_rows=q_rows
        )
        if q_rows is not None:
            # residual + LN + MLP only for the rows whose outputs are consumed
            x = x[:, :q_rows]
        shape3 = x.shape
        if _flat_ln_mlp():
            # 2-d rows for LN+MLP (see _flat_ln_mlp); reshape back at the end
            x = x.reshape(-1, shape3[-1])
            attn = attn.reshape(-1, shape3[-1])
        x = CompatLayerNorm(out_dtype=self.dtype, name="norm1")(x + attn)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y)
        x = CompatLayerNorm(out_dtype=self.dtype, name="norm2")(x + y)
        return x.reshape(shape3), None


class FusionTransformer(nn.Module):
    dim: int = 512
    num_heads: int = 8
    num_layers: int = 3
    ffn_dim: int = 2048
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, key_mask=None, key_lens=None, out_rows=None):
        """tokens (B, N, D) -> (B, N, D), or (B, out_rows, D) when set.

        Padded text tokens are excluded from every layer's attention softmax.
        The reference pads text dynamically to the longest instruction in the
        (B=1 at eval) batch, so real text tokens never share the softmax with
        pads — masking reproduces that with static shapes. Two forms:
          * key_mask (B, N) bool: arbitrary mask (XLA attention path)
          * key_lens (B,) int32: valid-prefix count — equivalent for
            right-padded text, and keeps the pallas kernel eligible.

        out_rows (static int): when only the first out_rows tokens' outputs
        are consumed (the policy reads just the fused CLS, reference
        allenact_dino_transformer.py:710-717), the LAST layer computes q /
        out-proj / MLP for those rows alone — identical numerics for the
        consumed rows, ~10/12 of the final layer's per-token work skipped for
        the rest (~25% of the encoder's FLOPs at 201 tokens, 3 layers)."""
        x = tokens.astype(self.dtype)
        if self.num_layers > 1:
            # first n-1 layers as one scan module with depth-stacked params
            # (lowering platform-defaulted; SAFEVLA_TOWER_UNROLL overrides —
            # models/scan_policy.py)
            from safevla_tpu.models.scan_policy import stack_unroll

            unroll = stack_unroll(self.num_layers - 1, "SAFEVLA_TOWER_UNROLL")
            blocks = nn.scan(
                FusionLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers - 1,
                unroll=unroll,
            )(self.dim, self.num_heads, self.ffn_dim, self.dtype, name="layers")
            x, _ = blocks(x, key_mask, key_lens)
        x, _ = FusionLayer(
            self.dim, self.num_heads, self.ffn_dim, self.dtype, name="layer_last"
        )(x, key_mask, key_lens, q_rows=out_rows)
        return x
