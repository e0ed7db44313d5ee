"""Full-tower numerical oracle: a torch reimplementation of the reference
policy tower (visual compressor + adapters + fusion nn.TransformerEncoder +
prev-action/object-in-hand embeddings + sinusoidal time encoding + LLaMA
decoder + heads) with the reference's state-dict naming, converted via
import_tower_state_dict and compared against our PolicyTower.full_seq.

This pins down end-to-end numerical equivalence of the trainable tower
(reference allenact_dino_transformer.py:326-475 + llama model.py:249-323 +
separate heads) without needing downloaded assets: with the frozen-encoder
parity harness (tools/parity_check.py), real-checkpoint parity reduces to
this test passing.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from safevla_tpu.config import ModelConfig
from safevla_tpu.models.actor_critic import PolicyTower
from safevla_tpu.models.convert import import_tower_state_dict
from safevla_tpu.ops.masks import packed_block_causal_mask

# tiny-but-structurally-complete dims
A = 6          # actions
D = 32         # hidden == goal == text embed
HEADS = 2
TX_LAYERS = 2
COMB_LAYERS = 2
COMB_FFN = 64
DV = 16        # dino feature dim
GRID = (2, 3)
L = 5          # text tokens
MULTIPLE_OF = 256


# ---------------------------------------------------------------------------
# torch oracle with reference naming
# ---------------------------------------------------------------------------


class _RMSNorm(tnn.Module):
    """reference llama model.py:28-60 (norm in f32, scale in input dtype)."""

    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.weight = tnn.Parameter(torch.ones(dim))

    def forward(self, x):
        n = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + self.eps)
        return n.type_as(x) * self.weight


class _LlamaAttention(tnn.Module):
    """reference llama model.py:170-323 full-seq path (no rotary)."""

    def __init__(self, d, h):
        super().__init__()
        self.wq = tnn.Linear(d, d, bias=False)
        self.wk = tnn.Linear(d, d, bias=False)
        self.wv = tnn.Linear(d, d, bias=False)
        self.wo = tnn.Linear(d, d, bias=False)
        self.h = h

    def forward(self, x, mask):
        b, t, d = x.shape
        h = self.h
        q = self.wq(x).view(b, t, h, d // h).transpose(1, 2)
        k = self.wk(x).view(b, t, h, d // h).transpose(1, 2)
        v = self.wv(x).view(b, t, h, d // h).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=mask, dropout_p=0.0)
        return self.wo(out.transpose(1, 2).reshape(b, t, d))


class _LlamaFFN(tnn.Module):
    """SwiGLU with the reference sizing (llama model.py:348-353)."""

    def __init__(self, d):
        super().__init__()
        hidden = int(2 * (4 * d) / 3)
        hidden = MULTIPLE_OF * ((hidden + MULTIPLE_OF - 1) // MULTIPLE_OF)
        self.w1 = tnn.Linear(d, hidden, bias=False)
        self.w2 = tnn.Linear(hidden, d, bias=False)
        self.w3 = tnn.Linear(d, hidden, bias=False)

    def forward(self, x):
        return self.w2(F.silu(self.w1(x)) * self.w3(x))


class _LlamaBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attention = _LlamaAttention(d, h)
        self.feed_forward = _LlamaFFN(d)
        self.attention_norm = _RMSNorm(d)
        self.ffn_norm = _RMSNorm(d)

    def forward(self, x, mask):
        h = x + self.attention(self.attention_norm(x), mask)
        return h + self.feed_forward(self.ffn_norm(h))


class _LlamaDecoder(tnn.Module):
    """reference llama model.py:425-467 (vocab_size == dim)."""

    def __init__(self, d, h, n_layers):
        super().__init__()
        self.layers = tnn.ModuleList([_LlamaBlock(d, h) for _ in range(n_layers)])
        self.norm = _RMSNorm(d)
        self.output = tnn.Linear(d, d, bias=False)

    def forward(self, x, mask):
        for layer in self.layers:
            x = layer(x, mask)
        return self.output(self.norm(x)).float()


class _VisualEncoder(tnn.Module):
    """reference DinoTxGoalEncoder (allenact_dino_transformer.py:478-717),
    text encoding factored out (frozen T5 is parity-tested separately)."""

    def __init__(self):
        super().__init__()
        self.visual_compressor = tnn.Sequential(
            tnn.Conv2d(DV, D, 1), tnn.ReLU(), tnn.Conv2d(D, D, 1), tnn.ReLU()
        )
        self.visual_adapter = tnn.Sequential(
            tnn.Linear(D, D), tnn.LayerNorm(D), tnn.ReLU()
        )
        self.text_adapter = tnn.Sequential(
            tnn.Linear(D, D), tnn.LayerNorm(D), tnn.ReLU()
        )
        self.fusion_token = tnn.Parameter(0.1 * torch.rand(D))
        self.visual_sensor_token_raw_navigation_camera = tnn.Parameter(
            0.1 * torch.rand(D)
        )
        self.visual_sensor_token_raw_manipulation_camera = tnn.Parameter(
            0.1 * torch.rand(D)
        )
        self.fusion_xformer = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(
                d_model=D, nhead=HEADS, dim_feedforward=COMB_FFN, batch_first=True
            ),
            num_layers=COMB_LAYERS,
        )

    def _cam_tokens(self, feats, cam_token):
        # (N, gh, gw, DV) -> conv (channels-first) -> tokens row-major
        x = self.visual_compressor(feats.permute(0, 3, 1, 2))
        x = x.flatten(start_dim=2).permute(0, 2, 1)
        return self.visual_adapter(x) + cam_token

    def forward(self, dino_nav, dino_manip, text_hidden):
        n = dino_nav.shape[0]
        toks = [
            self.fusion_token.view(1, 1, -1).expand(n, -1, -1),
            self._cam_tokens(dino_nav, self.visual_sensor_token_raw_navigation_camera),
            self._cam_tokens(
                dino_manip, self.visual_sensor_token_raw_manipulation_camera
            ),
            self.text_adapter(text_hidden),
        ]
        x = torch.cat(toks, dim=1)
        ntok = x.shape[1]
        # zero additive mask: numerically a no-op, but keeps torch off the
        # fused fast path so the math matches the reference training path
        src_mask = torch.zeros(ntok, ntok)
        for layer in self.fusion_xformer.layers:
            x = layer(x, src_mask=src_mask)
        return x[:, 0]


class _PositionalEncoder(tnn.Module):
    """reference text_cond_visual_encoder.py:263-284."""

    def __init__(self, d_model):
        super().__init__()
        div_term = torch.exp(
            torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model)
        )
        self.register_buffer("div_term", div_term)
        self.d_model = d_model

    def forward(self, position):
        b, t = position.shape
        pe = torch.zeros([b, t, self.d_model])
        pos = position.unsqueeze(-1)
        pe[:, :, 0::2] = torch.sin(pos * self.div_term)
        pe[:, :, 1::2] = torch.cos(pos * self.div_term)
        return pe


class _RefTower(tnn.Module):
    """One reference policy tower, full-sequence (update) path
    (allenact_dino_transformer.py:326-475)."""

    def __init__(self):
        super().__init__()
        self.visual_encoder = _VisualEncoder()
        self.last_actions_embed = tnn.Embedding(A + 2, D, padding_idx=A + 1)
        self.last_actions_embed.weight.data.uniform_(-0.01, 0.01)
        self.object_in_hand_embed = tnn.Embedding(3, D)
        self.object_in_hand_embed.weight.data.uniform_(-0.01, 0.01)
        self.time_encoder = _PositionalEncoder(D)
        self.decoder = _LlamaDecoder(D, HEADS, TX_LAYERS)
        self.actor = tnn.Module()
        self.actor.linear = tnn.Linear(D, A)
        self.critic = tnn.Module()
        self.critic.fc = tnn.Linear(D, 1)

    def forward(
        self, dino_nav, dino_manip, text_hidden, prev_actions, not_reset, oih,
        time_step, traj_idx,
    ):
        b, t = dino_nav.shape[:2]
        flat = lambda x: x.reshape(b * t, *x.shape[2:])
        text_rep = torch.repeat_interleave(text_hidden, t, dim=0)
        fused = self.visual_encoder(flat(dino_nav), flat(dino_manip), text_rep)
        obs_embeds = fused.view(b, t, D)

        prev = torch.where(not_reset != 0, prev_actions, torch.full_like(prev_actions, A))
        joint = obs_embeds + self.last_actions_embed(prev)
        joint = joint + self.object_in_hand_embed(oih)
        joint = joint + self.time_encoder(time_step.float())

        same = traj_idx[:, :, None] == traj_idx[:, None, :]
        mask = torch.tril(same).unsqueeze(1)  # bool: True = attend
        beliefs = self.decoder(joint, mask)
        logits = self.actor.linear(beliefs)
        values = self.critic.fc(beliefs)[..., 0]
        return logits, values


# ---------------------------------------------------------------------------


def _tiny_cfg():
    return ModelConfig(
        num_actions=A, hidden_size=D, num_tx_layers=TX_LAYERS, num_tx_heads=HEADS,
        goal_dims=D, text_embed_size=D, combiner_layers=COMB_LAYERS,
        combiner_heads=HEADS, combiner_ffn_dim=COMB_FFN,
        dino_compressor_hidden_out_dims=(D, D), vision_feature_dim=DV,
        vision_grid=GRID, image_size=(GRID[0] * 14, GRID[1] * 14),
        max_steps=16, text_max_tokens=L, num_towers=1,
        compute_dtype="float32", fusion_chunk=0,
    )


def _inputs(B=2, T=4, text_len=L, seed=0):
    rng = np.random.default_rng(seed)
    gh, gw = GRID
    return dict(
        dino_nav=rng.normal(size=(B, T, gh, gw, DV)).astype(np.float32),
        dino_manip=rng.normal(size=(B, T, gh, gw, DV)).astype(np.float32),
        text_hidden=rng.normal(size=(B, text_len, D)).astype(np.float32),
        prev_actions=rng.integers(0, A, (B, T)).astype(np.int32),
        not_reset=np.array([[0, 1, 1, 1], [0, 1, 0, 1]], np.int32)[:B, :T],
        oih=rng.integers(0, 2, (B, T)).astype(np.int32),
        time_step=np.array([[0, 1, 2, 3], [0, 1, 0, 1]], np.int32)[:B, :T],
        traj_idx=np.array([[5, 5, 5, 5], [7, 7, 8, 8]], np.int32)[:B, :T],
    )


def _run_ours(params, cfg, x, text_mask):
    tower = PolicyTower(cfg)
    attn_mask = packed_block_causal_mask(jnp.asarray(x["traj_idx"]))
    logits, values, _, _ = tower.apply(
        params,
        jnp.asarray(x["dino_nav"]),
        jnp.asarray(x["dino_manip"]),
        jnp.asarray(x["text_hidden"]),
        jnp.asarray(text_mask),
        jnp.asarray(x["prev_actions"]),
        jnp.asarray(x["not_reset"]),
        jnp.asarray(x["oih"]),
        jnp.asarray(x["time_step"]),
        attn_mask,
        method=PolicyTower.full_seq,
    )
    return np.asarray(logits), np.asarray(values)


def test_tower_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = _RefTower().eval()
    params = import_tower_state_dict(
        oracle.state_dict(), num_tx_layers=TX_LAYERS, combiner_layers=COMB_LAYERS,
        critic_type="linear",
    )
    cfg = _tiny_cfg()
    x = _inputs()
    with torch.no_grad():
        ref_logits, ref_values = oracle(
            *[
                torch.from_numpy(x[k].astype(np.int64) if x[k].dtype == np.int32 else x[k])
                for k in (
                    "dino_nav", "dino_manip", "text_hidden", "prev_actions",
                    "not_reset", "oih", "time_step", "traj_idx",
                )
            ]
        )
    logits, values = _run_ours(params, cfg, x, np.ones((2, L), bool))
    np.testing.assert_allclose(logits, ref_logits.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(values, ref_values.numpy(), atol=1e-4, rtol=1e-4)


def test_tower_padded_text_matches_dynamic_length_oracle():
    """The reference pads text dynamically to the longest instruction in the
    batch (B=1 at eval: no pads at all). Our fixed-length text with a key
    mask must match the oracle fed only the real tokens."""
    torch.manual_seed(1)
    oracle = _RefTower().eval()
    params = import_tower_state_dict(
        oracle.state_dict(), num_tx_layers=TX_LAYERS, combiner_layers=COMB_LAYERS,
        critic_type="linear",
    )
    cfg = _tiny_cfg()
    x = _inputs(seed=3)
    k = 3  # real token count; slots k..L-1 are padding
    x_trunc = dict(x, text_hidden=x["text_hidden"][:, :k])
    with torch.no_grad():
        ref_logits, _ = oracle(
            *[
                torch.from_numpy(
                    x_trunc[kk].astype(np.int64)
                    if x_trunc[kk].dtype == np.int32
                    else x_trunc[kk]
                )
                for kk in (
                    "dino_nav", "dino_manip", "text_hidden", "prev_actions",
                    "not_reset", "oih", "time_step", "traj_idx",
                )
            ]
        )
    text_mask = np.zeros((2, L), bool)
    text_mask[:, :k] = True
    # garbage in the padded slots must not leak through the key mask
    x["text_hidden"][:, k:] = 1e3
    logits, _ = _run_ours(params, cfg, x, text_mask)
    np.testing.assert_allclose(logits, ref_logits.numpy(), atol=1e-4, rtol=1e-4)
