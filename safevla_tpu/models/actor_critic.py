"""SafeVLA policy: DINOv2 features -> fusion transformer -> causal decoder
-> actor / reward-critic / cost-critic.

Capability parity with the reference's `DinoLLAMATxNavActorCritic` and
`SafeDinoLLAMATxNavActorCriticSeparate`
(reference: architecture/models/allenact_transformer_models/
allenact_dino_transformer.py:47-475, separate_actor_critic.py:8-37):
  * visual compressor: two 1x1 convs with ReLU on the (7,12) DINO grid
  * fusion transformer over [fusion token, per-camera patch tokens (+ camera
    embedding), T5 text tokens (through a per-tower adapter)]
  * fused CLS + prev-action embedding (null token on episode reset) +
    object-in-hand embedding + sinusoidal time encoding
  * LLaMA-style causal decoder with trajectory-packed block-causal masks
  * actor = linear head; critic = linear | mlp | discrete (HL-Gauss)

TPU-native design (NOT a translation):
  * The reference's "separate critic" runs THREE sequential full towers per
    forward. Here the towers' parameters are stacked on a leading axis and the
    tower forward is `jax.vmap`-ed over them: one batched MXU computation.
    Convention (matching separate_actor_critic.py): logits from tower 0,
    values from tower 1, cost-values from tower 2.
  * Frozen encoders (DINOv2, T5) are hoisted OUT of the towers and computed
    once: DINOv2 per frame, T5 once per episode (the reference re-encodes the
    instruction every step).
  * All rollout statefulness (KV caches, cache position, per-sampler episode
    step) is an explicit `PolicyState` pytree -> act_step is a pure function.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from safevla_tpu.config import ModelConfig
from safevla_tpu.models.fusion import FusionTransformer
from safevla_tpu.models.llama_decoder import (
    DecoderConfig,
    LlamaDecoder,
    init_kv_cache,
)
from safevla_tpu.models.t5 import T5Config, T5Encoder
from safevla_tpu.ops.hl_gauss import HLGauss
from safevla_tpu.ops.masks import incremental_episode_mask, packed_block_causal_mask


def sinusoidal_time_encoding(position: jax.Array, d_model: int) -> jax.Array:
    """position (..., ) int/float -> (..., d_model) sinusoidal encoding.

    Matches the reference PositionalEncoder
    (architecture/models/transformer_models/text_cond_visual_encoder.py:263-285).
    """
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    angles = position[..., None].astype(jnp.float32) * div_term
    pe = jnp.zeros(position.shape + (d_model,), jnp.float32)
    pe = pe.at[..., 0::2].set(jnp.sin(angles))
    pe = pe.at[..., 1::2].set(jnp.cos(angles))
    return pe


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def _rand_scaled_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(key, shape, dtype)

    return init


class PolicyTower(nn.Module):
    """One trainable tower: compressor + fusion + decoder + heads.

    Frozen encoder outputs come in as arrays; three towers of this module are
    vmapped over stacked params by `SafeVLAPolicy`.
    """

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        d = c.hidden_size
        h0, h1 = c.dino_compressor_hidden_out_dims
        self.compressor0 = nn.Dense(h0, dtype=dtype, name="compressor0")  # 1x1 conv
        self.compressor1 = nn.Dense(h1, dtype=dtype, name="compressor1")
        self.visual_adapter_fc = nn.Dense(h1, dtype=dtype, name="visual_adapter_fc")
        self.visual_adapter_ln = nn.LayerNorm(dtype=jnp.float32, name="visual_adapter_ln")
        self.text_adapter_fc = nn.Dense(c.goal_dims, dtype=dtype, name="text_adapter_fc")
        self.text_adapter_ln = nn.LayerNorm(dtype=jnp.float32, name="text_adapter_ln")
        self.fusion_token = self.param("fusion_token", _rand_scaled_init(0.1), (c.goal_dims,))
        self.nav_camera_token = self.param(
            "nav_camera_token", _rand_scaled_init(0.1), (c.goal_dims,)
        )
        if c.use_manipulation_camera:
            self.manip_camera_token = self.param(
                "manip_camera_token", _rand_scaled_init(0.1), (c.goal_dims,)
            )
        self.fusion = FusionTransformer(
            dim=d,
            num_heads=c.combiner_heads,
            num_layers=c.combiner_layers,
            ffn_dim=c.combiner_ffn_dim,
            dtype=dtype,
            name="fusion",
        )
        # prev-action vocabulary: A actions + null token (index A) + padding (A+1)
        self.prev_action_embed = self.param(
            "prev_action_embed", _uniform_init(0.01), (c.num_actions + 2, d)
        )
        if c.use_object_in_hand:
            self.object_in_hand_embed = self.param(
                "object_in_hand_embed", _uniform_init(0.01), (3, d)
            )
        self.decoder = LlamaDecoder(self.decoder_config(), name="decoder")

        # heads (allenact LinearActorHead / LinearCriticHead inits)
        self.actor_head = nn.Dense(
            c.num_actions,
            kernel_init=nn.initializers.orthogonal(0.01),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="actor_head",
        )
        if c.critic_type == "linear":
            self.critic_head = nn.Dense(
                1,
                kernel_init=nn.initializers.orthogonal(),
                bias_init=nn.initializers.zeros,
                dtype=jnp.float32,
                name="critic_head",
            )
        elif c.critic_type == "mlp":
            self.critic_head = nn.Sequential(
                [
                    nn.Dense(256, kernel_init=nn.initializers.orthogonal(), dtype=jnp.float32),
                    nn.relu,
                    nn.Dense(256, kernel_init=nn.initializers.orthogonal(), dtype=jnp.float32),
                    nn.relu,
                    nn.Dense(1, kernel_init=nn.initializers.orthogonal(), dtype=jnp.float32),
                ],
                name="critic_head",
            )
        elif c.critic_type == "discrete":
            self.critic_head = nn.Sequential(
                [
                    nn.Dense(256, kernel_init=nn.initializers.orthogonal(), dtype=jnp.float32),
                    nn.relu,
                    nn.Dense(c.hl_gauss_bins, kernel_init=nn.initializers.orthogonal(), dtype=jnp.float32),
                ],
                name="critic_head",
            )
        else:
            raise ValueError(f"Unknown critic type {c.critic_type}")

    def decoder_config(self) -> DecoderConfig:
        c = self.cfg
        return DecoderConfig(
            dim=c.hidden_size,
            n_layers=c.num_tx_layers,
            n_heads=c.num_tx_heads,
            max_seq_len=c.max_steps,
            dtype=jnp.dtype(c.compute_dtype),
        )

    # ---------------- shared embedding pipeline ----------------

    def _fuse(self, dino_nav, dino_manip, text_hidden, text_mask):
        """dino_* (N, gh, gw, Dv), text_hidden (N, L, Dt), text_mask (N, L)
        -> fused CLS (N, D)."""
        c = self.cfg
        n = dino_nav.shape[0]
        dtype = jnp.dtype(c.compute_dtype)

        # reference adapter order: Linear, LayerNorm, ReLU
        def cam_tokens_ref(feat, cam_token):
            x = nn.relu(self.compressor0(feat.astype(dtype)))
            x = nn.relu(self.compressor1(x))
            x = x.reshape(n, -1, x.shape[-1])
            x = self.visual_adapter_fc(x)
            x = nn.relu(self.visual_adapter_ln(x)).astype(dtype)
            return x + cam_token.astype(dtype)

        toks = [
            jnp.broadcast_to(
                self.fusion_token.astype(dtype)[None, None, :], (n, 1, c.goal_dims)
            ),
            cam_tokens_ref(dino_nav, self.nav_camera_token),
        ]
        if c.use_manipulation_camera and dino_manip is not None:
            toks.append(cam_tokens_ref(dino_manip, self.manip_camera_token))
        # text adapter: Linear -> LayerNorm -> ReLU (reference l.509-513)
        txt = self.text_adapter_fc(text_hidden.astype(dtype))
        txt = nn.relu(self.text_adapter_ln(txt)).astype(dtype)
        txt = txt * text_mask[..., None].astype(dtype)
        toks.append(txt)
        # padded text tokens are masked OUT of the fusion attention (the
        # reference pads dynamically to the longest instruction — B=1 at
        # eval — so pads never enter the softmax; zeroed values alone would
        # still shift the normalization). Text is right-padded, so the mask
        # is a contiguous prefix — pass it as per-sample valid-key counts,
        # which both the XLA and pallas attention paths accept.
        n_prefix = sum(t.shape[1] for t in toks[:-1])
        key_lens = n_prefix + jnp.sum(text_mask.astype(jnp.int32), axis=-1)
        tokens = jnp.concatenate(toks, axis=1)
        # pad the token axis ONCE to the flash kernel's sublane multiple
        # (201 -> 208): hoists the per-layer HBM pad+slice the kernel would
        # otherwise pay around every attention call. key_lens already
        # excludes the pad columns from every softmax, so the consumed CLS
        # row is bit-identical.
        pad = -tokens.shape[1] % 16
        if pad:
            tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
        # only the fused CLS row is consumed -> the last fusion layer computes
        # just that row (identical numerics, ~25% of encoder FLOPs saved)
        fused = self.fusion(tokens, key_lens=key_lens, out_rows=1)
        return fused[:, 0].astype(jnp.float32)

    def _joint_embed(
        self, obs_embeds, prev_actions, not_reset, object_in_hand, time_step
    ):
        """All (B, T, ...) -> decoder inputs (B, T, D)."""
        c = self.cfg
        null_idx = c.num_actions
        prev = jnp.where(not_reset != 0, prev_actions, null_idx)
        joint = obs_embeds + self.prev_action_embed[prev]
        if c.use_object_in_hand and object_in_hand is not None:
            joint = joint + self.object_in_hand_embed[object_in_hand]
        joint = joint + sinusoidal_time_encoding(time_step, c.hidden_size)
        return joint

    def _heads(self, beliefs):
        c = self.cfg
        logits = self.actor_head(beliefs)
        sg_beliefs = jax.lax.stop_gradient(beliefs)
        if c.critic_type == "discrete":
            hl = HLGauss(c.hl_gauss_min, c.hl_gauss_max, c.hl_gauss_bins, c.hl_gauss_sigma)
            value_logits = self.critic_head(beliefs)
            values = hl.from_logits(value_logits)
            sg_value_logits = self.critic_head(sg_beliefs)
            return logits, values, value_logits, sg_value_logits
        values = self.critic_head(beliefs)[..., 0]
        sg_values = self.critic_head(sg_beliefs)[..., 0]
        return logits, values, None, sg_values

    # ---------------- public entry points ----------------

    def full_seq(
        self,
        dino_nav,  # (B, T, gh, gw, Dv)
        dino_manip,  # (B, T, gh, gw, Dv) or None
        text_hidden,  # (B, L, Dt) — constant across T within an episode window
        text_mask,  # (B, L)
        prev_actions,  # (B, T) int32
        not_reset,  # (B, T) float/int; 0 marks episode starts
        object_in_hand,  # (B, T) int32
        time_step,  # (B, T) int32 in-episode step index
        attn_mask,  # (B, 1, T, T) bool
        text_idx=None,  # (B, T) int32 into a (B, E, L, D) episode-text table
    ):
        b, t = dino_nav.shape[:2]
        flat = lambda x: x.reshape((b * t,) + x.shape[2:])
        if text_idx is not None:
            # text table (B, E, L, D): rollouts pack multiple episodes per
            # window; each step gathers its episode's instruction encoding
            batch_ids = jnp.arange(b)[:, None]
            text_h = text_hidden[batch_ids, text_idx].reshape(
                (b * t,) + text_hidden.shape[2:]
            )
            text_m = text_mask[batch_ids, text_idx].reshape(b * t, -1)
        elif text_hidden.ndim == 4:
            # per-step text (episodes with different instructions packed in T)
            text_h = text_hidden.reshape((b * t,) + text_hidden.shape[2:])
            text_m = text_mask.reshape(b * t, -1)
        else:
            # one instruction per sampler, broadcast across timesteps
            text_h = jnp.repeat(text_hidden, t, axis=0)
            text_m = jnp.repeat(text_mask, t, axis=0)
        fused = self.embed_obs(
            flat(dino_nav),
            flat(dino_manip) if dino_manip is not None else None,
            text_h,
            text_m,
        )
        obs_embeds = fused.reshape(b, t, -1)
        return self.decode_heads(
            obs_embeds, prev_actions, not_reset, object_in_hand, time_step, attn_mask
        )

    def embed_obs(self, dino_nav_flat, dino_manip_flat, text_h, text_m):
        """Per-step fusion embedding over a flat (N, ...) batch -> (N, D).

        Per-step independent, so callers may process the packed rollout in
        chunks (SafeVLAPolicy.forward_seq does, under rematerialization)."""
        return self._fuse(dino_nav_flat, dino_manip_flat, text_h, text_m)

    def decode_heads(
        self, obs_embeds, prev_actions, not_reset, object_in_hand, time_step, attn_mask
    ):
        """(B, T, D) observation embeddings -> decoder + actor/critic heads."""
        joint = self._joint_embed(
            obs_embeds, prev_actions, not_reset, object_in_hand, time_step
        )
        beliefs = self.decoder.full(joint, attn_mask)
        return self._heads(beliefs)

    def step(
        self,
        dino_nav,  # (B, gh, gw, Dv)
        dino_manip,
        text_hidden,  # (B, L, Dt)
        text_mask,
        prev_actions,  # (B,)
        not_reset,  # (B,)
        object_in_hand,  # (B,)
        time_step,  # (B,)
        cache,  # {k, v: (L, B, S, H, Dh)}
        pos,  # scalar int32 cache write position
    ):
        fused = self._fuse(dino_nav, dino_manip, text_hidden, text_mask)
        joint = self._joint_embed(
            fused[:, None],
            prev_actions[:, None],
            not_reset[:, None],
            object_in_hand[:, None] if object_in_hand is not None else None,
            time_step[:, None],
        )
        mask = incremental_episode_mask(time_step, pos, self.cfg.max_steps)
        beliefs, cache = self.decoder.step(joint, cache, pos, mask)
        logits, values, value_logits, sg = self._heads(beliefs)
        return (logits[:, 0], values[:, 0], cache)


@dataclass
class PolicyOutputs:
    logits: jax.Array  # (B, T, A) from the actor tower
    values: jax.Array  # (B, T) reward critic
    c_values: Optional[jax.Array]  # (B, T) cost critic (None if num_towers < 3)
    value_logits: Optional[jax.Array]  # discrete critic only
    c_value_logits: Optional[jax.Array]
    stop_grad_values: Optional[jax.Array]
    extras: Dict[str, Any]


@jax.tree_util.register_pytree_node_class
@dataclass
class PolicyState:
    """Carried rollout state: replaces the reference's mutable module fields."""

    cache: Dict[str, jax.Array]  # k/v: (towers, L, B, S, H, Dh)
    pos: jax.Array  # scalar int32, shared cache write position
    time_step: jax.Array  # (B,) int32 in-episode step counter
    text_hidden: jax.Array  # (B, L, Dt) cached frozen T5 encoding
    text_mask: jax.Array  # (B, L)

    def tree_flatten(self):
        return (
            (self.cache, self.pos, self.time_step, self.text_hidden, self.text_mask),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class SafeVLAPolicy:
    """Bundles frozen encoders + vmapped towers into a functional policy.

    params = {"vit": ..., "t5": ..., "towers": <stacked tower params>}
    """

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        from safevla_tpu.models.image_encoders import build_image_encoder

        self.vit = build_image_encoder(cfg.vision_backbone)
        # frozen text tower: T5 (default) or the SigLIP text transformer
        # (reference create_text_encoder, text_cond_visual_encoder.py:35-44).
        # The params key stays "t5" for checkpoint/back compatibility.
        if "siglip" in cfg.text_backbone.lower():
            from safevla_tpu.models.text_towers import SigLIPTextEncoder, TextTowerConfig

            heads = next(h for h in (12, 8, 6, 4, 2, 1) if cfg.text_embed_size % h == 0)
            self.t5 = SigLIPTextEncoder(
                TextTowerConfig(
                    d_model=cfg.text_embed_size,
                    num_heads=heads,
                    max_tokens=cfg.text_max_tokens,
                )
            )
        else:
            self.t5 = T5Encoder(T5Config(d_model=cfg.text_embed_size))
        self.tower = PolicyTower(cfg)
        self.num_towers = cfg.num_towers

    # -------------- init --------------

    def init_params(self, rng: jax.Array, text_len: Optional[int] = None) -> dict:
        c = self.cfg
        text_len = text_len or c.text_max_tokens
        gh, gw = c.vision_grid
        rng_vit, rng_t5, rng_towers = jax.random.split(rng, 3)
        h, w = c.image_size
        vit_params = self.vit.init(rng_vit, jnp.zeros((1, h, w, 3)))
        t5_params = self.t5.init(
            rng_t5, jnp.zeros((1, text_len), jnp.int32), jnp.ones((1, text_len), bool)
        )
        dummy = dict(
            dino_nav=jnp.zeros((1, 1, gh, gw, c.vision_feature_dim)),
            dino_manip=jnp.zeros((1, 1, gh, gw, c.vision_feature_dim))
            if c.use_manipulation_camera
            else None,
            text_hidden=jnp.zeros((1, text_len, c.text_embed_size)),
            text_mask=jnp.ones((1, text_len), bool),
            prev_actions=jnp.zeros((1, 1), jnp.int32),
            not_reset=jnp.zeros((1, 1), jnp.int32),
            object_in_hand=jnp.zeros((1, 1), jnp.int32),
            time_step=jnp.zeros((1, 1), jnp.int32),
            attn_mask=jnp.ones((1, 1, 1, 1), bool),
        )

        def init_tower(key):
            return self.tower.init(key, **dummy, method=PolicyTower.full_seq)

        tower_params = jax.vmap(init_tower)(jax.random.split(rng_towers, self.num_towers))
        return {"vit": vit_params, "t5": t5_params, "towers": tower_params}

    # -------------- frozen encoders --------------

    def encode_images(self, params: dict, images: jax.Array) -> jax.Array:
        """images (N, H, W, 3) normalized float -> (N, 7, 12, Dv)."""
        return self.vit.apply(params["vit"], images)

    def encode_text(self, params: dict, tokens: jax.Array, mask: jax.Array) -> jax.Array:
        """tokens (B, L) -> (B, L, Dt). Frozen; call once per episode."""
        return self.t5.apply(params["t5"], tokens, mask)

    # -------------- towers --------------

    def _vmap_towers(self, fn, params, *tower_inputs):
        return jax.vmap(fn, in_axes=(0,) + (None,) * len(tower_inputs))(
            params["towers"], *tower_inputs
        )

    def forward_seq(
        self,
        params: dict,
        dino_nav,
        dino_manip,
        text_hidden,
        text_mask,
        prev_actions,
        not_reset,
        object_in_hand,
        time_step,
        traj_idx,
        text_idx=None,
    ) -> PolicyOutputs:
        """Update-time full-sequence forward with trajectory-packed masking.

        The per-step fusion encoder runs over the packed (B*T) batch in
        chunks of cfg.fusion_chunk under jax.checkpoint: the fusion attention
        (N x 201 x 201 logits) never materializes for the whole window, and
        its activations are recomputed instead of stored for the backward
        pass — the decoder (tiny by comparison) stays full-sequence.
        """
        attn_mask = packed_block_causal_mask(traj_idx)
        b, t = dino_nav.shape[:2]
        n = b * t
        flat = lambda x: x.reshape((n,) + x.shape[2:])

        # resolve per-step text (flat) from table/per-step/per-sampler forms
        if text_idx is not None:
            batch_ids = jnp.arange(b)[:, None]
            text_h = text_hidden[batch_ids, text_idx].reshape(
                (n,) + text_hidden.shape[2:]
            )
            text_m = text_mask[batch_ids, text_idx].reshape(n, -1)
        elif text_hidden.ndim == 4:
            text_h = text_hidden.reshape((n,) + text_hidden.shape[2:])
            text_m = text_mask.reshape(n, -1)
        else:
            text_h = jnp.repeat(text_hidden, t, axis=0)
            text_m = jnp.repeat(text_mask, t, axis=0)

        chunk = min(self.cfg.fusion_chunk or n, n)
        while n % chunk:
            chunk -= 1
        n_chunks = n // chunk
        as_chunks = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
        chunked_args = (
            as_chunks(flat(dino_nav)),
            as_chunks(flat(dino_manip)) if dino_manip is not None else None,
            as_chunks(text_h),
            as_chunks(text_m),
        )

        def one_tower(tp, chunked_args, prev_actions, not_reset, oih, tstep, mask):
            @jax.checkpoint
            def embed(args):
                dn, dm, th, tm = args
                return self.tower.apply(tp, dn, dm, th, tm, method=PolicyTower.embed_obs)

            if n_chunks == 1:
                fused = embed(jax.tree.map(lambda x: x[0], chunked_args))
            else:
                fused = jax.lax.map(embed, chunked_args).reshape(n, -1)
            obs_embeds = fused.reshape(b, t, -1)
            return self.tower.apply(
                tp, obs_embeds, prev_actions, not_reset, oih, tstep, mask,
                method=PolicyTower.decode_heads,
            )

        logits, values, value_logits, sg = jax.vmap(
            one_tower, in_axes=(0,) + (None,) * 6
        )(
            params["towers"],
            chunked_args,
            prev_actions,
            not_reset,
            object_in_hand,
            time_step,
            attn_mask,
        )
        return self._package_outputs(logits, values, value_logits, sg)

    def _package_outputs(self, logits, values, value_logits, sg) -> PolicyOutputs:
        if self.num_towers >= 3:
            return PolicyOutputs(
                logits=logits[0],
                values=values[1],
                c_values=values[2],
                value_logits=None if value_logits is None else value_logits[1],
                c_value_logits=None if value_logits is None else value_logits[2],
                stop_grad_values=sg[1] if sg is not None else None,
                extras={},
            )
        return PolicyOutputs(
            logits=logits[0],
            values=values[0],
            c_values=None,
            value_logits=None if value_logits is None else value_logits[0],
            c_value_logits=None,
            stop_grad_values=sg[0] if sg is not None else None,
            extras={},
        )

    # -------------- chunk-granular update decomposition --------------
    # The async training pipeline dispatches the PPO epoch as many small
    # device programs woven between rollout act steps (algo/learner.py
    # chunked_update_fns). These methods expose the same math as
    # forward_seq at chunk granularity: fusion embedding over a TIME range
    # (all B streams x chunk_t steps — so the batch axis stays dp-sharded on
    # a mesh and every chunk program runs on every device), and the
    # decoder+heads over a precomputed embedding buffer.

    def _chunk_text(self, text_hidden, text_mask, text_idx, b, t, start_t, chunk_t):
        """Per-step instruction encodings for the (B, chunk_t) time range,
        flattened b-major to (B*chunk_t, L, D).

        Resolves the same three layouts as forward_seq, but gathers only the
        requested range (the table gather would otherwise materialize the
        full (B*T, L, D) text tensor per call)."""
        n = b * chunk_t
        if text_idx is not None:
            ti = jax.lax.dynamic_slice_in_dim(text_idx, start_t, chunk_t, 1)
            rows = jnp.arange(b)[:, None]
            th = text_hidden[rows, ti].reshape((n,) + text_hidden.shape[2:])
            return th, text_mask[rows, ti].reshape(n, -1)
        if text_hidden.ndim == 4:
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start_t, chunk_t, 1)
            flat = lambda x: x.reshape((n,) + x.shape[2:])
            return flat(sl(text_hidden)), sl(text_mask).reshape(n, -1)
        # per-stream (B, L, D): each stream's encoding serves its chunk_t rows
        return (
            jnp.repeat(text_hidden, chunk_t, axis=0),
            jnp.repeat(text_mask, chunk_t, axis=0),
        )

    def embed_time_range(
        self,
        params,
        dino_nav,
        dino_manip,
        text_hidden,
        text_mask,
        text_idx,
        start_t,
        chunk_t: int,
    ):
        """Fusion embeddings for time steps [start_t, start_t+chunk_t) of
        every stream -> (towers, B, chunk_t, D) f32. `start_t` may be traced;
        one compiled program serves every chunk. Chunking along T (not the
        flat B*T index) keeps the batch axis whole per program, so on a dp
        mesh each chunk shards exactly like the monolithic update."""
        b, t = dino_nav.shape[:2]
        n = b * chunk_t
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start_t, chunk_t, 1)
        flat = lambda x: x.reshape((n,) + x.shape[2:])
        dn = flat(sl(dino_nav))
        dm = flat(sl(dino_manip)) if dino_manip is not None else None
        th, tm = self._chunk_text(
            text_hidden, text_mask, text_idx, b, t, start_t, chunk_t
        )

        def one_tower(tp):
            emb = self.tower.apply(tp, dn, dm, th, tm, method=PolicyTower.embed_obs)
            return emb.reshape(b, chunk_t, emb.shape[-1])

        return jax.vmap(one_tower)(params["towers"])

    def decode_from_embeds(
        self,
        params,
        obs_embeds,  # (towers, B, T, D) f32 — output of embed_time_range calls
        prev_actions,
        not_reset,
        object_in_hand,
        time_step,
        traj_idx,
    ) -> PolicyOutputs:
        """Decoder + heads over a precomputed fusion-embedding buffer."""
        attn_mask = packed_block_causal_mask(traj_idx)

        def one_tower(tp, emb):
            return self.tower.apply(
                tp, emb, prev_actions, not_reset, object_in_hand, time_step,
                attn_mask, method=PolicyTower.decode_heads,
            )

        logits, values, value_logits, sg = jax.vmap(one_tower, in_axes=(0, 0))(
            params["towers"], obs_embeds
        )
        return self._package_outputs(logits, values, value_logits, sg)

    def act_step(
        self,
        params: dict,
        state: PolicyState,
        dino_nav,
        dino_manip,
        prev_actions,
        not_reset,
        object_in_hand,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, PolicyState]:
        """Single rollout step. Returns (logits, values(T,B?), c_values, state).

        time_step & cache position bookkeeping mirrors the reference
        (allenact_dino_transformer.py:376-406): the shared cache position wraps
        at max_steps; per-sampler time_step resets to 0 on episode start.
        """
        time_step = jnp.where(not_reset != 0, state.time_step, 0)
        pos = jnp.where(state.pos >= self.cfg.max_steps, 0, state.pos)

        def one_tower(tp, cache, *args):
            return self.tower.apply(tp, *args, cache, pos, method=PolicyTower.step)

        in_axes = (0, 0) + (None,) * 8
        logits, values, cache = jax.vmap(one_tower, in_axes=in_axes)(
            params["towers"],
            state.cache,
            dino_nav,
            dino_manip,
            state.text_hidden,
            state.text_mask,
            prev_actions,
            not_reset,
            object_in_hand,
            time_step,
        )
        new_state = PolicyState(
            cache=cache,
            pos=pos + 1,
            time_step=time_step + 1,
            text_hidden=state.text_hidden,
            text_mask=state.text_mask,
        )
        if self.num_towers >= 3:
            return logits[0], values[1], values[2], new_state
        return logits[0], values[0], values[0], new_state

    # -------------- state management --------------

    def init_state(self, num_samplers: int, text_len: Optional[int] = None) -> PolicyState:
        c = self.cfg
        text_len = text_len or c.text_max_tokens
        dcfg = self.tower.decoder_config()
        cache = init_kv_cache(dcfg, num_samplers)
        cache = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.num_towers,) + x.shape), cache
        )
        return PolicyState(
            cache=cache,
            pos=jnp.zeros((), jnp.int32),
            time_step=jnp.zeros((num_samplers,), jnp.int32),
            text_hidden=jnp.zeros((num_samplers, text_len, c.text_embed_size)),
            text_mask=jnp.zeros((num_samplers, text_len), bool),
        )

    def update_text(
        self, state: PolicyState, sampler_idx, text_hidden, text_mask
    ) -> PolicyState:
        """Install a fresh episode's instruction encoding for given samplers."""
        return PolicyState(
            cache=state.cache,
            pos=state.pos,
            time_step=state.time_step,
            text_hidden=state.text_hidden.at[sampler_idx].set(text_hidden),
            text_mask=state.text_mask.at[sampler_idx].set(text_mask),
        )
