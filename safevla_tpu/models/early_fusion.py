"""Early-fusion IL model API shim.

The reference's offline model is `EarlyFusionCnnTransformer` with
`build_model` / `mock_batch` / `forward -> {actions_logits, loss}` /
`build_agent` (reference architecture/models/transformer_models/
early_fusion_tsfm_models.py:49-490). In this framework the offline model IS
the online PolicyTower (see training/offline.py), so this module is a thin
API-compatibility layer for code written against the reference's surface:
the same entry points backed by the shared tower.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.config import Config, ModelConfig
from safevla_tpu.models.actor_critic import SafeVLAPolicy
from safevla_tpu.preprocessing.tokenize import InstructionTokenizer
from safevla_tpu.training.offline import cross_entropy_ignore_index


class EarlyFusionCnnTransformer:
    """Reference-shaped facade over the shared policy tower (num_towers=1)."""

    def __init__(self, cfg: Optional[ModelConfig] = None, seed: int = 0):
        self.cfg = dataclasses.replace(cfg or ModelConfig(), num_towers=1)
        self.policy = SafeVLAPolicy(self.cfg)
        from safevla_tpu.models.scan_policy import trace_site

        with trace_site("init"):
            self.params = jax.jit(self.policy.init_params)(jax.random.PRNGKey(seed))
        self.tokenizer = InstructionTokenizer(
            self.cfg.text_backbone, self.cfg.text_max_tokens
        )
        self._jit_forward = jax.jit(self._forward_impl)

    @classmethod
    def build_model(cls, model_version: str = "base", **kwargs) -> "EarlyFusionCnnTransformer":
        return cls(**kwargs)

    @classmethod
    def build_agent(cls, ckpt_path: Optional[str] = None, mode: str = "greedy",
                    num_streams: int = 1, cfg: Optional[Config] = None, **kwargs):
        """Streaming inference agent (reference EarlyFusionCnnTransformerAgent)."""
        from safevla_tpu.evaluation.agent import InferenceAgent

        cfg = cfg or Config()
        cfg.model = dataclasses.replace(cfg.model, num_towers=1)
        return InferenceAgent.build(cfg, ckpt_path, num_streams=num_streams, mode=mode)

    # ------------------------------------------------------------------
    def mock_batch(self, B: int = 2, T: int = 10) -> Dict[str, Any]:
        """Synthetic batch for shape-level smoke testing
        (reference early_fusion_tsfm_models.py:104-115)."""
        h, w = self.cfg.image_size
        rng = np.random.default_rng(0)
        return {
            "rgb_nav": rng.integers(0, 255, (B, T, h, w, 3), dtype=np.uint8),
            "rgb_manip": rng.integers(0, 255, (B, T, h, w, 3), dtype=np.uint8),
            "last_actions": np.full((B, T), self.cfg.num_actions, np.int32),
            "actions": rng.integers(0, self.cfg.num_actions, (B, T)).astype(np.int32),
            "time_ids": np.tile(np.arange(T, dtype=np.int32), (B, 1)),
            "an_object_is_in_hand": np.zeros((B, T), np.int32),
            "padding_mask": np.zeros((B, T), bool),
            "instructions": ["go to a mug"] * B,
        }

    def _forward_impl(self, params, batch):
        b, t = batch["rgb_nav"].shape[:2]
        imgs = jnp.concatenate([batch["rgb_nav"], batch["rgb_manip"]], axis=0)
        imgs = imgs.reshape((-1,) + imgs.shape[2:])
        from safevla_tpu.constants import DINO_RGB_MEANS, DINO_RGB_STDS

        x = (imgs.astype(jnp.float32) / 255.0 - jnp.asarray(DINO_RGB_MEANS)) / jnp.asarray(
            DINO_RGB_STDS
        )
        feats = self.policy.encode_images(params, x).reshape(
            (2 * b, t) + self.policy.vit.pool_grid + (-1,)
        )
        out = self.policy.forward_seq(
            params,
            feats[:b],
            feats[b:],
            batch["text_hidden"],
            batch["text_mask"],
            batch["last_actions"],
            jnp.ones((b, t), jnp.int32),
            batch["an_object_is_in_hand"],
            batch["time_ids"],
            jnp.zeros((b, t), jnp.int32),
        )
        loss = cross_entropy_ignore_index(out.logits, batch["actions"])
        return {"actions_logits": out.logits, "actions_loss": loss, "loss": loss}

    def forward(self, batch: Dict[str, Any]) -> Dict[str, jax.Array]:
        tokens, mask = self.tokenizer.encode_batch(batch["instructions"])
        device_batch = {
            "rgb_nav": jnp.asarray(batch["rgb_nav"]),
            "rgb_manip": jnp.asarray(batch["rgb_manip"]),
            "last_actions": jnp.asarray(batch["last_actions"]),
            "actions": jnp.asarray(batch["actions"]),
            "time_ids": jnp.asarray(batch["time_ids"]),
            "an_object_is_in_hand": jnp.asarray(batch["an_object_is_in_hand"]),
            "text_hidden": self.policy.encode_text(
                self.params, jnp.asarray(tokens), jnp.asarray(mask)
            ),
            "text_mask": jnp.asarray(mask),
        }
        return self._jit_forward(self.params, device_batch)

    __call__ = forward
