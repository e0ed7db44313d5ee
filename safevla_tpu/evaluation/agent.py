"""Batched inference agent: the policy driven step-by-step over B streams.

Counterpart of the reference's `InferenceAgentVIDA`
(reference: architecture/models/allenact_transformer_models/
inference_agent.py:85-296): checkpoint auto-detection across formats,
KV-cache incremental decode, greedy or stochastic action choice. Unlike the
reference (one agent per eval worker process, each doing B=1 forwards on its
own GPU context), this agent serves ALL eval streams in one jitted batched
step on the chip.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.config import Config
from safevla_tpu.models.actor_critic import PolicyState, SafeVLAPolicy
from safevla_tpu.preprocessing.augment import (
    identity_augment_params,
    sample_augment_params,
)
from safevla_tpu.preprocessing.tokenize import InstructionTokenizer


class InferenceAgent:
    def __init__(
        self,
        cfg: Config,
        params,
        num_streams: int,
        mode: str = "greedy",
        seed: int = 123,
        test_augmentation: bool = True,
        max_episode_steps: Optional[int] = None,
        require_exact_tokenizer: bool = False,
    ):
        assert mode in ("greedy", "sample")
        if max_episode_steps and max_episode_steps > cfg.model.max_steps:
            # the KV cache must cover the longest eval episode or the decode
            # position silently wraps mid-episode (train default 500 <
            # 600/1000-step eval caps). Guarded HERE so no caller can bypass.
            import dataclasses

            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, max_steps=max_episode_steps)
            )
        self.cfg = cfg
        self.policy = SafeVLAPolicy(cfg.model)
        self.params = params
        self.B = num_streams
        self.mode = mode
        self.rng = jax.random.PRNGKey(seed)
        self.tokenizer = InstructionTokenizer(
            cfg.model.text_backbone,
            cfg.model.text_max_tokens,
            require_exact=require_exact_tokenizer,
        )
        self.test_augmentation = test_augmentation
        self._aug_key = jax.random.PRNGKey(seed + 7)
        self._aug_params = identity_augment_params()
        self._aug_steps = 0
        self.state = self.policy.init_state(self.B, cfg.model.text_max_tokens)
        self.instructions = [""] * self.B
        self.prev_action = np.zeros(self.B, np.int32)

        self._step_impl = jax.jit(self._policy_step)
        self._encode_text = jax.jit(
            lambda p, t, m: self.policy.encode_text(p, t, m)
        )

    def _policy_step(self, params, state, aug, imgs, ints, rng):
        # act-site lowering: rolled layer scans (scan_policy.py) — forward-
        # only program, compile time dominates over the axon tunnel.
        from safevla_tpu.models.scan_policy import trace_site

        with trace_site("act"):
            return self._policy_step_body(params, state, aug, imgs, ints, rng)

    def _policy_step_body(self, params, state, aug, imgs, ints, rng):
        from safevla_tpu.constants import rgb_norm_constants
        from safevla_tpu.preprocessing.augment import apply_augment

        means, stds = rgb_norm_constants(self.cfg.model.vision_backbone)
        prev, not_reset, oih = ints[0], ints[1], ints[2]
        x01 = apply_augment(imgs.astype(jnp.float32) / 255.0, aug)
        x = (x01 - jnp.asarray(means)) / jnp.asarray(stds)
        feats = self.policy.encode_images(params, x)
        logits, v, cv, new_state = self.policy.act_step(
            params, state, feats[: self.B], feats[self.B :], prev, not_reset, oih
        )
        greedy = jnp.argmax(logits, axis=-1)
        sampled = jax.random.categorical(rng, logits)
        action = greedy if self.mode == "greedy" else sampled
        return action, jax.nn.softmax(logits, axis=-1), v, cv, new_state

    # ------------------------------------------------------------------
    def set_instructions(self, instructions: List[Optional[str]]):
        """Install instructions for streams whose episode just reset."""
        changed = False
        for i, ins in enumerate(instructions):
            if ins is not None and ins != self.instructions[i]:
                self.instructions[i] = ins
                changed = True
        if changed or not getattr(self, "_text_ready", False):
            tokens, mask = self.tokenizer.encode_batch(self.instructions)
            hidden = self._encode_text(self.params, jnp.asarray(tokens), jnp.asarray(mask))
            self.state = PolicyState(
                cache=self.state.cache,
                pos=self.state.pos,
                time_step=self.state.time_step,
                text_hidden=hidden,
                text_mask=jnp.asarray(mask),
            )
            self._text_ready = True

    def act(self, rgb_nav, rgb_manip, not_reset, oih) -> np.ndarray:
        """One batched act. Arrays are host uint8/int; returns actions (B,).

        Host<->device traffic per step (the eval loop is upload-bound over
        the bench tunnel — PERFORMANCE.md "Eval-path throughput"): ONE packed
        frame upload (both cameras), ONE packed int32 upload, ONE action
        fetch with an async copy started at dispatch. The action
        distribution stays on device; `last_probs` fetches it lazily (only
        video-recorded steps pay that second fetch)."""
        if self.test_augmentation:
            if self._aug_steps % self.cfg.train.max_steps == 0:
                self._aug_key, sub = jax.random.split(self._aug_key)
                self._aug_params = sample_augment_params(
                    sub, version=self.cfg.train.augmentation_version
                )
            self._aug_steps += 1
        self.rng, sub = jax.random.split(self.rng)
        ints = np.stack(
            [
                self.prev_action,
                np.asarray(not_reset, np.int32),
                np.asarray(oih, np.int32),
            ]
        ).astype(np.int32)
        action, self._last_probs_dev, v, cv, self.state = self._step_impl(
            self.params,
            self.state,
            self._aug_params,
            jnp.asarray(np.concatenate([rgb_nav, rgb_manip], axis=0)),
            jnp.asarray(ints),
            sub,
        )
        try:
            action.copy_to_host_async()
        except Exception:
            pass
        out = np.asarray(action)
        self.prev_action = out.copy()
        return out

    @property
    def last_probs(self) -> Optional[np.ndarray]:
        """Action distribution of the last act (fetched on demand — a
        blocking device->host fetch; used for video annotation only)."""
        if getattr(self, "_last_probs_dev", None) is None:
            return None
        return np.asarray(self._last_probs_dev)

    def reset_streams(self, reset_mask: np.ndarray):
        """Zero prev-action for reset streams (cache masking is handled by the
        episode-window attention mask, as in training)."""
        self.prev_action[reset_mask] = 0

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        cfg: Config,
        ckpt_path: Optional[str],
        num_streams: int,
        mode: str = "greedy",
        seed: int = 123,
        test_augmentation: bool = True,
        max_episode_steps: Optional[int] = None,
        require_exact_tokenizer: bool = False,
    ) -> "InferenceAgent":
        """Checkpoint auto-detection: Orbax dir | torch file (3 reference
        formats) | None (random init)."""
        policy = SafeVLAPolicy(cfg.model)
        from safevla_tpu.models.scan_policy import trace_site

        with trace_site("init"):
            params = jax.jit(policy.init_params)(jax.random.PRNGKey(seed))
        if ckpt_path:
            from safevla_tpu.utils.checkpoint import resolve_checkpoint_path

            ckpt_path = resolve_checkpoint_path(ckpt_path)
            if os.path.isdir(ckpt_path):
                # native Orbax checkpoint: a trainer state (TrainState /
                # BCTrainState), a bare params tree, or a run output dir of
                # step_<N> children. Frozen vit/t5 restore too when saved, so
                # eval runs the exact backbone the policy was trained against.
                from safevla_tpu.utils.checkpoint import restore_policy_params

                params = restore_policy_params(ckpt_path, params)
            else:
                from safevla_tpu.models.convert import import_stacked_towers_from_torch

                stacked = import_stacked_towers_from_torch(
                    ckpt_path, cfg=cfg, num_towers=cfg.model.num_towers
                )
                params = {**params, "towers": stacked}
        return cls(
            cfg, params, num_streams, mode, seed, test_augmentation,
            max_episode_steps=max_episode_steps,
            require_exact_tokenizer=require_exact_tokenizer,
        )
