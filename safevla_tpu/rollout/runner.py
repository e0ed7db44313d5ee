"""Rollout runner: streams host observations through the jitted act path and
accumulates the training batch ON DEVICE.

TPU-native replacement for the reference's rollout machinery (AllenAct
SensorPreprocessorGraph on GPU + per-step `.to(device)` copies + mutable
rollout storage; SURVEY §3.1 boundaries #5). The per-step host<->device
traffic is engineered down to the minimum an on-policy loop permits:

  * ONE jitted `rollout_step`: frame-bank gather -> normalize+augment ->
    frozen DINOv2 (both cameras batched) -> 3-tower act with KV cache ->
    action sampling (device-side PRNG) -> storage scatter at slot t. Policy
    state and the rollout buffer are donated, so nothing round-trips.
  * ONE small host->device upload per step (a packed int32 vector with
    prev-action/reset/oih/time/traj/text-slot columns + frame-bank ids) and
    ONE device->host fetch (the sampled actions). On latency-bound links
    (the bench chip sits behind a tunnel with ~30ms RTT) this is the
    difference between ~1 fps-per-stream and wire speed.
  * Camera frames live in a device-resident bank with content-hash admission:
    novel frames upload once (per-frame DMA), repeated frames (synthetic envs,
    static cameras) are free. Real simulators mostly miss -> behave like the
    plain path.
  * Instruction encodings are computed once per episode (the reference
    re-runs tokenizer+T5 every policy step) and cached in the policy state
    AND a per-stream episode table used by the update-time gather.
  * The bootstrap forward at window end doubles as the first act of the next
    window (no duplicated compute at window boundaries).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.config import Config
from safevla_tpu.constants import DINO_RGB_MEANS, DINO_RGB_STDS
from safevla_tpu.models.actor_critic import PolicyState, SafeVLAPolicy
from safevla_tpu.preprocessing.augment import (
    apply_augment,
    identity_augment_params,
    sample_augment_params,
)
from safevla_tpu.preprocessing.tokenize import InstructionTokenizer
from safevla_tpu.rollout.env_pool import EnvPool, EnvStep
from safevla_tpu.utils.profiling import StageTimer

# packed per-step int32 columns
_PREV, _NOT_RESET, _OIH, _TSTEP, _TRAJ, _TEXT_SLOT, _NAV_ID, _MANIP_ID = range(8)
_N_COLS = 8


class DeviceFrameBank:
    """Content-addressed uint8 frame store on device."""

    def __init__(self, slots: int, frame_shape, dtype=jnp.uint8):
        self.slots = slots
        self.bank = jnp.zeros((slots,) + tuple(frame_shape), dtype)
        self._key_to_slot: Dict[int, int] = {}
        self._slot_keys: List[Optional[int]] = [None] * slots
        self._clock = 0
        self.hits = 0
        self.misses = 0
        self._upload = jax.jit(
            lambda bank, slot, frame: bank.at[slot].set(frame), donate_argnums=0
        )

    @staticmethod
    def frame_key(frame: np.ndarray) -> int:
        return hash(frame[::16, ::16, :].tobytes())

    def get_slot(self, frame: np.ndarray) -> int:
        key = self.frame_key(frame)
        slot = self._key_to_slot.get(key)
        if slot is not None:
            self.hits += 1
            return slot
        self.misses += 1
        slot = self._clock
        self._clock = (self._clock + 1) % self.slots
        old = self._slot_keys[slot]
        if old is not None:
            self._key_to_slot.pop(old, None)
        self._slot_keys[slot] = key
        self._key_to_slot[key] = slot
        self.bank = self._upload(self.bank, slot, jnp.asarray(frame))
        return slot


class RolloutRunner:
    def __init__(
        self,
        policy: SafeVLAPolicy,
        cfg: Config,
        env_pool: EnvPool,
        tokenizer: Optional[InstructionTokenizer] = None,
        seed: int = 0,
        text_table_slots: int = 16,
        episode_cost_window: int = 100,
        frame_bank_slots: int = 96,
    ):
        self.policy = policy
        self.cfg = cfg
        self.pool = env_pool
        self.B = env_pool.num_streams
        self.tokenizer = tokenizer or InstructionTokenizer(
            cfg.model.text_backbone, cfg.model.text_max_tokens
        )
        self.E = text_table_slots
        self.base_rng = jax.random.PRNGKey(seed)
        self._aug_key = jax.random.PRNGKey(seed + 1)
        self._aug_params = identity_augment_params()
        self._aug_steps = 0
        self._global_step = 0
        self.frame_bank_slots = frame_bank_slots
        self.frame_bank: Optional[DeviceFrameBank] = None

        L = cfg.model.text_max_tokens
        D = cfg.model.text_embed_size
        self.state = policy.init_state(self.B, L)
        self.text_table = jnp.zeros((self.B, self.E, L, D), jnp.float32)
        self.text_mask_table = jnp.zeros((self.B, self.E, L), bool)
        self.cur_slot = np.zeros(self.B, np.int32)
        self.instructions = [""] * self.B

        self.prev_action = np.zeros(self.B, np.int32)
        self.episode_costs = deque(maxlen=episode_cost_window)
        self.episode_metrics: List[Dict[str, Any]] = []
        self.running_episode_cost = np.zeros(self.B, np.float64)
        self.steps_in_current_house = np.zeros(self.B, np.int64)

        self._pending = None  # bootstrap step reuse across windows
        self.timer = StageTimer()
        self._jit_rollout_step = jax.jit(self._rollout_step, donate_argnums=(1, 2))
        self._jit_encode_text = jax.jit(self._encode_text)

        def _splice(storage, scratch):
            for k in storage:
                storage[k] = jax.lax.dynamic_update_index_in_dim(
                    storage[k], scratch[k][0].astype(storage[k].dtype), 0, axis=0
                )
            return storage

        self._jit_splice = jax.jit(_splice, donate_argnums=0)

        self._cur = self._ingest(self.pool.initial_steps(), first=True)

    # ------------------------------------------------------------------
    # jitted device program
    # ------------------------------------------------------------------
    def _encode_text(self, params, tokens, mask):
        return self.policy.encode_text(params, tokens, mask)

    def _rollout_step(self, params, state, storage, bank, packed, aug):
        """packed: flat int32 [B * _N_COLS + 2]: per-stream columns, then
        (t, global_step)."""
        B = self.B
        cols = packed[: B * _N_COLS].reshape(B, _N_COLS)
        t = packed[B * _N_COLS]
        gstep = packed[B * _N_COLS + 1]

        prev = cols[:, _PREV]
        not_reset = cols[:, _NOT_RESET]
        oih = cols[:, _OIH]
        tstep_obs = cols[:, _TSTEP]
        traj = cols[:, _TRAJ]
        text_slot = cols[:, _TEXT_SLOT]

        frames = jnp.concatenate(
            [bank[cols[:, _NAV_ID]], bank[cols[:, _MANIP_ID]]], axis=0
        )
        x01 = apply_augment(frames.astype(jnp.float32) / 255.0, aug)
        x = (x01 - jnp.asarray(DINO_RGB_MEANS)) / jnp.asarray(DINO_RGB_STDS)
        feats = self.policy.encode_images(params, x)
        dino_nav, dino_manip = feats[:B], feats[B:]

        logits, v, cv, new_state = self.policy.act_step(
            params, state, dino_nav, dino_manip, prev, not_reset, oih
        )
        rng = jax.random.fold_in(self.base_rng, gstep)
        action = jax.random.categorical(rng, logits)
        logp = jax.nn.log_softmax(logits)[jnp.arange(B), action]

        step_data = {
            "dino_nav": dino_nav,
            "dino_manip": dino_manip,
            "actions": action,
            "prev_actions": prev,
            "old_log_probs": logp,
            "values": v,
            "c_values": cv,
            "not_reset": not_reset,
            "object_in_hand": oih,
            "time_step": tstep_obs,
            "traj_idx": traj,
            "text_idx": text_slot,
        }
        for k, val in step_data.items():
            storage[k] = jax.lax.dynamic_update_index_in_dim(
                storage[k], val.astype(storage[k].dtype), t, axis=0
            )
        return action, v, cv, new_state, storage

    # ------------------------------------------------------------------
    def _alloc_storage(self, T: int):
        gh, gw = self.cfg.model.vision_grid
        Dv = self.cfg.model.vision_feature_dim
        B = self.B
        f32, i32 = jnp.float32, jnp.int32
        return {
            "dino_nav": jnp.zeros((T, B, gh, gw, Dv), jnp.bfloat16),
            "dino_manip": jnp.zeros((T, B, gh, gw, Dv), jnp.bfloat16),
            "actions": jnp.zeros((T, B), i32),
            "prev_actions": jnp.zeros((T, B), i32),
            "old_log_probs": jnp.zeros((T, B), f32),
            "values": jnp.zeros((T, B), f32),
            "c_values": jnp.zeros((T, B), f32),
            "not_reset": jnp.zeros((T, B), i32),
            "object_in_hand": jnp.zeros((T, B), i32),
            "time_step": jnp.zeros((T, B), i32),
            "traj_idx": jnp.zeros((T, B), i32),
            "text_idx": jnp.zeros((T, B), i32),
        }

    def _ingest(self, steps: List[EnvStep], first: bool = False) -> Dict[str, Any]:
        obs = [s.obs for s in steps]
        new_episode = np.array([bool(s.new_episode) or first for s in steps], bool)

        if self.frame_bank is None:
            shape = obs[0]["rgb_raw"].shape
            self.frame_bank = DeviceFrameBank(self.frame_bank_slots, shape)

        nav_ids = np.array(
            [self.frame_bank.get_slot(o["rgb_raw"]) for o in obs], np.int32
        )
        manip_ids = np.array(
            [
                self.frame_bank.get_slot(o.get("manipulation_rgb_raw", o["rgb_raw"]))
                for o in obs
            ],
            np.int32,
        )
        cur = {
            "nav_ids": nav_ids,
            "manip_ids": manip_ids,
            "time_step": np.array([int(o["time_step"]) for o in obs], np.int32),
            "traj_idx": np.array(
                [int(o["traj_index"]) % self.cfg.model.traj_max_idx for o in obs],
                np.int32,
            ),
            "oih": np.array(
                [
                    int(np.asarray(o.get("an_object_is_in_hand", 0)).reshape(-1)[0])
                    for o in obs
                ],
                np.int32,
            ),
            "new_episode": new_episode,
        }
        text_changed = False
        for i, s in enumerate(steps):
            if (s.new_episode or first) and s.instruction is not None:
                if self.instructions[i] != s.instruction or first:
                    self.instructions[i] = s.instruction
                    text_changed = True
                    if not first:
                        # a new instruction gets a fresh table slot; repeats
                        # keep their slot (content identical, no re-encode)
                        self.cur_slot[i] = (self.cur_slot[i] + 1) % self.E
        if text_changed and hasattr(self, "_params_cache"):
            self._refresh_text()
        return cur

    def _refresh_text(self):
        """(Re-)encode all current instructions; install into policy state and
        the per-stream episode table. Full-batch encode keeps shapes static."""
        tokens, mask = self.tokenizer.encode_batch(self.instructions)
        hidden = self._jit_encode_text(
            self._params_cache, jnp.asarray(tokens), jnp.asarray(mask)
        )
        mask_j = jnp.asarray(mask)
        self.state = PolicyState(
            cache=self.state.cache,
            pos=self.state.pos,
            time_step=self.state.time_step,
            text_hidden=hidden,
            text_mask=mask_j,
        )
        slots = jnp.asarray(self.cur_slot)
        b_idx = jnp.arange(self.B)
        self.text_table = self.text_table.at[b_idx, slots].set(hidden)
        self.text_mask_table = self.text_mask_table.at[b_idx, slots].set(mask_j)

    def _pack(self, t: int) -> np.ndarray:
        cur = self._cur
        packed = np.empty(self.B * _N_COLS + 2, np.int32)
        cols = packed[: self.B * _N_COLS].reshape(self.B, _N_COLS)
        cols[:, _PREV] = self.prev_action
        cols[:, _NOT_RESET] = (~cur["new_episode"]).astype(np.int32)
        cols[:, _OIH] = cur["oih"]
        cols[:, _TSTEP] = cur["time_step"]
        cols[:, _TRAJ] = cur["traj_idx"]
        cols[:, _TEXT_SLOT] = self.cur_slot
        cols[:, _NAV_ID] = cur["nav_ids"]
        cols[:, _MANIP_ID] = cur["manip_ids"]
        packed[self.B * _N_COLS] = t
        packed[self.B * _N_COLS + 1] = self._global_step
        return packed

    # ------------------------------------------------------------------
    def collect(self, params, num_steps: int):
        """Collect a rollout window; returns (learner batch, stats)."""
        T = num_steps
        cfg = self.cfg
        self._params_cache = params
        if not getattr(self, "_text_initialized", False):
            self._refresh_text()
            self._text_initialized = True

        storage = self._alloc_storage(T)
        rewards = np.zeros((T, self.B), np.float32)
        costs = np.zeros((T, self.B), np.float32)
        masks = np.ones((T + 1, self.B), np.float32)
        wall_t0 = time.time()

        pending = self._pending
        self._pending = None
        for t in range(T):
            if cfg.train.use_data_augmentation:
                if self._aug_steps % cfg.train.max_steps == 0:
                    self._aug_key, sub = jax.random.split(self._aug_key)
                    self._aug_params = sample_augment_params(sub)
                self._aug_steps += 1

            masks[t] = (~self._cur["new_episode"]).astype(np.float32)
            if pending is not None:
                # bootstrap from the previous window becomes step 0; re-store
                # its data at slot 0 of the fresh storage
                action, v, cv, storage = self._restore_pending(pending, storage)
                pending = None
            else:
                with self.timer.section("dispatch"):
                    action, v, cv, self.state, storage = self._jit_rollout_step(
                        params,
                        self.state,
                        storage,
                        self.frame_bank.bank,
                        jnp.asarray(self._pack(t)),
                        self._aug_params,
                    )
                self._global_step += 1

            with self.timer.section("action_fetch"):
                actions_host = np.asarray(action)

            force = list(
                self.steps_in_current_house
                >= cfg.train.steps_in_house_before_force_scene_advance
            )
            with self.timer.section("env_step"):
                env_steps = self.pool.step([int(a) for a in actions_host], force)
            self.steps_in_current_house += 1

            for i, s in enumerate(env_steps):
                rewards[t, i] = s.reward
                costs[t, i] = s.cost
                self.running_episode_cost[i] += s.cost
                if s.done:
                    self.episode_costs.append(self.running_episode_cost[i])
                    self.running_episode_cost[i] = 0.0
                    if s.metrics:
                        self.episode_metrics.append(s.metrics)
                    if s.new_episode:
                        self.steps_in_current_house[i] = 0
            self.prev_action = actions_host.copy()
            with self.timer.section("ingest"):
                self._cur = self._ingest(env_steps)

        # bootstrap forward on the T-th observation: compute into a 1-slot
        # scratch storage and keep it for the next window's step 0
        scratch = self._alloc_storage(1)
        action, v, cv, self.state, scratch = self._jit_rollout_step(
            params,
            self.state,
            scratch,
            self.frame_bank.bank,
            jnp.asarray(self._pack(0)),
            self._aug_params,
        )
        self._global_step += 1
        self._pending = (action, v, cv, scratch)
        masks[T] = (~self._cur["new_episode"]).astype(np.float32)

        wall = time.time() - wall_t0

        tr = lambda x: jnp.swapaxes(x, 0, 1)
        batch = {
            "dino_nav": tr(storage["dino_nav"]),
            "dino_manip": tr(storage["dino_manip"]),
            "text_hidden": self.text_table,
            "text_mask": self.text_mask_table,
            "text_idx": tr(storage["text_idx"]),
            "prev_actions": tr(storage["prev_actions"]),
            "not_reset": tr(storage["not_reset"]),
            "object_in_hand": tr(storage["object_in_hand"]),
            "time_step": tr(storage["time_step"]),
            "traj_idx": tr(storage["traj_idx"]),
            "actions": tr(storage["actions"]),
            "old_log_probs": tr(storage["old_log_probs"]),
            "rewards": jnp.asarray(rewards).T,
            "costs": jnp.asarray(costs).T,
            "values": jnp.concatenate([tr(storage["values"]), v[:, None]], axis=1),
            "c_values": jnp.concatenate([tr(storage["c_values"]), cv[:, None]], axis=1),
            "masks": jnp.asarray(masks).T,
        }
        stats = {
            "rollout_seconds": wall,
            "env_frames": T * self.B,
            "frames_per_second": T * self.B / max(wall, 1e-9),
            "mean_episode_cost": float(np.mean(self.episode_costs))
            if self.episode_costs
            else 0.0,
            "episodes_completed": len(self.episode_metrics),
            "frame_bank_hit_rate": self.frame_bank.hits
            / max(self.frame_bank.hits + self.frame_bank.misses, 1),
            **self.timer.summary(),
        }
        return batch, stats

    def _restore_pending(self, pending, storage):
        action, v, cv, scratch = pending
        return action, v, cv, self._jit_splice(storage, scratch)

    def pop_metrics(self) -> List[Dict[str, Any]]:
        out = self.episode_metrics
        self.episode_metrics = []
        return out
