"""Rollout runner: streams host observations through the jitted act path and
accumulates the training batch ON DEVICE.

TPU-native replacement for the reference's rollout machinery (AllenAct
SensorPreprocessorGraph on GPU + per-step `.to(device)` copies + mutable
rollout storage; SURVEY §3.1 boundaries #5). The per-step host<->device
traffic is engineered down to the minimum an on-policy loop permits:

  * ONE jitted `rollout_step` per stream-group: frame-bank gather ->
    normalize+augment -> frozen DINOv2 (both cameras batched) -> 3-tower act
    with KV cache -> action sampling (device-side PRNG) -> storage scatter at
    (t, group-offset). Policy state and the rollout buffer are donated.
  * ONE small host->device upload per group-step (a packed int32 vector) and
    ONE device->host fetch (the sampled actions), issued as an async copy so
    its ~latency hides behind host work.
  * PIPELINED GROUPS: streams split into `overlap_groups` phase-shifted
    halves — while the device computes group A's actions, the host steps
    group B's simulators (the "double-buffered host->device pipeline" the
    design calls for). On the bench link this roughly doubles rollout
    throughput; on real hosts it hides the simulator behind the chip.
  * Camera frames live in a content-addressed device bank: novel frames
    upload once, repeated frames are free; real simulators mostly miss and
    behave like a plain upload.
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
from safevla_tpu.constants import rgb_norm_constants
from safevla_tpu.models.actor_critic import PolicyState, SafeVLAPolicy
from safevla_tpu.models.scan_policy import trace_site
from safevla_tpu.preprocessing.augment import (
    apply_augment,
    identity_augment_params,
    sample_augment_params,
)
from safevla_tpu.preprocessing.tokenize import InstructionTokenizer
from safevla_tpu.rollout.env_pool import EnvPool, EnvStep
from safevla_tpu.utils.profiling import StageTimer

# packed per-stream int32 columns
(
    _PREV, _NOT_RESET, _OIH, _TSTEP, _TRAJ, _TEXT_SLOT, _NAV_ID, _MANIP_ID,
    _EXPERT_PICKUP,
) = range(9)
_N_COLS = 9
_N_META = 3  # (t, global_step, row_offset)


class DeviceFrameBank:
    """Content-addressed uint8 frame store on device.

    With a mesh the bank lives REPLICATED on every chip (96 uint8 slots
    ~= 24 MB — cheap), so every device's act-path shard gathers its group's
    frames locally with no cross-chip traffic."""

    def __init__(self, slots: int, frame_shape, dtype=jnp.uint8, mesh=None):
        self.slots = slots
        self.bank = jnp.zeros((slots,) + tuple(frame_shape), dtype)
        self._key_to_slot: Dict[int, int] = {}
        self._slot_keys: List[Optional[int]] = [None] * slots
        self._clock = 0
        self.hits = 0
        self.misses = 0
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            self.bank = jax.device_put(self.bank, repl)
            self._upload = jax.jit(
                lambda bank, slot, frame: bank.at[slot].set(frame),
                donate_argnums=0,
                in_shardings=(repl, repl, repl),
                out_shardings=repl,
            )
        else:
            self._upload = jax.jit(
                lambda bank, slot, frame: bank.at[slot].set(frame), donate_argnums=0
            )

    _hash_coeffs: Optional[np.ndarray] = None

    @staticmethod
    def frame_key(frame: np.ndarray) -> int:
        # full-frame key: two distinct frames must never alias to one slot
        # (a subsampled key silently fed the policy the wrong observation).
        # Universal linear hash over the uint64 view — vectorized numpy runs
        # ~3x faster than hash(tobytes()) on this host (no bytes copy), and
        # a random-odd-coefficient dot mod 2^64 keeps pairwise collision
        # probability at ~2^-64.
        flat = np.ascontiguousarray(frame).reshape(-1)
        pad = (-flat.size) % 8
        if pad:
            flat = np.pad(flat, (0, pad))
        words = flat.view(np.uint64)
        coeffs = DeviceFrameBank._hash_coeffs
        if coeffs is None or coeffs.size < words.size:
            rng = np.random.RandomState(0x5AFE)
            coeffs = (
                rng.randint(0, 2**62, max(words.size, 1), np.uint64) << np.uint64(1)
            ) | np.uint64(1)
            DeviceFrameBank._hash_coeffs = coeffs
        with np.errstate(over="ignore"):
            return int(np.dot(words, coeffs[: words.size]))

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
        overlap_groups: int = 2,
        use_frame_bank: Optional[bool] = None,
        mesh=None,
    ):
        self.policy = policy
        self.cfg = cfg
        self.pool = env_pool
        self.B = env_pool.num_streams
        self.tokenizer = tokenizer or InstructionTokenizer(
            cfg.model.text_backbone, cfg.model.text_max_tokens
        )
        self.E = text_table_slots
        if self.B % overlap_groups != 0:
            overlap_groups = 1
        self.n_groups = max(1, overlap_groups)
        self.G = self.B // self.n_groups
        self.mesh = mesh
        if mesh is not None:
            # multi-chip rollout (reference scales rollout one worker per GPU,
            # base.py:236-282): each group's act program shards its stream
            # axis over dp, so a v5e-8 computes 8x streams per dispatch. The
            # group width must tile the dp axis; shrink the group count (wider
            # groups) until it does.
            dp = mesh.shape["dp"]
            while self.n_groups > 1 and (self.B // self.n_groups) % dp != 0:
                self.n_groups //= 2
            self.G = self.B // self.n_groups
            if self.G % dp != 0:
                raise ValueError(
                    f"num_streams={self.B} must be divisible by dp={dp}"
                )

        self.base_rng = jax.random.PRNGKey(seed)
        self._aug_key = jax.random.PRNGKey(seed + 1)
        self._aug_params = identity_augment_params()
        self._aug_steps = 0
        self._global_step = 0
        self.frame_bank_slots = frame_bank_slots
        # the content-addressed bank pays off when simulators repeat frames
        # (static scenes, benches). Real sims emit unique frames every step:
        # there the hash is pure overhead, so the bank can be disabled — each
        # group-step then uploads its 2G frames directly.
        if use_frame_bank is None:
            import os as _os

            use_frame_bank = _os.environ.get("SAFEVLA_FRAME_BANK", "1") != "0"
        self.use_frame_bank = use_frame_bank
        self.frame_bank: Optional[DeviceFrameBank] = None

        L = cfg.model.text_max_tokens
        D = cfg.model.text_embed_size
        self.states = [self.policy.init_state(self.G, L) for _ in range(self.n_groups)]
        # bf16 tables: the fusion adapter consumes bf16 anyway, and the
        # update-time per-step gather halves its HBM traffic
        self.text_tables = [
            jnp.zeros((self.G, self.E, L, D), jnp.bfloat16) for _ in range(self.n_groups)
        ]
        self.text_mask_tables = [
            jnp.zeros((self.G, self.E, L), bool) for _ in range(self.n_groups)
        ]
        self.cur_slot = np.zeros(self.B, np.int32)
        self.instructions = [""] * self.B

        self.prev_action = np.zeros(self.B, np.int32)
        self.episode_costs = deque(maxlen=episode_cost_window)
        self.episode_metrics: List[Dict[str, Any]] = []
        self.running_episode_cost = np.zeros(self.B, np.float64)
        self.steps_in_current_house = np.zeros(self.B, np.int64)

        self._pending: List[Optional[tuple]] = [None] * self.n_groups
        self.timer = StageTimer()

        def _splice(storage, scratch, offset):
            for k in storage:
                val = scratch[k][0].astype(storage[k].dtype)
                start = (0, offset) + (0,) * (storage[k].ndim - 2)
                storage[k] = jax.lax.dynamic_update_slice(
                    storage[k], val[None], start
                )
            return storage

        # merged action fetch: one blocking device->host fetch per TIME STEP
        # (a concat of all groups' action vectors) instead of one per
        # (group, step). Over the device tunnel every blocking fetch pays an
        # RTT even when the async copy completed, so cutting the fetch count
        # n_groups-fold attacks the largest single rollout host line
        # (~2.3 ms x ~1k fetches/window measured in sync mode). Off by
        # default until measured on chip; meaningless at one group / with a
        # mesh (the mesh act path shards streams, not fetch structure).
        import os as _os

        self._merged_fetch = (
            _os.environ.get("SAFEVLA_MERGED_FETCH", "0") == "1"
            and mesh is None
            and self.n_groups > 1
        )

        if mesh is None:
            self._jit_rollout_step = jax.jit(self._rollout_step, donate_argnums=(1, 2))
            self._jit_encode_text = jax.jit(self._encode_text)
            self._jit_splice = jax.jit(_splice, donate_argnums=0)
            self._jit_concat_actions = jax.jit(lambda *xs: jnp.concatenate(xs))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            row = NamedSharding(mesh, P("dp"))  # (G, ...) leaves
            col = NamedSharding(mesh, P(None, "dp"))  # (T, B, ...) storage
            # KV-cache leaves are (towers, layers, B, S, H, Dh) — stream axis 2
            state_shard = PolicyState(
                cache=NamedSharding(mesh, P(None, None, "dp")),
                pos=repl,
                time_step=row,
                text_hidden=row,
                text_mask=row,
            )
            self._jit_rollout_step = jax.jit(
                self._rollout_step,
                donate_argnums=(1, 2),
                in_shardings=(repl, state_shard, col, repl, repl, repl),
                out_shardings=(row, row, row, state_shard, col),
            )
            self._jit_encode_text = jax.jit(
                self._encode_text, in_shardings=(repl, row, row), out_shardings=row
            )
            self._jit_splice = jax.jit(
                _splice,
                donate_argnums=0,
                in_shardings=(col, col, repl),
                out_shardings=col,
            )

        self._cur: List[Dict[str, Any]] = [None] * self.n_groups
        first_steps = self.pool.initial_steps()
        for g in range(self.n_groups):
            self._cur[g] = self._ingest(first_steps[self._lo(g) : self._hi(g)], g, first=True)

    # ------------------------------------------------------------------
    def _lo(self, g: int) -> int:
        return g * self.G

    def _hi(self, g: int) -> int:
        return (g + 1) * self.G

    # ------------------------------------------------------------------
    # jitted device program
    # ------------------------------------------------------------------
    def _encode_text(self, params, tokens, mask):
        return self.policy.encode_text(params, tokens, mask)

    def _rollout_step(self, params, state, storage, bank, packed, aug):
        """packed: flat int32 [G * _N_COLS + _N_META]: per-stream columns,
        then (t, global_step, row_offset)."""
        # act-site lowering: rolled layer scans (compile time) — fps ties the
        # unrolled form on this forward-only program (models/scan_policy.py).
        with trace_site("act"):
            return self._rollout_step_body(params, state, storage, bank, packed, aug)

    def _rollout_step_body(self, params, state, storage, bank, packed, aug):
        G = (packed.shape[0] - _N_META) // _N_COLS
        cols = packed[: G * _N_COLS].reshape(G, _N_COLS)
        t = packed[G * _N_COLS]
        gstep = packed[G * _N_COLS + 1]
        offset = packed[G * _N_COLS + 2]

        prev = cols[:, _PREV]
        not_reset = cols[:, _NOT_RESET]
        oih = cols[:, _OIH]
        tstep_obs = cols[:, _TSTEP]
        traj = cols[:, _TRAJ]
        text_slot = cols[:, _TEXT_SLOT]
        expert_pickup = cols[:, _EXPERT_PICKUP]

        frames = jnp.concatenate(
            [bank[cols[:, _NAV_ID]], bank[cols[:, _MANIP_ID]]], axis=0
        )
        means, stds = rgb_norm_constants(self.cfg.model.vision_backbone)
        x01 = apply_augment(frames.astype(jnp.float32) / 255.0, aug)
        x = (x01 - jnp.asarray(means)) / jnp.asarray(stds)
        feats = self.policy.encode_images(params, x)
        dino_nav, dino_manip = feats[:G], feats[G:]

        logits, v, cv, new_state = self.policy.act_step(
            params, state, dino_nav, dino_manip, prev, not_reset, oih
        )
        rng = jax.random.fold_in(self.base_rng, gstep)
        action = jax.random.categorical(rng, logits)
        logp = jax.nn.log_softmax(logits)[jnp.arange(G), action]

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
            "expert_pickupable": expert_pickup,
        }
        for k, val in step_data.items():
            val = val.astype(storage[k].dtype)[None]  # (1, G, ...)
            start = (t, offset) + (0,) * (storage[k].ndim - 2)
            storage[k] = jax.lax.dynamic_update_slice(storage[k], val, start)
        return action, v, cv, new_state, storage

    # ------------------------------------------------------------------
    def _alloc_storage(self, T: int, width: Optional[int] = None):
        gh, gw = self.cfg.model.vision_grid
        Dv = self.cfg.model.vision_feature_dim
        B = width or self.B
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
            "expert_pickupable": jnp.zeros((T, B), i32),
        }

    def _ingest(self, steps: List[EnvStep], g: int, first: bool = False) -> Dict[str, Any]:
        """Convert one group's EnvSteps into host arrays + bookkeeping."""
        obs = [s.obs for s in steps]
        new_episode = np.array([bool(s.new_episode) or first for s in steps], bool)
        lo = self._lo(g)

        if self.use_frame_bank:
            if self.frame_bank is None:
                shape = obs[0]["rgb_raw"].shape
                self.frame_bank = DeviceFrameBank(
                    self.frame_bank_slots, shape, mesh=self.mesh
                )
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
            frames = None
        else:
            nav_ids = np.arange(len(obs), dtype=np.int32)
            manip_ids = nav_ids + len(obs)
            frames = np.stack(
                [o["rgb_raw"] for o in obs]
                + [o.get("manipulation_rgb_raw", o["rgb_raw"]) for o in obs]
            )
        cur = {
            "nav_ids": nav_ids,
            "manip_ids": manip_ids,
            "frames": frames,
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
            "expert_pickup": np.array(
                [
                    int(np.asarray(o.get("expert_pickupable", 0)).reshape(-1)[0])
                    for o in obs
                ],
                np.int32,
            ),
            "new_episode": new_episode,
        }
        text_changed = False
        for i, s in enumerate(steps):
            bi = lo + i
            if (s.new_episode or first) and s.instruction is not None:
                if self.instructions[bi] != s.instruction or first:
                    self.instructions[bi] = s.instruction
                    text_changed = True
                    if not first:
                        # new instruction -> fresh table slot; repeats keep
                        # their slot (content identical, no re-encode)
                        self.cur_slot[bi] = (self.cur_slot[bi] + 1) % self.E
        if text_changed and hasattr(self, "_params_cache"):
            self._refresh_text(g)
        return cur

    def _refresh_text(self, g: int):
        """(Re-)encode group g's instructions; install into its policy state
        and episode table. Full-group encode keeps shapes static."""
        lo, hi = self._lo(g), self._hi(g)
        tokens, mask = self.tokenizer.encode_batch(self.instructions[lo:hi])
        hidden = self._jit_encode_text(
            self._params_cache, jnp.asarray(tokens), jnp.asarray(mask)
        )
        mask_j = jnp.asarray(mask)
        st = self.states[g]
        self.states[g] = PolicyState(
            cache=st.cache,
            pos=st.pos,
            time_step=st.time_step,
            text_hidden=hidden,
            text_mask=mask_j,
        )
        slots = jnp.asarray(self.cur_slot[lo:hi])
        r_idx = jnp.arange(self.G)
        self.text_tables[g] = self.text_tables[g].at[r_idx, slots].set(
            hidden.astype(jnp.bfloat16)
        )
        self.text_mask_tables[g] = self.text_mask_tables[g].at[r_idx, slots].set(mask_j)

    def _pack(self, g: int, t: int) -> np.ndarray:
        cur = self._cur[g]
        lo, hi = self._lo(g), self._hi(g)
        packed = np.empty(self.G * _N_COLS + _N_META, np.int32)
        cols = packed[: self.G * _N_COLS].reshape(self.G, _N_COLS)
        cols[:, _PREV] = self.prev_action[lo:hi]
        cols[:, _NOT_RESET] = (~cur["new_episode"]).astype(np.int32)
        cols[:, _OIH] = cur["oih"]
        cols[:, _TSTEP] = cur["time_step"]
        cols[:, _TRAJ] = cur["traj_idx"]
        cols[:, _TEXT_SLOT] = self.cur_slot[lo:hi]
        cols[:, _NAV_ID] = cur["nav_ids"]
        cols[:, _MANIP_ID] = cur["manip_ids"]
        cols[:, _EXPERT_PICKUP] = cur["expert_pickup"]
        packed[self.G * _N_COLS] = t
        packed[self.G * _N_COLS + 1] = self._global_step
        packed[self.G * _N_COLS + 2] = lo
        return packed

    # ------------------------------------------------------------------
    def _dispatch(self, g: int, t: int, storage):
        """Launch group g's device step; returns (future tuple, storage)."""
        if self.cfg.train.use_data_augmentation:
            # resample cadence matches the reference's per-batch counting:
            # one batch == one step across all groups
            if self._aug_steps % (self.cfg.train.max_steps * self.n_groups) == 0:
                self._aug_key, sub = jax.random.split(self._aug_key)
                self._aug_params = sample_augment_params(
                    sub, version=self.cfg.train.augmentation_version
                )
            self._aug_steps += 1
        with self.timer.section("dispatch"):
            action, v, cv, self.states[g], storage = self._jit_rollout_step(
                self._act_params,
                self.states[g],
                storage,
                self._bank_for(g),
                jnp.asarray(self._pack(g, t)),
                self._aug_params,
            )
            if not self._merged_fetch:  # merged mode copies the concat instead
                try:
                    action.copy_to_host_async()
                except Exception:
                    pass
        self._global_step += 1
        return (action, v, cv), storage

    def _bank_for(self, g: int):
        if self.use_frame_bank:
            return self.frame_bank.bank
        return jnp.asarray(self._cur[g]["frames"])

    def _env_step_group(
        self, g: int, t: int, actions_host: np.ndarray, rewards, costs
    ):
        lo, hi = self._lo(g), self._hi(g)
        cfg = self.cfg
        force = list(
            self.steps_in_current_house[lo:hi]
            >= cfg.train.steps_in_house_before_force_scene_advance
        )
        with self.timer.section("env_step"):
            env_steps = self.pool.step_slice(
                lo, hi, [int(a) for a in actions_host], force
            )
        self.steps_in_current_house[lo:hi] += 1
        for i, s in enumerate(env_steps):
            bi = lo + i
            rewards[t, bi] = s.reward
            costs[t, bi] = s.cost
            self.running_episode_cost[bi] += s.cost
            if s.done:
                self.episode_costs.append(self.running_episode_cost[bi])
                self.running_episode_cost[bi] = 0.0
                if s.metrics:
                    self.episode_metrics.append(s.metrics)
                if s.new_episode:
                    self.steps_in_current_house[bi] = 0
        self.prev_action[lo:hi] = actions_host
        with self.timer.section("ingest"):
            self._cur[g] = self._ingest(env_steps, g)

    # ------------------------------------------------------------------
    def collect(self, params, num_steps: int, interleave_fn=None):
        """Collect a rollout window; returns (learner batch, stats).

        Software-pipelined over stream groups: at the top of each time step
        every group has an in-flight device step; draining group g's actions
        and stepping its simulators overlaps the other groups' device work,
        and g's next dispatch overlaps the remaining groups' env stepping.

        `interleave_fn(t)`, when given, is invoked after each completed time
        step — the async training pipeline uses it to enqueue one PPO-epoch
        program of the PREVIOUS window between this window's act programs
        (device FIFO interleaving; see training/online.py).
        """
        T = num_steps
        cfg = self.cfg
        self._params_cache = params
        # the act program touches only the ViT + towers; dropping the unused
        # T5 subtree cuts ~70 leaves from the per-dispatch pytree flatten
        # (~1.2 ms/call at 300 leaves x 1024 dispatches/window — real seconds
        # on this one-core host). encode_text keeps the full params.
        self._act_params = {
            k: params[k] for k in ("vit", "towers") if k in params
        }
        if not getattr(self, "_text_initialized", False):
            for g in range(self.n_groups):
                self._refresh_text(g)
            self._text_initialized = True

        storage = self._alloc_storage(T)
        rewards = np.zeros((T, self.B), np.float32)
        costs = np.zeros((T, self.B), np.float32)
        masks = np.ones((T + 1, self.B), np.float32)
        wall_t0 = time.time()

        # prime: every group gets an in-flight device step for t=0
        inflight: List[Optional[tuple]] = [None] * self.n_groups
        for g in range(self.n_groups):
            masks[0, self._lo(g) : self._hi(g)] = (
                ~self._cur[g]["new_episode"]
            ).astype(np.float32)
            if self._pending[g] is not None:
                action, v, cv, scratch = self._pending[g]
                storage = self._jit_splice(storage, scratch, self._lo(g))
                inflight[g] = (action, v, cv)
                self._pending[g] = None
            else:
                inflight[g], storage = self._dispatch(g, 0, storage)

        def _merge(infl):
            # one (B,) actions array per time step; the async copy makes the
            # single blocking fetch next iteration (usually) a local read.
            # Timed as dispatch so the merged-vs-per-group A/B sees the added
            # concat program, not just the saved fetches.
            with self.timer.section("dispatch"):
                merged = self._jit_concat_actions(*[a for (a, _, _) in infl])
                try:
                    merged.copy_to_host_async()
                except Exception:
                    pass
            return merged

        merged = _merge(inflight) if self._merged_fetch else None

        for t in range(T):
            if self._merged_fetch:
                with self.timer.section("action_fetch"):
                    all_actions = np.asarray(merged)
            for g in range(self.n_groups):
                if self._merged_fetch:
                    actions_host = all_actions[self._lo(g) : self._hi(g)]
                else:
                    action, v, cv = inflight[g]
                    with self.timer.section("action_fetch"):
                        actions_host = np.asarray(action)
                self._env_step_group(g, t, actions_host, rewards, costs)
                if t + 1 < T:
                    masks[t + 1, self._lo(g) : self._hi(g)] = (
                        ~self._cur[g]["new_episode"]
                    ).astype(np.float32)
                    inflight[g], storage = self._dispatch(g, t + 1, storage)
                else:
                    inflight[g] = None
            if self._merged_fetch and t + 1 < T:
                merged = _merge(inflight)
            if interleave_fn is not None:
                interleave_fn(t)

        # bootstrap forward on the T-th observation per group; its result is
        # reused as next window's step 0
        boot_v, boot_cv = [], []
        for g in range(self.n_groups):
            masks[T, self._lo(g) : self._hi(g)] = (
                ~self._cur[g]["new_episode"]
            ).astype(np.float32)
            scratch = self._alloc_storage(1, width=self.G)
            pk = self._pack(g, 0)
            pk[self.G * _N_COLS + 2] = 0  # scratch row offset
            with self.timer.section("dispatch"):
                action, v, cv, self.states[g], scratch = self._jit_rollout_step(
                    self._act_params,
                    self.states[g],
                    scratch,
                    self._bank_for(g),
                    jnp.asarray(pk),
                    self._aug_params,
                )
            self._global_step += 1
            self._pending[g] = (action, v, cv, scratch)
            boot_v.append(v)
            boot_cv.append(cv)

        wall = time.time() - wall_t0

        # window-boundary batch assembly: ~17 lazy device dispatches
        # (swapaxes/concat views) + 3 small host->device uploads. Timed
        # separately from the rollout wall so the boundary serialization is
        # visible per window (VERDICT r4 item 6).
        assemble_t0 = time.time()
        tr = lambda x: jnp.swapaxes(x, 0, 1)
        v_boot = jnp.concatenate(boot_v)[:, None]
        cv_boot = jnp.concatenate(boot_cv)[:, None]
        batch = {
            "dino_nav": tr(storage["dino_nav"]),
            "dino_manip": tr(storage["dino_manip"]),
            "text_hidden": jnp.concatenate(self.text_tables, axis=0),
            "text_mask": jnp.concatenate(self.text_mask_tables, axis=0),
            "text_idx": tr(storage["text_idx"]),
            "prev_actions": tr(storage["prev_actions"]),
            "not_reset": tr(storage["not_reset"]),
            "object_in_hand": tr(storage["object_in_hand"]),
            "time_step": tr(storage["time_step"]),
            "traj_idx": tr(storage["traj_idx"]),
            "actions": tr(storage["actions"]),
            "old_log_probs": tr(storage["old_log_probs"]),
            "expert_pickupable": tr(storage["expert_pickupable"]),
            "rewards": jnp.asarray(rewards).T,
            "costs": jnp.asarray(costs).T,
            "values": jnp.concatenate([tr(storage["values"]), v_boot], axis=1),
            "c_values": jnp.concatenate([tr(storage["c_values"]), cv_boot], axis=1),
            "masks": jnp.asarray(masks).T,
        }
        assemble_wall = time.time() - assemble_t0
        stats = {
            "rollout_seconds": wall,
            "assemble_seconds": assemble_wall,
            "env_frames": T * self.B,
            "frames_per_second": T * self.B / max(wall, 1e-9),
            "mean_episode_cost": float(np.mean(self.episode_costs))
            if self.episode_costs
            else 0.0,
            "episodes_completed": len(self.episode_metrics),
            "frame_bank_hit_rate": (
                self.frame_bank.hits
                / max(self.frame_bank.hits + self.frame_bank.misses, 1)
                if self.frame_bank is not None
                else 0.0
            ),
            **self.timer.summary(),
        }
        return batch, stats

    def pop_metrics(self) -> List[Dict[str, Any]]:
        out = self.episode_metrics
        self.episode_metrics = []
        return out
