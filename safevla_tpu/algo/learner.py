"""The constrained-PPO learner: ONE jitted update per rollout.

Replaces the reference's engine-side update loop (forked AllenAct: reward/cost
GAE in rollout storage, 4 update repeats over 1 minibatch, Adam + grad-norm
clip + NCCL all-reduce; configured at reference
training/online/dinov2_vits_tsfm_base.py:328-379) with a single compiled
program per pipeline stage:

    dual GAE (reward + cost fused in one scan)
    -> lambda ascent vs cost_limit (omnisafe Lagrange semantics)
    -> lax.scan over update repeats:
         full-sequence policy forward (traj-packed masks)
         stage-weighted losses (PPO-Lagrangian surrogate, value, cost-value)
         global-norm clip + Adam
    all sharded over the `dp` mesh axis; the gradient all-reduce is an XLA
    collective over ICI, not a separate communication library.

Only the tower parameters train; the frozen DINOv2/T5 params are closed over.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from safevla_tpu.algo import losses as L
from safevla_tpu.algo.lagrange import (
    LagrangeState,
    init_lagrange,
    multiplier_value,
    update_lagrange,
)
from safevla_tpu.config import Config
from safevla_tpu.models.actor_critic import SafeVLAPolicy
from safevla_tpu.ops.gae import dual_gae


class TrainState(NamedTuple):
    tower_params: Any
    frozen_params: Any  # {"vit": ..., "t5": ...}
    opt_state: optax.OptState
    lagrange: LagrangeState
    step: jax.Array  # env steps consumed so far (scalar int64-ish f32-safe)


class StageSpec(NamedTuple):
    """Static loss weights for one pipeline stage (resolved from the named
    losses in cfg.train.stages — reference PipelineStage loss_names)."""

    action_weight: float
    value_weight: float
    c_value_weight: float
    imitation_weight: float
    use_lagrange: bool


def stage_spec_from_config(stage_cfg, ppo) -> StageSpec:
    """Resolve a TrainingStageConfig's named losses into static weights.

    The PPO policy losses bundle their value terms at ppo.value_loss_coef
    (reference SafePPOLogGrad computes value+cost-value inside the loss with
    value_loss_coef=0.5, customized_loss.py:364-383); standalone value losses
    add at their own weight (critic-warmup stage trains them at 1.0).
    """
    names = list(stage_cfg.loss_names)
    weights = list(stage_cfg.loss_weights or [1.0] * len(names))
    if len(weights) != len(names):
        raise ValueError(
            f"loss_weights ({len(weights)}) must match loss_names ({len(names)})"
        )
    action = value = c_value = imitation = 0.0
    use_lagrange = False
    for name, w in zip(names, weights):
        if name == "ppo_log_loss":  # PPO-Lagrangian surrogate
            action += w
            value += w * ppo.value_loss_coef
            c_value += w * ppo.value_loss_coef
            use_lagrange = True
        elif name == "ppo_loss":
            # unconstrained PPO baseline: NO cost-value term. The reference's
            # plain-PPO configs pair PPOLogGrad with PPOValue only (no
            # SafePPOValue), so the cost critic stays untouched — add
            # safe_ppo_value_loss explicitly if a run wants it trained.
            action += w
            value += w * ppo.value_loss_coef
        elif name == "ppo_value_loss":
            value += w
        elif name == "safe_ppo_value_loss":
            c_value += w
        elif name == "imitation_bce_loss":
            imitation += w
        else:
            raise ValueError(f"Unknown loss name in pipeline stage: {name!r}")
    return StageSpec(
        action_weight=action,
        value_weight=value,
        c_value_weight=c_value,
        imitation_weight=imitation,
        use_lagrange=use_lagrange,
    )


class Learner:
    def __init__(self, policy: SafeVLAPolicy, cfg: Config, mesh: Optional[Mesh] = None):
        self.policy = policy
        self.cfg = cfg
        self.mesh = mesh
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.ppo.max_grad_norm),
            optax.adam(cfg.ppo.lr),
        )
        self._update_fns: Dict[Any, Any] = {}
        self.stage_specs = tuple(
            stage_spec_from_config(s, cfg.ppo) for s in cfg.train.stages
        )

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> TrainState:
        # Uncompiled flax init runs EAGERLY: over the axon tunnel every
        # distinct init op compiles server-side (~1 s each — 220 s of the
        # cold start, measured by tools/prof_cold_compile.py). One jitted
        # program compiles in ~35 s cold and hits the persistent compile
        # cache afterwards.
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            init_fn = jax.jit(
                self.policy.init_params,
                out_shardings=NamedSharding(self.mesh, P()),
            )
        else:
            init_fn = jax.jit(self.policy.init_params)
        # init-site lowering: rolled layer scans — once-per-process program,
        # identical param tree, several-fold faster compile (scan_policy.py).
        from safevla_tpu.models.scan_policy import trace_site

        with trace_site("init"):
            params = init_fn(rng)
        tower_params = params["towers"]
        frozen = {"vit": params["vit"], "t5": params["t5"]}
        opt_state = self.tx.init(tower_params)
        lag = init_lagrange(
            self.cfg.lagrange.cost_limit,
            self.cfg.lagrange.multiplier_init,
            self.cfg.lagrange.multiplier_lr,
            self.cfg.lagrange.multiplier_upper_bound,
        )
        state = TrainState(
            tower_params=tower_params,
            frozen_params=frozen,
            opt_state=opt_state,
            lagrange=lag,
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # the eagerly-built leaves (opt_state counters, lagrange, step)
            # live on device 0 only; the update jit requires one device set
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    # ------------------------------------------------------------------
    def _forward(self, tower_params, frozen_params, batch):
        params = {"towers": tower_params, **frozen_params}
        return self.policy.forward_seq(
            params,
            batch["dino_nav"],
            batch.get("dino_manip"),
            batch["text_hidden"],
            batch["text_mask"],
            batch["prev_actions"],
            batch["not_reset"],
            batch.get("object_in_hand"),
            batch["time_step"],
            batch["traj_idx"],
            batch.get("text_idx"),
        )

    def _loss_fn(self, tower_params, frozen_params, batch, lam, stage: StageSpec):
        out = self._forward(tower_params, frozen_params, batch)
        return self._loss_from_outputs(out, batch, lam, stage)

    def _loss_from_outputs(self, out, batch, lam, stage: StageSpec):
        """Stage-weighted losses given policy outputs (shared by the
        monolithic epoch and the chunk-decomposed async pipeline)."""
        ppo = self.cfg.ppo
        metrics = {}

        adv = batch["advantages"]
        c_adv = batch["c_advantages"]
        if stage.use_lagrange:
            penalized_adv = (adv - lam * c_adv) / (1.0 + lam)
        else:
            penalized_adv = adv

        log_probs = L.categorical_log_prob(out.logits, batch["actions"])
        action_loss = jnp.mean(
            L.clipped_surrogate(
                log_probs, batch["old_log_probs"], penalized_adv, ppo.clip_param
            )
        )
        entropy = jnp.mean(L.categorical_entropy(out.logits))
        if self.cfg.model.critic_type == "discrete":
            # HL-Gauss distributional critics train with cross-entropy on the
            # smeared return histogram (reference customized_loss.py:364-370)
            from safevla_tpu.ops.hl_gauss import HLGauss

            m = self.cfg.model
            hl = HLGauss(m.hl_gauss_min, m.hl_gauss_max, m.hl_gauss_bins, m.hl_gauss_sigma)
            v_loss = 0.5 * hl.loss(out.value_logits, batch["returns"])
            cv_loss = 0.5 * hl.loss(out.c_value_logits, batch["c_returns"])
        else:
            v_loss = L.value_loss(
                out.values,
                batch["returns"],
                batch["old_values"],
                ppo.clip_param,
                ppo.use_clipped_value_loss,
            )
            cv_loss = L.value_loss(
                out.c_values,
                batch["c_returns"],
                batch["old_c_values"],
                ppo.clip_param,
                ppo.use_clipped_value_loss,
            )
        total = (
            stage.action_weight * action_loss
            + stage.value_weight * v_loss
            + stage.c_value_weight * cv_loss
            - stage.action_weight * ppo.entropy_coef * entropy
        )
        if stage.imitation_weight:
            # expert-pickupable BCE aux loss (reference customized_loss.py:17-83)
            if "expert_pickupable" not in batch:
                raise KeyError(
                    "imitation_bce_loss is enabled for this stage but the "
                    "batch has no 'expert_pickupable' signal — add "
                    "ExpertPickupableSensor to the sensor suite"
                )
            imitation = L.imitation_bce_loss(
                out.logits, batch["expert_pickupable"].astype(jnp.float32)
            )
            total = total + stage.imitation_weight * imitation
            metrics["imitation"] = imitation
        metrics.update(
            action=action_loss,
            value=v_loss,
            c_value=cv_loss,
            entropy=entropy,
            total=total,
            approx_kl=jnp.mean(batch["old_log_probs"] - log_probs),
        )
        return total, metrics

    # ------------------------------------------------------------------
    def _make_update(self, stage_id: int):
        stage = self.stage_specs[min(stage_id, len(self.stage_specs) - 1)]
        ppo = self.cfg.ppo

        def update(train_state: TrainState, batch, mean_episode_cost):
            # 1. fused reward+cost GAE over the (T, B) layout
            rewards = jnp.stack([batch["rewards"].T, batch["costs"].T])  # (2, T, B)
            values = jnp.stack([batch["values"].T, batch["c_values"].T])  # (2, T+1, B)
            adv, ret = dual_gae(rewards, values, batch["masks"].T, ppo.gamma, ppo.gae_lambda)
            mb = dict(batch)
            mb["advantages"] = adv[0].T
            mb["c_advantages"] = adv[1].T
            mb["returns"] = ret[0].T
            mb["c_returns"] = ret[1].T
            mb["old_values"] = batch["values"][:, :-1]
            mb["old_c_values"] = batch["c_values"][:, :-1]
            if ppo.normalize_advantage:
                for k in ("advantages", "c_advantages"):
                    a = mb[k]
                    mb[k] = (a - a.mean()) / (a.std() + 1e-8)

            # 2. lambda ascent (only once lagrangian stages are active)
            lagrange = train_state.lagrange
            if stage.use_lagrange:
                lagrange = update_lagrange(
                    lagrange, mean_episode_cost, self.cfg.lagrange.multiplier_lr
                )
            lam = multiplier_value(lagrange)

            # 3. PPO epochs as a scan
            def one_epoch(carry, _):
                tower_params, opt_state = carry
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(tower_params, train_state.frozen_params, mb, lam, stage)
                metrics["grad_norm"] = optax.global_norm(grads)
                # reference allenact_dino_transformer.py:447-455 emits critic
                # weight/grad norms into extras for wandb
                metrics["weight_norm"] = optax.global_norm(tower_params)
                updates, opt_state = self.tx.update(grads, opt_state, tower_params)
                tower_params = optax.apply_updates(tower_params, updates)
                return (tower_params, opt_state), metrics

            (tower_params, opt_state), metrics = jax.lax.scan(
                one_epoch,
                (train_state.tower_params, train_state.opt_state),
                None,
                length=ppo.update_repeats,
            )
            metrics = jax.tree.map(lambda x: x[-1], metrics)
            metrics["lagrange_multiplier"] = lam
            metrics["mean_episode_cost"] = mean_episode_cost

            b, t = batch["rewards"].shape
            new_state = TrainState(
                tower_params=tower_params,
                frozen_params=train_state.frozen_params,
                opt_state=opt_state,
                lagrange=lagrange,
                step=train_state.step + b * t,
            )
            return new_state, metrics

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("dp"))
            return jax.jit(
                update,
                in_shardings=(repl, data, repl),
                out_shardings=(repl, repl),
            )
        return jax.jit(update)

    def update(
        self, train_state: TrainState, batch: Dict[str, jax.Array],
        mean_episode_cost, stage_id: int,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """One rollout's worth of learning. `stage_id` selects the pipeline
        stage (recompiles at most once per stage)."""
        key = min(int(stage_id), len(self.stage_specs) - 1)
        if key not in self._update_fns:
            self._update_fns[key] = self._make_update(key)
        return self._update_fns[key](
            train_state, batch, jnp.asarray(mean_episode_cost, jnp.float32)
        )

    # ------------------------------------------------------------------
    # split-program update: the async rollout/update pipeline dispatches one
    # PPO epoch at a time so act steps interleave with training on the chip
    # ------------------------------------------------------------------
    def _prepare_body(self, stage: StageSpec):
        """GAE -> advantages -> lambda ascent, shared by the split and
        chunked decompositions (identical math to the monolithic update's
        first phase)."""
        ppo = self.cfg.ppo

        def prepare(train_state: TrainState, batch, mean_episode_cost):
            rewards = jnp.stack([batch["rewards"].T, batch["costs"].T])
            values = jnp.stack([batch["values"].T, batch["c_values"].T])
            adv, ret = dual_gae(
                rewards, values, batch["masks"].T, ppo.gamma, ppo.gae_lambda
            )
            mb = dict(batch)
            mb["advantages"] = adv[0].T
            mb["c_advantages"] = adv[1].T
            mb["returns"] = ret[0].T
            mb["c_returns"] = ret[1].T
            mb["old_values"] = batch["values"][:, :-1]
            mb["old_c_values"] = batch["c_values"][:, :-1]
            if ppo.normalize_advantage:
                for k in ("advantages", "c_advantages"):
                    a = mb[k]
                    mb[k] = (a - a.mean()) / (a.std() + 1e-8)
            lagrange = train_state.lagrange
            if stage.use_lagrange:
                lagrange = update_lagrange(
                    lagrange, mean_episode_cost, self.cfg.lagrange.multiplier_lr
                )
            return mb, lagrange, multiplier_value(lagrange)

        return prepare

    def _make_split_update(self, stage_id: int):
        stage = self.stage_specs[min(stage_id, len(self.stage_specs) - 1)]

        prepare = self._prepare_body(stage)

        def epoch(tower_params, opt_state, frozen_params, mb, lam):
            (loss, metrics), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
                tower_params, frozen_params, mb, lam, stage
            )
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["weight_norm"] = optax.global_norm(tower_params)
            updates, opt_state = self.tx.update(grads, opt_state, tower_params)
            tower_params = optax.apply_updates(tower_params, updates)
            return tower_params, opt_state, metrics

        return jax.jit(prepare), jax.jit(epoch)

    def split_update_fns(self, stage_id: int):
        key = ("split", min(int(stage_id), len(self.stage_specs) - 1))
        if key not in self._update_fns:
            self._update_fns[key] = self._make_split_update(key[1])
        return self._update_fns[key]

    # ------------------------------------------------------------------
    # chunk-granular update: the PPO epoch decomposed into many small
    # device programs (fusion fwd per chunk -> one decoder fwd+bwd ->
    # fusion VJP per chunk -> optimizer apply). Functionally identical to
    # `update` (same remat structure, same accumulation order), but each
    # program runs ~70-270 ms on-device, so the async pipeline can weave
    # them into the rollout's device-idle gaps without stalling the
    # latency-sensitive act/fetch path the way whole-epoch programs did.
    # ------------------------------------------------------------------
    def _make_chunked_fns(self, stage_id: int, chunk_t: int, bwd_chunk_t: int):
        stage = self.stage_specs[min(stage_id, len(self.stage_specs) - 1)]
        policy = self.policy

        def embed_chunk(tower_params, frozen_params, mb, start_t, obs_buf):
            params = {"towers": tower_params, **frozen_params}
            emb = policy.embed_time_range(
                params,
                mb["dino_nav"],
                mb.get("dino_manip"),
                mb["text_hidden"],
                mb["text_mask"],
                mb.get("text_idx"),
                start_t,
                chunk_t,
            )
            return jax.lax.dynamic_update_slice_in_dim(
                obs_buf, emb.astype(obs_buf.dtype), start_t, axis=2
            )

        def decoder_grad(tower_params, mb, obs_buf, lam):
            def loss_part(tp, buf):
                out = policy.decode_from_embeds(
                    {"towers": tp},
                    buf,
                    mb["prev_actions"],
                    mb["not_reset"],
                    mb.get("object_in_hand"),
                    mb["time_step"],
                    mb["traj_idx"],
                )
                return self._loss_from_outputs(out, mb, lam, stage)

            (loss, metrics), (d_tp, d_obs) = jax.value_and_grad(
                loss_part, argnums=(0, 1), has_aux=True
            )(tower_params, obs_buf)
            return d_obs, d_tp, metrics

        def fusion_bwd_chunk(tower_params, frozen_params, mb, start_t, d_obs, grad_acc):
            # the VJP holds the fwd residuals of its whole range in HBM
            # (~qkv + FFN hidden per layer), so the backward runs at a
            # smaller range than the residual-free forward sweep — this is
            # what lets the async pipeline coexist with the rollout's
            # working set in 16 GB
            def primal(tp):
                return policy.embed_time_range(
                    {"towers": tp, **frozen_params},
                    mb["dino_nav"],
                    mb.get("dino_manip"),
                    mb["text_hidden"],
                    mb["text_mask"],
                    mb.get("text_idx"),
                    start_t,
                    bwd_chunk_t,
                )

            _, vjp = jax.vjp(primal, tower_params)
            d_chunk = jax.lax.dynamic_slice_in_dim(d_obs, start_t, bwd_chunk_t, axis=2)
            (g,) = vjp(d_chunk.astype(jnp.float32))
            return jax.tree.map(jnp.add, grad_acc, g)

        def apply(tower_params, opt_state, fusion_grads, decoder_grads):
            grads = jax.tree.map(jnp.add, fusion_grads, decoder_grads)
            extra = {
                "grad_norm": optax.global_norm(grads),
                "weight_norm": optax.global_norm(tower_params),
            }
            updates, opt_state = self.tx.update(grads, opt_state, tower_params)
            tower_params = optax.apply_updates(tower_params, updates)
            return tower_params, opt_state, extra

        def zeros_grads(tower_params):
            return jax.tree.map(jnp.zeros_like, tower_params)

        prepare = self._sharded_prepare(stage_id)
        if self.mesh is None:
            return {
                "prepare": prepare,
                "embed_chunk": jax.jit(embed_chunk, donate_argnums=(4,)),
                "decoder_grad": jax.jit(decoder_grad),
                "fusion_bwd_chunk": jax.jit(fusion_bwd_chunk, donate_argnums=(5,)),
                "apply": jax.jit(apply),
                "zeros_grads": jax.jit(zeros_grads),
            }
        # mesh: the batch (and the embedding buffer's B axis) shard over dp
        # exactly as in the monolithic update; grads come out replicated (the
        # all-reduce is an XLA collective inserted by the out_sharding)
        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("dp"))
        buf = NamedSharding(self.mesh, P(None, "dp"))  # (towers, B, T, D)
        return {
            "prepare": prepare,
            "embed_chunk": jax.jit(
                embed_chunk,
                in_shardings=(repl, repl, data, repl, buf),
                out_shardings=buf,
                donate_argnums=(4,),
            ),
            "decoder_grad": jax.jit(
                decoder_grad,
                in_shardings=(repl, data, buf, repl),
                out_shardings=(buf, repl, repl),
            ),
            "fusion_bwd_chunk": jax.jit(
                fusion_bwd_chunk,
                in_shardings=(repl, repl, data, repl, buf, repl),
                out_shardings=repl,
                donate_argnums=(5,),
            ),
            "apply": jax.jit(
                apply,
                in_shardings=(repl, repl, repl, repl),
                out_shardings=(repl, repl, repl),
            ),
            "zeros_grads": jax.jit(zeros_grads, out_shardings=repl),
        }

    def _sharded_prepare(self, stage_id: int):
        """The GAE/advantage/lambda prepare program, sharded when on a mesh
        (the split epoch fn stays single-chip-only; the chunked path is the
        mesh-capable decomposition)."""
        if self.mesh is None:
            return self.split_update_fns(stage_id)[0]
        key = ("prepare_mesh", min(int(stage_id), len(self.stage_specs) - 1))
        if key not in self._update_fns:
            prepare = self._prepare_body(self.stage_specs[key[1]])
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("dp"))
            self._update_fns[key] = jax.jit(
                prepare,
                in_shardings=(repl, data, repl),
                out_shardings=(data, repl, repl),
            )
        return self._update_fns[key]

    def chunked_update_fns(self, stage_id: int, chunk: int, bwd_chunk: int):
        key = (
            "chunked",
            min(int(stage_id), len(self.stage_specs) - 1),
            chunk,
            bwd_chunk,
        )
        if key not in self._update_fns:
            self._update_fns[key] = self._make_chunked_fns(key[1], chunk, bwd_chunk)
        return self._update_fns[key]

    def chunk_sizes(self, b: int, t: int) -> Tuple[int, int]:
        """(fwd_chunk_t, bwd_chunk_t) time-steps per chunk program for a
        (b, t) window. The config knobs stay in flat samples (the HBM unit
        that matters); each chunk processes all b streams x chunk_t steps,
        so the realized sample count is b * chunk_t rounded to >= the knob."""
        # None = follow fusion_chunk; 0 keeps the "one full-window chunk"
        # convention (same as fusion_chunk=0, actor_critic.py)
        cfg_chunk = self.cfg.model.async_fusion_chunk
        if cfg_chunk is None:
            cfg_chunk = self.cfg.model.fusion_chunk
        n = b * t
        chunk_flat = min(cfg_chunk or n, n)
        chunk_t = max(1, min(-(-chunk_flat // b), t))
        while t % chunk_t:
            chunk_t += 1  # next divisor of t upward keeps samples >= the knob
        bwd_chunk_t = max(chunk_t // 2, 1)
        while t % bwd_chunk_t:
            bwd_chunk_t -= 1
        return chunk_t, bwd_chunk_t

    def chunked_program_count(self, b: int, t: int) -> int:
        """Device programs iter_chunked_update dispatches for a (b, t)
        window — the async driver paces `ceil(count / T)` per env step."""
        chunk_t, bwd_chunk_t = self.chunk_sizes(b, t)
        return 1 + self.cfg.ppo.update_repeats * (t // chunk_t + t // bwd_chunk_t + 2)

    def iter_chunked_update(
        self, train_state: TrainState, batch, mean_episode_cost, stage_id: int
    ):
        """Generator form of `update`: yields once after enqueueing each
        device program (all dispatches are async), and returns
        (new_train_state, metrics) via StopIteration.value. The async
        trainer drives one program per env step; draining the generator in
        a tight loop reproduces the monolithic update's schedule. On a mesh
        every chunk program is dp-sharded exactly like the monolithic
        update (chunks slice T, never the batch axis)."""
        b, t = np.shape(batch["prev_actions"])
        chunk_t, bwd_chunk_t = self.chunk_sizes(b, t)
        n_chunks = t // chunk_t
        n_bwd_chunks = t // bwd_chunk_t
        fns = self.chunked_update_fns(stage_id, chunk_t, bwd_chunk_t)

        mb, lagrange, lam = fns["prepare"](
            train_state, batch, jnp.asarray(mean_episode_cost, jnp.float32)
        )
        yield
        tp, opt_state = train_state.tower_params, train_state.opt_state
        frozen = train_state.frozen_params
        towers = self.policy.num_towers
        d_model = self.cfg.model.hidden_size
        metrics = None
        zeros_buf = self._zeros_buf_fn((towers, b, t, d_model))
        for _ in range(self.cfg.ppo.update_repeats):
            obs_buf = zeros_buf()
            for c in range(n_chunks):
                obs_buf = fns["embed_chunk"](tp, frozen, mb, c * chunk_t, obs_buf)
                yield
            d_obs, g_dec, metrics = fns["decoder_grad"](tp, mb, obs_buf, lam)
            yield
            g_acc = fns["zeros_grads"](tp)
            for c in range(n_bwd_chunks):
                g_acc = fns["fusion_bwd_chunk"](
                    tp, frozen, mb, c * bwd_chunk_t, d_obs, g_acc
                )
                yield
            tp, opt_state, extra = fns["apply"](tp, opt_state, g_acc, g_dec)
            metrics = {**metrics, **extra}
            yield
        metrics["lagrange_multiplier"] = lam
        metrics["mean_episode_cost"] = jnp.asarray(mean_episode_cost, jnp.float32)
        new_state = TrainState(
            tower_params=tp,
            frozen_params=frozen,
            opt_state=opt_state,
            lagrange=lagrange,
            step=train_state.step + b * t,
        )
        return new_state, metrics

    def _zeros_buf_fn(self, buf_shape):
        """Cached (per shape) allocator for the (towers, B, T, D) embedding
        buffer — a fresh jit wrapper per window would retrace every window."""
        key = ("zeros_buf", buf_shape)
        if key not in self._update_fns:
            if self.mesh is None:
                self._update_fns[key] = lambda: jnp.zeros(buf_shape, jnp.float32)
            else:
                self._update_fns[key] = jax.jit(
                    lambda: jnp.zeros(buf_shape, jnp.float32),
                    out_shardings=NamedSharding(self.mesh, P(None, "dp")),
                )
        return self._update_fns[key]

    def chunked_update(self, train_state, batch, mean_episode_cost, stage_id: int):
        """Drain `iter_chunked_update` eagerly — the synchronous entry point
        (used by tests to check equivalence with `update`)."""
        it = self.iter_chunked_update(train_state, batch, mean_episode_cost, stage_id)
        while True:
            try:
                next(it)
            except StopIteration as stop:
                return stop.value

    # ------------------------------------------------------------------
    def stage_for_step(self, step: int) -> int:
        acc = 0
        for i, st in enumerate(self.cfg.train.stages):
            acc += st.max_stage_steps
            if step < acc:
                return i
        return len(self.cfg.train.stages) - 1
