"""Online constrained-RL training loop.

The top of the stack: wires EnvPool -> RolloutRunner -> Learner with the
reference's 3-stage pipeline, checkpointing, and metric accumulation.
Replaces the reference's OnPolicyRunner + ExperimentConfig plugin architecture
(reference: training/online/allenact_trainer.py, dinov2_vits_tsfm_base.py)
with a ~200-line owned loop: the heavy lifting is all inside the two jitted
programs (rollout policy_step and learner update).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.algo.learner import Learner, TrainState
from safevla_tpu.config import Config
from safevla_tpu.models.actor_critic import SafeVLAPolicy
from safevla_tpu.rollout.env_pool import EnvPool
from safevla_tpu.rollout.runner import RolloutRunner
from safevla_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint


class MetricAccumulator:
    def __init__(self):
        self._sums = defaultdict(float)
        self._counts = defaultdict(int)

    def add(self, metrics: Dict[str, Any]):
        for k, v in metrics.items():
            if isinstance(v, (int, float, np.integer, np.floating)) and not isinstance(v, bool):
                self._sums[k] += float(v)
                self._counts[k] += 1
            elif isinstance(v, bool):
                self._sums[k] += float(v)
                self._counts[k] += 1

    def means(self) -> Dict[str, float]:
        return {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}

    def reset(self):
        self._sums.clear()
        self._counts.clear()


class OnlineTrainer:
    def __init__(
        self,
        cfg: Config,
        sampler_factory: Callable[[int], Any],
        mesh=None,
        num_workers: Optional[int] = None,
        log_fn: Optional[Callable[[Dict[str, Any], int], None]] = None,
        async_pipeline: Optional[bool] = None,
    ):
        self.cfg = cfg
        # None = follow the config (async by default — validated equivalent
        # to sync on the probe learning curves, TRAINCURVE.json)
        self.async_pipeline = (
            cfg.train.async_pipeline if async_pipeline is None else async_pipeline
        )
        self.policy = SafeVLAPolicy(cfg.model)
        self.learner = Learner(self.policy, cfg, mesh=mesh)
        self.pool = EnvPool(
            sampler_factory,
            num_streams=cfg.train.num_train_processes,
            num_workers=num_workers,
        )
        self.runner = RolloutRunner(
            self.policy, cfg, self.pool, seed=cfg.train.seed, mesh=mesh
        )
        self.log_fn = log_fn or self._default_log
        self.episode_accum = MetricAccumulator()
        self.output_dir = os.path.join(cfg.train.output_dir, cfg.train.tag)
        os.makedirs(self.output_dir, exist_ok=True)

    @staticmethod
    def _default_log(metrics: Dict[str, Any], step: int):
        printable = {
            k: (round(v, 4) if isinstance(v, float) else v) for k, v in metrics.items()
        }
        print(f"[step {step}] {json.dumps(printable, default=str)}", flush=True)

    # ------------------------------------------------------------------
    def init_state(self) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        state = self.learner.init(rng)
        from safevla_tpu.utils.checkpoint import resolve_checkpoint_path

        if self.cfg.train.resume_ckpt_path:
            path = resolve_checkpoint_path(self.cfg.train.resume_ckpt_path)
            state = restore_checkpoint(path, state)
            print(f"resumed from {path}")
        elif self.cfg.train.il_ckpt_path:
            from safevla_tpu.models.convert import load_reference_checkpoint

            state = load_reference_checkpoint(
                resolve_checkpoint_path(self.cfg.train.il_ckpt_path),
                state,
                cfg=self.cfg,
            )
        else:
            auto = latest_checkpoint(self.output_dir)
            if auto:
                state = restore_checkpoint(auto, state)
                print(f"auto-resumed from {auto}")
        return state

    # ------------------------------------------------------------------
    def train(
        self,
        total_steps: Optional[int] = None,
        train_state: Optional[TrainState] = None,
        max_wall_seconds: Optional[float] = None,
    ) -> TrainState:
        if self.async_pipeline:
            # the chunk programs slice T (never the batch axis), so on a mesh
            # each is dp-sharded exactly like the monolithic update — async
            # runs single-chip and multi-chip alike
            return self.train_async(total_steps, train_state, max_wall_seconds)
        cfg = self.cfg
        ts = train_state if train_state is not None else self.init_state()
        total = total_steps if total_steps is not None else cfg.train.total_steps
        last_save = int(ts.step)
        t_start = time.time()

        while int(ts.step) < total:
            step0 = int(ts.step)
            stage = self.learner.stage_for_step(step0)
            params = {"towers": ts.tower_params, **ts.frozen_params}

            batch, roll_stats = self.runner.collect(params, cfg.ppo.num_steps)
            if self.learner.mesh is not None:
                # act-path leaves come out sharded (T, B@dp) / replicated;
                # normalize every leaf to the update's (B@dp, ...) layout
                from safevla_tpu.parallel.mesh import shard_batch

                batch = shard_batch(self.learner.mesh, batch)
            ts, metrics = self.learner.update(
                ts, batch, roll_stats["mean_episode_cost"], stage
            )

            for m in self.runner.pop_metrics():
                self.episode_accum.add(m)

            step_now = int(ts.step)
            log = {
                "stage": stage,
                **{k: float(v) for k, v in metrics.items()},
                **roll_stats,
                "total_fps": (step_now - step0)
                / max(time.time() - t_start, 1e-9)
                if step_now == step0 + cfg.ppo.num_steps * self.pool.num_streams
                else None,
            }
            ep_means = self.episode_accum.means()
            if ep_means:
                log.update({f"ep/{k}": v for k, v in ep_means.items()})
            self.log_fn({k: v for k, v in log.items() if v is not None}, step_now)

            if step_now - last_save >= cfg.train.save_interval:
                path = save_checkpoint(self.output_dir, ts, step_now)
                last_save = step_now
                print(f"saved checkpoint {path}")

            if max_wall_seconds and time.time() - t_start > max_wall_seconds:
                break
        # force a final save: a wall-clock or total-steps exit otherwise loses
        # up to save_interval steps of fully computed updates
        step_now = int(ts.step)
        if step_now > last_save:
            path = save_checkpoint(self.output_dir, ts, step_now)
            print(f"saved final checkpoint {path}")
        return ts

    # ------------------------------------------------------------------
    def train_async(
        self,
        total_steps: Optional[int] = None,
        train_state: Optional[TrainState] = None,
        max_wall_seconds: Optional[float] = None,
    ) -> TrainState:
        """Async rollout/update pipeline (opt-in; SURVEY §7 step 8).

        While window k is collected, window k-1's update runs on the chip as
        a sequence of CHUNK-SIZED programs (learner.iter_chunked_update:
        fusion fwd per chunk -> decoder fwd+bwd -> fusion VJP per chunk ->
        apply; ~70-270 ms each). The rollout's interleave hook dispatches one
        program per time step, AFTER that step's act programs — device FIFO
        order then guarantees the latency-sensitive action fetches never wait
        behind update work, while the update fills the device-idle slices
        simulator stepping creates. (Whole-epoch programs — the previous
        design — stalled the act path for seconds per insertion and held an
        extra window of remat working set, OOMing 16 GB at fusion_chunk=512;
        per-chunk programs fix both.) Parameters apply with a one-window
        delay; each window's update starts from the parameters produced by
        the previous window's update (stale-by-one async PPO). Throughput
        approaches max(rollout_wall, rollout_busy + update_busy) instead of
        rollout_wall + update_wall.
        """
        cfg = self.cfg
        ts = train_state if train_state is not None else self.init_state()
        total = total_steps if total_steps is not None else cfg.train.total_steps
        last_save = int(ts.step)
        t_start = time.time()
        T = cfg.ppo.num_steps

        prev = None  # (generator, stage_id) of the window being trained
        box = {"result": None}
        act_params = {"towers": ts.tower_params, **ts.frozen_params}

        def pump(it) -> bool:
            """Advance the update generator one program; True when finished."""
            try:
                next(it)
                return False
            except StopIteration as stop:
                box["result"] = stop.value
                return True

        B = self.pool.num_streams
        # programs per env step so the whole update dispatches in-window
        pump_k = max(1, -(-self.learner.chunked_program_count(B, T) // T))
        # steps tracked host-side: reading the device step scalar (or the
        # metrics) at the window boundary would block the host behind the
        # update's device tail — everything here floats one window late
        step_now = int(ts.step)
        pending_log = None  # (metrics_dev, roll_stats, stage_id, step) to flush

        def flush_log(final: bool = False):
            nonlocal last_save, pending_log
            if pending_log is None:
                return
            metrics_dev, stats, stage_id, step = pending_log
            pending_log = None
            metrics = {k: float(v) for k, v in metrics_dev.items()}
            log = {"stage": stage_id, "async": True, **metrics, **stats}
            for m in self.runner.pop_metrics():
                self.episode_accum.add(m)
            ep_means = self.episode_accum.means()
            log.update({f"ep/{k}": v for k, v in ep_means.items()})
            log["total_fps"] = step / max(time.time() - t_start, 1e-9)
            self.log_fn(log, step)
            if final or step - last_save >= cfg.train.save_interval:
                path = save_checkpoint(self.output_dir, ts, step)
                last_save = step
                print(f"saved checkpoint {path}")

        while step_now < total:
            stage = self.learner.stage_for_step(step_now)
            done = {"v": prev is None}

            def interleave(t, done=done, prev=prev):
                for _ in range(pump_k):
                    if done["v"]:
                        break
                    done["v"] = pump(prev[0])

            batch, roll_stats = self.runner.collect(
                act_params, T, interleave_fn=interleave
            )
            if self.learner.mesh is not None:
                # normalize act-path leaf layouts to the update's (B@dp, ...)
                # sharding, as the sync path does
                from safevla_tpu.parallel.mesh import shard_batch

                batch = shard_batch(self.learner.mesh, batch)

            if prev is not None:
                while not done["v"]:  # finish any undispatched programs
                    done["v"] = pump(prev[0])
                # the previous window's log is surely materialized by now
                # (its programs precede this window's in the device FIFO)
                flush_log()
                ts, metrics_dev = box["result"]
                act_params = {"towers": ts.tower_params, **ts.frozen_params}
                step_now += B * T
                pending_log = (metrics_dev, roll_stats, prev[1], step_now)

            # window just collected: its update (captured with ITS stage)
            # runs while the next window is collected
            prev = (
                self.learner.iter_chunked_update(
                    ts, batch, roll_stats["mean_episode_cost"], stage
                ),
                stage,
            )

            if max_wall_seconds and time.time() - t_start > max_wall_seconds:
                break
        # drain the in-flight update so the returned state reflects all
        # collected windows
        if prev is not None:
            done_v = False
            while not done_v:
                done_v = pump(prev[0])
            flush_log()
            ts, metrics_dev = box["result"]
            step_now += B * T
            pending_log = (metrics_dev, roll_stats, prev[1], step_now)
            # final=True forces a save — the drained update is fully computed
            # and would otherwise be lost on a wall-clock/total-steps exit
            flush_log(final=True)
        return ts

    def close(self):
        self.pool.close()
