"""The constrained-PPO loop optimizes: reward rises, cost is penalized,
lambda responds (VERDICT r4 item 1).

Runs the FULL online stack (MultiTaskSampler -> RolloutRunner -> 3-stage
Learner -> OnlineTrainer) on the closed-form ConstrainedBandit probe
(safevla_tpu/tasks/probe.py) for a small budget and asserts the qualitative
curve shape. The full-scale artifact (400 updates, sync + async overlay,
convergence to the constrained optimum) is tools/train_curve.py ->
TRAINCURVE.json; this regression test guards the dynamics at ~1/4 budget.
"""

from __future__ import annotations

import numpy as np
import pytest

from safevla_tpu.tasks.probe import (
    ConstrainedBanditTask,
    make_probe_sampler_factory,
    probe_train_config,
)
from safevla_tpu.training.online import OnlineTrainer

UPDATES = 130
WARMUP = 10
EP_STEPS = 8
COST_LIMIT = 2.0


def _run_probe(async_pipeline: bool = False):
    cfg = probe_train_config(
        UPDATES,
        "ConstrainedBandit",
        streams=4,
        rollout_steps=EP_STEPS,
        episode_steps=EP_STEPS,
        cost_limit=COST_LIMIT,
        warmup_updates=WARMUP,
    )
    series = []

    def log_fn(metrics, step):
        series.append({"step": step, **metrics})

    trainer = OnlineTrainer(
        cfg, make_probe_sampler_factory(cfg, episode_max_steps=EP_STEPS),
        mesh=None, num_workers=0, log_fn=log_fn, async_pipeline=async_pipeline,
    )
    # per-window episode means (the production accumulator smooths over the
    # whole run, which would hide the curve)
    orig = trainer.log_fn

    def windowed(metrics, step):
        orig(metrics, step)
        trainer.episode_accum.reset()

    trainer.log_fn = windowed
    try:
        trainer.train()
    finally:
        trainer.close()
    return series


def _check_dynamics(series):
    rl = [r for r in series if r.get("stage", 1) >= 1]
    assert len(rl) > 60, f"too few RL updates logged: {len(rl)}"
    reward = [r["ep/total_reward"] for r in rl if "ep/total_reward" in r]
    cost = [r["mean_episode_cost"] for r in rl]
    lam = [r["lagrange_multiplier"] for r in rl]
    ent = [r["entropy"] for r in rl]

    tail = max(1, len(reward) // 8)
    initial_r = float(np.mean(reward[:10]))
    final_r = float(np.mean(reward[-tail:]))
    optima = ConstrainedBanditTask.optima(EP_STEPS, COST_LIMIT)

    # reward learning: the policy left the random baseline far behind and
    # beats the all-safe policy (i.e. it exploits the risky budget)
    assert final_r > 2.0 * max(initial_r, 0.25), (initial_r, final_r)
    assert final_r > optima["safe_only_return"] * 0.9, (final_r, optima)

    # the cost signal was hit: cost overshot the limit while lambda was
    # still small (the unconstrained pull), and lambda rose in response
    assert max(cost) > COST_LIMIT, max(cost)
    assert max(lam) > 0.05, max(lam)

    # lambda only ever moves while a lagrangian stage is active, and the
    # projected multiplier stays >= 0
    assert min(lam) >= 0.0

    # the policy sharpened
    assert float(np.mean(ent[-tail:])) < float(np.mean(ent[:10]))


@pytest.mark.slow
def test_constrained_ppo_learns_and_lambda_responds():
    series = _run_probe(async_pipeline=False)
    _check_dynamics(series)


@pytest.mark.slow
def test_constrained_ppo_learns_async_pipeline():
    """The stale-by-one async pipeline trains the same dynamics (VERDICT r4
    item 2a: async's training quality validated, not just its throughput)."""
    series = _run_probe(async_pipeline=True)
    _check_dynamics(series)
