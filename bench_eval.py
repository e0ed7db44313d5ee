"""Evaluation-path throughput benchmark — VERDICT r3 item 6.

Drives `evaluation.agent.InferenceAgent.act` (the same batched jitted step
the evaluator uses) over B=8 streams with synthetic camera frames, matching
the reference's online-evaluation protocol of step-by-step greedy inference
(reference: online_evaluation/online_evaluator_worker.py:266-408 — one
agent per worker doing B=1 torch forwards; here ONE batched act serves all
streams). Prints ONE JSON line in the bench.py contract.

The reference publishes no eval throughput number; `vs_baseline` divides by
an ESTIMATED 80 frames/s for the reference protocol (8 workers x ~10
fps/worker on A100 — each worker re-runs the full preprocessor + decoder
per single-stream step). See PERFORMANCE.md "Eval-path throughput".
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    from bench import _probe_device

    metric = "eval_env_frames_per_sec_per_chip"
    if os.environ.get("BENCH_SKIP_PROBE", "0") != "1" and not _probe_device():
        print("# device probe failed: TPU tunnel unreachable", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": "tpu_unreachable: device probe timed out (tunnel down); no measurement taken",
                }
            )
        )
        return

    import jax

    from safevla_tpu.config import Config
    from safevla_tpu.evaluation.agent import InferenceAgent

    B = int(os.environ.get("BENCH_EVAL_STREAMS", "8"))
    steps = int(os.environ.get("BENCH_EVAL_STEPS", "64"))
    cfg = Config()
    agent = InferenceAgent.build(cfg, None, num_streams=B, mode="greedy")
    agent.set_instructions(["locate a vase and go to it"] * B)

    h, w = cfg.model.image_size
    rng = np.random.default_rng(0)
    nav = rng.integers(0, 255, (B, h, w, 3), dtype=np.uint8)
    manip = rng.integers(0, 255, (B, h, w, 3), dtype=np.uint8)
    not_reset = np.ones(B, np.int32)
    oih = np.zeros(B, np.int32)

    t0 = time.time()
    agent.act(nav, manip, not_reset, oih)
    print(f"# warmup (compile) {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(steps):
        agent.act(nav, manip, not_reset, oih)
    wall = time.time() - t0
    ms_per_step = wall / steps * 1000
    fps = B * steps / wall
    print(f"# {ms_per_step:.1f} ms/act @ {B} streams", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 80.0, 3),
                "context": {
                    "streams": B,
                    "ms_per_act": round(ms_per_step, 1),
                    "steps": steps,
                    # ADVICE r4: the reference publishes no eval throughput —
                    # the denominator is a stated estimate, not a measurement
                    "baseline_estimated": True,
                    "baseline_frames_per_sec": 80.0,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
