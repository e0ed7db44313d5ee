"""Offline IL (behavior cloning) throughput benchmark — VERDICT r2 item 5.

Measures the jitted BC train step at the reference configuration
(reference: training/offline/train_pl.py:42-45 — batch 16, window 50,
AdamW 1e-4; DINOv2-S frozen, 2 cameras 224x384) on one chip and prints ONE
JSON line in the same contract as bench.py.

The reference publishes no offline throughput number; `vs_baseline` divides
by an ESTIMATED 1,000 frames/s for the reference A6000 Lightning trainer
(ViT forward over 2*B*T frames dominates at ~24 TFLOP/step; a well-tuned
mixed-precision A6000 run lands near ~1k frames/s) — see PERFORMANCE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

from safevla_tpu.config import Config
from safevla_tpu.preprocessing.augment import sample_augment_params
from safevla_tpu.training.offline import OfflineTrainer


def main():
    from bench import _probe_device

    if os.environ.get("BENCH_SKIP_PROBE", "0") != "1" and not _probe_device():
        print("# device probe failed: TPU tunnel unreachable", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "bc_frames_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": "tpu_unreachable: device probe timed out (tunnel down); no measurement taken",
                }
            )
        )
        return
    B = int(os.environ.get("BENCH_BC_BATCH", "16"))
    T = int(os.environ.get("BENCH_BC_WINDOW", "50"))
    iters = int(os.environ.get("BENCH_BC_ITERS", "10"))
    cfg = Config()
    trainer = OfflineTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer._frozen_cache = state.frozen_params

    h, w = cfg.model.image_size
    rng = np.random.default_rng(0)
    host_batch = {
        "rgb_nav": rng.integers(0, 255, (B, T, h, w, 3), dtype=np.uint8),
        "rgb_manip": rng.integers(0, 255, (B, T, h, w, 3), dtype=np.uint8),
        "last_actions": rng.integers(0, cfg.model.num_actions, (B, T)).astype(np.int32),
        "actions": rng.integers(0, cfg.model.num_actions, (B, T)).astype(np.int32),
        "time_ids": np.tile(np.arange(T, dtype=np.int32), (B, 1)),
        "an_object_is_in_hand": np.zeros((B, T), np.int32),
        "instructions": ["locate a vase and go to it"] * B,
    }
    batch = trainer.prepare_batch(host_batch, state.frozen_params)
    aug = sample_augment_params(jax.random.PRNGKey(1), version=cfg.train.augmentation_version)

    t0 = time.time()
    state, metrics = trainer._jit_step(state, batch, aug)
    float(metrics["bc_loss"])
    warm = time.time() - t0
    print(f"# warmup (compile) {warm:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(iters):
        state, metrics = trainer._jit_step(state, batch, aug)
    float(metrics["bc_loss"])  # force: block_until_ready is lazy over axon
    dt = (time.time() - t0) / iters
    fps = B * T / dt

    # FLOP accounting for the MFU line: frozen ViT fwd over 2*B*T frames +
    # tower fwd+bwd (fusion+decoder, no ViT backward — frozen params are a
    # separate non-diff argument).
    try:
        cost = trainer._jit_step.lower(state, batch, aug).compile().cost_analysis()
        tflop = float(cost.get("flops", 0.0)) / 1e12
    except Exception:  # noqa: BLE001
        tflop = 0.0
    if tflop:
        print(
            f"# bc step {dt*1000:.0f} ms, ~{tflop:.0f} TFLOP -> "
            f"{tflop/dt:.0f} TFLOP/s ({tflop/dt/197*100:.0f}% of v5e bf16 peak)",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "bc_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
