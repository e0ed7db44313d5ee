"""Offline IL (behavior cloning) throughput benchmark — VERDICT r2 item 5.

Measures the jitted BC train step at the reference configuration
(reference: training/offline/train_pl.py:42-45 — batch 16, window 50,
AdamW 1e-4; DINOv2-S frozen, 2 cameras 224x384) on one chip and prints ONE
JSON line in the same contract as bench.py.

The reference publishes no offline throughput number; `vs_baseline` divides
by an ESTIMATED 1,000 frames/s for the reference A6000 Lightning trainer
(the frozen ViT forward over 2*B*T frames is the largest component, ~35 of
the step's ~65 analytic TFLOP; a well-tuned mixed-precision A6000 run lands
near ~1k frames/s) — see PERFORMANCE.md "Offline MFU resolved" (r5).
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


def _ensure_bench_chores(root: str, episodes: int, ep_len: int, h: int, w: int) -> str:
    """Build (once, cached) a CHORES-format dataset at production frame size
    for the --real-data path: hdf5 sensor files + per-episode camera .npy
    files read from disk through the full ChoresDataset pipeline. The manip
    camera is a hardlink to the nav camera file (halves the on-disk size;
    the reader decodes each independently, so the measured host work is
    unchanged)."""
    import h5py

    from safevla_tpu.constants import ALL_STRETCH_ACTIONS
    from safevla_tpu.utils.string_codec import convert_string_to_byte

    # the marker records the build parameters: a cached store built for a
    # different (episodes, ep_len, h, w) must be rebuilt, not silently reused
    # (ADVICE r4: a larger BENCH_BC_BATCH/WINDOW either crashed the len()
    # assert confusingly or changed the measured host decode work)
    params = f"episodes={episodes},ep_len={ep_len},h={h},w={w}"
    done = os.path.join(root, ".complete")
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == params:
                return root
        import shutil

        print(f"# bench chores store params changed; rebuilding {root}", file=sys.stderr)
        for entry in os.listdir(root):
            p = os.path.join(root, entry)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    rng = np.random.default_rng(0)
    houses = {}
    n_houses = max(1, episodes // 4)
    per_house = episodes // n_houses
    spec = json.dumps(
        {
            "task_type": "ObjectNavType",
            "synsets": ["mug.n.01"],
            "synset_to_object_ids": {"mug.n.01": ["Mug|1"]},
            "broad_synset_to_object_ids": {"mug.n.01": ["Mug|1"]},
            "extras": {},
        }
    )
    for hi in range(n_houses):
        house = f"{hi + 1:06d}"
        house_dir = os.path.join(root, "train", house)
        os.makedirs(house_dir, exist_ok=True)
        sub_ids = []
        with h5py.File(os.path.join(house_dir, "hdf5_sensors.hdf5"), "w") as f:
            for ep in range(per_house):
                sub_id = str(ep)
                sub_ids.append(sub_id)
                grp = f.create_group(sub_id)
                actions = [""] + [
                    ALL_STRETCH_ACTIONS[int(rng.integers(len(ALL_STRETCH_ACTIONS)))]
                    for _ in range(ep_len - 1)
                ]
                grp.create_dataset(
                    "last_action_str",
                    data=np.stack([convert_string_to_byte(a, 20) for a in actions]),
                )
                grp.create_dataset(
                    "templated_task_spec",
                    data=convert_string_to_byte(spec, 2 * len(spec)).reshape(1, -1),
                )
                grp.create_dataset("last_agent_location", data=np.zeros((1, 6)))
                grp.create_dataset(
                    "an_object_is_in_hand", data=np.zeros((ep_len, 1), np.int64)
                )
                frames = rng.integers(0, 255, (ep_len, h, w, 3), dtype=np.uint8)
                nav = os.path.join(house_dir, f"raw_navigation_camera__{sub_id}.npy")
                manip = os.path.join(house_dir, f"raw_manipulation_camera__{sub_id}.npy")
                np.save(nav, frames)
                if not os.path.exists(manip):
                    os.link(nav, manip)
        houses[house] = sub_ids
    with open(os.path.join(root, "house_id_to_sub_house_id_train.json"), "w") as f:
        json.dump(houses, f)
    with open(done, "w") as f:
        f.write(params)
    return root


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
    # separate non-diff argument). Analytic, NOT cost_analysis(): the
    # compiled-step counter undercounts ~2x (pallas custom calls report zero
    # FLOPs; the chunked fusion's while body is counted once, not per trip —
    # measured r5, PERFORMANCE.md "Offline MFU resolved").
    from safevla_tpu.algo.flops import bc_step_flops_estimate

    tflop = bc_step_flops_estimate(cfg, B, T) / 1e12
    try:
        cost = trainer._jit_step.lower(state, batch, aug).compile().cost_analysis()
        xla_tflop = float(cost.get("flops", 0.0)) / 1e12
    except Exception:  # noqa: BLE001
        xla_tflop = 0.0
    mfu_pct = tflop / dt / 197 * 100
    print(
        f"# bc step {dt*1000:.0f} ms, ~{tflop:.0f} TFLOP analytic -> "
        f"{tflop/dt:.0f} TFLOP/s ({mfu_pct:.0f}% of v5e bf16 peak); "
        f"xla cost_analysis says {xla_tflop:.0f} TFLOP (undercount, see flops.py)",
        file=sys.stderr,
    )
    line = {
        "metric": "bc_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 1000.0, 3),
        "context": {
            "baseline_estimated": True,
            "baseline_frames_per_sec": 1000.0,
            "tflop_analytic": round(tflop, 1),
            "mfu_pct": round(mfu_pct, 1),
        },
    }

    # --real-data (or BENCH_BC_REAL=1): feed the SAME jitted step from a
    # CHORES-format dataset on disk via the prefetching batch pipeline
    # (training/offline.py prepared_batches) and report the step-time
    # inflation vs the resident-batch number above — VERDICT r3 item 8.
    if "--real-data" in sys.argv or os.environ.get("BENCH_BC_REAL", "0") == "1":
        from safevla_tpu.data.chores import ChoresDataset, collate_window_batch

        root = os.environ.get(
            "BENCH_BC_DATA_DIR",
            os.path.expanduser("~/.cache/safevla_bench_chores"),
        )
        os.makedirs(root, exist_ok=True)
        print("# building/validating the on-disk chores store...", file=sys.stderr)
        _ensure_bench_chores(root, episodes=B, ep_len=T + 4, h=h, w=w)
        ds = ChoresDataset(root, "train", sliding_window=T)
        assert len(ds) >= B, (len(ds), B)

        def host_batches(rounds: int):
            for _ in range(rounds):
                yield collate_window_batch(
                    [ds[i] for i in range(B)], window=T, pad_token=ds.pad_token
                )

        # host-side cost alone (decode + collate, no device)
        rounds_host = max(2, iters // 4)
        t0 = time.time()
        for _ in host_batches(rounds_host):
            pass
        dt_host = (time.time() - t0) / rounds_host
        print(f"# host decode+collate alone: {dt_host*1000:.0f} ms/batch", file=sys.stderr)

        def run_real(n):
            nonlocal state  # _jit_step donates its input state: thread it
            t0 = time.time()
            for pb in trainer.prepared_batches(host_batches(n)):
                b = trainer.attach_text(pb, state.frozen_params)
                state, m = trainer._jit_step(state, b, aug)
            float(m["bc_loss"])
            return (time.time() - t0) / n

        dt_real = run_real(iters)
        cfg.offline.prefetch_batches = 0
        dt_sync = run_real(max(2, iters // 2))
        cfg.offline.prefetch_batches = 2
        inflation = (dt_real - dt) / dt * 100
        print(
            f"# real-data step {dt_real*1000:.0f} ms (prefetch 2) vs "
            f"{dt_sync*1000:.0f} ms (sync prep) vs resident {dt*1000:.0f} ms "
            f"-> {inflation:+.1f}% inflation",
            file=sys.stderr,
        )
        line["context"] = {
            "real_data_fps": round(B * T / dt_real, 1),
            "real_data_inflation_pct": round(inflation, 1),
            "real_data_sync_prep_ms": round(dt_sync * 1000, 1),
            "host_prep_ms": round(dt_host * 1000, 1),
            "prefetch_batches": 2,
        }

    print(json.dumps(line))


if __name__ == "__main__":
    main()
