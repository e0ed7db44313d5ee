"""Raw int8-vs-bf16 matmul throughput probe at the frozen-ViT shapes.

Motivation: the act-path DINOv2 forward is frozen compute at ~55% of bf16
peak (PERFORMANCE.md round-4 ViT study). v5e's MXU doubles its rate at int8
(~394 TOPS vs ~197 bf16 TFLOP/s). Before building a W8A8 path into the
backbone, measure whether XLA actually reaches the int8 rate at OUR shapes —
ViT-S matmuls are (B*T=28672, 384) x (384, {1152, 384, 1536}) — and how much
activation quantization costs on top (dynamic per-row scales, and the static
calibrated-scale best case).

Timing: per variant, ONE jitted program runs an on-device fori_loop chaining
all four shapes; each matmul's per-ROW mean feeds the next input, so every
output element is consumed (consuming out[0,0] alone let XLA slice the whole
matmul to one row x one column: the first attempt read 306 "TF/s", above the
chip's bf16 peak). The program returns one (M,) vector reduced to a scalar
fetched via np.asarray — over the axon tunnel block_until_ready is lazy, so
only a real fetch bounds the device work (see tools/prof_vit.py scalarize).

Run on the real chip: `python tools/exp_int8_matmul.py`.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

M = int(os.environ.get("EXP_M", str(64 * 448)))  # 64 frames x 448 tokens
SHAPES = [(384, 1152), (384, 384), (384, 1536), (1536, 384)]
ITERS = int(os.environ.get("EXP_ITERS", "100"))
TOTAL_FLOPS = sum(2 * M * k * n for k, n in SHAPES)


def make_inputs(rng):
    xs, ws, xis, wis, wss = [], [], [], [], []
    for k, n in SHAPES:
        xs.append(jnp.asarray(rng.randn(M, k), jnp.bfloat16))
        ws.append(jnp.asarray(rng.randn(k, n) * 0.05, jnp.bfloat16))
        xis.append(jnp.asarray(rng.randint(-16, 17, (M, k)), jnp.int8))
        wis.append(jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8))
        wss.append(jnp.asarray(rng.rand(n), jnp.float32))
    return xs, ws, xis, wis, wss


def device_loop(step_all):
    """step_all(r: (M,) f32) -> (M,) f32; ITERS on-device reps, one fetch."""

    @jax.jit
    def run():
        r = jax.lax.fori_loop(
            0, ITERS, lambda _, r: step_all(r), jnp.zeros((M,), jnp.float32)
        )
        return jnp.sum(r)

    float(np.asarray(run()))  # warm/compile
    t0 = time.perf_counter()
    float(np.asarray(run()))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.RandomState(0)
    xs, ws, xis, wis, wss = make_inputs(rng)

    def bf_all(r):
        for x, w in zip(xs, ws):
            a = x + r[:, None].astype(jnp.bfloat16)
            out = a @ w
            r = jnp.mean(out.astype(jnp.float32), axis=-1) * 1e-3
        return r

    def i8_all(r):
        # pure int8 chain: measures the MXU int8 rate + the same feedback
        for xi, wi in zip(xis, wis):
            a = xi + r[:, None].astype(jnp.int8)
            out = jax.lax.dot_general(
                a, wi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            r = jnp.mean(out.astype(jnp.float32), axis=-1) * 1e-6
        return r

    def w8a8_dynamic(r):
        # dynamic per-row activation scales: full production cost
        for x, wi, wsc in zip(xs, wis, wss):
            a = x + r[:, None].astype(jnp.bfloat16)
            s = jnp.max(jnp.abs(a), axis=-1, keepdims=True).astype(jnp.float32)
            scale = jnp.maximum(s, 1e-8) / 127.0
            q = jnp.round(a.astype(jnp.float32) / scale).astype(jnp.int8)
            out = jax.lax.dot_general(
                q, wi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            deq = out.astype(jnp.float32) * scale * wsc
            r = jnp.mean(deq, axis=-1) * 1e-3
        return r

    def w8a8_static(r):
        # calibrated (static) activation scale: quantize is one fused
        # multiply+round+cast pass, no max reduction — int8's best case
        for x, wi, wsc in zip(xs, wis, wss):
            a = x + r[:, None].astype(jnp.bfloat16)
            q = jnp.round(a.astype(jnp.float32) * 8.0).astype(jnp.int8)
            out = jax.lax.dot_general(
                q, wi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            deq = out.astype(jnp.float32) * (0.125 * wsc)
            r = jnp.mean(deq, axis=-1) * 1e-3
        return r

    results = {}
    for name, fn in [
        ("bf16", bf_all),
        ("int8", i8_all),
        ("w8a8_dynamic", w8a8_dynamic),
        ("w8a8_static", w8a8_static),
    ]:
        t = device_loop(fn)
        results[name] = dict(ms_per_iter=t * 1e3, eff_tflops=TOTAL_FLOPS / t / 1e12)
        print(
            f"{name:13s} 4-shape chain: {t*1e3:7.3f} ms/iter "
            f"({TOTAL_FLOPS/t/1e12:6.1f} eff TF/s)",
            flush=True,
        )
    print(json.dumps({"M": M, "shapes": SHAPES, "iters": ITERS, **results}))


if __name__ == "__main__":
    main()
