"""Measure per-jit-call dispatch overhead vs argument leaf count.

The rollout hot loop issues ~1k small programs per window, so host-side
per-dispatch cost is a first-order term on a one-core host (PERFORMANCE.md
"rollout is HOST-bound"). This tool isolates that cost: a trivial program
(`x + 1`) called with a params-like pytree of N tiny leaves, swept over N.
Run it on the default (axon) platform to see the tunnel client's per-leaf
marshaling, and with --cpu for the local-backend floor.

Usage: python tools/prof_dispatch.py [--cpu] [--leaves 20 80 140 290]
"""

import argparse
import sys
import time


def make_tree(n_leaves, jnp):
    tree = {}
    for i in range(n_leaves):
        block = f"block_{i % 24}"
        sub = f"mod_{(i // 24) % 5}"
        tree.setdefault(block, {}).setdefault(sub, {})[f"w_{i}"] = jnp.ones((8, 128))
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--leaves", type=int, nargs="+", default=[20, 80, 140, 290])
    ap.add_argument("--calls", type=int, default=300)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)

    @jax.jit
    def f(params, x):
        return x + 1.0

    x = jnp.zeros((8,))
    for n in args.leaves:
        tree = jax.device_put(make_tree(n, jnp))
        float(f(tree, x)[0])  # compile + settle
        # dispatch-only loop: no per-call fetch; one scalar fetch at the end
        # drains the pipeline (block_until_ready is lazy over axon)
        t0 = time.perf_counter()
        for _ in range(args.calls):
            y = f(tree, x)
        float(y[0])
        per_call = (time.perf_counter() - t0) / args.calls * 1e3
        print(f"leaves={n:4d}  {per_call:7.3f} ms/dispatch")


if __name__ == "__main__":
    main()
