"""Benchmark: vmapped Lotka-Volterra adjoint-gradient solves/sec on one chip.

North-star metric from BASELINE.json: 10k vmapped LV adjoint-gradient solves
per second on a single TPU v5e chip, tolerance-matched to CVODES BDF at
rtol=1e-8.  The reference's own number for one adjoint forward+backward pair
is 1.25 ms on the author's CPU (BASELINE.md — from_sympy.ipynb cell 7), i.e.
800 gradient pairs/sec single-threaded; ``vs_baseline`` is measured
throughput divided by that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_GRADS_PER_SEC = 800.0  # 1.25 ms per adjoint pair (BASELINE.md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--quick", action="store_true", help="small batch smoke run")
    ap.add_argument("--rtol", type=float, default=1e-8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    if args.quick:
        args.batch = 256
        args.repeats = 1

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge

    fn, _ = ge._build(
        batch=args.batch, tvals_n=21, rtol=args.rtol, checkpoint_n=384
    )
    rng = np.random.default_rng(42)
    y0s = jnp.asarray(
        np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((args.batch, 2)))
    )
    p_subs = jnp.asarray(
        np.array([1.0, 0.3]) * (1 + 0.05 * rng.standard_normal((args.batch, 2)))
    )

    step = jax.jit(fn)
    # compile + warmup
    gy, gp = step(y0s, p_subs)
    gy.block_until_ready()
    n_finite = int(jnp.isfinite(gy).all(axis=-1).sum())
    assert n_finite == args.batch, f"only {n_finite}/{args.batch} chains succeeded"

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        gy, gp = step(y0s, p_subs)
        gy.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    throughput = args.batch / dt

    print(
        json.dumps(
            {
                "metric": "lv_adjoint_grads_per_sec_10k_vmapped"
                if not args.quick
                else "lv_adjoint_grads_per_sec_quick",
                "value": round(throughput, 1),
                "unit": "grad_solves/sec",
                "vs_baseline": round(throughput / REFERENCE_GRADS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
