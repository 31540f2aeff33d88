"""Pallas whole-attempt kernel, second attempt: flatter 2-D layouts.

Round-2 result (ops/pallas_step.py): the fused df64 PECE attempt as a
Pallas kernel with (K, n, B) operands ran ~2.4 ms at B=10k vs ~0.15 ms for
plain-XLA emulated f64 — Mosaic tiles every (n=2, B) slice to (8, B), so
3/4 of each VPU op is padding, and the K-loop generates many tiny sliced
ops.

This experiment re-runs the same math with the flattened (K*n, B) layout
(14 useful rows per 16-row tile instead of 2 per 8) and row-broadcast
weight columns, measuring against the same two baselines on the chip.
Run:  python scripts/exp_pallas2d.py  (needs the TPU; ~2 min first compile)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sunode_tpu.ops.adams import _GAMMA, _GAMMA_STAR
from sunode_tpu.ops.df64 import DF
from sunode_tpu.ops.pallas_step import (
    FUNCTIONAL_ITERS,
    adams_pece_attempt_pallas,
    adams_pece_attempt_reference,
)

N = 2  # LV states
K = 7  # difference history rows (adams_max_order=6 -> K=7)
P = 6  # order
B = 10240


def lv_rhs_df(t, y):
    """LV right-hand side on DF pairs; y is DF with .hi/.lo of (n, B)."""
    hares = DF(y.hi[0:1], y.lo[0:1])
    lynx = DF(y.hi[1:2], y.lo[1:2])
    alpha, beta, gamma_, delta = 1.0, 0.3, 1.0, 0.4
    hl = hares * lynx
    d_h = hares * alpha - hl * beta
    d_l = hl * delta - lynx * gamma_
    return DF(
        jnp.concatenate([d_h.hi, d_l.hi]), jnp.concatenate([d_h.lo, d_l.lo])
    )


def lv_rhs_f64(t, y):
    hares, lynx = y[0:1], y[1:2]
    return jnp.concatenate(
        [1.0 * hares - 0.3 * hares * lynx, 0.4 * hares * lynx - 1.0 * lynx]
    )


def pece_2d_pallas(t_new, DFh2, DFl2, yh, yl, hh, hl, *, interpret=False):
    """Flat-layout variant: DF history as (K*N, B); per-DF[i] row slices
    stay within one 16-row tile; h broadcast as (1, B) rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(t_ref, dfh_ref, dfl_ref, yh_ref, yl_ref, hh_ref, hl_ref,
               oyh, oyl, odh, odl, oeh, oel):
        DFh = dfh_ref[:]  # (K*N, Bt)
        DFl = dfl_ref[:]
        y_prev = DF(yh_ref[:], yl_ref[:])  # (N, Bt)
        h = DF(hh_ref[:], hl_ref[:])  # (1, Bt)

        # predictor sums as full-width weighted row-adds: weight row blocks
        # by gamma_i, then fold K blocks pairwise (log2 K tree of (K*N, Bt)
        # -> ... -> (N, Bt) adds) — every op is near-full-tile.
        acc = None
        fex = None
        for i in range(P):
            blk = DF(DFh[i * N : (i + 1) * N], DFl[i * N : (i + 1) * N])
            gi = float(_GAMMA[i])
            acc = blk * gi if acc is None else acc + blk * gi
            fex = blk if fex is None else fex + blk
        y_pred = y_prev + h * acc
        c_A = h * float(_GAMMA[P - 1])

        y = y_pred
        for _ in range(FUNCTIONAL_ITERS):
            f = lv_rhs_df(0.0, y)
            y = y_pred + c_A * (f - fex)
        f = lv_rhs_df(0.0, y)
        d_f = f - fex
        err = d_f * (h * float(abs(_GAMMA_STAR[P])))
        oyh[:] = y.hi
        oyl[:] = y.lo
        odh[:] = d_f.hi
        odl[:] = d_f.lo
        oeh[:] = err.hi
        oel[:] = err.lo

    out_shape = [jax.ShapeDtypeStruct((N, B), jnp.float32) for _ in range(6)]
    # no grid: whole operands in VMEM (~2 MB total at B=10k) — under x64
    # mode a grid index_map lowers i64 indices Mosaic refuses to legalize
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        interpret=interpret,
    )(t_new, DFh2, DFl2, yh, yl, hh, hl)


def main():
    rng = np.random.default_rng(0)
    DF64 = rng.standard_normal((K, N, B)) * 0.1
    y64 = np.abs(rng.standard_normal((N, B))) + 1.0
    h64 = np.abs(rng.standard_normal(B)) * 0.01 + 0.01
    t_new = jnp.zeros((B,), jnp.float32)
    t_new2 = jnp.zeros((1, B), jnp.float32)

    DFh = jnp.asarray(DF64, jnp.float32)
    DFl = jnp.asarray(DF64 - np.asarray(DFh, np.float64), jnp.float32)
    yh = jnp.asarray(y64, jnp.float32)
    yl = jnp.asarray(y64 - np.asarray(yh, np.float64), jnp.float32)
    hh = jnp.asarray(h64, jnp.float32)
    hl = jnp.asarray(h64 - np.asarray(hh, np.float64), jnp.float32)

    REPS = 20  # iterate inside one jit: the axon relay round-trip (~28 ms)
    # otherwise swamps sub-ms kernels (100 chained Mosaic kernels also
    # compile impractically slowly)

    def timeit(fn, chain, *args):
        """min time per call, with REPS data-dependent calls chained inside
        ONE jit (chain(args, out) -> next args forbids CSE/DCE)."""
        out = jax.block_until_ready(fn(*args))

        def chained(*a):
            o = fn(*a)
            for _ in range(REPS - 1):
                a = chain(a, o)
                o = fn(*a)
            return o

        cj = jax.jit(chained)
        jax.block_until_ready(cj(*args))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(cj(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) / REPS, out

    # XLA f64 reference
    f64_fn = jax.jit(
        lambda D, y, h: adams_pece_attempt_reference(lv_rhs_f64, 0.0, D, y, h, P)
    )
    chain64 = lambda a, o: (a[0], a[1] + 0.0 * o[0], a[2])  # noqa: E731
    t_f64, out64 = timeit(
        f64_fn, chain64, jnp.asarray(DF64), jnp.asarray(y64), jnp.asarray(h64)
    )

    # 3-D Pallas (round-2 prototype)
    p3_fn = jax.jit(
        lambda *a: adams_pece_attempt_pallas(lv_rhs_df, *a, p_order=P)
    )
    chain_p = lambda a, o: (a[0], a[1], a[2], a[3] + 0.0 * o[0], *a[4:])  # noqa: E731
    t_p3, _ = timeit(p3_fn, chain_p, t_new, DFh, DFl, yh, yl, hh, hl)

    # 2-D Pallas (this experiment)
    DFh2 = DFh.reshape(K * N, B)
    DFl2 = DFl.reshape(K * N, B)
    p2_fn = jax.jit(lambda *a: pece_2d_pallas(*a))
    t_p2, out2 = timeit(
        p2_fn, chain_p, t_new2, DFh2, DFl2, yh, yl, hh[None], hl[None]
    )

    # parity check of the 2-D kernel against f64
    y2 = np.asarray(out2[0], np.float64) + np.asarray(out2[1], np.float64)
    err = np.max(np.abs(y2 - np.asarray(out64[0])) / (np.abs(out64[0]) + 1e-12))
    print(f"parity (2-D vs f64): max rel {err:.2e}")
    print(f"XLA f64 emulated : {t_f64*1e3:8.3f} ms")
    print(f"Pallas df64 3-D  : {t_p3*1e3:8.3f} ms")
    print(f"Pallas df64 2-D  : {t_p2*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
