"""Pallas double-float kernels — the fused-integrator prototype.

The batch-native JAX cores (ops/*_batched.py) are bounded by per-op kernel
granularity: each lockstep attempt executes ~20 separate XLA kernels at
~100 us each.  The end-game is ONE Pallas kernel per attempt (or per whole
solve) with all state resident in VMEM.  Mosaic has no float64, so state
arithmetic uses the double-float ops from ``ops.df64`` (f32 pairs, ~1e-14
precision — ample for rtol 1e-8).

This module is the working proof of that pipeline, shipped as groundwork:

  * ``adams_pece_attempt_pallas``: a fused kernel executing one complete
    Adams-Bashforth-Moulton PECE step attempt — predictor sums over the
    f-difference history, FUNCTIONAL_MAXITER corrector iterations calling
    the (traced-inline) RHS in double-float, error estimate, and the
    accepted-step difference update — entirely inside one ``pallas_call``.
  * the RHS is an ordinary Python function operating on ``DF`` values
    (operator-overloaded), so sympy-generated polynomial right-hand sides
    work unchanged.

Numerical parity with the f64 reference path is tested in
tests/test_pallas_step.py (interpret mode on CPU; compiled on TPU when one
is attached).

Measured on v5e at B=10k (this exact PECE math).  Round-2 single-call
timings said Pallas ~2.4 ms vs XLA-f64 ~0.15 ms — that 10x was a
MEASUREMENT ARTIFACT of the axon relay's ~28 ms round-trip.  Round 3
re-measured with chained data-dependent calls inside one jit
(scripts/exp_pallas2d.py):
  - plain-XLA f64 (emulated):      1.431 ms
  - Pallas df64, (K, n, B) layout: 1.585 ms
  - Pallas df64, (K*n, B) layout:  1.550 ms
Mosaic is within ~10% of XLA on this op mix (flat layout worth ~2%), df64
parity 1.4e-14.  A whole-attempt fused kernel is therefore NOT blocked on
Mosaic codegen; its upside is bounded by the kernel-boundary slice of the
~0.46 ms/attempt machinery floor (<30%) — see docs/performance.md.  The
precision pipeline (exact EFTs on TPU) is proven either way.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sunode_tpu.ops.df64 import DF, df_to_f64, df_from_f64
from sunode_tpu.ops.adams import _GAMMA, _GAMMA_STAR

__all__ = ["adams_pece_attempt_pallas", "adams_pece_attempt_reference"]

FUNCTIONAL_ITERS = 3


def _pece_math(rhs_df, t_new, DF_hi, DF_lo, y_prev, h, p_order, n, K):
    """The shared PECE step-attempt math on DF values.

    DF_hi/lo: (K, n, TILE) f-difference history; y_prev: DF (n, TILE);
    h: DF scalar-per-lane (TILE,); p_order static int for the prototype.
    Returns (y_new DF, d_f DF, err_scaled DF).
    """
    gamma = _GAMMA
    # predictor + extrapolation (static unroll over i < p)
    acc = None
    fex = None
    for i in range(p_order):
        DFi = DF(DF_hi[i], DF_lo[i])
        gi = float(gamma[i])
        term = DFi * gi
        acc = term if acc is None else acc + term
        fex = DFi if fex is None else fex + DFi
    h_df = h
    y_pred = y_prev + h_df * acc
    c_A = h_df * float(gamma[p_order - 1])

    y = y_pred
    for _ in range(FUNCTIONAL_ITERS):
        f = rhs_df(t_new, y)
        y = y_pred + c_A * (f - fex)
    f = rhs_df(t_new, y)
    d_f = f - fex
    err = d_f * (h_df * float(abs(_GAMMA_STAR[p_order])))
    return y, d_f, err


def adams_pece_attempt_reference(
    rhs_f64: Callable, t_new, DF64, y_prev64, h64, p_order: int
):
    """Plain float64 reference of the same PECE attempt (for parity tests)."""
    gamma = _GAMMA
    acc = 0.0
    fex = 0.0
    for i in range(p_order):
        acc = acc + gamma[i] * DF64[i]
        fex = fex + DF64[i]
    y_pred = y_prev64 + h64 * acc
    c_A = h64 * gamma[p_order - 1]
    y = y_pred
    for _ in range(FUNCTIONAL_ITERS):
        f = rhs_f64(t_new, y)
        y = y_pred + c_A * (f - fex)
    f = rhs_f64(t_new, y)
    d_f = f - fex
    err = abs(_GAMMA_STAR[p_order]) * h64 * d_f
    return y, d_f, err


def adams_pece_attempt_pallas(
    rhs_df: Callable,
    t_new,  # (B,) f32
    DF_hi,  # (K, n, B) f32
    DF_lo,  # (K, n, B) f32
    y_prev_hi,  # (n, B)
    y_prev_lo,
    h_hi,  # (B,)
    h_lo,
    p_order: int,
    *,
    interpret: bool = False,
):
    """One fused PECE attempt for all lanes, as a single Pallas kernel.

    ``rhs_df(t_f32, y_DF) -> f_DF`` is traced INSIDE the kernel (polynomial
    RHS in DF arithmetic).  Returns (y_new, d_f, err) as (hi, lo) pairs.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, n, B = DF_hi.shape

    def kernel(
        t_ref, dfh_ref, dfl_ref, yh_ref, yl_ref, hh_ref, hl_ref,
        oyh, oyl, odh, odl, oeh, oel,
    ):
        t = t_ref[:]
        DFh = dfh_ref[:]
        DFl = dfl_ref[:]
        y_prev = DF(yh_ref[:], yl_ref[:])
        h = DF(hh_ref[:], hl_ref[:])

        def rhs_wrap(t_, y_df):
            return rhs_df(t_, y_df)

        y, d_f, err = _pece_math(rhs_wrap, t, DFh, DFl, y_prev, h, p_order, n, K)
        oyh[:] = y.hi
        oyl[:] = y.lo
        odh[:] = d_f.hi
        odl[:] = d_f.lo
        oeh[:] = err.hi
        oel[:] = err.lo

    out_shape = [jax.ShapeDtypeStruct((n, B), jnp.float32) for _ in range(6)]
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=specs,
        out_specs=out_specs,
        interpret=interpret,
    )(t_new, DF_hi, DF_lo, y_prev_hi, y_prev_lo, h_hi, h_lo)
