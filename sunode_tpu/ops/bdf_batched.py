"""Batch-native BDF integrator: thousands of chains in one lockstep loop.

``vmap(bdf_solve)`` is semantically correct but structurally blind: every
loop-level index (the checkpoint write slot, iteration counters, branch
predicates) becomes a per-lane batched value, so XLA lowers checkpoint
recording to full-buffer masked selects (O(buffer) HBM traffic per step) and
executes both sides of every branch.  This module is the same algorithm
written with the batch axis explicit and TRAILING (structure-of-arrays:
states are (n, B), matrices (n, n, B)), which buys:

  * a *uniform* attempt-counter write slot -> checkpoint recording is an
    in-place ``dynamic_update_slice`` (measured 6-7x on the forward pass);
  * *reduced* branch predicates -> Jacobian refresh / refactorization are
    real ``lax.cond`` branches taken only when some lane needs them;
  * batch-on-lanes layout -> the tiny closed-form Newton solves are fused
    VPU arithmetic across all chains.

The per-chain math is identical to ``sunode_tpu.ops.bdf`` (same difference
arrays, error control, order selection — see that module for the CVODES
parity notes); results agree to solver tolerance with ``vmap(bdf_solve)``.

Conventions:
  y0: (B, n) leading-batch at the API boundary (matching vmap convention);
  internal state trailing-batch; outputs returned leading-batch.
  t0 and tvals are SHARED across the batch (the PyMC-chains case).  rhs/jac/
  sens/quad are single-instance functions; they are vmapped onto the
  trailing-batch layout here (pure elementwise functions lower identically).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sunode_tpu.ops.bdf import (
    KD,
    MAX_CONSECUTIVE_FAILS,
    MAX_FACTOR,
    MAX_ORDER,
    MIN_FACTOR,
    NEWTON_MAXITER,
    SENS_MAXITER,
    STATUS,
    THRESH,
    BDFOptions,
    BDFResult,
    _order_constants,
)
from sunode_tpu.ops.linalg import factor_newton_b, solve_factored_b

__all__ = ["bdf_solve_batched"]


def _build_R_elems(q, factor, dtype):
    """Masked rescale matrix as a static KxK grid of (B,) scalars.

    f64 batched einsums/matmuls lower catastrophically on TPU (no f64 MXU),
    so all the tiny fixed-size contractions in this module are statically
    unrolled into fused VPU elementwise chains instead.
    """
    K = MAX_ORDER + 1
    rows = [[jnp.ones_like(factor) for _ in range(K)]]
    for i in range(1, K):
        rows.append([rows[-1][j] * (i - 1 - factor * j) / i for j in range(K)])
    # mask: identity outside the leading (q+1) block (per lane)
    out = []
    for i in range(K):
        row = []
        for j in range(K):
            inblock = (i <= q) & (j <= q)
            eye = 1.0 if i == j else 0.0
            row.append(jnp.where(inblock, rows[i][j], eye))
        out.append(row)
    return out  # out[i][j] -> (B,)


def _apply_RU_b(R, U, D):
    """head <- (R U)^T head with R/U as element grids; statically unrolled."""
    K = MAX_ORDER + 1
    D_rows = [D[j] for j in range(K)]  # (nt, B) each
    t1 = [
        sum(R[j][i][None, :] * D_rows[j] for j in range(K)) for i in range(K)
    ]
    head = [
        sum(U[j][i][None, :] * t1[j] for j in range(K)) for i in range(K)
    ]
    return D.at[:K].set(jnp.stack(head))


def _suffix_sums(D):
    """S[i] = sum_{j>=i} D[j] over the leading KD axis (static unroll)."""
    S = [None] * (KD + 1)
    S[KD] = jnp.zeros_like(D[0])
    for i in range(KD - 1, -1, -1):
        S[i] = S[i + 1] + D[i]
    return S


def _gather_row(stacked, idx):
    """stacked: (KD+1, nt, B) rows; idx (B,) -> (nt, B) per-lane row."""
    take = jnp.take_along_axis(
        stacked,
        jnp.broadcast_to(idx[None, None, :], (1,) + stacked.shape[1:]),
        axis=0,
    )
    return take[0]


def _predict_b(D, q, gamma, alpha, dtype):
    """(pred, psi): each (nt, B); statically unrolled masked sums."""
    K = MAX_ORDER + 1
    S = _suffix_sums(D)
    S_stack = jnp.stack(S)  # (KD+1, nt, B)
    # pred = sum_{i<=q} D[i] = S[0] - S[q+1]
    pred = S[0] - _gather_row(S_stack, q + 1)
    inv_alpha = 1.0 / alpha[q]  # (B,)
    psi = jnp.zeros_like(D[0])
    for i in range(1, K):
        w = jnp.where(i <= q, gamma[i], 0.0)  # (B,)
        psi = psi + w[None, :] * D[i]
    psi = psi * inv_alpha[None, :]
    return pred, psi


def _update_D_b(D, q, d, dtype):
    """Accepted-step difference update, statically unrolled:
      i <= q   : D_new[i] = sum_{j=i..q} D[j] + d = S[i] - S[q+1] + d
      i == q+1 : d
      i == q+2 : d - D[q+1]
      i >  q+2 : unchanged
    """
    S = _suffix_sums(D)
    S_stack = jnp.stack(S)
    Sq1 = _gather_row(S_stack, q + 1)  # (nt, B)
    Dq1 = _gather_row(jnp.concatenate([D, jnp.zeros_like(D[:1])]), q + 1)
    rows = []
    for i in range(KD):
        low = (i <= q)[None, :]
        is_q1 = (i == q + 1)[None, :]
        is_q2 = (i == q + 2)[None, :]
        val = jnp.where(
            low,
            S[i] - Sq1 + d,
            jnp.where(is_q1, d, jnp.where(is_q2, d - Dq1, D[i])),
        )
        rows.append(val)
    return jnp.stack(rows)


def _interpolate_b(D, q, t_n, h, t_eval):
    """Dense output at per-lane t_eval: (nt, B)."""
    s = (t_eval - t_n) / h  # (B,)
    out = D[0]
    w = jnp.ones_like(s)
    for i in range(1, MAX_ORDER + 1):
        w = w * (s + i - 1) / i
        out = out + jnp.where(i <= q, w, 0.0)[None, :] * D[i]
    return out


def bdf_solve_batched(
    rhs: Callable,
    jac: Callable,
    t0,
    y0: jnp.ndarray,  # (B, n)
    params: jnp.ndarray,  # (B, n_p)
    tvals: jnp.ndarray,  # (n_t,) shared or (B, n_t) per-lane grids
    options: BDFOptions = BDFOptions(),
    *,
    sens_rhs: Optional[Callable] = None,
    S0: Optional[jnp.ndarray] = None,  # (B, k, n)
    quad_rhs: Optional[Callable] = None,
    quad0: Optional[jnp.ndarray] = None,  # (B, m)
    first_step: Optional[Any] = None,  # (B,) or scalar; <=0 -> automatic
    batched_fns: bool = False,  # fns already trailing-batch: rhs(t(B,), y(n,B), p(np,B))
    jac_prod: Optional[Callable] = None,  # (t, y, v, p) -> J@v, for spgmr
    root_fn: Optional[Callable] = None,  # (t, y, p) -> (nrt,) event functions
    root_cap: int = 8,
    root_terminal: bool = True,
    root_directions: Optional[Any] = None,
) -> BDFResult:
    """Batched solve; see module docstring.  Returns leading-batch outputs:
    ys (B, n_t, n), sens (B, n_t, k, n), quad (B, n_t, m); ``saved`` arrays
    are trailing-batch: t (S, B), y (S, n, B), f (S, n, B), n_saved (B,),
    overflow (B,).

    root_fn/root_cap/root_terminal/root_directions: CVODES-style
    rootfinding per lane, same semantics as ``bdf_solve`` (see ops/bdf.py).
    The scan is structure-of-arrays: ONE 64-halving bisection loop whose
    body localizes every lane's leftmost bracket simultaneously (all-lane g
    evals, masked by per-lane sign-change state — the SPMD analog of
    cvRootfind's scalar sequence).  Roots stats come back leading-batch:
    n_roots (B,), roots_t (B, cap), roots_y (B, cap, n),
    roots_found (B, cap, nrt)."""
    dtype = jnp.result_type(y0.dtype, jnp.float32)
    y0 = jnp.asarray(y0, dtype).T  # (n, B)
    n, B = y0.shape

    # ---- structured Newton (batched banded LU / KLU-analog sparse) --------
    # Lockstep lanes share one static column loop, so the banded LU vmaps
    # into the same structure-of-arrays shape as everything else here:
    # factoring B lanes is ONE fori_loop over columns whose body does
    # (window, B)-shaped fused arithmetic.  This closes the stiff
    # large-state batched quadrant: Newton cost O(B n w^2) instead of
    # O(B n^3).  'sparse' additionally routes residuals through the RCM
    # permutation around the banded LU (see ops/sparsity.py).
    use_spgmr = options.linear_solver == "spgmr"
    use_sparse = options.linear_solver == "sparse"
    use_band = options.linear_solver == "band" or use_sparse
    if options.linear_solver not in ("dense", "band", "sparse", "spgmr"):
        raise NotImplementedError(
            "bdf_solve_batched supports linear_solver 'dense', 'band', "
            "'sparse' or 'spgmr'"
        )
    if use_spgmr:
        # matrix-free lockstep Newton: B GMRES(maxl) solves share ONE
        # static Arnoldi/Givens unroll whose body is (n, B)/(B,)-shaped
        # fused arithmetic (ops/krylov.py gmres_solve_batched) — the same
        # SoA lift as the banded LU.  The Hessenberg recurrences live in
        # (maxl+1, maxl, B) per-lane scalars.
        from sunode_tpu.ops.krylov import gmres_solve_batched

        if jac_prod is None:
            def jac_prod(t, y, v, p):  # noqa: F811
                return jax.jvp(lambda y_: rhs(t, y_, p), (y,), (v,))[1]
    if use_band:
        from sunode_tpu.ops.banded import banded_factor, banded_solve

        band_l, band_u = int(options.band_lower), int(options.band_upper)
        if use_sparse and options.sparse_perm is not None:
            sp_perm = jnp.asarray(np.asarray(options.sparse_perm), jnp.int32)
            sp_inv = jnp.asarray(
                np.argsort(np.asarray(options.sparse_perm)), jnp.int32
            )
        else:
            sp_perm = sp_inv = None
        k_bord = int(options.sparse_border) if use_sparse else 0
        if k_bord:
            # bordered-block-diagonal Schur solve (ops/bbd.py): the same
            # SoA lift as the banded LU — B lanes share ONE static interior
            # column loop plus a (k, k, B) dense Schur factorization.  This
            # is the batched fast path for the dense-row/arrowhead patterns
            # where RCM bandwidth is O(n).
            from sunode_tpu.ops.bbd import (
                bbd_factor,
                bbd_form_newton,
                bbd_solve,
            )

            _bfactor = jax.vmap(
                lambda M: bbd_factor(M, band_l, band_u, k_bord),
                in_axes=2,
                out_axes=(2, 1, 2, 2, 2, 1, 0),
            )
            _bsolve_bbd = jax.vmap(
                lambda lu, piv, X, E, SLU, Spiv, sing, rr: bbd_solve(
                    (lu, piv, X, E, SLU, Spiv, sing), rr, band_l, band_u,
                    k_bord,
                ),
                in_axes=(2, 1, 2, 2, 2, 1, 0, 1),
                out_axes=1,
            )

            def lin_solve_b(factors, res):
                rp = res[sp_perm] if sp_perm is not None else res
                z = _bsolve_bbd(*factors, rp)
                return z[sp_inv] if sp_inv is not None else z

            def _form_M_b(J, c_coef):
                return jax.vmap(
                    lambda Jl, cl: bbd_form_newton(
                        Jl, cl, band_l, band_u, k_bord
                    ),
                    in_axes=(2, 0),
                    out_axes=2,
                )(J, c_coef)

        else:
            _bfactor = jax.vmap(
                lambda ab: banded_factor(ab, band_l, band_u),
                in_axes=2,
                out_axes=(2, 1, 0),
            )
            _bsolve_raw = jax.vmap(
                lambda lu, piv, sing, bb: banded_solve(
                    (lu, piv, sing), bb, band_l, band_u
                ),
                in_axes=(2, 1, 0, 1),
                out_axes=1,
            )

            def _form_M_b(J, c_coef):
                # M = I - c*J directly in banded storage (diagonal = row u)
                M_ab = (-c_coef)[None, None, :] * J
                return M_ab.at[band_u].add(1.0)

            if use_sparse and sp_perm is not None:
                # solve in RCM-permuted space: z = P delta, M_p z = P res
                def lin_solve_b(factors, res):
                    z = _bsolve_raw(
                        factors[0], factors[1], factors[2], res[sp_perm]
                    )
                    return z[sp_inv]

            else:

                def lin_solve_b(factors, res):
                    return _bsolve_raw(factors[0], factors[1], factors[2], res)

    elif use_spgmr:
        lin_solve_b = None  # built per-attempt (linearizes at the predictor)
    else:
        lin_solve_b = solve_factored_b
    # t0 may be per-lane (B,) — lanes resuming an interrupted solve restart
    # from their own final_time (resume-in-place, ref solver.py:510-519)
    t0 = jnp.broadcast_to(jnp.asarray(t0, dtype), (B,))
    tvals = jnp.asarray(tvals, dtype)
    # per-lane observation grids: tvals may be (B, n_t) — each lane emits on
    # its own (ascending) grid (ragged datasets; pad a lane's grid with
    # copies of its last time).  Shared (n_t,) stays the fast layout.
    per_lane_tvals = tvals.ndim == 2
    if per_lane_tvals:
        tvals_tb = tvals.T  # (n_t, B)
        n_t = tvals_tb.shape[0]
        t_end = tvals_tb[-1]  # (B,)

        def _t_emit(i_out):  # (B,) indices -> (B,) per-lane times
            idx = jnp.minimum(i_out, n_t - 1)
            return jnp.take_along_axis(tvals_tb, idx[None, :], axis=0)[0]

    else:
        tvals_tb = tvals[:, None]
        n_t = tvals.shape[0]
        t_end = tvals[-1]

        def _t_emit(i_out):
            return tvals[jnp.minimum(i_out, n_t - 1)]

    params = jnp.asarray(params, dtype).T  # (n_p, B)

    with_sens = sens_rhs is not None
    with_quad = quad_rhs is not None
    k_sens = S0.shape[1] if with_sens else 0
    m_quad = quad0.shape[1] if with_quad else 0
    n_S = k_sens * n
    nt_tot = n + n_S + m_quad
    sl_y = slice(0, n)
    sl_S = slice(n, n + n_S)
    sl_Q = slice(n + n_S, nt_tot)

    # single-instance fns -> trailing-batch via vmap over the last axis
    if batched_fns:
        rhs_b, jac_b = rhs, jac
        sens_rhs_b, quad_rhs_b = sens_rhs, quad_rhs
        jac_prod_b = jac_prod if use_spgmr else None
    else:
        rhs_b = jax.vmap(rhs, in_axes=(0, 1, 1), out_axes=1)
        jac_b = (
            jax.vmap(jac, in_axes=(0, 1, 1), out_axes=2)
            if not use_spgmr
            else None
        )
        jac_prod_b = (
            jax.vmap(jac_prod, in_axes=(0, 1, 1, 1), out_axes=1)
            if use_spgmr
            else None
        )
        if with_sens:
            sens_rhs_b = jax.vmap(sens_rhs, in_axes=(0, 1, 2, 1), out_axes=2)
        if with_quad:
            quad_rhs_b = jax.vmap(quad_rhs, in_axes=(0, 1, 1), out_axes=1)
    if with_sens:
        S0_t = jnp.asarray(S0, dtype).transpose(1, 2, 0)  # (k, n, B)
    if with_quad:
        quad0_t = jnp.asarray(quad0, dtype).T  # (m, B)

    with_roots = root_fn is not None
    if with_roots:
        if batched_fns:
            root_b = root_fn  # (t (B,), y (n, B), p (n_p, B)) -> (nrt, B)
        else:
            root_b = jax.vmap(
                lambda tt, yy, pp: jnp.asarray(
                    root_fn(tt, yy, pp), dtype
                ).reshape(-1),
                in_axes=(0, 1, 1),
                out_axes=1,
            )

    # scalar or per-state (n,) vector rtol (CVodeVVtolerances analog;
    # see ops/bdf.py) — heuristics use the tightest component
    rtol = jnp.broadcast_to(jnp.asarray(options.rtol, dtype), (n,))
    rtol_s = jnp.min(rtol)
    atol = jnp.broadcast_to(jnp.asarray(options.atol, dtype), (n,))
    gamma, alpha, error_const = _order_constants(options.use_ndf, dtype)
    max_order = min(options.max_order, MAX_ORDER)

    # combined tolerance / error-weight vectors over z (see bdf.py)
    atol_parts = [atol]
    rtol_parts = [rtol]
    n_blocks = 1 + (k_sens if (with_sens and options.sens_err_con) else 0) + (
        1 if (with_quad and options.quad_err_con) else 0
    )
    v_parts = [jnp.full((n,), 1.0 / (n * n_blocks), dtype)]
    if with_sens:
        pbar = (
            jnp.broadcast_to(jnp.asarray(options.sens_pbar, dtype), (k_sens,))
            if options.sens_pbar is not None
            else jnp.ones((k_sens,), dtype)
        )
        atol_parts.append((atol[None, :] / pbar[:, None]).reshape(-1))
        rtol_parts.append(jnp.tile(rtol, k_sens))
        v_parts.append(
            jnp.full(
                (n_S,),
                (1.0 / (n * n_blocks)) if options.sens_err_con else 0.0,
                dtype,
            )
        )
    if with_quad:
        quad_rtol = (
            jnp.asarray(options.quad_rtol, dtype)
            if options.quad_rtol is not None
            else rtol_s
        )
        quad_atol = jnp.broadcast_to(
            jnp.asarray(
                options.quad_atol if options.quad_atol is not None else options.atol,
                dtype,
            ),
            (m_quad,),
        )
        atol_parts.append(quad_atol)
        rtol_parts.append(jnp.full((m_quad,), quad_rtol, dtype))
        v_parts.append(
            jnp.full(
                (m_quad,),
                (1.0 / (m_quad * n_blocks)) if options.quad_err_con else 0.0,
                dtype,
            )
        )
    atol_z = jnp.concatenate(atol_parts) if len(atol_parts) > 1 else atol_parts[0]
    rtol_z = jnp.concatenate(rtol_parts) if len(rtol_parts) > 1 else rtol_parts[0]
    v_err = jnp.concatenate(v_parts) if len(v_parts) > 1 else v_parts[0]

    def err_norm_of(e, w_z):
        # e, w_z: (nt, B) -> (B,)
        return jnp.sqrt(jnp.sum((e * w_z) ** 2 * v_err[:, None], axis=0))

    if options.constraints is not None:
        constraints = jnp.broadcast_to(jnp.asarray(options.constraints, dtype), (n,))
    else:
        constraints = None

    newton_tol = options.newton_tol_factor * jnp.maximum(
        10 * jnp.finfo(dtype).eps / rtol_s, jnp.minimum(0.03, jnp.sqrt(rtol_s))
    )

    t0_b = t0
    f0 = rhs_b(t0_b, y0, params)
    bad_init = ~(jnp.all(jnp.isfinite(y0), axis=0) & jnp.all(jnp.isfinite(f0), axis=0))

    # Hairer-Wanner initial step per lane
    scale0 = atol[:, None] + rtol[:, None] * jnp.abs(y0)
    w0 = 1.0 / scale0
    d0n = jnp.sqrt(jnp.mean((y0 * w0) ** 2, axis=0))
    d1n = jnp.sqrt(jnp.mean((f0 * w0) ** 2, axis=0))
    h0a = jnp.where((d0n < 1e-5) | (d1n < 1e-5), 1e-6, 0.01 * d0n / d1n)
    h0a = jnp.minimum(h0a, 0.5 * (t_end - t0))
    y1 = y0 + h0a[None, :] * f0
    f1 = rhs_b(t0_b + h0a, y1, params)
    d2n = jnp.sqrt(jnp.mean(((f1 - f0) * w0) ** 2, axis=0)) / h0a
    dmn = jnp.maximum(d1n, d2n)
    h1a = jnp.where(dmn <= 1e-15, jnp.maximum(1e-6, h0a * 1e-3), jnp.sqrt(0.01 / dmn))
    h_auto = jnp.minimum(jnp.minimum(100 * h0a, h1a), t_end - t0)
    h_auto = jnp.minimum(h_auto, options.max_step)
    if first_step is not None:
        fs = jnp.broadcast_to(jnp.asarray(first_step, dtype), (B,))
        h0 = jnp.where(fs > 0, jnp.minimum(fs, t_end - t0), h_auto)
    elif options.first_step is not None:
        h0 = jnp.full((B,), options.first_step, dtype)
    else:
        h0 = h_auto
    h0 = jnp.maximum(h0, 1e-12)
    # extreme params overflow the WRMS norms (inf/inf -> NaN h0); a NaN h
    # defeats every `h < h_min` guard and livelocks the step loop — fall
    # back to a small finite h so the lane dies through underflow instead
    h0 = jnp.where(jnp.isfinite(h0), h0, jnp.asarray(1e-6, dtype))

    z_parts = [y0]
    fz_parts = [f0]
    if with_sens:
        fS0 = sens_rhs_b(t0_b, y0, S0_t, params)
        z_parts.append(S0_t.reshape(n_S, B))
        fz_parts.append(fS0.reshape(n_S, B))
    if with_quad:
        fQ0 = quad_rhs_b(t0_b, y0, params)
        z_parts.append(quad0_t)
        fz_parts.append(fQ0)
    z0 = jnp.concatenate(z_parts) if len(z_parts) > 1 else z_parts[0]
    fz0 = jnp.concatenate(fz_parts) if len(fz_parts) > 1 else fz_parts[0]

    D0 = jnp.zeros((KD, nt_tot, B), dtype)
    D0 = D0.at[0].set(z0).at[1].set(h0[None, :] * fz0)

    save_steps = int(options.save_steps)
    thinning = bool(options.checkpoint_thinning)
    rec_fd = save_steps > 0 and options.hermite_order == 5

    zs0 = jnp.full((n_t, nt_tot, B), jnp.nan, dtype)
    emit_mask0 = tvals_tb <= t0[None, :]  # (n_t, B) per-lane
    zs0 = jnp.where(emit_mask0[:, None, :], z0[None], zs0)
    i_out0 = jnp.sum(emit_mask0, axis=0).astype(jnp.int32)

    eye_b = jnp.eye(n, dtype=dtype)[:, :, None]
    if use_spgmr:
        # matrix-free: no Jacobian matrix, no factorization state
        J0 = jnp.zeros((1, 1, B), dtype)
        factors0 = (jnp.zeros((1, 1, B), dtype),)
    elif use_band:
        J0 = jac_b(t0_b, y0, params)  # (l+u+1[+2k], n, B) packed rows
        # identity: M = I - 0*J in the structured storage
        factors0 = _bfactor(_form_M_b(jnp.zeros_like(J0), jnp.zeros((B,), dtype)))
    else:
        J0 = jac_b(t0_b, y0, params)  # (n, n, B) dense
        factors0 = factor_newton_b(jnp.broadcast_to(eye_b, (n, n, B)))

    def _lip_norm_b(J):
        # per-lane Lipschitz scale for the quintic stiffness gate: dense ->
        # ||J||_inf (row sums), banded storage -> ||J||_1 (column sums, an
        # equally valid scale); stale Newton J is fine — order-of-magnitude.
        # matrix-free spgmr has no J: +inf forces the evaluator's cubic
        # fallback (see ops/bdf.py)
        if use_spgmr:
            return jnp.full((B,), jnp.inf, dtype)
        if use_band:
            return jnp.max(jnp.sum(jnp.abs(J), axis=0), axis=0)  # (B,)
        return jnp.max(jnp.sum(jnp.abs(J), axis=1), axis=0)  # (B,)

    if save_steps > 0:
        from sunode_tpu.ops._recording import fdot, init_saved_batched

        # (slot, 1+(2|3)n[+1], B); slot = shared attempt counter ->
        # in-place updates; hermite_order=5 appends fdot rows for quintic
        # Hermite plus a per-lane L ~ ||J||_inf row so the evaluator can
        # gate the h^2*(J f) term on h*L <= 1 (poison when h L >> 1 — see
        # ops/bdf.py and adjoint.py)
        row_parts0 = [t0_b[None, :], y0, f0]
        if rec_fd:
            row_parts0.append(fdot(rhs_b, t0_b, y0, f0, params))
            row_parts0.append(_lip_norm_b(J0)[None, :])
        row0 = jnp.concatenate(row_parts0)  # (W, B)
        buf0 = jnp.full((save_steps, row0.shape[0], B), jnp.inf, dtype)
        buf0 = buf0.at[:, 1:, :].set(0.0).at[0].set(row0)
        saved0 = init_saved_batched(buf0, thinning)
    else:
        saved0 = None

    zeros_i = jnp.zeros((B,), jnp.int32)
    carry0 = dict(
        t=t0_b,
        h=h0,
        h_D=h0,
        q=jnp.ones((B,), jnp.int32),
        D=D0,
        n_equal=zeros_i,
        J=J0,
        J_current=jnp.ones((B,), bool),
        factors=factors0,
        c_factored=jnp.zeros((B,), dtype),
        need_factor=jnp.ones((B,), bool),
        i_out=i_out0,
        zs=zs0,
        status=jnp.where(bad_init, STATUS["BAD_INIT"], -1).astype(jnp.int32),
        consec_err_fails=zeros_i,
        consec_conv_fails=zeros_i,
        nsteps=zeros_i,
        nfev=jnp.full((B,), 2, jnp.int32),
        njev=jnp.ones((B,), jnp.int32),
        nfactor=zeros_i,
        nniters=zeros_i,
        nfevS=jnp.full((B,), 1 if with_sens else 0, jnp.int32),
        n_err_fails=zeros_i,
        n_conv_fails=zeros_i,
        # per-lane post-mortem snapshot of the fatal attempt (ref error_*)
        pm_t=jnp.full((B,), jnp.nan, dtype),
        pm_h=jnp.full((B,), jnp.nan, dtype),
        pm_q=jnp.full((B,), -1, jnp.int32),
        pm_worst=jnp.full((B,), -1, jnp.int32),
        it=jnp.asarray(0, jnp.int32),  # shared attempt counter
        saved=saved0,
    )
    if with_roots:
        from sunode_tpu.ops.bdf import _validate_rdir

        g_init0 = root_b(t0_b, y0, params)  # (nrt, B)
        nrt = g_init0.shape[0]
        root_cap = max(int(root_cap), 1)
        rdir = _validate_rdir(nrt, root_directions)
        carry0.update(
            g_prev=g_init0,
            root_t=jnp.full((root_cap, B), jnp.inf, dtype),
            root_y=jnp.zeros((root_cap, n, B), dtype),
            root_dirs=jnp.zeros((root_cap, nrt, B), jnp.int32),
            n_roots=zeros_i,
        )

    def lane_active(c):
        return (c["status"] == -1) & (c["i_out"] < n_t)

    def cond(c):
        return jnp.any(lane_active(c))

    def body(c):
        active = lane_active(c)
        t, q = c["t"], c["q"]

        h_min_loc = 10 * jnp.finfo(dtype).eps * jnp.maximum(jnp.abs(t), jnp.abs(t_end))
        # NaN-robust form (see ops/bdf.py): non-finite h terminates the lane
        underflow = active & ~(c["h"] >= jnp.maximum(h_min_loc, options.min_step))
        h_use = jnp.where(active, jnp.minimum(c["h"], t_end - t), c["h"])
        t_new = t + h_use

        # single lazy rescale to the desired spacing
        pre_factor = h_use / jnp.maximum(c["h_D"], 1e-300)
        R = _build_R_elems(q, pre_factor, dtype)
        U = _build_R_elems(q, jnp.ones((B,), dtype), dtype)
        D = _apply_RU_b(R, U, c["D"])

        c_coef = h_use / alpha[q]
        c_changed = (
            jnp.abs(
                c_coef / jnp.where(c["c_factored"] == 0, 1.0, c["c_factored"]) - 1.0
            )
            > 1e-12
        )
        need = active & (c["need_factor"] | c_changed)

        def do_factor(_):
            if use_band:
                newf = _bfactor(_form_M_b(c["J"], c_coef))
            else:
                M = eye_b - c_coef[None, None, :] * c["J"]
                newf = factor_newton_b(M)
            # per-lane select: every factor leaf is trailing-batch, so the
            # (B,) mask broadcasts against each leaf's trailing axis
            fsel = jax.tree_util.tree_map(
                lambda a, b: jnp.where(need, a, b), newf, c["factors"]
            )
            return fsel, jnp.where(need, c_coef, c["c_factored"]), c["nfactor"] + need

        if use_spgmr:
            # matrix-free: nothing to factor (linearization is per-attempt)
            factors, c_factored, nfactor = c["factors"], c_coef, c["nfactor"]
        elif n <= 4 and not use_band:
            # tiny systems: "factorizing" is a handful of fused VPU ops —
            # cheaper to do unconditionally than to pay the cond sync
            factors, c_factored, nfactor = do_factor(None)
        else:
            factors, c_factored, nfactor = lax.cond(
                jnp.any(need),
                do_factor,
                lambda _: (c["factors"], c["c_factored"], c["nfactor"]),
                None,
            )

        z_pred, psi_z = _predict_b(D, q, gamma, alpha, dtype)
        scale_z = atol_z[:, None] + rtol_z[:, None] * jnp.abs(z_pred)
        w_z = 1.0 / scale_z
        y_pred = z_pred[sl_y]
        w_y = w_z[sl_y]
        pred_ok = jnp.all(jnp.isfinite(z_pred), axis=0)

        if use_spgmr:
            # (I - cJ)x = b via lockstep GMRES, linearized at the predictor
            # (CVODES difference-quotient jtimes freezes ycur the same way)
            def lin_solve_loc(_factors, res):
                return gmres_solve_batched(
                    lambda v: v
                    - c_coef[None, :] * jac_prod_b(t_new, y_pred, v, params),
                    res,
                    maxl=options.krylov_dim,
                )

        else:
            lin_solve_loc = lin_solve_b

        # ---- Newton on the y block (per-lane masked; shared loop) ---------
        psi_y = psi_z[sl_y]

        def nbody(st):
            k, y, d, dy_old, conv, div, bad, niter = st
            f = rhs_b(t_new, y, params)
            bad_f = ~jnp.all(jnp.isfinite(f), axis=0)
            res = c_coef[None, :] * f - psi_y - d
            delta = lin_solve_loc(factors, res)
            bad_d = ~jnp.all(jnp.isfinite(delta), axis=0)
            dy_norm = jnp.sqrt(jnp.mean((delta * w_y) ** 2, axis=0))
            rate = dy_norm / dy_old
            div_new = (k > 0) & (
                (rate >= 2.0)
                | (
                    (rate < 1.0)
                    & (rate ** (NEWTON_MAXITER - k) / (1 - rate) * dy_norm > newton_tol)
                )
            )
            live = ~(conv | div | bad)  # lanes still iterating
            d = jnp.where(live[None, :], d + delta, d)
            y = jnp.where(live[None, :], y + delta, y)
            conv_new = (dy_norm == 0.0) | (
                (k > 0) & (rate < 1.0) & (rate / (1 - rate) * dy_norm < newton_tol)
            )
            bad_new = bad | (live & (bad_f | bad_d))
            conv = conv | (live & conv_new & ~bad_new)
            div = div | (live & div_new & ~conv_new)
            niter = niter + live.astype(jnp.int32)
            return k + 1, y, d, jnp.where(live, dy_norm, dy_old), conv, div, bad_new, niter

        ninit = (
            jnp.asarray(0, jnp.int32),
            y_pred,
            jnp.zeros_like(y_pred),
            jnp.full((B,), jnp.inf, dtype),
            ~active,  # inactive lanes count as converged (frozen)
            jnp.zeros((B,), bool),
            jnp.zeros((B,), bool),
            zeros_i,
        )
        # small n: statically unrolled — in lockstep the max-over-lanes
        # iteration count governs anyway, and unrolling removes
        # per-iteration cond syncs (iterations are a handful of fused VPU
        # ops).  Large n: a real while_loop with all-lanes early exit —
        # each iteration costs an O(n·w²)/O(n²) linear solve, so paying
        # NEWTON_MAXITER unconditionally when the batch typically converges
        # in 1-2 iterations wastes most of the Newton time (measured: the
        # unrolled batch-native band core LOST to vmap(bdf_solve) at
        # n=128/B=1024 for exactly this reason).
        if n <= 16:
            nst = ninit
            for _ in range(NEWTON_MAXITER):
                nst = nbody(nst)
        else:

            def ncond(st):
                k, _, _, _, conv_c, div_c, bad_c, _ = st
                return (k < NEWTON_MAXITER) & jnp.any(~(conv_c | div_c | bad_c))

            nst = lax.while_loop(ncond, nbody, ninit)
        _, y_new, d_corr, _, n_conv, n_div, n_bad, n_iters = nst
        conv = n_conv & ~n_bad & pred_ok
        nfev_n = n_iters  # per-lane rhs evals this attempt

        d_parts = [d_corr]
        nfevS_n = zeros_i
        state_err_ok = jnp.ones((B,), bool)
        if with_sens:
            staggered = bool(options.sens_staggered)
            S_pred = z_pred[sl_S].reshape(k_sens, n, B)
            psi_S = psi_z[sl_S].reshape(k_sens, n, B)
            wS = w_z[sl_S].reshape(k_sens, n, B)
            solve_rows = jax.vmap(lin_solve_loc, in_axes=(None, 0))

            if staggered:
                # CV_STAGGERED (16_cvodes.h:31-33): the state must converge
                # AND pass its OWN error test before sensitivity work.  In
                # the lockstep batch the gate is per-lane (masked); the
                # whole sens corrector is additionally a real lax.cond so
                # an attempt where EVERY lane's state failed evaluates no
                # sensitivity RHS at all.
                err_y_only = jnp.sqrt(
                    jnp.mean(
                        ((error_const[q][None, :] * d_corr) * w_z[sl_y]) ** 2,
                        axis=0,
                    )
                )
                state_err_ok = conv & (err_y_only <= 1.0)
                sens_gate = active & state_err_ok
            else:
                sens_gate = active

            def sbody(st):
                it_s, S, dS, old, s_conv, s_bad, nfs = st
                FS = sens_rhs_b(t_new, y_new, S, params)
                resS = c_coef[None, None, :] * FS - psi_S - dS
                deltaS = solve_rows(factors, resS)
                bad_new = ~jnp.all(jnp.isfinite(deltaS), axis=(0, 1))
                norm = jnp.sqrt(jnp.mean((deltaS * wS) ** 2, axis=(0, 1)))
                rate = norm / old
                live = ~(s_conv | s_bad)
                S = jnp.where(live[None, None, :], S + deltaS, S)
                dS = jnp.where(live[None, None, :], dS + deltaS, dS)
                conv_new = (
                    (norm == 0.0)
                    | (
                        (it_s > 0)
                        & (rate < 1.0)
                        & (rate / (1 - rate) * norm < newton_tol)
                    )
                    | (norm < 0.1 * newton_tol)
                )
                s_bad = s_bad | (live & bad_new)
                s_conv = s_conv | (live & conv_new & ~s_bad)
                nfs = nfs + live.astype(jnp.int32)
                return it_s + 1, S, dS, jnp.where(live, norm, old), s_conv, s_bad, nfs

            sinit = (
                jnp.asarray(0, jnp.int32),
                S_pred,
                jnp.zeros_like(S_pred),
                jnp.full((B,), jnp.inf, dtype),
                ~sens_gate,  # gated-out lanes sit converged (frozen)
                jnp.zeros((B,), bool),
                zeros_i,
            )

            # same unroll-vs-early-exit tradeoff as the state Newton:
            # each sens iteration pays k_sens linear solves, so large n
            # uses a while_loop with all-lanes exit
            def scond(st):
                it_s, _, _, _, s_conv_c, s_bad_c, _ = st
                return (it_s < SENS_MAXITER) & jnp.any(~(s_conv_c | s_bad_c))

            def run_unrolled(_):
                sst = sinit
                for _ in range(SENS_MAXITER):
                    sst = sbody(sst)
                return sst

            def run_while(_):
                return lax.while_loop(scond, sbody, sinit)

            run_sens = run_unrolled if n <= 16 else run_while
            if staggered:
                sst = lax.cond(
                    jnp.any(sens_gate), run_sens, lambda _: sinit, None
                )
            else:
                sst = run_sens(None)
            _, S_new, dS_corr, _, s_conv, s_bad, nfevS_n = sst
            if staggered:
                # a gated-off sens corrector must not mask the state
                # rejection: acceptance requires state_err_ok anyway (below)
                conv = conv & ((s_conv & ~s_bad) | ~state_err_ok)
                dS_corr = jnp.where(
                    state_err_ok[None, None, :], dS_corr, 0.0
                )
            else:
                conv = conv & s_conv & ~s_bad
            d_parts.append(dS_corr.reshape(n_S, B))
        if with_quad:
            psi_Q = psi_z[sl_Q]
            fQ = quad_rhs_b(t_new, y_new, params)
            dQ_corr = c_coef[None, :] * fQ - psi_Q
            conv = conv & jnp.all(jnp.isfinite(dQ_corr), axis=0)
            d_parts.append(dQ_corr)

        d_z = jnp.concatenate(d_parts) if len(d_parts) > 1 else d_parts[0]

        if constraints is not None:
            cns = constraints[:, None]
            viol = (
                ((cns == 1) & (y_new < 0))
                | ((cns == -1) & (y_new > 0))
                | ((cns == 2) & (y_new <= 0))
                | ((cns == -2) & (y_new >= 0))
            )
            constraint_fail = jnp.any(viol, axis=0)
        else:
            constraint_fail = jnp.zeros((B,), bool)

        newton_failed = active & ~conv
        # spgmr is matrix-free: the linearization is always fresh, so a
        # Newton failure goes straight to step reduction (see ops/bdf.py)
        if use_spgmr:
            refresh_J = jnp.zeros((B,), bool)
        else:
            refresh_J = newton_failed & ~c["J_current"]
        halve = newton_failed & (c["J_current"] | use_spgmr)

        def do_jac(_):
            Jn = jac_b(t_new, y_pred, params)
            return jnp.where(refresh_J[None, None, :], Jn, c["J"])

        if use_spgmr:
            J_new = c["J"]
        elif n <= 4 and not use_band:
            J_new = do_jac(None)  # cheap; avoid the cond sync
        else:
            J_new = lax.cond(jnp.any(refresh_J), do_jac, lambda _: c["J"], None)
        njev = c["njev"] + refresh_J.astype(jnp.int32)

        D_upd = _update_D_b(D, q, d_z, dtype)

        # one fused reduce for the error test AND the order-selection errors
        Dq_row = _gather_row(D_upd, q)
        Dq2_row = _gather_row(D_upd, q + 2)
        err_rows = jnp.stack(
            [
                error_const[q][None, :] * d_z,
                error_const[jnp.maximum(q - 1, 0)][None, :] * Dq_row,
                error_const[jnp.minimum(q + 1, MAX_ORDER)][None, :] * Dq2_row,
            ]
        )  # (3, nt, B)
        err3 = jnp.sqrt(
            jnp.sum((err_rows * w_z[None]) ** 2 * v_err[None, :, None], axis=1)
        )  # (3, B)
        err_norm_tot = err3[0]
        if with_sens and bool(options.sens_staggered):
            # the state's OWN error test gates acceptance, and the
            # step-reduction factor must see the state failure too (a gated
            # sens corrector left the d_z sens block zero) — see bdf.py;
            # err_y_only is the gate norm already computed above
            err_norm_tot = jnp.maximum(err_norm_tot, err_y_only)
            err_ok = (err_norm_tot <= 1.0) & state_err_ok
        else:
            err_ok = err_norm_tot <= 1.0
        accept = active & conv & err_ok & ~constraint_fail
        err_reject = active & conv & (~err_ok | constraint_fail)
        n_equal = jnp.where(accept, c["n_equal"] + 1, 0)
        t_next = jnp.where(accept, t_new, t)

        # ---- rootfinding (SoA _root_scan analog; one bisection loop
        # localizes every accepting lane's leftmost bracket) ----------------
        if with_roots:

            def _rscan(_):
                g_new = root_b(t_new, y_new, params)  # (nrt, B)
                gp = c["g_prev"]
                changed = ((gp * g_new) < 0) | ((g_new == 0.0) & (gp != 0.0))
                cross_dir = jnp.sign(g_new - gp).astype(jnp.int32)
                changed = changed & (
                    (rdir[:, None] == 0) | (rdir[:, None] == cross_dir)
                )
                changed = changed & accept[None, :]
                lane_hit = jnp.any(changed, axis=0)  # (B,)

                def g_at(tt):  # tt (B,)
                    z = _interpolate_b(D_upd, q, t_new, h_use, tt)
                    return root_b(tt, z[sl_y], params)

                def bis(_i, st):
                    lo, hi, glo = st
                    mid = 0.5 * (lo + hi)
                    gm = g_at(mid)
                    in_left = jnp.any(
                        changed & ((glo * gm < 0) | ((gm == 0.0) & (glo != 0.0))),
                        axis=0,
                    )  # (B,)
                    return (
                        jnp.where(in_left, lo, mid),
                        jnp.where(in_left, mid, hi),
                        jnp.where(in_left[None, :], glo, gm),
                    )

                lo, hi, _ = lax.fori_loop(0, 64, bis, (t, t_new, gp))
                tr = 0.5 * (lo + hi)
                ttol = (
                    100.0
                    * jnp.finfo(dtype).eps
                    * (jnp.abs(t_new) + jnp.abs(h_use))
                )
                g_up = g_at(jnp.minimum(tr + ttol, t_new))
                here = changed & (gp * g_up <= 0)
                dirs = jnp.where(
                    here,
                    jnp.where(
                        g_up != 0.0, jnp.sign(g_up), jnp.sign(g_new - gp)
                    ).astype(jnp.int32),
                    0,
                )  # (nrt, B)
                y_root = _interpolate_b(D_upd, q, t_new, h_use, tr)[sl_y]
                tr = jnp.where(lane_hit, tr, jnp.inf)
                return lane_hit, tr, dirs, y_root, g_new

            def _rskip(_):
                return (
                    jnp.zeros((B,), bool),
                    jnp.full((B,), jnp.inf, dtype),
                    jnp.zeros((nrt, B), jnp.int32),
                    jnp.zeros((n, B), dtype),
                    c["g_prev"],
                )

            root_hit, t_root, root_dirs_now, y_root, g_new = lax.cond(
                jnp.any(accept), _rscan, _rskip, None
            )
            can_rec = root_hit & (c["n_roots"] < root_cap)  # (B,)
            ridx = jnp.minimum(c["n_roots"], root_cap - 1)
            onehot = (
                jnp.arange(root_cap)[:, None] == ridx[None, :]
            )  # (cap, B)
            wrec = onehot & can_rec[None, :]
            root_t_buf = jnp.where(wrec, t_root[None, :], c["root_t"])
            root_y_buf = jnp.where(
                wrec[:, None, :], y_root[None], c["root_y"]
            )
            root_dirs_buf = jnp.where(
                wrec[:, None, :], root_dirs_now[None], c["root_dirs"]
            )
            n_roots_new = c["n_roots"] + root_hit.astype(jnp.int32)
            g_prev_new = jnp.where(accept[None, :], g_new, c["g_prev"])
            if root_terminal:
                t_stop = jnp.where(root_hit, t_root, jnp.inf)  # (B,)
            else:
                t_stop = None
        else:
            t_stop = None

        # ---- emission (shared loop; per-lane masks) -----------------------
        def emit_cond(st):
            i_out = st[0]
            te = _t_emit(i_out)
            pend = accept & (i_out < n_t) & (te <= t_new + 1e-14 * jnp.abs(t_new))
            if t_stop is not None:
                pend = pend & (te <= t_stop)
            return jnp.any(pend)

        def emit_body(st):
            i_out, zs = st
            te = _t_emit(i_out)
            pend = accept & (i_out < n_t) & (te <= t_new + 1e-14 * jnp.abs(t_new))
            if t_stop is not None:
                pend = pend & (te <= t_stop)
            zi = _interpolate_b(D_upd, q, t_new, h_use, te)  # (nt, B)
            onehot = (
                jnp.arange(n_t)[:, None] == jnp.minimum(i_out, n_t - 1)[None, :]
            )  # (n_t, B)
            write = onehot[:, None, :] & pend[None, None, :]
            zs = jnp.where(write, zi[None], zs)
            return i_out + pend.astype(jnp.int32), zs

        i_out, zs = lax.while_loop(emit_cond, emit_body, (c["i_out"], c["zs"]))

        # ---- checkpoint recording (see ops/_recording.py) -----------------
        if save_steps > 0:
            from sunode_tpu.ops._recording import fdot, record_step_batched

            f_acc = rhs_b(t_new, y_new, params)
            row_parts_r = [t_new[None, :], y_new, f_acc]
            if rec_fd:
                row_parts_r.append(fdot(rhs_b, t_new, y_new, f_acc, params))
                row_parts_r.append(_lip_norm_b(c["J"])[None, :])
            row = jnp.concatenate(row_parts_r)  # (W, B)
            pad = jnp.concatenate(
                [
                    jnp.full((1, B), jnp.inf, dtype),
                    jnp.zeros((row.shape[0] - 1, B), dtype),
                ]
            )
            row = jnp.where(accept[None, :], row, pad)
            sv = record_step_batched(
                c["saved"], c["it"], accept, row, save_steps, thinning
            )
        else:
            sv = c["saved"]

        # ---- order & step adaptation --------------------------------------
        can_adapt = n_equal >= q + 1
        err_m = jnp.where(q > 1, err3[1], jnp.inf)
        err_p = jnp.where(q < max_order, err3[2], jnp.inf)

        def fac(e, qq):
            unavailable = ~jnp.isfinite(e)
            e_safe = jnp.clip(e, 1e-30, 1e30)
            f = 0.9 * e_safe ** (-1.0 / (qq + 1.0))
            return jnp.where(unavailable, 0.0, f)

        f_m = fac(err_m, (q - 1).astype(dtype))
        f_0 = fac(err_norm_tot, q.astype(dtype))
        f_p = fac(err_p, (q + 1).astype(dtype))
        facs = jnp.stack([f_m, f_0, f_p])  # (3, B)
        best = jnp.argmax(facs, axis=0)
        dq = best.astype(jnp.int32) - 1
        factor_best = jnp.clip(
            jnp.take_along_axis(facs, best[None, :], axis=0)[0], MIN_FACTOR, MAX_FACTOR
        )

        do_change = can_adapt & (
            (factor_best >= THRESH) | (factor_best < 1.0) | (dq != 0)
        )
        q_acc = jnp.where(do_change, jnp.clip(q + dq, 1, max_order), q)
        factor_acc = jnp.where(do_change, factor_best, 1.0)
        factor_acc = jnp.minimum(
            factor_acc, options.max_step / jnp.maximum(h_use, 1e-300)
        )
        n_equal = jnp.where(do_change & accept, 0, n_equal)

        factor_rej = jnp.clip(
            0.9 * jnp.clip(err_norm_tot, 1e-30, 1e30) ** (-1.0 / (q + 1.0)),
            MIN_FACTOR,
            0.9,
        )
        factor_rej = jnp.where(constraint_fail & err_ok, 0.25, factor_rej)
        factor_fail = jnp.where(refresh_J, 1.0, jnp.where(halve, 0.5, factor_rej))

        # breakdown detector (see ops/adams.py): marginal accepts keep the
        # failure counter; 4 accumulated failures trigger a per-lane history
        # RESET (keep y and the first difference only) and an order-1 restart.
        cef_fail = c["consec_err_fails"] + 1
        reset = active & ~accept & err_reject & (cef_fail >= 4)
        factor_next = jnp.where(
            accept, factor_acc, jnp.where(reset, 0.25, factor_fail)
        )
        h_next = jnp.where(active, h_use * factor_next, c["h"])
        q_next = jnp.where(accept, q_acc, jnp.where(reset, 1, q))
        # rebuild reset history: D[0] kept, D[1] = h * dz/dt at the last
        # accepted point (keeping a possibly-corrupted D[1] leaves an
        # h-independent error estimate that collapses h)
        row0_mask = (jnp.arange(KD) == 0).astype(dtype)[:, None, None]

        def reset_D(_):
            z_last = D[0]
            fz_parts_r = [rhs_b(t, z_last[sl_y], params)]
            if with_sens:
                fz_parts_r.append(
                    sens_rhs_b(
                        t, z_last[sl_y], z_last[sl_S].reshape(k_sens, n, B), params
                    ).reshape(n_S, B)
                )
            if with_quad:
                fz_parts_r.append(quad_rhs_b(t, z_last[sl_y], params))
            fz_last = (
                jnp.concatenate(fz_parts_r)
                if len(fz_parts_r) > 1
                else fz_parts_r[0]
            )
            return (D * row0_mask).at[1].set(h_use[None, :] * fz_last)

        D_reset = lax.cond(jnp.any(reset), reset_D, lambda _: D, None)
        D_next = jnp.where(
            accept[None, None, :], D_upd, jnp.where(reset[None, None, :], D_reset, D)
        )
        D_next = jnp.where(active[None, None, :], D_next, c["D"])

        # decay counter (see ops/bdf.py)
        cef = jnp.where(
            accept,
            jnp.where(
                err_norm_tot <= 0.9,
                jnp.maximum(c["consec_err_fails"] - 1, 0),
                c["consec_err_fails"],
            ),
            jnp.where(
                reset, 0, c["consec_err_fails"] + err_reject.astype(jnp.int32)
            ),
        )
        ccf = jnp.where(
            accept,
            0,
            c["consec_conv_fails"] + (newton_failed & ~refresh_J).astype(jnp.int32),
        )
        too_many = (cef >= MAX_CONSECUTIVE_FAILS) | (ccf >= MAX_CONSECUTIVE_FAILS)

        status = c["status"]
        status = jnp.where(
            (status == -1) & active & too_many & ~accept,
            STATUS["REPEATED_FAILURES"],
            status,
        )
        nsteps = c["nsteps"] + accept.astype(jnp.int32)
        status = jnp.where(
            (status == -1) & active & (nsteps >= options.max_steps),
            STATUS["MAX_STEPS"],
            status,
        )
        status = jnp.where(
            (status == -1) & underflow, STATUS["STEP_UNDERFLOW"], status
        )
        root_ret_now = jnp.zeros((B,), bool)
        if with_roots and root_terminal:
            root_ret_now = (status == -1) & root_hit
            status = jnp.where(root_ret_now, STATUS["ROOT_RETURN"], status)

        # per-lane post-mortem: snapshot (t, attempted h, order, worst state)
        # on the attempt where a lane's status turns fatal (ref
        # symode/problem.py:150-158 error_* analog)
        fatal_now = (c["status"] == -1) & (status != -1) & ~root_ret_now
        e_err = jnp.abs(error_const[q][None, :] * d_z[sl_y]) * w_z[sl_y]
        e_newt = jnp.abs(d_corr[sl_y]) * w_z[sl_y]
        worst = jnp.argmax(
            jnp.where(n_conv[None, :], e_err, e_newt), axis=0
        ).astype(jnp.int32)
        pm_t = jnp.where(fatal_now, c["t"], c["pm_t"])
        pm_h = jnp.where(fatal_now, h_use, c["pm_h"])
        pm_q = jnp.where(fatal_now, q, c["pm_q"]).astype(jnp.int32)
        pm_worst = jnp.where(fatal_now, worst, c["pm_worst"]).astype(jnp.int32)

        if with_roots:
            root_updates = dict(
                g_prev=g_prev_new,
                root_t=root_t_buf,
                root_y=root_y_buf,
                root_dirs=root_dirs_buf,
                n_roots=n_roots_new.astype(jnp.int32),
            )
        else:
            root_updates = {}

        return dict(
            **root_updates,
            t=t_next,
            h=h_next,
            h_D=jnp.where(active, h_use, c["h_D"]),
            q=q_next,
            D=D_next,
            n_equal=n_equal.astype(jnp.int32),
            J=J_new,
            J_current=jnp.where(accept, False, c["J_current"] | refresh_J),
            factors=factors,
            c_factored=c_factored,
            need_factor=jnp.where(accept, False, refresh_J),
            i_out=i_out,
            zs=zs,
            status=status.astype(jnp.int32),
            consec_err_fails=cef.astype(jnp.int32),
            consec_conv_fails=ccf.astype(jnp.int32),
            nsteps=nsteps,
            nfev=c["nfev"]
            + nfev_n
            + ((accept.astype(jnp.int32)) if save_steps > 0 else 0),
            njev=njev,
            nfactor=nfactor,
            nniters=c["nniters"] + n_iters,
            nfevS=c["nfevS"] + nfevS_n,
            n_err_fails=c["n_err_fails"] + err_reject.astype(jnp.int32),
            n_conv_fails=c["n_conv_fails"]
            + (newton_failed & ~refresh_J).astype(jnp.int32),
            pm_t=pm_t,
            pm_h=pm_h,
            pm_q=pm_q,
            pm_worst=pm_worst,
            it=c["it"] + 1,
            saved=sv,
        )

    final = lax.while_loop(cond, body, carry0)

    status = jnp.where(
        final["status"] == -1, STATUS["SUCCESS"], final["status"]
    ).astype(jnp.int32)

    stats = dict(
        n_steps=final["nsteps"],
        n_rhs_evals=final["nfev"],
        n_jac_evals=final["njev"],
        n_factorizations=final["nfactor"],
        n_newton_iters=final["nniters"],
        n_error_test_fails=final["n_err_fails"],
        n_conv_fails=final["n_conv_fails"],
        final_order=final["q"],
        final_step_size=final["h"],
        final_time=final["t"],
        # (B, n+kn+m) combined state at final_time; see bdf.py final_state
        final_state=final["D"][0].T,
        n_attempts=final["it"],
        # where each fatal lane died (NaN / -1 on success); see body()
        error_time=final["pm_t"],
        error_step_size=final["pm_h"],
        error_order=final["pm_q"],
        error_worst_state=final["pm_worst"],
    )
    if with_sens:
        stats["n_sens_rhs_evals"] = final["nfevS"]
    if with_roots:
        # leading-batch layout, matching vmap(bdf_solve)'s stats shapes
        stats["n_roots"] = final["n_roots"]
        stats["roots_t"] = final["root_t"].T  # (B, cap)
        stats["roots_y"] = final["root_y"].transpose(2, 0, 1)  # (B, cap, n)
        stats["roots_found"] = final["root_dirs"].transpose(2, 0, 1)

    if save_steps > 0:
        from sunode_tpu.ops._recording import finalize_saved_batched

        # surface silent degradation (shared across lanes: the recording
        # stride is keyed to the shared attempt counter)
        stats["checkpoint_thinning_levels"] = (
            final["saved"]["shift"] if thinning else jnp.asarray(0, jnp.int32)
        )
        saved_out = finalize_saved_batched(final["saved"], n, thinning)
    else:
        saved_out = None

    zs = final["zs"]  # (n_t, nt_tot, B)
    ys = jnp.moveaxis(zs[:, sl_y, :], 2, 0)  # (B, n_t, n)
    sens = (
        jnp.moveaxis(zs[:, sl_S, :], 2, 0).reshape(B, n_t, k_sens, n)
        if with_sens
        else None
    )
    quad = jnp.moveaxis(zs[:, sl_Q, :], 2, 0) if with_quad else None
    return BDFResult(
        ys=ys, status=status, stats=stats, saved=saved_out, sens=sens, quad=quad
    )
