"""Variable-order Adams-Moulton integrator (CVODES CV_ADAMS analog).

Adams-Bashforth-Moulton predictor-corrector in backward-difference form with
adaptive order 1..12 and adaptive steps, for non-stiff problems
(reference: CV_ADAMS, /root/reference/include/cvodes/16_cvodes.h:23-24;
selected via ``Solver(problem, solver='ADAMS')``, solver.py:242-283).

Formulation (f-difference array DF[i] = nabla^i f, same rescale/update
machinery as the BDF core):

  predictor (AB-p):  y_pred = y_prev + h * sum_{i<p} gamma_i DF[i]
  corrector (AM-p):  y_n    = y_pred + h * gamma_{p-1} * d_f
                     d_f    = f(t_n, y_n) - sum_{i<p} DF[i]
  (uses the identity sum_{j<=m} gamma*_j = gamma_m between the Moulton and
  Bashforth coefficients, which collapses the Moulton sum onto the AB
  predictor — the classic PECE identity.)
  local error:       h * gamma*_p * d_f           (error const = gamma*_p)
  order selection:   errors at p-1 / p+1 from DF rows (as in BDF).

The corrector is solved by functional iteration (CVODES's default for
Adams — no Jacobian, no linear solves).  Dense output integrates the
f-interpolant exactly (statically precomputed integral basis polynomials),
matching CVodeGetDky-quality interpolation at any order.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sunode_tpu.ops.bdf import (
    MAX_CONSECUTIVE_FAILS,
    MIN_FACTOR,
    MAX_FACTOR,
    STATUS,
    THRESH,
    BDFOptions,
    BDFResult,
    _initial_step,
    _root_scan,
    _root_setup,
    _wrms,
)

__all__ = ["adams_solve", "ADAMS_MAX_ORDER"]

ADAMS_MAX_ORDER = 12
KA = ADAMS_MAX_ORDER + 3  # DF rows 0..p+2
FUNCTIONAL_MAXITER = 4


def _adams_gammas():
    """Adams-Bashforth gammas (backward-difference form) and Moulton gammas.

    gamma_m: 1, 1/2, 5/12, 3/8, ...   via gamma_m = 1 - sum_{k<m} gamma_k/(m+1-k)
    gamma*_m = gamma_m - gamma_{m-1}  (error constants)."""
    K = ADAMS_MAX_ORDER + 2
    g = np.zeros(K)
    for m in range(K):
        g[m] = 1.0 - sum(g[k] / (m + 1 - k) for k in range(m))
    gs = np.empty(K)
    gs[0] = 1.0
    gs[1:] = g[1:] - g[:-1]
    return g, gs


_GAMMA, _GAMMA_STAR = _adams_gammas()


def _integral_basis_coeffs():
    """Static coefficients of c_i(s) = integral_0^s prod_{m<i}(u+m)/(m+1) du.

    c_i is a degree-(i+1) polynomial; returns a (K, K+2) nested tuple of
    monomial coefficients (ascending powers) for i = 0..K-1.  Python floats
    (not numpy scalars) on purpose: they are WEAKLY typed under JAX's
    promotion rules, so Horner evaluation `ci * s + a` preserves the state
    dtype — a numpy f64 scalar here silently promoted every f32 emission
    buffer to f64 under x64 mode, breaking the while_loop carry."""
    K = ADAMS_MAX_ORDER + 1
    out = np.zeros((K, K + 2))
    for i in range(K):
        poly = np.polynomial.Polynomial([1.0])
        for m in range(i):
            poly = poly * np.polynomial.Polynomial([m, 1.0]) / (m + 1)
        integ = poly.integ()
        coefs = integ.coef
        out[i, : len(coefs)] = coefs
    return tuple(tuple(float(c) for c in row) for row in out)


_C_INT = _integral_basis_coeffs()


def _rescale_DF(DF, p, factor):
    """Rescale f-differences for h -> factor*h; same Shampine/Reichelt
    transformation as the BDF D array but sized for Adams orders."""
    dtype = DF.dtype
    K = ADAMS_MAX_ORDER + 1

    def build_R(fac):
        j = jnp.arange(K, dtype=dtype)
        rows = [jnp.ones(K, dtype)]
        for i in range(1, K):
            rows.append(rows[-1] * (i - 1 - fac * j) / i)
        R = jnp.stack(rows)
        ar = jnp.arange(K)
        # differences 0..p-1 are "current"; transform the leading p block
        inblock = (ar[:, None] <= p - 1) & (ar[None, :] <= p - 1)
        eye = jnp.eye(K, dtype=dtype)
        return jnp.where(inblock, R, eye)

    R = build_R(jnp.asarray(factor, dtype))
    U = build_R(jnp.asarray(1.0, dtype))
    t1 = jnp.einsum("ji,j...->i...", R, DF[:K])
    head = jnp.einsum("ji,j...->i...", U, t1)
    return DF.at[:K].set(head)


def _update_DF(DF, p, d_f):
    """Post-acceptance difference update (J = p-1 in the derivation):
      i <= p-1 : DF_new[i] = sum_{j=i..p-1} DF[j] + d_f
      i == p   : d_f
      i == p+1 : d_f - DF[p]
      i >  p+1 : unchanged."""
    q = p - 1
    Dq1 = DF[q + 1]
    DF = lax.dynamic_update_index_in_dim(DF, d_f - Dq1, q + 2, 0)
    DF = lax.dynamic_update_index_in_dim(DF, d_f, q + 1, 0)
    for i in range(ADAMS_MAX_ORDER, -1, -1):
        DF = DF.at[i].set(jnp.where(i <= q, DF[i] + DF[i + 1], DF[i]))
    return DF


def _interp_y(y_n, DF_new, p, h, s):
    """y(t_n + s h) = y_n + h * sum_{i<=p} (c_i(s) - c_i(0)) nabla^i f_n.

    DF_new rows are based at f_n (post-update).  c_i from the static
    integral-basis table; c_i(0) = 0."""
    K = ADAMS_MAX_ORDER + 1
    out = jnp.zeros_like(y_n)
    for i in range(K):
        coefs = _C_INT[i]
        # Horner in s (static coefficients)
        ci = jnp.asarray(0.0, y_n.dtype)
        for a in coefs[::-1]:
            ci = ci * s + a
        w = jnp.where(i <= p, ci, 0.0)
        out = out + w * DF_new[i]
    return y_n + h * out


def adams_solve(
    rhs: Callable,
    t0,
    y0: jnp.ndarray,
    params: jnp.ndarray,
    tvals: jnp.ndarray,
    options: BDFOptions = BDFOptions(),
    *,
    first_step: Optional[Any] = None,
    root_fn: Optional[Callable] = None,  # (t, y, p) -> (nrt,) event functions
    root_cap: int = 8,
    root_terminal: bool = True,
    root_directions: Optional[Any] = None,
    quad_rhs: Optional[Callable] = None,  # (t, y, p) -> (m,)
    quad0: Optional[jnp.ndarray] = None,  # (m,)
) -> BDFResult:
    """Integrate a (non-stiff) ODE with adaptive-order Adams-Moulton.

    Same contract as ``bdf_solve`` minus the Jacobian (functional iteration)
    and the sens block (use BDF or the batched core for sensitivities).
    jit/vmap-compatible.

    root_fn/root_cap/root_terminal/root_directions: CVODES-style
    rootfinding, identical semantics to ``bdf_solve`` (CVODES rootfinding is
    LMM-independent, 16_cvodes.h:195-198) — the shared ``_root_scan`` runs
    on the Adams dense output (exact f-interpolant integral).

    quad_rhs/quad0: CVodeQuadInit analog — quadrature integration is
    LMM-independent (16_cvodes.h:246-267), so quad blocks ride the Adams
    corrector too (error-controlled per ``options.quad_err_con``).  Runs
    through the batch-native functional core at B=1, which carries the
    quad machinery natively."""
    if quad_rhs is not None:
        if quad0 is None:
            raise ValueError("quad_rhs requires quad0")
        if int(options.save_steps) > 0:
            raise ValueError(
                "quad_rhs with save_steps > 0 is not supported on the "
                "Adams core (the adjoint paths carry their own quadrature)"
            )
        from sunode_tpu.ops.adams_batched import adams_solve_batched

        res = adams_solve_batched(
            rhs, t0, jnp.asarray(y0)[None], jnp.asarray(params)[None],
            tvals, options,
            quad_rhs=quad_rhs, quad0=jnp.asarray(quad0)[None],
            first_step=first_step, root_fn=root_fn, root_cap=root_cap,
            root_terminal=root_terminal, root_directions=root_directions,
        )
        stats = {
            k: (v[0] if getattr(v, "ndim", 0) > 0 else v)
            for k, v in res.stats.items()
        }
        return BDFResult(
            ys=res.ys[0], status=res.status[0], stats=stats, saved=None,
            quad=res.quad[0],
        )
    dtype = jnp.result_type(y0.dtype, jnp.float32)
    y0 = jnp.asarray(y0, dtype)
    t0 = jnp.asarray(t0, dtype)
    tvals = jnp.asarray(tvals, dtype)
    n = y0.shape[0]
    n_t = tvals.shape[0]
    t_end = tvals[-1]
    # Order cap (options.adams_max_order, default 8): the fixed-leading-
    # coefficient difference rescale grows ill-conditioned at very high
    # orders + tight tolerances (the classic reason codes cap well below the
    # theoretical Adams-12); 8 is robust to rtol 1e-11 and near-optimal on
    # step counts.  Raiseable to 12 at your own risk.
    max_order = min(options.adams_max_order, ADAMS_MAX_ORDER)

    # scalar or per-state (n,) vector rtol (CVodeVVtolerances analog;
    # see ops/bdf.py) — heuristics use the tightest component
    rtol = jnp.broadcast_to(jnp.asarray(options.rtol, dtype), (n,))
    rtol_s = jnp.min(rtol)
    atol = jnp.broadcast_to(jnp.asarray(options.atol, dtype), (n,))
    gamma = jnp.asarray(_GAMMA, dtype)
    gamma_star = jnp.asarray(np.abs(_GAMMA_STAR), dtype)

    newton_tol = options.newton_tol_factor * jnp.maximum(
        10 * jnp.finfo(dtype).eps / rtol_s, jnp.minimum(0.03, jnp.sqrt(rtol_s))
    )

    if options.constraints is not None:
        constraints = jnp.broadcast_to(jnp.asarray(options.constraints, dtype), (n,))
    else:
        constraints = None

    f0 = rhs(t0, y0, params)
    bad_init = ~(jnp.all(jnp.isfinite(y0)) & jnp.all(jnp.isfinite(f0)))

    h_auto = _initial_step(
        rhs, t0, y0, f0, params, t_end, rtol, atol, options.max_step, dtype
    )
    if first_step is not None:
        fs = jnp.asarray(first_step, dtype)
        h0 = jnp.where(fs > 0, jnp.minimum(fs, t_end - t0), h_auto)
    elif options.first_step is not None:
        h0 = jnp.asarray(options.first_step, dtype)
    else:
        h0 = h_auto
    h0 = jnp.maximum(h0, 1e-12)

    DF0 = jnp.zeros((KA, n), dtype).at[0].set(f0)

    save_steps = int(options.save_steps)
    thinning = bool(options.checkpoint_thinning)
    rec_fd = save_steps > 0 and options.hermite_order == 5
    if save_steps > 0:
        from sunode_tpu.ops._recording import fdot, init_saved_single

        row_parts0 = [t0[None], y0, f0]
        if rec_fd:
            row_parts0.append(fdot(rhs, t0, y0, f0, params))
        row0 = jnp.concatenate(row_parts0)
        buf0 = jnp.full((save_steps, row0.shape[0]), jnp.inf, dtype)
        buf0 = buf0.at[:, 1:].set(0.0).at[0].set(row0)
        saved0 = init_saved_single(buf0, thinning)
    else:
        saved0 = None

    ys0 = jnp.full((n_t, n), jnp.nan, dtype)
    emit_mask = tvals <= t0
    ys0 = jnp.where(emit_mask[:, None], y0[None, :], ys0)
    i_out0 = jnp.sum(emit_mask).astype(jnp.int32)

    with_roots = root_fn is not None
    if with_roots:
        g_init, nrt, rdir, root_cap = _root_setup(
            root_fn, t0, y0, params, dtype, root_cap, root_directions
        )

    carry0 = dict(
        t=t0,
        y=y0,
        h=h0,
        h_D=h0,
        p=jnp.asarray(1, jnp.int32),
        DF=DF0,
        n_equal=jnp.asarray(0, jnp.int32),
        i_out=i_out0,
        ys=ys0,
        status=jnp.where(bad_init, STATUS["BAD_INIT"], -1).astype(jnp.int32),
        consec_fails=jnp.asarray(0, jnp.int32),
        nsteps=jnp.asarray(0, jnp.int32),
        nfev=jnp.asarray(2, jnp.int32),
        nniters=jnp.asarray(0, jnp.int32),
        n_err_fails=jnp.asarray(0, jnp.int32),
        n_conv_fails=jnp.asarray(0, jnp.int32),
        # post-mortem snapshot of the fatal attempt (ref error_* analog)
        pm_t=jnp.asarray(jnp.nan, dtype),
        pm_h=jnp.asarray(jnp.nan, dtype),
        pm_q=jnp.asarray(-1, jnp.int32),
        pm_worst=jnp.asarray(-1, jnp.int32),
        saved=saved0,
    )
    if with_roots:
        carry0.update(
            g_prev=g_init,
            root_t=jnp.full((root_cap,), jnp.inf, dtype),
            root_y=jnp.zeros((root_cap, n), dtype),
            root_dirs=jnp.zeros((root_cap, nrt), jnp.int32),
            n_roots=jnp.asarray(0, jnp.int32),
        )

    def cond(c):
        return (c["status"] == -1) & (c["i_out"] < n_t)

    def body(c):
        t, p, y_prev = c["t"], c["p"], c["y"]

        h_min_loc = 10 * jnp.finfo(dtype).eps * jnp.maximum(jnp.abs(t), jnp.abs(t_end))
        # NaN-robust form (see ops/bdf.py): non-finite h terminates the lane
        underflow = ~(c["h"] >= jnp.maximum(h_min_loc, options.min_step))
        h_use = jnp.minimum(c["h"], t_end - t)
        t_new = t + h_use

        pre_factor = h_use / jnp.maximum(c["h_D"], 1e-300)
        DF = _rescale_DF(c["DF"], p, pre_factor)

        # predictor + extrapolated f (masked sums over i < p)
        K = ADAMS_MAX_ORDER + 1
        acc_y = jnp.zeros_like(y_prev)
        f_extrap = jnp.zeros_like(y_prev)
        for i in range(K):
            m = jnp.where(i <= p - 1, 1.0, 0.0)
            acc_y = acc_y + m * gamma[i] * DF[i]
            f_extrap = f_extrap + m * DF[i]
        y_pred = y_prev + h_use * acc_y
        c_A = h_use * gamma[p - 1]

        scale = atol + rtol * jnp.abs(y_pred)
        scale_w = 1.0 / scale
        pred_ok = jnp.all(jnp.isfinite(y_pred))

        # functional (fixed-point) corrector iteration
        def fbody(st):
            k, y, dy_old, conv, div, bad, nfev = st
            f = rhs(t_new, y, params)
            bad_f = ~jnp.all(jnp.isfinite(f))
            y_next = y_pred + c_A * (f - f_extrap)
            delta = y_next - y
            dy_norm = _wrms(delta, scale_w)
            rate = dy_norm / dy_old
            diverged = (k > 0) & (rate >= 2.0)
            converged = (dy_norm == 0.0) | (
                (k > 0) & (rate < 1.0) & (rate / (1 - rate) * dy_norm < newton_tol)
            ) | (dy_norm < 0.1 * newton_tol)
            bad = bad_f
            return (
                k + 1,
                y_next,
                dy_norm,
                converged & ~bad,
                diverged & ~converged,
                bad,
                nfev + 1,
            )

        def fcond(st):
            k, y, dy_old, conv, div, bad, nfev = st
            return (k < FUNCTIONAL_MAXITER) & ~(conv | div | bad)

        finit = (
            jnp.asarray(0, jnp.int32),
            y_pred,
            jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        )
        k_it, y_new, _, conv, div, badf, nfev_n = lax.while_loop(fcond, fbody, finit)
        conv = conv & pred_ok

        f_new = rhs(t_new, y_new, params)
        d_f = f_new - f_extrap

        if constraints is not None:
            viol = (
                ((constraints == 1) & (y_new < 0))
                | ((constraints == -1) & (y_new > 0))
                | ((constraints == 2) & (y_new <= 0))
                | ((constraints == -2) & (y_new >= 0))
            )
            constraint_fail = jnp.any(viol)
        else:
            constraint_fail = jnp.asarray(False)

        # error test: LTE ~ h * gamma*_p * d_f; scale by h/c_A to express in
        # the same normalized form as the corrector (err = |gamma*_p| h d_f)
        err = gamma_star[p] * h_use * d_f
        err_norm = _wrms(err, scale_w)
        err_ok = err_norm <= 1.0
        accept = conv & err_ok & ~constraint_fail
        err_reject = conv & (~err_ok | constraint_fail)

        DF_upd = _update_DF(DF, p, d_f)
        n_equal = jnp.where(accept, c["n_equal"] + 1, 0)
        t_next = jnp.where(accept, t_new, t)
        y_next_carry = jnp.where(accept, y_new, y_prev)

        # ---- rootfinding (shared _root_scan; accept-gated g evals) -------
        if with_roots:

            def _scan(_):
                return _root_scan(
                    root_fn,
                    params,
                    rdir,
                    c["g_prev"],
                    t,
                    t_new,
                    h_use,
                    y_new,
                    lambda tt: _interp_y(y_new, DF_upd, p, h_use, (tt - t_new) / h_use),
                    dtype,
                )

            def _skip(_):
                return (
                    jnp.asarray(False),
                    jnp.asarray(jnp.inf, dtype),
                    jnp.zeros((nrt,), jnp.int32),
                    jnp.zeros((n,), dtype),
                    c["g_prev"],
                )

            root_hit, t_root, root_dirs_now, y_root, g_new = lax.cond(
                accept, _scan, _skip, None
            )
            # FIRST root_cap roots recorded; n_roots counts past the cap so
            # stats['n_roots'] > root_cap signals truncation (see bdf.py)
            can_rec = root_hit & (c["n_roots"] < root_cap)
            ridx = jnp.minimum(c["n_roots"], root_cap - 1)
            root_t_buf = jnp.where(
                can_rec, c["root_t"].at[ridx].set(t_root), c["root_t"]
            )
            root_y_buf = jnp.where(
                can_rec, c["root_y"].at[ridx].set(y_root), c["root_y"]
            )
            root_dirs_buf = jnp.where(
                can_rec,
                c["root_dirs"].at[ridx].set(root_dirs_now),
                c["root_dirs"],
            )
            n_roots_new = c["n_roots"] + jnp.where(root_hit, 1, 0)
            g_prev_new = jnp.where(accept, g_new, c["g_prev"])
            if root_terminal:
                t_stop = jnp.where(root_hit, t_root, jnp.asarray(jnp.inf, dtype))
            else:
                t_stop = jnp.asarray(jnp.inf, dtype)
        else:
            t_stop = None

        # ---- emission ---------------------------------------------------
        def emit_cond(st):
            i_out = st[0]
            ok = (
                accept
                & (i_out < n_t)
                & (tvals[jnp.minimum(i_out, n_t - 1)] <= t_new + 1e-14 * jnp.abs(t_new))
            )
            if t_stop is not None:
                ok = ok & (tvals[jnp.minimum(i_out, n_t - 1)] <= t_stop)
            return ok

        def emit_body(st):
            i_out, ys = st
            te = tvals[jnp.minimum(i_out, n_t - 1)]
            s = (te - t_new) / h_use
            yi = _interp_y(y_new, DF_upd, p, h_use, s)
            ys = ys.at[i_out].set(yi)
            return i_out + 1, ys

        i_out, ys = lax.while_loop(emit_cond, emit_body, (c["i_out"], c["ys"]))

        if save_steps > 0:
            from sunode_tpu.ops._recording import fdot, record_step_single

            row_parts_r = [t_new[None], y_new, f_new]
            if rec_fd:
                row_parts_r.append(fdot(rhs, t_new, y_new, f_new, params))
            row = jnp.concatenate(row_parts_r)
            sv = record_step_single(c["saved"], accept, row, save_steps, thinning)
        else:
            sv = c["saved"]

        # ---- order & step adaptation -----------------------------------
        can_adapt = n_equal >= p + 1
        err_m = jnp.where(
            p > 1,
            _wrms(gamma_star[jnp.maximum(p - 1, 0)] * h_use * DF_upd[p - 1], scale_w),
            jnp.inf,
        )
        err_p = jnp.where(
            p < max_order,
            _wrms(
                gamma_star[jnp.minimum(p + 1, ADAMS_MAX_ORDER + 1)]
                * h_use
                * DF_upd[p + 1],
                scale_w,
            ),
            jnp.inf,
        )

        def fac(e, qq):
            unavailable = ~jnp.isfinite(e)
            e_safe = jnp.clip(e, 1e-30, 1e30)
            f = 0.9 * e_safe ** (-1.0 / (qq + 1.0))
            return jnp.where(unavailable, 0.0, f)

        f_m = fac(err_m, (p - 1).astype(dtype))
        f_0 = fac(err_norm, p.astype(dtype))
        f_p = fac(err_p, (p + 1).astype(dtype))
        facs = jnp.stack([f_m, f_0, f_p])
        best = jnp.argmax(facs)
        dq = best.astype(jnp.int32) - 1
        factor_best = jnp.clip(facs[best], MIN_FACTOR, MAX_FACTOR)

        do_change = can_adapt & ((factor_best >= THRESH) | (factor_best < 1.0) | (dq != 0))
        p_acc = jnp.where(do_change, jnp.clip(p + dq, 1, max_order), p)
        factor_acc = jnp.where(do_change, factor_best, 1.0)
        factor_acc = jnp.minimum(factor_acc, options.max_step / jnp.maximum(h_use, 1e-300))
        n_equal = jnp.where(do_change & accept, 0, n_equal)

        factor_rej = jnp.clip(
            0.9 * jnp.clip(err_norm, 1e-30, 1e30) ** (-1.0 / (p + 1.0)),
            MIN_FACTOR,
            0.9,
        )
        factor_rej = jnp.where(constraint_fail & err_ok, 0.25, factor_rej)
        factor_fail = jnp.where(~conv, 0.25, factor_rej)  # conv failure: h/4 (CVODES ETACF)

        # breakdown detector: marginal accepts (err > 0.5) don't clear the
        # failure counter; after 4 accumulated failures, RESET the history
        # (keep only nabla^0 f, which is exact at the last accepted point)
        # and restart at order 1 — recovers from corrupted high-order
        # differences that otherwise drive an h-collapse.
        cfails_fail = c["consec_fails"] + 1
        reset = ~accept & (cfails_fail >= 4)
        # decay counter (see ops/bdf.py)
        cfails = jnp.where(
            accept,
            jnp.where(
                err_norm <= 0.9,
                jnp.maximum(c["consec_fails"] - 1, 0),
                c["consec_fails"],
            ),
            jnp.where(reset, 0, cfails_fail),
        )
        factor_next = jnp.where(accept, factor_acc, jnp.where(reset, 0.25, factor_fail))
        h_next = h_use * factor_next
        p_next = jnp.where(accept, p_acc, jnp.where(reset, 1, p))
        row0 = (jnp.arange(KA) == 0).astype(dtype)[:, None]
        DF_next = jnp.where(accept, DF_upd, jnp.where(reset, DF * row0, DF))

        too_many = cfails >= MAX_CONSECUTIVE_FAILS

        status = c["status"]
        status = jnp.where(
            (status == -1) & too_many & ~accept, STATUS["REPEATED_FAILURES"], status
        )
        nsteps = c["nsteps"] + jnp.where(accept, 1, 0)
        status = jnp.where(
            (status == -1) & (nsteps >= options.max_steps), STATUS["MAX_STEPS"], status
        )
        status = jnp.where((status == -1) & underflow, STATUS["STEP_UNDERFLOW"], status)
        root_ret_now = jnp.asarray(False)
        if with_roots and root_terminal:
            root_ret_now = (status == -1) & root_hit
            status = jnp.where(root_ret_now, STATUS["ROOT_RETURN"], status)

        # post-mortem: snapshot (t, attempted h, order, worst state) on the
        # attempt where the status turns fatal (ref symode/problem.py:150-158
        # error_* analog).  Worst state = largest weighted LTE component on
        # an error rejection, largest weighted correction otherwise.
        fatal_now = (c["status"] == -1) & (status != -1) & ~root_ret_now
        e_err = jnp.abs(err) * scale_w
        e_newt = jnp.abs(y_new - y_pred) * scale_w
        worst = jnp.argmax(jnp.where(conv, e_err, e_newt)).astype(jnp.int32)
        pm_t = jnp.where(fatal_now, t, c["pm_t"])
        pm_h = jnp.where(fatal_now, h_use, c["pm_h"])
        pm_q = jnp.where(fatal_now, p, c["pm_q"]).astype(jnp.int32)
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
            y=y_next_carry,
            h=h_next,
            h_D=h_use,
            p=p_next,
            DF=DF_next,
            n_equal=n_equal.astype(jnp.int32),
            i_out=i_out,
            ys=ys,
            status=status.astype(jnp.int32),
            consec_fails=cfails.astype(jnp.int32),
            nsteps=nsteps,
            nfev=c["nfev"] + nfev_n + 1,
            nniters=c["nniters"] + k_it,
            n_err_fails=c["n_err_fails"] + jnp.where(err_reject, 1, 0),
            n_conv_fails=c["n_conv_fails"] + jnp.where(~conv, 1, 0),
            pm_t=pm_t,
            pm_h=pm_h,
            pm_q=pm_q,
            pm_worst=pm_worst,
            saved=sv,
        )

    final = lax.while_loop(cond, body, carry0)

    status = jnp.where(final["status"] == -1, STATUS["SUCCESS"], final["status"]).astype(
        jnp.int32
    )
    stats = dict(
        n_steps=final["nsteps"],
        n_rhs_evals=final["nfev"],
        n_jac_evals=jnp.asarray(0, jnp.int32),
        n_factorizations=jnp.asarray(0, jnp.int32),
        n_newton_iters=final["nniters"],
        n_error_test_fails=final["n_err_fails"],
        n_conv_fails=final["n_conv_fails"],
        final_order=final["p"],
        final_step_size=final["h"],
        final_time=final["t"],
        # state at final_time — resume-in-place support (see bdf.py)
        final_state=final["y"],
        # where a fatal solve died (NaN / -1 on success); see body()
        error_time=final["pm_t"],
        error_step_size=final["pm_h"],
        error_order=final["pm_q"],
        error_worst_state=final["pm_worst"],
    )
    if with_roots:
        # CVodeGetRootInfo analog (see bdf.py): per-root times (+inf
        # padding), states at the roots, per-component crossing directions
        stats["n_roots"] = final["n_roots"]
        stats["roots_t"] = final["root_t"]
        stats["roots_y"] = final["root_y"]
        stats["roots_found"] = final["root_dirs"]
    if save_steps > 0:
        from sunode_tpu.ops._recording import finalize_saved_single

        stats["checkpoint_thinning_levels"] = (
            final["saved"]["shift"] if thinning else jnp.asarray(0, jnp.int32)
        )
        buf, n_saved, overflow = finalize_saved_single(final["saved"], thinning)
        saved_out = {
            "t": buf[:, 0],
            "y": buf[:, 1 : n + 1],
            "f": buf[:, n + 1 : 2 * n + 1],
            "n_saved": n_saved,
            "overflow": overflow,
        }
        if rec_fd:
            saved_out["fd"] = buf[:, 2 * n + 1 :]
    else:
        saved_out = None
    return BDFResult(
        ys=final["ys"], status=status, stats=stats, saved=saved_out
    )


def adams_options(options: BDFOptions) -> BDFOptions:
    """Solver('ADAMS') configuration hook: keep the default order cap
    (max_order<=5 is interpreted as "use the Adams default of 8")."""
    return options
