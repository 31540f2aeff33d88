"""Variable-order adaptive BDF integrator inside ``lax.while_loop``.

This is the TPU-native replacement for the CVODES C integrator itself
(reference L0; API surface /root/reference/include/cvodes/16_cvodes.h): a
variable-order (1-5), variable-step BDF method with

  * backward-difference history array ``D`` (the classic fixed-leading-
    coefficient formulation of Shampine & Reichelt's ode15s / CVODES lineage),
  * WRMS-norm error control with scalar/vector atol,
  * modified Newton iteration reusing a cached Jacobian and a cached
    factorization of ``M = I - c J`` until they go stale (CVODES's stale-J
    strategy, cvode MSBP/DGMAX analog),
  * step/order selection from estimated truncation errors at orders
    q-1, q, q+1 with CVODES-style hysteresis (no change unless the step
    factor exceeds 1.5),
  * dense output by Newton backward-difference interpolation (replaces
    ``CVodeGetDky``), emitted at the requested ``tvals`` as the integration
    passes them (CV_NORMAL semantics),
  * optional recording of every accepted step (t, y, f) for the
    Hermite-interpolated checkpointed adjoint (CV_HERMITE analog,
    reference solver.py:579-588),
  * optional inequality constraints on the state (CVodeSetConstraints).

Everything is a single ``lax.while_loop`` whose body attempts ONE step:
data-dependent control flow (rejection, order change, Newton failure) is
encoded in the carry, so the whole solve jits once and ``vmap`` turns it into
a lockstep batched integrator (divergent chains mask, they don't branch).

Failures follow the reference's recoverable-error contract: non-finite RHS or
a failed error test shrink the step (symode/problem.py:266-269); persistent
failure sets a status code, and the caller NaN-fills outputs
(solver.py:510-519 + as_pytensor.py:244-247 semantics).

Float64 throughout by default; the Newton solve uses the f64-safe pure-jnp
LU / closed forms from ``sunode_tpu.ops.linalg``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sunode_tpu.ops.linalg import factor_newton, solve_factored

__all__ = ["BDFOptions", "bdf_solve", "BDFResult", "STATUS"]

MAX_ORDER = 5
KD = MAX_ORDER + 3  # rows of the difference array: D[0..q+2] needed
NEWTON_MAXITER = 4
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0
# CVODES-style hysteresis: don't change h unless the proposed factor is
# at least THRESH (cvode eta THRESH = 1.5)
THRESH = 1.5
MAX_CONSECUTIVE_FAILS = 10

STATUS = {
    "SUCCESS": 0,
    "MAX_STEPS": 1,
    "STEP_UNDERFLOW": 2,
    "BAD_INIT": 3,
    "REPEATED_FAILURES": 4,
}


class BDFOptions(NamedTuple):
    rtol: float = 1e-8
    atol: Any = 1e-8
    max_steps: int = 100_000
    first_step: Optional[float] = None  # None -> automatic (Hairer-Wanner)
    max_order: int = MAX_ORDER
    max_step: float = np.inf
    min_step: float = 0.0
    use_ndf: bool = False  # NDF(kappa) modification; False = plain BDF (CVODES)
    constraints: Optional[Any] = None  # per-state: 0 none, 1 >=0, -1 <=0, 2 >0, -2 <0
    save_steps: int = 0  # record accepted steps (for the adjoint checkpointing)
    newton_tol_factor: float = 1.0


class BDFResult(NamedTuple):
    ys: jnp.ndarray  # (n_t, n) solution at tvals (NaN where failed)
    status: jnp.ndarray  # int32 status code
    stats: dict  # counters and final state
    saved: Optional[dict]  # recorded steps if save_steps > 0


def _wrms(x, w):
    """CVODES weighted root-mean-square norm with weights 1/scale."""
    return jnp.sqrt(jnp.mean((x * w) ** 2))


def _order_constants(use_ndf: bool, dtype):
    k = np.arange(1, MAX_ORDER + 1)
    gamma = np.concatenate([[0.0], np.cumsum(1.0 / k)])  # gamma[q], q=0..5
    if use_ndf:
        kappa = np.array([0.0, -0.1850, -1 / 9, -0.0823, -0.0415, 0.0])
    else:
        kappa = np.zeros(MAX_ORDER + 1)
    alpha = (1 - kappa) * gamma
    alpha[0] = 1.0  # unused; avoid div-by-zero
    error_const = kappa * gamma + 1.0 / np.arange(1, MAX_ORDER + 2)
    return (
        jnp.asarray(gamma, dtype),
        jnp.asarray(alpha, dtype),
        jnp.asarray(error_const, dtype),
    )


def _build_R(q, factor, dtype):
    """The 6x6 difference-rescaling matrix, masked to act as identity outside
    the leading (q+1)x(q+1) block.  R[0,:]=1; R[i,j] = R[i-1,j]*(i-1-factor*j)/i.
    """
    K = MAX_ORDER + 1
    j = jnp.arange(K, dtype=dtype)
    rows = [jnp.ones(K, dtype)]
    for i in range(1, K):
        rows.append(rows[-1] * (i - 1 - factor * j) / i)
    R = jnp.stack(rows)  # (K, K)
    ar = jnp.arange(K)
    inblock = (ar[:, None] <= q) & (ar[None, :] <= q)
    eye = jnp.eye(K, dtype=dtype)
    return jnp.where(inblock, R, eye)


def _rescale_D(D, q, factor):
    """Rescale the difference array for a step-size change h -> factor*h.

    Classic Shampine/Reichelt transformation: D[:q+1] <- (R(factor) U)^T D[:q+1]
    with U = R(1); verified against directly-recomputed differences in tests.
    """
    dtype = D.dtype
    R = _build_R(q, jnp.asarray(factor, dtype), dtype)
    U = _build_R(q, jnp.asarray(1.0, dtype), dtype)
    RU = R @ U
    K = MAX_ORDER + 1
    D_head = RU.T @ D[:K]
    return D.at[:K].set(D_head)


def _predict(D, q, gamma, alpha):
    """y_pred = sum_{i<=q} D[i];  psi = (1/alpha_q) sum_{1<=i<=q} gamma_i D[i]."""
    K = MAX_ORDER + 1
    ar = jnp.arange(K)
    wy = (ar <= q).astype(D.dtype)
    y_pred = jnp.einsum("i,in->n", wy, D[:K])
    wp = jnp.where((ar >= 1) & (ar <= q), gamma[:K], 0.0)
    psi = jnp.einsum("i,in->n", wp, D[:K]) / alpha[q]
    return y_pred, psi


def _update_D(D, q, d):
    """After an accepted step with correction d = y_new - y_pred:
    D[q+2] = d - D[q+1]; D[q+1] = d; D[i] += D[i+1] for i = q..0."""
    K = MAX_ORDER + 1
    ar = jnp.arange(KD)
    # dynamic-index writes at q+1, q+2
    Dq1 = D[q + 1]
    D = lax.dynamic_update_index_in_dim(D, d - Dq1, q + 2, 0)
    D = lax.dynamic_update_index_in_dim(D, d, q + 1, 0)
    # masked downward accumulation (static unroll, MAX_ORDER+1 iterations)
    for i in range(MAX_ORDER, -1, -1):
        D = D.at[i].set(jnp.where(i <= q, D[i] + D[i + 1], D[i]))
    return D


def _interpolate(D, q, t_n, h, t_eval):
    """Newton backward-difference evaluation of the interpolant at t_eval.

    P(t_n + s h) = sum_{i=0..q} D[i] prod_{m=0..i-1} (s+m)/(m+1).
    Replaces CVodeGetDky dense output."""
    s = (t_eval - t_n) / h
    out = D[0]
    w = jnp.asarray(1.0, D.dtype)
    for i in range(1, MAX_ORDER + 1):
        w = w * (s + i - 1) / i
        out = out + jnp.where(i <= q, w, 0.0) * D[i]
    return out


def _initial_step(rhs, t0, y0, f0, p, t_end, rtol, atol, max_step, dtype):
    """Hairer-Wanner automatic initial step size (order-1 estimate)."""
    scale = atol + rtol * jnp.abs(y0)
    w = 1.0 / scale
    d0 = _wrms(y0, w)
    d1 = _wrms(f0, w)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    h0 = jnp.minimum(h0, 0.5 * (t_end - t0))
    y1 = y0 + h0 * f0
    f1 = rhs(t0 + h0, y1, p)
    d2 = _wrms(f1 - f0, w) / h0
    dm = jnp.maximum(d1, d2)
    h1 = jnp.where(dm <= 1e-15, jnp.maximum(1e-6, h0 * 1e-3), jnp.sqrt(0.01 / dm))
    h = jnp.minimum(100 * h0, h1)
    h = jnp.minimum(h, t_end - t0)
    h = jnp.minimum(h, max_step)
    return jnp.asarray(h, dtype)


def bdf_solve(
    rhs: Callable,
    jac: Callable,
    t0,
    y0: jnp.ndarray,
    params: jnp.ndarray,
    tvals: jnp.ndarray,
    options: BDFOptions = BDFOptions(),
) -> BDFResult:
    """Integrate dy/dt = rhs(t, y, p) from t0, emitting y(tvals).

    rhs: (t, y, p) -> (n,);  jac: (t, y, p) -> (n, n) = df/dy.
    tvals must be increasing with tvals[0] >= t0.  Fully jit/vmap-compatible.
    """
    dtype = jnp.result_type(y0.dtype, jnp.float32)
    y0 = jnp.asarray(y0, dtype)
    t0 = jnp.asarray(t0, dtype)
    tvals = jnp.asarray(tvals, dtype)
    n = y0.shape[0]
    n_t = tvals.shape[0]
    t_end = tvals[-1]

    rtol = jnp.asarray(options.rtol, dtype)
    atol = jnp.broadcast_to(jnp.asarray(options.atol, dtype), (n,))
    gamma, alpha, error_const = _order_constants(options.use_ndf, dtype)
    max_order = min(options.max_order, MAX_ORDER)

    if options.constraints is not None:
        constraints = jnp.broadcast_to(jnp.asarray(options.constraints, dtype), (n,))
    else:
        constraints = None

    newton_tol = options.newton_tol_factor * jnp.maximum(
        10 * jnp.finfo(dtype).eps / rtol, jnp.minimum(0.03, jnp.sqrt(rtol))
    )

    f0 = rhs(t0, y0, params)
    bad_init = ~(jnp.all(jnp.isfinite(y0)) & jnp.all(jnp.isfinite(f0)))

    if options.first_step is None:
        h0 = _initial_step(
            rhs, t0, y0, f0, params, t_end, rtol, atol, options.max_step, dtype
        )
    else:
        h0 = jnp.asarray(options.first_step, dtype)
    h0 = jnp.maximum(h0, 1e-12)

    D0 = jnp.zeros((KD, n), dtype)
    D0 = D0.at[0].set(y0).at[1].set(h0 * f0)

    save_steps = int(options.save_steps)
    if save_steps > 0:
        saved0 = {
            "t": jnp.full((save_steps,), jnp.nan, dtype),
            "y": jnp.zeros((save_steps, n), dtype),
            "f": jnp.zeros((save_steps, n), dtype),
            "n_saved": jnp.asarray(0, jnp.int32),
        }
        # record the initial condition as node 0
        saved0["t"] = saved0["t"].at[0].set(t0)
        saved0["y"] = saved0["y"].at[0].set(y0)
        saved0["f"] = saved0["f"].at[0].set(f0)
        saved0["n_saved"] = jnp.asarray(1, jnp.int32)
    else:
        saved0 = None

    # emit any tvals coinciding with t0 (or pathologically before it)
    ys0 = jnp.full((n_t, n), jnp.nan, dtype)
    i_out0 = 0
    emit_mask = tvals <= t0
    ys0 = jnp.where(emit_mask[:, None], y0[None, :], ys0)
    i_out0 = jnp.sum(emit_mask).astype(jnp.int32)

    factors0 = factor_newton(jnp.eye(n, dtype=dtype))

    # CVODES evaluates a real Jacobian before the first BDF Newton iteration;
    # starting from J=0 would silently run functional iteration instead.
    J0 = jac(t0, y0, params)

    carry0 = dict(
        t=t0,
        h=h0,
        q=jnp.asarray(1, jnp.int32),
        D=D0,
        n_equal=jnp.asarray(0, jnp.int32),
        J=J0,
        J_current=jnp.asarray(True),
        factors=factors0,
        c_factored=jnp.asarray(0.0, dtype),
        need_factor=jnp.asarray(True),
        i_out=i_out0,
        ys=ys0,
        status=jnp.where(bad_init, STATUS["BAD_INIT"], -1).astype(jnp.int32),
        consec_err_fails=jnp.asarray(0, jnp.int32),
        consec_conv_fails=jnp.asarray(0, jnp.int32),
        nsteps=jnp.asarray(0, jnp.int32),
        nfev=jnp.asarray(1 + (options.first_step is None), jnp.int32),
        njev=jnp.asarray(1, jnp.int32),
        nfactor=jnp.asarray(0, jnp.int32),
        nniters=jnp.asarray(0, jnp.int32),
        n_err_fails=jnp.asarray(0, jnp.int32),
        n_conv_fails=jnp.asarray(0, jnp.int32),
        saved=saved0,
    )

    def cond(c):
        return (c["status"] == -1) & (c["i_out"] < n_t)

    def newton_iterate(t_new, y_pred, psi, c_coef, factors, scale_w):
        """Modified-Newton solve of d = c f(y_pred + d) - psi.
        Returns (converged, diverged_or_bad, y, d, n_iters, nfev)."""

        def nbody(st):
            k, y, d, dy_norm_old, conv, div, bad, nfev = st
            f = rhs(t_new, y, params)
            bad_f = ~jnp.all(jnp.isfinite(f))
            res = c_coef * f - psi - d
            delta = solve_factored(factors, res)
            bad_d = ~jnp.all(jnp.isfinite(delta))
            dy_norm = _wrms(delta, scale_w)
            rate = dy_norm / dy_norm_old  # inf-safe: old starts at inf -> rate 0
            diverged = (k > 0) & (
                (rate >= 2.0)
                | (
                    (rate < 1.0)
                    & (rate ** (NEWTON_MAXITER - k) / (1 - rate) * dy_norm > newton_tol)
                )
            )
            d = d + delta
            y = y + delta
            converged = (dy_norm == 0.0) | (
                (k > 0) & (rate < 1.0) & (rate / (1 - rate) * dy_norm < newton_tol)
            )
            bad = bad_f | bad_d
            return (
                k + 1,
                y,
                d,
                dy_norm,
                converged & ~bad,
                diverged & ~converged,
                bad,
                nfev + 1,
            )

        def ncond(st):
            k, y, d, dy_norm_old, conv, div, bad, nfev = st
            return (k < NEWTON_MAXITER) & ~(conv | div | bad)

        init = (
            jnp.asarray(0, jnp.int32),
            y_pred,
            jnp.zeros_like(y_pred),
            jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        )
        k, y, d, _, conv, div, bad, nfev = lax.while_loop(ncond, nbody, init)
        return conv, div | bad, y, d, k, nfev

    def body(c):
        t, h, q, D = c["t"], c["h"], c["q"], c["D"]

        # clamp h to land exactly on t_end
        h_min_loc = 10 * jnp.finfo(dtype).eps * jnp.maximum(jnp.abs(t), jnp.abs(t_end))
        underflow = h < jnp.maximum(h_min_loc, options.min_step)
        h_eff = jnp.minimum(h, t_end - t)
        rescale_clamp = h_eff < h  # D must be rescaled if we clamp
        clamp_factor = jnp.where(rescale_clamp, h_eff / h, 1.0)
        D = jnp.where(rescale_clamp, _rescale_D(D, q, clamp_factor), D)
        h_use = h_eff
        t_new = t + h_use

        # (re)build + factor Newton matrix if stale
        c_coef = h_use / alpha[q]
        c_changed = jnp.abs(c_coef / jnp.where(c["c_factored"] == 0, 1.0, c["c_factored"]) - 1.0) > 1e-12
        need_factor = c["need_factor"] | c_changed | rescale_clamp

        def do_factor(_):
            M = jnp.eye(n, dtype=dtype) - c_coef * c["J"]
            return factor_newton(M), c_coef, c["nfactor"] + 1

        factors, c_factored, nfactor = lax.cond(
            need_factor,
            do_factor,
            lambda _: (c["factors"], c["c_factored"], c["nfactor"]),
            None,
        )

        y_pred, psi = _predict(D, q, gamma, alpha)
        scale = atol + rtol * jnp.abs(y_pred)
        scale_w = 1.0 / scale
        pred_ok = jnp.all(jnp.isfinite(y_pred))

        conv, failed, y_new, d_corr, n_iters, nfev_n = newton_iterate(
            t_new, y_pred, psi, c_coef, factors, scale_w
        )
        conv = conv & pred_ok
        failed = failed | ~pred_ok

        # constraint check (CVodeSetConstraints semantics)
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

        newton_failed = ~conv
        # --- Newton failure handling -----------------------------------
        # If J is stale: refresh J and retry at same h.  Else halve h.
        refresh_J = newton_failed & ~c["J_current"]
        halve = newton_failed & c["J_current"]

        J_new = lax.cond(
            refresh_J,
            lambda _: jac(t_new, y_pred, params),
            lambda _: c["J"],
            None,
        )
        njev = c["njev"] + jnp.where(refresh_J, 1, 0)

        # --- error test (only when Newton converged) -------------------
        err = error_const[q] * d_corr
        err_norm = _wrms(err, scale_w)
        err_ok = err_norm <= 1.0
        accept = conv & err_ok & ~constraint_fail

        err_reject = conv & (~err_ok | constraint_fail)
        # step factor after error-test rejection
        factor_rej = jnp.clip(
            0.9 * err_norm ** (-1.0 / (q + 1.0)), MIN_FACTOR, 0.9
        )
        factor_rej = jnp.where(constraint_fail & err_ok, 0.25, factor_rej)

        # ---------------------------------------------------------------
        # Accepted-step bookkeeping
        # ---------------------------------------------------------------
        def on_accept(c):
            D_new = _update_D(D, q, d_corr)
            n_equal = c["n_equal"] + 1
            t_acc = t_new

            # emit outputs for all tvals in (t_old, t_new]
            def emit_cond(st):
                i_out, ys = st
                return (i_out < n_t) & (tvals[jnp.minimum(i_out, n_t - 1)] <= t_acc + 1e-14 * jnp.abs(t_acc))

            def emit_body(st):
                i_out, ys = st
                te = tvals[jnp.minimum(i_out, n_t - 1)]
                yi = _interpolate(D_new, q, t_acc, h_use, te)
                ys = ys.at[i_out].set(yi)
                return i_out + 1, ys

            i_out, ys = lax.while_loop(
                emit_cond, emit_body, (c["i_out"], c["ys"])
            )

            # record accepted step for adjoint checkpointing
            if save_steps > 0:
                sv = c["saved"]
                f_acc = rhs(t_acc, y_new, params)
                ns = sv["n_saved"]
                slot = jnp.minimum(ns, save_steps - 1)
                sv = dict(
                    t=sv["t"].at[slot].set(t_acc),
                    y=sv["y"].at[slot].set(y_new),
                    f=sv["f"].at[slot].set(f_acc),
                    n_saved=jnp.minimum(ns + 1, save_steps),
                )
            else:
                sv = c["saved"]

            # ----- order & step adaptation (only after q+1 equal steps)
            can_adapt = n_equal >= q + 1

            # error at order q-1 uses D[q] (the new one), q+1 uses D[q+2]
            Dq = D_new[q]
            Dq2 = D_new[q + 2]
            err_m = jnp.where(
                q > 1, _wrms(error_const[jnp.maximum(q - 1, 0)] * Dq, scale_w), jnp.inf
            )
            err_p = jnp.where(
                q < max_order,
                _wrms(error_const[jnp.minimum(q + 1, MAX_ORDER)] * Dq2, scale_w),
                jnp.inf,
            )
            # step factors for each candidate order qq with LTE ~ h^(qq+1):
            # factor = safety * err^(-1/(qq+1)).
            # NOTE: keep inf out of ** — TPU f64 emulation yields nan for
            # inf**negative (CPU gives 0), so clamp before exponentiating.
            def fac(e, qq):
                unavailable = ~jnp.isfinite(e)
                e_safe = jnp.clip(e, 1e-30, 1e30)
                f = 0.9 * e_safe ** (-1.0 / (qq + 1.0))
                return jnp.where(unavailable, 0.0, f)

            f_m = fac(err_m, q - 1)
            f_0 = fac(err_norm, q)
            f_p = fac(err_p, q + 1)
            facs = jnp.stack([f_m, f_0, f_p])
            best = jnp.argmax(facs)
            dq = best.astype(jnp.int32) - 1
            factor_best = jnp.clip(facs[best], MIN_FACTOR, MAX_FACTOR)

            do_change = can_adapt & (
                (factor_best >= THRESH) | (factor_best < 1.0) | (dq != 0)
            )
            # hysteresis: if step factor is small and order unchanged, skip
            do_change = do_change & ((dq != 0) | (factor_best >= THRESH) | (factor_best < 1.0))

            q_new = jnp.where(do_change, jnp.clip(q + dq, 1, max_order), q)
            factor_eff = jnp.where(do_change, factor_best, 1.0)
            # cap so h doesn't exceed max_step
            factor_eff = jnp.minimum(factor_eff, options.max_step / jnp.maximum(h_use, 1e-300))
            D_adapted = jnp.where(
                do_change & (factor_eff != 1.0),
                _rescale_D(D_new, q_new, factor_eff),
                D_new,
            )
            h_new = jnp.where(do_change, h_use * factor_eff, h_use)
            n_equal_new = jnp.where(do_change, 0, n_equal)

            out = dict(c)
            out.update(
                t=t_acc,
                h=h_new,
                q=q_new,
                D=D_adapted,
                n_equal=n_equal_new,
                J=J_new,
                # J goes stale as soon as the state advances
                J_current=jnp.asarray(False),
                factors=factors,
                c_factored=c_factored,
                need_factor=do_change & (factor_eff != 1.0),
                i_out=i_out,
                ys=ys,
                consec_err_fails=jnp.asarray(0, jnp.int32),
                consec_conv_fails=jnp.asarray(0, jnp.int32),
                nsteps=c["nsteps"] + 1,
                nfev=c["nfev"] + nfev_n + (1 if save_steps > 0 else 0),
                njev=njev,
                nfactor=nfactor,
                nniters=c["nniters"] + n_iters,
                saved=sv,
            )
            return out

        # ---------------------------------------------------------------
        # Rejection bookkeeping (error-test fail, Newton fail)
        # ---------------------------------------------------------------
        def on_reject(c):
            # newton failure with fresh J available: retry same h after
            # refactoring with the new J.
            factor = jnp.where(
                refresh_J,
                1.0,
                jnp.where(halve, 0.5, factor_rej),
            )
            D_resc = jnp.where(
                factor != 1.0, _rescale_D(D, q, factor), D
            )
            cef = c["consec_err_fails"] + jnp.where(err_reject, 1, 0)
            ccf = c["consec_conv_fails"] + jnp.where(newton_failed & ~refresh_J, 1, 0)
            too_many = (cef >= MAX_CONSECUTIVE_FAILS) | (ccf >= MAX_CONSECUTIVE_FAILS)
            out = dict(c)
            out.update(
                h=h_use * factor,
                D=D_resc,
                n_equal=jnp.asarray(0, jnp.int32),
                J=J_new,
                J_current=c["J_current"] | refresh_J,
                factors=factors,
                c_factored=c_factored,
                need_factor=jnp.asarray(True),
                status=jnp.where(
                    too_many, STATUS["REPEATED_FAILURES"], c["status"]
                ).astype(jnp.int32),
                consec_err_fails=cef,
                consec_conv_fails=ccf,
                nfev=c["nfev"] + nfev_n,
                njev=njev,
                nfactor=nfactor,
                nniters=c["nniters"] + n_iters,
                n_err_fails=c["n_err_fails"] + jnp.where(err_reject, 1, 0),
                n_conv_fails=c["n_conv_fails"] + jnp.where(newton_failed & ~refresh_J, 1, 0),
            )
            return out

        new_c = lax.cond(accept, on_accept, on_reject, c)

        # global failure checks
        status = new_c["status"]
        status = jnp.where(
            (status == -1) & (new_c["nsteps"] >= options.max_steps),
            STATUS["MAX_STEPS"],
            status,
        )
        status = jnp.where(
            (status == -1) & underflow, STATUS["STEP_UNDERFLOW"], status
        )
        new_c["status"] = status.astype(jnp.int32)
        return new_c

    final = lax.while_loop(cond, body, carry0)

    status = jnp.where(final["status"] == -1, STATUS["SUCCESS"], final["status"]).astype(
        jnp.int32
    )
    # NaN-poison unfilled outputs on failure (reference as_pytensor.py:244-247)
    ys = final["ys"]

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
    )
    return BDFResult(ys=ys, status=status, stats=stats, saved=final["saved"])
