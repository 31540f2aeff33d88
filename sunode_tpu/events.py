"""Differentiable event times & hybrid restarts — beyond-reference.

CVODES locates roots of event functions (CVodeRootInit / CVodeGetRootInfo,
/root/reference/include/cvodes/16_cvodes.h:195-214) but the located time is
a plain output; it is not differentiable and the reference never exposes
rootfinding at all.  Here the event time is a first-class differentiable
value via the implicit function theorem: g(t*, y(t*; θ), p(θ)) = 0 gives

    dt*/dθ = − (g_t + g_y · f)⁻¹ · (g_y · S(t*) + g_p),

with S(t*) = ∂y(t*; θ)/∂θ at FIXED time.  Implementation: one smooth
Newton correction around the stop-gradient primal root,

    t_event = t* − g(t*, y(t*; θ), p(θ)) / (g_t + g_y · f)|_*,

where the numerator re-evaluates y(t*) through the differentiable solve
(``wrappers.as_jax.make_solve_fn``) and the denominator is a constant
(stop-gradient) at the localized root.  At the primal point the numerator
is ~0 (solver tolerance), so the VALUE is the localized root; under AD the
correction term carries exactly the IFT gradient.  Composes with
``jit``/``vmap``/``grad``/higher-order AD like any JAX function.

The event state is exposed the same way:

    y_event = y(t*; θ) + f(t*) · (t_event − t*)

whose value is y at the root and whose gradient is the TOTAL derivative
dy*/dθ = S(t*) + f · dt*/dθ.

Conditioning: the denominator g_t + g_y·f is the speed at which g crosses
zero.  Grazing events (tangential crossings) have it → 0 and genuinely
ill-conditioned event times — gradients blow up there because the
mathematical derivative does.

``make_hybrid_solve_fn`` chains the event machinery into the full hybrid
ODE pattern: integrate → terminal event → apply a jump map
y⁺ = jump(t*, y⁻, p) → re-enter the integrator, up to ``max_events``
times, with gradients flowing through every impact (each event time via
the IFT correction above, each restart state through the differentiable
jump and re-solve).  This is the capability CVODES users hand-roll with a
Python loop of CVodeReInit calls after each CV_ROOT_RETURN
(16_cvodes.h:195-214 + CVodeReInit l.168-171) — here it is a single
jittable, vmappable, differentiable JAX function.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from sunode_tpu.ops.adams import adams_solve
from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.wrappers.as_jax import make_solve_fn

__all__ = ["make_event_fn", "make_hybrid_solve_fn", "HybridResult"]


def _build_event_core(
    problem,
    roots: Callable,
    *,
    which: int,
    options: BDFOptions,
    derivatives: str,
    adjoint_options: Optional[BDFOptions],
    checkpoint_n: int,
    root_directions: Optional[Any],
    root_terminal: bool,
    root_cap: int,
    solver: str,
    linear_solver: str = "dense",
    linear_solver_kwargs: Optional[dict] = None,
):
    """Shared IFT-event machinery (module docstring), NaN-safe form.

    Returns ``core(t0, y0, p_sub, p_fix, t_max) ->
    (found, t_event, y_event)`` where ``t_event``/``y_event`` are ALWAYS
    finite — when ``found`` is False they hold harmless placeholder values
    so callers can mask with ``jnp.where`` without NaNs leaking into
    reverse-mode gradients of the taken branch (0·NaN = NaN under AD).
    """
    if solver not in ("BDF", "ADAMS"):
        raise ValueError(f"solver must be 'BDF' or 'ADAMS', got {solver!r}")
    root_fn = (
        problem.make_root_fn(roots)
        if hasattr(problem, "make_root_fn")
        else roots
    )
    rhs = problem.make_rhs()
    if solver == "BDF":
        # structured Newton for the primal localization solve: same
        # 'dense' | 'band' | 'sparse' contract as make_solve_fn, so large
        # stiff states don't pay O(n^3) per event evaluation
        from sunode_tpu.wrappers.as_jax import _structured_setup

        jac, options, _, _ = _structured_setup(
            problem, rhs, linear_solver, linear_solver_kwargs, options,
            BDFOptions(),
        )
    else:
        jac = None
    spec = problem.params
    inner = make_solve_fn(
        problem,
        derivatives=derivatives,
        options=options,
        adjoint_options=adjoint_options,
        checkpoint_n=checkpoint_n,
        linear_solver=linear_solver,
        linear_solver_kwargs=linear_solver_kwargs,
    )
    root_kw = dict(
        root_fn=root_fn,
        root_cap=root_cap,
        root_terminal=root_terminal,
        root_directions=root_directions,
    )

    def g_scalar(t, y, p, comp):
        # `comp` is the event-function COMPONENT that fired at record
        # `which` (from stats['roots_found']) — distinct from the record
        # index; dynamic gather so multi-component events need no
        # per-component builds
        return jnp.asarray(root_fn(t, y, p)).reshape(-1)[comp]

    g_t_fn = jax.grad(g_scalar, argnums=0)
    g_y_fn = jax.grad(g_scalar, argnums=1)

    def core(t0, y0, p_sub, p_fix, t_max):
        p = spec.combine(p_sub, p_fix, xp=jnp)
        t_max = jnp.asarray(t_max)
        tv = jnp.reshape(t_max, (1,))
        if solver == "ADAMS":
            res = adams_solve(rhs, t0, y0, p, tv, options, **root_kw)
        else:
            res = bdf_solve(rhs, jac, t0, y0, p, tv, options, **root_kw)
        # primal root: a constant under AD — all θ-dependence flows
        # through the correction term below
        t_star_raw = lax.stop_gradient(res.stats["roots_t"][which])
        y_star_raw = lax.stop_gradient(res.stats["roots_y"][which])
        found = jnp.isfinite(t_star_raw) & jnp.all(jnp.isfinite(y_star_raw))
        # substitute finite placeholders when no root was recorded so every
        # downstream value (and its AD graph) stays NaN-free
        t_star = jnp.where(found, t_star_raw, lax.stop_gradient(t_max))
        y_star = jnp.where(found, y_star_raw, lax.stop_gradient(y0))
        # which event-function component fired at this record (nonzero
        # entry of the CVodeGetRootInfo-style row; zeros row -> comp 0)
        comp = jnp.argmax(jnp.abs(res.stats["roots_found"][which]))
        p_sg = lax.stop_gradient(p)
        f_star = rhs(t_star, y_star, p_sg)
        den = g_t_fn(t_star, y_star, p_sg, comp) + jnp.dot(
            g_y_fn(t_star, y_star, p_sg, comp), f_star
        )
        # a zero denominator is only reachable on the not-found placeholder
        # point (a genuine grazing root would have localized poorly anyway)
        den = jnp.where(found, den, jnp.ones_like(den))
        # differentiable y(t*; θ) at FIXED time (t_star carries no
        # gradient): d/dθ of the numerator is g_y·S(t*) + g_p
        y_diff = inner(t0, y0, p_sub, p_fix, t_star[None])[0]
        num = g_scalar(t_star, y_diff, p, comp)
        t_event = t_star - num / den
        # total derivative of the event state: S(t*) + f · dt*/dθ
        y_event = y_diff + f_star * (t_event - t_star)
        return found, t_event, y_event

    return core


def make_event_fn(
    problem,
    roots: Callable,
    *,
    which: int = 0,
    options: BDFOptions = BDFOptions(),
    derivatives: str = "forward",
    adjoint_options: Optional[BDFOptions] = None,
    checkpoint_n: int = 4096,
    root_directions: Optional[Any] = None,
    root_terminal: bool = True,
    root_cap: int = 8,
    solver: str = "BDF",
    linear_solver: str = "dense",
    linear_solver_kwargs: Optional[dict] = None,
) -> Callable:
    """Build ``event(t0, y0_flat, params_subset, params_fixed, t_max)
    -> (t_event, y_event)`` with IFT gradients (module docstring).

    ``roots`` follows ``Solver(roots=...)``: a symbolic callable for a
    ``SympyProblem`` (lowered once) or a raw JAX ``(t, y, p) -> (nrt,)``.
    ``which`` selects the recorded root (index into ``stats['roots_t']``);
    ``which > 0`` requires ``root_terminal=False`` so later roots are
    recorded at all.  ``derivatives`` picks the machinery differentiating
    y(t*; θ): ``'forward'`` (sensitivities — exact for a handful of
    parameters) or ``'adjoint'``.  ``solver`` picks the primal localization
    core: ``'BDF'`` (Newton) or ``'ADAMS'`` (functional iteration — no
    O(n³) factorization, the right default for large non-stiff states).
    For large STIFF states, ``linear_solver='band'|'sparse'`` (the
    ``make_solve_fn`` kwargs contract) gives the BDF Newton solves — both
    the localization and the differentiable re-solve — the structured
    O(n·w²) path instead of dense O(n³).

    Returns inf/NaN when no matching root exists in ``[t0, t_max]``.
    Cost: two solves per call (primal root localization + differentiable
    re-solve at the root time).
    """
    if which > 0 and root_terminal:
        raise ValueError(
            "which > 0 requires root_terminal=False (a terminal solve "
            "stops at the first root; later roots are never recorded)"
        )
    if which >= root_cap:
        raise ValueError(f"which={which} >= root_cap={root_cap}")
    core = _build_event_core(
        problem,
        roots,
        which=which,
        options=options,
        derivatives=derivatives,
        adjoint_options=adjoint_options,
        checkpoint_n=checkpoint_n,
        root_directions=root_directions,
        root_terminal=root_terminal,
        root_cap=root_cap,
        solver=solver,
        linear_solver=linear_solver,
        linear_solver_kwargs=linear_solver_kwargs,
    )

    def event(t0, y0, p_sub, p_fix, t_max):
        found, t_event, y_event = core(t0, y0, p_sub, p_fix, t_max)
        return (
            jnp.where(found, t_event, jnp.inf),
            jnp.where(found, y_event, jnp.nan),
        )

    return event


class HybridResult(NamedTuple):
    """Result of a hybrid (event-restart) solve.

    ys:        (n_t, n) trajectory on ``tvals``; an observation exactly at
               an event time reports the PRE-jump state (CVODES returns the
               rootside state from CVode on CV_ROOT_RETURN).
    event_ts:  (max_events,) differentiable event times; +inf in unused
               slots.
    event_ys:  (max_events, n) pre-jump states y⁻(t*); NaN in unused slots.
    event_ys_post: (max_events, n) post-jump states y⁺ = jump(t*, y⁻, p).
    n_events:  int32 scalar — number of events actually taken.  When it
               equals ``max_events`` the trailing segment may have crossed
               further (untreated) roots: raise ``max_events``.
    """

    ys: jnp.ndarray
    event_ts: jnp.ndarray
    event_ys: jnp.ndarray
    event_ys_post: jnp.ndarray
    n_events: jnp.ndarray


def _wrap_jump(problem, jump_fn):
    """Present jump_fn with the same record views the RHS convention uses
    (t, y_record, p_record) and accept either a state dict or a flat
    vector back."""
    states, params = problem.states, problem.params

    def jf(t, y_flat, p_flat):
        out = jump_fn(t, states.record(y_flat), params.record(p_flat))
        if isinstance(out, Mapping):
            return states.flatten_dict(out, xp=jnp, follow_dtype=True)
        out = jnp.asarray(out)
        return out.astype(y_flat.dtype)

    return jf


def make_hybrid_solve_fn(
    problem,
    roots: Callable,
    jump_fn: Callable,
    *,
    max_events: int = 4,
    options: BDFOptions = BDFOptions(),
    derivatives: str = "forward",
    adjoint_options: Optional[BDFOptions] = None,
    checkpoint_n: int = 4096,
    root_directions: Optional[Any] = None,
    solver: str = "BDF",
    linear_solver: str = "dense",
    linear_solver_kwargs: Optional[dict] = None,
) -> Callable:
    """Build ``hybrid(t0, y0_flat, params_subset, params_fixed, tvals)
    -> HybridResult`` — an event-restart loop with differentiable jumps.

    On each terminal root t*, the state is reset to
    ``y⁺ = jump_fn(t*, y⁻, p)`` and integration re-enters from (t*, y⁺),
    up to ``max_events`` times; the final segment always runs to
    ``tvals[-1]``.  ``jump_fn(t, y, p)`` receives the same record views as
    a ``JaxProblem`` RHS and returns a state dict (or flat vector).

    Gradients: every event time carries the IFT gradient
    (``make_event_fn``), every restart composes it with the jump map's
    Jacobian and the next segment's solve — d(final state)/dθ is exact
    through all impacts (tested against closed forms + central FD).
    Composes with ``jit``/``vmap``/``grad``.

    Re-trigger robustness: the post-jump state sits ON the event surface
    (g ≈ 0 up to solver tolerance); pass ``root_directions`` so the
    departure direction does not re-fire the same event, exactly as a
    CVODES user would call CVodeSetRootDirection before CVodeReInit.
    Events localized at the restart time itself (t* ≤ segment start) are
    dropped — Zeno accumulation must be truncated by ``max_events``.

    Cost: ``max_events`` event localizations (two solves each) plus one
    emission solve per segment — (3·max_events + 1) solves, all fixed
    shape, so XLA compiles one fused program.
    """
    if max_events < 1:
        raise ValueError(f"max_events must be >= 1, got {max_events}")
    core = _build_event_core(
        problem,
        roots,
        which=0,
        options=options,
        derivatives=derivatives,
        adjoint_options=adjoint_options,
        checkpoint_n=checkpoint_n,
        root_directions=root_directions,
        root_terminal=True,
        root_cap=1,
        solver=solver,
        linear_solver=linear_solver,
        linear_solver_kwargs=linear_solver_kwargs,
    )
    inner = make_solve_fn(
        problem,
        derivatives=derivatives,
        options=options,
        adjoint_options=adjoint_options,
        checkpoint_n=checkpoint_n,
        linear_solver=linear_solver,
        linear_solver_kwargs=linear_solver_kwargs,
    )
    spec = problem.params
    jump = _wrap_jump(problem, jump_fn)

    def hybrid(t0, y0, p_sub, p_fix, tvals):
        tvals = jnp.asarray(tvals)
        y0 = jnp.asarray(y0)
        t_end = tvals[-1]
        p = spec.combine(p_sub, p_fix, xp=jnp)
        seg_t = jnp.asarray(t0, tvals.dtype)
        seg_y = y0
        live = jnp.asarray(True)  # is this segment the active continuation?
        assigned = jnp.zeros(tvals.shape, bool)
        ys = jnp.zeros(tvals.shape + y0.shape, y0.dtype)
        ev_t, ev_ym, ev_yp, fired = [], [], [], []
        for k in range(max_events + 1):
            if k < max_events:
                found, t_e, y_e = core(seg_t, seg_y, p_sub, p_fix, t_end)
                # drop roots at/inside the restart point (post-jump g≈0
                # residual) and past the horizon
                found = found & live & (t_e > seg_t) & (t_e < t_end)
            else:
                found = jnp.asarray(False)
                t_e, y_e = t_end, seg_y
            seg_end = jnp.where(found, t_e, t_end)
            # emit this segment's slice of the observation grid: clamping
            # keeps the solve inside [seg_t, seg_end] (the dynamics may be
            # invalid past the event); clamped entries are masked out below
            tv = jnp.clip(tvals, seg_t, seg_end)
            ys_seg = inner(seg_t, seg_y, p_sub, p_fix, tv)
            take = live & ~assigned & (tvals <= seg_end)
            ys = jnp.where(take[:, None], ys_seg, ys)
            assigned = assigned | take
            if k < max_events:
                y_plus = jump(t_e, y_e, p)
                seg_t = jnp.where(found, t_e, seg_t)
                seg_y = jnp.where(found, y_plus, seg_y)
                ev_t.append(jnp.where(found, t_e, jnp.inf))
                ev_ym.append(jnp.where(found, y_e, jnp.nan))
                ev_yp.append(jnp.where(found, y_plus, jnp.nan))
                fired.append(found)
                live = found
        return HybridResult(
            ys=ys,
            event_ts=jnp.stack(ev_t),
            event_ys=jnp.stack(ev_ym),
            event_ys_post=jnp.stack(ev_yp),
            n_events=jnp.sum(jnp.stack(fired).astype(jnp.int32)),
        )

    return hybrid
