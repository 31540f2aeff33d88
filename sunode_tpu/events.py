"""Differentiable event times — hybrid-system gradients (beyond-reference).

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
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from sunode_tpu.ops.bdf import BDFOptions, bdf_solve
from sunode_tpu.wrappers.as_jax import make_solve_fn

__all__ = ["make_event_fn"]


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
) -> Callable:
    """Build ``event(t0, y0_flat, params_subset, params_fixed, t_max)
    -> (t_event, y_event)`` with IFT gradients (module docstring).

    ``roots`` follows ``Solver(roots=...)``: a symbolic callable for a
    ``SympyProblem`` (lowered once) or a raw JAX ``(t, y, p) -> (nrt,)``.
    ``which`` selects the recorded root (index into ``stats['roots_t']``);
    ``which > 0`` requires ``root_terminal=False`` so later roots are
    recorded at all.  ``derivatives`` picks the machinery differentiating
    y(t*; θ): ``'forward'`` (sensitivities — exact for a handful of
    parameters) or ``'adjoint'``.

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
    root_fn = (
        problem.make_root_fn(roots)
        if hasattr(problem, "make_root_fn")
        else roots
    )
    rhs = problem.make_rhs()
    jac = problem.make_jac_dense()
    spec = problem.params
    inner = make_solve_fn(
        problem,
        derivatives=derivatives,
        options=options,
        adjoint_options=adjoint_options,
        checkpoint_n=checkpoint_n,
    )

    def g_scalar(t, y, p, comp):
        # `comp` is the event-function COMPONENT that fired at record
        # `which` (from stats['roots_found']) — distinct from the record
        # index; dynamic gather so multi-component events need no
        # per-component builds
        return jnp.asarray(root_fn(t, y, p)).reshape(-1)[comp]

    g_t_fn = jax.grad(g_scalar, argnums=0)
    g_y_fn = jax.grad(g_scalar, argnums=1)

    def event(t0, y0, p_sub, p_fix, t_max):
        p = spec.combine(p_sub, p_fix, xp=jnp)
        tv = jnp.reshape(jnp.asarray(t_max), (1,))
        res = bdf_solve(
            rhs, jac, t0, y0, p, tv, options,
            root_fn=root_fn,
            root_cap=root_cap,
            root_terminal=root_terminal,
            root_directions=root_directions,
        )
        # primal root: a constant under AD — all θ-dependence flows
        # through the correction term below
        t_star = lax.stop_gradient(res.stats["roots_t"][which])
        y_star = lax.stop_gradient(res.stats["roots_y"][which])
        # which event-function component fired at this record (nonzero
        # entry of the CVodeGetRootInfo-style row)
        comp = jnp.argmax(jnp.abs(res.stats["roots_found"][which]))
        p_sg = lax.stop_gradient(p)
        f_star = rhs(t_star, y_star, p_sg)
        den = g_t_fn(t_star, y_star, p_sg, comp) + jnp.dot(
            g_y_fn(t_star, y_star, p_sg, comp), f_star
        )
        # differentiable y(t*; θ) at FIXED time (t_star carries no
        # gradient): d/dθ of the numerator is g_y·S(t*) + g_p
        y_diff = inner(t0, y0, p_sub, p_fix, t_star[None])[0]
        num = g_scalar(t_star, y_diff, p, comp)
        t_event = t_star - num / den
        # total derivative of the event state: S(t*) + f · dt*/dθ
        y_event = y_diff + f_star * (t_event - t_star)
        return t_event, y_event

    return event
