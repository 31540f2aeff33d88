"""Events / rootfinding: a bouncing ball as a hybrid system.

Demonstrates the CVodeRootInit analog (`Solver(roots=...)`; the reference
declares the API in include/cvodes/16_cvodes.h:195 but never exposes it):
the solver stops EXACTLY at each impact (terminal root of the height), the
impact state comes back in ``last_stats['roots_y']``, and the next segment
restarts from the reflected velocity — the re-solve pattern for hybrid
systems documented in docs/limitations.md.

Free flight: h' = v, v' = -g.  Impact when h crosses 0 falling; restitution
v <- -e v.  Closed forms for every impact time/velocity make this
self-checking.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("EXAMPLE_FORCE_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from sunode_tpu.solver import Solver
from sunode_tpu.symode import SympyProblem


def ball(t, y, p):
    return {"h": y.v, "v": -p.g}


def hits_ground(t, y, p):
    return [y.h]


problem = SympyProblem(
    params={"g": ()},
    states={"h": (), "v": ()},
    rhs_sympy=ball,
    derivative_params=[("g",)],
)
solver = Solver(problem, roots=hits_ground, reltol=1e-10, abstol=1e-10)
solver.set_params_dict({"g": 9.81})

G, E = 9.81, 0.8  # gravity, coefficient of restitution
h0, v0 = 10.0, 0.0
t0 = 0.0
tvals_all, hvals_all = [], []
impacts = []

for bounce in range(4):
    # generous horizon per segment; the event cuts it short
    tvals = np.linspace(t0, t0 + 5.0, 201)
    ys = solver.solve(t0, tvals, {"h": h0, "v": v0})
    st = solver.last_stats
    t_imp = float(st["roots_t"][0])
    h_imp, v_imp = (float(x) for x in st["roots_y"][0])
    assert int(st["roots_found"][0, 0]) == -1, "impact must be a falling crossing"
    keep = tvals <= t_imp
    tvals_all.append(tvals[keep])
    hvals_all.append(np.asarray(ys[keep, 0]))
    impacts.append((t_imp, v_imp))
    # restart the next free-flight segment from the reflected impact state
    t0, h0, v0 = t_imp, 0.0, -E * v_imp

# closed forms: first impact at sqrt(2 h0 / g) with v = -sqrt(2 g h0);
# each later flight lasts 2 e^k v1 / g
v1 = np.sqrt(2 * G * 10.0)
t_expect = [np.sqrt(2 * 10.0 / G)]
for k in range(1, 4):
    t_expect.append(t_expect[-1] + 2 * E**k * v1 / G)
v_expect = [-(E**k) * v1 for k in range(4)]

t_meas = np.array([t for t, _ in impacts])
v_meas = np.array([v for _, v in impacts])
err_t = np.max(np.abs(t_meas - np.array(t_expect)))
err_v = np.max(np.abs(v_meas - np.array(v_expect)))
print("impact times   :", np.round(t_meas, 6), f"(max err {err_t:.2e})")
print("impact velocities:", np.round(v_meas, 4), f"(max err {err_v:.2e})")
assert err_t < 1e-8 and err_v < 1e-7
h_all = np.concatenate(hvals_all)
assert np.nanmin(h_all) > -1e-8, "ball never penetrates the ground"
print(f"4 bounces over {len(h_all)} emitted points; events OK")


# ---------------------------------------------------------------------------
# Part 2: the same hybrid system as ONE differentiable function
# (make_hybrid_solve_fn — the Python loop above, compiled and with exact
# gradients through every impact; see docs/quickstart.md §7)
# ---------------------------------------------------------------------------
import jax
import jax.numpy as jnp

from sunode_tpu import make_hybrid_solve_fn
from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.problem import JaxProblem

problem2 = JaxProblem(
    params={"g": (), "e": ()},  # e only enters through the jump map
    states={"h": (), "v": ()},
    rhs=lambda t, y, p: {"h": y.v, "v": -p.g},
    derivative_params=[("g",), ("e",)],
)
hybrid = make_hybrid_solve_fn(
    problem2,
    roots=lambda t, y, p: [y.h],
    jump_fn=lambda t, y, p: {"h": y.h, "v": -p.e * y.v},
    max_events=3,
    options=BDFOptions(rtol=1e-10, atol=1e-12),
    root_directions=[-1],
)
tv = jnp.linspace(0.0, float(t_expect[2]) + 0.3, 40)
res = hybrid(0.0, jnp.array([10.0, 0.0]), jnp.array([G, E]), jnp.zeros(0), tv)
err_h = np.max(np.abs(np.asarray(res.event_ts) - np.array(t_expect[:3])))
print(f"hybrid fn: {int(res.n_events)} impacts, times max err {err_h:.2e}")
assert err_h < 1e-7

# exact gradient of the third impact time w.r.t. (g, e), through two jumps:
d_t3 = jax.grad(
    lambda p: hybrid(0.0, jnp.array([10.0, 0.0]), p, jnp.zeros(0), tv).event_ts[2]
)(jnp.array([G, E]))
s = 1.0 + 2 * E + 2 * E * E
expect = np.array([
    -0.5 * np.sqrt(2 * 10.0 / G) / G * s,
    np.sqrt(2 * 10.0 / G) * (2.0 + 4.0 * E),
])
print("d t3/d(g,e) =", np.round(np.asarray(d_t3), 6), "expected", np.round(expect, 6))
assert np.allclose(np.asarray(d_t3), expect, rtol=1e-6)
print("hybrid gradients OK")
