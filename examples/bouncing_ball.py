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
