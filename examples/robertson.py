"""Robertson stiff kinetics (BASELINE.json config 3): adaptive BDF with
Jacobian reuse over rate constants spanning 9 orders of magnitude."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("EXAMPLE_FORCE_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from sunode_tpu.symode import SympyProblem
from sunode_tpu.solver import Solver


def robertson(t, y, p):
    r1 = p.k1 * y.a
    r2 = p.k2 * y.b * y.b
    r3 = p.k3 * y.b * y.c
    return {"a": -r1 + r3, "b": r1 - r2 - r3, "c": r2}


problem = SympyProblem(
    params={"k1": (), "k2": (), "k3": ()},
    states={"a": (), "b": (), "c": ()},
    rhs_sympy=robertson,
    derivative_params=[("k1",)],
)

solver = Solver(
    problem,
    abstol=np.array([1e-10, 1e-12, 1e-10]),  # vector atol, reference-style
    reltol=1e-8,
)
solver.set_params_dict({"k1": 0.04, "k2": 3e7, "k3": 1e4})
tvals = np.array([4.0 * 10.0**k for k in range(-1, 7)])  # 0.4 ... 4e6

t0 = time.perf_counter()
out = solver.solve(0.0, tvals, np.array([1.0, 0.0, 0.0]))
dt = time.perf_counter() - t0
print(f"Robertson solve over t=[0, 4e6]: {dt*1000:.1f} ms (first call incl. jit)")
t0 = time.perf_counter()
out = solver.solve(0.0, tvals, np.array([1.0, 0.0, 0.0]))
print(f"cached: {(time.perf_counter()-t0)*1000:.2f} ms; stats: {solver.current_stats['n_steps']} steps, "
      f"{solver.current_stats['n_jac_evals']} jac evals, "
      f"{solver.current_stats['n_factorizations']} factorizations")
print("mass conservation max |1 - sum(y)| =", np.abs(out.sum(1) - 1).max())
for t, row in zip(tvals, out):
    print(f"  t={t:10.1f}  a={row[0]:.6e}  b={row[1]:.6e}  c={row[2]:.6e}")
