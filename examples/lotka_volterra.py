"""Lotka-Volterra end to end: forward solve, sensitivities, adjoint gradient.

The analog of the reference's README example + notebooks/from_sympy.ipynb.
Runs on CPU by default (fast startup); remove the platform override to run on
an accelerator.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("EXAMPLE_FORCE_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from sunode_tpu.symode import SympyProblem
from sunode_tpu.solver import Solver, AdjointSolver
from sunode_tpu.wrappers.as_jax import solve_ivp


def lotka_volterra(t, y, p):
    return {
        "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
        "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
    }


problem = SympyProblem(
    params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
    states={"hares": (), "lynx": ()},
    rhs_sympy=lotka_volterra,
    derivative_params=[("alpha",), ("beta",)],
)

tvals = np.linspace(0, 10, 21)

# --- class API (reference-style) -------------------------------------------
# native_single=False keeps this solve on the JAX core so the native
# C++ comparison below stays an INDEPENDENT cross-check (by default a
# single unbatched solve routes through the native integrator itself)
solver = Solver(problem, solver="BDF", abstol=1e-10, reltol=1e-10,
                native_single=False)
y0 = np.zeros((), dtype=problem.state_dtype)
y0["hares"] = 10.0
y0["lynx"] = 2.0
solver.set_params_dict({"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4})
output = solver.make_output_buffers(tvals)
solver.solve(t0=0, tvals=tvals, y0=y0, y_out=output)
print("forward solve:", solver.current_stats["n_steps"], "steps")
ds = solver.as_xarray(tvals, output)
print("xarray-style output:", ds)

# --- forward sensitivities --------------------------------------------------
sens_solver = Solver(problem, sens_mode="simultaneous", abstol=1e-10, reltol=1e-10)
sens_solver.set_params_dict({"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4})
y_out, sens_out = sens_solver.make_output_buffers(tvals)
sens_solver.solve(0.0, tvals, y0, y_out, sens_out=sens_out)
print("d hares(10) / d alpha =", sens_out[-1, 0, 0])

# --- adjoint gradient through jax.grad --------------------------------------
def loss(alpha):
    res = solve_ivp(
        t0=0.0,
        y0={"hares": (10.0, ()), "lynx": (2.0, ())},
        params={
            "alpha": (alpha, ()),
            "beta": (0.3, ()),
            "gamma": np.array(1.0),
            "delta": np.array(0.4),
        },
        tvals=tvals[1:],
        rhs=lotka_volterra,
        derivatives="adjoint",
        derivative_params=[("alpha",), ("beta",)],
    )
    return jnp.sum(res.solution["hares"] ** 2)


g = jax.grad(loss)(jnp.asarray(1.0))
print("adjoint dL/dalpha =", float(g))

# --- native host path -------------------------------------------------------
try:
    from sunode_tpu.native.cpu_solver import CpuSolver

    cpu = CpuSolver(problem, abstol=1e-10, reltol=1e-10)
    cpu.set_params_dict({"alpha": 1.0, "beta": 0.3, "gamma": 1.0, "delta": 0.4})
    out_native = cpu.solve(0.0, tvals, np.array([10.0, 2.0]))
    print("native C++ solve max |diff| vs JAX:", np.nanmax(np.abs(out_native - output)))
except Exception as e:  # pragma: no cover
    print("native path unavailable:", e)
