"""Exercise the xarray-PRESENT branch of solution_to_xarray (problem.py:322)
with a strict stand-in that enforces real xarray's Dataset construction
rules (dims/shape agreement, coord-length agreement).  xarray itself is not
installed in this environment; only the fallback-Dataset branch runs in the
rest of the suite (VERDICT round 1, weak item 3)."""

import sys
import types

import numpy as np
import pytest

from sunode_tpu.symode import SympyProblem


class _StrictDataset:
    """Minimal xarray.Dataset mimic enforcing the real constructor's
    validation: every data var is (dims, data) with len(dims) == data.ndim,
    and any dim that has a coordinate must match the coord's length."""

    def __init__(self, data_vars, coords=None):
        self.coords = {k: np.asarray(v) for k, v in (coords or {}).items()}
        self.data_vars = {}
        for name, spec in data_vars.items():
            dims, data = spec
            data = np.asarray(data)
            if len(dims) != data.ndim:
                raise ValueError(
                    f"{name}: {len(dims)} dims for {data.ndim}-d data"
                )
            for ax, d in enumerate(dims):
                if d in self.coords and len(self.coords[d]) != data.shape[ax]:
                    raise ValueError(
                        f"{name}: dim {d!r} length {data.shape[ax]} != "
                        f"coord length {len(self.coords[d])}"
                    )
            self.data_vars[name] = (tuple(dims), data)


@pytest.fixture()
def fake_xarray(monkeypatch):
    mod = types.ModuleType("xarray")
    mod.Dataset = _StrictDataset
    monkeypatch.setitem(sys.modules, "xarray", mod)
    return mod


def test_xarray_present_branch_builds_valid_dataset(fake_xarray):
    prob = SympyProblem(
        params={"alpha": (), "beta": (), "ks": (3,)},
        states={"hares": (), "lynx": (), "pops": (4,)},
        rhs_sympy=lambda t, y, p: {
            "hares": p.alpha * y.hares,
            "lynx": -p.beta * y.lynx,
            "pops": -y.pops * p.alpha,
        },
        derivative_params=[("alpha",)],
    )
    n_t = 5
    tvals = np.linspace(0.1, 1.0, n_t)
    sol = np.random.default_rng(0).standard_normal((n_t, prob.n_states))
    params = np.arange(2 + 3, dtype=float)

    ds = prob.solution_to_xarray(tvals, sol, params=params, unstack_params=True)
    assert isinstance(ds, _StrictDataset)  # the xarray branch really ran
    assert "solution_hares" in ds.data_vars
    assert ds.data_vars["solution_pops"][1].shape == (n_t, 4)
    assert "parameter_ks" in ds.data_vars

    sens = np.zeros((n_t, prob.n_params, prob.n_states))
    ds2 = prob.solution_to_xarray(tvals, sol, sensitivity=sens)
    assert ds2.data_vars["sensitivity"][1].shape == sens.shape

    # flat (packed) variant
    ds3 = prob.solution_to_xarray(tvals, sol, unstack_state=False)
    assert ds3.data_vars["solution"][1].shape == sol.shape
