"""Generate independent golden fixtures for the BASELINE configs.

Trajectories from scipy at rtol=1e-12 (LSODA/BDF — an independent stack from
both the JAX and the C++ cores) and gradients by central finite differences
of that tight solve.  Committed as tests/golden/*.npz so CI asserts
tolerance-matching without scipy at test time (VERDICT round 1, item 8).

Run once: python scripts/make_golden.py
"""
import os
import sys

import numpy as np
from scipy.integrate import solve_ivp as scipy_solve

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(os.path.dirname(HERE), "tests", "golden")
os.makedirs(OUT, exist_ok=True)

N_LANES = 16


def lv_rhs(t, y, p):
    a, b, g, d = p
    return [a * y[0] - b * y[1] * y[0], d * y[0] * y[1] - g * y[1]]


def lv_traj(y0, p, tvals):
    sol = scipy_solve(
        lv_rhs, (0.0, float(tvals[-1])), y0, t_eval=tvals,
        rtol=1e-12, atol=1e-12, method="LSODA", args=(p,),
    )
    assert sol.success
    return sol.y.T  # (n_t, 2)


def bench_lanes(batch_rng_seed=42, scale=0.05):
    rng = np.random.default_rng(batch_rng_seed)
    # same construction as bench.py bench_lv_adjoint (first N_LANES of 10k)
    B = 10000
    y0s = np.array([10.0, 2.0]) * (1 + scale * rng.standard_normal((B, 2)))
    p_subs = np.array([1.0, 0.3]) * (1 + scale * rng.standard_normal((B, 2)))
    return y0s[:N_LANES], p_subs[:N_LANES]


# ---- config 1: LV forward (bench_lv_forward: 50 tvals, rtol 1e-10) --------
def make_lv_forward():
    rng = np.random.default_rng(42)
    B = N_LANES
    tvals = np.linspace(0.0, 10.0, 50)
    y0s = np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2)))
    ps = np.array([1.0, 0.3, 1.0, 0.4]) * (1 + 0.05 * rng.standard_normal((B, 4)))
    ys = np.stack([lv_traj(y0s[i], ps[i], tvals) for i in range(B)])
    np.savez(
        os.path.join(OUT, "lv_forward.npz"), tvals=tvals, y0s=y0s, ps=ps, ys=ys
    )
    print("lv_forward.npz", ys.shape)


# ---- config 4/north-star: LV adjoint gradients of L = sum ys^2 ------------
def make_lv_adjoint():
    tvals = np.linspace(1.0, 10.0, 21)
    y0s, p_subs = bench_lanes()
    p_fix = np.array([1.0, 0.4])  # gamma, delta

    def loss(y0, psub):
        p = np.array([psub[0], psub[1], p_fix[0], p_fix[1]])
        return float(np.sum(lv_traj(y0, p, tvals) ** 2))

    gy = np.zeros((N_LANES, 2))
    gp = np.zeros((N_LANES, 2))
    ys = np.zeros((N_LANES, len(tvals), 2))
    for i in range(N_LANES):
        p = np.array([p_subs[i, 0], p_subs[i, 1], p_fix[0], p_fix[1]])
        ys[i] = lv_traj(y0s[i], p, tvals)
        for j in range(2):
            e = 1e-6 * max(1.0, abs(y0s[i, j]))
            yp, ym = y0s[i].copy(), y0s[i].copy()
            yp[j] += e
            ym[j] -= e
            gy[i, j] = (loss(yp, p_subs[i]) - loss(ym, p_subs[i])) / (2 * e)
            e = 1e-6 * max(1.0, abs(p_subs[i, j]))
            pp, pm = p_subs[i].copy(), p_subs[i].copy()
            pp[j] += e
            pm[j] -= e
            gp[i, j] = (loss(y0s[i], pp) - loss(y0s[i], pm)) / (2 * e)
    np.savez(
        os.path.join(OUT, "lv_adjoint.npz"),
        tvals=tvals, y0s=y0s, p_subs=p_subs, p_fix=p_fix, ys=ys, gy=gy, gp=gp,
    )
    print("lv_adjoint.npz", gy.shape)


# ---- config 2: LV forward sensitivities (d ys / d alpha, beta) ------------
def make_lv_sens():
    rng = np.random.default_rng(42)
    B = N_LANES
    tvals = np.linspace(0.0, 10.0, 21)
    y0s = np.array([10.0, 2.0]) * (1 + 0.05 * rng.standard_normal((B, 2)))
    ps = np.array([1.0, 0.3, 1.0, 0.4]) * (1 + 0.05 * rng.standard_normal((B, 4)))
    sens = np.zeros((B, len(tvals), 2, 2))  # (B, n_t, k=2 params, n=2 states)
    ys = np.zeros((B, len(tvals), 2))
    for i in range(B):
        ys[i] = lv_traj(y0s[i], ps[i], tvals)
        for k in range(2):
            e = 1e-6 * max(1.0, abs(ps[i, k]))
            pp, pm = ps[i].copy(), ps[i].copy()
            pp[k] += e
            pm[k] -= e
            sens[i, :, k, :] = (
                lv_traj(y0s[i], pp, tvals) - lv_traj(y0s[i], pm, tvals)
            ) / (2 * e)
    np.savez(
        os.path.join(OUT, "lv_sens.npz"), tvals=tvals, y0s=y0s, ps=ps, ys=ys,
        sens=sens,
    )
    print("lv_sens.npz", sens.shape)


# ---- config 3: Robertson stiff ---------------------------------------------
def make_robertson():
    def rob(t, y, p):
        k1, k2, k3 = p
        r1 = k1 * y[0]
        r2 = k2 * y[1] * y[1]
        r3 = k3 * y[1] * y[2]
        return [-r1 + r3, r1 - r2 - r3, r2]

    def jac(t, y, p):
        k1, k2, k3 = p
        return np.array(
            [
                [-k1, k3 * y[2], k3 * y[1]],
                [k1, -2 * k2 * y[1] - k3 * y[2], -k3 * y[1]],
                [0.0, 2 * k2 * y[1], 0.0],
            ]
        )

    tvals = np.asarray([4.0 * 10.0**k for k in range(-1, 7)])
    rng = np.random.default_rng(42)
    B = N_LANES
    ps = np.array([0.04, 3e7, 1e4]) * (1 + 0.02 * rng.standard_normal((B, 3)))
    y0 = np.array([1.0, 0.0, 0.0])
    ys = np.zeros((B, len(tvals), 3))
    for i in range(B):
        sol = scipy_solve(
            rob, (0.0, float(tvals[-1])), y0, t_eval=tvals,
            rtol=1e-12, atol=[1e-14, 1e-18, 1e-14], method="BDF",
            jac=lambda t, y, p=ps[i]: jac(t, y, p), args=(ps[i],),
        )
        assert sol.success
        ys[i] = sol.y.T
    np.savez(os.path.join(OUT, "robertson.npz"), tvals=tvals, ps=ps, y0=y0, ys=ys)
    print("robertson.npz", ys.shape)


# ---- config 5 (reduced): SIR multi-region vector states --------------------
# Exactly the repo's ring-mixing SIR family (examples/sir_regions.py,
# tests/test_sir.py): I_eff = I + mix*(roll(I,1)+roll(I,-1)).
def make_sir():
    R = 16  # regions (full config is 1k; golden anchors correctness not scale)
    rng = np.random.default_rng(0)
    S0 = 0.99 + 0.005 * rng.standard_normal(R)
    I0 = 0.01 * np.abs(1 + 0.1 * rng.standard_normal(R))
    beta, gamma, mix = 0.4, 0.15, 0.05
    tvals = np.linspace(5.0, 60.0, 12)

    def rhs(t, y, p):
        b, g, m = p
        S, I = y[:R], y[R : 2 * R]
        I_eff = I + m * (np.roll(I, 1) + np.roll(I, -1))
        inf = b * S * I_eff
        rec = g * I
        return np.concatenate([-inf, inf - rec, rec])

    y0 = np.concatenate([S0, I0, np.zeros(R)])

    def traj(p):
        sol = scipy_solve(
            rhs, (0.0, float(tvals[-1])), y0, t_eval=tvals,
            rtol=1e-12, atol=1e-12, method="LSODA", args=(p,),
        )
        assert sol.success
        return sol.y.T  # (n_t, 3R)

    p0 = np.array([beta, gamma, mix])
    ys = traj(p0)

    def loss(p):
        return float(np.sum(traj(p)[:, R : 2 * R] ** 2))

    gp = np.zeros(2)  # d/dbeta, d/dgamma
    for k in range(2):
        e = 1e-7
        pp, pm = p0.copy(), p0.copy()
        pp[k] += e
        pm[k] -= e
        gp[k] = (loss(pp) - loss(pm)) / (2 * e)
    np.savez(
        os.path.join(OUT, "sir_regions.npz"),
        tvals=tvals, p0=p0, y0=y0, ys=ys, gp=gp, R=R,
    )
    print("sir_regions.npz", ys.shape)


# ---- config 5 (FULL scale): SIR R=1000, the bench_sir_scale lane-0 gate ----
# Same family at the benchmarked size (n = 3000 states).  DOP853 at
# rtol=1e-12: a high-order non-stiff method with no Jacobian — exact for
# this family and an independent stack from both repo cores.  The bench
# pins its lane 0 to this fixture and gates ys and dL/d(beta,gamma).
def make_sir_1000():
    R = 1000
    rng = np.random.default_rng(12345)
    S0 = 0.99 + 0.005 * rng.standard_normal(R)
    I0 = 0.01 * np.abs(1 + 0.1 * rng.standard_normal(R))
    y0 = np.concatenate([S0, I0, np.zeros(R)])
    tvals = np.linspace(5.0, 60.0, 12)
    p0 = np.array([0.4, 0.15, 0.05])  # beta, gamma, mix

    def rhs(t, y, p):
        b, g, m = p
        S, I = y[:R], y[R : 2 * R]
        I_eff = I + m * (np.roll(I, 1) + np.roll(I, -1))
        inf = b * S * I_eff
        rec = g * I
        return np.concatenate([-inf, inf - rec, rec])

    def traj(p):
        sol = scipy_solve(
            rhs, (0.0, float(tvals[-1])), y0, t_eval=tvals,
            rtol=1e-12, atol=1e-13, method="DOP853", args=(p,),
        )
        assert sol.success
        return sol.y.T  # (n_t, 3R)

    ys = traj(p0)

    def loss(p):
        return float(np.sum(traj(p)[:, R : 2 * R] ** 2))

    gp = np.zeros(2)
    for k in range(2):
        e = 1e-6
        pp, pm = p0.copy(), p0.copy()
        pp[k] += e
        pm[k] -= e
        gp[k] = (loss(pp) - loss(pm)) / (2 * e)
    np.savez(
        os.path.join(OUT, "sir_1000.npz"),
        tvals=tvals, p0=p0, y0=y0, ys=ys, gp=gp, R=R,
    )
    print("sir_1000.npz", ys.shape, "gp:", gp)


if __name__ == "__main__":
    make_lv_forward()
    make_lv_adjoint()
    make_lv_sens()
    make_robertson()
    make_sir()
    make_sir_1000()
