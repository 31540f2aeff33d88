"""Bordered block-diagonal (Schur-complement) Newton solves.

The KLU analog for the ONE pattern class the RCM-banded plan handles badly:
patterns with a few dense rows/columns (arrowheads, hubs, global couplings),
where any bandwidth-minimizing ordering degrades to w = O(n) and the banded
LU costs O(n^3).  The reference covers these with SuiteSparse KLU's dynamic
fill-in (/root/reference/sunode/linear_solver_wrapper.py:99-122); dynamic
fill-in cannot be expressed under jit, but these patterns have tiny static
separators, which XLA *can* exploit:

  pull the k high-degree vertices into a BORDER (ordered last), leaving an
  interior that RCM makes genuinely banded:

      M_p = [[Bb, F ],        Bb (n_i, n_i) banded (l, u),  n_i = n - k
             [E,  C ]]        E (k, n_i), F (n_i, k), C (k, k) dense

  factor:  Bb = LU (banded, partial pivoting);  X = Bb^{-1} F  (k extra
  banded solves);  S = C - E X  (k x k Schur complement) = LU (dense).
  solve:   u = Bb^{-1} r_i;  z_b = S^{-1}(r_b - E u);  z_i = u - X z_b.

  Cost O(n_i w^2 + k n_i w + k^2 n_i + k^3) with fully static shapes —
  lockstep-batchable exactly like the plain banded LU (vmap over trailing
  lanes).  Border selection and the packed-storage gather maps live in
  ops/sparsity.py (SparsePlan with border='auto').

Packed storage (all in PLAN-permuted coordinates, border last), shape
(w + 1 + 2k, n) with w = l + u:

  rows 0..w          banded interior: ab[r, j] = Bb[r - u + j, j], j < n_i
  rows w+1..w+k      border rows [E | C], full width n
  rows w+k+1..w+2k   border columns F^T, columns 0..n_i-1 used

k = 0 degenerates to plain banded storage (the existing 'sparse' path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sunode_tpu.ops.banded import banded_factor, banded_solve

__all__ = [
    "bbd_form_newton",
    "bbd_factor",
    "bbd_solve",
    "dense_to_packed",
    "packed_to_dense",
]

_TINY = 1e-300


def bbd_form_newton(J_packed: jnp.ndarray, c, lower: int, upper: int, k: int):
    """M = I - c*J in packed storage (single instance).

    ``c`` may be a scalar or any shape broadcasting against (rows, n).
    """
    w = lower + upper
    n = J_packed.shape[1]
    n_i = n - k
    M = (-c) * J_packed
    # interior diagonal lives in banded row `upper`, columns 0..n_i-1
    diag_cols = jnp.arange(n) < n_i
    M = M.at[upper].add(jnp.where(diag_cols, 1.0, 0.0))
    if k:
        ar = jnp.arange(k)
        M = M.at[w + 1 + ar, n_i + ar].add(1.0)
    return M


def bbd_factor(M_packed: jnp.ndarray, lower: int, upper: int, k: int):
    """Factor packed M.  Returns (lu, piv, X, E, S_LU, S_piv, sing).

    NaN/singular contract matches ``banded_factor``: ``sing`` is a scalar
    bool and ``bbd_solve`` poisons its solution with NaN when set, so the
    Newton loop's isfinite check rejects the step deterministically.
    """
    w = lower + upper
    n = M_packed.shape[1]
    n_i = n - k
    ab = M_packed[: w + 1, :n_i]
    EC = M_packed[w + 1 : w + 1 + k]  # (k, n)
    E = EC[:, :n_i]
    C = EC[:, n_i:]
    F = M_packed[w + 1 + k :, :n_i].T  # (n_i, k)
    lu, piv, sing = banded_factor(ab, lower, upper)
    no_sing = jnp.asarray(False)
    X = jax.vmap(
        lambda col: banded_solve((lu, piv, no_sing), col, lower, upper),
        in_axes=1,
        out_axes=1,
    )(F)  # (n_i, k)
    S = C - E @ X  # (k, k) Schur complement
    from sunode_tpu.ops.linalg import lu_factor

    S_LU, S_piv = lu_factor(S)
    sing = sing | jnp.any(jnp.abs(jnp.diagonal(S_LU)) <= _TINY)
    return lu, piv, X, E, S_LU, S_piv, sing


def bbd_solve(factors, r: jnp.ndarray, lower: int, upper: int, k: int):
    """Solve M z = r (PLAN-permuted coordinates); NaN when singular."""
    lu, piv, X, E, S_LU, S_piv, sing = factors
    from sunode_tpu.ops.linalg import lu_solve

    n = r.shape[0]
    n_i = n - k
    r_i, r_b = r[:n_i], r[n_i:]
    no_sing = jnp.asarray(False)
    u = banded_solve((lu, piv, no_sing), r_i, lower, upper)
    z_b = lu_solve(S_LU, S_piv, r_b - E @ u)
    z_i = u - X @ z_b
    z = jnp.concatenate([z_i, z_b])
    return jnp.where(sing, jnp.nan, z)


def dense_to_packed(A: jnp.ndarray, plan) -> jnp.ndarray:
    """Dense (n, n) matrix in ORIGINAL coordinates -> packed storage for
    ``plan`` (a SparsePlan; uses its perm/bandwidths/border)."""
    from sunode_tpu.ops.banded import dense_to_banded

    perm = jnp.asarray(np.asarray(plan.perm))
    k = plan.k_border
    n = A.shape[0]
    n_i = n - k
    A_p = A[perm][:, perm]
    ab = dense_to_banded(A_p[:n_i, :n_i], plan.lower, plan.upper)
    if k == 0:
        return ab
    pad = jnp.zeros((plan.lower + plan.upper + 1, k), A.dtype)
    band_rows = jnp.concatenate([ab, pad], axis=1)
    ec_rows = A_p[n_i:, :]  # (k, n)
    ft = A_p[:n_i, n_i:].T  # (k, n_i)
    ft_rows = jnp.concatenate([ft, jnp.zeros((k, k), A.dtype)], axis=1)
    return jnp.concatenate([band_rows, ec_rows, ft_rows], axis=0)


def packed_to_dense(M_packed: jnp.ndarray, lower: int, upper: int, k: int):
    """Inverse of the packed layout (testing helper): packed -> dense in
    PLAN-PERMUTED coordinates."""
    from sunode_tpu.ops.banded import banded_to_dense

    w = lower + upper
    n = M_packed.shape[1]
    n_i = n - k
    Bb = banded_to_dense(M_packed[: w + 1, :n_i], lower, upper)
    if k == 0:
        return Bb
    EC = M_packed[w + 1 : w + 1 + k]
    F = M_packed[w + 1 + k :, :n_i].T
    top = jnp.concatenate([Bb, F], axis=1)
    return jnp.concatenate([top, EC], axis=0)
