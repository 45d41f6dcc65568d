"""Small fixed-size dense solves, unrolled for the VPU.

XLA's batched `jnp.linalg.solve` lowers to an LU-with-pivoting while_loop
that serializes on TPU — for the 6x6 normal-equation solves inside
PnP-RANSAC (500 hypotheses x 10 GN steps, backend/pnp.py) that was the
single most expensive op in the pose stage. These helpers unroll a
pivot-free Cholesky (the matrices are damped SPD normal equations) into
pure elementwise arithmetic: under vmap every line vectorizes across the
hypothesis batch on the (8, 128) VPU with no data-dependent control flow.

TPU-native replacement for the dense-solve role of the reference's libviso2
`Matrix::solve` (reference src/evaluate/matrix.cpp:413-573); the eval-side
general path still uses jnp.linalg.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_spd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for SPD A of static size n (unrolled Cholesky).

    A: (..., n, n) symmetric positive definite (e.g. damped Gauss-Newton
    normal matrix). b: (..., n). Returns (..., n). All arithmetic is
    elementwise over the batch; n is a Python int so the factorization
    fully unrolls at trace time.

    Non-finite / non-PD inputs produce non-finite outputs (no pivoting) —
    callers already mask those (pnp_ransac drops hypotheses whose step is
    not finite), matching the previous jnp.linalg.solve behavior.
    """
    n = A.shape[-1]
    eps = jnp.asarray(1e-30, A.dtype)

    # Cholesky: A = L L^T, L lower-triangular, unrolled.
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # Guard the rsqrt so non-PD rows propagate NaN via the solve (not 0):
        # keep s as-is; sqrt of negative -> NaN, which callers mask.
        Ljj = jnp.sqrt(s)
        L[j][j] = Ljj
        inv = 1.0 / jnp.where(jnp.abs(Ljj) < eps, eps, Ljj)
        for i in range(j + 1, n):
            t = A[..., i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv

    # Forward substitution: L y = b.
    y = [None] * n
    for i in range(n):
        t = b[..., i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        d = L[i][i]
        y[i] = t / jnp.where(jnp.abs(d) < eps, eps, d)

    # Back substitution: L^T x = y.
    x = [None] * n
    for i in range(n - 1, -1, -1):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * x[k]
        d = L[i][i]
        x[i] = t / jnp.where(jnp.abs(d) < eps, eps, d)

    return jnp.stack(x, axis=-1)
