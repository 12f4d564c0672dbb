"""Preconditioners (BASELINE.json config 4 extension; absent in the
reference, whose only guard is the alpha clamp cg.cc:107).

Preconditioned CG uses the same recurrence as :mod:`cgx.solver.cg`
with z = M^{-1} r replacing r in the direction updates; with M = I it
reduces to the exact reference sequence of operations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def jacobi(diag: jnp.ndarray, eps: float = 0.0) -> Callable:
    """Jacobi (diagonal) preconditioner: z = r / diag(A).

    For the reference's constant-diagonal Laplacians this is a uniform
    scaling (no convergence change) — it matters for variable-
    coefficient or scaled problems."""
    inv = 1.0 / jnp.where(jnp.abs(diag) > eps, diag, jnp.ones_like(diag))

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        return inv * r

    return apply


def chebyshev_banded(
    bands: jnp.ndarray,
    offsets,
    lmin: float,
    lmax: float,
    degree: int = 4,
):
    """Degree-``degree`` Chebyshev polynomial preconditioner.

    Runs ``degree`` Chebyshev-iteration steps on ``A z = r`` from
    ``z0 = 0`` using spectral bounds — the minimax-optimal degree-d
    polynomial approximation to A^-1 on [lmin, lmax] *when the bounds
    are tight*. SPD by construction (the residual polynomial is bounded
    below 1 in magnitude on the spectrum), hence CG-safe. Pure banded
    mat-vecs: fully data-parallel, no reductions inside the apply.

    Bounds from :func:`cgx.solver.chebyshev.spectral_bounds` or exact
    eigen-bounds when known; the iteration reduction is quite
    sensitive to the lower bound (use the Lanczos estimate, not a
    floor). Economics: NO polynomial preconditioner can cut CG's
    *total mat-vec count* (poly-PCG's Krylov space after k iterations
    is a constrained subset of plain CG's after k*(degree+1)); what it
    buys is (degree+1) mat-vecs of progress per reduction pair — wall
    time when scalar/reduction work dominates (fp64-emulated TPU
    dots), latency on large meshes. bench.py races it against Neumann
    and plain CG per run.
    """
    from cgx.solver.operators import banded_matvec

    offsets = tuple(offsets)
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        # z0 = 0, r0 = r
        z = jnp.zeros_like(r)
        res = r
        p = res / theta
        rho_old = 1.0 / sigma1
        for _ in range(degree):
            z = z + p
            res = res - banded_matvec(bands, offsets, p)
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            p = (rho * rho_old) * p + (2.0 * rho / delta) * res
            rho_old = rho
        return z

    return apply


def chebyshev_poly(matvec, lmin: float, lmax: float, degree: int = 3):
    """Operator-agnostic Chebyshev polynomial preconditioner.

    Same recurrence as :func:`chebyshev_banded` but over any
    ``x -> A x`` callable (dense, ELL, CSR, closures over shard_map
    collectives, ...). The apply costs ``degree`` mat-vecs and no
    reductions.

    Caveat (measured): the polynomial FOLDS the spectrum — the
    preconditioned eigenvalues land in [1 - 1/T_d(s1), 1 + 1/T_d(s1)]
    (verified exact on lap2d_reference(400): kappa 322 -> 72 at
    degree 3) but EQUIOSCILLATE across that interval, so the
    eigenvalue clustering plain CG exploits is destroyed. At low
    degree on Laplacian-like spectra the CG count may NOT drop
    (108 -> 123 on that matrix) while each iteration pays ``degree``
    extra mat-vecs; the polynomial only pays off once
    1/T_d(s1) << 1 — i.e. degree >~ sqrt(kappa)/2, where it behaves
    like an inner Chebyshev solve (cf. the degree-40 coarsest-level
    solve in cgx.solver.multigrid)."""
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        z = jnp.zeros_like(r)
        res = r
        p = res / theta
        rho_old = 1.0 / sigma1
        for _ in range(degree):
            z = z + p
            res = res - matvec(p)
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            p = (rho * rho_old) * p + (2.0 * rho / delta) * res
            rho_old = rho
        return z

    return apply


def neumann_banded(bands: jnp.ndarray, offsets, omega: float = 1.0, sweeps: int = 1):
    """Truncated-Neumann polynomial preconditioner for banded matrices:
    ``z = sum_{k<sweeps} (I - omega D^{-1} A)^k (omega D^{-1} r)``.

    TPU-native alternative to SSOR/IC: no triangular solves (those
    serialize poorly on a vector machine) — only banded mat-vecs, i.e.
    pure VPU streaming. Symmetric for symmetric A; positive definite
    for diagonally dominant SPD stencils with omega <= 1 (the
    polynomial sum_{k<m} (1-omega*lambda)^k stays positive on the
    scaled spectrum (0, 2)). ``sweeps=1`` is scaled Jacobi.
    """
    from cgx.solver.operators import banded_matvec

    offsets = tuple(offsets)
    d_idx = offsets.index(0)
    inv_d = omega / bands[d_idx]

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        c = inv_d * r
        z = c
        for _ in range(sweeps - 1):
            # z <- c + (I - omega D^-1 A) z
            z = c + z - inv_d * banded_matvec(bands, offsets, z)
        return z

    return apply


def diag_blocks(mat, block_size: int, n_rows: int | None = None):
    """Host-side extraction of the block diagonal of ``mat`` as a
    ``(nb, m, m)`` float64 numpy batch (m = ``block_size``).

    Accepts banded matrices/operators (DIAMatrix / DiaOperator:
    ``A[i, i+off] = bands[d, i]``), dense containers (DenseMatrix /
    DenseOperator / raw 2-D arrays), and anything with ``to_dense``.
    Rows past the matrix size (``n_rows`` rounds n up for padded
    sharded layouts) are filled with identity so the padded blocks
    stay SPD and act as no-ops on padding lanes.
    """
    import numpy as np

    m = int(block_size)
    if m < 1:
        raise ValueError(f"block_size must be >= 1; got {block_size}")
    bands = getattr(mat, "bands", None)
    if bands is not None:
        offsets = tuple(mat.offsets)
        bands = np.asarray(bands, dtype=np.float64)
        n = bands.shape[1]
        n_p = n if n_rows is None else int(n_rows)
        if n_p < n:
            raise ValueError(f"n_rows {n_p} < matrix size {n}")
        nb = -(-n_p // m)
        n_pad = nb * m
        blocks = np.zeros((nb, m, m), dtype=np.float64)
        rows_pad = np.zeros((len(offsets), n_pad), dtype=np.float64)
        rows_pad[:, :n] = bands
        i_global = np.arange(n_pad).reshape(nb, m)
        for d, off in enumerate(offsets):
            if abs(off) >= m:
                continue  # couples distinct blocks only: truncated
            r = np.arange(max(0, -off), min(m, m - off))
            c = r + off
            vals = rows_pad[d].reshape(nb, m)[:, r]
            # mask entries whose global column falls outside the
            # matrix (band storage may carry junk there — the mat-vec
            # only zero-masks them through the padded x)
            col_g = i_global[:, r] + off
            vals = np.where(col_g < n, vals, 0.0)
            blocks[:, r, c] = vals
    else:
        a = getattr(mat, "a", mat)
        if hasattr(a, "to_dense"):
            a = a.to_dense()
        a = np.asarray(a, dtype=np.float64)
        if a.ndim != 2 or a.shape[0] != a.shape[1]:
            raise ValueError(f"need a square matrix; got shape {a.shape}")
        n = a.shape[0]
        n_p = n if n_rows is None else int(n_rows)
        nb = -(-n_p // m)
        n_pad = nb * m
        blocks = np.zeros((nb, m, m), dtype=np.float64)
        for b in range(nb):
            lo = b * m
            hi = min(lo + m, n)
            if hi > lo:
                blocks[b, : hi - lo, : hi - lo] = a[lo:hi, lo:hi]
    # identity on padding rows (and any all-zero diagonal entries the
    # truncation left behind would make a block singular — the matrix
    # rows themselves always carry a positive diagonal for SPD A)
    pad_rows = np.arange(n_pad) >= n
    if pad_rows.any():
        rr = np.arange(n_pad)[pad_rows]
        blocks[rr // m, rr % m, rr % m] = 1.0
    return blocks


def invert_spd_blocks(blocks):
    """Batched SPD inverse (host, float64): Cholesky per block with a
    symmetrized result. Raises on a non-SPD block — block-Jacobi is
    only CG-safe when every diagonal block is SPD (true for any
    principal submatrix of an SPD matrix)."""
    import numpy as np

    blocks = np.asarray(blocks, dtype=np.float64)
    try:
        np.linalg.cholesky(blocks)
    except np.linalg.LinAlgError as e:
        raise ValueError(
            "block-Jacobi needs SPD diagonal blocks (is A SPD?)"
        ) from e
    inv = np.linalg.inv(blocks)
    return (inv + np.swapaxes(inv, -1, -2)) / 2.0


def block_jacobi(mat, block_size: int, dtype=None) -> Callable:
    """Block-Jacobi preconditioner: ``z = diag_blocks(A, m)^{-1} r``.

    The TPU-native strong-coupling preconditioner: where SSOR/IC pay
    triangular solves (serial on a vector machine), block-Jacobi's
    apply is ONE batched (nb, m, m) @ (nb, m) matmul — pure MXU, zero
    reductions, and embarrassingly row-parallel (shards with the rows;
    the sharded path applies it with NO extra collectives). The blocks
    are factored once on the host (float64 Cholesky-validated explicit
    inverses) and live on device thereafter.

    Economics: the apply streams ``n*m`` words/iteration vs the banded
    mat-vec's ``~(ndiag+2)*n`` — at m=32 on a 5-band stencil that is
    ~4.6x a mat-vec, so it must cut iterations accordingly (it does on
    strong 1-D coupling: x-line blocks on an anisotropic Laplacian,
    high-contrast coefficient runs); against a DENSE mat-vec's n^2
    words it is free (m/n). ``m=1`` reduces exactly to :func:`jacobi`;
    ``m=n`` is a direct solve (CG converges in one iteration).
    """
    blocks = diag_blocks(mat, block_size)
    inv = jnp.asarray(
        invert_spd_blocks(blocks),
        dtype=jnp.result_type(dtype) if dtype is not None else None,
    )
    nb, m, _ = inv.shape
    n_pad = nb * m

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        n = r.shape[0]
        rp = jnp.pad(r, (0, n_pad - n)) if n_pad != n else r
        z = jnp.einsum(
            "bij,bj->bi", inv.astype(rp.dtype), rp.reshape(nb, m),
            precision=jax.lax.Precision.HIGHEST,
        )
        return z.reshape(n_pad)[:n]

    return apply
