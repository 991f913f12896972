"""Batched small-matrix SPD solve: Pallas TPU kernel + XLA fallback.

The Gauss-Newton/LM inner step solves (JᵀJ + λI) δ = -g with n = nv ≈ 70
unknowns, batched over thousands of frames. XLA's batched `cho_factor` /
`cho_solve` lowers to a long chain of tiny sequential HLOs (~11 ms for 1000
frames on v5e — latency-, not FLOP-bound: the whole solve is ~0.4 GFLOP).

This kernel vectorizes over FRAMES IN THE LANE DIMENSION: A is laid out
(n, n, F) so lanes hold 128 frames and every step of the right-looking
Cholesky is one full-tile VPU op applied to 128 systems at once:

- step j extracts column j in both layouts *by symmetry* (A's row j equals
  its column j, and the Schur update preserves symmetry), avoiding any
  transpose inside the loop;
- the forward substitution is FOLDED INTO the factor loop (when column j is
  finalized, y_j only needs the running accumulator), so L is only stored in
  the transposed layout the backward pass needs;
- n is static, the loops fully unroll, and one grid step owns a
  (n, n, 128) block in VMEM — no HBM traffic between factorization steps.

Numerics match `jax.scipy.linalg.cho_solve` in f32 (same algorithm, same
precision). The damped diagonal keeps A nonsingular on masked dof columns.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128  # f32 lane tile
# Cholesky panel width (columns per fused rank-B Schur update). Measured on
# v5e (rodent ik, n=73): 8 is the knee — see _chol_solve_kernel docstring.
PANEL = int(os.environ.get("STAC_SPD_PANEL", "8"))


def _chol_solve_kernel(
    a_ref, g_ref, lam_ref, x_ref, lt_ref, *, n: int, width: int, panel: int = PANEL
):
    """Solve (A + lam I) x = g for a block of ``width`` frames.

    a_ref: (n, n, width) — a_ref[r, c, f] = A_f[r, c] (symmetric SPD)
    g_ref: (1, n, width), x_ref: (1, n, width) — coefficients in sublanes.
    lam_ref: (1, width) — per-frame damping added to A's diagonal IN VMEM
    (one fused pass over the already-resident block), so LM callers skip
    XLA's (lam*I + A) add — a full HBM read+write of the (F, n, n) tensor
    per iteration (~7% of ik device time at 10k frames, bench r4 trace).
    lt_ref: (n, n, width) VMEM scratch for Lᵀ — each factor step STORES its
    column row-wise (a (n, width) store at a static index) instead of
    select-updating the whole block, which cost a full read+write of the
    block per step (~2x kernel traffic).

    PANEL-BLOCKED right-looking Cholesky: the rank-1 full-block Schur
    update per column made the kernel VMEM-traffic-bound (n read+write
    passes over the (n, n, width) block ≈ 400 MB/block at n=73 — measured
    ~41 us/block, right at the traffic estimate). Columns are processed in
    panels of ``panel``: within a panel each column's row/col is freshened
    on the fly from the panel's cm/cs buffers (cheap (n, width) terms),
    and the block takes ONE fused rank-``panel`` update per panel —
    a - Σ_j cm_j*cs_j in a single read+write pass — cutting block traffic
    ~panel-fold. Masking guarantees zeros above/left of every pivot, so
    values match the rank-1 schedule exactly (same operations, same
    order per element).

    ``width`` > LANE amortizes the factorization's sequential dependency
    chain over more systems per grid step (measured: no win; see
    _block_width).
    """
    a = a_ref[:]
    g = g_ref[:]
    dtype = a.dtype

    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    # Damped diagonal: a += lam * I as one block pass in VMEM.
    lam_b = lam_ref[:][None]  # (1, 1, width)
    a = a + jnp.where(row_ids == sub_ids, lam_b, jnp.zeros_like(lam_b))

    # sqrtd[0, j, f] = L_f[j, j]; y built during the factor loop.
    sqrtd = jnp.zeros((1, n, width), dtype)
    y = jnp.zeros((1, n, width), dtype)
    sacc = jnp.zeros((1, n, width), dtype)  # sacc[0,r,f] = Σ_{i<j} L[r,i] y_i

    for j0 in range(0, n, panel):
        B = min(panel, n - j0)
        cms = []  # (n, 1, width) columns of L for this panel
        css = []  # (1, n, width) the same values row-wise
        for jj in range(B):
            j = j0 + jj
            # Stale row/col j of `a` (block updates are deferred to panel
            # granularity) freshened with the panel's earlier columns.
            row = a[j : j + 1, :, :]  # (1, n, width)
            col = a[:, j : j + 1, :]  # (n, 1, width)
            for i in range(jj):
                row = row - cms[i][j : j + 1, :, :] * css[i]
                col = col - cms[i] * css[i][:, j : j + 1, :]
            dj = row[:, j : j + 1, :]  # (1, 1, width)
            rinv = jax.lax.rsqrt(dj)
            sd = dj * rinv  # sqrt(dj)
            cm = jnp.where(row_ids >= j, col * rinv, jnp.zeros_like(col))
            cs = jnp.where(sub_ids >= j, row * rinv, jnp.zeros_like(row))
            lt_ref[j, :, :] = cs[0]  # row j of Lᵀ = column j of L
            sqrtd = jnp.where(sub_ids == j, sd, sqrtd)
            # Forward substitution for coordinate j, then fold y_j's
            # contribution into the accumulator.
            yj = (g[:, j : j + 1, :] - sacc[:, j : j + 1, :]) / sd
            y = jnp.where(sub_ids == j, yj, y)
            sacc = sacc + cs * yj
            cms.append(cm)
            css.append(cs)
        # One fused rank-B Schur update: a single read+write of the block.
        upd = cms[0] * css[0]
        for i in range(1, B):
            upd = upd + cms[i] * css[i]
        a = a - upd

    # Backward: Lᵀ x = y, x_j = (y_j − Σ_{r>j} L[r,j] x_r) / L[j,j].
    x = jnp.zeros((1, n, width), dtype)
    for j in range(n - 1, -1, -1):
        s = jnp.sum(lt_ref[j, :, :][None] * x, axis=1, keepdims=True)
        xj = (y[:, j : j + 1, :] - s) / sqrtd[:, j : j + 1, :]
        x = jnp.where(sub_ids == j, xj, x)

    x_ref[:] = x


def _block_width(n: int, F: int) -> int:
    """Frames per grid step (a lane-tile multiple dividing F).

    Measured on v5e (rodent ik, n=73, F=2560/call): width 256 ran ~2.5%
    SLOWER than 128 end-to-end (40.0k vs 41.1k f/s) — the factorization's
    dependency chain is already hidden behind the grid pipeline, and wider
    blocks only raise VMEM pressure — so this stays at one lane tile. The
    kernel itself is ~12% of the LM iteration (ablation: 250→220 ms/16
    iters with the solve stubbed out), so the solve is not the lever here.
    """
    del F
    del n
    return LANE


def _spd_solve_lanes(
    A_nnf: jnp.ndarray,
    g_nf: jnp.ndarray,
    lam_f: jnp.ndarray,
    interpret: bool,
):
    """Kernel entry on the lanes layout: (A + diag(lam)) x = g.

    A (n, n, F), g (n, F), lam (F,) → x (n, F)."""
    n, _, F = A_nnf.shape
    assert F % LANE == 0
    # interpret mode (CPU tests) emulates the whole block elementwise —
    # keep it at one lane tile; width only matters for real-TPU latency.
    width = LANE if interpret else _block_width(n, F)
    grid = (F // width,)
    return pl.pallas_call(
        functools.partial(_chol_solve_kernel, n=n, width=width),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((1, n, F), A_nnf.dtype),
        in_specs=[
            pl.BlockSpec((n, n, width), lambda i: (0, 0, i)),
            pl.BlockSpec((1, n, width), lambda i: (0, 0, i)),
            pl.BlockSpec((1, width), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, n, width), lambda i: (0, 0, i)),
        scratch_shapes=[pltpu.VMEM((n, n, width), A_nnf.dtype)],
        # The Lᵀ scratch + the double-buffered (n, n, LANE) input block
        # exceed the default 16 MB scoped-vmem budget at n ≈ 74; the kernel
        # fits comfortably in physical VMEM (128 MB on v5e) — raise the cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(A_nnf, g_nf[None], lam_f[None]).reshape(n, F)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_solve_pallas_lanes(
    A_l: jnp.ndarray,
    g_l: jnp.ndarray,
    lam: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Lanes-layout entry: (A + diag(lam)) x = g, lam optional per-frame.

    A (n, n, F), g (n, F), lam (F,) or None → x (n, F).

    For callers that can PRODUCE the normal equations directly in the
    kernel's frames-in-lanes layout (einsum output order "...->deF"), this
    skips the (F,n,n)↔(n,n,F) relayouts of `spd_solve_pallas` — at 10k
    frames those move ~0.5 GB of HBM per iteration. Passing LM damping via
    ``lam`` (instead of adding lam*I to A in XLA) additionally saves a
    full HBM read+write of A per iteration: the add happens on the VMEM-
    resident block inside the kernel.
    """
    n, _, F = A_l.shape
    if lam is None:
        lam = jnp.zeros((F,), A_l.dtype)
    Fp = ((F + LANE - 1) // LANE) * LANE
    if Fp != F:
        pad = Fp - F
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=A_l.dtype)[:, :, None], (n, n, pad)
        )
        A_l = jnp.concatenate([A_l, eye], axis=-1)
        g_l = jnp.concatenate([g_l, jnp.zeros((n, pad), g_l.dtype)], axis=-1)
        lam = jnp.concatenate([lam, jnp.zeros((pad,), lam.dtype)])
    return _spd_solve_lanes(A_l, g_l, lam, interpret)[:, :F]


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_solve_pallas(A: jnp.ndarray, g: jnp.ndarray, interpret: bool = False):
    """Solve A x = g for batched SPD A (F, n, n), g (F, n) → x (F, n).

    Frames are padded to a lane multiple with identity systems; the
    transposes in/out of the lanes layout are cheap relayouts next to the
    sequential solve they unblock.
    """
    F, n, _ = A.shape
    Fp = ((F + LANE - 1) // LANE) * LANE
    A_l = jnp.transpose(A, (1, 2, 0))  # (n, n, F)
    g_l = jnp.transpose(g, (1, 0))  # (n, F)
    if Fp != F:
        pad = Fp - F
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype)[:, :, None], (n, n, pad))
        A_l = jnp.concatenate([A_l, eye], axis=-1)
        g_l = jnp.concatenate([g_l, jnp.zeros((n, pad), g.dtype)], axis=-1)
    x_l = _spd_solve_lanes(A_l, g_l, jnp.zeros((Fp,), A.dtype), interpret)
    return jnp.transpose(x_l[:, :F], (1, 0))


def spd_solve_xla(A: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback: batched cho_factor + cho_solve. A (..., n, n), g (..., n)."""

    def one(a, b):
        L = jax.scipy.linalg.cho_factor(a, lower=True)
        return jax.scipy.linalg.cho_solve(L, b)

    if A.ndim == 2:
        return one(A, g)
    return jax.vmap(one)(A, g)


def _spd_solve_xla_lanes(A_l, g_l, lam=None):
    if lam is not None:
        n = A_l.shape[0]
        A_l = A_l + lam[None, None, :] * jnp.eye(n, dtype=A_l.dtype)[:, :, None]
    return jnp.transpose(
        spd_solve_xla(
            jnp.transpose(A_l, (2, 0, 1)), jnp.transpose(g_l, (1, 0))
        ),
        (1, 0),
    )


def make_spd_solve_lanes(impl: str = "auto"):
    """Like make_spd_solve but on the lanes layout, with optional per-frame
    damping: (A (n,n,F), g (n,F), lam (F,)|None) → x (n,F) solving
    (A + diag(lam)) x = g.

    The Pallas path runs natively in this layout and applies lam on the
    VMEM-resident block; the XLA fallback pays the relayout and the
    explicit lam*I add (it has no layout preference to exploit).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return spd_solve_pallas_lanes
    if impl == "pallas-interpret":
        return functools.partial(spd_solve_pallas_lanes, interpret=True)
    if impl == "xla":
        return _spd_solve_xla_lanes
    raise ValueError(f"unknown spd solve impl: {impl}")


def make_spd_solve(impl: str = "auto"):
    """Pick the batched SPD solve implementation.

    impl: "auto" (Pallas on TPU, XLA elsewhere), "pallas",
    "pallas-interpret" (testing on CPU), or "xla".
    All return a callable (A (F, n, n), g (F, n)) → x (F, n).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return spd_solve_pallas
    if impl == "pallas-interpret":
        return functools.partial(spd_solve_pallas, interpret=True)
    if impl == "xla":
        return spd_solve_xla
    raise ValueError(f"unknown spd solve impl: {impl}")
