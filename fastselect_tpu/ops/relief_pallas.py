"""Fused Pallas TPU kernels for the Relief family on continuous/mixed data.

The generic XLA engine (``relief.py``) materialises (T, CJ, FC) broadcast
diff temporaries in HBM, making the O(n^2 p) elementwise work
HBM-bandwidth-bound.  These kernels keep every diff tile in VMEM and are
VPU-compute-bound instead — the TPU equivalent of the reference's CUDA
kernels that stage 1024-feature tiles in shared memory
(``MultiSURF.py:11-12,22-25,67-138``).

Two kernels mirror the reference's two-pass structure:

  pass 1  ``_dist_kernel``   grid (NI, NJ, NF): D[i-tile, j-tile] +=
          sum over the f-tile of the mixed Hamming / range-scaled-L1 diff
          (``MultiSURF.py:33-43`` semantics); the (TI, TJ) output block
          stays VMEM-resident across all NF feature steps.
  pass 2  ``_accum_kernel``  grid (NF, NI, NJ): scores[f-tile] +=
          sum_ij W[i, j] * diff(i, j, f); the (FT,) score block stays
          resident across all (NI, NJ) sample-tile steps.

Between the passes the per-pair weights W are derived from D by the same
(mask, coeff) rules the XLA engine uses (``relief.pair_weight_rules``),
so algorithm semantics live in exactly one place.

Diff tiles are processed in (8, TJ, FT) sub-batches: 8 focal rows at a
time keeps the broadcast temporary ~4 MB (fits VMEM alongside the
double-buffered input blocks) while giving the VPU full (8, 128)-lane
shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .relief import pair_weight_rules, _sum_rules, _round_up

_SB = 8  # focal-row sub-batch (f32 sublane count)

# Above this sample count the blocked super-block path's single lax.map
# dispatch gets too long; callers stream through the generic engine.
PALLAS_MAX_N = 131072


def _mixed_diff(a, xj, recip, disc):
    """(SB, TJ, FT) mixed diff: Hamming where disc > 0, else |d| * recip."""
    d = a[:, None, :] - xj[None, :, :]
    return jnp.where(disc[None, None, :] > 0,
                     (d != 0).astype(jnp.float32),
                     jnp.abs(d) * recip[None, None, :])


def _cont_diff(a, xj, recip):
    """(SB, TJ, FT) continuous-only diff: |a - b| * recip — two VPU ops
    fewer per element than the mixed form (no compare, no select)."""
    return jnp.abs(a[:, None, :] - xj[None, :, :]) * recip[None, None, :]


def _dist_kernel(xi_ref, xj_ref, recip_ref, disc_ref, d_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        d_ref[:] = jnp.zeros_like(d_ref)

    xj = xj_ref[:]
    recip = recip_ref[0, :]
    disc = disc_ref[0, :]
    ti = xi_ref.shape[0]

    def body(s, _):
        a = xi_ref[pl.ds(s * _SB, _SB), :]
        val = _mixed_diff(a, xj, recip, disc)
        d_ref[pl.ds(s * _SB, _SB), :] += val.sum(axis=-1)
        return 0

    jax.lax.fori_loop(0, ti // _SB, body, 0)


def _dist_kernel_cont(xi_ref, xj_ref, recip_ref, d_ref):
    """All-continuous pass 1 (the common large-fit case after routing:
    mixed data goes to the hybrid engine, which calls these kernels with
    an all-zero disc vector anyway)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        d_ref[:] = jnp.zeros_like(d_ref)

    xj = xj_ref[:]
    recip = recip_ref[0, :]
    ti = xi_ref.shape[0]

    def body(s, _):
        a = xi_ref[pl.ds(s * _SB, _SB), :]
        d_ref[pl.ds(s * _SB, _SB), :] += _cont_diff(a, xj, recip).sum(
            axis=-1)
        return 0

    jax.lax.fori_loop(0, ti // _SB, body, 0)


def _accum_kernel(xi_ref, xj_ref, w_ref, recip_ref, disc_ref, s_ref):
    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    xj = xj_ref[:]
    recip = recip_ref[0, :]
    disc = disc_ref[0, :]
    ti, ft = xi_ref.shape

    def body(s, _):
        a = xi_ref[pl.ds(s * _SB, _SB), :]
        w = w_ref[pl.ds(s * _SB, _SB), :]
        val = _mixed_diff(a, xj, recip, disc)
        # accumulate straight into the resident output block; a loop
        # carry here trips a Mosaic relayout bug on the reduced vector
        s_ref[0:1, :] += (w[:, :, None] * val).sum(axis=(0, 1)).reshape(
            1, ft)
        return 0

    jax.lax.fori_loop(0, ti // _SB, body, 0)


def _accum_kernel_cont(xi_ref, xj_ref, w_ref, recip_ref, s_ref):
    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    xj = xj_ref[:]
    recip = recip_ref[0, :]
    ti, ft = xi_ref.shape

    def body(s, _):
        a = xi_ref[pl.ds(s * _SB, _SB), :]
        w = w_ref[pl.ds(s * _SB, _SB), :]
        val = _cont_diff(a, xj, recip)
        s_ref[0:1, :] += (w[:, :, None] * val).sum(axis=(0, 1)).reshape(
            1, ft)
        return 0

    jax.lax.fori_loop(0, ti // _SB, body, 0)


@partial(jax.jit, static_argnames=("n_pad", "p_pad"))
def _pad_x(x, *, n_pad, p_pad):
    """Module-level jitted pad (the _pad_device pattern): TuRF's
    continuous fast path calls this once per elimination round with a
    device array, so a per-call ``jax.jit(partial(...))`` closure would
    recompile every round."""
    n, p = x.shape
    return jnp.pad(x.astype(jnp.float32), ((0, n_pad - n), (0, p_pad - p)))


def _tiles(n_pad: int, p_pad: int) -> tuple[int, int, int]:
    # ft=1024 measured ~10% faster than 512 on v5e (16384x1024 sweep:
    # cont pass1+2 0.509s vs 0.592s; SB in {8,16,32} within 2%)
    ti = 256 if n_pad >= 256 else n_pad
    tj = 256 if n_pad >= 256 else n_pad
    ft = 1024 if p_pad >= 1024 else (512 if p_pad >= 512 else p_pad)
    return ti, tj, ft


def pallas_dist_matrix(xp, recip, disc, ti, tj, ft, xi=None,
                       cont=False):
    """Pairwise mixed-distance matrix via pass 1.

    Square (xp vs xp) by default; pass ``xi`` (nb, p_pad) for a
    rectangular focal block vs all samples (the large-n blocked path).
    ``cont=True`` selects the all-continuous kernel (no per-element
    discrete select; ``disc`` is ignored).
    """
    n_pad, p_pad = xp.shape
    if xi is None:
        xi = xp
    grid = (xi.shape[0] // ti, n_pad // tj, p_pad // ft)
    vec_spec = pl.BlockSpec((1, ft), lambda i, j, f: (0, f),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((ti, ft), lambda i, j, f: (i, f),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tj, ft), lambda i, j, f: (j, f),
                     memory_space=pltpu.VMEM),
        vec_spec,
    ]
    args = (xi, xp, recip)
    kernel = _dist_kernel_cont
    if not cont:
        in_specs.append(vec_spec)
        args = args + (disc,)
        kernel = _dist_kernel
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ti, tj), lambda i, j, f: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xi.shape[0], n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * xi.shape[0] * n_pad * p_pad, bytes_accessed=0,
            transcendentals=0),
    )(*args)


def pallas_accumulate(xp, W, recip, disc, ti, tj, ft, xi=None,
                      cont=False):
    """Pass 2: per-feature scores (p_pad,) from pairwise weights W.

    ``xi`` selects a rectangular focal block; W is (xi_rows, n_pad).
    ``cont=True`` selects the all-continuous kernel.
    """
    n_pad, p_pad = xp.shape
    if xi is None:
        xi = xp
    nf = p_pad // ft
    grid = (nf, xi.shape[0] // ti, n_pad // tj)
    vec_spec = pl.BlockSpec((1, ft), lambda f, i, j: (0, f),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((ti, ft), lambda f, i, j: (i, f),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tj, ft), lambda f, i, j: (j, f),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tj), lambda f, i, j: (i, j),
                     memory_space=pltpu.VMEM),
        vec_spec,
    ]
    args = (xi, xp, W, recip)
    kernel = _accum_kernel_cont
    if not cont:
        in_specs.append(vec_spec)
        args = args + (disc,)
        kernel = _accum_kernel
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        # one (8, ft) block per f-tile (TPU block rows must be a multiple
        # of 8 unless equal to the array dim); only row 0 accumulates
        out_specs=pl.BlockSpec((_SB, ft), lambda f, i, j: (f, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf * _SB, ft), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * xi.shape[0] * n_pad * p_pad, bytes_accessed=0,
            transcendentals=0),
    )(*args)
    return out.reshape(nf, _SB, ft)[:, 0, :].reshape(p_pad)


@partial(jax.jit,
         static_argnames=("algo", "use_star", "k", "ti", "tj", "ft",
                          "cont"))
def _pallas_engine(xp, yv, valid, recip2, disc2, n_real, class_probs,
                   *, algo, use_star, k, ti, tj, ft, cont=False):
    n_pad = xp.shape[0]
    D = pallas_dist_matrix(xp, recip2, disc2, ti, tj, ft, cont=cont)
    iid = jnp.arange(n_pad, dtype=jnp.int32)
    W = _sum_rules(pair_weight_rules(
        D, yv, valid, iid, yv, valid, n_real, class_probs,
        algo=algo, use_star=use_star, k=k))
    return pallas_accumulate(xp, W, recip2, disc2, ti, tj, ft, cont=cont)


@partial(jax.jit,
         static_argnames=("algo", "use_star", "k", "ti", "tj", "ft", "nb",
                          "cont"))
def _pallas_engine_blocked(xp, yv, valid, recip2, disc2, n_real,
                           class_probs,
                           *, algo, use_star, k, ti, tj, ft, nb,
                           cont=False):
    """Large-n path: focal super-blocks of nb rows stream against all
    samples, so only (nb, n_pad) distance/weight blocks materialise —
    HBM stays bounded while both passes keep the fused kernels."""
    n_pad, p_pad = xp.shape

    def per_block(b):
        xi = jax.lax.dynamic_slice(xp, (b * nb, 0), (nb, p_pad))
        D = pallas_dist_matrix(xp, recip2, disc2, ti, tj, ft, xi=xi,
                               cont=cont)
        iid = b * nb + jnp.arange(nb, dtype=jnp.int32)
        yi = jax.lax.dynamic_slice(yv, (b * nb,), (nb,))
        vi = jax.lax.dynamic_slice(valid, (b * nb,), (nb,))
        W = _sum_rules(pair_weight_rules(
            D, yi, vi, iid, yv, valid, n_real, class_probs,
            algo=algo, use_star=use_star, k=k))
        return pallas_accumulate(xp, W, recip2, disc2, ti, tj, ft, xi=xi,
                                 cont=cont)

    parts = jax.lax.map(per_block, jnp.arange(n_pad // nb))
    return parts.sum(axis=0)


def _focal_block_rows(n_pad: int, ti: int,
                      budget_bytes: int = 3 << 30) -> tuple[int, int]:
    """(nb, n_pad') focal super-block rows plus the (possibly enlarged)
    padded sample count, with nb dividing n_pad'.

    Picks the block size minimising padded work (m2, then block count)
    within the budget, padding the sample axis a little when that
    avoids a tiny block at near-prime tile counts (30208 rows = 2*59
    tiles forced nb=512 under the old divisor-only rule).  Measured on
    v5e: block size is NOT the large-n ReliefF cost (nb=512 vs
    nb=10240 at 30000x100 both fit in 1.69 s fresh-process best-of-3)
    — per-super-block overhead is negligible next to the O(nb * n_pad)
    distance work, so this exists for shape hygiene, not speed."""
    if n_pad * n_pad * 8 <= budget_bytes or n_pad <= ti:
        return n_pad, n_pad
    m = (n_pad + ti - 1) // ti
    cap = max(1, budget_bytes // (8 * n_pad * ti))
    if cap >= m:
        return m * ti, m * ti
    # candidate block sizes d (in ti units): minimise padded work
    # (m'^2 ~ both axes grow), then prefer fewer blocks
    best = None
    for d in range(1, cap + 1):
        m2 = -(-m // d) * d
        key = (m2, -(-m // d))
        if best is None or key < best[:2]:
            best = (key[0], key[1], d)
    d = best[2]
    m2 = -(-m // d) * d
    return d * ti, m2 * ti


def relief_pallas_scores(
    x: np.ndarray,
    y: np.ndarray,
    recip: np.ndarray,
    is_discrete: np.ndarray,
    *,
    algo: str,
    use_star: bool = False,
    n_neighbors: int = 0,
    class_probs: np.ndarray | None = None,
    device=None,
    interpret: bool = False,
) -> np.ndarray:
    """Relief-family scores via the fused Pallas kernels (/ n_samples).

    Materialises the (n_pad, n_pad) distance and weight matrices in HBM,
    so it is the right path while 8 * n^2 bytes fits comfortably
    (n <~ 40k on a 16 GB chip); beyond that callers stream focal blocks
    through ``relief.relief_engine_core`` instead.
    """
    n, p = x.shape
    n_pad = _round_up(max(n, _SB), _SB)
    ti, tj, ft = _tiles(_round_up(n_pad, 256) if n_pad >= 256 else n_pad,
                        _round_up(p, 128))
    n_pad = _round_up(n_pad, max(ti, tj))
    nb, n_pad = _focal_block_rows(n_pad, max(ti, tj))
    p_pad = _round_up(p, ft)

    if isinstance(x, jax.Array):
        # device-resident X: pad under jit, never round-trip to host
        xp = _pad_x(x, n_pad=n_pad, p_pad=p_pad)
    else:
        xp = np.zeros((n_pad, p_pad), np.float32)
        xp[:n, :p] = np.asarray(x, np.float32)
    yv = np.full((n_pad,), -1, np.int32)
    yv[:n] = y
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    recip2 = np.zeros((1, p_pad), np.float32)
    recip2[0, :p] = recip
    disc2 = np.zeros((1, p_pad), np.float32)
    disc2[0, :p] = is_discrete.astype(np.float32)
    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)

    from ..utils.backend import execution_context
    cont = not bool(np.any(is_discrete))
    with execution_context(device):
        if (not isinstance(xp, jax.Array) and device is not None
                and device.platform != "cpu"):
            # uncommitted device_put once — committed / eager-asarray /
            # jit-argument transfers are all far slower paths
            xp = jax.device_put(xp)
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                scores = _pallas_engine(
                    xp, yv, valid, recip2, disc2, np.float32(n),
                    np.asarray(class_probs, np.float32),
                    algo=algo, use_star=use_star, k=int(n_neighbors),
                    ti=ti, tj=tj, ft=ft, cont=cont)
        else:
            from ..utils.logging import phase
            with phase(f"relief_pallas.engine[{algo}]",
                       work=float(n) * n * p):
                if nb == n_pad:
                    scores = _pallas_engine(
                        xp, yv, valid, recip2, disc2, np.float32(n),
                        np.asarray(class_probs, np.float32),
                        algo=algo, use_star=use_star, k=int(n_neighbors),
                        ti=ti, tj=tj, ft=ft, cont=cont)
                else:
                    scores = _pallas_engine_blocked(
                        xp, yv, valid, recip2, disc2, np.float32(n),
                        np.asarray(class_probs, np.float32),
                        algo=algo, use_star=use_star, k=int(n_neighbors),
                        ti=ti, tj=tj, ft=ft, nb=nb, cont=cont)
                scores = np.asarray(scores, np.float32)
        scores = np.asarray(scores, np.float32)
    return scores[:p] / np.float32(n)
