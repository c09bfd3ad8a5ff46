"""Balanced-accuracy scoring of k-locus MDR models on TPU.

The reference scores every C(p, k) genotype combination with one CUDA thread
per combo building a 3^k contingency table in local memory
(``MDR.py:20-79``) or a Numba prange loop (``MDR.py:82-129``).  Here a tile
of combos is scored at once: gather the k genotype columns per combo, fold
them into base-3 cell indices, and build all case/control tables of the tile
with a one-hot reduction — static shapes, fully vectorised.

Padding is sample-safe: case/control weights carry the validity mask, so
fold sizes that differ by one sample reuse the same compiled program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@partial(jax.jit, static_argnames=("k",))
def _mdr_tile_ba(X, w_case, w_ctrl, combos_tile, *, k: int):
    """Balanced accuracy for one tile of combos.

    X: (n_pad, p) int32 genotypes 0..2; w_case/w_ctrl: (n_pad,) f32
    sample weights (0 for padded rows); combos_tile: (tc, k) int32.
    Returns (tc,) f32.
    """
    n_cells = 3 ** k
    powers = jnp.asarray([3 ** (k - 1 - j) for j in range(k)], jnp.int32)
    gathered = jnp.take(X, combos_tile, axis=1)          # (n, tc, k)
    cells = (gathered * powers[None, None, :]).sum(-1)   # (n, tc)
    oh = jax.nn.one_hot(cells, n_cells, dtype=jnp.float32)  # (n, tc, cells)
    case = jnp.einsum("n,ncl->cl", w_case, oh,
                      preferred_element_type=jnp.float32)
    ctrl = jnp.einsum("n,ncl->cl", w_ctrl, oh,
                      preferred_element_type=jnp.float32)

    total_case = case.sum(-1)
    total_ctrl = ctrl.sum(-1)
    ok = (total_case > 0) & (total_ctrl > 0)
    thr = total_case / jnp.maximum(total_ctrl, 1.0)
    # Reference rule (MDR.py:66-70): empty-control cells are high risk;
    # otherwise high risk iff case/control > case-total/control-total.
    high = (ctrl == 0) | (case / jnp.maximum(ctrl, 1e-30) > thr[:, None])
    tp = jnp.where(high, case, 0.0).sum(-1)
    tn = jnp.where(~high, ctrl, 0.0).sum(-1)
    sens = tp / jnp.maximum(total_case, 1.0)
    spec = tn / jnp.maximum(total_ctrl, 1.0)
    return jnp.where(ok, (sens + spec) / 2.0, 0.0)


def batch_balanced_accuracy(X: np.ndarray, y: np.ndarray,
                            combos: np.ndarray, k: int,
                            device=None) -> np.ndarray:
    """Balanced accuracy of every combo's MDR model on (X, y)."""
    n, _ = X.shape
    n_combos = combos.shape[0]
    n_cells = 3 ** k
    # Tile size bounded so the one-hot tensor stays ~tens of MB.
    n_pad = _round_up(n, 64)
    tc = int(max(8, min(1024, (48 * 1024 * 1024) // (n_pad * n_cells * 4))))
    c_pad = _round_up(n_combos, tc)

    Xp = np.zeros((n_pad, X.shape[1]), np.int32)
    Xp[:n] = X
    w_case = np.zeros((n_pad,), np.float32)
    w_case[:n] = (y == 1)
    w_ctrl = np.zeros((n_pad,), np.float32)
    w_ctrl[:n] = (y != 1)
    combos_p = np.zeros((c_pad, k), np.int32)
    combos_p[:n_combos] = combos

    from ..utils.backend import execution_context

    out = np.empty((c_pad,), np.float32)
    with execution_context(device):
        Xd, wc, wl = (jnp.asarray(a) for a in (Xp, w_case, w_ctrl))
        for t0 in range(0, c_pad, tc):
            tile = jnp.asarray(combos_p[t0:t0 + tc])
            out[t0:t0 + tc] = np.asarray(
                _mdr_tile_ba(Xd, wc, wl, tile, k=k))
    return out[:n_combos]
