"""Multi-chip Relief scoring: shard_map over a device mesh.

The reference's only parallelism is threads over focal samples
(``MultiSURF.py:174`` prange) on one host.  The TPU-native equivalent
(SURVEY.md §2.3) is sample-shard data parallelism: the focal-sample axis is
sharded across the mesh, each chip scores its focal block against all
samples, and the per-feature score partials are merged with a single
``psum`` over ICI.  The engine itself is unchanged —
``relief_engine_core`` takes (focal shard, global row offset, full array).

For p >> n layouts a feature-sharded variant computes partial distances per
feature shard and psums the distance tiles instead (Ulysses-vs-ring duality
noted in SURVEY.md §5); that path rides the same core with
``psum_distances=True``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.relief import relief_engine_core, pack_tiles, _round_up

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(devices=None, axis_name: str = "dp") -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def sharded_relief_scores(
    x: np.ndarray,
    y: np.ndarray,
    recip: np.ndarray,
    is_discrete: np.ndarray,
    *,
    algo: str = "multisurf",
    use_star: bool = False,
    n_neighbors: int = 0,
    class_probs: np.ndarray | None = None,
    devices=None,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Relief-family scores computed data-parallel over a device mesh.

    Focal sample tiles are sharded over the mesh's single axis; X (tiled)
    is replicated so each chip sees all j-blocks; per-feature partial score
    vectors are psum-merged.  Bitwise-equal to the single-chip engine up to
    fp32 summation order of the final psum.
    """
    n, p = x.shape
    if mesh is None:
        mesh = make_mesh(devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    # Tile so the focal-block count divides the mesh.
    t = 64 if n >= 64 * ndev else max(8, _round_up(max(n // ndev, 1), 8))
    n_pad = _round_up(n, t * ndev)
    xt, yv, valid, recipf, discf = pack_tiles(
        np.asarray(x, np.float32), np.asarray(y, np.int32),
        recip, is_discrete, t=t)
    # pack_tiles pads n to a multiple of t; extend to a multiple of t*ndev.
    nb_needed = n_pad // t
    if xt.shape[0] < nb_needed:
        extra = nb_needed - xt.shape[0]
        xt = np.concatenate(
            [xt, np.zeros((extra,) + xt.shape[1:], xt.dtype)], axis=0)
        yv = np.concatenate(
            [yv, np.full((extra, t), -1, yv.dtype)], axis=0)
        valid = np.concatenate(
            [valid, np.zeros((extra, t), valid.dtype)], axis=0)

    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)
    nb = xt.shape[0]
    nb_local = nb // ndev

    @partial(jax.jit, static_argnames=("algo", "use_star", "k"))
    def _run(xt_a, yv_a, valid_a, recipf_a, discf_a, n_real, cp,
             *, algo, use_star, k):
        def local_fn(xt_f, yv_f, valid_f, xt_all, yv_all, valid_all,
                     rf, df, nr, cpl):
            row0 = jax.lax.axis_index(axis).astype(jnp.int32) * (
                nb_local * t)
            partial_scores = relief_engine_core(
                xt_f, yv_f, valid_f, row0,
                xt_all, yv_all, valid_all, rf, df, nr, cpl,
                algo=algo, use_star=use_star, k=k)
            return jax.lax.psum(partial_scores, axis)

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis),
                      P(), P(), P(), P(), P(), P(), P()),
            out_specs=P(),
            # the engine's scan carries are initialised from unvarying
            # zeros; skip the varying-manual-axes type check.
            check_vma=False,
        )(xt_a, yv_a, valid_a, xt_a, yv_a, valid_a, recipf_a, discf_a,
          n_real, cp)

    scores = _run(jnp.asarray(xt), jnp.asarray(yv), jnp.asarray(valid),
                  jnp.asarray(recipf), jnp.asarray(discf), np.float32(n),
                  jnp.asarray(class_probs, jnp.float32),
                  algo=algo, use_star=use_star, k=int(n_neighbors))
    return np.asarray(scores, np.float32)[:p] / np.float32(n)


def sharded_multisurf_scores(x, y, recip, is_discrete, *, devices=None,
                             use_star: bool = False) -> np.ndarray:
    """Convenience wrapper: data-parallel MultiSURF scoring."""
    return sharded_relief_scores(
        x, y, recip, is_discrete, algo="multisurf", use_star=use_star,
        devices=devices)
