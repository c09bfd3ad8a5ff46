"""MXU matmul engine for the Relief family on all-discrete data.

The reference's flagship benchmark (paper.md:44 — MultiSURF on a
30,000 x 200,000 synthetic SNP matrix) is all-discrete: every feature
diff is a Hamming mismatch ``1[x_if != x_jf]`` (reference
``MultiSURF.py:37-40`` discrete branch).  On TPU that reformulates both
O(n^2 p) passes as *exact integer matmuls* on the systolic array instead
of O(n^2 p) VPU elementwise work:

  encode    x[:, f] -> small-int state codes 0..S-1 (S <= discrete_limit)
  pass 1    match[i, j] = sum_f 1[x_if == x_jf]
                        = sum_c  A_c @ A_c^T,   A_c = 1[codes == c]
            D = p_pad - match    (padded features always match -> cancel)
  weights   W = sum_k r_k[:, None] * M_k   (shared (mask, coeff) rules,
            ``relief.pair_weight_rules``)
  pass 2    scores_f = sum_ij W_ij (1 - match_ijf)
                     = sum_i r_k[i] * |M_k[i]|  -  sum_ck (A_c * (M_k @ A_c) * r_k).sum(0)

Every matmul input is 0/1, so int8 x int8 -> int32 (or bf16 -> f32)
accumulation is bit-exact; the distance matrix comes out as exact integer
mismatch counts — *more* faithful to the reference CPU oracle than any
floating-point distance sum.  Per-sample normalisation (/ n_samples) is
applied by the caller, as in the generic engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .relief import pair_weight_rules, _round_up

# 0/1 matmul operand dtype: int8 feeds the MXU's int8 path (2x bf16
# throughput on v5e+); accumulation type is exact either way.
_DOT_DTYPE = jnp.int8
_ACC_DTYPE = jnp.int32


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=_ACC_DTYPE)


def _dot_t(a, b):
    """a @ b.T without materialising the transpose (contract dim 1 / 1)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=_ACC_DTYPE)


def _onehot_flat(codes_t, n_states):
    """(rows, FT) int codes -> (rows, S * FT) 0/1 one-hot, states
    concatenated along the contraction axis so a single matmul covers
    the sum over states."""
    parts = [(codes_t == c).astype(_DOT_DTYPE) for c in range(n_states)]
    return jnp.concatenate(parts, axis=1)


def encode_discrete(x: np.ndarray, f_chunk: int | None = None):
    """Per-column small-int state codes for discrete data.

    Replaces the reference's per-column ``np.unique`` encoding loop
    (``MultiSURF.py:416-420`` discreteness probe) with a device-side
    column sort: code[i, f] = rank of x[i, f] among column f's unique
    values.  Processes features in chunks so the f32 copy of X never has
    to be device-resident at once (GWAS-scale X only exists as int8/f32
    chunks in HBM).

    Returns ``(codes (n, p) int8 np.ndarray, n_states)``.
    """
    from ..utils.preprocessing import _jitted_helpers, _auto_f_chunk

    stats, encode = _jitted_helpers()
    n, p = x.shape
    if f_chunk is None:
        f_chunk = _auto_f_chunk(n)
    codes = np.empty((n, p), np.int8)

    # One device pass per chunk: per-chunk static state count gives
    # identical codes (ranks are per-column); n_states = global max.
    n_states = 1
    for f0 in range(0, p, f_chunk):
        xc = jax.device_put(np.ascontiguousarray(
            x[:, f0:f0 + f_chunk], dtype=np.float32))
        xs, newv, n_unique, _rg = stats(xc)
        s_chunk = int(np.asarray(n_unique).max(initial=1))
        codes[:, f0:f0 + f_chunk] = np.asarray(
            encode(xc, xs, newv, s=max(s_chunk, 1)))
        n_states = max(n_states, s_chunk)
    return codes, n_states


def _match_rows(ci, codes_a, ft, n_states):
    """Pass 1: exact match counts (TI, n_pad).

    States are concatenated along the contraction axis, so each
    (i-block, f-tile) step is ONE (TI, S*FT) x (n_pad, S*FT)^T matmul —
    big enough to run the MXU near peak (M >= 2048 measured ~350 T/s on
    v5e vs ~42 T/s at M = 512).
    """
    ti = ci.shape[0]
    n_pad, p_pad = codes_a.shape
    nf = p_pad // ft

    def over_f(acc, f):
        ca_t = jax.lax.dynamic_slice(codes_a, (0, f * ft), (n_pad, ft))
        ci_t = jax.lax.dynamic_slice(ci, (0, f * ft), (ti, ft))
        acc = acc + _dot_t(_onehot_flat(ci_t, n_states),
                           _onehot_flat(ca_t, n_states))
        return acc, None

    acc, _ = jax.lax.scan(over_f, jnp.zeros((ti, n_pad), _ACC_DTYPE),
                          jnp.arange(nf))
    return acc


def _accumulate_discrete(ci, codes_a, rules, ft, n_states,
                         exact_int=False):
    """Pass 2: per-feature score partials (p_pad,) via mask matmuls.

    scores_f = totalW - sum_c sum_k (A_c(i) * (M_k @ A_c) * r_k).sum(i)
    computed with states flattened into the matmul N axis: one
    (TI, n_pad) x (n_pad, S*FT) matmul per mask per f-tile.  Padded
    features always match (code 0 everywhere), so their T2 equals totalW
    and their score is exactly 0 with no masking.

    ``exact_int`` (SURF's unit +/-1 row coefficients): every term is an
    integer count, so totalW and T2 accumulate in int32 — exact where
    two large f32 sums (each ~TI*n at GWAS scale) would round before the
    small difference is taken.  Overflow-safe while TI * n < 2^31
    (rules partition disjoint pair sets, so |p_sum| <= n per entry).
    """
    ti = ci.shape[0]
    n_pad, p_pad = codes_a.shape
    nf = p_pad // ft

    masks = [m.astype(_DOT_DTYPE) for m, _ in rules]
    if exact_int:
        coeffs = [r.astype(_ACC_DTYPE) for _, r in rules]
        acc_dtype, zero = _ACC_DTYPE, jnp.int32(0)
    else:
        coeffs = [r for _, r in rules]
        acc_dtype, zero = jnp.float32, jnp.float32(0.0)
    total_w = sum(
        (r * m.sum(axis=1, dtype=_ACC_DTYPE).astype(acc_dtype)).sum()
        for m, r in zip(masks, coeffs))

    def over_f(_, f):
        ca_t = jax.lax.dynamic_slice(codes_a, (0, f * ft), (n_pad, ft))
        ci_t = jax.lax.dynamic_slice(ci, (0, f * ft), (ti, ft))
        aa = _onehot_flat(ca_t, n_states)          # (n_pad, S*FT)
        p_sum = jnp.zeros((ti, n_states * ft), acc_dtype)
        for m, r in zip(masks, coeffs):
            q = _dot(m, aa).astype(acc_dtype)      # (TI, S*FT)
            p_sum = p_sum + q * r[:, None]
        ai = _onehot_flat(ci_t, n_states)
        t2 = jnp.where(ai > 0, p_sum, zero).sum(axis=0)
        part = total_w - t2.reshape(n_states, ft).sum(axis=0)
        return None, part.astype(jnp.float32)

    _, parts = jax.lax.scan(over_f, None, jnp.arange(nf))
    return parts.reshape(p_pad)


def relief_discrete_core(codes_f, yv_f, valid_f, row0,
                         codes_a, yv_a, valid_a,
                         n_real, class_probs,
                         *, algo, use_star, k, ti, ft, n_states):
    """Scores contributed by focal samples ``codes_f`` against all samples
    ``codes_a`` — the discrete-MXU twin of ``relief.relief_engine_core``
    (same focal-shard contract for the sharded layer).

    codes_*: (n, p_pad) int8 state codes; returns (p_pad,) partials.
    """
    nf_focal = codes_f.shape[0]

    def per_block(bi):
        i0 = bi * ti
        ci = jax.lax.dynamic_slice(
            codes_f, (i0, 0), (ti, codes_f.shape[1]))
        yi = jax.lax.dynamic_slice(yv_f, (i0,), (ti,))
        vi = jax.lax.dynamic_slice(valid_f, (i0,), (ti,))
        iid = row0 + i0 + jnp.arange(ti, dtype=jnp.int32)

        match = _match_rows(ci, codes_a, ft, n_states)
        D = (jnp.int32(codes_a.shape[1]) - match).astype(jnp.float32)
        rules = pair_weight_rules(
            D, yi, vi, iid, yv_a, valid_a, n_real, class_probs,
            algo=algo, use_star=use_star, k=k)
        # SURF's coefficients are exactly +/-1 -> exact int32 pass 2
        return _accumulate_discrete(ci, codes_a, rules, ft, n_states,
                                    exact_int=(algo == "surf"))

    partials = jax.lax.map(per_block, jnp.arange(nf_focal // ti))
    return partials.sum(axis=0)


@partial(jax.jit,
         static_argnames=("algo", "use_star", "k", "ti", "ft", "n_states"))
def _relief_discrete_engine(codes, yv, valid, n_real, class_probs,
                            *, algo, use_star, k, ti, ft, n_states):
    return relief_discrete_core(
        codes, yv, valid, jnp.int32(0), codes, yv, valid,
        n_real, class_probs,
        algo=algo, use_star=use_star, k=k, ti=ti, ft=ft, n_states=n_states)


@partial(jax.jit,
         static_argnames=("algo", "use_star", "k", "ti", "ft", "n_states"))
def _relief_discrete_block(codes, yv, valid, b, n_real, class_probs,
                           *, algo, use_star, k, ti, ft, n_states):
    """One focal block's score partials — the host-streamed variant.

    At GWAS scale a monolithic fit is one multi-minute device dispatch;
    streaming one block per dispatch bounds kernel runtime (some
    runtimes kill very long dispatches) and measured slightly FASTER at
    ~100k samples (better scheduling of the per-block kernels)."""
    ci = jax.lax.dynamic_slice(codes, (b * ti, 0),
                               (ti, codes.shape[1]))
    yi = jax.lax.dynamic_slice(yv, (b * ti,), (ti,))
    vi = jax.lax.dynamic_slice(valid, (b * ti,), (ti,))
    return relief_discrete_core(
        ci, yi, vi, b * ti, codes, yv, valid, n_real, class_probs,
        algo=algo, use_star=use_star, k=k, ti=ti, ft=ft,
        n_states=n_states)


def _discrete_tile_sizes(n: int, p: int, n_states: int):
    """(TI focal block, FT feature tile).

    TI >= 4096 keeps the MXU near peak (M-dim measurement above); FT is
    sized so the (n_pad, S*FT) one-hot temporary stays ~128 MB.
    """
    ti = 4096 if n >= 4096 else _round_up(max(n, 1), 8)
    s = max(n_states, 2)
    budget = 128 * 1024 * 1024  # bytes for the (n, S*FT) one-hot tile
    ft_max = max(128, min(8192, budget // max(n * s, 1)))
    p128 = _round_up(max(p, 1), 128)
    n_tiles = -(-p128 // ft_max)
    ft = _round_up(-(-p128 // n_tiles), 128)  # even tiles, < 128*n_tiles pad
    return ti, ft


def pack_discrete(codes: np.ndarray, y: np.ndarray, n_states: int = 2,
                  ti: int | None = None, ft: int | None = None):
    """Zero-pad codes/y/validity to (TI, FT) multiples.

    Padded features are all state 0 (always match -> zero score);
    padded samples get y = -1 and validity 0.
    """
    n, p = codes.shape
    ti0, ft0 = _discrete_tile_sizes(n, p, n_states)
    ti = ti or ti0
    ft = ft or ft0
    n_pad = _round_up(n, ti)
    p_pad = _round_up(p, ft)
    # jnp in / jnp out: device-resident codes stay in HBM (the reference
    # re-uploads X every fit, MultiSURF.py:423-425; here large X is padded
    # in place on device).  The pad runs under jit — eager jnp ops are
    # pathologically slow on some installs.
    if isinstance(codes, jax.Array):
        if n_pad == n and p_pad == p:
            # identity pad would still copy the (possibly 10+ GB) code
            # matrix on device — skip it entirely
            yv = np.full((n_pad,), -1, np.int32)
            yv[:n] = y
            valid = np.ones((n_pad,), np.float32)
            return codes, yv, valid, (ti, ft)
        cpad, yv, valid = _pad_device(codes, jnp.asarray(y, jnp.int32),
                                      n_pad=n_pad, p_pad=p_pad)
    else:
        cpad = np.pad(codes, ((0, n_pad - n), (0, p_pad - p)))
        yv = np.pad(np.asarray(y, np.int32), (0, n_pad - n),
                    constant_values=-1)
        valid = np.pad(np.ones((n,), np.float32), (0, n_pad - n))
    return cpad, yv, valid, (ti, ft)


@partial(jax.jit, static_argnames=("n_pad", "p_pad"))
def _pad_device(codes, y, *, n_pad, p_pad):
    n, p = codes.shape
    cpad = jnp.pad(codes, ((0, n_pad - n), (0, p_pad - p)))
    yv = jnp.pad(y, (0, n_pad - n), constant_values=-1)
    valid = jnp.pad(jnp.ones((n,), jnp.float32), (0, n_pad - n))
    return cpad, yv, valid


def relief_discrete_scores(
    x: np.ndarray,
    y: np.ndarray,
    *,
    algo: str,
    use_star: bool = False,
    n_neighbors: int = 0,
    class_probs: np.ndarray | None = None,
    device=None,
    codes: np.ndarray | None = None,
    n_states: int | None = None,
    ti: int | None = None,
    ft: int | None = None,
) -> np.ndarray:
    """Relief-family scores for all-discrete X (already / n_samples).

    ``codes``/``n_states`` can be passed directly (e.g. int8 genotype
    matrices that are already 0..S-1) to skip the encoding pass.
    ``ti``/``ft`` override the focal-block and feature-tile sizes (pick
    shapes (n, p) that are exact multiples to avoid any padding copy of
    a HBM-resident code matrix).
    """
    from ..utils.backend import execution_context
    from ..utils.logging import phase

    n, p = x.shape if x is not None else codes.shape
    with execution_context(device):
        if codes is None:
            with phase("relief_discrete.encode", work=n * p):
                codes, n_states = encode_discrete(np.asarray(x))
        elif n_states is None:
            n_states = int(np.max(codes)) + 1
        if not isinstance(codes, jax.Array) and device is not None \
                and device.platform != "cpu":
            # Uncommitted device_put once (lands on the default device set
            # by execution_context), then pad on device.  Every other
            # transfer route measured catastrophically slower here:
            # committed device_put(x, dev) ~25x slower, eager
            # jnp.asarray > 1000x slower, jit-argument transfer ~30x.
            codes = jax.device_put(np.asarray(codes, np.int8))
        cpad, yv, valid, (ti, ft) = pack_discrete(
            codes, np.asarray(y, np.int32), int(n_states), ti=ti, ft=ft)
        if class_probs is None:
            class_probs = np.zeros((1,), np.float32)
        kw = dict(algo=algo, use_star=use_star, k=int(n_neighbors),
                  ti=ti, ft=ft, n_states=int(n_states))
        cp = np.asarray(class_probs, np.float32)
        n_blocks = cpad.shape[0] // ti
        with phase(f"relief_discrete.engine[{algo}]",
                   work=float(n) * n * p):
            if n_blocks >= 16:
                # stream one focal block per dispatch (see
                # _relief_discrete_block); cross-block partials sum in
                # f64 on host so GWAS-scale accumulations don't round
                scores = np.zeros((cpad.shape[1],), np.float64)
                for b in range(n_blocks):
                    scores += np.asarray(_relief_discrete_block(
                        cpad, yv, valid, jnp.int32(b), np.float32(n),
                        cp, **kw), np.float32)
                scores = scores.astype(np.float32)
            else:
                scores = np.asarray(_relief_discrete_engine(
                    cpad, yv, valid, np.float32(n), cp, **kw),
                    np.float32)
    return scores[:p] / np.float32(n)
