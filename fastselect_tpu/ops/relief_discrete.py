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


# ---------------------------------------------------------------------------
# Bit-packed transfer: small-cardinality codes cross the host->device
# boundary at 2 or 4 bits per value (4x / 2x fewer bytes than int8) and
# unpack on device under jit.  The H2D link is the end-to-end bottleneck
# for GWAS-scale fits (reference re-uploads X per fit at full width,
# ``MultiSURF.py:423-425``); SNP codes {0,1,2} need only 2 bits.
# ---------------------------------------------------------------------------

def _pack_codes(codes: np.ndarray, n_states: int):
    """(packed uint8 (n, ceil(p/per)), bits) or None when n_states > 16.

    Values are packed little-endian within each byte; trailing slots of
    the last byte pack value 0 (which unpacks to harmless state-0 pad
    columns)."""
    if n_states <= 4:
        bits = 2
    elif n_states <= 16:
        bits = 4
    else:
        return None
    per = 8 // bits
    n, p = codes.shape
    pb = -(-p // per)
    u = codes.astype(np.uint8, copy=False)
    if p == pb * per and u.flags.c_contiguous:
        # contiguous reshape view: ~1.4x faster than strided column
        # slices at GWAS size (measured 2.6 s vs 3.7 s per 1.5 GB)
        v = u.reshape(n, pb, per)
        packed = v[:, :, 0].copy()
        for i in range(1, per):
            packed |= v[:, :, i] << np.uint8(bits * i)
        return packed, bits
    packed = np.zeros((n, pb), np.uint8)
    for i in range(per):
        cols = u[:, i::per]
        packed[:, :cols.shape[1]] |= cols << np.uint8(bits * i)
    return packed, bits


def _pack_codes_planes(codes: np.ndarray, n_states: int):
    """Global-plane packing for FULL-matrix staging: byte column j holds
    features {j, pb+j, 2*pb+j, ...}, so the device unpack is a plain
    shift-mask-concat in natural feature order — no interleave relayout
    (stack+reshape lowers to slow lane shuffles on TPU).  Host packing
    reads contiguous plane slices (faster than strided columns too)."""
    if n_states <= 4:
        bits = 2
    elif n_states <= 16:
        bits = 4
    else:
        return None
    per = 8 // bits
    n, p = codes.shape
    pb = -(-p // per)
    u = codes.astype(np.uint8, copy=False)
    packed = np.zeros((n, pb), np.uint8)
    for i in range(per):
        pl = u[:, i * pb:(i + 1) * pb]
        packed[:, :pl.shape[1]] |= pl << np.uint8(bits * i)
    return packed, bits


@partial(jax.jit, static_argnames=("bits", "p"))
def _unpack_codes_planes(packed, *, bits, p):
    """Device twin of :func:`_pack_codes_planes`: (n, p) int8 codes in
    natural feature order via contiguous plane concatenation."""
    per = 8 // bits
    mask = jnp.uint8((1 << bits) - 1)
    parts = [((packed >> jnp.uint8(bits * i)) & mask).astype(jnp.int8)
             for i in range(per)]
    out = jnp.concatenate(parts, axis=1)
    return out if out.shape[1] == p else out[:, :p]


def stage_codes_device(codes: np.ndarray, n_states: int):
    """Move host codes into HBM with the fewest bytes over the link:
    bit-packed for n_states <= 16, raw int8 otherwise.  Returns a device
    int8 array shaped like ``codes``."""
    codes = np.asarray(codes, np.int8)
    packed = _pack_codes_planes(codes, int(n_states))
    if packed is None:
        return jax.device_put(codes)
    pk, bits = packed
    return _unpack_codes_planes(jax.device_put(pk), bits=bits,
                                p=codes.shape[1])


class PackedCodes:
    """Code matrix resident in HBM in bit-packed form.

    At GWAS scale the unpacked int8 matrix (e.g. 6 GB at 30k x 200k,
    9.1 GB at the north-star) crowds HBM; the gather-mode v2 engine can
    instead keep only the packed form (4x smaller at 2 bits) and unpack
    each (n, ft) feature window on the fly inside jit — HBM residency
    drops to packed + O(window) transients."""

    __slots__ = ("packed", "bits", "n", "p", "consumed")

    def __init__(self, packed, bits: int, n: int, p: int):
        self.packed = packed  # (n, ceil(p / (8//bits))) uint8 device
        self.bits = bits
        self.n = n
        self.p = p
        self.consumed = False

    def consume(self):
        """Free the packed HBM buffer and mark this object SPENT.

        The promote path of the v2 engine calls this after unpacking
        (at promote scale, freeing the packed copy is the difference
        between fitting HBM and RESOURCE_EXHAUSTED).  A consumed
        PackedCodes cannot be reused — re-stage with
        :func:`stage_codes_packed`.  Engines check this flag and raise
        a clear error instead of letting a deleted-buffer RuntimeError
        surface from deep inside jit dispatch."""
        self.packed.delete()
        self.consumed = True

    def check_live(self):
        if self.consumed:
            raise RuntimeError(
                "this PackedCodes was consumed by a previous fit (its "
                "packed HBM buffer was freed by the promote path); "
                "re-stage the matrix with stage_codes_packed() before "
                "fitting again")

    @property
    def per(self) -> int:
        return 8 // self.bits

    @property
    def p_eff(self) -> int:
        """Unpacked width (>= p; the overhang decodes to state-0 pad
        features, which always match and score exactly 0)."""
        return self.packed.shape[1] * self.per


def stage_codes_packed(codes: np.ndarray, n_states: int):
    """PackedCodes when the cardinality allows, else a plain device
    int8 array (same contract as :func:`stage_codes_device`)."""
    codes = np.asarray(codes, np.int8)
    pk = _pack_codes(codes, int(n_states))
    if pk is None:
        return jax.device_put(codes)
    return PackedCodes(jax.device_put(pk[0]), pk[1], *codes.shape)


def stage_codes_sharded(codes: np.ndarray, n_states: int, mesh,
                        *, shard_axis: int):
    """Shard-wise packed staging for the mesh layouts.

    The host matrix is bit-packed (2/4 bits per value when the
    cardinality allows) and ``device_put`` with a ``NamedSharding`` so
    each device receives ONLY its own packed shard — the unpacked (n, p)
    matrix never materialises on any single device, which the old
    stage-on-one-chip path violated at exactly the scales the ring
    layout exists for (it is auto-selected when codes exceed the
    replication budget).  Consumers unpack their shard inside their
    shard_map with :func:`_unpack_codes_planes`.

    shard_axis 0 shards sample rows (ring layout: plane packing is
    row-separable, pack once); shard_axis 1 shards feature columns
    (feature-shard layout: each column shard packs independently so its
    plane layout is self-contained).  Shard extents must divide the
    padded axis (both callers construct them that way).

    Returns (staged_device_array, bits); bits == 0 means packing was
    unavailable (n_states > 16) and the staged array is raw int8,
    still shard-wise.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    codes = np.asarray(codes, np.int8)
    ndev = mesh.devices.size
    if codes.shape[shard_axis] % ndev:
        raise ValueError(
            f"stage_codes_sharded: axis {shard_axis} extent "
            f"{codes.shape[shard_axis]} is not divisible by the "
            f"{ndev}-device mesh — pad before staging (a non-divisible "
            f"feature axis would silently drop the trailing columns)")
    axis_name = mesh.axis_names[0]
    spec = P(axis_name, None) if shard_axis == 0 else P(None, axis_name)
    sharding = NamedSharding(mesh, spec)
    if shard_axis == 0:
        pk = _pack_codes_planes(codes, int(n_states))
        if pk is None:
            return jax.device_put(codes, sharding), 0
        return jax.device_put(pk[0], sharding), pk[1]
    p = codes.shape[1]
    pb = p // ndev
    packs = []
    bits = 0
    for d in range(ndev):
        pk = _pack_codes_planes(
            np.ascontiguousarray(codes[:, d * pb:(d + 1) * pb]),
            int(n_states))
        if pk is None:
            return jax.device_put(codes, sharding), 0
        packs.append(pk[0])
        bits = pk[1]
    return jax.device_put(np.concatenate(packs, axis=1), sharding), bits


def _codes_window(codes_a, off, ft, bits):
    """(n, ft) int8 window starting at feature ``off`` (traced), from a
    plain int8 matrix (bits=0) or a bit-packed one (off must be a
    multiple of 8//bits).

    Packed windows unpack in PLANE layout — the per planes concatenated
    along the feature axis (local position i * (ft//per) + j holds
    original feature off + j*per + i).  A natural-order unpack would be
    a stack+reshape interleave, which lowers to slow lane shuffles on
    TPU; plane concat is contiguous.  Pass 1 sums over features (order
    irrelevant) and pass 2 callers remap scores host-side
    (:func:`_plane_to_natural`)."""
    n_rows = codes_a.shape[0]
    if bits == 0:
        return jax.lax.dynamic_slice(codes_a, (0, off), (n_rows, ft))
    per = 8 // bits
    win = jax.lax.dynamic_slice(codes_a, (0, off // per),
                                (n_rows, ft // per))
    mask = jnp.uint8((1 << bits) - 1)
    parts = [((win >> jnp.uint8(bits * i)) & mask).astype(jnp.int8)
             for i in range(per)]
    return jnp.concatenate(parts, axis=1)


def _plane_to_natural(vec: np.ndarray, per: int) -> np.ndarray:
    """Host-side inverse of the plane layout for one window's
    per-feature outputs: position i*(ft//per)+j -> feature j*per+i."""
    ftp = vec.shape[0] // per
    return np.asarray(vec).reshape(per, ftp).T.reshape(-1)


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


# ---------------------------------------------------------------------------
# v2 engine: class-sorted layout + segment-restricted pass 2 (+ symmetric
# pass 1 with a precomputed one-hot for moderate n)
#
# Every Relief rule's pair support lives inside ONE class of j-columns
# (hits: the focal class; per-class misses: that class) or its
# complement.  Stable-sorting samples by class (NO extra padding —
# n_pad stays the v1 value) makes almost every focal block single-class,
# so pass 2 contracts each rule only over its support segment: total
# contraction per focal row drops from R*n to exactly n columns (R =
# number of rules) — 2x fewer MXU flops for MultiSURF, 3x for
# MultiSURF*, (C+1)x for ReliefF.  The <= C-1 blocks straddling a class
# boundary contract full-span instead.  Rules with exactly opposite row
# coefficients on the same support (near/far pairs of the * variants)
# additionally combine into a single {-1,0,1} int8 operand before the
# matmul.
# ---------------------------------------------------------------------------

def _class_sorted_layout(y, ti):
    """Host-side layout for the class-sorted engines.

    Samples are stable-sorted by class with NO inter-class padding —
    n_pad is identical to the unsorted engine's, so v2 never does more
    row work than v1.  Returns (classes, perm, segments, block_class,
    n_pad) where ``segments[c] = (col0, ncols)`` is class c's exact
    j-column slice (plan entries may SUM several segments, so slices
    must be disjoint — no alignment rounding) and ``block_class[b]`` is
    the class POSITION of focal block b, or None when the block
    straddles a class boundary (a "mixed" block, which contracts over
    the full column span instead — at most C-1 of them exist).
    """
    y = np.asarray(y)
    n = y.shape[0]
    classes, counts = np.unique(y, return_counts=True)
    perm = np.argsort(y, kind="stable")
    n_pad = _round_up(n, ti)
    bounds = np.concatenate([[0], np.cumsum(counts)]).astype(int)
    segments = [(int(bounds[c]), int(counts[c]))
                for c in range(len(classes))]
    block_class = []
    for b in range(n_pad // ti):
        r0, r1 = b * ti, min((b + 1) * ti, n)
        if r0 >= n:
            block_class.append(len(classes) - 1)  # all-padding block
            continue
        c0 = int(np.searchsorted(bounds, r0, side="right") - 1)
        c1 = int(np.searchsorted(bounds, r1 - 1, side="right") - 1)
        block_class.append(c0 if c0 == c1 else None)
    return classes, perm, segments, block_class, n_pad


def _apply_layout_host(codes, y, perm, n_pad, p_pad):
    """Gather host codes into the class-sorted padded layout."""
    n, p = codes.shape
    cpad = np.zeros((n_pad, p_pad), np.int8)
    cpad[:n, :p] = codes[perm]
    yv = np.full((n_pad,), -1, np.int32)
    yv[:n] = y[perm]
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    return cpad, yv, valid


@partial(jax.jit, static_argnames=("n_pad", "p_pad"))
def _apply_layout_device(codes, gather_idx, row_valid, *, n_pad, p_pad):
    """Device twin of ``_apply_layout_host`` for HBM-resident codes:
    one gather + mask, padded feature columns appended."""
    n, p = codes.shape
    rows = jnp.where(row_valid[:, None] > 0,
                     jnp.take(codes, gather_idx, axis=0,
                              mode="clip"), jnp.int8(0))
    return jnp.pad(rows, ((0, 0), (0, p_pad - p)))


def _plan_segments(algo, use_star, classes, focal_class_pos):
    """Static pass-2 matmul plan for one focal block.

    Returns a list of (rule_spec, seg_positions) where rule_spec names
    how to build the int8 operand and its row coefficient from the
    runtime rules list:
      'hit'      rules[0]          coeff rules[0].r
      'miss'     rules[1] (- rules[2] when star)   coeff rules[1].r
      'surf_hit' -near_hit (+far_hit when star)    exact +/-1
      'surf_miss' near_miss (-far_miss when star)  exact +/-1
      ('relieff', c)  rules[1 + c]  coeff rules[1 + c].r
    Position ``len(classes)`` denotes the full column span — used by
    MIXED focal blocks (class-boundary straddlers), whose hit/miss
    supports span several classes.  ReliefF's per-class miss supports
    depend only on the J side, so they stay restricted even for mixed
    blocks.
    """
    n_cls = len(classes)
    full = [n_cls]
    mixed = focal_class_pos is None
    same = full if mixed else [focal_class_pos]
    other = (full if mixed
             else [i for i in range(n_cls) if i != focal_class_pos])
    if algo == "multisurf":
        return [("hit", same), ("miss", other)]
    if algo == "surf":
        return [("surf_hit", same), ("surf_miss", other)]
    if algo == "relieff":
        plan = [("hit", same)]
        for pos, c in enumerate(classes):
            if mixed or pos != focal_class_pos:
                plan.append((("relieff", int(c)), [pos]))
        return plan
    raise ValueError(algo)  # pragma: no cover


def _plan_operand(spec, rules, use_star):
    """(matrix (TI, n_pad), row_coeff (TI,) | None) for one plan entry.

    A None coefficient marks the exact-int path (operand already carries
    the +/-1 signs; accumulate in int32)."""
    if spec == "hit":
        m, r = rules[0]
        return m.astype(_DOT_DTYPE), r
    if spec == "miss":
        m, r = rules[1]
        mat = m.astype(_DOT_DTYPE)
        if use_star:
            # far-miss coefficient is exactly -r: fold the sign in
            mat = mat - rules[2][0].astype(_DOT_DTYPE)
        return mat, r
    if spec == "surf_hit":
        mat = -rules[1][0].astype(_DOT_DTYPE)          # near hits, -1
        if use_star:
            mat = mat + rules[2][0].astype(_DOT_DTYPE)  # far hits, +1
        return mat, None
    if spec == "surf_miss":
        mat = rules[0][0].astype(_DOT_DTYPE)           # near misses, +1
        if use_star:
            mat = mat - rules[3][0].astype(_DOT_DTYPE)  # far misses, -1
        return mat, None
    c = spec[1]
    m, r = rules[1 + c]
    return m.astype(_DOT_DTYPE), r


def _accumulate_plan(ci, codes_a, rules, plan, seg_starts, seg_lens,
                     ft, n_states, use_star, onehot_a=None):
    """Segment-restricted pass 2: (p_pad,) score partials.

    For each plan entry, the int8 operand is column-sliced to its
    support segments and contracted only against those rows of the
    one-hot — total contraction length is exactly n_pad across ALL
    entries (vs rules x n_pad for the unrestricted pass).  ``onehot_a``
    optionally supplies the precomputed (n_pad, nf * S * ft) one-hot.
    """
    ti = ci.shape[0]
    n_pad, p_pad = codes_a.shape
    nf = p_pad // ft
    sft = n_states * ft

    # accumulator dtype: int32 exactly when every entry is exact-int
    # (SURF / SURF*, whose +/-1 signs live inside the operand) AND the
    # row-summed accumulations |t2| <= TI * n stay inside int32; beyond
    # that fall back to f32 accumulation (each per-matmul q <= n is
    # still exact int32)
    all_int = (all(spec in ("surf_hit", "surf_miss") for spec, _ in plan)
               and ti * n_pad < 2 ** 31)
    acc_dtype = _ACC_DTYPE if all_int else jnp.float32
    zero = jnp.int32(0) if all_int else jnp.float32(0.0)

    operands = [(_plan_operand(spec, rules, use_star), segs)
                for spec, segs in plan]

    # total_w from the ORIGINAL full rules (mask row-sums), as before
    if all_int:
        coeffs = [r.astype(_ACC_DTYPE) for _, r in rules]
    else:
        coeffs = [r for _, r in rules]
    total_w = sum(
        (r * m.sum(axis=1, dtype=_ACC_DTYPE).astype(acc_dtype)).sum()
        for (m, _), r in zip(rules, coeffs))

    def over_f(_, f):
        ci_t = jax.lax.dynamic_slice(ci, (0, f * ft), (ti, ft))
        p_sum = jnp.zeros((ti, sft), acc_dtype)
        for (mat, coeff), segs in operands:
            q = jnp.zeros((ti, sft), _ACC_DTYPE)
            for pos in segs:
                s0, sl = seg_starts[pos], seg_lens[pos]
                m_seg = jax.lax.dynamic_slice(mat, (0, s0), (ti, sl))
                if onehot_a is not None:
                    aa = jax.lax.dynamic_slice(
                        onehot_a, (s0, f * sft), (sl, sft))
                else:
                    ca_t = jax.lax.dynamic_slice(
                        codes_a, (s0, f * ft), (sl, ft))
                    aa = _onehot_flat(ca_t, n_states)
                q = q + _dot(m_seg, aa)
            if coeff is None:
                p_sum = p_sum + q.astype(acc_dtype)
            else:
                p_sum = p_sum + q.astype(jnp.float32) * coeff[:, None]
        ai = _onehot_flat(ci_t, n_states)
        t2 = jnp.where(ai > 0, p_sum, zero).sum(axis=0)
        part = total_w - t2.reshape(n_states, ft).sum(axis=0)
        return None, part.astype(jnp.float32)

    _, parts = jax.lax.scan(over_f, None, jnp.arange(nf))
    return parts.reshape(p_pad)


def _match_rows_raw(ci, codes_a, ft, n_states, bits=0):
    """Pass 1 over an UNPADDED feature axis: full ft tiles + one ragged
    tail matmul (the huge-device-codes path cannot column-pad a copy).
    With ``bits`` set, BOTH ``codes_a`` and ``ci`` are bit-packed and
    each window unpacks on the fly in plane layout — match counts sum
    over features, so the layout cancels as long as both sides share
    it."""
    n_raw = codes_a.shape[0]
    ti = ci.shape[0]
    per = 8 // bits if bits else 1
    p_raw = codes_a.shape[1] * per
    nf = p_raw // ft

    def over_f(acc, f):
        ca_t = _codes_window(codes_a, f * ft, ft, bits)
        ci_t = _codes_window(ci, f * ft, ft, bits)
        acc = acc + _dot_t(_onehot_flat(ci_t, n_states),
                           _onehot_flat(ca_t, n_states))
        return acc, None

    acc = jnp.zeros((ti, n_raw), _ACC_DTYPE)
    if nf:
        acc, _ = jax.lax.scan(over_f, acc, jnp.arange(nf))
    tail = p_raw - nf * ft
    if tail:
        ca_t = _codes_window(codes_a, nf * ft, tail, bits)
        ci_t = _codes_window(ci, nf * ft, tail, bits)
        acc = acc + _dot_t(_onehot_flat(ci_t, n_states),
                           _onehot_flat(ca_t, n_states))
    return acc


def _accumulate_plan_gather(ci, codes_a, rules, plan, idx_arrays, padvs,
                            offs, ft, n_states, use_star, bits=0):
    """Gather-mode twin of ``_accumulate_plan`` for UNSORTED j-columns.

    At GWAS scale a sorted copy of the device code matrix does not fit
    HBM next to the original (9 GB each on a 16 GB chip) — so the j side
    stays in original order and each class segment is materialised per
    f-window by GATHERING its rows/columns (``idx_arrays[pos]``; pad
    entries are killed by ``padvs[pos]``).  ``offs`` are ft-wide window
    start columns; the last window may OVERLAP the previous one to cover
    a ragged feature tail (per-feature scores are window-independent, so
    overlapped features just recompute identically).
    """
    ti = ci.shape[0]
    n_raw = codes_a.shape[0]
    sft = n_states * ft

    # int32 accumulation bound: see _accumulate_plan
    all_int = (all(spec in ("surf_hit", "surf_miss") for spec, _ in plan)
               and ti * n_raw < 2 ** 31)
    acc_dtype = _ACC_DTYPE if all_int else jnp.float32
    zero = jnp.int32(0) if all_int else jnp.float32(0.0)
    operands = [(_plan_operand(spec, rules, use_star), segs)
                for spec, segs in plan]
    if all_int:
        coeffs = [r.astype(_ACC_DTYPE) for _, r in rules]
    else:
        coeffs = [r for _, r in rules]
    total_w = sum(
        (r * m.sum(axis=1, dtype=_ACC_DTYPE).astype(acc_dtype)).sum()
        for (m, _), r in zip(rules, coeffs))
    n_cls = len(idx_arrays)

    # hoist the window-invariant mask column-gathers OUT of the f-scan
    # (a (TI, n) column gather per window would dominate the runtime)
    staged = []
    for (mat, coeff), segs in operands:
        parts_m = []
        for pos in segs:
            if pos == n_cls:  # full span
                parts_m.append((mat, None))
            else:
                idx, pv = idx_arrays[pos], padvs[pos]
                parts_m.append(
                    (jnp.take(mat, idx, axis=1) * pv[None, :], idx))
        staged.append((parts_m, coeff))

    def over_f(_, off):
        ci_t = _codes_window(ci, off, ft, bits)
        ca_t = _codes_window(codes_a, off, ft, bits)
        p_sum = jnp.zeros((ti, sft), acc_dtype)
        for parts_m, coeff in staged:
            q = jnp.zeros((ti, sft), _ACC_DTYPE)
            for m_seg, idx in parts_m:
                if idx is None:
                    q = q + _dot(m_seg, _onehot_flat(ca_t, n_states))
                else:
                    cseg = jnp.take(ca_t, idx, axis=0)
                    q = q + _dot(m_seg, _onehot_flat(cseg, n_states))
            if coeff is None:
                p_sum = p_sum + q.astype(acc_dtype)
            else:
                p_sum = p_sum + q.astype(jnp.float32) * coeff[:, None]
        ai = _onehot_flat(ci_t, n_states)
        t2 = jnp.where(ai > 0, p_sum, zero).sum(axis=0)
        part = total_w - t2.reshape(n_states, ft).sum(axis=0)
        return None, part.astype(jnp.float32)

    _, parts = jax.lax.scan(over_f, None, offs)
    return parts  # (n_windows, ft)


@partial(jax.jit, static_argnames=(
    "algo", "use_star", "k", "ft", "n_states", "plan", "bits"))
def _relief_discrete_block_v2g(cpad, yv, valid, sidx, yi, vi, iid,
                               n_real, class_probs, idx_arrays, padvs,
                               offs, *, algo, use_star, k, ft, n_states,
                               plan, bits=0):
    """One virtually-sorted focal block against the UNSORTED, UNPADDED
    code matrix (the huge-device-codes streamed path: no sorted or
    padded copy exists — focal rows and class segments are gathered).
    ``bits`` > 0 means ``cpad`` stays bit-packed in HBM; the focal rows
    are gathered packed and every (n, ft) window unpacks on the fly in
    plane layout (the pad features decoded from byte overhang always
    match -> exact-zero score, and they cancel in D like any padded
    feature)."""
    per = 8 // bits if bits else 1
    p_eff = cpad.shape[1] * per
    ci = jnp.take(cpad, sidx, axis=0)
    match = _match_rows_raw(ci, cpad, ft, n_states, bits=bits)
    D = (jnp.int32(p_eff) - match).astype(jnp.float32)
    rules = pair_weight_rules(
        D, yi, vi, iid, yv, valid, n_real, class_probs,
        algo=algo, use_star=use_star, k=k)
    return _accumulate_plan_gather(ci, cpad, rules, plan, idx_arrays,
                                   padvs, offs, ft, n_states, use_star,
                                   bits=bits)


def _block_scores_v2(ci, yi, vi, iid, codes_a, yv_a, valid_a, n_real,
                     class_probs, *, algo, use_star, k, ft, n_states,
                     plan, seg_starts, seg_lens, match=None,
                     onehot_a=None):
    """Scores contributed by ONE single-class focal block (v2 path)."""
    if match is None:
        match = _match_rows(ci, codes_a, ft, n_states)
    D = (jnp.int32(codes_a.shape[1]) - match).astype(jnp.float32)
    rules = pair_weight_rules(
        D, yi, vi, iid, yv_a, valid_a, n_real, class_probs,
        algo=algo, use_star=use_star, k=k)
    return _accumulate_plan(ci, codes_a, rules, plan, seg_starts,
                            seg_lens, ft, n_states, use_star,
                            onehot_a=onehot_a)


@partial(jax.jit, static_argnames=(
    "algo", "use_star", "k", "ti", "ft", "n_states", "plan",
    "seg_starts", "seg_lens"))
def _relief_discrete_block_v2(cpad, yv, valid, b, n_real, class_probs,
                              *, algo, use_star, k, ti, ft, n_states,
                              plan, seg_starts, seg_lens):
    """One focal block, streamed from host (v2: static per-class plan)."""
    ci = jax.lax.dynamic_slice(cpad, (b * ti, 0), (ti, cpad.shape[1]))
    yi = jax.lax.dynamic_slice(yv, (b * ti,), (ti,))
    vi = jax.lax.dynamic_slice(valid, (b * ti,), (ti,))
    iid = b * ti + jnp.arange(ti, dtype=jnp.int32)
    return _block_scores_v2(
        ci, yi, vi, iid, cpad, yv, valid, n_real, class_probs,
        algo=algo, use_star=use_star, k=k, ft=ft, n_states=n_states,
        plan=plan, seg_starts=seg_starts, seg_lens=seg_lens)


@partial(jax.jit, static_argnames=(
    "algo", "use_star", "k", "ti", "ft", "n_states", "plans",
    "seg_starts", "seg_lens", "class_blocks"))
def _relief_discrete_engine_v2(cpad, yv, valid, n_real, class_probs,
                               *, algo, use_star, k, ti, ft, n_states,
                               plans, seg_starts, seg_lens, class_blocks):
    """Monolithic v2 engine: per-class lax.map over that class's focal
    blocks (the plan — hence the traced graph — is uniform within a
    class)."""
    p_pad = cpad.shape[1]
    total = jnp.zeros((p_pad,), jnp.float32)
    for plan, blocks in zip(plans, class_blocks):
        def per_block(b, plan=plan):
            ci = jax.lax.dynamic_slice(cpad, (b * ti, 0), (ti, p_pad))
            yi = jax.lax.dynamic_slice(yv, (b * ti,), (ti,))
            vi = jax.lax.dynamic_slice(valid, (b * ti,), (ti,))
            iid = b * ti + jnp.arange(ti, dtype=jnp.int32)
            return _block_scores_v2(
                ci, yi, vi, iid, cpad, yv, valid, n_real, class_probs,
                algo=algo, use_star=use_star, k=k, ft=ft,
                n_states=n_states, plan=plan, seg_starts=seg_starts,
                seg_lens=seg_lens)

        parts = jax.lax.map(per_block,
                            jnp.asarray(blocks, jnp.int32))
        total = total + parts.sum(axis=0)
    return total


@partial(jax.jit, static_argnames=("ft", "n_states"))
def _build_onehot(cpad, *, ft, n_states):
    """Precomputed one-hot, tile-major: (n_pad, nf * S * ft) int8 with
    f-tile t's states at columns [t * S * ft, (t + 1) * S * ft)."""
    n_pad, p_pad = cpad.shape
    nf = p_pad // ft

    def per_tile(f):
        ct = jax.lax.dynamic_slice(cpad, (0, f * ft), (n_pad, ft))
        return _onehot_flat(ct, n_states)

    tiles = jax.lax.map(per_tile, jnp.arange(nf))  # (nf, n_pad, S*ft)
    return tiles.transpose(1, 0, 2).reshape(n_pad, nf * n_states * ft)


@partial(jax.jit, static_argnames=("ti", "ft", "n_states", "pairs"))
def _match_matrix_sym(onehot_a, *, ti, ft, n_states, pairs):
    """Full (n_pad, n_pad) match-count matrix from the upper block
    triangle only — match is symmetric, so block (bj, bi) is the
    transpose of (bi, bj) (diagonal blocks are their own transpose).
    ~1.6x fewer pass-1 MXU flops at 4-6 blocks."""
    n_pad = onehot_a.shape[0]
    scols = onehot_a.shape[1]
    sft = n_states * ft
    nf = scols // sft

    def step(M, pair):
        bi, bj = pair[0], pair[1]
        ai = jax.lax.dynamic_slice(onehot_a, (bi * ti, 0), (ti, scols))
        aj = jax.lax.dynamic_slice(onehot_a, (bj * ti, 0), (ti, scols))

        def over_f(acc, f):
            xi = jax.lax.dynamic_slice(ai, (0, f * sft), (ti, sft))
            xj = jax.lax.dynamic_slice(aj, (0, f * sft), (ti, sft))
            return acc + _dot_t(xi, xj), None

        blk, _ = jax.lax.scan(over_f, jnp.zeros((ti, ti), _ACC_DTYPE),
                              jnp.arange(nf))
        M = jax.lax.dynamic_update_slice(M, blk, (bi * ti, bj * ti))
        M = jax.lax.dynamic_update_slice(M, blk.T, (bj * ti, bi * ti))
        return M, None

    M0 = jnp.zeros((n_pad, n_pad), _ACC_DTYPE)
    M, _ = jax.lax.scan(step, M0, jnp.asarray(pairs, jnp.int32))
    return M


@partial(jax.jit, static_argnames=(
    "algo", "use_star", "k", "ti", "ft", "n_states", "plans",
    "seg_starts", "seg_lens", "class_blocks"))
def _relief_discrete_engine_sym(cpad, yv, valid, n_real, class_probs,
                                *, algo, use_star, k, ti, ft, n_states,
                                plans, seg_starts, seg_lens,
                                class_blocks):
    """Symmetric monolithic v2: one-hot precomputed once, pass 1 over the
    block triangle, segment-restricted pass 2 reading the shared
    one-hot."""
    n_pad, p_pad = cpad.shape
    nb = n_pad // ti
    pairs = tuple((bi, bj) for bi in range(nb) for bj in range(bi, nb))
    A = _build_onehot(cpad, ft=ft, n_states=n_states)
    M = _match_matrix_sym(A, ti=ti, ft=ft, n_states=n_states,
                          pairs=pairs)

    total = jnp.zeros((p_pad,), jnp.float32)
    for plan, blocks in zip(plans, class_blocks):
        def per_block(b, plan=plan):
            ci = jax.lax.dynamic_slice(cpad, (b * ti, 0), (ti, p_pad))
            yi = jax.lax.dynamic_slice(yv, (b * ti,), (ti,))
            vi = jax.lax.dynamic_slice(valid, (b * ti,), (ti,))
            iid = b * ti + jnp.arange(ti, dtype=jnp.int32)
            match = jax.lax.dynamic_slice(M, (b * ti, 0), (ti, n_pad))
            return _block_scores_v2(
                ci, yi, vi, iid, cpad, yv, valid, n_real, class_probs,
                algo=algo, use_star=use_star, k=k, ft=ft,
                n_states=n_states, plan=plan, seg_starts=seg_starts,
                seg_lens=seg_lens, match=match, onehot_a=A)

        parts = jax.lax.map(per_block,
                            jnp.asarray(blocks, jnp.int32))
        total = total + parts.sum(axis=0)
    return total


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
        # (bounded: |t2| <= TI * n must stay below int32 range)
        exact = algo == "surf" and ti * codes_a.shape[0] < 2 ** 31
        return _accumulate_discrete(ci, codes_a, rules, ft, n_states,
                                    exact_int=exact)

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

    TI >= 4096 keeps the MXU near peak (M-dim measurement above); FT
    uses the measured per-zone sweet spots below, bounded so the
    (n_pad, S*FT) one-hot temporary stays under ~1 GB.
    """
    ti = 4096 if n >= 4096 else _round_up(max(n, 1), 8)
    s = max(n_states, 2)
    # Measured sweet spots (v5e): the symmetric engine prefers ft=2048
    # (16384x65536: 0.82 s vs 0.88 s at the old formula's 2688); the
    # streamed/gather engines prefer ft=1024 (98kx100k: 44.6 s vs
    # 52.6 s at 512, regression at >=1536; 30kx200k: 10.6 s vs 12.9 s
    # at 1536).  The zone test is _sym_zone — the SAME predicate
    # _run_v2 dispatches on, so chooser and engine cannot drift.  A
    # 1 GB one-hot-temp bound shrinks ft at extreme n*S.
    n_pad_est = _round_up(max(n, 1), ti)
    cap = 2048 if _sym_zone(n_pad_est, p, s) else 1024
    budget = 1 << 30
    ft_max = min(cap, max(128, budget // max(n * s, 1)))
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


# v2 gates: minimum sample count (below this the sort/specialised
# compiles aren't worth it) and the symmetric-engine memory budgets for
# the precomputed one-hot / (n, n) match matrix.
_V2_MIN_N = 4096
_SYM_MAX_N = 24576
_SYM_ONEHOT_BYTES = 4 << 30
_SYM_MATCH_BYTES = 3 << 30


def _sym_zone(n_pad: int, p: int, n_states: int) -> bool:
    """Single source of truth for the symmetric-engine gates: the
    precomputed one-hot and the (n, n) match matrix must both fit their
    budgets.  ``p`` is the RAW feature count — it is normalised to the
    128-aligned lower bound of any ft padding here, so the tile-size
    chooser (which runs before ft exists) and ``_run_v2`` (which runs
    after) evaluate the identical expression (VERDICT r2 item 10: the
    two copies drifted once already, commit 968ff9e)."""
    p128 = _round_up(max(p, 1), 128)
    s = max(int(n_states), 2)
    return (n_pad <= _SYM_MAX_N
            and n_pad * s * p128 <= _SYM_ONEHOT_BYTES
            and 4 * n_pad * n_pad <= _SYM_MATCH_BYTES)


def _v2_layout(y, n, ti, algo, class_probs):
    """Class-sorted layout when the v2 engines apply, else None."""
    if n < _V2_MIN_N:
        return None
    layout = _class_sorted_layout(y[:n], ti)
    if len(layout[0]) > 16:
        return None  # per-class specialised programs: cap compile count
    if algo == "relieff":
        # per-class plans index rules[1 + c] by class VALUE; that needs
        # classes 0..C-1 AND class_probs actually covering them (the
        # op-level default class_probs=None yields a single dummy rule)
        if class_probs is None or not np.array_equal(
                layout[0], np.arange(len(layout[0]))):
            return None
        if np.asarray(class_probs).shape[0] < len(layout[0]):
            return None
    return layout


# Above this byte count a sorted/padded device copy of the code matrix
# cannot coexist with the original in HBM — the streamed engine gathers
# focal rows / class segments from the ORIGINAL instead.
_DEVICE_SORT_BUDGET = 6 << 30

# PackedCodes whose SORTED UNPACKED copy still fits next to the packed
# buffer (1.25x n*p peak + engine workspace, vs the 2.2x the unpacked
# budget rule assumes) are PROMOTED: one device unpack+sort, packed
# buffer donated away, then the fast resident v2 engine instead of the
# window-gather engine.  Measured on v5e at 30000x200000 (6 GB codes):
# gather engine ~59 s vs resident engine ~10.6 s.
_PACKED_PROMOTE_BUDGET = 7 << 30


@jax.jit
def _slice_00(a):
    return jax.lax.dynamic_slice(a, (0, 0), (1, 1))


@partial(jax.jit, static_argnames=("n_pad", "p_pad", "bits"))
def _promote_packed_sorted(packed, gather_idx, row_valid, *,
                           n_pad, p_pad, bits):
    """Unpack + class-sort a bit-packed code matrix into the padded
    resident engine layout (the packed buffer stays alive — donation
    of a host-staged array is not usable here and the 0.25x extra is
    within the promote budget's headroom).

    Features come out in PLANE order (position i*pb + j holds original
    feature j*per + i — the same contiguous-concat unpack the window
    gather uses; a natural-order unpack would lower to slow lane
    shuffles).  Per-feature scores are order-independent, so the caller
    remaps the final vector host-side with ``_plane_to_natural``."""
    per = 8 // bits
    mask = jnp.uint8((1 << bits) - 1)
    rows = jnp.where(row_valid[:, None] > 0,
                     jnp.take(packed, gather_idx, axis=0, mode="clip"),
                     jnp.uint8(0))                      # (n_pad, pb)
    parts = [((rows >> jnp.uint8(bits * i)) & mask).astype(jnp.int8)
             for i in range(per)]
    out = jnp.concatenate(parts, axis=1)                # (n_pad, pb*per)
    return jnp.pad(out, ((0, 0), (0, p_pad - out.shape[1])))


def _run_v2_gather(codes, y_np, layout, n, p, n_states, class_probs,
                   *, algo, use_star, k, ti, ft):
    """Huge-device-codes streamed v2: virtual sort via gathers, no copy.

    ``codes`` may be a :class:`PackedCodes` — then the code matrix stays
    bit-packed in HBM and windows unpack on the fly."""
    classes, perm, segments, block_class, _ = layout
    cls_t = tuple(int(c) for c in classes)
    n_cls = len(classes)
    nb = -(-n // ti)
    if isinstance(codes, PackedCodes):
        bits, per = codes.bits, codes.per
        codes = codes.packed
    else:
        bits, per = 0, 1
    nf = p // ft
    offs_l = [i * ft for i in range(nf)]
    if p - nf * ft:
        # overlap window(s) cover the ragged tail.  Packed windows must
        # start on a byte boundary, so the tail start rounds down to a
        # multiple of ``per``; if that still leaves < per features
        # uncovered at the very end, one more window flush against the
        # packed width catches them (overlapped features recompute
        # identically; decoded overhang features score exactly 0).
        t1 = (p - ft) // per * per
        offs_l.append(t1)
        if t1 + ft < p:
            p_eff = -(-p // per) * per
            offs_l.append(p_eff - ft)
    offs = jnp.asarray(offs_l, jnp.int32)

    yv = np.asarray(y_np, np.int32)
    valid = np.ones((n,), np.float32)
    idx_arrays = []
    padvs = []
    for s0, sl in segments:
        L = _round_up(sl, 8)
        idx = np.zeros((L,), np.int32)
        idx[:sl] = perm[s0:s0 + sl]
        pv = np.zeros((L,), np.int8)
        pv[:sl] = 1
        idx_arrays.append(jnp.asarray(idx))
        padvs.append(jnp.asarray(pv))
    idx_arrays = tuple(idx_arrays)
    padvs = tuple(padvs)

    plan_of = {}
    for pos in set(block_class):
        plan_of[pos] = tuple(
            (spec, tuple(segs)) for spec, segs in
            _plan_segments(algo, use_star, cls_t, pos))

    cp = np.asarray(class_probs, np.float32)
    out = np.zeros((len(offs_l), ft), np.float64)
    for b in range(nb):
        rows = perm[b * ti:(b + 1) * ti]
        sidx = np.zeros((ti,), np.int32)
        sidx[:len(rows)] = rows
        yi = np.full((ti,), -1, np.int32)
        yi[:len(rows)] = yv[rows]
        vi = np.zeros((ti,), np.float32)
        vi[:len(rows)] = 1.0
        # pad focal entries get iid = -1 (never matches a j-column), so
        # self-exclusion can't alias real sample 0 even if a refactor
        # ever weakens the vi = 0 row masking
        iid = np.full((ti,), -1, np.int32)
        iid[:len(rows)] = rows
        out += np.asarray(_relief_discrete_block_v2g(
            codes, yv, valid, jnp.asarray(sidx), jnp.asarray(yi),
            jnp.asarray(vi), jnp.asarray(iid), np.float32(n), cp,
            idx_arrays, padvs, offs, algo=algo, use_star=use_star,
            k=int(k), ft=ft, n_states=int(n_states),
            plan=plan_of[block_class[min(b, len(block_class) - 1)]],
            bits=bits),
            np.float32)
    scores = np.zeros((p,), np.float64)
    for i, off in enumerate(offs_l):
        end = min(off + ft, p)
        win = _plane_to_natural(out[i], per) if bits else out[i]
        scores[off:end] = win[:end - off]
    return scores.astype(np.float32)


def _run_v2(codes, y, layout, n, p, n_states, class_probs,
            *, algo, use_star, k, ti, ft, device):
    """Class-sorted v2 execution: pick symmetric / monolithic / streamed
    by memory and block count."""
    if isinstance(codes, PackedCodes):
        codes.check_live()
    classes, perm, segments, block_class, n_pad = layout
    p_pad = _round_up(p, ft)
    y_np = np.asarray(y[:n], np.int32)

    plane_per = 0  # >0: engine ran in plane feature order, remap at end
    promote = (isinstance(codes, PackedCodes)
               and codes.n * codes.p <= _PACKED_PROMOTE_BUDGET
               and ft % codes.per == 0)
    if (isinstance(codes, PackedCodes) and not promote) or (
            isinstance(codes, jax.Array)
            and 2.2 * codes.size > _DEVICE_SORT_BUDGET and p >= ft):
        return np.pad(_run_v2_gather(
            codes, y_np, layout, n, p, n_states, class_probs,
            algo=algo, use_star=use_star, k=k, ti=ti, ft=ft),
            (0, p_pad - p))

    if promote:
        plane_per = codes.per
        gather_idx = np.zeros((n_pad,), np.int32)
        gather_idx[:n] = perm
        row_valid = np.zeros((n_pad,), np.float32)
        row_valid[:n] = 1.0
        yv = np.full((n_pad,), -1, np.int32)
        yv[:n] = y_np[perm]
        # p_eff overhang slots decode to state 0 and score exactly 0,
        # like padding; p_pad is per-aligned because ft % per == 0
        cpad = _promote_packed_sorted(
            codes.packed, jnp.asarray(gather_idx),
            jnp.asarray(row_valid), n_pad=n_pad, p_pad=p_pad,
            bits=codes.bits)
        # free the packed buffer NOW: at promote scale it is the
        # difference between fitting HBM and RESOURCE_EXHAUSTED in the
        # engine (buffer donation is not usable for host-staged puts).
        # The tiny D2H proves the unpack consumed it first —
        # block_until_ready does not reliably sync through tunnelled
        # runtimes.
        np.asarray(_slice_00(cpad))
        codes.consume()
        valid = row_valid
    elif isinstance(codes, jax.Array):
        gather_idx = np.zeros((n_pad,), np.int32)
        gather_idx[:n] = perm
        row_valid = np.zeros((n_pad,), np.float32)
        row_valid[:n] = 1.0
        yv = np.full((n_pad,), -1, np.int32)
        yv[:n] = y_np[perm]
        cpad = _apply_layout_device(
            codes, jnp.asarray(gather_idx), jnp.asarray(row_valid),
            n_pad=n_pad, p_pad=p_pad)
        valid = row_valid
    else:
        cpad, yv, valid = _apply_layout_host(
            np.asarray(codes, np.int8), y_np, perm, n_pad, p_pad)
        if device is not None and device.platform != "cpu":
            cpad = jax.device_put(cpad)

    cls_t = tuple(int(c) for c in classes)
    plan_of = {}
    for pos in set(block_class):
        plan_of[pos] = tuple(
            (spec, tuple(segs)) for spec, segs in
            _plan_segments(algo, use_star, cls_t, pos))
    groups = {}  # plan -> block ids
    for b, pos in enumerate(block_class):
        groups.setdefault(plan_of[pos], []).append(b)
    plans = tuple(groups.keys())
    class_blocks = tuple(tuple(v) for v in groups.values())
    segs_all = list(segments) + [(0, n_pad)]  # last pos = full span
    segs_t = tuple(int(s) for s, _ in segs_all)
    lens_t = tuple(int(l) for _, l in segs_all)
    kw = dict(algo=algo, use_star=use_star, k=int(k), ti=ti, ft=ft,
              n_states=int(n_states))
    cp = np.asarray(class_probs, np.float32)
    nb = n_pad // ti

    # the monolithic engine keeps O(n_pad^2) distance/weight
    # temporaries live at once — with multi-GB promoted code matrices
    # that overflows HBM even at small block counts, so it is gated by
    # an estimated footprint, not just nb (measured: 30208 rows +
    # 6 GB codes RESOURCE_EXHAUSTEDs the nb<16 branch)
    mono_bytes = (getattr(cpad, "nbytes", cpad.size)
                  + 12 * n_pad * n_pad)
    if _sym_zone(n_pad, p, n_states):
        scores = np.asarray(_relief_discrete_engine_sym(
            cpad, yv, valid, np.float32(n), cp, plans=plans,
            seg_starts=segs_t, seg_lens=lens_t,
            class_blocks=class_blocks, **kw), np.float32)
    elif nb < 16 and mono_bytes <= (10 << 30):
        scores = np.asarray(_relief_discrete_engine_v2(
            cpad, yv, valid, np.float32(n), cp, plans=plans,
            seg_starts=segs_t, seg_lens=lens_t,
            class_blocks=class_blocks, **kw), np.float32)
    else:
        block_plan = {}
        for pos, blocks in enumerate(class_blocks):
            for b in blocks:
                block_plan[b] = plans[pos]
        scores = np.zeros((p_pad,), np.float64)
        for b in range(nb):
            scores += np.asarray(_relief_discrete_block_v2(
                cpad, yv, valid, jnp.int32(b), np.float32(n), cp,
                plan=block_plan[b], seg_starts=segs_t, seg_lens=lens_t,
                **kw), np.float32)
        scores = scores.astype(np.float32)
    if plane_per:
        p_eff = _round_up(p, plane_per)
        natural = np.zeros((p_pad,), np.float32)
        natural[:p_eff] = _plane_to_natural(
            np.asarray(scores[:p_eff]), plane_per)
        return natural
    return scores


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
        ti0, ft0 = _discrete_tile_sizes(n, p, int(n_states))
        layout = _v2_layout(np.asarray(y), n, ti or ti0, algo,
                            class_probs)
        if not isinstance(codes, jax.Array) and device is not None \
                and device.platform != "cpu":
            # Uncommitted device_put once (lands on the default device set
            # by execution_context), bit-packed when the cardinality
            # allows (2 bits for SNP codes: 4x fewer bytes over the
            # link), then unpack/pad on device.  Every other transfer
            # route measured catastrophically slower here: committed
            # device_put(x, dev) ~25x slower, eager jnp.asarray > 1000x
            # slower, jit-argument transfer ~30x.  Codes headed for the
            # gather-mode v2 engine STAY packed in HBM (the unpacked
            # matrix would crowd out the engine's workspace at GWAS
            # scale) — windows unpack on the fly there.
            with phase("relief_discrete.h2d", work=n * p):
                if (layout is not None
                        and 2.2 * n * p > _DEVICE_SORT_BUDGET
                        and p >= (ft or ft0)):
                    codes = stage_codes_packed(codes, int(n_states))
                else:
                    codes = stage_codes_device(codes, int(n_states))
        if layout is not None:
            # class-sorted v2: segment-restricted pass 2 (+ symmetric
            # pass 1 when the precomputed one-hot fits)
            if class_probs is None:
                class_probs = np.zeros((1,), np.float32)
            ft_v2 = ft or _discrete_tile_sizes(layout[4], p,
                                               int(n_states))[1]
            with phase(f"relief_discrete.engine_v2[{algo}]",
                       work=float(n) * n * p):
                scores = _run_v2(
                    codes, np.asarray(y, np.int32), layout, n, p,
                    int(n_states), class_probs, algo=algo,
                    use_star=use_star, k=int(n_neighbors),
                    ti=ti or ti0, ft=ft_v2, device=device)
            return scores[:p] / np.float32(n)

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
