"""Single-pass Pallas scans for the contiguous-segment toolkit.

The scatter-free WTA kernels (ops/crlike_device.py) spend their
non-sort time in cumulative passes; XLA lowers 1-D cumsum/cummax to
log-depth whole-array sweeps (0.79 / 1.51 ms per 4M int32 pass on
v5e).  TPU Pallas grids execute sequentially on the tensorcore, so a
scan can thread its carry through SMEM scratch across grid steps and
touch HBM exactly once: the probe kernel reads 0.246 ms per 4M pass
(`scripts/pallas_scan_probe.py`), and the fused forward kernel below
computes BOTH of `_seg_sum`'s forward quantities (the running sum and
the segment-base propagation) in that one pass.

Mosaic has no cumsum lowering, so in-block scans are Hillis-Steele
doublings over `pltpu.roll` (7 lane steps + 8 sublane steps per
32k-element block), and the packed-int64 reductions of the XLA path
become (hi, lo) int32 PAIR scans under a lexicographic combine — no
64-bit emulation.  These are the AUTO DEFAULT on TPU backends
(``AFT_WTA_SEGSCAN=xla|pallas`` overrides; dispatch in
ops/crlike_device.py); interpret-mode equality tests in
tests/test_segops.py.  Measured effect on the 4M-key WTA kernels:
plain 39.6 -> 30.0 ms, USA 58.2 -> 34.6 ms (PROFILE_r04).
"""

from __future__ import annotations

import functools

import numpy as np

LANES = 128
ROWS = 256
BLOCK = ROWS * LANES
I32_MIN = np.int32(np.iinfo(np.int32).min)
I32_MAX = np.int32(np.iinfo(np.int32).max)


def _scan(v, axis, size, op, identity):
    """Inclusive Hillis-Steele scan along ``axis`` via circular rolls
    + masked combine (log2(size) VPU steps)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    s = 1
    while s < size:
        # np.int32 shift: under the callers' enable_x64 scope a Python
        # int weak-types to i64, which tpu.dynamic_rotate rejects
        rolled = pltpu.roll(v, np.int32(s), axis=axis)
        v = op(v, jnp.where(idx >= np.int32(s), rolled, identity))
        s *= 2
    return v


def _scan2d(v, op, identity):
    """Inclusive scan over row-major flattened order of a (ROWS, LANES)
    block: lane scan per row, then the row-prefix fold."""
    import jax.numpy as jnp

    within = _scan(v, 1, LANES, op, identity)
    rowagg = within[:, LANES - 1:]
    rowpre = _scan(rowagg, 0, ROWS, op, identity)
    # exclusive row prefix: shift the row aggregate off (int32 iota —
    # jnp.arange would weak-type i64 under the callers' x64 scope)
    import jax

    row_id = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    excl = jnp.where(
        row_id > jnp.int32(0), _shift_down(rowpre), identity
    )
    return op(within, excl)


def _shift_down(col):
    """(ROWS, 1) -> shifted one row down (row r gets row r-1)."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(col, np.int32(1), axis=0)


@functools.lru_cache(maxsize=None)
def _fwd_fn(n_rows: int, interpret: bool = False):
    """Forward fused pass: inputs x (rows, LANES) i32 and base-mark
    values m (rows, LANES) i32 (callers pass where(start, c_excl_proxy
    ... see wrapper); outputs the global inclusive cumsum c of x and
    the running max b of where(start, c - x, -1) — `_seg_sum`'s two
    forward quantities — in ONE HBM pass."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_rows // ROWS,)

    def kernel(x_ref, st_ref, c_ref, b_ref, carry_ref):
        # every literal is pinned to int32: under the callers'
        # enable_x64 scope a bare Python int weak-types to i64, which
        # crashes the Mosaic compiler (SIGABRT in the remote helper)
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _init():
            carry_ref[0, 0] = jnp.int32(0)
            carry_ref[0, 1] = jnp.int32(-1)

        x = x_ref[:]
        st = st_ref[:]
        c = _scan2d(x, jnp.add, np.int32(0)) + carry_ref[0, 0]
        m = jnp.where(st > jnp.int32(0), c - x, jnp.int32(-1))
        b = jnp.maximum(
            _scan2d(m, jnp.maximum, I32_MIN), carry_ref[0, 1]
        )
        c_ref[:] = c
        b_ref[:] = b
        carry_ref[0, 0] = c[ROWS - 1, LANES - 1]
        carry_ref[0, 1] = b[ROWS - 1, LANES - 1]

    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.int32)],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _min_fn(n_rows: int, interpret: bool = False):
    """Running-min pass (callers pre-flip for the reverse direction)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_rows // ROWS,)

    def kernel(e_ref, out_ref, carry_ref):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _init():
            carry_ref[0, 0] = jnp.int32(I32_MAX)

        e = e_ref[:]
        r = jnp.minimum(
            _scan2d(e, jnp.minimum, I32_MAX), carry_ref[0, 0]
        )
        out_ref[:] = r
        carry_ref[0, 0] = r[ROWS - 1, LANES - 1]

    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )


def _scan_pair(h, l, axis, size, bigger):
    """Inclusive Hillis-Steele scan of (hi, lo) int32 pairs under the
    lexicographic max (or min with ``bigger=False``) — the Pallas
    replacement for XLA cumulative ops over (ordinal << bits | value)
    packed int64 words, with no 64-bit emulation."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    ident_h = I32_MIN if bigger else I32_MAX
    ident_l = I32_MIN if bigger else I32_MAX
    idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, axis)
    s = 1
    while s < size:
        rh = pltpu.roll(h, np.int32(s), axis=axis)
        rl = pltpu.roll(l, np.int32(s), axis=axis)
        m = idx >= np.int32(s)
        # Mask BOTH words to the lexicographic identity so the pair
        # operator is self-contained: a rolled-in identity hi with a
        # garbage lo would still lose every comparison only because
        # consumers never read rows whose hi equals the identity —
        # an invariant no caller should have to carry.
        rh = jnp.where(m, rh, ident_h)
        rl = jnp.where(m, rl, ident_l)
        if bigger:
            take = (rh > h) | ((rh == h) & (rl > l))
        else:
            take = (rh < h) | ((rh == h) & (rl < l))
        h = jnp.where(take, rh, h)
        l = jnp.where(take, rl, l)
        s *= 2
    return h, l


def _scan2d_pair(h, l, bigger):
    import jax
    import jax.numpy as jnp

    wh, wl = _scan_pair(h, l, 1, LANES, bigger)
    rah, ral = wh[:, LANES - 1:], wl[:, LANES - 1:]
    rh, rl = _scan_pair(rah, ral, 0, ROWS, bigger)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    first = row_id == jnp.int32(0)
    ident_h = I32_MIN if bigger else I32_MAX
    ident_l = I32_MIN if bigger else I32_MAX
    ph = jnp.where(first, ident_h, _shift_down(rh))
    pl_ = jnp.where(first, jnp.int32(ident_l), _shift_down(rl))
    if bigger:
        take = (ph > wh) | ((ph == wh) & (pl_ > wl))
    else:
        take = (ph < wh) | ((ph == wh) & (pl_ < wl))
    return jnp.where(take, ph, wh), jnp.where(take, pl_, wl)


@functools.lru_cache(maxsize=None)
def _lex_fn(n_rows: int, bigger: bool, interpret: bool = False):
    """Running lexicographic max/min over (hi, lo) int32 pair streams
    in ONE HBM pass (carry pair in SMEM)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_rows // ROWS,)
    ident_h = I32_MIN if bigger else I32_MAX
    ident_l = ident_h

    def kernel(h_ref, l_ref, oh_ref, ol_ref, carry_ref):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _init():
            carry_ref[0, 0] = jnp.int32(ident_h)
            carry_ref[0, 1] = jnp.int32(ident_l)

        h, l = _scan2d_pair(h_ref[:], l_ref[:], bigger)
        ch, cl = carry_ref[0, 0], carry_ref[0, 1]
        if bigger:
            take = (ch > h) | ((ch == h) & (cl > l))
        else:
            take = (ch < h) | ((ch == h) & (cl < l))
        h = jnp.where(take, ch, h)
        l = jnp.where(take, cl, l)
        oh_ref[:] = h
        ol_ref[:] = l
        carry_ref[0, 0] = h[ROWS - 1, LANES - 1]
        carry_ref[0, 1] = l[ROWS - 1, LANES - 1]

    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.int32)],
        interpret=interpret,
    )


def _run_lex(h, l, bigger, interpret):
    """Pad + reshape + one-pass lex scan, back to flat (hi, lo)."""
    import jax
    import jax.numpy as jnp

    n = h.shape[0]
    pad = -n % BLOCK
    ident_h = int(I32_MIN if bigger else I32_MAX)
    h2 = jnp.pad(h, (0, pad), constant_values=ident_h).reshape(-1, LANES)
    l2 = jnp.pad(l, (0, pad), constant_values=ident_h).reshape(-1, LANES)
    with jax.enable_x64(False):
        oh, ol = _lex_fn((n + pad) // LANES, bigger, interpret)(h2, l2)
    return oh.reshape(-1)[:n], ol.reshape(-1)[:n]


def last_marked(val, mark, grp_ord, strict=False, interpret=False):
    """Pallas counterpart of crlike_device._last_marked: running max of
    int32 ``val`` over marked rows of the row's contiguous segment
    (strictly-before with ``strict``); -1 when none."""
    import jax.numpy as jnp

    h = jnp.where(mark, grp_ord, jnp.int32(-1))
    l = jnp.where(mark, val.astype(jnp.int32), jnp.int32(0))
    rh, rl = _run_lex(h, l, True, interpret)
    if strict:
        rh = jnp.concatenate([jnp.full((1,), -1, jnp.int32), rh[:-1]])
        rl = jnp.concatenate([jnp.zeros((1,), jnp.int32), rl[:-1]])
    return jnp.where(rh == grp_ord, rl, jnp.int32(-1))


def seg_reduce(val, mark, start, grp_ord, interpret=False):
    """Pallas counterpart of crlike_device._seg_reduce: per-row max of
    int32 ``val`` >= 0 over marked rows of the row's contiguous
    segment; -1 where the segment has no marked row.  Forward lex-max
    pass + flip-wrapped reverse lex-min broadcast from segment ends."""
    import jax.numpy as jnp

    h = jnp.where(mark, grp_ord, jnp.int32(-1))
    l = jnp.where(mark, val.astype(jnp.int32), jnp.int32(0))
    rh, rl = _run_lex(h, l, True, interpret)
    is_end = jnp.concatenate([start[1:], jnp.ones((1,), bool)])
    eh = jnp.where(is_end, rh, I32_MAX)
    el = jnp.where(is_end, rl, jnp.int32(0))
    bh, bl = _run_lex(eh[::-1], el[::-1], False, interpret)
    bh, bl = bh[::-1], bl[::-1]
    return jnp.where(bh == grp_ord, bl, jnp.int32(-1))


def seg_sum(x, start, with_rank=False, interpret=False):
    """Pallas-backed `_seg_sum`: per-row segment totals (and inclusive
    in-segment running sums) of non-negative int32 ``x`` over contiguous
    segments delimited by ``start`` — same contract as
    ops/crlike_device._seg_sum, three single-touch passes instead of
    three log-depth sweeps."""
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    pad = -n % BLOCK
    npad = n + pad
    x2 = jnp.pad(x.astype(jnp.int32), (0, pad)).reshape(-1, LANES)
    st2 = jnp.pad(start.astype(jnp.int32), (0, pad)).reshape(-1, LANES)
    # trace the pallas calls OUTSIDE any enable_x64 scope: x64 weak
    # typing leaks i64 into the BlockSpec index maps and grid scalars,
    # which Mosaic refuses to legalize ("func.return") or crashes on
    with jax.enable_x64(False):
        c2, b2 = _fwd_fn(npad // LANES, interpret)(x2, st2)
    c = c2.reshape(-1)[:n]
    b = b2.reshape(-1)[:n]
    is_end = jnp.concatenate([start[1:], jnp.ones((1,), bool)])
    e = jnp.where(is_end, c, I32_MAX)
    e2 = jnp.pad(
        e[::-1], (0, pad), constant_values=int(I32_MAX)
    ).reshape(-1, LANES)
    with jax.enable_x64(False):
        tot2 = _min_fn(npad // LANES, interpret)(e2)
    tot = tot2.reshape(-1)[:n][::-1]
    if with_rank:
        return tot - b, c - b
    return tot - b


def available() -> bool:
    """Pallas TPU lowering requires a TPU backend (or interpret mode)."""
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False
