"""Pallas TPU kernel: batched Hamming<=1 barcode neighbor search.

The unfiltered-permit-list rescue asks, for every unmatched barcode,
how many *kept* barcodes lie within Hamming distance 1 (substitutions
over the 2-bit encoding) and which one (when unique)
(cellfilter.rs:198-233 via BarcodeLookupMap).

The host path (ops/barcodes.py) expands 3L+1 substitution variants per
query and binary-searches the sorted kept list.  This kernel is the
device formulation: queries live in a TPU-native (8, 128) sublane x
lane layout (1024 per grid step), the kept table streams through VMEM
in tiles, and an inner fori_loop broadcasts one kept barcode per
iteration against the whole query tile — XOR, 2-bit fold, popcount on
the VPU.  Work is O(Q x K) with no gathers or scatters, and the query
axis shards cleanly across a device mesh.

Outputs per query:
  * ``counts`` — number of kept barcodes with distance <= 1
  * ``rep``    — the smallest such kept barcode, which equals the
                 unique neighbor when counts == 1 (the only case the
                 rescue logic consumes).  Min-tracking runs in
                 bias-transformed int32 (v ^ 0x80000000 preserves
                 unsigned order under signed compare) because Mosaic
                 has no unsigned reductions.
"""

from __future__ import annotations

from functools import partial

import numpy as np

_Q_SUB = 8
_Q_LANE = 128
_Q_BLOCK = _Q_SUB * _Q_LANE  # 1024 queries per grid step
_K_TILE = 1024


def _build_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def popcount32(v):
        v = v - ((v >> 1) & jnp.uint32(0x55555555))
        v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
        v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
        return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)

    def kernel(q_lo_ref, q_hi_ref, k_lo_ref, k_hi_ref, kb_lo_ref, kb_hi_ref,
               cnt_ref, rep_lo_ref, rep_hi_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            cnt_ref[:] = jnp.zeros_like(cnt_ref)
            rep_lo_ref[:] = jnp.full_like(rep_lo_ref, jnp.iinfo(jnp.int32).max)
            rep_hi_ref[:] = jnp.full_like(rep_hi_ref, jnp.iinfo(jnp.int32).max)

        q_lo = q_lo_ref[:]  # (8, 128) uint32
        q_hi = q_hi_ref[:]
        m = jnp.uint32(0x55555555)

        def body(t, carry):
            cnt, rep_lo, rep_hi = carry
            k_lo = k_lo_ref[0, t]
            k_hi = k_hi_ref[0, t]
            x_lo = jnp.bitwise_xor(q_lo, k_lo)
            x_hi = jnp.bitwise_xor(q_hi, k_hi)
            t_lo = jnp.bitwise_and(jnp.bitwise_or(x_lo, x_lo >> 1), m)
            t_hi = jnp.bitwise_and(jnp.bitwise_or(x_hi, x_hi >> 1), m)
            d = popcount32(t_lo) + popcount32(t_hi)
            near = d <= 1
            cnt = cnt + near.astype(jnp.int32)
            # bias-transformed int32 copies of the kept barcode (host
            # precomputed; scalar bitcast is unsupported in Mosaic)
            kb_lo = kb_lo_ref[0, t]
            kb_hi = kb_hi_ref[0, t]
            better = near & (
                (kb_hi < rep_hi) | ((kb_hi == rep_hi) & (kb_lo < rep_lo))
            )
            rep_hi = jnp.where(better, kb_hi, rep_hi)
            rep_lo = jnp.where(better, kb_lo, rep_lo)
            return cnt, rep_lo, rep_hi

        cnt, rep_lo, rep_hi = jax.lax.fori_loop(
            0, _K_TILE, body, (cnt_ref[:], rep_lo_ref[:], rep_hi_ref[:])
        )
        cnt_ref[:] = cnt
        rep_lo_ref[:] = rep_lo
        rep_hi_ref[:] = rep_hi

    @partial(jax.jit, static_argnums=(6,))
    def run(q_lo, q_hi, k_lo, k_hi, kb_lo, kb_hi, interpret):
        nq_blocks = q_lo.shape[0] // _Q_SUB
        nk_tiles = k_lo.shape[1] // _K_TILE
        grid = (nq_blocks, nk_tiles)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_Q_SUB, _Q_LANE), lambda i, j: (i, 0)),
                pl.BlockSpec((_Q_SUB, _Q_LANE), lambda i, j: (i, 0)),
                # kept tiles live in SMEM: the inner loop reads one
                # scalar per iteration with a dynamic index, which VMEM
                # lanes don't allow
                pl.BlockSpec((1, _K_TILE), lambda i, j: (0, j),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _K_TILE), lambda i, j: (0, j),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _K_TILE), lambda i, j: (0, j),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _K_TILE), lambda i, j: (0, j),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((_Q_SUB, _Q_LANE), lambda i, j: (i, 0)),
                pl.BlockSpec((_Q_SUB, _Q_LANE), lambda i, j: (i, 0)),
                pl.BlockSpec((_Q_SUB, _Q_LANE), lambda i, j: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(q_lo.shape, jnp.int32),
                jax.ShapeDtypeStruct(q_lo.shape, jnp.int32),
                jax.ShapeDtypeStruct(q_lo.shape, jnp.int32),
            ],
            interpret=interpret,
        )(q_lo, q_hi, k_lo, k_hi, kb_lo, kb_hi)

    return run


_RUN = None
_SS_RUN = None
_MXU_RUN = {}

# MXU formulation tiling: 1024 queries x 2048 kept per grid step, the
# kept tile consumed as 16 MXU-native (128,128) column chunks.
_M_QT = 1024
_M_KT = 2048
_M_CH = 128
_I32_MAX = 2147483647


def _build_mxu_kernel(length: int, interpret: bool):
    """Hamming<=1 as an MXU matmul (VERDICT r4 Next #3).

    Over 2-bit base codes, distance(q, k) = L - matches(q, k) where
    ``matches`` is the inner product of 4-letter one-hot encodings —
    so the whole O(Q x K) distance field is a (Q x 4L)@(4L x K) bf16
    contraction (one-hot dots are exact in bf16: partial sums <= 32).
    d <= 1  <=>  matches >= L - 1.  The kernel fuses the epilogue so
    the (Q, K) hit matrix never exists in HBM: each grid step computes
    a (1024 x 2048) tile of matches as 16 (1024x128) MXU dots and
    folds it into two per-query accumulators — hit count, and the
    minimum *global kept index* of any hit (kept arrives sorted, so
    min index == smallest neighbor, which is the rescue contract,
    cellfilter.rs:198-233).  Per-lane partials (Qt, 128) avoid any
    in-kernel cross-lane relayout; XLA reduces the 128 lanes after.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    thresh = np.float32(length - 1.5)  # matches > L-1.5 <=> matches >= L-1

    def kernel(qoh_ref, koh_ref, cnt_ref, idx_ref):
        j = pl.program_id(1)

        @pl.when(j == jnp.int32(0))
        def _init():
            cnt_ref[:] = jnp.zeros_like(cnt_ref)
            idx_ref[:] = jnp.full_like(idx_ref, _I32_MAX)

        q = qoh_ref[:]  # (QT, 128) bf16 one-hot rows
        cnt = cnt_ref[:]
        idx = idx_ref[:]
        base = j * jnp.int32(_M_KT)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_M_QT, _M_CH), 1)
        for t in range(_M_KT // _M_CH):  # static unroll: 16 MXU dots
            k = koh_ref[t * _M_CH:(t + 1) * _M_CH, :]  # (128, 128) bf16
            m = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (QT, 128) match counts
            near = m > thresh
            cnt = cnt + near.astype(jnp.int32)
            gidx = base + jnp.int32(t * _M_CH) + lane
            idx = jnp.minimum(
                idx, jnp.where(near, gidx, jnp.int32(_I32_MAX))
            )
        cnt_ref[:] = cnt
        idx_ref[:] = idx

    @jax.jit
    def run(q_lo, q_hi, k_lo, k_hi, nk_real):
        # One-hot prologue ON DEVICE (ships 8 B/barcode over the link,
        # not 256 B of one-hot): plane[n, p*4+b] = (base_p(n) == b).
        def onehot(lo, hi):
            n = lo.shape[0]
            pos = jnp.arange(length, dtype=jnp.uint32)
            word = jnp.where(pos < 16, lo[:, None], hi[:, None])
            sh = jnp.where(pos < 16, pos * 2, (pos - 16) * 2)
            code = (word >> sh[None, :]) & jnp.uint32(3)  # (n, L)
            plane = (
                code[:, :, None] == jnp.arange(4, dtype=jnp.uint32)
            ).astype(jnp.bfloat16).reshape(n, 4 * length)
            return jnp.pad(plane, ((0, 0), (0, _M_CH - 4 * length)))

        qoh = onehot(q_lo, q_hi)
        koh = onehot(k_lo, k_hi)
        # kept pads get ALL-ZERO one-hot rows (matches == 0, never a
        # hit); a padded code value would alias a real all-A barcode
        koh = jnp.where(
            jnp.arange(koh.shape[0], dtype=jnp.int32)[:, None] < nk_real,
            koh, jnp.bfloat16(0),
        )
        grid = (q_lo.shape[0] // _M_QT, k_lo.shape[0] // _M_KT)
        cnt, idx = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_M_QT, _M_CH), lambda i, j: (i, 0)),
                pl.BlockSpec((_M_KT, _M_CH), lambda i, j: (j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((_M_QT, _M_CH), lambda i, j: (i, 0)),
                pl.BlockSpec((_M_QT, _M_CH), lambda i, j: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(qoh.shape, jnp.int32),
                jax.ShapeDtypeStruct(qoh.shape, jnp.int32),
            ],
            interpret=interpret,
        )(qoh, koh)
        # lane reduction epilogue (cheap, stays on device)
        return cnt.sum(axis=1), idx.min(axis=1)

    return run


def find_neighbors_mxu(
    queries: np.ndarray, kept: np.ndarray, length: int,
    interpret: bool = False,
):
    """MXU-contraction Hamming<=1 search; same contract as
    ops.barcodes.find_neighbors_batch.  Supports length <= 32."""
    assert 2 <= length <= 32, "one-hot MXU path needs 2..32-base barcodes"
    key = (length, interpret)
    if key not in _MXU_RUN:
        _MXU_RUN[key] = _build_mxu_kernel(length, interpret)
    import jax.numpy as jnp

    queries = np.asarray(queries, np.uint64)
    kept_sorted = np.sort(np.asarray(kept, np.uint64))
    nq, nk = len(queries), len(kept_sorted)
    if nq == 0 or nk == 0:
        return np.zeros(nq, np.int64), np.zeros(nq, np.uint64)

    qpad = -nq % _M_QT
    kpad = -nk % _M_KT
    # query pads are sliced off after; kept pads are zeroed (one-hot
    # row masked by nk_real) inside the prologue
    qp = np.concatenate([queries, np.zeros(qpad, np.uint64)])
    kp = np.concatenate([kept_sorted, np.zeros(kpad, np.uint64)])
    cnt, idx = _MXU_RUN[key](
        jnp.asarray((qp & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((qp >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((kp & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((kp >> np.uint64(32)).astype(np.uint32)),
        np.int32(nk),
    )
    cnt = np.asarray(cnt)[:nq].astype(np.int64)
    idx = np.asarray(idx)[:nq]
    rep = np.where(
        cnt > 0, kept_sorted[np.minimum(idx, nk - 1)], np.uint64(0)
    )
    return cnt, rep


def _build_searchsorted_kernel():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(3,))
    def run(qp, kept_pad, nk_real, length):
        # qp: (Qp,) uint32 packed queries; kept_pad: (Kp,) uint32 sorted
        # kept barcodes padded at the high end with 0xFFFFFFFF; nk_real
        # marks the number of real entries (pad slots never count: a
        # variant can legitimately be all-T == 0xFFFFFFFF, so hits are
        # masked to idx < nk_real).
        Q = qp.shape[0]
        L = length
        shifts = (jnp.arange(L, dtype=jnp.uint32) * 2).astype(jnp.uint32)
        cur = (qp[:, None] >> shifts[None, :]) & jnp.uint32(3)
        bases = jnp.arange(4, dtype=jnp.uint32)
        # substitute every base at every position; the original base
        # reproduces the query itself (distance 0 counts as a hit,
        # matching BarcodeLookupMap semantics)
        var = qp[:, None, None] ^ (
            (cur[:, :, None] ^ bases[None, None, :]) << shifts[None, :, None]
        )
        var = jnp.sort(var.reshape(Q, L * 4), axis=1)
        uniqm = jnp.concatenate(
            [jnp.ones((Q, 1), bool), var[:, 1:] != var[:, :-1]], axis=1
        )
        idx = jnp.searchsorted(kept_pad, var)
        idx_c = jnp.minimum(idx, kept_pad.shape[0] - 1)
        hit = (idx < nk_real) & (kept_pad[idx_c] == var) & uniqm
        counts = hit.sum(axis=1).astype(jnp.int32)
        first = jnp.argmax(hit, axis=1)
        rep = jnp.where(
            hit.any(axis=1), var[jnp.arange(Q), first], jnp.uint32(0)
        )
        return counts, rep

    return run


_SS_QBLOCK = 1 << 18  # 256k queries per dispatch


def find_neighbors_searchsorted(
    queries: np.ndarray, kept_sorted: np.ndarray, length: int
):
    """Device Hamming<=1 search with host-path asymptotics: expand the
    3L+1 substitution variants per query on device and binary-search the
    (replicated) sorted kept table — O(Q * L * log K) instead of the
    brute-force kernel's O(Q * K).  Requires length <= 16 so barcodes
    fit u32 (TPU jax defaults to 32-bit; the MXU/XOR-popcount kernels
    cover longer barcodes).  Same contract as
    ops.barcodes.find_neighbors_batch.

    The query axis is processed in fixed 256k blocks: one unblocked
    dispatch at production scale (1.7M queries x 1.1M kept, 50M-read
    gpl) materialized multi-hundred-MB (Q, 4L) variant intermediates
    and crashed this image's TPU worker outright (r5 scale run);
    blocking bounds device memory AND the compiled-program count (the
    kept table still pads to a power of two)."""
    assert length <= 16, "searchsorted device path needs barcodes <= 16 bases"
    global _SS_RUN
    if _SS_RUN is None:
        _SS_RUN = _build_searchsorted_kernel()
    import jax.numpy as jnp

    queries = np.asarray(queries, np.uint64)
    kept_sorted = np.asarray(kept_sorted, np.uint64)
    nq, nk = len(queries), len(kept_sorted)
    if nq == 0 or nk == 0:
        return np.zeros(nq, np.int64), np.zeros(nq, np.uint64)

    kcap = max(1024, 1 << (nk - 1).bit_length())
    kp = np.full(kcap, 0xFFFFFFFF, np.uint32)
    kp[:nk] = kept_sorted.astype(np.uint32)
    kp_dev = jnp.asarray(kp)  # uploaded once, reused across blocks

    cnt = np.empty(nq, np.int64)
    rep = np.empty(nq, np.uint64)
    for s in range(0, nq, _SS_QBLOCK):
        e = min(s + _SS_QBLOCK, nq)
        blk = e - s
        qcap = max(1024, 1 << (blk - 1).bit_length())
        qp = np.zeros(qcap, np.uint32)
        qp[:blk] = queries[s:e].astype(np.uint32)
        c, r = _SS_RUN(jnp.asarray(qp), kp_dev, nk, length)
        cnt[s:e] = np.asarray(c)[:blk].astype(np.int64)
        rep[s:e] = np.asarray(r)[:blk].astype(np.uint64)
    return cnt, np.where(cnt > 0, rep, np.uint64(0))


def find_neighbors_pallas(
    queries: np.ndarray, kept: np.ndarray, length: int, interpret: bool = False
):
    """Device Hamming<=1 search.  Returns (counts, rep) matching the
    contract of ops.barcodes.find_neighbors_batch (rep is the smallest
    neighbor; unique when counts == 1)."""
    global _RUN
    if _RUN is None:
        _RUN = _build_kernel()
    import jax.numpy as jnp

    queries = np.asarray(queries, np.uint64)
    kept = np.asarray(kept, np.uint64)
    nq, nk = len(queries), len(kept)
    if nq == 0 or nk == 0:
        return np.zeros(nq, np.int64), np.zeros(nq, np.uint64)

    qpad = -nq % _Q_BLOCK
    kpad = -nk % _K_TILE
    # pad queries with an impossible pattern and kept with a different
    # one so padding never matches anything real
    qp = np.concatenate([queries, np.full(qpad, 0xAAAAAAAAAAAAAAAA, np.uint64)])
    kp = np.concatenate([kept, np.full(kpad, 0x5555555555555555, np.uint64)])
    q_lo = (qp & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(-1, _Q_LANE)
    q_hi = (qp >> np.uint64(32)).astype(np.uint32).reshape(-1, _Q_LANE)
    k_lo = (kp & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(1, -1)
    k_hi = (kp >> np.uint64(32)).astype(np.uint32).reshape(1, -1)
    kb_lo = (k_lo ^ np.uint32(0x80000000)).view(np.int32)
    kb_hi = (k_hi ^ np.uint32(0x80000000)).view(np.int32)

    cnt, rep_lo, rep_hi = _RUN(
        jnp.asarray(q_lo), jnp.asarray(q_hi), jnp.asarray(k_lo),
        jnp.asarray(k_hi), jnp.asarray(kb_lo), jnp.asarray(kb_hi), interpret,
    )
    cnt = np.asarray(cnt).ravel()[:nq].astype(np.int64)
    un_hi = (np.asarray(rep_hi).ravel()[:nq].view(np.uint32)
             ^ np.uint32(0x80000000)).astype(np.uint64)
    un_lo = (np.asarray(rep_lo).ravel()[:nq].view(np.uint32)
             ^ np.uint32(0x80000000)).astype(np.uint64)
    rep = (un_hi << np.uint64(32)) | un_lo
    rep = np.where(cnt > 0, rep, np.uint64(0))
    return cnt, rep
