"""Collective-volume census + ICI/DCN scaling cost model
(VERDICT r4 Next #5).

The multi-chip story was correctness-only through round 4: the dryrun
proved the collectives compute the right answer but nothing measured
their *volumes*, so the >=80% scaling north star was untestable-and-
unpredicted.  This module makes it predicted:

* ``census_collectives`` parses a jitted program's StableHLO lowering
  and returns every collective op with its payload bytes — the
  backend-independent ground truth of what the program asks the
  interconnect to move (the virtual-CPU dryrun asserts these counts
  against the analytical model below, so a formulation change that
  silently inflates a collective fails the dryrun).
* analytical per-stage models (`histogram_psum_bytes`,
  `shuffle_alltoall_bytes`, `assembly_allgather_bytes`) give the same
  numbers as closed forms of the workload parameters.
* ``predict_scaling`` turns measured single-chip stage times plus the
  byte models into predicted scaling efficiency at S chips over
  stated ICI/DCN link rates.

Wire-cost conventions (ring algorithms, one-directional rates):
an all-reduce of P payload bytes moves ``2*(S-1)/S*P`` per chip
(reduce-scatter + all-gather); an all-to-all with per-chip buffer P
sends ``(S-1)/S*P``; an all-gather collecting P_total moves
``(S-1)/S*P_total`` per chip.

Link-rate constants are STATED assumptions (public scaling-book
figures, not vendor-certified): TPU v5e 2D torus, ~45 GB/s per link
per direction, 4 links/chip; v5p 3D torus, ~90 GB/s per link per
direction, 6 links/chip; DCN ~6.25 GB/s per host (50 Gbps NIC),
8 chips/host.  Match: SURVEY.md §2.3/§5 distributed-backend
prescription.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_DTYPE_BYTES = {
    "i1": 1, "i8": 1, "ui8": 1, "i16": 2, "ui16": 2, "bf16": 2,
    "f16": 2, "i32": 4, "ui32": 4, "f32": 4, "i64": 8, "ui64": 8,
    "f64": 8,
}

_COLLECTIVES = (
    "all_reduce", "all_to_all", "all_gather", "reduce_scatter",
    "collective_permute",
)


@dataclass
class CollectiveOp:
    op: str
    shape: tuple
    dtype: str
    payload_bytes: int  # per-shard operand size


def _tensor_bytes(ty: str):
    """'tensor<8x512xi32>' -> ((8, 512), 'i32', 16384)."""
    m = re.match(r"tensor<(([0-9]+x)*)([a-z0-9]+)>", ty)
    if not m:
        return None
    dims = tuple(int(x) for x in m.group(1).split("x") if x)
    dt = m.group(3)
    if dt not in _DTYPE_BYTES:
        return None
    n = 1
    for d in dims:
        n *= d
    return dims, dt, n * _DTYPE_BYTES[dt]


def census_collectives(stablehlo_text: str):
    """Parse a StableHLO module's collective ops.

    Returns a list of :class:`CollectiveOp`, one per textual op (ops
    inside shard_map bodies appear once; their operand type is the
    PER-SHARD payload).  Region-bearing ops (all_reduce,
    reduce_scatter) print their function-type signature on the
    region's CLOSING line, so after sighting an op name we scan
    forward for the first ``: (tensor<...>`` signature; attribute
    tensors (replica_groups) on the op line are skipped."""
    lines = stablehlo_text.splitlines()
    out = []
    i = 0
    sig_re = re.compile(r":\s*\((tensor<[^>]+>)")
    while i < len(lines):
        line = lines[i]
        hit = None
        for op in _COLLECTIVES:
            if f"stablehlo.{op}" in line:
                hit = op
                break
        if hit is None:
            i += 1
            continue
        # find the operand type: the `: (tensor<...>` signature on
        # this line or a following region-closing line
        j = i
        parsed = None
        while j < len(lines) and j < i + 200:
            m = sig_re.search(lines[j])
            if m:
                parsed = _tensor_bytes(m.group(1))
                break
            j += 1
        if parsed is not None:
            dims, dt, nbytes = parsed
            out.append(CollectiveOp(hit, dims, dt, nbytes))
        i = j + 1 if j > i else i + 1
    return out


def census_program(jitted, *args):
    """Lower a jitted callable and census its collectives."""
    return census_collectives(jitted.lower(*args).as_text())


# ---------------------------------------------------------------------------
# analytical per-stage collective-byte models (per chip, wire bytes)
# ---------------------------------------------------------------------------


def allreduce_wire_bytes(payload_bytes: int, s: int) -> float:
    return 2.0 * (s - 1) / s * payload_bytes


def alltoall_wire_bytes(buffer_bytes: int, s: int) -> float:
    return (s - 1) / s * buffer_bytes


def allgather_wire_bytes(total_bytes: int, s: int) -> float:
    return (s - 1) / s * total_bytes


def histogram_psum_bytes(wl_size: int, s: int) -> float:
    """gpl barcode histogram: one psum of int32 counts over the
    replicated whitelist (+ one scalar psum, negligible)."""
    return allreduce_wire_bytes(wl_size * 4, s)


def shuffle_alltoall_bytes(s: int, capacity: int, n_arrays: int = 2) -> float:
    """collate shuffle: each chip exchanges an (S, capacity) i32
    buffer per array (ranks + payload)."""
    return n_arrays * alltoall_wire_bytes(s * capacity * 4, s)


def assembly_allgather_bytes(total_nnz: int, s: int,
                             entry_bytes: int = 12) -> float:
    """count-matrix assembly as a ragged all-gather of per-shard COO
    triplets (row i32 + col i32 + val f32) — only needed when every
    chip must SEE the full matrix (it never does in this pipeline;
    kept for reference)."""
    return allgather_wire_bytes(total_nnz * entry_bytes, s)


def assembly_host_gather_bytes(total_nnz: int, s: int,
                               entry_bytes: int = 12) -> float:
    """count-matrix assembly as the pipeline actually does it
    (SURVEY.md §2.3: per-shard matrices merged by concat on the
    host): each chip SENDS its nnz/S triplets once to the writing
    host — per-chip wire bytes, not an all-gather."""
    return total_nnz * entry_bytes / s


# ---------------------------------------------------------------------------
# link-rate table + scaling prediction
# ---------------------------------------------------------------------------

LINK_RATES = {
    # one-directional GB/s usable for a ring per chip (links * rate;
    # a bidirectional ring uses 2 links per chip in a 1-D ring, more
    # of the torus with multi-ring algorithms — we conservatively use
    # TWO links' worth, i.e. one bidirectional ring)
    "v5e_ici_GBs": 2 * 45.0,
    "v5p_ici_GBs": 2 * 90.0,
    # DCN per HOST (8 chips share it), one-directional
    "dcn_per_host_GBs": 6.25,
    "chips_per_host": 8,
}


def predict_scaling(
    *,
    n_reads: int,
    n_cells: int,
    wl_size: int,
    nnz: int,
    single_chip_stage_s: dict,
    chips: int,
    fabric: str = "v5p",
    em_rounds: int = 0,
):
    """Predicted scaling efficiency at ``chips`` devices.

    Compute time divides by S (cell/read sharding is embarrassingly
    parallel; the per-cell EM and WTA need no collectives at all).
    Collective time = wire bytes / link rate, using ICI within a host
    (<= chips_per_host) and DCN across hosts.  Returns a dict with
    per-stage compute/collective seconds and the efficiency vs ideal.
    """
    s = chips
    ici = LINK_RATES[f"{fabric}_ici_GBs"] * 1e9
    cph = LINK_RATES["chips_per_host"]
    dcn = LINK_RATES["dcn_per_host_GBs"] * 1e9 / cph  # per chip share
    rate = ici if s <= cph else dcn  # the slowest hop bounds the ring

    shuffle_capacity = -(-n_reads // max(s, 1) // max(s, 1)) * 2
    coll_bytes = {
        "gpl_histogram_psum": histogram_psum_bytes(wl_size, s),
        "collate_alltoall": shuffle_alltoall_bytes(s, shuffle_capacity),
        "quant_wta_em": 0.0,  # cell-sharded, collective-free
        "matrix_assembly_to_host": assembly_host_gather_bytes(nnz, s),
    }
    total_compute = sum(single_chip_stage_s.values())
    compute_s = {k: v / s for k, v in single_chip_stage_s.items()}
    coll_s = {k: v / rate for k, v in coll_bytes.items()}
    # the writing host's NIC ingests the FULL triplet stream once —
    # a serial term independent of S (the analog of the reference's
    # single owriter mutex, collate.rs:521)
    host_ingest_s = nnz * 12 / (
        LINK_RATES["dcn_per_host_GBs"] * 1e9
    ) if s > cph else 0.0
    t_ideal = total_compute / s
    t_pred = (
        sum(compute_s.values()) + sum(coll_s.values()) + host_ingest_s
    )
    return {
        "chips": s,
        "fabric": fabric if s <= cph else f"{fabric}+dcn",
        "link_rate_GBs": round(rate / 1e9, 2),
        "collective_bytes_per_chip": {
            k: int(v) for k, v in coll_bytes.items()
        },
        "compute_s": {k: round(v, 4) for k, v in compute_s.items()},
        "collective_s": {k: round(v, 6) for k, v in coll_s.items()},
        "host_ingest_s": round(host_ingest_s, 4),
        "t_ideal_s": round(t_ideal, 4),
        "t_predicted_s": round(t_pred, 4),
        "scaling_efficiency": round(t_ideal / t_pred, 4),
    }
