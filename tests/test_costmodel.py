"""Collective census + cost model (parallel/costmodel.py, VERDICT r4
Next #5)."""

import numpy as np


def test_census_parses_region_ops():
    from alevin_fry_tpu.parallel.costmodel import census_collectives

    txt = """
  %5 = "stablehlo.all_reduce"(%4) <{replica_groups = dense<[[0,1,2,3,4,5,6,7]]> : tensor<1x8xi64>}> ({
  ^bb0(%a: tensor<i32>, %b: tensor<i32>):
    %s = stablehlo.add %a, %b : tensor<i32>
    stablehlo.return %s : tensor<i32>
  }) : (tensor<4096xi32>) -> tensor<4096xi32>
  %9 = "stablehlo.all_to_all"(%8) <{...}> : (tensor<8x64xi32>) -> tensor<8x64xi32>
"""
    ops = census_collectives(txt)
    assert len(ops) == 2
    ar, a2a = ops
    assert ar.op == "all_reduce" and ar.payload_bytes == 4096 * 4
    assert a2a.op == "all_to_all" and a2a.payload_bytes == 8 * 64 * 4
    # the attr tensor (1x8xi64 = 64 B) must NOT be what's counted
    assert all(o.payload_bytes != 64 for o in ops)


def test_census_program_matches_model():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from alevin_fry_tpu.parallel import costmodel as cm
    from alevin_fry_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    axis = mesh.axis_names[0]
    WL = 128

    def local(b, wl):
        idx = jnp.searchsorted(wl, b)
        idx_c = jnp.minimum(idx, wl.shape[0] - 1)
        hit = wl[idx_c] == b
        cnt = jnp.zeros(wl.shape[0], jnp.int32).at[
            jnp.where(hit, idx_c, 0)
        ].add(hit.astype(jnp.int32))
        return jax.lax.psum(cnt, axis)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
    ))
    ops = cm.census_program(
        fn, jnp.zeros(64, jnp.uint32), jnp.zeros(WL, jnp.uint32)
    )
    ar = [o for o in ops if o.op == "all_reduce"]
    assert ar and max(o.payload_bytes for o in ar) == WL * 4


def test_predict_scaling_shapes():
    from alevin_fry_tpu.parallel.costmodel import predict_scaling

    p8 = predict_scaling(
        n_reads=50_000_000, n_cells=50_000, wl_size=1_000_000,
        nnz=12_000_000,
        single_chip_stage_s={"gpl": 10.0, "collate": 30.0, "quant": 20.0},
        chips=8,
    )
    assert p8["fabric"] == "v5p"
    assert p8["scaling_efficiency"] > 0.9  # ICI is nearly free
    p256 = predict_scaling(
        n_reads=50_000_000, n_cells=50_000, wl_size=1_000_000,
        nnz=12_000_000,
        single_chip_stage_s={"gpl": 10.0, "collate": 30.0, "quant": 20.0},
        chips=256,
    )
    assert p256["fabric"] == "v5p+dcn"
    assert p256["host_ingest_s"] > 0
    # collective-free quant
    assert p256["collective_bytes_per_chip"]["quant_wta_em"] == 0
