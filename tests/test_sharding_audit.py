"""Compiled-sharding audit tests (round-2 VERDICT #2).

Lower and compile the production-STRUCTURE walk on the 8-device virtual
CPU mesh and assert on the OPTIMIZED HLO: the batch dim stays sharded
through the hot loop (no activation all-gathers), with collectives only
where the math needs them (batch-mean loss reductions). The audited
programs use small spatial shapes (CPU compiles of the 256² program are
intractable) but the same graph structure: the fast fixture runs the
fp32 32² walk, and a slow test re-audits with the production bf16
top-block mixed precision enabled (the one structural difference —
dtype casts at block boundaries give GSPMD extra resharding points).
Also proves the detector itself works by compiling a program with a
deliberate mid-graph replication and checking the audit flags it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentaugment_tpu import benchmark
from latentaugment_tpu.parallel import audit, mesh as pmesh


# ----------------------------------------------------------------------------
# Census parser unit tests (no compilation needed)

def test_census_parses_hlo_shapes():
    hlo = """
  %ag.1 = f32[16,2,32,32]{3,2,1,0} all-gather(%p0), channel_id=1
  %ar.2 = (f32[], f32[64]) all-reduce(f32[] %a, f32[64] %b), channel_id=2
  %cp.3 = f32[4,8] collective-permute(f32[4,8] %x), channel_id=3
  %ars.4 = f32[] all-reduce-start(f32[] %y), channel_id=4
  %add.5 = f32[64] add(f32[64] %u, f32[64] %v)
"""
    census = audit.collective_census(hlo)
    # The {layout} suffix on non-scalar results must not hide the op.
    assert census["all-gather"] == [16 * 2 * 32 * 32]
    assert sorted(census["all-reduce"]) == [1, 65]
    assert census["collective-permute"] == [32]
    assert "add" not in census


def test_census_parses_tpu_tiled_layouts():
    """Real-TPU HLO layouts contain parens (tiling T(8,128), memory
    space S(1)) inside the {layout} suffix, and async collectives have
    tuple shapes; a paren-naive shape matcher misses these entirely and
    the audit false-passes on hardware (round-3 review)."""
    hlo = """
  %ag.1 = f32[16,2,32,32]{3,2,1,0:T(8,128)} all-gather(%p0), channel_id=1
  %ags.2 = (f32[16,64]{1,0:T(8,128)S(1)}, f32[128,64]{1,0:T(8,128)}) all-gather-start(f32[16,64] %x), channel_id=2
  %agd.3 = f32[128,64]{1,0:T(8,128)} all-gather-done((f32[16,64], f32[128,64]) %ags.2)
  %ar.4 = bf16[64]{0:T(512)(2,1)} all-reduce(bf16[64] %y), channel_id=3
"""
    census = audit.collective_census(hlo)
    assert census["all-gather"] == [16 * 2 * 32 * 32, 16 * 64 + 128 * 64]
    # The -done half repeats the -start's payload: counted once.
    assert len(census["all-gather"]) == 2
    assert census["all-reduce"] == [64]
    # A de-sharded activation behind a tiled tuple must still hard-fail.
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        audit.audit_walk_collectives(census)


def test_audit_flags_large_gather_and_passes_small_reduce():
    ok = {"all-reduce": [1, 64], "all-gather": [128]}
    audit.audit_walk_collectives(ok)  # no raise
    bad = {"all-gather": [2 * 2 * 256 * 256]}
    with pytest.raises(AssertionError, match="batch dim is not sharded"):
        audit.audit_walk_collectives(bad)
    bad_reduce = {"all-reduce": [1 << 25]}
    with pytest.raises(AssertionError, match="all-reduce of"):
        audit.audit_walk_collectives(bad_reduce)


# ----------------------------------------------------------------------------
# The real walk program on the 8-device mesh

@pytest.fixture(scope="module")
def compiled_walk():
    from latentaugment_tpu.ops.upfirdn2d import set_allow_pallas_blur

    set_allow_pallas_blur(False)
    mesh = pmesh.get_mesh(8)
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=2,
        crop_size=16, manifold_items=8)
    batch = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    bundle = jax.device_put(bundle, repl)
    walk = jax.jit(fns.walk,
                   in_shardings=(repl, batch, repl, repl),
                   out_shardings=(batch, batch, repl))
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg,
                                                          batch_size=16)
    w0 = jax.device_put(w0, batch)
    return walk.lower(bundle, w0, crop_pos, synth_key).compile()


def test_walk_hlo_has_no_activation_gathers(compiled_walk):
    census = audit.audit_compiled_walk(compiled_walk)
    # The program is genuinely distributed: the batch-mean loss reductions
    # must appear as cross-device all-reduces.
    assert census.get("all-reduce"), \
        f"expected loss-reduction all-reduces, census: {census}"


def test_walk_output_stays_batch_sharded(compiled_walk):
    shardings = compiled_walk.output_shardings
    img_spec = shardings[0].spec
    assert img_spec[0] is not None and "data" in str(img_spec[0]), \
        f"final image lost its batch sharding: {img_spec}"


@pytest.mark.slow
def test_walk_hlo_audit_with_bf16_blocks():
    """Re-audit with num_fp16_res>0 (the production bench/engine setting):
    bf16 casts at the top-block boundaries are the only structural
    difference between the fast 32² fp32 audit and the real 256² program,
    and each cast is a point where GSPMD could insert a resharding."""
    from latentaugment_tpu.ops.upfirdn2d import set_allow_pallas_blur

    set_allow_pallas_blur(False)
    mesh = pmesh.get_mesh(8)
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=64, channel_base=2048, channel_max=64, num_epochs=2,
        crop_size=32, manifold_items=8, num_fp16_res=2)
    assert g_cfg.num_fp16_res == 2  # bf16 blocks actually on
    batch = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    bundle = jax.device_put(bundle, repl)
    walk = jax.jit(fns.walk,
                   in_shardings=(repl, batch, repl, repl),
                   out_shardings=(batch, batch, repl))
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg,
                                                          batch_size=16)
    w0 = jax.device_put(w0, batch)
    compiled = walk.lower(bundle, w0, crop_pos, synth_key).compile()
    census = audit.audit_compiled_walk(compiled)
    assert census.get("all-reduce"), \
        f"expected loss-reduction all-reduces, census: {census}"


# ----------------------------------------------------------------------------
# Detector sensitivity: a deliberate mid-graph replication must be caught

def test_audit_catches_deliberate_activation_gather():
    mesh = pmesh.get_mesh(8)
    batch = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)

    def bad_fn(x):
        # Replicate a big activation: a batch-sharded input forced to a
        # replicated intermediate that the output depends on elementwise,
        # so GSPMD must materialize the all-gather (a reduction consumer
        # lets it elide the constraint shard-wise — measured).
        y = jax.lax.with_sharding_constraint(x * 2.0, repl)
        return y + 1.0

    x = jax.device_put(jnp.ones((16, 2, 64, 64), jnp.float32), batch)
    compiled = jax.jit(bad_fn, in_shardings=(batch,),
                       out_shardings=repl).lower(x).compile()
    census = audit.collective_census(compiled.as_text())
    with pytest.raises(AssertionError, match="batch dim is not sharded"):
        audit.audit_walk_collectives(census)


# ----------------------------------------------------------------------------
# Per-device FLOPs scaling audit (round-3 VERDICT #3): the census catches
# bad collectives; this catches the other silent scaling killer —
# replicated compute.

def _matmul_pipeline(w, x):
    return jnp.tanh(x @ w) @ w


def test_flops_scale_inverse_with_mesh_size():
    """Per-partition FLOPs must be ~1/N of the single-device program at
    the same global batch, for every mesh size the box can form."""
    w = np.random.RandomState(0).randn(128, 128).astype(np.float32)
    x = np.random.RandomState(1).randn(64, 128).astype(np.float32)
    single = jax.jit(_matmul_pipeline).lower(w, x).compile()
    f1 = audit.flops_per_device(single)
    assert f1 > 0
    for n in (2, 4, 8):
        mesh = pmesh.get_mesh(n)
        batch = pmesh.batch_sharding(mesh)
        repl = pmesh.replicated(mesh)
        sharded = jax.jit(_matmul_pipeline, in_shardings=(repl, batch),
                          out_shardings=batch).lower(w, x).compile()
        per_dev, got_single = audit.audit_flops_scaling(sharded, single, n)
        assert abs(per_dev - f1 / n) / (f1 / n) < 0.2, (n, per_dev, f1)


def test_flops_audit_catches_replicated_compute():
    """A program whose inputs/outputs are replicated makes every device
    do the FULL work — collective-clean, correct, zero scaling. The
    FLOPs audit must flag it."""
    w = np.random.RandomState(0).randn(128, 128).astype(np.float32)
    x = np.random.RandomState(1).randn(64, 128).astype(np.float32)
    single = jax.jit(_matmul_pipeline).lower(w, x).compile()
    mesh = pmesh.get_mesh(8)
    repl = pmesh.replicated(mesh)
    replicated_prog = jax.jit(_matmul_pipeline, in_shardings=(repl, repl),
                              out_shardings=repl).lower(w, x).compile()
    # Sanity: it really is collective-clean.
    audit.audit_walk_collectives(
        audit.collective_census(replicated_prog.as_text()))
    with pytest.raises(AssertionError, match="replicated across the mesh"):
        audit.audit_flops_scaling(replicated_prog, single, 8)


def test_hybrid_mesh_batch_sharding_spans_both_axes():
    """('dcn','data') hybrid mesh: batch_sharding shards dim0 over BOTH
    axes and the audit applies unchanged (multi-slice DP, SURVEY §2.6)."""
    from jax.sharding import PartitionSpec as P

    mesh = pmesh.get_hybrid_mesh(2)  # 2 x 4 on the 8 virtual devices
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, 4)
    assert pmesh.batch_sharding(mesh).spec == P(("dcn", "data"))
    # 1-D meshes keep their spec (P over the single data axis).
    assert pmesh.batch_sharding(pmesh.get_mesh(8)).spec == P(("data",))
    with pytest.raises(ValueError, match="divide"):
        pmesh.get_hybrid_mesh(3)
