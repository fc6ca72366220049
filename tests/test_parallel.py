"""Sharding tests on the virtual 8-device CPU mesh: Ulysses attention
equivalence, FSDP param sharding, sequence-parallel DiT forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from more4d_tpu.config import dit_tiny
from more4d_tpu.kernels.flash_attention import xla_attention
from more4d_tpu.models import WanDiT
from more4d_tpu.parallel import (AXIS_SEQ, MeshConfig, create_mesh,
                                 fsdp_sharding, set_mesh, shard_params,
                                 ulysses_attention)


@pytest.fixture(autouse=True)
def _clear_mesh():
    yield
    set_mesh(None)


def test_ulysses_matches_dense_attention():
    mesh = create_mesh(MeshConfig(data=1, fsdp=2, seq=4))
    rng = np.random.RandomState(0)
    b, l, h, d = 2, 32, 4, 16
    q = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)

    ref = xla_attention(q, k, v)
    base = lambda q, k, v, lens: xla_attention(q, k, v, kv_lens=lens)  # noqa

    with mesh:
        out = jax.jit(lambda q, k, v: ulysses_attention(base, q, k, v,
                                                        mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_ulysses_with_kv_lens():
    mesh = create_mesh(MeshConfig(data=1, fsdp=2, seq=4))
    rng = np.random.RandomState(1)
    b, l, h, d = 1, 16, 4, 8
    q = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    lens = jnp.asarray([10], jnp.int32)

    ref = xla_attention(q, k, v, kv_lens=lens)
    base = lambda q, k, v, m: xla_attention(q, k, v, kv_lens=m)  # noqa

    with mesh:
        out = jax.jit(lambda q, k, v: ulysses_attention(
            base, q, k, v, kv_lens=lens, mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_fsdp_sharding_rules():
    mesh = create_mesh(MeshConfig(data=2, fsdp=4, seq=1))
    params = {
        "big": jnp.zeros((256, 1024)),     # shard (1024 % 4 == 0)
        "tiny": jnp.zeros((8,)),           # replicated (below min_size)
        "odd": jnp.zeros((333, 777)),      # no divisible dim -> replicated
    }
    sh = fsdp_sharding(params, mesh, min_size=1024)
    assert sh["big"].spec == P(None, "fsdp")
    assert sh["tiny"].spec == P()
    assert sh["odd"].spec == P()
    placed = shard_params(params, mesh, min_size=1024)
    assert placed["big"].sharding.spec == P(None, "fsdp")


def test_sequence_parallel_dit_forward_matches_single():
    """Full DiT forward with a seq=2 mesh == single-device forward."""
    cfg = dit_tiny(dtype=jnp.float32, num_heads=2, attention_backend="xla")
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 8, 8, 16), jnp.float32)
    y = jnp.asarray(rng.randn(1, 4, 8, 8, cfg.in_dim - 16), jnp.float32)
    t = jnp.asarray([400.0], jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 7, cfg.text_dim), jnp.float32)
    clip = jnp.asarray(rng.randn(1, cfg.clip_tokens, cfg.clip_dim),
                       jnp.float32)
    model = WanDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, y=y, clip_fea=clip)
    leaves, td = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(np.random.RandomState(3).normal(0, 0.05, l.shape),
                         l.dtype) for l in leaves])

    out_single = model.apply(params, x, t, ctx, y=y, clip_fea=clip)

    mesh = create_mesh(MeshConfig(data=1, fsdp=4, seq=2))
    set_mesh(mesh)
    params_sh = shard_params(params, mesh, min_size=256)
    with mesh:
        out_sp = jax.jit(lambda p, x, t, c, y, cl: model.apply(
            p, x, t, c, y=y, clip_fea=cl))(params_sh, x, t, ctx, y, clip)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_single),
                               rtol=2e-4, atol=2e-4)


def test_parse_mesh_spec():
    """--mesh CLI spec -> MeshConfig (docs/MIGRATION.md §5)."""
    import pytest

    from more4d_tpu.parallel import MeshConfig, parse_mesh_spec

    assert parse_mesh_spec(None) is None
    assert parse_mesh_spec("") is None
    cfg = parse_mesh_spec("data=2,fsdp=4")
    assert (cfg.data, cfg.fsdp, cfg.seq) == (2, 4, 1)
    r = parse_mesh_spec("data=2,fsdp=-1").resolve(8)
    assert (r.data, r.fsdp, r.seq) == (2, 4, 1)
    r = parse_mesh_spec("seq=2,fsdp=-1").resolve(8)
    assert (r.data, r.fsdp, r.seq) == (1, 4, 2)
    with pytest.raises(ValueError):
        parse_mesh_spec("tensor=2")


def test_dcn_multislice_mesh():
    """Multi-slice mesh: the leading dcn axis carries data parallelism
    only — batches shard over (dcn x data), parameters shard over fsdp
    alone (so fsdp collectives never cross the slow DCN boundary) — and
    a sharded computation matches the unsharded one."""
    from more4d_tpu.parallel import data_sharding

    mesh = create_mesh(MeshConfig(dcn=2, data=2, fsdp=2, seq=1))
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "fsdp": 2, "seq": 1}

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 16), jnp.float32)
    xs = jax.device_put(x, data_sharding(mesh, ndim=2))
    # batch split 4 ways (dcn*data), replicated over fsdp
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 16)}, shard_shapes

    w = jnp.asarray(rng.randn(16, 32), jnp.float32)
    ws = shard_params({"w": w}, mesh, min_size=1)["w"]
    spec = ws.sharding.spec
    assert "dcn" not in str(spec), f"params must not shard over dcn: {spec}"
    assert "fsdp" in str(spec), f"params must shard over fsdp: {spec}"

    ref = np.asarray(jnp.tanh(x @ w).sum())
    out = jax.jit(lambda a, b: jnp.tanh(a @ b).sum())(xs, ws)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
