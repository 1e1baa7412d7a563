"""Mesh + sharding tests on the virtual 8-device CPU mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from streamingt2v_tpu.config import MeshConfig
from streamingt2v_tpu.parallel import (
    create_mesh,
    logical_sharding,
    mesh_shape_for,
    shard_params,
    with_sharding,
)


def test_virtual_devices_present():
    assert jax.device_count() >= 8


def test_mesh_creation_shapes():
    mesh = create_mesh(MeshConfig(data=4, seq=1, model=2))
    assert mesh.shape == {"data": 4, "seq": 1, "model": 2}


def test_mesh_shape_for():
    cfg = mesh_shape_for(8, prefer_model=2)
    assert cfg.num_devices == 8 and cfg.model == 2 and cfg.data == 4


def test_logical_sharding_spec():
    mesh = create_mesh(MeshConfig(data=2, seq=2, model=2))
    s = logical_sharding(mesh, ("batch", "frames", "tokens", "heads"))
    assert s.spec == P("data", None, "seq", "model")


def test_sharded_computation_matches_single_device():
    mesh = create_mesh(MeshConfig(data=4, seq=1, model=2))
    x = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)

    @jax.jit
    def f(x):
        y = with_sharding(x, mesh, ("batch", "channels"))
        return jnp.tanh(y) @ jnp.ones((16, 4))

    with mesh:
        out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.tanh(x) @ jnp.ones((16, 4))), rtol=1e-6)


def test_compound_fold_shard_uses_all_axes():
    """A dim that folds several logical axes (the temporal-attention
    (b·s·h) batch) must be sharded by every corresponding mesh axis —
    labeling it `batch` alone forced GSPMD to all-gather the seq-sharded
    tokens axis hidden in the fold (docs/PARALLEL.md)."""
    from streamingt2v_tpu.parallel.sharding import active_mesh, shard

    mesh = create_mesh(MeshConfig(data=2, seq=2, model=2))
    x = jnp.arange(16 * 4 * 8, dtype=jnp.float32).reshape(16, 4, 8)

    @jax.jit
    def f(x):
        return shard(x, ("batch", "tokens", "heads"), None, None) * 2.0

    with mesh, active_mesh(mesh):
        out = f(x)
    assert tuple(out.sharding.spec)[0] == ("data", "seq", "model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)

    # indivisible fold dim -> constraint dropped, not an error
    y = jnp.ones((6, 4, 8))
    with mesh, active_mesh(mesh):
        out = jax.jit(lambda a: shard(a, ("batch", "tokens", "heads"), None, None))(y)
    assert out.sharding.spec in (P(), P(None, None, None))


def test_shard_params_places_on_mesh():
    mesh = create_mesh(MeshConfig(data=4, seq=1, model=2))
    params = {
        "block": {
            "ff_in": {"proj": {"kernel": jnp.ones((64, 128)), "bias": jnp.zeros((128,))},
                      "out": {"kernel": jnp.ones((128, 64))}},
            "attn1": {"to_q": {"kernel": jnp.ones((64, 64))},
                      "to_out": {"kernel": jnp.ones((64, 64)), "bias": jnp.zeros((64,))}},
            "in_conv": {"kernel": jnp.ones((3, 3, 8, 32))},
        }
    }
    placed = shard_params(params, mesh)
    blk = placed["block"]
    # column-parallel: output features on `model`
    assert blk["ff_in"]["proj"]["kernel"].sharding.spec == P(None, "model")
    assert blk["attn1"]["to_q"]["kernel"].sharding.spec == P(None, "model")
    # row-parallel: input features on `model`
    assert blk["ff_in"]["out"]["kernel"].sharding.spec == P("model", None)
    assert blk["attn1"]["to_out"]["kernel"].sharding.spec == P("model", None)
    # biases and convs replicated
    assert blk["ff_in"]["proj"]["bias"].sharding.spec in (P(), P(None))
    assert blk["in_conv"]["kernel"].sharding.spec in (P(), P(None, None, None, None))


@pytest.mark.slow
def test_seq_sharded_transformer_matches_single_device():
    """SP sweep: SpatialVideoTransformer under a data=2/seq=2/model=2 mesh
    with the in-model `shard()` constraints active, at a large-token
    geometry (36x64 = 2304 spatial tokens, the production level-1 shape),
    must match the unsharded forward."""
    import numpy as np
    from streamingt2v_tpu.models.unet_blocks import SpatialVideoTransformer
    from streamingt2v_tpu.parallel.sharding import active_mesh

    B, T, H, W, C = 2, 2, 36, 64, 64
    m = SpatialVideoTransformer(heads=2, dim_head=32, depth=1, context_dim=32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H, W, C), jnp.float32)
    ctx = jnp.asarray(rng.randn(B, T, 1, 32), jnp.float32)
    ioi = jnp.zeros((B, T), bool)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, ctx, ioi)

    ref = jax.jit(m.apply)(params, x, ctx, ioi)

    mesh = create_mesh(MeshConfig(data=2, seq=2, model=2))

    def fwd(params, x, ctx):
        with active_mesh(mesh):
            return m.apply(params, x, ctx, ioi)

    with mesh:
        params_s = shard_params(params, mesh)
        x_s = jax.device_put(x, logical_sharding(mesh, ("batch",)))
        out = jax.jit(fwd)(params_s, x_s, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_sharded_inference_matches_single_device():
    """Multi-chip inference: the streaming denoise step under a DP+TP mesh
    must match the unsharded result (XLA inserts the collectives)."""
    import numpy as np
    from streamingt2v_tpu.config import ControlNetConfig, VideoUNetConfig
    from streamingt2v_tpu.diffusion import denoise
    from streamingt2v_tpu.models.controlnet import ControlNet
    from streamingt2v_tpu.models.video_unet import VideoUNet
    from streamingt2v_tpu.models.wrappers import streaming_wrapper

    ucfg = VideoUNetConfig.tiny(controlnet_mode=True)
    ccfg = ControlNetConfig.tiny()
    unet, cn = VideoUNet(ucfg), ControlNet(ucfg, ccfg)
    rng = np.random.RandomState(0)
    B, T, FC, H, W = 2, 4, 2, 8, 8
    scale = 2 ** (len(ccfg.conditioning_embedding_out_channels) - 1)
    x = jnp.asarray(rng.randn(B, T, H, W, 4), jnp.float32)
    cond = {
        "concat": jnp.asarray(rng.randn(B, T, H, W, 4), jnp.float32),
        "crossattn": jnp.asarray(rng.randn(B, T, 1, ucfg.context_dim), jnp.float32),
        "vector": jnp.asarray(rng.randn(B, T, ucfg.adm_in_channels), jnp.float32),
        "ctrl_frames": jnp.asarray(rng.randn(B, FC, H * scale, W * scale, 3), jnp.float32),
    }
    sigma = jnp.full((B,), 2.0)
    xc = jnp.concatenate([x, cond["concat"]], axis=-1)
    up = unet.init(jax.random.PRNGKey(0), xc, sigma, cond["crossattn"], cond["vector"])
    cp = cn.init(jax.random.PRNGKey(1), xc[:, :FC], sigma,
                 cond["crossattn"][:, :FC, :1], cond["vector"][:, :FC], cond["ctrl_frames"])

    def step(up, cp, x, sigma, cond):
        net = streaming_wrapper(unet, up, cn, cp, FC)
        return denoise(net, x, sigma, cond)

    ref = jax.jit(step)(up, cp, x, sigma, cond)

    mesh = create_mesh(MeshConfig(data=2, seq=1, model=2))
    with mesh:
        up_s = shard_params(up, mesh)
        cp_s = shard_params(cp, mesh)
        batch_sh = logical_sharding(mesh, ("batch",))
        x_s = jax.device_put(x, batch_sh)
        cond_s = {k: jax.device_put(v, batch_sh) for k, v in cond.items()}
        out = jax.jit(step)(up_s, cp_s, x_s, jax.device_put(sigma, batch_sh), cond_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# multi-host (DCN) substrate
# ---------------------------------------------------------------------------

def test_multihost_initialize_single_process_noop():
    from streamingt2v_tpu.parallel import initialize

    initialize()  # no coordinator configured -> must not raise
    assert jax.process_count() == 1


def test_multihost_mesh_single_granule_matches_create_mesh():
    from streamingt2v_tpu.parallel import create_multihost_mesh

    cfg = MeshConfig(data=4, seq=1, model=2)
    m1 = create_multihost_mesh(cfg)
    m2 = create_mesh(cfg)
    assert m1.shape == m2.shape
    assert [d.id for d in m1.devices.flat] == [d.id for d in m2.devices.flat]


def test_multihost_mesh_granule_major_data_axis():
    """Simulated 2-granule topology: the data axis must change granule only
    at the DCN boundary (granule-major), so per-layer seq/model collectives
    never cross granules."""
    from streamingt2v_tpu.parallel import create_multihost_mesh

    devices = jax.devices()[:8]
    mesh = create_multihost_mesh(
        MeshConfig(data=4, seq=1, model=2), devices=devices, num_granules=2
    )
    arr = mesh.devices  # (4, 1, 2)
    granule_of = {d.id: (0 if i < 4 else 1) for i, d in enumerate(devices)}
    rows = [granule_of[d.id] for d in arr[:, 0, 0]]
    assert rows == sorted(rows), rows  # data-major granule blocks
    # seq/model neighbors stay inside one granule
    for i in range(4):
        g = {granule_of[d.id] for d in arr[i].flat}
        assert len(g) == 1, (i, g)


def test_multihost_mesh_rejects_model_over_dcn():
    from streamingt2v_tpu.parallel import create_multihost_mesh

    with pytest.raises(ValueError, match="DCN granule"):
        create_multihost_mesh(
            MeshConfig(data=1, seq=1, model=8),
            devices=jax.devices()[:8], num_granules=2,
        )


def test_process_batch_slice_covers_full_batch():
    from streamingt2v_tpu.parallel import create_multihost_mesh, process_batch_slice

    mesh = create_multihost_mesh(MeshConfig(data=4, seq=1, model=2))
    sl = process_batch_slice(mesh, 16)
    assert (sl.start, sl.stop) == (0, 16)  # single process owns everything


def test_global_batch_from_local_roundtrip():
    from streamingt2v_tpu.parallel import (
        create_multihost_mesh,
        global_batch_from_local,
        process_batch_slice,
    )

    mesh = create_multihost_mesh(MeshConfig(data=4, seq=1, model=2))
    global_batch = 8
    data = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    sl = process_batch_slice(mesh, global_batch)
    arr = global_batch_from_local(mesh, data[sl], global_batch)
    assert arr.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(arr), data)


def test_ring_attention_matches_gathered():
    """Ring (blockwise-KV ppermute) attention over the seq axis ==
    single-device attention (parallel/ring_attention.py); q/k/v stay
    token-sharded, only KV blocks move."""
    from streamingt2v_tpu.ops.attention import dot_product_attention
    from streamingt2v_tpu.parallel.ring_attention import (
        ring_attention, ring_attention_available,
    )

    mesh = create_mesh(MeshConfig(data=2, seq=4, model=1))
    rng = np.random.RandomState(0)
    b, l, d = 4, 512, 64
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    assert ring_attention_available(mesh, b, l, l)

    with mesh:
        out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_moves_only_kv():
    """The compiled ring program contains collective-permutes totalling
    (n-1) x local-KV bytes and NO all-gather of the KV."""
    from streamingt2v_tpu.parallel.ring_attention import ring_attention

    mesh = create_mesh(MeshConfig(data=2, seq=4, model=1))
    b, l, d = 4, 512, 64
    avatars = [jax.ShapeDtypeStruct((b, l, d), jnp.float32)] * 3
    with mesh:
        txt = (
            jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))
            .lower(*avatars).compile().as_text()
        )
    assert "all-gather" not in txt
    n_perm = txt.count(" collective-permute(")
    # 2 tensors (k, v) x (n-1) unrolled hops
    assert n_perm == 2 * 3, txt.count("collective-permute")


def test_ring_attention_production_shard_shapes():
    """Ring attention at the PRODUCTION token geometry of the shipped
    (2,4,1) mapping: L=9216 spatial tokens sharded 9216/4 = 2304 per
    device (docs/PARALLEL.md).  Row count is reduced (the full 250-row
    gathered reference does not fit a CPU host) — the per-device TOKEN
    shard shape is the production one.  Exactness vs the single-device
    einsum reference."""
    from streamingt2v_tpu.ops.attention import dot_product_attention
    from streamingt2v_tpu.parallel.ring_attention import (
        ring_attention, ring_attention_available,
    )

    mesh = create_mesh(MeshConfig(data=2, seq=4, model=1))
    rng = np.random.RandomState(1)
    b, l, d = 4, 9216, 64
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    assert ring_attention_available(mesh, b, l, l)

    with mesh:
        out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_attention_dispatch_routes_to_ring_by_default():
    """With a multi-seq mesh active, the flash-geometry dispatch in
    ops/attention.py must take the ring path by default: the compiled
    program rotates KV via collective-permute and contains NO all-gather
    (the pre-round-5 gather/batch-redistribution fallback)."""
    from streamingt2v_tpu.ops.attention import attention_pre_split
    from streamingt2v_tpu.parallel.sharding import active_mesh

    mesh = create_mesh(MeshConfig(data=2, seq=4, model=1))
    b, l, d = 8, 512, 64
    avatars = [jax.ShapeDtypeStruct((b, l, d), jnp.float32)] * 3
    with mesh, active_mesh(mesh):
        txt = (
            jax.jit(lambda q, k, v: attention_pre_split(
                q, k, v, backend="flash"))
            .lower(*avatars).compile().as_text()
        )
    assert " collective-permute(" in txt
    assert "all-gather" not in txt


def test_attention_dispatch_ring_opt_out(monkeypatch):
    """STREAMINGT2V_RING_ATTN=0 disables the ring path (falls back to the
    batch-redistribution flash path, which needs real TPU Pallas — so the
    gate itself is what is checked here)."""
    from streamingt2v_tpu.ops.attention import _maybe_ring

    mesh = create_mesh(MeshConfig(data=2, seq=4, model=1))
    b, l, d = 8, 512, 64
    q = jnp.asarray(np.random.RandomState(2).randn(b, l, d), jnp.float32)
    monkeypatch.setenv("STREAMINGT2V_RING_ATTN", "0")
    assert _maybe_ring(q, q, q, mesh) is None
    monkeypatch.delenv("STREAMINGT2V_RING_ATTN")
    with mesh:
        out = _maybe_ring(q, q, q, mesh)
    assert out is not None and out.shape == q.shape
