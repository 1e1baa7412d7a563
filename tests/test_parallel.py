"""Mesh + sharding tests on the virtual 8-device CPU mesh."""

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


def test_shard_params_places_on_mesh():
    mesh = create_mesh(MeshConfig(data=4, seq=1, model=2))
    params = {"block": {"ff_in": {"kernel": jnp.ones((64, 128)), "bias": jnp.zeros((128,))}}}
    placed = shard_params(params, mesh)
    kernel_sharding = placed["block"]["ff_in"]["kernel"].sharding
    assert kernel_sharding.spec == P(None, "model")
