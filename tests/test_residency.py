"""Regenerable-params residency (utils/residency.py).

The TPU-native use_memopt has two mechanisms: host swap (checkpoint
weights) and drop/regenerate (random-weight product runs, where params
are a pure function of the build seed).  These tests pin:

  - drop-offload replaces factory-produced trees with the DROPPED
    sentinel (no host download) and restore regenerates bitwise-equal
    trees on device,
  - non-factory trees (checkpoint path) still take the host-swap path
    and the factory-identity guard never drops replaced trees,
  - lazy builds materialize on first use and produce the same video as
    eager builds; Stage1's mid-stage `drop_field` (first-chunk SVD tree)
    is output-neutral across calls.

Tests share one module fixture and run in definition order; the
tree-mutation test is last because it deliberately pollutes the fixture.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingt2v_tpu.config import PipelineConfig
from streamingt2v_tpu.pipeline.build import build_pipeline
from streamingt2v_tpu.utils.residency import DROPPED, is_dropped

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline():
    return build_pipeline(PipelineConfig.tiny(), seed=0)


def _image(cfg):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(cfg.height, cfg.width, 3) * 2 - 1, jnp.float32)


def _tree_equal(a, b) -> bool:
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_dropped_sentinel_is_falsy_and_loud():
    assert not DROPPED
    assert "dropped" in repr(DROPPED)


def test_stage1_drop_offload_and_regenerate_bitwise(pipeline):
    assert pipeline._residency.thunks
    before = pipeline.models.unet_params

    pipeline.offload_params()
    # factory-produced trees are dropped, not downloaded
    assert is_dropped(pipeline.models.unet_params)
    assert not pipeline._residency._host_cache

    pipeline.ensure_on_device()
    assert not is_dropped(pipeline.models.unet_params)
    assert _tree_equal(before, pipeline.models.unet_params)


def test_interpolate_drop_and_host_paths():
    from streamingt2v_tpu.config import VFIConfig
    from streamingt2v_tpu.models.vfi import MultiScaleFlow
    from streamingt2v_tpu.pipeline.interpolate import InterpolatePipeline

    model = MultiScaleFlow(VFIConfig.tiny())
    img = jnp.zeros((1, 32, 32, 3))
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, img, img)
    pipe = InterpolatePipeline(model, params, tta=False)

    # no factory: host path
    pipe.offload_params()
    assert not is_dropped(pipe.params)
    pipe.ensure_on_device()

    # with factory: drop path, bitwise regeneration
    thunk = lambda: jax.jit(model.init)(key, img, img)  # noqa: E731
    pipe.set_param_factory(thunk)
    before = pipe.params
    pipe.offload_params()
    assert is_dropped(pipe.params)
    pipe.ensure_on_device()
    assert _tree_equal(before, pipe.params)


def test_lazy_build_and_drop_field_match_eager(pipeline):
    """One eager run (also drops the SVD tree mid-stage), a second run on
    the same pipeline (regenerates SVD — must be identical), and a lazy
    build (params materialize on first use — must also be identical)."""
    cfg = pipeline.cfg
    img = _image(cfg)
    v1 = np.asarray(pipeline.image_to_video(img, seed=5))
    # image_to_video dropped the first-chunk SVD tree mid-stage
    assert is_dropped(pipeline.models.svd_unet_params)
    v2 = np.asarray(pipeline.image_to_video(img, seed=5))
    np.testing.assert_array_equal(v1, v2)

    lazy = build_pipeline(cfg, seed=0, lazy=True)
    assert is_dropped(lazy.models.unet_params)
    v3 = np.asarray(lazy.image_to_video(img, seed=5))
    np.testing.assert_array_equal(v1, v3)


def test_stage1_replaced_trees_never_dropped(pipeline):
    """Simulates a checkpoint load (tree replaced NOT via the factory):
    the per-field identity guard must route THAT field to the host path
    while the untouched fields still drop (mixed state), and a restore
    must bring every field back on device.  Runs LAST — it leaves the
    fixture's params doubled."""
    pipeline.ensure_on_device()
    new_unet = jax.tree.map(lambda a: a * 2.0, pipeline.models.unet_params)
    pipeline.models = dataclasses.replace(pipeline.models, unet_params=new_unet)

    pipeline.offload_params()
    assert not is_dropped(pipeline.models.unet_params)
    # the OTHER fields are still factory-produced -> dropped, not copied
    assert is_dropped(pipeline.models.controlnet_params)

    # mixed-state restore: replaced tree uploads, dropped trees regenerate
    pipeline.ensure_on_device()
    assert _tree_equal(new_unet, pipeline.models.unet_params)
    for f in pipeline._PARAM_FIELDS:
        tree = getattr(pipeline.models, f)
        assert not is_dropped(tree)
        assert isinstance(jax.tree.leaves(tree)[0], jax.Array), f

    # a replaced-then-host-swapped tree must NEVER be dropped later, even
    # after the factory bookkeeping was refreshed by the regeneration
    pipeline.offload_params()
    assert not is_dropped(pipeline.models.unet_params)
    assert is_dropped(pipeline.models.controlnet_params)
    pipeline.ensure_on_device()
    assert _tree_equal(new_unet, pipeline.models.unet_params)
