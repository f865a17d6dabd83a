"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
same-seed single-device vs multi-device renders must agree)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.integrator.smallpt import render_smallpt_accumulation
from bifrost3d_tpu.parallel import make_sharded_smallpt, render_mesh
from bifrost3d_tpu.scene import smallpt_scene


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return render_mesh(jax.devices()[:8])


class TestShardedRender:
    def test_matches_single_device(self, mesh8):
        """Sharded and single-device renders of the same accumulation are
        identical — the sharding only partitions pixel rows."""
        scene = smallpt_scene()
        render = make_sharded_smallpt(mesh8, 32, 24)
        sharded = np.asarray(render(scene, jnp.uint32(1)))
        single = np.asarray(render_smallpt_accumulation(scene, 32, 24, 1))
        np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)

    def test_non_divisible_height(self, mesh8):
        """Heights that don't divide the mesh get padded and cropped."""
        scene = smallpt_scene()
        render = make_sharded_smallpt(mesh8, 16, 13)
        sharded = np.asarray(render(scene, jnp.uint32(2)))
        single = np.asarray(render_smallpt_accumulation(scene, 16, 13, 2))
        assert sharded.shape == (13, 16, 3)
        np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)

    def test_output_is_row_sharded(self, mesh8):
        scene = smallpt_scene()
        render = make_sharded_smallpt(mesh8, 16, 16)
        out = render(scene, jnp.uint32(1))
        shard_rows = {int(s.index[0].start or 0) for s in out.addressable_shards}
        assert len(shard_rows) == 8
