"""Tiled inference sharded over the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grlir.engines.inference import Restorer
from grlir.models.grl import GRL, GRLConfig
from grlir.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_sharded_tiling_matches_single_device():
    cfg = GRLConfig(embed_dim=16, upscale=2, upsampler="pixelshuffledirect",
                    depths=(1,), num_heads_window=(2,), num_heads_stripe=(2,),
                    window_size=8, mlp_ratio=1, stripe_size=(8, None),
                    stripe_groups=(None, 4), stripe_shift=False,
                    anchor_window_down_factor=2, drop_path_rate=0.0)
    model = GRL(cfg)
    img = np.random.default_rng(0).random((1, 64, 80, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img[:, :32, :32]))
    fn = lambda p, x: model.apply(p, x)

    single = Restorer(fn, params, scale=2, tile=32, tile_overlap=8)
    mesh = make_mesh()
    sharded = Restorer(fn, params, scale=2, tile=32, tile_overlap=8, mesh=mesh)
    assert sharded.tile_batch == 8

    a = single(img)
    b = sharded(img)
    assert a.shape == b.shape == (1, 128, 160, 3)
    np.testing.assert_allclose(a, b, atol=1e-5)
