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


def test_shape_bucketing_compiles_one_program():
    """shape_bucket pads assorted image sizes to canonical shapes: outputs
    match the unbucketed path near the valid region and only one program is
    compiled per bucket (SURVEY.md §7 padded-shape discipline)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grlir.engines.inference import Restorer

    calls = []

    def apply_fn(params, x):
        # shape-polymorphic stand-in model: records traced shapes
        calls.append(tuple(x.shape))
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    r = Restorer(apply_fn, params=None, scale=2, shape_bucket=16)
    rng = np.random.default_rng(0)
    shapes = [(1, 30, 41, 3), (1, 31, 47, 3), (1, 17, 33, 3)]
    for s in shapes:
        x = rng.random(s).astype(np.float32)
        y = r(x)
        assert y.shape == (1, s[1] * 2, s[2] * 2, 3)
        # interior matches plain upsampling (padding only affects the pad area)
        ref = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
        np.testing.assert_allclose(y, ref, atol=1e-6)
    # 30x41 and 31x47 both bucket to 32x48; 17x33 to 32x48 too -> ONE shape
    assert set(calls) == {(1, 32, 48, 3)}, calls

    # probe: image smaller than one bucket pad (pad wider than image -> edge)
    tiny = rng.random((1, 3, 5, 3)).astype(np.float32)
    y = r(tiny)
    assert y.shape == (1, 6, 10, 3)
    assert np.isfinite(y).all()


def test_reflect_pad_to_single_reflect_invariant():
    """Padding to the canonical shape must equal ONE reflect from the true
    size — a chained member->max->bucket pad produces different content and
    (because stripe attention is global) a different restored image."""
    import numpy as np

    from grlir.engines.inference import reflect_pad_to

    rng = np.random.default_rng(0)
    im = rng.random((30, 41, 3)).astype(np.float32)
    direct = reflect_pad_to(im, (32, 48))
    chained = reflect_pad_to(reflect_pad_to(im, (31, 47)), (32, 48))
    assert direct.shape == chained.shape == (32, 48, 3)
    assert not np.array_equal(direct, chained)  # chained pads differ...
    # ...and the valid region is untouched either way
    np.testing.assert_array_equal(direct[:30, :41], im)
    # exact reflect semantics on a known row
    np.testing.assert_array_equal(direct[30], direct[28])
    np.testing.assert_array_equal(direct[31], direct[27])
    # tiny image falls back to edge padding
    tiny = rng.random((2, 3, 3)).astype(np.float32)
    out = reflect_pad_to(tiny, (8, 8))
    np.testing.assert_array_equal(out[7, 7], tiny[1, 2])
    # batch form pads the trailing spatial dims
    b = reflect_pad_to(rng.random((2, 30, 41, 3)).astype(np.float32), (32, 48))
    assert b.shape == (2, 32, 48, 3)
