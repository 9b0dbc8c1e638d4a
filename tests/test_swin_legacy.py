"""Legacy Swin v1/v2 block smoke tests (support-layer inventory parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from grlir.models.swin import (
    PatchEmbed,
    SwinTransformerBlockV1,
    SwinTransformerBlockV2,
)
from grlir.ops.geometry import (
    get_relative_coords_table,
    get_relative_position_index,
)


def test_swin_v1_block():
    for shift in (False, True):
        blk = SwinTransformerBlockV1(dim=32, window_size=(8, 8), num_heads=4,
                                     shift=shift)
        x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 32)),
                        jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(params, x)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_swin_v2_block():
    table = jnp.asarray(get_relative_coords_table((8, 8)))
    index = jnp.asarray(get_relative_position_index((8, 8)))
    for shift in (False, True):
        blk = SwinTransformerBlockV2(dim=32, window_size=(8, 8), num_heads=4,
                                     shift=shift)
        x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 32)),
                        jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x, table, index)
        y = blk.apply(params, x, table, index)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_patch_embed():
    pe = PatchEmbed(embed_dim=48, patch_size=2, use_norm=True)
    x = jnp.zeros((1, 16, 16, 3))
    params = pe.init(jax.random.PRNGKey(0), x)
    y = pe.apply(params, x)
    assert y.shape == (1, 8, 8, 48)
