"""Geometry library tests.

Oracles here are *independent* brute-force implementations (explicit Python loops
over pixel coordinates), not ports of the reference builders — they verify the
semantics from first principles, mirroring the reference's own self-check style
(ops.py:472-551).
"""

import numpy as np
import pytest

from grlir.ops import geometry as G


def brute_force_region_ids(res, window, shift):
    """Region id per pixel via the three-band slice construction, looped."""
    H, W = res

    def band(c, L, w, s):
        # bands are [0, L-w), [L-w, L-s), [L-s, L); s == 0 puts everything in band 2
        if s == 0:
            return 2
        if c < L - w:
            return 0
        if c < L - s:
            return 1
        return 2

    ids = np.empty((H, W), dtype=np.int64)
    for h in range(H):
        for w in range(W):
            ids[h, w] = 3 * band(h, H, window[0], shift[0]) + band(
                w, W, window[1], shift[1]
            )
    return ids


def brute_force_window_partition(ids, window):
    H, W = ids.shape
    wins = []
    for bh in range(H // window[0]):
        for bw in range(W // window[1]):
            blk = ids[
                bh * window[0]: (bh + 1) * window[0],
                bw * window[1]: (bw + 1) * window[1],
            ]
            wins.append(blk.reshape(-1))
    return np.stack(wins)


@pytest.mark.parametrize(
    "res,window,shift",
    [
        ((16, 16), (8, 8), (4, 4)),
        ((32, 16), (8, 8), (4, 4)),
        ((16, 32), (8, 16), (4, 8)),
        ((16, 16), (8, 16), (4, 0)),
        ((8, 24), (8, 6), (4, 3)),
    ],
)
def test_fill_window_matches_bruteforce(res, window, shift):
    got = G.fill_window(res, window, shift)
    ids = brute_force_region_ids(res, window, shift)
    want = brute_force_window_partition(ids, window)
    np.testing.assert_array_equal(got, want)


def test_calculate_mask_semantics():
    res, window, shift = (16, 16), (8, 8), (4, 4)
    mask = G.calculate_mask(res, window, shift)
    ids = brute_force_window_partition(
        brute_force_region_ids(res, window, shift), window
    )
    nW, N = ids.shape
    assert mask.shape == (nW, N, N)
    for w in range(nW):
        for i in range(N):
            for j in range(N):
                expect = 0.0 if ids[w, i] == ids[w, j] else G.MASK_NEG
                assert mask[w, i, j] == expect


@pytest.mark.parametrize("w2a", [True, False])
def test_calculate_mask_all_semantics(w2a):
    res, window, shift, df = (16, 32), (8, 16), (4, 8), 4
    mask = G.calculate_mask_all(res, window, shift, df, w2a)
    ids_w = brute_force_window_partition(
        brute_force_region_ids(res, window, shift), window
    )
    ares = tuple(r // df for r in res)
    aws = tuple(s // df for s in window)
    ash = tuple(s // df for s in shift)
    ids_a = brute_force_window_partition(
        brute_force_region_ids(ares, aws, ash), aws
    )
    nW = ids_w.shape[0]
    assert mask.shape == (nW, ids_w.shape[1], ids_a.shape[1])[
        :1
    ] + ((ids_w.shape[1], ids_a.shape[1]) if w2a else (ids_a.shape[1], ids_w.shape[1]))
    for w in range(nW):
        a, b = (ids_w, ids_a) if w2a else (ids_a, ids_w)
        for i in range(a.shape[1]):
            for j in range(b.shape[1]):
                expect = 0.0 if a[w, i] == b[w, j] else G.MASK_NEG
                assert mask[w, i, j] == expect


@pytest.mark.parametrize(
    "window,df",
    [((8, 8), 1), ((8, 8), 2), ((8, 8), 4), ((4, 86), 2), ((4, 86), 1), ((8, 32), 4)],
)
@pytest.mark.parametrize("w2a", [True, False])
def test_index_centered_equals_simple(window, df, w2a):
    """Mirror of the reference's own property check (ops.py:472-551)."""
    a = G.get_relative_position_index_centered(window, df, w2a)
    b = G.get_relative_position_index(window, df, w2a)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("window,df", [((8, 8), 1), ((8, 8), 4), ((4, 64), 4)])
@pytest.mark.parametrize("w2a", [True, False])
def test_index_is_displacement_function(window, df, w2a):
    """index[i, j] must be a *bijective function of the 2-D displacement* between
    window token i and anchor token j, laid out row-major in the table."""
    aws = tuple(w // df for w in window)
    idx = G.get_relative_position_index(window, df, w2a)
    Th = window[0] + aws[0] - 1
    Tw = window[1] + aws[1] - 1
    assert idx.min() >= 0 and idx.max() < Th * Tw

    wpos = [(h, w) for h in range(window[0]) for w in range(window[1])]
    apos = [(h, w) for h in range(aws[0]) for w in range(aws[1])]
    seen = {}
    rows, cols = (wpos, apos) if w2a else (apos, wpos)
    for i, p1 in enumerate(rows):
        for j, p2 in enumerate(cols):
            d = (p1[0] - p2[0], p1[1] - p2[1])
            if d in seen:
                assert seen[d] == idx[i, j]
            else:
                seen[d] = idx[i, j]
    # bijective over the displacement range
    assert len(set(seen.values())) == len(seen)


def test_coords_table_properties():
    # symmetric case df=1: table spans [-(w-1), w-1] and is antisymmetric
    t = G.get_relative_coords_table((8, 8))
    assert t.shape == (1, 15, 15, 2)
    np.testing.assert_allclose(t[0, :, :, 0], -t[0, ::-1, :, 0], atol=1e-6)
    np.testing.assert_allclose(t[0, 7, 7], [0.0, 0.0], atol=1e-6)
    # max |coord| maps to 8 -> sign*log2(8+1)/log2(8) = 1.0566
    assert np.abs(t).max() == pytest.approx(np.log2(9.0) / np.log2(8.0), rel=1e-5)

    # asymmetric case df=4, stripe (8, 32): table extents follow ops.py:246-250
    t2 = G.get_relative_coords_table((8, 32), (0, 0), 4)
    assert t2.shape == (1, 8 + 2 - 1, 32 + 8 - 1, 2)


def test_stripe_info():
    # deployed config: stripe_size (8, None), groups (None, 4), df 4
    size, shift = G.get_stripe_info((8, None), (None, 4), True, (64, 128))
    assert size == (8, 32) and shift == (4, 16)
    size, shift = G.get_stripe_info((8, None), (None, 4), False, (64, 128))
    assert size == (8, 32) and shift == (0, 16)
    size, shift = G.get_stripe_info((None, 8), (4, None), True, (64, 128))
    assert size == (16, 8) and shift == (8, 4)
    size, shift = G.get_stripe_info((8, 8), (None, None), True, (64, 64))
    assert size == (8, 8) and shift == (4, 4)
    size, shift = G.get_stripe_info((None, None), (1, 1), True, (64, 64))
    assert size == (64, 64) and shift == (0, 0)


def test_build_geometry_shapes():
    cfg = G.GeometryConfig(
        window_size=(8, 8),
        stripe_size=(8, None),
        stripe_groups=(None, 4),
        anchor_window_down_factor=4,
    )
    assert cfg.pad_size == 16
    g = G.build_geometry(cfg, (64, 64))
    # H-stripe: (8, 16); anchor (2, 4)
    assert g["index_sh_w2a"].shape == (8 * 16, 2 * 4)
    assert g["index_sh_a2w"].shape == (2 * 4, 8 * 16)
    assert g["table_sh"].shape == (1, 8 + 2 - 1, 16 + 4 - 1, 2)
    assert g["mask_w"].shape == (64, 64, 64)
    assert g["mask_sh_w2a"].shape == ((64 // 8) * (64 // 16), 128, 8)
    assert g["mask_sv_a2w"].shape == ((64 // 16) * (64 // 8), 8, 128)
    assert g["index_w"].shape == (64, 64)


def test_compact_geometry_bands_equal_dense_masks():
    """build_geometry_compact band maps inflate to exactly the dense masks
    (the model embeds bands and inflates on device to keep compiled-program
    constants small; window 32 dense masks are 100s of MB)."""
    import numpy as np

    from grlir.ops.geometry import (GeometryConfig, build_geometry,
                                    build_geometry_compact)

    def infl(q, k):
        return np.where(q[:, :, None] != k[:, None, :], -100.0, 0.0).astype(
            np.float32)

    for x_size, w in [((64, 64), (8, 8)), ((64, 96), (8, 8)),
                      ((96, 96), (32, 32))]:
        cfg = GeometryConfig(window_size=w, stripe_size=(8, None),
                             stripe_groups=(None, 4),
                             anchor_window_down_factor=4)
        dense = build_geometry(cfg, x_size)
        comp = build_geometry_compact(cfg, x_size)
        np.testing.assert_array_equal(
            infl(comp["bands_w"], comp["bands_w"]), dense["mask_w"])
        for s in ("sh", "sv"):
            b, ba = comp[f"bands_{s}"], comp[f"bands_{s}_a"]
            np.testing.assert_array_equal(infl(ba, b), dense[f"mask_{s}_a2w"])
            np.testing.assert_array_equal(infl(b, ba), dense[f"mask_{s}_w2a"])
        # non-mask entries identical between the two builders
        for key in dense:
            if not key.startswith("mask_"):
                np.testing.assert_array_equal(comp[key], dense[key])


def test_compiled_program_stays_small_with_big_windows():
    """Lowered program text must not embed dense masks (remote TPU compile
    rejects >~150MB payloads; window-32 masks alone are 268MB)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grlir.models.grl import GRL, GRLConfig

    cfg = GRLConfig(
        embed_dim=16, upscale=1, upsampler="", depths=(1,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=32,
        mlp_ratio=1, stripe_size=(32, 32), stripe_groups=(None, None),
        stripe_shift=True, anchor_window_down_factor=2,
        local_connection=False,
    )
    model = GRL(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    text = jax.jit(model.apply).lower(params, x).as_text()
    # the five dense masks alone would be ~80MB at this size (and 268MB at
    # the GRL-base eval geometry); with band factorization only the
    # window-geometry index constants remain (~13MB text here)
    assert len(text) < 20_000_000, f"lowered program is {len(text)/1e6:.1f} MB"


def test_bias_factors_reconstruct_index():
    """One-hot factors (Py, Px) must reproduce the flat relative-position
    index exactly: index = argmax(Py)*Tw + argmax(Px) (the separability that
    lets the CPB bias be built by two matmuls instead of an N1*N2 gather)."""
    from grlir.ops.geometry import get_bias_factors, get_relative_position_index

    for ws, df, w2a in [((8, 8), 1, True), ((8, 8), 4, True),
                        ((8, 8), 4, False), ((32, 32), 2, False),
                        ((4, 96), 4, False), ((13, 7), 1, True)]:
        idx = get_relative_position_index(ws, df, w2a)
        py, px = get_bias_factors(ws, df, w2a)
        assert (py.sum(-1) == 1).all() and (px.sum(-1) == 1).all()
        tw = px.shape[-1]
        ry, rx = py.argmax(-1), px.argmax(-1)
        flat = (ry[:, None, :, None] * tw + rx[None, :, None, :]).reshape(
            idx.shape)
        np.testing.assert_array_equal(flat, idx)


def test_affine_transform_factored_bias_matches_gather():
    """AffineTransform.bias via one-hot matmuls == via gather (exact fp32)."""
    import jax
    import jax.numpy as jnp

    from grlir.models.blocks import AffineTransform
    from grlir.ops.geometry import (get_bias_factors, get_relative_coords_table,
                                    get_relative_position_index)

    for ws, df, w2a, heads in [((8, 8), 1, True, 2), ((16, 16), 2, False, 3),
                               ((4, 24), 4, True, 2)]:
        table = jnp.asarray(get_relative_coords_table(ws, (0, 0), df))
        index = jnp.asarray(get_relative_position_index(ws, df, w2a))
        factors = tuple(jnp.asarray(f) for f in get_bias_factors(ws, df, w2a))

        at = AffineTransform(heads)
        attn = jnp.zeros((1, 1, heads, *index.shape))
        params = at.init(jax.random.PRNGKey(0), attn, table, index, None)
        gather = at.apply(params, table, index, method=AffineTransform.bias)
        matmul = at.apply(params, table, index, factors,
                          method=AffineTransform.bias)
        assert gather.shape == matmul.shape == (heads, *index.shape)
        np.testing.assert_array_equal(np.asarray(gather), np.asarray(matmul))
