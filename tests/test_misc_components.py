"""LPIPS, classification-mode converters, wrappers, profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_lpips_structure_and_zero_distance():
    from grlir.metrics.lpips import LPIPSVgg

    m = LPIPSVgg()
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, x)
    d_same = np.asarray(m.apply(params, x, x))
    assert d_same.shape == (1,)
    assert d_same[0] == pytest.approx(0.0, abs=1e-6)
    y = jnp.asarray(np.random.default_rng(1).random((1, 32, 32, 3)), jnp.float32)
    d_diff = float(np.asarray(m.apply(params, x, y))[0])
    assert d_diff > 0


def test_lpips_param_names_match_converter():
    from grlir.metrics.lpips import LPIPS_TAPS, LPIPSVgg, VGG16_NAMES

    m = LPIPSVgg()
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.eval_shape(m.init, jax.random.PRNGKey(0), x, x)["params"]
    for i in range(len(LPIPS_TAPS)):
        assert f"lin{i}" in params
    assert "conv1_1" in params and "conv5_3" in params


def test_classification_converters_roundtrip():
    from grlir.utils.classification import (
        img_from_prob_argmax,
        img_from_prob_weighted,
        img_to_class,
        img_to_prob,
    )

    img = jnp.asarray([[[[0.0, 0.5, 1.0]]]])  # (1,1,1,3)
    prob = img_to_prob(img, sigma=1.0)
    assert prob.shape == (1, 1, 1, 3, 256)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, atol=1e-5)
    # argmax recovers the pixel value on the 8-bit grid
    rec = img_from_prob_argmax(prob)
    np.testing.assert_allclose(np.asarray(rec), [[[[0.0, 0.5, 1.0]]]],
                               atol=1.0 / 255)
    rec2 = img_from_prob_weighted(prob)
    np.testing.assert_allclose(np.asarray(rec2)[0, 0, 0, 1], 0.5, atol=0.01)
    assert int(img_to_class(img)[0, 0, 0, 2]) == 255


def test_repeat_dataset():
    from grlir.data.wrappers import RepeatDataset

    class DS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return i

    r = RepeatDataset(DS(), 4)
    assert len(r) == 12
    assert r[7] == 1


def test_cost_analysis_and_timer():
    from grlir.utils.profiling import StepTimer, cost_analysis

    c = cost_analysis(lambda a, b: a @ b,
                      jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert c["flops"] > 0
    t = StepTimer(window=4)
    for _ in range(5):
        t.tick()
    assert t.steps_per_sec > 0


def test_pixel_shuffle_jic_equivalence():
    """reshape-only shuffle on perm-ordered channels == torch-order shuffle."""
    import jax.numpy as jnp
    import numpy as np

    from grlir.ops.layout import (pixel_shuffle, pixel_shuffle_jic,
                                  shuffle_channel_perm)

    rng = np.random.default_rng(0)
    for r, oc in [(2, 5), (3, 4), (4, 3)]:
        x = jnp.asarray(rng.random((2, 6, 9, oc * r * r)), jnp.float32)
        want = np.asarray(pixel_shuffle(x, r))
        perm = shuffle_channel_perm(oc, r)
        got = np.asarray(pixel_shuffle_jic(x[..., perm], r))
        np.testing.assert_array_equal(got, want)


def test_hlo_audit_tool():
    """tools/hlo_audit.py parses HLO text and ranks padded byte footprints."""
    import sys

    sys.path.insert(0, "tools")
    from hlo_audit import audit_text, padded_bytes

    # bf16 (2, 32) trailing dims pad to (16, 128): 32x logical
    assert padded_bytes("bf16", [4, 2, 32]) == 4 * 16 * 128 * 2
    assert padded_bytes("f32", [64, 128]) == 64 * 128 * 4
    hlo = """
HloModule m
ENTRY %main {
  %p = bf16[1,64,3,2,32] parameter(0)
  %c = bf16[1,64,3,2,32] copy(%p)
  ROOT %r = bf16[1,64,192] reshape(%c)
}
"""
    total, kinds, shapes = audit_text(hlo, entry_only=True, top=5)
    assert total > 0
    ops = dict((k, v[1]) for k, v in kinds)
    assert ops.get("copy") == 1 and ops.get("reshape") == 1
