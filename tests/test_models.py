"""Structural and numerical tests for the three networks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.models import GeneratorNet, RecoverNet, PWCNet


def _count(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_generator_shapes_and_range(rng):
    model = GeneratorNet()
    img = jnp.zeros((2, 48, 96, 3))
    flow = jnp.zeros((2, 48, 96, 2))
    variables = model.init(rng, img, flow)
    mask = model.apply(variables, img, flow)
    assert mask.shape == (2, 48, 96, 1)
    m = np.asarray(mask)
    assert (m >= 0).all() and (m <= 1).all()
    # Zero input -> softmax of equal logits -> 0.5 everywhere.
    np.testing.assert_allclose(m, 0.5, atol=1e-6)


def test_generator_param_count(rng):
    # Layer schedule of nets.py:4-42 with cnum=32: conv kernels+biases+BN
    # gamma/beta. Conv param math: sum(k*k*cin*cout + cout) over 17 convs
    # (incl. the two upsample convs) plus 2 * channels of BN params.
    model = GeneratorNet()
    variables = model.init(rng, jnp.zeros((1, 32, 64, 3)), jnp.zeros((1, 32, 64, 2)))
    convs = [
        (5, 5, 32), (3, 32, 64), (3, 64, 64), (3, 64, 128), (3, 128, 128),
        (3, 128, 128), (3, 128, 128), (3, 128, 128), (3, 128, 128),
        (3, 128, 128), (3, 128, 128), (3, 128, 128), (3, 128, 64),
        (3, 64, 64), (3, 64, 32), (3, 32, 16), (3, 16, 2),
    ]
    want = sum(k * k * ci * co + co + 2 * co for k, ci, co in convs)
    assert _count(variables["params"]) == want
    # frozen BN statistics live outside params
    stats = _count(variables["batch_stats"])
    assert stats == sum(2 * co for _, _, co in convs)


def test_recover_shapes(rng):
    model = RecoverNet()
    img = jnp.zeros((2, 192, 384, 3))
    flow = jnp.zeros((2, 192, 384, 2))
    mask = jnp.zeros((2, 192, 384, 1))
    variables = model.init(rng, img, flow, mask)
    out = model.apply(variables, img, flow, mask)
    assert out.shape == (2, 192, 384, 2)


def test_recover_param_count(rng):
    model = RecoverNet()
    variables = model.init(
        rng, jnp.zeros((1, 64, 128, 3)), jnp.zeros((1, 64, 128, 2)),
        jnp.zeros((1, 64, 128, 1)),
    )
    f = 0.25
    ch = lambda n: int(n * f)
    C = 2
    convs = [
        # image encoder
        (7, 3, ch(64)), (5, ch(64), ch(128)), (5, ch(128), ch(256)),
        (3, ch(256), ch(256)), (3, ch(256), ch(512)), (3, ch(512), ch(512)),
        (3, ch(512), ch(512)), (3, ch(512), ch(512)), (3, ch(512), ch(512)),
        # flow encoder (input = flow 2 + ones 1 + 1-mask 1 = 4 channels)
        (7, 4, ch(64)), (5, ch(64), ch(128)), (5, ch(128), ch(256)),
        (3, ch(256), ch(256)), (3, ch(256), ch(512)), (3, ch(512), ch(512)),
        (3, ch(512), ch(512)), (3, ch(512), ch(512)), (3, ch(512), ch(512)),
        # decoder
        (4, ch(512) * 2, ch(512)),                 # deconv5
        (3, ch(512) * 3, C),                       # flow5
        (4, ch(512) * 3, ch(512)),                 # deconv4
        (4, C, C),                                 # upflow4
        (3, ch(512) * 3 + C, C),                   # flow4
        (4, ch(512) * 3 + C, ch(256)),             # deconv3
        (4, C, C),                                 # upflow3
        (3, ch(256) * 3 + C, C),                   # flow3
        (4, ch(256) * 3 + C, ch(128)),             # deconv2
        (4, C, C),                                 # upflow2
        (3, ch(128) * 3 + C, C),                   # flow2
        (4, ch(128) * 3 + C, ch(64)),              # deconv1
        (4, C, C),                                 # upflow1
        (5, ch(64) * 3 + C, C),                    # flow1
    ]
    want = sum(k * k * ci * co + co for k, ci, co in convs)
    assert _count(variables["params"]) == want


def test_pwcnet_shapes(rng):
    model = PWCNet()
    img1 = jnp.zeros((1, 128, 192, 3))
    img2 = jnp.zeros((1, 128, 192, 3))
    variables = model.init(rng, img1, img2)
    flow, pyr = model.apply(variables, img1, img2, return_pyramid=True)
    assert flow.shape == (1, 128, 192, 2)
    assert len(pyr) == 5  # levels 6..2
    assert pyr[0].shape == (1, 2, 3, 2)
    assert pyr[-1].shape == (1, 32, 48, 2)


def test_pwcnet_param_count(rng):
    # The reference documents 9,374,274 + 2,069,000 ~ with both dense and
    # residual connections (model_pwcnet.py:15-18, counts without resp. with
    # each option). Cross-check our exact analytic count.
    model = PWCNet()
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))

    def conv_p(k, ci, co):
        return k * k * ci * co + co

    want = 0
    # feature pyramid
    chans = [3, 16, 32, 64, 96, 128, 196]
    for lvl in range(1, 7):
        want += conv_p(3, chans[lvl - 1], chans[lvl])
        want += 2 * conv_p(3, chans[lvl], chans[lvl])
    # estimators + context nets per level
    nd = 81
    extra = {6: 0, 5: 128 + 4, 4: 96 + 4, 3: 64 + 4, 2: 32 + 4}
    for lvl in range(6, 1, -1):
        od = nd + extra[lvl]
        x = od
        for f in (128, 128, 96, 64, 32):
            want += conv_p(3, x, f)
            x += f
        want += conv_p(3, x, 2)  # flow head
        # context
        ci = x
        for f, in_ in ((128, ci), (128, 128), (128, 128), (96, 128), (64, 96), (32, 64)):
            want += conv_p(3, in_, f)
        want += conv_p(3, 32, 2)
        if lvl != 2:
            want += 4 * 4 * 2 * 2 + 2        # up_flow
            want += 4 * 4 * 2 * x + 2        # up_feat
    assert _count(variables["params"]) == want


def test_pwcnet_translation_flow_direction(rng):
    # A shifted random texture: flow should broadly point along the shift.
    rng_np = np.random.RandomState(0)
    base = rng_np.rand(80, 140, 3).astype(np.float32)
    base = np.repeat(np.repeat(base, 2, 0), 2, 1)[:128, :256]  # smooth texture
    shift = 6
    img1 = base[:, :-shift][None, :, :192]
    img2 = base[:, shift:][None, :, :192]
    model = PWCNet()
    variables = model.init(rng, jnp.asarray(img1) - 0.5, jnp.asarray(img2) - 0.5)
    flow = model.apply(variables, jnp.asarray(img1) - 0.5, jnp.asarray(img2) - 0.5)
    assert np.isfinite(np.asarray(flow)).all()
