"""Model-related family tests (SURVEY.md §2.4).

CNN-surgery attacks run on a tiny ResNet-18 (input 32); ViT attacks on a
small ViT config.  Checks eps/bounds constraints plus surgery-specific
gradient semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transferattack_tpu as ta

EPS = 16 / 255

RN = {"model_name": "resnet18", "pretrained": False, "input_size": 32}
VIT = {"model_name": "vit_small_patch16_224", "pretrained": False,
       "input_size": 32}

MR_ATTACKS = [
    ("sgm", dict(RN)),
    ("linbp", dict(RN, linbp_layer="2_0")),
    ("iaa", dict(RN)),
    ("bpa", dict(RN, bpa_layer="2_0")),
    ("ghost", dict(RN)),
    ("dhf", dict(RN, dhf_modules=("layer2_0", "layer2_1"))),
    ("mup", dict(RN, epoch=3)),
    ("awt", dict(RN, num_neighbor=2, epoch=3, sample_chunk=2)),
    ("faug", dict(RN)),
    ("dra", dict(model_name="resnet18", pretrained=False, input_size=32)),
    ("qaa", dict(model_name="resnet18", pretrained=False, input_size=32)),
    ("tgr", dict(VIT, epoch=4)),
    ("pna_patchout", dict(VIT, crop_length=8, sample_num_patches=10, epoch=4)),
    ("sapr", dict(VIT, epoch=4)),
    ("fdap", dict(VIT, epoch=4, blocks=(4, 6))),
]


@pytest.mark.parametrize("name,overrides", MR_ATTACKS, ids=[n for n, _ in MR_ATTACKS])
def test_mr_attack_constraints(toy_batch, name, overrides):
    x, y = toy_batch
    y = y % 1000
    atk = ta.load_attack_class(name)(**overrides)
    delta = np.asarray(atk(x, y))
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= EPS + 1e-5), f"{name}: eps violated"
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5, f"{name}: bounds"
    assert np.any(delta != 0), f"{name}: zero perturbation"


def test_sgm_changes_gradients():
    from transferattack_tpu.models import make_model
    from transferattack_tpu.models.resnet import SurgeryConfig

    x = jnp.ones((1, 32, 32, 3)) * 0.5
    plain = make_model("resnet18", pretrained=False, input_size=32)
    surg = make_model("resnet18", pretrained=False, input_size=32,
                      surgery=SurgeryConfig(gamma=0.2))

    def g(m):
        return jax.grad(lambda xx: m.apply(plain.variables, xx).sum())(x)

    g1 = np.asarray(g(plain))
    g2 = np.asarray(
        jax.grad(lambda xx: surg.module.apply(plain.variables, xx).sum())(x)
    )
    assert not np.allclose(g1, g2)


def test_linbp_relu_identity_backward():
    from transferattack_tpu.models.resnet import linbp_relu

    g = jax.grad(lambda v: linbp_relu(v).sum())(jnp.asarray([-1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])


def test_bpa_softmax_maxpool_grads_flow_to_nonmax():
    from transferattack_tpu.models.resnet import softmax_maxpool

    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    out = softmax_maxpool(x, 10.0)
    # forward must equal a plain 3x3/2 'same' maxpool
    ref = jax.lax.reduce_window(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf),
        -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
    g = jax.grad(lambda v: softmax_maxpool(v, 1.0).sum())(x)
    # softmax backward spreads gradient over non-max elements too
    assert (np.asarray(g) > 0).sum() > 4


def test_quantize_per_channel():
    from transferattack_tpu.model_related.checkpoint_surrogates import (
        quantize_per_channel,
    )

    w = jnp.asarray(np.random.RandomState(0).randn(3, 3, 4, 8).astype(np.float32))
    q = quantize_per_channel(w, 4)
    assert q.shape == w.shape
    # few distinct levels per output channel
    for c in range(8):
        assert len(np.unique(np.round(np.asarray(q[..., c]), 6))) <= 15
    # straight-through: gradient is identity
    g = jax.grad(lambda v: quantize_per_channel(v, 4).sum())(w)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_tgr_attn_truncation_zeroes_extremes():
    from transferattack_tpu.model_related.vit_attacks import tgr_token_bwd

    g = jnp.asarray(np.random.RandomState(0).randn(2, 6, 4).astype(np.float32))
    out = np.asarray(tgr_token_bwd(g, {}, 0.75))
    for b in range(2):
        for c in range(4):
            col = np.asarray(g)[b, :, c]
            assert out[b, col.argmax(), c] == 0
            assert out[b, col.argmin(), c] == 0


def test_tgr_on_visformer(toy_batch):
    """TGR's gradient truncation must run on the hybrid Visformer surrogate
    (the reference's visformer_small branch, ``tgr.py:94-105``)."""
    import transferattack_tpu as ta

    x, y = toy_batch
    atk = ta.load_attack_class("tgr")(
        model_name="visformer_small", pretrained=False, input_size=32, epoch=3
    )
    delta = np.asarray(atk(x, y % 1000))
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    assert np.any(delta != 0)


def test_ghost_inception_dropout_stochastic_forward():
    """Inception ghost (``ghost_networks/inc_v3.py:38-100``): always-on
    dropout after every stem conv / Mixed block, driven by the 'ghost' rng —
    two keys give two different ghost networks."""
    from transferattack_tpu.models import make_model

    m = make_model("inception_v3", pretrained=False, input_size=96,
                   ghost_keep_prob=0.9)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 96, 96, 3), jnp.float32)
    l1 = m.apply(m.variables, x, rngs={"ghost": jax.random.PRNGKey(0)})
    l2 = m.apply(m.variables, x, rngs={"ghost": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # keep_prob=1 (default) is deterministic and needs no rng
    plain = make_model("inception_v3", pretrained=False, input_size=96)
    p1 = plain.apply(plain.variables, x)
    p2 = plain.apply(plain.variables, x)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_ghost_inception_attack_constraints():
    """`ghost` with an inception surrogate builds the dropout ghost family
    (reference default ``ghost.py:40`` is inc_v3 + keep_prob 0.994)."""
    rng = np.random.RandomState(0)
    x = rng.rand(1, 96, 96, 3).astype(np.float32)
    y = rng.randint(0, 1000, (1,)).astype(np.int32)
    atk = ta.load_attack_class("ghost")(
        model_name="inception_v3", ghost_keep_prob=0.9, pretrained=False,
        input_size=96, epoch=2,
    )
    delta = np.asarray(atk(x, y))
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5
    assert np.any(delta != 0)


def test_inception_resnet_v2_builds_and_taps():
    """IncRes-v2 (ghost/DHF surrogate, ``ghost_networks/inc_res_v2.py:251``,
    ``dhf_networks/inc_res_v2.py:158``): timm-layout param count, ghost
    residual-skip stochasticity, and DHF feature taps."""
    from transferattack_tpu.models import make_model

    m = make_model("inc_res", pretrained=False, input_size=96)
    n = sum(v.size for v in jax.tree.leaves(m.variables["params"]))
    assert abs(n - 55_843_464) < 1000  # timm inception_resnet_v2: 55.8M
    x = jnp.asarray(np.random.RandomState(0).rand(1, 96, 96, 3), jnp.float32)
    assert m.apply(m.variables, x).shape == (1, 1000)
    _, f = m.feature(m.variables, x, "repeat_1_3")
    assert f.shape[-1] == 1088
    gm = make_model("inception_resnet_v2", pretrained=False, input_size=96,
                    ghost_range=0.16)
    gm.variables = m.variables
    l1 = gm.apply(gm.variables, x, rngs={"ghost": jax.random.PRNGKey(0)})
    l2 = gm.apply(gm.variables, x, rngs={"ghost": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


@pytest.mark.slow
@pytest.mark.parametrize("surrogate", ["inc_v3", "inc_res"])
def test_ghost_and_dhf_on_inception_family(surrogate):
    """ghost + dhf accept the reference's inc_v3/inc_res surrogate names
    (``ghost.py:40``, ``dhf.py:16-22``) and satisfy attack constraints."""
    rng = np.random.RandomState(0)
    x = rng.rand(1, 128, 128, 3).astype(np.float32)
    y = rng.randint(0, 1000, (1,)).astype(np.int32)
    for name in ("ghost", "dhf"):
        atk = ta.load_attack_class(name)(
            model_name=surrogate, pretrained=False, input_size=128, epoch=2)
        delta = np.asarray(atk(x, y))
        assert np.all(np.abs(delta) <= EPS + 1e-5), f"{name}/{surrogate}"
        assert np.any(delta != 0), f"{name}/{surrogate}"


def test_tgr_on_cait(toy_batch):
    """TGR's cait branch (``tgr.py:223-230``): talking-heads blocks hooked
    like ViT; class-attention stage drops q grads, truncates the per-key
    extreme heads of the (B,h,1,N) attention grad, and truncates k/v."""
    x, y = toy_batch
    atk = ta.load_attack_class("tgr")(
        model_name="cait_s24_224", pretrained=False, input_size=32, epoch=3
    )
    delta = np.asarray(atk(x, y % 1000))
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    assert np.any(delta != 0)


def test_tgr_cls_attn_truncation_zeroes_extreme_heads():
    from transferattack_tpu.model_related.vit_attacks import tgr_cls_attn_bwd

    g = jnp.asarray(np.random.RandomState(0).randn(2, 6, 1, 5).astype(np.float32))
    out = np.asarray(tgr_cls_attn_bwd(g, {}))
    for b in range(2):
        for n in range(5):
            col = np.asarray(g)[b, :, 0, n]
            assert out[b, col.argmax(), 0, n] == 0
            assert out[b, col.argmin(), 0, n] == 0
