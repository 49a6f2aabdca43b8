"""Generation family tests (SURVEY.md §2.6): generator shapes, eps clamp,
frequency-gate math."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transferattack_tpu as ta

EPS = 16 / 255


@pytest.mark.parametrize("name", ["ttp", "m3d", "cdtp", "ltp", "dsva"])
def test_generator_attacks_produce_bounded_delta(name):
    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class(name)()
        delta = np.asarray(atk(x, y, idx=0))
    assert delta.shape == x.shape
    assert np.all(np.abs(delta) <= EPS + 1e-5)


def test_ada_stochastic_latent():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 1000, (2,)).astype(np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("ada")()
        d1 = np.asarray(atk(x, y, key=jax.random.PRNGKey(0)))
        d2 = np.asarray(atk(x, y, key=jax.random.PRNGKey(1)))
    assert not np.allclose(d1, d2)
    assert np.all(np.abs(d1) <= EPS + 1e-5)


def test_aim_guide_conditioning():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    y = np.asarray([3], np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("aim")()
        delta = np.asarray(atk(x, np.stack([y, np.asarray([24])], 1), idx=0))
    assert np.all(np.abs(delta) <= EPS + 1e-5)
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5


def test_fap_block_dct_roundtrip_and_gate():
    from transferattack_tpu.generation.fap import (
        block_dct, block_idct, rgb_to_ycbcr, ycbcr_to_rgb, zigzag_lowfreq_mask,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    u = block_dct(x, 8)
    back = block_idct(u, 8, 16, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
    # color roundtrip
    np.testing.assert_allclose(
        np.asarray(ycbcr_to_rgb(rgb_to_ycbcr(x))), np.asarray(x), atol=1e-4
    )
    m = zigzag_lowfreq_mask(8, 10)
    assert m.shape == (3, 8, 8)
    assert m.sum() == 10  # global top-n, not per-channel
    assert m[0, 0, 0] == 1.0  # luma DC always kept


def test_fap_attack_runs(toy_batch):
    x, y = toy_batch
    atk = ta.load_attack_class("fap")(model_name="toy_cnn", epoch=3, top_n=32)
    delta = np.asarray(atk(x, y))
    # FAP's budget is scaled by 192/top_n (reference ``fap.py:66``)
    assert np.all(np.abs(delta) <= EPS * 192 / 32 + 1e-5)
    assert np.any(delta != 0)


def test_diffattack_latent_optimization_runs():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    y = np.asarray([3], np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("diffattack")(
            model_name="toy_cnn", diffusion_steps=4, start_step=3, iterations=2,
        )
        delta = np.asarray(atk(x, y))
    # unrestricted attack: only validity of the composite image is required
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5
    assert np.any(delta != 0)


@pytest.mark.slow
def test_generator_training_reduces_target_loss(tmp_path, monkeypatch):
    """A few TTP-style training steps must decrease target-class CE, and the
    saved checkpoint must be loadable by the attack."""
    import os

    from tests.make_fake_data import make_fake_dataset
    from transferattack_tpu.generation.train import train_generator

    monkeypatch.setenv("TA_TPU_WEIGHTS_DIR", str(tmp_path))
    root = make_fake_dataset(str(tmp_path / "data"), n=8, size=32,
                             num_classes=10)
    from transferattack_tpu.generation.generators import GeneratorResnet

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        path = train_generator(root, target_class=24, steps=6, batchsize=4,
                               model_name="toy_cnn", ckpt_prefix="ttp_test",
                               log_every=100,
                               generator=GeneratorResnet(data_dim="low"))
    assert os.path.exists(path)
    # the attack picks the checkpoint up through the standard prefix
    atk = ta.load_attack_class("ttp")()
    atk.ckpt_prefix = "ttp_test"
    atk.generator = GeneratorResnet(data_dim="low")
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    delta = np.asarray(atk(x, np.zeros(2, np.int32), idx=0))
    assert np.all(np.abs(delta) <= EPS + 1e-5)


def test_diffattack_attention_control_changes_result():
    """VERDICT r1 item 6: the self-attention preservation + pseudo
    cross-attention variance terms must actually steer the optimization —
    disabling them must change the resulting adversarial image."""
    rng = np.random.RandomState(0)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    y = np.asarray([3], np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        kw = dict(model_name="toy_cnn", diffusion_steps=4, start_step=3,
                  iterations=3)
        on = ta.load_attack_class("diffattack")(**kw)
        off = ta.load_attack_class("diffattack")(
            cross_attn_weight=0.0, self_attn_weight=0.0, **kw)
        d_on = np.asarray(on(x, y))
        d_off = np.asarray(off(x, y))
    assert np.abs(d_on - d_off).max() > 1e-6, \
        "attention-control terms had no effect"


def test_diffattack_sd_backend_runs():
    """The SD backend drives the full pipeline — CLIP prompt encode, VAE
    encode, DDIM invert, CFG decode with AttentionStore (self + text
    cross-attn), latent AdamW, VAE decode — at a tiny config
    (reference ``generation/diffattack.py:38-1766``)."""
    from transferattack_tpu.generation.sd_text import CLIPTextEncoder
    from transferattack_tpu.generation.sd_unet import SDUNet
    from transferattack_tpu.generation.sd_vae import SDVAE

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = np.asarray([3, 5], np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        atk = ta.load_attack_class("diffattack")(
            backend="sd", model_name="toy_cnn",
            diffusion_steps=4, start_step=2, iterations=2, image_size=32,
            unet=SDUNet(block_out_channels=(16, 32), layers_per_block=1,
                        heads=2, cross_attention_dim=16, norm_groups=8),
            vae=SDVAE(block_out_channels=(16, 32), layers_per_block=1,
                      groups=8),
            text=CLIPTextEncoder(vocab_size=49408, width=16, layers=1,
                                 heads=2),
        )
        delta = np.asarray(atk(x, y))
    adv = x + delta
    assert adv.min() >= -1e-5 and adv.max() <= 1 + 1e-5
    assert np.any(delta != 0)
    from transferattack_tpu.utils.weights_manifest import fallback_weights_used

    assert "sd_unet" in fallback_weights_used()
