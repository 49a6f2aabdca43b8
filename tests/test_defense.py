"""Defense suite tests (SURVEY.md §2.8) with tiny configs + random weights."""
import os
import warnings

import jax
import numpy as np
import pytest

from tests.make_fake_data import make_fake_dataset


@pytest.fixture(scope="module")
def fake_attack_dir(tmp_path_factory):
    """A fake input dir plus an 'adversarial' output dir of noisy copies."""
    root = tmp_path_factory.mktemp("def")
    input_dir = make_fake_dataset(str(root / "data"), n=6, size=32,
                                  num_classes=10, targeted=True)
    out_dir = str(root / "adv")
    os.makedirs(out_dir, exist_ok=True)
    from transferattack_tpu.utils.data import AdvDataset, save_images

    ds = AdvDataset(input_dir=input_dir)
    rng = np.random.RandomState(0)
    for xs, ys, names in ds.as_batches(6):
        adv = np.clip(xs + rng.uniform(-16 / 255, 16 / 255, xs.shape), 0, 1)
        save_images(out_dir, adv.astype(np.float32), names)
    return input_dir, out_dir


def test_scoring_roundtrip(tmp_path):
    from transferattack_tpu.defense.scoring import asr_from_labels, write_label_csv
    import csv

    label_file = tmp_path / "labels.csv"
    with open(label_file, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "label"])
        for i in range(4):
            w.writerow([f"i{i}.png", i + 1])  # 1-indexed ground truth
    # predictions 0-indexed: 2 correct, 2 wrong
    preds = {"i0.png": 0, "i1.png": 1, "i2.png": 9, "i3.png": 9}
    out = tmp_path / "pred.csv"
    write_label_csv(str(out), preds)
    asr = asr_from_labels(str(label_file), str(out))
    assert abs(asr - 50.0) < 1e-6


def test_rs_smooth_predict(fake_attack_dir):
    from transferattack_tpu.defense.rs import Smooth
    from transferattack_tpu.models import make_model

    m = make_model("toy_cnn", pretrained=False)
    smooth = Smooth(m, num_classes=10, sigma=0.25)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    preds = smooth.predict(x, jax.random.PRNGKey(0), n=100, alpha=0.1, chunk=20)
    assert preds.shape == (2,)
    assert all(p == -1 or 0 <= p < 10 for p in preds)


def test_nrp_purify_writes_pngs(fake_attack_dir, tmp_path):
    input_dir, out_dir = fake_attack_dir
    from transferattack_tpu.defense.nrp import run_nrp

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        purified = run_nrp(input_dir, out_dir, str(tmp_path / "purified"),
                           batchsize=6, nb=2)
    assert len(os.listdir(purified)) == 6


def test_at_and_hgd_emit_csv(fake_attack_dir):
    input_dir, out_dir = fake_attack_dir
    from transferattack_tpu.defense.at import run_at, run_hgd
    from transferattack_tpu.defense.scoring import asr_from_labels

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        csv_at = run_at(input_dir, out_dir, batchsize=6, model_name="toy_cnn",
                        out_csv="at.csv")
        csv_hgd = run_hgd(input_dir, out_dir, batchsize=6,
                          model_name="toy_cnn", out_csv="hgd.csv")
    for path in (csv_at, csv_hgd):
        asr = asr_from_labels(os.path.join(input_dir, "labels.csv"), path)
        assert 0.0 <= asr <= 100.0


def test_diffpure_runs_tiny(fake_attack_dir):
    input_dir, out_dir = fake_attack_dir
    from transferattack_tpu.defense.diffpure import run_diffpure
    from transferattack_tpu.defense.scoring import asr_from_labels

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        csv_dp = run_diffpure(input_dir, out_dir, batchsize=6, t_star=5,
                              model_name="toy_cnn", out_csv="dp.csv")
    asr = asr_from_labels(os.path.join(input_dir, "labels.csv"), csv_dp)
    assert 0.0 <= asr <= 100.0


def test_upfirdn_identity_and_fused_act():
    import jax.numpy as jnp
    from transferattack_tpu.ops.upfirdn import (
        downsample_2d, fused_leaky_relu, upfirdn2d, upsample_2d,
    )

    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 2).astype(np.float32))
    # identity kernel
    out = upfirdn2d(x, jnp.ones((1, 1)), up=1, down=1, pad=(0, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    up = upsample_2d(x)
    assert up.shape == (1, 16, 16, 2)
    down = downsample_2d(x)
    assert down.shape == (1, 4, 4, 2)
    # DC preservation: a constant image stays constant in the interior
    const = jnp.ones((1, 8, 8, 2))
    up_c = np.asarray(upsample_2d(const))[0, 4:-4, 4:-4]
    np.testing.assert_allclose(up_c, 1.0, rtol=1e-4)
    act = fused_leaky_relu(x, bias=jnp.ones((2,)))
    assert act.shape == x.shape


def test_rs_certify_radius():
    from transferattack_tpu.defense.rs import Smooth
    from transferattack_tpu.models import make_model

    m = make_model("toy_cnn", pretrained=False)
    smooth = Smooth(m, num_classes=10, sigma=0.25)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    preds, radii = smooth.certify(x, jax.random.PRNGKey(0), n0=40, n=120,
                                  alpha=0.05, chunk=20)
    assert preds.shape == radii.shape == (2,)
    for p, r in zip(preds, radii):
        if p == Smooth.ABSTAIN:
            assert r == 0.0
        else:
            assert 0 <= p < 10 and r >= 0.0


def test_diffpure_sde_matches_numpy_twin():
    """The SDE sampler's Euler–Maruyama step must match a straight-line
    numpy transcription of the reference RevVPSDE equations
    (``runners/diffpure_sde.py:88-148, 226-239``: drift
    −[−½βx − β·score](1−τ), diffusion √β(1−τ), score = −ε/√(1−ᾱ_cont)),
    with a mock ε-model and the identical PRNG chain."""
    import jax.numpy as jnp

    from transferattack_tpu.defense.diffpure import DiffPure, _TINY_UNET

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dp = DiffPure(t_star=4, image_size=16, unet_config=_TINY_UNET,
                      diffusion_type="sde")

    # mock ε-model: deterministic function of (x, t); learn_sigma channels
    class MockUNet:
        @staticmethod
        def apply(_vars, x, tt):
            eps = 0.1 * x * (1.0 + tt.reshape(-1, 1, 1, 1) / 1000.0)
            return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    dp.unet = MockUNet()

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    key = jax.random.PRNGKey(42)
    got = np.asarray(dp.purify_sde(x, key))

    # numpy twin: replicate the PRNG chain, then straight-line reference math
    T, b0, b1 = dp.T, dp.BETA_MIN, dp.BETA_MAX
    betas = np.linspace(b0 / T, b1 / T, T)
    acum = np.cumprod(1.0 - betas)
    x2 = np.asarray(x) * 2.0 - 1.0
    key2, sub = jax.random.split(key)
    noise = np.asarray(jax.random.normal(sub, x2.shape, jnp.float32))
    xt = np.sqrt(acum[dp.t_star - 1]) * x2 + np.sqrt(1 - acum[dp.t_star - 1]) * noise
    t0, t1 = 1.0 - dp.t_star / T, 1.0 - 1e-5
    n = int(np.ceil((t1 - t0) / 1e-3))
    dt = (t1 - t0) / n
    for i in range(n):
        key2, sub = jax.random.split(key2)
        z = np.asarray(jax.random.normal(sub, xt.shape, jnp.float32))
        s = 1.0 - (t0 + i * dt)
        beta_s = b0 + s * (b1 - b0)
        acum_cont = np.exp(-0.5 * (b1 - b0) * s * s - b0 * s)
        tt = np.full((xt.shape[0],), np.floor(s * T), np.float32)
        eps = 0.1 * xt * (1.0 + tt.reshape(-1, 1, 1, 1) / 1000.0)
        score = -eps / np.sqrt(1.0 - acum_cont)
        drift = -0.5 * beta_s * xt - beta_s * score
        xt = xt + (-drift) * dt + np.sqrt(beta_s) * np.sqrt(dt) * z
    want = np.clip((xt + 1.0) / 2.0, 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_diffpure_sde_and_ddpm_agree_qualitatively():
    """Both samplers on the same tiny UNet at small t* must return bounded
    purifications that stay close to the input (purification, not
    destruction) and to each other."""
    import jax.numpy as jnp

    from transferattack_tpu.defense.diffpure import DiffPure, _TINY_UNET

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sde = DiffPure(t_star=5, image_size=32, unet_config=_TINY_UNET,
                       diffusion_type="sde")
        ddpm = DiffPure(t_star=5, image_size=32, unet_config=_TINY_UNET,
                        diffusion_type="ddpm")
        ddpm.unet_vars = sde.unet_vars  # identical weights

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    key = jax.random.PRNGKey(7)
    a = np.asarray(sde.purify(x, key))
    b = np.asarray(ddpm.purify(x, key))
    for out in (a, b):
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert np.abs(out - np.asarray(x)).mean() < 0.25
    assert np.abs(a - b).mean() < 0.25


def test_diffpure_runs_tiny_ddpm(fake_attack_dir):
    input_dir, out_dir = fake_attack_dir
    from transferattack_tpu.defense.diffpure import run_diffpure
    from transferattack_tpu.defense.scoring import asr_from_labels

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        csv_dp = run_diffpure(input_dir, out_dir, batchsize=6, t_star=5,
                              model_name="toy_cnn", out_csv="dp_ddpm.csv",
                              diffusion_type="ddpm")
    asr = asr_from_labels(os.path.join(input_dir, "labels.csv"), csv_dp)
    assert 0.0 <= asr <= 100.0
