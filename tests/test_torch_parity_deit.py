"""DeiT-distilled golden parity (VERDICT r1 item 10): dist token + dual
head (timm ``deit_base_distilled_patch16_224`` semantics — eval logits are
the mean of the class and distillation heads).  The torch twin uses timm
naming so real checkpoints convert identically."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_torch_parity import TorchViTBlock  # noqa: E402


class TorchDeiT(tnn.Module):
    def __init__(self, dim=64, depth=2, heads=2, num_classes=1000, n_tokens=6):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, 16, 16)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim).normal_(0, 0.5))
        self.dist_token = tnn.Parameter(torch.zeros(1, 1, dim).normal_(0, 0.5))
        self.pos_embed = tnn.Parameter(
            torch.zeros(1, n_tokens, dim).normal_(0, 0.02))
        self.blocks = tnn.Sequential(
            *[TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)
        self.head_dist = tnn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1),
                       self.dist_token.expand(B, -1, -1), x], dim=1)
        x = self.norm(self.blocks(x + self.pos_embed))
        return (self.head(x[:, 0]) + self.head_dist(x[:, 1])) / 2


def test_deit_distilled_parity():
    import jax
    import jax.numpy as jnp

    from transferattack_tpu.models import Surrogate, WrappedModel
    from transferattack_tpu.models.vit import VisionTransformer
    from transferattack_tpu.utils.convert import (
        reconcile_with_module, torch_state_dict_to_flax,
    )

    torch.manual_seed(31)
    tmodel = TorchDeiT().eval()

    backbone = VisionTransformer(patch_size=16, dim=64, depth=2, num_heads=2,
                                 distilled=True)
    module = WrappedModel(backbone=backbone, size=32,
                          mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    surrogate = Surrogate(name="tiny_deit", module=module,
                          variables=variables, input_size=32)
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    variables, report = reconcile_with_module(converted, surrogate.variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    surrogate.variables = variables

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2))
        ).numpy()
    j_logits = np.asarray(surrogate.apply(surrogate.variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-4, rtol=1e-3)

    # input gradients agree too (the quantity TGR/SETR consume)
    import torch.nn.functional as F

    y = np.asarray([5, 9])
    xt = torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2)).clone()
    xt.requires_grad_(True)
    F.cross_entropy(tmodel(xt), torch.from_numpy(y).long()).backward()
    t_grad = xt.grad.numpy().transpose(0, 2, 3, 1) / std

    def ce(img):
        logits = surrogate.apply(surrogate.variables, img)
        logp = jax.nn.log_softmax(logits)
        return -logp[jnp.arange(2), jnp.asarray(y)].mean()

    j_grad = np.asarray(jax.grad(ce)(jnp.asarray(x)))
    denom = np.abs(t_grad).max() + 1e-12
    np.testing.assert_allclose(j_grad / denom, t_grad / denom, atol=5e-4)
