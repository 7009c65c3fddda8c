"""Backbone parity vs hand-built torch models (torchvision is not installed in
this image, so we construct torch modules with torchvision's exact architecture
and state-dict naming, port the random weights, and compare forward features).

Verifies the conv-patchify layout, class-token handling, pre-LN block math, exact
GELU (ViT) and the stem/bottleneck padding alignment + BN stats plumbing (ResNet)
— the layout details called out as hard parts in SURVEY §7.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from image_caption_tpu.core.dtypes import DTypePolicy
from image_caption_tpu.utils import port_torch as port

F32 = DTypePolicy(compute_dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Minimal torchvision-compatible ViT (same module names as vit_b_16)
# ---------------------------------------------------------------------------


class _TorchViTBlock(torch.nn.Module):
    def __init__(self, d, heads, mlp):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(d, eps=1e-6)
        self.self_attention = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(d, eps=1e-6)
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(d, mlp), torch.nn.GELU(), torch.nn.Dropout(0.0),
            torch.nn.Linear(mlp, d), torch.nn.Dropout(0.0),
        )

    def forward(self, x):
        h = self.ln_1(x)
        h, _ = self.self_attention(h, h, h, need_weights=False)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class _TorchViT(torch.nn.Module):
    """torchvision vit state-dict layout: conv_proj, class_token,
    encoder.pos_embedding, encoder.layers.encoder_layer_i.*, encoder.ln."""

    def __init__(self, image_size=64, patch=16, d=48, layers=2, heads=4, mlp=96):
        super().__init__()
        n = (image_size // patch) ** 2
        self.conv_proj = torch.nn.Conv2d(3, d, patch, patch)
        self.class_token = torch.nn.Parameter(torch.randn(1, 1, d))
        enc = torch.nn.Module()
        enc.pos_embedding = torch.nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        enc.layers = torch.nn.Sequential()
        for i in range(layers):
            enc.layers.add_module(f"encoder_layer_{i}", _TorchViTBlock(d, heads, mlp))
        enc.ln = torch.nn.LayerNorm(d, eps=1e-6)
        self.encoder = enc
        self.n = n
        self.d = d
        self.patch = patch

    def forward(self, x):
        b = x.shape[0]
        h = self.conv_proj(x)  # [B, d, H/p, W/p]
        h = h.flatten(2).transpose(1, 2)  # [B, n, d]
        h = torch.cat([self.class_token.expand(b, -1, -1), h], dim=1)
        h = h + self.encoder.pos_embedding
        for blk in self.encoder.layers:
            h = blk(h)
        return self.encoder.ln(h)


def test_vit_feature_parity():
    from image_caption_tpu.models.vit import ViT

    torch.manual_seed(0)
    tv = _TorchViT().eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = tv(x).numpy()

    jv = ViT(image_size=64, patch_size=16, hidden_dim=48, num_layers=2, nhead=4, mlp_dim=96, policy=F32)
    params = port.port_torchvision_vit(tv.state_dict(), num_layers=2)
    out = jv.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


# ---------------------------------------------------------------------------
# Minimal torchvision-compatible ResNet trunk
# ---------------------------------------------------------------------------


class _TorchBottleneck(torch.nn.Module):
    def __init__(self, cin, width, stride=1, downsample=False):
        super().__init__()
        cout = width * 4
        self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(cout)
        self.relu = torch.nn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False), torch.nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idt)


class _TorchResNetTrunk(torch.nn.Module):
    """torchvision resnet naming: conv1/bn1/layer{1..4}.{i}.conv{j}/bn{j}/downsample."""

    def __init__(self, stage_sizes=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        for s, (blocks, w) in enumerate(zip(stage_sizes, widths), start=1):
            layer = torch.nn.Sequential()
            for i in range(blocks):
                stride = 2 if (i == 0 and s > 1) else 1
                layer.add_module(str(i), _TorchBottleneck(cin, w, stride, downsample=(i == 0)))
                cin = w * 4
            setattr(self, f"layer{s}", layer)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return x


def test_resnet_feature_parity():
    from image_caption_tpu.models.resnet import ResNet

    torch.manual_seed(0)
    sizes = (1, 1, 1, 1)
    tv = _TorchResNetTrunk(sizes).eval()
    # randomize BN running stats so the test catches stats plumbing
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = tv(x).numpy()

    jr = ResNet(stage_sizes=sizes, policy=F32)
    params, stats = port.port_torchvision_resnet(tv.state_dict(), stage_sizes=sizes)
    out = jr.apply({"params": params, "batch_stats": stats}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-5, rtol=1e-4)


def test_desequentialize_resnet_keys():
    sd = {
        "encoder.cnn.0.weight": 1, "encoder.cnn.1.weight": 2, "encoder.cnn.1.running_mean": 3,
        "encoder.cnn.4.0.conv1.weight": 4, "encoder.cnn.7.2.bn3.running_var": 5,
        "decoder.embedding.weight": 6,
    }
    out = port._desequentialize_resnet(sd, "encoder.cnn.")
    assert out == {
        "conv1.weight": 1, "bn1.weight": 2, "bn1.running_mean": 3,
        "layer1.0.conv1.weight": 4, "layer4.2.bn3.running_var": 5,
    }
