"""Converters for the reference's alternate backbone layouts.

* ``convert_pycls_resnet`` + ``ResNet(stride_on_conv1=True)`` — the
  scratch DOLG backbone (reference: networks/backbone.py:218-346, MSRA
  stride placement on the 1x1 'a' conv).
* ``convert_features_resnet`` — the Caffe/``filip`` pretrained mode's
  features-Sequential key layout (reference: networks/backbone.py:84-88).

Each is validated against an independent torch oracle with random weights
AND random running stats, as in test_backbone.py.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from test_backbone import TorchResNet, randomize_bn_stats

from research_image_retrieval_tpu.models import (
    ResNet,
    convert_features_resnet,
    convert_pycls_resnet,
    convert_torch_resnet,
)


class PyclsBottleneckTransform(tnn.Module):
    """1x1(stride) -> 3x3 -> 1x1, BN after each (backbone.py:305-326)."""

    def __init__(self, w_in, w_out, stride, w_b):
        super().__init__()
        self.a = tnn.Conv2d(w_in, w_b, 1, stride=stride, bias=False)
        self.a_bn = tnn.BatchNorm2d(w_b)
        self.b = tnn.Conv2d(w_b, w_b, 3, padding=1, bias=False)
        self.b_bn = tnn.BatchNorm2d(w_b)
        self.c = tnn.Conv2d(w_b, w_out, 1, bias=False)
        self.c_bn = tnn.BatchNorm2d(w_out)

    def forward(self, x):
        x = torch.relu(self.a_bn(self.a(x)))
        x = torch.relu(self.b_bn(self.b(x)))
        return self.c_bn(self.c(x))


class PyclsResBlock(tnn.Module):
    def __init__(self, w_in, w_out, stride, w_b):
        super().__init__()
        self.proj_block = (w_in != w_out) or (stride != 1)
        if self.proj_block:
            self.proj = tnn.Conv2d(w_in, w_out, 1, stride=stride, bias=False)
            self.bn = tnn.BatchNorm2d(w_out)
        self.f = PyclsBottleneckTransform(w_in, w_out, stride, w_b)

    def forward(self, x):
        idt = self.bn(self.proj(x)) if self.proj_block else x
        return torch.relu(idt + self.f(x))


class PyclsResNet(tnn.Module):
    """ResStemIN + 4 ResStages (reference ResNet_DOLG topology, small)."""

    def __init__(self, depths=(3, 4, 6, 3)):
        super().__init__()
        self.stem = tnn.Sequential()
        self.stem.conv = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.stem.bn = tnn.BatchNorm2d(64)
        w_in, w_b = 64, 64
        for i, (d, w_out) in enumerate(zip(depths, (256, 512, 1024, 2048))):
            stage = tnn.Sequential()
            for j in range(d):
                stride = 1 if (i == 0 or j > 0) else 2
                stage.add_module(
                    f"b{j + 1}",
                    PyclsResBlock(w_in if j == 0 else w_out, w_out, stride,
                                  w_b * (2 ** i)),
                )
            self.add_module(f"s{i + 1}", stage)
            w_in = w_out

    def forward(self, x):
        x = tnn.functional.max_pool2d(
            torch.relu(self.stem.bn(self.stem.conv(x))), 3, stride=2, padding=1
        )
        x1 = self.s1(x)
        x2 = self.s2(x1)
        x3 = self.s3(x2)
        x4 = self.s4(x3)
        return {4: x3, 5: x4}


def test_pycls_converter_parity(rng):
    torch.manual_seed(21)
    oracle = PyclsResNet().eval()
    with torch.no_grad():
        randomize_bn_stats(oracle, rng)
    variables = convert_pycls_resnet(oracle.state_dict(), "resnet50")
    net = ResNet(name_="resnet50", out_stages=(4, 5), stride_on_conv1=True)

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x))
    got = net.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    train=False)
    for s in (4, 5):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got[s]), (0, 3, 1, 2)),
            want[s].numpy(), rtol=1e-4, atol=1e-4,
        )


def test_pycls_masked_bucket_equals_exact(rng):
    """MSRA stride placement must stay exact under bucketed padding."""
    import jax

    net = ResNet(name_="resnet50", out_stages=(5,), stride_on_conv1=True)
    x = rng.standard_normal((1, 56, 48, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    exact = np.asarray(net.apply(variables, jnp.asarray(x), train=False))

    padded = np.zeros((1, 64, 64, 3), np.float32)
    padded[:, :56, :48] = x
    got = np.asarray(
        net.apply(variables, jnp.asarray(padded), train=False,
                  valid_hw=jnp.asarray([[56, 48]]))
    )
    # stage-5 valid extent of a 56x48 input = ceil-halving 5 times = 2x2
    np.testing.assert_allclose(got[:, :2, :2], exact, rtol=1e-5, atol=1e-5)


def test_features_layout_converter(rng):
    """filip-mode Sequential keys convert identically to torchvision keys."""
    torch.manual_seed(22)
    oracle = TorchResNet("resnet50").eval()
    with torch.no_grad():
        randomize_bn_stats(oracle, rng)
    sd = oracle.state_dict()

    # synthesize the features-Sequential layout: children order of a
    # torchvision resnet is conv1, bn1, relu, maxpool, layer1..layer4
    seq = {}
    for k, v in sd.items():
        if k.startswith("conv1."):
            seq["0." + k[len("conv1."):]] = v
        elif k.startswith("bn1."):
            seq["1." + k[len("bn1."):]] = v
        else:
            layer = int(k[len("layer")])
            seq[f"{layer + 3}." + k[len("layerN."):]] = v

    a = convert_torch_resnet(sd, "resnet50")
    b = convert_features_resnet(seq, "resnet50")
    flat = lambda t: {
        "/".join(map(str, path)): leaf
        for path, leaf in _flatten(t)
    }

    fa, fb = flat(a), flat(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree
