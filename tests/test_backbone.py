"""Architecture-parity tests: Flax ResNet vs an independent torch oracle.

The oracle is a minimal torch Bottleneck/Basic ResNet written here with
torchvision's module naming, so its ``state_dict()`` has exactly the
torchvision key layout the converter ingests.  Agreement of the full
forward pass (random weights AND random running stats) pins down strides,
padding, dilation, BN epsilon, and layout conversion all at once.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models import (
    RESNET_STAGE_DEPTHS,
    ResNet,
    convert_torch_resnet,
)


class TorchBottleneck(tnn.Module):
    def __init__(self, in_ch, width, out_ch, stride=1, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(
            width, width, 3, stride=stride, padding=dilation, dilation=dilation,
            bias=False,
        )
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU()
        if in_ch != out_ch or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchBasic(tnn.Module):
    def __init__(self, in_ch, width, out_ch, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_ch)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU()
        if in_ch != out_ch or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet(tnn.Module):
    """torchvision-shaped ResNet oracle (v1.5: stride on conv2)."""

    def __init__(self, name="resnet50", dilation_block5=False):
        super().__init__()
        depths = RESNET_STAGE_DEPTHS[name]
        basic = name in ("resnet18", "resnet34")
        exp = 1 if basic else 4
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        for i, (d, w) in enumerate(zip(depths, (64, 128, 256, 512))):
            blocks = []
            for j in range(d):
                stride = 1 if (i == 0 or j > 0) else 2
                dilation = 1
                if i == 3 and dilation_block5:
                    stride = 1
                    dilation = 1 if j == 0 else 2
                if basic:
                    blocks.append(TorchBasic(in_ch, w, w * exp, stride))
                else:
                    blocks.append(TorchBottleneck(in_ch, w, w * exp, stride, dilation))
                in_ch = w * exp
            self.add_module(f"layer{i + 1}", tnn.Sequential(*blocks))

    def forward(self, x, taps=(5,)):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = {}
        for i in range(4):
            y = getattr(self, f"layer{i + 1}")(y)
            outs[i + 2] = y
        return {s: outs[s] for s in taps}


def randomize_bn_stats(model, gen):
    """Random running stats so parity also pins the BN inference path."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(gen.standard_normal(m.num_features).astype(np.float32)) * 0.1
            )
            m.running_var.copy_(
                torch.from_numpy(
                    np.abs(gen.standard_normal(m.num_features)).astype(np.float32) + 0.5
                )
            )


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_forward_parity(name, rng):
    torch.manual_seed(0)
    oracle = TorchResNet(name).eval()
    with torch.no_grad():
        randomize_bn_stats(oracle, rng)
    variables = convert_torch_resnet(oracle.state_dict(), name)
    net = ResNet(name_=name, out_stages=(4, 5))

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x), taps=(4, 5))
    got = net.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)

    for s in (4, 5):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got[s]), (0, 3, 1, 2)),
            want[s].numpy(),
            rtol=1e-4,
            atol=1e-4,
        )


def test_dilation_block5_parity(rng):
    torch.manual_seed(1)
    oracle = TorchResNet("resnet50", dilation_block5=True).eval()
    with torch.no_grad():
        randomize_bn_stats(oracle, rng)
    variables = convert_torch_resnet(oracle.state_dict(), "resnet50")
    net = ResNet(name_="resnet50", out_stages=(5,), dilation_block5=True)

    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x), taps=(5,))[5]
    got = net.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    # dilation keeps stage-5 at stride 16: 64/16 = 4
    assert got.shape[1:3] == (4, 4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(), rtol=1e-4, atol=1e-4
    )


def test_train_mode_updates_batch_stats(rng):
    import jax

    net = ResNet(name_="resnet18", out_stages=(5,))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = net.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert np.all(np.isfinite(np.asarray(out)))


class TestS2DStem:
    """The space-to-depth stem is the SAME function as the standard 7x7/2
    stem (zero-padded kernel taps; see backbone._space_to_depth_stem) on
    the same "conv1" param tree."""

    @pytest.mark.parametrize("size", [64, 63])  # even + odd extents
    def test_matches_standard_stem(self, size):
        gen = np.random.default_rng(41)
        x = gen.standard_normal((2, 3, size, size)).astype(np.float32)
        torch.manual_seed(41)
        oracle = TorchResNet("resnet50").eval()
        with torch.no_grad():
            randomize_bn_stats(oracle, gen)
        variables = convert_torch_resnet(oracle.state_dict(), "resnet50")
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        outs = {}
        for s2d in (False, True):
            bb = ResNet(name_="resnet50", out_stages=(5,), stem_s2d=s2d)
            outs[s2d] = np.asarray(bb.apply(variables, xj, train=False))
        np.testing.assert_allclose(outs[True], outs[False],
                                   rtol=1e-5, atol=1e-5)
        with torch.no_grad():
            want = oracle(torch.from_numpy(x), taps=(5,))[5].numpy()
        got = np.transpose(outs[True], (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_masked_bucket_equivalence(self):
        """Padded-bucket extraction with the s2d stem bit-matches the
        exact-shape run on the valid cells (the masked-extract contract)."""
        gen = np.random.default_rng(42)
        bb = ResNet(name_="resnet18", out_stages=(5,), stem_s2d=True)
        exact = gen.standard_normal((1, 64, 48, 3)).astype(np.float32)
        variables = bb.init(jax.random.PRNGKey(0),
                            np.zeros((1, 32, 32, 3), np.float32), train=False)
        padded = np.zeros((1, 96, 96, 3), np.float32)
        padded[:, :64, :48] = exact
        got = np.asarray(bb.apply(
            variables, jnp.asarray(padded), train=False,
            valid_hw=jnp.asarray([[64, 48]], jnp.int32),
        ))
        want = np.asarray(bb.apply(variables, jnp.asarray(exact), train=False))
        eh, ew = want.shape[1], want.shape[2]
        np.testing.assert_allclose(got[:, :eh, :ew], want, rtol=1e-5,
                                   atol=1e-6)
