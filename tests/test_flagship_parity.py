"""Whole-model torch-oracle parity for the flagship descriptor pipelines.

Extends the layer-level technique of test_backbone.py / test_layers.py to
the FULL GeM / DOLG / Token extraction paths: an independent torch oracle
implements the reference model math end-to-end (reference:
networks/RetrievalNet.py:327-354 GeM, :367-517 DOLG, :129-313 Token), the
SAME converted weights are loaded both sides, and the L2-normalized
descriptors must agree to <= 1e-4.  A synthetic-Revisited mAP check then
asserts both descriptor sets produce IDENTICAL evaluation numbers through
``evaluate_revisited`` — the strongest available stand-in for the +-0.2
real-data mAP parity gate (BASELINE.md) on a rig with no datasets.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from test_backbone import TorchResNet, randomize_bn_stats
from test_layers import (
    TorchAttention,
    TorchDecoder,
    TorchEncoder,
    attn_params,
    lin_params,
)

from research_image_retrieval_tpu.evaluation import evaluate_revisited
from research_image_retrieval_tpu.models import convert_torch_resnet, get_model

B, S = 3, 64  # batch, image size (stage-5 of resnet18 at 64px = 2x2 map)


def torch_gem(x, p=3.0, eps=1e-6):
    """[B, C, H, W] -> [B, C] (reference RetrievalNet.py:318-325)."""
    return x.clamp(min=eps).pow(p).mean(dim=(2, 3)).pow(1.0 / p)


def l2n(x):
    return tF.normalize(x, dim=-1)


def bn_params(bn):
    return (
        {"scale": bn.weight.detach().numpy(), "bias": bn.bias.detach().numpy()},
        {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()},
    )


def conv1x1_params(conv):
    """torch 1x1 Conv2d -> flax Conv {kernel HWIO, bias}."""
    w = conv.weight.detach().numpy()  # [O, I, 1, 1]
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if conv.bias is not None:
        out["bias"] = conv.bias.detach().numpy()
    return out


def _images(rng):
    return rng.standard_normal((B, 3, S, S)).astype(np.float32)


def _rand_bn1d(bn, gen):
    with torch.no_grad():
        bn.running_mean.copy_(
            torch.from_numpy(gen.standard_normal(bn.num_features).astype(np.float32)) * 0.1
        )
        bn.running_var.copy_(
            torch.from_numpy(
                np.abs(gen.standard_normal(bn.num_features)).astype(np.float32) + 0.5
            )
        )


# ---------------------------------------------------------------- GeM ----


class TorchGeMModel(tnn.Module):
    """Reference GeM extract path (RetrievalNet.py:327-354)."""

    def __init__(self, outputdim=24):
        super().__init__()
        self.backbone = TorchResNet("resnet18")
        self.whiten = tnn.Linear(512, outputdim)

    def forward(self, x):
        f = self.backbone(x, taps=(5,))[5]
        return l2n(self.whiten(torch_gem(f)))


def test_gem_whole_model_parity(rng):
    torch.manual_seed(10)
    oracle = TorchGeMModel().eval()
    with torch.no_grad():
        randomize_bn_stats(oracle.backbone, rng)

    variables = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    model = get_model("gem_r50", backbone_name="resnet18", outputdim=24,
                      num_classes=5,)
    params = {
        "backbone": variables["params"],
        "whiten": lin_params(oracle.whiten),
        "classifier_w": np.zeros((5, 24), np.float32),
    }
    v = {"params": params, "batch_stats": {"backbone": variables["batch_stats"]}}

    x = _images(rng)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(
        model.apply(v, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    method="extract")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------- DOLG ----


class TorchDOLG(tnn.Module):
    """Reference DOLG extract path (RetrievalNet.py:367-474), no ASPP."""

    def __init__(self, outputdim=24):
        super().__init__()
        self.backbone = TorchResNet("resnet18")
        self.conv1 = tnn.Conv2d(256, 1024, 1)
        self.bn = tnn.BatchNorm2d(1024)
        self.conv2 = tnn.Conv2d(1024, 1, 1)
        self.fc_t = tnn.Linear(512, 1024)
        self.fc = tnn.Linear(2048, outputdim)

    def forward(self, x):
        taps = self.backbone(x, taps=(4, 5))
        f4, f5 = taps[4], taps[5]
        # SpatialAttention2d (RetrievalNet.py:433-474)
        y = self.bn(self.conv1(f4))
        fmap_norm = tF.normalize(y, dim=1)
        att = tF.softplus(self.conv2(tF.relu(y)))
        fl = fmap_norm * att  # [B, 1024, H, W]
        # global branch
        fg = self.fc_t(torch_gem(f5))  # [B, 1024]
        fg_sq = (fg * fg).sum(dim=1, keepdim=True)
        # orthogonal fusion (RetrievalNet.py:403-431)
        flt = fl.flatten(2)  # [B, 1024, HW]
        coef = torch.einsum("bcn,bc->bn", flt, fg)
        proj = coef.unsqueeze(1) * fg.unsqueeze(2) / fg_sq.unsqueeze(2)
        orth = flt - proj
        fo = orth.mean(dim=2)  # [B, 1024]
        return l2n(self.fc(torch.cat([fg, fo], dim=1)))


def test_dolg_whole_model_parity(rng):
    torch.manual_seed(11)
    oracle = TorchDOLG().eval()
    with torch.no_grad():
        randomize_bn_stats(oracle.backbone, rng)
        randomize_bn_stats(oracle, rng)  # also the attention BN

    bb = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    model = get_model("dolg_r50", backbone_name="resnet18", outputdim=24,
                      num_classes=5,)
    bn_p, bn_s = bn_params(oracle.bn)
    params = {
        "backbone": bb["params"],
        "local_attn": {
            "conv1": conv1x1_params(oracle.conv1),
            "bn": bn_p,
            "conv2": conv1x1_params(oracle.conv2),
        },
        "fc_t": lin_params(oracle.fc_t),
        "fc": lin_params(oracle.fc),
        "classifier_w": np.zeros((5, 24), np.float32),
    }
    stats = {"backbone": bb["batch_stats"], "local_attn": {"bn": bn_s}}

    x = _images(rng)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(
        get_model("dolg_r50", backbone_name="resnet18", outputdim=24,
                  num_classes=5,).apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))), method="extract",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# -------------------------------------------------------------- Token ----


class TorchTokenModel(tnn.Module):
    """Reference Token extract path (RetrievalNet.py:129-187, 290-313)."""

    def __init__(self, dim=32, heads=8, num_object=4):
        super().__init__()
        self.no = num_object
        self.backbone = TorchResNet("resnet18")
        self.conv = tnn.Conv2d(512, dim, 1)
        self.conv_bn = tnn.BatchNorm2d(dim)
        self.encoder = TorchEncoder(dim, heads)
        self.query = tnn.Parameter(torch.randn(1, num_object, dim))
        self.token_fc = tnn.Linear(dim, dim)
        self.token_ln = tnn.LayerNorm(dim)
        self.dec0 = TorchDecoder(dim, heads)
        self.dec1 = TorchDecoder(dim, heads)
        self.proj = tnn.Linear(dim * num_object, dim)
        self.proj_bn = tnn.BatchNorm1d(dim)

    def forward(self, x):
        f = self.backbone(x, taps=(5,))[5]
        y = self.conv_bn(self.conv(f))  # [B, D, H, W]
        b, d, h, w = y.shape
        # NHWC row-major token order (matches the flax reshape)
        t = y.permute(0, 2, 3, 1).reshape(b, h * w, d)
        t = self.encoder(t)
        q = self.query.expand(b, -1, -1)
        attns = tF.softmax(torch.einsum("bod,bnd->bon", q, t), dim=1)
        token = torch.einsum("bon,bnd->bod", attns, t)
        token = self.token_ln(self.token_fc(token))
        token = self.dec0(token, t)
        token = self.dec1(token, t)
        token = self.proj(token.reshape(b, self.no * d))
        return l2n(self.proj_bn(token))


def _encoder_tree(enc: TorchEncoder):
    params = {
        "attn": attn_params(enc.attn),
        "bn": {"scale": enc.bn.weight.detach().numpy(),
               "bias": enc.bn.bias.detach().numpy()},
        "mlp": lin_params(enc.mlp),
    }
    stats = {"bn": {"mean": enc.bn.running_mean.numpy(),
                    "var": enc.bn.running_var.numpy()}}
    return params, stats


def _decoder_tree(dec: TorchDecoder):
    ln = lambda m: {"scale": m.weight.detach().numpy(),
                    "bias": m.bias.detach().numpy()}
    return {
        "cross_attn": attn_params(dec.cross_attn),
        "self_attn": attn_params(dec.self_attn),
        "bn1": ln(dec.bn1),
        "bn2": ln(dec.bn2),
        "mlp": {"fc1": lin_params(dec.fc1), "fc2": lin_params(dec.fc2)},
    }


def _token_variables(oracle: TorchTokenModel, bb):
    enc_p, enc_s = _encoder_tree(oracle.encoder)
    conv_bn_p, conv_bn_s = bn_params(oracle.conv_bn)
    proj_bn_p, proj_bn_s = bn_params(oracle.proj_bn)
    ln = lambda m: {"scale": m.weight.detach().numpy(),
                    "bias": m.bias.detach().numpy()}
    params = {
        "backbone": bb["params"],
        "classifier_w": np.zeros((5, 32), np.float32),
        "tr": {
            "conv": conv1x1_params(oracle.conv),
            "conv_bn": conv_bn_p,
            "encoder0": enc_p,
            "query": oracle.query.detach().numpy(),
            "token_norm_fc": lin_params(oracle.token_fc),
            "token_norm_ln": ln(oracle.token_ln),
            "decoder0": _decoder_tree(oracle.dec0),
            "decoder1": _decoder_tree(oracle.dec1),
            "proj": lin_params(oracle.proj),
            "proj_bn": proj_bn_p,
        },
    }
    stats = {
        "backbone": bb["batch_stats"],
        "tr": {"conv_bn": conv_bn_s, "encoder0": enc_s, "proj_bn": proj_bn_s},
    }
    return {"params": params, "batch_stats": stats}


def _token_pair(rng):
    torch.manual_seed(12)
    oracle = TorchTokenModel().eval()
    gen = np.random.default_rng(5)
    with torch.no_grad():
        randomize_bn_stats(oracle.backbone, rng)
    _rand_bn1d(oracle.conv_bn, gen)
    _rand_bn1d(oracle.encoder.bn, gen)
    _rand_bn1d(oracle.proj_bn, gen)
    bb = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    model = get_model("token_r50", backbone_name="resnet18", outputdim=32,
                      num_classes=5,)
    return oracle, model, _token_variables(oracle, bb)


def test_token_whole_model_parity(rng):
    oracle, model, v = _token_pair(rng)
    x = _images(rng)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(
        model.apply(v, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    method="extract")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------- synthetic-Revisited gate ----


def test_synthetic_revisited_map_identical(rng):
    """Both descriptor sets must yield the SAME evaluation numbers through
    the full Revisited protocol (rank -> E/M/H remap -> mAP/mP@k)."""
    oracle, model, v = _token_pair(rng)
    n_gallery, n_query = 14, 3
    imgs = rng.standard_normal((n_gallery + n_query, 3, S, S)).astype(np.float32)

    with torch.no_grad():
        d_torch = oracle(torch.from_numpy(imgs)).numpy()
    d_jax = np.asarray(
        model.apply(v, jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))),
                    method="extract")
    )

    gnd = [
        {"easy": [0, 1], "hard": [2], "junk": [3]},
        {"easy": [4], "hard": [5, 6], "junk": []},
        {"easy": [7, 8], "hard": [], "junk": [9]},
    ]
    results = []
    for d in (d_torch, d_jax):
        g, q = d[:n_gallery], d[n_gallery:]
        ranks = np.argsort(-(g @ q.T), axis=0, kind="stable")
        results.append(evaluate_revisited(ranks, gnd, dataset="synthetic"))
    a, b = results
    assert (a.map_easy, a.map_medium, a.map_hard) == (
        b.map_easy, b.map_medium, b.map_hard
    )
    np.testing.assert_array_equal(a.mp_medium, b.mp_medium)
