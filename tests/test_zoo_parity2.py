"""Whole-model torch-oracle parity, batch 2: ULTRON, SENet-G2+, the CVNet
correlation-verification scorer, and GeM at an eval-like 224px resolution.

Independent torch oracles re-implement the reference model math end-to-end
(reference: models/ultron_modules/{cdconv,scala,ultron}.py, models/
senet_g2.py:12-230, models/cvnet_modules/{CVNet_Rerank_model,CVlearner}.py,
networks/RetrievalNet.py:327-354); the SAME weights are loaded both sides
and outputs must agree to <= 1e-4.

Resolution-dependent paths exercised here (VERDICT r2 weak #6): ULTRON at
its native 224px AND at 256px, where the absolute pos embed is bilinearly
interpolated 56->64 and the SCALA window partition pads 16->21 / 8->14;
GeM-R18 at 224px (vs the 64px flagship tests).

Each test pins a LOCAL rng (suite-order independence).
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from test_backbone import TorchResNet, randomize_bn_stats
from test_flagship_parity import (
    TorchGeMModel,
    bn_params,
    conv1x1_params,
    torch_gem,
)
from test_layers import lin_params
from test_zoo_parity import conv3x3_params, ln_params

from research_image_retrieval_tpu.models import convert_torch_resnet, get_model
from research_image_retrieval_tpu.models.cvnet import CVNetRerank


def l2n(x, dim=-1):
    return tF.normalize(x, dim=dim)


def resize_matrix(n_in, n_out, antialias=True):
    """[n_out, n_in] separable linear-resize weights (half-pixel centers,
    triangle kernel, kernel widened by 1/scale when antialiased
    downsampling) — the published TF/XLA image-resize semantics,
    re-derived in numpy so the oracle is independent of jax."""
    inv = n_in / n_out
    kscale = max(inv, 1.0) if antialias else 1.0
    sample = (np.arange(n_out) + 0.5) * inv - 0.5
    x = np.abs(sample[:, None] - np.arange(n_in)[None, :]) / kscale
    w = np.clip(1.0 - x, 0.0, None)
    return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


def bn_nhwc(bn, x):
    """Apply a torch BatchNorm2d to an NHWC tensor."""
    return bn(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)


# -------------------------------------------------------------- ULTRON ----


class TorchCDConv(tnn.Module):
    """Reference CDConv (cdconv.py:14-171): circular channel attention
    selects per-channel dilation; realized as a 3-way dilated-conv mix."""

    def __init__(self, ch, K=3, tau1=0.75, tau2=0.50, d1=3, d2=6):
        super().__init__()
        self.K, self.tau1, self.tau2 = K, tau1, tau2
        self.w = tnn.Parameter(torch.randn(K, ch) / np.sqrt(ch))
        self.conv_d1 = tnn.Conv2d(ch, ch, K, padding=K // 2, bias=False)
        self.conv_dd1 = tnn.Conv2d(ch, ch, K, padding=d1 * (K // 2),
                                   dilation=d1, bias=False)
        self.conv_dd2 = tnn.Conv2d(ch, ch, K, padding=d2 * (K // 2),
                                   dilation=d2, bias=False)
        self.bn = tnn.BatchNorm2d(ch)

    def forward(self, x):  # NHWC
        t = x.permute(0, 3, 1, 2)
        gap = t.mean(dim=(2, 3))  # [B, C]
        scores = sum(self.w[k][None] * torch.roll(gap, -k, dims=1)
                     for k in range(self.K))
        attn = torch.sigmoid(scores)
        is_d1 = (attn <= self.tau1) & (attn > self.tau2)
        is_d2 = attn <= self.tau2
        is_1 = ~(is_d1 | is_d2)
        frac = lambda m: m.float().mean(dim=1)[:, None, None, None]
        f1, fd1, fd2 = frac(is_1), frac(is_d1), frac(is_d2)
        total = f1 + fd1 + fd2 + 1e-8
        out = (f1 / total * self.conv_d1(t)
               + fd1 / total * self.conv_dd1(t)
               + fd2 / total * self.conv_dd2(t))
        return self.bn(out).permute(0, 2, 3, 1)


class TorchCDBlock(tnn.Module):
    """Residual CDConv block (cdconv.py:173-228), same-width stride-1."""

    def __init__(self, ch):
        super().__init__()
        self.cdconv1 = TorchCDConv(ch)
        self.cdconv2 = TorchCDConv(ch)

    def forward(self, x):
        y = tF.relu(self.cdconv1(x))
        y = self.cdconv2(y)
        return tF.relu(y + x)


class TorchMCK(tnn.Module):
    """Multi-scale context kernel (scala.py:14-57)."""

    def __init__(self, dim):
        super().__init__()
        self.dc = tnn.ModuleList([
            tnn.Conv2d(dim, dim, 3, padding=d, dilation=d, groups=dim,
                       bias=False)
            for d in (1, 2, 3)
        ])
        self.fuse = tnn.Conv2d(3 * dim, dim, 1, bias=False)
        self.bn = tnn.BatchNorm2d(dim)

    def forward(self, x):  # NHWC
        t = x.permute(0, 3, 1, 2)
        y = self.fuse(torch.cat([c(t) for c in self.dc], dim=1))
        return self.bn(y).permute(0, 2, 3, 1)


def torch_window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = tF.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    return x, Hp, Wp


def torch_window_reverse(win, ws, Hp, Wp, H, W):
    C = win.shape[-1]
    B = win.shape[0] // ((Hp // ws) * (Wp // ws))
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W, :]


def rel_pos_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class TorchSCALAAttn(tnn.Module):
    """Windowed attention with MCK context keys + relative position bias
    (scala.py:59-213, paper eq 5 semantics: keys from MCK(x))."""

    def __init__(self, dim, ws, heads):
        super().__init__()
        self.dim, self.ws, self.h = dim, ws, heads
        self.mck = TorchMCK(dim)
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.context_k = tnn.Linear(dim, dim)
        self.table = tnn.Parameter(
            torch.randn((2 * ws - 1) * (2 * ws - 1), heads) * 0.02
        )
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):  # NHWC
        B, H, W, C = x.shape
        ws, h = self.ws, self.h
        hd = C // h
        N = ws * ws
        ctx = self.mck(x)
        xw, Hp, Wp = torch_window_partition(x, ws)
        cw, _, _ = torch_window_partition(ctx, ws)
        nB = xw.shape[0]
        qkv = self.qkv(xw).reshape(nB, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, v = qkv[0], qkv[2]
        k = self.context_k(cw).reshape(nB, N, h, hd).permute(0, 2, 1, 3)
        attn = (q * hd**-0.5) @ k.transpose(-2, -1)
        idx = rel_pos_index(ws).reshape(-1)
        rel = self.table[torch.from_numpy(idx)].reshape(N, N, h).permute(2, 0, 1)
        attn = tF.softmax(attn + rel[None], dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(nB, N, C)
        return torch_window_reverse(self.proj(out), ws, Hp, Wp, H, W)


class TorchSCALABlock(tnn.Module):
    """BN + SCALA attention + conv-MLP residuals (scala.py:215-270)."""

    def __init__(self, dim, ws, heads, mlp_ratio=4.0):
        super().__init__()
        self.attn = TorchSCALAAttn(dim, ws, heads)
        self.norm1 = tnn.BatchNorm2d(dim)
        self.norm2 = tnn.BatchNorm2d(dim)
        hidden = int(dim * mlp_ratio)
        self.mlp_fc1 = tnn.Conv2d(dim, hidden, 1)
        self.mlp_fc2 = tnn.Conv2d(hidden, dim, 1)

    def forward(self, x):  # NHWC
        x = x + self.attn(bn_nhwc(self.norm1, x))
        y = bn_nhwc(self.norm2, x).permute(0, 3, 1, 2)
        y = self.mlp_fc2(tF.gelu(self.mlp_fc1(y)))
        return x + y.permute(0, 2, 3, 1)


class TorchPatchMerging(tnn.Module):
    """2x2 merge + LN + linear reduce (ultron.py:59-94)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * cin, eps=1e-5)
        self.reduction = tnn.Linear(4 * cin, cout, bias=False)

    def forward(self, x):  # NHWC
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], dim=-1)
        return self.reduction(self.norm(x))


class TorchUltron(tnn.Module):
    """Reference ULTRON-t extract path (ultron.py:17-474): PatchEmbed +
    abs pos embed -> CDConv stages 0-1 -> SCALA stages 2-3 with
    PatchMerging -> attention-based GeM pooling (eqs 9-12)."""

    def __init__(self, img_size=224, ws=7,
                 dims=(16, 32, 48, 64), heads=(2, 2, 2, 4)):
        super().__init__()
        self.img_size, self.dims = img_size, dims
        self.patch_embed = tnn.Conv2d(3, dims[0], 4, stride=4)
        self.patch_norm = tnn.LayerNorm(dims[0], eps=1e-5)
        pr = img_size // 4
        self.pos = tnn.Parameter(torch.randn(1, pr, pr, dims[0]) * 0.02)
        self.stage0 = TorchCDBlock(dims[0])
        self.merge1 = TorchPatchMerging(dims[0], dims[1])
        self.stage1 = TorchCDBlock(dims[1])
        self.merge2 = TorchPatchMerging(dims[1], dims[2])
        self.stage2 = TorchSCALABlock(dims[2], ws, heads[2])
        self.merge3 = TorchPatchMerging(dims[2], dims[3])
        self.stage3 = TorchSCALABlock(dims[3], ws, heads[3])
        self.gamma = tnn.Parameter(torch.tensor(2.5))
        self.query_proj = tnn.Linear(dims[3], dims[3])

    def forward(self, x):  # NCHW in
        y = self.patch_embed(x).permute(0, 2, 3, 1)  # NHWC
        y = self.patch_norm(y)
        pos = self.pos
        if y.shape[1:3] != pos.shape[1:3]:
            mh = torch.from_numpy(resize_matrix(pos.shape[1], y.shape[1]))
            mw = torch.from_numpy(resize_matrix(pos.shape[2], y.shape[2]))
            pos = torch.einsum("hp,pqc,wq->hwc", mh, pos[0], mw)[None]
        y = y + pos
        y = self.stage0(y)
        y = self.stage1(self.merge1(y))
        y = self.stage2(self.merge2(y))
        y = self.stage3(self.merge3(y))
        # attention-based GeM pooling (ultron.py:174-244)
        B, H, W, C = y.shape
        g = self.gamma.clamp(1e-7, 100.0)
        dq = self.query_proj(y.clamp(min=1e-7).pow(g).mean(dim=(1, 2))
                             .pow(1.0 / g))
        tok = y.reshape(B, H * W, C)
        A = tF.softmax(torch.einsum("bnc,bc->bn", tok, dq) / np.sqrt(C), dim=-1)
        out = torch.einsum("bn,bnc->bc", A, tok).pow(2.0)
        return l2n(l2n(out))


def _cdconv_tree(tc):
    p_bn, s_bn = bn_params(tc.bn)
    params = {
        "channel_attention_weights": tc.w.detach().numpy(),
        "conv_d1": {"kernel": np.transpose(
            tc.conv_d1.weight.detach().numpy(), (2, 3, 1, 0))},
        "conv_dd1": {"kernel": np.transpose(
            tc.conv_dd1.weight.detach().numpy(), (2, 3, 1, 0))},
        "conv_dd2": {"kernel": np.transpose(
            tc.conv_dd2.weight.detach().numpy(), (2, 3, 1, 0))},
        "bn": p_bn,
    }
    return params, {"bn": s_bn}


def _cdblock_tree(tb):
    p1, s1 = _cdconv_tree(tb.cdconv1)
    p2, s2 = _cdconv_tree(tb.cdconv2)
    return {"cdconv1": p1, "cdconv2": p2}, {"cdconv1": s1, "cdconv2": s2}


def _merge_tree(tm):
    return {"norm": ln_params(tm.norm),
            "reduction": {"kernel": tm.reduction.weight.detach().numpy().T}}


def _scala_tree(tb):
    mck = tb.attn.mck
    mck_bn_p, mck_bn_s = bn_params(mck.bn)
    n1_p, n1_s = bn_params(tb.norm1)
    n2_p, n2_s = bn_params(tb.norm2)
    params = {
        "attn": {
            "mck": {
                "dc1": conv3x3_params(mck.dc[0]),
                "dc2": conv3x3_params(mck.dc[1]),
                "dc3": conv3x3_params(mck.dc[2]),
                "fuse": conv1x1_params(mck.fuse),
                "bn": mck_bn_p,
            },
            "qkv": lin_params(tb.attn.qkv),
            "context_k": lin_params(tb.attn.context_k),
            "relative_position_bias_table": tb.attn.table.detach().numpy(),
            "proj": lin_params(tb.attn.proj),
        },
        "norm1": n1_p,
        "norm2": n2_p,
        "mlp_fc1": conv1x1_params(tb.mlp_fc1),
        "mlp_fc2": conv1x1_params(tb.mlp_fc2),
    }
    stats = {"attn": {"mck": {"bn": mck_bn_s}}, "norm1": n1_s, "norm2": n2_s}
    return params, stats


def _ultron_variables(oracle):
    bb_p, bb_s = {}, {}
    bb_p["patch_embed"] = conv3x3_params(oracle.patch_embed)
    bb_p["patch_norm"] = ln_params(oracle.patch_norm)
    bb_p["absolute_pos_embed"] = oracle.pos.detach().numpy()
    for i in (0, 1):
        p, s = _cdblock_tree(getattr(oracle, f"stage{i}"))
        bb_p[f"stage{i}_block0"], bb_s[f"stage{i}_block0"] = p, s
    for i in (2, 3):
        p, s = _scala_tree(getattr(oracle, f"stage{i}"))
        bb_p[f"stage{i}_block0"], bb_s[f"stage{i}_block0"] = p, s
    for i in (1, 2, 3):
        bb_p[f"merge{i}"] = _merge_tree(getattr(oracle, f"merge{i}"))
    params = {
        "backbone": bb_p,
        "global_pool": {
            "gamma": np.float32(oracle.gamma.detach().numpy()),
            "query_proj": lin_params(oracle.query_proj),
        },
        "classifier_w": np.zeros((5, oracle.dims[3]), np.float32),
    }
    return {"params": params, "batch_stats": {"backbone": bb_s}}


def _ultron_parity(size):
    rng = np.random.default_rng(30)
    torch.manual_seed(30)
    oracle = TorchUltron(img_size=224).eval()
    with torch.no_grad():
        randomize_bn_stats(oracle, rng)

    model = get_model("ultron_s", variant="t", num_classes=5, img_size=224,
                      window_size=7)
    variables = _ultron_variables(oracle)
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        method="extract",
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ultron_whole_model_parity_224():
    """Native resolution: 56x56 pos grid, no window padding."""
    _ultron_parity(224)


def test_ultron_whole_model_parity_256():
    """Pos embed interpolated 56->64; SCALA windows pad 16->21 and 8->14."""
    _ultron_parity(256)


# ---------------------------------------------------------- SENet-G2+ ----


class TorchSEBottleneck(tnn.Module):
    """SE bottleneck (models/senet_g2.py:32-72)."""

    def __init__(self, cin, width, stride=1, reduction=16):
        super().__init__()
        out_ch = width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch)
        self.fc1 = tnn.Linear(out_ch, out_ch // reduction, bias=False)
        self.fc2 = tnn.Linear(out_ch // reduction, out_ch, bias=False)
        self.down = None
        if cin != out_ch or stride != 1:
            self.down = tnn.Conv2d(cin, out_ch, 1, stride=stride, bias=False)
            self.down_bn = tnn.BatchNorm2d(out_ch)

    def forward(self, x):
        y = tF.relu(self.bn1(self.conv1(x)))
        y = tF.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        s = torch.sigmoid(self.fc2(tF.relu(self.fc1(y.mean(dim=(2, 3))))))
        y = y * s[:, :, None, None]
        idt = x if self.down is None else self.down_bn(self.down(x))
        return tF.relu(y + idt)


class TorchSENetG2(tnn.Module):
    """SE-ResNet + G2+ pooling (models/senet_g2.py:156-230),
    layers=(1,1,1,1) test config."""

    def __init__(self, outputdim=32, reduction=16):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        self.blocks = tnn.ModuleList()
        for i, w in enumerate((64, 128, 256, 512)):
            self.blocks.append(TorchSEBottleneck(
                cin, w, stride=2 if i > 0 else 1, reduction=reduction))
            cin = w * 4
        self.p = tnn.Parameter(torch.tensor(2.7))
        self.alpha = tnn.Parameter(torch.tensor(1.3))
        self.beta = tnn.Parameter(torch.tensor(0.2))
        self.feature_proj = tnn.Linear(2048, outputdim)

    def forward(self, x):
        y = self.maxpool(tF.relu(self.bn1(self.conv1(x))))
        for b in self.blocks:
            y = b(y)
        pooled = self.alpha * torch_gem(y, p=self.p) + self.beta
        return l2n(self.feature_proj(pooled))


def _se_block_tree(tb):
    p1, s1 = bn_params(tb.bn1)
    p2, s2 = bn_params(tb.bn2)
    p3, s3 = bn_params(tb.bn3)
    params = {
        "conv1": conv1x1_params(tb.conv1), "bn1": p1,
        "conv2": conv3x3_params(tb.conv2), "bn2": p2,
        "conv3": conv1x1_params(tb.conv3), "bn3": p3,
        "se": {"fc1": {"kernel": tb.fc1.weight.detach().numpy().T},
               "fc2": {"kernel": tb.fc2.weight.detach().numpy().T}},
    }
    stats = {"bn1": s1, "bn2": s2, "bn3": s3}
    if tb.down is not None:
        pd, sd = bn_params(tb.down_bn)
        params["down_conv"] = conv1x1_params(tb.down)
        params["down_bn"] = pd
        stats["down_bn"] = sd
    return params, stats


def test_senet_g2_whole_model_parity():
    rng = np.random.default_rng(31)
    torch.manual_seed(31)
    oracle = TorchSENetG2().eval()
    with torch.no_grad():
        randomize_bn_stats(oracle, rng)

    stem_p, stem_s = bn_params(oracle.bn1)
    params = {
        "conv1": conv3x3_params(oracle.conv1),
        "bn1": stem_p,
        "gem_p": np.asarray([oracle.p.detach().item()], np.float32),
        "g2_alpha": np.asarray([oracle.alpha.detach().item()], np.float32),
        "g2_beta": np.asarray([oracle.beta.detach().item()], np.float32),
        "feature_proj": lin_params(oracle.feature_proj),
        "classifier": {"kernel": np.zeros((32, 5), np.float32),
                       "bias": np.zeros((5,), np.float32)},
    }
    stats = {"bn1": stem_s}
    for i, tb in enumerate(oracle.blocks):
        p, s = _se_block_tree(tb)
        params[f"layer{i + 1}_0"] = p
        stats[f"layer{i + 1}_0"] = s

    model = get_model("senet_g2_r50", layers=(1, 1, 1, 1), outputdim=32,
                      num_classes=5)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), method="extract",
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------- CVNet scorer ----


def same_pad_conv(conv, x):  # x NHWC -> NHWC, TF-SAME padding
    k = conv.kernel_size[0]
    s = conv.stride[0]

    def amt(n):
        out = -(-n // s)
        total = max((out - 1) * s + k - n, 0)
        return total // 2, total - total // 2

    (pt, pb), (pl, pr) = amt(x.shape[1]), amt(x.shape[2])
    t = tF.pad(x.permute(0, 3, 1, 2), (pl, pr, pt, pb))
    return conv(t).permute(0, 2, 3, 1)


class TorchCPC4d(tnn.Module):
    """CenterPivotConv4d: 4D conv as two pivoted 2D convs (HSNet
    semantics; CVNet_Rerank_model.py:11-15 imports, re-derived)."""

    def __init__(self, cin, cout, k, qs, ks):
        super().__init__()
        self.qs, self.ks = qs, ks
        self.conv_q = tnn.Conv2d(cin, cout, k, stride=qs, bias=False)
        self.conv_k = tnn.Conv2d(cin, cout, k, stride=ks, bias=True)

    def forward(self, x):  # [B, ha, wa, hb, wb, C]
        B, ha, wa, hb, wb, C = x.shape
        x1 = x[:, :, :, ::self.ks, ::self.ks, :]
        hb2, wb2 = x1.shape[3], x1.shape[4]
        x1 = x1.permute(0, 3, 4, 1, 2, 5).reshape(B * hb2 * wb2, ha, wa, C)
        o1 = same_pad_conv(self.conv_q, x1)
        ha2, wa2 = o1.shape[1], o1.shape[2]
        o1 = o1.reshape(B, hb2, wb2, ha2, wa2, -1).permute(0, 3, 4, 1, 2, 5)

        x2 = x.reshape(B * ha * wa, hb, wb, C)
        o2 = same_pad_conv(self.conv_k, x2)
        o2 = o2.reshape(B, ha, wa, o2.shape[1], o2.shape[2], -1)
        o2 = o2[:, ::self.qs, ::self.qs]
        return o1 + o2


def gn6d(gn, x):
    """torch GroupNorm over a [B, ha, wa, hb, wb, C] tensor."""
    return gn(x.permute(0, 5, 1, 2, 3, 4)).permute(0, 2, 3, 4, 5, 1)


class TorchCVScorer(tnn.Module):
    """Cross-scale correlation + CVLearner match score
    (CVNet_Rerank_model.py:17-75, CVlearner.py:11-69)."""

    SPECS = [
        ("block1", [(9, 16, 5, 2, 2)]),
        ("block2", [(16, 16, 3, 1, 1), (16, 32, 3, 2, 2)]),
        ("block3", [(32, 32, 3, 1, 1), (32, 32, 3, 1, 1), (32, 64, 3, 2, 2)]),
        ("block4", [(64, 64, 3, 1, 1), (64, 64, 3, 1, 1), (64, 128, 3, 1, 1)]),
    ]

    def __init__(self, in_ch=32, red=16, scales=(0.25, 0.5, 1.0)):
        super().__init__()
        self.scales = scales
        self.compress = tnn.ModuleList([
            tnn.Conv2d(in_ch, red, 3, padding=1, bias=False)
            for _ in scales
        ])
        self.convs = tnn.ModuleDict()
        self.gns = tnn.ModuleDict()
        for name, spec in self.SPECS:
            for i, (cin, cout, k, qs, ks) in enumerate(spec):
                self.convs[f"{name}_conv{i}"] = TorchCPC4d(cin, cout, k, qs, ks)
                self.gns[f"{name}_gn{i}"] = tnn.GroupNorm(4, cout, eps=1e-6)
        self.fc1 = tnn.Linear(128, 128)
        self.fc2 = tnn.Linear(128, 2)

    def _pyramid(self, fmap):  # NHWC
        B, H, W, C = fmap.shape
        outs = []
        for i, s in enumerate(self.scales):
            h, w = max(int(H * s), 1), max(int(W * s), 1)
            if s == 1.0:
                scaled = fmap
            else:
                mh = torch.from_numpy(resize_matrix(H, h))
                mw = torch.from_numpy(resize_matrix(W, w))
                scaled = torch.einsum("hp,bpqc,wq->bhwc", mh, fmap, mw)
            t = self.compress[i](scaled.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            outs.append(l2n(t, dim=-1))
        return outs

    def forward(self, qf, kf):  # NHWC featuremaps
        qs, ks = self._pyramid(qf), self._pyramid(kf)
        B = qf.shape[0]
        Hq, Wq = qs[-1].shape[1], qs[-1].shape[2]
        Hk, Wk = ks[-1].shape[1], ks[-1].shape[2]
        vols = []
        for q in qs:
            for k in ks:
                corr = torch.einsum("bijc,bklc->bijkl", q, k).clamp(min=0.0)
                ms = [torch.from_numpy(resize_matrix(corr.shape[d + 1], out))
                      for d, out in enumerate((Hq, Wq, Hk, Wk))]
                corr = torch.einsum(
                    "Qi,Wj,Kk,Ll,bijkl->bQWKL", ms[0], ms[1], ms[2], ms[3],
                    corr)
                vols.append(corr)
        x = torch.stack(vols, dim=-1)  # [B, Hq, Wq, Hk, Wk, 9]
        for name, spec in self.SPECS:
            for i in range(len(spec)):
                x = gn6d(self.gns[f"{name}_gn{i}"],
                         self.convs[f"{name}_conv{i}"](x))
                x = tF.relu(x)
        pooled = x.mean(dim=(1, 2, 3, 4))
        logits = self.fc2(tF.relu(self.fc1(pooled)))
        return tF.softmax(logits, dim=-1)[:, 1]


def test_cvnet_scorer_parity():
    rng = np.random.default_rng(32)
    torch.manual_seed(32)
    oracle = TorchCVScorer().eval()

    def cpc_tree(c):
        return {
            "conv_query": {"kernel": np.transpose(
                c.conv_q.weight.detach().numpy(), (2, 3, 1, 0))},
            "conv_key": {"kernel": np.transpose(
                c.conv_k.weight.detach().numpy(), (2, 3, 1, 0)),
                "bias": c.conv_k.bias.detach().numpy()},
        }

    learner = {"mlp_fc1": lin_params(oracle.fc1),
               "mlp_fc2": lin_params(oracle.fc2)}
    for name, spec in TorchCVScorer.SPECS:
        for i in range(len(spec)):
            learner[f"{name}_conv{i}"] = cpc_tree(oracle.convs[f"{name}_conv{i}"])
            gn = oracle.gns[f"{name}_gn{i}"]
            learner[f"{name}_gn{i}"] = {
                "scale": gn.weight.detach().numpy(),
                "bias": gn.bias.detach().numpy(),
            }
    params = {"cv_learner": learner}
    for i in range(3):
        params[f"compress{i}"] = {"kernel": np.transpose(
            oracle.compress[i].weight.detach().numpy(), (2, 3, 1, 0))}

    model = CVNetRerank(backbone_name="resnet18", reduction_dim=16)
    qf = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    kf = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(qf), torch.from_numpy(kf)).numpy()
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(qf), jnp.asarray(kf),
        method="score_from_featuremaps",
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------- GeM @ 224px ----


def test_gem_whole_model_parity_224():
    """Eval-like resolution (stage-5 map 7x7 vs the 2x2 flagship test)."""
    rng = np.random.default_rng(33)
    torch.manual_seed(33)
    oracle = TorchGeMModel(outputdim=24).eval()
    with torch.no_grad():
        randomize_bn_stats(oracle.backbone, rng)

    variables = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    model = get_model("gem_r50", backbone_name="resnet18", outputdim=24,
                      num_classes=5)
    params = {
        "backbone": variables["params"],
        "whiten": lin_params(oracle.whiten),
        "classifier_w": np.zeros((5, 24), np.float32),
    }
    v = {"params": params, "batch_stats": {"backbone": variables["batch_stats"]}}
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(
        v, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), method="extract",
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
