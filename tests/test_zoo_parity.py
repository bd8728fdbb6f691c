"""Whole-model torch-oracle parity for the rest of the model zoo.

Extends test_flagship_parity.py (GeM/DOLG/Token) to SOLAR, SoSNet, SpoC,
HOW-VLAD, HOW-ASMK, and the FULL SpCa model (EM layer + 'cro' fuser + GeM
+ whiten): an independent torch oracle implements the reference model math
end-to-end (reference: networks/RetrievalNet.py:534-600 SOLAR,
models/sosnet.py:95-236, models/spoc.py:97-249, models/how_vlad.py:107-199,
networks/spca.py:18-95), the SAME converted weights are loaded both sides,
and the L2-normalized descriptors must agree to <= 1e-4.

Each test pins a LOCAL rng (suite-order independence — margin-sensitive
comparisons must not depend on the session fixture's draw position).
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from test_backbone import TorchResNet, randomize_bn_stats
from test_flagship_parity import bn_params, conv1x1_params, torch_gem
from test_layers import TorchAttention, attn_params, lin_params

from research_image_retrieval_tpu.models import convert_torch_resnet, get_model

B, S = 2, 64  # stage-5 of resnet18 at 64px = 2x2 map


def l2n(x, dim=-1):
    return tF.normalize(x, dim=dim)


def _images(rng, size=S):
    return rng.standard_normal((B, 3, size, size)).astype(np.float32)


def conv3x3_params(conv):
    """torch Conv2d (any kernel) -> flax Conv {kernel HWIO, bias}."""
    out = {"kernel": np.transpose(conv.weight.detach().numpy(), (2, 3, 1, 0))}
    if conv.bias is not None:
        out["bias"] = conv.bias.detach().numpy()
    return out


def ln_params(ln):
    return {"scale": ln.weight.detach().numpy(),
            "bias": ln.bias.detach().numpy()}


def _extract(model, variables, x_nchw):
    got = model.apply(
        variables, jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))),
        method="extract",
    )
    return np.asarray(got)


# -------------------------------------------------------------- SOLAR ----


class TorchSOLAR(tnn.Module):
    """Reference SOLAR extract path (RetrievalNet.py:534-600)."""

    def __init__(self, ch=512, k=2, outputdim=24):
        super().__init__()
        mid = ch // k
        self.mid = mid
        self.backbone = TorchResNet("resnet18")
        self.f = tnn.Conv2d(ch, mid, 1)
        self.f_bn = tnn.BatchNorm2d(mid)
        self.g = tnn.Conv2d(ch, mid, 1)
        self.g_bn = tnn.BatchNorm2d(mid)
        self.h = tnn.Conv2d(ch, mid, 1)
        self.v = tnn.Conv2d(mid, ch, 1)
        self.whiten = tnn.Linear(ch, outputdim)

    def forward(self, x):
        fmap = self.backbone(x, taps=(5,))[5]  # [B, C, H, W]
        b, c, hh, ww = fmap.shape
        f = tF.relu(self.f_bn(self.f(fmap)))
        g = tF.relu(self.g_bn(self.g(fmap)))
        h = self.h(fmap)
        # NHWC row-major token order (matches the flax reshape)
        tok = lambda t: t.permute(0, 2, 3, 1).reshape(b, hh * ww, self.mid)
        fx, gx, hx = tok(f), tok(g), tok(h)
        attn = tF.softmax(
            torch.einsum("bnm,bkm->bnk", fx, gx) * self.mid**-0.5, dim=-1
        )
        z = torch.einsum("bnk,bkm->bnm", attn, hx)
        z = z.reshape(b, hh, ww, self.mid).permute(0, 3, 1, 2)
        soa = self.v(z) + fmap
        return l2n(self.whiten(l2n(torch_gem(soa))))


def test_solar_whole_model_parity():
    rng = np.random.default_rng(20)
    torch.manual_seed(20)
    oracle = TorchSOLAR().eval()
    with torch.no_grad():
        randomize_bn_stats(oracle, rng)

    bb = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    f_bn_p, f_bn_s = bn_params(oracle.f_bn)
    g_bn_p, g_bn_s = bn_params(oracle.g_bn)
    params = {
        "backbone": bb["params"],
        "soa": {
            "f": conv1x1_params(oracle.f), "f_bn": f_bn_p,
            "g": conv1x1_params(oracle.g), "g_bn": g_bn_p,
            "h": conv1x1_params(oracle.h), "v": conv1x1_params(oracle.v),
        },
        "whiten": lin_params(oracle.whiten),
        "classifier_w": np.zeros((5, 24), np.float32),
    }
    stats = {"backbone": bb["batch_stats"],
             "soa": {"f_bn": f_bn_s, "g_bn": g_bn_s}}

    model = get_model("solar_r50", backbone_name="resnet18", outputdim=24,
                      num_classes=5)
    x = _images(rng)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = _extract(model, {"params": params, "batch_stats": stats}, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- SoSNet ----


class TorchSoSNet(tnn.Module):
    """Reference SoSNet extract path (models/sosnet.py:95-236)."""

    def __init__(self, ch=512, so_dim=24, outputdim=32):
        super().__init__()
        self.backbone = TorchResNet("resnet18")
        self.so_proj = tnn.Conv2d(ch, so_dim, 1)
        self.attn_fc1 = tnn.Linear(ch, 512)
        self.attn_fc2 = tnn.Linear(512, 256)
        self.attn_fc3 = tnn.Linear(256, 1)
        self.proj_fc1 = tnn.Linear(so_dim * (so_dim + 1) // 2, outputdim)
        self.proj_fc2 = tnn.Linear(outputdim, outputdim)

    def forward(self, x):
        fmap = self.backbone(x, taps=(5,))[5]  # [B, C, H, W]
        t = fmap.permute(0, 2, 3, 1)  # NHWC: per-position MLP
        a = torch.sigmoid(self.attn_fc3(tF.relu(self.attn_fc2(
            tF.relu(self.attn_fc1(t))))))
        t = t * a
        so = self.so_proj(t.permute(0, 3, 1, 2))  # [B, D, H, W]
        b, d, hh, ww = so.shape
        tokens = so.permute(0, 2, 3, 1).reshape(b, hh * ww, d).double()
        centered = tokens - tokens.mean(dim=1, keepdim=True)
        cov = torch.einsum("bnc,bnd->bcd", centered, centered) / max(
            hh * ww - 1, 1
        )
        iu = np.triu_indices(d)
        flat = l2n(cov[:, iu[0], iu[1]].float())
        return l2n(self.proj_fc2(tF.relu(self.proj_fc1(flat))))


def test_sosnet_whole_model_parity():
    rng = np.random.default_rng(21)
    torch.manual_seed(21)
    oracle = TorchSoSNet().eval()
    with torch.no_grad():
        randomize_bn_stats(oracle.backbone, rng)

    bb = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    params = {
        "backbone": bb["params"],
        "so_proj": conv1x1_params(oracle.so_proj),
        "attn_fc1": lin_params(oracle.attn_fc1),
        "attn_fc2": lin_params(oracle.attn_fc2),
        "attn_fc3": lin_params(oracle.attn_fc3),
        "proj_fc1": lin_params(oracle.proj_fc1),
        "proj_fc2": lin_params(oracle.proj_fc2),
        "classifier": {"kernel": np.zeros((32, 5), np.float32),
                       "bias": np.zeros((5,), np.float32)},
    }
    model = get_model("sosnet_r50", backbone_name="resnet18", outputdim=32,
                      second_order_dim=24, num_classes=5)
    x = _images(rng)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = _extract(
        model, {"params": params, "batch_stats": {"backbone": bb["batch_stats"]}}, x
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------- SpoC ----


class TorchSpoC(tnn.Module):
    """Reference SpoC extract path (models/spoc.py:97-249)."""

    def __init__(self, ch=512, ctx=64, outputdim=32, levels=(1, 2, 4)):
        super().__init__()
        self.levels = levels
        self.backbone = TorchResNet("resnet18")
        self.ctx_conv1 = tnn.Conv2d(ch, ctx, 3, padding=1)
        self.ctx_bn1 = tnn.BatchNorm2d(ctx)
        self.ctx_conv2 = tnn.Conv2d(ctx, ctx, 3, padding=1)
        self.ctx_bn2 = tnn.BatchNorm2d(ctx)
        self.ctx_attn = tnn.Conv2d(ctx, 1, 1)
        self.refine = tnn.Conv2d(ch + ctx, ch, 1)
        self.agg_proj = tnn.Linear(ch, outputdim)
        self.agg_bn = tnn.BatchNorm1d(outputdim)
        self.proj_fc1 = tnn.Linear(outputdim, outputdim)
        self.proj_fc2 = tnn.Linear(outputdim, outputdim)

    def forward(self, x):
        fmap = self.backbone(x, taps=(5,))[5]  # [B, C, H, W]
        ctx = tF.relu(self.ctx_bn1(self.ctx_conv1(fmap)))
        ctx = tF.relu(self.ctx_bn2(self.ctx_conv2(ctx)))
        att = torch.sigmoid(self.ctx_attn(ctx))
        fmap = self.refine(torch.cat([fmap * att, ctx], dim=1))
        b, c, hh, ww = fmap.shape
        regions = []
        for level in self.levels:
            kh, kw = max(hh // level, 1), max(ww // level, 1)
            pooled = tF.max_pool2d(fmap, (kh, kw), stride=(kh, kw))
            regions.append(
                pooled.permute(0, 2, 3, 1).reshape(b, -1, c)
            )  # NHWC row-major region order
        pyr = torch.cat(regions, dim=1)  # [B, R, C]
        agg = self.agg_proj(pyr)  # [B, R, out]
        agg = self.agg_bn(agg.permute(0, 2, 1)).permute(0, 2, 1)
        feat = tF.relu(agg).max(dim=1).values
        return l2n(self.proj_fc2(tF.relu(self.proj_fc1(feat))))


def test_spoc_whole_model_parity():
    rng = np.random.default_rng(22)
    torch.manual_seed(22)
    oracle = TorchSpoC().eval()
    gen = np.random.default_rng(23)
    with torch.no_grad():
        randomize_bn_stats(oracle.backbone, rng)
        for bn in (oracle.ctx_bn1, oracle.ctx_bn2, oracle.agg_bn):
            bn.running_mean.copy_(torch.from_numpy(
                gen.standard_normal(bn.num_features).astype(np.float32)) * 0.1)
            bn.running_var.copy_(torch.from_numpy(
                np.abs(gen.standard_normal(bn.num_features)).astype(np.float32)
                + 0.5))

    bb = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    bn1_p, bn1_s = bn_params(oracle.ctx_bn1)
    bn2_p, bn2_s = bn_params(oracle.ctx_bn2)
    agg_bn_p, agg_bn_s = bn_params(oracle.agg_bn)
    params = {
        "backbone": bb["params"],
        "ctx_conv1": conv3x3_params(oracle.ctx_conv1),
        "ctx_conv2": conv3x3_params(oracle.ctx_conv2),
        "ctx_attn": conv1x1_params(oracle.ctx_attn),
        "_context": {"ctx_bn1": bn1_p, "ctx_bn2": bn2_p,
                     "refine_conv": conv1x1_params(oracle.refine)},
        "agg_proj": lin_params(oracle.agg_proj),
        "_features": {"agg_bn": agg_bn_p},
        "proj_fc1": lin_params(oracle.proj_fc1),
        "proj_fc2": lin_params(oracle.proj_fc2),
        "classifier": {"kernel": np.zeros((32, 5), np.float32),
                       "bias": np.zeros((5,), np.float32)},
    }
    stats = {
        "backbone": bb["batch_stats"],
        "_context": {"ctx_bn1": bn1_s, "ctx_bn2": bn2_s},
        "_features": {"agg_bn": agg_bn_s},
    }
    model = get_model("spoc_r50", backbone_name="resnet18", outputdim=32,
                      context_dim=64, num_classes=5)
    x = _images(rng)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = _extract(model, {"params": params, "batch_stats": stats}, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- HOW ----


class TorchHOW(tnn.Module):
    """Reference HOW-VLAD / HOW-ASMK extract path
    (models/how_vlad.py:14-199) with the reference's per-cluster /
    per-token loops kept literal (the vectorized JAX side must match)."""

    def __init__(self, pooling, ch=512, local_dim=16, K=8, outputdim=32,
                 alpha=100.0):
        super().__init__()
        self.pooling, self.K, self.alpha = pooling, K, alpha
        self.backbone = TorchResNet("resnet18")
        self.local_proj = tnn.Conv2d(ch, local_dim, 1)
        self.centroids = tnn.Parameter(torch.rand(K, local_dim))
        self.weights = tnn.Parameter(torch.ones(K))
        in_dim = K * local_dim if pooling == "vlad" else K
        self.final_proj = tnn.Linear(in_dim, outputdim)

    def forward(self, x):
        fmap = self.backbone(x, taps=(5,))[5]
        loc = self.local_proj(fmap)  # [B, D, H, W]
        b, d, hh, ww = loc.shape
        tokens = l2n(loc.permute(0, 2, 3, 1).reshape(b, hh * ww, d))
        dist = torch.cdist(tokens, self.centroids[None].expand(b, -1, -1))
        if self.pooling == "vlad":
            assign = tF.softmax(-self.alpha * dist, dim=2)  # [B, N, K]
            vlads = []
            for k in range(self.K):  # reference's per-cluster loop
                res = tokens - self.centroids[k]
                vlads.append((assign[:, :, k : k + 1] * res).sum(dim=1))
            pooled = l2n(torch.stack(vlads, dim=1).reshape(b, -1))
        else:
            min_d, nearest = dist.min(dim=2)
            out = torch.zeros(b, self.K)
            for i in range(b):  # reference's per-image/token double loop
                thr = min_d[i].mean() + min_d[i].std()
                for n in range(hh * ww):
                    if min_d[i, n] < thr:
                        out[i, nearest[i, n]] += self.weights[nearest[i, n]]
            pooled = l2n(out)
        return l2n(self.final_proj(pooled))


def _how_parity(pooling, model_name):
    rng = np.random.default_rng(24)
    torch.manual_seed(24)
    oracle = TorchHOW(pooling).eval()
    with torch.no_grad():
        randomize_bn_stats(oracle.backbone, rng)

    bb = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    params = {
        "backbone": bb["params"],
        "local_proj": conv1x1_params(oracle.local_proj),
        "centroids": oracle.centroids.detach().numpy(),
        "final_proj": lin_params(oracle.final_proj),
        "classifier": {"kernel": np.zeros((32, 5), np.float32),
                       "bias": np.zeros((5,), np.float32)},
    }
    if pooling == "asmk":
        params["weights"] = oracle.weights.detach().numpy()
    model = get_model(model_name, backbone_name="resnet18", local_dim=16,
                      num_clusters=8, outputdim=32, num_classes=5)
    x = _images(rng)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = _extract(
        model, {"params": params, "batch_stats": {"backbone": bb["batch_stats"]}}, x
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_how_vlad_whole_model_parity():
    _how_parity("vlad", "how_vlad_r50")


def test_how_asmk_whole_model_parity():
    _how_parity("asmk", "how_asmk_r50")


# --------------------------------------------------------- SpCa (full) ----


class TorchSpCa(tnn.Module):
    """Reference FULL SpCa extract path, 'cro' fuser
    (networks/spca.py:18-95, 97-180, 259-286)."""

    def __init__(self, ch=512, K=8, local_dim=16, multi=1, outputdim=32):
        super().__init__()
        self.K, self.D, self.multi = K, local_dim, multi
        self.backbone = TorchResNet("resnet18")
        self.proj_kv = tnn.Conv2d(ch, local_dim, 1, bias=False)
        self.clusters = tnn.Parameter(torch.randn(1, K, local_dim))
        self.pi = tnn.Parameter(torch.full((1, K), 1.0 / K))
        self.cov = tnn.Parameter(torch.ones(1, K))
        self.norm_templates = tnn.LayerNorm(local_dim)
        self.p_norm = tnn.LayerNorm(K * multi)
        # 'cro' fuser: LN(q) cross-attends to projected context features
        self.fuser_ln = tnn.LayerNorm(ch)
        self.fuser_proj = tnn.Linear(K * multi, ch)
        self.cross_attn = TorchAttention(ch, 8, qkv_bias=True)
        self.mlp_fc1 = tnn.Linear(ch, 2 * ch)
        self.mlp_fc2 = tnn.Linear(2 * ch, ch)
        self.whiten = tnn.Linear(ch, outputdim)

    def _distance_masks(self, hh, ww):
        yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
        coord = torch.tensor(np.stack([yy.ravel(), xx.ravel()], 1),
                             dtype=torch.float32)
        inner = -2 * coord @ coord.T
        sq = (coord * coord).sum(1, keepdim=True)
        mask = torch.exp(-torch.abs((sq + inner + sq.T).sqrt()))
        A = mask / mask.sum(0, keepdim=True)  # column-normalized
        out, m = [], A
        for _ in range(self.multi):
            m = m @ A
            out.append(m)
        return out

    def forward(self, x):
        g = self.backbone(x, taps=(5,))[5]  # [B, C, H, W]
        b, c, hh, ww = g.shape
        n = hh * ww
        xk = self.proj_kv(g).permute(0, 2, 3, 1).reshape(b, n, self.D)

        templates = self.norm_templates(self.clusters)  # [1, K, D]
        sub = xk.unsqueeze(2) - templates.unsqueeze(1)  # [B, N, K, D]
        sq = (sub**2).sum(-1)
        logits = torch.log(self.pi / self.cov.sqrt()).unsqueeze(1) \
            - sq / self.cov.unsqueeze(1) / 2
        attn = tF.softmax(logits, dim=-1) + 1e-8
        attn = attn / attn.sum(dim=-2, keepdim=True)  # L1 over HW

        parts = [torch.einsum("bnk,nm->bkm", attn, m)
                 for m in self._distance_masks(hh, ww)]
        outp = self.p_norm(torch.cat(parts, dim=1).permute(0, 2, 1))  # [B,N,KM]

        q = g.permute(0, 2, 3, 1).reshape(b, n, c)
        xf = self.fuser_proj(outp)
        q = q + self.cross_attn(self.fuser_ln(q), xf, xf)
        h = self.mlp_fc2(tF.gelu(self.mlp_fc1(q)))
        q = q + h
        fused = q.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return l2n(self.whiten(torch_gem(fused)))


def test_spca_whole_model_parity():
    _spca_parity(S)


def test_spca_whole_model_parity_224():
    """Eval-like resolution: the 7x7 stage-5 grid exercises the 49x49
    spatial-context distance encodings (masks are 2x2-trivial at 64px)."""
    _spca_parity(224)


def _spca_parity(size):
    rng = np.random.default_rng(25)
    torch.manual_seed(25)
    oracle = TorchSpCa().eval()
    with torch.no_grad():
        randomize_bn_stats(oracle.backbone, rng)

    bb = convert_torch_resnet(oracle.backbone.state_dict(), "resnet18")
    params = {
        "backbone": bb["params"],
        "pos_branch": {
            "proj_kv": {"kernel": np.transpose(
                oracle.proj_kv.weight.detach().numpy(), (2, 3, 1, 0))},
            "clusters": oracle.clusters.detach().numpy(),
            "pi": oracle.pi.detach().numpy(),
            "cov": oracle.cov.detach().numpy(),
            "norm_templates": ln_params(oracle.norm_templates),
            "p_norm": ln_params(oracle.p_norm),
        },
        "fuser": {
            "ln": ln_params(oracle.fuser_ln),
            "proj": lin_params(oracle.fuser_proj),
            "cross_attn": attn_params(oracle.cross_attn),
            "mlp": {"fc1": lin_params(oracle.mlp_fc1),
                    "fc2": lin_params(oracle.mlp_fc2)},
        },
        "whiten": lin_params(oracle.whiten),
        "classifier_w": np.zeros((5, 32), np.float32),
    }
    model = get_model("spca_r50", backbone_name="resnet18", outputdim=32,
                      K=8, local_dim=16, multi=1, combine="cro",
                      mediumdim=512, num_classes=5)
    x = _images(rng, size=size)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = _extract(
        model, {"params": params, "batch_stats": {"backbone": bb["batch_stats"]}}, x
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
