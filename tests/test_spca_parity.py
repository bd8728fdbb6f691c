"""SpCa layer numerical parity vs an independent torch oracle.

SpCa is the reference repo's primary method; this pins the live math of
the layer (GMM soft assignment, HW-normalized attention, distance-encoding
matrix powers, per-channel LayerNorm) against a torch implementation of
the same equations with shared parameters.
"""

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.spca import (
    SpcaLayer,
    distance_encoding_masks,
)

B, H, W, C, K, D, MULTI = 2, 4, 5, 16, 6, 8, 2


def torch_distance_masks(H, W, multi):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coord = torch.tensor(
        np.stack([yy.ravel(), xx.ravel()], 1), dtype=torch.float64
    )
    inner = -2 * coord @ coord.T
    sq = (coord * coord).sum(1, keepdim=True)
    mask = torch.exp(-torch.abs((sq + inner + sq.T).sqrt()))
    # reference: D = repeat(mask.sum(dim=1, keepdim=True) over rows) ->
    # divide each COLUMN by its sum (spca.py:195-196)
    A = mask / mask.sum(0, keepdim=True)
    out, m = [], A
    for _ in range(multi):
        m = m @ A
        out.append(m)
    return out


def torch_spca_layer(x_map, params):
    """Reference live-path math (networks/spca.py:115-180)."""
    # 1x1 conv == per-position linear
    w = torch.tensor(params["proj_kv"]["kernel"])[0, 0]  # [C, D]
    x = torch.tensor(x_map).reshape(B, H * W, C).double() @ w.double()

    clusters = torch.tensor(params["clusters"]).double()
    pi = torch.tensor(params["pi"]).double()
    cov = torch.tensor(params["cov"]).double()
    ln_s = torch.tensor(params["norm_templates"]["scale"]).double()
    ln_b = torch.tensor(params["norm_templates"]["bias"]).double()
    templates = tF.layer_norm(clusters, (D,), ln_s, ln_b)  # [1, K, D]

    sub = x.unsqueeze(2) - templates.unsqueeze(1)  # [B, HW, K, D]
    sq = (sub**2).sum(-1)  # [B, HW, K]
    attn_logits = torch.log(pi / cov.sqrt()).unsqueeze(1) - sq / cov.unsqueeze(1) / 2
    attn = tF.softmax(attn_logits, dim=-1)
    attn_ = attn + 1e-8
    attn_ = attn_ / attn_.sum(dim=-2, keepdim=True)

    masks = torch_distance_masks(H, W, MULTI)
    parts = [torch.einsum("bnk,nm->bkm", attn_, m) for m in masks]
    outp = torch.cat(parts, dim=1)  # [B, K*MULTI, HW]
    pn_s = torch.tensor(params["p_norm"]["scale"]).double()
    pn_b = torch.tensor(params["p_norm"]["bias"]).double()
    outp = tF.layer_norm(outp.permute(0, 2, 1), (K * MULTI,), pn_s, pn_b)
    return outp.reshape(B, H, W, K * MULTI), attn.reshape(B, H, W, K)


def test_distance_masks_match_torch():
    ours = distance_encoding_masks(H, W, MULTI)
    theirs = torch_distance_masks(H, W, MULTI)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy(), rtol=1e-5, atol=1e-6
        )


def test_spca_layer_matches_torch(rng):
    layer = SpcaLayer(K=K, local_dim=D, multi=MULTI)
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])

    outp, attn = layer.apply(variables, jnp.asarray(x))
    t_outp, t_attn = torch_spca_layer(x, params)

    np.testing.assert_allclose(
        np.asarray(attn), t_attn.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(outp), t_outp.numpy(), rtol=1e-3, atol=1e-4
    )
