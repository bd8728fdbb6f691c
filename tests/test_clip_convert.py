"""CLIP state-dict converter parity vs a functional torch oracle.

Random OpenAI-layout state dicts (both tower families) are run through a
minimal functional torch implementation of CLIP's forward semantics
(reference behavior: networks/model.py:10-378 — re-derived here as pure
torch.nn.functional calls, no module classes) and through
``build_clip_from_torch`` -> Flax; image and text embeddings must agree.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from research_image_retrieval_tpu.models.clip_convert import (  # noqa: E402
    build_clip_from_torch,
)

# ---------------------------------------------------------------- oracle --


def _mha(x_q, x_kv, sd, p, heads, mask=None):
    """torch nn.MultiheadAttention forward from packed weights."""
    w_in, b_in = sd[f"{p}.in_proj_weight"], sd[f"{p}.in_proj_bias"]
    d = x_q.shape[-1]
    q = x_q @ w_in[:d].T + b_in[:d]
    k = x_kv @ w_in[d : 2 * d].T + b_in[d : 2 * d]
    v = x_kv @ w_in[2 * d :].T + b_in[2 * d :]
    B, Nq, _ = q.shape
    hd = d // heads
    q = q.view(B, Nq, heads, hd).transpose(1, 2)
    k = k.view(B, -1, heads, hd).transpose(1, 2)
    v = v.view(B, -1, heads, hd).transpose(1, 2)
    a = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
    if mask is not None:
        a = a + mask
    a = a.softmax(-1)
    out = (a @ v).transpose(1, 2).reshape(B, Nq, d)
    return out @ sd[f"{p}.out_proj.weight"].T + sd[f"{p}.out_proj.bias"]


def _ln(x, sd, p):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"], sd[f"{p}.bias"])


def _block(x, sd, p, heads, mask=None):
    h = x + _mha(_ln(x, sd, f"{p}.ln_1"), _ln(x, sd, f"{p}.ln_1"), sd,
                 f"{p}.attn", heads, mask)
    y = _ln(h, sd, f"{p}.ln_2") @ sd[f"{p}.mlp.c_fc.weight"].T \
        + sd[f"{p}.mlp.c_fc.bias"]
    y = y * torch.sigmoid(1.702 * y)  # quick-GELU
    y = y @ sd[f"{p}.mlp.c_proj.weight"].T + sd[f"{p}.mlp.c_proj.bias"]
    return h + y


def _oracle_text(sd, tokens, depth, heads):
    x = F.embedding(tokens, sd["token_embedding.weight"])
    T = tokens.shape[1]
    x = x + sd["positional_embedding"][:T]
    mask = torch.full((T, T), float("-inf")).triu_(1)
    for i in range(depth):
        x = _block(x, sd, f"transformer.resblocks.{i}", heads, mask)
    x = _ln(x, sd, "ln_final")
    eot = tokens.argmax(dim=-1)
    return x[torch.arange(x.shape[0]), eot] @ sd["text_projection"]


def _oracle_vit(sd, img, depth, heads):
    patch = sd["visual.conv1.weight"].shape[-1]
    x = F.conv2d(img, sd["visual.conv1.weight"], stride=patch)
    B, C = x.shape[:2]
    x = x.reshape(B, C, -1).permute(0, 2, 1)
    cls = sd["visual.class_embedding"].expand(B, 1, C)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    x = _ln(x, sd, "visual.ln_pre")
    for i in range(depth):
        x = _block(x, sd, f"visual.transformer.resblocks.{i}", heads)
    return _ln(x[:, 0], sd, "visual.ln_post") @ sd["visual.proj"]


def _bn(x, sd, p):
    return F.batch_norm(
        x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
        sd[f"{p}.weight"], sd[f"{p}.bias"], training=False, eps=1e-5,
    )


def _oracle_rn(sd, img, layers):
    x = img
    for k, stride in ((1, 2), (2, 1), (3, 1)):
        x = F.relu(_bn(
            F.conv2d(x, sd[f"visual.conv{k}.weight"], stride=stride, padding=1),
            sd, f"visual.bn{k}",
        ))
    x = F.avg_pool2d(x, 2)
    for li, depth in enumerate(layers, start=1):
        for j in range(depth):
            tp = f"visual.layer{li}.{j}"
            stride = 2 if (j == 0 and li > 1) else 1
            y = F.relu(_bn(F.conv2d(x, sd[f"{tp}.conv1.weight"]), sd, f"{tp}.bn1"))
            y = F.relu(_bn(
                F.conv2d(y, sd[f"{tp}.conv2.weight"], padding=1), sd, f"{tp}.bn2"
            ))
            if stride > 1:
                y = F.avg_pool2d(y, stride)
            y = _bn(F.conv2d(y, sd[f"{tp}.conv3.weight"]), sd, f"{tp}.bn3")
            idn = x
            if f"{tp}.downsample.0.weight" in sd:
                if stride > 1:
                    idn = F.avg_pool2d(idn, stride)
                idn = _bn(
                    F.conv2d(idn, sd[f"{tp}.downsample.0.weight"]),
                    sd, f"{tp}.downsample.1",
                )
            x = F.relu(y + idn)
    # attention pool (reference: networks/model.py:68-91)
    B, C = x.shape[:2]
    t = x.reshape(B, C, -1).permute(0, 2, 1)
    t = torch.cat([t.mean(dim=1, keepdim=True), t], dim=1)
    t = t + sd["visual.attnpool.positional_embedding"]
    ap = "visual.attnpool"
    heads = C // 64
    q = t[:, :1] @ sd[f"{ap}.q_proj.weight"].T + sd[f"{ap}.q_proj.bias"]
    k = t @ sd[f"{ap}.k_proj.weight"].T + sd[f"{ap}.k_proj.bias"]
    v = t @ sd[f"{ap}.v_proj.weight"].T + sd[f"{ap}.v_proj.bias"]
    hd = C // heads
    q = q.view(B, 1, heads, hd).transpose(1, 2)
    k = k.view(B, -1, heads, hd).transpose(1, 2)
    v = v.view(B, -1, heads, hd).transpose(1, 2)
    a = ((q @ k.transpose(-1, -2)) / math.sqrt(hd)).softmax(-1)
    out = (a @ v).transpose(1, 2).reshape(B, C)
    return out @ sd[f"{ap}.c_proj.weight"].T + sd[f"{ap}.c_proj.bias"]


# ------------------------------------------------------- state-dict gen --


def _add_blocks(sd, g, prefix, depth, d):
    for i in range(depth):
        p = f"{prefix}.{i}"
        sd[f"{p}.ln_1.weight"] = g.rand(d) + 0.5
        sd[f"{p}.ln_1.bias"] = g.randn(d) * 0.1
        sd[f"{p}.ln_2.weight"] = g.rand(d) + 0.5
        sd[f"{p}.ln_2.bias"] = g.randn(d) * 0.1
        sd[f"{p}.attn.in_proj_weight"] = g.randn(3 * d, d) * d**-0.5
        sd[f"{p}.attn.in_proj_bias"] = g.randn(3 * d) * 0.02
        sd[f"{p}.attn.out_proj.weight"] = g.randn(d, d) * d**-0.5
        sd[f"{p}.attn.out_proj.bias"] = g.randn(d) * 0.02
        sd[f"{p}.mlp.c_fc.weight"] = g.randn(4 * d, d) * d**-0.5
        sd[f"{p}.mlp.c_fc.bias"] = g.randn(4 * d) * 0.02
        sd[f"{p}.mlp.c_proj.weight"] = g.randn(d, 4 * d) * d**-0.5
        sd[f"{p}.mlp.c_proj.bias"] = g.randn(d) * 0.02


def _text_sd(sd, g, width=128, depth=2, ctx=12, vocab=64, embed=24):
    sd["token_embedding.weight"] = g.randn(vocab, width) * 0.02
    sd["positional_embedding"] = g.randn(ctx, width) * 0.01
    _add_blocks(sd, g, "transformer.resblocks", depth, width)
    sd["ln_final.weight"] = g.rand(width) + 0.5
    sd["ln_final.bias"] = g.randn(width) * 0.1
    sd["text_projection"] = g.randn(width, embed) * width**-0.5
    sd["logit_scale"] = torch.tensor(np.log(1 / 0.07), dtype=torch.float32)


class _G:
    def __init__(self, seed):
        self.gen = torch.Generator().manual_seed(seed)

    def randn(self, *shape):
        return torch.randn(*shape, generator=self.gen)

    def rand(self, *shape):
        return torch.rand(*shape, generator=self.gen)


def _make_vit_sd(seed=0):
    g = _G(seed)
    d, patch, grid, embed = 32, 8, 4, 24  # matches VIT_CONFIGS["test"]
    sd = {}
    sd["visual.conv1.weight"] = g.randn(d, 3, patch, patch) * 0.05
    sd["visual.class_embedding"] = g.randn(d) * d**-0.5
    sd["visual.positional_embedding"] = g.randn(grid * grid + 1, d) * d**-0.5
    sd["visual.ln_pre.weight"] = g.rand(d) + 0.5
    sd["visual.ln_pre.bias"] = g.randn(d) * 0.1
    _add_blocks(sd, g, "visual.transformer.resblocks", 2, d)
    sd["visual.ln_post.weight"] = g.rand(d) + 0.5
    sd["visual.ln_post.bias"] = g.randn(d) * 0.1
    sd["visual.proj"] = g.randn(d, embed) * d**-0.5
    _text_sd(sd, g, embed=embed)
    return sd


def _make_rn_sd(seed=1):
    g = _G(seed)
    width, embed = 8, 24  # matches CLIP_RESNET_CONFIGS["rtest"]
    half = width // 2
    sd = {}

    def bn(p, ch):
        sd[f"{p}.weight"] = g.rand(ch) + 0.5
        sd[f"{p}.bias"] = g.randn(ch) * 0.1
        sd[f"{p}.running_mean"] = g.randn(ch) * 0.1
        sd[f"{p}.running_var"] = g.rand(ch) + 0.5

    sd["visual.conv1.weight"] = g.randn(half, 3, 3, 3) * 0.2
    bn("visual.bn1", half)
    sd["visual.conv2.weight"] = g.randn(half, half, 3, 3) * 0.2
    bn("visual.bn2", half)
    sd["visual.conv3.weight"] = g.randn(width, half, 3, 3) * 0.2
    bn("visual.bn3", width)

    inplanes = width
    for li in range(1, 5):
        planes = width * 2 ** (li - 1)
        tp = f"visual.layer{li}.0"
        sd[f"{tp}.conv1.weight"] = g.randn(planes, inplanes, 1, 1) * 0.2
        bn(f"{tp}.bn1", planes)
        sd[f"{tp}.conv2.weight"] = g.randn(planes, planes, 3, 3) * 0.1
        bn(f"{tp}.bn2", planes)
        sd[f"{tp}.conv3.weight"] = g.randn(planes * 4, planes, 1, 1) * 0.1
        bn(f"{tp}.bn3", planes * 4)
        sd[f"{tp}.downsample.0.weight"] = g.randn(planes * 4, inplanes, 1, 1) * 0.1
        bn(f"{tp}.downsample.1", planes * 4)
        inplanes = planes * 4

    emb = width * 32
    spacial = 2  # img 64 / 32
    sd["visual.attnpool.positional_embedding"] = g.randn(spacial**2 + 1, emb) * emb**-0.5
    for p in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{p}.weight"] = g.randn(emb, emb) * emb**-0.5
        sd[f"visual.attnpool.{p}.bias"] = g.randn(emb) * 0.02
    sd["visual.attnpool.c_proj.weight"] = g.randn(embed, emb) * emb**-0.5
    sd["visual.attnpool.c_proj.bias"] = g.randn(embed) * 0.02
    _text_sd(sd, g, embed=embed)
    return sd


# ---------------------------------------------------------------- tests --


def _text_parity(sd, model, variables):
    tokens = torch.tensor(
        [[1, 5, 9, 63, 0, 0, 0, 0, 0, 0, 0, 0],
         [2, 8, 3, 4, 7, 63, 0, 0, 0, 0, 0, 0]], dtype=torch.long,
    )
    want = _oracle_text(sd, tokens, 2, 2).numpy()
    got = np.asarray(
        model.apply(variables, jnp.asarray(tokens.numpy()),
                    method="text_features")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vit_tower_parity():
    sd = _make_vit_sd()
    model, variables = build_clip_from_torch(sd)
    img = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(5))
    want = _oracle_vit(sd, img, 2, 2).numpy()
    got = np.asarray(
        model.apply(variables, jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
                    method="image_features")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    _text_parity(sd, model, variables)


def test_resnet_tower_parity():
    sd = _make_rn_sd()
    model, variables = build_clip_from_torch(sd)
    assert model.visual_variant == "rtest"
    img = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(6))
    want = _oracle_rn(sd, img, (1, 1, 1, 1)).numpy()
    got = np.asarray(
        model.apply(variables, jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
                    method="image_features")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    _text_parity(sd, model, variables)


def test_registry_models_load_clip_checkpoint():
    """clip_r50 / clip_vit_b32 registry models ingest OpenAI-layout visual
    towers; extract == l2-normalized oracle image features."""
    from research_image_retrieval_tpu.models import get_model
    from research_image_retrieval_tpu.models.clip_convert import (
        load_clip_visual_into,
    )

    for make_sd, variant, res, oracle in (
        (_make_rn_sd, "rtest", 64, lambda sd, im: _oracle_rn(sd, im, (1, 1, 1, 1))),
        (_make_vit_sd, "test", 32, lambda sd, im: _oracle_vit(sd, im, 2, 2)),
    ):
        sd = make_sd()
        name = "clip_r50" if variant == "rtest" else "clip_vit_b32"
        model = get_model(
            name, variant=variant, outputdim=24, img_size=res, num_classes=8
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
            labels=jnp.zeros((1,), jnp.int32), train=False,
        )
        variables = load_clip_visual_into(variables, sd)
        img = torch.randn(2, 3, res, res,
                          generator=torch.Generator().manual_seed(9))
        want = oracle(sd, img)
        want = (want / want.norm(dim=1, keepdim=True)).numpy()
        got = np.asarray(model.apply(
            variables, jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
            method="extract",
        ))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_extract_is_normalized():
    model, variables = build_clip_from_torch(_make_rn_sd())
    img = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
                      jnp.float32)
    d = model.apply(variables, img, method="extract")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0,
                               rtol=1e-5)
