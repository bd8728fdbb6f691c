"""OpenAI-layout CLIP state-dict -> Flax variables converter.

The TPU-native counterpart of the reference's ``build_model`` +
``convert_weights`` (reference: networks/model.py:381-442): infers the
architecture from the state dict's key layout (ViT tower when
``visual.proj`` exists, ModifiedResNet otherwise), instantiates the Flax
``CLIP`` and returns converted variables.  Conv kernels transpose
OIHW -> HWIO; torch ``nn.Linear`` weights transpose [out, in] -> [in, out];
packed ``in_proj_weight`` QKV attention weights split into flax
MultiHeadDotProductAttention's per-head kernels.  Parity is tested against
a torch oracle in tests/test_clip_convert.py.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "build_clip_from_torch",
    "convert_torch_clip",
    "convert_clip_visual_vit",
    "load_clip_visual_into",
]


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _linear(sd, prefix):
    """torch nn.Linear -> flax Dense params."""
    p = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _bn(sd, prefix):
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _conv(sd, key):
    return {"kernel": np.transpose(_t(sd[key]), (2, 3, 1, 0))}  # OIHW->HWIO


def _mha(sd, prefix, heads):
    """torch nn.MultiheadAttention (packed QKV) -> flax MHA params."""
    w = _t(sd[f"{prefix}.in_proj_weight"])  # [3d, d]
    b = _t(sd[f"{prefix}.in_proj_bias"])  # [3d]
    d = w.shape[1]
    hd = d // heads
    wq, wk, wv = w[:d], w[d : 2 * d], w[2 * d :]
    bq, bk, bv = b[:d], b[d : 2 * d], b[2 * d :]
    mk = lambda wm, bm: {
        "kernel": wm.T.reshape(d, heads, hd),
        "bias": bm.reshape(heads, hd),
    }
    wo = _t(sd[f"{prefix}.out_proj.weight"])  # [d, d]
    bo = _t(sd[f"{prefix}.out_proj.bias"])
    return {
        "query": mk(wq, bq),
        "key": mk(wk, bk),
        "value": mk(wv, bv),
        "out": {"kernel": wo.T.reshape(heads, hd, d), "bias": bo},
    }


def _text_blocks(sd, heads):
    depth = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")})
    out = {}
    for i in range(depth):
        p = f"transformer.resblocks.{i}"
        out[f"block{i}"] = {
            "ln1": _ln(sd, f"{p}.ln_1"),
            "ln2": _ln(sd, f"{p}.ln_2"),
            "attn": _mha(sd, f"{p}.attn", heads),
            "mlp_fc1": _linear(sd, f"{p}.mlp.c_fc"),
            "mlp_fc2": _linear(sd, f"{p}.mlp.c_proj"),
        }
    return out, depth


def _visual_vit(sd):
    """visual.* ViT keys -> flax VisionTransformer params (+ inferred cfg)."""
    width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    npos = sd["visual.positional_embedding"].shape[0]
    grid = round(math.sqrt(npos - 1))
    depth = len(
        {
            k.split(".")[3]
            for k in sd
            if k.startswith("visual.transformer.resblocks")
        }
    )
    # OpenAI convention is heads = width // 64; take the head count from
    # the matched preset so tiny test configs work too
    cfg = dict(dim=int(width), depth=int(depth), patch=int(patch))
    from research_image_retrieval_tpu.models.vit import VIT_CONFIGS

    variant = _match_vit_variant(cfg)
    heads = VIT_CONFIGS[variant]["heads"]
    cfg.update(heads=int(heads), img_size=int(patch * grid), variant=variant)
    params = {
        "patch_embed": _conv(sd, "visual.conv1.weight"),
        "cls_token": _t(sd["visual.class_embedding"]).reshape(1, 1, width),
        "pos_embed": _t(sd["visual.positional_embedding"])[None],
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
    }
    for i in range(depth):
        p = f"visual.transformer.resblocks.{i}"
        params[f"block{i}"] = {
            "ln1": _ln(sd, f"{p}.ln_1"),
            "ln2": _ln(sd, f"{p}.ln_2"),
            "attn": _mha(sd, f"{p}.attn", heads),
            "mlp_fc1": _linear(sd, f"{p}.mlp.c_fc"),
            "mlp_fc2": _linear(sd, f"{p}.mlp.c_proj"),
        }
    return params, cfg


def convert_clip_visual_vit(sd):
    """Visual-ViT tower only: (backbone params, proj kernel, cfg).

    For plugging a CLIP visual tower into ``ViTGlobalModel``-style
    retrieval models (the counterpart of ``convert_torch_resnet`` for the
    v1/v2 pretrained modes).
    """
    params, cfg = _visual_vit(sd)
    proj = _t(sd["visual.proj"])  # [width, embed] used as x @ proj
    return params, proj, cfg


def _visual_resnet(sd):
    """visual.* ModifiedResNet keys -> flax params/stats (+ inferred cfg)."""
    params: dict = {}
    stats: dict = {}
    for k in (1, 2, 3):
        params[f"conv{k}"] = _conv(sd, f"visual.conv{k}.weight")
        p, s = _bn(sd, f"visual.bn{k}")
        params[f"bn{k}"], stats[f"bn{k}"] = p, s

    layers = []
    for li in range(1, 5):
        depth = len(
            {k.split(".")[2] for k in sd if k.startswith(f"visual.layer{li}.")}
        )
        layers.append(depth)
        for j in range(depth):
            tp = f"visual.layer{li}.{j}"
            bp: dict = {}
            bs: dict = {}
            for k in (1, 2, 3):
                bp[f"conv{k}"] = _conv(sd, f"{tp}.conv{k}.weight")
                p, s = _bn(sd, f"{tp}.bn{k}")
                bp[f"bn{k}"], bs[f"bn{k}"] = p, s
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{tp}.downsample.0.weight")
                p, s = _bn(sd, f"{tp}.downsample.1")
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            params[f"layer{li}_{j}"] = bp
            stats[f"layer{li}_{j}"] = bs

    width = sd["visual.layer1.0.conv1.weight"].shape[0]
    embed_dim = width * 32
    heads = embed_dim // 64
    npos = sd["visual.attnpool.positional_embedding"].shape[0]
    spacial = round(math.sqrt(npos - 1))
    params["attnpool"] = {
        "positional_embedding": _t(sd["visual.attnpool.positional_embedding"]),
        "q_proj": _linear(sd, "visual.attnpool.q_proj"),
        "k_proj": _linear(sd, "visual.attnpool.k_proj"),
        "v_proj": _linear(sd, "visual.attnpool.v_proj"),
        "c_proj": _linear(sd, "visual.attnpool.c_proj"),
    }
    cfg = dict(
        layers=tuple(layers), width=int(width), heads=int(heads),
        img_size=int(spacial * 32),
    )
    return params, stats, cfg


def convert_torch_clip(state_dict: dict):
    """Full dual-tower conversion.

    Returns:
      (variables, config) where ``variables`` matches the Flax ``CLIP``
      module built from ``config`` (kwargs for ``CLIP(...)``), mirroring
      the reference's shape-sniffing ``build_model``
      (networks/model.py:405-442).
    """
    sd = dict(state_dict)
    for key in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(key, None)

    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    text_width = sd["ln_final.weight"].shape[0]
    text_heads = max(1, text_width // 64)  # OpenAI convention

    text_params, text_depth = _text_blocks(sd, text_heads)
    text_params.update(
        {
            "token_embedding": {"embedding": _t(sd["token_embedding.weight"])},
            "positional_embedding": _t(sd["positional_embedding"]),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": {"kernel": _t(sd["text_projection"])},
        }
    )

    vit = "visual.proj" in sd
    batch_stats: dict = {}
    if vit:
        vparams, vcfg = _visual_vit(sd)
        variant = vcfg["variant"]
        params = {
            "visual": vparams,
            "visual_projection": {"kernel": _t(sd["visual.proj"])},
        }
        img_size = vcfg["img_size"]
    else:
        vparams, vstats, vcfg = _visual_resnet(sd)
        variant = _match_resnet_variant(vcfg)
        params = {"visual": vparams}
        batch_stats = {"visual": vstats}
        img_size = vcfg["img_size"]

    params.update(
        {
            "text": text_params,
            "logit_scale": _t(sd["logit_scale"]).reshape(()),
        }
    )

    config = dict(
        visual_variant=variant,
        embed_dim=int(embed_dim),
        vocab_size=int(vocab_size),
        context_length=int(context_length),
        text_dim=int(text_width),
        text_depth=int(text_depth),
        text_heads=int(text_heads),
        img_size=int(img_size),
    )
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables, config


def _match_vit_variant(cfg) -> str:
    from research_image_retrieval_tpu.models.vit import VIT_CONFIGS

    for name, c in VIT_CONFIGS.items():
        if all(cfg[k] == c[k] for k in ("dim", "depth", "patch")):
            return name
    raise ValueError(f"no VIT_CONFIGS entry matches checkpoint config {cfg}")


def _match_resnet_variant(cfg) -> str:
    from research_image_retrieval_tpu.models.clip_resnet import (
        CLIP_RESNET_CONFIGS,
    )

    for name, c in CLIP_RESNET_CONFIGS.items():
        if tuple(cfg["layers"]) == tuple(c["layers"]) and cfg["width"] == c["width"]:
            return name
    raise ValueError(
        f"no CLIP_RESNET_CONFIGS entry matches checkpoint config {cfg}"
    )


def load_clip_visual_into(variables: dict, state_dict: dict) -> dict:
    """Merge an OpenAI-layout checkpoint's VISUAL tower into existing
    variables of a ``CLIPGlobalModel`` / ``CLIP`` (classifier and text
    tower keep their current values) — the CLIP pretrained-source flow
    (reference: networks/model.py:292-345)."""
    sd = dict(state_dict)
    params = dict(variables["params"])
    if "visual.proj" in sd:
        vparams, _ = _visual_vit(sd)
        params["visual"] = vparams
        if "visual_projection" in params:
            params["visual_projection"] = {"kernel": _t(sd["visual.proj"])}
        return {**variables, "params": params}
    vparams, vstats, _ = _visual_resnet(sd)
    params["visual"] = vparams
    stats = dict(variables.get("batch_stats", {}))
    stats["visual"] = vstats
    return {**variables, "params": params, "batch_stats": stats}


def build_clip_from_torch(state_dict: dict):
    """State dict -> (CLIP module, variables) — ``build_model`` equivalent."""
    from research_image_retrieval_tpu.models.clip import CLIP

    variables, config = convert_torch_clip(state_dict)
    return CLIP(**config), variables
