"""Numerical parity of Attention/Encoder/Decoder blocks vs torch oracles.

The oracles implement the reference block math (separate q/k/v projections,
token BatchNorm + single-Linear MLP encoder, LN cross/self decoder)
independently in torch; weights are copied into the flax modules so the
comparison pins projection order, scaling, softmax axis, and norm placement.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.layers import Attention, Decoder, Encoder

DIM, HEADS, B, N = 32, 4, 2, 6


class TorchAttention(tnn.Module):
    def __init__(self, dim, heads, qkv_bias=True):
        super().__init__()
        self.h = heads
        self.scale = (dim // heads) ** -0.5
        self.q = tnn.Linear(dim, dim, bias=qkv_bias)
        self.k = tnn.Linear(dim, dim, bias=qkv_bias)
        self.v = tnn.Linear(dim, dim, bias=qkv_bias)
        self.proj = tnn.Linear(dim, dim, bias=qkv_bias)

    def forward(self, q, k, v):
        Bq, Nq, D = q.shape
        Nk = k.shape[1]
        qh = self.q(q).reshape(Bq, Nq, self.h, -1).permute(0, 2, 1, 3)
        kh = self.k(k).reshape(Bq, Nk, self.h, -1).permute(0, 2, 1, 3)
        vh = self.v(v).reshape(Bq, Nk, self.h, -1).permute(0, 2, 1, 3)
        attn = tF.softmax((qh @ kh.transpose(-2, -1)) * self.scale, dim=-1)
        out = (attn @ vh).transpose(1, 2).reshape(Bq, Nq, D)
        return self.proj(out)


def lin_params(lin: tnn.Linear):
    return {
        "kernel": lin.weight.detach().numpy().T,
        "bias": lin.bias.detach().numpy(),
    }


def attn_params(t: TorchAttention):
    return {
        "q": lin_params(t.q),
        "k": lin_params(t.k),
        "v": lin_params(t.v),
        "proj": lin_params(t.proj),
    }


def test_attention_parity(rng):
    torch.manual_seed(0)
    oracle = TorchAttention(DIM, HEADS).eval()
    q = rng.standard_normal((B, 3, DIM)).astype(np.float32)
    kv = rng.standard_normal((B, N, DIM)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))
    mod = Attention(DIM, HEADS, qkv_bias=True)
    got = mod.apply(
        {"params": attn_params(oracle)},
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


class TorchEncoder(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.attn = TorchAttention(dim, heads)
        self.bn = tnn.BatchNorm1d(dim)
        self.mlp = tnn.Linear(dim, dim)

    def forward(self, x):
        b, n, d = x.shape
        x = x + self.attn(x, x, x)
        x_bn = self.bn(x.reshape(b * n, d)).reshape(b, n, d)
        return x + self.mlp(x_bn)


def test_encoder_parity(rng):
    torch.manual_seed(1)
    oracle = TorchEncoder(DIM, HEADS).eval()
    with torch.no_grad():
        oracle.bn.running_mean.copy_(torch.randn(DIM) * 0.1)
        oracle.bn.running_var.copy_(torch.rand(DIM) + 0.5)
    x = rng.standard_normal((B, N, DIM)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x))

    params = {
        "attn": attn_params(oracle.attn),
        "bn": {
            "scale": oracle.bn.weight.detach().numpy(),
            "bias": oracle.bn.bias.detach().numpy(),
        },
        "mlp": lin_params(oracle.mlp),
    }
    stats = {
        "bn": {
            "mean": oracle.bn.running_mean.numpy(),
            "var": oracle.bn.running_var.numpy(),
        }
    }
    mod = Encoder(DIM, HEADS, qkv_bias=True)
    got = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        deterministic=True, train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


class TorchDecoder(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.self_attn = TorchAttention(dim, heads)
        self.cross_attn = TorchAttention(dim, heads)
        self.bn1 = tnn.LayerNorm(dim)
        self.bn2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, 2 * dim)
        self.fc2 = tnn.Linear(2 * dim, dim)

    def forward(self, q, x):
        q_bn = self.bn1(q)
        q = q + self.cross_attn(q_bn, x, x)
        q = q + self.fc2(tF.gelu(self.fc1(q)))
        q_bn = self.bn2(q)
        return q + self.self_attn(q_bn, q_bn, q_bn)


def test_decoder_parity(rng):
    torch.manual_seed(2)
    oracle = TorchDecoder(DIM, HEADS).eval()
    q = rng.standard_normal((B, 4, DIM)).astype(np.float32)
    x = rng.standard_normal((B, N, DIM)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(q), torch.from_numpy(x))

    ln = lambda m: {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}
    params = {
        "cross_attn": attn_params(oracle.cross_attn),
        "self_attn": attn_params(oracle.self_attn),
        "bn1": ln(oracle.bn1),
        "bn2": ln(oracle.bn2),
        "mlp": {"fc1": lin_params(oracle.fc1), "fc2": lin_params(oracle.fc2)},
    }
    mod = Decoder(DIM, HEADS, qkv_bias=True)
    got = mod.apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(x), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)
