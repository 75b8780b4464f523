"""Torch-side oracles re-expressing reference block semantics with plain
torch.nn (the reference builds these via MONAI factories, which are not
installed). Weight values are copied FROM the flax params so both sides compute
on identical weights; layout conversion lives here too.
"""

import numpy as np
import torch
import torch.nn as nn


def to_torch_conv(conv: nn.Conv2d | nn.Conv3d | nn.Conv1d, params):
    """params: {'conv': {'kernel': [*k, I, O], 'bias': [O]}} (or flat)."""
    p = params["conv"] if "conv" in params else params
    k = np.asarray(p["kernel"])
    n = k.ndim - 2
    w = np.transpose(k, (n + 1, n, *range(n))).copy()  # [*k,I,O] -> [O,I,*k]
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        if "bias" in p and conv.bias is not None:
            conv.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    return conv


def to_torch_linear(lin: nn.Linear, params):
    p = params["linear"] if "linear" in params else params
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        if "bias" in p and lin.bias is not None:
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    return lin


def to_torch_norm(norm, params):
    p = params["norm"] if "norm" in params else params
    with torch.no_grad():
        if "scale" in p:
            norm.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        if "bias" in p:
            norm.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    return norm


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    n = x_nhwc.ndim - 2
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, n + 1, *range(1, n + 1)))))


def nhwc(x_t: torch.Tensor) -> np.ndarray:
    x = x_t.detach().numpy()
    n = x.ndim - 2
    return np.ascontiguousarray(np.transpose(x, (0, *range(2, n + 2), 1)))


def ref_compute_attention(q, k, v, num_heads, scale):
    """Reference compute_attention semantics (attention_blocks.py:35-43),
    channels-first tokens [B, C, N]."""
    b, c, n = q.shape
    d = c // num_heads
    qh = q.reshape(b, num_heads, d, -1).reshape(b * num_heads, d, -1)
    kh = k.reshape(b, num_heads, d, -1).reshape(b * num_heads, d, -1)
    vh = v.reshape(b, num_heads, d, -1).reshape(b * num_heads, d, -1)
    attn = torch.einsum("bdi,bdj->bij", qh * scale, kh * scale).softmax(dim=-1)
    out = torch.einsum("bij,bdj->bdi", attn, vh)
    return out.reshape(b, num_heads, d, -1).reshape(b, c, -1)
