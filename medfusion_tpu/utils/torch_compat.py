"""Reference (PyTorch/Lightning) checkpoint <-> flax params conversion.

This is the parity linchpin (SURVEY.md §7 item 4): it maps the reference's
``state_dict`` key space onto this framework's param pytrees, transposing
kernels between NCHW ([O, I, *k]) and channels-last flax ([*k, I, O]) layouts.

Reference key structure (verified against the module definitions):
* ``BasicBlock``          — ``conv.{weight,bias}``, ``norm.{weight,bias}``
  (conv_blocks.py:134-192; ``self.conv`` is a raw nn.ConvNd, :165-174).
* ``BasicResBlock``       — ``basic_block.*`` + ``conv_res.*`` (:224-236).
* ``Unet{Basic,Res}Block``— ``block_seq.{i}.*`` + ``local_embedder.1.*``
  (:274-283; local_embedder = Sequential(act, Linear), index 1 is the Linear).
* ``BasicDown``/``BasicUp``— ``down_op.*`` / ``up_op.*`` raw convs (:43-56, :104-113).
* ``DownBlock``/``UpBlock``— ``down_op.*``/``up_op.*`` (nested BasicDown/Up),
  ``attention.*``, ``conv_block.*`` (:390-417, :469-496).
* ``Attention`` wrapper   — ``attention.*`` (attention_blocks.py:307-319).
* ``LinearTransformer(Nd)``— ``norm_x.*``, ``to_{q,k,v}.*`` (1x1 convs),
  ``to_out.0.*`` (zero conv) (attention_blocks.py:146-160, 77-90).
* ``SpatialTransformer``  — ``norm.*``, ``proj_in.*``, ``transformer_blocks.{i}.*``,
  ``proj_out.*`` (:251-268); ``BasicTransformerBlock`` — ``self_atn.*``,
  ``cros_atn.*``, ``proj_out.{0.norm,0.proj,2}.*`` (GEGLU + Linear, :213-219).
* ``TimeEmbbeding``       — ``time_emb.{1,3}.*`` Linears, ``time_emb.0.weights``
  for the learned pos-emb (time_embedder.py:66-71, :39).
* ``LabelEmbedder``       — ``embedding.weight`` (cond_embedders.py:10).
* UNet (unet2.py)         — ``in_conv.*``, ``in_blocks.{i}.{0,1}.*`` (SequentialEmb)
  or ``in_blocks.{i}.down_op.*`` (BasicDown rows), ``middle_block.{0,1,2}.*``,
  ``out_blocks.{i}.{0,1,2}.*``, ``outc.conv.conv.*`` (MONAI UnetOutBlock wraps a
  Convolution-Sequential), ``outc_ver.{i}.conv.conv.*`` (unet2.py:67-219).
* VAE/VQVAE (latent_embedders.py) — ``inc.*``, ``encoders.{i}.*``, ``out_enc.{0,1}.*``
  (VAE :708-711) / ``out_enc.*`` (VQVAE :265), ``quantizer.embedder.weight``
  (:46), ``inc_dec.*``, ``decoders.{i}.*``, ``outc.*``, ``outc_ver.{i}.*``.
* Discriminator           — ``inc.*``, ``encoder.{i}.*``, ``outc.*`` (:89-130).
* VAEGAN/VQGAN            — ``vqvae.*`` + ``discriminator.{i}.*`` (:921-925).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# Ordered (pattern, replacement) rewrites from torch key -> flax 'a/b/c' path.
# Container rules first, then block-level, then leaf rules.
_RULES: Tuple[Tuple[str, str], ...] = (
    # ---- UNet containers (unet2.py) ----
    (r"^time_embedder\.time_emb\.0\.weights$", "time_embedder/pos_embedder/weights"),
    (r"^time_embedder\.time_emb\.1\.", "time_embedder/linear_0/linear/"),
    (r"^time_embedder\.time_emb\.3\.", "time_embedder/linear_1/linear/"),
    (r"^cond_embedder\.embedding\.weight$", "cond_embedder/embedding/embedding"),
    (r"^in_blocks\.(\d+)\.down_op\.", r"in_blocks_\1_1/down_conv/conv/"),
    (r"^in_blocks\.(\d+)\.0\.", r"in_blocks_\1_1/"),
    (r"^in_blocks\.(\d+)\.1\.", r"in_blocks_\1_2/"),
    (r"^middle_block\.0\.", "middle_conv_1/"),
    (r"^middle_block\.1\.", "middle_attn/"),
    (r"^middle_block\.2\.", "middle_conv_2/"),
    (r"^out_blocks\.(\d+)\.2\.up_op\.", r"out_blocks_\1_2/up_conv/conv/"),
    (r"^out_blocks\.(\d+)\.0\.", r"out_blocks_\1_0/"),
    (r"^out_blocks\.(\d+)\.1\.", r"out_blocks_\1_1/"),
    # UNet outc is a MONAI UnetOutBlock: outc.conv.conv.* ; VAE outc is a
    # BasicBlock: outc.conv.* — both normalize to flax outc/conv/conv/.
    (r"^outc\.conv\.conv\.", "outc/conv/conv/"),
    (r"^outc_ver\.(\d+)\.conv\.conv\.", r"outc_ver_\1/conv/conv/"),
    (r"^outc_ver\.(\d+)\.", r"outc_ver_\1/"),
    # ---- VAE/VQVAE containers (latent_embedders.py) ----
    (r"^encoders\.(\d+)\.", r"encoders_\1/"),
    (r"^decoders\.(\d+)\.", r"decoders_\1/"),
    (r"^out_enc\.0\.", "out_enc_0/"),
    (r"^out_enc\.1\.", "out_enc_1/"),
    (r"^quantizer\.embedder\.weight$", "quantizer/codebook"),
    # Discriminator container (Sequential index i -> encoder_{i})
    (r"^encoder\.(\d+)\.", r"encoder_\1/"),
    # ---- block internals (separators still '.' at this point) ----
    (r"block_seq\.(\d+)\.", r"block_\1/"),
    (r"local_embedder\.1\.", "local_embedder/linear/"),
    (r"transformer_blocks\.(\d+)\.", r"block_\1/"),
    # DownBlock/UpBlock nested down/up ops (raw convs inside Basic{Down,Up})
    (r"down_op\.down_op\.", "down_op/down_conv/conv/"),
    (r"up_op\.up_op\.", "up_op/up_conv/conv/"),
    # standalone BasicDown/BasicUp raw convs (only remaining bare forms)
    (r"(^|[./])down_op\.", r"\1down_conv/conv/"),
    (r"(^|[./])up_op\.", r"\1up_conv/conv/"),
    # attention internals
    (r"norm_x\.", "norm_x/norm/"),
    (r"to_q\.", "to_q/linear/"),
    (r"to_k\.", "to_k/linear/"),
    (r"to_v\.", "to_v/linear/"),
    (r"to_out\.0\.", "to_out/linear/"),
    (r"proj_out\.0\.norm\.", "geglu/norm/"),
    (r"proj_out\.0\.proj\.", "geglu/proj/linear/"),
    (r"proj_out\.2\.", "proj_out/linear/"),
    (r"proj_in\.", "proj_in/linear/"),
    (r"(^|[./])proj_out\.", r"\1proj_out/linear/"),
    (r"self_atn\.", "self_atn/"),
    (r"cros_atn\.", "cros_atn/"),
    # note: GEGLU's LayerNorm was already rewritten to 'geglu/norm/' above and
    # no longer contains a '.norm.' segment, so it keeps its flat layout.
    (r"(^|[./])norm\.", r"\1norm/norm/"),
    # conv leaves: BasicBlock self.conv, BasicResBlock conv_res (raw nn.ConvNd)
    (r"conv_res\.", "conv_res/conv/"),
    (r"(^|[./])conv\.weight$", r"\1conv/conv/kernel"),
    (r"(^|[./])conv\.bias$", r"\1conv/conv/bias"),
    # remaining module separators
    (r"\.", "/"),
    # leaf renames
    (r"/weight$", "/kernel"),
)

# flax leaf names whose torch 'weight' is a norm scale, not a kernel.
_NORM_PARENT = re.compile(r"norm/kernel$")


def torch_key_to_flax_path(key: str) -> str:
    for pat, repl in _RULES:
        key = re.sub(pat, repl, key)
    if _NORM_PARENT.search(key):
        key = key[: -len("kernel")] + "scale"
    return key


def _to_flax_leaf(path: str, arr: np.ndarray) -> np.ndarray:
    """Layout transform torch -> flax decided by destination leaf."""
    if path.endswith("linear/kernel"):
        a = arr
        while a.ndim > 2:  # 1x1(x1) conv used as a linear projection
            assert a.shape[-1] == 1, f"{path}: non-pointwise conv {arr.shape}"
            a = a[..., 0]
        return np.ascontiguousarray(a.T)  # [O, I] -> [I, O]
    if path.endswith("conv/kernel"):
        n = arr.ndim - 2
        return np.ascontiguousarray(np.transpose(arr, (*range(2, n + 2), 1, 0)))
    return np.asarray(arr)


def _to_torch_leaf(path: str, arr: np.ndarray, torch_key: str,
                   spatial_dims: int = 2) -> np.ndarray:
    """Inverse transform flax -> torch. 1x1-conv projections regain trailing
    unit dims per the destination module: Conv1d ([O,I,1]) for
    LinearTransformer q/k/v/out (attention_blocks.py:150-156), ConvNd
    ([O,I,1,..]) for SpatialTransformer proj_in/proj_out and the transformer
    MLP's out conv (attention_blocks.py:219, 255-275)."""
    if path.endswith("linear/kernel"):
        n_unit = _conv_trailing_dims(torch_key, spatial_dims)
        out = np.ascontiguousarray(arr.T)
        return out.reshape(out.shape + (1,) * n_unit) if n_unit else out
    if path.endswith("conv/kernel"):
        n = arr.ndim - 2
        return np.ascontiguousarray(np.transpose(arr, (n + 1, n, *range(n))))
    return np.asarray(arr)


def _conv_trailing_dims(torch_key: str, spatial_dims: int) -> int:
    """0 = true nn.Linear; else the number of unit kernel dims to append."""
    if any(s in torch_key for s in ("time_emb.", "local_embedder.",
                                    "proj_out.0.proj", "embedding.")):
        return 0
    if re.search(r"proj_out\.2\.(weight|bias)$", torch_key):
        return spatial_dims  # BasicTransformerBlock MLP out: ConvNd 1x1
    if re.search(r"attention\.proj_(in|out)\.(weight|bias)$", torch_key):
        return spatial_dims  # SpatialTransformer projections: ConvNd 1x1
    return 1  # LinearTransformer to_q/to_k/to_v/to_out.0: Conv1d


def set_in_tree(tree: Dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def get_in_tree(tree: Dict, path: str):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def convert_state_dict(state_dict: Dict[str, np.ndarray], strip_prefix: str = "") -> Dict:
    """Torch state_dict (numpy-valued) -> flax params pytree.

    ``strip_prefix`` peels a container prefix first, e.g. ``'noise_estimator.'``
    for a DiffusionPipeline checkpoint or ``'vqvae.'`` for VAEGAN."""
    params: Dict = {}
    for key, val in state_dict.items():
        if strip_prefix:
            if not key.startswith(strip_prefix):
                continue
            key = key[len(strip_prefix):]
        if key.endswith("num_batches_tracked") or key.startswith("timesteps"):
            continue
        path = torch_key_to_flax_path(key)
        set_in_tree(params, path, _to_flax_leaf(path, np.asarray(val)))
    return params


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a (Lightning) checkpoint on CPU -> flat numpy state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def flax_path_to_torch_key(path: str, kind: str = "unet") -> str:
    """Inverse of :func:`torch_key_to_flax_path` for the supported model trees
    (export direction, used for roundtrip testing and for handing weights back
    to reference tooling)."""
    k = path
    k = re.sub(r"^time_embedder/pos_embedder/weights$", "time_embedder.time_emb.0.weights", k)
    k = re.sub(r"^time_embedder/linear_0/linear/", "time_embedder.time_emb.1.", k)
    k = re.sub(r"^time_embedder/linear_1/linear/", "time_embedder.time_emb.3.", k)
    k = re.sub(r"^cond_embedder/embedding/embedding$", "cond_embedder.embedding.weight", k)
    k = re.sub(r"^in_blocks_(\d+)_1/down_conv/conv/", r"in_blocks.\1.down_op.", k)
    k = re.sub(r"^in_blocks_(\d+)_1/", r"in_blocks.\1.0.", k)
    k = re.sub(r"^in_blocks_(\d+)_2/", r"in_blocks.\1.1.", k)
    k = re.sub(r"^middle_conv_1/", "middle_block.0.", k)
    k = re.sub(r"^middle_attn/", "middle_block.1.", k)
    k = re.sub(r"^middle_conv_2/", "middle_block.2.", k)
    k = re.sub(r"^out_blocks_(\d+)_0/", r"out_blocks.\1.0.", k)
    k = re.sub(r"^out_blocks_(\d+)_1/", r"out_blocks.\1.1.", k)
    k = re.sub(r"^out_blocks_(\d+)_2/up_conv/conv/", r"out_blocks.\1.2.up_op.", k)
    if kind == "unet":
        k = re.sub(r"^outc/conv/conv/", "outc.conv.conv.", k)
        k = re.sub(r"^outc_ver_(\d+)/conv/conv/", r"outc_ver.\1.conv.conv.", k)
    else:  # VAE/VQVAE: outc is a BasicBlock
        k = re.sub(r"^outc/conv/conv/", "outc.conv.", k)
        k = re.sub(r"^outc_ver_(\d+)/conv/conv/", r"outc_ver.\1.conv.", k)
    k = re.sub(r"^encoders_(\d+)/", r"encoders.\1.", k)
    k = re.sub(r"^decoders_(\d+)/", r"decoders.\1.", k)
    k = re.sub(r"^out_enc_0/", "out_enc.0.", k)
    k = re.sub(r"^out_enc_1/", "out_enc.1.", k)
    k = re.sub(r"^quantizer/codebook$", "quantizer.embedder.weight", k)
    k = re.sub(r"^encoder_(\d+)/", r"encoder.\1.", k)
    # attention-scoped rewrites BEFORE the generic block_i rule: block_i inside
    # a SpatialTransformer ('attention/block_i/') is a transformer block, while
    # block_i inside Unet blocks is block_seq.
    k = re.sub(r"attention/block_(\d+)/geglu/norm/", r"attention.transformer_blocks.\1.proj_out.0.norm.", k)
    k = re.sub(r"attention/block_(\d+)/geglu/proj/linear/", r"attention.transformer_blocks.\1.proj_out.0.proj.", k)
    k = re.sub(r"attention/block_(\d+)/proj_out/linear/", r"attention.transformer_blocks.\1.proj_out.2.", k)
    k = re.sub(r"attention/block_(\d+)/", r"attention.transformer_blocks.\1.", k)
    k = re.sub(r"attention/proj_in/linear/", "attention.proj_in.", k)
    k = re.sub(r"attention/proj_out/linear/", "attention.proj_out.", k)
    # block internals
    k = re.sub(r"block_(\d+)/", r"block_seq.\1.", k)
    k = re.sub(r"local_embedder/linear/", "local_embedder.1.", k)
    k = re.sub(r"down_op/down_conv/conv/", "down_op.down_op.", k)
    k = re.sub(r"up_op/up_conv/conv/", "up_op.up_op.", k)
    k = re.sub(r"(^|/)down_conv/conv/", r"\1down_op.", k)
    k = re.sub(r"(^|/)up_conv/conv/", r"\1up_op.", k)
    k = re.sub(r"norm_x/norm/", "norm_x.", k)
    k = re.sub(r"to_(q|k|v)/linear/", r"to_\1.", k)
    k = re.sub(r"to_out/linear/", "to_out.0.", k)
    k = re.sub(r"self_atn/", "self_atn.", k)
    k = re.sub(r"cros_atn/", "cros_atn.", k)
    k = re.sub(r"conv_res/conv/", "conv_res.", k)
    k = re.sub(r"norm/norm/", "norm.", k)
    k = re.sub(r"conv/conv/", "conv.", k)
    k = k.replace("/", ".")
    k = re.sub(r"\.kernel$", ".weight", k)
    k = re.sub(r"\.scale$", ".weight", k)
    return k


def to_torch_state_dict(params: Dict, kind: str = "unet", prefix: str = "",
                        spatial_dims: int = 2) -> Dict[str, np.ndarray]:
    """flax params -> reference-named torch state_dict (numpy-valued).
    ``spatial_dims`` sets the trailing unit dims of exported 1x1-conv
    projections (SpatialTransformer proj_in/out, transformer MLP out conv),
    so 3D (`spatial_dims=3`) models round-trip too."""
    import jax.tree_util as jtu

    flat = jtu.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, val in flat:
        path = "/".join(p.key for p in keypath)
        tkey = flax_path_to_torch_key(path, kind=kind)
        out[prefix + tkey] = _to_torch_leaf(path, np.asarray(val), tkey,
                                            spatial_dims=spatial_dims)
    return out
