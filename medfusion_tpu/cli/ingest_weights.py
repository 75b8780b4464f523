"""Ingest pretrained torch weights for quality-parity metrics (round-3
verdict ask #6: make absolute FID/LPIPS parity one file-copy away).

Given the stock checkpoint files the reference stack downloads at runtime —
torch-fidelity / pytorch-fid InceptionV3 (``pt_inception-2015-12-05-*.pth``,
``/root/reference/medical_diffusion/metrics/torchmetrics_pr_recall.py:20-37``)
and torchvision VGG16 for lpips (``vgg16-397923af.pth``,
``loss/perceivers.py:6-26``) — convert them with the existing converters
(:func:`medfusion_tpu.metrics.inception.convert_torch_inception`,
:func:`medfusion_tpu.losses.lpips.convert_torch_vgg16`), validate the result
leaf-by-leaf against a freshly initialized flax template (loud failure on any
missing/extra/mis-shaped leaf), save an orbax artifact in the well-known
store (:mod:`medfusion_tpu.utils.pretrained`), and print the SHA256s.

``cli/evaluate_images`` (FID/IPR featurizer), ``cli/evaluate_latent_embedder``
and ``cli/train_autoencoder --lpips`` pick the artifacts up automatically.

Usage:
  python -m medfusion_tpu.cli.ingest_weights inception --src pt_inception-2015-12-05-6726825d.pth
  python -m medfusion_tpu.cli.ingest_weights vgg16 --src vgg16-397923af.pth
Accepts ``.pth``/``.pt`` (torch.load, cpu) and ``.npz`` (numpy-exported
state_dict) sources.
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from medfusion_tpu.utils import pretrained as P


def load_state_dict(src: str):
    """Load a torch checkpoint or .npz export as {key: np.ndarray}."""
    if str(src).endswith(".npz"):
        raw = np.load(src)
        return {k: raw[k] for k in raw.files}
    import torch

    obj = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


# pytorch-fid's InceptionV3 *wrapper* stores the torchvision modules in
# four positional nn.Sequential blocks; a state_dict saved from that wrapper
# has keys like 'blocks.2.4.branch1x1.conv.weight'. The (block, seq-index) ->
# torchvision-module-name mapping is static (pools carry no params and never
# appear). The distributed pt_inception-2015-12-05 file itself uses bare
# module names, as does torch-fidelity's FeatureExtractorInceptionV3.
_PYTORCH_FID_BLOCKS = {
    (0, 0): "Conv2d_1a_3x3", (0, 1): "Conv2d_2a_3x3", (0, 2): "Conv2d_2b_3x3",
    (1, 0): "Conv2d_3b_1x1", (1, 1): "Conv2d_4a_3x3",
    (2, 0): "Mixed_5b", (2, 1): "Mixed_5c", (2, 2): "Mixed_5d",
    (2, 3): "Mixed_6a", (2, 4): "Mixed_6b", (2, 5): "Mixed_6c",
    (2, 6): "Mixed_6d", (2, 7): "Mixed_6e",
    (3, 0): "Mixed_7a", (3, 1): "Mixed_7b", (3, 2): "Mixed_7c",
}


def strip_fid_blocks(sd):
    """Remap pytorch-fid-wrapper 'blocks.N.M.<module path>' keys to bare
    torchvision module names; bare-name state dicts pass through unchanged."""
    if not any(k.startswith("blocks.") for k in sd):
        return sd
    out = {}
    for k, v in sd.items():
        if not k.startswith("blocks."):
            out[k] = v
            continue
        parts = k.split(".", 3)
        if len(parts) != 4 or not (parts[1].isdigit() and parts[2].isdigit()):
            raise ValueError(f"unrecognized pytorch-fid wrapper key: {k!r}")
        _, b, m, rest = parts
        name = _PYTORCH_FID_BLOCKS.get((int(b), int(m)))
        if name is None:
            raise ValueError(f"unrecognized pytorch-fid wrapper key: {k!r}")
        out[f"{name}.{rest}"] = v
    return out


def ingest_inception(src: str):
    from medfusion_tpu.metrics import InceptionV3
    from medfusion_tpu.metrics.inception import convert_torch_inception

    sd = strip_fid_blocks(load_state_dict(src))
    converted = convert_torch_inception(sd)
    net = InceptionV3()
    template = net.init(jax.random.PRNGKey(0),
                        np.zeros((1, 64, 64, 3), np.uint8))["params"]
    # the torch file carries the unused aux/fc heads; the converter already
    # drops non-conv/bn leaves — drop whole converted modules the flax
    # featurizer doesn't have (AuxLogits, fc) rather than failing on them
    converted = {k: v for k, v in converted.items() if k in template}
    P.validate_against_template(converted, template, "inception")
    return converted, P.INCEPTION


def ingest_vgg16(src: str):
    from medfusion_tpu.losses.lpips import VGG16Features, convert_torch_vgg16

    sd = load_state_dict(src)
    converted = convert_torch_vgg16(sd)
    template = VGG16Features().init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))["params"]
    P.validate_against_template(converted, template, "vgg16")
    return converted, P.VGG16


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["inception", "vgg16"])
    ap.add_argument("--src", required=True,
                    help=".pth/.pt torch checkpoint or .npz export")
    args = ap.parse_args(argv)

    converted, name = (ingest_inception if args.kind == "inception"
                       else ingest_vgg16)(args.src)
    path = P.save_pretrained(name, converted)
    n_leaves = len(jax.tree_util.tree_leaves(converted))
    print(json.dumps({
        "artifact": str(path),
        "name": name,
        "src_sha256": P.file_sha256(args.src),
        "params_sha256": P.params_sha256(converted),
        "n_leaves": n_leaves,
    }))


if __name__ == "__main__":
    main()
