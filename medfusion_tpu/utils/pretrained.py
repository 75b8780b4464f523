"""Pretrained-weight artifact store — makes absolute quality parity one
file-copy away (round-3 verdict ask #6).

The reference's FID/IPR featurizer and perceptual loss need pretrained torch
weights (torch-fidelity InceptionV3,
``/root/reference/medical_diffusion/metrics/torchmetrics_pr_recall.py:20-37``;
lpips VGG16, ``loss/perceivers.py:6-26``) that cannot be downloaded in this
zero-egress image. This module defines the ONE well-known location where
converted weights live once a user supplies the files:

    python -m medfusion_tpu.cli.ingest_weights inception --src pt_inception.pth
    python -m medfusion_tpu.cli.ingest_weights vgg16 --src vgg16.pth

``cli/evaluate_images``, ``cli/evaluate_latent_embedder`` and
``cli/train_autoencoder --lpips`` then pick the artifacts up automatically.
Location override: ``MEDFUSION_WEIGHTS_DIR`` (default
``~/.cache/medfusion_tpu/weights``).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

# canonical artifact names (subdirectories of weights_dir())
INCEPTION = "inception_v3_fid"
VGG16 = "vgg16_lpips"


def weights_dir() -> Path:
    env = os.environ.get("MEDFUSION_WEIGHTS_DIR")
    return Path(env) if env else Path.home() / ".cache" / "medfusion_tpu" / "weights"


def _flat_items(params: Dict):
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    items = [(jax.tree_util.keystr(path), np.asarray(leaf))
             for path, leaf in flat]
    return sorted(items, key=lambda kv: kv[0])


def params_sha256(params: Dict) -> str:
    """Canonical content hash: sorted flattened key strings + shape/dtype +
    raw little-endian bytes. Stable across save/restore round-trips."""
    h = hashlib.sha256()
    for key, arr in _flat_items(params):
        arr = np.ascontiguousarray(arr)
        h.update(key.encode())
        h.update(str(arr.shape).encode())
        h.update(np.dtype(arr.dtype).str.encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def file_sha256(path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def save_pretrained(name: str, params: Dict) -> Path:
    """Save a converted param tree as an orbax artifact under the store and
    record its content hash next to it. Returns the artifact path."""
    import orbax.checkpoint as ocp

    root = weights_dir()
    root.mkdir(parents=True, exist_ok=True)
    path = root / name
    ocp.PyTreeCheckpointer().save(str(path.resolve()), params, force=True)
    (root / f"{name}.sha256").write_text(params_sha256(params) + "\n")
    return path


def load_pretrained(name: str) -> Optional[Dict]:
    """Restore a previously ingested artifact, or None if absent. The
    content hash recorded at ingest time is re-verified so a corrupted or
    hand-edited artifact fails loudly instead of silently degrading
    metrics."""
    import orbax.checkpoint as ocp

    root = weights_dir()
    path = root / name
    if not path.exists():
        return None
    params = ocp.PyTreeCheckpointer().restore(str(path.resolve()))
    recorded = root / f"{name}.sha256"
    if recorded.exists():
        want = recorded.read_text().strip()
        got = params_sha256(params)
        if want != got:
            raise ValueError(
                f"pretrained artifact {path} content hash mismatch "
                f"(recorded {want[:12]}…, restored {got[:12]}…) — re-run "
                f"cli/ingest_weights")
    return params


def validate_against_template(converted: Dict, template: Dict, what: str):
    """Loud structural check: every template leaf must be present in the
    converted tree with the same shape; extras are rejected too. Raises
    ValueError listing every discrepancy (never silently merges — the
    restore_ae_params lesson)."""
    conv = dict(_flat_items(converted))
    temp = dict(_flat_items(template))
    problems = []
    for key in sorted(set(temp) - set(conv)):
        problems.append(f"missing from source: {key} {temp[key].shape}")
    for key in sorted(set(conv) - set(temp)):
        problems.append(f"unexpected in source: {key} {conv[key].shape}")
    for key in sorted(set(conv) & set(temp)):
        if conv[key].shape != temp[key].shape:
            problems.append(
                f"shape mismatch: {key} source {conv[key].shape} "
                f"!= model {temp[key].shape}")
    if problems:
        head = "\n  ".join(problems[:20])
        more = f"\n  … and {len(problems) - 20} more" if len(problems) > 20 else ""
        raise ValueError(
            f"{what}: converted weights do not match the model template "
            f"({len(problems)} problems):\n  {head}{more}")
