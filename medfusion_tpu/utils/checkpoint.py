"""Checkpointing: Orbax pytree snapshots + best-checkpoint pointer.

Replaces the reference's Lightning ModelCheckpoint + ``best_checkpoint.json``
indirection (``/root/reference/medical_diffusion/models/model_base.py:51-66``,
trainer configs ``scripts/train_diffusion.py:148-155``):

* ``save_checkpoint(dir, state, step, config)`` — atomic Orbax save of the full
  TrainState pytree (params, EMA, opt state, step) + a JSON config snapshot.
* ``save_best_checkpoint`` / ``load_best_checkpoint`` — the reference's
  best-pointer pattern (a JSON file naming the best step).
* ``load_pretrained`` / ``filter_weights`` — partial/filtered weight loading
  (model_base.py:68-85 semantics: keep only leaves whose path matches, and
  whose shapes agree with the target tree).

Orbax handles multi-host coordination on pods — proven by the REAL 2-process
coordinated save/restore of a data-sharded TrainState in
``tests/test_multihost.py`` (host-local scalars must first be made global:
see :func:`globalize_for_multihost`). ``keep_top_k`` mirrors Lightning's
``save_top_k``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

BEST_FILE = "best_checkpoint.json"
CONFIG_FILE = "config.json"


def _manager(ckpt_dir: Path, keep_top_k: Optional[int] = None) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=keep_top_k, create=True)
    return ocp.CheckpointManager(Path(ckpt_dir).absolute(), options=options)


def save_checkpoint(ckpt_dir, state: Any, step: int, config: Optional[Dict] = None,
                    keep_top_k: Optional[int] = None) -> None:
    ckpt_dir = Path(ckpt_dir)
    with _manager(ckpt_dir, keep_top_k) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    if config is not None:
        (ckpt_dir / CONFIG_FILE).write_text(json.dumps(config, indent=2, default=str))


def globalize_for_multihost(state: Any, mesh) -> Any:
    """Make every host-local leaf a fully-replicated GLOBAL array on ``mesh``.

    In a multi-process run orbax refuses to serialize host-local
    (SingleDeviceSharding) arrays — the TrainState scalars (step, optax
    counts) are exactly that after ``TrainState.create``. Leaves already
    sharded on a mesh (NamedSharding) pass through untouched. Call this on
    the state before ``save_checkpoint`` AND on the template before
    ``restore_checkpoint`` when ``jax.process_count() > 1``."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())

    def one(x):
        if hasattr(x, "sharding") and getattr(x.sharding, "mesh", None) is not None:
            return x  # already global (NamedSharding on a mesh)
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, rep, lambda idx: arr[idx])

    return jax.tree_util.tree_map(one, state)


def _path_str(keypath) -> str:
    """Key-path -> 'a/b/c' across DictKey (.key) and GetAttrKey (.name)."""
    return "/".join(
        str(getattr(p, "key", getattr(p, "name", p))) for p in keypath
    )


def restore_checkpoint(ckpt_dir, template: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``template`` (an abstract or
    concrete TrainState pytree).

    Forward-compatible: when the template has FIELDS the checkpoint predates
    (e.g. ``GANTrainState.disc_stats`` added in round 2), the strict restore
    falls back to a path-wise merge — on-disk leaves load where they exist,
    new fields keep their template values. Shape mismatches still raise
    (that is a wrong template, not an old checkpoint)."""
    with _manager(Path(ckpt_dir)) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        try:
            return mgr.restore(step, args=ocp.args.StandardRestore(template))
        except ValueError:
            raw = mgr.restore(step)  # as-saved nested-dict tree

    raw_flat = {
        _path_str(kp): v for kp, v in jax.tree_util.tree_flatten_with_path(raw)[0]
    }
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    leaves, new_fields = [], []
    for kp, tv in flat:
        path = _path_str(kp)
        rv = raw_flat.get(path)
        if rv is None:
            new_fields.append(path)
            leaves.append(tv)
        elif np.shape(rv) != np.shape(tv):
            raise ValueError(
                f"checkpoint/template shape mismatch at {path}: "
                f"{np.shape(rv)} vs {np.shape(tv)} — wrong model config?"
            )
        else:
            leaves.append(rv)
    if new_fields:
        if len(new_fields) == len(flat):
            # nothing on disk matched: this is a WRONG template (e.g. a
            # plain TrainState against a GAN run), not an old checkpoint —
            # returning the template would silently hand back random weights
            raise ValueError(
                f"checkpoint under {ckpt_dir} shares no leaf paths with the "
                f"template (saved keys e.g. {sorted(raw_flat)[:3]}); wrong "
                f"state type? (GAN runs save GANTrainState — for AE weights "
                f"use restore_ae_params)")
        print(f"restore_checkpoint: kept template values for fields not in the "
              f"checkpoint: {new_fields[:5]}{'...' if len(new_fields) > 5 else ''}")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )


def restore_ae_params(ckpt_dir, template_params: Any,
                      step: Optional[int] = None) -> Any:
    """Autoencoder PARAMS from a run dir of either layout: a plain
    ``TrainState`` run (``params/...``) or a GAN run (``GANTrainState``:
    ``gen/params/...``). Validates every leaf path+shape against
    ``template_params`` and RAISES on mismatch — a silent fallback here
    would hand a random VAE to the diffusion stage."""
    with _manager(Path(ckpt_dir)) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        raw = mgr.restore(step)
    candidates = []
    if isinstance(raw, dict):
        if "params" in raw:
            candidates.append(("params", raw["params"]))
        gen = raw.get("gen")
        if isinstance(gen, dict) and "params" in gen:
            candidates.append(("gen/params", gen["params"]))
    t_flat = jax.tree_util.tree_flatten_with_path(template_params)[0]
    errors = []
    for name, sub in candidates:
        s_flat = {_path_str(kp): v
                  for kp, v in jax.tree_util.tree_flatten_with_path(sub)[0]}
        leaves, bad = [], None
        for kp, tv in t_flat:
            path = _path_str(kp)
            rv = s_flat.get(path)
            if rv is None:
                bad = f"{name}: missing {path}"
                break
            if np.shape(rv) != np.shape(tv):
                bad = (f"{name}: shape mismatch at {path} "
                       f"{np.shape(rv)} vs {np.shape(tv)}")
                break
            leaves.append(rv)
        if bad is None and len(s_flat) == len(t_flat):
            return jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(template_params), leaves)
        errors.append(bad or f"{name}: {len(s_flat)} leaves vs "
                             f"template {len(t_flat)}")
    detail = "; ".join(e for e in errors if e) or \
        "checkpoint has neither params nor gen/params"
    checked = ", ".join(n for n, _ in candidates) or "nothing"
    raise ValueError(
        f"no AE params in {ckpt_dir} match the model template "
        f"(checked {checked}): {detail} — wrong --model family or wrong "
        f"run dir?")


def latest_step(ckpt_dir) -> Optional[int]:
    try:
        with _manager(Path(ckpt_dir)) as mgr:
            return mgr.latest_step()
    except Exception:
        return None


def _best_dir(ckpt_dir) -> Path:
    """Sibling directory persisting the best state (NOT nested inside the
    step manager's dir — orbax scans it for integer step names)."""
    p = Path(ckpt_dir)
    return p.with_name(p.name + "_best")


def save_best_checkpoint(ckpt_dir, step: int, metric: float,
                         minimize: bool = True, state: Any = None) -> bool:
    """Update the best-pointer if ``metric`` improves (model_base.py:51-61).
    Returns True when the pointer moved.

    Pass ``state`` to ALSO persist the improving state into a sibling
    ``<ckpt_dir>_best`` store (keep 1): the main manager's ``keep_top_k``
    keeps the LATEST N steps (the reference's ModelCheckpoint keeps the
    best-by-metric), so the pointed-at step is otherwise garbage-collected
    once training moves on and the pointer dangles."""
    path = Path(ckpt_dir) / BEST_FILE
    best = None
    if path.exists():
        best = json.loads(path.read_text())
    improved = (
        best is None
        or (minimize and metric < best["metric"])
        or (not minimize and metric > best["metric"])
    )
    if improved:
        path.write_text(json.dumps({"step": step, "metric": float(metric),
                                    "minimize": minimize}))
        if state is not None:
            save_checkpoint(_best_dir(ckpt_dir), state, step, keep_top_k=1)
    return improved


def load_best_checkpoint(ckpt_dir, template: Any) -> Any:
    """Restore the step named by the best-pointer (model_base.py:63-66).
    Falls back to the sibling best-store when the main manager has already
    garbage-collected that step (keep_top_k keeps the latest N)."""
    pointer = json.loads((Path(ckpt_dir) / BEST_FILE).read_text())
    try:
        return restore_checkpoint(ckpt_dir, template, step=pointer["step"])
    except (FileNotFoundError, ValueError, KeyError):
        return restore_checkpoint(_best_dir(ckpt_dir), template,
                                  step=pointer["step"])


def filter_weights(source: Any, target: Any, path_regex: Optional[str] = None) -> Any:
    """Partial weight transfer (model_base.py:68-85): take ``source`` leaves
    whose path matches ``path_regex`` (all, if None) AND whose shape matches
    ``target``; keep the target leaf otherwise."""
    pat = re.compile(path_regex) if path_regex else None

    src_flat = {
        "/".join(p.key for p in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(source)[0]
    }

    def pick(kp, tgt_leaf):
        path = "/".join(p.key for p in kp)
        src = src_flat.get(path)
        if src is None or np.shape(src) != np.shape(tgt_leaf):
            return tgt_leaf
        if pat is not None and not pat.search(path):
            return tgt_leaf
        return src

    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), [pick(kp, v) for kp, v in flat]
    )
