"""Expert parallelism — Mixture-of-Experts MLP with capacity-based token
routing (GShard/Switch style: Lepikhin et al. arXiv:2006.16668, Fedus et al.
arXiv:2101.03961). BEYOND the reference (which has no distributed training at
all, SURVEY.md §2.4) — this completes the parallelism matrix
(dp/tp/fsdp/sp/pp/**ep**).

TPU-native design: routing is expressed entirely as dense one-hot einsums
over STATIC shapes (top-k gating + per-expert capacity with overflow
dropping), so the whole layer jits to a handful of MXU matmuls — no gather /
scatter / dynamic shapes. Under ``jit`` with the expert axis of the parameter
arrays sharded over the mesh's 'model' axis (:func:`moe_partition_spec`),
GSPMD turns the dispatch/combine einsums into all-to-alls over ICI — the
JAX-native equivalent of hand-written MoE all-to-all kernels.

The layer is used by the DiT family (``DiT(moe_experts=...)``) — attention
stays dense, every ``moe_every``-th block's MLP becomes a MoE — and is
exercised as the 'ep' stage of ``__graft_entry__.dryrun_multichip``.

Auxiliary losses (load-balance + router z-loss) are ``sow``-ed under
``intermediates/moe_aux_loss``; :func:`moe_aux_loss` sums them from a
``mutable=['intermediates']`` apply.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


class MoEMLP(nn.Module):
    """Top-k routed expert MLP: ``[B, N, d] -> [B, N, d]``.

    ``capacity_factor`` bounds each expert's token buffer at
    ``ceil(cf * k * N / E)`` — tokens routed past capacity are dropped for
    that expert (their combine weight is zero), keeping every shape static.
    ``num_selected`` (k) = 1 gives Switch routing, 2 the GShard default.
    """

    hidden_size: int
    mlp_dim: int
    num_experts: int
    num_selected: int = 2
    capacity_factor: float = 1.25
    aux_loss_weight: float = 1e-2
    router_z_weight: float = 1e-3
    # mesh axis to PIN the expert-major activations to (e.g. 'model'): a
    # with_sharding_constraint on xin/h/out forces GSPMD to all-to-all the
    # tokens rather than all-gather the sharded expert weights (which would
    # silently defeat expert parallelism's memory scaling). None = let the
    # compiler choose; requires an active Mesh context when set.
    expert_axis: Any = None

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        e = self.num_experts
        k = min(self.num_selected, e)
        cap = max(1, int(np.ceil(self.capacity_factor * k * n / e)))

        logits = nn.Dense(e, kernel_init=nn.initializers.normal(0.02),
                          use_bias=False, name="router")(x)  # [B, N, E]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        # iterative top-k: mask out chosen experts, renormalize gates at the
        # end (GShard §3.2)
        masked = probs
        sel_masks, sel_gates = [], []
        for _ in range(k):
            idx = jnp.argmax(masked, axis=-1)  # [B, N]
            onehot = jax.nn.one_hot(idx, e, dtype=probs.dtype)
            sel_masks.append(onehot)
            sel_gates.append(jnp.sum(probs * onehot, axis=-1))  # [B, N]
            masked = masked * (1.0 - onehot)
        if k > 1:
            denom = sum(sel_gates) + 1e-9
            sel_gates = [g / denom for g in sel_gates]
        # k == 1 is Switch routing (2101.03961 §2.2): scale by the RAW
        # router probability — normalizing the single gate to ~1.0 would cut
        # the router off from the task-loss gradient entirely

        # position of each token inside its expert's capacity buffer; later
        # selection slots queue behind all earlier slots' tokens
        combine = jnp.zeros((b, n, e, cap), probs.dtype)
        used = jnp.zeros((b, 1, e), probs.dtype)  # tokens already buffered
        for mask, gate in zip(sel_masks, sel_gates):
            pos = jnp.cumsum(mask, axis=1) - mask + used  # [B, N, E]
            fits = (pos < cap).astype(probs.dtype) * mask
            used = used + jnp.sum(fits, axis=1, keepdims=True)
            pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                    dtype=probs.dtype)  # [B, N, E, cap]
            combine = combine + gate[..., None, None] * fits[..., None] * pos_oh
        dispatch = (combine > 0).astype(x.dtype)

        # load-balance loss on the FIRST selection slot (Switch eq. 4):
        # E * sum_e mean_tokens(router prob_e) * mean_tokens(selected_e)
        me = jnp.mean(probs, axis=(0, 1))
        ce = jnp.mean(sel_masks[0], axis=(0, 1))
        aux = self.aux_loss_weight * e * jnp.sum(me * ce)
        # router z-loss (ST-MoE, arXiv:2202.08906 eq. 5) keeps logits bounded
        z = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        aux = aux + self.router_z_weight * jnp.mean(z ** 2)
        self.sow("intermediates", "moe_aux_loss", aux)

        w1 = self.param("w1", nn.initializers.variance_scaling(
            1.0, "fan_avg", "uniform"), (e, d, self.mlp_dim))
        b1 = self.param("b1", nn.initializers.zeros, (e, self.mlp_dim))
        w2 = self.param("w2", nn.initializers.variance_scaling(
            1.0, "fan_avg", "uniform"), (e, self.mlp_dim, d))
        b2 = self.param("b2", nn.initializers.zeros, (e, d))

        pin = ((lambda a: jax.lax.with_sharding_constraint(
                    a, P(self.expert_axis)))
               if self.expert_axis else (lambda a: a))
        xin = pin(jnp.einsum("bnec,bnd->ebcd", dispatch, x))  # a2a under ep
        h = pin(jnp.einsum("ebcd,edm->ebcm", xin, w1) + b1[:, None, None, :])
        h = nn.gelu(h, approximate=True)
        out = pin(jnp.einsum("ebcm,emd->ebcd", h, w2) + b2[:, None, None, :])
        y = jnp.einsum("bnec,ebcd->bnd", combine.astype(x.dtype), out)
        return y


def moe_partition_spec(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Expert-parallel PartitionSpecs: shard the leading (expert) dim of
    every rank>=2 MoE parameter over ``axis``; replicate the rest. The
    router's Dense leaves are excluded BY PATH (its [hidden, E] kernel would
    otherwise match the divisibility rule and shard on the input dim) — the
    router stays tiny and replicated. Compose with
    :func:`model_partition_spec` by applying this to the MoE subtrees."""
    n = mesh.shape[axis]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        in_router = any(getattr(pp, "key", None) == "router" for pp in path)
        if (not in_router and n > 1 and np.ndim(leaf) >= 2
                and leaf.shape[0] % n == 0):
            specs.append(P(axis))
        else:
            specs.append(P())
    return jax.tree_util.tree_unflatten(treedef, specs)


def moe_aux_loss(intermediates: Any) -> jnp.ndarray:
    """Sum every ``moe_aux_loss`` sown anywhere in an intermediates tree
    (one entry per MoE layer per apply). Add to the training loss."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(intermediates)[0]:
        if any(getattr(p, "key", None) == "moe_aux_loss" for p in path):
            total = total + jnp.sum(jnp.asarray(leaf))
    return jnp.asarray(total)
