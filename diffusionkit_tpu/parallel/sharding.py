"""GSPMD parameter shardings: Megatron-style tensor parallelism for MMDiT/T5.

New capability over the reference (which has no parallelism, SURVEY.md §2).
The sharding plan follows the standard two-matmul pattern: fan-out
projections (q/k/v, fc1, wi_*) are column-sharded over the ``model`` axis so
attention heads and MLP hidden units split across chips; fan-in projections
(o, fc2, wo) are row-sharded so their matmul produces partial sums that XLA
reduces with one psum per block over ICI. Everything small (modulation,
embedders, norms, final layer) is replicated. Activations stay sharded
head-wise through attention. XLA cannot auto-partition a ``pallas_call``, so
under a mesh the flash kernel is explicitly wrapped in ``shard_map`` with the
head axis mapped to ``model`` (ops/attention.py:_flash_tp) — the heads are
already sharded there by the column plan, so it runs on local heads with no
extra collectives.

Shardings are assigned by pytree path rules, so they apply uniformly to the
stacked (scanned) block parameters: a stacked kernel (L, in, out) gets the
same (None, ..., 'model') spec as an unstacked one via negative-axis
placement.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

# Fan-out projections: shard the OUTPUT (last) axis of the kernel and the bias.
# "ada" (AdaLN modulation, hidden -> 6*hidden / 3*hidden) is here because it
# is NOT small: modulation is ~3.2B of FLUX's 12B params (6.4 GB bf16), and
# replicating it was measured to blow per-device HBM from 6.2 to 10.8 GB at
# tp=4 (the full-size compile audit in __graft_entry__.fullsize_compile_stats).
# Its input (the t/y embedding) is replicated, so the matmul is local; the
# consumer re-gathers only the per-sample (B, 6H) modulation VECTORS —
# ~74 KB/block, noise next to the 26 MB fan-in all-reduces.
_COL_PARENTS = {
    "q", "k", "v", "fc1", "query_proj", "key_proj", "value_proj",
    "wi_0", "wi_1", "ada",
}
# Fan-in projections: shard the INPUT (second-to-last) axis; bias replicated.
_ROW_PARENTS = {"o", "fc2", "out_proj", "wo"}


# Weight-only-quantized leaves (ops/quantized.py): q4 (in/8, out),
# q8 (in, out), scales/zeros (in/groups, out) — all share the kernel's
# (in, out) axis meaning, so the same column/row placement applies.
# w8 (in, out) is the w8a8 execution format (ops/w8a8.py); its per-channel
# wscale (out,) follows the bias rule (column-sharded under fan-out parents,
# replicated under fan-in parents).
_KERNEL_LIKE = {"kernel", "q4", "q8", "scales", "zeros", "w8"}


def _spec_for(path, leaf, axis: str, axis_size: int) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    parent = names[-2] if len(names) >= 2 else None
    name = names[-1] if names else None

    def spec(dim_from_end: int) -> P:
        # Replicate anything whose target dim doesn't divide (e.g. a single
        # quant group); correctness first, GSPMD handles mixed layouts.
        if leaf.shape[leaf.ndim - dim_from_end] % axis_size != 0:
            return P()
        parts = [None] * leaf.ndim
        parts[leaf.ndim - dim_from_end] = axis
        return P(*parts)

    if parent in _COL_PARENTS and (name in _KERNEL_LIKE or name in ("bias", "wscale")):
        return spec(1)
    if parent in _ROW_PARENTS and name in _KERNEL_LIKE:
        return spec(2)
    return P()


def _shardings(params: Params, mesh: Mesh, axis: str) -> Params:
    size = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, axis, size)),
        params,
    )


def mmdit_shardings(params: Params, mesh: Mesh, axis: str = "model") -> Params:
    """NamedSharding pytree for MMDiT parameters (tensor parallel)."""
    return _shardings(params, mesh, axis)


def t5_shardings(params: Params, mesh: Mesh, axis: str = "model") -> Params:
    """Same column/row rules cover T5's projection names."""
    return _shardings(params, mesh, axis)


def replicate(params: Params, mesh: Mesh) -> Params:
    """Fully-replicated shardings (CLIP, VAE — small models)."""
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Batch-axis sharding for activations: (batch, ...) split over data."""
    return NamedSharding(mesh, P(*([axis] + [None] * (ndim - 1))))


def shard_params(params: Params, shardings: Params) -> Params:
    """Place a parameter pytree onto the mesh per the sharding pytree."""
    return jax.device_put(params, shardings)
