"""Tensor-parallel shardings for the cross-domain transformer.

SURVEY.md §2.10: the reference has no TP (its largest model is ~84 MB) and
DP over segments is this framework's primary axis; TP is the contingency for
variants that outgrow one chip's HBM (long-segment fine-tunes, wider
bottom_channels). The TPU-idiomatic implementation is pure annotation — no
model-code changes: the transformer's projection weights get Megatron-style
PartitionSpecs over a ``tp`` mesh axis (row-split in-projections / FFN-in,
column-split out-projections / FFN-out) and XLA GSPMD inserts the matching
collectives; every other parameter is replicated. Works standalone on a
``("tp",)`` mesh or combined with batch DP on a 2-D ``("dp", "tp")`` mesh
(train: batch over dp, these specs over tp — grad psum over dp falls out of
the shardings too).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["transformer_tp_specs", "tp_shardings", "tp_forward"]

# Megatron split: rows of the packed qkv in-projection and the FFN
# up-projection, columns of the attention out-projection and the FFN
# down-projection. Biases follow their weight's output dimension.
_TP_LEAF_SPECS: tp.Dict[str, P] = {
    "in_proj_weight": P("tp", None),
    "in_proj_bias": P("tp"),
    "linear1.weight": P("tp", None),
    "linear1.bias": P("tp"),
    "out_proj.weight": P(None, "tp"),
    "linear2.weight": P(None, "tp"),
}


def transformer_tp_specs(params: dict) -> dict:
    """PartitionSpec pytree matching ``params``: transformer projections are
    sharded over ``tp``, everything else replicated (``P()``)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (str(k),)) for k, v in node.items()}
        if "crosstransformer" in path:
            tail2 = ".".join(path[-2:])
            if path[-1] in _TP_LEAF_SPECS:
                return _TP_LEAF_SPECS[path[-1]]
            if tail2 in _TP_LEAF_SPECS:
                return _TP_LEAF_SPECS[tail2]
        return P()

    return walk(params, ())


def tp_shardings(params: dict, mesh: Mesh) -> dict:
    """NamedSharding pytree for ``params`` on ``mesh`` (which must carry a
    ``tp`` axis; extra axes like ``dp`` simply replicate the params)."""
    specs = transformer_tp_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


@functools.lru_cache(maxsize=8)
def _tp_jitted(kind: str, cfg, mesh: Mesh, batch_axis: tp.Optional[str],
               treedef, shardings_flat):
    from demucs_tpu.models.registry import _forward_fns

    raw = _forward_fns()[kind]
    param_sh = jax.tree.unflatten(treedef, shardings_flat)
    batch_spec = P(batch_axis) if batch_axis else P()
    return jax.jit(
        lambda params, mix: raw(params, mix, cfg),
        in_shardings=(param_sh, NamedSharding(mesh, batch_spec)),
        out_shardings=NamedSharding(mesh, batch_spec),
    )


def tp_forward(model, mix, mesh: Mesh, *, batch_axis: tp.Optional[str] = None):
    """Jit the model forward with TP-sharded transformer weights.

    ``mix (B, C, L)``; with ``batch_axis="dp"`` on a 2-D mesh the batch is
    additionally split over dp. Returns host numpy stems — a correctness/
    capability entry point (the production engine composes the same specs).

    The jitted executable and the sharded device params are cached per
    (model, mesh, batch_axis): repeat calls pay neither the compile nor the
    weight re-upload (25-70 s compiles + a ~20-40 MB/s host link here).
    """
    import jax.numpy as jnp
    import numpy as np

    param_sh = tp_shardings(model.params, mesh)
    sh_flat, treedef = jax.tree.flatten(param_sh)
    fwd = _tp_jitted(model.kind, model.cfg, mesh, batch_axis, treedef,
                     tuple(sh_flat))
    cache = getattr(model, "_tp_param_cache", None)
    if cache is None or cache[0] is not mesh:
        with mesh:
            cache = (mesh, jax.device_put(model.params, param_sh))
        try:
            object.__setattr__(model, "_tp_param_cache", cache)
        except (AttributeError, TypeError):
            pass
    params = cache[1]
    with mesh:
        out = fwd(params, jnp.asarray(mix))
    return np.asarray(out)
