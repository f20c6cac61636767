"""Tensor-parallel / FSDP parameter sharding rules for multi-axis meshes.

The reference scales only by DDP data parallelism (NCCL one-process-per-GPU,
/root/reference/main.py:56-62).  On TPU the natural extension is a 2-D
``Mesh(('data', 'model'))``: the batch is sharded over ``data`` and the
UNet's wide dimensions over ``model``, with XLA's GSPMD inserting the
collectives from parameter shardings alone — no hand-written comms.

The rules implement the Megatron-style pairing so each transformer block
and ResBlock needs exactly one reduction on the ``model`` axis:

  * attention q/k/v projections: output (head) dim sharded; the packed
    per-head lane blocks stay whole because heads are sharded, not lanes
  * attention output projection: input dim sharded -> psum
  * GEGLU up-projection: output dim sharded (both the value and gate
    halves shard evenly); FF down-projection: input dim sharded -> psum
  * ResBlock: first conv + time-emb projection output-channel sharded
    (GroupNorm groups don't cross shards: 32 groups split evenly, and the
    rowsum group combine stays shard-local); second conv input-channel
    sharded -> psum; skip 1x1 output-channel sharded
  * everything else (norm scales, position_net, time_embed, ...) replicated

``fsdp_spec`` alternatively shards every large parameter over the data
axis (ZeRO-3 style) for memory-bound training; GSPMD all-gathers weights
around each use.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, spec builder) — first match wins.  Paths are '/'-joined
# flax param paths, e.g. "input_blocks_1_1/transformer_blocks_0/attn1/to_q/kernel".
_TP_RULES: Tuple[Tuple[str, Any], ...] = (
    # attention projections (self/cross/fuser; PackedDense shares names)
    (r"/to_[qkv]/kernel$", lambda shp, ax: P(None, ax)),
    (r"/to_out/kernel$", lambda shp, ax: P(ax, None)),
    (r"/to_out/bias$", lambda shp, ax: P()),
    # GEGLU / FF
    (r"/net_0/proj/kernel$", lambda shp, ax: P(None, ax)),
    (r"/net_0/proj/bias$", lambda shp, ax: P(ax)),
    (r"/net_2/kernel$", lambda shp, ax: P(ax, None)),
    # ResBlock pair: conv1 + emb out-sharded, conv2 in-sharded
    (r"/in_layers_2/kernel$", lambda shp, ax: P(None, None, None, ax)),
    (r"/in_layers_2/bias$", lambda shp, ax: P(ax)),
    (r"/emb_layers_1/kernel$", lambda shp, ax: P(None, ax)),
    (r"/emb_layers_1/bias$", lambda shp, ax: P(ax)),
    (r"/out_layers_0/(scale|bias)$", lambda shp, ax: P(ax)),
    (r"/out_layers_3/kernel$", lambda shp, ax: P(None, None, ax, None)),
    (r"/skip_connection/kernel$", lambda shp, ax: P(None, None, None, ax)),
    (r"/skip_connection/bias$", lambda shp, ax: P(ax)),
)


def tp_spec(path: str, shape: Tuple[int, ...], tp_size: int, axis: str = "model") -> P:
    """PartitionSpec for one UNet parameter under tensor parallelism.

    Returns a replicated spec for anything the rules don't cover or whose
    sharded dim is not divisible by ``tp_size``.
    """
    for rx, builder in _TP_RULES:
        if re.search(rx, path):
            spec = builder(shape, axis)
            ok = True
            for dim, name in zip(shape, tuple(spec) + (None,) * len(shape)):
                if name is not None and dim % tp_size != 0:
                    ok = False
            return spec if ok else P()
    return P()


def tp_shard_params(
    mesh: Mesh, params: Dict[str, Any], axis: str = "model"
) -> Dict[str, Any]:
    """Place a (nested-dict) flax param tree with TP rules applied."""
    import flax.traverse_util as traverse

    tp_size = mesh.shape[axis]
    flat = traverse.flatten_dict(params)
    out = {}
    for k, v in flat.items():
        spec = tp_spec("/".join(k), np.shape(v), tp_size, axis)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return traverse.unflatten_dict(out)


def tp_shard_flat(
    mesh: Mesh, flat_params: Dict[Tuple[str, ...], Any], axis: str = "model"
) -> Dict[Tuple[str, ...], Any]:
    """Same, for the trainer's flat {path-tuple: array} dicts."""
    tp_size = mesh.shape[axis]
    out = {}
    for k, v in flat_params.items():
        spec = tp_spec("/".join(k), np.shape(v), tp_size, axis)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def fsdp_spec(path: str, shape: Tuple[int, ...], dp_size: int, axis: str = "data") -> P:
    """ZeRO-3-style spec: shard the largest divisible dim over ``axis``;
    small/indivisible params stay replicated."""
    if not shape or int(np.prod(shape)) < 2**16:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % dp_size == 0:
            spec = [None] * len(shape)
            spec[i] = axis
            return P(*spec)
    return P()


def fsdp_shard_flat(
    mesh: Mesh, flat_params: Dict[Tuple[str, ...], Any], axis: str = "data"
) -> Dict[Tuple[str, ...], Any]:
    dp_size = mesh.shape[axis]
    out = {}
    for k, v in flat_params.items():
        spec = fsdp_spec("/".join(k), np.shape(v), dp_size, axis)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
