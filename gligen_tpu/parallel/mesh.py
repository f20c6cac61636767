"""Device mesh + sharding utilities (reference L6 'distributed' equivalent).

The reference scales with one-process-per-GPU NCCL DDP
(main.py:56-62, distributed.py).  The TPU-native equivalent is a single
process driving a ``jax.sharding.Mesh``: data parallelism is a 1-D
``('data',)`` mesh with the batch dimension sharded and parameters
replicated; gradient reduction becomes an XLA psum over ICI inserted
automatically by jit from the sharding annotations — there is no NCCL
wrapper layer to port.

Utilities here mirror the reference's observable surface:
``make_mesh`` (torch.distributed.launch topology), ``shard_batch``
(DistributedSampler), ``replicate`` (DDP broadcast), and process-0
gating helpers (distributed.py:9-37).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[tuple[str, int]] = (("data", -1),),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; a -1 axis size absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    sizes = []
    remaining = len(devices)
    for _, s in axes:
        if s != -1:
            assert remaining % s == 0, (axes, len(devices))
            remaining //= s
            sizes.append(s)
        else:
            sizes.append(None)
    sizes = [remaining if s is None else s for s in sizes]
    total = int(np.prod(sizes))
    assert total == len(devices), (sizes, len(devices))
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, [name for name, _ in axes])


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Place a host pytree with its leading (batch) dim sharded over ``axis``."""
    n = int(np.prod([mesh.shape[a] for a in (axis,) if a in mesh.shape]) or 1)

    def put(x):
        x = np.asarray(x)
        if x.ndim and x.shape[0] % n != 0:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by mesh axis "
                f"{axis!r} size {n}"
            )
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree over the mesh (frozen weights, scalars)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def is_process_zero() -> bool:
    """Rank-0 gating (distributed.py:9-16 get_rank()==0 equivalent)."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int, mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return global_batch
    n = mesh.devices.size
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
