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
    """Place a host pytree with its leading (batch) dim sharded over ``axis``.

    Single-process: the tree holds the GLOBAL batch; a host-local
    device_put scatters it.  Multi-process (``jax.process_count() > 1``):
    each process passes only its PROCESS-LOCAL rows — the slice
    ``process_batch_slice(global_batch)`` of the conceptual global batch
    (the DistributedSampler contract, reference trainer.py:275) — and the
    global array is assembled via
    ``jax.make_array_from_process_local_data`` (a host-local device_put
    of the full batch would be WRONG here: non-addressable devices can't
    be fed from this host)."""
    n = int(np.prod([mesh.shape[a] for a in (axis,) if a in mesh.shape]) or 1)
    multiprocess = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, x)
        if x.ndim and x.shape[0] % n != 0:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by mesh axis "
                f"{axis!r} size {n}"
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def process_batch_slice(global_batch: int) -> slice:
    """This process's contiguous row range within a global batch (the
    DistributedSampler equivalent, reference trainer.py:275).

    Row blocks are process-major, matching ``make_mesh``'s device order
    (jax.devices() sorts by id, which is process-major), so the slice
    lines up with ``jax.make_array_from_process_local_data``."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    local = global_batch // n
    r = jax.process_index()
    return slice(r * local, (r + 1) * local)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree over the mesh (frozen weights, scalars).

    Multi-process: every process holds the full value host-side (params
    are loaded/initialized identically everywhere), so each feeds its own
    addressable devices and the arrays are stitched into one global
    jax.Array."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]

    def put(x):
        x = np.asarray(x)
        arrs = [jax.device_put(x, d) for d in local]
        return jax.make_array_from_single_device_arrays(x.shape, sharding, arrs)

    return jax.tree.map(put, tree)


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
