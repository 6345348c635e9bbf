"""Device mesh + sharding rules.

TPU-native replacement for the reference's Lightning-DDP/NCCL distribution
(``/root/reference/modules/utils/fix_ddp.py``, ``train.py:98-109``): a named
``jax.sharding.Mesh`` with a ``data`` axis for batch sharding (gradient
all-reduce becomes an XLA ``psum`` over ICI) and an optional ``fsdp`` axis
for ZeRO-style parameter/optimizer-state sharding — a capability the
reference lacks entirely (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def make_mesh(data: Optional[int] = None, fsdp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp = max(int(fsdp or 1), 1)
    if data is None:
        assert n % fsdp == 0, f"{n} devices not divisible by fsdp={fsdp}"
        data = n // fsdp
    assert data * fsdp == n, f"mesh {data}x{fsdp} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, fsdp)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS))


def mesh_from_config(trainer_config) -> Mesh:
    mesh_conf = trainer_config.get("mesh", {}) or {}
    return make_mesh(mesh_conf.get("data"), mesh_conf.get("fsdp", 1) or 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, name: str, shape: tuple[int, ...]) -> NamedSharding:
    """FSDP rule: shard the largest divisible axis across `fsdp`, else replicate.

    With fsdp=1 every param is replicated (pure data parallelism, the
    reference's only mode). XLA inserts the all-gathers/reduce-scatters.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]
    if fsdp_size <= 1 or not shape:
        return replicated(mesh)
    # Prefer the largest dim divisible by the axis size.
    candidates = [(d, i) for i, d in enumerate(shape) if d % fsdp_size == 0]
    if not candidates:
        return replicated(mesh)
    _, axis = max(candidates)
    spec = [None] * len(shape)
    spec[axis] = FSDP_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_params(mesh: Mesh, params: dict) -> dict:
    """Device-put a flat param dict according to the FSDP rule.

    One pytree-level device_put call: per-leaf calls each pay a full dispatch
    round-trip, which is ruinous on remote-attached TPUs (~0.5 s/op).
    """
    shardings = {k: param_sharding(mesh, k, tuple(v.shape)) for k, v in params.items()}
    return jax.device_put(params, shardings)


def params_shardings(mesh: Mesh, params: dict) -> dict:
    return {k: param_sharding(mesh, k, tuple(v.shape)) for k, v in params.items()}
