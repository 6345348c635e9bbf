"""Device mesh + sharding rules.

TPU-native replacement for the reference's Lightning-DDP/NCCL distribution
(``/root/reference/modules/utils/fix_ddp.py``, ``train.py:98-109``): a named
``jax.sharding.Mesh`` with a ``data`` axis for batch sharding (gradient
all-reduce becomes an XLA ``psum`` over ICI), an optional ``fsdp`` axis
for ZeRO-style parameter/optimizer-state sharding, and an optional
``tensor`` axis for Megatron-style tensor parallelism over the UNet's
transformer blocks (column-parallel q/k/v + GEGLU in-projection, row-parallel
out/FF-down projections, attention heads sharded) — capabilities the
reference lacks entirely (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"

# Megatron-style tensor-parallel rules over the diffusers parameter names.
# Column-parallel (shard the OUT dim, dim 0 of torch (out, in) Linear):
# activations leave sharded on the feature axis — for q/k/v that is the
# fused head axis, for ff.net.0.proj the GEGLU hidden. Row-parallel (shard
# the IN dim): consumes the sharded feature axis; XLA emits the psum.
_TP_COL_SUFFIXES = (".to_q.weight", ".to_k.weight", ".to_v.weight",
                    ".ff.net.0.proj.weight",
                    # MMDiT (SD3) context-stream projections + context FF
                    ".add_q_proj.weight", ".add_k_proj.weight",
                    ".add_v_proj.weight", ".ff_context.net.0.proj.weight")
_TP_ROW_SUFFIXES = (".to_out.0.weight", ".ff.net.2.weight",
                    ".to_add_out.weight", ".ff_context.net.2.weight")


def make_mesh(data: Optional[int] = None, fsdp: int = 1, tensor: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp = max(int(fsdp or 1), 1)
    tensor = max(int(tensor or 1), 1)
    if data is None:
        assert n % (fsdp * tensor) == 0, \
            f"{n} devices not divisible by fsdp={fsdp}*tensor={tensor}"
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, \
        f"mesh {data}x{fsdp}x{tensor} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS))


def mesh_from_config(trainer_config) -> Mesh:
    mesh_conf = trainer_config.get("mesh", {}) or {}
    tensor = mesh_conf.get("tensor", 1) or 1
    if int(tensor) > 1 and jax.process_count() > 1:
        # The per-host data pipeline shards batches by process over the data
        # axis only; a tensor axis spanning hosts would desync that mapping.
        raise NotImplementedError(
            "trainer.mesh.tensor > 1 is single-host (all tensor-parallel "
            "peers must share a host's data shard); use data/fsdp across "
            "hosts")
    return make_mesh(mesh_conf.get("data"), mesh_conf.get("fsdp", 1) or 1,
                     tensor)


def tp_dim(name: str, shape: tuple[int, ...], tp: int) -> Optional[int]:
    """Which dim of `name` the tensor axis shards, or None if not a TP param.

    Only the 2-D Linear weights of the UNet transformer blocks participate;
    biases stay replicated (XLA slices them into the sharded add for free),
    LoRA factors stay replicated (rank-r, tiny).
    """
    if tp <= 1 or len(shape) != 2:
        return None
    if name.endswith(_TP_COL_SUFFIXES) and shape[0] % tp == 0:
        return 0
    if name.endswith(_TP_ROW_SUFFIXES) and shape[1] % tp == 0:
        return 1
    return None


def tp_param_names(shapes: dict, tp: int) -> set[str]:
    """Names that get a tensor-axis sharding (for pack exclusion)."""
    return {k for k, v in shapes.items()
            if tp_dim(k, tuple(v.shape), tp) is not None}


# --- active mesh registry ----------------------------------------------------
# Set by the Trainer / bench / dryrun around tracing so shape-level code
# (ops.attention's shard_map wrapper) can see the mesh without threading it
# through every model function. `with mesh:` only sets jit's resource env;
# explicitly registering keeps the dependency visible and testable.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, name: str, shape: tuple[int, ...]) -> NamedSharding:
    """TP + FSDP rule.

    Transformer-block Linear weights get their Megatron dim on ``tensor``
    (see :func:`tp_dim`); the OTHER dim may additionally shard over ``fsdp``.
    Every other param shards its largest ``fsdp``-divisible axis, else
    replicates. With fsdp=tensor=1 every param is replicated (pure data
    parallelism, the reference's only mode). XLA inserts the
    all-gathers/reduce-scatters.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]
    tp_size = mesh.shape.get(TENSOR_AXIS, 1)
    if not shape:
        return replicated(mesh)
    spec: list = [None] * len(shape)
    t_dim = tp_dim(name, shape, tp_size)
    if t_dim is not None:
        spec[t_dim] = TENSOR_AXIS
    if fsdp_size > 1:
        candidates = [(d, i) for i, d in enumerate(shape)
                      if i != t_dim and d % fsdp_size == 0]
        if candidates:
            _, axis = max(candidates)
            spec[axis] = FSDP_AXIS
    if all(s is None for s in spec):
        return replicated(mesh)
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
