"""Parameter packing — slabs for small leaves, stacks for shape families.

Measured on the v5e chip (PERF_NOTES.md): the optimizer update program is
LAUNCH-bound, not traffic-bound — even a PLAIN optax Adam update over just
the 459 sub-2^18-element SD1.5 UNet leaves costs 20.4 ms (~44 us per fused
kernel, serialized), while their total traffic is ~30 MB (~0.05 ms). Every
per-leaf stage (cast, moment update, weight decay, apply, EMA) pays that
launch tax, for every one of the ~686 leaves.

Two TPU-native fixes, both persistent representations in the train state:

* **Slabs** — all small trainable leaves live in ONE flat fp32 slab per
  (component, optimizer-group). Packing big leaves this way would pay the
  multi-dim->1-D relayout pathology (13 ms per 29M-element conv leaf each
  way, PERF_NOTES.md int8 saga), hence:
* **Stacks** — big leaves with IDENTICAL shapes (the UNet is highly
  regular: 227 big SD1.5 leaves collapse to 33 distinct shapes, e.g. 49x
  (1280,1280) attention projections) live as one (N, *shape) array.
  Stacking is a leading-dim concat: each member keeps its natural trailing
  layout, so slicing member i back out is tile-preserving (free), unlike
  raveling.

The optimizer, EMA, weight decay and apply then see ~35 leaves instead of
~686. The forward pass consumes natural shapes via :func:`unpack` — a
linear op with a custom VJP whose backward is exactly one concat per slab
and one stack per family (the slices are disjoint and complete), instead
of autodiff's per-leaf pad-and-add chains.

Packed keys live INSIDE the component namespace (``unet.__slab__.<group>``,
``unet.__stack__.<group>.<i>``) so every existing prefix-based consumer —
the EMA ``unet.`` filter, the multi_transform label map, checkpoint
namespacing — keeps working; the checkpoint layer unpacks to natural
reference-layout names on save and repacks on restore, so on-disk formats
are unchanged.

No reference analogue: torch dispatches per-tensor and eats this overhead
(the reference's bitsandbytes kernels are per-tensor too).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

SLAB_MARK = ".__slab__."
STACK_MARK = ".__stack__."
# Slab length is padded up so any fsdp axis size up to 1024 can shard it;
# the pad tail is zero-initialized and its gradient is structurally zero.
SLAB_PAD_MULTIPLE = 1024
# Leaves at or above this go to stacks (shape families) instead of slabs.
DEFAULT_MIN_SLAB_SIZE = 1 << 18


class LeafSlot(NamedTuple):
    key: str
    shape: tuple[int, ...]
    offset: int
    size: int


class PackSpec(NamedTuple):
    """Hashable (usable as a static jit arg).

    slabs: (slab_key, padded_length, leaf slots) per small-leaf group;
    stacks: (stack_key, member keys in stack order, member shape);
    passthrough: keys kept natural."""
    slabs: tuple[tuple[str, int, tuple[LeafSlot, ...]], ...]
    stacks: tuple[tuple[str, tuple[str, ...], tuple[int, ...]], ...]
    passthrough: tuple[str, ...]

    @property
    def packed_keys(self) -> set[str]:
        out = {s.key for _, _, slots in self.slabs for s in slots}
        out.update(k for _, members, _ in self.stacks for k in members)
        return out

    @property
    def slab_keys(self) -> tuple[str, ...]:
        return tuple(k for k, _, _ in self.slabs)

    @property
    def stack_keys(self) -> tuple[str, ...]:
        return tuple(k for k, _, _ in self.stacks)

    @property
    def container_keys(self) -> set[str]:
        return set(self.slab_keys) | set(self.stack_keys)

    @property
    def nontrivial(self) -> bool:
        return bool(self.slabs or self.stacks)


def _component_of(key: str) -> str:
    # first dotted segment: 'unet', 'condition_model', 'vae' — packed keys
    # must stay inside the component namespace for prefix-based consumers
    return key.split(".", 1)[0]


def build_pack_spec(shapes: dict[str, Any],
                    labels: Optional[dict[str, str]] = None,
                    min_slab_size: int = DEFAULT_MIN_SLAB_SIZE,
                    stack_big: bool = True,
                    exclude: Optional[set] = None) -> PackSpec:
    """Group small float32 leaves into per-(component, group) slabs and big
    same-shape leaves into (N, *shape) stacks.

    `shapes`: key -> array or ShapeDtypeStruct (``.shape``/``.dtype``).
    `labels`: key -> optimizer group label (packs never span groups, so
    per-group lr/weight-decay stay exact). None -> single group.
    `exclude`: keys that must keep their natural shape (tensor-parallel
    weights: packing would erase their mesh-axis sharding).
    """
    def label_of(key: str) -> str:
        return labels.get(key, "default") if labels is not None else "default"

    slab_groups: dict[str, list[tuple[str, tuple[int, ...], int]]] = {}
    fam_groups: dict[tuple[str, str, tuple[int, ...]], list[str]] = {}
    passthrough: list[str] = []
    for key in sorted(shapes):
        v = shapes[key]
        shape = tuple(v.shape)
        size = int(np.prod(shape)) if shape else 1
        if jnp.dtype(v.dtype) != jnp.float32 or (exclude and key in exclude):
            passthrough.append(key)
        elif size < min_slab_size:
            slab_key = f"{_component_of(key)}{SLAB_MARK}{label_of(key)}"
            slab_groups.setdefault(slab_key, []).append((key, shape, size))
        elif stack_big and len(shape) >= 1:
            fam_groups.setdefault(
                (_component_of(key), label_of(key), shape), []).append(key)
        else:
            passthrough.append(key)

    slabs = []
    for slab_key in sorted(slab_groups):
        leaves = slab_groups[slab_key]
        if len(leaves) == 1:
            # a one-leaf slab saves nothing; keep the leaf natural
            passthrough.append(leaves[0][0])
            continue
        slots, off = [], 0
        for key, shape, size in leaves:
            slots.append(LeafSlot(key, shape, off, size))
            off += size
        padded = -(-off // SLAB_PAD_MULTIPLE) * SLAB_PAD_MULTIPLE
        slabs.append((slab_key, padded, tuple(slots)))

    stacks = []
    counters: dict[tuple[str, str], int] = {}
    for (comp, label, shape) in sorted(fam_groups, key=str):
        members = fam_groups[(comp, label, shape)]
        if len(members) == 1:
            passthrough.append(members[0])
            continue
        i = counters.get((comp, label), 0)
        counters[(comp, label)] = i + 1
        stacks.append((f"{comp}{STACK_MARK}{label}.{i}",
                       tuple(members), shape))
    return PackSpec(tuple(slabs), tuple(stacks), tuple(sorted(passthrough)))


def pack(params: dict, spec: PackSpec, np_out: bool = False) -> dict:
    """Natural per-leaf dict -> packed dict (slabs + stacks + passthrough)."""
    xp = np if np_out else jnp
    packed_keys = spec.packed_keys
    out = {k: v for k, v in params.items() if k not in packed_keys}
    for slab_key, padded, slots in spec.slabs:
        parts = [xp.ravel(xp.asarray(params[s.key]).astype(xp.float32))
                 for s in slots]
        pad = padded - sum(s.size for s in slots)
        if pad:
            parts.append(xp.zeros((pad,), xp.float32))
        out[slab_key] = xp.concatenate(parts)
    for stack_key, members, _shape in spec.stacks:
        out[stack_key] = xp.stack(
            [xp.asarray(params[k]).astype(xp.float32) for k in members])
    return out


def _unpack_fwd(spec: PackSpec, packed: dict) -> dict:
    containers = spec.container_keys
    out = {k: v for k, v in packed.items() if k not in containers}
    for slab_key, _, slots in spec.slabs:
        slab = packed[slab_key]
        for s in slots:
            out[s.key] = jax.lax.slice(slab, (s.offset,),
                                       (s.offset + s.size,)).reshape(s.shape)
    for stack_key, members, _shape in spec.stacks:
        arr = packed[stack_key]
        for i, k in enumerate(members):
            out[k] = jax.lax.index_in_dim(arr, i, 0, keepdims=False)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _unpack_vjp(spec: PackSpec, packed: dict) -> dict:
    return _unpack_fwd(spec, packed)


def _vjp_fwd(spec: PackSpec, packed: dict):
    # no residuals needed: the input structure is fully reconstructible
    # from the (static) spec plus the cotangent dict
    return _unpack_fwd(spec, packed), None


def _vjp_bwd(spec: PackSpec, _res, cots: dict):
    member_keys = spec.packed_keys
    # passthrough cotangents map straight back to their input keys
    grads: dict = {k: v for k, v in cots.items() if k not in member_keys}
    for slab_key, padded, slots in spec.slabs:
        # disjoint + complete slices: the slab cotangent is exactly the
        # concat of the per-leaf cotangents (plus a zero pad tail) — one
        # kernel instead of autodiff's per-leaf pad-and-add chain
        dtype = cots[slots[0].key].dtype
        parts = [jnp.ravel(cots[s.key]).astype(dtype) for s in slots]
        pad = padded - sum(s.size for s in slots)
        if pad:
            parts.append(jnp.zeros((pad,), dtype))
        grads[slab_key] = jnp.concatenate(parts)
    for stack_key, members, _shape in spec.stacks:
        grads[stack_key] = jnp.stack([cots[k] for k in members])
    return (grads,)


_unpack_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def unpack(packed: dict, spec: Optional[PackSpec]) -> dict:
    """Packed dict -> natural per-leaf dict (differentiable; bwd = one
    concat per slab + one stack per family)."""
    if spec is None or not spec.nontrivial:
        return dict(packed)
    return _unpack_vjp(spec, packed)


def unpack_host(packed: dict, spec: Optional[PackSpec]) -> dict:
    """Host-side unpack (numpy views) for checkpoint/export boundaries."""
    if spec is None or not spec.nontrivial:
        return dict(packed)
    containers = spec.container_keys
    out = {k: v for k, v in packed.items() if k not in containers}
    for slab_key, _, slots in spec.slabs:
        if slab_key not in packed:
            continue
        slab = np.asarray(packed[slab_key])
        for s in slots:
            out[s.key] = slab[s.offset:s.offset + s.size].reshape(s.shape)
    for stack_key, members, _shape in spec.stacks:
        if stack_key not in packed:
            continue
        arr = np.asarray(packed[stack_key])
        for i, k in enumerate(members):
            out[k] = arr[i]
    return out


def repack_host(natural: dict, spec: Optional[PackSpec],
                template: Optional[dict] = None) -> dict:
    """Host-side pack for checkpoint restore.

    Packs none of whose members appear in `natural` are omitted entirely
    (e.g. an EMA shadow that covers only the unet component). For partially
    covered packs, missing members fall back to `template[pack_key]` when
    given, else zero."""
    if spec is None or not spec.nontrivial:
        return dict(natural)
    packed_keys = spec.packed_keys
    out = {k: v for k, v in natural.items() if k not in packed_keys}
    for slab_key, padded, slots in spec.slabs:
        present = [s for s in slots if s.key in natural]
        if not present:
            continue
        if len(present) < len(slots) and template is not None \
                and slab_key in template:
            slab = np.asarray(template[slab_key]).astype(np.float32).copy()
        else:
            slab = np.zeros((padded,), np.float32)
        for s in present:
            slab[s.offset:s.offset + s.size] = \
                np.asarray(natural[s.key]).astype(np.float32).ravel()
        out[slab_key] = slab
    for stack_key, members, shape in spec.stacks:
        present = [k for k in members if k in natural]
        if not present:
            continue
        if len(present) < len(members) and template is not None \
                and stack_key in template:
            arr = np.asarray(template[stack_key]).astype(np.float32).copy()
        else:
            arr = np.zeros((len(members),) + shape, np.float32)
        for i, k in enumerate(members):
            if k in natural:
                arr[i] = np.asarray(natural[k]).astype(np.float32)
        out[stack_key] = arr
    return out


def packed_labels(spec: PackSpec) -> dict[str, str]:
    """Optimizer group label for each slab/stack key (parsed from the key)."""
    out = {k: k.split(SLAB_MARK, 1)[1] for k in spec.slab_keys}
    out.update({k: k.split(STACK_MARK, 1)[1].rsplit(".", 1)[0]
                for k in spec.stack_keys})
    return out


# back-compat alias
slab_labels = packed_labels
