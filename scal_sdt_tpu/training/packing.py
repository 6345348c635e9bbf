"""Small-parameter slab packing: kill per-leaf kernel-launch overhead.

Measured on the v5e chip (PERF_NOTES.md): the optimizer update program is
launch-bound, not traffic-bound — even a PLAIN optax Adam update over just
the 459 sub-2^18-element SD1.5 UNet leaves costs 20.4 ms (~44 us per fused
kernel, serialized), while their total traffic is ~30 MB (~0.05 ms). Every
per-leaf stage (cast, moment update, weight decay, apply, EMA) pays that
launch tax for every tiny bias/norm/projection leaf.

The TPU-native fix: store all small trainable leaves as ONE flat fp32 slab
per (component, optimizer-group) and keep them packed across the whole
train step. The optimizer, EMA, and apply then see a handful of 1-D leaves
(one kernel each) instead of hundreds. Big leaves (>= ``min_slab_size``
elements) stay in their natural shapes — packing them would hit the
multi-dim->1-D relayout pathology (13 ms per 29M-element conv leaf each
way, PERF_NOTES.md int8 saga) and they are traffic-bound anyway.

The forward pass consumes natural shapes, so the grad program unpacks the
slab with :func:`unpack` — a linear op with a custom VJP whose backward is
exactly one ravel+concat per slab (the slices are disjoint and complete),
instead of letting autodiff emit one pad-and-add per leaf.

Slab keys live INSIDE the component namespace (``unet.__slab__.<group>``)
so every existing prefix-based consumer — the EMA ``unet.`` filter, the
multi_transform label map, checkpoint namespacing — keeps working; the
checkpoint layer unpacks to natural reference-layout names on save and
repacks on restore, so on-disk formats are unchanged.

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
# Slab length is padded up so any fsdp axis size up to 1024 can shard it;
# the pad tail is zero-initialized and its gradient is structurally zero.
SLAB_PAD_MULTIPLE = 1024
# Leaves at or above this stay in natural shape: they are traffic-bound and
# multi-dim ravel would pay the tiled->linear relayout.
DEFAULT_MIN_SLAB_SIZE = 1 << 18


class LeafSlot(NamedTuple):
    key: str
    shape: tuple[int, ...]
    offset: int
    size: int


class PackSpec(NamedTuple):
    """Hashable (usable as a static jit arg): slabs is a tuple of
    (slab_key, padded_length, leaf slots); passthrough keys stay natural."""
    slabs: tuple[tuple[str, int, tuple[LeafSlot, ...]], ...]
    passthrough: tuple[str, ...]

    @property
    def packed_keys(self) -> set[str]:
        return {s.key for _, _, slots in self.slabs for s in slots}

    @property
    def slab_keys(self) -> tuple[str, ...]:
        return tuple(k for k, _, _ in self.slabs)


def _component_of(key: str) -> str:
    # first dotted segment: 'unet', 'condition_model', 'vae' — slab keys must
    # stay inside the component namespace for prefix-based consumers
    return key.split(".", 1)[0]


def build_pack_spec(shapes: dict[str, Any],
                    labels: Optional[dict[str, str]] = None,
                    min_slab_size: int = DEFAULT_MIN_SLAB_SIZE) -> PackSpec:
    """Group small float32 leaves into per-(component, group) slabs.

    `shapes`: key -> array or ShapeDtypeStruct (``.shape``/``.dtype``).
    `labels`: key -> optimizer group label (slabs never span groups, so
    per-group lr/weight-decay stay exact). None -> single group.
    """
    groups: dict[str, list[tuple[str, tuple[int, ...], int]]] = {}
    passthrough: list[str] = []
    for key in sorted(shapes):
        v = shapes[key]
        size = int(np.prod(v.shape)) if v.shape else 1
        if (size >= min_slab_size or jnp.dtype(v.dtype) != jnp.float32):
            passthrough.append(key)
            continue
        label = labels.get(key, "default") if labels is not None else "default"
        slab_key = f"{_component_of(key)}{SLAB_MARK}{label}"
        groups.setdefault(slab_key, []).append((key, tuple(v.shape), size))

    slabs = []
    for slab_key in sorted(groups):
        leaves = groups[slab_key]
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
    return PackSpec(tuple(slabs), tuple(sorted(passthrough)))


def pack(params: dict, spec: PackSpec, np_out: bool = False) -> dict:
    """Natural per-leaf dict -> packed dict (slabs + passthrough leaves)."""
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
    return out


def _unpack_fwd(spec: PackSpec, packed: dict) -> dict:
    slab_keys = set(spec.slab_keys)
    out = {k: v for k, v in packed.items() if k not in slab_keys}
    for slab_key, _, slots in spec.slabs:
        slab = packed[slab_key]
        for s in slots:
            out[s.key] = jax.lax.slice(slab, (s.offset,),
                                       (s.offset + s.size,)).reshape(s.shape)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _unpack_vjp(spec: PackSpec, packed: dict) -> dict:
    return _unpack_fwd(spec, packed)


def _vjp_fwd(spec: PackSpec, packed: dict):
    # no residuals needed: the input structure is fully reconstructible
    # from the (static) spec plus the cotangent dict
    return _unpack_fwd(spec, packed), None


def _vjp_bwd(spec: PackSpec, _res, cots: dict):
    slot_keys = spec.packed_keys
    # passthrough cotangents map straight back to their input keys
    grads: dict = {k: v for k, v in cots.items() if k not in slot_keys}
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
    return (grads,)


_unpack_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def unpack(packed: dict, spec: Optional[PackSpec]) -> dict:
    """Packed dict -> natural per-leaf dict (differentiable; bwd = concat)."""
    if spec is None or not spec.slabs:
        return dict(packed)
    return _unpack_vjp(spec, packed)


def unpack_host(packed: dict, spec: Optional[PackSpec]) -> dict:
    """Host-side unpack (numpy views) for checkpoint/export boundaries."""
    if spec is None or not spec.slabs:
        return dict(packed)
    slab_keys = set(spec.slab_keys)
    out = {k: v for k, v in packed.items() if k not in slab_keys}
    for slab_key, _, slots in spec.slabs:
        if slab_key not in packed:
            continue
        slab = np.asarray(packed[slab_key])
        for s in slots:
            out[s.key] = slab[s.offset:s.offset + s.size].reshape(s.shape)
    return out


def repack_host(natural: dict, spec: Optional[PackSpec],
                template_slabs: Optional[dict] = None) -> dict:
    """Host-side pack for checkpoint restore.

    Slabs none of whose leaves appear in `natural` are omitted entirely
    (e.g. an EMA shadow that covers only the unet component). For partially
    covered slabs, missing slots fall back to `template_slabs[slab_key]`
    when given, else zero."""
    if spec is None or not spec.slabs:
        return dict(natural)
    packed_keys = spec.packed_keys
    out = {k: v for k, v in natural.items() if k not in packed_keys}
    for slab_key, padded, slots in spec.slabs:
        present = [s for s in slots if s.key in natural]
        if not present:
            continue
        if len(present) < len(slots) and template_slabs is not None \
                and slab_key in template_slabs:
            slab = np.asarray(template_slabs[slab_key]).astype(np.float32).copy()
        else:
            slab = np.zeros((padded,), np.float32)
        for s in present:
            slab[s.offset:s.offset + s.size] = \
                np.asarray(natural[s.key]).astype(np.float32).ravel()
        out[slab_key] = slab
    return out


def slab_labels(spec: PackSpec) -> dict[str, str]:
    """Optimizer group label for each slab key (parsed back out of the key)."""
    return {k: k.split(SLAB_MARK, 1)[1] for k in spec.slab_keys}
