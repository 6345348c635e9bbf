"""Checkpoint save/load + retention policy.

The reference's Lightning checkpoint contains ONLY trainable params plus the
EMA shadow (``/root/reference/modules/model.py:378-391``) — LoRA checkpoints
are KB-scale and full-model checkpoints omit the frozen VAE. We keep that
exact content model and key namespace in a framework-neutral form:

* ``<name>.safetensors`` — flat tensors: trainable params under
  ``unet.*`` / ``condition_model.encoder.*`` (torch layouts, so every ckpt
  tool and the reference's own key surgery applies verbatim), stored LoRA
  alphas, and the EMA shadow as ``unet_ema.shadow_params.<param>`` with
  decay/num_updates in the metadata;
* ``<name>.trainstate`` — msgpack (flax.serialization) of optimizer state,
  step and PRNG key for exact resume.

Retention mirrors the reference's ModelCheckpoint knobs
(``configs/README.md:41-53``): every_n_epochs / every_n_train_steps /
save_top_k / monitor / mode, with ``{epoch}`` / ``{step}`` / metric
templating in filenames.
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Any, Optional

import numpy as np

from ..utils.state import save_state_dict, load_state_dict, load_metadata
from .ema import EMAState, ema_from_state_dict
from .step import TrainState, UNET_PREFIX

logger = logging.getLogger("checkpoint")

EMA_PREFIX = "unet_ema.shadow_params."


def _to_host(x) -> np.ndarray:
    """Fetch a (possibly multi-host-sharded) array to host memory.

    On a single host every jax.Array is fully addressable and this is a plain
    ``np.asarray``. On multi-host pods with fsdp>1 the shards span
    non-addressable devices, so we gather the global value first — this makes
    the call a COLLECTIVE: every process must reach it (the reference's
    Lightning strategy gathers implicitly before rank-0 writes)."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def checkpoint_state_dict(state: TrainState, frozen: dict,
                          pack_spec=None) -> tuple[dict, dict]:
    """(flat tensors, metadata) for the tool-consumable checkpoint file.

    Collective on multi-host meshes: call from every process.

    ``pack_spec`` (training/packing.py): the in-memory trainable/EMA dicts
    may hold small leaves packed into slabs; the on-disk checkpoint always
    stores natural reference-layout names, so tools and the format stay
    unchanged."""
    from .packing import unpack_host

    tensors: dict[str, np.ndarray] = {}
    for k, v in unpack_host(
            {k: _to_host(v) for k, v in state.trainable.items()},
            pack_spec).items():
        tensors[k] = np.asarray(v)
    # stored LoRA alphas live in the frozen branch but belong in the ckpt
    # (reference registers them as buffers: modules/lora.py:24-26)
    for k, v in frozen.items():
        if k.endswith(".lora_alpha"):
            tensors[k] = _to_host(v)

    meta = {"step": int(np.asarray(state.step))}
    if state.ema is not None:
        shadow = unpack_host({k: _to_host(v) for k, v in state.ema.shadow.items()},
                             pack_spec)
        for k, v in shadow.items():
            # shadow keys are relative to the UNet, like torch named_parameters()
            rel = k[len(UNET_PREFIX) + 1:] if k.startswith(UNET_PREFIX + ".") else k
            tensors[EMA_PREFIX + rel] = np.asarray(v)
        meta["ema_decay"] = float(np.asarray(state.ema.decay))
        meta["ema_num_updates"] = int(np.asarray(state.ema.num_updates))
    return tensors, meta


def save_checkpoint(path: Path, state: TrainState, frozen: dict,
                    save_train_state: bool = True,
                    loop_state: Optional[dict] = None,
                    pack_spec=None,
                    extra_meta: Optional[dict] = None):
    """Gather (collectively) on every process; write from process 0 only.

    ``loop_state`` ({epoch, batch_in_epoch}) rides in the metadata so a
    resume can fast-forward the data pipeline mid-epoch (Lightning restores
    the loop the same way, /root/reference/train.py:134)."""
    import jax

    path = Path(path)
    tensors, meta = checkpoint_state_dict(state, frozen, pack_spec=pack_spec)
    if loop_state:
        meta.update({k: int(v) for k, v in loop_state.items()})
    if extra_meta:
        meta.update(extra_meta)

    host_extra = None
    if save_train_state:
        extra = {
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        }
        host_extra = jax.tree.map(_to_host, extra)

    if jax.process_index() != 0:
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    save_state_dict(tensors, path, metadata={"json": json.dumps(meta)})
    if host_extra is not None:
        from flax import serialization

        Path(str(path) + ".trainstate").write_bytes(
            serialization.to_bytes(host_extra))


def load_checkpoint_tensors(path: Path) -> tuple[dict, dict]:
    tensors = load_state_dict(path)
    md = load_metadata(path) or {}
    meta = json.loads(md.get("json", "{}"))
    return tensors, meta


def load_loop_state(path: Path) -> dict:
    """{epoch, batch_in_epoch} from the checkpoint metadata (None when the
    checkpoint predates loop-state persistence)."""
    md = load_metadata(path) or {}
    meta = json.loads(md.get("json", "{}"))
    return {"epoch": meta.get("epoch"),
            "batch_in_epoch": meta.get("batch_in_epoch")}


def split_checkpoint(tensors: dict, meta: dict) -> tuple[dict, Optional[dict]]:
    """-> (trainable_params, ema_state_dict or None)."""
    trainable = {k: v for k, v in tensors.items() if not k.startswith("unet_ema.")}
    shadow = {UNET_PREFIX + "." + k[len(EMA_PREFIX):]: v
              for k, v in tensors.items() if k.startswith(EMA_PREFIX)}
    ema = None
    if shadow:
        ema = {
            "decay": meta.get("ema_decay", 0.995),
            "num_updates": meta.get("ema_num_updates", 0),
            "shadow_params": shadow,
        }
    return trainable, ema


def restore_train_state(path: Path, template_state: TrainState,
                        pack_spec=None) -> TrainState:
    """Exact resume: tensors from the ckpt + opt/rng/step from .trainstate.

    Restored arrays are placed with the TEMPLATE's shardings — resuming onto
    different shardings would compile a different XLA program whose reduction
    order perturbs the trajectory at the last few ulps, breaking bit-exact
    resume parity. All placements ride in TWO pytree-level device_put calls:
    per-leaf calls each pay a dispatch round-trip (~0.5 s/op on
    remote-attached TPUs — 600+ leaves would stall resume for minutes)."""
    import jax
    from flax import serialization

    import jax.numpy as jnp

    tensors, meta = load_checkpoint_tensors(path)
    trainable_np, ema_sd = split_checkpoint(tensors, meta)
    n_file = len(trainable_np)

    trainable = dict(template_state.trainable)
    if pack_spec is not None:
        # on-disk names are natural; the live state keeps small leaves in
        # slabs — repack, backfilling partially-covered slabs from the
        # template's current (host-fetched) slab values
        from .packing import repack_host

        tmpl_slabs = {k: np.asarray(trainable[k])
                      for k in pack_spec.container_keys if k in trainable}
        trainable_np = repack_host(trainable_np, pack_spec, tmpl_slabs)
    # cast to the template's dtype: a bf16-master state (optimizer.
    # master_dtype: bf16) must not silently pick up fp32 leaves from an
    # old checkpoint (and vice versa) — the compiled step is dtype-exact
    sharded = {k: np.asarray(v).astype(trainable[k].dtype)
               for k, v in trainable_np.items()
               if k in trainable and isinstance(trainable[k], jax.Array)}
    put = jax.device_put(
        sharded, {k: trainable[k].sharding for k in sharded})
    loaded = 0
    for k in trainable:
        if k in sharded:
            trainable[k] = put[k]
            loaded += 1
        elif k in trainable_np:
            trainable[k] = jnp.asarray(trainable_np[k])
            loaded += 1
    logger.info(f"Restored {loaded}/{len(trainable)} trainable params "
                f"({n_file} tensors on disk)")

    ema = template_state.ema
    if ema is not None and ema_sd is not None:
        if pack_spec is not None:
            from .packing import repack_host

            tmpl_shadow = {k: np.asarray(v) for k, v in ema.shadow.items()
                           if k in pack_spec.container_keys}
            ema_sd = dict(ema_sd)
            ema_sd["shadow_params"] = repack_host(
                ema_sd["shadow_params"], pack_spec, tmpl_shadow)
        ema = ema_from_state_dict(ema_sd)

    opt_state, rng, step = template_state.opt_state, template_state.rng, template_state.step
    ts_path = Path(str(path) + ".trainstate")
    if ts_path.exists():
        host_template = jax.tree.map(
            lambda x: np.asarray(x),
            {"opt_state": template_state.opt_state, "step": template_state.step,
             "rng": template_state.rng})
        restored = serialization.from_bytes(host_template, ts_path.read_bytes())
        tmpl_tree = {"opt_state": template_state.opt_state,
                     "step": template_state.step, "rng": template_state.rng}
        tmpl_leaves, treedef = jax.tree.flatten(tmpl_tree)
        rest_leaves = treedef.flatten_up_to(restored)
        shardings = [t.sharding if isinstance(t, jax.Array) else None
                     for t in tmpl_leaves]
        idx = [i for i, s in enumerate(shardings) if s is not None]
        put = jax.device_put([np.asarray(rest_leaves[i]) for i in idx],
                             [shardings[i] for i in idx])
        out_leaves = [jnp.asarray(v) for v in rest_leaves]
        for i, v in zip(idx, put):
            out_leaves[i] = v
        out = jax.tree.unflatten(treedef, out_leaves)
        opt_state, step, rng = out["opt_state"], out["step"], out["rng"]
        logger.info(f"Restored optimizer state at step {int(np.asarray(step))}")

    return TrainState(step=step, trainable=trainable, opt_state=opt_state,
                      ema=ema, rng=rng)


class CheckpointManager:
    """Filename templating + retention (reference ModelCheckpoint knobs).

    Best-k retention state is persisted to ``run_dir/retention.json`` so a
    resumed run keeps pruning pre-existing checkpoints (the reference relies
    on Lightning ModelCheckpoint's persisted best-k state restored from the
    ``.ckpt``; ``/root/reference/train.py:103``)."""

    def __init__(self, run_dir: Path, config):
        self.run_dir = Path(run_dir)
        self.filename = config.get("filename", "{epoch}-{train_loss:.2f}")
        self.auto_insert_metric_name = config.get("auto_insert_metric_name", True)
        self.every_n_epochs = config.get("every_n_epochs")
        self.every_n_train_steps = config.get("every_n_train_steps")
        self.save_top_k = config.get("save_top_k", -1)
        self.monitor = config.get("monitor")
        self.mode = config.get("mode", "min")
        self._saved: list[tuple[float, Path]] = self._load_retention()

    @property
    def _retention_path(self) -> Path:
        return self.run_dir / "retention.json"

    def _load_retention(self) -> list[tuple[float, Path]]:
        try:
            entries = json.loads(self._retention_path.read_text())
        except (FileNotFoundError, json.JSONDecodeError):
            return []
        # drop entries whose files were removed out-of-band
        return [(float(s), Path(p)) for s, p in entries if Path(p).exists()]

    def _store_retention(self):
        self._retention_path.parent.mkdir(parents=True, exist_ok=True)
        self._retention_path.write_text(
            json.dumps([[s, str(p)] for s, p in self._saved]))

    def _format_name(self, metrics: dict) -> str:
        name = self.filename

        def repl(m):
            key, fmt = m.group(1), m.group(2) or ""
            value = metrics.get(key, 0)
            prefix = f"{key}=" if self.auto_insert_metric_name else ""
            return prefix + format(value, fmt.lstrip(":")) if fmt else f"{prefix}{value}"

        return re.sub(r"\{([\w.]+)(:[^}]*)?\}", repl, name)

    def should_save(self, epoch_end: bool, step: int) -> bool:
        if self.every_n_train_steps:
            if step > 0 and step % int(self.every_n_train_steps) == 0:
                return True
        if epoch_end and self.every_n_epochs:
            return True  # epoch cadence checked by caller (epoch % n == 0)
        return False

    def save(self, state: TrainState, frozen: dict, metrics: dict,
             loop_state: Optional[dict] = None, pack_spec=None,
             extra_meta: Optional[dict] = None) -> Path:
        """Collective on multi-host meshes (gathers shards); writes, prunes
        and persists retention state on process 0 only."""
        import jax

        path = self.run_dir / (self._format_name(metrics) + ".safetensors")
        save_checkpoint(path, state, frozen, loop_state=loop_state,
                        pack_spec=pack_spec, extra_meta=extra_meta)
        if jax.process_index() != 0:
            return path
        logger.info(f"Saved checkpoint {path}")

        if self.monitor and self.save_top_k and self.save_top_k > 0:
            score = float(metrics.get(self.monitor, 0.0))
            self._saved.append((score, path))
            reverse = self.mode == "max"
            self._saved.sort(key=lambda t: t[0], reverse=reverse)
            while len(self._saved) > self.save_top_k:
                _, victim = self._saved.pop()
                victim.unlink(missing_ok=True)
                Path(str(victim) + ".trainstate").unlink(missing_ok=True)
                logger.info(f"Retention: removed {victim}")
            self._store_retention()
        return path
