"""Optimizer construction: per-group AdamW over the trainable flat param dict.

Replaces the reference's dotted-name torch optimizer instantiation with
param groups (``/root/reference/modules/model.py:33-64``). Frozen params are
never passed to the optimizer at all (they live in a separate branch of the
train state), so optimizer state is allocated for trainable keys only — the
pytree analogue of the reference's requires_grad partition, and what makes
LoRA runs take KB of optimizer HBM instead of GB.

Effective-batch LR scaling reproduces modules/model.py:44-62 in spirit:
the reference computes ``accumulate * batch_size * nodes * devices`` because
its batch_size is per-GPU. Here ``config.batch_size`` is per-*process* (the
pipeline delivers one such batch per process, sharded over the local data
axis), so the actual global batch is ``accumulate * batch_size *
process_count`` — that is the coefficient used ('sqrt' or 'linear'), group lr
multiplied by it and weight decay divided by it.

Optimizer names accept both our short names and the reference's torch /
bitsandbytes dotted names ('torch.optim.AdamW', 'bitsandbytes.optim.AdamW8bit'
— the latter maps to AdamW; second-moment quantization is a TPU-side option,
not a separate library).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..conf import Config
from .schedules import Schedule, build_lr_schedule

_ADAMW_NAMES = {"adamw", "torch.optim.adamw", "bitsandbytes.optim.adamw"}
_ADAMW_8BIT_NAMES = {"adamw8bit", "bitsandbytes.optim.adamw8bit"}
_ADAM_NAMES = {"adam", "torch.optim.adam"}
_SGD_NAMES = {"sgd", "torch.optim.sgd"}
_LION_NAMES = {"lion", "lion_pytorch.lion", "bitsandbytes.optim.lion"}
_ADAFACTOR_NAMES = {"adafactor", "transformers.optimization.adafactor"}
# D-adaptation family: learning-rate-free optimizers the SD community plugs
# into the reference via its dotted-name loader (modules/utils/activator.py:4-7)
_PRODIGY_NAMES = {"prodigy", "prodigyopt.prodigy"}
_DADAPT_NAMES = {"dadaptadam", "dadaptation.dadaptadam", "dadaptation.dadaptadamw",
                 "dadaptation.experimental.dadaptadamw"}


def lr_scale_coeff(config: Config, num_processes: int) -> float:
    """Effective-batch LR scaling coefficient (reference modules/model.py:44-62).

    ``num_processes`` — not local device count — because batch_size is
    per-process here (see module docstring)."""
    lr_scale = config.optimizer.lr_scale
    if not lr_scale.get("enabled", False):
        return 1.0
    accumulate = int(config.trainer.get("accumulate_grad_batches", 1) or 1)
    coeff = accumulate * int(config.batch_size) * num_processes
    method = lr_scale.get("method", "sqrt")
    if method == "sqrt":
        return math.sqrt(coeff)
    if method == "linear":
        return float(coeff)
    raise ValueError(f"Unknown lr_scale.method: {method}")


def _base_hparams(config: Config) -> dict:
    p = dict(config.optimizer.get("params", {}))
    if "beta1" in p and "beta2" in p:
        p["betas"] = (float(p.pop("beta1")), float(p.pop("beta2")))
    p.setdefault("lr", 1e-3)
    p.setdefault("betas", (0.9, 0.999))
    p.setdefault("eps", 1e-8)
    p.setdefault("weight_decay", 1e-2)
    return p


def scale_by_adam_low_memory(b1: float, b2: float, eps: float,
                             moment_dtype,
                             nu_dtype=None) -> optax.GradientTransformation:
    """scale_by_adam with explicit moment STORAGE dtypes and fp32 moment math.

    Jobs:
    - ``moment_dtype=bf16``: both moments stored bf16 — saves 5.2 GB of
      optimizer HBM for SD1.5 full fine-tune, the margin that lets the
      no-remat batch-8 step fit a 16 GB chip.
    - ``moment_dtype=bf16, nu_dtype=fp32`` (config ``moment_dtype: mixed``):
      mu bf16, nu fp32 — half the moment saving (2.6 GB) at exactly zero
      step-time cost and exact fp32 nu (no SR needed). The headline config.
    - ``moment_dtype=fp32``: used whenever the masters are bf16
      (optimizer.master_dtype), where plain optax.scale_by_adam would infer
      bf16 moments from the params (ADVICE r4 high).

    Accumulation always runs in fp32. For sub-fp32 nu storage that alone is
    NOT enough: the per-step increment ``(1-b2)*g^2`` (~1e-3 relative) is
    below the bf16 ulp (~3.9e-3), so a round-to-nearest store rounds the
    increment away and nu stalls at ~1/4 of E[g^2] (measured:
    tests/test_master_dtype_moments.py). A sub-fp32 nu store therefore uses
    **stochastic rounding** (unbiased, same trick as the bf16 EMA shadow /
    bf16 masters, training/ema.py) with the counter-hash dither — fused
    VPU compute, deterministic in the step count, no RNG draw (~5 ms/step
    over SD1.5, the measured cost of the bf16-nu mode). mu needs no SR:
    its increment is ``(1-b1)=0.1`` of the gradient-vs-mu gap, far above
    the bf16 ulp, so round-to-nearest tracks (worst case a ~3% stall
    under a constant gradient; real gradients are noisy and clear the ulp
    every step).
    """
    import zlib

    import jax
    import jax.numpy as jnp

    if nu_dtype is None:
        nu_dtype = moment_dtype
    sub_fp32_nu = jnp.dtype(nu_dtype).itemsize < 4

    def init(params):
        def zeros(dt):
            return lambda p: (jnp.zeros_like(p, dtype=dt)
                              if hasattr(p, "shape") else p)

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros(moment_dtype), params),
            nu=jax.tree.map(zeros(nu_dtype), params),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        if sub_fp32_nu:
            from .ema import stochastic_round_bf16_cheap

        def upd(k, g, mu, nu):
            if not hasattr(g, "shape"):
                return g, mu, nu
            g32 = g.astype(jnp.float32)
            mu32 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
            nu32 = b2 * nu.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            out = (mu32 / bc1) / (jnp.sqrt(nu32 / bc2) + eps)
            if sub_fp32_nu:
                nu_store = stochastic_round_bf16_cheap(
                    nu32, count, zlib.crc32(k.encode()) ^ 0xE3A0003
                ).astype(nu_dtype)
            else:
                nu_store = nu32.astype(nu_dtype)
            return out, mu32.astype(moment_dtype), nu_store

        flat = {k: upd(k, updates[k], state.mu[k], state.nu[k]) for k in updates}
        new_updates = {k: v[0] for k, v in flat.items()}
        mu = {k: v[1] for k, v in flat.items()}
        nu = {k: v[2] for k, v in flat.items()}
        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def gradient_accumulation(inner: optax.GradientTransformation,
                          k: int) -> optax.GradientTransformation:
    """Accumulate k micro-step grads in fp32, apply `inner` every k-th step.

    Replaces optax.MultiSteps (used in round 1), which computes the full
    inner (Adam) update on EVERY micro-step and discards k-1 of them via
    jnp.where — here ``lax.cond`` skips that compute entirely on non-emit
    steps. Accumulation is an fp32 running sum regardless of gradient dtype
    (bf16 grads from the mixed-precision backward), averaged at emit — the
    reference accumulates fp32 grads (modules/model.py trainer
    accumulate_grad_batches), so precision matches.

    The inner transformation's own step count (scale_by_schedule, Adam bias
    correction) advances only on emit — i.e. schedules count OPTIMIZER steps,
    like the reference's per-optimizer-step scheduler
    (/root/reference/modules/model.py:417-418).
    """
    import jax
    from jax import lax

    def init(params):
        acc = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        return (jnp.zeros([], jnp.int32), inner.init(params), acc)

    def update(updates, state, params=None):
        mini, inner_state, acc = state
        acc = jax.tree.map(lambda a, g: a + g.astype(jnp.float32), acc, updates)
        emit = mini == (k - 1)

        def do_emit(args):
            inner_state, acc = args
            mean = jax.tree.map(lambda a: a / float(k), acc)
            out, new_inner = inner.update(mean, inner_state, params)
            zeros = jax.tree.map(jnp.zeros_like, acc)
            return out, new_inner, zeros

        def do_skip(args):
            inner_state, acc = args
            zeros_out = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                     acc)
            return zeros_out, inner_state, acc

        out, inner_state, acc = lax.cond(emit, do_emit, do_skip, (inner_state, acc))
        return out, ((mini + 1) % k, inner_state, acc)

    return optax.GradientTransformation(init, update)


def _add_decayed_weights_lowp(weight_decay: float) -> optax.GradientTransformation:
    """add_decayed_weights computed in the UPDATE's dtype, not the param dtype."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("add_decayed_weights requires params")

        def add(u, p):
            if not hasattr(u, "shape"):
                return u
            return u + (weight_decay * p).astype(u.dtype)

        return jax.tree.map(add, updates, params), state

    return optax.GradientTransformation(init, update)


def _adam_moment_dtype(moment_dtype: Optional[str], reduced_masters: bool):
    """Resolve Adam moment STORAGE dtypes -> (mu_dtype, nu_dtype), or None
    for plain scale_by_adam.

    optax.scale_by_adam infers both moment dtypes from the params — with
    bf16 masters (optimizer.master_dtype: bf16) that would store AND
    accumulate mu/nu in bf16, where the (1-b2)*g^2 increment (~1e-3
    relative) is below the bf16 ulp (~3.9e-3): the second moment silently
    stops tracking. So whenever masters are reduced we must take the
    explicit-dtype path (fp32 math, configured storage; default fp32
    storage), independent of moment_dtype.

    ``mixed`` = mu bf16 + nu fp32: half the moment memory saving at zero
    step-time cost (no nu SR dither needed)."""
    md = str(moment_dtype) if moment_dtype else None
    if md == "mixed":
        return (jnp.bfloat16, jnp.float32)
    if md and md != "fp32":
        from ..utils.state import DTYPE_MAP

        dt = jnp.bfloat16 if md == "bf16" else DTYPE_MAP[md]
        return (dt, dt)
    if reduced_masters:
        return (jnp.float32, jnp.float32)
    return None


def _group_transform(name: str, lr: float, betas: tuple[float, float], eps: float,
                     weight_decay: float, schedule: Schedule,
                     moment_dtype: Optional[str] = None,
                     extra: Optional[dict] = None,
                     reduced_masters: bool = False) -> optax.GradientTransformation:
    name = str(name).lower()
    extra = extra or {}
    parts = []
    if name in _ADAMW_NAMES:
        mdt = _adam_moment_dtype(moment_dtype, reduced_masters)
        if mdt is not None:
            parts.append(scale_by_adam_low_memory(betas[0], betas[1], eps,
                                                  mdt[0], nu_dtype=mdt[1]))
        else:
            parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
    elif name in _ADAMW_8BIT_NAMES:
        from .quantized import scale_by_adam_8bit

        parts.append(scale_by_adam_8bit(b1=betas[0], b2=betas[1], eps=eps))
        if weight_decay:
            # keep the chain in the update dtype (bf16): optax's
            # add_decayed_weights promotes to the param dtype (fp32), which
            # materializes an extra 3.4 GB on the 859M-param bench — the
            # difference between int8 mode fitting 16 GB or not. wd*p in
            # bf16 is far below the int8 moment quantization error.
            parts.append(_add_decayed_weights_lowp(weight_decay))
    elif name in _ADAM_NAMES:
        mdt = _adam_moment_dtype(moment_dtype, reduced_masters)
        if mdt is not None:
            parts.append(scale_by_adam_low_memory(betas[0], betas[1], eps,
                                                  mdt[0], nu_dtype=mdt[1]))
        else:
            parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    elif name in _LION_NAMES:
        # sign-based update with one momentum buffer (half of Adam's
        # optimizer HBM even at fp32); moment_dtype halves it again
        import jax.numpy as jnp

        mu_dtype = (jnp.bfloat16 if str(moment_dtype) in ("bf16", "mixed")
                    else None) if moment_dtype else None
        if mu_dtype is None and reduced_masters:
            # bf16 masters would otherwise give bf16 momentum storage+math
            # (optax infers from params); pin fp32 so accumulation tracks
            mu_dtype = jnp.float32
        parts.append(optax.scale_by_lion(b1=betas[0], b2=betas[1],
                                         mu_dtype=mu_dtype))
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
    elif name in _ADAFACTOR_NAMES:
        # factored second moment (rows+cols instead of a full buffer) —
        # near-zero optimizer HBM; the TPU-classic memory-saving optimizer
        parts.append(optax.scale_by_factored_rms(decay_rate=betas[1]))
        parts.append(optax.clip_by_block_rms(1.0))
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
    elif name in _PRODIGY_NAMES:
        # learning-rate-free (Mishchenko & Defazio, arXiv:2306.06101); the
        # community's prodigyopt.Prodigy hparam names map onto optax.contrib:
        # d0 -> estim_lr0, d_coef -> estim_lr_coef. Note the state carries a
        # copy of the initial params (params0) — negligible for LoRA, a full
        # param-size HBM cost for full fine-tunes.
        import optax.contrib as contrib

        parts.append(contrib.prodigy(
            learning_rate=lambda step: lr * schedule(step),
            betas=betas,
            beta3=(float(extra["beta3"]) if extra.get("beta3") is not None else None),
            eps=eps,
            estim_lr0=float(extra.get("d0", 1e-6)),
            estim_lr_coef=float(extra.get("d_coef", 1.0)),
            weight_decay=weight_decay,
            safeguard_warmup=bool(extra.get("safeguard_warmup", False))))
        return optax.chain(*parts)  # complete optimizer: lr/schedule/sign inside
    elif name in _DADAPT_NAMES:
        import optax.contrib as contrib

        parts.append(contrib.dadapt_adamw(
            learning_rate=lambda step: lr * schedule(step),
            betas=betas, eps=eps,
            estim_lr0=float(extra.get("d0", 1e-6)),
            weight_decay=weight_decay))
        return optax.chain(*parts)  # complete optimizer: lr/schedule/sign inside
    elif name in _SGD_NAMES:
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    parts.append(optax.scale_by_schedule(lambda step: -lr * schedule(step)))
    return optax.chain(*parts)


def build_optimizer(config: Config,
                    labels: dict[str, str],
                    group_overrides: dict[str, dict],
                    steps_per_epoch: int,
                    num_processes: int) -> tuple[optax.GradientTransformation, Callable]:
    """Build the full gradient transformation for the trainable flat dict.

    `labels`: trainable param key -> group label.
    `group_overrides`: group label -> per-group optimizer kwargs
    (from optim-target `optimizer:` nodes, reference modules/model.py:152-155).

    Returns (tx, lr_fn) where lr_fn(step) reports the first group's lr for
    logging (reference logs `lr` each step, modules/model.py:344-347).
    """
    base = _base_hparams(config)
    coeff = lr_scale_coeff(config, num_processes)
    moment_dtype = config.optimizer.get("moment_dtype")
    reduced_masters = str(config.optimizer.get("master_dtype", "fp32")) in (
        "bf16", "bfloat16")

    transforms = {}
    first_lr_fn: Optional[Callable] = None
    for label in sorted(set(labels.values()) | set(group_overrides)):
        over = dict(group_overrides.get(label, {}))
        lr = float(over.get("lr", base["lr"])) * coeff
        wd = float(over.get("weight_decay", base["weight_decay"])) / coeff
        schedule = build_lr_schedule(config.optimizer, lr, steps_per_epoch)
        extra = {k: v for k, v in base.items()
                 if k not in ("lr", "betas", "eps", "weight_decay")}
        transforms[label] = _group_transform(
            config.optimizer.name, lr, base["betas"], float(base["eps"]), wd, schedule,
            moment_dtype=moment_dtype, extra=extra,
            reduced_masters=reduced_masters)
        if first_lr_fn is None:
            def lr_fn(step, _lr=lr, _s=schedule):
                return _lr * _s(step)

            first_lr_fn = lr_fn

    tx = optax.multi_transform(transforms, lambda params: {k: labels[k] for k in params})

    accumulate = int(config.trainer.get("accumulate_grad_batches", 1) or 1)
    if accumulate > 1:
        tx = gradient_accumulation(tx, accumulate)
        # the applied schedule counts optimizer steps (see
        # gradient_accumulation); report the same thing for logging
        if first_lr_fn is not None:
            inner_lr_fn = first_lr_fn

            def first_lr_fn(step, _f=inner_lr_fn, _k=accumulate):
                return _f(step // _k)

    return tx, (first_lr_fn or (lambda step: jnp.asarray(0.0)))
