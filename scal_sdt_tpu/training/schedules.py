"""LR schedules with torch-compatible semantics, jax-traceable.

The reference drives any torch scheduler by dotted name, stepped every
optimizer step with a *fractional epoch* ``global_step / steps_per_epoch``
(``/root/reference/modules/model.py:67-78,417-418``), optionally wrapped in a
warmup ramp from ``init_lr`` over N steps
(``/root/reference/modules/warmup_lr.py``). Here the equivalent is a pure
function ``step -> lr_multiplier`` (relative to the group's base lr) built
from jnp ops, so it can be closed over by the jitted train step through
``optax.scale_by_schedule``.

Torch dotted names are accepted as aliases so reference configs run
unmodified. (The reference's WarmupLR has a bug making the 'constant'
strategy unreachable — warmup_lr.py:20-25 tests 'cosine' twice; we implement
'constant' properly.)
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]  # step -> multiplier of base lr

_SCHEDULE_ALIASES = {
    "torch.optim.lr_scheduler.constantlr": "constant",
    "torch.optim.lr_scheduler.cosineannealinglr": "cosine",
    "torch.optim.lr_scheduler.linearlr": "linear",
    "constantlr": "constant",
    "cosineannealinglr": "cosine",
    "cosine_annealing": "cosine",
}


def _canonical(name: str) -> str:
    n = str(name).lower()
    return _SCHEDULE_ALIASES.get(n, n)


def build_base_schedule(name: str, params: dict, steps_per_epoch: int,
                        base_lr: float = 1.0) -> Schedule:
    """`params` uses the torch scheduler's kwargs; epochs may be fractional.

    ``base_lr`` converts absolute kwargs like ``eta_min`` into multipliers, so
    per-group schedules reproduce torch's per-group behaviour exactly.
    """
    name = _canonical(name)
    spe = float(max(steps_per_epoch, 1))

    if name == "constant":
        # torch ConstantLR defaults: the reference's default config invokes
        # ConstantLR with empty params {}, which holds lr/3 for the first 5
        # (fractional) epochs — reproduce that (ADVICE r1 low).
        factor = float(params.get("factor", 1.0 / 3))
        total_iters = float(params.get("total_iters", 5))

        def constant(step):
            epoch = step / spe
            return jnp.where(epoch < total_iters, factor, 1.0)

        return constant

    if name == "cosine":
        t_max = float(params.get("T_max", 1))
        eta_min = float(params.get("eta_min", 0.0))
        eta_frac = eta_min / base_lr if base_lr > 0 else 0.0

        def cosine(step):
            epoch = jnp.minimum(step / spe, t_max)
            # multiplier form of: eta_min + (base - eta_min)(1 + cos(pi e/T))/2
            cos_out = (1.0 + jnp.cos(np.pi * epoch / t_max)) / 2.0
            return eta_frac + (1.0 - eta_frac) * cos_out

        return cosine

    if name == "linear":
        start = float(params.get("start_factor", 1.0 / 3))
        end = float(params.get("end_factor", 1.0))
        total = float(params.get("total_iters", 5))

        def linear(step):
            epoch = jnp.minimum(step / spe, total)
            return start + (end - start) * (epoch / total)

        return linear

    raise ValueError(f"Unknown lr scheduler: {name}")


def wrap_warmup(base: Schedule, base_lr: float, init_lr: float,
                num_warmup: int, strategy: str) -> Schedule:
    """Ramp from min(init_lr, base_lr) to base_lr over `num_warmup` steps,
    then delegate to the base schedule with the warmup steps subtracted
    (reference WarmupLR.step: epoch - _warmup_last_epoch)."""
    start_mult = min(init_lr, base_lr) / base_lr if base_lr > 0 else 0.0
    nw = max(num_warmup, 1)

    def ramp(pct):
        if strategy == "linear":
            return start_mult + (1.0 - start_mult) * pct
        if strategy == "cosine":
            cos_out = jnp.cos(np.pi * pct) + 1.0
            return 1.0 + (start_mult - 1.0) / 2.0 * cos_out
        if strategy == "constant":
            return jnp.where(pct < 0.9999, start_mult, 1.0)
        raise ValueError(f"Unknown warmup strategy: {strategy}")

    def schedule(step):
        step = jnp.asarray(step)
        in_warmup = step <= num_warmup
        pct = jnp.minimum(step, nw) / nw
        after = base(jnp.maximum(step - num_warmup, 0))
        return jnp.where(in_warmup, ramp(pct), after)

    return schedule


def build_lr_schedule(optimizer_config, base_lr: float, steps_per_epoch: int) -> Schedule:
    """Full schedule from the `optimizer.lr_scheduler` config section."""
    sched_conf = optimizer_config.lr_scheduler
    base = build_base_schedule(sched_conf.name, dict(sched_conf.get("params", {})),
                               max(steps_per_epoch, 1), base_lr)
    warmup = sched_conf.get("warmup")
    if warmup is not None and warmup.get("enabled", False):
        base = wrap_warmup(base, base_lr,
                           float(warmup.get("init_lr", 7e-8)),
                           int(warmup.get("steps", 100)),
                           warmup.get("strategy", "linear"))
    return base
