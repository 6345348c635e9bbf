"""Exponential moving average of trainable UNet params, on-device.

Reference: ``/root/reference/modules/ema.py`` with the trainer integration at
``modules/model.py:399-412``. The decay warmup is identical:
``decay_t = min(decay, (1 + n) / (10 + n))``. The torch version shuttles the
shadow copy CPU<->GPU around every step to save VRAM; on TPU the shadow lives
in HBM and updates inside the jitted train step — zero host traffic.

State is a plain pytree {shadow: Params, num_updates: int32 scalar} so it
shards/donates with the rest of the train state. Checkpoints store it under
``unet_ema.shadow_params.*`` exactly like the reference
(modules/model.py:388-389), so ``ckpt_tool prune --ema`` is format-compatible.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.functional import Params


class EMAState(NamedTuple):
    shadow: Params
    num_updates: jnp.ndarray  # int32 scalar
    decay: jnp.ndarray        # float32 scalar


def ema_init(params: Params, decay: float) -> EMAState:
    # copy=True: astype on an already-fp32 array would alias the trainable
    # buffer, and aliased buffers break jit donation (donated twice).
    return EMAState(
        shadow={k: jnp.array(v, jnp.float32, copy=True) for k, v in params.items()},
        num_updates=jnp.asarray(0, jnp.int32),
        decay=jnp.asarray(decay, jnp.float32),
    )


def ema_update(state: EMAState, params: Params) -> EMAState:
    n = state.num_updates + 1
    decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - decay
    shadow = {
        k: s - one_minus * (s - params[k].astype(s.dtype))
        for k, s in state.shadow.items()
    }
    return EMAState(shadow=shadow, num_updates=n, decay=state.decay)


def ema_state_dict(state: EMAState) -> dict:
    """Checkpoint layout matching the reference's EMA state dict
    (modules/ema.py:101-113)."""
    import numpy as np

    return {
        "decay": float(np.asarray(state.decay)),
        "num_updates": int(np.asarray(state.num_updates)),
        "shadow_params": {k: np.asarray(v) for k, v in state.shadow.items()},
    }


def ema_from_state_dict(d: dict) -> EMAState:
    return EMAState(
        shadow={k: jnp.asarray(v) for k, v in d["shadow_params"].items()},
        num_updates=jnp.asarray(int(d.get("num_updates", 0)), jnp.int32),
        decay=jnp.asarray(float(d["decay"]), jnp.float32),
    )
