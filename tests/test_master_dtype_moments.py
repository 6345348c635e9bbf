"""bf16 masters must not degrade Adam moment precision (ADVICE r4, high).

With ``optimizer.master_dtype: bf16`` the trainable params handed to optax
are bf16; plain ``optax.scale_by_adam`` infers BOTH moment dtypes from the
params, so mu/nu would be stored and accumulated in bf16 — the
``(1-b2)*g^2`` increment (~1e-3 relative) is below the bf16 ulp (~3.9e-3)
and the second moment silently stops tracking after a few hundred steps.
``build_optimizer`` must therefore route reduced-master AdamW through the
explicit-dtype path (fp32 math, fp32 storage by default).

Reference behavior being protected: the torch reference keeps fp32 Adam
state unconditionally (torch.optim.AdamW default; /root/reference/
modules/model.py:33-64 never touches moment dtypes).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _build(master_dtype: str, moment_dtype=None):
    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.training.optimizers import build_optimizer

    opt = {"name": "adamw",
           "params": {"lr": 1e-3, "beta1": 0.9, "beta2": 0.999,
                      "weight_decay": 0.0, "eps": 1e-8},
           "lr_scale": {"enabled": False},
           "master_dtype": master_dtype}
    if moment_dtype is not None:
        opt["moment_dtype"] = moment_dtype
    cfg = merge(default(), Config({"batch_size": 1, "optimizer": opt}))
    tx, _ = build_optimizer(cfg, {"w": "g"}, {}, steps_per_epoch=10,
                            num_processes=1)
    return tx


def _nu_leaves(state):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        if any(getattr(p, "name", None) == "nu" for p in path):
            out.append(leaf)
    assert out, "no nu leaf found in optimizer state"
    return out


def _run_nu(tx, params, grad, n_steps: int):
    state = tx.init(params)

    def body(i, state):
        _, state = tx.update(grad, state, params)
        return state

    state = jax.jit(lambda s: jax.lax.fori_loop(0, n_steps, body, s))(state)
    return _nu_leaves(state)


def test_bf16_masters_track_second_moment_long_horizon():
    """2000 constant-gradient steps: nu must reach (1-b2^k)*g^2 like the
    fp32-master chain does. The bf16-accumulation bug stalls nu at ~25% of
    that (increment falls below the bf16 ulp once nu grows)."""
    # gradient magnitude exactly representable in bf16 so both runs see the
    # same numeric value
    g_val = 2.0 ** -7
    n = 2000
    b2 = 0.999

    p32 = {"w": jnp.full((64,), 0.5, jnp.float32)}
    g32 = {"w": jnp.full((64,), g_val, jnp.float32)}
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p32)
    g16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), g32)

    nu_ref = _run_nu(_build("fp32"), p32, g32, n)[0]
    nu_red = _run_nu(_build("bf16"), p16, g16, n)[0]

    # storage must be fp32 even though params are bf16
    assert nu_red.dtype == jnp.float32

    expected = (1.0 - b2 ** n) * g_val ** 2
    np.testing.assert_allclose(np.asarray(nu_ref), expected, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nu_red), np.asarray(nu_ref),
                               rtol=1e-3)


def test_bf16_masters_with_explicit_bf16_moments_still_track():
    """moment_dtype: bf16 + master_dtype: bf16 — storage is bf16 (the user
    asked for it) but ACCUMULATION must run in fp32
    (scale_by_adam_low_memory contract), so nu still tracks to within bf16
    rounding of the fp32 target rather than stalling at ~25%."""
    g_val = 2.0 ** -7
    n = 2000
    b2 = 0.999

    p16 = {"w": jnp.full((64,), 0.5, jnp.bfloat16)}
    g16 = {"w": jnp.full((64,), g_val, jnp.bfloat16)}

    nu = _run_nu(_build("bf16", moment_dtype="bf16"), p16, g16, n)[0]
    assert nu.dtype == jnp.bfloat16

    expected = (1.0 - b2 ** n) * g_val ** 2
    nu32 = np.asarray(nu, np.float32)
    # the SR store is unbiased but per-element noisy (~±5%); check the mean
    # tightly (unbiasedness) and each element loosely — the stalled
    # accumulation (pre-fix) sat at ~29% of target, far outside both bands
    np.testing.assert_allclose(nu32.mean(), expected, rtol=0.02)
    np.testing.assert_allclose(nu32, expected, rtol=0.2)


def test_lion_bf16_masters_momentum_is_fp32():
    """Lion with reduced masters pins its momentum to fp32 (same ulp
    hazard, one buffer)."""
    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.training.optimizers import build_optimizer

    cfg = merge(default(), Config({
        "batch_size": 1,
        "optimizer": {"name": "lion",
                      "params": {"lr": 1e-4, "beta1": 0.9, "beta2": 0.99,
                                 "weight_decay": 0.0},
                      "lr_scale": {"enabled": False},
                      "master_dtype": "bf16"},
    }))
    tx, _ = build_optimizer(cfg, {"w": "g"}, {}, 10, 1)
    p16 = {"w": jnp.zeros((8,), jnp.bfloat16)}
    state = tx.init(p16)
    mu = [leaf for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]
          if any(getattr(p, "name", None) == "mu" for p in path)]
    assert mu and all(m.dtype == jnp.float32 for m in mu)


def test_mixed_moments_mu_bf16_nu_fp32_exact():
    """moment_dtype: mixed — mu stored bf16, nu stored fp32 with EXACT
    fp32 tracking (no SR noise): the headline memory mode."""
    g_val = 2.0 ** -7
    n = 2000
    b2 = 0.999

    p32 = {"w": jnp.full((64,), 0.5, jnp.float32)}
    g32 = {"w": jnp.full((64,), g_val, jnp.float32)}
    tx = _build("fp32", moment_dtype="mixed")
    state = tx.init(p32)
    mu0 = [l for pth, l in jax.tree_util.tree_flatten_with_path(state)[0]
           if any(getattr(p, "name", None) == "mu" for p in pth)][0]
    assert mu0.dtype == jnp.bfloat16
    nu = _run_nu(tx, p32, g32, n)[0]
    assert nu.dtype == jnp.float32
    expected = (1.0 - b2 ** n) * g_val ** 2
    np.testing.assert_allclose(np.asarray(nu), expected, rtol=1e-4)
