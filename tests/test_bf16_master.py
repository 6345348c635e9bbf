"""bf16 masters with stochastic-rounded apply (optimizer.master_dtype: bf16).

Beyond-reference memory/bandwidth mode: masters live in bf16, the optimizer
update is added in fp32 and stochastically rounded back (training/step.py).
The critical property is NO FREEZING — the per-step update (~1e-6) is far
below the bf16 ulp (~1e-2 relative), so a round-to-nearest add would be an
exact no-op; SR keeps the EXPECTED param equal to the fp32 trajectory.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from helpers import make_image_dataset, tiny_config, tiny_models
from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.trainer import Trainer


def test_sr_apply_does_not_freeze():
    """Direct step-level check: a bf16 param receiving updates ~1000x below
    its ulp still drifts at the right average rate under SR, while a plain
    cast-add provably freezes."""
    import jax
    import jax.numpy as jnp

    from scal_sdt_tpu.training.ema import stochastic_round_bf16

    p0 = jnp.full((4096,), 1.0, jnp.bfloat16)   # ulp(1.0) = 2^-8 in bf16
    u = jnp.full((4096,), -1e-5, jnp.float32)   # ~400x below the ulp

    # plain cast-add freezes
    frozen = (p0 + u.astype(jnp.bfloat16)).astype(jnp.bfloat16)
    assert float(jnp.mean(frozen.astype(jnp.float32))) == 1.0

    # SR apply drifts by ~n*u in expectation
    p = p0
    key = jax.random.PRNGKey(0)
    n = 200
    for i in range(n):
        key, k = jax.random.split(key)
        p = stochastic_round_bf16(p.astype(jnp.float32) + u, k)
    drift = float(jnp.mean(p.astype(jnp.float32))) - 1.0
    expect = n * float(u[0])
    assert drift < 0, "SR apply froze"
    assert abs(drift - expect) < 0.5 * abs(expect), (drift, expect)


@pytest.mark.slow
def test_bf16_master_training_tracks_fp32(tmp_path):
    """8 steps of tiny-model training with bf16 masters tracks the fp32-
    master loss trajectory and produces a resumable checkpoint."""
    data = make_image_dataset(tmp_path / "data", n=4, size=(32, 32))

    def fit(master_dtype, out):
        cfg = tiny_config(data, tmp_path / out, **{
            "trainer": {"precision": "bf16", "mesh": {"data": 2, "fsdp": 4},
                        "max_epochs": 8},
            "optimizer": {"master_dtype": master_dtype},
        })
        tr = Trainer(cfg, tmp_path / out / "run", models=tiny_models(),
                     tokenizer=HashTokenizer())
        metrics = tr.fit(max_steps_override=8)
        return tr, metrics

    tr32, m32 = fit("fp32", "out32")
    tr16, m16 = fit("bf16", "out16")

    assert np.isfinite(m16["train_loss"])
    # same data/seed: trajectories must stay close (SR noise ~ bf16 ulp)
    assert abs(m16["train_loss"] - m32["train_loss"]) < 0.15, (m16, m32)

    # masters really are bf16 and moved from init
    some = next(iter(tr16.state.trainable.values()))
    assert str(some.dtype) == "bfloat16"

    # checkpoint written in natural names; resume restores bf16 leaves
    ckpts = list((tmp_path / "out16" / "run").glob("*.safetensors"))
    assert ckpts
    cfg = tiny_config(data, tmp_path / "out16", **{
        "trainer": {"precision": "bf16", "mesh": {"data": 2, "fsdp": 4}},
        "optimizer": {"master_dtype": "bf16"},
    })
    tr_resume = Trainer(cfg, tmp_path / "out16" / "run2", models=tiny_models(),
                        tokenizer=HashTokenizer())
    tr_resume.resume(ckpts[0])
    a = tr_resume.state.trainable
    b = tr16.state.trainable
    for k in b:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_sr_of_zero_update_is_exact_noop():
    """Gradient-accumulation interplay: on non-emit micro-steps the
    optimizer emits a ZERO update; adding 0 in fp32 to a bf16 param gives
    an exactly-representable value, so SR must return it bit-identically
    (no dither drift on accumulation steps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scal_sdt_tpu.training.ema import stochastic_round_bf16

    p = jax.random.normal(jax.random.PRNGKey(3), (4096,)).astype(jnp.bfloat16)
    out = stochastic_round_bf16(p.astype(jnp.float32) + jnp.zeros_like(
        p, jnp.float32), jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(p))


def test_bf16_master_with_bf16_ema_tracks_fp32_ema(tmp_path):
    """The recommended EMA config (master_dtype bf16 + ema.dtype bf16): the
    step shares one u32 counter-hash between the master-SR (high half) and
    the shadow-SR (low half). The resulting bf16 shadow must track the
    shadow of an fp32-master + fp32-EMA run of the same data/seed."""
    data = make_image_dataset(tmp_path / "data", n=4, size=(32, 32))

    def fit(master_dtype, ema_dtype, out):
        cfg = tiny_config(data, tmp_path / out, **{
            "trainer": {"precision": "bf16", "mesh": {"data": 2, "fsdp": 4},
                        "max_epochs": 8},
            "optimizer": {"master_dtype": master_dtype},
            "ema": {"enabled": True, "decay": 0.999, "dtype": ema_dtype},
        })
        tr = Trainer(cfg, tmp_path / out / "run", models=tiny_models(),
                     tokenizer=HashTokenizer())
        m = tr.fit(max_steps_override=8)
        return tr, m

    tr32, m32 = fit("fp32", "fp32", "ema32")
    tr16, m16 = fit("bf16", "bf16", "ema16")

    assert np.isfinite(m16["train_loss"])
    assert abs(m16["train_loss"] - m32["train_loss"]) < 0.15

    s32 = tr32.state.ema.shadow
    s16 = tr16.state.ema.shadow
    assert set(s32) == set(s16)
    ref = np.concatenate([np.asarray(v, np.float64).ravel()
                          for v in s32.values()])
    got = np.concatenate([np.asarray(v, np.float64).ravel()
                          for v in s16.values()])
    # shadows started equal and track within bf16 SR noise of the params'
    # own divergence scale
    denom = max(np.abs(ref).mean(), 1e-3)
    assert np.abs(got - ref).mean() < denom * 0.02, np.abs(got - ref).mean()
