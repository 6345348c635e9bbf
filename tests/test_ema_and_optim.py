"""EMA decay-warmup formula, LR scaling, and schedule semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from scal_sdt_tpu.conf import Config, default, merge
from scal_sdt_tpu.training.ema import ema_init, ema_update
from scal_sdt_tpu.training.optimizers import lr_scale_coeff
from scal_sdt_tpu.training.schedules import build_base_schedule, wrap_warmup


def test_ema_decay_warmup_formula():
    """decay_t = min(decay, (1+n)/(10+n)) — reference modules/ema.py:48-53."""
    params = {"w": jnp.asarray([1.0])}
    state = ema_init(params, decay=0.995)
    new_params = {"w": jnp.asarray([0.0])}

    state = ema_update(state, new_params)
    # n=1: decay = min(0.995, 2/11)
    d1 = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(state.shadow["w"]), [d1 * 1.0], rtol=1e-6)

    state = ema_update(state, new_params)
    d2 = 3.0 / 12.0
    np.testing.assert_allclose(np.asarray(state.shadow["w"]), [d1 * d2], rtol=1e-6)


def test_ema_shadow_does_not_alias_params():
    params = {"w": jnp.asarray([1.0, 2.0])}
    state = ema_init(params, 0.9)
    assert state.shadow["w"] is not params["w"]


def _config(lr_scale_enabled=True, method="sqrt", accumulate=1, batch=4):
    return merge(default(), Config({
        "batch_size": batch,
        "trainer": {"accumulate_grad_batches": accumulate},
        "optimizer": {"lr_scale": {"enabled": lr_scale_enabled, "method": method}},
    }))


def test_lr_scale_coeff_matches_reference():
    """coeff = accumulate * (per-process) batch * processes; sqrt or linear.

    The reference scales by its per-GPU batch * world size
    (modules/model.py:44-62); our batch_size is per-process so the world
    factor is process_count (ADVICE r1 medium)."""
    cfg = _config(True, "sqrt", accumulate=2, batch=4)
    assert lr_scale_coeff(cfg, num_processes=8) == np.sqrt(2 * 4 * 8)
    cfg = _config(True, "linear", accumulate=1, batch=2)
    assert lr_scale_coeff(cfg, num_processes=4) == 8
    cfg = _config(False)
    assert lr_scale_coeff(cfg, num_processes=8) == 1.0


def test_cosine_schedule_matches_torch_formula():
    # torch CosineAnnealingLR at fractional epochs with eta_min
    base_lr, eta_min, t_max = 2e-6, 2e-7, 100.0
    sched = build_base_schedule("torch.optim.lr_scheduler.CosineAnnealingLR",
                                {"T_max": t_max, "eta_min": eta_min},
                                steps_per_epoch=10, base_lr=base_lr)
    for step in [0, 250, 500, 1000]:
        epoch = step / 10
        expected = eta_min + (base_lr - eta_min) * (1 + np.cos(np.pi * epoch / t_max)) / 2
        got = float(sched(jnp.asarray(step))) * base_lr
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_warmup_ramps_from_init_lr():
    base_lr = 1e-3
    base = build_base_schedule("constant", {"factor": 1.0}, 10)
    sched = wrap_warmup(base, base_lr, init_lr=1e-6, num_warmup=100, strategy="linear")
    lr0 = float(sched(jnp.asarray(0))) * base_lr
    lr50 = float(sched(jnp.asarray(50))) * base_lr
    lr100 = float(sched(jnp.asarray(100))) * base_lr
    lr200 = float(sched(jnp.asarray(200))) * base_lr
    np.testing.assert_allclose(lr0, 1e-6, rtol=1e-5)
    assert 4e-4 < lr50 < 6e-4
    np.testing.assert_allclose(lr100, base_lr, rtol=1e-5)
    np.testing.assert_allclose(lr200, base_lr, rtol=1e-5)


def test_constant_warmup_strategy_is_implemented():
    """The reference's 'constant' branch is unreachable (warmup_lr.py:20-25
    tests 'cosine' twice); ours works."""
    base = build_base_schedule("constant", {}, 10)
    sched = wrap_warmup(base, 1.0, init_lr=0.1, num_warmup=10, strategy="constant")
    np.testing.assert_allclose(float(sched(jnp.asarray(5))), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(10))), 1.0, rtol=1e-6)


def test_lion_and_adafactor_reduce_loss():
    """New optimizer families (lion / adafactor) actually optimize, and
    adafactor's state is factored (no full second-moment buffer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.training.optimizers import build_optimizer

    params = {"w": jnp.asarray(np.random.RandomState(0).randn(16, 16), jnp.float32)}
    target = jnp.zeros((16, 16), jnp.float32)

    for name in ("lion", "adafactor", "lion_pytorch.Lion",
                 "transformers.optimization.Adafactor"):
        cfg = merge(default(), Config({
            "batch_size": 1,
            "optimizer": {"name": name,
                          "params": {"lr": 1e-2, "beta1": 0.9, "beta2": 0.99,
                                     "weight_decay": 1e-2, "eps": 1e-8},
                          "lr_scale": {"enabled": False}},
        }))
        tx, lr_fn = build_optimizer(cfg, {"w": "g"}, {}, steps_per_epoch=10,
                                    num_processes=1)
        state = tx.init(params)
        p = dict(params)
        loss = lambda pp: jnp.mean((pp["w"] - target) ** 2)
        l0 = float(loss(p))
        for _ in range(20):
            g = jax.grad(loss)(p)
            up, state = tx.update(g, state, p)
            p = jax.tree.map(lambda a, b: a + b, p, up)
        assert float(loss(p)) < l0 * 0.9, name

    # factored: adafactor state for a (256,256) matrix stores 256-vectors,
    # not a full (256,256) second-moment buffer (optax factors dims >= 128)
    cfg = merge(default(), Config({
        "batch_size": 1,
        "optimizer": {"name": "adafactor", "params": {"lr": 1e-2},
                      "lr_scale": {"enabled": False}},
    }))
    tx, _ = build_optimizer(cfg, {"w": "g"}, {}, 10, 1)
    big = {"w": jnp.zeros((256, 256), jnp.float32)}
    leaves = jax.tree.leaves(tx.init(big))
    assert all(l.size <= 256 for l in leaves if hasattr(l, "size"))


def test_prodigy_and_dadapt_reduce_loss():
    """Learning-rate-free optimizers (prodigy / D-adapt AdamW) optimize a
    quadratic from lr=1.0 (the community convention), and the prodigyopt
    hparam names (d0/d_coef/safeguard_warmup) are accepted."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.training.optimizers import build_optimizer

    params = {"w": jnp.asarray(np.random.RandomState(0).randn(16, 16), jnp.float32)}
    target = jnp.zeros((16, 16), jnp.float32)

    for name, extra in (("prodigy", {"d0": 1e-4, "d_coef": 1.0,
                                     "safeguard_warmup": True}),
                        ("prodigyopt.Prodigy", {}),
                        ("dadaptation.DAdaptAdam", {"d0": 1e-4})):
        cfg = merge(default(), Config({
            "batch_size": 1,
            "optimizer": {"name": name,
                          "params": {"lr": 1.0, "beta1": 0.9, "beta2": 0.99,
                                     "weight_decay": 1e-2, "eps": 1e-8, **extra},
                          "lr_scale": {"enabled": False}},
        }))
        tx, _ = build_optimizer(cfg, {"w": "g"}, {}, steps_per_epoch=10,
                                num_processes=1)
        state = tx.init(params)
        p = dict(params)
        loss = lambda pp: jnp.mean((pp["w"] - target) ** 2)
        l0 = float(loss(p))

        @jax.jit
        def step(p, state):
            g = jax.grad(loss)(p)
            up, state = tx.update(g, state, p)
            return jax.tree.map(lambda a, b: a + b, p, up), state

        # d (the adapted lr) ramps multiplicatively from d0; give it room
        for _ in range(300):
            p, state = step(p, state)
        assert float(loss(p)) < l0 * 0.5, name


def test_stochastic_round_bf16_is_unbiased():
    """E[SR(x)] == x, and SR lands only on the two bracketing bf16 values."""
    from scal_sdt_tpu.training.ema import stochastic_round_bf16

    x = jnp.full((20000,), 1.0 + 1e-3, jnp.float32)  # between bf16 ulps
    out = stochastic_round_bf16(x, jax.random.PRNGKey(0))
    vals = np.unique(np.asarray(out, np.float32))
    lo, hi = np.float32(np.asarray(jnp.asarray(1.0 + 1e-3, jnp.bfloat16))), None
    assert len(vals) == 2, vals  # the two neighbors only
    mean = float(np.asarray(out, np.float32).mean())
    # 20k draws: stderr of the mean ~ ulp/sqrt(N) ~ 5.5e-5
    np.testing.assert_allclose(mean, 1.0 + 1e-3, atol=3e-4)
    # exact bf16 values pass through deterministically
    exact = jnp.asarray([0.5, -2.0, 0.0, 3.0], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(stochastic_round_bf16(exact, jax.random.PRNGKey(1)),
                   np.float32), np.asarray(exact))


def test_bf16_sr_ema_tracks_fp32_ema():
    """The deterministic bf16 truncation freezes (delta << ulp); SR tracks.

    This is the property that makes ema.dtype: bf16 usable at decay 0.9999.
    """
    rng = np.random.RandomState(0)
    p0 = rng.randn(4096).astype(np.float32)
    drift = 0.02 * rng.randn(4096).astype(np.float32)

    f32 = ema_init({"w": jnp.asarray(p0)}, decay=0.999)
    b16 = ema_init({"w": jnp.asarray(p0)}, decay=0.999, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(42)

    @jax.jit
    def step(f32, b16, params, key):
        key, k = jax.random.split(key)
        return ema_update(f32, params), ema_update(b16, params, rng=k), key

    params = p0
    for i in range(400):
        params = params + drift * 0.01
        f32, b16, key = step(f32, b16, {"w": jnp.asarray(params)}, key)

    ref = np.asarray(f32.shadow["w"])
    got = np.asarray(b16.shadow["w"], np.float32)
    # SR noise is ~ulp-scale per element; the tracking error must be small
    # relative to how far the EMA actually moved from p0
    moved = np.abs(ref - p0).mean()
    assert moved > 1e-4  # the EMA did move
    err = np.abs(got - ref).mean()
    assert err < 0.02 * np.abs(ref).mean() + 3e-3, (err, moved)


def test_bf16_ema_requires_rng():
    state = ema_init({"w": jnp.ones((4,))}, decay=0.9, dtype=jnp.bfloat16)
    try:
        ema_update(state, {"w": jnp.zeros((4,))})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_init_train_state_ema_dtype_wiring():
    import optax

    from scal_sdt_tpu.training.step import UNET_PREFIX, init_train_state

    trainable = {f"{UNET_PREFIX}.w": jnp.ones((8, 8), jnp.float32)}
    tx = optax.adamw(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), dict(trainable), tx,
                             ema_enabled=True, ema_decay=0.9999,
                             ema_dtype=jnp.bfloat16)
    assert state.ema.shadow[f"{UNET_PREFIX}.w"].dtype == jnp.bfloat16
    # masters stay fp32
    assert state.trainable[f"{UNET_PREFIX}.w"].dtype == jnp.float32
