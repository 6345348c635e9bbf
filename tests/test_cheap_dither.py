"""Statistical quality of the counter-hash SR dither (training/ema.py).

The r4 SR sites drew 16 hardware-RNG bits per element per step (~27 ms/step
over the 859M-param set); the counter-hash dither replaces the draw with
~7 fused VPU ops. These tests pin the properties stochastic rounding
actually needs: per-element uniformity, step-to-step decorrelation, SR
unbiasedness, and the exact-no-op guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scal_sdt_tpu.training.ema import (cheap_dither_u16,
                                       stochastic_round_bf16_cheap)


def test_dither_uniform_per_step():
    """Mean ~ 2^15, and a 16-bin histogram is flat to a few percent."""
    d = np.asarray(cheap_dither_u16((1 << 16,), jnp.asarray(7), 0x1234),
                   np.float64)
    assert abs(d.mean() - 32767.5) < 32767.5 * 0.01
    hist, _ = np.histogram(d, bins=16, range=(0, 65536))
    expected = (1 << 16) / 16
    assert np.all(np.abs(hist - expected) < expected * 0.05), hist


def test_dither_decorrelated_across_steps_and_salts():
    n = 1 << 14
    a = np.asarray(cheap_dither_u16((n,), jnp.asarray(1), 0xAB), np.float64)
    b = np.asarray(cheap_dither_u16((n,), jnp.asarray(2), 0xAB), np.float64)
    c = np.asarray(cheap_dither_u16((n,), jnp.asarray(1), 0xAC), np.float64)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.03
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.03
    # deterministic: same (step, salt) reproduces exactly
    a2 = np.asarray(cheap_dither_u16((n,), jnp.asarray(1), 0xAB))
    np.testing.assert_array_equal(np.asarray(a, np.uint16), a2)


def test_sr_cheap_unbiased_over_steps():
    """E over steps of SR(x) == x for x strictly between two bf16 values —
    the property that keeps bf16 masters/EMA/nu tracking their fp32
    trajectories."""
    lo = np.float32(1.0)
    hi = np.float32(float(jnp.nextafter(jnp.bfloat16(1.0), jnp.bfloat16(2.0))))
    frac = 0.3
    x = jnp.full((4096,), lo + frac * (hi - lo), jnp.float32)
    acc = np.zeros(4096, np.float64)
    steps = 400
    for t in range(steps):
        acc += np.asarray(stochastic_round_bf16_cheap(x, jnp.asarray(t), 0x77),
                          np.float64)
    mean = acc / steps
    # each sample is lo or hi; the mean must approach lo + frac*(hi-lo)
    est_frac = (mean.mean() - lo) / (hi - lo)
    assert abs(est_frac - frac) < 0.03, est_frac


def test_sr_cheap_exact_value_is_noop():
    """A value already representable in bf16 passes through unchanged at
    every step (the SR-of-zero-update exactness guarantee)."""
    exact = jnp.asarray(np.float32(np.asarray(
        jnp.asarray([0.5, -1.25, 3.0, 0.0078125], jnp.bfloat16), np.float32)))
    for t in (0, 1, 12345):
        out = stochastic_round_bf16_cheap(exact, jnp.asarray(t), 0x99)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(exact))


def test_ema_update_step_dither_tracks_fp32():
    """bf16 EMA via the step-dither path tracks the fp32 EMA over many
    updates (the e2e property the hw-RNG path had)."""
    from scal_sdt_tpu.training.ema import ema_init, ema_update

    rs = np.random.RandomState(0)
    p0 = {"w": jnp.asarray(rs.randn(512), jnp.float32)}
    f32 = ema_init(p0, decay=0.999, dtype=jnp.float32)
    b16 = ema_init(p0, decay=0.999, dtype=jnp.bfloat16)

    @jax.jit
    def one(f32, b16, params, t):
        return (ema_update(f32, params),
                ema_update(b16, params, step=t))

    params = p0
    for t in range(300):
        params = {"w": params["w"] + 1e-3}
        f32, b16 = one(f32, b16, params, jnp.asarray(t))
    ref = np.asarray(f32.shadow["w"], np.float64)
    got = np.asarray(b16.shadow["w"], np.float64)
    # a deterministic bf16 truncation would freeze at p0 (drift ~0.3 versus
    # shadow movement ~0.26); SR must track within bf16-noise
    drift = np.abs(ref - np.asarray(p0["w"], np.float64)).mean()
    err = np.abs(got - ref).mean()
    assert drift > 0.1  # the EMA actually moved
    assert err < drift * 0.05, (err, drift)


def test_u32_halves_are_independent_streams():
    """The bf16-master step splits one u32 hash between the master-SR (high
    half) and EMA-SR (low half); both halves must be uniform and mutually
    decorrelated."""
    from scal_sdt_tpu.training.ema import cheap_dither_u32

    h = np.asarray(cheap_dither_u32((1 << 15,), jnp.asarray(9), 0x5A))
    hi = (h >> 16).astype(np.float64)
    lo = (h & 0xFFFF).astype(np.float64)
    for half in (hi, lo):
        assert abs(half.mean() - 32767.5) < 32767.5 * 0.02
    assert abs(np.corrcoef(hi, lo)[0, 1]) < 0.03


def test_u16_adjacent_elements_decorrelated():
    """Adjacent elements of a u16 dither stream must be uniform and
    decorrelated (guards any future low-cost hash variants)."""
    d = np.asarray(cheap_dither_u16((1 << 15,), jnp.asarray(3), 0x42),
                   np.float64)
    even, odd = d[::2], d[1::2]
    for half in (even, odd):
        assert abs(half.mean() - 32767.5) < 32767.5 * 0.02
    assert abs(np.corrcoef(even, odd)[0, 1]) < 0.03
    # odd-length shapes keep working
    assert cheap_dither_u16((7, 3), jnp.asarray(1), 0x1).shape == (7, 3)
