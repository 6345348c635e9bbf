"""Int8 Adam: quantization round-trip + convergence close to fp32 Adam."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from scal_sdt_tpu.training.quantized import _dequantize, _quantize, scale_by_adam_8bit


def test_quantize_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(37, 53).astype(np.float32))  # non-multiple of block
    q, s = _quantize(x)
    back = _dequantize(q, s, x.shape)
    # blockwise absmax int8: error <= scale/2 per element
    err = np.abs(np.asarray(back - x))
    tol = np.abs(np.asarray(x)).max() / 127.0
    assert err.max() <= tol + 1e-7
    assert q.dtype == jnp.int8


def test_adam8bit_close_to_fp32_adam_on_quadratic():
    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"] - 3.0)) + jnp.sum(jnp.square(p["b"] + 1.0))

    # w: 2-D above min_8bit_size -> int8 blockwise; b: 1-D -> fp32 moments
    params8 = {"w": jnp.zeros((30, 300)), "b": jnp.zeros((300,))}
    params32 = jax.tree.map(jnp.copy, params8)

    tx8 = optax.chain(scale_by_adam_8bit(min_8bit_size=1), optax.scale(-0.05))
    tx32 = optax.chain(optax.scale_by_adam(), optax.scale(-0.05))
    s8, s32 = tx8.init(params8), tx32.init(params32)

    for _ in range(60):
        g8 = jax.grad(loss_fn)(params8)
        u8, s8 = tx8.update(g8, s8, params8)
        params8 = optax.apply_updates(params8, u8)

        g32 = jax.grad(loss_fn)(params32)
        u32, s32 = tx32.update(g32, s32, params32)
        params32 = optax.apply_updates(params32, u32)

    l8 = float(loss_fn(params8))
    l32 = float(loss_fn(params32))
    assert l8 < 0.1 * float(loss_fn({"w": jnp.zeros((30, 300)), "b": jnp.zeros((300,))}))
    # within the same ballpark as fp32 adam
    assert l8 < max(4 * l32, 1.0)


def test_adam8bit_state_memory_is_int8():
    params = {"w": jnp.zeros((1024, 512)), "b": jnp.zeros((100,))}
    tx = scale_by_adam_8bit(min_8bit_size=1 << 18)
    state = tx.init(params)
    # w (512K elems) stores int8 payload + scales; b stays fp32
    # (bitsandbytes min_8bit_size semantics: small tensors use fp32 Adam)
    assert state.mu_q["w"].dtype == jnp.int8
    assert state.nu_q["w"].dtype == jnp.int8
    assert state.mu_q["b"].dtype == jnp.float32
    assert "b" not in state.mu_s
    payload_bytes = sum(v.size * v.dtype.itemsize for v in state.mu_q.values()) + \
        sum(v.size * v.dtype.itemsize for v in state.nu_q.values())
    scale_bytes = 4 * (sum(v.size for v in state.mu_s.values()) +
                       sum(v.size for v in state.nu_s.values()))
    fp32_bytes = 2 * 4 * sum(p.size for p in params.values())
    assert payload_bytes + scale_bytes < 0.3 * fp32_bytes


def test_leaf_view_splits_stacked_shapes():
    """Packed (N, *shape) stacks (training/packing.py) must merge enough
    leading dims that n_blocks fits the fused kernel's 128-wide scale
    panel; natural leaves keep their historical split."""
    from scal_sdt_tpu.training.quantized import _leaf_view

    # natural leaves: split at dim 1, as always
    assert _leaf_view((1280, 1280)) == (1280, 1280, 5)
    assert _leaf_view((1280, 2560, 3, 3)) == (1280, 23040, 90)
    assert _leaf_view((49408, 768)) == (49408, 768, 3)
    # stacks: trailing product > 128*256 merges deeper
    assert _leaf_view((49, 1280, 1280)) == (49 * 1280, 1280, 5)
    assert _leaf_view((20, 1280, 1280, 3, 3)) == (20 * 1280, 11520, 45)
    # 1-D and short-minor flattening unchanged
    assert _leaf_view((300,)) == (1, 300, 2)
    assert _leaf_view((64, 100)) == (1, 6400, 25)


def test_adam8bit_small_leaf_fp32_matches_plain_adam():
    """Sub-threshold leaves must follow optax.scale_by_adam exactly."""
    rng = np.random.RandomState(3)
    params = {"b": jnp.asarray(rng.randn(64).astype(np.float32))}
    tx8 = scale_by_adam_8bit()          # default threshold >> 64 elems
    tx32 = optax.scale_by_adam(eps=1e-8)
    s8, s32 = tx8.init(params), tx32.init(params)
    for i in range(5):
        g = {"b": jnp.asarray(rng.randn(64).astype(np.float32))}
        u8, s8 = tx8.update(g, s8)
        u32, s32 = tx32.update(g, s32)
        np.testing.assert_allclose(np.asarray(u8["b"]), np.asarray(u32["b"]),
                                   rtol=1e-5, atol=1e-6)
