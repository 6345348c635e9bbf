"""SVD LoRA extraction correctness: rank-r reconstruction of the delta."""

import numpy as np

from scal_sdt_tpu.cli.extract_lora import lora_approx


def test_lora_approx_reconstructs_low_rank_delta():
    rng = np.random.RandomState(0)
    rank = 4
    # exactly rank-4 delta
    a = rng.randn(32, rank).astype(np.float32)
    b = rng.randn(rank, 24).astype(np.float32)
    delta = a @ b
    down, up = lora_approx(delta, rank)
    assert down.shape == (rank, 24)
    assert up.shape == (32, rank)
    np.testing.assert_allclose(up @ down, delta, rtol=1e-3, atol=1e-3)


def test_lora_approx_truncates_higher_rank():
    rng = np.random.RandomState(1)
    delta = rng.randn(16, 16).astype(np.float32)
    down, up = lora_approx(delta, 2)
    approx = up @ down
    # best rank-2 approximation error equals the tail singular values' energy
    s = np.linalg.svd(delta, compute_uv=False)
    err = np.linalg.norm(delta - approx)
    np.testing.assert_allclose(err, np.linalg.norm(s[2:]), rtol=1e-3)


def test_addnet_scaling_identity():
    """AddNet applies (alpha/rank) * up @ down; storing factors scaled by
    sqrt(rank/alpha) makes the product reproduce the delta."""
    rng = np.random.RandomState(2)
    rank, alpha = 4, 1.0
    delta = (rng.randn(8, rank) @ rng.randn(rank, 8)).astype(np.float32)
    down, up = lora_approx(delta, rank)
    scale = np.sqrt(rank / alpha)
    stored_down, stored_up = down * scale, up * scale
    reconstructed = (alpha / rank) * stored_up @ stored_down
    np.testing.assert_allclose(reconstructed, delta, rtol=1e-3, atol=1e-3)
