"""Tensor-parallel (Megatron-style) sharding over the UNet transformer blocks.

The reference has no TP of any kind (SURVEY.md §2.2 — Lightning DDP only);
this is a beyond-parity scaling capability: column-parallel q/k/v + GEGLU
in-projection, row-parallel out/FF-down projections, attention heads sharded
over the ``tensor`` mesh axis via shard_map (the construction that also makes
the Pallas splash kernel partitionable on real multi-chip meshes, where GSPMD
cannot split a custom call).

Everything here runs on the virtual 8-device CPU mesh (conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scal_sdt_tpu.parallel.mesh import (
    TENSOR_AXIS, make_mesh, param_sharding, set_active_mesh, shard_params,
    tp_dim, tp_param_names,
)


@pytest.fixture(autouse=True)
def _reset_active_mesh():
    yield
    set_active_mesh(None)


def test_tp_rules():
    # column-parallel: out dim (torch Linear (out, in))
    assert tp_dim("unet.down.attn1.to_q.weight", (64, 64), 2) == 0
    assert tp_dim("a.ff.net.0.proj.weight", (512, 64), 2) == 0
    # row-parallel: in dim
    assert tp_dim("a.attn2.to_out.0.weight", (64, 64), 2) == 1
    assert tp_dim("a.ff.net.2.weight", (64, 256), 2) == 1
    # biases, non-TP weights, odd dims, tp=1: replicated
    assert tp_dim("a.attn1.to_q.bias", (64,), 2) is None
    assert tp_dim("a.conv1.weight", (64, 64, 3, 3), 2) is None
    assert tp_dim("a.attn1.to_q.weight", (63, 64), 2) is None
    assert tp_dim("a.attn1.to_q.weight", (64, 64), 1) is None

    shapes = {"x.to_q.weight": np.zeros((8, 8)), "x.to_q.bias": np.zeros((8,))}
    assert tp_param_names(shapes, 2) == {"x.to_q.weight"}
    assert tp_param_names(shapes, 1) == set()


def test_param_sharding_tp_and_fsdp():
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    s = param_sharding(mesh, "u.attn1.to_q.weight", (8, 8))
    assert s.spec == jax.sharding.PartitionSpec("tensor", "fsdp")
    s = param_sharding(mesh, "u.ff.net.2.weight", (8, 32))
    assert s.spec[1] == "tensor" and s.spec[0] == "fsdp"
    # non-TP param keeps the plain fsdp rule
    s = param_sharding(mesh, "u.conv1.weight", (8, 8, 3, 3))
    assert "tensor" not in tuple(s.spec) and "fsdp" in tuple(s.spec)


def test_attention_shard_map_matches_unsharded():
    from scal_sdt_tpu.ops.attention import multi_head_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(4, 64, 16), jnp.float32)
    k = jnp.asarray(rng.randn(4, 77, 16), jnp.float32)
    v = jnp.asarray(rng.randn(4, 77, 16), jnp.float32)

    set_active_mesh(None)
    ref = np.asarray(multi_head_attention(q, k, v, num_heads=2))

    mesh = make_mesh(data=2, fsdp=1, tensor=2, devices=jax.devices()[:4])
    set_active_mesh(mesh)
    with mesh:
        out = np.asarray(multi_head_attention(q, k, v, num_heads=2))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)

    # indivisible heads (3) fall back cleanly: data axis still shards batch
    ref3 = None
    set_active_mesh(None)
    q3 = jnp.asarray(rng.randn(4, 64, 18), jnp.float32)
    k3 = jnp.asarray(rng.randn(4, 77, 18), jnp.float32)
    v3 = jnp.asarray(rng.randn(4, 77, 18), jnp.float32)
    ref3 = np.asarray(multi_head_attention(q3, k3, v3, num_heads=3))
    set_active_mesh(mesh)
    with mesh:
        out3 = np.asarray(multi_head_attention(q3, k3, v3, num_heads=3))
    np.testing.assert_allclose(out3, ref3, rtol=2e-5, atol=2e-6)


def _one_step(mesh_dims, host_trainable, host_frozen, batch_np, models,
              pack: bool):
    """One full train step on a (data, fsdp, tensor) mesh; returns
    (loss, global param norm)."""
    from scal_sdt_tpu.conf import Config, default, load_optim_target, merge
    from scal_sdt_tpu.parallel.mesh import batch_sharding
    from scal_sdt_tpu.training.optim_targets import group_labels, resolve_optim_target
    from scal_sdt_tpu.training.optimizers import build_optimizer
    from scal_sdt_tpu.training.packing import build_pack_spec
    from scal_sdt_tpu.training.packing import pack as pack_fn
    from scal_sdt_tpu.training.packing import packed_labels
    from scal_sdt_tpu.training.step import (
        StepSpec, init_train_state, make_train_step,
    )

    data, fsdp, tensor = mesh_dims
    config = merge(default(), Config({
        "batch_size": batch_np["latents"].shape[0],
        "trainer": {"precision": 32,
                    "mesh": {"data": data, "fsdp": fsdp, "tensor": tensor}},
        "optimizer": {
            "name": "adamw",
            "params": {"lr": 1e-3, "beta1": 0.9, "beta2": 0.999,
                       "weight_decay": 1e-2, "eps": 1e-8},
            "lr_scale": {"enabled": False},
        },
    }))
    resolutions = resolve_optim_target(load_optim_target("full_unet"),
                                       models.unet.keys(), models.clip.keys())
    labels = group_labels(resolutions)
    overrides = {f"g{i}": g.optimizer
                 for i, g in enumerate(resolutions["unet"].groups)}

    trainable = dict(host_trainable)
    pack_spec = None
    if pack:
        pack_spec = build_pack_spec(trainable, labels,
                                    exclude=tp_param_names(trainable, 2))
        if pack_spec.nontrivial:
            trainable = pack_fn(trainable, pack_spec, np_out=True)
            labels = {**{k: v for k, v in labels.items() if k in trainable},
                      **packed_labels(pack_spec)}
        else:
            pack_spec = None

    tx, lr_fn = build_optimizer(config, labels, overrides, 10, 1)
    spec = StepSpec.from_config(config, models.unet_config, models.clip_config,
                                models.vae_config, train_text_encoder=False)

    mesh = make_mesh(data=data, fsdp=fsdp, tensor=tensor,
                     devices=jax.devices()[:data * fsdp * tensor])
    set_active_mesh(mesh)
    step_fn = make_train_step(spec, tx, lr_fn, ema_enabled=False, donate=True,
                              pack_spec=pack_spec)
    with mesh:
        t_dev = shard_params(mesh, trainable)
        f_dev = shard_params(mesh, dict(host_frozen))
        state = init_train_state(jax.random.PRNGKey(0), t_dev, tx,
                                 ema_enabled=False, ema_decay=0.999)
        bs = batch_sharding(mesh)
        batch = {k: jax.device_put(v, bs) for k, v in batch_np.items()}
        state, metrics = step_fn(state, f_dev, batch)
        loss = float(np.asarray(metrics["train_loss"]))
        sq = sum(float(np.asarray(v).astype(np.float64).ravel()
                       @ np.asarray(v).astype(np.float64).ravel())
                 for v in state.trainable.values())
    return loss, float(np.sqrt(sq))


def test_tp_train_step_matches_single_device():
    """data=2 x tensor=2 (and x fsdp=2) reproduce the 1-device step: TP only
    changes reduction order, never the math."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import tiny_models

    from scal_sdt_tpu.training.step import UNET_PREFIX, TE_PREFIX, VAE_PREFIX

    models = tiny_models()
    host_trainable = {f"{UNET_PREFIX}.{k}": np.asarray(v, np.float32)
                      for k, v in models.unet.items()}
    assert tp_param_names(host_trainable, 2), "tiny UNet has no TP params?"
    host_frozen = {f"{TE_PREFIX}.{k}": np.asarray(v)
                   for k, v in models.clip.items()}
    host_frozen.update({f"{VAE_PREFIX}.{k}": np.asarray(v)
                        for k, v in models.vae.items()})

    rng = np.random.RandomState(0)
    batch_np = {
        "latents": rng.randn(4, 8, 8, 4).astype(np.float32),
        "conds": rng.randn(
            4, 77, models.unet_config.cross_attention_dim).astype(np.float32),
    }

    ref = _one_step((1, 1, 1), host_trainable, host_frozen, batch_np, models,
                    pack=True)
    tp = _one_step((2, 1, 2), host_trainable, host_frozen, batch_np, models,
                   pack=True)
    tp_fsdp = _one_step((2, 2, 2), host_trainable, host_frozen, batch_np,
                        models, pack=True)
    for name, got in (("data2xtp2", tp), ("data2xfsdp2xtp2", tp_fsdp)):
        np.testing.assert_allclose(got[0], ref[0], rtol=5e-5,
                                   err_msg=f"loss mismatch {name}")
        np.testing.assert_allclose(got[1], ref[1], rtol=5e-6,
                                   err_msg=f"param-norm mismatch {name}")
