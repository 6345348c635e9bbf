"""Gradient accumulation correctness (VERDICT r1 weak #7).

- fp32 accumulation of bf16 micro-grads, equivalence to the fused batch
  (mean of micro-grads) at the update level;
- the LR schedule advances per OPTIMIZER step, not per micro-step
  (reference modules/model.py:417-418 steps the scheduler once per optimizer
  step);
- e2e: params move only on emit steps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scal_sdt_tpu.conf import Config, default, merge
from scal_sdt_tpu.training.optimizers import build_optimizer
from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.trainer import Trainer

from helpers import make_image_dataset, tiny_config, tiny_models


def _cfg(accumulate: int, schedule_name: str = "constant", schedule_params=None):
    return merge(default(), Config({
        "batch_size": 2,
        "trainer": {"accumulate_grad_batches": accumulate},
        "optimizer": {
            "name": "adamw",
            "params": {"lr": 1e-2, "beta1": 0.9, "beta2": 0.999,
                       "weight_decay": 0.0, "eps": 1e-8},
            "lr_scale": {"enabled": False},
            "lr_scheduler": {"name": schedule_name,
                             "params": schedule_params or {"factor": 1.0}},
        },
    }))


def _apply(tx, params, grads_list):
    state = tx.init(params)
    out = []
    for g in grads_list:
        updates, state = tx.update(g, state, params)
        params = {k: params[k] + updates[k] for k in params}
        out.append({k: np.asarray(v) for k, v in params.items()})
    return out


def test_accumulate_equals_fused_mean():
    params = {"unet.w": jnp.ones((4, 4), jnp.float32)}
    labels = {"unet.w": "g0"}
    rng = np.random.RandomState(0)
    g1 = {"unet.w": jnp.asarray(rng.randn(4, 4), jnp.bfloat16)}
    g2 = {"unet.w": jnp.asarray(rng.randn(4, 4), jnp.bfloat16)}

    tx_acc, _ = build_optimizer(_cfg(2), labels, {}, steps_per_epoch=10,
                                num_processes=1)
    acc_traj = _apply(tx_acc, dict(params), [g1, g2])

    fused = {"unet.w": (g1["unet.w"].astype(jnp.float32)
                        + g2["unet.w"].astype(jnp.float32)) / 2}
    tx_one, _ = build_optimizer(_cfg(1), labels, {}, steps_per_epoch=10,
                                num_processes=1)
    one_traj = _apply(tx_one, dict(params), [fused])

    # micro-step 1: no update at all
    np.testing.assert_array_equal(acc_traj[0]["unet.w"], np.ones((4, 4), np.float32))
    # emit step == the fused single step (fp32 accumulation, not bf16)
    np.testing.assert_allclose(acc_traj[1]["unet.w"], one_traj[0]["unet.w"],
                               rtol=1e-6, atol=1e-7)


def test_schedule_counts_optimizer_steps():
    """With a decaying schedule, k micro-steps must consume ONE schedule step."""
    params = {"unet.w": jnp.ones((2,), jnp.float32)}
    labels = {"unet.w": "g0"}
    g = {"unet.w": jnp.full((2,), 1.0, jnp.float32)}

    # cosine over 1 epoch of 1 step/epoch -> multiplier changes fast per step
    sched = {"T_max": 4.0}
    tx_acc, lr_acc = build_optimizer(_cfg(2, "cosine", sched), labels, {},
                                     steps_per_epoch=1, num_processes=1)
    tx_one, lr_one = build_optimizer(_cfg(1, "cosine", sched), labels, {},
                                     steps_per_epoch=1, num_processes=1)

    acc_traj = _apply(tx_acc, dict(params), [g, g, g, g])   # 2 optimizer steps
    one_traj = _apply(tx_one, dict(params), [g, g])         # 2 optimizer steps
    np.testing.assert_allclose(acc_traj[3]["unet.w"], one_traj[1]["unet.w"],
                               rtol=1e-6)
    # logged lr agrees with applied schedule step count
    np.testing.assert_allclose(float(lr_acc(jnp.asarray(2))),
                               float(lr_one(jnp.asarray(1))), rtol=1e-6)


@pytest.mark.parametrize("micro_steps,expect_moved", [(1, False), (2, True)])
def test_e2e_params_move_only_on_emit(tmp_path, micro_steps, expect_moved):
    data = make_image_dataset(tmp_path, n=8)
    cfg = tiny_config(data, tmp_path / f"out{micro_steps}",
                      trainer={"accumulate_grad_batches": 2})
    trainer = Trainer(cfg, tmp_path / f"out{micro_steps}" / "run",
                      models=tiny_models(), tokenizer=HashTokenizer())
    trainer.fit(max_steps_override=micro_steps)
    before = trainer.models.unet["conv_out.weight"]
    after = np.asarray(trainer.natural_trainable()["unet.conv_out.weight"])
    moved = float(np.abs(before - after).max()) > 0
    assert moved == expect_moved
