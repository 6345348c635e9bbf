"""Worker for the genuine 2-process distributed test (run via subprocess).

Brings up jax.distributed on CPU (2 processes x 1 device), then exercises
the REAL multi-host code paths that single-process tests can only fake:

1. ``cli.cache.merge_shards`` with the real ``process_allgather`` — shard
   ordering and content across ranks;
2. ``training.checkpoint.save_checkpoint`` with params sharded over a
   2-device data mesh (one device per process, so arrays are NOT fully
   addressable and ``_to_host`` must take the collective gather path);
3. per-process ARB sharding agreement: both ranks must partition ids
   identically and disjointly without communication.

Replaces what the reference gets from NCCL all-gather + Lightning rank
handling (/root/reference/cache.py:25-41). Exits 0 on success; any
assertion failure propagates as a nonzero exit.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path


def main() -> None:
    proc_id = int(sys.argv[1])
    coordinator = sys.argv[2]
    workdir = Path(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1

    import numpy as np
    import jax.numpy as jnp

    # -- 1. real process_allgather through merge_shards ---------------------
    from scal_sdt_tpu.cli.cache import merge_shards

    n, g = 3, 1
    ids = np.arange(proc_id, 6, 2, dtype=np.int64)          # rank-strided
    latents = np.full((g, n, 2, 2, 4), float(proc_id), np.float32)
    conds = np.full((n, 4, 8), float(10 + proc_id), np.float32)
    merged = merge_shards({"ids": ids, "latents": latents, "conds": conds},
                          world_size=2)
    assert sorted(merged["ids"].tolist()) == [0, 1, 2, 3, 4, 5]
    # rank blocks must arrive in process order: ids [0,2,4] then [1,3,5]
    assert merged["ids"].tolist() == [0, 2, 4, 1, 3, 5], merged["ids"]
    assert merged["latents"].shape == (g, 6, 2, 2, 4)
    np.testing.assert_array_equal(merged["latents"][0, :3], 0.0)
    np.testing.assert_array_equal(merged["latents"][0, 3:], 1.0)
    np.testing.assert_array_equal(merged["conds"][:3], 10.0)
    np.testing.assert_array_equal(merged["conds"][3:], 11.0)

    # -- 2. collective checkpoint save over a cross-process mesh ------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scal_sdt_tpu.parallel.mesh import make_mesh
    from scal_sdt_tpu.training.step import TrainState
    from scal_sdt_tpu.training.checkpoint import save_checkpoint

    mesh = make_mesh(data=1, fsdp=2)
    host = np.arange(16, dtype=np.float32).reshape(4, 4)
    sharded = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("fsdp", None)), host[proc_id * 2:(proc_id + 1) * 2],
        global_shape=(4, 4))
    assert not sharded.is_fully_addressable  # the collective path is real
    state = TrainState(step=jnp.asarray(3, jnp.int32),
                       trainable={"unet.w": sharded},
                       opt_state={}, ema=None, rng=jax.random.PRNGKey(0))
    ckpt = workdir / "two_proc.safetensors"
    save_checkpoint(ckpt, state, frozen={}, save_train_state=False,
                    loop_state={"epoch": 1, "batch_in_epoch": 2})
    # every process must have passed through the gather; rank 0 wrote
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")
    from safetensors import safe_open

    with safe_open(ckpt, "np") as f:
        np.testing.assert_array_equal(f.get_tensor("unet.w"), host)
        meta = json.loads(f.metadata()["json"])
        assert meta["epoch"] == 1 and meta["batch_in_epoch"] == 2

    # -- 3. ARB rank sharding agrees without communication ------------------
    from scal_sdt_tpu.data.bucket import BucketManager

    manager = BucketManager(batch_size=2, seed=77,
                            world_size=2, global_rank=proc_id)
    manager.gen_buckets()
    id_size_map = {i: (512 + 64 * (i % 3), 512) for i in range(11)}
    manager.put_in(id_size_map, max_aspect_error=2.0)
    manager.start_epoch(0)
    local = sorted(manager._local_ids())
    all_locals = multihost_utils.process_allgather(
        np.asarray(local + [-1] * (11 - len(local)), np.int64))
    mine = [int(x) for x in all_locals[proc_id] if x >= 0]
    other = [int(x) for x in all_locals[1 - proc_id] if x >= 0]
    assert local == mine
    assert not (set(mine) & set(other)), "rank shards overlap"
    # 11 ids truncate to a batch*world multiple (reference sharding math)
    assert len(mine) + len(other) == 8, (mine, other)

    print(f"two_process_worker[{proc_id}]: ok")


if __name__ == "__main__":
    main()
