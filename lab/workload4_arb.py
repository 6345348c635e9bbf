"""BASELINE workload 4 measured on the real chip via the CLI surface
(VERDICT r4 item 5): ARB multi-bucket training + latent cache + EMA +
clip_stop_at_layer 2 at SD1.5 scale.

    python -m lab.workload4_arb [steps] [batch]

What it does (everything through the shipped CLIs, not bench shortcuts):
1. Synthesizes a multi-aspect dataset (images across ~5 aspect ratios whose
   ARB best-fit buckets differ at resolution 512) with .txt captions.
2. Writes a random-init SD1.5-sized model as a diffusers directory (the
   throughput of the training step does not depend on the weights).
3. Runs the cache CLI to precompute latents+conds (ARB-aware cache).
4. Runs the train CLI with aspect_ratio_bucket + data.cache + ema (the
   recommended bf16-master/bf16-shadow config) + clip_stop_at_layer 2,
   SSDT_STEP_TIMINGS streaming per-step (shape, dt) lines.
5. Reports: AOT bucket-warmup wall time, per-bucket median steps/s, and a
   recompile check — after warmup NO step may take compile-scale time
   (>5x its bucket median); the reference instead simply disables
   cudnn.benchmark when ARB is on (/root/reference/train.py:106).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


TINY = os.environ.get("SSDT_W4_TINY") == "1"


def build_dataset(root: Path, per_shape: int = 10) -> Path:
    from PIL import Image

    d = root / "data"
    d.mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(0)
    shapes = ([(64, 64), (80, 48), (48, 80)] if TINY
              else [(512, 512), (640, 448), (448, 640), (704, 384), (576, 448)])
    i = 0
    for (w, h) in shapes:
        for _ in range(per_shape):
            arr = rs.randint(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
            (d / f"img_{i}.txt").write_text(f"a synthetic photo number {i}")
            i += 1
    return d


def build_model_dir(root: Path) -> Path:
    """Random-init SD1.5-sized model in diffusers layout (host-side numpy)."""
    sys.path.insert(0, str(REPO / "tests"))
    import jax
    from helpers import write_diffusers_dir

    from scal_sdt_tpu.convert.loader import LoadedModels
    from scal_sdt_tpu.diffusion.schedule import NoiseSchedule
    from scal_sdt_tpu.models.clip import CLIPTextConfig, init_clip_params
    from scal_sdt_tpu.models.unet import UNetConfig, init_unet_params
    from scal_sdt_tpu.models.vae import VAEConfig, init_vae_params

    out = root / ("tiny-random" if TINY else "sd15-random")
    if (out / "unet").exists():
        return out
    if TINY:
        from helpers import tiny_models

        write_diffusers_dir(tiny_models(), out)
        return out
    to_np = lambda d: {k: np.asarray(v) for k, v in d.items()}
    with jax.default_device(jax.devices("cpu")[0]):
        models = LoadedModels(
            unet=to_np(init_unet_params(jax.random.PRNGKey(0), UNetConfig.sd15())),
            unet_config=UNetConfig.sd15(),
            vae=to_np(init_vae_params(jax.random.PRNGKey(1), VAEConfig.sd15())),
            vae_config=VAEConfig.sd15(),
            clip=to_np(init_clip_params(jax.random.PRNGKey(2), CLIPTextConfig.vit_l())),
            clip_config=CLIPTextConfig.vit_l(),
            schedule=NoiseSchedule(),
        )
    write_diffusers_dir(models, out)
    return out


def write_config(root: Path, model_dir: Path, data_dir: Path, cache_path: Path,
                 steps: int, batch: int, with_cache: bool) -> Path:
    from scal_sdt_tpu.conf import Config, save

    cfg = Config({
        "model": str(model_dir),
        "tokenizer": "hash",
        "output_dir": str(root / "runs"),
        "project": "workload4",
        "batch_size": batch,
        "seed": 42,
        "clip_stop_at_layer": 2,
        # minimal remat ('top', PERF_NOTES r4 0a): ARB's largest bucket
        # (704x384 -> 4224 latent tokens) + the resident frozen towers +
        # EMA shadow exceed the no-remat footprint the single-shape bench
        # fits; measured OOM without it
        "gradient_checkpointing": "top",
        "data": {
            "resolution": 64 if TINY else 512,
            "concepts": [{"instance_set": {"path": str(data_dir),
                                           "prompt": "{TXT_PROMPT}"}}],
            **({"cache": str(cache_path)} if with_cache else {}),
        },
        "aspect_ratio_bucket": {"enabled": True},
        "ema": {"enabled": True, "decay": 0.9999, "dtype": "bf16"},
        "optimizer": {
            "name": "adamw",
            "master_dtype": "bf16",
            "moment_dtype": "bf16",
            "params": {"lr": 2e-6, "beta1": 0.9, "beta2": 0.999,
                       "weight_decay": 1e-2, "eps": 1e-8},
            "lr_scale": {"enabled": False},
        },
        "trainer": {"precision": "bf16", "max_epochs": 99,
                    "max_steps": steps,
                    # log_every 1 => per-step (shape, dt) rows, but each
                    # logged step pays a host metric-fetch round-trip
                    # (~0.24 s through the tunnel-attached chip — zero on
                    # a local TPU host); pass a larger value for aggregate
                    # throughput without the barrier
                    "log_every_n_steps": int(os.environ.get(
                        "SSDT_W4_LOG_EVERY", 1))},
        "checkpoint": {"filename": "step{step}", "every_n_epochs": None,
                       "save_top_k": 0},
        "loggers": {},
    })
    path = root / "workload4.yaml"
    save(cfg, path)
    return path


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    root = Path(os.environ.get("SSDT_W4_DIR", "/tmp/ssdt_workload4"))
    root.mkdir(parents=True, exist_ok=True)

    print("== building dataset + model dir (host)")
    data_dir = build_dataset(root)
    model_dir = build_model_dir(root)
    cache_path = root / "latents.cache"
    cfg = write_config(root, model_dir, data_dir, cache_path, steps, batch,
                       with_cache=True)

    env = dict(os.environ)
    timings = root / "step_timings.jsonl"
    env["SSDT_STEP_TIMINGS"] = str(timings)

    if not cache_path.exists():
        print("== cache build (cli/cache.py)")
        t0 = time.perf_counter()
        subprocess.run([sys.executable, "-m", "scal_sdt_tpu.cli.cache",
                        "--config", str(cfg), "--batch-size", "8"],
                       cwd=REPO, env=env, check=True)
        print(f"cache build wall time: {time.perf_counter() - t0:.1f}s")

    print("== training run (cli/train.py)")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "scal_sdt_tpu.cli.train", "--config", str(cfg)],
        cwd=REPO, env=env, capture_output=True, text=True)
    wall = time.perf_counter() - t0
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-8000:])
    if proc.returncode != 0:
        raise SystemExit(f"train CLI failed rc={proc.returncode}")

    log = proc.stdout + proc.stderr
    m = re.search(r"AOT-compiled (\d+) bucket shapes in ([0-9.]+)s", log)
    warmup = (int(m.group(1)), float(m.group(2))) if m else None

    rows = [json.loads(l) for l in timings.read_text().splitlines() if l]
    by_shape: dict = {}
    for r in rows:
        by_shape.setdefault(tuple(r["shape"] or ()), []).append(r["dt"])

    print("\n== workload 4 summary (ARB + cache + EMA + clip-skip-2, "
          f"batch {batch}, {len(rows)} steps, wall {wall:.0f}s)")
    if warmup:
        print(f"AOT bucket warmup: {warmup[0]} shapes in {warmup[1]:.1f}s")
    recompiles = 0
    for shape, dts in sorted(by_shape.items()):
        arr = np.asarray(dts[1:] if len(dts) > 2 else dts)  # drop first (warm)
        med = float(np.median(arr))
        slow = int((arr > 5 * med).sum())
        recompiles += slow
        print(f"bucket {shape}: n={len(dts)} median {med * 1e3:.1f} ms "
              f"-> {1 / med:.3f} steps/s; outliers(>5x med)={slow}")
    print(f"post-warmup compile-scale outliers: {recompiles} "
          f"({'OK — zero mid-run recompiles' if recompiles == 0 else 'INVESTIGATE'})")
    print(json.dumps({
        "metric": "workload4_arb_cache_ema_clipskip2",
        "warmup": warmup, "steps": len(rows), "batch": batch,
        "per_bucket_steps_per_sec": {
            str(k): round(1 / float(np.median(np.asarray(v[1:] or v))), 3)
            for k, v in by_shape.items()},
        "recompile_outliers": recompiles}))


if __name__ == "__main__":
    main()
