"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

The reference has no tests at all (SURVEY.md §4); our strategy is unit-level
numerical parity against torch primitives plus multi-device sharding tests on
a virtual CPU mesh — a capability the torch reference lacks entirely.
"""

import os

# Overwrite, not setdefault: the image presets JAX_PLATFORMS=axon (TPU tunnel),
# and TPU matmuls run bf16-by-default which breaks fp32 parity tolerances.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# torch (OpenMP) + jax threadpools deadlock on the single-core host otherwise.
os.environ.setdefault("OMP_NUM_THREADS", "1")

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which beats the env var — override it back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# quick/slow split (the full suite is ~45 min single-core; `-m "not slow"`
# runs the unit/parity core in a few minutes). Centralized here so test
# modules stay unmarked; anything that fits an entry below is slow.
import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_arb_training_e2e",
    "test_dreambooth_and_objectives",
    "test_full_model_parity",       # SD1.5-parameterization torch parity
    "test_cache",
    "test_grad_accumulation",
    "test_sample_callback",         # 3 Trainer fits + DDIM sampling loops
    "test_gen_class_imgs",          # CLI loads model + samples per test
}
_SLOW_TESTS = {
    # multi-minute SDXL e2e fits / full sampler loops (the cheap SDXL parity
    # and shape tests stay in the quick set)
    "test_sdxl_training_end_to_end",
    "test_sdxl_lora_training_end_to_end",
    "test_sdxl_dual_tower_lora_and_kohya_export",
    "test_sdxl_trains_from_pooled_cache",
    "test_sdxl_prune_emits_conditioner_namespace",
    "test_openclip_conversion_round_trip",
    "test_kohya_round_trip_sd1",
    "test_sd2_prune_emits_openclip_namespace",
    "test_arb_sdxl_training",
    "test_sample_with_kohya_lora_changes_output",
    "test_sdxl_sample_images_end_to_end",
    "test_sdxl_single_file_load",
    "test_dpmpp_end_to_end_and_img2img",
    "test_guidance_rescale_changes_output",
    "test_mid_epoch_resume_matches_continuous_run",
    "test_lora_dropout_changes_training",
    "test_multihost_cache_padding_covers_all_ids",
    "test_cache_cli_keeps_tail_entries",
    "test_e2e_packed_equals_unpacked",
    "test_e2e_stacked_tiny_matches_unpacked",
    "test_bf16_master_training_tracks_fp32",
    "test_bf16_master_with_bf16_ema_tracks_fp32_ema",
    "test_v_prediction_reaches_train_step_via_real_load_path",
    "test_v_target_actually_differs_from_epsilon",
    "test_sample_images_end_to_end_tiny",
    "test_custom_embedding_expansion_and_table_extension",
    "test_sd2_single_file_ldm_loads_and_encodes",
    "test_checkpoint_save_and_resume",
    "test_sample_images_end_to_end_methods",
    "test_img2img_end_to_end",
    "test_ti_e2e_trains_only_embedding_rows",
    "test_ti_rejects_cached_conditions",
    "test_sample_cli_writes_images",
    "test_sample_cli_overlays_training_checkpoint",
    "test_sd3_trainer_end_to_end",
    "test_sd3_sampling_end_to_end",
    "test_sd3_train_step",
    "test_sd3_cache_build_and_cached_training",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")
        name = item.name.split("[")[0]
        if module in _SLOW_MODULES or name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True)
def _reset_active_mesh_global():
    """The Trainer registers its mesh in a module global (parallel.mesh.
    set_active_mesh) for the attention shard_map wrapper; a mesh from one
    test must never leak into the next (it would silently re-shard eager
    attention calls)."""
    yield
    from scal_sdt_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)
