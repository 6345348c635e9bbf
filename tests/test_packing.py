"""Small-leaf slab packing (training/packing.py).

Covers: spec construction, pack/unpack round trips (device + host), the
custom-VJP backward (must equal autodiff through a naive unpack), and
end-to-end training equivalence packed vs unpacked (identical fp32 math).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scal_sdt_tpu.training.packing import (
    SLAB_PAD_MULTIPLE, build_pack_spec, pack, repack_host, slab_labels,
    unpack, unpack_host)

from helpers import make_image_dataset, tiny_config, tiny_models


def _params():
    rng = np.random.RandomState(0)
    return {
        "unet.a.weight": rng.randn(8, 16).astype(np.float32),
        "unet.a.bias": rng.randn(16).astype(np.float32),
        "unet.b.weight": rng.randn(4, 2, 3, 3).astype(np.float32),
        "unet.big.weight": rng.randn(600, 512).astype(np.float32),  # >= min
        "condition_model.encoder.c.weight": rng.randn(5, 7).astype(np.float32),
        "condition_model.encoder.c.bias": rng.randn(7).astype(np.float32),
    }


def _family_params():
    """Three same-shape big leaves (a stack family) + a lone big leaf."""
    rng = np.random.RandomState(2)
    p = _params()
    for i in range(3):
        p[f"unet.fam{i}.weight"] = rng.randn(600, 512).astype(np.float32)
    return p


def test_spec_groups_by_component_and_label():
    params = _params()
    labels = {k: ("g1" if k.startswith("condition_model.") else "g0")
              for k in params}
    spec = build_pack_spec(params, labels, min_slab_size=1 << 18)
    assert set(spec.slab_keys) == {"unet.__slab__.g0",
                                   "condition_model.__slab__.g1"}
    assert "unet.big.weight" in spec.passthrough
    assert slab_labels(spec) == {"unet.__slab__.g0": "g0",
                                 "condition_model.__slab__.g1": "g1"}
    for _, padded, slots in spec.slabs:
        assert padded % SLAB_PAD_MULTIPLE == 0
        assert padded >= sum(s.size for s in slots)


def test_pack_unpack_round_trip_host_and_device():
    params = _params()
    spec = build_pack_spec(params)
    packed_np = pack(params, spec, np_out=True)
    assert not any("__slab__" in k for k in unpack_host(packed_np, spec))
    for variant in (unpack_host(packed_np, spec),
                    jax.jit(lambda p: unpack(p, spec))(
                        {k: jnp.asarray(v) for k, v in packed_np.items()})):
        assert set(variant.keys()) == set(params.keys())
        for k in params:
            np.testing.assert_array_equal(np.asarray(variant[k]), params[k])


def test_stack_families():
    params = _family_params()
    spec = build_pack_spec(params)
    # fam0/fam1/fam2 + big.weight share (600, 512) -> one 4-member stack
    assert len(spec.stacks) == 1
    stack_key, members, shape = spec.stacks[0]
    assert stack_key.startswith("unet.__stack__.default.")
    assert set(members) == {"unet.big.weight", "unet.fam0.weight",
                            "unet.fam1.weight", "unet.fam2.weight"}
    assert shape == (600, 512)
    from scal_sdt_tpu.training.packing import packed_labels

    assert packed_labels(spec)[stack_key] == "default"

    packed = pack(params, spec, np_out=True)
    assert packed[stack_key].shape == (4, 600, 512)
    out = unpack_host(packed, spec)
    for k in params:
        np.testing.assert_array_equal(np.asarray(out[k]), params[k])

    # device unpack + custom vjp
    packed_dev = {k: jnp.asarray(v) for k, v in packed.items()}
    coeffs = {k: jnp.asarray(np.random.RandomState(5).randn(*v.shape),
                             jnp.float32) for k, v in params.items()}

    def loss(p):
        full = unpack(p, spec)
        return sum(jnp.vdot(full[k], coeffs[k]) for k in coeffs)

    g = jax.grad(loss)(packed_dev)
    # linear loss: d/d stack[i] == coeffs of that member
    for i, k in enumerate(members):
        np.testing.assert_allclose(np.asarray(g[stack_key][i]),
                                   np.asarray(coeffs[k]), rtol=1e-6)


def test_stack_disabled_keeps_big_leaves_natural():
    params = _family_params()
    spec = build_pack_spec(params, stack_big=False)
    assert spec.stacks == ()
    assert "unet.fam0.weight" in spec.passthrough


def test_single_leaf_groups_stay_natural():
    params = {"unet.x.weight": np.zeros((4, 4), np.float32),
              "vae.lonely": np.zeros((3,), np.float32)}
    spec = build_pack_spec(params)
    # vae has one small leaf -> no slab for it
    assert "vae.lonely" in spec.passthrough
    assert spec.slab_keys == () or all("vae" not in k for k in spec.slab_keys)


def test_unpack_custom_vjp_matches_autodiff():
    params = _params()
    spec = build_pack_spec(params)
    packed = {k: jnp.asarray(v) for k, v in pack(params, spec, np_out=True).items()}

    coeffs = {k: jnp.asarray(np.random.RandomState(1).randn(*v.shape),
                             jnp.float32) for k, v in _params().items()}

    def loss_custom(p):
        full = unpack(p, spec)
        return sum(jnp.vdot(full[k], coeffs[k]) for k in coeffs) + \
            jnp.sum(jnp.square(full["unet.a.weight"]))

    def loss_naive(p):
        # same math, autodiff through plain slices (no custom vjp)
        from scal_sdt_tpu.training.packing import _unpack_fwd

        full = _unpack_fwd(spec, p)
        return sum(jnp.vdot(full[k], coeffs[k]) for k in coeffs) + \
            jnp.sum(jnp.square(full["unet.a.weight"]))

    g_custom = jax.grad(loss_custom)(packed)
    g_naive = jax.grad(loss_naive)(packed)
    assert jax.tree.structure(g_custom) == jax.tree.structure(g_naive)
    for k in g_custom:
        np.testing.assert_allclose(np.asarray(g_custom[k]),
                                   np.asarray(g_naive[k]), rtol=1e-6, atol=1e-6)


def test_repack_host_partial_coverage():
    params = _params()
    spec = build_pack_spec(params)
    full = pack(params, spec, np_out=True)
    # EMA-like subset: only unet keys
    subset = {k: v for k, v in params.items() if k.startswith("unet.")}
    re = repack_host(subset, spec, template=full)
    assert "unet.__slab__.default" in re
    assert "condition_model.__slab__.default" not in re
    np.testing.assert_array_equal(re["unet.__slab__.default"],
                                  full["unet.__slab__.default"])
    # partial slab: missing member backfills from template
    partial = dict(subset)
    del partial["unet.a.bias"]
    re2 = repack_host(partial, spec, template=full)
    np.testing.assert_array_equal(re2["unet.__slab__.default"],
                                  full["unet.__slab__.default"])


def test_repack_host_partial_stack_coverage():
    params = _family_params()
    spec = build_pack_spec(params)
    full = pack(params, spec, np_out=True)
    stack_key, members, _ = spec.stacks[0]
    partial = {k: params[k] for k in members[:2]}
    re = repack_host(partial, spec, template=full)
    np.testing.assert_array_equal(re[stack_key], full[stack_key])
    # no template: uncovered members zero-fill
    re0 = repack_host({members[0]: params[members[0]]}, spec)
    assert np.abs(re0[stack_key][1:]).max() == 0


def test_e2e_stacked_tiny_matches_unpacked(tmp_path):
    """pack_min_size=64 forces the tiny model's leaves into stacks; the
    trajectory must match unpacked training to fp32 tolerance."""
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer

    data = make_image_dataset(tmp_path, n=4)
    results = {}
    for mode, overrides in (("stacked", {"param_packing": True,
                                         "pack_min_size": 64,
                                         # stacks are off by default since the
                                         # slab-only flip (r3); opt back in so
                                         # this test covers the stacked path
                                         "pack_stacks": True}),
                            ("off", {"param_packing": False})):
        cfg = tiny_config(data, tmp_path / mode, trainer=overrides)
        tr = Trainer(cfg, tmp_path / mode / "run", models=tiny_models(),
                     tokenizer=HashTokenizer())
        if mode == "stacked":
            assert tr.pack_spec is not None and tr.pack_spec.stacks, \
                "expected stacks to form at pack_min_size=64"
        m = tr.fit(max_steps_override=2)
        results[mode] = (float(m["train_loss"]),
                         {k: np.asarray(v)
                          for k, v in tr.natural_trainable().items()})
    loss_s, params_s = results["stacked"]
    loss_u, params_u = results["off"]
    np.testing.assert_allclose(loss_s, loss_u, rtol=1e-5)
    assert set(params_s) == set(params_u)
    for k in params_s:
        np.testing.assert_allclose(params_s[k], params_u[k],
                                   rtol=1e-3, atol=1e-6, err_msg=k)


@pytest.mark.parametrize("packing", [True, False])
def test_e2e_packed_equals_unpacked(tmp_path, packing):
    """Packed vs unpacked fp32 training must agree to fp32 tolerance.

    Not bitwise: the two modes compile DIFFERENT XLA programs (slab slices
    vs separate buffers), whose fusion/reassociation differ in the last
    ulp; Adam's sqrt(nu)+eps denominator amplifies that to ~1e-4 relative
    on near-zero moments in the first steps (measured: loss diff 1 ulp,
    worst param rel diff 8e-5 after 2 steps)."""
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer

    data = make_image_dataset(tmp_path, n=4)
    cfg = tiny_config(data, tmp_path / f"out{packing}",
                      trainer={"param_packing": packing})
    trainer = Trainer(cfg, tmp_path / f"out{packing}" / "run",
                      models=tiny_models(), tokenizer=HashTokenizer())
    assert (trainer.pack_spec is not None) == packing
    metrics = trainer.fit(max_steps_override=2)
    _E2E_RESULTS[packing] = (
        float(metrics["train_loss"]),
        {k: np.asarray(v) for k, v in trainer.natural_trainable().items()})
    if len(_E2E_RESULTS) == 2:
        loss_p, params_p = _E2E_RESULTS[True]
        loss_u, params_u = _E2E_RESULTS[False]
        np.testing.assert_allclose(loss_p, loss_u, rtol=1e-5)
        assert set(params_p) == set(params_u)
        for k in params_p:
            np.testing.assert_allclose(params_p[k], params_u[k],
                                       rtol=1e-3, atol=1e-6, err_msg=k)


_E2E_RESULTS: dict = {}
