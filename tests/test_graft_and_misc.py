"""ckpt_tool graft end-to-end + DreamBooth ARB sampler + ensemble encoder."""

import numpy as np
from click.testing import CliRunner

from scal_sdt_tpu.cli import ckpt_tool
from scal_sdt_tpu.convert.sd_names import convert_unet_state_df_to_ldm
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
from scal_sdt_tpu.models.clip import CLIPTextConfig, clip_param_shapes
from scal_sdt_tpu.utils.state import load_state_dict, replace_prefix, save_state_dict


def _write_ldm_model(path, unet_fill, clip_fill):
    unet = {k: np.full((2,), unet_fill, np.float32)
            for k in unet_param_shapes(UNetConfig.sd15())}
    ldm = convert_unet_state_df_to_ldm(unet)
    state = {f"model.diffusion_model.{k}": v for k, v in ldm.items()}
    clip = {f"cond_stage_model.transformer.{k}": np.full((2,), clip_fill, np.float32)
            for k in clip_param_shapes(CLIPTextConfig.vit_l())}
    state.update(clip)
    save_state_dict(state, path)
    return path


def test_graft_splices_subtree_from_donor(tmp_path):
    base = _write_ldm_model(tmp_path / "base.safetensors", 0.0, 0.0)
    donor = _write_ldm_model(tmp_path / "donor.safetensors", 1.0, 1.0)
    out = tmp_path / "grafted.safetensors"

    spec = tmp_path / "spec.yaml"
    spec.write_text(
        "unet:\n"
        "  targets:\n"
        "    - index: [ 'mid_block' ]\n"
        "      targets:\n"
        "        - index: [ 'attentions' ]\n"
        "          targets:\n"
        "            - source: 0\n"
    )
    result = CliRunner().invoke(ckpt_tool.main, [
        "graft", str(base), str(donor), str(out), "--layer-spec", str(spec)])
    assert result.exit_code == 0, result.output or str(result.exception)

    state = load_state_dict(out)
    # mid-block attention weights come from the donor (1.0) ...
    grafted = [k for k in state if k.startswith("model.diffusion_model.middle_block.1.")]
    assert grafted
    assert all(float(state[k][0]) == 1.0 for k in grafted)
    # ... everything else stays base (0.0)
    rest = [k for k in state if k.startswith("model.diffusion_model.input_blocks.1.0.")]
    assert all(float(state[k][0]) == 0.0 for k in rest)


def test_aspect_sampler_db_pairs_matching_sizes(tmp_path):
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.data.datasets import AspectDataset, Concept, DBDataset
    from scal_sdt_tpu.data.samplers import AspectSamplerDB

    from helpers import make_image_dataset

    inst = make_image_dataset(tmp_path / "i", n=8, size=(512, 384))
    cls = make_image_dataset(tmp_path / "c", n=6, size=(384, 512))
    ds = DBDataset(AspectDataset([Concept(inst, "a")]), AspectDataset([Concept(cls, "b")]))
    bucket_conf = Config({"c_size": 1.5, "c_dim": 2, "c_div": 8, "max_aspect_error": 0.5})
    sampler = AspectSamplerDB(ds, 512, bucket_conf, batch_size=2, seed=1)
    pairs = list(sampler)
    assert pairs
    for inst_idx, cls_idx in pairs:
        assert inst_idx.size == cls_idx.size  # class item rendered at instance res


def test_ensemble_concatenates_sequences():
    import jax
    import jax.numpy as jnp

    from scal_sdt_tpu.models.clip import CLIPTextConfig, clip_text_apply, init_clip_params
    from scal_sdt_tpu.text.ensemble import EncoderEntry, encode_ensemble
    from scal_sdt_tpu.text.tokenizer import HashTokenizer

    cfg = CLIPTextConfig(vocab_size=49408, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    entries = []
    for seed in (0, 1):
        params = init_clip_params(jax.random.PRNGKey(seed), cfg)
        entries.append(EncoderEntry(
            params=params,
            apply_fn=lambda p, ids, c=cfg: clip_text_apply(p, ids, c),
            tokenizer=tok))
    z = encode_ensemble(entries, ["hello world", "another"])
    assert z.shape == (2, 2 * 77, cfg.hidden_size)
