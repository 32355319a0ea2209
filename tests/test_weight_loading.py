"""Production CLIP-weights path: a tiny OpenAI-layout ``.pt`` on disk loads
through find_clip_checkpoint -> load_clip_checkpoint -> splice_backbone ->
text tables (the no-network pipeline in train/setup.py)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_openai_state_dict(width=64, layers=2, text_width=32,
                            text_layers=2, embed=32, vocab=128, ctx=16,
                            patch=8, res=32):
    """A ViT CLIP state dict in the exact OpenAI key layout
    (reference shape-inference: models/clip_fsar.py:233-256)."""
    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "visual.conv1.weight": r(width, 3, patch, patch),
        "visual.class_embedding": r(width),
        "visual.positional_embedding": r((res // patch) ** 2 + 1, width),
        "visual.proj": r(width, embed),
        "visual.ln_pre.weight": torch.ones(width),
        "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width),
        "visual.ln_post.bias": torch.zeros(width),
        "text_projection": r(text_width, embed),
        "positional_embedding": r(ctx, text_width),
        "token_embedding.weight": r(vocab, text_width),
        "ln_final.weight": torch.ones(text_width),
        "ln_final.bias": torch.zeros(text_width),
        "logit_scale": torch.tensor(2.6593),
    }
    for prefix, w, n in (("visual.transformer.resblocks", width, layers),
                         ("transformer.resblocks", text_width, text_layers)):
        for i in range(n):
            k = f"{prefix}.{i}"
            sd[f"{k}.attn.in_proj_weight"] = r(3 * w, w)
            sd[f"{k}.attn.in_proj_bias"] = torch.zeros(3 * w)
            sd[f"{k}.attn.out_proj.weight"] = r(w, w)
            sd[f"{k}.attn.out_proj.bias"] = torch.zeros(w)
            sd[f"{k}.ln_1.weight"] = torch.ones(w)
            sd[f"{k}.ln_1.bias"] = torch.zeros(w)
            sd[f"{k}.ln_2.weight"] = torch.ones(w)
            sd[f"{k}.ln_2.bias"] = torch.zeros(w)
            sd[f"{k}.mlp.c_fc.weight"] = r(4 * w, w)
            sd[f"{k}.mlp.c_fc.bias"] = torch.zeros(4 * w)
            sd[f"{k}.mlp.c_proj.weight"] = r(w, 4 * w)
            sd[f"{k}.mlp.c_proj.bias"] = torch.zeros(w)
    return sd


def test_checkpoint_file_roundtrip(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from clipspm_tpu.models.backbones.torch_import import load_clip_checkpoint
    from clipspm_tpu.models.backbones.clip import CLIPModel
    from clipspm_tpu.train.setup import find_clip_checkpoint

    sd = _tiny_openai_state_dict()
    path = tmp_path / "RN50.pt"   # name only matters for discovery
    torch.save(sd, str(path))

    # env-based discovery
    monkeypatch.setenv("CLIP_WEIGHTS_DIR", str(tmp_path))
    assert find_clip_checkpoint("RN50") == str(path)
    assert find_clip_checkpoint("ViT-B/16") is None

    # a file named like an official release but with the wrong bytes must
    # fail the SHA256 integrity gate (reference pins releases by
    # SHA-addressed URL, models/clip_fsar.py:827-837)...
    with pytest.raises(RuntimeError, match="SHA256"):
        load_clip_checkpoint(str(path))
    # ...with an explicit escape hatch for custom checkpoints
    arch, variables = load_clip_checkpoint(str(path), verify=False)
    assert arch.is_vit and arch.embed_dim == 32 and arch.vocab_size == 128
    # converted weights drive the model end to end
    import dataclasses

    arch = dataclasses.replace(arch, transformer_heads=2)
    model = CLIPModel(arch=arch)
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    emb = model.apply(variables, img, method=model.encode_image)
    assert emb.shape == (2, 32)
    toks = jnp.zeros((2, 16), jnp.int32).at[:, 0].set(1).at[:, 1].set(127)
    txt = model.apply(variables, toks, method=model.encode_text)
    assert txt.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()
    assert np.isfinite(np.asarray(txt)).all()


def test_splice_backbone():
    import jax
    import jax.numpy as jnp

    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS, build_clip
    from clipspm_tpu.models.backbones.clip import init_clip_params
    from clipspm_tpu.models.fsar import CLIPSPMModel
    from clipspm_tpu.train.setup import splice_backbone
    from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS

    arch = CLIP_ARCHS["test-tiny"]
    clip = build_clip("test-tiny")
    clip_vars = init_clip_params(clip, jax.random.PRNGKey(7))

    model = CLIPSPMModel(arch=arch, way=2, shot=1,
                         spm=SPM_DEFAULT_PARAMS["hmdb"])
    D = arch.embed_dim
    dummy = (jnp.zeros((2, 2, 32, 32, 3)), jnp.zeros((2, 2, 32, 32, 3)),
             jnp.asarray([0, 1]), jnp.zeros(2, jnp.int32),
             jnp.zeros(2, jnp.int32), jnp.zeros((4, D)), jnp.zeros((4, D)))
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    spliced = splice_backbone(variables, clip_vars)
    # backbone params replaced by CLIP visual tower weights
    a = jax.tree.leaves(spliced["params"]["backbone"])[0]
    b = jax.tree.leaves(clip_vars["params"]["visual"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # head params untouched
    h1 = jax.tree.leaves(spliced["params"]["head"])[0]
    h2 = jax.tree.leaves(variables["params"]["head"])[0]
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_full_openai_arch_registry_builds():
    """Every named OpenAI arch (reference: models/clip_fsar.py:184-196)
    constructs and produces the right embed dims — shape-level only
    (eval_shape, no FLOPs)."""
    import jax
    import jax.numpy as jnp

    from clipspm_tpu.models.backbones.clip import (available_models,
                                                   build_clip)

    expected_embed = {"RN50": 1024, "RN101": 512, "RN50x4": 640,
                      "RN50x16": 768, "RN50x64": 1024, "ViT-B/32": 512,
                      "ViT-B/16": 512, "ViT-L/14": 768,
                      "ViT-L/14@336px": 768}
    names = available_models()
    assert set(names) == set(expected_embed)
    for name in names:
        clip = build_clip(name)
        arch = clip.arch
        assert arch.embed_dim == expected_embed[name]
        img = jnp.zeros((1, arch.image_resolution, arch.image_resolution, 3))
        txt = jnp.zeros((1, arch.context_length), jnp.int32)

        def fwd(i=img, t=txt, c=clip):
            v = c.init(jax.random.PRNGKey(0), i, t)
            return c.apply(v, i, t)

        li, lt = jax.eval_shape(fwd)
        assert li.shape == (1, 1) and lt.shape == (1, 1)


def test_sha256_verifier_matrix(tmp_path):
    """Match -> True; unknown filename -> None (custom ckpts not pinned);
    mismatch -> loud RuntimeError before any deserialisation."""
    import hashlib

    from clipspm_tpu.models.backbones.torch_import import (
        CLIP_CHECKPOINT_SHA256, verify_checkpoint_sha256)

    # registry carries all nine official releases the reference pins
    assert len(CLIP_CHECKPOINT_SHA256) == 9
    assert all(len(d) == 64 for d in CLIP_CHECKPOINT_SHA256.values())

    p = tmp_path / "ViT-B-16.pt"
    p.write_bytes(b"definitely not a clip checkpoint")
    good = hashlib.sha256(p.read_bytes()).hexdigest()

    assert verify_checkpoint_sha256(
        str(p), registry={"ViT-B-16.pt": good}) is True
    assert verify_checkpoint_sha256(
        str(tmp_path / "my_finetune.pt"), registry={}) is None
    with pytest.raises(RuntimeError, match="SHA256"):
        verify_checkpoint_sha256(str(p))   # real registry: mismatch
