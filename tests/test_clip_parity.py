"""Golden-activation parity: flax CLIP vs. the reference torch CLIP.

Builds the *reference* CLIP architecture (loaded from the read-only
reference checkout purely as a test fixture) with random weights, converts
the state dict through ``torch_import.convert_clip_state_dict``, and compares
encode_image / encode_text activations. This validates both the converter's
tensor layout mapping and the flax modules' math (AttentionPool2d, QuickGELU
MLPs, causal text transformer, EOT pooling — SURVEY §7 "hard parts").

Skipped when torch or the reference checkout is unavailable.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_CLIP = "/root/reference/models/clip_fsar.py"


def _install_stubs():
    if "ftfy" not in sys.modules:
        mod = types.ModuleType("ftfy")
        mod.fix_text = lambda x: x
        sys.modules["ftfy"] = mod
    if "pkg_resources" not in sys.modules:
        import packaging
        import packaging.version  # noqa: F401 — attach .version submodule

        mod = types.ModuleType("pkg_resources")
        mod.packaging = packaging
        sys.modules["pkg_resources"] = mod
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        for name in ("Compose", "Resize", "CenterCrop", "ToTensor",
                     "Normalize", "InterpolationMode"):
            setattr(tr, name, type(name, (), {"BICUBIC": 0}))
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr


@pytest.fixture(scope="module")
def ref_clip_module():
    if not os.path.isfile(REFERENCE_CLIP):
        pytest.skip("reference checkout not available")
    _install_stubs()
    spec = importlib.util.spec_from_file_location("ref_clip", REFERENCE_CLIP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _compare(ref_model, tokens_np, images_np, atol):
    import jax.numpy as jnp

    from clipspm_tpu.models.backbones.clip import CLIPModel
    from clipspm_tpu.models.backbones.torch_import import (
        convert_clip_state_dict)

    import dataclasses

    ref_model = ref_model.float().eval()
    sd = {k: v for k, v in ref_model.state_dict().items()}
    arch, variables = convert_clip_state_dict(sd)
    # head count is not recoverable from checkpoint shapes for tiny widths
    # (real CLIP widths are 64-multiples); pin it to the fixture's value
    arch = dataclasses.replace(
        arch, transformer_heads=ref_model.transformer.resblocks[0].attn.num_heads)
    model = CLIPModel(arch=arch)

    with torch.no_grad():
        want_txt = ref_model.encode_text(torch.from_numpy(tokens_np).long())
        want_img = ref_model.encode_image(
            torch.from_numpy(images_np))  # NCHW

    got_txt = model.apply(variables, jnp.asarray(tokens_np),
                          method=model.encode_text)
    got_img = model.apply(variables,
                          jnp.asarray(images_np.transpose(0, 2, 3, 1)),
                          method=model.encode_image)

    np.testing.assert_allclose(np.asarray(got_txt), want_txt.numpy(),
                               atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_img), want_img.numpy(),
                               atol=atol, rtol=1e-3)


def test_vit_clip_parity(ref_clip_module):
    torch.manual_seed(0)
    ref = ref_clip_module.CLIP(
        embed_dim=64, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=16, vocab_size=128,
        transformer_width=32, transformer_heads=2, transformer_layers=2)
    rng = np.random.default_rng(0)
    tokens = np.zeros((3, 16), dtype=np.int32)
    for i in range(3):
        L = int(rng.integers(3, 10))
        tokens[i, :L] = rng.integers(1, 100, size=L)
        tokens[i, L - 1] = 127  # EOT = highest id
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    _compare(ref, tokens, images, atol=2e-4)


def test_rn50_clip_parity(ref_clip_module):
    torch.manual_seed(1)
    ref = ref_clip_module.CLIP(
        embed_dim=64, image_resolution=32, vision_layers=(1, 1, 1, 1),
        vision_width=16, vision_patch_size=None, context_length=16,
        vocab_size=128, transformer_width=32, transformer_heads=2,
        transformer_layers=2)
    rng = np.random.default_rng(1)
    tokens = np.zeros((2, 16), dtype=np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 127
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    _compare(ref, tokens, images, atol=5e-4)


def test_bf16_norms_matches_fp32_norms():
    """bf16 LayerNorms (perf option) produce embeddings equal to fp32-LN at
    bf16 resolution — same params tree, same results."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from clipspm_tpu.models.backbones.clip import (CLIP_ARCHS, build_clip,
                                                   init_clip_params)

    for base in ("test-tiny", "test-tiny-rn"):   # ViT LN + ResNet BN paths
        arch0 = CLIP_ARCHS[base]
        arch1 = dataclasses.replace(arch0, bf16_norms=True)
        clip0, clip1 = build_clip(arch0), build_clip(arch1)
        v = init_clip_params(clip0, jax.random.PRNGKey(0))
        img = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
        a = clip0.apply(v, img, method=clip0.encode_image)
        b = clip1.apply(v, img, method=clip1.encode_image)
        # fp32 compute dtype here, so the two paths agree to fp noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
