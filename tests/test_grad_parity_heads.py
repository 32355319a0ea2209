"""Training-gradient parity for the nine heads beyond clipspm.

Round 1 proved forward parity at random weights for every head but gradient
parity only for clipspm (tests/test_grad_parity.py). Here each head's
reference training loss (the trainer's dispatch table,
reference: run/main_run.py:327-403) is backpropagated in torch and in jax on
identical weights/inputs, and representative parameter gradients (and input
gradients where the head has no own parameters) are compared. This catches
stop-gradient mistakes, loss-term sign errors, and custom-VJP bugs that
forward parity cannot.

Parity targets for heads whose reference code needs repairs to run follow
the already-recorded repaired semantics (COMPONENTS.md defects 2/7/9/14):
- soap: the reference's ``cls_d`` draws a fresh random lambda per call
  (defect 7); both sides are pinned to lambda=0.5 here.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

WAY, SHOT, QUERIES, T = 2, 2, 2, 4
S, Q = WAY * SHOT, WAY * QUERIES
TPB = 16

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def _eps_ce(logits, labels):
    """torch twin of losses.episodic_ce (reference: utils/utils.py:174-186)."""
    log_py = -torch.nn.functional.cross_entropy(
        logits[0], labels, reduction="none").unsqueeze(0)
    score = torch.logsumexp(log_py, dim=0) - torch.log(
        torch.tensor([float(log_py.shape[0])]))
    return -torch.sum(score)


def _check(jax_grad, torch_grad, name, atol=5e-5, rtol=2e-3):
    np.testing.assert_allclose(np.asarray(jax_grad), torch_grad,
                               atol=atol, rtol=rtol, err_msg=name)


def _conv2d_grad(p):
    return p.grad.detach().numpy().transpose(2, 3, 1, 0)


# ---------------------------------------------------------------------------
# strm — joint + post_pat loss (reference: run/main_run.py:332-347)
# ---------------------------------------------------------------------------

def test_strm_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_strm_otam_full_parity as tsof
    from clipspm_tpu.train.losses import loss_and_acc

    refload = tsof.refload.__wrapped__()
    ref, ours, params, (su, qu, su_j, qu_j, labels) = \
        tsof.build_strm_pair(refload)

    out = ref({"context_images": torch.from_numpy(su),
               "context_labels": torch.from_numpy(labels).float(),
               "target_images": torch.from_numpy(qu)})
    lmd = 0.1
    joint = out["logits"] + lmd * out["logits_post_pat"]
    t_loss = (_eps_ce(joint, torch.from_numpy(labels).long()) / TPB
              + lmd * _eps_ce(out["logits_post_pat"],
                              torch.from_numpy(labels).long()) / TPB)
    t_loss.backward()

    def loss_fn(p):
        outs = ours.apply({"params": p}, jnp.asarray(su_j), jnp.asarray(qu_j),
                          jnp.asarray(labels), train=False)
        loss, _ = loss_and_acc("strm", outs, jnp.asarray(labels), None, None,
                               TPB, cfg=None, train=True)
        return loss

    jloss, grads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    _check(grads["backbone_override"]["conv"]["kernel"],
           _conv2d_grad(ref.resnet[0].weight), "backbone conv")
    _check(grads["attn_pat"]["query_proj"]["kernel"],
           ref.attn_pat.query_proj.weight.grad.numpy().T, "attn_pat q")
    _check(grads["tct_2"]["k_linear"]["kernel"],
           ref.transformers[0].k_linear.weight.grad.numpy().T, "tct k")


# ---------------------------------------------------------------------------
# soap — CE/tpb + t_loss (reference: run/main_run.py:384-388; lambda pinned)
# ---------------------------------------------------------------------------

def test_soap_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_more_heads_parity as tmh
    from clipspm_tpu.train.losses import loss_and_acc

    refload = tmh.refload.__wrapped__()
    ref, ours, params, (su, qu, su_j, qu_j, labels) = \
        tmh.build_soap_pair(refload)

    # pin the reference's per-call random lambda (defect 7) to our 0.5
    orig_rand = torch.rand
    torch.rand = lambda *a, **kw: torch.full(a, 0.5)
    try:
        out = ref({"context_images": torch.from_numpy(su),
                   "context_labels": torch.from_numpy(labels).float(),
                   "target_images": torch.from_numpy(qu)})
    finally:
        torch.rand = orig_rand
    t_loss = (_eps_ce(out["logits"], torch.from_numpy(labels).long()) / TPB
              + out["t_loss"])
    t_loss.backward()

    def loss_fn(p):
        outs = ours.apply({"params": p}, jnp.asarray(su_j), jnp.asarray(qu_j),
                          jnp.asarray(labels), train=False)
        loss, _ = loss_and_acc("soap", outs, jnp.asarray(labels), None, None,
                               TPB, cfg=None, train=True)
        return loss

    jloss, grads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    _check(grads["backbone_override"]["conv"]["kernel"],
           _conv2d_grad(ref.resnet[0].weight), "backbone conv")
    _check(grads["tripel_prior"]["hm_lin"]["kernel"],
           ref.tripel_prior.hm_lin.weight.grad.numpy().T, "hm_lin")
    _check(grads["tct_2"]["k_linear"]["kernel"],
           ref.transformers[0].k_linear.weight.grad.numpy().T, "tct k")


# ---------------------------------------------------------------------------
# molo — 5 CE terms + recon MSE (reference: run/main_run.py:349-362)
# ---------------------------------------------------------------------------

def test_molo_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_molo_parity as tmp_
    from clipspm_tpu.train.losses import loss_and_acc
    from clipspm_tpu.utils.config import ConfigNode

    ref_molo = tmp_.ref_molo.__wrapped__()
    ref, ours, params, stats, (su, qu, su_j, qu_j, labels) = \
        tmp_.build_molo_pair(ref_molo)

    real_sup = np.asarray([0, 2, 0, 2], np.int32)
    real_tgt = np.asarray([2, 0, 2, 0], np.int32)
    cls_v, contr, recons = 0.6, 0.05, 0.1
    labels_t = torch.from_numpy(labels).long()
    both_real = torch.from_numpy(np.concatenate([real_sup, real_tgt])).long()

    out = ref({"context_images": torch.from_numpy(su),
               "context_labels": torch.from_numpy(labels).float(),
               "target_images": torch.from_numpy(qu)})
    t_loss = ((_eps_ce(out["logits"], labels_t) / TPB
               + cls_v * _eps_ce(out["class_logits"], both_real)) / TPB
              + contr * _eps_ce(out["logits_s2q"], labels_t) / TPB
              + contr * _eps_ce(out["logits_q2s"], labels_t) / TPB
              + contr * _eps_ce(out["logits_s2q_motion"], labels_t) / TPB
              + contr * _eps_ce(out["logits_q2s_motion"], labels_t) / TPB
              + recons * out["loss_recons"])
    t_loss.backward()

    cfg = ConfigNode({"MODEL": {"USE_CLASSIFICATION_VALUE": cls_v,
                                "USE_CONTRASTIVE_COFF": contr,
                                "RECONS_COFF": recons}})

    def loss_fn(p):
        outs = ours.apply({"params": p, "batch_stats": stats},
                          jnp.asarray(su_j), jnp.asarray(qu_j),
                          jnp.asarray(labels), train=False)
        loss, _ = loss_and_acc("molo", outs, jnp.asarray(labels),
                               jnp.asarray(real_sup), jnp.asarray(real_tgt),
                               TPB, cfg=cfg, train=True)
        return loss

    jloss, grads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    _check(grads["backbone_override"]["conv"]["kernel"],
           _conv2d_grad(ref.backbone[0].weight), "backbone conv",
           atol=2e-4)
    _check(grads["classification_layer"]["kernel"],
           ref.classification_layer.weight.grad.numpy().T, "classification")
    _check(grads["motion_conv"]["kernel"],
           _conv2d_grad(ref.motion_conv.weight), "motion_conv", atol=2e-4)


# ---------------------------------------------------------------------------
# ta2n — plain episodic CE (reference: run/main_run.py:396-401)
# ---------------------------------------------------------------------------

def test_ta2n_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_ta2n_parity as ttp
    from clipspm_tpu.train.losses import loss_and_acc

    ref_ta2n = ttp.ref_ta2n.__wrapped__()
    ref, ours, params, stats, (su, qu, su_j, qu_j, labels) = \
        ttp.build_ta2n_pair(ref_ta2n)

    out = ref(torch.from_numpy(su), torch.from_numpy(labels).float(),
              torch.from_numpy(qu))
    t_loss = _eps_ce(out["logits"], torch.from_numpy(labels).long()) / TPB
    t_loss.backward()

    def loss_fn(p):
        outs = ours.apply({"params": p, "batch_stats": stats},
                          jnp.asarray(su_j), jnp.asarray(qu_j),
                          jnp.asarray(labels), train=False)
        loss, _ = loss_and_acc("ta2n", outs, jnp.asarray(labels), None, None,
                               TPB, cfg=None, train=True)
        return loss

    jloss, grads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    loc = ref.align.firststage.locnet
    _check(grads["backbone_override"]["conv"]["kernel"],
           _conv2d_grad(ref.resnet.conv.weight), "backbone conv")
    _check(grads["ttm"]["loc_fc2"]["kernel"],
           loc[12].weight.grad.numpy().T, "ttm loc_fc2")
    _check(grads["acm"]["keynet"]["kernel"],
           ref.align.secondstage.keynet.weight.grad.numpy()[:, :, 0].T,
           "acm keynet")


# ---------------------------------------------------------------------------
# cpm2c — lambda-weighted CE stack + consistency
# (reference: run/main_run.py:370-382, repaired NNI params defect 9)
# ---------------------------------------------------------------------------

def test_cpm2c_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_cpm2c_parity as tcp2
    from clipspm_tpu.train.losses import loss_and_acc
    from clipspm_tpu.utils.config import ConfigNode

    ref_cpm2c = tcp2.ref_cpm2c.__wrapped__()
    ref, ours, hp, (su, qu, labels, real_sup, real_tgt,
                    text_train, text_test, DIM) = tcp2.build_cpm2c_pair(
                        ref_cpm2c)

    lambdas = [1.0, 1.0, 0.0]
    labels_t = torch.from_numpy(labels).long()
    both_real = torch.from_numpy(np.concatenate([real_sup, real_tgt])).long()

    out = ref({
        "context_images": torch.from_numpy(su.reshape(S * T, DIM)),
        "context_labels": torch.from_numpy(labels).float(),
        "target_images": torch.from_numpy(qu.reshape(Q * T, DIM)),
        "real_support_labels": torch.from_numpy(real_sup).float(),
        "real_target_labels": torch.from_numpy(real_tgt).float(),
    })
    t_loss = (lambdas[0] * _eps_ce(out["class_logits"], both_real) / TPB
              + lambdas[1] * _eps_ce(out["logits_local"], labels_t) / TPB
              + lambdas[2] * _eps_ce(out["logits_global"], labels_t) / TPB
              + 0.001 * out["target_consist_distance"])
    t_loss.backward()

    cfg = ConfigNode({"MODEL": {},
                      "params": {"lambdas0": lambdas[0],
                                 "lambdas1": lambdas[1],
                                 "lambdas2": lambdas[2], "lambdas3": 0.0}})

    def loss_fn(p):
        outs = ours.apply(
            {"params": p},
            jnp.asarray(su.reshape(S, T, 1, 1, DIM)),
            jnp.asarray(qu.reshape(Q, T, 1, 1, DIM)),
            jnp.asarray(labels), jnp.asarray(real_sup),
            jnp.asarray(real_tgt), jnp.asarray(text_train),
            jnp.asarray(text_test), train=False)
        loss, _ = loss_and_acc("cpm2c", outs, jnp.asarray(labels),
                               jnp.asarray(real_sup), jnp.asarray(real_tgt),
                               TPB, cfg=cfg, train=True)
        return loss

    jloss, grads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, hp))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    _check(grads["gate_text_fc1"]["kernel"],
           ref.gate_text[0].weight.grad.numpy().T, "gate_text fc1")
    _check(grads["motion_conv1_1"]["kernel"],
           ref.motion_conv1_1.weight.grad.numpy().transpose(2, 1, 0),
           "motion_conv1_1")
    _check(grads["context2"]["attn_0"]["to_q"]["kernel"],
           ref.context2.layers[0][0].fn.to_q.weight.grad.numpy().T,
           "context2 to_q")


# ---------------------------------------------------------------------------
# clipfsar — CE + classification CE (reference: run/main_run.py:364-368,
# repaired imports defect 2)
# ---------------------------------------------------------------------------

def test_clipfsar_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_clipfsar_parity as tcf
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import IdentityBackbone
    from clipspm_tpu.models.heads.clipfsar import CLIPFSARModel
    from clipspm_tpu.train.losses import loss_and_acc
    from clipspm_tpu.utils.config import ConfigNode

    ref_mod = tcf.ref_clipfsar.__wrapped__()
    cfg_t = tcf._Cfg({
        "MODEL": {"BACKBONE": "RN50", "NAME": "clipfsar",
                  "USE_CLASSIFICATION": True},
        "TRAIN": {"CLASS_NAME": ["a", "b", "c"], "WAY": WAY, "SHOT": SHOT},
        "TEST": {"CLASS_NAME": ["d", "e", "f"]},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1},
    })
    torch.manual_seed(0)
    ref = ref_mod.CNN_OTAM_CLIPFSAR(cfg_t)
    ref.backbone = torch.nn.Identity()
    ref = ref.eval()

    DIM = tcf.DIM
    su, qu, labels, real_sup, real_tgt = tcf._episode(DIM)
    cls_v = 1.5
    labels_t = torch.from_numpy(labels).long()
    both_real = torch.from_numpy(np.concatenate([real_sup, real_tgt])).long()

    out = ref({
        "context_images": torch.from_numpy(su.reshape(S * T, DIM)),
        "context_labels": torch.from_numpy(labels).float(),
        "target_images": torch.from_numpy(qu.reshape(Q * T, DIM)),
        "real_support_labels": torch.from_numpy(real_sup).float(),
    })
    t_loss = (_eps_ce(out["logits"], labels_t)
              + cls_v * _eps_ce(out["class_logits"], both_real)) / TPB
    t_loss.backward()

    cfg = ConfigNode({"MODEL": {"USE_CLASSIFICATION_VALUE": cls_v}})
    ours = CLIPFSARModel(arch=CLIP_ARCHS["RN50"], way=WAY, shot=SHOT,
                         backbone_override=IdentityBackbone())
    params = tcf._convert_clipfsar(ref)

    def loss_fn(p):
        outs = ours.apply(
            {"params": p},
            jnp.asarray(su.reshape(S, T, 1, 1, DIM)),
            jnp.asarray(qu.reshape(Q, T, 1, 1, DIM)),
            jnp.asarray(labels), jnp.asarray(real_sup),
            jnp.asarray(real_tgt),
            jnp.asarray(ref.text_features_train.detach().numpy()),
            jnp.asarray(ref.text_features_test.detach().numpy()),
            train=False)
        loss, _ = loss_and_acc("clipfsar", outs, jnp.asarray(labels),
                               jnp.asarray(real_sup), jnp.asarray(real_tgt),
                               TPB, cfg=cfg, train=True)
        return loss

    jloss, grads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    t = ref.context2.layers[0][0]
    _check(grads["context2"]["attn_0"]["to_q"]["kernel"],
           t.fn.to_q.weight.grad.numpy().T, "context2 to_q")
    _check(grads["context2"]["ff_0"]["fc1"]["kernel"],
           ref.context2.layers[0][1].net[0].weight.grad.numpy().T,
           "context2 ff fc1")
    _check(grads["scale"], ref.scale.grad.numpy().reshape(()), "scale")


# ---------------------------------------------------------------------------
# sten — no learnable head params: input-feature gradient parity
# ---------------------------------------------------------------------------

def test_sten_input_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_more_heads_parity as tmh
    from clipspm_tpu.train.losses import loss_and_acc

    refload = tmh.refload.__wrapped__()
    ref, ours, (su, qu, labels, real_sup, real_tgt, text_train, text_test,
                DIM, Tn) = tmh.build_sten_pair(refload)

    su_t = torch.from_numpy(su.reshape(S * Tn, DIM)).requires_grad_(True)
    qu_t = torch.from_numpy(qu.reshape(Q * Tn, DIM)).requires_grad_(True)
    out = ref({
        "context_images": su_t,
        "context_labels": torch.from_numpy(labels).float(),
        "target_images": qu_t,
        "real_support_labels": torch.from_numpy(real_sup).float(),
    })
    t_loss = _eps_ce(out["logits"], torch.from_numpy(labels).long()) / TPB
    t_loss.backward()

    def loss_fn(su_j, qu_j):
        outs = ours.apply(
            {"params": {}},
            su_j.reshape(S, Tn, 1, 1, DIM), qu_j.reshape(Q, Tn, 1, 1, DIM),
            jnp.asarray(labels), jnp.asarray(real_sup),
            jnp.asarray(real_tgt), jnp.asarray(text_train),
            jnp.asarray(text_test), train=False)
        loss, _ = loss_and_acc("sten", outs, jnp.asarray(labels), None, None,
                               TPB, cfg=None, train=True)
        return loss

    jloss, (g_su, g_qu) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(su), jnp.asarray(qu))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    _check(g_su.reshape(S * Tn, DIM), su_t.grad.numpy(), "d/d support")
    _check(g_qu.reshape(Q * Tn, DIM), qu_t.grad.numpy(), "d/d query")


# ---------------------------------------------------------------------------
# trx — TemporalCrossTransformer gradient parity (head params + inputs)
# ---------------------------------------------------------------------------

def test_trx_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_resnet_heads_parity as trh
    from clipspm_tpu.models.heads.trx import TemporalCrossTransformer

    refpkg = trh.refpkg.__wrapped__()
    ref_mod = refpkg("model_TRX")
    torch.manual_seed(0)
    cfg = trh._cfg("trx")
    ref = ref_mod.TemporalCrossTransformer(cfg, temporal_set_size=2).eval()
    D = trh.D

    su, qu, labels = trh._episode()
    su_t = torch.from_numpy(su).requires_grad_(True)
    qu_t = torch.from_numpy(qu).requires_grad_(True)
    out = ref(su_t, torch.from_numpy(labels).float(), qu_t)
    t_loss = _eps_ce(out["logits"][None], torch.from_numpy(labels).long()) \
        / TPB
    t_loss.backward()

    ours = TemporalCrossTransformer(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                    out_dim=24, set_size=2, dropout=0.0)
    params = trh._tct_params(ref)

    def loss_fn(p, su_j, qu_j):
        logits = ours.apply({"params": p}, su_j, jnp.asarray(labels), qu_j,
                            deterministic=True)
        from clipspm_tpu.train.losses import episodic_ce
        return episodic_ce(logits[None], jnp.asarray(labels)) / TPB

    jloss, (grads, g_su, g_qu) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2))(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(su), jnp.asarray(qu))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    _check(grads["k_linear"]["kernel"],
           ref.k_linear.weight.grad.numpy().T, "k_linear")
    _check(grads["v_linear"]["kernel"],
           ref.v_linear.weight.grad.numpy().T, "v_linear")
    _check(g_su, su_t.grad.numpy(), "d/d support")
    _check(g_qu, qu_t.grad.numpy(), "d/d query")


# ---------------------------------------------------------------------------
# otam — DP-kernel backward vs torch autograd through the reference's
# Python-loop recurrence (reference: models/myRes.py:785-855)
# ---------------------------------------------------------------------------

def test_otam_head_grad_parity():
    import jax
    import jax.numpy as jnp

    import test_resnet_heads_parity as trh
    from clipspm_tpu.models.blocks import class_prototypes
    from clipspm_tpu.ops.otam import otam_distance
    from clipspm_tpu.train.losses import episodic_ce

    refpkg = trh.refpkg.__wrapped__()
    ref_mod = refpkg("model_otam")
    D = trh.D
    su, qu, labels = trh._episode()

    su_t = torch.from_numpy(su).requires_grad_(True)
    qu_t = torch.from_numpy(qu).requires_grad_(True)
    fs = ref_mod.cos_sim(qu_t.reshape(Q * T, D), su_t.reshape(S * T, D))
    dists = (1 - fs).reshape(Q, T, S, T).permute(0, 2, 1, 3)
    cum = (ref_mod.OTAM_cum_dist(dists)
           + ref_mod.OTAM_cum_dist(dists.permute(0, 1, 3, 2)))
    class_dists = torch.stack(
        [torch.mean(torch.index_select(
            cum, 1, ref_mod.extract_class_indices(
                torch.from_numpy(labels).float(), c)), dim=1)
         for c in torch.unique(torch.from_numpy(labels).float())])
    logits_t = -class_dists.t()
    t_loss = _eps_ce(logits_t[None], torch.from_numpy(labels).long()) / TPB
    t_loss.backward()

    def loss_fn(su_j, qu_j):
        cum_ours = otam_distance(su_j, qu_j, lbda=0.1, bidirectional=True)
        logits = -class_prototypes(cum_ours.T, jnp.asarray(labels), WAY).T
        return episodic_ce(logits[None], jnp.asarray(labels)) / TPB

    jloss, (g_su, g_qu) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(su), jnp.asarray(qu))
    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    _check(g_su, su_t.grad.numpy(), "d/d support")
    _check(g_qu, qu_t.grad.numpy(), "d/d query")
