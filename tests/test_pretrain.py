"""End-to-end pretraining step tests on a simulated 8-device mesh.

Substitutes for the reference's missing multi-GPU test story
(SURVEY.md §4): the full jitted SPMD step — on-device augmentation,
teacher/student forwards, BYOL loss, AdamW, EMA — must run on a
('data',) mesh and behave (loss finite and decreasing, teacher EMA
moving, feature std healthy / non-collapsed).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.methods.atst.method import ClipPretrainConfig, ClipMethod
from audiossl_tpu.methods.atstframe.method import (
    FramePretrainConfig,
    FrameMethod,
)
from audiossl_tpu.models.atst import AudioTransformer
from audiossl_tpu.parallel import data_mesh, replicate_tree, shard_batch
from audiossl_tpu.training.pretrain import (
    Branch,
    OptimizerConfig,
    copy_into_structure,
    ema_update,
    wd_mask,
)

OPT = OptimizerConfig(max_steps=50, warmup_steps=5, learning_rate=1e-3)
B = 16


def tiny_encoder(use_cls, spec_w):
    return AudioTransformer(embed_dim=64, depth=2, num_heads=2, spec_h=64,
                            spec_w=spec_w, use_cls=use_cls)


def make_batch(cfg):
    wav = np.random.RandomState(0).randn(B, cfg.out_samples).astype(
        np.float32) * 0.1
    valid = np.full((B,), cfg.out_samples, np.int32)
    # vary some lengths to exercise the masked paths
    valid[::4] = cfg.out_samples // 2
    return {"wav": wav, "valid": valid}


@pytest.fixture(scope="module")
def mesh():
    return data_mesh()


@pytest.mark.slow
def test_clip_pretrain_step(mesh):
    cfg = ClipPretrainConfig(arch="small", anchor_len=(1.0, 1.0),
                             positive_len=(1.0, 1.0), optimizer=OPT)
    m = ClipMethod(cfg)
    m.student = Branch(encoder=tiny_encoder(True, cfg.out_frames),
                       predictor=True, hidden_dim=128, out_dim=32)
    m.teacher = Branch(encoder=tiny_encoder(True, cfg.out_frames),
                       predictor=False, hidden_dim=128, out_dim=32)
    state = replicate_tree(mesh, m.init_state(jax.random.PRNGKey(0)))
    # teacher starts as an exact copy of the student (sans predictor)
    t0 = jax.tree.leaves(state.teacher_params)[0]
    s0 = jax.tree.leaves(
        copy_into_structure(state.teacher_params, state.params))[0]
    np.testing.assert_allclose(np.asarray(t0), np.asarray(s0))

    step = jax.jit(m.make_step(), donate_argnums=0)
    batch = shard_batch(mesh, make_batch(cfg))
    losses = []
    for i in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    # loss decreases on a repeated batch
    assert losses[-1] < losses[0]
    # feature std healthy (no collapse to 0)
    assert float(metrics["std_cls_t"]) > 1e-3
    assert float(metrics["std_cls_s"]) > 1e-3
    assert int(state.step) == 6


@pytest.mark.slow
def test_frame_pretrain_step(mesh):
    cfg = FramePretrainConfig(arch="small", anchor_len=1.0, optimizer=OPT)
    m = FrameMethod(cfg)
    m.student = Branch(encoder=tiny_encoder(False, cfg.out_frames),
                       projector="mlp", predictor=True, hidden_dim=128,
                       out_dim=32)
    m.teacher = Branch(encoder=tiny_encoder(False, cfg.out_frames),
                       projector="mlp", predictor=False, hidden_dim=128,
                       out_dim=32)
    state = replicate_tree(mesh, m.init_state(jax.random.PRNGKey(0)))
    step = jax.jit(m.make_step(), donate_argnums=0)
    batch = shard_batch(mesh, make_batch(cfg))
    losses = []
    for i in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert float(metrics["std_frm_tea"]) > 1e-3


def test_ema_and_wd_mask():
    params = {"a": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
              "predictor": {"kernel": jnp.ones((4, 4))}}
    teacher = {"a": {"kernel": jnp.zeros((4, 4)),
                     "bias": jnp.zeros((4,))}}
    out = ema_update(teacher, params, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]["kernel"]), 0.1)
    assert "predictor" not in out
    m = wd_mask(params)
    assert m["a"]["kernel"] is True
    assert m["a"]["bias"] is False


def test_schedules_match_reference_arrays():
    from audiossl_tpu.training.schedules import (
        cosine_schedule,
        cosine_schedule_array,
    )
    arr = cosine_schedule_array(5e-4, 1e-6, 100, 10)
    f = cosine_schedule(5e-4, 1e-6, 100, 10)
    got = np.array([float(f(i)) for i in range(100)])
    np.testing.assert_allclose(got, arr, rtol=1e-5)


def test_fused_adamw_ema_matches_split_pipeline():
    """fused_adamw_ema (one traversal) must equal the split pipeline
    scale_by_adam -> apply_adamw_update -> ema_update exactly, over
    several steps, including the teacher-subset structure rule."""
    from audiossl_tpu.training.pretrain import (
        apply_adamw_update,
        fused_adamw_ema,
        make_adam,
    )

    cfg = OptimizerConfig(learning_rate=1e-3)
    rng = np.random.RandomState(1)

    def leaf(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32))

    params = {"enc": {"kernel": leaf(8, 8), "bias": leaf(8)},
              "head": {"kernel": leaf(8, 4), "bias": leaf(4)},
              "predictor": {"kernel": leaf(4, 4)}}
    teacher = {"enc": {"kernel": leaf(8, 8), "bias": leaf(8)},
               "head": {"kernel": leaf(8, 4), "bias": leaf(4)}}
    mask = wd_mask(params)
    adam = make_adam(cfg)

    opt_a = adam.init(params)
    opt_b = adam.init(params)
    p_a, p_b = params, params
    t_a, t_b = teacher, teacher
    lr, wd, m = 1e-3, 0.05, 0.9
    for step in range(3):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.randn(*p.shape).astype(np.float32)), p_a)
        upd, opt_a = adam.update(grads, opt_a, p_a)
        p_a = apply_adamw_update(p_a, upd, lr, wd, mask)
        t_a = ema_update(t_a, p_a, m)
        p_b, opt_b, t_b = fused_adamw_ema(
            p_b, grads, opt_b, t_b, lr, wd, m, mask, cfg)
    assert int(opt_b.count) == 3
    for name, a, b in (("params", p_a, p_b), ("teacher", t_a, t_b),
                       ("mu", opt_a.mu, opt_b.mu),
                       ("nu", opt_a.nu, opt_b.nu)):
        flat_a = jax.tree_util.tree_leaves(a)
        flat_b = jax.tree_util.tree_leaves(b)
        assert len(flat_a) == len(flat_b)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-7, err_msg=name)
    assert "predictor" not in t_b


def test_schedules_match_reference_implementation():
    """cosine_schedule_array vs the reference's own
    cosine_scheduler_step/epoch imported from /root/reference
    (utils/common.py:16-40) — exact agreement."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_common", "/root/reference/audiossl/utils/common.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    from audiossl_tpu.training.schedules import cosine_schedule_array

    for base, final, steps, warm in ((5e-4, 1e-6, 1000, 100),
                                     (0.04, 0.4, 398000, 0),
                                     (0.9996, 1.0, 500, 7)):
        want = ref.cosine_scheduler_step(base, final, steps, warm)
        got = cosine_schedule_array(base, final, steps, warm)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   atol=0)
