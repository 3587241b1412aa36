"""Pallas fused AdamW+EMA optimizer kernel (interpret mode, CPU CI)
vs the XLA elementwise path of training.pretrain.fused_adamw_ema."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiossl_tpu.ops.pallas_opt import (
    _MIN_PALLAS_ELEMS,
    _eligible,
    fused_adamw_ema_pallas,
)
from audiossl_tpu.training.pretrain import (
    OptimizerConfig,
    fused_adamw_ema,
    wd_mask,
)


def _mixed_tree(rng, scale=1.0):
    """Realistic leaf mix: big 2-D kernels (pallas path), small biases
    and a 3-D pos-embed-like leaf, with a ragged row count."""
    mk = lambda *s: jnp.asarray(  # noqa: E731
        rng.randn(*s).astype(np.float32) * scale)
    return {
        "enc": {"qkv": {"kernel": mk(256, 768), "bias": mk(768)},
                "pos": mk(1, 250, 768)},          # R=250 (ragged blocks)
        "head": {"w": mk(777, 384),               # C not 128-multiple
                 "ln": {"scale": mk(384), "bias": mk(384)}},
    }


def _run_both(steps=3, with_teacher=True):
    rng = np.random.RandomState(0)
    cfg = OptimizerConfig(learning_rate=3e-3, warmup_steps=0,
                          max_steps=100)
    params = _mixed_tree(rng)
    teacher = ({"enc": params["enc"]} if with_teacher else None)
    if teacher is not None:
        teacher = jax.tree.map(jnp.array, teacher)
    mask = wd_mask(params)
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    st_a = (params, optax.ScaleByAdamState(jnp.zeros((), jnp.int32),
                                           mu, nu), teacher)
    st_b = jax.tree.map(jnp.array, st_a)

    for i in range(steps):
        g = _mixed_tree(np.random.RandomState(10 + i), scale=0.1)
        lr, wd, m = 1e-3 * (i + 1), 0.04, 0.996
        st_a = fused_adamw_ema(st_a[0], g, st_a[1], st_a[2], lr, wd, m,
                               mask, cfg)
        st_b = fused_adamw_ema_pallas(st_b[0], g, st_b[1], st_b[2], lr,
                                      wd, m, mask, cfg, interpret=True)
    return st_a, st_b


def _assert_trees_close(a, b, atol):
    fa = jax.tree.leaves(a)
    fb = jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=1e-6)


def test_matches_xla_path_with_teacher():
    (p_a, o_a, t_a), (p_b, o_b, t_b) = _run_both(with_teacher=True)
    assert int(o_b.count) == int(o_a.count) == 3
    _assert_trees_close(p_a, p_b, 1e-6)
    _assert_trees_close(o_a.mu, o_b.mu, 1e-6)
    _assert_trees_close(o_a.nu, o_b.nu, 1e-7)
    _assert_trees_close(t_a, t_b, 1e-6)


def test_matches_xla_path_no_teacher():
    (p_a, o_a, t_a), (p_b, o_b, t_b) = _run_both(with_teacher=False)
    assert t_a is None and t_b is None
    _assert_trees_close(p_a, p_b, 1e-6)


def test_eligibility_split():
    """Big 2-D leaves go through the kernel, biases stay inline."""
    assert _eligible(jnp.zeros((256, 768), jnp.float32))
    assert not _eligible(jnp.zeros((768,), jnp.float32))
    assert not _eligible(jnp.zeros((8, 8), jnp.float32))
    assert 256 * 768 >= _MIN_PALLAS_ELEMS


def test_jit_and_donation():
    """The pallas path composes with jit + donated state (the train
    step donates its whole PretrainState)."""
    rng = np.random.RandomState(2)
    cfg = OptimizerConfig()
    params = {"w": jnp.asarray(rng.randn(256, 512).astype(np.float32))}
    mask = wd_mask(params)
    opt = optax.ScaleByAdamState(
        jnp.zeros((), jnp.int32),
        jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.zeros_like, params))
    g = {"w": jnp.asarray(rng.randn(256, 512).astype(np.float32))}

    @jax.jit
    def step(params, opt, g):
        return fused_adamw_ema_pallas(params, g, opt, None, 1e-3, 0.01,
                                      0.99, mask, cfg, interpret=True)
    p2, o2, t2 = step(params, opt, g)
    want, wo, _ = fused_adamw_ema(params, g, opt, None, 1e-3, 0.01,
                                  0.99, mask, cfg)
    np.testing.assert_allclose(np.asarray(p2["w"]),
                               np.asarray(want["w"]), atol=1e-6)
