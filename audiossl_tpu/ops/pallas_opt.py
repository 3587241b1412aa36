"""Pallas TPU kernel: fused AdamW + EMA-teacher parameter update.

``training.pretrain.fused_adamw_ema`` expresses the update per leaf so
XLA emits one multi-output elementwise fusion per parameter. On v5e
that compiles into ~52 `multiply_add` fusions totalling ~21 ms/step at
ViT-base size — 5x the ~4 ms HBM roofline for the 3.4 GB of optimizer
traffic (profiled 2026-08-19, docs/PROFILE.md). XLA schedules each
fusion with its own relayouts/copy-dones and never approaches stream
bandwidth.

This kernel streams one leaf per ``pallas_call``: read (p, g, mu, nu
[, teacher]) once, write (p', mu', nu'[, teacher']) once, all math on
the VPU while the next row-block DMA is in flight. Outputs alias the
inputs (the train step donates its state), so the update is in-place
in HBM. Identical math to the XLA path:

    mu' = b1 mu + (1-b1) g
    nu' = b2 nu + (1-b2) g^2
    u   = (mu'/c1) / (sqrt(nu'/c2) + eps) [+ wd p  on >=2-D kernels]
    p'  = p - lr u
    t'  = m t + (1-m) p'          (leaves present in the teacher tree)

Schedule scalars (lr, wd, m, bias corrections) are traced per-step
values passed through SMEM. Small leaves (biases, LN params) stay on
the inline jnp path — kernel-launch overhead would dominate them.

Reference provenance: the update semantics match transformers AdamW +
the per-step EMA loop of /root/reference/audiossl/methods/atst/model.py
(Lightning optimizer step + on_train_batch_end), re-fused TPU-side.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# leaves smaller than this run inline (launch overhead > stream time)
_MIN_PALLAS_ELEMS = 1 << 16


def _row_block(R: int, C: int) -> int:
    """Largest row-block that divides R exactly within the VMEM
    budget. Exact division keeps every grid step full — the outputs
    alias the parameter buffers in place, so no block may rely on
    masked partial writes. Returns 0 when no divisor fits (caller
    falls back to the inline XLA path)."""
    cap = max(1, (1 << 18) // max(C, 1))
    best = 0
    for b in range(1, cap + 1):
        if R % b == 0:
            best = b
    # degenerate divisors (tiny blocks) would serialize the stream
    return best if best * C >= (1 << 13) else 0


def leaf_update(p, g, mu, nu, t, lr, wd_eff, m, rc1, rc2, *, b1, b2,
                eps):
    """One leaf of the fused update; shared by the Pallas kernel body
    and the small-leaf inline path so both compute the same graph.
    ``t`` may be None (leaf absent from the teacher tree); ``wd_eff``
    is the scheduled wd pre-multiplied by the leaf's static mask."""
    mu2 = b1 * mu + (1.0 - b1) * g
    nu2 = b2 * nu + (1.0 - b2) * (g * g)
    u = (mu2 * rc1) / (jnp.sqrt(nu2 * rc2) + eps) + wd_eff * p
    p2 = p - lr * u
    t2 = None if t is None else m * t + (1.0 - m) * p2
    return p2, mu2, nu2, t2


def _kernel(sc_ref, p_ref, g_ref, mu_ref, nu_ref, *rest, b1, b2, eps,
            has_teacher):
    if has_teacher:
        t_ref, po_ref, muo_ref, nuo_ref, to_ref = rest
    else:
        (po_ref, muo_ref, nuo_ref), t_ref, to_ref = rest, None, None
    lr = sc_ref[0, 0]
    wd_eff = sc_ref[0, 1]
    m = sc_ref[0, 2]
    rc1 = sc_ref[0, 3]
    rc2 = sc_ref[0, 4]
    p2, mu2, nu2, t2 = leaf_update(
        p_ref[...], g_ref[...], mu_ref[...], nu_ref[...],
        None if t_ref is None else t_ref[...],
        lr, wd_eff, m, rc1, rc2, b1=b1, b2=b2, eps=eps)
    po_ref[...] = p2
    muo_ref[...] = mu2
    nuo_ref[...] = nu2
    if has_teacher:
        to_ref[...] = t2


def _leaf_pallas(p, g, mu, nu, t, scalars, *, b1, b2, eps,
                 interpret=False):
    """Stream one >=2-D f32 leaf through the fused-update kernel.
    Views the leaf as [R, C] (free reshape for row-major layouts) and
    grids over row blocks sized to keep every ref comfortably in VMEM
    while the next block's DMA overlaps."""
    shape = p.shape
    C = shape[-1]
    R = p.size // C
    as2d = lambda x: x.reshape(R, C)  # noqa: E731
    bR = _row_block(R, C)
    grid = (R // bR,)
    blk = pl.BlockSpec((bR, C), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    has_t = t is not None
    n_state = 4 if has_t else 3
    ins = [as2d(x) for x in ((p, g, mu, nu, t) if has_t
                             else (p, g, mu, nu))]
    out = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps,
                          has_teacher=has_t),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [blk] * len(ins),
        out_specs=[blk] * n_state,
        out_shape=[jax.ShapeDtypeStruct((R, C), jnp.float32)] * n_state,
        # in-place update: p/mu/nu(/t) inputs donate their buffers
        # (scalars ref is input 0, so state inputs start at 1; g at 2)
        input_output_aliases=(
            {1: 0, 3: 1, 4: 2, 5: 3} if has_t else {1: 0, 3: 1, 4: 2}),
        cost_estimate=pl.CostEstimate(
            flops=10 * R * C,
            bytes_accessed=(len(ins) + n_state) * R * C * 4,
            transcendentals=R * C,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(scalars, *ins)
    p2, mu2, nu2 = (x.reshape(shape) for x in out[:3])
    t2 = out[3].reshape(shape) if has_t else None
    return p2, mu2, nu2, t2


def _eligible(p) -> bool:
    if not (p.ndim >= 2 and p.dtype == jnp.float32
            and p.size >= _MIN_PALLAS_ELEMS):
        return False
    C = p.shape[-1]
    return _row_block(p.size // C, C) > 0


def fused_adamw_ema_pallas(params, grads, opt_state, teacher, lr, wd,
                           m, mask, cfg, *, interpret: bool = False):
    """Drop-in replacement for ``training.pretrain.fused_adamw_ema``
    (same tree semantics, same ``optax.ScaleByAdamState`` result) that
    routes large leaves through the Pallas streaming kernel."""
    import optax
    from flax import traverse_util

    count = optax.safe_int32_increment(opt_state.count)
    cnt = count.astype(jnp.float32)
    rc1 = 1.0 / (1.0 - cfg.b1 ** cnt)
    rc2 = 1.0 / (1.0 - cfg.b2 ** cnt)
    lr = jnp.asarray(lr, jnp.float32)
    wd = jnp.asarray(wd, jnp.float32)
    m = jnp.asarray(m, jnp.float32)
    zeros = jnp.zeros((3,), jnp.float32)
    sc_wd = jnp.concatenate(
        [jnp.stack([lr, wd, m, rc1, rc2]), zeros]).reshape(1, 8)
    sc_nowd = jnp.concatenate(
        [jnp.stack([lr, jnp.zeros_like(wd), m, rc1, rc2]),
         zeros]).reshape(1, 8)

    flat_p = traverse_util.flatten_dict(params)
    flat_g = traverse_util.flatten_dict(grads)
    flat_mu = traverse_util.flatten_dict(opt_state.mu)
    flat_nu = traverse_util.flatten_dict(opt_state.nu)
    flat_t = traverse_util.flatten_dict(teacher) if teacher is not None \
        else {}
    flat_mask = traverse_util.flatten_dict(mask)

    new_p, new_mu, new_nu, new_t = {}, {}, {}, {}
    for k, p in flat_p.items():
        g, mu, nu = flat_g[k], flat_mu[k], flat_nu[k]
        t = flat_t.get(k)
        use_wd = bool(flat_mask[k])
        if _eligible(p):
            p2, mu2, nu2, t2 = _leaf_pallas(
                p, g, mu, nu, t, sc_wd if use_wd else sc_nowd,
                b1=cfg.b1, b2=cfg.b2, eps=cfg.eps, interpret=interpret)
        else:
            p2, mu2, nu2, t2 = leaf_update(
                p, g, mu, nu, t, lr, wd if use_wd else 0.0, m, rc1,
                rc2, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)
        new_p[k], new_mu[k], new_nu[k] = p2, mu2, nu2
        if t2 is not None:
            new_t[k] = t2
    unf = traverse_util.unflatten_dict
    opt_state = optax.ScaleByAdamState(
        count=count, mu=unf(new_mu), nu=unf(new_nu))
    return (unf(new_p), opt_state,
            unf(new_t) if teacher is not None else None)


def fused_opt_available() -> bool:
    """Pallas optimizer path: single-TPU programs only — the custom
    call has no SPMD partitioning rule, so sharded (ZeRO-1) state
    stays on the XLA elementwise path (parallel/mesh.py).

    Default ON since round 5: the round-4 A/B measured the XLA path
    marginally faster (353.52 vs 352.33 clips/s — custom-call boundary
    copies ate the kernel's win), but once the fused attention block
    kernel removed those seams the retry measured the Pallas path
    net-positive (369.89 vs 366.46 = +0.9%, docs/PROFILE.md round-5
    re-run table). Opt out with AUDIOSSL_FUSED_OPT=0."""
    return (jax.default_backend() == "tpu"
            and os.environ.get("AUDIOSSL_FUSED_OPT", "1") == "1"
            and len(jax.devices()) == 1)
