"""Teacher-student pretraining core: state, optimizer, EMA, SPMD step.

TPU-native replacement for the reference's Lightning machinery
(reference ``methods/atst/model.py``, ``methods/atstframe/model.py``):
everything that happens per step — augmentation, both forwards, the
loss, AdamW with scheduled lr/wd, and the EMA teacher update — is one
jitted SPMD program over the data mesh. The reference instead splits
this across DataLoader workers (CPU DSP), the DDP forward/backward
(NCCL all-reduce), a Python schedule loop mutating optimizer param
groups, and an `on_train_batch_end` EMA parameter loop.

Optimizer semantics matched to the reference: transformers AdamW
(betas (0.9, 0.999), eps 1e-6, bias correction, decoupled weight
decay), two param groups — weight decay only on >=2-D weights
(reference ``utils/common.py:41-68`` get_params_groups), lr/wd taken
from cosine schedules of the step (``cosine_scheduler_step``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax
from flax import traverse_util

from audiossl_tpu.models.atst import AudioTransformer
from audiossl_tpu.models.byol import Projector
from audiossl_tpu.training.schedules import cosine_schedule


class Branch(nn.Module):
    """encoder + projector(+predictor) — the reference MultiCropWrapper
    (models/atst/byol.py:82-121, methods/atstframe/byol.py:88-138) minus
    the group-by-width loop (crops are equal-width padded; one batched
    encoder call is exact)."""
    encoder: AudioTransformer
    projector: str = "mlp"
    predictor: bool = True
    out_dim: int = 256
    hidden_dim: int = 4096

    def setup(self):
        self.head = Projector(
            embed_dim=self.encoder.embed_dim,
            projector=self.projector,
            predictor=self.predictor,
            hidden_dim=self.hidden_dim,
            out_dim=self.out_dim,
            dtype=self.encoder.dtype,
            name="head",
        )

    def __call__(self, mel, length=None, mask_index=None, apply_mask=True,
                 train=True):
        out = self.encoder(
            mel, length, mask_index=mask_index, apply_mask=apply_mask,
            deterministic=not train)
        if self.encoder.use_cls:
            z = self.head(out, train=train)
            return z
        frames, sel = out
        z = self.head(frames, train=train, mask=sel)
        return z, sel


class PretrainState(NamedTuple):
    step: jnp.ndarray
    params: Any            # student
    batch_stats: Any       # student BN running stats
    teacher_params: Any
    teacher_batch_stats: Any
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 5e-4
    warmup_steps: int = 1300
    max_steps: int = 39010
    ema: float = 0.99
    wd_start: float = 0.04
    wd_end: float = 0.4
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-6

    def lr_schedule(self):
        return cosine_schedule(self.learning_rate, 1e-6, self.max_steps,
                               self.warmup_steps)

    def wd_schedule(self):
        return cosine_schedule(self.wd_start, self.wd_end, self.max_steps, 0)

    def ema_schedule(self):
        return cosine_schedule(self.ema, 1.0, self.max_steps, 0)


def wd_mask(params):
    """True where decoupled weight decay applies: >=2-D kernels only
    (reference get_params_groups: not-regularized = bias or 1-D)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def make_adam(cfg: OptimizerConfig):
    return optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)


def apply_adamw_update(params, adam_updates, lr, wd, mask):
    """Decoupled AdamW: p <- p - lr * (adam_update + wd*p [kernels])."""
    def upd(p, u, m):
        step = u + (wd * p if m else 0.0)
        return p - lr * step
    return jax.tree.map(upd, params, adam_updates, mask)


def ema_update(teacher, student, m):
    """EMA teacher <- m*teacher + (1-m)*student over the *teacher's*
    tree structure (encoder + projector; the predictor exists only in
    the student — reference update_teacher, models/atst/atst.py:27-34)."""
    flat_t = traverse_util.flatten_dict(teacher)
    flat_s = traverse_util.flatten_dict(student)
    out = {k: m * v + (1.0 - m) * flat_s[k] for k, v in flat_t.items()}
    return traverse_util.unflatten_dict(out)


def fused_adamw_ema(params, grads, opt_state, teacher, lr, wd, m, mask,
                    cfg: OptimizerConfig):
    """Adam moments + AdamW param update + EMA teacher update in ONE
    traversal — numerically identical to scale_by_adam ∘
    apply_adamw_update ∘ ema_update but expressed per leaf so XLA emits
    one multi-output elementwise fusion per parameter: one HBM read of
    (p, g, mu, nu[, t]) and one write of (p', mu', nu'[, t']).  The
    split pipeline materializes the adam-update tree and re-reads p'
    for the EMA — ~25% more optimizer HBM traffic, which is what bounds
    this phase of the step (docs/PROFILE.md: optimizer+EMA ≈ 8 ms,
    HBM-bound).  opt_state stays an ``optax.ScaleByAdamState`` so ZeRO
    sharding (parallel/mesh.shard_opt_state_tree) and checkpoints are
    unchanged.  Replaces the reference's three phases (AdamW.step via
    Lightning, then the ``on_train_batch_end`` EMA python loop —
    methods/atst/model.py:49, atst.py:27-34)."""
    count = optax.safe_int32_increment(opt_state.count)
    c1 = 1.0 - cfg.b1 ** count
    c2 = 1.0 - cfg.b2 ** count
    flat_p = traverse_util.flatten_dict(params)
    flat_g = traverse_util.flatten_dict(grads)
    flat_mu = traverse_util.flatten_dict(opt_state.mu)
    flat_nu = traverse_util.flatten_dict(opt_state.nu)
    flat_t = traverse_util.flatten_dict(teacher) if teacher is not None \
        else {}
    flat_mask = traverse_util.flatten_dict(mask)
    new_p, new_mu, new_nu, new_t = {}, {}, {}, {}
    for k, p in flat_p.items():
        g = flat_g[k]
        mu = cfg.b1 * flat_mu[k] + (1.0 - cfg.b1) * g
        nu = cfg.b2 * flat_nu[k] + (1.0 - cfg.b2) * (g * g)
        u = (mu / c1) / (jnp.sqrt(nu / c2) + cfg.eps)
        if flat_mask[k]:
            u = u + wd * p
        p2 = p - lr * u
        new_p[k], new_mu[k], new_nu[k] = p2, mu, nu
        if k in flat_t:
            new_t[k] = m * flat_t[k] + (1.0 - m) * p2
    unf = traverse_util.unflatten_dict
    opt_state = optax.ScaleByAdamState(
        count=count, mu=unf(new_mu), nu=unf(new_nu))
    return (unf(new_p), opt_state,
            unf(new_t) if teacher is not None else None)


def adamw_ema_update(params, grads, opt_state, teacher, lr, wd, m,
                     mask, cfg: OptimizerConfig):
    """Route the fused update to the Pallas streaming kernel on a
    single TPU (ops/pallas_opt.py: one HBM read+write per state leaf at
    stream bandwidth — XLA's per-leaf fusions measured 5x slower), or
    the XLA elementwise path everywhere else (CPU, and sharded ZeRO-1
    state, which the opaque custom call cannot partition)."""
    from audiossl_tpu.ops.pallas_opt import (
        fused_adamw_ema_pallas, fused_opt_available)
    if fused_opt_available():
        return fused_adamw_ema_pallas(params, grads, opt_state, teacher,
                                      lr, wd, m, mask, cfg)
    return fused_adamw_ema(params, grads, opt_state, teacher, lr, wd, m,
                           mask, cfg)


def copy_into_structure(target_tree, source_tree):
    """Fill every leaf of ``target_tree`` with the same-path leaf of
    ``source_tree`` — the teacher-init rule of the reference (teacher =
    student restricted to the teacher's own submodules: sans predictor
    for ATST, sans projector for the data2vec variant; atst.py:16-22,
    atstframe/model.py:62-66)."""
    flat_t = traverse_util.flatten_dict(target_tree)
    flat_s = traverse_util.flatten_dict(source_tree)
    return traverse_util.unflatten_dict({k: flat_s[k] for k in flat_t})


def init_pretrain_state(rng, student: Branch, teacher: Branch,
                        example_inputs, cfg: OptimizerConfig,
                        init_kwargs: Optional[dict] = None) -> PretrainState:
    """Initialize student params, copy into the teacher, build opt state."""
    init_kwargs = init_kwargs or {}
    k0, k1 = jax.random.split(rng)
    variables = student.init(
        {"params": k0, "droppath": k1}, *example_inputs, train=False,
        **init_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    t_vars = teacher.init({"params": k0, "droppath": k1}, *example_inputs,
                          train=False, **init_kwargs)
    # materialize distinct buffers — the state tree must not alias the
    # student (buffer donation would otherwise see the same buffer twice)
    teacher_params = jax.tree.map(
        jnp.array, copy_into_structure(t_vars["params"], params))
    t_stats = t_vars.get("batch_stats", {})
    if t_stats:
        t_stats = jax.tree.map(
            jnp.array, copy_into_structure(t_stats, batch_stats))
    opt_state = make_adam(cfg).init(params)
    return PretrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        teacher_params=teacher_params,
        teacher_batch_stats=t_stats,
        opt_state=opt_state,
        rng=rng,
    )


def make_pretrain_step(student: Branch, teacher: Branch,
                       cfg: OptimizerConfig,
                       forward_loss: Callable,
                       donate: bool = True):
    """Build the jitted SPMD train step.

    ``forward_loss(student_apply, teacher_apply, batch, rng)`` must
    return ``(loss, aux_dict)`` where aux contains at least the BN
    ``updates`` trees under keys 'student_stats'/'teacher_stats'.

    The returned step: (state, batch) -> (state, metrics). All
    collectives (grad mean, BYOL variance stats, BN stats) are implicit
    global reductions inserted by XLA under the data mesh.
    """
    lr_s = cfg.lr_schedule()
    wd_s = cfg.wd_schedule()
    ema_s = cfg.ema_schedule()

    def step_fn(state: PretrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        lr = lr_s(state.step)
        wd = wd_s(state.step)
        m = ema_s(state.step)

        def loss_fn(params):
            def student_apply(*a, rngs=None, **kw):
                return student.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    *a, train=True, mutable=["batch_stats"],
                    rngs=rngs, **kw)

            def teacher_apply(*a, rngs=None, **kw):
                return teacher.apply(
                    {"params": state.teacher_params,
                     "batch_stats": state.teacher_batch_stats},
                    *a, train=True, mutable=["batch_stats"],
                    rngs=rngs, **kw)

            return forward_loss(student_apply, teacher_apply, batch,
                                step_rng)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        mask = wd_mask(state.params)
        params, opt_state, teacher_params = adamw_ema_update(
            state.params, grads, state.opt_state, state.teacher_params,
            lr, wd, m, mask, cfg)
        new_state = PretrainState(
            step=state.step + 1,
            params=params,
            batch_stats=aux.pop("student_stats")["batch_stats"],
            teacher_params=teacher_params,
            teacher_batch_stats=aux.pop("teacher_stats")["batch_stats"],
            opt_state=opt_state,
            rng=rng,
        )
        metrics = {"loss": loss, "lr": lr, "wd": wd, "ema": m, **aux}
        return new_state, metrics

    return step_fn
