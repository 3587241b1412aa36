"""Training schedules as pure functions of the step counter.

The reference precomputes numpy arrays indexed by ``global_step``
(``cosine_scheduler_step``, reference ``audiossl/utils/common.py:29-39``)
and mutates optimizer param groups every step. Here the same piecewise
(linear warmup -> cosine decay) schedule is a jit-friendly closed-form
function of the step, usable directly inside the compiled train step for
lr, weight decay, and the EMA teacher momentum.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cosine_schedule(base_value: float, final_value: float, max_steps: int,
                    warmup_steps: int = 0, start_warmup_value: float = 0.0):
    """Returns f(step) -> value, matching the reference array semantics:

    warmup: np.linspace(start, base, warmup_steps) evaluated at step
    (i.e. start + step * (base-start)/(warmup_steps-1), step < warmup);
    then cosine from base to final over the remaining steps.
    """
    decay_steps = max_steps - warmup_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 1:
            warm = start_warmup_value + step * (
                (base_value - start_warmup_value) / (warmup_steps - 1)
            )
        else:
            warm = jnp.full_like(step, base_value)
        i = jnp.clip(step - warmup_steps, 0, max(decay_steps - 1, 1))
        cos = final_value + 0.5 * (base_value - final_value) * (
            1.0 + jnp.cos(jnp.pi * i / decay_steps)
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def cosine_schedule_array(base_value, final_value, max_steps, warmup_steps=0,
                          start_warmup_value=0.0):
    """Precomputed array form (identical to the reference helper), kept for
    golden tests and host-side inspection."""
    warmup = np.array([])
    if warmup_steps > 0:
        warmup = np.linspace(start_warmup_value, base_value, warmup_steps)
    iters = np.arange(max_steps - warmup_steps)
    sched = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters))
    )
    return np.concatenate((warmup, sched))
