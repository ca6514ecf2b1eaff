"""Learning-rate schedules as optax schedules.

Behavioural parity with the reference's iteration-stepped machinery
(``core/trainer/lr_scheduler.py`` + vendored ``core/trainer/warm_up.py``):
the reference steps its LambdaLR *per iteration* inside
``warmup.dampening()`` (base.py:261-263), with epoch milestones converted to
iteration milestones (base.py:121-122). Here that whole stack collapses into
one pure function of the step counter — no stateful scheduler objects.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_multistep(
    base_lr: float,
    warmup_iters: int,
    milestones_iters: Sequence[int],
    gamma: float = 0.1,
    warmup_kind: str = "linear",
) -> optax.Schedule:
    """Linear (or exponential) warmup multiplied into a multistep decay.

    Matches ``warm_up_scheduler`` (lr_scheduler.py:8-34): during warmup the lr
    is dampened by (step+1)/warmup_iters; after each milestone it is scaled by
    ``gamma``.
    """
    ms = jnp.asarray(sorted(milestones_iters), dtype=jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        if warmup_kind == "exponential":
            tau = jnp.maximum(warmup_iters, 1)
            damp = 1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0) / tau)
        else:
            damp = jnp.minimum(
                (step.astype(jnp.float32) + 1.0) / jnp.maximum(warmup_iters, 1), 1.0
            )
        decays = gamma ** jnp.sum(step >= ms).astype(jnp.float32)
        return base_lr * damp * decays

    return schedule


def untuned_linear_warmup_period(beta2: float = 0.999) -> int:
    """Adam-rule warmup length (vendored pytorch_warmup ``UntunedLinearWarmup``
    semantics, reference warm_up.py:118-137): period = 2/(1-beta2)."""
    import math
    return int(math.ceil(2.0 / (1.0 - beta2)))


def untuned_exponential_warmup_tau(beta2: float = 0.999) -> float:
    """Reference warm_up.py:140-159: tau = 1/(1-beta2)."""
    return 1.0 / (1.0 - beta2)


def cosine_with_warmup(
    base_lr: float, warmup_iters: int, total_iters: int,
    final_scale: float = 0.01,
) -> optax.Schedule:
    """Cosine decay with linear warmup — a TPU-friendly extra not in the
    reference (provided because long TPU runs prefer smooth schedules)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_iters, 1),
        decay_steps=max(total_iters, warmup_iters + 1),
        end_value=base_lr * final_scale,
    )
