"""LR schedules (reference utils/general.py:33-66 get_expon_lr_func)."""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(lr_init: float, lr_final: float, *, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000,
             step_sub: int = 0):
    """Log-lerp decay with optional sine delay ramp. Returns a jnp-traceable
    schedule fn(step) -> lr (works both as optax schedule and host-side)."""
    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay = 1.0
        t = jnp.clip((step - step_sub) / (max_steps - step_sub), 0, 1)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t)
                           + jnp.log(lr_final) * t)
        out = delay * log_lerp
        return jnp.where(step < 0, 0.0, out)
    return helper
