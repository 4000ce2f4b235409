"""Parameter initializers matching torch defaults.

The reference relies on torch 0.4's default inits (kaiming-uniform with
a=sqrt(5) for conv/linear weights, i.e. U(-1/sqrt(fan_in), +) — and the
same bound for biases).  Training-trajectory parity depends on the init
*distribution*, so we reproduce it for JAX param shapes (conv kernels
are HWIO, dense kernels are (in, out)).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _fan_in(shape):
    if len(shape) == 4:     # conv HWIO
        return shape[0] * shape[1] * shape[2]
    if len(shape) == 2:     # dense (in, out)
        return shape[0]
    if len(shape) == 1:
        raise ValueError("bias init needs explicit fan_in")
    return int(np.prod(shape[:-1]))


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch conv/linear default."""
    bound = 1.0 / np.sqrt(_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def routing_weights_init(key, shape, dtype=jnp.float32):
    """0.1 * N(0, 1) — reference models.py:57-58."""
    return 0.1 * jax.random.normal(key, shape, dtype)
