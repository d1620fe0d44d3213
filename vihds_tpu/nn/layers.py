"""Minimal layer primitives: explicit param dicts + pure functions.

Initialisations mirror the torch defaults the reference relies on
(nn.Linear kaiming-uniform ~ U(+-1/sqrt(fan_in)), xavier-uniform where the
reference asks for it, orthogonal for the encoder trunk —
reference vihds/encoders.py:36-41, vihds/precisions.py:57-72).
"""

import numpy as np
import jax
import jax.numpy as jnp


def linear_init(key, n_in, n_out, use_bias=True, mode="default", gain=1.0):
    """Weight [n_in, n_out] (+ bias [n_out]).

    mode: 'default' = torch nn.Linear default (U(+-1/sqrt(n_in)));
          'xavier'  = xavier/glorot uniform with gain;
          'orthogonal';
          'normal'  = N(mean=2.0, std=1.5) (device-conditioner init,
                      reference vihds/ode.py:108-109).
    """
    kw, kb = jax.random.split(key)
    if mode == "default":
        bound = 1.0 / np.sqrt(n_in)
        w = jax.random.uniform(kw, (n_in, n_out), minval=-bound, maxval=bound)
    elif mode == "xavier":
        bound = gain * np.sqrt(6.0 / (n_in + n_out))
        w = jax.random.uniform(kw, (n_in, n_out), minval=-bound, maxval=bound)
    elif mode == "orthogonal":
        w = jax.nn.initializers.orthogonal()(kw, (n_in, n_out))
    elif mode == "normal":
        w = 2.0 + 1.5 * jax.random.normal(kw, (n_in, n_out))
    else:
        raise ValueError(mode)
    p = {"w": w.astype(jnp.float32)}
    if use_bias:
        bound = 1.0 / np.sqrt(n_in)
        p["b"] = jax.random.uniform(kb, (n_out,), minval=-bound, maxval=bound).astype(jnp.float32)
    return p


def linear_apply(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def conv1d_init(key, n_in_channels, n_filters, filter_size, mode="orthogonal"):
    """Conv1d weight [n_filters, n_in_channels, filter_size] + bias [n_filters]
    (torch layout; reference uses orthogonal weight init,
    vihds/encoders.py:35-36)."""
    kw, kb = jax.random.split(key)
    fan_in = n_in_channels * filter_size
    if mode == "orthogonal":
        w2d = jax.nn.initializers.orthogonal()(kw, (n_filters, fan_in))
        w = w2d.reshape(n_filters, n_in_channels, filter_size)
    else:
        bound = 1.0 / np.sqrt(fan_in)
        w = jax.random.uniform(
            kw, (n_filters, n_in_channels, filter_size), minval=-bound, maxval=bound
        )
    bound = 1.0 / np.sqrt(fan_in)
    b = jax.random.uniform(kb, (n_filters,), minval=-bound, maxval=bound)
    return {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}


def conv1d_apply(p, x):
    """x [B, C, T] -> [B, F, T - fs + 1] (valid padding, stride 1)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + p["b"][None, :, None]


def avgpool1d(x, pool_size):
    """Sliding-window mean with stride 1 over the last axis: [B, C, T] ->
    [B, C, T - pool + 1] (parity: nn.AvgPool1d(pool, stride=1),
    reference vihds/encoders.py:39)."""
    w = jnp.full((1, 1, pool_size), 1.0 / pool_size, x.dtype)
    return jax.lax.conv_general_dilated(
        x.reshape(-1, 1, x.shape[-1]),
        w,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    ).reshape(x.shape[0], x.shape[1], -1)
