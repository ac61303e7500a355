"""Shared test helpers."""

import jax
import jax.numpy as jnp


def denseify(params, key=None, scale=0.02):
    """Add small RANDOM noise to every float leaf so zero-init tensors
    (AdaLN-zero, proj_out) participate in the forward pass. Random — not a
    constant — because constant matrices are rank-1 and can cancel exactly
    through layer_norm, hiding real sensitivity."""
    key = key if key is not None else jax.random.PRNGKey(7)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, [
        l + scale * jax.random.normal(k, l.shape) if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)
    ])
