"""Shared numpy/jnp oracles for kernel-parity tests.

One definition of the O(T^2) causal-attention reference, imported by both
tests/test_pallas_attention.py (flash kernel) and
tests/test_ring_attention.py (context-parallel ring) so the two kernel
families are always validated against the SAME math.
"""

import jax
import jax.numpy as jnp
import numpy as np


def ref_causal_mha(q, k, v):
    """O(T^2) oracle: softmax((q k^T)/sqrt(Dh) + causal mask) v."""
    Dh = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / jnp.sqrt(Dh).astype(jnp.float32)
    T = q.shape[1]
    s = jnp.where(jnp.tril(jnp.ones((T, T), bool)), s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def qkv(T, B=2, H=2, Dh=16, seed=0):
    r = np.random.default_rng(seed)
    return tuple(jnp.asarray(r.standard_normal((B, T, H, Dh)), jnp.float32)
                 for _ in range(3))
