"""Chunked prefix scans over batched EC points (or any monoid pytree).

`jax.lax.associative_scan` instantiates its combine fn O(log n) times; with a
~50-op EC add whose body contains lax.scans, that explodes XLA compile time.
This module provides a *grid scan*: reshape the batch axis into (chunks, L),
run one `fori_loop` sequential scan along L (a single combine instance,
batched over all chunks on VPU lanes), recursively scan the chunk totals, and
broadcast-add the exclusive chunk prefix (one more combine instance). Work is
~2n combines, depth ~L per level, and the whole thing traces to ~2-3 combine
instances per level (2-3 levels for n up to 2^24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _seq_scan_last(combine, pt, L: int):
    """Inclusive sequential scan along the last axis (length L) via fori_loop.

    One combine instance in the trace; L-1 sequential steps, each batched over
    every other axis.
    """

    def body(j, arr):
        prev = tuple(jax.lax.dynamic_index_in_dim(c, j - 1, axis=c.ndim - 1) for c in arr)
        cur = tuple(jax.lax.dynamic_index_in_dim(c, j, axis=c.ndim - 1) for c in arr)
        new = combine(
            tuple(c.squeeze(-1) for c in prev), tuple(c.squeeze(-1) for c in cur)
        )
        return tuple(
            jax.lax.dynamic_update_index_in_dim(c, n[..., None], j, axis=c.ndim - 1)
            for c, n in zip(arr, new)
        )

    return jax.lax.fori_loop(1, L, body, pt)


def prefix_scan(combine, identity_fn, pt, chunk: int = 128, reverse: bool = False):
    """Inclusive prefix scan of `pt` (pytree tuple of arrays, last axis = n)
    under `combine`. `identity_fn(k)` makes a pytree of k identity elements
    (leaves shaped (..., k), broadcast-compatible with pt's leaves).

    reverse=True gives suffix sums (scan from the right).
    """
    if reverse:
        pt = tuple(jnp.flip(c, axis=-1) for c in pt)
        out = prefix_scan(combine, identity_fn, pt, chunk=chunk, reverse=False)
        return tuple(jnp.flip(c, axis=-1) for c in out)

    n = pt[0].shape[-1]
    if n == 1:
        return pt
    if n <= chunk:
        return _seq_scan_last(combine, pt, n)

    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        ident = identity_fn(pad)
        pt = tuple(
            jnp.concatenate([c, jnp.broadcast_to(i, c.shape[:-1] + (pad,))], axis=-1)
            for c, i in zip(pt, ident)
        )

    grid = tuple(c.reshape(*c.shape[:-1], n_chunks, chunk) for c in pt)
    within = _seq_scan_last(combine, grid, chunk)
    totals = tuple(c[..., -1] for c in within)  # (..., n_chunks)
    tot_incl = prefix_scan(combine, identity_fn, totals, chunk=chunk)
    # exclusive chunk prefix: shift right by one, identity first
    ident1 = identity_fn(1)
    tot_excl = tuple(
        jnp.concatenate([jnp.broadcast_to(i, c.shape[:-1] + (1,)), c[..., :-1]], axis=-1)
        for i, c in zip(ident1, tot_incl)
    )
    out = combine(tuple(c[..., None] for c in tot_excl), within)
    out = tuple(c.reshape(*c.shape[:-2], n_chunks * chunk) for c in out)
    if pad:
        out = tuple(c[..., :n] for c in out)
    return out


def reduce_all(combine, identity_fn, pt, chunk: int = 128):
    """Monoid reduction of the last axis -> batch-() pytree (last axis dropped)."""
    n = pt[0].shape[-1]
    while n > 1:
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        if pad:
            ident = identity_fn(pad)
            pt = tuple(
                jnp.concatenate([c, jnp.broadcast_to(i, c.shape[:-1] + (pad,))], axis=-1)
                for c, i in zip(pt, ident)
            )
        grid = tuple(c.reshape(*c.shape[:-1], n_chunks, chunk) for c in pt)

        def body(j, acc):
            cur = tuple(
                jax.lax.dynamic_index_in_dim(c, j, axis=c.ndim - 1).squeeze(-1)
                for c in grid
            )
            return combine(acc, cur)

        init = tuple(
            jax.lax.dynamic_index_in_dim(c, 0, axis=c.ndim - 1).squeeze(-1)
            for c in grid
        )
        pt = jax.lax.fori_loop(1, chunk, body, init)
        n = n_chunks
    return tuple(c.squeeze(-1) for c in pt)
