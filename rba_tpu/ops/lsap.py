"""Exact linear-sum-assignment, fully on-device (JAX/XLA).

The reference matcher syncs every training step to the host to run
``scipy.optimize.linear_sum_assignment`` on CPU per image
(/root/reference/mask2former/modeling/matcher.py:96-156 — a device→host
boundary flagged in SURVEY.md §3.2).  On TPU that sync would serialize the
step, so we implement the same shortest-augmenting-path (Jonker–Volgenant)
algorithm in ``lax`` control flow: static row loop, bounded while loops,
vmappable over the batch.  Exactness is tested against scipy.

Solves min-cost assignment for an (R, C) cost matrix with R <= C.
Returns col4row: for each row, the assigned column.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


def _augmenting_path_step(cost, u, v, row4col, col4row, cur_row):
    """Find the shortest augmenting path from cur_row; update duals and
    augment.  Mirrors the classic rectangular LSAP inner loop."""
    nr, nc = cost.shape

    def sp_cond(state):
        sink = state[0]
        return sink < 0

    def sp_body(state):
        sink, i, min_val, sc, sr, spc, path = state
        sr = sr.at[i].set(True)
        reduced = min_val + cost[i] - u[i] - v  # (C,)
        better = (reduced < spc) & (~sc)
        spc = jnp.where(better, reduced, spc)
        path = jnp.where(better, i, path)
        # pick lowest-cost unscanned column, preferring free columns on ties
        masked = jnp.where(sc, INF, spc)
        m = jnp.min(masked)
        cand = masked == m
        free_cand = cand & (row4col < 0)
        j = jnp.where(jnp.any(free_cand), jnp.argmax(free_cand), jnp.argmax(cand)).astype(
            jnp.int32
        )
        min_val = m
        is_free = row4col[j] < 0
        sink = jnp.where(is_free, j, -1)
        i = jnp.where(is_free, i, row4col[j])
        sc = sc.at[j].set(True)
        return sink, i, min_val, sc, sr, spc, path

    init = (
        jnp.int32(-1),
        cur_row,
        jnp.float32(0.0),
        jnp.zeros((nc,), bool),
        jnp.zeros((nr,), bool),
        jnp.full((nc,), INF),
        jnp.full((nc,), -1, jnp.int32),
    )
    sink, _, min_val, sc, sr, spc, path = jax.lax.while_loop(sp_cond, sp_body, init)

    # dual updates
    u = u.at[cur_row].add(min_val)
    other = sr & (jnp.arange(cost.shape[0]) != cur_row)
    u = jnp.where(other, u + min_val - spc[jnp.clip(col4row, 0, cost.shape[1] - 1)], u)
    v = jnp.where(sc, v - (min_val - spc), v)

    # augment: walk back through path
    def aug_cond(state):
        done = state[0]
        return ~done

    def aug_body(state):
        done, j, row4col, col4row = state
        i = path[j]
        row4col = row4col.at[j].set(i)
        prev = col4row[i]
        col4row = col4row.at[i].set(j)
        done = i == cur_row
        return done, prev, row4col, col4row

    _, _, row4col, col4row = jax.lax.while_loop(
        aug_cond, aug_body, (jnp.bool_(False), sink, row4col, col4row)
    )
    return u, v, row4col, col4row


def linear_sum_assignment(cost: jax.Array) -> jax.Array:
    """(R, C) float32 cost, R <= C → (R,) assigned column per row (exact)."""
    nr, nc = cost.shape
    assert nr <= nc, "requires rows <= cols"
    cost = cost.astype(jnp.float32)

    u = jnp.zeros((nr,), jnp.float32)
    v = jnp.zeros((nc,), jnp.float32)
    row4col = jnp.full((nc,), -1, jnp.int32)
    col4row = jnp.full((nr,), -1, jnp.int32)

    def body(r, carry):
        u, v, row4col, col4row = carry
        return _augmenting_path_step(cost, u, v, row4col, col4row, r)

    u, v, row4col, col4row = jax.lax.fori_loop(0, nr, body, (u, v, row4col, col4row))
    return col4row


batched_linear_sum_assignment = jax.vmap(linear_sum_assignment)
