"""Fixed-size Hungarian assignment, fully on-device.

The reference calls scipy.optimize.linear_sum_assignment inside the SSV L1
loss — a device->host sync per batch element
(ref: lib/models/multi_person_posenet_ssv.py:25,182). Problem sizes are tiny
(<= MAX_PEOPLE_NUM x MAX_PEOPLE_NUM = 10x10), so here the classic O(n^3)
Jonker-Volgenant shortest-augmenting-path algorithm runs in jnp with static
shapes and lax control flow — jit-safe, vmappable, no host roundtrip.

Rectangular / masked problems are handled by padding to a K x K square with a
value just above the max real cost: the square optimum then assigns exactly
min(R, C) real pairs with minimal total real cost, matching scipy's
rectangular behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = 1e12


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve the square assignment problem, minimizing total cost.

    Args:
      cost: (K, K) float matrix.
    Returns:
      (K,) int32 row2col: column assigned to each row.
    """
    K = cost.shape[0]
    cost = cost.astype(jnp.float32)

    # Duals u (rows, + 1 virtual), v (cols, + 1 virtual slot K).
    u0 = jnp.zeros(K + 1, dtype=jnp.float32)
    v0 = jnp.zeros(K + 1, dtype=jnp.float32)
    # col2row[j] = row assigned to column j, -1 if free. Slot K is the virtual
    # column that temporarily holds the row being inserted.
    col2row0 = -jnp.ones(K + 1, dtype=jnp.int32)

    def insert_row(carry, i):
        u, v, col2row = carry
        col2row = col2row.at[K].set(i)

        def jv_cond(st):
            return ~st[6]

        def jv_step(st):
            u, v, minv, used, way, j0, _ = st
            used = used.at[j0].set(True)
            i0 = col2row[j0]
            cand = jnp.concatenate(
                [cost[i0] - u[i0] - v[:K], jnp.array([INF], jnp.float32)]
            )
            better = (cand < minv) & ~used
            minv = jnp.where(better, cand, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # dual update: used columns' rows += delta, used cols -= delta,
            # unused columns' tentative costs shrink by delta.
            u = u.at[col2row].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used, minv, minv - delta)
            done = col2row[j1] < 0
            return (u, v, minv, used, way, j1, done)

        init = (
            u,
            v,
            jnp.full(K + 1, INF, dtype=jnp.float32),
            jnp.zeros(K + 1, dtype=bool),
            jnp.full(K + 1, K, dtype=jnp.int32),
            jnp.int32(K),
            jnp.bool_(False),
        )
        u, v, _, _, way, j0, _ = jax.lax.while_loop(jv_cond, jv_step, init)

        # Backtrack the augmenting path: col2row[j0] <- col2row[way[j0]].
        def bt_cond(st):
            _, j0, steps = st
            return (j0 != K) & (steps <= K)

        def bt_step(st):
            col2row, j0, steps = st
            j1 = way[j0]
            col2row = col2row.at[j0].set(col2row[j1])
            return col2row, j1, steps + 1

        col2row, _, _ = jax.lax.while_loop(bt_cond, bt_step, (col2row, j0, 0))
        col2row = col2row.at[K].set(-1)
        return (u, v, col2row), None

    (_, _, col2row), _ = jax.lax.scan(
        insert_row, (u0, v0, col2row0), jnp.arange(K, dtype=jnp.int32)
    )

    row2col = jnp.zeros(K, dtype=jnp.int32)
    row2col = row2col.at[col2row[:K]].set(jnp.arange(K, dtype=jnp.int32))
    return row2col


def masked_assignment_cost(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Minimal assignment cost over valid rows x valid cols.

    Pads invalid entries with BIG so exactly min(#rows, #cols) real pairs are
    matched; returns the sum of matched *real* pair costs (scalar), matching
    the reference's ``d_matrix[matches_x, matches_y].sum()``
    (ref: multi_person_posenet_ssv.py:182-183).
    """
    real = row_valid[:, None] & col_valid[None, :]
    # Pad just above the real max so dual variables stay in the real-cost
    # scale — a huge constant (1e6) destroys f32 precision in the solver.
    pad_val = jnp.max(jnp.where(real, cost, 0.0)) + 1.0
    padded = jnp.where(real, cost, pad_val)
    # the assignment itself is non-differentiable (reference solves it on
    # detached host tensors); gradients flow through the picked costs only
    row2col = hungarian(jax.lax.stop_gradient(padded))
    picked = jnp.take_along_axis(padded, row2col[:, None], axis=1)[:, 0]
    picked_real = jnp.take_along_axis(
        real.astype(cost.dtype), row2col[:, None], axis=1
    )[:, 0]
    return jnp.sum(picked * picked_real)
