"""DDA voxel traversal along rays (reference: util/voxel_raycaster.hpp:20-60).

Batched: traverses up to `max_steps` voxels for every ray at once, returning
the visited voxel coordinates with a validity mask — used for occupancy
updates / free-space carving."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops.voxel_keys import fast_floor


def raycast_voxels(origins: jax.Array, targets: jax.Array, leaf: float, max_steps: int):
    """-> (coords [R, max_steps, 3] int32, valid [R, max_steps]).

    Visits voxels from origin toward target (inclusive of the start voxel,
    exclusive of the target's voxel), standard Amanatides-Woo DDA.
    """
    inv_leaf = 1.0 / leaf
    o = origins * inv_leaf
    t = targets * inv_leaf
    d = t - o
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dn = d / jnp.maximum(dist, 1e-12)

    cur = fast_floor(o)
    end = fast_floor(t)
    step = jnp.where(dn > 0, 1, -1).astype(jnp.int32)
    # parametric distance to the first boundary along each axis
    next_boundary = jnp.where(dn > 0, cur + 1, cur).astype(o.dtype)
    safe_dn = jnp.where(jnp.abs(dn) < 1e-12, 1e-12, dn)
    t_max = (next_boundary - o) / safe_dn
    t_max = jnp.where(jnp.abs(dn) < 1e-12, jnp.inf, t_max)
    t_delta = jnp.abs(1.0 / safe_dn)

    def body(carry, _):
        cur, t_max, alive = carry
        done = jnp.all(cur == end, axis=-1) | jnp.logical_not(alive)
        out_coord = cur
        out_valid = jnp.logical_not(done) | (alive & jnp.all(cur == end, axis=-1) & False)
        # actually: emit current voxel if still alive and not yet at end
        emit = alive & jnp.logical_not(jnp.all(cur == end, axis=-1))
        axis = jnp.argmin(t_max, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_cur = cur + step * onehot
        new_tmax = t_max + t_delta * onehot.astype(t_max.dtype)
        new_cur = jnp.where(emit[..., None], new_cur, cur)
        new_tmax = jnp.where(emit[..., None], new_tmax, t_max)
        return (new_cur, new_tmax, emit), (out_coord, emit)

    (c_f, _, _), (coords, valid) = jax.lax.scan(
        body, (cur, t_max, jnp.ones(origins.shape[:-1], dtype=bool)), None, length=max_steps
    )
    # scan stacks along axis 0 -> [steps, R, ...]; move to [R, steps, ...]
    coords = jnp.moveaxis(coords, 0, -2)
    valid = jnp.moveaxis(valid, 0, -1)
    return coords, valid
