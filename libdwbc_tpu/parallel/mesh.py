"""Multi-chip scaling: scenario-batch sharding over a device mesh.

The reference is a single-core controller (SURVEY.md §2.2 — no DP/TP/PP/
collectives anywhere).  The TPU-native framework's scaling axis is the
**scenario batch**: thousands of control problems (contact-mode hypotheses,
disturbance rollouts, gait phases) solved per step, sharded over a 2-D mesh

    ('hyp', 'roll')  — hypothesis axis × rollout axis

with XLA collectives (psum / argmin reductions over ICI) selecting the best
hypothesis.  Within a scenario everything is tiny (39-dof) — there is nothing
to tensor-parallelize per problem; chips are filled by batching, exactly the
regime BASELINE.json's north star describes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_hyp: int | None = None, n_roll: int | None = None, devices=None):
    """Create a 2-D ('hyp','roll') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_hyp is None or n_roll is None:
        # squarest factorization
        n_hyp = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                n_hyp = f
                break
        n_roll = n // n_hyp
    dev_mesh = mesh_utils.create_device_mesh((n_hyp, n_roll), devices=devices)
    return Mesh(dev_mesh, ("hyp", "roll"))


def sharded_batch_solver(tick_impl, mesh: Mesh):
    """Shard a (H, R, ...) scenario grid over the mesh and solve every tick,
    returning all torques plus the globally best hypothesis per metric.

    tick_impl: unbatched pure tick (q, qdot, fstars) -> TickResult.
    Returns jitted fn (q[H,R,nq], qdot[H,R,n], fstars tuple of [H,R,t])
    -> (TickResult batched, best_idx, best_cost).

    The best-hypothesis reduction is a real cross-device collective (global
    argmin over both mesh axes), riding ICI.
    """
    vtick = jax.vmap(jax.vmap(tick_impl, in_axes=(0, 0, 0)), in_axes=(0, 0, 0))

    def step(q, qdot, fstars):
        res = vtick(q, qdot, fstars)
        # scenario cost: command effort + constraint violation penalty
        cost = jnp.sum(res.torque_cmd**2, axis=-1) + 1e6 * res.qp_primal_res
        flat = cost.reshape(-1)
        best = jnp.argmin(flat)
        return res, best, flat[best]

    in_sharding = NamedSharding(mesh, P("hyp", "roll"))
    # prefix-pytree sharding: the fstars tuple inherits the same spec per leaf
    return jax.jit(
        step, in_shardings=(in_sharding, in_sharding, in_sharding)
    ), in_sharding


def shard_scenarios(mesh: Mesh, *arrays):
    """Device-put (H,R,...) arrays with the ('hyp','roll') sharding."""
    sh = NamedSharding(mesh, P("hyp", "roll"))
    return tuple(jax.device_put(a, sh) for a in arrays)
