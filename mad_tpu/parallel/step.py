"""One full multi-chip docking step over a device mesh (dry-run target).

Composes the sharded stages end-to-end under jit on an n-device mesh:
  * scale space on a spatially sharded volume (SP: XLA GSPMD halo exchange),
  * descriptor similarity with the map side sharded (TP-like matmul with
    all_gather + global top-k over ICI),
  * pair repeatability sharded over the pair axis (DP, shard_map),
  * rigid refinement sharded over pose candidates (DP).

This is the step the driver compile-checks with
``xla_force_host_platform_device_count`` (no real multi-chip needed).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.convolve import log_filter3d
from ..core.geometry import axis_angle_mat, unit
from ..ops.interp import trilinear
from .mesh import make_mesh


def multichip_step(n_devices: int, vol_dim: int = 32, n_desc: int = 256,
                   n_pairs: int = 64, n_cands: int = 8, n_atoms: int = 64,
                   refine_steps: int = 10, seed: int = 0):
    """Build + jit + run one sharded docking step on tiny shapes."""
    mesh = make_mesh(n_devices)
    ax = "x"
    rng = np.random.default_rng(seed)
    assert vol_dim % n_devices == 0 and n_desc % n_devices == 0
    assert n_pairs % n_devices == 0 and n_cands % n_devices == 0

    vol = jnp.asarray(rng.random((vol_dim, vol_dim, vol_dim)),
                      dtype=jnp.float32)
    hi = jnp.asarray(rng.random((n_desc, 1024)), dtype=jnp.float32)
    lo = jnp.asarray(rng.random((n_desc, 1024)), dtype=jnp.float32)
    cloud = jnp.asarray(rng.normal(size=(128, 3)) * 5 + vol_dim / 2,
                        dtype=jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                            (n_pairs, 3, 3))
    coords0 = jnp.asarray(rng.normal(size=(n_cands, n_atoms, 3)) * 3
                          + vol_dim / 2, dtype=jnp.float32)

    vol_sh = NamedSharding(mesh, P(ax, None, None))
    lo_sh = NamedSharding(mesh, P(ax, None))
    pair_sh = NamedSharding(mesh, P(ax, None, None))
    cand_sh = NamedSharding(mesh, P(ax, None, None))
    repl = NamedSharding(mesh, P())

    shard = n_desc // n_devices
    topk = 32

    def sim_kernel(hi_blk, lo_blk):
        sim = jnp.dot(hi_blk, lo_blk.T, preferred_element_type=jnp.float32)
        vals, flat = lax.top_k(sim.reshape(-1), topk)
        cols = flat % shard + lax.axis_index(ax) * shard
        all_vals = lax.all_gather(vals, ax)
        all_cols = lax.all_gather(cols, ax)
        gvals, gidx = lax.top_k(all_vals.reshape(-1), topk)
        return gvals, all_cols.reshape(-1)[gidx]

    def repeat_kernel(field, cloud_r, rot_b):
        pts = jnp.einsum("cad,ced->cae", cloud_r[None] - 0.0, rot_b)
        vox = jnp.clip(jnp.round(pts).astype(jnp.int32), 0, vol_dim - 1)
        hit = field[vox[..., 0], vox[..., 1], vox[..., 2]] > 0.05
        return 100.0 * jnp.mean(hit.astype(jnp.float32), axis=-1)

    def refine_kernel(grad_field, y0):
        center = jnp.mean(y0, axis=1, keepdims=True)

        def body(state, step):
            trans, rot = state
            coords = (y0 - center) @ rot + center + trans[:, None]
            g = trilinear(grad_field, coords)
            dtrans = unit(jnp.sum(g, axis=1)) * 0.5
            torque = unit(jnp.sum(jnp.cross(g, coords - center), axis=1))
            rstep = axis_angle_mat(torque, jnp.full(y0.shape[0], 0.02))
            is_t = (step % 2) == 0
            trans = jnp.where(is_t, trans + dtrans, trans)
            rot = jnp.where(is_t, rot, rot @ rstep)
            return (trans, rot), None

        # carry must share the varying-axes type of the sharded y0
        init = (y0[:, 0] * 0.0, jnp.eye(3) + 0.0 * y0[:, :3, :3])
        (trans, rot), _ = lax.scan(body, init, jnp.arange(refine_steps))
        return (y0 - center) @ rot + center + trans[:, None]

    sim_sharded = shard_map(sim_kernel, mesh=mesh,
                            in_specs=(P(), P(ax, None)),
                            out_specs=(P(), P()),
                            check_vma=False)
    repeat_sharded = shard_map(repeat_kernel, mesh=mesh,
                               in_specs=(P(), P(), P(ax, None, None)),
                               out_specs=P(ax))
    refine_sharded = shard_map(refine_kernel, mesh=mesh,
                               in_specs=(P(), P(ax, None, None)),
                               out_specs=P(ax, None, None))

    @jax.jit
    def step(vol_in, hi_in, lo_in, cloud_in, rots_in, coords_in):
        # SP: spatially sharded scale space (GSPMD halos).
        log_resp, gauss = log_filter3d(vol_in, 2.0)
        gx, gy, gz = jnp.gradient(gauss)
        grad = jnp.stack([gx, gy, gz], axis=-1)
        # TP-like: sharded similarity + global top-k.
        vals, cols = sim_sharded(hi_in, lo_in)
        # DP over pairs: repeatability on the sharded pair axis.
        reps = repeat_sharded(log_resp, cloud_in, rots_in)
        # DP over candidates: refinement scan.
        refined = refine_sharded(grad, coords_in)
        return (jnp.sum(vals) + jnp.sum(reps)
                + jnp.sum(refined) + jnp.sum(log_resp), cols)

    with mesh:
        out, cols = step(
            jax.device_put(vol, vol_sh), jax.device_put(hi, repl),
            jax.device_put(lo, lo_sh), jax.device_put(cloud, repl),
            jax.device_put(rots, pair_sh), jax.device_put(coords0, cand_sh))
        out.block_until_ready()
    return float(out)
