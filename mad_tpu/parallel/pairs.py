"""Data-parallel sharding of the matching / pose-scoring axes.

New first-class components (the reference has no parallelism, SURVEY.md
section 2): the big embarrassingly parallel axes of the search shard across
chips over ICI:
  * similarity: subunit descriptors replicated, map descriptors sharded;
    each device computes its similarity block + local top-k, a global top-k
    runs after an all_gather of the per-device candidates;
  * repeatability: candidate pairs shard across devices, the (small) anchor
    clouds and occupancy field are replicated;
  * refinement: pose candidates shard across devices (each pose is an
    independent 500-step scan).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def sharded_similarity_topk(hi: jnp.ndarray, lo: jnp.ndarray, k: int,
                            mesh: Mesh, axis: str = "x"):
    """Top-k (value, hi_idx, lo_idx) of hi @ lo.T with lo sharded on devices.

    Returns global top-k over all pairs; equivalent to the single-device
    flattened top_k in engine/match.py.
    """
    n = mesh.shape[axis]
    dl = lo.shape[0]
    assert dl % n == 0, (dl, n)
    shard = dl // n

    def kernel(hi_blk, lo_blk):
        sim = jnp.dot(hi_blk, lo_blk.T, preferred_element_type=jnp.float32)
        vals, flat = lax.top_k(sim.reshape(-1), k)
        rows = flat // shard
        cols = flat % shard + lax.axis_index(axis) * shard
        # Gather every device's local winners, then reduce to global top-k.
        all_vals = lax.all_gather(vals, axis)            # (n, k)
        all_rows = lax.all_gather(rows, axis)
        all_cols = lax.all_gather(cols, axis)
        gvals, gidx = lax.top_k(all_vals.reshape(-1), k)
        return (gvals, all_rows.reshape(-1)[gidx].astype(jnp.int32),
                all_cols.reshape(-1)[gidx].astype(jnp.int32))

    fn = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P(), P()),
        check_vma=False)  # outputs are replicated post-all_gather
    return jax.jit(fn)(hi, jax.device_put(
        lo, NamedSharding(mesh, P(axis, None))))


def sharded_pair_repeatability(field, hi_cloud, hi_valid, origin, inv_voxsp,
                               rot, hi_coord, lo_coord, mesh: Mesh,
                               axis: str = "x"):
    """Approximate repeatability with the pair axis sharded across devices.

    field / clouds replicated; rot, hi_coord, lo_coord sharded on axis 0.
    """
    shape = field.shape

    def kernel(field_r, cloud_r, valid_r, rot_b, h_b, l_b):
        denom = jnp.maximum(jnp.sum(valid_r), 1)
        pts = jnp.einsum("cad,ced->cae", cloud_r[None] - h_b[:, None], rot_b) \
            + l_b[:, None]
        vox = jnp.round((pts - origin) * inv_voxsp).astype(jnp.int32)
        inb = jnp.all((vox >= 0) & (vox < jnp.asarray(shape)), axis=-1)
        vox = jnp.clip(vox, 0, jnp.asarray(shape) - 1)
        hit = field_r[vox[..., 0], vox[..., 1], vox[..., 2]] > 0
        cnt = jnp.sum(hit & inb & valid_r[None], axis=-1)
        return 100.0 * cnt / denom

    fn = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis, None, None), P(axis, None),
                  P(axis, None)),
        out_specs=P(axis))
    sh = NamedSharding(mesh, P(axis, None, None))
    sh2 = NamedSharding(mesh, P(axis, None))
    return jax.jit(fn)(field, hi_cloud, hi_valid,
                       jax.device_put(rot, sh),
                       jax.device_put(hi_coord, sh2),
                       jax.device_put(lo_coord, sh2))
