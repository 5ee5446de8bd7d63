"""Fused dock-side selection: repeatability -> ordering -> greedy pose
clustering -> refinement start poses, in ONE device program.

The split path (engine/match.match_descriptors + engine/cluster.filter_pairs
+ engine/refine host driver) syncs the tunneled host twice between the
similarity pull and the refinement dispatch — each sync a ~100-150 ms relay
round trip — and runs the greedy clustering on host in between. Here the
whole chain after the similarity pull is one dispatch, the refinement
launches on its device outputs with no intermediate sync, and the cluster /
candidate bookkeeping returns in the refinement's consolidated pull.

Semantics are the split path's, re-derived in-program:
  * approximate repeatability for every pair via the dilated occupancy
    field, exact NN re-scoring of the ordering-critical top pairs
    (mad/MaD.py:440-448 via engine/match);
  * stable repeat-descending ordering (mad/MaD.py:480);
  * greedy cloud-RMSD clustering as a ``lax.scan`` over the ordered top
    ``n_samples`` pairs using the closed-form cloud RMSD from the anchor
    cloud's first/second moments (mad/MaD.py:500-521 via engine/cluster);
  * weight/repeatability gates + weight*repeat scoring (mad/MaD.py:526-551);
  * per-candidate refinement start pose (x0 - hi) @ R^T + lo
    (engine/docking._refine_and_merge).

The scan/gate math runs in f32 where the host path mixes f32/f64; decision
boundaries (cloud RMSD vs 10 A, 0.8-relative gates) sit far from f32
rounding at molecular scales, and the fused-vs-split equality tests pin the
resulting candidate sets (tests/test_dock_fused.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..utils.warmup import warmable
from .match import _approx_repeat_body, _exact_repeat_body, _field_body


def _cluster_select_body(p: int, n_scan: int, c_cap: int, nb: int,
                         rmsd_cloud: float, wthresh: int, min_repeat: float,
                         repeat_frac: float):
    """Shared tail of the fused programs: given per-pair repeatabilities,
    order the pairs, greedily cluster the top ``n_scan``, gate + score the
    clusters, and emit the top ``c_cap`` candidates' refinement starts."""
    lanes = np.arange(p)
    slot_ids = np.arange(n_scan, dtype=np.int32)
    scan_ids = np.arange(n_scan, dtype=np.int32)
    cand_ids = np.arange(c_cap, dtype=np.int32)

    def run(rep_full, rot, hc, lc, n_rows, n_valid_scan, best_override,
            mu, M, x0):
        rep_m = jnp.where(lanes < n_rows, rep_full, -jnp.inf)
        order = jnp.argsort(-rep_m, stable=True)                  # (p,)

        oi = order[:n_scan]
        # A = R^T, b = lo - hi @ R^T: transformed cloud is X @ A + b
        # (engine/cluster.filter_pairs).
        A_ord = jnp.swapaxes(rot[oi], 1, 2)
        b_ord = lc[oi] - jnp.einsum("pd,pde->pe", hc[oi], A_ord)
        valid = scan_ids < jnp.minimum(n_valid_scan, n_rows)

        def step(carry, xs):
            CA, Cb, found_i, n_cl = carry
            A_i, b_i, v_i, i = xs
            D = CA - A_i[None]
            d = Cb - b_i[None]
            r2 = (jnp.einsum("cij,ik,ckj->c", D, M, D)
                  + 2.0 * jnp.einsum("j,cjk,ck->c", mu, D, d)
                  + jnp.sum(d * d, axis=-1))
            r2m = jnp.where(slot_ids < n_cl, r2, jnp.inf)
            jbest = jnp.argmin(r2m)
            new = (n_cl == 0) | (jnp.sqrt(jnp.maximum(r2m[jbest], 0.0))
                                 > rmsd_cloud)
            slot = jnp.where(new, n_cl, jbest)
            upd = (slot_ids == slot) & v_i & new
            CA = jnp.where(upd[:, None, None], A_i[None], CA)
            Cb = jnp.where(upd[:, None], b_i[None], Cb)
            found_i = jnp.where(upd, i, found_i)
            n_cl = n_cl + (new & v_i).astype(jnp.int32)
            assign = jnp.where(v_i, slot, jnp.int32(-1))
            return (CA, Cb, found_i, n_cl), assign

        init = (jnp.zeros((n_scan, 3, 3), jnp.float32),
                jnp.zeros((n_scan, 3), jnp.float32),
                jnp.zeros((n_scan,), jnp.int32), jnp.int32(0))
        (CA, Cb, found_i, n_cl), assign = lax.scan(
            step, init, (A_ord.astype(jnp.float32),
                         b_ord.astype(jnp.float32), valid, scan_ids))

        weights = jnp.zeros((n_scan,), jnp.int32).at[assign].add(
            1, mode="drop")                      # assign=-1 rows drop
        founded = slot_ids < n_cl
        rep_ord = rep_full[oi]
        rep_found = rep_ord[found_i]
        best = jnp.where(best_override > 0.0, best_override,
                         rep_full[order[0]])
        rep_thresh = jnp.maximum(jnp.float32(min_repeat),
                                 best * jnp.float32(repeat_frac))
        gate = founded & (weights >= wthresh) & (rep_found >= rep_thresh)
        score = jnp.where(gate, rep_found * weights.astype(jnp.float32),
                          -jnp.inf)
        cand_order = jnp.argsort(-score, stable=True)[:c_cap]
        n_cands = jnp.sum(gate.astype(jnp.int32))

        rows_c = oi[found_i[cand_order]]
        # start pose per candidate: (x0 - hi) @ R^T + lo
        # (engine/docking._refine_and_merge).
        starts = (jnp.einsum("nd,cde->cne", x0, jnp.swapaxes(rot[rows_c],
                                                             1, 2))
                  - jnp.einsum("cd,cde->ce", hc[rows_c],
                               jnp.swapaxes(rot[rows_c], 1, 2))[:, None]
                  + lc[rows_c][:, None])
        frozen0 = ~(gate[cand_order] & (cand_ids < n_cands))
        sel = (order, assign, found_i, weights, gate, cand_order, n_cands,
               rep_full)
        return sel, starts, frozen0

    return run


@functools.lru_cache(maxsize=16)
@warmable
def _compiled_dock_select(shape: Tuple[int, int, int], r_vox: int,
                          a_hi: int, a_lo: int, p: int, pe: int, n_scan: int,
                          c_cap: int, nb: int, anchor_dist: float,
                          rmsd_cloud: float, wthresh: int, min_repeat: float,
                          repeat_frac: float):
    """First-round program: dilated-field approximate repeatability for all
    pairs + exact re-scoring of the top ``pe`` + ordering + clustering +
    candidate starts, one dispatch."""
    fb = _field_body(shape, r_vox)
    ab = _approx_repeat_body(shape, 256)
    eb = _exact_repeat_body(16, anchor_dist)
    cs = _cluster_select_body(p, n_scan, c_cap, nb, rmsd_cloud, wthresh,
                              min_repeat, repeat_frac)
    lanes = np.arange(p)
    elanes = np.arange(pe)
    eye = np.eye(3, dtype=np.float32)

    def run(lo_vox, lo_valid, hi_cloud, hi_valid, lo_cloud, origin,
            inv_voxsp, rot, hc, lc, n_rows, n_exact, n_valid_scan,
            mu, M, x0):
        field = fb(lo_vox, lo_valid)
        rep = ab(field, hi_cloud, hi_valid, origin, inv_voxsp, rot, hc, lc)
        # exact re-score of the ordering-critical prefix
        # (engine/match._compiled_select_exact semantics)
        rep_m = jnp.where(lanes < n_rows, rep, -jnp.inf)
        top = jnp.argsort(-rep_m, stable=True)[:pe]
        er = jnp.where((elanes < n_exact)[:, None, None], rot[top], eye)
        erep = eb(hi_cloud, hi_valid, lo_cloud, lo_valid, er, hc[top],
                  lc[top])
        put = (elanes < n_exact) & (top < n_rows)
        rep_full = rep.at[jnp.where(put, top, p)].set(
            jnp.where(put, erep, 0.0), mode="drop")
        sel, starts, frozen0 = cs(rep_full, rot, hc, lc, n_rows,
                                  n_valid_scan, jnp.float32(-1.0), mu, M, x0)
        return sel, starts, frozen0

    return jax.jit(run)


@functools.lru_cache(maxsize=16)
@warmable
def _compiled_rescue_select(a_hi: int, a_lo: int, pe: int, n_scan: int,
                            c_cap: int, nb: int, anchor_dist: float,
                            rmsd_cloud: float, wthresh: int,
                            min_repeat: float, repeat_frac: float):
    """Rescue-round program: exact repeatability for the eligible row subset
    + ordering + clustering + candidate starts (the repeat gate stays
    relative to the FULL table's best, passed as ``best_override``)."""
    eb = _exact_repeat_body(16, anchor_dist)
    cs = _cluster_select_body(pe, n_scan, c_cap, nb, rmsd_cloud, wthresh,
                              min_repeat, repeat_frac)

    def run(hi_cloud, hi_valid, lo_cloud, lo_valid, rot, hc, lc, n_rows,
            best_override, mu, M, x0):
        erep = eb(hi_cloud, hi_valid, lo_cloud, lo_valid, rot, hc, lc)
        sel, starts, frozen0 = cs(erep, rot, hc, lc, n_rows, n_rows,
                                  best_override, mu, M, x0)
        return sel, starts, frozen0

    return jax.jit(run)


def cloud_moments(hi_cloud: np.ndarray):
    """First/second moments of the (real) subunit anchor cloud, computed on
    host in f64 and passed to the device scan as f32 (engine/cluster)."""
    mu = hi_cloud.mean(axis=0)
    M = (hi_cloud.T @ hi_cloud) / hi_cloud.shape[0]
    return mu.astype(np.float32), M.astype(np.float32)
