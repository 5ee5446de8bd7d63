"""Per-subunit docking: match -> filter -> refine -> score -> dedup.

Replaces MaD._match_filter_refine / _refine_filtered_solutions
(mad/MaD.py:371-411, 556-629), plus a rescue loop the reference does not
have: after the first round, descriptor pairs whose map anchor is not
explained by any accepted solution get a fresh clustering budget under the
same quality gates, recovering marginal copies whose pairs ranked below the
first-round n_samples cutoff.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np
from scipy.spatial import cKDTree

from ..core.config import MadConfig
from ..core.geometry import kabsch_np
from ..core.grid import DensityGrid
from ..core.structure import Structure
from .score import ccc_structures
from .pipeline import DescriptorSet
from .match import match_descriptors, exact_rescore, MatchTable
from .cluster import filter_pairs, Candidate
from .refine import refine_candidates
from ..utils.profiling import stage


@dataclass
class Solution:
    """One refined, deduplicated docking solution."""

    structure: Structure           # refined pose
    corresp_anchors: np.ndarray    # (K, 3) matched anchors post-refine
    repeat: float
    weight: int
    ccc: float
    members: List[np.ndarray] = field(default_factory=list)
    score: float = 0.0             # RWmCC = repeat * weight * ccc


def _refine_and_merge(candidates: List[Candidate], solutions: List[Solution],
                      sub_struct: Structure, dmap: DensityGrid,
                      table: MatchTable, cfg: MadConfig, mesh=None) -> int:
    """Refine candidate poses and merge them into ``solutions`` (CA-RMSD
    dedup with weight merging, mad/MaD.py:592-620). Returns the number of
    genuinely new solutions appended."""
    x0 = sub_struct.coords
    starts = np.stack([
        (x0 - c.hi_coord) @ c.rot.T + c.lo_coord for c in candidates
    ]).astype(np.float32)
    with stage("refine"):
        res = refine_candidates(dmap, starts, cfg.refine, mesh=mesh)

    # Re-scored repeatability after refinement (mad/MaD.py:580-590):
    # batched host Kabsch (C tiny 3x3 SVDs; device round trips would cost
    # more than the math), then host NN queries.
    Rb, Tb = kabsch_np(np.broadcast_to(x0, res.coords.shape), res.coords)
    lo_tree = cKDTree(table.lo_cloud)
    thresh = dmap.voxsp * 1.5
    refined: List[tuple] = []
    for i, cand in enumerate(candidates):
        if res.failed is not None and res.failed[i]:
            continue  # numerically failed candidate (NaN guard)
        s_a = table.hi_cloud @ Rb[i] + Tb[i]
        d, _ = lo_tree.query(s_a, distance_upper_bound=thresh)
        hits = d <= thresh
        repeat = 100.0 * np.count_nonzero(hits) / table.hi_cloud.shape[0]
        if repeat <= 0:
            continue
        refined.append((res.coords[i], s_a[hits], repeat, cand.weight,
                        cand.members))

    n_new = 0
    for coords, corresp, repeat, weight, members in refined:
        struct = sub_struct.with_coords(coords)
        merged = False
        if solutions:
            rmsds = [struct.rmsd_ca_with(s.structure) for s in solutions]
            j = int(np.argmin(rmsds))
            if rmsds[j] < cfg.refine.dedup_rmsd:
                solutions[j].weight += weight
                solutions[j].members.extend(members)
                merged = True
        if not merged:
            solutions.append(Solution(
                structure=struct, corresp_anchors=corresp, repeat=repeat,
                weight=weight, ccc=0.0, members=list(members)))
            n_new += 1
    return n_new


def dock_structure(map_set: DescriptorSet, sub_set: DescriptorSet,
                   sub_struct: Structure, dmap: DensityGrid,
                   resolution: float, cfg: MadConfig, n_copies: int = 1,
                   verbose: bool = True, match_cache: str = None,
                   on_filtered=None, mesh=None) -> List[Solution]:
    """Dock one subunit into the map; returns scored unique solutions.

    match_cache: optional h5 path; when set, the match table is loaded from
    (or saved to) it — a working version of the reference's commented-out
    matching cache (mad/MaD.py:386-399).
    on_filtered: optional callback receiving the filtered pre-refinement
    Candidate list (the reference's pre_solutions hook, mad/MaD.py:404-405,
    891-921).
    mesh: optional jax.sharding.Mesh; matching shards the similarity rows
    and pair axes, refinement shards the candidate axis (same kernels as
    the single-device path, results equal up to similarity ties).
    """
    import os as _os
    from .. import cache as _cache

    n_samples = cfg.filter.n_samples * n_copies

    if match_cache and _os.path.exists(match_cache):
        table = _cache.load_matching(match_cache)
        if verbose:
            print(f"MaD> Loaded matched descriptor pairs from {match_cache}")
    else:
        with stage("match"):
            # Clustering consumes the top n_samples pairs by repeatability;
            # their ordering must be exact, not approximate (min_exact).
            table = match_descriptors(
                map_set, sub_set, dmap.shape, dmap.origin, dmap.voxsp,
                cfg.match, min_exact=n_samples, mesh=mesh)
        if match_cache:
            _cache.save_matching(table, match_cache)
    if verbose:
        print(f"MaD> {table.n} descriptor pairs above "
              f"cc={cfg.match.cc_threshold:.2f}")
    if table.n == 0:
        return []

    hi_bins = sub_set.main_bin[table.hi_idx]
    lo_bins = map_set.main_bin[table.lo_idx]
    with stage("cluster"):
        candidates = filter_pairs(table, hi_bins, lo_bins, cfg.filter,
                                  n_samples)
    if verbose:
        print(f"MaD> {len(candidates)} filtered pose candidates")
    if not candidates:
        return []
    if on_filtered is not None:
        on_filtered(candidates)

    solutions: List[Solution] = []
    _refine_and_merge(candidates, solutions, sub_struct, dmap, table, cfg,
                      mesh=mesh)

    # Rescue rounds: pairs whose map anchor no accepted solution explains
    # get a fresh n_samples budget under the same gates (the repeat gate
    # stays relative to the FULL table's best, so rescued poses clear the
    # same bar). Stops as soon as a round adds nothing.
    best_repeat = float(table.repeat[0]) if table.n else 0.0
    for _ in range(max(0, int(cfg.filter.rescue_rounds))):
        if not solutions:
            break
        atoms = np.concatenate([s.structure.coords for s in solutions])
        d, _ = cKDTree(atoms).query(
            table.lo_coord, distance_upper_bound=cfg.match.anchor_dist)
        elig = np.nonzero(d > cfg.match.anchor_dist)[0]
        if not len(elig):
            break
        top = elig[:n_samples]
        # Below the first-round prefix repeatabilities are approximate;
        # re-score exactly what this round consumes, then re-rank.
        with stage("rescue.rescore"):
            erep = exact_rescore(table, top, cfg.match.anchor_dist, mesh)
        order = np.argsort(-erep, kind="stable")
        sub_table = table.take(top[order], repeat=erep[order])
        with stage("rescue.cluster"):
            cands = filter_pairs(
                sub_table, sub_set.main_bin[sub_table.hi_idx],
                map_set.main_bin[sub_table.lo_idx], cfg.filter, n_samples,
                best_repeat=best_repeat)
        if not cands:
            break
        n_new = _refine_and_merge(cands, solutions, sub_struct, dmap,
                                  table, cfg, mesh=mesh)
        if verbose and n_new:
            print(f"MaD> Rescue round: {n_new} additional solution(s) in "
                  "unexplained density")
        if n_new == 0:
            break

    # CC-score the unique poses in one batched simulate + CCC program (CCC
    # values are order-independent, so scoring after the merge matches the
    # reference's interleaved computation, mad/MaD.py:598-618).
    if solutions:
        with stage("solution_ccc"):
            coords_b = np.stack([s.structure.coords for s in solutions])
            cccs = ccc_structures(dmap, coords_b, sub_struct.masses,
                                  resolution, shape_bucket=cfg.shape_bucket)
        for s, c in zip(solutions, cccs):
            s.ccc = float(c)

    for s in solutions:
        s.score = s.repeat * s.weight * s.ccc
    solutions.sort(key=lambda s: s.score, reverse=True)
    return solutions
