"""Dependency shims for running the read-only reference under pytest.

The image lacks skimage; the reference's only use of it is ONE call
(mad/Detector.py:29): ``peak_local_max(grid, exclude_border=12,
threshold_abs=5e-2)`` — i.e. default ``min_distance=1``. This module
re-implements exactly that call's documented semantics so the parity tests
(tests/test_reference_parity.py) can execute the reference unmodified, and
tests/test_peak_shim.py pins the shim against an independent brute-force
oracle over the edge cases (plateaus, ties, border-adjacent peaks) so the
parity comparison is not circular.

skimage semantics reproduced (skimage.feature.peak_local_max with
min_distance=1, integer exclude_border, threshold_abs):
  * candidate mask: ``grid == maximum_filter(grid, size=3, mode='constant',
    cval=0)`` — out-of-bounds neighbors compare as 0, plateau members all
    qualify (the filter includes the center, so == is >=);
  * intensity floor: strictly greater than ``threshold_abs``;
  * border: indices within ``exclude_border`` of any edge are dropped;
  * ordering: coordinates returned in DESCENDING peak-intensity order
    (ties keep C-scan order — numpy stable argsort).
"""

import numpy as np


def peak_local_max(grid, exclude_border=12, threshold_abs=0.05):
    from scipy import ndimage

    mx = ndimage.maximum_filter(grid, size=3, mode="constant", cval=0.0)
    mask = (grid >= mx) & (grid > threshold_abs)
    eb = exclude_border
    keep = np.zeros_like(mask)
    if eb == 0:
        keep[...] = True
    else:
        keep[eb:grid.shape[0] - eb, eb:grid.shape[1] - eb,
             eb:grid.shape[2] - eb] = True
    mask &= keep
    coords = np.argwhere(mask)
    order = np.argsort(-grid[tuple(coords.T)], kind="stable")
    return coords[order]


def peak_local_max_oracle(grid, exclude_border=12, threshold_abs=0.05):
    """Independent O(N * 27) formulation: per-voxel loop over the 26
    neighbors with out-of-bounds treated as the filter's cval=0. Used only
    by tests/test_peak_shim.py to validate the shim."""
    nx, ny, nz = grid.shape
    eb = exclude_border
    hits = []
    for x in range(eb, nx - eb):
        for y in range(eb, ny - eb):
            for z in range(eb, nz - eb):
                v = grid[x, y, z]
                if not v > threshold_abs:
                    continue
                ok = True
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dz in (-1, 0, 1):
                            if dx == dy == dz == 0:
                                continue
                            ax, ay, az = x + dx, y + dy, z + dz
                            nb = (grid[ax, ay, az]
                                  if 0 <= ax < nx and 0 <= ay < ny
                                  and 0 <= az < nz else 0.0)
                            if nb > v:
                                ok = False
                                break
                        if not ok:
                            break
                    if not ok:
                        break
                if ok:
                    hits.append((x, y, z))
    coords = np.asarray(hits, dtype=np.int64).reshape(-1, 3)
    order = np.argsort(-grid[tuple(coords.T)], kind="stable")
    return coords[order]
