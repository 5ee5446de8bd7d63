"""Micro-bench of peak-extraction variants at the bench oct0 shape."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _fence(out):
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ndim")]
    if leaves:
        jax.device_get(leaves[0][(0,) * leaves[0].ndim])


def t(fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _fence(out)
    print(f"  (first call {time.perf_counter()-t0:.1f}s)", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    real = (581, 587, 559)
    # sparse peaky volume, built ON DEVICE (a host->device push of 760 MB
    # through the tunneled relay takes minutes)
    rng = np.random.default_rng(0)
    pk = rng.integers(0, np.prod(real), size=3000)
    pv = rng.random(3000).astype(np.float32) * 0.5 + 0.1

    @jax.jit
    def build(k, idx, vals):
        flat = jax.random.uniform(k, (int(np.prod(real)),),
                                  jnp.float32) * 0.04
        return flat.at[idx].set(vals).reshape(real)

    big = build(jax.random.PRNGKey(0), jnp.asarray(pk), jnp.asarray(pv))
    _fence(big)

    f = jax.jit(lambda v: lax.reduce_window(v, -jnp.inf, lax.max,
                                            (3, 3, 3), (1, 1, 1), "SAME"))
    print(f"maxpool 3^3 fused: {t(f, big)*1e3:.1f} ms", flush=True)

    def sep_pool(v):
        for ax in range(3):
            w = [1, 1, 1]
            w[ax] = 3
            v = lax.reduce_window(v, -jnp.inf, lax.max, tuple(w),
                                  (1, 1, 1), "SAME")
        return v
    f = jax.jit(sep_pool)
    print(f"maxpool separable 3x1D: {t(f, big)*1e3:.1f} ms", flush=True)

    pooled = f(big)

    def scores_of(v, pooled):
        return jnp.where((v >= pooled) & (v > 5e-2), v,
                         -jnp.inf).reshape(-1)

    def twostage(v, pooled, block, kseg, cap=4096):
        s = scores_of(v, pooled)
        pad = (-s.shape[0]) % block
        seg = jnp.pad(s, (0, pad), constant_values=-jnp.inf)
        seg = seg.reshape(-1, block)
        svals, scols = lax.top_k(seg, kseg)
        base = (jnp.arange(seg.shape[0], dtype=jnp.int32) * block)[:, None]
        cand = (base + scols).reshape(-1)
        vals, sub = lax.top_k(svals.reshape(-1), cap)
        return vals, cand[sub]

    for block, kseg in ((4096, 512), (4096, 128), (16384, 256),
                        (65536, 512), (262144, 1024)):
        f = jax.jit(lambda v, p, b=block, k=kseg: twostage(v, p, b, k))
        print(f"two-stage block={block} kseg={kseg}: "
              f"{t(f, big, pooled)*1e3:.1f} ms", flush=True)

    def approx(v, pooled):
        s = scores_of(v, pooled)
        return lax.approx_max_k(s, 4096, recall_target=0.99,
                                aggregate_to_topk=True)
    f = jax.jit(approx)
    print(f"approx_max_k(0.99): {t(f, big, pooled)*1e3:.1f} ms", flush=True)

    def approx95(v, pooled):
        s = scores_of(v, pooled)
        return lax.approx_max_k(s, 4096, recall_target=0.95,
                                aggregate_to_topk=True)
    f = jax.jit(approx95)
    print(f"approx_max_k(0.95): {t(f, big, pooled)*1e3:.1f} ms", flush=True)

    # exactness check: approx vs exact on this volume
    ev, ei = jax.jit(lambda v, p: twostage(v, p, 4096, 512))(big, pooled)
    av, ai = f(big, pooled)
    n_valid = int(jnp.sum(ev > 5e-2))
    same = int(jnp.sum(jnp.isin(ai[:n_valid], ei[:n_valid])))
    print(f"approx(0.95) recovers {same}/{n_valid} exact peaks", flush=True)

    # 3-stage: per-64 max (191M -> 3M) with index, then two-stage on that
    def threestage(v, pooled):
        s = scores_of(v, pooled)
        pad = (-s.shape[0]) % 64
        seg = jnp.pad(s, (0, pad), constant_values=-jnp.inf).reshape(-1, 64)
        m = jnp.max(seg, axis=1)
        a = jnp.argmax(seg, axis=1).astype(jnp.int32)
        idx = jnp.arange(m.shape[0], dtype=jnp.int32) * 64 + a
        svals, scols = lax.top_k(m.reshape(-1, 4096), 512)
        base = (jnp.arange(m.shape[0] // 4096, dtype=jnp.int32)
                * 4096)[:, None]
        cand = idx[(base + scols).reshape(-1)]
        vals, sub = lax.top_k(svals.reshape(-1), 4096)
        return vals, cand[sub]
    f = jax.jit(threestage)
    print(f"3-stage (per-64 max): {t(f, big, pooled)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
