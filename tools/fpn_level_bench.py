"""Micro-bench of the final FPN level: reference chain vs collapsed forms.

Usage: python tools/fpn_level_bench.py [reps]
Times each jitted variant at the eval shape on the live backend and prints
ms/call, to iterate on the einsum staging without a 6-minute full-model
compile per attempt.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from mvsformer_tpu.ops.fpn_collapse import (
    _shifted_resize_matrices, _tap_validity, collapsed_final_level)
from mvsformer_tpu.ops.resize import resize_bilinear
from mvsformer_tpu.ops.smallconv import small_conv

N, h, w, C, I, O = 5, 576, 768, 64, 8, 8
H, W = 2 * h, 2 * w

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, h, w, C)), jnp.bfloat16)
lat = jnp.asarray(rng.standard_normal((N, H, W, I)), jnp.bfloat16)
k1 = jnp.asarray(rng.standard_normal((1, 1, I, C)) * 0.1, jnp.float32)
b1 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
k3 = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.1, jnp.float32)
b3 = jnp.asarray(rng.standard_normal((O,)) * 0.1, jnp.float32)


def ref_chain(x, lat, k1, b1, k3, b3):
    up = resize_bilinear(x, (H, W), spatial_axes=(1, 2), align_corners=True)
    intra = up + (lat @ k1[0, 0].astype(jnp.bfloat16) + b1.astype(jnp.bfloat16))
    return small_conv(intra, k3.astype(jnp.bfloat16), b3.astype(jnp.bfloat16))


def collapsed(x, lat, k1, b1, k3, b3):
    return collapsed_final_level(x, lat, k1, b1, k3, b3)


def collapsed_a_only(x, lat, k1, b1, k3, b3):
    dt = x.dtype
    k3m = jnp.moveaxis(k3, 2, 0).reshape(C, 9 * O).astype(dt)
    z = (x @ k3m).reshape(N, h, w, 3, 3, O)
    rhs = _shifted_resize_matrices(h, H, 3, dt)
    rws = _shifted_resize_matrices(w, W, 3, dt)
    y1 = jnp.einsum("nhwtuo,tHh->nHwuo", z, rhs)
    return jnp.einsum("nHwuo,uWw->nHWo", y1, rws)


def collapsed_b_only(x, lat, k1, b1, k3, b3):
    dt = x.dtype
    kc = jnp.einsum("ic,tuco->tuio", k1[0, 0].astype(jnp.float32),
                    k3.astype(jnp.float32)).astype(dt)
    return small_conv(lat.astype(dt), kc, None)


def collapsed_a_v2(x, lat, k1, b1, k3, b3):
    """Width-first with (w,u)-flattened GEMM; z produced in [n,h,t,o,w,u]
    order via an o-tap matmul per ty row (3 slices of the kernel)."""
    dt = x.dtype
    # z ordered [n, h, t, o?, w, u] is what the flattened GEMM wants; get
    # there by contracting per-(t) kernels and transposing SMALL factors only.
    k3m = jnp.moveaxis(k3, 2, 0).reshape(C, 9 * O).astype(dt)  # (t,u,o) minor
    z = (x @ k3m).reshape(N, h, w, 3, 3, O)                    # [n,h,w,t,u,o]
    rws = _shifted_resize_matrices(w, W, 3, dt)                # [u, W, w]
    # width pass per u: contraction over w only (axis 2), u sliced
    y1 = None
    for u in range(3):
        t = jnp.einsum("nhwto,Ww->nhtoW", z[:, :, :, :, u, :], rws[u])
        y1 = t if y1 is None else y1 + t
    rhs = _shifted_resize_matrices(h, H, 3, dt)                # [t, H, h]
    out = None
    for t in range(3):
        o_ = jnp.einsum("nhoW,Hh->nHoW", y1[:, :, t], rhs[t])
        out = o_ if out is None else out + o_
    return jnp.moveaxis(out, 2, 3)  # [n,H,W,o]


def collapsed_ab(x, lat, k1, b1, k3, b3):
    return (collapsed_a_only(x, lat, k1, b1, k3, b3)
            + collapsed_b_only(x, lat, k1, b1, k3, b3))


def collapsed_kfield_only(x, lat, k1, b1, k3, b3):
    m = jnp.einsum("c,tuco->tuo", b1.astype(jnp.float32),
                   k3.astype(jnp.float32))
    g = jnp.einsum("ju,tuo->jto", _tap_validity(W, 3), m)
    kf = jnp.einsum("it,jto->ijo", _tap_validity(H, 3), g).astype(x.dtype)
    return kf[None] + lat


def collapsed_a_v3(x, lat, k1, b1, k3, b3):
    """Explicit-relayout staging: joint (h,t) and (w,u) contractions as
    minor-dim GEMMs with interleaved shifted-tent matrices."""
    dt = x.dtype
    k3m = jnp.moveaxis(k3, 2, 0).reshape(C, 9 * O).astype(dt)
    z = (x @ k3m).reshape(N, h, w, 3, 3, O)          # [n,h,w,t,u,o]
    rhs = _shifted_resize_matrices(h, H, 3, dt)       # [t,H,h]
    rws = _shifted_resize_matrices(w, W, 3, dt)       # [u,W,w]
    rh2 = jnp.transpose(rhs, (2, 0, 1)).reshape(3 * h, H)   # [(h,t),H]
    rw2 = jnp.transpose(rws, (2, 0, 1)).reshape(3 * w, W)   # [(w,u),W]
    zt = jnp.transpose(z, (0, 2, 4, 5, 1, 3)).reshape(N, w, 3, O, h * 3)
    y1 = zt @ rh2                                     # [n,w,u,o,H]
    y1 = jnp.transpose(y1, (0, 3, 4, 1, 2)).reshape(N, O, H, w * 3)
    a = y1 @ rw2                                      # [n,o,H,W]
    return jnp.transpose(a, (0, 2, 3, 1))


def collapsed_b_s2d(x, lat, k1, b1, k3, b3):
    from mvsformer_tpu.ops.smallconv import small_conv_s2d
    dt = x.dtype
    kc = jnp.einsum("ic,tuco->tuio", k1[0, 0].astype(jnp.float32),
                    k3.astype(jnp.float32)).astype(dt)
    return small_conv_s2d(lat.astype(dt), kc, None)


def collapsed_v3(x, lat, k1, b1, k3, b3):
    m = jnp.einsum("c,tuco->tuo", b1.astype(jnp.float32),
                   k3.astype(jnp.float32))
    g = jnp.einsum("ju,tuo->jto", _tap_validity(W, 3), m)
    kf = jnp.einsum("it,jto->ijo", _tap_validity(H, 3), g).astype(x.dtype)
    return (collapsed_a_v3(x, lat, k1, b1, k3, b3)
            + collapsed_b_s2d(x, lat, k1, b1, k3, b3)
            + kf[None] + b3.astype(x.dtype))


VARIANTS = {
    "ref_chain": ref_chain,
    "collapsed": collapsed,
    "collapsed_a_only": collapsed_a_only,
    "collapsed_b_only": collapsed_b_only,
    "collapsed_a_v2": collapsed_a_v2,
    "collapsed_ab": collapsed_ab,
    "collapsed_kfield": collapsed_kfield_only,
    "collapsed_a_v3": collapsed_a_v3,
    "collapsed_b_s2d": collapsed_b_s2d,
    "collapsed_v3": collapsed_v3,
}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    for name, fn in VARIANTS.items():
        # Device-side rep loop with a carry-dependent input perturbation:
        # serializes iterations (no CSE) and pays the host round-trip once.
        def run(x, lat, k1, b1, k3, b3, fn=fn):
            def body(i, c):
                y = fn(x * (1 + c * jnp.bfloat16(1e-30)), lat, k1, b1, k3, b3)
                return jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        f = jax.jit(run)
        try:
            float(f(x, lat, k1, b1, k3, b3))
        except Exception as e:
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}")
            continue
        t0 = time.perf_counter()
        float(f(x, lat, k1, b1, k3, b3))
        dt_ms = (time.perf_counter() - t0) / reps * 1e3
        c = f.lower(x, lat, k1, b1, k3, b3).compile()
        try:
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            fl = ca.get("flops", 0) / 1e9 / reps
            by = ca.get("bytes accessed", 0) / 1e9 / reps
        except Exception:
            fl = by = float("nan")
        print(f"{name:20s} {dt_ms:8.3f} ms   {fl:7.1f} GF  {by:7.2f} GB")


if __name__ == "__main__":
    main()
