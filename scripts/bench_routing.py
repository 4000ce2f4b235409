"""Microbenchmark: fused Pallas routing kernel vs the XLA path (TPU).

CapsuleNet shapes: B x 1296 nodes x 43 caps x 16 dims, 3 iterations.
Timing uses device-computed scalar checksums fetched to host (the only
reliable barrier over a tunneled backend).

Usage: python scripts/bench_routing.py [batch]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

try:  # persistent compile cache: reruns skip the multi-minute compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import capsule as C
from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
    routing_pallas as RP,
)


def timed(fn, *args, iters=20):
    out = float(fn(*args))          # compile + warmup
    for _ in range(3):
        fn(*args)
    _ = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    val = float(r)
    return (time.perf_counter() - t0) / iters, val


SHAPES = {
    # CapsuleNet: 1296 nodes -> 43 caps x 16 dims (models.py:93-94)
    "capsule": (1296, 43, 8, 16),
    # DarkCapsuleNet: per-cell 512 nodes -> 1 cap x 5 dims, batched over
    # the g^2 grid (models.py:368-370); batch arg is multiplied by g^2=49
    "darkcapsule": (512, 1, 8, 5),
}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    shape = sys.argv[2] if len(sys.argv) > 2 else "capsule"
    N, K, in_c, D = SHAPES[shape]
    if shape == "darkcapsule":
        batch *= 49  # routing runs per grid cell
    print(f"shape={shape}")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, N, in_c).astype(np.float32))
    w = jnp.asarray((0.1 * rng.randn(N, K, in_c, D)).astype(np.float32))

    @jax.jit
    def xla(x, w):
        priors = C.compute_priors(x, w)
        return jnp.sum(C.dynamic_routing(priors, 3)[:, 0] ** 2)

    @jax.jit
    def pallas(x, w):
        return jnp.sum(RP.routed_capsules_pallas(x, w, 3) ** 2)

    @jax.jit
    def pallas_bf16(x, w):
        return jnp.sum(RP.routed_capsules_pallas(x, w, 3, True) ** 2)

    t_x, v_x = timed(xla, x, w)
    t_p, v_p = timed(pallas, x, w)
    t_b, v_b = timed(pallas_bf16, x, w)
    print(f"batch={batch} N={N} K={K} D={D}")
    print(f"fwd xla:         {t_x*1e3:8.3f} ms/iter  checksum {v_x:.6f}")
    print(f"fwd pallas:      {t_p*1e3:8.3f} ms/iter  checksum {v_p:.6f}")
    print(f"fwd pallas-bf16: {t_b*1e3:8.3f} ms/iter  checksum {v_b:.6f}")
    print(f"fwd speedup: {t_x/t_p:.2f}x   rel err {abs(v_x-v_p)/abs(v_x):.2e}")
    print(f"fwd bf16 vs f32 kernel: {t_p/t_b:.2f}x   "
          f"rel err {abs(v_p-v_b)/abs(v_p):.2e}")

    # fwd+bwd (training path): value_and_grad through both routes
    xla_g = jax.value_and_grad(xla, argnums=(0, 1))
    pal_g = jax.value_and_grad(pallas, argnums=(0, 1))
    pal_bg = jax.value_and_grad(pallas_bf16, argnums=(0, 1))

    def grad_scalar(fn):
        def run(xx, ww):
            v, (gx, gw) = fn(xx, ww)
            return v + jnp.sum(gx) + jnp.sum(gw)
        return jax.jit(run)

    t_xg, v_xg = timed(grad_scalar(xla_g), x, w)
    t_pg, v_pg = timed(grad_scalar(pal_g), x, w)
    t_bg, v_bg = timed(grad_scalar(pal_bg), x, w)
    print(f"fwd+bwd xla:         {t_xg*1e3:8.3f} ms/iter  checksum {v_xg:.6f}")
    print(f"fwd+bwd pallas:      {t_pg*1e3:8.3f} ms/iter  checksum {v_pg:.6f}")
    print(f"fwd+bwd pallas-bf16: {t_bg*1e3:8.3f} ms/iter  checksum {v_bg:.6f}")
    print(f"fwd+bwd speedup: {t_xg/t_pg:.2f}x   "
          f"rel err {abs(v_xg-v_pg)/max(abs(v_xg),1e-9):.2e}")
    print(f"fwd+bwd bf16 vs f32 kernel: {t_pg/t_bg:.2f}x   "
          f"rel err {abs(v_pg-v_bg)/max(abs(v_pg),1e-9):.2e}")


if __name__ == "__main__":
    main()
