"""Control experiment: standalone kernel timing is INVALID through the axon
tunnel. `block_until_ready()` does not gate on execution of independent
dispatches, so timing N independent launches measures queue insertion, not
compute: a 4096^3 bf16 matmul (137.4 GFLOP) "measures" thousands of TF/s —
physically impossible on a ~197 TF/s v5e chip. A dependent chain with a
final host readback is the only sound timing primitive here (it pays tunnel
round-trip latency, so per-kernel numbers are still pessimistic — which is
why perf A/Bs in this repo run through the dependent TRAIN-STEP loop, e.g.
tools/ceiling_stage2.py march_block, rather than standalone).

Measured 2026-08-19 (data/r5_tpu/ab_march_block3.log):
  block_until_ready over 16 independent dispatches: 0.029 ms -> "4767 TF/s"
  8-deep dependent chain + one host readback: 222 ms/matmul -> 0.6 TF/s
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    f(a, b).block_until_ready()  # compile
    flops = 2.0 * n ** 3

    # invalid through the tunnel: block_until_ready on independent dispatches
    t0 = time.perf_counter()
    out = [f(a, b) for _ in range(16)]
    for o in out:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / 16
    print(json.dumps({"mode": "block_until_ready_x16", "ms": round(dt * 1e3, 3),
                      "tflops_per_sec": round(flops / dt / 1e12, 1)}))

    # sound: dependent chain + host readback (latency-pessimistic)
    t0 = time.perf_counter()
    acc = a
    for _ in range(8):
        acc = f(acc.astype(jnp.bfloat16), b).astype(jnp.bfloat16)
    float(acc[0, 0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / 8
    print(json.dumps({"mode": "dependent_chain_readback_x8",
                      "ms": round(dt * 1e3, 3),
                      "tflops_per_sec": round(flops / dt / 1e12, 1)}))


if __name__ == "__main__":
    main()
