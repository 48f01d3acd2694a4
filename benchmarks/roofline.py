#!/usr/bin/env python3
"""Measured hardware ceilings for the roofline statements in RESULTS.md.

The headline kernel numbers (161 Gpairs/s symmetric pairwise, 126 Gpairs/s
datagen, the 8.8 ms train-step kernel chain) are claims of "single-chip
floor".  This benchmark makes those claims auditable by MEASURING the
ceilings they are bound by, on the same chip and through the same timing
methodology (chained executions + one host readback — bench.py docstring):

  vpu_fma_tflops      — peak achievable f32 element-wise throughput: a
                        fori_loop whose body is 64 unrolled dependent
                        x*a+b FMAs on a (1024, 1024) f32 array.  The data
                        dependence prevents elision, the 1M independent
                        element lanes keep the VPU pipeline full, and the
                        unroll amortizes per-loop-pass overhead (a 1-FMA
                        body measures dispatch overhead, not the VPU).
  rsqrt_slot_cost     — effective VPU issue-slot cost of lax.rsqrt,
                        derived from an identically-shaped rsqrt(x)+b
                        chain timed against the fma chain (each unrolled
                        step issues 1 rsqrt + 1 add vs 1 FMA slot).
  pallas_*            — the same two instruments as Pallas kernels with 4
                        independent accumulators on a VMEM-resident tile:
                        the XLA chains keep one dependent stream per
                        element (a latency lower bound); the Pallas
                        variants measure the issue-width ceiling in the
                        execution regime the pairwise kernels actually
                        run in (ops/pairwise.py is a VMEM-resident Pallas
                        kernel).
  mxu_bf16_tflops     — peak achievable bf16 matmul throughput: a chain of
                        (4096, 4096) @ (4096, 4096) bf16 matmuls with f32
                        accumulation (2*M*N*K flops each).

Public v5e paper ceilings for reference (jax-ml.github.io/scaling-book):
197 bf16 TFLOP/s MXU, 819 GB/s HBM; the VPU is an (8, 128)-lane unit with
4 ALUs per lane.  At the ~1.5 GHz clock implied by the MXU spec
(4 MXUs * 128*128 MACs * 2 flops * 1.5e9 = 196.6e12), the VPU paper peak
is 8*128*4 * 1.5e9 = 6.1e12 issue slots/s — i.e. ~6.1 f32 TFLOP/s of
single-slot ops, ~12.3 TFLOP/s counting an FMA as 2 flops in 1 slot.
This script reports what the chip actually sustains so the roofline
fractions divide by a measured number, not a datasheet one.

Usage: python benchmarks/roofline.py   (writes the `roofline` section of
benchmarks/results.json and prints one JSON line)
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import nbody_gnn_hpc_tpu  # noqa: F401,E402  (enables the compile cache)


def timeit(fn, sync, reps):
    fn()  # warm/compile
    sync()
    t0 = time.time()
    for _ in range(reps):
        fn()
    sync()
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    backend = jax.default_backend()
    results = {}

    # ---- VPU f32 FMA chain --------------------------------------------
    # Each fori_loop iteration carries per-iteration overhead (loop
    # bookkeeping + one fused-kernel pass over the array), so the body
    # unrolls UNROLL dependent FMAs to amortize it: work per iteration =
    # UNROLL * 1M FMAs ~ 11 us at the 6.1e12-slots/s paper peak, >>
    # the ~3 us/pass overhead a 1-FMA body measured.
    shape = (1024, 1024)
    unroll = 64
    k_iters = 64
    x0 = jnp.asarray(np.random.RandomState(0).uniform(0.5, 1.5, shape),
                     jnp.float32)

    def _fma_body(x, a, b):
        for _ in range(unroll):
            x = x * a + b
        return x

    @jax.jit
    def fma_chain(x, a, b):
        return lax.fori_loop(0, k_iters, lambda i, x: _fma_body(x, a, b), x)

    a = jnp.float32(0.9999)
    b = jnp.float32(1e-4)
    holder = {}

    def run_fma():
        holder["y"] = fma_chain(x0, a, b)

    def sync():
        float(holder["y"].sum())

    t_fma = timeit(run_fma, sync, reps=20)
    n_fma = shape[0] * shape[1] * k_iters * unroll
    vpu_tflops = 2.0 * n_fma / t_fma / 1e12
    t_fma_slot = t_fma / n_fma  # seconds per 1-slot op at saturation
    print(f"  vpu fma chain: {t_fma*1e3:.3f} ms/call -> "
          f"{vpu_tflops:.2f} f32 TFLOP/s ({n_fma/t_fma/1e12:.2f} Tslot/s)",
          file=sys.stderr)

    # ---- rsqrt chain --------------------------------------------------
    def _rsqrt_body(x, b):
        for _ in range(unroll):
            x = lax.rsqrt(x) + b
        return x

    @jax.jit
    def rsqrt_chain(x, b):
        return lax.fori_loop(0, k_iters, lambda i, x: _rsqrt_body(x, b), x)

    def run_rsqrt():
        holder["y"] = rsqrt_chain(x0, b)

    t_rsqrt = timeit(run_rsqrt, sync, reps=20)
    n_rsqrt = shape[0] * shape[1] * k_iters * unroll
    # each unrolled step issues 1 rsqrt + 1 add; an FMA is 1 slot
    rsqrt_slots = (t_rsqrt / n_rsqrt) / t_fma_slot - 1.0
    rsqrt_rate = n_rsqrt / t_rsqrt / 1e9
    print(f"  rsqrt chain: {t_rsqrt*1e3:.3f} ms/call -> "
          f"{rsqrt_rate:.1f} Grsqrt/s, slot cost {rsqrt_slots:.2f}",
          file=sys.stderr)

    # ---- XLA 4-accumulator FMA chain (independent-issue ceiling) ------
    # The dependent chain above serializes per element; 4 independent
    # accumulators expose instruction-level parallelism to the scheduler.
    shape4 = (512, 512)
    x4 = jnp.asarray(np.random.RandomState(4).uniform(0.5, 1.5, shape4),
                     jnp.float32)

    @jax.jit
    def fma4_chain(x, a, b):
        def body(i, accs):
            a1, a2, a3, a4 = accs
            for _ in range(unroll // 4):
                a1, a2, a3, a4 = (a1 * a + b, a2 * a + b,
                                  a3 * a + b, a4 * a + b)
            return (a1, a2, a3, a4)

        a1, a2, a3, a4 = lax.fori_loop(0, k_iters * 4, body,
                                       (x, x + 1.0, x + 2.0, x + 3.0))
        return ((a1 + a2) + (a3 + a4))

    def run_fma4():
        holder["y"] = fma4_chain(x4, a, b)

    t_fma4 = timeit(run_fma4, sync, reps=20)
    n_fma4 = shape4[0] * shape4[1] * k_iters * 4 * (unroll // 4) * 4
    vpu4_tflops = 2.0 * n_fma4 / t_fma4 / 1e12
    print(f"  vpu fma 4-acc chain: {t_fma4*1e3:.3f} ms/call -> "
          f"{vpu4_tflops:.2f} f32 TFLOP/s ({n_fma4/t_fma4/1e12:.2f} "
          f"Tslot/s)", file=sys.stderr)

    # ---- Pallas VPU kernels (the kernels' own execution regime) -------
    # The XLA chains above keep one dependent stream per element, so they
    # bound the VPU from below (issue latency, not width).  These Pallas
    # kernels use 4 independent accumulators on a VMEM-resident tile —
    # the same regime as ops/pairwise.py — and measure the ceiling the
    # pairwise kernels actually compete against.
    from jax.experimental import pallas as pl

    tile = (256, 1024)  # 4 accs + x + temps must fit the 16 MB scoped VMEM
    k_pl = 1024
    xt = jnp.asarray(np.random.RandomState(3).uniform(0.5, 1.5, tile),
                     jnp.float32)

    unroll_pl = 8  # in-body unroll: Mosaic loops are NOT auto-unrolled;
    # a 1-step body measures loop bookkeeping, not VPU issue width

    def _vpu_fma_kernel(x_ref, o_ref):
        x = x_ref[...]
        c1, c2, c3, c4 = (jnp.float32(0.9999), jnp.float32(0.9998),
                          jnp.float32(0.9997), jnp.float32(0.9996))

        def body(i, accs):
            a1, a2, a3, a4 = accs
            for _ in range(unroll_pl):
                a1, a2, a3, a4 = (a1 * c1 + x, a2 * c2 + x,
                                  a3 * c3 + x, a4 * c4 + x)
            return (a1, a2, a3, a4)

        a1, a2, a3, a4 = lax.fori_loop(0, k_pl // unroll_pl, body,
                                       (x, x, x, x))
        o_ref[...] = (a1 + a2) + (a3 + a4)

    fma_pl = jax.jit(pl.pallas_call(
        _vpu_fma_kernel, out_shape=jax.ShapeDtypeStruct(tile, jnp.float32)))

    def run_fma_pl():
        holder["y"] = fma_pl(xt)

    t_fma_pl = timeit(run_fma_pl, sync, reps=50)
    n_fma_pl = tile[0] * tile[1] * k_pl * 4
    vpu_pl_tflops = 2.0 * n_fma_pl / t_fma_pl / 1e12
    t_pl_slot = t_fma_pl / n_fma_pl
    print(f"  pallas fma (4 accs): {t_fma_pl*1e3:.3f} ms/call -> "
          f"{vpu_pl_tflops:.2f} f32 TFLOP/s ({n_fma_pl/t_fma_pl/1e12:.2f} "
          f"Tslot/s)", file=sys.stderr)

    def _vpu_rsqrt_kernel(x_ref, o_ref):
        x = x_ref[...]
        b = jnp.float32(1e-4)

        def body(i, accs):
            a1, a2, a3, a4 = accs
            for _ in range(unroll_pl):
                a1, a2, a3, a4 = (lax.rsqrt(a1) + b, lax.rsqrt(a2) + b,
                                  lax.rsqrt(a3) + b, lax.rsqrt(a4) + b)
            return (a1, a2, a3, a4)

        a1, a2, a3, a4 = lax.fori_loop(
            0, k_pl // unroll_pl, body, (x, x + 1.0, x + 2.0, x + 3.0))
        o_ref[...] = (a1 + a2) + (a3 + a4)

    rsqrt_pl = jax.jit(pl.pallas_call(
        _vpu_rsqrt_kernel, out_shape=jax.ShapeDtypeStruct(tile, jnp.float32)))

    def run_rsqrt_pl():
        holder["y"] = rsqrt_pl(xt)

    t_rsqrt_pl = timeit(run_rsqrt_pl, sync, reps=50)
    n_rsqrt_pl = tile[0] * tile[1] * k_pl * 4
    rsqrt_pl_rate = n_rsqrt_pl / t_rsqrt_pl / 1e9
    rsqrt_pl_slots = (t_rsqrt_pl / n_rsqrt_pl) / t_pl_slot - 1.0
    print(f"  pallas rsqrt (4 accs): {t_rsqrt_pl*1e3:.3f} ms/call -> "
          f"{rsqrt_pl_rate:.1f} Grsqrt/s, slot cost {rsqrt_pl_slots:.2f}",
          file=sys.stderr)

    # ---- MXU bf16 matmul chain ---------------------------------------
    m = 4096
    w = jnp.asarray(np.random.RandomState(1).randn(m, m) / np.sqrt(m),
                    jnp.bfloat16)
    xm = jnp.asarray(np.random.RandomState(2).randn(m, m), jnp.bfloat16)
    k_mm = 16

    @jax.jit
    def mm_chain(x, w):
        def body(i, x):
            y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return (y * jnp.float32(0.1)).astype(jnp.bfloat16)
        return lax.fori_loop(0, k_mm, body, x)

    def run_mm():
        holder["y"] = mm_chain(xm, w)

    def sync_mm():
        float(jnp.asarray(holder["y"], jnp.float32).sum())

    t_mm = timeit(run_mm, sync_mm, reps=10)
    mm_flops = 2.0 * m * m * m * k_mm
    mxu_tflops = mm_flops / t_mm / 1e12
    print(f"  mxu bf16 chain: {t_mm*1e3:.3f} ms/call -> "
          f"{mxu_tflops:.1f} bf16 TFLOP/s", file=sys.stderr)

    results["roofline"] = {
        "backend": backend,
        "xla_fma_f32_tflops": round(vpu_tflops, 3),
        "xla_fma4_f32_tflops": round(vpu4_tflops, 3),
        "xla_fma4_tslots": round(n_fma4 / t_fma4 / 1e12, 3),
        "xla_rsqrt_grate_gps": round(rsqrt_rate, 2),
        "xla_rsqrt_slot_cost": round(rsqrt_slots, 2),
        "pallas_fma_f32_tflops": round(vpu_pl_tflops, 3),
        "pallas_fma_tslots": round(n_fma_pl / t_fma_pl / 1e12, 3),
        "pallas_rsqrt_grate_gps": round(rsqrt_pl_rate, 2),
        "pallas_rsqrt_slot_cost": round(rsqrt_pl_slots, 2),
        "mxu_bf16_tflops": round(mxu_tflops, 2),
    }

    out_path = Path(__file__).parent / "results.json"
    from run_all import merge_write  # noqa: E402
    merge_write(results, out_path)
    print(json.dumps(results["roofline"]))


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
