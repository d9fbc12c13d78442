"""Probe: does Mosaic support dynamic row gathers from VMEM, and how fast?

The backbone's gather-GEMM sparse convs are row-rate bound (~236M gathered
rows/s from HBM, PERF.md). The windowed-gather kernel idea (VERDICT item 4)
needs in-VMEM gathers: DMA a contiguous window of input rows into VMEM
once, then gather neighbor rows from VMEM per kernel offset. This probe
answers (a) does `window[idx]` / jnp.take lower at all in a Pallas TPU
kernel, (b) throughput vs the XLA HBM gather baseline.

Run on the real chip: python tools/probe_vmem_gather.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0].astype("float32"))


def gather_kernel(idx_ref, x_ref, out_ref):
    """out[i] = x[idx[i]] with x resident in VMEM."""
    out_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)


def gather_kernel_ta(idx_ref, x_ref, out_ref):
    """take_along_axis form: out[i, c] = x[idx[i], c] via a broadcast 2-D
    index — Mosaic's sublane dynamic-gather shape."""
    idx2d = jnp.broadcast_to(idx_ref[:], out_ref.shape)  # idx [BK,1]->[BK,C]
    out_ref[:] = jnp.take_along_axis(x_ref[:], idx2d, axis=0)


def _bench_ta(x, idx, B, K, C):
    """Throughput of the take_along_axis VMEM gather + XLA baselines."""
    ITERS = 50
    W = x.shape[0]

    @jax.jit
    def bench(x, idx):
        def body(i, acc):
            g = pl.pallas_call(
                gather_kernel_ta,
                out_shape=jax.ShapeDtypeStruct((B * K, C), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx[:, None], x * (1.0 + acc * 1e-38))
            return g.reshape(-1)[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    fence(bench(x, idx))
    t0 = time.perf_counter()
    fence(bench(x, idx))
    dt = (time.perf_counter() - t0) / ITERS
    rows = B * K
    print(f"VMEM ta-gather: {rows} rows x {C} f32 in {dt*1e6:.1f} us "
          f"-> {rows/dt/1e6:.0f} M rows/s, {rows*C*4/dt/1e9:.1f} GB/s")

    @jax.jit
    def bench_xla(x, idx):
        def body(i, acc):
            g = jnp.take(x * (1.0 + acc * 1e-38), idx, axis=0)
            return g.reshape(-1)[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    fence(bench_xla(x, idx))
    t0 = time.perf_counter()
    fence(bench_xla(x, idx))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"XLA  gather (same shape): {dt*1e6:.1f} us "
          f"-> {rows/dt/1e6:.0f} M rows/s, {rows*C*4/dt/1e9:.1f} GB/s")

    rng = np.random.default_rng(1)
    N = M = 262144
    xb = jnp.asarray(rng.random((N, 128), np.float32))
    idxb = jnp.asarray(rng.integers(0, N, (M,)).astype(np.int32))

    @jax.jit
    def bench_xla_big(x, idx):
        def body(i, acc):
            g = jnp.take(x * (1.0 + acc * 1e-38), idx, axis=0)
            return g.reshape(-1)[0]
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    fence(bench_xla_big(xb, idxb))
    t0 = time.perf_counter()
    fence(bench_xla_big(xb, idxb))
    dt = (time.perf_counter() - t0) / 10
    print(f"XLA  gather (256k rows from 256k x 128): {dt*1e3:.2f} ms "
          f"-> {M/dt/1e6:.0f} M rows/s, {M*128*4/dt/1e9:.1f} GB/s")


def main():
    print("backend:", jax.default_backend())
    W, C, B = 4096, 128, 1024         # window rows, channels, block rows
    K = 27                            # gathers per output row (k3 conv)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((W, C), np.float32))
    idx = jnp.asarray(rng.integers(0, W, (B * K,)).astype(np.int32))

    # (a) does it compile?
    try:
        out = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((B * K, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, x)
        ref = np.asarray(x)[np.asarray(idx)]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
        print("VMEM row gather: COMPILES and is CORRECT")
    except Exception as e:
        print(f"VMEM row gather (SMEM idx): FAILED -> {type(e).__name__}: "
              f"{str(e)[:500]}")
        # try VMEM-resident indices instead
        try:
            out = pl.pallas_call(
                gather_kernel,
                out_shape=jax.ShapeDtypeStruct((B * K, C), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, x)
            ref = np.asarray(x)[np.asarray(idx)]
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
            print("VMEM row gather (VMEM idx): COMPILES and is CORRECT")
        except Exception as e2:
            print(f"VMEM row gather (VMEM idx): FAILED -> "
                  f"{type(e2).__name__}: {str(e2)[:500]}")
            try:
                out = pl.pallas_call(
                    gather_kernel_ta,
                    out_shape=jax.ShapeDtypeStruct((B * K, C), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(idx[:, None], x)
                ref = np.asarray(x)[np.asarray(idx)]
                np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
                print("VMEM row gather (take_along_axis): COMPILES and is "
                      "CORRECT")
            except Exception as e3:
                print(f"VMEM row gather (take_along_axis): FAILED -> "
                      f"{type(e3).__name__}: {str(e3)[:500]}")
                return
            _bench_ta(x, idx, B, K, C)
            return

    # (b) throughput: loop the gather in-graph, data-dependent chaining
    ITERS = 50

    @jax.jit
    def bench(x, idx):
        def body(i, acc):
            g = pl.pallas_call(
                gather_kernel,
                out_shape=jax.ShapeDtypeStruct((B * K, C), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, x * (1.0 + acc * 1e-38))
            return g.reshape(-1)[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    fence(bench(x, idx))
    t0 = time.perf_counter()
    fence(bench(x, idx))
    dt = (time.perf_counter() - t0) / ITERS
    rows = B * K
    print(f"VMEM gather: {rows} rows x {C} f32 in {dt*1e6:.1f} us "
          f"-> {rows/dt/1e6:.0f} M rows/s, {rows*C*4/dt/1e9:.1f} GB/s")

    # XLA HBM gather baseline at the same shape
    @jax.jit
    def bench_xla(x, idx):
        def body(i, acc):
            g = jnp.take(x * (1.0 + acc * 1e-38), idx, axis=0)
            return g.reshape(-1)[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    fence(bench_xla(x, idx))
    t0 = time.perf_counter()
    fence(bench_xla(x, idx))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"XLA  gather: {rows} rows x {C} f32 in {dt*1e6:.1f} us "
          f"-> {rows/dt/1e6:.0f} M rows/s, {rows*C*4/dt/1e9:.1f} GB/s")

    # XLA HBM gather at scene scale (the real conv shape)
    N, M = 262144, 262144
    xb = jnp.asarray(rng.random((N, 128), np.float32))
    idxb = jnp.asarray(rng.integers(0, N, (M,)).astype(np.int32))

    @jax.jit
    def bench_xla_big(x, idx):
        def body(i, acc):
            g = jnp.take(x * (1.0 + acc * 1e-38), idx, axis=0)
            return g.reshape(-1)[0]
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    fence(bench_xla_big(xb, idxb))
    t0 = time.perf_counter()
    fence(bench_xla_big(xb, idxb))
    dt = (time.perf_counter() - t0) / 10
    print(f"XLA  gather (256k rows from 256k x 128): {dt*1e3:.2f} ms "
          f"-> {M/dt/1e6:.0f} M rows/s, {M*128*4/dt/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
