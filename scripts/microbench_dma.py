#!/usr/bin/env python
"""Scattered-row DMA microbenchmark (VERDICT r4 weak #1 feasibility test).

Question: can the payload-table gather (one XLA row-gather of ``capacity``
indices, ~10-13 ns/index, ~11 ms/step at garden scale) be hidden inside
the forward blend kernel by issuing per-entry 64-byte row DMAs
(HBM -> VMEM) for chunk k+1 while the VPU blends chunk k?

The bound that decides it: a Pallas kernel fetching 128 scattered rows
per chunk must sustain <= ~12 ns/row to break even with the XLA gather,
and the DMA issue+completion path must overlap VPU work. This bench
measures, on the real chip:

  A. xla_gather          — table[ids] at production sizes (the incumbent);
  B. dma_contig          — one contiguous (16,128) chunk DMA per grid step
                           (what the kernel does today after the gather);
  C. dma_scattered       — 128 single-row DMAs per grid step from SMEM-
                           staged ids (the proposed in-kernel gather);
  D. dma_scattered_vpu   — C plus a VPU workload per chunk ~ the real blend
                           kernel's issue load, to measure overlap: if
                           time(D) ~= max(time(C), time(vpu)), the row DMAs
                           overlap; if ~= sum, they serialize.

Run on the chip:  python scripts/microbench_dma.py
Prints one JSON line with ns/row for each mode.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS_W = 16          # payload row width (f32) = 64 bytes
CHUNK = 128


def timeit(fn, *args, steps=20, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144, help="table rows")
    ap.add_argument("--cap", type=int, default=1_048_576,
                    help="entries gathered per pass")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--vpu_iters", type=int, default=24,
                    help="VPU ops per chunk in mode D (~ blend kernel load)")
    ap.add_argument("--interpret", action="store_true")
    a = ap.parse_args()

    import jax
    if a.interpret:
        # correctness-only mode must NOT touch the (single-tenant) TPU
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seed = int.from_bytes(os.urandom(4), "little")
    print(f"# seed {seed} backend {jax.default_backend()}", file=sys.stderr)
    key = jax.random.key(seed)
    table = jax.random.normal(key, (a.n, ROWS_W), jnp.float32)
    ids = jax.random.randint(jax.random.key(seed + 1), (a.cap,), 0, a.n,
                             jnp.int32)
    # honest-mode flip (axon speculation): force a readback before timing
    _ = float(jnp.sum(table[:8]).block_until_ready())

    results = {}

    # ---- A: the incumbent XLA row gather ----
    @jax.jit
    def xla_gather(t, i):
        return jnp.sum(t[i], dtype=jnp.float32)

    dt = timeit(xla_gather, table, ids, steps=a.steps)
    results["xla_gather_ns_per_idx"] = dt / a.cap * 1e9

    n_chunks = a.cap // CHUNK

    # ---- B: contiguous chunk DMA (today's kernel input path) ----
    def contig_kernel(src_hbm, out_ref, scratch, sem):
        c = pl.program_id(0)
        dma = pltpu.make_async_copy(src_hbm.at[c], scratch, sem)
        dma.start()
        dma.wait()
        out_ref[...] = scratch[...]      # whole-block write (keeps the DMA live)

    # the real payload chunk layout: (16, 128) rows-of-attributes
    src = jax.random.normal(jax.random.key(seed + 2),
                            (n_chunks, ROWS_W, CHUNK), jnp.float32)

    @jax.jit
    def dma_contig(s):
        return pl.pallas_call(
            contig_kernel,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS_W, CHUNK), jnp.float32),
            scratch_shapes=[pltpu.VMEM((ROWS_W, CHUNK), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=a.interpret,
        )(s)

    # ---- C: 128 scattered single-row DMAs per chunk ----
    NSEM = 8

    def scattered_kernel(ids_smem, src_hbm, out_ref, scratch, sem,
                         *, vpu_iters):
        del out_ref
        base = pl.program_id(0) * CHUNK
        # keep at most NSEM row DMAs in flight, waiting in issue order
        # NB: Mosaic requires DMA slices 128-lane aligned — a 64-byte
        # (N,16) row is NOT expressible, so the table here is padded to
        # (N,128) f32 (8x the payload bytes): the measurement bounds the
        # descriptor rate, the true cost is 8x-bytes * that rate.
        def pipe(j, _):
            row = ids_smem[base + j]
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(row, 1)], scratch.at[pl.ds(j, 1)],
                sem.at[j % NSEM]).start()

            @pl.when(j >= NSEM - 1)
            def _():
                k = j - (NSEM - 1)
                rowk = ids_smem[base + k]
                pltpu.make_async_copy(
                    src_hbm.at[pl.ds(rowk, 1)], scratch.at[pl.ds(k, 1)],
                    sem.at[k % NSEM]).wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, pipe, 0)

        def tail(j, _):
            rowk = ids_smem[base + j]
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(rowk, 1)], scratch.at[pl.ds(j, 1)],
                sem.at[j % NSEM]).wait()
            return 0

        jax.lax.fori_loop(CHUNK - (NSEM - 1), CHUNK, tail, 0)

        if vpu_iters:
            x = scratch[...]
            def vpu(i, x):
                return x * 1.000001 + 0.5
            x = jax.lax.fori_loop(0, vpu_iters, vpu, x)
            scratch[...] = x

    def scattered(vpu_iters):
        kernel = functools.partial(scattered_kernel, vpu_iters=vpu_iters)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_chunks,),
            in_specs=[
                # whole ids array in SMEM (use a small --cap: SMEM is KBs)
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((CHUNK, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((NSEM,))],
        )

        @jax.jit
        def run(i, t):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
                interpret=a.interpret,
            )(i, t)

        return run

    ids2 = ids[: n_chunks * CHUNK]
    table128 = jax.random.normal(jax.random.key(seed + 3), (a.n, 128),
                                 jnp.float32)
    dt = timeit(scattered(0), ids2, table128, steps=a.steps)
    results["dma_scattered_ns_per_row"] = dt / (n_chunks * CHUNK) * 1e9

    # ---- D: scattered DMAs + VPU load (overlap test) ----
    dt_d = timeit(scattered(a.vpu_iters), ids2, table128, steps=a.steps)
    results["dma_scattered_vpu_ns_per_row"] = dt_d / (n_chunks * CHUNK) * 1e9

    dt = timeit(dma_contig, src, steps=a.steps)
    results["dma_contig_ns_per_row"] = dt / (n_chunks * CHUNK) * 1e9

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
