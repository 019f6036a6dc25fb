"""HBM->VMEM streaming-ceiling probe (VERDICT r4 item 1).

Question: is the int8 decode kernel's measured ~475-485 GB/s weight-streaming
rate (docs/PERFORMANCE.md "Wider int8 weight blocks") the KERNEL's ceiling or
the BACKEND's? The decode step is ~75% weight matmuls, so if a better DMA
pipeline can stream faster, that is the largest single-chip RTF lever left;
if pure streaming tops out at the same rate, decode is at the backend floor
and the book closes with evidence.

Measures, all back-to-back in ONE tunnel window (ABAB-capable via --reps):

- ``grid``: a Pallas kernel whose ONLY job is streaming — gridded over
  weight chunks exactly like ops/int8_matmul (auto-pipelined, double
  buffered), but the per-chunk compute is a trivial partial-row reduce
  (~0.5 us) so the pipeline is DMA-bound, not MXU/VPU-bound.
- ``manual{d}x{c}``: the same streaming with MANUAL multi-buffered DMA —
  depth d in-flight copies of c-MB chunks (the "deeper DMA pipeline" the
  round-4 decomposition speculated about, docs/PERFORMANCE.md:476).
- ``matmul_ctl``: the real ops/int8_matmul chained at the w_down decode
  shape — ties the probe's rates to the kernel's rate within this window.

Methodology (CLAUDE.md): everything that is timed runs INSIDE one compiled
program (multiple passes over a weight far larger than VMEM); one dispatch,
one device_get fetch. Per-program launch (~450 us) amortizes over the
multi-GB program. Consecutive grid steps always touch DIFFERENT chunks so
no block-revisit optimization can skip a copy.

Usage (TPU):  timeout 600 python scripts/hbm_stream_probe.py
CPU smoke:    python scripts/hbm_stream_probe.py --tiny
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--mb", type=int, default=256, help="weight size (MB)")
    p.add_argument("--passes", type=int, default=16,
                   help="in-program passes over the weight")
    p.add_argument("--reps", type=int, default=3,
                   help="timed executions per variant (min is reported)")
    p.add_argument("--full_reduce", action="store_true",
                   help="reduce whole chunks (VPU-heavier; cross-check)")
    args = p.parse_args()

    if args.tiny:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from realtime_codec_agent_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    C = 2048 if args.tiny else 16384           # chunk width (lanes)
    total_mb = 2 if args.tiny else args.mb
    passes = 2 if args.tiny else args.passes
    rows_total = total_mb * 1024 * 1024 // C
    rng = np.random.default_rng(0)
    w_np = rng.integers(-127, 127, size=(rows_total, C), dtype=np.int8)
    w = jnp.asarray(w_np)
    total_bytes = w.size  # int8
    interp = args.tiny

    REDUCE_ROWS = None if args.full_reduce else 32

    def _reduce(chunk):
        sub = chunk if REDUCE_ROWS is None else chunk[:REDUCE_ROWS, :]
        return jnp.sum(sub.astype(jnp.int32))

    # ---- grid variant: Pallas auto-pipeline, same structure as int8_matmul
    def make_grid(chunk_mb: float):
        chunk_rows = max(32, int(chunk_mb * 1024 * 1024) // C)
        n_chunks = rows_total // chunk_rows

        # running reduction in SMEM scratch; the (1,1) output writes ONCE on
        # the final grid step (revisited-output reads hang the interpreter,
        # and (1,1) output blocks fail the TPU tiling rule)
        def kernel(w_ref, o_ref, acc_ref):
            p, i = pl.program_id(0), pl.program_id(1)

            @pl.when((p == 0) & (i == 0))
            def _():
                acc_ref[0, 0] = 0

            acc_ref[0, 0] = acc_ref[0, 0] + _reduce(w_ref[:])

            @pl.when((p == passes - 1) & (i == n_chunks - 1))
            def _():
                o_ref[0, 0] = acc_ref[0, 0]

        # grid (passes, n_chunks): last dim iterates fastest, so consecutive
        # steps always read different chunks (no revisit elision possible)
        call = pl.pallas_call(
            kernel,
            grid=(passes, n_chunks),
            in_specs=[pl.BlockSpec((chunk_rows, C), lambda p, i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
            interpret=interp,
        )

        @jax.jit
        def fn(wa):
            return call(wa)[0, 0]

        eff_bytes = passes * n_chunks * chunk_rows * C
        return (lambda f=fn: f(w)), eff_bytes

    # ---- manual variant: explicit depth-d multi-buffered HBM->VMEM DMA
    def make_manual(chunk_mb: float, depth: int):
        chunk_rows = max(32, int(chunk_mb * 1024 * 1024) // C)
        n_chunks = rows_total // chunk_rows
        total_steps = passes * n_chunks

        def kernel(w_hbm, o_ref):
            def body(scratch, sems, acc):
                def get_dma(step):
                    chunk_idx = step % n_chunks
                    slot = step % depth
                    return pltpu.make_async_copy(
                        w_hbm.at[pl.ds(chunk_idx * chunk_rows, chunk_rows), :],
                        scratch.at[slot],
                        sems.at[slot],
                    )

                for s in range(depth):  # prologue: fill the pipeline
                    get_dma(s).start()
                acc[0, 0] = 0

                def loop(step, _):
                    get_dma(step).wait()
                    slot = step % depth
                    acc[0, 0] = acc[0, 0] + _reduce(scratch[slot])

                    @pl.when(step + depth < total_steps)
                    def _():
                        get_dma(step + depth).start()

                    return 0

                jax.lax.fori_loop(0, total_steps, loop, 0)
                o_ref[0, 0] = acc[0, 0]

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((depth, chunk_rows, C), jnp.int8),
                sems=pltpu.SemaphoreType.DMA((depth,)),
                acc=pltpu.SMEM((1, 1), jnp.int32),
            )

        call = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            interpret=interp,
        )

        @jax.jit
        def fn(wa):
            return call(wa)[0, 0]

        eff_bytes = total_steps * chunk_rows * C
        return (lambda f=fn: f(w)), eff_bytes

    # ---- control: the real int8 decode kernel at the w_down shape, chained
    def make_matmul_ctl():
        from realtime_codec_agent_tpu.ops.int8_matmul import int8_matmul

        k, n = (1024, 256) if args.tiny else (8192, 2048)
        wq = jnp.asarray(
            rng.integers(-127, 127, size=(k, n), dtype=np.int8))
        s = jnp.asarray(np.full((n,), 0.01, np.float32))
        x0 = jnp.asarray(rng.normal(size=(2, k)).astype(np.float32))
        iters = 4 if args.tiny else 256

        @jax.jit
        def fn(wqa):
            def body(i, carry):
                x = x0 + carry[:, :1] * 1e-30  # carry dep: no hoisting
                y = int8_matmul(x, wqa, s, interpret=interp)
                return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))

            out = jax.lax.fori_loop(0, iters, body, jnp.zeros((2, k), jnp.float32))
            return jnp.sum(out)

        return (lambda f=fn: f(wq)), iters * (k * n + 4 * n)

    variants = []
    if not args.tiny:
        variants += [("grid_2mb", make_grid(2)), ("grid_4mb", make_grid(4))]
        for cmb, d in [(1, 2), (1, 4), (2, 2), (2, 3), (2, 4), (4, 2), (4, 3)]:
            variants.append((f"manual{d}x{cmb}mb", make_manual(cmb, d)))
        variants.append(("matmul_ctl", make_matmul_ctl()))
    else:
        variants += [("grid_1mb", make_grid(1)), ("manual2x1mb", make_manual(1, 2)),
                     ("matmul_ctl", make_matmul_ctl())]

    results = {}
    for name, (fn, eff_bytes) in variants:
        t_c = time.perf_counter()
        jax.device_get(fn())  # compile + first run
        print(f"[{name}] compiled+warm in {time.perf_counter()-t_c:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.device_get(fn())
            times.append(time.perf_counter() - t0)
        dt = min(times)
        gbs = eff_bytes / dt / 1e9
        results[name] = {"ms": round(dt * 1e3, 2), "gbs": round(gbs, 1),
                         "all_ms": [round(t * 1e3, 2) for t in times]}
        print(f"[{name}] {dt*1e3:8.2f} ms  {gbs:7.1f} GB/s  "
              f"(reps {['%.2f' % (t*1e3) for t in times]})",
              file=sys.stderr, flush=True)

    print(json.dumps({"total_weight_mb": total_mb, "passes": passes,
                      "reduce_rows": REDUCE_ROWS, "results": results}))


if __name__ == "__main__":
    main()
