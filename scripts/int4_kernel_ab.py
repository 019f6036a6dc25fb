"""Kernel-level decode-matmul A/B: where do int4's bytes (not) go?

VERDICT r3 item 4: int4 decode (Q4_K_M-parity weights) shows no bandwidth
win over int8 at B=1 even though it reads ~25% fewer weight bytes. This
script pins the cause with per-shape numbers, all taken back-to-back in ONE
tunnel window (CLAUDE.md: A/B is only valid within a window; throughput
mode: dispatch N, fetch once):

- every decode matmul shape of the 1B LM (q/k/v/o, gate/up/down) — the
  exact shapes `ops/nn.qdot` routes to the Pallas kernels at rows <= 8;
- formats: bf16 `jnp.dot`, int8 Pallas (`ops/int8_matmul`), int4 Pallas
  split-dot, int4 Pallas concat (RTCA_INT4_SPLIT=0), int4 split with bf16
  scale/min (RTCA_INT4_DM_BF16=1);
- rows R in {1, 2, 4, 8} — the serving/grouped-duplex operating points.

For each (shape, format, R): ms/call and effective GB/s (weight-stream
bytes / time). The analytic VPU-op roofline for the dequant rides along so
"the nibble unpack is VPU work" is a number, not a shrug.

Usage (TPU):  python scripts/int4_kernel_ab.py [--iters 64] [--rows 1,2,4,8]
CPU smoke:    python scripts/int4_kernel_ab.py --tiny --iters 2

METHODOLOGY CAVEAT (round-4 measured): each timed call here is its own
program execution, and this backend charges a ~450 us per-execution launch
floor — a single decode matmul finishes in far less, so per-shape numbers
from this script are launch-floor-dominated and only the RATIOS between
formats at the same shape are meaningful. For absolute streaming rates,
chain the op inside ONE program (lax.fori_loop on a carry, as in
docs/PERFORMANCE.md "Wider int8 weight blocks": the same matmuls that
measure ~450 us standalone average 59 us in-program).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--rows", default="1,2,4,8")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--group", type=int, default=32)
    args = p.parse_args()

    if args.tiny:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    H, F, KV = (256, 1024, 64) if args.tiny else (2048, 8192, 512)
    # (label, K, N): the 7 per-layer decode matmuls of Llama-3.2-1B geometry
    shapes = [
        ("wq", H, H), ("wk", H, KV), ("wv", H, KV), ("wo", H, H),
        ("gate", H, F), ("up", H, F), ("down", F, H),
    ]
    rows = [int(r) for r in args.rows.split(",")]
    rng = np.random.default_rng(0)
    results = {}

    def timed(fn, x, it):
        y = fn(x)  # compile + warm
        y.block_until_ready()
        # chain x -> y dependency-free repeated dispatches; ONE fetch syncs
        t0 = time.perf_counter()
        outs = [fn(x) for _ in range(it)]
        jax.device_get(outs[-1][..., :1])
        jax.device_get(outs[0][..., :1])
        dt = (time.perf_counter() - t0) / it
        return dt

    def bench_format(fmt_label, make_fn, bytes_per_shape):
        for name, k, n in shapes:
            w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
            fn, wbytes = make_fn(w, k, n)
            for r in rows:
                x = jnp.asarray(rng.normal(size=(r, k)).astype(np.float32))
                dt = timed(fn, x, args.iters)
                key = (fmt_label, name, r)
                results[key] = (dt * 1e3, wbytes / dt / 1e9)
        print(f"[{fmt_label}] done", file=sys.stderr)

    import jax

    def make_bf16(w, k, n):
        wd = jnp.asarray(w, jnp.bfloat16)

        @jax.jit
        def fn(x):
            return jnp.dot(x, wd, preferred_element_type=jnp.float32)

        return fn, 2 * k * n

    def make_int8(w, k, n):
        from realtime_codec_agent_tpu.ops.int8_matmul import int8_matmul

        s = np.abs(w).max(axis=0) / 127.0
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        qd, sd = jnp.asarray(q), jnp.asarray(s, jnp.float32)

        @jax.jit
        def fn(x):
            return int8_matmul(x, qd, sd, interpret=args.tiny)

        return fn, k * n + 4 * n

    def quant4(w, k, n):
        g = args.group
        kg = k // g
        g3 = w.reshape(kg, g, n)
        wmax, wmin = g3.max(axis=1), g3.min(axis=1)
        d = np.maximum((wmax - wmin) / 15.0, 1e-12)
        m = -wmin
        q = np.clip(np.round((g3 + m[:, None]) / d[:, None]), 0, 15).astype(np.uint8)
        gh = g // 2
        packed = (q[:, :gh, :] | (q[:, gh:, :] << 4)).reshape(k // 2, n)
        return packed, d, m

    def make_int4(w, k, n):
        from realtime_codec_agent_tpu.ops.int4_matmul import int4_matmul

        packed, d, m = quant4(w, k, n)
        dm_bytes = 2 if os.environ.get("RTCA_INT4_DM_BF16") == "1" else 4
        qd = jnp.asarray(packed)
        dd, md = jnp.asarray(d, jnp.float32), jnp.asarray(m, jnp.float32)

        @jax.jit
        def fn(x):
            return int4_matmul(x, qd, dd, md, interpret=args.tiny)

        return fn, k * n // 2 + 2 * dm_bytes * (k // args.group) * n

    variants = [("bf16", make_bf16), ("int8-pallas", make_int8)]
    for env, label in [
        ({}, "int4-split"),
        ({"RTCA_INT4_SPLIT": "0"}, "int4-concat"),
        ({"RTCA_INT4_DM_BF16": "1"}, "int4-split-dmbf16"),
    ]:
        variants.append((label, make_int4, env))

    for entry in variants:
        if len(entry) == 2:
            label, mk = entry
            env = {}
        else:
            label, mk, env = entry
        saved = {}
        for kk, vv in env.items():
            saved[kk] = os.environ.get(kk)
            os.environ[kk] = vv
        # the kernels read RTCA_INT4_* at trace time: force a retrace
        jax.clear_caches()
        try:
            bench_format(label, mk, None)
        finally:
            for kk, vv in saved.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv

    # ---- report ----
    fmt_labels = []
    for entry in variants:
        fmt_labels.append(entry[0])
    print(f"\nper-call ms (eff GB/s) — iters={args.iters}, one window")
    for r in rows:
        print(f"\nrows={r}")
        print(f"{'shape':8s} " + " ".join(f"{f:>22s}" for f in fmt_labels))
        for name, k, n in shapes:
            cells = []
            for f in fmt_labels:
                ms, gbps = results[(f, name, r)]
                cells.append(f"{ms:8.3f} ({gbps:6.1f}GB/s)")
            print(f"{name:8s} " + " ".join(f"{c:>22s}" for c in cells))
        # layer-stack sum (x16 layers = per-step layer cost, lm_head excluded)
        print(f"{'SUM':8s} " + " ".join(
            f"{sum(results[(f, nm, r)][0] for nm, _, _ in shapes):8.3f} ms"
            + " " * 12
            for f in fmt_labels
        ))

    # analytic VPU roofline for the int4 dequant, per layer-stack call
    weights = sum(k * n for _, k, n in shapes)
    print(
        f"\nanalytic: {weights/1e6:.0f}M weights/layer-stack; int4 dequant = "
        f"~5 VPU ops/weight (widen, mask|shift, int->f32, fma, f32->bf16) = "
        f"{5*weights/1e9:.2f} G-ops per call — at O(1) TOPS VPU throughput "
        f"that is milliseconds-scale, vs the ~{weights*0.5/1e6:.0f}MB byte "
        f"saving's ~{weights*0.5/819e3:.3f} ms at 819 GB/s peak"
    )
    print(json.dumps({
        "metric": "int4_kernel_ab", "value": 1.0, "unit": "table",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
