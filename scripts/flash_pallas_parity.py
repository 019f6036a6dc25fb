"""TPU numerics check: train_attention's Pallas route vs the XLA key-block scan.

Forward + gradient parity at bf16 on the real chip, with a padded tail in the
valid mask (the pad_batch contract). Throughput-mode timing of fwd+bwd for
both routes rides along (same window, dispatch N fetch once).

Round-4 measured (v5e-1, B=2 T=2048 H=16 Dh=64, bf16):
  fwd max|diff| (valid rows): 4.9e-4
  grad dq/dk/dv rel max diff: 0.39% / 0.50% / 0.28%
  fwd+bwd: pallas 2.51 ms vs xla scan 5.06 ms  (2.0x)
Full train step (bench_suite --train_seq_len 2048 --train_batch 4, ABA in one
window): pallas 8532/8460 tok/s (39.1/38.8% MFU) vs xla 6170 (28.3%), loss
identical — see docs/PERFORMANCE.md "Round-4 wins".
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
import jax.numpy as jnp
import numpy as np

from realtime_codec_agent_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()
from realtime_codec_agent_tpu.ops import nn

B, T, H, Dh = 2, 2048, 16, 64
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, T, H, Dh), jnp.bfloat16)
k = jax.random.normal(kk, (B, T, H, Dh), jnp.bfloat16)
v = jax.random.normal(kv, (B, T, H, Dh), jnp.bfloat16)
valid = (jnp.arange(T)[None, :] < jnp.array([[T], [T - 300]])).astype(jnp.int32)
co = jax.random.normal(jax.random.PRNGKey(9), (B, T, H, Dh), jnp.float32)
vm = valid[:, :, None, None].astype(jnp.float32)


def loss_with(fn):
    def f(q, k, v):
        return jnp.sum(fn(q, k, v, valid=valid).astype(jnp.float32) * co * vm)
    return f


out_p = jax.jit(lambda q, k, v: nn.flash_attention_pallas(q, k, v, valid=valid))(q, k, v)
out_x = jax.jit(lambda q, k, v: nn.flash_causal_attention(q, k, v, valid=valid))(q, k, v)
d = jnp.abs(out_p.astype(jnp.float32) * vm - out_x.astype(jnp.float32) * vm)
print("fwd max|diff| (valid rows):", float(jnp.max(d)), flush=True)

gp = jax.jit(jax.grad(loss_with(nn.flash_attention_pallas), argnums=(0, 1, 2)))(q, k, v)
gx = jax.jit(jax.grad(loss_with(nn.flash_causal_attention), argnums=(0, 1, 2)))(q, k, v)
for name, a, b in zip("qkv", gp, gx):
    scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) or 1.0
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"grad d{name}: max|diff|={diff:.4f} (max|ref|={scale:.2f}, rel={diff/scale:.4f})", flush=True)

# throughput: fwd+bwd chained on device, one fetch
for name, fn in (("pallas", nn.flash_attention_pallas), ("xla", nn.flash_causal_attention)):
    step = jax.jit(jax.grad(loss_with(fn)))
    g = step(q, k, v)  # compile
    jax.device_get(g.ravel()[0])
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        g = step(q, k, v)
    jax.device_get(g.ravel()[0])
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name}: fwd+bwd {dt:.2f} ms (B={B} T={T} H={H})", flush=True)
