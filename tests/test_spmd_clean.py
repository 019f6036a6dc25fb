"""The multi-chip train step must partition without GSPMD fallbacks.

"[SPMD] Involuntary full rematerialization" means the partitioner gave up on
an efficient reshard and replicates the tensor every step — on real hardware
that is a full all-gather + repartition in the hot loop (VERDICT r2: two such
warnings on the 8-device dryrun, traced to the embedding table's grad layout;
fixed by the vocab-over-(tp,fsdp) spec in parallel/mesh.lm_param_specs).

The warnings come from XLA's C++ stderr, so the check runs the tiny train
step (dp2/fsdp2/tp2 — the exact config that warned) plus a pp=2 step in a
subprocess and asserts the log is clean.
"""
import subprocess
import sys

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np
from realtime_codec_agent_tpu.models.llama import init_lm_params, tiny_lm_config
from realtime_codec_agent_tpu.parallel import make_mesh
from realtime_codec_agent_tpu.train import TrainConfig, Trainer, pad_batch
import dataclasses

devices = jax.devices()
cfg = tiny_lm_config(vocab_size=512, codec_vocab_start=300, codebook_size=212)
params = init_lm_params(jax.random.PRNGKey(0), cfg, with_codec_embed=True)
rng = np.random.default_rng(0)
seqs = [list(rng.integers(1, cfg.vocab_size, size=60)) for _ in range(8)]
batch, labels = pad_batch(seqs, 64, pad_id=0)

mesh = make_mesh(dp=2, fsdp=2, tp=2, devices=devices)
tc = TrainConfig(output_dir="/tmp/rtca_spmdclean", max_steps=1, warmup_steps=0, max_seq_len=64)
m = Trainer(params, cfg, tc, mesh=mesh).train_batch(batch, labels)
assert np.isfinite(m["loss"])

pp_mesh = make_mesh(dp=2, fsdp=1, tp=2, pp=2, devices=devices)
pp_cfg = dataclasses.replace(cfg, compute_dtype="float32")
pp_tc = TrainConfig(output_dir="/tmp/rtca_spmdclean_pp", max_steps=1, warmup_steps=0,
                    max_seq_len=64, pp_microbatches=4)
pp_params = init_lm_params(jax.random.PRNGKey(0), pp_cfg, with_codec_embed=True)
m = Trainer(pp_params, pp_cfg, pp_tc, mesh=pp_mesh).train_batch(batch, labels)
assert np.isfinite(m["loss"])
print("STEPS_OK")
"""


def test_train_steps_partition_without_spmd_fallbacks():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=540,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu"},
    )
    assert "STEPS_OK" in proc.stdout, proc.stderr[-3000:]
    assert "Involuntary full rematerialization" not in proc.stderr, (
        "GSPMD fell back to replicate+repartition:\n"
        + "\n".join(
            l for l in proc.stderr.splitlines() if "Involuntary" in l
        )[:2000]
    )
