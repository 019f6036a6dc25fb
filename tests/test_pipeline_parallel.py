"""Pipeline parallelism (parallel/pipeline.py) on the 8-device virtual CPU
mesh: the GPipe staged forward must be numerically identical to the
scan-over-layers forward — loss, hidden states, AND gradients — and the
Trainer must run/checkpoint/resume on a pp>1 mesh."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_codec_agent_tpu.models.llama import (
    forward,
    init_lm_params,
    stack_layer_params,
    tiny_lm_config,
)
from realtime_codec_agent_tpu.parallel import (
    make_mesh,
    make_pipeline_forward,
    shard_params,
)
from realtime_codec_agent_tpu.train import TrainConfig, Trainer, pad_batch
from realtime_codec_agent_tpu.train.trainer import loss_and_metrics

VOCAB = 304


def f32_cfg(**overrides):
    return tiny_lm_config(
        vocab_size=VOCAB,
        codec_vocab_start=200,
        codebook_size=104,
        compute_dtype="float32",
        **overrides,
    )


def rand_batch(cfg, bs=8, seq=48, seed=0):
    rng = np.random.default_rng(seed)
    seqs = [list(rng.integers(1, cfg.vocab_size, size=seq - i % 5)) for i in range(bs)]
    return pad_batch(seqs, seq, pad_id=0)


@pytest.mark.parametrize(
    "mesh_shape,n_layers,n_micro",
    [
        (dict(dp=2, fsdp=1, tp=2, pp=2), 2, 4),
        (dict(dp=1, fsdp=1, tp=2, pp=4), 4, 2),
        (dict(dp=1, fsdp=2, tp=1, pp=2), 4, 8),
    ],
)
def test_pipeline_matches_scan_forward(mesh_shape, n_layers, n_micro):
    """Loss and gradients through the staged pipeline == the pp=1 scan."""
    cfg = f32_cfg(num_layers=n_layers)
    mesh = make_mesh(**mesh_shape)
    params = stack_layer_params(
        init_lm_params(jax.random.PRNGKey(0), cfg, with_codec_embed=True)
    )
    batch, labels = rand_batch(cfg)

    ref_loss_fn = jax.jit(
        jax.value_and_grad(
            lambda p: loss_and_metrics(p, batch, labels, cfg)[0]
        )
    )
    (ref_loss, ref_grads) = ref_loss_fn(params)

    pp_params = shard_params(params, mesh, pp=True)
    fwd = make_pipeline_forward(mesh, n_micro)
    pp_loss_fn = jax.jit(
        jax.value_and_grad(
            lambda p: loss_and_metrics(p, batch, labels, cfg, forward_fn=fwd)[0]
        )
    )
    (pp_loss, pp_grads) = pp_loss_fn(pp_params)

    np.testing.assert_allclose(
        np.asarray(ref_loss), np.asarray(pp_loss), rtol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        ),
        ref_grads,
        pp_grads,
    )
    # layer stack really is staged: leading axis sharded over pp
    assert pp_params["layers"]["wq"].sharding.spec[0] == "pp"


def test_pipeline_remat_matches():
    """jax.checkpoint inside the stage body changes nothing numerically."""
    import dataclasses

    cfg = f32_cfg(num_layers=2)
    mesh = make_mesh(dp=2, fsdp=1, tp=2, pp=2)
    params = stack_layer_params(init_lm_params(jax.random.PRNGKey(1), cfg))
    batch, labels = rand_batch(cfg, bs=4, seq=32)
    fwd = make_pipeline_forward(mesh, 2)
    pp_params = shard_params(params, mesh, pp=True)

    loss_plain = loss_and_metrics(pp_params, batch, labels, cfg, forward_fn=fwd)[0]
    cfg_remat = dataclasses.replace(cfg, remat=True)
    loss_remat = loss_and_metrics(
        pp_params, batch, labels, cfg_remat, forward_fn=fwd
    )[0]
    np.testing.assert_allclose(
        np.asarray(loss_plain), np.asarray(loss_remat), rtol=1e-6
    )


def test_pipeline_forward_validations():
    cfg = f32_cfg(num_layers=2)
    mesh = make_mesh(dp=2, fsdp=1, tp=2, pp=2)
    fwd = make_pipeline_forward(mesh, 3)
    params = shard_params(
        stack_layer_params(init_lm_params(jax.random.PRNGKey(0), cfg)),
        mesh,
        pp=True,
    )
    with pytest.raises(ValueError, match="divide microbatches"):
        fwd(params, jnp.zeros((4, 8), jnp.int32), cfg)
    with pytest.raises(ValueError, match="pp axis"):
        make_pipeline_forward(make_mesh(dp=2, fsdp=2, tp=2), 2)


def test_train_cli_on_pp_mesh(tmp_path):
    """train_duplex_lm --mesh dp,fsdp,tp,pp drives the pipelined trainer
    end-to-end (float32: the virtual-CPU backend can't compile the staged
    forward's bf16 collectives — bf16 is the TPU path)."""
    import train_duplex_lm

    dataset = tmp_path / "data.txt"
    rng = np.random.default_rng(0)
    with open(dataset, "w") as f:
        for _ in range(8):
            f.write("".join(chr(0x3000 + c) for c in rng.integers(0, 80, size=90)) + "\n")
    metrics = train_duplex_lm.main(
        [
            "--dataset", str(dataset),
            "--output_dir", str(tmp_path / "run"),
            "--tiny",
            "--max_steps", "2",
            "--batch_size", "8",
            "--max_seq_len", "64",
            "--mesh", "1,1,2,2",
            "--pp_microbatches", "4",
            "--compute_dtype", "float32",
            "--eval_split_every_n", "0",
            "--eval_every", "1000",
            "--save_every", "1000",
            "--shuffle_buffer", "0",
            "--warmup_steps", "1",
        ]
    )
    assert np.isfinite(metrics["loss"])


def test_trainer_on_pp_mesh(tmp_path):
    """Full Trainer on a dp2 x tp2 x pp2 mesh: steps run, loss matches the
    pp=1 trainer at init, checkpoints restore, training resumes."""
    cfg = f32_cfg(num_layers=2)
    mesh = make_mesh(dp=2, fsdp=1, tp=2, pp=2)
    params = init_lm_params(jax.random.PRNGKey(0), cfg, with_codec_embed=True)
    tc = TrainConfig(
        output_dir=str(tmp_path / "pp"),
        max_steps=5,
        warmup_steps=1,
        max_seq_len=48,
        pp_microbatches=4,
        remat=False,
    )
    tr = Trainer(params, cfg, tc, mesh=mesh)
    batch, labels = rand_batch(cfg)

    # same init/batch on a pp=1 mesh gives the same first-step loss
    ref = Trainer(
        init_lm_params(jax.random.PRNGKey(0), cfg, with_codec_embed=True),
        cfg,
        TrainConfig(
            output_dir=str(tmp_path / "ref"),
            max_steps=5,
            warmup_steps=1,
            max_seq_len=48,
            remat=False,
        ),
        mesh=make_mesh(dp=2, fsdp=2, tp=2),
    )
    m_pp = tr.train_batch(batch, labels)
    m_ref = ref.train_batch(batch, labels)
    np.testing.assert_allclose(m_pp["loss"], m_ref["loss"], rtol=1e-5)
    np.testing.assert_allclose(m_pp["grad_norm"], m_ref["grad_norm"], rtol=1e-4)

    # another step moves params (warmup lr was 0 on step 1)
    before = np.asarray(jax.device_get(tr.params["layers"]["wq"]))
    m2 = tr.train_batch(batch, labels)
    assert np.isfinite(m2["loss"])
    assert not np.array_equal(before, np.asarray(jax.device_get(tr.params["layers"]["wq"])))

    # checkpoint round-trip on the pp-sharded layout
    from realtime_codec_agent_tpu.train import checkpoint as ckpt

    ckpt.save(tc.output_dir, tr)
    tr2 = Trainer(
        init_lm_params(jax.random.PRNGKey(7), cfg, with_codec_embed=True),
        cfg,
        tc,
        mesh=mesh,
    )
    assert ckpt.restore_latest(tc.output_dir, tr2)
    assert tr2.step == tr.step
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tr.params["layers"]["wq"])),
        np.asarray(jax.device_get(tr2.params["layers"]["wq"])),
    )
    m3 = tr2.train_batch(batch, labels)
    assert np.isfinite(m3["loss"])
