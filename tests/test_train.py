"""Trainer tests on the 8-device virtual CPU mesh: SPMD train step, collation,
checkpoint auto-resume, embedding bridge, dataset streaming."""
import os

import jax
import numpy as np
import pytest

from realtime_codec_agent_tpu.models.llama import init_lm_params, tiny_lm_config
from realtime_codec_agent_tpu.parallel import default_mesh_shape, make_mesh
from realtime_codec_agent_tpu.train import TrainConfig, Trainer, pad_batch
from realtime_codec_agent_tpu.train.dataset import (
    batches_from_lines,
    iter_lines,
    split_streaming,
)

VOCAB = 304  # multiple of 8 (tp=2 x fsdp sharding needs even splits)


@pytest.fixture(scope="module")
def mesh():
    shape = default_mesh_shape(8)
    assert shape == dict(dp=2, fsdp=2, tp=2)
    return make_mesh(**shape)


@pytest.fixture(scope="module")
def cfg():
    return tiny_lm_config(vocab_size=VOCAB, codec_vocab_start=200, codebook_size=104)


def make_trainer(cfg, mesh, tmpdir, with_codec=True, **tc_kwargs):
    params = init_lm_params(jax.random.PRNGKey(0), cfg, with_codec_embed=with_codec)
    tc_kwargs.setdefault("max_steps", 5)
    tc_kwargs.setdefault("warmup_steps", 1)
    tc_kwargs.setdefault("log_every", 100)
    tc = TrainConfig(output_dir=str(tmpdir), max_seq_len=64, **tc_kwargs)
    return Trainer(params, cfg, tc, mesh=mesh)


def rand_batch(cfg, bs=8, seq=64, seed=0):
    rng = np.random.default_rng(seed)
    seqs = [list(rng.integers(1, cfg.vocab_size, size=seq - 4)) for _ in range(bs)]
    return pad_batch(seqs, seq, pad_id=0)


def test_pad_batch_labels():
    batch, labels = pad_batch([[1, 2, 3], [4, 5]], 5, pad_id=9)
    np.testing.assert_array_equal(batch[0], [1, 2, 3, 9, 9])
    np.testing.assert_array_equal(labels[0], [1, 2, 3, -100, -100])
    np.testing.assert_array_equal(labels[1], [4, 5, -100, -100, -100])


def test_train_step_runs_and_updates(cfg, mesh, tmp_path):
    tr = make_trainer(cfg, mesh, tmp_path)
    batch, labels = rand_batch(cfg)
    before = np.asarray(jax.device_get(tr.params["layers"]["wq"][0]))
    frozen_before = np.asarray(jax.device_get(tr.params["codec_embed"]["table"]))
    m1 = tr.train_batch(batch, labels)
    assert np.isfinite(m1["loss"]) and 0.0 <= m1["accuracy"] <= 1.0
    # first step's lr is 0 (linear warmup); the second step must move params
    tr.train_batch(batch, labels)
    after = np.asarray(jax.device_get(tr.params["layers"]["wq"][0]))
    assert not np.array_equal(before, after)
    # frozen codec table untouched
    frozen_after = np.asarray(jax.device_get(tr.params["codec_embed"]["table"]))
    np.testing.assert_array_equal(frozen_before, frozen_after)


def test_loss_decreases_on_repeated_batch(cfg, mesh, tmp_path):
    tr = make_trainer(cfg, mesh, tmp_path, max_steps=30, learning_rate=1e-2)
    batch, labels = rand_batch(cfg, bs=8, seq=32)
    losses = [tr.train_batch(batch, labels)["loss"] for _ in range(12)]
    assert losses[-1] < losses[0]


def test_eval_metrics(cfg, mesh, tmp_path):
    tr = make_trainer(cfg, mesh, tmp_path)
    batches = [rand_batch(cfg, seed=i) for i in range(2)]
    metrics = tr.eval_batches(iter(batches))
    assert set(metrics) == {"eval_loss", "eval_accuracy", "perplexity"}
    assert metrics["perplexity"] == pytest.approx(np.exp(metrics["eval_loss"]), rel=1e-4)


def test_checkpoint_save_resume(cfg, mesh, tmp_path):
    from realtime_codec_agent_tpu.train import checkpoint as ckpt

    tr = make_trainer(cfg, mesh, tmp_path)
    batch, labels = rand_batch(cfg)
    tr.train_batch(batch, labels)
    tr.train_batch(batch, labels)
    ckpt.save(str(tmp_path), tr)
    saved_wq = np.asarray(jax.device_get(tr.params["layers"]["wq"][0]))

    tr2 = make_trainer(cfg, mesh, tmp_path)
    assert ckpt.restore_latest(str(tmp_path), tr2)
    assert tr2.step == 2
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tr2.params["layers"]["wq"][0])), saved_wq
    )
    # the restored state must be TRAINABLE: restored opt state has to land on
    # the same mesh sharding as params (a restore pinned to one device kills
    # the first post-resume step with "incompatible devices")
    m = tr2.train_batch(batch, labels)
    assert np.isfinite(m["loss"])


def test_save_load_bare_params(cfg, mesh, tmp_path):
    from realtime_codec_agent_tpu.train import checkpoint as ckpt

    params = init_lm_params(jax.random.PRNGKey(1), cfg)
    path = ckpt.save_params(str(tmp_path / "deploy"), params)
    loaded = ckpt.load_params(path)
    np.testing.assert_array_equal(
        np.asarray(loaded["final_norm"]), np.asarray(params["final_norm"])
    )


def test_embedding_bridge_persist_and_verify(cfg):
    from realtime_codec_agent_tpu.models.llama import set_codec_embeddings
    from realtime_codec_agent_tpu.train.embedding_bridge import persist_and_verify

    params = init_lm_params(jax.random.PRNGKey(2), cfg, with_codec_embed=True)
    table = np.random.default_rng(0).normal(size=(104, cfg.codebook_dim)).astype(np.float32)
    params = set_codec_embeddings(params, table, cfg)
    vanilla, max_err = persist_and_verify(params, cfg, batch_size=64)
    assert "codec_embed" not in vanilla
    assert max_err < 1e-2


def test_dataset_streaming(tmp_path):
    from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer

    path = os.path.join(str(tmp_path), "data.txt")
    with open(path, "w") as f:
        for i in range(20):
            f.write(f"line number {i}\n")
    tok = CodecTextTokenizer(codebook_size=16)
    lines = list(iter_lines(path))
    assert len(lines) == 20
    evals = list(split_streaming(iter(lines), eval_every_n=5, is_eval=True))
    trains = list(split_streaming(iter(lines), eval_every_n=5, is_eval=False))
    assert len(evals) == 4 and len(trains) == 16

    batches = list(batches_from_lines(iter(lines), tok, batch_size=6, max_seq_len=16))
    assert len(batches) == 4
    batch, labels = batches[0]
    assert batch.shape == (6, 16) and labels.shape == (6, 16)


def test_tensor_parallel_inference_matches_single_device():
    """TP-sharded decode (Megatron column/row splits + kv-head-sharded cache)
    must produce the same greedy tokens as the unsharded engine — XLA infers
    the collectives from the shardings, no decode-code changes."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import init_lm_params, tiny_lm_config
    from realtime_codec_agent_tpu.parallel import make_mesh, shard_lm_for_inference

    cfg = tiny_lm_config(vocab_size=128, compute_dtype="float32", max_context=128)
    params = init_lm_params(jax.random.PRNGKey(7), cfg)

    ref = DuplexLMEngine(params, cfg, seed=3)
    ref.init_sampler_for_generate(temp=0.0, seed=3)
    ref.eval(list(range(2, 22)))
    ref_toks = [ref.eval_and_sample([int(t)]) for t in (22, 23, 24)]

    mesh = make_mesh(dp=1, fsdp=1, tp=2)
    tp = DuplexLMEngine(params, cfg, seed=3)
    tp.init_sampler_for_generate(temp=0.0, seed=3)
    tp.params, tp._k, tp._v = shard_lm_for_inference(params, tp._k, tp._v, mesh)
    tp.eval(list(range(2, 22)))
    tp_toks = [tp.eval_and_sample([int(t)]) for t in (22, 23, 24)]

    assert tp_toks == ref_toks
    # the cache stayed sharded over kv heads through the donated updates
    spec = tp._k.sharding.spec
    assert spec[3] == "tp"
    # teacher-forced scoring also runs sharded
    lp = tp.get_logprobs(list(range(2, 22)), [5, 6])
    np.testing.assert_allclose(lp, ref.get_logprobs(list(range(2, 22)), [5, 6]), atol=1e-5)


def test_tensor_parallel_inference_with_int8():
    """int8-quantized params ({'q','s'} leaves) must shard for TP inference
    (the spec tree mirrors the quantized structure)."""
    import jax
    import numpy as np

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import (
        init_lm_params, quantize_params_int8, tiny_lm_config,
    )
    from realtime_codec_agent_tpu.parallel import make_mesh, shard_lm_for_inference

    cfg = tiny_lm_config(vocab_size=128, compute_dtype="float32", max_context=128)
    params = init_lm_params(jax.random.PRNGKey(7), cfg)
    qparams = jax.jit(quantize_params_int8)(params)

    ref = DuplexLMEngine(qparams, cfg, seed=3)
    ref.init_sampler_for_generate(temp=0.0, seed=3)
    ref.eval(list(range(2, 22)))
    ref_toks = [ref.eval_and_sample([int(t)]) for t in (22, 23)]

    mesh = make_mesh(dp=1, fsdp=1, tp=2)
    tp = DuplexLMEngine(qparams, cfg, seed=3)
    tp.init_sampler_for_generate(temp=0.0, seed=3)
    tp.params, tp._k, tp._v = shard_lm_for_inference(qparams, tp._k, tp._v, mesh)
    tp.eval(list(range(2, 22)))
    assert [tp.eval_and_sample([int(t)]) for t in (22, 23)] == ref_toks


def test_remat_matches_no_remat():
    """jax.checkpoint rematerialization must not change loss or gradients."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_codec_agent_tpu.models.llama import init_lm_params, tiny_lm_config
    from realtime_codec_agent_tpu.train.trainer import loss_and_metrics

    cfg = tiny_lm_config(vocab_size=96, compute_dtype="float32", max_context=64)
    params = init_lm_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(1, 96, size=(2, 32)))
    labels = jnp.asarray(batch)

    def loss_of(c):
        return jax.value_and_grad(
            lambda p: loss_and_metrics(p, batch, labels, c)[0]
        )(params)

    loss_a, grads_a = loss_of(cfg)
    loss_b, grads_b = loss_of(dataclasses.replace(cfg, remat=True))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    for ga, gb in zip(jax.tree.leaves(grads_a), jax.tree.leaves(grads_b)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-6)


def test_stacked_layers_match_unrolled():
    """stack_layer_params + the scan-over-layers forward must be numerically
    identical to the unrolled list-of-dicts forward."""
    import jax
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.models.llama import (
        forward, init_lm_params, logits_from_hidden, stack_layer_params,
        tiny_lm_config, unstack_layer_params,
    )

    cfg = tiny_lm_config(vocab_size=512, compute_dtype="float32")
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    stacked = stack_layer_params(params)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, size=(2, 16)))
    h_list, _ = forward(params, ids, cfg)
    h_scan, _ = forward(stacked, ids, cfg)
    np.testing.assert_allclose(np.asarray(h_scan), np.asarray(h_list), rtol=2e-5, atol=2e-5)
    lo = logits_from_hidden(params, h_list, cfg)
    ls = logits_from_hidden(stacked, h_scan, cfg)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lo), rtol=2e-4, atol=2e-4)
    # round trip restores the original structure and values
    back = unstack_layer_params(stacked)
    for a, b in zip(
        jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blockwise_loss_matches_full():
    """loss_block must not change loss, accuracy, or gradients (the blockwise
    path only reassociates the CE reduction), including with -100 padding and
    a remat policy in play."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.train.trainer import loss_and_metrics

    cfg = tiny_lm_config(vocab_size=96, compute_dtype="float32", max_context=64)
    params = init_lm_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(1, 96, size=(2, 37)))
    labels = np.asarray(batch).copy()
    labels[0, 30:] = -100  # ragged valid lengths
    labels = jnp.asarray(labels)

    def run(loss_block, c):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_and_metrics(p, batch, labels, c, loss_block=loss_block),
            has_aux=True,
        )(params)
        return loss, metrics, grads

    loss_a, met_a, grads_a = run(None, cfg)
    # block size that does NOT divide T-1=36: exercises the -100 pad tail
    loss_b, met_b, grads_b = run(16, cfg)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_allclose(float(met_a["accuracy"]), float(met_b["accuracy"]), rtol=1e-6)
    assert int(met_a["n_tokens"]) == int(met_b["n_tokens"])
    for ga, gb in zip(jax.tree.leaves(grads_a), jax.tree.leaves(grads_b)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-6)

    # composes with remat + the "dots" and "attn" (save-attention-context)
    # selective policies — policies change memory/recompute, never numerics
    for policy in ("dots", "attn"):
        cfg_d = dataclasses.replace(cfg, remat=True, remat_policy=policy)
        loss_c, _, grads_c = run(16, cfg_d)
        np.testing.assert_allclose(float(loss_a), float(loss_c), rtol=1e-6)
        for ga, gc in zip(jax.tree.leaves(grads_a), jax.tree.leaves(grads_c)):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gc), rtol=1e-5, atol=1e-6)


def test_adafactor_trains_and_resumes(cfg, mesh, tmp_path):
    """optimizer="adafactor" (factored second moment — the 1B one-chip
    memory saver): loss decreases, the frozen codec table stays frozen, and
    its differently-shaped opt state round-trips through orbax."""
    from realtime_codec_agent_tpu.train import checkpoint as ckpt

    tr = make_trainer(
        cfg, mesh, tmp_path, max_steps=30, learning_rate=1e-2,
        optimizer="adafactor",
    )
    frozen_before = np.asarray(jax.device_get(tr.params["codec_embed"]["table"]))
    batch, labels = rand_batch(cfg, bs=8, seq=32)
    losses = [tr.train_batch(batch, labels)["loss"] for _ in range(12)]
    assert losses[-1] < losses[0]
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tr.params["codec_embed"]["table"])),
        frozen_before,
    )

    ckpt.save(str(tmp_path), tr)
    saved_wq = np.asarray(jax.device_get(tr.params["layers"]["wq"][0]))
    tr2 = make_trainer(
        cfg, mesh, tmp_path, max_steps=30, learning_rate=1e-2,
        optimizer="adafactor",
    )
    assert ckpt.restore_latest(str(tmp_path), tr2)
    assert tr2.step == 12
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tr2.params["layers"]["wq"][0])), saved_wq
    )
    # resumed training keeps improving
    more = [tr2.train_batch(batch, labels)["loss"] for _ in range(3)]
    assert more[-1] < losses[0]


def test_unknown_optimizer_rejected(cfg, mesh, tmp_path):
    with pytest.raises(ValueError, match="unknown optimizer"):
        make_trainer(cfg, mesh, tmp_path, optimizer="sgd")
