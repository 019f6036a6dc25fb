"""SPMD trainer for the duplex codec LM.

Capability rebuild of the reference training driver (train_vanilla_latest.py,
a fork of HF run_clm.py) as a jitted pjit program: one compiled train step over
a (dp, fsdp, tp) mesh — optax AdamW with linear warmup+decay, pad->-100 label
collation (reference utils/training_utils.py:3-9), token-accuracy + perplexity
eval (train_vanilla_latest.py:652-736), orbax checkpoints with auto-resume
(:357-370, 694-700). The dual-route codec-embedding model trains by simply
using params that carry a ``codec_embed`` branch; the frozen codec table is
masked out of the optimizer update (reference codec_llama.py:55 freezes it).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.llama import (
    DuplexLMConfig,
    forward,
    logits_from_hidden,
    stack_layer_params,
    unstack_layer_params,
)
from ..parallel import mesh as mesh_lib


@dataclasses.dataclass
class TrainConfig:
    output_dir: str = "output/run"
    learning_rate: float = 5e-5
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    warmup_steps: int = 100
    max_steps: int = 1000
    per_device_batch_size: int = 1
    max_seq_len: int = 2048
    grad_clip: float = 1.0
    eval_every: int = 500
    save_every: int = 500
    log_every: int = 10
    seed: int = 42
    freeze_codec_table: bool = True
    # rematerialize layer activations on backward (jax.checkpoint):
    # ~30% extra forward FLOPs for O(layers) less activation memory
    remat: bool = True
    # remat policy: "full" (recompute everything), "dots" (save matmul
    # outputs; fewer recompute FLOPs, more activation memory), or "attn"
    # (save only attention contexts; skips the quadratic-in-T recompute)
    remat_policy: str = "full"
    # blockwise CE loss: never materialize the (T, 259k-vocab) logits;
    # None keeps the single-shot loss
    loss_block_size: Optional[int] = 512
    # "adamw" (reference-parity default, HF Trainer's optimizer) or
    # "adafactor": factored second moment + no first moment frees the ~5 GB
    # of param-dtype AdamW moments at 1B scale — on one 16 GB chip that HBM
    # buys a bigger batch or longer sequences (weights are re-read once per
    # step regardless of B, so tokens/s scales with B until compute-bound;
    # measured 1B matrix in docs/PERFORMANCE.md)
    optimizer: str = "adamw"
    # GPipe microbatch count when the mesh has a pp axis > 1 (the global
    # batch must divide it); None defaults to 2*pp (bubble fraction
    # (pp-1)/(M+pp-1) ≈ 1/3). Ignored on pp=1 meshes.
    pp_microbatches: Optional[int] = None


def pad_batch(
    sequences: List[List[int]], max_len: int, pad_id: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Right-pad/truncate to max_len; labels get -100 at pad positions
    (DataCollatorWithIgnoredPadding semantics, reference training_utils.py:3-9)."""
    batch = np.full((len(sequences), max_len), pad_id, dtype=np.int32)
    labels = np.full((len(sequences), max_len), -100, dtype=np.int32)
    for i, seq in enumerate(sequences):
        seq = seq[:max_len]
        batch[i, : len(seq)] = seq
        labels[i, : len(seq)] = seq
    return batch, labels


def _ce_sums(logits, labels):
    """(loss_sum, n_valid, n_correct) for one block of shifted logits/labels."""
    valid = labels != -100
    safe = jnp.maximum(labels, 0)
    lp = jax.nn.log_softmax(logits, axis=-1)
    token_lp = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    loss_sum = -(token_lp * valid).sum()
    correct = ((jnp.argmax(logits, axis=-1) == labels) & valid).sum()
    return loss_sum, valid.sum(), correct


def loss_and_metrics(
    params,
    batch,
    labels,
    cfg: DuplexLMConfig,
    loss_block: Optional[int] = None,
    forward_fn=forward,
):
    """Causal LM loss with shifted labels; -100 ignored.

    With ``loss_block`` set, the (T, vocab) logits are never materialized:
    the head matmul + softmax run over T blocks (each under jax.checkpoint),
    so forward and backward hold one (block, vocab) slab at a time. At the
    deployment vocabulary (259,584) the full f32 logits + their gradient
    cost >4 GB at T=2048 — blocking frees that HBM for bigger batches.
    Identical math, only the reduction is reassociated.

    ``forward_fn`` swaps the body for the pipeline-parallel staged forward
    (parallel/pipeline.make_pipeline_forward) on pp>1 meshes — same
    signature and hidden-state semantics as models/llama.forward."""
    hidden, _ = forward_fn(params, batch, cfg, attn_mask=(labels != -100))
    shift_labels = labels[:, 1:]
    t = hidden.shape[1] - 1
    if not loss_block or t <= loss_block:
        # full-T head matmul, then slice: T stays MXU-aligned (T-1 is odd)
        logits = logits_from_hidden(params, hidden, cfg)  # (B, T, V) f32
        loss_sum, n_valid, correct = _ce_sums(logits[:, :-1], shift_labels)
    else:
        shift_hidden = hidden[:, :-1]
        b, _, d = shift_hidden.shape
        nb = -(-t // loss_block)
        pad = nb * loss_block - t
        sh = jnp.pad(shift_hidden, ((0, 0), (0, pad), (0, 0)))
        sl = jnp.pad(shift_labels, ((0, 0), (0, pad)), constant_values=-100)
        sh = sh.reshape(b, nb, loss_block, d)
        sl = sl.reshape(b, nb, loss_block)

        # blocks are independent — an unrolled tree reduction (not a scan)
        # leaves XLA free to overlap/schedule them
        @jax.checkpoint
        def block(h, lb):
            logits = logits_from_hidden(params, h, cfg)  # (B, blk, V) f32
            return _ce_sums(logits, lb)

        parts = [block(sh[:, i], sl[:, i]) for i in range(nb)]
        loss_sum = sum(p[0] for p in parts)
        n_valid = sum(p[1] for p in parts)
        correct = sum(p[2] for p in parts)
    n_valid = jnp.maximum(n_valid, 1)
    loss = loss_sum / n_valid
    accuracy = correct / n_valid
    return loss, {"accuracy": accuracy, "n_tokens": n_valid}


class Trainer:
    def __init__(
        self,
        params,
        lm_config: DuplexLMConfig,
        train_config: TrainConfig,
        mesh=None,
    ):
        self.cfg = dataclasses.replace(
            lm_config,
            remat=train_config.remat,
            remat_policy=train_config.remat_policy,
        )
        self.tc = train_config
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.step = 0

        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, self.tc.learning_rate, self.tc.warmup_steps),
                optax.linear_schedule(
                    self.tc.learning_rate,
                    0.0,
                    max(1, self.tc.max_steps - self.tc.warmup_steps),
                ),
            ],
            [self.tc.warmup_steps],
        )
        if self.tc.optimizer == "adafactor":
            opt = optax.adafactor(
                schedule,
                # adafactor's own update clipping stays on; global-norm clip
                # below matches the adamw chain's behavior
                weight_decay_rate=self.tc.weight_decay or None,
            )
        elif self.tc.optimizer == "adamw":
            opt = optax.adamw(
                schedule,
                b1=self.tc.adam_b1,
                b2=self.tc.adam_b2,
                weight_decay=self.tc.weight_decay,
            )
        else:
            raise ValueError(f"unknown optimizer {self.tc.optimizer!r}")
        tx = optax.chain(optax.clip_by_global_norm(self.tc.grad_clip), opt)
        if self.tc.freeze_codec_table and "codec_embed" in params:
            # frozen codec table: zero its updates (reference codec_llama.py:55)
            def label_fn(p):
                labels = jax.tree.map(lambda _: "train", p)
                labels["codec_embed"] = dict(labels["codec_embed"])
                labels["codec_embed"]["table"] = "freeze"
                return labels

            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, label_fn
            )
        self.tx = tx

        # stacked scan-over-layers layout: one compiled layer body, O(10)
        # param leaves instead of O(10*L) — dispatch- and compile-time win
        # (models/llama.stack_layer_params); checkpoints store this layout
        # and export_params()/load_params unstack for inference
        params = stack_layer_params(params)
        # pipeline parallelism: pp>1 meshes stage the stacked layer axis and
        # swap the forward for the GPipe rotation (parallel/pipeline.py)
        self.pp = int(self.mesh.shape.get("pp", 1))
        if self.pp > 1:
            from ..parallel.pipeline import make_pipeline_forward

            n_micro = self.tc.pp_microbatches or 2 * self.pp
            self._forward_fn = make_pipeline_forward(self.mesh, n_micro)
        else:
            self._forward_fn = forward
        # shard params + opt state over the mesh. Opt-state shardings are
        # EXPLICIT: optimizer moments shard like their param, everything else
        # (step counts, factored row/col stats) is replicated. Without this
        # the init outputs are uncommitted single-device arrays — training
        # still works (jit re-shards them on first step) but orbax restore
        # then pins the restored opt state to ONE device while params stay
        # mesh-sharded, and the first post-resume train step dies with
        # "incompatible devices". Explicit shardings make init and restore
        # land on the same layout.
        self.param_specs = mesh_lib.lm_param_specs(params, pp=self.pp > 1)
        self.params = mesh_lib.shard_params(params, self.mesh, pp=self.pp > 1)
        self.opt_shardings = self._opt_state_shardings()
        self.opt_state = jax.jit(
            self.tx.init, out_shardings=self.opt_shardings
        )(self.params)

        self._batch_sharding = jax.sharding.NamedSharding(
            self.mesh, mesh_lib.batch_spec()
        )
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(
            functools.partial(
                loss_and_metrics, cfg=self.cfg,
                loss_block=self.tc.loss_block_size,
                forward_fn=self._forward_fn,
            )
        )

    def _opt_state_shardings(self):
        """NamedShardings for the optimizer state pytree.

        Optimizer-state subtrees that mirror the params pytree (AdamW mu/nu,
        adafactor's non-factored v) keep their param's partition spec —
        matched by path suffix + shape. Everything else (scalar step counts,
        adafactor's factored row/col statistics) is replicated; those are
        O(sum-of-dims) small.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        def key_token(k):
            for attr in ("key", "idx", "name"):
                if hasattr(k, attr):
                    return getattr(k, attr)
            return str(k)

        param_by_path = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(self.params)[0]:
            keys = tuple(key_token(k) for k in path)
            param_by_path[keys] = (leaf.shape, leaf.sharding)

        replicated = NamedSharding(self.mesh, P())
        abstract = jax.eval_shape(self.tx.init, self.params)

        def pick(path, leaf):
            keys = tuple(key_token(k) for k in path)
            for i in range(len(keys)):
                hit = param_by_path.get(keys[i:])
                if hit is not None and hit[0] == leaf.shape:
                    return hit[1]
            return replicated

        return jax.tree_util.tree_map_with_path(pick, abstract)

    def _build_train_step(self):
        cfg = self.cfg

        loss_block = self.tc.loss_block_size
        forward_fn = self._forward_fn
        # pin each gradient leaf to its param's sharding: without this GSPMD
        # propagation around the optimizer's elementwise ops occasionally
        # picks a batch-style layout for a stacked-layer grad and then pays an
        # "[SPMD] Involuntary full rematerialization" (replicate-then-
        # repartition) per step to undo it
        grad_shardings = mesh_lib.named_shardings(self.mesh, self.param_specs)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, labels):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: loss_and_metrics(
                    p, batch, labels, cfg, loss_block=loss_block,
                    forward_fn=forward_fn,
                ),
                has_aux=True,
            )(params)
            grads = jax.lax.with_sharding_constraint(grads, grad_shardings)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
            return params, opt_state, metrics

        return train_step

    def export_params(self):
        """Params in the inference layout (unrolled per-layer list)."""
        return unstack_layer_params(self.params)

    # -- steps ----------------------------------------------------------------
    def train_batch_async(self, batch: np.ndarray, labels: np.ndarray) -> Dict:
        """Dispatch one train step and return DEVICE metric handles without
        waiting. On dispatch-oriented backends (the axon tunnel) fetching an
        execution output costs a large fixed completion-wait fee, so per-step
        synchronous metric reads serialize training ~5x slower than the
        device step itself — the train loop fetches metrics only at log
        points (the steps in between just chain on device)."""
        batch = jax.device_put(batch, self._batch_sharding)
        labels = jax.device_put(labels, self._batch_sharding)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, batch, labels
        )
        self.step += 1
        return metrics

    def train_batch(self, batch: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
        """Synchronous step: dispatch + fetch the metrics (tests, small runs)."""
        return {k: float(v) for k, v in self.train_batch_async(batch, labels).items()}

    def eval_batches(self, batches) -> Dict[str, float]:
        total_loss = total_acc = total_n = 0.0
        for batch, labels in batches:
            batch = jax.device_put(batch, self._batch_sharding)
            labels = jax.device_put(labels, self._batch_sharding)
            loss, metrics = self._eval_step(self.params, batch, labels)
            n = float(metrics["n_tokens"])
            total_loss += float(loss) * n
            total_acc += float(metrics["accuracy"]) * n
            total_n += n
        if total_n == 0:
            return {}
        eval_loss = total_loss / total_n
        return {
            "eval_loss": eval_loss,
            "eval_accuracy": total_acc / total_n,
            "perplexity": float(np.exp(min(eval_loss, 50.0))),
        }

    # -- training loop --------------------------------------------------------
    def train(
        self,
        train_iter: Iterator[Tuple[np.ndarray, np.ndarray]],
        eval_batches_fn=None,
        resume: bool = True,
        log_fn=print,
    ) -> Dict[str, float]:
        from . import checkpoint as ckpt

        if resume:
            restored = ckpt.restore_latest(self.tc.output_dir, self)
            if restored:
                log_fn(f"Resumed from checkpoint at step {self.step}")

        last_metrics: Dict[str, float] = {}
        metrics_dev = None
        t0 = time.time()
        while self.step < self.tc.max_steps:
            try:
                batch, labels = next(train_iter)
            except StopIteration:
                break
            # dispatch-first: steps chain on device; metrics only sync at
            # log/eval/save points (per-step fetches serialize ~5x slower
            # on the device tunnel)
            metrics_dev = self.train_batch_async(batch, labels)
            if self.step % self.tc.log_every == 0:
                last_metrics = {k: float(v) for k, v in metrics_dev.items()}
                rate = self.step / max(time.time() - t0, 1e-9)
                log_fn(
                    f"step {self.step}: loss={last_metrics['loss']:.4f} "
                    f"acc={last_metrics['accuracy']:.4f} ({rate:.2f} it/s)"
                )
            if eval_batches_fn and self.step % self.tc.eval_every == 0:
                log_fn(f"eval @ {self.step}: {self.eval_batches(eval_batches_fn())}")
            if self.step % self.tc.save_every == 0:
                ckpt.save(self.tc.output_dir, self)
        if metrics_dev is not None:
            # final-step metrics (the loop may end between log points)
            last_metrics = {k: float(v) for k, v in metrics_dev.items()}
        ckpt.save(self.tc.output_dir, self)
        if eval_batches_fn:
            last_metrics.update(self.eval_batches(eval_batches_fn()))
        return last_metrics
