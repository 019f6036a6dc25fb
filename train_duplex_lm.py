"""Runnable training driver: dataset .txt -> tokenize -> SPMD train -> eval ->
checkpoints -> deployable params.

Capability rebuild of the reference training program train_vanilla_latest.py
(main:315-755): line-per-example causal LM training with the dual-route
CodecLlama when a codec embedding file is supplied (:91-99, :499-595), a
modulo streaming eval split (:276-312), token-accuracy/perplexity eval
(:652-736), and checkpoint auto-resume (:357-370). TPU-first differences: the
trainer is a jitted SPMD step over a (dp, fsdp, tp) mesh instead of HF
Trainer/accelerate, and the deployment artifact is the orbax param pytree
itself (plus a persisted-vanilla variant replacing the
persist->GGUF->quantize chain, prep_test_model.sh:19-34).

Usage (tiny smoke):
    python train_duplex_lm.py --dataset output/lm_dataset.txt \
        --output_dir output/run1 --tiny --max_steps 20
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the duplex codec LM on TPU")
    p.add_argument("--dataset", required=True, help="prep_lm_dataset .txt output")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--tokenizer_dir", default=None,
                   help="dir with codec_tokenizer.json (default: byte-fallback tokenizer)")
    p.add_argument("--codec_embed_file", default=None,
                   help=".npy/.pt codec embedding table -> enables the dual-route "
                        "CodecLlama with a frozen codec table + trainable projector")
    p.add_argument("--init_from", default=None,
                   help="HF Llama checkpoint dir or orbax params to initialize from")
    p.add_argument("--tiny", action="store_true", help="tiny model (tests/smoke)")
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8, help="global batch size")
    p.add_argument("--max_seq_len", type=int, default=2048)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--optimizer", choices=["adamw", "adafactor"], default="adamw",
                   help="adafactor frees the ~5 GB of AdamW moments at 1B "
                        "scale -> bigger per-chip batch / longer sequences")
    p.add_argument("--remat_policy",
                   choices=["full", "dots", "attn", "flash", "none"],
                   default="flash",
                   help="selective rematerialization: 'flash' saves the "
                        "Pallas flash kernel's own residuals (out + l/m) so "
                        "the backward never re-runs the flash forward; "
                        "'none' disables remat entirely (OOMs at 1B scale)")
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--eval_split_every_n", type=int, default=20,
                   help="every n-th dataset line is eval (0 = no eval split)")
    p.add_argument("--shuffle_buffer", type=int, default=1024)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--mesh", default=None,
                   help="dp,fsdp,tp[,pp] (default: auto factorization of visible "
                        "devices; a 4th factor stages layers over a pipeline axis)")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="GPipe microbatch count on pp>1 meshes (default 2*pp)")
    p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16",
                   help="matmul/activation dtype (float32 for CPU debugging; "
                        "the TPU path is bfloat16)")
    p.add_argument("--persist_embeddings", action="store_true",
                   help="also save a persisted-vanilla params file (codec projections "
                        "baked into embed_tokens; reference persist_codec_embeddings.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from realtime_codec_agent_tpu.models.llama import (
        init_lm_params,
        llama32_1b_config,
        set_codec_embeddings,
        tiny_lm_config,
    )
    from realtime_codec_agent_tpu.parallel import default_mesh_shape, make_mesh
    from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer
    from realtime_codec_agent_tpu.train import TrainConfig, Trainer
    from realtime_codec_agent_tpu.train import checkpoint as ckpt
    from realtime_codec_agent_tpu.train.dataset import (
        batches_from_lines,
        iter_lines,
        repeat_batches,
        split_streaming,
    )
    from realtime_codec_agent_tpu.train.embedding_bridge import (
        load_codec_embeddings,
        persist_and_verify,
    )

    os.makedirs(args.output_dir, exist_ok=True)

    # ---- codec embedding table (:499-511) ----
    codec_embed = None
    if args.codec_embed_file:
        codec_embed = load_codec_embeddings(args.codec_embed_file)

    # ---- tokenizer (reference train_vanilla_latest.py:524-561) ----
    if args.tokenizer_dir:
        tokenizer = CodecTextTokenizer.load(args.tokenizer_dir)
    elif codec_embed is not None:
        # codec vocab sized by the embedding table (codebooks x codebook_size)
        tokenizer = CodecTextTokenizer(
            num_codebooks=codec_embed.shape[0], codebook_size=codec_embed.shape[1]
        )
    else:
        tokenizer = CodecTextTokenizer()
    vocab = ((tokenizer.vocab_size + 7) // 8) * 8  # resize pad_to_multiple_of=8

    if codec_embed is not None and (
        codec_embed.shape[0] * codec_embed.shape[1] != tokenizer.num_codec_tokens
    ):
        raise ValueError(
            f"codec embed table covers {codec_embed.shape[0] * codec_embed.shape[1]} "
            f"codes but the tokenizer has {tokenizer.num_codec_tokens} codec tokens"
        )

    # ---- model config + init ----
    cfg_kwargs = dict(
        vocab_size=vocab,
        codec_vocab_start=tokenizer.codec_vocab_start if codec_embed is not None else 0,
    )
    if codec_embed is not None:
        cfg_kwargs.update(
            num_codebooks=codec_embed.shape[0],
            codebook_size=codec_embed.shape[1],
            codebook_dim=codec_embed.shape[2],
        )
    cfg_kwargs["compute_dtype"] = args.compute_dtype
    if args.tiny:
        cfg = tiny_lm_config(max_context=args.max_seq_len, **cfg_kwargs)
    else:
        cfg = llama32_1b_config(max_context=args.max_seq_len, **cfg_kwargs)

    if args.init_from and os.path.isdir(args.init_from) and os.path.exists(
        os.path.join(args.init_from, "config.json")
    ):
        # start from a pretrained HF Llama: convert, resize to our vocab
        # (reference :563-589 resize_token_embeddings)
        from realtime_codec_agent_tpu.models.convert import load_hf_llama, resize_embeddings

        params, hf_cfg = load_hf_llama(args.init_from, max_context=args.max_seq_len)
        params, hf_cfg = resize_embeddings(params, hf_cfg, vocab, seed=args.seed)
        import dataclasses

        cfg = dataclasses.replace(
            hf_cfg,
            compute_dtype=args.compute_dtype,
            codec_vocab_start=cfg.codec_vocab_start,
            num_codebooks=cfg.num_codebooks,
            codebook_size=cfg.codebook_size,
            codebook_dim=cfg.codebook_dim,
        )
        if codec_embed is not None:
            from realtime_codec_agent_tpu.models.llama import init_codec_embed_params

            params["codec_embed"] = init_codec_embed_params(
                jax.random.PRNGKey(args.seed), cfg
            )
    elif args.init_from:
        params = ckpt.load_params(args.init_from, cfg)
    else:
        params = init_lm_params(
            jax.random.PRNGKey(args.seed), cfg, with_codec_embed=codec_embed is not None
        )

    if codec_embed is not None:
        # install the frozen codec table (:591-595 -> codec_llama.py:166-176)
        params = set_codec_embeddings(
            params, codec_embed.reshape(-1, codec_embed.shape[-1]), cfg
        )

    # ---- mesh ----
    if args.mesh:
        factors = [int(x) for x in args.mesh.split(",")]
        dp, fsdp, tp = factors[:3]
        pp = factors[3] if len(factors) > 3 else 1
        mesh = make_mesh(dp=dp, fsdp=fsdp, tp=tp, pp=pp)
    else:
        mesh = make_mesh(**default_mesh_shape(len(jax.devices())))
    print(f"mesh: {mesh.shape} devices={len(jax.devices())}", file=sys.stderr)
    # the global batch shards over (dp, fsdp) and, on pp meshes, must also
    # split into whole GPipe microbatches: round up to a common multiple
    data_shards = mesh.shape["dp"] * mesh.shape["fsdp"]
    if mesh.shape.get("pp", 1) > 1:
        n_micro = args.pp_microbatches or 2 * mesh.shape["pp"]
        data_shards = data_shards * n_micro // __import__("math").gcd(data_shards, n_micro)
    if args.batch_size % data_shards:
        new_bs = -(-args.batch_size // data_shards) * data_shards
        print(
            f"batch_size {args.batch_size} -> {new_bs} "
            f"(multiple of dp*fsdp and pp microbatches = {data_shards})",
            file=sys.stderr,
        )
        args.batch_size = new_bs

    tc = TrainConfig(
        output_dir=args.output_dir,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps,
        max_steps=args.max_steps,
        max_seq_len=args.max_seq_len,
        grad_clip=args.grad_clip,
        optimizer=args.optimizer,
        eval_every=args.eval_every,
        save_every=args.save_every,
        log_every=args.log_every,
        seed=args.seed,
        pp_microbatches=args.pp_microbatches,
        remat=args.remat_policy != "none",
        remat_policy=args.remat_policy,
    )
    trainer = Trainer(params, cfg, tc, mesh=mesh)

    eval_n = args.eval_split_every_n
    train_iter = repeat_batches(
        args.dataset, tokenizer, args.batch_size, args.max_seq_len,
        shuffle_buffer=args.shuffle_buffer, seed=args.seed,
        eval_every_n=eval_n or None, is_eval=False,
    )

    def eval_batches():
        if not eval_n:
            return iter(())
        return batches_from_lines(
            split_streaming(iter_lines(args.dataset), eval_n, True),
            tokenizer, args.batch_size, args.max_seq_len,
        )

    metrics = trainer.train(
        train_iter,
        eval_batches_fn=eval_batches if eval_n else None,
        resume=not args.no_resume,
    )
    print(f"final: {metrics}")

    # ---- deployment artifacts ----
    tokenizer.save(args.output_dir)
    params_path = os.path.join(args.output_dir, "params.orbax")
    ckpt.save_params(params_path, trainer.params)
    print(f"saved params -> {params_path}")
    if args.persist_embeddings and codec_embed is not None:
        import jax.numpy as jnp

        host_params = jax.tree.map(jnp.asarray, jax.device_get(trainer.params))
        vanilla, max_err = persist_and_verify(host_params, cfg)
        vanilla_path = os.path.join(args.output_dir, "params-vanilla.orbax")
        ckpt.save_params(vanilla_path, vanilla)
        print(f"saved persisted-vanilla params -> {vanilla_path} (max_abs_err={max_err:.2e})")
    with open(os.path.join(args.output_dir, "train_config.json"), "w") as f:
        json.dump({"metrics": metrics, "vocab_size": cfg.vocab_size,
                   "codec_vocab_start": cfg.codec_vocab_start}, f, indent=2)
    return metrics


if __name__ == "__main__":
    main()
