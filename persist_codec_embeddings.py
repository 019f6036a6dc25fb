"""CLI: bake trained codec projections into the embedding matrix and save the
vanilla deployment params, verifying the persisted embeddings match
(reference persist_codec_embeddings.py:35-85; on TPU the output is an orbax
param dir the decode engine loads directly — no GGUF step)."""
import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser(description="Persist codec embeddings -> vanilla LM")
    parser.add_argument("--checkpoint", required=True,
                        help="orbax params dir from train_duplex_lm.py (params.orbax)")
    parser.add_argument("--train_config", default=None,
                        help="train_config.json next to the checkpoint (default: auto)")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--output", default=None,
                        help="output params dir (default: <checkpoint>-vanilla)")
    args = parser.parse_args()

    import jax.numpy as jnp
    import jax

    from realtime_codec_agent_tpu.models.llama import llama32_1b_config, tiny_lm_config
    from realtime_codec_agent_tpu.train import checkpoint as ckpt
    from realtime_codec_agent_tpu.train.embedding_bridge import persist_and_verify

    tc_path = args.train_config or os.path.join(
        os.path.dirname(args.checkpoint.rstrip("/")), "train_config.json"
    )
    with open(tc_path) as f:
        tc = json.load(f)
    make_cfg = tiny_lm_config if args.tiny else llama32_1b_config
    cfg = make_cfg(
        vocab_size=tc["vocab_size"], codec_vocab_start=tc["codec_vocab_start"]
    )
    params = ckpt.load_params(args.checkpoint, cfg)
    params = jax.tree.map(jnp.asarray, params)
    if "codec_embed" not in params:
        raise SystemExit("checkpoint has no codec_embed branch (already vanilla?)")
    vanilla, max_err = persist_and_verify(params, cfg)
    out = args.output or args.checkpoint.rstrip("/") + "-vanilla"
    ckpt.save_params(out, vanilla)
    print(f"persisted -> {out} (verified, max_abs_err={max_err:.2e})")


if __name__ == "__main__":
    main()
