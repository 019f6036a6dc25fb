"""CLI: dump the codec's projected codebook for the LM embedding bridge
(reference extract_codec_embeddings.py:15-22 -> codec_embed_<model>.pt; here a
float32 .npy of shape (num_codebooks, V, dim))."""
import argparse

from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config
from realtime_codec_agent_tpu.train.embedding_bridge import extract_codec_embeddings


def main():
    parser = argparse.ArgumentParser(description="Extract codec embeddings")
    parser.add_argument("--codec_checkpoint", default=None)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--save_path", default="output/codec_embed.npy")
    args = parser.parse_args()

    if args.codec_checkpoint:
        codec = JaxCodecModel.load(args.codec_checkpoint)
    else:
        codec = JaxCodecModel.random_init(tiny_codec_config() if args.tiny else None)
    at = AudioTokenizer(codec_model=codec)
    emb = extract_codec_embeddings(at, args.save_path)
    print(f"wrote {args.save_path}: shape {emb.shape}")


if __name__ == "__main__":
    main()
