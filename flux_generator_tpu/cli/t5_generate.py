"""Standalone T5 encoder-decoder generation CLI (parity:
musicgen/t5.py:431-523's __main__ generate loop)."""

from __future__ import annotations

import argparse


def generate_greedy(params, cfg, tokenizer, text: str, max_tokens: int = 128):
    import jax.numpy as jnp

    from ..models.t5.t5 import init_decode_cache, t5_decode, t5_encode

    src = jnp.array([tokenizer.tokenize(text, prepend_bos=False, append_eos=True,
                                        pad=False)])
    memory = t5_encode(params, cfg, src)
    cache = init_decode_cache(cfg, 1, max_tokens + 1, memory.dtype)
    tok = jnp.zeros((1, 1), jnp.int32)  # decoder_start_token_id = pad = 0
    out = []
    for _ in range(max_tokens):
        logits, cache = t5_decode(params, cfg, tok, memory, cache)
        nxt = int(logits[0, -1].argmax())
        if nxt == tokenizer.eos_token:
            break
        out.append(nxt)
        tok = jnp.array([[nxt]])
    return tokenizer.decode(out)


def main(argv=None):
    parser = argparse.ArgumentParser(description="T5 text generation")
    parser.add_argument("--model", default="t5-base")
    parser.add_argument("--prompt", required=True)
    parser.add_argument("--max-tokens", type=int, default=128)
    args = parser.parse_args(argv)

    import json

    import jax.numpy as jnp

    from ..io import sanitize
    from ..io.loaders import cast_tree, conform_params, hf_snapshot, load_safetensors
    from ..io.params import unflatten
    from ..models.t5.t5 import T5Config, init_t5
    from ..tokenizers.sentencepiece_unigram import SentencePieceUnigramTokenizer

    import jax

    path = hf_snapshot(args.model, ["*.json", "*.safetensors", "*.model"])
    with open(path / "config.json") as f:
        cfg = T5Config.from_dict(json.load(f))
    flat = sanitize.sanitize_t5(load_safetensors(path / "model.safetensors"))
    params = unflatten(flat, sanitize.T5_STACKS)
    params = conform_params(
        params, jax.eval_shape(lambda: init_t5(jax.random.PRNGKey(0), cfg)), "t5"
    )
    params = cast_tree(params, jnp.float32)
    tokenizer = SentencePieceUnigramTokenizer.from_file(path / "spiece.model")

    print(generate_greedy(params, cfg, tokenizer, args.prompt, args.max_tokens))


if __name__ == "__main__":
    main()
