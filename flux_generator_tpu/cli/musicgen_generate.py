"""MusicGen CLI (flag parity: musicgen/generate.py)."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="facebook/musicgen-medium")
    parser.add_argument("--text", default="happy rock")
    parser.add_argument("--output-path", default="0.wav")
    parser.add_argument("--max-steps", type=int, default=500)
    parser.add_argument("--top-k", type=int, default=250)
    parser.add_argument("--temp", type=float, default=1.0)
    parser.add_argument("--guidance", type=float, default=3.0)
    parser.add_argument("--seed", type=int)
    args = parser.parse_args(argv)

    from ..pipelines.musicgen import MusicGenPipeline
    from ..utils.audio import save_audio

    pipe = MusicGenPipeline.from_pretrained(args.model)
    audio = pipe.generate(
        args.text, max_steps=args.max_steps, top_k=args.top_k, temp=args.temp,
        guidance_coef=args.guidance, seed=args.seed,
    )
    save_audio(args.output_path, audio, pipe.sampling_rate)
    print(f"Saved audio to {args.output_path}")


if __name__ == "__main__":
    main()
