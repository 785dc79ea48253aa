#!/usr/bin/env python
"""Generate on-disk tokenizer assets + golden token-id fixtures.

Produces (deterministically — commit the outputs):
  tests/assets/clip_tokenizer/{vocab.json,merges.txt}   real byte-level BPE
  tests/assets/spiece/{t5_like.model,byte_fallback.model}  real ModelProto wire
  tests/assets/tokenizer_goldens.json                   input → ids fixtures

The files are full-fidelity instances of the formats the reference loads
(HF vocab.json/merges.txt — flux/tokenizers.py:8-119; spiece.model —
flux/tokenizers.py:122-185). tests/test_tokenizer_assets.py re-reads them
from disk, checks the goldens, and cross-validates against independent
implementations (HF transformers CLIPTokenizer, HF tokenizers Rust Unigram).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from flux_generator_tpu.tokenizers.assets import (  # noqa: E402
    write_clip_assets,
    write_spiece_model,
)
from flux_generator_tpu.tokenizers.clip_bpe import CLIPTokenizer  # noqa: E402
from flux_generator_tpu.tokenizers.sentencepiece_unigram import (  # noqa: E402
    SPACE,
    SentencePieceUnigramTokenizer,
)

ASSETS = ROOT / "tests" / "assets"

# Corpus for BPE learning — prompt-like text with contractions, numbers,
# punctuation, and accents so the learned merges exercise every branch of
# the word-split regex.
CLIP_CORPUS = [
    "a photo of a cat sitting on the mat",
    "a photo of a dog and a cat in the park",
    "the quick brown fox jumps over the lazy dog",
    "it's a beautiful painting, isn't it? they're lovely",
    "a highly detailed photograph of the mountains at sunset",
    "an oil painting of the sea, the sky and the stars",
    "the cafe at the corner serves the best coffee in the city",
    "digital art of the city skyline at night with neon lights",
    "a watercolor portrait of the queen and the king",
    "the photo shows the cathedral and the cafe by the river",
    "studio photography, sharp focus, high resolution, 4k, 8k",
    "cinematic lighting with the golden hour glow over the hills",
] * 4  # repetition lifts pair counts over the merge threshold

# inputs for golden fixtures. CJK/emoji stay out of the HF comparison set
# (HF's no-ftfy fallback splits CJK chars; the reference implementation —
# flux/tokenizers.py — does not, and we match the reference).
CLIP_INPUTS = [
    "a photo of a cat",
    "Hello, World!",
    "it's won't they're I'll I'd I'm you've",
    "café naïve résumé",
    "123 4567 8.5",
    "  spaced\t\n  out  ",
    "the THE The tHe",
    "unusualword zxqj",
    "end-of-line hy-phen",
]
CLIP_INPUTS_NO_HF = [
    "日本語 トークン",   # CJK
    "\U0001f680\U0001f680 rocket",                     # emoji
]

# unigram vocabulary with scores shaped to make segmentations interesting:
# ambiguous splits, a high-scoring long piece, pieces crossing morphemes.
SPM_VOCAB = [
    (SPACE, -2.0),
    (SPACE + "the", -1.2), (SPACE + "The", -1.4), (SPACE + "cat", -1.5),
    (SPACE + "sat", -1.6), (SPACE + "on", -1.3), (SPACE + "mat", -1.7),
    (SPACE + "a", -1.1), (SPACE + "photo", -1.8), (SPACE + "of", -1.2),
    (SPACE + "un", -2.2), (SPACE + "unbeliev", -3.0),
    ("believ", -2.5), ("able", -2.1), ("ably", -2.4),
    (SPACE + "1", -2.6), (SPACE + "fi", -2.7), ("sh", -2.3),
    (SPACE + "fish", -2.0),
    ("t", -4.0), ("h", -4.1), ("e", -3.9), ("c", -4.2), ("a", -3.8),
    ("s", -4.0), ("o", -3.9), ("n", -4.0), ("m", -4.3), ("f", -4.2),
    ("i", -3.9), ("u", -4.1), ("b", -4.4), ("l", -4.0), ("v", -4.5),
    ("y", -4.2), ("1", -4.6), ("2", -4.6), ("3", -4.6),
    (SPACE + "t", -4.5), (SPACE + "c", -4.6), (SPACE + "f", -4.6),
    (SPACE + "u", -4.7), (SPACE + "b", -4.8),
]

SPM_INPUTS = [
    "the cat sat on the mat",
    "The cat",
    "a photo of the cat",
    "unbelievable",              # ▁un+believ+able vs ▁unbeliev+able by score
    "unbelievably",
    "fish",                      # ▁fish beats ▁fi+sh
    "ﬁsh",                  # NFKC: ﬁ → fi, then same as "fish"
    "① fish",               # NFKC: ① → 1
    "the   cat\n\nsat",          # whitespace collapse
]
SPM_BYTE_INPUTS = [
    "the λ cat",            # λ → two byte pieces
    "café",                 # é → two byte pieces
]


def main():
    clip_dir = ASSETS / "clip_tokenizer"
    write_clip_assets(clip_dir, CLIP_CORPUS, num_merges=384)

    spm_dir = ASSETS / "spiece"
    write_spiece_model(spm_dir / "t5_like.model", SPM_VOCAB, byte_fallback=False)
    write_spiece_model(spm_dir / "byte_fallback.model", SPM_VOCAB,
                       byte_fallback=True)

    # golden fixtures straight through the public from-disk constructors
    clip_tok = CLIPTokenizer.from_files(
        clip_dir / "vocab.json", clip_dir / "merges.txt"
    )
    spm_tok = SentencePieceUnigramTokenizer.from_file(
        spm_dir / "t5_like.model", max_length=32
    )
    spm_bf = SentencePieceUnigramTokenizer.from_file(
        spm_dir / "byte_fallback.model", max_length=32
    )
    goldens = {
        "clip": {s: clip_tok.tokenize(s) for s in CLIP_INPUTS + CLIP_INPUTS_NO_HF},
        "clip_hf_comparable": CLIP_INPUTS,
        "spiece": {s: spm_tok.tokenize(s, pad=False) for s in SPM_INPUTS},
        "spiece_byte_fallback": {s: spm_bf.tokenize(s, pad=False)
                                 for s in SPM_BYTE_INPUTS},
    }
    with open(ASSETS / "tokenizer_goldens.json", "w", encoding="utf-8") as f:
        json.dump(goldens, f, ensure_ascii=False, indent=1)
    print(f"wrote assets under {ASSETS}")
    print(f"clip vocab: {clip_tok.vocab_size} tokens; "
          f"spiece: {spm_tok.vocab_size} pieces")


if __name__ == "__main__":
    main()
