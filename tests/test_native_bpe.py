"""Native (C++) BPE engine vs the Python implementation — identical ids on a
randomized corpus. Builds the shared lib on the fly if missing."""

import random
import string
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def native_lib():
    lib = ROOT / "flux_generator_tpu" / "native" / "libfgt_tokenizer.so"
    if not lib.exists():
        subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "build_native.py")], check=True
        )
    return lib


def _mk_tokenizer(native: bool, monkeypatch_env):
    from flux_generator_tpu.tokenizers.clip_bpe import BOS, EOS, CLIPTokenizer

    rng = random.Random(0)
    chars = list(string.ascii_lowercase)
    tokens = chars + [c + "</w>" for c in chars]
    merges = []
    seen = set(tokens)
    for _ in range(300):
        a = rng.choice(tokens)
        b = rng.choice(tokens)
        if a.endswith("</w>") or (a, b) in seen:
            continue
        m = a + b
        if m in seen:
            continue
        merges.append((a, b))
        tokens.append(m)
        seen.add(m)
    vocab = {t: i for i, t in enumerate(tokens)}
    vocab[BOS] = len(vocab)
    vocab[EOS] = len(vocab)
    monkeypatch_env.setenv("FGT_NATIVE_BPE", "1" if native else "0")
    tok = CLIPTokenizer(vocab, merges, max_length=64)
    if native:
        assert tok._native is not None, "native engine failed to load"
    else:
        assert tok._native is None
    return tok


def test_native_matches_python(native_lib, monkeypatch):
    tok_py = _mk_tokenizer(False, monkeypatch)
    tok_nat = _mk_tokenizer(True, monkeypatch)
    rng = random.Random(1)
    for _ in range(200):
        word = "".join(rng.choice(string.ascii_lowercase)
                       for _ in range(rng.randint(1, 12)))
        assert tok_py.tokenize(word) == tok_nat.tokenize(word), word


def test_native_sentences(native_lib, monkeypatch):
    tok_py = _mk_tokenizer(False, monkeypatch)
    tok_nat = _mk_tokenizer(True, monkeypatch)
    for text in ("a quick brown fox", "hello   world", "ABC def", ""):
        assert tok_py.encode(text) == tok_nat.encode(text)
