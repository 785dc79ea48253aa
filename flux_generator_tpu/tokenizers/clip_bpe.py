"""CLIP byte-pair-encoding tokenizer, implemented from scratch.

Behavior-compatible with the reference's from-scratch port
(flux/tokenizers.py:8-119 and stable_diffusion/.../tokenizer.py): lowercase +
whitespace collapse, CLIP word-split regex, per-word BPE with `</w>` end
marker, 77-token cap with forced EOS, EOS-padded batch encode. Adds the
byte→unicode mapping the reference omits so non-ASCII prompts round-trip.
"""

from __future__ import annotations

import functools
import gzip
import json
from pathlib import Path

import regex

_WORD_PAT = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)

BOS = "<|startoftext|>"
EOS = "<|endoftext|>"


@functools.lru_cache()
def bytes_to_unicode():
    """GPT-2/CLIP reversible byte→printable-unicode table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


class _NativeBpe:
    """ctypes wrapper over the C++ merge engine (csrc/clip_bpe.cpp).
    Build with scripts/build_native.py; absent lib → Python fallback."""

    def __init__(self, vocab: dict, merges: list, unk_id: int):
        import ctypes
        from pathlib import Path

        lib_path = Path(__file__).parent.parent / "native" / "libfgt_tokenizer.so"
        self._lib = ctypes.CDLL(str(lib_path))
        self._lib.fgt_bpe_create.restype = ctypes.c_void_p
        self._lib.fgt_bpe_encode_word.restype = ctypes.c_int32
        self._lib.fgt_bpe_encode_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        self._h = ctypes.c_void_p(self._lib.fgt_bpe_create())
        for tok, i in vocab.items():
            self._lib.fgt_bpe_add_token(self._h, tok.encode(), ctypes.c_int32(i))
        self._lib.fgt_bpe_set_unk(self._h, ctypes.c_int32(unk_id))
        for rank, (a, b) in enumerate(merges):
            self._lib.fgt_bpe_add_merge(
                self._h, a.encode(), b.encode(), ctypes.c_int32(rank)
            )
        self._buf = (ctypes.c_int32 * 512)()

    def encode_word(self, word: str):
        n = self._lib.fgt_bpe_encode_word(self._h, word.encode(), self._buf, 512)
        if n < 0:
            return None  # overflow — caller falls back
        return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.fgt_bpe_destroy(self._h)
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


def _native_available() -> bool:
    import os
    from pathlib import Path

    if os.environ.get("FGT_NATIVE_BPE", "auto").lower() in ("0", "off", "false"):
        return False
    return (Path(__file__).parent.parent / "native" / "libfgt_tokenizer.so").exists()


class CLIPTokenizer:
    def __init__(self, vocab: dict, merges: list, max_length: int = 77):
        """vocab: token→id; merges: list of (a, b) pairs in rank order."""
        self.max_length = max_length
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self._cache = {BOS: [BOS], EOS: [EOS]}
        self._native = None
        if _native_available():
            try:
                self._native = _NativeBpe(vocab, list(map(tuple, merges)),
                                          vocab.get(EOS, 0))
            except OSError:
                self._native = None

    # -------------------------------------------------- constructors

    @classmethod
    def from_files(cls, vocab_file, merges_file, max_length: int = 77):
        """HF-format vocab.json + merges.txt."""
        with open(vocab_file) as f:
            vocab = json.load(f)
        merges = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                merges.append(tuple(line.split()))
        return cls(vocab, merges, max_length)

    @classmethod
    def from_openai_bpe(cls, bpe_path, max_length: int = 77):
        """OpenAI bpe_simple_vocab_16e6.txt(.gz): merges imply the vocab."""
        opener = gzip.open if str(bpe_path).endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(m.split()) for m in lines[1 : 49152 - 256 - 2 + 1]]
        chars = list(bytes_to_unicode().values())
        tokens = chars + [c + "</w>" for c in chars]
        tokens += ["".join(m) for m in merges]
        tokens += [BOS, EOS]
        vocab = {t: i for i, t in enumerate(tokens)}
        return cls(vocab, merges, max_length)

    @classmethod
    def from_pretrained_dir(cls, path, max_length: int = 77):
        path = Path(path)
        if (path / "vocab.json").exists():
            return cls.from_files(path / "vocab.json", path / "merges.txt", max_length)
        for name in ("bpe_simple_vocab_16e6.txt.gz", "bpe_simple_vocab_16e6.txt"):
            if (path / name).exists():
                return cls.from_openai_bpe(path / name, max_length)
        raise FileNotFoundError(f"no CLIP tokenizer files in {path}")

    # -------------------------------------------------- properties

    @property
    def bos_token(self) -> int:
        return self.vocab[BOS]

    @property
    def eos_token(self) -> int:
        return self.vocab[EOS]

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    # -------------------------------------------------- BPE

    def _bpe(self, word: str) -> list:
        if word in self._cache:
            return self._cache[word]

        parts = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pairs = set(zip(parts, parts[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            merged, i = [], 0
            while i < len(parts):
                if i < len(parts) - 1 and (parts[i], parts[i + 1]) == best:
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged

        self._cache[word] = parts
        return parts

    # -------------------------------------------------- public API

    def tokenize(self, text, prepend_bos: bool = True, append_eos: bool = True):
        if isinstance(text, list):
            return [self.tokenize(t, prepend_bos, append_eos) for t in text]

        clean = regex.sub(r"\s+", " ", text.lower()).strip()
        words = regex.findall(_WORD_PAT, clean)

        unk = self.vocab.get(EOS)
        ids = []
        for w in words:
            if w not in (BOS, EOS):
                w = "".join(self.byte_encoder[b] for b in w.encode("utf-8"))
            if self._native is not None and w not in (BOS, EOS):
                native_ids = self._native.encode_word(w)
                if native_ids is not None:
                    ids.extend(native_ids)
                    continue
            for piece in self._bpe(w):
                ids.append(self.vocab.get(piece, unk))

        if prepend_bos:
            ids = [self.bos_token] + ids
        if append_eos:
            ids.append(self.eos_token)
        if len(ids) > self.max_length:
            ids = ids[: self.max_length]
            if append_eos:
                ids[-1] = self.eos_token
        return ids

    def encode(self, text):
        """Batch encode, EOS-padded to the longest row. Returns list-of-lists;
        callers wrap in jnp.array."""
        if not isinstance(text, list):
            return self.encode([text])
        rows = self.tokenize(text)
        length = max(len(r) for r in rows)
        return [r + [self.eos_token] * (length - len(r)) for r in rows]
