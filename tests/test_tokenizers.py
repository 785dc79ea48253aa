import struct

import pytest

from flux_generator_tpu.tokenizers.clip_bpe import BOS, EOS, CLIPTokenizer
from flux_generator_tpu.tokenizers.sentencepiece_unigram import (
    SPACE,
    SentencePieceUnigramTokenizer,
    parse_model_proto,
)


# ------------------------------------------------------------ CLIP BPE


@pytest.fixture
def clip_tok():
    # tiny vocab: characters + a few merges
    chars = list("abcdehlopt") + [c + "</w>" for c in "abcdehlopt"]
    merges = [("h", "e</w>"), ("l", "l"), ("ll", "o</w>"), ("c", "a"), ("ca", "t</w>")]
    tokens = chars + ["".join(m).replace("</w>", "") + ("</w>" if m[1].endswith("</w>") else "") for m in merges]
    tokens += [BOS, EOS]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    return CLIPTokenizer(vocab, merges, max_length=16)


def test_clip_bpe_merges(clip_tok):
    ids = clip_tok.tokenize("hello cat")
    toks = [clip_tok.inv_vocab[i] for i in ids]
    assert toks[0] == BOS and toks[-1] == EOS
    assert "he" not in toks  # 'h','e</w>' merge only fires at word end
    assert "cat</w>" in toks
    assert "llo</w>" in toks


def test_clip_lowercase_and_whitespace(clip_tok):
    assert clip_tok.tokenize("CAT") == clip_tok.tokenize("  cat \n")


def test_clip_max_length_forces_eos(clip_tok):
    clip_tok.max_length = 4
    ids = clip_tok.tokenize("hello hello hello hello")
    assert len(ids) == 4
    assert ids[-1] == clip_tok.eos_token


def test_clip_batch_pad(clip_tok):
    rows = clip_tok.encode(["cat", "hello cat"])
    assert len(rows[0]) == len(rows[1])
    assert rows[0][-1] == clip_tok.eos_token


# ------------------------------------------------------------ sentencepiece


def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _piece(piece, score, ptype=1):
    body = _field(1, 2, _varint(len(piece.encode())) + piece.encode())
    body += _field(2, 5, struct.pack("<f", score))
    if ptype != 1:
        body += _field(3, 0, _varint(ptype))
    return _field(1, 2, _varint(len(body)) + body)


@pytest.fixture
def spm_model(tmp_path):
    # standard t5-ish layout: pad=0(control? actually <pad> control), eos=1, unk=2
    blob = b""
    blob += _piece("<pad>", 0, 3)
    blob += _piece("</s>", 0, 3)
    blob += _piece("<unk>", 0, 2)
    for p, s in [
        (SPACE, -2.0),
        (SPACE + "the", -1.0),
        (SPACE + "cat", -1.5),
        ("t", -3.0),
        ("h", -3.0),
        ("e", -3.0),
        ("c", -3.0),
        ("a", -3.0),
        (SPACE + "th", -2.5),
        ("at", -2.8),
    ]:
        blob += _piece(p, s)
    # trainer spec with ids
    ts = _field(40, 0, _varint(2)) + _field(41, 0, _varint((1 << 64) - 1))  # unk=2, bos=-1
    ts += _field(42, 0, _varint(1)) + _field(43, 0, _varint(0))
    blob += _field(2, 2, _varint(len(ts)) + ts)
    path = tmp_path / "test.model"
    path.write_bytes(blob)
    return path


def test_spm_proto_parse(spm_model):
    with open(spm_model, "rb") as f:
        pieces, trainer, norm = parse_model_proto(f.read())
    assert pieces[0][0] == "<pad>"
    assert trainer["eos_id"] == 1 and trainer["pad_id"] == 0


def test_spm_viterbi_picks_best(spm_model):
    tok = SentencePieceUnigramTokenizer.from_file(spm_model, max_length=8)
    ids = tok.tokenize("the cat", prepend_bos=False, append_eos=False, pad=False)
    toks = [tok.id_to_piece[i] for i in ids]
    # "▁the" (-1.0) + "▁cat" (-1.5) beats char-level splits
    assert toks == [SPACE + "the", SPACE + "cat"]


def test_spm_pad_and_eos(spm_model):
    tok = SentencePieceUnigramTokenizer.from_file(spm_model, max_length=8)
    ids = tok.tokenize("the")
    assert len(ids) == 8
    assert ids[1] == tok.eos_token  # bos_id=-1 → no bos
    assert set(ids[2:]) == {tok.pad_token}


def test_spm_decode_roundtrip(spm_model):
    tok = SentencePieceUnigramTokenizer.from_file(spm_model, max_length=8)
    ids = tok.tokenize("the cat", pad=False)
    assert tok.decode(ids) == "the cat"


def _force_py(tok):
    tok._native = None
    return tok


def test_spm_native_matches_python(spm_model):
    """The C++ Viterbi engine (csrc/spm_unigram.cpp) must reproduce the
    Python DP exactly — same scores, tie-breaks, and unk fallback."""
    tok = SentencePieceUnigramTokenizer.from_file(spm_model, max_length=64)
    if tok._native is None:
        pytest.skip("native tokenizer lib not built")
    cases = [
        "the cat", "thecat", "t h e", "", "the the the cat at hat",
        "xyzzy",              # all-unknown (no byte pieces → unk ids)
        "theécat",       # non-ascii codepoint
        "cat" * 50,           # long input
        "  spaced   out  ",
    ]
    for text in cases:
        native = tok.tokenize(text, prepend_bos=False, append_eos=False,
                              pad=False)
        tok_py = _force_py(
            SentencePieceUnigramTokenizer.from_file(spm_model, max_length=64))
        py = tok_py.tokenize(text, prepend_bos=False, append_eos=False,
                             pad=False)
        assert native == py, (text, native, py)


def test_spm_native_byte_fallback_matches_python():
    """Byte-fallback path: unknown codepoints must emit the same byte-piece
    ids from both engines (incl. multi-byte UTF-8)."""
    import pathlib

    model = pathlib.Path(__file__).parent / "assets" / "spiece" / "byte_fallback.model"
    tok = SentencePieceUnigramTokenizer.from_file(str(model), max_length=64)
    if tok._native is None:
        pytest.skip("native tokenizer lib not built")
    tok_py = _force_py(
        SentencePieceUnigramTokenizer.from_file(str(model), max_length=64))
    for text in ["héllo", "日本語テスト", "a☃b", "mixed 日本 ascii"]:
        native = tok.tokenize(text, prepend_bos=False, append_eos=False,
                              pad=False)
        py = tok_py.tokenize(text, prepend_bos=False, append_eos=False,
                             pad=False)
        assert native == py, (text, native, py)
