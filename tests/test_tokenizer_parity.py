"""CLIP BPE tokenizer parity vs transformers.CLIPTokenizer (offline).

Synthesises a small vocab.json + merges.txt, loads both tokenizers from the
same files, and compares token ids. Oracle for the independent BPE
implementation in diffusionkit_tpu/tokenizer.py (reference
tokenizer.py:14-121 is "a simple port" of the same HF algorithm).
"""

import json

import pytest

from diffusionkit_tpu.tokenizer import BOS, EOS, CLIPTokenizer


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clipvocab")
    chars = list("abcdefghijklmnopqrstuvwxyz.,!0123456789")
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = [
        ("t", "h"), ("th", "e</w>"), ("a", "t</w>"), ("c", "a"),
        ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"), ("i", "n"),
        ("in", "g</w>"), ("t", "i"), ("ti", "n"), ("o", "n</w>"),
    ]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab[BOS] = len(vocab)
    vocab[EOS] = len(vocab)
    vocab_path = d / "vocab.json"
    merges_path = d / "merges.txt"
    with open(vocab_path, "w") as f:
        json.dump(vocab, f)
    with open(merges_path, "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(vocab_path), str(merges_path)


PROMPTS = [
    "the cat",
    "a dog in the.",
    "cat, dog! the thing",
    "tin on a cat 42",
    "THE CAT",  # case folding
    "the   cat",  # whitespace collapsing
]


def test_bpe_matches_transformers(vocab_files):
    from transformers import CLIPTokenizer as HFCLIPTokenizer

    vocab_path, merges_path = vocab_files
    hf = HFCLIPTokenizer(
        vocab_path, merges_path, bos_token=BOS, eos_token=EOS,
        unk_token=EOS, pad_token=EOS,
    )
    ours = CLIPTokenizer.from_files(vocab_path, merges_path)
    for text in PROMPTS:
        want = hf(text)["input_ids"]
        got = ours.tokenize(text)
        assert got == want, (text, got, want)


def test_truncation_matches_transformers(vocab_files):
    from transformers import CLIPTokenizer as HFCLIPTokenizer

    vocab_path, merges_path = vocab_files
    hf = HFCLIPTokenizer(
        vocab_path, merges_path, bos_token=BOS, eos_token=EOS,
        unk_token=EOS, pad_token=EOS, model_max_length=10,
    )
    ours = CLIPTokenizer.from_files(vocab_path, merges_path)
    ours.max_length = 10
    text = "the cat the dog the cat the dog the cat"
    want = hf(text, truncation=True, max_length=10)["input_ids"]
    got = ours.tokenize(text)
    assert got == want


def test_list_input_matches_per_string(vocab_files):
    """Reference API parity: tokenize() accepts a list of strings and returns
    per-string token lists (reference tokenizer.py:91-93)."""
    vocab_path, merges_path = vocab_files
    ours = CLIPTokenizer.from_files(vocab_path, merges_path)
    texts = ["the cat", "a dog in the.", ""]
    got = ours.tokenize(texts)
    assert got == [ours.tokenize(t) for t in texts]
    # Flag plumbing applies per element.
    got_nb = ours.tokenize(texts, prepend_bos=False, append_eos=False)
    assert got_nb == [ours.tokenize(t, False, False) for t in texts]


def test_fuzz_matches_transformers(vocab_files):
    """Property-style fuzz vs HF CLIPTokenizer over the synthetic vocab's
    alphabet: random words, repeated/mixed whitespace (incl. tabs/newlines),
    punctuation runs, long words, and case folding."""
    import random

    from transformers import CLIPTokenizer as HFCLIPTokenizer

    vocab_path, merges_path = vocab_files
    hf = HFCLIPTokenizer(
        vocab_path, merges_path, bos_token=BOS, eos_token=EOS,
        unk_token=EOS, pad_token=EOS,
    )
    ours = CLIPTokenizer.from_files(vocab_path, merges_path)
    rng = random.Random(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    punct = ".,!"
    ws = [" ", "  ", "\t", "\n", " \t "]
    for _ in range(200):
        parts = []
        for _ in range(rng.randint(1, 8)):
            kind = rng.random()
            if kind < 0.6:
                w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
                if rng.random() < 0.3:
                    w = w.upper()
            elif kind < 0.8:
                w = "".join(rng.choice(punct) for _ in range(rng.randint(1, 4)))
            else:
                w = rng.choice("0123456789")
            parts.append(w)
            parts.append(rng.choice(ws))
        text = "".join(parts).strip()
        if not text:
            continue
        want = hf(text)["input_ids"]
        got = ours.tokenize(text)
        assert got == want, (repr(text), got, want)


def test_t5_decode_sentencepiece_joining(tmp_path):
    """T5TokenizerWrapper.decode: ▁-joining semantics (reference
    tokenizer.py:155-157) — token strings concatenated with ▁ mapped to a
    space (with_sep=True) or dropped (with_sep=False), specials untouched."""
    import json as _json

    from tokenizers import Tokenizer, models, pre_tokenizers

    from diffusionkit_tpu.tokenizer import T5TokenizerWrapper

    words = ["<pad>", "</s>", "<unk>", "▁the", "▁cat", "▁in", "▁a", "▁hat"]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    from tokenizers import processors

    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)]
    )
    tdir = tmp_path / "t5tok"
    tdir.mkdir()
    tok.save(str(tdir / "tokenizer.json"))
    with open(tdir / "tokenizer_config.json", "w") as f:
        _json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "unk_token": "<unk>", "eos_token": "</s>", "pad_token": "<pad>",
            "model_max_length": 32,
        }, f)

    wrapper = T5TokenizerWrapper(str(tdir), max_length=32)
    ids = wrapper.tokenize("the cat in a hat")
    assert ids[-1] == 1  # </s>
    assert wrapper.decode(ids) == " the cat in a hat</s>"
    assert wrapper.decode(ids, with_sep=False) == "thecatinahat</s>"
