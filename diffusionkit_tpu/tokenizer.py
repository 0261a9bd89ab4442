"""Text tokenizers: CLIP BPE and T5.

Behavioural spec: reference python/src/diffusionkit/mlx/tokenizer.py:14-160.
The CLIP tokenizer is an independent BPE implementation over the standard
vocab.json + merges.txt files; the T5 tokenizer wraps HF ``AutoTokenizer``
(matching the reference) but accepts a local directory so it works offline.

Both run on host CPU and produce numpy int32 token arrays; padding to the
model's max length happens here (static shapes are what let the text encoders
jit once), mirroring ``DiffusionPipeline._tokenize``
(reference mlx/__init__.py:176-195).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import regex

from .utils import get_logger

logger = get_logger(__name__)

_CLIP_PATTERN = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)

BOS = "<|startoftext|>"
EOS = "<|endoftext|>"


class CLIPTokenizer:
    """CLIP byte-pair-encoding tokenizer.

    Word-level BPE with ``</w>`` end-of-word markers; text is lowercased and
    whitespace-collapsed before the regex split (reference tokenizer.py:93-99
    documents the same "95% of cases" simplification vs HF).
    """

    def __init__(
        self,
        bpe_ranks: Dict[Tuple[str, str], int],
        vocab: Dict[str, int],
        pad_with_eos: bool = False,
        max_length: int = 77,
    ):
        self.bpe_ranks = bpe_ranks
        self.vocab = vocab
        self.pad_with_eos = pad_with_eos
        self.max_length = max_length
        self._cache: Dict[str, List[str]] = {BOS: [BOS], EOS: [EOS]}

    @classmethod
    def from_files(
        cls,
        vocab_path: Union[str, Path],
        merges_path: Union[str, Path],
        pad_with_eos: bool = False,
    ) -> "CLIPTokenizer":
        with open(vocab_path) as f:
            vocab = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            lines = f.read().split("\n")
        # First line of merges.txt is a version header.
        merges = [
            tuple(line.split()) for line in lines[1:] if len(line.split()) == 2
        ]
        ranks = {pair: i for i, pair in enumerate(merges)}
        return cls(ranks, vocab, pad_with_eos=pad_with_eos)

    @property
    def bos_token(self) -> int:
        return self.vocab[BOS]

    @property
    def eos_token(self) -> int:
        return self.vocab[EOS]

    @property
    def pad_token(self) -> int:
        return self.eos_token if self.pad_with_eos else 0

    def bpe(self, word: str) -> List[str]:
        """Merge the characters of one word by ascending merge rank."""
        if word in self._cache:
            return self._cache[word]
        parts = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pairs = set(zip(parts, parts[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            merged: List[str] = []
            i = 0
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

    def tokenize(
        self,
        text: Union[str, List[str]],
        prepend_bos: bool = True,
        append_eos: bool = True,
    ) -> List:
        """Tokenize one string -> List[int], or a list of strings -> a list
        of per-string token lists (reference tokenizer.py:91-93)."""
        if isinstance(text, list):
            return [self.tokenize(t, prepend_bos, append_eos) for t in text]
        clean = regex.sub(r"\s+", " ", text.lower())
        words = regex.findall(_CLIP_PATTERN, clean)
        pieces = [p for w in words for p in self.bpe(w)]
        ids = [self.vocab[p] for p in pieces]
        budget = self.max_length - int(prepend_bos) - int(append_eos)
        if len(ids) > budget:
            logger.warning(
                "Token length %d exceeds %d; truncating.", len(ids), self.max_length
            )
            ids = ids[:budget]
        if prepend_bos:
            ids = [self.bos_token] + ids
        if append_eos:
            ids = ids + [self.eos_token]
        return ids


class T5TokenizerWrapper:
    """T5 sentencepiece tokenizer via HF transformers.

    Mirrors reference tokenizer.py:123-160 but takes an explicit local path or
    repo id instead of hardcoding a hub download.
    """

    def __init__(
        self,
        path_or_repo: str = "google/t5-v1_1-xxl",
        max_length: int = 256,
    ):
        from transformers import AutoTokenizer

        self.max_length = max_length
        self._tok = AutoTokenizer.from_pretrained(
            path_or_repo, legacy=False, model_max_length=max_length
        )
        self.pad_with_eos = False

    @property
    def eos_token(self) -> int:
        return self._tok.eos_token_id

    @property
    def pad_token(self) -> int:
        return 0

    def tokenize(self, text: str) -> List[int]:
        return list(
            self._tok(
                text,
                return_attention_mask=False,
                max_length=self.max_length,
                truncation=True,
            )["input_ids"]
        )

    def decode(self, t: List[int], with_sep: bool = True) -> str:
        """ids -> text by sentencepiece-token joining, ``▁`` as the separator
        (reference tokenizer.py:155-157)."""
        tokens = self._tok.convert_ids_to_tokens(t)
        return "".join(
            tok.replace("▁", " " if with_sep else "") for tok in tokens
        )


def tokenize_batch(
    tokenizer,
    text: str,
    negative_text: Optional[str] = None,
    pad_to_max_length: bool = True,
) -> np.ndarray:
    """Build the (1 or 2, L) int32 token batch: row 0 positive, row 1 negative.

    Row order matters for CFG: the denoiser splits batch halves as
    (text, negative) (reference mlx/__init__.py:717-719). Padding token is 0
    unless the tokenizer pads with EOS (reference mlx/__init__.py:176-195).
    """
    pad = tokenizer.pad_token
    rows = [list(tokenizer.tokenize(text))]
    if pad_to_max_length:
        rows[0].extend([pad] * (tokenizer.max_length - len(rows[0])))
    if negative_text is not None:
        rows.append(list(tokenizer.tokenize(negative_text)))
    width = max(len(r) for r in rows)
    rows = [r + [pad] * (width - len(r)) for r in rows]
    return np.asarray(rows, dtype=np.int32)
