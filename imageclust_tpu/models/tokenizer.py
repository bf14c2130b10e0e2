"""CLIP byte-level BPE tokenizer (clean-room, data-gated).

The CLIP text tower (models/text.py) pools at the <end> token and projects
into the joint image-text space; to use REAL pretrained text checkpoints the
token ids must come from CLIP's actual byte-pair-encoding vocabulary, not
the offline hashing stand-in. This module implements that tokenizer from
the published algorithm: GPT-2's byte->printable-unicode mapping, word-level
regex splitting, greedy lowest-rank pair merging with an end-of-word marker
(``</w>``), and the two special tokens. Vocabulary layout (id order) matches
CLIP's: 256 byte symbols, 256 byte+``</w>`` symbols, one token per merge
rule, then ``<|startoftext|>`` and ``<|endoftext|>`` — so ``<|endoftext|>``
carries the HIGHEST id and the text tower's argmax pooling convention holds.

Data-gated: the merge table (CLIP ships ~48,894 merges as
``bpe_simple_vocab_16e6.txt.gz``) is not in this environment (zero egress).
The implementation is complete and tested against synthetic merge tables;
point ``IMAGECLUST_BPE_PATH`` (or ``BPETokenizer(path)``) at the real file
and ids match CLIP's vocabulary.
"""

from __future__ import annotations

import functools
import gzip
import html
import os

import numpy as np

__all__ = ["BPETokenizer", "bytes_to_unicode", "default_bpe_path"]


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode map: the 188 visibly
    printable latin-1 bytes map to themselves; the rest shift into the
    256..355 range so every byte string becomes a clean unicode string."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def default_bpe_path() -> str:
    """IMAGECLUST_BPE_PATH, or the conventional filename beside the repo."""
    p = os.environ.get("IMAGECLUST_BPE_PATH", "")
    if p:
        return p
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "bpe_simple_vocab_16e6.txt.gz")


def _basic_clean(text: str) -> str:
    # the reference implementation runs ftfy (mojibake repair) first; not in
    # this environment — html-unescape (twice, matching it) + strip
    return html.unescape(html.unescape(text)).strip()


class BPETokenizer:
    """CLIP's tokenizer over a merges file (.txt or .txt.gz).

    File format: one merge per line ("tok_a tok_b"), rank = line order;
    CLIP's shipped file has a version header line and is truncated to
    48,894 rules + 512 byte symbols + 2 specials = 49,408 ids. Any merge
    table in the same format works (tests use small synthetic ones).
    """

    SOT = "<|startoftext|>"
    EOT = "<|endoftext|>"

    def __init__(self, bpe_path: str | None = None, context: int = 77):
        import regex

        path = bpe_path or default_bpe_path()
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as fh:
            lines = fh.read().split("\n")
        # CLIP's file leads with a "#version: ..." header — skip ONLY that
        # line (a merge whose left symbol begins with a literal '#', e.g.
        # keycap-emoji byte sequences, is legitimate and must keep its
        # rank). Every other "a b" line is a merge, rank = order.
        if lines and lines[0].startswith("#version"):
            lines = lines[1:]
        merges = [tuple(ln.split()) for ln in lines if len(ln.split()) == 2]
        if len(merges) > 48894:
            merges = merges[:48894]

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [self.SOT, self.EOT]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.context = context
        self.vocab_size = len(vocab)
        self.sot_id = self.encoder[self.SOT]
        self.eot_id = self.encoder[self.EOT]
        self._cache: dict[str, str] = {}
        self._pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE,
        )

    # -- core BPE ----------------------------------------------------------

    def _bpe(self, token: str) -> str:
        """Greedy merge loop: repeatedly join the lowest-rank adjacent pair.
        The last symbol carries the ``</w>`` end-of-word marker."""
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            a, b = best
            out: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        result = " ".join(word)
        self._cache[token] = result
        return result

    def encode_text(self, text: str) -> list[int]:
        """Text -> BPE ids (no specials, no padding)."""
        import regex

        text = regex.sub(r"\s+", " ", _basic_clean(text)).lower()
        ids: list[int] = []
        for tok in self._pat.findall(text):
            if tok in (self.SOT, self.EOT):
                ids.append(self.encoder[tok])
                continue
            mapped = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(mapped).split(" "))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids
                       if int(i) not in (self.sot_id, self.eot_id))
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace(
            "</w>", " ").strip()

    def __call__(self, text: str) -> np.ndarray:
        """(context,) int32: <start> ids... <end>, zero-padded; truncates
        to fit the context window with the <end> token preserved."""
        ids = [self.sot_id] + self.encode_text(text)[: self.context - 2]
        ids.append(self.eot_id)
        out = np.zeros(self.context, np.int32)
        out[: len(ids)] = ids
        return out
