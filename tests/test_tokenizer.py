"""CLIP byte-level BPE tokenizer (models/tokenizer.py).

The real merge table is not in this environment (zero egress), so these
tests drive the complete algorithm against small synthetic merge tables:
greedy lowest-rank merging, end-of-word markers, special-token layout
(<|endoftext|> = highest id, the text tower's argmax-pooling contract),
round-trip decoding, and the TextEncoder integration.
"""

import gzip

import numpy as np
import pytest

from imageclust_tpu.models.tokenizer import (
    BPETokenizer,
    bytes_to_unicode,
    default_bpe_path,
)

MERGES = [
    ("h", "e"),          # he
    ("l", "l"),          # ll
    ("he", "ll"),        # hell
    ("o", "</w>"),       # o</w>
    ("hell", "o</w>"),   # hello</w>
    ("w", "o"),          # wo
    ("r", "l"),          # rl
    ("d", "</w>"),       # d</w>
]


@pytest.fixture()
def bpe(tmp_path):
    p = tmp_path / "merges.txt"
    p.write_text("#version: test\n" +
                 "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    return BPETokenizer(str(p), context=16)


class TestBytesToUnicode:
    def test_reversible_and_total(self):
        m = bytes_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256
        assert m[ord("a")] == "a"  # printables map to themselves


class TestBPE:
    def test_vocab_layout(self, bpe):
        # 256 bytes + 256 byte</w> + merges + 2 specials
        assert bpe.vocab_size == 512 + len(MERGES) + 2
        # <|endoftext|> is the HIGHEST id — the argmax pooling contract
        assert bpe.eot_id == bpe.vocab_size - 1
        assert bpe.sot_id == bpe.vocab_size - 2

    def test_greedy_merge_order(self, bpe):
        # "hello" fully merges through ranks 0,1,2,3,4 into one token
        ids = bpe.encode_text("hello")
        assert [bpe.decoder[i] for i in ids] == ["hello</w>"]
        # "hell" stops at rank-2 "hell" + unmerged l</w>... no: h e l l ->
        # he + ll -> hell, final l carries </w> so the last pair is
        # (hell is h,e,l + "l</w>") — verify exact pieces instead of guessing
        ids2 = bpe.encode_text("he")
        assert [bpe.decoder[i] for i in ids2] == ["h", "e</w>"]

    def test_unmerged_word_falls_back_to_bytes(self, bpe):
        ids = bpe.encode_text("xyz")
        toks = [bpe.decoder[i] for i in ids]
        assert toks == ["x", "y", "z</w>"]

    def test_roundtrip_decode(self, bpe):
        for text in ("hello world", "hello hello", "a b c"):
            ids = bpe.encode_text(text)
            assert bpe.decode(ids) == text.lower()
        # punctuation splits into its own end-of-word token, so decode
        # space-separates it — the reference tokenizer's behavior too
        ids = bpe.encode_text("Hello, WORLD!")
        assert bpe.decode(ids) == "hello , world !"

    def test_call_pads_and_wraps(self, bpe):
        arr = bpe("hello")
        assert arr.shape == (16,)
        assert arr.dtype == np.int32
        assert arr[0] == bpe.sot_id
        assert arr[2] == bpe.eot_id  # hello -> 1 token
        assert (arr[3:] == 0).all()

    def test_truncation_preserves_eot(self, bpe):
        long = " ".join(["xyz"] * 50)  # 3 ids per word
        arr = bpe(long)
        assert arr[0] == bpe.sot_id
        assert arr[15] == bpe.eot_id or bpe.eot_id in arr
        ids = [i for i in arr if i != 0]
        assert ids[-1] == bpe.eot_id
        assert len(ids) <= 16

    def test_gzip_supported(self, tmp_path):
        p = tmp_path / "merges.txt.gz"
        with gzip.open(p, "wt") as fh:
            fh.write("#version: test\n")
            fh.write("\n".join(f"{a} {b}" for a, b in MERGES))
        tok = BPETokenizer(str(p), context=16)
        assert tok.encode_text("hello") == [tok.encoder["hello</w>"]]

    def test_hash_symbol_merges_keep_their_rank(self, tmp_path):
        # only the "#version" header line is skipped — a merge whose left
        # symbol begins with '#' (keycap emoji byte sequences etc.) is
        # legitimate and must not shift later ids
        p = tmp_path / "merges.txt"
        p.write_text("#version: test\n# #\nh e\n")
        tok = BPETokenizer(str(p), context=16)
        assert ("#", "#") in tok.bpe_ranks and tok.bpe_ranks[("#", "#")] == 0
        assert tok.bpe_ranks[("h", "e")] == 1
        assert tok.vocab_size == 512 + 2 + 2

    def test_specials_pass_through(self, bpe):
        ids = bpe.encode_text("<|endoftext|>")
        assert ids == [bpe.eot_id]

    def test_unicode_bytes(self, bpe):
        # non-ASCII goes through the byte mapping without KeyError
        ids = bpe.encode_text("café ♥")
        assert ids and bpe.decode(ids) == "café ♥"


class TestTextEncoderIntegration:
    def test_encoder_uses_bpe_when_available(self, tmp_path):
        from imageclust_tpu.models.text import TextConfig, TextEncoder

        p = tmp_path / "merges.txt"
        p.write_text("#version: test\n" +
                     "\n".join(f"{a} {b}" for a, b in MERGES))
        cfg = TextConfig(width=64, depth=2, heads=2, proj_dim=32,
                         vocab=0, context=16)
        enc = TextEncoder(cfg=cfg, bpe_path=str(p))
        assert enc.tokenizer is not None
        assert enc.cfg.vocab == enc.tokenizer.vocab_size
        assert enc.cfg.eot_id is None  # argmax pooling (eot = highest id)
        out = enc.encode(["hello world", "xyz"])
        assert out.shape == (2, 32)
        assert np.isfinite(out).all()
        # deterministic across instances (same seed)
        out2 = TextEncoder(cfg=cfg, bpe_path=str(p)).encode(
            ["hello world", "xyz"])
        np.testing.assert_array_equal(out, out2)

    def test_encoder_falls_back_to_hashing(self, tmp_path):
        from imageclust_tpu.models.text import TextEncoder

        enc = TextEncoder(bpe_path=str(tmp_path / "absent.txt"))
        assert enc.tokenizer is None
        out = enc.encode(["hello"])
        assert out.shape[0] == 1

    def test_env_opt_in_adopts_bpe_even_with_variables(
            self, tmp_path, monkeypatch):
        """IMAGECLUST_BPE_PATH is an explicit user ask, equivalent to the
        bpe_path argument: a caller-provided variables tree must not
        silently demote it to the hash tokenizer (review finding — a real
        CLIP text checkpoint would then get garbage in-range ids)."""
        from imageclust_tpu.models.text import TextConfig, TextEncoder

        p = tmp_path / "merges.txt"
        p.write_text("#version: test\n" +
                     "\n".join(f"{a} {b}" for a, b in MERGES))
        cfg = TextConfig(width=64, depth=2, heads=2, proj_dim=32,
                         vocab=0, context=16)
        # build matching variables once via the BPE-shaped tower
        donor = TextEncoder(cfg=cfg, bpe_path=str(p))
        monkeypatch.setenv("IMAGECLUST_BPE_PATH", str(p))
        enc = TextEncoder(cfg=cfg, variables=donor.variables)
        assert enc.tokenizer is not None
        assert enc.cfg.vocab == donor.cfg.vocab

    def test_conventional_file_not_adopted_with_variables(
            self, tmp_path, monkeypatch):
        """Without any explicit ask, existing variables keep the hash
        tokenizer even when a merges file sits at the conventional path
        (a hash-tokenizer checkpoint must not shape-mismatch at apply)."""
        import imageclust_tpu.models.tokenizer as tokmod
        from imageclust_tpu.models.text import TextEncoder

        p = tmp_path / "merges.txt"
        p.write_text("#version: test\n" +
                     "\n".join(f"{a} {b}" for a, b in MERGES))
        monkeypatch.delenv("IMAGECLUST_BPE_PATH", raising=False)
        donor = TextEncoder(  # hash-tokenizer shapes (no BPE anywhere)
            bpe_path=str(tmp_path / "absent.txt"))
        assert donor.tokenizer is None
        monkeypatch.setattr(tokmod, "default_bpe_path", lambda: str(p))
        enc = TextEncoder(variables=donor.variables)
        assert enc.tokenizer is None
        assert enc.cfg.vocab == donor.cfg.vocab
