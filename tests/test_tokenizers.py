"""Unigram (SentencePiece-style) tokenizer tests.

The reference tokenizes with a production SentencePiece Gemma model
(`datamix_gemma/tokenizers/gemma_tokenizer.py`); the zero-egress
equivalent is `datamix.tokenizers.UnigramTokenizer` — same unigram-LM
algorithm family, trained offline on the committed fixture corpora.
"""

from __future__ import annotations

import pathlib

import pytest

from precondition_tpu.datamix import corpus_configs
from precondition_tpu.datamix import tokenizers

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "datamix"


@pytest.fixture(scope="module")
def tok():
  return tokenizers.train_from_manifests(
      str(FIXTURES), ["gsm8k", "sciq", "mtnt"], vocab_size=256)


class TestUnigramTokenizer:

  def test_roundtrip_lossless_on_corpus(self, tok):
    for rec in corpus_configs.load_jsonl(FIXTURES / "gsm8k.jsonl")[:20]:
      s = rec["question"] + " " + rec["answer"]
      assert tok.decode(tok.encode(s)) == s

  def test_roundtrip_lossless_on_unseen_unicode(self, tok):
    # Byte fallback must cover characters absent from the training text.
    for s in ["émoji ☃ test", "数学 is math", "tabs\tand\nnewlines"]:
      # Pretokenization collapses whitespace runs (like SPM's default
      # normalizer); compare modulo that.
      assert tok.decode(tok.encode(s)) == " ".join(s.split())

  def test_subword_compression_beats_bytes(self, tok):
    text = " ".join(
        r["question"] for r in corpus_configs.load_jsonl(
            FIXTURES / "gsm8k.jsonl")[:50])
    n_tokens = len(tok.encode(text))
    assert n_tokens < len(text.encode("utf-8")) / 2.5, (
        "unigram pieces should compress fixture text >2.5x vs bytes")

  def test_special_token_conventions(self, tok):
    # Gemma/SPM id layout: 0=pad, 1=eos, 2=bos.
    ids = tok.encode("hello", add_bos=True, add_eos=True)
    assert ids[0] == tokenizers.BOS_ID and ids[-1] == tokenizers.EOS_ID
    assert tok.decode(ids) == tok.decode(ids[1:-1])

  def test_save_load_identical(self, tok, tmp_path):
    path = tmp_path / "unigram.json"
    tok.save(str(path))
    clone = tokenizers.UnigramTokenizer.load(str(path))
    s = "Carla starts with 18 coins and gains 20."
    assert clone.encode(s) == tok.encode(s)
    assert clone.vocab_size == tok.vocab_size

  def test_make_tokenizer_specs(self, tok, tmp_path):
    path = tmp_path / "unigram.json"
    tok.save(str(path))
    t = tokenizers.make_tokenizer(f"unigram:{path}")
    assert t("some text") == tok.encode("some text")
    char = tokenizers.make_tokenizer("char", vocab_size=64)
    assert all(0 <= i < 64 for i in char("abc"))
    with pytest.raises(ValueError):
      tokenizers.make_tokenizer("nope:xyz")

  def test_sentencepiece_adapter_gated(self):
    # No sentencepiece package in this environment: the adapter must
    # raise a helpful ImportError, not crash at import time.
    with pytest.raises(ImportError, match="sentencepiece"):
      tokenizers.SentencePieceTokenizer("/nonexistent.model")

  def test_viterbi_prefers_pieces_over_bytes(self, tok):
    # A frequent fixture word should encode to far fewer ids than bytes.
    ids = tok.encode("stamps")
    assert len(ids) < len("stamps")

  def test_builder_accepts_spec_string(self, tok, tmp_path):
    path = tmp_path / "unigram.json"
    tok.save(str(path))
    builder = corpus_configs.build_offline(
        "gsm8k", str(FIXTURES), f"unigram:{path}", max_seq_len=64)
    ex = next(builder.get_train_dataset())
    assert ex.input_tokens.shape == (64,)
    assert ex.target_mask.any()
    # Token ids must live inside the tokenizer's vocab.
    assert int(ex.input_tokens.max()) < tok.vocab_size
