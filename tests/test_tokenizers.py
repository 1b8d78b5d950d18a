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

  def test_sentencepiece_adapter_missing_file(self):
    # Without the sentencepiece package the adapter falls back to the
    # native ModelProto reader, which surfaces a clear file error.
    with pytest.raises(OSError):
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


SPM_FIXTURE = (pathlib.Path(__file__).parent / "data" / "spm" /
               "fixture_unigram.model")


@pytest.fixture(scope="module")
def spm_tok():
  return tokenizers.make_tokenizer(f"spm:{SPM_FIXTURE}")


class TestSentencePieceModelFile:
  """The real `.model` (ModelProto) format path.

  The committed fixture is a genuine SentencePiece protobuf — serialized
  by protoc-generated bindings from the public schema
  (tests/fixtures/make_spm_fixture.py), decoded here by the INDEPENDENT
  hand-written wire parser in `datamix/spm_model.py`.  Reference analog:
  `datamix_gemma/tokenizers/gemma_tokenizer.py` loading Gemma's
  production model.
  """

  def test_model_proto_decodes(self):
    from precondition_tpu.datamix import spm_model

    m = spm_model.load_model(str(SPM_FIXTURE))
    # Gemma-style layout the generator wrote: pad/eos/bos/unk + 256 bytes.
    assert m.pad_id == 0 and m.eos_id == 1 and m.bos_id == 2
    assert m.unk_id == 3
    assert len(m.byte_ids) == 256
    assert m.pieces[4][0] == "<0x00>" and m.pieces[4][2] == spm_model.BYTE
    assert m.vocab_size > 260  # learned pieces present
    # Scores are the unigram log-probs: negative for learned pieces.
    assert all(s < 0 for p, s, t in m.pieces if t == spm_model.NORMAL)

  def test_spm_spec_roundtrip_on_corpus(self, spm_tok):
    for rec in corpus_configs.load_jsonl(FIXTURES / "gsm8k.jsonl")[:10]:
      s = " ".join((rec["question"] + " " + rec["answer"]).split())
      assert spm_tok.decode(spm_tok.encode(s)) == s

  def test_spm_byte_fallback_roundtrip(self, spm_tok):
    s = "héllo ∑ 数学"
    ids = spm_tok.encode(s)
    assert spm_tok.decode(ids) == s
    # Unicode chars outside the learned pieces ride the <0xXX> pieces.
    assert any(4 <= i < 260 for i in ids)

  def test_spm_special_ids_and_vocab(self, spm_tok):
    ids = spm_tok.encode("hello", add_bos=True, add_eos=True)
    assert ids[0] == 2 and ids[-1] == 1  # bos / eos from trainer_spec
    assert all(0 <= i < spm_tok.vocab_size for i in ids)

  def test_spm_subword_compression(self, spm_tok):
    text = " ".join(
        r["question"] for r in corpus_configs.load_jsonl(
            FIXTURES / "gsm8k.jsonl")[:50])
    assert len(spm_tok.encode(text)) < len(text.encode("utf-8")) / 2.5

  def test_parser_rejects_garbage(self, tmp_path):
    from precondition_tpu.datamix import spm_model

    bad = tmp_path / "bad.model"
    bad.write_bytes(b"\xff\xff\xff\xff not a protobuf")
    with pytest.raises(ValueError):
      spm_model.load_model(str(bad))

  def test_parser_skips_unknown_fields(self):
    # Forward compat: a model with extra fields (newer sentencepiece)
    # must still decode.  Append an unknown field #100 (varint) to the
    # fixture bytes.
    from precondition_tpu.datamix import spm_model

    data = SPM_FIXTURE.read_bytes()
    key = 100 << 3 | 0  # field 100, varint wire type -> 2-byte varint key
    extended = data + bytes([key & 0x7F | 0x80, key >> 7, 42])
    m = spm_model.parse_model_proto(extended)
    assert m.vocab_size == spm_model.load_model(str(SPM_FIXTURE)).vocab_size

  def test_builder_accepts_spm_spec(self):
    builder = corpus_configs.build_offline(
        "gsm8k", str(FIXTURES), f"spm:{SPM_FIXTURE}", max_seq_len=64)
    ex = next(builder.get_train_dataset())
    assert ex.input_tokens.shape == (64,)
    assert ex.target_mask.any()
