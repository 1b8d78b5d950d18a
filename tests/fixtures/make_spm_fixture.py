"""Generate the committed SentencePiece .model fixture.

Trains the framework's own `UnigramTokenizer` on the committed datamix
corpus manifests, then serializes the result as a GENUINE SentencePiece
``ModelProto`` via protoc-generated bindings from the public schema
(`sentencepiece_model.proto` in this directory) — i.e. the encoder is
protobuf's own (independent of the hand-written wire-format reader in
`precondition_tpu/datamix/spm_model.py` that the tests drive against it).

Piece layout mirrors Gemma's: 0=<pad> CONTROL, 1=<eos> CONTROL,
2=<bos> CONTROL, 3=<unk> UNKNOWN, 4..259 <0xXX> BYTE fallback pieces,
then the learned unigram pieces with their log-prob scores.

Run offline (re)generation:
    python tests/fixtures/make_spm_fixture.py

Output: tests/data/spm/fixture_unigram.model
"""

import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "tests", "data", "spm", "fixture_unigram.model")


def build_pb2():
  tmp = tempfile.mkdtemp(prefix="spm_proto_")
  subprocess.run(
      ["protoc", f"--proto_path={HERE}", f"--python_out={tmp}",
       "sentencepiece_model.proto"],
      check=True)
  sys.path.insert(0, tmp)
  import sentencepiece_model_pb2  # noqa: E402

  return sentencepiece_model_pb2


def main():
  from precondition_tpu.datamix import tokenizers

  pb2 = build_pb2()
  manifest_dir = os.path.join(HERE, "datamix")
  names = sorted(
      f[:-6] for f in os.listdir(manifest_dir) if f.endswith(".jsonl"))
  tok = tokenizers.train_from_manifests(manifest_dir, names, vocab_size=384)

  model = pb2.ModelProto()
  sp_type = pb2.ModelProto.SentencePiece

  def add(piece, score, ptype):
    p = model.pieces.add()
    p.piece, p.score, p.type = piece, score, ptype

  add("<pad>", 0.0, sp_type.CONTROL)
  add("<eos>", 0.0, sp_type.CONTROL)
  add("<bos>", 0.0, sp_type.CONTROL)
  add("<unk>", 0.0, sp_type.UNKNOWN)
  for b in range(256):
    add(f"<0x{b:02X}>", 0.0, sp_type.BYTE)
  # Learned pieces, most-probable first (cosmetic; ids are positional).
  for piece, logp in sorted(tok._pieces.items(), key=lambda kv: -kv[1]):
    add(piece, logp, sp_type.NORMAL)

  ts = model.trainer_spec
  ts.model_type = pb2.TrainerSpec.UNIGRAM
  ts.vocab_size = len(model.pieces)
  ts.byte_fallback = True
  ts.unk_id, ts.bos_id, ts.eos_id, ts.pad_id = 3, 2, 1, 0
  ts.unk_piece, ts.bos_piece = "<unk>", "<bos>"
  ts.eos_piece, ts.pad_piece = "<eos>", "<pad>"
  ns = model.normalizer_spec
  ns.name = "identity"
  ns.add_dummy_prefix = True
  ns.escape_whitespaces = True

  os.makedirs(os.path.dirname(OUT), exist_ok=True)
  with open(OUT, "wb") as f:
    f.write(model.SerializeToString())
  print(f"wrote {OUT}: {len(model.pieces)} pieces, "
        f"{os.path.getsize(OUT)} bytes")


if __name__ == "__main__":
  main()
