"""End-to-end datamix pipeline over the committed offline fixture corpora.

Exercises SURVEY §2.4 D1-D7 as one system (VERDICT round-1 item 9): the
JSONL fixture corpora (`tests/fixtures/datamix/`, regenerable via
`generate.py`) flow through the materialized per-corpus configs →
`TextDatasetBuilder`s → mixture batch generators → the SPMD
`TrainingLoop` under distributed Shampoo on the 8-CPU mesh → loss +
few-shot multiple-choice evals → the bandit loop.

Reference pipeline mirrored: `datamix_gemma/finetune.py` (wiring),
`dataset_builders/*` (schemas), `evals/mmlu_eval.py:34-80` (prompt
assembly), `evals/crop.py` (BPE cropping).
"""

from __future__ import annotations

import os
import pathlib

import jax
import numpy as np
import pytest

from precondition_tpu.datamix import bandit_loop
from precondition_tpu.datamix import batch_generators
from precondition_tpu.datamix import corpus_configs
from precondition_tpu.datamix import dataset_builder
from precondition_tpu.datamix import training_loop as training_loop_lib
from precondition_tpu.datamix.evals import crop
from precondition_tpu.datamix.evals import few_shot
from precondition_tpu.datamix.evals import loss_eval
from precondition_tpu.datamix.evals import mmlu_eval
from precondition_tpu.models import transformer
from precondition_tpu.optim import shampoo

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "datamix"

VOCAB = 128
SEQ_LEN = 128  # gsm8k fixture prompts alone run ~70 chars


def _tok():
  return dataset_builder.char_tokenizer(VOCAB)


class TestCrop:

  def test_byte_fallback_roundtrip(self):
    enc = crop.BPEEncoder()
    s = "héllo wörld — 数学 123\n"
    assert enc.decode(enc.encode(s)) == s

  def test_trained_bpe_roundtrips_and_compresses(self):
    corpus = [r["question"] + " " + r["answer"]
              for r in corpus_configs.load_jsonl(FIXTURES / "gsm8k.jsonl")]
    enc = crop.train_bpe(corpus[:50], num_merges=200)
    assert enc.vocab_size > 256
    for s in corpus[:10] + ["unseen text with new words entirely"]:
      ids = enc.encode(s)
      assert enc.decode(ids) == s
      assert len(ids) < len(s.encode("utf-8"))  # merges actually fire

  def test_crop_prompt_enforces_budget(self):
    enc = crop.train_bpe(["abcabcabc"] * 4, num_merges=8)
    long = "abc" * 500
    cropped = crop.crop_prompt(long, max_tokens=32, enc=enc)
    assert len(enc.encode(cropped)) <= 32
    assert long.startswith(cropped)  # head-preserving, like the reference
    assert crop.crop(long, 32, enc) == cropped

  def test_json_roundtrip(self):
    enc = crop.train_bpe(["the cat sat on the mat"] * 8, num_merges=16)
    clone = crop.BPEEncoder.from_json(enc.to_json())
    s = "the mat sat"
    assert clone.encode(s) == enc.encode(s)


class TestFewShot:

  def _records(self, name):
    return [few_shot.MultipleChoiceRecord.from_dict(d)
            for d in corpus_configs.load_jsonl(FIXTURES / name)]

  def test_format_example_exact(self):
    rec = few_shot.MultipleChoiceRecord(
        question="What is 2 + 2?", choices=["3", "4", "5", "6"], answer=1,
        subject="simple_arithmetic")
    want = "What is 2 + 2?\nA. 3\nB. 4\nC. 5\nD. 6\nAnswer: B\n\n"
    assert few_shot.format_example(rec) == want
    assert few_shot.format_example(rec, include_answer=False) == (
        "What is 2 + 2?\nA. 3\nB. 4\nC. 5\nD. 6\nAnswer:")

  def test_gen_prompt_header_and_shots(self):
    recs = self._records("mmlu_dev.jsonl")
    arith = [r for r in recs if r.subject == "simple_arithmetic"]
    prompt = few_shot.gen_prompt(arith, "simple_arithmetic", k=2)
    assert prompt.startswith(
        "The following are multiple choice questions (with answers) about"
        " simple arithmetic.\n\n")
    assert prompt.count("Answer: ") == 2

  def test_assemble_drops_exemplars_to_fit(self):
    recs = self._records("mmlu_dev.jsonl")
    arith = [r for r in recs if r.subject == "simple_arithmetic"]
    test = self._records("mmlu_test.jsonl")[0]
    tok = _tok()
    full = few_shot.assemble(arith, test, ntrain=3)
    fitted = few_shot.assemble(arith, test, ntrain=3,
                               max_tokens=len(tok(full)) - 1, tokenizer=tok)
    assert len(tok(fitted)) < len(tok(full))
    # The live question always survives the crop.
    assert fitted.endswith(few_shot.format_example(test,
                                                   include_answer=False))

  def test_build_eval_inputs_consistency(self):
    dev = self._records("mmlu_dev.jsonl")
    test = self._records("mmlu_test.jsonl")[:6]
    qs, choice_sets, gold = few_shot.build_eval_inputs(
        dev, test, _tok(), ntrain=1)
    assert len(qs) == len(choice_sets) == len(gold) == 6
    for q, cs, g, rec in zip(qs, choice_sets, gold, test):
      assert 0 <= g < len(cs) == len(rec.choices)
      assert all(isinstance(t, int) for t in q)


class TestCorpusConfigs:

  def test_registry_covers_reference_corpora(self):
    # The reference's builder family (dataset_builders/*.py).
    for name in ["gsm8k", "open_orca", "orca_math", "mtnt", "mbpp", "sciq",
                 "dolly", "codealpaca", "metamath", "wikipedia"]:
      assert name in corpus_configs.REGISTRY

  @pytest.mark.parametrize("name", ["gsm8k", "sciq", "mtnt"])
  def test_offline_builder_masks_answers(self, name):
    builder = corpus_configs.build_offline(
        name, str(FIXTURES), _tok(), SEQ_LEN)
    assert builder.num_examples() == 150
    ex = next(builder.get_train_dataset())
    assert ex.input_tokens.shape == (SEQ_LEN,)
    assert ex.target_mask.shape == (SEQ_LEN,)
    assert ex.target_mask.any() and not ex.target_mask.all()
    # Loss never lands on the prompt's first token.
    assert not ex.target_mask[0]

  def test_gsm8k_prompt_framing(self):
    recs = corpus_configs.load_jsonl(FIXTURES / "gsm8k.jsonl")
    prompt, answer = corpus_configs.REGISTRY["gsm8k"].record_to_pair(recs[0])
    assert prompt.startswith("Q: ") and prompt.endswith("\n")
    assert answer.startswith("A: ") and answer.endswith("\n")

  def test_mtnt_src_dst(self):
    recs = corpus_configs.load_jsonl(FIXTURES / "mtnt.jsonl")
    prompt, answer = corpus_configs.REGISTRY["mtnt"].record_to_pair(recs[0])
    assert prompt.rstrip("\n") == recs[0]["src"]
    assert answer == recs[0]["dst"]

  def test_sciq_support_in_prompt(self):
    recs = corpus_configs.load_jsonl(FIXTURES / "sciq.jsonl")
    prompt, answer = corpus_configs.REGISTRY["sciq"].record_to_pair(recs[0])
    assert recs[0]["support"] in prompt
    assert answer == recs[0]["correct_answer"]


class TestEndToEnd:
  """The full D1-D7 drive on the 8-CPU mesh."""

  def _pipeline(self):
    from jax.sharding import Mesh

    cfg = transformer.TransformerConfig(
        vocab_size=VOCAB, d_model=64, n_heads=4, n_layers=2, d_ff=128,
        max_seq_len=SEQ_LEN, remat=False)
    params = transformer.init_params(jax.random.PRNGKey(0), cfg)
    tok = _tok()
    builders = [
        corpus_configs.build_offline(name, str(FIXTURES), tok, SEQ_LEN)
        for name in ("gsm8k", "sciq", "mtnt")
    ]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    tx = shampoo.distributed_shampoo(
        learning_rate=0.001, block_size=32, start_preconditioning_step=2,
        graft_type=shampoo.GraftingType.RMSPROP)
    loop = training_loop_lib.TrainingLoop(
        cfg, tx, num_training_steps=10, mesh=mesh)
    return cfg, params, builders, loop

  def test_finetune_bandit_eval(self):
    cfg, params, builders, loop = self._pipeline()

    # Eval rewards the gsm8k corpus only.
    eval_obj = loss_eval.LossEval(loop, [builders[0]], batch_size=8,
                                  max_batches=2)
    generator = batch_generators.DartboardDeterministicTrainingBatchGenerator(
        builders, batch_size=8)

    init_score = eval_obj.evaluate(params)
    assert np.isfinite(init_score)

    history = []
    weights = bandit_loop.run_bandit_loop(
        eval_fn=eval_obj.evaluate,
        train_obj=loop,
        training_batch_generator_obj=generator,
        init_params=params,
        num_iterations=2,
        step_size=0.5,
        delta=0.1,
        candidate_generator_fn=bandit_loop.generate_gaussian_candidates,
        history=history,
    )
    assert weights.shape == (3,)
    assert np.all(weights > 0) and abs(weights.sum() - 1.0) < 1e-9
    assert len(history) == 2
    for w, scores in history:
      # num_grad_evals=2 -> two +-delta candidate pairs per iteration.
      assert len(scores) == 4 and all(np.isfinite(s) for s in scores)

  def test_training_on_target_corpus_improves_its_eval(self):
    cfg, params, builders, loop = self._pipeline()
    eval_obj = loss_eval.LossEval(loop, [builders[0]], batch_size=8,
                                  max_batches=2)
    generator = batch_generators.DartboardDeterministicTrainingBatchGenerator(
        builders, batch_size=8)
    generator.prepare_for_training([np.asarray([1.0, 0.0, 0.0])], None)

    before = eval_obj.evaluate(params)
    trained = loop.train_loop(
        params={"params": params},
        get_next_batch_fn=lambda: generator.get_next_batch(0))
    after = eval_obj.evaluate(trained["params"])
    assert np.isfinite(after)
    assert after > before  # LossEval is negated loss: higher is better

  def test_few_shot_mmlu_eval_runs(self):
    cfg, params, _, _ = self._pipeline()
    tok = _tok()
    dev = [few_shot.MultipleChoiceRecord.from_dict(d)
           for d in corpus_configs.load_jsonl(FIXTURES / "mmlu_dev.jsonl")]
    test = [few_shot.MultipleChoiceRecord.from_dict(d)
            for d in corpus_configs.load_jsonl(FIXTURES / "mmlu_test.jsonl")]
    qs, choice_sets, gold = few_shot.build_eval_inputs(
        dev, test[:8], tok, ntrain=2, max_tokens=SEQ_LEN - 4)
    # The char tokenizer makes 2-shot prompts overflow SEQ_LEN; the crop
    # loop must have dropped exemplars on every prompt (never the live
    # question — a 0-shot prompt may legitimately still exceed budget).
    full = few_shot.build_eval_inputs(dev, test[:8], tok, ntrain=2)[0]
    assert all(len(q) < len(f) for q, f in zip(qs, full))
    ev = mmlu_eval.MultipleChoiceEval(cfg, qs, choice_sets, gold)
    acc = ev.evaluate(params)
    assert 0.0 <= acc <= 1.0
    assert ev.evaluate(params) == acc  # deterministic


class TestUnigramTokenizerEndToEnd:
  """The subword-tokenizer variant of the pipeline (VERDICT r2 item 9):
  a SentencePiece-style unigram tokenizer trained offline on the fixture
  corpora replaces the byte-level stand-in, so the eval numbers come from
  tokenizer-faithful subword streams like the reference's Gemma spm."""

  @pytest.fixture(scope="class")
  def tok(self):
    from precondition_tpu.datamix import tokenizers

    return tokenizers.train_from_manifests(
        str(FIXTURES), ["gsm8k", "sciq", "mtnt"], vocab_size=256)

  def test_training_improves_eval_with_subword_stream(self, tok):
    from jax.sharding import Mesh

    cfg = transformer.TransformerConfig(
        vocab_size=tok.vocab_size, d_model=64, n_heads=4, n_layers=2,
        d_ff=128, max_seq_len=SEQ_LEN, remat=False)
    params = transformer.init_params(jax.random.PRNGKey(0), cfg)
    builders = [
        corpus_configs.build_offline(name, str(FIXTURES), tok, SEQ_LEN)
        for name in ("gsm8k", "sciq", "mtnt")
    ]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    tx = shampoo.distributed_shampoo(
        learning_rate=0.001, block_size=32, start_preconditioning_step=2,
        graft_type=shampoo.GraftingType.RMSPROP)
    loop = training_loop_lib.TrainingLoop(
        cfg, tx, num_training_steps=10, mesh=mesh)
    eval_obj = loss_eval.LossEval(loop, [builders[0]], batch_size=8,
                                  max_batches=2)
    generator = batch_generators.DartboardDeterministicTrainingBatchGenerator(
        builders, batch_size=8)
    generator.prepare_for_training([np.asarray([1.0, 0.0, 0.0])], None)

    before = eval_obj.evaluate(params)
    trained = loop.train_loop(
        params={"params": params},
        get_next_batch_fn=lambda: generator.get_next_batch(0))
    after = eval_obj.evaluate(trained["params"])
    assert np.isfinite(after)
    assert after > before

  def test_few_shot_mmlu_eval_with_subwords(self, tok):
    cfg = transformer.TransformerConfig(
        vocab_size=tok.vocab_size, d_model=64, n_heads=4, n_layers=2,
        d_ff=128, max_seq_len=SEQ_LEN, remat=False)
    params = transformer.init_params(jax.random.PRNGKey(1), cfg)
    dev = [few_shot.MultipleChoiceRecord.from_dict(d)
           for d in corpus_configs.load_jsonl(FIXTURES / "mmlu_dev.jsonl")]
    test = [few_shot.MultipleChoiceRecord.from_dict(d)
            for d in corpus_configs.load_jsonl(FIXTURES / "mmlu_test.jsonl")]
    qs, choice_sets, gold = few_shot.build_eval_inputs(
        dev, test[:8], tok, ntrain=2, max_tokens=SEQ_LEN - 4)
    # Subword prompts compress ~4x vs the char tokenizer, so 2-shot
    # prompts now FIT the budget (the crop loop need not fire) — this is
    # exactly the tokenizer-faithfulness gap the byte-level stand-in had.
    assert all(len(q) <= SEQ_LEN - 4 for q in qs)
    ev = mmlu_eval.MultipleChoiceEval(cfg, qs, choice_sets, gold)
    acc = ev.evaluate(params)
    assert 0.0 <= acc <= 1.0
