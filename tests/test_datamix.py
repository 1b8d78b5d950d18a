"""Datamix subsystem tests: builders, generators, sampler, bandit loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from precondition_tpu.datamix import bandit_loop
from precondition_tpu.datamix import batch_generators
from precondition_tpu.datamix import dataset_builder
from precondition_tpu.datamix import sampler as sampler_lib
from precondition_tpu.models import transformer


def _builders(n=3, vocab=32, seq=8):
  return [dataset_builder.SyntheticTaskBuilder(
      skill=s, vocab_size=vocab, max_seq_len=seq) for s in range(n)]


class TestBuilders:

  def test_example_shapes(self):
    b = _builders()[0]
    ex = next(b.get_train_dataset())
    assert ex.input_tokens.shape == (8,)
    assert ex.target_mask.shape == (8,)
    assert ex.target_mask.dtype == bool
    assert ex.input_tokens.dtype == np.int32

  def test_text_builder_masking(self):
    tok = dataset_builder.char_tokenizer(64)
    b = dataset_builder.TextDatasetBuilder(
        [("ab", "cd")], tok, max_seq_len=8)
    ex = next(b.get_train_dataset())
    # Prompt positions unmasked, answer positions masked-in.
    assert not ex.target_mask[0] and not ex.target_mask[1]
    assert ex.target_mask[2] and ex.target_mask[3]
    assert not ex.target_mask[4:].any()


class TestBatchGenerators:

  @pytest.mark.parametrize("cls", [
      batch_generators.VanillaTrainingBatchGenerator,
      batch_generators.ImportanceWeightingTrainingBatchGenerator,
      batch_generators.DartboardDeterministicTrainingBatchGenerator,
  ])
  def test_shapes(self, cls):
    gen = cls(_builders(), batch_size=6)
    w = np.asarray([0.5, 0.25, 0.25])
    gen.prepare_for_training([w, w], w)
    factors, tokens, masks = gen.get_next_batch(0)
    assert factors.shape == (6,)
    assert tokens.shape == (6, 8)
    assert masks.shape == (6, 8)

  def test_importance_factors_mean_one(self):
    gen = batch_generators.ImportanceWeightingTrainingBatchGenerator(
        _builders(), batch_size=16)
    w1 = np.asarray([0.7, 0.2, 0.1])
    w2 = np.asarray([0.1, 0.2, 0.7])
    gen.prepare_for_training([w1, w2], w1)
    f1, t1, _ = gen.get_next_batch(0)
    f2, t2, _ = gen.get_next_batch(1)
    # Shared examples, per-candidate weights, normalised to mean 1.
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(f1.mean(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(f2.mean(), 1.0, rtol=1e-6)
    assert not np.allclose(f1, f2)

  def test_dartboard_allocation(self):
    gen = batch_generators.DartboardDeterministicTrainingBatchGenerator(
        _builders(), batch_size=10)
    counts = gen._allocate(np.asarray([0.5, 0.3, 0.2]))
    np.testing.assert_array_equal(counts, [5, 3, 2])
    assert gen._allocate(np.asarray([0.51, 0.29, 0.2])).sum() == 10


class TestBanditLoop:

  def test_candidates_are_distributions(self):
    rng = np.random.default_rng(0)
    w = np.asarray([0.6, 0.3, 0.1])
    for fn in [bandit_loop.generate_candidates_random_sign,
               bandit_loop.generate_gaussian_candidates]:
      a, b = fn(w.copy(), rng, 0.05)
      np.testing.assert_allclose(a.sum(), 1.0, rtol=1e-9)
      np.testing.assert_allclose(b.sum(), 1.0, rtol=1e-9)
      assert (a >= 0).all() and (b >= 0).all()

  def test_gradient_estimate_direction(self):
    # Score = <c, v>: two-point estimate must correlate with v.
    v = np.asarray([1.0, -1.0, 0.5])
    rng = np.random.default_rng(1)
    w = np.ones(3) / 3
    est = np.zeros(3)
    for _ in range(200):
      a, b = bandit_loop.generate_gaussian_candidates(w.copy(), rng, 0.01)
      est += bandit_loop.compute_gradient([a, b], [a @ v, b @ v])
    est /= 200
    # Projected onto the simplex tangent space, the mean estimate ~ v.
    centred = lambda x: x - x.mean()
    cos = (centred(est) @ centred(v)) / (
        np.linalg.norm(centred(est)) * np.linalg.norm(centred(v)))
    assert cos > 0.9, (est, cos)

  def test_loop_converges_on_quadratic(self):
    """EG ascent on a known concave score moves weights the right way."""

    class FakeLoop:
      def train_loop(self, params, get_next_batch_fn):
        get_next_batch_fn()  # exercise the generator contract
        return params

    class FakeGen(batch_generators.TrainingBatchGenerator):
      def __init__(self):
        super().__init__(_builders(), batch_size=2)
        self.cands = None

      def prepare_for_training(self, weights_list, unnormalized):
        self.cands = weights_list
        self._i = 0
        return 1

      def get_next_batch(self, index):
        self.last_index = index
        return (np.ones(2, np.float32), np.zeros((2, 8), np.int32),
                np.zeros((2, 8), bool))

    gen = FakeGen()
    target = np.asarray([0.7, 0.2, 0.1])
    state = {"i": 0}

    def eval_fn(params):
      # Score of the i-th candidate mixture: closeness to target.
      cand = gen.cands[state["i"]]
      state["i"] = (state["i"] + 1) % len(gen.cands)
      return -float(np.sum((cand - target) ** 2))

    weights = bandit_loop.run_bandit_loop(
        eval_fn=eval_fn,
        train_obj=FakeLoop(),
        training_batch_generator_obj=gen,
        init_params={},
        num_iterations=60,
        step_size=2.0,
        delta=0.05,
        seed=3,
    )
    assert np.argmax(weights) == 0, weights
    assert weights[0] > 0.45, weights


class TestSampler:

  def test_greedy_matches_full_forward(self):
    """Cached decode must agree with the uncached forward's argmax chain."""
    cfg = transformer.TransformerConfig(
        vocab_size=32, d_model=32, n_heads=2, n_layers=2, d_ff=64,
        max_seq_len=16, remat=False)
    params = transformer.init_params(jax.random.PRNGKey(0), cfg)
    s = sampler_lib.Sampler(cfg, params, eos_id=31)
    prompt = [3, 4, 5]
    out = s.sample([prompt], max_new_tokens=5)[0]

    # Reference: repeated full forwards.
    toks = list(prompt)
    for _ in range(5):
      logits = transformer.forward(
          params, jnp.asarray([toks]), cfg)
      nxt = int(jnp.argmax(logits[0, -1]))
      if nxt == 31:
        break
      toks.append(nxt)
    assert out[:len(toks) - len(prompt)] == toks[len(prompt):], (out, toks)

  def test_batch_with_unequal_prompts(self):
    cfg = transformer.TransformerConfig(
        vocab_size=32, d_model=32, n_heads=2, n_layers=1, d_ff=64,
        max_seq_len=16, remat=False)
    params = transformer.init_params(jax.random.PRNGKey(1), cfg)
    s = sampler_lib.Sampler(cfg, params, eos_id=31)
    outs = s.sample([[3, 4], [5, 6, 7, 8]], max_new_tokens=4)
    assert len(outs) == 2
    assert all(len(o) <= 4 for o in outs)

  def test_mesh_sharded_cache_matches_single_device(self):
    """Decode with the KV cache sharded over an 8-device mesh must emit
    the same tokens as the unsharded sampler (reference analog: the
    1-D-mesh cache sharding, `deconstructed_sampler.py:157-160`).  Also
    exercises batch padding: 3 prompts on 8 shards."""
    cfg = transformer.TransformerConfig(
        vocab_size=32, d_model=32, n_heads=2, n_layers=2, d_ff=64,
        max_seq_len=16, remat=False)
    params = transformer.init_params(jax.random.PRNGKey(2), cfg)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("data",))
    prompts = [[3, 4], [5, 6, 7], [2, 9]]
    plain = sampler_lib.Sampler(cfg, params, eos_id=31)
    sharded = sampler_lib.Sampler(cfg, params, eos_id=31, mesh=mesh)
    outs_plain = plain.sample(prompts, max_new_tokens=5)
    outs_sharded = sharded.sample(prompts, max_new_tokens=5)
    assert outs_plain == outs_sharded

  def test_generation_eval_on_mesh(self):
    """Generation eval end-to-end with the sharded sampler: compiles and
    runs on the 8-device mesh, same score as single-device."""
    from precondition_tpu.datamix.evals import generation_eval

    cfg = transformer.TransformerConfig(
        vocab_size=32, d_model=32, n_heads=2, n_layers=1, d_ff=64,
        max_seq_len=16, remat=False)
    params = transformer.init_params(jax.random.PRNGKey(3), cfg)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("data",))
    prompts = [[3, 4, 5], [6, 7], [8, 9, 10], [11, 12]]
    detok = lambda toks: " ".join(str(t) for t in toks)

    def _eval(mesh_arg):
      ev = generation_eval.GenerationEval(
          make_sampler=lambda p: sampler_lib.Sampler(
              cfg, p, eos_id=31, mesh=mesh_arg),
          prompts=prompts,
          answers=["1", "2", "3", "4"],
          detokenize=detok,
          max_new_tokens=4,
          batch_size=3,  # deliberately not a multiple of the mesh size
      )
      return ev.evaluate(params)

    assert _eval(None) == _eval(mesh)
