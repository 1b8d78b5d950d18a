"""Native (C++) batch-assembly library tests."""

import numpy as np
import pytest

from precondition_tpu.datamix import dataset_builder
from precondition_tpu.datamix import native

pytestmark = pytest.mark.skipif(
    not native.ensure_built(), reason="C++ toolchain unavailable")


class TestBatchIO:

  def test_build_examples_matches_python(self):
    pairs = [("ab", "cd"), ("hello world", "yes"), ("", "x"), ("long" * 10,
                                                              "tail")]
    tokens, mask = native.build_examples(pairs, 16, 64)
    tok = dataset_builder.char_tokenizer(64)
    builder = dataset_builder.TextDatasetBuilder(pairs, tok, 16)
    for i, ex in enumerate(builder.get_train_dataset()):
      np.testing.assert_array_equal(tokens[i], ex.input_tokens)
      np.testing.assert_array_equal(mask[i], ex.target_mask)

  def test_allocation_exact(self):
    counts = native.allocate_proportional(np.asarray([0.5, 0.3, 0.2]), 10)
    np.testing.assert_array_equal(counts, [5, 3, 2])
    counts = native.allocate_proportional(np.asarray([1.0, 1.0, 1.0]), 10)
    assert counts.sum() == 10 and counts.max() - counts.min() <= 1

  def test_sampling_distribution(self):
    s = native.sample_mixture(np.asarray([0.8, 0.15, 0.05]), 5000, seed=3)
    frac = np.bincount(s, minlength=3) / 5000
    np.testing.assert_allclose(frac, [0.8, 0.15, 0.05], atol=0.03)
    # Deterministic for a fixed seed.
    s2 = native.sample_mixture(np.asarray([0.8, 0.15, 0.05]), 5000, seed=3)
    np.testing.assert_array_equal(s, s2)

  def test_builder_fast_path(self):
    pairs = [("q1", "a1"), ("q2", "a2")]
    tok = dataset_builder.char_tokenizer(64)
    builder = dataset_builder.TextDatasetBuilder(
        pairs, tok, 8, vocab_size=64)
    fast = builder.to_examples_batch(pairs)
    slow = [builder.to_example(p, a) for p, a in pairs]
    for f, s in zip(fast, slow):
      np.testing.assert_array_equal(f.input_tokens, s.input_tokens)
      np.testing.assert_array_equal(f.target_mask, s.target_mask)
