"""Shape-engine tests: dim merging, block partitioning, padding."""

import numpy as np
import pytest
import jax.numpy as jnp

from precondition_tpu.utils import shapes

from conftest import requires_reference


class TestMergeSmallDims:

  def test_examples(self):
    assert shapes.merge_small_dims([1, 2, 512, 1, 2048, 1, 3, 4], 1024) == [
        1024, 2048, 12]
    assert shapes.merge_small_dims([1, 2, 768, 1, 2048], 1024) == [2, 768, 2048]
    assert shapes.merge_small_dims([1, 1, 1], 1024) == [1]
    assert shapes.merge_small_dims([2, 3, 4], 1024) == [24]
    assert shapes.merge_small_dims([4096, 512], 1024) == [4096, 512]

  @requires_reference
  def test_matches_upstream(self):
    from precondition import distributed_shampoo as ref
    for shape in [[1, 2, 512, 1, 2048, 1, 3, 4], [7], [1, 1], [5, 5, 5],
                  [1024, 1024], [3, 1, 2, 1]]:
      for max_dim in [1, 8, 128, 1024, 8192]:
        assert shapes.merge_small_dims(shape, max_dim) == list(
            ref.merge_small_dims(shape, max_dim)), (shape, max_dim)


class TestPadding:

  def test_pad_square_matrix(self):
    m = jnp.arange(4.0).reshape(2, 2)
    p = shapes.pad_square_matrix(m, 5)
    np.testing.assert_array_equal(p[:2, :2], m)
    np.testing.assert_array_equal(p[2:, 2:], np.eye(3))
    np.testing.assert_array_equal(p[:2, 2:], 0.0)
    np.testing.assert_array_equal(p[2:, :2], 0.0)

  def test_pad_vector(self):
    v = jnp.asarray([1.0, 2.0])
    np.testing.assert_array_equal(shapes.pad_vector(v, 4), [1, 2, 0, 0])


class TestBlockPartitioner:

  def test_roundtrip(self):
    for shape, bs in [((13,), 4), ((8, 8), 4), ((7, 9), 4), ((3, 5, 6), 2),
                      ((10,), 0), ((128, 129), 128)]:
      part = shapes.BlockPartitioner(shape, bs)
      x = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
      blocks = part.partition(x)
      assert len(blocks) == part.num_blocks()
      assert [tuple(b.shape) for b in blocks] == part.block_shapes()
      np.testing.assert_array_equal(part.merge_partitions(blocks), x)

  def test_split_sizes(self):
    part = shapes.BlockPartitioner((10, 4), 4)
    sizes = part.split_sizes()
    np.testing.assert_array_equal(sizes[0], [4, 4, 2])
    np.testing.assert_array_equal(sizes[1], [4])

  @requires_reference
  def test_matches_upstream(self):
    from precondition import distributed_shampoo as ref
    for shape, bs in [((13,), 4), ((8, 8), 4), ((7, 9), 4), ((3, 5, 6), 2)]:
      x = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
      ours = shapes.BlockPartitioner(shape, bs)
      theirs = ref.BlockPartitioner(x, bs)
      ours_blocks = ours.partition(x)
      theirs_blocks = theirs.partition(x)
      assert len(ours_blocks) == len(theirs_blocks)
      for a, b in zip(ours_blocks, theirs_blocks):
        np.testing.assert_array_equal(a, b)


class TestQuantization:

  def test_int8_roundtrip(self):
    from precondition_tpu.utils.quantization import QuantizedValue
    x = jnp.asarray(np.random.RandomState(0).randn(8, 4), jnp.float32)
    qv = QuantizedValue.from_float_value(x, jnp.int8)
    np.testing.assert_allclose(qv.to_float(), x, atol=float(
        jnp.max(jnp.abs(x)) / 127.0))

  def test_int16_psd_with_diagonal(self):
    from precondition_tpu.utils.quantization import QuantizedValue
    rng = np.random.RandomState(1)
    g = rng.randn(6, 6)
    psd = jnp.asarray(g @ g.T, jnp.float32)
    qv = QuantizedValue.from_float_value(psd, jnp.int16, extract_diagonal=True)
    np.testing.assert_allclose(qv.to_float(), psd, rtol=1e-3, atol=1e-3)
    # diagonal is exact
    np.testing.assert_array_equal(qv.diagonal, jnp.diag(psd))

  @requires_reference
  def test_matches_upstream(self):
    from precondition import quantization_utils as ref
    from precondition_tpu.utils.quantization import QuantizedValue
    x = jnp.asarray(np.random.RandomState(2).randn(5, 7), jnp.float32)
    for dtype in [jnp.int8, jnp.int16, jnp.bfloat16, jnp.float32]:
      ours = QuantizedValue.from_float_value(x, dtype)
      theirs = ref.QuantizedValue.from_float_value(x, dtype)
      np.testing.assert_array_equal(
          np.asarray(ours.to_float()), np.asarray(theirs.to_float()))


class TestStackedPartition:
  """Reshape-transpose blockify must agree with the split path exactly."""

  @pytest.mark.parametrize("shape,bs", [
      ((8, 8), 4), ((16, 4), 4), ((4,), 2), ((8, 4, 8), 4), ((6, 6), 3),
  ])
  def test_matches_partition_and_roundtrips(self, shape, bs):
    part = shapes.BlockPartitioner(shape, bs)
    assert part.uniform_block_shape() is not None
    x = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
    stacked = part.partition_stacked(x)
    listed = part.partition(x)
    assert stacked.shape[0] == len(listed)
    for i, blk in enumerate(listed):
      np.testing.assert_array_equal(np.asarray(stacked[i]), np.asarray(blk))
    np.testing.assert_array_equal(np.asarray(part.merge_stacked(stacked)),
                                  np.asarray(x))

  def test_ragged_reports_none(self):
    part = shapes.BlockPartitioner((10, 4), 4)  # 10 -> 4,4,2 ragged
    assert part.uniform_block_shape() is None
