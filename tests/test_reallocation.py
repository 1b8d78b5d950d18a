"""Tearfree Sketchy reallocation tests.

Mirror of the reference's golden-fixture replay strategy
(`reallocation_test.py:39-64`): replay a serialized optimizer state
through `create_redist_dict` and compare the resulting per-layer rank
allocation against a committed golden.  Three layers of evidence:

* replay of the reference's own `reallocation_test_data` fixture (18-layer
  GNN, sketch_trace rule) against its golden — direct parity on real data,
* replay of this repo's committed synthetic fixture against this repo's
  golden — self-contained, survives without the mounted reference,
* the synthetic fixture through both implementations — exact agreement.
"""

import json
import os

import numpy as np
import pytest

from jax import numpy as jnp

from precondition_tpu.tearfree import reallocation

from conftest import requires_reference

_REF_DATA = "/root/reference/precondition/tearfree/reallocation_test_data"
_OUR_DATA = os.path.join(os.path.dirname(__file__), "data")


def _assert_alloc_close(got, want, delta=1):
  assert set(got) == set(want), (set(got), set(want))
  for key, value in want.items():
    if isinstance(value, dict):
      _assert_alloc_close(got[key], value, delta)
    else:
      got_v = list(got[key])
      assert len(got_v) == len(value), (key, got_v, value)
      for g, w in zip(got_v, value):
        assert abs(int(g) - int(w)) <= delta, (key, got_v, value)


def _load_reference_states():
  with open(os.path.join(_REF_DATA, "states.json")) as f:
    states = tuple(json.load(f))
  sketches = states[-1]["inner_state"]["0"]["direction"]["1"]["sketches"]
  for layer in sketches.values():
    for axis in layer["kernel"]["axes"].values():
      axis["eigvals"] = jnp.array(axis["eigvals"], dtype=jnp.float32)
  return states


def synthetic_states(seed=0):
  """A 6-layer, 2-axis serialized state in the checkpoint dict layout."""
  rng = np.random.RandomState(seed)
  sketches = {}
  for i, dims in enumerate([(64, 32), (64, 32), (128, 32),
                            (128, 64), (64, 64), (128, 32)]):
    axes = {}
    for a, dim in enumerate(dims):
      eigvals = np.sort(np.abs(rng.randn(8)))[::-1] * (i + 1)
      ggt = rng.randn(4, 4)
      axes[str(a)] = {
          "eigvals": jnp.asarray(eigvals, jnp.float32),
          "tail": jnp.float32(abs(rng.randn())),
          "ema_ggt": jnp.asarray(ggt @ ggt.T / 4, jnp.float32),
          "dim": dim,
      }
    sketches[f"layer_{i}"] = {"kernel": {"axes": axes}}
  state = {"inner_state": {"0": {"direction": {"1": {"sketches": sketches}}}}}
  return (state,)


class TestReallocation:

  @requires_reference
  def test_reference_fixture_replay(self):
    """The reference's committed GNN fixture must reallocate to its
    committed golden through OUR implementation."""
    states = _load_reference_states()
    got = reallocation.create_redist_dict(
        "", [-1], "sketch_trace", False, 256, states)
    with open(os.path.join(_REF_DATA, "gnn_realloc.json")) as f:
      want = json.load(f)
    _assert_alloc_close(got, want, delta=1)

  @pytest.mark.parametrize("rule", ["sketch_trace", "ggt_trace", "tail_rho"])
  def test_golden_replay(self, rule):
    """Self-contained golden: the committed synthetic fixture reallocates
    to the committed allocation (survives without /root/reference)."""
    golden_path = os.path.join(_OUR_DATA, f"realloc_golden_{rule}.json")
    got = reallocation.create_redist_dict(
        "", [-1], rule, False, 16, synthetic_states())
    with open(golden_path) as f:
      want = json.load(f)
    _assert_alloc_close(got, want, delta=0)

  @requires_reference
  @pytest.mark.parametrize("rule", ["sketch_trace", "ggt_trace", "tail_rho",
                                    "sketch_intrinsic_rank",
                                    "ggt_intrinsic_rank"])
  def test_matches_reference_on_synthetic(self, rule):
    from precondition.tearfree import reallocation as ref

    ours = reallocation.create_redist_dict(
        "", [-1], rule, False, 16, synthetic_states())
    want = ref.create_redist_dict(
        "", [-1], rule, False, 16, synthetic_states())
    # delta=1 (the reference's own test tolerance): the reference sums
    # group scores in set-hash order, so its rounding at allocation
    # boundaries varies per interpreter run; ours iterates sorted.
    _assert_alloc_close(ours, want, delta=1)

  def test_budget_and_caps(self):
    """Total allocation stays within the group budget and every axis is
    capped at its dimension with at least one rank."""
    got = reallocation.create_redist_dict(
        "", [-1], "sketch_trace", False, 16, synthetic_states())
    sketches = synthetic_states()[0][
        "inner_state"]["0"]["direction"]["1"]["sketches"]
    by_dim = {}
    for name, layer in sketches.items():
      for a, axis in layer["kernel"]["axes"].items():
        by_dim.setdefault(axis["dim"], []).append((name, int(a)))
    for dim, members in by_dim.items():
      total = sum(got[name]["kernel"][axis] for name, axis in members)
      assert total <= len(members) * 16, (dim, total)
      for name, axis in members:
        alloc = got[name]["kernel"][axis]
        assert 1 <= alloc <= dim, (name, axis, alloc)
