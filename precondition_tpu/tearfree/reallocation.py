"""Offline Sketchy memory reallocation from checkpoint statistics.

Given saved tearfree/Sketchy optimizer states, score each layer axis (by
intrinsic rank, trace, or tail mass of its sketch/exact covariance) and
redistribute the per-axis sketch ranks within groups of same-dimension axes
proportionally to score, with outlier capping at the full dimension.  The
output is a ``memory_alloc`` dict consumable by
`precondition_tpu.tearfree.sketchy.Options`.  Semantics parity with
`/root/reference/precondition/tearfree/reallocation.py`.
"""

from __future__ import annotations

import concurrent.futures
import copy
import os
from typing import Any, Optional

from absl import app
from absl import flags
from jax import numpy as jnp

FEASIBLE_RULES = (
    "ggt_intrinsic_rank",
    "ggt_trace",
    "tail_rho",
    "sketch_intrinsic_rank",
    "sketch_trace",
)


def load_checkpoints(file_dir: str):
  """List ``ckpt_<step>`` checkpoints, sorted by step."""
  files = []
  for f in os.listdir(file_dir):
    if f.startswith("ckpt_"):
      files.append((int(f[len("ckpt_"):]), f))
  files.sort()
  return files


def create_state(file_dir: str, idx):
  """Restore optimizer states from the selected checkpoint indices."""
  from flax.training import checkpoints as flax_ckpts

  files = load_checkpoints(file_dir)

  def extract(args):
    _, prefix = args
    restored = flax_ckpts.restore_checkpoint(file_dir, target=None,
                                             prefix=prefix)
    state = restored["optimizer_state"]
    if "base_state" in state:
      state = state["base_state"]
    return state

  with concurrent.futures.ThreadPoolExecutor() as tpe:
    states = list(tpe.map(extract, [files[i] for i in idx]))
  return tuple(states)


def _sketches_of(state):
  """Pull the sketchy `sketches` subtree out of a serialized tearfree state."""
  return state["inner_state"]["0"]["direction"]["1"]["sketches"]


def layers_and_axes(sketches: dict):
  """Set of '<layer path>/axes/<i>' names plus the number of axes."""

  def walk(tree, prefix="", paths=None):
    if paths is None:
      paths = set()
    for key, value in tree.items():
      new_key = prefix + "/" + key if prefix else key
      if isinstance(value, dict):
        walk(value, new_key, paths)
      else:
        paths.add(prefix)
    return paths

  all_names = walk(sketches)
  layer_names = {n for n in all_names if n[-2] == "/"}
  num_axes = len({n[-1] for n in all_names if n[-2] == "/"})
  return layer_names, num_axes


def create_groups(sketches: dict, layer_names) -> dict:
  """Group layer axes by their dimension.

  Groups iterate in sorted-name order: `layer_names` is a set, and letting
  its hash order leak into the float score summation below makes the
  rounded allocations differ between interpreter runs (PYTHONHASHSEED).
  """
  groups: dict = {}
  for name in sorted(layer_names):
    node = sketches
    for d in name.split("/"):
      node = node[d]
    dim = node["dim"] if "dim" in node else node["eigvecs"].shape[0]
    groups.setdefault(dim, []).append(name)
  return groups


def score_fn(states, rule: str, layer_names, running_average=False) -> dict:
  """Score each layer axis by the chosen statistic."""
  if rule not in FEASIBLE_RULES:
    raise NotImplementedError(rule)

  if rule.startswith("ggt"):
    target = "ema_ggt"
  elif rule.startswith("sketch"):
    target = "eigvals"
  else:
    target = "tail"
  ops = {
      "ggt_intrinsic_rank": lambda x: jnp.trace(x) / jnp.linalg.norm(x, 2),
      "ggt_trace": jnp.trace,
      "tail_rho": lambda x: x,
      "sketch_intrinsic_rank": (
          lambda x: jnp.sum(x) / jnp.max(x) if jnp.sum(x) else 0),
      "sketch_trace": jnp.sum,
  }
  if running_average:
    sketches = [_sketches_of(st) for st in states]
  else:
    sketches = [_sketches_of(states[-1])]

  scores = {}
  for name in layer_names:
    values = []
    for sk in copy.deepcopy(sketches):
      node = sk
      for d in name.split("/"):
        node = node[d]
      values.append(ops[rule](node[target]))
    scores[name] = jnp.mean(jnp.array(values))
  return scores


def create_redist_dict(
    file_dir: str,
    idx,
    rule: str,
    running_average: bool,
    sketchy_rank: int,
    states: Optional[Any] = None,
):
  """Compute the per-layer, per-axis rank allocation dict."""
  if not states:
    states = create_state(file_dir, idx)
  sketches = _sketches_of(states[-1])
  layer_names, num_axes = layers_and_axes(sketches)
  groups = create_groups(sketches, layer_names)
  scores = score_fn(states, rule, layer_names, running_average)

  def empty_redist():
    res: dict = {}
    for p in scores:
      dirs = p.split("/")[:-2]
      cur = res
      for d in dirs[:-1]:
        cur = cur.setdefault(d, {})
      cur[dirs[-1]] = [0] * num_axes
    return res

  def write_alloc(redist, group, alloc):
    for key in group:
      dirs, axis = key.split("/")[:-2], int(key.split("/")[-1])
      node = redist
      for d in dirs:
        node = node[d]
      node[axis] = alloc[key]
    return redist

  rd = lambda x: int(x // 1) + 1

  redist = empty_redist()
  for dim, group in groups.items():
    group_size = len(group)
    group_resource = group_size * sketchy_rank
    assert group_resource >= group_size, (group_resource, group_size)
    # Reserve 1 rank per member; distribute the remainder by score.
    remaining = group_resource - group_size
    total_score = sum(scores[k] for k in group)
    by_score = sorted(((k, scores[k]) for k in group),
                      key=lambda kv: kv[1], reverse=True)
    alloc = {}
    for key, score in by_score:
      unit = remaining / total_score if total_score else 0.0
      if rd(score * unit) - 1 > dim - 1:
        # Outlier: cap at the axis dimension, renormalise the rest.
        alloc[key] = dim
        remaining -= dim - 1
      else:
        alloc[key] = rd(score * unit)
        remaining -= alloc[key] - 1
      total_score -= score

    for key in alloc:
      assert alloc[key] <= dim, (key, alloc[key], dim)
    allocated = sum(alloc.values())
    assert allocated <= group_size * sketchy_rank, (allocated,)

    # Hand out any leftover ranks to the highest scorers.
    extra = group_size * sketchy_rank - allocated
    if extra > 0:
      for key, _ in by_score:
        alloc[key] = min(alloc[key] + 1, dim)
        extra = extra - 1 if alloc[key] + 1 < dim else extra
        if extra <= 0:
          break

    redist = write_alloc(redist, group, alloc)
  return redist


def _define_flags():
  """CLI flags, defined lazily so importing this module next to other
  reallocation CLIs (e.g. the upstream oracle in tests) cannot collide in
  the global absl registry."""
  return {
      "dir": flags.DEFINE_string("dir", "", "directory with checkpoints"),
      "idx": flags.DEFINE_multi_integer(
          "idx", -1, "checkpoint indices to analyze (default: last)"),
      "rule": flags.DEFINE_string("rule", "sketch_trace", "scoring rule"),
      "avg": flags.DEFINE_bool(
          "avg", False, "average scores over checkpoints"),
      "rank": flags.DEFINE_integer(
          "rank", 256, "base per-layer rank budget"),
  }


def main(argv, fl):
  del argv
  if not fl["dir"].value:
    raise ValueError("--dir must be set")
  return create_redist_dict(
      fl["dir"].value, fl["idx"].value, fl["rule"].value, fl["avg"].value,
      fl["rank"].value)


if __name__ == "__main__":
  _fl = _define_flags()
  app.run(lambda argv: main(argv, _fl))
