"""Momentum + weight-decay transform for the tearfree stack.

Semantics parity with `/root/reference/precondition/tearfree/momentum.py`:
EMA vs trace accumulation, Nesterov, and weight decay applied before or
after the momentum accumulation.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Union

import jax
import optax

from precondition_tpu.tearfree import praxis_shim


@dataclasses.dataclass
class Options:
  """Momentum options.

  Attributes:
    ema: if true, velocity is an exponential moving average
      ``v' = decay * v + (1-decay) * u``; else trace accumulation
      ``v' = decay * v + u``.
    nesterov: look-ahead correction; the emitted update becomes
      ``maybe_decay * u + decay * v'`` with ``maybe_decay = (1-decay)`` when
      ``ema`` else 1.
    momentum_decay: the decay above.
    weight_decay: adds ``weight_decay * param`` to the update.
    weight_decay_after_momentum: whether the decay term bypasses the
      velocity accumulator (AdamW-style) or feeds it.
  """

  ema: bool = False
  nesterov: bool = True
  momentum_decay: float = 0.9
  weight_decay: float = 0.0
  weight_decay_after_momentum: bool = True


State = Union[optax.MaskedNode, optax.TraceState]


def _validate(options: Options):
  if not 0 <= options.momentum_decay <= 1:
    raise ValueError(
        f"momentum_decay ({options.momentum_decay}) must be in [0, 1]")
  if options.weight_decay < 0:
    raise ValueError(f"weight_decay ({options.weight_decay}) must be >= 0")


def _sharded_trace(decay: float,
                   nesterov: bool) -> praxis_shim.ShardedGradientTransformation:
  """optax.trace with a partition-spec factory (state mirrors params)."""
  trace = optax.trace(decay, nesterov)

  def init_pspec(mdl_params):
    def _spec(hparams):
      s = copy.deepcopy(hparams)
      s.init = None
      return s

    return optax.TraceState(trace=jax.tree.map(_spec, mdl_params))

  return praxis_shim.ShardedGradientTransformation(
      trace.init, trace.update, init_pspec)


def apply(options: Options) -> praxis_shim.ShardedGradientTransformation:
  """Build the momentum/weight-decay transform."""
  _validate(options)

  momentum_txs = []
  if options.momentum_decay:
    if options.ema:
      momentum_txs.append(optax.scale(1 - options.momentum_decay))
    momentum_txs.append(
        _sharded_trace(options.momentum_decay, options.nesterov))

  wd_txs = [optax.add_decayed_weights(options.weight_decay)] * (
      options.weight_decay > 0.0)

  if options.weight_decay_after_momentum:
    txs = momentum_txs + wd_txs
  else:
    txs = wd_txs + momentum_txs
  return praxis_shim.sharded_chain(*txs)
