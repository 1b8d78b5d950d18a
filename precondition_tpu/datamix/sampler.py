"""Greedy autoregressive sampler with KV cache.

Equivalent of the reference's `DeconstructedSampler`
(`/root/reference/precondition/datamix_gemma/deconstructed_sampler.py`):
teacher-forces the prompt tokens through the jit'd decode step to fill the
cache, then greedily decodes until the length budget or an end token.  The
whole decode loop is one `lax.while_loop` under jit — no per-token host
round trips.

Multi-chip: pass a ``jax.sharding.Mesh`` (axis ``data_axis``, default
``"data"``) and the sampler shards the batch — tokens, done flags, and
every layer's KV cache — over that axis (the reference's cache sharding:
`deconstructed_sampler.py:157-160`, there via a 1-D mesh + NamedSharding).
Decode is then SPMD: each device holds its batch slice's cache and decodes
locally; no collectives are needed until the host gathers the final
tokens.  Batches are padded to a multiple of the axis size.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from precondition_tpu.models import transformer

Array = jax.Array


class SamplingState(NamedTuple):
  pos: Array                  # [] current decode position
  tokens: Array               # [b, total_len] prompt + generated
  done: Array                 # [b] finished flags
  caches: list                # per-layer KV


@dataclasses.dataclass
class Sampler:
  """Greedy sampler bound to a config + params."""

  cfg: transformer.TransformerConfig
  params: dict
  eos_id: int = 1
  pad_id: int = 0
  mesh: Optional[jax.sharding.Mesh] = None
  data_axis: str = "data"

  def __post_init__(self):
    # total_len and eos_id are static (they size the cache / the scan).
    self._step = jax.jit(
        functools.partial(self._sample_scan, self.cfg, self._batch_sharding()),
        static_argnums=(3, 4))

  def _batch_sharding(self):
    if self.mesh is None:
      return None
    return jax.sharding.NamedSharding(
        self.mesh, jax.sharding.PartitionSpec(self.data_axis))

  @staticmethod
  def _sample_scan(cfg, batch_sharding, params, tokens, prompt_len,
                   total_len, eos_id):
    """Teacher-force prompt then greedy-decode, all inside jit."""
    b = tokens.shape[0]
    caches = transformer.init_cache(cfg, b, total_len)
    if batch_sharding is not None:
      # Pin the whole sampling state's batch axis to the mesh: the KV
      # caches ([b, t, heads, head_dim]) live sharded for the entire
      # decode loop, so each device holds and updates only its slice.
      caches = jax.tree.map(
          lambda c: jax.lax.with_sharding_constraint(c, batch_sharding),
          caches)
      tokens = jax.lax.with_sharding_constraint(tokens, batch_sharding)

    def body(state: SamplingState) -> SamplingState:
      pos = state.pos
      current = state.tokens[:, pos]
      logits, caches = transformer.decode_step(
          params, state.caches, current, pos, cfg)
      sampled = jnp.argmax(logits, axis=-1).astype(state.tokens.dtype)
      in_prompt = (pos + 1) < prompt_len  # [b]: per-example prompt lengths
      # Teacher-force inside the prompt, write greedy tokens after it.
      next_tok = jnp.where(in_prompt, state.tokens[:, pos + 1], sampled)
      next_tok = jnp.where(state.done, state.tokens[:, pos + 1], next_tok)
      tokens = state.tokens.at[:, pos + 1].set(next_tok)
      done = state.done | (~in_prompt & (sampled == eos_id))
      return SamplingState(pos + 1, tokens, done, caches)

    def cond(state: SamplingState):
      return jnp.logical_and(state.pos < total_len - 1, ~jnp.all(state.done))

    init = SamplingState(
        jnp.zeros([], jnp.int32), tokens,
        jnp.zeros((b,), jnp.bool_), caches)
    final = jax.lax.while_loop(cond, body, init)
    return final.tokens

  def sample(self, prompts: List[List[int]],
             max_new_tokens: int = 64) -> List[List[int]]:
    """Greedy-decode continuations for a batch of token prompts."""
    max_prompt = max(len(p) for p in prompts)
    total_len = min(max_prompt + max_new_tokens, self.cfg.max_seq_len)
    b = len(prompts)
    pad_b = 0
    if self.mesh is not None:
      n_shards = int(self.mesh.shape[self.data_axis])
      pad_b = (-b) % n_shards
    tokens = np.full((b + pad_b, total_len), self.pad_id, np.int32)
    prompt_lens = np.ones((b + pad_b,), np.int32)  # padding rows: 1-token
    for i, p in enumerate(prompts):
      tokens[i, :len(p)] = p[:total_len]
      prompt_lens[i] = min(len(p), total_len)
    tokens = jnp.asarray(tokens)
    sharding = self._batch_sharding()
    if sharding is not None:
      tokens = jax.device_put(tokens, sharding)
    out = self._step(self.params, tokens, jnp.asarray(prompt_lens),
                     total_len, self.eos_id)
    out = np.asarray(out)[:b]
    results = []
    for i, p in enumerate(prompts):
      gen = out[i, len(p):len(p) + max_new_tokens]
      stop = np.nonzero(gen == self.eos_id)[0]
      results.append(gen[: stop[0]].tolist() if len(stop) else gen.tolist())
    return results
