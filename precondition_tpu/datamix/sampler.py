"""Greedy autoregressive sampler with KV cache.

Equivalent of the reference's `DeconstructedSampler`
(`/root/reference/precondition/datamix_gemma/deconstructed_sampler.py`):
teacher-forces the prompt tokens through the jit'd decode step to fill the
cache, then greedily decodes until the length budget or an end token.  The
whole decode loop is one `lax.while_loop` under jit — no per-token host
round trips.
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

  def __post_init__(self):
    # total_len and eos_id are static (they size the cache / the scan).
    self._step = jax.jit(functools.partial(self._sample_scan, self.cfg),
                         static_argnums=(3, 4))

  @staticmethod
  def _sample_scan(cfg, params, tokens, prompt_len, total_len, eos_id):
    """Teacher-force prompt then greedy-decode, all inside jit."""
    b = tokens.shape[0]
    caches = transformer.init_cache(cfg, b, total_len)

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
    tokens = np.full((b, total_len), self.pad_id, np.int32)
    prompt_lens = np.zeros((b,), np.int32)
    for i, p in enumerate(prompts):
      tokens[i, :len(p)] = p[:total_len]
      prompt_lens[i] = min(len(p), total_len)
    out = self._step(self.params, jnp.asarray(tokens),
                     jnp.asarray(prompt_lens),
                     total_len, self.eos_id)
    out = np.asarray(out)
    results = []
    for i, p in enumerate(prompts):
      gen = out[i, len(p):len(p) + max_new_tokens]
      stop = np.nonzero(gen == self.eos_id)[0]
      results.append(gen[: stop[0]].tolist() if len(stop) else gen.tolist())
    return results
