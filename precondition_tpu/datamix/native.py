"""ctypes bindings for the C++ batch-assembly library (`native/batchio.cc`).

The host side of the data pipeline — tokenise, pad, build target masks,
sample the mixture — runs in C++ so the prefetch thread releases the GIL
and keeps the device fed.  Falls back to the pure-python paths in
`dataset_builder`/`batch_generators` when the shared library is missing;
`ensure_built()` compiles it on demand with the in-image toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbatchio.so")

_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
  """Compile the library if needed; returns availability."""
  if os.path.exists(_LIB_PATH):
    return True
  if not os.path.isdir(_NATIVE_DIR):
    return False
  try:
    subprocess.run(["make", "-C", _NATIVE_DIR],
                   capture_output=quiet, check=True)
    return os.path.exists(_LIB_PATH)
  except (subprocess.CalledProcessError, FileNotFoundError):
    return False


def _load() -> Optional[ctypes.CDLL]:
  global _lib
  if _lib is not None:
    return _lib
  if not ensure_built():
    return None
  lib = ctypes.CDLL(_LIB_PATH)
  lib.build_examples.argtypes = [
      ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
      ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
      ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
      ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
  ]
  lib.sample_mixture.argtypes = [
      ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
      ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32),
  ]
  lib.allocate_proportional.argtypes = [
      ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
      ctypes.POINTER(ctypes.c_int32),
  ]
  _lib = lib
  return _lib


def available() -> bool:
  return _load() is not None


def build_examples(
    pairs: Sequence[Tuple[str, str]],
    max_seq_len: int,
    vocab_size: int,
    pad_id: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
  """Tokenise + pad + mask a batch of (prompt, answer) text pairs.

  Returns ``(tokens [n, max_seq_len] int32, mask [n, max_seq_len] bool)``
  with byte-level tokenisation matching
  `dataset_builder.char_tokenizer`.
  """
  lib = _load()
  assert lib is not None, "native batchio unavailable"
  n = len(pairs)
  prompts = [p.encode("utf-8") for p, _ in pairs]
  answers = [a.encode("utf-8") for _, a in pairs]
  c_prompts = (ctypes.c_char_p * n)(*prompts)
  c_answers = (ctypes.c_char_p * n)(*answers)
  p_lens = np.asarray([len(b) for b in prompts], np.int32)
  a_lens = np.asarray([len(b) for b in answers], np.int32)
  tokens = np.empty((n, max_seq_len), np.int32)
  mask = np.empty((n, max_seq_len), np.uint8)
  lib.build_examples(
      c_prompts, p_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      c_answers, a_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      n, max_seq_len, vocab_size, pad_id,
      tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
  return tokens, mask.astype(bool)


def sample_mixture(weights: np.ndarray, count: int, seed: int) -> np.ndarray:
  """Deterministic multinomial dataset sampling."""
  lib = _load()
  assert lib is not None, "native batchio unavailable"
  w = np.ascontiguousarray(weights, np.float64)
  out = np.empty((count,), np.int32)
  lib.sample_mixture(
      w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(w), count,
      ctypes.c_uint64(seed),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
  return out


def allocate_proportional(weights: np.ndarray, batch_size: int) -> np.ndarray:
  """Largest-remainder proportional batch allocation."""
  lib = _load()
  assert lib is not None, "native batchio unavailable"
  w = np.ascontiguousarray(weights, np.float64)
  out = np.empty((len(w),), np.int32)
  lib.allocate_proportional(
      w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(w), batch_size,
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
  return out
