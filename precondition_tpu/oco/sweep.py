"""CLI: sweep OCO hyperparameters and plot cumulative-loss curves.

Workflow parity with `/root/reference/precondition/oco/sweep.py`: an absl
binary that runs a (lr x delta x algorithm) grid through a thread pool of
async jax programs, writes ``results.pkl`` (pandas), ``best.txt``, and
cumulative logloss / 0-1-loss PDF plots; ``--use_best_from`` re-runs the
best per-algorithm hyperparameters from previous result directories
(typically on the held-out ``.t`` split).

Usage:
  python -m precondition_tpu.oco.sweep --dataset synthetic \
      --lr 0.1 --lr 1.0 --delta 1.0 --sketch_size 8 --save_dir /tmp/oco
"""

import concurrent.futures as concurrent_futures
import datetime
import itertools
import os
from typing import Optional, Sequence, Union

from absl import app
from absl import flags
from absl import logging
import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

from precondition_tpu.oco import algorithms  # noqa: E402
from precondition_tpu.oco import datasets  # noqa: E402
from precondition_tpu.oco import train  # noqa: E402

_SKETCH_SIZE = flags.DEFINE_integer(
    "sketch_size", 0, "sketch size for approximate full-matrix algorithms")
_PARALLEL = flags.DEFINE_integer(
    "parallel", 16, "number of threads for launching jax programs")
_DATASET = flags.DEFINE_enum(
    "dataset", "a9a", datasets.SUPPORTED_DATASETS, "dataset to run on")
_ALGS = flags.DEFINE_multi_enum_class(
    "alg", list(algorithms.Algorithm), algorithms.Algorithm,
    "which algorithms to evaluate")
_DELTA = flags.DEFINE_multi_float(
    "delta", [], "initial diagonal regularization grid")
_LR = flags.DEFINE_multi_float("lr", [], "learning rate grid")
_USE_BEST_FROM = flags.DEFINE_multi_string(
    "use_best_from", None,
    "re-run the best per-algorithm hparams found in these result dirs "
    "(mutually exclusive with --delta/--lr)")
_DIR = flags.DEFINE_string("save_dir", None, "output directory prefix")
_DATA_DIR = flags.DEFINE_string(
    "data_dir", None, "directory with libsvm dataset files")

SKETCHING_ALGS = [
    algorithms.Algorithm.RFD_SON,
    algorithms.Algorithm.FD_SON,
    algorithms.Algorithm.ADA_FD,
    algorithms.Algorithm.S_ADA,
]


def _validate_flags() -> bool:
  if (any(a in SKETCHING_ALGS for a in _ALGS.value)
      and _SKETCH_SIZE.value <= 1):
    raise ValueError("sketch size must be at least 2")
  hparams_set = _DELTA.value or _LR.value
  if hparams_set and not (_DELTA.value and _LR.value):
    raise ValueError("if one of --delta/--lr is set, the other must be")
  if _USE_BEST_FROM.value and hparams_set:
    raise ValueError("--delta/--lr are mutually exclusive with "
                     "--use_best_from")
  if not _USE_BEST_FROM.value and not hparams_set:
    raise ValueError("set --delta/--lr or --use_best_from")
  if not _DIR.value:
    raise ValueError("require --save_dir")
  return bool(hparams_set)


def _make_directory() -> str:
  now = datetime.datetime.now()
  directory = f"{_DIR.value}/{now.date()}/{now.strftime('%H:%M:%S')}"
  os.makedirs(directory)
  return directory


def _run_oco(idx, total, dataset, hparam, nobs):
  """One hyperparameter trial (thread-level parallelism; jax is async)."""
  logging.info("job %04d of %04d starting", idx, total)
  try:
    history = train.run_dataset(dataset, nobs, hparam, datasets.incorrect)
    logging.info("job %04d of %04d done", idx, total)
    return algorithms.as_np(history)
  except FloatingPointError:
    logging.info("job %04d of %04d inf", idx, total)
    return None
  except Exception as e:  # pylint: disable=broad-exception-caught
    logging.info("job %04d of %04d errored", idx, total)
    return e


def _make_pandas(hparams, dataset_name, sketch_size, histories):
  import pandas as pd

  records = []
  for hparam, history in zip(hparams, histories):
    if history is None:
      loss, acc = np.inf, 0.0
    else:
      loss = history["loss"][-1] / history["n"][-1]
      acc = 1.0 - history["extra_loss"][-1] / history["n"][-1]
    records.append({
        "alg": hparam.algorithm.name,
        "lr": hparam.lr,
        "delta": hparam.delta,
        "loss": loss,
        "acc": acc,
        "dataset": dataset_name,
        "sketch_size": (sketch_size if hparam.algorithm in SKETCHING_ALGS
                        else np.nan),
        "history": history,
    })
  return pd.DataFrame.from_records(records)


def _read_pandas(path, dataset_name, sketch_size):
  import pandas as pd

  path = os.path.join(path, "results.pkl")
  df = pd.read_pickle(path)
  assert len(df) > 0, path
  assert df.dataset.nunique(dropna=False) == 1, df.dataset.unique()
  stored = list(df.dataset.unique())[0]
  assert dataset_name in stored or stored in dataset_name, (
      stored, dataset_name)
  sketch_sizes = [x for x in df.sketch_size.unique() if not pd.isnull(x)]
  if sketch_sizes:
    assert sketch_size == sketch_sizes[0], (sketch_size, sketch_sizes)
  return df


def _plot(directory, best_df):
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  cs = itertools.cycle("rbcgk")
  lss = itertools.cycle(["--", "-", ":"])
  for loss_type in ["loss", "extra_loss"]:
    for h, alg, ls, c in zip(best_df.history, best_df.alg, lss, cs):
      if h is None:
        continue
      plt.plot(h["n"][1:], h[loss_type][1:] / h["n"][1:],
               label=alg, ls=ls, c=c)
    loss_name = "0-1 loss" if loss_type == "extra_loss" else "logloss"
    plt.xlabel("examples")
    plt.ylabel(f"cumulative {loss_name}")
    plt.title(f"cumulative {loss_name}")
    plt.legend()
    fname = f"plot-{loss_name.replace(' ', '-')}.pdf"
    with open(os.path.join(directory, fname), "wb") as f:
      plt.savefig(f, format="pdf", bbox_inches="tight")
    plt.clf()


def main(argv) -> None:
  del argv
  import pandas as pd

  if _DATA_DIR.value:
    datasets.DATA_DIR = _DATA_DIR.value

  is_sweep = _validate_flags()
  directory = _make_directory()
  with open(os.path.join(directory, "flagfile.txt"), "w") as f:
    f.write(flags.FLAGS.flags_into_string())

  dataset_name = _DATASET.value
  dataset = datasets.load_dataset(dataset_name)
  logging.info("loaded dataset %s with dims %s", dataset_name,
               dataset.x.shape)
  sketch_size = _SKETCH_SIZE.value

  if is_sweep:
    hparams = [
        algorithms.HParams(
            delta, lr, sketch_size if alg in SKETCHING_ALGS else 0, alg)
        for alg, lr, delta in itertools.product(
            _ALGS.value, _LR.value, _DELTA.value)
    ]
  else:
    df = pd.concat(
        [_read_pandas(p, dataset_name, sketch_size)
         for p in _USE_BEST_FROM.value], axis=0)
    df.sort_values("loss", inplace=True)
    df.drop_duplicates("alg", inplace=True)
    hparams = []
    for alg in _ALGS.value:
      if alg.name not in df.alg.unique():
        raise ValueError(f"missing {alg} in --use_best_from")
      row = df.loc[df.alg == alg.name].T.squeeze()
      hparams.append(algorithms.HParams(
          row.delta, row.lr,
          sketch_size if alg in SKETCHING_ALGS else 0, alg))

  nobs = 100
  total = len(hparams)
  logging.info("generated %s trials with %s obs", total, nobs)
  args = [dict(idx=i, total=total, dataset=dataset_name, hparam=h, nobs=nobs)
          for i, h in enumerate(hparams)]
  executor = concurrent_futures.ThreadPoolExecutor(_PARALLEL.value)
  histories = list(executor.map(lambda kw: _run_oco(**kw), args))
  for e in histories:
    if isinstance(e, Exception):
      raise e

  result_df = _make_pandas(hparams, dataset_name, sketch_size, histories)
  result_df.sort_values("loss", inplace=True)
  result_df.to_pickle(os.path.join(directory, "results.pkl"))
  best_df = result_df.drop_duplicates("alg", inplace=False)
  best_txt = best_df.drop(columns="history").to_string(index=False)
  logging.info("completed runs, results\n%s", best_txt)
  with open(os.path.join(directory, "best.txt"), "w") as f:
    print(best_txt, file=f)

  _plot(directory, best_df)
  logging.info("all results saved in %s", directory)


if __name__ == "__main__":
  app.run(main)
