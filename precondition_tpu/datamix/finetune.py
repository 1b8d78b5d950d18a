"""Driver: bandit-tuned data-mixture finetuning of the flagship LM.

Equivalent of the reference's `finetune.py`/`finetune_utils.py` — wires
dataset builders, a batch generator, the training loop (driven by
distributed Shampoo), an eval, and the bandit loop together.  Defaults to
the in-repo synthetic skill tasks so it runs anywhere; swap the builders
for `HuggingFaceDatasetBuilder`/`TextDatasetBuilder` instances to finetune
on real corpora.

Usage:
  python -m precondition_tpu.datamix.finetune --num_iterations 3
"""

from __future__ import annotations

from absl import app
from absl import flags
from absl import logging
import jax
import numpy as np

from precondition_tpu.datamix import bandit_loop
from precondition_tpu.datamix import batch_generators
from precondition_tpu.datamix import dataset_builder
from precondition_tpu.datamix import training_loop as training_loop_lib
from precondition_tpu.datamix.evals import loss_eval
from precondition_tpu.models import transformer
from precondition_tpu.optim import shampoo

_ITERS = flags.DEFINE_integer("num_iterations", 3, "bandit iterations")
_SKILLS = flags.DEFINE_integer("num_skills", 3, "number of skill datasets")
_STEPS = flags.DEFINE_integer("train_steps", 8, "finetune steps per probe")
_BATCH = flags.DEFINE_integer("batch_size", 8, "train batch size")
_STEP_SIZE = flags.DEFINE_float(
    "step_size", 0.01,
    "bandit EG step size; keep small when eval scores are loss-scale "
    "(EG saturates to a vertex if step * score-range is large)")
_DELTA = flags.DEFINE_float("delta", 0.05, "probe perturbation")
_TARGET_SKILL = flags.DEFINE_integer(
    "target_skill", 0, "the eval rewards this skill; the bandit should "
    "upweight its dataset")


def build(num_skills: int, train_steps: int, batch_size: int):
  """Construct (cfg, params, builders, generator, loop, eval)."""
  cfg = transformer.TransformerConfig(
      vocab_size=64, d_model=64, n_heads=4, n_layers=2, d_ff=128,
      max_seq_len=16, remat=False)
  params = transformer.init_params(jax.random.PRNGKey(0), cfg)

  builders = [
      dataset_builder.SyntheticTaskBuilder(
          skill=s, vocab_size=cfg.vocab_size, max_seq_len=cfg.max_seq_len)
      for s in range(num_skills)
  ]
  generator = batch_generators.VanillaTrainingBatchGenerator(
      builders, batch_size=batch_size)

  tx = shampoo.distributed_shampoo(
      learning_rate=0.01, block_size=32, start_preconditioning_step=2,
      graft_type=shampoo.GraftingType.RMSPROP)
  loop = training_loop_lib.TrainingLoop(
      cfg, tx, num_training_steps=train_steps)
  return cfg, params, builders, generator, loop


def main(argv):
  del argv
  cfg, params, builders, generator, loop = build(
      _SKILLS.value, _STEPS.value, _BATCH.value)
  # Eval only rewards the target skill's loss — the bandit's job is to
  # discover which mixture serves it.
  eval_obj = loss_eval.LossEval(
      loop, [builders[_TARGET_SKILL.value]], batch_size=8)

  history = []
  weights = bandit_loop.run_bandit_loop(
      eval_fn=eval_obj.evaluate,
      train_obj=loop,
      training_batch_generator_obj=generator,
      init_params=params,
      num_iterations=_ITERS.value,
      step_size=_STEP_SIZE.value,
      delta=_DELTA.value,
      candidate_generator_fn=bandit_loop.generate_gaussian_candidates,
      history=history,
  )
  logging.info("final mixture weights: %s", weights)
  print("final weights:", np.array2string(weights, precision=4))


if __name__ == "__main__":
  app.run(main)
