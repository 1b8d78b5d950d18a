"""Evaluation harness for the bandit loop's score function."""

from precondition_tpu.datamix.evals.eval import Eval
from precondition_tpu.datamix.evals.loss_eval import LossEval
from precondition_tpu.datamix.evals.generation_eval import GenerationEval
from precondition_tpu.datamix.evals.mmlu_eval import MultipleChoiceEval
from precondition_tpu.datamix.evals.code_eval import CodeExecutionEval
from precondition_tpu.datamix.evals import crop
from precondition_tpu.datamix.evals import few_shot
