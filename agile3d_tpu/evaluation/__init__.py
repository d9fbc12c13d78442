from agile3d_tpu.evaluation.evaluators import EvaluatorMO, EvaluatorSO
from agile3d_tpu.evaluation.labels import DATASET_CLASSES
from agile3d_tpu.evaluation.ap import evaluate_ap

__all__ = ["EvaluatorMO", "EvaluatorSO", "DATASET_CLASSES", "evaluate_ap"]
