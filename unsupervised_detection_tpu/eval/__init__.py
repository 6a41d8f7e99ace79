from .evaluator import Evaluator, evaluate_dataset
