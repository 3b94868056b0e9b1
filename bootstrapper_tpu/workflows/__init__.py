from .train import run_training
from .predict import run_prediction
from .segment import run_segmentation
from .evaluate import run_evaluation
from .filter import run_filter
