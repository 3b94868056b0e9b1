from .voi import rand_voi
from .metrics import compute_metrics
from .skeletons import expected_run_length, skeleton_metrics
from .errors import compute_aff_errors, compute_lsd_errors
from .thresholds import evaluate_thresholds
