"""Training: gradient-free annealing (pure-int8) + QAT (STE gradients)."""

from lowbitdnn_project_tpu.train.annealing import (
    AnnealingResult,
    ParameterHistory,
    fast_annealing_visit,
    generalized_annealing_visit,
    gsa_acceptance,
    gsa_schedule,
    linear_schedule,
    log_schedule,
    metropolis_acceptance,
    simulated_annealing,
)
from lowbitdnn_project_tpu.train.qat import (
    cross_entropy,
    fake_quantize_tree,
    make_qat_train_step,
)

__all__ = [
    "simulated_annealing",
    "AnnealingResult",
    "ParameterHistory",
    "fast_annealing_visit",
    "generalized_annealing_visit",
    "linear_schedule",
    "log_schedule",
    "gsa_schedule",
    "metropolis_acceptance",
    "gsa_acceptance",
    "make_qat_train_step",
    "fake_quantize_tree",
    "cross_entropy",
]
