from .loan_pipeline import (
    LoanModel,
    build_preprocessing_pipeline,
    evaluate,
    fit_loan_model,
    seeded_split,
)
from .override import OverrideThresholds, apply_override
from .serving import predict_single_row

__all__ = [
    "LoanModel",
    "build_preprocessing_pipeline",
    "evaluate",
    "fit_loan_model",
    "seeded_split",
    "OverrideThresholds",
    "apply_override",
    "predict_single_row",
]
