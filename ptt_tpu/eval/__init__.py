"""Evaluation infrastructure: tracking metrics (Success/Precision AUC), the
autoregressive per-tracklet evaluator with a jitted device track step, and the
epoch-level eval entry (reference tools/eval_utils/; SURVEY.md L7)."""

from .metrics import Evaluator, Precision, Success, estimateAccuracy, estimateOverlap
from .evaluator import TrackingEvaluator, eval_one_epoch, make_track_step
from .device_loop import (
    DeviceTrackingEvaluator,
    eval_one_epoch_device,
    make_device_tracker,
)

__all__ = [
    "Evaluator",
    "Precision",
    "Success",
    "estimateAccuracy",
    "estimateOverlap",
    "TrackingEvaluator",
    "eval_one_epoch",
    "make_track_step",
    "DeviceTrackingEvaluator",
    "eval_one_epoch_device",
    "make_device_tracker",
]
