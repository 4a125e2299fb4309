"""Uncertainty inference runtime (the reference's test_2D stack)."""

from .runner import InferenceConfig, UncertaintyInference
from .results import ResultsWriter

__all__ = ["InferenceConfig", "UncertaintyInference", "ResultsWriter"]
