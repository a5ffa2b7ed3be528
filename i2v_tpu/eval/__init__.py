"""Transfer-evaluation harness with reference-compatible reports."""

from .transfer import evaluate_run, reference_eval  # noqa: F401
