"""Transfer-evaluation harness with reference-compatible reports."""

from .transfer import evaluate_run, reference_eval, single_pass_eval  # noqa: F401
