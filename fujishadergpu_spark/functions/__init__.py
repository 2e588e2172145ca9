"""Scalar / vectorized function library (the engine's analog of the
reference's shared primitive kernels, reference algorithms/_nan_utils.py
and SURVEY.md §2.C)."""
