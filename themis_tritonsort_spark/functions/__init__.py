"""Scalar function library (reference §2.6 analogs + pipeline helpers)."""
