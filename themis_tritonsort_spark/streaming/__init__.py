"""Structured-streaming analogs (the reference has no streaming; these
are the idiomatic Spark extensions of its batch operators)."""
