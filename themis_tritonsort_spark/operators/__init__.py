"""Operator library: reference §2 analogs + beyond-reference pipeline ops."""
