"""Byte-parity sources/sinks (reference §2.1 readers/writers)."""
