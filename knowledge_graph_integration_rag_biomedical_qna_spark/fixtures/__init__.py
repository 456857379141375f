"""Deterministic (seed=42) synthetic fixtures per /root/repo/FIXTURES.md."""
