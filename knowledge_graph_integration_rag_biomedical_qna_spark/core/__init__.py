"""Pure-Python semantics shared by the Spark pipeline and the pandas oracle.

Everything here is deterministic, dependency-free (stdlib + re only) and
importable from both executor-side pandas UDFs and the driver-side oracle, so
triple P/R >= 0.95 is a property of shared code + fixed tie-breaks, not luck.
"""
