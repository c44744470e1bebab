"""Pure-Python / numpy semantic kernels.

Every function here is deterministic and dependency-free (stdlib + numpy
only), so the SAME code runs in the pytest oracle on the driver and inside
Arrow-vectorized UDFs on executors — the per-url byte-identity invariant
holds by construction.
"""
