"""Device (JAX/XLA/Pallas) kernels for the byte-crunching hot paths.

Each op mirrors a numpy golden implementation elsewhere in the package
and is validated against it in tests (CPU backend, 8 virtual devices).
"""
